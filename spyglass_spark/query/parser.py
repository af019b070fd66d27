"""Query-string parser — the tantivy ``QueryParser`` / Lucene classic
query-syntax analog (public tantivy surface; the reference builds its
clause tree programmatically in query.rs:58-181, but every tantivy user
drives the engine through this grammar, so the rebuild carries it).

Grammar (one pass, whitespace-separated clauses):

    query   := clause*
    clause  := occur? atom boost?
    occur   := '+' (Must) | '-' (MustNot)         default: Should
    boost   := '^' FLOAT                           multiplies field boost
    atom    := (FIELD ':')? (phrase | range | word)
    phrase  := '"' text '"' ('~' INT)?             slop, default 0
    range   := ('[' | '{') lo ' TO ' hi (']' | '}')
               '[' / ']' inclusive, '{' / '}' exclusive, '*' unbounded

Semantics (documented here — THE contract, shared verbatim by the
distributed engine and the scalar oracle, which both compile through
this module):

- A bare word is analyzed per default field with that field's analyzer
  (content: spyglass_tokenizer_en incl. stemming; title: default
  tokenizer) and becomes one Should term clause per emitted token per
  field, at the field's standard boost (content 1.0 / title 2.0 —
  query.rs:96-102 weights). Multi-token words (``file_3.rs``) emit one
  clause per token.
- ``field:word`` restricts to one field. Tokenized fields (content,
  title) analyze the word; raw fields (id, domain, url, tags, custom
  u64 fields) take it verbatim as one exact term.
- ``+atom`` compiles to ONE unscored Must(OR) extra group over the
  atom's emitted clauses (the doc must match the atom in SOME target
  field — Lucene's Must-over-default-fields shape, never AND across
  fields) PLUS the same clauses as scoring Shoulds — exactly how the
  reference wraps its Should group in a Must (query.rs:137). ``-atom``
  compiles to MustNots (boost 0, NOT any emitted clause). An atom
  whose analysis emits no tokens is dropped silently (Lucene
  leniency), even under '+'.
- ``"a b"~n`` is a PhraseQuery with slop n per tokenized default field
  (or the one named field); boost = field phrase weight convention is
  NOT applied — the parser is explicit-intent, so weight = field boost
  × user boost, and idf is the member-idf sum as everywhere.
- ``field:[a TO b]`` expands the term dictionary range (the engine's
  pyarrow byte-range read / the oracle's enumeration — injected via
  ``expand_range``), ranked df DESC, term ASC, capped. As a Should it
  scores like any expansion; under '+' it compiles to ONE unscored
  Must(OR) extra group (Lucene Must-range const semantics — the
  engine/oracle extra_group contract contributes candidates, never
  score mass; an empty expansion matches nothing); under '-' it
  excludes every expansion. ``*`` on either side = unbounded. On the
  date fast fields (lastmodified, published) a range with integer-µs
  bounds compiles to a range Must instead (only valid with '+': a
  Should over a zero-scored mask can never contribute candidates —
  raises).
- No escapes, no wildcards-in-words (the dedicated pattern modes cover
  those), no AND/OR keywords (occur prefixes express the same).

Returns a CompiledQuery; combiner/tie_breaker compose on top like any
other shape.
"""

from __future__ import annotations

import re

from ..analysis.analyzer import tokenize_default, tokenize_en
from .compiler import Clause, CompiledQuery, _term

TOKENIZED_FIELDS = {"content": (tokenize_en, 1.0), "title": (tokenize_default, 2.0)}
RAW_FIELDS = ("id", "domain", "url", "tags")
DATE_FIELDS = ("lastmodified", "published")
DEFAULT_FIELDS = ("content", "title")

_CLAUSE_RE = re.compile(
    r"""(?P<occur>[+-])?
        (?:(?P<field>[A-Za-z_][\w.]*):)?
        (?:
            "(?P<phrase>[^"]*)"(?:~(?P<slop>\d+))?
          | (?P<lb>[\[{])\s*(?P<lo>[^\s\]}]+)\s+TO\s+(?P<hi>[^\s\]}]+)\s*(?P<rb>[\]}])
          | (?P<word>[^\s^]+)
        )
        (?:\^(?P<boost>\d+(?:\.\d+)?))?
    """,
    re.VERBOSE)


def parse_query_string(qs: str, expand_range=None,
                       max_expansions: int = 50) -> CompiledQuery:
    """Compile a query string into a CompiledQuery.

    ``expand_range(field, lo, hi, incl_lo, incl_hi, cap)`` supplies the
    dictionary enumeration for term ranges (engine: the pyarrow
    byte-range read over term_stats; oracle: its whole-dictionary
    comparison scan). A range atom with no expander raises."""
    cq = CompiledQuery()
    pos = 0
    n_atoms = 0
    while pos < len(qs):
        if qs[pos].isspace():
            pos += 1
            continue
        m = _CLAUSE_RE.match(qs, pos)
        if m is None or m.end() == pos:
            raise ValueError(f"query syntax error at offset {pos}: {qs!r}")
        pos = m.end()
        n_atoms += 1
        occur = m.group("occur") or ""
        field = m.group("field")
        boost = float(m.group("boost")) if m.group("boost") else 1.0
        if field is not None and field not in TOKENIZED_FIELDS \
                and field not in RAW_FIELDS and field not in DATE_FIELDS \
                and not field.startswith("cf_"):
            raise ValueError(f"unknown field {field!r} in {qs!r}")

        def emit_atom(clauses):
            """Route one atom's per-field clauses by occur. '+' is the
            Lucene Must-over-default-fields shape: ONE unscored Must(OR)
            extra group (the doc must match the atom in SOME target
            field — never AND across fields) PLUS the same clauses as
            scoring Shoulds, exactly how the reference wraps its Should
            group in a Must (query.rs:137). An atom whose analysis emits
            no tokens is dropped silently (Lucene leniency), even under
            '+'."""
            if not clauses:
                return
            if occur == "-":
                cq.must_nots.extend(
                    Clause(c.kind, c.field, c.terms, c.positions, 0.0,
                           c.slop) for c in clauses)
                return
            if occur == "+":
                cq.extra_groups.append(
                    [Clause(c.kind, c.field, c.terms, c.positions, 0.0,
                            c.slop) for c in clauses])
            cq.should_group.extend(clauses)

        if m.group("phrase") is not None:
            slop = int(m.group("slop") or 0)
            text = m.group("phrase")
            targets = (field,) if field else DEFAULT_FIELDS
            atom = []
            for f in targets:
                if f in TOKENIZED_FIELDS:
                    tokfn, fboost = TOKENIZED_FIELDS[f]
                    toks = tokfn(text)
                    if len(toks) >= 2:
                        # explicit user slop, not the free-text clamp
                        atom.append(Clause("phrase", f,
                                           tuple(t for _, t in toks),
                                           tuple(p for p, _ in toks),
                                           fboost * boost, slop))
                    elif len(toks) == 1:
                        atom.append(_term(f, toks[0][1], fboost * boost))
                else:
                    # raw field: the quoted text IS the single term
                    atom.append(_term(f, text, boost))
            emit_atom(atom)
        elif m.group("lb") is not None:
            lo, hi = m.group("lo"), m.group("hi")
            incl_lo = m.group("lb") == "["
            incl_hi = m.group("rb") == "]"
            lo = None if lo == "*" else lo
            hi = None if hi == "*" else hi
            if field in DATE_FIELDS:
                if occur != "+":
                    raise ValueError(
                        f"date range on {field} must be a '+' clause")
                cq.range_musts.append(
                    (field,
                     None if lo is None else int(lo) + (0 if incl_lo else 1),
                     None if hi is None else int(hi) - (0 if incl_hi else 1)))
                continue
            if expand_range is None:
                raise ValueError("term-range atoms need a dictionary "
                                 "expander (engine/oracle search_parsed)")
            targets = (field,) if field else DEFAULT_FIELDS
            must_or_group = []  # ONE Must(OR) group spanning all targets
            for f in targets:
                if f not in TOKENIZED_FIELDS:
                    raise ValueError(f"term range needs a tokenized "
                                     f"field, got {f!r}")
                _, fboost = TOKENIZED_FIELDS[f]
                terms = expand_range(f, lo, hi, incl_lo, incl_hi,
                                     max_expansions)
                if occur == "+":
                    # Must(OR of the expansions) — an UNSCORED filter
                    # group (Lucene Must-range const semantics; matches
                    # the engine/oracle extra_group contract, which
                    # contributes candidates, never score mass)
                    must_or_group.extend(_term(f, t, 0.0) for t in terms)
                elif occur == "-":
                    for t in terms:  # NOT any expansion
                        cq.must_nots.append(_term(f, t, 0.0))
                else:
                    for t in terms:
                        cq.should_group.append(
                            _term(f, t, fboost * boost))
            if occur == "+":
                # an empty expansion must match NOTHING (Lucene Must
                # semantics); an impossible term (the analyzer alphabet
                # excludes \x00) keeps the group present on both sides
                # — the engine's plan only carries clause specs, so a
                # zero-clause group would otherwise silently vanish
                cq.extra_groups.append(
                    must_or_group or [_term(targets[0], "\x00", 0.0)])
        else:
            word = m.group("word")
            if field in DATE_FIELDS:
                raise ValueError(f"{field} takes a [lo TO hi] range")
            targets = (field,) if field else DEFAULT_FIELDS
            atom = []
            for f in targets:
                if f in TOKENIZED_FIELDS:
                    tokfn, fboost = TOKENIZED_FIELDS[f]
                    for _, t in tokfn(word):
                        atom.append(_term(f, t, fboost * boost))
                else:
                    atom.append(_term(f, word, boost))
            emit_atom(atom)
    cq.term_count = n_atoms
    return cq


def parse_with_filters(qs: str, filters=(), boosts=(), expand_range=None,
                       max_expansions: int = 50) -> CompiledQuery:
    """``parse_query_string`` + the programmatic filter/boost surface of
    ``compile_query`` (tag/url/docid/favorite/date-range specs) appended
    with identical semantics — ONE shared implementation, so the engine
    and the oracle compose parsed queries with filters identically."""
    from .compiler import compile_query

    cq = parse_query_string(qs, expand_range=expand_range,
                            max_expansions=max_expansions)
    base = compile_query("", filters=filters, boosts=boosts)
    cq.should_group.extend(base.should_group)
    cq.musts.extend(base.musts)
    cq.should_extra.extend(base.should_extra)
    cq.must_nots.extend(base.must_nots)
    cq.range_musts.extend(base.range_musts)
    return cq
