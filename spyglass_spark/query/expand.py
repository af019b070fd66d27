"""Prefix and fuzzy term expansion over the term dictionary.

The reference leaves prefix/regex pattern handling as an explicit todo
(/root/reference/crates/spyglass-searcher/src/query.rs:119,163); the
tantivy layer it delegates to rewrites such multi-term queries into a
bounded OR over matching dictionary terms. This module implements that
rewrite Spark-side:

- **prefix**: the term_stats store is (field, term)-sorted parquet with
  4 MB row groups (builder._w_stats), so a prefix is a pure byte-range
  predicate — pyarrow prunes row groups from footer min/max statistics,
  the driver launches no Spark job, and the read touches O(matching
  terms), not O(vocabulary).
- **fuzzy**: SymSpell-style deletion neighborhoods. A sidecar dictionary
  (index/fuzzy_dict.py) maps every single-deletion variant of every
  dictionary term to that term; query-time candidates come from an
  IN-list read over the variant key (complete for Levenshtein <= 1:
  any single substitution/insert/delete shares a deletion key), then
  exact Levenshtein verification on the tiny candidate set. At 100 TB
  the dictionary is vocab-scale (millions of terms, not billions of
  docs): the sidecar build is one narrow Spark job over term_stats and
  lookups stay in the metadata plane. Without the sidecar the fallback
  scans the field's dictionary slice and verifies — correct everywhere,
  linear in vocabulary, so scale deployments build the sidecar.

Expansion semantics (a documented contract, mirrored brute-force by the
scalar oracle in oracle/engine.py): the pattern is normalized with the
same lowercase + ascii-fold the analyzers apply — but NOT stemmed or
stop-filtered (Lucene likewise does not analyze multi-term patterns);
matches rank df DESC then term ASC, capped at ``max_expansions`` per
field, and score as ordinary Should term clauses (content boost 1.0 /
title 2.0, query.rs:96-102 constants).
"""

from __future__ import annotations

import re

from ..analysis.analyzer import MAX_TOKEN_BYTES, _TOKEN_RE, ascii_fold

DEFAULT_MAX_EXPANSIONS = 50

_WILDCARD_CHARS = frozenset("*?")


def normalize_pattern(pattern: str) -> str:
    """Lowercase + ascii-fold the user pattern the way the tokenizers
    normalize terms (analyzer.py LowerCaser + AsciiFoldingFilter), with
    the RemoveLongFilter 40-byte cap. Takes the first token-like run so
    'Résumé*' → 'resume'; returns '' for patterns with no token chars."""
    m = _TOKEN_RE.search(pattern)
    if not m:
        return ""
    tok = ascii_fold(m.group(0).lower())
    return "" if len(tok.encode("utf-8")) > MAX_TOKEN_BYTES else tok


def normalize_wildcard(pattern: str) -> str:
    """Lowercase + ascii-fold the LITERAL runs of a ``*``/``?`` wildcard
    pattern the way the analyzers normalize terms, preserving the
    metacharacters (the pattern itself is not analyzed — Lucene
    WildcardQuery semantics). Dictionary terms are single alphanumeric
    tokens, so a pattern whose folded literals contain any non-token
    character, or whose literal bytes alone exceed the 40-byte
    RemoveLongFilter cap, can match nothing and normalizes to '' — as
    does a pattern with no literal character at all (a bare ``*``
    match-all is refused)."""
    out: list[str] = []
    lit: list[str] = []
    n_lit = 0

    def flush() -> bool:
        nonlocal n_lit
        if not lit:
            return True
        run = ascii_fold("".join(lit).lower())
        lit.clear()
        if not _TOKEN_RE.fullmatch(run):
            return False
        n_lit += len(run.encode("utf-8"))
        out.append(run)
        return True

    for ch in pattern:
        if ch in _WILDCARD_CHARS:
            if not flush():
                return ""
            out.append(ch)
        else:
            lit.append(ch)
    if not flush() or n_lit == 0 or n_lit > MAX_TOKEN_BYTES:
        return ""
    return "".join(out)


def wildcard_regex(pattern: str):
    """Compiled matcher (use ``.fullmatch``) for a NORMALIZED wildcard
    pattern: ``*`` → ``.*``, ``?`` → ``.``, literals escaped. The scalar
    oracle independently matches with stdlib ``fnmatch.fnmatchcase`` —
    on the post-normalization alphabet ``[a-z0-9*?]`` the two languages
    coincide, so parity tests check this translation, not just the
    scoring downstream of it."""
    return re.compile("".join(
        ".*" if ch == "*" else "." if ch == "?" else re.escape(ch)
        for ch in pattern))


def wildcard_literal_prefix(pattern: str) -> str:
    """Literal run before the first metacharacter — the range-pruning
    key for the dictionary read (``spar*k`` prunes on ``spar``; a
    leading wildcard yields '' = no pruning)."""
    i = 0
    while i < len(pattern) and pattern[i] not in _WILDCARD_CHARS:
        i += 1
    return pattern[:i]


def regex_literal_prefix(pattern: str) -> str:
    """Largest SAFE literal prefix of an anchored regex for range
    pruning. Conservative: alternation/group/class/escape anywhere
    defeats pruning (``abc|xyz`` must not prune to ``abc``); otherwise
    the leading alphanumeric run, minus its final character when a
    quantifier follows it (``abc*`` matches ``ab`` — prune on ``ab``;
    in ``ab.*`` the quantifier binds the ``.``, so ``ab`` stands)."""
    if any(c in pattern for c in "|([\\"):
        return ""
    i = 0
    while i < len(pattern) and pattern[i].isalnum():
        i += 1
    lit = pattern[:i]
    if i < len(pattern) and pattern[i] in "*?+{":
        lit = lit[:-1]
    return lit


def prefix_upper_bound(prefix: str) -> str | None:
    """Smallest string greater than every string with this prefix:
    increment the last non-0x10FFFF code point and truncate. None means
    unbounded (prefix was all U+10FFFF — impossible post-fold)."""
    cps = list(prefix)
    while cps:
        o = ord(cps[-1])
        if o < 0x10FFFF:
            return "".join(cps[:-1]) + chr(o + 1)
        cps.pop()
    return None


def levenshtein_le(a: str, b: str, limit: int) -> int:
    """Banded Levenshtein distance, early-exit: returns the distance if
    <= limit, else limit+1. Plain Levenshtein (transposition = 2 edits)
    to match both Spark's F.levenshtein and DuckDB's levenshtein()."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if abs(la - lb) > limit:
        return limit + 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    prev = list(range(la + 1))
    for j in range(1, lb + 1):
        cur = [j] + [0] * la
        best = j
        bj = b[j - 1]
        for i in range(1, la + 1):
            cost = 0 if a[i - 1] == bj else 1
            cur[i] = min(prev[i] + 1, cur[i - 1] + 1, prev[i - 1] + cost)
            if cur[i] < best:
                best = cur[i]
        if best > limit:
            return limit + 1
        prev = cur
    return prev[la] if prev[la] <= limit else limit + 1


def deletion_variants(term: str, d: int = 1) -> set[str]:
    """The SymSpell key set: the term plus every string reachable by
    deleting up to ``d`` characters (d=1 supported by the sidecar)."""
    out = {term}
    frontier = {term}
    for _ in range(d):
        nxt = set()
        for t in frontier:
            for i in range(len(t)):
                nxt.add(t[:i] + t[i + 1:])
        out |= nxt
        frontier = nxt
    return out


def deletion_key_expr(term_col: str):
    """JVM-side (whole-stage-codegen) array of d=1 deletion keys of a
    term column — the build-side twin of ``deletion_variants``. Used by
    the fuzzy_dict sidecar build and the distributed ops.fuzzy join so
    neither ships a Python UDF."""
    from pyspark.sql import functions as F

    return F.array_union(
        F.array(F.col(term_col)),
        F.expr(
            f"transform(sequence(1, length({term_col})), "
            f"i -> concat(substring({term_col}, 1, i - 1), "
            f"substring({term_col}, i + 1)))"),
    )


# ---------------------------------------------------------------------------
# driver-side dictionary reads (pyarrow metadata plane — no Spark job)
# ---------------------------------------------------------------------------

def _read_terms(stats_paths, flt) -> dict[str, int]:
    """(term → summed-across-generations df) for a pyarrow filter."""
    import pyarrow.dataset as pads

    acc: dict[str, int] = {}
    for p in stats_paths:
        tbl = pads.dataset(p, format="parquet").to_table(
            columns=["term", "df"], filter=flt)
        for t, d in zip(tbl.column("term").to_pylist(),
                        tbl.column("df").to_pylist()):
            acc[t] = acc.get(t, 0) + int(d)
    return acc


def _rank_cap(cands: dict[str, int], cap: int) -> list[tuple[str, int]]:
    return sorted(cands.items(), key=lambda kv: (-kv[1], kv[0]))[:cap]


def expand_prefix(stats_paths, field: str, prefix: str,
                  max_expansions: int = DEFAULT_MAX_EXPANSIONS
                  ) -> list[tuple[str, int]]:
    """Dictionary terms starting with ``prefix`` (already normalized) as
    [(term, df)], ranked df DESC / term ASC, capped. Row-group pruned:
    the (field, term)-sorted layout means the range predicate eliminates
    every row group outside [prefix, upper)."""
    import pyarrow.dataset as pads

    if not prefix:
        return []
    flt = (pads.field("field") == field) & (pads.field("term") >= prefix)
    ub = prefix_upper_bound(prefix)
    if ub is not None:
        flt = flt & (pads.field("term") < ub)
    return _rank_cap(_read_terms(stats_paths, flt), max_expansions)


def _expand_matching(stats_paths, field: str, literal_prefix: str, match,
                     cap: int) -> list[tuple[str, int]]:
    """Shared candidate read for wildcard/regex: range-pruned to
    [prefix, upper) when a safe literal prefix exists (the same
    row-group pruning as expand_prefix), the field's whole dictionary
    slice otherwise — the documented linear-in-VOCABULARY fallback for
    leading-wildcard / untethered-regex patterns, the same cost profile
    as sidecar-less fuzzy. The dictionary is vocab-scale (millions of
    terms at 100 TB, not billions of docs) and the read stays in the
    pyarrow metadata plane: no Spark job either way."""
    import pyarrow.dataset as pads

    flt = pads.field("field") == field
    if literal_prefix:
        flt = flt & (pads.field("term") >= literal_prefix)
        ub = prefix_upper_bound(literal_prefix)
        if ub is not None:
            flt = flt & (pads.field("term") < ub)
    cands = {t: d for t, d in _read_terms(stats_paths, flt).items()
             if match(t)}
    return _rank_cap(cands, cap)


def expand_wildcard(stats_paths, field: str, pattern: str,
                    max_expansions: int = DEFAULT_MAX_EXPANSIONS
                    ) -> list[tuple[str, int]]:
    """Dictionary terms fullmatching a NORMALIZED wildcard pattern as
    [(term, df)], ranked df DESC / term ASC, capped. Range-pruned by the
    literal run before the first metacharacter."""
    if not pattern:
        return []
    rx = wildcard_regex(pattern)
    return _expand_matching(stats_paths, field,
                            wildcard_literal_prefix(pattern),
                            lambda t: rx.fullmatch(t) is not None,
                            max_expansions)


def expand_regex(stats_paths, field: str, pattern: str,
                 max_expansions: int = DEFAULT_MAX_EXPANSIONS
                 ) -> list[tuple[str, int]]:
    """Dictionary terms fullmatching an anchored regex (tantivy
    RegexQuery semantics: the pattern is matched verbatim against the
    lowercase+folded dictionary, never analyzed) as [(term, df)],
    ranked df DESC / term ASC, capped. Range-pruned only when
    ``regex_literal_prefix`` finds a safe literal run."""
    if not pattern:
        return []
    rx = re.compile(pattern)
    return _expand_matching(stats_paths, field,
                            regex_literal_prefix(pattern),
                            lambda t: rx.fullmatch(t) is not None,
                            max_expansions)


def normalize_bound(bound: str | None) -> str:
    """Lowercase + ascii-fold a term-range BOUND the way the tokenizers
    normalize dictionary terms. Unlike ``normalize_pattern`` the whole
    string is kept (a bound is a comparison point against the folded
    dictionary, not a token — 'sp' and 'sp-' are both valid bounds) and
    no length cap applies (a >40-byte bound still orders correctly
    against the capped dictionary). ''/None mean unbounded."""
    return ascii_fold((bound or "").lower())


def expand_term_range(stats_paths, field: str, lower: str | None = None,
                      upper: str | None = None, include_lower: bool = True,
                      include_upper: bool = False,
                      max_expansions: int = DEFAULT_MAX_EXPANSIONS
                      ) -> list[tuple[str, int]]:
    """tantivy ``RangeQuery`` over a str field (query/range_query.rs:
    ``RangeQuery::new_str_bounds`` — the last tantivy-0.19 query shape;
    the reference's searcher reaches it through the same BooleanQuery
    machinery as every other clause): dictionary terms with
    lower ≤/< term </≤ upper as [(term, df)], ranked df DESC / term ASC,
    capped. Bounds are normalized with ``normalize_bound`` (the folded
    dictionary alphabet); a missing bound is unbounded on that side.

    This is the best-pruned member of the pattern family: the whole
    predicate is a byte-range over the (field, term)-sorted term_stats
    layout — row groups outside [lower, upper] are eliminated from
    footer min/max statistics and there is NO post-filter at all (prefix
    needs the synthetic upper bound, wildcard/regex verify candidates).
    An unbounded-both-sides range degrades to the field's dictionary
    slice, the same documented vocab-scale cost as a leading wildcard."""
    import pyarrow.dataset as pads

    lo, hi = normalize_bound(lower), normalize_bound(upper)
    if lo and hi and (lo > hi or (lo == hi
                                  and not (include_lower and include_upper))):
        return []  # empty interval — no read needed
    flt = pads.field("field") == field
    if lo:
        flt = flt & ((pads.field("term") >= lo) if include_lower
                     else (pads.field("term") > lo))
    if hi:
        flt = flt & ((pads.field("term") <= hi) if include_upper
                     else (pads.field("term") < hi))
    return _rank_cap(_read_terms(stats_paths, flt), max_expansions)


def expand_term_set(stats_paths, field: str, terms,
                    max_expansions: int = DEFAULT_MAX_EXPANSIONS
                    ) -> list[tuple[str, int]]:
    """tantivy ``TermSetQuery`` (query/term_set_query.rs, new in 0.19):
    the subset of ``terms`` present in the field's dictionary as
    [(term, df)], ranked df DESC / term ASC, capped. Terms are
    normalized with ``normalize_bound`` (lowercase + fold — the set
    addresses the folded dictionary verbatim, like every pattern shape;
    NOT stemmed: tantivy takes raw Terms). The read is a pyarrow
    IN-list predicate over the sorted term_stats — row groups outside
    [min(terms), max(terms)] prune from footer statistics, and parquet
    dictionary filtering drops non-matching pages; absent terms simply
    don't appear (no error, per tantivy)."""
    import pyarrow.dataset as pads

    keys = sorted({t for t in (normalize_bound(t) for t in terms) if t})
    if not keys:
        return []
    flt = (pads.field("field") == field) & (pads.field("term").isin(keys))
    return _rank_cap(_read_terms(stats_paths, flt), max_expansions)


def expand_fuzzy(stats_paths, field: str, term: str, distance: int = 1,
                 max_expansions: int = DEFAULT_MAX_EXPANSIONS,
                 fuzzy_paths=None) -> list[tuple[str, int]]:
    """Dictionary terms within Levenshtein ``distance`` of ``term`` as
    [(term, df)], ranked df DESC / term ASC, capped.

    With ``fuzzy_paths`` (the sidecar from index/fuzzy_dict.py, d=1
    complete): candidates via an IN-list on the deletion key — a pruned
    read over the del_key-sorted sidecar. Without it: scan the field's
    dictionary slice (field predicate pushed down) and verify — the
    linear fallback scale deployments avoid by building the sidecar.
    Both paths end in exact ``levenshtein_le`` verification, so they
    return identical results where the sidecar's d covers ``distance``."""
    import pyarrow.dataset as pads

    if not term:
        return []
    if fuzzy_paths and distance <= 1:
        keys = sorted(deletion_variants(term, 1))
        flt = (pads.field("field") == field) & (
            pads.field("del_key").isin(keys))
        cands: dict[str, int] = {}
        for p in fuzzy_paths:
            tbl = pads.dataset(p, format="parquet").to_table(
                columns=["term", "df"], filter=flt)
            for t, d in zip(tbl.column("term").to_pylist(),
                            tbl.column("df").to_pylist()):
                cands[t] = max(cands.get(t, 0), int(d))
    else:
        cands = _read_terms(stats_paths, pads.field("field") == field)
    hits = {t: d for t, d in cands.items()
            if levenshtein_le(term, t, distance) <= distance}
    return _rank_cap(hits, max_expansions)


SUGGEST_MODES = ("missing", "popular", "always")


def suggest_terms(stats_paths, field: str, term: str, distance: int = 2,
                  limit: int = 5, mode: str = "popular",
                  fuzzy_paths=None) -> list[tuple[str, int, int]]:
    """Spelling suggestions for ``term`` — the Lucene DirectSpellChecker
    / ES term-suggester analog (public Lucene/ES surface; tantivy users
    build the same thing over FuzzyTermQuery's dictionary automaton).
    Returns [(suggestion, df, dist)] ranked (dist ASC, df DESC, term
    ASC) — closer corrections first, popularity breaks ties — capped at
    ``limit``; the input term itself is never suggested.

    ``mode`` is the ES ``suggest_mode`` contract:
      - 'missing'  — suggest only when the input term is NOT in the
        dictionary (df == 0); the spell-check-on-zero-results shape.
      - 'popular'  — only corrections with df strictly greater than the
        input's own df (the did-you-mean shape; default).
      - 'always'   — every in-distance dictionary term.

    Candidate generation reuses the fuzzy machinery: the SymSpell
    deletion-key sidecar when it covers ``distance`` (a pruned IN-list
    read), the field's dictionary slice + banded-Levenshtein verify
    otherwise — driver-side pyarrow either way, ZERO Spark jobs. The
    input's own df rides the same read (exact-match candidate at
    dist 0), so no second dictionary lookup is needed."""
    out = suggest_query_terms(stats_paths, field, [term],
                              distance=distance, limit=limit, mode=mode,
                              fuzzy_paths=fuzzy_paths)
    return out.get(term, [])


def suggest_query_terms(stats_paths, field: str, terms, distance: int = 2,
                        limit: int = 5, mode: str = "popular",
                        fuzzy_paths=None) -> dict[str, list[tuple[str, int, int]]]:
    """Batch form of ``suggest_terms`` for a whole query's term stream:
    ONE dictionary read serves EVERY input term — the sidecar path
    unions the deletion keys into a single IN-list (per-term exactness
    is unchanged: the union is a superset of each term's own key
    neighborhood and the exact Levenshtein verify runs per term), the
    slice path reads the field's dictionary once. Returns
    {input_term: ranked suggestions}; ranking/mode semantics are
    ``suggest_terms``'s, per input term."""
    import pyarrow.dataset as pads

    if mode not in SUGGEST_MODES:
        raise ValueError(f"mode must be one of {SUGGEST_MODES}: {mode!r}")
    if distance < 1:
        raise ValueError(f"distance must be >= 1: {distance}")
    uniq = [t for t in dict.fromkeys(terms) if t]
    if not uniq:
        return {}
    if fuzzy_paths and distance <= 1:
        keys = sorted({k for t in uniq for k in deletion_variants(t, 1)})
        flt = (pads.field("field") == field) & (
            pads.field("del_key").isin(keys))
        cands: dict[str, int] = {}
        for p in fuzzy_paths:
            tbl = pads.dataset(p, format="parquet").to_table(
                columns=["term", "df"], filter=flt)
            for t, d in zip(tbl.column("term").to_pylist(),
                            tbl.column("df").to_pylist()):
                cands[t] = max(cands.get(t, 0), int(d))
    else:
        cands = _read_terms(stats_paths, pads.field("field") == field)
    out: dict[str, list[tuple[str, int, int]]] = {}
    for term in uniq:
        self_df = cands.get(term, 0)
        if mode == "missing" and self_df > 0:
            out[term] = []
            continue
        floor = self_df if mode == "popular" else -1
        hits = []
        for t, d in cands.items():
            if t == term or d <= floor:
                continue
            dist = levenshtein_le(term, t, distance)
            if dist <= distance:
                hits.append((t, d, dist))
        hits.sort(key=lambda x: (x[2], -x[1], x[0]))
        out[term] = hits[:limit]
    return out
