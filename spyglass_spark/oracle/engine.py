"""Pure-Python single-process reference engine ("the oracle").

Implements the full index + query semantics of SURVEY.md §2.11 without any
Spark machinery. The distributed engine must produce rank-identical top-k
(docIDs AND float32 scores) against this oracle — the parity tests in
tests/test_search_parity.py are the BM25 rank-identity gate of
BASELINE.json.

Mirrors the reference E2E pattern at
/root/reference/crates/spyglass-searcher/src/lib.rs:180-317.

Canonical document ordering: doc ordinals are assigned by ascending ``url``
(unique key). The Spark builder uses the same rule, so ordinals — and the
(score desc, ord asc) tie-break — agree across implementations and across
parallelism levels.

Field semantics:
  content — spyglass_tokenizer_en; fieldnorm = emitted token count
  title   — default tokenizer;      fieldnorm = emitted token count
  id/domain/url — untokenized single term; fieldnorm = 1
  tags    — one term per tag id (decimal string); fieldnorm = #tags
Fieldnorms are quantized to u8 and decoded for scoring (fieldnorm.py);
avgdl per field = exact total emitted tokens / N.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from ..analysis.analyzer import analyze
from ..index.fieldnorm import fieldnorm_to_id, id_to_fieldnorm
from ..query.compiler import (CompiledQuery, compile_expanded,
                              compile_phrase_prefix, compile_query,
                              resolve_min_should_match, split_phrase_prefix)
from ..query.expand import (DEFAULT_MAX_EXPANSIONS, levenshtein_le,
                            normalize_bound, normalize_pattern,
                            normalize_wildcard)
from ..query.scoring import K1, bm25_weight, idf, norm_cache, sloppy_phrase_count

BASE_FIELDS = ("content", "title", "id", "domain", "url", "tags")


class OracleIndex:
    def __init__(self) -> None:
        self.docs: list[dict] = []  # ord -> doc dict
        self.postings: dict[tuple[str, str], list[tuple[int, int, np.ndarray]]] = {}
        self.norm_ids: dict[str, np.ndarray] = {}
        self.totals: dict[str, int] = {}
        self.n_docs = 0
        self.tombstoned: set[int] = set()

    def delete_by_ids(self, doc_ids) -> None:
        """Tombstone semantics: excluded from hits, but N/df/avgdl keep
        counting the deleted docs until a merge (tantivy max_doc model)."""
        ids = set(doc_ids)
        for ord_, d in enumerate(self.docs):
            if d["doc_id"] in ids:
                self.tombstoned.add(ord_)

    @classmethod
    def build(cls, docs: list[dict], num_partitions: int | None = None) -> "OracleIndex":
        """docs: dicts with doc_id,url,domain,title,content,tags(list[int]).

        ``num_partitions`` replicates the Spark builder's deterministic
        hash partitioning (builder.part_id_py): ordinal order becomes
        (part_id, url), matching the engine's doc_ord = part_id<<40+rank
        tie-break ordering exactly."""
        return cls.build_generations([(docs, num_partitions)])

    @classmethod
    def build_generations(cls, gens: list[tuple[list[dict], int | None]]) -> "OracleIndex":
        """Multi-generation build mirroring the engine's upsert layout:
        generation g's partitions come after all earlier generations'
        (part offsets), so ordinal tie-break order is gen-major."""
        idx = cls()
        docs: list[dict] = []
        for gdocs, num_partitions in gens:
            if num_partitions:
                from ..index.builder import part_id_py

                docs.extend(sorted(
                    gdocs, key=lambda d: (part_id_py(d["url"], num_partitions), d["url"])))
            else:
                docs.extend(sorted(gdocs, key=lambda d: d["url"]))
        idx.docs = docs
        idx.n_docs = len(docs)
        custom = sorted({k[3:] for d in docs for k in d if k.startswith("cf_")})
        has_desc = any("description" in d for d in docs)
        fields = BASE_FIELDS + (("description",) if has_desc else ()) + tuple(custom)
        idx.fields = fields
        postings: dict[tuple[str, str], list] = defaultdict(list)
        norms = {f: np.zeros(len(docs), dtype=np.uint8) for f in fields}
        totals = {f: 0 for f in fields}
        for ord_, doc in enumerate(docs):
            fielded = {
                "content": doc.get("content", ""),
                "title": doc.get("title", ""),
                "id": doc.get("doc_id", ""),
                "domain": doc.get("domain", ""),
                "url": doc.get("url", ""),
            }
            if has_desc:
                fielded["description"] = doc.get("description", "") or ""
            for field, text in fielded.items():
                toks = analyze(field, text)
                totals[field] += len(toks)
                norms[field][ord_] = fieldnorm_to_id(len(toks))
                by_term: dict[str, list[int]] = defaultdict(list)
                for pos, term in toks:
                    by_term[term].append(pos)
                for term, positions in by_term.items():
                    postings[(field, term)].append(
                        (ord_, len(positions), np.asarray(positions, dtype=np.uint64)))
            tags = sorted(set(int(t) for t in (doc.get("tags") or [])))
            totals["tags"] += len(tags)
            norms["tags"][ord_] = fieldnorm_to_id(len(tags))
            for t in tags:
                postings[("tags", str(t))].append((ord_, 1, np.array([0], dtype=np.uint64)))
            for cf in custom:
                v = doc.get("cf_" + cf)
                if v is None:
                    continue
                totals[cf] += 1
                norms[cf][ord_] = fieldnorm_to_id(1)
                postings[(cf, str(int(v)))].append((ord_, 1, np.array([0], dtype=np.uint64)))
        idx.postings = dict(postings)
        idx.norm_ids = norms
        idx.totals = totals
        return idx

    # -- stats ---------------------------------------------------------

    def df(self, field: str, term: str) -> int:
        return len(self.postings.get((field, term), ()))

    def avgdl(self, field: str) -> float:
        return self.totals[field] / self.n_docs if self.n_docs else 1.0

    # -- search --------------------------------------------------------

    def _clause_scores(self, clause, caches) -> dict[int, np.float32]:
        """ord -> float32 score for one clause (0-boost clauses score 0)."""
        field = clause.field
        cache = caches[field]
        if clause.kind == "term":
            plist = self.postings.get((field, clause.terms[0]), [])
            if not plist:
                return {}
            w = bm25_weight(self.df(field, clause.terms[0]), self.n_docs, clause.boost)
            out = {}
            for ord_, tf, _pos in plist:
                norm = cache[self.norm_ids[field][ord_]]
                out[ord_] = np.float32(w) * np.float32(tf) / (np.float32(tf) + norm)
            return out
        # phrase: docs containing all terms; tf = sloppy match count
        term_lists = [self.postings.get((field, t), []) for t in clause.terms]
        if any(not pl for pl in term_lists):
            return {}
        # phrase weight: boost * (sum of member-term idfs) * (k1+1)
        idf_sum = np.float32(0.0)
        for t in clause.terms:
            idf_sum += idf(self.df(field, t), self.n_docs)
        w = np.float32(clause.boost) * idf_sum * (K1 + np.float32(1.0))
        maps = [{o: p for o, _tf, p in pl} for pl in term_lists]
        common = set(maps[0])
        for m in maps[1:]:
            common &= set(m)
        out = {}
        for ord_ in common:
            tf = sloppy_phrase_count([m[ord_] for m in maps], list(clause.positions), clause.slop)
            if tf > 0:
                norm = cache[self.norm_ids[field][ord_]]
                out[ord_] = w * np.float32(tf) / (np.float32(tf) + norm)
        return out

    def _matches(self, clause) -> set[int]:
        if clause.kind == "term":
            return {o for o, _t, _p in self.postings.get((clause.field, clause.terms[0]), [])}
        scores = self._clause_scores_nofilter(clause)
        return scores

    def _clause_scores_nofilter(self, clause) -> set[int]:
        field = clause.field
        term_lists = [self.postings.get((field, t), []) for t in clause.terms]
        if any(not pl for pl in term_lists):
            return set()
        maps = [{o: p for o, _tf, p in pl} for pl in term_lists]
        common = set(maps[0])
        for m in maps[1:]:
            common &= set(m)
        return {o for o in common
                if sloppy_phrase_count([m[o] for m in maps], list(clause.positions), clause.slop) > 0}

    def execute(self, cq: CompiledQuery, k: int = 5, offset: int = 0) -> list[dict]:
        fields = getattr(self, "fields", BASE_FIELDS)
        caches = {f: norm_cache(self.avgdl(f)) for f in fields}
        for c in cq.all_clauses():
            if c.field not in caches:
                caches[c.field] = norm_cache(1.0)
        group_scores = [self._clause_scores(c, caches) if c.scoring else
                        {o: np.float32(0.0) for o in self._matches(c)}
                        for c in cq.should_group]
        must_scores = [self._clause_scores(c, caches) if c.scoring else
                       {o: np.float32(0.0) for o in self._matches(c)}
                       for c in cq.musts]
        # candidate set: every Must group/clause must match. The Should
        # group requires ≥ max(1, min_should_match) DISTINCT matching
        # clauses (Lucene setMinimumNumberShouldMatch; 0/1 = the
        # reference's plain Must-wrap union).
        msm = max(1, int(getattr(cq, "min_should_match", 0)))
        must_sets: list[set[int]] = []
        if cq.should_group:
            if msm <= 1:
                u: set[int] = set()
                for gs in group_scores:
                    u |= set(gs)
            else:
                cnt: dict[int, int] = defaultdict(int)
                for gs in group_scores:
                    for o in gs:
                        cnt[o] += 1
                u = {o for o, c in cnt.items() if c >= msm}
            must_sets.append(u)
        for grp in cq.extra_groups:
            u = set()
            for c in grp:
                u |= self._matches(c)
            must_sets.append(u)
        for ms in must_scores:
            must_sets.append(set(ms))
        for rfield, ge, le in getattr(cq, "range_musts", ()):
            s_rng = set()
            for ord_, d in enumerate(self.docs):
                v = d.get(rfield)
                v = -1 if v is None else int(v)
                if v >= 0 and (ge is None or v >= ge) and (le is None or v <= le):
                    s_rng.add(ord_)
            must_sets.append(s_rng)
        if not must_sets:
            return []
        candidates = set(must_sets[0])
        for s_ in must_sets[1:]:
            candidates &= s_
        for c in cq.must_nots:
            candidates -= self._matches(c)
        candidates -= self.tombstoned
        extra_scores = [self._clause_scores(c, caches) for c in cq.should_extra]

        dismax = getattr(cq, "combiner", "sum") == "dismax"
        tie = np.float32(getattr(cq, "tie_breaker", 0.0))
        results = []
        for ord_ in candidates:
            s = np.float32(0.0)
            if dismax:
                # DisjunctionMaxQuery combiner twin: same float32 op
                # order as _score_partition's vectorized branch — m =
                # running max, s = clause-order sum over the Should
                # group, core = m + tie·(s − m); Musts/extras then add.
                m = np.float32(0.0)
                for gs in group_scores:
                    if ord_ in gs:
                        v = gs[ord_]
                        s = s + v
                        if v > m:
                            m = v
                s = m + tie * (s - m)
            else:
                for gs in group_scores:
                    if ord_ in gs:
                        s += gs[ord_]
            for ms in must_scores:
                if ord_ in ms:
                    s += ms[ord_]
            for es in extra_scores:
                if ord_ in es:
                    s += es[ord_]
            results.append((float(np.float32(s)), ord_))
        # score > 0 post-filter (client/local.rs:138), tie-break (score desc, ord asc)
        results = [(s, o) for s, o in results if s > 0.0]
        results.sort(key=lambda x: (-x[0], x[1]))
        out = []
        for rank, (s, o) in enumerate(results[offset:offset + k], start=1 + offset):
            d = self.docs[o]
            out.append({"rank": rank, "doc_id": d["doc_id"], "url": d["url"],
                        "domain": d["domain"], "title": d["title"],
                        "description": d.get("description"),
                        "tags": sorted(int(t) for t in (d.get("tags") or [])),
                        "score": s, "doc_ord": o})
        return out

    def search(self, query: str, filters=(), boosts=(), k: int = 5,
               offset: int = 0, combiner: str = "sum",
               tie_breaker: float = 0.0,
               min_should_match: int | str = 0):
        cq = compile_query(query, filters, boosts)
        cq.combiner, cq.tie_breaker = combiner, float(tie_breaker)
        cq.min_should_match = resolve_min_should_match(
            min_should_match, len(cq.should_group))
        return self.execute(cq, k=k, offset=offset)

    # -- multi-term pattern queries (brute-force twin of query/expand) --
    # The oracle enumerates its whole dictionary and tests every term —
    # deliberately independent of the engine's range-scan (prefix) and
    # SymSpell deletion-index (fuzzy) candidate generation, so parity
    # checks those data structures, not just the scoring.

    def _expand(self, field: str, match, cap: int) -> list[str]:
        cands = {t: self.df(field, t) for (f, t) in self.postings
                 if f == field and match(t)}
        return [t for t, _ in sorted(cands.items(),
                                     key=lambda kv: (-kv[1], kv[0]))[:cap]]

    def search_prefix(self, pattern: str, k: int = 5, offset: int = 0,
                      fields=("content", "title"),
                      max_expansions: int = DEFAULT_MAX_EXPANSIONS,
                      filters=(), boosts=()):
        norm = normalize_pattern(pattern)
        per_field = {f: self._expand(f, lambda t: t.startswith(norm),
                                     max_expansions)
                     for f in fields} if norm else {}
        return self.execute(compile_expanded(per_field, filters, boosts),
                            k=k, offset=offset)

    def search_wildcard(self, pattern: str, k: int = 5, offset: int = 0,
                        fields=("content", "title"),
                        max_expansions: int = DEFAULT_MAX_EXPANSIONS,
                        filters=(), boosts=()):
        """Matches with stdlib ``fnmatch.fnmatchcase`` — deliberately a
        DIFFERENT matcher than the engine's regex translation (on the
        normalized alphabet [a-z0-9*?] the languages coincide), so
        parity checks the translation as well as the pruned read."""
        from fnmatch import fnmatchcase

        norm = normalize_wildcard(pattern)
        per_field = {f: self._expand(f, lambda t: fnmatchcase(t, norm),
                                     max_expansions)
                     for f in fields} if norm else {}
        return self.execute(compile_expanded(per_field, filters, boosts),
                            k=k, offset=offset)

    def search_regex(self, pattern: str, k: int = 5, offset: int = 0,
                     fields=("content", "title"),
                     max_expansions: int = DEFAULT_MAX_EXPANSIONS,
                     filters=(), boosts=()):
        """Anchored fullmatch over the WHOLE enumerated dictionary — no
        literal-prefix pruning, so parity against the engine checks
        ``regex_literal_prefix``'s safety on every tested pattern."""
        import re as _re

        rx = _re.compile(pattern)
        per_field = {
            f: self._expand(f, lambda t: rx.fullmatch(t) is not None,
                            max_expansions)
            for f in fields} if pattern else {}
        return self.execute(compile_expanded(per_field, filters, boosts),
                            k=k, offset=offset)

    def search_term_range(self, lower=None, upper=None,
                          include_lower: bool = True,
                          include_upper: bool = False,
                          k: int = 5, offset: int = 0,
                          fields=("content", "title"),
                          max_expansions: int = DEFAULT_MAX_EXPANSIONS,
                          filters=(), boosts=()):
        """tantivy RangeQuery twin: plain Python string comparisons over
        the WHOLE enumerated dictionary — deliberately independent of
        the engine's pyarrow byte-range predicate, so parity checks the
        pruned read's bound handling (inclusive/exclusive/unbounded)."""
        lo, hi = normalize_bound(lower), normalize_bound(upper)

        def match(t: str) -> bool:
            if lo and not (t >= lo if include_lower else t > lo):
                return False
            if hi and not (t <= hi if include_upper else t < hi):
                return False
            return True

        per_field = {f: self._expand(f, match, max_expansions)
                     for f in fields}
        return self.execute(compile_expanded(per_field, filters, boosts),
                            k=k, offset=offset)

    def search_term_set(self, terms, k: int = 5, offset: int = 0,
                        fields=("content", "title"),
                        max_expansions: int = DEFAULT_MAX_EXPANSIONS,
                        filters=(), boosts=()):
        """tantivy TermSetQuery twin: normalize the set, then test every
        enumerated dictionary term for membership — independent of the
        engine's pyarrow IN-list read."""
        keys = {t for t in (normalize_bound(t) for t in terms) if t}
        per_field = {f: self._expand(f, lambda t: t in keys,
                                     max_expansions)
                     for f in fields} if keys else {}
        return self.execute(compile_expanded(per_field, filters, boosts),
                            k=k, offset=offset)

    def search_parsed(self, qs: str, filters=(), boosts=(), k: int = 5,
                      offset: int = 0,
                      max_expansions: int = DEFAULT_MAX_EXPANSIONS,
                      combiner: str = "sum", tie_breaker: float = 0.0,
                      min_should_match: int | str = 0):
        """Query-string parser twin (query/parser.py grammar — the
        tantivy QueryParser analog). The PARSER is shared scalar code
        like the compiler; the oracle supplies its whole-dictionary
        comparison enumeration for [a TO b] atoms — independent of the
        engine's pyarrow byte-range read, so parity checks the pruned
        read under every parsed range shape."""
        from ..query.parser import parse_with_filters

        def expand_rng(f, lo, hi, ilo, ihi, cap):
            lo_n, hi_n = normalize_bound(lo), normalize_bound(hi)

            def match(t: str) -> bool:
                if lo_n and not (t >= lo_n if ilo else t > lo_n):
                    return False
                if hi_n and not (t <= hi_n if ihi else t < hi_n):
                    return False
                return True

            return self._expand(f, match, cap)

        cq = parse_with_filters(qs, filters, boosts,
                                expand_range=expand_rng,
                                max_expansions=max_expansions)
        cq.combiner, cq.tie_breaker = combiner, float(tie_breaker)
        cq.min_should_match = resolve_min_should_match(
            min_should_match, len(cq.should_group))
        return self.execute(cq, k=k, offset=offset)

    def search_phrase_prefix(self, query: str, k: int = 5, offset: int = 0,
                             fields=("content", "title"),
                             max_expansions: int = DEFAULT_MAX_EXPANSIONS,
                             filters=(), boosts=()):
        """PhrasePrefixQuery twin: brute-force prefix expansion over the
        enumerated dictionary, completed phrases scored by the shared
        scalar kernel (execute handles phrase clauses natively)."""
        fixed, raw_prefix = split_phrase_prefix(query)
        norm = normalize_pattern(raw_prefix)
        per_field = {f: self._expand(f, lambda t: t.startswith(norm),
                                     max_expansions)
                     for f in fields} if norm else {}
        return self.execute(
            compile_phrase_prefix(fixed, per_field, filters, boosts),
            k=k, offset=offset)

    def suggest(self, term: str, field: str = "content",
                distance: int = 2, limit: int = 5,
                mode: str = "popular") -> list[dict]:
        """Term-suggester twin (Lucene DirectSpellChecker / ES term
        suggester — expand.suggest_terms documents the contract): brute
        Levenshtein over the WHOLE enumerated dictionary, deliberately
        independent of the engine's SymSpell deletion-key sidecar and
        pyarrow slice reads, ranked (dist ASC, df DESC, term ASC)."""
        from ..query.expand import (SUGGEST_MODES, levenshtein_le,
                                    normalize_pattern)

        if mode not in SUGGEST_MODES:
            raise ValueError(f"mode must be one of {SUGGEST_MODES}: {mode!r}")
        norm = normalize_pattern(term)
        if not norm or distance < 1:
            return []
        self_df = self.df(field, norm)
        if mode == "missing" and self_df > 0:
            return []
        floor = self_df if mode == "popular" else -1
        hits = []
        for (f, t) in self.postings:
            if f != field or t == norm:
                continue
            d = self.df(field, t)
            if d <= floor:
                continue
            dist = levenshtein_le(norm, t, distance)
            if dist <= distance:
                hits.append((t, d, dist))
        hits.sort(key=lambda x: (x[2], -x[1], x[0]))
        return [{"term": t, "df": d, "dist": x}
                for t, d, x in hits[:limit]]

    def suggest_query(self, query: str, field: str = "content",
                      distance: int = 2, limit_per_term: int = 3,
                      mode: str = "missing") -> dict:
        """Whole-query did-you-mean twin (SearchEngine.suggest_query
        documents the contract): the SAME shared scalar analyzer
        produces the term stream, each term goes through this oracle's
        own brute-dictionary ``suggest``, and the rewrite composes
        identically — independent of the engine's batched one-read
        pyarrow path."""
        from ..analysis.analyzer import tokenize_default, tokenize_en

        tok = tokenize_en if field == "content" else tokenize_default
        toks = [t for _, t in tok(query or "")]
        per = {t: self.suggest(t, field=field, distance=distance,
                               limit=limit_per_term, mode=mode)
               for t in dict.fromkeys(toks)}
        corrected = " ".join(per[t][0]["term"] if per.get(t) else t
                             for t in toks)
        return {"corrected": corrected,
                "changed": corrected != " ".join(toks),
                "terms": [{"term": t, "suggestions": per[t]}
                          for t in dict.fromkeys(toks)]}

    def search_fuzzy(self, term: str, distance: int = 1, k: int = 5,
                     offset: int = 0, fields=("content", "title"),
                     max_expansions: int = DEFAULT_MAX_EXPANSIONS,
                     filters=(), boosts=()):
        norm = normalize_pattern(term)
        per_field = {
            f: self._expand(
                f, lambda t: levenshtein_le(norm, t, distance) <= distance,
                max_expansions)
            for f in fields} if norm else {}
        return self.execute(compile_expanded(per_field, filters, boosts),
                            k=k, offset=offset)
