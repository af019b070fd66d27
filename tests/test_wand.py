"""Block-max WAND: exact equality with exhaustive scoring + proof that
pruning actually skips block decodes."""

import numpy as np
import pytest

from spyglass_spark.index.codecs import encode_positions, encode_postings
from spyglass_spark.index.fieldnorm import fieldnorm_to_id
from spyglass_spark.query.scoring import norm_cache, score_postings
from spyglass_spark.query.wand import _ClauseData, wand_top_k


def _mk_row(docs, tfs, norm_ids, positions=None):
    db, tb, mb = encode_postings(docs, tfs, norm_ids[docs.astype(np.int64)])
    pos = positions if positions is not None else \
        [np.arange(t, dtype=np.uint64) for t in tfs]
    return {"doc_bytes": db, "tf_bytes": tb, "meta_bytes": mb,
            "pos_bytes": encode_positions(pos)}


@pytest.fixture(scope="module")
def big_part():
    """50k-doc partition, 3 terms with different df/tf profiles."""
    rng = np.random.default_rng(123)
    n_docs = 50_000
    norms = fieldnorm_to_id(rng.integers(5, 400, size=n_docs))
    cache = norm_cache(80.0)
    terms = {}
    for name, df_, tfmax in [("common", 30_000, 4), ("medium", 3_000, 12)]:
        docs = np.sort(rng.choice(n_docs, size=df_, replace=False)).astype(np.uint64)
        tfs = rng.integers(1, tfmax + 1, size=df_).astype(np.uint64)
        terms[name] = (docs, tfs)
    # rare term clustered in a narrow ord range: segments far from the
    # cluster have UB below θ once the heap fills → block skips
    docs = np.arange(1000, 1120, dtype=np.uint64)
    tfs = rng.integers(10, 31, size=docs.size).astype(np.uint64)
    terms["rare"] = (docs, tfs)
    return dict(n_docs=n_docs, norms=norms, cache=cache, terms=terms)


def _spec(weight, kind="term", positions=(0,), slop=0):
    return {"kind": kind, "field": "content", "terms": ["t"] * len(positions),
            "positions": list(positions), "slop": slop, "boost": 1.0,
            "weight": float(weight), "scoring": True, "role": "should"}


def _exhaustive(big, specs_and_terms, include, exclude, k):
    scores = {}
    for spec, tname in specs_and_terms:
        docs, tfs = big["terms"][tname]
        s = score_postings(tfs, big["norms"][docs.astype(np.int64)],
                           spec["weight"], big["cache"])
        for d, v in zip(docs.astype(np.int64), s):
            scores[d] = np.float32(scores.get(d, np.float32(0.0)) + v)
    items = [(d, v) for d, v in scores.items()
             if (include is None or d in include)
             and (exclude is None or d not in set(exclude.tolist()))
             and v > 0]
    items.sort(key=lambda x: (-x[1], x[0]))
    return items[:k]


def test_wand_equals_exhaustive_and_prunes(big_part):
    big = big_part
    pairs = [(_spec(5.0), "rare"), (_spec(0.9), "medium"), (_spec(0.5), "common")]
    clauses = []
    for spec, tname in pairs:
        docs, tfs = big["terms"][tname]
        row = _mk_row(docs, tfs, big["norms"])
        clauses.append(_ClauseData(spec, [row], big["cache"], big["norms"]))

    ords, scores = wand_top_k(clauses, None, None, 10)
    expected = _exhaustive(big, pairs, None, None, 10)
    assert [int(o) for o in ords] == [d for d, _ in expected]
    assert all(np.float32(s) == v for s, (_, v) in zip(scores, expected))

    # pruning proof: the common term must not have all blocks decoded
    common_cd = clauses[2]
    total_blocks = len(common_cd.metas[0])
    decoded = sum(1 for k in common_cd.shared
                  if k[0] == "blk" and k[1] == common_cd.keys[0])
    assert decoded < total_blocks, (decoded, total_blocks)


def test_wand_with_filters(big_part):
    big = big_part
    rng = np.random.default_rng(5)
    include = np.sort(rng.choice(big["n_docs"], size=5_000, replace=False)).astype(np.int64)
    exclude = np.sort(rng.choice(big["n_docs"], size=500, replace=False)).astype(np.int64)
    pairs = [(_spec(1.8), "medium"), (_spec(0.7), "common")]
    clauses = []
    for spec, tname in pairs:
        docs, tfs = big["terms"][tname]
        clauses.append(_ClauseData(spec, [_mk_row(docs, tfs, big["norms"])],
                                   big["cache"], big["norms"]))
    ords, scores = wand_top_k(clauses, include, exclude, 10)
    inc_set = set(include.tolist())
    expected = _exhaustive(big, pairs, inc_set, exclude, 10)
    assert [int(o) for o in ords] == [d for d, _ in expected]
    assert all(np.float32(s) == v for s, (_, v) in zip(scores, expected))


def test_wand_after_cursor_walks_full_ranking(big_part):
    """Cursor paging at the kernel level: walking k=7 pages via the
    (score, ord) cursor must reproduce the exhaustive full ranking
    exactly, for every cursor position (ties included — the 'common'
    term produces many equal scores), and θ pruning must not drop
    equal-score-later-ord docs."""
    big = big_part
    pairs = [(_spec(5.0), "rare"), (_spec(0.9), "medium"), (_spec(0.5), "common")]
    clauses = []
    for spec, tname in pairs:
        docs, tfs = big["terms"][tname]
        clauses.append(_ClauseData(spec, [_mk_row(docs, tfs, big["norms"])],
                                   big["cache"], big["norms"]))

    full = _exhaustive(big, pairs, None, None, 10**9)
    walked, after = [], None
    for _ in range(len(full) // 7 + 2):
        ords, scores = wand_top_k(clauses, None, None, 7, after=after)
        if ords.size == 0:
            break
        walked.extend((int(o), np.float32(s)) for o, s in zip(ords, scores))
        after = (float(scores[-1]), int(ords[-1]))
    assert walked == full

    # arbitrary mid-tie cursor: page = the exhaustive slice after it
    mid = full[len(full) // 2]
    ords, scores = wand_top_k(clauses, None, None, 9,
                              after=(float(mid[1]), int(mid[0])))
    exp = full[len(full) // 2 + 1:][:9]
    assert [(int(o), np.float32(s)) for o, s in zip(ords, scores)] == exp

    # cursor past the end → empty
    last = full[-1]
    ords, _ = wand_top_k(clauses, None, None, 5,
                         after=(float(last[1]), int(last[0])))
    assert ords.size == 0


def test_engine_wand_equals_exhaustive(spark, built_index):
    """Engine-level: every query of the parity set gives identical results
    under algo='auto' (WAND) and algo='exhaustive'."""
    from spyglass_spark.query.executor import SearchEngine

    eng = SearchEngine(spark, built_index["index_dir"])
    queries = [{"query": q} for q in
               ["salinas", "fn", "import sys", "parse token stream",
                "vector compress delta", "the parsing of tokens"]]
    a = eng.search_many(queries, k=8, algo="auto").collect()
    b = eng.search_many(queries, k=8, algo="exhaustive").collect()
    key = lambda r: (r["query_id"], r["rank"])
    a, b = sorted(a, key=key), sorted(b, key=key)
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert (ra["query_id"], ra["rank"], ra["doc_id"], ra["score"]) == \
               (rb["query_id"], rb["rank"], rb["doc_id"], rb["score"])


def test_engine_wand_range_filters(spark, built_index):
    """Date-range Musts now run INSIDE WAND (fast-field mask as
    filter_include) instead of forcing the exhaustive fallback: results
    must stay identical, the filter must be selective, and the WAND path
    must actually be taken for the range shape."""
    from spyglass_spark.query.executor import SearchEngine, _wand_eligible

    eng = SearchEngine(spark, built_index["index_dir"])
    docs = built_index["docs"]
    mids = sorted(d["lastmodified"] for d in docs)
    pubs = sorted(d["published"] for d in docs)
    queries = [
        {"query": "index search", "filters": [("lastmodified_ge", mids[len(mids) // 2])]},
        {"query": "fn", "filters": [("published_ge", pubs[10]),
                                    ("lastmodified_le", mids[-10])]},
        {"query": "parse token stream", "filters": [("published_le", pubs[-5])]},
    ]
    from spyglass_spark.query.compiler import compile_query
    from spyglass_spark.query.executor import _clause_specs

    for q in queries:
        cq = compile_query(q["query"], q["filters"])
        dfs = eng._term_dfs(cq.term_keys())
        assert _wand_eligible(_clause_specs(cq, dfs, eng.manifest.num_docs))
    a = eng.search_many(queries, k=8, algo="auto").collect()
    b = eng.search_many(queries, k=8, algo="exhaustive").collect()
    key = lambda r: (r["query_id"], r["rank"])
    a, b = sorted(a, key=key), sorted(b, key=key)
    assert len(a) == len(b) and len(a) > 0
    for ra, rb in zip(a, b):
        assert (ra["query_id"], ra["rank"], ra["doc_id"], ra["score"]) == \
               (rb["query_id"], rb["rank"], rb["doc_id"], rb["score"])
    # selectivity: the oracle agrees AND the filter removes hits
    oracle = built_index["oracle"]
    for qi, q in enumerate(queries):
        ohits = oracle.search(q["query"], q["filters"], k=8)
        spark_rows = [r for r in a if r["query_id"] == qi]
        assert [r["doc_id"] for r in spark_rows] == [h["doc_id"] for h in ohits]
        assert len(ohits) <= len(oracle.search(q["query"], k=8))


def test_engine_wand_scoring_must(spark, built_index):
    """Scoring single-term Musts (favorite_required: tag filter that ALSO
    boosts, query.rs:113-114) now run inside WAND — the must is both an
    include filter and a scoring clause appended after the Should group
    (float32 clause order preserved). Results must be bitwise identical
    to the exhaustive scorer and to the scalar oracle, and the shape must
    actually take the WAND path. A doc matching only the must (none of
    the Shoulds) must NOT appear (candidates come from Shoulds alone)."""
    from spyglass_spark.query.compiler import compile_query
    from spyglass_spark.query.executor import SearchEngine, _clause_specs, _wand_eligible

    eng = SearchEngine(spark, built_index["index_dir"])
    tags_dim = built_index["tags_dim"]
    tag_ids = sorted(tags_dim.values()) if isinstance(tags_dim, dict) else \
        sorted(t["id"] for t in tags_dim)
    queries = [
        {"query": "parse token stream",
         "filters": [("favorite_required", tag_ids[0])]},
        {"query": "fn", "filters": [("favorite_required", tag_ids[1]),
                                    ("tag", tag_ids[0])]},
    ]
    for q in queries:
        cq = compile_query(q["query"], q["filters"])
        dfs = eng._term_dfs(cq.term_keys())
        specs = _clause_specs(cq, dfs, eng.manifest.num_docs)
        assert any(s["role"] == "must" and s["scoring"] for s in specs)
        assert _wand_eligible(specs)
    a = eng.search_many(queries, k=8, algo="auto").collect()
    assert eng.last_meta["wand_eligible"] == len(queries)
    b = eng.search_many(queries, k=8, algo="exhaustive").collect()
    key = lambda r: (r["query_id"], r["rank"])
    a, b = sorted(a, key=key), sorted(b, key=key)
    assert len(a) == len(b) and len(a) > 0
    for ra, rb in zip(a, b):
        assert (ra["query_id"], ra["rank"], ra["doc_id"], ra["score"]) == \
               (rb["query_id"], rb["rank"], rb["doc_id"], rb["score"])
    oracle = built_index["oracle"]
    for qi, q in enumerate(queries):
        ohits = oracle.search(q["query"], q["filters"], k=8)
        spark_rows = [r for r in a if r["query_id"] == qi]
        assert [r["doc_id"] for r in spark_rows] == [h["doc_id"] for h in ohits]
        assert [np.float32(r["score"]) for r in spark_rows] == \
               [np.float32(h["score"]) for h in ohits]


def test_engine_wand_favorite_extra(spark, built_index):
    """Plain favorite filters (Should-extra: score-only tag boost outside
    the Must-wrapped Should group) also run inside WAND now — the extra
    clause joins the scoring list after the musts (float32 clause order)
    but never nominates candidates. Bitwise auto == exhaustive == scalar
    oracle."""
    from spyglass_spark.query.compiler import compile_query
    from spyglass_spark.query.executor import SearchEngine, _clause_specs, _wand_eligible

    eng = SearchEngine(spark, built_index["index_dir"])
    tags_dim = built_index["tags_dim"]
    tag_ids = sorted(tags_dim.values()) if isinstance(tags_dim, dict) else \
        sorted(t["id"] for t in tags_dim)
    queries = [
        {"query": "parse token stream", "filters": [("favorite", tag_ids[0])]},
        {"query": "fn", "filters": [("favorite", tag_ids[1]),
                                    ("tag", tag_ids[0])]},
    ]
    for q in queries:
        cq = compile_query(q["query"], q["filters"])
        dfs = eng._term_dfs(cq.term_keys())
        specs = _clause_specs(cq, dfs, eng.manifest.num_docs)
        assert any(s["role"] == "should_extra" and s["scoring"] for s in specs)
        assert _wand_eligible(specs)
    a = eng.search_many(queries, k=8, algo="auto").collect()
    b = eng.search_many(queries, k=8, algo="exhaustive").collect()
    key = lambda r: (r["query_id"], r["rank"])
    a, b = sorted(a, key=key), sorted(b, key=key)
    assert len(a) == len(b) and len(a) > 0
    for ra, rb in zip(a, b):
        assert (ra["query_id"], ra["rank"], ra["doc_id"], ra["score"]) == \
               (rb["query_id"], rb["rank"], rb["doc_id"], rb["score"])
    oracle = built_index["oracle"]
    for qi, q in enumerate(queries):
        ohits = oracle.search(q["query"], q["filters"], k=8)
        spark_rows = [r for r in a if r["query_id"] == qi]
        assert [r["doc_id"] for r in spark_rows] == [h["doc_id"] for h in ohits]
        assert [np.float32(r["score"]) for r in spark_rows] == \
               [np.float32(h["score"]) for h in ohits]


def test_wand_tie_at_k_boundary(big_part):
    """Docs with IDENTICAL scores straddling the k-th boundary: the
    smaller ordinals must win the tie-break even when their segments' UB
    exactly equals θ (regression: segments pruned at UB == θ)."""
    big = big_part
    n = 5000
    # one term, constant tf and constant norm → every doc scores the same
    docs = np.arange(0, n * 10, 10, dtype=np.uint64)
    tfs = np.full(n, 3, dtype=np.uint64)
    norms = np.full(big["norms"].shape, 17, dtype=np.uint8)
    spec = _spec(1.7)
    cd = _ClauseData(spec, [_mk_row(docs, tfs, norms)], big["cache"], norms)
    ords, scores = wand_top_k([cd], None, None, 10)
    assert ords.size == 10
    assert np.all(scores == scores[0])  # all tied
    # tie-break: the 10 smallest ordinals, in order
    assert [int(o) for o in ords] == [int(d) for d in docs[:10]]


def test_wand_heavy_ties_random_equality(big_part):
    """Quantized tfs + constant norms → massive score ties with VARYING
    block UBs; wand must equal exhaustive exactly (incl. tie-breaks)."""
    big = big_part
    rng = np.random.default_rng(77)
    terms = {}
    for name, df_, w in [("a", 20_000, 1.0), ("b", 4_000, 2.0), ("c", 150, 5.0)]:
        docs = np.sort(rng.choice(big["n_docs"], size=df_, replace=False)).astype(np.uint64)
        tfs = rng.integers(1, 3, size=df_).astype(np.uint64)  # tf ∈ {1,2} → ties
        terms[name] = (docs, tfs, w)
    norms = np.full(big["norms"].shape, 23, dtype=np.uint8)
    clauses, pairs = [], []
    local = dict(big)
    local["norms"] = norms
    local["terms"] = {k: (d, t) for k, (d, t, _) in terms.items()}
    for name, (docs, tfs, w) in terms.items():
        spec = _spec(w)
        clauses.append(_ClauseData(spec, [_mk_row(docs, tfs, norms)],
                                   big["cache"], norms))
        pairs.append((spec, name))
    for k in (1, 5, 10, 50):
        ords, scores = wand_top_k(clauses, None, None, k)
        expected = _exhaustive(local, pairs, None, None, k)
        assert [int(o) for o in ords] == [d for d, _ in expected], k
        assert all(np.float32(s) == v for s, (_, v) in zip(scores, expected)), k


def test_wand_tie_boundary_pruning_adversarial(big_part):
    """Heap fills from a high-UB segment with HIGH-ordinal tied docs; the
    remaining segments have UB exactly equal to θ and hold SMALLER-ordinal
    docs with the same score — pruning at UB == θ would return the wrong
    tie-broken top-k (this is the regression the strict-< fix addresses)."""
    big = big_part
    # ords 0..999 (tf=3) then 50000..50100 where the last doc has tf=5
    low = np.arange(0, 1000, dtype=np.uint64)
    high = np.arange(50000, 50101, dtype=np.uint64)
    docs = np.concatenate([low, high])
    tfs = np.concatenate([np.full(low.size, 3), np.full(high.size, 3)]).astype(np.uint64)
    tfs[-1] = 5  # boosts the LAST block's UB above everything else
    norms = np.full(50200, 23, dtype=np.uint8)
    spec = _spec(1.0)
    cd = _ClauseData(spec, [_mk_row(docs, tfs, norms)], big["cache"], norms)
    ords, scores = wand_top_k([cd], None, None, 10, batch_segments=1)
    # correct answer: tf=5 doc first, then the 9 SMALLEST tied ordinals
    assert int(ords[0]) == 50100
    assert [int(o) for o in ords[1:]] == list(range(9))
