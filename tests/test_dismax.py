"""DisjunctionMaxQuery combiner parity (Lucene DisMax, public
Lucene/ES surface): the Should-group score becomes
max(clause scores) + tie_breaker × (sum of the other matching clauses)
— ES multi_match best_fields semantics. The engine must be bitwise
float32-identical to the oracle twin at every rank, WAND must stay a
pruning-only strategy (auto ≡ exhaustive), and scoring Musts/favorite
extras must still ADD on top of the combined group score."""

import numpy as np
import pytest

pyspark = pytest.importorskip("pyspark")

QUERIES = [
    "parse token stream",       # phrase + term clauses: max ≠ sum
    "fn",                       # single hot term: dismax ≡ sum shape
    "import sys",
    "merged scoring",
    "the parsing of tokens",    # stopword holes
    "vector compress delta",
]
TIES = [0.0, 0.35, 1.0]


@pytest.fixture(scope="module")
def engine(spark, built_index):
    from spyglass_spark.query.executor import SearchEngine

    return SearchEngine(spark, built_index["index_dir"])


def _bits(x) -> bytes:
    return np.float32(x).tobytes()


def _rows(df):
    return sorted(df.collect(), key=lambda r: r["rank"])


def test_dismax_rank_and_bitwise_score_parity(engine, built_index):
    oracle = built_index["oracle"]
    for q in QUERIES:
        for tie in TIES:
            got = _rows(engine.search(q, k=10, combiner="dismax",
                                      tie_breaker=tie))
            want = oracle.search(q, k=10, combiner="dismax",
                                 tie_breaker=tie)
            label = f"{q!r} tie={tie}"
            assert [r["doc_id"] for r in got] == \
                [h["doc_id"] for h in want], label
            for g, w in zip(got, want):
                assert _bits(g["score"]) == _bits(w["score"]), (
                    f"{label}: {g['score']} != {w['score']} at rank "
                    f"{w['rank']}")


def test_dismax_wand_equals_exhaustive(engine):
    for q in QUERIES:
        for tie in (0.0, 0.35):
            auto = _rows(engine.search(q, k=10, combiner="dismax",
                                       tie_breaker=tie, algo="auto"))
            exh = _rows(engine.search(q, k=10, combiner="dismax",
                                      tie_breaker=tie, algo="exhaustive"))
            assert [(r["doc_id"], _bits(r["score"])) for r in auto] == \
                [(r["doc_id"], _bits(r["score"])) for r in exh], (q, tie)
    # the standard shape stays WAND-eligible under dismax
    engine.search("parse token stream", k=10, combiner="dismax",
                  tie_breaker=0.35, algo="auto")
    assert engine.last_meta["wand_eligible"] == 1


def test_dismax_tie_zero_is_pure_max(built_index):
    """tie=0 → the combined group score is exactly the best clause's
    contribution (brute-forced from the oracle's per-clause scores)."""
    from spyglass_spark.query.compiler import compile_query
    from spyglass_spark.query.scoring import norm_cache

    oracle = built_index["oracle"]
    q = "parse token stream"
    cq = compile_query(q)
    caches = {f: norm_cache(oracle.avgdl(f)) for f in oracle.fields}
    per_clause = [oracle._clause_scores(c, caches) for c in cq.should_group]
    hits = oracle.search(q, k=10, combiner="dismax", tie_breaker=0.0)
    assert hits
    for h in hits:
        best = max(cs[h["doc_ord"]] for cs in per_clause
                   if h["doc_ord"] in cs)
        assert _bits(h["score"]) == _bits(best)


def test_dismax_filters_boosts_and_favorite_add_on_top(engine, built_index):
    """Musts/extras interact with the combiner exactly as the oracle
    says: tag filter restricts, favorite should-extra ADDS after the
    dismax combine."""
    oracle = built_index["oracle"]
    tags_dim = built_index["tags_dim"]
    rs_tag = next(t["id"] for t in tags_dim
                  if t["label"] == "lens" and t["value"] == "rs")
    cases = [
        {"filters": [("tag", rs_tag)]},
        {"boosts": [("tag", rs_tag)]},
        {"filters": [("favorite", rs_tag)]},
    ]
    for c in cases:
        got = _rows(engine.search("fn main", k=10, combiner="dismax",
                                  tie_breaker=0.35, **c))
        want = oracle.search("fn main", c.get("filters", ()),
                             c.get("boosts", ()), k=10,
                             combiner="dismax", tie_breaker=0.35)
        assert [(r["doc_id"], _bits(r["score"])) for r in got] == \
            [(h["doc_id"], _bits(h["score"])) for h in want], c


def test_dismax_batch_equals_single(engine):
    batch = [{"query": q, "combiner": "dismax", "tie_breaker": 0.35}
             for q in QUERIES[:4]]
    batch.append({"query": QUERIES[4]})  # mixed combiners in one batch
    res = engine.search_many(batch, k=8).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append(r)
    for qi, ent in enumerate(batch):
        single = _rows(engine.search(
            ent["query"], k=8, combiner=ent.get("combiner", "sum"),
            tie_breaker=ent.get("tie_breaker", 0.0)))
        got = sorted(by_q.get(qi, []), key=lambda r: r["rank"])
        assert [(r["doc_id"], _bits(r["score"])) for r in got] == \
            [(r["doc_id"], _bits(r["score"])) for r in single], ent


def test_dismax_score_matches_bitwise(engine):
    """score_matches carries the combiner: every (url → score) equals
    the search score bit-for-bit (unbounded k)."""
    q = "parse token stream"
    full = {r["url"]: r["score"] for r in engine.score_matches(
        q, combiner="dismax", tie_breaker=0.35).collect()}
    hits = engine.search(q, k=100, combiner="dismax",
                         tie_breaker=0.35).collect()
    assert hits
    for h in hits:
        assert _bits(full[h["url"]]) == _bits(h["score"])


def test_dismax_validation(engine):
    with pytest.raises(ValueError, match="combiner"):
        engine.search("fn", combiner="average")
    for bad in (-0.1, 1.5):
        with pytest.raises(ValueError, match="tie_breaker"):
            engine.search("fn", combiner="dismax", tie_breaker=bad)
    # sum mode ignores the tie breaker and accepts any value
    engine.search("fn", combiner="sum", tie_breaker=9.0)
