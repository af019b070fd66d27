"""Embedding-distance boosts blended into search (the reference's semantic
path, crates/spyglass/src/api/handler/search.rs:66-123): unit goldens for
the min-max boost normalization, and an E2E parity test where the engine
and the pure-Python oracle receive the SAME distance-derived boosts."""

import numpy as np
import pytest

from spyglass_spark.ops.semantic import distance_boosts


def test_distance_boosts_minmax_goldens():
    # search.rs:80-110: filter <25, sort asc, boost = 3 − (d−min)/(max−min)·3
    out = distance_boosts([("a", 5.0), ("b", 10.0), ("c", 20.0), ("far", 30.0)])
    assert [d for _, d, _ in out] == ["a", "b", "c"]
    boosts = {doc: b for _, doc, b in out}
    assert boosts["a"] == pytest.approx(3.0)
    assert boosts["b"] == pytest.approx(3.0 - (5.0 / 15.0) * 3.0)
    assert boosts["c"] == pytest.approx(0.0)
    # every boost is exactly float32 (the reference casts `boost as f32`)
    for _, _, b in out:
        assert b == float(np.float32(b))


def test_distance_boosts_edges():
    assert distance_boosts([]) == []
    assert distance_boosts([("x", 99.0)]) == []  # all beyond max_distance
    # degenerate max==min: documented deviation — boost 3.0, not NaN
    assert distance_boosts([("x", 7.0)]) == [("docid", "x", 3.0)]
    assert distance_boosts([("x", 7.0), ("y", 7.0)]) == [
        ("docid", "x", 3.0), ("docid", "y", 3.0)]


def test_semantic_boost_search_parity(spark, built_index):
    """Engine with distance boosts ≡ oracle with the same boosts; and the
    boosts actually change the ranking for a doc that barely matches."""
    from spyglass_spark.ops.semantic import search_with_semantic_boost
    from spyglass_spark.query.executor import SearchEngine

    eng = SearchEngine(spark, built_index["index_dir"])
    oracle = built_index["oracle"]
    docs = built_index["docs"]

    # synthetic distances: the 4 seed docs nearest some query embedding
    seeds = [d["doc_id"] for d in docs[10:14]]
    pairs = [(seeds[0], 2.0), (seeds[1], 8.0), (seeds[2], 14.0),
             (seeds[3], 24.9)]
    distances = spark.createDataFrame(
        [(d, float(x)) for d, x in pairs], "doc_id string, distance double")

    got = search_with_semantic_boost(eng, "merge parse token", distances,
                                     k=10).collect()
    boosts = distance_boosts(pairs)
    exp = oracle.search("merge parse token", boosts=boosts, k=10)
    assert len(got) == len(exp) and len(got) > 0
    for g, e in zip(got, exp):
        assert g["doc_id"] == e["doc_id"]
        assert g["score"] == pytest.approx(e["score"], abs=0.0)

    # the boost is visible: the nearest seed doc outranks its unboosted self
    base = {r["doc_id"]: r["rank"]
            for r in eng.search("merge parse token", k=50).collect()}
    boosted = {r["doc_id"]: r["rank"] for r in got}
    if seeds[0] in base and seeds[0] in boosted:
        assert boosted[seeds[0]] <= base[seeds[0]]


def test_rrf_fuse_vs_bruteforce(spark):
    """Reciprocal-rank fusion (ES hybrid rrf): bitwise vs a Python
    brute force — overlap fused, single-side docs echoed with -1,
    (rrf desc, id asc) total order, top-k cut."""
    import pytest

    from spyglass_spark.ops.semantic import rrf_fuse

    a = [("u1", 1), ("u2", 2), ("u3", 3), ("u4", 4)]
    b = [("u3", 1), ("u5", 2), ("u1", 3)]
    ta = spark.createDataFrame(a, "url string, rank int")
    tb = spark.createDataFrame(b, "url string, rank int")
    ra, rb = dict(a), dict(b)
    exp = []
    for u in sorted({u for u, _ in a} | {u for u, _ in b}):
        s = (1.0 / (60.0 + ra[u]) if u in ra else 0.0) \
            + (1.0 / (60.0 + rb[u]) if u in rb else 0.0)
        exp.append((u, s, ra.get(u, -1), rb.get(u, -1)))
    exp.sort(key=lambda x: (-x[1], x[0]))
    for k in (3, 10):
        rows = rrf_fuse(ta, tb, k=k).collect()
        got = [(r["url"], r["rrf_score"], r["text_rank"], r["vec_rank"])
               for r in rows]
        assert got == exp[:k], k
        assert [r["rank"] for r in rows] == \
            list(range(1, min(k, len(exp)) + 1))
    # u3 (ranks 3+1) must beat u1 (ranks 1+3)? equal sums — tie broken
    # by url asc: u1 first
    top = rrf_fuse(ta, tb, k=2).collect()
    assert [r["url"] for r in top] == ["u1", "u3"]
    with pytest.raises(ValueError, match="k must be"):
        rrf_fuse(ta, tb, k=0)
    with pytest.raises(ValueError, match="rank_constant"):
        rrf_fuse(ta, tb, rank_constant=0)
