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
