"""LogMergePolicy analog: pure planner semantics (tantivy
log_merge_policy.rs parity on synthetic generation lists) plus one
end-to-end Spark apply with search-parity assertions."""

import pytest

from spyglass_spark.index.merge_policy import (apply_log_merge_policy,
                                               plan_log_merges)

pyspark = pytest.importorskip("pyspark")


def _gens(sizes, start_part=0, parts_each=2):
    """Synthetic manifest generation dicts with sequential part spans."""
    out, off = [], start_part
    for i, n in enumerate(sizes):
        out.append({"gen": i, "prefix": f"g{i}", "part_offset": off,
                    "num_partitions": parts_each, "num_docs": n})
        off += parts_each
    return out


def test_no_candidates_below_min_segments():
    # 7 same-size gens < min_num_segments=8 -> no merge (tantivy default)
    assert plan_log_merges(_gens([5000] * 7)) == []


def test_level_of_eight_merges():
    cands = plan_log_merges(_gens([5000] * 8))
    assert cands == [[0, 1, 2, 3, 4, 5, 6, 7]]


def test_min_layer_size_clamps_small_segments_into_one_level():
    # 9999 and 8 docs both clamp to min_layer_size=10_000 -> same level
    sizes = [9999, 8, 5000, 123, 9000, 42, 777, 10_000]
    assert plan_log_merges(_gens(sizes)) == [[0, 1, 2, 3, 4, 5, 6, 7]]


def test_levels_split_by_log_size():
    # four big gens (~1M) and eight small (~10k): the big level has
    # < min_num_segments members, only the small level merges
    sizes = [1_000_000] * 4 + [10_000] * 8
    cands = plan_log_merges(_gens(sizes))
    assert cands == [[4, 5, 6, 7, 8, 9, 10, 11]]


def test_oversize_segments_never_merge():
    sizes = [20_000_000] * 8  # all above max_docs_before_merge
    assert plan_log_merges(_gens(sizes)) == []


def test_level_log_size_boundary():
    # log2(40_000) - log2(10_000) = 2.0 > 0.75 -> separate levels;
    # within level_log_size (ratio < 2^0.75 ≈ 1.68) -> same level
    same = plan_log_merges(_gens([16_000] * 4 + [10_000] * 4))
    assert same == [[0, 1, 2, 3, 4, 5, 6, 7]]
    split = plan_log_merges(_gens([40_000] * 4 + [10_000] * 4))
    assert split == []


def test_non_contiguous_level_splits_into_runs():
    # same-size gens but gen 3's span is a different size, breaking part
    # contiguity between {0,1,2} and {4,...,11}
    gens = _gens([10_000] * 12)
    gens[3]["num_docs"] = 5_000_000  # different level AND a span gap
    cands = plan_log_merges(gens, min_num_segments=8)
    # level of eleven 10k gens splits at the gap: [0,1,2] and [4..11]
    assert cands == [[0, 1, 2], [4, 5, 6, 7, 8, 9, 10, 11]]


def test_apply_log_merge_policy_end_to_end(spark, corpus_rows, tmp_path):
    """Build + 8 small deltas, apply the log policy: the delta tier folds
    into one generation and search results stay identical to a fresh
    single-generation build over the same final corpus."""
    from spyglass_spark.index.builder import build_index, upsert_documents
    from spyglass_spark.index.manifest import load_manifest
    from spyglass_spark.query.executor import SearchEngine
    from spyglass_spark.testing import corpus_to_documents

    docs, _ = corpus_to_documents(corpus_rows)
    idx = str(tmp_path / "logmerge")
    build_index(spark, spark.createDataFrame(docs[:80]), idx,
                num_partitions=4, waves=1)
    for i in range(8):
        lo = 80 + i * 10
        upsert_documents(spark, spark.createDataFrame(docs[lo:lo + 10]),
                         idx, num_partitions=1)
    assert len(load_manifest(idx).gen_list()) == 9

    qs = ("fn", "parse token stream", "struct impl")
    key = lambda r: (r["doc_id"], r["score"], r["doc_ord"], r["url"])
    pre = {q: [key(r) for r in SearchEngine(spark, idx).search(q, k=10)
               .collect()] for q in qs}

    # the eight 10-doc deltas form one level (clamped by min_layer_size);
    # the 80-doc base is in the same clamped level too, so everything folds
    m = apply_log_merge_policy(spark, idx)
    assert len(m.gen_list()) == 1
    assert m.num_docs == 160

    # no tombstones anywhere -> the policy's merges are pure re-layout:
    # results stay bitwise identical (scores, ordinals, order)
    eng = SearchEngine(spark, idx)
    for q in qs:
        assert [key(r) for r in eng.search(q, k=10).collect()] == pre[q]

    # scores also match a fresh single-generation build over the same 160
    # docs (df/N/avgdl/fieldnorm equality; ordinal tie ORDER may differ
    # across builds with different P, so compare the score multiset)
    ref_idx = str(tmp_path / "ref")
    build_index(spark, spark.createDataFrame(docs[:160]), ref_idx,
                num_partitions=4, waves=1)
    ref = SearchEngine(spark, ref_idx)
    for q in qs:
        got = sorted((r["url"], r["score"])
                     for r in eng.search(q, k=50).collect())
        want = sorted((r["url"], r["score"])
                      for r in ref.search(q, k=50).collect())
        assert got == want


def test_policy_leaves_sub_threshold_index_alone(spark, corpus_rows, tmp_path):
    from spyglass_spark.index.builder import build_index, upsert_documents
    from spyglass_spark.index.manifest import load_manifest
    from spyglass_spark.testing import corpus_to_documents

    docs, _ = corpus_to_documents(corpus_rows[:60])
    idx = str(tmp_path / "quietidx")
    build_index(spark, spark.createDataFrame(docs[:40]), idx,
                num_partitions=2, waves=1)
    upsert_documents(spark, spark.createDataFrame(docs[40:60]), idx,
                     num_partitions=1)
    before = [g["gen"] for g in load_manifest(idx).gen_list()]
    m = apply_log_merge_policy(spark, idx)  # 2 gens < min_num_segments=8
    assert [g["gen"] for g in m.gen_list()] == before
