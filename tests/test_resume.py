"""Resumability gate (BASELINE.json north_rule): kill after a partial
build → resume from the checkpointed manifest → identical index."""

import pytest

pyspark = pytest.importorskip("pyspark")


def _index_fingerprint(spark, index_dir):
    """Logical content hash of the final segment stores (filenames differ
    across runs; values must not)."""
    from pyspark.sql import functions as F

    from spyglass_spark.index.builder import KIND_POSTING, doc_meta_view, read_store

    parts = {}
    store = read_store(spark, index_dir)
    post = store.filter(F.col("kind") == KIND_POSTING)
    parts["postings"] = (post
        .withColumn("h", F.sha2(F.concat_ws("|",
            "part_id", "field", "term", "df_part", "cf_part",
            F.sha2(F.col("doc_bytes"), 256), F.sha2(F.col("tf_bytes"), 256),
            F.sha2(F.col("pos_bytes"), 256), F.sha2(F.col("meta_bytes"), 256)), 256))
        .agg(F.sha2(F.concat_ws("", F.sort_array(F.collect_list("h"))), 256)
             .alias("x")).collect()[0]["x"])
    stats = spark.read.parquet(f"{index_dir}/segments/term_stats")
    parts["stats"] = (stats
        .withColumn("h", F.sha2(F.concat_ws("|", "field", "term", "df", "cf"), 256))
        .agg(F.sha2(F.concat_ws("", F.sort_array(F.collect_list("h"))), 256)
             .alias("x")).collect()[0]["x"])
    dm = doc_meta_view(spark, index_dir,
                       [{"prefix": "segments"}])
    parts["doc_meta"] = (dm
        .withColumn("h", F.sha2(F.concat_ws("|", "doc_ord", "doc_id", "url"), 256))
        .agg(F.sha2(F.concat_ws("", F.sort_array(F.collect_list("h"))), 256)
             .alias("x")).collect()[0]["x"])
    return parts


def test_kill_resume_identical(spark, corpus_rows, tmp_path):
    from spyglass_spark.index.builder import build_index
    from spyglass_spark.index.manifest import load_checkpoint, load_manifest
    from spyglass_spark.testing import corpus_to_documents

    docs, _ = corpus_to_documents(corpus_rows)
    sdf = spark.createDataFrame(docs)

    clean_dir = str(tmp_path / "clean")
    build_index(spark, sdf, clean_dir, num_partitions=8, waves=4)
    clean_fp = _index_fingerprint(spark, clean_dir)

    crash_dir = str(tmp_path / "crash")
    with pytest.raises(RuntimeError, match="injected failure"):
        build_index(spark, sdf, crash_dir, num_partitions=8, waves=4,
                    fail_after_wave=1)
    ckpt = load_checkpoint(crash_dir)
    assert ckpt["completed_waves_segments"] == [0, 1]
    assert load_manifest(crash_dir) is None  # nothing committed yet

    # resume: waves 0-1 skipped, 2-3 built, commit
    m = build_index(spark, sdf, crash_dir, num_partitions=8, waves=4)
    assert m.committed and m.num_docs == len(docs)
    assert _index_fingerprint(spark, crash_dir) == clean_fp

    # idempotent: a third call is a no-op returning the committed manifest
    m2 = build_index(spark, sdf, crash_dir, num_partitions=8, waves=4)
    assert m2.committed and m2.num_docs == m.num_docs


def test_tombstone_delete(spark, built_index):
    from spyglass_spark.index.builder import delete_by_ids
    from spyglass_spark.query.executor import SearchEngine

    eng = SearchEngine(spark, built_index["index_dir"])
    hits = eng.search("salinas", k=5).collect()
    if not hits:
        pytest.skip("no salinas hits in corpus")
    victim = hits[0]["doc_id"]
    delete_by_ids(built_index["index_dir"], [victim])
    try:
        eng2 = SearchEngine(spark, built_index["index_dir"])
        hits2 = eng2.search("salinas", k=5).collect()
        assert victim not in {h["doc_id"] for h in hits2}
        # N still counts tombstoned docs (tantivy max_doc semantics)
        assert eng2.manifest.num_docs == built_index["manifest"].num_docs
    finally:
        # restore for other tests: clear tombstones
        from spyglass_spark.index.manifest import commit_manifest, load_manifest
        m = load_manifest(built_index["index_dir"])
        m.tombstones = []
        commit_manifest(built_index["index_dir"], m)


def test_upsert_delete_readd_parity(spark, corpus_rows, tmp_path):
    """Upsert = delete+re-add (documents/mod.rs:135-195): new content is
    searchable, old versions are gone, stats keep counting tombstoned docs
    (tantivy max_doc model) — rank-identical to the multi-generation
    oracle."""
    from spyglass_spark.index.builder import build_index, upsert_documents
    from spyglass_spark.oracle.engine import OracleIndex
    from spyglass_spark.query.executor import SearchEngine
    from spyglass_spark.testing import corpus_to_documents

    docs, _ = corpus_to_documents(corpus_rows)
    idx_dir = str(tmp_path / "ups")
    build_index(spark, spark.createDataFrame(docs), idx_dir,
                num_partitions=8, waves=1)

    # replace 10 docs: same url/doc_id, new content with a marker term
    replaced = []
    for d in docs[:10]:
        nd = dict(d)
        nd["content"] = (d["content"] or "") + " upsertedmarker freshly indexed"
        import hashlib
        nd["content_sha256"] = hashlib.sha256(nd["content"].encode()).hexdigest()
        replaced.append(nd)
    m = upsert_documents(spark, spark.createDataFrame(replaced), idx_dir,
                         num_partitions=4)
    assert m.num_docs == len(docs) + 10  # N counts tombstoned old copies
    # tombstones live in a parquet side table (never collected driver-side)
    from spyglass_spark.index.builder import tombstone_view
    tomb = tombstone_view(spark, idx_dir, m)
    assert tomb is not None and tomb.count() == 10

    oracle = OracleIndex.build_generations([(docs, 8), (replaced, 4)])
    # tombstone the gen-0 copies of the replaced urls (by ordinal)
    replaced_urls = {d["url"] for d in replaced}
    for ord_, d in enumerate(oracle.docs):
        if d["url"] in replaced_urls and "upsertedmarker" not in d["content"]:
            oracle.tombstoned.add(ord_)

    eng = SearchEngine(spark, idx_dir)
    for q in ["upsertedmarker", "fn", "index search", "salinas"]:
        got = eng.search(q, k=8).collect()
        exp = oracle.search(q, k=8)
        assert [r["doc_id"] for r in got] == [h["doc_id"] for h in exp], q
        import numpy as np
        for r, h in zip(got, exp):
            assert np.isclose(np.float32(r["score"]), np.float32(h["score"]),
                              rtol=1e-5), (q, r["score"], h["score"])

    hits = eng.search("upsertedmarker", k=20).collect()
    assert len(hits) == 10
    assert {h["url"] for h in hits} == replaced_urls


def test_high_p_manifest_and_resume(spark, corpus_rows, tmp_path):
    """P=4096 / waves=8 smoke (SCALING.md's 10^12-doc claim is P≈2^20 with
    wave-bounded memory): driver state must stay O(generations), NOT O(P) —
    manifest + checkpoint are small constants; crash-after-wave-3 resumes
    from the checkpoint without redoing completed waves; search over the
    4096-part index answers correctly and the driver-merge guard routes the
    top-k through the distributed window path (4096 parts × k exceeds no
    bound here, but the partial rows stay parts×k tiny)."""
    import json
    import os
    import time

    from spyglass_spark.index.builder import build_index
    from spyglass_spark.index.manifest import load_checkpoint, load_manifest
    from spyglass_spark.query.executor import SearchEngine
    from spyglass_spark.testing import corpus_to_documents

    docs, _ = corpus_to_documents(corpus_rows[:120])
    sdf = spark.createDataFrame(docs)
    idx = str(tmp_path / "highp")
    P, WAVES = 4096, 8

    with pytest.raises(RuntimeError, match="injected failure"):
        build_index(spark, sdf, idx, num_partitions=P, waves=WAVES,
                    fail_after_wave=3)
    ckpt = load_checkpoint(idx)
    # fail_after_wave=3 raises after wave index 3 commits → waves 0-3 done
    assert len(ckpt["completed_waves_segments"]) == 4
    # checkpoint is O(waves), not O(P)
    assert os.path.getsize(os.path.join(idx, "checkpoint.json")) < 4096

    m = build_index(spark, sdf, idx, num_partitions=P, waves=WAVES)
    assert m.committed and m.num_docs == len(docs)
    assert m.num_partitions == P

    # manifest stays O(generations): a handful of KB regardless of P
    man_bytes = os.path.getsize(os.path.join(idx, "manifest.json"))
    assert man_bytes < 16_384, f"manifest grew with P: {man_bytes} bytes"
    man = json.load(open(os.path.join(idx, "manifest.json")))
    assert len(man["generations"]) == 1  # per-partition lineage is parquet,
    # not manifest rows

    eng = SearchEngine(spark, idx)
    t0 = time.time()
    hits = eng.search("fn", k=5).collect()
    first_latency = time.time() - t0
    assert len(hits) > 0
    ranks = [h["rank"] for h in hits]
    assert ranks == sorted(ranks)
    # sanity bound, generous for the shared noisy host: a 4096-part index
    # over 120 docs must not degenerate into minutes of per-part overhead
    assert first_latency < 120, f"search took {first_latency:.1f}s at P={P}"
