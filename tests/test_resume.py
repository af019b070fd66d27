"""Resumability gate (BASELINE.json north_rule): kill after a partial
build → resume from the checkpointed manifest → identical index."""

import pytest

pyspark = pytest.importorskip("pyspark")


def _index_fingerprint(spark, index_dir):
    """Logical content hash of the final segment stores (filenames differ
    across runs; values must not)."""
    from pyspark.sql import functions as F

    parts = {}
    post = spark.read.parquet(f"{index_dir}/segments/postings")
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
    dm = spark.read.parquet(f"{index_dir}/segments/doc_meta")
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
    assert ckpt["completed_waves"] == [0, 1]
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
