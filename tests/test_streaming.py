"""Structured-Streaming incremental indexing: file-source micro-batches →
foreachBatch upsert → searchable index with exactly-once generations."""

import json
import os
import time

import pytest

pyspark = pytest.importorskip("pyspark")

SCHEMA = ("doc_id string, url string, domain string, title string, "
          "content string, tags array<long>, content_sha256 string")


def _doc(i, content):
    import hashlib
    import uuid

    from spyglass_spark.corpus import SPYGLASS_NS

    url = f"repo://stream/src/file_{i}.rs@{'0' * 40}"
    return dict(doc_id=str(uuid.uuid5(SPYGLASS_NS, url)), url=url,
                domain="stream", title=f"src/file_{i}.rs", content=content,
                tags=[1], content_sha256=hashlib.sha256(content.encode()).hexdigest())


def test_incremental_stream_indexing(spark, tmp_path):
    from spyglass_spark.query.executor import SearchEngine
    from spyglass_spark.streaming.incremental import start_incremental_indexer

    src = tmp_path / "incoming"
    src.mkdir()
    index_dir = str(tmp_path / "sidx")
    ckpt = str(tmp_path / "ckpt")

    # batch 1 lands before the stream starts
    batch1 = [_doc(i, f"alpha stream content number {i} parser") for i in range(20)]
    spark.createDataFrame(batch1, SCHEMA).write.mode("overwrite") \
        .parquet(str(src / "b1"))

    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", "4")
              .parquet(f"{src}/*"))
    q = start_incremental_indexer(stream, index_dir, ckpt, num_partitions=4)
    try:
        q.processAllAvailable()
        eng = SearchEngine(spark, index_dir)
        assert eng.manifest.num_docs == 20
        hits = eng.search("alpha parser", k=5).collect()
        assert len(hits) == 5

        # batch 2: 10 new docs + re-send of doc 0 with changed content
        batch2 = [_doc(i, f"beta stream content number {i}") for i in range(20, 30)]
        batch2.append(_doc(0, "alpha replaced betamarker content"))
        spark.createDataFrame(batch2, SCHEMA).write.mode("overwrite") \
            .parquet(str(src / "b2"))
        q.processAllAvailable()

        eng2 = SearchEngine(spark, index_dir)
        # N counts old tombstoned copy too (tantivy max_doc model)
        assert eng2.manifest.num_docs == 20 + 11
        assert len(eng2.manifest.gen_list()) >= 2
        beta = eng2.search("betamarker", k=5).collect()
        assert len(beta) == 1 and beta[0]["url"] == _doc(0, "")["url"]
        # the replaced doc's OLD content must no longer match alone
        alpha0 = eng2.search("alpha", k=30).collect()
        urls = [r["url"] for r in alpha0]
        assert _doc(0, "")["url"] in urls  # still matches via new content
    finally:
        q.stop()


def test_microbatch_epoch_replay_is_noop(spark, tmp_path):
    """Checkpoint-replay protection: re-running a micro-batch with an
    already-applied epoch_id must not add a generation or drift N/df/avgdl
    (the round-1 exactly-once overstatement, ADVICE item 5)."""
    from spyglass_spark.index.manifest import load_manifest
    from spyglass_spark.streaming.incremental import index_microbatch

    index_dir = str(tmp_path / "ridx")
    b1 = spark.createDataFrame([_doc(i, f"gamma content {i}") for i in range(8)],
                               SCHEMA)
    index_microbatch(spark, b1, index_dir, num_partitions=2, epoch_id=0)
    m1 = load_manifest(index_dir)
    assert m1.applied_epochs == [0] and m1.num_docs == 8

    # replay epoch 0 (same data) — must be a complete no-op
    index_microbatch(spark, b1, index_dir, num_partitions=2, epoch_id=0)
    m2 = load_manifest(index_dir)
    assert m2.num_docs == 8
    assert len(m2.gen_list()) == len(m1.gen_list())
    assert m2.field_totals == m1.field_totals

    # a NEW epoch with overlapping urls still upserts normally
    b2 = spark.createDataFrame([_doc(0, "gamma replaced content")], SCHEMA)
    index_microbatch(spark, b2, index_dir, num_partitions=2, epoch_id=1)
    m3 = load_manifest(index_dir)
    assert m3.applied_epochs == [0, 1]
    assert m3.num_docs == 9  # tombstoned copy still counted (max_doc model)

    # and replaying THAT epoch is again a no-op
    index_microbatch(spark, b2, index_dir, num_partitions=2, epoch_id=1)
    assert load_manifest(index_dir).num_docs == 9


def test_sessionize_stateful_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionization ≡ the batch sessionizer for
    every CLOSED session (open sessions at the head of the stream close via
    the event-time timeout once the watermark passes last+gap)."""
    from pyspark.sql import functions as F

    from spyglass_spark.streaming.sessions import (sessionize_batch,
                                                   sessionize_events)

    src = str(tmp_path / "sess_ev")
    ev = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
          .filter(F.col("user_id") < 30))
    ev.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(ev.schema).parquet(src)
    sess = sessionize_events(stream, gap="30 minutes", watermark="1 hour")
    q = (sess.writeStream.outputMode("append")
         .format("memory").queryName("sessout").start())
    try:
        q.processAllAvailable()
        got = {(r["user_id"], r["session_start"], r["session_end"]):
               (r["n_events"], r["sum_value"])
               for r in spark.sql("SELECT * FROM sessout").collect()}
        batch = {(r["user_id"], r["session_start"], r["session_end"]):
                 (r["n_events"], r["sum_value"])
                 for r in sessionize_batch(ev, gap="30 minutes").collect()}
        assert got, "no sessions emitted"
        # every emitted session must be a batch session, values identical
        for k, v in got.items():
            assert batch[k] == v, k
        # sessions whose close point is safely inside the watermark must
        # all have been emitted
        max_ts = ev.agg(F.max("ts")).collect()[0][0].timestamp()
        horizon = max_ts - 3600 - 1800  # watermark delay + gap
        expected_closed = {k for k in batch if k[2].timestamp() < horizon}
        missing = expected_closed - set(got)
        assert not missing, f"{len(missing)} closed sessions not emitted"
    finally:
        q.stop()


def test_windowed_event_counts_with_watermark(spark, tmp_path):
    """Streaming tumbling-window agg with watermark ≡ the equivalent batch
    aggregation once all data is processed."""
    from pyspark.sql import functions as F

    from spyglass_spark.streaming.windows import windowed_event_counts

    src = str(tmp_path / "ev")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.write.mode("overwrite").parquet(src)
    schema = ev.schema

    stream = spark.readStream.schema(schema).parquet(src)
    agg = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    q = (agg.writeStream.outputMode("append")
         .format("memory").queryName("winagg").start())
    try:
        q.processAllAvailable()
        # append mode only emits windows the watermark has passed; compare
        # those against the batch computation
        got = {(r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
               for r in spark.sql("SELECT * FROM winagg").collect()}
        batch = (ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
                 .agg(F.count("*").alias("n"), F.round(F.sum("value"), 3).alias("s"))
                 .collect())
        batch_map = {(r["win"]["start"], r["event_type"]): (r["n"], r["s"])
                     for r in batch}
        assert got  # at least the closed windows are emitted
        for k, v in got.items():
            assert batch_map[k] == v
    finally:
        q.stop()


def test_stream_merge_policy_bounds_generations(spark, tmp_path):
    """max_generations folds old generations during streaming ingest
    (tantivy background-merge analog): after many micro-batches the index
    holds <= max_generations generations, all re-sent docs resolve to
    their newest content, and replaced copies are physically gone."""
    from spyglass_spark.index.manifest import load_manifest
    from spyglass_spark.query.executor import SearchEngine
    from spyglass_spark.streaming.incremental import index_microbatch

    index_dir = str(tmp_path / "midx")
    # 6 micro-batches: each adds 10 new docs and replaces one older doc
    for b in range(6):
        rows = [_doc(b * 10 + i, f"gen content number {b * 10 + i} word")
                for i in range(10)]
        if b > 0:
            rows.append(_doc(0, f"replacedmarker revision {b}"))
        df = spark.createDataFrame(rows, SCHEMA)
        index_microbatch(spark, df, index_dir, num_partitions=4,
                         epoch_id=b, max_generations=2)

    m = load_manifest(index_dir)
    assert len(m.gen_list()) <= 2
    # 60 distinct urls live; 5 replaced copies were merged away: num_docs
    # counts live docs plus any still-unmerged tombstoned copies (< 65)
    assert 60 <= m.num_docs <= 61  # at most the newest delta's tombstone

    eng = SearchEngine(spark, index_dir)
    hits = eng.search("replacedmarker", k=10).collect()
    assert len(hits) == 1  # only the newest revision of doc 0 matches
    got = eng.search("gen word", k=100).collect()
    assert all(r["score"] > 0 for r in got)


def test_percolate_alert_stream(spark, tmp_path):
    """Streaming percolator alerting: file-source micro-batches →
    foreachBatch percolate → parquet alert sink with epoch stamps;
    alerts match the batch percolator over the full doc set, and the
    deduped view is idempotent under a replayed epoch."""
    from spyglass_spark.ops.percolate import percolate
    from spyglass_spark.streaming.alerts import (alerts_deduped,
                                                 percolate_microbatch,
                                                 start_percolate_alerts)

    src = tmp_path / "pin"
    src.mkdir()
    out = str(tmp_path / "alerts")
    ckpt = str(tmp_path / "pckpt")
    queries = [
        {"key": "alpha", "query": "alpha parser"},
        {"key": "beta", "query": "betamarker"},
        {"key": "never", "query": "nonexistentzzz"},
    ]
    b1 = [_doc(i, f"alpha stream content number {i} parser")
          for i in range(12)]
    b2 = [_doc(i, f"beta stream betamarker number {i}")
          for i in range(12, 18)]
    spark.createDataFrame(b1, SCHEMA).write.parquet(str(src / "b1"))
    spark.createDataFrame(b2, SCHEMA).write.parquet(str(src / "b2"))

    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", "2").parquet(f"{src}/*"))
    q = start_percolate_alerts(stream, queries, out, ckpt,
                               trigger_once=False)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {(r["query_key"], r["url"])
           for r in alerts_deduped(spark, out).collect()}
    all_docs = spark.createDataFrame(b1 + b2, SCHEMA)
    exp = {(r["query_key"], r["url"])
           for r in percolate(spark, all_docs, queries).collect()}
    assert got == exp
    assert {k for k, _ in got} == {"alpha", "beta"}

    # replay idempotence: re-running an epoch's batch appends duplicate
    # rows; the deduped view is unchanged
    percolate_microbatch(spark, spark.createDataFrame(b2, SCHEMA),
                         queries, out, epoch_id=999)
    raw = spark.read.parquet(out).count()
    assert raw > len(exp)   # duplicates landed in the raw sink
    got2 = {(r["query_key"], r["url"])
            for r in alerts_deduped(spark, out).collect()}
    assert got2 == exp
