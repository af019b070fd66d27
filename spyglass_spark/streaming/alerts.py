"""Structured-Streaming percolator alerting.

The percolator's natural habitat: a document STREAM (the reference's
filesystem-watcher/crawl-queue feed, filesystem/mod.rs) percolated
against a standing set of stored queries, each micro-batch emitting the
(query_key, url) alerts it triggered — the "saved search notification"
primitive, ES's percolate run continuously.

Spark-first shape: ``foreachBatch`` hands each micro-batch to the SAME
batch percolator (``ops.percolate.percolate`` — one tokenize pass,
broadcast query relations, equi-join matching), so streaming and batch
alerting share one tested code path, and the per-batch cost is
O(batch terms) regardless of history. Alerts append to a parquet sink
with the ``epoch_id`` stamped on every row: Spark replays a micro-batch
whose offsets didn't commit, and readers dedupe replayed alerts with
``alerts_deduped`` (max-epoch per (query_key, url) — idempotent,
order-independent). The stored-query set is captured at start; changing
it is a stream restart (the ES contract: percolator queries are indexed
documents — here they are a broadcast plan constant).
"""
from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..ops.percolate import percolate


def percolate_microbatch(spark: SparkSession, batch_df: DataFrame,
                         queries, out_path: str,
                         epoch_id: int | None = None) -> None:
    """Percolate ONE micro-batch and append its alerts (query_key, url,
    epoch) to the parquet sink. Empty batches and batches matching
    nothing write nothing."""
    if batch_df.isEmpty():
        return
    hits = percolate(spark, batch_df, queries)
    (hits.withColumn("epoch", F.lit(-1 if epoch_id is None
                                    else int(epoch_id)).cast("long"))
         .write.mode("append").parquet(out_path))


def start_percolate_alerts(stream_df: DataFrame, queries, out_path: str,
                           checkpoint_dir: str, trigger_once: bool = True):
    """Wire a documents stream into the percolator: every micro-batch
    runs the batch percolate job and appends its alerts. Returns the
    StreamingQuery; stop via .stop() or let ``trigger_once`` drain the
    backlog (the incremental indexer's pattern)."""
    spark = stream_df.sparkSession

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        percolate_microbatch(spark, batch_df, queries, out_path,
                             epoch_id=epoch_id)

    writer = (stream_df.writeStream.foreachBatch(sink)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def alerts_deduped(spark: SparkSession, out_path: str) -> DataFrame:
    """Replay-safe alert view: ONE row per (query_key, url) with the
    max epoch that raised it — a checkpoint replay appends duplicate
    rows at a replayed epoch, and this max-aggregate is idempotent
    under them (the applied-epoch-ledger discipline, reader-side)."""
    return (spark.read.parquet(out_path)
                 .groupBy("query_key", "url")
                 .agg(F.max("epoch").alias("epoch"))
                 .orderBy("query_key", "url"))
