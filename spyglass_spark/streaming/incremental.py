"""Structured-Streaming incremental indexing.

The reference keeps its index fresh with a filesystem watcher feeding a
crawl queue whose batches go through process_crawl_results (upsert =
delete + re-add; /root/reference/crates/spyglass/src/filesystem/mod.rs,
documents/mod.rs:118-283). The Spark-native equivalent: a streaming source
of document rows driven through ``foreachBatch`` into the same batch
upsert path — each micro-batch becomes a delta segment generation with an
atomic manifest commit, and the stream's checkpoint makes ingestion
exactly-once across restarts (Spark replays uncommitted batches;
re-upserting the same urls is idempotent thanks to delete+re-add).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..index.builder import build_index, upsert_documents
from ..index.manifest import load_manifest


def index_microbatch(spark: SparkSession, batch_df: DataFrame, index_dir: str,
                     num_partitions: int = 8) -> None:
    """Index one micro-batch: first batch bootstraps the index, later
    batches append delta generations via upsert (delete+re-add by url)."""
    if batch_df.isEmpty():
        return
    m = load_manifest(index_dir)
    if m is None or not m.committed:
        build_index(spark, batch_df, index_dir,
                    num_partitions=num_partitions, waves=1)
    else:
        upsert_documents(spark, batch_df, index_dir,
                         num_partitions=num_partitions)


def start_incremental_indexer(stream_df: DataFrame, index_dir: str,
                              checkpoint_dir: str,
                              num_partitions: int = 8):
    """Attach the incremental indexer to a streaming DataFrame of document
    rows (doc_id, url, domain, title, content, tags[, ...]). Returns the
    StreamingQuery; use ``query.processAllAvailable()`` (tests) or let the
    trigger run continuously."""
    spark = stream_df.sparkSession

    def _batch(df: DataFrame, epoch_id: int) -> None:
        index_microbatch(spark, df, index_dir, num_partitions)

    return (stream_df.writeStream
            .foreachBatch(_batch)
            .option("checkpointLocation", checkpoint_dir)
            .start())
