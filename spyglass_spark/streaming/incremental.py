"""Structured-Streaming incremental indexing.

The reference keeps its index fresh with a filesystem watcher feeding a
crawl queue whose batches go through process_crawl_results (upsert =
delete + re-add; /root/reference/crates/spyglass/src/filesystem/mod.rs,
documents/mod.rs:118-283). The Spark-native equivalent: a streaming source
of document rows driven through ``foreachBatch`` into the same batch
upsert path — each micro-batch becomes a delta segment generation with an
atomic manifest commit.

Exactly-once: Spark's stream checkpoint replays a micro-batch whose
``foreachBatch`` ran but whose offset commit didn't land. The upsert is
match-set idempotent (delete+re-add by url), but a blind replay would add
an extra delta generation whose tombstoned copies inflate N/df/avgdl and
drift BM25 scores. The manifest therefore records every applied
``epoch_id`` (atomically, in the same manifest commit as the generation
itself) and ``index_microbatch`` skips epochs it has already applied."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..index.builder import build_index, upsert_documents
from ..index.manifest import load_manifest


def index_microbatch(spark: SparkSession, batch_df: DataFrame, index_dir: str,
                     num_partitions: int = 8, epoch_id: int | None = None,
                     max_generations: int | None = None) -> None:
    """Index one micro-batch: first batch bootstraps the index, later
    batches append delta generations via upsert (delete+re-add by url).
    When ``epoch_id`` is given, an epoch the manifest already records is a
    no-op (checkpoint-replay protection).

    ``max_generations`` is the merge policy (tantivy's background segment
    merge, client/local.rs:191-203): after an upsert pushes the generation
    count above the threshold, the two oldest generations fold into one
    via ``merge_generations`` (tombstone-covered docs dropped physically,
    side tables pruned). Inline here for determinism; a production
    deployment can equally run it out-of-band — it takes no lock beyond
    the atomic manifest commit."""
    if batch_df.isEmpty():
        return
    m = load_manifest(index_dir)
    if m is not None and epoch_id is not None and epoch_id in m.applied_epochs:
        return
    if m is None or not m.committed:
        build_index(spark, batch_df, index_dir,
                    num_partitions=num_partitions, waves=1,
                    applied_epoch=epoch_id)
        return
    upsert_documents(spark, batch_df, index_dir,
                     num_partitions=num_partitions,
                     applied_epoch=epoch_id,
                     max_generations=max_generations)


def start_incremental_indexer(stream_df: DataFrame, index_dir: str,
                              checkpoint_dir: str,
                              num_partitions: int = 8,
                              max_generations: int | None = None):
    """Attach the incremental indexer to a streaming DataFrame of document
    rows (doc_id, url, domain, title, content, tags[, ...]). Returns the
    StreamingQuery; use ``query.processAllAvailable()`` (tests) or let the
    trigger run continuously. ``max_generations`` bounds generation count
    via pairwise merges (see index_microbatch)."""
    spark = stream_df.sparkSession

    def _batch(df: DataFrame, epoch_id: int) -> None:
        index_microbatch(spark, df, index_dir, num_partitions,
                         epoch_id=int(epoch_id),
                         max_generations=max_generations)

    return (stream_df.writeStream
            .foreachBatch(_batch)
            .option("checkpointLocation", checkpoint_dir)
            .start())
