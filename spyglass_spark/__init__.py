"""spyglass_spark — a PySpark-native inverted-index + BM25 search engine.

From-scratch rebuild of the query/data-processing capabilities of
spyglass-search/spyglass (reference at /root/reference, read-only), built
Spark-first: DataFrame/SQL plans, Arrow-vectorized UDFs for the analyzer
and posting codecs, term-range-partitioned posting segments with
doc-partition-aligned chunks for block-max WAND scoring.

Public API:

    from spyglass_spark import (build_index, upsert_documents, delete_by_ids,
                                compact_index, SearchEngine, OracleIndex,
                                load_corpus, to_documents, read_corpus)

    manifest = build_index(spark, docs_df, "/path/index", num_partitions=128)
    engine = SearchEngine(spark, "/path/index")
    hits = engine.search("fn main", filters=[("tag", 3)], k=5)
"""

__version__ = "0.1.0"


def __getattr__(name):  # lazy imports keep `import spyglass_spark` light
    from importlib import import_module

    targets = {
        "build_index": ("spyglass_spark.index.builder", "build_index"),
        "upsert_documents": ("spyglass_spark.index.builder", "upsert_documents"),
        "delete_by_ids": ("spyglass_spark.index.builder", "delete_by_ids"),
        "compact_index": ("spyglass_spark.index.builder", "compact_index"),
        "SearchEngine": ("spyglass_spark.query.executor", "SearchEngine"),
        "OracleIndex": ("spyglass_spark.oracle.engine", "OracleIndex"),
        "load_corpus": ("spyglass_spark.corpus", "load_corpus"),
        "to_documents": ("spyglass_spark.corpus", "to_documents"),
        "build_tags_dim": ("spyglass_spark.corpus", "build_tags_dim"),
        "read_corpus": ("spyglass_spark.sources", "read_corpus"),
        "get_spark": ("spyglass_spark.session", "get_spark"),
        "search_with_lenses": ("spyglass_spark.ops.tags", "search_with_lenses"),
        "search_with_semantic_boost": ("spyglass_spark.ops.semantic",
                                       "search_with_semantic_boost"),
        "apply_lens": ("spyglass_spark.ops.lens_rules", "apply_lens"),
        "start_incremental_indexer": ("spyglass_spark.streaming.incremental",
                                      "start_incremental_indexer"),
    }
    if name in targets:
        mod, attr = targets[name]
        return getattr(import_module(mod), attr)
    raise AttributeError(f"module 'spyglass_spark' has no attribute {name!r}")
