"""spyglass_spark — a PySpark-native inverted-index + BM25 search engine.

From-scratch rebuild of the query/data-processing capabilities of
spyglass-search/spyglass (reference at /root/reference, read-only), built
Spark-first: DataFrame/SQL plans, Arrow-vectorized UDFs for the analyzer
and posting codecs, term-range-partitioned posting segments with
doc-partition-aligned chunks for WAND scoring.
"""

__version__ = "0.1.0"
