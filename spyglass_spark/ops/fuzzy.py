"""Distributed fuzzy term matching — SymSpell deletion-neighborhood
candidate generation as a pure DataFrame plan.

The query-time engine path (query/expand.expand_fuzzy) serves one
pattern from the sidecar; this op is the pipeline form: match a BATCH
of query terms against the corpus dictionary in one pass — the shape a
training-data pipeline needs for query-log spell correction or noisy
join keys.

Plan shape (100 TB reasoning):
- dictionary df: one shuffle over (doc, term) pairs — identical profile
  to the term_df aggregation the index build already does.
- deletion keys: `transform(sequence(...))` in whole-stage codegen —
  the row multiplier is ~(term_len+1) on VOCAB-sized data, not corpus-
  sized.
- the query side (a handful of terms) explodes to its own variant keys
  and BROADCASTs: the candidate join is map-side, no extra shuffle.
- verification is Spark's built-in `levenshtein` (JVM), and d=1
  deletion neighborhoods are complete for Levenshtein <= 1, so the
  result equals a brute-force scan's.

No Python UDF anywhere in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..query.expand import deletion_key_expr


def term_dictionary(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """(term, df) over lower/[^a-z0-9]-split tokens (document frequency,
    distinct docs). Matches the DUCK_TOKS oracle tokenization."""
    toks = docs.select(
        F.col(id_col).alias("__doc"),
        F.explode(F.array_distinct(F.filter(
            F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
            lambda x: x != ""))).alias("term"))
    return toks.groupBy("term").agg(F.count("*").alias("df"))


def fuzzy_candidates(spark: SparkSession, docs: DataFrame,
                     query_terms: list[str], distance: int = 1,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(query_term, term, df, dist) for every dictionary term within
    Levenshtein ``distance`` (<=1 — the deletion-neighborhood bound) of
    each query term."""
    if distance > 1:
        raise ValueError("deletion-neighborhood candidates cover "
                         "distance <= 1; build a d=2 variant explicitly")
    dict_df = term_dictionary(docs, text_col, id_col)
    dict_keys = dict_df.select(
        "term", "df", F.explode(deletion_key_expr("term")).alias("del_key"))
    # literal VALUES → LocalRelation: no job to materialize the query side
    qdf = spark.range(1).select(F.explode(F.array(
        *[F.lit(t) for t in query_terms])).alias("query_term"))
    qkeys = qdf.select(
        "query_term", F.explode(deletion_key_expr("query_term")).alias("del_key"))
    cands = (dict_keys.join(F.broadcast(qkeys), "del_key")
                      .select("query_term", "term", "df").distinct()
                      .withColumn("dist", F.levenshtein("query_term", "term"))
                      .filter(F.col("dist") <= distance))
    return cands
