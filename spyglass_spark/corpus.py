"""Corpus derivation + spyglass document-schema mapping.

The engine's input is an Iceberg-shaped table of source-code repositories
``(repo, path, commit, lang, content)`` (BASELINE.json input_hint). For
tests/bench we synthesize it deterministically from the driver-provided
``documents.parquet`` table using only expressions that exist identically
in Spark SQL and DuckDB SQL, so the driver's oracle can reproduce the
derivation bit-for-bit. No external data.

The mapping onto the reference's document schema v4
(/root/reference/crates/spyglass-searcher/src/schema.rs:149-205):
  domain ← repo, title ← path, url ← repo://{repo}/{path}@{commit},
  content ← content, tags ← [lens:<lang> id, repository:<repo> id],
  doc_id ← UUIDv5(SPYGLASS_NS, url)  (schema.rs:112-119)
  content_sha256 ← sha2(content, 256)  (crawler/mod.rs:110-112 analog —
  the per-row invariant).
"""

from __future__ import annotations

import uuid

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# Reference UUIDv5 namespace: /root/reference/crates/spyglass-searcher/src/client/local.rs:19
SPYGLASS_NS = uuid.UUID("5fdfe40a-de2c-11ed-bfa7-00155deae876")

# lang of the driver's documents table → source-code language/extension of
# the synthesized corpus (reference-supported code extensions, extensions.rs:63-69)
LANG_TO_EXT = {"de": "c", "en": "rs", "es": "js", "fr": "ts", "zh": "cpp"}

_CASE_SQL = (
    "CASE lang WHEN 'de' THEN 'c' WHEN 'en' THEN 'rs' WHEN 'es' THEN 'js' "
    "WHEN 'fr' THEN 'ts' WHEN 'zh' THEN 'cpp' ELSE 'txt' END"
)


def corpus_sql(documents_rel: str, sha_fn: str, replicas: int = 1) -> str:
    """The corpus derivation as a single SQL text, parameterized on the
    engine's sha256-hex function name (Spark: ``sha2(x, 256)`` spelled via
    sha_fn='spark'; DuckDB: sha_fn='duckdb') and the documents relation.

    Identical logic both sides → usable as a driver oracle.
    """
    sha = {
        "spark": lambda e: f"sha2({e}, 256)",
        "duckdb": lambda e: f"sha256({e})",
    }[sha_fn]
    base = f"""
    SELECT
      source AS repo,
      concat('src/', source, '/file_', cast(doc_id AS STRING), '_', cast(r AS STRING), '.', {_CASE_SQL}) AS path,
      substr({sha("concat(cast(doc_id AS STRING), ':', cast(r AS STRING))")}, 1, 40) AS commit,
      {_CASE_SQL} AS lang,
      CASE WHEN r = 0 THEN text ELSE concat(text, ' rep', cast(r AS STRING)) END AS content
    FROM {documents_rel}
    CROSS JOIN (SELECT CAST(range AS INT) AS r FROM range({replicas})) reps
    """
    if sha_fn == "spark":
        # Spark has no range() table function in plain SQL joins pre-3.4 style;
        # use explode(sequence(...)) instead.
        base = f"""
    SELECT
      source AS repo,
      concat('src/', source, '/file_', cast(doc_id AS STRING), '_', cast(r AS STRING), '.', {_CASE_SQL}) AS path,
      substr({sha("concat(cast(doc_id AS STRING), ':', cast(r AS STRING))")}, 1, 40) AS commit,
      {_CASE_SQL} AS lang,
      CASE WHEN r = 0 THEN text ELSE concat(text, ' rep', cast(r AS STRING)) END AS content
    FROM (SELECT d.*, explode(sequence(0, {replicas - 1})) AS r FROM {documents_rel} d)
    """
    return base


def corpus_oracle_sql(replicas: int = 1) -> str:
    """DuckDB-side derivation over the pre-registered ``documents`` view."""
    return corpus_sql("documents", "duckdb", replicas)


def load_corpus(spark: SparkSession, sf_dir: str, replicas: int = 1) -> DataFrame:
    """Synthesize the corpus table from {sf_dir}/documents.parquet.

    The base table is fanned out across the cluster BEFORE the replica
    explode + sha256 derivation so the (row-multiplying) derivation runs
    on every core instead of on the single input split — at real scale the
    source is already many splits and this repartition is a no-op cost."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if replicas > 1:
        docs = docs.repartition(spark.sparkContext.defaultParallelism)
    docs.createOrReplaceTempView("__sg_documents")
    return spark.sql(corpus_sql("__sg_documents", "spark", replicas))


@F.pandas_udf(StringType())
def uuid5_udf(urls: pd.Series) -> pd.Series:
    """Vectorized UUIDv5(SPYGLASS_NS, url) — deterministic doc ids
    (schema.rs:112-119)."""
    return urls.map(lambda u: str(uuid.uuid5(SPYGLASS_NS, u)))


def build_tags_dim(corpus: DataFrame) -> DataFrame:
    """Tag dimension: (id, label, value) — lens:<lang> + repository:<repo>
    (tag model: /root/reference/crates/entities/src/models/tag.rs:18-58).
    Ids are dense ranks over (label, value): deterministic, SQL-expressible."""
    tags = (
        corpus.select(F.lit("lens").alias("label"), F.col("lang").alias("value"))
        .union(corpus.select(F.lit("repository").alias("label"), F.col("repo").alias("value")))
        .distinct()
    )
    w = Window.orderBy("label", "value")
    return tags.withColumn("id", F.row_number().over(w).cast("long")).select("id", "label", "value")


TAGS_DIM_ORACLE_SQL_TEMPLATE = """
WITH corpus AS ({corpus}),
tagvals AS (
  SELECT DISTINCT 'lens' AS label, lang AS value FROM corpus
  UNION
  SELECT DISTINCT 'repository' AS label, repo AS value FROM corpus
)
SELECT CAST(row_number() OVER (ORDER BY label, value) AS BIGINT) AS id, label, value FROM tagvals
"""


# --- deterministic date fields (µs since epoch) -------------------------
# The reference schema v4 indexes `published` / `lastmodified` as
# fast+indexed+stored µs timestamps (schema.rs:179-195). The driver's
# synthetic corpus has no dates, so we derive them deterministically from
# sha256(url) with expressions that exist identically in Spark SQL and
# DuckDB SQL (oracle-reproducible, no external data):
#   published    = 2020-01-01T00:00:00Z + (h1 mod ~5y) seconds
#   lastmodified = published + (h2 mod 90d) seconds
_EPOCH_2020_US = 1577836800000000
_PUB_SPAN_S = 157766400  # ≈5 years of seconds
_MOD_SPAN_S = 7776000  # 90 days of seconds

PUBLISHED_SPARK_SQL = (
    f"CAST({_EPOCH_2020_US} + (CAST(conv(substr(sha2(url, 256), 1, 15), 16, 10) "
    f"AS BIGINT) % {_PUB_SPAN_S}) * 1000000 AS BIGINT)")
LASTMODIFIED_SPARK_SQL = (
    f"CAST({PUBLISHED_SPARK_SQL} + (CAST(conv(substr(sha2(url, 256), 16, 15), 16, 10) "
    f"AS BIGINT) % {_MOD_SPAN_S}) * 1000000 AS BIGINT)")

PUBLISHED_DUCKDB_SQL = (
    f"CAST({_EPOCH_2020_US} + (('0x' || substr(sha256(url), 1, 15))::BIGINT "
    f"% {_PUB_SPAN_S}) * 1000000 AS BIGINT)")
LASTMODIFIED_DUCKDB_SQL = (
    f"CAST({PUBLISHED_DUCKDB_SQL} + (('0x' || substr(sha256(url), 16, 15))::BIGINT "
    f"% {_MOD_SPAN_S}) * 1000000 AS BIGINT)")


def published_py(url: str) -> int:
    """Python mirror of PUBLISHED_SPARK_SQL (for the oracle index)."""
    import hashlib

    h = int(hashlib.sha256(url.encode()).hexdigest()[:15], 16)
    return _EPOCH_2020_US + (h % _PUB_SPAN_S) * 1_000_000


def lastmodified_py(url: str) -> int:
    import hashlib

    h = int(hashlib.sha256(url.encode()).hexdigest()[15:30], 16)
    return published_py(url) + (h % _MOD_SPAN_S) * 1_000_000


def to_documents(corpus: DataFrame, tags_dim: DataFrame | None = None) -> DataFrame:
    """Map the corpus to the spyglass schema-v4 document table
    (doc_id, url, domain, title, content, tags, content_sha256,
    published, lastmodified)."""
    if tags_dim is None:
        tags_dim = build_tags_dim(corpus)
    url = F.concat(F.lit("repo://"), F.col("repo"), F.lit("/"), F.col("path"),
                   F.lit("@"), F.col("commit"))
    docs = corpus.select(
        url.alias("url"),
        F.col("repo").alias("domain"),
        F.col("path").alias("title"),
        F.col("content"),
        F.col("lang"),
        F.sha2(F.col("content"), 256).alias("content_sha256"),
    ).withColumn("doc_id", uuid5_udf(F.col("url")))

    lens = tags_dim.filter(F.col("label") == "lens").select(
        F.col("value").alias("lang"), F.col("id").alias("lens_tag"))
    repo = tags_dim.filter(F.col("label") == "repository").select(
        F.col("value").alias("domain"), F.col("id").alias("repo_tag"))
    docs = (
        docs.join(F.broadcast(lens), "lang", "left")
        .join(F.broadcast(repo), "domain", "left")
        .withColumn("tags", F.array_sort(F.array("lens_tag", "repo_tag")))
        .drop("lens_tag", "repo_tag", "lang")
    )
    docs = (docs.withColumn("published", F.expr(PUBLISHED_SPARK_SQL))
                .withColumn("lastmodified", F.expr(LASTMODIFIED_SPARK_SQL)))
    return docs.select("doc_id", "url", "domain", "title", "content", "tags",
                       "content_sha256", "published", "lastmodified")
