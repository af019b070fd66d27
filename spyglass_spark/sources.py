"""Corpus source readers — the scan side of SURVEY §2.2 re-expressed as
Spark sources. The reference crawls HTTP/file/API feeds into its document
pipeline; here any table-like source that yields the corpus shape
(repo, path, commit, lang, content) or the documents shape
(doc_id, url, domain, title, content, tags) can feed the index builder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CORPUS_COLUMNS = {"repo", "path", "commit", "lang", "content"}
DOCUMENT_COLUMNS = {"doc_id", "url", "domain", "title", "content", "tags"}

_FORMATS = {"parquet": "parquet", "pq": "parquet", "json": "json",
            "jsonl": "json", "ndjson": "json", "csv": "csv", "orc": "orc"}


def read_corpus(spark: SparkSession, path: str, fmt: str | None = None,
                **options) -> DataFrame:
    """Read a corpus/documents table from parquet/json/csv/orc (format
    inferred from the extension when not given) and validate its shape."""
    if fmt is None:
        ext = path.rstrip("/").rsplit(".", 1)[-1].lower()
        fmt = _FORMATS.get(ext, "parquet")
    reader = spark.read
    if fmt == "csv":
        reader = reader.option("header", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    df = reader.format(fmt).load(path)
    cols = set(df.columns)
    if not (CORPUS_COLUMNS <= cols or DOCUMENT_COLUMNS - {"tags"} <= cols):
        raise ValueError(
            f"source {path} has columns {sorted(cols)}; expected the corpus "
            f"shape {sorted(CORPUS_COLUMNS)} or documents shape "
            f"{sorted(DOCUMENT_COLUMNS)}")
    return df
