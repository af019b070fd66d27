"""SymSpell deletion-neighborhood sidecar for fuzzy term matching.

One narrow Spark job over the (vocab-scale) term_stats store: merge df
across generations, explode each term's d=1 deletion variants with a
whole-stage-codegen ``transform`` expression (no Python in the plan),
and write (field, del_key, term, df) range-partitioned and sorted by
(field, del_key) with 4 MB row groups — so a query-time IN-list over
the pattern's own deletion variants is a row-group-pruned pyarrow read
(query/expand.expand_fuzzy), never a vocabulary scan.

The sidecar is versioned by ``manifest.commit_seq`` (the same monotonic
counter the per-worker caches key on): ``fuzzy_dict/seq=N``. A stale
sidecar is never read — the engine resolves the dir for the manifest it
loaded — and superseded seq dirs are pruned best-effort on rebuild.

At 100 TB: vocabulary grows ~log with corpus size, so the sidecar stays
orders of magnitude smaller than the postings store; the build is one
shuffle keyed by (field, del_key) over vocab-sized input.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..query.expand import deletion_key_expr
from .manifest import load_manifest

FUZZY_FIELDS = ("content", "title")


def fuzzy_dict_path(index_dir: str, commit_seq: int) -> str:
    return f"{index_dir}/fuzzy_dict/seq={commit_seq}"


def build_fuzzy_dict(spark: SparkSession, index_dir: str,
                     fields: tuple = FUZZY_FIELDS) -> str:
    """Build (or reuse) the deletion-variant sidecar for the index's
    current commit. Returns the sidecar directory. Idempotent: an
    existing complete sidecar for the same commit_seq is reused."""
    m = load_manifest(index_dir)
    if m is None or not m.committed:
        raise FileNotFoundError(f"no committed index manifest in {index_dir}")
    out = fuzzy_dict_path(index_dir, m.commit_seq)
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out

    stats = None
    for g in m.gen_list():
        s = spark.read.parquet(f"{index_dir}/{g['prefix']}/term_stats")
        stats = s if stats is None else stats.unionByName(s)
    merged = (stats.filter(F.col("field").isin(list(fields)))
                   .groupBy("field", "term")
                   .agg(F.sum("df").alias("df")))
    keyed = merged.select(
        "field",
        F.explode(deletion_key_expr("term")).alias("del_key"),
        "term", F.col("df").cast("long").alias("df"))
    (keyed.repartitionByRange(
            max(spark.sparkContext.defaultParallelism // 2, 1),
            "field", "del_key")
          .sortWithinPartitions("field", "del_key")
          .write.mode("overwrite")
          .option("parquet.block.size", str(4 * 1024 * 1024))
          .parquet(out))

    # prune superseded sidecars (best-effort; readers resolve by seq so
    # a concurrent old-manifest reader only loses its optional sidecar)
    base = os.path.dirname(out)
    for d in os.listdir(base):
        if d.startswith("seq=") and d != f"seq={m.commit_seq}":
            shutil.rmtree(os.path.join(base, d), ignore_errors=True)
    return out
