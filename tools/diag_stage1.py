#!/usr/bin/env python
"""Diagnostic 2: split stage1 into (a) corpus derivation+materialize,
(b) shuffle+tokenize+write from a materialized documents table.

Usage: python tools/diag_stage1.py <cores> [replicas]
"""
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/dev/shm/spyglass_diag2"


def main(cores: int, replicas: int) -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from spyglass_spark.corpus import load_corpus, to_documents
    from spyglass_spark.index import builder as B

    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK, exist_ok=True)
    spark = (SparkSession.builder.appName(f"diag2-{cores}")
             .master(f"local[{cores}]")
             .config("spark.sql.shuffle.partitions", str(max(cores, 8)))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.local.dir", f"{WORK}/spark_local")
             .config("spark.driver.memory", "48g")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    phases = {}

    def timed(name, fn):
        t0 = time.time()
        r = fn()
        phases[name] = round(time.time() - t0, 2)
        return r

    # warmup
    cw = load_corpus(spark, SF_DIR, replicas=1)
    to_documents(cw).groupBy((F.col("doc_id").substr(1, 2)).alias("g")).count().collect()

    c = load_corpus(spark, SF_DIR, replicas=replicas)
    c = c.withColumn("content", F.repeat(F.concat(F.col("content"), F.lit(" ")), 16))
    docs = to_documents(c)

    # (a) derivation chain + write documents table
    timed("derive_write_docs", lambda: docs.write.mode("overwrite")
          .parquet(f"{WORK}/docs"))

    docs2 = spark.read.parquet(f"{WORK}/docs")
    docs_p = docs2.withColumn("part_id", B.part_id_col(128))

    # (b) shuffle + tokenize + write from materialized table
    timed("tokenize_from_table", lambda: (
        docs_p.groupBy("part_id")
        .applyInPandas(B._build_segment, B.SEGMENT_SCHEMA)
        .write.mode("overwrite").parquet(f"{WORK}/stage1")))

    # (c) shuffle-only control: same groupBy shuffle, trivial pandas fn
    import pandas as pd

    def trivial(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"part_id": [int(pdf["part_id"].iloc[0])],
                             "n": [len(pdf)], "b": [int(pdf["content"].str.len().sum())]})

    timed("shuffle_only_control", lambda: (
        docs_p.groupBy("part_id")
        .applyInPandas(trivial, "part_id int, n long, b long")
        .write.mode("overwrite").parquet(f"{WORK}/ctrl")))

    print(json.dumps({"cores": cores, "replicas": replicas, "phases": phases}))
    spark.stop()
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]) if len(sys.argv) > 2 else 64)
