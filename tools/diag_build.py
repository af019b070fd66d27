#!/usr/bin/env python
"""Diagnostic: time each phase of the index build at a given core count.

Usage: python tools/diag_build.py <cores> [replicas]
Prints a phase-time JSON to stdout. Work dir on /dev/shm.
"""
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/dev/shm/spyglass_diag"


def main(cores: int, replicas: int) -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from spyglass_spark.corpus import load_corpus, to_documents
    from spyglass_spark.index import builder as B

    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK, exist_ok=True)
    spark = (SparkSession.builder.appName(f"diag-{cores}")
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

    # warmup: small build to spawn python workers + codegen
    c = load_corpus(spark, SF_DIR, replicas=1)
    docs_w = to_documents(c.withColumn("content", F.repeat(F.concat(F.col("content"), F.lit(" ")), 16)))
    B.build_index(spark, docs_w, f"{WORK}/warm", num_partitions=32, waves=1)

    c = load_corpus(spark, SF_DIR, replicas=replicas)
    c = c.withColumn("content", F.repeat(F.concat(F.col("content"), F.lit(" ")), 16))
    docs = to_documents(c)

    index_dir = f"{WORK}/index"
    num_partitions = 128
    t_all = time.time()

    docs_p = docs.withColumn("part_id", B.part_id_col(num_partitions))

    timed("stage1_tokenize_write", lambda: (
        docs_p.groupBy("part_id")
        .applyInPandas(B._build_segment, B.SEGMENT_SCHEMA)
        .write.mode("overwrite").parquet(f"{index_dir}/stage1")))

    stage1 = spark.read.parquet(f"{index_dir}/stage1")
    posting_cols = ["part_id", "field", "term", "df_part", "cf_part", "n_local",
                    "doc_bytes", "tf_bytes", "pos_bytes", "meta_bytes"]
    real = stage1.filter(F.col("kind") == 0).select(posting_cols)
    mp = 64

    timed("w_postings", lambda: (
        real.repartitionByRange(mp, "field", "term", "part_id")
        .sortWithinPartitions("field", "term", "part_id")
        .write.mode("overwrite").parquet(f"{index_dir}/postings")))

    timed("w_stats", lambda: (
        real.groupBy("field", "term")
        .agg(F.sum("df_part").alias("df"), F.sum("cf_part").alias("cf"),
             F.count("*").alias("n_chunks"))
        .repartitionByRange(16, "field", "term")
        .sortWithinPartitions("field", "term")
        .write.mode("overwrite").parquet(f"{index_dir}/term_stats")))

    timed("w_norms", lambda: (
        stage1.filter(F.col("kind") == 1)
        .select("part_id", F.col("term").alias("field"),
                F.col("doc_bytes").alias("norm_bytes"))
        .repartition(16, "part_id")
        .write.mode("overwrite").parquet(f"{index_dir}/norms")))

    timed("w_docmeta", lambda: (
        stage1.filter(F.col("kind") == 3)
        .select("part_id", "local_ord", "doc_id", "url", "domain", "title")
        .repartition(16, "part_id")
        .write.mode("overwrite").parquet(f"{index_dir}/doc_meta")))

    phases["total"] = round(time.time() - t_all, 2)
    # sizes
    sizes = {}
    for store in ("stage1", "postings", "term_stats", "norms", "doc_meta"):
        d = f"{index_dir}/{store}"
        if os.path.isdir(d):
            sizes[store] = round(sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(d) for f in fs) / 1e6, 1)
    print(json.dumps({"cores": cores, "replicas": replicas,
                      "phases": phases, "store_mb": sizes}))
    spark.stop()
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]) if len(sys.argv) > 2 else 64)
