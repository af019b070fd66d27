#!/usr/bin/env python
"""Phase diagnostic for the single-pass builder at a given core count.

Isolates: (A) corpus derive + shuffle, (B) A + tokenize/encode in
applyInPandas, (C) the full build (B + store write + stats jobs), using
noop sinks for A/B. Prints one JSON line.

Usage: python tools/diag_build2.py <cores> [replicas]
"""
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/dev/shm/spyglass_diag2"

_KERNEL = """
import time, duckdb
texts = [r[0]*16 for r in duckdb.sql(
    "SELECT text FROM '%s/documents.parquet' LIMIT 400").fetchall()]
import sys; sys.path.insert(0, %r)
from spyglass_spark.analysis.analyzer import tokenize_en
t0 = time.time(); n = 0
for t in texts:
    n += len(tokenize_en(t))
print(n / (time.time() - t0))
""" % (SF_DIR, REPO)


def kernel_probe(procs: int = 4) -> float:
    ps = [subprocess.Popen([sys.executable, "-c", _KERNEL],
                           stdout=subprocess.PIPE) for _ in range(procs)]
    return round(sum(float(p.communicate()[0]) for p in ps) / 1e6, 2)


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

    def docs_of(reps):
        c = load_corpus(spark, SF_DIR, replicas=reps)
        c = c.withColumn("content",
                         F.repeat(F.concat(F.col("content"), F.lit(" ")), 16))
        return to_documents(c)

    # warmup small build
    B.build_index(spark, docs_of(1), f"{WORK}/warm", num_partitions=32, waves=1)

    out = {"cores": cores, "replicas": replicas,
           "kernel_mtoks_before": kernel_probe()}
    P = 128
    docs_p = docs_of(replicas).withColumn("part_id", B.part_id_col(P))

    t0 = time.time()
    (docs_p.repartition(P, "part_id")
     .write.format("noop").mode("overwrite").save())
    out["A_derive_shuffle"] = round(time.time() - t0, 2)

    t0 = time.time()
    (docs_p.repartition(P, "part_id").groupBy("part_id")
     .applyInPandas(B._build_segment, B.SEGMENT_SCHEMA)
     .write.format("noop").mode("overwrite").save())
    out["B_plus_tokenize"] = round(time.time() - t0, 2)

    t0 = time.time()
    m = B.build_index(spark, docs_of(replicas), f"{WORK}/index",
                      num_partitions=P, waves=1)
    out["C_full_build"] = round(time.time() - t0, 2)
    out["kernel_mtoks_after"] = kernel_probe()

    # per-part compute seen inside the UDF (lineage)
    lin = (B.read_store(spark, f"{WORK}/index")
           .filter(F.col("kind") == B.KIND_LINEAGE)
           .select("term").collect())
    els = [json.loads(r["term"])["elapsed_sec"] for r in lin]
    out["udf_sum_sec"] = round(sum(els), 1)
    out["udf_max_sec"] = round(max(els), 2)
    out["udf_ideal_wall"] = round(sum(els) / cores, 2)
    out["n_docs"] = m.num_docs
    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]) if len(sys.argv) > 2 else 32)
