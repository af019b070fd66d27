"""Distributed index integrity audit (fsck).

tantivy ships segment validation (checksum + postings invariants) with its
index format; at 100 TB an index that was built once is then mutated by
upserts, predicate deletes, generation merges and compactions — the audit
is how an operator proves a maintenance pass didn't corrupt payloads
without re-running every query. Reference scope: the searcher owns the
physical index (spyglass-searcher/src/lib.rs); validation of that layout
is delegated to tantivy, re-expressed here for our kind-partitioned
parquet store (index/builder.py:20-46).

One heavy pass + two metadata-plane jobs per generation:

1. ``kind ∈ {0,1,3}`` grouped per part (the store is part-aligned, so
   this is a co-located group, no wide shuffle of payload bytes):
   every posting chunk is DECODED and RE-ENCODED — doc/tf/pos/meta bytes
   must be byte-identical (delta+varint+block-meta roundtrip over the
   actual fieldnorm ids), df_part/cf_part must equal the decoded counts,
   doc ords must be strictly increasing and inside the norms array, the
   per-field norms array must be n_local long and its token total must
   equal the field's posting cf sum, and doc_meta ordinals must be unique
   and in range.
2. stored (field, term) df/cf sums cross-checked against the term_stats
   store (the query-time source of BM25 idf) — full outer join, any
   orphan or mismatch counts against the field.
3. report: one row per (generation, field) plus a ``<doc_meta>`` row per
   generation; ``violations`` must be 0 and ``stats_mismatches`` 0 for a
   healthy index.

Memory per task is one part's payload (same bound as a build task); the
scan cost is O(index bytes) with no shuffle amplification — at 1000
executors the audit runs at aggregate scan bandwidth.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .builder import KIND_DOCMETA, KIND_NORMS, KIND_POSTING, read_store
from .codecs import (decode_positions, decode_postings, encode_positions,
                     encode_postings)
from .manifest import load_manifest

REPORT_SCHEMA = ("gen string, field string, chunks long, n_terms long, "
                 "sum_df long, sum_cf long, violations long, "
                 "stats_mismatches long")

_PART_COLS = ["kind", "field", "term", "df_part", "cf_part", "n_local",
              "doc_bytes", "tf_bytes", "pos_bytes", "meta_bytes",
              "local_ord"]


def _check_part(pdf: pd.DataFrame) -> pd.DataFrame:
    """Audit one part: returns per-field partial rows
    (field, chunks, sum_df, sum_cf, violations)."""
    kind = pdf["kind"].to_numpy()
    norms_rows = pdf[kind == KIND_NORMS]
    norms = {t: np.frombuffer(b, dtype=np.uint8)
             for t, b in zip(norms_rows["term"], norms_rows["doc_bytes"])}
    n_local = int(pdf["n_local"].iloc[0]) if len(pdf) else 0

    out: dict[str, dict] = {}

    def bump(field, key, by=1):
        row = out.setdefault(field, dict(chunks=0, sum_df=0, sum_cf=0,
                                         violations=0))
        row[key] += by

    for r in pdf[kind == KIND_POSTING].itertuples():
        bump(r.field, "chunks")
        bump(r.field, "sum_df", int(r.df_part))
        bump(r.field, "sum_cf", int(r.cf_part))
        try:
            docs, tfs = decode_postings(r.doc_bytes, r.tf_bytes)
            if docs.size != r.df_part or int(tfs.sum()) != r.cf_part:
                bump(r.field, "violations")   # stored counts lie
                continue
            if docs.size and np.any(np.diff(docs.astype(np.int64)) <= 0):
                bump(r.field, "violations")   # unsorted / duplicate ords
                continue
            narr = norms.get(r.field)
            if narr is None or (docs.size and int(docs.max()) >= narr.size):
                bump(r.field, "violations")   # ord outside the norms array
                continue
            db, tb, mb = encode_postings(docs, tfs,
                                         narr[docs.astype(np.int64)])
            if db != r.doc_bytes or tb != r.tf_bytes or mb != r.meta_bytes:
                bump(r.field, "violations")   # payload/block-meta corrupt
            pos = decode_positions(r.pos_bytes, int(docs.size))
            if (any(p.size != t for p, t in zip(pos, tfs))
                    or encode_positions(pos) != r.pos_bytes):
                bump(r.field, "violations")   # positions corrupt
        except Exception:                     # corrupt varint streams may
            bump(r.field, "violations")       # not even decode — still a
            continue                          # finding, never a crash

    # per-field norms structure: full-length array, token total ≡ Σ cf
    for r in norms_rows.itertuples():
        arr = norms[r.term]
        ok = (arr.size == r.n_local
              and int(r.cf_part) == out.get(r.term, {}).get("sum_cf", 0))
        if not ok:
            bump(r.term, "violations")

    # doc_meta: unique in-range ordinals, count bounded by the part size
    dm = pdf[kind == KIND_DOCMETA]
    if len(dm):
        ords = dm["local_ord"].to_numpy(np.int64)
        bad = (np.unique(ords).size != ords.size or ords.min() < 0
               or ords.max() >= n_local or len(dm) > n_local)
        bump("<doc_meta>", "chunks", len(dm))
        if bad:
            bump("<doc_meta>", "violations")

    rows = [dict(field=f, **v) for f, v in out.items()]
    if not rows:
        return pd.DataFrame(columns=["field", "chunks", "sum_df", "sum_cf",
                                     "violations"])
    return pd.DataFrame(rows)[["field", "chunks", "sum_df", "sum_cf",
                               "violations"]]


def fsck(spark: SparkSession, index_dir: str) -> DataFrame:
    """Audit every generation of the index; see module docstring.
    Returns one row per (gen, field) with REPORT_SCHEMA columns —
    a healthy index has violations = 0 and stats_mismatches = 0
    everywhere."""
    m = load_manifest(index_dir)
    reports = []
    for g in m.gen_list():
        store = read_store(spark, index_dir, g["prefix"])
        part_report = (
            store.filter(F.col("kind").isin(KIND_POSTING, KIND_NORMS,
                                            KIND_DOCMETA))
                 .select("part_id", *_PART_COLS)
                 .groupBy("part_id")
                 .applyInPandas(lambda _, pdf: _check_part(pdf),
                                ("field string, chunks long, sum_df long, "
                                 "sum_cf long, violations long"))
                 .groupBy("field")
                 .agg(F.sum("chunks").alias("chunks"),
                      F.sum("sum_df").alias("sum_df"),
                      F.sum("sum_cf").alias("sum_cf"),
                      F.sum("violations").alias("violations")))
        # stored per-term sums vs the term_stats store (BM25's idf source)
        stored = (store.filter(F.col("kind") == KIND_POSTING)
                       .groupBy("field", "term")
                       .agg(F.sum("df_part").alias("df2"),
                            F.sum("cf_part").alias("cf2")))
        stats = spark.read.parquet(f"{index_dir}/{g['prefix']}/term_stats")
        mism = (stats.join(stored, ["field", "term"], "full_outer")
                     .withColumn("bad", (F.col("df").isNull()
                                         | F.col("df2").isNull()
                                         | (F.col("df") != F.col("df2"))
                                         | (F.col("cf") != F.col("cf2")))
                                 .cast("long"))
                     .groupBy("field")
                     .agg(F.count("*").alias("n_terms"),
                          F.sum("bad").alias("stats_mismatches")))
        reports.append(
            part_report.join(mism, "field", "left_outer")
                       .select(F.lit(g["prefix"]).alias("gen"), "field",
                               "chunks",
                               F.coalesce("n_terms", F.lit(0)).alias("n_terms"),
                               "sum_df", "sum_cf", "violations",
                               F.coalesce("stats_mismatches",
                                          F.lit(0)).alias("stats_mismatches")))
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out
