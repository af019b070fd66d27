"""Distributed inverted-index builder — the Spark analog of the reference's
bulk-load pipeline (archive install → batched tokenize → writer.commit;
/root/reference/crates/spyglass/src/pipeline/cache_pipeline.rs:82-129,
documents/mod.rs:290-423), re-architected Spark-first:

  corpus/documents DataFrame
    → deterministic hash partitioning  part_id = sha256(url)[:60bits] % P
    → groupBy(part_id).applyInPandas   (Arrow-batched tokenize + local
      posting construction + delta/varint encode — "the 5,000-record batch"
      analog, vectorized, no per-row Python at the plan level)
    → repartitionByRange(field, term, part_id) merge pass
      (posting-list merge keyed by term; a hot term's chunks carry their
      part_id in the range key, so skewed terms like 'fn'/'import' spread
      across merge partitions — explicit salting per BASELINE north_rule)
    → term-sorted Parquet segment store + stats + manifest commit.

Doc ordinals: ``doc_ord = part_id * 2^40 + local_rank(url)``. Fully
deterministic with NO global pass: ordinals are identical at any
parallelism level (local[8] vs local[32] must produce identical top-k
tie-breaks), and postings store the small local ordinal for tight delta
compression. P (num_partitions) is an index property recorded in the
manifest, independent of cluster size.

Resumability: stage 1 runs in waves (part_id % waves); each completed wave
checkpoints. A restart skips completed waves (kill/resume test in
tests/test_resume.py). Per-partition lineage (n_docs, n_postings, ms,
docs/sec) is recorded in segments/lineage.
"""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..analysis.analyzer import analyze
from .codecs import encode_positions, encode_postings
from .fieldnorm import fieldnorm_to_id
from .manifest import (Manifest, commit_manifest, load_checkpoint,
                       load_manifest, save_checkpoint)

ORD_SHIFT = 40  # doc_ord = part_id << 40 | local_rank

TEXT_FIELDS = {"content": "content", "title": "title", "id": "doc_id",
               "domain": "domain", "url": "url"}
ALL_FIELDS = ("content", "title", "id", "domain", "url", "tags")

NORMS_MARK = "\x01norms"
LINEAGE_MARK = "\x01lineage"
DOCMETA_MARK = "\x01docmeta"

# One schema for all stage-1 row kinds (postings / norms / lineage /
# doc_meta) so the whole build is a single tokenize pass — nullable
# columns are near-free in Parquet.
SEGMENT_SCHEMA = (
    "part_id int, field string, term string, df_part long, cf_part long, "
    "n_local int, doc_bytes binary, tf_bytes binary, pos_bytes binary, "
    "meta_bytes binary, doc_id string, url string, domain string, "
    "title string, content_sha256 string, local_ord int"
)


def part_id_col(P: int, url_col: str = "url"):
    """Deterministic partition id from sha256(url) — computable identically
    in Spark, Python (oracle) and SQL."""
    return (F.conv(F.substring(F.sha2(F.col(url_col), 256), 1, 15), 16, 10)
            .cast("long") % F.lit(P)).cast("int")


def part_id_py(url: str, P: int) -> int:
    import hashlib

    return int(hashlib.sha256(url.encode("utf-8")).hexdigest()[:15], 16) % P


def _build_segment(pdf: pd.DataFrame) -> pd.DataFrame:
    """Build one doc-partition's full postings (runs on executors inside
    applyInPandas; pure numpy/python over an Arrow batch)."""
    t0 = time.time()
    pdf = pdf.sort_values("url", kind="mergesort").reset_index(drop=True)
    part_id = int(pdf["part_id"].iloc[0])
    n = len(pdf)
    norms = {f: np.zeros(n, dtype=np.uint8) for f in ALL_FIELDS}
    totals: dict[str, int] = defaultdict(int)
    postings: dict[tuple[str, str], list] = defaultdict(list)  # -> [(ord, positions)]

    for field, src_col in TEXT_FIELDS.items():
        col = pdf[src_col]
        for ord_ in range(n):
            toks = analyze(field, col.iat[ord_] or "")
            totals[field] += len(toks)
            norms[field][ord_] = fieldnorm_to_id(len(toks))
            by_term: dict[str, list[int]] = defaultdict(list)
            for pos, term in toks:
                by_term[term].append(pos)
            for term, positions in by_term.items():
                postings[(field, term)].append((ord_, positions))
    tag_col = pdf["tags"]
    for ord_ in range(n):
        tags = tag_col.iat[ord_]
        tags = sorted(set(int(t) for t in tags)) if tags is not None else []
        totals["tags"] += len(tags)
        norms["tags"][ord_] = fieldnorm_to_id(len(tags))
        for t in tags:
            postings[("tags", str(t))].append((ord_, [0]))

    nostr = (None, None, None, None, None, None)
    rows = []
    n_postings = 0
    for (field, term), plist in postings.items():
        ords = np.fromiter((o for o, _ in plist), dtype=np.uint64, count=len(plist))
        tfs = np.fromiter((len(p) for _, p in plist), dtype=np.uint64, count=len(plist))
        n_postings += int(tfs.sum())
        norm_ids = norms[field][ords.astype(np.int64)]
        doc_b, tf_b, meta_b = encode_postings(ords, tfs, norm_ids)
        pos_b = encode_positions([np.asarray(p, dtype=np.uint64) for _, p in plist])
        rows.append((part_id, field, term, len(plist), int(tfs.sum()),
                     n, doc_b, tf_b, pos_b, meta_b) + nostr)

    for field in ALL_FIELDS:
        rows.append((part_id, NORMS_MARK, field, 0, int(totals[field]), n,
                     norms[field].tobytes(), b"", b"", b"") + nostr)
    # doc_meta rows — same pass, no second scan over the corpus
    sha = pdf["content_sha256"] if "content_sha256" in pdf.columns else None
    for ord_ in range(n):
        rows.append((part_id, DOCMETA_MARK, None, 0, 0, n, b"", b"", b"", b"",
                     pdf["doc_id"].iat[ord_], pdf["url"].iat[ord_],
                     pdf["domain"].iat[ord_], pdf["title"].iat[ord_],
                     None if sha is None else sha.iat[ord_], ord_))
    elapsed = max(time.time() - t0, 1e-9)
    lineage = json.dumps({
        "part_id": part_id, "n_docs": n, "n_postings": n_postings,
        "n_terms": len(postings), "elapsed_sec": round(elapsed, 4),
        "docs_per_sec": round(n / elapsed, 2),
        "postings_per_sec": round(n_postings / elapsed, 2),
    })
    rows.append((part_id, LINEAGE_MARK, lineage, n, n_postings, n,
                 b"", b"", b"", b"") + nostr)
    return pd.DataFrame(rows, columns=[
        "part_id", "field", "term", "df_part", "cf_part", "n_local",
        "doc_bytes", "tf_bytes", "pos_bytes", "meta_bytes",
        "doc_id", "url", "domain", "title", "content_sha256", "local_ord"])


def build_index(spark: SparkSession, documents: DataFrame, index_dir: str,
                num_partitions: int = 32, waves: int = 1,
                merge_partitions: int | None = None,
                fail_after_wave: int | None = None) -> Manifest:
    """Build (or resume building) the index. ``documents`` must have columns
    doc_id, url, domain, title, content, tags (see corpus.to_documents).

    Resumable: completed stage-1 waves are skipped on restart.
    ``fail_after_wave`` injects a crash for the resume test.
    """
    existing = load_manifest(index_dir)
    if existing is not None and existing.committed:
        return existing
    os.makedirs(index_dir, exist_ok=True)
    ckpt = load_checkpoint(index_dir)
    t_start = time.time()

    docs = documents.withColumn("part_id", part_id_col(num_partitions))

    # ---- stage 1: per-partition segments, in resumable waves -----------
    for w in range(waves):
        if w in ckpt["completed_waves"]:
            continue
        wave_dir = f"{index_dir}/stage1/wave={w}"
        (docs.filter(F.col("part_id") % waves == w)
             .groupBy("part_id")
             .applyInPandas(_build_segment, SEGMENT_SCHEMA)
             .write.mode("overwrite").parquet(wave_dir))
        ckpt["completed_waves"].append(w)
        save_checkpoint(index_dir, ckpt)
        if fail_after_wave is not None and w >= fail_after_wave:
            raise RuntimeError(f"injected failure after wave {w}")
    ckpt["stage1_done"] = True
    save_checkpoint(index_dir, ckpt)

    stage1 = spark.read.parquet(f"{index_dir}/stage1/wave=*")
    posting_cols = ["part_id", "field", "term", "df_part", "cf_part", "n_local",
                    "doc_bytes", "tf_bytes", "pos_bytes", "meta_bytes"]
    real = stage1.filter(~F.col("field").startswith("\x01")).select(posting_cols)

    # ---- stage 2: term-keyed merge (repartitionByRange on term) --------
    # Hot-term skew (e.g. 'fn'/'import') is handled by the part_id in the
    # range key: a hot term's per-partition chunks spread across merge
    # partitions instead of landing on one reducer (explicit salting).
    mp = merge_partitions or spark.sparkContext.defaultParallelism
    (real.repartitionByRange(mp, "field", "term", "part_id")
         .sortWithinPartitions("field", "term", "part_id")
         .write.mode("overwrite").parquet(f"{index_dir}/segments/postings"))

    (real.groupBy("field", "term")
         .agg(F.sum("df_part").alias("df"), F.sum("cf_part").alias("cf"),
              F.count("*").alias("n_chunks"))
         .repartitionByRange(max(mp // 4, 1), "field", "term")
         .sortWithinPartitions("field", "term")
         .write.mode("overwrite").parquet(f"{index_dir}/segments/term_stats"))

    (stage1.filter(F.col("field") == NORMS_MARK)
           .select("part_id", F.col("term").alias("field"),
                   F.col("doc_bytes").alias("norm_bytes"),
                   F.col("cf_part").alias("total_tokens"),
                   F.col("n_local").alias("n_docs"))
           .repartitionByRange(max(mp // 4, 1), "part_id")
           .sortWithinPartitions("part_id", "field")
           .write.mode("overwrite").parquet(f"{index_dir}/segments/norms"))

    (stage1.filter(F.col("field") == LINEAGE_MARK)
           .select("part_id", F.col("term").alias("lineage_json"),
                   F.col("df_part").alias("n_docs"),
                   F.col("cf_part").alias("n_postings"))
           .coalesce(max(mp // 8, 1))
           .write.mode("overwrite").parquet(f"{index_dir}/segments/lineage"))

    (stage1.filter(F.col("field") == DOCMETA_MARK)
           .select("part_id", "local_ord", "doc_id", "url", "domain", "title",
                   "content_sha256",
                   (F.col("part_id").cast("long") * F.lit(1 << ORD_SHIFT)
                    + F.col("local_ord")).alias("doc_ord"))
           .repartitionByRange(max(mp // 4, 1), "part_id", "local_ord")
           .sortWithinPartitions("part_id", "local_ord")
           .write.mode("overwrite").parquet(f"{index_dir}/segments/doc_meta"))

    # ---- aggregates + manifest commit ----------------------------------
    norms_df = spark.read.parquet(f"{index_dir}/segments/norms")
    totals = {r["field"]: int(r["total"]) for r in
              norms_df.groupBy("field").agg(F.sum("total_tokens").alias("total")).collect()}
    lin = spark.read.parquet(f"{index_dir}/segments/lineage")
    agg = lin.agg(F.sum("n_docs").alias("nd"), F.sum("n_postings").alias("np"),
                  F.count("*").alias("parts"),
                  F.max("n_postings").alias("maxp"),
                  F.avg("n_postings").alias("avgp")).collect()[0]
    # skew ratio over the merged term postings (hot terms like 'fn'/'import')
    stats = spark.read.parquet(f"{index_dir}/segments/term_stats")
    tf_stats = stats.filter(F.col("field") == "content").agg(
        F.max("df").alias("max_df"), F.avg("df").alias("avg_df")).collect()[0]

    wall = time.time() - t_start
    m = Manifest(
        num_docs=int(agg["nd"] or 0),
        num_partitions=num_partitions,
        waves=waves,
        field_totals=totals,
        metrics={
            "build_wall_sec": round(wall, 3),
            "docs_per_sec": round((agg["nd"] or 0) / wall, 2),
            "postings_per_sec": round((agg["np"] or 0) / wall, 2),
            "n_parts_built": int(agg["parts"] or 0),
            "partition_skew_ratio": round(
                float(agg["maxp"]) / max(float(agg["avgp"] or 1), 1e-9), 3)
            if agg["maxp"] is not None else None,
            "term_df_skew_ratio": round(
                float(tf_stats["max_df"]) / max(float(tf_stats["avg_df"] or 1), 1e-9), 3)
            if tf_stats["max_df"] is not None else None,
        },
    )
    commit_manifest(index_dir, m)
    return m


def delete_by_ids(index_dir: str, doc_ids: list[str]) -> Manifest:
    """delete_many_by_id analog (client/local.rs:39-50): tombstone doc_ids
    in the manifest (postings untouched until a future merge — like
    tantivy's deletes-as-tombstones). N and df keep counting deleted docs,
    matching tantivy's max_doc-based stats (SURVEY §2.11)."""
    m = load_manifest(index_dir)
    if m is None:
        raise FileNotFoundError(f"no committed index at {index_dir}")
    m.tombstones = sorted(set(m.tombstones) | set(doc_ids))
    commit_manifest(index_dir, m)
    return m
