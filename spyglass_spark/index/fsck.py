"""Distributed index integrity audit (fsck).

tantivy ships segment validation (checksum + postings invariants) with its
index format; at 100 TB an index that was built once is then mutated by
upserts, predicate deletes, generation merges and compactions — the audit
is how an operator proves a maintenance pass didn't corrupt payloads
without re-running every query. Reference scope: the searcher owns the
physical index (spyglass-searcher/src/lib.rs); validation of that layout
is delegated to tantivy, re-expressed here for our kind-partitioned
parquet store (index/builder.py:20-46).

Payload bytes are read EXACTLY ONCE and never shuffled: the heavy pass is
a ``mapInPandas`` over the kind=0 scan (any task split works — each chunk
is audited independently; the per-part fieldnorm arrays come from the
same per-worker pyarrow fragment-mapped reads the query path uses, so
there is no exchange, no cogroup, and task memory is one scan batch).
Every other check is a column-pruned metadata join that never touches a
payload column:

1. per posting chunk (heavy pass): DECODE and RE-ENCODE — doc/tf/pos/meta
   bytes must be byte-identical (delta+varint+block-meta roundtrip over
   the actual fieldnorm ids), df_part/cf_part must equal the decoded
   counts, doc ords must be strictly increasing and inside the norms
   array (whose length must equal the part size).
2. norms token accounting: Σ cf_part of a field's posting chunks per part
   must equal the kind=1 row's recorded total (full-outer join of two
   tiny aggregates; catches a field's norms row lost or left stale by a
   bad merge).
3. doc_meta ordinals: unique and in [0, n_local) per part — pure SQL over
   two pruned int columns.
4. stored (field, term) df/cf sums vs the term_stats store (the BM25 idf
   source) — full-outer join, orphans and mismatches both count.
5. tombstone side tables: every ordinal must land inside a real part's
   bounds (one int column joined against the per-part sizes).
6. optional (``source=`` a documents-shaped DataFrame): the input_hint's
   per-row invariant — every LIVE doc's stored ``content_sha256`` must
   equal sha256 of the system-of-record content (tombstoned copies are
   excluded: an upserted doc's superseded generation legitimately holds
   the old content's hash). Payload-free on the index side (doc_meta
   columns only); the source side is one sha2 scan + hash join.

7. manifest/snapshot layer (driver-side, zero jobs): history snapshots
   parse, are committed, embed the seq their filename claims; the live
   manifest is the newest snapshot and every generation dir it
   references exists (reclaimed dirs behind OLD snapshots are legal —
   those fail loudly at as_of load time instead).

Report: one row per (generation, field) plus ``<doc_meta>`` per
generation, ``<tombstones>`` and ``<history>`` per index; a healthy index has
violations = 0 and stats_mismatches = 0 everywhere. At 1000 executors
the audit runs at aggregate scan bandwidth; cost is O(index bytes) +
four metadata-plane joins.
"""

from __future__ import annotations

from functools import reduce

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .builder import (KIND_DOCMETA, KIND_NORMS, KIND_POSTING, ORD_SHIFT,
                      read_store)
from .codecs import (decode_positions, decode_postings, encode_positions,
                     encode_postings)
from .manifest import load_manifest

REPORT_SCHEMA = ("gen string, field string, chunks long, n_terms long, "
                 "sum_df long, sum_cf long, violations long, "
                 "stats_mismatches long")

_AUDIT_SCHEMA = ("field string, chunks long, sum_df long, sum_cf long, "
                 "violations long")


def _audit_factory(store_dir: str, epoch: str):
    """Per-batch posting audit kernel. Captures only constants; fieldnorm
    arrays are fetched through the query path's per-worker cache
    (executor._load_part_arrays — fragment-mapped pyarrow, part-pruned)."""

    def audit(batches):
        from ..query.executor import _load_part_arrays

        for pdf in batches:
            if not len(pdf):
                continue
            out: dict[str, dict] = {}

            def bump(field, key, by=1):
                row = out.setdefault(field, dict(chunks=0, sum_df=0,
                                                 sum_cf=0, violations=0))
                row[key] += by

            for pid, grp in pdf.groupby("part_id", sort=False):
                norms, _ = _load_part_arrays((store_dir,), int(pid), epoch)
                for r in grp.itertuples():
                    bump(r.field, "chunks")
                    bump(r.field, "sum_df", int(r.df_part))
                    bump(r.field, "sum_cf", int(r.cf_part))
                    try:
                        docs, tfs = decode_postings(r.doc_bytes, r.tf_bytes)
                        if (docs.size != r.df_part
                                or int(tfs.sum()) != r.cf_part):
                            bump(r.field, "violations")  # stored counts lie
                            continue
                        if docs.size and np.any(
                                np.diff(docs.astype(np.int64)) <= 0):
                            bump(r.field, "violations")  # unsorted/dup ords
                            continue
                        narr = norms.get(r.field)
                        if (narr is None or narr.size != r.n_local
                                or (docs.size
                                    and int(docs.max()) >= narr.size)):
                            bump(r.field, "violations")  # norms bounds
                            continue
                        db, tb, mb = encode_postings(
                            docs, tfs, narr[docs.astype(np.int64)])
                        if (db != r.doc_bytes or tb != r.tf_bytes
                                or mb != r.meta_bytes):
                            bump(r.field, "violations")  # payload corrupt
                        pos = decode_positions(r.pos_bytes, int(docs.size))
                        if (any(p.size != t for p, t in zip(pos, tfs))
                                or encode_positions(pos) != r.pos_bytes):
                            bump(r.field, "violations")  # positions corrupt
                    except Exception:        # corrupt varint streams may
                        bump(r.field, "violations")  # not even decode —
                        continue             # a finding, never a crash
            if out:
                yield pd.DataFrame(
                    [dict(field=f, **v) for f, v in out.items()])[
                    ["field", "chunks", "sum_df", "sum_cf", "violations"]]

    return audit


def _fsck_gen(spark: SparkSession, index_dir: str, prefix: str,
              epoch: str) -> DataFrame:
    store = read_store(spark, index_dir, prefix)
    post_meta = store.filter(F.col("kind") == KIND_POSTING)

    # heavy pass: payload read once, zero shuffle (see module docstring)
    audited = (
        post_meta.select("part_id", "field", "term", "df_part", "cf_part",
                         "n_local", "doc_bytes", "tf_bytes", "pos_bytes",
                         "meta_bytes")
                 .mapInPandas(_audit_factory(f"{index_dir}/{prefix}/store",
                                             epoch), _AUDIT_SCHEMA)
                 .groupBy("field")
                 .agg(F.sum("chunks").alias("chunks"),
                      F.sum("sum_df").alias("sum_df"),
                      F.sum("sum_cf").alias("sum_cf"),
                      F.sum("violations").alias("violations")))

    # norms token accounting — column-pruned, payload-free
    post_cf = (post_meta.groupBy("part_id", "field")
                        .agg(F.sum("cf_part").alias("post_cf")))
    norm_cf = (store.filter(F.col("kind") == KIND_NORMS)
                    .select("part_id", F.col("term").alias("field"),
                            F.col("cf_part").alias("norm_cf")))
    # a field may legitimately have zero postings in a part (all docs
    # empty for it) with a cf=0 norms row — missing post_cf counts as 0;
    # a MISSING norms row for a posting-bearing field is a violation
    norm_bad = (post_cf.join(norm_cf, ["part_id", "field"], "full_outer")
                       .withColumn("bad", (F.col("norm_cf").isNull()
                                           | (F.coalesce("post_cf", F.lit(0))
                                              != F.col("norm_cf")))
                                   .cast("long"))
                       .groupBy("field")
                       .agg(F.sum("bad").alias("norm_mismatches")))

    # doc_meta ordinal structure — pruned int columns, pure SQL. The live
    # row count must equal the LINEAGE row's df_part (the builder writes
    # it as the part's doc count and the merge maintains it as
    # docs − dropped), so LOST doc_meta rows are detected too — a doc
    # that still ranks but has no stored fields is corruption, not a
    # legitimate merge hole.
    from .builder import KIND_LINEAGE

    live = (store.filter(F.col("kind") == KIND_LINEAGE)
                 .select("part_id", F.col("df_part").alias("live_docs")))
    dm = (store.filter(F.col("kind") == KIND_DOCMETA)
               .groupBy("part_id")
               .agg(F.count("*").alias("n"),
                    F.countDistinct("local_ord").alias("nd"),
                    F.min("local_ord").alias("lo"),
                    F.max("local_ord").alias("hi"),
                    F.first("n_local").alias("n_local"))
               .join(live, "part_id", "full_outer")
               .select(F.lit("<doc_meta>").alias("field"),
                       F.coalesce("n", F.lit(0)).alias("chunks"),
                       ((F.col("nd") != F.col("n")) | (F.col("lo") < 0)
                        | (F.col("hi") >= F.col("n_local"))
                        | ~F.col("n").eqNullSafe(F.col("live_docs")))
                       .cast("long").alias("violations"))
               .groupBy("field")
               .agg(F.sum("chunks").alias("chunks"),
                    F.lit(0).cast("long").alias("sum_df"),
                    F.lit(0).cast("long").alias("sum_cf"),
                    F.sum("violations").alias("violations")))

    # stored per-term sums vs the term_stats store (BM25's idf source)
    stored = (post_meta.groupBy("field", "term")
                       .agg(F.sum("df_part").alias("df2"),
                            F.sum("cf_part").alias("cf2")))
    stats = spark.read.parquet(f"{index_dir}/{prefix}/term_stats")
    # null-safe: a corrupt NULL df/cf in a stats row must count as a
    # mismatch, not evaluate the comparison to NULL and vanish from sum()
    mism = (stats.join(stored, ["field", "term"], "full_outer")
                 .withColumn("bad",
                             (~F.col("df").eqNullSafe(F.col("df2"))
                              | ~F.col("cf").eqNullSafe(F.col("cf2")))
                             .cast("long"))
                 .groupBy("field")
                 .agg(F.count("*").alias("n_terms"),
                      F.sum("bad").alias("stats_mismatches")))

    # full_outer: a field present ONLY in term_stats (its store rows
    # lost, or garbage stats for a nonexistent field) must still surface
    fields = (audited.join(norm_bad, "field", "full_outer")
                     .join(mism, "field", "full_outer")
                     .select(F.lit(prefix).alias("gen"), "field",
                             F.coalesce("chunks", F.lit(0)).alias("chunks"),
                             F.coalesce("n_terms", F.lit(0)).alias("n_terms"),
                             F.coalesce("sum_df", F.lit(0)).alias("sum_df"),
                             F.coalesce("sum_cf", F.lit(0)).alias("sum_cf"),
                             (F.coalesce("violations", F.lit(0))
                              + F.coalesce("norm_mismatches", F.lit(0)))
                             .alias("violations"),
                             F.coalesce("stats_mismatches",
                                        F.lit(0)).alias("stats_mismatches")))
    return fields.unionByName(
        dm.select(F.lit(prefix).alias("gen"), "field", "chunks",
                  F.lit(0).cast("long").alias("n_terms"), "sum_df", "sum_cf",
                  "violations", F.lit(0).cast("long").alias("stats_mismatches")))


def _tombstone_report(spark: SparkSession, index_dir: str, m,
                      part_sizes: DataFrame) -> DataFrame | None:
    """Tombstone side tables: every ordinal must land inside a REAL
    part's bounds (part exists in some generation, local rank <
    that part's size) — a stale or corrupt tombstone can otherwise
    silently mask the wrong doc after a merge renumbers nothing (ordinals
    are stable) but a buggy writer emits garbage. Payload-free: one int
    column joined against the per-part sizes."""
    side = [f"{index_dir}/{d}" for d in m.tombstone_dirs]
    if not side:
        return None
    ords = spark.read.parquet(*side).select("doc_ord")
    t = ords.select(
        F.shiftright("doc_ord", ORD_SHIFT).alias("part_id"),
        (F.col("doc_ord") - F.shiftleft(F.shiftright("doc_ord", ORD_SHIFT),
                                        ORD_SHIFT)).alias("local_ord"))
    joined = t.join(part_sizes, "part_id", "left_outer")
    return (joined.select(
                ((F.col("n_local").isNull()) | (F.col("local_ord") < 0)
                 | (F.col("local_ord") >= F.col("n_local")))
                .cast("long").alias("bad"))
                  .agg(F.count("*").alias("chunks"),
                       F.sum("bad").alias("violations"))
                  .select(F.lit("<index>").alias("gen"),
                          F.lit("<tombstones>").alias("field"), "chunks",
                          F.lit(0).cast("long").alias("n_terms"),
                          F.lit(0).cast("long").alias("sum_df"),
                          F.lit(0).cast("long").alias("sum_cf"),
                          "violations",
                          F.lit(0).cast("long").alias("stats_mismatches")))


def _source_sha_report(spark: SparkSession, index_dir: str, m,
                       gens: list[dict], source: DataFrame) -> DataFrame:
    """Per-row invariant vs the system of record (BASELINE.json
    input_hint: content sha256 equality): every live doc_meta row's
    stored content_sha256 must equal sha256 of the source content."""
    from .builder import doc_meta_view

    dm = doc_meta_view(spark, index_dir, gens) \
        .select("doc_ord", "doc_id", "content_sha256")
    # exclude tombstoned copies: manifest doc_id list + side-table ords
    if m.tombstones:
        dm = dm.filter(~F.col("doc_id").isin(list(m.tombstones)))
    side = [f"{index_dir}/{d}" for d in m.tombstone_dirs]
    if side:
        dead = spark.read.parquet(*side).select("doc_ord").distinct()
        dm = dm.join(dead, "doc_ord", "left_anti")
    src = source.select("doc_id", F.sha2(F.col("content"), 256).alias("sha"))
    joined = dm.join(src, "doc_id", "left_outer")
    # null-safe: a NULL stored hash (or a doc missing from the source)
    # is a violation, never a NULL that vanishes from sum()
    return (joined.select((F.col("sha").isNull()
                           | ~F.col("content_sha256").eqNullSafe(
                               F.col("sha")))
                          .cast("long").alias("bad"))
                  .agg(F.count("*").alias("chunks"),
                       F.sum("bad").alias("violations"))
                  .select(F.lit("<index>").alias("gen"),
                          F.lit("<source_sha>").alias("field"), "chunks",
                          F.lit(0).cast("long").alias("n_terms"),
                          F.lit(0).cast("long").alias("sum_df"),
                          F.lit(0).cast("long").alias("sum_cf"),
                          "violations",
                          F.lit(0).cast("long").alias("stats_mismatches")))


def _history_report(spark: SparkSession, index_dir: str, m) -> DataFrame:
    """Manifest/snapshot-layer audit — driver-side, ZERO Spark jobs (the
    row is a literal VALUES LocalRelation): every history snapshot must
    parse, be committed and embed the seq its filename claims; ids never
    repeat (unique by filename); the CURRENT manifest must be the newest
    snapshot and every generation dir it references must exist on disk.
    Older snapshots may legitimately reference reclaimed dirs — those
    fail loudly at as_of load time instead (manifest.load_manifest)."""
    import json as _json
    import os

    from .manifest import history_path, list_snapshots

    bad = 0
    seqs = list_snapshots(index_dir)
    for s in seqs:
        try:
            with open(history_path(index_dir, s)) as f:
                snap = _json.loads(f.read())
            if not snap.get("committed") or \
                    int(snap.get("commit_seq", -1)) != s:
                bad += 1
        except (OSError, ValueError):
            bad += 1
    cur = getattr(m, "commit_seq", 0)
    if seqs and cur != seqs[-1]:
        bad += 1  # a commit landed without (or after) its snapshot
    for g in m.gen_list():
        if not os.path.isdir(os.path.join(index_dir, g["prefix"])):
            bad += 1  # the LIVE manifest references a reclaimed dir
    return spark.sql(
        "SELECT * FROM VALUES ('<index>', '<history>', "
        f"CAST({len(seqs)} AS LONG), CAST(0 AS LONG), CAST(0 AS LONG), "
        f"CAST(0 AS LONG), CAST({bad} AS LONG), CAST(0 AS LONG)) AS "
        "t(gen, field, chunks, n_terms, sum_df, sum_cf, violations, "
        "stats_mismatches)")


def fsck(spark: SparkSession, index_dir: str,
         source: DataFrame | None = None) -> DataFrame:
    """Audit every generation of the index; see module docstring.
    Returns one row per (gen, field) with REPORT_SCHEMA columns —
    a healthy index has violations = 0 and stats_mismatches = 0
    everywhere. Pass ``source`` (documents shape: doc_id + content) to
    also verify the stored content_sha256 of every live doc against the
    system of record."""
    m = load_manifest(index_dir)
    epoch = f"{m.created_utc}#{getattr(m, 'commit_seq', 0)}"
    gens = m.gen_list()
    reports = [_fsck_gen(spark, index_dir, g["prefix"], epoch) for g in gens]
    # per-part sizes across generations (part id ranges are disjoint by
    # construction: each generation allocates from next_part_offset)
    sizes = [read_store(spark, index_dir, g["prefix"])
             .filter(F.col("kind") == KIND_NORMS)
             .select("part_id", "n_local") for g in gens]
    part_sizes = reduce(DataFrame.unionByName, sizes).distinct()
    tomb = _tombstone_report(spark, index_dir, m, part_sizes)
    if tomb is not None:
        reports.append(tomb)
    reports.append(_history_report(spark, index_dir, m))
    if source is not None:
        reports.append(_source_sha_report(spark, index_dir, m, gens, source))
    return reduce(DataFrame.unionByName, reports)
