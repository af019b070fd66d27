"""Index integrity audit: a healthy index reports zero violations with
token totals matching the manifest; targeted corruption of posting
payloads or the term_stats store is detected; the audit stays clean
through the delete→merge lifecycle (the mutation path it exists for)."""

import glob
import os
import shutil

import pytest

pyspark = pytest.importorskip("pyspark")
pa = pytest.importorskip("pyarrow")
import pyarrow.parquet as pq  # noqa: E402


def _report(spark, index_dir):
    from spyglass_spark.index.fsck import fsck

    return {(r["gen"], r["field"]): r.asDict()
            for r in fsck(spark, index_dir).collect()}


def _assert_clean(rep):
    assert rep, "empty fsck report"
    for key, row in rep.items():
        assert row["violations"] == 0, (key, row)
        assert row["stats_mismatches"] == 0, (key, row)


@pytest.fixture()
def index_copy(built_index, tmp_path):
    dst = str(tmp_path / "idx")
    shutil.copytree(built_index["index_dir"], dst)
    return dst


def test_clean_index_audits_green(spark, built_index):
    rep = _report(spark, built_index["index_dir"])
    _assert_clean(rep)
    # decoded token totals must equal the manifest's field_totals —
    # the audit recounts by decoding every posting byte
    gen = built_index["manifest"].gen_list()[0]["prefix"]
    totals = built_index["manifest"].field_totals
    for f, expect in totals.items():
        assert rep[(gen, f)]["sum_cf"] == expect, f
    # every doc accounted for
    assert rep[(gen, "<doc_meta>")]["chunks"] == len(built_index["docs"])


def _drop_crc(path):
    crc = os.path.join(os.path.dirname(path),
                       "." + os.path.basename(path) + ".crc")
    if os.path.exists(crc):
        os.unlink(crc)


def _tamper_posting(index_dir, mutate):
    """Rewrite the first kind=0 parquet file with ``mutate(table) -> table``."""
    files = sorted(glob.glob(
        f"{index_dir}/segments/store/wave=*/kind=0/*.parquet"))
    t = pq.read_table(files[0])
    pq.write_table(mutate(t), files[0])
    _drop_crc(files[0])


def test_detects_corrupt_posting_payload(spark, index_copy):
    def mutate(t):
        col = t["doc_bytes"].to_pylist()
        b = bytearray(col[0])
        b[-1] ^= 0xFF                      # flip bits in the varint stream
        col[0] = bytes(b)
        return t.set_column(t.schema.get_field_index("doc_bytes"),
                            "doc_bytes", pa.array(col, pa.binary()))
    _tamper_posting(index_copy, mutate)
    rep = _report(spark, index_copy)
    assert sum(r["violations"] for r in rep.values()) >= 1


def test_detects_lying_df_metadata(spark, index_copy):
    def mutate(t):
        df = t["df_part"].to_pylist()
        df[0] += 1                          # stored count no longer matches
        return t.set_column(t.schema.get_field_index("df_part"),
                            "df_part", pa.array(df, t["df_part"].type))
    _tamper_posting(index_copy, mutate)
    rep = _report(spark, index_copy)
    # the lie surfaces twice: decoded-count mismatch AND a term_stats row
    # that no longer matches the store aggregation
    assert sum(r["violations"] for r in rep.values()) >= 1
    assert sum(r["stats_mismatches"] for r in rep.values()) >= 1


def _tamper_stats(index_copy, new_cf_first):
    files = sorted(glob.glob(f"{index_copy}/segments/term_stats/*.parquet"))
    t = pq.read_table(files[0])
    cf = t["cf"].to_pylist()
    cf[0] = new_cf_first(cf[0])
    t = t.set_column(t.schema.get_field_index("cf"), "cf",
                     pa.array(cf, t["cf"].type))
    pq.write_table(t, files[0])
    _drop_crc(files[0])


def test_detects_corrupt_term_stats(spark, index_copy):
    _tamper_stats(index_copy, lambda v: v + 7)
    rep = _report(spark, index_copy)
    assert sum(r["stats_mismatches"] for r in rep.values()) >= 1
    assert sum(r["violations"] for r in rep.values()) == 0


def test_detects_null_cf_in_term_stats(spark, index_copy):
    """A NULL cf must count as a mismatch, not evaluate the comparison to
    NULL and vanish from the sum."""
    _tamper_stats(index_copy, lambda v: None)
    rep = _report(spark, index_copy)
    assert sum(r["stats_mismatches"] for r in rep.values()) >= 1


def test_detects_field_present_only_in_term_stats(spark, index_copy):
    """Garbage stats rows for a field with NO store rows (or a field whose
    entire store payload was lost) must surface — the report join is
    full-outer on field."""
    files = sorted(glob.glob(f"{index_copy}/segments/term_stats/*.parquet"))
    t = pq.read_table(files[0])
    ghost = {c: [t[c][0].as_py()] for c in t.schema.names}
    ghost["field"] = ["ghostfield"]
    t2 = pa.concat_tables([t, pa.table(ghost, schema=t.schema)])
    pq.write_table(t2, files[0])
    _drop_crc(files[0])
    rep = _report(spark, index_copy)
    row = rep[("segments", "ghostfield")]
    assert row["stats_mismatches"] >= 1


def test_detects_lost_doc_meta_row(spark, index_copy):
    """A doc that still ranks in postings but lost its stored fields is
    corruption on a fresh index — the doc_meta count is cross-checked
    against the lineage live-doc count."""
    files = sorted(glob.glob(
        f"{index_copy}/segments/store/wave=*/kind=3/*.parquet"))
    t = pq.read_table(files[0])
    assert t.num_rows > 1
    pq.write_table(t.slice(1), files[0])     # drop the first doc_meta row
    _drop_crc(files[0])
    rep = _report(spark, index_copy)
    assert rep[("segments", "<doc_meta>")]["violations"] >= 1


def test_audit_clean_after_delete_and_merge(spark, built_index, index_copy):
    """The mutation path the audit exists for: upsert a delta generation,
    tombstone docs, fold generations — every rewritten chunk must still
    roundtrip byte-identically."""
    from spyglass_spark.index.builder import (delete_by_ids,
                                              merge_generations,
                                              upsert_documents)

    docs = built_index["docs"]
    redo = [dict(d) for d in docs[:20]]
    upsert_documents(spark, spark.createDataFrame(redo), index_copy)
    delete_by_ids(index_copy, [d["doc_id"] for d in docs[30:40]])
    merge_generations(spark, index_copy)
    _assert_clean(_report(spark, index_copy))


def test_tombstone_audit(spark, built_index, index_copy):
    """Tombstone side tables are audited: in-range ordinals are clean; an
    out-of-range ordinal (bad part or local rank past the part size) is a
    violation."""
    from spyglass_spark.index.builder import delete_by_urls

    docs = built_index["docs"]
    delete_by_urls(spark, index_copy, [d["url"] for d in docs[:5]])
    rep = _report(spark, index_copy)
    _assert_clean(rep)
    assert rep[("<index>", "<tombstones>")]["chunks"] == 5

    files = sorted(glob.glob(f"{index_copy}/tombstones/*/*.parquet"))
    t = pq.read_table(files[0])
    ords = t["doc_ord"].to_pylist()
    ords[0] = (10_000 << 40) + 7          # no such part
    t = t.set_column(t.schema.get_field_index("doc_ord"), "doc_ord",
                     pa.array(ords, t["doc_ord"].type))
    pq.write_table(t, files[0])
    _drop_crc(files[0])
    rep = _report(spark, index_copy)
    assert rep[("<index>", "<tombstones>")]["violations"] >= 1


def test_source_sha_invariant(spark, built_index, index_copy):
    """input_hint per-row invariant: stored content_sha256 of every LIVE
    doc equals sha256 of the source content — superseded (tombstoned)
    copies are excluded, so the check stays clean across upserts, and a
    tampered stored hash is flagged."""
    import hashlib

    from spyglass_spark.index.builder import upsert_documents
    from spyglass_spark.index.fsck import fsck

    docs = built_index["docs"]
    src = spark.createDataFrame([
        {"doc_id": d["doc_id"], "content": d["content"]} for d in docs])

    def rep(idx, source):
        return {(r["gen"], r["field"]): r.asDict()
                for r in fsck(spark, idx, source=source).collect()}

    r = rep(index_copy, src)
    _assert_clean(r)
    assert r[("<index>", "<source_sha>")]["chunks"] == len(docs)

    # upsert with NEW content: the old copy is tombstoned and excluded;
    # the source must be the updated system of record
    upd = dict(docs[0]); upd["content"] = "fresh content zzz"
    upd["content_sha256"] = hashlib.sha256(upd["content"].encode()).hexdigest()
    upsert_documents(spark, spark.createDataFrame([upd]), index_copy,
                     num_partitions=2)
    src2 = spark.createDataFrame(
        [{"doc_id": upd["doc_id"], "content": upd["content"]}]
        + [{"doc_id": d["doc_id"], "content": d["content"]}
           for d in docs[1:]])
    r = rep(index_copy, src2)
    _assert_clean(r)
    assert r[("<index>", "<source_sha>")]["chunks"] == len(docs)

    # a stale source (old content for the upserted doc) must be flagged
    r = rep(index_copy, src)
    assert r[("<index>", "<source_sha>")]["violations"] == 1


def test_detects_tampered_stored_sha(spark, index_copy, built_index):
    files = sorted(glob.glob(
        f"{index_copy}/segments/store/wave=*/kind=3/*.parquet"))
    t = pq.read_table(files[0])
    sha = t["content_sha256"].to_pylist()
    sha[0] = "0" * 64
    t = t.set_column(t.schema.get_field_index("content_sha256"),
                     "content_sha256", pa.array(sha, t["content_sha256"].type))
    pq.write_table(t, files[0])
    _drop_crc(files[0])
    from spyglass_spark.index.fsck import fsck

    src = spark.createDataFrame([
        {"doc_id": d["doc_id"], "content": d["content"]}
        for d in built_index["docs"]])
    row = [r for r in fsck(spark, index_copy, source=src).collect()
           if r["field"] == "<source_sha>"][0]
    assert row["violations"] >= 1


def test_audit_plan_payload_never_shuffled(spark, built_index):
    """The payload branch must be Scan → Project → MapInPandas with no
    Exchange in between — index bytes are read once and never shuffled;
    only the tiny audited/metadata aggregates cross an exchange."""
    import re

    from spyglass_spark.index.fsck import fsck

    df = fsck(spark, built_index["index_dir"])
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    assert re.search(
        r"MapInPandas[^\n]*\n[^\n]*Project[^\n]*\n[^\n]*Scan parquet", plan), \
        plan.splitlines()[:40]


def test_cli_fsck_exit_codes(spark, index_copy):
    from spyglass_spark.cli import main

    assert main(["fsck", "--index", index_copy], spark=spark) == 0
    _tamper_posting(index_copy, lambda t: t.set_column(
        t.schema.get_field_index("cf_part"), "cf_part",
        pa.array([v + 1 for v in t["cf_part"].to_pylist()],
                 t["cf_part"].type)))
    assert main(["fsck", "--index", index_copy], spark=spark) == 1


def test_history_audit(spark, index_copy):
    """The manifest/snapshot-layer check: clean on a healthy index;
    flags a corrupted snapshot file, a snapshot whose filename lies
    about its seq, and a live manifest that is not the newest
    snapshot."""
    from spyglass_spark.index.manifest import history_path, list_snapshots

    rep = _report(spark, index_copy)
    row = rep[("<index>", "<history>")]
    assert row["violations"] == 0 and row["chunks"] == len(
        list_snapshots(index_copy))

    # (a) corrupt a snapshot file in place: 1 violation (unparseable);
    # the filename still lists, so the newest-check stays satisfied
    seqs = list_snapshots(index_copy)
    p = history_path(index_copy, seqs[-1])
    saved = open(p).read()
    with open(p, "w") as f:
        f.write("{not json")
    assert _report(spark, index_copy)[("<index>", "<history>")][
        "violations"] == 1
    with open(p, "w") as f:
        f.write(saved)

    # (b) a snapshot whose filename claims a different seq
    import shutil
    bogus = history_path(index_copy, seqs[-1] + 7)
    shutil.copyfile(p, bogus)
    row = _report(spark, index_copy)[("<index>", "<history>")]
    # the copy embeds the OLD seq (filename lies) AND outranks the live
    # manifest in the listing
    assert row["violations"] == 2
    os.unlink(bogus)
    _assert_clean(_report(spark, index_copy))
