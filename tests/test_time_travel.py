"""Time-travel reads: every commit publishes an immutable manifest
snapshot; SearchEngine(as_of=seq) serves the index exactly as of that
commit (pre-upsert / pre-delete audits), snapshots die loudly once a
merge physically reclaims their segments, and expire_history prunes."""

import pytest

pyspark = pytest.importorskip("pyspark")


def _urls(rows):
    return sorted(r["url"] for r in rows)


def test_as_of_sees_pre_upsert_and_pre_delete_state(spark, corpus_rows,
                                                    tmp_path):
    from spyglass_spark.index.builder import (build_index, delete_by_urls,
                                              upsert_documents)
    from spyglass_spark.index.manifest import list_snapshots, load_manifest
    from spyglass_spark.query.executor import SearchEngine
    from spyglass_spark.testing import corpus_to_documents

    docs, _ = corpus_to_documents(corpus_rows[:80])
    idx = str(tmp_path / "tt")
    build_index(spark, spark.createDataFrame(docs[:60]), idx,
                num_partitions=4, waves=1)
    seq_build = load_manifest(idx).commit_seq

    # commit 2: upsert 20 fresh docs with a marker term
    fresh = [dict(d, content=(d["content"] or "") + " timetravelmarker")
             for d in docs[60:80]]
    import hashlib
    for d in fresh:
        d["content_sha256"] = hashlib.sha256(d["content"].encode()).hexdigest()
    upsert_documents(spark, spark.createDataFrame(fresh), idx,
                     num_partitions=2)
    seq_upsert = load_manifest(idx).commit_seq

    # commit 3: delete two of the originals
    dead = [docs[0]["url"], docs[1]["url"]]
    delete_by_urls(spark, idx, dead)
    seq_delete = load_manifest(idx).commit_seq
    assert seq_build < seq_upsert < seq_delete
    assert list_snapshots(idx)[-3:] == [seq_build, seq_upsert, seq_delete]

    now = SearchEngine(spark, idx)
    at_build = SearchEngine(spark, idx, as_of=seq_build)
    at_upsert = SearchEngine(spark, idx, as_of=seq_upsert)

    # the marker docs exist from seq_upsert onward, not at seq_build
    assert at_build.search("timetravelmarker", k=30).count() == 0
    assert _urls(at_upsert.search("timetravelmarker", k=30).collect()) == \
        _urls(now.search("timetravelmarker", k=30).collect())

    # the deleted docs are still indexed at seq_upsert, gone now
    for u in dead:
        assert at_upsert.is_document_indexed(u)
        assert not now.is_document_indexed(u)

    # a pinned engine's snapshot equals the SAME state recomputed later:
    # bitwise score/ordinal equality against a fresh pinned engine
    key = lambda r: (r["doc_id"], r["score"], r["doc_ord"])
    a = [key(r) for r in at_upsert.search("parse token", k=20).collect()]
    b = [key(r) for r in SearchEngine(spark, idx, as_of=seq_upsert)
         .search("parse token", k=20).collect()]
    assert a == b

    # refresh() on a pinned engine is a no-op re-read, never advances
    at_build.refresh()
    assert at_build.manifest.commit_seq == seq_build


def test_merge_reclaims_old_snapshots_loudly(spark, corpus_rows, tmp_path):
    from spyglass_spark.index.builder import (build_index, merge_generations,
                                              upsert_documents)
    from spyglass_spark.index.manifest import load_manifest
    from spyglass_spark.query.executor import SearchEngine
    from spyglass_spark.testing import corpus_to_documents

    docs, _ = corpus_to_documents(corpus_rows[:60])
    idx = str(tmp_path / "ttm")
    build_index(spark, spark.createDataFrame(docs[:40]), idx,
                num_partitions=2, waves=1)
    seq_old = load_manifest(idx).commit_seq
    upsert_documents(spark, spark.createDataFrame(docs[40:60]), idx,
                     num_partitions=1)
    merge_generations(spark, idx)  # reclaims both pre-merge segment dirs

    with pytest.raises(FileNotFoundError, match="reclaimed"):
        SearchEngine(spark, idx, as_of=seq_old)
    # the post-merge snapshot itself stays readable
    cur = load_manifest(idx).commit_seq
    assert SearchEngine(spark, idx, as_of=cur).search("fn", k=5).count() > 0


def test_unknown_snapshot_lists_available(spark, corpus_rows, tmp_path):
    from spyglass_spark.index.builder import build_index
    from spyglass_spark.query.executor import SearchEngine
    from spyglass_spark.testing import corpus_to_documents

    docs, _ = corpus_to_documents(corpus_rows[:30])
    idx = str(tmp_path / "ttu")
    build_index(spark, spark.createDataFrame(docs), idx,
                num_partitions=2, waves=1)
    with pytest.raises(FileNotFoundError, match="available"):
        SearchEngine(spark, idx, as_of=999)


def test_expire_history_keeps_newest(spark, corpus_rows, tmp_path):
    from spyglass_spark.index.builder import build_index, delete_by_ids
    from spyglass_spark.index.manifest import expire_history, list_snapshots
    from spyglass_spark.testing import corpus_to_documents

    docs, _ = corpus_to_documents(corpus_rows[:30])
    idx = str(tmp_path / "tte")
    build_index(spark, spark.createDataFrame(docs), idx,
                num_partitions=2, waves=1)
    for d in docs[:4]:  # four more commits
        delete_by_ids(idx, [d["doc_id"]])
    seqs = list_snapshots(idx)
    assert len(seqs) == 5
    expired = expire_history(idx, keep_last=2)
    assert expired == seqs[:3]
    assert list_snapshots(idx) == seqs[-2:]


def test_compaction_preserves_snapshot_id_uniqueness(spark, corpus_rows,
                                                     tmp_path):
    """compact_index rebuilds into a fresh directory whose manifest line
    would restart at commit_seq=1 — the swap must CONTINUE the old line
    instead: snapshot ids are unique over the index's lifetime, so a seq
    pinned before the compaction can never silently alias the rebuilt
    state (it fails loudly; the segments it named are gone)."""
    from spyglass_spark.index.builder import (build_index, compact_index,
                                              delete_by_urls)
    from spyglass_spark.index.manifest import list_snapshots, load_manifest
    from spyglass_spark.query.executor import SearchEngine
    from spyglass_spark.testing import corpus_to_documents

    docs, _ = corpus_to_documents(corpus_rows[:40])
    idx = str(tmp_path / "ttc")
    sdf = spark.createDataFrame(docs)
    build_index(spark, sdf, idx, num_partitions=2, waves=1)
    seq_build = load_manifest(idx).commit_seq
    delete_by_urls(spark, idx, [docs[0]["url"]])
    seq_del = load_manifest(idx).commit_seq

    m = compact_index(spark, sdf, idx, num_partitions=2)
    assert m.commit_seq == seq_del + 1             # the line continues
    assert load_manifest(idx).commit_seq == seq_del + 1
    assert list_snapshots(idx) == [seq_del + 1]    # no aliased old ids
    for old in (seq_build, seq_del):               # loud, never aliased
        with pytest.raises(FileNotFoundError):
            SearchEngine(spark, idx, as_of=old)
    cur = SearchEngine(spark, idx, as_of=m.commit_seq)
    assert cur.manifest.num_docs == 39             # tombstone dropped
