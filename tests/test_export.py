"""export_matches — the training-data extraction sink: a query's FULL
match set materialized as a parquet dataset of system-of-record rows
(url-matched against the index's live set). Pinned against a scalar
brute-force match set, across both join strategies (broadcast urls vs
shuffle-hash), with column pruning / layout / tombstone behavior."""

import os

import pytest

from spyglass_spark.analysis.analyzer import tokenize_default, tokenize_en


@pytest.fixture(scope="module")
def eng(spark, built_index):
    from spyglass_spark.query.executor import SearchEngine

    return SearchEngine(spark, built_index["index_dir"])


def _brute_match_urls(docs, query, filters=()):
    """Independent match set with the scalar analyzers (incl. stemming),
    reference boolean semantics: Must(any should) AND every Must."""
    from spyglass_spark.query.compiler import compile_query

    cq = compile_query(query, filters)
    urls = set()
    for d in docs:
        fields = {
            "content": {t for _, t in tokenize_en(d["content"] or "")},
            "title": {t for _, t in tokenize_default(d["title"] or "")},
            "tags": {str(t) for t in d["tags"]},
        }
        should = any(t in fields.get(c.field, set())
                     for c in cq.should_group for t in c.terms)
        musts = all(all(t in fields.get(c.field, set()) for t in c.terms)
                    for c in cq.musts)
        if should and musts:
            urls.add(d["url"])
    return urls


@pytest.mark.parametrize("query,filters", [
    ("fn index", ()),
    ("parsing postings segment", ()),  # stemming-sensitive match set
])
def test_export_vs_bruteforce(eng, built_index, spark, tmp_path,
                              query, filters):
    docs = built_index["docs"]
    sdf = spark.createDataFrame(docs)
    out = str(tmp_path / "export")
    stats = eng.export_matches(query, sdf, out, filters=filters)
    expect = _brute_match_urls(docs, query, filters)
    got = spark.read.parquet(out).collect()
    assert {r["url"] for r in got} == expect
    assert stats["matched_urls"] == stats["rows_exported"] == len(expect)
    assert stats["broadcast"] is True
    # full system-of-record fidelity: every exported row carries the
    # original content, not the index's stored projection
    by_url = {d["url"]: d for d in docs}
    for r in got:
        assert r["content"] == by_url[r["url"]]["content"]
        assert sorted(r["tags"]) == sorted(by_url[r["url"]]["tags"])


def test_export_with_tag_filter(eng, built_index, spark, tmp_path):
    docs = built_index["docs"]
    tag = docs[0]["tags"][0]
    out = str(tmp_path / "export_tag")
    eng.export_matches("fn index", spark.createDataFrame(docs), out,
                       filters=[("tag", tag)])
    expect = _brute_match_urls(docs, "fn index", [("tag", tag)])
    assert {r["url"]
            for r in spark.read.parquet(out).collect()} == expect


def test_export_shuffle_path_identical(eng, built_index, spark, tmp_path):
    """broadcast_limit=0 forces the shuffle-hash leftsemi (the path a
    100 TB match set takes) — same dataset, broadcast=False."""
    docs = built_index["docs"]
    sdf = spark.createDataFrame(docs)
    out_b = str(tmp_path / "bcast")
    out_s = str(tmp_path / "shuffle")
    sb = eng.export_matches("fn index", sdf, out_b)
    ss = eng.export_matches("fn index", sdf, out_s, broadcast_limit=0)
    assert sb["broadcast"] is True and ss["broadcast"] is False
    rows_b = sorted(r["url"] for r in spark.read.parquet(out_b).collect())
    rows_s = sorted(r["url"] for r in spark.read.parquet(out_s).collect())
    assert rows_b == rows_s and sb["rows_exported"] == ss["rows_exported"]


def test_export_columns_layout(eng, built_index, spark, tmp_path):
    docs = built_index["docs"]
    out = str(tmp_path / "layout")
    eng.export_matches("fn index", spark.createDataFrame(docs), out,
                       columns=["url", "domain", "content_sha256"],
                       partition_by=["domain"], num_files=2)
    back = spark.read.parquet(out)
    assert set(back.columns) == {"url", "domain", "content_sha256"}
    # partitioned layout on disk → downstream partition pruning
    assert any(n.startswith("domain=") for n in os.listdir(out))
    expect = _brute_match_urls(docs, "fn index")
    assert {r["url"] for r in back.collect()} == expect


def test_export_empty_match(eng, built_index, spark, tmp_path):
    out = str(tmp_path / "empty")
    stats = eng.export_matches("the fast key",
                               spark.createDataFrame(built_index["docs"]),
                               out)
    assert stats["rows_exported"] == stats["matched_urls"] == 0
    assert spark.read.parquet(out).count() == 0


def test_cli_export(spark, built_index, tmp_path, capsys):
    """The export subcommand end-to-end: documents-shaped corpus in,
    pruned partitioned dataset out, stats JSON on stdout."""
    import json

    from spyglass_spark.cli import main

    docs = built_index["docs"]
    corpus = str(tmp_path / "docs.parquet")
    spark.createDataFrame(docs).write.parquet(corpus)
    out_dir = str(tmp_path / "cli_export")
    assert main(["export", "--index", built_index["index_dir"],
                 "--query", "fn index", "--corpus", corpus,
                 "--out", out_dir, "--columns", "url,domain",
                 "--partition-by", "domain"], spark=spark) == 0
    stats = json.loads(capsys.readouterr().out)
    expect = _brute_match_urls(docs, "fn index")
    assert stats["rows_exported"] == len(expect)
    assert {r["url"]
            for r in spark.read.parquet(out_dir).collect()} == expect

    # --scored: same sink with the relevance column attached
    import numpy as np

    out_sc = str(tmp_path / "cli_export_scored")
    assert main(["export", "--index", built_index["index_dir"],
                 "--query", "fn index", "--corpus", corpus,
                 "--out", out_sc, "--columns", "url", "--scored"],
                spark=spark) == 0
    json.loads(capsys.readouterr().out)
    got = {(r["url"], np.float32(r["score"]))
           for r in spark.read.parquet(out_sc).collect()}
    assert got == _oracle_scored(built_index["oracle"], "fn index")


def _oracle_scored(oracle, query, filters=()):
    """(url, float32 score) of the oracle's FULL score>0 match set."""
    import numpy as np

    return {(h["url"], np.float32(h["score"]))
            for h in oracle.search(query, filters, k=10**6)}


def test_score_matches_vs_oracle(eng, built_index):
    """score_matches: the full scored match set, bitwise float32 equal
    to the oracle's unbounded-k search — a doc's score here must be
    identical to its score at any rank of a top-k search."""
    import numpy as np

    for query, filters in [("fn index", ()),
                           ("parsing postings segment", ()),
                           ("fn index", [("tag", built_index["docs"][0]["tags"][0])])]:
        got = {(r["url"], np.float32(r["score"]))
               for r in eng.score_matches(query, filters).collect()}
        assert got == _oracle_scored(built_index["oracle"], query, filters), \
            (query, filters)


def test_score_matches_min_score(eng, built_index):
    import numpy as np

    exp = _oracle_scored(built_index["oracle"], "fn index")
    tau = float(sorted(s for _, s in exp)[len(exp) // 2])
    got = {(r["url"], np.float32(r["score"]))
           for r in eng.score_matches("fn index", min_score=tau).collect()}
    assert got == {(u, s) for u, s in exp if s >= np.float32(tau)}
    assert 0 < len(got) < len(exp)


def test_export_scored_vs_oracle(eng, built_index, spark, tmp_path):
    """export_scored: system-of-record rows + bitwise float32 score."""
    import numpy as np

    docs = built_index["docs"]
    out = str(tmp_path / "scored")
    stats = eng.export_scored("fn index", spark.createDataFrame(docs), out,
                              columns=["url", "content_sha256"])
    exp = _oracle_scored(built_index["oracle"], "fn index")
    back = spark.read.parquet(out).collect()
    assert {(r["url"], np.float32(r["score"])) for r in back} == exp
    assert stats["rows_exported"] == stats["matched_urls"] == len(exp)
    assert set(back[0].asDict()) == {"url", "content_sha256", "score"}
    # content fidelity through the scored sink
    by_url = {d["url"]: d for d in docs}
    assert all(r["content_sha256"] == by_url[r["url"]]["content_sha256"]
               for r in back)


def test_export_scored_threshold_and_shuffle_path(eng, built_index, spark,
                                                  tmp_path):
    import numpy as np

    docs = built_index["docs"]
    exp = _oracle_scored(built_index["oracle"], "fn index")
    tau = float(sorted(s for _, s in exp)[len(exp) // 2])
    out_b = str(tmp_path / "thr_b")
    out_s = str(tmp_path / "thr_s")
    sdf = spark.createDataFrame(docs)
    sb = eng.export_scored("fn index", sdf, out_b, min_score=tau)
    ss = eng.export_scored("fn index", sdf, out_s, min_score=tau,
                           broadcast_limit=0)
    assert sb["broadcast"] is True and ss["broadcast"] is False
    want = {(u, s) for u, s in exp if s >= np.float32(tau)}
    got_b = {(r["url"], np.float32(r["score"]))
             for r in spark.read.parquet(out_b).collect()}
    got_s = {(r["url"], np.float32(r["score"]))
             for r in spark.read.parquet(out_s).collect()}
    assert got_b == got_s == want
    assert sb["rows_exported"] == ss["rows_exported"] == len(want)


def test_export_excludes_tombstones(spark, built_index, tmp_path):
    """A deleted doc's url must not reach the export even though the
    system-of-record table still carries its row."""
    from spyglass_spark.index.builder import build_index, delete_by_urls
    from spyglass_spark.query.executor import SearchEngine

    docs = built_index["docs"]
    expect = _brute_match_urls(docs, "fn index")
    victim = sorted(expect)[0]
    index_dir = str(tmp_path / "idx")
    sdf = spark.createDataFrame(docs)
    build_index(spark, sdf, index_dir, num_partitions=4, waves=1)
    delete_by_urls(spark, index_dir, [victim])
    eng2 = SearchEngine(spark, index_dir)
    out = str(tmp_path / "export_del")
    stats = eng2.export_matches("fn index", sdf, out)
    got = {r["url"] for r in spark.read.parquet(out).collect()}
    assert got == expect - {victim}
    assert stats["rows_exported"] == len(expect) - 1
