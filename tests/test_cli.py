"""spark-submit CLI surface: build → search → upsert → merge → stats →
delete run end-to-end in-process (the session is injected so the CLI
doesn't stop the shared pytest session; the spark-submit wiring itself is
driven by the verify skill)."""

import json

import pytest

pyspark = pytest.importorskip("pyspark")


def _run(capsys, spark, argv):
    from spyglass_spark.cli import main

    assert main(argv, spark=spark) == 0
    return capsys.readouterr().out


def test_cli_lifecycle(spark, corpus_rows, tmp_path, capsys):
    corpus = str(tmp_path / "corpus.parquet")
    spark.createDataFrame(corpus_rows[:60]).write.parquet(corpus)
    idx = str(tmp_path / "cliidx")

    out = _run(capsys, spark, ["build", "--corpus", corpus, "--index", idx,
                               "--partitions", "8", "--waves", "1"])
    m = json.loads(out)
    assert m["committed"] and m["num_docs"] == 60

    out = _run(capsys, spark, ["search", "--index", idx,
                               "--query", "fn index", "--k", "3"])
    hits = [json.loads(x) for x in out.strip().splitlines()]
    assert 1 <= len(hits) <= 3
    assert hits[0]["rank"] == 1 and hits[0]["score"] > 0

    # upsert a changed doc, then merge the two generations back into one
    upd = str(tmp_path / "upd.parquet")
    row = dict(corpus_rows[0])
    row["content"] = (row["content"] or "") + " climarker"
    spark.createDataFrame([row]).write.parquet(upd)
    out = _run(capsys, spark, ["upsert", "--corpus", upd, "--index", idx,
                               "--partitions", "4"])
    m = json.loads(out)
    assert len(m["generations"]) == 2

    # a second upsert under the auto-merge policy folds back to <= 2 gens
    upd2 = str(tmp_path / "upd2.parquet")
    row2 = dict(corpus_rows[1])
    row2["content"] = (row2["content"] or "") + " climarker2"
    spark.createDataFrame([row2]).write.parquet(upd2)
    out = _run(capsys, spark, ["upsert", "--corpus", upd2, "--index", idx,
                               "--partitions", "4", "--max-generations", "2"])
    m = json.loads(out)
    assert len(m["generations"]) <= 2

    out = _run(capsys, spark, ["merge", "--index", idx])
    m = json.loads(out)
    assert len(m["generations"]) == 1 and m["num_docs"] == 60

    out = _run(capsys, spark, ["search", "--index", idx,
                               "--query", "climarker", "--k", "3"])
    hits = [json.loads(x) for x in out.strip().splitlines()]
    assert len(hits) == 1

    out = _run(capsys, spark, ["stats", "--index", idx])
    assert json.loads(out)["num_docs"] == 60

    out = _run(capsys, spark, ["delete", "--index", idx,
                               "--doc-id", hits[0]["doc_id"]])
    assert json.loads(out)["tombstones"] == 1
    out = _run(capsys, spark, ["search", "--index", idx,
                               "--query", "climarker", "--k", "3"])
    assert out.strip() == ""

    # delete-by-url (delete_document_by_url RPC analog): the climarker2
    # doc goes away by its url, via an ordinal side table
    out = _run(capsys, spark, ["search", "--index", idx,
                               "--query", "climarker2", "--k", "3"])
    hits2 = [json.loads(x) for x in out.strip().splitlines()]
    assert len(hits2) == 1
    out = _run(capsys, spark, ["delete", "--index", idx,
                               "--url", hits2[0]["url"]])
    assert json.loads(out)["tombstone_dirs"]
    out = _run(capsys, spark, ["search", "--index", idx,
                               "--query", "climarker2", "--k", "3"])
    assert out.strip() == ""

    # delete-by-domain (delete_domain RPC analog): every doc in the
    # domain goes away in one predicate-tombstone commit
    out = _run(capsys, spark, ["search", "--index", idx,
                               "--query", "fn index", "--k", "20"])
    first_url = json.loads(out.strip().splitlines()[0])["url"]
    dom = next(r["repo"] for r in corpus_rows[:60]
               if first_url.startswith(f"repo://{r['repo']}/"))
    out = _run(capsys, spark, ["delete", "--index", idx, "--domain", dom])
    assert json.loads(out)["tombstone_dirs"]
    out = _run(capsys, spark, ["search", "--index", idx,
                               "--query", "fn index", "--k", "50"])
    assert not [h for h in map(json.loads, out.strip().splitlines())
                if h["url"].startswith(f"repo://{dom}/")]


def test_cli_pattern_search_and_agg(spark, built_index, capsys):
    """--mode wildcard/regex dispatch and the agg subcommand (facets +
    date-histogram) over an existing index, pinned to the scalar oracle
    / interval alignment."""
    idx = built_index["index_dir"]
    oracle = built_index["oracle"]

    out = _run(capsys, spark, ["search", "--index", idx, "--mode",
                               "wildcard", "--query", "f?", "--k", "4"])
    hits = [json.loads(x) for x in out.strip().splitlines()]
    want = oracle.search_wildcard("f?", k=4)
    assert [h["doc_id"] for h in hits] == [w["doc_id"] for w in want]
    assert hits, "wildcard 'f?' must hit the fn term"

    out = _run(capsys, spark, ["search", "--index", idx, "--mode", "regex",
                               "--query", "(merg|fn)", "--k", "4"])
    hits = [json.loads(x) for x in out.strip().splitlines()]
    want = oracle.search_regex("(merg|fn)", k=4)
    assert [h["doc_id"] for h in hits] == [w["doc_id"] for w in want]

    out = _run(capsys, spark, ["search", "--index", idx, "--mode",
                               "term-range", "--query", "f,n", "--k", "4"])
    hits = [json.loads(x) for x in out.strip().splitlines()]
    want = oracle.search_term_range("f", "n", k=4)
    assert [h["doc_id"] for h in hits] == [w["doc_id"] for w in want]
    assert hits, "term-range [f,n) must hit the fn/merge vocabulary"

    out = _run(capsys, spark, ["search", "--index", idx, "--mode",
                               "term-set", "--query", "merge,fn,zzabsent",
                               "--k", "4"])
    hits = [json.loads(x) for x in out.strip().splitlines()]
    want = oracle.search_term_set(["merge", "fn", "zzabsent"], k=4)
    assert [h["doc_id"] for h in hits] == [w["doc_id"] for w in want]
    assert hits, "term-set {merge,fn} must hit"

    out = _run(capsys, spark, ["search", "--index", idx,
                               "--query", "parse token stream", "--k", "4",
                               "--combiner", "dismax",
                               "--tie-breaker", "0.35"])
    hits = [json.loads(x) for x in out.strip().splitlines()]
    want = oracle.search("parse token stream", k=4, combiner="dismax",
                         tie_breaker=0.35)
    assert [h["doc_id"] for h in hits] == [w["doc_id"] for w in want]
    assert hits, "dismax 'parse token stream' must hit"

    qs = '+merge "parse token"~1 title:file^2.5 -domain:org1/repo1'
    out = _run(capsys, spark, ["search", "--index", idx, "--mode",
                               "parsed", "--query", qs, "--k", "4"])
    hits = [json.loads(x) for x in out.strip().splitlines()]
    want = oracle.search_parsed(qs, k=4)
    assert [h["doc_id"] for h in hits] == [w["doc_id"] for w in want]
    assert hits, "parsed query string must hit"

    # collectors over a parsed string: count pinned to the oracle's
    # full match-set size
    out = _run(capsys, spark, ["agg", "--index", idx, "--kind", "count",
                               "--parsed", "--query", "+fn main merge"])
    n = json.loads(out.strip().splitlines()[-1])["n"]
    assert n == len(oracle.search_parsed("+fn main merge", k=10**6)) > 0

    out = _run(capsys, spark, ["agg", "--index", idx,
                               "--query", "fn index"])
    rows = [json.loads(x) for x in out.strip().splitlines()]
    assert rows and all(r["n"] > 0 for r in rows)

    week = 7 * 86_400_000_000
    out = _run(capsys, spark, ["agg", "--index", idx, "--kind",
                               "date-histogram", "--query", "fn index",
                               "--interval-us", str(week)])
    rows = [json.loads(x) for x in out.strip().splitlines()]
    assert rows and all(r["bucket"] % week == 0 for r in rows)
    assert sum(r["n"] for r in rows) > 0

    out = _run(capsys, spark, ["agg", "--index", idx, "--kind", "stats",
                               "--query", "fn index"])
    st = json.loads(out)
    assert st["n"] > 0 and st["min"] <= st["avg"] <= st["max"]
    assert st["sum"] >= st["n"] * st["min"]

    out = _run(capsys, spark, ["agg", "--index", idx, "--kind",
                               "percentiles", "--query", "fn index",
                               "--percent", "50", "--percent", "95"])
    rows = [json.loads(x) for x in out.strip().splitlines()]
    assert [r["pct"] for r in rows] == [50.0, 95.0]
    assert all(st["min"] <= r["value"] <= st["max"] for r in rows)

    out = _run(capsys, spark, ["agg", "--index", idx, "--kind", "count",
                               "--query", "fn index"])
    assert json.loads(out)["n"] == len(oracle.search("fn index", k=10**6))

    out = _run(capsys, spark, ["agg", "--index", idx, "--kind",
                               "facet-stats", "--query", "fn index",
                               "--k", "3"])
    rows = [json.loads(x) for x in out.strip().splitlines()]
    assert rows and len(rows) <= 3
    assert all(r["doc_count"] >= r["n"] > 0 for r in rows)
    dcs = [r["doc_count"] for r in rows]
    assert dcs == sorted(dcs, reverse=True)


def test_cli_extended_stats_top_hits_and_sorted(spark, built_index, capsys):
    """The round-5 additions' CLI surface: agg --kind extended-stats
    (shift-invariant variance), agg --kind top-hits (per-tag recency
    top-k), and search --sort-by (order-by-fast-field collector)."""
    idx = built_index["index_dir"]

    out = _run(capsys, spark, ["agg", "--index", idx, "--kind",
                               "extended-stats", "--query", "fn index"])
    x0 = json.loads(out)
    assert x0["n"] > 0 and x0["variance"] >= 0.0
    assert abs(x0["std_deviation"] ** 2 - x0["variance"]) <= 1e-6 * max(
        x0["variance"], 1.0)
    assert x0["std_lower"] <= x0["avg"] <= x0["std_upper"]
    out = _run(capsys, spark, ["agg", "--index", idx, "--kind",
                               "extended-stats", "--query", "fn index",
                               "--shift", str(x0["min"])])
    x1 = json.loads(out)
    assert abs(x1["variance"] - x0["variance"]) <= 1e-6 * max(
        x0["variance"], 1.0)
    assert (x1["n"], x1["min"], x1["max"], x1["sum"]) == \
        (x0["n"], x0["min"], x0["max"], x0["sum"])

    out = _run(capsys, spark, ["agg", "--index", idx, "--kind", "top-hits",
                               "--query", "fn index", "--k-hits", "2"])
    rows = [json.loads(x) for x in out.strip().splitlines()]
    assert rows and all(r["rank"] in (1, 2) for r in rows)
    by_tag: dict[int, list] = {}
    for r in rows:
        by_tag.setdefault(r["tag_id"], []).append(r["sort_value"])
    assert all(vs == sorted(vs, reverse=True) for vs in by_tag.values())

    out = _run(capsys, spark, ["search", "--index", idx, "--query",
                               "fn index", "--sort-by", "lastmodified",
                               "--k", "3"])
    rows = [json.loads(x) for x in out.strip().splitlines()]
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    vals = [r["lastmodified"] for r in rows]
    assert vals == sorted(vals, reverse=True)
    out = _run(capsys, spark, ["search", "--index", idx, "--query",
                               "fn index", "--sort-by", "lastmodified",
                               "--sort-asc", "--k", "3"])
    asc_rows = [json.loads(x) for x in out.strip().splitlines()]
    avals = [r["lastmodified"] for r in asc_rows]
    assert avals == sorted(avals) and avals[0] == min(vals + avals)

    # cursor page: --after-value/--after-url from page 1's last hit
    # must return exactly rows k+1..2k of a 2k one-shot, ranks 1..k
    out = _run(capsys, spark, ["search", "--index", idx, "--query",
                               "fn index", "--sort-by", "lastmodified",
                               "--k", "6"])
    six = [json.loads(x) for x in out.strip().splitlines()]
    out = _run(capsys, spark, ["search", "--index", idx, "--query",
                               "fn index", "--sort-by", "lastmodified",
                               "--k", "3",
                               "--after-value", str(six[2]["lastmodified"]),
                               "--after-url", six[2]["url"]])
    page2 = [json.loads(x) for x in out.strip().splitlines()]
    assert [r["url"] for r in page2] == [r["url"] for r in six[3:6]]
    assert [r["rank"] for r in page2] == list(range(1, len(page2) + 1))


def test_cli_terms_and_gapfilled_histogram(spark, built_index, capsys):
    """agg --kind terms (size-limited buckets + sum_other_doc_count)
    and agg --kind date-histogram --min-doc-count 0 (tantivy's
    gap-filled default: contiguous buckets, empties as n=0)."""
    idx = built_index["index_dir"]

    out = _run(capsys, spark, ["agg", "--index", idx, "--kind", "terms",
                               "--query", "fn index", "--size", "3"])
    rows = [json.loads(x) for x in out.strip().splitlines()]
    assert 0 < len(rows) <= 3
    dcs = [r["doc_count"] for r in rows]
    assert dcs == sorted(dcs, reverse=True)
    others = {r["sum_other_doc_count"] for r in rows}
    assert len(others) == 1 and others.pop() >= 0

    week = str(7 * 86_400_000_000)
    out = _run(capsys, spark, ["agg", "--index", idx, "--kind",
                               "date-histogram", "--query", "fn index",
                               "--interval-us", week,
                               "--min-doc-count", "0"])
    rows = [json.loads(x) for x in out.strip().splitlines()]
    assert rows
    bs = [r["bucket"] for r in rows]
    assert all(bs[i + 1] - bs[i] == int(week) for i in range(len(bs) - 1))
    assert all(r["n"] >= 0 for r in rows)

    # generic histogram: the offset translates the gap-filled grid and
    # every bucket key lands on the shifted lattice; CLI bounds parsing
    off = 12_345
    out = _run(capsys, spark, ["agg", "--index", idx, "--kind",
                               "histogram", "--query", "fn index",
                               "--interval-us", week, "--offset", str(off),
                               "--min-doc-count", "0"])
    hrows = [json.loads(x) for x in out.strip().splitlines()]
    assert hrows and all((r["bucket"] - off) % int(week) == 0
                         for r in hrows)
    assert sum(r["n"] for r in hrows) == sum(r["n"] for r in rows)
    lo = min(r["bucket"] for r in hrows)
    hi = max(r["bucket"] for r in hrows)
    out = _run(capsys, spark, ["agg", "--index", idx, "--kind",
                               "histogram", "--query", "fn index",
                               "--interval-us", week, "--offset", str(off),
                               "--min-doc-count", "0",
                               "--hard-bounds", f"{lo}:{hi}",
                               "--extended-bounds", f"{lo}:{hi}"])
    brows = [json.loads(x) for x in out.strip().splitlines()]
    assert {r["bucket"] for r in brows} >= {r["bucket"] for r in hrows}

    # pipeline flags: cumulative-sum's last value is the total count;
    # derivative omits the first bucket and sums back to last-first
    out = _run(capsys, spark, ["agg", "--index", idx, "--kind",
                               "date-histogram", "--query", "fn index",
                               "--interval-us", week,
                               "--min-doc-count", "0",
                               "--pipeline", "cumulative-sum"])
    crows = [json.loads(x) for x in out.strip().splitlines()]
    assert crows[-1]["value"] == sum(r["n"] for r in rows)
    vals = [r["value"] for r in crows]
    assert vals == sorted(vals)  # running total is monotone
    out = _run(capsys, spark, ["agg", "--index", idx, "--kind",
                               "date-histogram", "--query", "fn index",
                               "--interval-us", week,
                               "--min-doc-count", "0",
                               "--pipeline", "derivative"])
    drows = [json.loads(x) for x in out.strip().splitlines()]
    assert len(drows) == len(rows) - 1
    assert sum(r["value"] for r in drows) == rows[-1]["n"] - rows[0]["n"]
    # serial-diff at lag 1 IS the derivative; lag 2 telescopes to the
    # sum of the last two minus the first two counts
    out = _run(capsys, spark, ["agg", "--index", idx, "--kind",
                               "date-histogram", "--query", "fn index",
                               "--interval-us", week,
                               "--min-doc-count", "0",
                               "--pipeline", "serial-diff", "--lag", "2"])
    s2 = [json.loads(x) for x in out.strip().splitlines()]
    assert len(s2) == len(rows) - 2
    assert sum(r["value"] for r in s2) == \
        rows[-1]["n"] + rows[-2]["n"] - rows[0]["n"] - rows[1]["n"]
    # moving-fn unweightedAvg window 3: the shift-0 window excludes the
    # current bucket, so the first emitted value is exactly bucket 0's n
    out = _run(capsys, spark, ["agg", "--index", idx, "--kind",
                               "date-histogram", "--query", "fn index",
                               "--interval-us", week,
                               "--min-doc-count", "0",
                               "--pipeline", "moving-fn", "--window", "3"])
    mrows = [json.loads(x) for x in out.strip().splitlines()]
    assert len(mrows) == len(rows) - 1
    assert mrows[0]["value"] == float(rows[0]["n"])
    assert mrows[-1]["value"] == \
        sum(r["n"] for r in rows[-4:-1]) / 3.0

    # significant-terms: the query's own stem must rank with a
    # positive JLH score; ranking is score-desc
    out = _run(capsys, spark, ["agg", "--index", idx, "--kind",
                               "significant-terms", "--query", "fn index",
                               "--size", "5", "--min-doc-count", "2"])
    srows2 = [json.loads(x) for x in out.strip().splitlines()]
    assert srows2 and srows2[0]["score"] > 0.0
    scores = [r["score"] for r in srows2]
    assert scores == sorted(scores, reverse=True)
    assert all(r["fg"] <= r["bg"] for r in srows2)

    # percentile-ranks: clamps at the data edges, interior monotone
    out = _run(capsys, spark, ["agg", "--index", idx, "--kind",
                               "percentile-ranks", "--query", "fn index",
                               "--value", "0", "--value", "1.65e15",
                               "--value", "9e15"])
    prows = [json.loads(x) for x in out.strip().splitlines()]
    assert [r["pct"] for r in prows][0] == 0.0
    assert [r["pct"] for r in prows][-1] == 100.0
    assert 0.0 <= prows[1]["pct"] <= 100.0

    # histogram-stats: nested published stats per bucket; totals tie
    # back to the plain histogram's bucket counts
    out = _run(capsys, spark, ["agg", "--index", idx, "--kind",
                               "histogram-stats", "--query", "fn index",
                               "--interval-us", week,
                               "--stats-col", "published"])
    srows = [json.loads(x) for x in out.strip().splitlines()]
    assert srows and all(r["n"] <= r["doc_count"] for r in srows)
    occupied = {r["bucket"]: r["n"] for r in rows if r["n"] > 0}
    assert {r["bucket"]: r["doc_count"] for r in srows} == occupied
    for r in srows:
        if r["n"] > 0:
            assert r["min"] <= r["avg"] <= r["max"]


def test_cli_snapshots_and_as_of(spark, corpus_rows, tmp_path, capsys):
    """`snapshots` lists every as_of target newest-last; --expire-keep
    prunes the history pointers; `search --as-of` serves the pinned
    state (the deleted doc is still a hit at the pre-delete seq)."""
    corpus = str(tmp_path / "sn_corpus.parquet")
    spark.createDataFrame(corpus_rows[:40]).write.parquet(corpus)
    idx = str(tmp_path / "snidx")
    _run(capsys, spark, ["build", "--corpus", corpus, "--index", idx,
                         "--partitions", "4", "--waves", "1"])
    out = _run(capsys, spark, ["snapshots", "--index", idx])
    seqs = json.loads(out)["snapshots"]
    assert len(seqs) == 1
    seq_build = seqs[-1]

    out = _run(capsys, spark, ["search", "--index", idx,
                               "--query", "fn index", "--k", "1"])
    top = json.loads(out.strip().splitlines()[0])
    _run(capsys, spark, ["delete", "--index", idx, "--url", top["url"]])

    out = _run(capsys, spark, ["snapshots", "--index", idx])
    seqs = json.loads(out)["snapshots"]
    assert len(seqs) == 2 and seqs[0] == seq_build

    # the pinned read still surfaces the tombstoned doc; the live
    # read does not
    out = _run(capsys, spark, ["search", "--index", idx, "--query",
                               "fn index", "--k", "1", "--as-of",
                               str(seq_build)])
    assert json.loads(out.strip().splitlines()[0])["url"] == top["url"]
    out = _run(capsys, spark, ["search", "--index", idx,
                               "--query", "fn index", "--k", "40"])
    assert top["url"] not in {json.loads(x)["url"]
                              for x in out.strip().splitlines()}

    out = _run(capsys, spark, ["snapshots", "--index", idx,
                               "--expire-keep", "1"])
    rep = json.loads(out)
    assert rep["expired"] == [seq_build] and rep["snapshots"] == [seqs[-1]]


def test_cli_msm_and_suggest(spark, built_index, capsys):
    """--min-should-match gates candidacy through the CLI (text and
    parsed modes, pinned to the oracle twin) and the session-free
    suggest subcommand returns the oracle's ranked corrections."""
    idx = built_index["index_dir"]
    oracle = built_index["oracle"]

    q = "parse token stream"
    out = _run(capsys, spark, ["search", "--index", idx, "--query", q,
                               "--k", "6", "--min-should-match", "2"])
    hits = [json.loads(x) for x in out.strip().splitlines()]
    want = oracle.search(q, k=6, min_should_match=2)
    assert hits, "msm=2 CLI search must be nonvacuous"
    assert [h["doc_id"] for h in hits] == [w["doc_id"] for w in want]

    out = _run(capsys, spark, ["search", "--index", idx, "--mode",
                               "parsed", "--query", "parse token",
                               "--k", "6", "--min-should-match", "2"])
    hits = [json.loads(x) for x in out.strip().splitlines()]
    want = oracle.search_parsed("parse token", k=6, min_should_match=2)
    assert [h["doc_id"] for h in hits] == [w["doc_id"] for w in want]

    for term, mode in (("tokn", "always"), ("sow", "popular")):
        out = _run(capsys, spark, ["suggest", "--index", idx,
                                   "--term", term, "--distance", "2",
                                   "--limit", "5", "--mode", mode])
        rep = json.loads(out)
        assert rep["suggestions"] == \
            oracle.suggest(term, distance=2, limit=5, mode=mode), (term, mode)
    assert any(_run(capsys, spark,
                    ["suggest", "--index", idx, "--term", t,
                     "--mode", "always"]) .count('"term"') > 1
               for t in ("tokn", "sow", "parze")), \
        "CLI suggest must be nonvacuous on some probe term"

    out = _run(capsys, spark, ["suggest", "--index", idx, "--whole-query",
                               "--term", "parze the tokn stream",
                               "--mode", "missing"])
    rep = json.loads(out)
    want = oracle.suggest_query("parze the tokn stream", distance=2,
                                limit_per_term=5, mode="missing")
    assert rep["corrected"] == want["corrected"]
    assert rep["changed"] == want["changed"]
    assert rep["terms"] == want["terms"]


def test_cli_filters_rare_composite(spark, built_index, capsys):
    """The final-session ES-agg kinds' CLI surface: agg --kind filters
    (KEY:COL:OP:VALUE conditions + --other-bucket), --kind rare-terms
    (--max-doc-count tail), --kind composite (--source tuples + the
    --after cursor) — each pinned to the in-process engine method the
    fixture oracles grade."""
    import json

    from spyglass_spark.query.executor import SearchEngine

    idx = built_index["index_dir"]
    eng = SearchEngine(spark, idx)
    q = "fn index"

    dom = built_index["docs"][0]["domain"]
    out = _run(capsys, spark, [
        "agg", "--index", idx, "--kind", "filters", "--query", q,
        "--filter", f"d0:domain:eq:{dom}",
        "--filter", "old:lastmodified:lt:1672531200000000",
        "--filter", f"both:domain:eq:{dom}",
        "--filter", "both:lastmodified:lt:1672531200000000",
        "--other-bucket"])
    rows = [json.loads(x) for x in out.strip().splitlines()]
    want = eng.filters_agg(q, specs={
        "d0": [("domain", "eq", dom)],
        "old": [("lastmodified", "lt", 1672531200000000)],
        "both": [("domain", "eq", dom),
                 ("lastmodified", "lt", 1672531200000000)]},
        other_bucket=True).collect()
    assert [(r["filter_key"], r["n"]) for r in rows] == \
        [(w["filter_key"], w["n"]) for w in want]
    assert rows[-1]["filter_key"] == "_other_"
    assert rows[2]["n"] <= min(rows[0]["n"], rows[1]["n"])  # AND bucket

    out = _run(capsys, spark, [
        "agg", "--index", idx, "--kind", "rare-terms", "--query", q,
        "--facet-col", "domain", "--max-doc-count", "3"])
    rows = [json.loads(x) for x in out.strip().splitlines()]
    want = eng.rare_terms(q, facet_col="domain", max_doc_count=3).collect()
    assert [(r["tag_id"], r["doc_count"]) for r in rows] == \
        [(w["tag_id"], w["doc_count"]) for w in want]
    assert all(r["doc_count"] <= 3 for r in rows)

    src = ["--source", "dom:domain", "--source",
           "week:lastmodified:date_histogram:604800000000"]
    out = _run(capsys, spark, ["agg", "--index", idx, "--kind",
                               "composite", "--query", q, "--size", "3",
                               *src])
    p1 = [json.loads(x) for x in out.strip().splitlines()]
    assert 0 < len(p1) <= 3
    assert p1 == sorted(p1, key=lambda r: (r["dom"], r["week"]))
    out = _run(capsys, spark, ["agg", "--index", idx, "--kind",
                               "composite", "--query", q, "--size", "3",
                               *src, "--after", p1[-1]["dom"],
                               "--after", str(p1[-1]["week"])])
    p2 = [json.loads(x) for x in out.strip().splitlines()]
    sources = ({"name": "dom", "col": "domain"},
               {"name": "week", "col": "lastmodified",
                "kind": "date_histogram", "interval": 604800000000})
    want = eng.composite_agg(q, sources=sources, size=3,
                             after=(p1[-1]["dom"], p1[-1]["week"])).collect()
    assert [(r["dom"], r["week"], r["doc_count"]) for r in p2] == \
        [(w["dom"], w["week"], w["doc_count"]) for w in want]
    assert all((r["dom"], r["week"]) > (p1[-1]["dom"], p1[-1]["week"])
               for r in p2)


def test_cli_metric_and_matrix_kinds(spark, built_index, capsys):
    """CLI surface of the metric/matrix/auto completions: missing,
    value-count, weighted-avg, median-absolute-deviation, boxplot,
    multi-terms, adjacency-matrix, auto-date-histogram — each pinned
    to the in-process engine method."""
    import json

    from spyglass_spark.query.executor import SearchEngine

    idx = built_index["index_dir"]
    eng = SearchEngine(spark, idx)
    q = "fn index"

    out = _run(capsys, spark, ["agg", "--index", idx, "--kind",
                               "missing", "--query", q,
                               "--col", "description"])
    assert json.loads(out)["n"] == \
        eng.missing_count(q, col="description").collect()[0]["n"]

    out = _run(capsys, spark, ["agg", "--index", idx, "--kind",
                               "value-count", "--query", q,
                               "--col", "tags"])
    assert json.loads(out)["n"] == \
        eng.value_count(q, col="tags").collect()[0]["n"]

    out = _run(capsys, spark, ["agg", "--index", idx, "--kind",
                               "weighted-avg", "--query", q])
    w = json.loads(out)
    r = eng.weighted_avg(q).collect()[0]
    assert (w["n"], w["value"]) == (r["n"], r["value"])

    out = _run(capsys, spark, ["agg", "--index", idx, "--kind",
                               "median-absolute-deviation", "--query", q])
    m = json.loads(out)
    r = eng.median_absolute_deviation(q).collect()[0]
    assert (m["n"], m["mad"]) == (r["n"], r["mad"])

    out = _run(capsys, spark, ["agg", "--index", idx, "--kind",
                               "boxplot", "--query", q])
    b = json.loads(out)
    r = eng.boxplot(q).collect()[0]
    assert all(b[k] == r[k] for k in
               ("n", "min", "max", "q1", "q2", "q3", "lower", "upper"))

    out = _run(capsys, spark, ["agg", "--index", idx, "--kind",
                               "multi-terms", "--query", q,
                               "--multi-col", "domain",
                               "--multi-col", "tags", "--size", "4"])
    rows = [json.loads(x) for x in out.strip().splitlines()]
    want = eng.multi_terms(q, facet_cols=("domain", "tags"),
                           size=4).collect()
    assert [(r["domain"], r["tags"], r["doc_count"],
             r["sum_other_doc_count"]) for r in rows] == \
        [(w["domain"], w["tags"], w["doc_count"],
          w["sum_other_doc_count"]) for w in want]

    dom = built_index["docs"][0]["domain"]
    out = _run(capsys, spark, [
        "agg", "--index", idx, "--kind", "adjacency-matrix",
        "--query", q, "--filter", f"d0:domain:eq:{dom}",
        "--filter", "old:lastmodified:lt:1672531200000000"])
    rows = [json.loads(x) for x in out.strip().splitlines()]
    want = eng.adjacency_matrix(q, specs={
        "d0": [("domain", "eq", dom)],
        "old": [("lastmodified", "lt", 1672531200000000)]}).collect()
    assert [(r["filter_key"], r["n"]) for r in rows] == \
        [(w["filter_key"], w["n"]) for w in want]

    out = _run(capsys, spark, ["agg", "--index", idx, "--kind",
                               "auto-date-histogram", "--query", q,
                               "--target-buckets", "7"])
    rows = [json.loads(x) for x in out.strip().splitlines()]
    want = eng.auto_date_histogram(q, target_buckets=7).collect()
    assert [(r["bucket"], r["n"], r["interval_us"]) for r in rows] == \
        [(w["bucket"], w["n"], w["interval_us"]) for w in want]
    assert 0 < len(rows) <= 7


def test_cli_string_stats(spark, built_index, capsys):
    """agg --kind string-stats: ES string metric via --col."""
    import json

    from spyglass_spark.query.executor import SearchEngine

    idx = built_index["index_dir"]
    eng = SearchEngine(spark, idx)
    out = _run(capsys, spark, ["agg", "--index", idx, "--kind",
                               "string-stats", "--query", "fn index",
                               "--col", "title"])
    s = json.loads(out)
    r = eng.string_stats("fn index", col="title").collect()[0]
    assert all(s[k] == r[k] for k in ("count", "min_length",
                                      "max_length", "avg_length",
                                      "entropy"))
    assert s["count"] > 0 and s["entropy"] > 1.0


def test_cli_collapse(spark, built_index, capsys):
    """search --collapse-by: ES field collapsing pinned to the
    in-process engine method."""
    import json

    from spyglass_spark.query.executor import SearchEngine

    idx = built_index["index_dir"]
    eng = SearchEngine(spark, idx)
    out = _run(capsys, spark, ["search", "--index", idx, "--query",
                               "fn index", "--collapse-by", "domain",
                               "--k", "4"])
    rows = [json.loads(x) for x in out.strip().splitlines()]
    want = eng.search_collapse("fn index", k=4).collect()
    assert [(r["rank"], r["url"], r["domain"], r["score"])
            for r in rows] == \
        [(w["rank"], w["url"], w["domain"], float(w["score"]))
         for w in want]
    assert len({r["domain"] for r in rows}) == len(rows)


def test_cli_rescore(spark, built_index, capsys):
    """search --rescore-query: ES rescore phase pinned to the
    in-process engine method."""
    import json

    from spyglass_spark.query.executor import SearchEngine

    idx = built_index["index_dir"]
    eng = SearchEngine(spark, idx)
    out = _run(capsys, spark, ["search", "--index", idx, "--query",
                               "fn index", "--rescore-query",
                               "merge join", "--rescore-window", "8",
                               "--rescore-weight", "2.0", "--k", "4"])
    rows = [json.loads(x) for x in out.strip().splitlines()]
    want = eng.search_rescore("fn index", "merge join", window_size=8,
                              rescore_weight=2.0, k=4).collect()
    assert [(r["rank"], r["url"], r["score"], r["primary_score"])
            for r in rows] == \
        [(w["rank"], w["url"], float(w["score"]),
          float(w["primary_score"])) for w in want]
    assert rows and all(r["score"] >= r["primary_score"] * 0 for r in rows)
