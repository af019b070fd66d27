"""URL-based lens rules: regex goldens vs the reference's own tests
(spyglass-lens/src/lib.rs:140-158, utils.rs:1-51, types.rs:56-60), the
DataFrame predicate, and the E2E test_url_lens_search shape
(spyglass-searcher/src/lib.rs:293-303): docs tagged via URL rules, then a
lens-filtered search parity-checked against the oracle."""

import re

import pytest

from spyglass_spark.ops.lens_rules import (LimitURLDepth, SanitizeUrls,
                                           SkipURL, apply_lens, lens_filters,
                                           lens_url_predicate,
                                           regex_for_domain, regex_for_prefix,
                                           regex_for_robots, sanitize_urls,
                                           tag_lens_docs)


def test_regex_goldens_match_reference():
    # lib.rs:140-158 test_into_regexes goldens
    assert regex_for_domain("paulgraham.com") == \
        "^(http://|https://)paulgraham\\.com.*"
    allowed, skipped = lens_filters(
        domains=["paulgraham.com"],
        urls=["https://oldschool.runescape.wiki/w/"])
    assert len(allowed) == 2 and skipped == []
    assert "^https://oldschool.runescape.wiki/w/.*" in allowed

    # utils.rs:15-22 — trailing $ pins exact match
    assert regex_for_prefix("https://example.com/page$") == \
        "^https://example.com/page$"
    # utils.rs:3-13 — * wildcard in domains
    assert regex_for_domain("*.example.com") == \
        "^(http://|https://).*\\.example\\.com.*"
    # utils.rs:24-51 — robots-style conversion
    assert regex_for_robots("/blog/*/comments") == "/blog/.*/comments.*"
    assert regex_for_robots("*.cpp") == ".*\\.cpp.*"
    assert regex_for_robots("") is None


def test_limit_url_depth_regex_semantics():
    # types.rs:56-60 — we emit the spaceless quantifier (the reference's
    # "{0, N}" spaced form parses as repetition only in Rust's regex crate)
    rx = LimitURLDepth("https://example.com/", 1).to_regex()
    assert rx == "^https://example.com/?(/[^/]+/?){0,1}$"
    assert re.match(rx, "https://example.com/a")
    assert re.match(rx, "https://example.com/a/")
    assert not re.match(rx, "https://example.com/a/b")
    rx2 = LimitURLDepth("https://example.com", 2).to_regex()
    assert re.match(rx2, "https://example.com/a/b")
    assert not re.match(rx2, "https://example.com/a/b/c")


def test_lens_predicate_dataframe(spark):
    rows = [("https://example.com/a",), ("https://example.com/a/b",),
            ("http://other.com/x",), ("https://example.com/skipme/z",)]
    df = spark.createDataFrame(rows, "url string")
    out = apply_lens(df, "url", rules=[LimitURLDepth("https://example.com", 2),
                                       SkipURL("*skipme*")])
    got = sorted(r["url"] for r in out.collect())
    assert got == ["https://example.com/a", "https://example.com/a/b"]
    # empty allow list matches nothing
    pred = lens_url_predicate("url", [], [])
    assert df.filter(pred).count() == 0


def test_sanitize_urls(spark):
    rows = [("https://example.com/a?utm=1",), ("https://other.com/b?x=2",)]
    df = spark.createDataFrame(rows, "url string")
    out = sanitize_urls(df, "url", [SanitizeUrls("https://example.com*")])
    got = sorted(r["url"] for r in out.collect())
    assert got == ["https://example.com/a", "https://other.com/b?x=2"]


@pytest.fixture(scope="module")
def lens_index(spark, tmp_path_factory):
    """Index where an extra lens tag (99) is assigned purely by URL rules —
    the reference's URL-lens flow (crawl-rule filtering → lens tag on the
    doc → search-time tag Must filter)."""
    from pyspark.sql import functions as F

    from spyglass_spark.index.builder import build_index
    from spyglass_spark.oracle.engine import OracleIndex
    from spyglass_spark.testing import corpus_to_documents, synth_corpus

    rows = synth_corpus(n_docs=120, seed=7)
    docs, _ = corpus_to_documents(rows)
    P = 4
    index_dir = str(tmp_path_factory.mktemp("lens_index"))
    spark_docs = spark.createDataFrame(docs)
    rules = dict(urls=["repo://org1/"], rules=[SkipURL("*.cpp*")])
    tagged = tag_lens_docs(spark_docs, "url", 99, **rules)
    build_index(spark, tagged, index_dir, num_partitions=P, waves=1)

    # oracle side: same rule evaluation in plain python
    allowed, skipped = lens_filters(**rules)
    odocs = []
    for d in docs:
        d = dict(d)
        if any(re.match(rx, d["url"]) for rx in allowed) and \
           not any(re.match(rx, d["url"]) for rx in skipped):
            d["tags"] = sorted(set(d["tags"]) | {99})
        odocs.append(d)
    oracle = OracleIndex.build(odocs, num_partitions=P)
    n_tagged = sum(1 for d in odocs if 99 in d["tags"])
    assert 0 < n_tagged < len(odocs)  # rule must be selective, not vacuous
    return dict(index_dir=index_dir, oracle=oracle)


def test_url_lens_search_parity(spark, lens_index):
    """test_url_lens_search analog: query + lens tag filter returns only
    docs the URL rules admitted, rank/score-identical to the oracle."""
    from spyglass_spark.query.executor import SearchEngine

    eng = SearchEngine(spark, lens_index["index_dir"])
    got = eng.search("parse merge", filters=[("tag", 99)], k=10).collect()
    exp = lens_index["oracle"].search("parse merge", filters=[("tag", 99)], k=10)
    assert len(got) == len(exp) and len(got) > 0
    for g, e in zip(got, exp):
        assert g["doc_id"] == e["doc_id"]
        assert g["score"] == pytest.approx(e["score"], abs=0.0)
        assert 99 in (g["tags"] or [])
