"""Query-string parser (query/parser.py — the tantivy QueryParser /
Lucene classic-syntax analog): grammar/structure goldens on the shared
scalar parser, then engine-vs-oracle parity — the parser is shared code
(like the compiler), but [a TO b] atoms expand through the engine's
pyarrow byte-range read vs the oracle's whole-dictionary enumeration,
and the compiled trees ride the full distributed kernel (scoring Musts,
extra groups, MustNots, range Musts, dismax compose)."""

import numpy as np
import pytest

pyspark = pytest.importorskip("pyspark")


# ---- pure parser structure goldens (no Spark) --------------------------

def _parse(qs, **kw):
    from spyglass_spark.query.parser import parse_query_string

    return parse_query_string(qs, **kw)


def test_parser_occur_fields_and_boosts():
    cq = _parse('merge +fn -struct title:file^2.5 domain:org1/repo1')
    # bare word → one Should term per default field (content stemmed,
    # title default-tokenized), field standard boosts
    sg = [(c.field, c.terms, c.boost) for c in cq.should_group]
    assert ("content", ("merg",), 1.0) in sg
    assert ("title", ("merge",), 2.0) in sg
    # field:word^boost → single-field, boost multiplied
    assert ("title", ("file",), 5.0) in sg
    # raw field verbatim (no analysis, '/' kept)
    assert ("domain", ("org1/repo1",), 1.0) in sg
    # '+' → ONE unscored Must(OR) group across the default fields (never
    # AND across fields) PLUS the same clauses as scoring Shoulds;
    # '-' → MustNots (boost zeroed)
    assert cq.musts == []
    assert [[(c.field, c.terms, c.boost) for c in g]
            for g in cq.extra_groups] == \
        [[("content", ("fn",), 0.0), ("title", ("fn",), 0.0)]]
    assert ("content", ("fn",), 1.0) in sg and ("title", ("fn",), 2.0) in sg
    assert {(c.field, c.terms, c.boost) for c in cq.must_nots} == \
        {("content", ("struct",), 0.0), ("title", ("struct",), 0.0)}
    assert cq.term_count == 5


def test_parser_phrase_slop_and_raw_phrase():
    cq = _parse('"parse token stream"~2 content:"merged scoring" id:"a b"')
    phrases = [c for c in cq.should_group if c.kind == "phrase"]
    # default-field phrase on content AND title, explicit slop (no
    # free-text clamp), stemming on content only
    pc = next(c for c in phrases if c.field == "content")
    pt = next(c for c in phrases if c.field == "title")
    assert pc.terms == ("pars", "token", "stream") and pc.slop == 2
    assert pt.terms == ("parse", "token", "stream") and pt.slop == 2
    fc = next(c for c in phrases if c.field == "content" and c is not pc)
    assert fc.terms == ("merg", "score") and fc.slop == 0
    # raw-field quoted text is ONE exact term
    raw = next(c for c in cq.should_group if c.field == "id")
    assert raw.kind == "term" and raw.terms == ("a b",)


def test_parser_ranges_and_dates():
    exp_calls = []

    def expander(f, lo, hi, ilo, ihi, cap):
        exp_calls.append((f, lo, hi, ilo, ihi))
        return ["x1", "x2"]

    cq = _parse('content:[par TO pat] +content:{a TO c} -title:[m TO *] '
                '+lastmodified:{100 TO 200]',
                expand_range=expander)
    # Should range scores at field boost; '+' range is ONE unscored
    # Must(OR) group; '-' range excludes every expansion
    assert [(c.field, c.terms[0], c.boost) for c in cq.should_group] == \
        [("content", "x1", 1.0), ("content", "x2", 1.0)]
    assert [[(c.terms[0], c.boost) for c in g] for g in cq.extra_groups] == \
        [[("x1", 0.0), ("x2", 0.0)]]
    assert [(c.field, c.terms[0]) for c in cq.must_nots] == \
        [("title", "x1"), ("title", "x2")]
    assert exp_calls == [("content", "par", "pat", True, True),
                         ("content", "a", "c", False, False),
                         ("title", "m", None, True, True)]
    # exclusive lower adds 1 µs, inclusive upper unchanged
    assert cq.range_musts == [("lastmodified", 101, 200)]


def test_parser_empty_must_range_matches_nothing():
    cq = _parse('+content:[zz TO zza] fn',
                expand_range=lambda *a: [])
    assert len(cq.extra_groups) == 1
    assert cq.extra_groups[0][0].terms == ("\x00",)  # impossible term


def test_parser_errors():
    with pytest.raises(ValueError, match="unknown field"):
        _parse("nofield:x")
    with pytest.raises(ValueError, match="must be a '\\+'"):
        _parse("lastmodified:[1 TO 2]")
    with pytest.raises(ValueError, match="range"):
        _parse("published:123")
    with pytest.raises(ValueError, match="expander"):
        _parse("content:[a TO b]")
    with pytest.raises(ValueError, match="syntax error"):
        _parse("fn ^2")  # dangling boost, no atom
    # lenient by design: a bare '-' or unquoted junk degrades to a word
    # whose analysis emits no tokens (no clause), never an error
    assert not _parse("fn -").must_nots


# ---- engine vs oracle parity -------------------------------------------

PARSED_QUERIES = [
    "merge",
    "+fn main",
    "merge scoring -struct",
    '"parse token"~1',
    'content:"merged scoring" title:file^2.5',
    "+domain:org3/repo3 fn",
    "-domain:org1/repo1 merge",
    "content:[sco TO seg]",
    "+content:[par TO pat] merge",
    "-content:[a TO c] fn",
    "+content:[zzz TO zzza] fn",   # empty must-range → zero hits
    "fn^3 import^0.5",
]


@pytest.fixture(scope="module")
def engine(spark, built_index):
    from spyglass_spark.query.executor import SearchEngine

    return SearchEngine(spark, built_index["index_dir"])


def _bits(x) -> bytes:
    return np.float32(x).tobytes()


def _rows(df):
    return sorted(df.collect(), key=lambda r: r["rank"])


def test_parsed_rank_and_bitwise_score_parity(engine, built_index):
    oracle = built_index["oracle"]
    nonempty = 0
    for qs in PARSED_QUERIES:
        got = _rows(engine.search_parsed(qs, k=10))
        want = oracle.search_parsed(qs, k=10)
        assert [r["doc_id"] for r in got] == \
            [h["doc_id"] for h in want], qs
        for g, w in zip(got, want):
            assert _bits(g["score"]) == _bits(w["score"]), (qs, w["rank"])
        nonempty += bool(want)
    assert nonempty >= 9
    assert not oracle.search_parsed("+content:[zzz TO zzza] fn", k=10)


def test_parsed_date_range_and_filters(engine, built_index):
    oracle = built_index["oracle"]
    docs = built_index["docs"]
    mid = sorted(d["lastmodified"] for d in docs)[len(docs) // 2]
    qs = f"+lastmodified:[{mid} TO *] fn main"
    got = _rows(engine.search_parsed(qs, k=10))
    want = oracle.search_parsed(qs, k=10)
    assert want and [r["doc_id"] for r in got] == \
        [h["doc_id"] for h in want]
    # programmatic filters compose through the shared merge helper
    tag = built_index["tags_dim"][0]["id"]
    got = _rows(engine.search_parsed("fn main", filters=[("tag", tag)], k=10))
    want = oracle.search_parsed("fn main", filters=[("tag", tag)], k=10)
    assert [(r["doc_id"], _bits(r["score"])) for r in got] == \
        [(h["doc_id"], _bits(h["score"])) for h in want]


def test_parsed_wand_batch_and_dismax(engine, built_index):
    oracle = built_index["oracle"]
    for qs in PARSED_QUERIES[:6]:
        auto = _rows(engine.search_parsed(qs, k=10, algo="auto"))
        exh = _rows(engine.search_parsed(qs, k=10, algo="exhaustive"))
        assert [(r["doc_id"], _bits(r["score"])) for r in auto] == \
            [(r["doc_id"], _bits(r["score"])) for r in exh], qs
    # batch shape ≡ single; dismax composes with the parsed tree
    batch = [{"parsed": "merge scoring -struct"},
             {"parsed": '"parse token"~1', "combiner": "dismax",
              "tie_breaker": 0.4},
             {"query": "fn main"}]
    res = engine.search_many(batch, k=8).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append(r)
    singles = [engine.search_parsed("merge scoring -struct", k=8),
               engine.search_parsed('"parse token"~1', k=8,
                                    combiner="dismax", tie_breaker=0.4),
               engine.search("fn main", k=8)]
    for qi, sdf in enumerate(singles):
        got = sorted(by_q.get(qi, []), key=lambda r: r["rank"])
        want = _rows(sdf)
        assert [(r["doc_id"], _bits(r["score"])) for r in got] == \
            [(r["doc_id"], _bits(r["score"])) for r in want], qi
    want = oracle.search_parsed('"parse token"~1', k=8, combiner="dismax",
                                tie_breaker=0.4)
    got = sorted(by_q.get(1, []), key=lambda r: r["rank"])
    assert [(r["doc_id"], _bits(r["score"])) for r in got] == \
        [(h["doc_id"], _bits(h["score"])) for h in want]


# ---- collectors/aggregations over ANY query shape ----------------------

def test_collectors_accept_dict_query_shapes(engine, built_index, spark):
    """count/facets/export/score_matches take a search_many-style dict —
    the collector surface runs over parsed (and pattern) queries, graded
    against oracle brute force."""
    oracle = built_index["oracle"]
    qs = "+fn main merge"
    want = oracle.search_parsed(qs, k=10**6)
    n = engine.count_matches({"parsed": qs}).collect()[0]["n"]
    assert n == len(want) > 0

    # pattern shape on a collector: term-set count
    ts = ["fn", "merg", "zzabsent"]
    n = engine.count_matches({"term_set": ts}).collect()[0]["n"]
    assert n == len(oracle.search_term_set(ts, k=10**6)) > 0

    # facet counts over the parsed match set vs oracle tag histogram
    from collections import Counter

    tagc = Counter(t for h in want for t in h["tags"])
    got = {r["tag_id"]: r["n"]
           for r in engine.facet_counts({"parsed": qs}).collect()}
    assert got == dict(tagc)

    # scored export frame is bitwise the parsed search at every rank
    full = {r["url"]: r["score"]
            for r in engine.score_matches({"parsed": qs}).collect()}
    hits = engine.search_parsed(qs, k=50).collect()
    assert hits and all(
        np.float32(full[h["url"]]).tobytes() ==
        np.float32(h["score"]).tobytes() for h in hits)

    # export sink: matched urls == the oracle's match set
    docs_df = spark.createDataFrame(built_index["docs"])
    out = str(built_index["index_dir"]) + "_parsed_export"
    res = engine.export_matches({"parsed": qs}, docs_df, out)
    assert res["matched_urls"] == len(want)
    got_urls = {r["url"] for r in spark.read.parquet(out).collect()}
    assert got_urls == {h["url"] for h in want}


def test_match_set_guards_on_parsed_shapes(engine):
    """The unscored match-set machinery must REFUSE shapes it cannot
    count exactly (phrase-posting unions over/under-count) instead of
    silently miscounting."""
    with pytest.raises(ValueError, match="standalone phrase"):
        engine.count_matches({"parsed": '"parse token"'})
    with pytest.raises(ValueError, match="phrase must_not"):
        engine.count_matches({"parsed": 'fn -"parse token"'})
    # '+phrase' is refused twice over: the scoring-Should copy trips the
    # standalone-phrase guard, the group copy the term-only filter guard
    with pytest.raises(ValueError, match="phrase"):
        engine.count_matches({"parsed": 'fn +"parse token"'})
    # the absorbable shape stays allowed: phrase + its own terms
    n = engine.count_matches({"query": "parse token"}).collect()[0]["n"]
    assert n > 0
