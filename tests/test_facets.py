"""facet_counts — tag facet counts over the FULL match set. Pinned
against a brute-force recomputation with the scalar analyzers (including
stemming), plus tombstone and zero-boost-guard behavior."""

import pytest

from spyglass_spark.analysis.analyzer import tokenize_default, tokenize_en


@pytest.fixture(scope="module")
def eng(spark, built_index):
    from spyglass_spark.query.executor import SearchEngine

    return SearchEngine(spark, built_index["index_dir"])


def _brute_facets(docs, query, filters=()):
    """Independent match-set + tag counting: per-field analyzed token
    sets, reference boolean semantics (Must(any should) AND tag Musts)."""
    from spyglass_spark.query.compiler import compile_query

    cq = compile_query(query, filters)
    counts: dict[int, int] = {}
    for d in docs:
        fields = {
            "content": {t for _, t in tokenize_en(d["content"] or "")},
            "title": {t for _, t in tokenize_default(d["title"] or "")},
            "tags": {str(t) for t in d["tags"]},
            "id": {d["doc_id"]},
            "url": {d["url"]},
        }
        should = any(t in fields.get(c.field, set())
                     for c in cq.should_group for t in c.terms)
        musts = all(all(t in fields.get(c.field, set()) for t in c.terms)
                    for c in cq.musts)
        if should and musts:
            for t in d["tags"]:
                counts[t] = counts.get(t, 0) + 1
    return counts


CASES = [
    ("fn index", ()),
    ("merge join table", ()),
    ("parsing postings segment", ()),   # stemming-sensitive match set
    ("the fast key", ()),               # no corpus hit: both sides empty
]


@pytest.mark.parametrize("query,filters", CASES)
def test_facet_counts_vs_bruteforce(eng, built_index, query, filters):
    got = {r["tag_id"]: r["n"]
           for r in eng.facet_counts(query, filters).collect()}
    expect = _brute_facets(built_index["docs"], query, filters)
    assert got == expect
    if query != "the fast key":
        assert sum(got.values()) > 0


def test_facet_counts_with_tag_filter(eng, built_index):
    tag = built_index["docs"][0]["tags"][0]
    got = {r["tag_id"]: r["n"]
           for r in eng.facet_counts("fn index",
                                     filters=[("tag", tag)]).collect()}
    expect = _brute_facets(built_index["docs"], "fn index",
                           filters=[("tag", tag)])
    assert got == expect
    # the filter tag dominates: every matching doc carries it
    assert got[tag] == max(got.values())


def test_facet_counts_ordering_and_limit(eng):
    rows = eng.facet_counts("fn index").collect()
    ns = [r["n"] for r in rows]
    assert ns == sorted(ns, reverse=True)
    top3 = eng.facet_counts("fn index", k_tags=3).collect()
    assert [(r["tag_id"], r["n"]) for r in top3] == \
        [(r["tag_id"], r["n"]) for r in rows[:3]]


def test_facet_counts_excludes_tombstones(spark, corpus_rows, tmp_path):
    from spyglass_spark.index.builder import build_index, delete_by_urls
    from spyglass_spark.query.executor import SearchEngine
    from spyglass_spark.testing import corpus_to_documents

    docs, _ = corpus_to_documents(corpus_rows[:40])
    idx = str(tmp_path / "fidx")
    build_index(spark, spark.createDataFrame(docs), idx, num_partitions=4)
    eng = SearchEngine(spark, idx)
    before = {r["tag_id"]: r["n"]
              for r in eng.facet_counts("index search").collect()}
    assert before == _brute_facets(docs, "index search")
    # tombstone one matching doc; its tags drop out of the counts
    victim = next(d for d in docs
                  if _brute_facets([d], "index search"))
    delete_by_urls(spark, idx, [victim["url"]])
    eng.refresh()
    after = {r["tag_id"]: r["n"]
             for r in eng.facet_counts("index search").collect()}
    live = [d for d in docs if d["url"] != victim["url"]]
    assert after == _brute_facets(live, "index search")


def test_facet_counts_scalar_column(eng, built_index):
    """facet_col='domain' groups the match set by a scalar stored field."""
    got = {r["tag_id"]: r["n"]
           for r in eng.facet_counts("fn index",
                                     facet_col="domain").collect()}
    from spyglass_spark.query.compiler import compile_query

    cq = compile_query("fn index")
    expect: dict = {}
    for d in built_index["docs"]:
        fields = {"content": {t for _, t in tokenize_en(d["content"] or "")},
                  "title": {t for _, t in
                            tokenize_default(d["title"] or "")}}
        if any(t in fields.get(c.field, set())
               for c in cq.should_group for t in c.terms):
            expect[d["domain"]] = expect.get(d["domain"], 0) + 1
    assert got == expect


def _brute_histogram(docs, query, interval_us, date_col="lastmodified",
                     filters=()):
    """Independent match-set + bucketing: same analyzed-token matcher as
    _brute_facets, exact integer floor-division bucketing."""
    from spyglass_spark.query.compiler import compile_query

    cq = compile_query(query, filters)
    counts: dict[int, int] = {}
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
        if should and musts and d.get(date_col) is not None:
            b = (d[date_col] // interval_us) * interval_us
            counts[b] = counts.get(b, 0) + 1
    return counts


DAY_US = 86_400_000_000


@pytest.mark.parametrize("interval_us", [DAY_US, 7 * DAY_US, 365 * DAY_US])
def test_date_histogram_vs_bruteforce(eng, built_index, interval_us):
    got = [(r["bucket"], r["n"])
           for r in eng.date_histogram("merge join table",
                                       interval_us=interval_us).collect()]
    expect = sorted(_brute_histogram(built_index["docs"],
                                     "merge join table",
                                     interval_us).items())
    assert got == expect
    assert sum(n for _, n in got) > 0
    # buckets strictly ascending and aligned to the interval
    assert all(b % interval_us == 0 for b, _ in got)
    assert [b for b, _ in got] == sorted({b for b, _ in got})


def test_date_histogram_published_and_filter(eng, built_index):
    tag = built_index["docs"][0]["tags"][0]
    got = [(r["bucket"], r["n"])
           for r in eng.date_histogram("fn index", filters=[("tag", tag)],
                                       interval_us=DAY_US,
                                       date_col="published").collect()]
    expect = sorted(_brute_histogram(built_index["docs"], "fn index",
                                     DAY_US, date_col="published",
                                     filters=[("tag", tag)]).items())
    assert got == expect


def test_field_stats_vs_bruteforce(eng, built_index):
    """StatsAggregation analog: one (n, min, max, sum, avg) row over the
    match set's non-NULL dates — vs the brute-force match set."""
    for query, col in [("merge join table", "lastmodified"),
                       ("fn index", "published")]:
        row = eng.field_stats(query, col=col).collect()[0]
        vals = []
        from spyglass_spark.query.compiler import compile_query

        cq = compile_query(query)
        for d in built_index["docs"]:
            fields = {
                "content": {t for _, t in tokenize_en(d["content"] or "")},
                "title": {t for _, t in tokenize_default(d["title"] or "")},
            }
            if any(t in fields.get(c.field, set())
                   for c in cq.should_group for t in c.terms) \
                    and d.get(col) is not None:
                vals.append(d[col])
        assert row["n"] == len(vals) > 0
        assert row["min"] == min(vals) and row["max"] == max(vals)
        assert row["sum"] == sum(vals)
        assert abs(row["avg"] - sum(vals) / len(vals)) < 1e-6


def test_field_stats_empty_match(eng):
    row = eng.field_stats("the fast key").collect()[0]
    assert row["n"] == 0 and row["min"] is None and row["sum"] is None


def test_field_stats_sum_overflow_degrades_to_null(spark, tmp_path):
    """The BIGINT sum column try_casts to NULL once the exact decimal
    sum exceeds long range (~6k docs of µs dates — hit on the 320k-doc
    spot index), while avg stays exact. A hard cast here THROWS; this
    pins the degradation contract."""
    import hashlib
    import uuid

    from spyglass_spark.corpus import SPYGLASS_NS
    from spyglass_spark.index.builder import build_index
    from spyglass_spark.query.executor import SearchEngine

    big = 4_000_000_000_000_000_000  # 3 docs: sum 1.2e19 > 2^63-1
    docs = []
    for i in range(3):
        url = f"repo://x/f{i}.rs@{'a' * 40}"
        docs.append(dict(
            doc_id=str(uuid.uuid5(SPYGLASS_NS, url)), url=url, domain="x",
            title=f"f{i}.rs", content="overflow probe doc",
            tags=[1], content_sha256=hashlib.sha256(b"c").hexdigest(),
            published=big, lastmodified=big + i))
    idx = str(tmp_path / "ovf")
    build_index(spark, spark.createDataFrame(docs), idx, num_partitions=2)
    row = SearchEngine(spark, idx).field_stats("overflow probe").collect()[0]
    assert row["n"] == 3 and row["sum"] is None
    assert row["min"] == big and row["max"] == big + 2
    assert row["avg"] == float(3 * big + 3) / 3


def _brute_match_vals(docs, query, col):
    """Non-NULL ``col`` values of the brute-force match set."""
    from spyglass_spark.query.compiler import compile_query

    cq = compile_query(query)
    vals = []
    for d in docs:
        fields = {
            "content": {t for _, t in tokenize_en(d["content"] or "")},
            "title": {t for _, t in tokenize_default(d["title"] or "")},
        }
        if any(t in fields.get(c.field, set())
               for c in cq.should_group for t in c.terms) \
                and d.get(col) is not None:
            vals.append(d[col])
    return vals


def test_percentiles_vs_bruteforce_bitwise(eng, built_index):
    """PercentilesAggregation analog: engine rows bitwise equal to the
    scalar formula (query/percentile.py) over the brute-force match
    set — the distributed value→count merge must not perturb the
    interpolation arithmetic."""
    from spyglass_spark.query.percentile import exact_percentiles

    for query, col, pcts in [
            ("merge join table", "lastmodified",
             (1.0, 5.0, 25.0, 50.0, 75.0, 95.0, 99.0)),
            ("fn index", "published", (0.0, 33.3, 50.0, 100.0))]:
        got = [(r["pct"], r["value"])
               for r in eng.percentiles(query, col=col,
                                        percents=pcts).collect()]
        vals = _brute_match_vals(built_index["docs"], query, col)
        assert vals, "non-vacuous case required"
        expect = exact_percentiles(vals, pcts)
        assert got == expect  # float equality intended: bitwise pin


def test_percentile_partition_invariance(spark):
    """The exact aggregate is partition-order independent: same rows at
    1/3/7 partitions produce bitwise-identical percentiles, all equal to
    the scalar formula. This is the property that makes the fixture an
    oracle rather than self-certification."""
    import random

    from pyspark.sql import functions as F

    from spyglass_spark.query.percentile import exact_percentiles

    rng = random.Random(41)
    vals = [rng.randint(1_500_000_000_000_000, 1_800_000_000_000_000)
            for _ in range(257)]
    pcts = (0.0, 1.0, 33.3, 50.0, 75.0, 99.0, 100.0)
    arr = ", ".join(repr(p / 100.0) for p in pcts)
    expect = [v for _, v in exact_percentiles(vals, pcts)]
    for nparts in (1, 3, 7):
        df = spark.createDataFrame([(v,) for v in vals],
                                   "v long").repartition(nparts)
        got = df.agg(
            F.expr(f"percentile(v, array({arr}))").alias("x")
        ).collect()[0]["x"]
        assert list(got) == expect


def test_percentile_ranks_vs_bruteforce_bitwise(eng, built_index):
    """percentile_ranks (the ES inverse of percentiles): engine rows
    bitwise equal to the pinned scalar inverse interpolation — probes
    include exact data values (tie collapse to the run's end), strict
    midpoints, below-min (0.0) and at/above-max (100.0) clamps; the
    round trip percentile(rank(v)) must return v for interior probes."""
    from spyglass_spark.query.percentile import (exact_percentile,
                                                 exact_percentile_ranks)

    for query, col in [("merge join table", "lastmodified"),
                       ("fn index", "published")]:
        vals = sorted(_brute_match_vals(built_index["docs"], query, col))
        assert len(vals) >= 3
        probes = [vals[0] - 1, float(vals[0]), vals[len(vals) // 2],
                  (vals[0] + vals[-1]) / 2.0 + 0.25,
                  float(vals[-1]), vals[-1] + 10]
        got = [(r["value"], r["pct"]) for r in eng.percentile_ranks(
            query, col=col, values=probes).collect()]
        expect = exact_percentile_ranks(vals, probes)
        assert got == expect  # float equality intended: bitwise pin
        assert got[0][1] == 0.0 and got[-1][1] == 100.0
        for v, p in got:
            if 0.0 < p < 100.0 and float(v) in {float(x) for x in vals}:
                # round trip: the inverse lands back on the probe
                assert exact_percentile(vals, p / 100.0) == \
                    pytest.approx(v, abs=1e-6)

    # empty match set -> zero rows; empty probes -> guard
    assert eng.percentile_ranks("the fast key", values=(1.0,)) \
        .collect() == []
    with pytest.raises(ValueError, match="non-empty"):
        eng.percentile_ranks("fn index", values=())

    # the aggregate() tree serves the same rows from the cached pass
    probes2 = (1_500_000_000_000_000, 1_700_000_000_000_000)
    exp2 = [(r["value"], r["pct"]) for r in eng.percentile_ranks(
        "merge join table", values=probes2).collect()]
    tree = eng.aggregate("merge join table", aggs={
        "pr": {"kind": "percentile_ranks", "values": probes2}})
    assert [(r["value"], r["pct"])
            for r in tree["pr"].collect()] == exp2


def test_percentiles_empty_match_and_guards(eng):
    assert eng.percentiles("the fast key").collect() == []
    import pytest as _pytest
    with _pytest.raises(ValueError, match="non-empty"):
        eng.percentiles("fn index", percents=())
    with _pytest.raises(ValueError, match="out of"):
        eng.percentiles("fn index", percents=(101.0,))


def test_percentiles_approx_rank_bound(eng, built_index):
    """approx_accuracy path (the 100 TB sketch form): every returned
    value is an actual dataset value whose rank is within the
    Greenwald-Khanna bound n/accuracy of the target rank."""
    col, query = "lastmodified", "merge join table"
    vals = sorted(_brute_match_vals(built_index["docs"], query, col))
    n = len(vals)
    rows = eng.percentiles(query, col=col, percents=(25.0, 50.0, 95.0),
                           approx_accuracy=10_000).collect()
    assert len(rows) == 3
    for r in rows:
        v = int(r["value"])
        assert v in vals  # GK returns observed values, no interpolation
        rank = vals.index(v)
        target = r["pct"] / 100.0 * (n - 1)
        assert abs(rank - target) <= max(1.0, n / 10_000 + 1)


def _brute_facet_stats(docs, query, col="lastmodified"):
    """Per-tag (doc_count, n, min, max, sum) over the brute match set."""
    from spyglass_spark.query.compiler import compile_query

    cq = compile_query(query)
    out: dict[int, list] = {}
    for d in docs:
        fields = {
            "content": {t for _, t in tokenize_en(d["content"] or "")},
            "title": {t for _, t in tokenize_default(d["title"] or "")},
        }
        if any(t in fields.get(c.field, set())
               for c in cq.should_group for t in c.terms):
            for t in d["tags"]:
                s = out.setdefault(t, [0, []])
                s[0] += 1
                if d.get(col) is not None:
                    s[1].append(d[col])
    return {t: (dc, len(vs), min(vs) if vs else None,
                max(vs) if vs else None, sum(vs) if vs else None,
                float(sum(vs)) / len(vs) if vs else None)
            for t, (dc, vs) in out.items()}


def test_facet_stats_vs_bruteforce(eng, built_index):
    """Terms bucket + nested stats metric: every bucket's doc_count and
    non-NULL stats match the brute force; avg uses the engine's
    double(exact sum)/n arithmetic on both sides."""
    got = {r["tag_id"]: (r["doc_count"], r["n"], r["min"], r["max"],
                         r["sum"], r["avg"])
           for r in eng.facet_stats("merge join table").collect()}
    expect = _brute_facet_stats(built_index["docs"], "merge join table")
    assert got == expect and got


def test_facet_stats_ordering_limit_and_scalar_col(eng, built_index):
    rows = eng.facet_stats("fn index").collect()
    order = [(r["doc_count"], r["tag_id"]) for r in rows]
    assert order == sorted(order, key=lambda x: (-x[0], x[1]))
    top2 = eng.facet_stats("fn index", k_tags=2).collect()
    assert [r["tag_id"] for r in top2] == [r["tag_id"] for r in rows[:2]]
    # scalar facet column groups directly; doc_counts match facet_counts
    by_dom = {r["tag_id"]: r["doc_count"]
              for r in eng.facet_stats("fn index",
                                       facet_col="domain").collect()}
    fc = {r["tag_id"]: r["n"]
          for r in eng.facet_counts("fn index",
                                    facet_col="domain").collect()}
    assert by_dom == fc


def test_range_agg_vs_bruteforce(eng, built_index):
    """RangeAggregation analog: overlapping + unbounded + empty ranges,
    half-open [lo, hi), doc counted in EVERY containing range, NULLs
    skipped, empty buckets emitted with n=0."""
    col, query = "lastmodified", "merge join table"
    vals = _brute_match_vals(built_index["docs"], query, col)
    assert vals
    lo, hi = min(vals), max(vals)
    mid = (lo + hi) // 2
    ranges = [
        ("below_mid", None, mid),          # unbounded low
        ("overlap_all", lo, hi + 1),       # contains everything
        ("upper", mid, None),              # unbounded high, overlaps prev
        ("empty", hi + 10, hi + 20),       # past the max: n=0 row
        ("point", lo, lo + 1),             # exactly the min value
    ]
    got = [(r["range_key"], r["lo"], r["hi"], r["n"])
           for r in eng.range_agg(query, col=col, ranges=ranges).collect()]
    expect = []
    for key, a, b in ranges:
        n = sum(1 for v in vals
                if (a is None or v >= a) and (b is None or v < b))
        expect.append((key, a, b, n))
    assert got == expect
    assert got[1][3] == len(vals) and got[3][3] == 0
    # overlap: below_mid + upper == total (half-open split at mid)
    assert got[0][3] + got[2][3] == len(vals)


def test_range_agg_guards(eng):
    import pytest as _pytest
    with _pytest.raises(ValueError, match="non-empty"):
        eng.range_agg("fn index", ranges=())
    with _pytest.raises(ValueError, match="unique"):
        eng.range_agg("fn index", ranges=[("a", None, 5), ("a", 5, None)])
    # empty match set still emits every requested bucket at n=0
    rows = eng.range_agg("the fast key",
                         ranges=[("all", None, None)]).collect()
    assert [(r["range_key"], r["n"]) for r in rows] == [("all", 0)]


def test_cardinality_vs_bruteforce(eng, built_index):
    """Cardinality metric: exact distinct count (global and nested
    under a terms bucket) vs brute force; the HLL++ form stays within
    its rsd bound of the exact count."""
    from spyglass_spark.query.compiler import compile_query

    query = "merge join table"
    cq = compile_query(query)
    match = []
    for d in built_index["docs"]:
        fields = {
            "content": {t for _, t in tokenize_en(d["content"] or "")},
            "title": {t for _, t in tokenize_default(d["title"] or "")},
        }
        if any(t in fields.get(c.field, set())
               for c in cq.should_group for t in c.terms):
            match.append(d)
    exact = eng.cardinality(query, col="domain").collect()[0]["n_distinct"]
    expect = len({d["domain"] for d in match})
    assert exact == expect > 0

    per_tag = {r["tag_id"]: (r["doc_count"], r["n_distinct"])
               for r in eng.cardinality(query, col="domain",
                                        facet_col="tags").collect()}
    brute: dict = {}
    for d in match:
        for t in d["tags"]:
            brute.setdefault(t, []).append(d["domain"])
    assert per_tag == {t: (len(ds), len(set(ds))) for t, ds in brute.items()}

    approx = eng.cardinality(query, col="domain",
                             rsd=0.01).collect()[0]["n_distinct"]
    assert abs(approx - exact) <= max(1, 0.05 * exact)


def test_aggregate_request_tree_matches_singles(eng, built_index):
    """aggregate() = one match-set pass serving every sub-aggregation:
    each output equals its standalone method's output exactly, the
    sub-agg plans read the cached frame (InMemoryTableScan), and the
    cache is swapped out on the next call."""
    query = "merge join table"
    week = 7 * DAY_US
    lo = min(_brute_match_vals(built_index["docs"], query, "lastmodified"))
    out = eng.aggregate(query, aggs={
        "by_tag": {"kind": "facets"},
        "weekly": {"kind": "date_histogram", "interval_us": week},
        "dates": {"kind": "stats"},
        "pcts": {"kind": "percentiles", "percents": (50.0, 95.0)},
        "tag_dates": {"kind": "facet_stats"},
        "eras": {"kind": "range", "ranges": (("old", None, lo + 1),
                                             ("rest", lo + 1, None))},
        "domains": {"kind": "cardinality", "col": "domain"},
        "xstats": {"kind": "extended_stats", "shift": lo},
        "recent": {"kind": "top_hits", "k_hits": 2},
        "filled": {"kind": "date_histogram", "interval_us": week,
                   "min_doc_count": 0},
        "top_tags": {"kind": "terms", "size": 3},
        "total": {"kind": "count"},
    })
    singles = {
        "by_tag": eng.facet_counts(query),
        "weekly": eng.date_histogram(query, interval_us=week),
        "dates": eng.field_stats(query),
        "pcts": eng.percentiles(query, percents=(50.0, 95.0)),
        "tag_dates": eng.facet_stats(query),
        "eras": eng.range_agg(query, ranges=(("old", None, lo + 1),
                                             ("rest", lo + 1, None))),
        "domains": eng.cardinality(query, col="domain"),
        "xstats": eng.extended_stats(query, shift=lo),
        "recent": eng.top_hits(query, k_hits=2),
        "filled": eng.date_histogram(query, interval_us=week,
                                     min_doc_count=0),
        "top_tags": eng.terms_agg(query, size=3),
        "total": eng.count_matches(query),
    }
    for name, df in out.items():
        assert df.collect() == singles[name].collect(), name
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan, name
    first_cache = eng._agg_dm_cache
    assert first_cache is not None
    eng.aggregate(query, aggs={"n": {"kind": "stats"}})
    assert eng._agg_dm_cache is not first_cache

    import pytest as _pytest
    with _pytest.raises(ValueError, match="non-empty"):
        eng.aggregate(query, aggs={})
    with _pytest.raises(ValueError, match="kind"):
        eng.aggregate(query, aggs={"x": {"kind": "nope"}})


def test_extended_stats_vs_bruteforce_bitwise(eng, built_index):
    """ExtendedStats: the double expression tree (avg, variance via the
    shifted sums, std, sigma bounds) replicated in scalar Python must be
    BITWISE identical — partition-order independence comes from exact
    decimal sums, the fixed final expression tree does the rest. Also:
    variance is translation-invariant, so shift=0 and an epoch shift
    agree to float tolerance, and the n/min/max/sum/avg head matches
    field_stats exactly."""
    import math

    query, col = "merge join table", "lastmodified"
    vals = _brute_match_vals(built_index["docs"], query, col)
    assert vals
    for shift in (0, 1_577_836_800_000_000):
        row = eng.extended_stats(query, col=col, shift=shift).collect()[0]
        n, s = len(vals), sum(vals)
        s_sh = sum(v - shift for v in vals)
        ssq_sh = sum((v - shift) ** 2 for v in vals)
        avg = float(s) / n
        m = float(s_sh) / n
        var_raw = (float(ssq_sh) - float(s_sh) * m) / n
        var = 0.0 if var_raw <= 0.0 else var_raw
        std = math.sqrt(var)
        assert (row["n"], row["min"], row["max"], row["sum"]) == \
           (n, min(vals), max(vals), s)
        assert row["avg"] == avg
        assert row["sum_of_squares"] == float(sum(v * v for v in vals))
        assert row["variance"] == var and row["std_deviation"] == std
        assert row["std_upper"] == avg + 2.0 * std
        assert row["std_lower"] == avg - 2.0 * std
    v0 = eng.extended_stats(query, col=col, shift=0).collect()[0]
    v1 = eng.extended_stats(query, col=col,
                            shift=1_577_836_800_000_000).collect()[0]
    assert math.isclose(v0["variance"], v1["variance"], rel_tol=1e-9)
    head = eng.field_stats(query, col=col).collect()[0]
    assert (v0["n"], v0["min"], v0["max"], v0["sum"], v0["avg"]) == \
        (head["n"], head["min"], head["max"], head["sum"], head["avg"])


def test_extended_stats_empty_match(eng):
    row = eng.extended_stats("the fast key").collect()[0]
    assert row["n"] == 0
    for c in ("min", "max", "sum", "avg", "sum_of_squares", "variance",
              "std_deviation", "std_upper", "std_lower"):
        assert row[c] is None, c


def test_extended_stats_raw_ssq_overflow_shift_survives(spark, tmp_path):
    """The raw Σx² column try_sums to NULL once it exceeds decimal(38,0)
    (two squares of ~9.2e18 do), while the SHIFTED variance stays exact —
    the documented 100 TB contract: shift by a corpus epoch and the
    metric survives any match count."""
    import hashlib
    import uuid

    from spyglass_spark.corpus import SPYGLASS_NS
    from spyglass_spark.index.builder import build_index
    from spyglass_spark.query.executor import SearchEngine

    big = 9_200_000_000_000_000_000  # x² ≈ 8.5e37; 3 docs overflow 38,0
    docs = []
    for i in range(3):
        url = f"repo://x/f{i}.rs@{'a' * 40}"
        docs.append(dict(
            doc_id=str(uuid.uuid5(SPYGLASS_NS, url)), url=url, domain="x",
            title=f"f{i}.rs", content="overflow probe doc",
            tags=[1], content_sha256=hashlib.sha256(b"c").hexdigest(),
            published=big, lastmodified=big + i))
    idx = str(tmp_path / "xovf")
    build_index(spark, spark.createDataFrame(docs), idx, num_partitions=2)
    row = (SearchEngine(spark, idx)
           .extended_stats("overflow probe", shift=big).collect()[0])
    assert row["n"] == 3 and row["sum_of_squares"] is None
    # shifted values are 0,1,2: population variance 2/3, exactly
    assert row["variance"] == (float(5) - float(3) * (float(3) / 3)) / 3
    assert row["min"] == big and row["max"] == big + 2


def _brute_top_hits(docs, query, col="lastmodified", k=3, asc=False):
    buckets: dict[int, list] = {}
    sign = 1 if asc else -1
    for d in docs:
        fields = {
            "content": {t for _, t in tokenize_en(d["content"] or "")},
            "title": {t for _, t in tokenize_default(d["title"] or "")},
        }
        from spyglass_spark.query.compiler import compile_query
        cq = compile_query(query)
        if not any(t in fields.get(c.field, set())
                   for c in cq.should_group for t in c.terms):
            continue
        if d.get(col) is None:
            continue
        for t in d["tags"]:
            buckets.setdefault(int(t), []).append(
                (sign * int(d[col]), d["url"]))
    rows = []
    for t in sorted(buckets):
        for i, (sv, url) in enumerate(sorted(buckets[t])[:k]):
            rows.append((t, i + 1, url, sign * sv))
    return rows


def test_top_hits_vs_bruteforce_and_salt_invariance(eng, built_index):
    """TopHits per tag bucket: engine ≡ brute-force Python sort, and the
    salted two-phase merge is a pure execution detail — any salt_buckets
    yields identical rows (the property that makes the salt safe)."""
    query = "merge join table"
    expect = _brute_top_hits(built_index["docs"], query)
    assert expect
    for sb in (1, 4, 16):
        got = [(r["tag_id"], r["rank"], r["url"], r["sort_value"])
               for r in eng.top_hits(query, salt_buckets=sb).collect()]
        assert got == expect, f"salt_buckets={sb}"
    got_asc = [(r["tag_id"], r["rank"], r["url"], r["sort_value"])
               for r in eng.top_hits(query, asc=True).collect()]
    assert got_asc == _brute_top_hits(built_index["docs"], query, asc=True)
    with pytest.raises(ValueError, match="k_hits"):
        eng.top_hits(query, k_hits=0)


def test_search_sorted_vs_bruteforce(eng, built_index):
    """Order-by-fast-field collector: (date desc, url asc) total order,
    offset applied after the sort with absolute ranks, asc variant,
    k guard."""
    query, col = "merge join table", "lastmodified"
    from spyglass_spark.query.compiler import compile_query
    cq = compile_query(query)
    matched = []
    for d in built_index["docs"]:
        fields = {
            "content": {t for _, t in tokenize_en(d["content"] or "")},
            "title": {t for _, t in tokenize_default(d["title"] or "")},
        }
        if any(t in fields.get(c.field, set())
               for c in cq.should_group for t in c.terms) \
                and d.get(col) is not None:
            matched.append(d)
    desc = sorted(matched, key=lambda d: (-d[col], d["url"]))
    got = [(r["rank"], r["url"], r[col]) for r in
           eng.search_sorted(query, k=4, offset=3).collect()]
    assert got == [(4 + i, d["url"], d[col])
                   for i, d in enumerate(desc[3:7])]
    asc = sorted(matched, key=lambda d: (d[col], d["url"]))
    got_asc = [(r["rank"], r["url"], r[col]) for r in
               eng.search_sorted(query, k=3, asc=True).collect()]
    assert got_asc == [(1 + i, d["url"], d[col])
                       for i, d in enumerate(asc[:3])]
    # offset past the end of the match set: empty page, no error
    assert eng.search_sorted(query, k=5, offset=10 ** 6).count() == 0
    with pytest.raises(ValueError, match="k must"):
        eng.search_sorted(query, k=0)


def test_search_sorted_cursor_pages_concatenate(eng, built_index):
    """search_sorted(after=…): cursor pages walk the (col, url) total
    order — concatenated pages ≡ the one-shot head, desc and asc, ranks
    restarting at 1 per page; a cursor past the end yields an empty
    page; cursor and offset are mutually exclusive."""
    query, col, k = "merge join table", "lastmodified", 3
    one_shot = [(r["url"], r[col]) for r in
                eng.search_sorted(query, k=4 * k).collect()]
    assert len(one_shot) > 2 * k  # enough matches for >2 pages
    for asc in (False, True):
        shot = [(r["url"], r[col]) for r in
                eng.search_sorted(query, k=4 * k, asc=asc).collect()]
        walked, cursor = [], None
        while len(walked) < len(shot):
            page = eng.search_sorted(query, k=k, asc=asc,
                                     after=cursor).collect()
            if not page:
                break
            assert [r["rank"] for r in page] == \
                list(range(1, len(page) + 1))
            walked.extend((r["url"], r[col]) for r in page)
            cursor = (page[-1][col], page[-1]["url"])
        assert walked == shot, f"asc={asc}"
    # a desc cursor below EVERY matched value (global min from the
    # stats agg, not just the collected head): empty page, no error
    lo = eng.field_stats(query, col=col).collect()[0]["min"]
    assert eng.search_sorted(query, k=k, after=(lo - 1, "")).count() == 0
    with pytest.raises(ValueError, match="mutually exclusive"):
        eng.search_sorted(query, k=k, offset=2, after=(lo, ""))


def test_date_histogram_gapfill_vs_bruteforce(eng, built_index):
    """min_doc_count=0 (tantivy's histogram default): every bucket from
    the first to the last occupied one, empties as n=0 — vs a plain
    Python range fill over the brute match set; min_doc_count=k keeps
    only buckets with >= k docs; None stays the occupied-only
    contract."""
    query, step = "merge join table", 7 * DAY_US
    occupied = _brute_histogram(built_index["docs"], query, step)
    assert occupied
    lo, hi = min(occupied), max(occupied)
    expect = [(b, occupied.get(b, 0)) for b in range(lo, hi + 1, step)]
    got = [(r["bucket"], r["n"]) for r in eng.date_histogram(
        query, interval_us=step, min_doc_count=0).collect()]
    assert got == expect
    assert len(got) >= len(occupied)  # grid is a superset of occupied
    got3 = [(r["bucket"], r["n"]) for r in eng.date_histogram(
        query, interval_us=step, min_doc_count=3).collect()]
    assert got3 == [(b, n) for b, n in sorted(occupied.items()) if n >= 3]
    # empty match set: NULL bounds -> zero grid rows, like tantivy
    assert eng.date_histogram("the fast key", interval_us=step,
                              min_doc_count=0).count() == 0
    # the bucket-limit guard is folded into the sequence bound, so it
    # survives column pruning and raises at execution
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException
    with pytest.raises((SparkRuntimeException, Py4JJavaError),
                       match="max_buckets"):
        eng.date_histogram(query, interval_us=1000,
                           min_doc_count=0).collect()


def _hkey(v, interval, offset=0):
    """Floor-mod bucket key (exact for any sign) — the scalar twin of
    the engine's histogram bucket expression."""
    return v - ((v - offset) % interval)


def test_histogram_generic_vs_bruteforce(eng, built_index):
    """The generic HistogramAggregation (tantivy-0.19.2
    aggregation/bucket/histogram.rs knobs): offset translates the grid,
    hard_bounds drops out-of-range values entirely, extended_bounds
    widens the gap-filled grid — each vs a pure-Python brute force over
    the same match set; offset=0 must agree with date_histogram."""
    query, step = "merge join table", 7 * DAY_US
    docs = built_index["docs"]
    base = _brute_histogram(docs, query, step)
    assert base

    # offset=0 ≡ date_histogram (same buckets, same counts, same order)
    got0 = [(r["bucket"], r["n"]) for r in eng.histogram(
        query, interval=step, col="lastmodified").collect()]
    exp_dh = [(r["bucket"], r["n"]) for r in eng.date_histogram(
        query, interval_us=step).collect()]
    assert got0 == exp_dh == sorted(base.items())

    # offset: every bucket key shifts onto the translated grid
    off = 3 * DAY_US + 12_345
    vals = [d["lastmodified"] for d in docs
            if d["doc_id"] in _match_ids(docs, query)
            and d.get("lastmodified") is not None]
    from collections import Counter
    expc = Counter(_hkey(v, step, off) for v in vals)
    got = [(r["bucket"], r["n"]) for r in eng.histogram(
        query, interval=step, offset=off).collect()]
    assert got == sorted(expc.items())
    assert all((b - off) % step == 0 for b, _ in got)

    # hard_bounds: closed [lo, hi], values outside ignored entirely
    svals = sorted(vals)
    lo_v, hi_v = svals[len(svals) // 4], svals[(3 * len(svals)) // 4]
    exph = Counter(_hkey(v, step) for v in vals if lo_v <= v <= hi_v)
    goth = [(r["bucket"], r["n"]) for r in eng.histogram(
        query, interval=step, hard_bounds=(lo_v, hi_v)).collect()]
    assert goth == sorted(exph.items())
    assert len(goth) < len(got0)  # the bounds actually cut something

    # extended_bounds + min_doc_count=0: grid covers the bounds' buckets
    ext = (min(vals) - 3 * step, max(vals) + 2 * step)
    glo, ghi = _hkey(ext[0], step), _hkey(ext[1], step)
    expg = [(b, base.get(b, 0)) for b in range(glo, ghi + step, step)]
    gotg = [(r["bucket"], r["n"]) for r in eng.histogram(
        query, interval=step, min_doc_count=0,
        extended_bounds=ext).collect()]
    assert gotg == expg
    assert gotg[0][1] == 0 and gotg[-1][1] == 0  # the widening is real

    # an EMPTY match set with extended_bounds still emits the extended
    # grid, all n=0 (the ES/tantivy guarantee); without it, zero rows
    gote = [(r["bucket"], r["n"]) for r in eng.histogram(
        "the fast key", interval=step, min_doc_count=0,
        extended_bounds=(0, 3 * step)).collect()]
    assert gote == [(b, 0) for b in range(0, 3 * step + step, step)]
    assert eng.histogram("the fast key", interval=step,
                         min_doc_count=0).count() == 0

    # validation: tantivy's own error shapes
    with pytest.raises(ValueError, match="interval must be positive"):
        eng.histogram(query, interval=0)
    with pytest.raises(ValueError, match="lo must be <= hi"):
        eng.histogram(query, interval=step, hard_bounds=(10, 5))
    with pytest.raises(ValueError, match="within hard_bounds"):
        eng.histogram(query, interval=step, hard_bounds=(lo_v, hi_v),
                      extended_bounds=(lo_v - 1, hi_v))


def _match_ids(docs, query, filters=()):
    from spyglass_spark.query.compiler import compile_query

    cq = compile_query(query, filters)
    out = set()
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
            out.add(d["doc_id"])
    return out


def test_histogram_stats_vs_bruteforce(eng, built_index):
    """Nested stats metric under histogram buckets (HistogramAggregation
    + StatsAggregation sub-agg): per-bucket doc_count vs stats-n split
    (NULL stats_col docs count in doc_count, not n), exact decimal sum,
    avg = double(sum)/n bitwise, gap-filled empties as
    (doc_count=0, n=0, NULL stats) — vs a pure-Python brute force."""
    query, step = "merge join table", 7 * DAY_US
    docs = built_index["docs"]
    ids = _match_ids(docs, query)
    matched = [d for d in docs if d["doc_id"] in ids
               and d.get("lastmodified") is not None]
    assert matched
    buckets: dict[int, list] = {}
    for d in matched:
        buckets.setdefault(_hkey(d["lastmodified"], step), []).append(
            d.get("published"))

    def _exp_row(b):
        vs = [v for v in buckets.get(b, []) if v is not None]
        return (b, len(buckets.get(b, [])), len(vs),
                min(vs) if vs else None, max(vs) if vs else None,
                sum(vs) if vs else None,
                float(sum(vs)) / len(vs) if vs else None)

    got = [(r["bucket"], r["doc_count"], r["n"], r["min"], r["max"],
            r["sum"], r["avg"])
           for r in eng.histogram_stats(query, interval=step).collect()]
    assert got == [_exp_row(b) for b in sorted(buckets)]
    assert any(r[2] < r[1] for r in got) or all(
        d.get("published") is not None for d in matched)

    # gap fill: contiguous grid, empties emit zero counts + NULL stats
    lo, hi = min(buckets), max(buckets)
    gotg = [(r["bucket"], r["doc_count"], r["n"], r["min"], r["max"],
             r["sum"], r["avg"])
            for r in eng.histogram_stats(query, interval=step,
                                         min_doc_count=0).collect()]
    expg = []
    for b in range(lo, hi + step, step):
        expg.append(_exp_row(b) if b in buckets
                    else (b, 0, 0, None, None, None, None))
    assert gotg == expg
    assert any(r[1] == 0 for r in gotg)  # the fill is nonvacuous

    # min_doc_count=k filter + hard_bounds cut agree with the brute
    gotk = [(r["bucket"], r["doc_count"]) for r in eng.histogram_stats(
        query, interval=step, min_doc_count=2).collect()]
    assert gotk == [(b, len(v)) for b, v in sorted(buckets.items())
                    if len(v) >= 2]
    svals = sorted(d["lastmodified"] for d in matched)
    lo_v, hi_v = svals[len(svals) // 4], svals[(3 * len(svals)) // 4]
    goth = [(r["bucket"], r["doc_count"]) for r in eng.histogram_stats(
        query, interval=step, hard_bounds=(lo_v, hi_v)).collect()]
    from collections import Counter
    exph = Counter(_hkey(d["lastmodified"], step) for d in matched
                   if lo_v <= d["lastmodified"] <= hi_v)
    assert goth == sorted(exph.items())

    # the aggregate() tree serves the same rows from its cached pass
    tree = eng.aggregate(query, aggs={
        "hs": {"kind": "histogram_stats", "interval": step}})
    assert [(r["bucket"], r["doc_count"], r["n"], r["min"], r["max"],
             r["sum"], r["avg"]) for r in tree["hs"].collect()] == got


def test_significant_terms_vs_bruteforce(eng, built_index):
    """ES significant_terms with the JLH heuristic: per content term,
    fg = matching docs containing it (distinct per doc), bg = the
    index-wide df BM25 uses, score = (fgPct − bgPct)·(fgPct/bgPct)
    clamped at 0 — vs a pure-Python recount with the scalar analyzers,
    full ranked list bitwise (score desc, term asc)."""
    docs = built_index["docs"]
    query = "merge join table"
    ids = _match_ids(docs, query)
    assert len(ids) >= 3

    def terms_of(d):
        return {t for _, t in tokenize_en(d["content"] or "")}

    fg_counts: dict[str, int] = {}
    bg_counts: dict[str, int] = {}
    for d in docs:
        ts = terms_of(d)
        for t in ts:
            bg_counts[t] = bg_counts.get(t, 0) + 1
        if d["doc_id"] in ids:
            for t in ts:
                fg_counts[t] = fg_counts.get(t, 0) + 1
    fgT, bgT = float(len(ids)), float(len(docs))
    mdc = 2
    exp = []
    for t, fgc in fg_counts.items():
        if fgc < mdc:
            continue
        bgc = bg_counts[t]
        fgp, bgp = fgc / fgT, bgc / bgT
        score = (fgp - bgp) * (fgp / bgp) if fgp > bgp else 0.0
        exp.append((t, fgc, bgc, score))
    exp.sort(key=lambda x: (-x[3], x[0]))

    got = [(r["term"], r["fg"], r["bg"], r["score"])
           for r in eng.significant_terms(query, size=100_000,
                                          min_doc_count=mdc).collect()]
    assert got == exp  # float equality intended: bitwise pin
    assert got[0][3] > 0.0  # something IS significant

    # top-size is a prefix of the full ranking; aggregate-tree parity
    got5 = [(r["term"], r["fg"], r["bg"], r["score"])
            for r in eng.significant_terms(query, size=5,
                                           min_doc_count=mdc).collect()]
    assert got5 == exp[:5]
    tree = eng.aggregate(query, aggs={
        "sig": {"kind": "significant_terms", "size": 5,
                "min_doc_count": mdc}})
    assert [(r["term"], r["fg"], r["bg"], r["score"])
            for r in tree["sig"].collect()] == got5

    # empty match set -> zero rows; oversized match set -> the guard
    assert eng.significant_terms("the fast key").collect() == []
    with pytest.raises(ValueError, match="fg_limit"):
        eng.significant_terms(query, fg_limit=1)

    # deterministic sampler (the ES sampler-agg pairing): foreground =
    # the k SMALLEST doc_ords of the match set — reproduced here via
    # the doc_ord invariant (part_id(sha256(url)) << 40 | url rank)
    from spyglass_spark.index.builder import part_id_py
    P = built_index["P"]
    parts: dict[int, list] = {}
    for d in docs:
        parts.setdefault(part_id_py(d["url"], P), []).append(d["url"])
    omap = {}
    for p, urls in parts.items():
        for rank, u in enumerate(sorted(urls)):
            omap[u] = (p << 40) | rank
    matched_by_ord = sorted((omap[d["url"]], d) for d in docs
                            if d["doc_id"] in ids)
    k = max(2, len(matched_by_ord) // 2)
    sampled = [d for _, d in matched_by_ord[:k]]
    fg_s: dict[str, int] = {}
    for d in sampled:
        for t in terms_of(d):
            fg_s[t] = fg_s.get(t, 0) + 1
    fgT_s = float(k)
    exp_s = []
    for t, fgc in fg_s.items():
        if fgc < mdc:
            continue
        bgc = bg_counts[t]
        fgp, bgp = fgc / fgT_s, bgc / bgT
        exp_s.append((t, fgc, bgc,
                      (fgp - bgp) * (fgp / bgp) if fgp > bgp else 0.0))
    exp_s.sort(key=lambda x: (-x[3], x[0]))
    got_s = [(r["term"], r["fg"], r["bg"], r["score"])
             for r in eng.significant_terms(query, size=100_000,
                                            min_doc_count=mdc,
                                            sample=k).collect()]
    assert got_s == exp_s
    # a sampled run ignores fg_limit (the sampler IS the bound)
    assert eng.significant_terms(query, size=3, fg_limit=1,
                                 sample=k).count() == 3
    with pytest.raises(ValueError, match="sample must be positive"):
        eng.significant_terms(query, sample=0)


def test_pipeline_aggs_vs_bruteforce(eng, built_index):
    """ES parent pipeline aggregations over sibling histogram buckets:
    cumulative_sum (running total, integer-exact) and derivative
    (difference vs previous bucket, first bucket omitted — the ES
    contract) vs plain Python over the brute-forced bucket counts;
    buckets_path wiring (with and without >col) through aggregate()."""
    query, step = "merge join table", 7 * DAY_US
    occupied = _brute_histogram(built_index["docs"], query, step)
    assert len(occupied) >= 3
    lo, hi = min(occupied), max(occupied)
    grid = [(b, occupied.get(b, 0)) for b in range(lo, hi + step, step)]

    tree = eng.aggregate(query, aggs={
        "weekly": {"kind": "histogram", "interval": step,
                   "min_doc_count": 0},
        "cum": {"kind": "cumulative_sum", "buckets_path": "weekly"},
        "deriv": {"kind": "derivative", "buckets_path": "weekly>n"}})
    run, exp_cum = 0, []
    for b, n in grid:
        run += n
        exp_cum.append((b, run))
    got_cum = [(r["bucket"], r["value"]) for r in tree["cum"].collect()]
    assert got_cum == exp_cum
    exp_d = [(grid[i][0], grid[i][1] - grid[i - 1][1])
             for i in range(1, len(grid))]
    got_d = [(r["bucket"], r["value"]) for r in tree["deriv"].collect()]
    assert got_d == exp_d
    assert len(got_d) == len(grid) - 1  # first bucket omitted

    # occupied-only sibling: derivative differences consecutive EMITTED
    # buckets (the ES contract on a sparse histogram)
    occ = sorted(occupied.items())
    tree2 = eng.aggregate(query, aggs={
        "w": {"kind": "histogram", "interval": step},
        "d": {"kind": "derivative", "buckets_path": "w"}})
    assert [(r["bucket"], r["value"]) for r in tree2["d"].collect()] == \
        [(occ[i][0], occ[i][1] - occ[i - 1][1]) for i in range(1, len(occ))]

    # sibling pipeline family: stats_bucket one-row reduction, the
    # min/max extreme with its FULL tie keys list, and the ES
    # max_bucket-of-derivative chain (ordered pipeline-on-pipeline)
    ns = [n for _, n in grid]
    tree3 = eng.aggregate(query, aggs={
        "w": {"kind": "histogram", "interval": step, "min_doc_count": 0},
        "sb": {"kind": "stats_bucket", "buckets_path": "w"},
        "mx": {"kind": "max_bucket", "buckets_path": "w"},
        "mn": {"kind": "min_bucket", "buckets_path": "w>n"},
        "d": {"kind": "derivative", "buckets_path": "w"},
        "dmx": {"kind": "max_bucket", "buckets_path": "d>value"}})
    sb = tree3["sb"].collect()[0]
    assert (sb["count"], sb["min"], sb["max"], sb["sum"]) == \
        (len(ns), min(ns), max(ns), sum(ns))
    assert sb["avg"] == float(sum(ns)) / len(ns)
    mx = tree3["mx"].collect()[0]
    assert mx["value"] == max(ns)
    assert mx["keys"] == ",".join(
        str(b) for b, n in grid if n == max(ns))
    mn = tree3["mn"].collect()[0]
    assert mn["value"] == 0  # the gap fill guarantees zero buckets
    assert len(mn["keys"].split(",")) == sum(1 for n in ns if n == 0) >= 1
    dvals = [grid[i][1] - grid[i - 1][1] for i in range(1, len(grid))]
    dmx = tree3["dmx"].collect()[0]
    assert dmx["value"] == max(dvals)
    assert dmx["keys"] == ",".join(
        str(grid[i][0]) for i in range(1, len(grid))
        if dvals[i - 1] == max(dvals))

    # validation: a pipeline agg must reference a sibling BUCKET agg
    # (or an EARLIER pipeline entry — forward/self chains rejected)
    with pytest.raises(ValueError, match="sibling"):
        eng.aggregate(query, aggs={
            "c": {"kind": "cumulative_sum", "buckets_path": "nope"}})
    with pytest.raises(ValueError, match="sibling"):
        eng.aggregate(query, aggs={
            "w": {"kind": "histogram", "interval": step},
            "a": {"kind": "cumulative_sum", "buckets_path": "b"},
            "b": {"kind": "derivative", "buckets_path": "a"}})


def test_pipeline_aggs_extended(eng, built_index):
    """The remaining ES parent pipeline aggregations — moving_fn (all
    six MovingFunctions, ES window semantics incl. shift), serial_diff
    (lag-k generalized derivative), bucket_script / bucket_selector
    (SQL-expression script over the sibling's columns) and bucket_sort
    (sort + from/size paging) — vs plain Python over the brute-forced
    gap-filled grid, wired through aggregate() incl. a
    pipeline-on-pipeline selector→sort chain."""
    query, step = "merge join table", 7 * DAY_US
    occupied = _brute_histogram(built_index["docs"], query, step)
    lo, hi = min(occupied), max(occupied)
    grid = [(b, occupied.get(b, 0)) for b in range(lo, hi + step, step)]
    ns = [n for _, n in grid]
    assert len(grid) >= 4 and any(n == 0 for n in ns)

    tree = eng.aggregate(query, aggs={
        "w": {"kind": "histogram", "interval": step, "min_doc_count": 0},
        "avg": {"kind": "moving_fn", "buckets_path": "w", "window": 3},
        "mmx": {"kind": "moving_fn", "buckets_path": "w>n", "window": 2,
                "func": "max", "shift": 1},
        "msum": {"kind": "moving_fn", "buckets_path": "w", "window": 3,
                 "func": "sum"},
        "mmin": {"kind": "moving_fn", "buckets_path": "w", "window": 2,
                 "func": "min"},
        "msd": {"kind": "moving_fn", "buckets_path": "w", "window": 3,
                "func": "stdDev"},
        "lwa": {"kind": "moving_fn", "buckets_path": "w", "window": 3,
                "func": "linearWeightedAvg"},
        "sd2": {"kind": "serial_diff", "buckets_path": "w", "lag": 2},
        "scr": {"kind": "bucket_script", "buckets_path": "w",
                "script": "n * 3 - 1"},
        "sel": {"kind": "bucket_selector", "buckets_path": "w",
                "script": "n > 0"},
        "page": {"kind": "bucket_sort", "buckets_path": "sel",
                 "sort": [["n", "desc"]], "from": 1, "size": 3}})

    def windowed(w_len, shift):
        out = []
        for i in range(len(ns)):
            frame = ns[max(0, i + shift - w_len):max(0, i + shift)]
            if frame:
                out.append((grid[i][0], frame))
        return out

    assert [(r["bucket"], r["value"]) for r in tree["avg"].collect()] == \
        [(b, sum(f) / len(f)) for b, f in windowed(3, 0)]
    assert [(r["bucket"], r["value"]) for r in tree["mmx"].collect()] == \
        [(b, float(max(f))) for b, f in windowed(2, 1)]
    assert [(r["bucket"], r["value"]) for r in tree["msum"].collect()] == \
        [(b, float(sum(f))) for b, f in windowed(3, 0)]
    assert [(r["bucket"], r["value"]) for r in tree["mmin"].collect()] == \
        [(b, float(min(f))) for b, f in windowed(2, 0)]
    for got, (b, f) in zip(tree["msd"].collect(), windowed(3, 0)):
        m = sum(f) / len(f)
        assert got["bucket"] == b
        assert got["value"] == pytest.approx(
            (sum((v - m) ** 2 for v in f) / len(f)) ** 0.5, rel=1e-12)

    def lwa(f):
        num = den = 0.0
        for i, v in enumerate(f):
            num += (i + 1) * float(v)
            den += i + 1
        return num / den
    assert [(r["bucket"], r["value"]) for r in tree["lwa"].collect()] == \
        [(b, lwa(f)) for b, f in windowed(3, 0)]

    assert [(r["bucket"], r["value"]) for r in tree["sd2"].collect()] == \
        [(grid[i][0], ns[i] - ns[i - 2]) for i in range(2, len(grid))]
    assert [(r["bucket"], r["value"]) for r in tree["scr"].collect()] == \
        [(b, float(n * 3 - 1)) for b, n in grid]
    kept = [(b, n) for b, n in grid if n > 0]
    assert sorted((r["bucket"], r["n"]) for r in tree["sel"].collect()) == \
        kept
    paged = sorted(kept, key=lambda x: (-x[1], x[0]))[1:4]
    assert [(r["bucket"], r["n"]) for r in tree["page"].collect()] == paged

    # bucket_script NULL results are omitted (ES gap_policy=skip)
    nulls = eng.aggregate(query, aggs={
        "w": {"kind": "histogram", "interval": step, "min_doc_count": 0},
        "s": {"kind": "bucket_script", "buckets_path": "w",
              "script": "CASE WHEN n > 0 THEN 1.0 / n END"}})["s"]
    assert [(r["bucket"], r["value"]) for r in nulls.collect()] == \
        [(b, 1.0 / n) for b, n in grid if n > 0]

    # validation: bad func / lag / sort direction
    with pytest.raises(ValueError, match="func must be"):
        eng.moving_fn(tree["sel"], func="kurtosis")
    with pytest.raises(ValueError, match="lag must be"):
        eng.serial_diff(tree["sel"], lag=0)
    with pytest.raises(ValueError, match="window must be"):
        eng.moving_fn(tree["sel"], window=0)
    with pytest.raises(ValueError, match="direction"):
        eng.bucket_sort(tree["sel"], sort=(("n", "descending"),))


def test_histogram_in_aggregate_tree(eng, built_index):
    """The `histogram` kind serves from aggregate()'s single cached
    match-set pass with the same answer as the standalone method."""
    query, step = "merge join table", 7 * DAY_US
    off = DAY_US // 2
    exp = [(r["bucket"], r["n"]) for r in eng.histogram(
        query, interval=step, offset=off).collect()]
    tree = eng.aggregate(query, aggs={
        "h": {"kind": "histogram", "interval": step, "offset": off},
        "c": {"kind": "count"}})
    assert [(r["bucket"], r["n"]) for r in tree["h"].collect()] == exp
    assert tree["c"].collect()[0]["n"] == sum(n for _, n in exp)


def test_terms_agg_vs_bruteforce(eng, built_index):
    """TermsAggregation response shape: top-size buckets (count desc,
    key asc) + constant sum_other_doc_count ≡ brute counts; size beyond
    #distinct keeps every bucket with other=0; scalar facet column
    groups directly."""
    query = "merge join table"
    counts = _brute_facets(built_index["docs"], query)
    assert len(counts) > 3
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(counts.values())
    for size in (3, len(counts) + 5):
        got = [(r["tag_id"], r["doc_count"], r["sum_other_doc_count"])
               for r in eng.terms_agg(query, size=size).collect()]
        top = ranked[:size]
        other = total - sum(n for _, n in top)
        assert got == [(t, n, other) for t, n in top]
    dom = [(r["tag_id"], r["doc_count"]) for r in
           eng.terms_agg(query, facet_col="domain", size=2).collect()]
    assert len(dom) == 2 and dom[0][1] >= dom[1][1]
    with pytest.raises(ValueError, match="size"):
        eng.terms_agg(query, size=0)


def test_date_histogram_guards(eng):
    with pytest.raises(ValueError, match="interval_us"):
        eng.date_histogram("fn index", interval_us=0)
    with pytest.raises(ValueError, match="Should"):
        eng.date_histogram("")


def test_facet_counts_zero_boost_guard(eng):
    with pytest.raises(ValueError, match="zero-boost"):
        eng.facet_counts("fn index", boosts=[("custom:priority", 7)])
    with pytest.raises(ValueError, match="Should"):
        eng.facet_counts("")


def _brute_count(docs, query, filters=()):
    """Independent match-set size with the scalar analyzers."""
    from spyglass_spark.query.compiler import compile_query

    cq = compile_query(query, filters)
    n = 0
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
        n += should and musts
    return n


@pytest.mark.parametrize("query,filters", CASES)
def test_count_matches_vs_bruteforce(eng, built_index, query, filters):
    """Count collector (tantivy collector::Count analog): exact size of
    the full live match set, incl. the empty-match case (n=0, 1 row)."""
    rows = eng.count_matches(query, filters).collect()
    assert len(rows) == 1
    assert rows[0]["n"] == _brute_count(built_index["docs"], query, filters)


def test_count_matches_with_tag_filter(eng, built_index):
    tag = built_index["docs"][0]["tags"][0]
    got = eng.count_matches("fn index",
                            filters=[("tag", tag)]).collect()[0]["n"]
    assert got == _brute_count(built_index["docs"], "fn index",
                               [("tag", tag)])
    assert got <= eng.count_matches("fn index").collect()[0]["n"]


def test_count_matches_excludes_tombstones(spark, corpus_rows, tmp_path):
    from spyglass_spark.index.builder import build_index, delete_by_urls
    from spyglass_spark.query.executor import SearchEngine
    from spyglass_spark.testing import corpus_to_documents

    docs, _ = corpus_to_documents(corpus_rows[:40])
    idx = str(tmp_path / "cidx")
    build_index(spark, spark.createDataFrame(docs), idx, num_partitions=4)
    eng = SearchEngine(spark, idx)
    before = eng.count_matches("index search").collect()[0]["n"]
    assert before == _brute_count(docs, "index search")
    victim = next(d for d in docs if _brute_count([d], "index search"))
    delete_by_urls(spark, idx, [victim["url"]])
    eng.refresh()
    after = eng.count_matches("index search").collect()[0]["n"]
    assert after == before - 1


def test_count_matches_guards(eng):
    with pytest.raises(ValueError, match="zero-boost"):
        eng.count_matches("fn index", boosts=[("custom:priority", 7)])
    with pytest.raises(ValueError, match="Should"):
        eng.count_matches("")


def _brute_match_docs(docs, query, filters=()):
    """Independent match SET (doc dicts) with the scalar analyzers."""
    from spyglass_spark.query.compiler import compile_query

    cq = compile_query(query, filters)
    out = []
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
            out.append(d)
    return out


def test_filters_agg_vs_bruteforce(eng, built_index):
    """ES filters agg: named overlapping buckets ≡ brute predicate
    counts over the match set, request order, empties kept as n=0,
    _other_ = docs matching none."""
    query = "merge join table"
    matched = _brute_match_docs(built_index["docs"], query)
    assert len(matched) > 5
    doms = sorted({d["domain"] for d in matched})
    cut = sorted(d["lastmodified"] for d in matched)[len(matched) // 2]
    tag = matched[0]["tags"][0]
    specs = {
        "dom0": [("domain", "eq", doms[0])],
        "old": [("lastmodified", "lt", cut)],
        "dom0_old": [("domain", "eq", doms[0]),
                     ("lastmodified", "lt", cut)],
        "tagged": [("tags", "contains", tag)],
        "none": [("domain", "eq", "no-such-repo")],
    }
    exp = {
        "dom0": sum(d["domain"] == doms[0] for d in matched),
        "old": sum(d["lastmodified"] < cut for d in matched),
        "dom0_old": sum(d["domain"] == doms[0]
                        and d["lastmodified"] < cut for d in matched),
        "tagged": sum(tag in d["tags"] for d in matched),
        "none": 0,
    }
    assert exp["dom0"] > 0 and exp["tagged"] > 0   # non-degenerate
    rows = eng.filters_agg(query, specs=specs).collect()
    assert [(r["filter_key"], r["n"]) for r in rows] == \
        [(k, exp[k]) for k in specs]
    other = sum(not (d["domain"] == doms[0] or d["lastmodified"] < cut
                     or tag in d["tags"]) for d in matched)
    rows = eng.filters_agg(query, specs=specs, other_bucket=True).collect()
    assert [(r["filter_key"], r["n"]) for r in rows[:-1]] == \
        [(k, exp[k]) for k in specs]
    assert (rows[-1]["filter_key"], rows[-1]["n"]) == ("_other_", other)


def test_filters_agg_guards(eng):
    with pytest.raises(ValueError, match="non-empty"):
        eng.filters_agg("fn index", specs={})
    with pytest.raises(ValueError, match="reserved"):
        eng.filters_agg("fn index", specs={"_other_": [("domain", "eq", "x")]})
    with pytest.raises(ValueError, match="conditions"):
        eng.filters_agg("fn index", specs={"empty": []})
    with pytest.raises(ValueError, match="op must be"):
        eng.filters_agg("fn index",
                        specs={"bad": [("domain", "regex", "x")]})


def test_rare_terms_vs_bruteforce(eng, built_index):
    """ES rare_terms: exact long tail (doc_count <= max), count-asc
    key-asc total order, on both array and scalar facet columns."""
    query = "merge join table"
    counts = _brute_facets(built_index["docs"], query)
    assert counts
    for mdc in (1, 2, max(counts.values())):
        exp = sorted((n, t) for t, n in counts.items() if n <= mdc)
        got = [(r["doc_count"], r["tag_id"]) for r in
               eng.rare_terms(query, max_doc_count=mdc).collect()]
        assert got == exp
    domc = {}
    for d in _brute_match_docs(built_index["docs"], query):
        domc[d["domain"]] = domc.get(d["domain"], 0) + 1
    exp = sorted((n, k) for k, n in domc.items() if n <= 3)
    got = [(r["doc_count"], r["tag_id"]) for r in
           eng.rare_terms(query, facet_col="domain",
                          max_doc_count=3).collect()]
    assert got == exp
    with pytest.raises(ValueError, match="max_doc_count"):
        eng.rare_terms(query, max_doc_count=0)


def test_composite_pages_vs_bruteforce(eng, built_index):
    """ES composite agg: (terms, date_histogram) sources ≡ brute
    bucket counts in composite-key order; size-2 cursor pages
    concatenate to exactly the one-shot order."""
    query = "merge join table"
    matched = _brute_match_docs(built_index["docs"], query)
    day = 86_400_000_000
    buckets = {}
    for d in matched:
        key = (d["domain"], d["lastmodified"] - (d["lastmodified"] % day))
        buckets[key] = buckets.get(key, 0) + 1
    exp = [(k[0], k[1], n) for k, n in sorted(buckets.items())]
    assert len(exp) > 4
    sources = ({"name": "dom", "col": "domain", "kind": "terms"},
               {"name": "day", "col": "lastmodified",
                "kind": "date_histogram", "interval": day})
    one_shot = [(r["dom"], r["day"], r["doc_count"]) for r in
                eng.composite_agg(query, sources=sources,
                                  size=len(exp) + 5).collect()]
    assert one_shot == exp
    pages, after = [], None
    while True:
        rows = eng.composite_agg(query, sources=sources, size=2,
                                 after=after).collect()
        if not rows:
            break
        pages += [(r["dom"], r["day"], r["doc_count"]) for r in rows]
        after = (rows[-1]["dom"], rows[-1]["day"])
    assert pages == exp
    with pytest.raises(ValueError, match="sources"):
        eng.composite_agg(query, sources=())
    with pytest.raises(ValueError, match="interval"):
        eng.composite_agg(query, sources=(
            {"name": "d", "col": "lastmodified", "kind": "histogram"},))
    with pytest.raises(ValueError, match="after"):
        eng.composite_agg(query, sources=sources, after=("x",) * 3)


def test_new_kinds_in_aggregate_tree(eng, built_index):
    """filters/rare_terms/composite through the one-pass aggregate()
    request tree ≡ their standalone calls."""
    query = "merge join table"
    specs = {"all": [("lastmodified", "gte", 0)]}
    out = eng.aggregate(query, aggs={
        "rare": {"kind": "rare_terms", "max_doc_count": 2},
        "f": {"kind": "filters", "specs": specs, "other_bucket": True},
        "comp": {"kind": "composite",
                 "sources": ({"name": "dom", "col": "domain"},),
                 "size": 3},
    })
    assert out["rare"].collect() == \
        eng.rare_terms(query, max_doc_count=2).collect()
    assert out["f"].collect() == \
        eng.filters_agg(query, specs=specs, other_bucket=True).collect()
    assert out["comp"].collect() == eng.composite_agg(
        query, sources=({"name": "dom", "col": "domain"},), size=3).collect()


def test_metric_aggs_vs_bruteforce(eng, built_index):
    """ES metric completions: missing (NULL/empty-field bucket),
    value_count (per-element), weighted_avg (exact decimal sums, one
    double division), median_absolute_deviation and boxplot (exact
    chained percentile passes, Tukey whiskers) — each bitwise vs a
    scalar brute force over the brute match set."""
    from spyglass_spark.query.percentile import exact_percentile

    query = "merge join table"
    matched = _brute_match_docs(built_index["docs"], query)
    vals = sorted(float(d["lastmodified"]) for d in matched
                  if d["lastmodified"] is not None)
    assert len(vals) > 10

    # missing: the corpus never sets description (NULL for every doc)
    # and always sets two tags (array-empty never missing)
    assert eng.missing_count(query).collect()[0]["n"] == len(matched)
    assert eng.missing_count(query, col="tags").collect()[0]["n"] == 0

    # value_count: arrays count per element, scalars per doc
    assert eng.value_count(query, col="tags").collect()[0]["n"] == \
        sum(len(d["tags"]) for d in matched)
    assert eng.value_count(query, col="domain").collect()[0]["n"] == \
        len(matched)

    # weighted_avg: double(exact Σv·w)/double(exact Σw), both-present
    both = [(d["lastmodified"], d["published"]) for d in matched
            if d["lastmodified"] is not None
            and d["published"] is not None]
    r = eng.weighted_avg(query).collect()[0]
    assert r["n"] == len(both)
    assert r["value"] == (float(sum(v * w for v, w in both))
                          / float(sum(w for _, w in both)))

    # median_absolute_deviation: exact median-of-deviations chain
    med = exact_percentile(vals, 0.5)
    devs = sorted(abs(v - med) for v in vals)
    r = eng.median_absolute_deviation(query).collect()[0]
    assert (r["n"], r["mad"]) == (len(devs), exact_percentile(devs, 0.5))

    # boxplot: quartiles + Tukey whiskers (nearest points inside the
    # 1.5·IQR fences), same double expression order
    q1 = exact_percentile(vals, 0.25)
    q2 = exact_percentile(vals, 0.5)
    q3 = exact_percentile(vals, 0.75)
    lf, uf = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
    r = eng.boxplot(query).collect()[0]
    assert (r["n"], r["min"], r["max"]) == \
        (len(vals), vals[0], vals[-1])
    assert (r["q1"], r["q2"], r["q3"]) == (q1, q2, q3)
    assert r["lower"] == min(v for v in vals if v >= lf)
    assert r["upper"] == max(v for v in vals if v <= uf)

    # empty match set: counts come back 0, percentile chains NULL
    assert eng.missing_count("the fast key").collect()[0]["n"] == 0
    assert eng.value_count("the fast key", col="tags") \
        .collect()[0]["n"] == 0
    r = eng.median_absolute_deviation("the fast key").collect()[0]
    assert (r["n"], r["mad"]) == (0, None)
    assert eng.boxplot("the fast key").collect()[0]["n"] == 0

    # through the one-pass aggregate() tree ≡ standalone
    out = eng.aggregate(query, aggs={
        "m": {"kind": "missing", "col": "description"},
        "vc": {"kind": "value_count", "col": "tags"},
        "wa": {"kind": "weighted_avg"},
        "mad": {"kind": "median_absolute_deviation"},
        "bp": {"kind": "boxplot"}})
    assert out["m"].collect() == eng.missing_count(query).collect()
    assert out["wa"].collect() == eng.weighted_avg(query).collect()
    assert out["bp"].collect() == eng.boxplot(query).collect()


def test_bucket_agg_completions_vs_bruteforce(eng, built_index):
    """multi_terms (value-tuple buckets + other count),
    adjacency_matrix (singletons + '&' pair intersections, non-empty
    only), and auto_date_histogram (ladder rung choice, gap-filled
    grid, interval echo) vs brute force."""
    from collections import Counter

    from spyglass_spark.query.executor import SearchEngine

    query = "merge join table"
    matched = _brute_match_docs(built_index["docs"], query)

    # multi_terms over (domain, tags): a doc emits |tags| tuples
    mt = Counter((d["domain"], t) for d in matched for t in d["tags"])
    ranked = sorted(mt.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(mt.values())
    for size in (4, len(mt) + 3):
        got = [((r["domain"], r["tags"]), r["doc_count"],
                r["sum_other_doc_count"])
               for r in eng.multi_terms(query, size=size).collect()]
        top = ranked[:size]
        other = total - sum(n for _, n in top)
        assert got == [(k, n, other) for k, n in top]
    with pytest.raises(ValueError, match="facet_cols"):
        eng.multi_terms(query, facet_cols=("domain", "domain"))

    # adjacency_matrix: singletons + intersecting pairs (request-order
    # '&' keys), never-matching filter emits NOTHING, key-asc output
    doms = sorted({d["domain"] for d in matched})
    cut = sorted(d["lastmodified"] for d in matched)[len(matched) // 2]
    tag = matched[0]["tags"][0]
    specs = {
        "a_dom": (("domain", "eq", doms[0]),),
        "old": (("lastmodified", "lt", cut),),
        "tagged": (("tags", "contains", tag),),
        "never": (("domain", "eq", "zz-none"),),
    }
    names = list(specs)
    exp: Counter = Counter()
    for d in matched:
        on = [k for k, hit in (
            ("a_dom", d["domain"] == doms[0]),
            ("old", d["lastmodified"] < cut),
            ("tagged", tag in d["tags"]),
            ("never", False)) if hit]
        for i, a in enumerate(on):
            exp[a] += 1
            for b in on[i + 1:]:
                exp[a + "&" + b] += 1
    rows = eng.adjacency_matrix(query, specs=specs).collect()
    assert {r["filter_key"]: r["n"] for r in rows} == \
        {k: n for k, n in exp.items() if n > 0}
    ks = [r["filter_key"] for r in rows]
    assert ks == sorted(ks) and "never" not in ks
    assert any("&" in k for k in ks)   # an intersection is exercised
    with pytest.raises(ValueError, match="separator"):
        eng.adjacency_matrix(query,
                             specs={"a&b": (("domain", "eq", "x"),)})

    # auto_date_histogram: smallest qualifying rung, gap-filled grid,
    # constant interval echo
    vals = [d["lastmodified"] for d in matched
            if d["lastmodified"] is not None]
    lad = SearchEngine.AUTO_HIST_LADDER
    for target in (5, 20, 100):
        rows = eng.auto_date_histogram(query,
                                       target_buckets=target).collect()
        step = rows[0]["interval_us"]
        assert step in lad
        assert len({r["interval_us"] for r in rows}) == 1
        nb = max(vals) // step - min(vals) // step + 1
        assert len(rows) == nb
        assert nb <= target or step == lad[-1]
        idx = lad.index(step)
        if idx > 0:     # the next-smaller rung must have overflowed
            prev = lad[idx - 1]
            assert max(vals) // prev - min(vals) // prev + 1 > target
        bc = Counter((v // step) * step for v in vals)
        assert [(r["bucket"], r["n"]) for r in rows] == \
            [(b, bc.get(b, 0))
             for b in range(min(bc), max(bc) + step, step)]
    assert eng.auto_date_histogram("the fast key").collect() == []
    with pytest.raises(ValueError, match="target_buckets"):
        eng.auto_date_histogram(query, target_buckets=0)

    # through the one-pass aggregate() tree ≡ standalone
    out = eng.aggregate(query, aggs={
        "mt": {"kind": "multi_terms", "size": 4},
        "adj": {"kind": "adjacency_matrix", "specs": specs},
        "auto": {"kind": "auto_date_histogram", "target_buckets": 12}})
    assert out["mt"].collect() == eng.multi_terms(query, size=4).collect()
    assert out["adj"].collect() == \
        eng.adjacency_matrix(query, specs=specs).collect()
    assert out["auto"].collect() == \
        eng.auto_date_histogram(query, target_buckets=12).collect()


def test_global_bucket_in_aggregate_tree(eng, built_index):
    """ES `global` bucket: a sub-aggregation with global=True runs
    over the WHOLE live index (ignoring the query), sharing one
    persisted full doc-meta frame; siblings stay match-set scoped."""
    query = "merge join table"
    matched = _brute_match_docs(built_index["docs"], query)
    docs = built_index["docs"]
    out = eng.aggregate(query, aggs={
        "c": {"kind": "count"},
        "gc": {"kind": "count", "global": True},
        "gs": {"kind": "stats", "col": "lastmodified", "global": True},
        "gf": {"kind": "facets", "global": True}})
    assert out["c"].collect()[0]["n"] == len(matched) < len(docs)
    assert out["gc"].collect()[0]["n"] == len(docs)
    gs = out["gs"].collect()[0]
    vals = [d["lastmodified"] for d in docs
            if d["lastmodified"] is not None]
    assert (gs["n"], gs["min"], gs["max"], gs["sum"]) == \
        (len(vals), min(vals), max(vals), sum(vals))
    from collections import Counter
    gcnt = Counter(t for d in docs for t in d["tags"])
    assert [(r["tag_id"], r["n"]) for r in out["gf"].collect()] == \
        sorted(gcnt.items(), key=lambda kv: (-kv[1], kv[0]))


def test_string_stats_and_sampler_vs_bruteforce(eng, built_index):
    """string_stats (ES string metric: value lengths + log2 char
    entropy — entropy tolerance-gated, platform log2 ulp) and the
    aggregate() sampler knob (sub-agg over the deterministic
    first-N-by-doc_ord frame)."""
    import math
    from collections import Counter

    query = "merge join table"
    matched = _brute_match_docs(built_index["docs"], query)

    titles = [d["title"] for d in matched]
    r = eng.string_stats(query, col="title").collect()[0]
    lens = [len(t) for t in titles]
    assert (r["count"], r["min_length"], r["max_length"]) == \
        (len(lens), min(lens), max(lens))
    assert r["avg_length"] == float(sum(lens)) / len(lens)
    cc = Counter(ch for t in titles for ch in t)
    tot = sum(cc.values())
    exp_ent = -sum((n / tot) * math.log2(n / tot)
                   for _, n in sorted(cc.items()))
    assert abs(r["entropy"] - exp_ent) <= 1e-12 * max(1.0, abs(exp_ent))
    assert r["entropy"] > 1.0

    # array facet: values are the str casts of the tag elements
    r2 = eng.string_stats(query, col="tags").collect()[0]
    tvals = [str(t) for d in matched for t in d["tags"]]
    assert r2["count"] == len(tvals)
    assert (r2["min_length"], r2["max_length"]) == \
        (min(len(v) for v in tvals), max(len(v) for v in tvals))

    # empty match set: count 0, entropy 0.0 (the aggregate fold's seed)
    r0 = eng.string_stats("the fast key").collect()[0]
    assert (r0["count"], r0["entropy"]) == (0, 0.0)

    # sampler knob: the sub-agg sees exactly the k smallest doc_ords,
    # reproduced via the doc_ord invariant; the sibling stays full
    from spyglass_spark.index.builder import part_id_py
    P = built_index["P"]
    parts: dict[int, list] = {}
    for d in built_index["docs"]:
        parts.setdefault(part_id_py(d["url"], P), []).append(d["url"])
    omap = {}
    for p, urls in parts.items():
        for rank, u in enumerate(sorted(urls)):
            omap[u] = (p << 40) | rank
    by_ord = sorted((omap[d["url"]], d) for d in matched)
    k = max(3, len(by_ord) // 3)
    sampled = [d for _, d in by_ord[:k]]
    out = eng.aggregate(query, aggs={
        "sc": {"kind": "count", "sampler": k},
        "sf": {"kind": "facets", "sampler": k},
        "c": {"kind": "count"}})
    assert out["sc"].collect()[0]["n"] == k
    assert out["c"].collect()[0]["n"] == len(matched)
    scnt = Counter(t for d in sampled for t in d["tags"])
    assert [(x["tag_id"], x["n"]) for x in out["sf"].collect()] == \
        sorted(scnt.items(), key=lambda kv: (-kv[1], kv[0]))
    with pytest.raises(ValueError, match="sampler"):
        eng.aggregate(query, aggs={"x": {"kind": "count", "sampler": 0}})


def test_search_collapse_vs_oracle(eng, built_index):
    """ES field collapsing: best hit per domain (max float32 score,
    url-asc tie-break) then (score desc, url asc) top-k + offset —
    vs the oracle's unbounded-k scored hits."""
    import numpy as np

    oracle = built_index["oracle"]
    by_id = {d["doc_id"]: d for d in built_index["docs"]}
    query = "merge join table"
    hits = oracle.search(query, k=100_000)
    best: dict[str, tuple] = {}
    for h in hits:
        d = by_id[h["doc_id"]]
        key = (-np.float32(h["score"]), h["url"])
        if d["domain"] not in best or key < best[d["domain"]][0]:
            best[d["domain"]] = (key, h, d)
    ranked = sorted(best.values(), key=lambda x: x[0])
    assert len(ranked) > 6
    for k, offset in ((5, 0), (3, 2), (100, 0)):
        got = [(r["rank"], r["url"], r["domain"], r["title"],
                np.float32(r["score"]))
               for r in eng.search_collapse(query, k=k,
                                            offset=offset).collect()]
        exp = [(i + 1, h["url"], d["domain"], d["title"],
                np.float32(h["score"]))
               for i, (_, h, d) in enumerate(ranked)][offset:offset + k]
        assert got == exp, (k, offset)
    # one hit per domain, strictly
    rows = eng.search_collapse(query, k=100).collect()
    doms = [r["domain"] for r in rows]
    assert len(doms) == len(set(doms))
    with pytest.raises(ValueError, match="k must be"):
        eng.search_collapse(query, k=0)


def test_search_rescore_vs_oracle(eng, built_index):
    """ES rescore phase: window cut by primary (score desc, url asc),
    float32 weighted-sum re-rank, top-k — bitwise vs the oracle's
    unbounded-k scored hits for both queries."""
    import numpy as np

    oracle = built_index["oracle"]
    primary, secondary = "merge join table", "fn index"
    s1 = {h["url"]: np.float32(h["score"])
          for h in oracle.search(primary, k=100_000)}
    s2 = {h["url"]: np.float32(h["score"])
          for h in oracle.search(secondary, k=100_000)}
    assert s1.keys() & s2.keys(), "queries must overlap to rescore"
    meta = {d["url"]: d for d in built_index["docs"]}
    for window, w1, w2, k in ((10, 1.0, 2.0, 5), (25, 0.5, 1.5, 8)):
        win = sorted(s1.items(), key=lambda kv: (-kv[1], kv[0]))[:window]
        rescored = []
        for u, sc in win:
            tot = np.float32(
                np.float32(float(w1) * float(sc))
                + np.float32(float(w2) * float(s2.get(u, 0.0))))
            rescored.append((u, tot, sc))
        rescored.sort(key=lambda x: (-x[1], x[0]))
        exp = [(i + 1, u, meta[u]["domain"], meta[u]["title"],
                tot, sc) for i, (u, tot, sc) in enumerate(rescored[:k])]
        got = [(r["rank"], r["url"], r["domain"], r["title"],
                np.float32(r["score"]), np.float32(r["primary_score"]))
               for r in eng.search_rescore(
                   primary, secondary, window_size=window,
                   query_weight=w1, rescore_weight=w2, k=k).collect()]
        assert got == exp, (window, w1, w2, k)
    # the rescorer must actually move a rank somewhere in the params
    base = [r["url"] for r in eng.search_collapse(primary, k=1).collect()]
    assert base  # engine alive
    with pytest.raises(ValueError, match="window_size"):
        eng.search_rescore(primary, secondary, window_size=0)


def test_agg_cache_lifecycle(eng, built_index):
    """aggregate()'s two persisted frames (match-set + global) are
    dropped by the NEXT aggregate() call and by refresh() — no storage
    leak across request trees or generations."""
    q = "merge join table"
    eng.aggregate(q, aggs={"gc": {"kind": "count", "global": True},
                           "c": {"kind": "count"}})
    assert getattr(eng, "_agg_dm_cache") is not None
    g1 = getattr(eng, "_agg_gdm_cache")
    assert g1 is not None and g1.storageLevel.useMemory
    # a tree WITHOUT a global spec must drop the old global frame
    eng.aggregate(q, aggs={"c": {"kind": "count"}})
    assert getattr(eng, "_agg_gdm_cache", None) is None
    assert not g1.storageLevel.useMemory  # unpersisted
    eng.aggregate(q, aggs={"gc": {"kind": "count", "global": True}})
    assert getattr(eng, "_agg_gdm_cache") is not None
    eng.refresh()
    assert getattr(eng, "_agg_dm_cache", None) is None
    assert getattr(eng, "_agg_gdm_cache", None) is None
