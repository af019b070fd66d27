"""Seeded randomized end-to-end parity fuzz: random small corpora and
random query strings (with random filters/boosts/offsets) must be
rank- AND score-identical to the pure-Python oracle. Casts a wider net
than the fixed reference query set; deterministic seeds keep it stable."""

import hashlib
import random
import uuid

import numpy as np
import pytest

pyspark = pytest.importorskip("pyspark")

WORDS = ["fn", "import", "merge", "merged", "merging", "parse", "parser",
         "token", "tokens", "index", "search", "query", "the", "and", "i",
         "was", "naïve", "café", "stream", "block", "wand", "hash",
         "partition", "vector", "delta", "batch", "scan", "sort", "key",
         "order", "fast", "slow", "alpha", "beta", "gamma", "zeta"]


def _mk_docs(rng: random.Random, n: int):
    from spyglass_spark.corpus import SPYGLASS_NS, lastmodified_py, published_py

    docs = []
    for i in range(n):
        words = [rng.choice(WORDS) for _ in range(rng.randint(0, 60))]
        content = " ".join(words)
        url = f"repo://f{i % 5}/dir{i % 3}/file_{i}.rs@{'a' * 40}"
        docs.append(dict(
            doc_id=str(uuid.uuid5(SPYGLASS_NS, url)), url=url,
            domain=f"f{i % 5}", title=f"dir{i % 3}/file_{i}.rs",
            content=content, tags=[1 + i % 4, 10 + i % 2],
            content_sha256=hashlib.sha256(content.encode()).hexdigest(),
            published=published_py(url), lastmodified=lastmodified_py(url)))
    return docs


def _mk_query(rng: random.Random, docs):
    q = " ".join(rng.choice(WORDS) for _ in range(rng.randint(1, 5)))
    filters, boosts = [], []
    if rng.random() < 0.4:
        filters.append(("tag", rng.randint(1, 4)))
    if rng.random() < 0.3:
        mids = sorted(d["lastmodified"] for d in docs)
        filters.append(("lastmodified_ge", mids[len(mids) // 3]))
    if rng.random() < 0.3:
        boosts.append(("tag", rng.randint(1, 4)))
    if rng.random() < 0.25:
        seed = rng.choice(docs)
        boosts.append(("docid", seed["doc_id"], round(rng.uniform(0.0, 3.0), 3)))
    # favorite shapes: score-only Should-extra and scoring Must — both
    # WAND-eligible since round 5, so the fuzz must hit them
    if rng.random() < 0.25:
        filters.append(("favorite", rng.randint(1, 4)))
    if rng.random() < 0.2:
        filters.append(("favorite_required", rng.randint(1, 4)))
    offset = rng.choice([0, 0, 0, 2])
    return q, filters, boosts, offset


def _mk_parsed(rng: random.Random) -> str:
    """Random query-string grammar composition (query/parser.py): bare
    words, +/- occurs, field restriction, quoted phrases with slop,
    boosts, dictionary ranges."""
    parts = []
    for _ in range(rng.randint(1, 4)):
        r = rng.random()
        occ = rng.choice(["", "", "", "+", "-"])
        if r < 0.18:
            a = rng.choice(WORDS)[: rng.randint(1, 4)]
            b = rng.choice(WORDS)[: rng.randint(1, 4)]
            lo, hi = sorted([a, b])
            lb, rb = rng.choice(["[", "{"]), rng.choice(["]", "}"])
            parts.append(f"{occ}content:{lb}{lo} TO {hi}{rb}")
        elif r < 0.38:
            ph = " ".join(rng.choice(WORDS) for _ in range(rng.randint(2, 3)))
            parts.append(f'{occ}"{ph}"' + rng.choice(["", "~1", "~2"]))
        elif r < 0.52:
            parts.append(f"{occ}title:{rng.choice(WORDS)}")
        elif r < 0.68:
            parts.append(
                f"{occ}{rng.choice(WORDS)}^{round(rng.uniform(0.5, 3.0), 1)}")
        else:
            parts.append(occ + rng.choice(WORDS))
    return " ".join(parts)


@pytest.mark.parametrize("seed", [101, 202, 303])
def test_randomized_rank_identity(spark, tmp_path, seed):
    from spyglass_spark.index.builder import build_index
    from spyglass_spark.oracle.engine import OracleIndex
    from spyglass_spark.query.executor import SearchEngine

    rng = random.Random(seed)
    docs = _mk_docs(rng, rng.randint(40, 90))
    P = rng.choice([2, 4, 8])
    idx = str(tmp_path / f"fz{seed}")
    build_index(spark, spark.createDataFrame(docs), idx, num_partitions=P,
                waves=rng.choice([1, 2]))
    oracle = OracleIndex.build(docs, num_partitions=P)
    eng = SearchEngine(spark, idx)

    cases = [_mk_query(rng, docs) for _ in range(8)]
    # combiner axis: ~40% of cases run as DisjunctionMaxQuery with a
    # random tie_breaker — same mixed batch, same oracle-bitwise bar
    combs = [("dismax", round(rng.uniform(0.0, 1.0), 3))
             if rng.random() < 0.4 else ("sum", 0.0) for _ in cases]
    # minimum_should_match axis: ~30% of cases gate on 2-4 DISTINCT
    # matching Should clauses (composes with the combiner axis; msm >= 2
    # rides the exhaustive path — the auto == exhaustive bar is test_msm)
    msms = [rng.choice([2, 3, 4]) if rng.random() < 0.3 else 0
            for _ in cases]
    batch = [{"query": q, "filters": f, "boosts": b,
              "combiner": c, "tie_breaker": t, "min_should_match": m}
             for (q, f, b, _), (c, t), m in zip(cases, combs, msms)]
    res = eng.search_many(batch, k=7).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append(r)
    nonempty = 0
    for qi, (q, f, b, _off) in enumerate(cases):
        got = sorted(by_q.get(qi, []), key=lambda r: r["rank"])
        c, t = combs[qi]
        exp = oracle.search(q, f, b, k=7, combiner=c, tie_breaker=t,
                            min_should_match=msms[qi])
        assert [r["doc_id"] for r in got] == [h["doc_id"] for h in exp], \
            (seed, q, f, b, c, t, msms[qi])
        for r, h in zip(got, exp):
            assert np.isclose(np.float32(r["score"]), np.float32(h["score"]),
                              rtol=1e-5), (seed, q, c, t, r["score"], h["score"])
        nonempty += bool(exp)
    assert nonempty >= 3  # the fuzz must actually exercise matches

    # offset pagination on one non-trivial query
    for q, f, b, off in cases:
        exp = oracle.search(q, f, b, k=5, offset=off)
        if off and exp:
            got = eng.search(q, filters=f, boosts=b, k=5, offset=off).collect()
            assert [r["doc_id"] for r in got] == [h["doc_id"] for h in exp]
            break

    # cursor paging: k=3 search_after pages must walk the oracle's FULL
    # ranking (random filters/boosts, random P — the tie-heavy shapes)
    for q, f, b, _off in cases:
        exp = oracle.search(q, f, b, k=500)
        if len(exp) < 4:
            continue
        walked, cur = [], None
        for _ in range(len(exp) + 2):
            page = sorted(eng.search(q, filters=f, boosts=b, k=3,
                                     search_after=cur).collect(),
                          key=lambda r: r["rank"])
            if not page:
                break
            walked.extend(page)
            cur = (float(page[-1]["score"]), int(page[-1]["doc_ord"]))
        assert [r["doc_id"] for r in walked] == [h["doc_id"] for h in exp], \
            (seed, q, f, b)
        break

    # wildcard/regex pattern queries hold the same rank-identity bar:
    # random patterns derived from corpus words (prefix-star, single-?,
    # leading-star) vs the oracle's independent fnmatch enumeration
    for _ in range(4):
        w = rng.choice(WORDS)
        form = rng.randrange(3)
        if form == 0:
            pat = w[: max(1, len(w) // 2)] + "*"
        elif form == 1 and len(w) >= 2:
            i = rng.randrange(len(w))
            pat = w[:i] + "?" + w[i + 1:]
        else:
            pat = "*" + w[-max(1, len(w) // 2):]
        got = eng.search_wildcard(pat, k=6).collect()
        exp = oracle.search_wildcard(pat, k=6)
        assert [r["doc_id"] for r in got] == \
            [h["doc_id"] for h in exp], (seed, pat)
        for r, h in zip(got, exp):
            assert np.isclose(np.float32(r["score"]), np.float32(h["score"]),
                              rtol=1e-5), (seed, pat)
    # regex: alternation (prune-defeat) and a pruned literal+class form
    w1, w2 = rng.choice(WORDS), rng.choice(WORDS)
    for pat in (f"({w1}|{w2})", f"{w1[:2]}[a-z]*"):
        got = eng.search_regex(pat, k=6).collect()
        exp = oracle.search_regex(pat, k=6)
        assert [r["doc_id"] for r in got] == \
            [h["doc_id"] for h in exp], (seed, pat)

    # term-range: random bounds from corpus-word fragments with random
    # include flags / a random unbounded side — the engine's pyarrow
    # byte-range read (no post-filter) vs the oracle's plain-Python
    # comparison enumeration
    for _ in range(3):
        wa, wb = rng.choice(WORDS), rng.choice(WORDS)
        lo = wa[: rng.randrange(1, len(wa) + 1)]
        hi = wb[: rng.randrange(1, len(wb) + 1)]
        if lo > hi:
            lo, hi = hi, lo
        if rng.randrange(4) == 0:
            lo = None
        elif rng.randrange(4) == 0:
            hi = None
        ilo, ihi = rng.randrange(2) == 0, rng.randrange(2) == 0
        got = eng.search_term_range(lo, hi, include_lower=ilo,
                                    include_upper=ihi, k=6).collect()
        exp = oracle.search_term_range(lo, hi, include_lower=ilo,
                                       include_upper=ihi, k=6)
        assert [r["doc_id"] for r in got] == \
            [h["doc_id"] for h in exp], (seed, lo, hi, ilo, ihi)
        for r, h in zip(got, exp):
            assert np.isclose(np.float32(r["score"]), np.float32(h["score"]),
                              rtol=1e-5), (seed, lo, hi)

    # term-set: a random subset of corpus words plus guaranteed-absent
    # terms — the engine's pyarrow IN-list read vs the oracle's
    # membership enumeration
    ts = rng.sample(WORDS, k=min(len(WORDS), rng.randrange(1, 5)))
    ts += ["zzabsent" + str(rng.randrange(10))] * rng.randrange(2)
    got = eng.search_term_set(ts, k=6).collect()
    exp = oracle.search_term_set(ts, k=6)
    assert [r["doc_id"] for r in got] == \
        [h["doc_id"] for h in exp], (seed, ts)
    for r, h in zip(got, exp):
        assert np.isclose(np.float32(r["score"]), np.float32(h["score"]),
                          rtol=1e-5), (seed, ts)

    # parsed query strings: random grammar compositions (occurs, field
    # restriction, phrases+slop, boosts, dictionary ranges) — the
    # engine's pyarrow range expansion + distributed kernel vs the
    # oracle twin's enumeration + scalar kernel
    for _ in range(3):
        qs = _mk_parsed(rng)
        got = sorted(eng.search_parsed(qs, k=6).collect(),
                     key=lambda r: r["rank"])
        exp = oracle.search_parsed(qs, k=6)
        assert [r["doc_id"] for r in got] == \
            [h["doc_id"] for h in exp], (seed, qs)
        for r, h in zip(got, exp):
            assert np.isclose(np.float32(r["score"]), np.float32(h["score"]),
                              rtol=1e-5), (seed, qs)

    # phrase-prefix: random fixed word + prefix of a second word,
    # sometimes with a stopword between (position-hole shape); engine
    # range-scan expansion + distributed phrase kernel vs the oracle's
    # brute-force enumeration + scalar kernel
    for _ in range(3):
        wa, wb = rng.choice(WORDS), rng.choice(WORDS)
        mid = rng.choice(["", "the ", "of "])
        q = f"{wa} {mid}{wb[: max(1, len(wb) // 2)]}"
        got = eng.search_phrase_prefix(q, k=6).collect()
        exp = oracle.search_phrase_prefix(q, k=6)
        assert [r["doc_id"] for r in got] == \
            [h["doc_id"] for h in exp], (seed, q)
        for r, h in zip(got, exp):
            assert np.isclose(np.float32(r["score"]), np.float32(h["score"]),
                              rtol=1e-5), (seed, q)

    # fuzzy: a random single edit (substitute/delete/insert) applied to
    # a corpus word, at random distance 1-2 — the dictionary-slice
    # verify path (no SymSpell sidecar on a fresh random build) vs the
    # oracle's brute Levenshtein enumeration over its own dictionary
    for _ in range(3):
        w = rng.choice(WORDS)
        i = rng.randrange(len(w))
        form = rng.randrange(3)
        if form == 0:
            t = w[:i] + rng.choice("abkz") + w[i + 1:]
        elif form == 1 and len(w) >= 2:
            t = w[:i] + w[i + 1:]
        else:
            t = w[:i] + rng.choice("abkz") + w[i:]
        d = rng.choice([1, 2])
        got = eng.search_fuzzy(t, distance=d, k=6).collect()
        exp = oracle.search_fuzzy(t, distance=d, k=6)
        assert [r["doc_id"] for r in got] == \
            [h["doc_id"] for h in exp], (seed, t, d)
        for r, h in zip(got, exp):
            assert np.isclose(np.float32(r["score"]), np.float32(h["score"]),
                              rtol=1e-5), (seed, t, d)

    # suggest: random misspellings (same edit forms as fuzzy) at random
    # distance/mode — the engine's dictionary-slice + banded-Levenshtein
    # read vs the oracle twin's brute enumeration, incl. the ranked
    # (dist, -df, term) order the limit cap makes load-bearing
    for _ in range(3):
        w = rng.choice(WORDS)
        i = rng.randrange(len(w))
        form = rng.randrange(3)
        if form == 0:
            t = w[:i] + rng.choice("abkz") + w[i + 1:]
        elif form == 1 and len(w) >= 2:
            t = w[:i] + w[i + 1:]
        else:
            t = w  # in-dictionary input: grades the popular floor/missing
        d = rng.choice([1, 2])
        mode = rng.choice(["missing", "popular", "always"])
        fld = rng.choice(["content", "title"])
        got = eng.suggest(t, field=fld, distance=d, limit=4, mode=mode)
        exp = oracle.suggest(t, field=fld, distance=d, limit=4, mode=mode)
        assert got == exp, (seed, t, fld, d, mode)

    # every random corpus/P/waves build must pass the integrity audit
    from spyglass_spark.index.fsck import fsck

    rep = fsck(spark, idx).collect()
    assert rep and all(r["violations"] == 0 and r["stats_mismatches"] == 0
                       for r in rep), (seed, [r.asDict() for r in rep])


@pytest.mark.parametrize("seed", [606])
def test_randomized_aggregation_parity(spark, tmp_path, seed):
    """Random corpora × random match sets: every aggregation kind must
    agree with a pandas/python brute-force computed over the ORACLE's
    match set (oracle.search at unbounded k — the score>0 set, which
    _match_doc_meta's union∩Musts−MustNots reproduces without scoring).
    Generalizes test_facets' fixed-corpus brute-force comparisons to
    random data shapes, random filters, and random agg parameters; the
    soak runner replays this body across many fresh seeds."""
    from collections import Counter, defaultdict

    from spyglass_spark.index.builder import build_index
    from spyglass_spark.oracle.engine import OracleIndex
    from spyglass_spark.query.compiler import compile_query
    from spyglass_spark.query.executor import SearchEngine
    from spyglass_spark.query.percentile import exact_percentiles

    rng = random.Random(seed)
    docs = _mk_docs(rng, rng.randint(50, 90))
    P = rng.choice([2, 4, 8])
    idx = str(tmp_path / f"ag{seed}")
    build_index(spark, spark.createDataFrame(docs), idx, num_partitions=P,
                waves=rng.choice([1, 2]))
    oracle = OracleIndex.build(docs, num_partitions=P)
    eng = SearchEngine(spark, idx)
    by_id = {d["doc_id"]: d for d in docs}
    svals = sorted(d["lastmodified"] for d in docs)

    checked = 0
    for _ in range(20):
        if checked >= 3:
            break
        q = " ".join(rng.choice(WORDS) for _ in range(rng.randint(1, 3)))
        filters = []
        if rng.random() < 0.5:
            filters.append(("tag", rng.randint(1, 4)))
        if rng.random() < 0.3:
            filters.append(("lastmodified_ge", svals[len(svals) // 3]))
        if not compile_query(q, filters, ()).should_group:
            continue  # all-stopword query: aggregations need a Should
        exp_hits = oracle.search(q, filters, (), k=100_000)
        if len(exp_hits) < 2:
            continue
        checked += 1
        matched = [by_id[h["doc_id"]] for h in exp_hits]
        vals = [d["lastmodified"] for d in matched]

        # facet counts (tags explode): count desc, key asc — total order
        cnt = Counter(t for d in matched for t in d["tags"])
        exp_fc = sorted(cnt.items(), key=lambda x: (-x[1], x[0]))
        got_fc = [(r["tag_id"], r["n"])
                  for r in eng.facet_counts(q, filters).collect()]
        assert got_fc == exp_fc, (seed, q, filters)

        # size-limited terms bucket + sum_other_doc_count
        size = rng.randint(1, 4)
        kept = exp_fc[:size]
        other = sum(cnt.values()) - sum(n for _, n in kept)
        got_t = [(r["tag_id"], r["doc_count"], r["sum_other_doc_count"])
                 for r in eng.terms_agg(q, filters, size=size).collect()]
        assert got_t == [(t, n, other) for t, n in kept], (seed, q, size)

        # date histogram: occupied-only AND gap-filled, random interval
        interval = rng.choice([1, 7, 30]) * 86_400_000_000
        bc = Counter((v // interval) * interval for v in vals)
        got_h = [(r["bucket"], r["n"]) for r in eng.date_histogram(
            q, filters, interval_us=interval).collect()]
        assert got_h == sorted(bc.items()), (seed, q, interval)
        lo, hi = min(bc), max(bc)
        exp_gf = [(b, bc.get(b, 0)) for b in range(lo, hi + interval,
                                                   interval)]
        got_gf = [(r["bucket"], r["n"]) for r in eng.date_histogram(
            q, filters, interval_us=interval, min_doc_count=0).collect()]
        assert got_gf == exp_gf, (seed, q, interval)

        # generic histogram: random offset + optional hard/extended
        # bounds vs the same floor-mod brute force (the remaining
        # tantivy HistogramAggregation knobs)
        off = rng.randrange(interval)
        hkey = lambda v: v - ((v - off) % interval)  # noqa: E731
        hb = None
        hvals = vals
        if rng.random() < 0.5 and len(set(vals)) >= 2:
            lo_v, hi_v = sorted(rng.sample(sorted(set(vals)), 2))
            hb, hvals = (lo_v, hi_v), [v for v in vals
                                       if lo_v <= v <= hi_v]
        hc = Counter(hkey(v) for v in hvals)
        got_hh = [(r["bucket"], r["n"]) for r in eng.histogram(
            q, filters, interval=interval, offset=off,
            hard_bounds=hb).collect()]
        assert got_hh == sorted(hc.items()), (seed, q, interval, off, hb)
        if hc:
            # widen where the bounds allow: ext must stay inside hb
            ext = hb if hb else (min(hvals) - 2 * interval,
                                 max(hvals) + interval)
            glo = min(hkey(ext[0]), min(hc))
            ghi = max(hkey(ext[1]), max(hc))
            exp_hg = [(b, hc.get(b, 0))
                      for b in range(glo, ghi + interval, interval)]
            got_hg = [(r["bucket"], r["n"]) for r in eng.histogram(
                q, filters, interval=interval, offset=off, hard_bounds=hb,
                extended_bounds=ext, min_doc_count=0).collect()]
            assert got_hg == exp_hg, (seed, q, interval, off, hb, ext)

        # pipeline aggs over the gap-filled weekly histogram: running
        # total + first-bucket-omitted difference, integer-exact
        ptree = eng.aggregate(q, filters, aggs={
            "w": {"kind": "date_histogram", "interval_us": interval,
                  "min_doc_count": 0},
            "c": {"kind": "cumulative_sum", "buckets_path": "w"},
            "d": {"kind": "derivative", "buckets_path": "w>n"}})
        run, exp_c = 0, []
        for b, nv in exp_gf:
            run += nv
            exp_c.append((b, run))
        assert [(r["bucket"], r["value"])
                for r in ptree["c"].collect()] == exp_c, (seed, q)
        assert [(r["bucket"], r["value"])
                for r in ptree["d"].collect()] == \
            [(exp_gf[i][0], exp_gf[i][1] - exp_gf[i - 1][1])
             for i in range(1, len(exp_gf))], (seed, q)
        gf_ns = [nv for _, nv in exp_gf]
        ptree2 = eng.aggregate(q, filters, aggs={
            "w": {"kind": "date_histogram", "interval_us": interval,
                  "min_doc_count": 0},
            "sb": {"kind": "stats_bucket", "buckets_path": "w"},
            "mx": {"kind": "max_bucket", "buckets_path": "w>n"}})
        sb = ptree2["sb"].collect()[0]
        assert (sb["count"], sb["min"], sb["max"], sb["sum"], sb["avg"]) \
            == (len(gf_ns), min(gf_ns), max(gf_ns), sum(gf_ns),
                float(sum(gf_ns)) / len(gf_ns)), (seed, q)
        mxr = ptree2["mx"].collect()[0]
        assert mxr["value"] == max(gf_ns) and mxr["keys"] == ",".join(
            str(b) for b, nv in exp_gf if nv == max(gf_ns)), (seed, q)

        # extended pipeline kinds, randomized knobs: lag-k serial_diff,
        # moving mean (ES shift-0 window excludes the current bucket),
        # script arithmetic, selector cut + deterministic sorted page
        lag = rng.randint(1, 3)
        win = rng.randint(1, 4)
        ptree3 = eng.aggregate(q, filters, aggs={
            "w": {"kind": "date_histogram", "interval_us": interval,
                  "min_doc_count": 0},
            "sd": {"kind": "serial_diff", "buckets_path": "w", "lag": lag},
            "mv": {"kind": "moving_fn", "buckets_path": "w", "window": win},
            "bs": {"kind": "bucket_script", "buckets_path": "w",
                   "script": "n * 2 + 1"},
            "sel": {"kind": "bucket_selector", "buckets_path": "w",
                    "script": "n >= 1"},
            "pg": {"kind": "bucket_sort", "buckets_path": "sel",
                   "sort": [["n", "desc"]], "size": 3}})
        assert [(r["bucket"], r["value"]) for r in ptree3["sd"].collect()] \
            == [(exp_gf[i][0], exp_gf[i][1] - exp_gf[i - lag][1])
                for i in range(lag, len(exp_gf))], (seed, q, lag)
        exp_mv = []
        for i in range(len(exp_gf)):
            f = gf_ns[max(0, i - win):i]
            if f:
                exp_mv.append((exp_gf[i][0], float(sum(f)) / len(f)))
        assert [(r["bucket"], r["value"]) for r in ptree3["mv"].collect()] \
            == exp_mv, (seed, q, win)
        assert [(r["bucket"], r["value"]) for r in ptree3["bs"].collect()] \
            == [(b, float(nv * 2 + 1)) for b, nv in exp_gf], (seed, q)
        kept = [(b, nv) for b, nv in exp_gf if nv >= 1]
        assert sorted((r["bucket"], r["n"])
                      for r in ptree3["sel"].collect()) == kept, (seed, q)
        assert [(r["bucket"], r["n"]) for r in ptree3["pg"].collect()] == \
            sorted(kept, key=lambda x: (-x[1], x[0]))[:3], (seed, q)

        # nested stats under histogram buckets: per-bucket exact sum,
        # one double division, NULL-stats split (doc_count vs n)
        hbuckets = defaultdict(list)
        for d in matched:
            if d.get("lastmodified") is not None:
                hbuckets[hkey(d["lastmodified"])].append(d.get("published"))
        exp_hs = []
        for b in sorted(hbuckets):
            pv = [v for v in hbuckets[b] if v is not None]
            exp_hs.append((b, len(hbuckets[b]), len(pv),
                           min(pv) if pv else None, max(pv) if pv else None,
                           sum(pv) if pv else None,
                           float(sum(pv)) / len(pv) if pv else None))
        got_hs = [(r["bucket"], r["doc_count"], r["n"], r["min"],
                   r["max"], r["sum"], r["avg"])
                  for r in eng.histogram_stats(
                      q, filters, interval=interval, offset=off,
                      stats_col="published").collect()]
        assert got_hs == exp_hs, (seed, q, interval, off)

        # stats: exact decimal sum, ONE double division (bitwise pin)
        r = eng.field_stats(q, filters, col="lastmodified").collect()[0]
        assert (r["n"], r["min"], r["max"], r["sum"]) == \
            (len(vals), min(vals), max(vals), sum(vals)), (seed, q)
        assert r["avg"] == float(sum(vals)) / len(vals), (seed, q)

        # percentiles: engine ≡ the pinned scalar interpolation bitwise
        pcts = sorted(rng.sample([1.0, 5.0, 25.0, 50.0, 75.0, 95.0, 99.0],
                                 rng.randint(2, 4)))
        got_p = [(row["pct"], row["value"]) for row in eng.percentiles(
            q, filters, col="lastmodified", percents=pcts).collect()]
        assert got_p == exact_percentiles(vals, pcts), (seed, q, pcts)

        # significant terms: JLH over random corpora — full ranked list
        # bitwise vs the scalar-analyzer recount (fg distinct per doc,
        # bg = every doc, clamp at fgPct <= bgPct)
        from spyglass_spark.analysis.analyzer import tokenize_en as _ten
        fg_c: dict = {}
        bg_c: dict = {}
        mids = {h["doc_id"] for h in exp_hits}
        for d in docs:
            ts = {t for _, t in _ten(d["content"] or "")}
            for t in ts:
                bg_c[t] = bg_c.get(t, 0) + 1
            if d["doc_id"] in mids:
                for t in ts:
                    fg_c[t] = fg_c.get(t, 0) + 1
        fgT, bgT = float(len(mids)), float(len(docs))
        exp_sig = sorted(
            ((t, c, bg_c[t],
              ((c / fgT - bg_c[t] / bgT) * ((c / fgT) / (bg_c[t] / bgT))
               if c / fgT > bg_c[t] / bgT else 0.0))
             for t, c in fg_c.items() if c >= 1),
            key=lambda x: (-x[3], x[0]))
        got_sig = [(r["term"], r["fg"], r["bg"], r["score"])
                   for r in eng.significant_terms(
                       q, filters, size=100_000,
                       min_doc_count=1).collect()]
        assert got_sig == exp_sig, (seed, q, filters)

        # percentile ranks: the inverse interpolation, bitwise — probes
        # mix exact data values, a random midpoint, and both clamps
        from spyglass_spark.query.percentile import exact_percentile_ranks
        probes = [rng.choice(vals), min(vals) - 1, max(vals) + 1,
                  rng.uniform(min(vals), max(vals))]
        got_pr = [(row["value"], row["pct"]) for row in eng.percentile_ranks(
            q, filters, col="lastmodified", values=probes).collect()]
        assert got_pr == exact_percentile_ranks(vals, probes), \
            (seed, q, probes)

        # range buckets: overlap + unbounded sides + an empty bucket
        a, b = svals[len(svals) // 5], svals[len(svals) // 2]
        c = svals[(4 * len(svals)) // 5]
        ranges = [("lo", None, b), ("mid", a, c), ("hi", b, None),
                  ("empty", 0, 1)]
        exp_r = [(k, lo_, hi_, sum(1 for v in vals
                                   if (lo_ is None or v >= lo_)
                                   and (hi_ is None or v < hi_)))
                 for k, lo_, hi_ in ranges]
        got_r = [(row["range_key"], row["lo"], row["hi"], row["n"])
                 for row in eng.range_agg(q, filters,
                                          ranges=ranges).collect()]
        assert got_r == exp_r, (seed, q)

        # cardinality: flat + nested under the tags bucket
        assert eng.cardinality(q, filters).collect()[0]["n_distinct"] == \
            len({d["domain"] for d in matched}), (seed, q)
        doms = defaultdict(set)
        for d in matched:
            for t in d["tags"]:
                doms[t].add(d["domain"])
        exp_n = sorted(((t, cnt[t], len(doms[t])) for t in cnt),
                       key=lambda x: (-x[1], x[0]))
        got_n = [(row["tag_id"], row["doc_count"], row["n_distinct"])
                 for row in eng.cardinality(q, filters,
                                            facet_col="tags").collect()]
        assert got_n == exp_n, (seed, q)

        # ES filters buckets: random OVERLAPPING predicate set over
        # domain/date/tag + a never-matching bucket (n=0 kept) + the
        # _other_ bucket, vs scalar predicate evaluation
        fdom = rng.choice(sorted({d["domain"] for d in matched}))
        fcut = rng.choice(svals)
        ftag = rng.randint(1, 4)
        fspecs = {
            "dom": (("domain", "eq", fdom),),
            "older": (("lastmodified", "lt", fcut),),
            "dom_old": (("domain", "eq", fdom),
                        ("lastmodified", "lt", fcut)),
            "tagged": (("tags", "contains", ftag),),
            "never": (("domain", "eq", "zz-no-such"),),
        }

        def _fhit(d, conds):
            for col, op, v in conds:
                x = d.get(col)
                if x is None:
                    return False
                if op == "eq" and x != v:
                    return False
                if op == "lt" and not x < v:
                    return False
                if op == "contains" and v not in x:
                    return False
            return True

        exp_f = [(k, sum(1 for d in matched if _fhit(d, cs)))
                 for k, cs in fspecs.items()]
        exp_f.append(("_other_", sum(
            1 for d in matched
            if not any(_fhit(d, cs) for cs in fspecs.values()))))
        got_f = [(row["filter_key"], row["n"]) for row in eng.filters_agg(
            q, filters, specs=fspecs, other_bucket=True).collect()]
        assert got_f == exp_f, (seed, q, fdom, fcut, ftag)

        # rare_terms: the exact long tail at a random cap — the mirror
        # of the terms_agg head, (count asc, key asc)
        mdc = rng.randint(1, max(cnt.values()))
        exp_rare = sorted((n, t) for t, n in cnt.items() if n <= mdc)
        got_rare = [(row["doc_count"], row["tag_id"])
                    for row in eng.rare_terms(q, filters,
                                              max_doc_count=mdc).collect()]
        assert got_rare == exp_rare, (seed, q, mdc)

        # composite: a FULL pagination walk at a random page size must
        # concatenate to the brute key-tuple order, each bucket exactly
        # once (total order ⇒ the cursor never skips or repeats)
        comp_src = ({"name": "dom", "col": "domain"},
                    {"name": "bkt", "col": "lastmodified",
                     "kind": "histogram", "interval": interval})
        ckc = Counter((d["domain"], (d["lastmodified"] // interval)
                       * interval) for d in matched)
        exp_comp = [(k[0], k[1], nv) for k, nv in sorted(ckc.items())]
        psz = rng.randint(1, 4)
        walk, aft = [], None
        while True:
            page = eng.composite_agg(q, filters, sources=comp_src,
                                     size=psz, after=aft).collect()
            if not page:
                break
            walk += [(row["dom"], row["bkt"], row["doc_count"])
                     for row in page]
            aft = (page[-1]["dom"], page[-1]["bkt"])
        assert walk == exp_comp, (seed, q, psz)

        # ES metric completions, bitwise vs scalar brute force
        from spyglass_spark.query.percentile import exact_percentile
        assert eng.missing_count(q, filters, col="description") \
            .collect()[0]["n"] == len(matched), (seed, q)
        assert eng.value_count(q, filters, col="tags") \
            .collect()[0]["n"] == sum(len(d["tags"]) for d in matched), \
            (seed, q)
        both = [(d["lastmodified"], d["published"]) for d in matched
                if d["lastmodified"] is not None
                and d["published"] is not None]
        wr = eng.weighted_avg(q, filters).collect()[0]
        assert wr["n"] == len(both), (seed, q)
        if both:
            assert wr["value"] == (
                float(sum(v * w for v, w in both))
                / float(sum(w for _, w in both))), (seed, q)
        fv = sorted(float(v) for v in vals)
        med = exact_percentile(fv, 0.5)
        devs = sorted(abs(v - med) for v in fv)
        mr = eng.median_absolute_deviation(q, filters).collect()[0]
        assert (mr["n"], mr["mad"]) == \
            (len(devs), exact_percentile(devs, 0.5)), (seed, q)
        bq1 = exact_percentile(fv, 0.25)
        bq3 = exact_percentile(fv, 0.75)
        blf, buf = bq1 - 1.5 * (bq3 - bq1), bq3 + 1.5 * (bq3 - bq1)
        br = eng.boxplot(q, filters).collect()[0]
        assert (br["n"], br["min"], br["max"], br["q1"], br["q2"],
                br["q3"], br["lower"], br["upper"]) == \
            (len(fv), fv[0], fv[-1], bq1, exact_percentile(fv, 0.5), bq3,
             min(v for v in fv if v >= blf),
             max(v for v in fv if v <= buf)), (seed, q)

        # multi_terms at a random size: tuple buckets + other count
        msz = rng.randint(1, 5)
        mtc = Counter((d["domain"], t) for d in matched
                      for t in d["tags"])
        mranked = sorted(mtc.items(), key=lambda kv: (-kv[1], kv[0]))
        mother = sum(mtc.values()) - sum(n for _, n in mranked[:msz])
        got_mt = [((r["domain"], r["tags"]), r["doc_count"],
                   r["sum_other_doc_count"])
                  for r in eng.multi_terms(q, filters,
                                           size=msz).collect()]
        assert got_mt == [(k, n, mother) for k, n in mranked[:msz]], \
            (seed, q, msz)

        # adjacency_matrix from the SAME random filter specs: singleton
        # + request-order '&' pairs, non-empty only
        expa: Counter = Counter()
        for d in matched:
            on = [k for k in fspecs if _fhit(d, fspecs[k])]
            for i, a in enumerate(on):
                expa[a] += 1
                for b in on[i + 1:]:
                    expa[a + "&" + b] += 1
        got_a = {row["filter_key"]: row["n"] for row in
                 eng.adjacency_matrix(q, filters,
                                      specs=fspecs).collect()}
        assert got_a == {k: n for k, n in expa.items() if n > 0}, \
            (seed, q)

        # auto_date_histogram at a random budget: rung choice + grid
        from spyglass_spark.query.executor import SearchEngine as _SE
        tb = rng.choice([3, 8, 25])
        st = next((s for s in _SE.AUTO_HIST_LADDER
                   if max(vals) // s - min(vals) // s + 1 <= tb),
                  _SE.AUTO_HIST_LADDER[-1])
        bca = Counter((v // st) * st for v in vals)
        got_ah = [(row["bucket"], row["n"], row["interval_us"])
                  for row in eng.auto_date_histogram(
                      q, filters, target_buckets=tb).collect()]
        assert got_ah == [(b, bca.get(b, 0), st)
                          for b in range(min(bca), max(bca) + st, st)], \
            (seed, q, tb)

        # string_stats over title: lengths bitwise, entropy tolerance
        # (platform log2 ulp)
        import math as _math
        st_r = eng.string_stats(q, filters, col="title").collect()[0]
        st_lens = [len(d["title"]) for d in matched]
        assert (st_r["count"], st_r["min_length"], st_r["max_length"]) \
            == (len(st_lens), min(st_lens), max(st_lens)), (seed, q)
        assert st_r["avg_length"] == \
            float(sum(st_lens)) / len(st_lens), (seed, q)
        scc = Counter(ch for d in matched for ch in d["title"])
        stot = sum(scc.values())
        exp_e = -sum((nv / stot) * _math.log2(nv / stot)
                     for _, nv in sorted(scc.items()))
        assert abs(st_r["entropy"] - exp_e) <= \
            1e-12 * max(1.0, exp_e), (seed, q)

        # sampler knob at a random k: the sub-agg frame is exactly the
        # k smallest doc_ords (the ES sampler analog's total order)
        from spyglass_spark.index.builder import part_id_py
        parts_m: dict = {}
        for d in docs:
            parts_m.setdefault(part_id_py(d["url"], P), []).append(d["url"])
        omap = {}
        for pid, urls in parts_m.items():
            for rank, u in enumerate(sorted(urls)):
                omap[u] = (pid << 40) | rank
        sk = rng.randint(1, len(matched))
        s_docs = [d for _, d in sorted(
            (omap[d["url"]], d) for d in matched)[:sk]]
        s_out = eng.aggregate(q, filters, aggs={
            "sf": {"kind": "facets", "sampler": sk}})
        s_cnt = Counter(t for d in s_docs for t in d["tags"])
        assert [(row["tag_id"], row["n"]) for row in
                s_out["sf"].collect()] == \
            sorted(s_cnt.items(), key=lambda kv: (-kv[1], kv[0])), \
            (seed, q, sk)

        # field collapsing at a random k: per-domain float32 argmax
        # ((-score, url) key) then (score desc, url asc) page
        best_c: dict = {}
        for h in exp_hits:
            dd = by_id[h["doc_id"]]
            ckey2 = (-np.float32(h["score"]), h["url"])
            if dd["domain"] not in best_c or ckey2 < best_c[dd["domain"]][0]:
                best_c[dd["domain"]] = (ckey2, h, dd)
        rankedc = sorted(best_c.values(), key=lambda x: x[0])
        kx = rng.randint(1, len(rankedc))
        got_c = [(row["rank"], row["url"], row["domain"],
                  np.float32(row["score"]))
                 for row in eng.search_collapse(q, filters,
                                                k=kx).collect()]
        assert got_c == [(i + 1, h["url"], dd["domain"],
                          np.float32(h["score"]))
                         for i, (_, h, dd) in enumerate(rankedc[:kx])], \
            (seed, q, kx)

        # rescore at random window/weights: float32 weighted-sum
        # re-rank of the primary window, bitwise
        q2 = " ".join(rng.choice(WORDS) for _ in range(2))
        if compile_query(q2, (), ()).should_group:
            s2m = {h["url"]: np.float32(h["score"])
                   for h in oracle.search(q2, k=100_000)}
            wsz = rng.randint(2, max(3, len(exp_hits)))
            w1 = round(rng.uniform(0.1, 2.0), 3)
            w2 = round(rng.uniform(0.1, 3.0), 3)
            s1s = sorted(((np.float32(h["score"]), h["url"])
                          for h in exp_hits),
                         key=lambda x: (-x[0], x[1]))[:wsz]
            resc = []
            for sc, u in s1s:
                tot = np.float32(
                    np.float32(w1 * float(sc))
                    + np.float32(w2 * float(s2m.get(u, 0.0))))
                resc.append((u, tot, sc))
            resc.sort(key=lambda x: (-x[1], x[0]))
            kk = rng.randint(1, wsz)
            got_r = [(row["rank"], row["url"], np.float32(row["score"]),
                      np.float32(row["primary_score"]))
                     for row in eng.search_rescore(
                         q, q2, filters=filters, window_size=wsz,
                         query_weight=w1, rescore_weight=w2,
                         k=kk).collect()]
            assert got_r == [(i + 1, u, t, sc) for i, (u, t, sc)
                             in enumerate(resc[:kk])], \
                (seed, q, q2, wsz, w1, w2, kk)

        # global bucket: the sub-agg sees the whole live index while
        # its sibling stays match-set scoped
        gout = eng.aggregate(q, filters, aggs={
            "gc": {"kind": "count", "global": True},
            "c": {"kind": "count"}})
        assert gout["gc"].collect()[0]["n"] == len(docs), (seed, q)
        assert gout["c"].collect()[0]["n"] == len(matched), (seed, q)

        # one aggregate() request tree must serve the SAME answers from
        # its single cached match-set pass as the standalone methods
        tree = eng.aggregate(q, filters, aggs={
            "f": {"kind": "facets"},
            "s": {"kind": "stats", "col": "lastmodified"},
            "r": {"kind": "range", "col": "lastmodified",
                  "ranges": ranges}})
        assert [(row["tag_id"], row["n"])
                for row in tree["f"].collect()] == exp_fc, (seed, q)
        assert [(row["range_key"], row["lo"], row["hi"], row["n"])
                for row in tree["r"].collect()] == exp_r, (seed, q)
        ts = tree["s"].collect()[0]
        assert (ts["n"], ts["sum"], ts["avg"]) == \
            (r["n"], r["sum"], r["avg"]), (seed, q)

        # Count collector: the match-set size, every seed
        assert eng.count_matches(q, filters=filters) \
            .collect()[0]["n"] == len(matched), (seed, q)

        # any-shape collectors: the parsed-grammar dict form of the
        # SAME words reaches the identical match set through a second
        # compile path (parser: bare-word Shoulds, no phrase clause —
        # the union is the same), every seed
        assert eng.count_matches({"parsed": q, "filters": filters}) \
            .collect()[0]["n"] == len(matched), (seed, q)
        got_fcp = [(r["tag_id"], r["n"]) for r in eng.facet_counts(
            {"parsed": q, "filters": filters}).collect()]
        assert got_fcp == exp_fc, (seed, q, filters)

        # a random grammar composition counted against oracle brute
        # force (guarded shapes — standalone phrases — skip)
        for _ in range(6):
            qs = _mk_parsed(rng)
            try:
                n_p = eng.count_matches({"parsed": qs}).collect()[0]["n"]
            except ValueError:
                continue
            assert n_p == len(oracle.search_parsed(qs, k=100_000)), \
                (seed, qs)
            break

        # scored match set: bitwise float32 vs the oracle's unbounded-k
        # hits, every seed (the score_matches/export_scored kernel)
        got_sc = {(row["url"], np.float32(row["score"]))
                  for row in eng.score_matches(q, filters=filters).collect()}
        assert got_sc == {(h["url"], np.float32(h["score"]))
                          for h in exp_hits}, (seed, q)

        # export sink: the SAME match set materialized as a dataset,
        # alternating the broadcast and shuffle-hash join strategies
        if checked == 1:
            out = str(tmp_path / f"exp{seed}")
            stats = eng.export_matches(
                q, spark.createDataFrame(docs), out, filters=filters,
                broadcast_limit=rng.choice([0, 4_000_000]))
            got_u = {row["url"]
                     for row in spark.read.parquet(out).collect()}
            assert got_u == {d["url"] for d in matched}, (seed, q)
            assert stats["rows_exported"] == len(matched), (seed, q)
    assert checked >= 3  # the fuzz must actually exercise aggregations


@pytest.mark.parametrize("seed", [404, 505])
def test_randomized_lifecycle_parity(spark, tmp_path, seed):
    """Random mutation sequences — upsert content-modified docs, a
    domain delete, a url-list delete, then whole-index compaction —
    must leave an index rank- AND score-identical to a fresh oracle
    over the mutated doc list (the randomized generalization of the
    fixed search_lifecycle driver row). The mutated/deleted sets are
    kept disjoint so the expected live set is order-independent."""
    from spyglass_spark.index.builder import (build_index, compact_index,
                                              delete_by_domain,
                                              delete_by_urls,
                                              upsert_documents)
    from spyglass_spark.index.fsck import fsck
    from spyglass_spark.oracle.engine import OracleIndex
    from spyglass_spark.query.executor import SearchEngine

    rng = random.Random(seed)
    docs = _mk_docs(rng, rng.randint(50, 80))
    P = rng.choice([2, 4])
    idx = str(tmp_path / f"lf{seed}")
    build_index(spark, spark.createDataFrame(docs), idx, num_partitions=P,
                waves=1)

    del_dom = f"f{rng.randint(0, 4)}"
    rest = [d for d in docs if d["domain"] != del_dom]
    del_urls = [d["url"] for d in rng.sample(rest, 3)]
    pool = [d for d in rest if d["url"] not in del_urls]
    mod = {d["url"]: d for d in rng.sample(pool, min(4, len(pool)))}
    sor = []
    for d in docs:
        if d["url"] in mod:
            content = d["content"] + " " + " ".join(
                rng.choice(WORDS) for _ in range(rng.randint(1, 8)))
            d = dict(d, content=content,
                     content_sha256=hashlib.sha256(
                         content.encode()).hexdigest())
        sor.append(d)

    upsert_documents(spark, spark.createDataFrame(
        [d for d in sor if d["url"] in mod]), idx, num_partitions=P)
    delete_by_domain(spark, idx, del_dom)
    delete_by_urls(spark, idx, del_urls)
    compact_index(spark, spark.createDataFrame(sor), idx, num_partitions=P)

    expected = [d for d in sor
                if d["domain"] != del_dom and d["url"] not in del_urls]
    oracle = OracleIndex.build(expected, num_partitions=P)
    eng = SearchEngine(spark, idx)
    nonempty = 0
    for q, f, b, _off in (_mk_query(rng, expected) for _ in range(6)):
        got = eng.search(q, filters=f, boosts=b, k=7).collect()
        exp = oracle.search(q, f, b, k=7)
        assert [r["doc_id"] for r in got] == \
            [h["doc_id"] for h in exp], (seed, q, f, b)
        for r, h in zip(got, exp):
            assert np.isclose(np.float32(r["score"]), np.float32(h["score"]),
                              rtol=1e-5), (seed, q, r["score"], h["score"])
        nonempty += bool(exp)
    assert nonempty >= 2
    # a modified doc's OLD extension content must be gone: the marker
    # invariant is covered by sha256 — fsck cross-checks every live
    # row's stored sha against the post-mutation system of record
    rep = fsck(spark, idx, source=spark.createDataFrame(sor)).collect()
    assert rep and all(r["violations"] == 0 and r["stats_mismatches"] == 0
                       for r in rep), (seed, [r.asDict() for r in rep])


@pytest.mark.parametrize("seed", [707])
def test_randomized_sorted_collector_parity(spark, tmp_path, seed):
    """Random corpora × random match sets: search_sorted (the order-by-
    fast-field collector) must reproduce a pure-Python brute-force total
    order — (col asc/desc, url asc tie-break) over the oracle's
    unbounded-k match set — at a random offset, and a k=3 search_after
    cursor walk must concatenate to exactly the one-shot order (no hit
    skipped or repeated across tie boundaries). The order is integer-
    exact: no float tolerance anywhere in this body."""
    from spyglass_spark.index.builder import build_index
    from spyglass_spark.oracle.engine import OracleIndex
    from spyglass_spark.query.compiler import compile_query
    from spyglass_spark.query.executor import SearchEngine

    rng = random.Random(seed)
    docs = _mk_docs(rng, rng.randint(50, 90))
    P = rng.choice([2, 4, 8])
    idx = str(tmp_path / f"so{seed}")
    build_index(spark, spark.createDataFrame(docs), idx, num_partitions=P,
                waves=rng.choice([1, 2]))
    oracle = OracleIndex.build(docs, num_partitions=P)
    eng = SearchEngine(spark, idx)
    by_id = {d["doc_id"]: d for d in docs}

    checked = 0
    for _ in range(20):
        if checked >= 3:
            break
        q = " ".join(rng.choice(WORDS) for _ in range(rng.randint(1, 3)))
        filters = []
        if rng.random() < 0.5:
            filters.append(("tag", rng.randint(1, 4)))
        if not compile_query(q, filters, ()).should_group:
            continue  # all-stopword query: no match set
        matched = [by_id[h["doc_id"]]
                   for h in oracle.search(q, filters, (), k=100_000)]
        if len(matched) < 4:
            continue
        checked += 1
        col = rng.choice(["lastmodified", "published"])
        asc = rng.random() < 0.5
        sgn = 1 if asc else -1
        full = sorted(((d[col], d["url"]) for d in matched),
                      key=lambda t: (sgn * t[0], t[1]))

        k, offset = rng.randint(2, 6), rng.choice([0, 1, 3])
        got = eng.search_sorted(q, filters=filters, col=col, k=k,
                                offset=offset, asc=asc).collect()
        assert [(r[col], r["url"]) for r in got] == full[offset:offset + k], \
            (seed, q, filters, col, asc, k, offset)
        assert [r["rank"] for r in got] == \
            list(range(offset + 1, offset + 1 + len(got)))

        # cursor walk: pages of 3 concatenate to the one-shot order
        pages, after = [], None
        for _pg in range(10):
            rows = eng.search_sorted(q, filters=filters, col=col, k=3,
                                     asc=asc, after=after).collect()
            if not rows:
                break
            assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
            pages.extend((r[col], r["url"]) for r in rows)
            after = (rows[-1][col], rows[-1]["url"])
        assert len(pages) == min(len(full), 30), (seed, q, filters, col, asc)
        assert pages == full[:len(pages)], (seed, q, filters, col, asc)
    assert checked >= 2


@pytest.mark.parametrize("seed", [808])
def test_randomized_time_travel_parity(spark, tmp_path, seed):
    """Random mutation sequences must be REPLAYABLE: ``as_of`` each
    recorded commit_seq serves exactly the doc set live at that commit.
    The build snapshot stays rank- AND bitwise-score-identical to a
    fresh oracle even after later mutations land; post-mutation
    snapshots are checked by per-query match-SET identity (the max_doc
    stats model keeps counting tombstoned docs, so a fresh oracle over
    the live list reproduces membership, not scores) plus bitwise
    (doc_id, score, doc_ord) self-consistency across re-pinned engines.
    Compaction then reclaims history: every pre-compaction seq must
    fail loudly — never alias the rebuilt state — while the rebuilt
    snapshot answers with fresh-build oracle parity."""
    from spyglass_spark.index.builder import (build_index, compact_index,
                                              delete_by_domain,
                                              delete_by_urls,
                                              upsert_documents)
    from spyglass_spark.index.manifest import load_manifest
    from spyglass_spark.oracle.engine import OracleIndex
    from spyglass_spark.query.executor import SearchEngine

    rng = random.Random(seed)
    docs = _mk_docs(rng, rng.randint(50, 80))
    P = rng.choice([2, 4])
    idx = str(tmp_path / f"tt{seed}")
    build_index(spark, spark.createDataFrame(docs), idx, num_partitions=P,
                waves=1)
    snaps = [(load_manifest(idx).commit_seq, list(docs))]

    del_dom = f"f{rng.randint(0, 4)}"
    rest = [d for d in docs if d["domain"] != del_dom]
    del_urls = [d["url"] for d in rng.sample(rest, 3)]
    pool = [d for d in rest if d["url"] not in del_urls]
    mod = {d["url"] for d in rng.sample(pool, min(4, len(pool)))}
    sor = []
    for d in docs:
        if d["url"] in mod:
            content = d["content"] + " " + " ".join(
                rng.choice(WORDS) for _ in range(rng.randint(1, 8)))
            d = dict(d, content=content,
                     content_sha256=hashlib.sha256(
                         content.encode()).hexdigest())
        sor.append(d)

    upsert_documents(spark, spark.createDataFrame(
        [d for d in sor if d["url"] in mod]), idx, num_partitions=P)
    snaps.append((load_manifest(idx).commit_seq, list(sor)))
    delete_by_domain(spark, idx, del_dom)
    live2 = [d for d in sor if d["domain"] != del_dom]
    snaps.append((load_manifest(idx).commit_seq, live2))
    delete_by_urls(spark, idx, del_urls)
    live3 = [d for d in live2 if d["url"] not in del_urls]
    snaps.append((load_manifest(idx).commit_seq, live3))
    assert len({s for s, _ in snaps}) == 4  # every commit bumps the seq

    # build snapshot: full rank + bitwise float32 score parity
    seq0, docs0 = snaps[0]
    at0 = SearchEngine(spark, idx, as_of=seq0)
    oracle0 = OracleIndex.build(docs0, num_partitions=P)
    for _ in range(3):
        q, f, b, _off = _mk_query(rng, docs0)
        got = at0.search(q, filters=f, boosts=b, k=8).collect()
        exp = oracle0.search(q, f, b, k=8)
        assert [r["doc_id"] for r in got] == [h["doc_id"] for h in exp], \
            (seed, seq0, q, f, b)
        assert [np.float32(r["score"]) for r in got] == \
            [np.float32(h["score"]) for h in exp], (seed, seq0, q)

    # mutation snapshots: match-SET identity + re-pin self-consistency
    for seq, live in snaps[1:]:
        oracle = OracleIndex.build(live, num_partitions=P)
        eng = SearchEngine(spark, idx, as_of=seq)
        nonempty = 0
        for _ in range(4):
            q, f, b, _off = _mk_query(rng, live)
            got = eng.search(q, filters=f, boosts=b, k=10_000).collect()
            exp = oracle.search(q, f, b, k=10_000)
            assert sorted(r["url"] for r in got) == \
                sorted(h["url"] for h in exp), (seed, seq, q, f, b)
            repin = SearchEngine(spark, idx, as_of=seq)\
                .search(q, filters=f, boosts=b, k=10_000).collect()
            key = lambda r: (r["doc_id"], r["score"], r["doc_ord"])
            assert [key(r) for r in got] == [key(r) for r in repin]
            nonempty += bool(exp)
        assert nonempty >= 1

    compact_index(spark, spark.createDataFrame(sor), idx, num_partitions=P)
    cur = load_manifest(idx).commit_seq
    assert cur == snaps[-1][0] + 1  # the seq line continues across rebuild
    for seq, _ in snaps:  # reclaimed history: loud, never aliased
        with pytest.raises(FileNotFoundError):
            SearchEngine(spark, idx, as_of=seq)
    atc = SearchEngine(spark, idx, as_of=cur)
    oraclec = OracleIndex.build(live3, num_partitions=P)
    ok = 0
    for _ in range(4):
        q, f, b, _off = _mk_query(rng, live3)
        got = atc.search(q, filters=f, boosts=b, k=8).collect()
        exp = oraclec.search(q, f, b, k=8)
        assert [(r["doc_id"], np.float32(r["score"])) for r in got] == \
            [(h["doc_id"], np.float32(h["score"])) for h in exp], \
            (seed, cur, q, f, b)
        ok += bool(exp)
    assert ok >= 1


@pytest.mark.parametrize("seed", [808])
def test_randomized_percolate_parity(spark, tmp_path, seed):
    """Random corpora × random stored-query sets: the percolator's
    join-plan matches must equal a scalar brute force over the same
    compile_query grammar (Should union / msm clause count / Must
    pairs / range bounds / MustNot + exclude rejection) — guarded
    shapes (phrase under msm, empty query) skip like the engine."""
    from spyglass_spark.ops.percolate import percolate
    from spyglass_spark.query.compiler import (compile_query,
                                               resolve_min_should_match)

    rng = random.Random(seed)
    docs = _mk_docs(rng, rng.randint(40, 80))
    svals = sorted(d["lastmodified"] for d in docs)

    specs = []
    for qi in range(rng.randint(3, 7)):
        spec = {"key": f"q{qi}",
                "query": " ".join(rng.choice(WORDS)
                                  for _ in range(rng.randint(1, 3)))}
        if rng.random() < 0.4:
            spec["filters"] = [("tag", rng.randint(1, 4))]
        if rng.random() < 0.3:
            spec.setdefault("filters", []).append(
                ("lastmodified_ge", svals[len(svals) // 3]))
        if rng.random() < 0.3:
            spec["exclude_tags"] = [rng.randint(1, 4)]
        # phrase-free msm shape only: single-token query + a boost
        # tag clause (multi-word queries carry phrase Shoulds, which
        # the exactness guard rejects under msm >= 2)
        if rng.random() < 0.3 and " " not in spec["query"]:
            spec["boosts"] = [("tag", rng.randint(1, 4))]
            spec["min_should_match"] = 2
        specs.append(spec)

    def brute(spec):
        from spyglass_spark.analysis.analyzer import (tokenize_default,
                                                      tokenize_en)
        cq = compile_query(spec.get("query", ""),
                           spec.get("filters", ()),
                           spec.get("boosts", ()))
        if not cq.should_group:
            return None
        msm = resolve_min_should_match(spec.get("min_should_match", 0),
                                       len(cq.should_group))
        excl = [str(t) for t in spec.get("exclude_tags", ())]
        out = []
        for d in docs:
            fields = {
                "content": {t for _, t in tokenize_en(d["content"] or "")},
                "title": {t for _, t in
                          tokenize_default(d["title"] or "")},
                "tags": {str(t) for t in d["tags"]},
                "id": {d["doc_id"]}, "url": {d["url"]},
            }
            n_cl = sum(1 for c in cq.should_group if c.kind == "term"
                       and any(t in fields.get(c.field, set())
                               for t in c.terms))
            ok = (n_cl >= max(msm, 1)
                  and all(all(t in fields.get(c.field, set())
                              for t in c.terms) for c in cq.musts)
                  and all(d.get(f) is not None
                          and (ge is None or d[f] >= ge)
                          and (le is None or d[f] <= le)
                          for f, ge, le in cq.range_musts)
                  and not any(t in fields.get(c.field, set())
                              for c in cq.must_nots for t in c.terms)
                  and not any(t in fields["tags"] for t in excl))
            if ok:
                out.append(d["url"])
        return sorted(out)

    exp = {s["key"]: brute(s) for s in specs}
    runnable = [s for s in specs if exp[s["key"]] is not None]
    if not runnable:
        return  # every random query was all-stopword: nothing to run
    got: dict = {}
    for r in percolate(spark, spark.createDataFrame(docs),
                       runnable).collect():
        got.setdefault(r["query_key"], []).append(r["url"])
    for s in runnable:
        assert got.get(s["key"], []) == exp[s["key"]], (seed, s)
