"""Prefix/fuzzy expansion: scalar kernels, the SymSpell sidecar, engine
vs brute-force-oracle parity, and the one-job/WAND properties."""

import random

import pytest

from spyglass_spark.query.expand import (deletion_variants, expand_fuzzy,
                                         expand_prefix, levenshtein_le,
                                         normalize_pattern,
                                         normalize_wildcard,
                                         prefix_upper_bound,
                                         regex_literal_prefix,
                                         wildcard_literal_prefix,
                                         wildcard_regex)


def test_normalize_pattern():
    assert normalize_pattern("Spar*") == "spar"
    assert normalize_pattern("Résumé") == "resume"
    assert normalize_pattern("  ++  ") == ""
    assert normalize_pattern("x" * 41) == ""  # RemoveLongFilter cap
    assert normalize_pattern("x" * 40) == "x" * 40


def test_normalize_wildcard():
    assert normalize_wildcard("Spar*") == "spar*"
    assert normalize_wildcard("S?ar*K") == "s?ar*k"
    assert normalize_wildcard("Ré?umé") == "re?ume"
    assert normalize_wildcard("*sion") == "*sion"
    assert normalize_wildcard("*") == ""          # match-all refused
    assert normalize_wildcard("??") == ""
    assert normalize_wildcard("foo-bar*") == ""   # '-' never in a term
    assert normalize_wildcard("") == ""
    assert normalize_wildcard("x" * 41 + "*") == ""  # literal-byte cap
    assert normalize_wildcard("x" * 40 + "*") == "x" * 40 + "*"


def test_wildcard_regex_agrees_with_fnmatch():
    """Engine translation vs the oracle's stdlib matcher on the full
    normalized alphabet — exhaustive small-universe cross-check."""
    from fnmatch import fnmatchcase
    from itertools import product

    terms = ["", "a", "b", "ab", "ba", "aab", "abab", "abc0", "a0b"]
    pats = ["".join(p) for n in range(4)
            for p in product("ab*?", repeat=n)]
    for pat in pats:
        rx = wildcard_regex(pat)
        for t in terms:
            assert (rx.fullmatch(t) is not None) == fnmatchcase(t, pat), \
                (pat, t)


def test_wildcard_and_regex_literal_prefix():
    assert wildcard_literal_prefix("spar*k") == "spar"
    assert wildcard_literal_prefix("*sion") == ""
    assert wildcard_literal_prefix("s?ar") == "s"
    assert regex_literal_prefix("abc") == "abc"
    assert regex_literal_prefix("abc.*") == "abc"   # quantifier binds '.'
    assert regex_literal_prefix("abc*") == "ab"     # quantifier binds 'c'
    assert regex_literal_prefix("abc?d") == "ab"
    assert regex_literal_prefix("abc{0,2}") == "ab"
    assert regex_literal_prefix("abc|xyz") == ""    # alternation: no prune
    assert regex_literal_prefix("(ab)c") == ""
    assert regex_literal_prefix("[ab]c") == ""
    assert regex_literal_prefix(r"ab\d") == ""
    assert regex_literal_prefix(".*x") == ""


def test_prefix_upper_bound():
    assert prefix_upper_bound("spar") == "spas"
    assert prefix_upper_bound("az") == "a{"  # next code point, not next letter
    assert prefix_upper_bound("a" + chr(0x10FFFF)) == "b"


def test_levenshtein_matches_duckdb():
    """The scalar verify kernel must agree with DuckDB's levenshtein —
    the driver oracle for fuzzy_term_candidates grades against it."""
    import duckdb

    rng = random.Random(7)
    alpha = "abcde"
    pairs = [("".join(rng.choice(alpha) for _ in range(rng.randrange(0, 8))),
              "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 8))))
             for _ in range(300)]
    con = duckdb.connect()
    for a, b in pairs:
        want = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        for limit in (1, 2, 3):
            got = levenshtein_le(a, b, limit)
            assert got == (want if want <= limit else limit + 1), (a, b, limit)


def test_deletion_neighborhood_complete_for_d1():
    """SymSpell completeness: any pair at Levenshtein distance <= 1
    shares a d=1 deletion variant."""
    rng = random.Random(11)
    alpha = "abc"
    for _ in range(500):
        w = "".join(rng.choice(alpha) for _ in range(rng.randrange(1, 7)))
        edit = rng.choice(["sub", "ins", "del", "same"])
        i = rng.randrange(0, len(w))
        if edit == "sub":
            v = w[:i] + rng.choice(alpha) + w[i + 1:]
        elif edit == "ins":
            v = w[:i] + rng.choice(alpha) + w[i:]
        elif edit == "del":
            v = w[:i] + w[i + 1:]
        else:
            v = w
        if levenshtein_le(w, v, 1) <= 1:
            assert deletion_variants(w) & deletion_variants(v), (w, v)


def test_deletion_key_expr_matches_scalar(spark):
    from pyspark.sql import functions as F

    from spyglass_spark.query.expand import deletion_key_expr

    terms = ["a", "ab", "spark", "recursion", "x" * 12]
    rows = (spark.sql("SELECT explode(array({})) AS term".format(
                ",".join(f"'{t}'" for t in terms)))
            .select("term", deletion_key_expr("term").alias("keys"))
            .collect())
    for r in rows:
        assert set(r["keys"]) == deletion_variants(r["term"]), r["term"]


@pytest.fixture(scope="module")
def engines(spark, built_index):
    from spyglass_spark.query.executor import SearchEngine

    eng = SearchEngine(spark, built_index["index_dir"])
    return eng, built_index["oracle"]


def _hits(rows):
    return [(r["doc_id"], float(r["score"])) for r in rows]


def test_search_prefix_parity(engines):
    eng, oracle = engines
    for pat in ["fn", "re", "q", "zz", "merge"]:
        got = _hits(eng.search_prefix(pat, k=8).collect())
        want = _hits(oracle.search_prefix(pat, k=8))
        assert got == want, pat
    # expansions came from the range scan, not a Spark job
    assert eng.last_meta["spark_jobs"] <= 1


def test_search_prefix_empty_and_nomatch(engines):
    eng, oracle = engines
    assert eng.search_prefix("zzqx").count() == 0
    assert eng.search_prefix("++").count() == 0
    assert oracle.search_prefix("zzqx") == []


def test_search_fuzzy_parity_fallback_and_sidecar(engines):
    """Engine fuzzy (dictionary-slice fallback AND SymSpell sidecar)
    must equal the oracle's brute-force enumeration bitwise."""
    eng, oracle = engines
    pats = ["fn", "vektor", "merg", "recursio", "the"]
    fallback = {p: _hits(eng.search_fuzzy(p, k=8).collect()) for p in pats}
    eng.ensure_fuzzy_dict()
    assert eng._fuzzy_dict_paths(), "sidecar not discovered after build"
    for p in pats:
        want = _hits(oracle.search_fuzzy(p, k=8))
        assert fallback[p] == want, f"fallback {p}"
        assert _hits(eng.search_fuzzy(p, k=8).collect()) == want, f"sidecar {p}"


def test_search_fuzzy_wand_matches_exhaustive(engines):
    eng, _ = engines
    for p in ["fn", "merg"]:
        auto = _hits(eng.search_fuzzy(p, k=10).collect())
        assert eng.last_meta["wand_eligible"] == 1
        exh = _hits(eng.search_fuzzy(p, k=10, algo="exhaustive").collect())
        assert auto == exh


def test_search_prefix_with_filters(engines):
    """Pattern queries compose with tag filters exactly like free-text
    queries (filters compile through the same path)."""
    eng, oracle = engines
    got = _hits(eng.search_prefix("re", k=8, filters=[("tag", 1)]).collect())
    want = _hits(oracle.search_prefix("re", k=8, filters=[("tag", 1)]))
    assert got == want


WILDCARD_PATS = ["re?", "*sion", "zzq*", "*", "m?rg*", "s*k", "t??",
                 "Rec*", "f*"]


def test_search_wildcard_parity(engines):
    """Engine wildcard (range-pruned read + regex translation) must
    equal the oracle's whole-dictionary fnmatch enumeration bitwise —
    including leading-wildcard (unpruned) and no-match patterns."""
    eng, oracle = engines
    for pat in WILDCARD_PATS:
        got = _hits(eng.search_wildcard(pat, k=8).collect())
        want = _hits(oracle.search_wildcard(pat, k=8))
        assert got == want, pat
    assert eng.last_meta["spark_jobs"] <= 1


REGEX_PATS = ["f[a-z]*n", "merg(e|ed)?", "zzq.*", "[a-z]*sion",
              "q[aeiou].*", "t.", "re.*"]


def test_search_regex_parity(engines):
    """Engine regex (literal-prefix-pruned when safe) vs the oracle's
    unpruned enumeration — alternation/class patterns exercise the
    prune-defeat rule in regex_literal_prefix."""
    eng, oracle = engines
    for pat in REGEX_PATS:
        got = _hits(eng.search_regex(pat, k=8).collect())
        want = _hits(oracle.search_regex(pat, k=8))
        assert got == want, pat
    assert eng.last_meta["spark_jobs"] <= 1


def test_search_wildcard_wand_matches_exhaustive(engines):
    eng, _ = engines
    for pat in ["f*", "re?"]:
        auto = _hits(eng.search_wildcard(pat, k=10).collect())
        exh = _hits(eng.search_wildcard(pat, k=10,
                                        algo="exhaustive").collect())
        assert auto == exh, pat


def test_search_wildcard_with_filters_and_paging(engines):
    eng, oracle = engines
    got = _hits(eng.search_wildcard("re*", k=8,
                                    filters=[("tag", 1)]).collect())
    want = _hits(oracle.search_wildcard("re*", k=8, filters=[("tag", 1)]))
    assert got == want
    full = _hits(eng.search_wildcard("re*", k=10).collect())
    page2 = _hits(eng.search_wildcard("re*", k=5, offset=5).collect())
    assert page2 == full[5:]


def test_fuzzy_candidates_op_vs_duckdb(spark):
    """Distributed SymSpell join == DuckDB brute-force levenshtein over
    the same dictionary (sf0.001 documents)."""
    import duckdb

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    from spyglass_spark.ops.fuzzy import fuzzy_candidates

    qterms = ["sparkk", "functio", "retur"]
    got = sorted(
        (r["query_term"], r["term"], int(r["df"]), int(r["dist"]))
        for r in fuzzy_candidates(spark, docs, qterms).collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    want = sorted(tuple(r) for r in con.execute("""
        WITH toks AS (
          SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text),
                 '[^a-z0-9]+'), x -> x <> '')) AS term FROM documents),
        dict AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term),
        q AS (SELECT unnest(['sparkk','functio','retur']) AS query_term)
        SELECT query_term, term, df, levenshtein(query_term, term) AS dist
        FROM q CROSS JOIN dict WHERE levenshtein(query_term, term) <= 1
        """).fetchall())
    assert got == want
    assert len(got) > 0


def test_search_many_mixed_pattern_batch(engines):
    """A mixed batch (text + prefix + wildcard + regex + fuzzy) scores
    in ONE Spark job and each slice equals its single-query twin."""
    eng, _ = engines
    eng.ensure_fuzzy_dict()
    batch = [
        {"query": "fn index"},
        {"prefix": "re"},
        {"wildcard": "f?"},
        {"regex": "(merg|fn)"},
        {"fuzzy": "sow", "fuzzy_distance": 1},
    ]
    res = eng.search_many(batch, k=6).collect()
    assert eng.last_meta["spark_jobs"] <= 1
    by_q = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append(r)
    singles = [
        eng.search("fn index", k=6),
        eng.search_prefix("re", k=6),
        eng.search_wildcard("f?", k=6),
        eng.search_regex("(merg|fn)", k=6),
        eng.search_fuzzy("sow", k=6),
    ]
    for qi, single in enumerate(singles):
        got = sorted(by_q.get(qi, []), key=lambda r: r["rank"])
        want = single.collect()
        assert [(r["doc_id"], r["score"]) for r in got] == \
            [(r["doc_id"], r["score"]) for r in want], qi
    assert sum(bool(v) for v in by_q.values()) >= 4


def test_search_many_rejects_unknown_shape(engines):
    eng, _ = engines
    import pytest as _pytest
    with _pytest.raises(ValueError, match="batch entry"):
        eng.search_many([{"nope": "x"}])


def test_search_phrase_prefix_parity(engines):
    """PhrasePrefixQuery: engine (term_stats range-scan expansion +
    distributed phrase kernel) vs the oracle's brute-force dictionary
    enumeration + scalar phrase scorer — bitwise, incl. no-match and
    bare-prefix degradation."""
    eng, oracle = engines
    for q in ["merge jo", "fn ind", "the recursio", "merg",
              "zz qx", "fast ke"]:
        got = _hits(eng.search_phrase_prefix(q, k=8).collect())
        want = _hits(oracle.search_phrase_prefix(q, k=8))
        assert got == want, q
    assert eng.last_meta["spark_jobs"] <= 1


def test_search_phrase_prefix_requires_adjacency(spark, tmp_path):
    """The completed phrase must be positional: fixed tokens followed by
    the expansion at the next raw-token slot, stopword holes keeping
    their gap. No bag-of-words fallback."""
    import hashlib
    import uuid

    from spyglass_spark.corpus import SPYGLASS_NS
    from spyglass_spark.index.builder import build_index
    from spyglass_spark.query.executor import SearchEngine

    def doc(i, content):
        url = f"repo://x/p{i}.rs@{'b' * 40}"
        return dict(
            doc_id=str(uuid.uuid5(SPYGLASS_NS, url)), url=url, domain="x",
            title=f"t{i}", content=content, tags=[1],
            content_sha256=hashlib.sha256(content.encode()).hexdigest(),
            published=1_600_000_000_000_000,
            lastmodified=1_600_000_000_000_000)

    docs = [
        doc(0, "alpha beta gamma"),     # adjacent: matches
        doc(1, "alpha gamma beta"),     # transposed: no match
        doc(2, "alpha beta"),           # adjacent: matches
        doc(3, "beta alpha"),           # reversed: no match
        doc(4, "keep the beta gamma"),  # stopword hole at slot 1
        doc(5, "keep beta gamma"),      # no hole: prefix slot mismatch
    ]
    idx = str(tmp_path / "ppfx")
    build_index(spark, spark.createDataFrame(docs), idx, num_partitions=2)
    eng = SearchEngine(spark, idx)

    got = {r["doc_id"] for r in eng.search_phrase_prefix("alpha be",
                                                         k=10).collect()}
    assert got == {docs[0]["doc_id"], docs[2]["doc_id"]}

    # 'keep the be': 'the' occupies raw slot 1, expansion sits at slot 2
    got = {r["doc_id"] for r in eng.search_phrase_prefix("keep the be",
                                                         k=10).collect()}
    assert got == {docs[4]["doc_id"]}
    # and the hole-free doc is reachable with the hole-free query
    got = {r["doc_id"] for r in eng.search_phrase_prefix("keep be",
                                                         k=10).collect()}
    assert got == {docs[5]["doc_id"]}


def test_search_phrase_prefix_batch_and_paging(engines):
    """phrase_prefix batches through search_many (same one-job rule) and
    pages with offset exactly like the other shapes."""
    eng, oracle = engines
    res = eng.search_many([{"phrase_prefix": "merge jo"},
                           {"query": "fn index"}], k=6).collect()
    assert eng.last_meta["spark_jobs"] <= 1
    got0 = [(r["doc_id"], r["score"]) for r in sorted(
        (r for r in res if r["query_id"] == 0), key=lambda r: r["rank"])]
    single = [(r["doc_id"], r["score"])
              for r in eng.search_phrase_prefix("merge jo", k=6).collect()]
    assert got0 == single
    # offset paging concatenates to the one-shot ranking
    one_shot = _hits(eng.search_phrase_prefix("merge jo", k=8).collect())
    paged = _hits(eng.search_phrase_prefix("merge jo", k=4).collect()) + \
        _hits(eng.search_phrase_prefix("merge jo", k=4, offset=4).collect())
    assert paged == one_shot
    want = _hits(oracle.search_phrase_prefix("merge jo", k=4, offset=4))
    assert paged[4:] == want


def test_normalize_bound():
    from spyglass_spark.query.expand import normalize_bound
    assert normalize_bound(None) == ""
    assert normalize_bound("") == ""
    assert normalize_bound("Résumé") == "resume"
    # whole string kept (no tokenization), no length cap
    assert normalize_bound("sp-ark z") == "sp-ark z"
    assert normalize_bound("a" * 60) == "a" * 60


def test_expand_term_range_empty_interval_no_read():
    """lo > hi (and lo == hi half-open) short-circuit before any file
    access — bogus paths prove no read happens."""
    from spyglass_spark.query.expand import expand_term_range
    assert expand_term_range(["/nonexistent"], "content", "z", "a") == []
    assert expand_term_range(["/nonexistent"], "content", "m", "m") == []
    assert expand_term_range(["/nonexistent"], "content", "m", "m",
                             include_upper=False,
                             include_lower=False) == []


TERM_RANGES = [
    ("f", "n", True, False),      # plain half-open
    ("f", "n", False, True),      # flipped bound flags
    ("q", "re", True, True),      # inclusive upper
    ("merge", "merge", True, True),  # degenerate single-term range
    (None, "d", True, False),     # unbounded lower
    ("t", None, True, False),     # unbounded upper
    ("zzz", None, True, False),   # empty tail
]


def test_search_term_range_parity(engines):
    """Engine term-range (pyarrow byte-range read, no post-filter) must
    equal the oracle's whole-dictionary Python-comparison enumeration
    bitwise for every bound shape: half-open/inclusive/degenerate/
    unbounded-side/empty."""
    eng, oracle = engines
    for lo, hi, ilo, ihi in TERM_RANGES:
        got = _hits(eng.search_term_range(
            lo, hi, include_lower=ilo, include_upper=ihi, k=8).collect())
        want = _hits(oracle.search_term_range(
            lo, hi, include_lower=ilo, include_upper=ihi, k=8))
        assert got == want, (lo, hi, ilo, ihi)
    assert eng.last_meta["spark_jobs"] <= 1
    # reversed bounds: empty without error
    assert eng.search_term_range("x", "c").count() == 0


def test_search_term_range_wand_matches_exhaustive(engines):
    eng, _ = engines
    for lo, hi in [("f", "n"), ("q", "s")]:
        auto = _hits(eng.search_term_range(lo, hi, k=10).collect())
        exh = _hits(eng.search_term_range(lo, hi, k=10,
                                          algo="exhaustive").collect())
        assert auto == exh, (lo, hi)


def test_search_term_range_with_filters_and_paging(engines):
    eng, oracle = engines
    got = _hits(eng.search_term_range("f", "n", k=8,
                                      filters=[("tag", 1)]).collect())
    want = _hits(oracle.search_term_range("f", "n", k=8,
                                          filters=[("tag", 1)]))
    assert got == want
    full = _hits(eng.search_term_range("f", "n", k=10).collect())
    page2 = _hits(eng.search_term_range("f", "n", k=5, offset=5).collect())
    assert page2 == full[5:]


def test_search_many_term_range_batch(engines):
    """term_range batches with every other shape in one scoring job and
    each row set equals its single-query method bitwise."""
    eng, _ = engines
    batch = eng.search_many([
        {"term_range": ("f", "n")},
        {"term_range": ("q", "re"), "include_upper": True},
        {"query": "merge"},
    ], k=6)
    rows = batch.collect()
    assert eng.last_meta["spark_jobs"] <= 1
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append((r["doc_id"],
                                                   float(r["score"])))
    single0 = _hits(eng.search_term_range("f", "n", k=6).collect())
    single1 = _hits(eng.search_term_range("q", "re", include_upper=True,
                                          k=6).collect())
    assert by_q.get(0, []) == single0
    assert by_q.get(1, []) == single1


def test_expand_term_set_normalization_and_absent_terms():
    from spyglass_spark.query.expand import expand_term_set
    # all-empty set short-circuits without touching files
    assert expand_term_set(["/nonexistent"], "content", ["", None]) == []


def test_search_term_set_parity(engines):
    """Engine term-set (pyarrow IN-list read) must equal the oracle's
    whole-dictionary membership enumeration bitwise — including absent
    terms (silently skipped, per tantivy), duplicates, fold-normalized
    input, and the empty set."""
    eng, oracle = engines
    sets = [
        ["merge", "fn", "nosuchtermzz"],
        ["MERGE", "Fn"],              # normalization
        ["fn", "fn", "fn"],           # duplicates collapse
        ["nosuchtermzz", "alsoabsent"],
    ]
    for ts in sets:
        got = _hits(eng.search_term_set(ts, k=8).collect())
        want = _hits(oracle.search_term_set(ts, k=8))
        assert got == want, ts
    assert eng.last_meta["spark_jobs"] <= 1
    assert eng.search_term_set([]).count() == 0
    assert oracle.search_term_set([]) == []


def test_search_term_set_wand_filters_and_batch(engines):
    eng, oracle = engines
    ts = ["merge", "fn", "index"]
    auto = _hits(eng.search_term_set(ts, k=10).collect())
    exh = _hits(eng.search_term_set(ts, k=10, algo="exhaustive").collect())
    assert auto == exh
    got = _hits(eng.search_term_set(ts, k=8, filters=[("tag", 1)]).collect())
    want = _hits(oracle.search_term_set(ts, k=8, filters=[("tag", 1)]))
    assert got == want
    rows = eng.search_many([{"term_set": ts}, {"query": "merge"}],
                           k=6).collect()
    assert eng.last_meta["spark_jobs"] <= 1
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append((r["doc_id"],
                                                   float(r["score"])))
    assert by_q.get(0, []) == _hits(eng.search_term_set(ts, k=6).collect())
