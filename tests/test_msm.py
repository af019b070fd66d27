"""minimum_should_match parity (Lucene BooleanQuery
setMinimumNumberShouldMatch / ES minimum_should_match — public
Lucene/ES surface): a doc is a candidate only when at least m DISTINCT
Should clauses match. Scoring is unchanged (matching clauses combine
exactly as before — sum or dismax); msm only gates candidacy, so the
engine must stay bitwise float32-identical to the oracle twin at every
rank, auto ≡ exhaustive must hold (msm ≥ 2 forces the exhaustive path
— WAND's Σ-UB advance has no clause-count bound), and the unscored
collector path must count the same match set."""

import numpy as np
import pytest

pyspark = pytest.importorskip("pyspark")

QUERIES = [
    "parse token stream",       # phrase + term clauses
    "import sys",
    "merged scoring vector",
    "the parsing of tokens",    # stopword holes
]
MSMS = [0, 1, 2, 3]


@pytest.fixture(scope="module")
def engine(spark, built_index):
    from spyglass_spark.query.executor import SearchEngine

    return SearchEngine(spark, built_index["index_dir"])


def _bits(x) -> bytes:
    return np.float32(x).tobytes()


def _rows(df):
    return sorted(df.collect(), key=lambda r: r["rank"])


def test_msm_rank_and_bitwise_score_parity(engine, built_index):
    oracle = built_index["oracle"]
    saw_nonempty_m2 = False
    for q in QUERIES:
        base = None
        for m in MSMS:
            got = _rows(engine.search(q, k=10, min_should_match=m))
            want = oracle.search(q, k=10, min_should_match=m)
            label = f"{q!r} msm={m}"
            assert [r["doc_id"] for r in got] == \
                [h["doc_id"] for h in want], label
            for g, w in zip(got, want):
                assert _bits(g["score"]) == _bits(w["score"]), label
            if m <= 1:
                ids = [r["doc_id"] for r in got]
                if base is None:
                    base = ids
                else:
                    # msm=0 and msm=1 are the same reference Must-wrap
                    assert ids == base, label
            if m == 2 and got:
                saw_nonempty_m2 = True
    assert saw_nonempty_m2, "msm=2 cases must be nonvacuous"


def test_msm_tightens_the_match_set(built_index):
    """Each msm step can only shrink the candidate set, and a matching
    doc's score is msm-invariant (the gate never reweights)."""
    oracle = built_index["oracle"]
    q = "parse token stream"
    sets = []
    for m in (1, 2, 3):
        hits = oracle.search(q, k=10**6, min_should_match=m)
        sets.append({h["doc_id"]: _bits(h["score"]) for h in hits})
    assert set(sets[1]) < set(sets[0]), "msm=2 must strictly shrink here"
    for lo, hi in ((0, 1), (1, 2)):
        assert set(sets[hi]) <= set(sets[lo])
        for d in sets[hi]:
            assert sets[hi][d] == sets[lo][d]


def test_msm_over_clause_count_matches_nothing(engine, built_index):
    q = "import sys"
    n_clauses = 10**3  # far above any compiled clause count
    assert engine.search(q, k=10, min_should_match=n_clauses).count() == 0
    assert built_index["oracle"].search(
        q, k=10, min_should_match=n_clauses) == []


def test_msm_auto_equals_exhaustive_and_wand_ineligible(engine):
    for q in QUERIES[:2]:
        auto = _rows(engine.search(q, k=10, min_should_match=2,
                                   algo="auto"))
        exh = _rows(engine.search(q, k=10, min_should_match=2,
                                  algo="exhaustive"))
        assert [(r["doc_id"], _bits(r["score"])) for r in auto] == \
            [(r["doc_id"], _bits(r["score"])) for r in exh], q
    engine.search("parse token stream", k=10, min_should_match=2)
    assert engine.last_meta["wand_eligible"] == 0
    engine.search("parse token stream", k=10, min_should_match=1)
    assert engine.last_meta["wand_eligible"] == 1


def test_msm_composes_with_dismax_and_filters(engine, built_index):
    oracle = built_index["oracle"]
    tags_dim = built_index["tags_dim"]
    rs_tag = next(t["id"] for t in tags_dim
                  if t["label"] == "lens" and t["value"] == "rs")
    got = _rows(engine.search("parse token stream", k=10,
                              filters=[("tag", rs_tag)],
                              combiner="dismax", tie_breaker=0.35,
                              min_should_match=2))
    want = oracle.search("parse token stream", [("tag", rs_tag)], k=10,
                         combiner="dismax", tie_breaker=0.35,
                         min_should_match=2)
    assert [(r["doc_id"], _bits(r["score"])) for r in got] == \
        [(h["doc_id"], _bits(h["score"])) for h in want]


def test_msm_batch_equals_single(engine):
    batch = [{"query": "parse token stream", "min_should_match": 2},
             {"query": "import sys"},  # mixed msm in one batch
             {"query": "merged scoring vector", "min_should_match": 3}]
    res = engine.search_many(batch, k=8).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append(r)
    for qi, ent in enumerate(batch):
        single = _rows(engine.search(
            ent["query"], k=8,
            min_should_match=ent.get("min_should_match", 0)))
        got = sorted(by_q.get(qi, []), key=lambda r: r["rank"])
        assert [(r["doc_id"], _bits(r["score"])) for r in got] == \
            [(r["doc_id"], _bits(r["score"])) for r in single], ent


def test_msm_count_collector_exact(engine, built_index):
    """count_matches over a term-only msm dict shape equals a
    brute-force DISTINCT-matching-clause count over the oracle's
    postings (the _clause_count_ords path)."""
    oracle = built_index["oracle"]
    saw_nonzero = False
    for q in ("import sys", "merged scoring vector"):
        for m in (2, 3):
            got = engine.count_matches(
                {"term_set": q.split(),
                 "min_should_match": m}).collect()[0]["n"]
            want = len(_oracle_term_set_matches(oracle, q, m))
            assert got == want, (q, m, got, want)
            saw_nonzero = saw_nonzero or got > 0
    assert saw_nonzero, "msm count cases must be nonvacuous"


def _oracle_term_set_matches(oracle, q, m):
    """Brute-force msm-over-term-set match set on the oracle's postings:
    DISTINCT clause count where clause i = (content term_i) ∪ (title
    term_i) per compile_expanded's per-field clause layout — but
    search_term_set compiles ONE clause per (field, term) expansion, so
    count per-(field,term) clauses exactly like the engine."""
    from spyglass_spark.query.expand import normalize_bound

    keys = [normalize_bound(t) for t in q.split()]
    clauses = []
    for f in ("content", "title"):
        present = {t for (ff, t) in oracle.postings if ff == f}
        for t in keys:
            if t in present:
                clauses.append({o for o, _tf, _p in
                                oracle.postings[(f, t)]})
    cnt = {}
    for s in clauses:
        for o in s:
            cnt[o] = cnt.get(o, 0) + 1
    return {o for o, c in cnt.items()
            if c >= m and o not in oracle.tombstoned}


def test_msm_facets_raise_on_phrase_should(engine):
    """A multi-token free-text query compiles phrase Shoulds; under
    msm ≥ 2 the unscored collector path must refuse (the clause-match
    count is position-dependent) instead of miscounting."""
    with pytest.raises(Exception, match="min_should_match"):
        engine.count_matches({"query": "parse token stream",
                              "min_should_match": 2}).collect()
    # term-only shapes (no phrase clause) stay exact — smoke
    engine.count_matches({"term_set": ["import", "sys"],
                          "min_should_match": 2}).collect()


def test_msm_score_matches_bitwise(engine):
    q = {"query": "parse token stream", "min_should_match": 2}
    full = {r["url"]: r["score"]
            for r in engine.score_matches(q).collect()}
    hits = engine.search("parse token stream", k=10**6,
                         min_should_match=2).collect()
    assert hits
    assert len(full) == len(hits)
    for h in hits:
        assert _bits(full[h["url"]]) == _bits(h["score"])


def test_msm_explain_reports_the_gate(engine, built_index):
    oracle = built_index["oracle"]
    q = "parse token stream"
    m2 = {h["url"] for h in oracle.search(q, k=10**6, min_should_match=2)}
    m1 = [h for h in oracle.search(q, k=10**6, min_should_match=1)
          if h["url"] not in m2]
    assert m1, "need a doc matching exactly one should clause"
    ex = engine.explain({"query": q, "min_should_match": 2},
                        m1[0]["url"])
    assert ex["found"] and not ex["matches"]
    assert ex["should_matched"] == 1
    hit_url = next(iter(m2))
    ex2 = engine.explain({"query": q, "min_should_match": 2}, hit_url)
    assert ex2["matches"] and ex2["should_matched"] >= 2


def test_msm_spec_resolution():
    """ES minimum_should_match spec forms (public ES surface), incl. the
    documented round-DOWN for percentages and all-but-N negatives."""
    from spyglass_spark.query.compiler import resolve_min_should_match as r

    assert r(3, 5) == 3
    assert r("3", 5) == 3
    assert r(-1, 5) == 4          # all but one
    assert r("-1", 5) == 4
    assert r("75%", 5) == 3       # floor(3.75)
    assert r("-25%", 5) == 4      # 5 - floor(1.25)
    assert r("100%", 7) == 7
    assert r("0%", 7) == 0
    assert r(-10, 5) == 0         # over-negative clamps to plain union
    assert r(0, 0) == 0
    assert r("50%", 0) == 0
    assert r(9, 5) == 9           # > n_should passes through: matches nothing
    for bad in ("3<90%", "abc", "", "%", True):
        with pytest.raises(ValueError):
            r(bad, 5)


def test_msm_spec_parity(engine, built_index):
    """Spec strings resolve against the COMPILED Should-clause count via
    the shared scalar resolver — engine and oracle stay bitwise
    rank-identical under every accepted form."""
    oracle = built_index["oracle"]
    q = "parse token stream"
    for spec in ("-1", "-25%", "50%", "2", -1):
        got = _rows(engine.search(q, k=10, min_should_match=spec))
        want = oracle.search(q, k=10, min_should_match=spec)
        assert [(r["doc_id"], _bits(r["score"])) for r in got] == \
            [(h["doc_id"], _bits(h["score"])) for h in want], spec
    # '100%' = every Should clause: subset of any laxer gate
    full = {h["doc_id"] for h in oracle.search(q, k=10**6,
                                               min_should_match="100%")}
    lax = {h["doc_id"] for h in oracle.search(q, k=10**6,
                                              min_should_match=2)}
    assert full <= lax


def test_msm_validation(engine):
    with pytest.raises(ValueError, match="min_should_match"):
        engine.search("fn", min_should_match="3<90%")
    with pytest.raises(ValueError, match="min_should_match"):
        engine.search("fn", min_should_match="abc")
