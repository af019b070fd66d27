"""Spelling-suggester parity (Lucene DirectSpellChecker / ES term
suggester — public Lucene/ES surface): engine suggestions (SymSpell
sidecar IN-list read or dictionary-slice verify, pyarrow metadata
plane) must equal the oracle twin's brute Levenshtein over its whole
enumerated dictionary, under every mode, at distances 1 and 2, with
the documented (dist ASC, df DESC, term ASC) ranking."""

import pytest

pyspark = pytest.importorskip("pyspark")

TERMS = ["sow", "parze", "tokn", "fn", "vectr", "zzzzzz"]


@pytest.fixture(scope="module")
def engine(spark, built_index):
    from spyglass_spark.query.executor import SearchEngine

    return SearchEngine(spark, built_index["index_dir"])


def test_suggest_parity_all_modes_and_distances(engine, built_index):
    oracle = built_index["oracle"]
    nonempty = 0
    for term in TERMS:
        for field in ("content", "title"):
            for dist in (1, 2):
                for mode in ("missing", "popular", "always"):
                    got = engine.suggest(term, field=field, distance=dist,
                                         limit=5, mode=mode)
                    want = oracle.suggest(term, field=field, distance=dist,
                                          limit=5, mode=mode)
                    assert got == want, (term, field, dist, mode)
                    nonempty += bool(got)
    assert nonempty >= 5, "suggest parity must be nonvacuous"


def test_suggest_sidecar_equals_slice_scan(engine, built_index):
    """distance=1 via the SymSpell sidecar must equal the sidecar-less
    dictionary-slice path (both end in the exact Levenshtein verify)."""
    from spyglass_spark.query.expand import suggest_terms

    engine.ensure_fuzzy_dict()
    fuzzy = engine._fuzzy_dict_paths()
    assert fuzzy, "sidecar must exist after ensure_fuzzy_dict"
    stats = engine._paths("term_stats")
    for term in TERMS:
        for mode in ("missing", "popular", "always"):
            via_sidecar = suggest_terms(stats, "content", term, distance=1,
                                        limit=8, mode=mode,
                                        fuzzy_paths=fuzzy)
            via_slice = suggest_terms(stats, "content", term, distance=1,
                                      limit=8, mode=mode, fuzzy_paths=None)
            assert via_sidecar == via_slice, (term, mode)


def test_suggest_mode_semantics(built_index):
    oracle = built_index["oracle"]
    # a term that IS in the dictionary: 'missing' refuses, 'popular'
    # only returns strictly-more-frequent corrections
    present = max(((t, oracle.df("content", t))
                   for (f, t) in oracle.postings if f == "content"
                   and len(t) >= 4), key=lambda kv: kv[1])[0]
    assert oracle.suggest(present, mode="missing") == []
    self_df = oracle.df("content", present)
    for s in oracle.suggest(present, mode="popular", distance=2, limit=20):
        assert s["df"] > self_df
    alw = oracle.suggest(present, mode="always", distance=2, limit=20)
    pop = oracle.suggest(present, mode="popular", distance=2, limit=20)
    assert {(s["term"]) for s in pop} <= {(s["term"]) for s in alw} or \
        len(alw) == 20  # popular ⊆ always unless the cap truncated


def test_suggest_ranking_contract(built_index):
    """(dist ASC, df DESC, term ASC), input never suggested, cap."""
    oracle = built_index["oracle"]
    for term in ("sow", "parze"):
        out = oracle.suggest(term, distance=2, limit=50, mode="always")
        keys = [(s["dist"], -s["df"], s["term"]) for s in out]
        assert keys == sorted(keys), term
        assert all(s["term"] != term for s in out)


def test_suggest_normalization_and_validation(engine):
    # engine normalizes the input like every pattern query
    assert engine.suggest("SoW") == engine.suggest("sow")
    assert engine.suggest("") == []
    assert engine.suggest("!!!") == []
    with pytest.raises(ValueError, match="mode"):
        engine.suggest("sow", mode="top")
    with pytest.raises(ValueError, match="distance"):
        engine.suggest("sow", distance=0)


def test_suggest_query_parity_and_rewrite(engine, built_index):
    """Whole-query did-you-mean (Lucene SpellChecker collate-style
    rewrite): engine's one-read batched path must equal the oracle
    twin's per-term brute composition, and 'missing' mode must leave
    in-dictionary terms untouched while fixing absent ones."""
    oracle = built_index["oracle"]
    changed = 0
    for q in ("parze the tokn stream", "merge sow vectr",
              "fn import sys", "zzzzzz"):
        for mode in ("missing", "popular", "always"):
            got = engine.suggest_query(q, distance=2, limit_per_term=3,
                                       mode=mode)
            want = oracle.suggest_query(q, distance=2, limit_per_term=3,
                                        mode=mode)
            assert got == want, (q, mode)
            changed += got["changed"]
    assert changed >= 3, "whole-query rewrite must be nonvacuous"

    got = engine.suggest_query("parze the tokn stream", mode="missing")
    present = {t for (f, t) in oracle.postings if f == "content"}
    for ent in got["terms"]:
        if ent["term"] in present:
            assert ent["suggestions"] == [], ent
    assert not engine.suggest_query("", mode="missing")["changed"]


def test_suggest_query_batched_read_equals_per_term(engine, built_index):
    """suggest_query_terms (ONE dictionary read for all inputs) must
    equal independent per-term suggest_terms calls on both the sidecar
    and slice paths."""
    from spyglass_spark.query.expand import (suggest_query_terms,
                                             suggest_terms)

    engine.ensure_fuzzy_dict()
    stats = engine._paths("term_stats")
    inputs = ["sow", "parze", "tokn", "fn", "zzzzzz"]
    for fuzzy, dist in ((engine._fuzzy_dict_paths(), 1), (None, 1),
                        (None, 2)):
        for mode in ("missing", "popular", "always"):
            batch = suggest_query_terms(stats, "content", inputs,
                                        distance=dist, limit=4, mode=mode,
                                        fuzzy_paths=fuzzy)
            for t in inputs:
                single = suggest_terms(stats, "content", t, distance=dist,
                                       limit=4, mode=mode,
                                       fuzzy_paths=fuzzy)
                assert batch[t] == single, (t, mode, dist, fuzzy is None)
