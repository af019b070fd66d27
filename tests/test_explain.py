"""SearchEngine.explain — per-clause score breakdown (tantivy
Query::explain analog). The invariant that matters: for every hit a
search returns, explain's float32 clause-order sum is BITWISE the hit's
score, and its boolean gate agrees with hit membership."""

import numpy as np
import pytest

QUERIES = [
    "fn index",                      # two content terms + title terms
    "merge join table",              # multi-term + phrase clause
    "the fast key order sort",       # stopword holes → phrase slop
    "zzz_nonexistent_term",          # no dictionary hit
]


@pytest.fixture(scope="module")
def eng(spark, built_index):
    from spyglass_spark.query.executor import SearchEngine

    return SearchEngine(spark, built_index["index_dir"])


@pytest.mark.parametrize("query", QUERIES)
def test_explain_matches_search_scores(eng, query):
    hits = eng.search(query, k=20).collect()
    for h in hits[:8]:
        ex = eng.explain(query, h["url"])
        assert ex["found"] and ex["matches"], (query, h["url"])
        assert np.float32(ex["score"]) == np.float32(h["score"]), (
            f"{query} @ {h['url']}: explain {ex['score']} != "
            f"search {h['score']}")
        # contributions are float32 clause-order consistent
        acc = np.float32(0.0)
        for c in ex["clauses"]:
            if c["matched"]:
                acc = np.float32(acc + np.float32(c["contribution"]))
        assert acc == np.float32(h["score"])
        # every matched scoring clause carries the evidence fields
        for c in ex["clauses"]:
            if c["matched"] and c["contribution"] > 0:
                assert c["tf"] >= 1 and c["fieldnorm"] >= 0
                assert c["weight"] > 0


def test_explain_nonmatching_doc(eng, built_index):
    hits = {h["url"] for h in eng.search("fn index", k=1000).collect()}
    miss = next(d for d in built_index["docs"] if d["url"] not in hits)
    ex = eng.explain("fn index", miss["url"])
    assert ex["found"] is True
    assert ex["matches"] is False
    assert ex["score"] == 0.0 or not any(
        c["matched"] for c in ex["clauses"] if c["role"] == "should")


def test_status_app_status_analog(eng, built_index):
    s = eng.status()
    assert s["num_docs"] == len(built_index["docs"])
    assert s["generations"] >= 1 and s["num_partitions"] == built_index["P"]
    assert s["field_totals"]["content"] > 0
    assert s["tombstoned_ids"] == 0 and s["tombstone_dirs"] == 0


def test_explain_unknown_url(eng):
    ex = eng.explain("fn index", "repo://nope/never@" + "0" * 40)
    assert ex == {"url": "repo://nope/never@" + "0" * 40, "found": False,
                  "matches": False, "score": 0.0, "clauses": []}


def test_explain_tag_filter_gate(eng, built_index):
    """A tag Must (boost 0) flips matches without changing the score."""
    tags_dim = built_index["tags_dim"]
    hit = eng.search("fn index", k=1).collect()[0]
    doc = next(d for d in built_index["docs"] if d["url"] == hit["url"])
    have = doc["tags"][0]
    lack = next(t["id"] for t in tags_dim if t["id"] not in doc["tags"])

    ex_ok = eng.explain("fn index", hit["url"], filters=[("tag", have)])
    assert ex_ok["matches"] is True
    assert np.float32(ex_ok["score"]) == np.float32(hit["score"])
    tag_clause = next(c for c in ex_ok["clauses"]
                      if c["role"] == "must" and c["field"] == "tags")
    assert tag_clause["matched"] and tag_clause["contribution"] == 0.0

    ex_no = eng.explain("fn index", hit["url"], filters=[("tag", lack)])
    assert ex_no["matches"] is False
    missing = next(c for c in ex_no["clauses"]
                   if c["role"] == "must" and c["field"] == "tags")
    assert missing["matched"] is False


def test_explain_phrase_clause_detail(eng, built_index):
    """A multi-term query's phrase clause reports the phrase-match tf and
    the summed-idf weight (SURVEY 2.11: phrase weight = boost·Σidf·(k1+1)).
    The bigram is lifted from a real document so the content phrase clause
    provably matches that document."""
    from spyglass_spark.analysis.analyzer import tokenize_en

    doc = built_index["docs"][11]
    toks = [t for _, t in tokenize_en(doc["content"] or "")]
    raw = (doc["content"] or "").split()
    # adjacent raw words that both survive analysis
    pair = None
    for a, b in zip(raw, raw[1:]):
        ta = [t for _, t in tokenize_en(a)]
        tb = [t for _, t in tokenize_en(b)]
        if len(ta) == 1 and len(tb) == 1:
            pair = (a, b)
            break
    assert pair, "corpus doc has no analyzable adjacent words"
    query = f"{pair[0]} {pair[1]}"
    ex = eng.explain(query, doc["url"])
    assert ex["found"] and ex["matches"]
    pc = [c for c in ex["clauses"] if c["kind"] == "phrase"
          and c["field"] == "content"]
    assert pc and pc[0]["matched"]
    for c in pc:
        assert c["tf"] >= 1
        assert len(c["df"]) == len(c["terms"]) >= 2
    assert toks  # the analyzed doc is non-trivial


def test_explain_dict_shapes_and_combiner(eng):
    """explain accepts any _compile_arg shape: a dismax dict reports the
    combined score bitwise vs search, and a parsed string's '+' group
    gates membership."""
    q = {"query": "merge join table", "combiner": "dismax",
         "tie_breaker": 0.35}
    hits = eng.search("merge join table", k=8, combiner="dismax",
                      tie_breaker=0.35).collect()
    assert hits
    for h in hits[:4]:
        ex = eng.explain(q, h["url"])
        assert ex["matches"]
        assert np.float32(ex["score"]) == np.float32(h["score"]), h["url"]

    phits = eng.search_parsed("+fn main", k=8).collect()
    assert phits
    ex = eng.explain({"parsed": "+fn main"}, phits[0]["url"])
    assert ex["matches"]
    assert np.float32(ex["score"]) == np.float32(phits[0]["score"])
    # a doc outside the '+' group must gate to matches=False even if it
    # matches the bare word — a 'merge' hit that is NOT a 'struct' hit
    # (independent corpus words, so this set is nonempty)
    st_urls = {h["url"] for h in eng.search("struct", k=500).collect()}
    only_merge = [h for h in eng.search("merge", k=500).collect()
                  if h["url"] not in st_urls]
    assert only_merge
    ex = eng.explain({"parsed": "+struct merge"}, only_merge[0]["url"])
    assert ex["found"] and not ex["matches"]
