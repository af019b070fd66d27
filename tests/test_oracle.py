"""Oracle engine semantics tests, including a replication of the
reference's own E2E suite (/root/reference/crates/spyglass-searcher/src/lib.rs:180-317)."""

import numpy as np
import pytest

from spyglass_spark.oracle.engine import OracleIndex
from spyglass_spark.query.compiler import compile_query, compile_document_query
from spyglass_spark.query.scoring import (
    K1, B, idf, bm25_weight, norm_cache, sloppy_phrase_count, phrase_slop)

MICE_CONTENT = (
    "A few miles south of Soledad, the Salinas River drops in close to the hillside "
    "bank and runs deep and green. The water is warm too, for it has slipped twinkling "
    "over the yellow sands in the sunlight before reaching the narrow pool. On one "
    "side of the river the golden foothill slopes curve up to the strong and rocky "
    "Gabilan Mountains, but on the valley side the water is lined with trees—willows "
    "fresh and green with every spring, carrying in their lower leaf junctures the "
    "debris of the winter’s flooding; and sycamores with mottled, white, recumbent "
    "limbs and branches that arch over the pool"
)
LOREM_CONTENT = (
    "Lorem ipsum dolor sit amet, consectetur adipiscing elit. Nulla "
    "tellus tortor, varius sit amet fermentum a, finibus porttitor erat."
)
FRANK_CONTENT = (
    "You will rejoice to hear that no disaster has accompanied the commencement of an "
    "enterprise which you have regarded with such evil forebodings. I arrived here "
    "yesterday, and my first task is to assure my dear sister of my welfare and "
    "increasing confidence in the success of my undertaking."
)


def _test_index() -> OracleIndex:
    docs = [
        dict(doc_id="d1", title="Of Mice and Men", domain="example.com",
             url="https://example.com/mice_and_men", content=MICE_CONTENT, tags=[1]),
        dict(doc_id="d2", title="Of Mice and Men", domain="en.wikipedia.org",
             url="https://en.wikipedia.org/mice_and_men", content=MICE_CONTENT, tags=[2]),
        dict(doc_id="d3", title="Of Cheese and Crackers", domain="en.wikipedia.org",
             url="https://en.wikipedia.org/cheese_and_crackers", content=LOREM_CONTENT, tags=[2]),
        dict(doc_id="d4", title="Frankenstein: The Modern Prometheus", domain="monster.com",
             url="https://example.com/frankenstein", content=FRANK_CONTENT, tags=[1]),
    ]
    return OracleIndex.build(docs)


def test_basic_lense_search():
    # lib.rs:279-290 — "salinas" + Tag(2) filter → exactly 1 hit
    idx = _test_index()
    hits = idx.search("salinas", filters=[("tag", 2)], k=5)
    assert len(hits) == 1
    assert hits[0]["doc_id"] == "d2"


def test_negative_salinasd():
    # lib.rs:305-316 — "salinasd" → 0 hits
    idx = _test_index()
    hits = idx.search("salinasd", filters=[("tag", 2)], k=5)
    assert hits == []


def test_unfiltered_salinas_two_hits():
    idx = _test_index()
    hits = idx.search("salinas", k=5)
    assert {h["doc_id"] for h in hits} == {"d1", "d2"}


def test_multi_term_phrase_boost_ranks_phrase_doc_first():
    idx = _test_index()
    hits = idx.search("salinas river", k=5)
    assert len(hits) == 2
    # both docs identical content → identical scores; tie-break by ordinal
    # (url asc): en.wikipedia.org sorts before example.com
    assert hits[0]["doc_id"] == "d2"
    assert hits[0]["score"] == hits[1]["score"]


def test_title_match_scores():
    idx = _test_index()
    hits = idx.search("frankenstein", k=5)
    assert hits and hits[0]["doc_id"] == "d4"


def test_stemmed_query_matches():
    idx = _test_index()
    # "mountains" stems to "mountain"; doc has "Mountains" → same stem
    hits = idx.search("mountain", k=5)
    assert {h["doc_id"] for h in hits} == {"d1", "d2"}


def test_stopword_only_query():
    idx = _test_index()
    # "the" is a stopword for content but NOT for title tokenizer
    hits = idx.search("the", k=5)
    # title tokenizer keeps "the" but no title contains it → also check none
    assert all(h["score"] > 0 for h in hits)


def test_boost_tag_increases_score():
    idx = _test_index()
    plain = idx.search("salinas", k=5)
    boosted = idx.search("salinas", boosts=[("tag", 2)], k=5)
    assert boosted[0]["doc_id"] == "d2"
    assert boosted[0]["score"] > plain[0]["score"]


def test_url_boost():
    idx = _test_index()
    hits = idx.search("salinas", boosts=[("url", "https://example.com/mice_and_men")], k=5)
    assert hits[0]["doc_id"] == "d1"


def test_offset_pagination():
    idx = _test_index()
    all_hits = idx.search("salinas", k=5)
    page2 = idx.search("salinas", k=1, offset=1)
    assert page2[0]["doc_id"] == all_hits[1]["doc_id"]
    assert page2[0]["rank"] == 2


def test_favorite_required_filter():
    idx = _test_index()
    hits = idx.search("salinas", filters=[("favorite_required", 1)], k=5)
    assert len(hits) == 1 and hits[0]["doc_id"] == "d1"


def test_document_query():
    idx = _test_index()
    cq = compile_document_query(urls=["https://example.com/mice_and_men",
                                      "https://example.com/frankenstein"])
    hits = idx.execute(cq, k=10)
    # boost-0 clauses → score 0 → dropped by score>0 filter, like the
    # reference's DocSetCollector path which skips scoring entirely; use
    # match-set semantics instead
    matched = set()
    for grp in cq.extra_groups:
        for c in grp:
            matched |= idx._matches(c)
    assert len(matched) == 2


def test_score_is_float32_and_deterministic():
    idx = _test_index()
    h1 = idx.search("water valley spring", k=5)
    h2 = idx.search("water valley spring", k=5)
    assert [h["score"] for h in h1] == [h["score"] for h in h2]
    for h in h1:
        assert h["score"] == float(np.float32(h["score"]))


# --- scoring math unit tests ------------------------------------------

def test_idf_formula():
    # N=4, df=2 → ln(1 + 2.5/2.5) = ln 2
    assert np.isclose(idf(2, 4), np.log(np.float32(2.0)), rtol=1e-6)


def test_bm25_hand_computed():
    # single doc field, tf=2, |d|=4 (exact below 41), avgdl=4:
    # norm = k1*(1-b+b*1) = k1 → score = idf*(k1+1)*2/(2+1.2)
    w = bm25_weight(1, 2, 1.0)  # N=2, df=1 → idf = ln(1+1.5/1.5)=ln2
    cache = norm_cache(4.0)
    from spyglass_spark.query.scoring import score_postings
    s = score_postings(np.array([2]), np.array([4]), float(w), cache)
    expected = np.float32(np.log(2.0)) * np.float32(2.2) * np.float32(2.0 / (2.0 + 1.2))
    assert np.isclose(s[0], expected, rtol=1e-6)


def test_phrase_slop_clamp():
    assert phrase_slop(0) == 0
    assert phrase_slop(2) == 0
    assert phrase_slop(3) == 1
    assert phrase_slop(5) == 3
    assert phrase_slop(50) == 3


def test_sloppy_phrase_count_exact():
    # "quick brown fox" at positions 0,1,2
    pls = [np.array([0, 10], dtype=np.uint64), np.array([1], dtype=np.uint64),
           np.array([2, 12], dtype=np.uint64)]
    assert sloppy_phrase_count(pls, [0, 1, 2], 0) == 1


def test_sloppy_phrase_count_with_holes():
    # query positions 0 and 3 (stopword holes): doc positions must differ by 3
    pls = [np.array([5], dtype=np.uint64), np.array([8], dtype=np.uint64)]
    assert sloppy_phrase_count(pls, [0, 3], 0) == 1
    assert sloppy_phrase_count(pls, [0, 2], 0) == 0
    assert sloppy_phrase_count(pls, [0, 2], 1) == 1
