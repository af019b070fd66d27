"""search_after cursor paging: pages must concatenate to exactly the
one-shot top-N (doc order AND bitwise float32 scores), WAND ≡ exhaustive
on every page, at k=1 granularity so any tie-break slip shows up.

The cursor (score, doc_ord) makes deep paging O(k) per page instead of
offset's O(offset) driver merge — the 10^12-doc page-depth story; these
tests pin its correctness on the same 200-doc / P=8 index the
rank-identity gate uses (plenty of cross-part score ties)."""

import numpy as np
import pytest

pyspark = pytest.importorskip("pyspark")

QUERIES = [
    {"query": "fn"},                      # hot term, many ties
    {"query": "import sys"},              # phrase
    {"query": "parse token stream"},      # multi-term
    {"query": "the parsing of tokens"},   # stopword holes
]


@pytest.fixture(scope="module")
def engine(spark, built_index):
    from spyglass_spark.query.executor import SearchEngine

    return SearchEngine(spark, built_index["index_dir"])


def _rows(df):
    return [(r["doc_id"], np.float32(r["score"]), r["doc_ord"])
            for r in sorted(df.collect(), key=lambda r: r["rank"])]


def _paged(engine, query, k, algo="auto", max_pages=200):
    out, cursor = [], None
    for _ in range(max_pages):
        page = _rows(engine.search(query, k=k, algo=algo,
                                   search_after=cursor))
        if not page:
            break
        out.extend(page)
        cursor = (float(page[-1][1]), int(page[-1][2]))
    return out


@pytest.mark.parametrize("q", [q["query"] for q in QUERIES])
def test_pages_concatenate_to_one_shot_topn(engine, q):
    full = _rows(engine.search(q, k=500))
    assert full, f"query {q!r} must match something for the test to bite"
    paged = _paged(engine, q, k=3)
    assert paged == full
    # k=1 pages walk the order one doc at a time — the strictest
    # tie-break exercise (the corpus has cross-part score ties)
    assert _paged(engine, q, k=1, max_pages=len(full) + 2) == full


def test_wand_and_exhaustive_pages_identical(engine):
    q = "fn"
    full = _rows(engine.search(q, k=500))
    cursor = None
    for _ in range(len(full) // 2 + 2):
        auto = _rows(engine.search(q, k=2, algo="auto", search_after=cursor))
        exh = _rows(engine.search(q, k=2, algo="exhaustive",
                                  search_after=cursor))
        assert auto == exh
        if not auto:
            break
        cursor = (float(auto[-1][1]), int(auto[-1][2]))
    else:
        pytest.fail("paging did not terminate")
    assert _paged(engine, q, k=2, algo="exhaustive") == full


def test_cursor_past_last_hit_is_empty(engine):
    full = _rows(engine.search("fn", k=500))
    last = full[-1]
    page = engine.search("fn", k=5,
                         search_after=(float(last[1]), int(last[2])))
    assert page.count() == 0


def test_cursor_with_filters_and_batch(engine, built_index):
    """Cursors compose with tag filters, and search_many carries an
    independent cursor per batch entry."""
    tags_dim = built_index["tags_dim"]
    rs_tag = next(t["id"] for t in tags_dim
                  if t["label"] == "lens" and t["value"] == "rs")
    filt = [("tag", int(rs_tag))]
    full = _rows(engine.search("fn", filters=filt, k=500))
    assert len(full) > 3
    cur = (float(full[1][1]), int(full[1][2]))  # cursor at rank 2
    batch = engine.search_many(
        [{"query": "fn", "filters": filt, "after": cur},
         {"query": "fn", "filters": filt}], k=2).collect()
    by_q = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append(r)
    page2 = [(r["doc_id"], np.float32(r["score"]), r["doc_ord"])
             for r in sorted(by_q[0], key=lambda r: r["rank"])]
    page1 = [(r["doc_id"], np.float32(r["score"]), r["doc_ord"])
             for r in sorted(by_q[1], key=lambda r: r["rank"])]
    assert page1 == full[:2]
    assert page2 == full[2:4]


def test_cursor_composes_with_prefix_and_fuzzy(engine):
    """Pattern queries page with the same cursor: the expansion is
    deterministic per commit, so every page scores the identical Should
    group and pages concatenate to the one-shot ranking."""
    for one_shot, pager in [
        (engine.search_prefix("pa", k=500),
         lambda cur: engine.search_prefix("pa", k=3, search_after=cur)),
        (engine.search_fuzzy("merge", distance=1, k=500),
         lambda cur: engine.search_fuzzy("merge", distance=1, k=3,
                                         search_after=cur)),
    ]:
        full = _rows(one_shot)
        assert len(full) > 3
        out, cur = [], None
        for _ in range(len(full) // 3 + 2):
            page = _rows(pager(cur))
            if not page:
                break
            out.extend(page)
            cur = (float(page[-1][1]), int(page[-1][2]))
        assert out == full


def test_cursor_pages_match_oracle_order(engine, built_index):
    """Paged walk reproduces the scalar oracle's full ranking."""
    oracle = built_index["oracle"]
    for q in ("fn", "parse token stream"):
        expected = [(h["doc_id"], np.float32(h["score"]))
                    for h in oracle.search(q, (), (), k=500)]
        paged = [(d, s) for d, s, _ in _paged(engine, q, k=4)]
        assert paged == expected
