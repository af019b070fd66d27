"""Percolator (reverse search) — stored queries evaluated against a
documents frame by broadcast equi-joins over the vectorized tokenizer's
(url, field, term) triples. Pinned against a scalar brute force using
the same compile_query grammar + scalar analyzers."""

import pytest

from spyglass_spark.analysis.analyzer import tokenize_default, tokenize_en
from spyglass_spark.ops.percolate import doc_term_pairs, percolate
from spyglass_spark.query.compiler import (compile_query,
                                           resolve_min_should_match)


def _brute_perc(docs, spec):
    spec = dict(spec) if isinstance(spec, dict) else {"query": spec}
    cq = compile_query(spec.get("query", ""), spec.get("filters", ()),
                       spec.get("boosts", ()))
    msm = resolve_min_should_match(spec.get("min_should_match", 0),
                                   len(cq.should_group))
    excl = [str(t) for t in spec.get("exclude_tags", ())]
    out = []
    for d in docs:
        fields = {
            "content": {t for _, t in tokenize_en(d["content"] or "")},
            "title": {t for _, t in tokenize_default(d["title"] or "")},
            "tags": {str(t) for t in d["tags"]},
            "id": {d["doc_id"]}, "url": {d["url"]},
        }
        term_clauses = [c for c in cq.should_group if c.kind == "term"]
        n_cl = sum(1 for c in term_clauses
                   if any(t in fields.get(c.field, set())
                          for t in c.terms))
        should = n_cl >= max(msm, 1)
        musts = all(all(t in fields.get(c.field, set()) for t in c.terms)
                    for c in cq.musts)
        nots = any(t in fields.get(c.field, set())
                   for c in cq.must_nots for t in c.terms) \
            or any(t in fields["tags"] for t in excl)
        rng = all(d.get(f) is not None
                  and (ge is None or d[f] >= ge)
                  and (le is None or d[f] <= le)
                  for f, ge, le in cq.range_musts)
        if should and musts and rng and not nots:
            out.append(d["url"])
    return sorted(out)


def test_doc_term_pairs_distinct_and_analyzed(spark, built_index):
    docs = built_index["docs"][:30]
    pairs = doc_term_pairs(spark.createDataFrame(docs)).collect()
    rows = {(r["url"], r["field"], r["term"]) for r in pairs}
    assert len(rows) == len(pairs)  # distinct by construction
    d0 = docs[0]
    exp0 = {("content", t) for _, t in tokenize_en(d0["content"])} \
        | {("title", t) for _, t in tokenize_default(d0["title"])} \
        | {("tags", str(t)) for t in d0["tags"]} \
        | {("id", d0["doc_id"]), ("url", d0["url"])}
    got0 = {(f, t) for u, f, t in rows if u == d0["url"]}
    assert got0 == exp0


def test_percolate_vs_bruteforce(spark, built_index):
    docs = built_index["docs"]
    tag = docs[0]["tags"][0]
    cut = sorted(d["lastmodified"] for d in docs)[len(docs) // 2]
    queries = [
        {"key": "plain", "query": "merge join table"},
        {"key": "tagged", "query": "fn index", "filters": [("tag", tag)]},
        # phrase-free msm shape: one token (content+title clauses) + a
        # boost tag clause — a multi-word text query carries phrase
        # Shoulds, which the exactness guard rejects under msm >= 2
        {"key": "msm2", "query": "index", "boosts": [("tag", tag)],
         "min_should_match": 2},
        {"key": "recent", "query": "index",
         "filters": [("lastmodified_ge", cut)]},
        {"key": "excl", "query": "merge join", "exclude_tags": [tag]},
        {"key": "never", "query": "nonexistentzzz"},
        {"key": "favreq", "query": "index sort",
         "filters": [("favorite_required", tag)]},
    ]
    got = {}
    for r in percolate(spark, spark.createDataFrame(docs),
                       queries).collect():
        got.setdefault(r["query_key"], []).append(r["url"])
    for spec in queries:
        exp = _brute_perc(docs, spec)
        assert got.get(spec["key"], []) == exp, spec["key"]
    assert got["plain"] and got["tagged"] and got["excl"]
    assert "never" not in got
    assert got["msm2"] and len(got["msm2"]) < len(_brute_perc(
        docs, {"query": "index", "boosts": [("tag", tag)]}))
    # guards: phrase under msm>=2 / dup keys / all-stopword
    with pytest.raises(ValueError, match="min_should_match"):
        percolate(spark, spark.createDataFrame(docs[:2]),
                  [{"key": "p", "query": "merge join",
                    "min_should_match": 2}])
    with pytest.raises(ValueError, match="duplicate"):
        percolate(spark, spark.createDataFrame(docs[:2]),
                  [{"key": "a", "query": "fn"}, {"key": "a", "query": "fn"}])
    with pytest.raises(ValueError, match="Should"):
        percolate(spark, spark.createDataFrame(docs[:2]),
                  [{"key": "e", "query": ""}])


def test_cli_percolate(spark, built_index, tmp_path, capsys):
    """percolate CLI: JSON + plain-string specs over a documents
    parquet, pinned to the brute force."""
    import json

    from spyglass_spark.cli import main

    docs = built_index["docs"]
    path = str(tmp_path / "docs.parquet")
    spark.createDataFrame(docs).write.mode("overwrite").parquet(path)
    tag = docs[0]["tags"][0]
    spec_json = json.dumps({"key": "tagged", "query": "fn index",
                            "filters": [["tag", tag]]})
    rc = main(["percolate", "--corpus", path,
               "--spec", "merge join table", "--spec", spec_json],
              spark=spark)
    out = capsys.readouterr().out
    assert rc == 0
    got: dict = {}
    for line in out.strip().splitlines():
        r = json.loads(line)
        got.setdefault(r["query_key"], []).append(r["url"])
    assert got["q0"] == _brute_perc(docs, "merge join table")
    assert got["tagged"] == _brute_perc(
        docs, {"query": "fn index", "filters": [("tag", tag)]})
