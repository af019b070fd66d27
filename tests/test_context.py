"""Segment-level semantic retrieval + context assembly
(spyglass_spark/ops/context.py) against the reference semantics:

- concat_context golden: byte-for-byte the expected string from the
  reference's own test (spyglass/src/api/handler/search.rs:360-436,
  test_concat_context) with the same three documents and four
  DocDistance rows.
- segmentation: embedding_api.rs:40-110 arithmetic (untrimmed-length
  char budget over trimmed chars, inclusive ends) pinned against an
  independent pure-Python reimplementation.
- document_distance: k=3·top_x + rank-1-per-doc + top_x semantics
  (vec_documents.rs:141-225) pinned against brute-force numpy.
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, DoubleType, LongType, StringType,
                               StructField, StructType)

from spyglass_spark.ops.context import (MAX_TOKENS, assemble_context,
                                        concat_context, document_distance,
                                        pull_context, rust_f64_str,
                                        segment_documents, top_context)

# --- the reference golden (search.rs:362) -----------------------------------
EXPECTED = (
    "Context for all documents\n\n\n"
    "-----------------------------------------------------------------\n\n"
    "Document UUID: 1234 URL: ahhh \n\n "
    "Context Segment -- #0 -- score #2\n\n "
    "Context Text: What is this that we \n\n"
    "Context Segment -- #1 -- score #4\n\n "
    "Context Text: are doing. Well not \n\n\n\n"
    "-----------------------------------------------------------------\n\n"
    "Document UUID: 1234_abc URL: http://1234_abc \n\n "
    "Context Segment -- #0 -- score #3\n\n "
    "Context Text: Here is another docu \n\n\n\n"
    "-----------------------------------------------------------------\n\n"
    "Document UUID: 1234_abc_567 URL: http://1234_abc_567 \n\n "
    "Context Segment -- #0 -- score #5\n\n "
    "Context Text: Got one last documen \n\n"
)

DOCS = [
    ("1234", "What is this that we are doing. Well not sure yet maybe "
             "something"),
    ("1234_abc", "Here is another document that we have here so this is abc"),
    ("1234_abc_567", "Got one last document for this test and we have at "
                     "least 20 chars"),
]

DISTANCES = [  # (distance, doc_id, url, segment_start, segment_end)
    (2.0, "1234", "ahhh", 0, 20),
    (3.0, "1234_abc", "http://1234_abc", 0, 20),
    (4.0, "1234", "ahhh", 21, 40),
    (5.0, "1234_abc_567", "http://1234_abc_567", 0, 20),
]

DD_SCHEMA = StructType([
    StructField("distance", DoubleType()),
    StructField("doc_id", StringType()),
    StructField("url", StringType()),
    StructField("segment_start", LongType()),
    StructField("segment_end", LongType()),
])


def test_concat_context_reference_golden(spark):
    dd = spark.createDataFrame(DISTANCES, DD_SCHEMA)
    docs = spark.createDataFrame(DOCS, ["doc_id", "content"])
    rows = pull_context(dd, docs).orderBy("distance").collect()
    assert concat_context(rows) == EXPECTED


def test_pull_context_whole_document(spark):
    content = DOCS[0][1]
    dd = spark.createDataFrame(
        [(1.0, "1234", "u", 0, len(content) - 1)], DD_SCHEMA)
    docs = spark.createDataFrame(DOCS, ["doc_id", "content"])
    row = pull_context(dd, docs).collect()[0]
    assert row["context"] == content  # untrimmed full content branch


def test_pull_context_missing_doc_skipped(spark):
    dd = spark.createDataFrame([(1.0, "ghost", "u", 0, 5)], DD_SCHEMA)
    docs = spark.createDataFrame(DOCS, ["doc_id", "content"])
    rows = pull_context(dd, docs).collect()
    assert rows[0]["context"] is None
    # the missing-doc segment renders nothing, the envelope survives
    assert "Context Text" not in concat_context(rows)
    assert "Document UUID: ghost" in concat_context(rows)


def test_rust_f64_display():
    assert rust_f64_str(2.0) == "2"
    assert rust_f64_str(4.0) == "4"
    assert rust_f64_str(2.5) == "2.5"
    assert rust_f64_str(0.1) == "0.1"


# --- segmentation ------------------------------------------------------------

def _segment_py(content: str, max_tokens: int):
    """Independent reimplementation of embedding_api.rs:62-101."""
    trimmed = content.strip()
    toks = len(trimmed.split()) if trimmed else 0
    if toks > max_tokens:
        seg_count = -(-toks // max_tokens)
        cps = -(-len(content) // seg_count)          # UNTRIMMED length
        chars = list(trimmed)
        out = []
        for i in range(0, len(chars), cps):
            chunk = chars[i:i + cps]
            out.append((i, i + len(chunk) - 1, "".join(chunk)))
        return out
    return [(0, len(content) - 1, trimmed)]


CORPUS = [
    "short doc",
    "  padded with spaces   ",
    " ".join(f"tok{i}" for i in range(50)),
    "  " + " ".join(f"word{i % 7}x{i}" for i in range(137)) + "  ",
    "x" * 30 + " " + "y" * 400,
]


@pytest.mark.parametrize("max_tokens", [4, 16, MAX_TOKENS])
def test_segmentation_matches_reference_arithmetic(spark, max_tokens):
    docs = spark.createDataFrame([(str(i), c) for i, c in enumerate(CORPUS)],
                                 ["doc_id", "content"])
    got = {}
    for r in segment_documents(docs, max_tokens=max_tokens).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["segment_start"], r["segment_end"], r["segment_text"]))
    for i, content in enumerate(CORPUS):
        expect = _segment_py(content, max_tokens)
        assert sorted(got[str(i)]) == sorted(expect), (i, max_tokens)


def test_segment_count_column(spark):
    docs = spark.createDataFrame([("a", CORPUS[3])], ["doc_id", "content"])
    rows = segment_documents(docs, max_tokens=16).collect()
    assert all(r["segment_count"] == len(rows) for r in rows)
    assert len(rows) == len(_segment_py(CORPUS[3], 16))


# --- distance queries --------------------------------------------------------

SEG_SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("url", StringType()),
    StructField("segment_start", LongType()),
    StructField("segment_end", LongType()),
    StructField("embedding", ArrayType(DoubleType())),
])


def _seg_rows(n_docs=6, segs_per_doc=4, dims=4, seed=7):
    rng = np.random.RandomState(seed)
    rows = []
    for d in range(n_docs):
        for s in range(segs_per_doc):
            rows.append((f"d{d}", f"u{d}", s * 10, s * 10 + 9,
                         [float(x) for x in rng.randint(0, 20, dims)]))
    return rows


def test_document_distance_semantics(spark):
    rows = _seg_rows()
    q = [1.0, 2.0, 3.0, 4.0]
    top_x = 4
    out = document_distance(
        spark.createDataFrame(rows, SEG_SCHEMA), q, top_x).collect()
    # brute force: k=3*top_x nearest segments, best per doc, top_x docs
    dist = sorted(
        (round(math.sqrt(sum((a - b) ** 2 for a, b in zip(e, q))), 4),
         doc, url, s0, s1)
        for doc, url, s0, s1, e in rows)
    knn = dist[:3 * top_x]
    seen, best = set(), []
    for rec in knn:                       # distance-asc: first hit per doc
        if rec[1] not in seen:
            seen.add(rec[1])
            best.append(rec)
    expect = best[:top_x]
    got = [(r["distance"], r["doc_id"], r["url"], r["segment_start"],
            r["segment_end"]) for r in out]
    assert got == expect
    # dedup really happened: no doc twice
    assert len({g[1] for g in got}) == len(got)


def test_top_context_no_dedup(spark):
    rows = _seg_rows(n_docs=2, segs_per_doc=6)
    q = [0.0, 0.0, 0.0, 0.0]
    out = top_context(spark.createDataFrame(rows, SEG_SCHEMA), q, 5).collect()
    assert len(out) == 5
    assert [r["distance"] for r in out] == sorted(r["distance"] for r in out)
    # with 2 docs and 5 hits, at least one doc repeats (no rank-1 filter)
    assert len({r["doc_id"] for r in out}) < 5


def test_context_for_doc_all_segments_sorted(spark):
    from spyglass_spark.ops.context import context_for_doc

    rows = _seg_rows(n_docs=3, segs_per_doc=5)
    q = [2.0, 2.0, 2.0, 2.0]
    out = context_for_doc(
        spark.createDataFrame(rows, SEG_SCHEMA), "d1", q).collect()
    assert len(out) == 5                        # every segment of d1
    assert all(r["doc_id"] == "d1" for r in out)
    ds = [r["distance"] for r in out]
    assert ds == sorted(ds)                     # distance-ascending


def test_assemble_context_end_to_end(spark):
    """Segmentation → pseudo-embeddings → top_context → golden-format
    envelope, all on a deterministic corpus."""
    docs = spark.createDataFrame(
        [(f"doc{i}", f"url://{i}",
          " ".join(f"w{i}t{j}" for j in range(40))) for i in range(5)],
        ["doc_id", "url", "content"])
    segs = segment_documents(docs, max_tokens=8)
    segs = segs.withColumn("embedding", F.array(*[
        (F.length("segment_text") * F.lit(float(k + 1))).cast("double")
        for k in range(3)]))
    txt = assemble_context(segs, docs, [10.0, 20.0, 30.0], top_x=3)
    assert txt.startswith("Context for all documents\n")
    assert txt.count("Context Segment --") == 3
    # deterministic across runs
    assert txt == assemble_context(segs, docs, [10.0, 20.0, 30.0], top_x=3)
