"""Segment-level semantic retrieval + LLM context assembly.

Rebuilds the reference's vector-sidecar query surface and RAG context
builder over Spark DataFrames:

- document segmentation for embedding:
  ``spyglass-model-interface/src/embedding_api.rs:40-110`` — a document
  whose token count exceeds ``max_tokens`` (2048) is split into
  ``ceil(tokens / max_tokens)`` chunks of
  ``ceil(len(content) / segment_count)`` characters taken over
  ``content.trim()``, each segment carrying INCLUSIVE char bounds
  ``(i*cps, i*cps + chunk_len - 1)``; short documents are a single
  segment ``(0, len(content)-1)``. Two reference quirks reproduced
  faithfully: the per-segment char budget is computed from the
  UNTRIMMED length while chunking walks the TRIMMED chars, and the
  stored end index is inclusive while ``pull_context`` slices with an
  exclusive end (so a partial segment's last char never renders).
- ``get_document_distance`` (entities/src/models/vec_documents.rs:141-225):
  k-NN over segment vectors with k = 3·top_x, then ROW_NUMBER per
  document ordered by distance, keep rank 1, order by distance,
  limit top_x — "a single document that has multiple segments in the
  topX will only be returned once".
- ``get_top_context`` (vec_documents.rs:227-305): k-NN with k = top_x,
  no per-document dedup, distance-ascending.
- ``get_context_for_doc`` (vec_documents.rs:307-375): every segment of
  ONE document, distance-ascending.
- ``pull_context`` / ``concat_context``
  (spyglass/src/api/handler/search.rs:276-351, golden-tested at
  :360-436): slice each hit's segment out of the document content and
  assemble the "Context for all documents" prompt string, grouping
  segments by document in first-appearance (best-distance) order.

Distance metric is Euclidean L2 (``vec_distance_L2``, the sqlite-vec
default the reference queries use), rounded to 4 dp with deterministic
``(doc_id, segment_start)`` tie-breaks so ranks are reproducible at any
parallelism (the sqlite sidecar's tie order is unspecified; ours is
pinned).

Scale notes (100 TB): segmentation is a row-multiplying projection that
stays in whole-stage codegen (``sequence``/``explode``, no Python) —
repartition a single-file input first (CLAUDE.md gotcha). The k-NN is
``orderBy(distance).limit(k)`` → TakeOrderedAndProject: per-partition
top-k then a driver merge of P·k rows, never a full shuffle. The
per-document ROW_NUMBER window runs on ≤k = 3·top_x rows (driver-bounded,
constant). For billion-segment corpora swap the brute-force scan for the
IVF-indexed candidate stream (ops/similarity.py ``ivf_cosine_topk_indexed``)
and feed its candidates through the same rank-1 dedup — the operators
below only assume a (segments + distance) frame. Token counting uses a
whitespace proxy for the reference's model tokenizer (the BPE model is
out of rebuild scope); the splitting arithmetic is exact given the count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MAX_TOKENS = 2048  # embedding_api.rs:7
DOC_SEPARATOR = ("\n\n------------------------------------------------"
                 "-----------------\n\n")


# ---------------------------------------------------------------------------
# segmentation (embedding_api.rs:40-110)
# ---------------------------------------------------------------------------

def whitespace_token_count(trimmed: Column) -> Column:
    """Whitespace token count — the deterministic stand-in for the
    reference's model tokenizer (embedding_api.rs:57-60 encodes with the
    embedding model's BPE; that model is out of rebuild scope)."""
    return F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+")))


def segment_documents(docs: DataFrame, content_col: str = "content",
                      max_tokens: int = MAX_TOKENS,
                      token_count: Column | None = None) -> DataFrame:
    """Explode documents into embedding segments.

    Input: any frame with ``content_col`` (other columns pass through).
    Output: input columns + (segment_start, segment_end, segment_text,
    segment_count) with the reference's exact bounds arithmetic
    (embedding_api.rs:62-101): inclusive char bounds over trim(content),
    per-segment budget ``cps = ceil(len_untrimmed / ceil(tokens/max_tokens))``.
    Pure codegen — sequence/explode/substring, no Python.
    """
    trimmed = F.trim(F.col(content_col))
    toks = token_count if token_count is not None \
        else whitespace_token_count(trimmed)
    blen = F.length(F.col(content_col)).cast("long")   # UNTRIMMED (quirk)
    tlen = F.length(trimmed).cast("long")
    seg_count = F.ceil(toks.cast("double") / F.lit(float(max_tokens))) \
                 .cast("long")
    cps = F.ceil(blen.cast("double") / seg_count.cast("double")).cast("long")
    multi = (toks > F.lit(max_tokens)) & (tlen > 0)
    # number of chunks actually produced by chunks(cps) over tlen chars
    n_chunks = F.ceil(tlen.cast("double") / cps.cast("double")).cast("long")

    base = docs.withColumn("_trimmed", trimmed) \
               .withColumn("_tlen", tlen) \
               .withColumn("_blen", blen) \
               .withColumn("_cps", F.when(multi, cps)) \
               .withColumn("_n", F.when(multi, n_chunks).otherwise(F.lit(1)))
    seg = base.withColumn("_i", F.explode(
        F.sequence(F.lit(0).cast("long"), F.col("_n") - 1)))
    start = F.col("_i") * F.col("_cps")
    seg_len = F.least(F.col("_cps"), F.col("_tlen") - start)
    out = seg.select(
        *[c for c in docs.columns],
        F.when(F.col("_cps").isNotNull(), start)
         .otherwise(F.lit(0)).cast("long").alias("segment_start"),
        F.when(F.col("_cps").isNotNull(), start + seg_len - 1)
         .otherwise(F.col("_blen") - 1).cast("long").alias("segment_end"),
        F.when(F.col("_cps").isNotNull(),
               F.substring(F.col("_trimmed"),
                           (start + 1).cast("int"), seg_len.cast("int")))
         .otherwise(F.col("_trimmed")).alias("segment_text"),
        F.col("_n").cast("long").alias("segment_count"))
    return out


# ---------------------------------------------------------------------------
# distance queries (vec_documents.rs)
# ---------------------------------------------------------------------------

def l2_distance(vec_col: Column, query_vec: list[float]) -> Column:
    """Euclidean distance to a constant query vector, float64 JVM-side
    (vec_distance_L2 analog, vec_documents.rs:341)."""
    q = F.array(*[F.lit(float(x)).cast("double") for x in query_vec])
    sq = F.zip_with(F.transform(vec_col, lambda x: x.cast("double")), q,
                    lambda a, b: (a - b) * (a - b))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def _with_distance(segments: DataFrame, query_vec: list[float],
                   vec_col: str) -> DataFrame:
    return segments.withColumn(
        "distance", F.round(l2_distance(F.col(vec_col), query_vec), 4))


_TIE = ("doc_id", "segment_start")


def document_distance(segments: DataFrame, query_vec: list[float],
                      top_x: int, k: int | None = None,
                      vec_col: str = "embedding") -> DataFrame:
    """``get_document_distance`` analog (vec_documents.rs:141-225):
    k = 3·top_x nearest segments, one row per document (its best
    segment), distance-ascending, limit top_x. Returns (distance,
    doc_id, url, segment_start, segment_end)."""
    k = 3 * top_x if k is None else k
    dd = _with_distance(segments, query_vec, vec_col)
    knn = dd.orderBy("distance", *_TIE).limit(k)
    w = Window.partitionBy("doc_id").orderBy("distance", "segment_start")
    best = knn.withColumn("_rank", F.row_number().over(w)) \
              .filter(F.col("_rank") == 1)
    return best.orderBy("distance", *_TIE).limit(top_x).select(
        "distance", "doc_id", "url", "segment_start", "segment_end")


def top_context(segments: DataFrame, query_vec: list[float], top_x: int,
                vec_col: str = "embedding") -> DataFrame:
    """``get_top_context`` analog (vec_documents.rs:227-305): the top_x
    nearest segments with NO per-document dedup, distance-ascending."""
    dd = _with_distance(segments, query_vec, vec_col)
    return dd.orderBy("distance", *_TIE).limit(top_x).select(
        "distance", "doc_id", "url", "segment_start", "segment_end")


def context_for_doc(segments: DataFrame, doc_id: str,
                    query_vec: list[float],
                    vec_col: str = "embedding") -> DataFrame:
    """``get_context_for_doc`` analog (vec_documents.rs:307-375): every
    segment of one document, distance-ascending. The doc_id predicate
    prunes before the distance math (the reference restricts on the
    vec_to_indexed rowids the same way)."""
    dd = _with_distance(segments.filter(F.col("doc_id") == doc_id),
                        query_vec, vec_col)
    return dd.orderBy("distance", *_TIE).select(
        "distance", "doc_id", "url", "segment_start", "segment_end")


# ---------------------------------------------------------------------------
# context assembly (search.rs:276-351)
# ---------------------------------------------------------------------------

def pull_context(distances: DataFrame, docs: DataFrame,
                 content_col: str = "content") -> DataFrame:
    """Join DocDistance rows to document content and slice the segment
    (search.rs:322-351): the FULL stored content when the bounds cover
    the whole document (segment_start == 0 and segment_end ==
    len(content)-1), else chars [start, end) of trim(content) — the
    exclusive end reproduces the reference's ``index < segment_end``
    filter. Join is a broadcast of the ≤top_x hit rows against the doc
    store, content fetched only for matched docs."""
    d = docs.select(F.col("doc_id").alias("_cid"),
                    F.col(content_col).alias("_content"))
    j = distances.join(F.broadcast(d),
                       distances["doc_id"] == F.col("_cid"), "left")
    whole = (F.col("segment_start") == 0) & \
            (F.col("segment_end") == F.length("_content") - 1)
    sliced = F.substring(F.trim(F.col("_content")),
                         (F.col("segment_start") + 1).cast("int"),
                         (F.col("segment_end")
                          - F.col("segment_start")).cast("int"))
    return j.withColumn("context",
                        F.when(whole, F.col("_content")).otherwise(sliced)) \
            .drop("_cid", "_content")


def rust_f64_str(x: float) -> str:
    """Rust ``{}`` Display for f64: integral values print without a
    fractional part ("2", not "2.0"); otherwise shortest round-trip,
    which Python's repr also produces."""
    f = float(x)
    if f.is_integer() and abs(f) < 1e16:
        return str(int(f))
    return repr(f)


def concat_context(rows) -> str:
    """``concat_context`` analog (search.rs:276-320): rows are
    DocDistance+context records ALREADY distance-ordered (the reference
    receives them sorted). Documents appear in first-appearance order;
    each document's segments keep their input order and are enumerated
    from 0. Byte-exact against the reference golden
    (search.rs:360-436, test_concat_context). Driver-side by design —
    the input is the ≤top_x hit set, never corpus-scale."""
    order: list[str] = []
    grouped: dict[str, list] = {}
    for r in rows:
        d = r["doc_id"]
        if d not in grouped:
            grouped[d] = []
            order.append(d)
        grouped[d].append(r)
    out = ["Context for all documents\n"]
    for d in order:
        group = grouped[d]
        first = group[0]
        out.append(DOC_SEPARATOR)
        out.append(f"Document UUID: {first['doc_id']} URL: {first['url']} "
                   f"\n\n ")
        for i, r in enumerate(group):
            ctx = r["context"]
            if ctx is None:
                continue  # searcher.get miss → segment skipped (search.rs:311)
            out.append(f"Context Segment -- #{i} -- score "
                       f"#{rust_f64_str(r['distance'])}\n\n "
                       f"Context Text: {ctx} \n\n")
    return "".join(out)


def assemble_context(segments: DataFrame, docs: DataFrame,
                     query_vec: list[float], top_x: int,
                     vec_col: str = "embedding",
                     content_col: str = "content") -> str:
    """End-to-end ``search_docs`` context path: top_x nearest segments →
    pull_context slices → concat_context prompt string."""
    dd = top_context(segments, query_vec, top_x, vec_col=vec_col)
    rows = pull_context(dd, docs, content_col=content_col) \
        .orderBy("distance", *_TIE).collect()
    return concat_context(rows)
