"""Embedding-distance boosts blended into BM25 search.

Replicates the reference's semantic-boost path
(/root/reference/crates/spyglass/src/api/handler/search.rs:66-123):
the query embedding's 10 nearest docs by L2 distance, filtered to
distance < 25, are min-max normalized to DocId boosts in [0, 3]
(nearest → 3.0) and appended to the BM25 query's boost list; the
ordinary scorer then adds `boost · idf · (k1+1) · tf/(tf+norm)` for the
boosted doc-id terms.

The distance source in the reference is a sqlite-vec sidecar; here it is
any DataFrame of (doc_id, distance) — typically `similarity.l2_topk`
joined to the vec→doc mapping. The boost arithmetic is float64 then cast
to float32 exactly like the reference (`boost as f32`).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

MAX_DISTANCE = 25.0
BOOST_SPAN = 3.0


def distance_boosts(distances: list[tuple[str, float]],
                    max_distance: float = MAX_DISTANCE) -> list[tuple]:
    """(doc_id, distance) pairs → [("docid", doc_id, boost)] boost specs
    (search.rs:80-110): keep distance < max_distance, sort ascending,
    min-max normalize, boost = 3.0 − normalized·3.0, cast f32.

    Deviation from the reference (documented): with exactly one surviving
    distance the reference computes 0.0/0.0 = NaN; we define the
    degenerate max==min case as boost 3.0 (the limit from both sides)."""
    kept = sorted(((d, float(dist)) for d, dist in distances
                   if float(dist) < max_distance), key=lambda x: x[1])
    if not kept:
        return []
    dmin = kept[0][1]
    dmax = kept[-1][1]
    span = dmax - dmin
    out = []
    for doc_id, dist in kept:
        normalized = (dist - dmin) / span * BOOST_SPAN if span > 0.0 else 0.0
        out.append(("docid", doc_id, float(np.float32(BOOST_SPAN - normalized))))
    return out


def search_with_semantic_boost(engine, query: str, distances: DataFrame,
                               filters=(), boosts=(), k: int = 5,
                               offset: int = 0,
                               max_distance: float = MAX_DISTANCE) -> DataFrame:
    """The full search_docs semantic path: ``distances`` is a DataFrame
    with columns (doc_id, distance) — ALREADY limited to the ~10 nearest
    (the reference asks its vector store for 10). The rows are collected
    (≤10, driver-tiny), converted to DocId boosts, and appended to any
    caller boosts before the ordinary BM25 search."""
    rows = distances.select("doc_id", "distance").collect()
    sem = distance_boosts([(r["doc_id"], r["distance"]) for r in rows],
                          max_distance)
    return engine.search(query, filters=filters, boosts=list(boosts) + sem,
                         k=k, offset=offset)


def rrf_fuse(text_ranked: DataFrame, vec_ranked: DataFrame, k: int = 10,
             rank_constant: int = 60, id_col: str = "url") -> DataFrame:
    """Hybrid retrieval by reciprocal-rank fusion — the ES 8 hybrid
    search contract (BM25 ⊕ kNN, `rank: {rrf}`): two independently
    ranked lists fuse by score(d) = Σ_lists 1/(rank_constant + rank_d)
    over the lists containing d, top-k by (rrf desc, id asc — total
    order). Inputs: two (id_col, rank) frames (any retriever that emits
    ranks: `SearchEngine.search`, `similarity.cosine_topk` + a rank
    window, ...). Output (rank, <id_col>, rrf_score, text_rank,
    vec_rank) with -1 echoing an absent side (no NULLs — the driver's
    row-sort contract).

    Arithmetic: ranks are ints; each reciprocal is ONE double divide
    and the sum is a fixed two-term order (text + vec), so a scalar
    oracle replicates the score bitwise. Scale shape: both inputs are
    O(n_each) rows (the retrievers already truncated), the fusion is a
    full-outer join + TakeOrderedAndProject over O(2·n_each) — the fuse
    itself never touches the corpus."""
    if k <= 0:
        raise ValueError("k must be positive")
    if rank_constant <= 0:
        raise ValueError("rank_constant must be positive")
    from pyspark.sql import Window

    a = text_ranked.select(F.col(id_col), F.col("rank").alias("_ra"))
    b = vec_ranked.select(F.col(id_col), F.col("rank").alias("_rb"))
    j = a.join(b, id_col, "full_outer")
    rc = F.lit(float(rank_constant))

    def contrib(c):
        return F.when(c.isNotNull(),
                      F.lit(1.0) / (rc + c.cast("double"))) \
                .otherwise(F.lit(0.0))

    out = j.select(
        id_col,
        (contrib(F.col("_ra")) + contrib(F.col("_rb")))
        .alias("rrf_score"),
        F.coalesce("_ra", F.lit(-1)).cast("int").alias("text_rank"),
        F.coalesce("_rb", F.lit(-1)).cast("int").alias("vec_rank"))
    order = [F.desc("rrf_score"), F.asc(id_col)]
    w = Window.orderBy(*order)
    return (out.orderBy(*order).limit(int(k))
               .withColumn("rank", F.row_number().over(w))
               .select("rank", id_col, "rrf_score", "text_rank",
                       "vec_rank"))
