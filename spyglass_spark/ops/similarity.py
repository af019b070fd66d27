"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline (one narrow pass, JVM
zip_with/aggregate — no UDF); the LSH variant is the scale path: random-
hyperplane signatures bucket vectors so the query only scans its bucket.
Hyperplanes are drawn deterministically from the dataset itself (vectors
vec_id 1..nbits) so Spark and the SQL oracle agree exactly without any
external randomness.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

# Written by write_ivf_lists AFTER the centroid sidecar — the only file
# whose presence proves the whole list table (lists + _centroids) landed.
IVF_COMPLETE_SENTINEL = "_IVF_COMPLETE"


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0).cast("double"), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0).cast("double"), lambda acc, v: acc + v))


def cosine_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                exclude_ids: tuple = ()) -> DataFrame:
    """Exact brute-force cosine top-k. Returns (vec_id, cos_sim) rounded to
    4 dp, ties broken by id — deterministic at any parallelism."""
    q = F.array(*[F.lit(float(x)).cast("double") for x in query_vec])
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    out = emb.select(
        F.col(id_col).alias("vec_id"),
        F.round(_dot(vec, q) / (_norm(vec) * _norm(q)), 4).alias("cos_sim"))
    if exclude_ids:
        out = out.filter(~F.col("vec_id").isin(list(exclude_ids)))
    return out.orderBy(F.desc("cos_sim"), F.asc("vec_id")).limit(k)


def hyperplane_signature(emb: DataFrame, planes: list[list[float]],
                         id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """nbits-bit signature: bit j = 1 if dot(v, plane_j) > 0."""
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    sig = F.lit(0).cast("long")
    for j, p in enumerate(planes):
        pj = F.array(*[F.lit(float(x)).cast("double") for x in p])
        sig = sig + F.when(_dot(vec, pj) > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_vec"),
                      sig.alias("bucket"))


def lsh_cosine_topk(emb: DataFrame, query_vec: list[float],
                    planes: list[list[float]], k: int = 10,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    exclude_ids: tuple = ()) -> DataFrame:
    """LSH-bucketed ANN: restrict the cosine scan to the query's bucket.
    At scale the signature table is partitioned by bucket → the probe scans
    one partition instead of the full corpus."""
    import numpy as np

    qsig = 0
    q = np.asarray(query_vec, dtype=np.float64)
    for j, p in enumerate(planes):
        if float(np.dot(q, np.asarray(p, dtype=np.float64))) > 0:
            qsig |= 1 << j
    sigs = hyperplane_signature(emb, planes, id_col, vec_col)
    bucket = sigs.filter(F.col("bucket") == qsig)
    qarr = F.array(*[F.lit(float(x)).cast("double") for x in query_vec])
    vec = F.transform(F.col("_vec"), lambda x: x.cast("double"))
    out = bucket.select(
        "vec_id",
        F.round(_dot(vec, qarr) / (_norm(vec) * _norm(qarr)), 4).alias("cos_sim"))
    if exclude_ids:
        out = out.filter(~F.col("vec_id").isin(list(exclude_ids)))
    return out.orderBy(F.desc("cos_sim"), F.asc("vec_id")).limit(k)


def l2_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
            id_col: str = "vec_id", vec_col: str = "embedding",
            exclude_ids: tuple = ()) -> DataFrame:
    """Exact brute-force L2-distance top-k (ascending distance) — the
    distance the reference's vector sidecar returns for embedding boosts
    (get_document_distance, crates/spyglass/src/api/handler/search.rs:73-79).
    Returns (vec_id, l2_dist) rounded to 4 dp, ties by id."""
    q = F.array(*[F.lit(float(x)).cast("double") for x in query_vec])
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    diff2 = F.aggregate(F.zip_with(vec, q, lambda x, y: (x - y) * (x - y)),
                        F.lit(0.0).cast("double"), lambda acc, v: acc + v)
    out = emb.select(F.col(id_col).alias("vec_id"),
                     F.round(F.sqrt(diff2), 4).alias("l2_dist"))
    if exclude_ids:
        out = out.filter(~F.col("vec_id").isin(list(exclude_ids)))
    return out.orderBy(F.asc("l2_dist"), F.asc("vec_id")).limit(k)


def train_centroids(emb: DataFrame, k: int, iters: int = 5,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    sample_limit: int = 100_000) -> list[list[float]]:
    """Deterministic Lloyd k-means for IVF lists, ONE Spark job total.

    The bounded sample (``sample_limit`` rows by ascending id —
    deterministic) is collected once (≤ 100k×dim doubles — driver-trivial);
    seeding and Lloyd then run in chunked numpy: farthest-first traversal
    (lowest-id vector first, then repeatedly the vector minimizing
    max-cosine to the chosen set, ties → lowest id — no RNG), and each
    Lloyd iteration assigns sample rows to their max-cosine centroid in
    row blocks (bounded memory at k in the thousands).

    At 100 TB the standard recipe is exactly this: k-means quality needs
    only a representative sample, never the full corpus — the previous
    revision seeded with k−1 sequential tiny Spark jobs (4095 round trips
    at k=4096); the job count is now O(1), and the full corpus is
    assigned in one distributed pass via ``assign_ivf``."""
    import numpy as np

    rows = (emb.orderBy(F.asc(id_col)).limit(sample_limit)
            .select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
            .collect())
    if not rows:
        raise ValueError("train_centroids: empty embedding sample")
    dims = {len(r["v"]) for r in rows}
    if len(dims) != 1:
        raise ValueError(f"train_centroids: ragged embedding lengths {sorted(dims)}")
    X = np.asarray([list(r["v"]) for r in rows], dtype=np.float64)
    return train_centroids_np(X, k, iters)


def train_centroids_np(X, k: int, iters: int = 5) -> list[list[float]]:
    """The pure-numpy trainer core over an id-ascending sample matrix —
    shared by the Spark wrapper above and the fixture generator
    (tools/make_ivf_fixture.py), the same scalar-semantics-shared /
    distributed-plumbing-verified split as the search oracle."""
    import numpy as np

    n, dim = X.shape
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-300)

    BLOCK = 8192
    # farthest-first: track each row's max-cosine to the chosen set
    max_cos = np.full(n, -np.inf)
    seed_idx = [0]  # rows are id-ascending → index 0 is the lowest id
    for _ in range(1, min(k, n)):
        c = Xn[seed_idx[-1]]
        np.maximum(max_cos, Xn @ c, out=max_cos)
        max_cos[seed_idx] = np.inf  # never re-pick a seed
        seed_idx.append(int(np.argmin(max_cos)))  # argmin ties → lowest id
    cents = X[seed_idx].copy()

    for _ in range(iters):
        cn = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True),
                                1e-300)
        sums = np.zeros_like(cents)
        cnts = np.zeros(len(cents), dtype=np.int64)
        for lo in range(0, n, BLOCK):
            blk = slice(lo, min(lo + BLOCK, n))
            # max-cosine centroid, ties → lowest centroid id (argmax)
            a = np.argmax(Xn[blk] @ cn.T, axis=1)
            np.add.at(sums, a, X[blk])
            cnts += np.bincount(a, minlength=len(cents))
        new = cents.copy()  # empty lists keep their previous centroid
        nz = cnts > 0
        new[nz] = sums[nz] / cnts[nz, None]
        if np.allclose(new, cents, atol=1e-12):
            cents = new
            break
        cents = new
    return [list(map(float, c)) for c in cents]


def assign_ivf(emb: DataFrame, centroids: list[list[float]],
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF list assignment: each vector goes to its max-cosine centroid
    (ties → lowest centroid id). Centroids are supplied (in production:
    k-means trained, or a deterministic sample); the partition/probe
    plumbing is the scale path — the list table is partitioned by
    centroid so probes scan only their lists."""
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    best = None
    for cid, c in enumerate(centroids):
        cv = F.array(*[F.lit(float(x)).cast("double") for x in c])
        cos = _dot(vec, cv) / (_norm(vec) * _norm(cv))
        cand = F.struct(cos.alias("cos"), F.lit(-cid).alias("neg_cid"))
        best = cand if best is None else F.greatest(best, cand)
    return emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_vec"),
                      (-best["neg_cid"]).cast("int").alias("centroid"))


def write_ivf_lists(emb: DataFrame, centroids: list[list[float]],
                    lists_dir: str, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> None:
    """Persist the IVF list table partitioned by centroid — the scale
    path analog of the reference's vector sidecar
    (crates/spyglass-searcher/src/similarity.rs:26-60). One distributed
    assignment pass writes hive-partitioned parquet; every probe after
    that reads ONLY its nprobe list directories (Catalyst partition
    pruning on the ``centroid`` partition column — plan-asserted in
    tests/test_ops.py). Centroids ride along under ``_centroids`` (the
    leading underscore hides the sidecar from parquet discovery)."""
    assign_ivf(emb, centroids, id_col, vec_col) \
        .write.mode("overwrite").partitionBy("centroid").parquet(lists_dir)
    spark = emb.sparkSession
    cent_rows = [(cid, [float(x) for x in c]) for cid, c in enumerate(centroids)]
    (spark.createDataFrame(cent_rows, "cid int, centroid array<double>")
     .coalesce(1).write.mode("overwrite").parquet(f"{lists_dir}/_centroids"))
    # Completion sentinel, written LAST: the parquet writer drops its own
    # _SUCCESS before the centroid sidecar lands, so a crash between the
    # two would otherwise leave a half-built cache that readers trust.
    # Cache gates must check THIS file, not the writer's _SUCCESS.
    with open(os.path.join(lists_dir, IVF_COMPLETE_SENTINEL), "w") as f:
        f.write("ok\n")


def read_ivf_centroids(spark, lists_dir: str) -> list[list[float]]:
    rows = (spark.read.parquet(f"{lists_dir}/_centroids")
            .orderBy("cid").collect())
    return [list(r["centroid"]) for r in rows]


def _probe_ids(query_vec: list[float], centroids: list[list[float]],
               nprobe: int) -> list[int]:
    """The nprobe max-cosine centroid ids for a query (ties → lowest id)."""
    import numpy as np

    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.linalg.norm(q))
    sims = []
    for cid, c in enumerate(centroids):
        cv = np.asarray(c, dtype=np.float64)
        sims.append((float(np.dot(q, cv)) / (qn * float(np.linalg.norm(cv))), -cid))
    return [-ncid for _, ncid in sorted(sims, reverse=True)[:nprobe]]


def ivf_cosine_topk_indexed(spark, lists_dir: str, query_vec: list[float],
                            k: int = 10, nprobe: int = 2,
                            exclude_ids: tuple = ()) -> DataFrame:
    """IVF ANN over a PERSISTED list table (write_ivf_lists): the probe
    filter sits on the ``centroid`` partition column, so the scan touches
    only the nprobe probed directories — per-query cost is
    O(list_size·nprobe), not O(N) (the unindexed ``ivf_cosine_topk``
    recomputes the full assignment per query and cannot prune)."""
    centroids = read_ivf_centroids(spark, lists_dir)
    probed = _probe_ids(query_vec, centroids, nprobe)
    lists = spark.read.parquet(lists_dir)
    cand = lists.filter(F.col("centroid").isin(probed))
    qarr = F.array(*[F.lit(float(x)).cast("double") for x in query_vec])
    vec = F.transform(F.col("_vec"), lambda x: x.cast("double"))
    out = cand.select(
        "vec_id",
        F.round(_dot(vec, qarr) / (_norm(vec) * _norm(qarr)), 4).alias("cos_sim"))
    if exclude_ids:
        out = out.filter(~F.col("vec_id").isin(list(exclude_ids)))
    return out.orderBy(F.desc("cos_sim"), F.asc("vec_id")).limit(k)


def ivf_cosine_topk(emb: DataFrame, query_vec: list[float],
                    centroids: list[list[float]], k: int = 10, nprobe: int = 2,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    exclude_ids: tuple = ()) -> DataFrame:
    """IVF ANN, unindexed form: probe the nprobe centroids nearest the
    query; exact cosine top-k inside the probed lists only. The
    assignment is recomputed over ``emb`` per call — correct but
    unprunable (the filter sits on a computed column); at scale use
    ``write_ivf_lists`` + ``ivf_cosine_topk_indexed``, where the same
    filter hits a partition column and prunes the scan."""
    probed = _probe_ids(query_vec, centroids, nprobe)
    lists = assign_ivf(emb, centroids, id_col, vec_col)
    cand = lists.filter(F.col("centroid").isin(probed))
    qarr = F.array(*[F.lit(float(x)).cast("double") for x in query_vec])
    vec = F.transform(F.col("_vec"), lambda x: x.cast("double"))
    out = cand.select(
        "vec_id",
        F.round(_dot(vec, qarr) / (_norm(vec) * _norm(qarr)), 4).alias("cos_sim"))
    if exclude_ids:
        out = out.filter(~F.col("vec_id").isin(list(exclude_ids)))
    return out.orderBy(F.desc("cos_sim"), F.asc("vec_id")).limit(k)
