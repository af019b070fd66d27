"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline (one narrow pass, JVM
zip_with/aggregate — no UDF); the LSH variant is the scale path: random-
hyperplane signatures bucket vectors so the query only scans its bucket.
Hyperplanes are drawn deterministically from the dataset itself (vectors
vec_id 1..nbits) so Spark and the SQL oracle agree exactly without any
external randomness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


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
    """Deterministic Lloyd k-means for IVF lists. Init = farthest-first
    traversal (the lowest-id vector, then repeatedly the vector minimizing
    max-cosine to the chosen set — deterministic, no RNG, one tiny Spark
    job per seed); each Lloyd iteration is one Spark job: assign to
    max-cosine centroid, average per list driver-side over the k
    aggregated sums (k×dim doubles — tiny).

    At 100 TB the standard recipe is exactly this on a bounded sample
    (``sample_limit`` rows by ascending id — deterministic): k-means
    quality needs only a representative sample, never the full corpus;
    the full corpus is then assigned in one pass via ``assign_ivf``."""
    import numpy as np

    sample = (emb.orderBy(F.asc(id_col)).limit(sample_limit)
              .select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")))
    sample = sample.cache()
    try:
        first = sample.orderBy(F.asc("id")).limit(1).collect()[0]
        seeds = [list(first["v"])]
        vec = F.transform(F.col("v"), lambda x: x.cast("double"))
        for _ in range(1, k):
            coss = []
            for c in seeds:
                cv = F.array(*[F.lit(float(x)).cast("double") for x in c])
                coss.append(_dot(vec, cv) / (_norm(vec) * _norm(cv)))
            far = (sample.select("id", "v",
                                 F.greatest(*coss).alias("mc") if len(coss) > 1
                                 else coss[0].alias("mc"))
                   .orderBy(F.asc("mc"), F.asc("id")).limit(1).collect()[0])
            seeds.append(list(far["v"]))
        cents = np.asarray(seeds, dtype=np.float64)
        for _ in range(iters):
            assigned = assign_ivf(sample, [list(c) for c in cents],
                                  id_col="id", vec_col="v")
            dim = cents.shape[1]
            sums = (assigned.select(
                        "centroid",
                        F.transform(F.col("_vec"), lambda x: x.cast("double"))
                        .alias("v"))
                    .groupBy("centroid")
                    .agg(F.count("*").alias("n"),
                         *[F.sum(F.element_at("v", i + 1)).alias(f"s{i}")
                           for i in range(dim)])
                    .collect())
            new = cents.copy()  # empty lists keep their previous centroid
            for r in sums:
                cid = int(r["centroid"])
                new[cid] = [float(r[f"s{i}"]) / int(r["n"]) for i in range(dim)]
            if np.allclose(new, cents, atol=1e-12):
                cents = new
                break
            cents = new
        return [list(map(float, c)) for c in cents]
    finally:
        sample.unpersist()


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


def ivf_cosine_topk(emb: DataFrame, query_vec: list[float],
                    centroids: list[list[float]], k: int = 10, nprobe: int = 2,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    exclude_ids: tuple = ()) -> DataFrame:
    """IVF ANN: probe the nprobe centroids nearest the query; exact cosine
    top-k inside the probed lists only."""
    import numpy as np

    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.linalg.norm(q))
    sims = []
    for cid, c in enumerate(centroids):
        cv = np.asarray(c, dtype=np.float64)
        sims.append((float(np.dot(q, cv)) / (qn * float(np.linalg.norm(cv))), -cid))
    probed = [-ncid for _, ncid in sorted(sims, reverse=True)[:nprobe]]

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
