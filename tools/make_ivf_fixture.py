#!/usr/bin/env python
"""Generate the expected-top-k parquet fixture for ann_ivf_trained.

The trained-IVF driver query (k-means trainer → probe → exact cosine
top-k inside probed lists) is not DuckDB-expressible — the trainer is
iterative — so it has been the contract's one rows-only check. The
trainer is fully deterministic (farthest-first seeding + Lloyd over an
id-ascending bounded sample, no RNG), so the expected (vec_id, cos_sim)
rows for the deterministic sf corpora are precomputed here WITHOUT Spark
and stored as parquet keyed on the same corpus_key as the search
fixtures; ``__spark_entry__.oracle_sql()['ann_ivf_trained']`` SELECTs
from it.

Self-certification split (same as tools/make_search_fixtures.py): the
scalar trainer core ``train_centroids_np`` is shared with the engine
(scalar semantics shared; pinned by tests/test_ops.py goldens), while
everything DISTRIBUTED that the driver row checks — the Spark sample
collection in train_centroids, assign_ivf's max-cosine assignment, the
probe filter, and the top-k — is mirrored here independently with
sequential-fold float64 arithmetic matching Spark's F.aggregate
left-to-right fold. tests/test_entry.py runs the LIVE query against
this fixture at both sf dirs.

Usage: python tools/make_ivf_fixture.py
"""
from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIRS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01")
FIX_DIR = os.path.join(REPO, "fixtures")
K, ITERS, NPROBE, TOPK = 4, 3, 2, 10  # must match q_ann_ivf_trained
SAMPLE_LIMIT = 100_000  # train_centroids default — whole table must fit


def corpus_key(sf_dir: str) -> int:
    return int(duckdb.sql(
        f"SELECT CAST(sum(length(text)) AS BIGINT) FROM "
        f"'{sf_dir}/documents.parquet'").fetchone()[0])


def _fold_dot(a, b) -> float:
    """Left-to-right sequential float64 fold — exactly Spark's
    F.aggregate(zip_with(a, b, *), 0.0, acc + v) evaluation order, so the
    fixture's cos_sim is bitwise what the engine computes pre-round."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + float(x) * float(y)
    return acc


def _fold_norm(a) -> float:
    acc = 0.0
    for x in a:
        acc = acc + float(x) * float(x)
    return float(np.sqrt(acc))


def expected_rows(sf_dir: str) -> list[dict]:
    from spyglass_spark.ops.similarity import train_centroids_np

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    ids = tbl.column("vec_id").to_numpy()
    vecs = tbl.column("embedding").to_pylist()
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    vecs = [vecs[i] for i in order]
    assert len(ids) <= SAMPLE_LIMIT, (
        f"{sf_dir}: {len(ids)} rows exceed the trainer's {SAMPLE_LIMIT} "
        f"sample bound — the whole-table == sample assumption breaks and "
        f"this fixture would diverge from the engine")

    # id-ascending float64 matrix == what train_centroids collects
    X = np.asarray([[float(x) for x in v] for v in vecs], dtype=np.float64)
    cents = train_centroids_np(X, K, ITERS)

    # assign_ivf mirror: max-cosine centroid, ties -> lowest centroid id
    cent_norms = [_fold_norm(c) for c in cents]
    assign = []
    for v in vecs:
        vn = _fold_norm(v)
        best = max(range(len(cents)),
                   key=lambda c: (_fold_dot(v, cents[c]) / (vn * cent_norms[c]),
                                  -c))
        assign.append(best)

    # probe mirror (_probe_ids): nprobe max-cosine centroids for the query
    qv = vecs[int(np.nonzero(ids == 0)[0][0])]
    qn = _fold_norm(qv)
    sims = sorted(((_fold_dot(qv, c) / (qn * cent_norms[i]), -i)
                   for i, c in enumerate(cents)), reverse=True)
    probed = {-ni for _, ni in sims[:NPROBE]}

    # exact cosine top-k inside probed lists, excluding the query vector
    cand = []
    for i, (vid, v) in enumerate(zip(ids, vecs)):
        if assign[i] in probed and int(vid) != 0:
            cos = round(_fold_dot(v, qv) / (_fold_norm(v) * qn), 4)
            cand.append((int(vid), cos))
    cand.sort(key=lambda t: (-t[1], t[0]))
    ckey = corpus_key(sf_dir)
    return [{"corpus_key": ckey, "vec_id": vid, "cos_sim": cos}
            for vid, cos in cand[:TOPK]]


def main() -> None:
    rows = []
    for sf_dir in SF_DIRS:
        rows.extend(expected_rows(sf_dir))
    schema = pa.schema([pa.field("corpus_key", pa.int64()),
                        pa.field("vec_id", pa.int64()),
                        pa.field("cos_sim", pa.float64())])
    tbl = pa.Table.from_pylist(rows, schema=schema)
    path = os.path.join(FIX_DIR, "ann_ivf_trained_expected.parquet")
    pq.write_table(tbl, path)
    print(f"wrote {path}: {len(rows)} rows")


if __name__ == "__main__":
    main()
