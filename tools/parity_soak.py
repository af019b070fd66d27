#!/usr/bin/env python
"""Extended parity soak: the committed pytest fuzz gate runs 3 seeds;
this driver runs the SAME body (tests/test_fuzz_parity.py — random
corpora x random query shapes at random P/waves: rank identity + bitwise
float32 scores vs the scalar oracle, offset paging, search_after cursor
walks, randomized wildcard/regex pattern queries vs the oracle's fnmatch
enumeration, and a clean fsck audit per build) across many fresh seeds,
plus, round-robin on the fifth seeds: the lifecycle-mutation body
(offset 0), the aggregation body — every agg kind vs a pandas
brute-force over the oracle match set (offset 2), the sorted-collector
body — order-by fast field + cursor walk vs an integer-exact total
order (offset 3), and the time-travel body — as_of snapshot replay
under random mutations, then compaction reclaim (offset 4).

Usage: python tools/parity_soak.py [n_seeds] [first_seed]
Prints one summary JSON line; any failure raises with the seed attached.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    first = int(sys.argv[2]) if len(sys.argv) > 2 else 9000
    import tempfile

    from pyspark.sql import SparkSession  # noqa: F401
    from test_fuzz_parity import (test_randomized_aggregation_parity,
                                  test_randomized_lifecycle_parity,
                                  test_randomized_percolate_parity,
                                  test_randomized_rank_identity,
                                  test_randomized_sorted_collector_parity,
                                  test_randomized_time_travel_parity)

    from spyglass_spark.session import get_spark

    spark = get_spark("soak", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    import pathlib

    for i in range(n):
        seed = first + i
        with tempfile.TemporaryDirectory() as td:
            test_randomized_rank_identity(spark, pathlib.Path(td), seed)
            # every 5th seed also soaks the mutation surface (upsert +
            # deletes + compaction vs fresh oracle — slower: two builds)
            if i % 5 == 0:
                test_randomized_lifecycle_parity(spark, pathlib.Path(td),
                                                 seed)
            # offset-1: the percolator's join plan vs a scalar brute
            # force over random stored-query sets (no index build)
            if i % 5 == 1:
                test_randomized_percolate_parity(spark, pathlib.Path(td),
                                                 seed)
            # offset-2 fifth seeds soak the aggregation surface: every
            # agg kind vs a pandas brute-force over the oracle match set
            if i % 5 == 2:
                test_randomized_aggregation_parity(spark, pathlib.Path(td),
                                                   seed)
            # offset-3: the order-by-fast-field collector + its cursor
            # walk vs an integer-exact brute-force total order
            if i % 5 == 3:
                test_randomized_sorted_collector_parity(
                    spark, pathlib.Path(td), seed)
            # offset-4: snapshot replay — as_of every recorded commit_seq
            # under a random mutation sequence, then compaction reclaim
            if i % 5 == 4:
                test_randomized_time_travel_parity(spark, pathlib.Path(td),
                                                   seed)
        print(json.dumps({"seed": seed, "ok": True, "lifecycle": i % 5 == 0,
                          "percolate": i % 5 == 1,
                          "aggregations": i % 5 == 2, "sorted": i % 5 == 3,
                          "time_travel": i % 5 == 4,
                          "elapsed": round(time.time() - t0, 1)}),
              flush=True)
    print(json.dumps({"soak": "clean", "seeds": n, "first": first,
                      "wall_sec": round(time.time() - t0, 1)}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
