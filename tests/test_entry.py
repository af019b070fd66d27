"""Driver-contract test: run each queries() entry on Spark and its
oracle_sql() on DuckDB over the same parquet; compare row count, columns,
and order-insensitive values (the CORRECTNESS_r{N}.json gate)."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPYGLASS_TEST_SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _canon(val):
    if val is None:
        return None
    if isinstance(val, bool):
        return int(val)
    if isinstance(val, float):
        if math.isnan(val):
            return "nan"
        return round(val, 6)
    if isinstance(val, (list, tuple)):
        return tuple(_canon(v) for v in val)
    try:
        import numpy as np
        if isinstance(val, np.integer):
            return int(val)
        if isinstance(val, np.floating):
            return round(float(val), 6)
    except ImportError:
        pass
    return val


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


@pytest.fixture(scope="module")
def contract():
    import __spark_entry__ as E
    return E


@pytest.fixture(scope="module")
def duck():
    con = _duck()
    yield con
    con.close()


def _pairs():
    import __spark_entry__ as E
    qs = E.queries()
    os_ = E.oracle_sql()
    return sorted(qs.keys()), qs, os_


NAMES, _QS, _OS = _pairs()


@pytest.mark.parametrize("name", NAMES)
def test_query_vs_oracle(name, spark, duck, contract):
    fn = contract.queries()[name]
    sdf = fn(spark, SF_DIR)
    spark_rows = sdf.collect()
    spark_cols = sdf.columns
    sql = contract.oracle_sql().get(name)
    if sql is None:
        # rows-only check: must run and have a stable schema
        assert isinstance(spark_cols, list) and len(spark_cols) > 0
        return
    res = duck.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: columns {sorted(spark_cols)} != {sorted(duck_cols)}")
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: {len(spark_rows)} rows != oracle {len(duck_rows)}")
    s = _rowset(spark_cols, [[r[c] for c in spark_cols] for r in spark_rows])
    d = _rowset(duck_cols, duck_rows)
    mism = [i for i, (a, b) in enumerate(zip(s, d)) if a != b]
    assert not mism, (
        f"{name}: {len(mism)} mismatched rows; first: spark={s[mism[0]]} "
        f"oracle={d[mism[0]]}")


def test_oracle_constant_range_bounds(duck):
    """The DuckDB oracles use constant lateral ranges (DuckDB can't range
    over a column): fingerprint windows range(0,200) with stride 10 cover
    docs up to 2014 chars; shingle/bigram positions range(1,2000) cover up
    to 2000 tokens. Assert the dataset stays strictly inside those bounds
    so the truncation can never silently diverge from the unbounded Spark
    side (round-1 ADVICE)."""
    ml, mt = duck.execute(
        "SELECT max(length(text)), "
        "max(len(list_filter(regexp_split_to_array(lower(text), "
        "'[^a-z0-9]+'), x -> x <> ''))) FROM documents").fetchone()
    assert ml <= 2014, f"doc length {ml} exceeds fingerprint oracle coverage"
    assert mt <= 2000, f"token count {mt} exceeds shingle/bigram oracle coverage"
    mn, nonascii = duck.execute(
        "SELECT min(length(text)), "
        "sum(CASE WHEN octet_length(encode(text)) <> length(text) THEN 1 "
        "ELSE 0 END) FROM documents").fetchone()
    assert mn >= 1, "empty doc would break the multimodal payload oracles"
    assert nonascii == 0, ("non-ASCII text breaks the ord()==byte assumption "
                           "in the multimodal oracles")


def test_no_array_columns_in_contract_output(spark, contract):
    """The driver harness canonicalizer (pandas sort_values) cannot sort
    list-valued columns (round-2 regression: tags array<long> broke all 7
    search_* rows). Every queries() entry must emit only scalar columns."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    for name, fn in contract.queries().items():
        df = fn(spark, SF_DIR)
        for f in df.schema.fields:
            assert not isinstance(f.dataType, (ArrayType, MapType, StructType)), (
                f"{name}: column {f.name} has non-scalar type {f.dataType} — "
                "driver canonicalizer cannot sort it")


def test_entry_smoke(spark, contract):
    df = contract.entry(spark)
    rows = df.collect()
    assert len(df.columns) > 0
    assert len(rows) >= 0


def test_lifecycle_cache_rebuilds_after_partial_crash(spark, contract):
    """The lifecycle/streamed engines gate their disk caches on a
    sentinel written AFTER the last mutation lands (the IVF
    sidecar-gate pattern): a crash anywhere mid-sequence leaves no
    sentinel, and the next call must rebuild from scratch — never serve
    a half-mutated index. Simulate the crash by deleting the sentinel
    and truncating the index dir, then assert the rebuilt engine still
    matches the fixture row set."""
    import shutil

    sf = "/root/testdata/sf0.001"
    eng = contract._get_lifecycle_engine(spark, sf)
    idx = eng.index_dir if hasattr(eng, "index_dir") else eng._index_dir
    sentinel = os.path.join(idx, "_lifecycle_complete")
    assert os.path.exists(sentinel)
    before = {(r["url"], r["score"]) for r in
              eng.search("spark merge join", k=10).collect()}
    # crash simulation: sentinel gone + manifest gone (mid-compaction)
    os.remove(sentinel)
    mf = os.path.join(idx, "manifest.json")
    if os.path.exists(mf):
        os.remove(mf)
    eng2 = contract._get_lifecycle_engine(spark, sf)
    after = {(r["url"], r["score"]) for r in
             eng2.search("spark merge join", k=10).collect()}
    assert after == before
    # streamed engine: same gate — drop the sentinel, rebuild must work
    seng = contract._get_streamed_engine(spark, sf)
    sidx = seng.index_dir if hasattr(seng, "index_dir") else seng._index_dir
    base = os.path.dirname(sidx)
    shutil.rmtree(sidx, ignore_errors=True)
    os.remove(os.path.join(base, "_stream_complete"))
    shutil.rmtree(os.path.join(base, "ckpt"), ignore_errors=True)
    seng2 = contract._get_streamed_engine(spark, sf)
    got = {(r["url"], r["score"]) for r in
           seng2.search("spark merge join", k=10).collect()}
    fresh = {(r["url"], r["score"]) for r in
             contract._get_engine(spark, sf)
             .search("spark merge join", k=10).collect()}
    assert got == fresh  # streamed rebuild ≡ fresh-build hits
