"""Fixture-oracle gate for the search_* driver queries: the LIVE
distributed engine's hit rows must match the scalar-oracle-precomputed
parquet fixtures (tools/make_search_fixtures.py) at EVERY precomputed sf
— rows, schema, and order-insensitive canonical values, exactly the
driver's CORRECTNESS comparison. This closes the self-certification loop:
the fixtures are generated WITHOUT the distributed builder/executor, and
this test drives the real engine against them."""

import math
import os
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

FIXTURE_QUERIES = [
    "search_bm25",
    "search_phrase_tag_filter",
    "search_batch",
    "search_date_range",
    "search_with_lenses",
    "search_semantic_boost",
    "search_more_like_this",
    "search_highlight",
    "search_prefix",
    "search_fuzzy",
    "search_wildcard",
    "search_regex",
    "search_term_range",
    "search_term_set",
    "search_dismax",
    "search_parsed",
    "search_facets",
    "search_date_histogram",
    "search_field_stats",
    "search_custom_boost",
    "search_phrase_prefix",
    "search_percentiles",
    "search_facet_stats",
    "search_range_agg",
    "search_cardinality",
    "search_extended_stats",
    "search_top_hits",
    "search_sorted",
    "search_histogram_gapfill",
    "search_histogram_knobs",
    "search_histogram_stats",
    "search_derivative",
    "search_moving_fn",
    "search_serial_diff",
    "search_bucket_page",
    "search_percentile_ranks",
    "search_significant_terms",
    "search_terms_topn",
    "search_sorted_after",
    "search_lifecycle",
    "search_lifecycle_marker",
    "search_streamed",
    "search_export",
    "search_export_scored",
    "search_count",
    "search_msm",
    "search_suggest",
]

# entries whose oracle reads another entry's fixture file
FIXTURE_FILE_ALIAS = {"search_streamed": "search_bm25",
                      "search_count": "search_export"}


def _canon(val):
    if val is None:
        return None
    if isinstance(val, float):
        return "nan" if math.isnan(val) else round(val, 6)
    return val


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("name", FIXTURE_QUERIES)
def test_engine_matches_fixture(name, sf_dir, spark):
    import __spark_entry__ as E

    sdf = E.queries()[name](spark, sf_dir)
    spark_rows = sdf.collect()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")
    res = con.execute(E.oracle_sql()[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    con.close()
    assert sorted(sdf.columns) == sorted(duck_cols)
    assert len(spark_rows) == len(duck_rows), (
        f"{name}@{sf_dir}: {len(spark_rows)} rows != fixture {len(duck_rows)}")
    s = _rowset(sdf.columns, [[r[c] for c in sdf.columns] for r in spark_rows])
    d = _rowset(duck_cols, duck_rows)
    mism = [i for i, (a, b) in enumerate(zip(s, d)) if a != b]
    assert not mism, (
        f"{name}@{sf_dir}: {len(mism)} mismatched rows; "
        f"first: spark={s[mism[0]]} fixture={d[mism[0]]}")


@pytest.mark.parametrize("name", FIXTURE_QUERIES)
def test_fixture_nonvacuous(name):
    """Every fixture must carry hit rows for every precomputed corpus —
    an empty fixture would green-light an engine returning nothing."""
    fname = FIXTURE_FILE_ALIAS.get(name, name)
    con = duckdb.connect()
    counts = con.execute(
        f"SELECT corpus_key, count(*) FROM "
        f"'{REPO}/fixtures/search_expected_{fname}.parquet' "
        f"GROUP BY 1").fetchall()
    con.close()
    assert len(counts) == len(SF_DIRS)
    assert all(c > 0 for _, c in counts)
