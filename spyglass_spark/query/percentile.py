"""Scalar exact-percentile semantics shared by the engine's oracle and
fixture generator.

The engine computes percentiles distributively via Spark SQL's exact
``percentile(col, array(...))`` aggregate — a value→count map merged
exactly across partitions, then linear interpolation in double on the
driver-side sorted counts, so the result is partition-order independent
and hash-gradeable. This module pins THAT interpolation arithmetic
(Spark's ``Percentile.getPercentile``: position = p·(n−1);
``(higher−position)·lowerKey + (position−lower)·higherKey`` in IEEE
double) so the scalar oracle and the fixture generator reproduce the
engine bitwise. tests/test_facets.py asserts the distributed aggregate
equals this scalar bitwise on random data at multiple partition counts —
that parity (not shared code) is what makes the fixture an oracle.

Reference surface: tantivy-0.19.2's public aggregation module ships a
PercentilesAggregation (sketch-based); our exact form is the
oracle-gradeable baseline and the engine exposes an approx form
(Greenwald-Khanna via ``approx_percentile``) as the 100 TB scale path,
matching the sketch profile.
"""
from __future__ import annotations

import math

DEFAULT_PERCENTS = (1.0, 5.0, 25.0, 50.0, 75.0, 95.0, 99.0)


def exact_percentile(sorted_vals, fraction: float) -> float:
    """One exact percentile of pre-sorted numeric values — Spark's
    Percentile.getPercentile arithmetic, bit for bit. ``fraction`` is in
    [0, 1] (the engine converts percent→fraction as ``p / 100.0`` in
    double; callers must do the same)."""
    n = len(sorted_vals)
    if n == 0:
        raise ValueError("exact_percentile needs at least one value")
    if not (0.0 <= fraction <= 1.0):
        raise ValueError(f"fraction out of [0,1]: {fraction}")
    position = fraction * (n - 1)          # double
    lower = math.floor(position)
    higher = math.ceil(position)
    lower_key = float(sorted_vals[lower])
    if higher == lower:
        return lower_key
    higher_key = float(sorted_vals[higher])
    # linear interpolation, Spark's operand order
    return (higher - position) * lower_key + (position - lower) * higher_key


def exact_percentiles(vals, percents=DEFAULT_PERCENTS) -> list[tuple[float, float]]:
    """(pct, value) rows for a list of percents over unsorted values —
    the scalar mirror of ``SearchEngine.percentiles`` output."""
    sv = sorted(vals)
    return [(float(p), exact_percentile(sv, float(p) / 100.0))
            for p in percents]
