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


def exact_percentile_rank(sorted_vals, v) -> float:
    """One exact percentile RANK (the ES `percentile_ranks` inverse of
    the percentile function): the percent p such that
    ``exact_percentile(sorted_vals, p/100)`` linearly reaches ``v`` —
    position(v) = i + (v − s[i]) / (s[i+1] − s[i]) with i the LAST
    index where s[i] ≤ v (ties collapse to the run's end, making the
    inverse well-defined), then pct = position / (n−1) · 100. Clamped
    to 0 below the min and 100 at/above the max, the ES contract. The
    operand order here is pinned — SearchEngine.percentile_ranks
    evaluates the SAME expression JVM-side, so engine ≡ this scalar
    bitwise (tested at several partition counts)."""
    import bisect

    n = len(sorted_vals)
    if n == 0:
        raise ValueError("exact_percentile_rank needs at least one value")
    if v < sorted_vals[0]:
        return 0.0
    if v >= sorted_vals[-1]:
        return 100.0
    i = bisect.bisect_right(sorted_vals, v) - 1
    lo, hi = float(sorted_vals[i]), float(sorted_vals[i + 1])
    return (float(i) + (float(v) - lo) / (hi - lo)) / float(n - 1) * 100.0


def exact_percentile_ranks(vals, values) -> list[tuple[float, float]]:
    """(value, pct) rows for a list of probe values over unsorted data —
    the scalar mirror of ``SearchEngine.percentile_ranks`` output
    (value-ascending, like the input order contract)."""
    sv = sorted(vals)
    return [(float(v), exact_percentile_rank(sv, v)) for v in sorted(values)]
