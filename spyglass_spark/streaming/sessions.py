"""Custom stateful streaming operator: per-key session windows with a gap
timeout, built on ``applyInPandasWithState`` (Structured Streaming's
arbitrary-state API — the engine's example of a stateful operator Spark's
built-in windows can't express; SURVEY §2.9, beyond the batch-only
reference).

A session = a maximal run of one user's events where consecutive events
are ≤ ``gap`` apart. Sessions are emitted when CLOSED: either a new event
arrives beyond the gap (splitting within/between batches) or the event-time
watermark passes ``last_ts + gap`` (state timeout — bounded state, late
data beyond the watermark dropped)."""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = ("user_id long, session_start timestamp, "
                  "session_end timestamp, n_events long, sum_value double")
_STATE_SCHEMA = "start double, last double, n long, s double"


def _split_sessions(ts: list[float], vals: list[float], gap_s: float,
                    cur: tuple | None):
    """Fold sorted (ts, value) into sessions. Returns (closed, open)."""
    closed = []
    for t, v in zip(ts, vals):
        if cur is None:
            cur = (t, t, 1, float(v))
        elif t - cur[1] <= gap_s:
            cur = (cur[0], t, cur[2] + 1, cur[3] + float(v))
        else:
            closed.append(cur)
            cur = (t, t, 1, float(v))
    return closed, cur


def sessionize_events(stream_df: DataFrame, gap: str = "30 minutes",
                      watermark: str = "2 hours",
                      ts_col: str = "ts", key_col: str = "user_id",
                      value_col: str = "value") -> DataFrame:
    """Gap-based sessionization of an event stream, one state row per key."""
    gap_s = _duration_seconds(gap)

    gap_us = int(gap_s * 1_000_000)

    def fn(key: Any, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        # session times are integer MICROSECONDS (exact in the double-typed
        # state columns up to 2^53 µs ≈ year 2255; ns floats lose precision
        # and trip Arrow's safe-cast check on output)
        user = int(key[0])
        cur = (tuple(int(x) for x in state.get[:2]) + tuple(state.get[2:])
               if state.exists else None)
        closed = []
        rows = pd.concat(list(pdfs), ignore_index=True)
        if len(rows):
            rows = rows.sort_values(ts_col, kind="mergesort")
            ts = (rows[ts_col].astype("int64") // 1000).tolist()  # ns → µs
            vals = rows[value_col].astype(float).tolist()
            c, cur = _split_sessions(ts, vals, gap_us, cur)
            closed.extend(c)
        if state.hasTimedOut and cur is not None:
            closed.append(cur)
            cur = None
        if cur is not None:
            state.update((float(cur[0]), float(cur[1]), cur[2], cur[3]))
            # close the open session when the watermark passes last + gap
            state.setTimeoutTimestamp(int(cur[1] + gap_us) // 1000 + 1)
        else:
            state.remove()
        if closed:
            yield pd.DataFrame({
                "user_id": [user] * len(closed),
                "session_start": pd.to_datetime(
                    [int(c[0]) for c in closed], unit="us"),
                "session_end": pd.to_datetime(
                    [int(c[1]) for c in closed], unit="us"),
                "n_events": [c[2] for c in closed],
                "sum_value": [round(c[3], 3) for c in closed]})

    ev = stream_df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (ev.withWatermark(ts_col, watermark)
            .groupBy(key_col)
            .applyInPandasWithState(fn, SESSION_SCHEMA, _STATE_SCHEMA,
                                    "append", GroupStateTimeout.EventTimeTimeout))


def sessionize_batch(df: DataFrame, gap: str = "30 minutes",
                     ts_col: str = "ts", key_col: str = "user_id",
                     value_col: str = "value") -> DataFrame:
    """Batch reference of the same session semantics (pure DataFrame plan:
    lag window → gap flag → running session id → aggregate) — the oracle
    for the streaming operator and a standalone batch sessionizer."""
    from pyspark.sql import Window

    gap_s = _duration_seconds(gap)
    w = Window.partitionBy(key_col).orderBy(ts_col)
    ev = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    marked = ev.withColumn(
        "new_sess",
        (F.coalesce(F.col(ts_col).cast("double")
                    - F.lag(F.col(ts_col).cast("double")).over(w),
                    F.lit(gap_s + 1)) > gap_s).cast("long"))
    sess = marked.withColumn("sess_id", F.sum("new_sess").over(w))
    return (sess.groupBy(key_col, "sess_id")
            .agg(F.min(ts_col).alias("session_start"),
                 F.max(ts_col).alias("session_end"),
                 F.count("*").alias("n_events"),
                 F.round(F.sum(value_col), 3).alias("sum_value"))
            .drop("sess_id"))


def _duration_seconds(spec: str) -> float:
    n, unit = spec.split()
    mult = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
            "hour": 3600, "hours": 3600, "day": 86400, "days": 86400}[unit]
    return float(n) * mult
