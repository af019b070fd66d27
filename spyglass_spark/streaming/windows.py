"""Streaming windowed aggregations with watermark-based late-data handling
(the generic streaming capability of the engine; the reference is
batch-only, SURVEY §2.9)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_event_counts(stream_df: DataFrame, ts_col: str = "ts",
                          key_col: str = "event_type",
                          window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window counts + value sums per key with a watermark: late
    events beyond the watermark are dropped, state is bounded."""
    stream_df = stream_df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (stream_df
            .withWatermark(ts_col, watermark)
            .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(key_col))
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 3).alias("sum_value"))
            .select(F.col("win.start").alias("window_start"),
                    F.col("win.end").alias("window_end"),
                    key_col, "n_events", "sum_value"))
