"""Epoch assignment via event-time windows: tumbling, sliding, session.

The reference's logical times are opaque lattice elements fed by the user
(src/collection.rs:15); our epochs are *derived from event time* by window
policies (SURVEY.md §1.4: "epochs map to tumbling/sliding/session windows").
These helpers produce the batch update-stream view — payload + (epoch, diff)
— and have direct Structured Streaming equivalents (`F.window`,
`F.session_window` under a watermark) used by the streaming kernels.

All pure Catalyst expressions:
- tumbling: epoch = floor(unix_ts / width)        (1 row per input row)
- sliding:  one row per covering window           (explode of window indexes;
            width/slide multiples give width/slide rows per input)
- session:  per-key gap-based sessionization      (sort-window per key:
            a new session starts where the gap from the previous event
            exceeds `gap`; epoch = the session's start time)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from differential_dataflow_spark.collection import DIFF, EPOCH


def _unix(ts: Column | str) -> Column:
    c = F.col(ts) if isinstance(ts, str) else ts
    # TIMESTAMP_NTZ cannot cast straight to BIGINT; hop through TIMESTAMP
    # (session TZ is pinned to UTC, matching DuckDB's naive epoch()).
    return c.cast("timestamp").cast("long")


def tumbling_epochs(df: DataFrame, ts: str, width_sec: int) -> DataFrame:
    """Assign each row the tumbling window index containing its timestamp."""
    return df.withColumn(EPOCH, F.floor(_unix(ts) / width_sec).cast("long")).withColumn(
        DIFF, F.lit(1).cast("long")
    )


def sliding_epochs(
    df: DataFrame, ts: str, width_sec: int, slide_sec: int
) -> DataFrame:
    """One update row per sliding window covering the timestamp: window w
    (start = w * slide) covers t iff w*slide <= t < w*slide + width."""
    t = _unix(ts)
    last = F.floor(t / slide_sec)
    first = F.floor((t - width_sec) / slide_sec) + 1
    return (
        df.withColumn("__w", F.explode(F.sequence(first, last)))
        .withColumn(EPOCH, F.col("__w").cast("long"))
        .drop("__w")
        .withColumn(DIFF, F.lit(1).cast("long"))
    )


def session_epochs(
    df: DataFrame, key: str, ts: str, gap_sec: int
) -> DataFrame:
    """Per-key gap sessionization: a session breaks where the time since the
    key's previous event exceeds ``gap_sec``; the epoch is the session's
    start (unix seconds), unique per (key, session)."""
    t = _unix(ts)
    w = Window.partitionBy(key).orderBy(ts)
    # Three window steps over ONE sort (same partitioning/ordering): break
    # flags -> running session number -> per-session min start.
    step1 = df.withColumn(
        "__brk",
        (
            (t - F.lag(t).over(w)).isNull() | ((t - F.lag(t).over(w)) > gap_sec)
        ).cast("long"),
    )
    step2 = step1.withColumn("__sn", F.sum("__brk").over(w))
    step3 = step2.withColumn(
        EPOCH, F.min(t).over(Window.partitionBy(key, "__sn")).cast("long")
    )
    return step3.drop("__brk", "__sn").withColumn(DIFF, F.lit(1).cast("long"))


def streaming_tumbling_agg(
    stream: DataFrame, ts: str, width: str, keys: list[str], watermark: str
):
    """Native Structured Streaming tumbling-window count with watermark-gated
    frontier advancement (append mode emits a window only once it closes —
    the reference's 'act when the time is complete' capability discipline)."""
    return (
        stream.withWatermark(ts, watermark)
        .groupBy(F.window(ts, width).alias("win"), *keys)
        .agg(F.count("*").alias("n"))
        .select(
            *keys,
            F.col("win.start").alias("win_start"),
            F.col("n"),
        )
    )


def streaming_session_agg(
    stream: DataFrame, ts: str, gap: str, keys: list[str], watermark: str
):
    """Native session-window aggregation (F.session_window) under watermark."""
    return (
        stream.withWatermark(ts, watermark)
        .groupBy(F.session_window(ts, gap).alias("win"), *keys)
        .agg(F.count("*").alias("n"))
        .select(*keys, F.col("win.start").alias("win_start"), F.col("n"))
    )
