"""Time/event analysis over the ``events`` table (pipeline extension:
the last fixture family the engine did not cover). Pure relational
column programs — windowed aggregation, gap-based sessionization, JSON
prop extraction — all whole-stage-codegen JVM plans with exact DuckDB
oracle equivalents.

Scale notes: windowed aggregation shuffles only its grouped output;
sessionization is one partitionBy(user) window pass (users are the
natural partitioning key and are unbounded-many, so no skew beyond a
single user's history); JSON extraction is a map-only projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def event_windows(events: DataFrame, hours: int = 1) -> DataFrame:
    """Tumbling-window counts and value sums per event type:
    (window_start, event_type, n, sum_value_r). Epoch-aligned windows —
    identical bucketing to DuckDB's time_bucket."""
    return (
        events.groupBy(
            F.window("ts", f"{hours} hour").start.alias("window_start"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value_r"),
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization: a user's events belong to one session
    while consecutive gaps stay under ``gap_minutes``. Output one row
    per session: (user_id, session_seq, n_events, start_ts, end_ts,
    duration_us). One window pass, no self-joins."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # exact MICROSECOND arithmetic (sub-second truncation differs across
    # engines); only DIFFERENCES are used, so timezone offsets cancel
    ep = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = ep - F.lag(ep).over(w)
    with_s = (
        events.withColumn(
            "new_sess",
            F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), 1).otherwise(0),
        )
        .withColumn("session_seq", F.sum("new_sess").over(w))
    )
    return (
        with_s.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("start_ts"),
            F.max("ts").alias("end_ts"),
        )
        .withColumn(
            "duration_us",
            F.unix_micros(F.col("end_ts").cast("timestamp"))
            - F.unix_micros(F.col("start_ts").cast("timestamp")),
        )
    )


def props_extract(events: DataFrame) -> DataFrame:
    """JSON property extraction from the props column:
    (event_id, k) with k as bigint (map-only projection)."""
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )
