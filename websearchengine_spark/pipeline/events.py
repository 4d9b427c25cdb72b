"""Event-log analytics over the ``events`` table
(event_id, ts, user_id, event_type, value, props) — the operations a
training-data/telemetry pipeline runs next to the transcript corpus:
tumbling-window aggregation and inactivity-gap sessionization. Both are
pure JVM column/window expressions (no Python), shuffle once on their
natural keys, and have exact DuckDB oracles (plans/pipeline_gate.py).

Scale notes: windowed_stats shuffles on (window, event_type) — bounded
cardinality, uniform. Sessionization partitions by user_id — the classic
skew risk is a power-user with millions of events in one partition window;
the lag/cumsum pattern is O(events-per-user) sequential per user, which is
the semantics' intrinsic order dependence (Spark's window exec streams it,
no materialization). Float sums use the ordered-fold pattern (see
CLAUDE.md invariants).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def windowed_stats(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling-window event stats per event_type:
    (window_start, event_type, n_events, value_sum). value_sum is an
    ordered fold by event_id (deterministic float summation; plain SUM's
    partial-merge order flips ROUND at ulp boundaries)."""
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("event_id", "value"))),
                    F.lit(0.0),
                    lambda acc, x: acc + x["value"],
                ),
                6,
            ).alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


def props_extract(events: DataFrame) -> DataFrame:
    """JSON scalar extraction from the semi-structured ``props`` column:
    (event_id, k) with k = props.$.k as a long (NULL when absent/invalid).
    JVM get_json_object — no Python; the DuckDB oracle uses json_extract.
    The training-data shape: metadata riding as JSON strings beside typed
    columns, projected without exploding or schema-on-write."""
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


def user_sessions(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Inactivity-gap sessionization: a new session starts when the gap to
    the user's previous event exceeds ``gap_minutes``.
    (user_id, session_idx, session_start, session_end, n_events) with
    session_idx 0-based per user in time order. Event order within a user
    is (ts, event_id) — a total order, so the lag/cumsum is exact."""
    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet naive timestamps read as TIMESTAMP_NTZ; cast through TIMESTAMP
    # (session tz pinned to UTC in get_spark) so unix_micros matches
    # DuckDB's epoch_us on the same values
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    flagged = events.withColumn(
        "new_session",
        F.when(
            F.lag(ts_us).over(w).isNull()
            | (ts_us - F.lag(ts_us).over(w) > gap_us),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "session_idx",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ) - 1,
    )
    return flagged.groupBy("user_id", "session_idx").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )
