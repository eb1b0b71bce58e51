"""Event-time windowed aggregation with watermarked late-data handling.

The reference has no stream processing (SURVEY.md §2.8); this is the
engine's Spark-native surface for event streams (the driver's ``events``
table shape): tumbling event-time windows with a watermark that bounds
state and discards data later than the allowed lateness — the standard
Structured Streaming pattern for ingest-rate / crawl-telemetry rollups.

Semantics (append mode):
- a window emits once, when the watermark passes its end;
- rows later than ``watermark_delay`` behind the max observed event time
  are dropped (never re-open an emitted window);
- state per key is bounded by (windows within the watermark horizon) x
  (event types) — safe at any stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """streaming events(ts, event_type, value) -> per-window per-type counts.

    Output: (window_start, window_end, event_type, n_events, sum_value).
    """
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy(
            F.window("ts", window_duration).alias("w"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def streaming_event_sessions(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """streaming events(ts, user_id, value) -> per-user session aggregates
    via the NATIVE session window: dynamic-length windows that merge events
    closer than ``gap`` and close once the watermark passes last_event + gap.

    The streaming twin of the batch sessionization pair
    (driver_queries_td.q_event_sessions). One boundary difference, by
    construction: ``session_window`` ends a session at exactly
    last_event + gap (an event landing precisely on the boundary starts a
    NEW session), while the batch pair breaks only on gap STRICTLY greater
    than the threshold — the reference lag-epoch comparison. Continuous
    event times make the disagreement measure-zero; the parity test uses
    off-boundary fixtures and documents this.

    State per user is bounded by open sessions inside the watermark
    horizon; merges of out-of-order events into one session are handled by
    the state store, not by re-sorting (the property the batch
    lag/cumulative-sum formulation cannot give on an unbounded stream).

    Output (append mode, one row per CLOSED session):
    (user_id, session_start, session_end, n_events, sum_value).
    """
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
