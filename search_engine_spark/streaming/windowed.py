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
