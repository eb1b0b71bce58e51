"""Watermarked tumbling-window aggregation: on-time data aggregates per
window; data later than the watermark is dropped, not re-emitted."""

from datetime import datetime, timezone

import pytest

from search_engine_spark.streaming.windowed import windowed_event_counts

SCHEMA = "ts timestamp, event_type string, value double"


def _ts(h, m=0):
    return datetime(2026, 3, 1, h, m, tzinfo=timezone.utc)


def _write(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _drain(spark, src, out, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        windowed_event_counts(stream, "1 hour", "30 minutes")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_watermark_window_semantics(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))

    # batch 1: two full windows of data, plus an event at 12:10 that pushes
    # the watermark to 11:40 — closing the 10:00-11:00 window
    _write(
        spark,
        src,
        [
            (_ts(10, 5), "click", 1.0),
            (_ts(10, 45), "click", 2.0),
            (_ts(10, 50), "view", 5.0),
            (_ts(11, 10), "click", 3.0),
            (_ts(12, 10), "view", 1.0),
        ],
    )
    _drain(spark, src, out, ckpt)
    rows = spark.read.parquet(out).collect()
    emitted = {
        (r["window_start"].hour, r["event_type"]): (r["n_events"], r["sum_value"])
        for r in rows
    }
    # only the 10:00 window is past the watermark (11:40) and emitted
    assert emitted == {(10, "click"): (2, 3.0), (10, "view"): (1, 5.0)}

    # batch 2: a LATE event for the already-emitted 10:00 window (beyond
    # the 30-min lateness) must be dropped; an event at 13:40 moves the
    # watermark to 13:10, closing 11:00 and 12:00
    _write(
        spark,
        src,
        [
            (_ts(10, 20), "click", 99.0),  # too late — dropped
            (_ts(13, 40), "click", 7.0),
        ],
    )
    _drain(spark, src, out, ckpt)
    rows = spark.read.parquet(out).collect()
    emitted = {
        (r["window_start"].hour, r["event_type"]): (r["n_events"], r["sum_value"])
        for r in rows
    }
    assert emitted[(11, "click")] == (1, 3.0)
    assert emitted[(12, "view")] == (1, 1.0)
    # the late row did NOT reopen or alter the 10:00 window
    assert emitted[(10, "click")] == (2, 3.0)
    assert (13, "click") not in emitted  # still open
