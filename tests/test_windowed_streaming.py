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


# ---------------------------------------------------------------------------
# Native session windows (streaming twin of the batch event_sessions pair)
# ---------------------------------------------------------------------------
SESS_SCHEMA = "ts timestamp, user_id long, value double"


def _drain_sessions(spark, src, out, ckpt):
    from search_engine_spark.streaming.windowed import streaming_event_sessions

    stream = spark.readStream.schema(SESS_SCHEMA).parquet(src)
    q = (
        streaming_event_sessions(stream, "30 minutes", "1 hour")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive


def test_streaming_sessions_split_and_merge(spark, tmp_path):
    import os

    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    os.makedirs(src, exist_ok=True)
    rows = [
        # user 1: three events within 30-min gaps -> one session, then a
        # 2-hour gap -> a second session
        (_ts(8, 0), 1, 1.0),
        (_ts(8, 20), 1, 2.0),
        (_ts(8, 45), 1, 4.0),
        (_ts(11, 0), 1, 8.0),
        # user 2: out-of-order arrival inside one session (state-store merge)
        (_ts(9, 10), 2, 1.0),
        (_ts(9, 0), 2, 1.0),
        # watermark pusher so earlier sessions close
        (_ts(23, 0), 99, 0.0),
    ]
    spark.createDataFrame(rows, SESS_SCHEMA).coalesce(1).write.mode("append").parquet(src)
    _drain_sessions(spark, src, out, ckpt)
    got = {
        (r["user_id"], r["session_start"], r["n_events"], r["sum_value"])
        for r in spark.read.parquet(out).collect()
    }
    assert (1, _ts(8, 0).replace(tzinfo=None), 3, 7.0) in {
        (u, s.replace(tzinfo=None) if s.tzinfo else s, n, v) for u, s, n, v in got
    } or (1, _ts(8, 0), 3, 7.0) in got
    by_user = {}
    for u, s, n, v in got:
        by_user.setdefault(u, []).append((n, v))
    assert sorted(by_user[1]) == [(1, 8.0), (3, 7.0)]
    assert by_user[2] == [(2, 2.0)]


def test_streaming_sessions_match_batch_pair_semantics(spark, tmp_path):
    """Off-boundary fixture: closed streaming sessions must equal the batch
    sessionization (gap > 30 min split) on the same events."""
    import os

    import __spark_entry__ as entry_mod
    from pyspark.sql import functions as F

    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    os.makedirs(src, exist_ok=True)
    rows = []
    for u in range(1, 4):
        # deterministic per-user event times, gaps of 7/29/31/45 min cycling
        t = _ts(6, u)
        gaps = [7, 29, 31, 45, 7, 29, 61, 2]
        for i, g in enumerate(gaps):
            rows.append((t, u, float(i)))
            from datetime import timedelta

            t = t + timedelta(minutes=g)
        rows.append((t, u, 99.0))
    rows.append((_ts(23, 59), 99, 0.0))  # watermark pusher
    spark.createDataFrame(rows, SESS_SCHEMA).coalesce(1).write.mode("append").parquet(src)
    _drain_sessions(spark, src, out, ckpt)
    streamed = {
        (r["user_id"], r["n_events"], round(r["sum_value"], 6))
        for r in spark.read.parquet(out).filter(F.col("user_id") != 99).collect()
    }

    # batch twin over the same parquet (schema adapted to the pair's shape)
    events = (
        spark.read.parquet(src)
        .withColumn("event_id", F.monotonically_increasing_id())
        .withColumn("ts", F.col("ts").cast("timestamp_ntz"))
        .withColumn("event_type", F.lit("e"))
        .withColumn("props", F.lit(""))
    )
    bdir = str(tmp_path / "batch")
    os.makedirs(bdir, exist_ok=True)
    events.coalesce(1).write.mode("overwrite").parquet(os.path.join(bdir, "events.parquet"))
    batch = entry_mod.queries()["event_sessions"](spark, bdir)
    batched = {
        (r["user_id"], r["n_events"], round(r["sum_value"], 6))
        for r in batch.filter(F.col("user_id") != 99).collect()
    }
    assert streamed == batched
