"""applyInPandasWithState cross-batch streaming dedup: state must persist
across micro-batches and across stream restarts (checkpointed state store)."""

import os
from datetime import datetime, timedelta, timezone

import pytest

from search_engine_spark.schemas import PAGES
from search_engine_spark.streaming.stateful import streaming_exact_dedup

T0 = datetime(2026, 3, 1, tzinfo=timezone.utc)


def _write_pages(spark, path, rows):
    df = spark.createDataFrame(
        [(u, ts, None, text, "en") for u, ts, text in rows], PAGES
    )
    df.coalesce(1).write.mode("append").parquet(path)


def _run_available_now(spark, src, out, ckpt):
    stream = spark.readStream.schema(PAGES).parquet(src)
    q = (
        streaming_exact_dedup(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive


@pytest.mark.usefixtures("spark")
def test_streaming_dedup_across_batches(spark, tmp_path):
    src = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)

    # batch 1: two distinct texts; "dup text" appears twice — earliest
    # warc_ts (then url) must win
    _write_pages(
        spark,
        src,
        [
            ("https://a/1", T0 + timedelta(minutes=2), "dup text"),
            ("https://a/2", T0 + timedelta(minutes=1), "dup text"),
            ("https://a/3", T0 + timedelta(minutes=3), "unique one"),
        ],
    )
    _run_available_now(spark, src, out, ckpt)
    got = {
        r["url"]: r["content_sha256"]
        for r in spark.read.parquet(out).collect()
    }
    assert set(got) == {"https://a/2", "https://a/3"}

    # batch 2 (same checkpoint -> same state store): a re-occurrence of
    # "dup text" must emit NOTHING; a new text must emit
    _write_pages(
        spark,
        src,
        [
            ("https://b/1", T0 + timedelta(minutes=9), "dup text"),
            ("https://b/2", T0 + timedelta(minutes=8), "brand new"),
        ],
    )
    _run_available_now(spark, src, out, ckpt)
    rows = spark.read.parquet(out).collect()
    urls = sorted(r["url"] for r in rows)
    assert urls == ["https://a/2", "https://a/3", "https://b/2"]
    # one output row per distinct hash
    assert len({r["content_sha256"] for r in rows}) == len(rows)


def test_dedup_fn_tracks_min_across_chunks():
    """A group larger than the Arrow batch size arrives as MULTIPLE pandas
    chunks; the first-seen row must be the global (warc_ts, url) min even
    when it sits in a later chunk (regression: only the first chunk used
    to be sorted)."""
    import pandas as pd

    from search_engine_spark.streaming.stateful import _dedup_fn

    class FakeState:
        exists = False

        def update(self, v):
            self.value = v

    def chunk(rows):
        return pd.DataFrame(
            rows, columns=["content_sha256", "url", "warc_ts", "text"]
        )

    h = "h" * 64
    chunks = iter(
        [
            chunk([(h, "https://a/9", T0 + timedelta(minutes=9), "t")]),
            chunk([]),  # empty chunks must be skipped, not break the scan
            chunk(
                [
                    (h, "https://a/5", T0 + timedelta(minutes=5), "t"),
                    (h, "https://a/1", T0 + timedelta(minutes=1), "t"),  # true min
                ]
            ),
            chunk([(h, "https://a/3", T0 + timedelta(minutes=3), "t")]),
        ]
    )
    state = FakeState()
    out = list(_dedup_fn((h,), chunks, state))
    assert len(out) == 1
    assert out[0].iloc[0]["url"] == "https://a/1"
    assert state.value == (4,)


def test_dedup_fn_emits_nothing_for_already_seen_hash():
    import pandas as pd

    from search_engine_spark.streaming.stateful import _dedup_fn

    class FakeState:
        exists = True
        get = (3,)

        def update(self, v):
            self.value = v

    h = "h" * 64
    pdf = pd.DataFrame(
        [(h, "https://a/1", T0, "t")],
        columns=["content_sha256", "url", "warc_ts", "text"],
    )
    state = FakeState()
    out = list(_dedup_fn((h,), iter([pdf]), state))
    assert out == []
    assert state.value == (4,)
