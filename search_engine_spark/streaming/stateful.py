"""Custom stateful streaming operator: cross-batch exact dedup.

The batch pipeline re-derives exact dedup from the full documents_raw table
every refresh (incremental.py). At stream scale that rescan is the wrong
shape: dedup state (content hash -> first-seen doc) should live in the
streaming state store and be consulted per micro-batch. This module
implements that as an ``applyInPandasWithState`` operator — the escape
hatch the engine uses when built-in streaming operators (dropDuplicates
needs unbounded state AND re-emits on restart without watermark tuning)
can't express the semantics:

- key: ``content_sha256`` (grouped, so all candidates for one hash meet on
  one task regardless of arrival partition)
- state per key: occurrence count (GroupState, state-store-backed,
  persisted across micro-batches AND across stream restarts via the
  checkpoint)
- output: the first-seen row per hash, chosen by (warc_ts, url) within the
  first batch that carries the hash — later occurrences emit nothing.

Scale: state is one small row per distinct content hash; the shuffle is the
same hash-partitioning any streaming agg pays. RocksDB state store
(``spark.sql.streaming.stateStore.providerClass``) keeps it off-heap at
10^12-doc scale.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("content_sha256", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
    ]
)

DEDUP_STATE_SCHEMA = T.StructType(
    [T.StructField("occurrences", T.LongType(), False)]
)


def _dedup_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    seen = state.get[0] if state.exists else 0
    first: pd.DataFrame | None = None
    total = seen
    cols = ["content_sha256", "url", "warc_ts"]
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        total += len(pdf)
        if seen == 0:
            # a group larger than the Arrow batch size arrives as MULTIPLE
            # chunks: track the running (warc_ts, url)-min across all of
            # them, not just the first chunk's
            head = pdf.sort_values(["warc_ts", "url"], kind="mergesort").iloc[[0]][cols]
            if first is None:
                first = head
            else:
                first = (
                    pd.concat([first, head])
                    .sort_values(["warc_ts", "url"], kind="mergesort")
                    .iloc[[0]]
                )
    state.update((total,))
    if first is not None:
        yield first


def streaming_exact_dedup(pages: DataFrame) -> DataFrame:
    """streaming pages(url, warc_ts, text, ...) -> first-seen rows per
    content hash, state persisted across micro-batches."""
    hashed = pages.withColumn("content_sha256", F.sha2(F.col("text"), 256))
    return hashed.groupBy("content_sha256").applyInPandasWithState(
        _dedup_fn,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
