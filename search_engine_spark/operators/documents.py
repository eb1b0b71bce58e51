"""pages -> documents: extraction, validation, scoring, doc-id assignment.

Spark-first rebuild of the crawler's per-page processing
(``worker.py:56-159,191-266``): one Arrow-batched extraction UDF, then pure
Column expressions for validation (E14), quality (E11), freshness (E12) and
word count (E13). doc_id is ``xxhash64(url)`` — deterministic, no serial
sequences, stable across cluster sizes (SURVEY.md §1.2).

At scale: the extraction UDF is embarrassingly parallel over input file
splits; no shuffle happens until downstream aggregations. Filters on
``status`` and column pruning push down to the parquet/Iceberg scan.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark.sql import types as T

from ..udfs import PARSED_PAGE_SCHEMA, make_extract_map, word_count_col

SECONDS_PER_DAY = 86400

_PARSED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("lang", T.StringType(), True),
        *PARSED_PAGE_SCHEMA.fields,
    ]
)


def parse_pages(pages: DataFrame, now: datetime) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) -> parsed columns.

    One ``mapInPandas`` pass: html parsed exactly once per row (a
    struct-UDF formulation gets duplicated by filter pushdown), keeping
    ``links`` / ``feed_links`` arrays for the link-graph stage.
    """
    return pages.select("url", "warc_ts", "lang", "html").mapInPandas(
        make_extract_map(now), schema=_PARSED_SCHEMA
    )


def validate(parsed: DataFrame) -> DataFrame:
    """Validation predicate (``worker.py:306``) as native filters."""
    return parsed.filter(
        (F.col("title") != "")
        & (F.col("description") != "")
        & (F.col("content") != "")
        & (F.length("content") >= 120)
    )


def quality_col() -> F.Column:
    """``worker.py:146-152``: density minus link penalty, clamped."""
    wc = word_count_col("content").cast("double")
    n_links = F.size(F.col("links")).cast("double")
    density = F.least(F.lit(1.0), wc / F.lit(300.0))
    penalty = F.least(F.lit(0.4), n_links / wc)
    return F.when(wc == 0, F.lit(0.0)).otherwise(
        F.greatest(F.lit(0.0), density - penalty)
    )


def freshness_col(now: datetime) -> F.Column:
    """``worker.py:154-159``. Python ``timedelta.days`` floors the elapsed
    seconds, so we floor epoch-seconds deltas rather than use datediff
    (which counts calendar-day boundaries and disagrees near midnight)."""
    ts = F.coalesce(F.col("updated_at"), F.col("published_at"))
    now_lit = F.lit(now.replace(tzinfo=None)).cast("timestamp")
    days = F.floor(
        (F.unix_timestamp(now_lit) - F.unix_timestamp(ts)) / F.lit(SECONDS_PER_DAY)
    ).cast("double")
    return F.when(ts.isNull(), F.lit(0.1)).otherwise(
        F.greatest(F.lit(0.0), F.lit(1.0) - F.least(F.lit(365.0), days) / F.lit(365.0))
    )


def latest_by_url(pages: DataFrame) -> DataFrame:
    """Upsert-by-url semantics (``worker.py:200-214`` ON CONFLICT(url) DO
    UPDATE): when a url appears multiple times (re-crawls), keep the row with
    the greatest warc_ts (ties: greater html wins, deterministically)."""
    from pyspark.sql import Window

    w = Window.partitionBy("url").orderBy(
        F.desc_nulls_last("warc_ts"), F.desc("html")
    )
    return (
        pages.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def build_documents(pages: DataFrame, now: datetime) -> DataFrame:
    """Full pages -> documents transform (parsed columns retained for reuse).

    Returns columns: doc_id, url, title, description, content, links,
    feed_links, published_at, updated_at, word_count, quality_score,
    freshness_score, status.
    """
    parsed = validate(parse_pages(pages, now))
    return (
        parsed.withColumn("doc_id", F.xxhash64("url"))
        .withColumn("word_count", word_count_col("content"))
        .withColumn("quality_score", quality_col())
        .withColumn("freshness_score", freshness_col(now))
        .withColumn("status", F.lit("done"))
    )
