"""Content fingerprints + exact dedup.

Reference computes a Simhash per done document (``duplicate_detection.py:45-69``)
into ``document_fingerprints`` — and never consumes it (SURVEY.md U7). We keep
the simhash column for parity AND add the sha256 exact-dedup the north_star
requires: per content hash keep the first document by url ASC.

Scale: sha256/xxhash are native Columns; simhash is the one pandas UDF. The
dedup window partitions by the hash — near-unique keys, no skew. At 10^12
docs the window shuffle is the cost; it shuffles only (doc_id, url, hash),
not content.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..udfs import simhash_udf


def build_fingerprints(documents: DataFrame) -> DataFrame:
    """documents -> (doc_id, content_sha256, simhash)."""
    return documents.select(
        "doc_id",
        F.sha2(F.col("content"), 256).alias("content_sha256"),
        simhash_udf(F.col("content")).alias("simhash"),
    )


def exact_dedup(documents: DataFrame) -> DataFrame:
    """Keep one document per distinct content (min url wins), preserving all
    columns. Deterministic at any parallelism."""
    w = Window.partitionBy(F.sha2(F.col("content"), 256)).orderBy(F.asc("url"))
    return (
        documents.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
