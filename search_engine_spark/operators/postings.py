"""Document-sharded, term-keyed compressed postings build — the
scale-critical stage.

tokens(doc_id, term, field, frequency) -> postings(term, term_bucket, shard,
df, ctf, block_max, block_last, block_offset, postings) with per-(term, shard)
delta+varint binaries (codec.py).

Layout rationale (north_rule: explicit partitioning / shuffle / skew):

- ``shard`` is a GLOBAL doc-id-range bucket: ``floor(unsigned(doc_id) / 2^64
  * n_shards)`` — identical boundaries for every term. Two properties follow:
  (1) a Zipf head term's postings split into n_shards bounded groups, so no
  single ``applyInPandas`` task ever holds more than ~corpus/n_shards
  postings — the skew cap; (2) within one shard, EVERY query term's list
  covers the same doc range, so a shard is a self-contained mini-index and
  query-time block-max WAND runs shard-local with a plain global top-k reduce
  after (document-partitioned search, the classic architecture).
- The mapping is monotone in doc_id, so shards concatenate in global doc
  order; rare terms fragment across shards (the standard doc-partitioned
  tradeoff — bounded by one row per (term, shard), and min/max file skipping
  still prunes them at scan time).
- ``term_bucket = pmod(xxhash64(term), n_buckets)`` is the storage partition
  key: ``partitionBy('term_bucket')`` lets query IN-list scans partition-prune
  (analog of the reference's ``idx_tokens_term`` B-tree, 0001:72).

Sizing: ``n_shards = ceil(n_docs / docs_per_shard)``. At 10^12 docs and
docs_per_shard=2^22 (~4M) that is ~238k shards; each (head-term, shard) group
stays ~4M postings ≈ tens of MB decoded — executor-safe.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..codec import encode_postings

DEFAULT_DOCS_PER_SHARD = 4_194_304  # 2^22
DEFAULT_TERM_BUCKETS = 64
_U64 = float(1 << 64)
_U63 = float(1 << 63)

POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("term_bucket", T.IntegerType(), False),
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("df", T.LongType(), False),
        T.StructField("ctf", T.LongType(), False),
        T.StructField("block_max", T.ArrayType(T.DoubleType()), False),
        T.StructField("block_last", T.ArrayType(T.LongType()), False),
        T.StructField("block_offset", T.ArrayType(T.IntegerType()), False),
        T.StructField("postings", T.BinaryType(), False),
    ]
)


def shard_col(n_shards: int) -> F.Column:
    """Monotone doc_id -> shard bucket in [0, n_shards)."""
    unit = (F.col("doc_id").cast("double") + F.lit(_U63)) / F.lit(_U64)  # [0,1)
    return F.least(
        F.floor(unit * F.lit(n_shards)).cast("int"), F.lit(n_shards - 1)
    )


def _encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("doc_id")
    doc_ids = pdf["doc_id"].tolist()
    blob, block_max, block_last, block_offset = encode_postings(
        doc_ids, pdf["f1"].tolist(), pdf["f2"].tolist(), pdf["f4"].tolist()
    )
    return pd.DataFrame(
        {
            "term": [pdf["term"].iloc[0]],
            "term_bucket": [int(pdf["term_bucket"].iloc[0])],
            "shard": [int(pdf["shard"].iloc[0])],
            "df": [len(doc_ids)],
            "ctf": [int(pdf["ctf_row"].sum())],
            "block_max": [block_max],
            "block_last": [block_last],
            "block_offset": [block_offset],
            "postings": [blob],
        }
    )


def n_shards_for(n_docs: int, docs_per_shard: int = DEFAULT_DOCS_PER_SHARD) -> int:
    return max(1, math.ceil(n_docs / docs_per_shard))


def _merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Merge >=1 postings rows of one (term, shard) into one row.

    Rows with higher ``_segment`` win on doc_id conflicts (newer segment
    overrides — the re-crawl upsert semantic). Decoded lists are combined
    by doc_id, re-sorted, re-encoded; block metadata is rebuilt.
    """
    from ..codec import decode_postings

    merged: dict[int, tuple[int, int, int]] = {}
    for _, row in pdf.sort_values("_segment").iterrows():
        ids, f1, f2, f4 = decode_postings(bytes(row["postings"]))
        for j, d in enumerate(ids):
            merged[d] = (f1[j], f2[j], f4[j])
    doc_ids = sorted(merged)
    blob, block_max, block_last, block_offset = encode_postings(
        doc_ids,
        [merged[d][0] for d in doc_ids],
        [merged[d][1] for d in doc_ids],
        [merged[d][2] for d in doc_ids],
    )
    ctf = sum(sum(merged[d]) for d in doc_ids)
    return pd.DataFrame(
        {
            "term": [pdf["term"].iloc[0]],
            "term_bucket": [int(pdf["term_bucket"].iloc[0])],
            "shard": [int(pdf["shard"].iloc[0])],
            "df": [len(doc_ids)],
            "ctf": [ctf],
            "block_max": [block_max],
            "block_last": [block_last],
            "block_offset": [block_offset],
            "postings": [blob],
        }
    )


def merge_postings(segments: list[DataFrame]) -> DataFrame:
    """Segment merge: N postings tables -> one (north_rule: "posting-list
    construction, MERGE, compression").

    Later segments override earlier ones per doc_id (LSM-style upsert: a
    re-crawled doc's postings in the newest segment replace its older
    ones). Shuffle key is (term, shard) — the same bounded-size groups as
    the build, so a head term's merge work is capped by the doc-range
    sharding exactly like construction.

    Note: ``ctf`` is recomputed as the sum of per-doc field frequencies
    (consistent with build_postings' per-shard semantics).
    """
    if not segments:
        raise ValueError("merge_postings needs at least one segment")
    tagged = segments[0].withColumn("_segment", F.lit(0))
    for i, seg in enumerate(segments[1:], start=1):
        tagged = tagged.unionByName(seg.withColumn("_segment", F.lit(i)))
    return tagged.groupBy("term", "shard").applyInPandas(
        lambda pdf: _merge_group(pdf), schema=POSTINGS_SCHEMA
    )


def build_postings(
    tokens: DataFrame,
    n_shards: int = 1,
    n_term_buckets: int = DEFAULT_TERM_BUCKETS,
) -> DataFrame:
    """tokens -> compressed per-(term, shard) postings rows.

    ``df``/``ctf`` per row are per-shard; whole-term statistics live in
    term_statistics. Callers size ``n_shards`` via :func:`n_shards_for`.
    """
    # pivot fields: one row per (term, doc) with per-field frequencies.
    # Map-side partial aggregation collapses head-term rows before shuffle.
    per_doc = tokens.groupBy("term", "doc_id").agg(
        F.sum(F.when(F.col("field") == 1, F.col("frequency")).otherwise(0)).alias("f1"),
        F.sum(F.when(F.col("field") == 2, F.col("frequency")).otherwise(0)).alias("f2"),
        F.sum(F.when(F.col("field") == 4, F.col("frequency")).otherwise(0)).alias("f4"),
        F.sum("frequency").alias("ctf_row"),
    )

    salted = per_doc.withColumn("shard", shard_col(n_shards)).withColumn(
        "term_bucket",
        F.pmod(F.xxhash64("term"), F.lit(n_term_buckets)).cast("int"),
    )

    return salted.groupBy("term", "shard").applyInPandas(
        lambda pdf: _encode_group(pdf), schema=POSTINGS_SCHEMA
    )
