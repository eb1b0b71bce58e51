"""Term-partitioned compressed postings build — the scale-critical stage.

tokens(doc_id, term, field, frequency) -> postings(term, term_bucket, part,
df, ctf, block_max, postings) with per-(term, part) delta+varint binaries
(codec.py).

Skew design (north_rule: explicit salting/repartitioning for head terms):

- A Zipf head term can hold postings for a large fraction of the corpus; at
  10^12 docs a single-group ``applyInPandas`` would OOM one task. So heavy
  terms are SPLIT INTO PARTS by doc-id range: ``part = floor(unsigned(doc_id)
  / 2^64 * n_parts)``. The mapping is monotone in doc_id, so each part holds
  a contiguous, disjoint doc-id range and part order == global doc order —
  no merge pass is ever needed (segments concatenate, Lucene-style).
- ``n_parts`` is per-term, computed from the term's df:
  ``ceil(df / target_postings_per_part)`` — light terms get one part (no
  overhead), head terms get bounded groups. This is two-phase: a cheap
  df aggregation (map-side partial agg collapses skew), then the salted
  grouped encode.
- ``term_bucket = pmod(xxhash64(term), n_buckets)`` is the storage partition
  key: writing ``partitionBy('term_bucket')`` lets query-time IN-list scans
  partition-prune (the analog of the reference's ``idx_tokens_term`` B-tree,
  0001_initial_schema.py:72).

The grouped encode runs as ``applyInPandas`` over (term, part): each group
arrives as a pandas DataFrame, is sorted by doc_id, and encoded with the
pure-Python codec — one Python call per group, Arrow-batched.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..codec import encode_postings

DEFAULT_TARGET_POSTINGS_PER_PART = 250_000
DEFAULT_TERM_BUCKETS = 64
_U64 = float(1 << 64)
_U63 = float(1 << 63)

POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("term_bucket", T.IntegerType(), False),
        T.StructField("part", T.IntegerType(), False),
        T.StructField("df", T.LongType(), False),
        T.StructField("ctf", T.LongType(), False),
        T.StructField("block_max", T.ArrayType(T.DoubleType()), False),
        T.StructField("postings", T.BinaryType(), False),
    ]
)


def _encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("doc_id")
    doc_ids = pdf["doc_id"].tolist()
    ft = pdf["f1"].tolist()
    fd = pdf["f2"].tolist()
    fb = pdf["f4"].tolist()
    blob, block_max = encode_postings(doc_ids, ft, fd, fb)
    return pd.DataFrame(
        {
            "term": [pdf["term"].iloc[0]],
            "term_bucket": [int(pdf["term_bucket"].iloc[0])],
            "part": [int(pdf["part"].iloc[0])],
            "df": [len(doc_ids)],
            "ctf": [int(pdf["ctf_row"].sum())],
            "block_max": [block_max],
            "postings": [blob],
        }
    )


def build_postings(
    tokens: DataFrame,
    target_postings_per_part: int = DEFAULT_TARGET_POSTINGS_PER_PART,
    n_term_buckets: int = DEFAULT_TERM_BUCKETS,
) -> DataFrame:
    """tokens -> compressed per-(term, part) postings rows.

    ``df``/``ctf`` on each row are per-part; whole-term statistics live in
    term_statistics. Part ranges partition the doc-id space monotonically, so
    concatenating parts in part order yields the term's full sorted list.
    """
    # pivot fields: one row per (term, doc) with per-field frequencies
    per_doc = tokens.groupBy("term", "doc_id").agg(
        F.sum(F.when(F.col("field") == 1, F.col("frequency")).otherwise(0)).alias("f1"),
        F.sum(F.when(F.col("field") == 2, F.col("frequency")).otherwise(0)).alias("f2"),
        F.sum(F.when(F.col("field") == 4, F.col("frequency")).otherwise(0)).alias("f4"),
        F.sum("frequency").alias("ctf_row"),
    )

    # phase 1: per-term df -> per-term part count (skew-aware salting factor)
    term_df = per_doc.groupBy("term").agg(F.count(F.lit(1)).alias("term_df"))
    n_parts = F.greatest(
        F.lit(1),
        F.ceil(F.col("term_df") / F.lit(float(target_postings_per_part))),
    ).cast("int")
    term_parts = term_df.select("term", n_parts.alias("n_parts"))

    # phase 2: doc-id-range salt (monotone in doc_id) + grouped encode
    unit = (F.col("doc_id").cast("double") + F.lit(_U63)) / F.lit(_U64)  # [0,1)
    salted = (
        per_doc.join(term_parts, "term")
        .withColumn(
            "part",
            F.least(
                F.floor(unit * F.col("n_parts")).cast("int"),
                (F.col("n_parts") - 1).cast("int"),
            ),
        )
        .withColumn(
            "term_bucket",
            F.pmod(F.xxhash64("term"), F.lit(n_term_buckets)).cast("int"),
        )
    )

    return salted.groupBy("term", "part").applyInPandas(
        lambda pdf: _encode_group(pdf), schema=POSTINGS_SCHEMA
    )
