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

from ..codec import decode_postings, encode_postings

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


_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("term_bucket", T.IntegerType(), False),
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("f1", T.LongType(), False),
        T.StructField("f2", T.LongType(), False),
        T.StructField("f4", T.LongType(), False),
        T.StructField("_segment", T.IntegerType(), False),
    ]
)

_DECODE_CHUNK = 1 << 18  # rows per yielded frame: bounds pandas memory


def _decode_rows(iterator):
    """postings rows -> per-(term, doc) frequency rows (mapInPandas).

    (itertuples would rename the underscore-prefixed ``_segment`` column,
    so columns are pulled as plain lists.)"""
    for pdf in iterator:
        terms = pdf["term"].tolist()
        buckets = pdf["term_bucket"].tolist()
        shards = pdf["shard"].tolist()
        blobs = pdf["postings"].tolist()
        segs = pdf["_segment"].tolist()
        for i in range(len(pdf)):
            ids, f1, f2, f4 = decode_postings(bytes(blobs[i]))
            for lo in range(0, len(ids), _DECODE_CHUNK):
                hi = lo + _DECODE_CHUNK
                n = len(ids[lo:hi])
                yield pd.DataFrame(
                    {
                        "term": [terms[i]] * n,
                        "term_bucket": [buckets[i]] * n,
                        "shard": [shards[i]] * n,
                        "doc_id": ids[lo:hi],
                        "f1": f1[lo:hi],
                        "f2": f2[lo:hi],
                        "f4": f4[lo:hi],
                        "_segment": [segs[i]] * n,
                    }
                )


def merge_postings(segments: list[DataFrame]) -> DataFrame:
    """Segment merge: N postings tables -> one (north_rule: "posting-list
    construction, MERGE, compression").

    Doc-LEVEL override semantics (LSM upsert): the newest segment that
    contains ANY posting for a doc owns that doc outright — so a
    re-crawled doc that no longer contains a term it had in an older
    segment stops matching that term (older segments' stale postings for
    the doc are dropped, not just overridden per (term, doc)).

    Plan: decode each segment's blobs to per-(term, doc) rows
    (mapInPandas, no shuffle), derive each doc's owning segment with a
    map-side-combined max over the uniformly distributed doc_id key, keep
    only rows from the owner, then regroup on the same bounded (term,
    shard) groups as the build and re-encode. Three shuffles — owner agg
    (doc_id), owner join (doc_id, exchange reused from the agg), re-encode
    groupBy (term, shard) — all on uniform or doc-range-capped keys; a
    head term never funnels through one reducer.

    ``df``/``ctf`` are recomputed per (term, shard) row, consistent with
    build_postings' per-shard semantics. Merging disjoint-doc segments is
    bit-identical to a single-shot build of the union.
    """
    if not segments:
        raise ValueError("merge_postings needs at least one segment")
    tagged = segments[0].withColumn("_segment", F.lit(0))
    for i, seg in enumerate(segments[1:], start=1):
        tagged = tagged.unionByName(seg.withColumn("_segment", F.lit(i)))
    # decoded feeds BOTH the owner aggregate and the join probe side; without
    # a materialization barrier the blob decode — the most expensive stage —
    # executes twice per merge (same lineage-breaking pattern as
    # connected_components / build_news_tables)
    decoded = tagged.mapInPandas(
        _decode_rows, schema=_DECODED_SCHEMA
    ).localCheckpoint(eager=True)
    owner = decoded.groupBy("doc_id").agg(F.max("_segment").alias("_owner"))
    kept = (
        decoded.join(owner, "doc_id")
        .filter(F.col("_segment") == F.col("_owner"))
        .withColumn("ctf_row", F.col("f1") + F.col("f2") + F.col("f4"))
    )
    return kept.groupBy("term", "shard").applyInPandas(
        lambda pdf: _encode_group(pdf), schema=POSTINGS_SCHEMA
    )


def _encode_token_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """One (term, shard) group of RAW token rows -> one postings row.

    The per-doc field pivot happens here (numpy scatter-add over the
    doc-id factorization) instead of in a separate Spark aggregation, so
    the build needs a single shuffle. ``np.unique`` returns doc ids
    sorted ascending — the order the codec requires."""
    import numpy as np

    d = pdf["doc_id"].to_numpy()
    f = pdf["field"].to_numpy()
    q = pdf["frequency"].to_numpy(dtype=np.int64)
    ids, inv = np.unique(d, return_inverse=True)
    f1 = np.zeros(len(ids), dtype=np.int64)
    f2 = np.zeros(len(ids), dtype=np.int64)
    f4 = np.zeros(len(ids), dtype=np.int64)
    for arr, fv in ((f1, 1), (f2, 2), (f4, 4)):
        m = f == fv
        np.add.at(arr, inv[m], q[m])
    blob, block_max, block_last, block_offset = encode_postings(
        ids.tolist(), f1.tolist(), f2.tolist(), f4.tolist()
    )
    return pd.DataFrame(
        {
            "term": [pdf["term"].iloc[0]],
            "term_bucket": [int(pdf["term_bucket"].iloc[0])],
            "shard": [int(pdf["shard"].iloc[0])],
            "df": [len(ids)],
            "ctf": [int(q.sum())],
            "block_max": [block_max],
            "block_last": [block_last],
            "block_offset": [block_offset],
            "postings": [blob],
        }
    )


def build_postings(
    tokens: DataFrame,
    n_shards: int = 1,
    n_term_buckets: int = DEFAULT_TERM_BUCKETS,
) -> DataFrame:
    """tokens -> compressed per-(term, shard) postings rows.

    ``df``/``ctf`` per row are per-shard; whole-term statistics live in
    term_statistics. Callers size ``n_shards`` via :func:`n_shards_for`.

    ONE shuffle (r05): raw token rows cluster straight onto the bounded
    (term, shard) groups and the per-doc field pivot runs inside the
    encode task (numpy scatter-add) rather than as a prior
    groupBy(term, doc_id) aggregation. The dropped aggregation's map-side
    combine only collapsed the ~1.1 rows/(term, doc) field split, so the
    fused plan shuffles almost the same bytes once instead of nearly
    twice — measured 27-33% faster at both local[16] and local[4] on the
    200k-page corpus, bit-identical output. Skew stays bounded exactly as
    before: the shard component caps every group at ~corpus/n_shards
    postings (invariant 6)."""
    salted = tokens.withColumn("shard", shard_col(n_shards)).withColumn(
        "term_bucket",
        F.pmod(F.xxhash64("term"), F.lit(n_term_buckets)).cast("int"),
    )
    return salted.groupBy("term", "shard").applyInPandas(
        _encode_token_group, schema=POSTINGS_SCHEMA
    )
