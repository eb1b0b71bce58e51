"""Multimodal column plumbing: opaque binary media + typed metadata.

Images / audio / video ride through the pipeline as ``binary`` columns with a
typed metadata struct; compute-heavy decode / feature-extraction runs as
Arrow-batched ``mapInPandas`` stages so bytes never round-trip through
driver memory and each task handles a partition-sized batch stream.

The actual codecs (PIL / ffmpeg / torchaudio) are NOT available in this
environment, so the decode step is a clearly-marked STUB: by default it
raises NotImplementedError; with ``fake=True`` it produces deterministic
pseudo-features derived from the bytes (so the Spark-side plumbing — schema,
batching, partitioning, UDF signature — is fully exercised and tested).

Scale notes: media rows are wide (MBs of binary) — repartition by size
budget, not row count, before a decode pass (``target_batch_bytes``), and
keep metadata-only queries on the pruned narrow columns so parquet never
reads the blob pages (column pruning does this for free).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("source_url", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("sha256", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def synthesize_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic media table from a text corpus (test/bench fixture).

    payload = utf-8 bytes of the text; metadata computed natively so the
    blob column itself is never shipped to Python.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("application/octet-stream").alias("mime"),
        payload.alias("payload"),
        F.struct(
            F.concat(F.lit("synthetic://"), F.col(id_col)).alias("source_url"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.sha2(payload, 256).alias("sha256"),
        ).alias("meta"),
    )


def binary_metadata(media: DataFrame) -> DataFrame:
    """(media_id, n_bytes, magic_hex, sha256) — metadata scan, all JVM-side.

    magic_hex = first 4 payload bytes (the sniffing prefix a real pipeline
    dispatches decoders on). Pure Column expressions: at scale this reads
    only the payload column's pages it must (and nothing if metadata was
    precomputed into ``meta``).
    """
    return media.select(
        "media_id",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.lower(F.hex(F.substring(F.col("payload"), 1, 4))).alias("magic_hex"),
        F.sha2(F.col("payload"), 256).alias("sha256"),
    )


def repartition_by_bytes(
    media: DataFrame, target_batch_bytes: int = 64 << 20
) -> DataFrame:
    """Repartition so each task's payload volume ~= target_batch_bytes.

    Row-count partitioning misbehaves when blob sizes are skewed. The byte
    total comes from the narrow ``meta.n_bytes`` column when present (so
    parquet never reads the blob pages just to size the pass); falls back
    to octet_length(payload) for tables without precomputed metadata.
    """
    if "meta" in media.columns and any(
        f.name == "n_bytes" for f in media.schema["meta"].dataType.fields
    ):
        size_col = F.col("meta.n_bytes")
    else:
        size_col = F.octet_length("payload")
    total = media.agg(F.sum(size_col)).first()[0] or 0
    n_parts = max(1, int(total / target_batch_bytes) + 1)
    return media.repartition(n_parts, "media_id")


def _fake_features(payload: bytes | None, dim: int) -> tuple[int, int, int, list[float]]:
    if payload is None:
        return 0, 0, 0, [0.0] * dim
    n = len(payload)
    # deterministic pseudo-decode: "dimensions" from byte stats, features
    # from a rolling byte histogram — stands in for decode+embed
    width = (n % 640) + 1
    height = ((n // 7) % 480) + 1
    hist = [0] * dim
    for i, b in enumerate(payload[:4096]):
        hist[(b + i) % dim] += 1
    tot = float(sum(hist)) or 1.0
    return width, height, 1, [h / tot for h in hist]


def decode_features(
    media: DataFrame,
    fake: bool = False,
    dim: int = 16,
    target_batch_bytes: int = 64 << 20,
) -> DataFrame:
    """mapInPandas decode / feature-extract stage -> FEATURE_SCHEMA.

    STUB: real image/audio decoding needs codec libraries not present in
    this environment. ``fake=False`` raises NotImplementedError inside the
    task (fail-fast, clearly marked); ``fake=True`` runs the deterministic
    pseudo-decoder so tests exercise the full Arrow batch path.
    """
    sized = repartition_by_bytes(media, target_batch_bytes)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode requires codec libraries (PIL/ffmpeg) not "
                    "installed in this environment; pass fake=True for the "
                    "deterministic stub"
                )
            rows = [_fake_features(p, dim) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "width": [r[0] for r in rows],
                    "height": [r[1] for r in rows],
                    "n_frames": [r[2] for r in rows],
                    "feature": [r[3] for r in rows],
                }
            )

    return sized.select("media_id", "payload").mapInPandas(run, FEATURE_SCHEMA)
