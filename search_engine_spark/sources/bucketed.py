"""Bucketed (hash-clustered) tables for co-located joins.

Spark's ``bucketBy`` writes each output file pre-hash-partitioned and
pre-sorted on the bucket key and records the bucket spec in the catalog;
a join (or aggregation) between two tables bucketed on the same key with
the same bucket count then plans with ZERO Exchange — the shuffle that
normally dominates a big-big join never happens. This is the standing
layout for the engine's hottest repeated join, ``tokens ⋈ documents`` on
``doc_id``: at 10^11-row scale that shuffle moves the whole token table
per query batch, while bucketed tables move nothing (the reference gets
the same effect implicitly from Postgres btree-clustered PKs).

Sandbox notes:

- ``saveAsTable`` needs a catalog entry; the session catalog (in-memory,
  no Hive metastore required) is enough for the optimization to apply.
  ``path`` makes the table EXTERNAL so the files land where the caller
  says (tests use tmp dirs) and survive ``DROP TABLE``.
- On an Iceberg deployment the equivalent is the ``bucket(N, col)``
  partition transform plus storage-partitioned joins
  (``spark.sql.sources.v2.bucketing.enabled``) — declared through
  IcebergIO's ``partitionedBy`` seam, same plan effect.
- The bucket count is a LAYOUT CONTRACT like ``term_bucket``'s modulus
  (CLAUDE.md invariant 7): both sides must be written with the same
  ``n_buckets`` or the planner (correctly) falls back to shuffling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Overwrite ``table`` hash-bucketed (and per-file sorted) on ``key``.

    ``sort=True`` additionally sorts each bucket file by the key, which
    lets the bucketed sort-merge join skip its per-task Sort as well —
    the join becomes a pure streamed merge over co-located files.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    writer = df.write.format("parquet").mode("overwrite")
    if path is not None:
        writer = writer.option("path", path)
    writer = writer.bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read that carries the bucket spec into the plan (a plain
    ``spark.read.parquet(path)`` of the same files would NOT — the spec
    lives in the catalog, not the footers)."""
    return spark.table(table)
