"""Bucket-partitioned ANN index layout (similarity.write_srp_index /
srp_index_probe): the scan must PRUNE to the probe's (band, bucket)
directories — plan-asserted like the term_bucket postings layout — and
the pruned probe must return exactly the candidates the in-memory SRP
path produces."""

import contextlib
import io
import os

from pyspark.sql import functions as F

from search_engine_spark.training_data.similarity import (
    cosine_similarity_col,
    srp_banded,
    srp_index_probe,
    srp_probe_buckets,
    write_srp_index,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
N_PLANES, BANDS, K = 32, 4, 10


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _built(spark, tmp_path_factory):
    path = str(tmp_path_factory.getbasetemp() / "srp_index")
    if not os.path.exists(path):
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        write_srp_index(emb, path, n_planes=N_PLANES, bands=BANDS)
    return path


def test_probe_plan_prunes_partitions(spark, tmp_path_factory):
    path = _built(spark, tmp_path_factory)
    qvec = [
        float(x)
        for x in spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .filter(F.col("vec_id") == 0)
        .first()["embedding"]
    ]
    df = srp_index_probe(spark, path, qvec, k=K, n_planes=N_PLANES, bands=BANDS)
    plan = _plan(df)
    # the literal (band, bucket) disjunction must reach the scan as
    # PartitionFilters — directory pruning, not a post-scan filter
    assert "PartitionFilters" in plan, plan
    pf = plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    assert "band" in pf and "bucket" in pf, plan
    # and the data filter must not silently re-read everything
    scan_dirs = {
        (b, v) for b, v in srp_probe_buckets(qvec, N_PLANES, BANDS)
    }
    assert len(scan_dirs) == BANDS


def test_probe_scan_reads_only_probe_buckets(spark, tmp_path_factory):
    """Runtime confirmation of the pruning: the pruned scan's row count
    equals the banded table's candidate count for the probe buckets —
    a full-corpus scan would read bands x n_vectors rows instead."""
    path = _built(spark, tmp_path_factory)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qvec = [
        float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    probes = srp_probe_buckets(qvec, N_PLANES, BANDS)
    cond = None
    for band, bucket in probes:
        c = (F.col("band") == band) & (F.col("bucket") == bucket)
        cond = c if cond is None else (cond | c)
    pruned_rows = spark.read.parquet(path).filter(cond).count()
    banded = srp_banded(emb, n_planes=N_PLANES, bands=BANDS)
    expected_rows = banded.filter(
        F.concat_ws(":", "band", "bucket").isin(
            [f"{b}:{v}" for b, v in probes]
        )
    ).count()
    total_rows = banded.count()
    assert pruned_rows == expected_rows
    assert pruned_rows < total_rows  # pruning actually dropped data


def test_probe_matches_in_memory_srp_candidates(spark, tmp_path_factory):
    path = _built(spark, tmp_path_factory)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qvec = [
        float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    got = [
        (r["id"], r["cosine"])
        for r in srp_index_probe(
            spark, path, qvec, k=K, n_planes=N_PLANES, bands=BANDS
        ).collect()
    ]
    # oracle: same candidates via the in-memory banded path
    probes = srp_probe_buckets(qvec, N_PLANES, BANDS)
    banded = srp_banded(emb, n_planes=N_PLANES, bands=BANDS)
    cand = (
        banded.filter(
            F.concat_ws(":", "band", "bucket").isin(
                [f"{b}:{v}" for b, v in probes]
            )
        )
        .select("id")
        .distinct()
        .join(emb.select(F.col("vec_id").alias("id"), "embedding"), "id")
    )
    qlit = F.array(*[F.lit(float(x)) for x in qvec])
    exp = [
        (r["id"], r["cosine"])
        for r in cand.withColumn(
            "cosine",
            F.round(cosine_similarity_col(F.col("embedding"), qlit), 6),
        )
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(K)
        .select("id", "cosine")
        .collect()
    ]
    assert got == exp
    assert got[0][0] == 0 and got[0][1] == 1.0  # the query finds itself
