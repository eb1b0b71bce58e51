"""Bucketed-table layout: the co-located join must plan with no Exchange
(and no per-task Sort when bucket files are pre-sorted), and return the
same rows as the shuffled join over the same data."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from search_engine_spark.sources.bucketed import read_bucketed, write_bucketed

N_BUCKETS = 8


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed_pair(spark, docs, tokens, tmp_path_factory):
    root = tmp_path_factory.mktemp("bucketed")
    write_bucketed(
        docs.select("doc_id", "url", "title"),
        "b_documents",
        "doc_id",
        N_BUCKETS,
        path=str(root / "documents"),
    )
    write_bucketed(
        tokens, "b_tokens", "doc_id", N_BUCKETS, path=str(root / "tokens")
    )
    yield read_bucketed(spark, "b_documents"), read_bucketed(spark, "b_tokens")
    spark.sql("DROP TABLE IF EXISTS b_documents")
    spark.sql("DROP TABLE IF EXISTS b_tokens")


def _colocated_join(spark, bdocs, btoks):
    # force the join path a big-big join takes at scale (no broadcast)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = btoks.join(bdocs, "doc_id").groupBy("doc_id", "url").agg(
            F.sum("frequency").alias("tf")
        )
        return joined, _plan(joined)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        else:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_plans_no_exchange(spark, bucketed_pair):
    bdocs, btoks = bucketed_pair
    _, plan = _colocated_join(spark, bdocs, btoks)
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"


def test_bucketed_join_matches_shuffled_join(spark, docs, tokens, bucketed_pair):
    bdocs, btoks = bucketed_pair
    joined, _ = _colocated_join(spark, bdocs, btoks)
    got = {tuple(r) for r in joined.collect()}
    want = {
        tuple(r)
        for r in tokens.join(docs.select("doc_id", "url"), "doc_id")
        .groupBy("doc_id", "url")
        .agg(F.sum("frequency").alias("tf"))
        .collect()
    }
    assert got == want


def test_mismatched_bucket_counts_fall_back_to_shuffle(
    spark, tokens, bucketed_pair, tmp_path
):
    """The layout contract: a different bucket count on one side cannot be
    co-located, and the planner must (correctly) reintroduce the shuffle
    rather than join wrong."""
    bdocs, _ = bucketed_pair
    write_bucketed(
        tokens, "b_tokens_other", "doc_id", N_BUCKETS * 2, path=str(tmp_path)
    )
    try:
        _, plan = _colocated_join(spark, bdocs, read_bucketed(spark, "b_tokens_other"))
        assert "Exchange" in plan
    finally:
        spark.sql("DROP TABLE IF EXISTS b_tokens_other")
