"""asof_join / interval_join vs brute-force Python oracles.

The oracles are the literal definitions: for each left row scan every
right row for the greatest right_ts <= left_ts (as-of), and for each
(point, interval) pair test start <= ts < end (interval). The operators
must agree exactly, including NULL handling, tie semantics, tolerance,
and half-open boundaries; the interval join's plan must stay an equi-join
(no cartesian / broadcast-nested-loop node).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.temporal import asof_join, interval_join

LEFT = [
    # (id, k, ts)
    (1, "a", 100),
    (2, "a", 150),
    (3, "a", 200),   # tie with right at 200
    (4, "b", 50),    # before every right row -> NULL
    (5, "b", 500),
    (6, "c", 10),    # key with no right rows at all
]
RIGHT = [
    # (k, ts, tag)
    ("a", 90, "r1"),
    ("a", 150, "r2"),   # tie with left id=2
    ("a", 200, "r3"),   # tie with left id=3
    ("b", 100, "r4"),
    ("b", 400, "r5"),
]


def _oracle_asof(strict=False, tolerance=None):
    out = {}
    for lid, k, lts in LEFT:
        best = None
        for rk, rts, tag in RIGHT:
            if rk != k:
                continue
            ok = rts < lts if strict else rts <= lts
            if ok and (best is None or rts > best[0]):
                best = (rts, tag)
        if best is not None and tolerance is not None and lts - best[0] > tolerance:
            best = None
        out[lid] = best
    return out


def _frames(spark):
    l = spark.createDataFrame(LEFT, "id long, k string, ts_us long")
    r = spark.createDataFrame(RIGHT, "k string, ts_us long, tag string")
    return l, r


@pytest.mark.parametrize("strict", [False, True])
@pytest.mark.parametrize("tolerance", [None, 60])
def test_asof_matches_oracle(spark, strict, tolerance):
    l, r = _frames(spark)
    got = {
        row["id"]: (row["ts_us_asof"], row["tag_asof"])
        for row in asof_join(
            l, r, on="k", tolerance=tolerance, strict=strict
        ).collect()
    }
    want = {
        lid: (m if m is not None else (None, None))
        for lid, m in _oracle_asof(strict, tolerance).items()
    }
    assert got == want


def test_asof_preserves_left_rows_and_columns(spark):
    l, r = _frames(spark)
    out = asof_join(l, r, on="k")
    assert out.count() == len(LEFT)
    assert set(out.columns) == {"id", "k", "ts_us", "ts_us_asof", "tag_asof"}


def test_asof_multi_key(spark):
    l = spark.createDataFrame(
        [(1, "a", 1, 100), (2, "a", 2, 100)], "id long, k string, g long, ts_us long"
    )
    r = spark.createDataFrame(
        [("a", 1, 90, "x"), ("a", 2, 95, "y")],
        "k string, g long, ts_us long, tag string",
    )
    got = {
        row["id"]: row["tag_asof"]
        for row in asof_join(l, r, on=["k", "g"]).collect()
    }
    assert got == {1: "x", 2: "y"}


INTERVALS = [
    # (iid, k, s, e)
    (10, "a", 100, 200),    # half-open: 100 in, 200 out
    (11, "a", 150, 150),    # empty -> matches nothing
    (12, "a", 0, 1000),     # spans many buckets
    (13, "b", 190, 210),    # crosses a bucket edge
]
POINTS = [
    # (pid, k, ts)
    (1, "a", 100),
    (2, "a", 199),
    (3, "a", 200),
    (4, "a", 999),
    (5, "b", 190),
    (6, "b", 209),
    (7, "b", 210),
    (8, "c", 150),
]


def _oracle_interval():
    return sorted(
        (iid, pid)
        for iid, ik, s, e in INTERVALS
        for pid, pk, ts in POINTS
        if ik == pk and s <= ts < e
    )


@pytest.mark.parametrize("width", [7, 100, 5000])
def test_interval_matches_oracle_any_bucket_width(spark, width):
    p = spark.createDataFrame(POINTS, "pid long, k string, ts_us long")
    iv = spark.createDataFrame(INTERVALS, "iid long, k string, s long, e long")
    got = sorted(
        (row["iid"], row["pid"])
        for row in interval_join(
            p, iv, "ts_us", "s", "e", bucket_width=width, on="k"
        ).collect()
    )
    assert got == _oracle_interval()


def test_interval_no_key_and_plan_has_no_cartesian(spark):
    p = spark.createDataFrame(POINTS, "pid long, k string, ts_us long")
    iv = spark.createDataFrame(INTERVALS, "iid long, k string, s long, e long")
    out = interval_join(p, iv, "ts_us", "s", "e", bucket_width=100)
    want = sorted(
        (iid, pid)
        for iid, _, s, e in INTERVALS
        for pid, _, ts in POINTS
        if s <= ts < e
    )
    got = sorted((row["iid"], row["pid"]) for row in out.collect())
    assert got == want
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_interval_rejects_bad_width(spark):
    p = spark.createDataFrame(POINTS, "pid long, k string, ts_us long")
    iv = spark.createDataFrame(INTERVALS, "iid long, k string, s long, e long")
    with pytest.raises(ValueError):
        interval_join(p, iv, "ts_us", "s", "e", bucket_width=0)


def test_interval_self_derived_sides(spark):
    """points and intervals cut from the SAME parent relation (the
    common self-join shape) must not trip ambiguous-column analysis."""
    base = spark.createDataFrame(
        [(1, "err", 100), (2, "click", 150), (3, "click", 400), (4, "err", 350)],
        "eid long, kind string, ts_us long",
    )
    iv = base.filter(F.col("kind") == "err").select(
        F.col("eid").alias("iid"), F.col("ts_us").alias("s"),
        (F.col("ts_us") + 100).alias("e"),
    )
    p = base.filter(F.col("kind") == "click").select("eid", "ts_us")
    got = sorted(
        (r["iid"], r["eid"])
        for r in interval_join(p, iv, "ts_us", "s", "e", bucket_width=100).collect()
    )
    assert got == [(1, 2), (4, 3)]
