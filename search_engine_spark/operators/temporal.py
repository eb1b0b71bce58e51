"""Temporal join operators Spark's DataFrame API lacks natively: as-of
join and interval (range) join — beyond-reference operators for the
event-analytics family (the reference engine has no event stream at all;
these are the standard missing pieces a training-data/analytics pipeline
needs next to sessionization).

Both operators take INTEGER timestamp columns (epoch microseconds — callers
derive them timezone-invariantly with :func:`pair_helpers.ntz_epoch_us`),
keeping the semantics engine-portable (CLAUDE.md invariant 3) and the
comparisons exact integer arithmetic (invariant 4).

Scale shapes
------------
``asof_join`` is the union-and-sweep plan: tag both inputs, union, ONE
shuffle partitioned by the join key, and a running ``last(_, ignorenulls)``
window per key — never a per-row range probe or a broadcast of either side.
Cost is one exchange + an in-partition sort, identical to what a native
ASOF physical operator would do; skew is bounded by per-key row counts
(events-per-user here), not by value ranges.

``interval_join`` is the bucketed range join: each interval explodes into
the fixed-width time buckets it covers (``len/width + 1`` rows — bounded
fan-out chosen by the caller to match typical interval length), the point
side maps to exactly ONE bucket, and the equi-join on (key, bucket) feeds
an exact residual range filter. No cartesian product, no
broadcast-nested-loop: the plan stays a shuffled hash join whose key
includes time, so a 100× longer event history means proportionally more
buckets, not a quadratically larger join. Because a point belongs to one
bucket, each (point, interval) match is produced at most once — no
post-join dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "interval_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str = "ts_us",
    right_ts: str = "ts_us",
    tolerance: int | None = None,
    strict: bool = False,
    suffix: str = "_asof",
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``right_ts <= left_ts`` (``<`` when ``strict``) sharing the ``on``
    key — LEFT semantics: unmatched left rows keep NULL right columns.

    ``tolerance`` (micros) voids matches older than
    ``left_ts - tolerance`` (pandas ``merge_asof`` semantics). The right
    side must be unique per (key, right_ts) — with duplicates "the"
    latest right row is ill-defined; pre-reduce (e.g. ``max_by``) first.

    Right columns arrive suffixed (``value`` -> ``value_asof``); the
    matched timestamp itself is ``{right_ts}{suffix}``.
    """
    key = [on] if isinstance(on, str) else list(on)
    r_payload = [c for c in right.columns if c not in key]

    lhs = left
    for c in r_payload:
        lhs = lhs.withColumn(
            c + suffix, F.lit(None).cast(right.schema[c].dataType)
        )
    lhs = lhs.withColumn("_t", F.col(left_ts)).withColumn("_side", F.lit(1))

    rhs = right.select(
        *key, *[F.col(c).alias(c + suffix) for c in r_payload]
    ).withColumn("_t", F.col(right_ts + suffix)).withColumn(
        "_side", F.lit(0)
    )
    for c in left.columns:
        if c not in key:
            rhs = rhs.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    u = lhs.unionByName(rhs)
    # right-before-left at equal _t makes ties match (<=); flipping the
    # side order makes equal timestamps invisible to the left row (<).
    order = [F.col("_t"), F.col("_side") if not strict else -F.col("_side")]
    w = (
        Window.partitionBy(*key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = u.select(
        "*",
        *[
            F.last(c + suffix, ignorenulls=True).over(w).alias("_sw_" + c)
            for c in r_payload
        ],
    ).filter(F.col("_side") == 1)

    keep_match = F.lit(True)
    if tolerance is not None:
        keep_match = (
            F.col("_t") - F.col("_sw_" + right_ts) <= F.lit(tolerance)
        )
    out = swept
    for c in r_payload:
        out = out.withColumn(
            c + suffix, F.when(keep_match, F.col("_sw_" + c))
        )
    return out.drop("_t", "_side", *["_sw_" + c for c in r_payload])


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start: str,
    end: str,
    bucket_width: int,
    on: list[str] | str | None = None,
) -> DataFrame:
    """Match point rows to interval rows with ``start <= point_ts < end``
    (half-open, empty intervals match nothing), optionally also equi-keyed
    on ``on``. Inner matches only; for "count events per window, zeros
    included", aggregate this result and left-join it back from the
    intervals relation on the interval's own id.

    ``bucket_width`` (micros) sets the explode fan-out: an interval emits
    ``(end - start) // width + 1`` rows; pick it near the typical interval
    length so the fan-out stays O(1) per interval.
    """
    key = [] if on is None else ([on] if isinstance(on, str) else list(on))
    w = int(bucket_width)
    if w <= 0:
        raise ValueError("bucket_width must be positive micros")

    # alias both sides: points and intervals routinely derive from the
    # same parent relation (self-derived windows), and unqualified column
    # references would be ambiguous in that self-join.
    p = points.withColumn(
        "_bkt", F.floor(F.col(point_ts) / F.lit(w)).cast("long")
    ).alias("_ij_p")
    # sequence over floor(start/w)..floor((end-1)/w); guard empty/negative
    # intervals out before sequence() (sequence(a, b) with b < a steps -1).
    iv = (
        intervals.filter(F.col(end) > F.col(start))
        .withColumn(
            "_bkt",
            F.explode(
                F.sequence(
                    F.floor(F.col(start) / F.lit(w)).cast("long"),
                    F.floor((F.col(end) - 1) / F.lit(w)).cast("long"),
                )
            ),
        )
        .alias("_ij_i")
    )

    def pc(c):
        return F.col(f"_ij_p.{c}")

    def ic(c):
        return F.col(f"_ij_i.{c}")

    cond = pc("_bkt") == ic("_bkt")
    for k in key:
        cond = cond & (pc(k) == ic(k))
    matched = p.join(iv, cond, "inner").filter(
        (pc(point_ts) >= ic(start)) & (pc(point_ts) < ic(end))
    )
    point_cols = [pc(c) for c in points.columns if c not in key]
    iv_cols = [ic(c) for c in intervals.columns]
    return matched.select(*iv_cols, *point_cols)
