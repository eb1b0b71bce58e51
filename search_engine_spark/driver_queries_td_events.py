"""Event-stream pairs: sessions, funnels, time series, queueing.

Split out of driver_queries_td.py (see that module for the shared pair
contract). Constants used only by this domain's pairs are defined here —
the per-module grep surface CLAUDE.md invariant 8 asks for.
"""

from __future__ import annotations
import math
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from .pair_helpers import (
    SQL_FIXED6_LONG,
    SQL_SUM_FIXED6,
    SQL_WS_TOKENS,
    doc_frequencies,
    fixed6_long,
    ntz_epoch_us,
    scalar_count,
    sum_fixed6,
)
from .stopwords import STOPWORDS
from .training_data import dedup as D
from .training_data import similarity as S
from .training_data import textstats as X
from .training_data.multimodal import synthesize_media
from .driver_queries_td_shared import (
    US_PER_DAY_DIV,
    US_PER_HOUR_DIV,
    US_PER_MINUTE_DIV,
    _read,
)

# --------------------------------------------------------------------------
# Sessionization over events: per-user session windows split at >30 min
# gaps (lag + cumulative-sum-of-breaks), aggregated per session
# --------------------------------------------------------------------------
SESSION_GAP_MIN = 30


def q_event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows per user, split at gaps > 30 min.

    All time arithmetic runs on integer epoch microseconds derived
    timezone-invariantly from the NTZ wall-clock (pair_helpers.ntz_epoch_us)
    — a tz-dependent epoch would split sessions differently from the
    oracle's tz-less epoch_us for timestamps inside a session-tz DST gap.
    Session bounds are emitted as BIGINT micros (not microsecond-precision
    timestamps, whose serialization was the one r01 hash mismatch), and
    sum_value is an integer-scaled exact sum (invariant 4)."""
    events = _read(spark, sf_dir, "events")
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = events.withColumn("_us", ntz_epoch_us(F.col("ts")))
    gap = F.col("_us") - F.lag("_us").over(w_user)
    is_break = F.when(
        gap.isNull() | (gap > SESSION_GAP_MIN * 60 * 1_000_000), 1
    ).otherwise(0)
    sessions = (
        ev.withColumn("_brk", is_break)
        .withColumn(
            "session_seq",
            F.sum("_brk").over(
                w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    return sessions.groupBy("user_id", "session_seq").agg(
        F.min("_us").alias("session_start_us"),
        F.max("_us").alias("session_end_us"),
        F.count(F.lit(1)).alias("n_events"),
        sum_fixed6("value", "sum_value"),
    )


SQL_EVENT_SESSIONS = f"""
WITH marked AS (
  SELECT user_id, event_id, ts, value, epoch_us(ts) AS us,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_MIN * 60 * 1_000_000}
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, us, value,
         -- CAST: DuckDB window-sum of INTEGER yields HUGEINT, which pandas
         -- serializes as float64 (11.0 vs Spark's int64 11) and fails the
         -- value hash even when every value matches (r02 verdict item 1)
         CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS session_seq
  FROM marked
)
SELECT user_id, session_seq,
       min(us) AS session_start_us,
       max(us) AS session_end_us,
       count(*) AS n_events,
       round(sum(CAST(round(value * 1000000.0) AS BIGINT)) / 1000000.0, 6) AS sum_value
FROM sessions
GROUP BY user_id, session_seq
"""


# --------------------------------------------------------------------------
# Equi-width value histogram per event type — the distribution report an
# ingest pipeline keeps per metric. The bucket index floor(value/width) is
# computed on the RAW stored double (identical bits in both engines, so
# the floor can never disagree); counts are exact BIGINTs on the bounded
# (type, bucket) key with map-side partials; the share is one divide of
# exact BIGINTs rounded 6, per-type totals derived from the aggregated
# relation itself (no second scan).
# --------------------------------------------------------------------------
HIST_WIDTH = 25


def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    b = events.filter(F.col("value").isNotNull()).select(
        "event_type",
        F.floor(F.col("value") / F.lit(float(HIST_WIDTH)))
        .cast("long")
        .alias("bucket"),
    )
    counts = b.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    totals = counts.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("total")
    )
    return counts.join(F.broadcast(totals), "event_type").select(
        "event_type",
        "bucket",
        (F.col("bucket") * HIST_WIDTH).cast("long").alias("lo"),
        "n",
        F.round(F.col("n").cast("double") / F.col("total"), 6).alias("share"),
    )


SQL_VALUE_HISTOGRAM = f"""
WITH counts AS (
  SELECT event_type,
         CAST(floor(value / {HIST_WIDTH}.0) AS BIGINT) AS bucket,
         CAST(count(*) AS BIGINT) AS n
  FROM events WHERE value IS NOT NULL
  GROUP BY 1, 2
),
totals AS (
  SELECT event_type, CAST(sum(n) AS BIGINT) AS total
  FROM counts GROUP BY event_type
)
SELECT c.event_type, c.bucket,
       CAST(c.bucket * {HIST_WIDTH} AS BIGINT) AS lo,
       c.n,
       round(CAST(c.n AS DOUBLE) / t.total, 6) AS share
FROM counts c JOIN totals t USING (event_type)
"""


# --------------------------------------------------------------------------
# Semi-structured JSON extraction from the events props column — the
# schema-on-read payload projection every ingest pipeline does (Spark
# get_json_object vs DuckDB json_extract, both JSONPath): per event type,
# integer stats over the extracted k plus a parse-failure count (NULL on
# malformed/missing in BOTH engines — asserted by the fixture test). All
# counts/sums exact BIGINT; the mean is pure-BIGINT division (the
# event_gaps half-ulp lesson). NOTE Spark DIV truncates toward zero while
# DuckDB // floors — identical only where sum(k) >= 0 (true for the
# synthetic k ∈ [0, 99]) or the division is exact; a payload with
# negative sums would need a floordiv spelling on the Spark side.
# --------------------------------------------------------------------------
def q_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    k = events.select(
        "event_type",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )
    return k.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.col("k").isNull().cast("long")).cast("long").alias("n_unparsed"),
        F.min("k").cast("long").alias("min_k"),
        F.max("k").cast("long").alias("max_k"),
        F.expr("sum(k) DIV count(k)").cast("long").alias("mean_k"),
    )


SQL_PROPS_EXTRACT = """
WITH k AS (
  SELECT event_type,
         CAST(json_extract(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unparsed,
       CAST(min(k) AS BIGINT) AS min_k,
       CAST(max(k) AS BIGINT) AS max_k,
       CAST(CAST(sum(k) AS BIGINT) // count(k) AS BIGINT) AS mean_k
FROM k GROUP BY event_type
"""


# --------------------------------------------------------------------------
# ROLLUP over events: multi-level aggregation in one pass (beyond-reference
# analytics; grouping_id distinguishes the levels deterministically)
# --------------------------------------------------------------------------
def q_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    return (
        events.withColumn("day", F.to_date("ts"))
        .rollup("day", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # integer-scaled exact sum (invariant 4): order-independent
            sum_fixed6("value", "sum_value"),
        )
        .select(
            # subtotal rows carry NULL keys; sentinel them so every engine
            # and the driver's row-sorting comparator handle them uniformly
            F.coalesce(F.col("day").cast("string"), F.lit("(all)")).alias("day"),
            F.coalesce("event_type", F.lit("(all)")).alias("event_type"),
            "n_events",
            "sum_value",
        )
    )


SQL_EVENTS_ROLLUP = """
SELECT COALESCE(ts_day::VARCHAR, '(all)') AS day,
       COALESCE(event_type, '(all)') AS event_type,
       count(*) AS n_events,
       round(sum(CAST(round(value * 1000000.0) AS BIGINT)) / 1000000.0, 6) AS sum_value
FROM (SELECT ts::DATE AS ts_day, event_type, value FROM events)
GROUP BY ROLLUP (ts_day, event_type)
"""
ANOMALY_Z = 3


def q_events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _read(spark, sf_dir, "events").select(
        "event_type", ntz_epoch_us(F.col("ts")).alias("_us")
    )
    hc = (
        ev.select("event_type", F.expr(f"_us DIV {US_PER_HOUR_DIV}").alias("hour_idx"))
        .groupBy("event_type", "hour_idx")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    st = (
        hc.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("nh"),
            F.sum("n").cast("long").alias("sx"),
            F.sum(F.col("n") * F.col("n")).cast("long").alias("sxx"),
        )
        .filter(F.col("nh") >= 2)
    )
    nh_d = F.col("nh").cast("double")
    sx_d = F.col("sx").cast("double")
    den = nh_d * F.col("sxx") - sx_d * F.col("sx")
    z = F.when(
        den > 0,
        F.round(
            (F.col("n") - sx_d / F.col("nh"))
            / F.sqrt(den / (nh_d * (F.col("nh") - 1))),
            6,
        ),
    )
    return (
        hc.join(st, "event_type")
        .select(
            "event_type",
            F.col("hour_idx").cast("long").alias("hour_idx"),
            "n",
            z.alias("z"),
        )
        .select(
            "event_type",
            "hour_idx",
            "n",
            "z",
            F.when(
                F.col("z").isNotNull() & (F.abs("z") >= ANOMALY_Z), F.lit(1)
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("is_anomaly"),
        )
    )


SQL_EVENTS_ANOMALY = f"""
WITH hc AS (
  SELECT event_type, epoch_us(ts) // {US_PER_HOUR_DIV} AS hour_idx,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, hour_idx
),
st AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS nh,
         CAST(sum(n) AS BIGINT) AS sx,
         CAST(sum(n * n) AS BIGINT) AS sxx
  FROM hc GROUP BY event_type HAVING count(*) >= 2
),
z AS (
  SELECT hc.event_type, CAST(hc.hour_idx AS BIGINT) AS hour_idx, hc.n,
         CASE WHEN (CAST(st.nh AS DOUBLE) * st.sxx - CAST(st.sx AS DOUBLE) * st.sx) > 0
           THEN round((hc.n - CAST(st.sx AS DOUBLE) / st.nh)
                      / sqrt((CAST(st.nh AS DOUBLE) * st.sxx
                              - CAST(st.sx AS DOUBLE) * st.sx)
                             / (CAST(st.nh AS DOUBLE) * (st.nh - 1))), 6)
         END AS z
  FROM hc JOIN st USING (event_type)
)
SELECT event_type, hour_idx, n, z,
       CASE WHEN z IS NOT NULL AND abs(z) >= {ANOMALY_Z}
         THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS is_anomaly
FROM z
"""


# --------------------------------------------------------------------------
# Event funnel (beyond-reference analytics): view -> click -> purchase,
# each step strictly after the previous AND inside a 24 h conversion
# window (without the window every dense synthetic stream converts and
# the funnel is degenerate; 24 h yields real attrition at every sf).
# Invariant 3: all time math on ntz_epoch_us BIGINTs. The four counts are
# in-plan 1-row aggregates cross-joined (scalar_count pattern — zero
# driver actions); rates are single divides of exact BIGINTs, rounded 6.
# --------------------------------------------------------------------------
FUNNEL_WINDOW_US = 24 * 3600 * 1_000_000
FUNNEL_STEPS = ("view", "click", "purchase")


def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _read(spark, sf_dir, "events").select(
        "user_id", "event_type", ntz_epoch_us(F.col("ts")).alias("us")
    )
    s1 = (
        ev.filter(F.col("event_type") == FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("us").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == FUNNEL_STEPS[1])
        .join(s1, "user_id")
        .filter(
            (F.col("us") > F.col("t1"))
            & (F.col("us") <= F.col("t1") + F.lit(FUNNEL_WINDOW_US))
        )
        .groupBy("user_id")
        .agg(F.min("us").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == FUNNEL_STEPS[2])
        .join(s2, "user_id")
        .filter(
            (F.col("us") > F.col("t2"))
            & (F.col("us") <= F.col("t2") + F.lit(FUNNEL_WINDOW_US))
        )
        .groupBy("user_id")
        .agg(F.min("us").alias("t3"))
    )
    c = (
        scalar_count(ev.select("user_id").distinct(), "n_users", as_double=False)
        .crossJoin(scalar_count(s1, "n_view", as_double=False))
        .crossJoin(scalar_count(s2, "n_click", as_double=False))
        .crossJoin(scalar_count(s3, "n_purchase", as_double=False))
    )

    def rate(num, den):
        return F.when(
            F.col(den) > 0, F.round(F.col(num).cast("double") / F.col(den), 6)
        )

    return c.select(
        "n_users",
        "n_view",
        "n_click",
        "n_purchase",
        rate("n_view", "n_users").alias("view_rate"),
        rate("n_click", "n_view").alias("click_rate"),
        rate("n_purchase", "n_click").alias("purchase_rate"),
    )


SQL_EVENT_FUNNEL = f"""
WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
s1 AS (SELECT user_id, min(us) AS t1 FROM ev
       WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY user_id),
s2 AS (SELECT e.user_id, min(e.us) AS t2 FROM ev e JOIN s1 USING (user_id)
       WHERE e.event_type = '{FUNNEL_STEPS[1]}'
         AND e.us > s1.t1 AND e.us <= s1.t1 + {FUNNEL_WINDOW_US}
       GROUP BY e.user_id),
s3 AS (SELECT e.user_id, min(e.us) AS t3 FROM ev e JOIN s2 USING (user_id)
       WHERE e.event_type = '{FUNNEL_STEPS[2]}'
         AND e.us > s2.t2 AND e.us <= s2.t2 + {FUNNEL_WINDOW_US}
       GROUP BY e.user_id),
c AS (
  SELECT CAST((SELECT count(*) FROM (SELECT DISTINCT user_id FROM ev)) AS BIGINT)
           AS n_users,
         CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_view,
         CAST((SELECT count(*) FROM s2) AS BIGINT) AS n_click,
         CAST((SELECT count(*) FROM s3) AS BIGINT) AS n_purchase
)
SELECT n_users, n_view, n_click, n_purchase,
       CASE WHEN n_users > 0
         THEN round(CAST(n_view AS DOUBLE) / n_users, 6) END AS view_rate,
       CASE WHEN n_view > 0
         THEN round(CAST(n_click AS DOUBLE) / n_view, 6) END AS click_rate,
       CASE WHEN n_click > 0
         THEN round(CAST(n_purchase AS DOUBLE) / n_click, 6) END AS purchase_rate
FROM c
"""


# --------------------------------------------------------------------------
# As-of join (operators/temporal.py): purchase -> latest preceding click
# per user (click attribution). Spark runs the union-and-sweep plan (one
# key-partitioned shuffle + running last-ignorenulls window — the
# distributed ASOF shape); the oracle is DuckDB's NATIVE `ASOF LEFT JOIN`,
# a genuinely independent formulation of the same semantics. The click
# side is pre-reduced to one row per (user, ts) with max(event_id) — with
# duplicate build-side timestamps "the" latest row is ill-defined in both
# engines. All time arithmetic on tz-invariant epoch micros (invariant 3);
# every column BIGINT (no HUGEINT: max(), not sum()). Unmatched purchases
# emit -1, not NULL: a nullable BIGINT serializes through pandas as
# float64-with-NaN, the exact int64-vs-float64 hash trap of invariant 1 —
# the sentinel keeps both engines at non-null int64 (the operator itself
# keeps LEFT/NULL semantics; only this pair's projection is
# sentinel-coded).
# --------------------------------------------------------------------------
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.temporal import asof_join

    ev = _read(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", ntz_epoch_us(F.col("ts")).alias("us")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("us").alias("purchase_us"),
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", F.col("us").alias("ts_us"))
        .agg(F.max("event_id").alias("click_id"))
    )
    return asof_join(
        purchases, clicks, on="user_id", left_ts="purchase_us", right_ts="ts_us"
    ).select(
        "purchase_id",
        "user_id",
        "purchase_us",
        F.coalesce(F.col("click_id_asof"), F.lit(-1).cast("long")).alias(
            "click_id"
        ),
        F.coalesce(
            F.col("purchase_us") - F.col("ts_us_asof"), F.lit(-1).cast("long")
        ).alias("gap_us"),
    )


SQL_ASOF_JOIN = """
WITH p AS (
  SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS purchase_us
  FROM events WHERE event_type = 'purchase'
),
c AS (
  SELECT user_id, epoch_us(ts) AS ts_us, max(event_id) AS click_id
  FROM events WHERE event_type = 'click'
  GROUP BY user_id, epoch_us(ts)
)
SELECT p.purchase_id, p.user_id, p.purchase_us,
       COALESCE(c.click_id, -1) AS click_id,
       COALESCE(p.purchase_us - c.ts_us, -1) AS gap_us
FROM p ASOF LEFT JOIN c
  ON p.user_id = c.user_id AND p.purchase_us >= c.ts_us
"""


# --------------------------------------------------------------------------
# Interval (range) join (operators/temporal.py): clicks inside each error
# event's trailing 5-minute window, zeros kept — the "events per window"
# shape. Spark explodes intervals into fixed-width time buckets and
# equi-joins on (user, bucket) + exact residual filter (no cartesian /
# broadcast-nested-loop; plan-asserted in tests/test_temporal.py); the
# oracle is the plain inequality join a single-node engine can afford.
# --------------------------------------------------------------------------
ERR_WINDOW_US = 5 * 60 * 1_000_000


def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.temporal import interval_join

    ev = _read(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", ntz_epoch_us(F.col("ts")).alias("us")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("us").alias("s"),
        (F.col("us") + F.lit(ERR_WINDOW_US)).alias("e"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("us").alias("ts_us"),
    )
    matches = interval_join(
        clicks, errors, "ts_us", "s", "e", bucket_width=ERR_WINDOW_US, on="user_id"
    )
    counts = matches.groupBy("error_id").agg(
        F.count(F.lit(1)).alias("n_clicks")
    )
    return errors.join(counts, "error_id", "left").select(
        "error_id",
        "user_id",
        F.col("s").alias("window_start_us"),
        F.coalesce(F.col("n_clicks"), F.lit(0).cast("long")).alias("n_clicks"),
    )


SQL_INTERVAL_JOIN = f"""
WITH e AS (
  SELECT event_id AS error_id, user_id, epoch_us(ts) AS s
  FROM events WHERE event_type = 'error'
),
c AS (
  SELECT user_id, epoch_us(ts) AS us
  FROM events WHERE event_type = 'click'
)
SELECT e.error_id, e.user_id, e.s AS window_start_us,
       CAST(count(c.us) AS BIGINT) AS n_clicks
FROM e LEFT JOIN c
  ON c.user_id = e.user_id AND c.us >= e.s AND c.us < e.s + {ERR_WINDOW_US}
GROUP BY e.error_id, e.user_id, e.s
"""


# --------------------------------------------------------------------------
# Cohort retention over events (beyond-reference analytics): users bucketed
# by first-active day, distinct-user counts at each day offset — the
# classic retention triangle. Invariant 3: the day index is pure integer
# arithmetic on ntz_epoch_us (DIV truncation = DuckDB // floor for the
# always-positive epoch). Invariant 6: the distinct-user count per
# (cohort, offset) is two-phase — the (user, day) relation is made
# distinct FIRST (uniform keys), after which each row maps to exactly one
# (cohort, offset, user), so a plain count is exact and no countDistinct
# ever groups by the skewed cohort key. Invariant 4: the only float is
# one divide of two exact BIGINTs, rounded 6.
# --------------------------------------------------------------------------
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    days = (
        events.select("user_id", ntz_epoch_us(F.col("ts")).alias("_us"))
        .select("user_id", F.expr(f"_us DIV {US_PER_DAY_DIV}").alias("day_idx"))
        .distinct()
    )
    cohorts = days.groupBy("user_id").agg(
        F.min("day_idx").cast("long").alias("cohort_day")
    )
    pairs = days.join(cohorts, "user_id").select(
        "cohort_day",
        (F.col("day_idx") - F.col("cohort_day")).cast("long").alias("offset_days"),
    )
    active = pairs.groupBy("cohort_day", "offset_days").agg(
        F.count(F.lit(1)).cast("long").alias("active_users")
    )
    sizes = cohorts.groupBy("cohort_day").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_users")
    )
    return active.join(sizes, "cohort_day").select(
        "cohort_day",
        "offset_days",
        "active_users",
        "cohort_users",
        F.round(
            F.col("active_users").cast("double") / F.col("cohort_users"), 6
        ).alias("retained_frac"),
    )


SQL_COHORT_RETENTION = f"""
WITH days AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {US_PER_DAY_DIV} AS day_idx
  FROM events
),
cohorts AS (
  SELECT user_id, CAST(min(day_idx) AS BIGINT) AS cohort_day
  FROM days GROUP BY user_id
),
pairs AS (
  SELECT c.cohort_day, CAST(d.day_idx - c.cohort_day AS BIGINT) AS offset_days
  FROM days d JOIN cohorts c USING (user_id)
),
active AS (
  SELECT cohort_day, offset_days, CAST(count(*) AS BIGINT) AS active_users
  FROM pairs GROUP BY cohort_day, offset_days
),
sizes AS (
  SELECT cohort_day, CAST(count(*) AS BIGINT) AS cohort_users
  FROM cohorts GROUP BY cohort_day
)
SELECT a.cohort_day, a.offset_days, a.active_users, s.cohort_users,
       round(CAST(a.active_users AS DOUBLE) / s.cohort_users, 6) AS retained_frac
FROM active a JOIN sizes s USING (cohort_day)
"""


# --------------------------------------------------------------------------
# Rolling engagement (DAU / trailing-7-day WAU / stickiness) over events.
# Rolling DISTINCT does not decompose like a rolling sum, and the naive
# per-day "countDistinct over a 7-day self-join window" both re-scans the
# event stream 7x and funnels each day's users through one reducer. Shape
# here: ONE distinct on the uniform (user, day) key collapses the stream,
# a bounded 7x explode re-keys each active day to the windows it covers,
# a second uniform-key distinct dedups multi-active users per window, and
# the final counts group by the ~bounded day key. Invariant 3: the day
# index is integer DIV on ntz_epoch_us. Invariant 4: stickiness is the
# one divide of exact BIGINTs, rounded 6. Reported for OBSERVED days only.
# --------------------------------------------------------------------------
# --------------------------------------------------------------------------
# Per-user inter-event gaps (lead/lag windows) + event-type Markov
# transitions over events. Both order each user's stream by the
# deterministic (epoch_us, event_id) total order — the per-user window is
# the sessionization precedent (bounded by per-user event counts, never a
# corpus-wide sort). Invariant 3: all time math on ntz_epoch_us BIGINTs.
# Invariant 4: gaps/counts are exact integers; the means/probabilities are
# single divides of exact BIGINTs rounded 6.
# --------------------------------------------------------------------------
def q_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("_us", "event_id")
    gaps = (
        events.select(
            "user_id", "event_id", ntz_epoch_us(F.col("ts")).alias("_us")
        )
        .select(
            "user_id",
            (F.col("_us") - F.lag("_us").over(w)).alias("gap_us"),
        )
        .filter(F.col("gap_us").isNotNull())
    )
    # the mean stays INTEGER microseconds (floor division of exact
    # BIGINTs): a rounded double mean of ~1e10-magnitude µs values lands
    # on half-ulp boundaries where Spark and DuckDB disagree in the last
    # printed digit — the invariant-1 trap; DIV truncation == DuckDB //
    # floor on the always-positive sum
    return gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.min("gap_us").cast("long").alias("min_gap_us"),
        F.max("gap_us").cast("long").alias("max_gap_us"),
        F.expr("sum(gap_us) DIV count(1)").cast("long").alias("mean_gap_us"),
    )


SQL_EVENT_GAPS = """
WITH ordered AS (
  SELECT user_id, epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                 ORDER BY epoch_us(ts), event_id) AS prev_us
  FROM events
),
gaps AS (
  SELECT user_id, CAST(us - prev_us AS BIGINT) AS gap_us
  FROM ordered WHERE prev_us IS NOT NULL
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(min(gap_us) AS BIGINT) AS min_gap_us,
       CAST(max(gap_us) AS BIGINT) AS max_gap_us,
       CAST(CAST(sum(gap_us) AS BIGINT) // count(*) AS BIGINT) AS mean_gap_us
FROM gaps GROUP BY user_id
"""


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event-type
    stream: count of (prev_type -> next_type) steps and the conditional
    probability P(next | prev) = count / row-total, both exact until the
    one rounded divide.
    """
    from pyspark.sql import Window

    events = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("_us", "event_id")
    steps = (
        events.select(
            "user_id",
            "event_id",
            "event_type",
            ntz_epoch_us(F.col("ts")).alias("_us"),
        )
        .select(
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
        )
        .filter(F.col("prev_type").isNotNull())
    )
    counts = steps.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    totals = counts.groupBy("prev_type").agg(
        F.sum("n").cast("long").alias("row_total")
    )
    return counts.join(F.broadcast(totals), "prev_type").select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n").cast("double") / F.col("row_total"), 6).alias("prob"),
    )


SQL_EVENT_TRANSITIONS = """
WITH ordered AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY epoch_us(ts), event_id) AS prev_type
  FROM events
),
counts AS (
  SELECT prev_type, event_type AS next_type, CAST(count(*) AS BIGINT) AS n
  FROM ordered WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
),
totals AS (
  SELECT prev_type, CAST(sum(n) AS BIGINT) AS row_total
  FROM counts GROUP BY prev_type
)
SELECT c.prev_type, c.next_type, c.n,
       round(CAST(c.n AS DOUBLE) / t.row_total, 6) AS prob
FROM counts c JOIN totals t USING (prev_type)
"""


# --------------------------------------------------------------------------
# Behavioral entropy per user: Shannon entropy of each user's event-type
# mix plus the effective type count exp(H) (Hill number of order 1 —
# "how many event types does this user effectively use?"); bots and
# single-purpose scripts sit near 0, organic users near ln(#types).
# Same fixed6-ln discipline as lexical_diversity but in GROUPED form:
# the (user, type) counts are exact BIGINTs on uniform keys, H derives
# from n·q(ln n) − Σ c·q(ln c) with q = fixed6 quantization (order-free
# BIGINT sums, invariant 4); exp runs once on the ROUNDED H so both
# engines exponentiate the identical double.
# --------------------------------------------------------------------------
def q_behavior_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    ct = events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    ln6 = F.round(F.log(F.col("c").cast("double")) * F.lit(1000000.0), 0).cast(
        "long"
    )
    per_user = ct.groupBy("user_id").agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.col("c") * ln6).cast("long").alias("s6"),
    )
    h = F.round(
        (
            F.col("n").cast("double")
            * F.round(F.log(F.col("n").cast("double")) * F.lit(1000000.0), 0)
            - F.col("s6")
        )
        / (F.col("n").cast("double") * F.lit(1000000.0)),
        6,
    )
    return per_user.select(
        "user_id",
        "n",
        "n_types",
        h.alias("entropy"),
        F.round(F.exp(h), 6).alias("effective_types"),
    )


SQL_BEHAVIOR_ENTROPY = """
WITH ct AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
per_user AS (
  SELECT user_id,
         CAST(sum(c) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS n_types,
         CAST(sum(c * CAST(round(ln(CAST(c AS DOUBLE)) * 1000000.0)
                           AS BIGINT)) AS BIGINT) AS s6
  FROM ct GROUP BY user_id
)
SELECT user_id, n, n_types,
       round((CAST(n AS DOUBLE)
               * CAST(round(ln(CAST(n AS DOUBLE)) * 1000000.0) AS BIGINT)
              - s6) / (CAST(n AS DOUBLE) * 1000000.0), 6) AS entropy,
       round(exp(round((CAST(n AS DOUBLE)
               * CAST(round(ln(CAST(n AS DOUBLE)) * 1000000.0) AS BIGINT)
              - s6) / (CAST(n AS DOUBLE) * 1000000.0), 6)), 6)
         AS effective_types
FROM per_user
"""


# --------------------------------------------------------------------------
# Session bounce rate by entry event type — the classic web-analytics
# quality metric over the SAME 30-min session assignment as
# `event_sessions` (invariant 3: integer epoch-µs gaps): a session
# "bounces" when it contains exactly one event; sessions are attributed
# to their ENTRY type via a lexicographic struct-min on the deterministic
# (us, event_id) total order (an aggregate, not a second window). Counts
# exact BIGINT on the bounded type key; rate = one exact divide rounded 6.
# --------------------------------------------------------------------------
def q_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = events.withColumn("_us", ntz_epoch_us(F.col("ts")))
    gap = F.col("_us") - F.lag("_us").over(w_user)
    is_break = F.when(
        gap.isNull() | (gap > SESSION_GAP_MIN * 60 * 1_000_000), 1
    ).otherwise(0)
    sessions = ev.withColumn("_brk", is_break).withColumn(
        "session_seq",
        F.sum("_brk").over(
            w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    per = sessions.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min(F.struct("_us", "event_id", "event_type")).alias("_entry"),
    )
    return (
        per.select(
            F.col("_entry.event_type").alias("entry_type"),
            (F.col("n_events") == 1).cast("long").alias("is_bounce"),
        )
        .groupBy("entry_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum("is_bounce").cast("long").alias("n_bounces"),
        )
        .select(
            "entry_type",
            "n_sessions",
            "n_bounces",
            F.round(
                F.col("n_bounces").cast("double") / F.col("n_sessions"), 6
            ).alias("bounce_rate"),
        )
    )


SQL_BOUNCE_RATE = f"""
WITH marked AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                   > {SESSION_GAP_MIN * 60 * 1_000_000}
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, event_id, event_type, us,
         CAST(sum(brk) OVER (PARTITION BY user_id
                             ORDER BY us, event_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_seq
  FROM marked
),
per AS (
  SELECT user_id, session_seq,
         CAST(count(*) AS BIGINT) AS n_events,
         min(struct_pack(us := us, eid := event_id, et := event_type))
           AS entry
  FROM sess GROUP BY user_id, session_seq
)
SELECT entry.et AS entry_type,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bounces,
       round(CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             / CAST(count(*) AS DOUBLE), 6) AS bounce_rate
FROM per GROUP BY entry.et
"""


# --------------------------------------------------------------------------
# Per-user activity streaks — the canonical GAPS-AND-ISLANDS shape: after
# the (user, day) relation is made distinct on uniform keys (invariant 6),
# day_idx − row_number() within the user is constant exactly on each run
# of consecutive days, so one per-user window + one bounded groupBy yield
# every island. Pure integers; day indexes are integer DIV on
# ntz_epoch_us (invariant 3); the per-user window is the sessionization
# precedent (bounded by per-user activity, never a corpus sort).
# --------------------------------------------------------------------------
def q_user_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = _read(spark, sf_dir, "events")
    ud = (
        events.select("user_id", ntz_epoch_us(F.col("ts")).alias("_us"))
        .select("user_id", F.expr(f"_us DIV {US_PER_DAY_DIV}").alias("day_idx"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day_idx")
    islands = ud.select(
        "user_id",
        (F.col("day_idx") - F.row_number().over(w)).alias("island"),
    ).groupBy("user_id", "island").agg(
        F.count(F.lit(1)).cast("long").alias("len")
    )
    return islands.groupBy("user_id").agg(
        F.sum("len").cast("long").alias("active_days"),
        F.count(F.lit(1)).cast("long").alias("n_streaks"),
        F.max("len").cast("long").alias("longest_streak"),
    )


SQL_USER_STREAKS = f"""
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {US_PER_DAY_DIV} AS day_idx
  FROM events
),
islands AS (
  SELECT user_id,
         day_idx - row_number() OVER (PARTITION BY user_id
                                      ORDER BY day_idx) AS island
  FROM ud
),
runs AS (
  SELECT user_id, island, CAST(count(*) AS BIGINT) AS len
  FROM islands GROUP BY user_id, island
)
SELECT user_id,
       CAST(sum(len) AS BIGINT) AS active_days,
       CAST(count(*) AS BIGINT) AS n_streaks,
       CAST(max(len) AS BIGINT) AS longest_streak
FROM runs GROUP BY user_id
"""


# --------------------------------------------------------------------------
# Cohort overlap: exact Jaccard between the user sets of every event-type
# pair — "do purchasers also click?" audience-overlap matrix. Two-phase
# (invariant 6): the event stream collapses ONCE to the distinct uniform
# (type, user) key; the intersection self-join fans out per user by at
# most (types-that-user-has choose 2) — bounded by the type TAXONOMY
# squared, never the corpus (the source_overlap shape). One divide of
# exact BIGINTs rounded 6.
# --------------------------------------------------------------------------
def q_cohort_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    tu = events.select("event_type", "user_id").distinct()
    sizes = tu.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    a = tu.select(F.col("event_type").alias("type_a"), "user_id")
    b = tu.select(F.col("event_type").alias("type_b"), "user_id")
    inter = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("nb"))
    return (
        inter.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_common",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )


SQL_COHORT_OVERLAP = """
WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
sizes AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM tu GROUP BY 1
),
inter AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(count(*) AS BIGINT) AS n_common
  FROM tu a JOIN tu b ON a.user_id = b.user_id
  WHERE a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT i.type_a, i.type_b, i.n_common,
       round(CAST(i.n_common AS DOUBLE)
             / (sa.n + sb.n - i.n_common), 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.event_type = i.type_a
JOIN sizes sb ON sb.event_type = i.type_b
"""


def q_weekly_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    grid = (
        events.select(
            "event_type", ntz_epoch_us(F.col("ts")).alias("_us")
        )
        .select(
            "event_type",
            ((F.expr(f"_us DIV {US_PER_DAY_DIV}") + 4) % 7).alias("dow"),
            (F.expr(f"_us DIV {US_PER_HOUR_DIV}") % 24).alias("hour"),
        )
        .groupBy("event_type", "dow", "hour")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    totals = grid.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("total")
    )
    return grid.join(F.broadcast(totals), "event_type").select(
        "event_type",
        F.col("dow").cast("long").alias("dow"),
        F.col("hour").cast("long").alias("hour"),
        "n",
        F.round(F.col("n").cast("double") / F.col("total"), 6).alias("share"),
    )


SQL_WEEKLY_PROFILE = f"""
WITH grid AS (
  SELECT event_type,
         CAST((epoch_us(ts) // {US_PER_DAY_DIV} + 4) % 7 AS BIGINT) AS dow,
         CAST((epoch_us(ts) // {US_PER_HOUR_DIV}) % 24 AS BIGINT) AS hour,
         CAST(count(*) AS BIGINT) AS n
  FROM events
  GROUP BY 1, 2, 3
),
totals AS (
  SELECT event_type, CAST(sum(n) AS BIGINT) AS total FROM grid GROUP BY 1
)
SELECT g.event_type, g.dow, g.hour, g.n,
       round(CAST(g.n AS DOUBLE) / t.total, 6) AS share
FROM grid g JOIN totals t USING (event_type)
"""


WAU_WINDOW_DAYS = 7


def q_rolling_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    ud = (
        events.select("user_id", ntz_epoch_us(F.col("ts")).alias("_us"))
        .select("user_id", F.expr(f"_us DIV {US_PER_DAY_DIV}").alias("day_idx"))
        .distinct()
    )
    dau = ud.groupBy("day_idx").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    cover = (
        ud.select(
            "user_id",
            F.explode(
                F.sequence(
                    F.col("day_idx"),
                    F.col("day_idx") + F.lit(WAU_WINDOW_DAYS - 1),
                )
            ).alias("day_idx"),
        )
        .distinct()
    )
    wau = cover.groupBy("day_idx").agg(
        F.count(F.lit(1)).cast("long").alias("wau")
    )
    return (
        dau.join(wau, "day_idx")
        .select(
            "day_idx",
            "dau",
            "wau",
            F.round(F.col("dau").cast("double") / F.col("wau"), 6).alias(
                "stickiness"
            ),
        )
    )


SQL_ROLLING_ACTIVE = f"""
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {US_PER_DAY_DIV} AS day_idx
  FROM events
),
dau AS (
  SELECT day_idx, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY day_idx
),
cover AS (
  SELECT DISTINCT user_id, ud.day_idx + o AS day_idx
  FROM ud, unnest(range(0, {WAU_WINDOW_DAYS})) AS t(o)
),
wau AS (
  SELECT day_idx, CAST(count(*) AS BIGINT) AS wau FROM cover GROUP BY day_idx
)
SELECT d.day_idx, d.dau, w.wau,
       round(CAST(d.dau AS DOUBLE) / w.wau, 6) AS stickiness
FROM dau d JOIN wau w USING (day_idx)
"""


# --------------------------------------------------------------------------
# Multi-touch attribution (first/last-touch) — the classic marketing
# report over the events stream: each purchase is attributed to the
# first and the last click/view by the same user inside a 7-day
# lookback. The touch join is an equi-join on user_id with a range
# predicate (per-user fan-out bounded by user activity — the
# sessionization precedent); first/last resolve via lexicographic
# struct-min/max on the deterministic (us, event_id) total order
# (aggregates, not windows — bounce_rate's pattern). Purchases with no
# touch in window surface as the '(none)' channel via an anti-join, so
# no engine-dependent null-struct comparisons exist anywhere. Revenue
# sums are fixed6 integer (invariant 4); timestamps are ntz_epoch_us
# (invariant 3).
# --------------------------------------------------------------------------
ATTR_LOOKBACK_US = 7 * US_PER_DAY_DIV
ATTR_TOUCH_TYPES = ("click", "view")


def q_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    ev = events.select(
        "event_id", "user_id", "event_type", "value",
        ntz_epoch_us(F.col("ts")).alias("us"),
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("p_user"),
        F.col("us").alias("p_us"),
        "value",
    )
    touch = ev.filter(F.col("event_type").isin(*ATTR_TOUCH_TYPES)).select(
        F.col("user_id").alias("t_user"),
        F.col("us").alias("t_us"),
        F.col("event_id").alias("tid"),
        F.col("event_type").alias("t_type"),
    )
    cond = (
        (touch["t_user"] == purch["p_user"])
        & (touch["t_us"] < purch["p_us"])
        & (touch["t_us"] >= purch["p_us"] - ATTR_LOOKBACK_US)
    )
    attributed = (
        purch.join(touch, cond)
        .groupBy("pid", "value")
        .agg(
            F.min(F.struct("t_us", "tid", "t_type")).alias("_f"),
            F.max(F.struct("t_us", "tid", "t_type")).alias("_l"),
        )
        .select(
            "pid",
            F.col("_f.t_type").alias("first_touch"),
            F.col("_l.t_type").alias("last_touch"),
            "value",
        )
    )
    no_touch = purch.join(
        attributed.select("pid"), "pid", "left_anti"
    ).select(
        F.lit("(none)").alias("first_touch"),
        F.lit("(none)").alias("last_touch"),
        "value",
    )
    return (
        attributed.select("first_touch", "last_touch", "value")
        .unionByName(no_touch)
        .groupBy("first_touch", "last_touch")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            sum_fixed6("value", "revenue"),
        )
    )


SQL_TOUCH_ATTRIBUTION = f"""
WITH ev AS (
  SELECT event_id, user_id, event_type, value, epoch_us(ts) AS us FROM events
),
p AS (
  SELECT event_id AS pid, user_id, us AS p_us, value
  FROM ev WHERE event_type = 'purchase'
),
t AS (
  SELECT user_id, us AS t_us, event_id AS tid, event_type AS t_type
  FROM ev WHERE event_type IN ('click', 'view')
),
att AS (
  SELECT p.pid, p.value,
         min(struct_pack(us := t_us, eid := tid, et := t_type)) AS f,
         max(struct_pack(us := t_us, eid := tid, et := t_type)) AS l
  FROM p JOIN t ON t.user_id = p.user_id
    AND t.t_us < p.p_us AND t.t_us >= p.p_us - {ATTR_LOOKBACK_US}
  GROUP BY p.pid, p.value
),
channels AS (
  SELECT f.et AS first_touch, l.et AS last_touch, value FROM att
  UNION ALL
  SELECT '(none)', '(none)', p.value FROM p
  WHERE NOT EXISTS (
    SELECT 1 FROM t WHERE t.user_id = p.user_id
      AND t.t_us < p.p_us AND t.t_us >= p.p_us - {ATTR_LOOKBACK_US}
  )
)
SELECT first_touch, last_touch,
       CAST(count(*) AS BIGINT) AS n_purchases,
       {SQL_SUM_FIXED6.format(col="value")} AS revenue
FROM channels GROUP BY first_touch, last_touch
"""


# --------------------------------------------------------------------------
# Sessionization gap-sensitivity sweep (the parameter-robustness audit
# behind event_sessions' single 30-min gap — if session counts swing
# wildly across 5/15/30/60-min thresholds, the downstream metrics are
# threshold artifacts): ONE pass computes the inter-event gaps (same
# tz-invariant ordering as every temporal pair), a 4-way explode then
# counts breaks per threshold; n_sessions = n_users + breaks. Pure
# integers + one events-per-session ratio per row.
# --------------------------------------------------------------------------
SESSION_SWEEP_MIN = [5, 15, 30, 60]


def q_session_gap_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("_us", "event_id")
    gaps = (
        events.select(
            "user_id", "event_id", ntz_epoch_us(F.col("ts")).alias("_us")
        )
        .select(
            "user_id",
            (F.col("_us") - F.lag("_us").over(w)).alias("gap_us"),
        )
    )
    scalars = gaps.agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.when(F.col("gap_us").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_users"),
    )
    swept = (
        gaps.filter(F.col("gap_us").isNotNull())
        .select(
            "gap_us",
            F.explode(
                F.array(*[F.lit(m) for m in SESSION_SWEEP_MIN])
            ).alias("gap_min"),
        )
        .groupBy("gap_min")
        .agg(
            F.sum(
                F.when(
                    F.col("gap_us")
                    > F.col("gap_min").cast("long") * F.lit(60000000),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("breaks")
        )
    )
    return (
        swept.crossJoin(F.broadcast(scalars))
        .select(
            F.col("gap_min").cast("long").alias("gap_min"),
            (F.col("n_users") + F.col("breaks")).cast("long").alias(
                "n_sessions"
            ),
            F.round(
                F.col("n_events").cast("double")
                / (F.col("n_users") + F.col("breaks")).cast("double"),
                6,
            ).alias("events_per_session"),
        )
        .orderBy("gap_min")
    )


def _session_sweep_sql() -> str:
    mins = ", ".join(str(m) for m in SESSION_SWEEP_MIN)
    return f"""
WITH gaps AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
           ORDER BY epoch_us(ts), event_id) AS gap_us
  FROM events
),
scalars AS (
  SELECT CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CASE WHEN gap_us IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_users
  FROM gaps
),
swept AS (
  SELECT m.gap_min,
         CAST(sum(CASE WHEN g.gap_us > CAST(m.gap_min AS BIGINT) * 60000000
                       THEN 1 ELSE 0 END) AS BIGINT) AS breaks
  FROM gaps g, (SELECT unnest([{mins}]) AS gap_min) m
  WHERE g.gap_us IS NOT NULL
  GROUP BY m.gap_min
)
SELECT CAST(s.gap_min AS BIGINT) AS gap_min,
       CAST(sc.n_users + s.breaks AS BIGINT) AS n_sessions,
       round(CAST(sc.n_events AS DOUBLE)
             / CAST(sc.n_users + s.breaks AS DOUBLE), 6)
         AS events_per_session
FROM swept s, scalars sc
ORDER BY gap_min
"""


SQL_SESSION_GAP_SWEEP = _session_sweep_sql()


# --------------------------------------------------------------------------
# Inter-purchase regularity (the RFM-adjacent periodicity signal —
# coefficient of variation of per-user purchase gaps; CV < 1 means
# habit-like regularity, > 1 bursty): gaps in integer MINUTES (epoch-us
# per invariant 3; minute granularity keeps the sum of squares far from
# BIGINT range), CV computed from the EXACT integer (n, sum, sum-of-
# squares) triple as sqrt(n*ssq - s^2)/s — one identical expression.
# Top 20 users by purchase count (id tiebreak).
# --------------------------------------------------------------------------
def q_purchase_regularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    w = Window.partitionBy("user_id").orderBy("_us", "event_id")
    gaps = (
        events.select(
            "user_id", "event_id", ntz_epoch_us(F.col("ts")).alias("_us")
        )
        .select(
            "user_id",
            (
                F.expr(f"(_us - lag(_us) OVER (PARTITION BY user_id"
                       f" ORDER BY _us, event_id)) div {US_PER_MINUTE_DIV}")
            ).alias("gap_min"),
        )
        .filter(F.col("gap_min").isNotNull())
    )
    stats = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum("gap_min").cast("long").alias("s"),
        F.sum(F.col("gap_min") * F.col("gap_min")).cast("long").alias("ssq"),
    )
    n, s, ssq = (
        F.col("n_gaps").cast("double"),
        F.col("s").cast("double"),
        F.col("ssq").cast("double"),
    )
    return (
        stats.filter((F.col("n_gaps") >= 2) & (F.col("s") > 0))
        .select(
            "user_id",
            "n_gaps",
            F.round(s / n, 6).alias("mean_gap_min"),
            F.round(F.sqrt(n * ssq - s * s) / s, 6).alias("cv"),
        )
        .orderBy(F.desc("n_gaps"), "user_id")
        .limit(20)
    )


SQL_PURCHASE_REGULARITY = f"""
WITH gaps AS (
  SELECT user_id,
         (epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
            ORDER BY epoch_us(ts), event_id)) // {US_PER_MINUTE_DIV}
           AS gap_min
  FROM events WHERE event_type = 'purchase'
),
stats AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
         CAST(sum(gap_min) AS BIGINT) AS s,
         CAST(sum(gap_min * gap_min) AS BIGINT) AS ssq
  FROM gaps WHERE gap_min IS NOT NULL
  GROUP BY user_id
)
SELECT user_id, n_gaps,
       round(CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE), 6) AS mean_gap_min,
       round(sqrt(CAST(n_gaps AS DOUBLE) * CAST(ssq AS DOUBLE)
                  - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
             / CAST(s AS DOUBLE), 6) AS cv
FROM stats
WHERE n_gaps >= 2 AND s > 0
ORDER BY n_gaps DESC, user_id
LIMIT 20
"""


# --------------------------------------------------------------------------
# Fano factor of hourly event counts (the dispersion index — Poisson
# traffic has F=1, F>1 flags bursty/clustered arrivals; the
# distribution-shape companion to events_anomaly's per-window z-scores):
# per event type over OBSERVED hourly buckets (documented — empty hours
# excluded), F = var/mean = (n*Sc2 - S^2)/(n*S) from the exact BIGINT
# (n, S, Sc2) triple. Hour keys via integer epoch-us division
# (invariant 3).
# --------------------------------------------------------------------------
def q_fano_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    hourly = events.select(
        "event_type",
        F.floor(
            ntz_epoch_us(F.col("ts")) / F.lit(US_PER_HOUR_DIV)
        )
        .cast("long")
        .alias("hour"),
    )
    counts = hourly.groupBy("event_type", "hour").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    stats = counts.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_hours"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sc2"),
    )
    n, s, sc2 = (
        F.col("n_hours").cast("double"),
        F.col("s").cast("double"),
        F.col("sc2").cast("double"),
    )
    return stats.select(
        "event_type",
        "n_hours",
        F.round(s / n, 6).alias("mean_per_hour"),
        F.round((n * sc2 - s * s) / (n * s), 6).alias("fano_factor"),
    ).orderBy("event_type")


SQL_FANO_FACTOR = f"""
WITH counts AS (
  SELECT event_type, epoch_us(ts) // {US_PER_HOUR_DIV} AS hour,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours,
         CAST(sum(c) AS BIGINT) AS s,
         CAST(sum(c * c) AS BIGINT) AS sc2
  FROM counts GROUP BY event_type
)
SELECT event_type, n_hours,
       round(CAST(s AS DOUBLE) / CAST(n_hours AS DOUBLE), 6) AS mean_per_hour,
       round((CAST(n_hours AS DOUBLE) * CAST(sc2 AS DOUBLE)
              - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
             / (CAST(n_hours AS DOUBLE) * CAST(s AS DOUBLE)), 6)
         AS fano_factor
FROM stats
ORDER BY event_type
"""


# --------------------------------------------------------------------------
# Circadian profile (circular statistics — Fisher 1993: hour-of-day is
# an angle, so arithmetic means lie; the resultant vector doesn't): per
# event type, hourly counts weight the 24 FIXED unit vectors
# (cos/sin of 2*pi*h/24 — libm on data-INDEPENDENT inputs), giving the
# mean resultant length R (1 = all traffic at one hour, 0 = uniform)
# and the peak hour via atan2, all displayed round-6 (the only
# data-dependent libm call, atan2, is 1-ulp-tight ~10 orders below the
# grid). Integer hour-of-day keys from epoch-us arithmetic (invariant 3).
# --------------------------------------------------------------------------
def q_circadian_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    hod = events.select(
        "event_type",
        (
            F.floor(ntz_epoch_us(F.col("ts")) / F.lit(US_PER_HOUR_DIV))
            % 24
        )
        .cast("long")
        .alias("h"),
    )
    counts = hod.groupBy("event_type", "h").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    ang = F.lit(2.0 * math.pi) * F.col("h").cast("double") / F.lit(24.0)
    stats = counts.groupBy("event_type").agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("c").cast("double") * F.cos(ang)).alias("cs"),
        F.sum(F.col("c").cast("double") * F.sin(ang)).alias("sn"),
    )
    r = F.sqrt(F.col("cs") * F.col("cs") + F.col("sn") * F.col("sn")) / F.col(
        "n"
    ).cast("double")
    peak = (
        F.atan2(F.col("sn"), F.col("cs"))
        * F.lit(24.0)
        / F.lit(2.0 * math.pi)
        + 24.0
    ) % 24.0
    return stats.select(
        "event_type",
        "n",
        F.round(r, 6).alias("resultant_length"),
        F.round(peak, 6).alias("peak_hour"),
    ).orderBy("event_type")


SQL_CIRCADIAN_PROFILE = f"""
WITH counts AS (
  SELECT event_type, (epoch_us(ts) // {US_PER_HOUR_DIV}) % 24 AS h,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type, CAST(sum(c) AS BIGINT) AS n,
         sum(CAST(c AS DOUBLE) * cos(2.0 * pi() * CAST(h AS DOUBLE) / 24.0))
           AS cs,
         sum(CAST(c AS DOUBLE) * sin(2.0 * pi() * CAST(h AS DOUBLE) / 24.0))
           AS sn
  FROM counts GROUP BY event_type
)
SELECT event_type, n,
       round(sqrt(cs * cs + sn * sn) / CAST(n AS DOUBLE), 6)
         AS resultant_length,
       round(fmod(atan2(sn, cs) * 24.0 / (2.0 * pi()) + 24.0, 24.0), 6)
         AS peak_hour
FROM stats
ORDER BY event_type
"""


# --------------------------------------------------------------------------
# Reorder interval by market segment (inventory-turn behavioral metric):
# per customer, day gaps between consecutive orders (DATE-level integer
# arithmetic, deterministic (date, orderkey) ordering); per segment the
# exact mean and the interpolated median on the integer-day grid
# (quantile_cont parity per the group_percentiles argument).
# --------------------------------------------------------------------------
def q_reorder_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _read(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    orders = _read(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", F.to_date("o_orderdate").alias("od")
    )
    w = Window.partitionBy("o_custkey").orderBy("od", "o_orderkey")
    gaps = (
        orders.select(
            "o_custkey",
            F.datediff(F.col("od"), F.lag("od").over(w)).alias("gap_days"),
        )
        .filter(F.col("gap_days").isNotNull())
        .join(
            F.broadcast(cust), F.col("o_custkey") == cust["c_custkey"]
        )
        .select("c_mktsegment", F.col("gap_days").cast("long").alias("g"))
    )
    return (
        gaps.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
            F.round(
                F.sum("g").cast("double") / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("mean_gap_days"),
            F.round(F.expr("percentile(g, 0.5D)"), 6).alias(
                "median_gap_days"
            ),
        )
        .orderBy("c_mktsegment")
    )


SQL_REORDER_INTERVAL = """
WITH gaps AS (
  SELECT o_custkey,
         datediff('day',
           lag(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey
             ORDER BY CAST(o_orderdate AS DATE), o_orderkey),
           CAST(o_orderdate AS DATE)) AS g
  FROM orders
),
seg AS (
  SELECT c.c_mktsegment, CAST(g.g AS BIGINT) AS g
  FROM gaps g JOIN customer c ON c.c_custkey = g.o_custkey
  WHERE g.g IS NOT NULL
)
SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_gaps,
       round(CAST(sum(g) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
         AS mean_gap_days,
       round(quantile_cont(g, 0.5), 6) AS median_gap_days
FROM seg
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# --------------------------------------------------------------------------
# Traffic autocorrelation (Box-Jenkins ACF at the two lags that matter
# for capacity planning — 1 h persistence and 24 h daily cycle): per
# event type, Pearson r between the hourly-count series and its lagged
# self over the aligned integer hour grid (self-join on hour - lag;
# hours with zero events are absent on BOTH sides identically —
# documented observed-grid semantics). The correlation comes from the
# exact integer six-tuple like discount_elasticity.
# --------------------------------------------------------------------------
ACF_LAGS = [1, 24]


def q_traffic_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    counts = (
        events.select(
            "event_type",
            F.floor(
                ntz_epoch_us(F.col("ts")) / F.lit(US_PER_HOUR_DIV)
            )
            .cast("long")
            .alias("hour"),
        )
        .groupBy("event_type", "hour")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    lags = F.explode(F.array(*[F.lit(x) for x in ACF_LAGS])).alias("lag")
    a = counts.select("event_type", "hour", F.col("c").alias("x"), lags)
    b = counts.select(
        F.col("event_type").alias("et2"),
        F.col("hour").alias("h2"),
        F.col("c").alias("y"),
    )
    pairs = a.join(
        b,
        (F.col("event_type") == F.col("et2"))
        & (F.col("h2") == F.col("hour") - F.col("lag").cast("long")),
    )
    stats = pairs.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    n, sx, sy, sxy, sxx, syy = [
        F.col(c).cast("double") for c in ["n", "sx", "sy", "sxy", "sxx", "syy"]
    ]
    r = (n * sxy - sx * sy) / F.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    return stats.select(
        "event_type",
        F.col("lag").cast("long").alias("lag_hours"),
        "n",
        F.round(r, 6).alias("acf"),
    ).orderBy("event_type", "lag_hours")


def _acf_sql() -> str:
    lag_list = ", ".join(str(x) for x in ACF_LAGS)
    return f"""
WITH counts AS (
  SELECT event_type, epoch_us(ts) // {US_PER_HOUR_DIV} AS hour,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT a.event_type, l.lag, a.c AS x, b.c AS y
  FROM counts a, (SELECT unnest([{lag_list}]) AS lag) l
  JOIN counts b ON b.event_type = a.event_type
               AND b.hour = a.hour - l.lag
),
stats AS (
  SELECT event_type, lag, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM pairs GROUP BY event_type, lag
)
SELECT event_type, CAST(lag AS BIGINT) AS lag_hours, n,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
         AS acf
FROM stats
ORDER BY event_type, lag_hours
"""


SQL_TRAFFIC_AUTOCORR = _acf_sql()


# --------------------------------------------------------------------------
# Monthly revenue seasonality (the 12-row seasonal-index report —
# index(m) = share(m)*12, 1.0 = no seasonality): order-month extraction
# is a DATE field read (tz-invariant), revenue the fixed6 BIGINT sum,
# share/index each ONE ratio of exact integers.
# --------------------------------------------------------------------------
def q_monthly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _read(spark, sf_dir, "orders").select(
        F.month(F.to_date("o_orderdate")).cast("long").alias("m"),
        fixed6_long(F.col("o_totalprice")).alias("p6"),
    )
    monthly = orders.groupBy("m").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("p6").cast("long").alias("rev6"),
    )
    total = monthly.agg(F.sum("rev6").cast("long").alias("_t6"))
    share = F.col("rev6").cast("double") / F.col("_t6").cast("double")
    return (
        monthly.crossJoin(F.broadcast(total))
        .select(
            F.col("m").alias("month"),
            "n_orders",
            F.round(F.col("rev6") / F.lit(1000000.0), 6).alias("revenue"),
            F.round(share, 6).alias("revenue_share"),
            F.round(share * F.lit(12.0), 6).alias("seasonal_index"),
        )
        .orderBy("month")
    )


SQL_MONTHLY_SEASONALITY = """
WITH monthly AS (
  SELECT CAST(month(CAST(o_orderdate AS DATE)) AS BIGINT) AS m,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(CAST(round(o_totalprice * 1000000.0) AS BIGINT)) AS BIGINT)
           AS rev6
  FROM orders GROUP BY m
),
tot AS (SELECT CAST(sum(rev6) AS BIGINT) AS t6 FROM monthly)
SELECT m AS month, n_orders,
       round(rev6 / 1000000.0, 6) AS revenue,
       round(CAST(rev6 AS DOUBLE) / CAST(tot.t6 AS DOUBLE), 6)
         AS revenue_share,
       round(CAST(rev6 AS DOUBLE) / CAST(tot.t6 AS DOUBLE) * 12.0, 6)
         AS seasonal_index
FROM monthly, tot
ORDER BY month
"""


# --------------------------------------------------------------------------
# Traffic burst detection (threshold variant of Kleinberg 2002's burst
# model — runs of hot hours, found with the pure-integer
# islands-and-gaps trick the streaks/sessions pairs already use): per
# event type, a burst is a maximal run of CONSECUTIVE hours whose count
# exceeds 1.5x the type's median hourly count (median interpolated on the
# integer grid); report burst count, longest burst, and total burst
# hours. Island key = hour - row_number over the hot hours (exact
# integers; consecutive hot hours share it).
# --------------------------------------------------------------------------
def q_traffic_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    counts = (
        events.select(
            "event_type",
            F.floor(
                ntz_epoch_us(F.col("ts")) / F.lit(US_PER_HOUR_DIV)
            )
            .cast("long")
            .alias("hour"),
        )
        .groupBy("event_type", "hour")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    med = counts.groupBy("event_type").agg(
        F.expr("percentile(c, 0.5D)").alias("med")
    )
    hot = counts.join(F.broadcast(med), "event_type").filter(
        F.col("c").cast("double") > F.lit(1.5) * F.col("med")
    )
    w = Window.partitionBy("event_type").orderBy("hour")
    islands = hot.select(
        "event_type",
        (F.col("hour") - F.row_number().over(w).cast("long")).alias("isl"),
    )
    runs = islands.groupBy("event_type", "isl").agg(
        F.count(F.lit(1)).cast("long").alias("run_len")
    )
    return (
        runs.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bursts"),
            F.max("run_len").cast("long").alias("longest_burst_hours"),
            F.sum("run_len").cast("long").alias("total_burst_hours"),
        )
        .orderBy("event_type")
    )


SQL_TRAFFIC_BURSTS = f"""
WITH counts AS (
  SELECT event_type, epoch_us(ts) // {US_PER_HOUR_DIV} AS hour,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
med AS (
  SELECT event_type, quantile_cont(c, 0.5) AS med
  FROM counts GROUP BY event_type
),
hot AS (
  SELECT counts.event_type, counts.hour
  FROM counts JOIN med USING (event_type)
  WHERE CAST(c AS DOUBLE) > 1.5 * med.med
),
islands AS (
  SELECT event_type,
         hour - row_number() OVER (PARTITION BY event_type ORDER BY hour)
           AS isl
  FROM hot
),
runs AS (
  SELECT event_type, isl, CAST(count(*) AS BIGINT) AS run_len
  FROM islands GROUP BY event_type, isl
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_bursts,
       CAST(max(run_len) AS BIGINT) AS longest_burst_hours,
       CAST(sum(run_len) AS BIGINT) AS total_burst_hours
FROM runs
GROUP BY event_type
ORDER BY event_type
"""


# --------------------------------------------------------------------------
# CUSUM change-point detection (Page 1954; argmax |CUSUM| is the MLE for a
# single mean shift under squared loss): over daily order revenue, S_t =
# cum_t - t*total/n. Computed EXACTLY in integers by scaling both sides by
# n: n*S_t = n*cum_t - t*total, with revenue in CENTS (not fixed6 — the
# n_days * total product must stay inside BIGINT; cents buy 4 orders of
# magnitude of headroom). Tie-break on the max is (ns_abs DESC, day ASC)
# — exact integers, so both engines pick the same day.
# --------------------------------------------------------------------------
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _read(spark, sf_dir, "orders").select(
        F.floor(
            ntz_epoch_us(F.col("o_orderdate")) / F.lit(US_PER_DAY_DIV)
        )
        .cast("long")
        .alias("day"),
        F.round(F.col("o_totalprice") * F.lit(100.0), 0)
        .cast("long")
        .alias("cents"),
    )
    daily = (
        orders.groupBy("day")
        .agg(F.sum("cents").cast("long").alias("rev"))
        .localCheckpoint(eager=True)
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = daily.select(
        "day",
        F.sum("rev").over(w).cast("long").alias("cum"),
        F.row_number().over(Window.orderBy("day")).cast("long").alias("t"),
    )
    tot = daily.agg(
        F.sum("rev").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    scored = cum.crossJoin(F.broadcast(tot)).select(
        "day",
        "cum",
        "t",
        "total",
        "n",
        F.abs(
            F.col("n") * F.col("cum") - F.col("t") * F.col("total")
        ).alias("ns_abs"),
    )
    pick = Window.orderBy(F.col("ns_abs").desc(), F.col("day").asc())
    best = (
        scored.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
    )
    td, nd = F.col("t").cast("double"), F.col("n").cast("double")
    cumd, totd = F.col("cum").cast("double"), F.col("total").cast("double")
    return best.select(
        F.col("day").alias("change_day"),
        F.round(
            F.col("ns_abs").cast("double") / (nd * totd), 6
        ).alias("cusum_rel"),
        F.round(cumd / td / F.lit(100.0), 6).alias("mean_before"),
        F.round(
            F.when(
                F.col("n") > F.col("t"),
                (totd - cumd) / (nd - td) / F.lit(100.0),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("mean_after"),
        F.col("n").alias("n_days"),
    )


SQL_CUSUM_CHANGEPOINT = f"""
WITH daily AS (
  SELECT epoch_us(o_orderdate) // {US_PER_DAY_DIV} AS day,
         CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
           AS rev
  FROM orders GROUP BY 1
),
cum AS (
  SELECT day,
         CAST(sum(rev) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum,
         CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
  FROM daily
),
tot AS (SELECT CAST(sum(rev) AS BIGINT) AS total,
               CAST(count(*) AS BIGINT) AS n FROM daily),
scored AS (
  SELECT day, cum, t, total, n, abs(n * cum - t * total) AS ns_abs
  FROM cum, tot
),
best AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (ORDER BY ns_abs DESC, day ASC) AS rn
    FROM scored)
  WHERE rn = 1
)
SELECT day AS change_day,
       round(CAST(ns_abs AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(total AS DOUBLE)), 6) AS cusum_rel,
       round(CAST(cum AS DOUBLE) / CAST(t AS DOUBLE)
             / CAST('100.0' AS DOUBLE), 6) AS mean_before,
       round(CASE WHEN n > t
                  THEN (CAST(total AS DOUBLE) - CAST(cum AS DOUBLE))
                       / (CAST(n AS DOUBLE) - CAST(t AS DOUBLE))
                       / CAST('100.0' AS DOUBLE)
                  ELSE 0.0 END, 6) AS mean_after,
       n AS n_days
FROM best
"""


# --------------------------------------------------------------------------
# One-way ANOVA across day-of-week revenue groups (Fisher 1925) — the
# F-test completes the paired hypothesis-test family (chi-square,
# two-proportion z, KS): does mean daily revenue differ by weekday?
# Group sums/counts are exact BIGINT cents; SS_between and SS_within use
# the sum-of-squares identity on per-GROUP totals (7 rows) plus one
# per-day double square summed and rounded 6 (the theil/autocorr
# precedent for per-row double sums). Day-of-week from the epoch-day
# integer ((day + 4) % 7 — 1970-01-01 was a Thursday), timezone-free.
# --------------------------------------------------------------------------
def q_anova_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _read(spark, sf_dir, "orders").select(
        F.floor(
            ntz_epoch_us(F.col("o_orderdate")) / F.lit(US_PER_DAY_DIV)
        )
        .cast("long")
        .alias("day"),
        F.round(F.col("o_totalprice") * F.lit(100.0), 0)
        .cast("long")
        .alias("cents"),
    )
    daily = (
        orders.groupBy("day")
        .agg(F.sum("cents").cast("long").alias("rev"))
        .select(
            ((F.col("day") + 4) % 7).cast("long").alias("dow"),
            "rev",
        )
        .localCheckpoint(eager=True)
    )
    revd = F.col("rev").cast("double")
    grp = daily.groupBy("dow").agg(
        F.sum("rev").cast("long").alias("gsum"),
        F.count(F.lit(1)).cast("long").alias("gn"),
        F.sum(revd * revd).alias("gss"),
    )
    tot = grp.agg(
        F.sum("gsum").cast("long").alias("tsum"),
        F.sum("gn").cast("long").alias("tn"),
        F.sum("gss").alias("tss"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(
            F.col("gsum").cast("double")
            * F.col("gsum").cast("double")
            / F.col("gn").cast("double")
        ).alias("between_raw"),
    )
    tsum, tn = F.col("tsum").cast("double"), F.col("tn").cast("double")
    kd = F.col("k").cast("double")
    ss_between = F.col("between_raw") - tsum * tsum / tn
    ss_within = F.col("tss") - F.col("between_raw")
    f_stat = (ss_between / (kd - F.lit(1.0))) / (
        ss_within / (tn - kd)
    )
    return tot.select(
        F.col("k").alias("n_groups"),
        F.col("tn").alias("n_days"),
        (F.col("k") - 1).cast("long").alias("df1"),
        (F.col("tn") - F.col("k")).cast("long").alias("df2"),
        F.round(f_stat, 6).alias("f_stat"),
        F.round(
            ss_between / (F.col("tss") - tsum * tsum / tn), 6
        ).alias("eta_sq"),
    )


SQL_ANOVA_DOW = f"""
WITH daily AS (
  SELECT (epoch_us(o_orderdate) // {US_PER_DAY_DIV} + 4) % 7 AS dow,
         CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
           AS rev
  FROM orders GROUP BY epoch_us(o_orderdate) // {US_PER_DAY_DIV}
),
grp AS (
  SELECT dow, CAST(sum(rev) AS BIGINT) AS gsum,
         CAST(count(*) AS BIGINT) AS gn,
         sum(CAST(rev AS DOUBLE) * CAST(rev AS DOUBLE)) AS gss
  FROM daily GROUP BY dow
),
tot AS (
  SELECT CAST(sum(gsum) AS BIGINT) AS tsum, CAST(sum(gn) AS BIGINT) AS tn,
         sum(gss) AS tss, CAST(count(*) AS BIGINT) AS k,
         sum(CAST(gsum AS DOUBLE) * CAST(gsum AS DOUBLE)
             / CAST(gn AS DOUBLE)) AS between_raw
  FROM grp
)
SELECT k AS n_groups, tn AS n_days,
       CAST(k - 1 AS BIGINT) AS df1, CAST(tn - k AS BIGINT) AS df2,
       round(((between_raw - CAST(tsum AS DOUBLE) * CAST(tsum AS DOUBLE)
                             / CAST(tn AS DOUBLE))
              / (CAST(k AS DOUBLE) - 1.0))
             / ((tss - between_raw) / (CAST(tn AS DOUBLE)
                                       - CAST(k AS DOUBLE))), 6) AS f_stat,
       round((between_raw - CAST(tsum AS DOUBLE) * CAST(tsum AS DOUBLE)
                            / CAST(tn AS DOUBLE))
             / (tss - CAST(tsum AS DOUBLE) * CAST(tsum AS DOUBLE)
                      / CAST(tn AS DOUBLE)), 6) AS eta_sq
FROM tot
"""


# --------------------------------------------------------------------------
# Mann-Kendall trend test (Mann 1945, Kendall 1975) on daily revenue:
# S = sum over day pairs i<j of sign(rev_j - rev_i) — a PURE-INTEGER
# statistic over the day-pair self-join (pairs are time-bounded, not
# corpus-bounded: the join fans out on days², never on rows²). The
# variance carries the standard tie correction sum t(t-1)(2t+5), also
# exact integers; only the final z (with the +-1 continuity correction)
# is a double.
# --------------------------------------------------------------------------
def q_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _read(spark, sf_dir, "orders").select(
        F.floor(
            ntz_epoch_us(F.col("o_orderdate")) / F.lit(US_PER_DAY_DIV)
        )
        .cast("long")
        .alias("day"),
        F.round(F.col("o_totalprice") * F.lit(100.0), 0)
        .cast("long")
        .alias("cents"),
    )
    daily = (
        orders.groupBy("day")
        .agg(F.sum("cents").cast("long").alias("rev"))
        .localCheckpoint(eager=True)
    )
    a, b = daily.alias("a"), daily.alias("b")
    s_stat = (
        a.join(b, F.col("a.day") < F.col("b.day"))
        .agg(
            F.sum(
                F.signum(
                    (F.col("b.rev") - F.col("a.rev")).cast("double")
                ).cast("long")
            )
            .cast("long")
            .alias("s_stat")
        )
    )
    n_row = daily.agg(F.count(F.lit(1)).cast("long").alias("n"))
    ties = (
        daily.groupBy("rev")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t")
                    * (F.col("t") - 1)
                    * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    joined = s_stat.crossJoin(F.broadcast(n_row)).crossJoin(
        F.broadcast(ties)
    )
    nd = F.col("n").cast("double")
    var = (
        nd * (nd - F.lit(1.0)) * (F.lit(2.0) * nd + F.lit(5.0))
        - F.col("tie_term").cast("double")
    ) / F.lit(18.0)
    sd = F.col("s_stat").cast("double")
    z = (
        F.when(F.col("s_stat") > 0, (sd - F.lit(1.0)) / F.sqrt(var))
        .when(F.col("s_stat") < 0, (sd + F.lit(1.0)) / F.sqrt(var))
        .otherwise(F.lit(0.0))
    )
    return joined.select(
        "n",
        "s_stat",
        "tie_term",
        F.round(var, 6).alias("var_s"),
        F.round(z, 6).alias("z"),
    )


SQL_MANN_KENDALL = f"""
WITH daily AS (
  SELECT epoch_us(o_orderdate) // {US_PER_DAY_DIV} AS day,
         CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
           AS rev
  FROM orders GROUP BY 1
),
s AS (
  SELECT CAST(sum(CAST(sign(b.rev - a.rev) AS BIGINT)) AS BIGINT) AS s_stat
  FROM daily a JOIN daily b ON a.day < b.day
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
ties AS (
  SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
           AS tie_term
  FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM daily GROUP BY rev)
  WHERE t > 1
)
SELECT n, s_stat, tie_term,
       round((CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
              * (2.0 * CAST(n AS DOUBLE) + 5.0)
              - CAST(tie_term AS DOUBLE)) / 18.0, 6) AS var_s,
       round(CASE
         WHEN s_stat > 0 THEN (CAST(s_stat AS DOUBLE) - 1.0)
           / sqrt((CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
                   * (2.0 * CAST(n AS DOUBLE) + 5.0)
                   - CAST(tie_term AS DOUBLE)) / 18.0)
         WHEN s_stat < 0 THEN (CAST(s_stat AS DOUBLE) + 1.0)
           / sqrt((CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
                   * (2.0 * CAST(n AS DOUBLE) + 5.0)
                   - CAST(tie_term AS DOUBLE)) / 18.0)
         ELSE 0.0 END, 6) AS z
FROM s, nn, ties
"""


# --------------------------------------------------------------------------
# User accumulation curve (the growth report every analytics stack ships):
# per hour, how many users appear for the FIRST time, and the running
# total. Two-phase shape (skew discipline, invariant 6): min(hour) per
# user first — a uniform-key aggregate — then a bounded hour-grid count +
# cumulative window (CAST in DuckDB: window sum of BIGINT is HUGEINT).
# Pure integers end to end.
# --------------------------------------------------------------------------
def q_user_accumulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events").select(
        "user_id",
        F.floor(ntz_epoch_us(F.col("ts")) / F.lit(US_PER_HOUR_DIV))
        .cast("long")
        .alias("hour"),
    )
    first_seen = events.groupBy("user_id").agg(
        F.min("hour").cast("long").alias("first_hour")
    )
    per_hour = first_seen.groupBy("first_hour").agg(
        F.count(F.lit(1)).cast("long").alias("n_new")
    )
    w = Window.orderBy("first_hour").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per_hour.select(
        F.col("first_hour").alias("hour"),
        "n_new",
        F.sum("n_new").over(w).cast("long").alias("cum_users"),
    ).orderBy("hour")


SQL_USER_ACCUMULATION = f"""
WITH first_seen AS (
  SELECT user_id,
         CAST(min(epoch_us(ts) // {US_PER_HOUR_DIV}) AS BIGINT)
           AS first_hour
  FROM events GROUP BY user_id
),
per_hour AS (
  SELECT first_hour, CAST(count(*) AS BIGINT) AS n_new
  FROM first_seen GROUP BY first_hour
)
SELECT first_hour AS hour, n_new,
       CAST(sum(n_new) OVER (ORDER BY first_hour
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum_users
FROM per_hour
ORDER BY hour
"""


# --------------------------------------------------------------------------
# Daily-revenue periodogram (Schuster 1898) at the first 10 Fourier
# frequencies: P_k = (A_k² + B_k²)/n with A_k = sum x_t cos(2πkt/n),
# B_k likewise — the frequency-domain complement to the autocorrelation
# pair, read to spot the weekly cycle. x_t are exact cents; cos/sin of
# the rational angles go through the same libm surface both engines
# share (the circadian-pair precedent), and the t index is an exact
# row_number. Power is reported on the log10 scale and as a variance
# share — both RELATIVE quantities, immune to the last-ulp jitter a
# raw 1e15-magnitude spectral sum cannot round away (invariant 4).
# --------------------------------------------------------------------------
def q_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _read(spark, sf_dir, "orders").select(
        F.floor(
            ntz_epoch_us(F.col("o_orderdate")) / F.lit(US_PER_DAY_DIV)
        )
        .cast("long")
        .alias("day"),
        F.round(F.col("o_totalprice") * F.lit(100.0), 0)
        .cast("long")
        .alias("cents"),
    )
    daily = (
        orders.groupBy("day")
        .agg(F.sum("cents").cast("long").alias("rev"))
        .localCheckpoint(eager=True)
    )
    wt = Window.orderBy("day")
    indexed = daily.select(
        "rev",
        (F.row_number().over(wt) - 1).cast("long").alias("t"),
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rev").cast("long").alias("s"),
        F.sum(
            F.col("rev").cast("double") * F.col("rev").cast("double")
        ).alias("ss"),
    )
    ks = spark.range(1, 11).select(F.col("id").cast("long").alias("k"))
    xt = F.col("rev").cast("double")
    nd = F.col("n").cast("double")
    ang = (
        F.lit(2.0 * math.pi)
        * F.col("k").cast("double")
        * F.col("t").cast("double")
        / nd
    )
    comps = (
        indexed.crossJoin(F.broadcast(ks))
        .crossJoin(F.broadcast(tot))
        .groupBy("k", "n", "s", "ss")
        .agg(
            F.sum(xt * F.cos(ang)).alias("a"),
            F.sum(xt * F.sin(ang)).alias("b"),
        )
    )
    var_tot = F.col("ss") - F.col("s").cast("double") * F.col("s").cast(
        "double"
    ) / nd
    power = (
        F.col("a") * F.col("a") + F.col("b") * F.col("b")
    ) / nd
    return comps.select(
        "k",
        F.round(nd / F.col("k").cast("double"), 6).alias("period_days"),
        F.round(F.log10(power), 6).alias("log10_power"),
        F.round(F.lit(2.0) * power / var_tot, 6).alias("var_share"),
    ).orderBy("k")


SQL_PERIODOGRAM = f"""
WITH daily AS (
  SELECT epoch_us(o_orderdate) // {US_PER_DAY_DIV} AS day,
         CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
           AS rev
  FROM orders GROUP BY 1
),
indexed AS (
  SELECT rev,
         CAST(row_number() OVER (ORDER BY day) - 1 AS BIGINT) AS t
  FROM daily
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(rev) AS BIGINT) AS s,
         sum(CAST(rev AS DOUBLE) * CAST(rev AS DOUBLE)) AS ss
  FROM daily
),
ks AS (SELECT unnest(range(1, 11)) AS k),
comps AS (
  SELECT k, n, s, ss,
         sum(CAST(rev AS DOUBLE)
             * cos(2.0 * pi() * CAST(k AS DOUBLE) * CAST(t AS DOUBLE)
                   / CAST(n AS DOUBLE))) AS a,
         sum(CAST(rev AS DOUBLE)
             * sin(2.0 * pi() * CAST(k AS DOUBLE) * CAST(t AS DOUBLE)
                   / CAST(n AS DOUBLE))) AS b
  FROM indexed, ks, tot
  GROUP BY k, n, s, ss
)
SELECT k,
       round(CAST(n AS DOUBLE) / CAST(k AS DOUBLE), 6) AS period_days,
       round(log10((a * a + b * b) / CAST(n AS DOUBLE)), 6) AS log10_power,
       round(2.0 * ((a * a + b * b) / CAST(n AS DOUBLE))
             / (ss - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                / CAST(n AS DOUBLE)), 6) AS var_share
FROM comps
ORDER BY k
"""


# --------------------------------------------------------------------------
# Pettitt change-point test (Pettitt 1979) on daily revenue — the RANK
# companion to the cusum_changepoint pair (level-shift vs distribution-
# shift): U_t = 2*R_t - t*(n+1) over the day order, where R_t sums
# midranks of the first t days. With the doubled-midrank trick
# (dr = 2*rank + ties - 1), U_t = cumsum(dr) - t*(n+1) is EXACTLY
# integer; K = max|U_t| and its day resolve ties by (|U| DESC, day ASC).
# The significance approximation 2*exp(-6K²/(n³+n²)) is the only float.
# --------------------------------------------------------------------------
def q_pettitt_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _read(spark, sf_dir, "orders").select(
        F.floor(
            ntz_epoch_us(F.col("o_orderdate")) / F.lit(US_PER_DAY_DIV)
        )
        .cast("long")
        .alias("day"),
        F.round(F.col("o_totalprice") * F.lit(100.0), 0)
        .cast("long")
        .alias("cents"),
    )
    daily = (
        orders.groupBy("day")
        .agg(F.sum("cents").cast("long").alias("rev"))
        .localCheckpoint(eager=True)
    )
    wr = Window.orderBy("rev")
    wt = Window.partitionBy("rev")
    ranked = daily.select(
        "day",
        (
            F.lit(2) * F.rank().over(wr).cast("long")
            + F.count(F.lit(1)).over(wt).cast("long")
            - F.lit(1)
        ).alias("dr"),
    )
    tot = daily.agg(F.count(F.lit(1)).cast("long").alias("n"))
    wd = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = ranked.select(
        "day",
        F.sum("dr").over(wd).cast("long").alias("r2"),
        F.row_number().over(Window.orderBy("day")).cast("long").alias("t"),
    )
    u = cum.crossJoin(F.broadcast(tot)).filter(
        F.col("t") < F.col("n")
    ).select(
        "day",
        "n",
        F.abs(
            F.col("r2") - F.col("t") * (F.col("n") + F.lit(1))
        ).alias("u_abs"),
    )
    pick = Window.orderBy(F.col("u_abs").desc(), F.col("day").asc())
    best = u.withColumn("rn", F.row_number().over(pick)).filter(
        F.col("rn") == 1
    )
    kd = F.col("u_abs").cast("double")
    nd = F.col("n").cast("double")
    return best.select(
        F.col("day").alias("change_day"),
        F.col("u_abs").alias("k_stat"),
        "n",
        F.round(
            F.lit(2.0)
            * F.exp(
                -F.lit(6.0) * kd * kd / (nd * nd * nd + nd * nd)
            ),
            6,
        ).alias("p_approx"),
    )


SQL_PETTITT_TEST = f"""
WITH daily AS (
  SELECT epoch_us(o_orderdate) // {US_PER_DAY_DIV} AS day,
         CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
           AS rev
  FROM orders GROUP BY 1
),
ranked AS (
  SELECT day,
         2 * CAST(rank() OVER (ORDER BY rev) AS BIGINT)
           + CAST(count(*) OVER (PARTITION BY rev) AS BIGINT) - 1 AS dr
  FROM daily
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
cum AS (
  SELECT day,
         CAST(sum(dr) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS r2,
         CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
  FROM ranked
),
u AS (
  SELECT day, n, abs(r2 - t * (n + 1)) AS u_abs
  FROM cum, nn WHERE t < n
),
best AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (ORDER BY u_abs DESC, day ASC) AS rn
    FROM u)
  WHERE rn = 1
)
SELECT day AS change_day, u_abs AS k_stat, n,
       round(2.0 * exp(-6.0 * CAST(u_abs AS DOUBLE) * CAST(u_abs AS DOUBLE)
                       / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                          * CAST(n AS DOUBLE)
                          + CAST(n AS DOUBLE) * CAST(n AS DOUBLE))), 6)
         AS p_approx
FROM best
"""


# --------------------------------------------------------------------------
# Peak session concurrency (the interval-stabbing sweep behind every
# "max concurrent users" dashboard): sessions from the event_sessions
# gap rule become (+1 at start, -1 past end) deltas; the running sum
# over (time, delta) order — ends processed before starts at the same
# instant — peaks at the answer. Everything is integer epoch-micros;
# the first peak instant breaks ties exactly.
# --------------------------------------------------------------------------
def q_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = events.withColumn("_us", ntz_epoch_us(F.col("ts")))
    gap = F.col("_us") - F.lag("_us").over(w_user)
    is_break = F.when(
        gap.isNull() | (gap > SESSION_GAP_MIN * 60 * 1_000_000), 1
    ).otherwise(0)
    sessions = (
        ev.withColumn("_brk", is_break)
        .withColumn(
            "session_seq",
            F.sum("_brk").over(
                w_user.rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            ),
        )
        .groupBy("user_id", "session_seq")
        .agg(
            F.min("_us").alias("st"),
            F.max("_us").alias("en"),
        )
        .localCheckpoint(eager=True)
    )
    deltas = sessions.select(
        F.col("st").alias("t"), F.lit(1).cast("long").alias("d")
    ).unionAll(
        sessions.select(
            F.col("en").alias("t"), F.lit(-1).cast("long").alias("d")
        )
    )
    ws = Window.orderBy(F.col("t").asc(), F.col("d").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    run = deltas.select(
        "t", "d", F.sum("d").over(ws).cast("long").alias("run")
    )
    n_sessions = sessions.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions")
    )
    pick = Window.orderBy(
        F.col("run").desc(), F.col("t").asc(), F.col("d").asc()
    )
    best = run.withColumn("rn", F.row_number().over(pick)).filter(
        F.col("rn") == 1
    )
    return best.crossJoin(F.broadcast(n_sessions)).select(
        "n_sessions",
        F.col("run").alias("max_concurrent"),
        F.col("t").alias("peak_us"),
    )


SQL_MAX_CONCURRENCY = f"""
WITH marked AS (
  SELECT user_id, event_id, ts, epoch_us(ts) AS us,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                   > {SESSION_GAP_MIN * 60 * 1_000_000}
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id,
         CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS session_seq,
         us
  FROM marked
),
bounds AS (
  SELECT user_id, session_seq,
         CAST(min(us) AS BIGINT) AS st, CAST(max(us) AS BIGINT) AS en
  FROM sessions GROUP BY user_id, session_seq
),
deltas AS (
  SELECT st AS t, CAST(1 AS BIGINT) AS d FROM bounds
  UNION ALL
  SELECT en AS t, CAST(-1 AS BIGINT) AS d FROM bounds
),
run AS (
  SELECT t, d,
         CAST(sum(d) OVER (ORDER BY t ASC, d ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS run
  FROM deltas
),
ns AS (SELECT CAST(count(*) AS BIGINT) AS n_sessions FROM bounds),
best AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (ORDER BY run DESC, t ASC, d ASC) AS rn
    FROM run)
  WHERE rn = 1
)
SELECT n_sessions, run AS max_concurrent, t AS peak_us
FROM best, ns
"""


# --------------------------------------------------------------------------
# Haar wavelet energy decomposition (Haar 1910; the multi-resolution
# complement to the periodogram): the first 2048 days of revenue run
# through 3 Haar levels kept as INTEGER pair sums s_k (never averages),
# so the detail differences Δs_k are exact BIGINTs and level energy
# E_k = Σ Δs_k² / 2^k touches doubles only at the square. Reported as
# log10 energy + share of the 3-level detail total (relative quantities,
# the periodogram lesson).
# --------------------------------------------------------------------------
def q_haar_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _read(spark, sf_dir, "orders").select(
        F.floor(
            ntz_epoch_us(F.col("o_orderdate")) / F.lit(US_PER_DAY_DIV)
        )
        .cast("long")
        .alias("day"),
        F.round(F.col("o_totalprice") * F.lit(100.0), 0)
        .cast("long")
        .alias("cents"),
    )
    daily = (
        orders.groupBy("day")
        .agg(F.sum("cents").cast("long").alias("rev"))
        .localCheckpoint(eager=True)
    )
    n_take = 2048
    wt = Window.orderBy("day")
    s0 = daily.select(
        (F.row_number().over(wt) - 1).cast("long").alias("t"),
        F.col("rev").alias("s"),
    ).filter(F.col("t") < n_take)

    def level(df):
        return df.groupBy(F.expr("t div 2").alias("t")).agg(
            F.sum("s").cast("long").alias("s"),
            F.sum(
                F.when(F.col("t") % 2 == 0, F.col("s")).otherwise(-F.col("s"))
            )
            .cast("long")
            .alias("d"),
        )

    rows = []
    cur = s0
    for k in (1, 2, 3):
        cur = level(cur).localCheckpoint(eager=True)
        dd = F.col("d").cast("double")
        rows.append(
            cur.agg(
                F.lit(k).cast("long").alias("level"),
                F.count(F.lit(1)).cast("long").alias("n_coeffs"),
                (F.sum(dd * dd) / F.lit(float(2**k))).alias("energy"),
            )
        )
        cur = cur.select("t", "s")
    levels = rows[0].unionAll(rows[1]).unionAll(rows[2])
    tot = levels.agg(F.sum("energy").alias("etot"))
    return (
        levels.crossJoin(F.broadcast(tot))
        .select(
            "level",
            "n_coeffs",
            F.round(F.log10("energy"), 6).alias("log10_energy"),
            F.round(F.col("energy") / F.col("etot"), 6).alias(
                "detail_share"
            ),
        )
        .orderBy("level")
    )


SQL_HAAR_ENERGY = f"""
WITH daily AS (
  SELECT epoch_us(o_orderdate) // {US_PER_DAY_DIV} AS day,
         CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
           AS rev
  FROM orders GROUP BY 1
),
s0 AS (
  SELECT CAST(row_number() OVER (ORDER BY day) - 1 AS BIGINT) AS t,
         rev AS s
  FROM daily QUALIFY t < 2048
),
l1 AS (
  SELECT t // 2 AS t, CAST(sum(s) AS BIGINT) AS s,
         CAST(sum(CASE WHEN t % 2 = 0 THEN s ELSE -s END) AS BIGINT) AS d
  FROM s0 GROUP BY t // 2
),
l2 AS (
  SELECT t // 2 AS t, CAST(sum(s) AS BIGINT) AS s,
         CAST(sum(CASE WHEN t % 2 = 0 THEN s ELSE -s END) AS BIGINT) AS d
  FROM l1 GROUP BY t // 2
),
l3 AS (
  SELECT t // 2 AS t, CAST(sum(s) AS BIGINT) AS s,
         CAST(sum(CASE WHEN t % 2 = 0 THEN s ELSE -s END) AS BIGINT) AS d
  FROM l2 GROUP BY t // 2
),
levels AS (
  SELECT CAST(1 AS BIGINT) AS level, CAST(count(*) AS BIGINT) AS n_coeffs,
         sum(CAST(d AS DOUBLE) * CAST(d AS DOUBLE)) / 2.0 AS energy
  FROM l1
  UNION ALL
  SELECT CAST(2 AS BIGINT), CAST(count(*) AS BIGINT),
         sum(CAST(d AS DOUBLE) * CAST(d AS DOUBLE)) / 4.0
  FROM l2
  UNION ALL
  SELECT CAST(3 AS BIGINT), CAST(count(*) AS BIGINT),
         sum(CAST(d AS DOUBLE) * CAST(d AS DOUBLE)) / 8.0
  FROM l3
),
tot AS (SELECT sum(energy) AS etot FROM levels)
SELECT level, n_coeffs,
       round(log10(energy), 6) AS log10_energy,
       round(energy / etot, 6) AS detail_share
FROM levels, tot
ORDER BY level
"""


# --------------------------------------------------------------------------
# Lognormal session-duration fit (the canonical dwell-time model —
# Liu et al. CHI 2010 found web dwell times lognormal): method of
# moments on ln(duration) over multi-event sessions from the
# event_sessions gap rule (single-event sessions have zero duration and
# are excluded, documented); reports mu/sigma in log-seconds and the
# implied median exp(mu) and mean exp(mu + sigma²/2) in seconds.
# Durations are exact integer micros; the ln/moment pass follows the
# established double-sum precedent with ratio/round-6 outputs.
# --------------------------------------------------------------------------
def q_lognormal_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = events.withColumn("_us", ntz_epoch_us(F.col("ts")))
    gap = F.col("_us") - F.lag("_us").over(w_user)
    is_break = F.when(
        gap.isNull() | (gap > SESSION_GAP_MIN * 60 * 1_000_000), 1
    ).otherwise(0)
    sessions = (
        ev.withColumn("_brk", is_break)
        .withColumn(
            "session_seq",
            F.sum("_brk").over(
                w_user.rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            ),
        )
        .groupBy("user_id", "session_seq")
        .agg(
            (F.max("_us") - F.min("_us")).cast("long").alias("dur_us")
        )
        .filter(F.col("dur_us") > 0)
    )
    y = sessions.select(
        F.log(
            F.col("dur_us").cast("double") / F.lit(1_000_000.0)
        ).alias("y")
    )
    agg = y.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    mu = F.col("sy") / nd
    var = (F.col("syy") - nd * mu * mu) / (nd - F.lit(1.0))
    sigma = F.sqrt(var)
    return agg.select(
        "n",
        F.round(mu, 6).alias("mu_log_s"),
        F.round(sigma, 6).alias("sigma_log_s"),
        F.round(F.exp(mu), 6).alias("median_s"),
        F.round(F.exp(mu + var / F.lit(2.0)), 6).alias("mean_s"),
    )


SQL_LOGNORMAL_SESSIONS = f"""
WITH marked AS (
  SELECT user_id, event_id, ts, epoch_us(ts) AS us,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                   > {SESSION_GAP_MIN * 60 * 1_000_000}
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id,
         CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS session_seq,
         us
  FROM marked
),
durs AS (
  SELECT CAST(max(us) - min(us) AS BIGINT) AS dur_us
  FROM sessions GROUP BY user_id, session_seq
  HAVING max(us) - min(us) > 0
),
y AS (
  SELECT ln(CAST(dur_us AS DOUBLE) / CAST('1000000.0' AS DOUBLE)) AS y
  FROM durs
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n, sum(y) AS sy, sum(y * y) AS syy
  FROM y
)
SELECT n,
       round(sy / CAST(n AS DOUBLE), 6) AS mu_log_s,
       round(sqrt((syy - CAST(n AS DOUBLE) * (sy / CAST(n AS DOUBLE))
                         * (sy / CAST(n AS DOUBLE)))
                  / (CAST(n AS DOUBLE) - 1.0)), 6) AS sigma_log_s,
       round(exp(sy / CAST(n AS DOUBLE)), 6) AS median_s,
       round(exp(sy / CAST(n AS DOUBLE)
                 + ((syy - CAST(n AS DOUBLE) * (sy / CAST(n AS DOUBLE))
                           * (sy / CAST(n AS DOUBLE)))
                    / (CAST(n AS DOUBLE) - 1.0)) / 2.0), 6) AS mean_s
FROM agg
"""


# --------------------------------------------------------------------------
# EWMA control chart (Roberts 1959) on daily revenue, truncated at a
# 50-day window (alpha=0.1: the dropped tail weight 0.9^50 < 0.52% —
# the truncation makes the recursion a FINITE weighted sum, expressible
# identically on both engines as a bounded day-offset self-join instead
# of an inexpressible sequential recursion): flags days where the EWMA
# leaves the ±3σ_ewma band around the global mean. Weights (1-a)^k are
# the same exact doubles on both engines (integer powers of 0.9).
# --------------------------------------------------------------------------
EWMA_ALPHA = 0.1
EWMA_WINDOW = 50
EWMA_WEIGHTS = [EWMA_ALPHA * (1.0 - EWMA_ALPHA) ** k for k in range(EWMA_WINDOW)]
_EWMA_WEIGHTS_SQL = ",\n    ".join(
    f"({k}, CAST('{w!r}' AS DOUBLE))" for k, w in enumerate(EWMA_WEIGHTS)
)


def q_ewma_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _read(spark, sf_dir, "orders").select(
        F.floor(
            ntz_epoch_us(F.col("o_orderdate")) / F.lit(US_PER_DAY_DIV)
        )
        .cast("long")
        .alias("day"),
        F.round(F.col("o_totalprice") * F.lit(100.0), 0)
        .cast("long")
        .alias("cents"),
    )
    daily = (
        orders.groupBy("day")
        .agg(F.sum("cents").cast("long").alias("rev"))
        .localCheckpoint(eager=True)
    )
    wt = Window.orderBy("day")
    idx = daily.select(
        "rev", F.row_number().over(wt).cast("long").alias("t")
    ).localCheckpoint(eager=True)
    a, b = idx.alias("a"), idx.alias("b")
    # weights 0.1*0.9^k precomputed ONCE in Python and inlined as the
    # same literals on both sides — pow() is only 1-ulp accurate and
    # differs between Java and C libm (the negative_sampling lesson)
    warr = F.array(*[F.lit(w) for w in EWMA_WEIGHTS])
    lag_k = (F.col("a.t") - F.col("b.t")).cast("int")
    ew = (
        a.join(
            b,
            (F.col("b.t") <= F.col("a.t"))
            & (F.col("b.t") > F.col("a.t") - EWMA_WINDOW),
        )
        .select(
            F.col("a.t").alias("t"),
            (
                F.element_at(warr, lag_k + F.lit(1))
                * F.col("b.rev").cast("double")
            ).alias("wterm"),
            F.element_at(warr, lag_k + F.lit(1)).alias("w"),
        )
        .groupBy("t")
        .agg(
            F.sum("wterm").alias("num"),
            F.sum("w").alias("den"),
        )
    )
    xd = F.col("rev").cast("double")
    stats = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rev").cast("long").alias("s"),
        F.sum(xd * xd).alias("ss"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("s").cast("double") / nd
    var = (F.col("ss") - nd * mean * mean) / (nd - F.lit(1.0))
    # asymptotic EWMA variance: sigma^2 * a/(2-a)
    sig_e = F.sqrt(
        var * F.lit(EWMA_ALPHA) / F.lit(2.0 - EWMA_ALPHA)
    )
    j = ew.crossJoin(
        F.broadcast(
            stats.select("n", mean.alias("mean"), sig_e.alias("sig_e"))
        )
    ).select(
        "t",
        (F.col("num") / F.col("den")).alias("ewma"),
        "n",
        "mean",
        "sig_e",
    )
    out = j.agg(
        F.max("n").alias("n_days"),
        F.sum(
            F.when(
                F.abs(F.col("ewma") - F.col("mean"))
                > F.lit(3.0) * F.col("sig_e"),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_out_of_control"),
        F.round(
            F.max(F.when(F.col("t") == F.col("n"), F.col("ewma")))
            / F.lit(100.0),
            6,
        ).alias("final_ewma_dollars"),
    )
    return out


SQL_EWMA_CONTROL = f"""
WITH daily AS (
  SELECT epoch_us(o_orderdate) // {US_PER_DAY_DIV} AS day,
         CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
           AS rev
  FROM orders GROUP BY 1
),
idx AS (
  SELECT rev, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
  FROM daily
),
wts (k, w) AS (
  VALUES {_EWMA_WEIGHTS_SQL}
),
ew AS (
  SELECT a.t,
         sum(wts.w * CAST(b.rev AS DOUBLE)) AS num,
         sum(wts.w) AS den
  FROM idx a
  JOIN idx b ON b.t <= a.t AND b.t > a.t - {EWMA_WINDOW}
  JOIN wts ON wts.k = a.t - b.t
  GROUP BY a.t
),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(rev) AS BIGINT) AS s,
         sum(CAST(rev AS DOUBLE) * CAST(rev AS DOUBLE)) AS ss
  FROM daily
),
param AS (
  SELECT n, CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
         sqrt(((ss - CAST(n AS DOUBLE)
                     * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                     * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
               / (CAST(n AS DOUBLE) - 1.0))
              * CAST('0.1' AS DOUBLE) / CAST('1.9' AS DOUBLE)) AS sig_e
  FROM stats
)
SELECT max(param.n) AS n_days,
       CAST(sum(CASE WHEN abs(ew.num / ew.den - param.mean)
                          > 3.0 * param.sig_e
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_out_of_control,
       round(max(CASE WHEN ew.t = param.n THEN ew.num / ew.den END)
             / CAST('100.0' AS DOUBLE), 6) AS final_ewma_dollars
FROM ew, param
"""


# --------------------------------------------------------------------------
# Offered load report (Little's law quantities, Erlang's A = lambda*W):
# over the event_sessions bounds, total session-time / observation
# window = time-average concurrent sessions (Erlangs), arrival rate per
# hour, and mean session duration. All three from exact integer
# epoch-us sums; Little's identity holds exactly by construction and
# the pair verifies the bookkeeping.
# --------------------------------------------------------------------------
def q_offered_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = events.withColumn("_us", ntz_epoch_us(F.col("ts")))
    gap = F.col("_us") - F.lag("_us").over(w_user)
    is_break = F.when(
        gap.isNull() | (gap > SESSION_GAP_MIN * 60 * 1_000_000), 1
    ).otherwise(0)
    sessions = (
        ev.withColumn("_brk", is_break)
        .withColumn(
            "session_seq",
            F.sum("_brk").over(
                w_user.rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            ),
        )
        .groupBy("user_id", "session_seq")
        .agg(
            F.min("_us").alias("st"),
            F.max("_us").alias("en"),
        )
    )
    agg = sessions.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum(F.col("en") - F.col("st")).cast("long").alias("busy_us"),
        F.min("st").cast("long").alias("t0"),
        F.max("en").cast("long").alias("t1"),
    )
    window_us = (F.col("t1") - F.col("t0")).cast("double")
    erlangs = F.col("busy_us").cast("double") / window_us
    return agg.select(
        "n_sessions",
        F.round(window_us / F.lit(3_600_000_000.0), 6).alias(
            "window_hours"
        ),
        F.round(erlangs, 6).alias("offered_load_erlangs"),
        F.round(
            F.col("n_sessions").cast("double")
            / (window_us / F.lit(3_600_000_000.0)),
            6,
        ).alias("arrivals_per_hour"),
        F.round(
            F.col("busy_us").cast("double")
            / F.col("n_sessions").cast("double")
            / F.lit(1_000_000.0),
            6,
        ).alias("mean_session_s"),
    )


SQL_OFFERED_LOAD = f"""
WITH marked AS (
  SELECT user_id, event_id, ts, epoch_us(ts) AS us,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                   > {SESSION_GAP_MIN * 60 * 1_000_000}
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id,
         CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS session_seq,
         us
  FROM marked
),
bounds AS (
  SELECT CAST(min(us) AS BIGINT) AS st, CAST(max(us) AS BIGINT) AS en
  FROM sessions GROUP BY user_id, session_seq
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_sessions,
         CAST(sum(en - st) AS BIGINT) AS busy_us,
         CAST(min(st) AS BIGINT) AS t0, CAST(max(en) AS BIGINT) AS t1
  FROM bounds
)
SELECT n_sessions,
       round(CAST(t1 - t0 AS DOUBLE) / CAST('3600000000.0' AS DOUBLE), 6)
         AS window_hours,
       round(CAST(busy_us AS DOUBLE) / CAST(t1 - t0 AS DOUBLE), 6)
         AS offered_load_erlangs,
       round(CAST(n_sessions AS DOUBLE)
             / (CAST(t1 - t0 AS DOUBLE) / CAST('3600000000.0' AS DOUBLE)),
             6) AS arrivals_per_hour,
       round(CAST(busy_us AS DOUBLE) / CAST(n_sessions AS DOUBLE)
             / CAST('1000000.0' AS DOUBLE), 6) AS mean_session_s
FROM agg
"""


# --------------------------------------------------------------------------
# Erlang-B blocking table (Erlang 1917 — capacity planning from the
# offered load the previous pair measures): B(k, a) = (a^k/k!) /
# sum_{j<=k} a^j/j! for k = 1..10 servers, with a = the measured
# offered load. Factorials are EXACT BIGINT literals inlined on both
# sides (10! fits easily); a^j goes through pow on both engines — a
# 1-ulp libm divergence lands ~9 orders below the round-6 grid of a
# probability.
# --------------------------------------------------------------------------
_FACTORIALS = [1]
for _j in range(1, 11):
    _FACTORIALS.append(_FACTORIALS[-1] * _j)
_FACT_SQL = ",\n    ".join(
    f"({j}, CAST({_FACTORIALS[j]} AS BIGINT))" for j in range(11)
)


def q_erlang_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = events.withColumn("_us", ntz_epoch_us(F.col("ts")))
    gap = F.col("_us") - F.lag("_us").over(w_user)
    is_break = F.when(
        gap.isNull() | (gap > SESSION_GAP_MIN * 60 * 1_000_000), 1
    ).otherwise(0)
    sessions = (
        ev.withColumn("_brk", is_break)
        .withColumn(
            "session_seq",
            F.sum("_brk").over(
                w_user.rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            ),
        )
        .groupBy("user_id", "session_seq")
        .agg(F.min("_us").alias("st"), F.max("_us").alias("en"))
    )
    load = sessions.agg(
        (
            F.sum(F.col("en") - F.col("st")).cast("double")
            / (F.max("en") - F.min("st")).cast("double")
        ).alias("a")
    )
    facts = spark.createDataFrame(
        [(j, _FACTORIALS[j]) for j in range(11)], "j long, fact long"
    )
    terms = facts.crossJoin(F.broadcast(load)).select(
        "j",
        (
            F.pow(F.col("a"), F.col("j").cast("double"))
            / F.col("fact").cast("double")
        ).alias("t"),
        "a",
    )
    wcum = Window.orderBy("j").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = terms.select(
        "j", "t", "a", F.sum("t").over(wcum).alias("csum")
    ).filter(F.col("j") >= 1)
    return cum.select(
        F.col("j").alias("servers"),
        F.round("a", 6).alias("offered_load"),
        F.round(F.col("t") / F.col("csum"), 6).alias("blocking_prob"),
    ).orderBy("servers")


SQL_ERLANG_B = f"""
WITH marked AS (
  SELECT user_id, event_id, ts, epoch_us(ts) AS us,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                   > {SESSION_GAP_MIN * 60 * 1_000_000}
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id,
         CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS session_seq,
         us
  FROM marked
),
bounds AS (
  SELECT CAST(min(us) AS BIGINT) AS st, CAST(max(us) AS BIGINT) AS en
  FROM sessions GROUP BY user_id, session_seq
),
load AS (
  SELECT CAST(sum(en - st) AS DOUBLE)
           / CAST(max(en) - min(st) AS DOUBLE) AS a
  FROM bounds
),
facts (j, fact) AS (
  VALUES {_FACT_SQL}
),
terms AS (
  SELECT j, power(a, CAST(j AS DOUBLE)) / CAST(fact AS DOUBLE) AS t, a
  FROM facts, load
),
cum AS (
  SELECT j, t, a,
         sum(t) OVER (ORDER BY j
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS csum
  FROM terms
)
SELECT j AS servers, round(a, 6) AS offered_load,
       round(t / csum, 6) AS blocking_prob
FROM cum WHERE j >= 1
ORDER BY servers
"""


# --------------------------------------------------------------------------
# Session burstiness (Goh & Barabasi 2008's B = (sigma - mu)/(sigma +
# mu) on inter-session gaps): B -> -1 for periodic, 0 for Poisson, +1
# for extreme bursts — the named summary of whether users return on a
# schedule. Per-user gap moments are exact integer (n, Σ, Σx²) triples
# in minutes; B per user (≥3 sessions) and the corpus mean/quartiles.
# --------------------------------------------------------------------------
def q_session_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = events.withColumn("_us", ntz_epoch_us(F.col("ts")))
    gap = F.col("_us") - F.lag("_us").over(w_user)
    is_break = F.when(
        gap.isNull() | (gap > SESSION_GAP_MIN * 60 * 1_000_000), 1
    ).otherwise(0)
    starts = (
        ev.withColumn("_brk", is_break)
        .withColumn(
            "session_seq",
            F.sum("_brk").over(
                w_user.rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            ),
        )
        .groupBy("user_id", "session_seq")
        .agg(F.min("_us").cast("long").alias("st"))
    )
    ws = Window.partitionBy("user_id").orderBy("st")
    gaps = starts.select(
        "user_id",
        (
            (F.col("st") - F.lag("st").over(ws))
            / F.lit(60_000_000)
        )
        .cast("long")
        .alias("gap_min"),
    ).filter(F.col("gap_min").isNotNull())
    per_user = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("gap_min").cast("long").alias("s"),
        F.sum(F.col("gap_min") * F.col("gap_min")).cast("long").alias("ss"),
    ).filter(F.col("n") >= 3)
    nd = F.col("n").cast("double")
    mu = F.col("s").cast("double") / nd
    sd = F.sqrt(
        (F.col("ss").cast("double") - nd * mu * mu) / (nd - F.lit(1.0))
    )
    b = (sd - mu) / (sd + mu)
    scored = per_user.select(F.round(b, 6).alias("b"))
    return scored.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.round(F.sum("b") / F.count(F.lit(1)).cast("double"), 6).alias(
            "mean_b"
        ),
        F.round(F.expr("percentile(b, 0.25D)"), 6).alias("p25_b"),
        F.round(F.expr("percentile(b, 0.75D)"), 6).alias("p75_b"),
    )


SQL_SESSION_BURSTINESS = f"""
WITH marked AS (
  SELECT user_id, event_id, ts, epoch_us(ts) AS us,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                   > {SESSION_GAP_MIN * 60 * 1_000_000}
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id,
         CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS session_seq,
         us
  FROM marked
),
starts AS (
  SELECT user_id, CAST(min(us) AS BIGINT) AS st
  FROM sessions GROUP BY user_id, session_seq
),
gaps AS (
  SELECT user_id,
         CAST((st - lag(st) OVER (PARTITION BY user_id ORDER BY st))
              // 60000000 AS BIGINT) AS gap_min
  FROM starts
  QUALIFY gap_min IS NOT NULL
),
per_user AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(gap_min) AS BIGINT) AS s,
         CAST(sum(gap_min * gap_min) AS BIGINT) AS ss
  FROM gaps GROUP BY user_id
  HAVING count(*) >= 3
),
scored AS (
  SELECT round((sqrt((CAST(ss AS DOUBLE)
                      - CAST(n AS DOUBLE)
                        * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                        * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
                     / (CAST(n AS DOUBLE) - 1.0))
                - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
               / (sqrt((CAST(ss AS DOUBLE)
                        - CAST(n AS DOUBLE)
                          * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                          * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
                       / (CAST(n AS DOUBLE) - 1.0))
                  + CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS b
  FROM per_user
)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       round(sum(b) / CAST(count(*) AS DOUBLE), 6) AS mean_b,
       round(quantile_cont(b, 0.25), 6) AS p25_b,
       round(quantile_cont(b, 0.75), 6) AS p75_b
FROM scored
"""


# --------------------------------------------------------------------------
# Hurst exponent via rescaled range (Hurst 1951; Mandelbrot & Wallis
# 1969's R/S analysis): daily revenue split into non-overlapping blocks
# of 16/32/64/128 days; per block, R = range of cumulative deviations
# from the block mean, S = block sd, and H = the OLS slope of
# ln(mean R/S) on ln(block size) over the four sizes. Per-block work is
# an ORDERED cumulative window inside bounded blocks; the 4-point OLS
# is closed-form. H≈0.5 is a random walk, >0.5 persistent.
# --------------------------------------------------------------------------
def q_hurst_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _read(spark, sf_dir, "orders").select(
        F.floor(
            ntz_epoch_us(F.col("o_orderdate")) / F.lit(US_PER_DAY_DIV)
        )
        .cast("long")
        .alias("day"),
        F.round(F.col("o_totalprice") * F.lit(100.0), 0)
        .cast("long")
        .alias("cents"),
    )
    daily = (
        orders.groupBy("day")
        .agg(F.sum("cents").cast("long").alias("rev"))
        .localCheckpoint(eager=True)
    )
    wt = Window.orderBy("day")
    idx = daily.select(
        "rev", (F.row_number().over(wt) - 1).cast("long").alias("t")
    )
    sizes = spark.createDataFrame(
        [(16,), (32,), (64,), (128,)], "m long"
    )
    blocks = idx.crossJoin(F.broadcast(sizes)).select(
        "m",
        F.expr("t div m").alias("blk"),
        "t",
        "rev",
    )
    # block stats first (mean, sd from exact sums)
    bstat = blocks.groupBy("m", "blk").agg(
        F.count(F.lit(1)).cast("long").alias("bn"),
        F.sum("rev").cast("long").alias("bs"),
        F.sum(
            F.col("rev").cast("double") * F.col("rev").cast("double")
        ).alias("bss"),
    ).filter(F.col("bn") == F.col("m"))
    bmean = F.col("bs").cast("double") / F.col("bn").cast("double")
    bvar = (F.col("bss") - F.col("bn").cast("double") * bmean * bmean) / (
        F.col("bn").cast("double") - F.lit(1.0)
    )
    bstat = bstat.select(
        "m", "blk", bmean.alias("mu"), F.sqrt(bvar).alias("sd")
    )
    wcum = (
        Window.partitionBy("m", "blk")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        blocks.join(bstat, ["m", "blk"])
        .select(
            "m",
            "blk",
            "sd",
            F.sum(F.col("rev").cast("double") - F.col("mu"))
            .over(wcum)
            .alias("c"),
        )
    )
    rs = cum.groupBy("m", "blk", "sd").agg(
        (F.max("c") - F.min("c")).alias("r")
    ).filter(F.col("sd") > 0)
    per_m = rs.groupBy("m").agg(
        F.sum(F.col("r") / F.col("sd")).alias("rs_sum"),
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
    ).select(
        "m",
        "n_blocks",
        F.log(
            F.col("rs_sum") / F.col("n_blocks").cast("double")
        ).alias("y"),
        F.log(F.col("m").cast("double")).alias("x"),
    )
    ols = per_m.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    kd = F.col("k").cast("double")
    slope = (kd * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        kd * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return ols.select(
        F.col("k").alias("n_sizes"),
        F.round(slope, 6).alias("hurst_h"),
    )


SQL_HURST_EXPONENT = f"""
WITH daily AS (
  SELECT epoch_us(o_orderdate) // {US_PER_DAY_DIV} AS day,
         CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
           AS rev
  FROM orders GROUP BY 1
),
idx AS (
  SELECT rev,
         CAST(row_number() OVER (ORDER BY day) - 1 AS BIGINT) AS t
  FROM daily
),
sizes AS (SELECT CAST(unnest([16, 32, 64, 128]) AS BIGINT) AS m),
blocks AS (
  SELECT m, t // m AS blk, t, rev FROM idx, sizes
),
bstat AS (
  SELECT m, blk,
         CAST(sum(rev) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mu,
         sqrt((sum(CAST(rev AS DOUBLE) * CAST(rev AS DOUBLE))
               - CAST(count(*) AS DOUBLE)
                 * (CAST(sum(rev) AS DOUBLE) / CAST(count(*) AS DOUBLE))
                 * (CAST(sum(rev) AS DOUBLE) / CAST(count(*) AS DOUBLE)))
              / (CAST(count(*) AS DOUBLE) - 1.0)) AS sd
  FROM blocks GROUP BY m, blk
  HAVING count(*) = max(m)
),
cum AS (
  SELECT b.m, b.blk, s.sd,
         sum(CAST(b.rev AS DOUBLE) - s.mu)
           OVER (PARTITION BY b.m, b.blk ORDER BY b.t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
  FROM blocks b JOIN bstat s USING (m, blk)
),
rs AS (
  SELECT m, blk, sd, max(c) - min(c) AS r
  FROM cum GROUP BY m, blk, sd
  HAVING sd > 0
),
per_m AS (
  SELECT m, CAST(count(*) AS BIGINT) AS n_blocks,
         ln(sum(r / sd) / CAST(count(*) AS DOUBLE)) AS y,
         ln(CAST(m AS DOUBLE)) AS x
  FROM rs GROUP BY m
),
ols AS (
  SELECT CAST(count(*) AS BIGINT) AS k, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM per_m
)
SELECT k AS n_sizes,
       round((CAST(k AS DOUBLE) * sxy - sx * sy)
             / (CAST(k AS DOUBLE) * sxx - sx * sx), 6) AS hurst_h
FROM ols
"""


# --------------------------------------------------------------------------
# Kingman G/G/1 waiting-time approximation (Kingman 1961: W ≈
# rho/(1-rho) · (ca² + cs²)/2 · E[s]) — the capacity-planning estimate
# composed from measured session statistics: rho = offered load,
# ca² = squared CV of inter-arrival gaps (session starts, global
# order), cs² = squared CV of session durations. Every moment comes
# from exact integer epoch-us sums.
# --------------------------------------------------------------------------
def q_kingman_wait(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = events.withColumn("_us", ntz_epoch_us(F.col("ts")))
    gap = F.col("_us") - F.lag("_us").over(w_user)
    is_break = F.when(
        gap.isNull() | (gap > SESSION_GAP_MIN * 60 * 1_000_000), 1
    ).otherwise(0)
    sessions = (
        ev.withColumn("_brk", is_break)
        .withColumn(
            "session_seq",
            F.sum("_brk").over(
                w_user.rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            ),
        )
        .groupBy("user_id", "session_seq")
        .agg(F.min("_us").cast("long").alias("st"),
             F.max("_us").cast("long").alias("en"))
        .localCheckpoint(eager=True)
    )
    wg = Window.orderBy("st", "user_id")
    arr = sessions.select(
        (F.col("st") - F.lag("st").over(wg)).alias("ia")
    ).filter(F.col("ia").isNotNull())
    ia = arr.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("ia").cast("long").alias("s"),
        F.sum(F.col("ia").cast("double") * F.col("ia").cast("double"))
        .alias("ss"),
    )
    dur = sessions.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum(F.col("en") - F.col("st")).cast("long").alias("ds"),
        F.sum(
            (F.col("en") - F.col("st")).cast("double")
            * (F.col("en") - F.col("st")).cast("double")
        ).alias("dss"),
        F.min("st").cast("long").alias("t0"),
        F.max("en").cast("long").alias("t1"),
    )

    def cv2(n, s, ss):
        nd = n.cast("double")
        mu = s.cast("double") / nd
        var = (ss - nd * mu * mu) / (nd - F.lit(1.0))
        return var / (mu * mu)

    j = ia.crossJoin(F.broadcast(dur))
    rho = F.col("ds").cast("double") / (
        F.col("t1") - F.col("t0")
    ).cast("double")
    ca2 = cv2(F.col("n"), F.col("s"), F.col("ss"))
    cs2 = cv2(F.col("m"), F.col("ds"), F.col("dss"))
    es = F.col("ds").cast("double") / F.col("m").cast("double")
    wait_us = (
        rho / (F.lit(1.0) - rho) * (ca2 + cs2) / F.lit(2.0) * es
    )
    return j.select(
        F.round(rho, 6).alias("rho"),
        F.round(ca2, 6).alias("ca2"),
        F.round(cs2, 6).alias("cs2"),
        F.round(es / F.lit(1_000_000.0), 6).alias("mean_service_s"),
        F.round(wait_us / F.lit(1_000_000.0), 6).alias(
            "kingman_wait_s"
        ),
    )


SQL_KINGMAN_WAIT = f"""
WITH marked AS (
  SELECT user_id, event_id, ts, epoch_us(ts) AS us,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                   > {SESSION_GAP_MIN * 60 * 1_000_000}
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id,
         CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS session_seq,
         us
  FROM marked
),
bounds AS (
  SELECT user_id, CAST(min(us) AS BIGINT) AS st,
         CAST(max(us) AS BIGINT) AS en
  FROM sessions GROUP BY user_id, session_seq
),
arr AS (
  SELECT st - lag(st) OVER (ORDER BY st, user_id) AS ia FROM bounds
  QUALIFY ia IS NOT NULL
),
ia AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(ia) AS BIGINT) AS s,
         sum(CAST(ia AS DOUBLE) * CAST(ia AS DOUBLE)) AS ss
  FROM arr
),
dur AS (
  SELECT CAST(count(*) AS BIGINT) AS m,
         CAST(sum(en - st) AS BIGINT) AS ds,
         sum(CAST(en - st AS DOUBLE) * CAST(en - st AS DOUBLE)) AS dss,
         CAST(min(st) AS BIGINT) AS t0, CAST(max(en) AS BIGINT) AS t1
  FROM bounds
)
SELECT round(CAST(ds AS DOUBLE) / CAST(t1 - t0 AS DOUBLE), 6) AS rho,
       round(((ss - CAST(n AS DOUBLE)
                    * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
              / (CAST(n AS DOUBLE) - 1.0))
             / ((CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))), 6) AS ca2,
       round(((dss - CAST(m AS DOUBLE)
                     * (CAST(ds AS DOUBLE) / CAST(m AS DOUBLE))
                     * (CAST(ds AS DOUBLE) / CAST(m AS DOUBLE)))
              / (CAST(m AS DOUBLE) - 1.0))
             / ((CAST(ds AS DOUBLE) / CAST(m AS DOUBLE))
                * (CAST(ds AS DOUBLE) / CAST(m AS DOUBLE))), 6) AS cs2,
       round(CAST(ds AS DOUBLE) / CAST(m AS DOUBLE)
             / CAST('1000000.0' AS DOUBLE), 6) AS mean_service_s,
       round((CAST(ds AS DOUBLE) / CAST(t1 - t0 AS DOUBLE))
             / (1.0 - CAST(ds AS DOUBLE) / CAST(t1 - t0 AS DOUBLE))
             * (((ss - CAST(n AS DOUBLE)
                       * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                       * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
                 / (CAST(n AS DOUBLE) - 1.0))
                / ((CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                   * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
                + ((dss - CAST(m AS DOUBLE)
                          * (CAST(ds AS DOUBLE) / CAST(m AS DOUBLE))
                          * (CAST(ds AS DOUBLE) / CAST(m AS DOUBLE)))
                   / (CAST(m AS DOUBLE) - 1.0))
                  / ((CAST(ds AS DOUBLE) / CAST(m AS DOUBLE))
                     * (CAST(ds AS DOUBLE) / CAST(m AS DOUBLE)))) / 2.0
             * (CAST(ds AS DOUBLE) / CAST(m AS DOUBLE))
             / CAST('1000000.0' AS DOUBLE), 6) AS kingman_wait_s
FROM ia, dur
"""


# --------------------------------------------------------------------------
# Daily event-mix anomaly days (Jensen-Shannon divergence of each day's
# event-type distribution against the corpus mix — the day-level
# anomaly sweep complementing events_anomaly's per-bucket z-scores):
# all distributions are exact-integer count ratios, the JS sum runs
# over the bounded |types| support per day, and the top-5 days rank on
# the rounded divergence with a day tiebreak.
# --------------------------------------------------------------------------
def q_daily_mix_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    cells = events.select(
        F.floor(ntz_epoch_us(F.col("ts")) / F.lit(US_PER_DAY_DIV))
        .cast("long")
        .alias("day"),
        "event_type",
    ).groupBy("day", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    ).localCheckpoint(eager=True)
    day_tot = cells.groupBy("day").agg(
        F.sum("c").cast("long").alias("dn")
    )
    glob = cells.groupBy("event_type").agg(
        F.sum("c").cast("long").alias("gc")
    )
    gtot = glob.agg(F.sum("gc").cast("long").alias("gn"))
    j = (
        cells.join(F.broadcast(day_tot), "day")
        .join(F.broadcast(glob), "event_type")
        .crossJoin(F.broadcast(gtot))
    )
    p = F.col("c").cast("double") / F.col("dn").cast("double")
    q = F.col("gc").cast("double") / F.col("gn").cast("double")
    m = (p + q) / F.lit(2.0)
    term = (
        p * F.log(p / m) + q * F.log(q / m)
    ) / F.lit(2.0)
    per_day = j.select("day", "dn", term.alias("t")).groupBy(
        "day", "dn"
    ).agg(F.round(F.sum("t"), 6).alias("js"))
    pick = Window.orderBy(F.col("js").desc(), F.col("day").asc())
    return (
        per_day.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") <= 5)
        .select("day", F.col("dn").alias("n_events"), "js")
        .orderBy("day")
    )


SQL_DAILY_MIX_ANOMALY = f"""
WITH cells AS (
  SELECT epoch_us(ts) // {US_PER_DAY_DIV} AS day, event_type,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
day_tot AS (
  SELECT day, CAST(sum(c) AS BIGINT) AS dn FROM cells GROUP BY day
),
gmix AS (
  SELECT event_type, CAST(sum(c) AS BIGINT) AS gc
  FROM cells GROUP BY event_type
),
gtot AS (SELECT CAST(sum(gc) AS BIGINT) AS gn FROM gmix),
per_day AS (
  SELECT day, dn,
         round(sum((CAST(c AS DOUBLE) / CAST(dn AS DOUBLE)
                    * ln((CAST(c AS DOUBLE) / CAST(dn AS DOUBLE))
                         / ((CAST(c AS DOUBLE) / CAST(dn AS DOUBLE)
                             + CAST(gc AS DOUBLE) / CAST(gn AS DOUBLE))
                            / 2.0))
                    + CAST(gc AS DOUBLE) / CAST(gn AS DOUBLE)
                      * ln((CAST(gc AS DOUBLE) / CAST(gn AS DOUBLE))
                           / ((CAST(c AS DOUBLE) / CAST(dn AS DOUBLE)
                               + CAST(gc AS DOUBLE) / CAST(gn AS DOUBLE))
                              / 2.0))) / 2.0), 6) AS js
  FROM cells
  JOIN day_tot USING (day)
  JOIN gmix USING (event_type), gtot
  GROUP BY day, dn
),
top AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (ORDER BY js DESC, day ASC) AS rn
    FROM per_day)
  WHERE rn <= 5
)
SELECT day, dn AS n_events, js FROM top
ORDER BY day
"""


# --------------------------------------------------------------------------
# Partial autocorrelation of daily revenue at lags 1-3 via the
# Durbin-Levinson recursion on per-lag Pearson autocorrelations (the
# Yule-Walker PACF an AR-order diagnostic reads) — completes the serial
# family next to traffic_autocorr (raw ACF), durbin_watson and the
# periodogram. The series is the exact integer daily revenue in whole
# currency units (cents DIV 100 — integer division, no float rounding);
# per-lag correlations come from exact BIGINT moment sums over the
# bounded lag self-join, and the recursion's double arithmetic is
# spelled identically in both engines (identical inputs -> identical
# IEEE results). Only the six outputs round to 6.
# --------------------------------------------------------------------------
PACF_LAGS = (1, 2, 3)


def q_pacf_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _read(spark, sf_dir, "orders").select(
        F.floor(
            ntz_epoch_us(F.col("o_orderdate")) / F.lit(US_PER_DAY_DIV)
        )
        .cast("long")
        .alias("day"),
        F.round(F.col("o_totalprice") * F.lit(100.0), 0)
        .cast("long")
        .alias("cents"),
    )
    daily = (
        orders.groupBy("day")
        .agg(F.expr("CAST(sum(cents) AS BIGINT) DIV 100").alias("x"))
        .localCheckpoint(eager=True)
    )
    n_days = daily.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    lags = F.explode(F.array(*[F.lit(x) for x in PACF_LAGS])).alias("lag")
    a = daily.select("day", F.col("x"), lags)
    b = daily.select(F.col("day").alias("d2"), F.col("x").alias("y"))
    pairs = a.join(b, F.col("d2") == F.col("day") - F.col("lag").cast("long"))
    stats = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    n, sx, sy, sxy, sxx, syy = [
        F.col(c).cast("double") for c in ["n", "sx", "sy", "sxy", "sxx", "syy"]
    ]
    r = (n * sxy - sx * sy) / F.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    wide = stats.select("lag", r.alias("r")).groupBy().agg(
        *[
            F.max(F.when(F.col("lag") == k, F.col("r"))).alias(f"_r{k}")
            for k in PACF_LAGS
        ]
    )
    r1, r2, r3 = F.col("_r1"), F.col("_r2"), F.col("_r3")
    phi22 = (r2 - r1 * r1) / (F.lit(1.0) - r1 * r1)
    lvl2 = wide.select(
        "_r1", "_r2", "_r3", phi22.alias("_phi22"),
        (r1 - phi22 * r1).alias("_phi21"),
    )
    p21, p22 = F.col("_phi21"), F.col("_phi22")
    phi33 = (r3 - p21 * r2 - p22 * r1) / (
        F.lit(1.0) - p21 * r1 - p22 * r2
    )
    return (
        lvl2.crossJoin(F.broadcast(n_days))
        .select(
            "n_days",
            F.round(r1, 6).alias("r1"),
            F.round(r2, 6).alias("r2"),
            F.round(r3, 6).alias("r3"),
            F.round(p22, 6).alias("pacf2"),
            F.round(phi33, 6).alias("pacf3"),
        )
    )


SQL_PACF_DAILY = f"""
WITH daily AS (
  SELECT epoch_us(o_orderdate) // {US_PER_DAY_DIV} AS day,
         CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
           // 100 AS x
  FROM orders GROUP BY 1
),
n_days AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily),
pairs AS (
  SELECT l.lag, a.x AS x, b.x AS y
  FROM daily a, (SELECT unnest([{", ".join(str(k) for k in PACF_LAGS)}]) AS lag) l
  JOIN daily b ON b.day = a.day - l.lag
),
stats AS (
  SELECT lag, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM pairs GROUP BY lag
),
rs AS (
  SELECT lag,
         (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS r
  FROM stats
),
wide AS (
  SELECT max(CASE WHEN lag = 1 THEN r END) AS r1,
         max(CASE WHEN lag = 2 THEN r END) AS r2,
         max(CASE WHEN lag = 3 THEN r END) AS r3
  FROM rs
),
lvl2 AS (
  SELECT r1, r2, r3,
         (r2 - r1 * r1) / (1.0 - r1 * r1) AS phi22,
         r1 - ((r2 - r1 * r1) / (1.0 - r1 * r1)) * r1 AS phi21
  FROM wide
)
SELECT n_days,
       round(r1, 6) AS r1, round(r2, 6) AS r2, round(r3, 6) AS r3,
       round(phi22, 6) AS pacf2,
       round((r3 - phi21 * r2 - phi22 * r1)
             / (1.0 - phi21 * r1 - phi22 * r2), 6) AS pacf3
FROM lvl2, n_days
"""


# --------------------------------------------------------------------------
# Allan variance of the event arrival rate (Allan 1966 — the
# clock-stability statistic an ingest-rate monitor reads; unlike plain
# variance it converges for drifting rates): AVAR(tau) =
# mean((c_{i+1}-c_i)^2)/2 over ADJACENT bucket counts at tau = 1h/4h/24h,
# on the DENSE bucket axis (sequence(min..max) with zero-fill — a gap
# hour is a real zero, not a missing row). Counts, differences and
# squared sums are exact BIGINTs; the two divides and the sqrt (IEEE
# correctly rounded) are the only doubles. Complements fano_factor
# (dispersion at one scale) with the multi-scale stability curve.
# --------------------------------------------------------------------------
ALLAN_TAUS_H = (1, 4, 24)


def q_allan_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    us = ntz_epoch_us(F.col("ts"))
    out = None
    for tau in ALLAN_TAUS_H:
        div = tau * 3_600_000_000
        counts = (
            events.select(F.floor(us / F.lit(div)).cast("long").alias("b"))
            .groupBy("b")
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
        )
        bounds = counts.agg(
            F.min("b").alias("b0"), F.max("b").alias("b1")
        )
        axis = bounds.select(
            F.explode(F.sequence(F.col("b0"), F.col("b1"))).alias("b")
        )
        dense = axis.join(counts, "b", "left").select(
            "b", F.coalesce("c", F.lit(0)).cast("long").alias("c")
        )
        nxt = dense.select(
            (F.col("b") - 1).alias("b"), F.col("c").alias("cn")
        )
        pairs = dense.join(nxt, "b")
        d = F.col("cn") - F.col("c")
        agg = pairs.agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("c").cast("long").alias("sc"),
            F.sum(d * d).cast("long").alias("sdd"),
        )
        avar = F.col("sdd").cast("double") / (
            F.lit(2.0) * F.col("n_pairs").cast("double")
        )
        row = agg.select(
            F.lit(tau).cast("long").alias("tau_hours"),
            "n_pairs",
            F.round(
                F.col("sc").cast("double") / F.col("n_pairs").cast("double"),
                6,
            ).alias("mean_count"),
            F.round(avar, 6).alias("allan_var"),
            F.round(F.sqrt(avar), 6).alias("allan_dev"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def _allan_sql() -> str:
    blocks = []
    for tau in ALLAN_TAUS_H:
        div = tau * 3_600_000_000
        blocks.append(f"""SELECT * FROM (
  WITH counts AS (
    SELECT epoch_us(ts) // {div} AS b, CAST(count(*) AS BIGINT) AS c
    FROM events GROUP BY 1
  ),
  bounds AS (SELECT min(b) AS b0, max(b) AS b1 FROM counts),
  dense AS (
    SELECT t.b, CAST(COALESCE(c.c, 0) AS BIGINT) AS c
    FROM (SELECT unnest(range(b0, b1 + 1)) AS b FROM bounds) t
    LEFT JOIN counts c USING (b)
  ),
  pairs AS (
    SELECT a.c AS c, n.c AS cn
    FROM dense a JOIN dense n ON n.b = a.b + 1
  ),
  agg AS (
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(c) AS BIGINT) AS sc,
           CAST(sum((cn - c) * (cn - c)) AS BIGINT) AS sdd
    FROM pairs
  )
  SELECT CAST({tau} AS BIGINT) AS tau_hours, n_pairs,
         round(CAST(sc AS DOUBLE) / CAST(n_pairs AS DOUBLE), 6)
           AS mean_count,
         round(CAST(sdd AS DOUBLE) / (2.0 * CAST(n_pairs AS DOUBLE)), 6)
           AS allan_var,
         round(sqrt(CAST(sdd AS DOUBLE) / (2.0 * CAST(n_pairs AS DOUBLE))),
               6) AS allan_dev
  FROM agg
)""")
    return "\nUNION ALL\n".join(blocks)


SQL_ALLAN_VARIANCE = _allan_sql()


QUERIES = {
    "allan_variance": q_allan_variance,
    "anova_dow": q_anova_dow,
    "asof_join": q_asof_join,
    "behavior_entropy": q_behavior_entropy,
    "bounce_rate": q_bounce_rate,
    "circadian_profile": q_circadian_profile,
    "cohort_overlap": q_cohort_overlap,
    "cohort_retention": q_cohort_retention,
    "cusum_changepoint": q_cusum_changepoint,
    "daily_mix_anomaly": q_daily_mix_anomaly,
    "erlang_b": q_erlang_b,
    "event_funnel": q_event_funnel,
    "event_gaps": q_event_gaps,
    "event_sessions": q_event_sessions,
    "event_transitions": q_event_transitions,
    "events_anomaly": q_events_anomaly,
    "events_rollup": q_events_rollup,
    "ewma_control": q_ewma_control,
    "fano_factor": q_fano_factor,
    "haar_energy": q_haar_energy,
    "hurst_exponent": q_hurst_exponent,
    "interval_join": q_interval_join,
    "kingman_wait": q_kingman_wait,
    "lognormal_sessions": q_lognormal_sessions,
    "mann_kendall": q_mann_kendall,
    "max_concurrency": q_max_concurrency,
    "monthly_seasonality": q_monthly_seasonality,
    "offered_load": q_offered_load,
    "pacf_daily": q_pacf_daily,
    "periodogram": q_periodogram,
    "pettitt_test": q_pettitt_test,
    "props_extract": q_props_extract,
    "purchase_regularity": q_purchase_regularity,
    "reorder_interval": q_reorder_interval,
    "rolling_active": q_rolling_active,
    "session_burstiness": q_session_burstiness,
    "session_gap_sweep": q_session_gap_sweep,
    "touch_attribution": q_touch_attribution,
    "traffic_autocorr": q_traffic_autocorr,
    "traffic_bursts": q_traffic_bursts,
    "user_accumulation": q_user_accumulation,
    "user_streaks": q_user_streaks,
    "value_histogram": q_value_histogram,
    "weekly_profile": q_weekly_profile,
}

ORACLES = {
    "allan_variance": SQL_ALLAN_VARIANCE,
    "anova_dow": SQL_ANOVA_DOW,
    "asof_join": SQL_ASOF_JOIN,
    "behavior_entropy": SQL_BEHAVIOR_ENTROPY,
    "bounce_rate": SQL_BOUNCE_RATE,
    "circadian_profile": SQL_CIRCADIAN_PROFILE,
    "cohort_overlap": SQL_COHORT_OVERLAP,
    "cohort_retention": SQL_COHORT_RETENTION,
    "cusum_changepoint": SQL_CUSUM_CHANGEPOINT,
    "daily_mix_anomaly": SQL_DAILY_MIX_ANOMALY,
    "erlang_b": SQL_ERLANG_B,
    "event_funnel": SQL_EVENT_FUNNEL,
    "event_gaps": SQL_EVENT_GAPS,
    "event_sessions": SQL_EVENT_SESSIONS,
    "event_transitions": SQL_EVENT_TRANSITIONS,
    "events_anomaly": SQL_EVENTS_ANOMALY,
    "events_rollup": SQL_EVENTS_ROLLUP,
    "ewma_control": SQL_EWMA_CONTROL,
    "fano_factor": SQL_FANO_FACTOR,
    "haar_energy": SQL_HAAR_ENERGY,
    "hurst_exponent": SQL_HURST_EXPONENT,
    "interval_join": SQL_INTERVAL_JOIN,
    "kingman_wait": SQL_KINGMAN_WAIT,
    "lognormal_sessions": SQL_LOGNORMAL_SESSIONS,
    "mann_kendall": SQL_MANN_KENDALL,
    "max_concurrency": SQL_MAX_CONCURRENCY,
    "monthly_seasonality": SQL_MONTHLY_SEASONALITY,
    "offered_load": SQL_OFFERED_LOAD,
    "pacf_daily": SQL_PACF_DAILY,
    "periodogram": SQL_PERIODOGRAM,
    "pettitt_test": SQL_PETTITT_TEST,
    "props_extract": SQL_PROPS_EXTRACT,
    "purchase_regularity": SQL_PURCHASE_REGULARITY,
    "reorder_interval": SQL_REORDER_INTERVAL,
    "rolling_active": SQL_ROLLING_ACTIVE,
    "session_burstiness": SQL_SESSION_BURSTINESS,
    "session_gap_sweep": SQL_SESSION_GAP_SWEEP,
    "touch_attribution": SQL_TOUCH_ATTRIBUTION,
    "traffic_autocorr": SQL_TRAFFIC_AUTOCORR,
    "traffic_bursts": SQL_TRAFFIC_BURSTS,
    "user_accumulation": SQL_USER_ACCUMULATION,
    "user_streaks": SQL_USER_STREAKS,
    "value_histogram": SQL_VALUE_HISTOGRAM,
    "weekly_profile": SQL_WEEKLY_PROFILE,
}
