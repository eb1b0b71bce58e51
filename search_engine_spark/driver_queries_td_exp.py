"""Experimentation, causal-inference and ML-eval pairs.

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
    AB_CONV_VALUE6,
    CHURN_GAP_US,
    LIFE_BUCKET_US,
    TOKEN_RUN,
    US_PER_DAY_DIV,
    _read,
)

# --------------------------------------------------------------------------
# UCB1 bandit scores (Auer, Cesa-Bianchi & Fischer 2002 — the
# deterministic exploration policy; Thompson sampling needs RNG and is
# deliberately out of scope): arm = event type, reward = the value
# column; UCB = mean_reward + sqrt(2 ln N / n_arm). Mean from fixed6
# BIGINT sums (invariant 4); ln on an exact integer (the same libm
# surface every idf pair exercises) and correctly-rounded sqrt; one
# round-6 display per arm. The table a ranking/crawl scheduler reads to
# pick the next arm.
# --------------------------------------------------------------------------
def q_ucb_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events").select(
        "event_type", fixed6_long(F.col("value")).alias("v6")
    )
    arms = events.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v6").cast("long").alias("s6"),
    )
    total = arms.agg(F.sum("n").cast("long").alias("_big_n"))
    mean = F.col("s6").cast("double") / (
        F.col("n").cast("double") * F.lit(1000000.0)
    )
    bonus = F.sqrt(
        F.lit(2.0)
        * F.log(F.col("_big_n").cast("double"))
        / F.col("n").cast("double")
    )
    return (
        arms.crossJoin(F.broadcast(total))
        .select(
            F.col("event_type").alias("arm"),
            "n",
            F.round(mean, 6).alias("mean_reward"),
            F.round(mean + bonus, 6).alias("ucb1"),
        )
        .orderBy("arm")
    )


SQL_UCB_SCORES = """
WITH arms AS (
  SELECT event_type AS arm, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(value * 1000000.0) AS BIGINT)) AS BIGINT) AS s6
  FROM events GROUP BY event_type
),
total AS (SELECT CAST(sum(n) AS BIGINT) AS big_n FROM arms)
SELECT arm, n,
       round(CAST(s6 AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0), 6)
         AS mean_reward,
       round(CAST(s6 AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0)
             + sqrt(2.0 * ln(CAST(total.big_n AS DOUBLE))
                    / CAST(n AS DOUBLE)), 6) AS ucb1
FROM arms, total
ORDER BY arm
"""


def q_ab_test_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    users = events.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (fixed6_long(F.col("value")) > AB_CONV_VALUE6),
                1,
            ).otherwise(0)
        ).alias("conv")
    )
    grp = F.expr(
        "CAST(conv(substring(md5(cast(user_id as string)), 1, 1), 16, 10)"
        " AS INT) % 2"
    )
    g = users.select(grp.alias("grp"), "conv")
    agg = g.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("conv").cast("long").alias("c"),
    )
    a = agg.filter(F.col("grp") == 0).select(
        F.col("n").alias("n_a"), F.col("c").alias("conv_a")
    )
    b = agg.filter(F.col("grp") == 1).select(
        F.col("n").alias("n_b"), F.col("c").alias("conv_b")
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    ca, cb = F.col("conv_a").cast("double"), F.col("conv_b").cast("double")
    pool = (ca + cb) / (na + nb)
    z = (ca / na - cb / nb) / F.sqrt(
        pool * (F.lit(1.0) - pool) * (F.lit(1.0) / na + F.lit(1.0) / nb)
    )
    z6 = F.round(z * F.lit(1000000.0), 0).cast("long")
    return a.crossJoin(F.broadcast(b)).select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.round(ca / na, 6).alias("rate_a"),
        F.round(cb / nb, 6).alias("rate_b"),
        F.round(z, 6).alias("z_score"),
        (F.abs(z6) >= 1960000).alias("significant_95"),
    )


SQL_AB_TEST_Z = f"""
WITH users AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'purchase'
                  AND CAST(round(value * 1000000.0) AS BIGINT)
                      > {AB_CONV_VALUE6}
                  THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id
),
g AS (
  SELECT ((strpos('0123456789abcdef',
            substring(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1) % 2) AS grp,
         conv
  FROM users
),
agg AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS n, CAST(sum(conv) AS BIGINT) AS c
  FROM g GROUP BY grp
),
ab AS (
  SELECT (SELECT n FROM agg WHERE grp = 0) AS n_a,
         (SELECT c FROM agg WHERE grp = 0) AS conv_a,
         (SELECT n FROM agg WHERE grp = 1) AS n_b,
         (SELECT c FROM agg WHERE grp = 1) AS conv_b
),
calc AS (
  SELECT *,
         (CAST(conv_a AS DOUBLE) + CAST(conv_b AS DOUBLE))
           / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) AS pool
  FROM ab
),
zc AS (
  SELECT *,
         (CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
          - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
         / sqrt(pool * (1.0 - pool)
                * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
           AS z
  FROM calc
)
SELECT n_a, conv_a, n_b, conv_b,
       round(CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6) AS rate_a,
       round(CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6) AS rate_b,
       round(z, 6) AS z_score,
       (abs(CAST(round(z * 1000000.0) AS BIGINT)) >= 1960000)
         AS significant_95
FROM zc
"""


# --------------------------------------------------------------------------
# Two-proportion sample-size / power analysis (the experiment-design
# step upstream of the ab_test_z pair — same md5 cohort split, same
# conversion predicate, so the two pairs audit one experiment end to
# end): required n per arm for 80% power at two-sided alpha=0.05,
# n = (z_a2 + z_b)^2 * (p1 q1 + p2 q2) / (p1 - p2)^2 (Fleiss et al.).
# The normal quantiles enter as CAST('...' AS DOUBLE) string constants
# (neither engine has qnorm; invariant 1 forbids bare float literals).
# --------------------------------------------------------------------------
def q_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    users = events.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (fixed6_long(F.col("value")) > AB_CONV_VALUE6),
                1,
            ).otherwise(0)
        ).alias("conv")
    )
    grp = F.expr(
        "CAST(conv(substring(md5(cast(user_id as string)), 1, 1), 16, 10)"
        " AS INT) % 2"
    )
    agg = users.select(grp.alias("grp"), "conv").groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("conv").cast("long").alias("c"),
    )
    a = agg.filter(F.col("grp") == 0).select(
        F.col("n").alias("n_a"), F.col("c").alias("conv_a")
    )
    b = agg.filter(F.col("grp") == 1).select(
        F.col("n").alias("n_b"), F.col("c").alias("conv_b")
    )
    j = a.crossJoin(F.broadcast(b))
    p1 = F.col("conv_a").cast("double") / F.col("n_a").cast("double")
    p2 = F.col("conv_b").cast("double") / F.col("n_b").cast("double")
    z_a2 = F.lit(1.959963984540054)
    z_b = F.lit(0.8416212335729143)
    n_req = (
        (z_a2 + z_b)
        * (z_a2 + z_b)
        * (p1 * (F.lit(1.0) - p1) + p2 * (F.lit(1.0) - p2))
        / ((p1 - p2) * (p1 - p2))
    )
    return j.select(
        "n_a",
        "n_b",
        F.round(p1, 6).alias("p1"),
        F.round(p2, 6).alias("p2"),
        F.round(n_req, 6).alias("n_required_per_arm"),
        F.ceil(n_req).cast("long").alias("n_required_ceil"),
    )


SQL_POWER_ANALYSIS = f"""
WITH users AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'purchase'
                  AND CAST(round(value * 1000000.0) AS BIGINT)
                      > {AB_CONV_VALUE6}
                  THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id
),
g AS (
  SELECT ((strpos('0123456789abcdef',
            substring(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1) % 2) AS grp,
         conv
  FROM users
),
agg AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS n, CAST(sum(conv) AS BIGINT) AS c
  FROM g GROUP BY grp
),
ab AS (
  SELECT (SELECT n FROM agg WHERE grp = 0) AS n_a,
         (SELECT c FROM agg WHERE grp = 0) AS conv_a,
         (SELECT n FROM agg WHERE grp = 1) AS n_b,
         (SELECT c FROM agg WHERE grp = 1) AS conv_b
),
p AS (
  SELECT n_a, n_b,
         CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS p1,
         CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS p2
  FROM ab
),
calc AS (
  SELECT n_a, n_b, p1, p2,
         (CAST('1.959963984540054' AS DOUBLE)
          + CAST('0.8416212335729143' AS DOUBLE))
         * (CAST('1.959963984540054' AS DOUBLE)
            + CAST('0.8416212335729143' AS DOUBLE))
         * (p1 * (1.0 - p1) + p2 * (1.0 - p2))
         / ((p1 - p2) * (p1 - p2)) AS n_req
  FROM p
)
SELECT n_a, n_b, round(p1, 6) AS p1, round(p2, 6) AS p2,
       round(n_req, 6) AS n_required_per_arm,
       CAST(ceil(n_req) AS BIGINT) AS n_required_ceil
FROM calc
"""


# --------------------------------------------------------------------------
# One-step logistic regression (the first IRLS/Newton step from beta=0,
# where the update has the CLOSED FORM 4*(X'X)^-1 X'(y-1/2) because the
# working weights are exactly 1/4): big-purchase conversion regressed on
# ln(1 + total event value) per user. All sufficient statistics are
# sums (y integer; x one ln per user), the 2x2 solve is explicit, and
# the coefficients are scale-free ratios.
# --------------------------------------------------------------------------
def q_logistic_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    users = events.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (fixed6_long(F.col("value")) > AB_CONV_VALUE6),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("y"),
        F.sum(fixed6_long(F.col("value"))).cast("long").alias("v6"),
    )
    feat = users.select(
        "y",
        F.log(
            F.lit(1.0) + F.col("v6").cast("double") / F.lit(1_000_000.0)
        ).alias("x"),
    )
    agg = feat.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y").cast("double")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    g0 = F.col("sy").cast("double") - nd / F.lit(2.0)
    g1 = F.col("sxy") - F.col("sx") / F.lit(2.0)
    det = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    beta0 = F.lit(4.0) * (F.col("sxx") * g0 - F.col("sx") * g1) / det
    beta1 = F.lit(4.0) * (nd * g1 - F.col("sx") * g0) / det
    return agg.select(
        "n",
        F.col("sy").alias("converted"),
        F.round(beta0, 6).alias("beta0"),
        F.round(beta1, 6).alias("beta1"),
    )


SQL_LOGISTIC_STEP = f"""
WITH users AS (
  SELECT user_id,
         CAST(max(CASE WHEN event_type = 'purchase'
                  AND CAST(round(value * 1000000.0) AS BIGINT)
                      > {AB_CONV_VALUE6}
                  THEN 1 ELSE 0 END) AS BIGINT) AS y,
         CAST(sum(CAST(round(value * 1000000.0) AS BIGINT)) AS BIGINT)
           AS v6
  FROM events GROUP BY user_id
),
feat AS (
  SELECT y,
         ln(1.0 + CAST(v6 AS DOUBLE) / CAST('1000000.0' AS DOUBLE)) AS x
  FROM users
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS sy,
         sum(x) AS sx, sum(x * x) AS sxx,
         sum(x * CAST(y AS DOUBLE)) AS sxy
  FROM feat
)
SELECT n, sy AS converted,
       round(4.0 * (sxx * (CAST(sy AS DOUBLE) - CAST(n AS DOUBLE) / 2.0)
                    - sx * (sxy - sx / 2.0))
             / (CAST(n AS DOUBLE) * sxx - sx * sx), 6) AS beta0,
       round(4.0 * (CAST(n AS DOUBLE) * (sxy - sx / 2.0)
                    - sx * (CAST(sy AS DOUBLE) - CAST(n AS DOUBLE) / 2.0))
             / (CAST(n AS DOUBLE) * sxx - sx * sx), 6) AS beta1
FROM agg
"""


# --------------------------------------------------------------------------
# k-anonymity audit (Sweeney 2002 — the data-governance gate a training-
# data pipeline runs before releasing a table): quasi-identifier =
# (nation, market segment, account balance bucketed to $1000), report
# the equivalence-class census and how many customers sit in classes
# smaller than k=5 (re-identifiable). Pure integer counts; the balance
# bucket uses round-to-cents-then-divide so the bucket edge is exact.
# --------------------------------------------------------------------------
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _read(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        # shift to non-negative cents before the integer divide:
        # truncation == floor only for positive operands (invariant 3),
        # and acctbal can be negative
        F.expr(
            "(CAST(round(c_acctbal * 100.0) AS BIGINT) + 100000000)"
            " div 100000"
        ).alias("bal_bucket"),
    )
    classes = cust.groupBy(
        "c_nationkey", "c_mktsegment", "bal_bucket"
    ).agg(F.count(F.lit(1)).cast("long").alias("sz"))
    return classes.agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum("sz").cast("long").alias("n_customers"),
        F.min("sz").cast("long").alias("min_class"),
        F.sum(F.when(F.col("sz") < 5, F.col("sz")).otherwise(0))
        .cast("long")
        .alias("n_below_k5"),
        F.round(
            F.sum(
                F.when(F.col("sz") < 5, F.col("sz")).otherwise(0)
            ).cast("double")
            / F.sum("sz").cast("double"),
            6,
        ).alias("risk_fraction"),
    )


SQL_K_ANONYMITY = """
WITH cust AS (
  SELECT c_nationkey, c_mktsegment,
         (CAST(round(c_acctbal * 100.0) AS BIGINT) + 100000000)
           // 100000 AS bal_bucket
  FROM customer
),
classes AS (
  SELECT c_nationkey, c_mktsegment, bal_bucket,
         CAST(count(*) AS BIGINT) AS sz
  FROM cust GROUP BY 1, 2, 3
)
SELECT CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(sz) AS BIGINT) AS n_customers,
       CAST(min(sz) AS BIGINT) AS min_class,
       CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT)
         AS n_below_k5,
       round(CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS DOUBLE)
             / CAST(sum(sz) AS DOUBLE), 6) AS risk_fraction
FROM classes
"""


# --------------------------------------------------------------------------
# l-diversity audit (Machanavajjhala et al. 2006 — the homogeneity-
# attack check k-anonymity misses): quasi-identifier = (nation, balance
# bucket), sensitive attribute = market segment; classes where all
# members share one segment leak it even at k-anonymous sizes. Distinct
# segments per class via the two-phase dedupe-then-count shape
# (invariant 6), everything integer.
# --------------------------------------------------------------------------
def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _read(spark, sf_dir, "customer").select(
        "c_nationkey",
        F.expr(
            "(CAST(round(c_acctbal * 100.0) AS BIGINT) + 100000000)"
            " div 100000"
        ).alias("bal_bucket"),
        "c_mktsegment",
    )
    sizes = cust.groupBy("c_nationkey", "bal_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("sz")
    )
    distinct_seg = (
        cust.dropDuplicates(["c_nationkey", "bal_bucket", "c_mktsegment"])
        .groupBy("c_nationkey", "bal_bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("l"))
    )
    cls = sizes.join(distinct_seg, ["c_nationkey", "bal_bucket"])
    return cls.agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum(F.when(F.col("l") < 2, 1).otherwise(0))
        .cast("long")
        .alias("homogeneous_classes"),
        F.sum(F.when(F.col("l") < 2, F.col("sz")).otherwise(0))
        .cast("long")
        .alias("exposed_customers"),
        F.min("l").cast("long").alias("min_l"),
        F.round(
            F.sum("l").cast("double") / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("mean_l"),
    )


SQL_L_DIVERSITY = """
WITH cust AS (
  SELECT c_nationkey,
         (CAST(round(c_acctbal * 100.0) AS BIGINT) + 100000000)
           // 100000 AS bal_bucket,
         c_mktsegment
  FROM customer
),
sizes AS (
  SELECT c_nationkey, bal_bucket, CAST(count(*) AS BIGINT) AS sz
  FROM cust GROUP BY 1, 2
),
dseg AS (
  SELECT c_nationkey, bal_bucket, CAST(count(*) AS BIGINT) AS l
  FROM (SELECT DISTINCT c_nationkey, bal_bucket, c_mktsegment FROM cust)
  GROUP BY 1, 2
),
cls AS (
  SELECT s.sz, d.l FROM sizes s JOIN dseg d USING (c_nationkey, bal_bucket)
)
SELECT CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(CASE WHEN l < 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS homogeneous_classes,
       CAST(sum(CASE WHEN l < 2 THEN sz ELSE 0 END) AS BIGINT)
         AS exposed_customers,
       CAST(min(l) AS BIGINT) AS min_l,
       round(CAST(sum(l) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
         AS mean_l
FROM cls
"""


# --------------------------------------------------------------------------
# Shapley-value channel attribution (Shapley 1953, the 3-player closed
# form — the game-theoretic alternative to the touch_attribution pair's
# positional rules): channels = {view, click, signup} exposure before
# conversion, coalition value v(S) = conversion rate among users whose
# exposure set is a SUBSET of S (the "can only have been driven by S"
# convention, documented); phi_i sums the 4 weighted marginals. All 8
# subset rates are ratios of exact BIGINT counts; marginals divide by
# the exact doubles 3.0/6.0 identically on both engines.
# --------------------------------------------------------------------------
def q_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    users = events.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("long")
        .alias("e1"),
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("e2"),
        F.max(F.when(F.col("event_type") == "signup", 1).otherwise(0))
        .cast("long")
        .alias("e3"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (fixed6_long(F.col("value")) > AB_CONV_VALUE6),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("y"),
    )
    # mask 1=view 2=click 4=signup; conversion = the big-ticket purchase
    # predicate (plain any-purchase converts 100% of the event-dense
    # synthetic users — the ab_test_z lesson — and a constant game
    # Shapley-splits trivially)
    masked = users.select(
        (F.col("e1") + 2 * F.col("e2") + 4 * F.col("e3")).alias("m"),
        "y",
    )
    per_m = masked.groupBy("m").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("c"),
    ).localCheckpoint(eager=True)
    # v(S) = conversions/users over masks m ⊆ S; 8 coalitions
    coalitions = spark.range(0, 8).select(
        F.col("id").cast("long").alias("s")
    )
    agg_s = (
        per_m.crossJoin(F.broadcast(coalitions))
        .filter(F.expr("(m & ~s) = 0"))
        .groupBy("s")
        .agg(
            F.sum("n").cast("long").alias("ns"),
            F.sum("c").cast("long").alias("cs"),
        )
    )
    # coalitions with NO subset-mask users (e.g. S=0 when every user has
    # some exposure) must still appear with v=0, or the pivot yields
    # NULL phis
    vs = coalitions.join(agg_s, "s", "left").select(
        "s",
        F.when(
            F.coalesce(F.col("ns"), F.lit(0)) > 0,
            F.col("cs").cast("double") / F.col("ns").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("v"),
    )
    # pivot the 8 coalition values into one row
    row = vs.groupBy().pivot("s", list(range(8))).agg(F.first("v"))
    v = {k: F.col(f"`{k}`") for k in range(8)}

    # divide each marginal by the EXACT doubles 3.0/6.0 (identical on
    # both engines) instead of premultiplying by 1/3, whose rounding
    # differs from a direct division
    def phi(i_bit, others):
        o1, o2 = others
        return (
            (v[i_bit] - v[0]) / F.lit(3.0)
            + (v[i_bit | o1] - v[o1]) / F.lit(6.0)
            + (v[i_bit | o2] - v[o2]) / F.lit(6.0)
            + (v[7] - v[o1 | o2]) / F.lit(3.0)
        )

    return row.select(
        F.round(v[7], 6).alias("overall_rate"),
        F.round(phi(1, (2, 4)), 6).alias("phi_view"),
        F.round(phi(2, (1, 4)), 6).alias("phi_click"),
        F.round(phi(4, (1, 2)), 6).alias("phi_signup"),
    )


SQL_SHAPLEY_ATTRIBUTION = f"""
WITH users AS (
  SELECT user_id,
         CAST(max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              AS BIGINT) AS e1,
         CAST(max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS e2,
         CAST(max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
              AS BIGINT) AS e3,
         CAST(max(CASE WHEN event_type = 'purchase'
                  AND CAST(round(value * 1000000.0) AS BIGINT)
                      > {AB_CONV_VALUE6}
                  THEN 1 ELSE 0 END) AS BIGINT) AS y
  FROM events GROUP BY user_id
),
masked AS (SELECT e1 + 2 * e2 + 4 * e3 AS m, y FROM users),
per_m AS (
  SELECT m, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS c
  FROM masked GROUP BY m
),
coalitions AS (SELECT CAST(unnest(range(0, 8)) AS BIGINT) AS s),
agg_s AS (
  SELECT s, CAST(sum(n) AS BIGINT) AS ns, CAST(sum(c) AS BIGINT) AS cs
  FROM per_m, coalitions
  WHERE (m & ~s) = 0
  GROUP BY s
),
vs AS (
  SELECT coalitions.s,
         CASE WHEN coalesce(agg_s.ns, 0) > 0
              THEN CAST(agg_s.cs AS DOUBLE) / CAST(agg_s.ns AS DOUBLE)
              ELSE 0.0 END AS v
  FROM coalitions LEFT JOIN agg_s USING (s)
),
row_v AS (
  SELECT max(CASE WHEN s = 0 THEN v END) AS v0,
         max(CASE WHEN s = 1 THEN v END) AS v1,
         max(CASE WHEN s = 2 THEN v END) AS v2,
         max(CASE WHEN s = 3 THEN v END) AS v3,
         max(CASE WHEN s = 4 THEN v END) AS v4,
         max(CASE WHEN s = 5 THEN v END) AS v5,
         max(CASE WHEN s = 6 THEN v END) AS v6,
         max(CASE WHEN s = 7 THEN v END) AS v7
  FROM vs
)
SELECT round(v7, 6) AS overall_rate,
       round((v1 - v0) / 3.0 + (v3 - v2) / 6.0
             + (v5 - v4) / 6.0 + (v7 - v6) / 3.0, 6) AS phi_view,
       round((v2 - v0) / 3.0 + (v3 - v1) / 6.0
             + (v6 - v4) / 6.0 + (v7 - v5) / 3.0, 6) AS phi_click,
       round((v4 - v0) / 3.0 + (v5 - v1) / 6.0
             + (v6 - v2) / 6.0 + (v7 - v3) / 3.0, 6) AS phi_signup
FROM row_v
"""


# --------------------------------------------------------------------------
# Benjamini-Hochberg FDR control (Benjamini & Hochberg 1995) over the
# source x lang cell family: two-sided p-values from the adjusted
# Pearson residuals via the Abramowitz & Stegun 7.1.26 erfc polynomial
# — a FIXED five-coefficient approximation inlined with the SAME string
# constants on both engines (neither ships a normal CDF; invariant 1
# keeps the coefficients bit-identical). Step-up rule: k* = max k with
# p_(k) <= k*alpha/m; the sort and k* are exact given identical p.
# --------------------------------------------------------------------------
_ERFC_COEFS = (
    "0.3275911",
    "0.254829592",
    "-0.284496736",
    "1.421413741",
    "-1.453152027",
    "1.061405429",
)


def _erfc_col(x):
    p0, a1, a2, a3, a4, a5 = (F.lit(float(c)) for c in _ERFC_COEFS)
    t = F.lit(1.0) / (F.lit(1.0) + p0 * x)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return poly * F.exp(-x * x)


def _erfc_sql(x: str) -> str:
    p0, a1, a2, a3, a4, a5 = (
        f"CAST('{c}' AS DOUBLE)" for c in _ERFC_COEFS
    )
    t = f"(1.0 / (1.0 + {p0} * ({x})))"
    poly = f"({t} * ({a1} + {t} * ({a2} + {t} * ({a3} + {t} * ({a4} + {t} * {a5})))))"
    return f"({poly} * exp(-({x}) * ({x})))"


def q_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents").select("source", "lang")
    cells = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("o")
    )
    rows = cells.groupBy("source").agg(F.sum("o").cast("long").alias("rn"))
    cols = cells.groupBy("lang").agg(F.sum("o").cast("long").alias("cn"))
    n = cells.agg(F.sum("o").cast("long").alias("_n"))
    j = (
        cells.join(F.broadcast(rows), "source")
        .join(F.broadcast(cols), "lang")
        .crossJoin(F.broadcast(n))
    )
    od = F.col("o").cast("double")
    rnd = F.col("rn").cast("double")
    cnd = F.col("cn").cast("double")
    nd = F.col("_n").cast("double")
    e = rnd * cnd / nd
    z = F.abs(
        (od - e)
        / F.sqrt(
            e * (F.lit(1.0) - rnd / nd) * (F.lit(1.0) - cnd / nd)
        )
    )
    pvals = j.select(
        "source",
        "lang",
        _erfc_col(z / F.sqrt(F.lit(2.0))).alias("p"),
    ).localCheckpoint(eager=True)
    wk = Window.orderBy(
        F.col("p").asc(), F.col("source").asc(), F.col("lang").asc()
    )
    m = pvals.agg(F.count(F.lit(1)).cast("long").alias("m"))
    ranked = pvals.select(
        "p", F.row_number().over(wk).cast("long").alias("k")
    ).crossJoin(F.broadcast(m))
    flagged = ranked.select(
        "m",
        "k",
        "p",
        F.when(
            F.col("p")
            <= F.col("k").cast("double")
            * F.lit(0.05)
            / F.col("m").cast("double"),
            F.col("k"),
        )
        .otherwise(F.lit(0))
        .alias("ok_k"),
    )
    return flagged.groupBy("m").agg(
        F.max("ok_k").cast("long").alias("n_rejected"),
        F.round(F.min("p"), 6).alias("min_p"),
        F.round(
            F.max("ok_k").cast("double")
            * F.lit(0.05)
            / F.max("m").cast("double"),
            6,
        ).alias("bh_threshold"),
    )


SQL_BH_FDR = f"""
WITH cells AS (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS o
  FROM documents GROUP BY source, lang
),
rm AS (SELECT source, CAST(sum(o) AS BIGINT) AS rn
       FROM cells GROUP BY source),
cm AS (SELECT lang, CAST(sum(o) AS BIGINT) AS cn FROM cells GROUP BY lang),
nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
pv AS (
  SELECT source, lang,
         {_erfc_sql(
             "abs((CAST(o AS DOUBLE)"
             " - CAST(rn AS DOUBLE) * CAST(cn AS DOUBLE)"
             " / CAST(n AS DOUBLE))"
             " / sqrt(CAST(rn AS DOUBLE) * CAST(cn AS DOUBLE)"
             " / CAST(n AS DOUBLE)"
             " * (1.0 - CAST(rn AS DOUBLE) / CAST(n AS DOUBLE))"
             " * (1.0 - CAST(cn AS DOUBLE) / CAST(n AS DOUBLE))))"
             " / sqrt(2.0)"
         )} AS p
  FROM cells
  JOIN rm USING (source)
  JOIN cm USING (lang), nn
),
m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM pv),
ranked AS (
  SELECT p,
         CAST(row_number() OVER (ORDER BY p ASC, source ASC, lang ASC)
              AS BIGINT) AS k,
         m.m
  FROM pv, m
),
flagged AS (
  SELECT m, k, p,
         CASE WHEN p <= CAST(k AS DOUBLE) * CAST('0.05' AS DOUBLE)
                        / CAST(m AS DOUBLE)
              THEN k ELSE 0 END AS ok_k
  FROM ranked
)
SELECT m, CAST(max(ok_k) AS BIGINT) AS n_rejected,
       round(min(p), 6) AS min_p,
       round(CAST(max(ok_k) AS DOUBLE) * CAST('0.05' AS DOUBLE)
             / CAST(max(m) AS DOUBLE), 6) AS bh_threshold
FROM flagged
GROUP BY m
"""


# --------------------------------------------------------------------------
# Seasonal-naive forecast backtest with MASE (Hyndman & Koehler 2006 —
# the scale-free forecast-accuracy standard): predict each day of the
# second half of the revenue series by the value 7 days earlier, score
# MAE against actuals, and scale by the in-sample seasonal-naive MAE of
# the first half. Every error is |BIGINT − BIGINT| — the whole metric
# is a ratio of exact integer sums.
# --------------------------------------------------------------------------
def q_mase_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    w = Window.orderBy("day")
    idx = daily.select(
        "rev",
        F.row_number().over(w).cast("long").alias("t"),
        F.lag("rev", 7).over(w).alias("pred"),
    )
    n_row = daily.agg(F.count(F.lit(1)).cast("long").alias("n"))
    errs = (
        idx.crossJoin(F.broadcast(n_row))
        .filter(F.col("pred").isNotNull())
        .select(
            "n",
            "t",
            F.abs(F.col("rev") - F.col("pred")).cast("long").alias("ae"),
            (F.col("t") > F.expr("n div 2")).alias("is_test"),
        )
    )
    agg = errs.groupBy("n").agg(
        F.sum(F.when(F.col("is_test"), F.col("ae")).otherwise(0))
        .cast("long")
        .alias("test_ae"),
        F.sum(F.when(F.col("is_test"), 1).otherwise(0))
        .cast("long")
        .alias("test_n"),
        F.sum(F.when(~F.col("is_test"), F.col("ae")).otherwise(0))
        .cast("long")
        .alias("train_ae"),
        F.sum(F.when(~F.col("is_test"), 1).otherwise(0))
        .cast("long")
        .alias("train_n"),
    )
    test_mae = F.col("test_ae").cast("double") / F.col("test_n").cast(
        "double"
    )
    train_mae = F.col("train_ae").cast("double") / F.col(
        "train_n"
    ).cast("double")
    return agg.select(
        F.col("n").alias("n_days"),
        "test_n",
        F.round(test_mae / F.lit(100.0), 6).alias("test_mae_dollars"),
        F.round(train_mae / F.lit(100.0), 6).alias("train_mae_dollars"),
        F.round(test_mae / train_mae, 6).alias("mase"),
    )


SQL_MASE_BACKTEST = f"""
WITH daily AS (
  SELECT epoch_us(o_orderdate) // {US_PER_DAY_DIV} AS day,
         CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
           AS rev
  FROM orders GROUP BY 1
),
idx AS (
  SELECT rev,
         CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
         lag(rev, 7) OVER (ORDER BY day) AS pred
  FROM daily
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
errs AS (
  SELECT n, t, CAST(abs(rev - pred) AS BIGINT) AS ae,
         t > n // 2 AS is_test
  FROM idx, nn WHERE pred IS NOT NULL
),
agg AS (
  SELECT n,
         CAST(sum(CASE WHEN is_test THEN ae ELSE 0 END) AS BIGINT)
           AS test_ae,
         CAST(sum(CASE WHEN is_test THEN 1 ELSE 0 END) AS BIGINT)
           AS test_n,
         CAST(sum(CASE WHEN NOT is_test THEN ae ELSE 0 END) AS BIGINT)
           AS train_ae,
         CAST(sum(CASE WHEN NOT is_test THEN 1 ELSE 0 END) AS BIGINT)
           AS train_n
  FROM errs GROUP BY n
)
SELECT n AS n_days, test_n,
       round(CAST(test_ae AS DOUBLE) / CAST(test_n AS DOUBLE)
             / CAST('100.0' AS DOUBLE), 6) AS test_mae_dollars,
       round(CAST(train_ae AS DOUBLE) / CAST(train_n AS DOUBLE)
             / CAST('100.0' AS DOUBLE), 6) AS train_mae_dollars,
       round((CAST(test_ae AS DOUBLE) / CAST(test_n AS DOUBLE))
             / (CAST(train_ae AS DOUBLE) / CAST(train_n AS DOUBLE)), 6)
         AS mase
FROM agg
"""


# --------------------------------------------------------------------------
# Restricted mean survival time (Royston & Parmar 2013's recommended
# summary when hazards aren't proportional) over the churn_hazard life
# table: RMST = sum_t S(t)*delta with S(t) = prod(1 - h_j). The product
# is exp of an ORDERED cumulative sum of ln((n_r - d)/n_r) — ln on exact
# integer ratios, accumulated over the BOUNDED bucket grid in bucket
# order (same order both engines, invariant 4); an absorbing bucket with
# h=1 pins S=0 thereafter via a cumulative flag instead of ln(0).
# --------------------------------------------------------------------------
def q_rmst(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    us = events.select("user_id", ntz_epoch_us(F.col("ts")).alias("us"))
    end = us.agg(F.max("us").cast("long").alias("_end"))
    users = (
        us.groupBy("user_id")
        .agg(
            F.min("us").cast("long").alias("first_us"),
            F.max("us").cast("long").alias("last_us"),
        )
        .crossJoin(F.broadcast(end))
        .select(
            F.expr(f"(last_us - first_us) div {LIFE_BUCKET_US}").alias(
                "lw"
            ),
            F.when(
                F.col("_end") - F.col("last_us") > CHURN_GAP_US, F.lit(1)
            )
            .otherwise(F.lit(0))
            .alias("churned"),
        )
    )
    hist = users.groupBy("lw").agg(
        F.count(F.lit(1)).cast("long").alias("ended_here"),
        F.sum("churned").cast("long").alias("churned"),
    )
    wdesc = Window.orderBy(F.desc("lw")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    table = hist.select(
        F.col("lw").cast("long").alias("bucket"),
        F.sum("ended_here").over(wdesc).cast("long").alias("nr"),
        "churned",
    ).localCheckpoint(eager=True)
    wasc = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ln_term = F.when(
        F.col("churned") < F.col("nr"),
        F.log(
            (F.col("nr") - F.col("churned")).cast("double")
            / F.col("nr").cast("double")
        ),
    ).otherwise(F.lit(0.0))
    dead = F.when(F.col("churned") >= F.col("nr"), 1).otherwise(0)
    surv = table.select(
        "bucket",
        F.sum(ln_term).over(wasc).alias("lnsum"),
        F.sum(dead).over(wasc).cast("long").alias("dead_cum"),
    ).select(
        "bucket",
        F.when(F.col("dead_cum") > 0, F.lit(0.0))
        .otherwise(F.exp(F.col("lnsum")))
        .alias("s"),
    )
    return surv.agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.round(F.sum(F.col("s") * F.lit(6.0)), 6).alias("rmst_hours"),
        F.round(F.min("s"), 6).alias("final_survival"),
    )


SQL_RMST = f"""
WITH us AS (SELECT user_id, epoch_us(ts) AS us FROM events),
ends AS (SELECT CAST(max(us) AS BIGINT) AS e FROM us),
users AS (
  SELECT CAST((max(us) - min(us)) // {LIFE_BUCKET_US} AS BIGINT) AS lw,
         CASE WHEN (SELECT e FROM ends) - max(us) > {CHURN_GAP_US}
              THEN 1 ELSE 0 END AS churned
  FROM us GROUP BY user_id
),
hist AS (
  SELECT lw, CAST(count(*) AS BIGINT) AS ended_here,
         CAST(sum(churned) AS BIGINT) AS churned
  FROM users GROUP BY lw
),
tab AS (
  SELECT lw AS bucket,
         CAST(sum(ended_here) OVER (ORDER BY lw DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS nr,
         churned
  FROM hist
),
surv AS (
  SELECT bucket,
         CASE WHEN CAST(sum(CASE WHEN churned >= nr THEN 1 ELSE 0 END)
                    OVER (ORDER BY bucket
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) > 0
              THEN 0.0
              ELSE exp(sum(CASE WHEN churned < nr
                                THEN ln(CAST(nr - churned AS DOUBLE)
                                        / CAST(nr AS DOUBLE))
                                ELSE 0.0 END)
                       OVER (ORDER BY bucket
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW))
         END AS s
  FROM tab
)
SELECT CAST(count(*) AS BIGINT) AS n_buckets,
       round(sum(s * 6.0), 6) AS rmst_hours,
       round(min(s), 6) AS final_survival
FROM surv
"""


# --------------------------------------------------------------------------
# Difference-in-differences promo uplift (the Card & Krueger design on
# warehouse data): treatment = PROMO-type parts, periods split at the
# exact midpoint ship day; DiD = (promo_post − promo_pre) −
# (other_post − other_pre) on mean revenue per line item. All four cell
# means are ratios of fixed6 BIGINT sums and exact counts.
# --------------------------------------------------------------------------
def q_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.floor(
            ntz_epoch_us(F.col("l_shipdate")) / F.lit(US_PER_DAY_DIV)
        )
        .cast("long")
        .alias("day"),
        fixed6_long(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        ).alias("r6"),
    )
    part = _read(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_type").startswith("PROMO").alias("is_promo"),
    )
    rng = li.agg(
        ((F.min("day") + F.max("day")) / 2).cast("long").alias("mid")
    )
    cells = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .crossJoin(F.broadcast(rng))
        .select(
            "is_promo",
            (F.col("day") > F.col("mid")).alias("is_post"),
            "r6",
        )
        .groupBy("is_promo", "is_post")
        .agg(
            F.sum("r6").cast("long").alias("s6"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    m = cells.select(
        F.concat(
            F.when(F.col("is_promo"), F.lit("p")).otherwise(F.lit("o")),
            F.when(F.col("is_post"), F.lit("2")).otherwise(F.lit("1")),
        ).alias("cell"),
        (
            F.col("s6").cast("double")
            / F.col("n").cast("double")
            / F.lit(1_000_000.0)
        ).alias("mean_rev"),
    )
    row = m.groupBy().pivot("cell", ["p1", "p2", "o1", "o2"]).agg(
        F.first("mean_rev")
    )
    return row.select(
        F.round("p1", 6).alias("promo_pre"),
        F.round("p2", 6).alias("promo_post"),
        F.round("o1", 6).alias("other_pre"),
        F.round("o2", 6).alias("other_post"),
        F.round(
            (F.col("p2") - F.col("p1")) - (F.col("o2") - F.col("o1")), 6
        ).alias("did_uplift"),
    )


SQL_DIFF_IN_DIFF = f"""
WITH li AS (
  SELECT l_partkey, epoch_us(l_shipdate) // {US_PER_DAY_DIV} AS day,
         {SQL_FIXED6_LONG.format(
             col="l_extendedprice * (1.0 - l_discount)")} AS r6
  FROM lineitem
),
rng AS (SELECT (min(day) + max(day)) // 2 AS mid FROM li),
cells AS (
  SELECT p.p_type LIKE 'PROMO%' AS is_promo, li.day > rng.mid AS is_post,
         CAST(sum(li.r6) AS BIGINT) AS s6, CAST(count(*) AS BIGINT) AS n
  FROM li JOIN part p ON p.p_partkey = li.l_partkey, rng
  GROUP BY 1, 2
),
m AS (
  SELECT (CASE WHEN is_promo THEN 'p' ELSE 'o' END)
           || (CASE WHEN is_post THEN '2' ELSE '1' END) AS cell,
         CAST(s6 AS DOUBLE) / CAST(n AS DOUBLE)
           / CAST('1000000.0' AS DOUBLE) AS mean_rev
  FROM cells
),
row_m AS (
  SELECT max(CASE WHEN cell = 'p1' THEN mean_rev END) AS p1,
         max(CASE WHEN cell = 'p2' THEN mean_rev END) AS p2,
         max(CASE WHEN cell = 'o1' THEN mean_rev END) AS o1,
         max(CASE WHEN cell = 'o2' THEN mean_rev END) AS o2
  FROM m
)
SELECT round(p1, 6) AS promo_pre, round(p2, 6) AS promo_post,
       round(o1, 6) AS other_pre, round(o2, 6) AS other_post,
       round((p2 - p1) - (o2 - o1), 6) AS did_uplift
FROM row_m
"""


# --------------------------------------------------------------------------
# Decision-stump split search (the CART primitive, Breiman et al. 1984):
# best single threshold on per-user total event value predicting
# big-ticket conversion, scored by Gini impurity reduction over the 19
# ventile candidate thresholds (candidate grid from exact integer
# ranks, not a full value sweep — the scalable histogram-split idiom).
# Left/right class counts per candidate are exact BIGINTs; the gain is
# one double expression, argmax on the ROUND-9 grid with threshold-asc
# tiebreak.
# --------------------------------------------------------------------------
def q_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    users = events.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (fixed6_long(F.col("value")) > AB_CONV_VALUE6),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("y"),
        F.sum(fixed6_long(F.col("value"))).cast("long").alias("x6"),
    ).localCheckpoint(eager=True)
    wv = Window.orderBy(F.col("x6").asc(), F.col("user_id").asc())
    ranked = users.select(
        "y", "x6", F.ntile(20).over(wv).cast("long").alias("v")
    )
    # candidate thresholds: max x6 of each of the first 19 ventiles
    cands = (
        ranked.groupBy("v")
        .agg(F.max("x6").cast("long").alias("thr"))
        .filter(F.col("v") < 20)
    )
    tot = users.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
    )
    split = (
        users.crossJoin(F.broadcast(cands))
        .groupBy("thr")
        .agg(
            F.sum(F.when(F.col("x6") <= F.col("thr"), 1).otherwise(0))
            .cast("long")
            .alias("nl"),
            F.sum(
                F.when(
                    (F.col("x6") <= F.col("thr")) & (F.col("y") == 1), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("pl"),
        )
        .crossJoin(F.broadcast(tot))
    )
    nd = F.col("n").cast("double")
    nld = F.col("nl").cast("double")
    nrd = nd - nld
    pld = F.col("pl").cast("double")
    prd = F.col("pos").cast("double") - pld
    pd_ = F.col("pos").cast("double")

    def gini(p, m):
        q = p / m
        return F.lit(2.0) * q * (F.lit(1.0) - q)

    gain = (
        gini(pd_, nd)
        - (nld / nd) * gini(pld, nld)
        - (nrd / nd) * gini(prd, nrd)
    )
    scored = split.filter(
        (F.col("nl") > 0) & (F.col("nl") < F.col("n"))
    ).select("thr", "nl", "pl", F.round(gain, 9).alias("gain"))
    pick = Window.orderBy(F.col("gain").desc(), F.col("thr").asc())
    best = scored.withColumn("rn", F.row_number().over(pick)).filter(
        F.col("rn") == 1
    )
    return best.crossJoin(F.broadcast(tot)).select(
        "n",
        "pos",
        F.round(
            F.col("thr").cast("double") / F.lit(1_000_000.0), 6
        ).alias("best_threshold"),
        "nl",
        "pl",
        F.round(F.col("gain"), 6).alias("gini_gain"),
    )


SQL_DECISION_STUMP = f"""
WITH users AS (
  SELECT user_id,
         CAST(max(CASE WHEN event_type = 'purchase'
                  AND CAST(round(value * 1000000.0) AS BIGINT)
                      > {AB_CONV_VALUE6}
                  THEN 1 ELSE 0 END) AS BIGINT) AS y,
         CAST(sum(CAST(round(value * 1000000.0) AS BIGINT)) AS BIGINT)
           AS x6
  FROM events GROUP BY user_id
),
ranked AS (
  SELECT y, x6,
         CAST(ntile(20) OVER (ORDER BY x6 ASC, user_id ASC) AS BIGINT)
           AS v
  FROM users
),
cands AS (
  SELECT CAST(max(x6) AS BIGINT) AS thr FROM ranked
  WHERE v < 20 GROUP BY v
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos
  FROM users
),
split AS (
  SELECT thr,
         CAST(sum(CASE WHEN x6 <= thr THEN 1 ELSE 0 END) AS BIGINT) AS nl,
         CAST(sum(CASE WHEN x6 <= thr AND y = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS pl
  FROM users, cands GROUP BY thr
),
scored AS (
  SELECT thr, nl, pl,
         round(2.0 * (CAST(pos AS DOUBLE) / CAST(n AS DOUBLE))
               * (1.0 - CAST(pos AS DOUBLE) / CAST(n AS DOUBLE))
               - (CAST(nl AS DOUBLE) / CAST(n AS DOUBLE))
                 * (2.0 * (CAST(pl AS DOUBLE) / CAST(nl AS DOUBLE))
                    * (1.0 - CAST(pl AS DOUBLE) / CAST(nl AS DOUBLE)))
               - ((CAST(n AS DOUBLE) - CAST(nl AS DOUBLE))
                  / CAST(n AS DOUBLE))
                 * (2.0 * ((CAST(pos AS DOUBLE) - CAST(pl AS DOUBLE))
                           / (CAST(n AS DOUBLE) - CAST(nl AS DOUBLE)))
                    * (1.0 - (CAST(pos AS DOUBLE) - CAST(pl AS DOUBLE))
                             / (CAST(n AS DOUBLE)
                                - CAST(nl AS DOUBLE)))), 9) AS gain
  FROM split, tot
  WHERE nl > 0 AND nl < n
),
best AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (ORDER BY gain DESC, thr ASC) AS rn
    FROM scored)
  WHERE rn = 1
)
SELECT n, pos,
       round(CAST(thr AS DOUBLE) / CAST('1000000.0' AS DOUBLE), 6)
         AS best_threshold,
       nl, pl,
       round(gain, 6) AS gini_gain
FROM best, tot
"""


# --------------------------------------------------------------------------
# Cumulative gains / lift table (the model-evaluation decile report):
# users ranked by total event value (the logistic_step feature), decile
# conversion capture, cumulative capture rate, and lift vs the base
# rate. NTILE on a total (x6 DESC, user_id) order; every number is a
# ratio of exact BIGINT counts.
# --------------------------------------------------------------------------
def q_gains_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    users = events.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (fixed6_long(F.col("value")) > AB_CONV_VALUE6),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("y"),
        F.sum(fixed6_long(F.col("value"))).cast("long").alias("x6"),
    )
    wd = Window.orderBy(F.col("x6").desc(), F.col("user_id").asc())
    tiled = users.select(
        "y", F.ntile(10).over(wd).cast("long").alias("decile")
    )
    per = tiled.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("conv"),
    )
    tot = per.agg(
        F.sum("n").cast("long").alias("tn"),
        F.sum("conv").cast("long").alias("tc"),
    )
    wc = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n",
            "conv",
            F.sum("conv").over(wc).cast("long").alias("cum_conv"),
            F.sum("n").over(wc).cast("long").alias("cum_n"),
            "tn",
            "tc",
        )
        .select(
            "decile",
            "n",
            "conv",
            F.round(
                F.col("cum_conv").cast("double")
                / F.col("tc").cast("double"),
                6,
            ).alias("cum_capture"),
            F.round(
                (
                    F.col("cum_conv").cast("double")
                    / F.col("cum_n").cast("double")
                )
                / (F.col("tc").cast("double") / F.col("tn").cast("double")),
                6,
            ).alias("cum_lift"),
        )
        .orderBy("decile")
    )


SQL_GAINS_TABLE = f"""
WITH users AS (
  SELECT user_id,
         CAST(max(CASE WHEN event_type = 'purchase'
                  AND CAST(round(value * 1000000.0) AS BIGINT)
                      > {AB_CONV_VALUE6}
                  THEN 1 ELSE 0 END) AS BIGINT) AS y,
         CAST(sum(CAST(round(value * 1000000.0) AS BIGINT)) AS BIGINT)
           AS x6
  FROM events GROUP BY user_id
),
tiled AS (
  SELECT y,
         CAST(ntile(10) OVER (ORDER BY x6 DESC, user_id ASC) AS BIGINT)
           AS decile
  FROM users
),
per AS (
  SELECT decile, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS conv
  FROM tiled GROUP BY decile
),
tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS tn, CAST(sum(conv) AS BIGINT) AS tc
  FROM per
),
cum AS (
  SELECT decile, n, conv,
         CAST(sum(conv) OVER (ORDER BY decile
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum_conv,
         CAST(sum(n) OVER (ORDER BY decile
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum_n,
         tn, tc
  FROM per, tot
)
SELECT decile, n, conv,
       round(CAST(cum_conv AS DOUBLE) / CAST(tc AS DOUBLE), 6)
         AS cum_capture,
       round((CAST(cum_conv AS DOUBLE) / CAST(cum_n AS DOUBLE))
             / (CAST(tc AS DOUBLE) / CAST(tn AS DOUBLE)), 6) AS cum_lift
FROM cum
ORDER BY decile
"""


# --------------------------------------------------------------------------
# ROC AUC of the value ranking (the probabilistic reading of the
# Mann-Whitney U: AUC = P(score_pos > score_neg) + ties/2): doubled
# midranks keep every rank sum an exact BIGINT, so AUC = (R1_doubled -
# n1(n1+1)) / (2 n1 n0) is ONE ratio of exact integers — the
# threshold-free companion to the gains_table.
# --------------------------------------------------------------------------
def q_ranking_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    users = events.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (fixed6_long(F.col("value")) > AB_CONV_VALUE6),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("y"),
        F.sum(fixed6_long(F.col("value"))).cast("long").alias("x6"),
    )
    wr = Window.orderBy("x6")
    wt = Window.partitionBy("x6")
    ranked = users.select(
        "y",
        (
            F.lit(2) * F.rank().over(wr).cast("long")
            + F.count(F.lit(1)).over(wt).cast("long")
            - F.lit(1)
        ).alias("dr"),
    )
    agg = ranked.agg(
        F.sum(F.when(F.col("y") == 1, F.col("dr")).otherwise(0))
        .cast("long")
        .alias("r1d"),
        F.sum(F.when(F.col("y") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(F.when(F.col("y") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n0"),
    )
    auc = (
        F.col("r1d").cast("double")
        - F.col("n1").cast("double")
        * (F.col("n1").cast("double") + F.lit(1.0))
    ) / (
        F.lit(2.0)
        * F.col("n1").cast("double")
        * F.col("n0").cast("double")
    )
    return agg.select(
        "n1",
        "n0",
        F.round(auc, 6).alias("auc"),
        F.round(F.lit(2.0) * auc - F.lit(1.0), 6).alias("gini_coeff"),
    )


SQL_RANKING_AUC = f"""
WITH users AS (
  SELECT user_id,
         CAST(max(CASE WHEN event_type = 'purchase'
                  AND CAST(round(value * 1000000.0) AS BIGINT)
                      > {AB_CONV_VALUE6}
                  THEN 1 ELSE 0 END) AS BIGINT) AS y,
         CAST(sum(CAST(round(value * 1000000.0) AS BIGINT)) AS BIGINT)
           AS x6
  FROM events GROUP BY user_id
),
ranked AS (
  SELECT y,
         2 * CAST(rank() OVER (ORDER BY x6) AS BIGINT)
           + CAST(count(*) OVER (PARTITION BY x6) AS BIGINT) - 1 AS dr
  FROM users
),
agg AS (
  SELECT CAST(sum(CASE WHEN y = 1 THEN dr ELSE 0 END) AS BIGINT) AS r1d,
         CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0
  FROM ranked
)
SELECT n1, n0,
       round((CAST(r1d AS DOUBLE)
              - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0))
             / (2.0 * CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)), 6) AS auc,
       round(2.0 * ((CAST(r1d AS DOUBLE)
                     - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0))
                    / (2.0 * CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)))
             - 1.0, 6) AS gini_coeff
FROM agg
"""


# --------------------------------------------------------------------------
# Calibration / expected calibration error (Guo et al. 2017's ECE) of
# the one-step logistic model, trained AND evaluated in one plan: the
# closed-form IRLS-step coefficients score every user with
# sigmoid(b0 + b1 x), predictions bin into 5 equal-count bins (NTILE on
# a total order), and each bin compares mean predicted p to observed
# rate. The betas reuse logistic_step's exact-sum construction; the
# composition is the showcase — model fit, scoring, and audit as one
# declarative plan replayed identically in SQL.
# --------------------------------------------------------------------------
def q_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    users = events.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (fixed6_long(F.col("value")) > AB_CONV_VALUE6),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("y"),
        F.sum(fixed6_long(F.col("value"))).cast("long").alias("v6"),
    ).localCheckpoint(eager=True)
    feat = users.select(
        "user_id",
        "y",
        F.log(
            F.lit(1.0) + F.col("v6").cast("double") / F.lit(1_000_000.0)
        ).alias("x"),
    )
    agg = feat.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y").cast("double")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    g0 = F.col("sy").cast("double") - nd / F.lit(2.0)
    g1 = F.col("sxy") - F.col("sx") / F.lit(2.0)
    det = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    betas = agg.select(
        (
            F.lit(4.0) * (F.col("sxx") * g0 - F.col("sx") * g1) / det
        ).alias("b0"),
        (F.lit(4.0) * (nd * g1 - F.col("sx") * g0) / det).alias("b1"),
    )
    scored = feat.crossJoin(F.broadcast(betas)).select(
        "user_id",
        "y",
        (
            F.lit(1.0)
            / (
                F.lit(1.0)
                + F.exp(-(F.col("b0") + F.col("b1") * F.col("x")))
            )
        ).alias("p"),
    )
    wb = Window.orderBy(F.col("p").asc(), F.col("user_id").asc())
    binned = scored.select(
        "y", "p", F.ntile(5).over(wb).cast("long").alias("bin")
    )
    per = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("conv"),
        F.sum("p").alias("psum"),
    )
    return per.select(
        "bin",
        "n",
        F.round(F.col("psum") / F.col("n").cast("double"), 6).alias(
            "mean_pred"
        ),
        F.round(
            F.col("conv").cast("double") / F.col("n").cast("double"), 6
        ).alias("observed"),
        F.round(
            F.abs(
                F.col("psum") / F.col("n").cast("double")
                - F.col("conv").cast("double") / F.col("n").cast("double")
            ),
            6,
        ).alias("abs_gap"),
    ).orderBy("bin")


SQL_CALIBRATION_ECE = f"""
WITH users AS (
  SELECT user_id,
         CAST(max(CASE WHEN event_type = 'purchase'
                  AND CAST(round(value * 1000000.0) AS BIGINT)
                      > {AB_CONV_VALUE6}
                  THEN 1 ELSE 0 END) AS BIGINT) AS y,
         CAST(sum(CAST(round(value * 1000000.0) AS BIGINT)) AS BIGINT)
           AS v6
  FROM events GROUP BY user_id
),
feat AS (
  SELECT user_id, y,
         ln(1.0 + CAST(v6 AS DOUBLE) / CAST('1000000.0' AS DOUBLE)) AS x
  FROM users
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS sy,
         sum(x) AS sx, sum(x * x) AS sxx,
         sum(x * CAST(y AS DOUBLE)) AS sxy
  FROM feat
),
betas AS (
  SELECT 4.0 * (sxx * (CAST(sy AS DOUBLE) - CAST(n AS DOUBLE) / 2.0)
                - sx * (sxy - sx / 2.0))
         / (CAST(n AS DOUBLE) * sxx - sx * sx) AS b0,
         4.0 * (CAST(n AS DOUBLE) * (sxy - sx / 2.0)
                - sx * (CAST(sy AS DOUBLE) - CAST(n AS DOUBLE) / 2.0))
         / (CAST(n AS DOUBLE) * sxx - sx * sx) AS b1
  FROM agg
),
scored AS (
  SELECT f.user_id, f.y,
         1.0 / (1.0 + exp(-(b.b0 + b.b1 * f.x))) AS p
  FROM feat f, betas b
),
binned AS (
  SELECT y, p,
         CAST(ntile(5) OVER (ORDER BY p ASC, user_id ASC) AS BIGINT)
           AS bin
  FROM scored
),
per AS (
  SELECT bin, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS conv, sum(p) AS psum
  FROM binned GROUP BY bin
)
SELECT bin, n,
       round(psum / CAST(n AS DOUBLE), 6) AS mean_pred,
       round(CAST(conv AS DOUBLE) / CAST(n AS DOUBLE), 6) AS observed,
       round(abs(psum / CAST(n AS DOUBLE)
                 - CAST(conv AS DOUBLE) / CAST(n AS DOUBLE)), 6)
         AS abs_gap
FROM per
ORDER BY bin
"""


# --------------------------------------------------------------------------
# SPRT stopping audit (Wald 1945): replay the sequential probability
# ratio test over the daily big-ticket PURCHASE stream — H0 p=0.01 vs
# H1 p=0.045 ("is the big-ticket rate above 1%?"; the observed ~4.5%
# event-level rate crosses the upper ln(19) boundary within days at
# every SF — probed), boundaries ln(19) for alpha=beta=0.05. Daily
# (conversions, trials) are exact integers; each day's LLR increment is
# c*ln(p1/p0) + (n-c)*ln(q1/q0) with the ln constants inlined
# identically, and the cumulative sum runs in day order (invariant 4).
# --------------------------------------------------------------------------
SPRT_P0 = 0.01
SPRT_P1 = 0.045


def q_sprt_stop(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    daily = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.floor(
                ntz_epoch_us(F.col("ts")) / F.lit(US_PER_DAY_DIV)
            )
            .cast("long")
            .alias("day"),
            F.when(
                fixed6_long(F.col("value")) > AB_CONV_VALUE6, 1
            )
            .otherwise(0)
            .alias("conv"),
        )
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("conv").cast("long").alias("c"),
        )
        .localCheckpoint(eager=True)
    )
    # ln(p1/p0), ln(q1/q0) precomputed once in Python, inlined
    lp = F.lit(math.log(SPRT_P1 / SPRT_P0))
    lq = F.lit(math.log((1.0 - SPRT_P1) / (1.0 - SPRT_P0)))
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    llr = daily.select(
        "day",
        F.sum(
            F.col("c").cast("double") * lp
            + (F.col("n") - F.col("c")).cast("double") * lq
        )
        .over(w)
        .alias("llr"),
    )
    bound = F.lit(math.log(19.0))
    crossed = llr.select(
        "day",
        "llr",
        F.when(F.col("llr") >= bound, F.lit("accept_h1"))
        .when(F.col("llr") <= -bound, F.lit("accept_h0"))
        .otherwise(F.lit(None))
        .alias("decision"),
    ).filter(F.col("decision").isNotNull())
    n_days = daily.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    pick = Window.orderBy("day")
    first = crossed.withColumn("rn", F.row_number().over(pick)).filter(
        F.col("rn") == 1
    )
    return first.crossJoin(F.broadcast(n_days)).select(
        "n_days",
        F.col("day").alias("stop_day"),
        F.round("llr", 6).alias("llr_at_stop"),
        "decision",
    )


SQL_SPRT_STOP = f"""
WITH daily AS (
  SELECT epoch_us(ts) // {US_PER_DAY_DIV} AS day,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN CAST(round(value * 1000000.0) AS BIGINT)
                            > {AB_CONV_VALUE6}
                       THEN 1 ELSE 0 END) AS BIGINT) AS c
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1
),
llr AS (
  SELECT day,
         sum(CAST(c AS DOUBLE) * CAST('{math.log(SPRT_P1 / SPRT_P0)!r}' AS DOUBLE)
             + CAST(n - c AS DOUBLE)
               * CAST('{math.log((1.0 - SPRT_P1) / (1.0 - SPRT_P0))!r}' AS DOUBLE))
           OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS llr
  FROM daily
),
crossed AS (
  SELECT day, llr,
         CASE WHEN llr >= CAST('{math.log(19.0)!r}' AS DOUBLE)
              THEN 'accept_h1'
              WHEN llr <= -CAST('{math.log(19.0)!r}' AS DOUBLE)
              THEN 'accept_h0' END AS decision
  FROM llr
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily),
first AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (ORDER BY day) AS rn
    FROM crossed WHERE decision IS NOT NULL)
  WHERE rn = 1
)
SELECT n_days, day AS stop_day, round(llr, 6) AS llr_at_stop, decision
FROM first, nn
"""


# --------------------------------------------------------------------------
# Empirical-Bayes shrinkage (Efron & Morris 1975's batting-average
# estimator, beta-binomial method of moments): per-source English-doc
# rates shrunk toward the corpus rate with strength alpha+beta fit from
# the between-source variance. All counts exact BIGINTs; the MOM fit
# and each shrunk rate are fixed double expressions; variance of the 20
# source rates centers on the pooled mean BEFORE squaring (jackknife
# lesson).
# --------------------------------------------------------------------------
def q_eb_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents").select(
        "source", F.when(F.col("lang") == "en", 1).otherwise(0).alias("e")
    )
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("e").cast("long").alias("x"),
    ).localCheckpoint(eager=True)
    tot = per.agg(
        F.sum("n").cast("long").alias("tn"),
        F.sum("x").cast("long").alias("tx"),
        F.count(F.lit(1)).cast("long").alias("g"),
    )
    mu = F.col("tx").cast("double") / F.col("tn").cast("double")
    dev = (
        F.col("x").cast("double") / F.col("n").cast("double")
        - F.col("mu")
    )
    moments = (
        per.crossJoin(F.broadcast(tot.select("g", mu.alias("mu"))))
        .select("g", "mu", dev.alias("d"), F.col("n").cast("double").alias("nd"))
        .groupBy("g", "mu")
        .agg(
            F.sum(F.col("d") * F.col("d")).alias("sdd"),
            F.sum(F.lit(1.0) / F.col("nd")).alias("inv_n"),
        )
    )
    gd = F.col("g").cast("double")
    var_between = F.col("sdd") / gd
    # MOM: var = mu(1-mu)/(a+b+1) approx + sampling noise mu(1-mu)*avg(1/n)
    noise = F.col("mu") * (F.lit(1.0) - F.col("mu")) * F.col(
        "inv_n"
    ) / gd
    tau2 = var_between - noise
    strength = F.when(
        tau2 > 0,
        F.col("mu") * (F.lit(1.0) - F.col("mu")) / tau2 - F.lit(1.0),
    ).otherwise(F.lit(1000.0))
    params = moments.select(
        "mu", F.greatest(strength, F.lit(1.0)).alias("k")
    )
    shrunk = per.crossJoin(F.broadcast(params)).select(
        "source",
        "n",
        "x",
        F.round(
            F.col("x").cast("double") / F.col("n").cast("double"), 6
        ).alias("raw_rate"),
        F.round(
            (F.col("x").cast("double") + F.col("k") * F.col("mu"))
            / (F.col("n").cast("double") + F.col("k")),
            6,
        ).alias("shrunk_rate"),
    )
    return shrunk.orderBy("source")


SQL_EB_SHRINKAGE = """
WITH per AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
           AS x
  FROM documents GROUP BY source
),
tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS tn, CAST(sum(x) AS BIGINT) AS tx,
         CAST(count(*) AS BIGINT) AS g
  FROM per
),
mom AS (
  SELECT g, CAST(tx AS DOUBLE) / CAST(tn AS DOUBLE) AS mu,
         sum((CAST(x AS DOUBLE) / CAST(n AS DOUBLE)
              - CAST(tx AS DOUBLE) / CAST(tn AS DOUBLE))
             * (CAST(x AS DOUBLE) / CAST(n AS DOUBLE)
                - CAST(tx AS DOUBLE) / CAST(tn AS DOUBLE))) AS sdd,
         sum(1.0 / CAST(n AS DOUBLE)) AS inv_n
  FROM per, tot
  GROUP BY g, CAST(tx AS DOUBLE) / CAST(tn AS DOUBLE)
),
params AS (
  SELECT mu,
         greatest(CASE WHEN sdd / CAST(g AS DOUBLE)
                            - mu * (1.0 - mu) * inv_n / CAST(g AS DOUBLE)
                            > 0
                       THEN mu * (1.0 - mu)
                            / (sdd / CAST(g AS DOUBLE)
                               - mu * (1.0 - mu) * inv_n
                                 / CAST(g AS DOUBLE)) - 1.0
                       ELSE 1000.0 END, 1.0) AS k
  FROM mom
)
SELECT source, n, x,
       round(CAST(x AS DOUBLE) / CAST(n AS DOUBLE), 6) AS raw_rate,
       round((CAST(x AS DOUBLE) + k * mu) / (CAST(n AS DOUBLE) + k), 6)
         AS shrunk_rate
FROM per, params
ORDER BY source
"""


# --------------------------------------------------------------------------
# Neyman optimal allocation (Neyman 1934 — the allocation-DESIGN half;
# the quota/stratified pairs cover selection): distribute a 100-doc
# sample across sources proportional to N_h * S_h (stratum size times
# within-stratum sd of doc length), vs plain proportional allocation.
# Stratum moments from exact integer (n, sum, sum-of-squares) triples;
# the allocation shares are ratios.
# --------------------------------------------------------------------------
def q_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents").select(
        "source", F.col("n_chars").cast("long").alias("x")
    )
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("nh"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("ss"),
    )
    nd = F.col("nh").cast("double")
    mean = F.col("s").cast("double") / nd
    var = (F.col("ss").cast("double") - nd * mean * mean) / (
        nd - F.lit(1.0)
    )
    w = per.select(
        "source", "nh", (nd * F.sqrt(var)).alias("nsh")
    )
    tot = w.agg(
        F.sum("nh").cast("long").alias("tn"),
        F.sum("nsh").alias("tnsh"),
    )
    return (
        w.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "nh",
            F.round(
                F.lit(100.0)
                * F.col("nh").cast("double")
                / F.col("tn").cast("double"),
                6,
            ).alias("proportional_n"),
            F.round(
                F.lit(100.0) * F.col("nsh") / F.col("tnsh"), 6
            ).alias("neyman_n"),
        )
        .orderBy("source")
    )


SQL_NEYMAN_ALLOCATION = """
WITH per AS (
  SELECT source, CAST(count(*) AS BIGINT) AS nh,
         CAST(sum(n_chars) AS BIGINT) AS s,
         CAST(sum(n_chars * n_chars) AS BIGINT) AS ss
  FROM documents GROUP BY source
),
w AS (
  SELECT source, nh,
         CAST(nh AS DOUBLE)
           * sqrt((CAST(ss AS DOUBLE)
                   - CAST(nh AS DOUBLE)
                     * (CAST(s AS DOUBLE) / CAST(nh AS DOUBLE))
                     * (CAST(s AS DOUBLE) / CAST(nh AS DOUBLE)))
                  / (CAST(nh AS DOUBLE) - 1.0)) AS nsh
  FROM per
),
tot AS (SELECT CAST(sum(nh) AS BIGINT) AS tn, sum(nsh) AS tnsh FROM w)
SELECT source, nh,
       round(100.0 * CAST(nh AS DOUBLE) / CAST(tn AS DOUBLE), 6)
         AS proportional_n,
       round(100.0 * nsh / tnsh, 6) AS neyman_n
FROM w, tot
ORDER BY source
"""


# --------------------------------------------------------------------------
# Kish effective sample size (Kish 1965 — the design-effect diagnostic
# run before trusting any weighted estimate): ESS = (Σw)²/Σw² over
# per-doc token-count weights. Weights are exact BIGINTs, so both sums
# are exact; ESS and the efficiency ratio are single double
# expressions.
# --------------------------------------------------------------------------
def q_kish_ess(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents").select(
        F.size(
            F.expr(f"regexp_extract_all(lower(text), '{TOKEN_RUN}', 0)")
        )
        .cast("long")
        .alias("w")
    )
    agg = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("w").cast("long").alias("sw"),
        F.sum(F.col("w") * F.col("w")).cast("long").alias("sww"),
    )
    ess = (
        F.col("sw").cast("double")
        * F.col("sw").cast("double")
        / F.col("sww").cast("double")
    )
    return agg.select(
        "n",
        "sw",
        F.round(ess, 6).alias("ess"),
        F.round(ess / F.col("n").cast("double"), 6).alias("efficiency"),
    )


SQL_KISH_ESS = f"""
WITH docs AS (
  SELECT CAST(len(regexp_extract_all(lower(text), '{TOKEN_RUN}'))
              AS BIGINT) AS w
  FROM documents
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(w) AS BIGINT) AS sw,
         CAST(sum(w * w) AS BIGINT) AS sww
  FROM docs
)
SELECT n, sw,
       round(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)
             / CAST(sww AS DOUBLE), 6) AS ess,
       round(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)
             / CAST(sww AS DOUBLE) / CAST(n AS DOUBLE), 6) AS efficiency
FROM agg
"""


# --------------------------------------------------------------------------
# Log-rank test (Mantel 1966) between the two md5 user cohorts over the
# churn life table — the two-group comparison completing the survival
# family (churn_hazard describes, rmst summarizes, THIS tests): per
# lifetime bucket, observed group-1 churns vs the hypergeometric
# expectation d*n1/n with variance d(n-d)n1*n0/(n²(n-1)); all counts are
# exact BIGINTs per bounded bucket, and the z-score sums bounded per-
# bucket terms.
# --------------------------------------------------------------------------
def q_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    us = events.select("user_id", ntz_epoch_us(F.col("ts")).alias("us"))
    end = us.agg(F.max("us").cast("long").alias("_end"))
    grp = F.expr(
        "CAST(conv(substring(md5(cast(user_id as string)), 1, 1), 16, 10)"
        " AS INT) % 2"
    )
    users = (
        us.groupBy("user_id")
        .agg(
            F.min("us").cast("long").alias("first_us"),
            F.max("us").cast("long").alias("last_us"),
        )
        .crossJoin(F.broadcast(end))
        .select(
            grp.alias("g"),
            F.expr(f"(last_us - first_us) div {LIFE_BUCKET_US}").alias(
                "lw"
            ),
            F.when(
                F.col("_end") - F.col("last_us") > CHURN_GAP_US, F.lit(1)
            )
            .otherwise(F.lit(0))
            .alias("churned"),
        )
    )
    hist = users.groupBy("lw").agg(
        F.count(F.lit(1)).cast("long").alias("ended"),
        F.sum("churned").cast("long").alias("d"),
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0))
        .cast("long")
        .alias("ended1"),
        F.sum(F.when((F.col("g") == 1) & (F.col("churned") == 1), 1).otherwise(0))
        .cast("long")
        .alias("d1"),
    )
    w = Window.orderBy(F.desc("lw")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = hist.select(
        "lw",
        "d",
        "d1",
        F.sum("ended").over(w).cast("long").alias("n"),
        F.sum("ended1").over(w).cast("long").alias("n1"),
    ).filter(F.col("d") > 0)
    nd = F.col("n").cast("double")
    n1d = F.col("n1").cast("double")
    dd = F.col("d").cast("double")
    e1 = dd * n1d / nd
    var = F.when(
        F.col("n") > 1,
        dd
        * (nd - dd)
        * n1d
        * (nd - n1d)
        / (nd * nd * (nd - F.lit(1.0))),
    ).otherwise(F.lit(0.0))
    agg = risk.agg(
        F.sum("d1").cast("long").alias("o1"),
        F.sum(e1).alias("e1"),
        F.sum(var).alias("v"),
    )
    return agg.select(
        "o1",
        F.round("e1", 6).alias("e1"),
        F.round("v", 6).alias("var_sum"),
        F.round(
            (F.col("o1").cast("double") - F.col("e1"))
            / F.sqrt(F.col("v")),
            6,
        ).alias("z"),
    )


SQL_LOGRANK_TEST = f"""
WITH us AS (SELECT user_id, epoch_us(ts) AS us FROM events),
ends AS (SELECT CAST(max(us) AS BIGINT) AS e FROM us),
users AS (
  SELECT ((strpos('0123456789abcdef',
            substring(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1) % 2)
           AS g,
         CAST((max(us) - min(us)) // {LIFE_BUCKET_US} AS BIGINT) AS lw,
         CASE WHEN (SELECT e FROM ends) - max(us) > {CHURN_GAP_US}
              THEN 1 ELSE 0 END AS churned
  FROM us GROUP BY user_id
),
hist AS (
  SELECT lw, CAST(count(*) AS BIGINT) AS ended,
         CAST(sum(churned) AS BIGINT) AS d,
         CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS ended1,
         CAST(sum(CASE WHEN g = 1 AND churned = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS d1
  FROM users GROUP BY lw
),
risk AS (
  SELECT lw, d, d1,
         CAST(sum(ended) OVER (ORDER BY lw DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS n,
         CAST(sum(ended1) OVER (ORDER BY lw DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS n1
  FROM hist
),
terms AS (
  SELECT d1, CAST(d AS DOUBLE) * CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE)
           AS e1,
         CASE WHEN n > 1 THEN
           CAST(d AS DOUBLE) * (CAST(n AS DOUBLE) - CAST(d AS DOUBLE))
           * CAST(n1 AS DOUBLE) * (CAST(n AS DOUBLE) - CAST(n1 AS DOUBLE))
           / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
              * (CAST(n AS DOUBLE) - 1.0))
         ELSE 0.0 END AS v
  FROM risk WHERE d > 0
),
agg AS (
  SELECT CAST(sum(d1) AS BIGINT) AS o1, sum(e1) AS e1, sum(v) AS v
  FROM terms
)
SELECT o1, round(e1, 6) AS e1, round(v, 6) AS var_sum,
       round((CAST(o1 AS DOUBLE) - e1) / sqrt(v), 6) AS z
FROM agg
"""


# --------------------------------------------------------------------------
# Iterative proportional fitting / raking (Deming & Stephan 1940), two
# full row+column cycles adjusting the source x lang table toward
# UNIFORM target margins — the survey-weighting workhorse. Each cycle
# is a bounded-relation join-and-scale executed identically on both
# engines (fixed iteration count, no convergence float compare);
# reports the max residual row-margin error and a checksum over the
# final weights.
# --------------------------------------------------------------------------
def q_ipf_raking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents").select("source", "lang")
    cells = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("o")
    ).localCheckpoint(eager=True)
    dims = cells.agg(
        F.sum("o").cast("long").alias("nn"),
    ).crossJoin(
        F.broadcast(
            cells.select("source").distinct().agg(
                F.count(F.lit(1)).cast("long").alias("nr")
            )
        )
    ).crossJoin(
        F.broadcast(
            cells.select("lang").distinct().agg(
                F.count(F.lit(1)).cast("long").alias("nc")
            )
        )
    )
    w = cells.crossJoin(F.broadcast(dims)).select(
        "source",
        "lang",
        F.col("o").cast("double").alias("w"),
        (F.col("nn").cast("double") / F.col("nr").cast("double")).alias(
            "row_target"
        ),
        (F.col("nn").cast("double") / F.col("nc").cast("double")).alias(
            "col_target"
        ),
    )
    for _ in range(2):
        rm = w.groupBy("source").agg(F.sum("w").alias("rsum"))
        w = (
            w.join(F.broadcast(rm), "source")
            .select(
                "source",
                "lang",
                (F.col("w") * F.col("row_target") / F.col("rsum")).alias(
                    "w"
                ),
                "row_target",
                "col_target",
            )
        )
        cm = w.groupBy("lang").agg(F.sum("w").alias("csum"))
        w = (
            w.join(F.broadcast(cm), "lang")
            .select(
                "source",
                "lang",
                (F.col("w") * F.col("col_target") / F.col("csum")).alias(
                    "w"
                ),
                "row_target",
                "col_target",
            )
        )
    final_rm = w.groupBy("source", "row_target").agg(
        F.sum("w").alias("rsum")
    )
    return (
        final_rm.agg(
            F.round(
                F.max(F.abs(F.col("rsum") - F.col("row_target"))), 6
            ).alias("max_row_error")
        )
        .crossJoin(
            F.broadcast(
                w.agg(
                    F.count(F.lit(1)).cast("long").alias("n_cells"),
                    F.round(F.sum(F.col("w") * F.col("w")), 6).alias(
                        "weight_sq_sum"
                    ),
                )
            )
        )
        .select("n_cells", "max_row_error", "weight_sq_sum")
    )


SQL_IPF_RAKING = """
WITH cells AS (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS o
  FROM documents GROUP BY source, lang
),
dims AS (
  SELECT CAST(sum(o) AS BIGINT) AS nn,
         CAST(count(DISTINCT source) AS BIGINT) AS nr,
         CAST(count(DISTINCT lang) AS BIGINT) AS nc
  FROM cells
),
w0 AS (
  SELECT source, lang, CAST(o AS DOUBLE) AS w,
         CAST(nn AS DOUBLE) / CAST(nr AS DOUBLE) AS row_target,
         CAST(nn AS DOUBLE) / CAST(nc AS DOUBLE) AS col_target
  FROM cells, dims
),
r1 AS (
  SELECT w0.source, w0.lang,
         w0.w * w0.row_target / rm.rsum AS w, row_target, col_target
  FROM w0 JOIN (SELECT source, sum(w) AS rsum FROM w0 GROUP BY source) rm
    USING (source)
),
c1 AS (
  SELECT r1.source, r1.lang,
         r1.w * r1.col_target / cm.csum AS w, row_target, col_target
  FROM r1 JOIN (SELECT lang, sum(w) AS csum FROM r1 GROUP BY lang) cm
    USING (lang)
),
r2 AS (
  SELECT c1.source, c1.lang,
         c1.w * c1.row_target / rm.rsum AS w, row_target, col_target
  FROM c1 JOIN (SELECT source, sum(w) AS rsum FROM c1 GROUP BY source) rm
    USING (source)
),
c2 AS (
  SELECT r2.source, r2.lang,
         r2.w * r2.col_target / cm.csum AS w, row_target, col_target
  FROM r2 JOIN (SELECT lang, sum(w) AS csum FROM r2 GROUP BY lang) cm
    USING (lang)
),
final_rm AS (
  SELECT source, row_target, sum(w) AS rsum FROM c2
  GROUP BY source, row_target
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM c2) AS n_cells,
       round(max(abs(rsum - row_target)), 6) AS max_row_error,
       (SELECT round(sum(w * w), 6) FROM c2) AS weight_sq_sum
FROM final_rm
"""


# --------------------------------------------------------------------------
# CUPED variance reduction (Deng, Xu, Kohavi & Walker 2013 — the
# experimentation-platform standard): adjust each user's post-period
# conversion by theta * (pre-period activity - mean), theta = cov/var
# from the pooled pre-period, and report how much variance the
# adjustment removes from the treatment-effect estimate. Pre/post split
# at the exact midpoint; all sufficient statistics are sums of exact
# integers (counts) and their products.
# --------------------------------------------------------------------------
def q_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    ev = events.select(
        "user_id",
        F.floor(ntz_epoch_us(F.col("ts")) / F.lit(US_PER_DAY_DIV))
        .cast("long")
        .alias("day"),
        F.when(
            (F.col("event_type") == "purchase")
            & (fixed6_long(F.col("value")) > AB_CONV_VALUE6),
            1,
        )
        .otherwise(0)
        .alias("big"),
    )
    rng = ev.agg(
        ((F.min("day") + F.max("day")) / 2).cast("long").alias("mid")
    )
    users = (
        ev.crossJoin(F.broadcast(rng))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("day") <= F.col("mid"), 1).otherwise(0))
            .cast("long")
            .alias("x"),
            F.max(
                F.when(
                    (F.col("day") > F.col("mid")) & (F.col("big") == 1), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("y"),
        )
    ).localCheckpoint(eager=True)
    agg = users.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    nd = F.col("n").cast("double")
    mx = F.col("sx").cast("double") / nd
    my = F.col("sy").cast("double") / nd
    var_x = F.col("sxx").cast("double") / nd - mx * mx
    var_y = F.col("syy").cast("double") / nd - my * my
    cov = F.col("sxy").cast("double") / nd - mx * my
    theta = cov / var_x
    var_adj = var_y - cov * cov / var_x
    return agg.select(
        "n",
        F.round(theta, 6).alias("theta"),
        F.round(var_y, 6).alias("var_raw"),
        F.round(var_adj, 6).alias("var_cuped"),
        F.round(F.lit(1.0) - var_adj / var_y, 6).alias(
            "variance_reduction"
        ),
    )


SQL_CUPED_ADJUSTMENT = f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) // {US_PER_DAY_DIV} AS day,
         CASE WHEN event_type = 'purchase'
                   AND CAST(round(value * 1000000.0) AS BIGINT)
                       > {AB_CONV_VALUE6}
              THEN 1 ELSE 0 END AS big
  FROM events
),
rng AS (SELECT (min(day) + max(day)) // 2 AS mid FROM ev),
users AS (
  SELECT user_id,
         CAST(sum(CASE WHEN day <= mid THEN 1 ELSE 0 END) AS BIGINT)
           AS x,
         CAST(max(CASE WHEN day > mid AND big = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS y
  FROM ev, rng GROUP BY user_id
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM users
)
SELECT n,
       round((CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE)
              - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))
             / (CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
                - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                  * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))), 6)
         AS theta,
       round(CAST(syy AS DOUBLE) / CAST(n AS DOUBLE)
             - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
               * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS var_raw,
       round(CAST(syy AS DOUBLE) / CAST(n AS DOUBLE)
             - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
               * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
             - (CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE)
                - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                  * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))
               * (CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE)
                  - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))
               / (CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
                  - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))), 6)
         AS var_cuped,
       round(1.0
             - (CAST(syy AS DOUBLE) / CAST(n AS DOUBLE)
                - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                  * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                - (CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE)
                   - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                     * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))
                  * (CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE)
                     - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                       * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))
                  / (CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
                     - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                       * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))))
               / (CAST(syy AS DOUBLE) / CAST(n AS DOUBLE)
                  - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))), 6)
         AS variance_reduction
FROM agg
"""


# --------------------------------------------------------------------------
# Inverse-propensity-weighted treatment effect (Horvitz-Thompson 1952 /
# Rosenbaum-Rubin 1983) — the design-based causal estimator completing
# diff_in_diff and cuped_adjustment: a synthetic promo "treatment" is
# assigned by an md5 coin whose propensity DEPENDS ON SEGMENT (0.7 for
# BUILDING customers, 0.3 otherwise — confounding by construction), the
# outcome is total customer spend, and the IPW estimate reweights by the
# known design propensities. The rational weights 1/0.7 and 1/0.3 ride
# as the integer numerators 30/70 over the common denominator 21, so
# every accumulated sum is an exact BIGINT over exact cents; the two
# ATEs are single double expressions, rounded 6 (dollars).
# --------------------------------------------------------------------------
def q_ipw_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _read(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    orders = _read(spark, sf_dir, "orders").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * F.lit(100.0), 0)
        .cast("long")
        .alias("cents"),
    )
    spend = orders.groupBy("o_custkey").agg(
        F.sum("cents").cast("long").alias("y")
    )
    coin = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("ipw:"), F.col("c_custkey").cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 10
    )
    hi = F.col("c_mktsegment") == "BUILDING"
    t = F.when(hi, (coin < 7).cast("int")).otherwise(
        (coin < 3).cast("int")
    )
    # treated weight numerator 21/e; control weight numerator 21/(1-e)
    kt = F.when(hi, F.lit(30)).otherwise(F.lit(70)).cast("long")
    kc = F.when(hi, F.lit(70)).otherwise(F.lit(30)).cast("long")
    base = (
        cust.join(spend, cust["c_custkey"] == spend["o_custkey"], "left")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.coalesce("y", F.lit(0)).cast("long").alias("y"),
        )
        .select(
            t.alias("t"),
            "y",
            kt.alias("kt"),
            kc.alias("kc"),
        )
    )
    agg = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("t").cast("long").alias("n_treated"),
        F.sum(F.col("t") * F.col("y")).cast("long").alias("s1"),
        F.sum((1 - F.col("t")) * F.col("y")).cast("long").alias("s0"),
        F.sum(F.col("t") * F.col("y") * F.col("kt"))
        .cast("long")
        .alias("swt"),
        F.sum((1 - F.col("t")) * F.col("y") * F.col("kc"))
        .cast("long")
        .alias("swc"),
    )
    nd = F.col("n").cast("double")
    n1 = F.col("n_treated").cast("double")
    n0 = (F.col("n") - F.col("n_treated")).cast("double")
    naive = (
        F.col("s1").cast("double") / n1 - F.col("s0").cast("double") / n0
    ) / F.lit(100.0)
    ipw = (
        (F.col("swt").cast("double") - F.col("swc").cast("double"))
        / (F.lit(21.0) * nd)
        / F.lit(100.0)
    )
    return agg.select(
        "n",
        "n_treated",
        F.round(n1 / nd, 6).alias("p_treated"),
        F.round(naive, 6).alias("naive_ate"),
        F.round(ipw, 6).alias("ipw_ate"),
    )


SQL_IPW_ESTIMATE = """
WITH spend AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
           AS y
  FROM orders GROUP BY o_custkey
),
base AS (
  SELECT CASE WHEN c.c_mktsegment = 'BUILDING'
              THEN CASE WHEN CAST('0x' || substr(md5('ipw:' ||
                     CAST(c.c_custkey AS VARCHAR)), 1, 8) AS BIGINT) % 10 < 7
                   THEN 1 ELSE 0 END
              ELSE CASE WHEN CAST('0x' || substr(md5('ipw:' ||
                     CAST(c.c_custkey AS VARCHAR)), 1, 8) AS BIGINT) % 10 < 3
                   THEN 1 ELSE 0 END END AS t,
         CAST(COALESCE(s.y, 0) AS BIGINT) AS y,
         CAST(CASE WHEN c.c_mktsegment = 'BUILDING' THEN 30 ELSE 70 END
              AS BIGINT) AS kt,
         CAST(CASE WHEN c.c_mktsegment = 'BUILDING' THEN 70 ELSE 30 END
              AS BIGINT) AS kc
  FROM customer c LEFT JOIN spend s ON s.o_custkey = c.c_custkey
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(t) AS BIGINT) AS n_treated,
         CAST(sum(t * y) AS BIGINT) AS s1,
         CAST(sum((1 - t) * y) AS BIGINT) AS s0,
         CAST(sum(t * y * kt) AS BIGINT) AS swt,
         CAST(sum((1 - t) * y * kc) AS BIGINT) AS swc
  FROM base
)
SELECT n, n_treated,
       round(CAST(n_treated AS DOUBLE) / CAST(n AS DOUBLE), 6) AS p_treated,
       round((CAST(s1 AS DOUBLE) / CAST(n_treated AS DOUBLE)
              - CAST(s0 AS DOUBLE) / CAST(n - n_treated AS DOUBLE))
             / 100.0, 6) AS naive_ate,
       round((CAST(swt AS DOUBLE) - CAST(swc AS DOUBLE))
             / (21.0 * CAST(n AS DOUBLE)) / 100.0, 6) AS ipw_ate
FROM agg
"""


# --------------------------------------------------------------------------
# Doubly-robust causal estimates on the ipw_estimate design (same
# md5-coin treatment, segment-confounded propensities 0.7/0.3): the
# g-formula (stratified outcome-model) ATE sum_g n_g*(m1_g - m0_g)/n
# and the AIPW estimator combining the GLOBAL outcome means with the
# design-propensity corrections (Robins/Rotnitzky/Zhao 1994). Every
# accumulated quantity is an exact BIGINT (cents, counts, and the
# 30/70-over-21 rational weights); empty strata contribute 0 via a
# guard spelled identically on both sides; the estimator combinations
# are single double expressions, rounded 6 (dollars).
# --------------------------------------------------------------------------
def q_aipw_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _read(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    orders = _read(spark, sf_dir, "orders").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * F.lit(100.0), 0)
        .cast("long")
        .alias("cents"),
    )
    spend = orders.groupBy("o_custkey").agg(
        F.sum("cents").cast("long").alias("y")
    )
    coin = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("ipw:"), F.col("c_custkey").cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 10
    )
    hi = F.col("c_mktsegment") == "BUILDING"
    t = F.when(hi, (coin < 7).cast("int")).otherwise(
        (coin < 3).cast("int")
    )
    kt = F.when(hi, F.lit(30)).otherwise(F.lit(70)).cast("long")
    kc = F.when(hi, F.lit(70)).otherwise(F.lit(30)).cast("long")
    base = (
        cust.join(spend, cust["c_custkey"] == spend["o_custkey"], "left")
        .select(
            "c_mktsegment",
            t.alias("t"),
            F.coalesce("y", F.lit(0)).cast("long").alias("y"),
            kt.alias("kt"),
            kc.alias("kc"),
        )
        .localCheckpoint(eager=True)
    )
    seg = base.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("ng"),
        F.sum("t").cast("long").alias("n1g"),
        F.sum(F.col("t") * F.col("y")).cast("long").alias("s1g"),
        F.sum((1 - F.col("t")) * F.col("y")).cast("long").alias("s0g"),
    )
    m1g = F.col("s1g").cast("double") / F.col("n1g").cast("double")
    m0g = F.col("s0g").cast("double") / (
        F.col("ng") - F.col("n1g")
    ).cast("double")
    # each of the (≤5) segment contributions is rounded to a fixed6
    # BIGINT BEFORE the sum, so the aggregate is order-independent
    # exact integer addition (invariant 4) — not an unordered double SUM
    strat_num = seg.select(
        F.when(
            (F.col("n1g") > 0) & (F.col("ng") - F.col("n1g") > 0),
            F.round(
                F.col("ng").cast("double") * (m1g - m0g) * F.lit(1000000.0),
                0,
            ).cast("long"),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("contrib6"),
        "ng",
    ).agg(
        F.sum("contrib6").cast("long").alias("snum6"),
        F.sum("ng").cast("long").alias("n"),
    )
    glob = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("t").cast("long").alias("n1"),
        F.sum(F.col("t") * F.col("y")).cast("long").alias("s1"),
        F.sum((1 - F.col("t")) * F.col("y")).cast("long").alias("s0"),
        F.sum(F.col("t") * F.col("y") * F.col("kt"))
        .cast("long")
        .alias("swt"),
        F.sum((1 - F.col("t")) * F.col("y") * F.col("kc"))
        .cast("long")
        .alias("swc"),
        F.sum(F.col("t") * F.col("kt")).cast("long").alias("cwt"),
        F.sum((1 - F.col("t")) * F.col("kc")).cast("long").alias("cwc"),
    )
    nd = F.col("n").cast("double")
    m1 = F.col("s1").cast("double") / F.col("n1").cast("double")
    m0 = F.col("s0").cast("double") / (
        F.col("n") - F.col("n1")
    ).cast("double")
    corr = (
        F.col("swt").cast("double")
        - m1 * F.col("cwt").cast("double")
        - F.col("swc").cast("double")
        + m0 * F.col("cwc").cast("double")
    ) / (F.lit(21.0) * nd)
    return (
        glob.crossJoin(F.broadcast(strat_num.select("snum6")))
        .select(
            "n",
            F.round(m1 / F.lit(100.0), 6).alias("mean_treated"),
            F.round(m0 / F.lit(100.0), 6).alias("mean_control"),
            F.round(
                F.col("snum6").cast("double")
                / F.lit(1000000.0)
                / nd
                / F.lit(100.0),
                6,
            ).alias("gformula_ate"),
            F.round((m1 - m0 + corr) / F.lit(100.0), 6).alias("aipw_ate"),
        )
    )


SQL_AIPW_ESTIMATE = """
WITH spend AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
           AS y
  FROM orders GROUP BY o_custkey
),
base AS (
  SELECT c.c_mktsegment,
         CASE WHEN c.c_mktsegment = 'BUILDING'
              THEN CASE WHEN CAST('0x' || substr(md5('ipw:' ||
                     CAST(c.c_custkey AS VARCHAR)), 1, 8) AS BIGINT) % 10 < 7
                   THEN 1 ELSE 0 END
              ELSE CASE WHEN CAST('0x' || substr(md5('ipw:' ||
                     CAST(c.c_custkey AS VARCHAR)), 1, 8) AS BIGINT) % 10 < 3
                   THEN 1 ELSE 0 END END AS t,
         CAST(COALESCE(s.y, 0) AS BIGINT) AS y,
         CAST(CASE WHEN c.c_mktsegment = 'BUILDING' THEN 30 ELSE 70 END
              AS BIGINT) AS kt,
         CAST(CASE WHEN c.c_mktsegment = 'BUILDING' THEN 70 ELSE 30 END
              AS BIGINT) AS kc
  FROM customer c LEFT JOIN spend s ON s.o_custkey = c.c_custkey
),
seg AS (
  SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS ng,
         CAST(sum(t) AS BIGINT) AS n1g,
         CAST(sum(t * y) AS BIGINT) AS s1g,
         CAST(sum((1 - t) * y) AS BIGINT) AS s0g
  FROM base GROUP BY c_mktsegment
),
strat AS (
  SELECT CAST(sum(CAST(round(CASE WHEN n1g > 0 AND ng - n1g > 0
                  THEN CAST(ng AS DOUBLE)
                       * (CAST(s1g AS DOUBLE) / CAST(n1g AS DOUBLE)
                          - CAST(s0g AS DOUBLE)
                            / CAST(ng - n1g AS DOUBLE))
                  ELSE 0.0 END * 1000000.0) AS BIGINT)) AS BIGINT) AS snum6
  FROM seg
),
g_all AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(t) AS BIGINT) AS n1,
         CAST(sum(t * y) AS BIGINT) AS s1,
         CAST(sum((1 - t) * y) AS BIGINT) AS s0,
         CAST(sum(t * y * kt) AS BIGINT) AS swt,
         CAST(sum((1 - t) * y * kc) AS BIGINT) AS swc,
         CAST(sum(t * kt) AS BIGINT) AS cwt,
         CAST(sum((1 - t) * kc) AS BIGINT) AS cwc
  FROM base
)
SELECT n,
       round(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 100.0, 6)
         AS mean_treated,
       round(CAST(s0 AS DOUBLE) / CAST(n - n1 AS DOUBLE) / 100.0, 6)
         AS mean_control,
       round(CAST(snum6 AS DOUBLE) / 1000000.0 / CAST(n AS DOUBLE)
             / 100.0, 6) AS gformula_ate,
       round((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
              - CAST(s0 AS DOUBLE) / CAST(n - n1 AS DOUBLE)
              + (CAST(swt AS DOUBLE)
                 - (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                   * CAST(cwt AS DOUBLE)
                 - CAST(swc AS DOUBLE)
                 + (CAST(s0 AS DOUBLE) / CAST(n - n1 AS DOUBLE))
                   * CAST(cwc AS DOUBLE))
                / (21.0 * CAST(n AS DOUBLE))) / 100.0, 6) AS aipw_ate
FROM g_all, strat
"""


QUERIES = {
    "ab_test_z": q_ab_test_z,
    "aipw_estimate": q_aipw_estimate,
    "bh_fdr": q_bh_fdr,
    "calibration_ece": q_calibration_ece,
    "cuped_adjustment": q_cuped_adjustment,
    "decision_stump": q_decision_stump,
    "diff_in_diff": q_diff_in_diff,
    "eb_shrinkage": q_eb_shrinkage,
    "gains_table": q_gains_table,
    "ipf_raking": q_ipf_raking,
    "ipw_estimate": q_ipw_estimate,
    "k_anonymity": q_k_anonymity,
    "kish_ess": q_kish_ess,
    "l_diversity": q_l_diversity,
    "logistic_step": q_logistic_step,
    "logrank_test": q_logrank_test,
    "mase_backtest": q_mase_backtest,
    "neyman_allocation": q_neyman_allocation,
    "power_analysis": q_power_analysis,
    "ranking_auc": q_ranking_auc,
    "rmst": q_rmst,
    "shapley_attribution": q_shapley_attribution,
    "sprt_stop": q_sprt_stop,
    "ucb_scores": q_ucb_scores,
}

ORACLES = {
    "ab_test_z": SQL_AB_TEST_Z,
    "aipw_estimate": SQL_AIPW_ESTIMATE,
    "bh_fdr": SQL_BH_FDR,
    "calibration_ece": SQL_CALIBRATION_ECE,
    "cuped_adjustment": SQL_CUPED_ADJUSTMENT,
    "decision_stump": SQL_DECISION_STUMP,
    "diff_in_diff": SQL_DIFF_IN_DIFF,
    "eb_shrinkage": SQL_EB_SHRINKAGE,
    "gains_table": SQL_GAINS_TABLE,
    "ipf_raking": SQL_IPF_RAKING,
    "ipw_estimate": SQL_IPW_ESTIMATE,
    "k_anonymity": SQL_K_ANONYMITY,
    "kish_ess": SQL_KISH_ESS,
    "l_diversity": SQL_L_DIVERSITY,
    "logistic_step": SQL_LOGISTIC_STEP,
    "logrank_test": SQL_LOGRANK_TEST,
    "mase_backtest": SQL_MASE_BACKTEST,
    "neyman_allocation": SQL_NEYMAN_ALLOCATION,
    "power_analysis": SQL_POWER_ANALYSIS,
    "ranking_auc": SQL_RANKING_AUC,
    "rmst": SQL_RMST,
    "shapley_attribution": SQL_SHAPLEY_ATTRIBUTION,
    "sprt_stop": SQL_SPRT_STOP,
    "ucb_scores": SQL_UCB_SCORES,
}
