"""TPC-H-style business analytics pairs over orders/lineitem/customer/part.

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
    CHURN_GAP_US,
    LIFE_BUCKET_US,
    US_PER_DAY_DIV,
    US_PER_MINUTE_DIV,
    _read,
)

# --------------------------------------------------------------------------
# Relational analytics over the TPC-H-ish tables (beyond-reference breadth:
# the classic warehouse shapes — scan+agg, selective 3-way join top-k,
# star-schema multi-join — over the driver's orders/lineitem star).
# Timestamp columns are TIMESTAMP_NTZ; every date predicate compares the
# NTZ column against an NTZ literal (wall-clock, session-tz-invariant —
# invariant 3 — and still pushes down to the parquet scan, unlike wrapping
# the column in to_date()). Money aggregates quantize each row's product
# ONCE to integer micros and sum BIGINTs (sum_fixed6 / fixed6_long —
# invariant 4); top-k ranking orders by the exact BIGINT micros sum with a
# unique-key tiebreak, so no float comparison can ever flip a rank.
# Multiplier literals are INTEGER (1 - l_discount, 1 + l_tax) — a bare
# 1.0 in the oracle would route through DuckDB DECIMAL (the float-literal
# trap). Dates in output travel as 'YYYY-MM-DD' strings (date objects
# serialize differently through pandas across the two engines).
# --------------------------------------------------------------------------
TPCH_Q1_CUTOFF = "2001-08-06 00:00:00"  # max shipdate 2001-11-04 minus 90d
TPCH_Q3_SEGMENT = "BUILDING"
TPCH_Q3_DATE = "1998-01-01 00:00:00"
TPCH_Q5_REGION = "ASIA"
TPCH_Q5_START = "1996-01-01 00:00:00"
TPCH_Q5_END = "1999-01-01 00:00:00"

_SQL_DISC_PRICE = "l_extendedprice * (1 - l_discount)"


def _disc_price() -> F.Column:
    # built lazily: Column construction needs an active SparkContext
    return F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))


def _ntz(lit: str) -> F.Column:
    return F.lit(lit).cast("timestamp_ntz")


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem")
    charge = _disc_price() * (F.lit(1) + F.col("l_tax"))
    cnt = F.count(F.lit(1))

    def avg6(col) -> F.Column:
        return F.round(
            (F.sum(fixed6_long(col)).cast("double") / F.lit(1000000.0)) / cnt, 6
        )

    return (
        li.filter(F.col("l_shipdate") <= _ntz(TPCH_Q1_CUTOFF))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            sum_fixed6(F.col("l_quantity"), "sum_qty"),
            sum_fixed6(F.col("l_extendedprice"), "sum_base_price"),
            sum_fixed6(_disc_price(), "sum_disc_price"),
            sum_fixed6(charge, "sum_charge"),
            avg6(F.col("l_quantity")).alias("avg_qty"),
            avg6(F.col("l_extendedprice")).alias("avg_price"),
            avg6(F.col("l_discount")).alias("avg_disc"),
            cnt.cast("long").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_SQL_AVG6 = (
    "round((CAST(sum(CAST(round({col} * 1000000.0) AS BIGINT)) AS DOUBLE)"
    " / 1000000.0) / count(*), 6)"
)

SQL_PRICING_SUMMARY = f"""
SELECT l_returnflag, l_linestatus,
       {SQL_SUM_FIXED6.format(col="l_quantity")} AS sum_qty,
       {SQL_SUM_FIXED6.format(col="l_extendedprice")} AS sum_base_price,
       {SQL_SUM_FIXED6.format(col=_SQL_DISC_PRICE)} AS sum_disc_price,
       {SQL_SUM_FIXED6.format(col=_SQL_DISC_PRICE + " * (1 + l_tax)")} AS sum_charge,
       {_SQL_AVG6.format(col="l_quantity")} AS avg_qty,
       {_SQL_AVG6.format(col="l_extendedprice")} AS avg_price,
       {_SQL_AVG6.format(col="l_discount")} AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{TPCH_Q1_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        _read(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == TPCH_Q3_SEGMENT)
        .select("c_custkey")
    )
    orders = (
        _read(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < _ntz(TPCH_Q3_DATE))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        _read(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > _ntz(TPCH_Q3_DATE))
        .select("l_orderkey", fixed6_long(_disc_price()).alias("d6"))
    )
    g = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum("d6").cast("long").alias("rev6"))
    )
    return (
        g.orderBy(F.desc("rev6"), F.asc("l_orderkey"))
        .limit(10)
        .select(
            F.col("l_orderkey").alias("order_key"),
            F.round(F.col("rev6") / F.lit(1000000.0), 6).alias("revenue"),
            F.to_date("o_orderdate").cast("string").alias("order_date"),
            F.col("o_orderpriority").alias("order_priority"),
        )
    )


SQL_SHIP_PRIORITY = f"""
WITH g AS (
  SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
         CAST(sum(CAST(round({_SQL_DISC_PRICE.replace("l_", "l.l_")}
                             * 1000000.0) AS BIGINT)) AS BIGINT) AS rev6
  FROM customer c
  JOIN orders o ON o.o_custkey = c.c_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE c.c_mktsegment = '{TPCH_Q3_SEGMENT}'
    AND o.o_orderdate < TIMESTAMP '{TPCH_Q3_DATE}'
    AND l.l_shipdate > TIMESTAMP '{TPCH_Q3_DATE}'
  GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
)
SELECT l_orderkey AS order_key,
       round(rev6 / 1000000.0, 6) AS revenue,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date,
       o_orderpriority AS order_priority
FROM g
ORDER BY rev6 DESC, l_orderkey ASC
LIMIT 10
"""


def q_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", fixed6_long(_disc_price()).alias("d6")
    )
    orders = (
        _read(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= _ntz(TPCH_Q5_START))
            & (F.col("o_orderdate") < _ntz(TPCH_Q5_END))
        )
        .select("o_orderkey", "o_custkey")
    )
    cust = _read(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = _read(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _read(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = (
        _read(spark, sf_dir, "region")
        .filter(F.col("r_name") == TPCH_Q5_REGION)
        .select("r_regionkey")
    )
    j = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(
            supp,
            (li["l_suppkey"] == supp["s_suppkey"])
            & (supp["s_nationkey"] == cust["c_nationkey"]),
        )
        .join(nation, nation["n_nationkey"] == cust["c_nationkey"])
        .join(region, nation["n_regionkey"] == region["r_regionkey"])
    )
    g = j.groupBy("n_name").agg(
        F.sum("d6").cast("long").alias("rev6"),
        F.count(F.lit(1)).cast("long").alias("n_items"),
    )
    return g.select(
        F.col("n_name").alias("nation"),
        F.round(F.col("rev6") / F.lit(1000000.0), 6).alias("revenue"),
        "n_items",
    ).orderBy(F.desc("rev6"), F.asc("n_name"))


SQL_NATION_REVENUE = f"""
WITH g AS (
  SELECT n.n_name,
         CAST(sum(CAST(round({_SQL_DISC_PRICE.replace("l_", "l.l_")}
                             * 1000000.0) AS BIGINT)) AS BIGINT) AS rev6,
         CAST(count(*) AS BIGINT) AS n_items
  FROM customer c
  JOIN orders o ON o.o_custkey = c.c_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
                 AND s.s_nationkey = c.c_nationkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = '{TPCH_Q5_REGION}'
    AND o.o_orderdate >= TIMESTAMP '{TPCH_Q5_START}'
    AND o.o_orderdate < TIMESTAMP '{TPCH_Q5_END}'
  GROUP BY n.n_name
)
SELECT n_name AS nation,
       round(rev6 / 1000000.0, 6) AS revenue,
       n_items
FROM g
ORDER BY rev6 DESC, n_name ASC
"""


# TPC-H Q10 shape: top customers by revenue from RETURNED items in a
# window — fact filtered on the return flag, customer + nation dims
# broadcast, fixed6 money sums, deterministic (rev6 desc, custkey asc)
# top-20 (TakeOrderedAndProject)
TPCH_Q10_START = "1996-01-01 00:00:00"
TPCH_Q10_END = "1996-07-01 00:00:00"
TPCH_Q10_K = 20


def q_returns_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        _read(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", fixed6_long(_disc_price()).alias("d6"))
    )
    orders = (
        _read(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= _ntz(TPCH_Q10_START))
            & (F.col("o_orderdate") < _ntz(TPCH_Q10_END))
        )
        .select("o_orderkey", "o_custkey")
    )
    cust = _read(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    nation = _read(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    g = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_custkey")
        .agg(
            F.sum("d6").cast("long").alias("rev6"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
    )
    return (
        g.join(F.broadcast(cust), g["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .select(
            "c_custkey",
            "c_name",
            F.round(F.col("rev6") / F.lit(1000000.0), 6).alias("revenue"),
            "n_items",
            F.col("n_name").alias("nation"),
            "rev6",
        )
        .orderBy(F.desc("rev6"), F.asc("c_custkey"))
        .limit(TPCH_Q10_K)
        .drop("rev6")
    )


SQL_RETURNS_REPORT = f"""
WITH g AS (
  SELECT o.o_custkey,
         CAST(sum(CAST(round({_SQL_DISC_PRICE.replace("l_", "l.l_")}
                             * 1000000.0) AS BIGINT)) AS BIGINT) AS rev6,
         CAST(count(*) AS BIGINT) AS n_items
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE l.l_returnflag = 'R'
    AND o.o_orderdate >= TIMESTAMP '{TPCH_Q10_START}'
    AND o.o_orderdate < TIMESTAMP '{TPCH_Q10_END}'
  GROUP BY o.o_custkey
)
SELECT c.c_custkey, c.c_name,
       round(g.rev6 / 1000000.0, 6) AS revenue,
       g.n_items, n.n_name AS nation
FROM g
JOIN customer c ON c.c_custkey = g.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
ORDER BY g.rev6 DESC, c.c_custkey ASC
LIMIT {TPCH_Q10_K}
"""


# --------------------------------------------------------------------------
# RFM customer segmentation over orders — the classic warehouse cohorting
# (Hughes 1994): per customer Recency (days since last order vs the
# corpus max date), Frequency (order count), Monetary (fixed6 money sum),
# plus a FIXED-THRESHOLD segment label (business-rule cut — a quantile
# cut would need a corpus-wide rank; thresholds keep the whole operator
# one bounded aggregation). Invariant 3: day indexes are integer DIV on
# ntz_epoch_us; the corpus max day rides in-plan (broadcast 1-row agg).
# Invariant 4: monetary is the one rounded divide of an exact fixed6 sum.
# --------------------------------------------------------------------------
RFM_RECENT_DAYS = 180
RFM_FREQ_FLOOR = 11


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _read(spark, sf_dir, "orders")
    per_cust = (
        orders.select(
            "o_custkey",
            ntz_epoch_us(F.col("o_orderdate")).alias("_us"),
            fixed6_long(F.col("o_totalprice")).alias("m6"),
        )
        .select(
            "o_custkey",
            F.expr(f"_us DIV {US_PER_DAY_DIV}").alias("day_idx"),
            "m6",
        )
        .groupBy("o_custkey")
        .agg(
            F.max("day_idx").cast("long").alias("last_day"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.sum("m6").cast("long").alias("m6"),
        )
    )
    mx = per_cust.agg(F.max("last_day").alias("_maxd"))
    seg = (
        F.when(
            (F.col("recency_days") <= RFM_RECENT_DAYS)
            & (F.col("frequency") >= RFM_FREQ_FLOOR),
            F.lit("champion"),
        )
        .when(F.col("recency_days") <= RFM_RECENT_DAYS, F.lit("recent"))
        .when(F.col("frequency") >= RFM_FREQ_FLOOR, F.lit("loyal"))
        .otherwise(F.lit("dormant"))
    )
    return (
        per_cust.crossJoin(F.broadcast(mx))
        .select(
            F.col("o_custkey").alias("custkey"),
            (F.col("_maxd") - F.col("last_day")).cast("long").alias(
                "recency_days"
            ),
            "frequency",
            F.round(F.col("m6") / F.lit(1000000.0), 6).alias("monetary"),
        )
        .withColumn("segment", seg)
    )


SQL_RFM_SEGMENTS = f"""
WITH per_cust AS (
  SELECT o_custkey,
         CAST(max(epoch_us(o_orderdate) // {US_PER_DAY_DIV}) AS BIGINT)
           AS last_day,
         CAST(count(*) AS BIGINT) AS frequency,
         CAST(sum(CAST(round(o_totalprice * 1000000.0) AS BIGINT))
              AS BIGINT) AS m6
  FROM orders GROUP BY o_custkey
),
mx AS (SELECT max(last_day) AS maxd FROM per_cust)
SELECT p.o_custkey AS custkey,
       CAST(mx.maxd - p.last_day AS BIGINT) AS recency_days,
       p.frequency,
       round(p.m6 / 1000000.0, 6) AS monetary,
       CASE
         WHEN mx.maxd - p.last_day <= {RFM_RECENT_DAYS}
              AND p.frequency >= {RFM_FREQ_FLOOR} THEN 'champion'
         WHEN mx.maxd - p.last_day <= {RFM_RECENT_DAYS} THEN 'recent'
         WHEN p.frequency >= {RFM_FREQ_FLOOR} THEN 'loyal'
         ELSE 'dormant'
       END AS segment
FROM per_cust p, mx
"""


# --------------------------------------------------------------------------
# Market-basket association rules over order line items (Agrawal &
# Srikant 1994's support/confidence/lift, pairs only — the 2-itemset
# core of Apriori): which parts co-occur in orders beyond chance. The
# pair join fans out per ORDER by (basket size choose 2) — bounded by
# the basket, never the catalog (invariant 6, the co-citation shape);
# baskets are first made DISTINCT on the uniform (order, part) key.
# Support/confidence/lift are single expressions of exact BIGINTs
# rounded 6, the order total in-plan (invariant 4). Emitted per
# DIRECTED rule (a -> b) above the support floor.
# --------------------------------------------------------------------------
BASKET_MIN_PAIR = 3


def q_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem")
    basket = li.select("l_orderkey", "l_partkey").distinct()
    item_n = basket.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_item")
    )
    n_orders = scalar_count(
        basket.select("l_orderkey").distinct(), as_double=False
    )
    a = basket.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = basket.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") != F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pair"))
        .filter(F.col("n_pair") >= BASKET_MIN_PAIR)
    )
    na = item_n.select(F.col("l_partkey").alias("part_a"), F.col("n_item").alias("na"))
    nb = item_n.select(F.col("l_partkey").alias("part_b"), F.col("n_item").alias("nb"))
    return (
        pairs.join(F.broadcast(na), "part_a")
        .join(F.broadcast(nb), "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "n_pair",
            F.round(F.col("n_pair").cast("double") / F.col("_n"), 6).alias(
                "support"
            ),
            F.round(F.col("n_pair").cast("double") / F.col("na"), 6).alias(
                "confidence"
            ),
            F.round(
                F.col("n_pair").cast("double")
                * F.col("_n")
                / (F.col("na").cast("double") * F.col("nb")),
                6,
            ).alias("lift"),
        )
    )


SQL_MARKET_BASKET = f"""
WITH basket AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
item_n AS (
  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_item
  FROM basket GROUP BY 1
),
nn AS (
  SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n FROM basket
),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         CAST(count(*) AS BIGINT) AS n_pair
  FROM basket a JOIN basket b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey <> b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= {BASKET_MIN_PAIR}
)
SELECT p.part_a, p.part_b, p.n_pair,
       round(CAST(p.n_pair AS DOUBLE) / nn.n, 6) AS support,
       round(CAST(p.n_pair AS DOUBLE) / na.n_item, 6) AS confidence,
       round(CAST(p.n_pair AS DOUBLE) * nn.n
             / (CAST(na.n_item AS DOUBLE) * nb.n_item), 6) AS lift
FROM pairs p
JOIN item_n na ON na.l_partkey = p.part_a
JOIN item_n nb ON nb.l_partkey = p.part_b
CROSS JOIN nn
"""


# --------------------------------------------------------------------------
# Gini coefficient of orders-per-customer — the inequality/concentration
# report (is demand spread or whale-driven?). EXACT, no sort: the
# per-customer counts collapse to the BOUNDED class distribution
# (order-count value → #customers), and Gini = Σᵢⱼ mᵢmⱼ|xᵢ−xⱼ| / (2n²μ)
# folds over the classes² self-join — bounded by the max per-customer
# count squared, never the customer population (invariant 6); numerator
# and denominator are pure BIGINT products, ONE divide rounded 6
# (invariant 4). The usual rank-based Gini needs a corpus-wide sort.
# --------------------------------------------------------------------------
def q_order_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _read(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    classes = per_cust.groupBy("x").agg(
        F.count(F.lit(1)).cast("long").alias("m")
    )
    a = classes.select(F.col("x").alias("xi"), F.col("m").alias("mi"))
    b = classes.select(F.col("x").alias("xj"), F.col("m").alias("mj"))
    num = a.crossJoin(b).agg(
        F.sum(
            F.col("mi")
            * F.col("mj")
            * F.abs(F.col("xi") - F.col("xj"))
        )
        .cast("long")
        .alias("num")
    )
    tot = classes.agg(
        F.sum("m").cast("long").alias("n"),
        F.sum(F.col("m") * F.col("x")).cast("long").alias("sx"),
    )
    return tot.crossJoin(F.broadcast(num)).select(
        "n",
        F.col("sx").alias("total_orders"),
        F.when(
            F.col("sx") > 0,
            F.round(
                F.col("num").cast("double")
                / (F.lit(2.0) * F.col("n") * F.col("sx")),
                6,
            ),
        ).alias("gini"),
    )


SQL_ORDER_GINI = """
WITH per_cust AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS x FROM orders GROUP BY 1
),
classes AS (
  SELECT x, CAST(count(*) AS BIGINT) AS m FROM per_cust GROUP BY x
),
num AS (
  SELECT CAST(sum(a.m * b.m * abs(a.x - b.x)) AS BIGINT) AS num
  FROM classes a CROSS JOIN classes b
),
tot AS (
  SELECT CAST(sum(m) AS BIGINT) AS n,
         CAST(sum(m * x) AS BIGINT) AS sx
  FROM classes
)
SELECT tot.n, tot.sx AS total_orders,
       CASE WHEN tot.sx > 0 THEN
         round(CAST(num.num AS DOUBLE) / (2.0 * tot.n * tot.sx), 6)
       END AS gini
FROM tot, num
"""


# TPC-H Q15 shape: top supplier(s) by revenue inside a ship-date window.
# The reference Q15 returns EVERY supplier tied at the max; that is the
# semantics here — the max rides in-plan as a 1-row aggregate of the
# supplier-revenue relation (never a driver scalar), and the tie filter
# compares exact fixed6 BIGINTs so "equal to max" can never wobble on a
# rounded double (invariant 4).
TPCH_Q15_START = "1996-01-01 00:00:00"
TPCH_Q15_END = "1996-04-01 00:00:00"


def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        _read(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= _ntz(TPCH_Q15_START))
            & (F.col("l_shipdate") < _ntz(TPCH_Q15_END))
        )
        .select("l_suppkey", fixed6_long(_disc_price()).alias("d6"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum("d6").cast("long").alias("rev6"),
        F.count(F.lit(1)).cast("long").alias("n_items"),
    )
    mx = rev.agg(F.max("rev6").alias("_mx"))
    supp = _read(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("rev6") == F.col("_mx"))
        .join(F.broadcast(supp), rev["l_suppkey"] == supp["s_suppkey"])
        .select(
            F.col("s_suppkey").alias("suppkey"),
            "s_name",
            F.round(F.col("rev6") / F.lit(1000000.0), 6).alias("total_revenue"),
            "n_items",
        )
    )


SQL_TOP_SUPPLIER = f"""
WITH rev AS (
  SELECT l_suppkey,
         CAST(sum(CAST(round({_SQL_DISC_PRICE} * 1000000.0) AS BIGINT))
              AS BIGINT) AS rev6,
         CAST(count(*) AS BIGINT) AS n_items
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{TPCH_Q15_START}'
    AND l_shipdate < TIMESTAMP '{TPCH_Q15_END}'
  GROUP BY l_suppkey
),
mx AS (SELECT max(rev6) AS mx FROM rev)
SELECT s.s_suppkey AS suppkey, s.s_name,
       round(r.rev6 / 1000000.0, 6) AS total_revenue,
       r.n_items
FROM rev r
CROSS JOIN mx
JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.rev6 = mx.mx
"""


# TPC-H Q14 shape: promo revenue share inside a ship-date window — ONE
# pass over the filtered fact with a conditional fixed6 sum (no second
# scan for the numerator), part dim broadcast; the share is a single
# divide of exact BIGINTs rounded 6 (NULL on an empty window)
TPCH_Q14_START = "1996-01-01 00:00:00"
TPCH_Q14_END = "1996-04-01 00:00:00"


def q_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        _read(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= _ntz(TPCH_Q14_START))
            & (F.col("l_shipdate") < _ntz(TPCH_Q14_END))
        )
        .select("l_partkey", fixed6_long(_disc_price()).alias("d6"))
    )
    part = _read(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    g = j.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", F.col("d6")).otherwise(F.lit(0)))
        .cast("long")
        .alias("promo6"),
        F.sum("d6").cast("long").alias("total6"),
        F.count(F.lit(1)).cast("long").alias("n_items"),
    )
    return g.select(
        "n_items",
        F.round(F.col("promo6") / F.lit(1000000.0), 6).alias("promo_revenue"),
        F.round(F.col("total6") / F.lit(1000000.0), 6).alias("total_revenue"),
        F.when(
            F.col("total6") > 0,
            F.round(
                F.lit(100.0) * F.col("promo6").cast("double") / F.col("total6"),
                6,
            ),
        ).alias("promo_share_pct"),
    )


SQL_PROMO_SHARE = f"""
WITH g AS (
  SELECT
    CAST(sum(CASE WHEN p.p_type = 'PROMO'
                  THEN CAST(round({_SQL_DISC_PRICE.replace("l_", "l.l_")}
                                  * 1000000.0) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS promo6,
    CAST(sum(CAST(round({_SQL_DISC_PRICE.replace("l_", "l.l_")}
                        * 1000000.0) AS BIGINT)) AS BIGINT) AS total6,
    CAST(count(*) AS BIGINT) AS n_items
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE l.l_shipdate >= TIMESTAMP '{TPCH_Q14_START}'
    AND l.l_shipdate < TIMESTAMP '{TPCH_Q14_END}'
)
SELECT n_items,
       round(promo6 / 1000000.0, 6) AS promo_revenue,
       round(total6 / 1000000.0, 6) AS total_revenue,
       CASE WHEN total6 > 0 THEN
         round(100.0 * CAST(promo6 AS DOUBLE) / total6, 6)
       END AS promo_share_pct
FROM g
"""


# --------------------------------------------------------------------------
# TPC-H Q18 shape: large-volume customers. The HAVING gate compares the
# EXACT fixed6 integer quantity sum against an integer threshold (no
# float compare can flip a boundary order between engines); the gated
# orderkeys are a self-contained aggregate of the fact table, re-joined
# to orders (fact-sized, shuffle on the key) and the customer dim
# (broadcast). Order date surfaces as tz-invariant epoch-µs (invariant
# 3); top-100 by (o_totalprice desc, orderdate, orderkey) — a total
# order — via orderBy+limit (TakeOrderedAndProject).
# --------------------------------------------------------------------------
Q18_MIN_QTY6 = 250 * 1_000_000
Q18_TOP = 100


def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem").select(
        "l_orderkey", fixed6_long(F.col("l_quantity")).alias("q6")
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("q6").cast("long").alias("qty6"))
        .filter(F.col("qty6") > Q18_MIN_QTY6)
    )
    orders = _read(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice",
        ntz_epoch_us(F.col("o_orderdate")).alias("orderdate_us"),
    )
    cust = _read(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .select(
            "c_name",
            F.col("c_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            "orderdate_us",
            "o_totalprice",
            F.round(F.col("qty6") / F.lit(1000000.0), 6).alias("total_qty"),
        )
        .orderBy(
            F.desc("o_totalprice"), F.asc("orderdate_us"), F.asc("orderkey")
        )
        .limit(Q18_TOP)
    )


SQL_LARGE_ORDERS = f"""
WITH big AS (
  SELECT l_orderkey,
         CAST(sum(CAST(round(l_quantity * 1000000.0) AS BIGINT)) AS BIGINT)
           AS qty6
  FROM lineitem GROUP BY l_orderkey
  HAVING CAST(sum(CAST(round(l_quantity * 1000000.0) AS BIGINT)) AS BIGINT)
         > {Q18_MIN_QTY6}
)
SELECT c.c_name, c.c_custkey AS custkey, o.o_orderkey AS orderkey,
       epoch_us(o.o_orderdate) AS orderdate_us, o.o_totalprice,
       round(b.qty6 / CAST(1000000 AS DOUBLE), 6) AS total_qty
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY o.o_totalprice DESC, orderdate_us, orderkey
LIMIT {Q18_TOP}
"""


# --------------------------------------------------------------------------
# TPC-H Q22 shape: high-balance customers with no open orders. The
# "above the segment's positive-balance average" gate is the classic
# scalar-subquery; it is evaluated INTEGER-EXACT as bal6·n_pos > sum6
# (cross-multiplied fixed6 BIGINTs — no float average can flip a
# customer sitting on the boundary; bal6 ≤ 1e10 and n_pos at the
# segment grain keep the product far from int64 range until ~1e8
# customers per segment, where the gate would move to a per-segment
# DECIMAL average). Segment stats broadcast (5 rows); the "no open
# orders" NOT EXISTS is a left-anti join on the uniform o_custkey.
# The displayed segment average is the FLOORED micro-average
# (sum6 div n_pos — exact in both engines for positive operands), so
# no irrational double ever meets round().
# --------------------------------------------------------------------------
def q_cust_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _read(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment",
        fixed6_long(F.col("c_acctbal")).alias("bal6"),
    )
    seg = (
        cust.filter(F.col("bal6") > 0)
        .groupBy("c_mktsegment")
        .agg(
            F.sum("bal6").cast("long").alias("sum6"),
            F.count(F.lit(1)).cast("long").alias("n_pos"),
        )
    )
    open_orders = (
        _read(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select("o_custkey")
    )
    return (
        cust.join(F.broadcast(seg), "c_mktsegment")
        .filter(F.col("bal6") * F.col("n_pos") > F.col("sum6"))
        .join(
            open_orders,
            cust["c_custkey"] == open_orders["o_custkey"],
            "left_anti",
        )
        .select(
            F.col("c_custkey").alias("custkey"),
            "c_name",
            "c_mktsegment",
            F.round(F.col("bal6") / F.lit(1000000.0), 6).alias("acctbal"),
            F.round(
                F.expr("sum6 div n_pos") / F.lit(1000000.0), 6
            ).alias("seg_avg"),
        )
    )


SQL_CUST_BALANCE = """
WITH cust AS (
  SELECT c_custkey, c_name, c_mktsegment,
         CAST(round(c_acctbal * 1000000.0) AS BIGINT) AS bal6
  FROM customer
),
seg AS (
  SELECT c_mktsegment, CAST(sum(bal6) AS BIGINT) AS sum6,
         CAST(count(*) AS BIGINT) AS n_pos
  FROM cust WHERE bal6 > 0 GROUP BY c_mktsegment
)
SELECT c.c_custkey AS custkey, c.c_name, c.c_mktsegment,
       round(c.bal6 / 1000000.0, 6) AS acctbal,
       round((s.sum6 // s.n_pos) / 1000000.0, 6) AS seg_avg
FROM cust c JOIN seg s USING (c_mktsegment)
WHERE c.bal6 * s.n_pos > s.sum6
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O'
  )
"""


# --------------------------------------------------------------------------
# TPC-H Q21 shape: suppliers who were the ONLY late shipper in a
# multi-supplier finished order ("late" = shipped more than 365 days
# after the order date, compared in tz-invariant epoch-µs integer
# space — invariant 3; the schema carries no commit/receipt dates).
# The EXISTS/NOT-EXISTS pair is the grouped rewrite: one
# (orderkey, suppkey) aggregate of the fact table (no countDistinct —
# invariant 6), a per-order roll-up gating n_supp > 1 AND n_late = 1,
# and the late rows re-joined on the uniform orderkey. Supplier dim
# broadcasts; top-20 by (numwait desc, s_name) — unique names make the
# order total — via orderBy+limit.
# --------------------------------------------------------------------------
LATE_GAP_US = 365 * 86_400_000_000


def q_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = (
        _read(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(
            "o_orderkey", ntz_epoch_us(F.col("o_orderdate")).alias("order_us")
        )
    )
    li = _read(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey",
        ntz_epoch_us(F.col("l_shipdate")).alias("ship_us"),
    )
    per = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("ship_us") > F.col("order_us") + F.lit(LATE_GAP_US),
                    1,
                ).otherwise(0)
            ).alias("late")
        )
    )
    gated = (
        per.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_supp"),
            F.sum("late").alias("n_late"),
        )
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .select("l_orderkey")
    )
    waiting = (
        per.filter(F.col("late") == 1)
        .join(gated, "l_orderkey")
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
    )
    supp = _read(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        waiting.join(F.broadcast(supp), waiting["l_suppkey"] == supp["s_suppkey"])
        .select(F.col("s_suppkey").alias("suppkey"), "s_name", "numwait")
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


SQL_LATE_SUPPLIER = f"""
WITH per AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN epoch_us(l_shipdate)
                       > epoch_us(o_orderdate) + {LATE_GAP_US}
                  THEN 1 ELSE 0 END) AS late
  FROM lineitem JOIN orders
    ON o_orderkey = l_orderkey AND o_orderstatus = 'F'
  GROUP BY l_orderkey, l_suppkey
),
gated AS (
  SELECT l_orderkey FROM per GROUP BY l_orderkey
  HAVING count(*) > 1 AND sum(late) = 1
)
SELECT s.s_suppkey AS suppkey, s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM per p
JOIN gated g ON g.l_orderkey = p.l_orderkey
JOIN supplier s ON s.s_suppkey = p.l_suppkey
WHERE p.late = 1
GROUP BY s.s_suppkey, s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 20
"""


# --------------------------------------------------------------------------
# TPC-H Q4 shape (order priority checking) adapted to this schema: the
# benchmark's l_commitdate < l_receiptdate violation predicate does not
# exist here, so "late" is datediff(o_orderdate -> l_shipdate) > 90 days
# — same EXISTS-semijoin skeleton (the decorrelated-EXISTS planning
# exercise is the point of Q4), pure integer DATE arithmetic (tz-
# invariant per invariant 3). Orders in a one-quarter window; one count
# per priority. Spark plans the EXISTS as distinct-late-ids + left-semi —
# the broadcastable shape at any SF (the quarter window prunes orders
# first).
# --------------------------------------------------------------------------
TPCH_Q4_START = "1996-01-01 00:00:00"
TPCH_Q4_END = "1996-04-01 00:00:00"
TPCH_LATE_DAYS = 90


def q_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = (
        _read(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= _ntz(TPCH_Q4_START))
            & (F.col("o_orderdate") < _ntz(TPCH_Q4_END))
        )
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li = _read(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late_ids = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .filter(
            F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
            > TPCH_LATE_DAYS
        )
        .select("o_orderkey")
        .distinct()
    )
    return (
        orders.join(late_ids, "o_orderkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("order_count"))
        .orderBy("o_orderpriority")
    )


SQL_ORDER_PRIORITY_CHECK = f"""
SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '{TPCH_Q4_START}'
  AND o.o_orderdate < TIMESTAMP '{TPCH_Q4_END}'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND datediff('day', CAST(o.o_orderdate AS DATE),
                   CAST(l.l_shipdate AS DATE)) > {TPCH_LATE_DAYS}
  )
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


# --------------------------------------------------------------------------
# TPC-H Q12 shape (shipping modes / order priority) adapted: no
# l_shipmode column, so the group key is the ship-delay bucket
# least(delay_days // 30, 5) — the operational latency-class report with
# Q12's exact high/low priority split semantics (high = 1-URGENT or
# 2-HIGH counted separately from the rest, both as conditional sums in
# one pass). Lineitems shipped in one year; integer DATE arithmetic
# only. The synthetic ship dates are independent of order dates, so
# delays (and buckets) can be negative — both engines spell the bucket
# as floor(days / 30.0) explicitly because DuckDB's integer // TRUNCATES
# toward zero for negatives while floor() floors (off-by-one on every
# negative bucket otherwise — found by the sf0.001 parity run).
# --------------------------------------------------------------------------
TPCH_Q12_START = "1996-01-01 00:00:00"
TPCH_Q12_END = "1997-01-01 00:00:00"
TPCH_Q12_BUCKET_DAYS = 30
TPCH_Q12_BUCKET_CAP = 5


def q_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _read(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = (
        _read(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= _ntz(TPCH_Q12_START))
            & (F.col("l_shipdate") < _ntz(TPCH_Q12_END))
        )
        .select("l_orderkey", "l_shipdate")
    )
    delay = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    bucket = F.least(
        F.floor(delay / F.lit(TPCH_Q12_BUCKET_DAYS)),
        F.lit(TPCH_Q12_BUCKET_CAP),
    ).cast("long")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(bucket.alias("delay_bucket"), high.alias("_high"))
        .groupBy("delay_bucket")
        .agg(
            F.sum(F.when(F.col("_high"), 1).otherwise(0))
            .cast("long")
            .alias("high_line_count"),
            F.sum(F.when(F.col("_high"), 0).otherwise(1))
            .cast("long")
            .alias("low_line_count"),
        )
        .orderBy("delay_bucket")
    )


SQL_SHIPMODE_PRIORITY = f"""
SELECT CAST(least(floor(datediff('day', CAST(o.o_orderdate AS DATE),
                                 CAST(l.l_shipdate AS DATE))
                        / {TPCH_Q12_BUCKET_DAYS}.0),
                  {TPCH_Q12_BUCKET_CAP}) AS BIGINT) AS delay_bucket,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '{TPCH_Q12_START}'
  AND l.l_shipdate < TIMESTAMP '{TPCH_Q12_END}'
GROUP BY delay_bucket
ORDER BY delay_bucket
"""


# --------------------------------------------------------------------------
# TPC-H Q13 (customer order distribution): LEFT join customers to orders
# with the exclusion predicate INSIDE the join condition (the planning
# point of Q13 — zero-order customers must survive), two-level count:
# orders per customer, then customers per order-count. The o_comment
# NOT LIKE filter has no column here; the exclusion twist is
# o_orderpriority <> '5-LOW'. Pure counts; deterministic order by
# (custdist desc, c_count desc) — both keys integer.
# --------------------------------------------------------------------------
TPCH_Q13_EXCLUDE = "5-LOW"


def q_cust_order_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _read(spark, sf_dir, "customer").select("c_custkey")
    orders = _read(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    per_cust = (
        cust.join(
            orders,
            (cust["c_custkey"] == orders["o_custkey"])
            & (orders["o_orderpriority"] != TPCH_Q13_EXCLUDE),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("long").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


SQL_CUST_ORDER_DIST = f"""
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '{TPCH_Q13_EXCLUDE}'
  GROUP BY c.c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# --------------------------------------------------------------------------
# TPC-H Q17 (small-quantity-order revenue): yearly revenue lost if
# orders below 20% of a part's average quantity moved to scheduled
# replenishment — the correlated-scalar-subquery exercise, planned here
# as brand-pruned broadcast join + per-part stats + rejoin. The
# threshold compare is INTEGER-EXACT: qty < 0.2*avg(qty) rewritten as
# 5*qty*cnt < sum(qty) (quantities are integral; no float avg, no 0.2
# literal crossing the DuckDB DECIMAL path — invariant 1/4). Revenue is
# the fixed6 BIGINT sum with ONE display division by 1e6 then 7.0.
# --------------------------------------------------------------------------
TPCH_Q17_BRAND = "Brand#13"


def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = (
        _read(spark, sf_dir, "part")
        .filter(F.col("p_brand") == TPCH_Q17_BRAND)
        .select("p_partkey")
    )
    li = _read(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("long").alias("lq"),
        "l_extendedprice",
    )
    lj = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    stats = lj.groupBy("l_partkey").agg(
        F.sum("lq").cast("long").alias("sumq"),
        F.count(F.lit(1)).cast("long").alias("cnt"),
    )
    return (
        lj.join(stats, "l_partkey")
        .filter(F.lit(5) * F.col("lq") * F.col("cnt") < F.col("sumq"))
        .agg(
            F.sum(fixed6_long(F.col("l_extendedprice")))
            .cast("long")
            .alias("rev6")
        )
        .select(
            F.round(
                F.col("rev6").cast("double") / F.lit(1000000.0) / F.lit(7.0), 6
            ).alias("avg_yearly")
        )
    )


SQL_SMALL_QTY_REVENUE = f"""
WITH p AS (SELECT p_partkey FROM part WHERE p_brand = '{TPCH_Q17_BRAND}'),
lj AS (
  SELECT l.l_partkey, CAST(l.l_quantity AS BIGINT) AS lq, l.l_extendedprice
  FROM lineitem l JOIN p ON p.p_partkey = l.l_partkey
),
stats AS (
  SELECT l_partkey, CAST(sum(lq) AS BIGINT) AS sumq,
         CAST(count(*) AS BIGINT) AS cnt
  FROM lj GROUP BY l_partkey
)
SELECT round(CAST(sum(CAST(round(l_extendedprice * 1000000.0) AS BIGINT))
                  AS DOUBLE) / 1000000.0 / 7.0, 6) AS avg_yearly
FROM lj JOIN stats USING (l_partkey)
WHERE 5 * lq * cnt < sumq
"""


# --------------------------------------------------------------------------
# TPC-H Q7 (volume shipping): bilateral revenue between two nations by
# ship year — lineitem joins BOTH dimension chains (supplier->nation and
# orders->customer->nation) with the symmetric nation-pair disjunction,
# the classic multi-chain join-reordering exercise. Both nation sides
# broadcast; year via to_date field extraction (tz-invariant); revenue
# is the fixed6 BIGINT sum (invariant 4).
# --------------------------------------------------------------------------
TPCH_Q7_N1 = "NATION_12"
TPCH_Q7_N2 = "NATION_11"
TPCH_Q7_START = "1996-01-01 00:00:00"
TPCH_Q7_END = "1998-01-01 00:00:00"


def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _read(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = (
        _read(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        _read(spark, sf_dir, "customer")
        .join(
            F.broadcast(nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    orders = _read(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = (
        _read(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= _ntz(TPCH_Q7_START))
            & (F.col("l_shipdate") < _ntz(TPCH_Q7_END))
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            F.year(F.to_date("l_shipdate")).cast("long").alias("l_year"),
            fixed6_long(_disc_price()).alias("d6"),
        )
    )
    pair = (
        (F.col("supp_nation") == TPCH_Q7_N1)
        & (F.col("cust_nation") == TPCH_Q7_N2)
    ) | (
        (F.col("supp_nation") == TPCH_Q7_N2)
        & (F.col("cust_nation") == TPCH_Q7_N1)
    )
    return (
        li.join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("d6").cast("long").alias("rev6"))
        .select(
            "supp_nation",
            "cust_nation",
            "l_year",
            F.round(F.col("rev6") / F.lit(1000000.0), 6).alias("revenue"),
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


SQL_VOLUME_SHIPPING = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(CAST(l.l_shipdate AS DATE)) AS BIGINT) AS l_year,
       round(CAST(sum(CAST(round({_SQL_DISC_PRICE.replace("l_", "l.l_")}
                                 * 1000000.0) AS BIGINT)) AS BIGINT)
             / 1000000.0, 6) AS revenue
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation cn ON cn.n_nationkey = c.c_nationkey
WHERE l.l_shipdate >= TIMESTAMP '{TPCH_Q7_START}'
  AND l.l_shipdate < TIMESTAMP '{TPCH_Q7_END}'
  AND ((sn.n_name = '{TPCH_Q7_N1}' AND cn.n_name = '{TPCH_Q7_N2}')
       OR (sn.n_name = '{TPCH_Q7_N2}' AND cn.n_name = '{TPCH_Q7_N1}'))
GROUP BY sn.n_name, cn.n_name, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


# --------------------------------------------------------------------------
# TPC-H Q8 (national market share): for PROMO-type parts sold to AFRICA
# customers, the target supplier nation's share of yearly revenue —
# conditional-sum-over-sum with BOTH sums as fixed6 BIGINTs and the
# share as ONE ratio of the exact integers (invariant 4; no
# float-accumulated numerator/denominator). The five-table join chain
# with two nation lookups is the Q8 planning exercise; dimension sides
# broadcast.
# --------------------------------------------------------------------------
TPCH_Q8_REGION = "AFRICA"
TPCH_Q8_TYPE = "PROMO"
TPCH_Q8_NATION = "NATION_12"


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _read(spark, sf_dir, "region").filter(
        F.col("r_name") == TPCH_Q8_REGION
    )
    nation = _read(spark, sf_dir, "nation")
    cnat = nation.join(
        F.broadcast(region),
        nation["n_regionkey"] == region["r_regionkey"],
    ).select(F.col("n_nationkey").alias("c_nkey"))
    cust = _read(spark, sf_dir, "customer").join(
        F.broadcast(cnat), F.col("c_nationkey") == F.col("c_nkey")
    ).select("c_custkey")
    part = (
        _read(spark, sf_dir, "part")
        .filter(F.col("p_type") == TPCH_Q8_TYPE)
        .select("p_partkey")
    )
    supp = (
        _read(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    orders = _read(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.year(F.to_date("o_orderdate")).cast("long").alias("o_year"),
    )
    li = _read(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        fixed6_long(_disc_price()).alias("d6"),
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .groupBy("o_year")
        .agg(
            F.sum(
                F.when(
                    F.col("supp_nation") == TPCH_Q8_NATION, F.col("d6")
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("nat6"),
            F.sum("d6").cast("long").alias("tot6"),
        )
        .select(
            "o_year",
            F.round(F.col("nat6") / F.lit(1000000.0), 6).alias("nation_revenue"),
            F.round(F.col("tot6") / F.lit(1000000.0), 6).alias("total_revenue"),
            F.round(
                F.col("nat6").cast("double") / F.col("tot6").cast("double"), 6
            ).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


SQL_MARKET_SHARE = f"""
WITH g AS (
  SELECT CAST(year(CAST(o.o_orderdate AS DATE)) AS BIGINT) AS o_year,
         CAST(sum(CASE WHEN sn.n_name = '{TPCH_Q8_NATION}'
                       THEN CAST(round({_SQL_DISC_PRICE.replace("l_", "l.l_")}
                                       * 1000000.0) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS nat6,
         CAST(sum(CAST(round({_SQL_DISC_PRICE.replace("l_", "l.l_")}
                             * 1000000.0) AS BIGINT)) AS BIGINT) AS tot6
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation cn ON cn.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = cn.n_regionkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation sn ON sn.n_nationkey = s.s_nationkey
  WHERE r.r_name = '{TPCH_Q8_REGION}' AND p.p_type = '{TPCH_Q8_TYPE}'
  GROUP BY o_year
)
SELECT o_year,
       round(nat6 / 1000000.0, 6) AS nation_revenue,
       round(tot6 / 1000000.0, 6) AS total_revenue,
       round(CAST(nat6 AS DOUBLE) / CAST(tot6 AS DOUBLE), 6) AS mkt_share
FROM g ORDER BY o_year
"""


# --------------------------------------------------------------------------
# TPC-H Q19 (discounted revenue, disjunctive predicates): three
# brand/size/quantity conjunct arms OR-ed together — the
# pushdown-through-disjunction exercise (the part filter cannot prune to
# one brand; Catalyst pushes the brand IN-superset and re-applies the
# arms post-join). Quantity compares are on CAST-to-BIGINT integers;
# revenue fixed6.
# --------------------------------------------------------------------------
TPCH_Q19_ARMS = [
    ("Brand#13", 1, 11, 1, 20),
    ("Brand#22", 10, 20, 1, 30),
    ("Brand#25", 20, 30, 1, 50),
]


def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _read(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    li = _read(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("long").alias("lq"),
        fixed6_long(_disc_price()).alias("d6"),
    )
    arm = None
    for brand, q1, q2, s1, s2 in TPCH_Q19_ARMS:
        a = (
            (F.col("p_brand") == brand)
            & (F.col("lq") >= q1)
            & (F.col("lq") <= q2)
            & (F.col("p_size") >= s1)
            & (F.col("p_size") <= s2)
        )
        arm = a if arm is None else (arm | a)
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .filter(arm)
        .agg(F.sum("d6").cast("long").alias("rev6"))
        .select(
            F.round(F.col("rev6") / F.lit(1000000.0), 6).alias("revenue")
        )
    )


def _q19_sql() -> str:
    arms = " OR ".join(
        f"(p.p_brand = '{b}' AND CAST(l.l_quantity AS BIGINT) BETWEEN {q1} AND {q2}"
        f" AND p.p_size BETWEEN {s1} AND {s2})"
        for b, q1, q2, s1, s2 in TPCH_Q19_ARMS
    )
    return f"""
SELECT round(CAST(sum(CAST(round({_SQL_DISC_PRICE.replace("l_", "l.l_")}
                                 * 1000000.0) AS BIGINT)) AS BIGINT)
             / 1000000.0, 6) AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE {arms}
"""


SQL_DISJUNCTIVE_REVENUE = _q19_sql()


# --------------------------------------------------------------------------
# TPC-H Q6 (forecasting revenue change): the pure scan-and-filter
# aggregate — one year of shipments, discount in [5%, 7%], quantity
# < 24. The discount band compares CAST(round(l_discount*100) AS BIGINT)
# BETWEEN 5 AND 7 — never a 0.05 float literal (which DuckDB would route
# through DECIMAL, invariant 1); quantity is an integer compare; revenue
# = sum of fixed6(price*discount) BIGINTs. The plan to want: filters
# fully pushed to the parquet scan, no shuffle but the final 1-row
# partial-agg merge.
# --------------------------------------------------------------------------
TPCH_Q6_START = "1996-01-01 00:00:00"
TPCH_Q6_END = "1997-01-01 00:00:00"


def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem")
    d100 = F.round(F.col("l_discount") * F.lit(100.0), 0).cast("long")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ntz(TPCH_Q6_START))
            & (F.col("l_shipdate") < _ntz(TPCH_Q6_END))
            & (d100 >= 5)
            & (d100 <= 7)
            & (F.col("l_quantity").cast("long") < 24)
        )
        .agg(
            F.sum(
                fixed6_long(F.col("l_extendedprice") * F.col("l_discount"))
            )
            .cast("long")
            .alias("rev6")
        )
        .select(
            F.round(F.col("rev6") / F.lit(1000000.0), 6).alias("revenue")
        )
    )


SQL_FORECAST_REVENUE = f"""
SELECT round(CAST(sum(CAST(round(l_extendedprice * l_discount * 1000000.0)
                          AS BIGINT)) AS BIGINT) / 1000000.0, 6) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{TPCH_Q6_START}'
  AND l_shipdate < TIMESTAMP '{TPCH_Q6_END}'
  AND CAST(round(l_discount * 100.0) AS BIGINT) BETWEEN 5 AND 7
  AND CAST(l_quantity AS BIGINT) < 24
"""


# --------------------------------------------------------------------------
# TPC-H Q16 shape (parts/supplier relationship): distinct suppliers per
# (p_brand, p_size) — the schema has no partsupp, so the relation is the
# distinct (l_partkey, l_suppkey) observed in lineitem; exclusions are
# p_brand <> 'Brand#13' and negative-balance suppliers (the complaints
# stand-in) via broadcast anti-join. The distinct count is the TWO-PHASE
# shape (group the (brand,size,supp) triple first — invariant 6; the
# (brand,size) key space is bounded so no Expand, no skewed reducer).
# --------------------------------------------------------------------------
TPCH_Q16_EXCL_BRAND = "Brand#13"
TPCH_Q16_TOP = 30


def q_supplier_relation_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = (
        _read(spark, sf_dir, "part")
        .filter(F.col("p_brand") != TPCH_Q16_EXCL_BRAND)
        .select("p_partkey", "p_brand", "p_size")
    )
    bad = (
        _read(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("_bad"))
    )
    rel = (
        _read(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("_bad"),
            "left_anti",
        )
        .join(F.broadcast(part), F.col("l_partkey") == part["p_partkey"])
        .select("p_brand", "p_size", "l_suppkey")
        .distinct()
    )
    return (
        rel.groupBy("p_brand", "p_size")
        .agg(F.count(F.lit(1)).cast("long").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_size")
        .limit(TPCH_Q16_TOP)
    )


SQL_SUPPLIER_RELATION_COUNT = f"""
WITH rel AS (
  SELECT DISTINCT p.p_brand, p.p_size, l.l_suppkey
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_brand <> '{TPCH_Q16_EXCL_BRAND}'
    AND l.l_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
    )
)
SELECT p_brand, p_size, CAST(count(*) AS BIGINT) AS supplier_cnt
FROM rel GROUP BY p_brand, p_size
ORDER BY supplier_cnt DESC, p_brand, p_size
LIMIT {TPCH_Q16_TOP}
"""


def q_churn_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    us = events.select(
        "user_id", ntz_epoch_us(F.col("ts")).alias("us")
    )
    end = us.agg(F.max("us").cast("long").alias("_end"))
    users = (
        us.groupBy("user_id")
        .agg(
            F.min("us").cast("long").alias("first_us"),
            F.max("us").cast("long").alias("last_us"),
        )
        .crossJoin(F.broadcast(end))
        .select(
            F.expr(f"(last_us - first_us) div {LIFE_BUCKET_US}").alias("lw"),
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
    w = Window.orderBy(F.desc("lw")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        hist.select(
            F.col("lw").cast("long").alias("bucket"),
            F.sum("ended_here").over(w).cast("long").alias("n_at_risk"),
            "churned",
        )
        .withColumn(
            "hazard",
            F.round(
                F.col("churned").cast("double")
                / F.col("n_at_risk").cast("double"),
                6,
            ),
        )
        .orderBy("bucket")
    )


SQL_CHURN_HAZARD = f"""
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
)
SELECT lw AS bucket,
       CAST(sum(ended_here) OVER (ORDER BY lw DESC
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS BIGINT) AS n_at_risk,
       churned,
       round(CAST(churned AS DOUBLE)
             / CAST(sum(ended_here) OVER (ORDER BY lw DESC
                                          ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS DOUBLE), 6)
         AS hazard
FROM hist
ORDER BY bucket
"""


# --------------------------------------------------------------------------
# ROLLUP subtotal report (the OLAP grouping-sets surface — Spark's
# Expand-based rollup vs DuckDB's GROUP BY ROLLUP): revenue + row counts
# at (flag, status), per-flag subtotal, and grand total in ONE pass.
# Subtotal NULLs are coalesced to 'ALL' (the real values are single
# letters, so no collision — and the driver's row-sort compare cannot
# order raw NULLs). fixed6 BIGINT money (invariant 4).
# --------------------------------------------------------------------------
def q_rollup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", fixed6_long(_disc_price()).alias("d6")
    )
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("d6").cast("long").alias("rev6"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("return_flag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("line_status"),
            "n_rows",
            F.round(F.col("rev6") / F.lit(1000000.0), 6).alias("revenue"),
        )
        .orderBy("return_flag", "line_status")
    )


SQL_ROLLUP_REPORT = f"""
SELECT COALESCE(l_returnflag, 'ALL') AS return_flag,
       COALESCE(l_linestatus, 'ALL') AS line_status,
       CAST(count(*) AS BIGINT) AS n_rows,
       round(CAST(sum(CAST(round({_SQL_DISC_PRICE} * 1000000.0) AS BIGINT))
                  AS BIGINT) / 1000000.0, 6) AS revenue
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
ORDER BY return_flag, line_status
"""


# --------------------------------------------------------------------------
# Pivoted weekday x event-type matrix (the DataFrame .pivot() surface —
# Spark plans it as a single pass with one aggregate per pivot value;
# the oracle spells the same thing as portable conditional sums): event
# counts per integer weekday (epoch-day arithmetic, tz-invariant per
# invariant 3; 1970-01-01 was a Thursday, +4 aligns 0=Sunday) with one
# column per type plus the row total. The pivot value list is pinned to
# the generator's five types — a new type would surface as a column
# mismatch, not silent data loss.
# --------------------------------------------------------------------------
PIVOT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_pivot_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    dow = (
        events.select(ntz_epoch_us(F.col("ts")).alias("_us"), "event_type")
        .select(
            ((F.expr(f"_us DIV {US_PER_DAY_DIV}") + 4) % 7)
            .cast("long")
            .alias("dow"),
            "event_type",
        )
    )
    pivoted = (
        dow.groupBy("dow")
        .pivot("event_type", PIVOT_TYPES)
        .agg(F.count(F.lit(1)).cast("long"))
    )
    cols = [F.col("dow")]
    total = None
    for t in PIVOT_TYPES:
        c = F.coalesce(F.col(t), F.lit(0)).cast("long")
        cols.append(c.alias(f"n_{t}"))
        total = c if total is None else (total + c)
    cols.append(total.cast("long").alias("n_total"))
    return pivoted.select(*cols).orderBy("dow")


def _pivot_sql() -> str:
    cases = ",\n       ".join(
        f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS n_{t}"
        for t in PIVOT_TYPES
    )
    return f"""
SELECT CAST((epoch_us(ts) // {US_PER_DAY_DIV} + 4) % 7 AS BIGINT) AS dow,
       {cases},
       CAST(count(*) AS BIGINT) AS n_total
FROM events
GROUP BY dow
ORDER BY dow
"""


SQL_PIVOT_REPORT = _pivot_sql()


# --------------------------------------------------------------------------
# Skyline / Pareto frontier (Borzsony, Kossmann & Stocker 2001's SKYLINE
# operator): parts minimizing retail price while maximizing size — kept
# iff no part is cheaper-or-equal AND bigger-or-equal with one strict.
# Planned as the SORT-SWEEP, not the naive O(n^2) dominance self-join:
# collapse to (price_cents -> max size), then one range-frame window
# (RANGE UNBOUNDED PRECEDING TO 1 PRECEDING on price) gives the best
# size among STRICTLY cheaper parts; a price level survives iff it
# beats that. Prices integer cents (round once — invariant 4); the
# window orders on an integer key, identical in both engines.
# --------------------------------------------------------------------------
def q_skyline_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _read(spark, sf_dir, "part").select(
        "p_partkey",
        F.round(F.col("p_retailprice") * F.lit(100.0), 0)
        .cast("long")
        .alias("price_cents"),
        F.col("p_size").cast("long").alias("p_size"),
    )
    best = part.groupBy("price_cents").agg(
        F.max("p_size").alias("best_size")
    )
    w = Window.orderBy("price_cents").rangeBetween(
        Window.unboundedPreceding, -1
    )
    frontier = best.withColumn(
        "cheaper_best", F.max("best_size").over(w)
    ).filter(
        F.col("best_size") > F.coalesce(F.col("cheaper_best"), F.lit(-1))
    )
    return (
        part.join(
            frontier.select("price_cents", "best_size"), ["price_cents"]
        )
        .filter(F.col("p_size") == F.col("best_size"))
        .select("p_partkey", "price_cents", "p_size")
        .orderBy("price_cents", "p_partkey")
    )


SQL_SKYLINE_FRONTIER = """
WITH p AS (
  SELECT p_partkey,
         CAST(round(p_retailprice * 100.0) AS BIGINT) AS price_cents,
         CAST(p_size AS BIGINT) AS p_size
  FROM part
),
best AS (
  SELECT price_cents, max(p_size) AS best_size FROM p GROUP BY price_cents
),
frontier AS (
  SELECT price_cents, best_size
  FROM (
    SELECT price_cents, best_size,
           max(best_size) OVER (ORDER BY price_cents
                                RANGE BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS cheaper_best
    FROM best
  )
  WHERE best_size > COALESCE(cheaper_best, -1)
)
SELECT p.p_partkey, p.price_cents, p.p_size
FROM p JOIN frontier f
  ON f.price_cents = p.price_cents AND p.p_size = f.best_size
ORDER BY p.price_cents, p.p_partkey
"""


# --------------------------------------------------------------------------
# ABC inventory analysis (the 80/95 Pareto classification every
# warehouse report ships, the actionable companion to order_gini's
# inequality index): parts ranked by revenue, class A while cumulative
# revenue <= 80% of total, B to 95%, else C. ENTIRELY integer: revenue
# is the fixed6 BIGINT sum, the class boundaries compare cum6*100
# against total6*80/95 (no percentage floats), cumulative window over
# (rev desc, partkey) — deterministic tiebreak.
# --------------------------------------------------------------------------
def q_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem").select(
        "l_partkey", fixed6_long(_disc_price()).alias("d6")
    )
    rev = li.groupBy("l_partkey").agg(F.sum("d6").cast("long").alias("rev6"))
    total = rev.agg(F.sum("rev6").cast("long").alias("_tot6"))
    w = Window.orderBy(F.desc("rev6"), "l_partkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    classed = (
        rev.withColumn("cum6", F.sum("rev6").over(w).cast("long"))
        .crossJoin(F.broadcast(total))
        .select(
            "rev6",
            F.when(
                F.col("cum6") * 100 <= F.col("_tot6") * 80, F.lit("A")
            )
            .when(F.col("cum6") * 100 <= F.col("_tot6") * 95, F.lit("B"))
            .otherwise(F.lit("C"))
            .alias("abc_class"),
            "_tot6",
        )
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("rev6").cast("long").alias("class_rev6"),
            F.max("_tot6").alias("_tot6"),
        )
        .select(
            "abc_class",
            "n_parts",
            F.round(F.col("class_rev6") / F.lit(1000000.0), 6).alias(
                "class_revenue"
            ),
            F.round(
                F.col("class_rev6").cast("double")
                / F.col("_tot6").cast("double"),
                6,
            ).alias("revenue_share"),
        )
        .orderBy("abc_class")
    )


SQL_ABC_ANALYSIS = f"""
WITH rev AS (
  SELECT l_partkey,
         CAST(sum(CAST(round({_SQL_DISC_PRICE} * 1000000.0) AS BIGINT))
              AS BIGINT) AS rev6
  FROM lineitem GROUP BY l_partkey
),
tot AS (SELECT CAST(sum(rev6) AS BIGINT) AS t6 FROM rev),
classed AS (
  SELECT rev6,
         CASE WHEN CAST(sum(rev6) OVER (ORDER BY rev6 DESC, l_partkey
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS BIGINT) * 100
                   <= (SELECT t6 FROM tot) * 80 THEN 'A'
              WHEN CAST(sum(rev6) OVER (ORDER BY rev6 DESC, l_partkey
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS BIGINT) * 100
                   <= (SELECT t6 FROM tot) * 95 THEN 'B'
              ELSE 'C' END AS abc_class
  FROM rev
)
SELECT abc_class, CAST(count(*) AS BIGINT) AS n_parts,
       round(CAST(sum(rev6) AS BIGINT) / 1000000.0, 6) AS class_revenue,
       round(CAST(sum(rev6) AS DOUBLE)
             / CAST((SELECT t6 FROM tot) AS DOUBLE), 6) AS revenue_share
FROM classed
GROUP BY abc_class
ORDER BY abc_class
"""


# --------------------------------------------------------------------------
# Top nations per region WITH TIES (the dense_rank surface — every other
# top-k pair uses row_number's arbitrary-ties-cut; rank-with-ties is the
# semantics reports actually want): customer-side revenue per
# (region, nation), dense_rank <= 2 per region on the EXACT fixed6
# BIGINT revenue (integer ties rank identically in both engines).
# --------------------------------------------------------------------------
def q_region_top_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _read(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = _read(spark, sf_dir, "region").select("r_regionkey", "r_name")
    cust = _read(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = _read(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _read(spark, sf_dir, "lineitem").select(
        "l_orderkey", fixed6_long(_disc_price()).alias("d6")
    )
    rev = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(
            F.broadcast(nation),
            cust["c_nationkey"] == nation["n_nationkey"],
        )
        .join(
            F.broadcast(region),
            nation["n_regionkey"] == region["r_regionkey"],
        )
        .groupBy("r_name", "n_name")
        .agg(F.sum("d6").cast("long").alias("rev6"))
    )
    w = Window.partitionBy("r_name").orderBy(F.desc("rev6"))
    return (
        rev.withColumn("rk", F.dense_rank().over(w).cast("long"))
        .filter(F.col("rk") <= 2)
        .select(
            F.col("r_name").alias("region"),
            F.col("n_name").alias("nation"),
            "rk",
            F.round(F.col("rev6") / F.lit(1000000.0), 6).alias("revenue"),
        )
        .orderBy("region", "rk", "nation")
    )


SQL_REGION_TOP_NATIONS = f"""
WITH rev AS (
  SELECT r.r_name AS region, n.n_name AS nation,
         CAST(sum(CAST(round({_SQL_DISC_PRICE.replace("l_", "l.l_")}
                             * 1000000.0) AS BIGINT)) AS BIGINT) AS rev6
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  GROUP BY r.r_name, n.n_name
)
SELECT region, nation,
       CAST(dense_rank() OVER (PARTITION BY region ORDER BY rev6 DESC)
            AS BIGINT) AS rk,
       round(rev6 / 1000000.0, 6) AS revenue
FROM rev
QUALIFY rk <= 2
ORDER BY region, rk, nation
"""


# --------------------------------------------------------------------------
# Conversion lag (time-to-first-purchase — the activation-funnel timing
# metric next to event_funnel's step counts): per user, microseconds
# from first event to first 'purchase' (converted users only), reported
# as conversion rate + interpolated p50/p90 of the lag in integer
# MINUTES (epoch-us arithmetic per invariant 3; positive floor-division;
# quantile_cont on the integer grid per the group_percentiles argument).
# --------------------------------------------------------------------------
def q_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    us = events.select(
        "user_id", "event_type", ntz_epoch_us(F.col("ts")).alias("us")
    )
    per_user = us.groupBy("user_id").agg(
        F.min("us").cast("long").alias("first_us"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("us")))
        .cast("long")
        .alias("first_purchase_us"),
    )
    lag = per_user.select(
        "first_purchase_us",
        F.expr(
            f"(first_purchase_us - first_us) div {US_PER_MINUTE_DIV}"
        ).alias("lag_min"),
    )
    return lag.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.count("first_purchase_us").cast("long").alias("n_converted"),
        F.round(
            F.count("first_purchase_us").cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("conversion_rate"),
        F.round(F.expr("percentile(lag_min, 0.5D)"), 6).alias("p50_lag_min"),
        F.round(F.expr("percentile(lag_min, 0.9D)"), 6).alias("p90_lag_min"),
    )


SQL_CONVERSION_LAG = f"""
WITH per_user AS (
  SELECT user_id,
         CAST(min(epoch_us(ts)) AS BIGINT) AS first_us,
         CAST(min(CASE WHEN event_type = 'purchase'
                       THEN epoch_us(ts) END) AS BIGINT) AS first_purchase_us
  FROM events GROUP BY user_id
),
lag AS (
  SELECT first_purchase_us,
         (first_purchase_us - first_us) // {US_PER_MINUTE_DIV} AS lag_min
  FROM per_user
)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       CAST(count(first_purchase_us) AS BIGINT) AS n_converted,
       round(CAST(count(first_purchase_us) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS conversion_rate,
       round(quantile_cont(lag_min, 0.5), 6) AS p50_lag_min,
       round(quantile_cont(lag_min, 0.9), 6) AS p90_lag_min
FROM lag
"""


# --------------------------------------------------------------------------
# Discount-quantity elasticity (does a bigger discount move volume?):
# Pearson correlation per return-flag group from the EXACT integer
# six-tuple (n, Sx, Sy, Sxy, Sxx, Syy) — discounts quantized to integer
# percent, quantities integral, every sum a BIGINT, the correlation ONE
# identical expression (the integer-exact counterpart of
# feature_correlation's fixed6 document features).
# --------------------------------------------------------------------------
def q_discount_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_discount") * F.lit(100.0), 0)
        .cast("long")
        .alias("x"),
        F.col("l_quantity").cast("long").alias("y"),
    )
    stats = li.groupBy("l_returnflag").agg(
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
    corr = (n * sxy - sx * sy) / F.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    return stats.select(
        "l_returnflag",
        "n",
        F.round(sx / n, 6).alias("mean_disc_pct"),
        F.round(sy / n, 6).alias("mean_qty"),
        F.round(corr, 6).alias("pearson_r"),
    ).orderBy("l_returnflag")


SQL_DISCOUNT_ELASTICITY = """
WITH t AS (
  SELECT l_returnflag,
         CAST(round(l_discount * 100.0) AS BIGINT) AS x,
         CAST(l_quantity AS BIGINT) AS y
  FROM lineitem
),
stats AS (
  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM t GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_disc_pct,
       round(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_qty,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
         AS pearson_r
FROM stats
ORDER BY l_returnflag
"""


# --------------------------------------------------------------------------
# Theil-Sen robust trend estimator (Theil 1950, Sen 1968) on daily
# revenue: the median of all pairwise slopes — the ESTIMATE companion to
# the Mann-Kendall trend TEST (same day-pair fan-out, time-bounded, not
# corpus-bounded). Each slope is one double from exact integer cents and
# day differences, computed identically on both engines; the median
# interpolates the same sorted multiset. The intercept is the median of
# (x_t - slope*t) in a second pass with the slope as an in-plan scalar.
# --------------------------------------------------------------------------
def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    slopes = a.join(b, F.col("a.day") < F.col("b.day")).select(
        (
            (F.col("b.rev") - F.col("a.rev")).cast("double")
            / (F.col("b.day") - F.col("a.day")).cast("double")
        ).alias("slope")
    )
    med_slope = slopes.agg(
        F.expr("percentile(slope, 0.5D)").alias("slope"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
    )
    resid = daily.crossJoin(F.broadcast(med_slope)).select(
        "n_pairs",
        "slope",
        (
            F.col("rev").cast("double")
            - F.col("slope") * F.col("day").cast("double")
        ).alias("r"),
    )
    return resid.groupBy("n_pairs", "slope").agg(
        F.expr("percentile(r, 0.5D)").alias("icept")
    ).select(
        "n_pairs",
        F.round(F.col("slope") / F.lit(100.0), 6).alias(
            "slope_dollars_per_day"
        ),
        F.round(F.col("icept") / F.lit(100.0), 6).alias(
            "intercept_dollars"
        ),
    )


SQL_THEIL_SEN = f"""
WITH daily AS (
  SELECT epoch_us(o_orderdate) // {US_PER_DAY_DIV} AS day,
         CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
           AS rev
  FROM orders GROUP BY 1
),
slopes AS (
  SELECT CAST(b.rev - a.rev AS DOUBLE) / CAST(b.day - a.day AS DOUBLE)
           AS slope
  FROM daily a JOIN daily b ON a.day < b.day
),
med AS (
  SELECT quantile_cont(slope, 0.5) AS slope,
         CAST(count(*) AS BIGINT) AS n_pairs
  FROM slopes
),
resid AS (
  SELECT n_pairs, slope,
         CAST(rev AS DOUBLE) - slope * CAST(day AS DOUBLE) AS r
  FROM daily, med
)
SELECT n_pairs,
       round(slope / CAST('100.0' AS DOUBLE), 6) AS slope_dollars_per_day,
       round(quantile_cont(r, 0.5) / CAST('100.0' AS DOUBLE), 6)
         AS intercept_dollars
FROM resid
GROUP BY n_pairs, slope
"""


# --------------------------------------------------------------------------
# Customer segment migration matrix (the retention-marketing report
# behind every "movers and shakers" dashboard): customers are binned
# into revenue terciles separately for the first and second half of the
# order timeline (split at the exact integer midpoint day), with
# segment 0 for customers inactive in that half; the output is the
# (from, to) transition matrix. NTILE terciles use a total
# (rev6, custkey) order, so every count is reproducible integer work.
# --------------------------------------------------------------------------
def q_segment_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _read(spark, sf_dir, "orders").select(
        "o_custkey",
        F.floor(
            ntz_epoch_us(F.col("o_orderdate")) / F.lit(US_PER_DAY_DIV)
        )
        .cast("long")
        .alias("day"),
        fixed6_long(F.col("o_totalprice")).alias("p6"),
    )
    rng = orders.agg(
        ((F.min("day") + F.max("day")) / 2).cast("long").alias("mid")
    )
    halves = orders.crossJoin(F.broadcast(rng)).select(
        "o_custkey",
        F.when(F.col("day") <= F.col("mid"), 1).otherwise(2).alias("half"),
        "p6",
    )
    per = halves.groupBy("o_custkey", "half").agg(
        F.sum("p6").cast("long").alias("rev6")
    ).localCheckpoint(eager=True)
    wt = Window.partitionBy("half").orderBy(
        F.col("rev6").asc(), F.col("o_custkey").asc()
    )
    seg = per.select(
        "o_custkey", "half", F.ntile(3).over(wt).cast("long").alias("seg")
    )
    h1 = seg.filter(F.col("half") == 1).select(
        "o_custkey", F.col("seg").alias("seg_from")
    )
    h2 = seg.filter(F.col("half") == 2).select(
        "o_custkey", F.col("seg").alias("seg_to")
    )
    both = h1.join(h2, "o_custkey", "full").select(
        F.coalesce("seg_from", F.lit(0)).cast("long").alias("seg_from"),
        F.coalesce("seg_to", F.lit(0)).cast("long").alias("seg_to"),
    )
    return (
        both.groupBy("seg_from", "seg_to")
        .agg(F.count(F.lit(1)).cast("long").alias("n_cust"))
        .orderBy("seg_from", "seg_to")
    )


SQL_SEGMENT_MIGRATION = f"""
WITH orders_d AS (
  SELECT o_custkey,
         epoch_us(o_orderdate) // {US_PER_DAY_DIV} AS day,
         {SQL_FIXED6_LONG.format(col="o_totalprice")} AS p6
  FROM orders
),
rng AS (SELECT (min(day) + max(day)) // 2 AS mid FROM orders_d),
per AS (
  SELECT o_custkey,
         CASE WHEN day <= mid THEN 1 ELSE 2 END AS half,
         CAST(sum(p6) AS BIGINT) AS rev6
  FROM orders_d, rng
  GROUP BY o_custkey, CASE WHEN day <= mid THEN 1 ELSE 2 END
),
seg AS (
  SELECT o_custkey, half,
         CAST(ntile(3) OVER (PARTITION BY half
               ORDER BY rev6 ASC, o_custkey ASC) AS BIGINT) AS seg
  FROM per
),
h1 AS (SELECT o_custkey, seg AS seg_from FROM seg WHERE half = 1),
h2 AS (SELECT o_custkey, seg AS seg_to FROM seg WHERE half = 2),
merged AS (
  SELECT CAST(coalesce(seg_from, 0) AS BIGINT) AS seg_from,
         CAST(coalesce(seg_to, 0) AS BIGINT) AS seg_to
  FROM h1 FULL JOIN h2 USING (o_custkey)
)
SELECT seg_from, seg_to, CAST(count(*) AS BIGINT) AS n_cust
FROM merged GROUP BY seg_from, seg_to
ORDER BY seg_from, seg_to
"""


# --------------------------------------------------------------------------
# Supplier concentration per part brand (Herfindahl-Hirschman index —
# the supply-chain-risk audit; 1/HHI is the "effective supplier count"):
# revenue share of each supplier within a brand from lineitem joined to
# the part dim (broadcast — dims are small), HHI = sum share², top 20
# brands by revenue with a brand-ASC tiebreak. Revenue stays fixed6
# BIGINT until the share ratios.
# --------------------------------------------------------------------------
def q_brand_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        fixed6_long(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        ).alias("r6"),
    )
    part = _read(spark, sf_dir, "part").select("p_partkey", "p_brand")
    cell = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "l_suppkey")
        .agg(F.sum("r6").cast("long").alias("sup6"))
        .localCheckpoint(eager=True)
    )
    brand = cell.groupBy("p_brand").agg(
        F.sum("sup6").cast("long").alias("brand6"),
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
    )
    share = F.col("sup6").cast("double") / F.col("brand6").cast("double")
    hhi = (
        cell.join(F.broadcast(brand), "p_brand")
        .select("p_brand", "brand6", "n_suppliers", (share * share).alias("s2"))
        .groupBy("p_brand", "brand6", "n_suppliers")
        .agg(F.sum("s2").alias("hhi"))
    )
    pick = Window.orderBy(F.col("brand6").desc(), F.col("p_brand").asc())
    return (
        hhi.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") <= 20)
        .select(
            "p_brand",
            "n_suppliers",
            F.round(
                F.col("brand6").cast("double") / F.lit(1_000_000.0), 6
            ).alias("brand_revenue"),
            F.round("hhi", 6).alias("hhi"),
            F.round(F.lit(1.0) / F.col("hhi"), 6).alias(
                "effective_suppliers"
            ),
        )
        .orderBy("p_brand")
    )


SQL_BRAND_CONCENTRATION = f"""
WITH cell AS (
  SELECT p.p_brand, l.l_suppkey,
         CAST(sum({SQL_FIXED6_LONG.format(
             col="l.l_extendedprice * (1.0 - l.l_discount)")}) AS BIGINT)
           AS sup6
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY p.p_brand, l.l_suppkey
),
brand AS (
  SELECT p_brand, CAST(sum(sup6) AS BIGINT) AS brand6,
         CAST(count(*) AS BIGINT) AS n_suppliers
  FROM cell GROUP BY p_brand
),
hhi AS (
  SELECT c.p_brand, b.brand6, b.n_suppliers,
         sum((CAST(c.sup6 AS DOUBLE) / CAST(b.brand6 AS DOUBLE))
             * (CAST(c.sup6 AS DOUBLE) / CAST(b.brand6 AS DOUBLE))) AS hhi
  FROM cell c JOIN brand b USING (p_brand)
  GROUP BY c.p_brand, b.brand6, b.n_suppliers
),
top AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (ORDER BY brand6 DESC, p_brand ASC) AS rn
    FROM hhi)
  WHERE rn <= 20
)
SELECT p_brand, n_suppliers,
       round(CAST(brand6 AS DOUBLE) / CAST('1000000.0' AS DOUBLE), 6)
         AS brand_revenue,
       round(hhi, 6) AS hhi,
       round(1.0 / hhi, 6) AS effective_suppliers
FROM top
ORDER BY p_brand
"""


# --------------------------------------------------------------------------
# Value-at-risk / conditional VaR on daily revenue (the risk-analytics
# tail report; CVaR a.k.a. expected shortfall): VaR5 is the interpolated
# 5th percentile of daily revenue; CVaR averages the days at or below
# it — an EXACT BIGINT sum over an exactly-determined tail set (the
# threshold comparison pits integer cents against one shared double).
# --------------------------------------------------------------------------
def q_value_at_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    var5 = daily.agg(
        F.expr("percentile(rev, 0.05D)").alias("var5"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
    tail = (
        daily.crossJoin(F.broadcast(var5))
        .filter(F.col("rev").cast("double") <= F.col("var5"))
        .groupBy("n_days", "var5")
        .agg(
            F.count(F.lit(1)).cast("long").alias("tail_days"),
            F.sum("rev").cast("long").alias("tail6"),
        )
    )
    return tail.select(
        "n_days",
        "tail_days",
        F.round(F.col("var5") / F.lit(100.0), 6).alias("var_5pct"),
        F.round(
            F.col("tail6").cast("double")
            / F.col("tail_days").cast("double")
            / F.lit(100.0),
            6,
        ).alias("cvar_5pct"),
    )


SQL_VALUE_AT_RISK = f"""
WITH daily AS (
  SELECT epoch_us(o_orderdate) // {US_PER_DAY_DIV} AS day,
         CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
           AS rev
  FROM orders GROUP BY 1
),
v AS (
  SELECT quantile_cont(rev, 0.05) AS var5,
         CAST(count(*) AS BIGINT) AS n_days
  FROM daily
),
tail AS (
  SELECT n_days, var5, CAST(count(*) AS BIGINT) AS tail_days,
         CAST(sum(rev) AS BIGINT) AS tail6
  FROM daily, v
  WHERE CAST(rev AS DOUBLE) <= var5
  GROUP BY n_days, var5
)
SELECT n_days, tail_days,
       round(var5 / CAST('100.0' AS DOUBLE), 6) AS var_5pct,
       round(CAST(tail6 AS DOUBLE) / CAST(tail_days AS DOUBLE)
             / CAST('100.0' AS DOUBLE), 6) AS cvar_5pct
FROM tail
"""


# --------------------------------------------------------------------------
# Safety stock / reorder point (the textbook inventory control rule,
# ROP = mu*L + z*sigma*sqrt(L) at a 95% service level over a 7-day
# lead time) for the 10 highest-volume parts: per-part daily demand
# from exact integer quantities over OBSERVED days (zero-demand days
# excluded, documented — the sparse-SKU convention), moments from the
# (n, Σ, Σx²) integer triple, z as a CAST string constant.
# --------------------------------------------------------------------------
def q_safety_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.floor(
            ntz_epoch_us(F.col("l_shipdate")) / F.lit(US_PER_DAY_DIV)
        )
        .cast("long")
        .alias("day"),
        F.col("l_quantity").cast("long").alias("q"),
    )
    daily = li.groupBy("l_partkey", "day").agg(
        F.sum("q").cast("long").alias("d")
    ).localCheckpoint(eager=True)
    per_part = daily.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("d").cast("long").alias("s"),
        F.sum(F.col("d") * F.col("d")).cast("long").alias("ss"),
    )
    pick = Window.orderBy(F.col("s").desc(), F.col("l_partkey").asc())
    top = per_part.withColumn("rn", F.row_number().over(pick)).filter(
        F.col("rn") <= 10
    )
    nd = F.col("n_days").cast("double")
    mu = F.col("s").cast("double") / nd
    var = (F.col("ss").cast("double") - nd * mu * mu) / (nd - F.lit(1.0))
    lead = F.lit(7.0)
    z = F.lit(1.6448536269514722)
    rop = mu * lead + z * F.sqrt(var) * F.sqrt(lead)
    return top.select(
        "l_partkey",
        "n_days",
        F.round(mu, 6).alias("mean_daily_demand"),
        F.round(F.sqrt(var), 6).alias("sd_daily_demand"),
        F.round(rop, 6).alias("reorder_point"),
    ).orderBy("l_partkey")


SQL_SAFETY_STOCK = f"""
WITH daily AS (
  SELECT l_partkey, epoch_us(l_shipdate) // {US_PER_DAY_DIV} AS day,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS d
  FROM lineitem GROUP BY 1, 2
),
per_part AS (
  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(d) AS BIGINT) AS s, CAST(sum(d * d) AS BIGINT) AS ss
  FROM daily GROUP BY l_partkey
),
top AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (ORDER BY s DESC, l_partkey ASC) AS rn
    FROM per_part)
  WHERE rn <= 10
)
SELECT l_partkey, n_days,
       round(CAST(s AS DOUBLE) / CAST(n_days AS DOUBLE), 6)
         AS mean_daily_demand,
       round(sqrt((CAST(ss AS DOUBLE)
                   - CAST(n_days AS DOUBLE)
                     * (CAST(s AS DOUBLE) / CAST(n_days AS DOUBLE))
                     * (CAST(s AS DOUBLE) / CAST(n_days AS DOUBLE)))
                  / (CAST(n_days AS DOUBLE) - 1.0)), 6)
         AS sd_daily_demand,
       round(CAST(s AS DOUBLE) / CAST(n_days AS DOUBLE) * 7.0
             + CAST('1.6448536269514722' AS DOUBLE)
               * sqrt((CAST(ss AS DOUBLE)
                       - CAST(n_days AS DOUBLE)
                         * (CAST(s AS DOUBLE) / CAST(n_days AS DOUBLE))
                         * (CAST(s AS DOUBLE) / CAST(n_days AS DOUBLE)))
                      / (CAST(n_days AS DOUBLE) - 1.0))
               * sqrt(7.0), 6) AS reorder_point
FROM top
ORDER BY l_partkey
"""


# --------------------------------------------------------------------------
# Rolling order backlog (aging report under an assumed 7-day fulfillment
# SLA): open orders at day t = orders placed in (t-7, t], computed with
# a RANGE-frame window over the daily counts — pure integers; reports
# the peak backlog with its day (exact tie-break) and the mean.
# --------------------------------------------------------------------------
def q_order_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _read(spark, sf_dir, "orders").select(
        F.floor(
            ntz_epoch_us(F.col("o_orderdate")) / F.lit(US_PER_DAY_DIV)
        )
        .cast("long")
        .alias("day")
    )
    daily = orders.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    w = (
        Window.orderBy("day")
        .rangeBetween(-6, 0)
    )
    backlog = daily.select(
        "day", F.sum("c").over(w).cast("long").alias("open_orders")
    ).localCheckpoint(eager=True)
    pick = Window.orderBy(
        F.col("open_orders").desc(), F.col("day").asc()
    )
    best = backlog.withColumn("rn", F.row_number().over(pick)).filter(
        F.col("rn") == 1
    )
    stats = backlog.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("open_orders").cast("long").alias("s"),
    )
    return best.crossJoin(F.broadcast(stats)).select(
        "n_days",
        F.col("day").alias("peak_day"),
        F.col("open_orders").alias("peak_backlog"),
        F.round(
            F.col("s").cast("double") / F.col("n_days").cast("double"), 6
        ).alias("mean_backlog"),
    )


SQL_ORDER_BACKLOG = f"""
WITH daily AS (
  SELECT epoch_us(o_orderdate) // {US_PER_DAY_DIV} AS day,
         CAST(count(*) AS BIGINT) AS c
  FROM orders GROUP BY 1
),
backlog AS (
  SELECT day,
         CAST(sum(c) OVER (ORDER BY day
               RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
              AS BIGINT) AS open_orders
  FROM daily
),
best AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (ORDER BY open_orders DESC, day ASC)
           AS rn
    FROM backlog)
  WHERE rn = 1
),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(open_orders) AS BIGINT) AS s
  FROM backlog
)
SELECT n_days, day AS peak_day, open_orders AS peak_backlog,
       round(CAST(s AS DOUBLE) / CAST(n_days AS DOUBLE), 6)
         AS mean_backlog
FROM best, stats
"""


# --------------------------------------------------------------------------
# ABC-XYZ inventory matrix (the planning-policy grid: Pareto revenue
# class x demand-variability class): ABC from the EXACT integer
# cumulative-share thresholds (cum·100 vs total·80/95 — the
# abc_analysis discipline), XYZ from the daily-demand CV (X ≤ 0.5,
# Y ≤ 1.0, else Z; CV from exact integer moment triples). Census of the
# nine cells with per-cell revenue share.
# --------------------------------------------------------------------------
def q_abc_xyz(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.floor(
            ntz_epoch_us(F.col("l_shipdate")) / F.lit(US_PER_DAY_DIV)
        )
        .cast("long")
        .alias("day"),
        F.col("l_quantity").cast("long").alias("q"),
        fixed6_long(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        ).alias("r6"),
    )
    daily = li.groupBy("l_partkey", "day").agg(
        F.sum("q").cast("long").alias("d"),
        F.sum("r6").cast("long").alias("rv"),
    ).localCheckpoint(eager=True)
    per_part = daily.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("nd"),
        F.sum("d").cast("long").alias("s"),
        F.sum(F.col("d") * F.col("d")).cast("long").alias("ss"),
        F.sum("rv").cast("long").alias("rev6"),
    )
    wc = Window.orderBy(F.col("rev6").desc(), F.col("l_partkey").asc())
    tot = per_part.agg(F.sum("rev6").cast("long").alias("t6"))
    cum = per_part.select(
        "l_partkey",
        "nd",
        "s",
        "ss",
        "rev6",
        F.sum("rev6").over(
            wc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .cast("long")
        .alias("cum6"),
    ).crossJoin(F.broadcast(tot))
    abc = (
        F.when(F.col("cum6") * 100 <= F.col("t6") * 80, F.lit("A"))
        .when(F.col("cum6") * 100 <= F.col("t6") * 95, F.lit("B"))
        .otherwise(F.lit("C"))
    )
    ndd = F.col("nd").cast("double")
    mu = F.col("s").cast("double") / ndd
    sd = F.sqrt(
        (F.col("ss").cast("double") - ndd * mu * mu)
        / (ndd - F.lit(1.0))
    )
    cv = sd / mu
    xyz = (
        F.when(F.col("nd") < 2, F.lit("Z"))
        .when(cv <= 0.5, F.lit("X"))
        .when(cv <= 1.0, F.lit("Y"))
        .otherwise(F.lit("Z"))
    )
    classed = cum.select(
        abc.alias("abc"), xyz.alias("xyz"), "rev6", "t6"
    )
    return (
        classed.groupBy("abc", "xyz")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.round(
                F.sum("rev6").cast("double")
                / F.max("t6").cast("double"),
                6,
            ).alias("rev_share"),
        )
        .orderBy("abc", "xyz")
    )


SQL_ABC_XYZ = f"""
WITH li AS (
  SELECT l_partkey, epoch_us(l_shipdate) // {US_PER_DAY_DIV} AS day,
         CAST(l_quantity AS BIGINT) AS q,
         {SQL_FIXED6_LONG.format(
             col="l_extendedprice * (1.0 - l_discount)")} AS r6
  FROM lineitem
),
daily AS (
  SELECT l_partkey, day, CAST(sum(q) AS BIGINT) AS d,
         CAST(sum(r6) AS BIGINT) AS rv
  FROM li GROUP BY 1, 2
),
per_part AS (
  SELECT l_partkey, CAST(count(*) AS BIGINT) AS nd,
         CAST(sum(d) AS BIGINT) AS s,
         CAST(sum(d * d) AS BIGINT) AS ss,
         CAST(sum(rv) AS BIGINT) AS rev6
  FROM daily GROUP BY l_partkey
),
tot AS (SELECT CAST(sum(rev6) AS BIGINT) AS t6 FROM per_part),
cum AS (
  SELECT *,
         CAST(sum(rev6) OVER (ORDER BY rev6 DESC, l_partkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum6
  FROM per_part
),
classed AS (
  SELECT CASE WHEN cum6 * 100 <= t6 * 80 THEN 'A'
              WHEN cum6 * 100 <= t6 * 95 THEN 'B'
              ELSE 'C' END AS abc,
         CASE WHEN nd < 2 THEN 'Z'
              WHEN sqrt((CAST(ss AS DOUBLE)
                         - CAST(nd AS DOUBLE)
                           * (CAST(s AS DOUBLE) / CAST(nd AS DOUBLE))
                           * (CAST(s AS DOUBLE) / CAST(nd AS DOUBLE)))
                        / (CAST(nd AS DOUBLE) - 1.0))
                   / (CAST(s AS DOUBLE) / CAST(nd AS DOUBLE)) <= 0.5
              THEN 'X'
              WHEN sqrt((CAST(ss AS DOUBLE)
                         - CAST(nd AS DOUBLE)
                           * (CAST(s AS DOUBLE) / CAST(nd AS DOUBLE))
                           * (CAST(s AS DOUBLE) / CAST(nd AS DOUBLE)))
                        / (CAST(nd AS DOUBLE) - 1.0))
                   / (CAST(s AS DOUBLE) / CAST(nd AS DOUBLE)) <= 1.0
              THEN 'Y' ELSE 'Z' END AS xyz,
         rev6, t6
  FROM cum, tot
)
SELECT abc, xyz, CAST(count(*) AS BIGINT) AS n_parts,
       round(CAST(sum(rev6) AS DOUBLE) / CAST(max(t6) AS DOUBLE), 6)
         AS rev_share
FROM classed
GROUP BY abc, xyz
ORDER BY abc, xyz
"""


# --------------------------------------------------------------------------
# Croston's method for intermittent demand (Croston 1972) with the
# Syntetos-Boylan approximation correction — the forecasting companion to
# safety_stock/reorder_interval/abc_xyz for sparse series, over the 10
# parts with the most demand days. Demand sizes (exact fixed6 daily
# quantity) and inter-demand intervals (exact day gaps) are smoothed with
# recency weights alpha*(1-alpha)^k over the last 20 demand epochs; the
# weights are precomputed ONCE in Python, scaled to 1e7 integers and
# inlined as identical literals on both sides (pow is 1-ulp and differs
# between Java and C libm — the ewma_control lesson), so every smoothed
# numerator/denominator is an exact BIGINT; the rate is one double
# divide, and SBA multiplies by CAST('0.9' AS DOUBLE).
# --------------------------------------------------------------------------
CROSTON_ALPHA = 0.2
CROSTON_K = 20
CROSTON_PARTS = 10
# alpha*(1-alpha)^k scaled to integer 1e7 units, k = 0 (most recent) ..
_CROSTON_W7 = [
    int(round(CROSTON_ALPHA * (1.0 - CROSTON_ALPHA) ** k * 1e7))
    for k in range(CROSTON_K)
]


def q_croston_demand(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("partkey"),
        F.floor(
            ntz_epoch_us(F.col("l_shipdate")) / F.lit(US_PER_DAY_DIV)
        )
        .cast("long")
        .alias("day"),
        fixed6_long(F.col("l_quantity")).alias("q6"),
    )
    demand = (
        li.groupBy("partkey", "day")
        .agg(F.sum("q6").cast("long").alias("q6"))
        .localCheckpoint(eager=True)
    )
    cnt = demand.groupBy("partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_demand_days")
    )
    wtop = Window.orderBy(F.desc("n_demand_days"), F.asc("partkey"))
    top = (
        cnt.withColumn("_rn", F.row_number().over(wtop))
        .filter(F.col("_rn") <= CROSTON_PARTS)
        .select("partkey", "n_demand_days")
    )
    d = demand.join(F.broadcast(top.select("partkey")), "partkey")
    wpart = Window.partitionBy("partkey").orderBy("day")
    wrec = Window.partitionBy("partkey").orderBy(F.desc("day"))
    warr = F.array(*[F.lit(w) for w in _CROSTON_W7])
    sized = (
        d.withColumn("gap", F.col("day") - F.lag("day").over(wpart))
        .withColumn("k", F.row_number().over(wrec) - 1)
        .filter(F.col("k") < CROSTON_K)
        .withColumn("w", F.element_at(warr, F.col("k") + 1).cast("long"))
    )
    zagg = sized.groupBy("partkey").agg(
        F.sum(F.col("w") * F.col("q6")).cast("long").alias("swq"),
        F.sum("w").cast("long").alias("swz"),
    )
    ints = sized.filter(F.col("gap").isNotNull()).withColumn(
        "ki", F.row_number().over(wrec) - 1
    )
    iagg = ints.groupBy("partkey").agg(
        F.sum(F.element_at(warr, F.col("ki") + 1).cast("long") * F.col("gap"))
        .cast("long")
        .alias("swg"),
        F.sum(F.element_at(warr, F.col("ki") + 1).cast("long"))
        .cast("long")
        .alias("swp"),
    )
    z_hat = F.col("swq").cast("double") / F.col("swz").cast("double") / F.lit(
        1000000.0
    )
    p_hat = F.col("swg").cast("double") / F.col("swp").cast("double")
    rate = (F.col("swq").cast("double") * F.col("swp").cast("double")) / (
        F.col("swz").cast("double") * F.col("swg").cast("double")
    ) / F.lit(1000000.0)
    return (
        top.join(zagg, "partkey")
        .join(iagg, "partkey")
        .select(
            "partkey",
            "n_demand_days",
            F.round(z_hat, 6).alias("z_hat"),
            F.round(p_hat, 6).alias("p_hat_days"),
            F.round(rate, 6).alias("croston_rate"),
            F.round(rate * F.lit(0.9), 6).alias("sba_rate"),
        )
        .orderBy("partkey")
    )


def _croston_sql() -> str:
    wvals = ",\n    ".join(f"({k}, {w})" for k, w in enumerate(_CROSTON_W7))
    return f"""
WITH w AS (SELECT * FROM (VALUES {wvals}) AS t(k, w)),
demand AS (
  SELECT l_partkey AS partkey, epoch_us(l_shipdate) // {US_PER_DAY_DIV} AS day,
         CAST(sum({SQL_FIXED6_LONG.format(col="l_quantity")}) AS BIGINT) AS q6
  FROM lineitem GROUP BY 1, 2
),
cnt AS (
  SELECT partkey, CAST(count(*) AS BIGINT) AS n_demand_days
  FROM demand GROUP BY partkey
),
top AS (
  SELECT partkey, n_demand_days FROM (
    SELECT *, row_number()
        OVER (ORDER BY n_demand_days DESC, partkey) AS rn
    FROM cnt)
  WHERE rn <= {CROSTON_PARTS}
),
sized AS (
  SELECT d.partkey, d.q6,
         d.day - lag(d.day) OVER (PARTITION BY d.partkey ORDER BY d.day)
           AS gap,
         row_number()
           OVER (PARTITION BY d.partkey ORDER BY d.day DESC) - 1 AS k
  FROM demand d JOIN top USING (partkey)
),
recent AS (SELECT * FROM sized WHERE k < {CROSTON_K}),
zagg AS (
  SELECT partkey, CAST(sum(w.w * q6) AS BIGINT) AS swq,
         CAST(sum(w.w) AS BIGINT) AS swz
  FROM recent JOIN w ON w.k = recent.k
  GROUP BY partkey
),
ints AS (
  SELECT partkey, gap,
         row_number()
           OVER (PARTITION BY partkey ORDER BY k) - 1 AS ki
  FROM recent WHERE gap IS NOT NULL
),
iagg AS (
  SELECT partkey, CAST(sum(w.w * gap) AS BIGINT) AS swg,
         CAST(sum(w.w) AS BIGINT) AS swp
  FROM ints JOIN w ON w.k = ints.ki
  GROUP BY partkey
)
SELECT t.partkey, t.n_demand_days,
       round(CAST(swq AS DOUBLE) / CAST(swz AS DOUBLE) / 1000000.0, 6)
         AS z_hat,
       round(CAST(swg AS DOUBLE) / CAST(swp AS DOUBLE), 6) AS p_hat_days,
       round((CAST(swq AS DOUBLE) * CAST(swp AS DOUBLE))
             / (CAST(swz AS DOUBLE) * CAST(swg AS DOUBLE)) / 1000000.0, 6)
         AS croston_rate,
       round((CAST(swq AS DOUBLE) * CAST(swp AS DOUBLE))
             / (CAST(swz AS DOUBLE) * CAST(swg AS DOUBLE)) / 1000000.0
             * CAST('0.9' AS DOUBLE), 6) AS sba_rate
FROM top t JOIN zagg USING (partkey) JOIN iagg USING (partkey)
ORDER BY partkey
"""


SQL_CROSTON_DEMAND = _croston_sql()


# --------------------------------------------------------------------------
# Newsvendor critical-fractile stocking quantities (Arrow & Harris &
# Marschak 1951 form): for the 10 busiest parts, the empirical-quantile
# order quantity q* = x_(ceil(n*f)) of daily demand at two cost
# scenarios — f = cu/(cu+co) = 2/5 (cheap overage) and 9/10 (costly
# underage, a service-level proxy). The fractile index is EXACT integer
# arithmetic (ceil(k*n/m) = (k*n + m - 1) DIV m on positives), the pick
# is a row_number on the total order (q6, day), and the mean is the
# fixed6 pattern — no percentile_cont/quantile builtin whose
# interpolation could differ between engines.
# --------------------------------------------------------------------------
def q_newsvendor(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("partkey"),
        F.floor(
            ntz_epoch_us(F.col("l_shipdate")) / F.lit(US_PER_DAY_DIV)
        )
        .cast("long")
        .alias("day"),
        fixed6_long(F.col("l_quantity")).alias("q6"),
    )
    demand = (
        li.groupBy("partkey", "day")
        .agg(F.sum("q6").cast("long").alias("q6"))
        .localCheckpoint(eager=True)
    )
    cnt = demand.groupBy("partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_demand_days")
    )
    wtop = Window.orderBy(F.desc("n_demand_days"), F.asc("partkey"))
    top = (
        cnt.withColumn("_rn", F.row_number().over(wtop))
        .filter(F.col("_rn") <= CROSTON_PARTS)
        .select("partkey", "n_demand_days")
    )
    wq = Window.partitionBy("partkey").orderBy(F.asc("q6"), F.asc("day"))
    ranked = (
        demand.join(F.broadcast(top), "partkey")
        .withColumn("rn", F.row_number().over(wq))
    )
    n = F.col("n_demand_days")
    idx40 = F.expr("(2 * n_demand_days + 4) DIV 5")
    idx90 = F.expr("(9 * n_demand_days + 9) DIV 10")
    return (
        ranked.groupBy("partkey", "n_demand_days")
        .agg(
            F.sum("q6").cast("long").alias("_s6"),
            F.max(F.when(F.col("rn") == idx40, F.col("q6")))
            .cast("long")
            .alias("_q40"),
            F.max(F.when(F.col("rn") == idx90, F.col("q6")))
            .cast("long")
            .alias("_q90"),
        )
        .select(
            "partkey",
            "n_demand_days",
            F.round(
                F.col("_s6").cast("double")
                / n.cast("double")
                / F.lit(1000000.0),
                6,
            ).alias("mean_demand"),
            F.round(F.col("_q40") / F.lit(1000000.0), 6).alias("q_star_40"),
            F.round(F.col("_q90") / F.lit(1000000.0), 6).alias("q_star_90"),
        )
        .orderBy("partkey")
    )


SQL_NEWSVENDOR = f"""
WITH demand AS (
  SELECT l_partkey AS partkey, epoch_us(l_shipdate) // {US_PER_DAY_DIV} AS day,
         CAST(sum({SQL_FIXED6_LONG.format(col="l_quantity")}) AS BIGINT) AS q6
  FROM lineitem GROUP BY 1, 2
),
cnt AS (
  SELECT partkey, CAST(count(*) AS BIGINT) AS n_demand_days
  FROM demand GROUP BY partkey
),
top AS (
  SELECT partkey, n_demand_days FROM (
    SELECT *, row_number()
        OVER (ORDER BY n_demand_days DESC, partkey) AS rn
    FROM cnt)
  WHERE rn <= {CROSTON_PARTS}
),
ranked AS (
  SELECT d.partkey, t.n_demand_days, d.q6,
         row_number()
           OVER (PARTITION BY d.partkey ORDER BY d.q6 ASC, d.day ASC) AS rn
  FROM demand d JOIN top t USING (partkey)
)
SELECT partkey, n_demand_days,
       round(CAST(CAST(sum(q6) AS BIGINT) AS DOUBLE)
             / CAST(n_demand_days AS DOUBLE) / 1000000.0, 6) AS mean_demand,
       round(CAST(max(CASE WHEN rn = (2 * n_demand_days + 4) // 5
                           THEN q6 END) AS BIGINT) / 1000000.0, 6)
         AS q_star_40,
       round(CAST(max(CASE WHEN rn = (9 * n_demand_days + 9) // 10
                           THEN q6 END) AS BIGINT) / 1000000.0, 6)
         AS q_star_90
FROM ranked
GROUP BY partkey, n_demand_days
ORDER BY partkey
"""


# --------------------------------------------------------------------------
# Order-to-ship lag deciles: the fulfillment-latency distribution
# (per-lineitem l_shipdate - o_orderdate in EXACT integer days), its
# deciles picked by the newsvendor ceil-index discipline — explicit
# order statistics x_(ceil(q*n)) on a (lag, orderkey, linenumber) total
# order, no percentile interpolation that could differ between engines —
# plus the exact mean. The report a fulfillment SLA review reads next to
# late_supplier's binary lateness count.
# --------------------------------------------------------------------------
def q_ship_lag_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.floor(
            ntz_epoch_us(F.col("l_shipdate")) / F.lit(US_PER_DAY_DIV)
        )
        .cast("long")
        .alias("sday"),
    )
    orders = _read(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.floor(
            ntz_epoch_us(F.col("o_orderdate")) / F.lit(US_PER_DAY_DIV)
        )
        .cast("long")
        .alias("oday"),
    )
    lags = li.join(
        orders, li["l_orderkey"] == orders["o_orderkey"]
    ).select((F.col("sday") - F.col("oday")).alias("lag"))
    # scale shape: aggregate to the DISTINCT lag values first (bounded —
    # integer days span a few hundred), then one tiny cumulative window;
    # x_(idx) = the smallest lag whose cumulative count reaches idx, so
    # no corpus-wide row_number sort is ever needed
    hist = (
        lags.groupBy("lag")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    wcum = Window.orderBy("lag").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.withColumn(
        "cum", F.sum("cnt").over(wcum).cast("long")
    )
    agg = hist.agg(
        F.sum(F.col("lag") * F.col("cnt")).cast("long").alias("slag"),
        F.sum("cnt").cast("long").alias("_n"),
    )
    grid = spark.createDataFrame([(d,) for d in range(1, 10)], "d long")
    picks = (
        cum.crossJoin(F.broadcast(agg.select("_n")))
        .crossJoin(F.broadcast(grid))
        .groupBy("d")
        .agg(
            F.min(
                F.when(
                    F.col("cum") >= F.expr("(d * _n + 9) DIV 10"),
                    F.col("lag"),
                )
            )
            .cast("long")
            .alias("lag_days")
        )
        .select(
            (F.col("d") * 10).cast("long").alias("percentile"), "lag_days"
        )
    )
    mean_row = agg.select(
        F.lit(0).cast("long").alias("percentile"),
        F.round(
            F.col("slag").cast("double") / F.col("_n").cast("double"), 0
        )
        .cast("long")
        .alias("lag_days"),
    )
    return mean_row.unionByName(picks).orderBy("percentile")


SQL_SHIP_LAG_DECILES = f"""
WITH lags AS (
  SELECT (epoch_us(l.l_shipdate) // {US_PER_DAY_DIV})
         - (epoch_us(o.o_orderdate) // {US_PER_DAY_DIV}) AS lag
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
hist AS (
  SELECT lag, CAST(count(*) AS BIGINT) AS cnt FROM lags GROUP BY lag
),
nn AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM hist),
cum AS (
  SELECT lag,
         CAST(sum(cnt) OVER (ORDER BY lag
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum
  FROM hist
),
picks AS (
  SELECT CAST(d * 10 AS BIGINT) AS percentile,
         CAST(min(CASE WHEN cum >= (d * nn.n + 9) // 10 THEN lag END)
              AS BIGINT) AS lag_days
  FROM cum, nn, (SELECT unnest(range(1, 10)) AS d) g
  GROUP BY d, nn.n
),
mean_row AS (
  SELECT CAST(0 AS BIGINT) AS percentile,
         CAST(round(CAST(sum(lag * cnt) AS DOUBLE)
                    / CAST(max(nn.n) AS DOUBLE)) AS BIGINT) AS lag_days
  FROM hist, nn
)
SELECT * FROM mean_row
UNION ALL
SELECT * FROM picks
ORDER BY percentile
"""


# --------------------------------------------------------------------------
# Laspeyres / Paasche / Fisher price indices between the order-timeline
# halves (the index-number decomposition behind pvm_bridge's additive
# story): per-part unit prices are ratios of exact fixed6 revenue and
# quantity sums; each basket term p_t * q_s rounds to a fixed6 BIGINT
# BEFORE the cross-part sum (invariant 4 — a bare double SUM over parts
# could flip the 6th decimal with aggregation order), so the three
# indices are single divides (Fisher adds one sqrt), rounded 6. Only
# parts traded in BOTH halves enter (the matched-basket convention).
# --------------------------------------------------------------------------
def q_price_indices(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("partkey"),
        ntz_epoch_us(F.col("l_shipdate")).alias("_us"),
        fixed6_long(F.col("l_extendedprice")).alias("ext6"),
        fixed6_long(F.col("l_quantity")).alias("qty6"),
    )
    bounds = li.agg(
        F.min("_us").alias("t0"), F.max("_us").alias("t1")
    )
    half = (
        li.crossJoin(F.broadcast(bounds))
        .select(
            "partkey",
            "ext6",
            "qty6",
            (F.col("_us") * 2 > F.col("t0") + F.col("t1"))
            .cast("int")
            .alias("h"),
        )
        .groupBy("partkey", "h")
        .agg(
            F.sum("ext6").cast("long").alias("se"),
            F.sum("qty6").cast("long").alias("sq"),
        )
    )
    h0 = half.filter(F.col("h") == 0).select(
        "partkey",
        F.col("se").alias("se0"),
        F.col("sq").alias("sq0"),
    )
    h1 = half.filter(F.col("h") == 1).select(
        "partkey",
        F.col("se").alias("se1"),
        F.col("sq").alias("sq1"),
    )
    j = h0.join(h1, "partkey")
    p0 = F.col("se0").cast("double") / F.col("sq0").cast("double")
    p1 = F.col("se1").cast("double") / F.col("sq1").cast("double")
    q0 = F.col("sq0").cast("double") / F.lit(1000000.0)
    q1 = F.col("sq1").cast("double") / F.lit(1000000.0)

    def t6(x) -> F.Column:
        return F.round(x * F.lit(1000000.0), 0).cast("long")

    terms = j.select(
        t6(p1 * q0).alias("p1q0"),
        t6(p0 * q0).alias("p0q0"),
        t6(p1 * q1).alias("p1q1"),
        t6(p0 * q1).alias("p0q1"),
    )
    agg = terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum("p1q0").cast("long").alias("s10"),
        F.sum("p0q0").cast("long").alias("s00"),
        F.sum("p1q1").cast("long").alias("s11"),
        F.sum("p0q1").cast("long").alias("s01"),
    )
    lasp = F.col("s10").cast("double") / F.col("s00").cast("double")
    paas = F.col("s11").cast("double") / F.col("s01").cast("double")
    return agg.select(
        "n_parts",
        F.round(lasp, 6).alias("laspeyres"),
        F.round(paas, 6).alias("paasche"),
        F.round(F.sqrt(lasp * paas), 6).alias("fisher"),
    )


SQL_PRICE_INDICES = f"""
WITH li AS (
  SELECT l_partkey AS partkey, epoch_us(l_shipdate) AS us,
         {SQL_FIXED6_LONG.format(col="l_extendedprice")} AS ext6,
         {SQL_FIXED6_LONG.format(col="l_quantity")} AS qty6
  FROM lineitem
),
bounds AS (SELECT min(us) AS t0, max(us) AS t1 FROM li),
half AS (
  SELECT partkey,
         CASE WHEN us * 2 > bounds.t0 + bounds.t1 THEN 1 ELSE 0 END AS h,
         CAST(sum(ext6) AS BIGINT) AS se,
         CAST(sum(qty6) AS BIGINT) AS sq
  FROM li, bounds
  GROUP BY partkey, CASE WHEN us * 2 > bounds.t0 + bounds.t1
                         THEN 1 ELSE 0 END
),
j AS (
  SELECT h0.partkey,
         h0.se AS se0, h0.sq AS sq0, h1.se AS se1, h1.sq AS sq1
  FROM (SELECT * FROM half WHERE h = 0) h0
  JOIN (SELECT * FROM half WHERE h = 1) h1 USING (partkey)
),
terms AS (
  SELECT
    CAST(round((CAST(se1 AS DOUBLE) / CAST(sq1 AS DOUBLE))
               * (CAST(sq0 AS DOUBLE) / 1000000.0) * 1000000.0)
         AS BIGINT) AS p1q0,
    CAST(round((CAST(se0 AS DOUBLE) / CAST(sq0 AS DOUBLE))
               * (CAST(sq0 AS DOUBLE) / 1000000.0) * 1000000.0)
         AS BIGINT) AS p0q0,
    CAST(round((CAST(se1 AS DOUBLE) / CAST(sq1 AS DOUBLE))
               * (CAST(sq1 AS DOUBLE) / 1000000.0) * 1000000.0)
         AS BIGINT) AS p1q1,
    CAST(round((CAST(se0 AS DOUBLE) / CAST(sq0 AS DOUBLE))
               * (CAST(sq1 AS DOUBLE) / 1000000.0) * 1000000.0)
         AS BIGINT) AS p0q1
  FROM j
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_parts,
         CAST(sum(p1q0) AS BIGINT) AS s10,
         CAST(sum(p0q0) AS BIGINT) AS s00,
         CAST(sum(p1q1) AS BIGINT) AS s11,
         CAST(sum(p0q1) AS BIGINT) AS s01
  FROM terms
)
SELECT n_parts,
       round(CAST(s10 AS DOUBLE) / CAST(s00 AS DOUBLE), 6) AS laspeyres,
       round(CAST(s11 AS DOUBLE) / CAST(s01 AS DOUBLE), 6) AS paasche,
       round(sqrt((CAST(s10 AS DOUBLE) / CAST(s00 AS DOUBLE))
                  * (CAST(s11 AS DOUBLE) / CAST(s01 AS DOUBLE))), 6)
         AS fisher
FROM agg
"""


# --------------------------------------------------------------------------
# Lead-time variance decomposition by supplier (one-way random-effects
# ANOVA → ICC(1), Shrout-Fleiss): how much of order→ship lag variance
# is BETWEEN suppliers (a supplier quality signal) vs within (order
# noise). All sufficient statistics are exact BIGINTs (integer-day lags,
# per-supplier count/sum/sum-of-squares); SSB/SSW/MSB/MSW/F/ICC are
# single double expressions spelled identically on both sides, with the
# unbalanced-design n0 correction. Completes the ANOVA family next to
# anova_dow (fixed effects) and theil_decomposition (inequality).
# --------------------------------------------------------------------------
def q_leadtime_icc(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        F.floor(
            ntz_epoch_us(F.col("l_shipdate")) / F.lit(US_PER_DAY_DIV)
        )
        .cast("long")
        .alias("sday"),
    )
    orders = _read(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.floor(
            ntz_epoch_us(F.col("o_orderdate")) / F.lit(US_PER_DAY_DIV)
        )
        .cast("long")
        .alias("oday"),
    )
    lags = li.join(
        orders, li["l_orderkey"] == orders["o_orderkey"]
    ).select(
        "l_suppkey", (F.col("sday") - F.col("oday")).alias("lag")
    )
    per = lags.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("long").alias("ng"),
        F.sum("lag").cast("long").alias("sg"),
        F.sum(F.col("lag") * F.col("lag")).cast("long").alias("ssg"),
    )
    # invariant 4: the between-groups power sum Σ sg²/ng is quantized to
    # fixed6 per supplier BEFORE the sum (exact BIGINT addition, order
    # free); Σ ng² is pure integer — no order-unspecified double SUM
    agg = per.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("ng").cast("long").alias("n"),
        F.sum("sg").cast("long").alias("s"),
        F.sum("ssg").cast("long").alias("ss"),
        F.sum(
            F.round(
                F.col("sg").cast("double")
                * F.col("sg").cast("double")
                / F.col("ng").cast("double")
                * F.lit(1000000.0),
                0,
            ).cast("long")
        )
        .cast("long")
        .alias("sb6"),
        F.sum(F.col("ng") * F.col("ng")).cast("long").alias("sn2"),
    )
    kd = F.col("k").cast("double")
    nd = F.col("n").cast("double")
    sd = F.col("s").cast("double")
    ssd = F.col("ss").cast("double")
    sb = F.col("sb6").cast("double") / F.lit(1000000.0)
    ssb = sb - sd * sd / nd
    ssw = ssd - sb
    msb = ssb / (kd - F.lit(1.0))
    msw = ssw / (nd - kd)
    n0 = (nd - F.col("sn2").cast("double") / nd) / (kd - F.lit(1.0))
    icc = (msb - msw) / (msb + (n0 - F.lit(1.0)) * msw)
    return agg.select(
        F.col("k").alias("n_suppliers"),
        F.col("n").alias("n_lineitems"),
        F.round(msb, 6).alias("ms_between"),
        F.round(msw, 6).alias("ms_within"),
        F.round(msb / msw, 6).alias("f_stat"),
        F.round(n0, 6).alias("n0"),
        F.round(icc, 6).alias("icc1"),
    )


SQL_LEADTIME_ICC = f"""
WITH lags AS (
  SELECT l.l_suppkey,
         (epoch_us(l.l_shipdate) // {US_PER_DAY_DIV})
         - (epoch_us(o.o_orderdate) // {US_PER_DAY_DIV}) AS lag
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
per AS (
  SELECT l_suppkey, CAST(count(*) AS BIGINT) AS ng,
         CAST(sum(lag) AS BIGINT) AS sg,
         CAST(sum(lag * lag) AS BIGINT) AS ssg
  FROM lags GROUP BY l_suppkey
),
agg0 AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         CAST(sum(ng) AS BIGINT) AS n,
         CAST(sum(sg) AS BIGINT) AS s,
         CAST(sum(ssg) AS BIGINT) AS ss,
         CAST(sum(CAST(round(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
             / CAST(ng AS DOUBLE) * 1000000.0) AS BIGINT)) AS BIGINT)
           AS sb6,
         CAST(sum(ng * ng) AS BIGINT) AS sn2i
  FROM per
),
agg AS (
  SELECT k, n, s, ss,
         CAST(sb6 AS DOUBLE) / 1000000.0 AS sb,
         CAST(sn2i AS DOUBLE) AS sn2
  FROM agg0
)
SELECT k AS n_suppliers, n AS n_lineitems,
       round((sb - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                   / CAST(n AS DOUBLE))
             / (CAST(k AS DOUBLE) - 1.0), 6) AS ms_between,
       round((CAST(ss AS DOUBLE) - sb)
             / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)), 6) AS ms_within,
       round(((sb - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                    / CAST(n AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0))
             / ((CAST(ss AS DOUBLE) - sb)
                / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))), 6) AS f_stat,
       round((CAST(n AS DOUBLE) - sn2 / CAST(n AS DOUBLE))
             / (CAST(k AS DOUBLE) - 1.0), 6) AS n0,
       round((((sb - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                     / CAST(n AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0))
              - ((CAST(ss AS DOUBLE) - sb)
                 / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))))
             / (((sb - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                      / CAST(n AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0))
                + (((CAST(n AS DOUBLE) - sn2 / CAST(n AS DOUBLE))
                    / (CAST(k AS DOUBLE) - 1.0)) - 1.0)
                  * ((CAST(ss AS DOUBLE) - sb)
                     / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)))), 6)
         AS icc1
FROM agg
"""


# --------------------------------------------------------------------------
# Perfect-order rate by month (the classic fulfillment KPI: an order is
# perfect iff EVERY lineitem ships within the SLA window): per order, a
# min-over-lineitems flag (all-shipped-on-time = min(on_time) = 1), then
# an exact monthly rate keyed on the tz-invariant order month. SLA = 30
# integer days on the exact day lag; all counts BIGINT, one divide.
# --------------------------------------------------------------------------
PERFECT_SLA_DAYS = 30


def q_perfect_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.floor(
            ntz_epoch_us(F.col("l_shipdate")) / F.lit(US_PER_DAY_DIV)
        )
        .cast("long")
        .alias("sday"),
    )
    orders = _read(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.floor(
            ntz_epoch_us(F.col("o_orderdate")) / F.lit(US_PER_DAY_DIV)
        )
        .cast("long")
        .alias("oday"),
        F.floor(
            F.floor(
                ntz_epoch_us(F.col("o_orderdate")) / F.lit(US_PER_DAY_DIV)
            )
            / F.lit(30)
        )
        .cast("long")
        .alias("omonth"),
    )
    per_order = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            "o_orderkey",
            "omonth",
            (
                (F.col("sday") - F.col("oday")) <= PERFECT_SLA_DAYS
            ).cast("long").alias("ontime"),
        )
        .groupBy("o_orderkey", "omonth")
        .agg(F.min("ontime").cast("long").alias("perfect"))
    )
    return (
        per_order.groupBy("omonth")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("perfect").cast("long").alias("n_perfect"),
        )
        .select(
            F.col("omonth").alias("month_bucket"),
            "n_orders",
            "n_perfect",
            F.round(
                F.col("n_perfect").cast("double")
                / F.col("n_orders").cast("double"),
                6,
            ).alias("perfect_rate"),
        )
        .orderBy("month_bucket")
    )


SQL_PERFECT_ORDERS = f"""
WITH per_order AS (
  SELECT o.o_orderkey,
         (epoch_us(o.o_orderdate) // {US_PER_DAY_DIV}) // 30 AS omonth,
         CAST(min(CASE WHEN (epoch_us(l.l_shipdate) // {US_PER_DAY_DIV})
                            - (epoch_us(o.o_orderdate) // {US_PER_DAY_DIV})
                            <= {PERFECT_SLA_DAYS}
                       THEN 1 ELSE 0 END) AS BIGINT) AS perfect
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  GROUP BY o.o_orderkey, (epoch_us(o.o_orderdate) // {US_PER_DAY_DIV}) // 30
)
SELECT omonth AS month_bucket,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(perfect) AS BIGINT) AS n_perfect,
       round(CAST(sum(perfect) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
         AS perfect_rate
FROM per_order
GROUP BY omonth
ORDER BY month_bucket
"""


QUERIES = {
    "abc_analysis": q_abc_analysis,
    "abc_xyz": q_abc_xyz,
    "brand_concentration": q_brand_concentration,
    "churn_hazard": q_churn_hazard,
    "conversion_lag": q_conversion_lag,
    "croston_demand": q_croston_demand,
    "cust_balance": q_cust_balance,
    "cust_order_dist": q_cust_order_dist,
    "discount_elasticity": q_discount_elasticity,
    "disjunctive_revenue": q_disjunctive_revenue,
    "forecast_revenue": q_forecast_revenue,
    "large_orders": q_large_orders,
    "late_supplier": q_late_supplier,
    "leadtime_icc": q_leadtime_icc,
    "market_basket": q_market_basket,
    "market_share": q_market_share,
    "nation_revenue": q_nation_revenue,
    "newsvendor": q_newsvendor,
    "order_backlog": q_order_backlog,
    "order_gini": q_order_gini,
    "order_priority_check": q_order_priority_check,
    "perfect_orders": q_perfect_orders,
    "pivot_report": q_pivot_report,
    "price_indices": q_price_indices,
    "pricing_summary": q_pricing_summary,
    "promo_share": q_promo_share,
    "region_top_nations": q_region_top_nations,
    "returns_report": q_returns_report,
    "rfm_segments": q_rfm_segments,
    "rollup_report": q_rollup_report,
    "safety_stock": q_safety_stock,
    "segment_migration": q_segment_migration,
    "ship_lag_deciles": q_ship_lag_deciles,
    "ship_priority": q_ship_priority,
    "shipmode_priority": q_shipmode_priority,
    "skyline_frontier": q_skyline_frontier,
    "small_qty_revenue": q_small_qty_revenue,
    "supplier_relation_count": q_supplier_relation_count,
    "theil_sen": q_theil_sen,
    "top_supplier": q_top_supplier,
    "value_at_risk": q_value_at_risk,
    "volume_shipping": q_volume_shipping,
}

ORACLES = {
    "abc_analysis": SQL_ABC_ANALYSIS,
    "abc_xyz": SQL_ABC_XYZ,
    "brand_concentration": SQL_BRAND_CONCENTRATION,
    "churn_hazard": SQL_CHURN_HAZARD,
    "conversion_lag": SQL_CONVERSION_LAG,
    "croston_demand": SQL_CROSTON_DEMAND,
    "cust_balance": SQL_CUST_BALANCE,
    "cust_order_dist": SQL_CUST_ORDER_DIST,
    "discount_elasticity": SQL_DISCOUNT_ELASTICITY,
    "disjunctive_revenue": SQL_DISJUNCTIVE_REVENUE,
    "forecast_revenue": SQL_FORECAST_REVENUE,
    "large_orders": SQL_LARGE_ORDERS,
    "late_supplier": SQL_LATE_SUPPLIER,
    "leadtime_icc": SQL_LEADTIME_ICC,
    "market_basket": SQL_MARKET_BASKET,
    "market_share": SQL_MARKET_SHARE,
    "nation_revenue": SQL_NATION_REVENUE,
    "newsvendor": SQL_NEWSVENDOR,
    "order_backlog": SQL_ORDER_BACKLOG,
    "order_gini": SQL_ORDER_GINI,
    "order_priority_check": SQL_ORDER_PRIORITY_CHECK,
    "perfect_orders": SQL_PERFECT_ORDERS,
    "pivot_report": SQL_PIVOT_REPORT,
    "price_indices": SQL_PRICE_INDICES,
    "pricing_summary": SQL_PRICING_SUMMARY,
    "promo_share": SQL_PROMO_SHARE,
    "region_top_nations": SQL_REGION_TOP_NATIONS,
    "returns_report": SQL_RETURNS_REPORT,
    "rfm_segments": SQL_RFM_SEGMENTS,
    "rollup_report": SQL_ROLLUP_REPORT,
    "safety_stock": SQL_SAFETY_STOCK,
    "segment_migration": SQL_SEGMENT_MIGRATION,
    "ship_lag_deciles": SQL_SHIP_LAG_DECILES,
    "ship_priority": SQL_SHIP_PRIORITY,
    "shipmode_priority": SQL_SHIPMODE_PRIORITY,
    "skyline_frontier": SQL_SKYLINE_FRONTIER,
    "small_qty_revenue": SQL_SMALL_QTY_REVENUE,
    "supplier_relation_count": SQL_SUPPLIER_RELATION_COUNT,
    "theil_sen": SQL_THEIL_SEN,
    "top_supplier": SQL_TOP_SUPPLIER,
    "value_at_risk": SQL_VALUE_AT_RISK,
    "volume_shipping": SQL_VOLUME_SHIPPING,
}
