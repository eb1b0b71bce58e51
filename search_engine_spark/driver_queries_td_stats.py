"""Classical statistical tests and estimator pairs.

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
    TOKEN_RUN,
    US_PER_DAY_DIV,
    US_PER_HOUR_DIV,
    _EDGES_CTE,
    _edges,
    _lang_sql,
    _read,
)

# --------------------------------------------------------------------------
# Efraimidis-Spirakis weighted sample (mixing.py weighted_sample): global
# top-50 by ln(u)/w with w = whitespace-token count — the token-budget-
# proportional subset. Ranking is over the ROUNDED key (doc_id tiebreak),
# so both engines rank identically.
# --------------------------------------------------------------------------
ES_K = 50
ES_SEED = "es"


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training_data import mixing as M

    docs = _read(spark, sf_dir, "documents")
    weighted = X.token_counts(docs).select("doc_id", "ws_tokens")
    return M.weighted_sample(
        weighted, k=ES_K, weight_col="ws_tokens", seed=ES_SEED
    ).select("doc_id", F.col("weight").cast("long").alias("weight"),
             "es_key", "rank")


SQL_WEIGHTED_SAMPLE = f"""
WITH w AS (
  SELECT doc_id, CAST({SQL_WS_TOKENS.format(col="text")} AS BIGINT) AS weight
  FROM documents
),
s AS (
  SELECT doc_id, weight,
         round(ln((CAST('0x' || substr(md5('{ES_SEED}:' ||
                     CAST(doc_id AS VARCHAR)), 1, 13) AS BIGINT) + 1)
                  / CAST(4503599627370496 AS DOUBLE)) / weight, 6) AS es_key
  FROM w WHERE doc_id IS NOT NULL AND weight > 0
)
SELECT doc_id, weight, es_key,
       CAST(row_number() OVER (ORDER BY es_key DESC, doc_id) AS BIGINT)
         AS rank
FROM s
ORDER BY es_key DESC, doc_id LIMIT {ES_K}
"""


# --------------------------------------------------------------------------
# Feature-correlation report: exact Pearson r between per-doc feature
# pairs (token count vs char count vs distinct-type count) — the corpus-
# diagnostics mainstay behind quality-model feature selection (a feature
# pair with |r|→1 is redundant; near 0, independent signal). EXACT
# integer moments: every feature is an exact BIGINT per doc, all six
# sums (Sx, Sy, Sxx, Syy, Sxy per pair) accumulate in BIGINT (order-free,
# invariant 4 by omission), and r is ONE final double expression of
# those exact integers rounded 6. One corpus scan: all three features
# compute per row, one aggregate row carries every moment, and the three
# report rows project from it (no per-pair re-scan).
# --------------------------------------------------------------------------
def q_feature_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    feats = docs.select(
        F.size(
            F.expr(f"regexp_extract_all(lower(text), '{TOKEN_RUN}', 0)")
        ).cast("long").alias("tok"),
        F.size(
            F.array_distinct(
                F.expr(f"regexp_extract_all(lower(text), '{TOKEN_RUN}', 0)")
            )
        ).cast("long").alias("typ"),
        F.col("n_chars").cast("long").alias("chr"),
    )
    m = feats.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        *[
            F.sum(c).cast("long").alias(f"s_{c}")
            for c in ("tok", "typ", "chr")
        ],
        *[
            F.sum(F.col(a) * F.col(b)).cast("long").alias(f"s_{a}{b}")
            for a, b in (
                ("tok", "tok"), ("typ", "typ"), ("chr", "chr"),
                ("tok", "chr"), ("tok", "typ"), ("chr", "typ"),
            )
        ],
    )

    def _r(x: str, y: str) -> Column:
        num = (
            F.col("n") * F.col(f"s_{x}{y}") - F.col(f"s_{x}") * F.col(f"s_{y}")
        ).cast("double")
        vx = (
            F.col("n") * F.col(f"s_{x}{x}") - F.col(f"s_{x}") * F.col(f"s_{x}")
        ).cast("double")
        vy = (
            F.col("n") * F.col(f"s_{y}{y}") - F.col(f"s_{y}") * F.col(f"s_{y}")
        ).cast("double")
        return F.round(num / F.sqrt(vx * vy), 6)

    parts = [
        m.select(
            F.lit(x).alias("feature_x"),
            F.lit(y).alias("feature_y"),
            F.col("n"),
            _r(x, y).alias("pearson_r"),
        )
        for x, y in (("tok", "chr"), ("tok", "typ"), ("chr", "typ"))
    ]
    res = parts[0]
    for p in parts[1:]:
        res = res.unionByName(p)
    return res


SQL_FEATURE_CORRELATION = f"""
WITH feats AS (
  SELECT CAST(len(regexp_extract_all(lower(text), '{TOKEN_RUN}'))
              AS BIGINT) AS tok,
         CAST(len(list_distinct(regexp_extract_all(lower(text),
              '{TOKEN_RUN}'))) AS BIGINT) AS typ,
         CAST(n_chars AS BIGINT) AS chr
  FROM documents
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(tok) AS BIGINT) AS s_tok,
         CAST(sum(typ) AS BIGINT) AS s_typ,
         CAST(sum(chr) AS BIGINT) AS s_chr,
         CAST(sum(tok * tok) AS BIGINT) AS s_toktok,
         CAST(sum(typ * typ) AS BIGINT) AS s_typtyp,
         CAST(sum(chr * chr) AS BIGINT) AS s_chrchr,
         CAST(sum(tok * chr) AS BIGINT) AS s_tokchr,
         CAST(sum(tok * typ) AS BIGINT) AS s_toktyp,
         CAST(sum(chr * typ) AS BIGINT) AS s_chrtyp
  FROM feats
)
SELECT 'tok' AS feature_x, 'chr' AS feature_y, n,
       round(CAST(n * s_tokchr - s_tok * s_chr AS DOUBLE)
             / sqrt(CAST(n * s_toktok - s_tok * s_tok AS DOUBLE)
                    * CAST(n * s_chrchr - s_chr * s_chr AS DOUBLE)), 6)
         AS pearson_r
FROM m
UNION ALL
SELECT 'tok', 'typ', n,
       round(CAST(n * s_toktyp - s_tok * s_typ AS DOUBLE)
             / sqrt(CAST(n * s_toktok - s_tok * s_tok AS DOUBLE)
                    * CAST(n * s_typtyp - s_typ * s_typ AS DOUBLE)), 6)
FROM m
UNION ALL
SELECT 'chr', 'typ', n,
       round(CAST(n * s_chrtyp - s_chr * s_typ AS DOUBLE)
             / sqrt(CAST(n * s_chrchr - s_chr * s_chr AS DOUBLE)
                    * CAST(n * s_typtyp - s_typ * s_typ AS DOUBLE)), 6)
FROM m
"""


# --------------------------------------------------------------------------
# Equi-depth histogram of the events value column (the optimizer-
# statistics companion to value_histogram's equi-WIDTH buckets —
# equi-depth is what selectivity estimators actually store): ntile(10)
# over a TOTAL order (value6, event_id — the integer grid + unique key
# makes the tiling identical in both engines despite ntile's
# arbitrary-split reputation), then per bucket min/max/count and the
# fixed6 sum. Values quantized to integer micros once (invariant 4).
# --------------------------------------------------------------------------
EQUIDEPTH_BUCKETS = 10


def q_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events").select(
        "event_id", fixed6_long(F.col("value")).alias("v6")
    )
    w = Window.orderBy("v6", "event_id")
    tiled = events.withColumn(
        "bucket", F.ntile(EQUIDEPTH_BUCKETS).over(w).cast("long")
    )
    return (
        tiled.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.min("v6") / F.lit(1000000.0), 6).alias("min_value"),
            F.round(F.max("v6") / F.lit(1000000.0), 6).alias("max_value"),
            F.round(F.sum("v6") / F.lit(1000000.0), 6).alias("sum_value"),
        )
        .orderBy("bucket")
    )


SQL_EQUIDEPTH_HISTOGRAM = f"""
WITH t AS (
  SELECT CAST(round(value * 1000000.0) AS BIGINT) AS v6,
         ntile({EQUIDEPTH_BUCKETS}) OVER (ORDER BY
           CAST(round(value * 1000000.0) AS BIGINT), event_id) AS bucket
  FROM events
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       round(min(v6) / 1000000.0, 6) AS min_value,
       round(max(v6) / 1000000.0, 6) AS max_value,
       round(CAST(sum(v6) AS BIGINT) / 1000000.0, 6) AS sum_value
FROM t
GROUP BY bucket
ORDER BY bucket
"""


# --------------------------------------------------------------------------
# Interpolated (type-7 / PERCENTILE_CONT) group percentiles — the
# SQL-standard-surface companion to length_quantiles' type-1 integer
# quantiles: per event type, p25/p50/p75/p90 of the value column via
# Spark percentile() vs DuckDB quantile_cont(). Values are quantized to
# the fixed6 grid FIRST, so the interpolation runs on integral doubles
# where a last-bit implementation difference (x+(y-x)*f vs x*(1-f)+y*f)
# sits ~8 orders below the round-6 display grid. The 0.25/0.5/0.75
# fractions are dyadic-exact; 0.9 is the same IEEE literal both sides.
# --------------------------------------------------------------------------
def q_group_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events").select(
        "event_type", fixed6_long(F.col("value")).alias("v6")
    )
    def pq(p):
        return F.round(
            F.expr(f"percentile(v6, {p}D)") / F.lit(1000000.0), 6
        )
    return (
        events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            pq(0.25).alias("p25"),
            pq(0.5).alias("p50"),
            pq(0.75).alias("p75"),
            pq(0.9).alias("p90"),
        )
        .orderBy("event_type")
    )


SQL_GROUP_PERCENTILES = """
WITH t AS (
  SELECT event_type, CAST(round(value * 1000000.0) AS BIGINT) AS v6
  FROM events
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       round(quantile_cont(v6, 0.25) / 1000000.0, 6) AS p25,
       round(quantile_cont(v6, 0.5) / 1000000.0, 6) AS p50,
       round(quantile_cont(v6, 0.75) / 1000000.0, 6) AS p75,
       round(quantile_cont(v6, 0.9) / 1000000.0, 6) AS p90
FROM t
GROUP BY event_type
ORDER BY event_type
"""


# --------------------------------------------------------------------------
# MAD-based robust outlier gate (Leys et al. 2013's recommended
# replacement for the z-score — the median absolute deviation ignores
# the outliers it hunts, unlike events_anomaly's mean/stddev): per event
# type, median(v), MAD = median(|v - median|), and the count of events
# beyond 3*MAD. Medians are type-7 interpolated on the fixed6 integer
# grid (exact halves — the same grid-safety argument as
# group_percentiles); the 3*MAD threshold compare happens on those
# half-grid doubles, exactly representable in both engines. No 1.4826
# consistency constant (a non-exact float literal) — the raw-MAD rule is
# documented as such.
# --------------------------------------------------------------------------
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events").select(
        "event_type", fixed6_long(F.col("value")).alias("v6")
    )
    med = events.groupBy("event_type").agg(
        F.expr("percentile(v6, 0.5D)").alias("med6")
    )
    dev = events.join(F.broadcast(med), "event_type").select(
        "event_type",
        "v6",
        "med6",
        F.abs(F.col("v6").cast("double") - F.col("med6")).alias("dev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(dev, 0.5D)").alias("mad6")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.max("med6") / F.lit(1000000.0), 6).alias("median"),
            F.round(F.max("mad6") / F.lit(1000000.0), 6).alias("mad"),
            F.sum(
                F.when(F.col("dev") > 3.0 * F.col("mad6"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
        .orderBy("event_type")
    )


SQL_MAD_OUTLIERS = """
WITH t AS (
  SELECT event_type, CAST(round(value * 1000000.0) AS BIGINT) AS v6
  FROM events
),
med AS (
  SELECT event_type, quantile_cont(v6, 0.5) AS med6 FROM t GROUP BY event_type
),
dev AS (
  SELECT t.event_type, t.v6, med.med6,
         abs(CAST(t.v6 AS DOUBLE) - med.med6) AS dev
  FROM t JOIN med USING (event_type)
),
mad AS (
  SELECT event_type, quantile_cont(dev, 0.5) AS mad6
  FROM dev GROUP BY event_type
)
SELECT dev.event_type, CAST(count(*) AS BIGINT) AS n,
       round(max(dev.med6) / 1000000.0, 6) AS median,
       round(max(mad.mad6) / 1000000.0, 6) AS mad,
       CAST(sum(CASE WHEN dev.dev > 3.0 * mad.mad6 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM dev JOIN mad USING (event_type)
GROUP BY dev.event_type
ORDER BY dev.event_type
"""


# --------------------------------------------------------------------------
# Simpson diversity of the vocabulary per source (1 - lambda, the
# probability two random tokens differ — the concentration-side
# companion to lexical_diversity's TTR and chao1_vocab's richness
# estimator; dominated-by-few-terms sources score low): lambda =
# sum n_i(n_i-1) / (N(N-1)) — EVERY quantity an exact BIGINT, one ratio.
# --------------------------------------------------------------------------
def q_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RUN), F.lit(0))
        ).alias("term"),
    )
    tc = toks.groupBy("source", "term").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    stats = tc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sum("n").cast("long").alias("big_n"),
        F.sum(F.col("n") * (F.col("n") - 1)).cast("long").alias("pairs"),
    )
    lam = F.col("pairs").cast("double") / (
        F.col("big_n").cast("double") * (F.col("big_n") - 1).cast("double")
    )
    return stats.select(
        "source",
        "n_terms",
        F.col("big_n").alias("n_tokens"),
        F.round(lam, 6).alias("simpson_lambda"),
        F.round(F.lit(1.0) - lam, 6).alias("simpson_diversity"),
    ).orderBy("source")


SQL_SIMPSON_DIVERSITY = f"""
WITH tc AS (
  SELECT source, term, CAST(count(*) AS BIGINT) AS n FROM (
    SELECT source,
           unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term
    FROM documents
  ) GROUP BY source, term
),
stats AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_terms,
         CAST(sum(n) AS BIGINT) AS big_n,
         CAST(sum(n * (n - 1)) AS BIGINT) AS pairs
  FROM tc GROUP BY source
)
SELECT source, n_terms, big_n AS n_tokens,
       round(CAST(pairs AS DOUBLE)
             / (CAST(big_n AS DOUBLE) * CAST(big_n - 1 AS DOUBLE)), 6)
         AS simpson_lambda,
       round(1.0 - CAST(pairs AS DOUBLE)
             / (CAST(big_n AS DOUBLE) * CAST(big_n - 1 AS DOUBLE)), 6)
         AS simpson_diversity
FROM stats
ORDER BY source
"""


# --------------------------------------------------------------------------
# Benford first-digit audit of the events value column (Newcomb-Benford
# law — the classic fabricated-data / unit-mixing detector in financial
# and telemetry QA): observed first-significant-digit counts vs the
# n*log10(1+1/d) expectation (log10 on NINE data-independent inputs) and
# each digit's chi-square contribution. Digit extracted from the fixed6
# integer's decimal string — pure string/int ops, no float log of data.
# --------------------------------------------------------------------------
def q_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events").select(
        fixed6_long(F.col("value")).alias("v6")
    ).filter(F.col("v6") > 0)
    digits = events.select(
        F.substring(F.col("v6").cast("string"), 1, 1).cast("long").alias("d")
    )
    obs = digits.groupBy("d").agg(
        F.count(F.lit(1)).cast("long").alias("observed")
    )
    n = obs.agg(F.sum("observed").cast("long").alias("_n"))
    exp = (
        F.col("_n").cast("double")
        * F.log2(F.lit(1.0) + F.lit(1.0) / F.col("d").cast("double"))
        / F.log2(F.lit(10.0))
    )
    return (
        obs.crossJoin(F.broadcast(n))
        .select(
            "d",
            "observed",
            F.round(exp, 6).alias("expected"),
            F.round(
                (F.col("observed").cast("double") - exp)
                * (F.col("observed").cast("double") - exp)
                / exp,
                6,
            ).alias("chi2_contrib"),
        )
        .orderBy("d")
    )


SQL_BENFORD_AUDIT = """
WITH v AS (
  SELECT CAST(round(value * 1000000.0) AS BIGINT) AS v6 FROM events
),
digits AS (
  SELECT CAST(substring(CAST(v6 AS VARCHAR), 1, 1) AS BIGINT) AS d
  FROM v WHERE v6 > 0
),
obs AS (SELECT d, CAST(count(*) AS BIGINT) AS observed FROM digits GROUP BY d),
n AS (SELECT CAST(sum(observed) AS BIGINT) AS n FROM obs)
SELECT d, observed,
       round(CAST(n.n AS DOUBLE)
             * log2(1.0 + 1.0 / CAST(d AS DOUBLE)) / log2(10.0), 6)
         AS expected,
       round((CAST(observed AS DOUBLE)
              - CAST(n.n AS DOUBLE)
                * log2(1.0 + 1.0 / CAST(d AS DOUBLE)) / log2(10.0))
             * (CAST(observed AS DOUBLE)
                - CAST(n.n AS DOUBLE)
                  * log2(1.0 + 1.0 / CAST(d AS DOUBLE)) / log2(10.0))
             / (CAST(n.n AS DOUBLE)
                * log2(1.0 + 1.0 / CAST(d AS DOUBLE)) / log2(10.0)), 6)
         AS chi2_contrib
FROM obs, n
ORDER BY d
"""


# --------------------------------------------------------------------------
# Power-law degree MLE (Clauset, Shalizi & Newman 2009 — the estimator
# that replaced eyeballed log-log slopes): alpha_hat = 1 + n/sum ln(d/dmin)
# over undirected degrees >= dmin=2, the continuous-approximation MLE
# the paper recommends reporting alongside n. ln on integer degrees is
# the same data-dependent libm surface every idf pair proves; the sum's
# order jitter sits ~10 orders below the round-6 grid.
# --------------------------------------------------------------------------
POWERLAW_DMIN = 2


def q_powerlaw_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, edges = _edges(spark, sf_dir)
    und = (
        edges.select(
            F.least("source_doc_id", "target_doc_id").alias("ua"),
            F.greatest("source_doc_id", "target_doc_id").alias("ub"),
        )
        .distinct()
    )
    deg = (
        und.select(F.col("ua").alias("v"))
        .unionByName(und.select(F.col("ub").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
        .filter(F.col("d") >= POWERLAW_DMIN)
    )
    stats = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_tail"),
        F.sum(
            F.log(F.col("d").cast("double") / F.lit(float(POWERLAW_DMIN)))
        ).alias("slog"),
        F.max("d").cast("long").alias("d_max"),
    )
    return stats.select(
        "n_tail",
        "d_max",
        F.round(
            F.lit(1.0) + F.col("n_tail").cast("double") / F.col("slog"), 6
        ).alias("alpha_hat"),
    )


SQL_POWERLAW_FIT = f"""
WITH {_EDGES_CTE},
und AS (
  SELECT DISTINCT least(source_doc_id, target_doc_id) AS ua,
                  greatest(source_doc_id, target_doc_id) AS ub
  FROM edges
),
deg AS (
  SELECT v, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT ua AS v FROM und UNION ALL SELECT ub FROM und
  ) GROUP BY v
  HAVING count(*) >= {POWERLAW_DMIN}
),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_tail,
         sum(ln(CAST(d AS DOUBLE) / {POWERLAW_DMIN}.0)) AS slog,
         CAST(max(d) AS BIGINT) AS d_max
  FROM deg
)
SELECT n_tail, d_max,
       round(1.0 + CAST(n_tail AS DOUBLE) / slog, 6) AS alpha_hat
FROM stats
"""


# --------------------------------------------------------------------------
# Source x language independence test (Pearson chi-square over the
# contingency table + Cramer's V effect size — the "is lang identically
# distributed across sources?" gate a mixing policy checks before
# stratifying on either): expected counts are exact-rational
# row*col/n from BIGINTs, each cell contributes one identical double
# expression; V = sqrt(chi2/(n*min(r-1,c-1))). Cell sum order jitter
# ~1e-16 relative, round-6 displayed.
# --------------------------------------------------------------------------
def q_contingency_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents").select("source", "lang")
    cells = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("o")
    )
    rows = cells.groupBy("source").agg(
        F.sum("o").cast("long").alias("rn")
    )
    cols = cells.groupBy("lang").agg(F.sum("o").cast("long").alias("cn"))
    n = cells.agg(F.sum("o").cast("long").alias("_n"))
    # distinct source/lang counts read off the marginals — no two-column
    # countDistinct (which would plan an Expand; invariant-6 guard)
    dims = rows.agg(F.count(F.lit(1)).cast("long").alias("_r")).crossJoin(
        F.broadcast(cols.agg(F.count(F.lit(1)).cast("long").alias("_c")))
    )
    e = (
        F.col("rn").cast("double")
        * F.col("cn").cast("double")
        / F.col("_n").cast("double")
    )
    contrib = (F.col("o").cast("double") - e) * (
        F.col("o").cast("double") - e
    ) / e
    chi2 = (
        cells.join(F.broadcast(rows), "source")
        .join(F.broadcast(cols), "lang")
        .crossJoin(F.broadcast(n))
        .select(contrib.alias("t"), "_n")
        .groupBy("_n")
        .agg(F.sum("t").alias("chi2"))
    )
    return (
        chi2.crossJoin(F.broadcast(dims))
        .select(
            F.col("_n").alias("n_docs"),
            ((F.col("_r") - 1) * (F.col("_c") - 1)).cast("long").alias("dof"),
            F.round("chi2", 6).alias("chi2"),
            F.round(
                F.sqrt(
                    F.col("chi2")
                    / (
                        F.col("_n").cast("double")
                        * F.least(F.col("_r") - 1, F.col("_c") - 1).cast(
                            "double"
                        )
                    )
                ),
                6,
            ).alias("cramers_v"),
        )
    )


SQL_CONTINGENCY_CHI2 = """
WITH cells AS (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS o
  FROM documents GROUP BY source, lang
),
rows_ AS (SELECT source, CAST(sum(o) AS BIGINT) AS rn FROM cells GROUP BY source),
cols_ AS (SELECT lang, CAST(sum(o) AS BIGINT) AS cn FROM cells GROUP BY lang),
n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
dims AS (
  SELECT CAST(count(DISTINCT source) AS BIGINT) AS r,
         CAST(count(DISTINCT lang) AS BIGINT) AS c
  FROM cells
),
chi AS (
  SELECT sum((CAST(o AS DOUBLE)
              - CAST(rn AS DOUBLE) * CAST(cn AS DOUBLE) / CAST(n.n AS DOUBLE))
             * (CAST(o AS DOUBLE)
                - CAST(rn AS DOUBLE) * CAST(cn AS DOUBLE)
                  / CAST(n.n AS DOUBLE))
             / (CAST(rn AS DOUBLE) * CAST(cn AS DOUBLE)
                / CAST(n.n AS DOUBLE))) AS chi2
  FROM cells JOIN rows_ USING (source) JOIN cols_ USING (lang), n
)
SELECT n.n AS n_docs,
       CAST((dims.r - 1) * (dims.c - 1) AS BIGINT) AS dof,
       round(chi.chi2, 6) AS chi2,
       round(sqrt(chi.chi2 / (CAST(n.n AS DOUBLE)
                              * CAST(least(dims.r - 1, dims.c - 1)
                                     AS DOUBLE))), 6) AS cramers_v
FROM chi, n, dims
"""


# --------------------------------------------------------------------------
# Theil index decomposition (Theil 1967 — the inequality measure
# order_gini cannot give you: it decomposes EXACTLY into between-group
# + within-group terms, here across customer nations): per-customer
# revenue x_i, T = sum (x_i/X) ln(x_i / (X/n)); T_between uses group
# totals, T_within = T - T_between (exact identity, computed
# independently on both engines as the same expressions). Revenues are
# fixed6 BIGINTs; ln on their ratios is the idf-proven libm surface;
# sums of per-row doubles display round-6.
# --------------------------------------------------------------------------
def q_theil_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _read(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cust = _read(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = _read(spark, sf_dir, "orders").select(
        "o_custkey", fixed6_long(F.col("o_totalprice")).alias("p6")
    )
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(F.sum("p6").cast("long").alias("x6"))
        .join(cust, F.col("o_custkey") == cust["c_custkey"])
        .join(
            F.broadcast(nation),
            cust["c_nationkey"] == nation["n_nationkey"],
        )
        .select("n_name", "x6")
        .localCheckpoint(eager=True)
    )
    tot = per_cust.agg(
        F.sum("x6").cast("long").alias("_x"),
        F.count(F.lit(1)).cast("long").alias("_n"),
    )
    xi, xt, nt = (
        F.col("x6").cast("double"),
        F.col("_x").cast("double"),
        F.col("_n").cast("double"),
    )
    t_total = (
        per_cust.crossJoin(F.broadcast(tot))
        .select(((xi / xt) * F.log(xi * nt / xt)).alias("t"))
        .agg(F.sum("t").alias("t_total"))
    )
    grp = per_cust.groupBy("n_name").agg(
        F.sum("x6").cast("long").alias("g6"),
        F.count(F.lit(1)).cast("long").alias("gn"),
    )
    gx, gn = F.col("g6").cast("double"), F.col("gn").cast("double")
    t_between = (
        grp.crossJoin(F.broadcast(tot))
        .select(((gx / xt) * F.log(gx * nt / (xt * gn))).alias("t"))
        .agg(F.sum("t").alias("t_between"))
    )
    return (
        t_total.crossJoin(F.broadcast(t_between))
        .select(
            F.round("t_total", 6).alias("theil_total"),
            F.round("t_between", 6).alias("theil_between"),
            F.round(F.col("t_total") - F.col("t_between"), 6).alias(
                "theil_within"
            ),
        )
    )


SQL_THEIL_DECOMPOSITION = """
WITH per_cust AS (
  SELECT n.n_name,
         CAST(sum(CAST(round(o.o_totalprice * 1000000.0) AS BIGINT))
              AS BIGINT) AS x6
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY o.o_custkey, n.n_name
),
tot AS (SELECT CAST(sum(x6) AS BIGINT) AS x, CAST(count(*) AS BIGINT) AS n
        FROM per_cust),
tt AS (
  SELECT sum((CAST(x6 AS DOUBLE) / CAST(tot.x AS DOUBLE))
             * ln(CAST(x6 AS DOUBLE) * CAST(tot.n AS DOUBLE)
                  / CAST(tot.x AS DOUBLE))) AS t_total
  FROM per_cust, tot
),
grp AS (
  SELECT n_name, CAST(sum(x6) AS BIGINT) AS g6,
         CAST(count(*) AS BIGINT) AS gn
  FROM per_cust GROUP BY n_name
),
tb AS (
  SELECT sum((CAST(g6 AS DOUBLE) / CAST(tot.x AS DOUBLE))
             * ln(CAST(g6 AS DOUBLE) * CAST(tot.n AS DOUBLE)
                  / (CAST(tot.x AS DOUBLE) * CAST(gn AS DOUBLE)))) AS t_between
  FROM grp, tot
)
SELECT round(tt.t_total, 6) AS theil_total,
       round(tb.t_between, 6) AS theil_between,
       round(tt.t_total - tb.t_between, 6) AS theil_within
FROM tt, tb
"""


# --------------------------------------------------------------------------
# Kendall tau-b rank agreement (Kendall 1938, the tie-corrected form) between
# customer revenue and order count, over the top-100 revenue customers —
# the rank-correlation complement to the Spearman pair: tau counts
# concordant/discordant PAIRS, so every comparison is pure integer sign
# arithmetic on fixed6 revenue and BIGINT counts; only the final
# normalization touches doubles. The self-join is bounded at 100 rows by
# construction (top-k first), so the 4,950-pair cross is broadcast-cheap
# at any corpus scale.
# --------------------------------------------------------------------------
def q_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _read(spark, sf_dir, "orders").select(
        "o_custkey", fixed6_long(F.col("o_totalprice")).alias("p6")
    )
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum("p6").cast("long").alias("rev6"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
    )
    w = Window.orderBy(F.col("rev6").desc(), F.col("o_custkey").asc())
    top = (
        per_cust.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 100)
        .select("o_custkey", "rev6", "n_orders")
        .localCheckpoint(eager=True)
    )
    a, b = top.alias("a"), top.alias("b")
    pairs = a.join(
        F.broadcast(b), F.col("a.o_custkey") < F.col("b.o_custkey")
    ).select(
        (F.col("a.rev6") - F.col("b.rev6")).alias("dx"),
        (F.col("a.n_orders") - F.col("b.n_orders")).alias("dy"),
    )
    stats = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n0"),
        F.sum(
            F.when(F.signum("dx") * F.signum("dy") > 0, 1).otherwise(0)
        ).cast("long").alias("conc"),
        F.sum(
            F.when(F.signum("dx") * F.signum("dy") < 0, 1).otherwise(0)
        ).cast("long").alias("disc"),
        F.sum(F.when(F.col("dx") == 0, 1).otherwise(0)).cast("long").alias("tx"),
        F.sum(F.when(F.col("dy") == 0, 1).otherwise(0)).cast("long").alias("ty"),
    )
    n0, c, d = (
        F.col("n0").cast("double"),
        F.col("conc").cast("double"),
        F.col("disc").cast("double"),
    )
    return stats.select(
        "n0",
        "conc",
        "disc",
        "tx",
        "ty",
        F.round(
            (c - d)
            / F.sqrt(
                (n0 - F.col("tx").cast("double"))
                * (n0 - F.col("ty").cast("double"))
            ),
            6,
        ).alias("tau_b"),
    )


SQL_KENDALL_TAU = f"""
WITH per_cust AS (
  SELECT o_custkey,
         CAST(sum({SQL_FIXED6_LONG.format(col="o_totalprice")}) AS BIGINT)
           AS rev6,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY o_custkey
),
top AS (
  SELECT o_custkey, rev6, n_orders
  FROM (SELECT *, row_number() OVER (ORDER BY rev6 DESC, o_custkey ASC)
               AS rn
        FROM per_cust)
  WHERE rn <= 100
),
pairs AS (
  SELECT a.rev6 - b.rev6 AS dx, a.n_orders - b.n_orders AS dy
  FROM top a JOIN top b ON a.o_custkey < b.o_custkey
),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n0,
         CAST(sum(CASE WHEN sign(dx) * sign(dy) > 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS conc,
         CAST(sum(CASE WHEN sign(dx) * sign(dy) < 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS disc,
         CAST(sum(CASE WHEN dx = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tx,
         CAST(sum(CASE WHEN dy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ty
  FROM pairs
)
SELECT n0, conc, disc, tx, ty,
       round((CAST(conc AS DOUBLE) - CAST(disc AS DOUBLE))
             / sqrt((CAST(n0 AS DOUBLE) - CAST(tx AS DOUBLE))
                    * (CAST(n0 AS DOUBLE) - CAST(ty AS DOUBLE))), 6)
         AS tau_b
FROM stats
"""


# --------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov test (Smirnov 1939) between the hourly
# activity distributions of click vs purchase events: D = max |ECDF_1 -
# ECDF_2| over the union hour grid. Cumulative counts are BIGINT window
# sums (CAST in DuckDB — window sum of BIGINT is HUGEINT, invariant 1);
# the ECDF difference divides identical BIGINT operands on both engines,
# and max over doubles is order-free. Also reports the scaled statistic
# sqrt(n1*n2/(n1+n2))*D used for significance lookup.
# --------------------------------------------------------------------------
def q_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    counts = (
        events.filter(F.col("event_type").isin("click", "purchase"))
        .select(
            "event_type",
            F.floor(ntz_epoch_us(F.col("ts")) / F.lit(US_PER_HOUR_DIV))
            .cast("long")
            .alias("hour"),
        )
        .groupBy("hour")
        .agg(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            .cast("long")
            .alias("c1"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long")
            .alias("c2"),
        )
    )
    w = Window.orderBy("hour").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = counts.select(
        F.sum("c1").over(w).cast("long").alias("cum1"),
        F.sum("c2").over(w).cast("long").alias("cum2"),
    )
    tot = counts.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    d = cum.crossJoin(F.broadcast(tot)).select(
        "n1",
        "n2",
        F.abs(
            F.col("cum1").cast("double") / F.col("n1").cast("double")
            - F.col("cum2").cast("double") / F.col("n2").cast("double")
        ).alias("diff"),
    )
    n1d, n2d = F.col("n1").cast("double"), F.col("n2").cast("double")
    return d.groupBy("n1", "n2").agg(
        F.round(F.max("diff"), 6).alias("ks_d"),
        F.round(
            F.sqrt(n1d * n2d / (n1d + n2d)) * F.max("diff"), 6
        ).alias("ks_scaled"),
    )


SQL_KS_TWO_SAMPLE = f"""
WITH counts AS (
  SELECT epoch_us(ts) // {US_PER_HOUR_DIV} AS hour,
         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS c1,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS c2
  FROM events
  WHERE event_type IN ('click', 'purchase')
  GROUP BY 1
),
cum AS (
  SELECT CAST(sum(c1) OVER (ORDER BY hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum1,
         CAST(sum(c2) OVER (ORDER BY hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum2
  FROM counts
),
tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2
        FROM counts)
SELECT n1, n2,
       round(max(abs(CAST(cum1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                     - CAST(cum2 AS DOUBLE) / CAST(n2 AS DOUBLE))), 6)
         AS ks_d,
       round(sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                  / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)))
             * max(abs(CAST(cum1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                       - CAST(cum2 AS DOUBLE) / CAST(n2 AS DOUBLE))), 6)
         AS ks_scaled
FROM cum, tot
GROUP BY n1, n2
"""


# --------------------------------------------------------------------------
# Wald-Wolfowitz runs test (1940) for randomness of daily revenue around
# its median: sign each day (+ above / - below the interpolated median,
# exact-equal days dropped per the standard prescription), count maximal
# same-sign runs with a lag over the day order, and normalize. Signs and
# the run count R are pure integers; only the final z-score touches
# doubles. Complements the paired test family (chi2, z, KS, F) with a
# sequential-dependence test.
# --------------------------------------------------------------------------
def q_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    med = daily.agg(F.expr("percentile(rev, 0.5D)").alias("med"))
    signed = (
        daily.crossJoin(F.broadcast(med))
        .select(
            "day",
            F.when(F.col("rev").cast("double") > F.col("med"), 1)
            .when(F.col("rev").cast("double") < F.col("med"), -1)
            .otherwise(0)
            .alias("s"),
        )
        .filter(F.col("s") != 0)
    )
    w = Window.orderBy("day")
    flagged = signed.select(
        "s",
        F.when(
            F.lag("s").over(w).isNull()
            | (F.col("s") != F.lag("s").over(w)),
            1,
        )
        .otherwise(0)
        .alias("new_run"),
    )
    agg = flagged.agg(
        F.sum("new_run").cast("long").alias("runs"),
        F.sum(F.when(F.col("s") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(F.when(F.col("s") == -1, 1).otherwise(0))
        .cast("long")
        .alias("n2"),
    )
    n1d, n2d = F.col("n1").cast("double"), F.col("n2").cast("double")
    nd = n1d + n2d
    two = F.lit(2.0) * n1d * n2d
    mu = two / nd + F.lit(1.0)
    var = two * (two - nd) / (nd * nd * (nd - F.lit(1.0)))
    return agg.select(
        "n1",
        "n2",
        "runs",
        F.round((F.col("runs").cast("double") - mu) / F.sqrt(var), 6).alias(
            "z"
        ),
    )


SQL_RUNS_TEST = f"""
WITH daily AS (
  SELECT epoch_us(o_orderdate) // {US_PER_DAY_DIV} AS day,
         CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
           AS rev
  FROM orders GROUP BY 1
),
med AS (SELECT quantile_cont(rev, 0.5) AS med FROM daily),
signed AS (
  SELECT day,
         CASE WHEN CAST(rev AS DOUBLE) > med THEN 1
              WHEN CAST(rev AS DOUBLE) < med THEN -1 ELSE 0 END AS s
  FROM daily, med
),
nz AS (SELECT day, s FROM signed WHERE s <> 0),
flagged AS (
  SELECT s,
         CASE WHEN lag(s) OVER (ORDER BY day) IS NULL
                   OR s <> lag(s) OVER (ORDER BY day)
              THEN 1 ELSE 0 END AS new_run
  FROM nz
),
agg AS (
  SELECT CAST(sum(new_run) AS BIGINT) AS runs,
         CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n2
  FROM flagged
)
SELECT n1, n2, runs,
       round((CAST(runs AS DOUBLE)
              - (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                 / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) + 1.0))
             / sqrt(2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                    * (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                       - (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)))
                    / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                       * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                       * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1.0))),
             6) AS z
FROM agg
"""


# --------------------------------------------------------------------------
# Hill tail-index estimator (Hill 1975) on order prices: alpha_hat =
# k / sum_{i<=k} ln(x_(i) / x_(k+1)) over the k=100 largest order
# totals. The top-(k+1) order statistics are selected with an exact
# integer tiebreak (price DESC, orderkey ASC), packed into ONE in-plan
# array sorted by rank, and the log-sum is an ORDERED FOLD (invariant 4:
# aggregate() in Spark, list_sum(list_transform(...)) in DuckDB) so both
# engines add the same 100 doubles in the same order.
# --------------------------------------------------------------------------
def q_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _read(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_totalprice").alias("p")
    )
    w = Window.orderBy(F.col("p").desc(), F.col("o_orderkey").asc())
    top = (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 101)
        .select("rn", "p")
    )
    arr = top.groupBy().agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("rn"), F.col("p")))
        ).alias("a")
    )
    return arr.select(
        F.lit(100).cast("long").alias("k"),
        F.round(F.expr("element_at(a, 101).p"), 6).alias("x_k1"),
        F.round(
            F.expr(
                "aggregate(slice(a, 1, 100), cast(0.0 as double),"
                " (acc, x) -> acc + ln(x.p / element_at(a, 101).p))"
            ),
            6,
        ).alias("log_sum"),
        F.round(
            F.lit(100.0)
            / F.expr(
                "aggregate(slice(a, 1, 100), cast(0.0 as double),"
                " (acc, x) -> acc + ln(x.p / element_at(a, 101).p))"
            ),
            6,
        ).alias("hill_alpha"),
    )


SQL_HILL_TAIL_INDEX = """
WITH ranked AS (
  SELECT o_totalprice AS p,
         row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC)
           AS rn
  FROM orders
),
arr AS (
  SELECT list(p ORDER BY rn) AS a FROM ranked WHERE rn <= 101
)
SELECT CAST(100 AS BIGINT) AS k,
       round(a[101], 6) AS x_k1,
       round(list_sum(list_transform(a[1:100], x -> ln(x / a[101]))), 6)
         AS log_sum,
       round(100.0
             / list_sum(list_transform(a[1:100], x -> ln(x / a[101]))), 6)
         AS hill_alpha
FROM arr
"""


# --------------------------------------------------------------------------
# Cohen's kappa (Cohen 1960) between the n-gram language-ID heuristic and
# the corpus's recorded lang label — the chance-corrected agreement
# score a curation pipeline reports before trusting an automatic
# classifier. Reuses the language_id pair's classifier on both sides
# (X.language_id / _lang_sql), so the confusion matrix is exact integer
# counts; po, pe, kappa are one double expression each over bounded
# (|langs|²) cells.
# --------------------------------------------------------------------------
def q_cohen_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    pred = X.language_id(docs).select("lang", "pred_lang")
    conf = pred.groupBy("lang", "pred_lang").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    ).localCheckpoint(eager=True)
    tot = conf.agg(
        F.sum("c").cast("long").alias("nn"),
        F.sum(F.when(F.col("lang") == F.col("pred_lang"), F.col("c")).otherwise(0))
        .cast("long")
        .alias("agree"),
    )
    rows = conf.groupBy("lang").agg(F.sum("c").cast("long").alias("rm"))
    cols = conf.groupBy("pred_lang").agg(
        F.sum("c").cast("long").alias("cm")
    )
    pe_sum = (
        rows.join(
            cols, rows["lang"] == cols["pred_lang"], "inner"
        )
        .agg(
            F.sum(F.col("rm").cast("double") * F.col("cm").cast("double"))
            .alias("pe_raw")
        )
    )
    nd = F.col("nn").cast("double")
    po = F.col("agree").cast("double") / nd
    pe = F.col("pe_raw") / (nd * nd)
    return (
        tot.crossJoin(F.broadcast(pe_sum))
        .select(
            F.col("nn").alias("n_docs"),
            "agree",
            F.round(po, 6).alias("po"),
            F.round(pe, 6).alias("pe"),
            F.round((po - pe) / (F.lit(1.0) - pe), 6).alias("kappa"),
        )
    )


def _sql_cohen_kappa() -> str:
    return f"""
WITH conf AS (
  SELECT d.lang, p.pred_lang, CAST(count(*) AS BIGINT) AS c
  FROM ({_lang_sql()}) p
  JOIN documents d USING (doc_id)
  GROUP BY d.lang, p.pred_lang
),
tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS nn,
         CAST(sum(CASE WHEN lang = pred_lang THEN c ELSE 0 END) AS BIGINT)
           AS agree
  FROM conf
),
rm AS (SELECT lang, CAST(sum(c) AS BIGINT) AS rm FROM conf GROUP BY lang),
cm AS (SELECT pred_lang, CAST(sum(c) AS BIGINT) AS cm
       FROM conf GROUP BY pred_lang),
pe AS (
  SELECT sum(CAST(rm.rm AS DOUBLE) * CAST(cm.cm AS DOUBLE)) AS pe_raw
  FROM rm JOIN cm ON rm.lang = cm.pred_lang
)
SELECT nn AS n_docs, agree,
       round(CAST(agree AS DOUBLE) / CAST(nn AS DOUBLE), 6) AS po,
       round(pe_raw / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)), 6) AS pe,
       round((CAST(agree AS DOUBLE) / CAST(nn AS DOUBLE)
              - pe_raw / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)))
             / (1.0 - pe_raw / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE))),
             6) AS kappa
FROM tot, pe
"""


SQL_COHEN_KAPPA = _sql_cohen_kappa()


# --------------------------------------------------------------------------
# Gumbel block-maxima fit (Gumbel 1958, method of moments) on weekly
# maxima of daily revenue: block max is an EXACT BIGINT (max of summed
# cents), so the only float work is the moment pass (exact integer sum +
# the anova-precedent double sum of squares) and the closed-form MOM
# inversion beta = s*sqrt(6)/pi, mu = xbar - gamma*beta. Reports the
# 52-week return level mu - beta*ln(-ln(1 - 1/52)); constants enter via
# CAST('...' AS DOUBLE) (invariant 1).
# --------------------------------------------------------------------------
def q_gumbel_maxima(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    weekly = (
        orders.groupBy("day")
        .agg(F.sum("cents").cast("long").alias("rev"))
        .groupBy((F.col("day") / 7).cast("long").alias("week"))
        .agg(F.max("rev").cast("long").alias("wmax"))
    )
    xd = F.col("wmax").cast("double")
    mom = weekly.agg(
        F.count(F.lit(1)).cast("long").alias("n_weeks"),
        F.sum("wmax").cast("long").alias("xsum"),
        F.sum(xd * xd).alias("xsq"),
    )
    nd = F.col("n_weeks").cast("double")
    mean = F.col("xsum").cast("double") / nd
    var = (F.col("xsq") - nd * mean * mean) / (nd - F.lit(1.0))
    beta = F.sqrt(var * F.lit(6.0)) / F.lit(math.pi)
    mu = mean - F.lit(0.5772156649015329) * beta
    ret52 = mu - beta * F.log(-F.log(F.lit(1.0) - F.lit(1.0) / F.lit(52.0)))
    cents = F.lit(100.0)
    return mom.select(
        "n_weeks",
        F.round(mean / cents, 6).alias("mean_weekly_max"),
        F.round(beta / cents, 6).alias("gumbel_beta"),
        F.round(mu / cents, 6).alias("gumbel_mu"),
        F.round(ret52 / cents, 6).alias("return_level_52w"),
    )


SQL_GUMBEL_MAXIMA = f"""
WITH daily AS (
  SELECT epoch_us(o_orderdate) // {US_PER_DAY_DIV} AS day,
         CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
           AS rev
  FROM orders GROUP BY 1
),
weekly AS (
  SELECT day // 7 AS week, CAST(max(rev) AS BIGINT) AS wmax
  FROM daily GROUP BY 1
),
mom AS (
  SELECT CAST(count(*) AS BIGINT) AS n_weeks,
         CAST(sum(wmax) AS BIGINT) AS xsum,
         sum(CAST(wmax AS DOUBLE) * CAST(wmax AS DOUBLE)) AS xsq
  FROM weekly
),
d AS (
  SELECT n_weeks,
         CAST(xsum AS DOUBLE) / CAST(n_weeks AS DOUBLE) AS mean,
         (xsq - CAST(n_weeks AS DOUBLE)
                * (CAST(xsum AS DOUBLE) / CAST(n_weeks AS DOUBLE))
                * (CAST(xsum AS DOUBLE) / CAST(n_weeks AS DOUBLE)))
           / (CAST(n_weeks AS DOUBLE) - 1.0) AS var
  FROM mom
),
fit AS (
  SELECT n_weeks, mean,
         sqrt(var * 6.0) / pi() AS beta
  FROM d
)
SELECT n_weeks,
       round(mean / CAST('100.0' AS DOUBLE), 6) AS mean_weekly_max,
       round(beta / CAST('100.0' AS DOUBLE), 6) AS gumbel_beta,
       round((mean - CAST('0.5772156649015329' AS DOUBLE) * beta)
             / CAST('100.0' AS DOUBLE), 6) AS gumbel_mu,
       round((mean - CAST('0.5772156649015329' AS DOUBLE) * beta
              - beta * ln(-ln(1.0 - 1.0 / 52.0)))
             / CAST('100.0' AS DOUBLE), 6) AS return_level_52w
FROM fit
"""


# --------------------------------------------------------------------------
# Lorenz decile table (Lorenz 1905 — the CURVE behind the order_gini
# scalar): customers ranked by revenue into NTILE(10) deciles with a
# total (rev6 ASC, custkey ASC) tiebreak, per-decile revenue share and
# cumulative share. Revenue stays fixed6 BIGINT through both sums; the
# two ratios divide identical integer operands on both engines.
# --------------------------------------------------------------------------
def q_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _read(spark, sf_dir, "orders").select(
        "o_custkey", fixed6_long(F.col("o_totalprice")).alias("p6")
    )
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum("p6").cast("long").alias("rev6")
    )
    w = Window.orderBy(F.col("rev6").asc(), F.col("o_custkey").asc())
    tiled = per_cust.select(
        "rev6", F.ntile(10).over(w).cast("long").alias("decile")
    )
    per_dec = tiled.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_cust"),
        F.sum("rev6").cast("long").alias("dec_rev6"),
    )
    tot = per_dec.agg(F.sum("dec_rev6").cast("long").alias("tot6"))
    wc = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        per_dec.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_cust",
            F.round(
                F.col("dec_rev6").cast("double")
                / F.col("tot6").cast("double"),
                6,
            ).alias("rev_share"),
            F.round(
                F.sum("dec_rev6").over(wc).cast("double")
                / F.col("tot6").cast("double"),
                6,
            ).alias("cum_share"),
        )
        .orderBy("decile")
    )


SQL_LORENZ_DECILES = f"""
WITH per_cust AS (
  SELECT o_custkey,
         CAST(sum({SQL_FIXED6_LONG.format(col="o_totalprice")}) AS BIGINT)
           AS rev6
  FROM orders GROUP BY o_custkey
),
tiled AS (
  SELECT rev6,
         CAST(ntile(10) OVER (ORDER BY rev6 ASC, o_custkey ASC) AS BIGINT)
           AS decile
  FROM per_cust
),
per_dec AS (
  SELECT decile, CAST(count(*) AS BIGINT) AS n_cust,
         CAST(sum(rev6) AS BIGINT) AS dec_rev6
  FROM tiled GROUP BY decile
),
tot AS (SELECT CAST(sum(dec_rev6) AS BIGINT) AS tot6 FROM per_dec)
SELECT decile, n_cust,
       round(CAST(dec_rev6 AS DOUBLE) / CAST(tot6 AS DOUBLE), 6)
         AS rev_share,
       round(CAST(CAST(sum(dec_rev6) OVER (ORDER BY decile
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS DOUBLE) / CAST(tot6 AS DOUBLE), 6) AS cum_share
FROM per_dec, tot
ORDER BY decile
"""


# --------------------------------------------------------------------------
# Mann-Whitney U test (Mann & Whitney 1947) comparing URGENT vs LOW
# order totals — the nonparametric two-sample location test of the
# paired family. Midranks are kept EXACT by doubling: for a tie group
# the doubled average rank is 2*rank() + count - 1, an integer, so R1,
# U, and the tie-correction sum t³-t never touch floats; only the final
# z and the rank-biserial effect size do.
# --------------------------------------------------------------------------
def q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = (
        _read(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .select(
            F.when(F.col("o_orderpriority") == "1-URGENT", 1)
            .otherwise(2)
            .alias("grp"),
            fixed6_long(F.col("o_totalprice")).alias("x6"),
        )
    )
    wr = Window.orderBy("x6")
    wt = Window.partitionBy("x6")
    ranked = orders.select(
        "grp",
        (
            F.lit(2) * F.rank().over(wr).cast("long")
            + F.count(F.lit(1)).over(wt).cast("long")
            - F.lit(1)
        ).alias("dr"),
        "x6",
    )
    agg = ranked.agg(
        F.sum(F.when(F.col("grp") == 1, F.col("dr")).otherwise(0))
        .cast("long")
        .alias("r1_doubled"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(F.when(F.col("grp") == 2, 1).otherwise(0))
        .cast("long")
        .alias("n2"),
    )
    ties = (
        orders.groupBy("x6")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")),
                F.lit(0),
            )
            .cast("long")
            .alias("tie_cubes")
        )
    )
    j = agg.crossJoin(F.broadcast(ties))
    n1d, n2d = F.col("n1").cast("double"), F.col("n2").cast("double")
    nd = n1d + n2d
    # doubled U for group 1: U2 = R1_doubled - n1*(n1+1)
    u2 = (
        F.col("r1_doubled").cast("double")
        - n1d * (n1d + F.lit(1.0))
    )
    var_u = n1d * n2d / F.lit(12.0) * (
        (nd + F.lit(1.0))
        - F.col("tie_cubes").cast("double") / (nd * (nd - F.lit(1.0)))
    )
    z = (u2 - n1d * n2d) / (F.lit(2.0) * F.sqrt(var_u))
    return j.select(
        "n1",
        "n2",
        F.round(u2 / F.lit(2.0), 6).alias("u1"),
        F.round(z, 6).alias("z"),
        F.round(F.lit(1.0) - u2 / (n1d * n2d), 6).alias("rank_biserial"),
    )


SQL_MANN_WHITNEY = f"""
WITH samp AS (
  SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 2 END AS grp,
         {SQL_FIXED6_LONG.format(col="o_totalprice")} AS x6
  FROM orders
  WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
),
ranked AS (
  SELECT grp,
         2 * CAST(rank() OVER (ORDER BY x6) AS BIGINT)
           + CAST(count(*) OVER (PARTITION BY x6) AS BIGINT) - 1 AS dr
  FROM samp
),
agg AS (
  SELECT CAST(sum(CASE WHEN grp = 1 THEN dr ELSE 0 END) AS BIGINT)
           AS r1_doubled,
         CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN grp = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
  FROM ranked
),
ties AS (
  SELECT CAST(coalesce(sum(t * t * t - t), 0) AS BIGINT) AS tie_cubes
  FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM samp GROUP BY x6)
  WHERE t > 1
)
SELECT n1, n2,
       round((CAST(r1_doubled AS DOUBLE)
              - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0)) / 2.0, 6)
         AS u1,
       round(((CAST(r1_doubled AS DOUBLE)
               - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0))
              - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
             / (2.0 * sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0
                * ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) + 1.0)
                   - CAST(tie_cubes AS DOUBLE)
                     / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                        * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)
                           - 1.0))))), 6) AS z,
       round(1.0 - (CAST(r1_doubled AS DOUBLE)
                    - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0))
                   / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 6)
         AS rank_biserial
FROM agg, ties
"""


# --------------------------------------------------------------------------
# Trimmed and winsorized means (Tukey's robust-location pair — the
# complement to the MAD outlier gate): order totals ranked exactly
# (fixed6, orderkey tiebreak), the outer 5% on each side dropped
# (trimmed) or clamped to the boundary order statistics (winsorized).
# Cut indices are integer arithmetic on n; all sums stay fixed6 BIGINT
# (clamping replaces a value with another BIGINT), so both means divide
# identical integers.
# --------------------------------------------------------------------------
def q_trimmed_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _read(spark, sf_dir, "orders").select(
        "o_orderkey", fixed6_long(F.col("o_totalprice")).alias("x6")
    )
    w = Window.orderBy(F.col("x6").asc(), F.col("o_orderkey").asc())
    ranked = orders.select(
        "x6", F.row_number().over(w).cast("long").alias("rn")
    ).localCheckpoint(eager=True)
    n_row = ranked.agg(F.count(F.lit(1)).cast("long").alias("n"))
    # k = floor(0.05 * n); keep ranks in (k, n-k]
    withk = ranked.crossJoin(F.broadcast(n_row)).withColumn(
        "k", F.expr("n div 20")
    )
    lo = withk.filter(F.col("rn") == F.col("k") + 1).select(
        F.col("x6").alias("lo6")
    )
    hi = withk.filter(F.col("rn") == F.col("n") - F.col("k")).select(
        F.col("x6").alias("hi6")
    )
    trimmed = withk.filter(
        (F.col("rn") > F.col("k")) & (F.col("rn") <= F.col("n") - F.col("k"))
    ).agg(
        F.sum("x6").cast("long").alias("tsum6"),
        F.count(F.lit(1)).cast("long").alias("tn"),
    )
    wins = (
        withk.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .select(
            F.greatest(
                F.col("lo6"), F.least(F.col("hi6"), F.col("x6"))
            ).alias("wx6")
        )
        .agg(F.sum("wx6").cast("long").alias("wsum6"))
    )
    return (
        trimmed.crossJoin(F.broadcast(wins))
        .crossJoin(F.broadcast(n_row))
        .select(
            "n",
            "tn",
            F.round(
                F.col("tsum6").cast("double")
                / F.col("tn").cast("double")
                / F.lit(1_000_000.0),
                6,
            ).alias("trimmed_mean"),
            F.round(
                F.col("wsum6").cast("double")
                / F.col("n").cast("double")
                / F.lit(1_000_000.0),
                6,
            ).alias("winsorized_mean"),
        )
    )


SQL_TRIMMED_STATS = f"""
WITH ranked AS (
  SELECT {SQL_FIXED6_LONG.format(col="o_totalprice")} AS x6,
         CAST(row_number() OVER (
           ORDER BY {SQL_FIXED6_LONG.format(col="o_totalprice")} ASC,
                    o_orderkey ASC) AS BIGINT) AS rn
  FROM orders
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ranked),
k AS (SELECT n, n // 20 AS k FROM nn),
lo AS (SELECT x6 AS lo6 FROM ranked, k WHERE rn = k + 1),
hi AS (SELECT x6 AS hi6 FROM ranked, k WHERE rn = n - k),
trimmed AS (
  SELECT CAST(sum(x6) AS BIGINT) AS tsum6, CAST(count(*) AS BIGINT) AS tn
  FROM ranked, k WHERE rn > k AND rn <= n - k
),
wins AS (
  SELECT CAST(sum(greatest(lo6, least(hi6, x6))) AS BIGINT) AS wsum6
  FROM ranked, lo, hi
)
SELECT n, tn,
       round(CAST(tsum6 AS DOUBLE) / CAST(tn AS DOUBLE)
             / CAST('1000000.0' AS DOUBLE), 6) AS trimmed_mean,
       round(CAST(wsum6 AS DOUBLE) / CAST(n AS DOUBLE)
             / CAST('1000000.0' AS DOUBLE), 6) AS winsorized_mean
FROM trimmed, wins, nn
"""


# --------------------------------------------------------------------------
# Two-sample Anderson-Darling test (Scholz & Stephens 1987, the
# tie-adjusted midrank form A²akN) on URGENT vs LOW order totals — the
# tail-sensitive complement to the KS and Mann-Whitney pairs over the
# same two samples. Midranks are kept exact by DOUBLING (M2 = 2*cum - f,
# B2 = 2*cum - l are integers); each distinct value contributes one
# fixed double expression of those integers, summed and rounded 6.
# --------------------------------------------------------------------------
def q_anderson_darling(spark: SparkSession, sf_dir: str) -> DataFrame:
    samp = (
        _read(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .select(
            F.when(F.col("o_orderpriority") == "1-URGENT", 1)
            .otherwise(2)
            .alias("grp"),
            fixed6_long(F.col("o_totalprice")).alias("x6"),
        )
    )
    cells = (
        samp.groupBy("x6")
        .agg(
            F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
            .cast("long")
            .alias("f1"),
            F.sum(F.when(F.col("grp") == 2, 1).otherwise(0))
            .cast("long")
            .alias("f2"),
        )
        .localCheckpoint(eager=True)
    )
    w = Window.orderBy("x6").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = cells.select(
        "f1",
        "f2",
        (F.col("f1") + F.col("f2")).alias("l"),
        F.sum("f1").over(w).cast("long").alias("cum1"),
        F.sum("f2").over(w).cast("long").alias("cum2"),
        F.sum(F.col("f1") + F.col("f2")).over(w).cast("long").alias("cumc"),
    )
    tot = cells.agg(
        F.sum("f1").cast("long").alias("n1"),
        F.sum("f2").cast("long").alias("n2"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
    )
    j = cum.crossJoin(F.broadcast(tot))
    nd = (F.col("n1") + F.col("n2")).cast("double")
    ld = F.col("l").cast("double")
    # doubled midrank cumulatives: integer-exact
    b2 = (F.lit(2) * F.col("cumc") - F.col("l")).cast("double")
    m2_1 = (F.lit(2) * F.col("cum1") - F.col("f1")).cast("double")
    m2_2 = (F.lit(2) * F.col("cum2") - F.col("f2")).cast("double")
    denom = (b2 / F.lit(2.0)) * (nd - b2 / F.lit(2.0)) - nd * ld / F.lit(
        4.0
    )
    def inner(m2, ni):
        nid = ni.cast("double")
        num = nd * m2 / F.lit(2.0) - (b2 / F.lit(2.0)) * nid
        return (ld / nd) * num * num / denom / nid
    term = F.when(
        denom > 0, inner(m2_1, F.col("n1")) + inner(m2_2, F.col("n2"))
    ).otherwise(F.lit(0.0))
    res = j.select(term.alias("t"), "n1", "n2", "n_distinct").groupBy(
        "n1", "n2", "n_distinct"
    ).agg(F.sum("t").alias("a2_raw"))
    return res.select(
        "n1",
        "n2",
        "n_distinct",
        F.round(
            (F.col("n1") + F.col("n2") - 1).cast("double")
            / (F.col("n1") + F.col("n2")).cast("double")
            * F.col("a2_raw"),
            6,
        ).alias("a2_akn"),
    )


SQL_ANDERSON_DARLING = f"""
WITH samp AS (
  SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 2 END AS grp,
         {SQL_FIXED6_LONG.format(col="o_totalprice")} AS x6
  FROM orders
  WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
),
cells AS (
  SELECT x6,
         CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
         CAST(sum(CASE WHEN grp = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
  FROM samp GROUP BY x6
),
cum AS (
  SELECT f1, f2, f1 + f2 AS l,
         CAST(sum(f1) OVER (ORDER BY x6
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum1,
         CAST(sum(f2) OVER (ORDER BY x6
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum2,
         CAST(sum(f1 + f2) OVER (ORDER BY x6
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cumc
  FROM cells
),
tot AS (
  SELECT CAST(sum(f1) AS BIGINT) AS n1, CAST(sum(f2) AS BIGINT) AS n2,
         CAST(count(*) AS BIGINT) AS n_distinct
  FROM cells
),
terms AS (
  SELECT n1, n2, n_distinct,
         CASE WHEN ((CAST(2 * cumc - l AS DOUBLE) / 2.0)
                    * (CAST(n1 + n2 AS DOUBLE)
                       - CAST(2 * cumc - l AS DOUBLE) / 2.0)
                    - CAST(n1 + n2 AS DOUBLE) * CAST(l AS DOUBLE) / 4.0) > 0
         THEN
           (CAST(l AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
           * ((CAST(n1 + n2 AS DOUBLE) * CAST(2 * cum1 - f1 AS DOUBLE) / 2.0
               - (CAST(2 * cumc - l AS DOUBLE) / 2.0) * CAST(n1 AS DOUBLE))
              * (CAST(n1 + n2 AS DOUBLE) * CAST(2 * cum1 - f1 AS DOUBLE) / 2.0
                 - (CAST(2 * cumc - l AS DOUBLE) / 2.0) * CAST(n1 AS DOUBLE))
              / ((CAST(2 * cumc - l AS DOUBLE) / 2.0)
                 * (CAST(n1 + n2 AS DOUBLE)
                    - CAST(2 * cumc - l AS DOUBLE) / 2.0)
                 - CAST(n1 + n2 AS DOUBLE) * CAST(l AS DOUBLE) / 4.0)
              / CAST(n1 AS DOUBLE)
              + (CAST(n1 + n2 AS DOUBLE) * CAST(2 * cum2 - f2 AS DOUBLE) / 2.0
                 - (CAST(2 * cumc - l AS DOUBLE) / 2.0) * CAST(n2 AS DOUBLE))
                * (CAST(n1 + n2 AS DOUBLE) * CAST(2 * cum2 - f2 AS DOUBLE)
                   / 2.0
                   - (CAST(2 * cumc - l AS DOUBLE) / 2.0)
                     * CAST(n2 AS DOUBLE))
                / ((CAST(2 * cumc - l AS DOUBLE) / 2.0)
                   * (CAST(n1 + n2 AS DOUBLE)
                      - CAST(2 * cumc - l AS DOUBLE) / 2.0)
                   - CAST(n1 + n2 AS DOUBLE) * CAST(l AS DOUBLE) / 4.0)
                / CAST(n2 AS DOUBLE))
         ELSE 0.0 END AS t
  FROM cum, tot
)
SELECT n1, n2, n_distinct,
       round(CAST(n1 + n2 - 1 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE)
             * sum(t), 6) AS a2_akn
FROM terms
GROUP BY n1, n2, n_distinct
"""


# --------------------------------------------------------------------------
# Adjusted Pearson residuals (Haberman 1973) for the source x lang
# contingency table — the cell-level drill-down of the chi-square pair:
# r_ij = (O - E) / sqrt(E (1 - rn/N)(1 - cn/N)) says WHICH cells drive
# the dependence, |r| > 2 flagging the anomalous ones. Counts and
# marginals are exact BIGINTs; each residual is one fixed double
# expression per bounded cell.
# --------------------------------------------------------------------------
def q_pearson_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents").select("source", "lang")
    cells = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("o")
    )
    rows = cells.groupBy("source").agg(
        F.sum("o").cast("long").alias("rn")
    )
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
    adj = (od - e) / F.sqrt(
        e * (F.lit(1.0) - rnd / nd) * (F.lit(1.0) - cnd / nd)
    )
    return j.select(
        "source",
        "lang",
        "o",
        F.round(e, 6).alias("expected"),
        F.round(adj, 6).alias("adj_residual"),
        (F.abs(adj) > F.lit(2.0)).alias("flagged"),
    ).orderBy("source", "lang")


SQL_PEARSON_RESIDUALS = """
WITH cells AS (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS o
  FROM documents GROUP BY source, lang
),
rm AS (SELECT source, CAST(sum(o) AS BIGINT) AS rn
       FROM cells GROUP BY source),
cm AS (SELECT lang, CAST(sum(o) AS BIGINT) AS cn FROM cells GROUP BY lang),
nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells)
SELECT source, lang, o,
       round(CAST(rn AS DOUBLE) * CAST(cn AS DOUBLE)
             / CAST(n AS DOUBLE), 6) AS expected,
       round((CAST(o AS DOUBLE)
              - CAST(rn AS DOUBLE) * CAST(cn AS DOUBLE) / CAST(n AS DOUBLE))
             / sqrt(CAST(rn AS DOUBLE) * CAST(cn AS DOUBLE)
                    / CAST(n AS DOUBLE)
                    * (1.0 - CAST(rn AS DOUBLE) / CAST(n AS DOUBLE))
                    * (1.0 - CAST(cn AS DOUBLE) / CAST(n AS DOUBLE))), 6)
         AS adj_residual,
       abs((CAST(o AS DOUBLE)
            - CAST(rn AS DOUBLE) * CAST(cn AS DOUBLE) / CAST(n AS DOUBLE))
           / sqrt(CAST(rn AS DOUBLE) * CAST(cn AS DOUBLE)
                  / CAST(n AS DOUBLE)
                  * (1.0 - CAST(rn AS DOUBLE) / CAST(n AS DOUBLE))
                  * (1.0 - CAST(cn AS DOUBLE) / CAST(n AS DOUBLE)))) > 2.0
         AS flagged
FROM cells
JOIN rm USING (source)
JOIN cm USING (lang), nn
ORDER BY source, lang
"""


# --------------------------------------------------------------------------
# Brown-Forsythe variance-homogeneity test (Brown & Forsythe 1974 —
# Levene's test with the median center, the robust pre-check for the
# anova_dow pair's equal-variance assumption): one-way ANOVA F on
# z = |x - median_g| where median_g is the per-weekday interpolated
# median of daily revenue. Group medians come from exact integer grids;
# the deviation ANOVA reuses the anova precedent (exact group counts,
# per-row double squares summed, round-6 display).
# --------------------------------------------------------------------------
def q_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
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
            ((F.col("day") + 4) % 7).cast("long").alias("dow"), "rev"
        )
        .localCheckpoint(eager=True)
    )
    med = daily.groupBy("dow").agg(
        F.expr("percentile(rev, 0.5D)").alias("med")
    )
    z = daily.join(F.broadcast(med), "dow").select(
        "dow", F.abs(F.col("rev").cast("double") - F.col("med")).alias("z")
    )
    grp = z.groupBy("dow").agg(
        F.count(F.lit(1)).cast("long").alias("gn"),
        F.sum("z").alias("gsum"),
        F.sum(F.col("z") * F.col("z")).alias("gss"),
    )
    tot = grp.agg(
        F.sum("gn").cast("long").alias("tn"),
        F.sum("gsum").alias("tsum"),
        F.sum("gss").alias("tss"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(F.col("gsum") * F.col("gsum") / F.col("gn").cast("double"))
        .alias("between_raw"),
    )
    tnd, kd = F.col("tn").cast("double"), F.col("k").cast("double")
    ss_between = F.col("between_raw") - F.col("tsum") * F.col(
        "tsum"
    ) / tnd
    ss_within = F.col("tss") - F.col("between_raw")
    f_stat = (ss_between / (kd - F.lit(1.0))) / (ss_within / (tnd - kd))
    return tot.select(
        F.col("k").alias("n_groups"),
        F.col("tn").alias("n_days"),
        (F.col("k") - 1).cast("long").alias("df1"),
        (F.col("tn") - F.col("k")).cast("long").alias("df2"),
        F.round(f_stat, 6).alias("f_stat"),
    )


SQL_BROWN_FORSYTHE = f"""
WITH daily AS (
  SELECT (epoch_us(o_orderdate) // {US_PER_DAY_DIV} + 4) % 7 AS dow,
         CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
           AS rev
  FROM orders GROUP BY epoch_us(o_orderdate) // {US_PER_DAY_DIV}
),
med AS (
  SELECT dow, quantile_cont(rev, 0.5) AS med FROM daily GROUP BY dow
),
z AS (
  SELECT daily.dow, abs(CAST(rev AS DOUBLE) - med.med) AS z
  FROM daily JOIN med USING (dow)
),
grp AS (
  SELECT dow, CAST(count(*) AS BIGINT) AS gn, sum(z) AS gsum,
         sum(z * z) AS gss
  FROM z GROUP BY dow
),
tot AS (
  SELECT CAST(sum(gn) AS BIGINT) AS tn, sum(gsum) AS tsum,
         sum(gss) AS tss, CAST(count(*) AS BIGINT) AS k,
         sum(gsum * gsum / CAST(gn AS DOUBLE)) AS between_raw
  FROM grp
)
SELECT k AS n_groups, tn AS n_days,
       CAST(k - 1 AS BIGINT) AS df1, CAST(tn - k AS BIGINT) AS df2,
       round(((between_raw - tsum * tsum / CAST(tn AS DOUBLE))
              / (CAST(k AS DOUBLE) - 1.0))
             / ((tss - between_raw)
                / (CAST(tn AS DOUBLE) - CAST(k AS DOUBLE))), 6) AS f_stat
FROM tot
"""


# --------------------------------------------------------------------------
# Kruskal-Wallis rank test (Kruskal & Wallis 1952) of daily revenue
# across the 7 weekdays — the nonparametric sibling of anova_dow,
# sharing the mann_whitney pair's exact-midrank trick: doubled midranks
# 2*rank() + count_ties - 1 are integers, so per-group rank sums and the
# tie-correction sum t³-t never touch floats. H (with tie divisor) is
# one closed double expression at the end.
# --------------------------------------------------------------------------
def q_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
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
            ((F.col("day") + 4) % 7).cast("long").alias("dow"), "rev"
        )
        .localCheckpoint(eager=True)
    )
    wr = Window.orderBy("rev")
    wt = Window.partitionBy("rev")
    ranked = daily.select(
        "dow",
        (
            F.lit(2) * F.rank().over(wr).cast("long")
            + F.count(F.lit(1)).over(wt).cast("long")
            - F.lit(1)
        ).alias("dr"),
    )
    grp = ranked.groupBy("dow").agg(
        F.count(F.lit(1)).cast("long").alias("gn"),
        F.sum("dr").cast("long").alias("r2sum"),
    )
    ties = (
        daily.groupBy("rev")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")),
                F.lit(0),
            )
            .cast("long")
            .alias("tie_cubes")
        )
    )
    tot = grp.agg(
        F.sum("gn").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        # sum over groups of (R_g)^2/n_g with doubled ranks: divide by 4
        F.sum(
            F.col("r2sum").cast("double")
            * F.col("r2sum").cast("double")
            / F.col("gn").cast("double")
        ).alias("r2_over_n_doubled"),
    )
    j = tot.crossJoin(F.broadcast(ties))
    nd = F.col("n").cast("double")
    h_raw = (
        F.lit(12.0)
        / (nd * (nd + F.lit(1.0)))
        * (F.col("r2_over_n_doubled") / F.lit(4.0))
        - F.lit(3.0) * (nd + F.lit(1.0))
    )
    tie_div = F.lit(1.0) - F.col("tie_cubes").cast("double") / (
        nd * nd * nd - nd
    )
    return j.select(
        "n",
        F.col("k").alias("n_groups"),
        (F.col("k") - 1).cast("long").alias("df"),
        "tie_cubes",
        F.round(h_raw / tie_div, 6).alias("h_stat"),
    )


SQL_KRUSKAL_WALLIS = f"""
WITH daily AS (
  SELECT (epoch_us(o_orderdate) // {US_PER_DAY_DIV} + 4) % 7 AS dow,
         CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
           AS rev
  FROM orders GROUP BY epoch_us(o_orderdate) // {US_PER_DAY_DIV}
),
ranked AS (
  SELECT dow,
         2 * CAST(rank() OVER (ORDER BY rev) AS BIGINT)
           + CAST(count(*) OVER (PARTITION BY rev) AS BIGINT) - 1 AS dr
  FROM daily
),
grp AS (
  SELECT dow, CAST(count(*) AS BIGINT) AS gn,
         CAST(sum(dr) AS BIGINT) AS r2sum
  FROM ranked GROUP BY dow
),
ties AS (
  SELECT CAST(coalesce(sum(t * t * t - t), 0) AS BIGINT) AS tie_cubes
  FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM daily GROUP BY rev)
  WHERE t > 1
),
tot AS (
  SELECT CAST(sum(gn) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k,
         sum(CAST(r2sum AS DOUBLE) * CAST(r2sum AS DOUBLE)
             / CAST(gn AS DOUBLE)) AS r2_over_n_doubled
  FROM grp
)
SELECT n, k AS n_groups, CAST(k - 1 AS BIGINT) AS df, tie_cubes,
       round((12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
              * (r2_over_n_doubled / 4.0)
              - 3.0 * (CAST(n AS DOUBLE) + 1.0))
             / (1.0 - CAST(tie_cubes AS DOUBLE)
                / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                   - CAST(n AS DOUBLE))), 6) AS h_stat
FROM tot, ties
"""


# --------------------------------------------------------------------------
# Jarque-Bera normality test (Jarque & Bera 1980) on daily revenue:
# JB = n/6 (S² + (K-3)²/4) from the sample skewness and kurtosis. TWO
# PASS on purpose: the mean comes from the exact BIGINT cents sum, then
# central powers (x-mean)^k are formed per row BEFORE summing — raw
# moments of 1e8-scale values would cancel catastrophically. All
# reported values are scale-free ratios (invariant 4 robustness).
# --------------------------------------------------------------------------
def q_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rev").cast("long").alias("s"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("s").cast("double") / nd
    dev = F.col("rev").cast("double") - F.col("mean")
    cent = (
        daily.crossJoin(F.broadcast(tot.select("n", mean.alias("mean"))))
        .select(
            "n",
            dev.alias("d"),
        )
        .groupBy("n")
        .agg(
            F.sum(F.col("d") * F.col("d")).alias("m2s"),
            F.sum(F.col("d") * F.col("d") * F.col("d")).alias("m3s"),
            F.sum(
                F.col("d") * F.col("d") * F.col("d") * F.col("d")
            ).alias("m4s"),
        )
    )
    nd2 = F.col("n").cast("double")
    m2 = F.col("m2s") / nd2
    m3 = F.col("m3s") / nd2
    m4 = F.col("m4s") / nd2
    skew = m3 / F.sqrt(m2 * m2 * m2)
    kurt = m4 / (m2 * m2)
    jb = nd2 / F.lit(6.0) * (
        skew * skew
        + (kurt - F.lit(3.0)) * (kurt - F.lit(3.0)) / F.lit(4.0)
    )
    return cent.select(
        "n",
        F.round(skew, 6).alias("skewness"),
        F.round(kurt, 6).alias("kurtosis"),
        F.round(jb, 6).alias("jb_stat"),
    )


SQL_JARQUE_BERA = f"""
WITH daily AS (
  SELECT epoch_us(o_orderdate) // {US_PER_DAY_DIV} AS day,
         CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
           AS rev
  FROM orders GROUP BY 1
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(rev) AS BIGINT) AS s
  FROM daily
),
cent AS (
  SELECT n,
         sum((CAST(rev AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(rev AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
           AS m2s,
         sum((CAST(rev AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(rev AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(rev AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
           AS m3s,
         sum((CAST(rev AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(rev AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(rev AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(rev AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
           AS m4s
  FROM daily, tot
  GROUP BY n
)
SELECT n,
       round((m3s / CAST(n AS DOUBLE))
             / sqrt((m2s / CAST(n AS DOUBLE)) * (m2s / CAST(n AS DOUBLE))
                    * (m2s / CAST(n AS DOUBLE))), 6) AS skewness,
       round((m4s / CAST(n AS DOUBLE))
             / ((m2s / CAST(n AS DOUBLE)) * (m2s / CAST(n AS DOUBLE))), 6)
         AS kurtosis,
       round(CAST(n AS DOUBLE) / 6.0
             * (((m3s / CAST(n AS DOUBLE))
                 / sqrt((m2s / CAST(n AS DOUBLE))
                        * (m2s / CAST(n AS DOUBLE))
                        * (m2s / CAST(n AS DOUBLE))))
                * ((m3s / CAST(n AS DOUBLE))
                   / sqrt((m2s / CAST(n AS DOUBLE))
                          * (m2s / CAST(n AS DOUBLE))
                          * (m2s / CAST(n AS DOUBLE))))
                + ((m4s / CAST(n AS DOUBLE))
                   / ((m2s / CAST(n AS DOUBLE)) * (m2s / CAST(n AS DOUBLE)))
                   - 3.0)
                  * ((m4s / CAST(n AS DOUBLE))
                     / ((m2s / CAST(n AS DOUBLE))
                        * (m2s / CAST(n AS DOUBLE))) - 3.0) / 4.0), 6)
         AS jb_stat
FROM cent
"""


# --------------------------------------------------------------------------
# Durbin-Watson statistic (Durbin & Watson 1950) on mean-centered daily
# revenue: DW = sum (e_t - e_{t-1})² / sum e_t² — the econometric
# serial-correlation check completing the time-series audit family
# (autocorrelation, runs, Mann-Kendall). Both sums are over the same
# exact-integer-derived doubles and the statistic is their ratio, so
# round-6 is stable. DW ~ 2(1 - rho1).
# --------------------------------------------------------------------------
def q_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rev").cast("long").alias("s"),
    )
    mean = F.col("s").cast("double") / F.col("n").cast("double")
    w = Window.orderBy("day")
    e = F.col("rev").cast("double") - F.col("mean")
    centered = daily.crossJoin(
        F.broadcast(tot.select("n", mean.alias("mean")))
    ).select("day", "n", e.alias("e"))
    lagged = centered.select(
        "n", "e", F.lag("e").over(w).alias("ep")
    )
    agg = lagged.groupBy("n").agg(
        F.sum(F.col("e") * F.col("e")).alias("sse"),
        F.sum(
            F.when(
                F.col("ep").isNotNull(),
                (F.col("e") - F.col("ep")) * (F.col("e") - F.col("ep")),
            ).otherwise(F.lit(0.0))
        ).alias("ssd"),
    )
    dw = F.col("ssd") / F.col("sse")
    return agg.select(
        "n",
        F.round(dw, 6).alias("dw"),
        F.round(F.lit(1.0) - dw / F.lit(2.0), 6).alias("rho1_approx"),
    )


SQL_DURBIN_WATSON = f"""
WITH daily AS (
  SELECT epoch_us(o_orderdate) // {US_PER_DAY_DIV} AS day,
         CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
           AS rev
  FROM orders GROUP BY 1
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(rev) AS BIGINT) AS s
  FROM daily
),
centered AS (
  SELECT day, n,
         CAST(rev AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS e
  FROM daily, tot
),
lagged AS (
  SELECT n, e, lag(e) OVER (ORDER BY day) AS ep FROM centered
),
agg AS (
  SELECT n, sum(e * e) AS sse,
         sum(CASE WHEN ep IS NOT NULL THEN (e - ep) * (e - ep)
                  ELSE 0.0 END) AS ssd
  FROM lagged GROUP BY n
)
SELECT n, round(ssd / sse, 6) AS dw,
       round(1.0 - (ssd / sse) / 2.0, 6) AS rho1_approx
FROM agg
"""


# --------------------------------------------------------------------------
# Grubbs outlier test (Grubbs 1950) on daily revenue: G = max|x - mean|/s
# with the flagged day — the parametric single-outlier companion to the
# MAD gate. Mean from the exact BIGINT sum; s from the anova-precedent
# double sum of squares; the argmax day resolves ties exactly because
# |x - mean| ranks by the same doubles on both engines with a day ASC
# tiebreak.
# --------------------------------------------------------------------------
def q_grubbs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    xd = F.col("rev").cast("double")
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rev").cast("long").alias("s"),
        F.sum(xd * xd).alias("ss"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("s").cast("double") / nd
    var = (F.col("ss") - nd * mean * mean) / (nd - F.lit(1.0))
    dev = F.abs(F.col("rev").cast("double") - F.col("mean"))
    scored = daily.crossJoin(
        F.broadcast(
            tot.select(
                "n", mean.alias("mean"), F.sqrt(var).alias("sd")
            )
        )
    ).select("day", "n", "mean", "sd", dev.alias("dev"))
    pick = Window.orderBy(F.col("dev").desc(), F.col("day").asc())
    best = scored.withColumn("rn", F.row_number().over(pick)).filter(
        F.col("rn") == 1
    )
    return best.select(
        F.col("day").alias("outlier_day"),
        "n",
        F.round(F.col("mean") / F.lit(100.0), 6).alias("mean_daily"),
        F.round(F.col("sd") / F.lit(100.0), 6).alias("sd_daily"),
        F.round(F.col("dev") / F.col("sd"), 6).alias("g_stat"),
    )


SQL_GRUBBS_TEST = f"""
WITH daily AS (
  SELECT epoch_us(o_orderdate) // {US_PER_DAY_DIV} AS day,
         CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
           AS rev
  FROM orders GROUP BY 1
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(rev) AS BIGINT) AS s,
         sum(CAST(rev AS DOUBLE) * CAST(rev AS DOUBLE)) AS ss
  FROM daily
),
param AS (
  SELECT n,
         CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
         sqrt((ss - CAST(n AS DOUBLE)
                    * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
              / (CAST(n AS DOUBLE) - 1.0)) AS sd
  FROM tot
),
scored AS (
  SELECT day, n, mean, sd,
         abs(CAST(rev AS DOUBLE) - mean) AS dev
  FROM daily, param
),
best AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (ORDER BY dev DESC, day ASC) AS rn
    FROM scored)
  WHERE rn = 1
)
SELECT day AS outlier_day, n,
       round(mean / CAST('100.0' AS DOUBLE), 6) AS mean_daily,
       round(sd / CAST('100.0' AS DOUBLE), 6) AS sd_daily,
       round(dev / sd, 6) AS g_stat
FROM best
"""


# --------------------------------------------------------------------------
# Friedman blocked-rank test (Friedman 1937): weeks are blocks, the 7
# weekdays are treatments, daily revenue ranks WITHIN each complete week
# (incomplete calendar-edge weeks are dropped — the blocked design
# requires k=7 observations per block). Midranks are doubled integers
# per block; per-treatment rank sums stay BIGINT, and the chi-square
# statistic with the standard tie correction is the only double.
# --------------------------------------------------------------------------
def q_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
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
            (F.col("day") / 7).cast("long").alias("week"),
            ((F.col("day") + 4) % 7).cast("long").alias("dow"),
            "rev",
        )
        .localCheckpoint(eager=True)
    )
    full_weeks = daily.groupBy("week").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    ).filter(F.col("c") == 7).select("week")
    blocked = daily.join(F.broadcast(full_weeks), "week")
    wr = Window.partitionBy("week").orderBy("rev")
    wt = Window.partitionBy("week", "rev")
    ranked = blocked.select(
        "week",
        "dow",
        "rev",
        (
            F.lit(2) * F.rank().over(wr).cast("long")
            + F.count(F.lit(1)).over(wt).cast("long")
            - F.lit(1)
        ).alias("dr"),
    )
    treat = ranked.groupBy("dow").agg(
        F.sum("dr").cast("long").alias("r2sum")
    )
    blocks = full_weeks.agg(F.count(F.lit(1)).cast("long").alias("b"))
    ties = (
        ranked.groupBy("week", "rev")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .agg(
            F.sum(F.col("t") * F.col("t") * F.col("t")).cast("long")
            .alias("t3_sum")
        )
    )
    stat = treat.agg(
        F.sum(
            F.col("r2sum").cast("double") * F.col("r2sum").cast("double")
        ).alias("r2_sq_sum_doubled")
    )
    j = stat.crossJoin(F.broadcast(blocks)).crossJoin(F.broadcast(ties))
    k = F.lit(7.0)
    bd = F.col("b").cast("double")
    # doubled rank sums divide out by 4
    sum_r_sq = F.col("r2_sq_sum_doubled") / F.lit(4.0)
    # chi2 = 12/(b k (k+1)) * sum R_j^2 - 3 b (k+1), divided by the tie
    # correction (1 - sum(t^3 - t)/(b k (k^2 - 1)))
    h_raw = (
        F.lit(12.0) / (bd * k * (k + F.lit(1.0))) * sum_r_sq
        - F.lit(3.0) * bd * (k + F.lit(1.0))
    )
    tie_div = F.lit(1.0) - (
        F.col("t3_sum").cast("double") - bd * k
    ) / (bd * k * (k * k - F.lit(1.0)))
    return j.select(
        F.col("b").alias("n_blocks"),
        F.lit(7).cast("long").alias("k_treatments"),
        F.lit(6).cast("long").alias("df"),
        F.round(h_raw / tie_div, 6).alias("chi2_stat"),
    )


SQL_FRIEDMAN_TEST = f"""
WITH daily AS (
  SELECT day // 7 AS week, (day + 4) % 7 AS dow, rev
  FROM (
    SELECT epoch_us(o_orderdate) // {US_PER_DAY_DIV} AS day,
           CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
             AS rev
    FROM orders GROUP BY 1)
),
full_weeks AS (
  SELECT week FROM daily GROUP BY week HAVING count(*) = 7
),
blocked AS (
  SELECT d.week, d.dow, d.rev FROM daily d JOIN full_weeks USING (week)
),
ranked AS (
  SELECT week, dow,
         2 * CAST(rank() OVER (PARTITION BY week ORDER BY rev) AS BIGINT)
           + CAST(count(*) OVER (PARTITION BY week, rev) AS BIGINT) - 1
           AS dr,
         rev
  FROM blocked
),
treat AS (
  SELECT dow, CAST(sum(dr) AS BIGINT) AS r2sum FROM ranked GROUP BY dow
),
blocks AS (SELECT CAST(count(*) AS BIGINT) AS b FROM full_weeks),
ties AS (
  SELECT CAST(sum(t * t * t) AS BIGINT) AS t3_sum
  FROM (SELECT CAST(count(*) AS BIGINT) AS t
        FROM ranked GROUP BY week, rev)
),
stat AS (
  SELECT sum(CAST(r2sum AS DOUBLE) * CAST(r2sum AS DOUBLE))
           AS r2_sq_sum_doubled
  FROM treat
)
SELECT b AS n_blocks, CAST(7 AS BIGINT) AS k_treatments,
       CAST(6 AS BIGINT) AS df,
       round((12.0 / (CAST(b AS DOUBLE) * 7.0 * 8.0)
              * (r2_sq_sum_doubled / 4.0)
              - 3.0 * CAST(b AS DOUBLE) * 8.0)
             / (1.0 - (CAST(t3_sum AS DOUBLE) - CAST(b AS DOUBLE) * 7.0)
                / (CAST(b AS DOUBLE) * 7.0 * 48.0)), 6) AS chi2_stat
FROM stat, blocks, ties
"""


# --------------------------------------------------------------------------
# Odds ratio with Wald confidence interval (the epidemiology-style
# effect size completing the A/B family: ab_test_z decides, power sizes,
# THIS reports magnitude): OR = (a·d)/(b·c) from the same md5 cohort
# split and conversion predicate; ln OR ± z·sqrt(1/a+1/b+1/c+1/d). All
# cell counts exact BIGINTs; z constant via CAST string (invariant 1).
# --------------------------------------------------------------------------
def q_odds_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    agg = users.select(grp.alias("grp"), "conv").agg(
        F.sum(
            F.when((F.col("grp") == 0) & (F.col("conv") == 1), 1).otherwise(0)
        ).cast("long").alias("a"),
        F.sum(
            F.when((F.col("grp") == 0) & (F.col("conv") == 0), 1).otherwise(0)
        ).cast("long").alias("b"),
        F.sum(
            F.when((F.col("grp") == 1) & (F.col("conv") == 1), 1).otherwise(0)
        ).cast("long").alias("c"),
        F.sum(
            F.when((F.col("grp") == 1) & (F.col("conv") == 0), 1).otherwise(0)
        ).cast("long").alias("d"),
    )
    ad = F.col("a").cast("double")
    bd = F.col("b").cast("double")
    cd = F.col("c").cast("double")
    dd = F.col("d").cast("double")
    log_or = F.log(ad * dd / (bd * cd))
    se = F.sqrt(
        F.lit(1.0) / ad + F.lit(1.0) / bd + F.lit(1.0) / cd + F.lit(1.0) / dd
    )
    z = F.lit(1.959963984540054)
    return agg.select(
        "a",
        "b",
        "c",
        "d",
        F.round(ad * dd / (bd * cd), 6).alias("odds_ratio"),
        F.round(F.exp(log_or - z * se), 6).alias("ci_low"),
        F.round(F.exp(log_or + z * se), 6).alias("ci_high"),
    )


SQL_ODDS_RATIO = f"""
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
cells AS (
  SELECT CAST(sum(CASE WHEN grp = 0 AND conv = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS a,
         CAST(sum(CASE WHEN grp = 0 AND conv = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS b,
         CAST(sum(CASE WHEN grp = 1 AND conv = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS c,
         CAST(sum(CASE WHEN grp = 1 AND conv = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS d
  FROM g
)
SELECT a, b, c, d,
       round(CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
             / (CAST(b AS DOUBLE) * CAST(c AS DOUBLE)), 6) AS odds_ratio,
       round(exp(ln(CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
                    / (CAST(b AS DOUBLE) * CAST(c AS DOUBLE)))
                 - CAST('1.959963984540054' AS DOUBLE)
                   * sqrt(1.0 / CAST(a AS DOUBLE) + 1.0 / CAST(b AS DOUBLE)
                          + 1.0 / CAST(c AS DOUBLE)
                          + 1.0 / CAST(d AS DOUBLE))), 6) AS ci_low,
       round(exp(ln(CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
                    / (CAST(b AS DOUBLE) * CAST(c AS DOUBLE)))
                 + CAST('1.959963984540054' AS DOUBLE)
                   * sqrt(1.0 / CAST(a AS DOUBLE) + 1.0 / CAST(b AS DOUBLE)
                          + 1.0 / CAST(c AS DOUBLE)
                          + 1.0 / CAST(d AS DOUBLE))), 6) AS ci_high
FROM cells
"""


# --------------------------------------------------------------------------
# Negative-binomial dispersion fit of per-customer order counts (the
# count-model workhorse; Poisson is the var=mean special case):
# zero-order customers ENTER via left join (their absence is the classic
# silent bias), dispersion index var/mean tests overdispersion, and the
# method-of-moments NB parameters r = m²/(v−m), p = m/v. Counts exact
# BIGINT; moments from the (n, Σ, Σx²) integer triple.
# --------------------------------------------------------------------------
def q_nb_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _read(spark, sf_dir, "customer").select("c_custkey")
    orders = _read(spark, sf_dir, "orders").groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    per = cust.join(
        orders, cust["c_custkey"] == orders["o_custkey"], "left"
    ).select(F.coalesce(F.col("k"), F.lit(0)).cast("long").alias("k"))
    agg = per.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("k").cast("long").alias("s"),
        F.sum(F.col("k") * F.col("k")).cast("long").alias("ss"),
        F.sum(F.when(F.col("k") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_zero"),
    )
    nd = F.col("n").cast("double")
    m = F.col("s").cast("double") / nd
    v = (F.col("ss").cast("double") - nd * m * m) / (nd - F.lit(1.0))
    return agg.select(
        "n",
        "n_zero",
        F.round(m, 6).alias("mean_orders"),
        F.round(v, 6).alias("var_orders"),
        F.round(v / m, 6).alias("dispersion_index"),
        F.round(m * m / (v - m), 6).alias("nb_r"),
        F.round(m / v, 6).alias("nb_p"),
    )


SQL_NB_DISPERSION = """
WITH per AS (
  SELECT CAST(coalesce(o.k, 0) AS BIGINT) AS k
  FROM customer c
  LEFT JOIN (SELECT o_custkey, CAST(count(*) AS BIGINT) AS k
             FROM orders GROUP BY o_custkey) o
    ON o.o_custkey = c.c_custkey
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(k) AS BIGINT) AS s,
         CAST(sum(k * k) AS BIGINT) AS ss,
         CAST(sum(CASE WHEN k = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero
  FROM per
)
SELECT n, n_zero,
       round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_orders,
       round((CAST(ss AS DOUBLE)
              - CAST(n AS DOUBLE) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
             / (CAST(n AS DOUBLE) - 1.0), 6) AS var_orders,
       round(((CAST(ss AS DOUBLE)
               - CAST(n AS DOUBLE) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                 * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
              / (CAST(n AS DOUBLE) - 1.0))
             / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 6)
         AS dispersion_index,
       round((CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             / ((CAST(ss AS DOUBLE)
                 - CAST(n AS DOUBLE)
                   * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                   * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
                / (CAST(n AS DOUBLE) - 1.0)
                - CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS nb_r,
       round((CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             / ((CAST(ss AS DOUBLE)
                 - CAST(n AS DOUBLE)
                   * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                   * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
                / (CAST(n AS DOUBLE) - 1.0)), 6) AS nb_p
FROM agg
"""


# --------------------------------------------------------------------------
# Distribution-free median confidence interval (Thompson 1936 /
# binomial order-statistic bounds): the 95% CI for median daily revenue
# is [x_(l), x_(u)] with l = floor((n - 1.96*sqrt(n))/2) and
# u = n + 1 - l — PURE INTEGER rank selection of exact order statistics
# (no bootstrap, no RNG); only the rank cutoff computation touches one
# sqrt, floored identically on both engines.
# --------------------------------------------------------------------------
def q_median_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    w = Window.orderBy(F.col("rev").asc(), F.col("day").asc())
    ranked = daily.select(
        "rev", F.row_number().over(w).cast("long").alias("rn")
    )
    nrow = daily.agg(F.count(F.lit(1)).cast("long").alias("n"))
    nd = F.col("n").cast("double")
    lo_rank = F.floor(
        (nd - F.lit(1.959963984540054) * F.sqrt(nd)) / F.lit(2.0)
    ).cast("long")
    bounds = nrow.select(
        "n",
        lo_rank.alias("lo_rn"),
        (F.col("n") + 1 - lo_rank).alias("hi_rn"),
    )
    med = daily.agg(F.expr("percentile(rev, 0.5D)").alias("med"))
    j = ranked.crossJoin(F.broadcast(bounds))
    lo = j.filter(F.col("rn") == F.col("lo_rn")).select(
        "n", F.col("rev").alias("lo6")
    )
    hi = j.filter(F.col("rn") == F.col("hi_rn")).select(
        F.col("rev").alias("hi6")
    )
    return (
        lo.crossJoin(F.broadcast(hi))
        .crossJoin(F.broadcast(med))
        .select(
            "n",
            F.round(F.col("med") / F.lit(100.0), 6).alias("median_daily"),
            F.round(
                F.col("lo6").cast("double") / F.lit(100.0), 6
            ).alias("ci_low"),
            F.round(
                F.col("hi6").cast("double") / F.lit(100.0), 6
            ).alias("ci_high"),
        )
    )


SQL_MEDIAN_CI = f"""
WITH daily AS (
  SELECT epoch_us(o_orderdate) // {US_PER_DAY_DIV} AS day,
         CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
           AS rev
  FROM orders GROUP BY 1
),
ranked AS (
  SELECT rev,
         CAST(row_number() OVER (ORDER BY rev ASC, day ASC) AS BIGINT)
           AS rn
  FROM daily
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
bounds AS (
  SELECT n,
         CAST(floor((CAST(n AS DOUBLE)
                     - CAST('1.959963984540054' AS DOUBLE)
                       * sqrt(CAST(n AS DOUBLE))) / 2.0) AS BIGINT)
           AS lo_rn
  FROM nn
),
med AS (SELECT quantile_cont(rev, 0.5) AS med FROM daily)
SELECT b.n,
       round(med.med / CAST('100.0' AS DOUBLE), 6) AS median_daily,
       round(CAST(lo.rev AS DOUBLE) / CAST('100.0' AS DOUBLE), 6)
         AS ci_low,
       round(CAST(hi.rev AS DOUBLE) / CAST('100.0' AS DOUBLE), 6)
         AS ci_high
FROM bounds b
JOIN ranked lo ON lo.rn = b.lo_rn
JOIN ranked hi ON hi.rn = b.n + 1 - b.lo_rn, med
"""


# --------------------------------------------------------------------------
# Delete-one-block jackknife (Quenouille 1949 / Tukey 1958 — the
# RNG-free resampling inference a deterministic pair CAN express, unlike
# the bootstrap): mean daily revenue with its SE from 10 leave-one-
# block-out replicates, blocks = day-order NTILE deciles. Block sums
# and counts are exact BIGINTs, so every replicate mean divides exact
# integers; only the 10-term variance fold is doubles.
# --------------------------------------------------------------------------
def q_jackknife_se(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    blocks = daily.select(
        "rev", F.ntile(10).over(w).cast("long").alias("b")
    )
    per_b = blocks.groupBy("b").agg(
        F.sum("rev").cast("long").alias("sb"),
        F.count(F.lit(1)).cast("long").alias("nb"),
    )
    tot = per_b.agg(
        F.sum("sb").cast("long").alias("s"),
        F.sum("nb").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("g"),
    )
    # center each replicate on the exact overall mean BEFORE squaring:
    # raw second moments of ~1e8-scale near-equal means cancel to a
    # ~1e13 variance and lose the round-6 digits (observed at sf0.1)
    loo = per_b.crossJoin(F.broadcast(tot)).select(
        "g",
        "s",
        "n",
        (
            (F.col("s") - F.col("sb")).cast("double")
            / (F.col("n") - F.col("nb")).cast("double")
            - F.col("s").cast("double") / F.col("n").cast("double")
        ).alias("m"),
    )
    agg = loo.groupBy("g", "s", "n").agg(
        F.sum("m").alias("sm"), F.sum(F.col("m") * F.col("m")).alias("smm")
    )
    gd = F.col("g").cast("double")
    mbar = F.col("sm") / gd
    var = (gd - F.lit(1.0)) / gd * (
        F.col("smm") - gd * mbar * mbar
    )
    return agg.select(
        F.col("g").alias("n_blocks"),
        F.col("n").alias("n_days"),
        F.round(
            F.col("s").cast("double")
            / F.col("n").cast("double")
            / F.lit(100.0),
            6,
        ).alias("mean_daily"),
        F.round(F.sqrt(var) / F.lit(100.0), 6).alias("jackknife_se"),
    )


SQL_JACKKNIFE_SE = f"""
WITH daily AS (
  SELECT epoch_us(o_orderdate) // {US_PER_DAY_DIV} AS day,
         CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
           AS rev
  FROM orders GROUP BY 1
),
blocks AS (
  SELECT rev, CAST(ntile(10) OVER (ORDER BY day) AS BIGINT) AS b
  FROM daily
),
per_b AS (
  SELECT b, CAST(sum(rev) AS BIGINT) AS sb,
         CAST(count(*) AS BIGINT) AS nb
  FROM blocks GROUP BY b
),
tot AS (
  SELECT CAST(sum(sb) AS BIGINT) AS s, CAST(sum(nb) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS g
  FROM per_b
),
loo AS (
  SELECT g, s, n,
         CAST(s - sb AS DOUBLE) / CAST(n - nb AS DOUBLE)
           - CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS m
  FROM per_b, tot
),
agg AS (
  SELECT g, s, n, sum(m) AS sm, sum(m * m) AS smm
  FROM loo GROUP BY g, s, n
)
SELECT g AS n_blocks, n AS n_days,
       round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
             / CAST('100.0' AS DOUBLE), 6) AS mean_daily,
       round(sqrt((CAST(g AS DOUBLE) - 1.0) / CAST(g AS DOUBLE)
                  * (smm - CAST(g AS DOUBLE) * (sm / CAST(g AS DOUBLE))
                           * (sm / CAST(g AS DOUBLE))))
             / CAST('100.0' AS DOUBLE), 6) AS jackknife_se
FROM agg
"""


# --------------------------------------------------------------------------
# Price-volume-mix bridge (the FP&A revenue decomposition): between the
# two halves of the ship timeline, per-brand ΔRevenue splits EXACTLY
# into price effect (Δp·q1), volume effect (p1·Δq) and the cross term
# (Δp·Δq), summed over brands. Quantities and fixed6 revenues are exact
# integers; unit prices are their ratios; the identity total = price +
# volume + cross is verified by construction on both engines.
# --------------------------------------------------------------------------
def q_pvm_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    part = _read(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rng = li.agg(
        ((F.min("day") + F.max("day")) / 2).cast("long").alias("mid")
    )
    cells = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .crossJoin(F.broadcast(rng))
        .groupBy(
            "p_brand",
            (F.col("day") > F.col("mid")).alias("is_post"),
        )
        .agg(
            F.sum("q").cast("long").alias("qty"),
            F.sum("r6").cast("long").alias("rev6"),
        )
    )
    h1 = cells.filter(~F.col("is_post")).select(
        "p_brand",
        F.col("qty").alias("q1"),
        F.col("rev6").alias("r1"),
    )
    h2 = cells.filter(F.col("is_post")).select(
        "p_brand",
        F.col("qty").alias("q2"),
        F.col("rev6").alias("r2"),
    )
    j = h1.join(h2, "p_brand", "inner")
    p1 = F.col("r1").cast("double") / F.col("q1").cast("double")
    p2 = F.col("r2").cast("double") / F.col("q2").cast("double")
    dq = (F.col("q2") - F.col("q1")).cast("double")
    dp = p2 - p1
    eff = j.select(
        (dp * F.col("q1").cast("double")).alias("price_eff"),
        (p1 * dq).alias("vol_eff"),
        (dp * dq).alias("cross_eff"),
        (F.col("r2") - F.col("r1")).cast("double").alias("delta"),
    )
    agg = eff.agg(
        F.sum("delta").alias("d"),
        F.sum("price_eff").alias("pe"),
        F.sum("vol_eff").alias("ve"),
        F.sum("cross_eff").alias("ce"),
    )
    m = F.lit(1_000_000.0)
    return agg.select(
        F.round(F.col("d") / m, 6).alias("total_delta"),
        F.round(F.col("pe") / m, 6).alias("price_effect"),
        F.round(F.col("ve") / m, 6).alias("volume_effect"),
        F.round(F.col("ce") / m, 6).alias("cross_effect"),
    )


SQL_PVM_BRIDGE = f"""
WITH li AS (
  SELECT l_partkey, epoch_us(l_shipdate) // {US_PER_DAY_DIV} AS day,
         CAST(l_quantity AS BIGINT) AS q,
         {SQL_FIXED6_LONG.format(
             col="l_extendedprice * (1.0 - l_discount)")} AS r6
  FROM lineitem
),
rng AS (SELECT (min(day) + max(day)) // 2 AS mid FROM li),
cells AS (
  SELECT p.p_brand, li.day > rng.mid AS is_post,
         CAST(sum(li.q) AS BIGINT) AS qty,
         CAST(sum(li.r6) AS BIGINT) AS rev6
  FROM li JOIN part p ON p.p_partkey = li.l_partkey, rng
  GROUP BY 1, 2
),
j AS (
  SELECT h1.p_brand, h1.qty AS q1, h1.rev6 AS r1,
         h2.qty AS q2, h2.rev6 AS r2
  FROM (SELECT * FROM cells WHERE NOT is_post) h1
  JOIN (SELECT * FROM cells WHERE is_post) h2 USING (p_brand)
),
eff AS (
  SELECT (CAST(r2 AS DOUBLE) / CAST(q2 AS DOUBLE)
          - CAST(r1 AS DOUBLE) / CAST(q1 AS DOUBLE))
           * CAST(q1 AS DOUBLE) AS price_eff,
         (CAST(r1 AS DOUBLE) / CAST(q1 AS DOUBLE))
           * CAST(q2 - q1 AS DOUBLE) AS vol_eff,
         (CAST(r2 AS DOUBLE) / CAST(q2 AS DOUBLE)
          - CAST(r1 AS DOUBLE) / CAST(q1 AS DOUBLE))
           * CAST(q2 - q1 AS DOUBLE) AS cross_eff,
         CAST(r2 - r1 AS DOUBLE) AS delta
  FROM j
)
SELECT round(sum(delta) / CAST('1000000.0' AS DOUBLE), 6) AS total_delta,
       round(sum(price_eff) / CAST('1000000.0' AS DOUBLE), 6)
         AS price_effect,
       round(sum(vol_eff) / CAST('1000000.0' AS DOUBLE), 6)
         AS volume_effect,
       round(sum(cross_eff) / CAST('1000000.0' AS DOUBLE), 6)
         AS cross_effect
FROM eff
"""


# --------------------------------------------------------------------------
# Lincoln-Petersen capture-recapture estimate of corpus size: two
# independent md5-coin "captures" of the documents table (p = 3/10
# each), the mark-recapture estimator N_hat = n1*n2/m vs the true count
# — the classic audit for estimating an unknown population (dedup'd
# entities, crawl frontier) from overlapping samples when a full scan is
# impossible. Coins are engine-portable md5 integer arithmetic
# (invariant 2); every count is exact; N_hat and the relative error are
# single double expressions rounded 6.
# --------------------------------------------------------------------------
def q_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents").select("doc_id")

    def coin(seed: str) -> F.Column:
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(seed + ":"),
                            F.col("doc_id").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 10
            < 3
        ).cast("long")
    marked = docs.select(
        coin("cap1").alias("c1"), coin("cap2").alias("c2")
    )
    agg = marked.agg(
        F.count(F.lit(1)).cast("long").alias("n_true"),
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
        F.sum(F.col("c1") * F.col("c2")).cast("long").alias("m"),
    )
    nhat = (F.col("n1") * F.col("n2")).cast("double") / F.col("m").cast(
        "double"
    )
    return agg.select(
        "n_true",
        "n1",
        "n2",
        "m",
        F.round(nhat, 6).alias("n_hat"),
        F.round(
            (nhat - F.col("n_true").cast("double"))
            / F.col("n_true").cast("double"),
            6,
        ).alias("rel_error"),
    )


SQL_CAPTURE_RECAPTURE = """
WITH marked AS (
  SELECT CASE WHEN CAST('0x' || substr(md5('cap1:' ||
              CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 10 < 3
         THEN 1 ELSE 0 END AS c1,
         CASE WHEN CAST('0x' || substr(md5('cap2:' ||
              CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 10 < 3
         THEN 1 ELSE 0 END AS c2
  FROM documents
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_true,
         CAST(sum(c1) AS BIGINT) AS n1,
         CAST(sum(c2) AS BIGINT) AS n2,
         CAST(sum(c1 * c2) AS BIGINT) AS m
  FROM marked
)
SELECT n_true, n1, n2, m,
       round(CAST(n1 * n2 AS DOUBLE) / CAST(m AS DOUBLE), 6) AS n_hat,
       round((CAST(n1 * n2 AS DOUBLE) / CAST(m AS DOUBLE)
              - CAST(n_true AS DOUBLE)) / CAST(n_true AS DOUBLE), 6)
         AS rel_error
FROM agg
"""


# --------------------------------------------------------------------------
# Coupon-collector completion audit: per user, the number of events it
# took to see every event type at least once (first-occurrence marks →
# running sum → first index hitting K), against the theoretical
# K·H_K expectation for uniform draws — the engagement-breadth
# diagnostic (real users complete much slower than uniform because type
# mixes are skewed). K and H_K are derived IN-PLAN from the data; the
# tiny harmonic sum folds a sequence in EXPLICIT ascending order on both
# engines (ordered fold, invariant 4). All counts exact; two divides.
# --------------------------------------------------------------------------
def q_coupon_collector(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wut = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    marked = events.select(
        "user_id",
        F.row_number().over(wu).cast("long").alias("rn"),
        (F.row_number().over(wut) == 1).cast("long").alias("first"),
    ).withColumn(
        "seen",
        F.sum("first").over(
            Window.partitionBy("user_id")
            .orderBy("rn")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    k_df = events.groupBy("event_type").agg(F.lit(1).alias("_o")).agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    n_users = events.groupBy("user_id").agg(F.lit(1).alias("_o")).agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
    done = (
        marked.crossJoin(F.broadcast(k_df))
        .filter(F.col("seen") == F.col("k"))
        .groupBy("user_id")
        .agg(F.min("rn").cast("long").alias("t"))
    )
    agg = done.agg(
        F.count(F.lit(1)).cast("long").alias("n_complete"),
        F.sum("t").cast("long").alias("_st"),
    )
    harm = F.aggregate(
        F.sequence(F.lit(1), F.col("k").cast("int")),
        F.lit(0.0),
        lambda acc, i: acc + F.lit(1.0) / i.cast("double"),
    )
    expected = F.col("k").cast("double") * harm
    mean_obs = F.col("_st").cast("double") / F.col("n_complete").cast(
        "double"
    )
    return (
        agg.crossJoin(F.broadcast(k_df))
        .crossJoin(F.broadcast(n_users))
        .select(
            F.col("k").alias("n_types"),
            "n_users",
            "n_complete",
            F.round(mean_obs, 6).alias("mean_events_to_complete"),
            F.round(expected, 6).alias("expected_uniform"),
            F.round(mean_obs / expected, 6).alias("slowdown_ratio"),
        )
    )


SQL_COUPON_COLLECTOR = """
WITH marked AS (
  SELECT user_id,
         CAST(row_number() OVER wu AS BIGINT) AS rn,
         CASE WHEN row_number()
                OVER (PARTITION BY user_id, event_type
                      ORDER BY ts, event_id) = 1
              THEN 1 ELSE 0 END AS first
  FROM events
  WINDOW wu AS (PARTITION BY user_id ORDER BY ts, event_id)
),
seen AS (
  SELECT user_id, rn,
         CAST(sum(first) OVER (PARTITION BY user_id ORDER BY rn
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS seen
  FROM marked
),
kk AS (
  SELECT CAST(count(*) AS BIGINT) AS k
  FROM (SELECT DISTINCT event_type FROM events)
),
nu AS (
  SELECT CAST(count(*) AS BIGINT) AS n_users
  FROM (SELECT DISTINCT user_id FROM events)
),
done AS (
  SELECT user_id, CAST(min(rn) AS BIGINT) AS t
  FROM seen, kk WHERE seen = kk.k
  GROUP BY user_id
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_complete,
         CAST(sum(t) AS BIGINT) AS st
  FROM done
)
SELECT kk.k AS n_types, nu.n_users, agg.n_complete,
       round(CAST(st AS DOUBLE) / CAST(n_complete AS DOUBLE), 6)
         AS mean_events_to_complete,
       round(CAST(kk.k AS DOUBLE)
             * list_sum(list_transform(range(1, CAST(kk.k AS INT) + 1),
                                       i -> 1.0 / CAST(i AS DOUBLE))), 6)
         AS expected_uniform,
       round((CAST(st AS DOUBLE) / CAST(n_complete AS DOUBLE))
             / (CAST(kk.k AS DOUBLE)
                * list_sum(list_transform(range(1, CAST(kk.k AS INT) + 1),
                                          i -> 1.0 / CAST(i AS DOUBLE)))),
             6) AS slowdown_ratio
FROM agg, kk, nu
"""


# --------------------------------------------------------------------------
# Inspection paradox (length-biased sampling) on inter-event gaps: the
# interval containing a uniformly random probe has mean E[g^2]/E[g],
# not E[g] — the waiting-time bias every on-call latency report should
# correct for. Gaps quantize to EXACT integer minutes (µs DIV 6e7 —
# floor division keeps BIGINT squares safe at any corpus size where µs²
# would overflow); both moment sums are exact BIGINTs and the ratio
# n·Σg²/(Σg)² is a single double expression, rounded 6.
# --------------------------------------------------------------------------
def q_inspection_paradox(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        events.select(
            "user_id",
            ntz_epoch_us(F.col("ts")).alias("_us"),
            "event_id",
        )
        .select(
            "user_id",
            (F.col("_us") - F.lag("_us").over(
                Window.partitionBy("user_id").orderBy("_us", "event_id")
            )).alias("g"),
        )
        .filter(F.col("g").isNotNull())
        .select(F.expr("g DIV 60000000").cast("long").alias("gm"))
    )
    agg = gaps.agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum("gm").cast("long").alias("sg"),
        F.sum(F.col("gm") * F.col("gm")).cast("long").alias("sgg"),
    )
    mean = F.col("sg").cast("double") / F.col("n_gaps").cast("double")
    lbias = F.col("sgg").cast("double") / F.col("sg").cast("double")
    return agg.select(
        "n_gaps",
        F.round(mean, 6).alias("mean_gap_min"),
        F.round(lbias, 6).alias("length_biased_mean_min"),
        F.round(
            F.col("n_gaps").cast("double")
            * F.col("sgg").cast("double")
            / (F.col("sg").cast("double") * F.col("sg").cast("double")),
            6,
        ).alias("inspection_ratio"),
    )


SQL_INSPECTION_PARADOX = """
WITH gaps AS (
  SELECT (epoch_us(ts) - lag(epoch_us(ts))
            OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
           // 60000000 AS gm
  FROM events
  QUALIFY gm IS NOT NULL
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_gaps,
         CAST(sum(gm) AS BIGINT) AS sg,
         CAST(sum(gm * gm) AS BIGINT) AS sgg
  FROM gaps
)
SELECT n_gaps,
       round(CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE), 6)
         AS mean_gap_min,
       round(CAST(sgg AS DOUBLE) / CAST(sg AS DOUBLE), 6)
         AS length_biased_mean_min,
       round(CAST(n_gaps AS DOUBLE) * CAST(sgg AS DOUBLE)
             / (CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)), 6)
         AS inspection_ratio
FROM agg
"""


QUERIES = {
    "anderson_darling": q_anderson_darling,
    "benford_audit": q_benford_audit,
    "brown_forsythe": q_brown_forsythe,
    "capture_recapture": q_capture_recapture,
    "cohen_kappa": q_cohen_kappa,
    "contingency_chi2": q_contingency_chi2,
    "coupon_collector": q_coupon_collector,
    "durbin_watson": q_durbin_watson,
    "equidepth_histogram": q_equidepth_histogram,
    "feature_correlation": q_feature_correlation,
    "friedman_test": q_friedman_test,
    "group_percentiles": q_group_percentiles,
    "grubbs_test": q_grubbs_test,
    "gumbel_maxima": q_gumbel_maxima,
    "hill_tail_index": q_hill_tail_index,
    "inspection_paradox": q_inspection_paradox,
    "jackknife_se": q_jackknife_se,
    "jarque_bera": q_jarque_bera,
    "kendall_tau": q_kendall_tau,
    "kruskal_wallis": q_kruskal_wallis,
    "ks_two_sample": q_ks_two_sample,
    "lorenz_deciles": q_lorenz_deciles,
    "mad_outliers": q_mad_outliers,
    "mann_whitney": q_mann_whitney,
    "median_ci": q_median_ci,
    "nb_dispersion": q_nb_dispersion,
    "odds_ratio": q_odds_ratio,
    "pearson_residuals": q_pearson_residuals,
    "powerlaw_fit": q_powerlaw_fit,
    "pvm_bridge": q_pvm_bridge,
    "runs_test": q_runs_test,
    "simpson_diversity": q_simpson_diversity,
    "theil_decomposition": q_theil_decomposition,
    "trimmed_stats": q_trimmed_stats,
    "weighted_sample": q_weighted_sample,
}

ORACLES = {
    "anderson_darling": SQL_ANDERSON_DARLING,
    "benford_audit": SQL_BENFORD_AUDIT,
    "brown_forsythe": SQL_BROWN_FORSYTHE,
    "capture_recapture": SQL_CAPTURE_RECAPTURE,
    "cohen_kappa": SQL_COHEN_KAPPA,
    "contingency_chi2": SQL_CONTINGENCY_CHI2,
    "coupon_collector": SQL_COUPON_COLLECTOR,
    "durbin_watson": SQL_DURBIN_WATSON,
    "equidepth_histogram": SQL_EQUIDEPTH_HISTOGRAM,
    "feature_correlation": SQL_FEATURE_CORRELATION,
    "friedman_test": SQL_FRIEDMAN_TEST,
    "group_percentiles": SQL_GROUP_PERCENTILES,
    "grubbs_test": SQL_GRUBBS_TEST,
    "gumbel_maxima": SQL_GUMBEL_MAXIMA,
    "hill_tail_index": SQL_HILL_TAIL_INDEX,
    "inspection_paradox": SQL_INSPECTION_PARADOX,
    "jackknife_se": SQL_JACKKNIFE_SE,
    "jarque_bera": SQL_JARQUE_BERA,
    "kendall_tau": SQL_KENDALL_TAU,
    "kruskal_wallis": SQL_KRUSKAL_WALLIS,
    "ks_two_sample": SQL_KS_TWO_SAMPLE,
    "lorenz_deciles": SQL_LORENZ_DECILES,
    "mad_outliers": SQL_MAD_OUTLIERS,
    "mann_whitney": SQL_MANN_WHITNEY,
    "median_ci": SQL_MEDIAN_CI,
    "nb_dispersion": SQL_NB_DISPERSION,
    "odds_ratio": SQL_ODDS_RATIO,
    "pearson_residuals": SQL_PEARSON_RESIDUALS,
    "powerlaw_fit": SQL_POWERLAW_FIT,
    "pvm_bridge": SQL_PVM_BRIDGE,
    "runs_test": SQL_RUNS_TEST,
    "simpson_diversity": SQL_SIMPSON_DIVERSITY,
    "theil_decomposition": SQL_THEIL_DECOMPOSITION,
    "trimmed_stats": SQL_TRIMMED_STATS,
    "weighted_sample": SQL_WEIGHTED_SAMPLE,
}
