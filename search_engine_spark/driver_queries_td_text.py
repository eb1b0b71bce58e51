"""Corpus/text-statistics and language-model pairs.

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
    BM25_B,
    BM25_K1,
    MARKOV_ITERS,
    NEWS_QUERY_TERMS,
    TOKEN_RUN,
    US_PER_DAY_DIV,
    US_PER_HOUR_DIV,
    WORD_RUN,
    _MARKOV_CTES,
    _lang_sql,
    _markov_chain,
    _read,
)

# --------------------------------------------------------------------------
# Corpus delta report (incremental indexing): classify every doc across two
# corpus versions as added / removed / changed / unchanged with doc and
# char totals — the audit that sizes an incremental index refresh (the
# streaming pipeline's apply_batch consumes exactly the changed+added
# set). v2 is derived deterministically on both sides (the shared-
# expression pattern): docs %13 dropped, %7 text-shifted, %11 re-added
# under new ids. One full-outer join on the uniform doc_id key.
# --------------------------------------------------------------------------
DELTA_ADD_OFFSET = 200000


def _delta_v2(docs: DataFrame) -> DataFrame:
    changed = docs.filter(
        (F.col("doc_id") % 7 == 0) & (F.col("doc_id") % 13 != 0)
    ).select("doc_id", F.expr("substring(text, 16)").alias("text"))
    kept = docs.filter(
        (F.col("doc_id") % 7 != 0) & (F.col("doc_id") % 13 != 0)
    ).select("doc_id", "text")
    added = docs.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + DELTA_ADD_OFFSET).alias("doc_id"),
        F.concat("text", F.lit(" appended v2 section")).alias("text"),
    )
    return changed.unionByName(kept).unionByName(added)


def q_corpus_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    v2 = _delta_v2(docs)
    a = docs.select(F.col("doc_id"), F.col("text").alias("_ta"))
    b = v2.select(F.col("doc_id"), F.col("text").alias("_tb"))
    j = a.join(b, "doc_id", "full_outer").select(
        F.when(F.col("_ta").isNull(), F.lit("added"))
        .when(F.col("_tb").isNull(), F.lit("removed"))
        .when(F.col("_ta") != F.col("_tb"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("class"),
        F.coalesce(F.length("_tb"), F.length("_ta"))
        .cast("long")
        .alias("n_chars"),
    )
    return j.groupBy("class").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("n_chars")
    )


SQL_CORPUS_DELTA = f"""
WITH v2 AS (
  SELECT doc_id, substring(text, 16) AS text FROM documents
  WHERE doc_id % 7 = 0 AND doc_id % 13 != 0
  UNION ALL
  SELECT doc_id, text FROM documents
  WHERE doc_id % 7 != 0 AND doc_id % 13 != 0
  UNION ALL
  SELECT doc_id + {DELTA_ADD_OFFSET}, text || ' appended v2 section'
  FROM documents WHERE doc_id % 11 = 0
),
j AS (
  SELECT CASE WHEN a.doc_id IS NULL THEN 'added'
              WHEN b.doc_id IS NULL THEN 'removed'
              WHEN a.text != b.text THEN 'changed'
              ELSE 'unchanged' END AS class,
         CAST(COALESCE(length(b.text), length(a.text)) AS BIGINT) AS n_chars
  FROM documents a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id
)
SELECT class, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS n_chars
FROM j GROUP BY class
"""


# --------------------------------------------------------------------------
# Language ID (marker heuristic, CJK short-circuit)
# --------------------------------------------------------------------------
def q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    return X.language_id(docs).select(
        "doc_id",
        "pred_lang",
        "en_hits",
        "de_hits",
        "fr_hits",
        "es_hits",
        "cjk_chars",
        (F.col("pred_lang") == F.col("lang")).alias("lang_match"),
    )


SQL_LANGUAGE_ID = _lang_sql()


# --------------------------------------------------------------------------
# Token counting (whitespace + BPE-ish + chars)
# --------------------------------------------------------------------------
def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    return X.token_counts(docs).select(
        "doc_id", "ws_tokens", "bpe_tokens", "n_chars"
    )


SQL_TOKEN_COUNTS = rf"""
SELECT doc_id,
       {SQL_WS_TOKENS.format(col="text")} AS ws_tokens,
       len(regexp_extract_all(lower(text), '{X.BPE_RUN}')) AS bpe_tokens,
       length(text) AS n_chars
FROM documents
"""


# --------------------------------------------------------------------------
# Exact length quantiles per language (textstats.py length_quantiles):
# type-1 percentiles of the whitespace-token count via the bounded
# (stratum, length) distribution — pure integer arithmetic end to end.
# --------------------------------------------------------------------------
LQ_PERCENTS = (25, 50, 75, 90)


def q_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    return X.length_quantiles(docs, percents=LQ_PERCENTS, stratum_col="lang")


SQL_LENGTH_QUANTILES = f"""
WITH d AS (
  SELECT lang AS stratum, {SQL_WS_TOKENS.format(col="text")} AS n
  FROM documents
),
dist AS (SELECT stratum, n, count(*) AS cnt FROM d GROUP BY stratum, n),
cum AS (
  SELECT stratum, n,
         sum(cnt) OVER (PARTITION BY stratum) AS total,
         sum(cnt) OVER (PARTITION BY stratum ORDER BY n
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM dist
),
p AS (SELECT unnest([{", ".join(str(p) for p in LQ_PERCENTS)}]) AS pct)
SELECT stratum, CAST(pct AS BIGINT) AS pct,
       CAST(max(total) AS BIGINT) AS n_docs,
       CAST(min(n) AS BIGINT) AS value
FROM cum, p
WHERE cum >= (total * pct + 99) // 100
GROUP BY stratum, pct
"""


# --------------------------------------------------------------------------
# Per-document lexical diversity: type-token ratio + Shannon entropy of
# the doc's own term distribution (Shannon 1948; the templated/keyword-
# stuffed-page detector — natural prose sits near the corpus entropy band,
# boilerplate collapses toward 0). ZERO shuffles: every metric is a
# per-row array expression (the gopher_repetition pattern). Invariant 4:
# H = ln N − (1/N)·Σ ln c_i is computed with EVERY ln quantized fixed6
# immediately (BIGINT sums are order-free; a raw double fold could differ
# by an engine ulp), the final value one divide of exact integers
# rounded 6. The instance-count lookup is the O(n²) list_filter form —
# exact and identical in both engines, bounded by the ~30-token synthetic
# docs (a production corpus would pre-sort and run-length the array).
# --------------------------------------------------------------------------
def q_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    return docs.selectExpr(
        "doc_id",
        f"regexp_extract_all(lower(text), '{WORD_RUN}', 0) AS toks",
    ).selectExpr(
        "doc_id",
        "cast(size(toks) AS bigint) AS n_tokens",
        "cast(size(array_distinct(toks)) AS bigint) AS n_types",
        """CASE WHEN size(toks) > 0 THEN
             round(cast(size(array_distinct(toks)) AS double)
                   / size(toks), 6)
           END AS ttr""",
        """CASE WHEN size(toks) > 0 THEN
             round((cast(size(toks) AS double)
                     * cast(round(ln(size(toks)) * 1000000.0) AS bigint)
                    - aggregate(
                        transform(toks, x -> cast(round(
                            ln(size(filter(toks, y -> y = x)))
                            * 1000000.0) AS bigint)),
                        cast(0 AS bigint), (acc, v) -> acc + v))
                   / (size(toks) * cast(1000000.0 AS double)), 6)
           END AS entropy""",
    )


SQL_LEXICAL_DIVERSITY = f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{WORD_RUN}') AS toks
  FROM documents
)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(toks)) AS BIGINT) AS n_types,
       CASE WHEN len(toks) > 0 THEN
         round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6)
       END AS ttr,
       CASE WHEN len(toks) > 0 THEN
         round((CAST(len(toks) AS DOUBLE)
                 * CAST(round(ln(len(toks)) * 1000000.0) AS BIGINT)
                - CAST(list_sum(list_transform(toks, x -> CAST(round(
                      ln(len(list_filter(toks, y -> y = x)))
                      * 1000000.0) AS BIGINT))) AS BIGINT))
               / (len(toks) * CAST(1000000.0 AS DOUBLE)), 6)
       END AS entropy
FROM t
"""


# --------------------------------------------------------------------------
# Dunning log-likelihood keyness (Dunning 1993): which terms are
# over-represented in one sub-corpus vs the rest — THE corpus-comparison
# statistic (keyword extraction for domain drift, source profiling,
# contamination forensics). 2x2 contingency per term from exact BIGINT
# ctfs; each O·ln(O/E) term is ONE ln expression of exact integers
# quantized fixed6 immediately (0·ln0 = 0 by the CASE guard), G² sums the
# quantized terms in BIGINT and ranking keys on that exact integer
# (invariant 4); corpus totals ride in-plan. Token stream shuffles once
# to the vocab-bounded (term, side) key with map-side partials.
# --------------------------------------------------------------------------
KEYNESS_LANG = "en"
KEYNESS_MIN_CTF = 5
KEYNESS_K = 50


def q_keyness_llr(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    toks = docs.select(
        (F.col("lang") == KEYNESS_LANG).cast("int").alias("in_a"),
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(WORD_RUN), F.lit(0))
        ).alias("term"),
    )
    per_term = toks.groupBy("term").agg(
        F.sum("in_a").cast("long").alias("a"),
        F.sum(F.lit(1) - F.col("in_a")).cast("long").alias("b"),
    )
    tot = per_term.agg(
        F.sum("a").cast("long").alias("na"), F.sum("b").cast("long").alias("nb")
    )
    j = per_term.crossJoin(F.broadcast(tot)).filter(
        F.col("a") + F.col("b") >= KEYNESS_MIN_CTF
    )
    ad, bd = F.col("a").cast("double"), F.col("b").cast("double")
    nad, nbd = F.col("na").cast("double"), F.col("nb").cast("double")
    ea = nad * (ad + bd) / (nad + nbd)
    eb = nbd * (ad + bd) / (nad + nbd)
    t1_6 = F.when(
        F.col("a") > 0,
        F.round(ad * F.log(ad / ea) * F.lit(1000000.0), 0).cast("long"),
    ).otherwise(F.lit(0))
    t2_6 = F.when(
        F.col("b") > 0,
        F.round(bd * F.log(bd / eb) * F.lit(1000000.0), 0).cast("long"),
    ).otherwise(F.lit(0))
    scored = j.select(
        "term",
        F.col("a").alias("ctf_a"),
        F.col("b").alias("ctf_b"),
        (F.lit(2) * (t1_6 + t2_6)).alias("g6"),
        (ad / nad > bd / nbd).alias("enriched_in_a"),
    )
    return (
        scored.orderBy(F.desc("g6"), F.asc("term"))
        .limit(KEYNESS_K)
        .select(
            "term",
            "ctf_a",
            "ctf_b",
            F.round(F.col("g6") / F.lit(1000000.0), 6).alias("llr_g2"),
            "enriched_in_a",
        )
    )


SQL_KEYNESS_LLR = f"""
WITH toks AS (
  SELECT CASE WHEN lang = '{KEYNESS_LANG}' THEN 1 ELSE 0 END AS in_a,
         unnest(regexp_extract_all(lower(text), '{WORD_RUN}')) AS term
  FROM documents
),
per_term AS (
  SELECT term, CAST(sum(in_a) AS BIGINT) AS a,
         CAST(sum(1 - in_a) AS BIGINT) AS b
  FROM toks GROUP BY term
),
tot AS (
  SELECT CAST(sum(a) AS BIGINT) AS na, CAST(sum(b) AS BIGINT) AS nb
  FROM per_term
),
scored AS (
  SELECT p.term, p.a, p.b,
         2 * (CASE WHEN p.a > 0 THEN
                CAST(round(CAST(p.a AS DOUBLE)
                           * ln(CAST(p.a AS DOUBLE)
                                / (CAST(t.na AS DOUBLE) * (p.a + p.b)
                                   / (CAST(t.na AS DOUBLE) + t.nb)))
                           * 1000000.0) AS BIGINT)
              ELSE 0 END
            + CASE WHEN p.b > 0 THEN
                CAST(round(CAST(p.b AS DOUBLE)
                           * ln(CAST(p.b AS DOUBLE)
                                / (CAST(t.nb AS DOUBLE) * (p.a + p.b)
                                   / (CAST(t.na AS DOUBLE) + t.nb)))
                           * 1000000.0) AS BIGINT)
              ELSE 0 END) AS g6,
         (CAST(p.a AS DOUBLE) / t.na > CAST(p.b AS DOUBLE) / t.nb)
           AS enriched_in_a
  FROM per_term p, tot t
  WHERE p.a + p.b >= {KEYNESS_MIN_CTF}
)
SELECT term, a AS ctf_a, b AS ctf_b,
       round(g6 / 1000000.0, 6) AS llr_g2,
       enriched_in_a
FROM scored
ORDER BY g6 DESC, term ASC
LIMIT {KEYNESS_K}
"""


# --------------------------------------------------------------------------
# Term burstiness (Church & Gale 1995; Katz 1996): content words CLUMP —
# observed document frequency falls well below the Poisson expectation
# N·(1−exp(−ctf/N)) for the same total count, while function words track
# it. The df_ratio column is the classic content-word detector (and a
# quality signal: machine-generated spam is abnormally un-bursty). The
# token stream collapses once through the two-phase skew-free
# doc_frequencies (invariant 6); N rides in-plan as a broadcast scalar;
# df/ctf are exact BIGINTs and each float column is ONE expression of
# those integers (exp/divide) rounded 6 (invariant 4).
# --------------------------------------------------------------------------
BURST_MIN_CTF = 10


def q_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(WORD_RUN), F.lit(0))
        ).alias("word"),
    )
    stats = doc_frequencies(
        words, key="word", with_ctf=True, ctf_alias="ctf"
    ).filter(F.col("ctf") >= BURST_MIN_CTF)
    n_df = scalar_count(docs.select("doc_id"), as_double=False)
    return stats.crossJoin(F.broadcast(n_df)).select(
        "word",
        F.col("doc_frequency").cast("long").alias("df"),
        F.col("ctf").cast("long").alias("ctf"),
        F.round(
            F.col("ctf").cast("double") / F.col("doc_frequency"), 6
        ).alias("burstiness"),
        F.round(
            F.col("doc_frequency").cast("double")
            / (
                F.col("_n").cast("double")
                * (
                    F.lit(1.0)
                    - F.exp(
                        -(F.col("ctf").cast("double") / F.col("_n"))
                    )
                )
            ),
            6,
        ).alias("df_ratio"),
    )


SQL_TERM_BURSTINESS = f"""
WITH words AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{WORD_RUN}')) AS word
  FROM documents
),
per_doc AS (
  SELECT word, doc_id, CAST(count(*) AS BIGINT) AS k
  FROM words GROUP BY word, doc_id
),
stats AS (
  SELECT word, CAST(count(*) AS BIGINT) AS df, CAST(sum(k) AS BIGINT) AS ctf
  FROM per_doc GROUP BY word
  HAVING sum(k) >= {BURST_MIN_CTF}
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)
SELECT s.word, s.df, s.ctf,
       round(CAST(s.ctf AS DOUBLE) / s.df, 6) AS burstiness,
       round(CAST(s.df AS DOUBLE)
             / (CAST(nn.n AS DOUBLE)
                * (1.0 - exp(-(CAST(s.ctf AS DOUBLE) / nn.n)))), 6)
         AS df_ratio
FROM stats s, nn
"""


# --------------------------------------------------------------------------
# Distribution-shape report: mean/variance/skewness/excess-kurtosis of
# doc token length per language — the moments a curation pipeline reads
# before setting length gates (a heavy right tail means a length cap
# bites real prose). ONE map-side pass builds exact BIGINT power sums
# (Σx..Σx⁴; x ≤ a few hundred tokens keeps Σx⁴ far under 2^63 per
# stratum), then each central moment is a SINGLE double expression of
# those exact integers (IEEE products of exact values — identical in both
# engines; never Spark's built-in skewness/kurtosis, whose streaming
# accumulation is order-dependent), rounded 6, NULL-guarded on zero
# variance (invariant 4).
# --------------------------------------------------------------------------
def q_length_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    x = docs.select(
        "lang",
        F.size(
            F.regexp_extract_all(F.lower("text"), F.lit(WORD_RUN), F.lit(0))
        )
        .cast("long")
        .alias("x"),
    )
    s = x.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s1"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("s2"),
        F.sum(F.col("x") * F.col("x") * F.col("x")).cast("long").alias("s3"),
        F.sum(F.col("x") * F.col("x") * F.col("x") * F.col("x"))
        .cast("long")
        .alias("s4"),
    )
    n = F.col("n").cast("double")
    s1, s2 = F.col("s1").cast("double"), F.col("s2").cast("double")
    s3, s4 = F.col("s3").cast("double"), F.col("s4").cast("double")
    m2 = (n * s2 - s1 * s1) / (n * n)
    m3 = (n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1) / (n * n * n)
    m4 = (
        n * n * n * s4
        - 4 * n * n * s1 * s3
        + 6 * n * s1 * s1 * s2
        - 3 * s1 * s1 * s1 * s1
    ) / (n * n * n * n)
    return s.select(
        "lang",
        "n",
        F.round(s1 / n, 6).alias("mean_len"),
        F.round(m2, 6).alias("variance"),
        # m2*sqrt(m2), not pow(m2, 1.5): sqrt is IEEE-correctly-rounded in
        # both engines, pow is not
        F.when(m2 > 0, F.round(m3 / (m2 * F.sqrt(m2)), 6)).alias("skewness"),
        F.when(m2 > 0, F.round(m4 / (m2 * m2) - 3.0, 6)).alias("kurtosis"),
    )


SQL_LENGTH_MOMENTS = f"""
WITH x AS (
  SELECT lang,
         CAST(len(regexp_extract_all(lower(text), '{WORD_RUN}')) AS BIGINT)
           AS x
  FROM documents
),
s AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS s1,
         CAST(sum(x * x) AS BIGINT) AS s2,
         CAST(sum(x * x * x) AS BIGINT) AS s3,
         CAST(sum(x * x * x * x) AS BIGINT) AS s4
  FROM x GROUP BY lang
),
m AS (
  SELECT lang, n,
         CAST(s1 AS DOUBLE) AS s1, CAST(s2 AS DOUBLE) AS s2,
         CAST(s3 AS DOUBLE) AS s3, CAST(s4 AS DOUBLE) AS s4,
         CAST(n AS DOUBLE) AS nd
  FROM s
)
SELECT lang, n,
       round(s1 / nd, 6) AS mean_len,
       round((nd * s2 - s1 * s1) / (nd * nd), 6) AS variance,
       CASE WHEN (nd * s2 - s1 * s1) / (nd * nd) > 0 THEN
         round(((nd * nd * s3 - 3 * nd * s1 * s2 + 2 * s1 * s1 * s1)
                / (nd * nd * nd))
               / (((nd * s2 - s1 * s1) / (nd * nd))
                  * sqrt((nd * s2 - s1 * s1) / (nd * nd))), 6)
       END AS skewness,
       CASE WHEN (nd * s2 - s1 * s1) / (nd * nd) > 0 THEN
         round(((nd * nd * nd * s4 - 4 * nd * nd * s1 * s3
                 + 6 * nd * s1 * s1 * s2 - 3 * s1 * s1 * s1 * s1)
                / (nd * nd * nd * nd))
               / (((nd * s2 - s1 * s1) / (nd * nd))
                  * ((nd * s2 - s1 * s1) / (nd * nd))) - 3.0, 6)
       END AS kurtosis
FROM m
"""


# --------------------------------------------------------------------------
# Function-word stylometry profile per source (Mosteller & Wallace 1964 —
# the authorship / template-detection signal; a source whose function-word
# rates sit far from the corpus norm is machine-generated or boilerplate).
# The function-word filter runs MAP-SIDE before any shuffle, so the only
# keyed aggregations are (source, word) — bounded by sources × list — and
# per-source token totals (plain counts with map-side partials). Zero
# counts are materialized via the literal word list × distinct sources so
# both engines emit identical row sets. Invariant 4: rate per 1000 tokens
# is the one divide of exact BIGINTs, rounded 6.
# --------------------------------------------------------------------------
FUNC_WORDS = (
    "the", "of", "and", "to", "in", "is", "it", "for", "with", "that",
)
_FUNC_SQL = ", ".join(f"('{w}')" for w in FUNC_WORDS)


def q_stylometry(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(WORD_RUN), F.lit(0))
        ).alias("word"),
    )
    totals = toks.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("total_tokens")
    )
    hits = (
        toks.filter(F.col("word").isin(*FUNC_WORDS))
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    grid = totals.crossJoin(
        spark.createDataFrame([(w,) for w in FUNC_WORDS], "word string")
    )
    return (
        grid.join(hits, ["source", "word"], "left")
        .select(
            "source",
            "word",
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
            "total_tokens",
            F.when(
                F.col("total_tokens") > 0,
                F.round(
                    F.lit(1000.0) * F.coalesce("n", F.lit(0)).cast("double")
                    / F.col("total_tokens"),
                    6,
                ),
            ).alias("rate_per_1000"),
        )
    )


SQL_STYLOMETRY = f"""
WITH toks AS (
  SELECT source, unnest(regexp_extract_all(lower(text), '{WORD_RUN}')) AS word
  FROM documents
),
totals AS (
  SELECT source, CAST(count(*) AS BIGINT) AS total_tokens
  FROM toks GROUP BY source
),
hits AS (
  SELECT source, word, CAST(count(*) AS BIGINT) AS n
  FROM toks WHERE word IN ({", ".join(f"'{w}'" for w in FUNC_WORDS)})
  GROUP BY source, word
),
grid AS (
  SELECT t.source, w.word, t.total_tokens
  FROM totals t CROSS JOIN (VALUES {_FUNC_SQL}) AS w(word)
)
SELECT g.source, g.word,
       CAST(COALESCE(h.n, 0) AS BIGINT) AS n,
       g.total_tokens,
       CASE WHEN g.total_tokens > 0 THEN
         round(1000.0 * COALESCE(h.n, 0) / g.total_tokens, 6)
       END AS rate_per_1000
FROM grid g
LEFT JOIN hits h ON h.source = g.source AND h.word = g.word
"""


# --------------------------------------------------------------------------
# Chao1 vocabulary-richness estimate (Chao 1984; Gale & Sampson's "how
# big is the unseen vocabulary" question): per language, observed
# distinct words, singleton/doubleton counts, and
# chao1 = V + f1·(f1−1)/(2·(f2+1)) — the lower-bound estimate of the
# TRUE vocabulary including unseen words; the index-sizing companion to
# heaps_law. ONE shuffle collapses the token stream to the vocab-bounded
# (lang, word) counts (map-side partials); f1/f2/V fold from that
# aggregated relation; the estimate is one expression of exact BIGINTs
# rounded 6 (invariant 4).
# --------------------------------------------------------------------------
def q_chao1_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    wc = (
        docs.select(
            "lang",
            F.explode(
                F.regexp_extract_all(F.lower("text"), F.lit(WORD_RUN), F.lit(0))
            ).alias("word"),
        )
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    agg = wc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("v_obs"),
        F.sum((F.col("c") == 1).cast("long")).cast("long").alias("f1"),
        F.sum((F.col("c") == 2).cast("long")).cast("long").alias("f2"),
    )
    return agg.select(
        "lang",
        "v_obs",
        "f1",
        "f2",
        F.round(
            F.col("v_obs")
            + F.col("f1").cast("double")
            * (F.col("f1") - 1)
            / (F.lit(2.0) * (F.col("f2") + 1)),
            6,
        ).alias("chao1"),
    )


SQL_CHAO1_VOCAB = f"""
WITH wc AS (
  SELECT lang, word, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT lang,
               unnest(regexp_extract_all(lower(text), '{WORD_RUN}')) AS word
        FROM documents)
  GROUP BY lang, word
),
agg AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS v_obs,
         CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
         CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
  FROM wc GROUP BY lang
)
SELECT lang, v_obs, f1, f2,
       round(v_obs + CAST(f1 AS DOUBLE) * (f1 - 1) / (2.0 * (f2 + 1)), 6)
         AS chao1
FROM agg
"""


# --------------------------------------------------------------------------
# Pairwise Jensen-Shannon divergence between language sub-corpus unigram
# LMs (Lin 1991) — the distribution-shift diagnostic behind data-mixing
# decisions (complements keyness_llr's one-vs-rest G² and dsir_weights'
# importance ratios): JS in [0,1] bits, symmetric, finite even where one
# side's probability is 0. Both distributions are exact rationals of
# BIGINT ctfs; each per-term contribution 0.5·pa·log2(2pa/(pa+pb)) +
# 0.5·pb·log2(2pb/(pa+pb)) is ONE scalar double expression quantized
# fixed9 (JS terms are ~1e-3-scale; 1e9 keeps quantization below
# reporting precision with sums ≤1e9, no overflow) before the per-pair
# BIGINT sum (invariant 4). Shape: the token stream shuffles once to the
# vocab-bounded (lang, term) key; the |langs|² pair relation broadcasts;
# the pair-term fan-out is |pairs|·vocab — bounded by vocabulary, not
# corpus size.
# --------------------------------------------------------------------------
def q_lang_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    pt = (
        docs.select(
            "lang",
            F.explode(
                F.regexp_extract_all(
                    F.lower("text"), F.lit(TOKEN_RUN), F.lit(0)
                )
            ).alias("term"),
        )
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("ctf"))
    )
    tot = pt.groupBy("lang").agg(F.sum("ctf").cast("long").alias("c"))
    a, b = tot.alias("a"), tot.alias("b")
    pairs = a.join(b, F.col("a.lang") < F.col("b.lang")).select(
        F.col("a.lang").alias("lang_a"),
        F.col("b.lang").alias("lang_b"),
        F.col("a.c").alias("ca"),
        F.col("b.c").alias("cb"),
    )
    ta = pt.join(
        F.broadcast(pairs.select("lang_a", "lang_b")),
        pt["lang"] == F.col("lang_a"),
    ).select("lang_a", "lang_b", "term", F.col("ctf").alias("ctf_a"))
    tb = pt.join(
        F.broadcast(pairs.select("lang_a", "lang_b")),
        pt["lang"] == F.col("lang_b"),
    ).select("lang_a", "lang_b", "term", F.col("ctf").alias("ctf_b"))
    full = (
        ta.join(tb, ["lang_a", "lang_b", "term"], "full_outer")
        .select(
            "lang_a",
            "lang_b",
            F.coalesce("ctf_a", F.lit(0)).alias("ctf_a"),
            F.coalesce("ctf_b", F.lit(0)).alias("ctf_b"),
        )
        .join(F.broadcast(pairs), ["lang_a", "lang_b"])
    )
    pa = F.col("ctf_a").cast("double") / F.col("ca")
    pb = F.col("ctf_b").cast("double") / F.col("cb")
    term_a = F.when(
        F.col("ctf_a") > 0,
        F.lit(0.5) * pa * F.log2(F.lit(2.0) * pa / (pa + pb)),
    ).otherwise(F.lit(0.0))
    term_b = F.when(
        F.col("ctf_b") > 0,
        F.lit(0.5) * pb * F.log2(F.lit(2.0) * pb / (pa + pb)),
    ).otherwise(F.lit(0.0))
    js9 = F.round((term_a + term_b) * F.lit(1000000000.0), 0).cast("long")
    return (
        full.groupBy("lang_a", "lang_b")
        .agg(
            F.sum(
                ((F.col("ctf_a") > 0) & (F.col("ctf_b") > 0)).cast("int")
            ).cast("long").alias("shared_terms"),
            F.round(
                F.sum(js9).cast("long") / F.lit(1000000000.0), 6
            ).alias("js_div"),
        )
        .orderBy("lang_a", "lang_b")
    )


SQL_LANG_DIVERGENCE = f"""
WITH toks AS (
  SELECT lang, unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term
  FROM documents
),
pt AS (SELECT lang, term, CAST(count(*) AS BIGINT) AS ctf
       FROM toks GROUP BY lang, term),
tot AS (SELECT lang, CAST(sum(ctf) AS BIGINT) AS c FROM pt GROUP BY lang),
pairs AS (
  SELECT a.lang AS lang_a, b.lang AS lang_b, a.c AS ca, b.c AS cb
  FROM tot a JOIN tot b ON a.lang < b.lang
),
ta AS (SELECT p.lang_a, p.lang_b, t.term, t.ctf AS ctf_a
       FROM pt t JOIN pairs p ON t.lang = p.lang_a),
tb AS (SELECT p.lang_a, p.lang_b, t.term, t.ctf AS ctf_b
       FROM pt t JOIN pairs p ON t.lang = p.lang_b),
full_t AS (
  SELECT COALESCE(ta.lang_a, tb.lang_a) AS lang_a,
         COALESCE(ta.lang_b, tb.lang_b) AS lang_b,
         COALESCE(ta.ctf_a, 0) AS ctf_a, COALESCE(tb.ctf_b, 0) AS ctf_b
  FROM ta FULL OUTER JOIN tb
    ON ta.lang_a = tb.lang_a AND ta.lang_b = tb.lang_b AND ta.term = tb.term
),
contrib AS (
  SELECT f.lang_a, f.lang_b,
         CAST(ctf_a > 0 AND ctf_b > 0 AS INT) AS shared,
         CAST(round((
           CASE WHEN ctf_a > 0 THEN
             0.5 * (CAST(ctf_a AS DOUBLE) / p.ca)
                 * log2(2.0 * (CAST(ctf_a AS DOUBLE) / p.ca)
                        / (CAST(ctf_a AS DOUBLE) / p.ca
                           + CAST(ctf_b AS DOUBLE) / p.cb))
           ELSE 0.0 END
           + CASE WHEN ctf_b > 0 THEN
             0.5 * (CAST(ctf_b AS DOUBLE) / p.cb)
                 * log2(2.0 * (CAST(ctf_b AS DOUBLE) / p.cb)
                        / (CAST(ctf_a AS DOUBLE) / p.ca
                           + CAST(ctf_b AS DOUBLE) / p.cb))
           ELSE 0.0 END) * 1000000000.0) AS BIGINT) AS js9
  FROM full_t f JOIN pairs p USING (lang_a, lang_b)
)
SELECT lang_a, lang_b, CAST(sum(shared) AS BIGINT) AS shared_terms,
       round(CAST(sum(js9) AS BIGINT) / 1000000000.0, 6) AS js_div
FROM contrib GROUP BY lang_a, lang_b
"""


# --------------------------------------------------------------------------
# Event path trigrams (the order-3 companion to event_transitions'
# one-step matrix — the clickstream path-mining staple): consecutive
# (a -> b -> c) triples per user stream, top 20 by count with full-path
# tie-break. Same tz-invariant (epoch-us, event_id) ordering as every
# temporal pair (invariant 3); pure counts.
# --------------------------------------------------------------------------
PATH_TRIGRAM_TOP = 20


def q_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("_us", "event_id")
    tri = (
        events.select(
            "user_id",
            "event_id",
            "event_type",
            ntz_epoch_us(F.col("ts")).alias("_us"),
        )
        .select(
            F.lag("event_type", 2).over(w).alias("t1"),
            F.lag("event_type", 1).over(w).alias("t2"),
            F.col("event_type").alias("t3"),
        )
        .filter(F.col("t1").isNotNull())
    )
    return (
        tri.groupBy("t1", "t2", "t3")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), "t1", "t2", "t3")
        .limit(PATH_TRIGRAM_TOP)
    )


SQL_PATH_TRIGRAMS = f"""
WITH ordered AS (
  SELECT lag(event_type, 2) OVER (PARTITION BY user_id
                                  ORDER BY epoch_us(ts), event_id) AS t1,
         lag(event_type, 1) OVER (PARTITION BY user_id
                                  ORDER BY epoch_us(ts), event_id) AS t2,
         event_type AS t3
  FROM events
)
SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n
FROM ordered WHERE t1 IS NOT NULL
GROUP BY t1, t2, t3
ORDER BY n DESC, t1, t2, t3
LIMIT {PATH_TRIGRAM_TOP}
"""


# --------------------------------------------------------------------------
# Markov entropy rate of the event chain (Shannon 1948's H(X) for a
# stationary Markov source — the compressibility floor of the event
# stream, the info-theoretic companion to behavior_entropy's iid
# per-user entropy): H = -sum_a pi_a sum_b P_ab log2 P_ab with pi from
# the SAME 20-iteration power method as markov_stationary (shared
# helper; the oracle replays the identical recursion), next to the
# stationary entropy H(pi) (iid upper bound) and their gap = the
# sequential-predictability payoff. <=k^2 double terms, round-6.
# --------------------------------------------------------------------------
def q_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    p, v = _markov_chain(spark, sf_dir)
    joint = v.join(p, v["t"] == p["prev_type"]).select(
        (
            F.col("v")
            * F.col("p")
            * F.log2(F.col("p"))
        ).alias("term"),
        (F.col("v") * F.log2(F.col("v"))).alias("_pi_term"),
        "t",
    )
    hrate = joint.agg(
        F.round(-F.sum("term"), 6).alias("entropy_rate_bits")
    )
    hpi = (
        v.select((F.col("v") * F.log2(F.col("v"))).alias("pt"))
        .agg(F.round(-F.sum("pt"), 6).alias("stationary_entropy_bits"))
    )
    return hrate.crossJoin(F.broadcast(hpi)).select(
        "entropy_rate_bits",
        "stationary_entropy_bits",
        F.round(
            F.col("stationary_entropy_bits") - F.col("entropy_rate_bits"), 6
        ).alias("predictability_gain_bits"),
    )


SQL_ENTROPY_RATE = f"""
WITH RECURSIVE {_MARKOV_CTES},
pi AS (SELECT t, v FROM vt WHERE iter = {MARKOV_ITERS}),
hrate AS (
  SELECT round(-sum(pi.v * p.p * log2(p.p)), 6) AS entropy_rate_bits
  FROM pi JOIN p ON p.prev_type = pi.t
),
hpi AS (
  SELECT round(-sum(v * log2(v)), 6) AS stationary_entropy_bits FROM pi
)
SELECT entropy_rate_bits, stationary_entropy_bits,
       round(stationary_entropy_bits - entropy_rate_bits, 6)
         AS predictability_gain_bits
FROM hrate, hpi
"""


# --------------------------------------------------------------------------
# Character entropy per source (Shannon bits/char — the storage-planning
# compressibility floor and a data-quality fingerprint; the CHARACTER-
# level companion to lexical_diversity/lm_quality's token-level views):
# per source, H = -sum p_c log2 p_c over lowercase character counts.
# Counts are exact BIGINTs; the per-character p log p terms are <=
# alphabet-size doubles summed once, displayed round-6.
# --------------------------------------------------------------------------
def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    chars = docs.select(
        "source",
        F.explode(F.split(F.lower("text"), "")).alias("ch"),
    ).filter(F.col("ch") != "")
    counts = chars.groupBy("source", "ch").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    totals = counts.groupBy("source").agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("alphabet"),
    )
    p = F.col("c").cast("double") / F.col("n").cast("double")
    ent = (
        counts.join(F.broadcast(totals), "source")
        .select("source", "n", "alphabet", (p * F.log2(p)).alias("t"))
        .groupBy("source", "n", "alphabet")
        .agg(F.round(-F.sum("t"), 6).alias("entropy_bits_per_char"))
    )
    return ent.select(
        "source", F.col("n").alias("n_chars"), "alphabet",
        "entropy_bits_per_char",
    ).orderBy("source")


SQL_CHAR_ENTROPY = """
WITH chars AS (
  SELECT source, unnest(string_split(lower(text), '')) AS ch FROM documents
),
counts AS (
  SELECT source, ch, CAST(count(*) AS BIGINT) AS c
  FROM chars WHERE ch <> '' GROUP BY source, ch
),
totals AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS alphabet
  FROM counts GROUP BY source
)
SELECT counts.source, totals.n AS n_chars, totals.alphabet,
       round(-sum((CAST(c AS DOUBLE) / CAST(totals.n AS DOUBLE))
                  * log2(CAST(c AS DOUBLE) / CAST(totals.n AS DOUBLE))), 6)
         AS entropy_bits_per_char
FROM counts JOIN totals USING (source)
GROUP BY counts.source, totals.n, totals.alphabet
ORDER BY source
"""


# --------------------------------------------------------------------------
# Mutual information between event type and hour-of-day (Shannon 1948;
# the feature-relevance complement to the chi-square pair — chi2 tests
# departure from independence, MI measures it in nats): MI = sum_ij
# p_ij ln(p_ij N / (n_i n_j)) over the (type x 24h) contingency table.
# All counts are exact BIGINTs; the per-cell doubles are bounded at
# |types| x 24 cells (the chi2 precedent) and display round-6. Also
# reports both marginal entropies and the sqrt-normalized NMI.
# --------------------------------------------------------------------------
def q_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    cells = (
        events.select(
            "event_type",
            (
                F.floor(
                    ntz_epoch_us(F.col("ts")) / F.lit(US_PER_HOUR_DIV)
                )
                % 24
            )
            .cast("long")
            .alias("hod"),
        )
        .groupBy("event_type", "hod")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    row_m = cells.groupBy("event_type").agg(
        F.sum("c").cast("long").alias("rm")
    )
    col_m = cells.groupBy("hod").agg(F.sum("c").cast("long").alias("cm"))
    tot = cells.agg(F.sum("c").cast("long").alias("nn"))
    cd = F.col("c").cast("double")
    nd = F.col("nn").cast("double")
    mi = (
        cells.join(F.broadcast(row_m), "event_type")
        .join(F.broadcast(col_m), "hod")
        .crossJoin(F.broadcast(tot))
        .select(
            (
                (cd / nd)
                * F.log(
                    cd
                    * nd
                    / (
                        F.col("rm").cast("double")
                        * F.col("cm").cast("double")
                    )
                )
            ).alias("term")
        )
        .agg(F.sum("term").alias("mi"))
    )
    h_type = (
        row_m.crossJoin(F.broadcast(tot))
        .select(
            (
                -(F.col("rm").cast("double") / nd)
                * F.log(F.col("rm").cast("double") / nd)
            ).alias("term")
        )
        .agg(F.sum("term").alias("h_type"))
    )
    h_hour = (
        col_m.crossJoin(F.broadcast(tot))
        .select(
            (
                -(F.col("cm").cast("double") / nd)
                * F.log(F.col("cm").cast("double") / nd)
            ).alias("term")
        )
        .agg(F.sum("term").alias("h_hour"))
    )
    return (
        mi.crossJoin(F.broadcast(h_type))
        .crossJoin(F.broadcast(h_hour))
        .select(
            F.round("mi", 6).alias("mi_nats"),
            F.round("h_type", 6).alias("h_type"),
            F.round("h_hour", 6).alias("h_hour"),
            F.round(
                F.col("mi") / F.sqrt(F.col("h_type") * F.col("h_hour")), 6
            ).alias("nmi"),
        )
    )


SQL_MUTUAL_INFORMATION = f"""
WITH cells AS (
  SELECT event_type, (epoch_us(ts) // {US_PER_HOUR_DIV}) % 24 AS hod,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
row_m AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS rm
          FROM cells GROUP BY event_type),
col_m AS (SELECT hod, CAST(sum(c) AS BIGINT) AS cm FROM cells GROUP BY hod),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS nn FROM cells),
mi AS (
  SELECT sum((CAST(c AS DOUBLE) / CAST(nn AS DOUBLE))
             * ln(CAST(c AS DOUBLE) * CAST(nn AS DOUBLE)
                  / (CAST(rm AS DOUBLE) * CAST(cm AS DOUBLE)))) AS mi
  FROM cells
  JOIN row_m USING (event_type)
  JOIN col_m USING (hod), tot
),
ht AS (
  SELECT sum(-(CAST(rm AS DOUBLE) / CAST(nn AS DOUBLE))
             * ln(CAST(rm AS DOUBLE) / CAST(nn AS DOUBLE))) AS h_type
  FROM row_m, tot
),
hh AS (
  SELECT sum(-(CAST(cm AS DOUBLE) / CAST(nn AS DOUBLE))
             * ln(CAST(cm AS DOUBLE) / CAST(nn AS DOUBLE))) AS h_hour
  FROM col_m, tot
)
SELECT round(mi.mi, 6) AS mi_nats,
       round(ht.h_type, 6) AS h_type,
       round(hh.h_hour, 6) AS h_hour,
       round(mi.mi / sqrt(ht.h_type * hh.h_hour), 6) AS nmi
FROM mi, ht, hh
"""


# --------------------------------------------------------------------------
# Unigram LM cross-entropy / perplexity on a held-out split (the
# standard LM curation metric; Chen & Goodman 1996's baseline): train
# add-one-smoothed unigram counts on doc_id % 10 != 0, evaluate on the
# % 10 == 0 held-out docs. p(t) = (c_t + 1)/(N + V + 1) with unseen
# test terms sharing one OOV type. The log-sum groups test tokens BY
# TERM first (vocab-bounded doubles: sum m_t * ln(c_t + 1)), and
# H = (M*ln(N+V+1) - sum) / M. Counts are exact BIGINTs throughout.
# --------------------------------------------------------------------------
def q_unigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents").select(
        "doc_id",
        F.explode(
            F.expr(f"regexp_extract_all(lower(text), '{TOKEN_RUN}', 0)")
        ).alias("term"),
    )
    train = docs.filter(F.col("doc_id") % 10 != 0)
    test = docs.filter(F.col("doc_id") % 10 == 0)
    train_counts = train.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    train_tot = train_counts.agg(
        F.sum("c").cast("long").alias("n_train"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )
    test_counts = test.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("m")
    )
    joined = test_counts.join(train_counts, "term", "left").select(
        "m", F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("c")
    )
    agg = joined.agg(
        F.sum("m").cast("long").alias("m_test"),
        F.sum(F.when(F.col("c") == 0, F.col("m")).otherwise(0))
        .cast("long")
        .alias("oov_tokens"),
        F.sum(
            F.col("m").cast("double")
            * F.log(F.col("c").cast("double") + F.lit(1.0))
        ).alias("log_sum"),
    )
    j = agg.crossJoin(F.broadcast(train_tot))
    md = F.col("m_test").cast("double")
    denom = (
        F.col("n_train").cast("double")
        + F.col("v").cast("double")
        + F.lit(1.0)
    )
    h = (md * F.log(denom) - F.col("log_sum")) / md
    return j.select(
        "n_train",
        "v",
        "m_test",
        "oov_tokens",
        F.round(h, 6).alias("cross_entropy"),
        F.round(F.exp(h), 6).alias("perplexity"),
    )


SQL_UNIGRAM_PERPLEXITY = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term
  FROM documents
),
train_counts AS (
  SELECT term, CAST(count(*) AS BIGINT) AS c
  FROM toks WHERE doc_id % 10 <> 0 GROUP BY term
),
train_tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS n_train,
         CAST(count(*) AS BIGINT) AS v
  FROM train_counts
),
test_counts AS (
  SELECT term, CAST(count(*) AS BIGINT) AS m
  FROM toks WHERE doc_id % 10 = 0 GROUP BY term
),
joined AS (
  SELECT t.m, CAST(coalesce(tc.c, 0) AS BIGINT) AS c
  FROM test_counts t LEFT JOIN train_counts tc USING (term)
),
agg AS (
  SELECT CAST(sum(m) AS BIGINT) AS m_test,
         CAST(sum(CASE WHEN c = 0 THEN m ELSE 0 END) AS BIGINT)
           AS oov_tokens,
         sum(CAST(m AS DOUBLE) * ln(CAST(c AS DOUBLE) + 1.0)) AS log_sum
  FROM joined
)
SELECT n_train, v, m_test, oov_tokens,
       round((CAST(m_test AS DOUBLE)
              * ln(CAST(n_train AS DOUBLE) + CAST(v AS DOUBLE) + 1.0)
              - log_sum) / CAST(m_test AS DOUBLE), 6) AS cross_entropy,
       round(exp((CAST(m_test AS DOUBLE)
                  * ln(CAST(n_train AS DOUBLE) + CAST(v AS DOUBLE) + 1.0)
                  - log_sum) / CAST(m_test AS DOUBLE)), 6) AS perplexity
FROM agg, train_tot
"""


# --------------------------------------------------------------------------
# Good-Turing frequency-of-frequencies audit (Good 1953) over TRIGRAM
# types on the same train split as the perplexity pair (the unigram
# vocabulary saturates — no singletons — so the estimate is taken where
# it is meaningful, on the sparser trigram space): N1/N estimates the
# unseen-type mass, c* = 2*N2/N1 the discounted singleton count. All
# frequency-of-frequency counts are exact BIGINTs from a two-level
# aggregate (gram counts, then counts-of-counts — both uniform keys).
# --------------------------------------------------------------------------
def q_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 10 != 0
    ).select(
        F.expr(
            f"regexp_extract_all(lower(text), '{TOKEN_RUN}', 0)"
        ).alias("w")
    )
    grams = docs.select(
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(size(w) - 2, 0)),"
                " i -> concat(element_at(w, i), ' ',"
                " element_at(w, i + 1), ' ', element_at(w, i + 2)))"
            )
        ).alias("term")
    )
    train_counts = grams.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    fof = train_counts.groupBy("c").agg(
        F.count(F.lit(1)).cast("long").alias("nf")
    )
    agg = train_counts.agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )
    n_r = [
        fof.filter(F.col("c") == r).agg(
            F.coalesce(F.sum("nf"), F.lit(0)).cast("long").alias(f"n{r}")
        )
        for r in (1, 2)
    ]
    j = agg.crossJoin(F.broadcast(n_r[0])).crossJoin(F.broadcast(n_r[1]))
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    return j.select(
        "n_tokens",
        "v",
        "n1",
        "n2",
        F.round(n1d / F.col("n_tokens").cast("double"), 6).alias(
            "unseen_mass"
        ),
        F.round(F.lit(2.0) * n2d / n1d, 6).alias("singleton_cstar"),
    )


SQL_GOOD_TURING = f"""
WITH toks AS (
  SELECT regexp_extract_all(lower(text), '{TOKEN_RUN}') AS w
  FROM documents WHERE doc_id % 10 <> 0
),
grams AS (
  SELECT w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS term
  FROM toks, unnest(range(1, greatest(len(w) - 1, 1))) AS t(i)
),
train_counts AS (
  SELECT term, CAST(count(*) AS BIGINT) AS c
  FROM grams GROUP BY term
),
agg AS (
  SELECT CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS v
  FROM train_counts
),
fof AS (
  SELECT c, CAST(count(*) AS BIGINT) AS nf FROM train_counts GROUP BY c
),
n1t AS (SELECT CAST(coalesce(sum(nf), 0) AS BIGINT) AS n1
        FROM fof WHERE c = 1),
n2t AS (SELECT CAST(coalesce(sum(nf), 0) AS BIGINT) AS n2
        FROM fof WHERE c = 2)
SELECT n_tokens, v, n1, n2,
       round(CAST(n1 AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
         AS unseen_mass,
       round(2.0 * CAST(n2 AS DOUBLE) / CAST(n1 AS DOUBLE), 6)
         AS singleton_cstar
FROM agg, n1t, n2t
"""


# --------------------------------------------------------------------------
# Naive-Bayes language classifier audit (the LEARNED counterpart to the
# marker-list heuristic the cohen_kappa pair audits): add-one-smoothed
# per-language unigram likelihoods trained on doc_id % 10 != 0, argmax
# posterior on the held-out docs, accuracy + per-language recall. The
# per-(doc, lang) log score is a sum of vocab-bounded doubles ROUNDED to
# the 6-decimal grid BEFORE the argmax (lang-asc tiebreak), so a
# last-ulp divergence can never flip a prediction (invariant 4).
# --------------------------------------------------------------------------
def q_naive_bayes_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _read(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(f"regexp_extract_all(lower(text), '{TOKEN_RUN}', 0)")
        ).alias("term"),
    )
    train = toks.filter(F.col("doc_id") % 10 != 0)
    test = toks.filter(F.col("doc_id") % 10 == 0)
    counts = train.groupBy("lang", "term").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    ).localCheckpoint(eager=True)
    lang_tot = counts.groupBy("lang").agg(
        F.sum("c").cast("long").alias("nl")
    )
    vocab = counts.select("term").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("v")
    )
    doc_terms = test.groupBy("doc_id", "lang", "term").agg(
        F.count(F.lit(1)).cast("long").alias("m")
    )
    langs = lang_tot.select(
        F.col("lang").alias("cand"), "nl"
    ).crossJoin(F.broadcast(vocab))
    scored = (
        doc_terms.crossJoin(F.broadcast(langs))
        .join(
            counts.select(
                F.col("lang").alias("cand"),
                "term",
                F.col("c").alias("ct"),
            ),
            ["cand", "term"],
            "left",
        )
        .select(
            "doc_id",
            "lang",
            "cand",
            (
                F.col("m").cast("double")
                * F.log(
                    (
                        F.coalesce(F.col("ct"), F.lit(0)).cast("double")
                        + F.lit(1.0)
                    )
                    / (
                        F.col("nl").cast("double")
                        + F.col("v").cast("double")
                    )
                )
            ).alias("term_ll"),
        )
        .groupBy("doc_id", "lang", "cand")
        .agg(F.round(F.sum("term_ll"), 6).alias("score"))
    )
    pick = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("cand").asc()
    )
    preds = scored.withColumn("rn", F.row_number().over(pick)).filter(
        F.col("rn") == 1
    )
    per_lang = preds.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("cand") == F.col("lang"), 1).otherwise(0))
        .cast("long")
        .alias("n_correct"),
    )
    return per_lang.select(
        "lang",
        "n_docs",
        "n_correct",
        F.round(
            F.col("n_correct").cast("double")
            / F.col("n_docs").cast("double"),
            6,
        ).alias("recall"),
    ).orderBy("lang")


SQL_NAIVE_BAYES_LANG = f"""
WITH toks AS (
  SELECT doc_id, lang,
         unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term
  FROM documents
),
counts AS (
  SELECT lang, term, CAST(count(*) AS BIGINT) AS c
  FROM toks WHERE doc_id % 10 <> 0 GROUP BY lang, term
),
lang_tot AS (
  SELECT lang AS cand, CAST(sum(c) AS BIGINT) AS nl
  FROM counts GROUP BY lang
),
vocab AS (
  SELECT CAST(count(DISTINCT term) AS BIGINT) AS v FROM counts
),
doc_terms AS (
  SELECT doc_id, lang, term, CAST(count(*) AS BIGINT) AS m
  FROM toks WHERE doc_id % 10 = 0 GROUP BY doc_id, lang, term
),
scored AS (
  SELECT d.doc_id, d.lang, lt.cand,
         round(sum(CAST(d.m AS DOUBLE)
                   * ln((CAST(coalesce(c2.c, 0) AS DOUBLE) + 1.0)
                        / (CAST(lt.nl AS DOUBLE) + CAST(v.v AS DOUBLE)))),
               6) AS score
  FROM doc_terms d
  CROSS JOIN lang_tot lt
  CROSS JOIN vocab v
  LEFT JOIN counts c2 ON c2.lang = lt.cand AND c2.term = d.term
  GROUP BY d.doc_id, d.lang, lt.cand
),
preds AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id
               ORDER BY score DESC, cand ASC) AS rn
    FROM scored)
  WHERE rn = 1
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN cand = lang THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       round(CAST(sum(CASE WHEN cand = lang THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS recall
FROM preds
GROUP BY lang
ORDER BY lang
"""


# --------------------------------------------------------------------------
# Fightin' Words (Monroe, Colaresi & Quinn 2008): z-scored log-odds
# ratio with an informative Dirichlet prior, comparing term usage in
# English vs non-English docs — the corpus-comparison method that fixes
# keyness_llr's variance blindness at rare counts. Prior = the pooled
# corpus counts scaled to alpha0 = 500. Every count is BIGINT; delta and
# the variance are fixed expressions of exact integers (ln on integer
# ratios — the idf-proven surface); top-20 by |z| with term tiebreak on
# the ROUNDED grid.
# --------------------------------------------------------------------------
def q_fightin_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _read(spark, sf_dir, "documents").select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("grp"),
        F.explode(
            F.expr(f"regexp_extract_all(lower(text), '{TOKEN_RUN}', 0)")
        ).alias("term"),
    )
    counts = toks.groupBy("term").agg(
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
        .cast("long")
        .alias("y1"),
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0))
        .cast("long")
        .alias("y2"),
    ).localCheckpoint(eager=True)
    tot = counts.agg(
        F.sum("y1").cast("long").alias("n1"),
        F.sum("y2").cast("long").alias("n2"),
    )
    j = counts.crossJoin(F.broadcast(tot))
    y1, y2 = F.col("y1").cast("double"), F.col("y2").cast("double")
    n1, n2 = F.col("n1").cast("double"), F.col("n2").cast("double")
    a0 = F.lit(500.0)
    # prior mass for term w: a0 * (y1+y2)/(n1+n2)
    aw = a0 * (y1 + y2) / (n1 + n2)
    t1 = y1 + aw
    t2 = y2 + aw
    delta = F.log(t1 / (n1 + a0 - t1)) - F.log(t2 / (n2 + a0 - t2))
    var = F.lit(1.0) / t1 + F.lit(1.0) / t2
    z = F.round(delta / F.sqrt(var), 6)
    scored = j.select(
        "term", "y1", "y2", F.round(delta, 6).alias("delta"), z.alias("z")
    )
    pick = Window.orderBy(F.abs(F.col("z")).desc(), F.col("term").asc())
    return (
        scored.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") <= 20)
        .select("term", "y1", "y2", "delta", "z")
        .orderBy("term")
    )


SQL_FIGHTIN_WORDS = f"""
WITH toks AS (
  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS grp,
         unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term
  FROM documents
),
counts AS (
  SELECT term,
         CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS y1,
         CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS y2
  FROM toks GROUP BY term
),
tot AS (
  SELECT CAST(sum(y1) AS BIGINT) AS n1, CAST(sum(y2) AS BIGINT) AS n2
  FROM counts
),
scored AS (
  SELECT term, y1, y2,
         round(ln((CAST(y1 AS DOUBLE)
                   + 500.0 * (CAST(y1 AS DOUBLE) + CAST(y2 AS DOUBLE))
                     / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)))
                  / (CAST(n1 AS DOUBLE) + 500.0
                     - (CAST(y1 AS DOUBLE)
                        + 500.0 * (CAST(y1 AS DOUBLE) + CAST(y2 AS DOUBLE))
                          / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)))))
               - ln((CAST(y2 AS DOUBLE)
                     + 500.0 * (CAST(y1 AS DOUBLE) + CAST(y2 AS DOUBLE))
                       / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)))
                    / (CAST(n2 AS DOUBLE) + 500.0
                       - (CAST(y2 AS DOUBLE)
                          + 500.0
                            * (CAST(y1 AS DOUBLE) + CAST(y2 AS DOUBLE))
                            / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))))),
               6) AS delta,
         round((ln((CAST(y1 AS DOUBLE)
                    + 500.0 * (CAST(y1 AS DOUBLE) + CAST(y2 AS DOUBLE))
                      / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)))
                   / (CAST(n1 AS DOUBLE) + 500.0
                      - (CAST(y1 AS DOUBLE)
                         + 500.0
                           * (CAST(y1 AS DOUBLE) + CAST(y2 AS DOUBLE))
                           / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)))))
                - ln((CAST(y2 AS DOUBLE)
                      + 500.0 * (CAST(y1 AS DOUBLE) + CAST(y2 AS DOUBLE))
                        / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)))
                     / (CAST(n2 AS DOUBLE) + 500.0
                        - (CAST(y2 AS DOUBLE)
                           + 500.0
                             * (CAST(y1 AS DOUBLE) + CAST(y2 AS DOUBLE))
                             / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))))))
               / sqrt(1.0 / (CAST(y1 AS DOUBLE)
                             + 500.0
                               * (CAST(y1 AS DOUBLE) + CAST(y2 AS DOUBLE))
                               / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)))
                      + 1.0 / (CAST(y2 AS DOUBLE)
                               + 500.0
                                 * (CAST(y1 AS DOUBLE) + CAST(y2 AS DOUBLE))
                                 / (CAST(n1 AS DOUBLE)
                                    + CAST(n2 AS DOUBLE)))), 6) AS z
  FROM counts, tot
),
top AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (ORDER BY abs(z) DESC, term ASC) AS rn
    FROM scored)
  WHERE rn <= 20
)
SELECT term, y1, y2, delta, z FROM top
ORDER BY term
"""


# --------------------------------------------------------------------------
# Column encoding audit (the optimizer-statistics pass behind layout
# decisions — the column-store companion to the postings codec pairs):
# for three orders columns in o_orderkey storage order, count maximal
# equal-value RUNS (1 + changes via lag), distinct values, and the
# RLE compression ratio rows/runs. Pure integer window work per column;
# low-cardinality sorted-adjacent columns compress, keys do not.
# --------------------------------------------------------------------------
def q_encoding_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _read(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
        F.floor(
            ntz_epoch_us(F.col("o_orderdate")) / F.lit(US_PER_DAY_DIV)
        )
        .cast("long")
        .cast("string")
        .alias("day"),
    ).localCheckpoint(eager=True)
    w = Window.orderBy("o_orderkey")
    outs = []
    for col in ("status", "priority", "day"):
        runs = orders.select(
            F.when(
                F.lag(col).over(w).isNull()
                | (F.col(col) != F.lag(col).over(w)),
                1,
            )
            .otherwise(0)
            .alias("new_run"),
            F.col(col).alias("v"),
        )
        outs.append(
            runs.agg(
                F.lit(col).alias("column_name"),
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum("new_run").cast("long").alias("n_runs"),
            ).crossJoin(
                F.broadcast(
                    orders.select(col)
                    .distinct()
                    .agg(F.count(F.lit(1)).cast("long").alias("n_distinct"))
                )
            )
        )
    res = outs[0].unionAll(outs[1]).unionAll(outs[2])
    return res.select(
        "column_name",
        "n_rows",
        "n_distinct",
        "n_runs",
        F.round(
            F.col("n_rows").cast("double") / F.col("n_runs").cast("double"),
            6,
        ).alias("rle_ratio"),
    ).orderBy("column_name")


SQL_ENCODING_AUDIT = f"""
WITH src AS (
  SELECT o_orderkey, o_orderstatus AS status, o_orderpriority AS priority,
         CAST(epoch_us(o_orderdate) // {US_PER_DAY_DIV} AS VARCHAR) AS day
  FROM orders
),
runs AS (
  SELECT 'status' AS column_name,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(CASE WHEN prev IS NULL OR v <> prev THEN 1 ELSE 0 END)
              AS BIGINT) AS n_runs
  FROM (SELECT status AS v,
               lag(status) OVER (ORDER BY o_orderkey) AS prev FROM src)
  UNION ALL
  SELECT 'priority',
         CAST(count(*) AS BIGINT),
         CAST(sum(CASE WHEN prev IS NULL OR v <> prev THEN 1 ELSE 0 END)
              AS BIGINT)
  FROM (SELECT priority AS v,
               lag(priority) OVER (ORDER BY o_orderkey) AS prev FROM src)
  UNION ALL
  SELECT 'day',
         CAST(count(*) AS BIGINT),
         CAST(sum(CASE WHEN prev IS NULL OR v <> prev THEN 1 ELSE 0 END)
              AS BIGINT)
  FROM (SELECT day AS v,
               lag(day) OVER (ORDER BY o_orderkey) AS prev FROM src)
),
dis AS (
  SELECT 'status' AS column_name,
         CAST(count(DISTINCT status) AS BIGINT) AS n_distinct FROM src
  UNION ALL
  SELECT 'priority', CAST(count(DISTINCT priority) AS BIGINT) FROM src
  UNION ALL
  SELECT 'day', CAST(count(DISTINCT day) AS BIGINT) FROM src
)
SELECT r.column_name, r.n_rows, d.n_distinct, r.n_runs,
       round(CAST(r.n_rows AS DOUBLE) / CAST(r.n_runs AS DOUBLE), 6)
         AS rle_ratio
FROM runs r JOIN dis d USING (column_name)
ORDER BY column_name
"""


# --------------------------------------------------------------------------
# Yule's characteristic K per language (Yule 1944, "The Statistical Study
# of Literary Vocabulary"): K = 10^4 * (sum_m m^2*V_m - N) / N^2, where
# V_m is the count of types occurring exactly m times — so sum_m m^2*V_m
# is simply sum(c^2) over the per-(lang, term) frequency spectrum. The
# shape is the term_stats skew discipline: (lang, term) partial counts
# first (map-side combine absorbs the Zipf head), then a bounded per-lang
# rollup of exact BIGINT moments; the only division is the final K,
# rounded 6. Completes the richness family next to ttr/entropy
# (lexical_diversity), Heaps' law, Chao1 and Simpson.
# --------------------------------------------------------------------------
def q_yule_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(WORD_RUN), F.lit(0))
        ).alias("term"),
    )
    tf = toks.groupBy("lang", "term").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    per = tf.groupBy("lang").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
    )
    nd = F.col("n_tokens").cast("double")
    return per.select(
        "lang",
        "n_tokens",
        "n_types",
        F.round(
            F.lit(10000.0)
            * (F.col("s2") - F.col("n_tokens")).cast("double")
            / (nd * nd),
            6,
        ).alias("yule_k"),
    ).orderBy("lang")


SQL_YULE_K = f"""
WITH tf AS (
  SELECT lang, term, CAST(count(*) AS BIGINT) AS c
  FROM (
    SELECT lang,
           unnest(regexp_extract_all(lower(text), '{WORD_RUN}')) AS term
    FROM documents
  ) GROUP BY lang, term
),
per AS (
  SELECT lang, CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_types,
         CAST(sum(c * c) AS BIGINT) AS s2
  FROM tf GROUP BY lang
)
SELECT lang, n_tokens, n_types,
       round(10000.0 * CAST(s2 - n_tokens AS DOUBLE)
             / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)),
             6) AS yule_k
FROM per
ORDER BY lang
"""


# --------------------------------------------------------------------------
# Brown's double exponential smoothing on daily revenue (Brown 1959 —
# the linear-trend forecaster a demand planner runs next to the
# seasonal-naive MASE backtest): S' = EWMA_a(x), S'' = EWMA_a(S'),
# level = 2S'-S'', trend = a/(1-a)*(S'-S''), 7-day-ahead forecast =
# level + 7*trend, evaluated at the LAST observed day. Both smoothers
# collapse to truncated weighted sums over the trailing 60 days with
# closed-form weights (S'': a^2*(k+1)*(1-a)^k, the self-convolution of
# the EWMA kernel) precomputed ONCE in Python, scaled to 1e7 integers
# and inlined as identical literals (the ewma_control/croston
# discipline), so all four numerator/denominator sums are exact BIGINTs
# over exact cents; ratios and the recursion-free combination are the
# only doubles, spelled identically on both sides.
# --------------------------------------------------------------------------
BROWN_ALPHA = 0.2
BROWN_K = 60
BROWN_H = 7
_BROWN_W1_7 = [
    int(round(BROWN_ALPHA * (1.0 - BROWN_ALPHA) ** k * 1e7))
    for k in range(BROWN_K)
]
_BROWN_W2_7 = [
    int(
        round(
            BROWN_ALPHA * BROWN_ALPHA * (k + 1) * (1.0 - BROWN_ALPHA) ** k * 1e7
        )
    )
    for k in range(BROWN_K)
]


def q_brown_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    bounds = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.max("day").cast("long").alias("tmax"),
    )
    w1 = F.array(*[F.lit(w) for w in _BROWN_W1_7])
    w2 = F.array(*[F.lit(w) for w in _BROWN_W2_7])
    k = (F.col("tmax") - F.col("day")).cast("int")
    tail = (
        daily.crossJoin(F.broadcast(bounds))
        .filter(F.col("day") > F.col("tmax") - BROWN_K)
        .select(
            "n_days",
            (F.element_at(w1, k + 1).cast("long") * F.col("rev")).alias("t1"),
            F.element_at(w1, k + 1).cast("long").alias("d1"),
            (F.element_at(w2, k + 1).cast("long") * F.col("rev")).alias("t2"),
            F.element_at(w2, k + 1).cast("long").alias("d2"),
        )
        .groupBy("n_days")
        .agg(
            F.sum("t1").cast("long").alias("s1n"),
            F.sum("d1").cast("long").alias("s1d"),
            F.sum("t2").cast("long").alias("s2n"),
            F.sum("d2").cast("long").alias("s2d"),
        )
    )
    s1 = (
        F.col("s1n").cast("double")
        / F.col("s1d").cast("double")
        / F.lit(100.0)
    )
    s2 = (
        F.col("s2n").cast("double")
        / F.col("s2d").cast("double")
        / F.lit(100.0)
    )
    trend = F.lit(0.25) * (s1 - s2)
    return tail.select(
        "n_days",
        F.round(s1, 6).alias("s_single"),
        F.round(s2, 6).alias("s_double"),
        F.round(F.lit(2.0) * s1 - s2, 6).alias("level"),
        F.round(trend, 6).alias("trend"),
        F.round(
            (F.lit(2.0) * s1 - s2) + F.lit(float(BROWN_H)) * trend, 6
        ).alias("forecast_7d"),
    )


def _brown_sql() -> str:
    w1 = ",\n    ".join(f"({k}, {w})" for k, w in enumerate(_BROWN_W1_7))
    w2 = ",\n    ".join(f"({k}, {w})" for k, w in enumerate(_BROWN_W2_7))
    s1 = "(CAST(s1n AS DOUBLE) / CAST(s1d AS DOUBLE) / 100.0)"
    s2 = "(CAST(s2n AS DOUBLE) / CAST(s2d AS DOUBLE) / 100.0)"
    trend = f"(0.25 * ({s1} - {s2}))"
    return f"""
WITH w1 AS (SELECT * FROM (VALUES {w1}) AS t(k, w)),
w2 AS (SELECT * FROM (VALUES {w2}) AS t(k, w)),
daily AS (
  SELECT epoch_us(o_orderdate) // {US_PER_DAY_DIV} AS day,
         CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
           AS rev
  FROM orders GROUP BY 1
),
bounds AS (
  SELECT CAST(count(*) AS BIGINT) AS n_days,
         CAST(max(day) AS BIGINT) AS tmax
  FROM daily
),
tail AS (
  SELECT n_days,
         CAST(sum(w1.w * rev) AS BIGINT) AS s1n,
         CAST(sum(w1.w) AS BIGINT) AS s1d,
         CAST(sum(w2.w * rev) AS BIGINT) AS s2n,
         CAST(sum(w2.w) AS BIGINT) AS s2d
  FROM daily CROSS JOIN bounds
  JOIN w1 ON w1.k = bounds.tmax - daily.day
  JOIN w2 ON w2.k = bounds.tmax - daily.day
  WHERE daily.day > bounds.tmax - {BROWN_K}
  GROUP BY n_days
)
SELECT n_days,
       round({s1}, 6) AS s_single,
       round({s2}, 6) AS s_double,
       round(2.0 * {s1} - {s2}, 6) AS level,
       round({trend}, 6) AS trend,
       round((2.0 * {s1} - {s2}) + 7.0 * {trend}, 6) AS forecast_7d
FROM tail
"""


SQL_BROWN_SMOOTHING = _brown_sql()


# --------------------------------------------------------------------------
# Witten-Bell smoothing audit per source (Witten & Bell 1991, method C —
# the escape-probability estimator PPM and many LM stacks use, distinct
# from good_turing's frequency-of-frequencies view): escape mass
# T/(N+T), coverage N/(N+T), and the smoothed probability c/(N+T) for
# three probe words (seen flag carried; the unseen share is reported as
# the escape mass, not split over an unknowable vocabulary). N and T
# come from the two-phase (source, term) spectrum — exact BIGINTs, each
# output one divide rounded 6.
# --------------------------------------------------------------------------
WB_PROBES = ("spark", "data", "nebula")


def q_witten_bell(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(WORD_RUN), F.lit(0))
        ).alias("term"),
    )
    tf = toks.groupBy("source", "term").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    per = tf.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
    )
    probes = spark.createDataFrame(
        [(p,) for p in WB_PROBES], "probe string"
    )
    pc = (
        per.crossJoin(F.broadcast(probes))
        .join(
            tf.withColumnRenamed("term", "probe"),
            ["source", "probe"],
            "left",
        )
        .select(
            "source",
            "probe",
            "n_tokens",
            "n_types",
            F.coalesce("c", F.lit(0)).cast("long").alias("c"),
        )
    )
    denom = (F.col("n_tokens") + F.col("n_types")).cast("double")
    return pc.select(
        "source",
        "probe",
        "n_tokens",
        "n_types",
        "c",
        (F.col("c") > 0).cast("boolean").alias("seen"),
        F.round(F.col("n_types").cast("double") / denom, 6).alias(
            "escape_mass"
        ),
        F.round(F.col("c").cast("double") / denom, 6).alias("p_wb"),
    ).orderBy("source", "probe")


def _witten_bell_sql() -> str:
    pl = ", ".join(f"('{p}')" for p in WB_PROBES)
    return f"""
WITH tf AS (
  SELECT source, term, CAST(count(*) AS BIGINT) AS c
  FROM (
    SELECT source,
           unnest(regexp_extract_all(lower(text), '{WORD_RUN}')) AS term
    FROM documents
  ) GROUP BY source, term
),
per AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_types
  FROM tf GROUP BY source
),
probes AS (SELECT * FROM (VALUES {pl}) AS t(probe)),
pc AS (
  SELECT per.source, probes.probe, per.n_tokens, per.n_types,
         CAST(COALESCE(tf.c, 0) AS BIGINT) AS c
  FROM per CROSS JOIN probes
  LEFT JOIN tf ON tf.source = per.source AND tf.term = probes.probe
)
SELECT source, probe, n_tokens, n_types, c,
       c > 0 AS seen,
       round(CAST(n_types AS DOUBLE)
             / CAST(n_tokens + n_types AS DOUBLE), 6) AS escape_mass,
       round(CAST(c AS DOUBLE)
             / CAST(n_tokens + n_types AS DOUBLE), 6) AS p_wb
FROM pc
ORDER BY source, probe
"""


SQL_WITTEN_BELL = _witten_bell_sql()


# --------------------------------------------------------------------------
# Length-bias audit of the scoring stack (Singhal's diagnosis that
# motivated pivoted normalization): Pearson correlation of document
# length against (a) raw matched-term frequency and (b) the fixed6 BM25
# score, over all candidate docs. BM25's length normalization should
# pull the correlation toward 0 while raw tf stays positive — the
# before/after picture in one row. Scores quantize to fixed6 BIGINTs
# first, so every moment sum is exact; the two correlations are single
# sqrt expressions, rounded 6.
# --------------------------------------------------------------------------
def q_length_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RUN), F.lit(0))
        ).alias("term"),
    )
    dl = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("dl")
    )
    avgdl_df = dl.agg(F.avg(F.col("dl").cast("double")).alias("_avgdl"))
    n_df = scalar_count(docs)
    qtoks = toks.filter(F.col("term").isin(NEWS_QUERY_TERMS))
    dfd = F.col("doc_frequency").cast("double")
    stats = (
        doc_frequencies(qtoks)
        .crossJoin(F.broadcast(n_df))
        .withColumn(
            "idf", F.log((F.col("_n") - dfd + 0.5) / (dfd + 0.5) + 1.0)
        )
        .select("term", "idf")
    )
    tf = qtoks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    tfd = F.col("tf").cast("double")
    norm = F.lit(BM25_K1) * (
        1.0
        - BM25_B
        + F.lit(BM25_B) * F.col("dl").cast("double") / F.col("_avgdl")
    )
    contrib = F.col("idf") * (tfd * (BM25_K1 + 1.0) / (tfd + norm))
    per_doc = (
        tf.join(F.broadcast(stats), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(avgdl_df))
        .groupBy("doc_id", "dl")
        .agg(
            F.sum("tf").cast("long").alias("tft"),
            F.sum(
                F.round(contrib * F.lit(1000000.0), 0).cast("long")
            )
            .cast("long")
            .alias("b6"),
        )
    )
    agg = per_doc.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("dl").cast("long").alias("sx"),
        F.sum(F.col("dl") * F.col("dl")).cast("long").alias("sxx"),
        F.sum("tft").cast("long").alias("st"),
        F.sum(F.col("tft") * F.col("tft")).cast("long").alias("stt"),
        F.sum(F.col("dl") * F.col("tft")).cast("long").alias("sxt"),
        F.sum("b6").cast("long").alias("sb"),
        # DELIBERATE invariant-4 tradeoff: Σb6² (~9e14/addend) would
        # overflow BIGINT beyond ~10k candidate docs, so these two power
        # sums ride as doubles on BOTH engines. Addition order can perturb
        # bits past 2^53, but the only consumer is a Pearson correlation
        # (ratio of O(1e19) terms, rounded 6) whose relative error stays
        # ~1e-16·cond — verified stable across the 3-SF + driver-like
        # harness. Do NOT "fix" to BIGINT: it would raise under ANSI.
        F.sum(
            F.col("b6").cast("double") * F.col("b6").cast("double")
        ).alias("sbb"),
        F.sum(F.col("dl").cast("double") * F.col("b6").cast("double"))
        .alias("sxb"),
    )

    def corr(n, sx, sy, sxy, sxx, syy):
        return (n * sxy - sx * sy) / F.sqrt(
            (n * sxx - sx * sx) * (n * syy - sy * sy)
        )

    n, sx, sxx = [
        F.col(c).cast("double") for c in ["n", "sx", "sxx"]
    ]
    st, stt, sxt = [
        F.col(c).cast("double") for c in ["st", "stt", "sxt"]
    ]
    sb, sbb, sxb = [
        F.col("sb").cast("double"),
        F.col("sbb"),
        F.col("sxb"),
    ]
    return agg.select(
        F.col("n").alias("n_candidates"),
        F.round(corr(n, sx, st, sxt, sxx, stt), 6).alias("corr_len_tf"),
        F.round(corr(n, sx, sb, sxb, sxx, sbb), 6).alias(
            "corr_len_bm25"
        ),
    )


def _length_bias_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in NEWS_QUERY_TERMS)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term
  FROM documents
),
n AS (SELECT count(*)::DOUBLE AS n FROM documents),
dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id),
avgdl AS (SELECT avg(dl::DOUBLE) AS avgdl FROM dl),
qt AS (SELECT doc_id, term FROM toks WHERE term IN ({terms})),
stats AS (
  SELECT term,
         ln((n.n - count(DISTINCT doc_id) + 0.5)
            / (count(DISTINCT doc_id) + 0.5) + 1.0) AS idf
  FROM qt, n GROUP BY term, n.n
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM qt GROUP BY 1, 2
),
per_doc AS (
  SELECT tf.doc_id, dl.dl,
         CAST(sum(tf.tf) AS BIGINT) AS tft,
         CAST(sum(CAST(round(stats.idf * (tf.tf::DOUBLE * ({BM25_K1} + 1.0)
               / (tf.tf::DOUBLE + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B}
                  * dl.dl::DOUBLE / avgdl.avgdl))) * 1000000.0) AS BIGINT))
              AS BIGINT) AS b6
  FROM tf
  JOIN stats USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id, avgdl
  GROUP BY tf.doc_id, dl.dl
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(dl) AS BIGINT) AS sx,
         CAST(sum(dl * dl) AS BIGINT) AS sxx,
         CAST(sum(tft) AS BIGINT) AS st,
         CAST(sum(tft * tft) AS BIGINT) AS stt,
         CAST(sum(dl * tft) AS BIGINT) AS sxt,
         CAST(sum(b6) AS BIGINT) AS sb,
         sum(CAST(b6 AS DOUBLE) * CAST(b6 AS DOUBLE)) AS sbb,
         sum(CAST(dl AS DOUBLE) * CAST(b6 AS DOUBLE)) AS sxb
  FROM per_doc
)
SELECT n AS n_candidates,
       round((CAST(n AS DOUBLE) * CAST(sxt AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(st AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
                       - CAST(st AS DOUBLE) * CAST(st AS DOUBLE))), 6)
         AS corr_len_tf,
       round((CAST(n AS DOUBLE) * sxb
              - CAST(sx AS DOUBLE) * CAST(sb AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * sbb
                       - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))), 6)
         AS corr_len_bm25
FROM agg
"""


SQL_LENGTH_BIAS = _length_bias_sql()


# --------------------------------------------------------------------------
# Hapax profile per language: V1 (hapax legomena), V2 (dis legomena),
# the hapax share V1/V, and Sichel's S = V2/V (1975 — empirically
# near-constant across corpus sizes for natural text, so drift flags
# synthetic/duplicated content) — the frequency-spectrum face of the
# richness family (yule_k uses its second moment). All counts exact from
# the (lang, term) spectrum; two divides rounded 6.
# --------------------------------------------------------------------------
def q_hapax_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(WORD_RUN), F.lit(0))
        ).alias("term"),
    )
    tf = toks.groupBy("lang", "term").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    per = tf.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum((F.col("c") == 1).cast("long")).cast("long").alias("v1"),
        F.sum((F.col("c") == 2).cast("long")).cast("long").alias("v2"),
    )
    vd = F.col("n_types").cast("double")
    return per.select(
        "lang",
        "n_types",
        "v1",
        "v2",
        F.round(F.col("v1").cast("double") / vd, 6).alias("hapax_share"),
        F.round(F.col("v2").cast("double") / vd, 6).alias("sichel_s"),
    ).orderBy("lang")


SQL_HAPAX_PROFILE = f"""
WITH tf AS (
  SELECT lang, term, CAST(count(*) AS BIGINT) AS c
  FROM (
    SELECT lang,
           unnest(regexp_extract_all(lower(text), '{WORD_RUN}')) AS term
    FROM documents
  ) GROUP BY lang, term
),
per AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_types,
         CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS v1,
         CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS v2
  FROM tf GROUP BY lang
)
SELECT lang, n_types, v1, v2,
       round(CAST(v1 AS DOUBLE) / CAST(n_types AS DOUBLE), 6)
         AS hapax_share,
       round(CAST(v2 AS DOUBLE) / CAST(n_types AS DOUBLE), 6)
         AS sichel_s
FROM per
ORDER BY lang
"""


# --------------------------------------------------------------------------
# Gini concentration of term mass per language (the Lorenz/Gini view of
# Zipf skew — how unequally token mass is spread over the vocabulary;
# the corpus-skew audit behind the engine's head-term shuffle
# discipline): per lang, terms rank ascending by (count, term) and
# Gini = (2*sum(i*c_i)) / (n*sum(c)) - (n+1)/n — every accumulated
# quantity an exact BIGINT over the bounded per-lang vocabulary, one
# combined double expression rounded 6.
# --------------------------------------------------------------------------
def q_term_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "lang",
            F.explode(
                F.regexp_extract_all(
                    F.lower("text"), F.lit(WORD_RUN), F.lit(0)
                )
            ).alias("term"),
        )
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    w = Window.partitionBy("lang").orderBy(F.asc("c"), F.asc("term"))
    ranked = tf.withColumn("i", F.row_number().over(w).cast("long"))
    agg = ranked.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum("c").cast("long").alias("sc"),
        F.sum(F.col("i") * F.col("c")).cast("long").alias("sic"),
    )
    nd = F.col("n_types").cast("double")
    gini = (
        F.lit(2.0)
        * F.col("sic").cast("double")
        / (nd * F.col("sc").cast("double"))
        - (nd + F.lit(1.0)) / nd
    )
    return agg.select(
        "lang",
        "n_types",
        F.col("sc").alias("n_tokens"),
        F.round(gini, 6).alias("gini"),
    ).orderBy("lang")


SQL_TERM_GINI = f"""
WITH tf AS (
  SELECT lang, term, CAST(count(*) AS BIGINT) AS c
  FROM (
    SELECT lang,
           unnest(regexp_extract_all(lower(text), '{WORD_RUN}')) AS term
    FROM documents
  ) GROUP BY lang, term
),
ranked AS (
  SELECT lang, c,
         CAST(row_number()
              OVER (PARTITION BY lang ORDER BY c ASC, term ASC)
              AS BIGINT) AS i
  FROM tf
),
agg AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_types,
         CAST(sum(c) AS BIGINT) AS sc,
         CAST(sum(i * c) AS BIGINT) AS sic
  FROM ranked GROUP BY lang
)
SELECT lang, n_types, sc AS n_tokens,
       round(2.0 * CAST(sic AS DOUBLE)
             / (CAST(n_types AS DOUBLE) * CAST(sc AS DOUBLE))
             - (CAST(n_types AS DOUBLE) + 1.0)
               / CAST(n_types AS DOUBLE), 6) AS gini
FROM agg
ORDER BY lang
"""


QUERIES = {
    "brown_smoothing": q_brown_smoothing,
    "chao1_vocab": q_chao1_vocab,
    "char_entropy": q_char_entropy,
    "corpus_delta": q_corpus_delta,
    "encoding_audit": q_encoding_audit,
    "entropy_rate": q_entropy_rate,
    "fightin_words": q_fightin_words,
    "good_turing": q_good_turing,
    "hapax_profile": q_hapax_profile,
    "keyness_llr": q_keyness_llr,
    "lang_divergence": q_lang_divergence,
    "language_id": q_language_id,
    "length_bias": q_length_bias,
    "length_moments": q_length_moments,
    "length_quantiles": q_length_quantiles,
    "lexical_diversity": q_lexical_diversity,
    "mutual_information": q_mutual_information,
    "naive_bayes_lang": q_naive_bayes_lang,
    "path_trigrams": q_path_trigrams,
    "stylometry": q_stylometry,
    "term_burstiness": q_term_burstiness,
    "term_gini": q_term_gini,
    "token_counts": q_token_counts,
    "unigram_perplexity": q_unigram_perplexity,
    "witten_bell": q_witten_bell,
    "yule_k": q_yule_k,
}

ORACLES = {
    "brown_smoothing": SQL_BROWN_SMOOTHING,
    "chao1_vocab": SQL_CHAO1_VOCAB,
    "char_entropy": SQL_CHAR_ENTROPY,
    "corpus_delta": SQL_CORPUS_DELTA,
    "encoding_audit": SQL_ENCODING_AUDIT,
    "entropy_rate": SQL_ENTROPY_RATE,
    "fightin_words": SQL_FIGHTIN_WORDS,
    "good_turing": SQL_GOOD_TURING,
    "hapax_profile": SQL_HAPAX_PROFILE,
    "keyness_llr": SQL_KEYNESS_LLR,
    "lang_divergence": SQL_LANG_DIVERGENCE,
    "language_id": SQL_LANGUAGE_ID,
    "length_bias": SQL_LENGTH_BIAS,
    "length_moments": SQL_LENGTH_MOMENTS,
    "length_quantiles": SQL_LENGTH_QUANTILES,
    "lexical_diversity": SQL_LEXICAL_DIVERSITY,
    "mutual_information": SQL_MUTUAL_INFORMATION,
    "naive_bayes_lang": SQL_NAIVE_BAYES_LANG,
    "path_trigrams": SQL_PATH_TRIGRAMS,
    "stylometry": SQL_STYLOMETRY,
    "term_burstiness": SQL_TERM_BURSTINESS,
    "term_gini": SQL_TERM_GINI,
    "token_counts": SQL_TOKEN_COUNTS,
    "unigram_perplexity": SQL_UNIGRAM_PERPLEXITY,
    "witten_bell": SQL_WITTEN_BELL,
    "yule_k": SQL_YULE_K,
}
