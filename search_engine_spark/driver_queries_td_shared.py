"""Shared constants and helpers for the driver_queries_td_* domain modules.

Every name here is used (transitively) by pairs in more than one domain
module; single-domain names live next to their pairs. Oracle SQL strings
bake these constants at import time (CLAUDE.md invariant 8) — never
rebind one.
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
# stopwords the token regex could actually produce (same subset the
# driver_queries module filters with)
_TD_STOPWORDS = sorted(w for w in STOPWORDS if "'" not in w)
_SQL_TD_STOPWORD_LIST = ", ".join(f"'{w}'" for w in _TD_STOPWORDS)

MUT_OFFSET = 100000
TOKEN_RUN = "[a-z0-9]{2,}"
US_PER_DAY_DIV = 86_400_000_000

# full-BM25 constants (k1/b), shared by bm25_topk and impact_quantization
BM25_K1 = 1.2
BM25_B = 0.75


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def _mut_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    mut = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + MUT_OFFSET).alias("doc_id"),
        F.expr("substring(text, 31)").alias("text"),
    )
    return docs.select("doc_id", "text").unionByName(mut)


def _shingle_cte(src: str = "corpus", k: int = 3) -> str:
    gram = " || ' ' || ".join(f"w[i + {j}]" for j in range(1, k + 1))
    return f"""
words AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RUN}') AS w FROM {src}
),
sh AS (
  SELECT DISTINCT doc_id, {gram} AS shingle
  FROM words, unnest(range(len(w) - {k - 1})) AS t(i)
  WHERE len(w) >= {k}
)
"""


# --------------------------------------------------------------------------
# SimHash fingerprints (64-bit signed, portable bit expansion)
# --------------------------------------------------------------------------
def _tf(spark: SparkSession, sf_dir: str, mutated: bool) -> DataFrame:
    src = _mut_docs(spark, sf_dir) if mutated else _read(
        spark, sf_dir, "documents"
    ).select("doc_id", "text")
    return (
        src.select(
            "doc_id",
            F.explode(
                F.expr(f"regexp_extract_all(lower(text), '{TOKEN_RUN}', 0)")
            ).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def _tf_cte(src: str) -> str:
    return f"""
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM (
    SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term
    FROM {src}
  ) GROUP BY doc_id, term
)
"""


def _srp_cte(src: str, n_planes: int, bits_per_band: int) -> str:
    """planes/bits/buckets CTEs replicating srp_banded() bit-for-bit.

    The sign dot product folds the 64 components as an ORDERED list
    (list_sum over list_transform) exactly like Spark's sequential
    zip_with/aggregate — a plain GROUP-BY sum() leaves the float summation
    order engine-defined and could flip a near-zero sign on one side only.
    """
    return f"""
planes AS (
  SELECT p.p::INT AS p,
         list_transform(range(64), d ->
           CASE WHEN (strpos('0123456789abcdef',
                  substring(md5(p.p || ':' || d), 1, 1)) - 1) % 2 = 1
                THEN 1.0 ELSE -1.0 END) AS s
  FROM (SELECT unnest(range({n_planes})) AS p) p
),
bits AS (
  SELECT e.vec_id, pl.p,
         CASE WHEN list_sum(list_transform(list_zip(e.v, pl.s),
                                           z -> z[1] * z[2])) > 0
              THEN 1 ELSE 0 END AS bit
  FROM {src} e, planes pl
),
buckets AS (
  SELECT vec_id, (p // {bits_per_band})::INT AS band,
         sum(bit * (1 << (p % {bits_per_band})))::INT AS bucket
  FROM bits GROUP BY vec_id, p // {bits_per_band}
)
"""


ND_PLANES = 32
ND_BANDS = 4


def _lang_sql() -> str:
    hit_cols = []
    for lang, markers in X.LANG_MARKERS.items():
        lst = ", ".join(f"'{m}'" for m in markers)
        hit_cols.append(
            f"len(list_filter(w, t -> list_contains([{lst}], t))) AS {lang}_hits"
        )
    # identical reverse-priority >= fold as the Spark implementation
    best, score = "'und'", "0"
    for lang in reversed(X.LANG_PRIORITY):
        best = (
            f"CASE WHEN {lang}_hits >= greatest({score}, 1) "
            f"THEN '{lang}' ELSE {best} END"
        )
        score = f"greatest({score}, {lang}_hits)"
    return f"""
WITH scored AS (
  SELECT doc_id, lang,
         {", ".join(hit_cols)},
         len(regexp_extract_all(text, '{X.CJK_PATTERN_DUCKDB}')) AS cjk_chars
  FROM (
    SELECT doc_id, lang, text,
           regexp_extract_all(lower(text), '{TOKEN_RUN}') AS w
    FROM documents
  )
)
SELECT doc_id,
       CASE WHEN cjk_chars > 0 THEN 'zh' ELSE {best} END AS pred_lang,
       en_hits, de_hits, fr_hits, es_hits, cjk_chars,
       (CASE WHEN cjk_chars > 0 THEN 'zh' ELSE {best} END) = lang AS lang_match
FROM scored
"""


# --------------------------------------------------------------------------
# Link-graph degrees + PageRank over a synthetic non-uniform graph with
# dangling nodes (exercises the reference's dangling-mass-drop semantics)
# --------------------------------------------------------------------------
_EDGES_DOC = """edges: every doc with doc_id % 13 != 0 links to
(7*id+13) % N and (5*id+2) % N (self-loops removed, distinct); docs with
doc_id % 13 == 0 are dangling (no out-edges) -> their rank mass is dropped,
per the reference (pagerank.py:29-38)."""


# the synthetic link graph: affine generators doc_id -> (m*doc_id + c) % N,
# docs with doc_id % 13 == 0 dangling. ONE spelling feeds both the Python
# side and the SQL CTE — a generator change cannot diverge them.
_BASE_GENS = ((7, 13), (5, 2))


def _edges(spark: SparkSession, sf_dir: str, gens=_BASE_GENS):
    docs = _read(spark, sf_dir, "documents").select("doc_id")
    # N in-plan as a broadcast scalar — no driver-side pre-count pass
    n_df = scalar_count(docs, as_double=False)
    src = docs.filter(F.col("doc_id") % 13 != 0).crossJoin(F.broadcast(n_df))
    parts = [
        src.select(
            F.col("doc_id").alias("source_doc_id"),
            ((F.col("doc_id") * m + c) % F.col("_n")).alias("target_doc_id"),
        )
        for m, c in gens
    ]
    edges = parts[0]
    for p in parts[1:]:
        edges = edges.unionByName(p)
    edges = edges.filter(
        F.col("source_doc_id") != F.col("target_doc_id")
    ).distinct()
    return docs, edges


def _edges_cte(gens=_BASE_GENS) -> str:
    branches = "\n    UNION ALL\n".join(
        f"    SELECT doc_id{' AS source_doc_id' if i == 0 else ''},"
        f" (doc_id * {m} + {c}) % nn.n"
        f"{' AS target_doc_id' if i == 0 else ''}"
        " FROM documents, nn WHERE doc_id % 13 <> 0"
        for i, (m, c) in enumerate(gens)
    )
    return f"""
nn AS (SELECT count(*) AS n FROM documents),
edges AS (
  SELECT DISTINCT source_doc_id, target_doc_id FROM (
{branches}
  ) WHERE source_doc_id <> target_doc_id
)
"""


_EDGES_CTE = _edges_cte()
WORD_RUN = "[a-z]{2,32}"


# --------------------------------------------------------------------------
# A4/J6 news scoring moved to driver_queries_news (it now runs over
# articles produced by the real feed-parse pipeline instead of the
# source='src0' stand-in); bm25_topk below shares its query-term literal.
# --------------------------------------------------------------------------
NEWS_QUERY_TERMS = ["spark", "data", "query"]
_EMB_DIM = 64  # /root/testdata/sf*/embeddings.parquet vector length


# --------------------------------------------------------------------------
# Hourly anomaly detection over events (beyond-reference analytics): per
# (event_type, hour) counts z-scored against the type's own hourly
# distribution, flagged at |z| >= 3 — the volume-spike/drop monitor a
# pipeline runs over ingest telemetry. Hours with zero events are absent
# by definition (the statistic is over observed hours). Invariant 3:
# hour index is integer DIV on ntz_epoch_us. Invariant 4: counts and the
# (N, Sx, Sxx) moments are exact BIGINTs; each z is one double expression
# of those integers, rounded 6; the flag compares the ROUNDED z so a
# sub-1e-6 divergence can never flip it. Types with <2 observed hours or
# zero variance emit NULL z (never a divide-by-zero).
# --------------------------------------------------------------------------
US_PER_HOUR_DIV = 3_600_000_000


# --------------------------------------------------------------------------
# Stationary distribution of the event-type Markov chain (the long-run
# companion to event_transitions' one-step matrix): 20 power iterations
# of v'=vP from the uniform start, next to the empirical type share —
# how far the chain's equilibrium sits from the raw frequency (equal
# only if the chain were already mixed). Same iterative-double +
# terminal-round discipline as the pagerank pair (sums are <=K terms; the
# oracle replays the identical recursion); the transition matrix is
# exact-rational n/row_total.
# --------------------------------------------------------------------------
MARKOV_ITERS = 20


def _markov_chain(spark: SparkSession, sf_dir: str):
    """(p, v): the exact-rational transition matrix DataFrame and the
    20-iteration power-method stationary vector (shared by
    q_markov_stationary and q_entropy_rate — identical recursion both
    pairs' oracles replay)."""
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
    p = (
        counts.join(F.broadcast(totals), "prev_type")
        .select(
            "prev_type",
            "next_type",
            (F.col("n").cast("double") / F.col("row_total")).alias("p"),
        )
        .localCheckpoint(eager=True)
    )
    types = events.select("event_type").distinct()
    k = scalar_count(types, as_double=True)
    v = types.crossJoin(F.broadcast(k)).select(
        F.col("event_type").alias("t"), (F.lit(1.0) / F.col("_n")).alias("v")
    )
    for _ in range(MARKOV_ITERS):
        v = (
            v.join(p, v["t"] == p["prev_type"])
            .groupBy("next_type")
            .agg(F.sum(F.col("v") * F.col("p")).alias("v"))
            .select(F.col("next_type").alias("t"), "v")
        )
    return p, v


_MARKOV_CTES = f"""ordered AS (
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
),
p AS (
  SELECT counts.prev_type, counts.next_type,
         CAST(counts.n AS DOUBLE) / totals.row_total AS p
  FROM counts JOIN totals USING (prev_type)
),
k AS (SELECT CAST(count(DISTINCT event_type) AS DOUBLE) AS k FROM events),
vt AS (
  SELECT 0 AS iter, event_type AS t, 1.0 / (SELECT k FROM k) AS v
  FROM (SELECT DISTINCT event_type FROM events)
  UNION ALL
  SELECT vt.iter + 1, p.next_type AS t, sum(vt.v * p.p) AS v
  FROM vt JOIN p ON p.prev_type = vt.t
  WHERE vt.iter < {MARKOV_ITERS}
  GROUP BY 1, 2
)"""


# --------------------------------------------------------------------------
# Discrete churn-hazard table (the life-table form of Kaplan-Meier —
# chosen over the survival CURVE precisely because it needs no
# cumulative float product, invariant 4: every cell is an integer count
# and the hazard is ONE ratio per row): per observed-lifetime bucket t,
# n_at_risk(t) = users whose lifetime >= t (descending cumulative over
# the bounded bucket levels), churned(t) = users who churned AT t, hazard
# = churned/n_at_risk. Churn = last event > 12 hours before the global
# observation end (users active near the end are censored — they leave
# the risk set after their observed lifetime, never counted as deaths).
# Buckets are 6-hour units sized to the synthetic events table (~1-month
# span, event-dense users: a weekly/14-day-gap table degenerates to one
# row with zero churners — probed before fixing the constants). BIGINT
# epoch-us arithmetic (ntz_epoch_us, invariant 3) and integer
# floor-division on positive operands (DuckDB // agrees with div there).
# --------------------------------------------------------------------------
LIFE_BUCKET_US = 6 * 3_600_000_000
CHURN_GAP_US = 12 * 3_600_000_000


US_PER_MINUTE_DIV = 60_000_000


# --------------------------------------------------------------------------
# A/B conversion z-test (the two-proportion test every experimentation
# platform ships): users split by md5(user_id) first-nibble parity (the
# repo's standard deterministic hash-split device), conversion = any
# BIG-TICKET purchase (value > 150 — the synthetic users are so
# event-dense that plain any-purchase converts 100% and degenerates the
# pooled variance to zero; probed before fixing the threshold); z = (pA - pB)/sqrt(p(1-p)(1/nA + 1/nB)) built ENTIRELY
# from integer counts (one identical double expression), significance
# decided on the ROUND-6 z grid against the 1.96 two-sided bound as an
# integer compare (|z6| >= 1960000 — no non-dyadic 1.96 literal crossing
# the DuckDB DECIMAL path, invariant 1).
# --------------------------------------------------------------------------
AB_CONV_VALUE6 = 150 * 1_000_000


# --------------------------------------------------------------------------
# DFR PL2 top-20 (Amati & van Rijsbergen 2002, divergence-from-randomness
# with Poisson model, Laplace after-effect, length normalization 2 at
# c=1; Stirling 1/(12 tfn) correction as in Terrier) — the third classic
# ranker next to bm25_topk and ql_topk over the same query terms. The
# whole score is multiplied by ln 2 (reported in nats), which turns every
# log2 into ln and the log2(e) coefficient into exactly 1 — no pow, no
# log2, only ln on identical doubles plus the two shortest-repr literal
# constants ln 2 and ln 2π (invariant 1: strings CAST AS DOUBLE in the
# oracle). Per-(doc, term) contributions are rounded to fixed6 BIGINTs
# and summed exactly (invariant 4); top-20 orders on the integer sum.
# --------------------------------------------------------------------------
LN2_STR = repr(math.log(2.0))
