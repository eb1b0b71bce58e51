"""IR pairs: BM25 scoring family, query expansion, rank eval, reranking.

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
    LN2_STR,
    NEWS_QUERY_TERMS,
    TOKEN_RUN,
    US_PER_DAY_DIV,
    WORD_RUN,
    _EDGES_CTE,
    _SQL_TD_STOPWORD_LIST,
    _TD_STOPWORDS,
    _edges,
    _read,
    _shingle_cte,
)

# --------------------------------------------------------------------------
# Novelty curve (arrival-order dedup statistic): per doc, the fraction of
# its shingles whose GLOBAL first occurrence (min doc_id, doc_id standing
# in for arrival order) is this doc — the marginal-novelty signal a
# streaming curation pipeline thresholds to drop recombination documents.
# First occurrences are a map-side-partial min on the corpus-cardinality
# shingle key; the membership join carries ids only (invariant 6).
# --------------------------------------------------------------------------
def q_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    sh = D.shingles(docs)
    first = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    per = (
        sh.join(first, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).alias("n_novel"),
        )
    )
    return per.select(
        "doc_id",
        "n_shingles",
        "n_novel",
        F.round(F.col("n_novel") / F.col("n_shingles"), 6).alias(
            "novelty_rate"
        ),
    )


SQL_NOVELTY_CURVE = f"""
WITH corpus AS (SELECT doc_id, text FROM documents), {_shingle_cte()},
first AS (SELECT shingle, min(doc_id) AS first_doc FROM sh GROUP BY shingle),
per AS (
  SELECT s.doc_id,
         CAST(count(*) AS BIGINT) AS n_shingles,
         CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
              AS BIGINT) AS n_novel
  FROM sh s JOIN first f USING (shingle)
  GROUP BY s.doc_id
)
SELECT doc_id, n_shingles, n_novel,
       round(n_novel / n_shingles, 6) AS novelty_rate
FROM per
"""


# --------------------------------------------------------------------------
# Next-word prediction table (autocomplete/suggest): per first-word, the
# argmax successor from raw bigram counts plus its conditional probability
# — the bigram-LM table behind type-ahead. Deterministic: top-50 first
# words by (total desc, word asc); per-word argmax via row_number over the
# AGGREGATED (w1, w2) counts (bounded by distinct successors, never the
# raw stream), tie to the lexicographically first successor.
# --------------------------------------------------------------------------
NEXT_WORD_TOP_K = 50


def q_next_word(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    words = docs.select(
        F.expr(f"regexp_extract_all(lower(text), '{TOKEN_RUN}', 0)").alias("w")
    )
    bg = words.filter(F.size("w") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(w) - 2), "
                "i -> struct(w[i] AS w1, w[i + 1] AS w2))"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    cnt = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("pair_cnt"))
    tot = cnt.groupBy("w1").agg(F.sum("pair_cnt").alias("total_cnt"))
    topw = tot.orderBy(F.col("total_cnt").desc(), F.col("w1").asc()).limit(
        NEXT_WORD_TOP_K
    )
    w = Window.partitionBy("w1").orderBy(
        F.col("pair_cnt").desc(), F.col("w2").asc()
    )
    ranked = (
        cnt.join(F.broadcast(topw.select("w1")), "w1", "semi")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return ranked.join(F.broadcast(topw), "w1").select(
        F.col("w1").alias("word"),
        F.col("w2").alias("next_word"),
        "pair_cnt",
        "total_cnt",
        F.round(F.col("pair_cnt") / F.col("total_cnt"), 6).alias("prob"),
    )


SQL_NEXT_WORD = f"""
WITH words AS (
  SELECT regexp_extract_all(lower(text), '{TOKEN_RUN}') AS w FROM documents
),
bg AS (
  SELECT w[i + 1] AS w1, w[i + 2] AS w2
  FROM words, unnest(range(len(w) - 1)) AS t(i) WHERE len(w) >= 2
),
cnt AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS pair_cnt FROM bg GROUP BY w1, w2
),
tot AS (
  SELECT w1, CAST(sum(pair_cnt) AS BIGINT) AS total_cnt FROM cnt GROUP BY w1
),
topw AS (
  SELECT w1, total_cnt FROM tot ORDER BY total_cnt DESC, w1 ASC
  LIMIT {NEXT_WORD_TOP_K}
),
ranked AS (
  SELECT c.w1, c.w2, c.pair_cnt,
         row_number() OVER (
           PARTITION BY c.w1 ORDER BY c.pair_cnt DESC, c.w2 ASC
         ) AS rn
  FROM cnt c WHERE c.w1 IN (SELECT w1 FROM topw)
)
SELECT r.w1 AS word, r.w2 AS next_word, r.pair_cnt, t.total_cnt,
       round(r.pair_cnt / t.total_cnt, 6) AS prob
FROM ranked r JOIN topw t USING (w1) WHERE rn = 1
"""


# --------------------------------------------------------------------------
# Full BM25 (k1=1.2, b=0.75) top-k: tf saturation + doc-length
# normalization. The reference stores avg_doc_len but scores tf*idf only
# (search_service.py:13-40); this is the engine's complete-BM25 mode the
# north_star names. Same tie-break discipline (score desc, doc asc).
# --------------------------------------------------------------------------
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RUN), F.lit(0))
        ).alias("term"),
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    # N and avgdl as in-plan broadcast scalars — no pre-plan driver actions
    avgdl_df = dl.agg(F.avg(F.col("dl").cast("double")).alias("_avgdl"))
    qtoks = toks.filter(F.col("term").isin(NEWS_QUERY_TERMS))
    dfd = F.col("doc_frequency").cast("double")
    stats = (
        doc_frequencies(qtoks)
        .crossJoin(F.broadcast(scalar_count(docs)))
        .withColumn(
            "idf", F.log((F.col("_n") - dfd + 0.5) / (dfd + 0.5) + 1.0)
        )
        .select("term", "idf")
    )
    tf = qtoks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    tfd = F.col("tf").cast("double")
    norm = F.lit(BM25_K1) * (
        1.0 - BM25_B + F.lit(BM25_B) * F.col("dl").cast("double") / F.col("_avgdl")
    )
    contrib = F.coalesce("idf", F.lit(1.0)) * (
        tfd * (BM25_K1 + 1.0) / (tfd + norm)
    )
    return (
        tf.join(F.broadcast(stats), "term", "left")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(avgdl_df))
        .groupBy("doc_id")
        .agg(
            F.round(F.sum(contrib), 6).alias("bm25_score"),
            # tf rows are unique per (doc, term): plain count == distinct terms
            F.count(F.lit(1)).alias("matched_terms"),
        )
        .orderBy(F.desc("bm25_score"), F.asc("doc_id"))
        .limit(20)
    )


def _bm25_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in NEWS_QUERY_TERMS)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term
  FROM documents
),
n AS (SELECT count(*)::DOUBLE AS n FROM documents),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
avgdl AS (SELECT avg(dl::DOUBLE) AS avgdl FROM dl),
stats AS (
  SELECT term,
         ln((n.n - count(DISTINCT doc_id) + 0.5) / (count(DISTINCT doc_id) + 0.5) + 1.0) AS idf
  FROM toks, n GROUP BY term, n.n
),
tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM toks WHERE term IN ({terms})
  GROUP BY doc_id, term
)
SELECT tf.doc_id,
       round(sum(COALESCE(stats.idf, 1.0) * (tf.tf::DOUBLE * ({BM25_K1} + 1.0)
             / (tf.tf::DOUBLE + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl.dl::DOUBLE / avgdl.avgdl)))), 6) AS bm25_score,
       count(DISTINCT tf.term) AS matched_terms
FROM tf
LEFT JOIN stats ON stats.term = tf.term
JOIN dl ON dl.doc_id = tf.doc_id, avgdl
GROUP BY tf.doc_id
ORDER BY bm25_score DESC, tf.doc_id ASC
LIMIT 20
"""


SQL_BM25_TOPK = _bm25_sql()


# --------------------------------------------------------------------------
# BM25 b-parameter sweep (length-normalization tuning): the rank-1 doc and
# score for each b in an exactly-binary-representable grid — the sweep a
# relevance engineer runs before fixing b. The grid is a broadcast local
# relation crossed onto the per-(doc, term) contributions; per-b argmax is
# a row_number over the 5 x |candidate docs| aggregated rows. Oracle grid
# values are cast ::DOUBLE (a bare DECIMAL column would serialize as a
# pandas object and fail the kind check).
# --------------------------------------------------------------------------
B_SWEEP_GRID = (0.0, 0.25, 0.5, 0.75, 1.0)


def q_bm25_b_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RUN), F.lit(0))
        ).alias("term"),
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    avgdl_df = dl.agg(F.avg(F.col("dl").cast("double")).alias("_avgdl"))
    qtoks = toks.filter(F.col("term").isin(NEWS_QUERY_TERMS))
    dfd = F.col("doc_frequency").cast("double")
    stats = (
        doc_frequencies(qtoks)
        .crossJoin(F.broadcast(scalar_count(docs)))
        .withColumn(
            "idf", F.log((F.col("_n") - dfd + 0.5) / (dfd + 0.5) + 1.0)
        )
        .select("term", "idf")
    )
    tf = qtoks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    grid = spark.createDataFrame([(b,) for b in B_SWEEP_GRID], "b double")
    tfd = F.col("tf").cast("double")
    norm = F.lit(BM25_K1) * (
        1.0 - F.col("b") + F.col("b") * F.col("dl").cast("double") / F.col("_avgdl")
    )
    contrib = F.coalesce("idf", F.lit(1.0)) * (
        tfd * (BM25_K1 + 1.0) / (tfd + norm)
    )
    scored = (
        tf.join(F.broadcast(stats), "term", "left")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(avgdl_df))
        .crossJoin(F.broadcast(grid))
        .groupBy("b", "doc_id")
        .agg(F.round(F.sum(contrib), 6).alias("score"))
    )
    w = Window.partitionBy("b").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "b",
            F.col("doc_id").alias("top_doc"),
            F.col("score").alias("top_score"),
        )
    )


def _b_sweep_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in NEWS_QUERY_TERMS)
    grid = ", ".join(str(b) for b in B_SWEEP_GRID)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term
  FROM documents
),
n AS (SELECT count(*)::DOUBLE AS n FROM documents),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
avgdl AS (SELECT avg(dl::DOUBLE) AS avgdl FROM dl),
stats AS (
  SELECT term,
         ln((n.n - count(DISTINCT doc_id) + 0.5) / (count(DISTINCT doc_id) + 0.5) + 1.0) AS idf
  FROM toks, n GROUP BY term, n.n
),
tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM toks WHERE term IN ({terms})
  GROUP BY doc_id, term
),
grid AS (SELECT unnest([{grid}])::DOUBLE AS b),
scored AS (
  SELECT g.b, tf.doc_id,
         round(sum(COALESCE(stats.idf, 1.0) * (tf.tf::DOUBLE * ({BM25_K1} + 1.0)
               / (tf.tf::DOUBLE + {BM25_K1} * (1.0 - g.b + g.b * dl.dl::DOUBLE / avgdl.avgdl)))), 6) AS score
  FROM tf
  LEFT JOIN stats ON stats.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id, avgdl, grid g
  GROUP BY g.b, tf.doc_id
),
ranked AS (
  SELECT b, doc_id, score,
         row_number() OVER (PARTITION BY b ORDER BY score DESC, doc_id ASC) AS rn
  FROM scored
)
SELECT b, doc_id AS top_doc, score AS top_score FROM ranked WHERE rn = 1
"""


SQL_BM25_B_SWEEP = _b_sweep_sql()


# --------------------------------------------------------------------------
# Cascade overlap (two-stage early-exit retrieval audit): how many of the
# full-BM25 top-20 survive a cheap tf-only first stage cut at depth 50 —
# the safety check before deploying an early-termination cascade. The
# stage-1 cut is a deterministic (tf-sum desc, doc asc) top-50; survived
# is a broadcast membership flag on the 20-row final ranking.
# --------------------------------------------------------------------------
CASCADE_DEPTH = 50


def q_cascade_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    top20 = q_bm25_topk(spark, sf_dir)
    docs = _read(spark, sf_dir, "documents")
    qtoks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RUN), F.lit(0))
        ).alias("term"),
    ).filter(F.col("term").isin(NEWS_QUERY_TERMS))
    stage1 = (
        qtoks.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("_tfsum"))
        .orderBy(F.desc("_tfsum"), F.asc("doc_id"))
        .limit(CASCADE_DEPTH)
        .select("doc_id", F.lit(1).alias("_in_s1"))
    )
    w = Window.orderBy(F.desc("bm25_score"), F.asc("doc_id"))
    return (
        top20.withColumn("rank", F.row_number().over(w).cast("long"))
        .join(F.broadcast(stage1), "doc_id", "left")
        .select(
            "rank",
            "doc_id",
            "bm25_score",
            F.coalesce("_in_s1", F.lit(0))
            .cast("long")
            .alias("survived_stage1"),
        )
    )


def _cascade_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in NEWS_QUERY_TERMS)
    return f"""
WITH top20 AS ({SQL_BM25_TOPK.strip()}),
s1 AS (
  SELECT doc_id FROM (
    SELECT doc_id, count(*) AS tfsum
    FROM (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term
      FROM documents
    ) WHERE term IN ({terms})
    GROUP BY doc_id
    ORDER BY tfsum DESC, doc_id ASC LIMIT {CASCADE_DEPTH}
  )
),
ranked AS (
  SELECT doc_id, bm25_score,
         CAST(row_number() OVER (ORDER BY bm25_score DESC, doc_id ASC) AS BIGINT) AS rank
  FROM top20
)
SELECT rank, r.doc_id, bm25_score,
       CAST(CASE WHEN s1.doc_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS survived_stage1
FROM ranked r LEFT JOIN s1 ON s1.doc_id = r.doc_id
"""


SQL_CASCADE_OVERLAP = _cascade_sql()


# --------------------------------------------------------------------------
# Reciprocal-rank fusion: fuse the BM25 top-20 (text relevance) with the
# in-link top-20 (link authority) — the classic two-signal web re-rank
# (the reference's intent score combines relevance with document-quality
# signals the same way; RRF is the rank-space variant). rrf(d) =
# sum over lists containing d of 1/(60 + rank_d). Ranks are computed on
# the ROUNDED bm25 score (engine-stable ordering; ES-sample recipe) with
# doc_id as the total tie-break; absent-from-list ranks are emitted as 0
# sentinels (NULL ints would serialize as float64 through pandas).
# --------------------------------------------------------------------------
RRF_K = 60


def q_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    w_b = Window.orderBy(F.desc("bm25_score"), F.asc("doc_id"))
    bm25 = (
        q_bm25_topk(spark, sf_dir)
        .select("doc_id", "bm25_score")
        .withColumn("bm25_rank", F.row_number().over(w_b))
    )
    docs, edges = _edges(spark, sf_dir)
    ind = edges.groupBy(F.col("target_doc_id").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("in_links")
    )
    w_a = Window.orderBy(F.desc("in_links"), F.asc("doc_id"))
    auth = (
        ind.orderBy(F.desc("in_links"), F.asc("doc_id"))
        .limit(20)
        .withColumn("authority_rank", F.row_number().over(w_a))
    )
    contrib_b = 1.0 / (F.lit(RRF_K) + F.col("bm25_rank"))
    contrib_a = 1.0 / (F.lit(RRF_K) + F.col("authority_rank"))
    return (
        bm25.join(auth, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.round(
                F.coalesce(contrib_b, F.lit(0.0))
                + F.coalesce(contrib_a, F.lit(0.0)),
                6,
            ).alias("rrf_score"),
            F.coalesce("bm25_rank", F.lit(0)).alias("bm25_rank"),
            F.coalesce("authority_rank", F.lit(0)).alias("authority_rank"),
        )
        .orderBy(F.desc("rrf_score"), F.asc("doc_id"))
    )


SQL_RANK_FUSION = f"""
WITH {{edges_cte}},
bm AS ({{bm25_sql}}),
bmr AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY bm25_score DESC, doc_id ASC) AS bm25_rank
  FROM bm
),
ind AS (SELECT target_doc_id AS doc_id, count(*) AS in_links
        FROM edges GROUP BY target_doc_id),
auth AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY in_links DESC, doc_id ASC) AS authority_rank
  FROM ind
  ORDER BY in_links DESC, doc_id ASC
  LIMIT 20
)
SELECT COALESCE(bmr.doc_id, auth.doc_id) AS doc_id,
       round(COALESCE(1.0 / ({RRF_K} + bmr.bm25_rank), 0.0)
             + COALESCE(1.0 / ({RRF_K} + auth.authority_rank), 0.0), 6) AS rrf_score,
       CAST(COALESCE(bmr.bm25_rank, 0) AS BIGINT) AS bm25_rank,
       CAST(COALESCE(auth.authority_rank, 0) AS BIGINT) AS authority_rank
FROM bmr FULL OUTER JOIN auth ON auth.doc_id = bmr.doc_id
ORDER BY rrf_score DESC, doc_id ASC
"""

SQL_RANK_FUSION = SQL_RANK_FUSION.format(
    edges_cte=_EDGES_CTE.strip(), bm25_sql=SQL_BM25_TOPK.strip()
)


# --------------------------------------------------------------------------
# Hybrid dense+sparse retrieval (RRF over BM25 and embedding-cosine
# rankings): the modern two-tower fusion — lexical top-20 from the full
# BM25 path, dense top-20 by exact cosine to a probe vector (vec_id 0;
# vec_id aligns with doc_id in the synthetic tables), reciprocal-rank-
# fused at k=60. Cosines come from knn_join's ordered zip_with fold
# rounded to 6 BEFORE ranking (invariant 4); absent legs contribute 0 and
# rank 0, mirroring rank_fusion.
# --------------------------------------------------------------------------
def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    w_b = Window.orderBy(F.desc("bm25_score"), F.asc("doc_id"))
    bm25 = (
        q_bm25_topk(spark, sf_dir)
        .select("doc_id", "bm25_score")
        .withColumn("bm25_rank", F.row_number().over(w_b))
    )
    emb = _read(spark, sf_dir, "embeddings")
    dense = S.knn_join(
        emb.filter(F.col("vec_id") == 0), emb, k=20
    ).select(
        F.col("nn_id").alias("doc_id"),
        F.col("rank").cast("long").alias("dense_rank"),
    )
    contrib_b = 1.0 / (F.lit(RRF_K) + F.col("bm25_rank"))
    contrib_d = 1.0 / (F.lit(RRF_K) + F.col("dense_rank"))
    return (
        bm25.join(dense, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.round(
                F.coalesce(contrib_b, F.lit(0.0))
                + F.coalesce(contrib_d, F.lit(0.0)),
                6,
            ).alias("rrf_score"),
            F.coalesce("bm25_rank", F.lit(0)).cast("long").alias("bm25_rank"),
            F.coalesce("dense_rank", F.lit(0)).cast("long").alias("dense_rank"),
        )
        .orderBy(F.desc("rrf_score"), F.asc("doc_id"))
    )


SQL_HYBRID_RRF = f"""
WITH bm AS ({{bm25_sql}}),
bmr AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY bm25_score DESC, doc_id ASC)
              AS BIGINT) AS bm25_rank
  FROM bm
),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
scored AS (
  SELECT c.vec_id AS doc_id,
         round(list_sum(list_transform(list_zip(p.v, c.v), z -> z[1] * z[2]))
           / (sqrt(list_sum(list_transform(p.v, x -> x * x)))
              * sqrt(list_sum(list_transform(c.v, x -> x * x)))), 6) AS cosine
  FROM e p JOIN e c ON p.vec_id = 0 AND c.vec_id <> 0
),
dr AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY cosine DESC, doc_id ASC)
              AS BIGINT) AS dense_rank
  FROM scored
  QUALIFY row_number() OVER (ORDER BY cosine DESC, doc_id ASC) <= 20
)
SELECT COALESCE(b.doc_id, d.doc_id) AS doc_id,
       round(COALESCE(1.0 / ({RRF_K} + b.bm25_rank), 0.0)
             + COALESCE(1.0 / ({RRF_K} + d.dense_rank), 0.0), 6) AS rrf_score,
       COALESCE(b.bm25_rank, 0) AS bm25_rank,
       COALESCE(d.dense_rank, 0) AS dense_rank
FROM bmr b FULL OUTER JOIN dr d ON b.doc_id = d.doc_id
"""

SQL_HYBRID_RRF = SQL_HYBRID_RRF.format(bm25_sql=SQL_BM25_TOPK.strip())


# --------------------------------------------------------------------------
# Query-snippet extraction (result presentation — the reference serves a
# title/description per hit; this is the generalization over body text):
# for every document hit by the fixed query, a 120-char window opening 30
# chars before the EARLIEST query-term occurrence, plus which query terms
# survive inside the window. Whole-word positions via space-padded
# matching; a term cut by the window edge loses its padding and does not
# count — identically in both engines (pure 1-based substring/locate
# arithmetic, shared semantics).
# --------------------------------------------------------------------------
SNIPPET_BEFORE = 30
SNIPPET_LEN = 120
_SNIPPET_ABSENT = 1 << 31


def q_search_snippets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    pos = {t: F.locate(f" {t} ", padded) for t in NEWS_QUERY_TERMS}
    first_pos = F.least(
        *[
            F.when(pos[t] > 0, pos[t]).otherwise(F.lit(_SNIPPET_ABSENT))
            for t in NEWS_QUERY_TERMS
        ]
    )
    first_term = F.coalesce(
        *[F.when(pos[t] == first_pos, F.lit(t)) for t in NEWS_QUERY_TERMS]
    )
    snippet = F.trim(
        padded.substr(
            F.greatest(F.lit(1), first_pos - SNIPPET_BEFORE),
            F.lit(SNIPPET_LEN),
        )
    )
    out = docs.select(
        "doc_id",
        first_pos.alias("first_pos"),
        first_term.alias("first_term"),
        snippet.alias("snippet"),
    ).filter(F.col("first_pos") < _SNIPPET_ABSENT)
    repad = F.concat(F.lit(" "), F.col("snippet"), F.lit(" "))
    hits = None
    for t in NEWS_QUERY_TERMS:
        h = (F.locate(f" {t} ", repad) > 0).cast("int")
        hits = h if hits is None else hits + h
    return out.select(
        "doc_id",
        F.col("first_pos").cast("int").alias("first_pos"),
        "first_term",
        "snippet",
        hits.alias("snippet_hits"),
    ).orderBy("doc_id")


def _search_snippets_sql() -> str:
    pos_cols = ",\n         ".join(
        f"strpos(padded, ' {t} ') AS p_{t}" for t in NEWS_QUERY_TERMS
    )
    least_args = ", ".join(
        f"CASE WHEN p_{t} > 0 THEN p_{t} ELSE {_SNIPPET_ABSENT} END"
        for t in NEWS_QUERY_TERMS
    )
    term_case = " ".join(
        f"WHEN p_{t} = first_pos THEN '{t}'" for t in NEWS_QUERY_TERMS
    )
    hit_sum = " + ".join(
        f"(CASE WHEN strpos(' ' || snippet || ' ', ' {t} ') > 0 THEN 1 ELSE 0 END)"
        for t in NEWS_QUERY_TERMS
    )
    return f"""
WITH base AS (
  SELECT doc_id, ' ' || text || ' ' AS padded FROM documents
),
pos AS (
  SELECT doc_id, padded,
         {pos_cols}
  FROM base
),
firstp AS (
  SELECT *, least({least_args}) AS first_pos FROM pos
),
snip AS (
  SELECT doc_id,
         CAST(first_pos AS INTEGER) AS first_pos,
         CASE {term_case} END AS first_term,
         trim(substring(padded, greatest(1, first_pos - {SNIPPET_BEFORE}), {SNIPPET_LEN})) AS snippet
  FROM firstp
  WHERE first_pos < {_SNIPPET_ABSENT}
)
SELECT doc_id, first_pos, first_term, snippet,
       CAST({hit_sum} AS INTEGER) AS snippet_hits
FROM snip
ORDER BY doc_id
"""


SQL_SEARCH_SNIPPETS = _search_snippets_sql()


# --------------------------------------------------------------------------
# Dirichlet-smoothed query likelihood retrieval (Zhai & Lafferty 2001) —
# the language-model scorer next to BM25: score(q,d) =
# Σ_matched ln(1 + tf·|C|/(μ·ctf_w)) + |q|·ln(μ/(dl+μ)), the standard
# matched-terms-only decomposition (unmatched terms fold into the second,
# doc-length-only term). Invariant 4: every ln runs ONCE on a double built
# from exact BIGINTs and is quantized to fixed6 immediately; per-doc sums
# are pure BIGINT; ranking keys on the exact integer score (desc, doc_id
# asc) so a sub-1e-6 ln divergence can never flip a rank. |C| and the
# per-term ctf ride in-plan (broadcast); docs with zero matches are
# excluded (the standard candidate set).
# --------------------------------------------------------------------------
QL_MU = 2000


def q_ql_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RUN), F.lit(0))
        ).alias("term"),
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("dl"))
    c_df = toks.agg(F.count(F.lit(1)).cast("long").alias("_c"))
    qtoks = toks.filter(F.col("term").isin(NEWS_QUERY_TERMS))
    ctf = qtoks.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("ctf"))
    tf = qtoks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    contrib6 = F.round(
        F.log(
            F.lit(1.0)
            + F.col("tf").cast("double") * F.col("_c")
            / (F.lit(float(QL_MU)) * F.col("ctf"))
        )
        * F.lit(1000000.0),
        0,
    ).cast("long")
    base6 = F.round(
        F.log(F.lit(float(QL_MU)) / (F.col("dl").cast("double") + QL_MU))
        * F.lit(1000000.0),
        0,
    ).cast("long") * F.lit(len(NEWS_QUERY_TERMS))
    per_doc = (
        tf.join(F.broadcast(ctf), "term")
        .crossJoin(F.broadcast(c_df))
        .groupBy("doc_id")
        .agg(
            F.sum(contrib6).cast("long").alias("m6"),
            F.count(F.lit(1)).cast("long").alias("matched_terms"),
        )
    )
    scored = per_doc.join(dl, "doc_id").select(
        "doc_id",
        "matched_terms",
        (F.col("m6") + base6).alias("score6"),
    )
    return (
        scored.orderBy(F.desc("score6"), F.asc("doc_id"))
        .limit(20)
        .select(
            "doc_id",
            "matched_terms",
            F.round(F.col("score6") / F.lit(1000000.0), 6).alias("ql_score"),
        )
    )


def _ql_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in NEWS_QUERY_TERMS)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term
  FROM documents
),
dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id),
c AS (SELECT CAST(count(*) AS BIGINT) AS c FROM toks),
qt AS (SELECT doc_id, term FROM toks WHERE term IN ({terms})),
ctf AS (SELECT term, CAST(count(*) AS BIGINT) AS ctf FROM qt GROUP BY term),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       FROM qt GROUP BY doc_id, term),
per_doc AS (
  SELECT tf.doc_id,
         CAST(sum(CAST(round(ln(1.0 + CAST(tf.tf AS DOUBLE) * c.c
                                 / ({QL_MU}.0 * ctf.ctf)) * 1000000.0)
                       AS BIGINT)) AS BIGINT) AS m6,
         CAST(count(*) AS BIGINT) AS matched_terms
  FROM tf JOIN ctf USING (term), c
  GROUP BY tf.doc_id
),
scored AS (
  SELECT p.doc_id, p.matched_terms,
         p.m6 + CAST(round(ln({QL_MU}.0 / (CAST(d.dl AS DOUBLE) + {QL_MU}))
                           * 1000000.0) AS BIGINT)
                * {len(NEWS_QUERY_TERMS)} AS score6
  FROM per_doc p JOIN dl d USING (doc_id)
)
SELECT doc_id, matched_terms, round(score6 / 1000000.0, 6) AS ql_score
FROM scored
ORDER BY score6 DESC, doc_id ASC
LIMIT 20
"""


SQL_QL_TOPK = _ql_sql()


# --------------------------------------------------------------------------
# Rank-biased overlap (Webber, Moffat & Zobel 2010) between the BM25 and
# Dirichlet-QL top-20 rankings over the same corpus/query — the standard
# top-weighted ranking-similarity statistic (truncated form), used to
# quantify how much two scorers agree before swapping one in. Shape: both
# 20-row rankings are ranked in-plan (windows over 20-row relations), the
# doc_id-matched pairs expand to the ≤20 depths d ≥ max(ra, rb) (≤400
# rows total), X_d = agreement at depth d folds by count, and each RBO
# term (1−p)·p^(d−1)·X_d/d is quantized fixed6 BEFORE the BIGINT sum
# (invariant 4 — pow may differ by an ulp between engines, the sum order
# never matters on integers). p = 0.9 rides as CAST('0.9' AS DOUBLE) in
# the oracle (invariant 1: no bare float literals).
# --------------------------------------------------------------------------
RBO_P = "0.9"
RBO_K = 20


def q_rank_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    a = q_bm25_topk(spark, sf_dir).select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("bm25_score"), F.asc("doc_id")))
        .alias("ra"),
    )
    b = q_ql_topk(spark, sf_dir).select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("ql_score"), F.asc("doc_id")))
        .alias("rb"),
    )
    m = a.join(b, "doc_id").select(
        F.greatest("ra", "rb").alias("dmin")
    )
    xd = (
        m.select(
            F.explode(F.sequence(F.col("dmin"), F.lit(RBO_K))).alias("d")
        )
        .groupBy("d")
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    p = F.lit(float(RBO_P))
    term6 = F.round(
        (F.lit(1.0) - p)
        * F.pow(p, F.col("d").cast("double") - 1.0)
        * F.col("x").cast("double")
        / F.col("d")
        * F.lit(1000000.0),
        0,
    ).cast("long")
    overlap = m.agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    rbo6 = xd.agg(F.sum(term6).cast("long").alias("rbo6"))
    return overlap.crossJoin(F.broadcast(rbo6)).select(
        F.lit(RBO_K).cast("long").alias("k"),
        "n_common",
        F.round(F.col("rbo6") / F.lit(1000000.0), 6).alias("rbo_trunc"),
    )


SQL_RANK_OVERLAP = f"""
WITH a AS MATERIALIZED (
  SELECT doc_id,
         row_number() OVER (ORDER BY bm25_score DESC, doc_id ASC) AS ra
  FROM ({SQL_BM25_TOPK})
),
b AS MATERIALIZED (
  SELECT doc_id,
         row_number() OVER (ORDER BY ql_score DESC, doc_id ASC) AS rb
  FROM ({SQL_QL_TOPK})
),
m AS MATERIALIZED (
  SELECT greatest(a.ra, b.rb) AS dmin FROM a JOIN b USING (doc_id)
),
xd AS (
  SELECT d, CAST(count(*) AS BIGINT) AS x
  FROM m, unnest(range(m.dmin, {RBO_K} + 1)) AS t(d)
  GROUP BY d
),
rbo AS (
  SELECT CAST(sum(CAST(round((1.0 - CAST('{RBO_P}' AS DOUBLE))
                             * power(CAST('{RBO_P}' AS DOUBLE), d - 1.0)
                             * x / d * 1000000.0) AS BIGINT)) AS BIGINT)
           AS rbo6
  FROM xd
),
ov AS (SELECT CAST(count(*) AS BIGINT) AS n_common FROM m)
SELECT CAST({RBO_K} AS BIGINT) AS k, ov.n_common,
       round(rbo.rbo6 / 1000000.0, 6) AS rbo_trunc
FROM ov, rbo
"""


# --------------------------------------------------------------------------
# Pseudo-relevance feedback expansion (RM1 relevance model, Lavrenko &
# Croft 2001): rank the corpus for the fixed query with an INTEGER-EXACT
# tf·idf6 score (per-term idf quantized to fixed6 BIGINT — the
# reference's tf*idf scoring, search_service.py:13-40, made
# aggregation-order-free), take the top PRF_FB_DOCS docs (score desc,
# doc_id asc), then estimate p(w|R) uniformly over the feedback set:
# weight = Σ_d tf(w,d)/|d| with each per-doc ratio floor-quantized to
# 1e-6 (tf·1e6/dl is pure IEEE multiply+divide on exact integers — no
# libm, bit-identical across engines) and summed as BIGINT. Output: the
# top PRF_TOP expansion terms (original query terms excluded) with
# feedback-doc df, the exact integer weight, and its exact double
# display form (one shared IEEE division — no rounding). Scale shape:
# the feedback set is ≤10 ids (broadcast); the expansion aggregation
# touches only the 10-doc token stream — query-time cheap at any corpus
# size, and the corpus-wide part is the same tf/idf aggregation the
# index build already materializes.
# --------------------------------------------------------------------------
PRF_FB_DOCS = 10
PRF_TOP = 15


def q_prf_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RUN), F.lit(0))
        ).alias("term"),
    ).filter(~F.col("term").isin(_TD_STOPWORDS))
    qtoks = toks.filter(F.col("term").isin(NEWS_QUERY_TERMS))
    dfd = F.col("doc_frequency").cast("double")
    idf6 = (
        doc_frequencies(qtoks)
        .crossJoin(F.broadcast(scalar_count(docs)))
        .select(
            "term",
            F.round(
                F.log((F.col("_n") - dfd + 0.5) / (dfd + 0.5) + 1.0)
                * F.lit(1000000.0),
                0,
            )
            .cast("long")
            .alias("idf6"),
        )
    )
    tf = qtoks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    fb = (
        tf.join(F.broadcast(idf6), "term")
        .groupBy("doc_id")
        .agg(F.sum(F.col("tf") * F.col("idf6")).cast("long").alias("score6"))
        .orderBy(F.desc("score6"), F.asc("doc_id"))
        .limit(PRF_FB_DOCS)
        .select("doc_id")
    )
    fb_toks = toks.join(F.broadcast(fb), "doc_id")
    dl = fb_toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("dl")
    )
    fb_tf = fb_toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    contrib = fb_tf.join(dl, "doc_id").select(
        "term",
        F.floor(
            F.col("tf").cast("double")
            * F.lit(1000000.0)
            / F.col("dl").cast("double")
        )
        .cast("long")
        .alias("c6"),
    )
    return (
        contrib.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("fb_df"),
            F.sum("c6").cast("long").alias("rm1_weight_i6"),
        )
        .filter(~F.col("term").isin(NEWS_QUERY_TERMS))
        .withColumn(
            "rm1_weight",
            F.col("rm1_weight_i6").cast("double")
            / F.lit(1000000.0 * PRF_FB_DOCS),
        )
        .orderBy(F.desc("rm1_weight_i6"), F.asc("term"))
        .limit(PRF_TOP)
    )


def _prf_sql() -> str:
    qterms = ", ".join(f"'{t}'" for t in NEWS_QUERY_TERMS)
    return f"""
WITH ftoks AS (
  SELECT * FROM (
    SELECT doc_id,
           unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term
    FROM documents
  ) WHERE term NOT IN ({_SQL_TD_STOPWORD_LIST})
),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
idf6 AS (
  SELECT term,
         CAST(round(ln((n.n - count(DISTINCT doc_id) + 0.5)
                       / (count(DISTINCT doc_id) + 0.5) + 1.0)
                    * 1000000.0) AS BIGINT) AS idf6
  FROM ftoks, n WHERE term IN ({qterms}) GROUP BY term, n.n
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM ftoks WHERE term IN ({qterms}) GROUP BY 1, 2
),
fb AS (
  SELECT tf.doc_id
  FROM tf JOIN idf6 USING (term)
  GROUP BY tf.doc_id
  ORDER BY CAST(sum(tf.tf * idf6.idf6) AS BIGINT) DESC, tf.doc_id
  LIMIT {PRF_FB_DOCS}
),
fb_toks AS (SELECT f.doc_id, f.term FROM ftoks f JOIN fb USING (doc_id)),
dl AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM fb_toks GROUP BY doc_id
),
fb_tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM fb_toks GROUP BY 1, 2
),
contrib AS (
  SELECT term,
         CAST(floor(CAST(tf AS DOUBLE) * 1000000.0 / CAST(dl.dl AS DOUBLE))
              AS BIGINT) AS c6
  FROM fb_tf JOIN dl USING (doc_id)
)
SELECT term,
       CAST(count(*) AS BIGINT) AS fb_df,
       CAST(sum(c6) AS BIGINT) AS rm1_weight_i6,
       CAST(sum(c6) AS BIGINT) / CAST({1000000 * PRF_FB_DOCS} AS DOUBLE)
         AS rm1_weight
FROM contrib
WHERE term NOT IN ({qterms})
GROUP BY term
ORDER BY rm1_weight_i6 DESC, term
LIMIT {PRF_TOP}
"""


SQL_PRF_EXPANSION = _prf_sql()


# --------------------------------------------------------------------------
# Positional phrase search (the classic positional-postings operator the
# reference's LIKE-based hit counter approximates, search_service.py
# rerank + intent hit counting): tokens carry their raw-stream position,
# a phrase of length L matches where L position-shifted streams align
# (term_i at pos+i). Filtering to the phrase's terms happens BEFORE the
# positional joins, so the IN-list pushes to the scan and only matching
# (doc_id, pos) ids cross the shuffle; per-phrase top-k goes through
# orderBy+limit (TakeOrderedAndProject — distributed partial top-k, no
# single-partition phrase window). Positions are reported 1-based.
# --------------------------------------------------------------------------
PHRASES = (("order", "fast"), ("order", "fast", "window"))
PHRASE_TOP = 20


def q_phrase_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(
            F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RUN), F.lit(0))
        ).alias("pos", "term"),
    )
    out = None
    for words in PHRASES:
        match = toks.filter(F.col("term") == words[0]).select("doc_id", "pos")
        for i, w in enumerate(words[1:], start=1):
            shifted = toks.filter(F.col("term") == w).select(
                "doc_id", (F.col("pos") - i).alias("pos")
            )
            match = match.join(shifted, ["doc_id", "pos"])
        per = (
            match.groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_occurrences"),
                (F.min("pos") + 1).cast("long").alias("first_pos"),
            )
            .select(
                F.lit(" ".join(words)).alias("phrase"),
                "doc_id",
                "n_occurrences",
                "first_pos",
            )
            .orderBy(F.desc("n_occurrences"), F.asc("doc_id"))
            .limit(PHRASE_TOP)
        )
        out = per if out is None else out.unionByName(per)
    return out


def _phrase_sql() -> str:
    branches = []
    for words in PHRASES:
        joins = "".join(
            f"\n    JOIN toks t{i} ON t{i}.doc_id = t0.doc_id"
            f" AND t{i}.pos = t0.pos + {i} AND t{i}.term = '{w}'"
            for i, w in enumerate(words[1:], start=1)
        )
        branches.append(f"""SELECT * FROM (
  SELECT '{" ".join(words)}' AS phrase, t0.doc_id,
         CAST(count(*) AS BIGINT) AS n_occurrences,
         CAST(min(t0.pos) AS BIGINT) AS first_pos
  FROM toks t0{joins}
  WHERE t0.term = '{words[0]}'
  GROUP BY t0.doc_id
  ORDER BY n_occurrences DESC, t0.doc_id
  LIMIT {PHRASE_TOP}
)""")
    body = "\nUNION ALL\n".join(branches)
    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term,
         generate_subscripts(regexp_extract_all(lower(text), '{TOKEN_RUN}'), 1)
           AS pos
  FROM documents
)
{body}
"""


SQL_PHRASE_MATCH = _phrase_sql()


# --------------------------------------------------------------------------
# Ranking evaluation: nDCG@10 of the integer-exact tf·idf6 ranking
# (prf_expansion's feedback scorer) against coordination-level graded
# relevance (grade = number of distinct query terms the doc contains —
# tf-blind, so the metric is not trivially 1). Every transcendental is
# pinned: per-term BM25 idf quantized fixed6 (invariant 4) and the rank
# discounts 1/log2(r+1) are Python-computed integer constants embedded
# identically in BOTH engines' plans. DCG6 = Σ grade·d6(rank) over the
# top-10 (score6 desc, doc_id asc — orderBy+limit, then a rank window on
# the 10 surviving rows only); IDCG6 comes from the per-grade doc COUNTS
# (cum-count CASE against the same constants — no corpus-wide ideal sort,
# no skewed window). ndcg is the one rounded divide of two exact BIGINTs.
# --------------------------------------------------------------------------
NDCG_K = 10
NDCG_QUERIES = {
    "news": ("spark", "data", "query"),
    "exec": ("join", "merge"),
    "plan": ("window", "sort", "order"),
    "flow": ("stream",),
}
# 1e6/log2(r+1) for rank r = 1..10, shared integer constants
_NDCG_D6 = {
    r: int(round(1000000.0 / math.log2(r + 1))) for r in range(1, NDCG_K + 1)
}


def q_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RUN), F.lit(0))
        ).alias("term"),
    )
    n_df = scalar_count(docs.select("doc_id"))
    out = None
    for qid, terms in sorted(NDCG_QUERIES.items()):
        qtoks = toks.filter(F.col("term").isin(*terms))
        tf = qtoks.groupBy("doc_id", "term").agg(
            F.count(F.lit(1)).cast("long").alias("tf")
        )
        dfd = F.col("doc_frequency").cast("double")
        idf6 = (
            doc_frequencies(qtoks)
            .crossJoin(F.broadcast(n_df))
            .select(
                "term",
                F.round(
                    F.log((F.col("_n") - dfd + 0.5) / (dfd + 0.5) + 1.0)
                    * F.lit(1000000.0),
                    0,
                )
                .cast("long")
                .alias("idf6"),
            )
        )
        per_doc = tf.join(F.broadcast(idf6), "term").groupBy("doc_id").agg(
            F.sum(F.col("tf") * F.col("idf6")).cast("long").alias("score6"),
            F.count(F.lit(1)).cast("long").alias("grade"),
        )
        top = per_doc.orderBy(F.desc("score6"), F.asc("doc_id")).limit(NDCG_K)
        rw = Window.orderBy(F.desc("score6"), F.asc("doc_id"))
        d6 = F.create_map(
            *[F.lit(x) for r, d in _NDCG_D6.items() for x in (r, d)]
        )
        dcg = top.select(
            (F.col("grade") * d6[F.row_number().over(rw)]).alias("g6")
        ).agg(F.sum("g6").cast("long").alias("dcg6"))
        cnts = per_doc.groupBy().agg(
            *[
                F.sum((F.col("grade") >= g).cast("long"))
                .cast("long")
                .alias(f"c{g}")
                for g in (1, 2, 3)
            ]
        )
        # grade at ideal rank r: 3 while r <= c3, then 2 while r <= c2,
        # then 1 while r <= c1 (c_g = docs with grade >= g, so c3<=c2<=c1)
        ideal = sum(
            F.when(F.lit(r) <= F.col("c3"), 3 * d)
            .when(F.lit(r) <= F.col("c2"), 2 * d)
            .when(F.lit(r) <= F.col("c1"), 1 * d)
            .otherwise(0)
            for r, d in _NDCG_D6.items()
        )
        row = dcg.crossJoin(F.broadcast(cnts)).select(
            F.lit(qid).alias("qid"),
            "dcg6",
            ideal.cast("long").alias("idcg6"),
        )
        out = row if out is None else out.unionByName(row)
    return out.select(
        "qid",
        "dcg6",
        "idcg6",
        F.round(
            F.col("dcg6").cast("double") / F.col("idcg6").cast("double"), 6
        ).alias("ndcg"),
    )


def _ndcg_sql() -> str:
    blocks = []
    for qid, terms in sorted(NDCG_QUERIES.items()):
        tl = ", ".join(f"'{t}'" for t in terms)
        d6_case = " ".join(
            f"WHEN {r} THEN {d}" for r, d in _NDCG_D6.items()
        )
        ideal = " + ".join(
            f"(CASE WHEN {r} <= c3 THEN {3 * d} WHEN {r} <= c2 THEN {2 * d}"
            f" WHEN {r} <= c1 THEN {d} ELSE 0 END)"
            for r, d in _NDCG_D6.items()
        )
        blocks.append(f"""SELECT * FROM (
  WITH qt AS (
    SELECT doc_id, term FROM (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term
      FROM documents
    ) WHERE term IN ({tl})
  ),
  n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
  tf AS (
    SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
    FROM qt GROUP BY 1, 2
  ),
  idf6 AS (
    SELECT term,
           CAST(round(ln((n.n - count(DISTINCT doc_id) + 0.5)
                         / (count(DISTINCT doc_id) + 0.5) + 1.0)
                      * 1000000.0) AS BIGINT) AS idf6
    FROM qt, n GROUP BY term, n.n
  ),
  per_doc AS (
    SELECT doc_id, CAST(sum(tf * idf6) AS BIGINT) AS score6,
           CAST(count(*) AS BIGINT) AS grade
    FROM tf JOIN idf6 USING (term) GROUP BY doc_id
  ),
  top AS (
    SELECT grade,
           row_number() OVER (ORDER BY score6 DESC, doc_id) AS r
    FROM per_doc ORDER BY score6 DESC, doc_id LIMIT {NDCG_K}
  ),
  cnts AS (
    SELECT CAST(sum(CASE WHEN grade >= 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
           CAST(sum(CASE WHEN grade >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
           CAST(sum(CASE WHEN grade >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS c3
    FROM per_doc
  ),
  dcg AS (
    SELECT CAST(sum(grade * (CASE r {d6_case} END)) AS BIGINT) AS dcg6
    FROM top
  )
  SELECT '{qid}' AS qid, dcg6, CAST({ideal} AS BIGINT) AS idcg6
  FROM dcg, cnts
)""")
    body = "\nUNION ALL\n".join(blocks)
    return f"""
SELECT qid, dcg6, idcg6,
       round(CAST(dcg6 AS DOUBLE) / CAST(idcg6 AS DOUBLE), 6) AS ndcg
FROM (
{body}
)
"""


SQL_NDCG_EVAL = _ndcg_sql()


# --------------------------------------------------------------------------
# Proximity ranking (min-span): the positional companion to phrase_match
# — rank docs containing BOTH query terms by the smallest token distance
# between any occurrence pair. Computed as a PLANE SWEEP, not the
# quadratic tf_a x tf_b position join: one window per doc ordered by
# position, each row's span = distance to the latest occurrence of the
# OTHER term at-or-before it (last_value IGNORE NULLS) — every nearest
# pair is seen from its later element, so min(span) is exact in
# O(tf_a + tf_b) per doc. Doc-sized window partitions (no skew);
# positions differ by one between engines (0- vs 1-based) but spans are
# differences, so the offset cancels. Integer throughout; top-10 by
# (min_span asc, doc_id) — a total order — via orderBy+limit.
# --------------------------------------------------------------------------
PROX_QUERIES = (("order", "window"), ("fast", "merge"))
PROX_TOP = 10


def q_proximity_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(
            F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RUN), F.lit(0))
        ).alias("pos", "term"),
    )
    out = None
    for a, b in PROX_QUERIES:
        sub = toks.filter(F.col("term").isin(a, b))
        w = (
            Window.partitionBy("doc_id")
            .orderBy("pos")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        prev_a = F.last(
            F.when(F.col("term") == a, F.col("pos")), ignorenulls=True
        ).over(w)
        prev_b = F.last(
            F.when(F.col("term") == b, F.col("pos")), ignorenulls=True
        ).over(w)
        span = F.when(F.col("term") == a, F.col("pos") - prev_b).otherwise(
            F.col("pos") - prev_a
        )
        per = (
            sub.select("doc_id", span.cast("long").alias("span"))
            .filter(F.col("span").isNotNull())
            .groupBy("doc_id")
            .agg(F.min("span").cast("long").alias("min_span"))
            .select(F.lit(f"{a} {b}").alias("query"), "doc_id", "min_span")
            .orderBy(F.asc("min_span"), F.asc("doc_id"))
            .limit(PROX_TOP)
        )
        out = per if out is None else out.unionByName(per)
    return out


def _proximity_sql() -> str:
    branches = []
    for a, b in PROX_QUERIES:
        branches.append(f"""SELECT * FROM (
  SELECT '{a} {b}' AS query, doc_id, CAST(min(span) AS BIGINT) AS min_span
  FROM (
    SELECT doc_id,
           CASE WHEN term = '{a}'
                THEN pos - last_value(CASE WHEN term = '{b}' THEN pos END
                                      IGNORE NULLS) OVER w
                ELSE pos - last_value(CASE WHEN term = '{a}' THEN pos END
                                      IGNORE NULLS) OVER w
           END AS span
    FROM toks WHERE term IN ('{a}', '{b}')
    WINDOW w AS (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
  ) WHERE span IS NOT NULL
  GROUP BY doc_id
  ORDER BY min_span, doc_id
  LIMIT {PROX_TOP}
)""")
    body = "\nUNION ALL\n".join(branches)
    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term,
         generate_subscripts(regexp_extract_all(lower(text), '{TOKEN_RUN}'), 1)
           AS pos
  FROM documents
)
{body}
"""


SQL_PROXIMITY_RANK = _proximity_sql()


# --------------------------------------------------------------------------
# MMR diversified rerank (Carbonell & Goldstein 1998): greedy top-5 from
# the 20 highest-cosine candidates of probe vec 0, score = λ·rel −
# (1−λ)·max-sim-to-selected with λ=0.7. All selection arithmetic is
# INTEGER: cosines are quantized to fixed6 BIGINT the moment they leave
# the ordered fold (both engines fold identically — the embedding_knn
# precedent), and mmr6 = 7·rel6 − 3·maxsim6 is the λ score scaled by
# 10⁷, so no float compare can reorder a boundary pick. The greedy loop
# is fully IN-PLAN in both engines — a 5-step ladder (anti-join the
# selected set, max-sim aggregate over it, orderBy+limit 1), the
# MATERIALIZED-CTE pattern from the BPE/HITS pairs — no driver-side
# rerank loop. The candidate pool is cached (20 rows) since every rung
# re-reads it. Probe relation is broadcast — zero plan-construction
# jobs for the probe fetch.
# --------------------------------------------------------------------------
MMR_K = 5
MMR_POOL = 20
MMR_LAM10 = 7  # λ·10; penalty weight is 10-λ·10 = 3


def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _read(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    probe = emb.filter(F.col("vec_id") == 0).select(F.col("v").alias("pv"))
    rel6 = F.round(
        S.cosine_similarity_col(F.col("pv"), F.col("v")) * 1000000.0, 0
    ).cast("long")
    cands = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(probe))
        .select("vec_id", "v", rel6.alias("rel6"))
        .orderBy(F.desc("rel6"), F.asc("vec_id"))
        .limit(MMR_POOL)
        .cache()
    )
    sim6 = F.round(
        S.cosine_similarity_col(F.col("va"), F.col("vb")) * 1000000.0, 0
    ).cast("long")
    sims = (
        cands.select(F.col("vec_id").alias("a"), F.col("v").alias("va"))
        .join(
            cands.select(F.col("vec_id").alias("b"), F.col("v").alias("vb")),
            F.col("a") != F.col("b"),
        )
        .select("a", "b", sim6.alias("sim6"))
    )
    picked = (
        cands.orderBy(F.desc("rel6"), F.asc("vec_id"))
        .limit(1)
        .select(
            F.lit(1).cast("long").alias("rank"),
            "vec_id",
            "rel6",
            F.lit(0).cast("long").alias("maxsim6"),
            (F.col("rel6") * F.lit(MMR_LAM10)).cast("long").alias("mmr6"),
        )
    )
    for k in range(2, MMR_K + 1):
        sel_ids = picked.select("vec_id")
        ms = (
            sims.join(sel_ids, sims["b"] == sel_ids["vec_id"])
            .groupBy("a")
            .agg(F.max("sim6").alias("ms"))
        )
        step = (
            cands.join(sel_ids, "vec_id", "left_anti")
            .join(ms, F.col("vec_id") == ms["a"])
            .select(
                F.lit(k).cast("long").alias("rank"),
                "vec_id",
                "rel6",
                F.col("ms").cast("long").alias("maxsim6"),
                (
                    F.col("rel6") * F.lit(MMR_LAM10)
                    - F.col("ms") * F.lit(10 - MMR_LAM10)
                )
                .cast("long")
                .alias("mmr6"),
            )
            .orderBy(F.desc("mmr6"), F.asc("vec_id"))
            .limit(1)
        )
        picked = picked.unionByName(step)
    return picked


def _mmr_sql() -> str:
    def sel(k: int) -> str:
        return " UNION ALL ".join(
            f"SELECT vec_id FROM s{j}" for j in range(1, k)
        )

    steps = []
    for k in range(2, MMR_K + 1):
        steps.append(f"""s{k} AS MATERIALIZED (
  SELECT CAST({k} AS BIGINT) AS rank, c.vec_id, c.rel6,
         m.ms AS maxsim6,
         {MMR_LAM10} * c.rel6 - {10 - MMR_LAM10} * m.ms AS mmr6
  FROM cands c JOIN (
    SELECT a, max(sim6) AS ms FROM sims
    WHERE b IN ({sel(k)}) GROUP BY a
  ) m ON m.a = c.vec_id
  WHERE c.vec_id NOT IN ({sel(k)})
  ORDER BY mmr6 DESC, c.vec_id LIMIT 1
)""")
    union = "\nUNION ALL\n".join(
        f"SELECT * FROM s{k}" for k in range(1, MMR_K + 1)
    )
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
p AS (SELECT v AS pv FROM e WHERE vec_id = 0),
cands AS MATERIALIZED (
  SELECT vec_id, v,
         CAST(round(
           list_sum(list_transform(list_zip(pv, v), z -> z[1] * z[2]))
           / (sqrt(list_sum(list_transform(pv, x -> x * x)))
              * sqrt(list_sum(list_transform(v, x -> x * x))))
           * 1000000.0) AS BIGINT) AS rel6
  FROM e, p WHERE vec_id <> 0
  ORDER BY rel6 DESC, vec_id LIMIT {MMR_POOL}
),
sims AS MATERIALIZED (
  SELECT x.vec_id AS a, y.vec_id AS b,
         CAST(round(
           list_sum(list_transform(list_zip(x.v, y.v), z -> z[1] * z[2]))
           / (sqrt(list_sum(list_transform(x.v, v -> v * v)))
              * sqrt(list_sum(list_transform(y.v, v -> v * v))))
           * 1000000.0) AS BIGINT) AS sim6
  FROM cands x JOIN cands y ON x.vec_id <> y.vec_id
),
s1 AS MATERIALIZED (
  SELECT CAST(1 AS BIGINT) AS rank, vec_id, rel6,
         CAST(0 AS BIGINT) AS maxsim6, {MMR_LAM10} * rel6 AS mmr6
  FROM cands ORDER BY rel6 DESC, vec_id LIMIT 1
),
{",".join(steps)}
{union}
"""


SQL_MMR_RERANK = _mmr_sql()


# --------------------------------------------------------------------------
# Query clarity (Cronen-Townsend, Zhou & Croft, SIGIR 2002): the classic
# query-performance predictor — KL divergence between the relevance model
# induced by a query's top-k retrieved docs and the corpus language model.
# High clarity = the query's result set speaks a focused sub-language
# (likely good retrieval); clarity near 0 = the results look like random
# corpus text (query will perform poorly). Retrieval leg is the ql_topk
# Dirichlet-QL scorer extended to a query SET (one grouped plan, not one
# job per query); the relevance model is P(w|R) = (1/k)·avg of P_ml(w|d)
# over the top-k docs. Invariant 4 everywhere a float could fold in
# engine-dependent order: per-doc tf/dl ratios quantize fixed6 into
# BIGINT sums, so P(w|R) is an exact rational of integers; each KL term
# p_r·log2(p_r/p_c) is ONE scalar expression of those exact integers
# quantized fixed6 before the per-query BIGINT sum. Scale shape: the
# token stream shuffles once to (doc, term); the per-query top-k relation
# is |Q|·k rows and BROADCASTS back onto the token stream (candidates-
# first, bounded rejoin — the reference's 2000-candidate over-fetch
# pattern, `app/api/search_service.py:103-104`).
# --------------------------------------------------------------------------
CLARITY_QUERIES = (
    (1, ("spark", "data")),
    (2, ("hash", "join", "merge")),
    (3, ("window",)),
    (4, ("fast", "slow")),
)
CLARITY_K = 10


def q_query_clarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RUN), F.lit(0))
        ).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    ctf = tf.groupBy("term").agg(F.sum("tf").cast("long").alias("ctf"))
    c_tot = ctf.agg(F.sum("ctf").cast("long").alias("_c"))

    qrel = spark.createDataFrame(
        [(qid, t) for qid, terms in CLARITY_QUERIES for t in terms],
        "query_id long, term string",
    )
    qlen = {qid: len(terms) for qid, terms in CLARITY_QUERIES}
    qlen_rel = spark.createDataFrame(
        list(qlen.items()), "query_id long, q_terms long"
    )

    # Dirichlet-QL per (query, doc): matched-term sum + |q|·doc base term
    contrib6 = F.round(
        F.log(
            F.lit(1.0)
            + F.col("tf").cast("double") * F.col("_c")
            / (F.lit(float(QL_MU)) * F.col("ctf"))
        )
        * F.lit(1000000.0),
        0,
    ).cast("long")
    matched = (
        tf.join(F.broadcast(qrel), "term")
        .join(F.broadcast(ctf.join(F.broadcast(qrel), "term").select("term", "ctf").distinct()), "term")
        .crossJoin(F.broadcast(c_tot))
        .groupBy("query_id", "doc_id")
        .agg(F.sum(contrib6).cast("long").alias("m6"))
    )
    base6 = F.round(
        F.log(F.lit(float(QL_MU)) / (F.col("dl").cast("double") + QL_MU))
        * F.lit(1000000.0),
        0,
    ).cast("long") * F.col("q_terms")
    scored = (
        matched.join(dl, "doc_id")
        .join(F.broadcast(qlen_rel), "query_id")
        .select("query_id", "doc_id", (F.col("m6") + base6).alias("score6"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score6"), F.asc("doc_id")
    )
    topk = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= CLARITY_K)
        .select("query_id", "doc_id")
    )

    # relevance model: r6(query, term) = Σ_topk round(1e6 · tf/dl)
    rm = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(topk), "doc_id")
        .groupBy("query_id", "term")
        .agg(
            F.sum(
                F.round(
                    F.col("tf").cast("double")
                    / F.col("dl")
                    * F.lit(1000000.0),
                    0,
                ).cast("long")
            ).cast("long").alias("r6")
        )
    )
    kq = topk.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    p_r = F.col("r6").cast("double") / (F.col("k") * F.lit(1000000.0))
    p_c = F.col("ctf").cast("double") / F.col("_c")
    kl6 = F.round(p_r * F.log2(p_r / p_c) * F.lit(1000000.0), 0).cast("long")
    return (
        rm.join(F.broadcast(kq), "query_id")
        .join(ctf, "term")
        .crossJoin(F.broadcast(c_tot))
        .groupBy("query_id")
        .agg(
            F.max("k").alias("n_topk"),
            F.count(F.lit(1)).cast("long").alias("rm_vocab"),
            F.round(F.sum(kl6).cast("long") / F.lit(1000000.0), 6).alias(
                "clarity"
            ),
        )
        .select("query_id", "n_topk", "rm_vocab", "clarity")
    )


def _clarity_sql() -> str:
    qrel = ", ".join(
        f"({qid}, '{t}')" for qid, terms in CLARITY_QUERIES for t in terms
    )
    qlen = ", ".join(f"({qid}, {len(terms)})" for qid, terms in CLARITY_QUERIES)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
ctf AS (SELECT term, CAST(sum(tf) AS BIGINT) AS ctf FROM tf GROUP BY term),
c AS (SELECT CAST(sum(ctf) AS BIGINT) AS c FROM ctf),
qrel(query_id, term) AS (VALUES {qrel}),
qlen(query_id, q_terms) AS (VALUES {qlen}),
matched AS (
  SELECT q.query_id, tf.doc_id,
         CAST(sum(CAST(round(ln(1.0 + CAST(tf.tf AS DOUBLE) * c.c
                                 / ({QL_MU}.0 * ctf.ctf)) * 1000000.0)
                       AS BIGINT)) AS BIGINT) AS m6
  FROM tf JOIN qrel q USING (term) JOIN ctf USING (term), c
  GROUP BY q.query_id, tf.doc_id
),
scored AS (
  SELECT m.query_id, m.doc_id,
         m.m6 + CAST(round(ln({QL_MU}.0 / (CAST(d.dl AS DOUBLE) + {QL_MU}))
                           * 1000000.0) AS BIGINT) * l.q_terms AS score6
  FROM matched m JOIN dl d USING (doc_id) JOIN qlen l USING (query_id)
),
topk AS (
  SELECT query_id, doc_id
  FROM scored
  QUALIFY row_number() OVER (PARTITION BY query_id
                             ORDER BY score6 DESC, doc_id ASC) <= {CLARITY_K}
),
rm AS (
  SELECT t.query_id, tf.term,
         CAST(sum(CAST(round(CAST(tf.tf AS DOUBLE) / d.dl * 1000000.0)
                       AS BIGINT)) AS BIGINT) AS r6
  FROM tf JOIN dl d USING (doc_id) JOIN topk t USING (doc_id)
  GROUP BY t.query_id, tf.term
),
kq AS (SELECT query_id, CAST(count(*) AS BIGINT) AS k
       FROM topk GROUP BY query_id)
SELECT rm.query_id,
       CAST(max(kq.k) AS BIGINT) AS n_topk,
       CAST(count(*) AS BIGINT) AS rm_vocab,
       round(CAST(sum(CAST(round(
           (CAST(rm.r6 AS DOUBLE) / (kq.k * 1000000.0))
           * log2((CAST(rm.r6 AS DOUBLE) / (kq.k * 1000000.0))
                  / (CAST(ctf.ctf AS DOUBLE) / c.c))
           * 1000000.0) AS BIGINT)) AS BIGINT) / 1000000.0, 6) AS clarity
FROM rm JOIN kq USING (query_id) JOIN ctf USING (term), c
GROUP BY rm.query_id
"""


SQL_QUERY_CLARITY = _clarity_sql()


# --------------------------------------------------------------------------
# Term-association matrix (Salton/Ochiai): for term pairs co-occurring at
# the DOCUMENT level, the incidence-vector cosine cooc/sqrt(df_a*df_b) —
# the thesaurus-construction statistic behind classical query expansion
# (vs bigram_pmi's ADJACENCY association and selectivity_estimates'
# independence audit). Pair generation follows the market_basket
# discipline: per-doc distinct-term self-join, fan-out bounded by doc
# vocabulary (never df²); cooc/df are exact BIGINTs, the cosine is ONE
# sqrt+divide on identical integers in both engines (invariant 4 —
# IEEE-pure, no accumulation), ranking on the rounded value with a full
# lexicographic tiebreak. Top-30.
# --------------------------------------------------------------------------
ASSOC_TOP = 30


def q_term_association(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    td = docs.select(
        "doc_id",
        F.explode(
            F.expr(f"regexp_extract_all(lower(text), '{TOKEN_RUN}', 0)")
        ).alias("term"),
    ).distinct()
    dfreq = td.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    a = td.select("doc_id", F.col("term").alias("term_a"))
    b = td.select("doc_id", F.col("term").alias("term_b"))
    cooc = (
        a.join(b, "doc_id")
        .filter(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b")
        .agg(F.count(F.lit(1)).cast("long").alias("cooc"))
    )
    dfa = dfreq.select(
        F.col("term").alias("term_a"), F.col("df").alias("df_a")
    )
    dfb = dfreq.select(
        F.col("term").alias("term_b"), F.col("df").alias("df_b")
    )
    return (
        cooc.join(F.broadcast(dfa), "term_a")
        .join(F.broadcast(dfb), "term_b")
        .select(
            "term_a",
            "term_b",
            "cooc",
            F.col("df_a").cast("long").alias("df_a"),
            F.col("df_b").cast("long").alias("df_b"),
            F.round(
                F.col("cooc")
                / F.sqrt((F.col("df_a") * F.col("df_b")).cast("double")),
                6,
            ).alias("ochiai"),
        )
        .orderBy(F.desc("ochiai"), "term_a", "term_b")
        .limit(ASSOC_TOP)
    )


SQL_TERM_ASSOCIATION = f"""
WITH td AS (
  SELECT DISTINCT doc_id, term FROM (
    SELECT doc_id,
           unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term
    FROM documents
  )
),
dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM td GROUP BY term),
cooc AS (
  SELECT a.term AS term_a, b.term AS term_b,
         CAST(count(*) AS BIGINT) AS cooc
  FROM td a JOIN td b ON b.doc_id = a.doc_id AND a.term < b.term
  GROUP BY a.term, b.term
)
SELECT term_a, term_b, cooc, fa.df AS df_a, fb.df AS df_b,
       round(cooc / sqrt(CAST(fa.df * fb.df AS DOUBLE)), 6) AS ochiai
FROM cooc
JOIN dfreq fa ON fa.term = term_a
JOIN dfreq fb ON fb.term = term_b
ORDER BY ochiai DESC, term_a, term_b
LIMIT {ASSOC_TOP}
"""


# --------------------------------------------------------------------------
# Rocchio feedback expansion (Rocchio 1971, SMART): the vector-space
# counterpart to q_prf_expansion's RM1. Rank the corpus with the same
# integer-exact tf*idf6 score (the reference's tf*idf scoring,
# search_service.py:13-40, quantized per invariant 4), take Dr = top
# PRF_FB_DOCS (score desc, doc_id asc) and Dnr = the bottom PRF_FB_DOCS of
# the REMAINING matched docs (score asc, doc_id asc — negative feedback
# from the weakest hits). Expansion weight per non-query term w is the
# classic beta/gamma combination with alpha=1.0, beta=0.75, gamma=0.15
# folded with the 1/|Dr| and 1/|Dnr| normalizers into exact integers:
#   rocchio_i6 = idf6(w) * (75 * sum_Dr tf - 15 * sum_Dnr tf)
# (x1000 weight scale * x1e6 idf scale; idf factors out of the per-doc
# sum, so the whole score is BIGINT arithmetic — aggregation-order-free,
# invariant 4). Scale shape: two TakeOrdered top-k's pick Dr/Dnr, both
# feedback sets broadcast (<=10 ids each); the only corpus-wide work is
# the same df aggregation the index build materializes
# (doc_frequencies two-phase, invariant 6).
# --------------------------------------------------------------------------
ROCCHIO_B1000 = 75  # beta 0.75 / |Dr|=10, x1000
ROCCHIO_G1000 = 15  # gamma 0.15 / |Dnr|=10, x1000


def q_rocchio_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RUN), F.lit(0))
        ).alias("term"),
    ).filter(~F.col("term").isin(_TD_STOPWORDS))
    qtoks = toks.filter(F.col("term").isin(NEWS_QUERY_TERMS))
    dfd = F.col("doc_frequency").cast("double")
    qidf6 = (
        doc_frequencies(qtoks)
        .crossJoin(F.broadcast(scalar_count(docs)))
        .select(
            "term",
            F.round(
                F.log((F.col("_n") - dfd + 0.5) / (dfd + 0.5) + 1.0)
                * F.lit(1000000.0),
                0,
            )
            .cast("long")
            .alias("idf6"),
        )
    )
    tf_q = qtoks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    scored = (
        tf_q.join(F.broadcast(qidf6), "term")
        .groupBy("doc_id")
        .agg(F.sum(F.col("tf") * F.col("idf6")).cast("long").alias("score6"))
    )
    fb = (
        scored.orderBy(F.desc("score6"), F.asc("doc_id"))
        .limit(PRF_FB_DOCS)
        .select("doc_id")
    )
    nfb = (
        scored.join(F.broadcast(fb), "doc_id", "left_anti")
        .orderBy(F.asc("score6"), F.asc("doc_id"))
        .limit(PRF_FB_DOCS)
        .select("doc_id")
    )
    r_sum = (
        toks.join(F.broadcast(fb), "doc_id")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("r_df"),
            F.sum("tf").cast("long").alias("r_tf"),
        )
    )
    n_sum = (
        toks.join(F.broadcast(nfb), "doc_id")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("n_tf"))
    )
    idf6_all = (
        doc_frequencies(toks)
        .crossJoin(F.broadcast(scalar_count(docs)))
        .select(
            "term",
            F.round(
                F.log((F.col("_n") - dfd + 0.5) / (dfd + 0.5) + 1.0)
                * F.lit(1000000.0),
                0,
            )
            .cast("long")
            .alias("idf6"),
        )
    )
    merged = r_sum.join(n_sum, "term", "full_outer").join(idf6_all, "term")
    rocchio_i6 = (
        F.col("idf6")
        * (
            F.lit(ROCCHIO_B1000) * F.coalesce(F.col("r_tf"), F.lit(0))
            - F.lit(ROCCHIO_G1000) * F.coalesce(F.col("n_tf"), F.lit(0))
        )
    ).cast("long")
    return (
        merged.filter(~F.col("term").isin(NEWS_QUERY_TERMS))
        .select(
            "term",
            F.coalesce(F.col("r_df"), F.lit(0)).cast("long").alias("r_df"),
            rocchio_i6.alias("rocchio_i6"),
            (rocchio_i6.cast("double") / F.lit(1000000000.0)).alias(
                "rocchio_weight"
            ),
        )
        .orderBy(F.desc("rocchio_i6"), F.asc("term"))
        .limit(PRF_TOP)
    )


def _rocchio_sql() -> str:
    qterms = ", ".join(f"'{t}'" for t in NEWS_QUERY_TERMS)
    return f"""
WITH ftoks AS (
  SELECT * FROM (
    SELECT doc_id,
           unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term
    FROM documents
  ) WHERE term NOT IN ({_SQL_TD_STOPWORD_LIST})
),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
qidf6 AS (
  SELECT term,
         CAST(round(ln((n.n - count(DISTINCT doc_id) + 0.5)
                       / (count(DISTINCT doc_id) + 0.5) + 1.0)
                    * 1000000.0) AS BIGINT) AS idf6
  FROM ftoks, n WHERE term IN ({qterms}) GROUP BY term, n.n
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM ftoks WHERE term IN ({qterms}) GROUP BY 1, 2
),
scored AS (
  SELECT tf.doc_id, CAST(sum(tf.tf * qidf6.idf6) AS BIGINT) AS score6
  FROM tf JOIN qidf6 USING (term) GROUP BY tf.doc_id
),
fb AS (SELECT doc_id FROM scored ORDER BY score6 DESC, doc_id LIMIT {PRF_FB_DOCS}),
nfb AS (
  SELECT doc_id FROM scored
  WHERE doc_id NOT IN (SELECT doc_id FROM fb)
  ORDER BY score6 ASC, doc_id LIMIT {PRF_FB_DOCS}
),
idf6 AS (
  SELECT term,
         CAST(round(ln((n.n - count(DISTINCT doc_id) + 0.5)
                       / (count(DISTINCT doc_id) + 0.5) + 1.0)
                    * 1000000.0) AS BIGINT) AS idf6
  FROM ftoks, n GROUP BY term, n.n
),
r_sum AS (
  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS r_df,
         CAST(count(*) AS BIGINT) AS r_tf
  FROM ftoks WHERE doc_id IN (SELECT doc_id FROM fb) GROUP BY term
),
n_sum AS (
  SELECT term, CAST(count(*) AS BIGINT) AS n_tf
  FROM ftoks WHERE doc_id IN (SELECT doc_id FROM nfb) GROUP BY term
)
SELECT term,
       CAST(COALESCE(r_sum.r_df, 0) AS BIGINT) AS r_df,
       CAST(idf6.idf6 * ({ROCCHIO_B1000} * COALESCE(r_sum.r_tf, 0)
                         - {ROCCHIO_G1000} * COALESCE(n_sum.n_tf, 0))
            AS BIGINT) AS rocchio_i6,
       CAST(idf6.idf6 * ({ROCCHIO_B1000} * COALESCE(r_sum.r_tf, 0)
                         - {ROCCHIO_G1000} * COALESCE(n_sum.n_tf, 0))
            AS BIGINT) / 1000000000.0 AS rocchio_weight
FROM r_sum FULL OUTER JOIN n_sum USING (term) JOIN idf6 USING (term)
WHERE term NOT IN ({qterms})
ORDER BY rocchio_i6 DESC, term
LIMIT {PRF_TOP}
"""


SQL_ROCCHIO_EXPANSION = _rocchio_sql()


# --------------------------------------------------------------------------
# Spearman rank agreement between PageRank and in-degree (the classic
# "is the expensive iteration buying anything over a degree count?"
# audit — Fortunato et al. 2008 report rho ~0.9 on the web graph, and a
# LOW value is precisely when PageRank earns its 20 iterations): rank
# both centralities with row_number over (value desc, doc_id) — the
# deterministic-tiebreak variant, so ranks are a permutation and
# Spearman collapses to the exact-integer 1 - 6*sum(d^2)/(n(n^2-1)).
# PageRank is ranked on its ROUND-9 value (the pair-proven grid both
# engines agree on bit-for-bit; ranking raw doubles could flip
# sub-1e-9-apart neighbors between engines).
# --------------------------------------------------------------------------
def q_rank_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.pagerank import build_document_authority

    docs, edges = _edges(spark, sf_dir)
    auth = build_document_authority(docs, edges).select(
        "doc_id",
        F.round("pagerank", 9).alias("pr"),
        F.col("inlink_count").cast("long").alias("inlinks"),
    )
    wpr = Window.orderBy(F.desc("pr"), "doc_id")
    win = Window.orderBy(F.desc("inlinks"), "doc_id")
    ranked = auth.select(
        (F.row_number().over(wpr).cast("long")
         - F.row_number().over(win).cast("long")).alias("d")
    )
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("d") * F.col("d")).cast("long").alias("sum_d2"),
    ).select(
        "n",
        "sum_d2",
        F.round(
            F.lit(1.0)
            - F.lit(6.0)
            * F.col("sum_d2").cast("double")
            / (
                F.col("n").cast("double")
                * (F.col("n") * F.col("n") - F.lit(1)).cast("double")
            ),
            6,
        ).alias("spearman_rho"),
    )


SQL_RANK_CORRELATION = f"""
WITH RECURSIVE {_EDGES_CTE},
outdeg AS (SELECT source_doc_id AS src, count(*)::DOUBLE AS od
           FROM edges GROUP BY source_doc_id),
edges_w AS (
  SELECT e.source_doc_id AS src, e.target_doc_id AS dst, 1.0 / o.od AS w
  FROM edges e JOIN outdeg o ON o.src = e.source_doc_id
  UNION ALL
  SELECT doc_id, doc_id, 0.0 FROM documents
),
pr AS (
  SELECT 0 AS iter, doc_id, 1.0 / (SELECT n FROM nn) AS rank FROM documents
  UNION ALL
  SELECT pr.iter + 1, e.dst AS doc_id,
         (1 - 0.85) / (SELECT n FROM nn) + 0.85 * sum(pr.rank * e.w) AS rank
  FROM pr JOIN edges_w e ON e.src = pr.doc_id
  WHERE pr.iter < 20
  GROUP BY pr.iter + 1, e.dst
),
ind AS (SELECT target_doc_id AS doc_id, CAST(count(*) AS BIGINT) AS inlinks
        FROM edges GROUP BY target_doc_id),
auth AS (
  SELECT pr.doc_id, round(pr.rank, 9) AS pr,
         CAST(COALESCE(i.inlinks, 0) AS BIGINT) AS inlinks
  FROM pr LEFT JOIN ind i ON i.doc_id = pr.doc_id
  WHERE pr.iter = 20
),
ranked AS (
  SELECT CAST(row_number() OVER (ORDER BY pr DESC, doc_id) AS BIGINT)
         - CAST(row_number() OVER (ORDER BY inlinks DESC, doc_id) AS BIGINT)
           AS d
  FROM auth
)
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(sum(d * d) AS BIGINT) AS sum_d2,
       round(1.0 - 6.0 * CAST(sum(d * d) AS DOUBLE)
             / (CAST(count(*) AS DOUBLE)
                * CAST(count(*) * count(*) - 1 AS DOUBLE)), 6)
         AS spearman_rho
FROM ranked
"""


# --------------------------------------------------------------------------
# Hard-negative mining for contrastive training (the triplet-mining
# staple — Schroff et al. 2015 FaceNet semi-hard selection, batch-level
# form): per probe vector, the most similar SAME-label neighbor (the
# positive) and the most similar DIFFERENT-label neighbor (the hard
# negative), with the triplet margin pos_cos - neg_cos — the table a
# curation pipeline exports to train embedding models on its own corpus.
# Cosines via the ordered-fold cosine_similarity_col (invariant 4) on
# the ROUND-6 grid BEFORE the per-class argmax (ties then break on
# neighbor id — identical in both engines); brute-force probe broadcast
# (the knn_join verifier shape, documented).
# --------------------------------------------------------------------------
HARD_NEG_PROBE_MOD = 25


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training_data.similarity import cosine_similarity_col

    emb = _read(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", F.col("label").cast("long").alias("label")
    )
    probes = emb.filter(F.col("vec_id") % HARD_NEG_PROBE_MOD == 0).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("_pv"),
        F.col("label").alias("p_label"),
    )
    cands = emb.select(
        F.col("vec_id").alias("nn_id"),
        F.col("embedding").alias("_cv"),
        F.col("label").alias("c_label"),
    )
    scored = (
        F.broadcast(probes)
        .join(cands, F.col("probe_id") != F.col("nn_id"))
        .select(
            "probe_id",
            "nn_id",
            (F.col("p_label") == F.col("c_label")).alias("same"),
            F.round(
                cosine_similarity_col(F.col("_pv"), F.col("_cv")), 6
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("probe_id", "same").orderBy(
        F.desc("cos"), F.asc("nn_id")
    )
    top = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    pos = top.filter(F.col("same")).select(
        "probe_id",
        F.col("nn_id").alias("pos_id"),
        F.col("cos").alias("pos_cos"),
    )
    neg = top.filter(~F.col("same")).select(
        "probe_id",
        F.col("nn_id").alias("neg_id"),
        F.col("cos").alias("neg_cos"),
    )
    return (
        pos.join(neg, "probe_id")
        .select(
            "probe_id",
            "pos_id",
            "pos_cos",
            "neg_id",
            "neg_cos",
            F.round(F.col("pos_cos") - F.col("neg_cos"), 6).alias("margin"),
        )
        .orderBy("probe_id")
    )


SQL_HARD_NEGATIVES = f"""
WITH e AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label, embedding::DOUBLE[] AS v
  FROM embeddings
),
scored AS (
  SELECT p.vec_id AS probe_id, c.vec_id AS nn_id,
         (p.label = c.label) AS same,
         round(list_sum(list_transform(list_zip(p.v, c.v), z -> z[1] * z[2]))
           / (sqrt(list_sum(list_transform(p.v, x -> x * x)))
              * sqrt(list_sum(list_transform(c.v, x -> x * x)))), 6) AS cos
  FROM e p JOIN e c ON p.vec_id <> c.vec_id
  WHERE p.vec_id % {HARD_NEG_PROBE_MOD} = 0
),
top AS (
  SELECT * FROM scored
  QUALIFY row_number() OVER (PARTITION BY probe_id, same
                             ORDER BY cos DESC, nn_id) = 1
)
SELECT pos.probe_id, pos.nn_id AS pos_id, pos.cos AS pos_cos,
       neg.nn_id AS neg_id, neg.cos AS neg_cos,
       round(pos.cos - neg.cos, 6) AS margin
FROM top pos JOIN top neg
  ON neg.probe_id = pos.probe_id AND pos.same AND NOT neg.same
ORDER BY pos.probe_id
"""


# --------------------------------------------------------------------------
# Expansion-method agreement (meta-evaluation over two shipped
# operators): how much of the RM1 (prf_expansion) top-15 the Rocchio
# top-15 reproduces — the standard sanity check before swapping
# expansion models in a ranking stack (high overlap = interchangeable,
# low = the relevance models genuinely disagree and an A/B is needed).
# Reuses BOTH pair definitions verbatim on each side (Spark calls the
# pair functions; the oracle embeds both pair SQLs as derived tables),
# so agreement here is also a consistency proof across four
# implementations. Pure set counts + one Jaccard ratio.
# --------------------------------------------------------------------------
def q_expansion_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    prf = q_prf_expansion(spark, sf_dir).select("term")
    roc = q_rocchio_expansion(spark, sf_dir).select("term")
    common = prf.join(roc, "term").agg(
        F.count(F.lit(1)).cast("long").alias("n_common")
    )
    np_ = prf.agg(F.count(F.lit(1)).cast("long").alias("n_prf"))
    nr = roc.agg(F.count(F.lit(1)).cast("long").alias("n_rocchio"))
    return (
        common.crossJoin(F.broadcast(np_))
        .crossJoin(F.broadcast(nr))
        .select(
            "n_prf",
            "n_rocchio",
            "n_common",
            F.round(
                F.col("n_common").cast("double")
                / (
                    F.col("n_prf") + F.col("n_rocchio") - F.col("n_common")
                ).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


SQL_EXPANSION_AGREEMENT = f"""
WITH prf AS ({SQL_PRF_EXPANSION}),
roc AS ({SQL_ROCCHIO_EXPANSION}),
c AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM prf) AS n_prf,
         (SELECT CAST(count(*) AS BIGINT) FROM roc) AS n_rocchio,
         (SELECT CAST(count(*) AS BIGINT)
          FROM prf JOIN roc USING (term)) AS n_common
)
SELECT n_prf, n_rocchio, n_common,
       round(CAST(n_common AS DOUBLE)
             / CAST(n_prf + n_rocchio - n_common AS DOUBLE), 6) AS jaccard
FROM c
"""


# --------------------------------------------------------------------------
# BM25F top-k (Robertson, Zaragoza & Taylor 2004, the simple-variant
# field-weighted BM25 — the standard title-boost ranking the reference's
# 3.2/1.7/1.0 field weights approximate): the document's first 60 chars
# act as the title field (weight 2) and the rest as body (weight 1);
# weighted tf and weighted doc length are exact INTEGERS (2*tf_t + tf_b),
# then the usual k1/b saturation over the weighted stats. Field split by
# identical substring() in both engines (a token straddling the 60-char
# boundary splits identically on both sides — a documented artifact of
# the synthetic field boundary, not a parity risk). Same relaxed
# <=3-term double-sum + round-6 discipline as the pair-proven bm25_topk.
# --------------------------------------------------------------------------
BM25F_TITLE_CHARS = 60
BM25F_TITLE_W = 2


def q_bm25f_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    tok_t = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(
                F.lower(F.expr(f"substring(text, 1, {BM25F_TITLE_CHARS})")),
                F.lit(TOKEN_RUN),
                F.lit(0),
            )
        ).alias("term"),
        F.lit(BM25F_TITLE_W).alias("w"),
    )
    tok_b = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(
                F.lower(F.expr(f"substring(text, {BM25F_TITLE_CHARS + 1})")),
                F.lit(TOKEN_RUN),
                F.lit(0),
            )
        ).alias("term"),
        F.lit(1).alias("w"),
    )
    toks = tok_t.unionByName(tok_b)
    wdl = toks.groupBy("doc_id").agg(F.sum("w").cast("long").alias("wdl"))
    avgdl_df = wdl.agg(F.avg(F.col("wdl").cast("double")).alias("_avgdl"))
    qtoks = toks.filter(F.col("term").isin(NEWS_QUERY_TERMS))
    dfd = F.col("doc_frequency").cast("double")
    stats = (
        doc_frequencies(qtoks)
        .crossJoin(F.broadcast(scalar_count(docs)))
        .withColumn(
            "idf", F.log((F.col("_n") - dfd + 0.5) / (dfd + 0.5) + 1.0)
        )
        .select("term", "idf")
    )
    wtf = qtoks.groupBy("doc_id", "term").agg(
        F.sum("w").cast("long").alias("wtf")
    )
    tfd = F.col("wtf").cast("double")
    norm = F.lit(BM25_K1) * (
        1.0
        - BM25_B
        + F.lit(BM25_B) * F.col("wdl").cast("double") / F.col("_avgdl")
    )
    contrib = F.coalesce("idf", F.lit(1.0)) * (
        tfd * (BM25_K1 + 1.0) / (tfd + norm)
    )
    return (
        wtf.join(F.broadcast(stats), "term", "left")
        .join(wdl, "doc_id")
        .crossJoin(F.broadcast(avgdl_df))
        .groupBy("doc_id")
        .agg(
            F.round(F.sum(contrib), 6).alias("bm25f_score"),
            F.count(F.lit(1)).cast("long").alias("matched_terms"),
        )
        .orderBy(F.desc("bm25f_score"), F.asc("doc_id"))
        .limit(20)
    )


def _bm25f_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in NEWS_QUERY_TERMS)
    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(
           lower(substring(text, 1, {BM25F_TITLE_CHARS})), '{TOKEN_RUN}')) AS term,
         {BM25F_TITLE_W} AS w
  FROM documents
  UNION ALL
  SELECT doc_id,
         unnest(regexp_extract_all(
           lower(substring(text, {BM25F_TITLE_CHARS + 1})), '{TOKEN_RUN}')) AS term,
         1 AS w
  FROM documents
),
wdl AS (SELECT doc_id, CAST(sum(w) AS BIGINT) AS wdl FROM toks GROUP BY doc_id),
avgdl AS (SELECT avg(CAST(wdl AS DOUBLE)) AS a FROM wdl),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
stats AS (
  SELECT term, ln((n.n - count(DISTINCT doc_id) + 0.5)
                  / (count(DISTINCT doc_id) + 0.5) + 1.0) AS idf
  FROM toks, n WHERE term IN ({terms}) GROUP BY term, n.n
),
wtf AS (
  SELECT doc_id, term, CAST(sum(w) AS BIGINT) AS wtf
  FROM toks WHERE term IN ({terms}) GROUP BY 1, 2
)
SELECT wtf.doc_id,
       round(sum(COALESCE(stats.idf, 1.0)
                 * (CAST(wtf.wtf AS DOUBLE) * ({BM25_K1} + 1.0)
                    / (CAST(wtf.wtf AS DOUBLE)
                       + {BM25_K1} * (1.0 - {BM25_B}
                          + {BM25_B} * CAST(wdl.wdl AS DOUBLE) / avgdl.a)))),
             6) AS bm25f_score,
       CAST(count(*) AS BIGINT) AS matched_terms
FROM wtf
LEFT JOIN stats USING (term)
JOIN wdl USING (doc_id), avgdl
GROUP BY wtf.doc_id
ORDER BY bm25f_score DESC, wtf.doc_id ASC
LIMIT 20
"""


SQL_BM25F_TOPK = _bm25f_sql()


# --------------------------------------------------------------------------
# Learning-to-rank feature export (the table an LTR trainer consumes —
# Liu 2009's standard feature families joined in one pass): for the
# fixed query's top-20 candidates (exact integer tf*idf6 ranking, the
# PRF/Rocchio feedback selection), the lexical features (score6,
# matched terms, tf sum, doc length) joined with the GRAPH features
# (round-9 PageRank + in-degree over the synthetic link graph). The
# showcase composition pair: retrieval, statistics, and graph pipelines
# feeding one training table; the oracle independently replays ALL of
# them (idf aggregation + the 20-iteration PageRank recursion).
# --------------------------------------------------------------------------
def q_ltr_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.pagerank import build_document_authority

    docs = _read(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RUN), F.lit(0))
        ).alias("term"),
    ).filter(~F.col("term").isin(_TD_STOPWORDS))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("dl"))
    qtoks = toks.filter(F.col("term").isin(NEWS_QUERY_TERMS))
    dfd = F.col("doc_frequency").cast("double")
    idf6 = (
        doc_frequencies(qtoks)
        .crossJoin(F.broadcast(scalar_count(docs)))
        .select(
            "term",
            F.round(
                F.log((F.col("_n") - dfd + 0.5) / (dfd + 0.5) + 1.0)
                * F.lit(1000000.0),
                0,
            )
            .cast("long")
            .alias("idf6"),
        )
    )
    tf = qtoks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    top = (
        tf.join(F.broadcast(idf6), "term")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("tf") * F.col("idf6")).cast("long").alias("score6"),
            F.count(F.lit(1)).cast("long").alias("matched_terms"),
            F.sum("tf").cast("long").alias("tf_sum"),
        )
        .orderBy(F.desc("score6"), F.asc("doc_id"))
        .limit(20)
    )
    gdocs, edges = _edges(spark, sf_dir)
    auth = build_document_authority(gdocs, edges).select(
        "doc_id",
        F.round("pagerank", 9).alias("pagerank"),
        F.col("inlink_count").cast("long").alias("inlinks"),
    )
    return (
        top.join(dl, "doc_id")
        .join(auth, "doc_id", "left")
        .select(
            "doc_id",
            "score6",
            "matched_terms",
            "tf_sum",
            "dl",
            F.coalesce("pagerank", F.lit(0.0)).alias("pagerank"),
            F.coalesce("inlinks", F.lit(0)).cast("long").alias("inlinks"),
        )
        .orderBy(F.desc("score6"), "doc_id")
    )


def _ltr_sql() -> str:
    qterms = ", ".join(f"'{t}'" for t in NEWS_QUERY_TERMS)
    return f"""
WITH RECURSIVE {_EDGES_CTE},
ftoks AS (
  SELECT * FROM (
    SELECT doc_id,
           unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term
    FROM documents
  ) WHERE term NOT IN ({_SQL_TD_STOPWORD_LIST})
),
dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM ftoks GROUP BY doc_id),
nd AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
idf6 AS (
  SELECT term,
         CAST(round(ln((nd.n - count(DISTINCT doc_id) + 0.5)
                       / (count(DISTINCT doc_id) + 0.5) + 1.0)
                    * 1000000.0) AS BIGINT) AS idf6
  FROM ftoks, nd WHERE term IN ({qterms}) GROUP BY term, nd.n
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM ftoks WHERE term IN ({qterms}) GROUP BY 1, 2
),
top AS (
  SELECT tf.doc_id,
         CAST(sum(tf.tf * idf6.idf6) AS BIGINT) AS score6,
         CAST(count(*) AS BIGINT) AS matched_terms,
         CAST(sum(tf.tf) AS BIGINT) AS tf_sum
  FROM tf JOIN idf6 USING (term)
  GROUP BY tf.doc_id
  ORDER BY score6 DESC, tf.doc_id
  LIMIT 20
),
outdeg AS (SELECT source_doc_id AS src, count(*)::DOUBLE AS od
           FROM edges GROUP BY source_doc_id),
edges_w AS (
  SELECT e.source_doc_id AS src, e.target_doc_id AS dst, 1.0 / o.od AS w
  FROM edges e JOIN outdeg o ON o.src = e.source_doc_id
  UNION ALL
  SELECT doc_id, doc_id, 0.0 FROM documents
),
pr AS (
  SELECT 0 AS iter, doc_id, 1.0 / (SELECT n FROM nn) AS rank FROM documents
  UNION ALL
  SELECT pr.iter + 1, e.dst AS doc_id,
         (1 - 0.85) / (SELECT n FROM nn) + 0.85 * sum(pr.rank * e.w) AS rank
  FROM pr JOIN edges_w e ON e.src = pr.doc_id
  WHERE pr.iter < 20
  GROUP BY pr.iter + 1, e.dst
),
ind AS (SELECT target_doc_id AS doc_id, CAST(count(*) AS BIGINT) AS inlinks
        FROM edges GROUP BY target_doc_id),
auth AS (
  SELECT pr.doc_id, round(pr.rank, 9) AS pagerank,
         CAST(COALESCE(i.inlinks, 0) AS BIGINT) AS inlinks
  FROM pr LEFT JOIN ind i ON i.doc_id = pr.doc_id
  WHERE pr.iter = 20
)
SELECT t.doc_id, t.score6, t.matched_terms, t.tf_sum, dl.dl,
       COALESCE(a.pagerank, 0.0) AS pagerank,
       CAST(COALESCE(a.inlinks, 0) AS BIGINT) AS inlinks
FROM top t
JOIN dl USING (doc_id)
LEFT JOIN auth a ON a.doc_id = t.doc_id
ORDER BY t.score6 DESC, t.doc_id
"""


SQL_LTR_FEATURES = _ltr_sql()


# --------------------------------------------------------------------------
# Negative-sampling distribution (word2vec's unigram^0.75 table —
# Mikolov et al. 2013; the sampling prior every embedding trainer builds
# from corpus counts): per term, p proportional to ctf^0.75 vs the raw
# unigram share. The 3/4 power is spelled sqrt(ctf * sqrt(ctf)) in BOTH
# engines — sqrt is IEEE-754 correctly rounded everywhere, so the value
# is bit-identical cross-engine, unlike pow(x, 0.75) (Java Math.pow is
# only 1-ulp-accurate — a last-bit difference could flip the 1e-9
# quantization boundary). Quantized to fixed9 BIGINTs, integer-summed Z
# (invariant 4), ONE division per row. Top 30 by ctf (integer order).
# --------------------------------------------------------------------------
NEG_SAMPLE_TOP = 30


def q_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RUN), F.lit(0))
        ).alias("term")
    ).filter(~F.col("term").isin(_TD_STOPWORDS))
    ctf = toks.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("ctf"))
    c = F.col("ctf").cast("double")
    pow9 = F.round(F.sqrt(c * F.sqrt(c)) * F.lit(1000000000.0), 0).cast(
        "long"
    )
    weighted = ctf.select("term", "ctf", pow9.alias("p9"))
    z = weighted.agg(
        F.sum("p9").cast("long").alias("_z9"),
        F.sum("ctf").cast("long").alias("_tot"),
    )
    return (
        weighted.crossJoin(F.broadcast(z))
        .select(
            "term",
            "ctf",
            (F.col("p9").cast("double") / F.col("_z9").cast("double")).alias(
                "sample_p"
            ),
            (F.col("ctf").cast("double") / F.col("_tot").cast("double")).alias(
                "unigram_p"
            ),
        )
        .orderBy(F.desc("ctf"), "term")
        .limit(NEG_SAMPLE_TOP)
    )


SQL_NEGATIVE_SAMPLING = f"""
WITH toks AS (
  SELECT * FROM (
    SELECT unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term
    FROM documents
  ) WHERE term NOT IN ({_SQL_TD_STOPWORD_LIST})
),
ctf AS (SELECT term, CAST(count(*) AS BIGINT) AS ctf FROM toks GROUP BY term),
weighted AS (
  SELECT term, ctf,
         CAST(round(sqrt(CAST(ctf AS DOUBLE) * sqrt(CAST(ctf AS DOUBLE)))
                    * 1000000000.0) AS BIGINT) AS p9
  FROM ctf
),
z AS (SELECT CAST(sum(p9) AS BIGINT) AS z9,
             CAST(sum(ctf) AS BIGINT) AS tot FROM weighted)
SELECT term, ctf,
       CAST(p9 AS DOUBLE) / CAST(z.z9 AS DOUBLE) AS sample_p,
       CAST(ctf AS DOUBLE) / CAST(z.tot AS DOUBLE) AS unigram_p
FROM weighted, z
ORDER BY ctf DESC, term
LIMIT {NEG_SAMPLE_TOP}
"""


# --------------------------------------------------------------------------
# Threshold-algorithm depth audit (Fagin, Lotem & Naor 2001 — the
# middleware top-k result): two document rankings (by length, and by an
# independent md5 order standing in for an uncorrelated signal), exact
# top-10 by RANK SUM, and for each winner the positions in both lists —
# the max position is the sorted-access depth a TA scan needs before it
# can stop. Positions are exact row_numbers with doc_id tiebreaks;
# everything is integer.
# --------------------------------------------------------------------------
def q_threshold_algorithm(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents").select("doc_id", "n_chars")
    wa = Window.orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
    wb = Window.orderBy(F.md5(F.col("doc_id").cast("string")).asc())
    ranked = docs.select(
        "doc_id",
        F.row_number().over(wa).cast("long").alias("pos_a"),
        F.row_number().over(wb).cast("long").alias("pos_b"),
    )
    pick = Window.orderBy(
        (F.col("pos_a") + F.col("pos_b")).asc(), F.col("doc_id").asc()
    )
    return (
        ranked.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") <= 10)
        .select(
            "doc_id",
            "pos_a",
            "pos_b",
            (F.col("pos_a") + F.col("pos_b")).alias("rank_sum"),
            F.greatest("pos_a", "pos_b").alias("ta_depth"),
        )
        .orderBy("rank_sum", "doc_id")
    )


SQL_THRESHOLD_ALGORITHM = """
WITH ranked AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id ASC)
              AS BIGINT) AS pos_a,
         CAST(row_number() OVER (
              ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC) AS BIGINT)
           AS pos_b
  FROM documents
),
top AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (ORDER BY pos_a + pos_b ASC, doc_id ASC)
           AS rn
    FROM ranked)
  WHERE rn <= 10
)
SELECT doc_id, pos_a, pos_b,
       pos_a + pos_b AS rank_sum,
       greatest(pos_a, pos_b) AS ta_depth
FROM top
ORDER BY rank_sum, doc_id
"""


# --------------------------------------------------------------------------
# Top-K membership churn (the ops dashboard behind "are our heavy users
# the same people week over week?"): per consecutive week pair, the
# Jaccard overlap of the top-10 users by event count (row_number with
# user tiebreak — exact integers). Weekly top-10s are bounded, the
# consecutive-week self-join is bounded, and every overlap count is an
# exact integer.
# --------------------------------------------------------------------------
def q_topk_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    wk = (
        events.select(
            (
                F.floor(
                    ntz_epoch_us(F.col("ts")) / F.lit(US_PER_DAY_DIV)
                ).cast("long")
                / 7
            )
            .cast("long")
            .alias("week"),
            "user_id",
        )
        .groupBy("week", "user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    wr = Window.partitionBy("week").orderBy(
        F.col("c").desc(), F.col("user_id").asc()
    )
    top = wk.withColumn("rn", F.row_number().over(wr)).filter(
        F.col("rn") <= 10
    ).select("week", "user_id").localCheckpoint(eager=True)
    a, b = top.alias("a"), top.alias("b")
    inter = (
        a.join(
            b,
            (F.col("b.week") == F.col("a.week") + 1)
            & (F.col("a.user_id") == F.col("b.user_id")),
        )
        .groupBy(F.col("a.week").alias("week"))
        .agg(F.count(F.lit(1)).cast("long").alias("overlap"))
    )
    sizes = top.groupBy("week").agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    nxt = sizes.select(
        (F.col("week") - 1).alias("week"), F.col("k").alias("k_next")
    )
    pairs = (
        sizes.join(nxt, "week")
        .join(inter, "week", "left")
        .select(
            "week",
            "k",
            "k_next",
            F.coalesce("overlap", F.lit(0)).cast("long").alias("overlap"),
        )
    )
    return pairs.select(
        "week",
        "overlap",
        F.round(
            F.col("overlap").cast("double")
            / (F.col("k") + F.col("k_next") - F.col("overlap")).cast(
                "double"
            ),
            6,
        ).alias("jaccard"),
    ).orderBy("week")


SQL_TOPK_CHURN = f"""
WITH wk AS (
  SELECT (epoch_us(ts) // {US_PER_DAY_DIV}) // 7 AS week, user_id,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
top AS (
  SELECT week, user_id FROM (
    SELECT *, row_number() OVER (PARTITION BY week
               ORDER BY c DESC, user_id ASC) AS rn
    FROM wk)
  WHERE rn <= 10
),
inter AS (
  SELECT a.week, CAST(count(*) AS BIGINT) AS overlap
  FROM top a JOIN top b
    ON b.week = a.week + 1 AND a.user_id = b.user_id
  GROUP BY a.week
),
sizes AS (
  SELECT week, CAST(count(*) AS BIGINT) AS k FROM top GROUP BY week
),
pairs AS (
  SELECT s.week, s.k, n.k AS k_next,
         CAST(coalesce(i.overlap, 0) AS BIGINT) AS overlap
  FROM sizes s
  JOIN sizes n ON n.week = s.week + 1
  LEFT JOIN inter i ON i.week = s.week
)
SELECT week, overlap,
       round(CAST(overlap AS DOUBLE)
             / CAST(k + k_next - overlap AS DOUBLE), 6) AS jaccard
FROM pairs
ORDER BY week
"""


# --------------------------------------------------------------------------
# Expected Reciprocal Rank at 10 (Chapelle et al. 2009, CIKM) over the
# NDCG_QUERIES graded rankings — the cascade-model companion to ndcg_eval.
# With grades g in {1,2,3}, R_r = (2^g - 1)/8 is an exact rational, so
# the whole cascade sum ERR = sum_r (1/r) R_r prod_{i<r}(1 - R_i) is
# computed in EXACT BIGINT arithmetic over the common denominator
# D = 2520 * 8^10: the stop-probability numerators (8 - 2^g + ... ) take
# values {7,5,1}, so the running product is 7^a * 5^b looked up from
# prior-rank grade counts (window sums of indicators — no float pow, no
# exp/ln, nothing libm-dependent). One double divide at the end, round 6.
# --------------------------------------------------------------------------
ERR_DENOM = 2520 * 8**NDCG_K
# (2520/r) * 8^(10-r) for rank r, and 7^a / 5^b lookup tables — all exact
_ERR_WP = {r: (2520 // r) * 8 ** (NDCG_K - r) for r in range(1, NDCG_K + 1)}
_POW7 = {i: 7**i for i in range(NDCG_K)}
_POW5 = {i: 5**i for i in range(NDCG_K)}


def q_err_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RUN), F.lit(0))
        ).alias("term"),
    )
    n_df = scalar_count(docs.select("doc_id"))
    wp_map = F.create_map(
        *[F.lit(x) for r, w in _ERR_WP.items() for x in (r, w)]
    )
    p7_map = F.create_map(
        *[F.lit(x) for i, p in _POW7.items() for x in (i, p)]
    )
    p5_map = F.create_map(
        *[F.lit(x) for i, p in _POW5.items() for x in (i, p)]
    )
    out = None
    for qid, terms in sorted(NDCG_QUERIES.items()):
        qtoks = toks.filter(F.col("term").isin(*terms))
        tf = qtoks.groupBy("doc_id", "term").agg(
            F.count(F.lit(1)).cast("long").alias("tf")
        )
        dfd = F.col("doc_frequency").cast("double")
        idf6 = (
            doc_frequencies(qtoks)
            .crossJoin(F.broadcast(n_df))
            .select(
                "term",
                F.round(
                    F.log((F.col("_n") - dfd + 0.5) / (dfd + 0.5) + 1.0)
                    * F.lit(1000000.0),
                    0,
                )
                .cast("long")
                .alias("idf6"),
            )
        )
        per_doc = tf.join(F.broadcast(idf6), "term").groupBy("doc_id").agg(
            F.sum(F.col("tf") * F.col("idf6")).cast("long").alias("score6"),
            F.count(F.lit(1)).cast("long").alias("grade"),
        )
        rw = Window.orderBy(F.desc("score6"), F.asc("doc_id"))
        top = (
            per_doc.withColumn("r", F.row_number().over(rw))
            .filter(F.col("r") <= NDCG_K)
            .select("r", "grade")
        )
        wprior = Window.orderBy("r").rowsBetween(
            Window.unboundedPreceding, -1
        )
        pri = top.select(
            "r",
            "grade",
            F.coalesce(
                F.sum((F.col("grade") == 1).cast("long")).over(wprior),
                F.lit(0),
            ).alias("a"),
            F.coalesce(
                F.sum((F.col("grade") == 2).cast("long")).over(wprior),
                F.lit(0),
            ).alias("b"),
        )
        n_r = (
            F.when(F.col("grade") == 1, 1)
            .when(F.col("grade") == 2, 3)
            .otherwise(7)
            .cast("long")
        )
        term_col = (
            n_r
            * p7_map[F.col("a").cast("int")].cast("long")
            * p5_map[F.col("b").cast("int")].cast("long")
            * wp_map[F.col("r")].cast("long")
        )
        row = pri.agg(
            F.count(F.lit(1)).cast("long").alias("n_ranked"),
            F.coalesce(F.sum(term_col), F.lit(0))
            .cast("long")
            .alias("_s"),
        ).select(
            F.lit(qid).alias("qid"),
            "n_ranked",
            F.round(
                F.col("_s").cast("double") / F.lit(float(ERR_DENOM)), 6
            ).alias("err"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def _err_sql() -> str:
    wp_case = " ".join(f"WHEN {r} THEN {w}" for r, w in _ERR_WP.items())
    p7_case = " ".join(f"WHEN {i} THEN {p}" for i, p in _POW7.items())
    p5_case = " ".join(f"WHEN {i} THEN {p}" for i, p in _POW5.items())
    blocks = []
    for qid, terms in sorted(NDCG_QUERIES.items()):
        tl = ", ".join(f"'{t}'" for t in terms)
        blocks.append(f"""SELECT * FROM (
  WITH qt AS (
    SELECT doc_id, term FROM (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term
      FROM documents
    ) WHERE term IN ({tl})
  ),
  n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
  tf AS (
    SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
    FROM qt GROUP BY 1, 2
  ),
  idf6 AS (
    SELECT term,
           CAST(round(ln((n.n - count(DISTINCT doc_id) + 0.5)
                         / (count(DISTINCT doc_id) + 0.5) + 1.0)
                      * 1000000.0) AS BIGINT) AS idf6
    FROM qt, n GROUP BY term, n.n
  ),
  per_doc AS (
    SELECT doc_id, CAST(sum(tf * idf6) AS BIGINT) AS score6,
           CAST(count(*) AS BIGINT) AS grade
    FROM tf JOIN idf6 USING (term) GROUP BY doc_id
  ),
  top AS (
    SELECT grade,
           row_number() OVER (ORDER BY score6 DESC, doc_id) AS r
    FROM per_doc ORDER BY score6 DESC, doc_id LIMIT {NDCG_K}
  ),
  pri AS (
    SELECT r, grade,
           CAST(COALESCE(sum(CASE WHEN grade = 1 THEN 1 ELSE 0 END)
                 OVER (ORDER BY r
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS BIGINT) AS a,
           CAST(COALESCE(sum(CASE WHEN grade = 2 THEN 1 ELSE 0 END)
                 OVER (ORDER BY r
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS BIGINT) AS b
    FROM top
  ),
  terms AS (
    SELECT CAST(CASE grade WHEN 1 THEN 1 WHEN 2 THEN 3 ELSE 7 END
                AS BIGINT)
           * CAST(CASE a {p7_case} END AS BIGINT)
           * CAST(CASE b {p5_case} END AS BIGINT)
           * CAST(CASE r {wp_case} END AS BIGINT) AS term
    FROM pri
  ),
  agg AS (
    SELECT CAST(count(*) AS BIGINT) AS n_ranked,
           CAST(COALESCE(sum(term), 0) AS BIGINT) AS s
    FROM terms
  )
  SELECT '{qid}' AS qid, n_ranked,
         round(CAST(s AS DOUBLE) / CAST({ERR_DENOM} AS DOUBLE), 6) AS err
  FROM agg
)""")
    return "\nUNION ALL\n".join(blocks)


SQL_ERR_EVAL = _err_sql()
LN2PI_STR = repr(math.log(2.0 * math.pi))


def q_pl2_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    ctf = qtoks.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("ctf")
    )
    tf = qtoks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    ln2 = F.lit(math.log(2.0))
    ln2pi = F.lit(math.log(2.0 * math.pi))
    tfd = F.col("tf").cast("double")
    dld = F.col("dl").cast("double")
    lam = F.col("ctf").cast("double") / F.col("_n")
    tfn = tfd * F.log(F.lit(1.0) + F.col("_avgdl") / dld) / ln2
    contrib = (F.lit(1.0) / (tfn + F.lit(1.0))) * (
        tfn * (F.log(tfn) - F.log(lam))
        + (lam + F.lit(1.0) / (F.lit(12.0) * tfn) - tfn)
        + F.lit(0.5) * (F.log(tfn) + ln2pi)
    )
    c6 = F.round(contrib * F.lit(1000000.0), 0).cast("long")
    return (
        tf.join(F.broadcast(ctf), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(avgdl_df))
        .crossJoin(F.broadcast(n_df))
        .select("doc_id", c6.alias("c6"))
        .groupBy("doc_id")
        .agg(
            F.sum("c6").cast("long").alias("_s6"),
            F.count(F.lit(1)).cast("long").alias("matched_terms"),
        )
        .orderBy(F.desc("_s6"), F.asc("doc_id"))
        .limit(20)
        .select(
            "doc_id",
            F.round(F.col("_s6") / F.lit(1000000.0), 6).alias("pl2_score"),
            "matched_terms",
        )
    )


def _pl2_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in NEWS_QUERY_TERMS)
    ln2 = f"CAST('{LN2_STR}' AS DOUBLE)"
    ln2pi = f"CAST('{LN2PI_STR}' AS DOUBLE)"
    tfn = (
        f"(CAST(tf AS DOUBLE) * ln(1.0 + avgdl / CAST(dl AS DOUBLE))"
        f" / {ln2})"
    )
    lam = "(CAST(ctf AS DOUBLE) / n)"
    contrib = (
        f"(1.0 / ({tfn} + 1.0)) * ({tfn} * (ln({tfn}) - ln({lam}))"
        f" + ({lam} + 1.0 / (12.0 * {tfn}) - {tfn})"
        f" + 0.5 * (ln({tfn}) + {ln2pi}))"
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term
  FROM documents
),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id),
avgdl AS (SELECT avg(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
qt AS (SELECT doc_id, term FROM toks WHERE term IN ({terms})),
ctf AS (SELECT term, CAST(count(*) AS BIGINT) AS ctf FROM qt GROUP BY term),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM qt GROUP BY 1, 2
),
con AS (
  SELECT tf.doc_id,
         CAST(round({contrib} * 1000000.0) AS BIGINT) AS c6
  FROM tf
  JOIN ctf USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id, avgdl, n
)
SELECT doc_id,
       round(CAST(sum(c6) AS BIGINT) / 1000000.0, 6) AS pl2_score,
       CAST(count(*) AS BIGINT) AS matched_terms
FROM con GROUP BY doc_id
ORDER BY CAST(sum(c6) AS BIGINT) DESC, doc_id
LIMIT 20
"""


SQL_PL2_TOPK = _pl2_sql()


# --------------------------------------------------------------------------
# Reciprocal rank + precision@10 over the NDCG_QUERIES rankings with
# ALL-TERMS relevance (a doc is relevant iff it matches every query
# term) — the binary-relevance eval completing ndcg_eval (graded) and
# err_eval (cascade). The first-relevant rank is computed WITHOUT a
# corpus-wide window: it is 1 + count of docs strictly better-ranked
# than the best relevant doc (best = max score6, min doc_id tiebreak —
# two scalar aggregates), so the plan stays aggregate-only at any corpus
# size. rr is the single divide 1/rank; zero-relevant queries report
# rank 0 / rr 0 by an explicit guard spelled identically in both engines.
# --------------------------------------------------------------------------
def q_mrr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RUN), F.lit(0))
        ).alias("term"),
    )
    n_df = scalar_count(docs.select("doc_id"))
    out = None
    for qid, terms in sorted(NDCG_QUERIES.items()):
        m = len(terms)
        qtoks = toks.filter(F.col("term").isin(*terms))
        tf = qtoks.groupBy("doc_id", "term").agg(
            F.count(F.lit(1)).cast("long").alias("tf")
        )
        dfd = F.col("doc_frequency").cast("double")
        idf6 = (
            doc_frequencies(qtoks)
            .crossJoin(F.broadcast(n_df))
            .select(
                "term",
                F.round(
                    F.log((F.col("_n") - dfd + 0.5) / (dfd + 0.5) + 1.0)
                    * F.lit(1000000.0),
                    0,
                )
                .cast("long")
                .alias("idf6"),
            )
        )
        per_doc = tf.join(F.broadcast(idf6), "term").groupBy("doc_id").agg(
            F.sum(F.col("tf") * F.col("idf6")).cast("long").alias("score6"),
            F.count(F.lit(1)).cast("long").alias("grade"),
        ).localCheckpoint(eager=True)
        rel = per_doc.filter(F.col("grade") == m)
        a1 = rel.agg(
            F.max("score6").alias("bs6"),
            F.count(F.lit(1)).cast("long").alias("n_rel"),
        )
        a2 = (
            rel.crossJoin(F.broadcast(a1.select("bs6")))
            .filter(F.col("score6") == F.col("bs6"))
            .agg(F.min("doc_id").alias("bdoc"))
        )
        rk = (
            per_doc.crossJoin(F.broadcast(a1))
            .crossJoin(F.broadcast(a2))
            .agg(
                (
                    F.lit(1)
                    + F.sum(
                        F.when(
                            (F.col("score6") > F.col("bs6"))
                            | (
                                (F.col("score6") == F.col("bs6"))
                                & (F.col("doc_id") < F.col("bdoc"))
                            ),
                            1,
                        ).otherwise(0)
                    )
                )
                .cast("long")
                .alias("_frank")
            )
        )
        top10 = per_doc.orderBy(F.desc("score6"), F.asc("doc_id")).limit(
            NDCG_K
        )
        p10 = top10.agg(
            F.sum(F.when(F.col("grade") == m, 1).otherwise(0))
            .cast("long")
            .alias("_nrel10")
        )
        row = (
            a1.crossJoin(F.broadcast(rk))
            .crossJoin(F.broadcast(p10))
            .select(
                F.lit(qid).alias("qid"),
                "n_rel",
                F.when(F.col("n_rel") == 0, F.lit(0).cast("long"))
                .otherwise(F.col("_frank"))
                .alias("first_rel_rank"),
                F.round(
                    F.when(F.col("n_rel") == 0, F.lit(0.0)).otherwise(
                        F.lit(1.0) / F.col("_frank").cast("double")
                    ),
                    6,
                ).alias("rr"),
                F.round(
                    F.col("_nrel10").cast("double") / F.lit(10.0), 6
                ).alias("p_at_10"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


def _mrr_sql() -> str:
    blocks = []
    for qid, terms in sorted(NDCG_QUERIES.items()):
        m = len(terms)
        tl = ", ".join(f"'{t}'" for t in terms)
        blocks.append(f"""SELECT * FROM (
  WITH qt AS (
    SELECT doc_id, term FROM (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term
      FROM documents
    ) WHERE term IN ({tl})
  ),
  n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
  tf AS (
    SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
    FROM qt GROUP BY 1, 2
  ),
  idf6 AS (
    SELECT term,
           CAST(round(ln((n.n - count(DISTINCT doc_id) + 0.5)
                         / (count(DISTINCT doc_id) + 0.5) + 1.0)
                      * 1000000.0) AS BIGINT) AS idf6
    FROM qt, n GROUP BY term, n.n
  ),
  per_doc AS (
    SELECT doc_id, CAST(sum(tf * idf6) AS BIGINT) AS score6,
           CAST(count(*) AS BIGINT) AS grade
    FROM tf JOIN idf6 USING (term) GROUP BY doc_id
  ),
  rel AS (SELECT * FROM per_doc WHERE grade = {m}),
  a1 AS (
    SELECT max(score6) AS bs6, CAST(count(*) AS BIGINT) AS n_rel FROM rel
  ),
  a2 AS (
    SELECT min(doc_id) AS bdoc FROM rel, a1 WHERE score6 = bs6
  ),
  rk AS (
    SELECT CAST(1 + sum(CASE WHEN p.score6 > a1.bs6
                              OR (p.score6 = a1.bs6 AND p.doc_id < a2.bdoc)
                             THEN 1 ELSE 0 END) AS BIGINT) AS frank
    FROM per_doc p, a1, a2
  ),
  top AS (
    SELECT grade FROM per_doc ORDER BY score6 DESC, doc_id LIMIT {NDCG_K}
  ),
  p10 AS (
    SELECT CAST(sum(CASE WHEN grade = {m} THEN 1 ELSE 0 END) AS BIGINT)
      AS nrel10
    FROM top
  )
  SELECT '{qid}' AS qid, n_rel,
         CASE WHEN n_rel = 0 THEN 0 ELSE frank END AS first_rel_rank,
         round(CASE WHEN n_rel = 0 THEN 0.0
                    ELSE 1.0 / CAST(frank AS DOUBLE) END, 6) AS rr,
         round(CAST(nrel10 AS DOUBLE) / 10.0, 6) AS p_at_10
  FROM a1, rk, p10
)""")
    return "\nUNION ALL\n".join(blocks)


SQL_MRR_EVAL = _mrr_sql()


# --------------------------------------------------------------------------
# Query-term first-occurrence positions — the early-term bias feature a
# ranker adds next to tf (title/lede terms matter more; the reference's
# field weights 3.2/1.7/1.0 encode the same prior): per query term, the
# document frequency, the exact mean first-occurrence token index over
# docs containing it, and the share of docs where it appears within the
# first 50 tokens. First index = min over the posexploded token stream —
# exact BIGINTs everywhere, one divide per ratio.
# --------------------------------------------------------------------------
FIRSTPOS_EARLY = 50


def q_first_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(
            F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RUN), F.lit(0))
        ).alias("pos", "term"),
    ).filter(F.col("term").isin(NEWS_QUERY_TERMS))
    firsts = toks.groupBy("term", "doc_id").agg(
        F.min("pos").cast("long").alias("fp")
    )
    return (
        firsts.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("df"),
            F.sum("fp").cast("long").alias("_sfp"),
            F.sum((F.col("fp") < FIRSTPOS_EARLY).cast("long"))
            .cast("long")
            .alias("_early"),
        )
        .select(
            "term",
            "df",
            F.round(
                F.col("_sfp").cast("double") / F.col("df").cast("double"), 6
            ).alias("mean_first_pos"),
            F.round(
                F.col("_early").cast("double") / F.col("df").cast("double"),
                6,
            ).alias("early_share"),
        )
        .orderBy("term")
    )


def _first_position_sql() -> str:
    tl = ", ".join(f"'{t}'" for t in NEWS_QUERY_TERMS)
    return f"""
WITH toks AS (
  SELECT doc_id, i - 1 AS pos, w[i] AS term
  FROM (
    SELECT doc_id,
           regexp_extract_all(lower(text), '{TOKEN_RUN}') AS w
    FROM documents
  ), unnest(range(1, len(w) + 1)) AS t(i)
  WHERE w[i] IN ({tl})
),
firsts AS (
  SELECT term, doc_id, CAST(min(pos) AS BIGINT) AS fp
  FROM toks GROUP BY term, doc_id
)
SELECT term, CAST(count(*) AS BIGINT) AS df,
       round(CAST(CAST(sum(fp) AS BIGINT) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS mean_first_pos,
       round(CAST(CAST(sum(CASE WHEN fp < {FIRSTPOS_EARLY} THEN 1 ELSE 0
                              END) AS BIGINT) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS early_share
FROM firsts
GROUP BY term
ORDER BY term
"""


SQL_FIRST_POSITION = _first_position_sql()


# --------------------------------------------------------------------------
# Pivoted length-normalization ranking (Singhal/Buckley/Mitra 1996,
# s = 0.2) — the fifth classic ranker next to search_topk's tf-idf,
# bm25_topk, bm25f_topk, ql_topk and pl2_topk, over the same query
# terms: contribution = (1 + ln(1 + ln(tf))) / ((1-s) + s*dl/avgdl)
# * ln((N+1)/df). Double-log tf damping and the pivoted slope are the
# paper's exact form; per-(doc, term) contributions round to fixed6
# BIGINTs and sum exactly (invariant 4); top-20 orders on the integer
# sum with the doc-id tiebreak.
# --------------------------------------------------------------------------
def q_pivoted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    dfreq = doc_frequencies(qtoks)
    tf = qtoks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    tfd = F.col("tf").cast("double")
    idf = F.log(
        (F.col("_n") + F.lit(1.0))
        / F.col("doc_frequency").cast("double")
    )
    stats = dfreq.crossJoin(F.broadcast(n_df)).select(
        "term", idf.alias("idf")
    )
    contrib = (
        (F.lit(1.0) + F.log(F.lit(1.0) + F.log(tfd)))
        / (
            F.lit(0.8)
            + F.lit(0.2) * F.col("dl").cast("double") / F.col("_avgdl")
        )
        * F.col("idf")
    )
    c6 = F.round(contrib * F.lit(1000000.0), 0).cast("long")
    return (
        tf.join(F.broadcast(stats), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(avgdl_df))
        .select("doc_id", c6.alias("c6"))
        .groupBy("doc_id")
        .agg(
            F.sum("c6").cast("long").alias("_s6"),
            F.count(F.lit(1)).cast("long").alias("matched_terms"),
        )
        .orderBy(F.desc("_s6"), F.asc("doc_id"))
        .limit(20)
        .select(
            "doc_id",
            F.round(F.col("_s6") / F.lit(1000000.0), 6).alias(
                "pivoted_score"
            ),
            "matched_terms",
        )
    )


def _pivoted_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in NEWS_QUERY_TERMS)
    contrib = (
        "((1.0 + ln(1.0 + ln(CAST(tf AS DOUBLE))))"
        " / (0.8 + 0.2 * CAST(dl AS DOUBLE) / avgdl)"
        " * ln((n + 1.0) / CAST(df AS DOUBLE)))"
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term
  FROM documents
),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id),
avgdl AS (SELECT avg(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
qt AS (SELECT doc_id, term FROM toks WHERE term IN ({terms})),
dfreq AS (
  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM qt GROUP BY term
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM qt GROUP BY 1, 2
),
con AS (
  SELECT tf.doc_id,
         CAST(round({contrib} * 1000000.0) AS BIGINT) AS c6
  FROM tf
  JOIN dfreq USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id, avgdl, n
)
SELECT doc_id,
       round(CAST(sum(c6) AS BIGINT) / 1000000.0, 6) AS pivoted_score,
       CAST(count(*) AS BIGINT) AS matched_terms
FROM con GROUP BY doc_id
ORDER BY CAST(sum(c6) AS BIGINT) DESC, doc_id
LIMIT 20
"""


SQL_PIVOTED_TOPK = _pivoted_sql()


# --------------------------------------------------------------------------
# Robertson-Sparck Jones relevance weights (1976) with the all-terms
# candidate set as pseudo-relevance judgments — the probabilistic-IR
# term weight BM25's idf degenerates to when R = r = 0, here computed
# with REAL feedback counts: w = ln(((r+0.5)(N-n-R+r+0.5)) /
# ((n-r+0.5)(R-r+0.5))). N, n (term df), R (relevant set size), r
# (relevant docs containing the term) are exact two-phase counts; the
# one ln rounds to 6.
# --------------------------------------------------------------------------
def q_rsj_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RUN), F.lit(0))
        ).alias("term"),
    )
    qtoks = toks.filter(F.col("term").isin(NEWS_QUERY_TERMS)).localCheckpoint(
        eager=True
    )
    n_df = scalar_count(docs, as_double=False)
    per_doc = qtoks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("_hits"),
        F.count_distinct("term").alias("_m"),
    )
    rel = per_doc.filter(F.col("_m") == len(NEWS_QUERY_TERMS)).select(
        "doc_id"
    ).localCheckpoint(eager=True)
    r_df = rel.agg(F.count(F.lit(1)).cast("long").alias("_r"))
    dfreq = doc_frequencies(qtoks)
    rterm = (
        qtoks.join(F.broadcast(rel), "doc_id")
        .groupBy("term", "doc_id")
        .agg(F.lit(1).alias("_o"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("r"))
    )
    j = (
        dfreq.join(rterm, "term", "left")
        .crossJoin(F.broadcast(n_df))
        .crossJoin(F.broadcast(r_df))
        .select(
            "term",
            F.col("doc_frequency").cast("long").alias("n_term"),
            F.coalesce("r", F.lit(0)).cast("long").alias("r"),
            F.col("_n").cast("long").alias("n_docs"),
            F.col("_r").alias("n_rel"),
        )
    )
    rd = F.col("r").cast("double")
    nd = F.col("n_docs").cast("double")
    ntd = F.col("n_term").cast("double")
    rrd = F.col("n_rel").cast("double")
    w = F.log(
        ((rd + 0.5) * (nd - ntd - rrd + rd + 0.5))
        / ((ntd - rd + 0.5) * (rrd - rd + 0.5))
    )
    return j.select(
        "term",
        "n_term",
        "r",
        "n_rel",
        F.round(w, 6).alias("rsj_weight"),
    ).orderBy("term")


def _rsj_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in NEWS_QUERY_TERMS)
    m = len(NEWS_QUERY_TERMS)
    return f"""
WITH qt AS (
  SELECT doc_id, term FROM (
    SELECT doc_id,
           unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term
    FROM documents
  ) WHERE term IN ({terms})
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
rel AS (
  SELECT doc_id FROM qt GROUP BY doc_id
  HAVING count(DISTINCT term) = {m}
),
rr AS (SELECT CAST(count(*) AS BIGINT) AS r FROM rel),
dfreq AS (
  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_term
  FROM qt GROUP BY term
),
rterm AS (
  SELECT term, CAST(count(DISTINCT qt.doc_id) AS BIGINT) AS r
  FROM qt JOIN rel USING (doc_id)
  GROUP BY term
)
SELECT d.term, d.n_term,
       CAST(COALESCE(rt.r, 0) AS BIGINT) AS r,
       rr.r AS n_rel,
       round(ln(((CAST(COALESCE(rt.r, 0) AS DOUBLE) + 0.5)
                 * (CAST(nn.n AS DOUBLE) - CAST(d.n_term AS DOUBLE)
                    - CAST(rr.r AS DOUBLE)
                    + CAST(COALESCE(rt.r, 0) AS DOUBLE) + 0.5))
                / ((CAST(d.n_term AS DOUBLE)
                    - CAST(COALESCE(rt.r, 0) AS DOUBLE) + 0.5)
                   * (CAST(rr.r AS DOUBLE)
                      - CAST(COALESCE(rt.r, 0) AS DOUBLE) + 0.5))), 6)
         AS rsj_weight
FROM dfreq d LEFT JOIN rterm rt USING (term), nn, rr
ORDER BY term
"""


SQL_RSJ_WEIGHTS = _rsj_sql()


# --------------------------------------------------------------------------
# BM25 k1-parameter sweep (tf-saturation tuning, the companion to
# bm25_b_sweep's length-normalization sweep): rank-1 doc and score per
# k1 in an exactly-binary-representable grid (0.5, 1.0, 1.25, 1.5, 2.0)
# at b = 0.75 — low k1 saturates tf immediately (near-boolean), high k1
# keeps rewarding repeats. Same discipline as the b-sweep: broadcast
# local grid crossed onto per-(doc, term) contributions, per-k1 argmax
# via row_number on the rounded score with the doc tiebreak.
# --------------------------------------------------------------------------
K1_SWEEP_GRID = (0.5, 1.0, 1.25, 1.5, 2.0)


def q_k1_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RUN), F.lit(0))
        ).alias("term"),
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    avgdl_df = dl.agg(F.avg(F.col("dl").cast("double")).alias("_avgdl"))
    qtoks = toks.filter(F.col("term").isin(NEWS_QUERY_TERMS))
    dfd = F.col("doc_frequency").cast("double")
    stats = (
        doc_frequencies(qtoks)
        .crossJoin(F.broadcast(scalar_count(docs)))
        .withColumn(
            "idf", F.log((F.col("_n") - dfd + 0.5) / (dfd + 0.5) + 1.0)
        )
        .select("term", "idf")
    )
    tf = qtoks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    grid = spark.createDataFrame(
        [(k,) for k in K1_SWEEP_GRID], "k1 double"
    )
    tfd = F.col("tf").cast("double")
    norm = F.col("k1") * (
        1.0
        - BM25_B
        + F.lit(BM25_B) * F.col("dl").cast("double") / F.col("_avgdl")
    )
    contrib = F.coalesce("idf", F.lit(1.0)) * (
        tfd * (F.col("k1") + 1.0) / (tfd + norm)
    )
    scored = (
        tf.join(F.broadcast(stats), "term", "left")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(avgdl_df))
        .crossJoin(F.broadcast(grid))
        .groupBy("k1", "doc_id")
        .agg(F.round(F.sum(contrib), 6).alias("score"))
    )
    w = Window.partitionBy("k1").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "k1",
            F.col("doc_id").alias("top_doc"),
            F.col("score").alias("top_score"),
        )
    )


def _k1_sweep_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in NEWS_QUERY_TERMS)
    grid = ", ".join(str(k) for k in K1_SWEEP_GRID)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term
  FROM documents
),
n AS (SELECT count(*)::DOUBLE AS n FROM documents),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
avgdl AS (SELECT avg(dl::DOUBLE) AS avgdl FROM dl),
stats AS (
  SELECT term,
         ln((n.n - count(DISTINCT doc_id) + 0.5)
            / (count(DISTINCT doc_id) + 0.5) + 1.0) AS idf
  FROM toks, n GROUP BY term, n.n
),
tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM toks WHERE term IN ({terms})
  GROUP BY doc_id, term
),
grid AS (SELECT unnest([{grid}])::DOUBLE AS k1),
scored AS (
  SELECT g.k1, tf.doc_id,
         round(sum(COALESCE(stats.idf, 1.0)
               * (tf.tf::DOUBLE * (g.k1 + 1.0)
                  / (tf.tf::DOUBLE + g.k1 * (1.0 - {BM25_B} + {BM25_B}
                     * dl.dl::DOUBLE / avgdl.avgdl)))), 6) AS score
  FROM tf
  LEFT JOIN stats ON stats.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id, avgdl, grid g
  GROUP BY g.k1, tf.doc_id
),
ranked AS (
  SELECT k1, doc_id, score,
         row_number()
           OVER (PARTITION BY k1 ORDER BY score DESC, doc_id ASC) AS rn
  FROM scored
)
SELECT k1, doc_id AS top_doc, score AS top_score FROM ranked WHERE rn = 1
"""


SQL_K1_SWEEP = _k1_sweep_sql()


# --------------------------------------------------------------------------
# Mean Average Precision over the NDCG_QUERIES rankings with all-terms
# relevance — completing the eval family (ndcg_eval graded, err_eval
# cascade, mrr_eval first-hit): AP = mean over relevant docs of
# precision@their-rank. Window-free like mrr_eval: each relevant doc's
# rank and its relevant-prefix count come from one bounded rel x all
# comparison join (|rel| is small by construction), precision terms are
# exact rationals rounded to fixed6 BIGINTs before the exact sum, one
# divide per query.
# --------------------------------------------------------------------------
def q_map_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RUN), F.lit(0))
        ).alias("term"),
    )
    n_df = scalar_count(docs.select("doc_id"))
    out = None
    for qid, terms in sorted(NDCG_QUERIES.items()):
        m = len(terms)
        qtoks = toks.filter(F.col("term").isin(*terms))
        tf = qtoks.groupBy("doc_id", "term").agg(
            F.count(F.lit(1)).cast("long").alias("tf")
        )
        dfd = F.col("doc_frequency").cast("double")
        idf6 = (
            doc_frequencies(qtoks)
            .crossJoin(F.broadcast(n_df))
            .select(
                "term",
                F.round(
                    F.log((F.col("_n") - dfd + 0.5) / (dfd + 0.5) + 1.0)
                    * F.lit(1000000.0),
                    0,
                )
                .cast("long")
                .alias("idf6"),
            )
        )
        per_doc = tf.join(F.broadcast(idf6), "term").groupBy("doc_id").agg(
            F.sum(F.col("tf") * F.col("idf6")).cast("long").alias("score6"),
            F.count(F.lit(1)).cast("long").alias("grade"),
        ).localCheckpoint(eager=True)
        rel = per_doc.filter(F.col("grade") == m).select(
            F.col("doc_id").alias("rdoc"),
            F.col("score6").alias("rs6"),
        )
        better = (
            rel.join(
                per_doc,
                (F.col("score6") > F.col("rs6"))
                | (
                    (F.col("score6") == F.col("rs6"))
                    & (F.col("doc_id") < F.col("rdoc"))
                ),
                "left",
            )
            .groupBy("rdoc")
            .agg(
                F.sum(F.col("doc_id").isNotNull().cast("long"))
                .cast("long")
                .alias("n_above"),
                F.sum(
                    (
                        F.col("doc_id").isNotNull()
                        & (F.col("grade") == m)
                    ).cast("long")
                )
                .cast("long")
                .alias("n_rel_above"),
            )
        )
        prec6 = F.round(
            (F.col("n_rel_above") + 1).cast("double")
            / (F.col("n_above") + 1).cast("double")
            * F.lit(1000000.0),
            0,
        ).cast("long")
        row = better.agg(
            F.count(F.lit(1)).cast("long").alias("n_rel"),
            F.coalesce(F.sum(prec6), F.lit(0)).cast("long").alias("_sp6"),
        ).select(
            F.lit(qid).alias("qid"),
            "n_rel",
            F.round(
                F.when(F.col("n_rel") == 0, F.lit(0.0)).otherwise(
                    F.col("_sp6").cast("double")
                    / F.lit(1000000.0)
                    / F.col("n_rel").cast("double")
                ),
                6,
            ).alias("avg_precision"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def _map_sql() -> str:
    blocks = []
    for qid, terms in sorted(NDCG_QUERIES.items()):
        m = len(terms)
        tl = ", ".join(f"'{t}'" for t in terms)
        blocks.append(f"""SELECT * FROM (
  WITH qt AS (
    SELECT doc_id, term FROM (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term
      FROM documents
    ) WHERE term IN ({tl})
  ),
  n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
  tf AS (
    SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
    FROM qt GROUP BY 1, 2
  ),
  idf6 AS (
    SELECT term,
           CAST(round(ln((n.n - count(DISTINCT doc_id) + 0.5)
                         / (count(DISTINCT doc_id) + 0.5) + 1.0)
                      * 1000000.0) AS BIGINT) AS idf6
    FROM qt, n GROUP BY term, n.n
  ),
  per_doc AS (
    SELECT doc_id, CAST(sum(tf * idf6) AS BIGINT) AS score6,
           CAST(count(*) AS BIGINT) AS grade
    FROM tf JOIN idf6 USING (term) GROUP BY doc_id
  ),
  rel AS (
    SELECT doc_id AS rdoc, score6 AS rs6 FROM per_doc WHERE grade = {m}
  ),
  better AS (
    SELECT r.rdoc,
           CAST(sum(CASE WHEN p.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_above,
           CAST(sum(CASE WHEN p.doc_id IS NOT NULL AND p.grade = {m}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_rel_above
    FROM rel r
    LEFT JOIN per_doc p
      ON p.score6 > r.rs6
         OR (p.score6 = r.rs6 AND p.doc_id < r.rdoc)
    GROUP BY r.rdoc
  ),
  agg AS (
    SELECT CAST(count(*) AS BIGINT) AS n_rel,
           CAST(COALESCE(sum(CAST(round(CAST(n_rel_above + 1 AS DOUBLE)
                    / CAST(n_above + 1 AS DOUBLE) * 1000000.0)
                    AS BIGINT)), 0) AS BIGINT) AS sp6
    FROM better
  )
  SELECT '{qid}' AS qid, n_rel,
         round(CASE WHEN n_rel = 0 THEN 0.0
                    ELSE CAST(sp6 AS DOUBLE) / 1000000.0
                         / CAST(n_rel AS DOUBLE) END, 6) AS avg_precision
  FROM agg
)""")
    return "\nUNION ALL\n".join(blocks)


SQL_MAP_EVAL = _map_sql()


# --------------------------------------------------------------------------
# idf-variant comparison table for the query vocabulary: the BM25/RSJ
# smoothed idf (the engine's formula), Croft-Harper probabilistic idf
# ln((N-n)/n), and classic Sparck Jones ln(N/n), side by side per term —
# the table that explains WHY the +0.5-smoothed form exists (the
# probabilistic one goes negative past df > N/2, the classic one never
# saturates). Counts exact; one ln per variant rounded 6.
# --------------------------------------------------------------------------
def q_idf_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RUN), F.lit(0))
        ).alias("term"),
    )
    qtoks = toks.filter(F.col("term").isin(NEWS_QUERY_TERMS))
    n_df = scalar_count(docs)
    dfd = F.col("doc_frequency").cast("double")
    nd = F.col("_n")
    return (
        doc_frequencies(qtoks)
        .crossJoin(F.broadcast(n_df))
        .select(
            "term",
            F.col("doc_frequency").cast("long").alias("df"),
            F.round(
                F.log((nd - dfd + 0.5) / (dfd + 0.5) + 1.0), 6
            ).alias("idf_bm25"),
            F.round(F.log((nd - dfd) / dfd), 6).alias("idf_prob"),
            F.round(F.log(nd / dfd), 6).alias("idf_classic"),
        )
        .orderBy("term")
    )


def _idf_variants_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in NEWS_QUERY_TERMS)
    return f"""
WITH qt AS (
  SELECT doc_id, term FROM (
    SELECT doc_id,
           unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term
    FROM documents
  ) WHERE term IN ({terms})
),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
dfreq AS (
  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM qt GROUP BY term
)
SELECT term, df,
       round(ln((n.n - CAST(df AS DOUBLE) + 0.5)
                / (CAST(df AS DOUBLE) + 0.5) + 1.0), 6) AS idf_bm25,
       round(ln((n.n - CAST(df AS DOUBLE)) / CAST(df AS DOUBLE)), 6)
         AS idf_prob,
       round(ln(n.n / CAST(df AS DOUBLE)), 6) AS idf_classic
FROM dfreq, n
ORDER BY term
"""


SQL_IDF_VARIANTS = _idf_variants_sql()


# --------------------------------------------------------------------------
# SMART ltc.lnc cosine ranking (Salton/Buckley 1988; the VSM baseline
# that preceded BM25): document vectors weight every term as
# (1 + ln tf) * idf and normalize by the FULL-document L2 norm — the
# norm covers all terms, not just query terms, which is the
# two-pass shape a real VSM index maintains. Per-(doc, term) weights
# round to fixed6 BIGINTs; the norm is sqrt of an exact integer
# square-sum (ordered by construction); the query side uses unit
# weights. Top-20 on the rounded cosine with the doc tiebreak.
# --------------------------------------------------------------------------
def q_smart_ltc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RUN), F.lit(0))
        ).alias("term"),
    )
    n_df = scalar_count(docs)
    tf_all = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    dfd = F.col("doc_frequency").cast("double")
    idf_all = (
        doc_frequencies(toks)
        .crossJoin(F.broadcast(n_df))
        .select(
            "term",
            F.log(F.col("_n") / dfd).alias("idf"),
        )
    )
    w6 = F.round(
        (F.lit(1.0) + F.log(F.col("tf").cast("double")))
        * F.col("idf")
        * F.lit(1000000.0),
        0,
    ).cast("long")
    weighted = tf_all.join(idf_all, "term").select(
        "doc_id", "term", w6.alias("w6")
    ).localCheckpoint(eager=True)
    norms = weighted.groupBy("doc_id").agg(
        F.sum(F.col("w6") * F.col("w6")).cast("long").alias("nsq")
    )
    qw = weighted.filter(F.col("term").isin(NEWS_QUERY_TERMS))
    dots = qw.groupBy("doc_id").agg(
        F.sum("w6").cast("long").alias("dot6"),
        F.count(F.lit(1)).cast("long").alias("matched_terms"),
    )
    cos = F.col("dot6").cast("double") / F.sqrt(
        F.col("nsq").cast("double")
    )
    scored = dots.join(norms, "doc_id").select(
        "doc_id",
        F.round(cos, 6).alias("cosine"),
        "matched_terms",
    )
    return scored.orderBy(F.desc("cosine"), F.asc("doc_id")).limit(20)


def _smart_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in NEWS_QUERY_TERMS)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term
  FROM documents
),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY 1, 2
),
idf AS (
  SELECT term, ln(n.n / CAST(count(DISTINCT doc_id) AS DOUBLE)) AS idf
  FROM toks, n GROUP BY term, n.n
),
weighted AS (
  SELECT tf.doc_id, tf.term,
         CAST(round((1.0 + ln(CAST(tf.tf AS DOUBLE))) * idf.idf
                    * 1000000.0) AS BIGINT) AS w6
  FROM tf JOIN idf USING (term)
),
norms AS (
  SELECT doc_id, CAST(sum(w6 * w6) AS BIGINT) AS nsq
  FROM weighted GROUP BY doc_id
),
dots AS (
  SELECT doc_id, CAST(sum(w6) AS BIGINT) AS dot6,
         CAST(count(*) AS BIGINT) AS matched_terms
  FROM weighted WHERE term IN ({terms})
  GROUP BY doc_id
)
SELECT d.doc_id,
       round(CAST(d.dot6 AS DOUBLE) / sqrt(CAST(n2.nsq AS DOUBLE)), 6)
         AS cosine,
       d.matched_terms
FROM dots d JOIN norms n2 USING (doc_id)
ORDER BY cosine DESC, doc_id
LIMIT 20
"""


SQL_SMART_LTC_TOPK = _smart_sql()


# --------------------------------------------------------------------------
# Residual idf (Church & Gale 1995): observed idf ln(N/df) minus the
# idf a Poisson term of the same collection frequency would have,
# -ln(1 - exp(-ctf/N)) — positive residual = the term is burstier than
# Poisson (content-bearing), ~0 = function-word-like. The one exp/ln
# composition is evaluated on identical doubles built from exact
# BIGINT counts (the rmst precedent for exp) and every output rounds
# to 6; top-20 terms by collection frequency.
# --------------------------------------------------------------------------
RIDF_TOP = 20


def q_residual_idf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(WORD_RUN), F.lit(0))
        ).alias("term"),
    )
    n_df = scalar_count(docs)
    stats = doc_frequencies(toks, with_ctf=True)
    wtop = Window.orderBy(F.desc("ctf"), F.asc("term"))
    top = (
        stats.withColumn("_rn", F.row_number().over(wtop))
        .filter(F.col("_rn") <= RIDF_TOP)
        .crossJoin(F.broadcast(n_df))
    )
    dfd = F.col("doc_frequency").cast("double")
    lam = F.col("ctf").cast("double") / F.col("_n")
    obs = F.log(F.col("_n") / dfd)
    pois = -F.log(F.lit(1.0) - F.exp(-lam))
    return top.select(
        "term",
        F.col("doc_frequency").cast("long").alias("df"),
        F.col("ctf").cast("long").alias("ctf"),
        F.round(obs, 6).alias("idf_observed"),
        F.round(pois, 6).alias("idf_poisson"),
        F.round(obs - pois, 6).alias("residual_idf"),
    ).orderBy(F.desc("ctf"), F.asc("term"))


SQL_RESIDUAL_IDF = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{WORD_RUN}')) AS term
  FROM documents
),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
stats AS (
  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
         CAST(count(*) AS BIGINT) AS ctf
  FROM toks GROUP BY term
),
top AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (ORDER BY ctf DESC, term) AS rn
    FROM stats)
  WHERE rn <= {RIDF_TOP}
)
SELECT term, df, ctf,
       round(ln(n.n / CAST(df AS DOUBLE)), 6) AS idf_observed,
       round(-ln(1.0 - exp(-(CAST(ctf AS DOUBLE) / n.n))), 6)
         AS idf_poisson,
       round(ln(n.n / CAST(df AS DOUBLE))
             - (-ln(1.0 - exp(-(CAST(ctf AS DOUBLE) / n.n)))), 6)
         AS residual_idf
FROM top, n
ORDER BY ctf DESC, term
"""


# --------------------------------------------------------------------------
# Kendall's W coefficient of concordance (Kendall & Babington Smith
# 1939) across the THREE rankers' orderings of the shared candidate set
# — tf-sum, fixed6 BM25 and fixed6 QL-style weighted tf, each ranked by
# (score desc, doc_id asc) so ranks are strict permutations (the
# tiebreak IS the ranking rule — no tie correction needed). W computes
# EXACTLY: with D_i = 2*sum-of-ranks_i - m(n+1), W = sum(D²)/(3(n³-n))
# for m = 3 — all BIGINT until the single final divide. The
# beyond-pairwise agreement audit completing rank_correlation
# (Spearman) and rank_overlap (RBO).
# --------------------------------------------------------------------------
def q_kendall_w(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    bm25c6 = F.round(
        F.col("idf")
        * (tfd * (BM25_K1 + 1.0) / (tfd + norm))
        * F.lit(1000000.0),
        0,
    ).cast("long")
    wtf6 = F.round(tfd * F.col("idf") * F.lit(1000000.0), 0).cast("long")
    per_doc = (
        tf.join(F.broadcast(stats), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(avgdl_df))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("s_tf"),
            F.sum(bm25c6).cast("long").alias("s_bm25"),
            F.sum(wtf6).cast("long").alias("s_wtf"),
        )
        .localCheckpoint(eager=True)
    )
    ranked = per_doc
    for col in ("s_tf", "s_bm25", "s_wtf"):
        w = Window.orderBy(F.desc(col), F.asc("doc_id"))
        ranked = ranked.withColumn(
            f"r_{col}", F.row_number().over(w).cast("long")
        )
    rsum = ranked.select(
        "doc_id",
        (F.col("r_s_tf") + F.col("r_s_bm25") + F.col("r_s_wtf")).alias(
            "rsum"
        ),
    )
    nn = rsum.agg(F.count(F.lit(1)).cast("long").alias("n"))
    agg = (
        rsum.crossJoin(F.broadcast(nn))
        .select(
            "n",
            (
                (F.lit(2) * F.col("rsum") - F.lit(3) * (F.col("n") + 1))
                * (F.lit(2) * F.col("rsum") - F.lit(3) * (F.col("n") + 1))
            ).alias("d2"),
        )
        .groupBy("n")
        .agg(F.sum("d2").cast("long").alias("sd2"))
    )
    nd = F.col("n").cast("double")
    return agg.select(
        F.col("n").alias("n_candidates"),
        F.round(
            F.col("sd2").cast("double")
            / (F.lit(3.0) * (nd * nd * nd - nd)),
            6,
        ).alias("kendall_w"),
    )


def _kendall_w_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in NEWS_QUERY_TERMS)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term
  FROM documents
),
n AS (SELECT count(*)::DOUBLE AS n FROM documents),
dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id),
avgdl AS (SELECT avg(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
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
  SELECT tf.doc_id,
         CAST(sum(tf.tf) AS BIGINT) AS s_tf,
         CAST(sum(CAST(round(stats.idf * (CAST(tf.tf AS DOUBLE)
               * ({BM25_K1} + 1.0) / (CAST(tf.tf AS DOUBLE)
                  + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B}
                     * CAST(dl.dl AS DOUBLE) / avgdl.avgdl)))
               * 1000000.0) AS BIGINT)) AS BIGINT) AS s_bm25,
         CAST(sum(CAST(round(CAST(tf.tf AS DOUBLE) * stats.idf
               * 1000000.0) AS BIGINT)) AS BIGINT) AS s_wtf
  FROM tf
  JOIN stats USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id, avgdl
  GROUP BY tf.doc_id
),
ranked AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY s_tf DESC, doc_id) AS BIGINT)
           + CAST(row_number() OVER (ORDER BY s_bm25 DESC, doc_id) AS BIGINT)
           + CAST(row_number() OVER (ORDER BY s_wtf DESC, doc_id) AS BIGINT)
           AS rsum
  FROM per_doc
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ranked),
agg AS (
  SELECT nn.n,
         CAST(sum((2 * rsum - 3 * (nn.n + 1))
                  * (2 * rsum - 3 * (nn.n + 1))) AS BIGINT) AS sd2
  FROM ranked, nn GROUP BY nn.n
)
SELECT n AS n_candidates,
       round(CAST(sd2 AS DOUBLE)
             / (3.0 * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                       * CAST(n AS DOUBLE) - CAST(n AS DOUBLE))), 6)
         AS kendall_w
FROM agg
"""


SQL_KENDALL_W = _kendall_w_sql()


# --------------------------------------------------------------------------
# Retrieval exposure bias by source (the provider-fairness audit Singh &
# Joachims 2018 formalized): each source's share of the BM25 top-50
# versus its corpus share, and the disparity ratio — ranking amplifies
# sources whose documents score high, and this table quantifies by how
# much. Top-50 selection is the fixed6-integer BM25 ordering (ties by
# doc_id); all shares are exact-count divides, disparity one more,
# everything rounded 6.
# --------------------------------------------------------------------------
EXPOSURE_K = 50


def q_exposure_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    c6 = F.round(
        F.col("idf")
        * (tfd * (BM25_K1 + 1.0) / (tfd + norm))
        * F.lit(1000000.0),
        0,
    ).cast("long")
    topk = (
        tf.join(F.broadcast(stats), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(avgdl_df))
        .groupBy("doc_id")
        .agg(F.sum(c6).cast("long").alias("s6"))
        .orderBy(F.desc("s6"), F.asc("doc_id"))
        .limit(EXPOSURE_K)
        .join(docs.select("doc_id", "source"), "doc_id")
    )
    top_share = topk.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_top")
    )
    corpus = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_corpus")
    )
    tot = corpus.agg(F.sum("n_corpus").cast("long").alias("_nc"))
    return (
        corpus.join(top_share, "source", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_corpus",
            F.coalesce("n_top", F.lit(0)).cast("long").alias("n_top"),
            F.round(
                F.col("n_corpus").cast("double")
                / F.col("_nc").cast("double"),
                6,
            ).alias("corpus_share"),
            F.round(
                F.coalesce("n_top", F.lit(0)).cast("double")
                / F.lit(float(EXPOSURE_K)),
                6,
            ).alias("top_share"),
            F.round(
                (
                    F.coalesce("n_top", F.lit(0)).cast("double")
                    / F.lit(float(EXPOSURE_K))
                )
                / (
                    F.col("n_corpus").cast("double")
                    / F.col("_nc").cast("double")
                ),
                6,
            ).alias("disparity"),
        )
        .orderBy("source")
    )


def _exposure_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in NEWS_QUERY_TERMS)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term
  FROM documents
),
n AS (SELECT count(*)::DOUBLE AS n FROM documents),
dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id),
avgdl AS (SELECT avg(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
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
topk AS (
  SELECT tf.doc_id
  FROM tf
  JOIN stats USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id, avgdl
  GROUP BY tf.doc_id
  ORDER BY CAST(sum(CAST(round(stats.idf * (CAST(tf.tf AS DOUBLE)
              * ({BM25_K1} + 1.0) / (CAST(tf.tf AS DOUBLE)
                 + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B}
                    * CAST(dl.dl AS DOUBLE) / avgdl.avgdl)))
              * 1000000.0) AS BIGINT)) AS BIGINT) DESC, tf.doc_id
  LIMIT {EXPOSURE_K}
),
tops AS (
  SELECT d.source, CAST(count(*) AS BIGINT) AS n_top
  FROM topk t JOIN documents d USING (doc_id)
  GROUP BY d.source
),
corpus AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_corpus
  FROM documents GROUP BY source
),
tot AS (SELECT CAST(sum(n_corpus) AS BIGINT) AS nc FROM corpus)
SELECT c.source, c.n_corpus,
       CAST(COALESCE(t.n_top, 0) AS BIGINT) AS n_top,
       round(CAST(c.n_corpus AS DOUBLE) / CAST(tot.nc AS DOUBLE), 6)
         AS corpus_share,
       round(CAST(COALESCE(t.n_top, 0) AS DOUBLE) / {EXPOSURE_K}.0, 6)
         AS top_share,
       round((CAST(COALESCE(t.n_top, 0) AS DOUBLE) / {EXPOSURE_K}.0)
             / (CAST(c.n_corpus AS DOUBLE) / CAST(tot.nc AS DOUBLE)), 6)
         AS disparity
FROM corpus c LEFT JOIN tops t USING (source), tot
ORDER BY source
"""


SQL_EXPOSURE_BIAS = _exposure_sql()


# --------------------------------------------------------------------------
# NQC post-retrieval query-performance predictor (Shtok/Kurland/Carmel
# 2012): the standard deviation of the top-50 BM25 scores normalized by
# the query's collection-level score — high score dispersion at the top
# predicts an easy query, flat tops predict drift. Per query: exact
# fixed6-BIGINT score moments of the top-k (no float accumulation), the
# collection score as a fixed6 mean over all candidates, one
# sqrt-and-divide per query, rounded 6.
# --------------------------------------------------------------------------
def q_nqc_predictor(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    out = None
    for qid, terms in sorted(NDCG_QUERIES.items()):
        qtoks = toks.filter(F.col("term").isin(*terms))
        dfd = F.col("doc_frequency").cast("double")
        stats = (
            doc_frequencies(qtoks)
            .crossJoin(F.broadcast(n_df))
            .withColumn(
                "idf",
                F.log((F.col("_n") - dfd + 0.5) / (dfd + 0.5) + 1.0),
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
        c6 = F.round(
            F.col("idf")
            * (tfd * (BM25_K1 + 1.0) / (tfd + norm))
            * F.lit(1000000.0),
            0,
        ).cast("long")
        per_doc = (
            tf.join(F.broadcast(stats), "term")
            .join(dl, "doc_id")
            .crossJoin(F.broadcast(avgdl_df))
            .groupBy("doc_id")
            .agg(F.sum(c6).cast("long").alias("s6"))
            .localCheckpoint(eager=True)
        )
        coll = per_doc.agg(
            F.count(F.lit(1)).cast("long").alias("n_cand"),
            F.sum("s6").cast("long").alias("ssum"),
        )
        top = per_doc.orderBy(F.desc("s6"), F.asc("doc_id")).limit(
            EXPOSURE_K
        )
        tagg = top.agg(
            F.count(F.lit(1)).cast("long").alias("k"),
            F.sum("s6").cast("long").alias("ts"),
            # exact BIGINT power sum (top-50 fixed6 scores: ~2.5e15 per
            # addend, ~1.25e17 total — far below 2^63), so the
            # tss - k*mu*mu cancellation sees identical inputs on both
            # engines regardless of aggregation order (invariant 4)
            F.sum(F.col("s6") * F.col("s6")).cast("long").alias("tss"),
        )
        kd = F.col("k").cast("double")
        mu = F.col("ts").cast("double") / kd
        var = (F.col("tss").cast("double") - kd * mu * mu) / kd
        collmean = F.col("ssum").cast("double") / F.col("n_cand").cast(
            "double"
        )
        row = tagg.crossJoin(F.broadcast(coll)).select(
            F.lit(qid).alias("qid"),
            "n_cand",
            "k",
            F.round(F.sqrt(var) / collmean, 6).alias("nqc"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def _nqc_sql() -> str:
    blocks = []
    for qid, terms in sorted(NDCG_QUERIES.items()):
        tl = ", ".join(f"'{t}'" for t in terms)
        blocks.append(f"""SELECT * FROM (
  WITH toks AS (
    SELECT doc_id,
           unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term
    FROM documents
  ),
  n AS (SELECT count(*)::DOUBLE AS n FROM documents),
  dl AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id
  ),
  avgdl AS (SELECT avg(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
  qt AS (SELECT doc_id, term FROM toks WHERE term IN ({tl})),
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
    SELECT tf.doc_id,
           CAST(sum(CAST(round(stats.idf * (CAST(tf.tf AS DOUBLE)
                 * ({BM25_K1} + 1.0) / (CAST(tf.tf AS DOUBLE)
                    + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B}
                       * CAST(dl.dl AS DOUBLE) / avgdl.avgdl)))
                 * 1000000.0) AS BIGINT)) AS BIGINT) AS s6
    FROM tf
    JOIN stats USING (term)
    JOIN dl ON dl.doc_id = tf.doc_id, avgdl
    GROUP BY tf.doc_id
  ),
  coll AS (
    SELECT CAST(count(*) AS BIGINT) AS n_cand,
           CAST(sum(s6) AS BIGINT) AS ssum
    FROM per_doc
  ),
  top AS (
    SELECT s6 FROM per_doc ORDER BY s6 DESC, doc_id LIMIT {EXPOSURE_K}
  ),
  tagg AS (
    SELECT CAST(count(*) AS BIGINT) AS k,
           CAST(sum(s6) AS BIGINT) AS ts,
           CAST(sum(s6 * s6) AS BIGINT) AS tss
    FROM top
  )
  SELECT '{qid}' AS qid, coll.n_cand, tagg.k,
         round(sqrt((CAST(tss AS DOUBLE) - CAST(k AS DOUBLE)
                     * (CAST(ts AS DOUBLE) / CAST(k AS DOUBLE))
                     * (CAST(ts AS DOUBLE) / CAST(k AS DOUBLE)))
                    / CAST(k AS DOUBLE))
               / (CAST(ssum AS DOUBLE) / CAST(n_cand AS DOUBLE)), 6)
           AS nqc
  FROM tagg, coll
)""")
    return "\nUNION ALL\n".join(blocks)


SQL_NQC_PREDICTOR = _nqc_sql()


# --------------------------------------------------------------------------
# Success@k across the three rankers (raw tf-sum, fixed6 BM25, fixed6
# weighted-tf) with all-terms relevance: for every (query, ranker), the
# first-relevant rank (window-free, the mrr_eval trick) and whether a
# fully-matching doc appears at rank 1 / by 5 / by 10 — the head-to-head
# table showing what BM25's saturation+normalization buys over raw tf.
# One shared fixed6 per-doc score relation per query; ranks are strict
# (integer score, doc-id tiebreak); every output exact.
# --------------------------------------------------------------------------
def q_success_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    out = None
    for qid, terms in sorted(NDCG_QUERIES.items()):
        m = len(terms)
        qtoks = toks.filter(F.col("term").isin(*terms))
        dfd = F.col("doc_frequency").cast("double")
        stats = (
            doc_frequencies(qtoks)
            .crossJoin(F.broadcast(n_df))
            .withColumn(
                "idf",
                F.log((F.col("_n") - dfd + 0.5) / (dfd + 0.5) + 1.0),
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
        bm25c6 = F.round(
            F.col("idf")
            * (tfd * (BM25_K1 + 1.0) / (tfd + norm))
            * F.lit(1000000.0),
            0,
        ).cast("long")
        wtf6 = F.round(tfd * F.col("idf") * F.lit(1000000.0), 0).cast(
            "long"
        )
        per_doc = (
            tf.join(F.broadcast(stats), "term")
            .join(dl, "doc_id")
            .crossJoin(F.broadcast(avgdl_df))
            .groupBy("doc_id")
            .agg(
                F.sum("tf").cast("long").alias("s_tf"),
                F.sum(bm25c6).cast("long").alias("s_bm25"),
                F.sum(wtf6).cast("long").alias("s_wtf"),
                F.count(F.lit(1)).cast("long").alias("grade"),
            )
            .localCheckpoint(eager=True)
        )
        for ranker in ("s_tf", "s_bm25", "s_wtf"):
            rel = per_doc.filter(F.col("grade") == m).select(
                F.col("doc_id").alias("rdoc"),
                F.col(ranker).alias("rs"),
            )
            a1 = rel.agg(F.max("rs").alias("bs"))
            a2 = (
                rel.crossJoin(F.broadcast(a1))
                .filter(F.col("rs") == F.col("bs"))
                .agg(F.min("rdoc").alias("bdoc"))
            )
            rk = (
                per_doc.crossJoin(F.broadcast(a1))
                .crossJoin(F.broadcast(a2))
                .agg(
                    (
                        F.lit(1)
                        + F.sum(
                            F.when(
                                (F.col(ranker) > F.col("bs"))
                                | (
                                    (F.col(ranker) == F.col("bs"))
                                    & (F.col("doc_id") < F.col("bdoc"))
                                ),
                                1,
                            ).otherwise(0)
                        )
                    )
                    .cast("long")
                    .alias("frank")
                )
            )
            row = rk.select(
                F.lit(qid).alias("qid"),
                F.lit(ranker[2:]).alias("ranker"),
                F.col("frank").alias("first_rel_rank"),
                (F.col("frank") <= 1).cast("long").alias("s_at_1"),
                (F.col("frank") <= 5).cast("long").alias("s_at_5"),
                (F.col("frank") <= 10).cast("long").alias("s_at_10"),
            )
            out = row if out is None else out.unionByName(row)
    return out


def _success_sql() -> str:
    blocks = []
    for qid, terms in sorted(NDCG_QUERIES.items()):
        m = len(terms)
        tl = ", ".join(f"'{t}'" for t in terms)
        for ranker in ("s_tf", "s_bm25", "s_wtf"):
            blocks.append(f"""SELECT * FROM (
  WITH toks AS (
    SELECT doc_id,
           unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term
    FROM documents
  ),
  n AS (SELECT count(*)::DOUBLE AS n FROM documents),
  dl AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id
  ),
  avgdl AS (SELECT avg(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
  qt AS (SELECT doc_id, term FROM toks WHERE term IN ({tl})),
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
    SELECT tf.doc_id,
           CAST(sum(tf.tf) AS BIGINT) AS s_tf,
           CAST(sum(CAST(round(stats.idf * (CAST(tf.tf AS DOUBLE)
                 * ({BM25_K1} + 1.0) / (CAST(tf.tf AS DOUBLE)
                    + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B}
                       * CAST(dl.dl AS DOUBLE) / avgdl.avgdl)))
                 * 1000000.0) AS BIGINT)) AS BIGINT) AS s_bm25,
           CAST(sum(CAST(round(CAST(tf.tf AS DOUBLE) * stats.idf
                 * 1000000.0) AS BIGINT)) AS BIGINT) AS s_wtf,
           CAST(count(*) AS BIGINT) AS grade
    FROM tf
    JOIN stats USING (term)
    JOIN dl ON dl.doc_id = tf.doc_id, avgdl
    GROUP BY tf.doc_id
  ),
  rel AS (
    SELECT doc_id AS rdoc, {ranker} AS rs FROM per_doc WHERE grade = {m}
  ),
  a1 AS (SELECT max(rs) AS bs FROM rel),
  a2 AS (SELECT min(rdoc) AS bdoc FROM rel, a1 WHERE rs = bs),
  rk AS (
    SELECT CAST(1 + sum(CASE WHEN p.{ranker} > a1.bs
                              OR (p.{ranker} = a1.bs
                                  AND p.doc_id < a2.bdoc)
                             THEN 1 ELSE 0 END) AS BIGINT) AS frank
    FROM per_doc p, a1, a2
  )
  SELECT '{qid}' AS qid, '{ranker[2:]}' AS ranker,
         frank AS first_rel_rank,
         CAST(CASE WHEN frank <= 1 THEN 1 ELSE 0 END AS BIGINT) AS s_at_1,
         CAST(CASE WHEN frank <= 5 THEN 1 ELSE 0 END AS BIGINT) AS s_at_5,
         CAST(CASE WHEN frank <= 10 THEN 1 ELSE 0 END AS BIGINT)
           AS s_at_10
  FROM rk
)""")
    return "\nUNION ALL\n".join(blocks)


SQL_SUCCESS_AT_K = _success_sql()


QUERIES = {
    "bm25_b_sweep": q_bm25_b_sweep,
    "bm25_topk": q_bm25_topk,
    "bm25f_topk": q_bm25f_topk,
    "cascade_overlap": q_cascade_overlap,
    "err_eval": q_err_eval,
    "expansion_agreement": q_expansion_agreement,
    "exposure_bias": q_exposure_bias,
    "first_position": q_first_position,
    "hard_negatives": q_hard_negatives,
    "hybrid_rrf": q_hybrid_rrf,
    "idf_variants": q_idf_variants,
    "k1_sweep": q_k1_sweep,
    "kendall_w": q_kendall_w,
    "ltr_features": q_ltr_features,
    "map_eval": q_map_eval,
    "mmr_rerank": q_mmr_rerank,
    "mrr_eval": q_mrr_eval,
    "ndcg_eval": q_ndcg_eval,
    "negative_sampling": q_negative_sampling,
    "next_word": q_next_word,
    "novelty_curve": q_novelty_curve,
    "nqc_predictor": q_nqc_predictor,
    "phrase_match": q_phrase_match,
    "pivoted_topk": q_pivoted_topk,
    "pl2_topk": q_pl2_topk,
    "prf_expansion": q_prf_expansion,
    "proximity_rank": q_proximity_rank,
    "ql_topk": q_ql_topk,
    "query_clarity": q_query_clarity,
    "rank_correlation": q_rank_correlation,
    "rank_fusion": q_rank_fusion,
    "rank_overlap": q_rank_overlap,
    "residual_idf": q_residual_idf,
    "rocchio_expansion": q_rocchio_expansion,
    "rsj_weights": q_rsj_weights,
    "search_snippets": q_search_snippets,
    "smart_ltc_topk": q_smart_ltc_topk,
    "success_at_k": q_success_at_k,
    "term_association": q_term_association,
    "threshold_algorithm": q_threshold_algorithm,
    "topk_churn": q_topk_churn,
}

ORACLES = {
    "bm25_b_sweep": SQL_BM25_B_SWEEP,
    "bm25_topk": SQL_BM25_TOPK,
    "bm25f_topk": SQL_BM25F_TOPK,
    "cascade_overlap": SQL_CASCADE_OVERLAP,
    "err_eval": SQL_ERR_EVAL,
    "expansion_agreement": SQL_EXPANSION_AGREEMENT,
    "exposure_bias": SQL_EXPOSURE_BIAS,
    "first_position": SQL_FIRST_POSITION,
    "hard_negatives": SQL_HARD_NEGATIVES,
    "hybrid_rrf": SQL_HYBRID_RRF,
    "idf_variants": SQL_IDF_VARIANTS,
    "k1_sweep": SQL_K1_SWEEP,
    "kendall_w": SQL_KENDALL_W,
    "ltr_features": SQL_LTR_FEATURES,
    "map_eval": SQL_MAP_EVAL,
    "mmr_rerank": SQL_MMR_RERANK,
    "mrr_eval": SQL_MRR_EVAL,
    "ndcg_eval": SQL_NDCG_EVAL,
    "negative_sampling": SQL_NEGATIVE_SAMPLING,
    "next_word": SQL_NEXT_WORD,
    "novelty_curve": SQL_NOVELTY_CURVE,
    "nqc_predictor": SQL_NQC_PREDICTOR,
    "phrase_match": SQL_PHRASE_MATCH,
    "pivoted_topk": SQL_PIVOTED_TOPK,
    "pl2_topk": SQL_PL2_TOPK,
    "prf_expansion": SQL_PRF_EXPANSION,
    "proximity_rank": SQL_PROXIMITY_RANK,
    "ql_topk": SQL_QL_TOPK,
    "query_clarity": SQL_QUERY_CLARITY,
    "rank_correlation": SQL_RANK_CORRELATION,
    "rank_fusion": SQL_RANK_FUSION,
    "rank_overlap": SQL_RANK_OVERLAP,
    "residual_idf": SQL_RESIDUAL_IDF,
    "rocchio_expansion": SQL_ROCCHIO_EXPANSION,
    "rsj_weights": SQL_RSJ_WEIGHTS,
    "search_snippets": SQL_SEARCH_SNIPPETS,
    "smart_ltc_topk": SQL_SMART_LTC_TOPK,
    "success_at_k": SQL_SUCCESS_AT_K,
    "term_association": SQL_TERM_ASSOCIATION,
    "threshold_algorithm": SQL_THRESHOLD_ALGORITHM,
    "topk_churn": SQL_TOPK_CHURN,
}
