"""Training-data pipeline (Spark, DuckDB-oracle) query pairs.

Same contract as ``driver_queries``: each Spark callable has an ANSI-SQL twin
producing identical column names and (order-insensitive) values on the
driver's parquet tables. All hashing is engine-portable (md5 hex strings,
integer bit arithmetic), so even MinHash signatures and SimHash fingerprints
replay bit-for-bit in DuckDB.

Near-dup queries that need guaranteed duplicates run over a *mutated corpus*:
``documents`` unioned with deterministic variants (doc_id + 100000, first 30
chars dropped / first embedding component perturbed) planted identically on
both sides.
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
MIN_LONG_SQL = "(-9223372036854775807 - 1)"

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


_MUT_DOCS_CTE = f"""
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {MUT_OFFSET}, substring(text, 31) FROM documents
  WHERE doc_id % 10 = 0
)
"""


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
# MinHash + LSH candidate pairs (mutated corpus)
# --------------------------------------------------------------------------
def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _mut_docs(spark, sf_dir)
    sig = D.minhash_signatures(D.shingles(corpus), num_perm=9)
    return D.lsh_candidate_pairs(sig, rows_per_band=3)


SQL_MINHASH_LSH_PAIRS = f"""
WITH {_MUT_DOCS_CTE}, {_shingle_cte()},
sig AS (
  SELECT doc_id, s.seed, min(md5(s.seed || ':' || shingle)) AS mh
  FROM sh, (SELECT unnest(range(9))::INT AS seed) s
  GROUP BY doc_id, s.seed
),
bands AS (
  SELECT doc_id, (seed // 3)::INT AS band,
         md5(string_agg(mh, '|' ORDER BY seed)) AS bh
  FROM sig GROUP BY doc_id, seed // 3
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM bands a
JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
"""


# --------------------------------------------------------------------------
# n-gram Jaccard near-dup pairs (natural corpus — it contains real near-dups)
# --------------------------------------------------------------------------
def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    return D.ngram_jaccard_pairs(D.shingles(docs), threshold=0.5)


SQL_NGRAM_JACCARD_PAIRS = f"""
WITH corpus AS (SELECT doc_id, text FROM documents), {_shingle_cte()},
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b,
       round(n_common / (sa.n + sb.n - n_common), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE round(n_common / (sa.n + sb.n - n_common), 6) >= 0.5
"""


# --------------------------------------------------------------------------
# Shingle containment pairs (mutated corpus — the 30-char-dropped mutants
# are near-subsets of their originals: overlap ~1.0 where Jaccard is lower,
# the asymmetric duplication case Jaccard-threshold dedup misses). Spark
# uses the lossless smaller-side prefix filter (dedup.containment_pairs);
# the oracle recomputes the exact overlap coefficient brute-force. The
# division is BIGINT/BIGINT of identical operands in both engines.
# --------------------------------------------------------------------------
CONTAINMENT_THRESHOLD = 0.9


def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _mut_docs(spark, sf_dir)
    return D.containment_pairs(
        D.shingles(corpus), threshold=CONTAINMENT_THRESHOLD
    )


SQL_CONTAINMENT_PAIRS = f"""
WITH {_MUT_DOCS_CTE}, {_shingle_cte()},
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b,
       round(n_common / least(sa.n, sb.n), 6) AS overlap
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE round(n_common / least(sa.n, sb.n), 6) >= {CONTAINMENT_THRESHOLD}
"""


# --------------------------------------------------------------------------
# Per-source boilerplate shingles (template detection): a shingle present in
# >= 50% of a source's docs is boilerplate (site chrome/footer) that a
# curation pipeline strips before dedup and training. The corpus injects a
# deterministic per-source footer (the shared-expression pattern, like
# URL_EXPR) so every source has exactly 3 rate-1.0 footer shingles to
# detect; natural shingles stay far below threshold. Shape: per-(source,
# shingle) doc counts with map-side partial agg (uniform key — shingle
# cardinality grows with the corpus), per-source totals broadcast.
# --------------------------------------------------------------------------
BOILERPLATE_RATE = 0.5
_FOOTER_SQL = "text || ' copyright ' || source || ' all rights reserved'"


def q_boilerplate_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents").select("doc_id", "source", "text")
    corpus = docs.withColumn("text", F.expr(_FOOTER_SQL))
    sh = D.shingles(corpus)  # (doc_id, source, shingle), distinct per doc
    src = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    cnt = sh.groupBy("source", "shingle").agg(F.count(F.lit(1)).alias("df_s"))
    return (
        cnt.join(F.broadcast(src), "source")
        .withColumn("rate", F.round(F.col("df_s") / F.col("n_docs"), 6))
        .filter(F.col("rate") >= BOILERPLATE_RATE)
        .select("source", "shingle", "df_s", "n_docs", "rate")
    )


SQL_BOILERPLATE_SHINGLES = f"""
WITH corpus AS (
  SELECT doc_id, source, {_FOOTER_SQL} AS text FROM documents
),
words AS (
  SELECT doc_id, source, regexp_extract_all(lower(text), '{TOKEN_RUN}') AS w
  FROM corpus
),
sh AS (
  SELECT DISTINCT doc_id, source,
         w[i + 1] || ' ' || w[i + 2] || ' ' || w[i + 3] AS shingle
  FROM words, unnest(range(len(w) - 2)) AS t(i)
  WHERE len(w) >= 3
),
src AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
cnt AS (
  SELECT source, shingle, count(*) AS df_s FROM sh GROUP BY source, shingle
)
SELECT c.source, shingle, df_s, n_docs,
       round(df_s / n_docs, 6) AS rate
FROM cnt c JOIN src USING (source)
WHERE round(df_s / n_docs, 6) >= {BOILERPLATE_RATE}
"""


# --------------------------------------------------------------------------
# Join-selectivity estimates (query-planner audit): for the top-25 terms by
# document frequency (deterministic df desc, term asc), compare the
# independence-assumption estimate df_a*df_b/N against the EXACT
# co-occurrence count — the statistic a distributed planner uses to order
# posting-list intersections, and the audit that shows where independence
# breaks. The co-occurrence self-join is restricted to the top-K terms
# first (semi join), so its input is <= K rows per doc and the pair
# fan-out is bounded by K^2/2 per doc at any corpus size.
# --------------------------------------------------------------------------
SELECTIVITY_TOP_K = 25


def q_selectivity_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    td = (
        docs.select(
            "doc_id",
            F.explode(
                F.expr(f"regexp_extract_all(lower(text), '{TOKEN_RUN}', 0)")
            ).alias("term"),
        )
        .distinct()
    )
    dfc = td.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    topt = dfc.orderBy(F.col("df").desc(), F.col("term").asc()).limit(
        SELECTIVITY_TOP_K
    )
    n = scalar_count(docs)
    a = topt.select(F.col("term").alias("term_a"), F.col("df").alias("df_a"))
    b = topt.select(F.col("term").alias("term_b"), F.col("df").alias("df_b"))
    pairs = a.join(b, F.col("term_a") < F.col("term_b"))
    tdt = td.join(F.broadcast(topt.select("term")), "term", "semi")
    x = tdt.select(F.col("doc_id"), F.col("term").alias("term_a"))
    y = tdt.select(F.col("doc_id"), F.col("term").alias("term_b"))
    co = (
        x.join(y, ["doc_id"])
        .filter(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b")
        .agg(F.count(F.lit(1)).alias("co_df"))
    )
    return (
        pairs.join(co, ["term_a", "term_b"], "left")
        .crossJoin(F.broadcast(n))
        .select(
            "term_a",
            "term_b",
            "df_a",
            "df_b",
            F.coalesce("co_df", F.lit(0)).alias("co_df"),
            F.round((F.col("df_a") * F.col("df_b")) / F.col("_n"), 6).alias(
                "est_co_df"
            ),
        )
    )


SQL_SELECTIVITY_ESTIMATES = f"""
WITH td AS (
  SELECT DISTINCT doc_id,
         unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term
  FROM documents
),
dfc AS (SELECT term, count(*) AS df FROM td GROUP BY term),
topt AS (
  SELECT term, df FROM dfc ORDER BY df DESC, term ASC
  LIMIT {SELECTIVITY_TOP_K}
),
n AS (SELECT CAST(count(*) AS DOUBLE) AS _n FROM documents),
pairs AS (
  SELECT a.term AS term_a, b.term AS term_b, a.df AS df_a, b.df AS df_b
  FROM topt a JOIN topt b ON a.term < b.term
),
tdt AS (SELECT doc_id, term FROM td WHERE term IN (SELECT term FROM topt)),
co AS (
  SELECT x.term AS term_a, y.term AS term_b, count(*) AS co_df
  FROM tdt x JOIN tdt y ON x.doc_id = y.doc_id AND x.term < y.term
  GROUP BY x.term, y.term
)
SELECT p.term_a, p.term_b, df_a, df_b,
       COALESCE(co.co_df, 0) AS co_df,
       round((df_a * df_b) / n._n, 6) AS est_co_df
FROM pairs p
LEFT JOIN co ON co.term_a = p.term_a AND co.term_b = p.term_b, n
"""


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
# Prefix completion table (type-ahead by prefix, the companion of
# next_word's bigram successor): per 3-char prefix, the argmax completion
# by collection frequency (ties to the lexicographically first term), the
# prefix's term count, and its total occurrences. The argmax runs over the
# AGGREGATED per-term ctf relation (vocabulary-bounded, never the raw
# stream).
# --------------------------------------------------------------------------
PREFIX_LEN = 3


def q_prefix_complete(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    occ = docs.select(
        F.explode(
            F.expr(f"regexp_extract_all(lower(text), '{TOKEN_RUN}', 0)")
        ).alias("term"),
    )
    ctf = (
        occ.filter(F.length("term") >= PREFIX_LEN)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("ctf"))
        .withColumn("prefix", F.expr(f"substring(term, 1, {PREFIX_LEN})"))
    )
    w = Window.partitionBy("prefix").orderBy(
        F.col("ctf").desc(), F.col("term").asc()
    )
    stats = ctf.groupBy("prefix").agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum("ctf").alias("total_ctf"),
    )
    best = (
        ctf.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("prefix", F.col("term").alias("completion"), "ctf")
    )
    return best.join(stats, "prefix").select(
        "prefix", "completion", "ctf", "n_terms", "total_ctf"
    )


SQL_PREFIX_COMPLETE = f"""
WITH occ AS (
  SELECT unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term
  FROM documents
),
ctf AS (
  SELECT term, CAST(count(*) AS BIGINT) AS ctf,
         substring(term, 1, {PREFIX_LEN}) AS prefix
  FROM occ WHERE length(term) >= {PREFIX_LEN}
  GROUP BY term
),
stats AS (
  SELECT prefix, CAST(count(*) AS BIGINT) AS n_terms,
         CAST(sum(ctf) AS BIGINT) AS total_ctf
  FROM ctf GROUP BY prefix
),
best AS (
  SELECT prefix, term AS completion, ctf,
         row_number() OVER (
           PARTITION BY prefix ORDER BY ctf DESC, term ASC
         ) AS rn
  FROM ctf
)
SELECT b.prefix, b.completion, b.ctf, s.n_terms, s.total_ctf
FROM best b JOIN stats s USING (prefix) WHERE b.rn = 1
"""


# --------------------------------------------------------------------------
# Posting-gap histogram (codec sizing): the log2 distribution of docID
# deltas across all posting lists — the statistic that decides delta+varint
# vs bit-packing (postings_bytes measures the chosen codec's output; this
# is its input distribution). Buckets are exact integers via
# length(bin(delta)) - 1 == floor(log2) with NO libm. The per-term lag
# window mirrors how the real codec sees each list; at cluster scale the
# deltas come out of the per-(term, shard) encode stage instead of a
# global window (operators/postings.py) — this pair audits the
# distribution, not the encode path.
# --------------------------------------------------------------------------
def q_gap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    td = (
        docs.select(
            "doc_id",
            F.explode(
                F.expr(f"regexp_extract_all(lower(text), '{TOKEN_RUN}', 0)")
            ).alias("term"),
        )
        .distinct()
    )
    w = Window.partitionBy("term").orderBy("doc_id")
    deltas = td.withColumn(
        "delta", F.col("doc_id") - F.lag("doc_id").over(w)
    ).filter(F.col("delta").isNotNull())
    return (
        deltas.select(
            (F.length(F.bin("delta")) - 1).cast("long").alias("gap_log2")
        )
        .groupBy("gap_log2")
        .agg(F.count(F.lit(1)).alias("n_gaps"))
    )


SQL_GAP_HISTOGRAM = f"""
WITH td AS (
  SELECT DISTINCT term, doc_id FROM (
    SELECT doc_id,
           unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term
    FROM documents
  )
),
deltas AS (
  SELECT doc_id - lag(doc_id) OVER (PARTITION BY term ORDER BY doc_id)
         AS delta
  FROM td
)
SELECT CAST(length(bin(delta)) - 1 AS BIGINT) AS gap_log2,
       CAST(count(*) AS BIGINT) AS n_gaps
FROM deltas WHERE delta IS NOT NULL GROUP BY 1
"""


# --------------------------------------------------------------------------
# MinHash calibration (sketch-accuracy audit): for every LSH candidate
# pair, the signature-agreement Jaccard ESTIMATE (agreeing permutations /
# 9) against the EXACT shingle Jaccard and the signed error — the
# calibration check before trusting the sketch for threshold decisions.
# Exact sets travel once per side as per-doc arrays onto the bounded
# candidate list (ids-only LSH join, invariant 6).
# --------------------------------------------------------------------------
def q_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _mut_docs(spark, sf_dir)
    sh = D.shingles(corpus)
    sig = D.minhash_signatures(sh, num_perm=9)
    pairs = D.lsh_candidate_pairs(sig, rows_per_band=3)
    agree = (
        pairs.join(
            sig.select(F.col("doc_id").alias("id_a"), "seed",
                       F.col("minhash").alias("_ma")),
            "id_a",
        )
        .join(
            sig.select(F.col("doc_id").alias("id_b"), "seed",
                       F.col("minhash").alias("_mb")),
            ["id_b", "seed"],
        )
        .groupBy("id_a", "id_b")
        .agg(
            F.sum(
                F.when(F.col("_ma") == F.col("_mb"), 1).otherwise(0)
            ).alias("n_agree")
        )
    )
    per_doc = sh.groupBy("doc_id").agg(
        F.collect_set("shingle").alias("_arr"),
        F.count(F.lit(1)).alias("_n"),
    )
    a = per_doc.select(
        F.col("doc_id").alias("id_a"), F.col("_arr").alias("_sa"),
        F.col("_n").alias("_na"),
    )
    b = per_doc.select(
        F.col("doc_id").alias("id_b"), F.col("_arr").alias("_sb"),
        F.col("_n").alias("_nb"),
    )
    common = F.size(F.array_intersect("_sa", "_sb"))
    exact = common / (F.col("_na") + F.col("_nb") - common)
    return (
        agree.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            "n_agree",
            F.round(F.col("n_agree") / 9.0, 6).alias("est_jaccard"),
            F.round(exact, 6).alias("jaccard"),
            F.round(F.col("n_agree") / 9.0 - exact, 6).alias("est_err"),
        )
    )


SQL_MINHASH_CALIBRATION = f"""
WITH {_MUT_DOCS_CTE}, {_shingle_cte()},
sig AS (
  SELECT doc_id, s.seed, min(md5(s.seed || ':' || shingle)) AS mh
  FROM sh, (SELECT unnest(range(9))::INT AS seed) s
  GROUP BY doc_id, s.seed
),
bands AS (
  SELECT doc_id, (seed // 3)::INT AS band,
         md5(string_agg(mh, '|' ORDER BY seed)) AS bh
  FROM sig GROUP BY doc_id, seed // 3
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
),
agree AS (
  SELECT p.id_a, p.id_b,
         CAST(sum(CASE WHEN x.mh = y.mh THEN 1 ELSE 0 END) AS BIGINT)
         AS n_agree
  FROM pairs p
  JOIN sig x ON x.doc_id = p.id_a
  JOIN sig y ON y.doc_id = p.id_b AND y.seed = x.seed
  GROUP BY p.id_a, p.id_b
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT g.id_a, g.id_b, g.n_agree,
       round(g.n_agree / 9.0, 6) AS est_jaccard,
       round(COALESCE(i.n_common, 0) / (sa.n + sb.n - COALESCE(i.n_common, 0)), 6) AS jaccard,
       round(g.n_agree / 9.0
             - COALESCE(i.n_common, 0) / (sa.n + sb.n - COALESCE(i.n_common, 0)), 6) AS est_err
FROM agree g
LEFT JOIN inter i ON i.id_a = g.id_a AND i.id_b = g.id_b
JOIN sizes sa ON sa.doc_id = g.id_a
JOIN sizes sb ON sb.doc_id = g.id_b
"""


# --------------------------------------------------------------------------
# Standing alerts (percolator / reverse search): a set of STORED
# conjunctive term queries matched against the whole corpus — the news-
# alerting direction (docs stream past stored queries) the reference's
# forward search cannot express. The stored queries are a broadcast
# literal relation; a doc matches when its distinct-term intersection
# with the query reaches the query's size (exact conjunctive semantics).
# --------------------------------------------------------------------------
ALERT_QUERIES = (
    (1, ("spark", "data")),
    (2, ("spark", "query")),
    (3, ("data", "query")),
    (4, ("spark", "data", "query")),
)


def q_standing_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    td = (
        docs.select(
            "doc_id",
            F.explode(
                F.expr(f"regexp_extract_all(lower(text), '{TOKEN_RUN}', 0)")
            ).alias("term"),
        )
        .distinct()
    )
    qrows = [(qid, t) for qid, terms in ALERT_QUERIES for t in terms]
    qrel = spark.createDataFrame(qrows, "query_id long, term string")
    qsize = spark.createDataFrame(
        [(qid, len(terms)) for qid, terms in ALERT_QUERIES],
        "query_id long, q_terms long",
    )
    matched = (
        td.join(F.broadcast(qrel), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("_hit"))
    )
    full = matched.join(F.broadcast(qsize), "query_id").filter(
        F.col("_hit") == F.col("q_terms")
    )
    return (
        full.groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.min("doc_id").alias("first_doc"),
        )
        .join(F.broadcast(qsize), "query_id")
        .select("query_id", "q_terms", "n_matches", "first_doc")
    )


def _alerts_sql() -> str:
    qrel = ", ".join(
        f"({qid}, '{t}')" for qid, terms in ALERT_QUERIES for t in terms
    )
    qsize = ", ".join(
        f"({qid}, {len(terms)})" for qid, terms in ALERT_QUERIES
    )
    return f"""
WITH td AS (
  SELECT DISTINCT doc_id,
         unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term
  FROM documents
),
qrel(query_id, term) AS (VALUES {qrel}),
qsize(query_id, q_terms) AS (VALUES {qsize}),
matched AS (
  SELECT q.query_id, t.doc_id, count(*) AS hit
  FROM td t JOIN qrel q USING (term)
  GROUP BY q.query_id, t.doc_id
)
SELECT CAST(m.query_id AS BIGINT) AS query_id,
       CAST(s.q_terms AS BIGINT) AS q_terms,
       CAST(count(*) AS BIGINT) AS n_matches,
       min(m.doc_id) AS first_doc
FROM matched m JOIN qsize s USING (query_id)
WHERE m.hit = s.q_terms
GROUP BY m.query_id, s.q_terms
"""


SQL_STANDING_ALERTS = _alerts_sql()


# --------------------------------------------------------------------------
# Vocabulary pruning report (index sizing): for a grid of min-df gates, the
# vocabulary and postings volume retained — the sizing audit behind a
# min_df cutoff decision. Term stats come from the two-phase skew-free
# doc_frequencies helper (invariant 6); the 5-row grid is a broadcast
# local relation; totals are a 1-row in-plan aggregate (no driver .count).
# All counts BIGINT; the two fractions are single exact-int divides.
# --------------------------------------------------------------------------
PRUNING_GRID = (1, 2, 3, 5, 8)


def q_vocab_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    occ = docs.select(
        "doc_id",
        F.explode(
            F.expr(f"regexp_extract_all(lower(text), '{TOKEN_RUN}', 0)")
        ).alias("term"),
    )
    stats = doc_frequencies(occ, with_ctf=True)
    totals = stats.agg(
        F.count(F.lit(1)).alias("_vocab"), F.sum("ctf").alias("_postings")
    )
    grid = spark.createDataFrame(
        [(g,) for g in PRUNING_GRID], "min_df long"
    )
    pruned = (
        stats.join(
            F.broadcast(grid),
            F.col("doc_frequency") >= F.col("min_df"),
        )
        .groupBy("min_df")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("ctf").alias("n_postings"),
        )
    )
    return pruned.crossJoin(F.broadcast(totals)).select(
        "min_df",
        "n_terms",
        "n_postings",
        F.round(F.col("n_terms") / F.col("_vocab"), 6).alias("term_frac"),
        F.round(F.col("n_postings") / F.col("_postings"), 6).alias(
            "posting_frac"
        ),
    )


SQL_VOCAB_PRUNING = f"""
WITH occ AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term
  FROM documents
),
stats AS (
  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_frequency,
         CAST(count(*) AS BIGINT) AS ctf
  FROM occ GROUP BY term
),
totals AS (
  SELECT CAST(count(*) AS BIGINT) AS _vocab,
         CAST(sum(ctf) AS BIGINT) AS _postings
  FROM stats
),
grid AS (SELECT unnest([{", ".join(str(g) for g in PRUNING_GRID)}])::BIGINT AS min_df),
pruned AS (
  SELECT min_df, CAST(count(*) AS BIGINT) AS n_terms,
         CAST(sum(ctf) AS BIGINT) AS n_postings
  FROM stats, grid WHERE doc_frequency >= min_df GROUP BY min_df
)
SELECT min_df, n_terms, n_postings,
       round(CAST(n_terms AS DOUBLE) / _vocab, 6) AS term_frac,
       round(CAST(n_postings AS DOUBLE) / _postings, 6) AS posting_frac
FROM pruned, totals
"""


# --------------------------------------------------------------------------
# OOV rate per source (tokenizer-coverage audit): the fraction of token
# occurrences outside the deterministic top-100 vocabulary (ctf desc, term
# asc) — the coverage statistic behind a fixed-vocab tokenizer decision.
# The vocabulary is a broadcast anti-join side; per-source sums are plain
# map-side-partial counts on a low-cardinality key (no countDistinct).
# --------------------------------------------------------------------------
OOV_VOCAB_K = 100


def q_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents").select("source", "text")
    occ = docs.select(
        "source",
        F.explode(
            F.expr(f"regexp_extract_all(lower(text), '{TOKEN_RUN}', 0)")
        ).alias("term"),
    )
    ctf = occ.groupBy("term").agg(F.count(F.lit(1)).alias("ctf"))
    vocab = ctf.orderBy(F.col("ctf").desc(), F.col("term").asc()).limit(
        OOV_VOCAB_K
    ).select("term")
    tot = occ.groupBy("source").agg(F.count(F.lit(1)).alias("n_tokens"))
    oov = (
        occ.join(F.broadcast(vocab), "term", "left_anti")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_oov"))
    )
    return (
        tot.join(oov, "source", "left")
        .select(
            "source",
            "n_tokens",
            F.coalesce("n_oov", F.lit(0)).alias("n_oov"),
            F.round(
                F.coalesce("n_oov", F.lit(0)) / F.col("n_tokens"), 6
            ).alias("oov_rate"),
        )
    )


SQL_OOV_RATE = f"""
WITH occ AS (
  SELECT source,
         unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term
  FROM documents
),
ctf AS (SELECT term, count(*) AS ctf FROM occ GROUP BY term),
vocab AS (
  SELECT term FROM ctf ORDER BY ctf DESC, term ASC LIMIT {OOV_VOCAB_K}
),
tot AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_tokens
  FROM occ GROUP BY source
),
oov AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_oov
  FROM occ WHERE term NOT IN (SELECT term FROM vocab)
  GROUP BY source
)
SELECT t.source, n_tokens,
       COALESCE(o.n_oov, 0) AS n_oov,
       round(COALESCE(o.n_oov, 0) / n_tokens, 6) AS oov_rate
FROM tot t LEFT JOIN oov o USING (source)
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
# Impact quantization (tiered / impact-ordered index): per-term MAX BM25
# impact and its 8-bit quantized bucket against the global max — the
# block-max statistic WAND prunes with, quantized the way an impact-
# ordered index stores it, plus the quantization error the lossy grid
# pays. idf is fixed6-quantized IMMEDIATELY (ln may differ by an ulp
# between JVM and C libm); everything after is pure IEEE ×/÷/+ on
# identical operands. Term stats use the manual two-phase shape (tf on
# the uniform (term, doc) key, df re-aggregated from it — invariant 6).
# --------------------------------------------------------------------------
IMPACT_BUCKETS = 255


def q_impact_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.expr(f"regexp_extract_all(lower(text), '{TOKEN_RUN}', 0)")
        ).alias("term"),
    )
    tf = toks.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    dfx = tf.groupBy("term").agg(F.count(F.lit(1)).alias("doc_frequency"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    avgdl_df = dl.agg(F.avg(F.col("dl").cast("double")).alias("_avgdl"))
    dfd = F.col("doc_frequency").cast("double")
    idf = (
        dfx.crossJoin(F.broadcast(scalar_count(docs)))
        .select(
            "term",
            "doc_frequency",
            fixed6_long(
                F.log((F.col("_n") - dfd + 0.5) / (dfd + 0.5) + 1.0)
            ).alias("idf6"),
        )
    )
    tfd = F.col("tf").cast("double")
    norm = F.lit(BM25_K1) * (
        1.0 - BM25_B + F.lit(BM25_B) * F.col("dl").cast("double") / F.col("_avgdl")
    )
    impact_s = F.col("idf6") * (tfd * (BM25_K1 + 1.0) / (tfd + norm))
    mx = (
        tf.join(F.broadcast(idf), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(avgdl_df))
        .withColumn("_imp", impact_s)
        .groupBy("term", "doc_frequency")
        .agg(F.max("_imp").alias("max_s"))
    )
    gm = mx.agg(F.max("max_s").alias("_gm"))
    bucket = F.floor(
        F.col("max_s") / F.col("_gm") * F.lit(float(IMPACT_BUCKETS))
    ).cast("long")
    return mx.crossJoin(F.broadcast(gm)).select(
        "term",
        "doc_frequency",
        F.round(F.col("max_s") / 1000000.0, 6).alias("max_impact"),
        bucket.alias("bucket"),
        F.round(
            (
                F.col("max_s")
                - bucket * F.col("_gm") / F.lit(float(IMPACT_BUCKETS))
            )
            / 1000000.0,
            6,
        ).alias("quant_err"),
    )


SQL_IMPACT_QUANTIZATION = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term
  FROM documents
),
tf AS (
  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY term, doc_id
),
dfx AS (
  SELECT term, CAST(count(*) AS BIGINT) AS doc_frequency
  FROM tf GROUP BY term
),
dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id),
avgdl AS (SELECT avg(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
n AS (SELECT CAST(count(*) AS DOUBLE) AS _n FROM documents),
idf AS (
  SELECT term, doc_frequency,
         {SQL_FIXED6_LONG.format(
             col="ln((n._n - CAST(doc_frequency AS DOUBLE) + 0.5)"
                 " / (CAST(doc_frequency AS DOUBLE) + 0.5) + 1.0)"
         )} AS idf6
  FROM dfx, n
),
mx AS (
  SELECT t.term, i.doc_frequency,
         max(i.idf6 * (CAST(t.tf AS DOUBLE) * ({BM25_K1} + 1.0)
             / (CAST(t.tf AS DOUBLE) + {BM25_K1} * (1.0 - {BM25_B}
                + {BM25_B} * CAST(d.dl AS DOUBLE) / a.avgdl)))) AS max_s
  FROM tf t JOIN idf i USING (term) JOIN dl d USING (doc_id), avgdl a
  GROUP BY t.term, i.doc_frequency
),
m AS (SELECT max(max_s) AS gm FROM mx)
SELECT term, doc_frequency,
       round(max_s / 1000000.0, 6) AS max_impact,
       CAST(floor(max_s / m.gm * {IMPACT_BUCKETS}.0) AS BIGINT) AS bucket,
       round((max_s - CAST(floor(max_s / m.gm * {IMPACT_BUCKETS}.0) AS BIGINT)
              * m.gm / {IMPACT_BUCKETS}.0) / 1000000.0, 6) AS quant_err
FROM mx, m
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


_SIMHASH_CORE_CTE = f"""
votes AS (
  SELECT tf.doc_id, 63 - j.j AS p,
         sum(tf.tf * (2 * (((strpos('0123456789abcdef',
              substring(md5(tf.term), (j.j // 4) + 1, 1)) - 1)
             >> (3 - j.j % 4)) % 2) - 1)) AS v
  FROM tf, (SELECT unnest(range(64))::INT AS j) j
  GROUP BY tf.doc_id, 63 - j.j
),
fp AS (
  SELECT doc_id,
         sum(CASE WHEN v > 0 THEN
               CASE WHEN p = 63 THEN {MIN_LONG_SQL} ELSE 1::BIGINT << p END
             ELSE 0 END)::BIGINT AS simhash
  FROM votes GROUP BY doc_id
)
"""


def q_simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash_fingerprints(_tf(spark, sf_dir, mutated=False))


SQL_SIMHASH_FINGERPRINTS = f"""
WITH {_tf_cte("documents")}, {_SIMHASH_CORE_CTE}
SELECT doc_id, simhash FROM fp
"""


# --------------------------------------------------------------------------
# SimHash near-dup (mutated corpus; banded join vs brute-force oracle).
# Hamming radius 3 with 4x16-bit bands is lossless by pigeonhole, so the
# oracle brute-forces bit_count(xor) over all pairs and MUST agree — this
# pair doubles as the losslessness proof of the banding scheme.
# --------------------------------------------------------------------------
def q_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash_near_dup(_tf(spark, sf_dir, mutated=True), max_hamming=3)


SQL_SIMHASH_NEAR_DUP = f"""
WITH {_MUT_DOCS_CTE}, {_tf_cte("corpus")}, {_SIMHASH_CORE_CTE}
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


# --------------------------------------------------------------------------
# Exact kNN join: 1-NN for probe vectors vec_id < 50 (brute-force verifier)
# --------------------------------------------------------------------------
def q_embedding_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _read(spark, sf_dir, "embeddings")
    return S.knn_join(emb.filter(F.col("vec_id") < 50), emb, k=1).select(
        "probe_id", "nn_id", "cosine"
    )


SQL_EMBEDDING_KNN = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
scored AS (
  SELECT p.vec_id AS probe_id, c.vec_id AS nn_id,
         round(list_sum(list_transform(list_zip(p.v, c.v), z -> z[1] * z[2]))
           / (sqrt(list_sum(list_transform(p.v, x -> x * x)))
              * sqrt(list_sum(list_transform(c.v, x -> x * x)))), 6) AS cosine
  FROM e p JOIN e c ON p.vec_id <> c.vec_id
  WHERE p.vec_id < 50
)
SELECT probe_id, nn_id, cosine
FROM scored
QUALIFY row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, nn_id ASC) = 1
"""


# --------------------------------------------------------------------------
# Embedding near-dup (mutated corpus): Spark = SRP-LSH bucketed + exact
# verify; the oracle replays the IDENTICAL deterministic banding in SQL, so
# this pair verifies the Spark implementation of the bucketing, not LSH
# recall — recall vs brute force is covered by the unit suite
# (test_srp_near_dup_recall_vs_brute) and was spot-checked against a
# brute-force oracle at sf0.001/0.01/0.1 during development.
# --------------------------------------------------------------------------
def _mut_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _read(spark, sf_dir, "embeddings")
    mut = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + MUT_OFFSET).alias("vec_id"),
        F.expr(
            "concat(array(cast(cast(embedding[0] as double) * cast(1.2 as double)"
            " + cast(0.1 as double) as float)),"
            " slice(embedding, 2, size(embedding) - 1))"
        ).alias("embedding"),
    )
    return emb.select("vec_id", "embedding").unionByName(mut)


_MUT_EMB_CTE = f"""
ecorpus AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  UNION ALL
  SELECT vec_id + {MUT_OFFSET},
         list_concat([((embedding[1]::DOUBLE * 1.2::DOUBLE + 0.1::DOUBLE)::FLOAT)::DOUBLE],
                     embedding[2:]::DOUBLE[])
  FROM embeddings WHERE vec_id % 10 = 0
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


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.srp_bucketed_pairs(
        _mut_emb(spark, sf_dir),
        n_planes=ND_PLANES,
        bands=ND_BANDS,
        threshold=0.995,
        dim=64,
    )


_COS_AB = """round(list_sum(list_transform(list_zip(ea.v, eb.v), z -> z[1] * z[2]))
         / (sqrt(list_sum(list_transform(ea.v, x -> x * x)))
            * sqrt(list_sum(list_transform(eb.v, x -> x * x)))), 6)"""

SQL_EMBEDDING_NEAR_DUP = f"""
WITH {_MUT_EMB_CTE},
{_srp_cte("ecorpus", ND_PLANES, ND_PLANES // ND_BANDS)},
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM buckets a
  JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket
                AND a.vec_id < b.vec_id
)
SELECT id_a, id_b, {_COS_AB} AS cosine
FROM cand
JOIN ecorpus ea ON ea.vec_id = id_a
JOIN ecorpus eb ON eb.vec_id = id_b
WHERE {_COS_AB} >= 0.995
"""


# ordered-fold cosine fragment shared by every embedding oracle (the
# summation order matches Spark's zip_with/aggregate — invariant 4)
_COS_LIST = """list_sum(list_transform(list_zip({a}, {b}), z -> z[1] * z[2]))
  / (sqrt(list_sum(list_transform({a}, x -> x * x)))
     * sqrt(list_sum(list_transform({b}, x -> x * x))))"""


# --------------------------------------------------------------------------
# Semantic dedup (SemDeDup, Abbas et al. 2023) over the mutated corpus:
# assign every vector to its max-cosine coarse centroid (the deterministic
# %50 sample, kept in-plan as a broadcast DataFrame — zero driver
# collects), connect within-cluster pairs with cosine >= 0.995, keep the
# min-id representative per duplicate group. The oracle replays the
# identical assignment (row_number argmax, ties by cent_id) and closes the
# pair graph with a recursive CTE.
# --------------------------------------------------------------------------
SEMDEDUP_THRESHOLD = 0.995


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _mut_emb(spark, sf_dir)
    cents = (
        _read(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % 50 == 0)
        .select(
            F.col("vec_id").alias("cent_id"),
            F.col("embedding").cast("array<double>").alias("cvec"),
        )
    )
    return S.semantic_dedup(corpus, cents, threshold=SEMDEDUP_THRESHOLD)


_SD_PAIR_COS = _COS_LIST.format(a="a.v", b="b.v")

SQL_SEMANTIC_DEDUP = f"""
WITH RECURSIVE {_MUT_EMB_CTE},
cents AS (
  SELECT vec_id AS cent_id, embedding::DOUBLE[] AS cv
  FROM embeddings WHERE vec_id % 50 = 0
),
assigned AS (
  SELECT vec_id, v, cent_id FROM (
    SELECT e.vec_id, e.v, c.cent_id,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_COS_LIST.format(a="e.v", b="c.cv")} DESC, c.cent_id ASC
           ) AS rn
    FROM ecorpus e, cents c
  ) WHERE rn = 1
),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM assigned a
  JOIN assigned b ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
  WHERE round({_SD_PAIR_COS}, 6) >= CAST('{SEMDEDUP_THRESHOLD!r}' AS DOUBLE)
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach AS (
  SELECT src AS node, dst AS peer FROM edges
  UNION
  SELECT r.node, e.dst FROM reach r JOIN edges e ON e.src = r.peer
),
comp AS (
  SELECT node, least(node, min(peer)) AS component FROM reach GROUP BY node
)
SELECT e.vec_id,
       COALESCE(c.component, e.vec_id) AS representative,
       CAST(CASE WHEN COALESCE(c.component, e.vec_id) = e.vec_id
                 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM ecorpus e LEFT JOIN comp c ON c.node = e.vec_id
"""


# --------------------------------------------------------------------------
# ANN: top-10 neighbors of vec 0 among SRP bucket collisions. The probe's
# buckets are computed driver-side (no Spark job) and pushed into the scan
# as literal filters — the pattern that partition-prunes a bucket-
# partitioned vector index at scale. Both engines derive the identical
# deterministic bucketing, so results match exactly.
# --------------------------------------------------------------------------
ANN_PLANES = 16
ANN_BANDS = 4
_ANN_BPB = ANN_PLANES // ANN_BANDS


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _read(spark, sf_dir, "embeddings")
    pv = emb.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    probe_buckets = S.srp_probe_buckets(list(pv), ANN_PLANES, ANN_BANDS)
    banded = S.srp_banded(emb, n_planes=ANN_PLANES, bands=ANN_BANDS, dim=64)
    cond = None
    for b, k in probe_buckets:
        clause = (F.col("band") == b) & (F.col("bucket") == k)
        cond = clause if cond is None else (cond | clause)
    cand = (
        banded.filter(cond)
        .filter(F.col("id") != 0)
        .select(F.col("id").alias("vec_id"))
        .distinct()
    )
    qlit = F.array(*[F.lit(float(x)) for x in pv])
    return (
        cand.join(emb, "vec_id")
        .withColumn(
            "cosine",
            F.round(S.cosine_similarity_col(F.col("embedding"), qlit), 6),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
        .select("vec_id", "cosine")
    )


SQL_ANN_LSH_TOPK = f"""
WITH {_srp_cte("(SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
               ANN_PLANES, _ANN_BPB)},
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cand AS (
  SELECT DISTINCT c.vec_id
  FROM buckets c
  JOIN buckets q ON q.vec_id = 0 AND c.band = q.band AND c.bucket = q.bucket
  WHERE c.vec_id <> 0
)
SELECT c.vec_id,
       round(list_sum(list_transform(list_zip(ce.v, pe.v), z -> z[1] * z[2]))
         / (sqrt(list_sum(list_transform(ce.v, x -> x * x)))
            * sqrt(list_sum(list_transform(pe.v, x -> x * x)))), 6) AS cosine
FROM cand c
JOIN e ce ON ce.vec_id = c.vec_id
JOIN e pe ON pe.vec_id = 0
ORDER BY cosine DESC, c.vec_id ASC
LIMIT 10
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
# Winnowing fingerprints (k=4 word-grams, window=5)
# --------------------------------------------------------------------------
def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    return X.winnowing_fingerprints(docs, k=4, window=5)


_WINNOW_GRAM = " || ' ' || ".join(f"w[i + {j}]" for j in range(1, 5))

SQL_WINNOW_FINGERPRINTS = f"""
WITH words AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RUN}') AS w
  FROM documents
),
grams AS (
  SELECT doc_id, i::INT AS pos, md5({_WINNOW_GRAM}) AS h,
         count(*) OVER (PARTITION BY doc_id) AS n_grams
  FROM words, unnest(range(len(w) - 3)) AS t(i)
  WHERE len(w) >= 4
),
selected AS (
  SELECT DISTINCT doc_id, sel FROM (
    SELECT doc_id, pos, n_grams,
           min(h) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS sel
    FROM grams
  ) WHERE pos <= n_grams - 5
)
SELECT doc_id, count(*) AS n_fingerprints, min(sel) AS min_fingerprint
FROM selected GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# HyperLogLog distinct-token estimate per language (sketches.py): md5-only
# register arithmetic, so the oracle replays the ESTIMATE bit-for-bit —
# not approximately. Exercises both HLL branches across SFs (linear
# counting while registers are sparse at sf0.001, raw harmonic mean once
# the per-lang vocabulary saturates m=4096 at sf0.01+).
# --------------------------------------------------------------------------
HLL_B = 12
HLL_SEED = "hll"


def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training_data import sketches as SK

    docs = _read(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        F.explode(
            F.expr(f"regexp_extract_all(lower(text), '{TOKEN_RUN}', 0)")
        ).alias("term"),
    )
    return SK.hll_distinct(
        toks, "term", stratum_col="lang", b=HLL_B, seed=HLL_SEED
    )


def _hll_sql() -> str:
    from .training_data.sketches import RHO_CAP, SQL_NIBBLE_LZ, hll_alpha

    m = 1 << HLL_B
    hexc = HLL_B // 4
    lz = SQL_NIBBLE_LZ.format(nib="nib")
    alpha = repr(hll_alpha(m))
    big = m * m * (1 << RHO_CAP)
    return f"""
WITH t AS (
  SELECT lang, unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term
  FROM documents
),
h AS (
  SELECT lang, md5('{HLL_SEED}:' || term) AS h FROM t WHERE term IS NOT NULL
),
pre AS (
  SELECT lang,
         CAST('0x' || substr(h, 1, {hexc}) AS BIGINT) AS reg,
         length(regexp_extract(substr(h, {hexc + 1}, 15), '^0*', 0)) AS z,
         substr(h, {hexc + 1}, 15) AS w
  FROM h
),
rho AS (
  SELECT lang, reg,
         least(CASE WHEN z = 15 THEN 61 ELSE z * 4 + ({lz}) + 1 END,
               {RHO_CAP}) AS rho
  FROM (SELECT lang, reg, z, substr(w, z + 1, 1) AS nib FROM pre)
),
regs AS (SELECT lang, reg, max(rho) AS rho FROM rho GROUP BY lang, reg),
per AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS nset,
         CAST(sum(CAST(power(2.0, {RHO_CAP} - rho) AS BIGINT)) AS BIGINT) AS s
  FROM regs GROUP BY lang
),
est AS (
  SELECT lang, nset, {m} - nset AS v,
         (CAST('{alpha}' AS DOUBLE) * {big}) / (s + ({m} - nset) * {1 << RHO_CAP}) AS raw
  FROM per
)
SELECT lang, nset AS n_registers_set,
       round(CASE WHEN raw <= {int(2.5 * m)} AND v > 0
                  THEN CAST({m} AS DOUBLE) * ln(CAST({m} AS DOUBLE) / v)
                  ELSE raw END, 6) AS est_distinct
FROM est
"""


SQL_HLL_DISTINCT = _hll_sql()


# --------------------------------------------------------------------------
# Count-Min heavy hitters (sketches.py cms_*): the frequent-token report
# (boilerplate/nav-chrome detection) in fixed memory — candidates from a
# deterministic 1/16 doc sample, estimates from the full-stream sketch,
# support threshold in pure BIGINT arithmetic. No floats anywhere, so the
# oracle replays every estimate bit-for-bit.
# --------------------------------------------------------------------------
CMS_D = 4
CMS_B = 12
CMS_SEED = "cms"
CMS_SAMPLE_SEED = "cmss"
CMS_SUPPORT = (1, 200)  # keep candidates at >= 0.5% of the token stream


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training_data import sketches as SK

    docs = _read(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.expr(f"regexp_extract_all(lower(text), '{TOKEN_RUN}', 0)")
        ).alias("term"),
    )
    cand = (
        toks.filter(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(CMS_SAMPLE_SEED + ":"),
                        F.col("doc_id").cast("string"),
                    )
                ),
                1,
                1,
            )
            == "0"
        )
        .select("term")
        .distinct()
    )
    return SK.cms_heavy_hitters(
        toks,
        "term",
        cand,
        d=CMS_D,
        b=CMS_B,
        seed=CMS_SEED,
        support_num=CMS_SUPPORT[0],
        support_den=CMS_SUPPORT[1],
    )


def _cms_sql() -> str:
    hexc = CMS_B // 4
    rows = ", ".join(str(j) for j in range(CMS_D))
    col = (
        f"CAST('0x' || substr(md5('{CMS_SEED}:' || CAST(r.row AS VARCHAR)"
        f" || ':' || {{term}}), 1, {hexc}) AS BIGINT)"
    )
    return f"""
WITH t AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term
  FROM documents
),
rows AS (SELECT unnest([{rows}]) AS row),
sk AS (
  SELECT r.row, {col.format(term="t.term")} AS col,
         CAST(count(*) AS BIGINT) AS cnt
  FROM t, rows r WHERE t.term IS NOT NULL
  GROUP BY 1, 2
),
n AS (SELECT CAST(sum(cnt) // {CMS_D} AS BIGINT) AS n_total FROM sk),
cand AS (
  SELECT DISTINCT term FROM t
  WHERE substr(md5('{CMS_SAMPLE_SEED}:' || CAST(doc_id AS VARCHAR)), 1, 1)
        = '0' AND term IS NOT NULL
),
est AS (
  SELECT p.term, CAST(min(coalesce(s.cnt, 0)) AS BIGINT) AS est_count
  FROM (SELECT c.term, r.row, {col.format(term="c.term")} AS col
        FROM cand c, rows r) p
  LEFT JOIN sk s ON s.row = p.row AND s.col = p.col
  GROUP BY p.term
)
SELECT e.term, e.est_count, n.n_total
FROM est e, n
WHERE e.est_count * {CMS_SUPPORT[1]} >= n.n_total * {CMS_SUPPORT[0]}
"""


SQL_CMS_HEAVY_HITTERS = _cms_sql()


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
# Multimodal binary metadata scan (payload = utf-8 bytes of text)
# --------------------------------------------------------------------------
def q_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    media = synthesize_media(docs)
    # magic prefix = first 4 characters utf-8-encoded (the oracle cannot
    # slice BLOBs; equals the first 4 payload bytes on an ASCII corpus)
    return media.join(
        docs.select(F.col("doc_id").alias("media_id"), "text"), "media_id"
    ).select(
        "media_id",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.lower(F.hex(F.encode(F.substring("text", 1, 4), "UTF-8"))).alias(
            "magic_hex"
        ),
        F.sha2(F.col("payload"), 256).alias("sha256"),
    )


SQL_BINARY_META = """
SELECT doc_id AS media_id,
       octet_length(text::BLOB) AS n_bytes,
       lower(hex(substring(text, 1, 4)::BLOB)) AS magic_hex,
       sha256(text) AS sha256
FROM documents
"""


# --------------------------------------------------------------------------
# Multimodal resize / frame-sample pairs (fixed fixtures, news-style: the
# oracle replays the same pure decode/resize/sample functions at import
# time and embeds the expected rows as VALUES — the pair proves the
# DISTRIBUTED plumbing: Arrow binary round trip, mapInPandas schema,
# byte-budget partitioning — matches the sequential semantics bit-for-bit,
# digest-verified)
# --------------------------------------------------------------------------
N_MEDIA_IMAGES = 40
RESIZE_W, RESIZE_H = 12, 9
N_MEDIA_AUDIO = 16
FRAME_SAMPLES, FRAME_WINDOW = 4, 512


def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training_data.multimodal import resize_images, synthesize_ppm

    media = spark.createDataFrame(
        [(i, synthesize_ppm(i)) for i in range(N_MEDIA_IMAGES)],
        "media_id long, payload binary",
    )
    out = resize_images(media, RESIZE_W, RESIZE_H)
    return out.select(
        "media_id", "width", "height", F.md5("payload").alias("digest")
    )


def _media_resize_oracle_sql() -> str:
    import hashlib

    from .training_data.multimodal import _resize_ppm, synthesize_ppm

    rows = ", ".join(
        f"({i}, '{hashlib.md5(_resize_ppm(synthesize_ppm(i), RESIZE_W, RESIZE_H)).hexdigest()}')"
        for i in range(N_MEDIA_IMAGES)
    )
    return f"""
SELECT CAST(media_id AS BIGINT) AS media_id,
       {RESIZE_W} AS width, {RESIZE_H} AS height, digest
FROM (VALUES {rows}) t(media_id, digest)
"""


SQL_MEDIA_RESIZE = _media_resize_oracle_sql()


def q_media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training_data.multimodal import sample_frames, synthesize_wav

    media = spark.createDataFrame(
        [(i, synthesize_wav(i)) for i in range(N_MEDIA_AUDIO)],
        "media_id long, payload binary",
    )
    out = sample_frames(
        media, n_samples=FRAME_SAMPLES, window_frames=FRAME_WINDOW
    )
    return out.select(
        "media_id",
        "sample_idx",
        "start_frame",
        "n_frames",
        F.md5("payload").alias("digest"),
    )


def _media_frame_sample_oracle_sql() -> str:
    import hashlib

    from .training_data.multimodal import _sample_wav, synthesize_wav

    rows = []
    for i in range(N_MEDIA_AUDIO):
        for k, (start, take, blob) in enumerate(
            _sample_wav(synthesize_wav(i), FRAME_SAMPLES, FRAME_WINDOW)
        ):
            rows.append(
                f"({i}, {k}, {start}, {take}, "
                f"'{hashlib.md5(blob).hexdigest()}')"
            )
    return f"""
SELECT CAST(media_id AS BIGINT) AS media_id,
       CAST(sample_idx AS INT) AS sample_idx,
       CAST(start_frame AS BIGINT) AS start_frame,
       CAST(n_frames AS INT) AS n_frames,
       digest
FROM (VALUES {", ".join(rows)}) t(media_id, sample_idx, start_frame, n_frames, digest)
"""


SQL_MEDIA_FRAME_SAMPLE = _media_frame_sample_oracle_sql()


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract over a MIXED image/audio corpus — the pair
    exercises both real stdlib decoders (P6 luminance histogram, WAV
    windowed-RMS profile) AND the magic-byte dispatch between them, one
    row per (media, feature dimension). width/height are -1 where the
    modality has none (audio)."""
    from .training_data.multimodal import (
        FEAT_DIM,
        decode_features,
        synthesize_ppm,
        synthesize_wav,
    )

    media = spark.createDataFrame(
        [(i, synthesize_ppm(i)) for i in range(N_MEDIA_IMAGES)]
        + [(1000 + i, synthesize_wav(i)) for i in range(N_MEDIA_AUDIO)],
        "media_id long, payload binary",
    )
    out = decode_features(media, dim=FEAT_DIM)
    return out.select(
        "media_id",
        F.coalesce(F.col("width"), F.lit(-1)).cast("int").alias("width"),
        F.coalesce(F.col("height"), F.lit(-1)).cast("int").alias("height"),
        "n_frames",
        F.posexplode("feature").alias("pos", "x"),
    ).select(
        "media_id",
        "width",
        "height",
        "n_frames",
        F.col("pos").cast("int").alias("pos"),
        # feature is array<float>: the float32 value widened to double is
        # exact, and the oracle replay applies the same float32 quantization
        # (struct.pack round trip) — identical doubles, no rounding games
        F.col("x").cast("double").alias("x"),
    )


def _media_features_oracle_sql() -> str:
    import struct

    from .training_data.multimodal import (
        FEAT_DIM,
        decode_payload,
        synthesize_ppm,
        synthesize_wav,
    )

    def f32(v: float) -> float:
        return struct.unpack("f", struct.pack("f", v))[0]

    rows = []
    fixtures = [(i, synthesize_ppm(i)) for i in range(N_MEDIA_IMAGES)] + [
        (1000 + i, synthesize_wav(i)) for i in range(N_MEDIA_AUDIO)
    ]
    for mid, payload in fixtures:
        width, height, n_frames, feature = decode_payload(payload, FEAT_DIM)
        for pos, x in enumerate(feature):
            # the value rides as a STRING literal: DuckDB routes bare
            # numeric literals through DECIMAL, whose conversion to DOUBLE
            # perturbs the last bits; VARCHAR -> DOUBLE is a nearest
            # (round-trip-exact) parse of the shortest repr
            rows.append(
                f"({mid}, {-1 if width is None else width}, "
                f"{-1 if height is None else height}, {n_frames}, {pos}, "
                f"'{f32(x)!r}')"
            )
    return f"""
SELECT CAST(media_id AS BIGINT) AS media_id,
       CAST(width AS INT) AS width, CAST(height AS INT) AS height,
       CAST(n_frames AS INT) AS n_frames, CAST(pos AS INT) AS pos,
       CAST(x AS DOUBLE) AS x
FROM (VALUES {", ".join(rows)}) t(media_id, width, height, n_frames, pos, x)
"""


SQL_MEDIA_FEATURES = _media_features_oracle_sql()


# --------------------------------------------------------------------------
# Spellcheck candidate generation: trigram-Jaccard similarity join (J7/T5)
# --------------------------------------------------------------------------
SPELL_INPUTS = ["spakr", "qurey", "tabel", "windw", "streem"]
_SPELL_INPUT_SQL = ", ".join(f"('{w}')" for w in SPELL_INPUTS)


def q_spellcheck_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7/T5 via the SAME pg_trgm-padded trigram join the spellcheck
    service ships (spellcheck/service.trigram_candidates) — one
    implementation, not a divergent re-spelling; the oracle mirrors the
    padded-trigram + GREATEST(2, len-2) band semantics."""
    from .spellcheck.service import trigram_candidates

    docs = _read(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z]{2,32}', 0)")
        ).alias("word"),
    )
    dictionary = (
        doc_frequencies(words, key="word", with_ctf=True, ctf_alias="total_frequency")
        .withColumn("external_frequency", F.lit(0))
        .withColumn(
            "popularity_score",
            F.round(
                F.log1p(F.col("doc_frequency").cast("double")) * 4.0
                + F.log1p(F.col("total_frequency").cast("double")) * 2.0,
                6,
            ),
        )
    )
    return (
        trigram_candidates(dictionary, SPELL_INPUTS, limit=5)
        .select(
            "input_word",
            "word",
            F.round("similarity", 6).alias("sim"),
            F.col("popularity_score").alias("popularity"),
        )
    )


SQL_SPELLCHECK_CANDIDATES = f"""
WITH dict AS (
  SELECT word, round(ln(1 + count(DISTINCT doc_id)) * 4.0
                   + ln(1 + count(*)) * 2.0, 6) AS popularity
  FROM (
    SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]{{2,32}}')) AS word
    FROM documents
  ) GROUP BY word
  HAVING round(ln(1 + count(DISTINCT doc_id)) * 4.0 + ln(1 + count(*)) * 2.0, 6) >= 2.0
),
inputs AS (SELECT * FROM (VALUES {_SPELL_INPUT_SQL}) AS t(input_word)),
tg AS (
  SELECT d.word, d.popularity, i.input_word,
         list_distinct(list_transform(range(1, len('  ' || d.word || ' ') - 1),
                                      x -> substring('  ' || d.word || ' ', x, 3))) AS tg_w,
         list_distinct(list_transform(range(1, len('  ' || i.input_word || ' ') - 1),
                                      x -> substring('  ' || i.input_word || ' ', x, 3))) AS tg_i
  FROM dict d, inputs i
  WHERE len(d.word) BETWEEN greatest(2, len(i.input_word) - 2)
                        AND len(i.input_word) + 2
),
scored AS (
  SELECT input_word, word, popularity,
         len(list_intersect(tg_w, tg_i)) AS n_inter,
         round(len(list_intersect(tg_w, tg_i))
               / (len(tg_w) + len(tg_i) - len(list_intersect(tg_w, tg_i))), 6) AS sim
  FROM tg
)
SELECT input_word, word, sim, popularity
FROM scored
WHERE n_inter > 0
QUALIFY row_number() OVER (PARTITION BY input_word
                           ORDER BY sim DESC, popularity DESC, word ASC) <= 5
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
# the triangle pair adds the two-hop composition of 7x+13 so the graph
# actually closes wedges — the base two-generator graph is triangle-free
_TRI_GENS = _BASE_GENS + ((49, 104),)


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


# --------------------------------------------------------------------------
# Link reciprocity report (graph health): per source node with at least one
# reciprocated out-edge, the out-degree, reciprocated count, and rate —
# Newman reciprocity resolved to node granularity, over the triangle-
# closing generator graph (the base two-generator graph is near-
# reciprocity-free by construction). The reciprocation test is an
# ids-only self-join on the uniform node key.
# --------------------------------------------------------------------------
def q_link_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, edges = _edges(spark, sf_dir, _TRI_GENS)
    rev = edges.select(
        F.col("target_doc_id").alias("source_doc_id"),
        F.col("source_doc_id").alias("target_doc_id"),
    )
    recip = (
        edges.join(rev, ["source_doc_id", "target_doc_id"], "semi")
        .groupBy("source_doc_id")
        .agg(F.count(F.lit(1)).alias("n_reciprocated"))
    )
    outd = edges.groupBy("source_doc_id").agg(
        F.count(F.lit(1)).alias("out_degree")
    )
    return (
        outd.join(recip, "source_doc_id")
        .select(
            F.col("source_doc_id").alias("doc_id"),
            "out_degree",
            "n_reciprocated",
            F.round(
                F.col("n_reciprocated") / F.col("out_degree"), 6
            ).alias("recip_rate"),
        )
    )


SQL_LINK_RECIPROCITY = f"""
WITH {_edges_cte(_TRI_GENS)},
recip AS (
  SELECT a.source_doc_id, CAST(count(*) AS BIGINT) AS n_reciprocated
  FROM edges a
  WHERE EXISTS (
    SELECT 1 FROM edges b
    WHERE b.source_doc_id = a.target_doc_id
      AND b.target_doc_id = a.source_doc_id
  )
  GROUP BY a.source_doc_id
),
outd AS (
  SELECT source_doc_id, CAST(count(*) AS BIGINT) AS out_degree
  FROM edges GROUP BY source_doc_id
)
SELECT o.source_doc_id AS doc_id, out_degree, n_reciprocated,
       round(n_reciprocated / out_degree, 6) AS recip_rate
FROM outd o JOIN recip r USING (source_doc_id)
"""



def q_degree_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs, edges = _edges(spark, sf_dir)
    outd = edges.groupBy(F.col("source_doc_id").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )
    ind = edges.groupBy(F.col("target_doc_id").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("in_links")
    )
    return (
        docs.join(outd, "doc_id", "left")
        .join(ind, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_links", F.lit(0)).alias("in_links"),
        )
    )


SQL_DEGREE_COUNTS = f"""
WITH {_EDGES_CTE},
outd AS (SELECT source_doc_id AS doc_id, count(*) AS out_degree
         FROM edges GROUP BY source_doc_id),
ind AS (SELECT target_doc_id AS doc_id, count(*) AS in_links
        FROM edges GROUP BY target_doc_id)
SELECT d.doc_id,
       COALESCE(o.out_degree, 0) AS out_degree,
       COALESCE(i.in_links, 0) AS in_links
FROM documents d
LEFT JOIN outd o ON o.doc_id = d.doc_id
LEFT JOIN ind i ON i.doc_id = d.doc_id
"""


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-constant PageRank (d=0.85, 20 fixed iterations, dangling
    mass dropped) as the iterative DataFrame job, vs a recursive-CTE oracle.
    """
    from .operators.pagerank import build_document_authority

    docs, edges = _edges(spark, sf_dir)
    auth = build_document_authority(docs, edges)
    return auth.select(
        "doc_id", F.round("pagerank", 9).alias("pagerank"), "inlink_count"
    )


SQL_PAGERANK = f"""
WITH RECURSIVE {_EDGES_CTE},
outdeg AS (SELECT source_doc_id AS src, count(*)::DOUBLE AS od
           FROM edges GROUP BY source_doc_id),
edges_w AS (
  SELECT e.source_doc_id AS src, e.target_doc_id AS dst, 1.0 / o.od AS w
  FROM edges e JOIN outdeg o ON o.src = e.source_doc_id
  UNION ALL
  SELECT doc_id, doc_id, 0.0 FROM documents  -- zero-weight self-loop keeps every node in each iteration
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
ind AS (SELECT target_doc_id AS doc_id, count(*)::INT AS inlink_count
        FROM edges GROUP BY target_doc_id)
SELECT pr.doc_id, round(pr.rank, 9) AS pagerank,
       COALESCE(i.inlink_count, 0) AS inlink_count
FROM pr LEFT JOIN ind i ON i.doc_id = pr.doc_id
WHERE pr.iter = 20
"""


def q_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs/authorities (Kleinberg 1999) over the same synthetic link
    graph as ``pagerank`` — the exact-integer Jacobi formulation
    (``operators/pagerank.hits_scores``): unnormalized BIGINT trajectories
    are order-free and bit-identical across engines (invariant 4 by
    omission); the only floats are two final divides by the max, rounded 6.
    The oracle replays all 20 iterations in one recursive CTE, carrying
    both scores per row — hub and auth messages travel a single unioned
    relation so the recursive term references the CTE once.
    """
    from .operators.pagerank import hits_scores

    docs, edges = _edges(spark, sf_dir)
    return hits_scores(docs, edges)


SQL_HITS_SCORES = f"""
WITH RECURSIVE {_EDGES_CTE},
msgs AS (
  -- is_auth=1: hub(source) contributes to auth(target);
  -- is_auth=0: auth(target) contributes back to hub(source);
  -- is_auth=2: zero-contribution self loop keeps isolated nodes present
  SELECT source_doc_id AS from_node, target_doc_id AS to_node, 1 AS is_auth
  FROM edges
  UNION ALL
  SELECT target_doc_id, source_doc_id, 0 FROM edges
  UNION ALL
  SELECT doc_id, doc_id, 2 FROM documents
),
hits AS (
  SELECT 0 AS iter, doc_id,
         CAST(1 AS BIGINT) AS hub, CAST(1 AS BIGINT) AS auth
  FROM documents
  UNION ALL
  SELECT h.iter + 1, m.to_node AS doc_id,
         CAST(sum(CASE WHEN m.is_auth = 0 THEN h.auth ELSE 0 END)
              AS BIGINT) AS hub,
         CAST(sum(CASE WHEN m.is_auth = 1 THEN h.hub ELSE 0 END)
              AS BIGINT) AS auth
  FROM hits h JOIN msgs m ON m.from_node = h.doc_id
  WHERE h.iter < 20
  GROUP BY h.iter + 1, m.to_node
),
fin AS (SELECT doc_id, hub, auth FROM hits WHERE iter = 20)
SELECT doc_id, hub, auth,
       CASE WHEN max(hub) OVER () > 0
            THEN round(CAST(hub AS DOUBLE) / max(hub) OVER (), 6)
       END AS hub_score,
       CASE WHEN max(auth) OVER () > 0
            THEN round(CAST(auth AS DOUBLE) / max(auth) OVER (), 6)
       END AS auth_score
FROM fin
"""


# --------------------------------------------------------------------------
# A10/U4 — three-source frequency merge via full outer joins + full
# popularity formula (docs words + "news" words from events.props + a
# literal external wordlist)
# --------------------------------------------------------------------------
EXTERNAL_WORDS = [("spark", 1000), ("data", 500), ("quantum", 800), ("nebula", 300)]
_EXT_SQL = ", ".join(f"('{w}', {c})" for w, c in EXTERNAL_WORDS)
WORD_RUN = "[a-z]{2,32}"


def q_word_source_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .spellcheck.service import merge_frequency_sources

    docs = _read(spark, sf_dir, "documents")
    events = _read(spark, sf_dir, "events")
    doc_words = doc_frequencies(
        docs.select(
            "doc_id",
            F.explode(
                F.regexp_extract_all(F.lower("text"), F.lit(WORD_RUN), F.lit(0))
            ).alias("word"),
        ),
        key="word",
        with_ctf=True,
        ctf_alias="total_frequency",
    )
    news_words = (
        events.select(
            F.explode(
                F.regexp_extract_all(F.lower("props"), F.lit(WORD_RUN), F.lit(0))
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("total_frequency"))
    )
    ext = spark.createDataFrame(EXTERNAL_WORDS, "word string, external_frequency long")
    out = merge_frequency_sources(doc_words, news_words, ext)
    return out.select(
        "word",
        "doc_frequency",
        "total_frequency",
        "external_frequency",
        F.round("popularity_score", 6).alias("popularity_score"),
    )


SQL_WORD_SOURCE_MERGE = f"""
WITH docw AS (
  SELECT word, count(DISTINCT doc_id) AS doc_frequency, count(*) AS total_frequency
  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '{WORD_RUN}')) AS word
        FROM documents)
  GROUP BY word
),
newsw AS (
  SELECT word, count(*) AS news_tf
  FROM (SELECT unnest(regexp_extract_all(lower(props), '{WORD_RUN}')) AS word
        FROM events)
  GROUP BY word
),
extw AS (SELECT * FROM (VALUES {_EXT_SQL}) AS t(word, ext))
SELECT word,
       COALESCE(doc_frequency, 0) AS doc_frequency,
       COALESCE(d.total_frequency, 0) + COALESCE(n.news_tf, 0) AS total_frequency,
       COALESCE(e.ext, 0) AS external_frequency,
       round(ln(1 + COALESCE(doc_frequency, 0)) * 4.0
           + ln(1 + COALESCE(d.total_frequency, 0) + COALESCE(n.news_tf, 0)) * 2.0
           + ln(1 + COALESCE(e.ext, 0)) * 3.0, 6) AS popularity_score
FROM docw d
FULL OUTER JOIN newsw n USING (word)
FULL OUTER JOIN extw e USING (word)
"""


# --------------------------------------------------------------------------
# A4/J6 news scoring moved to driver_queries_news (it now runs over
# articles produced by the real feed-parse pipeline instead of the
# source='src0' stand-in); bm25_topk below shares its query-term literal.
# --------------------------------------------------------------------------
NEWS_QUERY_TERMS = ["spark", "data", "query"]


# --------------------------------------------------------------------------
# IVF ANN pair #1: deterministic SAMPLED quantizer (every 50th vector) —
# the cheap assignment-only shape. The TRAINED production quantizer
# (train_ivf_centroids, deterministic fixed-point Lloyd) has its own full
# pair below (ann_ivf_trained, r03) replaying the whole training loop in
# the oracle, plus recall tests vs brute force in
# tests/test_training_data.py (isotropic corpus +
# clustered corpus). nprobe=2 — probe the 2 nearest centroid lists, exact
# re-rank inside; the corpus is partitioned by centroid assignment so a
# query scans nprobe lists.
# --------------------------------------------------------------------------
IVF_NPROBE = 2


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _read(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cvec")
    )
    sim = S.cosine_similarity_col(F.col("embedding"), F.col("cvec"))
    # map-side partial argmax (same winner as the oracle's row_number —
    # identical ordering tuple): the vector x centroid expansion never
    # shuffles, only one partial row per (map partition, vector) does
    assigned = S.argmax_centroid(
        emb.join(F.broadcast(cents)).withColumn("_csim", sim),
        "vec_id",
        ["cent_id", "embedding"],
    ).select("vec_id", "embedding", "cent_id")
    pv = emb.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    qlit = F.array(*[F.lit(float(x)) for x in pv])
    probe_cents = [
        r["cent_id"]
        for r in cents.withColumn(
            "_qsim", S.cosine_similarity_col(qlit, F.col("cvec"))
        )
        .orderBy(F.desc("_qsim"), F.asc("cent_id"))
        .limit(IVF_NPROBE)
        .collect()
    ]
    return (
        assigned.filter(
            F.col("cent_id").isin(probe_cents) & (F.col("vec_id") != 0)
        )
        .withColumn(
            "cosine", F.round(S.cosine_similarity_col(F.col("embedding"), qlit), 6)
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
        .select("vec_id", "cosine")
    )


SQL_ANN_IVF_TOPK = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cents AS (SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id % 50 = 0),
assigned AS (
  SELECT vec_id, v, cent_id FROM (
    SELECT e.vec_id, e.v, c.cent_id,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_COS_LIST.format(a="e.v", b="c.cv")} DESC, c.cent_id ASC
           ) AS rn
    FROM e, cents c
  ) WHERE rn = 1
),
probe AS (
  SELECT c.cent_id
  FROM cents c, (SELECT v AS qv FROM e WHERE vec_id = 0) q
  ORDER BY {_COS_LIST.format(a="q.qv", b="c.cv")} DESC, c.cent_id ASC
  LIMIT {IVF_NPROBE}
)
SELECT a.vec_id,
       round({_COS_LIST.format(a="a.v", b="q.qv")}, 6) AS cosine
FROM assigned a
JOIN probe p ON p.cent_id = a.cent_id,
     (SELECT v AS qv FROM e WHERE vec_id = 0) q
WHERE a.vec_id <> 0
ORDER BY cosine DESC, a.vec_id ASC
LIMIT 10
"""


# --------------------------------------------------------------------------
# TRAINED IVF pair: the real Lloyd-k-means quantizer
# (training_data/similarity.train_ivf_centroids) end to end — md5-ordered
# init, 2 assignment/update iterations, final assignment, nprobe search.
# Portable because every stage is deterministic in BOTH engines: md5 init
# order, left-to-right double folds for cosine (aggregate vs
# list_sum(list_transform(...))), and FIXED-POINT centroid means (per-value
# micros -> integer sum -> double divide, the sum_fixed6 pattern), so the
# trained k x d matrix is bit-identical and assignments can't flip.
# --------------------------------------------------------------------------
IVF_TRAIN_K = 8
IVF_TRAIN_ITERS = 2
IVF_TRAIN_NPROBE = 3
_EMB_DIM = 64  # /root/testdata/sf*/embeddings.parquet vector length


def q_ann_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _read(spark, sf_dir, "embeddings")
    cents = S.train_ivf_centroids(emb, k=IVF_TRAIN_K, iters=IVF_TRAIN_ITERS)
    assigned = S.ivf_assign(emb, cents)
    pv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[
            "embedding"
        ]
    ]
    return S.ivf_topk(
        assigned, cents, pv, k=10, nprobe=IVF_TRAIN_NPROBE, exclude_id=0
    )


def _ivf_trained_oracle_sql() -> str:
    """Chained-CTE replay of train_ivf_centroids: c0 = md5-order seeds,
    then per iteration assign (argmax cosine, tie cent_id asc) + fixed-point
    per-dimension means (empty clusters keep their centroid)."""
    cte = f"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
dims AS (SELECT unnest(generate_series(1, {_EMB_DIM})) AS i),
c0 AS (
  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1
           AS cent_id, v AS cv
  FROM (SELECT vec_id, v FROM e
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {IVF_TRAIN_K})
)"""
    prev = "c0"
    for it in range(1, IVF_TRAIN_ITERS + 1):
        cos = _COS_LIST.format(a="e.v", b="c.cv")
        cte += f""",
a{it} AS (
  SELECT vec_id, v, cent_id FROM (
    SELECT e.vec_id, e.v, c.cent_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {cos} DESC, c.cent_id ASC) AS rn
    FROM e, {prev} c
  ) WHERE rn = 1
),
m{it} AS (
  SELECT cent_id, i,
         sum({SQL_FIXED6_LONG.format(col="v[i]")}) AS s, count(*) AS n
  FROM a{it}, dims GROUP BY cent_id, i
),
c{it} AS (
  SELECT p.cent_id, COALESCE(u.cv, p.cv) AS cv
  FROM {prev} p LEFT JOIN (
    SELECT cent_id, list(s / (1000000.0 * n) ORDER BY i) AS cv
    FROM m{it} GROUP BY cent_id
  ) u USING (cent_id)
)"""
        prev = f"c{it}"
    q_cos = _COS_LIST.format(a="q.qv", b="c.cv")
    f_cos = _COS_LIST.format(a="e.v", b="c.cv")
    out_cos = _COS_LIST.format(a="a.v", b="q.qv")
    return f"""{cte},
probe AS (
  SELECT c.cent_id
  FROM {prev} c, (SELECT v AS qv FROM e WHERE vec_id = 0) q
  ORDER BY {q_cos} DESC, c.cent_id ASC
  LIMIT {IVF_TRAIN_NPROBE}
),
af AS (
  SELECT vec_id, v, cent_id FROM (
    SELECT e.vec_id, e.v, c.cent_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {f_cos} DESC, c.cent_id ASC) AS rn
    FROM e, {prev} c
  ) WHERE rn = 1
)
SELECT a.vec_id, round({out_cos}, 6) AS cosine
FROM af a
JOIN probe p ON p.cent_id = a.cent_id,
     (SELECT v AS qv FROM e WHERE vec_id = 0) q
WHERE a.vec_id <> 0
ORDER BY cosine DESC, a.vec_id ASC
LIMIT 10
"""


SQL_ANN_IVF_TRAINED = _ivf_trained_oracle_sql()


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
# Postings-codec framing parity (north_rule: "per-term docID-delta +
# varint-compressed posting lists"). The Spark side runs the REAL
# ``codec.encode_postings`` over each term's posting list (grouped-map
# Arrow stage, exactly how ``operators/postings.py`` builds the index) and
# reports per-term framing stats: blob byte length, block count, and
# checksums of both skip arrays. The oracle recomputes every number from
# first principles — an exact integer varint-length ladder over the
# docID-delta stream, 128-posting block restarts (absolute first docid is
# written order-preserving-unsigned, i.e. +2^63, hence the HUGEINT
# intermediates — cast away before output per invariant 1), and the three
# per-posting tf varints (title/desc = 0 here: the documents table is
# body-only). Agreement proves the compression framing itself, not just
# decoded query results, without shipping bytes across engines.
# --------------------------------------------------------------------------
def q_postings_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from .codec import encode_postings

    docs = _read(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RUN), F.lit(0))
        ).alias("term"),
    )
    tf = toks.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))

    def encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        ids = [int(d) for d in pdf["doc_id"]]
        tfs = [int(t) for t in pdf["tf"]]
        zeros = [0] * len(ids)
        blob, block_max, block_last, block_offset = encode_postings(
            ids, zeros, zeros, tfs
        )
        return pd.DataFrame(
            {
                "term": [str(pdf["term"].iloc[0])],
                "df": [len(ids)],
                "n_blocks": [len(block_offset)],
                "blob_bytes": [len(blob)],
                # body-only postings: block_max = 1.0 * max tf, an exact
                # whole double — the int sum is lossless
                "sum_block_max_tf": [int(sum(int(w) for w in block_max))],
                "sum_block_last": [sum(block_last)],
            }
        )

    out_schema = (
        "term string, df long, n_blocks long, blob_bytes long, "
        "sum_block_max_tf long, sum_block_last long"
    )
    return (
        tf.groupBy("term")
        .applyInPandas(encode_group, out_schema)
        .orderBy("term")
    )


def _varint_len_sql(expr: str) -> str:
    """Exact varint byte length of a non-negative HUGEINT expression:
    max(1, ceil(bit_length/7)) as a pure integer threshold ladder (no
    float log2 — exact at every 2^(7k) boundary)."""
    cases = " ".join(
        f"WHEN {expr} < {1 << (7 * k)} THEN {k}" for k in range(1, 10)
    )
    return f"(CASE {cases} ELSE 10 END)"


def _postings_bytes_sql() -> str:
    u63 = 1 << 63
    first_len = _varint_len_sql(f"(CAST(doc_id AS HUGEINT) + {u63})")
    delta_len = _varint_len_sql("CAST(doc_id - prev AS HUGEINT)")
    tf_len = _varint_len_sql("CAST(tf AS HUGEINT)")
    header_len = _varint_len_sql("CAST(sum(n_in_block) AS HUGEINT)")
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term
  FROM documents
),
tf AS (SELECT term, doc_id, count(*) AS tf FROM toks GROUP BY term, doc_id),
seq AS (
  SELECT term, doc_id, tf,
         row_number() OVER (PARTITION BY term ORDER BY doc_id) - 1 AS i,
         lag(doc_id) OVER (PARTITION BY term ORDER BY doc_id) AS prev
  FROM tf
),
per AS (
  SELECT term, doc_id, tf, i // 128 AS blk,
         (CASE WHEN i % 128 = 0 THEN {first_len} ELSE {delta_len} END)
         + 2 + {tf_len} AS nbytes
  FROM seq
),
blk AS (
  SELECT term, blk,
         count(*) AS n_in_block,
         max(tf) AS block_max_tf,
         max(doc_id) AS block_last,
         sum(nbytes) AS block_bytes
  FROM per GROUP BY term, blk
)
SELECT term,
       CAST(sum(n_in_block) AS BIGINT) AS df,
       CAST(count(*) AS BIGINT) AS n_blocks,
       CAST({header_len} + sum(block_bytes) AS BIGINT) AS blob_bytes,
       CAST(sum(block_max_tf) AS BIGINT) AS sum_block_max_tf,
       CAST(sum(block_last) AS BIGINT) AS sum_block_last
FROM blk
GROUP BY term
ORDER BY term
"""


SQL_POSTINGS_BYTES = _postings_bytes_sql()


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
# Term-bucket balance audit: the layout report an indexing pipeline runs
# before committing to a term_bucket modulus (operators/postings.py keys
# storage partitions on pmod(hash(term), n_buckets); invariant 7 makes the
# modulus load-bearing). Per bucket: dictionary terms, postings (sum of
# df), occurrences (sum of ctf); plus the two balance statistics —
# max-over-avg postings and the coefficient of variation — as constant
# columns. The pair uses the md5-prefix bucket (engine-portable, invariant
# 2; the production layout uses xxhash64, same uniformity class) and a
# modulus of 8 scaled to the synthetic 30-term vocabulary (a 64-bucket
# audit of 30 terms is all-empty-or-singleton — the degenerate-fixture
# trap). df comes from the two-phase doc_frequencies helper (invariant 6:
# never countDistinct on the Zipf-skewed term key). The variance numerator
# nb*spp - tp^2 stays in exact BIGINT; cv/max_over_avg are single double
# expressions of exact integers, rounded 6, with CASE-guarded divisions.
# --------------------------------------------------------------------------
SHARD_BUCKETS = 8


def q_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.expr(f"regexp_extract_all(lower(text), '{TOKEN_RUN}', 0)")
        ).alias("term"),
    )
    per_term = doc_frequencies(toks, with_ctf=True)
    bucket = F.pmod(
        F.conv(F.substring(F.md5("term"), 1, 8), 16, 10).cast("long"),
        F.lit(SHARD_BUCKETS),
    ).cast("int")
    per_bucket = (
        per_term.select(
            bucket.alias("bucket"), "doc_frequency", "ctf"
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.sum("doc_frequency").cast("long").alias("n_postings"),
            F.sum("ctf").cast("long").alias("n_occurrences"),
        )
    )
    tot = per_bucket.agg(
        F.count(F.lit(1)).cast("long").alias("nb"),
        F.sum("n_postings").cast("long").alias("tp"),
        F.max("n_postings").cast("long").alias("mx"),
        F.sum(F.col("n_postings") * F.col("n_postings")).cast("long").alias("spp"),
    )
    nb_d = F.col("nb").cast("double")
    tp_d = F.col("tp").cast("double")
    mx_d = F.col("mx").cast("double")
    vnum = F.greatest(
        F.col("nb") * F.col("spp") - F.col("tp") * F.col("tp"), F.lit(0)
    )
    fit = tot.select(
        F.when(F.col("tp") != 0, F.round(mx_d * nb_d / tp_d, 6)).alias(
            "max_over_avg"
        ),
        F.when(
            F.col("tp") != 0, F.round(F.sqrt(vnum.cast("double")) / tp_d, 6)
        ).alias("cv"),
    )
    return per_bucket.crossJoin(F.broadcast(fit)).orderBy("bucket")


SQL_SHARD_BALANCE = f"""
WITH t AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term
  FROM documents
),
pt AS (
  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS dfreq,
         CAST(count(*) AS BIGINT) AS ctf
  FROM t GROUP BY term
),
pb AS (
  SELECT CAST(CAST('0x' || substr(md5(term), 1, 8) AS BIGINT)
              % {SHARD_BUCKETS} AS INTEGER) AS bucket,
         CAST(count(*) AS BIGINT) AS n_terms,
         CAST(sum(dfreq) AS BIGINT) AS n_postings,
         CAST(sum(ctf) AS BIGINT) AS n_occurrences
  FROM pt GROUP BY 1
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS nb,
         CAST(sum(n_postings) AS BIGINT) AS tp,
         CAST(max(n_postings) AS BIGINT) AS mx,
         CAST(sum(n_postings * n_postings) AS BIGINT) AS spp
  FROM pb
),
fit AS (
  SELECT CASE WHEN tp <> 0
              THEN round(CAST(mx AS DOUBLE) * CAST(nb AS DOUBLE)
                         / CAST(tp AS DOUBLE), 6) END AS max_over_avg,
         CASE WHEN tp <> 0
              THEN round(sqrt(CAST(greatest(nb * spp - tp * tp, 0) AS DOUBLE))
                         / CAST(tp AS DOUBLE), 6) END AS cv
  FROM tot
)
SELECT pb.bucket, pb.n_terms, pb.n_postings, pb.n_occurrences,
       fit.max_over_avg, fit.cv
FROM pb, fit
ORDER BY bucket
"""


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
# Per-node triangle counts + local clustering coefficient over the link
# graph (operators/pagerank.py triangle_counts — degree-ordered
# "compact-forward" orientation, O(m^1.5) wedge work regardless of skew;
# the web-spam density signal of Becchetti et al. KDD'08). The edge set
# adds a third deterministic generator (x -> 49x+104 = the two-hop
# composition of the 7x+13 generator) so the synthetic graph actually
# closes wedges — the base two-generator graph is triangle-free at every
# sf. All counts BIGINT; clustering is the one rounded divide.
# --------------------------------------------------------------------------
_TRI_EDGES_CTE = _edges_cte(_TRI_GENS)


def q_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.pagerank import triangle_counts

    _, edges = _edges(spark, sf_dir, gens=_TRI_GENS)
    return triangle_counts(edges)


SQL_TRIANGLE_COUNTS = f"""
WITH {_TRI_EDGES_CTE},
und AS (
  SELECT DISTINCT least(source_doc_id, target_doc_id) AS a,
                  greatest(source_doc_id, target_doc_id) AS b
  FROM edges
),
deg AS (
  SELECT v, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT a AS v FROM und UNION ALL SELECT b FROM und
  ) GROUP BY v
),
o AS (
  SELECT CASE WHEN (da.d, u.a) < (db.d, u.b) THEN u.a ELSE u.b END AS src,
         CASE WHEN (da.d, u.a) < (db.d, u.b) THEN u.b ELSE u.a END AS dst,
         CASE WHEN (da.d, u.a) < (db.d, u.b) THEN db.d ELSE da.d END AS dd
  FROM und u JOIN deg da ON da.v = u.a JOIN deg db ON db.v = u.b
),
tri AS (
  SELECT x.src AS u, x.dst AS v, y.dst AS w
  FROM o x JOIN o y ON y.src = x.src AND ((x.dd, x.dst) < (y.dd, y.dst))
  JOIN o z ON z.src = x.dst AND z.dst = y.dst
),
corners AS (
  SELECT u AS v FROM tri UNION ALL SELECT v FROM tri UNION ALL SELECT w FROM tri
),
tcnt AS (SELECT v, CAST(count(*) AS BIGINT) AS triangles FROM corners GROUP BY v)
SELECT d.v AS doc_id, d.d AS degree,
       CAST(COALESCE(t.triangles, 0) AS BIGINT) AS triangles,
       CASE WHEN d.d >= 2 THEN
         round(CAST(2 * COALESCE(t.triangles, 0) AS DOUBLE) / (d.d * (d.d - 1)), 6)
       ELSE CAST(0 AS DOUBLE) END AS clustering
FROM deg d LEFT JOIN tcnt t ON t.v = d.v
"""


BFS_SEED_MOD = 97
BFS_ITERS = 10


def q_link_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS crawl depth (`operators/pagerank.bfs_distance`):
    min hops from the doc_id%97==0 seed set along the synthetic link
    graph, exactly 10 relaxation rounds (fixed horizon — identical output
    across engines regardless of diameter); unreached docs absent. Pure
    integers. The oracle replays the rounds in one recursive CTE; the
    zero-weight self message keeps each node's current distance in play so
    the recursive term references the CTE once.
    """
    from .operators.pagerank import bfs_distance

    docs, edges = _edges(spark, sf_dir)
    seeds = docs.filter(F.col("doc_id") % BFS_SEED_MOD == 0)
    return bfs_distance(seeds, edges, iterations=BFS_ITERS)


SQL_LINK_DISTANCE = f"""
WITH RECURSIVE {_EDGES_CTE},
msgs AS (
  SELECT source_doc_id AS from_node, target_doc_id AS to_node, 1 AS w
  FROM edges
  UNION ALL
  SELECT doc_id, doc_id, 0 FROM documents
),
bfs AS (
  SELECT 0 AS iter, doc_id, CAST(0 AS BIGINT) AS dist
  FROM documents WHERE doc_id % {BFS_SEED_MOD} = 0
  UNION ALL
  SELECT b.iter + 1, m.to_node AS doc_id,
         CAST(min(b.dist + m.w) AS BIGINT) AS dist
  FROM bfs b JOIN msgs m ON m.from_node = b.doc_id
  WHERE b.iter < {BFS_ITERS}
  GROUP BY 1, 2
)
SELECT doc_id, dist FROM bfs WHERE iter = {BFS_ITERS}
"""


PPR_SEED_MOD = 71


def q_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank (Haveliwala 2002) with the teleport uniform
    over the doc_id%71==0 seed set, 20 iterations, dangling mass dropped
    (`operators/pagerank.personalized_pagerank`); same recursive-CTE
    oracle shape as the global `pagerank` pair, rounded 9.
    """
    from .operators.pagerank import personalized_pagerank

    docs, edges = _edges(spark, sf_dir)
    seeds = docs.filter(F.col("doc_id") % PPR_SEED_MOD == 0)
    ppr = personalized_pagerank(docs, edges, seeds)
    return ppr.select("doc_id", F.round("ppr", 9).alias("ppr"))


SQL_PERSONALIZED_PAGERANK = f"""
WITH RECURSIVE {_EDGES_CTE},
ss AS (SELECT count(*) AS k FROM documents WHERE doc_id % {PPR_SEED_MOD} = 0),
outdeg AS (SELECT source_doc_id AS src, count(*)::DOUBLE AS od
           FROM edges GROUP BY source_doc_id),
edges_w AS (
  SELECT e.source_doc_id AS src, e.target_doc_id AS dst, 1.0 / o.od AS w
  FROM edges e JOIN outdeg o ON o.src = e.source_doc_id
  UNION ALL
  SELECT doc_id, doc_id, 0.0 FROM documents  -- zero-weight self-loop keeps every node in each iteration
),
pr AS (
  SELECT 0 AS iter, doc_id,
         CASE WHEN doc_id % {PPR_SEED_MOD} = 0
              THEN 1.0 / (SELECT k FROM ss) ELSE 0.0 END AS rank
  FROM documents
  UNION ALL
  SELECT pr.iter + 1, e.dst AS doc_id,
         CASE WHEN e.dst % {PPR_SEED_MOD} = 0
              THEN (1 - 0.85) / (SELECT k FROM ss) ELSE 0.0 END
         + 0.85 * sum(pr.rank * e.w) AS rank
  FROM pr JOIN edges_w e ON e.src = pr.doc_id
  WHERE pr.iter < 20
  GROUP BY pr.iter + 1, e.dst
)
SELECT doc_id, round(rank, 9) AS ppr FROM pr WHERE iter = 20
"""


def q_graph_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row global graph mixing report over the 3-generator graph:
    edge/node counts, reciprocity (fraction of directed edges whose
    reverse exists — Garlaschelli & Loffredo 2004), and undirected degree
    assortativity (Newman 2002's Pearson r over edge-endpoint degrees,
    plain-degree variant, both orientations counted). All moments are
    exact BIGINT sums (invariant 4): the only floats are the reciprocity
    divide and the single assortativity expression — its two variance
    factors are exact sub-2^53 BIGINTs cast to DOUBLE before the product
    (a BIGINT product could overflow; the double product rounds
    identically in both engines) — each rounded 6. Everything is in-plan
    1-row aggregates cross-joined (scalar_count pattern, zero driver
    actions).
    """
    _, edges = _edges(spark, sf_dir, gens=_TRI_GENS)
    e = edges.cache()
    rev = e.select(
        F.col("target_doc_id").alias("source_doc_id"),
        F.col("source_doc_id").alias("target_doc_id"),
    )
    ecnt = e.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    rcnt = e.join(rev, ["source_doc_id", "target_doc_id"]).agg(
        F.count(F.lit(1)).cast("long").alias("n_recip")
    )
    und = (
        e.select(
            F.least("source_doc_id", "target_doc_id").alias("a"),
            F.greatest("source_doc_id", "target_doc_id").alias("b"),
        )
        .distinct()
    )
    sym = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = sym.groupBy("a").agg(F.count(F.lit(1)).cast("long").alias("d"))
    ncnt = deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    pairs = (
        sym.join(deg.select(F.col("a"), F.col("d").alias("dx")), "a")
        .join(
            deg.select(F.col("a").alias("b"), F.col("d").alias("dy")), "b"
        )
    )
    mom = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("dx").cast("long").alias("sx"),
        F.sum("dy").cast("long").alias("sy"),
        F.sum(F.col("dx") * F.col("dx")).cast("long").alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).cast("long").alias("syy"),
        F.sum(F.col("dx") * F.col("dy")).cast("long").alias("sxy"),
    )
    vx = F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")
    num = F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")
    return (
        ecnt.crossJoin(rcnt)
        .crossJoin(ncnt)
        .crossJoin(mom)
        .select(
            "n_nodes",
            "n_edges",
            F.round(
                F.col("n_recip").cast("double") / F.col("n_edges"), 6
            ).alias("reciprocity"),
            F.when(
                (vx > 0) & (vy > 0),
                F.round(
                    num.cast("double")
                    / F.sqrt(vx.cast("double") * vy.cast("double")),
                    6,
                ),
            ).alias("assortativity"),
        )
    )


SQL_GRAPH_MIXING = f"""
WITH {_TRI_EDGES_CTE},
ecnt AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM edges),
rcnt AS (
  SELECT CAST(count(*) AS BIGINT) AS n_recip
  FROM edges e JOIN edges r
    ON r.source_doc_id = e.target_doc_id
   AND r.target_doc_id = e.source_doc_id
),
und AS (
  SELECT DISTINCT least(source_doc_id, target_doc_id) AS a,
                  greatest(source_doc_id, target_doc_id) AS b
  FROM edges
),
sym AS (SELECT a, b FROM und UNION ALL SELECT b, a FROM und),
deg AS (SELECT a, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY a),
ncnt AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg),
mom AS (
  SELECT CAST(count(*) AS BIGINT) AS m,
         CAST(sum(x.d) AS BIGINT) AS sx, CAST(sum(y.d) AS BIGINT) AS sy,
         CAST(sum(x.d * x.d) AS BIGINT) AS sxx,
         CAST(sum(y.d * y.d) AS BIGINT) AS syy,
         CAST(sum(x.d * y.d) AS BIGINT) AS sxy
  FROM sym s JOIN deg x ON x.a = s.a JOIN deg y ON y.a = s.b
)
SELECT n.n_nodes, e.n_edges,
       round(CAST(r.n_recip AS DOUBLE) / e.n_edges, 6) AS reciprocity,
       CASE WHEN (m.m * m.sxx - m.sx * m.sx) > 0
             AND (m.m * m.syy - m.sy * m.sy) > 0 THEN
         round(CAST(m.m * m.sxy - m.sx * m.sy AS DOUBLE)
               / sqrt(CAST(m.m * m.sxx - m.sx * m.sx AS DOUBLE)
                      * CAST(m.m * m.syy - m.sy * m.sy AS DOUBLE)), 6)
       END AS assortativity
FROM ecnt e, rcnt r, ncnt n, mom m
"""


LPA_ROUNDS = 5


def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synchronous label propagation (Raghavan et al. 2007
    with (count desc, label asc) tie-break instead of RNG) on the
    3-generator undirected graph, exactly 5 rounds
    (`operators/pagerank.label_propagation`). Pure integers; the oracle
    unrolls the rounds as a MATERIALIZED-CTE ladder with a per-node
    QUALIFY argmax (window keyed on the uniform node id).
    """
    from .operators.pagerank import label_propagation

    _, edges = _edges(spark, sf_dir, gens=_TRI_GENS)
    return label_propagation(edges, rounds=LPA_ROUNDS)


def _lpa_sql(rounds: int) -> str:
    parts = [
        """und AS MATERIALIZED (
  SELECT DISTINCT least(source_doc_id, target_doc_id) AS a,
                  greatest(source_doc_id, target_doc_id) AS b
  FROM edges
)""",
        "sym AS MATERIALIZED (SELECT a, b FROM und"
        " UNION ALL SELECT b, a FROM und)",
        "l0 AS MATERIALIZED (SELECT DISTINCT a AS v, a AS label FROM sym)",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"l{r} AS MATERIALIZED ("
            f"SELECT s.a AS v, l.label,"
            f" CAST(count(*) AS BIGINT) AS n"
            f" FROM sym s JOIN l{r - 1} l ON l.v = s.b"
            f" GROUP BY 1, 2"
            f" QUALIFY row_number() OVER (PARTITION BY s.a"
            f" ORDER BY count(*) DESC, l.label ASC) = 1)"
        )
    chain = ",\n".join(parts)
    return (
        f"WITH {_TRI_EDGES_CTE.rstrip()},\n{chain}\n"
        f"SELECT v AS doc_id, CAST(label AS BIGINT) AS label FROM l{rounds}"
    )


SQL_LABEL_PROPAGATION = _lpa_sql(LPA_ROUNDS)


def q_degree_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k_nn(k) mean-neighbor-degree curve (Pastor-Satorras, Vázquez &
    Vespignani 2001) over the 3-generator undirected graph — the
    per-degree-class companion to the scalar assortativity in
    `graph_mixing` (a falling curve = hubs attach to leaves). EXACT:
    because every node of degree k has exactly k neighbors, the average
    of per-node neighbor-degree means over class k equals
    Σ_class Σ_neighbors d(u) / (k·n_k) — ONE divide of exact BIGINTs,
    rounded 6 (invariant 4); no nested fractions. Shuffles key on node
    ids and the bounded degree class, map-side partials throughout.
    """
    _, edges = _edges(spark, sf_dir, gens=_TRI_GENS)
    und = (
        edges.select(
            F.least("source_doc_id", "target_doc_id").alias("a"),
            F.greatest("source_doc_id", "target_doc_id").alias("b"),
        )
        .distinct()
    )
    sym = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = sym.groupBy("a").agg(F.count(F.lit(1)).cast("long").alias("d"))
    nbr = (
        sym.join(deg.select(F.col("a").alias("b"), F.col("d").alias("db")), "b")
        .groupBy("a")
        .agg(F.sum("db").cast("long").alias("nbr_sum"))
    )
    return (
        deg.join(nbr, "a")
        .groupBy("d")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum("nbr_sum").cast("long").alias("s"),
        )
        .select(
            F.col("d").alias("degree"),
            "n_nodes",
            F.round(
                F.col("s").cast("double") / (F.col("d") * F.col("n_nodes")), 6
            ).alias("knn"),
        )
    )


SQL_DEGREE_CORRELATION = f"""
WITH {_TRI_EDGES_CTE},
und AS (
  SELECT DISTINCT least(source_doc_id, target_doc_id) AS a,
                  greatest(source_doc_id, target_doc_id) AS b
  FROM edges
),
sym AS (SELECT a, b FROM und UNION ALL SELECT b, a FROM und),
deg AS (SELECT a, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY a),
nbr AS (
  SELECT s.a, CAST(sum(x.d) AS BIGINT) AS nbr_sum
  FROM sym s JOIN deg x ON x.a = s.b
  GROUP BY s.a
)
SELECT g.d AS degree, CAST(count(*) AS BIGINT) AS n_nodes,
       round(CAST(CAST(sum(n.nbr_sum) AS BIGINT) AS DOUBLE)
             / (g.d * count(*)), 6) AS knn
FROM deg g JOIN nbr n USING (a)
GROUP BY g.d
"""


KCORE_K = 5
KCORE_ROUNDS = 8


def q_k_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core peeling (Seidman 1983) over the 3-generator undirected
    graph: exactly 8 synchronous rounds at k=5 (`operators/pagerank.
    k_core`) — a fixed horizon, so both engines emit the identical
    survivor set whether or not peeling has converged. The oracle unrolls
    the rounds as a chained-CTE ladder (the bpe_merges precedent — a
    recursive CTE can't reference itself twice per round, which the
    both-endpoints survivor test needs). Pure-integer degrees.
    """
    from .operators.pagerank import k_core

    _, edges = _edges(spark, sf_dir, gens=_TRI_GENS)
    return k_core(edges, k=KCORE_K, rounds=KCORE_ROUNDS)


def _kcore_sql(k: int, rounds: int) -> str:
    # every c{r} is referenced TWICE by d{r+1} (both-endpoint survivor
    # test): without MATERIALIZED DuckDB inlines CTEs and the ladder
    # re-evaluates 2^rounds times
    parts = [
        """und AS MATERIALIZED (
  SELECT DISTINCT least(source_doc_id, target_doc_id) AS a,
                  greatest(source_doc_id, target_doc_id) AS b
  FROM edges
)""",
        "sym AS MATERIALIZED (SELECT a, b FROM und"
        " UNION ALL SELECT b, a FROM und)",
        "c0 AS MATERIALIZED (SELECT DISTINCT a AS v FROM sym)",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"d{r} AS MATERIALIZED (SELECT s.a AS v,"
            f" CAST(count(*) AS BIGINT) AS c"
            f" FROM sym s JOIN c{r - 1} x ON x.v = s.a"
            f" JOIN c{r - 1} y ON y.v = s.b"
            f" GROUP BY s.a HAVING count(*) >= {k})"
        )
        parts.append(f"c{r} AS MATERIALIZED (SELECT v FROM d{r})")
    chain = ",\n".join(parts)
    return (
        f"WITH {_TRI_EDGES_CTE.rstrip()},\n{chain}\n"
        f"SELECT v AS doc_id, c AS core_degree FROM d{rounds}"
    )


SQL_K_CORE = _kcore_sql(KCORE_K, KCORE_ROUNDS)


COCIT_MAX_IN_DEGREE = 64


def q_cocitation_coupling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-citation (Small 1973) + bibliographic coupling (Kessler 1963)
    over the 3-generator synthetic link graph — the related-pages signal
    (`operators/pagerank.cocitation_coupling`). Pure-integer counts; the
    coupling self-join stop-lists targets with in-degree > 64 (the hub-
    removal skew mitigation, part of the semantics — applied identically
    in the oracle, though the synthetic in-degrees never reach it).
    """
    from .operators.pagerank import cocitation_coupling

    _, edges = _edges(spark, sf_dir, gens=_TRI_GENS)
    return cocitation_coupling(edges, max_in_degree=COCIT_MAX_IN_DEGREE)


SQL_COCITATION_COUPLING = f"""
WITH {_TRI_EDGES_CTE},
cocit AS (
  SELECT e1.target_doc_id AS a, e2.target_doc_id AS b,
         CAST(count(*) AS BIGINT) AS cocitation
  FROM edges e1 JOIN edges e2 ON e1.source_doc_id = e2.source_doc_id
  WHERE e1.target_doc_id < e2.target_doc_id
  GROUP BY 1, 2
),
indeg AS (
  SELECT target_doc_id AS dst, count(*) AS ind FROM edges GROUP BY 1
),
kept AS (
  SELECT e.source_doc_id AS src, e.target_doc_id AS dst
  FROM edges e JOIN indeg i ON i.dst = e.target_doc_id
  WHERE i.ind <= {COCIT_MAX_IN_DEGREE}
),
coup AS (
  SELECT c1.src AS a, c2.src AS b, CAST(count(*) AS BIGINT) AS coupling
  FROM kept c1 JOIN kept c2 ON c1.dst = c2.dst
  WHERE c1.src < c2.src
  GROUP BY 1, 2
)
SELECT COALESCE(cc.a, cp.a) AS doc_a, COALESCE(cc.b, cp.b) AS doc_b,
       CAST(COALESCE(cc.cocitation, 0) AS BIGINT) AS cocitation,
       CAST(COALESCE(cp.coupling, 0) AS BIGINT) AS coupling
FROM cocit cc FULL OUTER JOIN coup cp ON cp.a = cc.a AND cp.b = cc.b
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


# --------------------------------------------------------------------------
# Weekly activity profile: events per (type, day-of-week, hour) with the
# share of the type's total — the seasonality grid an ingest scheduler
# reads. Invariant 3: dow/hour derive from PURE INTEGER arithmetic on
# ntz_epoch_us (1970-01-01 was a Thursday ⇒ dow = (day_idx + 4) % 7 with
# 0 = Sunday) — never an engine/locale-dependent date_part('dow'). The
# grid key is bounded (types × 7 × 24), counts exact BIGINTs with
# map-side partials; share = one exact divide rounded 6.
# --------------------------------------------------------------------------
US_PER_HOUR_DIV = 3_600_000_000


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
# Connected components over the MinHash-LSH near-dup graph: pairs -> dup
# GROUPS with a canonical (min-id) representative — the step after pairwise
# detection in a dedup pipeline. Spark: iterative min-label propagation;
# oracle: recursive-CTE transitive closure (components are tiny).
# --------------------------------------------------------------------------
def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _mut_docs(spark, sf_dir)
    sig = D.minhash_signatures(D.shingles(corpus), num_perm=9)
    pairs = D.lsh_candidate_pairs(sig, rows_per_band=3)
    return D.connected_components(pairs)


SQL_DEDUP_COMPONENTS = f"""
WITH RECURSIVE {_MUT_DOCS_CTE}, {_shingle_cte()},
sig AS (
  SELECT doc_id, s.seed, min(md5(s.seed || ':' || shingle)) AS mh
  FROM sh, (SELECT unnest(range(9))::INT AS seed) s
  GROUP BY doc_id, s.seed
),
bands AS (
  SELECT doc_id, (seed // 3)::INT AS band,
         md5(string_agg(mh, '|' ORDER BY seed)) AS bh
  FROM sig GROUP BY doc_id, seed // 3
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach AS (
  SELECT src AS node, dst AS peer FROM edges
  UNION
  SELECT r.node, e.dst FROM reach r JOIN edges e ON e.src = r.peer
)
SELECT node AS doc_id,
       least(node, min(peer)) AS component
FROM reach
GROUP BY node
"""


# --------------------------------------------------------------------------
# Canonical representatives: per near-dup cluster (same LSH -> connected-
# components chain as dedup_components), the member a curation pipeline
# KEEPS — argmax(text length), ties to the min id — plus the cluster size.
# Spark: dedup.canonical_representatives (struct-max aggregate, no window
# sort); oracle: the recursive-closure components CTE + a row_number pick.
# length() counts characters on the identical derived text in both engines;
# all outputs are exact BIGINTs.
# --------------------------------------------------------------------------
def q_canonical_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _mut_docs(spark, sf_dir)
    sig = D.minhash_signatures(D.shingles(corpus), num_perm=9)
    pairs = D.lsh_candidate_pairs(sig, rows_per_band=3)
    comps = D.connected_components(pairs)
    scores = corpus.select(
        "doc_id", F.length("text").cast("long").alias("canon_len")
    )
    return D.canonical_representatives(comps, scores, score_col="canon_len")


SQL_CANONICAL_DOCS = f"""
WITH RECURSIVE {_MUT_DOCS_CTE}, {_shingle_cte()},
sig AS (
  SELECT doc_id, s.seed, min(md5(s.seed || ':' || shingle)) AS mh
  FROM sh, (SELECT unnest(range(9))::INT AS seed) s
  GROUP BY doc_id, s.seed
),
bands AS (
  SELECT doc_id, (seed // 3)::INT AS band,
         md5(string_agg(mh, '|' ORDER BY seed)) AS bh
  FROM sig GROUP BY doc_id, seed // 3
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach AS (
  SELECT src AS node, dst AS peer FROM edges
  UNION
  SELECT r.node, e.dst FROM reach r JOIN edges e ON e.src = r.peer
),
comp AS (
  SELECT node AS doc_id, least(node, min(peer)) AS component
  FROM reach GROUP BY node
),
scored AS (
  SELECT c.component, c.doc_id, CAST(length(m.text) AS BIGINT) AS canon_len
  FROM comp c JOIN corpus m USING (doc_id)
),
ranked AS (
  SELECT component, doc_id, canon_len,
         row_number() OVER (
           PARTITION BY component ORDER BY canon_len DESC, doc_id ASC
         ) AS rn,
         CAST(count(*) OVER (PARTITION BY component) AS BIGINT) AS n_members
  FROM scored
)
SELECT component, doc_id AS canonical_doc, canon_len, n_members
FROM ranked WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Embedding diversity (similarity.py embedding_diversity): per-label member
# count, mean norm, and the EXACT mean pairwise cosine via the Gram
# identity sum_{i!=j} ui.uj = |sum u|^2 - sum |ui|^2 — linear, no self-join.
# Unit vectors quantized ONCE to integer 1e-4 components (round(...*q, 0)
# is an integer-valued double — cast exact in both engines); all sums pure
# BIGINT (invariant 4); final ratios single double expressions, rounded 6.
# ---------------------------------------------------------------------------
DIVERSITY_Q = 10_000


def q_embedding_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training_data import similarity as S

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "label", "embedding"
    )
    return S.embedding_diversity(emb, q=DIVERSITY_Q)


SQL_EMBEDDING_DIVERSITY = f"""
WITH e AS (
  SELECT label, embedding::DOUBLE[] AS v,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
  FROM embeddings
),
u AS (
  SELECT label,
         {SQL_FIXED6_LONG.format(col="nrm")} AS norm6,
         list_transform(v, x -> CAST(round(x / nrm * {DIVERSITY_Q}, 0) AS BIGINT)) AS uq
  FROM e WHERE nrm > 0
),
per_vec AS (
  SELECT label, norm6,
         CAST(list_sum(list_transform(uq, x -> x * x)) AS BIGINT) AS ssq
  FROM u
),
sums AS (
  SELECT label, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(norm6) AS BIGINT) AS sum_norm6,
         CAST(sum(ssq) AS BIGINT) AS sum_ssq
  FROM per_vec GROUP BY label
),
dims AS (
  SELECT label, i AS dim, CAST(sum(uq[i]) AS BIGINT) AS s
  FROM u, unnest(range(1, len(uq) + 1)) AS t(i)
  GROUP BY label, i
),
g AS (
  SELECT label,
         list_sum(list_transform(list(s ORDER BY dim),
                                 v -> CAST(v AS DOUBLE) * v)) AS ssum_sq
  FROM dims GROUP BY label
)
SELECT s.label, s.n,
       round(CAST(s.sum_norm6 AS DOUBLE) / (s.n * 1e6), 6) AS avg_norm,
       CASE WHEN s.n >= 2 THEN
         round((g.ssum_sq - s.sum_ssq)
               / (CAST(s.n AS DOUBLE) * (s.n - 1) * {DIVERSITY_Q * DIVERSITY_Q}), 6)
       END AS avg_cos
FROM sums s JOIN g USING (label)
"""


# --------------------------------------------------------------------------
# Inbound anchor-text aggregation (Brin & Page 1998 §2.2: anchor words
# describe the TARGET page better than its own text — the classic
# web-index signal alongside the reference's title/description field
# weights, search_service.py:31-35). Edges reuse link_resolve's
# deterministic (doc_id*7+13) % N synthetic map; the anchor is the source
# page's first ANCHOR_WORDS tokens (lead words ≈ link text), stopword-
# filtered AFTER slicing so both engines see the identical phrase. A
# source contributes a term to a target at most once (distinct triple),
# then per-target terms rank by (citing-source count desc, term asc),
# keeping the top ANCHOR_TOP — the anchor summary a doc-partitioned index
# stores next to its postings. Scale shape: ≤ANCHOR_WORDS rows explode
# per source, only (ids, term) cross the shuffle, and the ranking window
# partitions by target_doc_id — a permutation-like %N key, no skew.
# --------------------------------------------------------------------------
ANCHOR_WORDS = 6
ANCHOR_TOP = 3


def q_anchor_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    n_df = scalar_count(docs.select("doc_id"), as_double=False)
    anchors = (
        docs.crossJoin(F.broadcast(n_df))
        .select(
            F.col("doc_id").alias("source_doc_id"),
            ((F.col("doc_id") * 7 + 13) % F.col("_n")).alias("target_doc_id"),
            F.explode(
                F.slice(
                    F.regexp_extract_all(
                        F.lower("text"), F.lit(TOKEN_RUN), F.lit(0)
                    ),
                    1,
                    ANCHOR_WORDS,
                )
            ).alias("term"),
        )
        .filter(
            (F.col("source_doc_id") != F.col("target_doc_id"))
            & ~F.col("term").isin(_TD_STOPWORDS)
        )
    )
    per = (
        anchors.select("source_doc_id", "target_doc_id", "term")
        .distinct()
        .groupBy("target_doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("anchor_sources"))
    )
    w = Window.partitionBy("target_doc_id").orderBy(
        F.desc("anchor_sources"), F.asc("term")
    )
    return (
        per.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= ANCHOR_TOP)
        .select("target_doc_id", "rk", "term", "anchor_sources")
    )


SQL_ANCHOR_TEXT = f"""
WITH n AS (SELECT count(*) AS n FROM documents),
anchors AS (
  SELECT doc_id AS source_doc_id,
         (doc_id * 7 + 13) % n.n AS target_doc_id,
         unnest(list_slice(regexp_extract_all(lower(text), '{TOKEN_RUN}'),
                           1, {ANCHOR_WORDS})) AS term
  FROM documents, n
),
per AS (
  SELECT target_doc_id, term, CAST(count(*) AS BIGINT) AS anchor_sources
  FROM (
    SELECT DISTINCT source_doc_id, target_doc_id, term
    FROM anchors
    WHERE source_doc_id <> target_doc_id
      AND term NOT IN ({_SQL_TD_STOPWORD_LIST})
  )
  GROUP BY 1, 2
)
SELECT target_doc_id, CAST(rk AS BIGINT) AS rk, term, anchor_sources
FROM (
  SELECT *, row_number() OVER (PARTITION BY target_doc_id
                               ORDER BY anchor_sources DESC, term) AS rk
  FROM per
)
WHERE rk <= {ANCHOR_TOP}
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
# Link prediction (Liben-Nowell & Kleinberg 2003): common-neighbor count
# and Adamic-Adar score for non-adjacent doc pairs of the undirected
# link graph (the _TRI_GENS variant, whose two-hop generator closes
# wedges). AA = Σ_{w ∈ Γ(u)∩Γ(v)} 1/ln(deg w) with each hub term
# quantized to fixed6 BIGINT immediately (invariant 4: ln may differ by
# an ulp between libms, so round once per hub and sum integers; a wedge
# hub has ≥2 neighbors by construction, so ln(deg) > 0). Shape: wedge
# self-join on the hub carries ids only; existing edges drop via
# anti-join; fan-out is Σ deg(w)², bounded here by the affine generators
# (max degree ~6) — on a power-law web graph you'd cap hub degree first,
# exactly the standard AA practice.
# --------------------------------------------------------------------------
LP_TOP = 30


def q_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, edges = _edges(spark, sf_dir, gens=_TRI_GENS)
    und = edges.select(
        F.least("source_doc_id", "target_doc_id").alias("a"),
        F.greatest("source_doc_id", "target_doc_id").alias("b"),
    ).distinct()
    nb = und.select(F.col("a").alias("node"), F.col("b").alias("nbr")).unionByName(
        und.select(F.col("b").alias("node"), F.col("a").alias("nbr"))
    )
    deg = nb.groupBy("node").agg(F.count(F.lit(1)).cast("long").alias("d"))
    x = nb.select(F.col("node").alias("w"), F.col("nbr").alias("u"))
    y = nb.select(F.col("node").alias("w"), F.col("nbr").alias("v"))
    wedges = x.join(y, "w").filter(F.col("u") < F.col("v"))
    cand = wedges.join(
        und,
        (wedges["u"] == und["a"]) & (wedges["v"] == und["b"]),
        "left_anti",
    )
    scored = cand.join(deg.withColumnRenamed("node", "w"), "w").select(
        "u",
        "v",
        F.round(F.lit(1000000.0) / F.log(F.col("d").cast("double")), 0)
        .cast("long")
        .alias("t6"),
    )
    return (
        scored.groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).cast("long").alias("common_neighbors"),
            F.sum("t6").cast("long").alias("aa6"),
        )
        .select(
            F.col("u").alias("doc_a"),
            F.col("v").alias("doc_b"),
            "common_neighbors",
            "aa6",
            (F.col("aa6").cast("double") / F.lit(1000000.0)).alias("adamic_adar"),
        )
        .orderBy(F.desc("aa6"), F.asc("doc_a"), F.asc("doc_b"))
        .limit(LP_TOP)
    )


SQL_LINK_PREDICTION = f"""
WITH {_TRI_EDGES_CTE},
und AS (
  SELECT DISTINCT least(source_doc_id, target_doc_id) AS a,
                  greatest(source_doc_id, target_doc_id) AS b
  FROM edges
),
nb AS (SELECT a AS node, b AS nbr FROM und UNION ALL SELECT b, a FROM und),
deg AS (SELECT node, CAST(count(*) AS BIGINT) AS d FROM nb GROUP BY node),
cand AS (
  SELECT x.node AS w, x.nbr AS u, y.nbr AS v
  FROM nb x JOIN nb y ON y.node = x.node AND x.nbr < y.nbr
  WHERE NOT EXISTS (
    SELECT 1 FROM und WHERE und.a = x.nbr AND und.b = y.nbr
  )
),
scored AS (
  SELECT u, v, CAST(round(CAST(1000000 AS DOUBLE) / ln(d)) AS BIGINT) AS t6
  FROM cand JOIN deg ON deg.node = cand.w
)
SELECT u AS doc_a, v AS doc_b,
       CAST(count(*) AS BIGINT) AS common_neighbors,
       CAST(sum(t6) AS BIGINT) AS aa6,
       CAST(sum(t6) AS BIGINT) / CAST(1000000 AS DOUBLE) AS adamic_adar
FROM scored
GROUP BY u, v
ORDER BY aa6 DESC, doc_a, doc_b
LIMIT {LP_TOP}
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
# Truncated Katz centrality — integer-exact like HITS/BFS: c_k(v) = the
# number of length-k paths ending at v over the synthetic link graph,
# four fixed rounds (fixed horizon keeps both engines on the same
# trajectory); katz_i = Σ_k 8^(4-k)·c_k(v) is the attenuation β=1/8
# series rescaled by 8^4=4096 so every intermediate is BIGINT, with ONE
# exact binary-fraction divide (x/4096 is lossless in doubles) at the
# end. Spark: one join per round (PageRank's 1-join cadence — no
# checkpoint needed), then one union + groupBy for the weighted series
# (a single shuffle, not 4 chained left joins). Path counts stay tiny:
# in-degrees of the affine-generator graph are bounded.
# --------------------------------------------------------------------------
KATZ_ITERS = 4
KATZ_BETA_DEN = 8


def q_katz_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs, edges = _edges(spark, sf_dir)
    c = docs.select("doc_id", F.lit(1).cast("long").alias("c"))
    weighted = []
    for k in range(1, KATZ_ITERS + 1):
        c = (
            edges.join(c, edges["source_doc_id"] == c["doc_id"])
            .groupBy(F.col("target_doc_id").alias("doc_id"))
            .agg(F.sum("c").cast("long").alias("c"))
        )
        w = KATZ_BETA_DEN ** (KATZ_ITERS - k)
        weighted.append(
            c.select("doc_id", (F.col("c") * F.lit(w)).cast("long").alias("w"))
        )
    series = weighted[0]
    for part in weighted[1:]:
        series = series.unionByName(part)
    tot = series.groupBy("doc_id").agg(
        F.sum("w").cast("long").alias("katz_i")
    )
    return docs.join(tot, "doc_id", "left").select(
        "doc_id",
        F.coalesce("katz_i", F.lit(0).cast("long")).alias("katz_i"),
        (
            F.coalesce("katz_i", F.lit(0).cast("long")).cast("double")
            / F.lit(float(KATZ_BETA_DEN**KATZ_ITERS))
        ).alias("katz"),
    )


def _katz_sql() -> str:
    rounds = []
    prev = "c0"
    for k in range(1, KATZ_ITERS + 1):
        rounds.append(
            f"c{k} AS MATERIALIZED (\n"
            f"  SELECT target_doc_id AS v, CAST(sum(c) AS BIGINT) AS c\n"
            f"  FROM edges JOIN {prev} ON {prev}.v = edges.source_doc_id\n"
            f"  GROUP BY target_doc_id\n)"
        )
        prev = f"c{k}"
    union = "\n  UNION ALL\n".join(
        f"  SELECT v, c * {KATZ_BETA_DEN ** (KATZ_ITERS - k)} AS w FROM c{k}"
        for k in range(1, KATZ_ITERS + 1)
    )
    return f"""
WITH {_EDGES_CTE},
c0 AS (SELECT doc_id AS v, CAST(1 AS BIGINT) AS c FROM documents),
{",".join(rounds)},
series AS (
{union}
),
tot AS (SELECT v, CAST(sum(w) AS BIGINT) AS katz_i FROM series GROUP BY v)
SELECT d.doc_id, CAST(COALESCE(t.katz_i, 0) AS BIGINT) AS katz_i,
       CAST(COALESCE(t.katz_i, 0) AS BIGINT)
         / CAST({KATZ_BETA_DEN**KATZ_ITERS} AS DOUBLE) AS katz
FROM documents d LEFT JOIN tot t ON t.v = d.doc_id
"""


SQL_KATZ_CENTRALITY = _katz_sql()


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
# Impact-tiered index report (static index pruning / champion lists:
# Ntoulas & Cho, SIGIR 2007; the "fancy lists" in the original Google
# paper): per term, postings rank by (tf desc, doc_id asc) and split
# into tiers — tier 0 the top-{TIER_M0} per term, tier 1 the next up to
# rank {TIER_M1}, tier 2 the tail. The report is the index-sizing audit
# behind a tiered deployment: how many postings and what share of total
# term mass each tier captures (tier 0+1 serving most queries from a
# fraction of the index). All counts are exact BIGINTs; the only floats
# are two single divides of exact integers rounded 6 (invariant 4 safe —
# no float accumulation anywhere). The n_terms count uses the two-phase
# distinct pattern (tier has 3 values — a countDistinct grouped by it
# would funnel the vocabulary through 3 reducers; invariant 6). Scale
# note: the per-term row_number window is vocab-partitioned; at web scale
# a head term's full posting list lands in one partition — production
# would compute the tier-m0/m1 tf cutoffs via per-term top-m aggregation
# (bounded heap) instead of a full sort, which this report's semantics
# permit; at the corpus sizes here the window is the clearer plan.
# --------------------------------------------------------------------------
TIER_M0 = 2
TIER_M1 = 8


def q_tiered_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "doc_id",
            F.explode(
                F.regexp_extract_all(
                    F.lower("text"), F.lit(TOKEN_RUN), F.lit(0)
                )
            ).alias("term"),
        )
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    w = Window.partitionBy("term").orderBy(F.desc("tf"), F.asc("doc_id"))
    tiered = tf.withColumn("_rn", F.row_number().over(w)).withColumn(
        "tier",
        F.when(F.col("_rn") <= TIER_M0, F.lit(0))
        .when(F.col("_rn") <= TIER_M1, F.lit(1))
        .otherwise(F.lit(2))
        .cast("long"),
    )
    per_tier = tiered.groupBy("tier").agg(
        F.count(F.lit(1)).cast("long").alias("n_postings"),
        F.sum("tf").cast("long").alias("ctf_tier"),
    )
    n_terms = (
        tiered.select("tier", "term")
        .distinct()
        .groupBy("tier")
        .agg(F.count(F.lit(1)).cast("long").alias("n_terms"))
    )
    tot = per_tier.agg(F.sum("ctf_tier").cast("long").alias("_t"))
    w_cum = (
        Window.orderBy("tier")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        per_tier.join(n_terms, "tier")
        .crossJoin(F.broadcast(tot))
        .withColumn("_cum", F.sum("ctf_tier").over(w_cum).cast("long"))
        .select(
            "tier",
            "n_terms",
            "n_postings",
            "ctf_tier",
            F.round(F.col("ctf_tier").cast("double") / F.col("_t"), 6).alias(
                "ctf_share"
            ),
            F.round(F.col("_cum").cast("double") / F.col("_t"), 6).alias(
                "cum_share"
            ),
        )
        .orderBy("tier")
    )


SQL_TIERED_INDEX = f"""
WITH tf AS (
  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id,
               unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term
        FROM documents)
  GROUP BY term, doc_id
),
tiered AS (
  SELECT term, tf,
         CAST(CASE WHEN rn <= {TIER_M0} THEN 0
                   WHEN rn <= {TIER_M1} THEN 1
                   ELSE 2 END AS BIGINT) AS tier
  FROM (SELECT term, tf,
               row_number() OVER (PARTITION BY term
                                  ORDER BY tf DESC, doc_id ASC) AS rn
        FROM tf)
),
per_tier AS (
  SELECT tier, CAST(count(*) AS BIGINT) AS n_postings,
         CAST(sum(tf) AS BIGINT) AS ctf_tier
  FROM tiered GROUP BY tier
),
n_terms AS (
  SELECT tier, CAST(count(*) AS BIGINT) AS n_terms
  FROM (SELECT DISTINCT tier, term FROM tiered) GROUP BY tier
),
tot AS (SELECT CAST(sum(ctf_tier) AS BIGINT) AS t FROM per_tier)
SELECT p.tier, n.n_terms, p.n_postings, p.ctf_tier,
       round(CAST(p.ctf_tier AS DOUBLE) / tot.t, 6) AS ctf_share,
       round(CAST(sum(p.ctf_tier) OVER (ORDER BY p.tier
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS DOUBLE) / tot.t, 6) AS cum_share
FROM per_tier p JOIN n_terms n USING (tier), tot
ORDER BY p.tier
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
# Crawl politeness drain-time audit: the reference crawls each domain at
# 0.5 requests/s (`app/crawler/worker.py:25-37,52` AsyncLimiter) with the
# page set sharded across nodes by id (`duplicate_detection.py:46-58`) —
# so a refresh cycle's wall-clock floor is set by the LARGEST domain, not
# the corpus size (politeness serializes within a domain; domains run in
# parallel up to fetch concurrency). Per domain: page count, drain time
# at the reference rate, corpus share, and whether it sits on the
# critical path (drain == fleet max). All exact integers; the one divide
# is a single rounded ratio of exact BIGINTs. This is the planning input
# behind crawl sharding and recrawl budgeting — at web scale the groupBy
# key is the domain (hash-partitioned, counts combine map-side) and the
# fleet max rides in-plan as a broadcast scalar, never a driver collect.
# --------------------------------------------------------------------------
CRAWL_SPACING_S = 2  # 1 / requests_per_second=0.5, worker.py:52


def q_crawl_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents").select("source")
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_pages")
    )
    fleet = per.agg(
        F.sum("n_pages").cast("long").alias("_t"),
        F.max("n_pages").cast("long").alias("_mx"),
    )
    return (
        per.crossJoin(F.broadcast(fleet))
        .select(
            "source",
            "n_pages",
            ((F.col("n_pages") - 1) * CRAWL_SPACING_S).alias("drain_s"),
            F.round(
                F.col("n_pages").cast("double") / F.col("_t"), 6
            ).alias("page_share"),
            (F.col("n_pages") == F.col("_mx")).alias("critical_path"),
        )
        .orderBy("source")
    )


SQL_CRAWL_SCHEDULE = f"""
WITH per AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_pages
  FROM documents GROUP BY source
),
fleet AS (
  SELECT CAST(sum(n_pages) AS BIGINT) AS t,
         CAST(max(n_pages) AS BIGINT) AS mx
  FROM per
)
SELECT source, n_pages,
       (n_pages - 1) * {CRAWL_SPACING_S} AS drain_s,
       round(CAST(n_pages AS DOUBLE) / fleet.t, 6) AS page_share,
       n_pages = fleet.mx AS critical_path
FROM per, fleet
"""


# --------------------------------------------------------------------------
# PageRank convergence curve: per-iteration L1/max rank movement plus the
# contraction ratio for the first {PR_CONV_ITERS} iterations of the
# reference-constant recurrence (d=0.85, dangling mass dropped —
# `app/batch/pagerank.py:6-38`). The reference runs a BLIND fixed-20
# loop; this report is the instrumentation that justifies (or indicts)
# that choice — the contraction column exposes the ~d geometric rate, and
# at web scale it is the input for an early-stop tolerance (the optional
# `tol` in operators/pagerank.build_document_authority). Invariant 4:
# per-node |Δrank| quantizes fixed9 into BIGINT L1/max sums (ranks agree
# across engines to far better than 1e-9 — the pagerank pair proves
# round-9 identity); the contraction ratio is one divide of exact
# integers. Iterative like the pagerank pair: each iteration
# localCheckpoints, so the unioned 8-row report reads checkpointed
# snapshots, not an exponentially deep plan.
# --------------------------------------------------------------------------
PR_CONV_ITERS = 8


def q_pagerank_convergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs, edges = _edges(spark, sf_dir)
    n = docs.count()
    base, tel = 1.0 / n, (1.0 - 0.85) / n
    out_degree = edges.groupBy("source_doc_id").agg(
        F.count(F.lit(1)).alias("out_degree")
    )
    edges_deg = edges.join(out_degree, "source_doc_id").localCheckpoint(
        eager=True
    )
    ranks = docs.select("doc_id", F.lit(base).alias("pr"))
    d9 = F.round(
        F.abs(F.col("a.pr") - F.col("b.pr")) * F.lit(1000000000.0), 0
    ).cast("long")
    deltas = []
    for k in range(1, PR_CONV_ITERS + 1):
        contribs = (
            edges_deg.join(ranks, edges_deg.source_doc_id == ranks.doc_id)
            .select(
                F.col("target_doc_id").alias("dst"),
                (F.lit(0.85) * F.col("pr") / F.col("out_degree")).alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("c"))
        )
        new_ranks = (
            docs.join(contribs, docs.doc_id == contribs.dst, "left")
            .select(
                "doc_id",
                (F.lit(tel) + F.coalesce("c", F.lit(0.0))).alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
        deltas.append(
            new_ranks.alias("a")
            .join(ranks.alias("b"), "doc_id")
            .agg(
                F.sum(d9).cast("long").alias("l1_9"),
                F.max(d9).cast("long").alias("max_9"),
            )
            .select(F.lit(k).cast("long").alias("iter"), "l1_9", "max_9")
        )
        ranks = new_ranks
    res = deltas[0]
    for d in deltas[1:]:
        res = res.unionByName(d)
    w = Window.orderBy("iter")
    return res.select(
        "iter",
        F.round(F.col("l1_9") / F.lit(1000000000.0), 6).alias("l1_delta"),
        F.round(F.col("max_9") / F.lit(1000000000.0), 6).alias("max_delta"),
        F.coalesce(
            F.round(
                F.col("l1_9").cast("double") / F.lag("l1_9").over(w), 6
            ),
            F.lit(0.0),
        ).alias("contraction"),
    )


SQL_PAGERANK_CONVERGENCE = f"""
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
  WHERE pr.iter < {PR_CONV_ITERS}
  GROUP BY pr.iter + 1, e.dst
),
deltas AS (
  SELECT CAST(b.iter AS BIGINT) AS iter,
         CAST(sum(CAST(round(abs(b.rank - a.rank) * 1000000000.0)
                       AS BIGINT)) AS BIGINT) AS l1_9,
         CAST(max(CAST(round(abs(b.rank - a.rank) * 1000000000.0)
                       AS BIGINT)) AS BIGINT) AS max_9
  FROM pr a JOIN pr b ON b.doc_id = a.doc_id AND b.iter = a.iter + 1
  GROUP BY b.iter
)
SELECT iter,
       round(l1_9 / 1000000000.0, 6) AS l1_delta,
       round(max_9 / 1000000000.0, 6) AS max_delta,
       coalesce(round(CAST(l1_9 AS DOUBLE)
                      / lag(l1_9) OVER (ORDER BY iter), 6), 0.0)
         AS contraction
FROM deltas
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
# TextRank keyword extraction (Mihalcea & Tarau 2004) in the exact-integer
# fixed-point formulation the hits_scores pair established: candidate
# words (length >= 4, the POS-filter proxy) form an undirected
# co-occurrence graph over window-2 adjacency in the FILTERED token
# sequence; ranks then follow the unnormalized TextRank recurrence
# r' = 0.15 + 0.85 * sum(r_u / deg_u) with every quantity held in BIGINT
# micro-units: the per-neighbor message is r_u div deg_u (integer floor)
# and the damping mix is (15*UNIT + 85*sum) div 100 — order-free and
# bit-identical across engines (invariant 4 by omission; the floor drops
# sub-micro mass, documented as the fixed-point variant). The reference
# scores documents, never terms (`app/search/engine.py` weights fields) —
# this is the keyword-side companion an indexer runs at ingest. Graph
# size is VOCABULARY-bounded, not corpus-bounded: at web scale the
# co-occurrence graph contracts a trillion-token stream to |V| nodes in
# one map-side-combined aggregation, and the 10 iterations run on that
# contracted graph alone. Each iteration localCheckpoints (pagerank's
# lineage discipline).
# --------------------------------------------------------------------------
TR_TOKEN = "[a-z0-9]{4,}"
TR_ITERS = 10
TR_UNIT = 1_000_000


def q_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(
            F.expr(f"regexp_extract_all(lower(text), '{TR_TOKEN}', 0)")
        ).alias("pos", "w"),
    )
    wnd = Window.partitionBy("doc_id").orderBy("pos")
    pairs = toks.select(
        F.lag("w").over(wnd).alias("pa"), F.col("w").alias("pb")
    ).filter(F.col("pa").isNotNull() & (F.col("pa") != F.col("pb")))
    edges = (
        pairs.select(
            F.least("pa", "pb").alias("ea"), F.greatest("pa", "pb").alias("eb")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    both = edges.unionByName(
        edges.select(F.col("eb").alias("ea"), F.col("ea").alias("eb"))
    )
    deg = both.groupBy("ea").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    msgs = both.join(deg, "ea").localCheckpoint(eager=True)
    ranks = deg.select(
        F.col("ea").alias("w"), F.lit(TR_UNIT).cast("long").alias("r")
    )
    for _ in range(TR_ITERS):
        ranks = (
            msgs.join(ranks, msgs.ea == ranks.w)
            .select(F.col("eb").alias("w"), F.expr("r div deg").alias("m"))
            .groupBy("w")
            .agg(
                F.expr(f"({15 * TR_UNIT} + 85 * sum(m)) div 100")
                .cast("long")
                .alias("r")
            )
            .localCheckpoint(eager=True)
        )
    return ranks.join(deg, ranks.w == deg.ea).select(
        F.col("w").alias("word"),
        F.col("deg").alias("degree"),
        F.round(F.col("r") / F.lit(1000000.0), 6).alias("textrank"),
    )


SQL_TEXTRANK_KEYWORDS = f"""
WITH RECURSIVE toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '{TR_TOKEN}')) AS w,
         generate_subscripts(regexp_extract_all(lower(text), '{TR_TOKEN}'), 1)
           AS pos
  FROM documents
),
adj AS (
  SELECT lag(w) OVER (PARTITION BY doc_id ORDER BY pos) AS pa, w AS pb
  FROM toks
),
wedges AS (
  SELECT DISTINCT least(pa, pb) AS ea, greatest(pa, pb) AS eb
  FROM adj WHERE pa IS NOT NULL AND pa <> pb
),
bidir AS (SELECT ea, eb FROM wedges UNION ALL SELECT eb, ea FROM wedges),
deg AS (SELECT ea, CAST(count(*) AS BIGINT) AS deg FROM bidir GROUP BY ea),
msgs AS (SELECT b.ea AS frm, b.eb AS dst, d.deg
         FROM bidir b JOIN deg d ON d.ea = b.ea),
tr AS (
  SELECT 0 AS iter, ea AS w, CAST({TR_UNIT} AS BIGINT) AS r FROM deg
  UNION ALL
  SELECT tr.iter + 1, m.dst AS w,
         CAST(({15 * TR_UNIT} + 85 * sum(tr.r // m.deg)) // 100
              AS BIGINT) AS r
  FROM tr JOIN msgs m ON m.frm = tr.w
  WHERE tr.iter < {TR_ITERS}
  GROUP BY tr.iter + 1, m.dst
)
SELECT tr.w AS word, d.deg AS degree,
       round(tr.r / 1000000.0, 6) AS textrank
FROM tr JOIN deg d ON d.ea = tr.w
WHERE tr.iter = {TR_ITERS}
"""


# --------------------------------------------------------------------------
# Host-level authority: contract the synthetic page link graph to the
# source/domain level (edge weight = page-link multiplicity, host
# self-loops dropped) and run the reference-constant recurrence (d=0.85,
# `app/batch/pagerank.py:6-38`) on the CONTRACTED graph in the same
# exact-integer fixed-point form as textrank_keywords — the weighted
# message is (r_u * w_uv) div out_w_u. This is the standard web-scale
# move: host aggregation shrinks a trillion-edge page graph by orders of
# magnitude in ONE map-side-combined aggregation (uniform doc_id join
# keys), after which the 10 iterations touch only |hosts| rows. Outputs
# per host: page count, weighted in/out degree, fixed-point rank — all
# BIGINT except the one final /UNIT divide.
# --------------------------------------------------------------------------
HOST_ITERS = 10


def q_host_authority(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents").select("doc_id", "source")
    _, edges = _edges(spark, sf_dir)
    hedges = (
        edges.join(
            docs.select(
                F.col("doc_id").alias("source_doc_id"),
                F.col("source").alias("src_host"),
            ),
            "source_doc_id",
        )
        .join(
            docs.select(
                F.col("doc_id").alias("target_doc_id"),
                F.col("source").alias("dst_host"),
            ),
            "target_doc_id",
        )
        .filter(F.col("src_host") != F.col("dst_host"))
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
        .localCheckpoint(eager=True)
    )
    hosts = docs.groupBy(F.col("source").alias("host")).agg(
        F.count(F.lit(1)).cast("long").alias("n_pages")
    )
    outw = hedges.groupBy(F.col("src_host").alias("host")).agg(
        F.sum("w").alias("out_w")
    )
    inw = hedges.groupBy(F.col("dst_host").alias("host")).agg(
        F.sum("w").alias("in_w")
    )
    # zero-weight self message keeps every host present per iteration
    # (out_w=1 is a safe divisor: the numerator is 0 by construction)
    msgs = hedges.join(
        outw, hedges.src_host == outw.host
    ).select("src_host", "dst_host", "w", "out_w").unionByName(
        hosts.select(
            F.col("host").alias("src_host"),
            F.col("host").alias("dst_host"),
            F.lit(0).cast("long").alias("w"),
            F.lit(1).cast("long").alias("out_w"),
        )
    ).localCheckpoint(eager=True)
    ranks = hosts.select(
        "host", F.lit(TR_UNIT).cast("long").alias("r")
    )
    for _ in range(HOST_ITERS):
        ranks = (
            msgs.join(ranks, msgs.src_host == ranks.host)
            .select(
                F.col("dst_host").alias("host"),
                F.expr("(r * w) div out_w").alias("m"),
            )
            .groupBy("host")
            .agg(
                F.expr(f"({15 * TR_UNIT} + 85 * sum(m)) div 100")
                .cast("long")
                .alias("r")
            )
            .localCheckpoint(eager=True)
        )
    return (
        ranks.join(hosts, "host")
        .join(outw, "host", "left")
        .join(inw, "host", "left")
        .select(
            "host",
            "n_pages",
            F.coalesce("out_w", F.lit(0)).cast("long").alias("out_w"),
            F.coalesce("in_w", F.lit(0)).cast("long").alias("in_w"),
            F.round(F.col("r") / F.lit(1000000.0), 6).alias("authority"),
        )
    )


SQL_HOST_AUTHORITY = f"""
WITH RECURSIVE {_EDGES_CTE},
hedges AS (
  SELECT ds.source AS src_host, dt.source AS dst_host,
         CAST(count(*) AS BIGINT) AS w
  FROM edges e
  JOIN documents ds ON ds.doc_id = e.source_doc_id
  JOIN documents dt ON dt.doc_id = e.target_doc_id
  WHERE ds.source <> dt.source
  GROUP BY ds.source, dt.source
),
hosts AS (SELECT source AS host, CAST(count(*) AS BIGINT) AS n_pages
          FROM documents GROUP BY source),
outw AS (SELECT src_host AS host, CAST(sum(w) AS BIGINT) AS out_w
         FROM hedges GROUP BY src_host),
inw AS (SELECT dst_host AS host, CAST(sum(w) AS BIGINT) AS in_w
        FROM hedges GROUP BY dst_host),
msgs AS (
  SELECT h.src_host, h.dst_host, h.w, o.out_w
  FROM hedges h JOIN outw o ON o.host = h.src_host
  UNION ALL
  SELECT host, host, CAST(0 AS BIGINT), CAST(1 AS BIGINT) FROM hosts
),
hr AS (
  SELECT 0 AS iter, host, CAST({TR_UNIT} AS BIGINT) AS r FROM hosts
  UNION ALL
  SELECT hr.iter + 1, m.dst_host AS host,
         CAST(({15 * TR_UNIT} + 85 * sum((hr.r * m.w) // m.out_w)) // 100
              AS BIGINT) AS r
  FROM hr JOIN msgs m ON m.src_host = hr.host
  WHERE hr.iter < {HOST_ITERS}
  GROUP BY hr.iter + 1, m.dst_host
)
SELECT hr.host, h.n_pages,
       CAST(COALESCE(o.out_w, 0) AS BIGINT) AS out_w,
       CAST(COALESCE(i.in_w, 0) AS BIGINT) AS in_w,
       round(hr.r / 1000000.0, 6) AS authority
FROM hr
JOIN hosts h ON h.host = hr.host
LEFT JOIN outw o ON o.host = hr.host
LEFT JOIN inw i ON i.host = hr.host
WHERE hr.iter = {HOST_ITERS}
"""


# --------------------------------------------------------------------------
# Posting-gap codec comparison: total coded size of the corpus's doc-id
# gap stream under byte-aligned varint (the shipped codec — `codec.py`,
# paired in postings_bytes), Elias gamma, and Elias delta — the
# codec-choice audit that turns gap_histogram's distribution into
# bytes-on-disk. Every formula is a pure-integer function of
# L = length(bin(gap)) = floor(log2 gap)+1 (the gap_histogram trick):
# varint bytes = ((L-1) div 7)+1, gamma bits = 2L-1, delta bits =
# (L-1) + 2*length(bin(L))-1. First posting encodes doc_id+1 (prev = -1)
# so every gap >= 1 and the totals cover whole lists. One distinct +
# one per-term window + one aggregate; reported per scheme.
# --------------------------------------------------------------------------
def q_codec_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    td = docs.select(
        "doc_id",
        F.explode(
            F.expr(f"regexp_extract_all(lower(text), '{TOKEN_RUN}', 0)")
        ).alias("term"),
    ).distinct()
    w = Window.partitionBy("term").orderBy("doc_id")
    gaps = td.select(
        (
            F.col("doc_id") - F.coalesce(F.lag("doc_id").over(w), F.lit(-1))
        ).alias("g")
    ).select(F.length(F.bin("g")).cast("long").alias("bl"))
    m = gaps.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.expr("8 * (((bl - 1) div 7) + 1)")).cast("long").alias("vb"),
        F.sum(F.expr("2 * bl - 1")).cast("long").alias("gb"),
        F.sum(
            F.expr("(bl - 1) + 2 * length(bin(bl)) - 1")
        ).cast("long").alias("db"),
    )
    parts = [
        m.select(
            F.lit(s).alias("scheme"),
            F.col("n").alias("n_postings"),
            F.col(c).alias("total_bits"),
            F.round(F.col(c) / F.col("n"), 6).alias("bits_per_posting"),
        )
        for s, c in (("varint", "vb"), ("gamma", "gb"), ("delta", "db"))
    ]
    res = parts[0]
    for p in parts[1:]:
        res = res.unionByName(p)
    return res


SQL_CODEC_COMPARE = f"""
WITH td AS (
  SELECT DISTINCT term, doc_id FROM (
    SELECT doc_id,
           unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term
    FROM documents
  )
),
gaps AS (
  SELECT CAST(length(bin(
           doc_id - coalesce(lag(doc_id) OVER (PARTITION BY term
                                               ORDER BY doc_id), -1)
         )) AS BIGINT) AS bl
  FROM td
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(8 * (((bl - 1) // 7) + 1)) AS BIGINT) AS vb,
         CAST(sum(2 * bl - 1) AS BIGINT) AS gb,
         CAST(sum((bl - 1) + 2 * length(bin(bl)) - 1) AS BIGINT) AS db
  FROM gaps
)
SELECT 'varint' AS scheme, n AS n_postings, vb AS total_bits,
       round(vb / n, 6) AS bits_per_posting FROM m
UNION ALL
SELECT 'gamma', n, gb, round(gb / n, 6) FROM m
UNION ALL
SELECT 'delta', n, db, round(db / n, 6) FROM m
"""


# --------------------------------------------------------------------------
# Term-dictionary front-coding audit (the Lucene/stdlib block prefix
# compression every fulltext index applies to its sorted term
# dictionary): for block sizes 8/16/64, the coded size when each block
# restart stores the full term (1 length byte) and every other term
# stores (lcp byte, suffix-length byte, suffix). LCP with the
# lexicographic predecessor is computed as the COUNT of equal prefixes
# (prefix-match is monotone, so the count IS the longest match) — a
# bounded per-term expression, no UDF. The vocabulary relation is
# aggregated FIRST, so the global-order window ranks |V| rows, not the
# token stream (the length_quantiles single-partition precedent:
# vocabulary-bounded by construction).
# --------------------------------------------------------------------------
FC_BLOCKS = (8, 16, 64)

_LCP_SPARK = (
    "CASE WHEN prev IS NULL THEN 0 ELSE size(filter("
    "sequence(1, least(length(prev), length(term))),"
    " i -> substring(prev, 1, i) = substring(term, 1, i))) END"
)


def q_dict_frontcoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    vocab = docs.select(
        F.explode(
            F.expr(f"regexp_extract_all(lower(text), '{TOKEN_RUN}', 0)")
        ).alias("term")
    ).distinct()
    w = Window.orderBy("term")
    coded = vocab.select(
        "term",
        F.lag("term").over(w).alias("prev"),
        (F.row_number().over(w) - 1).alias("rn"),
    ).select(
        "rn",
        F.length("term").cast("long").alias("len"),
        F.expr(_LCP_SPARK).cast("long").alias("lcp"),
    )
    parts = []
    for b in FC_BLOCKS:
        parts.append(
            coded.agg(
                F.lit(b).cast("long").alias("block_size"),
                F.count(F.lit(1)).cast("long").alias("n_terms"),
                F.sum(F.expr("1 + len")).cast("long").alias("raw_bytes"),
                F.sum(
                    F.expr(
                        f"CASE WHEN rn % {b} = 0 THEN 1 + len"
                        " ELSE 2 + len - lcp END"
                    )
                ).cast("long").alias("fc_bytes"),
            ).select(
                "block_size",
                "n_terms",
                "raw_bytes",
                "fc_bytes",
                F.round(F.col("fc_bytes") / F.col("raw_bytes"), 6).alias(
                    "size_ratio"
                ),
            )
        )
    res = parts[0]
    for p in parts[1:]:
        res = res.unionByName(p)
    return res


def _frontcoding_sql() -> str:
    branches = "\nUNION ALL\n".join(
        f"""SELECT CAST({b} AS BIGINT) AS block_size,
       CAST(count(*) AS BIGINT) AS n_terms,
       CAST(sum(1 + len) AS BIGINT) AS raw_bytes,
       CAST(sum(CASE WHEN rn % {b} = 0 THEN 1 + len
                     ELSE 2 + len - lcp END) AS BIGINT) AS fc_bytes,
       round(sum(CASE WHEN rn % {b} = 0 THEN 1 + len
                      ELSE 2 + len - lcp END)
             / sum(1 + len), 6) AS size_ratio
FROM coded"""
        for b in FC_BLOCKS
    )
    return f"""
WITH vocab AS (
  SELECT DISTINCT unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}'))
         AS term
  FROM documents
),
ordered AS (
  SELECT term, lag(term) OVER (ORDER BY term) AS prev,
         row_number() OVER (ORDER BY term) - 1 AS rn
  FROM vocab
),
coded AS (
  SELECT rn, CAST(length(term) AS BIGINT) AS len,
         CAST(CASE WHEN prev IS NULL THEN 0 ELSE len(list_filter(
           range(1, least(length(prev), length(term)) + 1),
           i -> substr(prev, 1, i) = substr(term, 1, i))) END
         AS BIGINT) AS lcp
  FROM ordered
)
{branches}
"""


SQL_DICT_FRONTCODING = _frontcoding_sql()


# --------------------------------------------------------------------------
# Consistent-hashing rebalance audit (Karger et al. 1997): when the doc
# store grows 16 -> 17 shards, what fraction of keys move under naive
# mod-N placement vs a 16-vnode hash ring? The classic result — mod
# reshuffles ~N/(N+1) of all keys, the ring moves ~1/(N+1) — is the
# reason term_bucket-style mod layouts (invariant 7) need full rebuilds
# while a ring grows incrementally. Hashes are the repo's md5 hex-prefix
# ints (invariant 2: bit-identical in DuckDB). Ring ownership: smallest
# token >= key, wrapping to the global min — ONE row_number pick over
# (wrap-priority, token, shard) on a broadcast-token cross join, so the
# per-key fan-out is bounded by the constant token count at any corpus
# size.
# --------------------------------------------------------------------------
RING_SHARDS = 16
RING_VNODES = 16


def _hash32(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def _ring_owner(keys: DataFrame, tokens: DataFrame) -> DataFrame:
    """keys(doc_id, kh) x tokens(tok, shard) -> (doc_id, shard)."""
    cand = keys.crossJoin(F.broadcast(tokens)).select(
        "doc_id",
        F.when(F.col("tok") >= F.col("kh"), F.lit(0))
        .otherwise(F.lit(1))
        .alias("pri"),
        "tok",
        "shard",
    )
    w = Window.partitionBy("doc_id").orderBy("pri", "tok", "shard")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "shard")
    )


def _ring_tokens(spark: SparkSession, n_shards: int) -> DataFrame:
    grid = spark.createDataFrame(
        [(s, v) for s in range(n_shards) for v in range(RING_VNODES)],
        "shard: long, vnode: long",
    )
    return grid.select(
        _hash32(
            F.concat(
                F.lit("shard:"),
                F.col("shard").cast("string"),
                F.lit(":"),
                F.col("vnode").cast("string"),
            )
        ).alias("tok"),
        "shard",
    )


def q_shard_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    keys = docs.select(
        "doc_id",
        _hash32(F.concat(F.lit("key:"), F.col("doc_id").cast("string"))).alias(
            "kh"
        ),
    ).localCheckpoint(eager=True)
    n, n2 = RING_SHARDS, RING_SHARDS + 1
    mod_moved = keys.select(
        (F.pmod(F.col("kh"), F.lit(n)) != F.pmod(F.col("kh"), F.lit(n2)))
        .cast("long")
        .alias("mv")
    )
    old = _ring_owner(keys, _ring_tokens(spark, n))
    new = _ring_owner(keys, _ring_tokens(spark, n2)).withColumnRenamed(
        "shard", "shard2"
    )
    ring_moved = old.join(new, "doc_id").select(
        (F.col("shard") != F.col("shard2")).cast("long").alias("mv")
    )
    parts = [
        df.agg(
            F.lit(s).alias("scheme"),
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum("mv").cast("long").alias("n_moved"),
        ).select(
            "scheme",
            "n_keys",
            "n_moved",
            F.round(F.col("n_moved") / F.col("n_keys"), 6).alias(
                "moved_fraction"
            ),
        )
        for s, df in (("mod", mod_moved), ("ring", ring_moved))
    ]
    return parts[0].unionByName(parts[1])


def _ring_sql() -> str:
    n, n2 = RING_SHARDS, RING_SHARDS + 1

    def owner(cte: str, n_shards: int) -> str:
        return f"""{cte} AS (
  SELECT doc_id, shard FROM (
    SELECT k.doc_id,
           CASE WHEN t.tok >= k.kh THEN 0 ELSE 1 END AS pri,
           t.tok, t.shard,
           row_number() OVER (
             PARTITION BY k.doc_id
             ORDER BY CASE WHEN t.tok >= k.kh THEN 0 ELSE 1 END,
                      t.tok, t.shard) AS rn
    FROM keys k, (
      SELECT CAST('0x' || substr(md5('shard:' || CAST(s AS VARCHAR) || ':'
                                     || CAST(v AS VARCHAR)), 1, 8)
                  AS BIGINT) AS tok,
             CAST(s AS BIGINT) AS shard
      FROM range(0, {n_shards}) AS rs(s), range(0, {RING_VNODES}) AS rv(v)
    ) t
  ) WHERE rn = 1
)"""

    return f"""
WITH keys AS (
  SELECT doc_id,
         CAST('0x' || substr(md5('key:' || CAST(doc_id AS VARCHAR)), 1, 8)
              AS BIGINT) AS kh
  FROM documents
),
{owner("own_old", n)},
{owner("own_new", n2)}
SELECT 'mod' AS scheme, CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(CASE WHEN kh % {n} <> kh % {n2} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_moved,
       round(sum(CASE WHEN kh % {n} <> kh % {n2} THEN 1 ELSE 0 END)
             / count(*), 6) AS moved_fraction
FROM keys
UNION ALL
SELECT 'ring', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN o.shard <> nw.shard THEN 1 ELSE 0 END) AS BIGINT),
       round(sum(CASE WHEN o.shard <> nw.shard THEN 1 ELSE 0 END)
             / count(*), 6)
FROM own_old o JOIN own_new nw USING (doc_id)
"""


SQL_SHARD_REBALANCE = _ring_sql()


# --------------------------------------------------------------------------
# Query-result cache hit-rate model: treating the corpus token stream as
# the Zipf query log (each occurrence = one query), the steady-state
# hit rate of a static top-c cache (the LFU fixed point) for capacities
# 1/2/4/8/16 — hits = occurrences of the top-c queries minus their c
# compulsory misses. The ranking is the aggregated-vocabulary window
# (ctf desc, term asc — next_word's discipline); the grand total rides
# in-plan. All BIGINT until the one final rate divide.
# --------------------------------------------------------------------------
CACHE_CAPS = (1, 2, 4, 8, 16)


def q_query_cache_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(
            F.expr(f"regexp_extract_all(lower(text), '{TOKEN_RUN}', 0)")
        ).alias("term")
    )
    ctf = toks.groupBy("term").agg(F.count(F.lit(1)).alias("ctf"))
    w = Window.orderBy(F.desc("ctf"), F.asc("term"))
    ranked = ctf.withColumn("rk", F.row_number().over(w))
    total = toks.agg(F.sum(F.lit(1)).cast("long").alias("_t"))
    parts = [
        ranked.filter(F.col("rk") <= c)
        .agg(
            F.lit(c).cast("long").alias("capacity"),
            F.count(F.lit(1)).cast("long").alias("n_cached_terms"),
            (F.sum("ctf") - F.count(F.lit(1))).cast("long").alias("n_hits"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "capacity",
            "n_cached_terms",
            "n_hits",
            F.round(F.col("n_hits") / F.col("_t"), 6).alias("hit_rate"),
        )
        for c in CACHE_CAPS
    ]
    res = parts[0]
    for p in parts[1:]:
        res = res.unionByName(p)
    return res


def _cache_sql() -> str:
    branches = "\nUNION ALL\n".join(
        f"""SELECT CAST({c} AS BIGINT) AS capacity,
       CAST(count(*) AS BIGINT) AS n_cached_terms,
       CAST(sum(ctf) - count(*) AS BIGINT) AS n_hits,
       round((sum(ctf) - count(*)) / (SELECT t FROM tot), 6) AS hit_rate
FROM ranked WHERE rk <= {c}"""
        for c in CACHE_CAPS
    )
    return f"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term
  FROM documents
),
ctfs AS (SELECT term, CAST(count(*) AS BIGINT) AS ctf FROM toks GROUP BY term),
ranked AS (
  SELECT term, ctf,
         row_number() OVER (ORDER BY ctf DESC, term) AS rk
  FROM ctfs
),
tot AS (SELECT CAST(sum(ctf) AS BIGINT) AS t FROM ctfs)
{branches}
"""


SQL_QUERY_CACHE_MODEL = _cache_sql()


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
# k-truss edge support: per-edge triangle count over the undirected
# _TRI_GENS graph (the edge-level companion to triangle_counts' node
# view and k_core's peeling), reported as the support histogram with the
# descending cumulative edge count — cum_edges_ge(s) is exactly the edge
# set a (s+2)-truss peel would START from, the sizing input for
# community-detection passes. Triangles enumerate once via the same
# degree-ordered orientation as triangle_counts (each triangle
# materializes exactly once; fan-out bounded by oriented out-degree);
# each contributes its three canonical (least,greatest) edges to one
# union + groupBy. All BIGINT; the cumulative window runs over the
# support LEVELS (bounded), not the edges.
# --------------------------------------------------------------------------
def q_edge_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, edges = _edges(spark, sf_dir, gens=_TRI_GENS)
    und = (
        edges.select(
            F.least("source_doc_id", "target_doc_id").alias("ua"),
            F.greatest("source_doc_id", "target_doc_id").alias("ub"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("ua").alias("v"))
        .unionByName(und.select(F.col("ub").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    da = deg.select(F.col("v").alias("ua"), F.col("d").alias("da"))
    db = deg.select(F.col("v").alias("ub"), F.col("d").alias("db"))
    lower = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("ua") < F.col("ub"))
    )
    o = (
        und.join(da, "ua")
        .join(db, "ub")
        .select(
            F.when(lower, F.col("ua")).otherwise(F.col("ub")).alias("src"),
            F.when(lower, F.col("ub")).otherwise(F.col("ua")).alias("dst"),
            F.when(lower, F.col("db")).otherwise(F.col("da")).alias("dd"),
        )
        .localCheckpoint(eager=True)
    )
    x, y, z = o.alias("x"), o.alias("y"), o.alias("z")
    tri = (
        x.join(
            y,
            (F.col("y.src") == F.col("x.src"))
            & (
                (F.col("x.dd") < F.col("y.dd"))
                | (
                    (F.col("x.dd") == F.col("y.dd"))
                    & (F.col("x.dst") < F.col("y.dst"))
                )
            ),
        )
        .join(
            z,
            (F.col("z.src") == F.col("x.dst"))
            & (F.col("z.dst") == F.col("y.dst")),
        )
        .select(
            F.col("x.src").alias("u"),
            F.col("x.dst").alias("v"),
            F.col("y.dst").alias("w"),
        )
    )
    erefs = (
        tri.select(F.least("u", "v").alias("ea"), F.greatest("u", "v").alias("eb"))
        .unionByName(
            tri.select(
                F.least("u", "w").alias("ea"), F.greatest("u", "w").alias("eb")
            )
        )
        .unionByName(
            tri.select(
                F.least("v", "w").alias("ea"), F.greatest("v", "w").alias("eb")
            )
        )
        .groupBy("ea", "eb")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
    )
    per_edge = und.join(
        erefs, (und.ua == erefs.ea) & (und.ub == erefs.eb), "left"
    ).select(F.coalesce("support", F.lit(0)).cast("long").alias("support"))
    hist = per_edge.groupBy("support").agg(
        F.count(F.lit(1)).cast("long").alias("n_edges")
    )
    w = Window.orderBy(F.desc("support")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return hist.select(
        "support",
        "n_edges",
        F.sum("n_edges").over(w).cast("long").alias("cum_edges_ge"),
    )


SQL_EDGE_SUPPORT = f"""
WITH {_edges_cte(_TRI_GENS)},
und AS (
  SELECT DISTINCT least(source_doc_id, target_doc_id) AS ua,
                  greatest(source_doc_id, target_doc_id) AS ub
  FROM edges
),
deg AS (
  SELECT v, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT ua AS v FROM und UNION ALL SELECT ub FROM und
  ) GROUP BY v
),
o AS (
  SELECT CASE WHEN (da.d, u.ua) < (db.d, u.ub) THEN u.ua ELSE u.ub END AS src,
         CASE WHEN (da.d, u.ua) < (db.d, u.ub) THEN u.ub ELSE u.ua END AS dst,
         CASE WHEN (da.d, u.ua) < (db.d, u.ub) THEN db.d ELSE da.d END AS dd
  FROM und u JOIN deg da ON da.v = u.ua JOIN deg db ON db.v = u.ub
),
tri AS (
  SELECT x.src AS u, x.dst AS v, y.dst AS w
  FROM o x JOIN o y ON y.src = x.src AND ((x.dd, x.dst) < (y.dd, y.dst))
  JOIN o z ON z.src = x.dst AND z.dst = y.dst
),
erefs AS (
  SELECT ea, eb, CAST(count(*) AS BIGINT) AS support FROM (
    SELECT least(u, v) AS ea, greatest(u, v) AS eb FROM tri
    UNION ALL SELECT least(u, w), greatest(u, w) FROM tri
    UNION ALL SELECT least(v, w), greatest(v, w) FROM tri
  ) GROUP BY ea, eb
),
per_edge AS (
  SELECT CAST(COALESCE(e.support, 0) AS BIGINT) AS support
  FROM und u LEFT JOIN erefs e ON e.ea = u.ua AND e.eb = u.ub
),
hist AS (
  SELECT support, CAST(count(*) AS BIGINT) AS n_edges
  FROM per_edge GROUP BY support
)
SELECT support, n_edges,
       CAST(sum(n_edges) OVER (ORDER BY support DESC
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS BIGINT) AS cum_edges_ge
FROM hist
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
# SQ8 scalar quantization audit (the faiss-SQ8 compression story for the
# ANN family): per-dimension train min/max over the embeddings table,
# quantize each value to an 8-bit code
#   code = floor((x - mn) / (mx - mn) * 255.0 + 0.5)
# and report, per dimension, the trained range, the number of DISTINCT
# codes actually used (codebook utilization), and the reconstruction
# error of the dequantized mn + code*(mx-mn)/255 — the go/no-go table
# for swapping 4-byte floats for 1-byte codes (4x smaller index) ahead
# of the exact-rerank stage. Determinism: min/max/max-err are
# order-free, the error SUM is floor-quantized to 1e-9 BIGINT per
# element (invariant 4), every IEEE expression is spelled identically
# in both engines, and the distinct-code count is two-phase
# (dim, code)-grouped on the Spark side (invariant 6 shape; dim is
# uniform and codes are <=256 so phase 2 is trivially bounded).
# --------------------------------------------------------------------------
def q_sq8_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _read(spark, sf_dir, "embeddings")
    vals = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim", "x"
        ),
    ).select(F.col("dim").cast("long").alias("dim"), "x")
    stats = vals.groupBy("dim").agg(
        F.min("x").alias("mn"),
        F.max("x").alias("mx"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    coded = (
        vals.join(F.broadcast(stats), "dim")
        .withColumn(
            "code",
            F.when(F.col("mx") == F.col("mn"), F.lit(0))
            .otherwise(
                F.floor(
                    (F.col("x") - F.col("mn"))
                    / (F.col("mx") - F.col("mn"))
                    * F.lit(255.0)
                    + F.lit(0.5)
                )
            )
            .cast("long"),
        )
        .withColumn(
            "err",
            F.abs(
                F.col("x")
                - (
                    F.col("mn")
                    + F.col("code").cast("double")
                    * (F.col("mx") - F.col("mn"))
                    / F.lit(255.0)
                )
            ),
        )
    )
    n_codes = (
        coded.groupBy("dim", "code")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy("dim")
        .agg(F.count(F.lit(1)).cast("long").alias("n_codes"))
    )
    errs = coded.groupBy("dim").agg(
        F.sum(F.floor(F.col("err") * F.lit(1000000000.0)).cast("long"))
        .cast("long")
        .alias("abs_err_sum9"),
        F.max("err").alias("_maxe"),
    )
    return (
        stats.join(n_codes, "dim")
        .join(errs, "dim")
        .select(
            "dim",
            F.round("mn", 6).alias("dim_min"),
            F.round("mx", 6).alias("dim_max"),
            "n_codes",
            "abs_err_sum9",
            F.round(
                F.col("abs_err_sum9").cast("double")
                / (F.col("n").cast("double") * F.lit(1000000000.0)),
                6,
            ).alias("mean_abs_err"),
            F.round("_maxe", 6).alias("max_abs_err"),
        )
        .orderBy("dim")
    )


SQL_SQ8_QUANTIZATION = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
dims AS (SELECT unnest(generate_series(1, {_EMB_DIM})) AS i),
vals AS (
  SELECT CAST(d.i - 1 AS BIGINT) AS dim, e.v[d.i] AS x FROM e, dims d
),
stats AS (
  SELECT dim, min(x) AS mn, max(x) AS mx, CAST(count(*) AS BIGINT) AS n
  FROM vals GROUP BY dim
),
coded AS (
  SELECT v.dim, v.x, s.mn, s.mx, s.n,
         CASE WHEN s.mx = s.mn THEN 0
              ELSE CAST(floor((v.x - s.mn) / (s.mx - s.mn) * 255.0 + 0.5)
                        AS BIGINT) END AS code
  FROM vals v JOIN stats s USING (dim)
),
errs AS (
  SELECT dim, code, n, mn, mx,
         abs(x - (mn + CAST(code AS DOUBLE) * (mx - mn) / 255.0)) AS err
  FROM coded
)
SELECT dim, round(mn, 6) AS dim_min, round(mx, 6) AS dim_max,
       CAST(count(DISTINCT code) AS BIGINT) AS n_codes,
       CAST(sum(CAST(floor(err * 1000000000.0) AS BIGINT)) AS BIGINT)
         AS abs_err_sum9,
       round(CAST(sum(CAST(floor(err * 1000000000.0) AS BIGINT)) AS DOUBLE)
             / (CAST(n AS DOUBLE) * 1000000000.0), 6) AS mean_abs_err,
       round(max(err), 6) AS max_abs_err
FROM errs
GROUP BY dim, n, mn, mx
ORDER BY dim
"""


# --------------------------------------------------------------------------
# Harmonic centrality from a seed sample (Boldi & Vigna 2014's preferred
# closeness variant — handles disconnected graphs without the 1/inf
# convention): H(v) = sum over seeds s of 1/d(s, v), estimated exactly by
# per-seed-tagged BFS from the doc_id%97 sample to a 6-hop horizon.
# Invariant 4 by integer construction: hop distances are BIGINTs and every
# reciprocal is scaled by LCM(1..6)=60, so 60/d is EXACT integer
# arithmetic and the centrality sum is a BIGINT (h60) with ONE display
# division. Scale shape: frontier rows are (seed, node) pairs — the exact
# small-seed-set verifier; the sketch path for all-sources harmonic at
# 10^9 nodes is HyperBall (HLL per node, see hll_distinct for the sketch
# primitive). Each round anti-joins the checkpointed visited set — no
# lineage blowup, bounded rounds.
# --------------------------------------------------------------------------
HARM_SEED_MOD = 97
HARM_ITERS = 6
HARM_LCM = 60  # lcm(1..6): every 60/d below is an exact integer


def q_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs, edges = _edges(spark, sf_dir)
    edges = edges.localCheckpoint(eager=True)
    visited = (
        docs.filter(F.col("doc_id") % HARM_SEED_MOD == 0)
        .select(
            F.col("doc_id").alias("seed"),
            F.col("doc_id").alias("doc_id"),
            F.lit(0).cast("long").alias("dist"),
        )
        .localCheckpoint(eager=True)
    )
    frontier = visited
    for i in range(1, HARM_ITERS + 1):
        nxt = (
            frontier.join(
                edges, frontier["doc_id"] == edges["source_doc_id"]
            )
            .select(
                "seed",
                F.col("target_doc_id").alias("doc_id"),
                F.lit(i).cast("long").alias("dist"),
            )
            .distinct()
            .join(visited.select("seed", "doc_id"), ["seed", "doc_id"], "left_anti")
            .localCheckpoint(eager=True)
        )
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return (
        visited.filter(F.col("dist") > 0)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_seeds"),
            F.sum((F.lit(float(HARM_LCM)) / F.col("dist")).cast("long"))
            .cast("long")
            .alias("h60"),
        )
        .select(
            "doc_id",
            "n_seeds",
            "h60",
            F.round(F.col("h60").cast("double") / F.lit(float(HARM_LCM)), 6).alias(
                "harmonic"
            ),
        )
    )


SQL_HARMONIC_CENTRALITY = f"""
WITH RECURSIVE {_EDGES_CTE},
msgs AS (
  SELECT source_doc_id AS from_node, target_doc_id AS to_node, 1 AS w
  FROM edges
  UNION ALL
  SELECT doc_id, doc_id, 0 FROM documents
),
bfs AS (
  SELECT 0 AS iter, doc_id AS seed, doc_id, CAST(0 AS BIGINT) AS dist
  FROM documents WHERE doc_id % {HARM_SEED_MOD} = 0
  UNION ALL
  SELECT b.iter + 1, b.seed, m.to_node AS doc_id,
         CAST(min(b.dist + m.w) AS BIGINT) AS dist
  FROM bfs b JOIN msgs m ON m.from_node = b.doc_id
  WHERE b.iter < {HARM_ITERS}
  GROUP BY 1, 2, 3
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_seeds,
       CAST(sum(CAST({HARM_LCM}.0 / dist AS BIGINT)) AS BIGINT) AS h60,
       round(CAST(sum(CAST({HARM_LCM}.0 / dist AS BIGINT)) AS BIGINT)
             / {HARM_LCM}.0, 6) AS harmonic
FROM bfs WHERE iter = {HARM_ITERS} AND dist > 0
GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# Cluster-quality audit (simplified silhouette, centroid form — Rousseeuw
# 1987 statistic with the O(n^2) point-pair mean replaced by the
# O(n*k*d) centroid distance, the standard large-n variant): per embeddings
# `label`, how separable the cluster is — a(v) = dist to own centroid,
# b(v) = dist to nearest OTHER centroid, s(v) = (b-a)/max(a,b). The
# go/no-go table for trusting `label` as a curation stratifier (cf.
# stratified_sample) or an IVF partition prior. Determinism: centroids are
# fixed6-integer means (ONE shared division per (label,dim)); per-element
# squared diffs are round-quantized to 1e-12 BIGINTs and integer-summed
# (invariant 4 — a groupBy double sum would be order-unspecified); sqrt
# and the silhouette ratio are computed on identical BIGINT-derived
# doubles in both engines, then per-vector s is fixed6-quantized before
# the per-label mean. Scale shape: k*d centroid table broadcast (640
# rows); the fan-out is n*k rows of BIGINTs — the same shape as IVF
# assignment.
# --------------------------------------------------------------------------
def q_cluster_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _read(spark, sf_dir, "embeddings")
    vals = emb.select(
        "vec_id",
        F.col("label").cast("long").alias("label"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim", "x"
        ),
    ).select(
        "vec_id", "label", F.col("dim").cast("long").alias("dim"), "x"
    )
    cent = (
        vals.groupBy("label", "dim")
        .agg(
            F.sum(F.round(F.col("x") * F.lit(1000000.0), 0).cast("long"))
            .cast("long")
            .alias("c6"),
            F.count(F.lit(1)).cast("long").alias("cn"),
        )
        .select(
            F.col("label").alias("clabel"),
            "dim",
            (
                F.col("c6").cast("double")
                / (F.col("cn").cast("double") * F.lit(1000000.0))
            ).alias("c"),
        )
    )
    sq = vals.join(F.broadcast(cent), "dim").select(
        "vec_id",
        "label",
        "clabel",
        F.round(
            (F.col("x") - F.col("c")) * (F.col("x") - F.col("c"))
            * F.lit(1000000000000.0),
            0,
        )
        .cast("long")
        .alias("sq12"),
    )
    per = sq.groupBy("vec_id", "label", "clabel").agg(
        F.sum("sq12").cast("long").alias("d12")
    )
    ab = per.groupBy("vec_id", "label").agg(
        F.max(
            F.when(F.col("clabel") == F.col("label"), F.col("d12"))
        ).alias("a12"),
        F.min(
            F.when(F.col("clabel") != F.col("label"), F.col("d12"))
        ).alias("b12"),
    )
    a = F.sqrt(F.col("a12").cast("double") / F.lit(1000000000000.0))
    b = F.sqrt(F.col("b12").cast("double") / F.lit(1000000000000.0))
    s6 = (
        F.when(F.greatest("a12", "b12") == 0, F.lit(0).cast("long"))
        .otherwise(
            F.round((b - a) / F.greatest(a, b) * F.lit(1000000.0), 0).cast(
                "long"
            )
        )
        .alias("s6")
    )
    sil = ab.select("label", s6)
    return (
        sil.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.sum("s6").cast("long").alias("sil_sum6"),
            F.min("s6").cast("long").alias("_min6"),
            F.max("s6").cast("long").alias("_max6"),
        )
        .select(
            "label",
            "n_vecs",
            F.round(
                F.col("sil_sum6").cast("double")
                / (F.col("n_vecs").cast("double") * F.lit(1000000.0)),
                6,
            ).alias("mean_silhouette"),
            F.round(F.col("_min6").cast("double") / F.lit(1000000.0), 6).alias(
                "min_silhouette"
            ),
            F.round(F.col("_max6").cast("double") / F.lit(1000000.0), 6).alias(
                "max_silhouette"
            ),
        )
        .orderBy("label")
    )


SQL_CLUSTER_QUALITY = f"""
WITH e AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label, embedding::DOUBLE[] AS v
  FROM embeddings
),
dims AS (SELECT unnest(generate_series(1, {_EMB_DIM})) AS i),
vals AS (
  SELECT e.vec_id, e.label, CAST(d.i - 1 AS BIGINT) AS dim, e.v[d.i] AS x
  FROM e, dims d
),
cent AS (
  SELECT label AS clabel, dim,
         CAST(sum(CAST(round(x * 1000000.0) AS BIGINT)) AS BIGINT)
           / (CAST(count(*) AS DOUBLE) * 1000000.0) AS c
  FROM vals GROUP BY label, dim
),
sq AS (
  SELECT v.vec_id, v.label, c.clabel,
         CAST(round((v.x - c.c) * (v.x - c.c) * 1000000000000.0) AS BIGINT)
           AS sq12
  FROM vals v JOIN cent c USING (dim)
),
per AS (
  SELECT vec_id, label, clabel, CAST(sum(sq12) AS BIGINT) AS d12
  FROM sq GROUP BY vec_id, label, clabel
),
ab AS (
  SELECT vec_id, label,
         max(CASE WHEN clabel = label THEN d12 END) AS a12,
         min(CASE WHEN clabel <> label THEN d12 END) AS b12
  FROM per GROUP BY vec_id, label
),
sil AS (
  SELECT label,
         CASE WHEN greatest(a12, b12) = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST(round(
                (sqrt(CAST(b12 AS DOUBLE) / 1000000000000.0)
                 - sqrt(CAST(a12 AS DOUBLE) / 1000000000000.0))
                / greatest(sqrt(CAST(a12 AS DOUBLE) / 1000000000000.0),
                           sqrt(CAST(b12 AS DOUBLE) / 1000000000000.0))
                * 1000000.0) AS BIGINT) END AS s6
  FROM ab
)
SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
       round(CAST(sum(s6) AS BIGINT)
             / (CAST(count(*) AS DOUBLE) * 1000000.0), 6) AS mean_silhouette,
       round(CAST(min(s6) AS BIGINT) / 1000000.0, 6) AS min_silhouette,
       round(CAST(max(s6) AS BIGINT) / 1000000.0, 6) AS max_silhouette
FROM sil
GROUP BY label
ORDER BY label
"""


# --------------------------------------------------------------------------
# Block-max postings audit (Ding & Suel 2011, Block-Max WAND): per term,
# split the doc_id-ordered posting list into 32-posting blocks, record
# each block's max impact (tf*idf6 — integer, the same quantized impact
# family as impact_quantization), and report per-term pruning headroom:
# 1 - mean(block_max)/global_max — the fraction of the term's WAND upper
# bound a block-max refinement shaves on an average block (0 = flat
# impacts, block-max useless; -> 1 = spiky, deep skips). This is the
# audit table for the engine's executor-side block-max WAND
# (query/postings_search.py); production builds it sharded by
# (term_bucket) in operators/postings.py — here the row_number window per
# term IS the posting-layout shape. All BIGINT; displays via identical
# double expressions (invariant 4).
# --------------------------------------------------------------------------
BLOCK_K = 32
BLOCK_MIN_BLOCKS = 4
BLOCK_TOP = 40


def q_block_max_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    tf = _tf(spark, sf_dir, mutated=False)
    docs = _read(spark, sf_dir, "documents")
    dfd = F.col("df").cast("double")
    idf6 = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
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
    w = Window.partitionBy("term").orderBy("doc_id")
    imp = tf.join(idf6, "term").select(
        "term",
        "doc_id",
        (F.col("tf") * F.col("idf6")).cast("long").alias("impact6"),
        F.row_number().over(w).alias("rn"),
    )
    blocks = (
        imp.withColumn(
            "blk", ((F.col("rn") - 1) / F.lit(BLOCK_K)).cast("long")
        )
        .groupBy("term", "blk")
        .agg(
            F.max("impact6").cast("long").alias("bmax"),
            F.count(F.lit(1)).cast("long").alias("bn"),
        )
    )
    return (
        blocks.groupBy("term")
        .agg(
            F.sum("bn").cast("long").alias("df"),
            F.count(F.lit(1)).cast("long").alias("n_blocks"),
            F.max("bmax").cast("long").alias("global_max6"),
            F.sum("bmax").cast("long").alias("_bsum"),
        )
        .filter(F.col("n_blocks") >= BLOCK_MIN_BLOCKS)
        .select(
            "term",
            "df",
            "n_blocks",
            "global_max6",
            F.round(
                F.col("_bsum").cast("double")
                / F.col("n_blocks").cast("double")
                / F.lit(1000000.0),
                6,
            ).alias("mean_block_max"),
            F.round(
                F.lit(1.0)
                - F.col("_bsum").cast("double")
                / F.col("n_blocks").cast("double")
                / F.col("global_max6").cast("double"),
                6,
            ).alias("prune_headroom"),
        )
        .orderBy(F.desc("df"), "term")
        .limit(BLOCK_TOP)
    )


SQL_BLOCK_MAX_SCORES = f"""
WITH {_tf_cte("documents")},
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
idf6 AS (
  SELECT term,
         CAST(round(ln((n.n - count(*) + 0.5) / (count(*) + 0.5) + 1.0)
                    * 1000000.0) AS BIGINT) AS idf6
  FROM tf, n GROUP BY term, n.n
),
imp AS (
  SELECT tf.term, tf.doc_id,
         CAST(tf.tf * idf6.idf6 AS BIGINT) AS impact6,
         row_number() OVER (PARTITION BY tf.term ORDER BY tf.doc_id) AS rn
  FROM tf JOIN idf6 USING (term)
),
blocks AS (
  SELECT term, CAST((rn - 1) // {BLOCK_K} AS BIGINT) AS blk,
         CAST(max(impact6) AS BIGINT) AS bmax,
         CAST(count(*) AS BIGINT) AS bn
  FROM imp GROUP BY term, blk
)
SELECT term, CAST(sum(bn) AS BIGINT) AS df,
       CAST(count(*) AS BIGINT) AS n_blocks,
       CAST(max(bmax) AS BIGINT) AS global_max6,
       round(CAST(sum(bmax) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             / 1000000.0, 6) AS mean_block_max,
       round(1.0 - CAST(sum(bmax) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             / CAST(max(bmax) AS DOUBLE), 6) AS prune_headroom
FROM blocks GROUP BY term
HAVING count(*) >= {BLOCK_MIN_BLOCKS}
ORDER BY df DESC, term
LIMIT {BLOCK_TOP}
"""


# --------------------------------------------------------------------------
# Sparse tf-idf cosine near-dup pairs (the weighted companion to
# ngram_jaccard_pairs' set semantics) over the mutated corpus: candidate
# pairs are blocked on shared RARE terms (corpus df <= 10 — the
# rare-term blocking of Bayardo et al.'s AllPairs family: a pair sharing
# no rare term is out of scope BY DEFINITION of the operator, and both
# engines apply the identical block), then the full tf*idf3 cosine is
# computed on candidates only. Integer-exact per invariant 4: weights
# are tf*idf3 BIGINTs (1e3 idf scale keeps squared sums far from BIGINT
# range), dot products and squared norms are integer sums, the cosine is
# ONE identical double expression quantized to c6 = round(cos*1e6)
# BEFORE the threshold compare (no double-vs-DECIMAL literal compare),
# emitted when c6 >= 600000. Ids-only candidate join (invariant 6);
# unordered output — no tie-sensitive LIMIT.
# --------------------------------------------------------------------------
SPARSE_RARE_DF = 10
SPARSE_COS6_MIN = 600000


def q_sparse_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    tf = _tf(spark, sf_dir, mutated=True)
    docs = _mut_docs(spark, sf_dir)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    dfd = F.col("df").cast("double")
    idf3 = dfreq.crossJoin(F.broadcast(scalar_count(docs))).select(
        "term",
        "df",
        F.round(
            F.log((F.col("_n") - dfd + 0.5) / (dfd + 0.5) + 1.0)
            * F.lit(1000.0),
            0,
        )
        .cast("long")
        .alias("idf3"),
    )
    tfw = tf.join(idf3, "term").select(
        "doc_id", "term", "df", (F.col("tf") * F.col("idf3")).cast("long").alias("w3")
    )
    norms = tfw.groupBy("doc_id").agg(
        F.sum(F.col("w3") * F.col("w3")).cast("long").alias("n2")
    )
    rare = tfw.filter(F.col("df") <= SPARSE_RARE_DF).select("doc_id", "term")
    cand = (
        rare.select("term", F.col("doc_id").alias("id_a"))
        .join(rare.select("term", F.col("doc_id").alias("id_b")), "term")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    ta = tfw.select(
        F.col("doc_id").alias("id_a"), "term", F.col("w3").alias("wa")
    )
    tb = tfw.select(
        F.col("doc_id").alias("id_b"), "term", F.col("w3").alias("wb")
    )
    dots = (
        cand.join(ta, "id_a")
        .join(tb, ["id_b", "term"])
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).cast("long").alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("id_a"), F.col("n2").alias("na2"))
    nb = norms.select(F.col("doc_id").alias("id_b"), F.col("n2").alias("nb2"))
    c6 = F.round(
        F.col("dot").cast("double")
        / (
            F.sqrt(F.col("na2").cast("double"))
            * F.sqrt(F.col("nb2").cast("double"))
        )
        * F.lit(1000000.0),
        0,
    ).cast("long")
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .select("id_a", "id_b", c6.alias("cosine6"))
        .filter(F.col("cosine6") >= SPARSE_COS6_MIN)
        .select(
            "id_a",
            "id_b",
            "cosine6",
            F.round(F.col("cosine6").cast("double") / F.lit(1000000.0), 6).alias(
                "cosine"
            ),
        )
    )


SQL_SPARSE_COSINE_PAIRS = f"""
WITH {_MUT_DOCS_CTE}, {_tf_cte("corpus")},
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM corpus),
idf3 AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df,
         CAST(round(ln((n.n - count(*) + 0.5) / (count(*) + 0.5) + 1.0)
                    * 1000.0) AS BIGINT) AS idf3
  FROM tf, n GROUP BY term, n.n
),
tfw AS (
  SELECT tf.doc_id, tf.term, idf3.df,
         CAST(tf.tf * idf3.idf3 AS BIGINT) AS w3
  FROM tf JOIN idf3 USING (term)
),
norms AS (
  SELECT doc_id, CAST(sum(w3 * w3) AS BIGINT) AS n2 FROM tfw GROUP BY doc_id
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM tfw a JOIN tfw b ON b.term = a.term AND a.doc_id < b.doc_id
  WHERE a.df <= {SPARSE_RARE_DF} AND b.df <= {SPARSE_RARE_DF}
),
dots AS (
  SELECT c.id_a, c.id_b, CAST(sum(ta.w3 * tb.w3) AS BIGINT) AS dot
  FROM cand c
  JOIN tfw ta ON ta.doc_id = c.id_a
  JOIN tfw tb ON tb.doc_id = c.id_b AND tb.term = ta.term
  GROUP BY c.id_a, c.id_b
),
scored AS (
  SELECT d.id_a, d.id_b,
         CAST(round(CAST(d.dot AS DOUBLE)
                    / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
                    * 1000000.0) AS BIGINT) AS cosine6
  FROM dots d
  JOIN norms na ON na.doc_id = d.id_a
  JOIN norms nb ON nb.doc_id = d.id_b
)
SELECT id_a, id_b, cosine6,
       round(CAST(cosine6 AS DOUBLE) / 1000000.0, 6) AS cosine
FROM scored WHERE cosine6 >= {SPARSE_COS6_MIN}
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
# Product-quantization audit (Jegou et al. 2011 PQ, the codebook family
# next to sq8_quantization's scalar path): 8 subspaces x 8 dims, 16-entry
# codebook per subspace taken as the sub-vectors of the 16 md5-smallest
# vec_ids (the same deterministic no-RNG seeding as train_ivf_centroids;
# production would Lloyd-refine — this audits the assignment/distortion
# machinery and the compression story: 64 floats -> 8 bytes). Per
# (vector, subspace): argmin squared L2 over the 16 codes with
# per-element diffs quantized to 1e-12 BIGINTs and integer-summed
# (invariant 4), ties broken on code id (lexicographic min-struct in
# Spark = ORDER BY d12, code in SQL). Reports per subspace the codebook
# utilization and the total/mean distortion. Fan-out is n x K x d rows
# of BIGINTs — the PQ-assignment shape; the codebook is a 1024-row
# broadcast.
# --------------------------------------------------------------------------
PQ_M = 8
PQ_SUB = _EMB_DIM // PQ_M
PQ_K = 16


def q_pq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _read(spark, sf_dir, "embeddings")
    vals = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim", "x"
        ),
    ).select("vec_id", F.col("dim").cast("long").alias("dim"), "x")
    w = Window.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
    seeds = (
        emb.select("vec_id", "embedding")
        .withColumn("code", F.row_number().over(w).cast("long") - 1)
        .filter(F.col("code") < PQ_K)
    )
    cb = seeds.select(
        "code",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim", "c"
        ),
    ).select(
        "code",
        F.col("dim").cast("long").alias("dim"),
        (F.col("dim").cast("long") / F.lit(PQ_SUB)).cast("long").alias("m"),
        "c",
    )
    dists = (
        vals.join(F.broadcast(cb), "dim")
        .groupBy("vec_id", "code", "m")
        .agg(
            F.sum(
                F.round(
                    (F.col("x") - F.col("c")) * (F.col("x") - F.col("c"))
                    * F.lit(1000000000000.0),
                    0,
                ).cast("long")
            )
            .cast("long")
            .alias("d12")
        )
    )
    best = (
        dists.groupBy("vec_id", "m")
        .agg(F.min(F.struct("d12", "code")).alias("_b"))
        .select("vec_id", "m", F.col("_b.code").alias("code"), F.col("_b.d12").alias("d12"))
    )
    util = (
        best.groupBy("m", "code")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy("m")
        .agg(F.count(F.lit(1)).cast("long").alias("n_codes_used"))
    )
    dist = best.groupBy("m").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.sum("d12").cast("long").alias("distortion_sum12"),
    )
    return (
        dist.join(util, "m")
        .select(
            "m",
            "n_vecs",
            "n_codes_used",
            "distortion_sum12",
            F.round(
                F.col("distortion_sum12").cast("double")
                / (F.col("n_vecs").cast("double") * F.lit(1000000000000.0)),
                6,
            ).alias("mean_distortion"),
        )
        .orderBy("m")
    )


SQL_PQ_AUDIT = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
ranked AS (
  SELECT vec_id, v,
         row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
           - 1 AS code
  FROM e
),
seeds AS (SELECT CAST(code AS BIGINT) AS code, v FROM ranked WHERE code < {PQ_K}),
dims AS (SELECT unnest(generate_series(1, {_EMB_DIM})) AS i),
cb AS (
  SELECT s.code, CAST(d.i - 1 AS BIGINT) AS dim,
         CAST((d.i - 1) // {PQ_SUB} AS BIGINT) AS m, s.v[d.i] AS c
  FROM seeds s, dims d
),
vals AS (
  SELECT e.vec_id, CAST(d.i - 1 AS BIGINT) AS dim, e.v[d.i] AS x
  FROM e, dims d
),
dists AS (
  SELECT v.vec_id, cb.code, cb.m,
         CAST(sum(CAST(round((v.x - cb.c) * (v.x - cb.c)
                             * 1000000000000.0) AS BIGINT)) AS BIGINT) AS d12
  FROM vals v JOIN cb USING (dim)
  GROUP BY v.vec_id, cb.code, cb.m
),
best AS (
  SELECT vec_id, m, code, d12 FROM dists
  QUALIFY row_number() OVER (PARTITION BY vec_id, m ORDER BY d12, code) = 1
)
SELECT m, CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(count(DISTINCT code) AS BIGINT) AS n_codes_used,
       CAST(sum(d12) AS BIGINT) AS distortion_sum12,
       round(CAST(sum(d12) AS DOUBLE)
             / (CAST(count(*) AS DOUBLE) * 1000000000000.0), 6)
         AS mean_distortion
FROM best
GROUP BY m
ORDER BY m
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


def q_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    _, v = _markov_chain(spark, sf_dir)
    emp = events.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    total = scalar_count(events, as_double=True)
    return (
        v.join(emp, v["t"] == emp["event_type"])
        .crossJoin(F.broadcast(total))
        .select(
            F.col("t").alias("event_type"),
            F.round("v", 6).alias("stationary"),
            F.round(F.col("cnt").cast("double") / F.col("_n"), 6).alias(
                "empirical"
            ),
        )
        .orderBy("event_type")
    )


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


SQL_MARKOV_STATIONARY = f"""
WITH RECURSIVE {_MARKOV_CTES},
emp AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1
),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM events)
SELECT vt.t AS event_type, round(vt.v, 6) AS stationary,
       round(emp.cnt / tot.n, 6) AS empirical
FROM vt JOIN emp ON emp.event_type = vt.t, tot
WHERE vt.iter = {MARKOV_ITERS}
ORDER BY event_type
"""


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
# Hub-knockout robustness (Albert, Jeong & Barabasi 2000's targeted-
# attack experiment): component census of the undirected link graph
# before and after deleting the 10 highest-degree nodes — the
# scale-free-network fragility audit. Spark side runs the EXACT
# large-star/small-star connected components (training_data/
# dedup.connected_components — convergence-checked, never truncates);
# the oracle replays min-label propagation for 96 fixed rounds (state
# is n rows per round, not the transitive closure — bounded; 96 >> the
# LCG graph's diameter at any test SF, and a shortfall would surface as
# a red pair, not a silent pass). Hubs picked by (degree desc, id asc)
# top-k — deterministic.
# --------------------------------------------------------------------------
KNOCKOUT_HUBS = 10
KNOCKOUT_LP_ROUNDS = 96


def q_hub_knockout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training_data.dedup import connected_components

    docs, edges = _edges(spark, sf_dir)
    und = (
        edges.select(
            F.least("source_doc_id", "target_doc_id").alias("id_a"),
            F.greatest("source_doc_id", "target_doc_id").alias("id_b"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("id_a").alias("v"))
        .unionByName(und.select(F.col("id_b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    hubs = (
        deg.orderBy(F.desc("d"), "v")
        .limit(KNOCKOUT_HUBS)
        .select(F.col("v").alias("hub"))
        .localCheckpoint(eager=True)
    )

    def census(phase, nodes, pairs):
        comp = connected_components(pairs, nodes=nodes, id_col="doc_id")
        sizes = comp.groupBy("component").agg(
            F.count(F.lit(1)).cast("long").alias("sz")
        )
        n_edges = pairs.agg(F.count(F.lit(1)).cast("long").alias("ne"))
        return (
            sizes.agg(
                F.count(F.lit(1)).cast("long").alias("n_components"),
                F.max("sz").cast("long").alias("largest_component"),
                F.sum("sz").cast("long").alias("n_nodes"),
            )
            .crossJoin(F.broadcast(n_edges))
            .select(
                F.lit(phase).alias("phase"),
                "n_nodes",
                F.col("ne").alias("n_edges"),
                "n_components",
                "largest_component",
            )
        )

    full = census("full", docs, und)
    kn_nodes = docs.join(
        F.broadcast(hubs), docs["doc_id"] == hubs["hub"], "left_anti"
    )
    kn_pairs = (
        und.join(F.broadcast(hubs), und["id_a"] == hubs["hub"], "left_anti")
        .join(F.broadcast(hubs), F.col("id_b") == hubs["hub"], "left_anti")
    )
    knocked = census("knocked", kn_nodes, kn_pairs)
    return full.unionByName(knocked).orderBy("phase")


SQL_HUB_KNOCKOUT = f"""
WITH RECURSIVE {_EDGES_CTE},
und AS (
  SELECT DISTINCT least(source_doc_id, target_doc_id) AS id_a,
                  greatest(source_doc_id, target_doc_id) AS id_b
  FROM edges
),
deg AS (
  SELECT v, count(*) AS d FROM (
    SELECT id_a AS v FROM und UNION ALL SELECT id_b FROM und
  ) GROUP BY v
),
hubs AS (SELECT v AS hub FROM deg ORDER BY d DESC, v LIMIT {KNOCKOUT_HUBS}),
kn_und AS (
  SELECT * FROM und
  WHERE id_a NOT IN (SELECT hub FROM hubs)
    AND id_b NOT IN (SELECT hub FROM hubs)
),
msgs_f AS (
  SELECT id_a AS src, id_b AS dst FROM und
  UNION ALL SELECT id_b, id_a FROM und
  UNION ALL SELECT doc_id, doc_id FROM documents
),
lp_f AS (
  SELECT 0 AS iter, doc_id AS node, doc_id AS lbl FROM documents
  UNION ALL
  SELECT lp.iter + 1, m.dst, min(lp.lbl)
  FROM lp_f lp JOIN msgs_f m ON m.src = lp.node
  WHERE lp.iter < {KNOCKOUT_LP_ROUNDS}
  GROUP BY 1, 2
),
comp_f AS (
  SELECT node, lbl AS component FROM lp_f
  WHERE iter = {KNOCKOUT_LP_ROUNDS}
),
kn_nodes AS (
  SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT hub FROM hubs)
),
msgs_k AS (
  SELECT id_a AS src, id_b AS dst FROM kn_und
  UNION ALL SELECT id_b, id_a FROM kn_und
  UNION ALL SELECT doc_id, doc_id FROM kn_nodes
),
lp_k AS (
  SELECT 0 AS iter, doc_id AS node, doc_id AS lbl FROM kn_nodes
  UNION ALL
  SELECT lp.iter + 1, m.dst, min(lp.lbl)
  FROM lp_k lp JOIN msgs_k m ON m.src = lp.node
  WHERE lp.iter < {KNOCKOUT_LP_ROUNDS}
  GROUP BY 1, 2
),
comp_k AS (
  SELECT node, lbl AS component FROM lp_k
  WHERE iter = {KNOCKOUT_LP_ROUNDS}
),
sizes_f AS (
  SELECT component, CAST(count(*) AS BIGINT) AS sz
  FROM comp_f GROUP BY component
),
sizes_k AS (
  SELECT component, CAST(count(*) AS BIGINT) AS sz
  FROM comp_k GROUP BY component
),
cen_f AS (
  SELECT 'full' AS phase,
         CAST(sum(sz) AS BIGINT) AS n_nodes,
         (SELECT CAST(count(*) AS BIGINT) FROM und) AS n_edges,
         CAST(count(*) AS BIGINT) AS n_components,
         CAST(max(sz) AS BIGINT) AS largest_component
  FROM sizes_f
),
cen_k AS (
  SELECT 'knocked' AS phase,
         CAST(sum(sz) AS BIGINT) AS n_nodes,
         (SELECT CAST(count(*) AS BIGINT) FROM kn_und) AS n_edges,
         CAST(count(*) AS BIGINT) AS n_components,
         CAST(max(sz) AS BIGINT) AS largest_component
  FROM sizes_k
)
SELECT * FROM cen_f UNION ALL SELECT * FROM cen_k
ORDER BY phase
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
# Dedup-detector evaluation against planted ground truth: the mutated
# corpus plants exactly one near-dup per doc_id%10==0 (30-char prefix
# strip), so precision/recall of the SimHash radius-3 detector are
# computable EXACTLY — TP = detected planted pairs, FP = detected
# non-planted pairs (organic near-dups in the synthetic corpus land
# here by definition of the planted truth), FN = planted pairs missed
# (tokenization-invisible mutations). All integer counts; precision/
# recall/F1 are single ratios (F1 = 2TP/(pred+truth) — exact, no
# harmonic-mean float chain). The eval every dedup deployment runs
# before trusting a detector at corpus scale.
# --------------------------------------------------------------------------
def q_dedup_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    pred = D.simhash_near_dup(
        _tf(spark, sf_dir, mutated=True), max_hamming=3
    ).select("id_a", "id_b")
    docs = _read(spark, sf_dir, "documents")
    truth = docs.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") + MUT_OFFSET).alias("id_b"),
    )
    tp = pred.join(truth, ["id_a", "id_b"]).agg(
        F.count(F.lit(1)).cast("long").alias("tp")
    )
    np_ = pred.agg(F.count(F.lit(1)).cast("long").alias("n_pred"))
    nt = truth.agg(F.count(F.lit(1)).cast("long").alias("n_truth"))
    return (
        tp.crossJoin(F.broadcast(np_))
        .crossJoin(F.broadcast(nt))
        .select(
            "tp",
            (F.col("n_pred") - F.col("tp")).cast("long").alias("fp"),
            (F.col("n_truth") - F.col("tp")).cast("long").alias("fn"),
            F.round(
                F.col("tp").cast("double") / F.col("n_pred").cast("double"), 6
            ).alias("precision"),
            F.round(
                F.col("tp").cast("double") / F.col("n_truth").cast("double"),
                6,
            ).alias("recall"),
            F.round(
                F.lit(2.0)
                * F.col("tp").cast("double")
                / (F.col("n_pred") + F.col("n_truth")).cast("double"),
                6,
            ).alias("f1"),
        )
    )


SQL_DEDUP_EVAL = f"""
WITH {_MUT_DOCS_CTE}, {_tf_cte("corpus")}, {_SIMHASH_CORE_CTE},
pred AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM fp a JOIN fp b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
),
truth AS (
  SELECT doc_id AS id_a, doc_id + {MUT_OFFSET} AS id_b
  FROM documents WHERE doc_id % 10 = 0
),
c AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM pred) AS np,
         (SELECT CAST(count(*) AS BIGINT) FROM truth) AS nt,
         (SELECT CAST(count(*) AS BIGINT)
          FROM pred JOIN truth USING (id_a, id_b)) AS tp
)
SELECT tp, CAST(np - tp AS BIGINT) AS fp, CAST(nt - tp AS BIGINT) AS fn,
       round(CAST(tp AS DOUBLE) / CAST(np AS DOUBLE), 6) AS precision,
       round(CAST(tp AS DOUBLE) / CAST(nt AS DOUBLE), 6) AS recall,
       round(2.0 * CAST(tp AS DOUBLE) / CAST(np + nt AS DOUBLE), 6) AS f1
FROM c
"""


# --------------------------------------------------------------------------
# LSH cluster-transitivity audit: how many intra-cluster pairs exist only
# through CHAINED merges (A~B, B~C but A!~C) vs direct LSH hits — the
# dedup-quality number that decides whether connected-components
# clustering over-merges (Gyawali et al. 2020 report chaining as the #1
# CC failure mode at corpus scale; a high chained share at small
# cluster sizes is benign, at large sizes it means topic collapse).
# Reports per cluster size: cluster count, direct pairs, possible pairs
# s(s-1)/2, chained = possible - direct. Pure integers; the CC is the
# convergence-checked star contraction on the Spark side and the reach
# closure in the oracle (cluster sizes bounded by construction).
# --------------------------------------------------------------------------
def q_lsh_transitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _mut_docs(spark, sf_dir)
    sig = D.minhash_signatures(D.shingles(corpus), num_perm=9)
    pairs = D.lsh_candidate_pairs(sig, rows_per_band=3).localCheckpoint(
        eager=True
    )
    comps = D.connected_components(pairs).localCheckpoint(eager=True)
    ca = comps.select(
        F.col("doc_id").alias("id_a"), F.col("component").alias("comp")
    )
    direct = (
        pairs.join(ca, "id_a")
        .groupBy("comp")
        .agg(F.count(F.lit(1)).cast("long").alias("dp"))
    )
    sizes = comps.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("sz")
    ).select(F.col("component").alias("comp"), "sz")
    per = sizes.join(direct, "comp", "left").select(
        "sz",
        F.coalesce("dp", F.lit(0)).cast("long").alias("dp"),
        F.expr("(sz * (sz - 1)) div 2").cast("long").alias("poss"),
    )
    return (
        per.groupBy("sz")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clusters"),
            F.sum("dp").cast("long").alias("direct_pairs"),
            F.sum("poss").cast("long").alias("possible_pairs"),
            F.sum(F.col("poss") - F.col("dp")).cast("long").alias(
                "chained_pairs"
            ),
        )
        .orderBy("sz")
    )


SQL_LSH_TRANSITIVITY = f"""
WITH RECURSIVE {_MUT_DOCS_CTE}, {_shingle_cte()},
sig AS (
  SELECT doc_id, s.seed, min(md5(s.seed || ':' || shingle)) AS mh
  FROM sh, (SELECT unnest(range(9))::INT AS seed) s
  GROUP BY doc_id, s.seed
),
bands AS (
  SELECT doc_id, (seed // 3)::INT AS band,
         md5(string_agg(mh, '|' ORDER BY seed)) AS bh
  FROM sig GROUP BY doc_id, seed // 3
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach AS (
  SELECT src AS node, dst AS peer FROM edges
  UNION
  SELECT r.node, e.dst FROM reach r JOIN edges e ON e.src = r.peer
),
comp AS (
  SELECT node AS doc_id, least(node, min(peer)) AS component
  FROM reach GROUP BY node
),
direct AS (
  SELECT c.component AS comp, CAST(count(*) AS BIGINT) AS dp
  FROM pairs p JOIN comp c ON c.doc_id = p.id_a GROUP BY 1
),
sizes AS (
  SELECT component AS comp, CAST(count(*) AS BIGINT) AS sz
  FROM comp GROUP BY 1
),
per AS (
  SELECT s.sz, CAST(COALESCE(d.dp, 0) AS BIGINT) AS dp,
         CAST((s.sz * (s.sz - 1)) // 2 AS BIGINT) AS poss
  FROM sizes s LEFT JOIN direct d USING (comp)
)
SELECT sz, CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(sum(dp) AS BIGINT) AS direct_pairs,
       CAST(sum(poss) AS BIGINT) AS possible_pairs,
       CAST(sum(poss - dp) AS BIGINT) AS chained_pairs
FROM per GROUP BY sz ORDER BY sz
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
# SimHash bit-balance audit (hash-quality check behind the
# simhash_near_dup family: Charikar's guarantee needs each fingerprint
# bit to be an unbiased hyperplane — a skewed bit inflates band
# collisions and the candidate fan-out): per bit position, the fraction
# of corpus fingerprints with the bit set and its deviation from 0.5.
# Bit extraction via the same sign-safe mask CASE as the fingerprint
# builder (bit 63 is MIN_LONG — never a 64-bit shift); pure integer
# counts, two identical display ratios.
# --------------------------------------------------------------------------
def q_simhash_bit_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    fps = D.simhash_fingerprints(_tf(spark, sf_dir, mutated=False))
    bits = fps.select(
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(63))).alias("p"),
    ).select(
        "p",
        F.expr(
            "CASE WHEN p = 63"
            " THEN CAST(-9223372036854775807 AS BIGINT) - CAST(1 AS BIGINT)"
            " ELSE shiftleft(CAST(1 AS BIGINT), p) END"
        ).alias("mask"),
        "simhash",
    )
    return (
        bits.groupBy("p")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(
                F.when(
                    F.col("simhash").bitwiseAND(F.col("mask")) != 0, 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("ones"),
        )
        .select(
            F.col("p").cast("long").alias("p"),
            "n_docs",
            "ones",
            F.round(
                F.col("ones").cast("double") / F.col("n_docs").cast("double"),
                6,
            ).alias("ones_share"),
            F.round(
                F.abs(
                    F.col("ones").cast("double")
                    / F.col("n_docs").cast("double")
                    - 0.5
                ),
                6,
            ).alias("bias"),
        )
        .orderBy("p")
    )


SQL_SIMHASH_BIT_BALANCE = f"""
WITH {_tf_cte("documents")}, {_SIMHASH_CORE_CTE},
bits AS (
  SELECT b.p,
         CASE WHEN b.p = 63 THEN {MIN_LONG_SQL}
              ELSE 1::BIGINT << b.p END AS mask,
         fp.simhash
  FROM fp, (SELECT unnest(range(64))::INT AS p) b
)
SELECT CAST(p AS BIGINT) AS p,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN (simhash & mask) <> 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS ones,
       round(CAST(sum(CASE WHEN (simhash & mask) <> 0 THEN 1 ELSE 0 END)
                  AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS ones_share,
       round(abs(CAST(sum(CASE WHEN (simhash & mask) <> 0 THEN 1 ELSE 0 END)
                      AS DOUBLE) / CAST(count(*) AS DOUBLE) - 0.5), 6) AS bias
FROM bits
GROUP BY p
ORDER BY p
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
# SRP (signed random projection) distortion audit — the Johnson-
# Lindenstrauss/Charikar estimator-quality check behind ann_lsh_topk and
# embedding_near_dup: over a deterministic pseudo-random pair sample
# ((v, (37v+11) mod n) for v%5==0), the TRUE ordered-fold cosine vs the
# 64-plane sign-agreement estimate cos(pi*hamming/64). Hamming counts
# are exact integers; the ONLY libm call is cos() over the FIXED 65-value
# grid pi*k/64 (data-independent — both engines' libm agree to well
# under the round-6 grid there). Per-pair error column; signs replicate
# srp_banded bit-for-bit (md5 hyperplanes, ordered folds — invariant 4).
# --------------------------------------------------------------------------
SRP_DIST_PLANES = 64
SRP_DIST_MOD = 5


def q_srp_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training_data.similarity import cosine_similarity_col

    emb = _read(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    signed = S.srp_signs(
        emb, n_planes=SRP_DIST_PLANES, dim=_EMB_DIM
    ).select("vec_id", "embedding", "srp_bits")
    n = scalar_count(emb, as_double=False)
    a = (
        signed.filter(F.col("vec_id") % SRP_DIST_MOD == 0)
        .crossJoin(F.broadcast(n))
        .select(
            F.col("vec_id").alias("id_a"),
            ((F.col("vec_id") * 37 + 11) % F.col("_n")).alias("id_b"),
            F.col("embedding").alias("va"),
            F.col("srp_bits").alias("ba"),
        )
    )
    b = signed.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vb"),
        F.col("srp_bits").alias("bb"),
    )
    ham = F.aggregate(
        F.zip_with(F.col("ba"), F.col("bb"), lambda x, y: F.abs(x - y)),
        F.lit(0),
        lambda acc, x: acc + x,
    ).cast("long")
    true_cos = F.round(
        cosine_similarity_col(F.col("va"), F.col("vb")), 6
    )
    est_cos = F.round(
        F.cos(
            F.lit(math.pi) * ham.cast("double") / F.lit(float(SRP_DIST_PLANES))
        ),
        6,
    )
    return (
        a.join(b, "id_b")
        .filter(F.col("id_a") != F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            ham.alias("hamming"),
            true_cos.alias("true_cos"),
            est_cos.alias("est_cos"),
            F.round(est_cos - true_cos, 6).alias("err"),
        )
        .orderBy("id_a")
    )


SQL_SRP_DISTORTION = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
{_srp_cte("e", SRP_DIST_PLANES, 8)},
n AS (SELECT count(*) AS n FROM embeddings),
pp AS (
  SELECT vec_id AS id_a,
         CAST((vec_id * 37 + 11) % (SELECT n FROM n) AS BIGINT) AS id_b
  FROM e WHERE vec_id % {SRP_DIST_MOD} = 0
),
ham AS (
  SELECT p.id_a, p.id_b, CAST(sum(abs(xa.bit - xb.bit)) AS BIGINT) AS hamming
  FROM pp p
  JOIN bits xa ON xa.vec_id = p.id_a
  JOIN bits xb ON xb.vec_id = p.id_b AND xb.p = xa.p
  WHERE p.id_a <> p.id_b
  GROUP BY 1, 2
)
SELECT h.id_a, h.id_b, h.hamming,
       round(list_sum(list_transform(list_zip(ea.v, eb.v), z -> z[1] * z[2]))
         / (sqrt(list_sum(list_transform(ea.v, x -> x * x)))
            * sqrt(list_sum(list_transform(eb.v, x -> x * x)))), 6) AS true_cos,
       round(cos(pi() * CAST(h.hamming AS DOUBLE)
                 / {SRP_DIST_PLANES}.0), 6) AS est_cos,
       round(round(cos(pi() * CAST(h.hamming AS DOUBLE)
                       / {SRP_DIST_PLANES}.0), 6)
             - round(list_sum(list_transform(list_zip(ea.v, eb.v),
                                             z -> z[1] * z[2]))
               / (sqrt(list_sum(list_transform(ea.v, x -> x * x)))
                  * sqrt(list_sum(list_transform(eb.v, x -> x * x)))), 6), 6)
         AS err
FROM ham h
JOIN e ea ON ea.vec_id = h.id_a
JOIN e eb ON eb.vec_id = h.id_b
ORDER BY h.id_a
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
# ANN recall@10 evaluation (the number that decides whether the LSH index
# ships — upgraded from the unit suite to a PAIRED operator so the
# oracle independently replays BOTH the detector and the ground truth):
# per probe (vec_id%100==0), exact brute-force top-10 vs the top-10
# among SRP band-collision candidates (same 16-plane/4-band config as
# ann_lsh_topk), recall = overlap/10. Cosines on the round-6 grid with
# id tie-break before every top-k (cross-engine rank stability); bucket
# bits replicate srp_banded bit-for-bit. Also reports the candidate-set
# size — the recall-vs-cost tradeoff in one table.
# --------------------------------------------------------------------------
ANN_RECALL_MOD = 100
ANN_RECALL_K = 10


def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _read(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    banded = S.srp_banded(
        emb, n_planes=ANN_PLANES, bands=ANN_BANDS, dim=_EMB_DIM
    ).localCheckpoint(eager=True)
    pb = banded.filter(F.col("id") % ANN_RECALL_MOD == 0).select(
        F.col("id").alias("probe_id"), "band", "bucket"
    )
    cand = (
        pb.join(banded, ["band", "bucket"])
        .filter(F.col("id") != F.col("probe_id"))
        .select("probe_id", F.col("id").alias("vec_id"))
        .distinct()
    )
    pv = emb.filter(F.col("vec_id") % ANN_RECALL_MOD == 0).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("_pv")
    )
    cos6 = F.round(
        S.cosine_similarity_col(F.col("_pv"), F.col("embedding")), 6
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    exact = (
        F.broadcast(pv)
        .join(emb, F.col("probe_id") != F.col("vec_id"))
        .select("probe_id", "vec_id", cos6.alias("cos"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= ANN_RECALL_K)
        .select("probe_id", "vec_id")
    )
    ann = (
        cand.join(F.broadcast(pv), "probe_id")
        .join(emb, "vec_id")
        .select("probe_id", "vec_id", cos6.alias("cos"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= ANN_RECALL_K)
        .select("probe_id", "vec_id")
    )
    ncand = cand.groupBy("probe_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_candidates")
    )
    hits = exact.join(ann, ["probe_id", "vec_id"]).groupBy("probe_id").agg(
        F.count(F.lit(1)).cast("long").alias("hits")
    )
    return (
        ncand.join(hits, "probe_id", "left")
        .select(
            "probe_id",
            "n_candidates",
            F.coalesce("hits", F.lit(0)).cast("long").alias("hits"),
            F.round(
                F.coalesce("hits", F.lit(0)).cast("double")
                / F.lit(float(ANN_RECALL_K)),
                6,
            ).alias("recall_at_10"),
        )
        .orderBy("probe_id")
    )


SQL_ANN_RECALL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
{_srp_cte("e", ANN_PLANES, ANN_PLANES // ANN_BANDS)},
pb AS (
  SELECT vec_id AS probe_id, band, bucket FROM buckets
  WHERE vec_id % {ANN_RECALL_MOD} = 0
),
cand AS (
  SELECT DISTINCT p.probe_id, b.vec_id
  FROM pb p JOIN buckets b ON b.band = p.band AND b.bucket = p.bucket
  WHERE b.vec_id <> p.probe_id
),
scored AS (
  SELECT p.vec_id AS probe_id, c.vec_id,
         round(list_sum(list_transform(list_zip(p.v, c.v), z -> z[1] * z[2]))
           / (sqrt(list_sum(list_transform(p.v, x -> x * x)))
              * sqrt(list_sum(list_transform(c.v, x -> x * x)))), 6) AS cos
  FROM e p JOIN e c ON p.vec_id <> c.vec_id
  WHERE p.vec_id % {ANN_RECALL_MOD} = 0
),
exact AS (
  SELECT probe_id, vec_id FROM scored
  QUALIFY row_number() OVER (PARTITION BY probe_id
                             ORDER BY cos DESC, vec_id) <= {ANN_RECALL_K}
),
ann AS (
  SELECT s.probe_id, s.vec_id FROM scored s
  JOIN cand USING (probe_id, vec_id)
  QUALIFY row_number() OVER (PARTITION BY s.probe_id
                             ORDER BY s.cos DESC, s.vec_id) <= {ANN_RECALL_K}
),
ncand AS (
  SELECT probe_id, CAST(count(*) AS BIGINT) AS n_candidates
  FROM cand GROUP BY probe_id
),
hits AS (
  SELECT probe_id, CAST(count(*) AS BIGINT) AS hits
  FROM exact JOIN ann USING (probe_id, vec_id) GROUP BY probe_id
)
SELECT n.probe_id, n.n_candidates,
       CAST(COALESCE(h.hits, 0) AS BIGINT) AS hits,
       round(CAST(COALESCE(h.hits, 0) AS DOUBLE) / {ANN_RECALL_K}.0, 6)
         AS recall_at_10
FROM ncand n LEFT JOIN hits h ON h.probe_id = n.probe_id
ORDER BY n.probe_id
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


US_PER_MINUTE_DIV = 60_000_000


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
# Global transitivity (Newman's C = 3*triangles/wedges — the one-number
# global companion to triangle_counts' per-node clustering): triangles
# via the same degree-ordered orientation (each counted once), wedges =
# sum d(d-1)/2 over undirected degrees — ALL integers, one final ratio.
# Over the triangle-closing generator graph (_TRI_GENS, as
# triangle_counts/edge_support).
# --------------------------------------------------------------------------
def q_global_transitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, edges = _edges(spark, sf_dir, gens=_TRI_GENS)
    und = (
        edges.select(
            F.least("source_doc_id", "target_doc_id").alias("ua"),
            F.greatest("source_doc_id", "target_doc_id").alias("ub"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("ua").alias("v"))
        .unionByName(und.select(F.col("ub").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    wedges = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum(F.expr("(d * (d - 1)) div 2")).cast("long").alias("n_wedges"),
    )
    da = deg.select(F.col("v").alias("ua"), F.col("d").alias("da"))
    db = deg.select(F.col("v").alias("ub"), F.col("d").alias("db"))
    lower = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("ua") < F.col("ub"))
    )
    o = (
        und.join(da, "ua")
        .join(db, "ub")
        .select(
            F.when(lower, F.col("ua")).otherwise(F.col("ub")).alias("src"),
            F.when(lower, F.col("ub")).otherwise(F.col("ua")).alias("dst"),
            F.when(lower, F.col("db")).otherwise(F.col("da")).alias("dd"),
        )
        .localCheckpoint(eager=True)
    )
    x, y, z = o.alias("x"), o.alias("y"), o.alias("z")
    tri = (
        x.join(
            y,
            (F.col("y.src") == F.col("x.src"))
            & (
                (F.col("x.dd") < F.col("y.dd"))
                | (
                    (F.col("x.dd") == F.col("y.dd"))
                    & (F.col("x.dst") < F.col("y.dst"))
                )
            ),
        )
        .join(
            z,
            (F.col("z.src") == F.col("x.dst"))
            & (F.col("z.dst") == F.col("y.dst")),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    ne = und.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    return (
        wedges.crossJoin(F.broadcast(tri))
        .crossJoin(F.broadcast(ne))
        .select(
            "n_nodes",
            "n_edges",
            "n_triangles",
            "n_wedges",
            F.round(
                F.lit(3.0)
                * F.col("n_triangles").cast("double")
                / F.col("n_wedges").cast("double"),
                6,
            ).alias("transitivity"),
        )
    )


SQL_GLOBAL_TRANSITIVITY = f"""
WITH {_edges_cte(_TRI_GENS)},
und AS (
  SELECT DISTINCT least(source_doc_id, target_doc_id) AS ua,
                  greatest(source_doc_id, target_doc_id) AS ub
  FROM edges
),
deg AS (
  SELECT v, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT ua AS v FROM und UNION ALL SELECT ub FROM und
  ) GROUP BY v
),
o AS (
  SELECT CASE WHEN (da.d, u.ua) < (db.d, u.ub) THEN u.ua ELSE u.ub END AS src,
         CASE WHEN (da.d, u.ua) < (db.d, u.ub) THEN u.ub ELSE u.ua END AS dst,
         CASE WHEN (da.d, u.ua) < (db.d, u.ub) THEN db.d ELSE da.d END AS dd
  FROM und u JOIN deg da ON da.v = u.ua JOIN deg db ON db.v = u.ub
),
tri AS (
  SELECT CAST(count(*) AS BIGINT) AS n_triangles
  FROM o x JOIN o y ON y.src = x.src AND ((x.dd, x.dst) < (y.dd, y.dst))
  JOIN o z ON z.src = x.dst AND z.dst = y.dst
),
w AS (
  SELECT CAST(count(*) AS BIGINT) AS n_nodes,
         CAST(sum((d * (d - 1)) // 2) AS BIGINT) AS n_wedges
  FROM deg
),
ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM und)
SELECT w.n_nodes, ne.n_edges, tri.n_triangles, w.n_wedges,
       round(3.0 * CAST(tri.n_triangles AS DOUBLE)
             / CAST(w.n_wedges AS DOUBLE), 6) AS transitivity
FROM w, tri, ne
"""


# --------------------------------------------------------------------------
# Bow-tie structure census (Broder et al. 2000, "Graph structure in the
# web" — THE web-graph macro-structure analysis): pick the max-in-degree
# hub (id tiebreak), run 8-hop forward BFS (reachable FROM the hub) and
# backward BFS (nodes REACHING the hub), classify every node CORE
# (both), IN (reaches only), OUT (reached only), OTHER. True SCC-based
# bow-tie needs unbounded closure; the 8-hop horizon is the documented
# bounded variant (identical in both engines — a horizon shortfall
# would show as identical class shifts on both sides, never a silent
# divergence). Pure integer BFS, bounded rounds, visited-set anti-joins.
# --------------------------------------------------------------------------
BOWTIE_HOPS = 8


def q_bowtie_structure(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs, edges = _edges(spark, sf_dir)
    edges = edges.localCheckpoint(eager=True)
    ind = edges.groupBy("target_doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    hub = (
        ind.orderBy(F.desc("d"), "target_doc_id")
        .limit(1)
        .select(F.col("target_doc_id").alias("doc_id"))
        .localCheckpoint(eager=True)
    )

    def reach(edge_df, src_col, dst_col):
        visited = hub
        frontier = hub
        for _ in range(BOWTIE_HOPS):
            nxt = (
                frontier.join(
                    edge_df, frontier["doc_id"] == edge_df[src_col]
                )
                .select(F.col(dst_col).alias("doc_id"))
                .distinct()
                .join(visited, "doc_id", "left_anti")
                .localCheckpoint(eager=True)
            )
            visited = visited.unionByName(nxt).localCheckpoint(eager=True)
            frontier = nxt
        return visited

    fwd = reach(edges, "source_doc_id", "target_doc_id").select(
        "doc_id", F.lit(1).alias("_f")
    )
    bwd = reach(edges, "target_doc_id", "source_doc_id").select(
        "doc_id", F.lit(1).alias("_b")
    )
    classed = (
        docs.join(fwd, "doc_id", "left")
        .join(bwd, "doc_id", "left")
        .select(
            F.when((F.col("_f") == 1) & (F.col("_b") == 1), F.lit("CORE"))
            .when(F.col("_b") == 1, F.lit("IN"))
            .when(F.col("_f") == 1, F.lit("OUT"))
            .otherwise(F.lit("OTHER"))
            .alias("component")
        )
    )
    return (
        classed.groupBy("component")
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        .orderBy("component")
    )


SQL_BOWTIE_STRUCTURE = f"""
WITH RECURSIVE {_EDGES_CTE},
ind AS (SELECT target_doc_id AS v, CAST(count(*) AS BIGINT) AS d
        FROM edges GROUP BY target_doc_id),
hub AS (SELECT v AS doc_id FROM ind ORDER BY d DESC, v LIMIT 1),
fmsgs AS (
  SELECT source_doc_id AS src, target_doc_id AS dst FROM edges
  UNION ALL SELECT doc_id, doc_id FROM documents
),
fwd AS (
  SELECT 0 AS iter, doc_id FROM hub
  UNION ALL
  SELECT f.iter + 1, m.dst
  FROM fwd f JOIN fmsgs m ON m.src = f.doc_id
  WHERE f.iter < {BOWTIE_HOPS}
  GROUP BY 1, 2
),
freach AS (SELECT DISTINCT doc_id FROM fwd),
bmsgs AS (
  SELECT target_doc_id AS src, source_doc_id AS dst FROM edges
  UNION ALL SELECT doc_id, doc_id FROM documents
),
bwd AS (
  SELECT 0 AS iter, doc_id FROM hub
  UNION ALL
  SELECT b.iter + 1, m.dst
  FROM bwd b JOIN bmsgs m ON m.src = b.doc_id
  WHERE b.iter < {BOWTIE_HOPS}
  GROUP BY 1, 2
),
breach AS (SELECT DISTINCT doc_id FROM bwd)
SELECT CASE WHEN f.doc_id IS NOT NULL AND b.doc_id IS NOT NULL THEN 'CORE'
            WHEN b.doc_id IS NOT NULL THEN 'IN'
            WHEN f.doc_id IS NOT NULL THEN 'OUT'
            ELSE 'OTHER' END AS component,
       CAST(count(*) AS BIGINT) AS n_nodes
FROM documents d
LEFT JOIN freach f ON f.doc_id = d.doc_id
LEFT JOIN breach b ON b.doc_id = d.doc_id
GROUP BY component
ORDER BY component
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
# Rich-club coefficient (Zhou & Mondragon 2004; Colizza 2006 made it the
# standard hub-interconnection audit): for each degree threshold k in a
# fixed sweep, phi(k) = 2*E_k / (n_k*(n_k-1)) where n_k = nodes with
# degree > k and E_k = undirected edges with BOTH endpoints above k —
# do hubs link to each other more than chance? One pass: explode the
# k-sweep over the degree-annotated edge list, conditional integer
# counts, one ratio per row. Complements hub_knockout (what happens if
# hubs die) with how tightly the club is wired while alive.
# --------------------------------------------------------------------------
RICH_CLUB_KS = [2, 3, 4, 5, 6, 8]


def q_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, edges = _edges(spark, sf_dir)
    und = (
        edges.select(
            F.least("source_doc_id", "target_doc_id").alias("ua"),
            F.greatest("source_doc_id", "target_doc_id").alias("ub"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("ua").alias("v"))
        .unionByName(und.select(F.col("ub").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
        .localCheckpoint(eager=True)
    )
    ks = F.explode(F.array(*[F.lit(k) for k in RICH_CLUB_KS])).alias("k")
    nk = (
        deg.select("d", ks)
        .groupBy("k")
        .agg(
            F.sum(F.when(F.col("d") > F.col("k"), 1).otherwise(0))
            .cast("long")
            .alias("n_k")
        )
    )
    da = deg.select(F.col("v").alias("ua"), F.col("d").alias("da"))
    db = deg.select(F.col("v").alias("ub"), F.col("d").alias("db"))
    ek = (
        und.join(da, "ua")
        .join(db, "ub")
        .select("da", "db", ks)
        .groupBy("k")
        .agg(
            F.sum(
                F.when(
                    (F.col("da") > F.col("k")) & (F.col("db") > F.col("k")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("e_k")
        )
    )
    return (
        nk.join(ek, "k")
        .select(
            F.col("k").cast("long").alias("k"),
            "n_k",
            "e_k",
            F.when(
                F.col("n_k") >= 2,
                F.round(
                    F.lit(2.0)
                    * F.col("e_k").cast("double")
                    / (F.col("n_k") * (F.col("n_k") - 1)).cast("double"),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("phi"),
        )
        .orderBy("k")
    )


def _rich_club_sql() -> str:
    klist = ", ".join(str(k) for k in RICH_CLUB_KS)
    return f"""
WITH {_EDGES_CTE.replace("nn AS", "nn AS")},
und AS (
  SELECT DISTINCT least(source_doc_id, target_doc_id) AS ua,
                  greatest(source_doc_id, target_doc_id) AS ub
  FROM edges
),
deg AS (
  SELECT v, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT ua AS v FROM und UNION ALL SELECT ub FROM und
  ) GROUP BY v
),
ks AS (SELECT unnest([{klist}]) AS k),
nk AS (
  SELECT ks.k,
         CAST(sum(CASE WHEN deg.d > ks.k THEN 1 ELSE 0 END) AS BIGINT) AS n_k
  FROM deg, ks GROUP BY ks.k
),
ek AS (
  SELECT ks.k,
         CAST(sum(CASE WHEN da.d > ks.k AND db.d > ks.k
                       THEN 1 ELSE 0 END) AS BIGINT) AS e_k
  FROM und u JOIN deg da ON da.v = u.ua JOIN deg db ON db.v = u.ub, ks
  GROUP BY ks.k
)
SELECT CAST(nk.k AS BIGINT) AS k, nk.n_k, ek.e_k,
       CASE WHEN nk.n_k >= 2 THEN
         round(2.0 * CAST(ek.e_k AS DOUBLE)
               / CAST(nk.n_k * (nk.n_k - 1) AS DOUBLE), 6)
       ELSE 0.0 END AS phi
FROM nk JOIN ek ON ek.k = nk.k
ORDER BY k
"""


SQL_RICH_CLUB = _rich_club_sql()


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
# Label modularity on the similarity graph (Newman 2004's Q for the
# label partition over SRP bucket-collision edges — does the `label`
# column explain the embedding neighborhood structure? The graph-side
# twin of cluster_quality's geometric silhouette): Q = intra/m -
# sum(deg_l^2)/(4m^2), computed from THREE exact BIGINTs (intra-edge
# count, total edges, sum of squared label degrees) — no per-label float
# accumulation at all. Edges are the deterministic 32-plane/4-band SRP
# collisions (same machinery as embedding_near_dup).
# --------------------------------------------------------------------------
def q_label_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _read(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", F.col("label").cast("long").alias("label")
    )
    banded = S.srp_banded(
        emb, n_planes=ND_PLANES, bands=ND_BANDS, dim=_EMB_DIM
    )
    a = banded.select(F.col("id").alias("id_a"), "band", "bucket")
    b = banded.select(F.col("id").alias("id_b"), "band", "bucket")
    pairs = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    la = emb.select(F.col("vec_id").alias("id_a"), F.col("label").alias("lab_a"))
    lb = emb.select(F.col("vec_id").alias("id_b"), F.col("label").alias("lab_b"))
    lp = pairs.join(F.broadcast(la), "id_a").join(F.broadcast(lb), "id_b")
    scalars = lp.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum(F.when(F.col("lab_a") == F.col("lab_b"), 1).otherwise(0))
        .cast("long")
        .alias("intra"),
    )
    degs = (
        lp.select(F.col("lab_a").alias("lab"))
        .unionByName(lp.select(F.col("lab_b").alias("lab")))
        .groupBy("lab")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        .agg(F.sum(F.col("deg") * F.col("deg")).cast("long").alias("degsq"))
    )
    md, intra, degsq = (
        F.col("m").cast("double"),
        F.col("intra").cast("double"),
        F.col("degsq").cast("double"),
    )
    return scalars.crossJoin(F.broadcast(degs)).select(
        "m",
        "intra",
        "degsq",
        F.round(
            intra / md - degsq / (F.lit(4.0) * md * md), 6
        ).alias("modularity"),
    )


SQL_LABEL_MODULARITY = f"""
WITH e AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label, embedding::DOUBLE[] AS v
  FROM embeddings
),
{_srp_cte("e", ND_PLANES, ND_PLANES // ND_BANDS)},
pairs AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM buckets a
  JOIN buckets b ON b.band = a.band AND b.bucket = a.bucket
                AND a.vec_id < b.vec_id
),
lp AS (
  SELECT ea.label AS lab_a, eb.label AS lab_b
  FROM pairs p JOIN e ea ON ea.vec_id = p.id_a JOIN e eb ON eb.vec_id = p.id_b
),
scalars AS (
  SELECT CAST(count(*) AS BIGINT) AS m,
         CAST(sum(CASE WHEN lab_a = lab_b THEN 1 ELSE 0 END) AS BIGINT)
           AS intra
  FROM lp
),
degs AS (
  SELECT CAST(sum(deg * deg) AS BIGINT) AS degsq FROM (
    SELECT lab, CAST(count(*) AS BIGINT) AS deg FROM (
      SELECT lab_a AS lab FROM lp UNION ALL SELECT lab_b FROM lp
    ) GROUP BY lab
  )
)
SELECT m, intra, degsq,
       round(CAST(intra AS DOUBLE) / CAST(m AS DOUBLE)
             - CAST(degsq AS DOUBLE)
               / (4.0 * CAST(m AS DOUBLE) * CAST(m AS DOUBLE)), 6)
         AS modularity
FROM scalars, degs
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
# Degree CCDF table (the raw evidence behind the power-law MLE pair —
# Clauset et al. insist on seeing the complementary cumulative counts,
# not just alpha-hat): nodes with total degree >= k for k in powers of
# two. Degrees from the shared synthetic link graph; every output is an
# exact BIGINT count from one bounded threshold explode.
# --------------------------------------------------------------------------
def q_degree_ccdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, edges = _edges(spark, sf_dir)
    deg = (
        edges.select(F.col("source_doc_id").alias("v"))
        .unionAll(edges.select(F.col("target_doc_id").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
        .localCheckpoint(eager=True)
    )
    ks = spark.range(0, 9).select(
        F.pow(F.lit(2.0), F.col("id")).cast("long").alias("k")
    )
    tot = deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    return (
        deg.crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.sum(F.when(F.col("d") >= F.col("k"), 1).otherwise(0))
            .cast("long")
            .alias("n_ge_k")
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "k",
            "n_ge_k",
            F.round(
                F.col("n_ge_k").cast("double")
                / F.col("n_nodes").cast("double"),
                6,
            ).alias("ccdf"),
        )
        .orderBy("k")
    )


SQL_DEGREE_CCDF = f"""
WITH {_EDGES_CTE},
deg AS (
  SELECT v, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT source_doc_id AS v FROM edges
    UNION ALL SELECT target_doc_id FROM edges
  ) GROUP BY v
),
ks AS (SELECT CAST(power(2, unnest(range(0, 9))) AS BIGINT) AS k),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg)
SELECT k,
       CAST(sum(CASE WHEN d >= k THEN 1 ELSE 0 END) AS BIGINT) AS n_ge_k,
       round(CAST(sum(CASE WHEN d >= k THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(n_nodes AS DOUBLE), 6) AS ccdf
FROM deg, ks, tot
GROUP BY k, n_nodes
ORDER BY k
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
# PCA top component via power iteration (Hotelling 1933): 20
# unnormalized iterations of v <- S v over the 64x64 embedding scatter
# matrix (the markov_stationary discipline: Spark unrolls the recursion,
# the oracle replays it as a RECURSIVE CTE with identical arithmetic),
# then the Rayleigh quotient and its share of the trace. Reported values
# are RATIOS (the periodogram lesson), immune to the compounding
# last-ulp jitter of unordered double sums.
# --------------------------------------------------------------------------
PCA_ITERS = 20


def q_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _read(spark, sf_dir, "embeddings")
    xs = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim", "x"
        ),
    ).select("vec_id", F.col("dim").cast("long").alias("dim"), "x")
    mu = xs.groupBy("dim").agg(
        (F.sum("x") / F.count(F.lit(1))).alias("m")
    )
    xc = xs.join(F.broadcast(mu), "dim").select(
        "vec_id", "dim", (F.col("x") - F.col("m")).alias("xc")
    )
    a, b = xc.alias("a"), xc.alias("b")
    cov = (
        a.join(b, F.col("a.vec_id") == F.col("b.vec_id"))
        .groupBy(
            F.col("a.dim").alias("i"), F.col("b.dim").alias("j")
        )
        .agg(F.sum(F.col("a.xc") * F.col("b.xc")).alias("c"))
        .localCheckpoint(eager=True)
    )
    v = mu.select("dim", F.lit(1.0).alias("v"))
    for _ in range(PCA_ITERS):
        v = (
            cov.join(v, cov["j"] == v["dim"])
            .groupBy(F.col("i").alias("dim"))
            .agg(F.sum(F.col("c") * F.col("v")).alias("v"))
        )
    v = v.localCheckpoint(eager=True)
    w = (
        cov.join(v, cov["j"] == v["dim"])
        .groupBy(F.col("i").alias("dim"))
        .agg(F.sum(F.col("c") * F.col("v")).alias("w"))
    )
    num = (
        v.join(w, "dim")
        .agg(F.sum(F.col("v") * F.col("w")).alias("vw"))
    )
    den = v.agg(F.sum(F.col("v") * F.col("v")).alias("vv"))
    tr = cov.filter(F.col("i") == F.col("j")).agg(
        F.sum("c").alias("trace")
    )
    nn = emb.agg(F.count(F.lit(1)).cast("long").alias("n_vecs"))
    lam = F.col("vw") / F.col("vv")
    return (
        num.crossJoin(F.broadcast(den))
        .crossJoin(F.broadcast(tr))
        .crossJoin(F.broadcast(nn))
        .select(
            "n_vecs",
            F.lit(64).cast("long").alias("dim"),
            F.round(
                lam / (F.col("n_vecs").cast("double") - F.lit(1.0)), 6
            ).alias("top_eigenvalue"),
            F.round(lam / F.col("trace"), 6).alias("var_share"),
        )
    )


SQL_PCA_POWER = f"""
WITH RECURSIVE
xs AS (
  SELECT vec_id, i AS dim, CAST(embedding[i + 1] AS DOUBLE) AS x
  FROM embeddings, unnest(range(len(embedding))) AS t(i)
),
mu AS (SELECT dim, sum(x) / count(*) AS m FROM xs GROUP BY dim),
xc AS (
  SELECT vec_id, xs.dim, x - m AS xc FROM xs JOIN mu USING (dim)
),
cov AS (
  SELECT a.dim AS i, b.dim AS j, sum(a.xc * b.xc) AS c
  FROM xc a JOIN xc b USING (vec_id) GROUP BY 1, 2
),
vt AS (
  SELECT 0 AS iter, dim, CAST(1.0 AS DOUBLE) AS v FROM mu
  UNION ALL
  SELECT vt.iter + 1, cov.i AS dim, sum(cov.c * vt.v) AS v
  FROM vt JOIN cov ON cov.j = vt.dim
  WHERE vt.iter < {PCA_ITERS}
  GROUP BY 1, 2
),
vfin AS (SELECT dim, v FROM vt WHERE iter = {PCA_ITERS}),
w AS (
  SELECT cov.i AS dim, sum(cov.c * vfin.v) AS w
  FROM cov JOIN vfin ON cov.j = vfin.dim GROUP BY 1
),
num AS (SELECT sum(vfin.v * w.w) AS vw FROM vfin JOIN w USING (dim)),
den AS (SELECT sum(v * v) AS vv FROM vfin),
tr AS (SELECT sum(c) AS trace FROM cov WHERE i = j),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n_vecs FROM embeddings)
SELECT n_vecs, CAST(64 AS BIGINT) AS dim,
       round((vw / vv) / (CAST(n_vecs AS DOUBLE) - 1.0), 6)
         AS top_eigenvalue,
       round((vw / vv) / trace, 6) AS var_share
FROM num, den, tr, nn
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
# SimHash detector operating curve (the radius-sweep generalization of
# dedup_eval's single radius-3 point): precision/recall of the banded
# detector at every radius 0..3 — the whole sweep stays inside the
# pigeonhole-lossless zone of the 4x16-bit banding, so the oracle's
# brute-force pairs MUST agree detector-for-detector at each radius
# (the curve doubles as a four-point losslessness proof). All counts
# exact BIGINTs; zero-prediction radii report precision 0 by convention.
# --------------------------------------------------------------------------
def q_dedup_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    pred = D.simhash_near_dup(
        _tf(spark, sf_dir, mutated=True), max_hamming=3
    ).select("id_a", "id_b", "hamming").localCheckpoint(eager=True)
    docs = _read(spark, sf_dir, "documents")
    truth = docs.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") + MUT_OFFSET).alias("id_b"),
    )
    n_truth = truth.agg(F.count(F.lit(1)).cast("long").alias("n_truth"))
    radii = spark.range(0, 4).select(F.col("id").cast("long").alias("r"))
    marked = pred.join(
        truth.withColumn("is_true", F.lit(1)), ["id_a", "id_b"], "left"
    ).select(
        "hamming", F.coalesce("is_true", F.lit(0)).cast("long").alias("t")
    )
    per_r = (
        marked.crossJoin(F.broadcast(radii))
        .filter(F.col("hamming") <= F.col("r"))
        .groupBy("r")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pred"),
            F.sum("t").cast("long").alias("tp"),
        )
    )
    filled = radii.join(per_r, "r", "left").select(
        "r",
        F.coalesce("n_pred", F.lit(0)).cast("long").alias("n_pred"),
        F.coalesce("tp", F.lit(0)).cast("long").alias("tp"),
    )
    j = filled.crossJoin(F.broadcast(n_truth))
    return j.select(
        "r",
        "n_pred",
        "tp",
        (F.col("n_pred") - F.col("tp")).alias("fp"),
        (F.col("n_truth") - F.col("tp")).alias("fn"),
        F.when(
            F.col("n_pred") > 0,
            F.round(
                F.col("tp").cast("double")
                / F.col("n_pred").cast("double"),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("precision"),
        F.round(
            F.col("tp").cast("double") / F.col("n_truth").cast("double"),
            6,
        ).alias("recall"),
    ).orderBy("r")


SQL_DEDUP_ROC = f"""
WITH {_MUT_DOCS_CTE}, {_tf_cte("corpus")}, {_SIMHASH_CORE_CTE},
pred AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         bit_count(xor(a.simhash, b.simhash)) AS hamming
  FROM fp a JOIN fp b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
),
truth AS (
  SELECT doc_id AS id_a, doc_id + {MUT_OFFSET} AS id_b
  FROM documents WHERE doc_id % 10 = 0
),
nt AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth),
marked AS (
  SELECT p.hamming,
         CAST(CASE WHEN t.id_a IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
           AS t
  FROM pred p
  LEFT JOIN truth t ON t.id_a = p.id_a AND t.id_b = p.id_b
),
radii AS (SELECT CAST(unnest(range(0, 4)) AS BIGINT) AS r),
per_r AS (
  SELECT r, CAST(count(*) AS BIGINT) AS n_pred,
         CAST(sum(t) AS BIGINT) AS tp
  FROM marked, radii WHERE hamming <= r GROUP BY r
),
filled AS (
  SELECT radii.r, CAST(coalesce(per_r.n_pred, 0) AS BIGINT) AS n_pred,
         CAST(coalesce(per_r.tp, 0) AS BIGINT) AS tp
  FROM radii LEFT JOIN per_r USING (r)
)
SELECT r, n_pred, tp,
       n_pred - tp AS fp,
       n_truth - tp AS fn,
       CASE WHEN n_pred > 0
            THEN round(CAST(tp AS DOUBLE) / CAST(n_pred AS DOUBLE), 6)
            ELSE 0.0 END AS precision,
       round(CAST(tp AS DOUBLE) / CAST(n_truth AS DOUBLE), 6) AS recall
FROM filled, nt
ORDER BY r
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
# Average precision of the SimHash detector ranking (the ranked-retrieval
# eval completing the detector-eval family: dedup_eval is one point,
# dedup_roc the threshold sweep, THIS scores the detector AS A RANKER):
# pairs ranked by (hamming ASC, ids ASC — exact integers), AP = mean
# over truth hits of precision@hit via one cumulative window. Every
# precision@r is a ratio of integers; the mean is over n_truth terms.
# --------------------------------------------------------------------------
def q_dedup_ap(spark: SparkSession, sf_dir: str) -> DataFrame:
    pred = D.simhash_near_dup(
        _tf(spark, sf_dir, mutated=True), max_hamming=3
    ).select("id_a", "id_b", "hamming").localCheckpoint(eager=True)
    docs = _read(spark, sf_dir, "documents")
    truth = docs.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") + MUT_OFFSET).alias("id_b"),
    )
    n_truth = truth.agg(F.count(F.lit(1)).cast("long").alias("n_truth"))
    marked = pred.join(
        truth.withColumn("hit", F.lit(1)), ["id_a", "id_b"], "left"
    ).select(
        "hamming",
        "id_a",
        "id_b",
        F.coalesce("hit", F.lit(0)).cast("long").alias("hit"),
    )
    w = Window.orderBy(
        F.col("hamming").asc(), F.col("id_a").asc(), F.col("id_b").asc()
    )
    ranked = marked.select(
        "hit",
        F.row_number().over(w).cast("long").alias("r"),
        F.sum("hit")
        .over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .cast("long")
        .alias("hits_cum"),
    )
    agg = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_pred"),
        F.sum("hit").cast("long").alias("n_hits"),
        F.sum(
            F.when(
                F.col("hit") == 1,
                F.col("hits_cum").cast("double")
                / F.col("r").cast("double"),
            ).otherwise(F.lit(0.0))
        ).alias("ap_sum"),
    )
    return agg.crossJoin(F.broadcast(n_truth)).select(
        "n_pred",
        "n_truth",
        "n_hits",
        F.round(
            F.col("ap_sum") / F.col("n_truth").cast("double"), 6
        ).alias("average_precision"),
    )


SQL_DEDUP_AP = f"""
WITH {_MUT_DOCS_CTE}, {_tf_cte("corpus")}, {_SIMHASH_CORE_CTE},
pred AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         bit_count(xor(a.simhash, b.simhash)) AS hamming
  FROM fp a JOIN fp b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
),
truth AS (
  SELECT doc_id AS id_a, doc_id + {MUT_OFFSET} AS id_b
  FROM documents WHERE doc_id % 10 = 0
),
nt AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth),
marked AS (
  SELECT p.hamming, p.id_a, p.id_b,
         CAST(CASE WHEN t.id_a IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
           AS hit
  FROM pred p
  LEFT JOIN truth t ON t.id_a = p.id_a AND t.id_b = p.id_b
),
ranked AS (
  SELECT hit,
         CAST(row_number() OVER (ORDER BY hamming, id_a, id_b) AS BIGINT)
           AS r,
         CAST(sum(hit) OVER (ORDER BY hamming, id_a, id_b
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS hits_cum
  FROM marked
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_pred,
         CAST(sum(hit) AS BIGINT) AS n_hits,
         sum(CASE WHEN hit = 1
                  THEN CAST(hits_cum AS DOUBLE) / CAST(r AS DOUBLE)
                  ELSE 0.0 END) AS ap_sum
  FROM ranked
)
SELECT n_pred, n_truth, n_hits,
       round(ap_sum / CAST(n_truth AS DOUBLE), 6) AS average_precision
FROM agg, nt
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
# Bond percolation census (the random-FAILURE complement to
# hub_knockout's targeted attack; Callaway et al. 2000): delete each
# undirected edge iff the first hex digit of md5("a_b") is >= '8' — a
# deterministic, engine-portable 50% coin (invariant 2) — and census
# the surviving components. Spark runs the exact star-contraction CC;
# the oracle replays bounded min-label propagation (the hub_knockout
# discipline). The intact-graph census lives in hub_knockout's
# 'before' phase — this pair reports the percolated side.
# --------------------------------------------------------------------------
def q_edge_percolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training_data.dedup import connected_components

    docs, edges = _edges(spark, sf_dir)
    und = (
        edges.select(
            F.least("source_doc_id", "target_doc_id").alias("id_a"),
            F.greatest("source_doc_id", "target_doc_id").alias("id_b"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    coin = F.substring(
        F.md5(
            F.concat(
                F.col("id_a").cast("string"),
                F.lit("_"),
                F.col("id_b").cast("string"),
            )
        ),
        1,
        1,
    )
    kept = und.filter(coin < F.lit("8")).localCheckpoint(eager=True)
    n_all = und.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    n_kept = kept.agg(F.count(F.lit(1)).cast("long").alias("kept_edges"))
    comp = connected_components(kept, nodes=docs, id_col="doc_id")
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("sz")
    )
    return (
        sizes.agg(
            F.count(F.lit(1)).cast("long").alias("n_components"),
            F.max("sz").cast("long").alias("largest_component"),
            F.sum("sz").cast("long").alias("n_nodes"),
        )
        .crossJoin(F.broadcast(n_all))
        .crossJoin(F.broadcast(n_kept))
        .select(
            "n_nodes",
            "n_edges",
            "kept_edges",
            "n_components",
            "largest_component",
            F.round(
                F.col("largest_component").cast("double")
                / F.col("n_nodes").cast("double"),
                6,
            ).alias("giant_fraction"),
        )
    )


SQL_EDGE_PERCOLATION = f"""
WITH RECURSIVE {_EDGES_CTE},
und AS (
  SELECT DISTINCT least(source_doc_id, target_doc_id) AS id_a,
                  greatest(source_doc_id, target_doc_id) AS id_b
  FROM edges
),
kept AS (
  SELECT * FROM und
  WHERE substring(md5(CAST(id_a AS VARCHAR) || '_'
                      || CAST(id_b AS VARCHAR)), 1, 1) < '8'
),
na AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM und),
nk AS (SELECT CAST(count(*) AS BIGINT) AS kept_edges FROM kept),
msgs AS (
  SELECT id_a AS src, id_b AS dst FROM kept
  UNION ALL SELECT id_b, id_a FROM kept
  UNION ALL SELECT doc_id, doc_id FROM documents
),
lp AS (
  SELECT 0 AS iter, doc_id AS node, doc_id AS lbl FROM documents
  UNION ALL
  SELECT lp.iter + 1, m.dst, min(lp.lbl)
  FROM lp JOIN msgs m ON m.src = lp.node
  WHERE lp.iter < {KNOCKOUT_LP_ROUNDS}
  GROUP BY 1, 2
),
comp AS (
  SELECT node, lbl AS component FROM lp WHERE iter = {KNOCKOUT_LP_ROUNDS}
),
sizes AS (
  SELECT component, CAST(count(*) AS BIGINT) AS sz
  FROM comp GROUP BY component
),
census AS (
  SELECT CAST(count(*) AS BIGINT) AS n_components,
         CAST(max(sz) AS BIGINT) AS largest_component,
         CAST(sum(sz) AS BIGINT) AS n_nodes
  FROM sizes
)
SELECT n_nodes, n_edges, kept_edges, n_components, largest_component,
       round(CAST(largest_component AS DOUBLE) / CAST(n_nodes AS DOUBLE),
             6) AS giant_fraction
FROM census, na, nk
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
# Content-defined chunking audit (the LBFS/restic boundary scheme,
# Muthitacharoen et al. 2001): a chunk boundary falls wherever the md5
# of the 8-char gram starting at that position begins with hex '0'
# (P=1/16 → ~16-char mean chunks) — the shift-resistant storage-dedup
# split the fixed-block schemes can't give you. Grams stream map-side
# (one row per position, the winnowing shape); boundary counts and
# chunk statistics are exact integers.
# --------------------------------------------------------------------------
def q_cdc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents").select(
        "doc_id", F.lower(F.col("text")).alias("t")
    )
    grams = docs.select(
        "doc_id",
        F.length("t").cast("long").alias("len"),
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(length(t) - 7, 0)),"
                " i -> substring(t, i, 8))"
            )
        ).alias("g"),
    )
    marks = grams.select(
        "doc_id",
        "len",
        F.when(F.substring(F.md5("g"), 1, 1) == "0", 1)
        .otherwise(0)
        .alias("b"),
    )
    per_doc = marks.groupBy("doc_id", "len").agg(
        F.sum("b").cast("long").alias("boundaries")
    )
    return per_doc.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("len").cast("long").alias("total_chars"),
        F.sum("boundaries").cast("long").alias("total_boundaries"),
        F.round(
            F.sum("len").cast("double")
            / (F.sum("boundaries") + F.count(F.lit(1))).cast("double"),
            6,
        ).alias("mean_chunk_chars"),
        F.max("boundaries").cast("long").alias("max_boundaries"),
    )


SQL_CDC_CHUNKING = """
WITH docs AS (
  SELECT doc_id, lower(text) AS t FROM documents
),
grams AS (
  SELECT doc_id, CAST(length(t) AS BIGINT) AS len,
         substring(t, i, 8) AS g
  FROM docs, unnest(range(1, greatest(length(t) - 6, 1))) AS u(i)
),
marks AS (
  SELECT doc_id, len,
         CASE WHEN substring(md5(g), 1, 1) = '0' THEN 1 ELSE 0 END AS b
  FROM grams
),
per_doc AS (
  SELECT doc_id, len, CAST(sum(b) AS BIGINT) AS boundaries
  FROM marks GROUP BY doc_id, len
)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len) AS BIGINT) AS total_chars,
       CAST(sum(boundaries) AS BIGINT) AS total_boundaries,
       round(CAST(sum(len) AS DOUBLE)
             / CAST(sum(boundaries) + count(*) AS DOUBLE), 6)
         AS mean_chunk_chars,
       CAST(max(boundaries) AS BIGINT) AS max_boundaries
FROM per_doc
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
# Source-profile similarity (corpus forensics: which sources share a
# vocabulary distribution — the source-level cousin of the doc-level
# sparse-cosine pair): per-source term-count vectors over the bounded
# vocabulary, pairwise dot products as EXACT BIGINT sums (integer
# counts), cosine normalized once per pair; top-10 most similar pairs
# with a (source_a, source_b) tiebreak on the rounded grid.
# --------------------------------------------------------------------------
def q_source_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _read(spark, sf_dir, "documents").select(
        "source",
        F.explode(
            F.expr(f"regexp_extract_all(lower(text), '{TOKEN_RUN}', 0)")
        ).alias("term"),
    )
    vec = toks.groupBy("source", "term").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    ).localCheckpoint(eager=True)
    norms = vec.groupBy("source").agg(
        F.sum(F.col("c") * F.col("c")).cast("long").alias("n2")
    )
    a, b = vec.alias("a"), vec.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("sa"), F.col("b.source").alias("sb")
        )
        .agg(F.sum(F.col("a.c") * F.col("b.c")).cast("long").alias("dot"))
    )
    na = norms.select(
        F.col("source").alias("sa"), F.col("n2").alias("na2")
    )
    nb = norms.select(
        F.col("source").alias("sb"), F.col("n2").alias("nb2")
    )
    scored = (
        dots.join(F.broadcast(na), "sa")
        .join(F.broadcast(nb), "sb")
        .select(
            "sa",
            "sb",
            "dot",
            F.round(
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("na2").cast("double"))
                    * F.sqrt(F.col("nb2").cast("double"))
                ),
                6,
            ).alias("cosine"),
        )
    )
    pick = Window.orderBy(
        F.col("cosine").desc(), F.col("sa").asc(), F.col("sb").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") <= 10)
        .select("sa", "sb", "dot", "cosine")
        .orderBy("sa", "sb")
    )


SQL_SOURCE_SIMILARITY = f"""
WITH toks AS (
  SELECT source,
         unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term
  FROM documents
),
vec AS (
  SELECT source, term, CAST(count(*) AS BIGINT) AS c
  FROM toks GROUP BY source, term
),
norms AS (
  SELECT source, CAST(sum(c * c) AS BIGINT) AS n2 FROM vec GROUP BY source
),
dots AS (
  SELECT a.source AS sa, b.source AS sb,
         CAST(sum(a.c * b.c) AS BIGINT) AS dot
  FROM vec a JOIN vec b
    ON a.term = b.term AND a.source < b.source
  GROUP BY a.source, b.source
),
scored AS (
  SELECT sa, sb, dot,
         round(CAST(dot AS DOUBLE)
               / (sqrt(CAST(na.n2 AS DOUBLE))
                  * sqrt(CAST(nb.n2 AS DOUBLE))), 6) AS cosine
  FROM dots
  JOIN norms na ON na.source = dots.sa
  JOIN norms nb ON nb.source = dots.sb
),
top AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (ORDER BY cosine DESC, sa ASC, sb ASC)
           AS rn
    FROM scored)
  WHERE rn <= 10
)
SELECT sa, sb, dot, cosine FROM top
ORDER BY sa, sb
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
# SALSA authority/hub scores (Lempel & Moran 2001, "stochastic approach
# for link-structure analysis") over the same synthetic link graph as
# pagerank/hits_scores — via the paper's CLOSED FORM instead of power
# iteration: each chain's stationary probability is
# (|C|/|side|) * (deg(i) / sum_{j in C} deg(j)), where C is the node's
# connected component in the co-hub (resp. co-authority) graph. So the
# whole computation is exact integers: degrees from distinct edges,
# components from the scale-safe star trick (every target links to its
# hub's MIN target — linear edges, identical components to the quadratic
# co-citation graph), one divide at the end. Spark reuses the
# large-star/small-star contraction (training_data.dedup); the oracle
# replays closure over the same star edges recursively.
# --------------------------------------------------------------------------
def q_salsa_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs, edges = _edges(spark, sf_dir)
    edges = edges.localCheckpoint(eager=True)

    def side(deg_key: str, star_key: str, label: str) -> DataFrame:
        deg = (
            edges.groupBy(deg_key)
            .agg(F.count(F.lit(1)).cast("long").alias("deg"))
            .withColumnRenamed(deg_key, "doc_id")
        )
        kmin = edges.groupBy(star_key).agg(F.min(deg_key).alias("_m"))
        star = edges.join(kmin, star_key).select(
            F.col(deg_key).alias("id_a"), F.col("_m").alias("id_b")
        )
        comps = D.connected_components(star, nodes=deg.select("doc_id"))
        n_side = scalar_count(deg, as_double=False)
        stat = (
            deg.join(comps, "doc_id")
            .groupBy("component")
            .agg(
                F.count(F.lit(1)).cast("long").alias("comp_size"),
                F.sum("deg").cast("long").alias("cdeg"),
            )
        )
        return (
            deg.join(comps, "doc_id")
            .join(F.broadcast(stat), "component")
            .crossJoin(F.broadcast(n_side))
            .select(
                F.lit(label).alias("side"),
                "doc_id",
                "deg",
                "comp_size",
                F.round(
                    (F.col("comp_size") * F.col("deg")).cast("double")
                    / (F.col("_n") * F.col("cdeg")).cast("double"),
                    6,
                ).alias("salsa"),
            )
        )

    return (
        side("target_doc_id", "source_doc_id", "authority")
        .unionByName(side("source_doc_id", "target_doc_id", "hub"))
        .orderBy("side", F.desc("salsa"), F.asc("doc_id"))
    )


def _salsa_side_sql(deg_key: str, star_key: str, label: str, tag: str) -> str:
    return f"""
deg_{tag} AS (
  SELECT {deg_key} AS doc_id, CAST(count(*) AS BIGINT) AS deg
  FROM edges GROUP BY 1
),
kmin_{tag} AS (
  SELECT {star_key}, min({deg_key}) AS m FROM edges GROUP BY 1
),
star_{tag} AS (
  SELECT DISTINCT e.{deg_key} AS src, k.m AS dst
  FROM edges e JOIN kmin_{tag} k USING ({star_key})
  WHERE e.{deg_key} <> k.m
  UNION
  SELECT DISTINCT k.m, e.{deg_key}
  FROM edges e JOIN kmin_{tag} k USING ({star_key})
  WHERE e.{deg_key} <> k.m
),
reach_{tag} AS (
  SELECT src AS node, dst AS peer FROM star_{tag}
  UNION
  SELECT r.node, e.dst FROM reach_{tag} r JOIN star_{tag} e ON e.src = r.peer
),
comp_{tag} AS (
  SELECT d.doc_id,
         COALESCE(least(d.doc_id, r.mn), d.doc_id) AS component
  FROM deg_{tag} d
  LEFT JOIN (SELECT node, min(peer) AS mn FROM reach_{tag} GROUP BY node) r
    ON r.node = d.doc_id
),
stat_{tag} AS (
  SELECT component, CAST(count(*) AS BIGINT) AS comp_size,
         CAST(sum(deg) AS BIGINT) AS cdeg
  FROM comp_{tag} JOIN deg_{tag} USING (doc_id)
  GROUP BY component
),
n_{tag} AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg_{tag}),
out_{tag} AS (
  SELECT '{label}' AS side, d.doc_id, d.deg, s.comp_size,
         round(CAST(s.comp_size * d.deg AS DOUBLE)
               / CAST(n_{tag}.n * s.cdeg AS DOUBLE), 6) AS salsa
  FROM deg_{tag} d
  JOIN comp_{tag} c USING (doc_id)
  JOIN stat_{tag} s ON s.component = c.component, n_{tag}
)
"""


SQL_SALSA_SCORES = f"""
WITH RECURSIVE {_EDGES_CTE},
{_salsa_side_sql("target_doc_id", "source_doc_id", "authority", "a")},
{_salsa_side_sql("source_doc_id", "target_doc_id", "hub", "h")}
SELECT * FROM out_a
UNION ALL
SELECT * FROM out_h
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


# --------------------------------------------------------------------------
# Elias-Fano vs delta-varint posting-list size audit for the 20 highest-DF
# terms — the storage-layout decision table behind a compressed index
# (the engine's own postings ride delta+varint; EF is the monotone-list
# alternative with O(1) skip). Everything is EXACT integer bit
# arithmetic: floor(log2 x) = length(bin(x)) - 1 on both engines (no
# float log), EF total = n*l + n + (U >> l) with l = max(0,
# floor(log2(U/n))), varint bytes per delta = 1 + (bitlen(delta)-1) DIV 7
# over window-lag deltas (first delta = doc_id + 1, absolute-coded).
# Only the two bits-per-posting ratios are doubles, rounded 6.
# --------------------------------------------------------------------------
EF_TOP_TERMS = 20


def q_ef_vs_varint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RUN), F.lit(0))
        ).alias("term"),
    )
    postings = toks.groupBy("term", "doc_id").agg(F.lit(1).alias("_one"))
    dfreq = postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    wtop = Window.orderBy(F.desc("df"), F.asc("term"))
    top = (
        dfreq.withColumn("_rn", F.row_number().over(wtop))
        .filter(F.col("_rn") <= EF_TOP_TERMS)
        .select("term", "df")
    )
    n_df = scalar_count(docs.select("doc_id"), as_double=False)
    wt = Window.partitionBy("term").orderBy("doc_id")
    deltas = (
        postings.join(F.broadcast(top.select("term")), "term")
        .withColumn(
            "delta",
            F.coalesce(
                F.col("doc_id") - F.lag("doc_id").over(wt),
                F.col("doc_id") + 1,
            ).cast("long"),
        )
        .select(
            "term",
            (
                F.lit(1)
                + F.floor(
                    (F.length(F.bin(F.col("delta"))) - 1) / F.lit(7)
                )
            )
            .cast("long")
            .alias("vbytes"),
        )
    )
    vag = deltas.groupBy("term").agg(
        F.sum("vbytes").cast("long").alias("varint_bytes")
    )
    lcol = F.greatest(
        F.lit(0).cast("long"),
        (F.length(F.bin(F.expr("_n DIV df"))) - 1).cast("long"),
    )
    out = (
        top.join(vag, "term")
        .crossJoin(F.broadcast(n_df))
        .withColumn("l", lcol)
        .select(
            "term",
            "df",
            F.col("l"),
            F.col("_n").cast("long").alias("universe"),
            (F.col("varint_bytes") * 8).cast("long").alias("varint_bits"),
        )
    )
    ef_bits = (
        F.col("df") * F.col("l")
        + F.col("df")
        + F.expr(
            "universe DIV shiftleft(CAST(1 AS BIGINT), CAST(l AS INT))"
        )
    )
    return (
        out.select(
            "term",
            "df",
            "universe",
            "l",
            ef_bits.cast("long").alias("ef_bits"),
            "varint_bits",
        )
        .select(
            "term",
            "df",
            "universe",
            "l",
            "ef_bits",
            "varint_bits",
            F.round(
                F.col("ef_bits").cast("double") / F.col("df").cast("double"),
                6,
            ).alias("ef_bits_per_posting"),
            F.round(
                F.col("varint_bits").cast("double")
                / F.col("df").cast("double"),
                6,
            ).alias("varint_bits_per_posting"),
        )
        .orderBy(F.desc("df"), F.asc("term"))
    )


SQL_EF_VS_VARINT = f"""
WITH postings AS (
  SELECT DISTINCT term, doc_id FROM (
    SELECT doc_id,
           unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term
    FROM documents
  )
),
dfreq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM postings GROUP BY term
),
top AS (
  SELECT term, df FROM (
    SELECT *, row_number() OVER (ORDER BY df DESC, term) AS rn FROM dfreq)
  WHERE rn <= {EF_TOP_TERMS}
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS u FROM documents),
deltas AS (
  SELECT p.term,
         CAST(1 + (length(bin(COALESCE(
                 p.doc_id - lag(p.doc_id)
                   OVER (PARTITION BY p.term ORDER BY p.doc_id),
                 p.doc_id + 1))) - 1) // 7 AS BIGINT) AS vbytes
  FROM postings p JOIN top USING (term)
),
vag AS (
  SELECT term, CAST(sum(vbytes) AS BIGINT) AS varint_bytes
  FROM deltas GROUP BY term
),
sized AS (
  SELECT t.term, t.df, nn.u AS universe,
         greatest(CAST(0 AS BIGINT),
                  CAST(length(bin(nn.u // t.df)) - 1 AS BIGINT)) AS l,
         CAST(v.varint_bytes * 8 AS BIGINT) AS varint_bits
  FROM top t JOIN vag v USING (term), nn
)
SELECT term, df, universe, l,
       CAST(df * l + df + universe // (CAST(1 AS BIGINT) << l) AS BIGINT)
         AS ef_bits,
       varint_bits,
       round(CAST(df * l + df + universe // (CAST(1 AS BIGINT) << l)
                  AS DOUBLE) / CAST(df AS DOUBLE), 6) AS ef_bits_per_posting,
       round(CAST(varint_bits AS DOUBLE) / CAST(df AS DOUBLE), 6)
         AS varint_bits_per_posting
FROM sized
ORDER BY df DESC, term
"""


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
# Shannon-code audit of the event-type alphabet: integer code lengths
# l = ceil(log2(N/c)) computed EXACTLY as bitlen(ceil(N/c) - 1) (binary
# string length — no float log; the identity holds because powers of two
# are integers), the Kraft sum as an exact shifted-integer rational, the
# expected code length, and the entropy lower bound via per-type
# fixed6-rounded ln (lexical_diversity discipline) — the redundancy gap
# an encoding chooser reads next to encoding_audit's RLE table.
# --------------------------------------------------------------------------
def q_shannon_code(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    cnt = events.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    tot = cnt.agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
    )
    j = cnt.crossJoin(F.broadcast(tot))
    cl = F.expr("(n + c - 1) DIV c")
    l = F.when(cl == 1, F.lit(0).cast("long")).otherwise(
        F.length(F.bin(cl - 1)).cast("long")
    )
    e6 = F.round(
        F.log(F.col("n").cast("double") / F.col("c").cast("double"))
        * F.lit(1000000.0),
        0,
    ).cast("long")
    typed = j.select(
        "c",
        "n",
        "n_types",
        l.alias("l"),
        (F.col("c") * l).cast("long").alias("cl_sum"),
        (F.col("c") * e6).cast("long").alias("ce6"),
    )
    lm = typed.agg(F.max("l").cast("long").alias("lmax"))
    k = typed.crossJoin(F.broadcast(lm)).select(
        "n",
        "n_types",
        "cl_sum",
        "ce6",
        "lmax",
        F.expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(lmax - l AS INT))"
        ).alias("kterm"),
    )
    agg = k.groupBy("n", "n_types", "lmax").agg(
        F.sum("cl_sum").cast("long").alias("scl"),
        F.sum("ce6").cast("long").alias("sce6"),
        F.sum("kterm").cast("long").alias("skraft"),
    )
    nd = F.col("n").cast("double")
    exp_len = F.col("scl").cast("double") / nd
    ent = (
        F.col("sce6").cast("double")
        / F.lit(1000000.0)
        / nd
        / F.lit(math.log(2.0))
    )
    return agg.select(
        "n_types",
        F.col("n").alias("n_events"),
        "lmax",
        F.round(exp_len, 6).alias("expected_len_bits"),
        F.round(ent, 6).alias("entropy_bits"),
        F.round(exp_len - ent, 6).alias("redundancy_bits"),
        F.round(
            F.col("skraft").cast("double")
            / F.expr(
                "CAST(shiftleft(CAST(1 AS BIGINT), CAST(lmax AS INT))"
                " AS DOUBLE)"
            ),
            6,
        ).alias("kraft_sum"),
    )


SQL_SHANNON_CODE = f"""
WITH cnt AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY event_type
),
tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS n_types
  FROM cnt
),
typed AS (
  SELECT c, n, n_types,
         CAST(CASE WHEN (n + c - 1) // c = 1 THEN 0
                   ELSE length(bin((n + c - 1) // c - 1)) END
              AS BIGINT) AS l,
         CAST(round(ln(CAST(n AS DOUBLE) / CAST(c AS DOUBLE))
                    * 1000000.0) AS BIGINT) AS e6
  FROM cnt, tot
),
lm AS (SELECT CAST(max(l) AS BIGINT) AS lmax FROM typed),
agg AS (
  SELECT n, n_types, lmax,
         CAST(sum(c * l) AS BIGINT) AS scl,
         CAST(sum(c * e6) AS BIGINT) AS sce6,
         CAST(sum(CAST(1 AS BIGINT) << CAST(lmax - l AS INT)) AS BIGINT)
           AS skraft
  FROM typed, lm
  GROUP BY n, n_types, lmax
)
SELECT n_types, n AS n_events, lmax,
       round(CAST(scl AS DOUBLE) / CAST(n AS DOUBLE), 6)
         AS expected_len_bits,
       round(CAST(sce6 AS DOUBLE) / 1000000.0 / CAST(n AS DOUBLE)
             / CAST('{LN2_STR}' AS DOUBLE), 6) AS entropy_bits,
       round(CAST(scl AS DOUBLE) / CAST(n AS DOUBLE)
             - CAST(sce6 AS DOUBLE) / 1000000.0 / CAST(n AS DOUBLE)
               / CAST('{LN2_STR}' AS DOUBLE), 6) AS redundancy_bits,
       round(CAST(skraft AS DOUBLE)
             / CAST(CAST(1 AS BIGINT) << CAST(lmax AS INT) AS DOUBLE), 6)
         AS kraft_sum
FROM agg
"""


# --------------------------------------------------------------------------
# Pairwise label-centroid cosine (cluster-separation matrix): each
# label's centroid DIRECTION is the exact BIGINT per-dimension sum of
# its quantized unit vectors (embedding_diversity's 1e-4 integer grid —
# the mean's 1/n cancels in cosine, so no division ever touches the
# vectors), the 45 label pairs join per-dimension and the dot/norms are
# pure BIGINT sums; one sqrt-product divide per pair, rounded 6. The
# confusion-structure diagnostic next to embedding_diversity (intra) and
# cluster_quality (silhouette): near-1 off-diagonal = merged modes.
# --------------------------------------------------------------------------
CENTROID_Q = 10_000


def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _read(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    nrm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    base = (
        emb.select(
            F.col("label").cast("long").alias("label"),
            v.alias("_v"),
            nrm.alias("_n"),
        )
        .filter(F.col("_n") > 0)
        .select(
            "label",
            # lazy CaseWhen guard: under ANSI, CollapseProject can fold
            # this projection into the filter predicate evaluation
            F.transform(
                "_v",
                lambda x: F.round(
                    F.when(
                        F.col("_n") > 0, x / F.col("_n") * CENTROID_Q
                    ),
                    0,
                ).cast("long"),
            ).alias("uq"),
        )
    )
    dims = (
        base.select("label", F.posexplode("uq").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(F.sum("x").cast("long").alias("s"))
        .localCheckpoint(eager=True)
    )
    counts = base.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    norms = dims.groupBy("label").agg(
        F.sum(F.col("s") * F.col("s")).cast("long").alias("nsq")
    )
    a = dims.select(
        F.col("label").alias("la"), "dim", F.col("s").alias("sa")
    )
    b = dims.select(
        F.col("label").alias("lb"),
        F.col("dim").alias("dimb"),
        F.col("s").alias("sb"),
    )
    dots = (
        a.join(b, (F.col("dim") == F.col("dimb")) & (F.col("la") < F.col("lb")))
        .groupBy("la", "lb")
        .agg(F.sum(F.col("sa") * F.col("sb")).cast("long").alias("dot"))
    )
    na = norms.select(F.col("label").alias("la"), F.col("nsq").alias("nsqa"))
    nb = norms.select(F.col("label").alias("lb"), F.col("nsq").alias("nsqb"))
    ca = counts.select(F.col("label").alias("la"), F.col("n").alias("n_a"))
    cb = counts.select(F.col("label").alias("lb"), F.col("n").alias("n_b"))
    return (
        dots.join(F.broadcast(na), "la")
        .join(F.broadcast(nb), "lb")
        .join(F.broadcast(ca), "la")
        .join(F.broadcast(cb), "lb")
        .select(
            F.col("la").alias("label_a"),
            F.col("lb").alias("label_b"),
            "n_a",
            "n_b",
            F.round(
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("nsqa").cast("double"))
                    * F.sqrt(F.col("nsqb").cast("double"))
                ),
                6,
            ).alias("centroid_cos"),
        )
        .orderBy("label_a", "label_b")
    )


SQL_LABEL_CENTROIDS = f"""
WITH base AS (
  SELECT CAST(label AS BIGINT) AS label,
         list_transform(embedding::DOUBLE[],
             x -> CAST(round(x / nrm * {CENTROID_Q}, 0) AS BIGINT)) AS uq
  FROM (
    SELECT label, embedding,
           sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)))
             AS nrm
    FROM embeddings
  ) WHERE nrm > 0
),
dims AS (
  SELECT label, i - 1 AS dim, CAST(sum(uq[i]) AS BIGINT) AS s
  FROM base, unnest(range(1, len(uq) + 1)) AS t(i)
  GROUP BY label, i - 1
),
counts AS (
  SELECT label, CAST(count(*) AS BIGINT) AS n FROM base GROUP BY label
),
norms AS (
  SELECT label, CAST(sum(s * s) AS BIGINT) AS nsq FROM dims GROUP BY label
),
dots AS (
  SELECT a.label AS la, b.label AS lb,
         CAST(sum(a.s * b.s) AS BIGINT) AS dot
  FROM dims a JOIN dims b ON a.dim = b.dim AND a.label < b.label
  GROUP BY a.label, b.label
)
SELECT d.la AS label_a, d.lb AS label_b,
       ca.n AS n_a, cb.n AS n_b,
       round(CAST(d.dot AS DOUBLE)
             / (sqrt(CAST(na.nsq AS DOUBLE))
                * sqrt(CAST(nb.nsq AS DOUBLE))), 6) AS centroid_cos
FROM dots d
JOIN norms na ON na.label = d.la
JOIN norms nb ON nb.label = d.lb
JOIN counts ca ON ca.label = d.la
JOIN counts cb ON cb.label = d.lb
ORDER BY label_a, label_b
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
# Golomb-Rice parameter sweep for posting-list deltas (Rice 1971; the
# Golomb-vs-varint decision ef_vs_varint leaves open): for the 10
# highest-DF terms and every k in 0..7, the exact coded size is
# sum(delta >> k) + n*(1+k) bits (unary quotient + stop bit + k
# remainder bits) — pure BIGINT shift arithmetic, no entropy estimate.
# The per-term argmin k (bits asc, k asc tiebreak) lands within one bit
# per posting of the Shannon bound for geometric gaps; varint bits ride
# along for the three-way comparison.
# --------------------------------------------------------------------------
RICE_TOP_TERMS = 10
RICE_KS = tuple(range(8))


def q_rice_param(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RUN), F.lit(0))
        ).alias("term"),
    )
    postings = toks.groupBy("term", "doc_id").agg(F.lit(1).alias("_one"))
    dfreq = postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    wtop = Window.orderBy(F.desc("df"), F.asc("term"))
    top = (
        dfreq.withColumn("_rn", F.row_number().over(wtop))
        .filter(F.col("_rn") <= RICE_TOP_TERMS)
        .select("term", "df")
    )
    wt = Window.partitionBy("term").orderBy("doc_id")
    deltas = (
        postings.join(F.broadcast(top.select("term")), "term")
        .withColumn(
            "delta",
            F.coalesce(
                F.col("doc_id") - F.lag("doc_id").over(wt),
                F.col("doc_id") + 1,
            ).cast("long"),
        )
        .select(
            "term",
            "delta",
            (
                F.lit(1)
                + F.floor(
                    (F.length(F.bin(F.col("delta"))) - 1) / F.lit(7)
                )
            )
            .cast("long")
            .alias("vbytes"),
        )
        .localCheckpoint(eager=True)
    )
    vag = deltas.groupBy("term").agg(
        (F.sum("vbytes") * 8).cast("long").alias("varint_bits")
    )
    grid = spark.createDataFrame([(k,) for k in RICE_KS], "k int")
    costs = (
        deltas.crossJoin(F.broadcast(grid))
        .select(
            "term",
            "k",
            F.expr("shiftright(delta, k)").cast("long").alias("q"),
        )
        .groupBy("term", "k")
        .agg(
            F.sum("q").cast("long").alias("sq"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .select(
            "term",
            "k",
            (F.col("sq") + F.col("n") * (1 + F.col("k")))
            .cast("long")
            .alias("bits"),
        )
    )
    wbest = Window.partitionBy("term").orderBy(
        F.asc("bits"), F.asc("k")
    )
    best = (
        costs.withColumn("_rn", F.row_number().over(wbest))
        .filter(F.col("_rn") == 1)
        .select("term", F.col("k").cast("long").alias("best_k"), "bits")
    )
    return (
        top.join(best, "term")
        .join(vag, "term")
        .select(
            "term",
            "df",
            "best_k",
            F.col("bits").alias("rice_bits"),
            "varint_bits",
            F.round(
                F.col("bits").cast("double") / F.col("df").cast("double"), 6
            ).alias("rice_bits_per_posting"),
            F.round(
                F.col("varint_bits").cast("double")
                / F.col("df").cast("double"),
                6,
            ).alias("varint_bits_per_posting"),
        )
        .orderBy(F.desc("df"), F.asc("term"))
    )


SQL_RICE_PARAM = f"""
WITH postings AS (
  SELECT DISTINCT term, doc_id FROM (
    SELECT doc_id,
           unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term
    FROM documents
  )
),
dfreq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM postings GROUP BY term
),
top AS (
  SELECT term, df FROM (
    SELECT *, row_number() OVER (ORDER BY df DESC, term) AS rn FROM dfreq)
  WHERE rn <= {RICE_TOP_TERMS}
),
deltas AS (
  SELECT p.term,
         COALESCE(p.doc_id - lag(p.doc_id)
                    OVER (PARTITION BY p.term ORDER BY p.doc_id),
                  p.doc_id + 1) AS delta
  FROM postings p JOIN top USING (term)
),
vag AS (
  SELECT term,
         CAST(sum(1 + (length(bin(delta)) - 1) // 7) * 8 AS BIGINT)
           AS varint_bits
  FROM deltas GROUP BY term
),
costs AS (
  SELECT term, k,
         CAST(sum(delta >> k) + count(*) * (1 + k) AS BIGINT) AS bits
  FROM deltas, (SELECT unnest(range({len(RICE_KS)})) AS k) g
  GROUP BY term, k
),
best AS (
  SELECT term, CAST(k AS BIGINT) AS best_k, bits FROM (
    SELECT *, row_number()
        OVER (PARTITION BY term ORDER BY bits ASC, k ASC) AS rn
    FROM costs)
  WHERE rn = 1
)
SELECT t.term, t.df, b.best_k, b.bits AS rice_bits, v.varint_bits,
       round(CAST(b.bits AS DOUBLE) / CAST(t.df AS DOUBLE), 6)
         AS rice_bits_per_posting,
       round(CAST(v.varint_bits AS DOUBLE) / CAST(t.df AS DOUBLE), 6)
         AS varint_bits_per_posting
FROM top t JOIN best b USING (term) JOIN vag v USING (term)
ORDER BY df DESC, term
"""


# --------------------------------------------------------------------------
# Consistent-hash ring rebalance proof (Karger et al. 1997) — the
# alternative to shard_rebalance's mod-N story: 4 shards x 32 vnodes on
# the md5 ring (lexicographic hex order IS the ring order — invariant 2,
# no numeric conversion needed), sampled customer keys route to the
# first vnode clockwise (min position >= key hash, wrapping to the
# global min). Adding shard 4 re-routes ONLY keys that land on the new
# shard: the per-shard report shows n_before/n_after/gained with
# gained = 0 for every old shard — the property that makes ring hashing
# the scale answer. All counts exact; shares one divide each.
# --------------------------------------------------------------------------
HASHRING_VNODES = 32
HASHRING_SHARDS = 4


def _ring_assign(spark: SparkSession, keys: DataFrame, n_shards: int):
    vn = spark.createDataFrame(
        [(s, v) for s in range(n_shards) for v in range(HASHRING_VNODES)],
        "shard int, v int",
    )
    ring = vn.select(
        F.col("shard").cast("long").alias("shard"),
        F.md5(
            F.concat(
                F.lit("shard:"),
                F.col("shard").cast("string"),
                F.lit(":"),
                F.col("v").cast("string"),
            )
        ).alias("pos"),
    )
    gmin = ring.agg(F.min("pos").alias("_g"))
    cand = (
        keys.crossJoin(F.broadcast(ring))
        .groupBy("key", "kh")
        .agg(
            F.min(
                F.when(F.col("pos") >= F.col("kh"), F.col("pos"))
            ).alias("_c")
        )
    )
    owner_pos = cand.crossJoin(F.broadcast(gmin)).select(
        "key", F.coalesce("_c", "_g").alias("pos")
    )
    return owner_pos.join(F.broadcast(ring), "pos").select("key", "shard")


def q_hash_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _read(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % 20 == 0
    )
    keys = cust.select(
        F.col("c_custkey").cast("long").alias("key"),
        F.md5(
            F.concat(F.lit("key:"), F.col("c_custkey").cast("string"))
        ).alias("kh"),
    ).localCheckpoint(eager=True)
    n_keys = scalar_count(keys, as_double=False)
    before = _ring_assign(spark, keys, HASHRING_SHARDS).withColumnRenamed(
        "shard", "s_before"
    )
    after = _ring_assign(spark, keys, HASHRING_SHARDS + 1).withColumnRenamed(
        "shard", "s_after"
    )
    j = before.join(after, "key")
    return (
        j.groupBy(F.col("s_after").alias("shard"))
        .agg(
            F.sum((F.col("s_before") == F.col("s_after")).cast("long"))
            .cast("long")
            .alias("kept"),
            F.sum((F.col("s_before") != F.col("s_after")).cast("long"))
            .cast("long")
            .alias("gained"),
            F.count(F.lit(1)).cast("long").alias("n_after"),
        )
        .crossJoin(F.broadcast(n_keys))
        .select(
            "shard",
            "kept",
            "gained",
            "n_after",
            F.round(
                F.col("n_after").cast("double") / F.col("_n").cast("double"),
                6,
            ).alias("share_after"),
        )
        .orderBy("shard")
    )


def _ring_cte(tag: str, n_shards: int) -> str:
    return f"""
ring_{tag} AS (
  SELECT CAST(s AS BIGINT) AS shard,
         md5('shard:' || CAST(s AS VARCHAR) || ':' || CAST(v AS VARCHAR))
           AS pos
  FROM (SELECT unnest(range({n_shards})) AS s) ss,
       (SELECT unnest(range({HASHRING_VNODES})) AS v) vv
),
gmin_{tag} AS (SELECT min(pos) AS g FROM ring_{tag}),
own_{tag} AS (
  SELECT k.key,
         COALESCE(min(CASE WHEN r.pos >= k.kh THEN r.pos END),
                  (SELECT g FROM gmin_{tag})) AS pos
  FROM keys k CROSS JOIN ring_{tag} r
  GROUP BY k.key, k.kh
),
asg_{tag} AS (
  SELECT o.key, r.shard FROM own_{tag} o JOIN ring_{tag} r USING (pos)
)
"""


SQL_HASH_RING = f"""
WITH keys AS (
  SELECT CAST(c_custkey AS BIGINT) AS key,
         md5('key:' || CAST(c_custkey AS VARCHAR)) AS kh
  FROM customer WHERE c_custkey % 20 = 0
),
nk AS (SELECT CAST(count(*) AS BIGINT) AS n FROM keys),
{_ring_cte("a", HASHRING_SHARDS)},
{_ring_cte("b", HASHRING_SHARDS + 1)}
SELECT b.shard,
       CAST(sum(CASE WHEN a.shard = b.shard THEN 1 ELSE 0 END) AS BIGINT)
         AS kept,
       CAST(sum(CASE WHEN a.shard <> b.shard THEN 1 ELSE 0 END) AS BIGINT)
         AS gained,
       CAST(count(*) AS BIGINT) AS n_after,
       round(CAST(count(*) AS DOUBLE) / CAST(nk.n AS DOUBLE), 6)
         AS share_after
FROM asg_a a JOIN asg_b b USING (key), nk
GROUP BY b.shard, nk.n
ORDER BY b.shard
"""


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
    strat_num = seg.select(
        F.when(
            (F.col("n1g") > 0) & (F.col("ng") - F.col("n1g") > 0),
            F.col("ng").cast("double") * (m1g - m0g),
        )
        .otherwise(F.lit(0.0))
        .alias("contrib"),
        "ng",
    ).agg(
        F.round(F.sum(F.col("contrib") * F.lit(1000000.0)), 0)
        .cast("long")
        .alias("snum6"),
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
  SELECT CAST(round(sum(CASE WHEN n1g > 0 AND ng - n1g > 0
                  THEN CAST(ng AS DOUBLE)
                       * (CAST(s1g AS DOUBLE) / CAST(n1g AS DOUBLE)
                          - CAST(s0g AS DOUBLE)
                            / CAST(ng - n1g AS DOUBLE))
                  ELSE 0.0 END * 1000000.0)) AS BIGINT) AS snum6
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


# --------------------------------------------------------------------------
# LRU stack-distance curve over per-user event-type streams (Mattson et
# al. 1970): for every reuse of a type, the number of DISTINCT other
# types touched since its previous access; the cumulative histogram IS
# the LRU hit-rate-vs-capacity curve (inclusion property — one pass
# prices every cache size). Distances come from a bounded interval
# self-join (fan-out = sum of same-type gaps ≈ |alphabet| x events, not
# events²) with the two-phase distinct discipline; first accesses are
# compulsory misses. All counts exact; hit rates single divides.
# --------------------------------------------------------------------------
def q_stack_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "user_id",
        "event_type",
        F.row_number().over(wu).cast("long").alias("rn"),
    ).localCheckpoint(eager=True)
    wt = Window.partitionBy("user_id", "event_type").orderBy("rn")
    reuse = seq.select(
        "user_id",
        F.col("rn").alias("r2"),
        F.lag("rn").over(wt).alias("r1"),
    ).filter(F.col("r1").isNotNull())
    mid = seq.select(
        F.col("user_id").alias("u2"),
        F.col("rn").alias("rm"),
        F.col("event_type").alias("tm"),
    )
    between = (
        reuse.join(
            mid,
            (F.col("u2") == F.col("user_id"))
            & (F.col("rm") > F.col("r1"))
            & (F.col("rm") < F.col("r2")),
            "left",
        )
        .groupBy("user_id", "r2", "tm")
        .agg(F.lit(1).alias("_o"))
        .groupBy("user_id", "r2")
        .agg(
            F.sum(F.col("tm").isNotNull().cast("long"))
            .cast("long")
            .alias("d")
        )
    )
    n_acc = scalar_count(seq, as_double=False)
    hist = between.groupBy("d").agg(
        F.count(F.lit(1)).cast("long").alias("n_reuses")
    )
    wcum = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        hist.withColumn(
            "cum", F.sum("n_reuses").over(wcum).cast("long")
        )
        .crossJoin(F.broadcast(n_acc))
        .select(
            F.col("d").alias("distance"),
            "n_reuses",
            (F.col("d") + 1).cast("long").alias("capacity"),
            F.round(
                F.col("cum").cast("double") / F.col("_n").cast("double"),
                6,
            ).alias("hit_rate"),
        )
        .orderBy("distance")
    )


SQL_STACK_DISTANCE = """
WITH seq AS (
  SELECT user_id, event_type,
         CAST(row_number() OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS BIGINT) AS rn
  FROM events
),
reuse AS (
  SELECT user_id, rn AS r2,
         lag(rn) OVER (PARTITION BY user_id, event_type ORDER BY rn) AS r1
  FROM seq
  QUALIFY r1 IS NOT NULL
),
between_types AS (
  SELECT r.user_id, r.r2, m.event_type AS tm
  FROM reuse r
  LEFT JOIN seq m ON m.user_id = r.user_id
                 AND m.rn > r.r1 AND m.rn < r.r2
  GROUP BY r.user_id, r.r2, m.event_type
),
dists AS (
  SELECT user_id, r2,
         CAST(sum(CASE WHEN tm IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS d
  FROM between_types GROUP BY user_id, r2
),
na AS (SELECT CAST(count(*) AS BIGINT) AS n FROM seq),
hist AS (
  SELECT d, CAST(count(*) AS BIGINT) AS n_reuses FROM dists GROUP BY d
)
SELECT d AS distance, n_reuses,
       CAST(d + 1 AS BIGINT) AS capacity,
       round(CAST(CAST(sum(n_reuses) OVER (ORDER BY d
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS DOUBLE) / CAST(na.n AS DOUBLE), 6)
         AS hit_rate
FROM hist, na
ORDER BY distance
"""


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
# Normalized mutual information between embedding labels and the sign
# OCTANT of the first three vector components — the cheapest possible
# space-partition-vs-ground-truth association audit (the question every
# LSH/IVF bucketing asks: do the buckets know anything about the
# classes?). The contingency table is exact BIGINT counts; each
# MI/entropy term rounds ln of an exact-integer ratio to fixed6 BEFORE
# the count-weighted exact sum (lexical_diversity discipline), and
# NMI = MI / sqrt(H_label * H_bucket) is one double expression over the
# three integer-scaled sums, rounded 6.
# --------------------------------------------------------------------------
def q_embedding_nmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _read(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    base = emb.select(
        F.col("label").cast("long").alias("label"),
        (
            (v[0] > 0).cast("long") * 4
            + (v[1] > 0).cast("long") * 2
            + (v[2] > 0).cast("long")
        ).alias("octant"),
    )
    cells = base.groupBy("label", "octant").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    ).localCheckpoint(eager=True)
    la = cells.groupBy("label").agg(F.sum("c").cast("long").alias("a"))
    lb = cells.groupBy("octant").agg(F.sum("c").cast("long").alias("b"))
    tot = cells.agg(F.sum("c").cast("long").alias("n"))

    def e6(x) -> F.Column:
        return F.round(F.log(x) * F.lit(1000000.0), 0).cast("long")

    mi_cell = (
        cells.join(F.broadcast(la), "label")
        .join(F.broadcast(lb), "octant")
        .crossJoin(F.broadcast(tot))
        .select(
            "n",
            (
                F.col("c")
                * e6(
                    F.col("c").cast("double")
                    * F.col("n").cast("double")
                    / (
                        F.col("a").cast("double")
                        * F.col("b").cast("double")
                    )
                )
            )
            .cast("long")
            .alias("t"),
        )
        .groupBy("n")
        .agg(F.sum("t").cast("long").alias("smi"))
    )
    ha = (
        la.crossJoin(F.broadcast(tot))
        .select(
            (
                F.col("a")
                * e6(
                    F.col("n").cast("double") / F.col("a").cast("double")
                )
            )
            .cast("long")
            .alias("t")
        )
        .agg(F.sum("t").cast("long").alias("sha"))
    )
    hb = (
        lb.crossJoin(F.broadcast(tot))
        .select(
            (
                F.col("b")
                * e6(
                    F.col("n").cast("double") / F.col("b").cast("double")
                )
            )
            .cast("long")
            .alias("t")
        )
        .agg(F.sum("t").cast("long").alias("shb"))
    )
    nd = F.col("n").cast("double")
    mi = F.col("smi").cast("double") / F.lit(1000000.0) / nd
    hla = F.col("sha").cast("double") / F.lit(1000000.0) / nd
    hlb = F.col("shb").cast("double") / F.lit(1000000.0) / nd
    return (
        mi_cell.crossJoin(F.broadcast(ha))
        .crossJoin(F.broadcast(hb))
        .select(
            F.col("n").alias("n_vectors"),
            F.round(mi, 6).alias("mi_nats"),
            F.round(hla, 6).alias("h_label"),
            F.round(hlb, 6).alias("h_bucket"),
            F.round(mi / F.sqrt(hla * hlb), 6).alias("nmi"),
        )
    )


SQL_EMBEDDING_NMI = """
WITH base AS (
  SELECT CAST(label AS BIGINT) AS label,
         (CASE WHEN embedding[1] > 0 THEN 4 ELSE 0 END
          + CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END
          + CASE WHEN embedding[3] > 0 THEN 1 ELSE 0 END) AS octant
  FROM embeddings
),
cells AS (
  SELECT label, octant, CAST(count(*) AS BIGINT) AS c
  FROM base GROUP BY label, octant
),
la AS (SELECT label, CAST(sum(c) AS BIGINT) AS a FROM cells GROUP BY label),
lb AS (SELECT octant, CAST(sum(c) AS BIGINT) AS b FROM cells GROUP BY octant),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
mi AS (
  SELECT CAST(sum(c * CAST(round(ln(CAST(c AS DOUBLE) * CAST(n AS DOUBLE)
                  / (CAST(a AS DOUBLE) * CAST(b AS DOUBLE)))
                  * 1000000.0) AS BIGINT)) AS BIGINT) AS smi,
         CAST(max(n) AS BIGINT) AS n
  FROM cells JOIN la USING (label) JOIN lb USING (octant), tot
),
ha AS (
  SELECT CAST(sum(a * CAST(round(ln(CAST(n AS DOUBLE) / CAST(a AS DOUBLE))
                  * 1000000.0) AS BIGINT)) AS BIGINT) AS sha
  FROM la, tot
),
hb AS (
  SELECT CAST(sum(b * CAST(round(ln(CAST(n AS DOUBLE) / CAST(b AS DOUBLE))
                  * 1000000.0) AS BIGINT)) AS BIGINT) AS shb
  FROM lb, tot
)
SELECT mi.n AS n_vectors,
       round(CAST(smi AS DOUBLE) / 1000000.0 / CAST(mi.n AS DOUBLE), 6)
         AS mi_nats,
       round(CAST(sha AS DOUBLE) / 1000000.0 / CAST(mi.n AS DOUBLE), 6)
         AS h_label,
       round(CAST(shb AS DOUBLE) / 1000000.0 / CAST(mi.n AS DOUBLE), 6)
         AS h_bucket,
       round((CAST(smi AS DOUBLE) / 1000000.0 / CAST(mi.n AS DOUBLE))
             / sqrt((CAST(sha AS DOUBLE) / 1000000.0 / CAST(mi.n AS DOUBLE))
                    * (CAST(shb AS DOUBLE) / 1000000.0
                       / CAST(mi.n AS DOUBLE))), 6) AS nmi
FROM mi, ha, hb
"""


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
    ).select(
        (F.col("sday") - F.col("oday")).alias("lag"),
        "l_orderkey",
        "l_linenumber",
    )
    n_df = scalar_count(lags, as_double=False)
    w = Window.orderBy("lag", "l_orderkey", "l_linenumber")
    ranked = lags.withColumn("rn", F.row_number().over(w).cast("long"))
    agg = lags.agg(
        F.sum("lag").cast("long").alias("slag"),
    )
    picks = None
    j = ranked.crossJoin(F.broadcast(n_df))
    for d in range(1, 10):
        idx = F.expr(f"({d} * _n + 9) DIV 10")
        row = (
            j.filter(F.col("rn") == idx)
            .agg(F.max("lag").cast("long").alias("lag_days"))
            .select(
                F.lit(d * 10).cast("long").alias("percentile"),
                "lag_days",
            )
        )
        picks = row if picks is None else picks.unionByName(row)
    mean_row = (
        agg.crossJoin(F.broadcast(n_df))
        .select(
            F.lit(0).cast("long").alias("percentile"),
            F.round(
                F.col("slag").cast("double") / F.col("_n").cast("double"),
                0,
            )
            .cast("long")
            .alias("lag_days"),
        )
    )
    return mean_row.unionByName(picks).orderBy("percentile")


SQL_SHIP_LAG_DECILES = f"""
WITH lags AS (
  SELECT (epoch_us(l.l_shipdate) // {US_PER_DAY_DIV})
         - (epoch_us(o.o_orderdate) // {US_PER_DAY_DIV}) AS lag,
         l.l_orderkey, l.l_linenumber
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lags),
ranked AS (
  SELECT lag,
         CAST(row_number()
              OVER (ORDER BY lag, l_orderkey, l_linenumber) AS BIGINT)
           AS rn
  FROM lags
),
picks AS (
  SELECT CAST(d * 10 AS BIGINT) AS percentile,
         CAST(max(CASE WHEN rn = (d * nn.n + 9) // 10 THEN lag END)
              AS BIGINT) AS lag_days
  FROM ranked, nn, (SELECT unnest(range(1, 10)) AS d) g
  GROUP BY d, nn.n
),
mean_row AS (
  SELECT CAST(0 AS BIGINT) AS percentile,
         CAST(round(CAST(sum(lag) AS DOUBLE) / CAST(max(nn.n) AS DOUBLE))
              AS BIGINT) AS lag_days
  FROM lags, nn
)
SELECT * FROM mean_row
UNION ALL
SELECT * FROM picks
ORDER BY percentile
"""


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
# Bipartite butterfly census on the user-eventtype graph (butterfly =
# 2x2 biclique, the bipartite analog of the triangle; Sanei-Mehri et
# al. 2018): per type pair, the number of users touching both and the
# C(n,2) butterflies that pair closes, plus each pair's share of the
# global count. The alphabet side is tiny so the pair join is bounded
# at |types|² rows after a distinct-first edge reduction; every count
# is an exact BIGINT (C(n,2) = n*(n-1)/2 stays integral via DIV 2).
# --------------------------------------------------------------------------
def q_butterfly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    edges = events.groupBy("user_id", "event_type").agg(
        F.lit(1).alias("_o")
    ).select("user_id", "event_type")
    a = edges.select("user_id", F.col("event_type").alias("ta"))
    b = edges.select(
        F.col("user_id").alias("u2"), F.col("event_type").alias("tb")
    )
    co = (
        a.join(
            b,
            (F.col("user_id") == F.col("u2")) & (F.col("ta") < F.col("tb")),
        )
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).cast("long").alias("co_users"))
    )
    bf = F.expr("(co_users * (co_users - 1)) DIV 2")
    pairs = co.select(
        F.col("ta").alias("type_a"),
        F.col("tb").alias("type_b"),
        "co_users",
        bf.cast("long").alias("butterflies"),
    )
    tot = pairs.agg(F.sum("butterflies").cast("long").alias("_t"))
    return (
        pairs.crossJoin(F.broadcast(tot))
        .select(
            "type_a",
            "type_b",
            "co_users",
            "butterflies",
            F.round(
                F.col("butterflies").cast("double")
                / F.col("_t").cast("double"),
                6,
            ).alias("share"),
        )
        .orderBy("type_a", "type_b")
    )


SQL_BUTTERFLY_COUNTS = """
WITH edges AS (
  SELECT DISTINCT user_id, event_type FROM events
),
co AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(count(*) AS BIGINT) AS co_users
  FROM edges a JOIN edges b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type
),
pairs AS (
  SELECT type_a, type_b, co_users,
         CAST((co_users * (co_users - 1)) // 2 AS BIGINT) AS butterflies
  FROM co
),
tot AS (SELECT CAST(sum(butterflies) AS BIGINT) AS t FROM pairs)
SELECT type_a, type_b, co_users, butterflies,
       round(CAST(butterflies AS DOUBLE) / CAST(tot.t AS DOUBLE), 6)
         AS share
FROM pairs, tot
ORDER BY type_a, type_b
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


QUERIES_TD = {
    "minhash_lsh_pairs": q_minhash_lsh_pairs,
    "embedding_diversity": q_embedding_diversity,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "containment_pairs": q_containment_pairs,
    "boilerplate_shingles": q_boilerplate_shingles,
    "selectivity_estimates": q_selectivity_estimates,
    "vocab_pruning": q_vocab_pruning,
    "oov_rate": q_oov_rate,
    "next_word": q_next_word,
    "corpus_delta": q_corpus_delta,
    "impact_quantization": q_impact_quantization,
    "bm25_b_sweep": q_bm25_b_sweep,
    "novelty_curve": q_novelty_curve,
    "gap_histogram": q_gap_histogram,
    "standing_alerts": q_standing_alerts,
    "hybrid_rrf": q_hybrid_rrf,
    "query_clarity": q_query_clarity,
    "tiered_index": q_tiered_index,
    "lang_divergence": q_lang_divergence,
    "crawl_schedule": q_crawl_schedule,
    "pagerank_convergence": q_pagerank_convergence,
    "feature_correlation": q_feature_correlation,
    "textrank_keywords": q_textrank_keywords,
    "host_authority": q_host_authority,
    "codec_compare": q_codec_compare,
    "dict_frontcoding": q_dict_frontcoding,
    "shard_rebalance": q_shard_rebalance,
    "query_cache_model": q_query_cache_model,
    "term_association": q_term_association,
    "edge_support": q_edge_support,
    "rocchio_expansion": q_rocchio_expansion,
    "sq8_quantization": q_sq8_quantization,
    "harmonic_centrality": q_harmonic_centrality,
    "cluster_quality": q_cluster_quality,
    "block_max_scores": q_block_max_scores,
    "sparse_cosine_pairs": q_sparse_cosine_pairs,
    "order_priority_check": q_order_priority_check,
    "shipmode_priority": q_shipmode_priority,
    "cust_order_dist": q_cust_order_dist,
    "small_qty_revenue": q_small_qty_revenue,
    "volume_shipping": q_volume_shipping,
    "pq_audit": q_pq_audit,
    "market_share": q_market_share,
    "disjunctive_revenue": q_disjunctive_revenue,
    "forecast_revenue": q_forecast_revenue,
    "supplier_relation_count": q_supplier_relation_count,
    "rank_correlation": q_rank_correlation,
    "markov_stationary": q_markov_stationary,
    "churn_hazard": q_churn_hazard,
    "hub_knockout": q_hub_knockout,
    "hard_negatives": q_hard_negatives,
    "dedup_eval": q_dedup_eval,
    "lsh_transitivity": q_lsh_transitivity,
    "path_trigrams": q_path_trigrams,
    "rollup_report": q_rollup_report,
    "pivot_report": q_pivot_report,
    "simhash_bit_balance": q_simhash_bit_balance,
    "expansion_agreement": q_expansion_agreement,
    "srp_distortion": q_srp_distortion,
    "bm25f_topk": q_bm25f_topk,
    "skyline_frontier": q_skyline_frontier,
    "abc_analysis": q_abc_analysis,
    "ann_recall": q_ann_recall,
    "equidepth_histogram": q_equidepth_histogram,
    "group_percentiles": q_group_percentiles,
    "region_top_nations": q_region_top_nations,
    "mad_outliers": q_mad_outliers,
    "entropy_rate": q_entropy_rate,
    "ltr_features": q_ltr_features,
    "conversion_lag": q_conversion_lag,
    "global_transitivity": q_global_transitivity,
    "bowtie_structure": q_bowtie_structure,
    "session_gap_sweep": q_session_gap_sweep,
    "negative_sampling": q_negative_sampling,
    "ucb_scores": q_ucb_scores,
    "ab_test_z": q_ab_test_z,
    "rich_club": q_rich_club,
    "purchase_regularity": q_purchase_regularity,
    "label_modularity": q_label_modularity,
    "discount_elasticity": q_discount_elasticity,
    "fano_factor": q_fano_factor,
    "simpson_diversity": q_simpson_diversity,
    "circadian_profile": q_circadian_profile,
    "reorder_interval": q_reorder_interval,
    "char_entropy": q_char_entropy,
    "benford_audit": q_benford_audit,
    "traffic_autocorr": q_traffic_autocorr,
    "monthly_seasonality": q_monthly_seasonality,
    "powerlaw_fit": q_powerlaw_fit,
    "contingency_chi2": q_contingency_chi2,
    "theil_decomposition": q_theil_decomposition,
    "traffic_bursts": q_traffic_bursts,
    "kendall_tau": q_kendall_tau,
    "ks_two_sample": q_ks_two_sample,
    "cusum_changepoint": q_cusum_changepoint,
    "anova_dow": q_anova_dow,
    "runs_test": q_runs_test,
    "hill_tail_index": q_hill_tail_index,
    "mann_kendall": q_mann_kendall,
    "mutual_information": q_mutual_information,
    "cohen_kappa": q_cohen_kappa,
    "gumbel_maxima": q_gumbel_maxima,
    "user_accumulation": q_user_accumulation,
    "lorenz_deciles": q_lorenz_deciles,
    "mann_whitney": q_mann_whitney,
    "trimmed_stats": q_trimmed_stats,
    "power_analysis": q_power_analysis,
    "unigram_perplexity": q_unigram_perplexity,
    "good_turing": q_good_turing,
    "anderson_darling": q_anderson_darling,
    "pearson_residuals": q_pearson_residuals,
    "brown_forsythe": q_brown_forsythe,
    "kruskal_wallis": q_kruskal_wallis,
    "periodogram": q_periodogram,
    "jarque_bera": q_jarque_bera,
    "durbin_watson": q_durbin_watson,
    "theil_sen": q_theil_sen,
    "pettitt_test": q_pettitt_test,
    "grubbs_test": q_grubbs_test,
    "friedman_test": q_friedman_test,
    "segment_migration": q_segment_migration,
    "brand_concentration": q_brand_concentration,
    "max_concurrency": q_max_concurrency,
    "value_at_risk": q_value_at_risk,
    "odds_ratio": q_odds_ratio,
    "haar_energy": q_haar_energy,
    "nb_dispersion": q_nb_dispersion,
    "degree_ccdf": q_degree_ccdf,
    "logistic_step": q_logistic_step,
    "pca_power": q_pca_power,
    "naive_bayes_lang": q_naive_bayes_lang,
    "median_ci": q_median_ci,
    "dedup_roc": q_dedup_roc,
    "lognormal_sessions": q_lognormal_sessions,
    "safety_stock": q_safety_stock,
    "ewma_control": q_ewma_control,
    "dedup_ap": q_dedup_ap,
    "jackknife_se": q_jackknife_se,
    "fightin_words": q_fightin_words,
    "k_anonymity": q_k_anonymity,
    "l_diversity": q_l_diversity,
    "shapley_attribution": q_shapley_attribution,
    "threshold_algorithm": q_threshold_algorithm,
    "encoding_audit": q_encoding_audit,
    "bh_fdr": q_bh_fdr,
    "mase_backtest": q_mase_backtest,
    "rmst": q_rmst,
    "diff_in_diff": q_diff_in_diff,
    "decision_stump": q_decision_stump,
    "gains_table": q_gains_table,
    "ranking_auc": q_ranking_auc,
    "calibration_ece": q_calibration_ece,
    "sprt_stop": q_sprt_stop,
    "eb_shrinkage": q_eb_shrinkage,
    "neyman_allocation": q_neyman_allocation,
    "kish_ess": q_kish_ess,
    "logrank_test": q_logrank_test,
    "ipf_raking": q_ipf_raking,
    "edge_percolation": q_edge_percolation,
    "cuped_adjustment": q_cuped_adjustment,
    "offered_load": q_offered_load,
    "erlang_b": q_erlang_b,
    "cdc_chunking": q_cdc_chunking,
    "session_burstiness": q_session_burstiness,
    "hurst_exponent": q_hurst_exponent,
    "topk_churn": q_topk_churn,
    "pvm_bridge": q_pvm_bridge,
    "order_backlog": q_order_backlog,
    "abc_xyz": q_abc_xyz,
    "source_similarity": q_source_similarity,
    "kingman_wait": q_kingman_wait,
    "daily_mix_anomaly": q_daily_mix_anomaly,
    "yule_k": q_yule_k,
    "err_eval": q_err_eval,
    "pl2_topk": q_pl2_topk,
    "pacf_daily": q_pacf_daily,
    "salsa_scores": q_salsa_scores,
    "croston_demand": q_croston_demand,
    "newsvendor": q_newsvendor,
    "mrr_eval": q_mrr_eval,
    "brown_smoothing": q_brown_smoothing,
    "allan_variance": q_allan_variance,
    "ef_vs_varint": q_ef_vs_varint,
    "witten_bell": q_witten_bell,
    "shannon_code": q_shannon_code,
    "label_centroids": q_label_centroids,
    "ipw_estimate": q_ipw_estimate,
    "rice_param": q_rice_param,
    "hash_ring": q_hash_ring,
    "first_position": q_first_position,
    "capture_recapture": q_capture_recapture,
    "coupon_collector": q_coupon_collector,
    "inspection_paradox": q_inspection_paradox,
    "aipw_estimate": q_aipw_estimate,
    "stack_distance": q_stack_distance,
    "pivoted_topk": q_pivoted_topk,
    "embedding_nmi": q_embedding_nmi,
    "length_bias": q_length_bias,
    "rsj_weights": q_rsj_weights,
    "ship_lag_deciles": q_ship_lag_deciles,
    "hapax_profile": q_hapax_profile,
    "butterfly_counts": q_butterfly_counts,
    "price_indices": q_price_indices,
    "minhash_calibration": q_minhash_calibration,
    "prefix_complete": q_prefix_complete,
    "cascade_overlap": q_cascade_overlap,
    "link_reciprocity": q_link_reciprocity,
    "simhash_fingerprints": q_simhash_fingerprints,
    "simhash_near_dup": q_simhash_near_dup,
    "embedding_knn": q_embedding_knn,
    "embedding_near_dup": q_embedding_near_dup,
    "semantic_dedup": q_semantic_dedup,
    "ann_lsh_topk": q_ann_lsh_topk,
    "language_id": q_language_id,
    "token_counts": q_token_counts,
    "winnow_fingerprints": q_winnow_fingerprints,
    "hll_distinct": q_hll_distinct,
    "cms_heavy_hitters": q_cms_heavy_hitters,
    "length_quantiles": q_length_quantiles,
    "weighted_sample": q_weighted_sample,
    "binary_meta": q_binary_meta,
    "media_resize": q_media_resize,
    "media_frame_sample": q_media_frame_sample,
    "media_features": q_media_features,
    "spellcheck_candidates": q_spellcheck_candidates,
    "degree_counts": q_degree_counts,
    "pagerank": q_pagerank,
    "hits_scores": q_hits_scores,
    "word_source_merge": q_word_source_merge,
    "ann_ivf_topk": q_ann_ivf_topk,
    "ann_ivf_trained": q_ann_ivf_trained,
    "event_sessions": q_event_sessions,
    "events_rollup": q_events_rollup,
    "cohort_retention": q_cohort_retention,
    "triangle_counts": q_triangle_counts,
    "cocitation_coupling": q_cocitation_coupling,
    "graph_mixing": q_graph_mixing,
    "degree_correlation": q_degree_correlation,
    "personalized_pagerank": q_personalized_pagerank,
    "label_propagation": q_label_propagation,
    "k_core": q_k_core,
    "link_distance": q_link_distance,
    "rolling_active": q_rolling_active,
    "event_gaps": q_event_gaps,
    "event_transitions": q_event_transitions,
    "cohort_overlap": q_cohort_overlap,
    "weekly_profile": q_weekly_profile,
    "user_streaks": q_user_streaks,
    "event_funnel": q_event_funnel,
    "asof_join": q_asof_join,
    "interval_join": q_interval_join,
    "events_anomaly": q_events_anomaly,
    "bm25_topk": q_bm25_topk,
    "postings_bytes": q_postings_bytes,
    "rank_fusion": q_rank_fusion,
    "search_snippets": q_search_snippets,
    "shard_balance": q_shard_balance,
    "pricing_summary": q_pricing_summary,
    "ship_priority": q_ship_priority,
    "nation_revenue": q_nation_revenue,
    "returns_report": q_returns_report,
    "promo_share": q_promo_share,
    "top_supplier": q_top_supplier,
    "order_gini": q_order_gini,
    "length_moments": q_length_moments,
    "market_basket": q_market_basket,
    "props_extract": q_props_extract,
    "bounce_rate": q_bounce_rate,
    "behavior_entropy": q_behavior_entropy,
    "chao1_vocab": q_chao1_vocab,
    "stylometry": q_stylometry,
    "term_burstiness": q_term_burstiness,
    "ql_topk": q_ql_topk,
    "rank_overlap": q_rank_overlap,
    "value_histogram": q_value_histogram,
    "keyness_llr": q_keyness_llr,
    "lexical_diversity": q_lexical_diversity,
    "rfm_segments": q_rfm_segments,
    "dedup_components": q_dedup_components,
    "canonical_docs": q_canonical_docs,
    "anchor_text": q_anchor_text,
    "prf_expansion": q_prf_expansion,
    "phrase_match": q_phrase_match,
    "link_prediction": q_link_prediction,
    "touch_attribution": q_touch_attribution,
    "ndcg_eval": q_ndcg_eval,
    "large_orders": q_large_orders,
    "katz_centrality": q_katz_centrality,
    "cust_balance": q_cust_balance,
    "late_supplier": q_late_supplier,
    "proximity_rank": q_proximity_rank,
    "mmr_rerank": q_mmr_rerank,
}

ORACLES_TD = {
    "minhash_lsh_pairs": SQL_MINHASH_LSH_PAIRS,
    "embedding_diversity": SQL_EMBEDDING_DIVERSITY,
    "ngram_jaccard_pairs": SQL_NGRAM_JACCARD_PAIRS,
    "containment_pairs": SQL_CONTAINMENT_PAIRS,
    "boilerplate_shingles": SQL_BOILERPLATE_SHINGLES,
    "selectivity_estimates": SQL_SELECTIVITY_ESTIMATES,
    "vocab_pruning": SQL_VOCAB_PRUNING,
    "oov_rate": SQL_OOV_RATE,
    "next_word": SQL_NEXT_WORD,
    "corpus_delta": SQL_CORPUS_DELTA,
    "impact_quantization": SQL_IMPACT_QUANTIZATION,
    "bm25_b_sweep": SQL_BM25_B_SWEEP,
    "novelty_curve": SQL_NOVELTY_CURVE,
    "gap_histogram": SQL_GAP_HISTOGRAM,
    "standing_alerts": SQL_STANDING_ALERTS,
    "hybrid_rrf": SQL_HYBRID_RRF,
    "query_clarity": SQL_QUERY_CLARITY,
    "tiered_index": SQL_TIERED_INDEX,
    "lang_divergence": SQL_LANG_DIVERGENCE,
    "crawl_schedule": SQL_CRAWL_SCHEDULE,
    "pagerank_convergence": SQL_PAGERANK_CONVERGENCE,
    "feature_correlation": SQL_FEATURE_CORRELATION,
    "textrank_keywords": SQL_TEXTRANK_KEYWORDS,
    "host_authority": SQL_HOST_AUTHORITY,
    "codec_compare": SQL_CODEC_COMPARE,
    "dict_frontcoding": SQL_DICT_FRONTCODING,
    "shard_rebalance": SQL_SHARD_REBALANCE,
    "query_cache_model": SQL_QUERY_CACHE_MODEL,
    "term_association": SQL_TERM_ASSOCIATION,
    "edge_support": SQL_EDGE_SUPPORT,
    "rocchio_expansion": SQL_ROCCHIO_EXPANSION,
    "sq8_quantization": SQL_SQ8_QUANTIZATION,
    "harmonic_centrality": SQL_HARMONIC_CENTRALITY,
    "cluster_quality": SQL_CLUSTER_QUALITY,
    "block_max_scores": SQL_BLOCK_MAX_SCORES,
    "sparse_cosine_pairs": SQL_SPARSE_COSINE_PAIRS,
    "order_priority_check": SQL_ORDER_PRIORITY_CHECK,
    "shipmode_priority": SQL_SHIPMODE_PRIORITY,
    "cust_order_dist": SQL_CUST_ORDER_DIST,
    "small_qty_revenue": SQL_SMALL_QTY_REVENUE,
    "volume_shipping": SQL_VOLUME_SHIPPING,
    "pq_audit": SQL_PQ_AUDIT,
    "market_share": SQL_MARKET_SHARE,
    "disjunctive_revenue": SQL_DISJUNCTIVE_REVENUE,
    "forecast_revenue": SQL_FORECAST_REVENUE,
    "supplier_relation_count": SQL_SUPPLIER_RELATION_COUNT,
    "rank_correlation": SQL_RANK_CORRELATION,
    "markov_stationary": SQL_MARKOV_STATIONARY,
    "churn_hazard": SQL_CHURN_HAZARD,
    "hub_knockout": SQL_HUB_KNOCKOUT,
    "hard_negatives": SQL_HARD_NEGATIVES,
    "dedup_eval": SQL_DEDUP_EVAL,
    "lsh_transitivity": SQL_LSH_TRANSITIVITY,
    "path_trigrams": SQL_PATH_TRIGRAMS,
    "rollup_report": SQL_ROLLUP_REPORT,
    "pivot_report": SQL_PIVOT_REPORT,
    "simhash_bit_balance": SQL_SIMHASH_BIT_BALANCE,
    "expansion_agreement": SQL_EXPANSION_AGREEMENT,
    "srp_distortion": SQL_SRP_DISTORTION,
    "bm25f_topk": SQL_BM25F_TOPK,
    "skyline_frontier": SQL_SKYLINE_FRONTIER,
    "abc_analysis": SQL_ABC_ANALYSIS,
    "ann_recall": SQL_ANN_RECALL,
    "equidepth_histogram": SQL_EQUIDEPTH_HISTOGRAM,
    "group_percentiles": SQL_GROUP_PERCENTILES,
    "region_top_nations": SQL_REGION_TOP_NATIONS,
    "mad_outliers": SQL_MAD_OUTLIERS,
    "entropy_rate": SQL_ENTROPY_RATE,
    "ltr_features": SQL_LTR_FEATURES,
    "conversion_lag": SQL_CONVERSION_LAG,
    "global_transitivity": SQL_GLOBAL_TRANSITIVITY,
    "bowtie_structure": SQL_BOWTIE_STRUCTURE,
    "session_gap_sweep": SQL_SESSION_GAP_SWEEP,
    "negative_sampling": SQL_NEGATIVE_SAMPLING,
    "ucb_scores": SQL_UCB_SCORES,
    "ab_test_z": SQL_AB_TEST_Z,
    "rich_club": SQL_RICH_CLUB,
    "purchase_regularity": SQL_PURCHASE_REGULARITY,
    "label_modularity": SQL_LABEL_MODULARITY,
    "discount_elasticity": SQL_DISCOUNT_ELASTICITY,
    "fano_factor": SQL_FANO_FACTOR,
    "simpson_diversity": SQL_SIMPSON_DIVERSITY,
    "circadian_profile": SQL_CIRCADIAN_PROFILE,
    "reorder_interval": SQL_REORDER_INTERVAL,
    "char_entropy": SQL_CHAR_ENTROPY,
    "benford_audit": SQL_BENFORD_AUDIT,
    "traffic_autocorr": SQL_TRAFFIC_AUTOCORR,
    "monthly_seasonality": SQL_MONTHLY_SEASONALITY,
    "powerlaw_fit": SQL_POWERLAW_FIT,
    "contingency_chi2": SQL_CONTINGENCY_CHI2,
    "theil_decomposition": SQL_THEIL_DECOMPOSITION,
    "traffic_bursts": SQL_TRAFFIC_BURSTS,
    "kendall_tau": SQL_KENDALL_TAU,
    "ks_two_sample": SQL_KS_TWO_SAMPLE,
    "cusum_changepoint": SQL_CUSUM_CHANGEPOINT,
    "anova_dow": SQL_ANOVA_DOW,
    "runs_test": SQL_RUNS_TEST,
    "hill_tail_index": SQL_HILL_TAIL_INDEX,
    "mann_kendall": SQL_MANN_KENDALL,
    "mutual_information": SQL_MUTUAL_INFORMATION,
    "cohen_kappa": SQL_COHEN_KAPPA,
    "gumbel_maxima": SQL_GUMBEL_MAXIMA,
    "user_accumulation": SQL_USER_ACCUMULATION,
    "lorenz_deciles": SQL_LORENZ_DECILES,
    "mann_whitney": SQL_MANN_WHITNEY,
    "trimmed_stats": SQL_TRIMMED_STATS,
    "power_analysis": SQL_POWER_ANALYSIS,
    "unigram_perplexity": SQL_UNIGRAM_PERPLEXITY,
    "good_turing": SQL_GOOD_TURING,
    "anderson_darling": SQL_ANDERSON_DARLING,
    "pearson_residuals": SQL_PEARSON_RESIDUALS,
    "brown_forsythe": SQL_BROWN_FORSYTHE,
    "kruskal_wallis": SQL_KRUSKAL_WALLIS,
    "periodogram": SQL_PERIODOGRAM,
    "jarque_bera": SQL_JARQUE_BERA,
    "durbin_watson": SQL_DURBIN_WATSON,
    "theil_sen": SQL_THEIL_SEN,
    "pettitt_test": SQL_PETTITT_TEST,
    "grubbs_test": SQL_GRUBBS_TEST,
    "friedman_test": SQL_FRIEDMAN_TEST,
    "segment_migration": SQL_SEGMENT_MIGRATION,
    "brand_concentration": SQL_BRAND_CONCENTRATION,
    "max_concurrency": SQL_MAX_CONCURRENCY,
    "value_at_risk": SQL_VALUE_AT_RISK,
    "odds_ratio": SQL_ODDS_RATIO,
    "haar_energy": SQL_HAAR_ENERGY,
    "nb_dispersion": SQL_NB_DISPERSION,
    "degree_ccdf": SQL_DEGREE_CCDF,
    "logistic_step": SQL_LOGISTIC_STEP,
    "pca_power": SQL_PCA_POWER,
    "naive_bayes_lang": SQL_NAIVE_BAYES_LANG,
    "median_ci": SQL_MEDIAN_CI,
    "dedup_roc": SQL_DEDUP_ROC,
    "lognormal_sessions": SQL_LOGNORMAL_SESSIONS,
    "safety_stock": SQL_SAFETY_STOCK,
    "ewma_control": SQL_EWMA_CONTROL,
    "dedup_ap": SQL_DEDUP_AP,
    "jackknife_se": SQL_JACKKNIFE_SE,
    "fightin_words": SQL_FIGHTIN_WORDS,
    "k_anonymity": SQL_K_ANONYMITY,
    "l_diversity": SQL_L_DIVERSITY,
    "shapley_attribution": SQL_SHAPLEY_ATTRIBUTION,
    "threshold_algorithm": SQL_THRESHOLD_ALGORITHM,
    "encoding_audit": SQL_ENCODING_AUDIT,
    "bh_fdr": SQL_BH_FDR,
    "mase_backtest": SQL_MASE_BACKTEST,
    "rmst": SQL_RMST,
    "diff_in_diff": SQL_DIFF_IN_DIFF,
    "decision_stump": SQL_DECISION_STUMP,
    "gains_table": SQL_GAINS_TABLE,
    "ranking_auc": SQL_RANKING_AUC,
    "calibration_ece": SQL_CALIBRATION_ECE,
    "sprt_stop": SQL_SPRT_STOP,
    "eb_shrinkage": SQL_EB_SHRINKAGE,
    "neyman_allocation": SQL_NEYMAN_ALLOCATION,
    "kish_ess": SQL_KISH_ESS,
    "logrank_test": SQL_LOGRANK_TEST,
    "ipf_raking": SQL_IPF_RAKING,
    "edge_percolation": SQL_EDGE_PERCOLATION,
    "cuped_adjustment": SQL_CUPED_ADJUSTMENT,
    "offered_load": SQL_OFFERED_LOAD,
    "erlang_b": SQL_ERLANG_B,
    "cdc_chunking": SQL_CDC_CHUNKING,
    "session_burstiness": SQL_SESSION_BURSTINESS,
    "hurst_exponent": SQL_HURST_EXPONENT,
    "topk_churn": SQL_TOPK_CHURN,
    "pvm_bridge": SQL_PVM_BRIDGE,
    "order_backlog": SQL_ORDER_BACKLOG,
    "abc_xyz": SQL_ABC_XYZ,
    "source_similarity": SQL_SOURCE_SIMILARITY,
    "kingman_wait": SQL_KINGMAN_WAIT,
    "daily_mix_anomaly": SQL_DAILY_MIX_ANOMALY,
    "yule_k": SQL_YULE_K,
    "err_eval": SQL_ERR_EVAL,
    "pl2_topk": SQL_PL2_TOPK,
    "pacf_daily": SQL_PACF_DAILY,
    "salsa_scores": SQL_SALSA_SCORES,
    "croston_demand": SQL_CROSTON_DEMAND,
    "newsvendor": SQL_NEWSVENDOR,
    "mrr_eval": SQL_MRR_EVAL,
    "brown_smoothing": SQL_BROWN_SMOOTHING,
    "allan_variance": SQL_ALLAN_VARIANCE,
    "ef_vs_varint": SQL_EF_VS_VARINT,
    "witten_bell": SQL_WITTEN_BELL,
    "shannon_code": SQL_SHANNON_CODE,
    "label_centroids": SQL_LABEL_CENTROIDS,
    "ipw_estimate": SQL_IPW_ESTIMATE,
    "rice_param": SQL_RICE_PARAM,
    "hash_ring": SQL_HASH_RING,
    "first_position": SQL_FIRST_POSITION,
    "capture_recapture": SQL_CAPTURE_RECAPTURE,
    "coupon_collector": SQL_COUPON_COLLECTOR,
    "inspection_paradox": SQL_INSPECTION_PARADOX,
    "aipw_estimate": SQL_AIPW_ESTIMATE,
    "stack_distance": SQL_STACK_DISTANCE,
    "pivoted_topk": SQL_PIVOTED_TOPK,
    "embedding_nmi": SQL_EMBEDDING_NMI,
    "length_bias": SQL_LENGTH_BIAS,
    "rsj_weights": SQL_RSJ_WEIGHTS,
    "ship_lag_deciles": SQL_SHIP_LAG_DECILES,
    "hapax_profile": SQL_HAPAX_PROFILE,
    "butterfly_counts": SQL_BUTTERFLY_COUNTS,
    "price_indices": SQL_PRICE_INDICES,
    "minhash_calibration": SQL_MINHASH_CALIBRATION,
    "prefix_complete": SQL_PREFIX_COMPLETE,
    "cascade_overlap": SQL_CASCADE_OVERLAP,
    "link_reciprocity": SQL_LINK_RECIPROCITY,
    "simhash_fingerprints": SQL_SIMHASH_FINGERPRINTS,
    "simhash_near_dup": SQL_SIMHASH_NEAR_DUP,
    "embedding_knn": SQL_EMBEDDING_KNN,
    "embedding_near_dup": SQL_EMBEDDING_NEAR_DUP,
    "semantic_dedup": SQL_SEMANTIC_DEDUP,
    "ann_lsh_topk": SQL_ANN_LSH_TOPK,
    "language_id": SQL_LANGUAGE_ID,
    "token_counts": SQL_TOKEN_COUNTS,
    "winnow_fingerprints": SQL_WINNOW_FINGERPRINTS,
    "hll_distinct": SQL_HLL_DISTINCT,
    "cms_heavy_hitters": SQL_CMS_HEAVY_HITTERS,
    "length_quantiles": SQL_LENGTH_QUANTILES,
    "weighted_sample": SQL_WEIGHTED_SAMPLE,
    "binary_meta": SQL_BINARY_META,
    "media_resize": SQL_MEDIA_RESIZE,
    "media_frame_sample": SQL_MEDIA_FRAME_SAMPLE,
    "media_features": SQL_MEDIA_FEATURES,
    "spellcheck_candidates": SQL_SPELLCHECK_CANDIDATES,
    "degree_counts": SQL_DEGREE_COUNTS,
    "pagerank": SQL_PAGERANK,
    "hits_scores": SQL_HITS_SCORES,
    "word_source_merge": SQL_WORD_SOURCE_MERGE,
    "ann_ivf_topk": SQL_ANN_IVF_TOPK,
    "ann_ivf_trained": SQL_ANN_IVF_TRAINED,
    "event_sessions": SQL_EVENT_SESSIONS,
    "events_rollup": SQL_EVENTS_ROLLUP,
    "cohort_retention": SQL_COHORT_RETENTION,
    "triangle_counts": SQL_TRIANGLE_COUNTS,
    "cocitation_coupling": SQL_COCITATION_COUPLING,
    "graph_mixing": SQL_GRAPH_MIXING,
    "degree_correlation": SQL_DEGREE_CORRELATION,
    "personalized_pagerank": SQL_PERSONALIZED_PAGERANK,
    "label_propagation": SQL_LABEL_PROPAGATION,
    "k_core": SQL_K_CORE,
    "link_distance": SQL_LINK_DISTANCE,
    "rolling_active": SQL_ROLLING_ACTIVE,
    "event_gaps": SQL_EVENT_GAPS,
    "event_transitions": SQL_EVENT_TRANSITIONS,
    "cohort_overlap": SQL_COHORT_OVERLAP,
    "weekly_profile": SQL_WEEKLY_PROFILE,
    "user_streaks": SQL_USER_STREAKS,
    "event_funnel": SQL_EVENT_FUNNEL,
    "asof_join": SQL_ASOF_JOIN,
    "interval_join": SQL_INTERVAL_JOIN,
    "events_anomaly": SQL_EVENTS_ANOMALY,
    "bm25_topk": SQL_BM25_TOPK,
    "postings_bytes": SQL_POSTINGS_BYTES,
    "rank_fusion": SQL_RANK_FUSION,
    "search_snippets": SQL_SEARCH_SNIPPETS,
    "shard_balance": SQL_SHARD_BALANCE,
    "pricing_summary": SQL_PRICING_SUMMARY,
    "ship_priority": SQL_SHIP_PRIORITY,
    "nation_revenue": SQL_NATION_REVENUE,
    "returns_report": SQL_RETURNS_REPORT,
    "promo_share": SQL_PROMO_SHARE,
    "top_supplier": SQL_TOP_SUPPLIER,
    "order_gini": SQL_ORDER_GINI,
    "length_moments": SQL_LENGTH_MOMENTS,
    "market_basket": SQL_MARKET_BASKET,
    "props_extract": SQL_PROPS_EXTRACT,
    "bounce_rate": SQL_BOUNCE_RATE,
    "behavior_entropy": SQL_BEHAVIOR_ENTROPY,
    "chao1_vocab": SQL_CHAO1_VOCAB,
    "stylometry": SQL_STYLOMETRY,
    "term_burstiness": SQL_TERM_BURSTINESS,
    "ql_topk": SQL_QL_TOPK,
    "rank_overlap": SQL_RANK_OVERLAP,
    "value_histogram": SQL_VALUE_HISTOGRAM,
    "keyness_llr": SQL_KEYNESS_LLR,
    "lexical_diversity": SQL_LEXICAL_DIVERSITY,
    "rfm_segments": SQL_RFM_SEGMENTS,
    "dedup_components": SQL_DEDUP_COMPONENTS,
    "canonical_docs": SQL_CANONICAL_DOCS,
    "anchor_text": SQL_ANCHOR_TEXT,
    "prf_expansion": SQL_PRF_EXPANSION,
    "phrase_match": SQL_PHRASE_MATCH,
    "link_prediction": SQL_LINK_PREDICTION,
    "touch_attribution": SQL_TOUCH_ATTRIBUTION,
    "ndcg_eval": SQL_NDCG_EVAL,
    "large_orders": SQL_LARGE_ORDERS,
    "katz_centrality": SQL_KATZ_CENTRALITY,
    "cust_balance": SQL_CUST_BALANCE,
    "late_supplier": SQL_LATE_SUPPLIER,
    "proximity_rank": SQL_PROXIMITY_RANK,
    "mmr_rerank": SQL_MMR_RERANK,
}
