"""Similarity/dedup/embedding/media pairs: MinHash, SimHash, ANN, sketches, multimodal.

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
    MUT_OFFSET,
    ND_BANDS,
    ND_PLANES,
    TOKEN_RUN,
    WORD_RUN,
    _EMB_DIM,
    _mut_docs,
    _read,
    _shingle_cte,
    _srp_cte,
    _tf,
    _tf_cte,
)

MIN_LONG_SQL = "(-9223372036854775807 - 1)"


_MUT_DOCS_CTE = f"""
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {MUT_OFFSET}, substring(text, 31) FROM documents
  WHERE doc_id % 10 = 0
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
# PNG decode pair (r04, VERDICT task 7): the REAL stdlib PNG path — zlib
# IDAT inflate + filter reconstruction — through the distributed Arrow
# decode stage, paired against an import-time replay of the same pure
# decoder. Exercises the width/height parse, the CRC gate (a corrupt
# payload would fail the task, not this pair), and the shared dim-bin
# luminance feature space; the resize digest column proves the
# decode->nearest-neighbor->re-encode chain is byte-deterministic.
# --------------------------------------------------------------------------
N_MEDIA_PNG = 24
PNG_RESIZE_W, PNG_RESIZE_H = 10, 8


def q_media_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training_data.multimodal import (
        FEAT_DIM,
        decode_features,
        resize_images,
        synthesize_png,
    )

    media = spark.createDataFrame(
        [(i, synthesize_png(i)) for i in range(N_MEDIA_PNG)],
        "media_id long, payload binary",
    )
    feats = decode_features(media, dim=FEAT_DIM).select(
        "media_id",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.posexplode("feature").alias("pos", "x"),
    )
    resized = resize_images(media, PNG_RESIZE_W, PNG_RESIZE_H).select(
        "media_id", F.md5("payload").alias("digest")
    )
    return feats.join(resized, "media_id").select(
        "media_id",
        "width",
        "height",
        F.col("pos").cast("int").alias("pos"),
        # float32 widened to double is exact; the oracle replay applies
        # the same float32 quantization (struct.pack round trip)
        F.col("x").cast("double").alias("x"),
        "digest",
    )


def _media_png_oracle_sql() -> str:
    import hashlib
    import struct

    from .training_data.multimodal import (
        FEAT_DIM,
        _resize_png,
        decode_payload,
        synthesize_png,
    )

    def f32(v: float) -> float:
        return struct.unpack("f", struct.pack("f", v))[0]

    rows = []
    for mid in range(N_MEDIA_PNG):
        payload = synthesize_png(mid)
        width, height, _nf, feature = decode_payload(payload, FEAT_DIM)
        digest = hashlib.md5(
            _resize_png(payload, PNG_RESIZE_W, PNG_RESIZE_H)
        ).hexdigest()
        for pos, x in enumerate(feature):
            # value as a STRING literal: DuckDB routes bare numeric
            # literals through DECIMAL, perturbing the last bits
            # (invariant 1); VARCHAR -> DOUBLE parses shortest-repr exact
            rows.append(
                f"({mid}, {width}, {height}, {pos}, '{f32(x)!r}', "
                f"'{digest}')"
            )
    return f"""
SELECT CAST(media_id AS BIGINT) AS media_id,
       CAST(width AS INT) AS width, CAST(height AS INT) AS height,
       CAST(pos AS INT) AS pos, CAST(x AS DOUBLE) AS x, digest
FROM (VALUES {", ".join(rows)}) t(media_id, width, height, pos, x, digest)
"""


SQL_MEDIA_PNG = _media_png_oracle_sql()


# --------------------------------------------------------------------------
# GIF decode pair (r05, VERDICT task 4): the REAL stdlib GIF path —
# variable-width LZW decompression + color-table resolution — through the
# distributed Arrow decode stage, paired against an import-time replay of
# the same pure decoder. Same shape as media_png: the resize digest column
# proves the decode -> nearest-neighbor -> palette+LZW re-encode chain is
# byte-deterministic, and the feature columns ride the shared dim-bin
# luminance space.
# --------------------------------------------------------------------------
N_MEDIA_GIF = 24
GIF_RESIZE_W, GIF_RESIZE_H = 10, 8


def q_media_gif(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training_data.multimodal import (
        FEAT_DIM,
        decode_features,
        resize_images,
        synthesize_gif,
    )

    media = spark.createDataFrame(
        [(i, synthesize_gif(i)) for i in range(N_MEDIA_GIF)],
        "media_id long, payload binary",
    )
    feats = decode_features(media, dim=FEAT_DIM).select(
        "media_id",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.posexplode("feature").alias("pos", "x"),
    )
    resized = resize_images(media, GIF_RESIZE_W, GIF_RESIZE_H).select(
        "media_id", F.md5("payload").alias("digest")
    )
    return feats.join(resized, "media_id").select(
        "media_id",
        "width",
        "height",
        F.col("pos").cast("int").alias("pos"),
        # float32 widened to double is exact; the oracle replay applies
        # the same float32 quantization (struct.pack round trip)
        F.col("x").cast("double").alias("x"),
        "digest",
    )


def _media_gif_oracle_sql() -> str:
    import hashlib
    import struct

    from .training_data.multimodal import (
        FEAT_DIM,
        _resize_gif,
        decode_payload,
        synthesize_gif,
    )

    def f32(v: float) -> float:
        return struct.unpack("f", struct.pack("f", v))[0]

    rows = []
    for mid in range(N_MEDIA_GIF):
        payload = synthesize_gif(mid)
        width, height, _nf, feature = decode_payload(payload, FEAT_DIM)
        digest = hashlib.md5(
            _resize_gif(payload, GIF_RESIZE_W, GIF_RESIZE_H)
        ).hexdigest()
        for pos, x in enumerate(feature):
            # value as a STRING literal: DuckDB routes bare numeric
            # literals through DECIMAL, perturbing the last bits
            # (invariant 1); VARCHAR -> DOUBLE parses shortest-repr exact
            rows.append(
                f"({mid}, {width}, {height}, {pos}, '{f32(x)!r}', "
                f"'{digest}')"
            )
    return f"""
SELECT CAST(media_id AS BIGINT) AS media_id,
       CAST(width AS INT) AS width, CAST(height AS INT) AS height,
       CAST(pos AS INT) AS pos, CAST(x AS DOUBLE) AS x, digest
FROM (VALUES {", ".join(rows)}) t(media_id, width, height, pos, x, digest)
"""


SQL_MEDIA_GIF = _media_gif_oracle_sql()


# --------------------------------------------------------------------------
# JPEG decode pair (r05): the REAL stdlib baseline-JPEG path — Huffman
# entropy decode + dequantize + IDCT + YCbCr->RGB (training_data/jpeg.py)
# — through the distributed Arrow decode stage, paired against an
# import-time replay of the same pure decoder. Same shape as
# media_png/media_gif; JPEG is lossy but DETERMINISTIC, which is all the
# digest-replay identity needs.
# --------------------------------------------------------------------------
N_MEDIA_JPEG = 24
JPEG_RESIZE_W, JPEG_RESIZE_H = 10, 8


def q_media_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training_data.jpeg import synthesize_jpeg
    from .training_data.multimodal import FEAT_DIM, decode_features, resize_images

    media = spark.createDataFrame(
        [(i, synthesize_jpeg(i)) for i in range(N_MEDIA_JPEG)],
        "media_id long, payload binary",
    )
    feats = decode_features(media, dim=FEAT_DIM).select(
        "media_id",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.posexplode("feature").alias("pos", "x"),
    )
    resized = resize_images(media, JPEG_RESIZE_W, JPEG_RESIZE_H).select(
        "media_id", F.md5("payload").alias("digest")
    )
    return feats.join(resized, "media_id").select(
        "media_id",
        "width",
        "height",
        F.col("pos").cast("int").alias("pos"),
        # float32 widened to double is exact; the oracle replay applies
        # the same float32 quantization (struct.pack round trip)
        F.col("x").cast("double").alias("x"),
        "digest",
    )


def _media_jpeg_oracle_sql() -> str:
    import hashlib
    import struct

    from .training_data.jpeg import _resize_jpeg, synthesize_jpeg
    from .training_data.multimodal import FEAT_DIM, decode_payload

    def f32(v: float) -> float:
        return struct.unpack("f", struct.pack("f", v))[0]

    rows = []
    for mid in range(N_MEDIA_JPEG):
        payload = synthesize_jpeg(mid)
        width, height, _nf, feature = decode_payload(payload, FEAT_DIM)
        digest = hashlib.md5(
            _resize_jpeg(payload, JPEG_RESIZE_W, JPEG_RESIZE_H)
        ).hexdigest()
        for pos, x in enumerate(feature):
            # value as a STRING literal: DuckDB routes bare numeric
            # literals through DECIMAL, perturbing the last bits
            # (invariant 1); VARCHAR -> DOUBLE parses shortest-repr exact
            rows.append(
                f"({mid}, {width}, {height}, {pos}, '{f32(x)!r}', "
                f"'{digest}')"
            )
    return f"""
SELECT CAST(media_id AS BIGINT) AS media_id,
       CAST(width AS INT) AS width, CAST(height AS INT) AS height,
       CAST(pos AS INT) AS pos, CAST(x AS DOUBLE) AS x, digest
FROM (VALUES {", ".join(rows)}) t(media_id, width, height, pos, x, digest)
"""


SQL_MEDIA_JPEG = _media_jpeg_oracle_sql()


# --------------------------------------------------------------------------
# Animated-GIF frame sampling pair (r05): the temporal-media path for the
# one animation format decodable stdlib — full GIF89a compositing
# (partial frames, transparency, disposal) -> evenly-spaced frames
# re-encoded as deterministic PNG, through the distributed sample_frames
# stage vs an import-time replay of the same pure pipeline. Completes the
# media family: still images (PPM/PNG/GIF/JPEG decode+resize), audio
# windows (WAV), animation frames (GIF).
# --------------------------------------------------------------------------
N_MEDIA_GIF_ANIM = 12
GIF_ANIM_FRAMES = 7
GIF_ANIM_SAMPLES = 4


def q_media_gif_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training_data.multimodal import sample_frames, synthesize_gif_animation

    media = spark.createDataFrame(
        [
            (i, synthesize_gif_animation(i, n_frames=GIF_ANIM_FRAMES))
            for i in range(N_MEDIA_GIF_ANIM)
        ],
        "media_id long, payload binary",
    )
    out = sample_frames(media, n_samples=GIF_ANIM_SAMPLES)
    return out.select(
        "media_id",
        "sample_idx",
        "start_frame",
        "n_frames",
        F.md5("payload").alias("digest"),
    )


def _media_gif_frames_oracle_sql() -> str:
    import hashlib

    from .training_data.multimodal import (
        _sample_gif_frames,
        synthesize_gif_animation,
    )

    rows = []
    for i in range(N_MEDIA_GIF_ANIM):
        payload = synthesize_gif_animation(i, n_frames=GIF_ANIM_FRAMES)
        for k, (start, take, blob) in enumerate(
            _sample_gif_frames(payload, GIF_ANIM_SAMPLES)
        ):
            rows.append(
                f"({i}, {k}, {start}, {take}, "
                f"'{hashlib.md5(blob).hexdigest()}')"
            )
    return f"""
SELECT CAST(media_id AS BIGINT) AS media_id,
       CAST(sample_idx AS INT) AS sample_idx,
       CAST(start_frame AS BIGINT) AS start_frame,
       CAST(n_frames AS INT) AS n_frames, digest
FROM (VALUES {", ".join(rows)}) t(media_id, sample_idx, start_frame, n_frames, digest)
"""


SQL_MEDIA_GIF_FRAMES = _media_gif_frames_oracle_sql()


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
# Weighted Jaccard between source vocabularies: sum(min(c_a, c_b)) /
# sum(max(c_a, c_b)) over term counts — the frequency-aware companion
# to source_overlap (set Jaccard on shingles) and source_similarity
# (cosine): cosine rewards shared head terms, weighted Jaccard punishes
# mass imbalance. No outer join needed: sum(max) = total_a + total_b -
# sum(min), with sum(min) over the INNER term join only (absent terms
# contribute min 0) — one uniform-key join, all sums exact BIGINTs,
# one divide per pair, rounded 6.
# --------------------------------------------------------------------------
def q_weighted_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "source",
            F.explode(
                F.regexp_extract_all(
                    F.lower("text"), F.lit(WORD_RUN), F.lit(0)
                )
            ).alias("term"),
        )
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    totals = tf.groupBy("source").agg(
        F.sum("c").cast("long").alias("tot")
    )
    a = tf.select(
        F.col("source").alias("source_a"), "term", F.col("c").alias("ca")
    )
    b = tf.select(
        F.col("source").alias("source_b"),
        F.col("term").alias("termb"),
        F.col("c").alias("cb"),
    )
    smin = (
        a.join(
            b,
            (F.col("term") == F.col("termb"))
            & (F.col("source_a") < F.col("source_b")),
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.sum(F.least("ca", "cb")).cast("long").alias("smin"),
            F.count(F.lit(1)).cast("long").alias("shared_terms"),
        )
    )
    ta = totals.select(
        F.col("source").alias("source_a"), F.col("tot").alias("ta")
    )
    tb = totals.select(
        F.col("source").alias("source_b"), F.col("tot").alias("tb")
    )
    return (
        smin.join(F.broadcast(ta), "source_a")
        .join(F.broadcast(tb), "source_b")
        .select(
            "source_a",
            "source_b",
            "shared_terms",
            "smin",
            (F.col("ta") + F.col("tb") - F.col("smin"))
            .cast("long")
            .alias("smax"),
            F.round(
                F.col("smin").cast("double")
                / (F.col("ta") + F.col("tb") - F.col("smin")).cast(
                    "double"
                ),
                6,
            ).alias("weighted_jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


SQL_WEIGHTED_JACCARD = f"""
WITH tf AS (
  SELECT source, term, CAST(count(*) AS BIGINT) AS c
  FROM (
    SELECT source,
           unnest(regexp_extract_all(lower(text), '{WORD_RUN}')) AS term
    FROM documents
  ) GROUP BY source, term
),
totals AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS tot FROM tf GROUP BY source
),
smin AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(sum(least(a.c, b.c)) AS BIGINT) AS smin,
         CAST(count(*) AS BIGINT) AS shared_terms
  FROM tf a JOIN tf b ON a.term = b.term AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT s.source_a, s.source_b, s.shared_terms, s.smin,
       CAST(ta.tot + tb.tot - s.smin AS BIGINT) AS smax,
       round(CAST(s.smin AS DOUBLE)
             / CAST(ta.tot + tb.tot - s.smin AS DOUBLE), 6)
         AS weighted_jaccard
FROM smin s
JOIN totals ta ON ta.source = s.source_a
JOIN totals tb ON tb.source = s.source_b
ORDER BY source_a, source_b
"""


QUERIES = {
    "ann_ivf_topk": q_ann_ivf_topk,
    "ann_ivf_trained": q_ann_ivf_trained,
    "ann_lsh_topk": q_ann_lsh_topk,
    "ann_recall": q_ann_recall,
    "binary_meta": q_binary_meta,
    "boilerplate_shingles": q_boilerplate_shingles,
    "canonical_docs": q_canonical_docs,
    "cdc_chunking": q_cdc_chunking,
    "cluster_quality": q_cluster_quality,
    "cms_heavy_hitters": q_cms_heavy_hitters,
    "containment_pairs": q_containment_pairs,
    "dedup_ap": q_dedup_ap,
    "dedup_components": q_dedup_components,
    "dedup_eval": q_dedup_eval,
    "dedup_roc": q_dedup_roc,
    "embedding_diversity": q_embedding_diversity,
    "embedding_knn": q_embedding_knn,
    "embedding_near_dup": q_embedding_near_dup,
    "embedding_nmi": q_embedding_nmi,
    "hll_distinct": q_hll_distinct,
    "label_centroids": q_label_centroids,
    "lsh_transitivity": q_lsh_transitivity,
    "media_features": q_media_features,
    "media_png": q_media_png,
    "media_gif": q_media_gif,
    "media_jpeg": q_media_jpeg,
    "media_gif_frames": q_media_gif_frames,
    "media_frame_sample": q_media_frame_sample,
    "media_resize": q_media_resize,
    "minhash_calibration": q_minhash_calibration,
    "minhash_lsh_pairs": q_minhash_lsh_pairs,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "pca_power": q_pca_power,
    "pq_audit": q_pq_audit,
    "semantic_dedup": q_semantic_dedup,
    "simhash_bit_balance": q_simhash_bit_balance,
    "simhash_fingerprints": q_simhash_fingerprints,
    "simhash_near_dup": q_simhash_near_dup,
    "source_similarity": q_source_similarity,
    "sparse_cosine_pairs": q_sparse_cosine_pairs,
    "sq8_quantization": q_sq8_quantization,
    "srp_distortion": q_srp_distortion,
    "weighted_jaccard": q_weighted_jaccard,
    "winnow_fingerprints": q_winnow_fingerprints,
}

ORACLES = {
    "ann_ivf_topk": SQL_ANN_IVF_TOPK,
    "ann_ivf_trained": SQL_ANN_IVF_TRAINED,
    "ann_lsh_topk": SQL_ANN_LSH_TOPK,
    "ann_recall": SQL_ANN_RECALL,
    "binary_meta": SQL_BINARY_META,
    "boilerplate_shingles": SQL_BOILERPLATE_SHINGLES,
    "canonical_docs": SQL_CANONICAL_DOCS,
    "cdc_chunking": SQL_CDC_CHUNKING,
    "cluster_quality": SQL_CLUSTER_QUALITY,
    "cms_heavy_hitters": SQL_CMS_HEAVY_HITTERS,
    "containment_pairs": SQL_CONTAINMENT_PAIRS,
    "dedup_ap": SQL_DEDUP_AP,
    "dedup_components": SQL_DEDUP_COMPONENTS,
    "dedup_eval": SQL_DEDUP_EVAL,
    "dedup_roc": SQL_DEDUP_ROC,
    "embedding_diversity": SQL_EMBEDDING_DIVERSITY,
    "embedding_knn": SQL_EMBEDDING_KNN,
    "embedding_near_dup": SQL_EMBEDDING_NEAR_DUP,
    "embedding_nmi": SQL_EMBEDDING_NMI,
    "hll_distinct": SQL_HLL_DISTINCT,
    "label_centroids": SQL_LABEL_CENTROIDS,
    "lsh_transitivity": SQL_LSH_TRANSITIVITY,
    "media_features": SQL_MEDIA_FEATURES,
    "media_png": SQL_MEDIA_PNG,
    "media_gif": SQL_MEDIA_GIF,
    "media_jpeg": SQL_MEDIA_JPEG,
    "media_gif_frames": SQL_MEDIA_GIF_FRAMES,
    "media_frame_sample": SQL_MEDIA_FRAME_SAMPLE,
    "media_resize": SQL_MEDIA_RESIZE,
    "minhash_calibration": SQL_MINHASH_CALIBRATION,
    "minhash_lsh_pairs": SQL_MINHASH_LSH_PAIRS,
    "ngram_jaccard_pairs": SQL_NGRAM_JACCARD_PAIRS,
    "pca_power": SQL_PCA_POWER,
    "pq_audit": SQL_PQ_AUDIT,
    "semantic_dedup": SQL_SEMANTIC_DEDUP,
    "simhash_bit_balance": SQL_SIMHASH_BIT_BALANCE,
    "simhash_fingerprints": SQL_SIMHASH_FINGERPRINTS,
    "simhash_near_dup": SQL_SIMHASH_NEAR_DUP,
    "source_similarity": SQL_SOURCE_SIMILARITY,
    "sparse_cosine_pairs": SQL_SPARSE_COSINE_PAIRS,
    "sq8_quantization": SQL_SQ8_QUANTIZATION,
    "srp_distortion": SQL_SRP_DISTORTION,
    "weighted_jaccard": SQL_WEIGHTED_JACCARD,
    "winnow_fingerprints": SQL_WINNOW_FINGERPRINTS,
}
