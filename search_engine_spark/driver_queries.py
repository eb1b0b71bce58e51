"""Paired (Spark DataFrame, DuckDB oracle SQL) query definitions.

Each entry exercises one operator family from SURVEY.md §2 over the driver's
read-only parquet tables (documents / events / embeddings / TPC-H-ish). The
Spark callable and the SQL string are written side by side so column names,
rounding, and semantics stay aligned — the driver hashes values order-
insensitively after sorting columns by name, so every computed column is
aliased identically in both.

Notes on portability between engines:
- natural log in both (Spark ``log`` / DuckDB ``ln``); doubles are rounded to
  6 decimals wherever a transcendental could differ in the last ulp.
- the token regex ``[a-z0-9]{2,}`` over lowercased text is the reference
  tokenizer's \\b[a-zA-Z0-9]{2,}\\b (maximal alnum runs >= 2 chars).
- stopwords: the frozen NLTK list; apostrophe-bearing entries can never match
  the regex so both sides filter with the apostrophe-free subset.
- stemming is NOT applied here (DuckDB cannot Porter-stem): these are the
  SQL-expressible variants; stemmed-path parity is covered by pytest vs the
  pure-Python oracle (FIXTURES.md §4).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pair_helpers import doc_frequencies, scalar_count, sum_fixed6
from .stopwords import STOPWORDS

# stopwords that the token regex could actually produce
SQL_STOPWORDS = sorted(w for w in STOPWORDS if "'" not in w)
_SQL_STOPWORD_LIST = ", ".join(f"'{w}'" for w in SQL_STOPWORDS)

TOKEN_RUN = "[a-z0-9]{2,}"
WORD_RUN = "[a-z]{2,32}"  # spellcheck word regex (spellcheck_dictionary.py:129)

# fixed literal used for the query-scoring demo (present in the synthetic
# vocabulary of the driver's documents table)
QUERY_TERMS = ["spark", "data", "query"]
_SQL_QUERY_TERMS = ", ".join(f"'{t}'" for t in QUERY_TERMS)

FIXED_NOW_SQL = "TIMESTAMP '2026-03-01 00:00:00'"


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def _tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> (doc_id, term) one row per token occurrence."""
    docs = _read(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RUN), F.lit(0))
        ).alias("term"),
    ).filter(~F.col("term").isin(SQL_STOPWORDS))


# (a plain subquery filter, not QUALIFY — DuckDB QUALIFY needs a window)
_TOKS_CTE = f"""
toks AS (
  SELECT * FROM (
    SELECT doc_id,
           unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term
    FROM documents
  ) WHERE term NOT IN ({_SQL_STOPWORD_LIST})
)
"""


# --------------------------------------------------------------------------
# A1 — corpus statistics
# --------------------------------------------------------------------------
def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AVG doc length + doc count (bm25_stats.py:9-12 analog)."""
    docs = _read(spark, sf_dir, "documents")
    wc = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return docs.agg(
        F.round(F.avg(wc.cast("double")), 6).alias("avg_doc_len"),
        F.count(F.lit(1)).alias("doc_total"),
    )


SQL_CORPUS_STATS = r"""
SELECT round(avg(len(regexp_split_to_array(trim(text), '\s+'))::DOUBLE), 6) AS avg_doc_len,
       count(*) AS doc_total
FROM documents
"""


# --------------------------------------------------------------------------
# A2 — per-term DF / CTF / BM25 idf
# --------------------------------------------------------------------------
def q_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY term: df, ctf, LN((N-df+.5)/(df+.5)+1) (bm25_stats.py:16-27).

    Skew-free two-phase distinct (invariant 6) + N computed in-plan as a
    broadcast scalar (no driver-side pre-count pass)."""
    docs = _read(spark, sf_dir, "documents")
    toks = _tokens(spark, sf_dir)
    dfd = F.col("doc_frequency").cast("double")
    return (
        doc_frequencies(toks, with_ctf=True)
        .crossJoin(F.broadcast(scalar_count(docs)))
        .withColumn(
            "idf",
            F.round(F.log((F.col("_n") - dfd + 0.5) / (dfd + 0.5) + 1.0), 6),
        )
        .select("term", "doc_frequency", "ctf", "idf")
    )


SQL_TERM_STATS = f"""
WITH {_TOKS_CTE},
n AS (SELECT count(*)::DOUBLE AS n FROM documents)
SELECT term,
       count(DISTINCT doc_id) AS doc_frequency,
       count(*) AS ctf,
       round(ln((n.n - count(DISTINCT doc_id) + 0.5) / (count(DISTINCT doc_id) + 0.5) + 1.0), 6) AS idf
FROM toks, n
GROUP BY term, n.n
"""


# --------------------------------------------------------------------------
# A3 + T1 + J1/J2/J3 — candidate scoring + top-k with tie-break (flagship)
# --------------------------------------------------------------------------
def q_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tf*idf scoring agg for a literal query, top-20 by (score desc, doc asc)
    (SEARCH_SQL shape, search_service.py:13-40; single field, weight 1.0).

    Stats via the two-phase distinct restricted to the query terms (the term
    filter prunes BEFORE the distinct); N in-plan as a broadcast scalar.
    ``matched_terms`` is a plain count: tf rows are unique per (doc, term)."""
    docs = _read(spark, sf_dir, "documents")
    qtoks = _tokens(spark, sf_dir).filter(F.col("term").isin(QUERY_TERMS))
    tf = qtoks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfd = F.col("doc_frequency").cast("double")
    stats = (
        doc_frequencies(qtoks)
        .crossJoin(F.broadcast(scalar_count(docs)))
        .withColumn(
            "idf", F.log((F.col("_n") - dfd + 0.5) / (dfd + 0.5) + 1.0)
        )
        .select("term", "idf")
    )
    return (
        tf.join(F.broadcast(stats), "term", "left")
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(F.col("tf").cast("double") * F.coalesce("idf", F.lit(1.0))), 6
            ).alias("token_score"),
            F.count(F.lit(1)).alias("matched_terms"),
        )
        .orderBy(F.desc("token_score"), F.asc("doc_id"))
        .limit(20)
    )


SQL_SEARCH_TOPK = f"""
WITH {_TOKS_CTE},
n AS (SELECT count(*)::DOUBLE AS n FROM documents),
stats AS (
  SELECT term,
         ln((n.n - count(DISTINCT doc_id) + 0.5) / (count(DISTINCT doc_id) + 0.5) + 1.0) AS idf
  FROM toks, n GROUP BY term, n.n
),
tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM toks WHERE term IN ({_SQL_QUERY_TERMS})
  GROUP BY doc_id, term
)
SELECT tf.doc_id,
       round(sum(tf.tf::DOUBLE * COALESCE(stats.idf, 1.0)), 6) AS token_score,
       count(DISTINCT tf.term) AS matched_terms
FROM tf LEFT JOIN stats ON stats.term = tf.term
GROUP BY tf.doc_id
ORDER BY token_score DESC, tf.doc_id ASC
LIMIT 20
"""


# --------------------------------------------------------------------------
# Fallback reduced-scoring search (search_service.py:42-66 FALLBACK_SEARCH_SQL
# + :321-338 reduced re-rank) — the one reference query shape that had no
# twin. The Postgres trigger (CharacterNotInRepertoire on client decode)
# cannot occur in Spark, but the SHAPE is modeled: full field-weighted
# (3.2/1.7/1.0) tf*idf scoring projected down to (score, matched_terms),
# then the reduced formula log1p(score)*12 + matched/total*25 + 40-if-all.
# Fields are synthesized by deterministic text spans (title = chars 1-40,
# description = 41-100, content = rest) identically on both engines.
# doc_id is kept in the output purely as the deterministic tie-break (the
# reference emits blank rows because its strings failed to decode; an
# integer id has no such problem and makes the LIMIT cut order-stable).
# Every float reduction is a FIXED-ORDER expression (field pivot, then
# term pivot), never an order-unspecified SUM (invariant 4).
# --------------------------------------------------------------------------
FIELD_SPANS = [(1, 1, 40), (2, 41, 60), (4, 101, None)]  # (field, start, len)
FALLBACK_TOTAL_TERMS = len(QUERY_TERMS)


def q_fallback_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    parts = []
    for fid, start, length in FIELD_SPANS:
        span = (
            F.substring("text", start, length)
            if length is not None
            else F.expr(f"substring(text, {start})")
        )
        parts.append(
            docs.select(
                "doc_id",
                F.lit(fid).alias("field"),
                F.explode(
                    F.regexp_extract_all(F.lower(span), F.lit(TOKEN_RUN), F.lit(0))
                ).alias("term"),
            )
        )
    ftoks = parts[0].unionByName(parts[1]).unionByName(parts[2])
    qtoks = ftoks.filter(F.col("term").isin(QUERY_TERMS))

    # per-(doc, term): per-field counts pivoted into columns so the
    # 3.2/1.7/1.0 weighting is one fixed-order expression
    per_term = qtoks.groupBy("doc_id", "term").agg(
        F.sum(F.when(F.col("field") == 1, 1).otherwise(0)).alias("f1"),
        F.sum(F.when(F.col("field") == 2, 1).otherwise(0)).alias("f2"),
        F.sum(F.when(F.col("field") == 4, 1).otherwise(0)).alias("f4"),
    )
    wsum = (
        F.col("f1").cast("double") * 3.2
        + F.col("f2").cast("double") * 1.7
        + F.col("f4").cast("double") * 1.0
    )

    dfd = F.col("doc_frequency").cast("double")
    stats = (
        doc_frequencies(qtoks.select("term", "doc_id"))
        .crossJoin(F.broadcast(scalar_count(docs)))
        .withColumn("idf", F.log((F.col("_n") - dfd + 0.5) / (dfd + 0.5) + 1.0))
        .select("term", "idf")
    )
    contrib = wsum * F.coalesce("idf", F.lit(1.0))
    # term pivot: one conditional sum per literal query term (each sums
    # exactly one row), re-added in fixed order
    term_cols = [
        F.sum(F.when(F.col("term") == t, contrib).otherwise(0.0)).alias(f"_c{i}")
        for i, t in enumerate(QUERY_TERMS)
    ]
    agg = (
        per_term.join(F.broadcast(stats), "term", "left")
        .groupBy("doc_id")
        .agg(*term_cols, F.count(F.lit(1)).alias("matched_terms"))
    )
    token_score = F.col("_c0") + F.col("_c1") + F.col("_c2")
    md = F.col("matched_terms").cast("double")
    fallback = (
        F.log1p(F.greatest(token_score, F.lit(0.0))) * 12.0
        + md / FALLBACK_TOTAL_TERMS * 25.0
        + F.when(F.col("matched_terms") == FALLBACK_TOTAL_TERMS, 40.0).otherwise(0.0)
    )
    return (
        agg.select(
            "doc_id",
            F.round(fallback, 6).alias("fallback_score"),
            "matched_terms",
        )
        .orderBy(F.desc("fallback_score"), F.asc("doc_id"))
        .limit(20)
    )


def _fallback_sql() -> str:
    spans = []
    for fid, start, length in FIELD_SPANS:
        expr = (
            f"substring(text, {start}, {length})"
            if length is not None
            else f"substring(text, {start})"
        )
        spans.append(
            f"SELECT doc_id, {fid} AS field, "
            f"unnest(regexp_extract_all(lower({expr}), '{TOKEN_RUN}')) AS term "
            f"FROM documents"
        )
    union = " UNION ALL ".join(spans)
    terms = ", ".join(f"'{t}'" for t in QUERY_TERMS)
    cs = ", ".join(
        f"sum(CASE WHEN term = '{t}' THEN contrib ELSE 0.0 END) AS _c{i}"
        for i, t in enumerate(QUERY_TERMS)
    )
    return f"""
WITH ftoks AS ({union}),
qtoks AS (SELECT * FROM ftoks WHERE term IN ({terms})),
n AS (SELECT count(*)::DOUBLE AS n FROM documents),
per_term AS (
  SELECT doc_id, term,
         sum(CASE WHEN field = 1 THEN 1 ELSE 0 END) AS f1,
         sum(CASE WHEN field = 2 THEN 1 ELSE 0 END) AS f2,
         sum(CASE WHEN field = 4 THEN 1 ELSE 0 END) AS f4
  FROM qtoks GROUP BY doc_id, term
),
stats AS (
  SELECT term,
         ln((n.n - count(DISTINCT doc_id) + 0.5) / (count(DISTINCT doc_id) + 0.5) + 1.0) AS idf
  FROM qtoks, n GROUP BY term, n.n
),
scored AS (
  SELECT p.doc_id, p.term,
         (p.f1::DOUBLE * 3.2 + p.f2::DOUBLE * 1.7 + p.f4::DOUBLE * 1.0)
           * COALESCE(s.idf, 1.0) AS contrib
  FROM per_term p LEFT JOIN stats s ON s.term = p.term
),
agg AS (
  SELECT doc_id, {cs}, count(*) AS matched_terms
  FROM scored GROUP BY doc_id
)
SELECT doc_id,
       round(ln(1 + greatest(_c0 + _c1 + _c2, 0.0)) * 12.0
             + matched_terms::DOUBLE / {FALLBACK_TOTAL_TERMS} * 25.0
             + CASE WHEN matched_terms = {FALLBACK_TOTAL_TERMS} THEN 40.0 ELSE 0.0 END,
             6) AS fallback_score,
       matched_terms
FROM agg
ORDER BY fallback_score DESC, doc_id ASC
LIMIT 20
"""


SQL_FALLBACK_SEARCH = _fallback_sql()


# --------------------------------------------------------------------------
# U7 — exact dedup via content hashing (sha256, keep min doc per hash)
# --------------------------------------------------------------------------
def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _read(spark, sf_dir, "documents")
    w = Window.partitionBy("content_sha256").orderBy(F.asc("doc_id"))
    return (
        docs.withColumn("content_sha256", F.sha2(F.col("text"), 256))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "content_sha256")
    )


SQL_EXACT_DEDUP = """
SELECT doc_id, content_sha256 FROM (
  SELECT doc_id,
         sha256(text) AS content_sha256,
         row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
  FROM documents
) WHERE rn = 1
"""


# --------------------------------------------------------------------------
# E11 — quality score (worker.py:146-152; links synthesized as doc_id % 30)
# --------------------------------------------------------------------------
def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    wc = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("double")
    n_links = (F.col("doc_id") % 30).cast("double")
    density = F.least(F.lit(1.0), wc / 300.0)
    penalty = F.least(F.lit(0.4), n_links / wc)
    quality = F.when(wc == 0, 0.0).otherwise(F.greatest(F.lit(0.0), density - penalty))
    return docs.select("doc_id", F.round(quality, 6).alias("quality_score"))


SQL_QUALITY_SCORES = r"""
SELECT doc_id,
       round(CASE WHEN wc = 0 THEN 0.0
            ELSE greatest(0.0, least(1.0, wc / 300.0) - least(0.4, (doc_id % 30) / wc))
       END, 6) AS quality_score
FROM (
  SELECT doc_id, len(regexp_split_to_array(trim(text), '\s+'))::DOUBLE AS wc
  FROM documents
)
"""


# --------------------------------------------------------------------------
# E12 — freshness score over events.ts (worker.py:154-159 semantics)
# --------------------------------------------------------------------------
def q_freshness_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    now = F.to_timestamp(F.lit("2026-03-01 00:00:00"))
    days = F.floor(
        (F.unix_timestamp(now) - F.unix_timestamp(F.col("ts"))) / 86400
    ).cast("double")
    fresh = F.when(F.col("ts").isNull(), 0.1).otherwise(
        F.greatest(F.lit(0.0), 1.0 - F.least(F.lit(365.0), days) / 365.0)
    )
    return events.select("event_id", F.round(fresh, 6).alias("freshness_score"))


SQL_FRESHNESS_SCORES = f"""
SELECT event_id,
       round(CASE WHEN ts IS NULL THEN 0.1
            ELSE greatest(0.0, 1.0 - least(365.0, floor((epoch({FIXED_NOW_SQL}) - epoch(ts)) / 86400)::DOUBLE) / 365.0)
       END, 6) AS freshness_score
FROM events
"""


# --------------------------------------------------------------------------
# J4 + U2 — link resolution join + DISTINCT (link_graph_builder.py:10-18);
# edges synthesized deterministically: i -> (i*7+13) % N
# --------------------------------------------------------------------------
def q_link_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents").select("doc_id")
    n_df = scalar_count(docs, as_double=False)
    edges = docs.crossJoin(F.broadcast(n_df)).select(
        F.col("doc_id").alias("source_doc_id"),
        ((F.col("doc_id") * 7 + 13) % F.col("_n")).alias("target_doc_id"),
    )
    resolved = (
        edges.join(
            docs.withColumnRenamed("doc_id", "target_doc_id"),
            "target_doc_id",
            "inner",
        )
        .filter(F.col("source_doc_id") != F.col("target_doc_id"))
        .select("source_doc_id", "target_doc_id")
        .distinct()
    )
    return resolved


SQL_LINK_RESOLVE = """
WITH n AS (SELECT count(*) AS n FROM documents),
edges AS (
  SELECT doc_id AS source_doc_id, (doc_id * 7 + 13) % n.n AS target_doc_id
  FROM documents, n
)
SELECT DISTINCT e.source_doc_id, e.target_doc_id
FROM edges e
JOIN documents d ON d.doc_id = e.target_doc_id
WHERE e.source_doc_id <> e.target_doc_id
"""


# --------------------------------------------------------------------------
# A5 + A6 — spellcheck word corpus + popularity score
# --------------------------------------------------------------------------
def q_spellcheck_dictionary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regex word mining + log1p popularity (spellcheck_dictionary.py:124-147,
    engine.py:103-108; external_frequency = 0 here)."""
    docs = _read(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(WORD_RUN), F.lit(0))
        ).alias("word"),
    )
    agg = doc_frequencies(words, key="word", with_ctf=True, ctf_alias="total_frequency")
    pop = (
        F.log1p(F.col("doc_frequency").cast("double")) * 4.0
        + F.log1p(F.col("total_frequency").cast("double")) * 2.0
    )
    return agg.select(
        "word",
        "doc_frequency",
        "total_frequency",
        F.round(pop, 6).alias("popularity_score"),
    )


SQL_SPELLCHECK_DICTIONARY = f"""
SELECT word,
       count(DISTINCT doc_id) AS doc_frequency,
       count(*) AS total_frequency,
       round(ln(1 + count(DISTINCT doc_id)) * 4.0 + ln(1 + count(*)) * 2.0, 6) AS popularity_score
FROM (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{WORD_RUN}')) AS word
  FROM documents
)
GROUP BY word
"""


# --------------------------------------------------------------------------
# U1 + J9 — UNION ALL of word sources then re-aggregate
# --------------------------------------------------------------------------
def q_union_word_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """words from documents.text UNION ALL words from events.props,
    re-summed per word (spellcheck_dictionary.py:124-147 shape)."""
    docs = _read(spark, sf_dir, "documents")
    events = _read(spark, sf_dir, "events")
    w1 = docs.select(
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(WORD_RUN), F.lit(0))
        ).alias("word")
    )
    w2 = events.select(
        F.explode(
            F.regexp_extract_all(F.lower("props"), F.lit(WORD_RUN), F.lit(0))
        ).alias("word")
    )
    return (
        w1.unionByName(w2)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("total_frequency"))
    )


SQL_UNION_WORD_SOURCES = f"""
SELECT word, count(*) AS total_frequency FROM (
  SELECT unnest(regexp_extract_all(lower(text), '{WORD_RUN}')) AS word FROM documents
  UNION ALL
  SELECT unnest(regexp_extract_all(lower(props), '{WORD_RUN}')) AS word FROM events
)
GROUP BY word
"""


# --------------------------------------------------------------------------
# W-analog — hourly tumbling aggregation over events (micro-batch shape)
# --------------------------------------------------------------------------
def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    # ts is TIMESTAMP_NTZ; date_trunc hops through the session timezone, so
    # cast back to NTZ to stay wall-clock-identical under ANY driver session
    # tz (the oracle's date_trunc is tz-less)
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz").alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # integer-scaled exact sum (invariant 4): aggregation order can
            # never flip the 6-decimal rounding
            sum_fixed6("value", "sum_value"),
        )
    )


SQL_EVENTS_HOURLY = """
SELECT date_trunc('hour', ts) AS hour,
       event_type,
       count(*) AS n_events,
       round(sum(CAST(round(value * 1000000.0) AS BIGINT)) / 1000000.0, 6) AS sum_value
FROM events
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# ANN baseline — brute-force cosine top-k over embeddings
# --------------------------------------------------------------------------
def q_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """top-20 nearest neighbors of vec_id=0 by cosine, double math both sides."""
    emb = _read(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    qlit = F.array(*[F.lit(float(x)) for x in qvec])
    e = F.col("embedding").cast("array<double>")
    dot = F.aggregate(
        F.zip_with(e, qlit, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm_e = F.sqrt(F.aggregate(e, F.lit(0.0), lambda acc, x: acc + x * x))
    qnorm = float(sum(float(x) * float(x) for x in qvec)) ** 0.5
    cos = dot / (norm_e * F.lit(qnorm))
    return (
        emb.filter(F.col("vec_id") != 0)
        .select("vec_id", F.round(cos, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(20)
    )


SQL_SIMILARITY_TOPK = """
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id,
         list_sum(list_transform(list_zip(e.embedding::DOUBLE[], q.qv), p -> p[1] * p[2]))
           / (sqrt(list_sum(list_transform(e.embedding::DOUBLE[], x -> x * x)))
              * sqrt(list_sum(list_transform(q.qv, x -> x * x)))) AS cosine
  FROM embeddings e, q
  WHERE e.vec_id <> 0
)
SELECT vec_id, round(cosine, 6) AS cosine
FROM scored
ORDER BY cosine DESC, vec_id ASC
LIMIT 20
"""


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------
QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "corpus_stats": q_corpus_stats,
    "term_stats": q_term_stats,
    "search_topk": q_search_topk,
    "fallback_search": q_fallback_search,
    "exact_dedup": q_exact_dedup,
    "quality_scores": q_quality_scores,
    "freshness_scores": q_freshness_scores,
    "link_resolve": q_link_resolve,
    "spellcheck_dictionary": q_spellcheck_dictionary,
    "union_word_sources": q_union_word_sources,
    "events_hourly": q_events_hourly,
    "similarity_topk": q_similarity_topk,
}

ORACLES: dict[str, str] = {
    "corpus_stats": SQL_CORPUS_STATS,
    "term_stats": SQL_TERM_STATS,
    "search_topk": SQL_SEARCH_TOPK,
    "fallback_search": SQL_FALLBACK_SEARCH,
    "exact_dedup": SQL_EXACT_DEDUP,
    "quality_scores": SQL_QUALITY_SCORES,
    "freshness_scores": SQL_FRESHNESS_SCORES,
    "link_resolve": SQL_LINK_RESOLVE,
    "spellcheck_dictionary": SQL_SPELLCHECK_DICTIONARY,
    "union_word_sources": SQL_UNION_WORD_SOURCES,
    "events_hourly": SQL_EVENTS_HOURLY,
    "similarity_topk": SQL_SIMILARITY_TOPK,
}

# training-data pipeline pairs (dedup / similarity / text analysis /
# multimodal / graph) live in driver_queries_td to keep this module
# readable; the news-ingest domain pairs live in driver_queries_news
from .driver_queries_curation import ORACLES_CUR, QUERIES_CUR  # noqa: E402
from .driver_queries_news import ORACLES_NEWS, QUERIES_NEWS  # noqa: E402
from .driver_queries_td import ORACLES_TD, QUERIES_TD  # noqa: E402

def _merge_disjoint(dst: dict, src: dict, what: str) -> None:
    # a duplicate pair name across modules silently shadows one side's
    # definition (the oracle can come from one module and the Spark
    # callable from another) — fail loudly at import instead
    clash = dst.keys() & src.keys()
    if clash:
        raise ValueError(f"duplicate {what} pair names across modules: {sorted(clash)}")
    dst.update(src)


for _q, _o, _tag in (
    (QUERIES_TD, ORACLES_TD, "td"),
    (QUERIES_NEWS, ORACLES_NEWS, "news"),
    (QUERIES_CUR, ORACLES_CUR, "curation"),
):
    _merge_disjoint(QUERIES, _q, _tag)
    _merge_disjoint(ORACLES, _o, _tag)
