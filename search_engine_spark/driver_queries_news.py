"""News-domain (Spark, DuckDB-oracle) query pairs.

Three pairs close the news-ingest coverage gap (VERDICT r01 item 5):

- ``rfc2822_parse`` (E6): RFC-2822 date strings are GENERATED identically
  on both engines from events.ts via tz-free field formatting, then parsed
  by ``email.utils.parsedate_to_datetime`` (the reference's own function,
  ``news_fetcher.py:26-35``) on the Spark side vs DuckDB's C ``strptime``
  ``%z`` on the oracle side — a genuine two-engine cross-check of the
  parse semantics including non-trivial utc offsets.
- ``news_feed_freshness`` (A9): the REAL feed-parse pipeline (XML fixtures
  -> mapInPandas parse -> relational greatest/max aggregate,
  ``news_fetcher.py:190-195``). The oracle replays the pure-Python parser
  driver-side at import time and embeds the per-item rows as a VALUES
  literal, then performs the same aggregation in SQL — so the pair proves
  the distributed plumbing (Arrow schema, grouping, null handling) matches
  the sequential semantics exactly.
- ``news_scoring`` (J6/A4, re-registered): flat tf*idf news search
  (``NEWS_SEARCH_SQL``, search_service.py:68-100) over articles produced
  by the real parse pipeline (replacing the r01 ``source='src0'``
  stand-in), idf from the shared web-corpus term statistics, ordered by
  (token_score DESC, url ASC) as the reference does.

All instants are BIGINT epoch seconds end to end (invariant 3: no
timestamp serialization, no session-tz sensitivity).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .news.feeds import feed_last_published, parse_feed, parse_feed_metadata, parse_feeds
from .news.fixtures import OFFSETS, synth_feeds
from .pair_helpers import doc_frequencies, scalar_count

TOKEN_RUN = "[a-z0-9]{2,}"
NEWS_QUERY_TERMS = ["spark", "data", "query"]

_DOW = ["Sun", "Mon", "Tue", "Wed", "Thu", "Fri", "Sat"]  # F.dayofweek: 1=Sun
_MON = [
    "Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec",
]


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


# --------------------------------------------------------------------------
# E6 — RFC-2822 date parse
# --------------------------------------------------------------------------
@pandas_udf(T.LongType())
def _rfc2822_epoch_udf(s: pd.Series) -> pd.Series:
    from .news.feeds import parse_datetime_rfc2822

    def to_epoch(v):
        dt = parse_datetime_rfc2822(v)
        return None if dt is None else int(dt.timestamp())

    return s.map(to_epoch)


def q_rfc2822_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts -> 'Mon, 15 Jan 2024 10:30:00 +0530'-style strings (tz-free
    field formatting on the NTZ value, rotating offsets) -> parsed back to
    absolute epoch seconds with the reference's parser."""
    events = _read(spark, sf_dir, "events")
    ts = F.col("ts")
    dow = F.element_at(F.array(*[F.lit(d) for d in _DOW]), F.dayofweek(F.to_date(ts)))
    mon = F.element_at(F.array(*[F.lit(m) for m in _MON]), F.month(ts))
    off = F.element_at(
        F.array(*[F.lit(o) for o in OFFSETS]),
        (F.col("event_id") % len(OFFSETS) + 1).cast("int"),
    )
    rfc = F.format_string(
        "%s, %02d %s %d %02d:%02d:%02d %s",
        dow,
        F.dayofmonth(ts),
        mon,
        F.year(ts),
        F.hour(ts),
        F.minute(ts),
        F.second(ts),
        off,
    )
    return events.select(
        "event_id", _rfc2822_epoch_udf(rfc).alias("published_s")
    )


_OFFSETS_SQL = ", ".join(f"'{o}'" for o in OFFSETS)

SQL_RFC2822_PARSE = f"""
SELECT event_id,
       epoch(strptime(
         strftime(ts, '%a, %d %b %Y %H:%M:%S') || ' ' ||
           ([{_OFFSETS_SQL}])[(event_id % {len(OFFSETS)})::INT + 1],
         '%a, %d %b %Y %H:%M:%S %z'))::BIGINT AS published_s
FROM events
"""


# --------------------------------------------------------------------------
# A9 — per-feed freshness over the real parse pipeline
# --------------------------------------------------------------------------
N_FIXTURE_FEEDS = 6
FIXTURE_ITEMS_PER_FEED = 6


def _fixture_feeds_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        synth_feeds(N_FIXTURE_FEEDS, FIXTURE_ITEMS_PER_FEED),
        "feed_url string, xml string",
    )


def q_news_feed_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    feeds = _fixture_feeds_df(spark)
    meta = parse_feed_metadata(feeds)
    articles = parse_feeds(feeds)
    return feed_last_published(meta, articles).select(
        "feed_url", "n_articles", "last_published_s"
    )


def _freshness_oracle_sql() -> str:
    """Replay the pure-Python parser on the same fixtures; aggregate in SQL."""
    item_rows, decl_rows = [], []
    for feed_url, xml in synth_feeds(N_FIXTURE_FEEDS, FIXTURE_ITEMS_PER_FEED):
        meta, items = parse_feed(feed_url, xml)
        decl = meta["declared_last_published"]
        decl_rows.append(
            f"('{feed_url}', {int(decl.timestamp()) if decl else 'NULL'})"
        )
        for it in items:
            p = it["published_at"]
            item_rows.append(
                f"('{feed_url}', {int(p.timestamp()) if p else 'NULL'})"
            )
    return f"""
WITH decl(feed_url, declared_s) AS (VALUES {', '.join(decl_rows)}),
items(feed_url, published_s) AS (VALUES {', '.join(item_rows)}),
agg AS (
  SELECT feed_url, max(published_s) AS max_item_s, count(*) AS n_articles
  FROM items GROUP BY feed_url
)
SELECT d.feed_url,
       COALESCE(a.n_articles, 0) AS n_articles,
       greatest(COALESCE(d.declared_s, a.max_item_s),
                COALESCE(a.max_item_s, d.declared_s)) AS last_published_s
FROM decl d LEFT JOIN agg a ON a.feed_url = d.feed_url
"""


SQL_NEWS_FEED_FRESHNESS = _freshness_oracle_sql()


# --------------------------------------------------------------------------
# J6/A4 — news search scoring over the real articles table
# --------------------------------------------------------------------------
def q_news_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEWS_SEARCH_SQL shape: flat tf*idf (no field weights) over article
    text, idf from the web corpus, ORDER BY token_score DESC, url ASC."""
    docs = _read(spark, sf_dir, "documents")
    articles = parse_feeds(_fixture_feeds_df(spark))
    text = F.concat_ws(
        " ",
        F.coalesce("title", F.lit("")),
        F.coalesce("description", F.lit("")),
        F.coalesce("content", F.lit("")),
    )
    atoks = articles.select(
        "url",
        F.explode(
            F.regexp_extract_all(F.lower(text), F.lit(TOKEN_RUN), F.lit(0))
        ).alias("term"),
    ).filter(F.col("term").isin(NEWS_QUERY_TERMS))
    tf = atoks.groupBy("url", "term").agg(F.count(F.lit(1)).alias("tf"))

    # web-corpus idf for the query terms: two-phase distinct, N in-plan
    wtoks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RUN), F.lit(0))
        ).alias("term"),
    ).filter(F.col("term").isin(NEWS_QUERY_TERMS))
    dfd = F.col("doc_frequency").cast("double")
    stats = (
        doc_frequencies(wtoks)
        .crossJoin(F.broadcast(scalar_count(docs)))
        .withColumn("idf", F.log((F.col("_n") - dfd + 0.5) / (dfd + 0.5) + 1.0))
        .select("term", "idf")
    )
    return (
        tf.join(F.broadcast(stats), "term", "left")
        .groupBy("url")
        .agg(
            F.round(
                F.sum(F.col("tf").cast("double") * F.coalesce("idf", F.lit(1.0))), 6
            ).alias("token_score"),
            F.count(F.lit(1)).alias("matched_terms"),
        )
        .orderBy(F.desc("token_score"), F.asc("url"))
        .limit(20)
    )


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _news_scoring_oracle_sql() -> str:
    rows = []
    for feed_url, xml in synth_feeds(N_FIXTURE_FEEDS, FIXTURE_ITEMS_PER_FEED):
        for it in parse_feed(feed_url, xml)[1]:
            text = " ".join(
                v for v in (it["title"], it["description"], it["content"]) if v
            )
            rows.append(f"({_sql_quote(it['url'])}, {_sql_quote(text)})")
    terms = ", ".join(f"'{t}'" for t in NEWS_QUERY_TERMS)
    return f"""
WITH articles(url, text) AS (VALUES {', '.join(rows)}),
atoks AS (
  SELECT url, unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term
  FROM articles
),
tf AS (
  SELECT url, term, count(*) AS tf FROM atoks
  WHERE term IN ({terms}) GROUP BY url, term
),
wtoks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term
  FROM documents
),
n AS (SELECT count(*)::DOUBLE AS n FROM documents),
stats AS (
  SELECT term,
         ln((n.n - count(DISTINCT doc_id) + 0.5) / (count(DISTINCT doc_id) + 0.5) + 1.0) AS idf
  FROM wtoks, n WHERE term IN ({terms}) GROUP BY term, n.n
)
SELECT tf.url,
       round(sum(tf.tf::DOUBLE * COALESCE(stats.idf, 1.0)), 6) AS token_score,
       count(DISTINCT tf.term) AS matched_terms
FROM tf LEFT JOIN stats ON stats.term = tf.term
GROUP BY tf.url
ORDER BY token_score DESC, tf.url ASC
LIMIT 20
"""


SQL_NEWS_SCORING = _news_scoring_oracle_sql()


# --------------------------------------------------------------------------
# S4/W6 — url-keyed article upsert with COALESCE(NULLIF(new,''), old)
# column merge (news_fetcher.py:267-283), exercised through the REAL
# upsert_articles operator against deterministic old/new tables derived
# from documents. Branch coverage by residue class:
#   old-only rows survive; new-only rows insert; '' never overwrites;
#   non-empty overwrites; null published_at falls back to old.
# --------------------------------------------------------------------------
def _upsert_inputs(spark: SparkSession, sf_dir: str):
    docs = _read(spark, sf_dir, "documents")
    url = F.concat(F.lit("https://u/"), F.col("doc_id"))
    old = docs.filter(F.col("doc_id") % 3 == 0).select(
        url.alias("url"),
        F.lit("f-old").alias("feed_url"),
        F.substring("text", 1, 20).alias("title"),
        F.when(F.col("doc_id") % 6 == 0, F.lit("")).otherwise(
            F.substring("text", 21, 20)
        ).alias("description"),
        F.substring("text", 41, 30).alias("content"),
        F.lit("old-author").alias("author"),
        (F.col("doc_id") * 100).alias("published_at_s"),
        F.lit("img-old").alias("image_url"),
    )
    new = docs.filter(F.col("doc_id") % 2 == 0).select(
        url.alias("url"),
        F.lit("f-new").alias("feed_url"),
        F.when(F.col("doc_id") % 4 == 0, F.lit("")).otherwise(
            F.substring("text", 5, 20)
        ).alias("title"),
        F.substring("text", 25, 20).alias("description"),
        F.when(F.col("doc_id") % 8 == 0, F.lit("")).otherwise(
            F.substring("text", 45, 30)
        ).alias("content"),
        F.lit("").alias("author"),  # blank: old author must survive
        F.when(F.col("doc_id") % 10 == 0, F.lit(None).cast("long")).otherwise(
            F.col("doc_id") * 200
        ).alias("published_at_s"),
        F.lit("img-new").alias("image_url"),
    )
    return old, new


def q_article_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .news.feeds import upsert_articles

    old, new = _upsert_inputs(spark, sf_dir)
    merged = upsert_articles(old, new)
    # insert-only rows with blank new fields legitimately merge to NULL;
    # sentinel them so the driver's row-sorting comparator (which cannot
    # order None against str) sees a total order on every column
    return merged.select(
        "url",
        "feed_url",
        *[
            F.coalesce(c, F.lit("(none)")).alias(c)
            for c in ("title", "description", "content", "author")
        ],
        F.coalesce("published_at_s", F.lit(-1)).alias("published_at_s"),
        F.coalesce("image_url", F.lit("(none)")).alias("image_url"),
    )


SQL_ARTICLE_UPSERT = """
WITH old AS (
  SELECT 'https://u/' || doc_id AS url,
         'f-old' AS feed_url,
         substring(text, 1, 20) AS title,
         CASE WHEN doc_id % 6 = 0 THEN '' ELSE substring(text, 21, 20) END AS description,
         substring(text, 41, 30) AS content,
         'old-author' AS author,
         doc_id * 100 AS published_at_s,
         'img-old' AS image_url
  FROM documents WHERE doc_id % 3 = 0
),
new AS (
  SELECT 'https://u/' || doc_id AS url,
         'f-new' AS feed_url,
         CASE WHEN doc_id % 4 = 0 THEN '' ELSE substring(text, 5, 20) END AS title,
         substring(text, 25, 20) AS description,
         CASE WHEN doc_id % 8 = 0 THEN '' ELSE substring(text, 45, 30) END AS content,
         '' AS author,
         CASE WHEN doc_id % 10 = 0 THEN NULL ELSE doc_id * 200 END AS published_at_s,
         'img-new' AS image_url
  FROM documents WHERE doc_id % 2 = 0
)
SELECT COALESCE(n.url, o.url) AS url,
       -- existing attribution wins: the reference's ON CONFLICT update
       -- list omits feed_url (news_fetcher.py:269-283)
       COALESCE(o.feed_url, n.feed_url) AS feed_url,
       -- NULLIF('') merges only ON CONFLICT; the reference's INSERT path
       -- writes raw values, so insert-only rows keep their ''
       COALESCE(CASE WHEN o.url IS NOT NULL AND n.url IS NOT NULL
                     THEN COALESCE(NULLIF(n.title, ''), o.title)
                     ELSE COALESCE(n.title, o.title) END, '(none)') AS title,
       COALESCE(CASE WHEN o.url IS NOT NULL AND n.url IS NOT NULL
                     THEN COALESCE(NULLIF(n.description, ''), o.description)
                     ELSE COALESCE(n.description, o.description) END, '(none)') AS description,
       COALESCE(CASE WHEN o.url IS NOT NULL AND n.url IS NOT NULL
                     THEN COALESCE(NULLIF(n.content, ''), o.content)
                     ELSE COALESCE(n.content, o.content) END, '(none)') AS content,
       COALESCE(CASE WHEN o.url IS NOT NULL AND n.url IS NOT NULL
                     THEN COALESCE(NULLIF(n.author, ''), o.author)
                     ELSE COALESCE(n.author, o.author) END, '(none)') AS author,
       COALESCE(n.published_at_s, o.published_at_s, -1) AS published_at_s,
       COALESCE(CASE WHEN o.url IS NOT NULL AND n.url IS NOT NULL
                     THEN COALESCE(NULLIF(n.image_url, ''), o.image_url)
                     ELSE COALESCE(n.image_url, o.image_url) END, '(none)') AS image_url
FROM old o FULL OUTER JOIN new n ON n.url = o.url
"""


QUERIES_NEWS = {
    "rfc2822_parse": q_rfc2822_parse,
    "news_feed_freshness": q_news_feed_freshness,
    "news_scoring": q_news_scoring,
    "article_upsert": q_article_upsert,
}

ORACLES_NEWS = {
    "rfc2822_parse": SQL_RFC2822_PARSE,
    "news_feed_freshness": SQL_NEWS_FEED_FRESHNESS,
    "news_scoring": SQL_NEWS_SCORING,
    "article_upsert": SQL_ARTICLE_UPSERT,
}
