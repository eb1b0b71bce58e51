"""RSS/Atom feed parsing + article assembly (reference
``app/batch/news_fetcher.py``).

The reference's news pipeline is: fetch feed XML over HTTP -> parse channel
metadata + items -> upsert ``news_articles`` by url -> replace the
articles' ``source_type=2`` tokens -> enqueue discovered urls. The fetch
loop, its 20-minute rescheduling (``news_fetcher.py:236-238``) and the
image-bytes download (``:92-103``) are live-network behavior with no batch
analog; everything else is reproduced here over an input relation of
``(feed_url, xml)`` rows:

- E6  RFC-2822 date parsing (``:26-35``): :func:`parse_datetime_rfc2822`
  is the same ``email.utils.parsedate_to_datetime`` + naive->UTC coercion.
- E21 html-entity strip (``:43-47``): :func:`clean_html_text` —
  ``html.unescape`` then tag removal. The reference uses BeautifulSoup's
  ``get_text``; stdlib-only here (bs4 absent from the runtime), identical
  on the entity/tag shapes feeds carry, documented difference: contents of
  ``<script>``/``<style>`` elements are not dropped.
- item field extraction (``:106-147``): link resolution against the feed
  url + normalization, 2000-char url cap, title/description|summary/
  content|content:encoded, author fallback chain (``:50-60``), image-url
  preference order (``:63-89``, url only — no fetch).
- feed metadata (``:149-181``): name/link, ``last_published`` fallback
  chain lastBuildDate -> pubDate -> updated.
- A9  per-feed max item date (``:190-195``): :func:`feed_last_published`
  promotes the max item date over the declared value.
- 50-items-per-feed cap (``MAX_ITEMS_PER_FEED``, ``:14``).
- url-keyed article upsert (``:267-283``): :func:`upsert_articles` with
  the same COALESCE(NULLIF(new,''), old) per-column semantics.

Parsing runs as an Arrow-batched ``mapInPandas`` over feed rows — one
Python parse per FEED (not per item), mirroring the extract stage's
one-parse-per-document shape. At 100 TB scale feeds are tiny relative to
pages; the stage is embarrassingly parallel with no shuffle.
"""

from __future__ import annotations

import re
from datetime import datetime, timezone
from email.utils import parsedate_to_datetime
from html import unescape
from typing import Iterator
from urllib.parse import urljoin
from xml.etree import ElementTree

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..normalization import normalize_url

MAX_ITEMS_PER_FEED = 50  # news_fetcher.py:22
MAX_ARTICLE_URL_LENGTH = 2000  # news_fetcher.py:24

_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")
# tag-soup recovery: item/entry blocks inside a non-well-formed envelope
_ITEM_BLOCK_RE = re.compile(
    r"<(item|entry)\b[^>]*>.*?</\1>", re.DOTALL | re.IGNORECASE
)


def parse_datetime_rfc2822(value: str | None) -> datetime | None:
    """RFC-2822 date -> aware UTC datetime (``news_fetcher.py:26-35``):
    naive results are assumed UTC; unparseable input -> None."""
    if not value:
        return None
    try:
        dt = parsedate_to_datetime(value)
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return dt.astimezone(timezone.utc)
    except Exception:
        return None


def clean_html_text(value: str) -> str:
    """Entity-decode then strip markup to text (``news_fetcher.py:43-47``)."""
    if not value:
        return ""
    decoded = unescape(value)
    return _WS_RE.sub(" ", _TAG_RE.sub(" ", decoded)).strip()


def _local(tag: str) -> str:
    """'{ns}name' / 'prefix:name' -> lowercase local name."""
    if "}" in tag:
        tag = tag.rsplit("}", 1)[1]
    return tag.lower()


def _qual(el: ElementTree.Element) -> str:
    """Qualified 'prefix:name' using the declared namespace uri tail —
    good enough to distinguish dc:creator / media:content / content:encoded
    in real-world feeds."""
    tag = el.tag
    if "}" in tag:
        uri, name = tag[1:].rsplit("}", 1)
        for prefix, frag in (
            ("dc", "dc/elements"),
            ("dcterms", "dc/terms"),
            ("media", "search.yahoo.com/mrss"),
            ("itunes", "itunes"),
            ("content", "content"),
        ):
            if frag in uri:
                return f"{prefix}:{name.lower()}"
        return name.lower()
    return tag.lower()


def _find_text(node: ElementTree.Element, *names: str) -> str:
    """First matching child's collapsed text (reference ``_text``)."""
    wanted = {n.lower() for n in names}
    for child in node:
        if _qual(child) in wanted or _local(child.tag) in wanted:
            return _WS_RE.sub(" ", "".join(child.itertext())).strip()
    return ""


def _find_child(node: ElementTree.Element, *names: str):
    wanted = {n.lower() for n in names}
    for child in node:
        if _qual(child) in wanted or _local(child.tag) in wanted:
            return child
    return None


def _link_of(node: ElementTree.Element) -> str:
    """<link href=..> (Atom) or <link>text</link> (RSS)."""
    el = _find_child(node, "link")
    if el is None:
        return ""
    return (el.get("href") or "".join(el.itertext()).strip() or "").strip()


def _author_of(node: ElementTree.Element) -> str:
    """author -> dc:creator -> creator -> itunes:author -> dcterms:creator
    (``news_fetcher.py:50-60``; Atom <author><name> flattens via itertext)."""
    for name in ("author", "dc:creator", "creator", "itunes:author", "dcterms:creator"):
        v = _find_text(node, name)
        if v:
            return v
    return ""


def _image_url_of(node: ElementTree.Element, base_url: str) -> str:
    """media:content -> media:thumbnail -> image-typed enclosure ->
    image/thumbnail text (``news_fetcher.py:63-89``); resolved+normalized."""
    image_url = ""
    mc = _find_child(node, "media:content")
    if mc is not None:
        image_url = (mc.get("url") or "").strip()
    if not image_url:
        mt = _find_child(node, "media:thumbnail")
        if mt is not None:
            image_url = (mt.get("url") or "").strip()
    if not image_url:
        enc = _find_child(node, "enclosure")
        if enc is not None and "image" in (enc.get("type") or "").lower():
            image_url = (enc.get("url") or "").strip()
    if not image_url:
        image_url = (_find_text(node, "image") or _find_text(node, "thumbnail")).strip()
    if image_url:
        try:
            return normalize_url(urljoin(base_url, image_url))
        except Exception:
            return ""
    return ""


def _parse_item(feed_url: str, node: ElementTree.Element) -> dict | None:
    """One <item>/<entry> -> article dict (``news_fetcher.py:106-147``)."""
    link = _link_of(node)
    if not link:
        return None
    try:
        url = normalize_url(urljoin(feed_url, link))
    except Exception:
        return None
    if len(url) > MAX_ARTICLE_URL_LENGTH:
        return None
    title = _find_text(node, "title")
    description = clean_html_text(
        _find_text(node, "description") or _find_text(node, "summary")
    )
    content = _find_text(node, "content") or _find_text(node, "content:encoded")
    published = (
        parse_datetime_rfc2822(_find_text(node, "pubdate"))
        or parse_datetime_rfc2822(_find_text(node, "published"))
        or parse_datetime_rfc2822(_find_text(node, "updated"))
    )
    return {
        "url": url,
        "feed_url": feed_url,
        "title": title,
        "description": description,
        "content": content,
        "author": _author_of(node),
        "published_at": published,
        "image_url": _image_url_of(node, feed_url),
    }


def parse_feed(feed_url: str, xml_text: str) -> tuple[dict, list[dict]]:
    """Feed XML -> (metadata, items) (``news_fetcher.py:149-199``).

    Metadata ``last_published`` already includes the A9 promotion: the max
    item date wins over the declared lastBuildDate/pubDate/updated when
    newer (``:190-195``).

    Malformed envelopes degrade in two steps, mirroring the reference's
    lenient soup parser as closely as stdlib allows: first a tag-soup
    recovery pass extracts ``<item>``/``<entry>`` blocks by regex and
    parses each individually (well-formed items inside a broken document
    survive; broken ones are skipped); if nothing is salvageable the feed
    yields empty metadata + no items (the reference logs and skips)."""
    empty_meta = {
        "feed_url": feed_url,
        "name": "",
        "link": "",
        "declared_last_published": None,
        "last_published": None,
    }
    try:
        root = ElementTree.fromstring(xml_text)
    except ElementTree.ParseError:
        items = []
        for m in _ITEM_BLOCK_RE.finditer(xml_text):
            try:
                node = ElementTree.fromstring(m.group(0))
            except ElementTree.ParseError:
                continue
            parsed = _parse_item(feed_url, node)
            if parsed is not None:
                items.append(parsed)
            if len(items) >= MAX_ITEMS_PER_FEED:
                break
        meta = dict(empty_meta)
        item_dates = [i["published_at"] for i in items if i["published_at"] is not None]
        if item_dates:
            meta["last_published"] = max(item_dates)
        return meta, items

    # channel (RSS) or the feed element itself (Atom)
    source = root
    for el in root.iter():
        if _local(el.tag) == "channel":
            source = el
            break
    else:
        if _local(root.tag) == "feed":
            source = root

    link = _link_of(source)
    if link:
        try:
            link = normalize_url(urljoin(feed_url, link))
        except Exception:
            link = ""
    declared = (
        parse_datetime_rfc2822(_find_text(source, "lastbuilddate"))
        or parse_datetime_rfc2822(_find_text(source, "pubdate"))
        or parse_datetime_rfc2822(_find_text(source, "updated"))
    )
    meta = {
        "feed_url": feed_url,
        "name": _find_text(source, "title"),
        "link": link,
        "declared_last_published": declared,
        "last_published": declared,
    }

    items: list[dict] = []
    for node in root.iter():
        if _local(node.tag) not in ("item", "entry"):
            continue
        parsed = _parse_item(feed_url, node)
        if parsed is None:
            continue
        items.append(parsed)
        if len(items) >= MAX_ITEMS_PER_FEED:
            break

    item_dates = [i["published_at"] for i in items if i["published_at"] is not None]
    if item_dates:
        max_item = max(item_dates)
        if meta["last_published"] is None or max_item > meta["last_published"]:
            meta["last_published"] = max_item
    return meta, items


# Instants cross the Python->Arrow->Spark boundary as BIGINT epoch SECONDS
# (``*_s`` columns), never TimestampType: naive pandas datetimes would be
# re-interpreted in the driver session's timezone (CLAUDE.md invariant 3),
# and microsecond timestamps were the one r01 hash-portability failure.
ARTICLE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("feed_url", T.StringType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
        T.StructField("author", T.StringType(), True),
        T.StructField("published_at_s", T.LongType(), True),
        T.StructField("image_url", T.StringType(), True),
    ]
)

FEED_META_SCHEMA = T.StructType(
    [
        T.StructField("feed_url", T.StringType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("link", T.StringType(), True),
        T.StructField("declared_last_published_s", T.LongType(), True),
        T.StructField("last_published_s", T.LongType(), True),
    ]
)


def _epoch_s(dt: datetime | None) -> int | None:
    return None if dt is None else int(dt.timestamp())


def _articles_map(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = [f.name for f in ARTICLE_SCHEMA.fields]
    for pdf in iterator:
        rows: list[dict] = []
        for feed_url, xml in zip(pdf["feed_url"], pdf["xml"]):
            _, items = parse_feed(feed_url, xml)
            for it in items:
                row = dict(it)
                row["published_at_s"] = _epoch_s(row.pop("published_at"))
                rows.append(row)
        yield pd.DataFrame(rows, columns=cols)


def _meta_map(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = [f.name for f in FEED_META_SCHEMA.fields]
    for pdf in iterator:
        rows = []
        for feed_url, xml in zip(pdf["feed_url"], pdf["xml"]):
            meta = dict(parse_feed(feed_url, xml)[0])
            meta["declared_last_published_s"] = _epoch_s(
                meta.pop("declared_last_published")
            )
            meta["last_published_s"] = _epoch_s(meta.pop("last_published"))
            rows.append(meta)
        yield pd.DataFrame(rows, columns=cols)


def parse_feeds(feeds: DataFrame) -> DataFrame:
    """feeds(feed_url, xml) -> article rows (one parse per feed, Arrow
    batches; no shuffle)."""
    return feeds.mapInPandas(_articles_map, schema=ARTICLE_SCHEMA)


def parse_feed_metadata(feeds: DataFrame) -> DataFrame:
    """feeds(feed_url, xml) -> feed metadata rows with the A9-promoted
    last_published."""
    return feeds.mapInPandas(_meta_map, schema=FEED_META_SCHEMA)


def feed_last_published(meta: DataFrame, articles: DataFrame) -> DataFrame:
    """A9 as a relational aggregate (``news_fetcher.py:190-195``): per-feed
    ``greatest(declared last_published, max(item published_at))``, null-safe
    on either side, plus the item count. Shuffle key is feed_url (feeds ~
    thousands of rows per million articles; the agg is map-side combined;
    Spark's greatest already skips nulls)."""
    max_item = articles.groupBy("feed_url").agg(
        F.max("published_at_s").alias("_max_item_s"),
        F.count(F.lit(1)).alias("n_articles"),
    )
    return (
        meta.join(max_item, "feed_url", "left")
        .select(
            "feed_url",
            "name",
            "link",
            F.coalesce("n_articles", F.lit(0)).alias("n_articles"),
            F.greatest("declared_last_published_s", "_max_item_s").alias(
                "last_published_s"
            ),
        )
    )


_MERGE_TEXT_COLS = ("title", "description", "content", "author", "image_url")

# The ON CONFLICT(url) update list (news_fetcher.py:267-283) as SQL over
# aliases t (existing) / s (incoming) — consumed by TableIO.merge_columns so
# the Iceberg MERGE INTO and the parquet read-modify-write share one
# spelling. feed_url keeps the EXISTING attribution (the reference's ON
# CONFLICT update list omits it entirely) with one documented departure:
# a NULL existing attribution back-fills from the incoming feed — the
# reference would leave it NULL forever. The same COALESCE(old, new) rule
# in upsert_articles keeps both backends row-identical either way.
ARTICLE_MERGE_SET = {
    **{c: f"COALESCE(NULLIF(s.{c}, ''), t.{c})" for c in _MERGE_TEXT_COLS},
    "published_at_s": "COALESCE(s.published_at_s, t.published_at_s)",
    "feed_url": "COALESCE(t.feed_url, s.feed_url)",
}


def dedup_articles(incoming: DataFrame) -> DataFrame:
    """In-batch url dedup with the same column-merge the cross-batch upsert
    uses. The reference's sequential ``ON CONFLICT(url)`` guarantees
    url-uniqueness even when one batch carries the same story twice (two
    feeds syndicating it, or a repeated item in one feed); without this, a
    duplicated url writes two rows and the next cycle's url join fans out.

    The reference folds duplicates in fetch order (last non-empty value
    wins per column); a batch relation has no fetch order, so duplicates
    are folded in a CANONICAL total order instead — the full row value —
    which keeps every ON CONFLICT invariant (url-unique output, non-empty
    beats empty, null published_at falls back) and is deterministic under
    any partitioning. ``feed_url`` takes the first row in that order,
    mirroring the upsert's keep-original-attribution rule."""
    ord_col = F.struct(
        F.col("feed_url"),
        F.coalesce(F.col("published_at_s"), F.lit(-(1 << 62))),
        *[F.coalesce(F.col(c), F.lit("")) for c in _MERGE_TEXT_COLS],
    )

    def last_nonempty(c: str) -> F.Column:
        nonempty = F.nullif(F.col(c), F.lit("")).isNotNull()
        return F.coalesce(
            F.max_by(F.when(nonempty, F.col(c)), F.when(nonempty, ord_col)),
            F.min(c),
        ).alias(c)

    pub_ok = F.col("published_at_s").isNotNull()
    return incoming.groupBy("url").agg(
        F.min_by("feed_url", ord_col).alias("feed_url"),
        last_nonempty("title"),
        last_nonempty("description"),
        last_nonempty("content"),
        last_nonempty("author"),
        F.max_by(
            F.when(pub_ok, F.col("published_at_s")), F.when(pub_ok, ord_col)
        ).alias("published_at_s"),
        last_nonempty("image_url"),
    )


def upsert_articles(existing: DataFrame, incoming: DataFrame) -> DataFrame:
    """url-keyed article upsert with the reference's per-column
    ``COALESCE(NULLIF(new, ''), old)`` merge (``news_fetcher.py:267-283``):
    a re-fetched article only overwrites a field when the new value is
    non-empty; ``published_at`` falls back to the old value when the new
    one is null; ``feed_url`` keeps the EXISTING attribution (the
    reference's ON CONFLICT update list omits feed_url, so a story
    re-fetched via a second feed stays credited to the feed that first
    carried it). Incoming rows are url-deduped first (dedup_articles) so
    the url key stays unique. Full outer join on the uniformly
    distributed url key."""
    incoming = dedup_articles(incoming)
    new = incoming.select([F.col(c).alias(f"_n_{c}") for c in incoming.columns])
    joined = existing.join(new, existing["url"] == new["_n_url"], "full_outer")
    matched = existing["url"].isNotNull() & new["_n_url"].isNotNull()

    def pick(col: str) -> F.Column:
        # the NULLIF('') merge applies only ON CONFLICT; the reference's
        # INSERT writes raw values, so an insert-only row keeps its ''
        return F.when(
            matched, F.coalesce(F.nullif(F.col(f"_n_{col}"), F.lit("")), F.col(col))
        ).otherwise(F.coalesce(F.col(f"_n_{col}"), F.col(col))).alias(col)

    return joined.select(
        F.coalesce(new["_n_url"], existing["url"]).alias("url"),
        F.coalesce(existing["feed_url"], new["_n_feed_url"]).alias("feed_url"),
        pick("title"),
        pick("description"),
        pick("content"),
        pick("author"),
        F.coalesce("_n_published_at_s", "published_at_s").alias("published_at_s"),
        pick("image_url"),
    )


def article_tokens(articles: DataFrame) -> DataFrame:
    """articles -> (article_url, term, field=4, frequency) — the
    source_type=2 token replacement (``news_fetcher.py:299-313``): terms
    from 'title description content' with the shared reference tokenizer."""
    from ..udfs import tokenize_udf

    text = F.concat_ws(
        " ",
        F.coalesce("title", F.lit("")),
        F.coalesce("description", F.lit("")),
        F.coalesce("content", F.lit("")),
    )
    pairs = articles.select(
        F.col("url").alias("article_url"),
        F.explode(tokenize_udf(text)).alias("term", "frequency"),
    )
    return pairs.select(
        "article_url", "term", F.lit(4).cast("short").alias("field"), "frequency"
    )
