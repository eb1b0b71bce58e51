"""HTML extraction spec — the per-row invariant of the pipeline.

The reference extracts with readability-lxml + BeautifulSoup
(``app/crawler/worker.py:56-87``): title = ``<title>`` text, description =
``<meta name=description>``, content = main-article text via
``Document(html).summary()`` then ``get_text(" ", strip=True)``, links =
all ``<a href>`` absolutized + normalized + first-seen-deduped, feed links
via rel/type markers (``worker.py:89-125``), timestamps from
``article:published_time`` / ``article:modified_time`` meta (``worker.py:127-137``).

Neither readability-lxml nor bs4 is a dependency here, so extraction is
defined as an explicit deterministic SPEC implemented once with the stdlib
``html.parser`` and shared by the corpus generator's oracle and the Spark
UDF (FIXTURES.md §1 / SURVEY.md §7 plan A — ``pages.text`` IS the expected
extractor output, and tests assert ``extract(html) == text`` per row):

- *main content* = text of the first ``<article>`` element (else ``<main>``,
  else ``<body>``), where text == every character-data chunk stripped,
  empties dropped, joined with a single space (bs4 ``get_text(" ", strip=True)``
  semantics); ``<script>``/``<style>``/comments excluded.
- *title* = character data inside the first ``<title>``, stripped.
- *description* = ``content`` attr of ``<meta name="description">``, stripped.
- *links* = every ``<a href>`` in document order -> ``urljoin(base, href)`` ->
  ``normalize_url`` -> first-seen dedup (``worker.py:66-75``).
- *feed links* = ``<link>``/``<meta>`` rel/type marker rules (``worker.py:89-125``).
- *timestamps* = ISO-8601 parse, naive -> UTC, future (vs the ``now``
  parameter, never the wall clock) -> None (``worker.py:127-137``).

Pure stdlib; executor-safe; vectorized over Arrow batches in udfs.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timezone
from html.parser import HTMLParser
from urllib.parse import urljoin

from .normalization import normalize_url

_MAIN_CONTENT_TAGS = ("article", "main", "body")
_SKIP_TEXT_TAGS = frozenset({"script", "style"})
_FEED_MARKERS = ("rss", "atom", "feed", ".xml")


@dataclass
class ParsedPage:
    title: str = ""
    description: str = ""
    content: str = ""
    links: list = field(default_factory=list)
    feed_links: list = field(default_factory=list)
    published_at: datetime | None = None
    updated_at: datetime | None = None


class _PageParser(HTMLParser):
    """Single-pass collector for title / meta / links / per-container text."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.title_chunks: list[str] = []
        self.meta: dict[str, str] = {}
        self.hrefs: list[str] = []
        self.link_tags: list[dict[str, str]] = []
        self.meta_tags: list[dict[str, str]] = []
        # text chunks per container tag we may use as "main content"
        self.container_chunks: dict[str, list[str]] = {t: [] for t in _MAIN_CONTENT_TAGS}
        self._container_depth: dict[str, int] = {t: 0 for t in _MAIN_CONTENT_TAGS}
        self._in_title = False
        self._skip_depth = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        attrs_d = {k: (v or "") for k, v in attrs}
        if tag == "title":
            self._in_title = True
        elif tag == "meta":
            self.meta_tags.append(attrs_d)
            name = (attrs_d.get("name") or attrs_d.get("property") or "").lower()
            if name and "content" in attrs_d and name not in self.meta:
                self.meta[name] = attrs_d["content"]
        elif tag == "a" and "href" in attrs_d:
            self.hrefs.append(attrs_d["href"])
        elif tag == "link":
            self.link_tags.append(attrs_d)
        if tag in _SKIP_TEXT_TAGS:
            self._skip_depth += 1
        if tag in self._container_depth:
            self._container_depth[tag] += 1

    def handle_endtag(self, tag: str) -> None:
        if tag == "title":
            self._in_title = False
        if tag in _SKIP_TEXT_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1
        if tag in self._container_depth and self._container_depth[tag] > 0:
            self._container_depth[tag] -= 1

    def handle_data(self, data: str) -> None:
        if self._in_title:
            self.title_chunks.append(data)
            return
        if self._skip_depth:
            return
        stripped = data.strip()
        if not stripped:
            return
        for tag, depth in self._container_depth.items():
            if depth > 0:
                self.container_chunks[tag].append(stripped)


def _parse_ts(value: str, now: datetime) -> datetime | None:
    """ISO-8601 timestamp; naive -> UTC; future (vs ``now``) -> None."""
    try:
        dt = datetime.fromisoformat(value.strip().replace("Z", "+00:00"))
    except (ValueError, AttributeError):
        return None
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return dt if dt <= now else None


def _feed_links(base_url: str, parser: _PageParser) -> list[str]:
    """rel/type marker rules from ``worker.py:89-125``."""
    discovered: list[str] = []
    seen: set[str] = set()

    def _add(raw_value: str) -> None:
        value = raw_value.strip()
        if not any(marker in value.lower() for marker in _FEED_MARKERS):
            return
        try:
            normalized = normalize_url(urljoin(base_url, value))
        except Exception:
            return
        if normalized not in seen:
            seen.add(normalized)
            discovered.append(normalized)

    for link in parser.link_tags:
        href = (link.get("href") or "").strip()
        if not href:
            continue
        rel_text = link.get("rel", "")
        feed_type = (link.get("type") or "").lower()
        if "rss" in feed_type or "atom" in feed_type:
            if "alternate" in rel_text.lower() or not rel_text:
                _add(href)
        elif any(m in rel_text.lower() for m in ("alternate", "feed", "rss", "atom")):
            _add(href)

    for meta in parser.meta_tags:
        meta_name = (meta.get("name") or meta.get("property") or "").lower()
        if any(m in meta_name for m in ("rss", "atom", "feed")):
            for attr in ("content", "value", "href"):
                if meta.get(attr):
                    _add(str(meta[attr]))

    return discovered


def parse_page(url: str, html: str, now: datetime) -> ParsedPage:
    """Extract (title, description, content, links, feeds, timestamps).

    ``now`` is an explicit job parameter — never the wall clock — so the
    pipeline is deterministic and resumable (FIXTURES.md preamble).
    """
    parser = _PageParser()
    parser.feed(html or "")
    parser.close()

    title = "".join(parser.title_chunks).strip()
    description = (parser.meta.get("description") or "").strip()

    content = ""
    for tag in _MAIN_CONTENT_TAGS:
        if parser.container_chunks[tag]:
            content = " ".join(parser.container_chunks[tag])
            break

    seen: set[str] = set()
    links: list[str] = []
    for href in parser.hrefs:
        try:
            normalized = normalize_url(urljoin(url, href))
        except Exception:
            continue
        if normalized not in seen:
            seen.add(normalized)
            links.append(normalized)

    pub_raw = parser.meta.get("article:published_time")
    upd_raw = parser.meta.get("article:modified_time")

    return ParsedPage(
        title=title,
        description=description,
        content=content,
        links=links,
        feed_links=_feed_links(url, parser),
        published_at=_parse_ts(pub_raw, now) if pub_raw else None,
        updated_at=_parse_ts(upd_raw, now) if upd_raw else None,
    )


def compute_quality(content: str, outbound_link_count: int) -> float:
    """``worker.py:146-152``: density vs link-spam penalty."""
    wc = len(content.split())
    if wc == 0:
        return 0.0
    density = min(1.0, wc / 300)
    link_penalty = min(0.4, outbound_link_count / wc)
    return max(0.0, density - link_penalty)


def compute_freshness(
    updated_at: datetime | None, published_at: datetime | None, now: datetime
) -> float:
    """``worker.py:154-159``: age decay over 365 days; unknown -> 0.1."""
    ts = updated_at or published_at
    if not ts:
        return 0.1
    days = (now - ts).days
    return max(0.0, 1.0 - min(365, days) / 365)


def is_valid_document(title: str, description: str, content: str) -> bool:
    """Validation predicate (``worker.py:306``)."""
    return bool(title and description and content and len(content) >= 120)
