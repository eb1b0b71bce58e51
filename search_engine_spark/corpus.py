"""Deterministic synthetic Common-Crawl-style ``pages`` corpus (FIXTURES.md §1).

Generates rows matching BASELINE.json's input_hint schema
``(url, warc_ts, html, text, lang)`` plus a rich per-page record used by the
pure-Python oracle. Everything is seeded (default 42) and wall-clock-free
("now" is a fixed constant), so the corpus, the index, and every score are
bit-stable across runs and parallelism levels.

Design knobs (FIXTURES.md §1):
- Zipf(s~1.1) vocabulary of ~5k stems -> real head-term skew
- preferential-attachment link graph -> hubs + dangling nodes for PageRank
- ~2% invalid pages (empty title/desc or content < 120 chars)
- exact-duplicate text bodies under different urls -> dedup tests
- tracking params / multipart TLDs / relative+duplicate links -> url ops
- some future-dated published_time metas -> timestamp rejection path

The expected ``text`` column is composed independently of the HTML templating
(from the same word lists), so ``extract.parse_page(html) == text`` is a real
equality test of the extraction spec, not a tautology.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone

# Fixed "now" for all deterministic scoring/timestamp logic in tests/bench.
FIXED_NOW = datetime(2026, 3, 1, tzinfo=timezone.utc)

_CONSONANT = "bcdfghjklmnprstvwz"
_VOWEL = "aeiou"


def _make_vocab(rng: random.Random, n: int) -> list[str]:
    """n pronounceable pseudo-words, 3-12 chars, deterministic."""
    vocab: list[str] = []
    seen: set[str] = set()
    while len(vocab) < n:
        syllables = rng.randint(1, 4)
        word = "".join(
            rng.choice(_CONSONANT) + rng.choice(_VOWEL) + (rng.choice(_CONSONANT) if rng.random() < 0.4 else "")
            for _ in range(syllables)
        )
        if len(word) < 2 or word in seen:
            continue
        seen.add(word)
        vocab.append(word)
    return vocab


def _zipf_sampler(rng: random.Random, vocab: list[str], s: float = 1.1):
    """Closure sampling words with Zipf(s) rank weights."""
    weights = [1.0 / ((rank + 1) ** s) for rank in range(len(vocab))]
    total = sum(weights)
    cum = []
    acc = 0.0
    for w in weights:
        acc += w / total
        cum.append(acc)

    import bisect

    def sample() -> str:
        return vocab[bisect.bisect_left(cum, rng.random())]

    return sample


@dataclass
class PageRecord:
    """One synthetic page: input columns + oracle ground truth."""

    url: str
    warc_ts: datetime
    html: bytes
    text: str  # expected extracted main content
    lang: str
    # oracle ground truth (never written to the pages table)
    title: str = ""
    description: str = ""
    raw_links: list = field(default_factory=list)  # hrefs as written into html
    published_at_meta: str | None = None
    updated_at_meta: str | None = None
    is_valid_expected: bool = True


_TLDS = ["com", "org", "net", "io", "co.uk", "com.au"]


def _page_url(rng: random.Random, site_idx: int, page_idx: int) -> str:
    tld = _TLDS[site_idx % len(_TLDS)]
    base = f"https://site{site_idx}.example-{site_idx % 7}.{tld}/p/{page_idx}"
    r = rng.random()
    if r < 0.15:
        base += "?utm_source=news&utm_campaign=x"  # stripped by normalize_url
    elif r < 0.25:
        base += f"?ref=s{site_idx}"  # kept by normalize_url
    return base


def generate_pages(
    n_pages: int = 200,
    seed: int = 42,
    n_sites: int = 12,
    vocab_size: int = 2000,
) -> list[PageRecord]:
    rng = random.Random(seed)
    vocab = _make_vocab(rng, vocab_size)
    sample = _zipf_sampler(rng, vocab)

    urls = [_page_url(rng, i % n_sites, i) for i in range(n_pages)]

    records: list[PageRecord] = []
    dup_text_cache: list[str] = []

    for i, url in enumerate(urls):
        invalid_mode = rng.random() < 0.02 and i > 5
        n_title = rng.randint(3, 8)
        n_desc = rng.randint(8, 15)
        n_paras = rng.randint(2, 6)

        title_words = [sample() for _ in range(n_title)]
        desc_words = [sample() for _ in range(n_desc)]

        # paragraphs; ~8% of pages reuse an earlier body verbatim (exact dups)
        if dup_text_cache and rng.random() < 0.08:
            body_paras = None
            text = rng.choice(dup_text_cache)
        else:
            body_paras = [
                [sample() for _ in range(rng.randint(15, 60))] for _ in range(n_paras)
            ]
            text = " ".join(" ".join(p) for p in body_paras)
            if rng.random() < 0.3:
                dup_text_cache.append(text)

        # preferential attachment: earlier pages attract more links
        n_links = rng.randint(0, 8)
        link_targets: list[str] = []
        for _ in range(n_links):
            if i == 0:
                break
            # quadratic bias toward low indices = hubs
            j = int((rng.random() ** 2) * i)
            link_targets.append(urls[j])
        if rng.random() < 0.2 and link_targets:
            link_targets.append(link_targets[0])  # duplicate link on page
        if rng.random() < 0.3:
            link_targets.append(f"/p/{rng.randint(0, n_pages - 1)}")  # relative
        if rng.random() < 0.1:
            link_targets.append(
                link_targets[0] + "?utm_medium=social" if link_targets else "/about?gclid=zz"
            )

        published_meta: str | None = None
        updated_meta: str | None = None
        r = rng.random()
        if r < 0.5:
            age_days = rng.randint(0, 800)
            published_meta = (FIXED_NOW - timedelta(days=age_days, hours=i % 24)).isoformat()
            if rng.random() < 0.3:
                updated_meta = (
                    FIXED_NOW - timedelta(days=max(0, age_days - rng.randint(0, 30)))
                ).isoformat()
        elif r < 0.55:
            published_meta = (FIXED_NOW + timedelta(days=30)).isoformat()  # future -> rejected

        feed_link = rng.random() < 0.15

        if invalid_mode:
            which = rng.randint(0, 2)
            if which == 0:
                title_words = []
            elif which == 1:
                desc_words = []
            else:
                body_paras = [[sample() for _ in range(5)]]
                text = " ".join(body_paras[0])

        title = " ".join(title_words).capitalize() if title_words else ""
        description = " ".join(desc_words) if desc_words else ""

        html = _render_html(
            title=title,
            description=description,
            text=text,
            body_paras=body_paras,
            links=link_targets,
            published_meta=published_meta,
            updated_meta=updated_meta,
            feed_link=feed_link,
            rng=rng,
        )

        lang = "en" if rng.random() < 0.9 else rng.choice(["de", "fr", "es"])
        records.append(
            PageRecord(
                url=url,
                warc_ts=FIXED_NOW - timedelta(hours=i),
                html=html.encode("utf-8"),
                text=text,
                lang=lang,
                title=title,
                description=description,
                # document-order hrefs: nav boilerplate renders first on
                # every page, then article anchors, then footer leftovers
                raw_links=["/", "/about"] + link_targets,
                published_at_meta=published_meta,
                updated_at_meta=updated_meta,
                is_valid_expected=bool(title and description and text and len(text) >= 120),
            )
        )
    return records


def _render_html(
    *,
    title: str,
    description: str,
    text: str,
    body_paras,
    links,
    published_meta,
    updated_meta,
    feed_link: bool,
    rng: random.Random,
) -> str:
    """Template a page. Anchors are embedded inside article paragraphs so the
    extraction spec's chunk-join semantics are actually exercised."""
    head = ["<html><head>", f"<title>{title}</title>"]
    if description:
        head.append(f'<meta name="description" content="{description}">')
    if published_meta:
        head.append(f'<meta property="article:published_time" content="{published_meta}">')
    if updated_meta:
        head.append(f'<meta property="article:modified_time" content="{updated_meta}">')
    if feed_link:
        head.append('<link rel="alternate" type="application/rss+xml" href="/feed.xml">')
    head.append("</head><body>")
    head.append('<nav><a href="/">Home</a> <a href="/about">About</a></nav>')

    leftovers: list = []
    if body_paras is None:
        # duplicated body: single paragraph holding the reused text;
        # all links render in the footer outside the article
        paras_html = [f"<p>{text}</p>"]
        leftovers = list(links)
    else:
        paras_html = []
        link_iter = iter(links)
        for para in body_paras:
            words = list(para)
            # wrap a random interior word in an anchor for ~half the paragraphs
            if len(words) > 6 and rng.random() < 0.5:
                k = rng.randint(2, len(words) - 3)
                href = next(link_iter, None)
                if href is not None:
                    words[k] = f'<a href="{href}">{words[k]}</a>'
            paras_html.append("<p>" + " ".join(words) + "</p>")
        # links not consumed by inline anchors render in a footer OUTSIDE
        # the article so content text stays pure
        leftovers = list(link_iter)

    parts = head + ["<article>"] + paras_html + ["</article>"]
    if leftovers:
        parts.append("<footer>" + " ".join(f'<a href="{h}">more</a>' for h in leftovers) + "</footer>")
    parts.append('<script>var x = "not content";</script>')
    parts.append("</body></html>")
    return "\n".join(parts)


def pages_dataframe(spark, records: list[PageRecord]):
    """records -> Spark DataFrame with the input_hint schema."""
    from .schemas import PAGES

    rows = [
        (r.url, r.warc_ts, r.html, r.text, r.lang)
        for r in records
    ]
    return spark.createDataFrame(rows, schema=PAGES)
