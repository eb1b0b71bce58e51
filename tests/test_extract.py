"""Extraction spec tests: the per-row invariant extract(html) == pages.text."""

from datetime import datetime, timedelta, timezone

from search_engine_spark.corpus import FIXED_NOW, generate_pages
from search_engine_spark.extract import (
    compute_freshness,
    compute_quality,
    is_valid_document,
    parse_page,
)

NOW = FIXED_NOW


def test_extraction_matches_expected_text_on_corpus():
    records = generate_pages(n_pages=150, seed=42)
    for r in records:
        parsed = parse_page(r.url, r.html.decode("utf-8"), NOW)
        assert parsed.content == r.text, f"text mismatch for {r.url}"
        assert parsed.title == r.title
        assert parsed.description == r.description


def test_link_extraction_order_and_dedup():
    html = """
    <html><head><title>T</title><meta name="description" content="D"></head>
    <body><article><p>hello world content</p></article>
    <footer>
      <a href="https://b.com/x?utm_source=z">one</a>
      <a href="/rel">two</a>
      <a href="https://b.com/x">dup-after-normalize</a>
      <a href="HTTPS://B.com/y">case</a>
    </footer></body></html>
    """
    parsed = parse_page("https://a.com/base/", html, NOW)
    assert parsed.links == [
        "https://b.com/x",
        "https://a.com/rel",
        "https://b.com/y",
    ]


def test_script_style_and_boilerplate_excluded():
    html = (
        "<html><body><nav><a href='/'>Home</a></nav>"
        "<article><p>real content here</p>"
        "<script>var junk = 1;</script></article>"
        "<footer>footer junk</footer></body></html>"
    )
    parsed = parse_page("https://a.com/", html, NOW)
    assert parsed.content == "real content here"


def test_main_fallback_then_body():
    html = "<html><body><main><p>in main</p></main><p>outside</p></body></html>"
    assert parse_page("https://a.com/", html, NOW).content == "in main"
    html2 = "<html><body><p>only body</p></body></html>"
    assert parse_page("https://a.com/", html2, NOW).content == "only body"


def test_timestamp_extraction_and_future_rejection():
    past = (NOW - timedelta(days=10)).isoformat()
    future = (NOW + timedelta(days=10)).isoformat()
    html = (
        f'<html><head><meta property="article:published_time" content="{past}">'
        f'<meta property="article:modified_time" content="{future}"></head>'
        "<body><article>x</article></body></html>"
    )
    parsed = parse_page("https://a.com/", html, NOW)
    assert parsed.published_at == NOW - timedelta(days=10)
    assert parsed.updated_at is None  # future -> rejected (worker.py:135)


def test_naive_timestamp_coerced_to_utc():
    html = (
        '<html><head><meta property="article:published_time" '
        'content="2026-02-01T05:00:00"></head><body><article>x</article></body></html>'
    )
    parsed = parse_page("https://a.com/", html, NOW)
    assert parsed.published_at == datetime(2026, 2, 1, 5, tzinfo=timezone.utc)


def test_feed_link_discovery():
    html = (
        '<html><head><link rel="alternate" type="application/rss+xml" href="/feed.xml">'
        '<link rel="stylesheet" href="/style.css"></head>'
        "<body><article>x</article></body></html>"
    )
    parsed = parse_page("https://a.com/", html, NOW)
    assert parsed.feed_links == ["https://a.com/feed.xml"]


def test_quality_formula():
    # worker.py:146-152
    assert compute_quality("", 0) == 0.0
    content_300 = " ".join(["w"] * 300)
    assert compute_quality(content_300, 0) == 1.0
    assert abs(compute_quality(" ".join(["w"] * 150), 0) - 0.5) < 1e-12
    # link penalty caps at 0.4
    assert abs(compute_quality(content_300, 300) - 0.6) < 1e-12


def test_freshness_formula():
    assert compute_freshness(None, None, NOW) == 0.1
    assert compute_freshness(None, NOW, NOW) == 1.0
    old = NOW - timedelta(days=400)
    assert compute_freshness(None, old, NOW) == 0.0
    half = NOW - timedelta(days=182, hours=12)
    got = compute_freshness(None, half, NOW)
    assert abs(got - (1.0 - 182 / 365)) < 1e-9  # .days truncates


def test_validation_predicate():
    long = "x" * 120
    assert is_valid_document("t", "d", long)
    assert not is_valid_document("", "d", long)
    assert not is_valid_document("t", "", long)
    assert not is_valid_document("t", "d", "x" * 119)
