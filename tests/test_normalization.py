"""URL normalization + registrable domain cases (reference normalization.py:6-58)."""

from search_engine_spark.normalization import normalize_url, registrable_domain


def test_normalize_lowercases_and_defaults():
    assert normalize_url("HTTP://Example.COM/Path") == "http://example.com/Path"
    assert normalize_url("example.com") == "https://example.com"
    assert normalize_url("https://example.com") == "https://example.com/"


def test_normalize_collapses_slashes_drops_fragment():
    assert normalize_url("https://a.com//x///y#frag") == "https://a.com/x/y"


def test_normalize_strips_tracking_params_keeps_rest():
    url = "https://a.com/p?utm_source=x&ref=keep&gclid=1&fbclid=2&UTM_MEDIUM=y"
    assert normalize_url(url) == "https://a.com/p?ref=keep"


def test_normalize_drops_blank_params():
    assert normalize_url("https://a.com/p?a=&b=1") == "https://a.com/p?b=1"


def test_registrable_domain_simple_and_multipart():
    assert registrable_domain("https://www.blog.example.com/x") == "example.com"
    assert registrable_domain("https://news.bbc.co.uk/") == "bbc.co.uk"
    assert registrable_domain("https://a.b.shop.com.au") == "shop.com.au"
    assert registrable_domain("https://example.com") == "example.com"
    assert registrable_domain("") == ""
    assert registrable_domain("https://localhost/x") == "localhost"
