"""API/MCP facade: bounds, markdown format, JSON shapes (main.py/server.py)."""

import pytest

from search_engine_spark.api import (
    SearchAPI,
    bounded,
    format_results_markdown,
)
from search_engine_spark.query.search import SearchEngine, SearchResponse, SearchResult


def test_bounded_clamps():
    assert bounded(0, -5) == (1, 0)
    assert bounded(500, 3) == (100, 3)
    assert bounded(10, 0) == (10, 0)


def test_markdown_format_verbatim():
    resp = SearchResponse(
        results=[
            SearchResult(title="T1", description="D1", url="https://a", score=1.0),
            SearchResult(title="T2", description="D2", url="https://b", score=0.5),
        ],
        count=2,
    )
    assert format_results_markdown(resp) == (
        "[https://a](T1)\nD1\n\n[https://b](T2)\nD2"
    )
    assert format_results_markdown(SearchResponse(results=[], count=0)) == ""


@pytest.fixture(scope="module")
def api(docs, tokens, term_stats):
    return SearchAPI(engine=SearchEngine(docs, tokens, term_stats))


def test_search_web_markdown(api, docs):
    # pick a word guaranteed in the corpus
    from pyspark.sql import functions as F

    word = (
        docs.select(F.explode(F.split(F.lower("content"), " ")).alias("w"))
        .filter(F.length("w") > 4)
        .groupBy("w")
        .count()
        .orderBy(F.desc("count"))
        .first()["w"]
    )
    md = api.search_web(word, limit=3)
    assert md.count("](") >= 1
    assert md == md.strip()


def test_web_search_json_shape(api):
    out = api.web_search("zzzznotaword")
    assert out == {"results": [], "count": 0}


def test_spellcheck_disabled(api):
    assert api.spellcheck_suggest("anything") == {"suggestion": None}
