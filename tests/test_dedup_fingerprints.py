"""Exact dedup + fingerprints (U7 / E15)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from search_engine_spark.corpus import FIXED_NOW, generate_pages, pages_dataframe
from search_engine_spark.operators.documents import build_documents
from search_engine_spark.operators.fingerprints import build_fingerprints, exact_dedup
from search_engine_spark.simhash_impl import simhash_text


def test_corpus_has_duplicates(docs):
    total = docs.count()
    distinct_contents = docs.select("content").distinct().count()
    assert distinct_contents < total, "generator should produce exact dups"


def test_exact_dedup_keeps_min_url_per_content(docs):
    rows = docs.select("url", "content").collect()
    by_content = {}
    for r in rows:
        by_content.setdefault(r["content"], []).append(r["url"])
    want = {min(urls) for urls in by_content.values()}
    got = {r["url"] for r in exact_dedup(docs).collect()}
    assert got == want


def test_dedup_is_idempotent_and_content_unique(docs):
    once = exact_dedup(docs)
    assert once.count() == once.select("content").distinct().count()
    assert exact_dedup(once).count() == once.count()


def test_fingerprints_match_python(docs):
    sample = docs.limit(20).collect()
    fps = {r["doc_id"]: r for r in build_fingerprints(docs).collect()}
    for r in sample:
        fp = fps[r["doc_id"]]
        assert fp["content_sha256"] == hashlib.sha256(
            r["content"].encode()
        ).hexdigest()
        assert fp["simhash"] == simhash_text(r["content"])


def test_identical_content_identical_simhash(docs):
    joined = (
        build_fingerprints(docs)
        .join(docs.select("doc_id", "content"), "doc_id")
        .groupBy("content")
        .agg(F.countDistinct("simhash").alias("n"))
        .filter(F.col("n") > 1)
    )
    assert joined.count() == 0
