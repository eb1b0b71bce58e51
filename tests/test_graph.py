"""Link graph + PageRank vs NumPy oracle (reference constants + dangling drop)."""

import pytest

from search_engine_spark.corpus import FIXED_NOW, generate_pages, pages_dataframe
from search_engine_spark.operators.documents import build_documents
from search_engine_spark.operators.link_graph import build_links_resolved
from search_engine_spark.operators.pagerank import build_document_authority
from search_engine_spark.oracle import OracleIndex

TOL = 1e-12


def test_links_resolved_match_oracle(docs, oracle):
    url_by_id = {r["doc_id"]: r["url"] for r in docs.select("doc_id", "url").collect()}
    got = {
        (url_by_id[r["source_doc_id"]], url_by_id[r["target_doc_id"]])
        for r in build_links_resolved(docs).collect()
    }
    assert got == oracle.resolved_edges()


def test_pagerank_matches_oracle(docs, oracle):
    url_by_id = {r["doc_id"]: r["url"] for r in docs.select("doc_id", "url").collect()}
    edges = build_links_resolved(docs)
    auth = build_document_authority(docs, edges).collect()
    want = oracle.pagerank()
    assert len(auth) == len(want)
    for r in auth:
        url = url_by_id[r["doc_id"]]
        pr, inl = want[url]
        assert abs(r["pagerank"] - pr) < 1e-9, url
        assert r["inlink_count"] == inl, url
    # dangling mass dropped: total < 1 (reference quirk)
    assert sum(r["pagerank"] for r in auth) < 1.0


def test_pagerank_convergent_mode(docs):
    edges = build_links_resolved(docs)
    fixed = {
        r["doc_id"]: r["pagerank"]
        for r in build_document_authority(docs, edges, iterations=30).collect()
    }
    tolstop = {
        r["doc_id"]: r["pagerank"]
        for r in build_document_authority(
            docs, edges, iterations=30, tol=1e-12
        ).collect()
    }
    # tol-mode must land on the same fixed point (early stop, same answer)
    for k, v in fixed.items():
        assert abs(tolstop[k] - v) < 1e-6
