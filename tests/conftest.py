import pytest

from search_engine_spark.corpus import FIXED_NOW, generate_pages, pages_dataframe
from search_engine_spark.oracle import OracleIndex
from search_engine_spark.session import get_spark

CORPUS_N = 200
CORPUS_SEED = 42


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def corpus():
    """Shared deterministic corpus (200 pages, seed 42)."""
    return generate_pages(n_pages=CORPUS_N, seed=CORPUS_SEED)


@pytest.fixture(scope="session")
def oracle(corpus):
    return OracleIndex(corpus, FIXED_NOW)


@pytest.fixture(scope="session")
def docs(spark, corpus):
    from search_engine_spark.operators.documents import build_documents

    d = build_documents(pages_dataframe(spark, corpus), FIXED_NOW).cache()
    d.count()
    return d


@pytest.fixture(scope="session")
def tokens(docs):
    from search_engine_spark.operators.tokens import build_tokens

    t = build_tokens(docs).cache()
    t.count()
    return t


@pytest.fixture(scope="session")
def term_stats(tokens, docs):
    from search_engine_spark.operators.term_stats import build_term_statistics

    s = build_term_statistics(tokens, docs).cache()
    s.count()
    return s


@pytest.fixture(scope="session")
def postings3(tokens):
    """Postings split over 3 doc-range shards (exercises the salted path)."""
    from search_engine_spark.operators.postings import build_postings

    p = build_postings(tokens, n_shards=3).cache()
    p.count()
    return p
