"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship scoring query at sf0.001; ``queries`` /
``oracle_sql`` expose one (Spark, DuckDB-SQL) pair per SQL-expressible
operator from SURVEY.md §2 — definitions live in
``search_engine_spark/driver_queries.py`` so both sides stay in sync.
Non-SQL-expressible operators (Porter-stemmed scoring, WAND block decode)
are verified in pytest against the pure-Python oracle instead
(FIXTURES.md §4); the varint postings framing and PageRank are paired
(``postings_bytes``, ``pagerank``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from search_engine_spark import driver_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return driver_queries.q_search_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(driver_queries.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each queries() entry."""
    return dict(driver_queries.ORACLES)
