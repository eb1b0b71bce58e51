"""Corpus + per-term statistics (reference ``bm25_stats.py``).

- corpus stats (A1): AVG(word_count), COUNT(*) over done documents
- per-term DF (A2): COUNT(DISTINCT doc_id) GROUP BY term
- idf: LN((N - df + 0.5) / (df + 0.5) + 1)  — Robertson/Lucene BM25 idf,
  verbatim from ``bm25_stats.py:21``
- CTF: SUM(frequency) — needed by the postings table (north_rule), no
  reference counterpart

Scale notes: the groupBy('term') is a hash aggregation with map-side partial
aggregation (Catalyst plans partial_count(distinct ...) automatically);
head terms are fine here because partial aggregation collapses each
partition's contribution to one row per term before the shuffle.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_stats(documents: DataFrame) -> tuple[float, int]:
    """(avg_doc_len, doc_total) with reference null-coalescing
    (``bm25_stats.py:10-13``: avg None -> 0.0, count 0 -> 1)."""
    row = documents.agg(
        F.avg("word_count").alias("avg_doc_len"),
        F.count(F.lit(1)).alias("doc_total"),
    ).first()
    avg_doc_len = float(row["avg_doc_len"]) if row["avg_doc_len"] is not None else 0.0
    doc_total = int(row["doc_total"]) or 1
    return avg_doc_len, doc_total


def idf_col(doc_total: int, df_col: F.Column) -> F.Column:
    """LN((N - df + 0.5)/(df + 0.5) + 1) with N a plan-time literal."""
    n = F.lit(float(doc_total))
    dfd = df_col.cast("double")
    return F.log((n - dfd + 0.5) / (dfd + 0.5) + 1.0)


def build_term_statistics(tokens: DataFrame, documents: DataFrame) -> DataFrame:
    """tokens + documents -> term_statistics(term, doc_frequency, idf,
    avg_doc_len, ctf)."""
    avg_doc_len, doc_total = corpus_stats(documents)
    return (
        tokens.groupBy("term")
        .agg(
            F.countDistinct("doc_id").alias("doc_frequency"),
            F.sum("frequency").alias("ctf"),
        )
        .withColumn("idf", idf_col(doc_total, F.col("doc_frequency")))
        .withColumn("avg_doc_len", F.lit(avg_doc_len))
        .select("term", "doc_frequency", "idf", "avg_doc_len", "ctf")
    )


def idf_py(doc_total: int, df: int) -> float:
    """Driver-side scalar twin of idf_col (for tests / query planning)."""
    return math.log((doc_total - df + 0.5) / (df + 0.5) + 1.0)
