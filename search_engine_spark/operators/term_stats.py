"""Corpus + per-term statistics (reference ``bm25_stats.py``).

- corpus stats (A1): AVG(word_count), COUNT(*) over done documents
- per-term DF (A2): COUNT(DISTINCT doc_id) GROUP BY term
- idf: LN((N - df + 0.5) / (df + 0.5) + 1)  — Robertson/Lucene BM25 idf,
  verbatim from ``bm25_stats.py:21``
- CTF: SUM(frequency) — needed by the postings table (north_rule), no
  reference counterpart

Scale notes: COUNT(DISTINCT) must NOT be computed with countDistinct here —
Spark plans mixed distinct aggregates via Expand + a final shuffle keyed on
``term`` alone, so a Zipf head term funnels its entire doc list through one
reducer (measured: the stage gets *slower* going local[8] -> local[32]).
Instead: two-phase exact distinct — first groupBy (term, doc_id), whose
shuffle key is uniformly distributed, then groupBy term over the collapsed
pairs, where map-side partial aggregation bounds every reducer's input at
|vocab| rows per map partition. Same exact result, skew-free by
construction.
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
    per_doc = tokens.groupBy("term", "doc_id").agg(
        F.sum("frequency").alias("tf_doc")
    )
    return (
        per_doc.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("doc_frequency"),
            F.sum("tf_doc").alias("ctf"),
        )
        .withColumn("idf", idf_col(doc_total, F.col("doc_frequency")))
        .withColumn("avg_doc_len", F.lit(avg_doc_len))
        .select("term", "doc_frequency", "idf", "avg_doc_len", "ctf")
    )


def idf_py(doc_total: int, df: int) -> float:
    """Driver-side scalar twin of idf_col (for tests / query planning)."""
    return math.log((doc_total - df + 0.5) / (df + 0.5) + 1.0)
