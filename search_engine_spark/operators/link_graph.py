"""Link graph: outgoing links -> resolved doc-id edges (reference J4/G1).

``link_graph_builder.py:6-18``: INSERT INTO links_resolved SELECT DISTINCT
src_doc_id, d.id FROM links_outgoing JOIN documents d ON d.url = target_url.

Spark shape: explode the per-document links array (produced once by the
extraction pass — E3), join on normalized target url against the documents
dimension, DISTINCT. The join is a plain equi-join; Catalyst/AQE pick
broadcast vs sort-merge by size (the documents side is projected to
(url, doc_id) only, so at moderate corpus sizes it broadcasts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_links_outgoing(documents: DataFrame) -> DataFrame:
    """documents (with ``links`` array) -> (source_doc_id, target_url)."""
    return documents.select(
        F.col("doc_id").alias("source_doc_id"),
        F.explode("links").alias("target_url"),
    )


def build_links_resolved(documents: DataFrame) -> DataFrame:
    """-> distinct (source_doc_id, target_doc_id) edges into indexed docs."""
    outgoing = build_links_outgoing(documents)
    targets = documents.select(
        F.col("url").alias("target_url"), F.col("doc_id").alias("target_doc_id")
    )
    return (
        outgoing.join(targets, "target_url", "inner")
        .select("source_doc_id", "target_doc_id")
        .distinct()
    )
