"""documents -> tokens: field-tagged term frequencies (row-form index).

Reference semantics (``worker.py:229-234``): per document, tokenize title
(field=1), description (field=2), body (field=4) independently; one row per
(doc_id, term, field) with its frequency.

Spark shape: a single Arrow pass computes all three token maps, then ONE
posexplode over the field array + one explode over the map — no per-field
re-scan, no shuffle (explode is a narrow transform). The downstream
aggregations (term stats, postings) shuffle on ``term``, which is where
Zipf head-term skew lives — handled there, not here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..udfs import tokenize_udf

# field ids per worker.py:230-234
FIELD_IDS = [1, 2, 4]
_FIELD_SOURCES = ["title", "description", "content"]


def build_tokens(documents: DataFrame) -> DataFrame:
    """documents -> tokens(doc_id, term, field, frequency)."""
    with_maps = documents.select(
        "doc_id",
        *[
            tokenize_udf(src).alias(f"m{fid}")
            for fid, src in zip(FIELD_IDS, _FIELD_SOURCES)
        ],
    )
    field_expr = F.element_at(
        F.array(*[F.lit(fid) for fid in FIELD_IDS]), F.col("pos") + 1
    ).cast("smallint")
    return (
        with_maps.select(
            "doc_id",
            F.posexplode(F.array(*[f"m{fid}" for fid in FIELD_IDS])).alias(
                "pos", "token_map"
            ),
        )
        .select(
            "doc_id",
            field_expr.alias("field"),
            F.explode("token_map").alias("term", "frequency"),
        )
        .select("doc_id", "term", "field", "frequency")
    )
