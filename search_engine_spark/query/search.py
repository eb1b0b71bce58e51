"""End-to-end /search lifecycle over index DataFrames (SURVEY.md §3.1).

1. driver-side query analysis (stemmed terms + unstemmed words)
2. distributed candidate retrieval (IN-list scan -> broadcast idf join ->
   hash agg -> TakeOrderedAndProject top-k, url tie-break)
3. intent re-rank (native Columns over the <=2000 candidates)
4. pagination (list slice + the reference's count formula,
   ``search_service.py:341-342``)
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from .analysis import search_context
from .intent import rerank
from .retrieval import score_candidates


@dataclass
class SearchResult:
    title: str
    description: str
    url: str
    score: float


@dataclass
class SearchResponse:
    results: list
    count: int


class SearchEngine:
    """Search over built index tables (documents / tokens / term_statistics).

    Index DataFrames may be cached parquet/Iceberg reads; each query adds one
    short Spark job over them (the candidate scan + agg + top-k).
    """

    def __init__(
        self,
        documents: DataFrame,
        tokens: DataFrame,
        term_statistics: DataFrame,
    ) -> None:
        self.documents = documents
        self.tokens = tokens
        self.term_statistics = term_statistics

    def candidates_df(self, q: str, limit: int = 20, offset: int = 0) -> DataFrame | None:
        ctx = search_context(q, limit, offset)
        if ctx is None:
            return None
        return score_candidates(
            self.tokens,
            self.documents,
            self.term_statistics,
            ctx.query_terms,
            ctx.candidate_limit,
        )

    def search(self, q: str, limit: int = 20, offset: int = 0) -> SearchResponse:
        ctx = search_context(q, limit, offset)
        if ctx is None:
            return SearchResponse(results=[], count=0)

        candidates = score_candidates(
            self.tokens,
            self.documents,
            self.term_statistics,
            ctx.query_terms,
            ctx.candidate_limit,
        )
        ranked_rows = rerank(candidates, ctx).collect()

        page = [
            SearchResult(
                title=r["title"] or "",
                description=r["description"] or "",
                url=r["url"],
                score=float(r["score"]),
            )
            for r in ranked_rows[offset : offset + limit]
        ]
        # reference's odd count formula, reproduced verbatim (:341-342)
        count = max(len(ranked_rows), offset + len(page))
        return SearchResponse(results=page, count=count)
