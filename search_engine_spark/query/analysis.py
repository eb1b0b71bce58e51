"""Driver-side query analysis (reference ``search_service.py:224-240``).

The query is one short string — analyzing it is driver-side arithmetic, not a
distributed job. Two deliberately different tokenizations (``SURVEY.md §2.10``):

- ``query_terms``: stemmed + stopword-filtered — drives retrieval (index terms
  are stemmed)
- ``query_words``: UNstemmed, stopword-filtered, first-seen unique — drives
  the intent re-rank's hit counting
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from ..tokenizer import extract_query_words, tokenize

CANDIDATE_BUFFER = 200  # search_service.py:103
MAX_CANDIDATES = 2000  # search_service.py:104

_NON_ALNUM_RUN = re.compile(r"[^a-z0-9]+")


def normalize_text(text: str) -> str:
    """``search_service.py:150-151``."""
    return _NON_ALNUM_RUN.sub(" ", (text or "").lower()).strip()


def compact_text(text: str) -> str:
    """``search_service.py:197``."""
    return _NON_ALNUM_RUN.sub("", (text or "").lower())


@dataclass(frozen=True)
class QueryContext:
    query_terms: tuple[str, ...]
    query_phrase: str
    query_compact: str
    query_words: tuple[str, ...]
    total_terms: int
    candidate_limit: int


def search_context(q: str, limit: int, offset: int) -> QueryContext | None:
    """None iff the query tokenizes to nothing (stopword-only / empty) —
    the empty-response path (``search_service.py:226-227,313-314``)."""
    query_terms = tuple(tokenize(q).keys())
    if not query_terms:
        return None
    query_words = tuple(extract_query_words(q))
    return QueryContext(
        query_terms=query_terms,
        query_phrase=normalize_text(q),
        query_compact="".join(query_words),
        query_words=query_words,
        total_terms=len(query_terms),
        candidate_limit=min(
            MAX_CANDIDATES, max(offset + limit + CANDIDATE_BUFFER, limit * 10)
        ),
    )
