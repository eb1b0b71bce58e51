"""Tokenization with reference-identical semantics.

Pipeline (reference ``app/crawler/tokenizer.py:36-40``):

    lower() -> regex \\b[a-zA-Z0-9]{2,}\\b -> drop stopwords -> Porter stem
    -> Counter(term -> frequency)

Stopword filtering happens BEFORE stemming (so "having" -> dropped, but
"haves" -> stem "have" survives). The query path reuses the same function
(``app/api/search_service.py:225``); the unstemmed word extractor mirrors
``search_service.py:153-161``.
"""

from __future__ import annotations

import re
from collections import Counter

from .porter import porter_stem
from .stopwords import STOPWORDS

TOKEN_RE = re.compile(r"\b[a-zA-Z0-9]{2,}\b")

_STEM_CACHE: dict[str, str] = {}


def stem_cached(token: str) -> str:
    """Memoized Porter stem — Zipf token distribution makes this ~free."""
    s = _STEM_CACHE.get(token)
    if s is None:
        s = porter_stem(token)
        # bound memory in long-lived executors
        if len(_STEM_CACHE) < 1_000_000:
            _STEM_CACHE[token] = s
    return s


def tokenize(text: str) -> Counter:
    """text -> Counter of stemmed terms (reference ``tokenizer.py:36-40``)."""
    tokens = TOKEN_RE.findall((text or "").lower())
    return Counter(stem_cached(t) for t in tokens if t not in STOPWORDS)


def extract_query_words(text: str) -> list[str]:
    """Unstemmed, stopword-filtered, first-seen-ordered unique words.

    Mirrors ``search_service.py:153-161`` — used by the intent re-rank,
    which deliberately operates on UNstemmed words.
    """
    words: list[str] = []
    seen: set[str] = set()
    for term in TOKEN_RE.findall((text or "").lower()):
        if term in STOPWORDS or term in seen:
            continue
        words.append(term)
        seen.add(term)
    return words
