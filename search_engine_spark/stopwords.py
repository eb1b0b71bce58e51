"""Frozen English stopword list.

The reference loads NLTK's english stopword corpus at import time
(``app/crawler/tokenizer.py:13-31`` — a network download on first run, a
reproducibility hazard). We freeze the same list as a constant: this is the
standard NLTK `stopwords/english` corpus (179 entries, including contraction
fragments like ``don`` / ``won`` / ``ll`` that matter because the token regex
``[a-zA-Z0-9]{2,}`` splits "don't" into ``don`` + ``t``).

The reference's offline fallback list (``tokenizer.py:6-10``) is kept for
completeness but the primary list is authoritative — it is what a deployed
reference instance uses.
"""

from __future__ import annotations

# NLTK stopwords/english snapshot (public corpus), order preserved.
NLTK_ENGLISH_STOPWORDS: tuple[str, ...] = (
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves",
    "you", "you're", "you've", "you'll", "you'd", "your", "yours",
    "yourself", "yourselves", "he", "him", "his", "himself", "she",
    "she's", "her", "hers", "herself", "it", "it's", "its", "itself",
    "they", "them", "their", "theirs", "themselves", "what", "which",
    "who", "whom", "this", "that", "that'll", "these", "those", "am",
    "is", "are", "was", "were", "be", "been", "being", "have", "has",
    "had", "having", "do", "does", "did", "doing", "a", "an", "the",
    "and", "but", "if", "or", "because", "as", "until", "while", "of",
    "at", "by", "for", "with", "about", "against", "between", "into",
    "through", "during", "before", "after", "above", "below", "to",
    "from", "up", "down", "in", "out", "on", "off", "over", "under",
    "again", "further", "then", "once", "here", "there", "when",
    "where", "why", "how", "all", "any", "both", "each", "few", "more",
    "most", "other", "some", "such", "no", "nor", "not", "only", "own",
    "same", "so", "than", "too", "very", "s", "t", "can", "will",
    "just", "don", "don't", "should", "should've", "now", "d", "ll",
    "m", "o", "re", "ve", "y", "ain", "aren", "aren't", "couldn",
    "couldn't", "didn", "didn't", "doesn", "doesn't", "hadn", "hadn't",
    "hasn", "hasn't", "haven", "haven't", "isn", "isn't", "ma",
    "mightn", "mightn't", "mustn", "mustn't", "needn", "needn't",
    "shan", "shan't", "shouldn", "shouldn't", "wasn", "wasn't",
    "weren", "weren't", "won", "won't", "wouldn", "wouldn't",
)

# Reference fallback list (app/crawler/tokenizer.py:6-10) — used there only
# when the NLTK corpus cannot be fetched.
DEFAULT_STOPWORDS: frozenset[str] = frozenset(
    {
        "a", "an", "and", "are", "as", "at", "be", "but", "by", "for",
        "if", "in", "into", "is", "it", "no", "not", "of", "on", "or",
        "such", "that", "the", "their", "then", "there", "these",
        "they", "this", "to", "was", "will", "with",
    }
)

STOPWORDS: frozenset[str] = frozenset(NLTK_ENGLISH_STOPWORDS)
