"""Spellcheck: dictionary build, candidate generation, correction choice.

Reference parity targets: ``app/spellcheck/engine.py`` (OSA distance,
correction thresholds, case preservation) and ``app/api/main.py:20-197``
(known/suspect partition, trigram candidate join, suggestion assembly).
"""

from .engine import (
    MAX_EDIT_DISTANCE,
    apply_case,
    choose_correction,
    normalize_word,
    osa_distance,
    popularity_score,
)
from .service import SpellcheckService, trigram_candidates

__all__ = [
    "MAX_EDIT_DISTANCE",
    "normalize_word",
    "osa_distance",
    "popularity_score",
    "choose_correction",
    "apply_case",
    "SpellcheckService",
    "trigram_candidates",
]
