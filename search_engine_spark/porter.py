"""Porter stemmer, NLTK-extensions mode, pure Python, zero dependencies.

Provenance: this is a from-scratch implementation of M.F. Porter's
published 1980 algorithm ("An algorithm for suffix stripping", Program
14(3):130-137) together with the NLTK project's publicly documented
NLTK_EXTENSIONS departures (nltk/stem/porter.py, Apache License 2.0 —
the departure LIST below is transcribed from its public docs/comments;
the code here is written fresh, not copied). Rationale: the reference
stems every token with ``nltk.stem.PorterStemmer()`` in its default
NLTK_EXTENSIONS mode (``app/crawler/tokenizer.py:33,39``); NLTK is not a
dependency of this engine, and stem-identity is a parity requirement, so
the exact variant is reimplemented:

- irregular-forms pool (sky, dying->die, news, proceed, ...)
- words of length <= 2 are returned unchanged
- step 1a: 4-letter ``*ies`` -> ``*ie`` (ties->tie, dies->die)
- step 1b: ``ied`` special case (tied->tie, studied->studi)
- step 1c: y->i only when preceded by a consonant and stem length > 1
  (enjoy->enjoy, cry->cri, say->say)
- cvc test treats a 2-letter vowel+consonant word as cvc
- step 2: ``alli`` -> ``al`` applied before ``bli``, re-running step 2;
  ``fulli``->``ful``; ``logi``->``log`` conditioned on m(word[:-3])>0

This module is driver- and executor-safe (stateless functions over strings),
used inside Arrow-batched pandas UDFs; it performs no I/O.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")

_IRREGULAR_FORMS = {
    "sky": ["sky", "skies"],
    "die": ["dying"],
    "lie": ["lying"],
    "tie": ["tying"],
    "news": ["news"],
    "inning": ["innings", "inning"],
    "outing": ["outings", "outing"],
    "canning": ["cannings", "canning"],
    "howe": ["howe"],
    "proceed": ["proceed"],
    "exceed": ["exceed"],
    "succeed": ["succeed"],
}

_POOL: dict[str, str] = {}
for _key, _vals in _IRREGULAR_FORMS.items():
    for _val in _vals:
        _POOL[_val] = _key


def _is_consonant(word: str, i: int) -> bool:
    if word[i] in _VOWELS:
        return False
    if word[i] == "y":
        if i == 0:
            return True
        return not _is_consonant(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """m() from the paper: number of VC sequences in the c/v run encoding."""
    cv_sequence = []
    for i in range(len(stem)):
        cv_sequence.append("c" if _is_consonant(stem, i) else "v")
    # collapse runs
    collapsed = []
    for ch in cv_sequence:
        if not collapsed or collapsed[-1] != ch:
            collapsed.append(ch)
    return "".join(collapsed).count("vc")


def _has_positive_measure(stem: str) -> bool:
    return _measure(stem) > 0


def _contains_vowel(stem: str) -> bool:
    return any(not _is_consonant(stem, i) for i in range(len(stem)))


def _ends_double_consonant(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_consonant(word, len(word) - 1)
    )


def _ends_cvc(word: str) -> bool:
    return (
        len(word) >= 3
        and _is_consonant(word, len(word) - 3)
        and not _is_consonant(word, len(word) - 2)
        and _is_consonant(word, len(word) - 1)
        and word[-1] not in ("w", "x", "y")
    ) or (
        # NLTK extension: a two-letter vowel+consonant word counts as cvc.
        len(word) == 2
        and not _is_consonant(word, 0)
        and _is_consonant(word, 1)
    )


def _replace_suffix(word: str, suffix: str, replacement: str) -> str:
    if suffix == "":
        return word + replacement
    return word[: -len(suffix)] + replacement


def _apply_rule_list(word: str, rules) -> str:
    """Apply the first matching (suffix, replacement, condition) rule.

    A matched suffix whose condition fails terminates the scan (Porter's
    'longest match among the rules' semantics as implemented by NLTK).
    """
    for suffix, replacement, condition in rules:
        if suffix == "*d" and _ends_double_consonant(word):
            stem = word[:-2]
            if condition is None or condition(stem):
                return stem + replacement
            return word
        if word.endswith(suffix):
            stem = _replace_suffix(word, suffix, "")
            if condition is None or condition(stem):
                return stem + replacement
            return word
    return word


def _step1a(word: str) -> str:
    if word.endswith("ies") and len(word) == 4:
        return _replace_suffix(word, "ies", "ie")
    return _apply_rule_list(
        word,
        [
            ("sses", "ss", None),
            ("ies", "i", None),
            ("ss", "ss", None),
            ("s", "", None),
        ],
    )


def _step1b(word: str) -> str:
    if word.endswith("ied"):
        if len(word) == 4:
            return _replace_suffix(word, "ied", "ie")
        return _replace_suffix(word, "ied", "i")

    if word.endswith("eed"):
        stem = _replace_suffix(word, "eed", "")
        if _measure(stem) > 0:
            return stem + "ee"
        return word

    rule_2_or_3_succeeded = False
    intermediate_stem = word
    for suffix in ("ed", "ing"):
        if word.endswith(suffix):
            intermediate_stem = _replace_suffix(word, suffix, "")
            if _contains_vowel(intermediate_stem):
                rule_2_or_3_succeeded = True
            break
    if not rule_2_or_3_succeeded:
        return word

    last = intermediate_stem[-1] if intermediate_stem else ""
    return _apply_rule_list(
        intermediate_stem,
        [
            ("at", "ate", None),
            ("bl", "ble", None),
            ("iz", "ize", None),
            ("*d", last, lambda stem: last not in ("l", "s", "z")),
            ("", "e", lambda stem: _measure(stem) == 1 and _ends_cvc(stem)),
        ],
    )


def _step1c(word: str) -> str:
    def nltk_condition(stem: str) -> bool:
        return len(stem) > 1 and _is_consonant(stem, len(stem) - 1)

    return _apply_rule_list(word, [("y", "i", nltk_condition)])


def _step2(word: str) -> str:
    if word.endswith("alli") and _has_positive_measure(
        _replace_suffix(word, "alli", "")
    ):
        return _step2(_replace_suffix(word, "alli", "al"))

    rules = [
        ("ational", "ate", _has_positive_measure),
        ("tional", "tion", _has_positive_measure),
        ("enci", "ence", _has_positive_measure),
        ("anci", "ance", _has_positive_measure),
        ("izer", "ize", _has_positive_measure),
        ("bli", "ble", _has_positive_measure),
        ("alli", "al", _has_positive_measure),
        ("entli", "ent", _has_positive_measure),
        ("eli", "e", _has_positive_measure),
        ("ousli", "ous", _has_positive_measure),
        ("ization", "ize", _has_positive_measure),
        ("ation", "ate", _has_positive_measure),
        ("ator", "ate", _has_positive_measure),
        ("alism", "al", _has_positive_measure),
        ("iveness", "ive", _has_positive_measure),
        ("fulness", "ful", _has_positive_measure),
        ("ousness", "ous", _has_positive_measure),
        ("aliti", "al", _has_positive_measure),
        ("iviti", "ive", _has_positive_measure),
        ("biliti", "ble", _has_positive_measure),
        ("fulli", "ful", _has_positive_measure),
        ("logi", "log", lambda stem: _has_positive_measure(word[:-3])),
    ]
    return _apply_rule_list(word, rules)


def _step3(word: str) -> str:
    return _apply_rule_list(
        word,
        [
            ("icate", "ic", _has_positive_measure),
            ("ative", "", _has_positive_measure),
            ("alize", "al", _has_positive_measure),
            ("iciti", "ic", _has_positive_measure),
            ("ical", "ic", _has_positive_measure),
            ("ful", "", _has_positive_measure),
            ("ness", "", _has_positive_measure),
        ],
    )


def _step4(word: str) -> str:
    measure_gt_1 = lambda stem: _measure(stem) > 1  # noqa: E731
    return _apply_rule_list(
        word,
        [
            ("al", "", measure_gt_1),
            ("ance", "", measure_gt_1),
            ("ence", "", measure_gt_1),
            ("er", "", measure_gt_1),
            ("ic", "", measure_gt_1),
            ("able", "", measure_gt_1),
            ("ible", "", measure_gt_1),
            ("ant", "", measure_gt_1),
            ("ement", "", measure_gt_1),
            ("ment", "", measure_gt_1),
            ("ent", "", measure_gt_1),
            (
                "ion",
                "",
                lambda stem: _measure(stem) > 1 and stem[-1] in ("s", "t"),
            ),
            ("ou", "", measure_gt_1),
            ("ism", "", measure_gt_1),
            ("ate", "", measure_gt_1),
            ("iti", "", measure_gt_1),
            ("ous", "", measure_gt_1),
            ("ive", "", measure_gt_1),
            ("ize", "", measure_gt_1),
        ],
    )


def _step5a(word: str) -> str:
    if word.endswith("e"):
        stem = _replace_suffix(word, "e", "")
        if _measure(stem) > 1:
            return stem
        if _measure(stem) == 1 and not _ends_cvc(stem):
            return stem
    return word


def _step5b(word: str) -> str:
    return _apply_rule_list(
        word, [("ll", "l", lambda stem: _measure(word[:-1]) > 1)]
    )


def porter_stem(word: str) -> str:
    """Stem one lowercase word. Callers lowercase first (the tokenizer does)."""
    stem = word.lower()
    if stem in _POOL:
        return _POOL[stem]
    if len(word) <= 2:
        return stem
    stem = _step1a(stem)
    stem = _step1b(stem)
    stem = _step1c(stem)
    stem = _step2(stem)
    stem = _step3(stem)
    stem = _step4(stem)
    stem = _step5a(stem)
    stem = _step5b(stem)
    return stem
