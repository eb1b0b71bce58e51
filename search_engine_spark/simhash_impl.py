"""64-bit SimHash (Charikar 2002), matching the de-facto-standard Python
``simhash`` package defaults the reference uses (``duplicate_detection.py:63``:
``Simhash(content.split()).value``): f=64 bits, md5 feature hashing, unit
weights, majority vote per bit. The signed two's-complement wrap mirrors
``duplicate_detection.py:11-14`` (Postgres BIGINT).

Pure Python + hashlib only; vectorized over pandas Series in udfs.py.
"""

from __future__ import annotations

import hashlib
from collections import Counter

_F = 64
_MASK = (1 << _F) - 1


def _hash_feature(feature: str) -> int:
    # simhash package default hashfunc: md5 of utf-8 bytes -> int, low 64 bits.
    h = int(hashlib.md5(feature.encode("utf-8")).hexdigest(), 16)
    return h & _MASK


def simhash64(features) -> int:
    """Unsigned 64-bit simhash of an iterable of string features.

    Duplicate features accumulate weight (Counter), matching
    ``Simhash(list)`` semantics in the reference's library.
    """
    v = [0] * _F
    counted = Counter(features)
    if not counted:
        return 0
    for feature, weight in counted.items():
        h = _hash_feature(feature)
        for i in range(_F):
            if h & (1 << i):
                v[i] += weight
            else:
                v[i] -= weight
    ans = 0
    for i in range(_F):
        if v[i] > 0:
            ans |= 1 << i
    return ans


def to_signed64(value: int) -> int:
    """uint64 -> int64 two's-complement wrap (``duplicate_detection.py:11-14``)."""
    if value >= (1 << 63):
        return value - (1 << 64)
    return value


def simhash_text(content: str) -> int:
    """Signed simhash of whitespace-split content (reference semantics)."""
    return to_signed64(simhash64((content or "").split()))


def hamming64(a: int, b: int) -> int:
    """Hamming distance between two (possibly signed) 64-bit fingerprints."""
    return ((a ^ b) & _MASK).bit_count()
