"""Varint/delta postings codec: round-trip + skip-metadata properties."""

import math
import random

from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_spark.codec import (
    BLOCK_SIZE,
    block_length,
    decode_block,
    decode_postings,
    encode_postings,
    postings_count,
    weighted_tf,
)


def _random_case(rng, n):
    ids = set()
    while len(ids) < n:
        ids.add(rng.randint(-(2**63), 2**63 - 1))
    doc_ids = sorted(ids)
    f = lambda: [rng.randint(0, 5000) for _ in range(n)]  # noqa: E731
    return doc_ids, f(), f(), f()


@given(st.integers(min_value=0, max_value=100_000), st.integers(min_value=0, max_value=600))
@settings(max_examples=60, deadline=None)
def test_roundtrip(seed, n):
    rng = random.Random(seed)
    doc_ids, f1, f2, f4 = _random_case(rng, n)
    blob, block_max, block_last, block_offset = encode_postings(doc_ids, f1, f2, f4)
    assert postings_count(blob) == n
    assert decode_postings(blob) == (doc_ids, f1, f2, f4)

    want_blocks = math.ceil(n / BLOCK_SIZE) if n else 0
    assert len(block_max) == len(block_last) == len(block_offset) == want_blocks
    for i, d in enumerate(doc_ids):
        b = i // BLOCK_SIZE
        assert weighted_tf(f1[i], f2[i], f4[i]) <= block_max[b] + 1e-9
        assert d <= block_last[b]
    # every block independently decodable at its offset
    for b in range(want_blocks):
        ln = block_length(n, b, want_blocks)
        ids_b, f1_b, f2_b, f4_b = decode_block(blob, block_offset[b], ln)
        lo = b * BLOCK_SIZE
        assert ids_b == doc_ids[lo : lo + ln]
        assert f1_b == f1[lo : lo + ln]
        assert ids_b[-1] == block_last[b]


def test_empty():
    blob, bm, bl, bo = encode_postings([], [], [], [])
    assert decode_postings(blob) == ([], [], [], [])
    assert bm == bl == bo == []
    assert postings_count(blob) == 0


def test_extreme_doc_ids():
    ids = [-(2**63), -1, 0, 1, 2**63 - 1]
    one = [1] * 5
    blob, _, blast, _ = encode_postings(ids, one, one, one)
    assert decode_postings(blob)[0] == ids
    assert blast == [2**63 - 1]


def test_compression_is_real():
    # dense ascending ids compress far below 8 bytes/doc
    ids = list(range(0, 100_000, 3))
    one = [1] * len(ids)
    blob, _, _, _ = encode_postings(ids, one, one, one)
    assert len(blob) < len(ids) * 8


# ---------------------------------------------------------------------------
# Byte-length formula parity: the postings_bytes pair's DuckDB oracle
# recomputes blob sizes from an integer varint-length ladder. Prove (a) the
# framing formula matches the real encoder for arbitrary signed ids and tf
# streams, and (b) the SQL ladder text itself is exact at every 2^(7k)
# boundary, including the HUGEINT range used for block-restart ids.
# ---------------------------------------------------------------------------
def _vlen(v: int) -> int:
    assert v >= 0
    return max(1, -(-v.bit_length() // 7))


def _formula_bytes(doc_ids, f1, f2, f4):
    total = _vlen(len(doc_ids))
    prev_u = 0
    for i, d in enumerate(doc_ids):
        u = d + 2**63
        total += _vlen(u) if i % BLOCK_SIZE == 0 else _vlen(u - prev_u)
        prev_u = u
        total += _vlen(f1[i]) + _vlen(f2[i]) + _vlen(f4[i])
    return total


@given(st.integers(min_value=0, max_value=100_000), st.integers(min_value=0, max_value=600))
@settings(max_examples=60, deadline=None)
def test_blob_length_matches_varint_formula(seed, n):
    rng = random.Random(seed)
    doc_ids, f1, f2, f4 = _random_case(rng, n)
    blob, _, _, _ = encode_postings(doc_ids, f1, f2, f4)
    assert len(blob) == _formula_bytes(doc_ids, f1, f2, f4)


def test_sql_varint_ladder_is_exact():
    import duckdb

    from search_engine_spark.driver_queries_td import _varint_len_sql

    vals = [0, 1]
    for k in range(1, 10):
        b = 1 << (7 * k)
        vals += [b - 1, b]
    vals += [2**63 - 1, 2**63, 2**64 - 1]  # block-restart unsigned range
    rows = ", ".join(f"(CAST('{v}' AS HUGEINT))" for v in vals)
    got = [
        r[0]
        for r in duckdb.sql(
            f"SELECT {_varint_len_sql('v')} FROM (VALUES {rows}) t(v)"
        ).fetchall()
    ]
    assert got == [_vlen(v) for v in vals]
