"""Varint/delta postings codec: round-trip + block-max properties."""

from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_spark.codec import (
    BLOCK_SIZE,
    decode_postings,
    encode_postings,
    weighted_tf,
)


@st.composite
def postings_lists(draw):
    n = draw(st.integers(min_value=0, max_value=600))
    doc_ids = sorted(
        draw(
            st.sets(
                st.integers(min_value=-(2**63), max_value=2**63 - 1),
                min_size=n,
                max_size=n,
            )
        )
    )
    freqs = lambda: draw(  # noqa: E731
        st.lists(st.integers(min_value=0, max_value=5000), min_size=n, max_size=n)
    )
    return doc_ids, freqs(), freqs(), freqs()


@given(postings_lists())
@settings(max_examples=150, deadline=None)
def test_roundtrip(p):
    doc_ids, f1, f2, f4 = p
    blob, block_max = encode_postings(doc_ids, f1, f2, f4)
    got = decode_postings(blob)
    assert got == (doc_ids, f1, f2, f4)
    # block structure
    import math

    want_blocks = math.ceil(len(doc_ids) / BLOCK_SIZE) if doc_ids else 0
    assert len(block_max) == want_blocks
    # each block max bounds its members
    for i, d in enumerate(doc_ids):
        b = i // BLOCK_SIZE
        assert weighted_tf(f1[i], f2[i], f4[i]) <= block_max[b] + 1e-9


def test_empty():
    blob, bm = encode_postings([], [], [], [])
    assert decode_postings(blob) == ([], [], [], [])
    assert bm == []


def test_extreme_doc_ids():
    ids = [-(2**63), -1, 0, 1, 2**63 - 1]
    one = [1] * 5
    blob, _ = encode_postings(ids, one, one, one)
    assert decode_postings(blob)[0] == ids


def test_compression_is_real():
    # dense ascending ids compress far below 8 bytes/doc
    ids = list(range(0, 100_000, 3))
    one = [1] * len(ids)
    blob, _ = encode_postings(ids, one, one, one)
    assert len(blob) < len(ids) * 8
