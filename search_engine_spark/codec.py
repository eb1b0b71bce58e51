"""Posting-list codec: docID-delta + varint, with block-max metadata.

The Spark-native inverted index stores one row per (term, part) with a binary
posting list (north_rule). Layout of ``postings`` bytes:

    varint(n_postings)
    then per posting, in ascending doc order:
        varint(docid_delta)   # unsigned-mapped doc ids (int64 + 2^63)
        varint(f_title) varint(f_desc) varint(f_body)

Field frequencies are kept separate (not pre-weighted) so query-time scoring
can apply the reference field weights 3.2/1.7/1.0 (search_service.py:22-26)
or proper BM25 per-field without rebuilding the index.

``block_max`` holds, per fixed-size block of BLOCK_SIZE postings, the maximum
*weighted* term frequency ``3.2*f1 + 1.7*f2 + 1.0*f4`` — multiplied by idf at
query time this upper-bounds any doc's contribution in the block, enabling
block-max WAND skipping.

Closest reference analog: the B-tree ``idx_tokens_term``
(0001_initial_schema.py:72) — a lookup structure, not a compressed list; this
codec is a new capability required by BASELINE.json.

Pure Python over ``bytes`` (executor-side inside grouped-map pandas stages);
encode/decode are branch-light loops — fast enough because each call handles
an entire term partition, not a row.
"""

from __future__ import annotations

BLOCK_SIZE = 128
_U63 = 1 << 63

# field weights, reference search_service.py:22-26
W_TITLE = 3.2
W_DESC = 1.7
W_BODY = 1.0


def _write_varint(buf: bytearray, value: int) -> None:
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7


def to_unsigned(doc_id: int) -> int:
    """int64 doc id -> order-preserving uint64 (add 2^63)."""
    return doc_id + _U63


def to_signed(u: int) -> int:
    return u - _U63


def encode_postings(
    doc_ids: list[int], f_title: list[int], f_desc: list[int], f_body: list[int]
) -> tuple[bytes, list[float]]:
    """Encode one term's postings (doc_ids MUST be sorted ascending, int64).

    Returns (binary postings, block_max list).
    """
    buf = bytearray()
    _write_varint(buf, len(doc_ids))
    prev = 0
    block_max: list[float] = []
    cur_max = 0.0
    for i, doc in enumerate(doc_ids):
        u = to_unsigned(doc)
        _write_varint(buf, u - prev)
        prev = u
        ft, fd, fb = f_title[i], f_desc[i], f_body[i]
        _write_varint(buf, ft)
        _write_varint(buf, fd)
        _write_varint(buf, fb)
        w = W_TITLE * ft + W_DESC * fd + W_BODY * fb
        if w > cur_max:
            cur_max = w
        if (i + 1) % BLOCK_SIZE == 0:
            block_max.append(cur_max)
            cur_max = 0.0
    if len(doc_ids) % BLOCK_SIZE != 0:
        block_max.append(cur_max)
    return bytes(buf), block_max


def decode_postings(
    data: bytes,
) -> tuple[list[int], list[int], list[int], list[int]]:
    """-> (doc_ids, f_title, f_desc, f_body), doc_ids ascending int64."""
    n, pos = _read_varint(data, 0)
    doc_ids: list[int] = []
    f_title: list[int] = []
    f_desc: list[int] = []
    f_body: list[int] = []
    prev = 0
    for _ in range(n):
        delta, pos = _read_varint(data, pos)
        prev += delta
        doc_ids.append(to_signed(prev))
        ft, pos = _read_varint(data, pos)
        fd, pos = _read_varint(data, pos)
        fb, pos = _read_varint(data, pos)
        f_title.append(ft)
        f_desc.append(fd)
        f_body.append(fb)
    return doc_ids, f_title, f_desc, f_body


def weighted_tf(ft: int, fd: int, fb: int) -> float:
    """Reference field-weighted frequency (search_service.py:18-27)."""
    return W_TITLE * ft + W_DESC * fd + W_BODY * fb
