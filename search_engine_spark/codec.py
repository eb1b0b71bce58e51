"""Posting-list codec: docID-delta + varint, block-independent, with
block-max / block-last / block-offset skip metadata.

The Spark-native inverted index stores one row per (term, shard) with a
binary posting list (north_rule). Blocks of BLOCK_SIZE postings are
independently decodable so block-max WAND can skip whole blocks without
touching their bytes:

    blob   := varint(n_postings) block*
    block  := varint(first_docid_unsigned)        # absolute, restarts deltas
              [varint(docid_delta)] * (block_len - 1)   # interleaved with:
              per posting: varint(f_title) varint(f_desc) varint(f_body)

Alongside the blob, three skip arrays (one entry per block) ride in table
columns so pruning never deserializes the blob:

- ``block_max``  : max weighted tf (3.2*f1 + 1.7*f2 + 1.0*f4) in the block —
  times idf at query time this bounds any doc's contribution (WAND)
- ``block_last`` : last (signed) doc id in the block — cursor seeks jump
  straight to the first block whose last >= target
- ``block_offset``: byte offset of the block in the blob — random access

Field frequencies stay separate (not pre-weighted) so query-time scoring can
apply the reference field weights (search_service.py:22-26) or true BM25
without rebuilding the index.

Closest reference analog: the B-tree ``idx_tokens_term``
(0001_initial_schema.py:72) — a lookup structure, not a compressed list; this
codec is a new capability required by BASELINE.json.

Pure Python over ``bytes``; each call handles a whole (term, shard) group
inside grouped-map pandas stages, not a row.
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


def weighted_tf(ft: int, fd: int, fb: int) -> float:
    """Reference field-weighted frequency (search_service.py:18-27)."""
    return W_TITLE * ft + W_DESC * fd + W_BODY * fb


def encode_postings(
    doc_ids: list[int], f_title: list[int], f_desc: list[int], f_body: list[int]
) -> tuple[bytes, list[float], list[int], list[int]]:
    """Encode one (term, shard) posting list (doc_ids sorted ascending int64).

    Returns (blob, block_max, block_last, block_offset).
    """
    buf = bytearray()
    _write_varint(buf, len(doc_ids))
    block_max: list[float] = []
    block_last: list[int] = []
    block_offset: list[int] = []
    cur_max = 0.0
    prev_u = 0
    for i, doc in enumerate(doc_ids):
        u = to_unsigned(doc)
        if i % BLOCK_SIZE == 0:
            block_offset.append(len(buf))
            _write_varint(buf, u)  # absolute restart
            cur_max = 0.0
        else:
            _write_varint(buf, u - prev_u)
        prev_u = u
        ft, fd, fb = f_title[i], f_desc[i], f_body[i]
        _write_varint(buf, ft)
        _write_varint(buf, fd)
        _write_varint(buf, fb)
        w = W_TITLE * ft + W_DESC * fd + W_BODY * fb
        if w > cur_max:
            cur_max = w
        if (i + 1) % BLOCK_SIZE == 0 or i + 1 == len(doc_ids):
            block_max.append(cur_max)
            block_last.append(doc)
    return bytes(buf), block_max, block_last, block_offset


def decode_block(
    data: bytes, offset: int, n_in_block: int
) -> tuple[list[int], list[int], list[int], list[int]]:
    """Decode one block given its byte offset and posting count."""
    pos = offset
    doc_ids: list[int] = []
    f_title: list[int] = []
    f_desc: list[int] = []
    f_body: list[int] = []
    prev = 0
    for i in range(n_in_block):
        v, pos = _read_varint(data, pos)
        prev = v if i == 0 else prev + v
        doc_ids.append(to_signed(prev))
        ft, pos = _read_varint(data, pos)
        fd, pos = _read_varint(data, pos)
        fb, pos = _read_varint(data, pos)
        f_title.append(ft)
        f_desc.append(fd)
        f_body.append(fb)
    return doc_ids, f_title, f_desc, f_body


def postings_count(data: bytes) -> int:
    n, _ = _read_varint(data, 0)
    return n


def block_length(n_postings: int, block_idx: int, n_blocks: int) -> int:
    """Posting count of block ``block_idx``."""
    if block_idx < n_blocks - 1:
        return BLOCK_SIZE
    rem = n_postings - (n_blocks - 1) * BLOCK_SIZE
    return rem


def decode_postings(
    data: bytes,
) -> tuple[list[int], list[int], list[int], list[int]]:
    """Decode the whole list -> (doc_ids, f_title, f_desc, f_body)."""
    n, pos = _read_varint(data, 0)
    doc_ids: list[int] = []
    f_title: list[int] = []
    f_desc: list[int] = []
    f_body: list[int] = []
    prev = 0
    for i in range(n):
        v, pos = _read_varint(data, pos)
        prev = v if i % BLOCK_SIZE == 0 else prev + v
        doc_ids.append(to_signed(prev))
        ft, pos = _read_varint(data, pos)
        fd, pos = _read_varint(data, pos)
        fb, pos = _read_varint(data, pos)
        f_title.append(ft)
        f_desc.append(fd)
        f_body.append(fb)
    return doc_ids, f_title, f_desc, f_body
