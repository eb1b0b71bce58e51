"""Shard-local block-max WAND top-k over compressed posting lists.

Runs inside one executor task per shard (document-partitioned search): every
query term's posting list for the shard's doc range is available locally, so
classic DAAT WAND applies, with block-level skipping powered by the codec's
skip arrays (block_max / block_last / block_offset) — pruned blocks are never
deserialized.

Scoring matches the reference exactly: contribution of term t to doc d is
``idf(t) * (3.2*f_title + 1.7*f_desc + 1.0*f_body)`` with idf defaulting to
1.0 for terms missing from term_statistics (search_service.py:13-40).

Tie safety for rank identity: the top-k threshold prunes strictly below
theta, and the final cut keeps every doc scoring >= the kth score — docs that
TIE at the boundary all survive to the global (score DESC, url ASC) reduce,
so the url tie-break is decided globally, never lost shard-side.

An exhaustive scorer (decode everything, accumulate) provides the oracle for
tests and a fallback for tiny shards.
"""

from __future__ import annotations

import heapq
from bisect import bisect_left
from dataclasses import dataclass

from ..codec import (
    block_length,
    decode_block,
    postings_count,
    weighted_tf,
)


@dataclass
class TermPostings:
    """One (term, shard) row handed to the scorer."""

    term: str
    idf: float
    blob: bytes
    block_max: list
    block_last: list
    block_offset: list


class _Cursor:
    __slots__ = (
        "idf",
        "blob",
        "block_max",
        "block_last",
        "block_offset",
        "n",
        "n_blocks",
        "max_score",
        "bi",
        "ids",
        "f1",
        "f2",
        "f4",
        "i",
        "doc",
        "exhausted",
        "stats",
    )

    def __init__(self, tp: TermPostings, stats: dict | None = None) -> None:
        self.idf = tp.idf
        self.blob = tp.blob
        self.block_max = tp.block_max
        self.block_last = tp.block_last
        self.block_offset = tp.block_offset
        self.n = postings_count(tp.blob)
        self.n_blocks = len(tp.block_offset)
        self.max_score = tp.idf * max(tp.block_max) if tp.block_max else 0.0
        self.stats = stats
        self.exhausted = self.n == 0
        if not self.exhausted:
            self._load_block(0)

    def _load_block(self, b: int) -> None:
        if self.stats is not None:
            self.stats["blocks_decoded"] = self.stats.get("blocks_decoded", 0) + 1
        self.ids, self.f1, self.f2, self.f4 = decode_block(
            self.blob, self.block_offset[b], block_length(self.n, b, self.n_blocks)
        )
        self.bi = b
        self.i = 0
        self.doc = self.ids[0]

    def block_upper(self) -> float:
        return self.idf * self.block_max[self.bi]

    def contribution(self) -> float:
        i = self.i
        return self.idf * weighted_tf(self.f1[i], self.f2[i], self.f4[i])

    def advance(self) -> None:
        self.i += 1
        if self.i < len(self.ids):
            self.doc = self.ids[self.i]
        elif self.bi + 1 < self.n_blocks:
            self._load_block(self.bi + 1)
        else:
            self.exhausted = True

    def seek(self, target: int) -> None:
        """Advance to first doc >= target, skipping blocks via block_last
        (skipped blocks are never decoded)."""
        if self.exhausted or self.doc >= target:
            return
        b = bisect_left(self.block_last, target, lo=self.bi)
        if b >= self.n_blocks:
            self.exhausted = True
            return
        if b != self.bi:
            self._load_block(b)
            lo = 0
        else:
            lo = self.i
        self.i = bisect_left(self.ids, target, lo=lo)
        # block_last[b] >= target guarantees i < len(ids)
        self.doc = self.ids[self.i]


def score_shard_exhaustive(entries: list) -> dict:
    """Decode-everything scorer -> {doc_id: (score, matched_terms)}."""
    from ..codec import decode_postings

    acc: dict = {}
    for tp in entries:
        ids, f1, f2, f4 = decode_postings(tp.blob)
        idf = tp.idf
        for j, d in enumerate(ids):
            c = idf * weighted_tf(f1[j], f2[j], f4[j])
            if d in acc:
                s, m = acc[d]
                acc[d] = (s + c, m + 1)
            else:
                acc[d] = (c, 1)
    return acc


def score_shard_wand(entries: list, k: int, stats: dict | None = None) -> list:
    """Block-max WAND top-k -> [(doc_id, score, matched_terms)], every doc
    scoring >= the kth score included (boundary ties preserved).

    ``stats`` (optional dict) accumulates ``blocks_decoded`` and
    ``blocks_total`` so pruning effectiveness is observable — a skipped
    block is one the codec never deserializes.
    """
    if stats is not None:
        stats["blocks_total"] = stats.get("blocks_total", 0) + sum(
            len(tp.block_offset) for tp in entries
        )
    cursors = [
        _Cursor(tp, stats) for tp in entries if postings_count(tp.blob)
    ]
    cursors = [c for c in cursors if not c.exhausted]
    if not cursors:
        return []

    heap: list = []  # min-heap of the top-k scores
    theta = float("-inf")
    evaluated: list = []

    active = cursors
    while active:
        active.sort(key=lambda c: c.doc)
        # pivot: first cursor where the cumulative upper bound reaches theta
        cum = 0.0
        pivot_idx = -1
        for idx, c in enumerate(active):
            cum += c.max_score
            if len(heap) < k or cum >= theta:
                pivot_idx = idx
                break
        if pivot_idx == -1:
            break  # total remaining upper bound below threshold
        pivot_doc = active[pivot_idx].doc

        if active[0].doc == pivot_doc:
            at_pivot = [c for c in active if c.doc == pivot_doc]
            # block-max refinement: exact per-block bound at the pivot
            block_ub = sum(c.block_upper() for c in at_pivot)
            if len(heap) >= k and block_ub < theta:
                for c in at_pivot:
                    c.advance()
            else:
                score = 0.0
                for c in at_pivot:
                    score += c.contribution()
                    c.advance()
                evaluated.append((pivot_doc, score, len(at_pivot)))
                if len(heap) < k:
                    heapq.heappush(heap, score)
                    if len(heap) == k:
                        theta = heap[0]
                elif score > heap[0]:
                    heapq.heapreplace(heap, score)
                    theta = heap[0]
        else:
            # advance the strongest lagging cursor to the pivot document
            lagging = max(
                (c for c in active[:pivot_idx] if c.doc < pivot_doc),
                key=lambda c: c.max_score,
            )
            lagging.seek(pivot_doc)
        active = [c for c in active if not c.exhausted]

    if not evaluated:
        return []
    if len(evaluated) <= k:
        return evaluated
    kth = heap[0] if len(heap) >= k else float("-inf")
    return [e for e in evaluated if e[1] >= kth]
