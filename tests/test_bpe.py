"""BPE tokenizer training vs a pure-Python Sennrich oracle.

The oracle implements the textbook loop directly on a word-frequency dict:
count every adjacent symbol position weighted by word freq, take the
(count desc, lhs asc, rhs asc) argmax, merge left-to-right non-overlapping.
`train_bpe_merges` / `apply_bpe` / `subword_frequencies` must agree with it
exactly (the DuckDB replay is covered by the `bpe_merges` / `bpe_tokenize`
pairs in test_driver_queries).
"""

from __future__ import annotations

import re
from collections import Counter

import pytest

from search_engine_spark.training_data import bpe as B

TOKEN_RE = re.compile(r"[a-z0-9]{2,}")


def _vocab_of(texts):
    vocab = Counter()
    for t in texts:
        vocab.update(TOKEN_RE.findall(t.lower()))
    return vocab


def _oracle_train(texts, num_merges):
    """Pure-Python Sennrich loop over the word-frequency table."""
    vocab = {tuple(w): f for w, f in _vocab_of(texts).items()}
    merges = []
    for step in range(1, num_merges + 1):
        counts = Counter()
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        (lhs, rhs), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, lhs, rhs, lhs + rhs, n))
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges, vocab


def _oracle_subwords(texts, num_merges):
    _, vocab = _oracle_train(texts, num_merges)
    counts = Counter()
    for syms, f in vocab.items():
        for s in syms:
            counts[s] += f
    return counts


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the quicker browner foxes jumped over lazier dogs",
    "lowest lower low newest newer new widest wider wide",
    "banana bandana ananas banal canal",
    "aaaa aaaa aaaa baaa aaab",  # overlap semantics: aaaa -> aa,aa
    "mix3d alph4num3ric t0kens 42abc abc42",
]


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


@pytest.mark.parametrize("k", [1, 4, 10])
def test_train_matches_oracle(spark, k):
    got = [
        (r["step"], r["lhs"], r["rhs"], r["merged"], r["pair_count"])
        for r in B.train_bpe_merges(_docs_df(spark, TEXTS), k)
        .orderBy("step")
        .collect()
    ]
    want, _ = _oracle_train(TEXTS, k)
    assert got == want


def test_overlap_is_left_to_right_nonoverlapping(spark):
    # 'aaaa' under merge (a,a) must become aa,aa — never aaa,a.
    texts = ["aaaa aaaa zz"]
    merges = B.train_bpe_merges(_docs_df(spark, texts), 1)
    rows = merges.collect()
    assert [(r["lhs"], r["rhs"], r["pair_count"]) for r in rows] == [("a", "a", 6)]
    sub = {
        r["token"]: r["tok_count"]
        for r in B.subword_frequencies(_docs_df(spark, texts), merges).collect()
    }
    assert sub == {"aa": 4, "z": 2}  # zz unmerged: only (a,a) was learned


def test_early_stop_when_pairs_exhaust(spark):
    # Two 2-char words fuse in 2 merges; asking for 6 returns only what exists.
    texts = ["ab ab cd"]
    merges = B.train_bpe_merges(_docs_df(spark, texts), 6)
    assert merges.count() == 2
    want, _ = _oracle_train(texts, 6)
    assert len(want) == 2


def test_subword_frequencies_match_oracle(spark):
    k = 6
    merges = B.train_bpe_merges(_docs_df(spark, TEXTS), k)
    got = {
        r["token"]: r["tok_count"]
        for r in B.subword_frequencies(_docs_df(spark, TEXTS), merges).collect()
    }
    assert got == dict(_oracle_subwords(TEXTS, k))


def test_apply_bpe_matches_oracle_segmentation(spark):
    k = 6
    docs = _docs_df(spark, TEXTS)
    merges = B.train_bpe_merges(docs, k)
    rules, _ = _oracle_train(TEXTS, k)

    def seg(word):
        syms = list(word)
        for _, lhs, rhs, _, _ in rules:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    got = {
        r["doc_id"]: r["subwords"] for r in B.apply_bpe(docs, merges).collect()
    }
    for i, t in enumerate(TEXTS):
        want = [s for w in TOKEN_RE.findall(t.lower()) for s in seg(w)]
        assert got[i] == want, f"doc {i}"
