"""Distributed BPE tokenizer training (byte-pair encoding, Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units") over a
document corpus — a beyond-reference training-data operator (the reference
engine's tokenizer is regex → stopwords → Porter, `app/indexer/tokenizer.py`;
it has no subword stage, but tokenizer training is a standard stage of any
LLM-corpus pipeline and belongs in the same operator family).

Spark-first shape
-----------------
Training never iterates over the raw corpus. The corpus collapses ONCE into
a ``(word, freq)`` vocabulary table (one shuffle with map-side combine;
Heaps'-law small relative to the corpus — ~V ≈ k·N^0.5 unique words for N
corpus tokens), and the merge loop runs over that table only:

  per merge: adjacent-symbol pair counts (explode + groupBy-sum, map-side
  combine), a deterministic argmax (count desc, lhs asc, rhs asc), and the
  merge applied as a literal string replace on the encoded symbol strings
  (narrow map, no shuffle). Lineage is cut per iteration with an eager
  ``localCheckpoint`` — the pagerank iteration pattern.

At 100 TB the vocabulary table is ~10^8-10^9 rows — still a distributed
relation (never collected), and each merge step is one small shuffle over
it. A production tokenizer run does ~30k merges; at that count one would
add the incremental pair-count cache (only counts adjacent to the merged
pair change — Sennrich's own optimization) rather than a full recount per
step; the full-recount loop here IS the textbook algorithm and the shape
both engines can replay exactly.

Engine-portable determinism (CLAUDE.md invariants 2/4)
------------------------------------------------------
No floats, no RNG, no engine-specific hash: counts are integers, ties break
lexicographically on (lhs, rhs), and the merge application is a
left-to-right non-overlapping literal replace with identical semantics in
Spark SQL ``replace``, DuckDB ``replace``, and Python ``str.replace`` (the
pytest oracle), so the full training loop replays bit-for-bit in DuckDB
(pair ``bpe_merges``) and in pure Python (tests/test_bpe.py).

Symbol encoding
---------------
A word's symbol sequence is one string with every symbol wrapped in ``|``:
``"model" → "|m||o||d||e||l|"``. ``|`` never occurs inside a symbol
(TOKEN_RUN words are ``[a-z0-9]``), so the merge pattern ``|a||b|`` can only
match at a true symbol boundary (its second character is a symbol
character, forcing alignment), and ``replace('|a||b|' → '|ab|')`` is
exactly one BPE merge applied to every occurrence, left-to-right
non-overlapping — ``"aaaa"`` under merge ``(a,a)`` becomes ``aa,aa``, not
``aaa,a``, matching the within-iteration semantics of the reference
implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import TOKEN_RUN

__all__ = [
    "word_frequencies",
    "encode_words",
    "pair_counts",
    "train_bpe_merges",
    "subword_frequencies",
    "apply_bpe",
]

# Columns 0-indexed in Spark; the guard filter (size >= 2) must precede the
# sequence() call — Spark's sequence(1, 0) infers step -1 and yields [1, 0].
_ADJ_PAIRS = (
    "transform(sequence(1, size(s) - 1),"
    " i -> struct(s[i - 1] AS lhs, s[i] AS rhs))"
)


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) vocabulary table — the one corpus-wide shuffle."""
    words = F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_RUN}', 0)")
    return (
        docs.select(F.explode(words).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def encode_words(vocab: DataFrame) -> DataFrame:
    """Wrap every character as a |-delimited symbol: model → |m||o||d||e||l|."""
    return vocab.select(
        F.regexp_replace("word", "(.)", r"|$1|").alias("enc"), "freq"
    )


def _symbols(enc) -> F.Column:
    return F.split(F.expr("btrim(enc, '|')"), r"\|\|")


def pair_counts(encoded: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts weighted by word frequency.

    Every adjacent position counts (``aaa`` contributes 2 to ``(a,a)``),
    matching the Sennrich statistics loop.
    """
    return (
        encoded.select(_symbols("enc").alias("s"), "freq")
        .filter(F.size("s") >= 2)
        .select(F.explode(F.expr(_ADJ_PAIRS)).alias("p"), "freq")
        .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
        .agg(F.sum("freq").alias("pair_count"))
    )


def train_bpe_merges(
    docs: DataFrame, num_merges: int = 8, text_col: str = "text"
) -> DataFrame:
    """Learn ``num_merges`` BPE merges; returns (step, lhs, rhs, merged,
    pair_count) ordered by step.

    Per step, the 1-row argmax is collected to the driver — the trained
    artifact itself, bounded by ``num_merges`` (the same sanctioned
    bounded-set exception as the IVF centroid collect) — so the merge can
    be applied as a literal replace and the vocabulary lineage stays flat
    (one eager localCheckpoint per step, the pagerank pattern). Stops
    early if the vocabulary runs out of adjacent pairs (every word fused
    to one symbol).
    """
    vocab = encode_words(word_frequencies(docs, text_col)).localCheckpoint(
        eager=True
    )
    rules: list[tuple] = []
    for step in range(1, num_merges + 1):
        got = (
            pair_counts(vocab)
            .orderBy(F.desc("pair_count"), F.asc("lhs"), F.asc("rhs"))
            .limit(1)
            .collect()
        )
        if not got:
            break
        lhs, rhs, n = got[0]["lhs"], got[0]["rhs"], got[0]["pair_count"]
        rules.append((step, lhs, rhs, lhs + rhs, n))
        vocab = vocab.select(
            F.replace(
                "enc", F.lit(f"|{lhs}||{rhs}|"), F.lit(f"|{lhs}{rhs}|")
            ).alias("enc"),
            "freq",
        ).localCheckpoint(eager=True)
    if not rules:
        raise ValueError("corpus yielded no adjacent symbol pairs")
    return docs.sparkSession.createDataFrame(
        rules, "step int, lhs string, rhs string, merged string, pair_count long"
    )


def _merge_rules(merges: DataFrame) -> list[tuple[str, str]]:
    """Collect the (bounded-by-num_merges) trained rule list in rank order."""
    return [
        (r["lhs"], r["rhs"]) for r in merges.orderBy("step").collect()
    ]


def subword_frequencies(
    docs: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
    top: int | None = None,
) -> DataFrame:
    """Corpus subword frequencies after applying the trained merges.

    Runs over the vocabulary table (weight = word freq), never the raw
    corpus — tokenizing N tokens costs V rule applications. The rule list
    is collected (it is the trained artifact, bounded by ``num_merges`` —
    the same driver-side bounded-set exception as the spellcheck meta
    cache) and applied as chained literal replaces.
    """
    enc_col = F.col("enc")
    for lhs, rhs in _merge_rules(merges):
        enc_col = F.replace(
            enc_col, F.lit(f"|{lhs}||{rhs}|"), F.lit(f"|{lhs}{rhs}|")
        )
    vocab = encode_words(word_frequencies(docs, text_col))
    out = (
        vocab.select(enc_col.alias("enc"), "freq")
        .select(F.explode(_symbols("enc")).alias("token"), "freq")
        .groupBy("token")
        .agg(F.sum("freq").alias("tok_count"))
    )
    if top is not None:
        out = out.orderBy(F.desc("tok_count"), F.asc("token")).limit(top)
    return out


def apply_bpe(
    docs: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize every document into subwords with the trained merges —
    the corpus-scale application path: Arrow-batched ``mapInPandas`` with a
    per-worker word→subwords cache (Zipf skew means the cache hit rate is
    the corpus duplication rate), applying the same encoded-string replaces
    as the SQL path so the three implementations agree byte-for-byte.
    """
    import re

    rules = _merge_rules(merges)
    token_re = re.compile(TOKEN_RUN)
    spark = docs.sparkSession
    b_rules = spark.sparkContext.broadcast(rules)

    def run(batches):
        import pandas as pd

        cache: dict[str, list[str]] = {}
        rls = b_rules.value

        def segment(word: str) -> list[str]:
            got = cache.get(word)
            if got is None:
                enc = "|" + "||".join(word) + "|"
                for lhs, rhs in rls:
                    enc = enc.replace(f"|{lhs}||{rhs}|", f"|{lhs}{rhs}|")
                got = enc[1:-1].split("||")
                cache[word] = got
            return got

        for pdf in batches:
            toks = [
                [s for w in token_re.findall(str(t).lower()) for s in segment(w)]
                for t in pdf[text_col].fillna("")
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "subwords": toks})

    return docs.select(id_col, text_col).mapInPandas(
        run, schema=f"{id_col} long, subwords array<string>"
    )
