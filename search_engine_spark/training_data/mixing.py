"""Training-data mixing operators: benchmark decontamination,
deterministic stratified sampling, skew-safe per-domain caps.

These are the corpus-assembly steps a pretraining-data pipeline applies
*after* curation (dedup + quality, ``pipeline.py``) and *before*
tokenization — deciding which surviving documents actually enter the
training mix:

- :func:`decontaminate` — flag documents sharing any word n-gram with an
  evaluation/benchmark set (the GPT-3 / PaLM "13-gram overlap" rule;
  Brown et al. 2020 Appendix C). The reference has no analog — this is
  new scale capability, like the dedup family in ``dedup.py``.
- :func:`stratified_sample` — per-stratum Bernoulli sampling with an
  engine-portable deterministic hash (md5 hex-prefix threshold, no RNG
  state): the "data mixing weights" step, reproducible bit-for-bit
  across runs, sessions and engines.
- :func:`domain_top_k` — keep at most k documents per domain by a
  quality ordering, computed skew-safely (CLAUDE.md invariant 6): a
  Zipf-hot domain never funnels through a single reducer.

Scale notes (100 TB shapes):

- decontaminate: the benchmark n-gram set is bounded (eval suites are
  millions of n-grams, not billions) and is **broadcast**, so the huge
  corpus side never shuffles for the join; the only wide shuffle keys on
  the uniform document id (per-doc distinct + the hit count).
- stratified_sample: pure map-side filter — zero shuffles, zero jobs at
  plan time; thresholds are compile-time string literals.
- domain_top_k: two-phase top-k — a salted partial top-k bounds every
  window partition at (salt_mod x k) rows before the per-domain final
  ranking, so a domain holding 10% of the corpus costs the same as one
  holding 0.001%.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------


def word_ngrams(
    df: DataFrame, n: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, ngram) — the DISTINCT space-joined word n-grams of each
    document. Documents shorter than n words contribute no rows.

    The n-gram string is built with slice + array_join over the
    whitespace word split — the exact construction DuckDB replays with
    list slicing, so paired oracles match byte-for-byte.
    """
    w = F.split(F.trim(F.col(text_col)), r"\s+")
    grams = F.expr(
        f"CASE WHEN size(_w) < {n} THEN array() "
        f"ELSE transform(sequence(1, size(_w) - {n - 1}), "
        f"i -> array_join(slice(_w, i, {n}), ' ')) END"
    )
    return (
        df.select(F.col(id_col), w.alias("_w"))
        .select(id_col, F.explode(grams).alias("ngram"))
        .distinct()
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_hits, contaminated) for EVERY input document.

    ``n_hits`` counts the distinct n-grams of the document that appear
    anywhere in ``eval_docs``; ``contaminated`` is the 0/1 gate a
    pipeline filters on. n=13 is the published GPT-3 setting; pass a
    smaller n for short-document corpora.

    The eval n-gram set is broadcast — callers hold the (enforced)
    assumption that benchmark suites are small relative to the corpus.
    """
    doc_grams = word_ngrams(docs, n, id_col=id_col, text_col=text_col)
    eval_grams = (
        word_ngrams(eval_docs, n, id_col=id_col, text_col=text_col)
        .select("ngram")
        .distinct()
    )
    hits = (
        doc_grams.join(F.broadcast(eval_grams), "ngram", "inner")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("_h"))
    )
    return docs.select(id_col).join(hits, id_col, "left").select(
        id_col,
        F.coalesce(F.col("_h"), F.lit(0)).cast("long").alias("n_hits"),
        (F.coalesce(F.col("_h"), F.lit(0)) > 0).cast("long").alias("contaminated"),
    )


# ---------------------------------------------------------------------------
# Deterministic stratified sampling
# ---------------------------------------------------------------------------


def hex_threshold(rate: float) -> str:
    """Sampling rate -> 8-hex-digit lexicographic threshold.

    A key is kept iff the first 8 hex chars of its md5 are < the
    threshold, so P(keep) = floor(rate * 16^8) / 16^8 (exact for dyadic
    rates). rate >= 1 returns 'g', which is greater than every hex
    string; rate <= 0 returns '00000000', which keeps nothing.
    """
    if rate >= 1.0:
        return "g"
    if rate <= 0.0:
        return "00000000"
    return format(int(round(rate * 16**8)), "08x")


def sample_key(key_col: str, seed: str = "mix") -> F.Column:
    """The uniform-hash string u8 = substr(md5(seed || ':' || key), 1, 8).

    md5 of an ASCII string is identical in Spark and DuckDB, so paired
    oracles replay the exact keep/drop decisions — no RNG, no state.
    """
    return F.substring(
        F.md5(F.concat_ws(":", F.lit(seed), F.col(key_col).cast("string"))), 1, 8
    )


def stratified_sample(
    docs: DataFrame,
    rates: dict,
    stratum_col: str = "lang",
    key_col: str = "doc_id",
    seed: str = "mix",
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row with its stratum's probability, deterministically.

    Adds ``u8`` (the hash the decision was made on — kept for audit) and
    filters to the kept rows. Pure map-side: no shuffle, rerunning on a
    re-partitioned / re-ordered input keeps the exact same rows, which
    is what makes training mixes reproducible.
    """
    thr = F.lit(hex_threshold(default_rate))
    for stratum, rate in sorted(rates.items()):
        thr = F.when(
            F.col(stratum_col) == stratum, F.lit(hex_threshold(rate))
        ).otherwise(thr)
    return docs.withColumn("u8", sample_key(key_col, seed)).filter(F.col("u8") < thr)


# ---------------------------------------------------------------------------
# Skew-safe per-domain caps
# ---------------------------------------------------------------------------


def domain_top_k(
    docs: DataFrame,
    k: int,
    domain_col: str = "source",
    order_col: str = "n_chars",
    id_col: str = "doc_id",
    salt_mod: int = 16,
) -> DataFrame:
    """Keep the top k rows per domain by (order_col DESC, id ASC), with a
    ``rank`` column (1..k), identical to a single per-domain window but
    skew-safe.

    Phase 1 ranks within (domain, id % salt_mod) and keeps k per salted
    group — every true per-domain top-k row survives (it is top-k within
    its own salt slice too), and each domain is now bounded at
    salt_mod * k rows. Phase 2 ranks the survivors per domain. A domain
    with a billion rows costs one bounded window pass per slice instead
    of one reducer sorting a billion rows.
    """
    ordering = [F.col(order_col).desc(), F.col(id_col).asc()]
    salted = Window.partitionBy(domain_col, "_salt").orderBy(*ordering)
    partial = (
        docs.withColumn("_salt", F.pmod(F.col(id_col), F.lit(salt_mod)))
        .withColumn("_rn", F.row_number().over(salted))
        .filter(F.col("_rn") <= k)
        .drop("_salt", "_rn")
    )
    final = Window.partitionBy(domain_col).orderBy(*ordering)
    return (
        partial.withColumn("rank", F.row_number().over(final).cast("long"))
        .filter(F.col("rank") <= k)
    )
