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
- :func:`quota_sample` — the exact-count companion: exactly min(k, n)
  rows per stratum in deterministic hash order (eval-set construction,
  balanced calibration samples).
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
- domain_top_k: two-phase top-k — the salted first pass divides a hot
  domain across salt_mod sort slices (size salt_mod to the skew), and
  only then does the per-domain ranking run, over partitions hard-bounded
  at salt_mod x k rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------


def _ngram_rows(
    df: DataFrame, n: int, id_col: str, text_col: str
) -> DataFrame:
    """(id, ngram) rows WITHOUT dedup — one per n-gram position."""
    w = F.split(F.trim(F.col(text_col)), r"\s+")
    grams = F.expr(
        f"CASE WHEN size(_w) < {n} THEN array() "
        f"ELSE transform(sequence(1, size(_w) - {n - 1}), "
        f"i -> array_join(slice(_w, i, {n}), ' ')) END"
    )
    return df.select(F.col(id_col), w.alias("_w")).select(
        id_col, F.explode(grams).alias("ngram")
    )


def word_ngrams(
    df: DataFrame, n: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, ngram) — the DISTINCT space-joined word n-grams of each
    document. Documents shorter than n words contribute no rows.

    The n-gram string is built with slice + array_join over the
    whitespace word split — the exact construction DuckDB replays with
    list slicing, so paired oracles match byte-for-byte.
    """
    return _ngram_rows(df, n, id_col, text_col).distinct()


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
    # one distinct over the bare ngram — a per-(id, ngram) dedup first
    # would be a second, redundant wide shuffle of the whole eval set
    eval_grams = (
        _ngram_rows(eval_docs, n, id_col, text_col).select("ngram").distinct()
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
    string; rate <= 0 returns '00000000', which keeps nothing. The
    floored value is clamped to 16^8 - 1: a rate infinitesimally below
    1.0 must still format as 8 hex digits (a 9-char '100000000' would
    lexicographically drop every u8 starting with '1'-'f').
    """
    if rate >= 1.0:
        return "g"
    if rate <= 0.0:
        return "00000000"
    return format(min(int(rate * 16**8), 16**8 - 1), "08x")


def sample_key(key_col: str, seed: str = "mix") -> F.Column:
    """The uniform-hash string u8 = substr(md5(seed || ':' || key), 1, 8).

    md5 of an ASCII string is identical in Spark and DuckDB, so paired
    oracles replay the exact keep/drop decisions — no RNG, no state.
    NULL keys propagate to a NULL u8 (null-propagating concat, matching
    SQL's ``||``), so a NULL-key row is dropped by the threshold filter
    in BOTH engines rather than silently sharing one hash.
    """
    return F.substring(
        F.md5(F.concat(F.lit(seed + ":"), F.col(key_col).cast("string"))), 1, 8
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
    salt_mod: int = 64,
) -> DataFrame:
    """Keep the top k rows per domain by (order_col DESC, id ASC), with a
    ``rank`` column (1..k), identical to a single per-domain window but
    skew-divided.

    Phase 1 ranks within (domain, id % salt_mod) and keeps k per salted
    group — every true per-domain top-k row survives (it is top-k within
    its own salt slice too). Phase 2 ranks the survivors per domain over
    window partitions bounded at salt_mod * k rows.

    Skew honesty: phase 1's window partitions are NOT k-bounded — a
    domain with R rows still sorts ~R / salt_mod rows per slice (a
    spillable external sort, but a real cost). The salt divides the hot
    key by a constant; size ``salt_mod`` so the largest expected domain
    divided by it fits a task's sort budget (e.g. 1e9-row domain,
    salt_mod 4096 -> ~244k rows/slice). Only phase 2 has the hard
    salt_mod * k bound.
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


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    seed: str = "pack",
    bucket_hex_chars: int = 2,
) -> DataFrame:
    """(id, n_tokens, chunk_id, chunk_offset) — concat-then-chunk sequence
    packing: documents are laid end to end in a deterministic
    pseudo-random order (md5 of the id, ties by id) and the token stream
    is cut into fixed ``seq_len`` chunks; each document records the chunk
    it starts in and its token offset inside that chunk. This is the
    GPT-style packing bookkeeping a tokenization pass materializes so
    shards can be written independently (a doc may span chunks; its
    successors' positions follow from n_tokens).

    The global running token total is a DISTRIBUTED PREFIX SUM, not one
    window over the whole corpus (which would sort everything on a single
    reducer): rows are bucketed by the first two hex chars of their hash
    (lexicographic bucket order == global hash order, since the bucket is
    a prefix of the ordering key), phase 1 computes within-bucket running
    sums (256 balanced window partitions), phase 2 computes the 256
    bucket offsets with a window over the 256-row bucket-total relation
    (bounded by construction — the one deliberate single-partition
    window) and broadcast-joins them back. Scale ``bucket_hex_chars``
    with the corpus (3 hex chars = 4096 buckets) to keep per-bucket
    sorts in task memory; any prefix width yields the identical result
    (the bucket is always a prefix of the ordering key).

    Rows with a NULL id are dropped (their hash — and hence their global
    position — is undefined; the two engines order NULLs differently so a
    paired oracle could never agree). NULL token counts pack as 0.
    """
    if seq_len <= 0:
        raise ValueError(f"pack_sequences: seq_len must be positive, got {seq_len}")
    if not 1 <= bucket_hex_chars <= 8:
        raise ValueError(
            f"pack_sequences: bucket_hex_chars must be in [1, 8], "
            f"got {bucket_hex_chars}"
        )
    h = F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string")))
    d = (
        docs.filter(F.col(id_col).isNotNull())
        .select(
            id_col,
            F.coalesce(F.col(tokens_col).cast("long"), F.lit(0)).alias("_n"),
        )
        .withColumn("_h", h)
        .withColumn("_b", F.substring("_h", 1, bucket_hex_chars))
    )
    w_in = (
        Window.partitionBy("_b")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = d.withColumn("_cum", F.sum("_n").over(w_in))
    w_b = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        d.groupBy("_b")
        .agg(F.sum("_n").alias("_t"))
        .withColumn("_off", F.coalesce(F.sum("_t").over(w_b), F.lit(0)))
        .select("_b", "_off")
    )
    return (
        within.join(F.broadcast(offsets), "_b")
        .withColumn("_prev", F.col("_off") + F.col("_cum") - F.col("_n"))
        .select(
            id_col,
            F.col("_n").alias(tokens_col),
            F.expr(f"_prev div {int(seq_len)}").alias("chunk_id"),
            (F.col("_prev") % seq_len).alias("chunk_offset"),
        )
    )


def mix_report(
    docs: DataFrame,
    strata: tuple[str, ...] = ("lang", "source"),
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """(strata..., n_docs, n_tokens, token_share) — the mixture audit a
    training run is configured from: document and token counts per
    stratum plus each stratum's share of all tokens (one exact-integer
    division per row, rounded to 6 — invariant 4).

    One shuffle (the groupBy on the bounded strata key space); the grand
    total is an in-plan 1-row aggregate broadcast back (scalar_count
    pattern), never a driver-side ``.count()``.
    """
    g = docs.groupBy(*strata).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.coalesce(F.col(tokens_col).cast("long"), F.lit(0))).alias(
            "n_tokens"
        ),
    )
    tot = g.agg(F.sum("n_tokens").cast("double").alias("_tot"))
    return g.join(F.broadcast(tot)).select(
        *strata,
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens") / F.col("_tot"), 6).alias("token_share"),
    )


def quota_sample(
    docs: DataFrame,
    k: int,
    stratum_col: str = "lang",
    key_col: str = "doc_id",
    seed: str = "mix",
    salt_mod: int = 64,
) -> DataFrame:
    """Exactly min(k, n) rows per stratum, chosen by deterministic hash
    order — the exact-count companion to :func:`stratified_sample`
    (which keeps a random-RATE subset). Used where a fixed quota per
    stratum is the contract: eval-set construction, per-language
    calibration samples, balanced audits.

    Rows are ranked inside each stratum by (u8 DESC, key ASC), where u8
    is the :func:`sample_key` hash — uniform, reproducible across
    runs/partitionings/engines, and consistent with stratified_sample's
    hashes (same seed -> same u8 per key). The ranking runs through the
    skew-divided two-phase :func:`domain_top_k`. Output keeps the
    ``u8`` and ``rank`` (1..k) columns for audit.
    """
    return domain_top_k(
        docs.withColumn("u8", sample_key(key_col, seed)).filter(
            F.col("u8").isNotNull()
        ),
        k,
        domain_col=stratum_col,
        order_col="u8",
        id_col=key_col,
        salt_mod=salt_mod,
    )
