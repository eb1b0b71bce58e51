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
- :func:`temperature_sample` — the rates computed, not given:
  per-stratum keep rates from the temperature-scaling rule q_s ∝ p_s^α
  (multilingual mixing; Conneau & Lample 2019, mT5), derived in-plan
  from the stratum counts.
- :func:`hash_split` — deterministic train/val/test assignment from the
  same md5 hash family (disjoint by construction, reproducible).
- :func:`dsir_weights` — hashed-n-gram importance weights for data
  selection (DSIR; Xie et al. 2023): log p_target/p_raw of each
  document under two bucket-hashed bag-of-n-grams models.

Scale notes (100 TB shapes):

- decontaminate: the benchmark n-gram set is bounded (eval suites are
  millions of n-grams, not billions) and is **broadcast**, so the huge
  corpus side never shuffles for the join; the only wide shuffle keys on
  the uniform document id (per-doc distinct + the hit count).
- stratified_sample / hash_split: pure map-side filters — zero shuffles,
  zero jobs at plan time; thresholds are compile-time string literals.
- temperature_sample: one bounded-key count aggregate (map-side partials
  collapse every partition to one row per stratum) broadcast back — the
  corpus side never shuffles.
- dsir_weights: the two n-gram distributions aggregate onto a
  16^bucket_hex_chars-key space (bounded, uniform — md5 buckets), the
  per-bucket weight table broadcasts, and the only corpus-wide shuffle
  keys on the uniform document id with map-side partial sums.
- domain_top_k: two-phase top-k — the salted first pass divides a hot
  domain across salt_mod sort slices (size salt_mod to the skew), and
  only then does the per-domain ranking run, over partitions hard-bounded
  at salt_mod x k rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..pair_helpers import sum_fixed6
# the one tokenization regex shared with curation.lm_quality (and both
# oracles) — a single spelling, so an edit can never split a pair apart
from .curation import LM_TOKEN_RUN as TOKEN_RUN

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


def temperature_sample(
    docs: DataFrame,
    alpha: float = 0.5,
    stratum_col: str = "lang",
    key_col: str = "doc_id",
    seed: str = "mix",
) -> DataFrame:
    """Temperature-scaled stratum sampling with the rates computed
    IN-PLAN from the stratum counts — the multilingual mixing rule
    (Conneau & Lample 2019 §3.1; mT5's α-scaling): sampling probability
    q_s ∝ p_s^α flattens the stratum distribution toward uniform as
    α → 0. Downsampling-only (no replication), so the per-stratum keep
    rate is normalized to give the SMALLEST stratum rate 1:

        rate_s = (c_min / c_s) ^ (1 - α)

    α = 1 keeps everything (no re-weighting), α = 0 equalizes expected
    stratum sizes at c_min, α = 0.5 is the common softening.

    The keep decision is ``u8i < floor(rate_s * 2^32)`` where u8i is the
    integer value of the :func:`sample_key` md5 prefix — consistent with
    :func:`stratified_sample` (same seed -> same hash per key), and a
    stratum at rate 1 keeps ALL rows exactly (its threshold is 2^32, one
    above the largest possible u8i).

    Engine portability (CLAUDE.md invariant 4): at α = 0.5 the rate is
    ``sqrt(c_min / c_s)`` — IEEE sqrt and division are correctly rounded,
    and the *2^32 scaling is an exact exponent shift, so the thresholds
    are bit-identical in Spark and DuckDB. Any other α routes through
    ``pow``, which libms round differently in the last ulp — fine for
    production sampling, but don't pair an oracle on it.

    One bounded-key aggregate (stratum counts, map-side partials) joins
    back as a broadcast; the corpus side never shuffles. NULL strata and
    NULL keys are dropped (their rate/hash is undefined) — identically
    in both engines — and NULL strata are excluded from the counts too,
    so a stray NULL group can never become c_min and crush every real
    stratum's keep rate.
    """
    counts = (
        docs.filter(F.col(stratum_col).isNotNull())
        .groupBy(stratum_col)
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    cmin = counts.agg(F.min("_c").alias("_cmin"))
    ratio = F.col("_cmin") / F.col("_c")
    rate = F.sqrt(ratio) if alpha == 0.5 else F.pow(ratio, F.lit(1.0 - alpha))
    thr = F.when(F.col("_c") == F.col("_cmin"), F.lit(2**32)).otherwise(
        F.floor(rate * F.lit(2**32))
    ).cast("long")
    dims = counts.crossJoin(F.broadcast(cmin)).select(
        stratum_col, thr.alias("_thr")
    )
    u8i = F.conv(sample_key(key_col, seed), 16, 10).cast("long")
    return (
        docs.join(F.broadcast(dims), stratum_col)
        .withColumn("u8i", u8i)
        .filter(F.col("u8i") < F.col("_thr"))
        .drop("_thr")
    )


def hash_split(
    docs: DataFrame,
    fractions: dict,
    key_col: str = "doc_id",
    seed: str = "split",
) -> DataFrame:
    """Adds a ``split`` column assigning every row to one of the named
    fractions (train/val/test and friends) by deterministic hash ranges —
    disjoint by construction, reproducible across runs/partitionings/
    engines, and consistent for the same key under the same seed (a
    document can never leak between splits across reruns).

    ``fractions`` maps split name -> fraction; they must sum to 1 (to
    1e-9) so the assignment is exhaustive. Ranges are carved in the
    dict's insertion order: {'train': .8, 'val': .1, 'test': .1} assigns
    u8 < t(.8) -> train, < t(.9) -> val, rest -> test. Rows with a NULL
    key get a NULL split (their hash is undefined). Pure map-side: zero
    shuffles, zero jobs at plan time.
    """
    if not fractions:
        raise ValueError("hash_split: fractions must be non-empty")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(
            f"hash_split: fractions must sum to 1, got {total!r} "
            f"(drop rows beforehand with stratified_sample instead)"
        )
    u8 = sample_key(key_col, seed)
    names = list(fractions)
    cum = 0.0
    split: F.Column = F.when(u8.isNull(), F.lit(None).cast("string"))
    for name in names[:-1]:
        cum += fractions[name]
        split = split.when(u8 < F.lit(hex_threshold(cum)), F.lit(name))
    return docs.withColumn("split", split.otherwise(F.lit(names[-1])))


# ---------------------------------------------------------------------------
# DSIR hashed-n-gram importance weights
# ---------------------------------------------------------------------------


def _hashed_feature_rows(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, feat) rows WITH multiplicity: the word unigrams and bigrams
    of each document — DSIR's hashed bag-of-n-grams feature space."""
    bigrams = (
        "CASE WHEN size(_w) < 2 THEN array() "
        "ELSE transform(sequence(0, size(_w) - 2), "
        "i -> concat(element_at(_w, i + 1), ' ', element_at(_w, i + 2))) END"
    )
    return df.select(
        F.col(id_col),
        F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_RUN}', 0)").alias(
            "_w"
        ),
    ).select(id_col, F.explode(F.expr(f"concat(_w, {bigrams})")).alias("feat"))


def dsir_weights(
    docs: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "dsir",
    bucket_hex_chars: int = 3,
) -> DataFrame:
    """(id, n_feats, log_weight) — hashed-n-gram importance weights for
    data selection (DSIR; Xie et al. 2023 "Data Selection for Language
    Models via Importance Resampling"): estimate a target distribution
    (``target`` — e.g. Wikipedia, or a high-quality subset) and the raw
    distribution (``docs`` itself) over md5-bucket-hashed word unigram +
    bigram features, then score every document by

        log_weight(d) = Σ_{feature occurrences f ∈ d}
                          ln( p_target(bucket(f)) / p_raw(bucket(f)) )

    with add-one smoothing over the B = 16^bucket_hex_chars buckets.
    Documents resembling the target score high; a selection pass keeps
    the top fraction by ``log_weight`` (or samples ∝ exp(weight)).

    Engine portability: buckets are md5 hex prefixes (string keys — no
    integer conversion anywhere), and every per-bucket log-ratio is
    computed once from exact integer counts cast to DOUBLE, rounded to
    6, then integer-summed per document (the fixed6 pattern, CLAUDE.md
    invariant 4) — so a DuckDB oracle replays the weights bit-for-bit.

    Scale shape: both distributions aggregate onto the bounded uniform
    bucket key (map-side partials); the B-row weight table broadcasts;
    the only corpus-wide shuffle keys on the uniform document id. The
    feature explode of ``docs`` appears twice in the plan (once counting
    the raw distribution, once scoring) — at 100 TB materialize it once
    to parquet between the two passes, exactly like pipeline/build.py
    stages.

    Documents with no features (empty/NULL text) report n_feats 0 and
    log_weight 0.0.
    """
    if not 1 <= bucket_hex_chars <= 8:
        raise ValueError(
            f"dsir_weights: bucket_hex_chars must be in [1, 8], "
            f"got {bucket_hex_chars}"
        )
    n_buckets = 16**bucket_hex_chars

    def bucketed(df: DataFrame) -> DataFrame:
        feats = _hashed_feature_rows(df, id_col, text_col)
        return feats.withColumn(
            "_b",
            F.substring(
                F.md5(F.concat(F.lit(seed + ":"), F.col("feat"))),
                1,
                bucket_hex_chars,
            ),
        )

    doc_feats = bucketed(docs)
    tgt_feats = bucketed(target)
    raw_counts = doc_feats.groupBy("_b").agg(F.count(F.lit(1)).alias("_cr"))
    tgt_counts = tgt_feats.groupBy("_b").agg(F.count(F.lit(1)).alias("_ct"))
    raw_total = doc_feats.agg(F.count(F.lit(1)).alias("_crt"))
    tgt_total = tgt_feats.agg(F.count(F.lit(1)).alias("_ctt"))

    # lw(b) = ln( ((ct+1)/(CT+B)) / ((cr+1)/(CR+B)) ), all operands cast
    # to DOUBLE from exact integers BEFORE multiplying (no 64-bit overflow
    # at planetary counts, and IEEE *, / are correctly rounded so the
    # value is engine-identical), rounded to the 6-decimal grid once.
    num = (F.coalesce(F.col("_ct"), F.lit(0)) + 1).cast("double") * (
        F.col("_crt").cast("double") + n_buckets
    )
    den = (F.col("_cr") + 1).cast("double") * (
        F.col("_ctt").cast("double") + n_buckets
    )
    weights = (
        raw_counts.join(tgt_counts, "_b", "left")
        .crossJoin(F.broadcast(raw_total))
        .crossJoin(F.broadcast(tgt_total))
        .select("_b", F.round(F.log(num / den), 6).alias("_lw"))
    )
    scored = doc_feats.join(F.broadcast(weights), "_b").groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_feats"),
        sum_fixed6("_lw", "_log_weight"),
    )
    return docs.select(id_col).join(scored, id_col, "left").select(
        id_col,
        F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
        F.coalesce("_log_weight", F.lit(0.0)).alias("log_weight"),
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


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis-Spirakis)
# ---------------------------------------------------------------------------

# u = (first-52-md5-bits + 1) / 2^52: a deterministic uniform in
# (0, 1] — +1 keeps ln(u) finite; 52 bits so the integer is exact in a
# double. Shared numerology with the oracle SQL.
ES_U_BITS = 52


def weighted_sample(
    docs: DataFrame,
    k: int,
    weight_col: str,
    key_col: str = "doc_id",
    seed: str = "es",
) -> DataFrame:
    """(key, weight, es_key, rank) — the global top-``k`` of a weighted
    sample WITHOUT replacement (Efraimidis & Spirakis 2006): each row
    draws a deterministic uniform ``u`` from its key's md5 and is ranked
    by ``u^(1/w)`` — equivalently (monotone, and numerically safer) by
    ``ln(u)/w`` — so row i's inclusion probability tracks ``w_i``. The
    canonical "sample a token-budget-proportional subset" primitive:
    pass token counts as the weight and the expected share of each doc
    is proportional to its length, with NO replacement bookkeeping and
    bit-reproducibility across runs, partitionings and engines (md5 hash
    family shared with :func:`stratified_sample`).

    Rows with NULL keys or non-positive/NULL weights are excluded (ES
    requires w > 0). ``es_key`` is rounded to 6 before ranking with a
    key-asc tiebreak, so a sub-1e-6 ``ln`` discrepancy between engines
    can never flip a rank (the term_stats idf precedent); at very large
    weights the rounding coarsens the ES order among near-ties, which
    the deterministic tiebreak resolves identically everywhere.

    Scale shape: the score is map-side; the global top-k plans as
    TakeOrderedAndProject (per-partition top-k, merge of
    ``partitions x k`` rows) — k is a sample budget (bounded), never a
    corpus fraction. For per-stratum quotas compose with
    :func:`domain_top_k` instead.
    """
    u_int = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(seed + ":"), F.col(key_col).cast("string"))),
            1,
            ES_U_BITS // 4,
        ),
        16,
        10,
    ).cast("long")
    w = F.col(weight_col).cast("double")
    scored = (
        docs.filter(F.col(key_col).isNotNull())
        .filter(w.isNotNull() & (w > 0))
        .select(
            key_col,
            F.col(weight_col).alias("weight"),
            F.round(
                F.log((u_int + 1) / F.lit(float(1 << ES_U_BITS))) / w, 6
            ).alias("es_key"),
        )
        .orderBy(F.col("es_key").desc(), F.col(key_col).asc())
        .limit(k)
    )
    w_rank = Window.orderBy(F.col("es_key").desc(), F.col(key_col).asc())
    return scored.withColumn(
        "rank", F.row_number().over(w_rank).cast("long")
    )
