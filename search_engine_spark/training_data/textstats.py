"""Text analysis for corpus curation: language ID, token counts, fingerprints.

All native Column expressions (regex + higher-order functions) — zero Python
UDFs, so every operator here is pushdown/codegen-friendly and cheap at
100 TB. Each has an exact DuckDB-SQL twin in the driver contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..pair_helpers import fixed6_long

TOKEN_RUN = "[a-z0-9]{2,}"

# Marker stopwords per language, by descending corpus frequency in each
# language's standard stopword inventory. Deliberately small and frozen:
# language ID here is the n-gram/marker heuristic a curation pipeline uses
# for coarse routing, not a trained classifier. Priority order breaks ties.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "for", "was"),
    "de": ("der", "die", "und", "das", "nicht", "ist", "ich", "ein", "mit", "sich"),
    "fr": ("le", "la", "et", "les", "des", "est", "pas", "que", "une", "dans"),
    "es": ("el", "los", "las", "que", "una", "por", "con", "para", "del", "se"),
}
LANG_PRIORITY = ("en", "de", "fr", "es")

# CJK unified ideographs — presence routes to "zh" before marker voting.
# Spark pattern holds the literal codepoints (no SQL-literal escape hazards);
# the DuckDB twin spells the same class in RE2 syntax.
CJK_PATTERN_SPARK = "[一-鿿]"
CJK_PATTERN_DUCKDB = "[\\x{4e00}-\\x{9fff}]"

# "BPE-ish" pre-tokenization: letter runs, digit runs, or single
# non-alphanumeric non-space symbols — the usual byte-level BPE splitter
# shape, counted (not trained) for cost estimation of a tokenizer pass.
BPE_RUN = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``pred_lang`` plus per-language marker-hit counts.

    Scoring: count token occurrences (with multiplicity) that appear in each
    language's marker list; predict the max-scoring language in
    LANG_PRIORITY order (strictly-greater comparison = earlier language wins
    ties); any CJK character short-circuits to "zh"; all-zero scores -> "und".
    """
    words = F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_RUN}', 0)")
    out = df.withColumn("_w", words)
    for lang, markers in LANG_MARKERS.items():
        out = out.withColumn(
            f"{lang}_hits",
            F.size(F.filter(F.col("_w"), lambda w: w.isin(*markers))),
        )
    cjk = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(CJK_PATTERN_SPARK), F.lit(0))
    )
    out = out.withColumn("cjk_chars", cjk)

    best: F.Column = F.lit("und")
    best_score: F.Column = F.lit(0)
    for lang in reversed(LANG_PRIORITY):
        # walking priority in reverse with >= gives earlier languages the tie
        score = F.col(f"{lang}_hits")
        best = F.when(score >= F.greatest(best_score, F.lit(1)), F.lit(lang)).otherwise(
            best
        )
        best_score = F.greatest(best_score, score)
    pred = F.when(F.col("cjk_chars") > 0, F.lit("zh")).otherwise(best)
    return out.withColumn("pred_lang", pred).drop("_w")


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ws_tokens (whitespace split), bpe_tokens (BPE-ish regex pieces),
    and n_chars — the cost triple a tokenization pass is budgeted with."""
    # split('') yields [''] (size 1); blank documents must count 0 tokens
    ws = F.when(F.length(F.trim(F.col(text_col))) == 0, 0).otherwise(
        F.size(F.split(F.trim(F.col(text_col)), "\\s+"))
    )
    bpe = F.size(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(BPE_RUN), F.lit(0))
    )
    return (
        df.withColumn("ws_tokens", ws)
        .withColumn("bpe_tokens", bpe)
        .withColumn("n_chars", F.length(text_col))
    )


def chunk_documents(
    df: DataFrame,
    size: int,
    stride: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fixed-size sliding-window chunks over each document's whitespace
    token stream — the context-window prep for RAG indexing / long-doc
    pretraining (size > stride ⇒ overlapping chunks; the trailing chunk
    may be short). One narrow map + explode, no shuffle: chunking
    parallelizes embarrassingly and the fan-out per doc is n/stride.

    Rows: (id, chunk_id, start_tok, n_tok, chunk_hash) where chunk_hash
    is md5 of the space-joined chunk text — engine-portable (invariant 2),
    so a DuckDB replay is bit-identical. NULL/blank texts yield no chunks.
    """
    if size <= 0 or stride <= 0:
        raise ValueError("size and stride must be positive")
    words = F.when(
        F.length(F.trim(F.col(text_col))) == 0,
        F.array().cast("array<string>"),
    ).otherwise(F.split(F.trim(F.col(text_col)), "\\s+"))
    base = (
        df.select(F.col(id_col), words.alias("_w"))
        .withColumn("_n", F.size("_w"))
        .filter(F.col("_n") >= 1)  # sequence(0, -1, +stride) would raise
    )
    exploded = base.select(
        id_col,
        "_w",
        F.explode(
            F.sequence(F.lit(0), F.col("_n") - 1, F.lit(stride))
        ).alias("start_tok"),
    )
    chunk = F.slice("_w", F.col("start_tok") + 1, F.lit(size))
    return exploded.select(
        id_col,
        (F.col("start_tok") / stride).cast("long").alias("chunk_id"),
        F.col("start_tok").cast("long"),
        F.size(chunk).cast("long").alias("n_tok"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_hash"),
    )


def winnowing_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    window: int = 5,
) -> DataFrame:
    """(id, n_fingerprints, min_fingerprint) — winnowing document sketch.

    Classic winnowing (Schleimer et al., SIGMOD'03) over word k-grams with a
    rolling window: hash every k-gram (md5 hex — the portable rolling-hash
    stand-in), keep the minimum hash of each window of ``window`` consecutive
    k-grams, dedupe the selected hashes per document. Guarantees any shared
    run of window+k-1 words between two docs shares a fingerprint.

    The window min is a bounded-frame window function partitioned by doc —
    shuffles once on the doc id, no cross-doc state.
    """
    terms = " || ' ' || ".join(f"_words[i + {j}]" for j in range(k))
    grams = (
        df.withColumn(
            "_words",
            F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_RUN}', 0)"),
        )
        .select(
            id_col,
            F.posexplode(
                F.expr(
                    f"CASE WHEN size(_words) < {k} THEN array() "
                    f"ELSE transform(sequence(0, size(_words) - {k}), i -> {terms}) END"
                )
            ).alias("pos", "gram"),
        )
        .withColumn("h", F.md5("gram"))
        .withColumn("n_grams", F.count(F.lit(1)).over(Window.partitionBy(id_col)))
    )
    sel_win = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.currentRow, window - 1)
    )
    selected = (
        grams.withColumn("sel", F.min("h").over(sel_win))
        .filter(F.col("pos") <= F.col("n_grams") - window)
        .select(id_col, "sel")
        .distinct()
    )
    return selected.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_fingerprints"),
        F.min("sel").alias("min_fingerprint"),
    )


def length_quantiles(
    df: DataFrame,
    percents: tuple = (25, 50, 75, 90),
    stratum_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """(stratum, pct, n_docs, value) — EXACT per-stratum percentiles of
    document length (whitespace tokens), the length-distribution report a
    mixing/packing decision is based on (sequence-length budgeting, truncation
    policy, Gopher's min/max-word gates).

    Exactness at 100 TB without a global sort: lengths are integers with
    bounded distinct cardinality (a length value, not a document), so the
    distribution ``(stratum, length) -> doc count`` is a bounded relation.
    One shuffle builds it (map-side partial counts collapse each input
    partition to the bound first); the cumulative window then runs per
    stratum over AT MOST ``max_length`` rows — cost independent of corpus
    size, unlike ``percentile_approx`` (approximate, engine-private merge
    order) or ``orderBy().rank()`` (corpus-wide sort). The quantile is
    type-1 (smallest value whose cumulative count reaches ``ceil(pct *
    n/100)``) in PURE INTEGER arithmetic — no floats anywhere, so every
    engine agrees bit-for-bit (invariant 4 by omission).
    """
    n_expr = F.when(F.length(F.trim(F.col(text_col))) == 0, 0).otherwise(
        F.size(F.split(F.trim(F.col(text_col)), "\\s+"))
    )
    dist = (
        df.select(F.col(stratum_col).alias("stratum"), n_expr.alias("n"))
        .groupBy("stratum", "n")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w_all = Window.partitionBy("stratum")
    w_cum = (
        Window.partitionBy("stratum")
        .orderBy("n")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = dist.select(
        "stratum",
        "n",
        F.sum("cnt").over(w_all).cast("long").alias("total"),
        F.sum("cnt").over(w_cum).cast("long").alias("cum"),
    )
    pcts = F.explode(
        F.array(*[F.lit(int(p)).cast("long") for p in percents])
    ).alias("pct")
    return (
        cum.select("stratum", "n", "total", "cum", pcts)
        .filter(
            F.col("cum") >= F.expr("(total * pct + 99) DIV 100")
        )
        .groupBy("stratum", "pct")
        .agg(
            F.max("total").alias("n_docs"),
            F.min("n").cast("long").alias("value"),
        )
    )


def collocations(
    df: DataFrame,
    k: int = 100,
    min_count: int = 5,
    text_col: str = "text",
    window: int = 1,
) -> DataFrame:
    """(rnk, w1, w2, c12, c1, c2, pmi) — corpus-wide top-``k`` bigram
    collocations by pointwise mutual information (Church & Hanks 1990),
    the classic collocation-mining pass a corpus report runs to surface
    multi-word expressions and boilerplate phrases.

    ``pmi = ln(c12 * N / (c1 * c2))`` over the adjacent-bigram stream:
    ``c12`` the bigram's occurrence count, ``c1``/``c2`` the marginal
    counts of its left/right word over all bigrams, ``N`` the corpus
    bigram total. Bigrams under ``min_count`` are dropped before scoring
    (the standard noise floor — PMI over-rewards hapax pairs).

    Scale shape: bigrams are built map-side from each doc's token array
    (one ``transform`` over positions — no window, no per-doc shuffle);
    ONE shuffle groups the corpus bigram stream on the (w1, w2) pair
    with map-side partial counts collapsing hot phrases; the marginals
    and the bigram total derive from the AGGREGATED c12 relation
    (vocab-bounded, far smaller than the token stream), the total
    cross-joined in-plan as a broadcast 1-row aggregate — never a
    driver scalar. The final top-k is orderBy+limit
    (TakeOrderedAndProject); the rank window then runs on <= k rows.

    Float discipline (invariant 4): one ln of one exact expression
    ``(c12_d * N) / (c1_d * c2)`` (two left-assoc double products, one
    divide — no accumulation), rounded to 6; the total order is
    (rounded pmi desc, w1 asc, w2 asc), unique per bigram, so both
    engines rank identically. Counts stay BIGINT end-to-end; the
    products run in doubles so a 10^14-bigram corpus cannot overflow.

    ``window`` > 1 generalizes the stream to ordered skip-gram pairs
    (w[i], w[i+o]) for o in 1..window — the word2vec/SGNS co-occurrence
    statistic (Levy & Goldberg 2014: SGNS factorizes the shifted PMI
    matrix of exactly this stream). Same one-shuffle shape; the map-side
    expansion is bounded at ``window``× the token stream.
    """
    words = F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_RUN}', 0)")
    if window == 1:
        pair_expr = (
            "transform(sequence(0, size(_w) - 2),"
            " i -> struct(_w[i] AS w1, _w[i + 1] AS w2))"
        )
    else:
        pair_expr = (
            "flatten(transform(sequence(0, size(_w) - 2), i ->"
            f" transform(sequence(1, least({window}, size(_w) - 1 - i)),"
            " o -> struct(_w[i] AS w1, _w[i + o] AS w2))))"
        )
    bi = (
        df.withColumn("_w", words)
        .filter(F.size("_w") >= 2)
        .select(F.explode(F.expr(pair_expr)).alias("b"))
        .select("b.w1", "b.w2")
    )
    c12 = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").cast("long").alias("c1"))
    c2 = c12.groupBy("w2").agg(F.sum("c12").cast("long").alias("c2"))
    nbi = c12.agg(F.sum("c12").cast("long").alias("_nbi"))
    scored = (
        c12.filter(F.col("c12") >= min_count)
        .join(c1, "w1")
        .join(c2, "w2")
        .crossJoin(F.broadcast(nbi))
        .select(
            "w1",
            "w2",
            "c12",
            "c1",
            "c2",
            F.round(
                F.log(
                    (F.col("c12").cast("double") * F.col("_nbi"))
                    / (F.col("c1").cast("double") * F.col("c2"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    topk = scored.orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2")).limit(k)
    w = Window.orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
    return topk.withColumn("rnk", F.row_number().over(w).cast("long")).select(
        "rnk", "w1", "w2", "c12", "c1", "c2", "pmi"
    )


def _gram_hashes(
    df: DataFrame,
    n: int,
    key_col: str,
    key_alias: str,
    text_col: str,
    tokens_col: str | None = None,
) -> DataFrame:
    """(key, h) — md5 word-``n``-gram stream, built map-side from each
    doc's token array (one ``transform`` over positions) and hashed
    immediately so downstream shuffles carry a fixed-width key, never
    the text. The ONE spelling of the shingle space that
    ``gram_dup_profile``, ``source_overlap`` and ``heaps_law`` all
    measure — a change here changes all of them consistently (their
    DuckDB twins share the interpolated gram expression the same way).
    Pass ``tokens_col`` when the caller already materialized the token
    array (avoids a second regex pass over the corpus text)."""
    terms = " || ' ' || ".join(f"_w[i + {j}]" for j in range(n))
    if tokens_col is None:
        df = df.withColumn(
            "_w",
            F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_RUN}', 0)"),
        )
    elif tokens_col != "_w":
        df = df.withColumn("_w", F.col(tokens_col))
    return (
        df.filter(F.size("_w") >= n)
        .select(
            F.col(key_col).alias(key_alias),
            F.explode(
                F.expr(f"transform(sequence(0, size(_w) - {n}), i -> md5({terms}))")
            ).alias("h"),
        )
    )


def gram_dup_profile(
    df: DataFrame,
    n: int = 5,
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """(lang, total_grams, distinct_grams, dup_instances, dup_distinct,
    dup_instance_frac, dup_distinct_frac) — the per-language n-gram
    duplication profile: what fraction of word ``n``-gram instances (and
    of distinct n-grams) occur more than once in the corpus slice. The
    corpus-level duplication report of Lee et al. 2022 ("Deduplicating
    Training Data Makes Language Models Better") — run BEFORE dedup to
    size the problem and AFTER to prove the reduction.

    Scale shape: grams are built map-side from each doc's token array
    (one ``transform`` over positions) and hashed to md5 immediately, so
    the shuffle carries a fixed-width key, never the text; ONE shuffle
    groups the gram stream on (lang, hash) with map-side partials
    collapsing hot grams; the profile then folds the AGGREGATED
    gram-count relation per language. No windows, no joins.

    Floats: only the two final fractions — each one divide of two exact
    BIGINTs, rounded 6 (invariant 4 by construction).
    """
    grams = _gram_hashes(df, n, lang_col, "lang", text_col)
    tc = grams.groupBy("lang", "h").agg(F.count(F.lit(1)).cast("long").alias("c"))
    dup = F.col("c") >= 2
    agg = tc.groupBy("lang").agg(
        F.sum("c").cast("long").alias("total_grams"),
        F.count(F.lit(1)).cast("long").alias("distinct_grams"),
        F.sum(F.when(dup, F.col("c")).otherwise(F.lit(0)))
        .cast("long")
        .alias("dup_instances"),
        F.sum(F.when(dup, F.lit(1)).otherwise(F.lit(0)))
        .cast("long")
        .alias("dup_distinct"),
    )
    return agg.select(
        "lang",
        "total_grams",
        "distinct_grams",
        "dup_instances",
        "dup_distinct",
        F.round(
            F.col("dup_instances").cast("double") / F.col("total_grams"), 6
        ).alias("dup_instance_frac"),
        F.round(
            F.col("dup_distinct").cast("double") / F.col("distinct_grams"), 6
        ).alias("dup_distinct_frac"),
    )


def readability(
    df: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """(lang, n_docs, avg_fre, n_very_easy, n_standard, n_difficult,
    n_very_hard) — per-language Flesch reading-ease report (Flesch 1948;
    the classic readability quality signal — Kincaid et al. 1975's
    recalibration kept the same structure), banded at the standard
    90/60/30 cut points.

    ``fre = 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)``
    with the repo's token definition (TOKEN_RUN — single-letter words
    fall below the 2-char floor, documented divergence from prose
    Flesch), sentences = ``[.!?]+`` runs floored at 1, syllables
    approximated as vowel-group ([aeiouy]+) runs per token floored at 1
    — all regex counts, deterministic in both engines.

    Scale shape: everything per-doc is map-side native-Column work; ONE
    shuffle aggregates per language with map-side partials. Floats
    (invariant 4): each doc's fre is a single double expression of
    exact integers and three decimal literals, rounded 6; the per-lang
    mean sums fixed6-quantized fre values in BIGINT (order-independent)
    and divides once; band counts compare the ROUNDED fre to integer
    thresholds, so a sub-1e-6 divergence can never flip a band.
    """
    w_arr = F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_RUN}', 0)")
    sents = F.greatest(
        F.lit(1).cast("long"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit("[.!?]+"), F.lit(0))).cast(
            "long"
        ),
    )
    sylls = F.aggregate(
        F.col("_w"),
        F.lit(0).cast("long"),
        lambda a, t: a
        + F.greatest(
            F.lit(1),
            F.size(F.regexp_extract_all(t, F.lit("[aeiouy]+"), F.lit(0))),
        ).cast("long"),
    )
    per_doc = df.select(
        F.col(lang_col).alias("lang"),
        w_arr.alias("_w"),
        sents.alias("s"),
    ).select(
        "lang",
        F.size("_w").cast("long").alias("w"),
        "s",
        sylls.alias("sy"),
    )
    # lazy CaseWhen guard: under ANSI, CollapseProject can evaluate this
    # projection inside the w > 0 predicate (see embedding_diversity)
    fre = F.when(
        F.col("w") > 0,
        F.round(
            F.lit(206.835)
            - F.lit(1.015) * (F.col("w").cast("double") / F.col("s"))
            - F.lit(84.6) * (F.col("sy").cast("double") / F.col("w")),
            6,
        ),
    )
    scored = per_doc.filter(F.col("w") > 0).select("lang", fre.alias("fre"))

    def band(cond):
        return F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0))).cast("long")

    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(
            F.sum(fixed6_long(F.col("fre"))).cast("double")
            / (F.count(F.lit(1)) * F.lit(1e6)),
            6,
        ).alias("avg_fre"),
        band(F.col("fre") >= 90).alias("n_very_easy"),
        band((F.col("fre") >= 60) & (F.col("fre") < 90)).alias("n_standard"),
        band((F.col("fre") >= 30) & (F.col("fre") < 60)).alias("n_difficult"),
        band(F.col("fre") < 30).alias("n_very_hard"),
    )


def source_overlap(
    df: DataFrame,
    n: int = 5,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """(source_a, source_b, n_a, n_b, n_inter, n_union, jaccard) — exact
    word-``n``-gram-set Jaccard between every pair of sources that share
    at least one shingle: the cross-source redundancy matrix a mixing
    decision consults (two feeds syndicating the same wire copy show up
    as a high-Jaccard pair; Broder 1997's resemblance, computed exactly
    over the shingle sets rather than MinHash-estimated — the estimator
    variant is the `minhash_lsh_pairs` operator).

    Scale shape: shingles are md5-hashed map-side (fixed-width key) and
    the (source, shingle) relation is made DISTINCT first (uniform
    keys); the intersection self-join fans out per shingle by at most
    (sources sharing it choose 2) — bounded by the SOURCE TAXONOMY
    squared, never the corpus (a boilerplate shingle present in all S
    sources yields S² rows, with S in the tens-to-hundreds). Disjoint
    pairs are absent from the output (their Jaccard is 0 by
    definition); the only float is one divide of exact BIGINTs,
    rounded 6 (invariant 4).
    """
    st = _gram_hashes(df, n, source_col, "source", text_col).distinct()
    sizes = st.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n"))
    a = st.select(F.col("source").alias("source_a"), "h")
    b = st.select(F.col("source").alias("source_b"), "h")
    inter = (
        a.join(b, "h")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_inter"))
    )
    sa = sizes.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))
    uni = (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("long")
    return (
        inter.join(sa, "source_a")
        .join(sb, "source_b")
        .select(
            "source_a",
            "source_b",
            "n_a",
            "n_b",
            "n_inter",
            uni.alias("n_union"),
            F.round(
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
    )


def zipf_stats(
    df: DataFrame,
    r: int = 200,
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """(lang, vocab, total_tokens, top_n, zipf_slope, r2) — per-language
    rank-frequency statistics: vocabulary size, token total, and the
    log-log Zipf slope with its fit quality over the top-``r`` terms.
    The corpus-QA report a curation pipeline runs to spot distributional
    anomalies (machine-generated or template-heavy text flattens the
    head; a slope far from a natural corpus's is a red flag — Zipf 1949,
    Piantadosi 2014's review of rank-frequency diagnostics).

    Slope/R² come from the ordinary least-squares closed form over the
    points (ln rank, ln count), rank 1..r by (count desc, term asc).

    Scale shape: the token stream collapses to the (lang, term)->count
    relation in ONE shuffle with map-side partials; everything after
    runs on that AGGREGATED vocab-bounded relation (rows ∝ vocabulary,
    not corpus). The top-``r`` selection is a salted TWO-PHASE rank —
    local top-r per (lang, md5-salt) shard, then the real rank over the
    ≤ salts·r survivors — because ``lang`` has ~10 values: a single
    per-lang window would funnel each language's whole vocabulary
    through one task at 100 TB (the same hot-key funnel invariant 6
    bans for countDistinct). Exact by the standard union-of-local-top-r
    ⊇ global-top-r argument, so the result is unchanged. Then a
    per-lang fold to six integers. No driver scalars, no corpus-wide
    sort.

    Float discipline (invariant 4): each point is quantized ONCE
    (``round(ln(v)·1e6, 0)`` — an integer-valued double, cast exact in
    both engines); the OLS sums are then PURE BIGINT arithmetic —
    order-independent, so partitioning can never perturb them (the
    ``sum_fixed6`` pattern). Slope and R² are single double expressions
    of those exact integers, rounded to 6. Magnitudes: x6 ≤ ln(r)·1e6,
    y6 ≤ ln(count)·1e6 ≈ 3.5e7 even at 10^15 tokens, so the BIGINT
    x6·y6 sums stay < 2^63 for any realistic ``r``.
    """
    tok = df.select(
        F.col(lang_col).alias("lang"),
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_RUN}', 0)")
        ).alias("term"),
    )
    tc = tok.groupBy("lang", "term").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    tot = tc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.sum("cnt").cast("long").alias("total_tokens"),
    )
    # phase 1: local top-r inside each of 32 md5(term) salt shards —
    # the salt routes only Spark-internal parallelism, never the result
    w_local = Window.partitionBy("lang", "_salt").orderBy(
        F.desc("cnt"), F.asc("term")
    )
    cand = (
        tc.withColumn(
            "_salt", F.pmod(F.conv(F.substring(F.md5("term"), 1, 4), 16, 10).cast("long"), F.lit(32))
        )
        .withColumn("_lrnk", F.row_number().over(w_local))
        .filter(F.col("_lrnk") <= r)
        .drop("_salt", "_lrnk")
    )
    # phase 2: the real rank, now over at most 32*r rows per language
    w = Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("term"))
    pts = (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= r)
        .select(
            "lang",
            fixed6_long(F.log(F.col("rnk").cast("double"))).alias("x6"),
            fixed6_long(F.log(F.col("cnt").cast("double"))).alias("y6"),
        )
    )
    sums = (
        pts.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x6").cast("long").alias("sx"),
            F.sum("y6").cast("long").alias("sy"),
            F.sum(F.col("x6") * F.col("x6")).cast("long").alias("sxx"),
            F.sum(F.col("x6") * F.col("y6")).cast("long").alias("sxy"),
            F.sum(F.col("y6") * F.col("y6")).cast("long").alias("syy"),
        )
        .filter(F.col("n") >= 2)
    )
    n_d = F.col("n").cast("double")
    sx_d = F.col("sx").cast("double")
    sy_d = F.col("sy").cast("double")
    num = n_d * F.col("sxy") - sx_d * F.col("sy")
    den = n_d * F.col("sxx") - sx_d * F.col("sx")
    den2 = n_d * F.col("syy") - sy_d * F.col("sy")
    return tot.join(sums, "lang").select(
        "lang",
        "vocab",
        "total_tokens",
        F.col("n").alias("top_n"),
        F.round(num / den, 6).alias("zipf_slope"),
        F.round((num * num) / (den * den2), 6).alias("r2"),
    )


def heaps_law(
    df: DataFrame,
    n: int = 3,
    buckets: int = 10,
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(decile, n_docs, n_grams, vocab, heaps_beta, heaps_r2) — vocabulary
    growth across the corpus in ``buckets`` doc-id slices, plus the
    Heaps'-law exponent: distinct word-``n``-gram count V as a function of
    gram instances N, fit as ln V = ln K + beta·ln N (Heaps 1978; the
    index-size forecast an indexing pipeline runs before committing to a
    term-partition count — beta tells you how the postings dictionary
    grows when the corpus does 10x). The unit is the md5 ``n``-gram
    shingle (the ``_gram_hashes`` spelling), not the unigram, because a
    bounded template vocabulary saturates in the first slice and the fit
    degenerates; gram novelty keeps growing.

    Scale shape: doc-id min/max arrive as a broadcast 1-row cross join
    (no driver collect); each gram hash collapses to its FIRST slice via
    one shuffle on the uniform md5 key with map-side partials; everything
    after runs on relations bounded by ``buckets`` rows (the cumulative
    window is a single-partition WindowExec over <= ``buckets`` rows by
    construction — same bounded-input argument as the top-k re-ranks).

    Float discipline (invariant 4): the OLS points quantize ln(N), ln(V)
    ONCE to integer micros (``fixed6_long``); the regression sums are
    pure BIGINT; beta/R² are single double expressions of those exact
    integers, rounded 6, with lazy ``F.when`` zero-denominator guards in
    the SAME expression (the ANSI CollapseProject gotcha — a filter-only
    guard can still evaluate the division on filtered rows).
    """
    d = df.select(
        F.col(doc_col).alias("doc_id"),
        F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_RUN}', 0)").alias(
            "_w"
        ),
    )
    mm = d.agg(F.min("doc_id").alias("_lo"), F.max("doc_id").alias("_hi"))
    dd = d.crossJoin(F.broadcast(mm)).select(
        "_w",
        (
            F.expr(f"((doc_id - _lo) * {buckets}) div (_hi - _lo + 1)") + 1
        )
        .cast("int")
        .alias("dc"),
    )
    grams = _gram_hashes(dd, n, "dc", "dc", text_col, tokens_col="_w")
    nv = (
        grams.groupBy("h")
        .agg(F.min("dc").alias("dc"))
        .groupBy("dc")
        .agg(F.count(F.lit(1)).cast("long").alias("_nv"))
    )
    per = dd.groupBy("dc").agg(
        F.count(F.lit(1)).cast("long").alias("_docs"),
        F.sum(F.greatest(F.size("_w") - (n - 1), F.lit(0)))
        .cast("long")
        .alias("_grams"),
    )
    w_cum = Window.orderBy("dc").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per.join(nv, "dc", "left").select(
        F.col("dc").alias("decile"),
        F.sum("_docs").over(w_cum).cast("long").alias("n_docs"),
        F.sum("_grams").over(w_cum).cast("long").alias("n_grams"),
        F.sum(F.coalesce("_nv", F.lit(0))).over(w_cum).cast("long").alias("vocab"),
    )
    pts = cum.filter((F.col("n_grams") > 0) & (F.col("vocab") > 0)).select(
        fixed6_long(F.log(F.col("n_grams").cast("double"))).alias("x6"),
        fixed6_long(F.log(F.col("vocab").cast("double"))).alias("y6"),
    )
    sums = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x6").cast("long").alias("sx"),
        F.sum("y6").cast("long").alias("sy"),
        F.sum(F.col("x6") * F.col("x6")).cast("long").alias("sxx"),
        F.sum(F.col("x6") * F.col("y6")).cast("long").alias("sxy"),
        F.sum(F.col("y6") * F.col("y6")).cast("long").alias("syy"),
    ).filter(F.col("n") >= 2)
    n_d = F.col("n").cast("double")
    sx_d = F.col("sx").cast("double")
    sy_d = F.col("sy").cast("double")
    num = n_d * F.col("sxy") - sx_d * F.col("sy")
    den = n_d * F.col("sxx") - sx_d * F.col("sx")
    den2 = n_d * F.col("syy") - sy_d * F.col("sy")
    fit = sums.select(
        F.when(den != 0, F.round(num / den, 6)).alias("heaps_beta"),
        F.when((den != 0) & (den2 != 0), F.round((num * num) / (den * den2), 6)).alias(
            "heaps_r2"
        ),
    )
    return cum.crossJoin(F.broadcast(fit)).orderBy("decile")


def tfidf_keywords(
    df: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, rnk, term, tf, dfreq, score) — per-document top-``k`` keyword
    extraction by TF-IDF, the classic corpus-analysis / index-enrichment
    operator (Salton & Buckley 1988; the keyword signal behind the
    reference's per-field term weighting, SURVEY.md E10/A2, repurposed
    for corpus reporting). ``score = tf * ln(N / df)`` with N the corpus
    document count and df the term's document frequency.

    Scale shape: term frequencies group on the uniform (doc, term) pair;
    document frequencies use the two-phase skew-free
    :func:`~search_engine_spark.pair_helpers.doc_frequencies` (invariant
    6 — no countDistinct on the Zipf-skewed term); N is an in-plan 1-row
    aggregate cross-joined (broadcast), never a driver ``.count()``; the
    final top-k windows on the uniform doc id.

    Float discipline (invariant 4): the score is ONE multiply of an
    exact integer tf by one ln of one exact division — no accumulation —
    rounded to 6; ranking orders by the ROUNDED score (ties broken by
    term asc), so both engines rank identically (the term_stats idf
    precedent).
    """
    from ..pair_helpers import doc_frequencies, scalar_count

    toks = df.select(
        id_col,
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_RUN}', 0)")
        ).alias("term"),
    )
    tf = toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    dfreq = doc_frequencies(toks, key="term", doc=id_col).select(
        "term", F.col("doc_frequency").cast("long").alias("dfreq")
    )
    n = scalar_count(df.select(id_col), "_n")
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            id_col,
            "term",
            "tf",
            "dfreq",
            F.round(
                F.col("tf") * F.log(F.col("_n") / F.col("dfreq")), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select(id_col, "rnk", "term", "tf", "dfreq", "score")
    )
