"""Webtext curation operators: PII redaction, Gopher quality gates,
repetition statistics.

These extend the reference's quality scoring (``app/crawler/extractor.py``
quality heuristics, SURVEY.md E11/E14) with the standard LLM-training-data
curation rules a 100 TB pipeline applies before tokenization:

- :func:`pii_stats` — regex detection + redaction of emails / NANP phone
  numbers / IPv4 addresses (the C4-style scrubbing pass);
- :func:`gopher_quality` — the per-document quality gates of Gopher
  (Rae et al. 2021, "Scaling Language Models", Appendix A1.1): word count,
  mean word length, symbol-to-word ratio, bullet/ellipsis line fractions,
  alphabetic-word fraction, required-stopword count;
- :func:`repetition_stats` — Gopher's repetition signals: duplicate-line
  fraction and the character fraction covered by the most frequent word
  2-gram;
- :func:`dedup_lines` — C4-style GLOBAL line dedup (Raffel et al. 2020
  §2.2: every occurrence of a repeated span after the first is removed,
  corpus-wide), skew-safe;
- :func:`url_blocklist_filter` — UT1/RefinedWeb-style domain blocklist
  (Penedo et al. 2023 §3.1): host suffix-chain equi-join against a
  broadcast blocklist, so a parent-domain entry blocks every subdomain
  without a regex scan;
- :func:`lm_quality` — CCNet-style language-model quality scoring
  (Wenzek et al. 2020 §4.3): per-document mean log-likelihood under a
  corpus-trained smoothed unigram LM (the engine-portable stand-in for
  the KenLM 5-gram perplexity filter — same monotone ranking signal,
  exact integer counts instead of an external model file).

Everything except the top-bigram argmax is a per-row native Column
expression (regex + higher-order array functions) — zero shuffles, zero
Python UDFs, embarrassingly parallel at any scale. The top-bigram argmax
shuffles once on the (uniform) document id and windows within each
document, so no skew is possible (CLAUDE.md invariant 6). All regexes are
Java/RE2-portable (ASCII classes, no lookarounds) so the DuckDB oracles
replay them exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..pair_helpers import fixed6_long

# Portable ASCII regexes — identical semantics under Java (Spark) and RE2
# (DuckDB): character classes, bounded repetition and \b / \d only.
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

# Gopher rule A1.1 required stopwords: a document must contain >= 2 kinds.
REQUIRED_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

# Gopher gate constants (Rae et al. 2021, Appendix A1.1).
MIN_WORDS, MAX_WORDS = 50, 100_000
MIN_MEAN_WORD_LEN, MAX_MEAN_WORD_LEN = 3.0, 10.0
MAX_SYMBOL_RATIO = 0.1
MAX_BULLET_LINE_FRAC = 0.1  # ">= 90% of lines do not start with a bullet"
MAX_ELLIPSIS_LINE_FRAC = 0.3
MIN_ALPHA_WORD_FRAC = 0.8
MIN_STOPWORD_KINDS = 2


def host_of(url_col) -> F.Column:
    """Lowercased host of an http(s) url via pure string splits
    (``split(url, '/')[2]``, port stripped) — no regex, so the DuckDB
    twin (``string_split(url, '/')[3]``, 1-based) replays it exactly."""
    col = F.col(url_col) if isinstance(url_col, str) else url_col
    return F.lower(F.split(F.split(col, "/").getItem(2), ":").getItem(0))


def url_blocklist_filter(
    docs: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, host, blocked) — UT1/RefinedWeb-style domain blocklist check:
    a document is blocked iff its url's host, or ANY parent domain of it,
    appears in the blocklist (``ads.tracker.example.com`` is blocked by a
    ``tracker.example.com`` entry). ``blocklist`` is a one-column
    (``domain``) DataFrame of lowercase domains.

    Scale shape: the host explodes into its suffix chain (≤ label-count
    rows, ~5 for real hosts) and each suffix EQUI-joins a broadcast of
    the blocklist — no regex LIKE scan over millions of patterns, no
    shuffle of the corpus side. UT1-sized lists (a few million domains)
    broadcast fine; beyond that, swap ``F.broadcast`` for a bucketed join
    on the suffix without touching the suffix-chain logic. A NULL or
    unparseable url yields a NULL host and is never blocked (flag it
    upstream with a validity gate, not here).
    """
    suffixes = F.expr(
        "transform(sequence(1, size(_labels)), "
        "i -> array_join(slice(_labels, i, size(_labels) - i + 1), '.'))"
    )
    base = docs.select(
        F.col(id_col), host_of(url_col).alias("host")
    ).withColumn("_labels", F.split(F.col("host"), r"\."))
    exploded = base.select(
        id_col, "host", F.explode_outer(suffixes).alias("_suffix")
    )
    bl = blocklist.select(F.lower(F.col("domain")).alias("_suffix")).distinct()
    hits = (
        exploded.join(F.broadcast(bl), "_suffix", "inner")
        .select(id_col)
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    return (
        base.join(hits, id_col, "left")
        .select(
            id_col,
            "host",
            F.coalesce(F.col("_hit"), F.lit(0)).cast("long").alias("blocked"),
        )
    )


def pii_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds n_emails / n_phones / n_ipv4 counts and a ``redacted`` text
    column with each match replaced by <EMAIL> / <PHONE> / <IP>.

    Counts are taken on the original text; redaction applies the three
    patterns sequentially (email first — its domain can never re-match the
    phone/IP patterns, so order only matters for determinism, which the
    fixed sequence provides).
    """
    c = F.col(text_col)

    def _count(pat: str) -> F.Column:
        return F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0))).cast("long")

    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(c, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
        ),
        IPV4_RE,
        "<IP>",
    )
    return (
        df.withColumn("n_emails", _count(EMAIL_RE))
        .withColumn("n_phones", _count(PHONE_RE))
        .withColumn("n_ipv4", _count(IPV4_RE))
        .withColumn("redacted", redacted)
    )


def _words(text_col: str) -> F.Column:
    return F.split(F.trim(F.col(text_col)), r"\s+")


def gopher_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document Gopher quality metrics plus a 0/1 ``passes`` gate.

    Ratios are rounded to 6 decimals *before* gating so the Spark and
    DuckDB sides compare bit-identical doubles against the thresholds
    (CLAUDE.md invariant 1/4 — every ratio is a single division of two
    exact integers, deterministic under any execution order).
    """
    w = _words(text_col)
    lines = F.split(F.col(text_col), "\n")

    n_words = F.size(w).cast("long")
    word_chars = F.expr(
        f"aggregate(split(trim({text_col}), '\\\\s+'), 0L, (acc, x) -> acc + length(x))"
    )
    mean_word_len = F.round(word_chars / n_words, 6)

    n_symbols = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(r"#|\.\.\."), F.lit(0))
    )
    symbol_ratio = F.round(n_symbols / n_words, 6)

    n_lines = F.size(lines)
    frac_bullet = F.round(
        F.size(F.filter(lines, lambda l: l.like("- %"))) / n_lines, 6
    )
    frac_ellipsis = F.round(
        F.size(F.filter(lines, lambda l: l.like("%..."))) / n_lines, 6
    )
    frac_alpha = F.round(
        F.size(F.filter(w, lambda x: x.rlike("[a-z]"))) / n_words, 6
    )

    n_stop = None
    for s in REQUIRED_STOPWORDS:
        hit = F.array_contains(w, s).cast("long")
        n_stop = hit if n_stop is None else n_stop + hit

    out = (
        df.withColumn("n_words", n_words)
        .withColumn("mean_word_len", mean_word_len)
        .withColumn("symbol_ratio", symbol_ratio)
        .withColumn("frac_bullet_lines", frac_bullet)
        .withColumn("frac_ellipsis_lines", frac_ellipsis)
        .withColumn("frac_alpha_words", frac_alpha)
        .withColumn("n_stop_kinds", n_stop)
    )
    passes = (
        (F.col("n_words") >= MIN_WORDS)
        & (F.col("n_words") <= MAX_WORDS)
        & (F.col("mean_word_len") >= MIN_MEAN_WORD_LEN)
        & (F.col("mean_word_len") <= MAX_MEAN_WORD_LEN)
        & (F.col("symbol_ratio") <= MAX_SYMBOL_RATIO)
        & (F.col("frac_bullet_lines") <= MAX_BULLET_LINE_FRAC)
        & (F.col("frac_ellipsis_lines") <= MAX_ELLIPSIS_LINE_FRAC)
        & (F.col("frac_alpha_words") >= MIN_ALPHA_WORD_FRAC)
        & (F.col("n_stop_kinds") >= MIN_STOPWORD_KINDS)
    )
    return out.withColumn("passes", passes.cast("long"))


def dedup_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_line_len: int = 1,
) -> DataFrame:
    """(id, n_lines_kept, text) — global line-level dedup: a line is kept
    only at its corpus-wide FIRST occurrence (min (doc_id, line_index));
    every later occurrence — in other documents or later in the same one —
    is removed, and each document is reassembled from its surviving lines
    in order. Lines shorter than ``min_line_len`` (default: empty lines)
    are never dedup candidates and always survive.

    A document whose every line was seen earlier reassembles to ''
    (row-preserving — the caller's audit decides whether to drop empties).

    Skew discipline (CLAUDE.md invariant 6): the hot key here is the line
    text (boilerplate lines repeat millions of times at crawl scale). The
    first-occurrence owner is computed with groupBy(line).min(struct) —
    map-side partial aggregation, one surviving row per distinct line —
    and the keep decision then joins on the composite (line, id, idx) key,
    which is UNIQUE per row, so no reducer ever sees a hot-key fan-out.
    No window over the line key exists anywhere in the plan.
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("idx", "line"),
    )
    short = lines.filter(F.length("line") < min_line_len)
    eligible = lines.filter(F.length("line") >= min_line_len)
    first = (
        eligible.groupBy("line")
        .agg(F.min(F.struct(id_col, "idx")).alias("m"))
        .select(
            "line",
            F.col(f"m.{id_col}").alias(id_col),
            F.col("m.idx").alias("idx"),
        )
    )
    kept = eligible.join(first, ["line", id_col, "idx"], "left_semi").unionByName(
        short
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_lines_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias(text_col),
    )
    return df.select(id_col).join(rebuilt, id_col, "left").select(
        id_col,
        F.coalesce("n_lines_kept", F.lit(0)).cast("long").alias("n_lines_kept"),
        F.coalesce(text_col, F.lit("")).alias(text_col),
    )


def dedup_spans(
    df: DataFrame,
    n: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens, n_tokens_removed, text) — ExactSubstr-style span
    dedup (Lee et al. 2021 "Deduplicating Training Data Makes Language
    Models Better"): any ``n``-token window whose content appears
    earlier in the corpus (earlier = smaller (doc, position), the
    deterministic global order) is removed from the LATER occurrence,
    and documents are rebuilt from their surviving tokens in order.
    Overlapping duplicate windows are removed once (position union —
    the same ascending coverage sweep as gopher_repetition). The paper
    operates on suffix arrays over a byte concatenation; the
    distributed equivalent here fingerprints every sliding window with
    md5 over the joined tokens — exact (not probabilistic) up to md5
    collisions, and engine-portable so the DuckDB oracle replays it.

    Tokens are the NON-EMPTY runs between whitespace (leading/trailing
    tabs and newlines produce no phantom empty tokens); reassembly joins
    surviving tokens with single spaces (span removal normalizes
    whitespace — documented divergence from the byte-exact paper,
    inherent to token-window granularity; in a pipeline this stage must
    therefore run AFTER any line-structure gate, see curate_corpus
    stage 3c). Documents shorter than ``n`` tokens carry no window and
    pass through untouched (their text still re-joins on spaces).

    Skew discipline (invariant 6): the hot key is the window hash
    (boilerplate repeats millions of times at crawl scale). The
    first-occurrence owner is groupBy(hash).min(struct(doc, pos)) —
    map-side partials, one surviving row per distinct hash — and the
    keep decision joins back on the UNIQUE composite (hash, doc, pos),
    so no reducer sees a hot-key fan-out (the dedup_lines pattern).
    Every other shuffle keys on the uniform doc id.
    """
    warr = df.select(
        F.col(id_col),
        F.expr(
            f"filter(split(coalesce({text_col}, ''), '\\\\s+'), "
            "x -> x != '')"
        ).alias("_w"),
    )
    toks = warr.select(id_col, F.posexplode("_w").alias("pos", "tok"))
    wins = warr.select(
        F.col(id_col),
        F.posexplode(
            F.expr(
                f"CASE WHEN size(_w) < {n} THEN array() "
                f"ELSE transform(sequence(1, size(_w) - {n} + 1), "
                f"i -> md5(array_join(slice(_w, i, {n}), ' '))) END"
            )
        ).alias("pos", "h"),
    )
    first = wins.groupBy("h").agg(
        F.min(F.struct(id_col, "pos")).alias("m")
    ).select(
        "h", F.col(f"m.{id_col}").alias(id_col), F.col("m.pos").alias("pos")
    )
    dup_wins = wins.join(first, ["h", id_col, "pos"], "left_anti")
    removed = dup_wins.select(
        id_col, F.explode(F.expr(f"sequence(pos, pos + {n} - 1)")).alias("pos")
    ).distinct()
    kept = toks.join(removed, [id_col, "pos"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("_nk"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("_text"),
    )
    totals = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("_nt"))
    return (
        df.select(id_col)
        .join(totals, id_col, "left")
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("_nt", F.lit(0)).cast("long").alias("n_tokens"),
            (F.coalesce("_nt", F.lit(0)) - F.coalesce("_nk", F.lit(0)))
            .cast("long")
            .alias("n_tokens_removed"),
            F.coalesce("_text", F.lit("")).alias(text_col),
        )
    )


def bloom_dedup(
    df: DataFrame,
    m_bits: int = 1 << 26,
    k: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "bff",
) -> DataFrame:
    """(id, n_paras, n_dup_paras, text) — Bloom-filter paragraph dedup
    (the Dolma toolkit's BFF pass, Soldaini et al. 2024 "Dolma" §4 /
    allenai/bff): paragraphs stream through an ``m_bits``-bit Bloom
    filter with ``k`` salted hash functions in global (doc, paragraph)
    order; a paragraph whose ``k`` bit positions were ALL set by
    earlier paragraphs is dropped (exact duplicates always, plus the
    filter's false-positive rate ``(1 - e^(-k*n/m))^k`` of distinct
    paragraphs — the deliberate memory/recall trade that lets BFF
    dedup a 100 TB crawl with a fixed-RAM filter).

    The sequential semantics has an exact order-free batch
    formulation, which is what runs here: test-then-add and
    add-iff-kept coincide (a true duplicate's bits equal its first
    occurrence's; a false positive's bits are all set either way), so
    bit ``p`` is "set before paragraph q" iff ``min`` over the corpus
    of the (doc, idx) of paragraphs hashing to ``p`` is < q's own
    (doc, idx). That min is a groupBy(bit).min(struct) — map-side
    partial combine collapses hot boilerplate before the shuffle, one
    surviving row per distinct bit (<= m_bits total), and the verdict
    join carries ids only (invariant 6). No driver-side bitmap, no
    Python: the "filter" is a relation, so m_bits can exceed RAM.

    Paragraphs are newline splits, trimmed, empties dropped (the BFF
    normalization). Positions are ``md5(seed:salt:para)`` first-8-hex
    mod m_bits — engine-portable (invariant 2), replayed bit-for-bit
    by the DuckDB oracle. Kept paragraphs are reassembled in order
    with single newlines; paragraph-free docs pass through empty.
    """
    paras = df.select(
        F.col(id_col),
        F.posexplode(
            F.expr(
                f"filter(transform(split(coalesce({text_col}, ''), '\\n'), "
                "x -> trim(BOTH ' \t\r' FROM x)), x -> x != '')"
            )
        ).alias("pidx", "para"),
    )
    bits = paras.select(
        id_col,
        "pidx",
        F.explode(F.expr(f"sequence(0, {k - 1})")).alias("s"),
        "para",
    ).select(
        id_col,
        "pidx",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.lit(seed), F.col("s"), F.col("para"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % F.lit(m_bits)
        ).alias("bit"),
    )
    setter = (
        bits.groupBy("bit")
        .agg(F.min(F.struct(id_col, "pidx")).alias("m"))
        .select(
            "bit",
            F.col(f"m.{id_col}").alias("_sd"),
            F.col("m.pidx").alias("_sp"),
        )
    )
    earlier = (F.col("_sd") < F.col(id_col)) | (
        (F.col("_sd") == F.col(id_col)) & (F.col("_sp") < F.col("pidx"))
    )
    dup = (
        bits.join(setter, "bit")
        .groupBy(id_col, "pidx")
        .agg(F.min(earlier.cast("int")).alias("_all_earlier"))
        .filter(F.col("_all_earlier") == 1)
        .select(id_col, "pidx")
    )
    kept = paras.join(dup, [id_col, "pidx"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("_nk"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pidx", "para"))),
                lambda s: s["para"],
            ),
            "\n",
        ).alias("_text"),
    )
    totals = paras.groupBy(id_col).agg(F.count(F.lit(1)).alias("_np"))
    return (
        df.select(id_col)
        .join(totals, id_col, "left")
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("_np", F.lit(0)).cast("long").alias("n_paras"),
            (F.coalesce("_np", F.lit(0)) - F.coalesce("_nk", F.lit(0)))
            .cast("long")
            .alias("n_dup_paras"),
            F.coalesce("_text", F.lit("")).alias(text_col),
        )
    )


# C4 cleaning heuristics (Raffel et al. 2020 §2.2) — the PAPER's values:
# keep only lines ending in a terminal punctuation mark, with >= 3 words,
# not mentioning javascript; drop pages with < 5 sentences, any page
# containing 'lorem ipsum' or a curly bracket. (The TF reference
# implementation differs in two documented ways: 5 words/line and an NLTK
# sentence tokenizer — here sentences are counted as terminal-punctuation
# marks in the RETAINED lines, the engine-portable approximation.)
C4_TERMINAL_MARKS = (".", "!", "?", '"')
C4_TERMINAL_MARKS_SQL = ", ".join(f"'{m}'" for m in C4_TERMINAL_MARKS)
C4_SENTENCE_RE = '[.!?"]'
C4_MIN_WORDS_PER_LINE = 3
C4_MIN_SENTENCES = 5


def c4_rules(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_lines, n_lines_kept, n_sentences, has_lorem, has_brace,
    cleaned, passes) — the C4 line/page cleaning rules (Raffel et al.
    2020 §2.2), the canonical filter family alongside Gopher (A1.1/A1.2),
    UT1 blocklisting and the CCNet LM gate:

    - LINE rules (applied per line, survivors reassembled in order into
      ``cleaned``): ends in terminal punctuation (``. ! ? "``), contains
      >= 3 words, does not mention "javascript" (case-insensitive);
    - PAGE rules (``passes`` = 1 iff all hold): >= 5 sentences in the
      retained text (sentences ~ terminal punctuation marks — the
      engine-portable stand-in for C4's NLTK tokenizer, documented
      above), no "lorem ipsum" (case-insensitive) and no ``{`` anywhere
      on the ORIGINAL page.

    Scale shape: one map-side projection — per-row array filter + folds,
    zero shuffles (same plan class as :func:`gopher_repetition`).
    Row-preserving: the caller's gate decides what to drop. NULL text
    behaves like '' (0 lines kept, fails the sentence floor).
    """
    # right(l, 1) IN (...) instead of a $-anchored regex: Java's $ also
    # matches before a final \r, RE2's does not — right() is identical
    # in both engines.
    kept = (
        "filter(split(coalesce({t}, ''), '\\n'), l -> "
        f"right(l, 1) IN ({C4_TERMINAL_MARKS_SQL}) "
        f"AND size(regexp_extract_all(l, '\\\\S+', 0)) >= {C4_MIN_WORDS_PER_LINE} "
        "AND NOT contains(lower(l), 'javascript'))"
    ).format(t=text_col)
    base = df.select(
        F.col(id_col),
        F.size(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n"))
        .cast("long")
        .alias("n_lines"),
        F.lower(F.coalesce(F.col(text_col), F.lit(""))).contains("lorem ipsum")
        .cast("long")
        .alias("has_lorem"),
        F.coalesce(F.col(text_col), F.lit("")).contains("{")
        .cast("long")
        .alias("has_brace"),
        F.expr(kept).alias("_kept"),
    ).select(
        id_col,
        "n_lines",
        F.size("_kept").cast("long").alias("n_lines_kept"),
        F.expr(
            f"CAST(size(regexp_extract_all(array_join(_kept, '\\n'), "
            f"'{C4_SENTENCE_RE}', 0)) AS BIGINT)"
        ).alias("n_sentences"),
        "has_lorem",
        "has_brace",
        F.array_join("_kept", "\n").alias("cleaned"),
    )
    return base.withColumn(
        "passes",
        (
            (F.col("n_sentences") >= C4_MIN_SENTENCES)
            & (F.col("has_lorem") == 0)
            & (F.col("has_brace") == 0)
        ).cast("long"),
    )


# Gopher repetition thresholds (Rae et al. 2021, Table A1): a document
# passes iff EVERY metric is at or below its bound.
REPETITION_THRESHOLDS = {
    "dup_line_frac": 0.30,
    "dup_para_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "dup_para_char_frac": 0.20,
    "top_2_gram_frac": 0.20,
    "top_3_gram_frac": 0.18,
    "top_4_gram_frac": 0.16,
    "dup_5_gram_frac": 0.15,
    "dup_6_gram_frac": 0.14,
    "dup_7_gram_frac": 0.13,
    "dup_8_gram_frac": 0.12,
    "dup_9_gram_frac": 0.11,
    "dup_10_gram_frac": 0.10,
}


def gopher_repetition(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The FULL Gopher repetition rule set (Rae et al. 2021, Appendix
    A1.2) per document, plus a 0/1 ``passes_repetition`` gate — the
    companion to :func:`gopher_quality` (A1.1) and the superset of
    :func:`repetition_stats`:

    - ``dup_line_frac`` / ``dup_para_frac`` — fraction of lines /
      ``\\n\\n``-paragraphs that are repeats of an earlier one;
    - ``dup_line_char_frac`` / ``dup_para_char_frac`` — characters in
      those repeated occurrences / total text characters;
    - ``top_{2,3,4}_gram_frac`` — characters covered by the most frequent
      word n-gram (count x gram string length, spaces included; ties
      break on count DESC, gram ASC) / total text characters;
    - ``dup_{5..10}_gram_frac`` — characters of words covered by ANY
      non-first occurrence of a repeated n-gram / total text characters,
      overlapping occurrences counted ONCE (the word-position union, as
      the paper specifies).

    Definitional choices the paper leaves open are fixed here exactly as
    in the public DataTrove implementation of this filter (duplicate
    elements = occurrences after the first; denominators = text length)
    and documented so the DuckDB twin replays them.

    Scale shape: the whole operator is a SINGLE map-side projection —
    zero shuffles, zero joins. Every metric is per-document, so instead
    of exploding a 9x token stream into corpus-wide gram/count/position
    shuffles, each row sorts its own gram array (``array_sort`` — equal
    grams become adjacent) and folds it once with ``aggregate``:
    run-length max for the top-n-gram (count DESC, gram ASC tie-break),
    previous-equal detection for non-first occurrences, and an
    ascending-position sweep for the overlap-once character union.
    O(w log w) per row per n; lines/paragraph metrics are per-row array
    folds (O(lines²), lines per web doc are bounded). At 100 TB this is
    the difference between a pure scan and shuffling ~9x the corpus
    through seven exchanges. All ratios are single divisions of exact
    integers rounded to 6 (invariant 4); the gate compares the ROUNDED
    values.
    """
    dup_elems = "(size({c}) - size(array_distinct({c})))"
    dup_chars = (
        "aggregate(array_distinct({c}), 0L, "
        "(acc, d) -> acc + (size(filter({c}, x -> x = d)) - 1) * length(d))"
    )
    base = df.select(
        F.col(id_col),
        F.coalesce(F.length(text_col), F.lit(0)).cast("long").alias("n_chars"),
        _words(text_col).alias("w"),
        F.split(F.col(text_col), "\n").alias("lines"),
        F.split(F.col(text_col), "\n\n").alias("paras"),
    ).select(
        id_col,
        "n_chars",
        "w",
        F.expr(dup_elems.format(c="lines")).cast("long").alias("_dle"),
        F.expr(dup_chars.format(c="lines")).alias("_dlc"),
        F.expr(dup_elems.format(c="paras")).cast("long").alias("_dpe"),
        F.expr(dup_chars.format(c="paras")).alias("_dpc"),
        F.size("lines").cast("long").alias("_nl"),
        F.size("paras").cast("long").alias("_np"),
    )
    def top_gram_chars(n: int) -> F.Column:
        # sorted grams make equal grams adjacent; one fold tracks the
        # current run length and keeps the best (count, gram). Strictly-
        # greater updates on an ascending walk = count DESC, gram ASC
        # tie-break, exactly the oracle's row_number ordering.
        run = "IF(g <=> a.prev, a.run + 1L, 1L)"
        return F.expr(
            f"CASE WHEN size(w) >= {n} THEN aggregate("
            f"array_sort(transform(sequence(1, size(w) - {n} + 1), "
            f"i -> array_join(slice(w, i, {n}), ' '))), "
            "named_struct('prev', CAST(NULL AS STRING), 'run', 0L, "
            "'bestc', 0L, 'bestg', CAST(NULL AS STRING)), "
            f"(a, g) -> named_struct("
            f"'prev', g, "
            f"'run', {run}, "
            f"'bestc', IF({run} > a.bestc, {run}, a.bestc), "
            f"'bestg', IF({run} > a.bestc, g, a.bestg)), "
            "a -> a.bestc * length(a.bestg)) "
            "ELSE CAST(NULL AS BIGINT) END"
        )

    def dup_gram_chars(n: int) -> F.Column:
        # (gram, pos) structs sorted by (g ASC, p ASC): an element whose
        # predecessor carries the same gram is a non-first occurrence
        # (p > min p of its gram). The inner fold collects those
        # positions; sorted ascending they admit a single left-to-right
        # coverage sweep — each position covers [p, p+n-1], characters
        # already counted (<= running end) are skipped, so overlapping
        # occurrences count once, exactly the oracle's DISTINCT idx union.
        last = f"p + {n - 1}L"
        return F.expr(
            f"CASE WHEN size(w) >= {n} THEN aggregate("
            "array_sort(aggregate("
            f"array_sort(transform(sequence(1, size(w) - {n} + 1), "
            f"i -> named_struct('g', array_join(slice(w, i, {n}), ' '), "
            "'p', CAST(i - 1 AS BIGINT)))), "
            "named_struct('prev', CAST(NULL AS STRING), "
            "'ps', CAST(array() AS ARRAY<BIGINT>)), "
            "(a, x) -> named_struct('prev', x.g, "
            "'ps', IF(x.g <=> a.prev, array_append(a.ps, x.p), a.ps)), "
            "a -> a.ps)), "
            "named_struct('c', 0L, 'e', CAST(-1 AS BIGINT)), "
            "(a, p) -> named_struct("
            f"'c', a.c + IF(greatest(p, a.e + 1L) > {last}, 0L, "
            f"aggregate(sequence(greatest(p, a.e + 1L), {last}), 0L, "
            "(s, i) -> s + length(element_at(w, CAST(i + 1 AS INT))))), "
            f"'e', {last}), "
            "a -> a.c) "
            "ELSE CAST(NULL AS BIGINT) END"
        )

    out = base.select(
        id_col,
        "n_chars",
        "_dle",
        "_dlc",
        "_dpe",
        "_dpc",
        "_nl",
        "_np",
        *[top_gram_chars(n).alias(f"_t{n}") for n in (2, 3, 4)],
        *[dup_gram_chars(n).alias(f"_d{n}") for n in range(5, 11)],
    )

    def frac(num, den) -> F.Column:
        return F.when(
            den > 0, F.round(F.coalesce(num, F.lit(0)) / den, 6)
        ).otherwise(F.lit(0.0))

    nc = F.col("n_chars")
    metrics = {
        "dup_line_frac": frac(F.col("_dle"), F.col("_nl")),
        "dup_para_frac": frac(F.col("_dpe"), F.col("_np")),
        "dup_line_char_frac": frac(F.col("_dlc"), nc),
        "dup_para_char_frac": frac(F.col("_dpc"), nc),
        "top_2_gram_frac": frac(F.col("_t2"), nc),
        "top_3_gram_frac": frac(F.col("_t3"), nc),
        "top_4_gram_frac": frac(F.col("_t4"), nc),
        **{
            f"dup_{n}_gram_frac": frac(F.col(f"_d{n}"), nc)
            for n in range(5, 11)
        },
    }
    cols = [F.col(id_col), F.col("n_chars")]
    cols += [expr.alias(name) for name, expr in metrics.items()]
    result = out.select(*cols)
    gate = None
    for name, bound in REPETITION_THRESHOLDS.items():
        cond = F.col(name) <= bound
        gate = cond if gate is None else (gate & cond)
    return result.withColumn("passes_repetition", gate.cast("long"))


LM_TOKEN_RUN = "[a-z0-9]{2,}"


def lm_quality(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
    stratum_col: str | None = None,
) -> DataFrame:
    """(id, n_tokens, n_oov, mean_logprob) — language-model quality
    scoring in the CCNet mold (Wenzek et al. 2020 §4.3: documents are
    ranked by LM perplexity and the tail is dropped). The model here is
    trained ON THE CORPUS ITSELF in the same plan: a unigram LM with
    add-one smoothing over the vocabulary {words with count >= min_count},

        p(w ∈ vocab) = (c_w + 1) / (N + V + 1)
        p(w ∉ vocab) = 1         / (N + V + 1)

    where N is the total token count and V the vocabulary size. An OOV
    token scores the add-one floor — the probability of a count-zero
    type — NOT a pooled <unk> bucket: pooling would hand the combined
    mass of every rare word to each gibberish token, which at small
    corpus sizes scores nonsense ABOVE ordinary prose (the filter-style
    choice is deliberately harsh on gibberish). ``mean_logprob`` is the
    per-document mean ln p(token); a quality gate keeps documents above
    a floor (low perplexity == high mean_logprob == ordinary, fluent
    text; gibberish and boilerplate-symbol soup sink). This is the
    engine-portable stand-in for an external KenLM: the same monotone
    ranking signal, with every probability derived from exact integer
    counts so a DuckDB oracle replays it bit-for-bit.

    Float discipline (invariant 4): each vocab word's ln p is computed
    ONCE from integers cast to DOUBLE and rounded to 6; per-document
    accumulation is the integer-scaled fixed6 sum, so no aggregation
    order can flip a rounded value. A ``min_count`` threshold (not a
    top-V rank) defines the vocabulary — a map-side filter with no
    global sort, and by Heaps' law the vocab stays tiny relative to the
    corpus, so the per-token lookup joins against a BROADCAST table (at
    extreme vocab sizes swap the broadcast for a shuffle join — the
    semantics don't change). Documents with no tokens report
    0 / 0 / the OOV floor: a token-less document carries the same
    (absent) fluency evidence as all-OOV gibberish, so it scores
    ``unk_lp`` — strictly below every document containing a vocab word —
    and can never outrank prose or pass a gate floor that fluent text
    clears (0.0 here would be the MAXIMUM possible score).

    Scale note: ``toks`` feeds two independent lineages (the count/vocab
    pass and the scoring join), so each action re-tokenizes the corpus
    twice — at 100 TB materialize the token rows once to parquet between
    the passes, exactly like dsir_weights documents for its feature
    explode.

    ``stratum_col`` selects CCNet §4.3's actual shape: one INDEPENDENT
    LM per stratum (normally the predicted language), so minority-
    language documents are scored against their own token statistics
    instead of sinking under a pooled majority-language model. Every
    aggregate and lookup just gains the stratum as a key: counts on
    (stratum, word), a per-stratum (den, floor) table (bounded by the
    stratum count — broadcast), vocab lookups on (stratum, word). Rows
    with a NULL stratum — or in a stratum containing no tokens at all —
    cannot be scored under any model and report 0 / 0 / NULL. Default
    None = one pooled LM (identical to a single-stratum corpus).
    """
    if stratum_col is not None:
        return _lm_quality_by(df, id_col, text_col, min_count, stratum_col)
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '{LM_TOKEN_RUN}', 0)")
        ).alias("_w"),
    )
    counts = toks.groupBy("_w").agg(F.count(F.lit(1)).alias("_c"))
    vocab = counts.filter(F.col("_c") >= min_count)
    totals = counts.agg(F.coalesce(F.sum("_c"), F.lit(0)).alias("_n"))
    vstats = vocab.agg(F.count(F.lit(1)).alias("_v"))
    # one-row (denom, oov floor logprob) relation, broadcast everywhere
    stats = (
        totals.crossJoin(F.broadcast(vstats))
        .withColumn("_den", (F.col("_n") + F.col("_v") + 1).cast("double"))
        .select(
            "_den",
            F.round(F.log(F.lit(1.0) / F.col("_den")), 6).alias("_unk_lp"),
        )
    )
    lp_table = vocab.crossJoin(F.broadcast(stats)).select(
        "_w",
        F.round(F.log((F.col("_c") + 1).cast("double") / F.col("_den")), 6).alias(
            "_lp"
        ),
    )
    scored = (
        toks.join(F.broadcast(lp_table), "_w", "left")
        .crossJoin(F.broadcast(stats.select("_unk_lp")))
        .select(
            id_col,
            F.col("_lp").isNull().cast("long").alias("_oov"),
            F.coalesce("_lp", "_unk_lp").alias("_t_lp"),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("_oov").alias("n_oov"),
        F.round(
            F.sum(fixed6_long("_t_lp")) / F.lit(1000000.0) / F.count(F.lit(1)),
            6,
        ).alias("mean_logprob"),
    )
    return (
        df.select(id_col)
        .join(agg, id_col, "left")
        .crossJoin(F.broadcast(stats.select("_unk_lp")))
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("n_oov", F.lit(0)).cast("long").alias("n_oov"),
            F.coalesce("mean_logprob", "_unk_lp").alias("mean_logprob"),
        )
    )


def _lm_quality_by(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_count: int,
    stratum_col: str,
) -> DataFrame:
    """Per-stratum branch of :func:`lm_quality` — identical math with the
    stratum joined into every key, so each stratum trains and scores its
    own independent unigram LM (see lm_quality's docstring)."""
    s = stratum_col
    toks = df.select(
        F.col(id_col),
        F.col(s),
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '{LM_TOKEN_RUN}', 0)")
        ).alias("_w"),
    )
    counts = toks.groupBy(s, "_w").agg(F.count(F.lit(1)).alias("_c"))
    vocab = counts.filter(F.col("_c") >= min_count)
    totals = counts.groupBy(s).agg(F.sum("_c").alias("_n"))
    vstats = vocab.groupBy(s).agg(F.count(F.lit(1)).alias("_v"))
    # per-stratum (den, OOV floor) — one row per stratum, broadcast
    stats = (
        totals.join(vstats, s, "left")
        .withColumn(
            "_den",
            (F.col("_n") + F.coalesce(F.col("_v"), F.lit(0)) + 1).cast(
                "double"
            ),
        )
        .select(
            s,
            "_den",
            F.round(F.log(F.lit(1.0) / F.col("_den")), 6).alias("_unk_lp"),
        )
    )
    lp_table = vocab.join(F.broadcast(stats), s).select(
        s,
        "_w",
        F.round(F.log((F.col("_c") + 1).cast("double") / F.col("_den")), 6).alias(
            "_lp"
        ),
    )
    scored = (
        toks.join(F.broadcast(lp_table), [s, "_w"], "left")
        .join(F.broadcast(stats.select(s, "_unk_lp")), s)
        .select(
            id_col,
            F.col("_lp").isNull().cast("long").alias("_oov"),
            F.coalesce("_lp", "_unk_lp").alias("_t_lp"),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("_oov").alias("n_oov"),
        F.round(
            F.sum(fixed6_long("_t_lp")) / F.lit(1000000.0) / F.count(F.lit(1)),
            6,
        ).alias("mean_logprob"),
    )
    return (
        df.select(id_col, s)
        .join(agg, id_col, "left")
        .join(F.broadcast(stats.select(s, "_unk_lp")), s, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("n_oov", F.lit(0)).cast("long").alias("n_oov"),
            F.coalesce("mean_logprob", "_unk_lp").alias("mean_logprob"),
        )
    )


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_lines, dup_line_frac, top_bigram, top_bigram_frac).

    - ``dup_line_frac`` = (n_lines - n_distinct_lines) / n_lines, computed
      per-row with array functions (no shuffle);
    - ``top_bigram_frac`` = chars covered by the most frequent word 2-gram
      (count x bigram-chars-sans-space) / total word chars. The argmax tie
      breaks deterministically on (count DESC, bigram ASC).

    Documents with fewer than two words have no bigram and are omitted —
    mirrored exactly by the SQL twin's inner join.
    """
    lines = F.split(F.col(text_col), "\n")
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(lines).alias("n_lines"),
        F.round(
            (F.size(lines) - F.size(F.array_distinct(lines))) / F.size(lines), 6
        ).alias("dup_line_frac"),
        _words(text_col).alias("w"),
    ).withColumn(
        "word_chars",
        F.expr("aggregate(w, 0L, (acc, x) -> acc + length(x))"),
    )
    bigrams = base.select(
        "doc_id",
        "n_lines",
        "dup_line_frac",
        "word_chars",
        F.explode(
            F.expr(
                "CASE WHEN size(w) < 2 THEN array() "
                "ELSE transform(sequence(0, size(w) - 2), "
                "i -> concat(element_at(w, i + 1), ' ', element_at(w, i + 2))) END"
            )
        ).alias("bigram"),
    )
    counts = bigrams.groupBy(
        "doc_id", "n_lines", "dup_line_frac", "word_chars", "bigram"
    ).agg(F.count(F.lit(1)).alias("c"))
    rn = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.col("c").desc(), F.col("bigram").asc())
    )
    return (
        counts.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            "n_lines",
            "dup_line_frac",
            F.col("bigram").alias("top_bigram"),
            F.round(
                F.col("c") * (F.length("bigram") - 1) / F.col("word_chars"), 6
            ).alias("top_bigram_frac"),
        )
    )
