"""End-to-end corpus curation: the training-data pipeline composed.

Chains the individual operators in the order a 100 TB pretraining-data
run applies them, each stage narrowing the corpus before the next (cost
discipline: cheap exact filters first, candidate-bucketed near-dup last,
and the expensive stages only ever see survivors):

1. exact dedup — sha256 content hash, keep the min-id doc per hash
   (hash-partitioned, skew-free).
2. quality gate — native-Column heuristics (length band, alpha ratio,
   mean word length band); no UDFs.
3. language gate — marker-token language ID, keep an allow-list.
4. near-dup dedup — MinHash signatures -> banded LSH candidate pairs
   (ids only) -> large-star/small-star connected components -> keep each
   component's min-id representative.

Opt-in stages: the full Gopher rule set after stage 2 (``gopher=True``),
a CCNet-style corpus-LM quality gate after stage 3
(``lm_logprob_floor=...``), a PII-redaction transform at the end
(``redact_pii=True``) — see ``curation.py`` — plus, after stage 4:
SemDeDup semantic dedup over an embedding table (``embeddings=...`` +
``semantic_centroids=...``, ``similarity.py``) and the corpus-assembly
steps from ``mixing.py``: benchmark decontamination (``eval_docs=...``),
DSIR importance selection (``dsir_target=...``), per-domain caps
(``domain_cap=...``) and deterministic stratified sampling
(``mix_rates=...``).

Returns the kept corpus plus a per-stage audit (stage, rows_in,
rows_out, dropped) computed from the SAME lazily-built frames — one
count per stage boundary, no extra lineage. The audit is the "no silent
drops" requirement of curation runs: every removed document is
attributable to a stage.

Scale notes: stages 1-3 are narrow projections + one hash-partitioned
window; stage 4's shuffles are the banded-signature joins documented in
dedup.py — nothing here introduces a new shuffle shape. For 10^12 docs
run stages as separate checkpointed jobs (pipeline/checkpoints.py) so a
restart resumes at the last stage boundary.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import dedup as D
from .curation import (
    bloom_dedup,
    c4_rules,
    dedup_lines,
    dedup_spans,
    gopher_quality,
    gopher_repetition,
    lm_quality,
    pii_stats,
    url_blocklist_filter,
)
from .mixing import (
    decontaminate,
    domain_top_k,
    dsir_weights,
    stratified_sample,
)
from .similarity import semantic_dedup
from .textstats import language_id

DEFAULT_MIN_CHARS = 80
DEFAULT_MAX_CHARS = 200_000
DEFAULT_MIN_ALPHA_RATIO = 0.55
DEFAULT_MEAN_WORD_LEN = (2.0, 14.0)


@dataclass
class CurationReport:
    stages: list  # (stage, rows_in, rows_out)

    def dropped(self) -> dict:
        return {s: rin - rout for s, rin, rout in self.stages}

    def total_in(self) -> int:
        return self.stages[0][1] if self.stages else 0

    def total_out(self) -> int:
        return self.stages[-1][2] if self.stages else 0


def quality_gate(
    docs: DataFrame,
    text_col: str = "text",
    min_chars: int = DEFAULT_MIN_CHARS,
    max_chars: int = DEFAULT_MAX_CHARS,
    min_alpha_ratio: float = DEFAULT_MIN_ALPHA_RATIO,
    mean_word_len: tuple = DEFAULT_MEAN_WORD_LEN,
) -> DataFrame:
    """Heuristic quality filter, all native Columns (one scan, no shuffle):
    char-length band, alphabetic-character ratio, mean word length band —
    the standard cheap pretraining-data gates (C4/Gopher-style)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    words = F.split(F.trim(t), r"\s+")
    n_words = F.when(F.length(F.trim(t)) == 0, 0).otherwise(F.size(words))
    mean_wl = F.when(n_words > 0, n_chars.cast("double") / n_words).otherwise(0.0)
    lo, hi = mean_word_len
    return docs.filter(
        (n_chars >= min_chars)
        & (n_chars <= max_chars)
        & (n_alpha.cast("double") >= min_alpha_ratio * n_chars.cast("double"))
        & (mean_wl >= lo)
        & (mean_wl <= hi)
    )


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    languages: tuple = ("en",),
    num_perm: int = 9,
    rows_per_band: int = 3,
    quality_kwargs: dict | None = None,
    gopher: bool = False,
    gopher_repetition_gate: bool = False,
    redact_pii: bool = False,
    line_dedup: bool = False,
    bloom_m: int | None = None,
    bloom_k: int = 4,
    c4: bool = False,
    span_dedup_n: int | None = None,
    eval_docs: DataFrame | None = None,
    decontam_n: int = 13,
    domain_cap: int | None = None,
    domain_col: str = "source",
    mix_rates: dict | None = None,
    stratum_col: str = "lang",
    mix_seed: str = "mix",
    mix_default_rate: float = 0.0,
    lm_logprob_floor: float | None = None,
    lm_min_count: int = 5,
    dsir_target: DataFrame | None = None,
    dsir_floor: float = 0.0,
    dsir_bucket_hex_chars: int = 3,
    embeddings: DataFrame | None = None,
    semantic_centroids=None,
    semantic_threshold: float = 0.995,
    vec_col: str = "embedding",
    url_blocklist: DataFrame | None = None,
    url_col: str = "url",
) -> tuple[DataFrame, CurationReport]:
    """documents -> (kept documents, per-stage audit).

    Counts run one action per stage boundary; the kept frame stays lazy
    for the caller to write/cache.

    ``gopher=True`` inserts the full Gopher rule set (curation.py,
    Rae et al. 2021 A1.1) after the cheap quality gate — still one scan,
    native Columns. ``gopher_repetition_gate=True`` adds the A1.2
    repetition thresholds right after (dup line/paragraph fractions,
    top-n-gram and dup-n-gram character coverage). ``redact_pii=True`` appends a PII-redaction transform
    to the kept text (row-preserving; audited with rows_in == rows_out so
    the "every drop is attributable" invariant stays intact).

    ``line_dedup=True`` inserts the C4 global line dedup right after
    exact dedup (the C4 order: span-level cleanup before the per-doc
    gates): each repeated line survives only at its corpus-wide first
    occurrence, texts are rewritten in place, and a doc stripped of every
    line reassembles to '' — which the quality gate then drops, keeping
    the drop attributable to a stage. ``c4=True`` adds the rest of C4
    §2.2 as stage 1c (after line dedup): terminal-punctuation /
    3-word / no-javascript line filtering with in-place rewrite, plus
    the page drops (< 5 retained sentences, 'lorem ipsum', curly
    bracket). ``span_dedup_n`` adds ExactSubstr span dedup as stage 3c
    — after the line-structure gates, before near-dup (the RefinedWeb
    order, and required: its token rejoin flattens line structure):
    every n-token window seen earlier in the corpus is stripped from
    the later occurrence (first occurrence = min (doc, position)),
    overlaps removed once.

    ``url_blocklist`` (a one-column ``domain`` frame) prepends the
    UT1-style domain gate as stage 0 — a document whose ``url_col`` host
    sits on or under a listed domain is dropped before anything else
    runs (the cheapest filter goes first).

    ``embeddings`` (with ``semantic_centroids``) inserts SemDeDup right
    after near-dup: documents whose embeddings form a within-cluster
    cosine-duplicate group keep only the min-id representative; documents
    with no embedding row pass through untouched.

    ``lm_logprob_floor`` inserts the CCNet-style LM quality gate right
    after the language gate: documents are scored by their mean
    log-likelihood under the corpus-trained unigram LM (curation.py
    ``lm_quality``, vocabulary threshold ``lm_min_count``) and those
    below the floor drop.

    Corpus-assembly stages (mixing.py), each opt-in, run after semantic
    dedup in pipeline order decontaminate -> dsir_select -> domain_cap
    -> mix_sample:

    - ``eval_docs``: drop documents sharing any ``decontam_n``-word-gram
      with the benchmark frame (its n-gram set is broadcast);
    - ``dsir_target``: keep documents whose DSIR hashed-n-gram importance
      weight against the target frame is >= ``dsir_floor``;
    - ``domain_cap``: keep at most that many docs per ``domain_col``
      (ranked by text length desc, id asc — the cheap quality proxy),
      computed with the skew-safe two-phase top-k;
    - ``mix_rates``: per-``stratum_col`` deterministic Bernoulli sampling
      (md5 hex-prefix threshold, reproducible across runs). A stratum
      absent from the dict samples at ``mix_default_rate`` — the default
      0.0 DROPS unlisted strata; pass 1.0 to keep them untouched.

    ``domain_col`` / ``stratum_col`` are looked up on the INPUT frame and
    re-joined by id at their stage, so the core dedup/gate stages stay
    two-column no matter which extras the caller's schema carries.
    """
    stages: list = []

    # Each stage's input IS the previous stage's checkpointed output, so
    # its row count is already known — thread it through instead of
    # re-counting (halves the audit's job count: one action per stage
    # boundary, literally). Only the first gate counts its input frame.
    prev_out_count: list = [None]

    def gate(name: str, before: DataFrame, after: DataFrame) -> DataFrame:
        rin = (
            prev_out_count[0]
            if prev_out_count[0] is not None
            else before.count()
        )
        out = after.localCheckpoint(eager=True)
        rout = out.count()
        stages.append((name, rin, rout))
        prev_out_count[0] = rout
        return out

    base = docs.select(id_col, text_col)

    # 0. optional URL blocklist (UT1/RefinedWeb order: the cheapest gate
    # runs first, before any content hashing). Looks ``url_col`` up on
    # the INPUT frame like the other re-joined extras.
    if url_blocklist is not None:
        flags = url_blocklist_filter(
            docs.select(id_col, url_col), url_blocklist,
            url_col=url_col, id_col=id_col,
        )
        ok_ids = flags.filter(F.col("blocked") == 0).select(id_col)
        base = gate("url_blocklist", base, base.join(ok_ids, id_col, "inner"))

    # 1. exact dedup: keep min id per content hash
    w = Window.partitionBy("_sha").orderBy(F.asc(id_col))
    exact = (
        base.withColumn("_sha", F.sha2(F.col(text_col), 256))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_sha", "_rn")
    )
    exact = gate("exact_dedup", base, exact)

    # 1b. optional C4 global line dedup: transform — rows pass through
    # (a fully-stripped doc becomes '' and falls to the quality gate)
    if line_dedup:
        rewritten = dedup_lines(exact, id_col=id_col, text_col=text_col).select(
            id_col, text_col
        )
        exact = gate("line_dedup", exact, rewritten)

    # 1b2. optional BFF-style Bloom paragraph dedup (Dolma, Soldaini et
    # al. 2024): a paragraph whose k bloom bits were all set by earlier
    # paragraphs is removed (exact repeats always, plus the filter's
    # documented false-positive rate at the chosen m). Kept paragraphs
    # re-join on newlines, so line structure survives for the line-based
    # gates downstream (unlike span_dedup, which therefore runs LAST).
    if bloom_m is not None:
        rewritten = bloom_dedup(
            exact, m_bits=bloom_m, k=bloom_k, id_col=id_col,
            text_col=text_col,
        ).select(id_col, text_col)
        exact = gate("bloom_dedup", exact, rewritten)

    # 1c. optional C4 line/page rules (Raffel et al. 2020 §2.2): lines
    # not ending in terminal punctuation / under 3 words / mentioning
    # javascript are stripped (texts rewritten in place), and pages with
    # < 5 retained sentences, 'lorem ipsum' or a curly bracket drop —
    # both the transform and the drop attributed to one stage.
    if c4:
        # same no-CSE-in-Filter-predicates guard as the Gopher gates: the
        # Filter on `passes` and the Project of `cleaned` would otherwise
        # each inline their own copy of the per-line processing
        r = (
            c4_rules(exact, id_col=id_col, text_col=text_col)
            .select(id_col, "cleaned", "passes")
            .localCheckpoint(eager=False)
        )
        rewritten = r.filter(F.col("passes") == 1).select(
            F.col(id_col), F.col("cleaned").alias(text_col)
        )
        exact = gate("c4_rules", exact, rewritten)

    # 2. quality gate
    q = quality_gate(exact, text_col=text_col, **(quality_kwargs or {}))
    q = gate("quality", exact, q)

    # 2b. optional Gopher rule set (word count / mean word length / symbol
    # ratio / bullet + ellipsis lines / alpha words / required stopwords).
    # Same flags-through-a-Project guard as the repetition gate below:
    # filtering directly on `passes` would inline every rule into one
    # Filter conjunction, and Filter predicates get no common-
    # subexpression elimination, so the shared word split would be
    # re-derived per rule.
    if gopher:
        g_flags = (
            gopher_quality(q, text_col=text_col)
            .select(id_col, "passes")
            .localCheckpoint(eager=False)
        )
        ok = g_flags.filter(F.col("passes") == 1).select(id_col)
        q = gate("gopher", q, q.join(ok, id_col, "inner"))

    # 2c. optional Gopher repetition rule set (A1.2: dup line/paragraph
    # fractions, top-n-gram and dup-n-gram char coverage) — drop documents
    # failing any repetition threshold. The A1.2 metrics are the
    # pipeline's heaviest map-side compute (per-row array sorts + folds
    # over nine n-gram streams), so two structural guards keep them off
    # Spark's slow paths (r04 VERDICT task 3 — this stage alone was 75%
    # of the composed pipeline's wall):
    #
    # (a) Filter predicates get NO common-subexpression elimination, so
    #     filtering directly on passes_repetition inlines the 13 metric
    #     expressions into one conjunction and re-derives the shared
    #     word/line/paragraph splits per conjunct (~5x the CPU, at any
    #     scale). Materializing the (id, flag) frame first routes the
    #     metrics through a Project — which DOES eliminate shared
    #     subtrees — and the filter then reads a computed column.
    # (b) Byte-sized partitioning undersizes CPU-bound stages: AQE
    #     rightly coalesces a few MB of text to one partition, but this
    #     stage's cost is per-row compute, not bytes. Fan the flag
    #     computation out to the session's parallelism when the input
    #     arrives narrower; at real scale inputs already exceed core
    #     count and the guard is a no-op.
    if gopher_repetition_gate:
        rep_in = q
        target = q.sparkSession.sparkContext.defaultParallelism
        if q.rdd.getNumPartitions() < target:
            rep_in = q.repartition(target, id_col)
        flags = (
            gopher_repetition(rep_in, id_col=id_col, text_col=text_col)
            .select(id_col, "passes_repetition")
            .localCheckpoint(eager=False)
        )
        ok = flags.filter(F.col("passes_repetition") == 1).select(id_col)
        q = gate("gopher_repetition", q, q.join(ok, id_col, "inner"))

    # 3. language gate
    lang = language_id(q, text_col=text_col).filter(
        F.col("pred_lang").isin(list(languages))
    ).select(id_col, text_col)
    lang = gate("language", q, lang)

    # 3b. optional CCNet-style LM quality gate, run after language ID as
    # in CCNet: keep documents whose mean log-likelihood under the
    # corpus-trained unigram LM clears the floor. The LM is trained on
    # THIS stage's input — the survivors of dedup + heuristic gates — so
    # boilerplate removed earlier never pollutes the model. With multiple
    # `languages` this is CCNet §4.3 proper: pred_lang is re-derived
    # per-row (map-side, no shuffle) and each language bucket is scored
    # under its OWN LM, so minority languages don't sink under pooled
    # majority-language counts and one floor is fair across languages.
    if lm_logprob_floor is not None:
        lm_input, stratum = lang, None
        if len(languages) > 1:
            lm_input = language_id(lang, text_col=text_col).select(
                id_col, text_col, "pred_lang"
            )
            stratum = "pred_lang"
        scored = lm_quality(
            lm_input,
            id_col=id_col,
            text_col=text_col,
            min_count=lm_min_count,
            stratum_col=stratum,
        )
        ok = scored.filter(
            F.col("mean_logprob") >= lm_logprob_floor
        ).select(id_col)
        lang = gate("lm_quality", lang, lang.join(ok, id_col, "inner"))

    # 3c. optional ExactSubstr span dedup (Lee et al. 2021): any
    # span_dedup_n-token window whose content appeared earlier in the
    # corpus is removed from the later occurrence; texts are rewritten
    # in place (transform — rows pass through; a fully-stripped doc
    # reassembles to ''). Runs AFTER every line/paragraph-structure gate
    # (quality, Gopher A1.1/A1.2, C4 §2.2) — the RefinedWeb order
    # (heuristic filtering first, dedup second) — because token-window
    # removal rejoins text with single spaces, which would blind those
    # gates' line-based metrics if it ran earlier.
    if span_dedup_n is not None:
        rewritten = dedup_spans(
            lang, n=span_dedup_n, id_col=id_col, text_col=text_col
        ).select(id_col, text_col)
        lang = gate("span_dedup", lang, rewritten)

    # 4. near-dup: LSH pairs -> components -> keep component min
    shingled = D.shingles(
        lang.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    )
    sig = D.minhash_signatures(shingled, num_perm=num_perm)
    pairs = D.lsh_candidate_pairs(sig, rows_per_band=rows_per_band)
    comps = D.connected_components(
        pairs, nodes=lang.select(F.col(id_col).alias("doc_id")), id_col="doc_id"
    )
    keep_ids = comps.filter(F.col("doc_id") == F.col("component")).select(
        F.col("doc_id").alias(id_col)
    )
    kept = lang.join(keep_ids, id_col, "inner")
    kept = gate("near_dup", lang, kept)

    # 4b. optional semantic dedup (SemDeDup): drop non-representative
    # members of embedding-cosine duplicate groups. Documents WITHOUT an
    # embedding row pass through untouched (they cannot be semantically
    # compared), so the stage is a left-anti join against the removed set
    # — every drop stays attributable.
    if embeddings is not None:
        if semantic_centroids is None:
            raise ValueError(
                "curate_corpus: embeddings given without semantic_centroids "
                "(pass train_ivf_centroids output or a (cent_id, cvec) frame)"
            )
        emb = kept.select(id_col).join(
            embeddings.select(F.col(id_col), F.col(vec_col)), id_col, "inner"
        )
        decisions = semantic_dedup(
            emb,
            semantic_centroids,
            threshold=semantic_threshold,
            id_col=id_col,
            vec_col=vec_col,
        )
        removed = decisions.filter(F.col("keep") == 0).select(id_col)
        kept = gate("semantic_dedup", kept, kept.join(removed, id_col, "left_anti"))

    # 4c. optional benchmark decontamination: drop any doc sharing an
    # n-gram with the eval frame (flags computed over survivors only)
    if eval_docs is not None:
        flags = decontaminate(
            kept,
            eval_docs.select(F.col(id_col), F.col(text_col)),
            n=decontam_n,
            id_col=id_col,
            text_col=text_col,
        )
        clean_ids = flags.filter(F.col("contaminated") == 0).select(id_col)
        kept = gate("decontaminate", kept, kept.join(clean_ids, id_col, "inner"))

    # 4c2. optional DSIR importance selection: keep documents whose
    # hashed-n-gram importance weight vs ``dsir_target`` clears the
    # floor (0.0 = "more target-like than raw-like" under the smoothed
    # bucket models). Runs on survivors so the raw distribution matches
    # what selection actually chooses from.
    if dsir_target is not None:
        weighted = dsir_weights(
            kept,
            dsir_target.select(F.col(id_col), F.col(text_col)),
            id_col=id_col,
            text_col=text_col,
            bucket_hex_chars=dsir_bucket_hex_chars,
        )
        ok = weighted.filter(F.col("log_weight") >= dsir_floor).select(id_col)
        kept = gate("dsir_select", kept, kept.join(ok, id_col, "inner"))

    # 4d. optional per-domain cap: re-join the domain column by id, rank
    # by text length (quality proxy) with the skew-safe two-phase top-k
    if domain_cap is not None:
        with_dom = kept.join(docs.select(id_col, domain_col), id_col, "inner")
        capped = (
            domain_top_k(
                with_dom.withColumn("_len", F.length(text_col)),
                domain_cap,
                domain_col=domain_col,
                order_col="_len",
                id_col=id_col,
            )
            .select(id_col, text_col)
        )
        kept = gate("domain_cap", kept, capped)

    # 4e. optional mixing-rate sampling: deterministic per-stratum keep
    if mix_rates is not None:
        with_stratum = kept.join(docs.select(id_col, stratum_col), id_col, "inner")
        sampled = stratified_sample(
            with_stratum,
            mix_rates,
            stratum_col=stratum_col,
            key_col=id_col,
            seed=mix_seed,
            default_rate=mix_default_rate,
        ).select(id_col, text_col)
        kept = gate("mix_sample", kept, sampled)

    # 5. optional PII scrub: transform, not filter — rows pass through
    # unchanged in count, text is replaced by its redacted form
    if redact_pii:
        red = pii_stats(kept, text_col=text_col).select(
            id_col, F.col("redacted").alias(text_col)
        )
        kept = gate("pii_redact", kept, red)

    return kept, CurationReport(stages=stages)
