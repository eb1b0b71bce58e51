"""Unit tests for the curation operators (PII redaction, Gopher quality
gates, repetition stats) on hand-built fixtures with known answers.

The (Spark, DuckDB) pair parity of the same operators over the synthetic
corpus is covered by test_driver_queries / test_pair_invariants; these
tests pin the *semantics* — exact counts, redacted strings, gate
decisions — on documents where the right answer is computed by hand.
"""

import pytest
from pyspark.sql import functions as F

from search_engine_spark.training_data import curation as C


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------
def test_pii_counts_and_redaction(spark):
    rows = [
        (1, "write to alice.smith+tag@example.co.uk or bob@test.org today"),
        (2, "call 555-867-5309 or 555-000-1234 now"),
        (3, "server 192.168.0.1 and 10.0.255.77 are up"),
        (4, "mixed: a@b.io, 555-123-4567, 8.8.8.8"),
        (5, "clean text with no pii at all"),
    ]
    out = {
        r["doc_id"]: r
        for r in C.pii_stats(_df(spark, rows)).collect()
    }
    assert (out[1]["n_emails"], out[1]["n_phones"], out[1]["n_ipv4"]) == (2, 0, 0)
    assert (out[2]["n_emails"], out[2]["n_phones"], out[2]["n_ipv4"]) == (0, 2, 0)
    assert (out[3]["n_emails"], out[3]["n_phones"], out[3]["n_ipv4"]) == (0, 0, 2)
    assert (out[4]["n_emails"], out[4]["n_phones"], out[4]["n_ipv4"]) == (1, 1, 1)
    assert (out[5]["n_emails"], out[5]["n_phones"], out[5]["n_ipv4"]) == (0, 0, 0)

    assert out[1]["redacted"] == "write to <EMAIL> or <EMAIL> today"
    assert out[2]["redacted"] == "call <PHONE> or <PHONE> now"
    assert out[3]["redacted"] == "server <IP> and <IP> are up"
    assert out[4]["redacted"] == "mixed: <EMAIL>, <PHONE>, <IP>"
    assert out[5]["redacted"] == rows[4][1]


def test_pii_phone_not_counted_as_ip(spark):
    out = C.pii_stats(_df(spark, [(1, "dial 555-123-4567")])).collect()[0]
    assert out["n_phones"] == 1
    assert out["n_ipv4"] == 0


# ---------------------------------------------------------------------------
# Gopher quality gates
# ---------------------------------------------------------------------------
def _gopher_row(spark, text):
    return C.gopher_quality(_df(spark, [(1, text)])).collect()[0]


def test_gopher_passing_document(spark):
    # 60 plain words incl. >= 2 required stopwords, no symbols/bullets.
    text = "the quick brown fox jumps over and over the lazy dog " * 6
    r = _gopher_row(spark, text.strip())
    assert r["n_words"] == 66
    assert r["n_stop_kinds"] == 2  # 'the' and 'and' of the required set
    assert r["passes"] == 1


def test_gopher_stopword_kinds_exact(spark):
    r = _gopher_row(spark, "the cat sat with that mat to be of and have fun")
    # the, with, that, to, be, of, and, have -> all 8 present
    assert r["n_stop_kinds"] == 8


def test_gopher_word_count_gate(spark):
    r = _gopher_row(spark, "too short to pass the and gate")
    assert r["n_words"] == 7
    assert r["passes"] == 0


def test_gopher_bullet_and_ellipsis_line_fractions(spark):
    text = "- bullet one\nplain line here\nanother plain\ntrailing thought..."
    r = _gopher_row(spark, text)
    assert r["frac_bullet_lines"] == 0.25
    assert r["frac_ellipsis_lines"] == 0.25


def test_gopher_symbol_ratio(spark):
    r = _gopher_row(spark, "alpha beta # gamma ... delta")
    # 2 symbols (one '#', one '...') over 6 whitespace tokens
    assert r["n_words"] == 6
    assert r["symbol_ratio"] == pytest.approx(2 / 6, abs=1e-6)


def test_gopher_alpha_word_fraction(spark):
    r = _gopher_row(spark, "one 1 two 2 three 3 four 4")
    assert r["frac_alpha_words"] == 0.5


def test_gopher_mean_word_length(spark):
    r = _gopher_row(spark, "aa bbbb")
    assert r["mean_word_len"] == 3.0


# ---------------------------------------------------------------------------
# Repetition stats
# ---------------------------------------------------------------------------
def test_repetition_duplicate_lines(spark):
    text = "same line\nsame line\nsame line\nunique one"
    r = C.repetition_stats(_df(spark, [(1, text)])).collect()[0]
    # 4 lines, 2 distinct -> 2/4 duplicated
    assert r["n_lines"] == 4
    assert r["dup_line_frac"] == 0.5


def test_repetition_top_bigram(spark):
    text = "red blue red blue red green"
    r = C.repetition_stats(_df(spark, [(1, text)])).collect()[0]
    # bigrams: red blue, blue red, red blue, blue red, red green ->
    # tie between 'red blue' (2) and 'blue red' (2); ASC tie-break
    assert r["top_bigram"] == "blue red"
    # covered chars = 2 * len('bluered') = 14; word chars = 3+4+3+4+3+5 = 22
    assert r["top_bigram_frac"] == pytest.approx(14 / 22, abs=1e-6)


def test_repetition_single_word_doc_omitted(spark):
    out = C.repetition_stats(
        _df(spark, [(1, "loneword"), (2, "two words")])
    ).collect()
    assert sorted(r["doc_id"] for r in out) == [2]


def test_repetition_no_duplicate_lines_is_zero(spark):
    r = C.repetition_stats(_df(spark, [(1, "a b\nc d")])).collect()[0]
    assert r["dup_line_frac"] == 0.0


# ---------------------------------------------------------------------------
# dedup_lines (C4-style global line dedup)
# ---------------------------------------------------------------------------
def _dl(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r["doc_id"]: (r["n_lines_kept"], r["text"])
        for r in C.dedup_lines(df, **kw).collect()
    }


def test_dedup_lines_cross_doc_first_occurrence_wins(spark):
    out = _dl(
        spark,
        [
            (1, "alpha\nshared boilerplate\nbeta"),
            (2, "shared boilerplate\ngamma"),
        ],
    )
    assert out[1] == (3, "alpha\nshared boilerplate\nbeta")
    assert out[2] == (1, "gamma")


def test_dedup_lines_within_doc_second_copy_removed(spark):
    out = _dl(spark, [(1, "x\nrepeat me\ny\nrepeat me\nz")])
    assert out[1] == (4, "x\nrepeat me\ny\nz")


def test_dedup_lines_total_loss_preserves_row_as_empty(spark):
    out = _dl(spark, [(1, "same text"), (2, "same text")])
    assert out[1] == (1, "same text")
    assert out[2] == (0, "")


def test_dedup_lines_short_lines_never_dedup(spark):
    # empty lines (default min_line_len=1) survive everywhere
    out = _dl(spark, [(1, "a\n\nb"), (2, "c\n\nd")])
    assert out[1] == (3, "a\n\nb")
    assert out[2] == (3, "c\n\nd")
    # raising the bar exempts short lines from dedup too
    out = _dl(spark, [(1, "hi\nlong shared line"), (2, "hi\nlong shared line")], min_line_len=3)
    assert out[1] == (2, "hi\nlong shared line")
    assert out[2] == (1, "hi")


def test_dedup_lines_plan_has_no_window_over_line_key(spark):
    """Invariant 6: the hot line key must be handled by partial-agg
    groupBy + unique-composite-key join, never a window sort."""
    import contextlib
    import io

    df = spark.createDataFrame([(1, "a\nb")], "doc_id long, text string")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        C.dedup_lines(df).explain("formatted")
    plan = buf.getvalue()
    assert "Window" not in plan, plan
    assert "partial_min" in plan or "HashAggregate" in plan


# ---------------------------------------------------------------------------
# url_blocklist_filter
# ---------------------------------------------------------------------------
def test_url_blocklist_suffix_chain(spark):
    from search_engine_spark.training_data.curation import url_blocklist_filter

    docs = spark.createDataFrame(
        [
            (1, "https://ads.tracker.example.com/x"),   # subdomain of entry
            (2, "https://tracker.example.com/y?q=1"),   # exact entry
            (3, "https://TRACKER.example.com:8080/z"),  # case + port
            (4, "https://example.com/clean"),           # parent of entry: NOT blocked
            (5, "https://nottracker.example.com/a"),    # no label boundary match
            (6, None),                                  # NULL url: never blocked
        ],
        "doc_id long, url string",
    )
    bl = spark.createDataFrame([("tracker.example.com",)], "domain string")
    out = {r["doc_id"]: (r["host"], r["blocked"])
           for r in url_blocklist_filter(docs, bl).collect()}
    assert out[1] == ("ads.tracker.example.com", 1)
    assert out[2] == ("tracker.example.com", 1)
    assert out[3] == ("tracker.example.com", 1)
    assert out[4] == ("example.com", 0)
    assert out[5] == ("nottracker.example.com", 0)
    assert out[6] == (None, 0)
    assert len(out) == 6


def test_curate_corpus_url_blocklist_stage(spark):
    from search_engine_spark.training_data.pipeline import curate_corpus

    good = (
        "the quick brown fox jumps over the lazy dog and then runs away "
        "into the green forest where many other animals live quietly"
    )
    other = (
        "completely different english text about distributed systems "
        "and data processing with spark engines running large scale "
        "jobs every day for many users around the world"
    )
    docs = spark.createDataFrame(
        [
            (1, good, "https://site.example.com/a"),
            (2, other, "https://bad.spam.example.com/b"),
        ],
        "doc_id long, text string, url string",
    )
    bl = spark.createDataFrame([("spam.example.com",)], "domain string")
    kept, report = curate_corpus(docs, url_blocklist=bl)
    assert {r["doc_id"] for r in kept.collect()} == {1}
    by_stage = {s: (rin, rout) for s, rin, rout in report.stages}
    assert by_stage["url_blocklist"] == (2, 1)
    assert report.stages[0][0] == "url_blocklist"  # runs first


# ---------------------------------------------------------------------------
# lm_quality (corpus-LM quality scoring)
# ---------------------------------------------------------------------------
def test_lm_common_words_outscore_rare_words(spark):
    # "the cat" repeats 10x (high-count vocab); the junk doc is all
    # singletons (sub-min_count -> <unk>), whose smoothed probability is
    # shared mass -> lower per-token logprob than the common words
    rows = [(i, "the cat sat here") for i in range(10)]
    rows.append((99, "qq7 zz9 xx1 vv3"))
    df = _df(spark, rows)
    out = {r["doc_id"]: r for r in C.lm_quality(df, min_count=5).collect()}
    assert out[0]["mean_logprob"] > out[99]["mean_logprob"]
    assert out[0]["n_oov"] == 0
    assert out[99]["n_oov"] == 4  # every junk token is sub-threshold


def test_lm_exact_unigram_probabilities(spark):
    import math

    # corpus: "aa aa aa bb" -> counts {aa:3, bb:1}; min_count=2 -> vocab
    # {aa}, V=1, N=4; p(aa)=(3+1)/(4+1+1), OOV floor p=1/6
    df = _df(spark, [(1, "aa aa aa bb")])
    row = C.lm_quality(df, min_count=2).collect()[0]
    lp_aa = round(math.log(4 / 6), 6)
    lp_unk = round(math.log(1 / 6), 6)
    want = round((3 * round(lp_aa, 6) + lp_unk) / 4, 6)
    assert row["n_tokens"] == 4 and row["n_oov"] == 1
    assert abs(row["mean_logprob"] - want) < 1e-9


def test_lm_empty_doc_scores_the_oov_floor(spark):
    import math

    # a token-less document (empty text OR pure symbol soup with no
    # [a-z0-9]{2,} run) must score the OOV floor — NOT 0.0, which would
    # be the maximum possible score and would sail through any gate.
    # corpus: 5x "the" -> vocab {the}, N=5, V=1, floor = ln(1/7)
    df = _df(spark, [(1, "the the the the the"), (2, ""), (3, "!!! ?? .")])
    out = {r["doc_id"]: r for r in C.lm_quality(df).collect()}
    floor = round(math.log(1 / 7), 6)
    for d in (2, 3):
        assert (out[d]["n_tokens"], out[d]["n_oov"]) == (0, 0)
        assert abs(out[d]["mean_logprob"] - floor) < 1e-9
    # fluent doc strictly outranks the token-less ones
    assert out[1]["mean_logprob"] > out[2]["mean_logprob"]


def test_lm_per_stratum_models_are_independent(spark):
    import math

    # stratum A replays the pooled exact-probability fixture; stratum B
    # holds one "aa" doc whose count (1) is below min_count IN B, so it
    # must score B's own OOV floor ln(1/2) — NOT A's vocab probability
    # for "aa" (a pooled model would lend it A's counts).
    df = spark.createDataFrame(
        [(1, "A", "aa aa aa bb"), (2, "B", "aa")],
        "doc_id long, lang string, text string",
    )
    out = {
        r["doc_id"]: r
        for r in C.lm_quality(df, min_count=2, stratum_col="lang").collect()
    }
    lp_aa = round(math.log(4 / 6), 6)
    lp_unk_a = round(math.log(1 / 6), 6)
    want_a = round((3 * lp_aa + lp_unk_a) / 4, 6)
    assert abs(out[1]["mean_logprob"] - want_a) < 1e-9
    assert out[1]["n_oov"] == 1
    # B: N=1, V=0 -> den=2; its single token is OOV under its own LM
    assert abs(out[2]["mean_logprob"] - round(math.log(1 / 2), 6)) < 1e-9
    assert out[2]["n_oov"] == 1


def test_lm_stratum_scores_minority_language_fairly(spark):
    # 9:1 en/de mix: under the pooled LM the fluent German doc sinks
    # (its tokens are rare in the pooled counts); under per-stratum
    # scoring it is judged against German counts alone and scores higher
    rows = [(i, "en", "the cat runs fast today") for i in range(9)]
    rows += [(100 + j, "de", "der hund läuft schnell heute") for j in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    pooled = {
        r["doc_id"]: r["mean_logprob"]
        for r in C.lm_quality(df, min_count=2).collect()
    }
    strat = {
        r["doc_id"]: r["mean_logprob"]
        for r in C.lm_quality(df, min_count=2, stratum_col="lang").collect()
    }
    assert strat[100] > pooled[100]
    # and the per-stratum gap between en and de is smaller than pooled's
    assert abs(strat[0] - strat[100]) < abs(pooled[0] - pooled[100])


def test_lm_stratum_null_and_tokenless_rows(spark):
    df = spark.createDataFrame(
        [(1, "en", "the the the the the"), (2, "en", ""), (3, None, "the")],
        "doc_id long, lang string, text string",
    )
    out = {
        r["doc_id"]: r
        for r in C.lm_quality(df, stratum_col="lang").collect()
    }
    # token-less doc in a modeled stratum: the stratum's own OOV floor
    import math

    floor_en = round(math.log(1 / 7), 6)
    assert (out[2]["n_tokens"], out[2]["n_oov"]) == (0, 0)
    assert abs(out[2]["mean_logprob"] - floor_en) < 1e-9
    # NULL stratum: no model exists -> NULL score
    assert (out[3]["n_tokens"], out[3]["n_oov"]) == (0, 0)
    assert out[3]["mean_logprob"] is None


def test_lm_partitioning_invariant(spark):
    rows = [(i, f"the quick fox number{i % 7} runs") for i in range(60)]
    a = sorted(
        (r["doc_id"], r["mean_logprob"])
        for r in C.lm_quality(_df(spark, rows).repartition(7)).collect()
    )
    b = sorted(
        (r["doc_id"], r["mean_logprob"])
        for r in C.lm_quality(_df(spark, rows).coalesce(1)).collect()
    )
    assert a == b


# ---------------------------------------------------------------------------
# gopher_repetition (full A1.2 rule set)
# ---------------------------------------------------------------------------
def test_repetition_suite_dup_lines_and_chars(spark):
    # lines [aa bb, aa bb, cc]: 1/3 dup lines; dup chars 5 of 14 text chars
    df = _df(spark, [(1, "aa bb\naa bb\ncc")])
    row = C.gopher_repetition(df).collect()[0]
    assert row["dup_line_frac"] == round(1 / 3, 6)
    assert row["dup_line_char_frac"] == round(5 / 14, 6)
    assert row["dup_para_frac"] == 0.0


def test_repetition_suite_dup_paragraphs(spark):
    df = _df(spark, [(1, "p q\n\np q\n\nr s")])
    row = C.gopher_repetition(df).collect()[0]
    assert row["dup_para_frac"] == round(1 / 3, 6)
    assert row["dup_para_char_frac"] == round(3 / 13, 6)


def test_repetition_suite_top_ngram_char_coverage(spark):
    # "x y" appears 4x, gram length 3 (spaces included), text length 15
    df = _df(spark, [(1, "x y x y x y x y")])
    row = C.gopher_repetition(df).collect()[0]
    assert row["top_2_gram_frac"] == round(4 * 3 / 15, 6)


def test_repetition_suite_dup_ngram_position_union(spark):
    # repeated 6-gram: the second occurrence covers word positions 6..11
    # (6 single-char words) of the 23-char text; overlapping duplicated
    # 5-grams inside it must not double-count characters
    df = _df(spark, [(1, "a b c d e f a b c d e f")])
    row = C.gopher_repetition(df).collect()[0]
    assert row["dup_6_gram_frac"] == round(6 / 23, 6)
    assert row["dup_5_gram_frac"] == round(6 / 23, 6)
    assert row["dup_7_gram_frac"] == 0.0


def test_repetition_suite_gate_and_empty_doc(spark):
    clean = " ".join(f"w{i}" for i in range(60))
    df = _df(spark, [(1, clean), (2, ""), (3, "z z z z z z z z z z")])
    out = {r["doc_id"]: r for r in C.gopher_repetition(df).collect()}
    assert out[1]["passes_repetition"] == 1
    assert out[2]["passes_repetition"] == 1 and out[2]["n_chars"] == 0
    assert out[3]["passes_repetition"] == 0  # hot n-grams blow thresholds


def test_curate_corpus_gopher_repetition_stage(spark):
    from search_engine_spark.training_data.pipeline import curate_corpus

    clean = (
        "the big data cluster runs heavy jobs with many workers and every "
        "task finishes before the deadline because the scheduler balances "
        "load across racks while operators watch dashboards and the team "
        "rotates oncall duty each week without much trouble at all"
    )
    # passes A1.1-style gates but repeats one sentence: dup n-grams blow up
    loop = ("the pipeline retries the stage and then " * 12) + "it stops"
    docs = spark.createDataFrame(
        [(1, clean), (2, loop)], "doc_id long, text string"
    )
    kept, report = curate_corpus(docs, gopher_repetition_gate=True)
    assert {r["doc_id"] for r in kept.collect()} == {1}
    by_stage = {s: (rin, rout) for s, rin, rout in report.stages}
    assert by_stage["gopher_repetition"] == (2, 1)


# ---------------------------------------------------------------------------
# c4_rules (Raffel et al. 2020 §2.2 line/page cleaning)
# ---------------------------------------------------------------------------
def test_c4_line_rules(spark):
    text = "\n".join(
        [
            "this line ends with a period.",     # kept
            "does this line end with a mark",    # dropped: no terminal punct
            "short one.",                        # dropped: < 3 words
            "we enable javascript on this page.",  # dropped: javascript
            'he said "stop right there."',       # kept (ends in .)
            "is this a real question?",          # kept
            'ok "',                              # dropped: < 3 words (the quote token counts)
            'the answer was a quoted "yes"',     # kept (ends in ")
        ]
    )
    df = _df(spark, [(1, text)])
    row = C.c4_rules(df).collect()[0]
    assert row["n_lines"] == 8
    assert row["n_lines_kept"] == 4
    assert row["cleaned"].splitlines() == [
        "this line ends with a period.",
        'he said "stop right there."',
        "is this a real question?",
        'the answer was a quoted "yes"',
    ]
    # sentences = terminal marks in the retained text: 1 + 3 + 1 + 2
    assert row["n_sentences"] == 7
    assert (row["has_lorem"], row["has_brace"]) == (0, 0)
    assert row["passes"] == 1


def test_c4_page_rules(spark):
    five = "\n".join(f"sentence number {i} stands here." for i in range(5))
    four = "\n".join(f"sentence number {i} stands here." for i in range(4))
    df = _df(
        spark,
        [
            (1, five),                                  # passes
            (2, four),                                  # < 5 sentences
            (3, five + "\nsee the lorem ipsum block."),  # lorem ipsum
            (4, five + "\nuses a { brace } here."),      # curly bracket
            (5, None),                                   # NULL text ~ ''
        ],
    )
    out = {r["doc_id"]: r for r in C.c4_rules(df).collect()}
    assert [out[i]["passes"] for i in (1, 2, 3, 4, 5)] == [1, 0, 0, 0, 0]
    assert out[3]["has_lorem"] == 1 and out[4]["has_brace"] == 1
    assert out[5]["n_lines_kept"] == 0 and out[5]["cleaned"] == ""


def test_c4_partitioning_invariant(spark):
    rows = [
        (i, f"line number {i % 7} is here.\nno mark on this one\nok fine.")
        for i in range(40)
    ]
    a = sorted(map(tuple, C.c4_rules(_df(spark, rows).repartition(5)).collect()))
    b = sorted(map(tuple, C.c4_rules(_df(spark, rows).coalesce(1)).collect()))
    assert a == b


def test_curate_corpus_c4_stage(spark):
    from search_engine_spark.training_data.pipeline import curate_corpus

    good = "\n".join(
        f"the data pipeline finished stage number {i} on time today."
        for i in range(6)
    )
    good2 = "\n".join(
        f"the review board approved request number {i} for the team there."
        for i in range(6)
    )
    noisy = good2 + "\nclick here to enable javascript now."
    braces = good + "\nconfig block { retries: 3 } follows."
    docs = spark.createDataFrame(
        [(1, good), (2, noisy), (3, braces)], "doc_id long, text string"
    )
    kept, report = curate_corpus(docs, c4=True)
    kept_rows = {r["doc_id"]: r["text"] for r in kept.collect()}
    # doc 2 survives with the javascript line stripped; doc 3 drops (brace)
    assert set(kept_rows) == {1, 2}
    assert kept_rows[2] == good2
    by_stage = {s: (rin, rout) for s, rin, rout in report.stages}
    assert by_stage["c4_rules"] == (3, 2)


# ---------------------------------------------------------------------------
# dedup_spans (ExactSubstr-style token-window span dedup)
# ---------------------------------------------------------------------------
def _ds(spark, rows, n):
    return {
        r["doc_id"]: (r["n_tokens"], r["n_tokens_removed"], r["text"])
        for r in C.dedup_spans(_df(spark, rows), n=n).collect()
    }


def test_dedup_spans_cross_doc_first_occurrence_wins(spark):
    out = _ds(
        spark,
        [(1, "a b c d x"), (2, "p q a b c d y")],
        n=4,
    )
    # doc 1 owns the first (min (doc, pos)) occurrence of 'a b c d'
    assert out[1] == (5, 0, "a b c d x")
    assert out[2] == (7, 4, "p q y")


def test_dedup_spans_within_doc_overlap_union(spark):
    # 'x y z w' * 3: every window from pos 4 on duplicates an earlier
    # one; their ranges overlap and must be removed ONCE (positions
    # 4..11), leaving exactly the first period
    out = _ds(spark, [(1, "x y z w x y z w x y z w")], n=4)
    assert out[1] == (12, 8, "x y z w")


def test_dedup_spans_short_docs_untouched(spark):
    out = _ds(
        spark,
        [(1, "just three words"), (2, ""), (3, "\t \n "), (4, "\n padded \t")],
        n=4,
    )
    assert out[1] == (3, 0, "just three words")
    # whitespace-only and whitespace-padded docs: no phantom empty tokens
    assert out[2] == (0, 0, "")
    assert out[3] == (0, 0, "")
    assert out[4] == (1, 0, "padded")


def test_dedup_spans_partitioning_invariant(spark):
    rows = [(i, f"alpha beta gamma delta epsilon zeta tail{i % 3}") for i in range(30)]
    a = sorted(map(tuple, C.dedup_spans(_df(spark, rows).repartition(7), n=5).collect()))
    b = sorted(map(tuple, C.dedup_spans(_df(spark, rows).coalesce(1), n=5).collect()))
    assert a == b


def test_dedup_spans_plan_has_no_window_over_hash_key(spark):
    """Invariant 6: the hot window-hash key must be handled by
    partial-agg groupBy + unique-composite-key anti join, never a
    window sort over the hash."""
    import contextlib
    import io

    df = _df(spark, [(1, "a b c d e")])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        C.dedup_spans(df, n=3).explain("formatted")
    plan = buf.getvalue()
    assert "Window" not in plan, plan


def test_curate_corpus_span_dedup_stage(spark):
    from search_engine_spark.training_data.pipeline import curate_corpus

    boiler = "all rights reserved contact the webmaster for further details"
    a = "the first article body has plenty of original words here " + boiler
    b = "a second article that keeps the most distinct opening text " + boiler
    docs = spark.createDataFrame(
        [(1, a), (2, b)], "doc_id long, text string"
    )
    # the boilerplate run is 9 tokens; n=9 makes it exactly one window
    kept, report = curate_corpus(
        docs, span_dedup_n=9, quality_kwargs={"min_chars": 20}
    )
    rows = {r["doc_id"]: r["text"] for r in kept.collect()}
    assert set(rows) == {1, 2}
    assert boiler in rows[1]
    assert boiler not in rows[2]
    by_stage = {s: (rin, rout) for s, rin, rout in report.stages}
    assert by_stage["span_dedup"] == (2, 2)  # transform: rows pass through


# ---------------------------------------------------------------------------
# Bloom-filter paragraph dedup (BFF)
# ---------------------------------------------------------------------------
def _bloom_sim(rows, m, k, seed="bff"):
    """Sequential reference: a real Bloom filter streamed in (doc, idx)
    order — test k salted-md5 bits, drop iff all set, add the kept
    paragraph's bits. The operator's batch formulation must match this
    EXACTLY, including false positives."""
    import hashlib

    bits, out = set(), {}
    for doc_id, text in sorted(rows):
        paras = [p.strip(" \t\r") for p in (text or "").split("\n")]
        paras = [p for p in paras if p]
        kept, ndup = [], 0
        for p in paras:
            pos = [
                int(
                    hashlib.md5(f"{seed}:{s}:{p}".encode()).hexdigest()[:8],
                    16,
                )
                % m
                for s in range(k)
            ]
            if all(q in bits for q in pos):
                ndup += 1
            else:
                kept.append(p)
                bits.update(pos)
        out[doc_id] = (len(paras), ndup, "\n".join(kept))
    return out


def _bd(spark, rows, **kw):
    return {
        r["doc_id"]: (r["n_paras"], r["n_dup_paras"], r["text"])
        for r in C.bloom_dedup(_df(spark, rows), **kw).collect()
    }


def test_bloom_dedup_exact_duplicates_first_occurrence_wins(spark):
    rows = [
        (1, "unique opening paragraph\nshared boilerplate footer"),
        (2, "shared boilerplate footer\nanother original body"),
        (3, "shared boilerplate footer"),
    ]
    # m large enough that no false positive is possible on 4 paragraphs
    out = _bd(spark, rows, m_bits=1 << 20, k=4)
    assert out[1] == (2, 0, "unique opening paragraph\nshared boilerplate footer")
    assert out[2] == (2, 1, "another original body")
    assert out[3] == (1, 1, "")


def test_bloom_dedup_within_doc_repeat(spark):
    out = _bd(spark, [(1, "same line\nsame line\nsame line")], m_bits=1 << 20, k=4)
    assert out[1] == (3, 2, "same line")


def test_bloom_dedup_empty_and_whitespace_docs(spark):
    out = _bd(
        spark,
        [(1, ""), (2, "\n\n  \n\t"), (3, "  padded para  ")],
        m_bits=1 << 20,
        k=4,
    )
    assert out[1] == (0, 0, "")
    assert out[2] == (0, 0, "")
    assert out[3] == (1, 0, "padded para")


def test_bloom_dedup_matches_sequential_filter_with_false_positives(spark):
    # m=64/k=2 over ~60 distinct paragraphs saturates the filter, so this
    # fixture exercises the false-positive path; the batch min-setter
    # formulation must still match the streamed filter bit-for-bit.
    rows = [
        (
            i,
            "\n".join(
                f"para {(i * 7 + j * 3) % 40} body text" for j in range(3)
            ),
        )
        for i in range(25)
    ]
    m, k = 64, 2
    expected = _bloom_sim(rows, m, k)
    got = _bd(spark, rows, m_bits=m, k=k)
    assert got == expected
    # sanity: the fixture actually triggered at least one false positive
    # (a drop whose paragraph text appears nowhere earlier verbatim)
    seen, fp = set(), 0
    for doc_id, text in sorted(rows):
        paras = [p.strip() for p in text.split("\n") if p.strip()]
        kept = got[doc_id][2].split("\n") if got[doc_id][2] else []
        for p in paras:
            if p not in kept and p not in seen:
                fp += 1
            seen.add(p)
    assert fp > 0, "fixture no longer exercises the false-positive path"


def test_bloom_dedup_partitioning_invariant(spark):
    rows = [
        (i, f"alpha {i % 5}\nbeta {i % 3}\ngamma {i}") for i in range(30)
    ]
    a = sorted(
        map(tuple, C.bloom_dedup(_df(spark, rows).repartition(7), m_bits=1 << 16).collect())
    )
    b = sorted(
        map(tuple, C.bloom_dedup(_df(spark, rows).coalesce(1), m_bits=1 << 16).collect())
    )
    assert a == b


def test_bloom_dedup_plan_no_window_over_bit_key(spark):
    """Invariant 6: the hot bit key is groupBy(bit).min(struct) with
    map-side partials — never a window sort over the bit."""
    import contextlib
    import io

    df = _df(spark, [(1, "a\nb")])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        C.bloom_dedup(df, m_bits=1 << 10).explain("formatted")
    plan = buf.getvalue()
    assert "Window" not in plan, plan


def test_curate_corpus_bloom_stage(spark):
    from search_engine_spark.training_data.pipeline import curate_corpus

    body = (
        "the quick brown fox jumps over the lazy dog near the river bank "
        "while the sun sets slowly behind the tall green hills today"
    )
    boiler = "subscribe to our newsletter for all the latest updates"
    rows = [
        (1, body + "\n" + boiler),
        (2, body.replace("quick", "clever") + "\n" + boiler),
        (3, body.replace("quick", "sneaky") + "\n" + boiler),
    ]
    kept, report = curate_corpus(
        _df(spark, rows), languages=("en",), bloom_m=1 << 20
    )
    audit = {s: (rin, rout) for s, rin, rout in report.stages}
    assert audit["bloom_dedup"] == (3, 3)  # transform stage: rows pass
    texts = {r["doc_id"]: r["text"] for r in kept.collect()}
    assert boiler in texts[1]
    assert all(boiler not in texts[d] for d in (2, 3) if d in texts)
