"""Unit tests for the training-data mixing operators (mixing.py):
benchmark decontamination, deterministic stratified sampling, skew-safe
per-domain caps. The (Spark, DuckDB) pair parity of the three driver
pairs is covered by test_driver_queries' parametrization; these tests
pin the operator semantics on hand fixtures."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from search_engine_spark.training_data import mixing as M


# ---------------------------------------------------------------------------
# decontaminate
# ---------------------------------------------------------------------------
def test_decontaminate_flags_ngram_overlap(spark):
    docs = spark.createDataFrame(
        [
            (1, "x b c d e f y"),          # shares the 5-gram "b c d e f"
            (2, "p q r s t u v w"),        # disjoint
            (3, "too few"),                # shorter than n: never contaminated
            (4, "b c d e f z b c d e f"),  # duplicate gram counts once
        ],
        "doc_id long, text string",
    )
    eval_docs = spark.createDataFrame(
        [(100, "a b c d e f")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: (r["n_hits"], r["contaminated"])
        for r in M.decontaminate(docs, eval_docs, n=5).collect()
    }
    assert out == {1: (1, 1), 2: (0, 0), 3: (0, 0), 4: (1, 1)}


def test_decontaminate_counts_distinct_eval_grams(spark):
    # doc shares two distinct eval 4-grams -> n_hits == 2
    docs = spark.createDataFrame(
        [(1, "a b c d e")], "doc_id long, text string"
    )
    eval_docs = spark.createDataFrame(
        [(9, "a b c d"), (10, "b c d e")], "doc_id long, text string"
    )
    row = M.decontaminate(docs, eval_docs, n=4).collect()[0]
    assert (row["n_hits"], row["contaminated"]) == (2, 1)


def test_word_ngrams_short_doc_empty(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    assert M.word_ngrams(df, 3).count() == 0


# ---------------------------------------------------------------------------
# stratified_sample
# ---------------------------------------------------------------------------
def test_hex_threshold_exact_values():
    assert M.hex_threshold(0.5) == "80000000"
    assert M.hex_threshold(0.25) == "40000000"
    assert M.hex_threshold(0.125) == "20000000"
    assert M.hex_threshold(1.0) == "g"
    assert M.hex_threshold(0.0) == "00000000"


@pytest.fixture(scope="module")
def strata(spark):
    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(500)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_stratified_sample_partitioning_invariant(spark, strata):
    rates = {"en": 0.5, "de": 0.25}
    a = sorted(
        r["doc_id"]
        for r in M.stratified_sample(strata.repartition(7), rates).collect()
    )
    b = sorted(
        r["doc_id"]
        for r in M.stratified_sample(strata.coalesce(1), rates).collect()
    )
    assert a == b and len(a) > 0


def test_stratified_sample_rate_edges(spark, strata):
    kept = M.stratified_sample(strata, {"en": 1.0, "de": 0.0}).collect()
    assert all(r["lang"] == "en" for r in kept)
    assert len(kept) == 250  # every en row, no de row


def test_stratified_sample_empirical_rate(spark, strata):
    kept = M.stratified_sample(strata, {"en": 0.5, "de": 0.5}).count()
    # 500 Bernoulli(0.5) trials: 5 sigma ~ 56
    assert 194 <= kept <= 306


def test_stratified_sample_unlisted_stratum_uses_default(spark):
    df = spark.createDataFrame([(i, "xx") for i in range(100)], "doc_id long, lang string")
    assert M.stratified_sample(df, {"en": 1.0}).count() == 0
    assert M.stratified_sample(df, {"en": 0.0}, default_rate=1.0).count() == 100


def test_stratified_sample_no_shuffle(spark, strata):
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        M.stratified_sample(strata, {"en": 0.5, "de": 0.5}).explain("formatted")
    assert "Exchange" not in buf.getvalue()


# ---------------------------------------------------------------------------
# domain_top_k
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def skewed_domains(spark):
    # one Zipf-hot domain (400 rows), several small ones, plus score ties
    rows = [(i, "hot", (i * 7) % 50) for i in range(400)]
    rows += [(1000 + i, f"cold{i % 5}", i % 10) for i in range(50)]
    return spark.createDataFrame(rows, "doc_id long, source string, n_chars long")


def test_domain_top_k_matches_naive_window(spark, skewed_domains):
    got = sorted(
        (r["source"], r["rank"], r["doc_id"], r["n_chars"])
        for r in M.domain_top_k(skewed_domains, 3).collect()
    )
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    naive = sorted(
        (r["source"], r["rank"], r["doc_id"], r["n_chars"])
        for r in skewed_domains.withColumn(
            "rank", F.row_number().over(w).cast("long")
        )
        .filter(F.col("rank") <= 3)
        .collect()
    )
    assert got == naive


def test_domain_top_k_rank_is_dense_from_one(spark, skewed_domains):
    out = M.domain_top_k(skewed_domains, 2).collect()
    by_domain = {}
    for r in out:
        by_domain.setdefault(r["source"], []).append(r["rank"])
    for ranks in by_domain.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_domain_top_k_small_domain_keeps_all(spark):
    df = spark.createDataFrame(
        [(1, "only", 10), (2, "only", 20)], "doc_id long, source string, n_chars long"
    )
    out = {(r["doc_id"], r["rank"]) for r in M.domain_top_k(df, 5).collect()}
    assert out == {(2, 1), (1, 2)}


def test_hex_threshold_near_one_stays_eight_chars():
    # rates infinitesimally below 1.0 must not overflow to a 9-char
    # threshold ('100000000' lexicographically drops u8s starting 1-f)
    t = M.hex_threshold(0.9999999999)
    assert len(t) == 8 and t == "ffffffff"


def test_stratified_sample_null_key_dropped(spark):
    df = spark.createDataFrame(
        [(1, "en"), (None, "en"), (3, "en")], "doc_id long, lang string"
    )
    kept = {r["doc_id"] for r in M.stratified_sample(df, {"en": 1.0}).collect()}
    assert kept == {1, 3}  # NULL key hashes to NULL u8 -> dropped, as in SQL


# ---------------------------------------------------------------------------
# quota_sample
# ---------------------------------------------------------------------------
def test_quota_sample_exact_counts(spark, strata):
    out = M.quota_sample(strata, 7).collect()
    by = {}
    for r in out:
        by.setdefault(r["lang"], []).append(r["rank"])
    assert set(by) == {"en", "de"}
    for ranks in by.values():
        assert sorted(ranks) == list(range(1, 8))


def test_quota_sample_small_stratum_keeps_all(spark):
    df = spark.createDataFrame(
        [(1, "xx"), (2, "xx"), (3, "yy")], "doc_id long, lang string"
    )
    out = M.quota_sample(df, 10).collect()
    assert {(r["lang"], r["rank"]) for r in out} == {
        ("xx", 1), ("xx", 2), ("yy", 1)
    }


def test_quota_sample_partitioning_invariant(spark, strata):
    a = sorted(r["doc_id"] for r in M.quota_sample(strata.repartition(9), 5).collect())
    b = sorted(r["doc_id"] for r in M.quota_sample(strata.coalesce(1), 5).collect())
    assert a == b and len(a) == 10


def test_quota_sample_consistent_with_stratified_sample_hashes(spark, strata):
    # same seed -> same u8 per key in both samplers
    q = {r["doc_id"]: r["u8"] for r in M.quota_sample(strata, 250, seed="s1").collect()}
    s = {r["doc_id"]: r["u8"] for r in M.stratified_sample(strata, {"en": 1.0, "de": 1.0}, seed="s1").collect()}
    assert all(s[k] == v for k, v in q.items())


# ---------------------------------------------------------------------------
# pack_sequences
# ---------------------------------------------------------------------------
import hashlib


def _naive_pack(rows, seq_len, seed="pack"):
    """Single-threaded oracle: sort by (md5, id), running cumsum."""
    order = sorted(rows, key=lambda r: (hashlib.md5(f"{seed}:{r[0]}".encode()).hexdigest(), r[0]))
    out, prev = {}, 0
    for doc_id, n in order:
        out[doc_id] = (n, prev // seq_len, prev % seq_len)
        prev += n
    return out


@pytest.fixture()
def token_rows():
    return [(i, (i * 37) % 900 + 1) for i in range(400)] + [(1000, 0)]


def test_pack_sequences_matches_naive_prefix_sum(spark, token_rows):
    df = spark.createDataFrame(token_rows, "doc_id long, n_tokens long")
    got = {
        r["doc_id"]: (r["n_tokens"], r["chunk_id"], r["chunk_offset"])
        for r in M.pack_sequences(df, 512).collect()
    }
    assert got == _naive_pack(token_rows, 512)


def test_pack_sequences_partitioning_invariant(spark, token_rows):
    df = spark.createDataFrame(token_rows, "doc_id long, n_tokens long")
    a = sorted(map(tuple, M.pack_sequences(df.repartition(13), 256).collect()))
    b = sorted(map(tuple, M.pack_sequences(df.coalesce(1), 256).collect()))
    assert a == b


def test_pack_sequences_offsets_in_range_and_null_handling(spark):
    df = spark.createDataFrame(
        [(1, 100), (2, None), (None, 50), (3, 700)],
        "doc_id long, n_tokens long",
    )
    out = {r["doc_id"]: r for r in M.pack_sequences(df, 512).collect()}
    # NULL id dropped; NULL tokens packed as 0
    assert set(out) == {1, 2, 3}
    assert out[2]["n_tokens"] == 0
    for r in out.values():
        assert 0 <= r["chunk_offset"] < 512
        assert r["chunk_id"] >= 0
    # total stream length = sum of tokens: the last doc's start + its
    # tokens spans exactly ceil(total/512) chunks
    total = 100 + 0 + 700
    last = max(out.values(), key=lambda r: r["chunk_id"] * 512 + r["chunk_offset"])
    assert last["chunk_id"] * 512 + last["chunk_offset"] + last["n_tokens"] == total


# ---------------------------------------------------------------------------
# mix_report
# ---------------------------------------------------------------------------
def test_mix_report_counts_and_shares(spark):
    df = spark.createDataFrame(
        [
            ("en", "web", 100), ("en", "web", 300), ("en", "news", 100),
            ("de", "web", 500),
        ],
        "lang string, source string, n_tokens long",
    )
    out = {
        (r["lang"], r["source"]): (r["n_docs"], r["n_tokens"], r["token_share"])
        for r in M.mix_report(df).collect()
    }
    assert out == {
        ("en", "web"): (2, 400, 0.4),
        ("en", "news"): (1, 100, 0.1),
        ("de", "web"): (1, 500, 0.5),
    }
    assert abs(sum(v[2] for v in out.values()) - 1.0) < 1e-9


def test_pack_sequences_plan_has_no_global_window_over_input(spark):
    # the scale claim: the corpus-wide running sum must NOT be one
    # unpartitioned window over the whole input. The full-input window
    # partitions by the hash-prefix bucket; the only SinglePartition
    # exchange feeds the 256-row bucket-totals window, and the offsets
    # come back via broadcast.
    df = spark.createDataFrame(
        [(i, i % 7 + 1) for i in range(100)], "doc_id long, n_tokens long"
    )
    plan = (
        M.pack_sequences(df, 64)._jdf.queryExecution().executedPlan().toString()
    )
    cum_windows = [
        ln for ln in plan.splitlines()
        if "Window" in ln and "unboundedpreceding" in ln and "currentrow" in ln
    ]
    assert cum_windows and all("windowspecdefinition(_b" in ln for ln in cum_windows)
    assert plan.count("Exchange SinglePartition") == 1
    assert "BroadcastExchange" in plan


def test_pack_sequences_rejects_nonpositive_seq_len(spark):
    df = spark.createDataFrame([(1, 10)], "doc_id long, n_tokens long")
    with pytest.raises(ValueError, match="seq_len"):
        M.pack_sequences(df, 0)


def test_pack_sequences_bucket_width_invariant(spark, token_rows):
    # any hash-prefix width yields the identical packing (the bucket is
    # always a prefix of the global ordering key)
    df = spark.createDataFrame(token_rows, "doc_id long, n_tokens long")
    a = sorted(map(tuple, M.pack_sequences(df, 128, bucket_hex_chars=1).collect()))
    b = sorted(map(tuple, M.pack_sequences(df, 128, bucket_hex_chars=3).collect()))
    assert a == b
    with pytest.raises(ValueError, match="bucket_hex_chars"):
        M.pack_sequences(df, 128, bucket_hex_chars=0)


# ---------------------------------------------------------------------------
# temperature_sample
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def skewed_strata(spark):
    # en is 4x the size of de: at alpha=0.5 de keeps everything and en
    # keeps at rate sqrt(1/4) = 0.5 exactly (dyadic -> exact threshold)
    rows = [(i, "en") for i in range(400)] + [(1000 + i, "de") for i in range(100)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_temperature_sample_min_stratum_keeps_all(spark, skewed_strata):
    kept = M.temperature_sample(skewed_strata, alpha=0.5).collect()
    de = [r for r in kept if r["lang"] == "de"]
    assert len(de) == 100  # rate 1 for the smallest stratum, exactly


def test_temperature_sample_rate_is_sqrt_of_count_ratio(spark, skewed_strata):
    kept = M.temperature_sample(skewed_strata, alpha=0.5).collect()
    en = [r for r in kept if r["lang"] == "en"]
    # 400 Bernoulli(0.5) trials: 5 sigma ~ 50
    assert 150 <= len(en) <= 250


def test_temperature_sample_alpha_one_keeps_everything(spark, skewed_strata):
    assert M.temperature_sample(skewed_strata, alpha=1.0).count() == 500


def test_temperature_sample_partitioning_invariant(spark, skewed_strata):
    a = sorted(
        r["doc_id"]
        for r in M.temperature_sample(skewed_strata.repartition(7)).collect()
    )
    b = sorted(
        r["doc_id"]
        for r in M.temperature_sample(skewed_strata.coalesce(1)).collect()
    )
    assert a == b and len(a) > 0


def test_temperature_sample_hashes_consistent_with_stratified(spark, skewed_strata):
    # same seed -> the kept set is exactly the stratified_sample(0.5) set
    # for the en stratum (u8i < 2^31 <=> u8 < '80000000')
    temp = {
        r["doc_id"]
        for r in M.temperature_sample(skewed_strata, alpha=0.5).collect()
        if r["lang"] == "en"
    }
    strat = {
        r["doc_id"]
        for r in M.stratified_sample(
            skewed_strata, {"en": 0.5, "de": 0.0}
        ).collect()
    }
    assert temp == strat


def test_temperature_sample_null_stratum_dropped(spark):
    df = spark.createDataFrame(
        [(1, "en"), (2, None), (3, "en")], "doc_id long, lang string"
    )
    kept = M.temperature_sample(df).collect()
    assert all(r["lang"] == "en" for r in kept)


def test_temperature_sample_null_stratum_excluded_from_counts(spark):
    # a tiny NULL group must not become c_min and crush the real strata's
    # keep rates: with NULLs present the kept set must equal the kept set
    # of the NULL-free corpus (en is then the single/minimum stratum ->
    # rate 1 -> ALL en rows kept)
    base = [(i, "en") for i in range(50)]
    with_null = base + [(1000 + i, None) for i in range(3)]
    df_clean = spark.createDataFrame(base, "doc_id long, lang string")
    df_null = spark.createDataFrame(with_null, "doc_id long, lang string")
    kept_clean = sorted(r["doc_id"] for r in M.temperature_sample(df_clean).collect())
    kept_null = sorted(r["doc_id"] for r in M.temperature_sample(df_null).collect())
    assert kept_clean == [i for i, _ in base]  # rate 1 keeps every row
    assert kept_null == kept_clean


# ---------------------------------------------------------------------------
# hash_split
# ---------------------------------------------------------------------------
def test_hash_split_exhaustive_and_deterministic(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r["doc_id"]: r["split"] for r in M.hash_split(df, fr).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in M.hash_split(df.repartition(7), fr).collect()
    }
    assert a == b
    assert set(a.values()) <= {"train", "val", "test"}
    assert len(a) == 500
    # 500 trials at 0.8: 5 sigma ~ 45
    n_train = sum(1 for v in a.values() if v == "train")
    assert 355 <= n_train <= 445


def test_hash_split_fractions_must_sum_to_one(spark):
    df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError, match="sum to 1"):
        M.hash_split(df, {"train": 0.5, "val": 0.1})
    with pytest.raises(ValueError, match="non-empty"):
        M.hash_split(df, {})


def test_hash_split_null_key_gets_null_split(spark):
    df = spark.createDataFrame(
        [(1,), (None,)], "doc_id long"
    )
    out = {r["doc_id"]: r["split"] for r in M.hash_split(
        df, {"train": 0.5, "test": 0.5}
    ).collect()}
    assert out[None] is None and out[1] in {"train", "test"}


def test_hash_split_no_shuffle(spark):
    import contextlib
    import io

    df = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        M.hash_split(df, {"train": 0.9, "val": 0.1}).explain("formatted")
    assert "Exchange" not in buf.getvalue()


# ---------------------------------------------------------------------------
# dsir_weights
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def dsir_corpus(spark):
    # target-like docs share the "clean prose" vocabulary; junk docs don't
    rows = []
    for i in range(40):
        rows.append((i, "the quick brown fox jumps over the lazy dog again"))
    for i in range(40, 80):
        rows.append((i, "zz9 qq8 xx7 vv6 kk5 jj4 hh3 gg2 ff1 dd0"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dsir_target_like_docs_score_higher(spark, dsir_corpus):
    target = dsir_corpus.filter(F.col("doc_id") < 20)  # prose-only target
    # 256 buckets: at this toy corpus size the default 4096-bucket
    # smoothing mass (B >> CT) would push every weight negative — the
    # RANKING still holds, but the sign check needs B ~ feature count
    out = {r["doc_id"]: r["log_weight"] for r in M.dsir_weights(
        dsir_corpus, target, bucket_hex_chars=2
    ).collect()}
    assert out[0] > out[50], "doc resembling the target must outscore junk"
    assert out[0] > 0 > out[50]


def test_dsir_feature_count_is_unigrams_plus_bigrams(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, ""), (3, "solo")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["n_feats"] for r in M.dsir_weights(df, df).collect()}
    assert out == {1: 5, 2: 0, 3: 1}  # 3 unigrams + 2 bigrams; none; 1


def test_dsir_empty_doc_scores_zero(spark, dsir_corpus):
    df = dsir_corpus.union(
        spark.createDataFrame([(999, "")], "doc_id long, text string")
    )
    row = [
        r for r in M.dsir_weights(df, df.filter(F.col("doc_id") < 20)).collect()
        if r["doc_id"] == 999
    ][0]
    assert (row["n_feats"], row["log_weight"]) == (0, 0.0)


def test_dsir_partitioning_invariant(spark, dsir_corpus):
    target = dsir_corpus.filter(F.col("doc_id") < 20)
    a = sorted(
        (r["doc_id"], r["log_weight"])
        for r in M.dsir_weights(dsir_corpus.repartition(7), target).collect()
    )
    b = sorted(
        (r["doc_id"], r["log_weight"])
        for r in M.dsir_weights(dsir_corpus.coalesce(1), target).collect()
    )
    assert a == b


def test_dsir_rejects_bad_bucket_width(spark, dsir_corpus):
    with pytest.raises(ValueError, match="bucket_hex_chars"):
        M.dsir_weights(dsir_corpus, dsir_corpus, bucket_hex_chars=0)


# ---------------------------------------------------------------------------
# Efraimidis-Spirakis weighted sampling
# ---------------------------------------------------------------------------
def _es_sim(rows, k, seed="es"):
    """Python replay: key = round(ln(u)/w, 6), u from the first 52 md5
    bits, top-k by (key desc, id asc)."""
    import hashlib
    import math

    scored = []
    for doc_id, w in rows:
        if doc_id is None or w is None or w <= 0:
            continue
        u_int = int(
            hashlib.md5(f"{seed}:{doc_id}".encode()).hexdigest()[:13], 16
        )
        scored.append(
            (round(math.log((u_int + 1) / 2.0**52) / w, 6), doc_id, w)
        )
    scored.sort(key=lambda t: (-t[0], t[1]))
    return [
        (doc_id, w, key, i + 1)
        for i, (key, doc_id, w) in enumerate(scored[:k])
    ]


def test_weighted_sample_matches_simulator(spark):
    rows = [(i, (i * 37) % 91 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = [
        (r["doc_id"], r["weight"], r["es_key"], r["rank"])
        for r in M.weighted_sample(df, k=20, weight_col="w")
        .orderBy("rank")
        .collect()
    ]
    exp = _es_sim(rows, 20)
    assert [(g[0], g[1], g[3]) for g in got] == [(e[0], e[1], e[3]) for e in exp]
    for g, e in zip(got, exp):
        assert abs(g[2] - e[2]) < 2e-6  # one ln ulp across libms at most


def test_weighted_sample_excludes_bad_rows_and_bounds_k(spark):
    rows = [(1, 10), (2, 0), (3, -5), (4, None), (None, 7), (5, 3)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = M.weighted_sample(df, k=10, weight_col="w").collect()
    assert {r["doc_id"] for r in got} == {1, 5}
    assert sorted(r["rank"] for r in got) == [1, 2]


def test_weighted_sample_weight_bias(spark):
    # one doc carries 10^9 x the weight of 999 others: u^(1/w) ~ 1 for the
    # heavy doc, so it must appear in a tiny sample (p_miss < 1e-6)
    rows = [(0, 10**9)] + [(i, 1) for i in range(1, 1000)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = {r["doc_id"] for r in M.weighted_sample(df, k=5, weight_col="w").collect()}
    assert 0 in got


def test_weighted_sample_partition_invariant(spark):
    rows = [(i, i % 13 + 1) for i in range(150)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    a = [tuple(r) for r in M.weighted_sample(df.repartition(9), 15, "w").orderBy("rank").collect()]
    b = [tuple(r) for r in M.weighted_sample(df.coalesce(1), 15, "w").orderBy("rank").collect()]
    assert a == b
