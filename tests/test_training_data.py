"""Unit tests for the training-data pipeline operators (dedup, similarity,
text analysis) against hand-computed and NumPy oracles."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from search_engine_spark.training_data import (
    dedup,
    similarity,
    textstats,
)


@pytest.fixture(scope="module")
def tiny_docs(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),  # exact dup of 1
        (3, "alpha beta gamma delta epsilon eta"),  # near dup (1 word off)
        (4, "one two three four five six seven eight"),
        (5, "totally different words entirely here now"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shingles_word_kgram(spark):
    df = spark.createDataFrame([(1, "a1 b2 c3 d4")], "doc_id long, text string")
    got = {r["shingle"] for r in dedup.shingles(df, k=3).collect()}
    assert got == {"a1 b2 c3", "b2 c3 d4"}


def test_shingles_short_doc_empty(spark):
    df = spark.createDataFrame([(1, "one two")], "doc_id long, text string")
    assert dedup.shingles(df, k=3).count() == 0


def test_minhash_identical_docs_identical_signatures(tiny_docs):
    sig = dedup.minhash_signatures(dedup.shingles(tiny_docs), num_perm=9)
    rows = {(r["doc_id"], r["seed"]): r["minhash"] for r in sig.collect()}
    for seed in range(9):
        assert rows[(1, seed)] == rows[(2, seed)]
    # doc 5 shares nothing with doc 1 -> virtually surely different signature
    assert any(rows[(1, s)] != rows[(5, s)] for s in range(9))


def test_lsh_finds_dup_pair(tiny_docs):
    sig = dedup.minhash_signatures(dedup.shingles(tiny_docs), num_perm=9)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.lsh_candidate_pairs(sig).collect()
    }
    assert (1, 2) in pairs  # identical docs always collide in every band
    assert (4, 5) not in pairs  # disjoint shingle sets


def test_ngram_jaccard_exact_value(tiny_docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            dedup.shingles(tiny_docs), threshold=0.1
        ).collect()
    }
    assert pairs[(1, 2)] == 1.0
    # docs 1 and 3: 4 shingles each, shared = first 3 ("...epsilon zeta" vs
    # "...epsilon eta" differ in the final word) -> J = 3/5
    assert pairs[(1, 3)] == round(3 / 5, 6)


def test_simhash_identical_and_banding_lossless(tiny_docs):
    toks = (
        tiny_docs.select(
            "doc_id",
            F.explode(F.split("text", " ")).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    fps = {r["doc_id"]: r["simhash"] for r in dedup.simhash_fingerprints(toks).collect()}
    assert fps[1] == fps[2]
    # banded near-dup must equal brute force at radius 3 (pigeonhole proof)
    banded = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in dedup.simhash_near_dup(toks, max_hamming=3).collect()
    }
    brute = set()
    ids = sorted(fps)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin((fps[a] ^ fps[b]) & ((1 << 64) - 1)).count("1")
            if h <= 3:
                brute.add((a, b, h))
    assert banded == brute
    assert (1, 2, 0) in banded


def test_simhash_operator_plans_without_row_explosion(spark):
    """The r03 wide-aggregate rewrite must hold: given (doc_id, term, tf)
    rows, the fingerprint plans as ONE aggregate on doc_id with NO
    Generate node — the pre-r03 shape exploded every token into 64 rows
    (a 64x multiplier through the partial aggregate at any scale)."""
    import contextlib
    import io

    toks = spark.createDataFrame([(1, "alpha", 2), (1, "beta", 1)],
                                 "doc_id long, term string, tf long")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        dedup.simhash_fingerprints(toks).explain("formatted")
    plan = buf.getvalue()
    assert "Generate" not in plan, plan
    # one shuffle (each node renders twice in formatted output: tree + detail)
    assert plan.count("Exchange") == 2, plan


def test_simhash_band_reassembly_matches_direct(tiny_docs):
    toks = (
        tiny_docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    direct = {r["doc_id"]: r["simhash"] for r in dedup.simhash_fingerprints(toks).collect()}
    via_bands = {
        r["doc_id"]: r["simhash"]
        for r in dedup.simhash_bands(toks).select("doc_id", "simhash").distinct().collect()
    }
    assert direct == via_bands


def test_connected_components_chain(spark):
    # a 6-node chain (needs several label-propagation rounds) + a pair +
    # an isolated node supplied via nodes=
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (10, 11)],
        "id_a long, id_b long",
    )
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 5, 6, 10, 11, 99]],
                                  "doc_id long")
    got = {
        r["doc_id"]: r["component"]
        for r in dedup.connected_components(pairs, nodes).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1, 10: 10, 11: 10, 99: 99}


def test_containment_finds_subset_doc_jaccard_misses(tiny_docs):
    # doc 6's 2 shingles are a strict subset of doc 1's 4: overlap 1.0 but
    # Jaccard only 0.5 — the asymmetric case the operator exists for.
    docs = tiny_docs.unionByName(
        tiny_docs.sparkSession.createDataFrame(
            [(6, "alpha beta gamma delta")], "doc_id long, text string"
        )
    )
    got = {
        (r["id_a"], r["id_b"]): r["overlap"]
        for r in dedup.containment_pairs(
            dedup.shingles(docs), threshold=0.9
        ).collect()
    }
    assert got[(1, 6)] == 1.0
    assert got[(2, 6)] == 1.0
    jac = {
        (r["id_a"], r["id_b"])
        for r in dedup.ngram_jaccard_pairs(
            dedup.shingles(docs), threshold=0.9
        ).collect()
    }
    assert (1, 6) not in jac


def test_containment_prefix_filter_lossless_vs_bruteforce(tiny_docs):
    # the smaller-side prefix filter must reproduce the brute-force result
    # exactly (losslessness proof exercised on every co-occurring pair)
    docs = tiny_docs.unionByName(
        tiny_docs.sparkSession.createDataFrame(
            [(6, "alpha beta gamma delta"), (7, "delta epsilon zeta eta")],
            "doc_id long, text string",
        )
    )
    sh = dedup.shingles(docs)
    sets: dict[int, set] = {}
    for r in sh.collect():
        sets.setdefault(r["doc_id"], set()).add(r["shingle"])
    t = 0.5
    brute = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            common = len(sets[a] & sets[b])
            if common:
                ov = round(common / min(len(sets[a]), len(sets[b])), 6)
                if ov >= t:
                    brute[(a, b)] = ov
    got = {
        (r["id_a"], r["id_b"]): r["overlap"]
        for r in dedup.containment_pairs(sh, threshold=t).collect()
    }
    assert got == brute


def test_canonical_representatives_argmax_tie_min_id(spark):
    comps = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)],
        "doc_id long, component long",
    )
    scores = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 9), (10, 4), (11, 2)],
        "doc_id long, score long",
    )
    got = {
        r["component"]: (r["canonical_doc"], r["score"], r["n_members"])
        for r in dedup.canonical_representatives(comps, scores).collect()
    }
    # component 1: scores 5/9/9 — max 9, tie between 2 and 3 -> min id 2
    assert got == {1: (2, 9, 3), 10: (10, 4, 2)}


def test_dedup_keep_first(tiny_docs):
    pairs = tiny_docs.sparkSession.createDataFrame(
        [(1, 2), (1, 3)], "id_a long, id_b long"
    )
    kept = {r["doc_id"] for r in dedup.dedup_keep_first(tiny_docs, pairs).collect()}
    assert kept == {1, 4, 5}


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 16)).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(40)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        vecs,
    )


def test_knn_join_matches_numpy(emb_df):
    df, vecs = emb_df
    probes = df.filter(F.col("vec_id") < 5)
    got = {
        r["probe_id"]: (r["nn_id"], r["cosine"])
        for r in similarity.knn_join(probes, df, k=1).collect()
    }
    norms = np.linalg.norm(vecs.astype("float64"), axis=1)
    cos = (vecs.astype("float64") @ vecs.astype("float64").T) / np.outer(norms, norms)
    np.fill_diagonal(cos, -2)
    for p in range(5):
        nn = int(np.argmax(cos[p]))
        assert got[p][0] == nn
        assert math.isclose(got[p][1], round(cos[p][nn], 6), abs_tol=1e-6)


def test_srp_near_dup_recall_vs_brute(emb_df):
    df, vecs = emb_df
    # plant near-dups: tiny perturbation of vectors 0..4
    mut = df.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.expr(
            "transform(embedding, x -> cast(cast(x as double) * 1.001 as float))"
        ).alias("embedding"),
    )
    corpus = df.unionByName(mut)
    got = {
        (r["id_a"], r["id_b"])
        for r in similarity.srp_bucketed_pairs(
            corpus, threshold=0.999, dim=16
        ).collect()
    }
    # uniform scaling leaves cosine at exactly 1 -> all 5 planted pairs found
    assert {(i, i + 1000) for i in range(5)} <= got


def test_srp_plane_sign_deterministic():
    a = [similarity.srp_plane_sign(p, d) for p in range(4) for d in range(8)]
    b = [similarity.srp_plane_sign(p, d) for p in range(4) for d in range(8)]
    assert a == b
    assert set(a) == {1.0, -1.0}


def test_language_id_real_text(spark):
    rows = [
        (1, "the cat and the dog sat in the house of cards", "en"),
        (2, "der hund und die katze sind nicht in das haus", "de"),
        (3, "le chat et la souris sont dans les jardins des rois", "fr"),
        (4, "el perro y los gatos que viven en una casa del pueblo", "es"),
        (5, "这是一个中文句子 testing mixed content", "zh"),
        (6, "zzz qqq xxx", "und"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, expect string")
    got = {r["doc_id"]: r["pred_lang"] for r in textstats.language_id(df).collect()}
    for doc_id, _, expect in rows:
        assert got[doc_id] == expect, f"doc {doc_id}: {got[doc_id]} != {expect}"


def test_token_counts(spark):
    df = spark.createDataFrame(
        [(1, "Hello, world! 42 foo-bar")], "doc_id long, text string"
    )
    r = textstats.token_counts(df).first()
    assert r["ws_tokens"] == 4
    # hello , world ! 42 foo - bar
    assert r["bpe_tokens"] == 8
    assert r["n_chars"] == 24


def test_tfidf_keywords_matches_python_oracle(spark):
    import math
    import re

    texts = {
        1: "apple banana apple cherry apple",
        2: "banana cherry cherry durian",
        3: "durian elderberry fig fig fig grape",
    }
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    tok = {d: re.findall(r"[a-z0-9]{2,}", t.lower()) for d, t in texts.items()}
    dfreq: dict[str, int] = {}
    for words in tok.values():
        for w in set(words):
            dfreq[w] = dfreq.get(w, 0) + 1
    n = len(texts)
    expected = {}
    for d, words in tok.items():
        tf: dict[str, int] = {}
        for w in words:
            tf[w] = tf.get(w, 0) + 1
        scored = sorted(
            (
                (round(c * math.log(n / dfreq[w]), 6), w, c)
                for w, c in tf.items()
            ),
            key=lambda x: (-x[0], x[1]),
        )[:2]
        expected[d] = [
            (i + 1, w, c, dfreq[w], s) for i, (s, w, c) in enumerate(scored)
        ]
    got: dict[int, list] = {d: [] for d in texts}
    for r in textstats.tfidf_keywords(df, k=2).collect():
        got[r["doc_id"]].append(
            (r["rnk"], r["term"], r["tf"], r["dfreq"], r["score"])
        )
    for d in texts:
        assert sorted(got[d]) == expected[d], d
    # corpus-wide term ("cherry"-free doc 3): a term in every doc would
    # score 0; fig (df=1) must out-rank durian (df=2) despite both present
    assert got[3][0][1] == "fig"


def _collocations_oracle(texts, k, min_count, window=1):
    import math
    import re

    c12: dict[tuple, int] = {}
    for t in texts:
        w = re.findall(r"[a-z0-9]{2,}", t.lower())
        for i, a in enumerate(w):
            for o in range(1, window + 1):
                if i + o >= len(w):
                    break
                b = w[i + o]
                c12[(a, b)] = c12.get((a, b), 0) + 1
    c1: dict[str, int] = {}
    c2: dict[str, int] = {}
    for (a, b), c in c12.items():
        c1[a] = c1.get(a, 0) + c
        c2[b] = c2.get(b, 0) + c
    n = sum(c12.values())
    rows = sorted(
        (
            (round(math.log((c * n) / (c1[a] * c2[b])), 6), a, b, c)
            for (a, b), c in c12.items()
            if c >= min_count
        ),
        key=lambda x: (-x[0], x[1], x[2]),
    )[:k]
    return [
        (i + 1, a, b, c, c1[a], c2[b], s)
        for i, (s, a, b, c) in enumerate(rows)
    ]


def test_collocations_matches_python_oracle(spark):
    # "new york" always adjacent (high PMI); "the cat/dog/car" disperses
    # "the"'s marginal; "rare pair" appears twice — under the floor of 3
    texts = [
        "visit new york and the cat sat on the mat in new york today",
        "the dog and the car left new york while rare pair words repeat",
        "new york is where the cat and the dog met a rare pair once more",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    expected = _collocations_oracle(texts, k=5, min_count=3)
    got = [
        (r["rnk"], r["w1"], r["w2"], r["c12"], r["c1"], r["c2"], r["pmi"])
        for r in textstats.collocations(df, k=5, min_count=3).collect()
    ]
    got = sorted(got)
    assert got == expected
    # the always-adjacent phrase must out-rank the dispersed stopword pairs
    assert got and (got[0][1], got[0][2]) == ("new", "york")
    # the under-floor bigram is absent
    assert all((w1, w2) != ("rare", "pair") for _, w1, w2, *_ in got)


def test_collocations_skipgram_window(spark):
    # window=3 counts (w[i], w[i+o]) for o in 1..3 — "alpha ... gamma" at
    # distance 2 becomes a pair that the adjacent stream never sees
    texts = [
        "alpha beta gamma delta alpha beta gamma",
        "alpha x1 gamma alpha x2 gamma delta beta",
        "gamma alpha beta delta gamma alpha beta",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    expected = _collocations_oracle(texts, k=10, min_count=2, window=3)
    got = sorted(
        (r["rnk"], r["w1"], r["w2"], r["c12"], r["c1"], r["c2"], r["pmi"])
        for r in textstats.collocations(df, k=10, min_count=2, window=3).collect()
    )
    assert got == sorted(expected)
    # the distance-2 pair exists under window=3 but not under window=1
    adj = {(w1, w2) for _, w1, w2, *_ in _collocations_oracle(texts, 100, 1)}
    assert any((w1, w2) == ("alpha", "gamma") for _, w1, w2, *_ in got)
    assert ("alpha", "gamma") not in adj


def test_collocations_partitioning_invariance(spark):
    texts = [
        f"alpha beta gamma delta {w} alpha beta epsilon"
        for w in ("one", "two", "three", "four", "five", "six")
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    a = sorted(map(tuple, textstats.collocations(df, k=10, min_count=2).collect()))
    b = sorted(
        map(
            tuple,
            textstats.collocations(
                df.repartition(7), k=10, min_count=2
            ).collect(),
        )
    )
    assert a == b
    assert a, "expected non-empty collocations"


def test_collocations_empty_and_short_docs(spark):
    df = spark.createDataFrame(
        [("",), ("solo",), ("  ",)], "text string"
    )
    assert textstats.collocations(df, k=5, min_count=1).collect() == []


def _zipf_oracle(rows, r):
    import math
    import re
    from collections import Counter

    # half-up quantization (floor(x + 0.5)) — what Spark round(x, 0) and
    # DuckDB round() both do for positive doubles; python round() banks
    def q6(v):
        return math.floor(math.log(v) * 1e6 + 0.5)

    by: dict[str, Counter] = {}
    for lang, text in rows:
        by.setdefault(lang, Counter()).update(
            re.findall(r"[a-z0-9]{2,}", text.lower())
        )
    out = []
    for lang in sorted(by):
        c = by[lang]
        if not c:
            continue
        vocab, tot = len(c), sum(c.values())
        ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:r]
        pts = [(q6(i + 1), q6(cnt)) for i, (_, cnt) in enumerate(ranked)]
        n = len(pts)
        if n < 2:
            continue
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxx = sum(x * x for x, _ in pts)
        sxy = sum(x * y for x, y in pts)
        syy = sum(y * y for _, y in pts)
        num = float(n) * sxy - float(sx) * sy
        den = float(n) * sxx - float(sx) * sx
        den2 = float(n) * syy - float(sy) * sy
        out.append(
            (lang, vocab, tot, n, round(num / den, 6), round(num * num / (den * den2), 6))
        )
    return out


def test_zipf_stats_matches_python_oracle(spark):
    rows = [
        ("en", "the the the the cat cat sat on on the mat"),
        ("en", "the cat and the dog and the bird"),
        ("de", "der der die das der die und"),
        ("solo", "einziges"),  # 1 distinct term -> excluded (n < 2)
        ("empty", "   "),  # no tokens -> excluded
    ]
    df = spark.createDataFrame(rows, "lang string, text string")
    expected = _zipf_oracle(rows, r=200)
    got = sorted(tuple(r) for r in textstats.zipf_stats(df, r=200).collect())
    assert got == expected
    langs = [g[0] for g in got]
    assert langs == ["de", "en"]
    # natural text: slope negative, fit meaningful
    assert all(g[4] < 0 for g in got)


def test_zipf_stats_perfect_zipf_slope(spark):
    # counts exactly proportional to 1/rank -> slope -1, r2 1
    words = []
    for i, w in enumerate(["aa", "bb", "cc", "dd", "ee", "ff"]):
        words += [w] * (60 // (i + 1))
    df = spark.createDataFrame([("en", " ".join(words))], "lang string, text string")
    [row] = textstats.zipf_stats(df, r=10).collect()
    assert row["vocab"] == 6 and row["top_n"] == 6
    assert abs(row["zipf_slope"] + 1.0) < 1e-3
    assert row["r2"] > 0.999999


def test_zipf_stats_partitioning_invariance(spark):
    rows = [
        ("en", f"alpha beta beta gamma {w} delta alpha")
        for w in ("one", "two", "three", "four", "five", "six", "seven")
    ] + [("fr", "le le la les des le la")]
    df = spark.createDataFrame(rows, "lang string, text string")
    a = sorted(tuple(r) for r in textstats.zipf_stats(df, r=5).collect())
    b = sorted(
        tuple(r) for r in textstats.zipf_stats(df.repartition(7), r=5).collect()
    )
    assert a == b
    assert len(a) == 2


def test_heaps_law_saturated_corpus(spark):
    # identical docs: every 3-gram appears in slice 1, so vocab is flat,
    # beta is exactly 0 and the R2 zero-variance guard yields NULL
    text = "alpha beta gamma delta epsilon zeta"
    df = spark.createDataFrame(
        [(i, text) for i in range(10)], "doc_id long, text string"
    )
    rows = textstats.heaps_law(df, n=3, buckets=10).collect()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    assert rows[0]["vocab"] == 4  # 6 tokens -> 4 distinct 3-grams
    assert all(r["vocab"] == 4 for r in rows)
    assert [r["n_grams"] for r in rows] == [4 * k for k in range(1, 11)]
    assert [r["n_docs"] for r in rows] == list(range(1, 11))
    assert all(r["heaps_beta"] == 0.0 for r in rows)
    assert all(r["heaps_r2"] is None for r in rows)


def test_heaps_law_all_novel_grams(spark):
    # per-doc disjoint vocabularies: cumulative vocab == cumulative gram
    # instances at every slice, so the log-log fit is exactly (1, 1)
    rows_in = [
        (i, " ".join(f"w{i}x{j}" for j in range(7))) for i in range(10)
    ]
    df = spark.createDataFrame(rows_in, "doc_id long, text string")
    rows = textstats.heaps_law(df, n=3, buckets=10).collect()
    assert all(r["vocab"] == r["n_grams"] for r in rows)
    assert all(r["heaps_beta"] == 1.0 for r in rows)
    assert all(r["heaps_r2"] == 1.0 for r in rows)


def test_heaps_law_partitioning_invariance(spark):
    rows_in = [
        (i, f"alpha beta gamma w{i} delta w{i} epsilon") for i in range(20)
    ]
    df = spark.createDataFrame(rows_in, "doc_id long, text string")
    a = sorted(tuple(r) for r in textstats.heaps_law(df).collect())
    b = sorted(tuple(r) for r in textstats.heaps_law(df.repartition(7)).collect())
    assert a == b
    assert len(a) == 10


def test_shard_balance_conservation(spark, tmp_path):
    from search_engine_spark.driver_queries_td import q_shard_balance

    df = spark.createDataFrame(
        [(i, "aa bb cc aa") for i in range(6)], "doc_id long, text string"
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    rows = q_shard_balance(spark, str(tmp_path)).collect()
    assert sum(r["n_terms"] for r in rows) == 3
    assert sum(r["n_postings"] for r in rows) == 18  # 3 terms x 6 docs
    assert sum(r["n_occurrences"] for r in rows) == 24  # 4 tokens x 6 docs
    # the balance statistics are corpus-level constants on every row
    assert len({(r["max_over_avg"], r["cv"]) for r in rows}) == 1
    assert all(0 <= r["bucket"] < 8 for r in rows)


def test_events_anomaly_planted_spike(spark, tmp_path):
    from datetime import datetime, timedelta

    from search_engine_spark.driver_queries_td import q_events_anomaly

    t0 = datetime(2024, 5, 1)
    rows = []
    eid = 0
    # 'click': 1 event/hour for 30 hours, then a 40-event spike hour
    for h in range(30):
        rows.append((eid, t0 + timedelta(hours=h), 1, "click", 0.0, "{}")); eid += 1
    for _ in range(40):
        rows.append((eid, t0 + timedelta(hours=30, minutes=1), 1, "click", 0.0, "{}")); eid += 1
    # 'view': constant 2/hour -> zero variance -> z NULL everywhere
    for h in range(5):
        for _ in range(2):
            rows.append((eid, t0 + timedelta(hours=h), 2, "view", 0.0, "{}")); eid += 1
    # 'error': a single observed hour -> excluded (nh < 2)
    rows.append((eid, t0, 3, "error", 0.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.parquet(str(tmp_path / "events.parquet"))
    out = q_events_anomaly(spark, str(tmp_path)).collect()
    by_type: dict = {}
    for r in out:
        by_type.setdefault(r["event_type"], []).append(r)
    assert "error" not in by_type
    assert all(r["z"] is None and r["is_anomaly"] == 0 for r in by_type["view"])
    clicks = sorted(by_type["click"], key=lambda r: r["hour_idx"])
    assert len(clicks) == 31
    # only the spike hour is anomalous, with a large positive z
    assert [r["is_anomaly"] for r in clicks] == [0] * 30 + [1]
    assert clicks[-1]["n"] == 40 and clicks[-1]["z"] > 5
    # python oracle for one z: n=1 rows, mean=(30+40)/31, exact moments
    import math
    nh, sx, sxx = 31, 70, 30 + 1600
    z0 = round((1 - sx / nh) / math.sqrt((nh * sxx - sx * sx) / (nh * (nh - 1))), 6)
    assert clicks[0]["z"] == z0


def test_event_funnel_hand_computed(spark, tmp_path):
    from datetime import datetime, timedelta

    from search_engine_spark.driver_queries_td import q_event_funnel

    t0 = datetime(2024, 3, 1, 10)
    h = timedelta(hours=1)
    ev = [
        # user 1: full funnel inside the 24 h windows
        (1, "view", t0), (1, "click", t0 + h), (1, "purchase", t0 + 2 * h),
        # user 2: click 25 h after first view -> outside window, drops at click
        (2, "view", t0), (2, "click", t0 + 25 * h),
        # user 3: purchase BEFORE click -> strict ordering drops it at purchase
        (3, "view", t0), (3, "purchase", t0 + h), (3, "click", t0 + 2 * h),
        # user 4: never views -> counted in n_users only
        (4, "click", t0), (4, "purchase", t0 + h),
        # user 5: click at the same microsecond as view -> strict > excludes it
        (5, "view", t0), (5, "click", t0),
    ]
    df = spark.createDataFrame(
        [(i, ts, u, t, 0.0, "{}") for i, (u, t, ts) in enumerate(ev)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.parquet(str(tmp_path / "events.parquet"))
    [r] = q_event_funnel(spark, str(tmp_path)).collect()
    assert (r["n_users"], r["n_view"], r["n_click"], r["n_purchase"]) == (5, 4, 2, 1)
    assert r["view_rate"] == 0.8
    assert r["click_rate"] == 0.5
    assert r["purchase_rate"] == 0.5


def test_cohort_retention_hand_computed(spark, tmp_path):
    from datetime import datetime

    from search_engine_spark.driver_queries_td import q_cohort_retention

    # cohort A (day 0): users 1,2,3 — user 1 returns d1+d2, user 2 d2 only
    # cohort B (day 1): user 4 — returns d1 (absolute day 2)
    ev = [
        (1, datetime(2024, 1, 1, 9), 1), (2, datetime(2024, 1, 1, 23, 59), 1),
        (3, datetime(2024, 1, 1, 12), 1),
        (1, datetime(2024, 1, 2, 0, 0), 1),  # midnight boundary: day 1
        (4, datetime(2024, 1, 2, 8), 1),
        (1, datetime(2024, 1, 3, 9), 1), (2, datetime(2024, 1, 3, 9), 1),
        (4, datetime(2024, 1, 3, 9), 1),
        (1, datetime(2024, 1, 3, 10), 1),  # same user+day twice: one active row
    ]
    df = spark.createDataFrame(
        [(i, ts, u, "t", 0.0, "{}") for i, (u, ts, _) in enumerate(ev)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = str(tmp_path / "events.parquet")
    df.write.parquet(out)
    got = sorted(
        (r["cohort_day"] - 19723, r["offset_days"], r["active_users"],
         r["cohort_users"], r["retained_frac"])
        for r in q_cohort_retention(spark, str(tmp_path)).collect()
    )
    assert got == [
        (0, 0, 3, 3, 1.0),
        (0, 1, 1, 3, 0.333333),
        (0, 2, 2, 3, 0.666667),
        (1, 0, 1, 1, 1.0),
        (1, 1, 1, 1, 1.0),
    ]


def test_source_overlap_hand_computed(spark):
    shared = "alpha beta gamma delta epsilon"  # one shared 5-gram
    rows = [
        ("a", f"{shared} unique first tail words here"),
        ("b", f"{shared} different second ending tokens now"),
        ("b", f"{shared} different second ending tokens now"),  # dup doc: set semantics
        ("c", "entirely disjoint text with no common shingles at all"),
        ("d", "tiny"),  # < n tokens: no shingles, absent from output
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {
        (r["source_a"], r["source_b"]): (
            r["n_a"], r["n_b"], r["n_inter"], r["n_union"], r["jaccard"]
        )
        for r in textstats.source_overlap(df, n=5).collect()
    }
    # a and b: 10 tokens -> 6 shingles each; exactly the prefix one shared
    assert got == {("a", "b"): (6, 6, 1, 11, 0.090909)}


def test_source_overlap_partitioning_invariance(spark):
    rows = [
        (f"s{i % 3}", f"common run of five words plus {w} extra padding tokens")
        for i, w in enumerate(["one", "two", "three", "four", "five", "six"])
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    x = sorted(tuple(r) for r in textstats.source_overlap(df, n=5).collect())
    y = sorted(
        tuple(r) for r in textstats.source_overlap(df.repartition(7), n=5).collect()
    )
    assert x == y and len(x) == 3  # all 3 source pairs share the common prefix


def _readability_oracle(rows):
    import math
    import re

    def half_up(v):
        return math.floor(v + 0.5) if v >= 0 else -math.floor(-v + 0.5)

    by: dict = {}
    for lang, text in rows:
        w = re.findall(r"[a-z0-9]{2,}", text.lower())
        if not w:
            continue
        s = max(1, len(re.findall(r"[.!?]+", text)))
        sy = sum(max(1, len(re.findall(r"[aeiouy]+", t))) for t in w)
        fre = round(206.835 - 1.015 * (len(w) / s) - 84.6 * (sy / len(w)), 6)
        by.setdefault(lang, []).append(fre)
    out = []
    for lang in sorted(by):
        fs = by[lang]
        n = len(fs)
        out.append(
            (
                lang,
                n,
                round(sum(half_up(f * 1e6) for f in fs) / (n * 1e6), 6),
                sum(1 for f in fs if f >= 90),
                sum(1 for f in fs if 60 <= f < 90),
                sum(1 for f in fs if 30 <= f < 60),
                sum(1 for f in fs if f < 30),
            )
        )
    return out


def test_readability_matches_python_oracle(spark):
    rows = [
        # short monosyllabic sentences: very easy (fre > 90)
        ("en", "the cat sat. the dog ran. we go up. it is fun."),
        # one long latinate sentence: very hard (fre < 30)
        (
            "en",
            "organizational internationalization necessitates systematically "
            "coordinated administrative prioritization methodologies",
        ),
        ("de", "der hund lief. das war gut. wir sind da."),
        ("empty", "   "),  # no tokens: excluded
    ]
    df = spark.createDataFrame(rows, "lang string, text string")
    expected = _readability_oracle(rows)
    got = sorted(tuple(r) for r in textstats.readability(df).collect())
    assert got == expected
    by_lang = {g[0]: g for g in got}
    assert "empty" not in by_lang
    # band sanity: en has one very-easy and one very-hard doc
    assert by_lang["en"][3] == 1 and by_lang["en"][6] == 1


def test_readability_partitioning_invariance(spark):
    rows = [
        ("en", f"some plain words here. more text follows {w}. done now.")
        for w in ("one", "two", "three", "four", "five")
    ]
    df = spark.createDataFrame(rows, "lang string, text string")
    a = sorted(tuple(r) for r in textstats.readability(df).collect())
    b = sorted(tuple(r) for r in textstats.readability(df.repartition(7)).collect())
    assert a == b and len(a) == 1 and a[0][1] == 5


def _dup_profile_oracle(rows, n):
    import re
    from collections import Counter

    by: dict = {}
    for lang, text in rows:
        w = re.findall(r"[a-z0-9]{2,}", text.lower())
        by.setdefault(lang, Counter()).update(
            " ".join(w[i : i + n]) for i in range(len(w) - n + 1)
        )
    out = []
    for lang in sorted(by):
        c = by[lang]
        if not c:
            continue
        tot, dis = sum(c.values()), len(c)
        di = sum(v for v in c.values() if v >= 2)
        dd = sum(1 for v in c.values() if v >= 2)
        out.append((lang, tot, dis, di, dd, round(di / tot, 6), round(dd / dis, 6)))
    return out


def test_gram_dup_profile_matches_python_oracle(spark):
    rows = [
        ("en", "one two three four five six one two three four five"),
        ("en", "one two three four five and something entirely different here"),
        ("de", "kurz"),  # < n tokens: contributes nothing
        ("de", "alle meine entchen schwimmen auf dem see"),
    ]
    df = spark.createDataFrame(rows, "lang string, text string")
    expected = _dup_profile_oracle(rows, n=5)
    got = sorted(tuple(r) for r in textstats.gram_dup_profile(df, n=5).collect())
    assert got == expected
    by_lang = {g[0]: g for g in got}
    # "one two three four five" occurs 3x across the two en docs
    assert by_lang["en"][3] == 3 and by_lang["en"][4] == 1
    # de has one doc over the gram floor, nothing repeated
    assert by_lang["de"][3] == 0 and by_lang["de"][5] == 0.0


def test_gram_dup_profile_partitioning_invariance(spark):
    rows = [
        ("en", f"alpha beta gamma delta epsilon {w} alpha beta gamma delta epsilon")
        for w in ("one", "two", "three", "four")
    ]
    df = spark.createDataFrame(rows, "lang string, text string")
    a = sorted(tuple(r) for r in textstats.gram_dup_profile(df, n=5).collect())
    b = sorted(
        tuple(r)
        for r in textstats.gram_dup_profile(df.repartition(7), n=5).collect()
    )
    assert a == b and len(a) == 1


def _diversity_oracle(rows, q=10_000):
    import math

    def half_up(v):
        return math.floor(v + 0.5) if v >= 0 else -math.floor(-v + 0.5)

    by: dict = {}
    for label, v in rows:
        nrm = math.sqrt(sum(float(x) * float(x) for x in v))
        if nrm <= 0:
            continue
        by.setdefault(label, []).append(
            (half_up(nrm * 1e6), [half_up(float(x) / nrm * q) for x in v])
        )
    out = []
    for label in sorted(by):
        vs = by[label]
        n = len(vs)
        sum_norm6 = sum(a for a, _ in vs)
        sum_ssq = sum(sum(c * c for c in u) for _, u in vs)
        dimsums = [sum(u[d] for _, u in vs) for d in range(len(vs[0][1]))]
        ssum_sq = sum(float(s) * s for s in dimsums)
        avg_cos = (
            round((ssum_sq - sum_ssq) / (float(n) * (n - 1) * q * q), 6)
            if n >= 2
            else None
        )
        out.append((label, n, round(sum_norm6 / (n * 1e6), 6), avg_cos))
    return out


def test_embedding_diversity_matches_python_oracle(spark):
    rng = np.random.default_rng(11)
    rows = [(int(i % 3), [float(x) for x in rng.normal(size=8)]) for i in range(30)]
    rows.append((7, [0.0] * 8))  # zero vector: excluded entirely
    rows.append((9, [1.0] * 8))  # singleton label: avg_cos null
    df = spark.createDataFrame(rows, "label int, embedding array<float>")
    # the fixture went through float32 storage — recompute oracle from
    # the values Spark actually holds
    stored = [
        (r["label"], list(r["embedding"]))
        for r in df.select("label", "embedding").collect()
    ]
    expected = _diversity_oracle(stored)
    got = sorted(
        (r["label"], r["n"], r["avg_norm"], r["avg_cos"])
        for r in similarity.embedding_diversity(df).collect()
    )
    assert got == expected
    by_label = {g[0]: g for g in got}
    assert 7 not in by_label
    assert by_label[9][1] == 1 and by_label[9][3] is None


def test_embedding_diversity_collapsed_vs_orthogonal(spark):
    # label 0: 4 copies of one direction -> mean pairwise cosine ~1
    # label 1: the 4 axis vectors -> all pairs orthogonal -> ~0
    rows = [(0, [3.0, 4.0, 0.0, 0.0])] * 4 + [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (1, [0.0, 0.0, 1.0, 0.0]),
        (1, [0.0, 0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "label int, embedding array<float>")
    got = {
        r["label"]: r
        for r in similarity.embedding_diversity(df).collect()
    }
    assert abs(got[0]["avg_cos"] - 1.0) < 1e-6
    assert abs(got[1]["avg_cos"]) < 1e-6
    assert abs(got[0]["avg_norm"] - 5.0) < 1e-6
    assert abs(got[1]["avg_norm"] - 1.0) < 1e-6


def test_embedding_diversity_partitioning_invariance(spark):
    rng = np.random.default_rng(13)
    rows = [(int(i % 2), [float(x) for x in rng.normal(size=6)]) for i in range(25)]
    df = spark.createDataFrame(rows, "label int, embedding array<float>")
    a = sorted(tuple(r) for r in similarity.embedding_diversity(df).collect())
    b = sorted(
        tuple(r)
        for r in similarity.embedding_diversity(df.repartition(9)).collect()
    )
    assert a == b and len(a) == 2


def _winnow_oracle(text: str, k: int = 4, window: int = 5) -> set[str]:
    import hashlib
    import re

    words = re.findall(r"[a-z0-9]{2,}", text.lower())
    grams = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    hashes = [hashlib.md5(g.encode()).hexdigest() for g in grams]
    return {
        min(hashes[i : i + window]) for i in range(len(hashes) - window + 1)
    }


def test_winnowing_matches_python_oracle(spark):
    shared = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    texts = {
        1: f"aa bb cc {shared} dd ee ff",
        2: f"xx yy {shared} zz qq rr ss tt",
    }
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in textstats.winnowing_fingerprints(df, k=4, window=5).collect()
    }
    oracles = {d: _winnow_oracle(t) for d, t in texts.items()}
    for d in texts:
        assert rows[d]["n_fingerprints"] == len(oracles[d])
        assert rows[d]["min_fingerprint"] == min(oracles[d])
    # winnowing guarantee: a shared word run of window+k-1 = 8 words forces a
    # shared selected fingerprint between the two docs
    assert oracles[1] & oracles[2]


def test_connected_components_long_chain_beyond_diameter(spark):
    """A 60-hop path (diameter >> the old max_iter=25) must still collapse
    to one component — the property plain min-label propagation silently
    violated; star contraction converges in O(log^2 n) rounds."""
    from pyspark.sql import functions as F

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "id_a long, id_b long"
    )
    got = dedup.connected_components(pairs)
    comps = got.agg(F.count_distinct("component")).first()[0]
    assert comps == 1
    assert {r["component"] for r in got.collect()} == {0}
    assert got.count() == 61


def test_connected_components_mixed_topologies(spark):
    """Chain + triangle-with-tail + pair + isolated; arbitrary id order."""
    pairs = spark.createDataFrame(
        [
            (5, 4), (4, 3), (3, 2),          # chain ending at 2
            (100, 102), (102, 101), (101, 100), (102, 103),  # cycle + tail
            (7, 9),
        ],
        "id_a long, id_b long",
    )
    nodes = spark.createDataFrame(
        [(i,) for i in [2, 3, 4, 5, 7, 9, 100, 101, 102, 103, 999]],
        "doc_id long",
    )
    got = {
        r["doc_id"]: r["component"]
        for r in dedup.connected_components(pairs, nodes).collect()
    }
    assert got == {
        2: 2, 3: 2, 4: 2, 5: 2,
        7: 7, 9: 7,
        100: 100, 101: 100, 102: 100, 103: 100,
        999: 999,
    }


def test_connected_components_empty_pairs(spark):
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    nodes = spark.createDataFrame([(1,), (2,)], "doc_id long")
    got = {
        r["doc_id"]: r["component"]
        for r in dedup.connected_components(pairs, nodes).collect()
    }
    assert got == {1: 1, 2: 2}


# ---------------------------------------------------------------------------
# Trained IVF (deterministic k-means coarse quantizer)
# ---------------------------------------------------------------------------
def test_ivf_trained_recall_at_10(spark):
    """VERDICT r01 item 8 acceptance: trained-IVF recall@10 >= 0.9 vs the
    brute-force oracle on the sf0.1 embeddings.

    The sf0.1 embeddings are ISOTROPIC (true top-10 cosines sit at
    0.31-0.41 — no cluster structure), so IVF recall necessarily tracks
    the scanned fraction: measured 0.48 at nprobe/k=0.25, 0.80 at 0.50.
    k=8/nprobe=7 reaches 0.94. The companion clustered-corpus test below
    shows the same quantizer at ~full recall from a 2/16 scan when the
    data actually clusters — which 100 TB web-embedding corpora do."""
    from search_engine_spark.training_data import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    cents = S.train_ivf_centroids(emb, k=8, iters=5)
    assigned = S.ivf_assign(emb, cents).cache()
    assigned.count()

    probe_ids = [0, 7, 123, 999, 1500]
    probes = {
        r["vec_id"]: list(r["embedding"])
        for r in emb.filter(F.col("vec_id").isin(probe_ids)).collect()
    }
    recalls = []
    for pid in probe_ids:
        truth = {
            r["nn_id"]
            for r in S.knn_join(
                emb.filter(F.col("vec_id") == pid), emb, k=10
            ).collect()
        }
        got = {
            r["vec_id"]
            for r in S.ivf_topk(
                assigned, cents, probes[pid], k=10, nprobe=7, exclude_id=pid
            ).collect()
        }
        recalls.append(len(truth & got) / 10.0)
    assigned.unpersist()
    avg = sum(recalls) / len(recalls)
    assert avg >= 0.9, f"IVF recall@10 {avg} (per-probe {recalls})"


def test_ivf_concentrates_clustered_data(spark):
    """On a corpus WITH cluster structure the trained quantizer recovers
    the true neighbors from a small scan: 16 planted clusters, nprobe=2
    of k=16 (~12% scan) must give recall@10 = 1.0."""
    import hashlib

    from search_engine_spark.training_data import similarity as S

    def unit(h: bytes, dim: int) -> list:
        vals = []
        for d in range(dim):
            b = h[d % len(h)] ^ (d * 31 % 256)
            vals.append((b / 255.0) * 2 - 1)
        n = sum(v * v for v in vals) ** 0.5
        return [v / n for v in vals]

    dim, per = 32, 50
    rows = []
    for c in range(16):
        center = unit(hashlib.md5(f"center:{c}".encode()).digest(), dim)
        for j in range(per):
            off = unit(hashlib.md5(f"off:{c}:{j}".encode()).digest(), dim)
            v = [ci + 0.08 * oi for ci, oi in zip(center, off)]
            rows.append((c * per + j, v))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    cents = S.train_ivf_centroids(emb, k=16, iters=5)
    assigned = S.ivf_assign(emb, cents).cache()
    assigned.count()
    recalls = []
    for pid in [0, 101, 555]:
        probe = rows[pid][1]
        truth = {
            r["nn_id"]
            for r in S.knn_join(
                emb.filter(F.col("vec_id") == pid), emb, k=10
            ).collect()
        }
        got = {
            r["vec_id"]
            for r in S.ivf_topk(
                assigned, cents, probe, k=10, nprobe=2, exclude_id=pid
            ).collect()
        }
        recalls.append(len(truth & got) / 10.0)
    assigned.unpersist()
    assert min(recalls) == 1.0, recalls


def test_ivf_training_is_deterministic(spark):
    from search_engine_spark.training_data import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    a = S.train_ivf_centroids(emb, k=8, iters=2)
    b = S.train_ivf_centroids(emb, k=8, iters=2)
    assert a == b


def test_ivf_probe_lists_zero_jobs(spark):
    """Probe selection is pure driver-side Python — the partition-prune
    pattern: no Spark job may run."""
    from search_engine_spark.training_data import similarity as S

    cents = [[1.0, 0.0], [0.0, 1.0], [0.7, 0.7]]
    sc = spark.sparkContext
    sc.setJobGroup("ivf-probe", "must not run jobs")
    try:
        got = S.ivf_probe_lists([0.9, 0.1], cents, nprobe=2)
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert got == [0, 2]
    assert sc.statusTracker().getJobIdsForGroup("ivf-probe") == []


# ---------------------------------------------------------------------------
# End-to-end corpus curation pipeline
# ---------------------------------------------------------------------------
def test_curate_corpus_end_to_end(spark):
    from search_engine_spark.training_data.pipeline import curate_corpus

    good = (
        "the quick brown fox jumps over the lazy dog and then runs away "
        "into the green forest where many other animals live quietly"
    )
    rows = [
        (1, good),                                   # keeper
        (2, good),                                   # exact dup of 1 -> dropped
        (3, good + " extra tail words here today"),  # near-dup of 1 -> dropped
        (4, "short"),                                # quality: too short
        (5, "x" * 100 + "123456789 !!!"),            # quality: mean word len
        (6, ("le chat est sur la table et il regarde par la fenetre vers le "
             "jardin ou les oiseaux chantent dans les arbres pres de la "
             "maison et la vie est tres belle aujourd hui pour tout le monde")),  # language: fr
        (7, ("completely different english text about distributed systems "
             "and data processing with spark engines running large scale "
             "jobs every day for many users around the world")),  # keeper
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kept, report = curate_corpus(docs)
    ids = {r["doc_id"] for r in kept.collect()}
    assert ids == {1, 7}
    by_stage = {s: (rin, rout) for s, rin, rout in report.stages}
    assert by_stage["exact_dedup"] == (7, 6)      # doc 2 gone
    assert by_stage["quality"][1] == 4            # 4 and 5 gone
    assert by_stage["language"][1] == 3           # 6 gone
    assert by_stage["near_dup"] == (3, 2)         # 3 collapsed into 1
    assert report.total_in() == 7 and report.total_out() == 2
    assert sum(report.dropped().values()) == 5


def test_curate_corpus_gopher_and_pii_stages(spark):
    from search_engine_spark.training_data.pipeline import curate_corpus

    # >= 50 words, >= 2 required stopwords, clean of symbols -> passes
    # Gopher; carries an email + an IPv4 that the scrub must remove.
    passing = (
        "the big data cluster runs heavy jobs with many workers and every "
        "task finishes before the deadline because the scheduler balances "
        "load across racks while operators watch dashboards and the report "
        "mails ops@example.com from host 10.2.3.4 whenever a stage retries "
        "or a disk fills up and the team rotates oncall duty each week"
    )
    # plenty of words but ZERO required stopwords beyond one -> gopher-dropped
    failing = " ".join(["alpha beta gamma delta epsilon zeta eta theta"] * 8)
    docs = spark.createDataFrame(
        [(1, passing), (2, failing)], "doc_id long, text string"
    )
    kept, report = curate_corpus(docs, gopher=True, redact_pii=True)
    rows = {r["doc_id"]: r["text"] for r in kept.collect()}
    assert set(rows) == {1}
    assert "ops@example.com" not in rows[1] and "<EMAIL>" in rows[1]
    assert "10.2.3.4" not in rows[1] and "<IP>" in rows[1]
    by_stage = {s: (rin, rout) for s, rin, rout in report.stages}
    assert by_stage["gopher"] == (2, 1)
    assert by_stage["pii_redact"] == (1, 1)  # transform: no silent drops


def test_curate_corpus_mixing_stages(spark):
    """Opt-in corpus-assembly stages: decontaminate -> domain_cap ->
    mix_sample, each audited, in pipeline order after near-dup."""
    from search_engine_spark.training_data.pipeline import curate_corpus

    # fully distinct texts (a shared template would near-dup-collapse),
    # each passing the quality and english-language gates
    rows = [
        (1, ("the scheduler assigns every incoming task to an idle worker "
             "and keeps a fair queue so that heavy tenants never starve "
             "the small interactive sessions that engineers rely on daily "
             "while the accounting layer records usage for each project"),
         "hot", "en"),
        (2, ("compaction merges the small files that streaming writers "
             "leave behind and the storage layer then serves reads from "
             "fewer larger objects which lowers the metadata pressure on "
             "the catalog during busy afternoons"), "hot", "en"),
        (3, ("this short note simply reminds the operators to rotate the "
             "credentials before the quarterly audit happens again"),
         "hot", "en"),  # shortest hot doc -> capped out
        (4, ("routing tables converge quickly after a link failure because "
             "the fabric floods updates to every switch and the hosts "
             "barely notice the brief reordering of their packets"),
         "cold", "drop"),  # mix-sampled out
        (5, ("an engineer pasted the secret eval phrase marker into this "
             "document by accident and the benchmark overlap check must "
             "therefore remove it from the training corpus entirely"),
         "cold", "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string, lang string")
    eval_docs = spark.createDataFrame(
        [(100, "benchmark answer with the secret eval phrase marker inside")],
        "doc_id long, text string",
    )
    kept, report = curate_corpus(
        docs,
        eval_docs=eval_docs,
        decontam_n=5,
        domain_cap=2,
        mix_rates={"en": 1.0},
    )
    ids = {r["doc_id"] for r in kept.collect()}
    assert ids == {1, 2}
    by_stage = {s: (rin, rout) for s, rin, rout in report.stages}
    assert by_stage["near_dup"] == (5, 5)        # all texts distinct
    assert by_stage["decontaminate"] == (5, 4)   # doc 5 shares the 5-gram
    assert by_stage["domain_cap"] == (4, 3)      # hot capped at 2: doc 3 out
    assert by_stage["mix_sample"] == (3, 2)      # lang 'drop' has rate 0
    assert report.total_out() == 2


def test_curate_corpus_line_dedup_stage(spark):
    """line_dedup=True rewrites texts in place after exact dedup; a doc
    made of nothing but lines seen earlier reassembles to '' and is then
    dropped by the quality gate (attributable, not silent)."""
    from search_engine_spark.training_data.pipeline import curate_corpus

    a = ("the ingestion service reads batches from the queue and writes "
         "them to the lake while the monitor tracks lag and alerts the "
         "team whenever a partition falls behind the agreed freshness")
    b = ("a nightly job rebuilds the search index from the cleaned pages "
         "and publishes the new segments once the checks pass so that "
         "queries always hit a consistent snapshot of the data")
    boiler = "subscribe to our newsletter for updates and exclusive offers today"
    docs = spark.createDataFrame(
        [
            (1, a + "\n" + boiler),
            (2, b + "\n" + boiler),   # boilerplate line removed (doc 1 owns it)
            (3, a + "\n" + b),        # both lines seen earlier -> '' -> quality-dropped
        ],
        "doc_id long, text string",
    )
    kept, report = curate_corpus(docs, line_dedup=True)
    rows = {r["doc_id"]: r["text"] for r in kept.collect()}
    assert set(rows) == {1, 2}
    assert rows[1] == a + "\n" + boiler
    assert rows[2] == b                 # boilerplate stripped
    by_stage = {s: (rin, rout) for s, rin, rout in report.stages}
    assert by_stage["line_dedup"] == (3, 3)   # transform: no silent drops
    assert by_stage["quality"] == (3, 2)      # the emptied doc 3 drops here


def test_curate_corpus_is_idempotent(spark):
    """Curating an already-curated corpus drops nothing."""
    from search_engine_spark.training_data.pipeline import curate_corpus

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    kept, _ = curate_corpus(docs)
    again, report2 = curate_corpus(kept)
    assert report2.total_in() == report2.total_out()


# ---------------------------------------------------------------------------
# semantic_dedup (SemDeDup)
# ---------------------------------------------------------------------------
def test_semantic_dedup_groups_and_representatives(spark):
    from search_engine_spark.training_data import similarity as S

    # two clusters along orthogonal axes; ids 1/2/3 are a near-identical
    # chain in cluster x (1~2 and 2~3 both >= threshold), 10 is alone in
    # cluster x but dissimilar, 20/21 are duplicates in cluster y
    def vx(eps):
        return [1.0, eps, 0.0, 0.0]

    rows = [
        (1, vx(0.00)),
        (2, vx(0.01)),
        (3, vx(0.02)),
        (10, [1.0, 4.0, 0.0, 0.0]),   # same cluster, far from the chain
        (20, [0.0, 0.0, 1.0, 0.0]),
        (21, [0.0, 0.0, 1.0, 1e-4]),
        (30, [0.0, 0.0, 0.0, 1.0]),   # singleton in its own right
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [[1.0, 0.5, 0.0, 0.0], [0.0, 0.0, 1.0, 0.1]]
    out = {
        r["vec_id"]: (r["representative"], r["keep"])
        for r in S.semantic_dedup(corpus, cents, threshold=0.999).collect()
    }
    # the 1-2-3 chain collapses transitively to min id 1
    assert out[1] == (1, 1) and out[2] == (1, 0) and out[3] == (1, 0)
    # dissimilar cluster-mate and cross-cluster vectors keep themselves
    assert out[10] == (10, 1)
    assert out[20] == (20, 1) and out[21] == (20, 0)
    assert out[30] == (30, 1)
    assert len(out) == len(rows)


def test_semantic_dedup_cross_cluster_pairs_not_compared(spark):
    from search_engine_spark.training_data import similarity as S

    # identical vectors forced into different clusters by construction:
    # each one is exactly a centroid, so they never share a cluster and
    # SemDeDup (by design) cannot pair them
    rows = [(1, [1.0, 0.0]), (2, [0.0, 1.0])]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: r["keep"]
        for r in S.semantic_dedup(
            corpus, [[1.0, 0.0], [0.0, 1.0]], threshold=0.0
        ).collect()
    }
    assert out == {1: 1, 2: 1}


def test_curate_corpus_semantic_dedup_stage(spark):
    from search_engine_spark.training_data.pipeline import curate_corpus

    texts = [
        "the quick brown fox jumps over the lazy dog and then runs away "
        "into the green forest where many other animals live quietly",
        "completely different english text about distributed systems "
        "and data processing with spark engines running large scale "
        "jobs every day for many users around the world",
        "a tale of two cities begins with the best of times and the "
        "worst of times as the story moves between london and paris "
        "during the years of the revolution",
        "modern machine learning models are trained on curated corpora "
        "that pass through many quality filters before a single token "
        "reaches the optimizer in any large run",
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts, start=1)), "doc_id long, text string"
    )
    # 1 and 2 are embedding near-duplicates; 4 has NO embedding row and
    # must pass through untouched
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [1.0, 1e-4, 0.0]),
            (3, [0.0, 1.0, 0.0]),
        ],
        "doc_id long, embedding array<double>",
    )
    kept, report = curate_corpus(
        docs,
        embeddings=emb,
        semantic_centroids=[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]],
        semantic_threshold=0.999,
    )
    assert {r["doc_id"] for r in kept.collect()} == {1, 3, 4}
    by_stage = {s: (rin, rout) for s, rin, rout in report.stages}
    assert by_stage["semantic_dedup"] == (4, 3)


def test_curate_corpus_embeddings_without_centroids_raises(spark):
    from search_engine_spark.training_data.pipeline import curate_corpus

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    emb = spark.createDataFrame([(1, [1.0])], "doc_id long, embedding array<double>")
    with pytest.raises(ValueError, match="semantic_centroids"):
        curate_corpus(docs, embeddings=emb)


def test_curate_corpus_lm_quality_stage(spark):
    from search_engine_spark.training_data.curation import lm_quality
    from search_engine_spark.training_data.pipeline import curate_corpus

    # three distinct English docs built from a shared high-count
    # vocabulary, plus one English doc of singleton gibberish words; all
    # pass the heuristic gates, so the LM gate is the deciding stage
    common = [
        "the data team runs the spark jobs and the cluster stays busy "
        "while the workers finish tasks and the report lands on time "
        "for the weekly review of the pipeline health and progress",
        "the spark cluster runs many jobs and the data stays clean "
        "while the team watches the report and the tasks finish on "
        "time for the review of the weekly pipeline and its health",
        "the report shows the pipeline runs clean jobs and the team "
        "keeps the cluster busy while the data tasks finish on time "
        "and the weekly review confirms the health and the progress",
    ]
    junk = (
        "the zxqvu wkjhy pmbrt and qzlsd vfnrk xcgtw the hjklp bnmvc "
        "wertk yuiop the asdfg zxcvb qwert plmnk the okijn uhbgy tfcvr "
        "and rdxes wzaqy the mkolp njibu vgzty the crdxw zesaq ploik"
    )
    rows = [(i + 1, t) for i, t in enumerate(common)] + [(9, junk)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    # derive a floor between the scores (the LM trains on the stage's
    # input, which here is all four docs — they pass every earlier gate)
    base_kept, base_report = curate_corpus(docs)
    assert {r["doc_id"] for r in base_kept.collect()} == {1, 2, 3, 9}
    scores = {
        r["doc_id"]: r["mean_logprob"]
        for r in lm_quality(docs, min_count=2).collect()
    }
    assert max(scores[i] for i in (1, 2, 3)) > scores[9]
    floor = (min(scores[i] for i in (1, 2, 3)) + scores[9]) / 2

    kept, report = curate_corpus(
        docs, lm_logprob_floor=floor, lm_min_count=2
    )
    assert {r["doc_id"] for r in kept.collect()} == {1, 2, 3}
    by_stage = {s: (rin, rout) for s, rin, rout in report.stages}
    assert by_stage["lm_quality"] == (4, 3)


def test_curate_corpus_lm_gate_is_per_language_for_multilang(spark):
    from search_engine_spark.training_data.curation import lm_quality
    from search_engine_spark.training_data.pipeline import curate_corpus

    # a 3:1 en/de mix where every doc is fluent in its own language plus
    # one English gibberish doc. Scored per language (CCNet §4.3), one
    # floor keeps ALL fluent docs of BOTH languages and drops the junk;
    # a pooled LM would push the German doc toward the junk's score.
    en = [
        "the data team runs the spark jobs and the cluster stays busy "
        "while the workers finish tasks and the report lands on time "
        "for the weekly review of the pipeline health and progress",
        "the spark cluster runs many jobs and the data stays clean "
        "while the team watches the report and the tasks finish on "
        "time for the review of the weekly pipeline and its health",
        "the report shows the pipeline runs clean jobs and the team "
        "keeps the cluster busy while the data tasks finish on time "
        "and the weekly review confirms the health and the progress",
    ]
    de = [
        "der cluster ist schnell und die daten sind sauber und der "
        "bericht ist fertig und die arbeit ist gut und der plan ist "
        "klar und die woche ist lang und der test ist gruen und gut",
    ]
    junk = (
        "the zxqvu wkjhy pmbrt and qzlsd vfnrk xcgtw the hjklp bnmvc "
        "wertk yuiop the asdfg zxcvb qwert plmnk the okijn uhbgy tfcvr "
        "and rdxes wzaqy the mkolp njibu vgzty the crdxw zesaq ploik"
    )
    rows = [(i + 1, t) for i, t in enumerate(en + de)] + [(9, junk)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    # derive a floor between every fluent doc's PER-LANGUAGE score and
    # the junk's (the gate recomputes pred_lang per-row internally)
    from search_engine_spark.training_data.textstats import language_id

    scored = {
        r["doc_id"]: r["mean_logprob"]
        for r in lm_quality(
            language_id(docs).select("doc_id", "text", "pred_lang"),
            min_count=2,
            stratum_col="pred_lang",
        ).collect()
    }
    fluent = [scored[i] for i in (1, 2, 3, 4)]
    assert min(fluent) > scored[9]
    floor = (min(fluent) + scored[9]) / 2

    kept, report = curate_corpus(
        docs, languages=("en", "de"), lm_logprob_floor=floor, lm_min_count=2
    )
    assert {r["doc_id"] for r in kept.collect()} == {1, 2, 3, 4}
    by_stage = {s: (rin, rout) for s, rin, rout in report.stages}
    assert by_stage["lm_quality"] == (5, 4)


def test_curate_corpus_dsir_select_stage(spark):
    from search_engine_spark.training_data.mixing import dsir_weights
    from search_engine_spark.training_data.pipeline import curate_corpus

    prose = [
        "the data team runs the spark jobs and the cluster stays busy "
        "while the workers finish tasks and the report lands on time "
        "for the weekly review of the pipeline health and progress",
        "the spark cluster runs many jobs and the data stays clean "
        "while the team watches the report and the tasks finish on "
        "time for the review of the weekly pipeline and its health",
    ]
    junk = (
        "the zxqvu wkjhy pmbrt and qzlsd vfnrk xcgtw the hjklp bnmvc "
        "wertk yuiop the asdfg zxcvb qwert plmnk the okijn uhbgy tfcvr "
        "and rdxes wzaqy the mkolp njibu vgzty the crdxw zesaq ploik"
    )
    rows = [(i + 1, t) for i, t in enumerate(prose)] + [(9, junk)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    target = docs.filter(F.col("doc_id") == 1)

    scores = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_weights(docs, target, bucket_hex_chars=2).collect()
    }
    assert scores[2] > scores[9], "prose must outscore junk vs a prose target"
    floor = (scores[2] + scores[9]) / 2

    kept, report = curate_corpus(
        docs, dsir_target=target, dsir_floor=floor, dsir_bucket_hex_chars=2
    )
    assert {r["doc_id"] for r in kept.collect()} == {1, 2}
    by_stage = {s: (rin, rout) for s, rin, rout in report.stages}
    assert by_stage["dsir_select"] == (3, 2)


# ---------------------------------------------------------------------------
# HyperLogLog distinct sketch
# ---------------------------------------------------------------------------
def _hll_sim(values, b=12, seed="hll", rho_cap=33):
    """Python replay of the md5-register arithmetic — the estimate must
    match BIT-FOR-BIT (modulo one ln's last ulp), not just approximately."""
    import hashlib
    import math

    m = 1 << b
    hexc = b // 4
    regs: dict[int, int] = {}
    for v in values:
        h = hashlib.md5(f"{seed}:{v}".encode()).hexdigest()
        reg = int(h[:hexc], 16)
        w = h[hexc : hexc + 15]
        stripped = w.lstrip("0")
        z = 15 - len(stripped)
        if z == 15:
            rho = 61
        else:
            nib = stripped[0]
            lz = 3 if nib == "1" else 2 if nib in "23" else 1 if nib in "4567" else 0
            rho = 4 * z + lz + 1
        rho = min(rho, rho_cap)
        regs[reg] = max(regs.get(reg, 0), rho)
    s = sum(2 ** (rho_cap - r) for r in regs.values())
    s += (m - len(regs)) * 2**rho_cap
    alpha = 0.7213 / (1 + 1.079 / m)
    raw = (alpha * (m * m * 2**rho_cap)) / s
    v0 = m - len(regs)
    est = m * math.log(m / v0) if raw <= 2.5 * m and v0 > 0 else raw
    return len(regs), round(est, 6)


def test_hll_distinct_matches_simulator_and_truth(spark):
    from search_engine_spark.training_data import sketches

    keys = [f"key-{i}" for i in range(5000)]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    r = sketches.hll_distinct(df, "k").first()
    nset, est = _hll_sim(keys)
    assert r["n_registers_set"] == nset
    assert abs(r["est_distinct"] - est) < 1e-6
    # accuracy: sigma ~ 1.04/sqrt(4096) = 1.6%; 5% is > 3 sigma
    assert abs(r["est_distinct"] - 5000) / 5000 < 0.05


def test_hll_distinct_duplicates_and_nulls_ignored(spark):
    from search_engine_spark.training_data import sketches

    uniq = [f"u{i}" for i in range(400)]
    rows = [(k,) for k in uniq] * 3 + [(None,)] * 10
    df = spark.createDataFrame(rows, "k string")
    r = sketches.hll_distinct(df, "k").first()
    nset, est = _hll_sim(uniq)
    assert (r["n_registers_set"], r["est_distinct"]) == (nset, est)
    # 400 << 2.5 * 4096, so this exercised the linear-counting branch
    assert abs(r["est_distinct"] - 400) / 400 < 0.05


def test_hll_distinct_strata_independent_and_partition_invariant(spark):
    from search_engine_spark.training_data import sketches

    rows = [("en", f"e{i}") for i in range(300)] + [
        ("de", f"d{i}") for i in range(50)
    ]
    df = spark.createDataFrame(rows, "lang string, k string")
    a = {
        r["lang"]: (r["n_registers_set"], r["est_distinct"])
        for r in sketches.hll_distinct(
            df.repartition(7), "k", stratum_col="lang"
        ).collect()
    }
    b = {
        r["lang"]: (r["n_registers_set"], r["est_distinct"])
        for r in sketches.hll_distinct(
            df.coalesce(1), "k", stratum_col="lang"
        ).collect()
    }
    assert a == b
    assert a["en"] == _hll_sim([f"e{i}" for i in range(300)])
    assert a["de"] == _hll_sim([f"d{i}" for i in range(50)])


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------
def _cms_sim(values, d=4, b=12, seed="cms"):
    """Python replay of the (row, col) -> count relation."""
    import hashlib

    hexc = b // 4
    sk: dict[tuple[int, int], int] = {}
    for v in values:
        for j in range(d):
            h = hashlib.md5(f"{seed}:{j}:{v}".encode()).hexdigest()
            key = (j, int(h[:hexc], 16))
            sk[key] = sk.get(key, 0) + 1
    return sk


def _cms_sim_estimate(sk, item, d=4, b=12, seed="cms"):
    import hashlib

    hexc = b // 4
    return min(
        sk.get(
            (j, int(hashlib.md5(f"{seed}:{j}:{item}".encode()).hexdigest()[:hexc], 16)),
            0,
        )
        for j in range(d)
    )


def test_cms_sketch_matches_simulator_bit_exact(spark):
    from search_engine_spark.training_data import sketches

    values = [f"v{i % 37}" for i in range(1500)]
    df = spark.createDataFrame([(v,) for v in values], "k string")
    got = {
        (r["row"], r["col"]): r["cnt"]
        for r in sketches.cms_sketch(df, "k").collect()
    }
    assert got == _cms_sim(values)


def test_cms_estimate_never_underestimates_and_matches_simulator(spark):
    from collections import Counter

    from search_engine_spark.training_data import sketches

    values = [f"w{(i * i) % 211}" for i in range(3000)]
    truth = Counter(values)
    df = spark.createDataFrame([(v,) for v in values], "k string")
    sk = sketches.cms_sketch(df, "k")
    cand = spark.createDataFrame(
        [(k,) for k in truth] + [("never-seen",)], "k string"
    )
    got = {
        r["k"]: r["est_count"]
        for r in sketches.cms_estimate(sk, cand, "k").collect()
    }
    sim = _cms_sim(values)
    for k, true_cnt in truth.items():
        assert got[k] >= true_cnt
        assert got[k] == _cms_sim_estimate(sim, k)
    assert got["never-seen"] == _cms_sim_estimate(sim, "never-seen")


def test_cms_heavy_hitters_threshold_and_nulls(spark):
    from search_engine_spark.training_data import sketches

    # 'hot' is 30% of the stream, everything else < 1%
    values = ["hot"] * 300 + [f"cold{i}" for i in range(700)]
    rows = [(v,) for v in values] + [(None,)] * 5
    df = spark.createDataFrame(rows, "k string")
    cand = df.filter("k IS NOT NULL").distinct()
    got = sketches.cms_heavy_hitters(
        df, "k", cand, support_num=1, support_den=10
    ).collect()
    assert {r["k"] for r in got} == {"hot"}
    assert got[0]["n_total"] == 1000
    assert got[0]["est_count"] >= 300


def test_cms_strata_and_partitioning_invariant(spark):
    from search_engine_spark.training_data import sketches

    rows = [("en", f"e{i % 11}") for i in range(400)] + [
        ("de", f"d{i % 5}") for i in range(100)
    ]
    df = spark.createDataFrame(rows, "lang string, k string")
    a = sorted(
        map(tuple, sketches.cms_sketch(df.repartition(7), "k", "lang").collect())
    )
    b = sorted(
        map(tuple, sketches.cms_sketch(df.coalesce(1), "k", "lang").collect())
    )
    assert a == b
    en = {
        (r[1], r[2]): r[3] for r in a if r[0] == "en"
    }
    assert en == _cms_sim([f"e{i % 11}" for i in range(400)])


def test_cms_heavy_hitters_plan_reuses_sketch_exchange(spark):
    # the sketch feeds both the estimate join and the n_total aggregate;
    # the plan must materialize it ONCE (ReusedExchange), i.e. exactly
    # two corpus scans total: sketch + candidates — never three
    import re

    from search_engine_spark.training_data import sketches

    values = [(f"v{i % 9}",) for i in range(100)]
    df = spark.createDataFrame(values, "k string")
    cand = df.distinct()
    out = sketches.cms_heavy_hitters(df, "k", cand, support_den=10)
    old = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)
    assert plan.count("ReusedExchange") >= 1
    assert (
        len(re.findall(r"Scan ExistingRDD|Scan parquet|LocalTableScan", plan))
        == 2
    )


def test_cms_rejects_bad_params(spark):
    from search_engine_spark.training_data import sketches

    df = spark.createDataFrame([("x",)], "k string")
    with pytest.raises(ValueError, match="multiple of 4"):
        sketches.cms_sketch(df, "k", b=10)
    with pytest.raises(ValueError, match="d must be"):
        sketches.cms_sketch(df, "k", d=0)
    with pytest.raises(ValueError, match="support"):
        sketches.cms_heavy_hitters(df, "k", df, support_den=0)


# ---------------------------------------------------------------------------
# Exact length quantiles
# ---------------------------------------------------------------------------
def test_length_quantiles_type1_exact(spark):
    rows = [(i, "en", " ".join(["w"] * i)) for i in range(1, 11)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        r["pct"]: (r["n_docs"], r["value"])
        for r in textstats.length_quantiles(df).collect()
    }
    # type-1: smallest n with cum >= ceil(pct * 10 / 100)
    assert got == {25: (10, 3), 50: (10, 5), 75: (10, 8), 90: (10, 9)}


def test_length_quantiles_duplicates_empty_and_strata(spark):
    rows = (
        [(i, "en", "a b c") for i in range(9)]
        + [(9, "en", "")]
        + [(10 + i, "de", " ".join(["x"] * (10 + i))) for i in range(4)]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        (r["stratum"], r["pct"]): r["value"]
        for r in textstats.length_quantiles(df, percents=(50, 100)).collect()
    }
    # en: lengths [0] + [3]*9 -> p50 threshold 5 -> 3; p100 -> 3
    assert got[("en", 50)] == 3 and got[("en", 100)] == 3
    # de: lengths 10..13 -> p50 threshold 2 -> 11; p100 -> 13
    assert got[("de", 50)] == 11 and got[("de", 100)] == 13


def test_length_quantiles_partition_invariant(spark):
    rows = [(i, "en" if i % 3 else "de", " ".join(["w"] * (i % 17 + 1)))
            for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    a = sorted(map(tuple, textstats.length_quantiles(df.repartition(11)).collect()))
    b = sorted(map(tuple, textstats.length_quantiles(df.coalesce(1)).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# chunk_documents: sliding-window context chunks vs a pure-Python oracle.
# ---------------------------------------------------------------------------
def _oracle_chunks(texts, size, stride):
    import hashlib

    out = []
    for doc_id, text in texts:
        words = text.strip().split() if text and text.strip() else []
        for cid, start in enumerate(range(0, len(words), stride)):
            piece = words[start : start + size]
            out.append(
                (
                    doc_id,
                    cid,
                    start,
                    len(piece),
                    hashlib.md5(" ".join(piece).encode()).hexdigest(),
                )
            )
    return sorted(out)


@pytest.mark.parametrize("size,stride", [(4, 3), (5, 5), (3, 1), (100, 7)])
def test_chunk_documents_matches_oracle(spark, size, stride):
    texts = [
        (1, "a b c d e f g h i j"),       # overlap + short trailing chunk
        (2, "one"),                        # single token -> one chunk
        (3, ""),                           # blank -> no chunks
        (4, "  padded   whitespace  x "),  # trim + multi-space split
        (5, None),                         # NULL -> no chunks
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = sorted(
        tuple(r)
        for r in textstats.chunk_documents(
            df, size=size, stride=stride
        ).collect()
    )
    assert got == _oracle_chunks(texts, size, stride)


def test_chunk_documents_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        textstats.chunk_documents(df, size=0, stride=1)
    with pytest.raises(ValueError):
        textstats.chunk_documents(df, size=4, stride=0)


def test_chunk_documents_full_coverage_and_overlap(spark):
    # size 4 / stride 3: consecutive chunks share exactly 1 token, and
    # every token position is covered by at least one chunk.
    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(11)))], "doc_id long, text string"
    )
    rows = sorted(
        (r["start_tok"], r["n_tok"])
        for r in textstats.chunk_documents(df, size=4, stride=3).collect()
    )
    assert rows == [(0, 4), (3, 4), (6, 4), (9, 2)]


def test_rolling_active_hand_computed(spark, tmp_path):
    from datetime import datetime

    from search_engine_spark.driver_queries_td import q_rolling_active

    # day 0: users {1,2}; day 1: {1}; day 9: {1,3} — the 7-day window of
    # day 9 sees day 9 only (days 0/1 expired), so WAU(9)={1,3}
    ev = [
        (1, datetime(2024, 1, 1, 9)), (2, datetime(2024, 1, 1, 10)),
        (1, datetime(2024, 1, 1, 11)),   # same user+day: one active row
        (1, datetime(2024, 1, 2, 9)),
        (1, datetime(2024, 1, 10, 9)), (3, datetime(2024, 1, 10, 9)),
    ]
    df = spark.createDataFrame(
        [(i, ts, u, "t", 0.0, "{}") for i, (u, ts) in enumerate(ev)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.parquet(str(tmp_path / "events.parquet"))
    got = sorted(
        (r["day_idx"] - 19723, r["dau"], r["wau"], r["stickiness"])
        for r in q_rolling_active(spark, str(tmp_path)).collect()
    )
    # observed days only: 0, 1, 9. WAU(0)={1,2}; WAU(1)={1,2} (day-0
    # actives still inside the trailing window); WAU(9)={1,3}
    assert got == [
        (0, 2, 2, 1.0),
        (1, 1, 2, 0.5),
        (9, 2, 2, 1.0),
    ]


def test_event_gaps_and_transitions_hand_computed(spark, tmp_path):
    from datetime import datetime, timedelta

    from search_engine_spark.driver_queries_td import (
        q_event_gaps,
        q_event_transitions,
    )

    t0 = datetime(2024, 1, 1, 9, 0, 0)
    # user 1: view@0s -> click@10s -> view@40s ; user 2: one event (no gap);
    # user 3: two events at the SAME microsecond (event_id breaks the tie)
    ev = [
        (1, t0, "view"),
        (1, t0 + timedelta(seconds=10), "click"),
        (1, t0 + timedelta(seconds=40), "view"),
        (2, t0, "view"),
        (3, t0, "view"),
        (3, t0, "purchase"),
    ]
    df = spark.createDataFrame(
        [(i, ts, u, et, 0.0, "{}") for i, (u, ts, et) in enumerate(ev)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.parquet(str(tmp_path / "events.parquet"))

    gaps = {
        r["user_id"]: (r["n_gaps"], r["min_gap_us"], r["max_gap_us"],
                       r["mean_gap_us"])
        for r in q_event_gaps(spark, str(tmp_path)).collect()
    }
    # user 2 has no gap row; user 3's same-µs pair yields one zero gap
    assert gaps == {
        1: (2, 10_000_000, 30_000_000, 20_000_000),
        3: (1, 0, 0, 0),
    }

    trans = {
        (r["prev_type"], r["next_type"]): (r["n"], r["prob"])
        for r in q_event_transitions(spark, str(tmp_path)).collect()
    }
    # user 1: view->click, click->view; user 3: view->purchase (event_id
    # order at the tied timestamp)
    assert trans == {
        ("view", "click"): (1, 0.5),
        ("view", "purchase"): (1, 0.5),
        ("click", "view"): (1, 1.0),
    }


def test_term_burstiness_hand_computed(spark, tmp_path):
    import math

    from search_engine_spark.driver_queries_td import q_term_burstiness

    # 'clump' is bursty: 12 occurrences packed into 2 of 10 docs;
    # 'even' is spread: 1 occurrence in each of 10 docs; 'rare' under floor
    rows = []
    for i in range(10):
        text = "even " + ("clump " * 6 if i < 2 else "") + ("rare" if i == 0 else "")
        rows.append((i, text, "en", "s", len(text)))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["word"]: (r["df"], r["ctf"], r["burstiness"], r["df_ratio"])
        for r in q_term_burstiness(spark, str(tmp_path)).collect()
    }
    assert set(got) == {"even", "clump"}  # 'rare' ctf=1 < floor 10
    n = 10
    exp_clump = n * (1 - math.exp(-12 / n))
    exp_even = n * (1 - math.exp(-10 / n))
    assert got["clump"] == (2, 12, 6.0, round(2 / exp_clump, 6))
    assert got["even"] == (10, 10, 1.0, round(10 / exp_even, 6))
    # burstiness separates them: clumped term far below Poisson expectation
    assert got["clump"][3] < 0.4 < 1.0 <= round(got["even"][3], 1) + 0.5


def test_ql_topk_hand_computed(spark, tmp_path):
    import math

    from search_engine_spark.driver_queries_td import QL_MU, q_ql_topk

    # doc 0: 'spark' x3 + filler; doc 1: 'spark data' once each + filler;
    # doc 2: filler only (no match -> absent)
    rows = [
        (0, "spark spark spark xx yy zz", "en", "s", 10),
        (1, "spark data xx yy zz ww", "en", "s", 10),
        (2, "xx yy zz ww vv uu", "en", "s", 10),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["doc_id"]: (r["matched_terms"], r["ql_score"])
        for r in q_ql_topk(spark, str(tmp_path)).collect()
    }
    assert set(got) == {0, 1}

    def score(tfs, dl, c, ctfs):
        m6 = sum(
            round(math.log(1.0 + tf * c / (QL_MU * ctf)) * 1e6)
            for tf, ctf in zip(tfs, ctfs)
        )
        base6 = round(math.log(QL_MU / (dl + QL_MU)) * 1e6) * 3
        return round((m6 + base6) / 1e6, 6)

    c = 6 + 6 + 6  # total tokens
    # ctf: spark=4, data=1
    assert got[0] == (1, score([3], 6, c, [4]))
    assert got[1] == (2, score([1, 1], 6, c, [4, 1]))


def test_rank_overlap_identity_and_python_oracle(spark, tmp_path):
    import math

    from search_engine_spark.driver_queries_td import (
        RBO_K,
        q_bm25_topk,
        q_ql_topk,
        q_rank_overlap,
    )

    sf = "/root/testdata/sf0.001"
    row = q_rank_overlap(spark, sf).collect()[0]
    assert row["k"] == RBO_K

    # python replica from the two rankings the pair itself exposes
    a = [
        r["doc_id"]
        for r in q_bm25_topk(spark, sf).orderBy(
            F.desc("bm25_score"), F.asc("doc_id")
        ).collect()
    ]
    b = [
        r["doc_id"]
        for r in q_ql_topk(spark, sf).orderBy(
            F.desc("ql_score"), F.asc("doc_id")
        ).collect()
    ]
    p = 0.9
    rbo6 = 0
    for d in range(1, RBO_K + 1):
        x = len(set(a[:d]) & set(b[:d]))
        if x:
            rbo6 += round((1 - p) * p ** (d - 1) * x / d * 1e6)
    assert row["n_common"] == len(set(a) & set(b))
    assert row["rbo_trunc"] == round(rbo6 / 1e6, 6)
    # identical rankings give the truncated-RBO maximum (1 - p^k)
    assert 0.0 <= row["rbo_trunc"] <= round(1 - p**RBO_K, 6) + 1e-9


def test_value_histogram_hand_computed(spark, tmp_path):
    from datetime import datetime

    from search_engine_spark.driver_queries_td import q_value_histogram

    t = datetime(2024, 1, 1, 9)
    rows = [
        (0, t, 1, "x", 10.0, "{}"),    # bucket 0
        (1, t, 1, "x", 24.99, "{}"),   # bucket 0
        (2, t, 1, "x", 25.0, "{}"),    # bucket 1 (left-closed boundary)
        (3, t, 1, "x", -0.01, "{}"),   # bucket -1 (floor, not trunc)
        (4, t, 1, "y", 100.0, "{}"),   # own type
        (5, t, 1, "x", None, "{}"),    # NULL excluded
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.parquet(str(tmp_path / "events.parquet"))
    got = {
        (r["event_type"], r["bucket"]): (r["lo"], r["n"], r["share"])
        for r in q_value_histogram(spark, str(tmp_path)).collect()
    }
    assert got == {
        ("x", 0): (0, 2, 0.5),
        ("x", 1): (25, 1, 0.25),
        ("x", -1): (-25, 1, 0.25),
        ("y", 4): (100, 1, 1.0),
    }


def test_keyness_llr_hand_computed(spark, tmp_path):
    import math

    from search_engine_spark.driver_queries_td import q_keyness_llr

    # 'foo' exclusive to en (10x), 'bar' exclusive to de (10x),
    # 'norm' balanced 10/10 (G2 ~ 0)
    rows = [
        (0, "foo " * 10 + "norm " * 10, "en", "s", 10),
        (1, "bar " * 10 + "norm " * 10, "de", "s", 10),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["term"]: (r["ctf_a"], r["ctf_b"], r["llr_g2"], r["enriched_in_a"])
        for r in q_keyness_llr(spark, str(tmp_path)).collect()
    }

    def g2(a, b, na, nb):
        out = 0
        for o, e in ((a, na * (a + b) / (na + nb)), (b, nb * (a + b) / (na + nb))):
            if o > 0:
                out += round(o * math.log(o / e) * 1e6)
        return round(2 * out / 1e6, 6)

    na = nb = 20
    assert got["foo"] == (10, 0, g2(10, 0, na, nb), True)
    assert got["bar"] == (0, 10, g2(0, 10, na, nb), False)
    assert got["norm"][2] == 0.0  # perfectly balanced -> zero keyness
    assert got["foo"][2] > 10.0  # exclusive terms are strongly keyed


def test_lexical_diversity_hand_computed(spark, tmp_path):
    import math

    from search_engine_spark.driver_queries_td import q_lexical_diversity

    rows = [
        (0, "aa aa aa aa", "en", "s", 10),        # degenerate: H = 0, ttr .25
        (1, "aa bb cc dd", "en", "s", 10),        # uniform: H = ln 4
        (2, "aa aa bb", "en", "s", 10),           # mixed
        (3, "", "en", "s", 0),                    # empty: NULLs
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_types"], r["ttr"], r["entropy"])
        for r in q_lexical_diversity(spark, str(tmp_path)).collect()
    }

    def h(counts):
        n = sum(counts)
        s6 = sum(c * round(math.log(c) * 1e6) for c in counts)
        return round((n * round(math.log(n) * 1e6) - s6) / (n * 1e6), 6)

    assert got[0] == (4, 1, 0.25, 0.0)
    assert got[1] == (4, 4, 1.0, h([1, 1, 1, 1]))
    assert abs(got[1][3] - math.log(4)) < 1e-5
    assert got[2] == (3, 2, 0.666667, h([2, 1]))
    assert got[3] == (0, 0, None, None)


def test_rfm_segments_hand_computed(spark, tmp_path):
    from datetime import datetime

    from search_engine_spark.driver_queries_td import q_rfm_segments

    # corpus max date = 2024-12-31. cust 1: recent+frequent (champion);
    # cust 2: recent, low freq; cust 3: old but frequent (loyal);
    # cust 4: old + rare (dormant)
    orders = []
    oid = 0
    for _ in range(12):
        orders.append((oid, 1, "O", 100.0, datetime(2024, 12, 1), "1-URGENT")); oid += 1
    orders.append((oid, 2, "O", 50.5, datetime(2024, 12, 31), "1-URGENT")); oid += 1
    for _ in range(12):
        orders.append((oid, 3, "O", 10.0, datetime(2022, 1, 1), "1-URGENT")); oid += 1
    orders.append((oid, 4, "O", 7.25, datetime(2021, 6, 1), "1-URGENT")); oid += 1
    df = spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    df.write.parquet(str(tmp_path / "orders.parquet"))
    got = {
        r["custkey"]: (r["recency_days"], r["frequency"], r["monetary"],
                       r["segment"])
        for r in q_rfm_segments(spark, str(tmp_path)).collect()
    }
    assert got[1] == (30, 12, 1200.0, "champion")
    assert got[2] == (0, 1, 50.5, "recent")
    assert got[3][1:] == (12, 120.0, "loyal")
    assert got[4][3] == "dormant"


def test_cohort_overlap_and_weekly_profile_hand_computed(spark, tmp_path):
    from datetime import datetime

    from search_engine_spark.driver_queries_td import (
        q_cohort_overlap,
        q_weekly_profile,
    )

    # 1970-01-01 was a Thursday (dow 4 with 0=Sunday)
    thu = datetime(1970, 1, 1, 5, 0, 0)
    sun = datetime(1970, 1, 4, 23, 30, 0)
    ev = [
        (1, thu, "view"), (2, thu, "view"), (3, thu, "view"),
        (1, sun, "click"), (2, sun, "click"),
        (9, sun, "purchase"),
        (1, thu, "view"),   # same user+type twice: one set member
    ]
    df = spark.createDataFrame(
        [(i, ts, u, et, 0.0, "{}") for i, (u, ts, et) in enumerate(ev)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.parquet(str(tmp_path / "events.parquet"))

    ov = {
        (r["type_a"], r["type_b"]): (r["n_common"], r["jaccard"])
        for r in q_cohort_overlap(spark, str(tmp_path)).collect()
    }
    # view={1,2,3}, click={1,2}, purchase={9}; zero-overlap pairs absent
    assert ov == {("click", "view"): (2, round(2 / 3, 6))}

    wp = {
        (r["event_type"], r["dow"], r["hour"]): (r["n"], r["share"])
        for r in q_weekly_profile(spark, str(tmp_path)).collect()
    }
    assert wp[("view", 4, 5)] == (4, 1.0)      # Thursday 05:00
    assert wp[("click", 0, 23)] == (2, 1.0)    # Sunday 23:00
    assert wp[("purchase", 0, 23)] == (1, 1.0)


def test_user_streaks_hand_computed(spark, tmp_path):
    from datetime import datetime

    from search_engine_spark.driver_queries_td import q_user_streaks

    def d(day, h=9):
        return datetime(2024, 1, day, h)

    # user 1: days 1-3 consecutive, gap, days 6-7 (longest 3, 2 streaks);
    # user 2: single day twice (one active day); user 3: alternating days
    ev = [
        (1, d(1)), (1, d(2)), (1, d(3)), (1, d(6)), (1, d(7)),
        (1, d(2, 23)),            # same day again: one active day
        (2, d(10)), (2, d(10, 15)),
        (3, d(1)), (3, d(3)), (3, d(5)),
    ]
    df = spark.createDataFrame(
        [(i, ts, u, "t", 0.0, "{}") for i, (u, ts) in enumerate(ev)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.parquet(str(tmp_path / "events.parquet"))
    got = {
        r["user_id"]: (r["active_days"], r["n_streaks"], r["longest_streak"])
        for r in q_user_streaks(spark, str(tmp_path)).collect()
    }
    assert got == {1: (5, 2, 3), 2: (1, 1, 1), 3: (3, 3, 1)}


def test_order_gini_hand_computed(spark, tmp_path):
    from datetime import datetime

    from search_engine_spark.driver_queries_td import q_order_gini

    def write(counts, path):
        rows, oid = [], 0
        for cust, k in enumerate(counts, start=1):
            for _ in range(k):
                rows.append(
                    (oid, cust, "O", 10.0, datetime(2024, 1, 1), "1-URGENT")
                )
                oid += 1
        df = spark.createDataFrame(
            rows,
            "o_orderkey long, o_custkey long, o_orderstatus string,"
            " o_totalprice double, o_orderdate timestamp,"
            " o_orderpriority string",
        )
        df.write.parquet(str(path / "orders.parquet"))

    # perfectly equal: gini 0
    eq = tmp_path / "eq"
    eq.mkdir()
    write([5, 5, 5, 5], eq)
    row = q_order_gini(spark, str(eq)).collect()[0]
    assert (row["n"], row["total_orders"], row["gini"]) == (4, 20, 0.0)

    # textbook skew [1, 9]: mean-abs-diff Gini = sum|xi-xj| / (2 n^2 mu)
    sk = tmp_path / "sk"
    sk.mkdir()
    write([1, 9], sk)
    row = q_order_gini(spark, str(sk)).collect()[0]
    # pairs: |1-9| * 2 = 16; denom 2 * n * sx = 2*2*10 = 40 -> 0.4
    assert (row["n"], row["total_orders"], row["gini"]) == (2, 10, 0.4)


def test_length_moments_hand_computed(spark, tmp_path):
    import math

    from search_engine_spark.driver_queries_td import q_length_moments

    # en lengths [2, 4, 6]: mean 4, var 8/3, skew 0, excess kurt -1.5;
    # de single doc: zero variance -> NULL shape stats
    rows = [
        (0, "aa bb", "en", "s", 5),
        (1, "aa bb cc dd", "en", "s", 11),
        (2, "aa bb cc dd ee ff", "en", "s", 17),
        (3, "xx yy", "de", "s", 5),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["lang"]: (r["n"], r["mean_len"], r["variance"], r["skewness"],
                    r["kurtosis"])
        for r in q_length_moments(spark, str(tmp_path)).collect()
    }
    assert got["en"][0:2] == (3, 4.0)
    assert got["en"][2] == round(8 / 3, 6)
    assert got["en"][3] == 0.0          # symmetric
    assert got["en"][4] == -1.5         # uniform-3-point excess kurtosis
    assert got["de"] == (1, 2.0, 0.0, None, None)


def test_market_basket_hand_computed(spark, tmp_path):
    from datetime import datetime

    from search_engine_spark.driver_queries_td import q_market_basket

    # parts 10 and 11 co-occur in 3 of 4 orders; part 12 rides along once;
    # a duplicated line item must not double-count the basket membership
    baskets = [
        (1, [10, 11]),
        (2, [10, 11, 12]),
        (3, [10, 11, 10]),   # dup line: one membership
        (4, [10]),
    ]
    rows = []
    ln = 0
    for ok, parts in baskets:
        for p in parts:
            rows.append(
                (ok, p, 1, ln % 7, 1.0, 100.0, 0.0, 0.0, "N", "O",
                 datetime(2024, 1, 1))
            )
            ln += 1
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    )
    df.write.parquet(str(tmp_path / "lineitem.parquet"))
    got = {
        (r["part_a"], r["part_b"]): (r["n_pair"], r["support"],
                                     r["confidence"], r["lift"])
        for r in q_market_basket(spark, str(tmp_path)).collect()
    }
    # only the (10, 11) pair clears the floor of 3 (both directions)
    # na(10)=4, na(11)=3, n_orders=4
    assert got == {
        (10, 11): (3, 0.75, 0.75, round(3 * 4 / (4 * 3), 6)),
        (11, 10): (3, 0.75, 1.0, 1.0),
    }


def test_props_extract_hand_computed(spark, tmp_path):
    from datetime import datetime

    from search_engine_spark.driver_queries_td import q_props_extract

    t = datetime(2024, 1, 1, 9)
    rows = [
        (0, t, 1, "view", 0.0, '{"k": 10}'),
        (1, t, 1, "view", 0.0, '{"k": 20}'),
        (2, t, 1, "view", 0.0, '{"other": 5}'),   # missing key: NULL
        (3, t, 1, "view", 0.0, "not json"),        # malformed: NULL
        (4, t, 1, "click", 0.0, '{"k": -3}'),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.parquet(str(tmp_path / "events.parquet"))
    got = {
        r["event_type"]: (r["n_events"], r["n_unparsed"], r["min_k"],
                          r["max_k"], r["mean_k"])
        for r in q_props_extract(spark, str(tmp_path)).collect()
    }
    assert got == {
        "view": (4, 2, 10, 20, 15),
        "click": (1, 0, -3, -3, -3),
    }


def test_bounce_rate_hand_computed(spark, tmp_path):
    from datetime import datetime, timedelta

    from search_engine_spark.driver_queries_td import q_bounce_rate

    t0 = datetime(2024, 1, 1, 9)
    ev = [
        # user 1 session A (entry view, 2 events): not a bounce
        (1, t0, "view"), (1, t0 + timedelta(minutes=5), "click"),
        # user 1 session B after a 31-min gap (entry click, 1 event): bounce
        (1, t0 + timedelta(minutes=36, seconds=1), "click"),
        # user 2 single-event session (entry view): bounce
        (2, t0, "view"),
        # user 3: tied timestamps — event_id picks the entry ("error")
        (3, t0, "error"), (3, t0, "view"),
    ]
    df = spark.createDataFrame(
        [(i, ts, u, et, 0.0, "{}") for i, (u, ts, et) in enumerate(ev)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.parquet(str(tmp_path / "events.parquet"))
    got = {
        r["entry_type"]: (r["n_sessions"], r["n_bounces"], r["bounce_rate"])
        for r in q_bounce_rate(spark, str(tmp_path)).collect()
    }
    assert got == {
        "view": (2, 1, 0.5),
        "click": (1, 1, 1.0),
        "error": (1, 0, 0.0),
    }


def test_behavior_entropy_and_chao1_hand_computed(spark, tmp_path):
    import math
    from datetime import datetime

    from search_engine_spark.driver_queries_td import (
        q_behavior_entropy,
        q_chao1_vocab,
    )

    t = datetime(2024, 1, 1, 9)
    # user 1: 2 view + 2 click (max entropy ln 2); user 2: 5 view (0)
    ev = [(1, "view"), (1, "view"), (1, "click"), (1, "click")] + [
        (2, "view")
    ] * 5
    edf = spark.createDataFrame(
        [(i, t, u, et, 0.0, "{}") for i, (u, et) in enumerate(ev)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    edf.write.parquet(str(tmp_path / "events.parquet"))
    got = {
        r["user_id"]: (r["n"], r["n_types"], r["entropy"],
                       r["effective_types"])
        for r in q_behavior_entropy(spark, str(tmp_path)).collect()
    }
    h1 = round(
        (4 * round(math.log(4) * 1e6) - 4 * round(math.log(2) * 1e6))
        / (4 * 1e6),
        6,
    )
    assert got[1] == (4, 2, h1, round(math.exp(h1), 6))
    assert abs(got[1][2] - math.log(2)) < 1e-5
    assert got[2] == (5, 1, 0.0, 1.0)

    # chao1: en has 3 singletons, 1 doubleton, V=5
    # words: aa aa bb bb cc dd ee -> V=5, f1=3 (cc dd ee), f2=2 (aa bb)
    ddf = spark.createDataFrame(
        [(0, "aa aa bb bb cc dd ee", "en", "s", 20)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    ddf.write.parquet(str(tmp_path / "documents.parquet"))
    row = q_chao1_vocab(spark, str(tmp_path)).collect()[0]
    assert (row["v_obs"], row["f1"], row["f2"]) == (5, 3, 2)
    assert row["chao1"] == round(5 + 3 * 2 / (2.0 * 3), 6)


def test_anchor_text_and_prf_expansion_hand_computed(spark, tmp_path):
    from search_engine_spark.driver_queries_td import (
        q_anchor_text,
        q_prf_expansion,
    )

    # edges: (doc_id*7+13) % 5 -> 0->3, 1->0, 2->2 (self, dropped),
    # 3->4, 4->1; anchors = first 6 tokens of the source text
    docs = [
        (0, "alpha beta gamma"),
        (1, "delta alpha"),
        (2, "omega"),
        (3, "zeta eta theta iota kappa lambda mu"),  # mu is token #7: sliced off
        (4, "beta beta alpha"),
    ]
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))

    rows = {
        (r["target_doc_id"], r["rk"]): (r["term"], r["anchor_sources"])
        for r in q_anchor_text(spark, str(tmp_path)).collect()
    }
    assert rows == {
        (0, 1): ("alpha", 1), (0, 2): ("delta", 1),
        (1, 1): ("alpha", 1), (1, 2): ("beta", 1),
        (3, 1): ("alpha", 1), (3, 2): ("beta", 1), (3, 3): ("gamma", 1),
        # six distinct anchor words: only the top-3 (term asc on count tie)
        (4, 1): ("eta", 1), (4, 2): ("iota", 1), (4, 3): ("kappa", 1),
    }


def test_prf_expansion_hand_computed(spark, tmp_path):
    from search_engine_spark.driver_queries_td import q_prf_expansion

    # doc 2 matches no query term -> feedback set = {0, 1}
    docs = [
        (0, "spark data query alpha alpha beta"),  # dl=6
        (1, "spark beta beta gamma"),              # dl=4
        (2, "delta epsilon"),
    ]
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))

    got = [
        (r["term"], r["fb_df"], r["rm1_weight_i6"], r["rm1_weight"])
        for r in q_prf_expansion(spark, str(tmp_path)).collect()
    ]
    # beta: floor(1e6/6) + floor(2e6/4); alpha: floor(2e6/6); gamma: floor(1e6/4)
    assert got == [
        ("beta", 2, 166666 + 500000, (166666 + 500000) / 1e7),
        ("alpha", 1, 333333, 333333 / 1e7),
        ("gamma", 1, 250000, 250000 / 1e7),
    ]


def test_phrase_match_hand_computed(spark, tmp_path):
    from search_engine_spark.driver_queries_td import q_phrase_match

    docs = [
        # bigram at raw pos 1 and 3; trigram at pos 3
        (0, "order fast order fast window"),
        (1, "fast order window"),        # reversed: no adjacency
        (2, "order fast"),               # single bigram hit
        (3, "order slow fast window"),   # gap breaks the phrase
    ]
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))

    got = sorted(
        (r["phrase"], r["doc_id"], r["n_occurrences"], r["first_pos"])
        for r in q_phrase_match(spark, str(tmp_path)).collect()
    )
    assert got == [
        ("order fast", 0, 2, 1),
        ("order fast", 2, 1, 1),
        ("order fast window", 0, 1, 3),
    ]


def test_link_prediction_hand_computed(spark, tmp_path):
    from search_engine_spark.driver_queries_td import q_link_prediction

    # N=8, _TRI_GENS edges (0 is a %13 dangling source but gains edges as
    # a target): undirected edge set {05 06 13 14 17 23 24 35 46 57 67},
    # deg = {0:2, 1:3, 2:2, 3:3, 4:3, 5:3, 6:3, 7:3};
    # per-hub terms: round(1e6/ln2)=1442695, round(1e6/ln3)=910239
    spark.createDataFrame(
        [(i, "x", "en", "s", 1) for i in range(8)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))

    got = [
        (r["doc_a"], r["doc_b"], r["common_neighbors"], r["aa6"],
         r["adamic_adar"])
        for r in q_link_prediction(spark, str(tmp_path)).collect()
    ]
    # e.g. (3,4): Γ3={1,2,5} ∩ Γ4={1,2,6} = {1,2} → 910239 + 1442695
    assert got == [
        (3, 4, 2, 2352934, 2.352934),
        (5, 6, 2, 2352934, 2.352934),
        (0, 7, 2, 1820478, 1.820478),
        (1, 2, 2, 1820478, 1.820478),
        (1, 5, 2, 1820478, 1.820478),
        (1, 6, 2, 1820478, 1.820478),
        (3, 7, 2, 1820478, 1.820478),
        (4, 7, 2, 1820478, 1.820478),
        (0, 3, 1, 910239, 0.910239),
        (0, 4, 1, 910239, 0.910239),
        (2, 5, 1, 910239, 0.910239),
        (2, 6, 1, 910239, 0.910239),
    ]


def test_touch_attribution_hand_computed(spark, tmp_path):
    from datetime import datetime, timedelta

    from search_engine_spark.driver_queries_td import q_touch_attribution

    t0 = datetime(2024, 3, 1, 12, 0, 0)
    h = timedelta(hours=1)
    rows = [
        # user 1: view then click then purchase -> (view, click)
        (0, t0, 1, "view", 0.0, "{}"),
        (1, t0 + h, 1, "click", 0.0, "{}"),
        (2, t0 + 2 * h, 1, "purchase", 10.5, "{}"),
        # user 2: single click -> (click, click)
        (3, t0, 2, "click", 0.0, "{}"),
        (4, t0 + h, 2, "purchase", 5.25, "{}"),
        # user 3: no touches at all
        (5, t0, 3, "purchase", 1.0, "{}"),
        # user 4: touch outside the 7-day lookback
        (6, t0, 4, "view", 0.0, "{}"),
        (7, t0 + timedelta(days=8), 4, "purchase", 2.0, "{}"),
        # user 5: touch AFTER the purchase does not attribute
        (8, t0, 5, "purchase", 3.0, "{}"),
        (9, t0 + h, 5, "click", 0.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))

    got = sorted(
        (r["first_touch"], r["last_touch"], r["n_purchases"], r["revenue"])
        for r in q_touch_attribution(spark, str(tmp_path)).collect()
    )
    assert got == [
        ("(none)", "(none)", 3, 6.0),
        ("click", "click", 1, 5.25),
        ("view", "click", 1, 10.5),
    ]


def test_ndcg_eval_hand_computed(spark, tmp_path):
    from search_engine_spark.driver_queries_td import q_ndcg_eval

    # N=7; idf6 = round(ln((N-df+0.5)/(df+0.5)+1)*1e6): df=1 -> 1673976,
    # df=2 -> 1163151; discounts d6(1)=1000000, d6(2)=630930
    docs = [
        (0, "spark data query"),                    # news grade 3
        (1, "spark spark"),                         # news grade 1
        (2, "join merge"),                          # exec grade 2
        (3, "merge merge merge merge merge merge"), # exec grade 1, big tf
        (4, "window sort order"),                   # plan grade 3
        (5, "stream stream stream"),                # flow grade 1
        (6, "stream"),                              # flow grade 1
    ]
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))

    got = {
        r["qid"]: (r["dcg6"], r["idcg6"], r["ndcg"])
        for r in q_ndcg_eval(spark, str(tmp_path)).collect()
    }
    # exec: doc 3 (grade 1, tf=6) outscores doc 2 (grade 2) -> ndcg < 1:
    # dcg = 1*1000000 + 2*630930; ideal = 2*1000000 + 1*630930
    assert got == {
        "news": (3630930, 3630930, 1.0),
        "exec": (2261860, 2630930, round(2261860 / 2630930, 6)),
        "plan": (3000000, 3000000, 1.0),
        "flow": (1630930, 1630930, 1.0),
    }


def test_large_orders_hand_computed(spark, tmp_path):
    from datetime import datetime

    from search_engine_spark.driver_queries_td import q_large_orders

    d1, d2, d3 = (
        datetime(1995, 1, 1),
        datetime(1995, 1, 2),
        datetime(1995, 1, 3),
    )
    # order 1 sums to EXACTLY 250 -> excluded by the strict > gate;
    # order 2 clears it by one millionth (the fixed6 ulp); order 3 is
    # comfortably above; order 4 misses by one millionth.
    li = [
        (1, 100.0), (1, 150.0),
        (2, 100.0), (2, 150.000001),
        (3, 300.0),
        (4, 249.999999),
    ]
    spark.createDataFrame(
        [(ok, 0, 0, q) for ok, q in li],
        "l_orderkey long, l_partkey long, l_suppkey long, l_quantity double",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        [
            (1, 10, 500.0, d1),
            (2, 10, 400.0, d2),
            (3, 20, 400.0, d3),
            (4, 20, 900.0, d1),
        ],
        "o_orderkey long, o_custkey long, o_totalprice double,"
        " o_orderdate timestamp",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(10, "Customer#10"), (20, "Customer#20")],
        "c_custkey long, c_name string",
    ).write.parquet(str(tmp_path / "customer.parquet"))

    def us(dt):
        from datetime import timezone

        # ntz_epoch_us reads wall-clock fields, so the expectation is the
        # naive datetime interpreted as UTC regardless of the machine TZ
        return int(dt.replace(tzinfo=timezone.utc).timestamp() * 1_000_000)

    got = [
        (r["c_name"], r["custkey"], r["orderkey"], r["orderdate_us"],
         r["o_totalprice"], r["total_qty"])
        for r in q_large_orders(spark, str(tmp_path)).collect()
    ]
    # orders 1 and 4 gated out; tie on totalprice=400 broken by orderdate
    assert got == [
        ("Customer#10", 10, 2, us(d2), 400.0, 250.000001),
        ("Customer#20", 20, 3, us(d3), 400.0, 300.0),
    ]


def test_katz_centrality_hand_computed(spark, tmp_path):
    from search_engine_spark.driver_queries_td import q_katz_centrality

    # 8 docs -> the same affine-generator graph as the link_prediction
    # fixture: edges (1,4)(1,7)(2,3)(2,4)(3,1)(3,2)(4,1)(4,6)(5,0)(5,3)
    # (6,0)(6,7)(7,5)(7,6). c_k(v) = #length-k paths ending at v;
    # e.g. v=0: c1=2 (from 5,6), c2=3 (5<-7, 6<-4, 6<-7), c3=5, c4=7
    # -> katz_i = 2*512 + 3*64 + 5*8 + 7 = 1275, katz = 1275/4096.
    spark.createDataFrame(
        [(i, "x", "en", "s", 1) for i in range(8)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))

    got = {
        r["doc_id"]: (r["katz_i"], r["katz"])
        for r in q_katz_centrality(spark, str(tmp_path)).collect()
    }
    expect_i = {0: 1275, 1: 1330, 2: 660, 3: 1190,
                4: 1271, 5: 680, 6: 1350, 7: 1356}
    assert got == {v: (i, i / 4096) for v, i in expect_i.items()}


def test_cust_balance_hand_computed(spark, tmp_path):
    from search_engine_spark.driver_queries_td import q_cust_balance

    # segment A: avg 200 — c2 sits exactly AT the mean (strict > excludes);
    # segment B: c6 clears its own-pulled mean by ulps, c7 negative is
    # outside the average pool AND can never pass the positive-sum gate;
    # segment C: c9 is above-average but holds an open order (anti join),
    # c10 is above-average with only a finished order (kept).
    cust = [
        (1, "c1", "A", 100.0), (2, "c2", "A", 200.0), (3, "c3", "A", 300.0),
        (4, "c4", "B", 100.0), (5, "c5", "B", 300.0),
        (6, "c6", "B", 200.000003), (7, "c7", "B", -50.0),
        (8, "c8", "C", 100.0), (9, "c9", "C", 300.0), (10, "c10", "C", 250.0),
    ]
    spark.createDataFrame(
        cust, "c_custkey long, c_name string, c_mktsegment string,"
        " c_acctbal double",
    ).write.parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        [(100, 9, "O"), (101, 10, "F")],
        "o_orderkey long, o_custkey long, o_orderstatus string",
    ).write.parquet(str(tmp_path / "orders.parquet"))

    got = sorted(
        (r["custkey"], r["c_name"], r["c_mktsegment"], r["acctbal"],
         r["seg_avg"])
        for r in q_cust_balance(spark, str(tmp_path)).collect()
    )
    # B: sum6=600000003, n=3 -> floored micro-avg 200000001 (c5 at 300
    # clears it too); C: sum6=650000000, n=3 -> 216666666
    assert got == [
        (3, "c3", "A", 300.0, 200.0),
        (5, "c5", "B", 300.0, 200.000001),
        (6, "c6", "B", 200.000003, 200.000001),
        (10, "c10", "C", 250.0, 216.666666),
    ]


def test_late_supplier_hand_computed(spark, tmp_path):
    from datetime import datetime, timedelta

    from search_engine_spark.driver_queries_td import q_late_supplier

    t0 = datetime(1995, 1, 1)
    late = t0 + timedelta(days=365, seconds=1)   # strictly past the gate
    at = t0 + timedelta(days=365)                # exactly AT -> on time
    ok = t0 + timedelta(days=10)
    spark.createDataFrame(
        [
            (1, "F", t0),  # s1 late, s2 on time -> s1 counted
            (2, "F", t0),  # s1 AND s2 late -> nobody counted
            (3, "F", t0),  # single-supplier order -> not counted
            (4, "O", t0),  # open order -> out of scope
            (5, "F", t0),  # s3 exactly at the boundary, s1 late -> s1 again
        ],
        "o_orderkey long, o_orderstatus string, o_orderdate timestamp",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [
            (1, 1, late), (1, 2, ok),
            (2, 1, late), (2, 2, late),
            (3, 1, late),
            (4, 1, late), (4, 3, ok),
            (5, 1, late), (5, 3, at),
        ],
        "l_orderkey long, l_suppkey long, l_shipdate timestamp",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        [(1, "Supplier#1"), (2, "Supplier#2"), (3, "Supplier#3")],
        "s_suppkey long, s_name string",
    ).write.parquet(str(tmp_path / "supplier.parquet"))

    got = [
        (r["suppkey"], r["s_name"], r["numwait"])
        for r in q_late_supplier(spark, str(tmp_path)).collect()
    ]
    assert got == [(1, "Supplier#1", 2)]


def test_proximity_rank_hand_computed(spark, tmp_path):
    from search_engine_spark.driver_queries_td import q_proximity_rank

    docs = [
        (0, "order xx window"),                 # span 2
        (1, "window yy yy order order"),        # nearest pair 0-3 -> 3
        (2, "order only here"),                 # missing 'window' -> absent
        (3, "window order"),                    # adjacent -> 1
        (4, "order window order"),              # 1
        (5, "fast zz zz zz merge fast"),        # fast-merge span 1 (4,5)
        (6, "merge fast"),                      # 1
    ]
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))

    got = sorted(
        (r["query"], r["doc_id"], r["min_span"])
        for r in q_proximity_rank(spark, str(tmp_path)).collect()
    )
    assert got == [
        ("fast merge", 5, 1),
        ("fast merge", 6, 1),
        ("order window", 0, 2),
        ("order window", 1, 3),
        ("order window", 3, 1),
        ("order window", 4, 1),
    ]


def test_mmr_rerank_hand_computed(spark, tmp_path):
    from search_engine_spark.driver_queries_td import q_mmr_rerank

    # probe [1,0,0,0]; candidates at +20/+25/+40 deg in the xy plane,
    # -30/-35 deg (other half-plane), and one orthogonal. The greedy flip:
    # rank 2 is vec 3 (rel6 866025, maxsim6 cos50=642788) over the MORE
    # relevant vec 2 (rel6 906308, maxsim6 cos5=996195) because
    # 7*866025-3*642788 = 4133811 > 7*906308-3*996195 = 4017221.
    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9396926207859084, 0.3420201433256687, 0.0, 0.0]),
        (2, [0.9063077870366499, 0.42261826174069944, 0.0, 0.0]),
        (3, [0.8660254037844387, -0.49999999999999994, 0.0, 0.0]),
        (4, [0.766044443118978, 0.6427876096865393, 0.0, 0.0]),
        (5, [0.0, 0.0, 1.0, 0.0]),
        (6, [0.8191520442889918, -0.573576436351046, 0.0, 0.0]),
    ]
    spark.createDataFrame(
        [(i, v, 0) for i, v in vecs],
        "vec_id long, embedding array<double>, label int",
    ).write.parquet(str(tmp_path / "embeddings.parquet"))

    got = [
        (r["rank"], r["vec_id"], r["rel6"], r["maxsim6"], r["mmr6"])
        for r in q_mmr_rerank(spark, str(tmp_path)).collect()
    ]
    assert sorted(got) == [
        (1, 1, 939693, 0, 6577851),
        (2, 3, 866025, 642788, 4133811),
        (3, 2, 906308, 996195, 3355571),
        (4, 6, 819152, 996195, 2745479),
        (5, 4, 766044, 965926, 2464530),
    ]
