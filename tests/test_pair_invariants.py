"""Regression tests for the paired-query invariants fixed after round 1
(VERDICT r01 items 1-4):

- no Expand-plan ``countDistinct`` keyed on a Zipf-skewed term/word column
  (CLAUDE.md invariant 6) anywhere in the paired queries;
- zero driver-side actions beyond the unavoidable per-read parquet schema
  job during pair *construction* (scalars like N/avgdl are in-plan);
- double SUMs are boundary-proof by construction (invariant 4): a planted
  fixture whose naive float sum provably flips the 6th decimal with
  aggregation order still agrees between Spark and DuckDB;
- epoch derivation from TIMESTAMP_NTZ is timezone-invariant even for
  wall-clocks inside a DST spring-forward gap (invariant 3).
"""

import math
import os
from decimal import Decimal

import duckdb
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

# Queries rewritten to the two-phase distinct shape: their physical plans
# must never contain an Expand node (the mixed-distinct-aggregate plan that
# funnels every head-term row through one reducer). events_rollup is
# excluded: ROLLUP legitimately plans via Expand.
NO_EXPAND_QUERIES = [
    "term_stats",
    "search_topk",
    "spellcheck_dictionary",
    "spellcheck_candidates",
    "word_source_merge",
    "news_scoring",
    "bm25_topk",
    "news_feed_freshness",
    "fallback_search",
    "prf_expansion",
    "vocab_pruning",
    "impact_quantization",
]

# Exact number of Spark jobs each pair may run during CONSTRUCTION: one
# parquet-schema read per spark.read.parquet call, nothing else. A
# driver-side .count()/.first() scalar would add a job and fail this.
CONSTRUCTION_JOBS = {
    "corpus_stats": 1,
    "term_stats": 2,       # documents + tokens re-read of documents
    "search_topk": 2,
    "exact_dedup": 1,
    "quality_scores": 1,
    "freshness_scores": 1,
    "link_resolve": 1,
    "spellcheck_dictionary": 1,
    "union_word_sources": 2,  # documents + events
    "events_hourly": 1,
    "events_rollup": 1,
    "event_sessions": 1,
    "news_scoring": 1,
    "bm25_topk": 1,
    "degree_counts": 1,
    "word_source_merge": 2,
    "spellcheck_candidates": 1,
    "rfc2822_parse": 1,
    "news_feed_freshness": 0,  # pure fixture pipeline: no reads at all
    "fallback_search": 1,
    "article_upsert": 1,
    # ANN pairs: the schema read plus EXPLICITLY-allowed driver-side probe
    # fetches that mirror the reference's query analysis — each is bounded
    # (one row / k rows) and documented at the call site. Growth here means
    # a new plan-construction scan crept in.
    "embedding_knn": 1,       # read only (probe side is a broadcast join)
    "embedding_near_dup": 1,  # read only (dim passed explicitly)
    "similarity_topk": 2,     # read + probe-vector .first()
    "ann_lsh_topk": 2,        # read + probe-vector .first()
    "ann_ivf_topk": 3,        # read + probe .first() + centroid .collect()
    # trained quantizer: read + probe .first() + seed .collect() + per-Lloyd-
    # iteration (assignment job feeding the means .collect()) x 2 iters x
    # (seeds/assign/means stages) — 11 total, all on k- or (k x d)-bounded
    # results; training is a BUILD step, not a per-query cost
    "ann_ivf_trained": 11,
    # media pairs: local-fixture createDataFrame conversion + the
    # byte-budget sizing scalar in repartition_by_bytes
    "media_resize": 2,
    "media_frame_sample": 2,
    "media_features": 2,
    # BPE training loop (a BUILD step like ann_ivf_trained): initial
    # vocabulary checkpoint + per-merge-step (1-row argmax collect, which
    # AQE runs as ~2 jobs, + eager vocabulary checkpoint) x 8 steps;
    # bpe_tokenize adds the rule-list collect + one more vocabulary pass.
    # Every collected set is bounded by num_merges (the trained artifact).
    "bpe_merges": 27,
    "bpe_tokenize": 30,
    # remaining scan-only pairs: schema read, nothing else
    "binary_meta": 1,
    "language_id": 1,
    "pii_redaction": 1,
    "gopher_quality": 1,
    "repetition_stats": 1,
    "decontamination": 1,
    "stratified_sample": 1,
    "domain_top_k": 1,
    "quota_sample": 1,
    "line_dedup": 1,
    "minhash_lsh_pairs": 1,
    "ngram_jaccard_pairs": 1,
    "simhash_fingerprints": 1,
    "simhash_near_dup": 1,
    "token_counts": 1,
    "winnow_fingerprints": 1,
    "sequence_packing": 1,
    "corpus_mix_report": 1,
    "url_blocklist": 1,  # read; the 2-row blocklist is a local relation
    "lm_quality": 1,
    "lm_quality_by_lang": 1,
    "gopher_repetition": 1,
    "c4_rules": 1,
    "dedup_spans": 1,
    "bloom_dedup": 1,
    "tfidf_keywords": 1,  # N is an in-plan scalar, never a .count()
    "bigram_pmi": 1,    # bigram total is an in-plan broadcast scalar
    "skipgram_pmi": 1,  # same shape over the window-5 skip-gram stream
    "zipf_stats": 1,    # OLS sums are in-plan BIGINT folds, no driver scalars
    "embedding_diversity": 1,  # Gram-identity sums all in-plan, no driver math
    "dup_profile": 1,   # duplication fractions fold in-plan, no driver scalars
    "readability": 1,   # per-doc fre + band counts fold in-plan
    "cohort_retention": 1,  # two-phase distinct, all counts in-plan
    "triangle_counts": 1,   # N in-plan via scalar_count, no driver graph state
    "cocitation_coupling": 1,  # same edge recipe, ids-only self-joins
    "rolling_active": 1,  # one events read, all counts in-plan
    "event_gaps": 1,
    "event_transitions": 1,  # row totals joined in-plan (broadcast)
    "graph_mixing": 1,  # one docs read; the edge cache is lazy
    "source_overlap": 1,    # distinct-first sets, all counts in-plan
    "event_funnel": 1,      # four scalar_count aggregates cross-joined in-plan
    "asof_join": 1,         # union-and-sweep window plan, no driver state
    "interval_join": 1,     # bucket-explode equi-join, no driver state
    "context_chunks": 1,    # narrow map + explode, zero shuffles
    "events_anomaly": 1,    # moment sums fold in-plan per type
    "hll_distinct": 1,
    "postings_bytes": 1,  # read; the codec runs inside the grouped-map stage
    "rank_fusion": 2,  # bm25 leg + edge leg each read documents
    "search_snippets": 1,  # single scan, pure string arithmetic
    "heaps_law": 1,  # min/max doc_id is an in-plan broadcast, never .first()
    "shard_balance": 1,  # balance stats fold in-plan from BIGINT sums
    "pricing_summary": 1,   # one lineitem read
    "ship_priority": 3,     # customer + orders + lineitem reads
    "nation_revenue": 6,    # the full star: fact + orders + 4 dims
    "returns_report": 4,    # fact + orders + customer + nation reads
    "promo_share": 2,       # fact + part reads; share is in-plan
    "top_supplier": 2,      # fact + supplier reads; the max is in-plan
    "order_gini": 1,        # one orders read; classes² fold in-plan
    "length_moments": 1,
    "market_basket": 1,     # one lineitem read; order total in-plan
    "props_extract": 1,
    "bounce_rate": 1,
    "behavior_entropy": 1,
    "chao1_vocab": 1,
    "stylometry": 1,        # one docs read; grid is a literal local list
    "term_burstiness": 1,   # one docs read; N is in-plan (scalar_count)
    "ql_topk": 1,           # one docs read; |C| and ctf in-plan
    "rank_overlap": 2,      # the two ranking subplans each read docs once
    "value_histogram": 1,
    "keyness_llr": 1,       # corpus totals in-plan from the term relation
    "lexical_diversity": 1,  # pure scan+project, zero shuffles
    "rfm_segments": 1,       # one orders read; corpus max day in-plan
    "degree_correlation": 1,
    "cohort_overlap": 1,
    "weekly_profile": 1,
    "user_streaks": 1,
    "cms_heavy_hitters": 1,  # n_total is in-plan from the sketch, never a .count()
    "length_quantiles": 1,
    "weighted_sample": 1,
    "dsir_weights": 1,  # docs + target derive from ONE read
    "temperature_sample": 1,  # rates are in-plan, never collected
    "hash_split": 1,
    "anchor_text": 1,    # one docs read; N is in-plan (scalar_count)
    "prf_expansion": 1,  # one docs read; idf6/feedback set all in-plan
    "phrase_match": 1,   # positional joins all declared, no driver state
    "link_prediction": 1,  # edge recipe + degrees in-plan (scalar_count)
    "touch_attribution": 1,  # one events read; window bounds are literals
    "ndcg_eval": 1,      # one docs read; idf6/counts/discounts in-plan
    "large_orders": 3,   # fact + orders + customer reads
    "katz_centrality": 1,  # one docs read; 4 fixed rounds fully declared
    "cust_balance": 2,   # customer + orders reads; segment avg in-plan
    "late_supplier": 3,  # lineitem + orders + supplier reads
    "proximity_rank": 1,  # one docs read; window plane-sweep in-plan
    "mmr_rerank": 1,     # one embeddings read; probe broadcast, cache lazy
    "containment_pairs": 1,  # one docs read; prefix filter fully declared
    "boilerplate_shingles": 1,  # one docs read; source totals broadcast
    "selectivity_estimates": 1,  # one docs read; N in-plan (scalar_count)
    "vocab_pruning": 1,  # one docs read; grid is a local relation
    "oov_rate": 1,       # one docs read; vocab is a broadcast subplan
    "next_word": 1,      # one docs read; top-w1 set is a broadcast subplan
    "corpus_delta": 1,   # one docs read; v2 derives from the same scan
    "impact_quantization": 1,  # one docs read; N/avgdl/global-max in-plan
    "link_reciprocity": 1,     # one docs read; edges derive in-plan
    "bm25_b_sweep": 1,   # one docs read; b-grid is a local relation
    "cascade_overlap": 2,  # bm25 leg + stage-1 leg each read documents
    "novelty_curve": 1,  # one docs read; first-occurrence mins in-plan
    "prefix_complete": 1,  # one docs read; argmax over aggregated ctf
    "gap_histogram": 1,  # one docs read; log2 buckets via bin(), no libm
    "minhash_calibration": 1,  # one docs read; sketch + exact share the scan
    "standing_alerts": 1,  # one docs read; stored queries are local relations
    "hybrid_rrf": 2,  # bm25 leg reads documents, dense leg reads embeddings
    "query_clarity": 1,  # one docs read; query set is a local relation
    "tiered_index": 1,  # one docs read; tier cutoffs are literals
    "lang_divergence": 1,  # one docs read; lang-pair relation derives in-plan
    "crawl_schedule": 1,  # one docs read; fleet scalars ride in-plan
    # NOT listed (deliberately): pagerank, personalized_pagerank,
    # hits_scores, link_distance, label_propagation,
    # k_core, dedup_components, canonical_docs AND
    # semantic_dedup — iterative operators (semantic_dedup runs the same
    # star-contraction loop) whose driver-side loop materializes each
    # round during construction; under AQE every materialization is
    # several jobs and the round count is data-dependent, so an exact
    # count would be flaky. Their loop structure is covered by
    # test_graph / test_training_data instead.
}


def _formatted_plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.mark.parametrize("name", NO_EXPAND_QUERIES)
def test_no_expand_in_pair_plan(spark, name):
    plan = _formatted_plan(entry_mod.queries()[name](spark, SF_DIR))
    assert "Expand" not in plan, f"{name}: Expand node in plan\n{plan}"


# Scoring pairs join a tiny per-query stats/scalar dimension: that join must
# stay a broadcast (a shuffled sort-merge join here would shuffle the whole
# token relation to co-locate against a <= |query terms| row table).
BROADCAST_QUERIES = [
    "search_topk",
    "news_scoring",
    "bm25_topk",
    "fallback_search",
    # star-schema joins: every dimension side must broadcast
    "ship_priority",
    "nation_revenue",
    "returns_report",
    "promo_share",
]


@pytest.mark.parametrize("name", BROADCAST_QUERIES)
def test_scoring_pairs_broadcast_the_stats_dim(spark, name):
    plan = _formatted_plan(entry_mod.queries()[name](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
        f"{name}: stats/scalar dimension not broadcast\n{plan}"
    )
    assert "SortMergeJoin" not in plan, f"{name}: sort-merge join crept in\n{plan}"


@pytest.mark.parametrize("name", sorted(CONSTRUCTION_JOBS))
def test_pair_construction_runs_no_extra_jobs(spark, name):
    sc = spark.sparkContext
    group = f"construct-{name}"
    sc.setJobGroup(group, "pair construction must not scan data")
    try:
        entry_mod.queries()[name](spark, SF_DIR)
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    jobs = sc.statusTracker().getJobIdsForGroup(group)
    assert len(jobs) == CONSTRUCTION_JOBS[name], (
        f"{name}: {len(jobs)} construction jobs, expected "
        f"{CONSTRUCTION_JOBS[name]} (schema reads only — a driver-side "
        f".count()/.first() scalar adds a scan pass)"
    )


# ---------------------------------------------------------------------------
# Boundary fixture: one group mixes a 2^30-magnitude value (ulp ~2.4e-7)
# with twenty 1e-6 values, so the NAIVE double sum provably differs in the
# 6th decimal depending on accumulation order. The integer-scaled sums the
# pairs use must agree between engines AND with exact decimal arithmetic.
# ---------------------------------------------------------------------------
BIG = 1073741824.123456
TINY = 0.000001
EXACT_SUM = Decimal("1073741824.123456") + 20 * Decimal("0.000001")


def _boundary_events(spark, tmp_path):
    rows = []
    # group A: hazard values, all inside one hour / one session
    for i in range(21):
        rows.append(
            (i, f"2024-01-01 10:{i:02d}:00", 1, "click", BIG if i == 0 else TINY, "p")
        )
    # group B: plain values in another hour and user
    for i in range(5):
        rows.append((100 + i, f"2024-01-02 03:0{i}:00", 2, "view", 1.25, "p"))
    df = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, event_type string, value double, props string"
    ).select(
        "event_id",
        F.col("ts_s").cast("timestamp_ntz").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    path = str(tmp_path / "events.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    return str(tmp_path)


def _norm(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    def cell(v):
        if isinstance(v, float):
            return "nan" if math.isnan(v) else round(v, 6)
        return v
    return [cols[i] for i in order], sorted(
        tuple(cell(r[i]) for i in order) for r in rows
    )


def test_fixture_is_actually_order_hazardous():
    vals = [BIG] + [TINY] * 20
    fwd = 0.0
    for v in vals:
        fwd += v
    rev = 0.0
    for v in reversed(vals):
        rev += v
    assert round(fwd, 6) != round(rev, 6), (
        "fixture no longer exercises the rounding boundary"
    )
    assert round(rev, 6) == float(EXACT_SUM)


@pytest.mark.parametrize("name", ["events_hourly", "events_rollup", "event_sessions"])
def test_sum_value_boundary_proof(spark, tmp_path, name):
    sf_dir = _boundary_events(spark, tmp_path)
    sdf = entry_mod.queries()[name](spark, sf_dir)
    sc_cols, sc_rows = _norm(sdf.columns, [tuple(r) for r in sdf.collect()])

    con = duckdb.connect()
    # Spark writes a parquet DIRECTORY; glob the part files for DuckDB
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet/*.parquet'"
    )
    res = con.execute(entry_mod.oracle_sql()[name])
    d_cols, d_rows = _norm([d[0] for d in res.description], res.fetchall())

    assert sc_cols == d_cols
    assert sc_rows == d_rows, f"{name}: engines disagree on boundary fixture"

    # and both equal the exact decimal sum for the hazard group
    sums = {round(float(EXACT_SUM), 6), round(5 * 1.25, 6)}
    got = {r[sc_cols.index("sum_value")] for r in sc_rows}
    assert sums <= got, f"{name}: {got} missing exact sums {sums}"


# ---------------------------------------------------------------------------
# ntz_epoch_us: wall-clocks inside a DST spring-forward gap of the session
# timezone must still produce DuckDB's tz-less epoch_us. (The obvious
# cast-through-timestamp spellings shift these by 3600 s.)
# ---------------------------------------------------------------------------
DST_SENSITIVE = [
    "2024-03-10 02:30:00.123456",  # inside America/New_York spring-forward gap
    "2024-11-03 01:30:00.5",       # inside the fall-back overlap
    "2024-01-01 00:09:58.778549",
    "1999-12-31 23:59:59.999999",
]


def test_ntz_epoch_us_is_timezone_invariant(spark):
    from search_engine_spark.pair_helpers import ntz_epoch_us

    expected = [
        r[0]
        for r in duckdb.sql(
            "SELECT epoch_us(ts::TIMESTAMP) FROM (VALUES "
            + ", ".join(f"('{s}')" for s in DST_SENSITIVE)
            + ") t(ts)"
        ).fetchall()
    ]

    tz_sess = spark.newSession()
    for tz in ["UTC", "America/New_York", "Pacific/Auckland"]:
        tz_sess.conf.set("spark.sql.session.timeZone", tz)
        df = tz_sess.createDataFrame(
            [(s,) for s in DST_SENSITIVE], "s string"
        ).select(ntz_epoch_us(F.col("s").cast("timestamp_ntz")).alias("us"))
        got = [r["us"] for r in df.collect()]
        assert got == expected, f"tz={tz}: {got} != {expected}"


# ---------------------------------------------------------------------------
# Invariant 3 (session independence): the driver runs pairs under ITS OWN
# session — possibly non-UTC tz, ANSI on, 200 shuffle partitions. The
# time/float-sensitive pairs must match the oracle under those conditions,
# not just under the test session's defaults.
# ---------------------------------------------------------------------------
# Auto-derived per CLAUDE.md invariant 8: EVERY pair runs under the
# driver-like session (non-UTC tz, ANSI on, 200 shuffle partitions) — the
# conditions that caught r01's event_sessions HUGEINT bug and r03's
# hash_ring/shard_rebalance constant-shadowing break. Derived from
# queries() so a new pair is registered by construction; list exclusions
# here ONLY with a written justification (currently none).
DRIVERLIKE_EXCLUDE: set = set()
DRIVERLIKE_QUERIES = sorted(set(entry_mod.queries()) - DRIVERLIKE_EXCLUDE)


@pytest.fixture(scope="module")
def driverlike(spark):
    """Same JVM, separate session state with a DST-observing timezone and
    ANSI semantics — the conditions that broke r01's event_sessions."""
    s = spark.newSession()
    s.conf.set("spark.sql.session.timeZone", "America/New_York")
    s.conf.set("spark.sql.ansi.enabled", "true")
    s.conf.set("spark.sql.shuffle.partitions", "200")
    return s


@pytest.mark.parametrize("name", DRIVERLIKE_QUERIES)
def test_pair_matches_oracle_under_driverlike_session(driverlike, name):
    sdf = entry_mod.queries()[name](driverlike, SF_DIR)
    sc_cols, sc_rows = _norm(sdf.columns, [tuple(r) for r in sdf.collect()])

    con = duckdb.connect()
    for t in [
        "documents", "events", "embeddings",
        "lineitem", "orders", "customer", "supplier", "part",
        "nation", "region",
    ]:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    res = con.execute(entry_mod.oracle_sql()[name])
    d_cols, d_rows = _norm([d[0] for d in res.description], res.fetchall())

    assert sc_cols == d_cols
    assert sc_rows == d_rows, f"{name}: session-dependent divergence"


# ---------------------------------------------------------------------------
# Column pruning: scans must read only the columns the pair touches — a
# scan dragging the full document row for a 2-column projection wastes
# IO proportional to corpus width at 100 TB.
# ---------------------------------------------------------------------------
PRUNING_EXPECTATIONS = {
    # pair -> (must appear in some ReadSchema, must never appear in any)
    "exact_dedup": (["doc_id", "text"], ["url", "source", "fetched_at"]),
    "term_stats": (["doc_id", "text"], ["url", "source"]),
    "event_sessions": (["user_id", "ts", "value"], ["props"]),
    "events_hourly": (["event_type", "ts", "value"], ["props", "user_id"]),
    "sequence_packing": (["doc_id", "text"], ["lang", "source", "n_chars"]),
    # doc_id is selected then dropped before the aggregate — Catalyst
    # must prune it out of the scan entirely
    "corpus_mix_report": (["text", "lang", "source"], ["doc_id", "n_chars"]),
    # the returned plan joins the corpus ids against the (checkpointed)
    # component labels — the embedding scans live inside the CC stage's
    # eager construction, so the final plan must read ONLY vec_id
    "semantic_dedup": (["vec_id"], ["label", "embedding"]),
    # urls are injected from doc_id, so the scan must read doc_id alone
    "url_blocklist": (["doc_id"], ["text", "lang", "source", "n_chars"]),
    "lm_quality": (["doc_id", "text"], ["lang", "source", "n_chars"]),
    "lm_quality_by_lang": (["doc_id", "text", "lang"], ["source", "n_chars"]),
    "gopher_repetition": (["doc_id", "text"], ["lang", "source", "n_chars"]),
    "c4_rules": (["doc_id", "text"], ["lang", "source", "n_chars"]),
    "dedup_spans": (["doc_id", "text"], ["lang", "source", "n_chars"]),
    "bloom_dedup": (["doc_id", "text"], ["lang", "source", "n_chars"]),
    "tfidf_keywords": (["doc_id", "text"], ["lang", "source", "n_chars"]),
    "bigram_pmi": (["text"], ["doc_id", "lang", "source", "n_chars"]),
    "zipf_stats": (["lang", "text"], ["doc_id", "source", "n_chars"]),
    "embedding_diversity": (["label", "embedding"], ["vec_id"]),
    "dup_profile": (["lang", "text"], ["doc_id", "source", "n_chars"]),
    "readability": (["lang", "text"], ["doc_id", "source", "n_chars"]),
    "cohort_retention": (["user_id", "ts"], ["props", "value", "event_type"]),
    "triangle_counts": (["doc_id"], ["text", "lang", "source", "n_chars"]),
    "link_prediction": (["doc_id"], ["text", "lang", "source", "n_chars"]),
    "phrase_match": (["doc_id", "text"], ["lang", "source", "n_chars"]),
    "touch_attribution": (
        ["event_id", "ts", "user_id", "event_type", "value"],
        ["props"],
    ),
    "ndcg_eval": (["doc_id", "text"], ["lang", "source", "n_chars"]),
    "large_orders": (
        ["l_orderkey", "l_quantity", "c_name"],
        ["l_partkey", "l_suppkey", "l_shipdate", "o_orderpriority",
         "c_acctbal", "c_mktsegment"],
    ),
    "katz_centrality": (["doc_id"], ["text", "lang", "source", "n_chars"]),
    "cust_balance": (
        ["c_acctbal", "c_mktsegment", "o_orderstatus"],
        ["c_nationkey", "o_totalprice", "o_orderdate"],
    ),
    "late_supplier": (
        ["l_suppkey", "l_shipdate", "s_name"],
        ["l_quantity", "l_extendedprice", "o_totalprice", "s_nationkey"],
    ),
    "proximity_rank": (["doc_id", "text"], ["lang", "source", "n_chars"]),
    "mmr_rerank": (["vec_id", "embedding"], ["label"]),
    "source_overlap": (["source", "text"], ["doc_id", "lang", "n_chars"]),
    "event_funnel": (["user_id", "ts", "event_type"], ["props", "value"]),
    "events_anomaly": (["ts", "event_type"], ["props", "value", "user_id"]),
    "asof_join": (["event_id", "user_id", "event_type", "ts"], ["props", "value"]),
    "interval_join": (["event_id", "user_id", "event_type", "ts"], ["props", "value"]),
    "context_chunks": (["doc_id", "text"], ["lang", "source", "n_chars"]),
    "hll_distinct": (["text", "lang"], ["doc_id", "source", "n_chars"]),
    "cms_heavy_hitters": (["doc_id", "text"], ["lang", "source", "n_chars"]),
    "length_quantiles": (["text", "lang"], ["doc_id", "source", "n_chars"]),
    "weighted_sample": (["doc_id", "text"], ["lang", "source", "n_chars"]),
    "dsir_weights": (["doc_id", "text", "lang"], ["source", "n_chars"]),
    "temperature_sample": (["doc_id", "lang"], ["text", "source", "n_chars"]),
    "hash_split": (["doc_id"], ["text", "lang", "source", "n_chars"]),
    "postings_bytes": (["doc_id", "text"], ["lang", "source", "n_chars"]),
    "search_snippets": (["doc_id", "text"], ["lang", "source", "n_chars"]),
    "heaps_law": (["doc_id", "text"], ["lang", "source", "n_chars"]),
    "shard_balance": (["doc_id", "text"], ["lang", "source", "n_chars"]),
    "skipgram_pmi": (["text"], ["doc_id", "lang", "source", "n_chars"]),
    "pricing_summary": (
        ["l_returnflag", "l_quantity", "l_shipdate"],
        ["l_partkey", "l_suppkey", "l_linenumber", "l_orderkey"],
    ),
    "ship_priority": (
        ["l_orderkey", "o_orderpriority", "c_mktsegment"],
        ["l_partkey", "l_linenumber", "l_tax", "o_totalprice", "c_name"],
    ),
    "nation_revenue": (
        ["l_suppkey", "n_name", "r_name"],
        ["l_tax", "l_returnflag", "o_totalprice", "c_name", "s_name"],
    ),
    "returns_report": (
        ["l_returnflag", "c_name", "n_name"],
        ["l_partkey", "l_suppkey", "l_shipdate", "o_totalprice", "c_acctbal"],
    ),
    "promo_share": (
        ["l_shipdate", "p_type"],
        ["l_orderkey", "l_suppkey", "l_returnflag", "p_name", "p_brand"],
    ),
}


@pytest.mark.parametrize("name", sorted(PRUNING_EXPECTATIONS))
def test_pair_scans_prune_columns(spark, name):
    plan = _formatted_plan(entry_mod.queries()[name](spark, SF_DIR))
    schemas = [
        line.split("ReadSchema:", 1)[1]
        for line in plan.splitlines()
        if "ReadSchema:" in line
    ]
    assert schemas, plan
    wanted, banned = PRUNING_EXPECTATIONS[name]
    joined = " ".join(schemas)
    for col in wanted:
        assert f"{col}:" in joined, f"{name}: column {col} missing\n{joined}"
    for col in banned:
        assert f"{col}:" not in joined, (
            f"{name}: scan reads unneeded column {col}\n{joined}"
        )


@pytest.mark.parametrize("name", ["gopher_repetition", "c4_rules"])
def test_per_document_pairs_plan_shuffle_free(spark, name):
    """Per-document metric suites (Gopher A1.2 sorted-array folds, C4
    line/page rules) must plan as a pure scan+project chain: no Exchange,
    no Join, no explode-to-shuffle of a gram/line stream."""
    plan = _formatted_plan(entry_mod.queries()[name](spark, SF_DIR))
    for node in ("Exchange", "Join", "Generate"):
        assert node not in plan, f"{name}: {node} in plan\n{plan}"


def test_in_plan_scalar_count_reads_zero_columns(spark):
    """The broadcast COUNT(*) scalar (pair_helpers.scalar_count) must plan
    as a zero-column scan — the cheapest possible pass over the table."""
    plan = _formatted_plan(entry_mod.queries()["term_stats"](spark, SF_DIR))
    assert "ReadSchema: struct<>" in plan, plan


# ---------------------------------------------------------------------------
# Serialization-kind parity — the bug class that ate rounds 1 AND 2: the
# driver compares pandas-serialized frames, and a DuckDB HUGEINT column
# (e.g. any window-sum of INTEGER) arrives as float64 (11.0) while Spark
# emits int64 (11) — every value identical, hash mismatch. Guard the whole
# class: DESCRIBE every oracle (no execution needed), ban HUGEINT/UHUGEINT
# outright, and assert each column's pandas-serialization kind matches the
# Spark schema's kind column-by-column.
# ---------------------------------------------------------------------------
_DUCK_INT = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}
_BANNED_DUCK = {"HUGEINT", "UHUGEINT"}


def _duck_kind(t: str) -> str:
    t = t.strip().upper()
    if t.endswith("[]"):
        return "list"
    if t in _DUCK_INT:
        return "int"
    if t in {"DOUBLE", "FLOAT", "REAL"} or t.startswith("DECIMAL"):
        return "float"
    if t == "VARCHAR":
        return "str"
    if t == "BOOLEAN":
        return "bool"
    if t == "BLOB":
        return "bytes"
    if t.startswith("TIMESTAMP"):
        return "ts"
    if t == "DATE":
        return "date"
    return t


def _spark_kind(dt) -> str:
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        return "float"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.BinaryType):
        return "bytes"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "ts"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.ArrayType):
        return "list"
    return dt.simpleString()


@pytest.fixture(scope="module")
def ddb_all():
    # single source of truth for the driver's table list
    from test_driver_queries import TABLES

    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql()))
def test_oracle_types_serialize_like_spark(spark, ddb_all, name):
    described = ddb_all.execute(
        f"DESCRIBE {entry_mod.oracle_sql()[name]}"
    ).fetchall()
    duck_types = {row[0]: row[1] for row in described}
    for col, t in duck_types.items():
        assert t.strip().upper() not in _BANNED_DUCK, (
            f"{name}.{col} is {t}: DuckDB HUGEINT serializes as float64 "
            f"through pandas while Spark emits int64 — CAST it (the "
            f"event_sessions r01/r02 bug class)"
        )

    sdf = entry_mod.queries()[name](spark, SF_DIR)
    spark_types = {f.name: f.dataType for f in sdf.schema.fields}
    assert sorted(spark_types) == sorted(duck_types), (
        f"{name}: column sets differ {sorted(spark_types)} vs {sorted(duck_types)}"
    )
    for col in spark_types:
        sk, dk = _spark_kind(spark_types[col]), _duck_kind(duck_types[col])
        assert sk == dk, (
            f"{name}.{col}: Spark {spark_types[col].simpleString()} ({sk}) vs "
            f"DuckDB {duck_types[col]} ({dk}) — pandas serialization will differ"
        )


def test_ntz_epoch_us_sweep_vs_duckdb(spark):
    """200 seeded wall-clocks across 1970-2100 (plus both DST edges of
    America/New_York) must produce DuckDB's epoch_us under UTC and two
    DST-observing session timezones — the batch generalization of the
    fixed-case test above."""
    import random

    from search_engine_spark.pair_helpers import ntz_epoch_us

    rng = random.Random(20260817)
    stamps = [
        f"{rng.randint(1970, 2100):04d}-{rng.randint(1, 12):02d}-"
        f"{rng.randint(1, 28):02d} {rng.randint(0, 23):02d}:"
        f"{rng.randint(0, 59):02d}:{rng.randint(0, 59):02d}."
        f"{rng.randint(0, 999999):06d}"
        for _ in range(200)
    ] + ["2024-03-10 02:00:00.000001", "2024-11-03 01:59:59.999999"]

    expected = [
        r[0]
        for r in duckdb.sql(
            "SELECT epoch_us(ts::TIMESTAMP) FROM (VALUES "
            + ", ".join(f"('{s}')" for s in stamps)
            + ") t(ts)"
        ).fetchall()
    ]
    sess = spark.newSession()
    for tz in ["UTC", "America/New_York", "Australia/Lord_Howe"]:
        sess.conf.set("spark.sql.session.timeZone", tz)
        df = sess.createDataFrame([(s,) for s in stamps], "s string").select(
            ntz_epoch_us(F.col("s").cast("timestamp_ntz")).alias("us")
        )
        got = [r["us"] for r in df.collect()]
        assert got == expected, f"tz={tz}: first mismatch at {next(i for i,(a,b) in enumerate(zip(got,expected)) if a!=b)}"


# ---------------------------------------------------------------------------
# BPE merge exhaustion (ADVICE r03): a corpus whose vocabulary fuses to
# single symbols before BPE_MERGES_K steps must NOT zero out the oracle —
# each oracle merge CTE is a LEFT JOIN on its (possibly empty) 1-row
# argmax, passing `enc` through unchanged, exactly mirroring Spark's
# early-stopped rule list. All three BPE pairs share the CTE chain.
# ---------------------------------------------------------------------------
def _exhausted_bpe_docs(spark, tmp_path):
    # vocabulary {ab, cd}: step1 merges (a,b), step2 merges (c,d),
    # steps 3..8 find no adjacent pair anywhere
    rows = [
        (1, "ab ab cd", "en", "web", 8),
        (2, "ab cd", "de", "web", 5),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    path = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    return str(tmp_path)


@pytest.mark.parametrize("name", ["bpe_merges", "bpe_tokenize", "bpe_fertility"])
def test_bpe_pairs_survive_merge_exhaustion(spark, tmp_path, name):
    sf_dir = _exhausted_bpe_docs(spark, tmp_path)
    sdf = entry_mod.queries()[name](spark, sf_dir)
    sc_cols, sc_rows = _norm(sdf.columns, [tuple(r) for r in sdf.collect()])
    assert sc_rows, f"{name}: Spark side returned zero rows on tiny corpus"

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet/*.parquet'"
    )
    res = con.execute(entry_mod.oracle_sql()[name])
    d_cols, d_rows = _norm([d[0] for d in res.description], res.fetchall())

    assert sc_cols == d_cols
    assert sc_rows == d_rows, f"{name}: engines disagree after merge exhaustion"


# ---------------------------------------------------------------------------
# Invariant 8, statically: within a pair module no top-level name may be
# bound twice. Oracle SQL bakes constants at import while Spark-side q_*
# functions read them at call time, so a rebind silently desyncs every
# earlier pair using the name (the r03 hash_ring/shard_rebalance bug; a
# same-value duplicate of US_PER_HOUR_DIV also hid in the pre-split
# monolith). Sanctioned exception: the two-step ``X = X.format(...)``
# build, where the second binding's RHS reads the name itself.
# ---------------------------------------------------------------------------
def test_no_top_level_rebinding_in_pair_modules():
    import ast
    import glob
    import os

    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "search_engine_spark",
    )
    offenders = []
    for path in sorted(glob.glob(os.path.join(root, "driver_queries*.py"))):
        tree = ast.parse(open(path).read())
        seen: set = set()
        for stmt in tree.body:
            names, self_ref = [], False
            if isinstance(stmt, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                names = [stmt.name]
            elif isinstance(stmt, (ast.Import, ast.ImportFrom)):
                # an import binds a name too: `from x import C` followed by
                # `C = ...` rebinds a constant other modules' oracle SQL may
                # have baked — the exact desync class this lint exists for
                names = [
                    a.asname or a.name.split(".")[0]
                    for a in stmt.names
                    if a.name != "*"
                ]
            elif isinstance(stmt, ast.AnnAssign):
                if isinstance(stmt.target, ast.Name) and stmt.value is not None:
                    names = [stmt.target.id]
                    rhs_loads = {
                        n.id
                        for n in ast.walk(stmt.value)
                        if isinstance(n, ast.Name) and isinstance(n.ctx, ast.Load)
                    }
                    self_ref = stmt.target.id in rhs_loads
            elif isinstance(stmt, ast.Assign):
                for t in stmt.targets:
                    if isinstance(t, ast.Name):
                        names.append(t.id)
                    elif isinstance(t, ast.Tuple):
                        names.extend(
                            e.id for e in t.elts if isinstance(e, ast.Name)
                        )
                rhs_loads = {
                    n.id
                    for n in ast.walk(stmt.value)
                    if isinstance(n, ast.Name) and isinstance(n.ctx, ast.Load)
                }
                self_ref = any(n in rhs_loads for n in names)
            for n in names:
                if n in seen and not self_ref:
                    offenders.append(
                        f"{os.path.basename(path)}:{stmt.lineno}: {n}"
                    )
                seen.add(n)
    assert not offenders, (
        "top-level rebinding in pair modules (invariant 8): "
        + ", ".join(offenders)
    )


# ---------------------------------------------------------------------------
# Doc-count sync (r04 VERDICT task 7): the pair count stated in the docs
# must match len(queries()) — it drifted by one in three of four rounds
# when hand-typed. The full regeneration (incl. the collected-test count)
# is tools/gen_counts.py; this guard catches the cheap-to-check half at
# pytest time.
# ---------------------------------------------------------------------------
def test_doc_pair_counts_in_sync():
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    n = len(entry_mod.queries())
    for fname, pat in (
        ("CLAUDE.md", r"(\d+) Spark/DuckDB pairs"),
        ("COVERAGE.md", r"\*\*(\d+) pairs total\*\*"),
        ("README.md", r"(\d+) `queries\(\)`"),
    ):
        text = open(os.path.join(root, fname)).read()
        m = re.search(pat, text)
        assert m, f"{fname}: pair-count sentence not found ({pat})"
        assert int(m.group(1)) == n, (
            f"{fname} says {m.group(1)} pairs but queries() has {n} — "
            "run tools/gen_counts.py"
        )
