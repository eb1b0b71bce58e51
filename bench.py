#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line for the driver.

Measures:
- the headline operator queries (driver_queries registry) at
  $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
- full index-build throughput (docs/sec) over the synthetic pages corpus
- search latency p50 over a fixed query set against the built index

Run directly: ``python bench.py``. Parallelism comes from
``local[$SPARK_GRAFT_CPUS]`` (default 32); set SPARK_GRAFT_CPUS=8 for the
N-vs-4N scaling-efficiency evidence (see BENCH.md).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from search_engine_spark import driver_queries
from search_engine_spark.corpus import FIXED_NOW, generate_pages, pages_dataframe
from search_engine_spark.operators.documents import build_documents
from search_engine_spark.operators.postings import build_postings, n_shards_for
from search_engine_spark.operators.term_stats import build_term_statistics
from search_engine_spark.operators.tokens import build_tokens
from search_engine_spark.query.postings_search import PostingsSearchEngine
from search_engine_spark.query.search import SearchEngine
from search_engine_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_BENCH_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "4000"))


def _sf_from_dir(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    spark = get_spark(
        "bench", master=f"local[{CPUS}]", shuffle_partitions=max(CPUS, 8)
    )

    # warm up JVM/codegen AND the Python worker daemons (first Arrow stage
    # pays ~15s of worker spawning at local[32]; steady-state is what a
    # long-lived cluster sees)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql import types as T  # noqa: PLC0415

    def _noop(batches):
        for b in batches:
            yield pd.DataFrame({"x": b["id"]})

    warm = spark.range(CPUS * 4).repartition(CPUS)
    for _ in range(2):
        warm.mapInPandas(_noop, T.StructType([T.StructField("x", T.LongType())])).count()

    loadavg_start = os.getloadavg()
    queries: dict[str, float] = {}
    queries_run1: dict[str, float] = {}
    total = 0.0
    for name, fn in sorted(driver_queries.QUERIES.items()):
        # best-of-2: ambient VM noise varies identical runs up to 2x
        # (BENCH.md §2); the second pass also runs with warm file/page
        # caches, which is the steady state a long-lived cluster sees.
        # Both the first-run time (queries_run1 in extras) and the min are
        # recorded so cross-round A/B can tell variance (run1 moves, min
        # stable) from a real regression (both move) — r04 verdict task 6.
        best = float("inf")
        for attempt in range(2):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).collect()
            dt = time.perf_counter() - t0
            if attempt == 0:
                queries_run1[name] = round(dt, 4)
            best = min(best, dt)
        queries[name] = round(best, 4)
        total += best

    # --- index build throughput over the synthetic pages corpus -------------
    records = generate_pages(n_pages=N_BENCH_PAGES, seed=42)
    pages = pages_dataframe(spark, records).repartition(CPUS).cache()
    pages.count()  # materialize input before the clock starts

    # best-of-2 like the query section: the first pass pays JVM/codegen
    # compilation for the build operators and degraded-heap effects; a
    # System.gc() between passes restores steady state (BENCH.md §2)
    build_wall = float("inf")
    docs = tokens = stats = postings = None
    n_docs = 0
    for attempt in range(2):
        for df in (docs, tokens, stats, postings):
            if df is not None:
                df.unpersist()
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        docs = build_documents(pages, FIXED_NOW).cache()
        n_docs = docs.count()
        tokens = build_tokens(docs).cache()
        tokens.count()
        stats = build_term_statistics(tokens, docs).cache()
        stats.count()
        postings = build_postings(tokens, n_shards=n_shards_for(n_docs)).cache()
        postings.count()
        build_wall = min(build_wall, time.perf_counter() - t0)
    queries["index_build"] = round(build_wall, 4)
    total += build_wall
    docs_per_sec = n_docs / build_wall if build_wall > 0 else 0.0

    from pyspark.sql import functions as F  # noqa: PLC0415

    comp = postings.agg(
        F.sum(F.octet_length("postings")).alias("bytes"),
        F.sum("df").alias("n_postings"),
    ).first()
    bytes_per_posting = (
        comp["bytes"] / comp["n_postings"] if comp["n_postings"] else 0.0
    )

    # --- shallow-corpus search (pipeline-built 4k-page index) ----------------
    # Continuity entry: this is byte-for-byte what r01-r03 recorded as
    # "search_20q" (the 4k extract-pipeline corpus, where flat synthetic
    # tf makes every block max ~= the global max, so pruning cannot act
    # BY CONSTRUCTION). r04 renames it search_20q_shallow and moves the
    # HEADLINE search_20q + p50/p95 + decoded-fraction to the deep-list
    # corpus below, where block-max WAND has room to work (r03 verdict
    # task 3).
    spark._jvm.System.gc()
    # interactive=True scopes the query-service tuning (AQE off, small
    # shuffle partitioning) around each search() action; the session
    # configuration is untouched outside those scopes (r02 verdict item 2:
    # the old constructor-side mutation leaked a 4-partition/no-AQE profile
    # into the token-engine section below and tripled its time)
    engine = PostingsSearchEngine(
        docs, postings, stats, interactive=True, pin_shard_layout=True
    )
    token_engine = SearchEngine(docs, tokens, stats)
    stat_rows = stats.orderBy("term").limit(500).collect()
    by_df = sorted(stat_rows, key=lambda r: (-r["doc_frequency"], r["term"]))
    qset = [
        by_df[0]["term"],
        by_df[len(by_df) // 2]["term"],
        by_df[-1]["term"],
        f"{by_df[0]['term']} {by_df[1]['term']}",
        f"{by_df[2]['term']} {by_df[-2]['term']} {by_df[5]['term']}",
    ] * 4
    engine.search(qset[0], 20, 0)  # warm
    # best-of-2 like every other section (this was the only single-pass
    # measurement in r02; ambient variance hit it hardest)
    search_wall = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for q in qset:
            engine.search(q, 20, 0)
        search_wall = min(search_wall, time.perf_counter() - t0)
    queries["search_20q_shallow"] = round(search_wall, 4)
    total += search_wall

    # token-table engine on the same query set, for comparison
    token_engine.search(qset[0], 20, 0)  # warm
    tok_wall = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for q in qset:
            token_engine.search(q, 20, 0)
        tok_wall = min(tok_wall, time.perf_counter() - t0)
    queries["search_20q_tokens"] = round(tok_wall, 4)
    total += queries["search_20q_tokens"]

    # --- WAND at depth: the HEADLINE corpus ----------------------------------
    # The 4k extract-pipeline corpus above cannot show pruning: its flat
    # synthetic tf keeps every block max at the global max (r02 verdict
    # item 5), so since r04 the flagship search numbers come from THIS
    # section (r03 verdict task 3). It synthesizes a deep-list corpus
    # directly at the tokens level (pure JVM expressions — no
    # extract/tokenize cost), builds real postings, and measures the
    # fraction of blocks actually decoded over a query mix hitting the
    # Zipf-head lists. Sized so head terms span hundreds of blocks.
    # Corpus shape (mirrors what makes pruning work on real crawls):
    # 50 "common" terms (~14% of docs each, flat body tf — hundreds of
    # blocks per list) and 2000 "distinctive" terms CLUSTERED by doc-id
    # region (crawl-order ids cluster topically), carrying title hits.
    # A rare+common query fills the top-220 heap from the rare term's
    # region; outside it the common list's block maxima fall below theta
    # and whole block runs are skipped (or the scan terminates early).
    wand_docs = int(os.environ.get("SPARK_GRAFT_WAND_DOCS", "48000"))
    tokens_per_doc = 24
    region_size = wand_docs // 10
    from pyspark.sql import functions as F2  # noqa: PLC0415

    base = spark.range(wand_docs).select(F2.col("id").alias("doc_id"))
    docs_w = base.select(
        "doc_id",
        F2.concat(F2.lit("Doc "), "doc_id").alias("title"),
        F2.lit("synthetic deep-list corpus").alias("description"),
        F2.concat(F2.lit("https://w.example/"), "doc_id").alias("url"),
    ).cache()
    tok = base.select(
        "doc_id",
        F2.explode(F2.sequence(F2.lit(0), F2.lit(tokens_per_doc - 1))).alias("j"),
    )
    h = F2.xxhash64(F2.col("doc_id"), F2.col("j"))
    h2 = F2.xxhash64(F2.col("doc_id"), F2.col("j"), F2.lit(7))
    h3 = F2.xxhash64(F2.col("doc_id"), F2.col("j"), F2.lit(13))
    is_common = F2.pmod(h, F2.lit(10)) < 3
    region = F2.floor(F2.col("doc_id") / F2.lit(region_size)).cast("int")
    common_term = F2.concat(F2.lit("c"), F2.pmod(h2, F2.lit(50)))
    rare_term = F2.concat(
        F2.lit("r"), region, F2.lit("x"), F2.pmod(h2, F2.lit(200))
    )
    tokens_w = tok.select(
        "doc_id",
        F2.when(is_common, common_term).otherwise(rare_term).alias("term"),
        F2.when(is_common, F2.lit(4))
        .when(F2.pmod(h3, F2.lit(3)) == 0, F2.lit(1))  # rares hit titles
        .otherwise(F2.lit(4))
        .cast("short")
        .alias("field"),
        F2.when(
            is_common,
            F2.when(F2.pmod(h3, F2.lit(5)) == 0, F2.lit(2)).otherwise(F2.lit(1)),
        )
        .otherwise(F2.pmod(h3, F2.lit(3)) + 1)
        .cast("int")
        .alias("frequency"),
    )
    t0 = time.perf_counter()
    # ONE shard, deliberately: sequential range ids all fall in a single
    # doc-range bucket anyway (shard_col buckets the full u64 space), and
    # the section measures PER-SHARD WAND depth — the per-task unit at
    # scale, where each 4M-doc shard runs exactly this loop. Shard
    # parallelism is exercised by the main search section and the
    # shard-count-invariance tests.
    postings_w = build_postings(tokens_w, n_shards=1).cache()
    postings_w.count()
    from search_engine_spark.pair_helpers import doc_frequencies  # noqa: PLC0415

    dfd = F2.col("doc_frequency").cast("double")
    stats_w = (
        doc_frequencies(tokens_w)
        .withColumn(
            "idf",
            F2.log((F2.lit(float(wand_docs)) - dfd + 0.5) / (dfd + 0.5) + 1.0),
        )
        .cache()
    )
    stats_w.count()
    queries["wand_depth_build"] = round(time.perf_counter() - t0, 4)
    total += queries["wand_depth_build"]

    deep_engine = PostingsSearchEngine(
        docs_w, postings_w, stats_w, interactive=True, pin_shard_layout=True
    )

    # --- HEADLINE search: 20 queries over the deep-list corpus ---------------
    # The flagship latency + pruning record (r03 verdict task 3): rare+
    # common pairs across doc-id regions (theta fills from the rare term's
    # region, then whole common-list block runs fall below the block max
    # and are skipped), three-term conjunctions, rare-only probes, and
    # pure-common queries (which decode ~all their blocks — the honest
    # part of the mix). 10 distinct queries x 2 passes; p50/p95 and the
    # blocks-decoded fraction reported from THIS set.
    headline_qset = [
        "r2x5 c0", "r5x17 c1", "r7x3 c2 c3", "r1x9 c4", "c0",
        "r3x11 c5", "r8x2 c6", "r4x7 c7 c8", "r6x13 c9", "c1",
    ] * 2
    deep_engine.search(headline_qset[0], 20, 0)  # warm (also counted in
    # the decode fraction — every pass exercises the same pruning)
    search_wall = float("inf")
    lat: list[float] = []
    for _ in range(2):
        pass_lat = []
        t0 = time.perf_counter()
        for q in headline_qset:
            s = time.perf_counter()
            deep_engine.search(q, 20, 0)
            pass_lat.append(time.perf_counter() - s)
        wall = time.perf_counter() - t0
        if wall < search_wall:
            search_wall, lat = wall, pass_lat
    queries["search_20q"] = round(search_wall, 4)
    total += search_wall
    # snapshot BEFORE the continuity set below so the headline fraction
    # is attributable to the headline queries alone
    headline_stats = deep_engine.scan_stats()

    # continuity entry: r03's 10-query deep set, unchanged
    deep_qset = ["r2x5 c0", "r5x17 c1", "r7x3 c2 c3", "r1x9 c4", "c0"] * 2
    deep_wall = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for q in deep_qset:
            deep_engine.search(q, 20, 0)
        deep_wall = min(deep_wall, time.perf_counter() - t0)
    queries["search_10q_deep"] = round(deep_wall, 4)
    total += queries["search_10q_deep"]
    deep_stats = deep_engine.scan_stats()
    docs_w.unpersist()
    postings_w.unpersist()
    stats_w.unpersist()

    # --- end-to-end curation pipeline (training-data headline) --------------
    # The composed pipeline the per-pair sections exercise piecewise:
    # url blocklist -> exact dedup -> C4 line dedup -> quality gate ->
    # Gopher repetition gate -> language gate -> ExactSubstr span dedup ->
    # MinHash-LSH near-dup + CC -> benchmark decontamination -> domain cap
    # -> PII redaction, with a per-stage audit (every drop attributable).
    # The full Gopher A1.1 gate and C4 page rules are excluded HERE only
    # because the synthetic word-soup corpus fails their English-specific
    # rules (stop-word kinds, terminal punctuation) outright — both are
    # pair-benched on their own. Single pass (the pair sections above
    # already warmed the same operator codegen). r05: the dominant cost
    # was never orchestration — profiling showed gopher_repetition's
    # A1.2 metrics at 75% of the wall, 5x-inflated by filter-predicate
    # inlining (no subexpression elimination) on one AQE-coalesced
    # partition; both fixed in curate_corpus (see pipeline.py).
    from search_engine_spark.training_data.pipeline import curate_corpus  # noqa: PLC0415

    spark._jvm.System.gc()
    docs_c = spark.read.parquet(f"{SF_DIR}/documents.parquet").withColumn(
        "url",
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".example.com/d/"),
            F.col("doc_id").cast("string"),
        ),
    )
    cur_langs = tuple(
        r["lang"] for r in docs_c.select("lang").distinct().collect()
    )
    blocklist = spark.createDataFrame(
        [("src19.example.com",), ("ads.example.net",)], "domain string"
    )
    eval_docs = docs_c.filter(
        F.substring(
            F.md5(F.concat(F.lit("ev:"), F.col("doc_id").cast("string"))), 1, 2
        )
        == "00"
    ).select("doc_id", "text")
    n_cur_in = docs_c.count()
    t0 = time.perf_counter()
    kept_c, cur_report = curate_corpus(
        docs_c,
        languages=cur_langs,
        url_blocklist=blocklist,
        line_dedup=True,
        gopher_repetition_gate=True,
        redact_pii=True,
        span_dedup_n=20,
        eval_docs=eval_docs,
        domain_cap=200,
    )
    n_cur_kept = kept_c.count()
    cur_wall = time.perf_counter() - t0
    queries["curation_pipeline"] = round(cur_wall, 4)
    total += cur_wall

    out = {
        "metric": "headline operator suite + index build + search (wall sec)",
        "value": round(total, 4),
        "unit": "sec",
        "queries": queries,
        "sf": _sf_from_dir(SF_DIR),
        "extras": {
            "cpus": CPUS,
            "bench_pages": N_BENCH_PAGES,
            # idle/contended marker: 1-min load average at suite start/end.
            # On this 32-vCPU VM, start-load >> 1 while the suite warms up
            # means another job was running and cross-round per-entry
            # comparisons should be discounted (BENCH.md §2 variance).
            "loadavg_start_1m": round(loadavg_start[0], 2),
            "loadavg_end_1m": round(os.getloadavg()[0], 2),
            # first-run (cold-ish) time per pair, alongside the best-of-2
            # in "queries": variance shows as run1-only movement
            "queries_run1": queries_run1,
            # suite size: the wall total is only comparable across rounds
            # per-entry (r02 recorded 36 pairs, r03 records 100+)
            "n_entries": len(queries),
            "sec_per_entry": round(total / len(queries), 4) if queries else None,
            "index_build_docs_per_sec": round(docs_per_sec, 2),
            "postings_bytes_per_posting": round(bytes_per_posting, 2),
            # HEADLINE latency + pruning: the 20-query set over the
            # deep-list corpus (wand_deep_docs docs), where posting lists
            # span hundreds of blocks. decoded_fraction < 1.0 is the
            # block-max pruning at work: skipped blocks were never
            # deserialized.
            "search_p50_ms": round(statistics.median(lat) * 1000, 2),
            "search_p95_ms": round(sorted(lat)[int(len(lat) * 0.95) - 1] * 1000, 2),
            "wand_blocks_decoded_fraction": (
                round(headline_stats["decoded_fraction"], 4)
                if headline_stats["decoded_fraction"] is not None
                else None
            ),
            "wand_blocks_total": headline_stats["blocks_total"],
            "wand_deep_docs": wand_docs,
            # the 4k extract-pipeline corpus (search_20q_shallow): flat
            # synthetic tf keeps every block max at the global max, so
            # ~1.0 here is expected BY CONSTRUCTION — kept as the honest
            # no-pruning-possible control
            "wand_shallow_decoded_fraction": (
                round(engine.scan_stats()["decoded_fraction"], 4)
                if engine.scan_stats()["decoded_fraction"] is not None
                else None
            ),
            # cumulative deep-engine telemetry incl. the continuity set
            "wand_deep_blocks_total": deep_stats["blocks_total"],
            "wand_deep_decoded_fraction": (
                round(deep_stats["decoded_fraction"], 4)
                if deep_stats["decoded_fraction"] is not None
                else None
            ),
            "curation_docs_in": n_cur_in,
            "curation_docs_kept": n_cur_kept,
            "curation_kept_fraction": round(n_cur_kept / n_cur_in, 4)
            if n_cur_in
            else None,
            "curation_stages": len(cur_report.stages),
            "curation_docs_per_sec": round(n_cur_in / cur_wall, 2)
            if cur_wall > 0
            else None,
        },
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
