#!/usr/bin/env python
"""Scaling-efficiency evidence: the same index-build job at N vs 4N cores.

The north_rule's two-cluster-size criterion (N and 4N executors, >=0.8
throughput scaling efficiency) cannot use a real cluster in this sandbox, so
this harness runs the identical job at two parallelism levels —
``local[8]`` and ``local[32]`` — on identical input and reports throughput
at both plus efficiency = (thr_4N / thr_N) / 4.

Measured job: the throughput-bound index-build stages (extract -> validate ->
exact-dedup -> tokenize -> compressed postings -> term stats), i.e. the
docs/sec metric named in BASELINE.json. PageRank is excluded here: its cost
is fixed-iteration graph-size-bound, not corpus-throughput-bound, and at
sandbox scale its 20 scheduling barriers are pure fixed overhead that would
measure the scheduler, not the job. Each level runs in its own subprocess
(one JVM cannot change master) and warms up JVM codegen + Arrow workers
before the clock starts.

Usage:  python scaling.py               # orchestrates both levels, prints JSON
        python scaling.py --inner 8     # one level (invoked by the outer run)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

LEVELS = (8, 32)
DEFAULT_PAGES = int(os.environ.get("SPARK_GRAFT_SCALE_PAGES", "8000"))


def run_inner(cpus: int, n_pages: int) -> None:
    from search_engine_spark.corpus import FIXED_NOW, generate_pages, pages_dataframe
    from search_engine_spark.operators.documents import build_documents
    from search_engine_spark.operators.fingerprints import exact_dedup
    from search_engine_spark.operators.postings import build_postings, n_shards_for
    from search_engine_spark.operators.term_stats import build_term_statistics
    from search_engine_spark.operators.tokens import build_tokens
    from search_engine_spark.session import get_spark

    spark = get_spark(
        f"scaling-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    def build(records) -> int:
        pages = pages_dataframe(spark, records).repartition(cpus).cache()
        pages.count()
        docs = exact_dedup(build_documents(pages, FIXED_NOW)).cache()
        n_docs = docs.count()
        tokens = build_tokens(docs)
        postings = build_postings(tokens, n_shards=n_shards_for(n_docs))
        postings.count()
        stats = build_term_statistics(tokens, docs)
        stats.count()
        pages.unpersist()
        docs.unpersist()
        return n_docs

    # warm-up: same stages, small corpus (JVM codegen + Python daemons)
    build(generate_pages(n_pages=400, seed=7))

    records = generate_pages(n_pages=n_pages, seed=42)
    t0 = time.perf_counter()
    n_docs = build(records)
    wall = time.perf_counter() - t0
    spark.stop()
    print(
        json.dumps(
            {
                "cpus": cpus,
                "pages": n_pages,
                "docs_indexed": n_docs,
                "wall_sec": round(wall, 3),
                "docs_per_sec": round(n_docs / wall, 2),
            }
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--inner", type=int, default=None)
    ap.add_argument("--pages", type=int, default=DEFAULT_PAGES)
    args = ap.parse_args()

    if args.inner:
        run_inner(args.inner, args.pages)
        return

    results = {}
    for cpus in LEVELS:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--inner", str(cpus),
             "--pages", str(args.pages)],
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
            check=False,
        )
        line = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
        if not line:
            print(json.dumps({"error": f"level {cpus} failed",
                              "stderr": proc.stderr[-2000:]}))
            sys.exit(1)
        results[cpus] = json.loads(line[-1])

    n, n4 = LEVELS
    thr_n = results[n]["docs_per_sec"]
    thr_4n = results[n4]["docs_per_sec"]
    eff = (thr_4n / thr_n) / (n4 / n)
    print(
        json.dumps(
            {
                "metric": "index-build scaling efficiency local[8] -> local[32]",
                "value": round(eff, 4),
                "unit": "efficiency",
                "levels": results,
                "speedup": round(thr_4n / thr_n, 3),
                "target": ">=0.8",
            }
        )
    )


if __name__ == "__main__":
    main()
