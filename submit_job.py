#!/usr/bin/env python
"""spark-submit entry point for the index build + query job.

Packaging contract (north_rule: "submitted via spark-submit --py-files"):

    zip -r /tmp/search_engine_spark.zip search_engine_spark
    spark-submit --master local[8] \
        --py-files /tmp/search_engine_spark.zip \
        submit_job.py --pages 2000 --out /tmp/idx --queries 3

On a cluster the same invocation takes ``--master yarn``/``k8s://...`` and
executor sizing flags; nothing in the package assumes local mode. The
driver creates its own SparkSession from the submit conf (no get_spark
defaults), proving the library runs under submitter-controlled config.

Prints one JSON line: build stage list, docs indexed, per-query top-1.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=2000)
    ap.add_argument("--out", required=True)
    ap.add_argument("--queries", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("search-engine-build").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from search_engine_spark.corpus import FIXED_NOW, generate_pages, pages_dataframe
    from search_engine_spark.pipeline.build import build_index, load_engines

    t0 = time.perf_counter()
    pages = pages_dataframe(spark, generate_pages(args.pages, seed=42))
    result = build_index(spark, pages, args.out, FIXED_NOW)
    n_docs = spark.read.parquet(f"{args.out}/documents").count()
    build_wall = time.perf_counter() - t0

    _, engine = load_engines(spark, args.out)
    stats = spark.read.parquet(f"{args.out}/term_statistics")
    terms = [
        r["term"]
        for r in stats.orderBy(F.desc("doc_frequency")).limit(args.queries).collect()
    ]
    hits = {}
    for t in terms:
        r = engine.search(t, 3, 0)
        hits[t] = r.results[0].url if r.results else None

    print(
        json.dumps(
            {
                "docs_indexed": n_docs,
                "build_wall_sec": round(build_wall, 2),
                "stages_run": result.stages_run,
                "stages_skipped": result.stages_skipped,
                "top_hits": hits,
                "scan_stats": engine.scan_stats(),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
