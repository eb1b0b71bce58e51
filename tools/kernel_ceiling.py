#!/usr/bin/env python
"""Workload-matched scaling ceiling: the extraction kernel standalone.

``scaling.py`` reports efficiency against a register-resident busy-loop
pool — the PURE-CPU upper ceiling, which over-states what any
memory-bandwidth-bound workload can reach on this shared socket. This
tool measures the realistic ceiling for the index-build job's dominant
work: ``extract.parse_page`` (regex/string HTML extraction, the same
kernel the Arrow UDF stages run) in a plain ``multiprocessing.Pool``
with NO Spark, NO Arrow, NO shuffle — so its N→4N speedup is what the
hardware grants this workload class, period. Any gap between this and
the Spark job's speedup is framework loss; r03/r04 measurements show
the Spark job MATCHES or exceeds it (BENCH.md §2).

Usage: python tools/kernel_ceiling.py            # levels from
       SPARK_GRAFT_SCALE_LEVELS (default 4,16), prints one JSON line
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

LEVELS = tuple(
    int(x)
    for x in os.environ.get("SPARK_GRAFT_SCALE_LEVELS", "4,16").split(",")
)
N_PAGES = int(os.environ.get("SPARK_GRAFT_KERNEL_PAGES", "40000"))
REPEATS = int(os.environ.get("SPARK_GRAFT_KERNEL_REPEATS", "3"))

_PAGES: list[tuple[str, str]] = []


def _init(pages: list[tuple[str, str]]) -> None:
    global _PAGES
    _PAGES = pages


def _work(span: tuple[int, int]) -> int:
    from search_engine_spark.corpus import FIXED_NOW
    from search_engine_spark.extract import parse_page

    lo, hi = span
    n = 0
    for url, html in _PAGES[lo:hi]:
        parse_page(url, html, FIXED_NOW)
        n += 1
    return n


def pages_fixture() -> list[tuple[str, str]]:
    from search_engine_spark.corpus import generate_pages

    return [
        (r.url, r.html.decode("utf-8", "replace"))
        for r in generate_pages(n_pages=N_PAGES, seed=42)
    ]


def throughput(workers: int, pages: list[tuple[str, str]]) -> float:
    chunk = max(1, len(pages) // (workers * 8))
    spans = [
        (i, min(i + chunk, len(pages)))
        for i in range(0, len(pages), chunk)
    ]
    best = 0.0
    with mp.Pool(workers, initializer=_init, initargs=(pages,)) as pool:
        pool.map(_work, spans[: workers * 2])  # warm imports
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            done = sum(pool.map(_work, spans))
            best = max(best, done / (time.perf_counter() - t0))
    return best


def main() -> None:
    pages = pages_fixture()
    n, n4 = LEVELS
    thr_n = throughput(n, pages)
    thr_n4 = throughput(n4, pages)
    print(
        json.dumps(
            {
                "metric": f"standalone extract kernel pages/s, {n} vs {n4} workers",
                "pages": N_PAGES,
                "workers": {str(n): round(thr_n, 1), str(n4): round(thr_n4, 1)},
                "kernel_speedup": round(thr_n4 / thr_n, 3),
                "kernel_efficiency": round(thr_n4 / thr_n / (n4 / n), 4),
            }
        )
    )


if __name__ == "__main__":
    main()
