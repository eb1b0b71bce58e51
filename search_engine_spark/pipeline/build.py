"""Full index-build DAG: pages -> every derived table, resumable.

Stage graph (reference pipeline order preserved — runner.py:36-52: dedup,
then link graph BEFORE pagerank; bm25 stats independent):

    pages ──extract/validate/dedup──> documents ─┬─> tokens ─┬─> term_statistics
                                                 │           └─> postings
                                                 ├─> fingerprints
                                                 └─> links_resolved ──> document_authority

Each stage writes parquet under ``out_root/<table>`` and appends lineage +
per-partition metrics to ``out_root/_checkpoints`` (checkpoints.py). A rerun
after any interruption skips committed stages whose fingerprints match —
kill-and-resume converges to byte-identical tables (tested).

Scale notes:
- postings are written ``partitionBy('term_bucket')`` so query IN-list scans
  partition-prune; at cluster scale this is an Iceberg table with a bucket
  transform — the parquet layout here is the same physical idea.
- ``n_shards`` defaults from corpus size (postings.n_shards_for).
- documents/tokens write through snappy parquet; all stage outputs are
  deterministic (no wall clock in data, stable doc ids), so resume at any
  parallelism yields identical bytes.
"""

from __future__ import annotations

import os
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession

from ..operators.documents import build_documents, latest_by_url
from ..operators.fingerprints import build_fingerprints, exact_dedup
from ..operators.link_graph import build_links_resolved
from ..operators.pagerank import build_document_authority
from ..operators.postings import build_postings, n_shards_for
from ..operators.term_stats import build_term_statistics
from ..operators.tokens import build_tokens
from ..sources.tableio import ParquetIO
from .checkpoints import CheckpointLog, fingerprint


@dataclass
class BuildResult:
    out_root: str
    tables: dict = field(default_factory=dict)
    stages_run: list = field(default_factory=list)
    stages_skipped: list = field(default_factory=list)

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.parquet(os.path.join(self.out_root, table))


def build_index(
    spark: SparkSession,
    pages: DataFrame,
    out_root: str,
    now: datetime,
    *,
    build_id: str = "default",
    dedup: bool = True,
    n_shards: int | None = None,
    n_term_buckets: int = 16,
    pagerank_iterations: int = 20,
) -> BuildResult:
    """Run (or resume) the full build. ``build_id`` + params + stage chain
    form the lineage fingerprints; rerunning with identical inputs is a no-op.
    """
    log = CheckpointLog(spark, out_root)
    result = BuildResult(out_root=out_root)
    base_params = {"build_id": build_id, "now": now.isoformat(), "dedup": dedup}
    # independent stages run CONCURRENTLY (r04: the DAG's sibling stages —
    # e.g. term_statistics and postings, both consumers of tokens — submit
    # their Spark jobs from separate threads, so one stage's scheduling /
    # commit / read-back tail overlaps the other's executor work; measured
    # worth ~10% wall at local[16] and more at wider parallelism, where
    # idle waves at stage boundaries cost proportionally more). The
    # checkpoint-log append is the ONE shared write path (a single parquet
    # directory in append mode, whose commit staging dir is not safe for
    # concurrent jobs) — serialized under a lock; stage outputs are
    # disjoint paths and need none.
    record_lock = threading.Lock()

    def run_stage(name: str, fp: str, producer, writer) -> str:
        out_path = os.path.join(out_root, name)
        if log.is_complete(name, fp, out_path):
            result.stages_skipped.append(name)
            result.tables[name] = out_path
            return out_path
        t0 = time.perf_counter()
        df = producer()
        writer(df, out_path)
        wall_ms = int((time.perf_counter() - t0) * 1000)
        out_df = spark.read.parquet(out_path)
        with record_lock:
            log.record(name, fp, out_df, rows_in=None, wall_ms=wall_ms)
        result.stages_run.append(name)
        result.tables[name] = out_path
        return out_path

    # all stage writes go through the storage seam (sources/tableio.py):
    # ParquetIO here; an Iceberg deployment swaps in IcebergIO, whose
    # replace() is createOrReplace on the catalog table
    io = ParquetIO(out_root)

    def plain_writer(df: DataFrame, path: str) -> None:
        io.replace(df, os.path.basename(path))

    # -- documents (extract + validate + dedup + scores) ----------------------
    fp_docs = fingerprint("documents", base_params, [])

    def make_documents() -> DataFrame:
        # upsert-by-url first (worker.py:200-214): re-crawled urls keep only
        # their latest snapshot
        d = build_documents(latest_by_url(pages), now)
        if dedup:
            d = exact_dedup(d)
        return d

    docs_path = run_stage("documents", fp_docs, make_documents, plain_writer)
    documents = spark.read.parquet(docs_path)
    # the doc count is needed only for wave-2 shard sizing — run it
    # overlapped with wave 1 instead of as a serial step between waves
    # (every fixed serial second costs a wide cluster proportionally more)
    _n_docs_box: dict[str, int] = {}
    _count_thread: threading.Thread | None = None
    if n_shards is None:
        _count_thread = threading.Thread(
            target=lambda: _n_docs_box.setdefault("n", documents.count())
        )
        _count_thread.start()

    # -- wave 1 (all depend on documents only): fingerprints || tokens ||
    # links_resolved — reference order (runner.py:36-52: dedup, then link
    # graph BEFORE pagerank) concerns the dedup->links->pagerank chain,
    # which the DAG dependencies preserve; siblings may overlap
    fp_fprints = fingerprint("document_fingerprints", base_params, [fp_docs])
    fp_tokens = fingerprint("tokens", base_params, [fp_docs])
    fp_links = fingerprint("links_resolved", base_params, [fp_docs])
    with ThreadPoolExecutor(3) as pool:
        f_fprints = pool.submit(
            run_stage,
            "document_fingerprints",
            fp_fprints,
            lambda: build_fingerprints(documents),
            plain_writer,
        )
        f_tokens = pool.submit(
            run_stage, "tokens", fp_tokens, lambda: build_tokens(documents), plain_writer
        )
        f_links = pool.submit(
            run_stage,
            "links_resolved",
            fp_links,
            lambda: build_links_resolved(documents),
            plain_writer,
        )
        tokens_path = f_tokens.result()
        links_path = f_links.result()
        f_fprints.result()
    tokens = spark.read.parquet(tokens_path)
    links = spark.read.parquet(links_path)

    # -- wave 2: term_statistics || postings (consumers of tokens) ||
    # pagerank (consumer of links) || spellcheck dictionary (documents)
    fp_stats = fingerprint("term_statistics", base_params, [fp_tokens])
    if n_shards is not None:
        shards = n_shards
    else:
        _count_thread.join()
        shards = n_shards_for(_n_docs_box["n"])
    fp_post = fingerprint(
        "postings",
        {**base_params, "n_shards": shards, "n_term_buckets": n_term_buckets},
        [fp_tokens],
    )
    fp_pr = fingerprint(
        "document_authority",
        {**base_params, "iterations": pagerank_iterations},
        [fp_docs, fp_links],
    )
    fp_dict = fingerprint("spellcheck_dictionary", base_params, [fp_docs])

    def make_dictionary() -> DataFrame:
        from ..spellcheck.service import build_dictionary

        return build_dictionary(documents)

    with ThreadPoolExecutor(4) as pool:
        futures = [
            pool.submit(
                run_stage,
                "term_statistics",
                fp_stats,
                lambda: build_term_statistics(tokens, documents),
                plain_writer,
            ),
            pool.submit(
                run_stage,
                "postings",
                fp_post,
                lambda: build_postings(
                    tokens, n_shards=shards, n_term_buckets=n_term_buckets
                ),
                lambda df, path: io.replace(
                    df, os.path.basename(path), partition_by=["term_bucket"]
                ),
            ),
            pool.submit(
                run_stage,
                "document_authority",
                fp_pr,
                lambda: build_document_authority(
                    documents, links, iterations=pagerank_iterations
                ),
                plain_writer,
            ),
            pool.submit(
                run_stage, "spellcheck_dictionary", fp_dict, make_dictionary, plain_writer
            ),
        ]
        for f in futures:
            f.result()

    # layout meta so readers (load_engines) use the same term_bucket
    # modulus for partition pruning as the writer did
    import json

    with open(os.path.join(out_root, "build_meta.json"), "w") as f:
        json.dump({"n_shards": shards, "n_term_buckets": n_term_buckets}, f)

    return result


def load_engines(
    spark: SparkSession,
    out_root: str,
    *,
    interactive: bool = False,
    pin_shard_layout: bool = False,
):
    """Convenience: open the built tables and return both search engines.

    A long-lived query service passes ``interactive=True`` (scoped
    serving configs around each search action) and
    ``pin_shard_layout=True`` (cache the postings in the shard-hash
    layout once at startup so every query's WAND stage skips the shard
    shuffle — see PostingsSearchEngine). Batch/one-shot callers keep the
    defaults: no cache is built, the parquet scans stay partition-pruned.
    """
    from ..query.postings_search import PostingsSearchEngine
    from ..query.search import SearchEngine

    documents = spark.read.parquet(os.path.join(out_root, "documents"))
    tokens = spark.read.parquet(os.path.join(out_root, "tokens"))
    stats = spark.read.parquet(os.path.join(out_root, "term_statistics"))
    postings = spark.read.parquet(os.path.join(out_root, "postings"))
    n_term_buckets = None
    meta_path = os.path.join(out_root, "build_meta.json")
    if os.path.exists(meta_path):
        import json

        with open(meta_path) as f:
            n_term_buckets = json.load(f).get("n_term_buckets")
    return (
        SearchEngine(documents, tokens, stats),
        PostingsSearchEngine(
            documents,
            postings,
            stats,
            n_term_buckets=n_term_buckets,
            interactive=interactive,
            pin_shard_layout=pin_shard_layout,
        ),
    )
