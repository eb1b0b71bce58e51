"""Per-stage checkpoint manifest: lineage + metrics + resume decisions.

north_rule: "resumable from checkpoint with per-partition lineage + metrics".
Design:

- every stage output is a parquet dir under the build root
- after a stage commits, one manifest row per output partition is appended to
  ``<root>/_checkpoints`` (stage, partition_id, input_fingerprint, rows_out,
  wall_ms, completed_at), plus a partition_id = -1 summary row with rows_in
- ``input_fingerprint`` chains: sha256(stage name + params + upstream
  fingerprints), so ANY upstream change invalidates downstream stages while
  an interrupted build resumes exactly where it stopped
- resume = skip the stage iff a summary manifest row exists with the same
  fingerprint AND the output dir has a _SUCCESS marker; otherwise recompute
  and overwrite (idempotent writes — reruns converge to the same bytes)

The reference's analog is much weaker: a work queue with status flags
(``crawl_queue``, queue_manager.py) and blind full-refresh batch jobs; this
gives deterministic stage-level resume with auditable lineage.
"""

from __future__ import annotations

import hashlib
import json
import os
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CHECKPOINT_DIR = "_checkpoints"

_MANIFEST_SCHEMA = (
    "stage string, partition_id int, input_fingerprint string, "
    "rows_in long, rows_out long, wall_ms long, completed_at timestamp"
)


def fingerprint(stage: str, params: dict, upstream: list) -> str:
    """Deterministic lineage hash for a stage invocation."""
    payload = json.dumps(
        {"stage": stage, "params": params, "upstream": sorted(upstream)},
        sort_keys=True,
        default=str,
    )
    return hashlib.sha256(payload.encode()).hexdigest()


class CheckpointLog:
    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root
        self.path = os.path.join(root, CHECKPOINT_DIR)

    def _manifest(self) -> DataFrame | None:
        if not os.path.exists(self.path):
            return None
        try:
            return self.spark.read.schema(_MANIFEST_SCHEMA).parquet(self.path)
        except Exception:
            return None

    def is_complete(self, stage: str, fp: str, out_path: str) -> bool:
        if not os.path.exists(os.path.join(out_path, "_SUCCESS")):
            return False
        m = self._manifest()
        if m is None:
            return False
        return (
            m.filter(
                (F.col("stage") == stage)
                & (F.col("input_fingerprint") == fp)
                & (F.col("partition_id") == -1)
            ).count()
            > 0
        )

    def record(
        self,
        stage: str,
        fp: str,
        out_df: DataFrame,
        rows_in: int | None,
        wall_ms: int,
    ) -> None:
        """Append per-partition metrics + a summary row for the stage."""
        per_part = [
            (stage, int(r["pid"]), fp, None, int(r["rows"]), wall_ms)
            for r in out_df.groupBy(
                F.spark_partition_id().alias("pid")
            )
            .agg(F.count(F.lit(1)).alias("rows"))
            .collect()
        ]
        total_out = sum(p[4] for p in per_part)
        rows = per_part + [(stage, -1, fp, rows_in, total_out, wall_ms)]
        now = datetime.now(timezone.utc).replace(tzinfo=None)
        df = self.spark.createDataFrame(
            [(s, p, f, ri, ro, w, now) for (s, p, f, ri, ro, w) in rows],
            schema=_MANIFEST_SCHEMA,
        )
        df.coalesce(1).write.mode("append").parquet(self.path)

    def stage_rows(self, stage: str) -> list:
        m = self._manifest()
        return [] if m is None else m.filter(F.col("stage") == stage).collect()
