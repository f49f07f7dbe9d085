"""The micro-batch apply loop — the engine's `transaction()`/`run()`
(SURVEY.md §3.1). The reference's sequential page loop
(/root/reference/src/main/java/org/embulk/input/jira/JiraInputPlugin.java:139-168)
becomes: plan LSN ranges on the driver, and for each range
scan → (evolve schema) → LWW dedup → MERGE commit → lineage advance,
with Spark providing all intra-batch parallelism.

Exactly-once: the icebox commit carries the lineage checkpoint and the
batch_id fence atomically, so a re-run after any failure (driver retry,
executor kill, whole-process kill) resumes from the last committed
snapshot and re-applies only uncommitted ranges; re-commits are no-ops.
"""

from __future__ import annotations

import datetime
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .changelog import max_seq, scan_slice
from .config import ConfigError, JobConfig
from .icebox import IceboxTable
from .metrics import MetricsLog
from .schema_infer import detect_evolution

PREVIEW_RECORDS_COUNT = 10  # Constant.java:8


def default_table_schema(log_schema: T.StructType, cfg: JobConfig) -> T.StructType:
    """Target schema = log payload columns (everything but op/seq/ts)."""
    skip = {cfg.seq_col, cfg.op_col, cfg.ts_col}
    return T.StructType([T.StructField(f.name, f.dataType, True)
                         for f in log_schema.fields if f.name not in skip])


class CDCEngine:
    def __init__(self, spark: SparkSession, cfg: JobConfig, log_df: DataFrame | None = None):
        self.spark = spark
        self.cfg = cfg.validate()
        if log_df is None:
            from .changelog import read_log

            cfg.check_source()
            log_df = read_log(spark, cfg.log_path, fmt=cfg.log_format)
        self.log = log_df
        if IceboxTable.exists(cfg.table_path):
            self.table = IceboxTable.load(spark, cfg.table_path)
        else:
            schema = default_table_schema(self.log.schema, cfg)
            self.table = IceboxTable.create(
                spark, cfg.table_path, schema, key=cfg.key, n_buckets=cfg.n_buckets
            )
        self.metrics = MetricsLog(cfg.table_path)

    # ---------------- planning ----------------

    def plan_batches(self) -> list[tuple[int, int]]:
        """LSN ranges still to apply — the ceil(total/page_size) analog
        (util/JiraUtil.java:43-46), resumed from the checkpoint."""
        last = int(self.table.lineage["last_applied_lsn"])
        hi = max_seq(self.log)
        b = self.cfg.batch_size
        return [(lo, min(lo + b, hi)) for lo in range(last, hi, b)]

    # ---------------- evolution ----------------

    def _maybe_evolve(self, batch: DataFrame) -> list[str]:
        ignore = {self.cfg.seq_col, self.cfg.op_col, self.cfg.ts_col}
        evolved, changes = detect_evolution(self.table.schema, batch.schema, ignore=ignore)
        if evolved is not None:
            self.table.update_schema(evolved)
        return changes

    # ---------------- apply ----------------

    def apply_batch(self, lo: int, hi: int) -> dict:
        t0 = time.time()
        batch = scan_slice(self.log, lo, hi)
        changes = self._maybe_evolve(batch)
        batch_id = f"b-{lo}-{hi}"
        attempt, wait = 0, self.cfg.retry_initial_wait_sec
        while True:
            try:
                m = self.table.merge(
                    batch, batch_id, seq_col=self.cfg.seq_col,
                    op_col=self.cfg.op_col, ts_col=self.cfg.ts_col,
                    mor=(self.cfg.merge_mode == "mor"),
                )
                break
            except ConfigError:
                raise  # non-retryable, like non-retryable HTTP 4xx (JiraClient.java:128-147)
            except Exception:
                attempt += 1
                if attempt > self.cfg.retry_limit:
                    raise
                time.sleep(min(wait, self.cfg.retry_max_wait_sec))
                wait *= 2  # exponential backoff (JiraInputPlugin.java:69-75)
        dur = time.time() - t0
        # watermark lag from the merge's probe action (no extra scan)
        mts = m.get("max_event_ts")
        lag = (
            time.time() - datetime.datetime.fromisoformat(mts).replace(
                tzinfo=datetime.timezone.utc).timestamp()
            if mts
            else None
        )
        per_bucket_rate = {
            b: (n / dur if dur else 0.0)
            for b, n in m.get("per_bucket_applied", {}).items()
        }
        rec = {
            "kind": "batch",
            "lo": lo,
            "hi": hi,
            "per_bucket_events_per_sec": per_bucket_rate,
            "scanned_events": hi - lo,
            "duration_sec": dur,
            # headline metric: change-events processed end-to-end per sec
            "events_per_sec": ((hi - lo) / dur) if dur else 0.0,
            "applied_per_sec": (m.get("applied_events", 0) / dur) if dur else 0.0,
            "watermark_lag_sec": lag,
            **m,
        }
        return self.metrics.emit(rec)

    def run(self, max_batches: int | None = None) -> dict:
        """Apply all pending ranges (resumable at any point)."""
        plan = self.plan_batches()
        if max_batches is not None:
            plan = plan[:max_batches]
        for i, (lo, hi) in enumerate(plan, 1):
            self.apply_batch(lo, hi)
            if self.cfg.compact_every and i % self.cfg.compact_every == 0:
                self.metrics.emit({"kind": "compact", **self.table.compact()})
        return self.metrics.totals()

    # ---------------- preview (JiraInputPlugin.java:149-152) ----------------

    def preview(self, n: int = PREVIEW_RECORDS_COUNT) -> DataFrame:
        last = int(self.table.lineage["last_applied_lsn"])
        return scan_slice(self.log, last, last + self.cfg.batch_size).orderBy(
            self.cfg.seq_col
        ).limit(n)

    def read_table(self) -> DataFrame:
        return self.table.read()

    # ---------------- guess (JiraInputPlugin.java:170-191) ----------------

    def guess(self, sample_n: int = 50) -> list[dict]:
        """Infer column specs from a log sample — the reference's third
        entry point, over the flattened payload."""
        from .schema_infer import guess_columns

        return guess_columns(self.log.limit(sample_n), sample_n=sample_n)
