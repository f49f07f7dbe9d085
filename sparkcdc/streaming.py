"""Structured-Streaming front-end: tail the change-log directory as a file
stream and apply each micro-batch through the same MERGE sink.

The batch engine slices the log by LSN range on the driver; this variant
lets Spark's streaming source discover new files and drive the loop via
``foreachBatch`` (SURVEY.md §2.8 T1). Exactly-once still comes from the
icebox fence — the streaming checkpoint only provides source progress,
the table's (bucket, last_applied_lsn) lineage + batch_id fence make
re-delivered micro-batches no-ops, so the sink is idempotent under
checkpoint replay.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from .config import JobConfig
from .engine import CDCEngine


def run_streaming(
    spark: SparkSession,
    cfg: JobConfig,
    *,
    checkpoint_dir: str,
    available_now: bool = True,
) -> dict | tuple[StreamingQuery, CDCEngine]:
    """Tail cfg.log_path with a file-source stream; apply every micro-batch
    via the icebox MERGE.

    With ``available_now=True`` (default) the stream drains and engine
    metric totals are returned. With ``available_now=False`` the live
    ``(StreamingQuery, CDCEngine)`` pair is returned — await/stop the
    query yourself and read ``engine.metrics`` while it runs.

    Batch ids are namespaced by checkpoint: epoch ids restart at 0 with a
    FRESH checkpoint dir, so the fence id carries a run id derived from
    the checkpoint path. Restarting from the SAME checkpoint re-presents
    identical ids → replayed epochs are fenced as already-committed
    (exactly-once); pointing a NEW checkpoint at an existing table
    re-reads the whole log under fresh ids → every event re-applies as a
    no-op under LWW (idempotent full replay), never silent data loss."""
    import hashlib
    import os

    static = spark.read.parquet(cfg.log_path)
    engine = CDCEngine(spark, cfg, log_df=static)
    run_ns = hashlib.sha256(
        os.path.abspath(checkpoint_dir).encode()
    ).hexdigest()[:10]

    def apply(batch_df, epoch_id: int) -> None:
        changes = engine._maybe_evolve(batch_df)
        # unordered file delivery: no global LSN fence; deletes persist as
        # tombstones so late lower-seq updates cannot resurrect rows
        # cost-based write per micro-batch (mor=None): steady-state stream
        # batches are small relative to the table and land as MOR deltas;
        # the initial backfill batches go copy-on-write
        m = engine.table.merge(
            batch_df, f"stream-{run_ns}-epoch-{epoch_id}", seq_col=cfg.seq_col,
            op_col=cfg.op_col, ts_col=cfg.ts_col, fence=False, tombstones=True,
            mor=None,
        )
        engine.metrics.emit({"kind": "stream-batch", "epoch": epoch_id,
                             "schema_changes": changes, **m})
        if cfg.compact_delta_files is not None:
            n_delta = sum(
                1 for e in engine.table.snapshot["manifest"]
                if e.get("kind") == "delta"
            )
            if n_delta > cfg.compact_delta_files:
                engine.metrics.emit({"kind": "compact", **engine.table.compact()})

    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", "8")
        .parquet(cfg.log_path)
    )
    writer = (
        stream.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return engine.metrics.totals()
    return writer.start(), engine
