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

from .config import JobConfig
from .engine import CDCEngine


def run_streaming(
    spark: SparkSession,
    cfg: JobConfig,
    *,
    checkpoint_dir: str,
    available_now: bool = True,
) -> dict:
    """Tail cfg.log_path with a file-source stream; apply every micro-batch
    via the icebox MERGE. Returns engine metric totals after the stream
    drains (available_now) — for a continuous tail pass available_now=False
    and manage the returned query yourself."""
    static = spark.read.parquet(cfg.log_path)
    engine = CDCEngine(spark, cfg, log_df=static)

    def apply(batch_df, epoch_id: int) -> None:
        changes = engine._maybe_evolve(batch_df)
        # unordered file delivery: no global LSN fence; deletes persist as
        # tombstones so late lower-seq updates cannot resurrect rows
        m = engine.table.merge(
            batch_df, f"stream-epoch-{epoch_id}", seq_col=cfg.seq_col, op_col=cfg.op_col,
            fence=False, tombstones=True,
        )
        engine.metrics.emit({"kind": "stream-batch", "epoch": epoch_id,
                             "schema_changes": changes, **m})

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
    writer.start()
    return engine.metrics.totals()
