"""Custom stateful streaming operator: cross-trigger last-writer-wins via
``applyInPandasWithState`` (Arrow-batched, no per-row Python on the hot
path — the batch loop below touches ONE candidate row per Arrow batch).

The batch engine achieves LWW through the icebox MERGE + fence; this is
the pure-streaming form the north rule's operator surface asks for: the
per-key winner lives in Spark's streaming state store (HDFS/RocksDB-backed
on a real cluster), survives across triggers AND restarts via the
checkpoint, and each trigger emits only the keys whose winner changed
(update semantics). Late or duplicate delivery loses against the stored
max-seq exactly like the MERGE path.

Reference seed: the retry-induced duplicate pages the reference tolerates
by being append-only (client/JiraClient.java:94-147) — a stateful sink
must instead resolve them, which this operator does incrementally.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# state = current winner (payload kept whole so restarts emit full rows)
STATE_SCHEMA = "seq bigint, op string, n_tok int, source string, tokens array<int>"
OUTPUT_SCHEMA = (
    "doc_id string, seq bigint, op string, n_tok int, source string, tokens array<int>"
)


def streaming_lww(
    stream: DataFrame, *, key: str = "doc_id", state_ttl_ms: int | None = None
) -> DataFrame:
    """Apply the stateful LWW operator to a streaming DataFrame of change
    events ``(doc_id, seq, op, n_tok, source, tokens)``. Returns the
    update-mode stream of changed winners.

    ``state_ttl_ms`` bounds state-store growth: a key idle longer than the
    TTL is evicted (processing-time timeout). At 10^10 doc_ids the state
    store cannot hold every key forever; eviction is SAFE whenever the
    downstream sink fences late events older than the TTL (the icebox LSN
    fence) — an evicted key's next event simply re-seeds state and is
    re-emitted, and the sink's own LWW/fence absorbs the re-emission.

    The update function is a self-contained closure (pickled by VALUE):
    a module-level def would pickle by reference and require the sparkcdc
    package importable on every python worker, which plain drivers without
    ``spark-submit --py-files`` don't guarantee."""

    ttl = state_ttl_ms

    def lww_update(k, pdfs: Iterator[pd.DataFrame], state: GroupState):
        import pandas as _pd

        if state.hasTimedOut:
            for _ in pdfs:  # Arrow protocol: the batch iterator must drain
                pass
            state.remove()  # idle key evicted — bounds the state store
            return
        best = tuple(state.get) if state.exists else None
        best_seq = int(best[0]) if best else -1
        changed = False
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            row = pdf.loc[pdf["seq"].astype("int64").idxmax()]
            seq = int(row["seq"])
            if seq > best_seq:
                best_seq = seq
                n_tok = None if _pd.isna(row["n_tok"]) else int(row["n_tok"])
                toks = row["tokens"]
                if toks is None or (isinstance(toks, float) and _pd.isna(toks)):
                    toks = None
                else:
                    toks = [int(x) for x in toks]
                best = (seq, row["op"], n_tok, row["source"], toks)
                changed = True
        if changed:
            state.update(best)
        if ttl is not None and state.exists:
            state.setTimeoutDuration(ttl)
        if changed:
            yield _pd.DataFrame(
                [
                    {
                        "doc_id": k[0],
                        "seq": best[0],
                        "op": best[1],
                        "n_tok": best[2],
                        "source": best[3],
                        "tokens": best[4],
                    }
                ]
            )

    return stream.groupBy(key).applyInPandasWithState(
        lww_update,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl is not None
        else GroupStateTimeout.NoTimeout,
    )


def run_stateful_lww(
    spark,
    wal_path: str,
    *,
    checkpoint_dir: str,
    query_name: str = "lww_state",
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """Drain ``wal_path`` through the stateful operator into an in-memory
    sink (several triggers → cross-trigger state genuinely exercised) and
    return the FINAL winner set as a batch DataFrame.

    The update-mode memory sink accumulates every emitted revision; the
    final state is the max-seq row per key — resolved with the same
    lww_dedup used everywhere else.

    A REUSED checkpoint cannot work here at all: Spark's memory sink does
    not support checkpoint recovery, and even if it did, the fresh sink
    would only see winners changed since the last drain — not the full
    final state (which lives in the state store). Reuse therefore raises;
    for a resumable/continuous pipeline feed ``streaming_lww`` into your
    own recoverable sink (e.g. foreachBatch), as `streaming.run_streaming`
    does for the merge path."""
    import os

    from .dedup import lww_dedup

    if os.path.exists(os.path.join(checkpoint_dir, "offsets")):
        raise ValueError(
            f"checkpoint {checkpoint_dir!r} already has progress: the memory "
            "sink cannot recover from a checkpoint and would surface only an "
            "incremental changed-winner set. Use a fresh checkpoint_dir (full "
            "drain) or wire streaming_lww into a recoverable sink."
        )
    static = spark.read.parquet(wal_path)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(wal_path)
    )
    q = (
        streaming_lww(stream)
        .writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return lww_dedup(spark.table(query_name), key="doc_id", seq="seq")


def run_stateful_lww_to_table(
    spark,
    wal_path: str,
    *,
    table_path: str,
    checkpoint_dir: str,
    n_buckets: int = 16,
    max_files_per_trigger: int = 4,
    max_batches: int | None = None,
    state_ttl_ms: int | None = None,
    cfg=None,
):
    """The RECOVERABLE form: drain ``wal_path`` through the stateful LWW
    operator and foreachBatch its update stream into an icebox table —
    the full streaming pipeline the memory-sink variant documents as the
    production path.

    Exactly-once under restart comes from BOTH layers composing:
      * the streaming checkpoint replays an interrupted epoch with the
        SAME epoch id → the icebox batch_id fence skips the re-commit;
      * each trigger emits only changed winners (update mode), and the
        merge applies them in unordered mode (fence=False, tombstones) so
        a re-emitted winner after state re-seed loses LWW instead of
        corrupting state.
    A mid-stream kill + restart from the same checkpoint therefore
    converges to the identical table state as an uninterrupted run (and
    as the batch engine over the same WAL) — pinned by
    test_stateful_lww_into_icebox_sink_with_restart.

    ``max_batches`` stops the query after N triggers WITHOUT draining
    (simulates a mid-stream kill in tests). Passing a validated
    ``JobConfig`` as ``cfg`` sources the trigger size (and table layout)
    from its streaming knobs instead of the keyword defaults. Returns the
    IceboxTable.
    """
    if cfg is not None:
        max_files_per_trigger = cfg.stream_max_files_per_trigger
        n_buckets = cfg.n_buckets
    import pyspark.sql.types as T

    from .icebox import IceboxTable

    if IceboxTable.exists(table_path):
        table = IceboxTable.load(spark, table_path)
    else:
        payload = T.StructType(
            [
                T.StructField("doc_id", T.StringType()),
                T.StructField("tokens", T.ArrayType(T.IntegerType())),
                T.StructField("n_tok", T.IntegerType()),
                T.StructField("source", T.StringType()),
            ]
        )
        table = IceboxTable.create(
            spark, table_path, payload, key="doc_id", n_buckets=n_buckets
        )
    import hashlib
    import os as _os

    run_ns = hashlib.sha256(
        _os.path.abspath(checkpoint_dir).encode()
    ).hexdigest()[:10]
    seen = {"n": 0}

    def apply(batch_df, epoch_id: int) -> None:
        table.merge(
            batch_df,
            f"state-{run_ns}-epoch-{epoch_id}",
            seq_col="seq",
            op_col="op",
            fence=False,
            tombstones=True,
            mor=None,
        )
        seen["n"] += 1

    static = spark.read.parquet(wal_path)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(wal_path)
    )
    q = (
        streaming_lww(stream, state_ttl_ms=state_ttl_ms)
        .writeStream.foreachBatch(apply)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if max_batches is None:
        q.awaitTermination()
    else:
        import time as _time

        while q.isActive and seen["n"] < max_batches:
            _time.sleep(0.2)
        q.stop()
        q.awaitTermination()
    return table
