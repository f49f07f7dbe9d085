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


def streaming_lww(stream: DataFrame, *, key: str = "doc_id") -> DataFrame:
    """Apply the stateful LWW operator to a streaming DataFrame of change
    events ``(doc_id, seq, op, n_tok, source, tokens)``. Returns the
    update-mode stream of changed winners.

    The update function is a self-contained closure (pickled by VALUE):
    a module-level def would pickle by reference and require the sparkcdc
    package importable on every python worker, which plain drivers without
    ``spark-submit --py-files`` don't guarantee."""

    def lww_update(k, pdfs: Iterator[pd.DataFrame], state: GroupState):
        import pandas as _pd

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
        GroupStateTimeout.NoTimeout,
    )


def run_stateful_lww(
    spark,
    wal_path: str,
    *,
    checkpoint_dir: str,
    query_name: str = "lww_state",
    max_files_per_trigger: int = 4,
    allow_resume: bool = False,
) -> DataFrame:
    """Drain ``wal_path`` through the stateful operator into an in-memory
    sink (several triggers → cross-trigger state genuinely exercised) and
    return the FINAL winner set as a batch DataFrame.

    The update-mode memory sink accumulates every emitted revision; the
    final state is the max-seq row per key — resolved with the same
    lww_dedup used everywhere else.

    A REUSED checkpoint resumes the source where it left off, so the fresh
    memory sink only sees winners that changed since — an incremental
    changed-winner set, NOT the full final state (which lives in the state
    store). That is a different contract, so reuse raises unless
    ``allow_resume=True`` opts into the incremental semantics."""
    import os

    from .dedup import lww_dedup

    if not allow_resume and os.path.exists(os.path.join(checkpoint_dir, "offsets")):
        raise ValueError(
            f"checkpoint {checkpoint_dir!r} already has progress: the memory "
            "sink would only surface winners changed since the last drain. "
            "Pass allow_resume=True for that incremental contract, or use a "
            "fresh checkpoint_dir for the full final state."
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
