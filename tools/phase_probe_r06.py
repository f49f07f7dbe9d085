"""Round-6 session-2 measurement helper: per-batch phase breakdown of a
bench-shaped replay (2M events, 4 batches, cpus*2 buckets at sf0.1 scale).

Measurement tool only — bench.py stays frozen. Prints one JSON line with
per-batch phase timings (probe/write/footer) plus wall for each rep.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    n_events = int(os.environ.get("PHASE_EVENTS", "2000000"))
    batches = int(os.environ.get("PHASE_BATCHES", "4"))

    from sparkcdc.session import get_spark
    from sparkcdc.changelog import generate_changelog, write_log_parquet
    from sparkcdc.config import JobConfig
    from sparkcdc.engine import CDCEngine

    extra = {"spark.port.maxRetries": "64"}
    for kv in os.environ.get("PHASE_EXTRA_CONF", "").split(";"):
        if kv.strip():
            k, _, v = kv.partition("=")
            extra[k.strip()] = v.strip()
    spark = get_spark(app="sparkcdc-phase-probe", master=f"local[{cpus}]",
                      shuffle_partitions=cpus, driver_memory="24g", ui=False,
                      extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="sparkcdc-phase-")
    log_path = os.path.join(work, "wal")
    n_docs = max(n_events // 20, 1_000)

    # warm like bench.py does
    warm = os.path.join(work, "warm")
    write_log_parquet(generate_changelog(spark, 40_000, 2_000, seed=1),
                      os.path.join(warm, "wal"), partitions=8)
    CDCEngine(spark, JobConfig(log_path=os.path.join(warm, "wal"),
                               table_path=os.path.join(warm, "t"),
                               batch_size=20_000, n_buckets=cpus * 2)).run()

    log = generate_changelog(spark, n_events, n_docs, seed=42,
                             hot_key_pct=10, dup_pct=5,
                             num_partitions=cpus * 2)
    write_log_parquet(log, log_path, partitions=cpus * 2)

    out = []
    for i in range(reps):
        cfg = JobConfig(log_path=log_path,
                        table_path=os.path.join(work, f"tbl{i}"),
                        batch_size=max(n_events // batches, 1),
                        n_buckets=cpus * 2)
        eng = CDCEngine(spark, cfg)
        t0 = time.time()
        eng.run()
        wall = time.time() - t0
        phases = [
            {k: r.get(k) for k in ("probe_sec", "write_sec", "footer_sec",
                                   "duration_sec", "applied_events",
                                   "rows_written", "bytes_written", "merge_plan")}
            for r in eng.metrics.records if r.get("kind") == "batch"
        ]
        out.append({"wall": round(wall, 3), "batches": phases})
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
