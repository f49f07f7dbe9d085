"""Round-6 session-2: dump per-stage metrics for one bench-shaped replay.

Measurement tool only. Prints stages (desc, tasks, runtime, input/shuffle)
for the last replay rep, sorted by executorRunTime.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_events = int(os.environ.get("PHASE_EVENTS", "2000000"))
    batches = int(os.environ.get("PHASE_BATCHES", "4"))

    from sparkcdc.session import get_spark
    from sparkcdc.changelog import generate_changelog, write_log_parquet
    from sparkcdc.config import JobConfig
    from sparkcdc.engine import CDCEngine

    spark = get_spark(app="sparkcdc-stage-probe", master=f"local[{cpus}]",
                      shuffle_partitions=cpus, driver_memory="24g", ui=True,
                      extra_conf={"spark.ui.retainedStages": "20000",
                                  "spark.port.maxRetries": "64"})
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="sparkcdc-stageprobe-")
    log_path = os.path.join(work, "wal")
    n_docs = max(n_events // 20, 1_000)

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

    # warm rep (not inspected), then the measured rep
    for i in range(2):
        cfg = JobConfig(log_path=log_path,
                        table_path=os.path.join(work, f"tbl{i}"),
                        batch_size=max(n_events // batches, 1),
                        n_buckets=cpus * 2)
        if i == 1:
            base = (f"{spark.sparkContext.uiWebUrl}/api/v1/applications/"
                    f"{spark.sparkContext.applicationId}/stages?status=complete")
            with urllib.request.urlopen(base, timeout=10) as r:
                marker = max((s["stageId"] for s in json.load(r)), default=-1)
        CDCEngine(spark, cfg).run()

    with urllib.request.urlopen(base, timeout=10) as r:
        stages = [s for s in json.load(r) if s["stageId"] > marker]
    stages.sort(key=lambda s: -s.get("executorRunTime", 0))
    for s in stages[:25]:
        print(json.dumps({
            "id": s["stageId"],
            "run_ms": s.get("executorRunTime"),
            "cpu_ms": round((s.get("executorCpuTime") or 0) / 1e6),
            "tasks": s.get("numCompleteTasks"),
            "in_mb": round((s.get("inputBytes") or 0) / 1e6, 1),
            "sh_r_mb": round((s.get("shuffleReadBytes") or 0) / 1e6, 1),
            "sh_w_mb": round((s.get("shuffleWriteBytes") or 0) / 1e6, 1),
            "out_mb": round((s.get("outputBytes") or 0) / 1e6, 1),
            "name": (s.get("name") or "")[:80],
        }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
