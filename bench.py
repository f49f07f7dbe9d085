"""Benchmark harness. Runs the headline workloads at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value" (total sec), "unit", "queries" {name: sec},
"sf", plus events/sec fields for the CDC replay headline}.

The CDC replay is the BASELINE.json metric: change-events/sec applied
end-to-end through scan → LWW dedup → icebox MERGE commit → lineage.
The synthetic log is sized at 20x the events table (2M events at sf0.1) so
the engine, not session overhead, dominates.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from sparkcdc.changelog import generate_changelog, write_log_parquet
    from sparkcdc.config import JobConfig
    from sparkcdc.engine import CDCEngine
    from sparkcdc.session import get_spark

    spark = get_spark(app="sparkcdc-bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus, driver_memory="24g")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    n_events = max(int(2_000_000 * sf / 0.1), 100_000) if sf > 0 else 2_000_000
    n_docs = max(n_events // 20, 1_000)
    work = tempfile.mkdtemp(prefix="sparkcdc-bench-")
    log_path = os.path.join(work, "wal")

    timings: dict[str, float] = {}
    extra: dict[str, float] = {}

    # ---- warm up JIT/codegen with a tiny full replay (not timed): the
    # merge plan's whole-stage codegen compiles once per JVM; without this
    # the first timed batch pays ~5-10s of compilation, not engine work
    warm_dir = os.path.join(work, "warm")
    write_log_parquet(generate_changelog(spark, 40_000, 2_000, seed=1), os.path.join(warm_dir, "wal"), partitions=8)
    CDCEngine(spark, JobConfig(log_path=os.path.join(warm_dir, "wal"),
                               table_path=os.path.join(warm_dir, "t"),
                               batch_size=20_000, n_buckets=cpus * 2)).run()

    # ---- headline: CDC replay end-to-end (generation excluded from timing)
    log = generate_changelog(spark, n_events, n_docs, seed=42,
                             hot_key_pct=10, dup_pct=5,
                             num_partitions=cpus * 2)
    write_log_parquet(log, log_path, partitions=cpus * 2)
    cfg = JobConfig(log_path=log_path, table_path=os.path.join(work, "tbl"),
                    batch_size=max(n_events // 4, 1), n_buckets=cpus * 2)
    t0 = time.time()
    eng = CDCEngine(spark, cfg)
    totals = eng.run()
    timings["cdc_replay"] = time.time() - t0
    extra["cdc_replay_events"] = float(totals["applied_events"])
    extra["events_per_sec"] = totals["applied_events"] / timings["cdc_replay"]

    # same WAL in ONE batch: peak throughput when per-batch driver costs
    # amortize (the production large-batch regime; see BENCH/BASELINE.md)
    cfg_big = JobConfig(log_path=log_path, table_path=os.path.join(work, "tbl_big"),
                        batch_size=n_events, n_buckets=cpus * 2)
    t0 = time.time()
    totals_big = CDCEngine(spark, cfg_big).run()
    timings["cdc_replay_large_batch"] = time.time() - t0
    extra["events_per_sec_large_batch"] = (
        totals_big["applied_events"] / timings["cdc_replay_large_batch"]
    )

    # ---- point-lookup serving path: k-key read on the replayed table
    # (manifest bucket pruning + footer key-range pruning + pushed filter)
    some_keys = [r["doc_id"] for r in eng.read_table().select("doc_id").limit(5).collect()]
    t0 = time.time()
    n_hits = eng.table.read_keys(some_keys).count()
    timings["point_lookup"] = time.time() - t0
    extra["point_lookup_rows"] = float(n_hits)

    # ---- representative operator workloads over driver testdata
    bench_queries = {
        "lww_dedup": "t2_lww_dedup",
        "merge_upsert": "cdc_merge_upsert",
        "scan_filter": "p2_filter_pushdown",
        "agg": "a1_count_aggregate",
        "minhash_lsh": "dedup_minhash_lsh",
        "ngram_jaccard": "dedup_ngram_jaccard",
        "lsh_verified": "dedup_lsh_verified",
        "ann_cosine": "ann_cosine_topk",
        "text_pipeline": "text_quality",
        "fingerprint": "text_fingerprint",
        "multimodal": "multimodal_features",
    }
    qs = entrymod.queries()
    for label, qname in bench_queries.items():
        fn = qs[qname]
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[label] = time.time() - t0
        extra[f"{label}_rows"] = float(n)

    shutil.rmtree(work, ignore_errors=True)
    out = {
        "metric": "cdc_replay_total_plus_operator_suite",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": sf,
        "cpus": cpus,
        "events_per_sec": round(extra["events_per_sec"], 1),
        "events_per_sec_large_batch": round(extra["events_per_sec_large_batch"], 1),
        "replay_events": int(extra["cdc_replay_events"]),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
