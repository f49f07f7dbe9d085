"""Experiment: can the merge LWW avoid the payload SortAggregate?

Compares, on the same bucket-aligned payload shuffle:
  A. max_by(struct(payload), seq) hash-group — current merge plan; the
     struct aggregation buffer forces SortAggregate (payload sorted by key).
  B. narrow winner computation + SHUFFLE_HASH join: aggregate only
     (doc_id, seq, _mid) to pick one winning physical row per key
     (HashAggregate — all-long buffers), then stream the payload through a
     shuffle-hash join on the already-aligned partitioning. `_mid`
     (monotonically_increasing_id assigned BEFORE the exchange, so it is
     frozen in the shuffle files) breaks ties between exact duplicate
     redeliveries that share (doc_id, seq).

Usage: python tools/exp_lww.py [n_events] [cores]
Prints timings + row-count/checksum agreement. Round-1 measured a
winner-join variant WORSE (PLANS.md rejected list); this re-test uses the
narrow pre-agg + SHUFFLE_HASH form suggested in VERDICT.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def lww_maxby(df, nb):
    from sparkcdc.dedup import lww_dedup

    return lww_dedup(df.repartition(nb, F.col("doc_id")), key="doc_id", seq="seq")


def lww_shj(df, nb):
    pay = df.withColumn("_mid", F.monotonically_increasing_id()).repartition(
        nb, F.col("doc_id")
    )
    narrow = pay.select("doc_id", "seq", "_mid")
    w1 = narrow.groupBy("doc_id").agg(F.max("seq").alias("_ms"))
    w2 = (
        narrow.join(w1, "doc_id")
        .where(F.col("seq") == F.col("_ms"))
        .groupBy("doc_id")
        .agg(F.min("_mid").alias("_wm"))
    )
    return (
        pay.join(w2.hint("shuffle_hash"), "doc_id")
        .where(F.col("_mid") == F.col("_wm"))
        .drop("_mid", "_wm")
    )


def checksum(df):
    return df.agg(
        F.count("*").alias("n"),
        F.sum(F.xxhash64("doc_id", "seq", "n_tok")).alias("h"),
    ).collect()[0]


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    nb = 64

    from sparkcdc.changelog import generate_changelog, write_log_parquet
    from sparkcdc.session import get_spark

    spark = get_spark(app="exp-lww", master=f"local[{cores}]",
                      shuffle_partitions=cores, driver_memory="28g")
    spark.sparkContext.setLogLevel("ERROR")

    import tempfile

    work = tempfile.mkdtemp(prefix="exp-lww-")
    log_path = os.path.join(work, "wal")
    write_log_parquet(
        generate_changelog(spark, n, n // 20, seed=42, hot_key_pct=10,
                           dup_pct=5, num_partitions=64),
        log_path, partitions=64,
    )
    df = spark.read.parquet(log_path)

    for name, fn in (("warmup_maxby", lww_maxby), ("warmup_shj", lww_shj)):
        fn(df.limit(100_000), nb).write.format("noop").mode("overwrite").save()

    results = {}
    for rnd in range(3):
        for name, fn in (("maxby", lww_maxby), ("shj", lww_shj)):
            t0 = time.time()
            fn(df, nb).write.format("noop").mode("overwrite").save()
            results.setdefault(name, []).append(time.time() - t0)
            print(f"round {rnd} {name}: {results[name][-1]:.2f}s", flush=True)

    a, b = checksum(lww_maxby(df, nb)), checksum(lww_shj(df, nb))
    print("agree:", a == b, dict(a.asDict()), dict(b.asDict()))
    import statistics

    for name, vals in results.items():
        print(f"{name}: median {statistics.median(vals):.2f}s  runs {[round(v,2) for v in vals]}")
    print("--- shj plan ---")
    lww_shj(df, nb).explain("formatted")
    return 0


if __name__ == "__main__":
    sys.exit(main())
