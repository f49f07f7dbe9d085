"""Synthesize a larger sf directory from /root/testdata/sf0.1 for LOCAL
scale validation (the driver testdata stops at sf0.1; its own measurement
runs at a driver-generated sf1.0 we cannot reproduce exactly).

Usage: python tools/make_sf_scale.py <out_dir> [factor]

Replicates events / lineitem / documents / embeddings ``factor`` times
with shifted keys; document text is re-tokenized with a copy-specific
separator token so cross-copy near-duplicate pairs do not explode the
dedup workloads beyond their design shape. Small dimension tables are
copied as-is. Deterministic; NOT the driver's sf1.0 data — use only for
before/after comparisons on this box, never for cross-round claims.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sparkcdc.session import get_spark

SRC = "/root/testdata/sf0.1"
COPY_AS_IS = ["region", "nation", "customer", "supplier", "part", "orders"]


def main() -> int:
    out = sys.argv[1]
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark(app="make-sf-scale", master="local[32]",
                      shuffle_partitions=32, driver_memory="16g")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)
    for t in COPY_AS_IS:
        src, dst = f"{SRC}/{t}.parquet", f"{out}/{t}.parquet"
        if os.path.isdir(src):
            shutil.copytree(src, dst, dirs_exist_ok=True)
        else:
            shutil.copyfile(src, dst)

    ev = spark.read.parquet(f"{SRC}/events.parquet")
    n_ev = ev.agg(F.max("event_id")).first()[0] + 1
    n_user = ev.agg(F.max("user_id")).first()[0] + 1
    parts = []
    for k in range(factor):
        parts.append(ev.select(
            (F.col("event_id") + F.lit(k * n_ev)).alias("event_id"),
            (F.col("user_id") + F.lit(k * n_user)).alias("user_id"),
            "event_type", "value", "props", "ts",
        ))
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big.repartition(64).write.mode("overwrite").parquet(f"{out}/events.parquet")

    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    n_ok = li.agg(F.max("l_orderkey")).first()[0] + 1
    parts = [li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(k * n_ok))
             for k in range(factor)]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big.repartition(64).write.mode("overwrite").parquet(f"{out}/lineitem.parquet")

    d = spark.read.parquet(f"{SRC}/documents.parquet")
    n_doc = d.agg(F.max("doc_id")).first()[0] + 1
    parts = []
    for k in range(factor):
        sep = f"c{k}x"
        parts.append(d.select(
            (F.col("doc_id") + F.lit(k * n_doc)).alias("doc_id"),
            F.array_join(F.split(F.trim("text"), r"\s+"), f" {sep} ").alias("text"),
            *[c for c in d.columns if c not in ("doc_id", "text")],
        ))
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big.repartition(16).write.mode("overwrite").parquet(f"{out}/documents.parquet")

    e = spark.read.parquet(f"{SRC}/embeddings.parquet")
    n_vec = e.agg(F.max("vec_id")).first()[0] + 1
    parts = [e.withColumn("vec_id", F.col("vec_id") + F.lit(k * n_vec))
             for k in range(factor)]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big.repartition(16).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    print("wrote", out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
