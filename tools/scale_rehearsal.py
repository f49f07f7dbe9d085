"""Scale rehearsal for the dedup/ANN family (r3 next-round #7): run the
capped LSH paths at 10^5+ synthetic docs/vectors — 400x the 500-doc gate
corpus — with PLANTED ground truth, and record candidate-pair counts,
recall, and wall time vs the uncapped runs, so the cap constants rest on
measured data instead of extrapolation.

Corpus construction (all seed-pinned, pure Catalyst generation):
  * documents: N_DOCS docs of 40 words from a 1000-word vocab;
    PLANT near-dup pairs (doc i paired with i+PAIR_OFF, 2 of 40 words
    changed → word-shingle Jaccard ~0.8) and ONE hot cluster of
    HOT identical docs (the adversarial mass the caps exist for).
  * embeddings: N_VECS dim-32 vectors; planted near-dup pairs
    (tiny perturbation → cos > 0.99) and a hot cluster around one point.

Usage: python tools/scale_rehearsal.py [n_docs] [n_vecs]
Writes one JSON line per experiment; paste the summary into PLANS.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
N_VECS = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
N_PAIRS = 2_000       # planted near-dup pairs
HOT = 2_000           # identical/near-identical hot-cluster size
PAIR_OFF = 10_000_000  # planted partner id offset


def build_docs(spark):
    """Base docs + planted near-dup partners + hot cluster."""
    vocab = F.array(*[F.lit(f"w{i:04d}") for i in range(1000)])
    word = lambda seed: F.element_at(  # noqa: E731
        vocab, (F.pmod(F.xxhash64(F.col("id"), F.lit(seed), F.col("j")), F.lit(1000)) + 1).cast("int")
    )
    # order-stable aggregation: collect (position, word) structs and sort —
    # collect_list alone has NO order guarantee and would desynchronize the
    # base/partner word streams
    text_agg = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("j", "w"))), lambda s: s["w"]
        ),
        " ",
    ).alias("text")
    base = (
        spark.range(N_DOCS)
        .select("id", F.explode(F.sequence(F.lit(1), F.lit(40))).alias("j"))
        .select("id", "j", word(1).alias("w"))
        .groupBy("id")
        .agg(text_agg)
    )
    # planted partner: same word stream except positions 3 and 7 (re-seeded)
    partner = (
        spark.range(N_PAIRS)
        .select("id", F.explode(F.sequence(F.lit(1), F.lit(40))).alias("j"))
        .select(
            "id", "j",
            F.when(F.col("j").isin(3, 7), word(2)).otherwise(word(1)).alias("w"),
        )
        .groupBy("id")
        .agg(text_agg)
        .select((F.col("id") + PAIR_OFF).alias("id"), "text")
    )
    hot = spark.range(2 * PAIR_OFF, 2 * PAIR_OFF + HOT).select(
        "id", F.lit(" ".join(f"h{i}" for i in range(40))).alias("text")
    )
    return (
        base.unionByName(partner).unionByName(hot)
        .select(F.col("id").cast("string").alias("doc_id"), "text")
    )


def build_vecs(spark):
    dim = 32
    comp = lambda seed, scale: F.transform(  # noqa: E731
        F.sequence(F.lit(1), F.lit(dim)),
        lambda d: (
            F.pmod(F.xxhash64(F.col("id"), F.lit(seed), d), F.lit(2001)) - 1000
        ).cast("float") / scale,
    )
    base = spark.range(N_VECS).select("id", comp(1, 1000.0).alias("embedding"))
    partner = (
        spark.range(N_PAIRS)
        .select(
            "id",
            F.zip_with(
                comp(1, 1000.0), comp(3, 50000.0), lambda a, b: a + b
            ).alias("embedding"),
        )
        .select((F.col("id") + PAIR_OFF).alias("id"), "embedding")
    )
    hot = spark.range(2 * PAIR_OFF, 2 * PAIR_OFF + HOT).select(
        "id",
        F.zip_with(
            F.transform(
                F.sequence(F.lit(1), F.lit(dim)),
                lambda d: (F.pmod(F.xxhash64(F.lit(7), d), F.lit(2001)) - 1000).cast("float") / 1000.0,
            ),
            comp(5, 200000.0),
            lambda a, b: a + b,
        ).alias("embedding"),
    )
    return base.unionByName(partner).unionByName(hot).select(
        F.col("id").cast("long").alias("vec_id"), "embedding"
    )


def pair_metrics(pairs_df, id1, id2) -> dict:
    """Planted recall + hot/non-hot split in one aggregation.

    planted pair = (i, i+PAIR_OFF); hot pair = both ids inside the
    mass-duplicate cluster (the ONLY region a cap is allowed to degrade).
    ``nonhot_pairs`` equality between capped and uncapped runs is the
    recall-1.0-outside-the-hot-region claim, measured."""
    # abs(): string ids order pairs lexicographically, so the planted
    # partner may appear on either side
    a, b = F.col(id1).cast("long"), F.col(id2).cast("long")
    r = pairs_df.agg(
        F.count("*").alias("total"),
        F.sum((F.abs(b - a) == PAIR_OFF).cast("long")).alias("planted"),
        F.sum(((a >= 2 * PAIR_OFF) & (b >= 2 * PAIR_OFF)).cast("long")).alias("hot"),
    ).collect()[0]
    total, planted, hot = int(r["total"]), int(r["planted"] or 0), int(r["hot"] or 0)
    return {
        "pairs": total,
        "hot_pairs": hot,
        "nonhot_pairs": total - hot,
        "planted_found": planted,
        "planted_recall": round(planted / N_PAIRS, 4),
    }


def main() -> int:
    from sparkcdc.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app="scale-rehearsal", master=f"local[{cpus}]",
                      shuffle_partitions=cpus * 2, driver_memory="24g")
    spark.sparkContext.setLogLevel("ERROR")

    from sparkcdc.ann import cosine_near_dup_pairs
    from sparkcdc.dedupe_docs import (
        lsh_verified_pairs,
        minhash_lsh_pairs,
        simhash_near_pairs,
    )

    docs = build_docs(spark).cache()
    vecs = build_vecs(spark).cache()
    n_docs, n_vecs = docs.count(), vecs.count()
    print(json.dumps({"exp": "corpus", "docs": n_docs, "vecs": n_vecs,
                      "planted_pairs": N_PAIRS, "hot_cluster": HOT}))

    def run(name: str, fn) -> dict:
        t0 = time.time()
        res = fn()
        res = {"exp": name, **res, "wall_sec": round(time.time() - t0, 1)}
        print(json.dumps(res))
        return res

    # --- minhash banded candidates: capped (default 512) vs uncapped
    def mh(cap):
        cand = minhash_lsh_pairs(docs, max_band=cap)
        return {"cap": cap, **pair_metrics(cand, "doc1", "doc2")}

    run("minhash_lsh_default_cap", lambda: mh(None))
    run("minhash_lsh_uncapped", lambda: mh(0))

    # --- the designated 100 TB path: LSH-verified exact jaccard
    def lv(cap):
        out = lsh_verified_pairs(docs, threshold=0.5, max_band=cap)
        return {"cap": cap, **pair_metrics(out, "doc1", "doc2")}

    run("lsh_verified_default_cap", lambda: lv(None))

    # --- simhash pigeonhole banding: capped (default) vs uncapped
    def sh(cap):
        out = simhash_near_pairs(docs, max_hamming=4, max_chunk=cap, n_rows=n_docs)
        return {"cap": cap, **pair_metrics(out, "doc1", "doc2")}

    run("simhash_default_cap", lambda: sh(None))
    run("simhash_uncapped", lambda: sh(0))

    # --- embedding cosine near-dup: capped (computed default) vs uncapped
    def cs(cap):
        out = cosine_near_dup_pairs(vecs, threshold=0.98, max_bucket=cap, n_rows=n_vecs)
        return {"cap": cap, **pair_metrics(out, "id1", "id2")}

    run("cosine_default_cap", lambda: cs(None))
    run("cosine_uncapped", lambda: cs(0))
    return 0


if __name__ == "__main__":
    sys.exit(main())
