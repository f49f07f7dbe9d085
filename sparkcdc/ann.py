"""Similarity search over an embedding column (array<float>).

Two paths:
  * brute-force cosine top-k — the exactness baseline; broadcast the query
    set, one pass over candidates, per-query top-k via window. O(Q·N) dot
    products, all native (aggregate/zip_with inside codegen).
  * LSH-bucketed ANN — the scale path: sign-random-projection buckets from
    deterministic ±1 hyperplanes (seeded, generated driver-side so the SAME
    constants can be baked into the DuckDB oracle SQL); exact cosine only
    within matching buckets.

Cosine is computed in float64 and rounded to 6 decimals before ranking with
a vec_id tiebreak, so rankings are reproducible across engines.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine_topk(
    emb: DataFrame,
    *,
    n_queries: int = 5,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for the first ``n_queries`` vectors (query =
    vec_id < n_queries), excluding self. Output: (query_id, neighbor_id,
    rank, cos) with cos rounded to 6 dp for cross-engine determinism."""
    q = emb.where(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    joined = c.crossJoin(F.broadcast(q)).where(F.col("neighbor_id") != F.col("query_id"))
    cos = F.round(_dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))), 6)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        joined.select("query_id", "neighbor_id", cos.alias("cos"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def lsh_planes(dim: int, n_planes: int, seed: int = 42) -> list[list[int]]:
    """Deterministic ±1 hyperplanes from md5(seed, plane, dim) parity —
    pure Python so the identical constants are available to bake into
    oracle SQL text."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}:{p}:{d}".encode()).digest()[0]
            row.append(1 if h % 2 == 0 else -1)
        planes.append(row)
    return planes


def lsh_bucket_expr(vec_col: str, planes: list[list[int]]):
    """Bucket id = sign-bit string over the planes."""
    bits = []
    for row in planes:
        plane = F.array(*[F.lit(float(v)) for v in row])
        bits.append(F.when(_dot(F.col(vec_col), plane) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def cosine_near_dup_pairs(
    emb: DataFrame,
    *,
    threshold: float = 0.9,
    n_planes: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: candidates share an LSH
    bucket (sign-random-projection), verified by exact cosine ≥ threshold.
    The bucket join bounds the pair space — the scale path for
    embedding-level dedup of a training corpus."""
    dim = len(emb.select(vec_col).first()[0])
    bucket = lsh_bucket_expr(vec_col, lsh_planes(dim, n_planes, seed))
    tagged = emb.select(F.col(id_col), F.col(vec_col), bucket.alias("bucket"))
    a = tagged.select(F.col(id_col).alias("id1"), F.col(vec_col).alias("v1"), "bucket")
    b = tagged.select(F.col(id_col).alias("id2"), F.col(vec_col).alias("v2"), "bucket")
    cand = a.join(b, "bucket").where(F.col("id1") < F.col("id2"))
    cos = F.round(_dot(F.col("v1"), F.col("v2")) / (_norm(F.col("v1")) * _norm(F.col("v2"))), 6)
    return cand.select("id1", "id2", cos.alias("cos")).where(F.col("cos") >= threshold)


def lsh_ann_topk(
    emb: DataFrame,
    *,
    n_queries: int = 5,
    k: int = 10,
    n_planes: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine restricted to candidates in the same
    sign-random-projection bucket as the query. Recall < 1 by design; at
    scale the bucket join replaces the O(Q·N) cross join."""
    dim = len(emb.select(vec_col).first()[0])
    bucket = lsh_bucket_expr(vec_col, lsh_planes(dim, n_planes, seed))
    tagged = emb.select(F.col(id_col), F.col(vec_col), bucket.alias("bucket"))
    q = tagged.where(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "bucket"
    )
    c = tagged.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "bucket")
    joined = c.join(F.broadcast(q), "bucket").where(F.col("neighbor_id") != F.col("query_id"))
    cos = F.round(_dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))), 6)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        joined.select("query_id", "neighbor_id", cos.alias("cos"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )
