"""Last-writer-wins dedup — the engine's core aggregation (SURVEY.md §2.4).

The reference tolerates duplicate page re-fetches because it is append-only;
a MERGE sink cannot, so every micro-batch is collapsed to one winning event
per key: max ``seq`` wins (LWW). Implemented as hash aggregation with
``max_by`` — NOT a window sort — because partial (map-side) aggregation
collapses hot keys inside each input partition before the shuffle, which is
the cheapest possible skew mitigation. An explicit two-phase *salted*
variant is provided for adversarial skew (north rule: "salted
repartitioning on hot doc_id keys").

Duplicate delivery is exact re-delivery (same seq, same payload), so ties
on seq are between identical rows and any winner is correct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lww_dedup(
    df: DataFrame,
    key: str = "doc_id",
    seq: str = "seq",
    *,
    salted: bool = False,
    salt_buckets: int = 32,
) -> DataFrame:
    """One row per ``key``: the row with max ``seq``. Order-insensitive:
    any permutation / duplication of the input yields the same output
    (property-tested in tests/test_properties.py)."""
    cols = df.columns
    payload = F.struct(*[F.col(c) for c in cols])
    if not salted:
        out = df.groupBy(key).agg(F.max_by(payload, F.col(seq)).alias("_w"))
        return out.select(*[F.col(f"_w.{c}").alias(c) for c in cols])
    # Phase 1: (key, salt) partial winners — spreads a hot key over
    # salt_buckets reducers. Phase 2: tiny re-agg per key.
    salt = (F.abs(F.xxhash64(F.col(seq), F.lit("salt"))) % F.lit(salt_buckets)).alias("_salt")
    p1 = (
        df.repartition(F.col(key), salt)
        .groupBy(F.col(key).alias("_k"), salt)
        .agg(F.max_by(payload, F.col(seq)).alias("_w"), F.max(seq).alias("_s"))
    )
    out = p1.groupBy("_k").agg(F.max_by(F.col("_w"), F.col("_s")).alias("_w"))
    return out.select(*[F.col(f"_w.{c}").alias(c) for c in cols])
