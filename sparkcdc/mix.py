"""Deterministic data-mix sampling and train/validation splitting for
training-data pipelines.

A 100 TB corpus is never trained on wholesale: each source gets a mix
weight (e.g. wiki ×3, crawl ×0.3) and every run must draw the SAME
subset — sampling has to be a pure function of the row key, not of
partitioning, task order, or an RNG stream (Spark's `df.sample` is
seed-stable only for a fixed partitioning, which a 1000-executor re-run
does not guarantee).

The primitive here is an md5-derived uniform: the first 8 hex chars of
``md5(key || ':' || seed)`` compared lexicographically against a
precomputed hex threshold. Fixed-width lowercase hex compares exactly
like the 32-bit integer it encodes, md5 is bit-identical across Spark
and DuckDB, and the whole decision is one scalar expression — per-row,
zero shuffle, fully pushed into the scan stage, and reproducible on any
cluster shape. Changing ``seed`` redraws the whole sample; keeping it
fixes the sample forever (a requirement for ablation reruns).

Reference parity: the reference selects its working set declaratively
too (a JQL filter evaluated server-side, JiraInputPlugin.java:150-163);
here the "filter" is a deterministic hash predicate the optimizer can
pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_SPACE = 16**8  # first 8 hex chars of md5 = uniform 32-bit draw


def rate_threshold(rate: float) -> str:
    """Hex threshold t such that P[substr(md5(x),1,8) < t] == rate (up to
    1/2^32 quantization). Clamped to [0, 1]; rate >= 1 returns 'g', which
    is lexicographically above every 8-char hex string (keep-all)."""
    rate = min(max(rate, 0.0), 1.0)
    if rate >= 1.0:
        return "g"
    return format(int(rate * _HEX_SPACE), "08x")


def uniform_hash(key: Column, seed: str) -> Column:
    """The 8-hex-char deterministic uniform draw for (key, seed)."""
    return F.substring(F.md5(F.concat(key.cast("string"), F.lit(":" + seed))), 1, 8)


def sample_by_rates(
    df: DataFrame,
    rates: dict[str, float],
    *,
    source_col: str = "source",
    key_col: str = "doc_id",
    seed: str = "mix",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-source Bernoulli sampling at the mix's configured rates.

    Keeps a row iff its deterministic uniform falls under its source's
    threshold; sources absent from ``rates`` get ``default_rate``. The
    predicate is a single CASE expression — Catalyst pushes it into the
    scan, so at 100 TB the dropped rows never leave the reader.
    """
    h = uniform_hash(F.col(key_col), seed)
    thr: Column = F.lit(rate_threshold(default_rate))
    for src in sorted(rates):  # deterministic CASE order
        thr = F.when(F.col(source_col) == src, F.lit(rate_threshold(rates[src]))).otherwise(thr)
    return df.where(h < thr)


def with_split(
    df: DataFrame,
    *,
    val_frac: float = 0.1,
    key_col: str = "doc_id",
    seed: str = "split",
) -> DataFrame:
    """Deterministic stratum-free train/validation split.

    Uses a DIFFERENT seed namespace than sampling so the two draws are
    independent: a doc's split assignment never correlates with whether
    it survived the mix. Assignment is stable under corpus growth — new
    docs join a split without reshuffling old ones (critical so eval
    sets stay fixed across ingest batches).
    """
    h = uniform_hash(F.col(key_col), seed)
    return df.withColumn(
        "split",
        F.when(h < F.lit(rate_threshold(val_frac)), F.lit("val")).otherwise(F.lit("train")),
    )
