"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, and a decode/feature-extract stage as an Arrow-batched
``mapInPandas`` operator.

The real decode (image/audio libs) is STUBBED — this container has no
codec libraries — behind ``decode_backend='fake'`` (deterministic
hash-derived features) or ``decode_backend='real'`` which raises
NotImplementedError. Everything Spark-side is real and tested: schema,
binary handling, batch iteration shape, partition-parallel execution.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stand-in media column: utf-8 bytes of the text as an opaque blob +
    typed metadata (the schema a real ingest would carry)."""
    blob = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        "doc_id",
        blob.alias("payload"),
        F.octet_length(blob).alias("n_bytes"),
        (F.abs(F.xxhash64("doc_id")) % 1920 + 1).cast("int").alias("width"),
        (F.abs(F.xxhash64("doc_id", F.lit("h"))) % 1080 + 1).cast("int").alias("height"),
    )


def extract_features(df: DataFrame, *, decode_backend: str = "fake") -> DataFrame:
    """Decode/feature-extract over binary payloads with ``mapInPandas`` —
    Arrow batches in, Arrow batches out, partition-parallel."""
    if decode_backend == "real":
        raise NotImplementedError(
            "real media decoding requires codec libraries not present in "
            "this environment; use decode_backend='fake'"
        )
    if decode_backend != "fake":
        raise ValueError(f"unknown decode_backend: {decode_backend}")

    feature_dim = FEATURE_DIM

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # self-contained closure: pickled by value, so executors don't
        # need the sparkcdc package importable (spark-submit --py-files
        # is still the blessed path; this keeps ad-hoc drivers working)
        def _fake_decode(payload):
            if payload is None:
                return None
            payload = bytes(payload)
            n = max(len(payload), 1)
            stripe = max(n // feature_dim, 1)
            out = []
            for i in range(feature_dim):
                chunk = payload[i * stripe : (i + 1) * stripe] or b"\x00"
                out.append(float(sum(chunk)) / len(chunk) / 255.0)
            return out

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["n_bytes"].astype("int32"),
                    "width": pdf["width"].astype("int32"),
                    "height": pdf["height"].astype("int32"),
                    "features": pdf["payload"].map(_fake_decode),
                }
            )

    return df.mapInPandas(run, FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, *, every_n: int = 10) -> DataFrame:
    """Frame-sampling analog for video-ish payloads: deterministic stripe
    offsets a real pipeline would decode. Pure plan (no UDF)."""
    return df.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest((F.col("n_bytes") / every_n).cast("int") - 1, F.lit(0)))
        ).alias("frame_idx"),
        (F.col("n_bytes")).alias("n_bytes"),
    ).withColumn("byte_offset", F.col("frame_idx") * every_n)
