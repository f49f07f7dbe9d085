"""Per-file key bloom sidecars (sparkcdc/bloom.py + icebox wiring):
point-lookup file skipping on MOR delta stacks, sidecar lifecycle under
snapshot expiration / orphan sweep, and graceful degradation."""

from __future__ import annotations

import glob
import os

import pyspark.sql.types as T
import pytest
from pyspark.sql import functions as F

from sparkcdc import bloom
from sparkcdc.icebox import IceboxTable

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
    ]
)


def _batch(spark, ids, seq_base):
    rows = [(f"d{i:05d}", [i], 1, "s", seq_base + j, "upsert")
            for j, i in enumerate(ids)]
    return spark.createDataFrame(
        rows, "doc_id: string, tokens: array<int>, n_tok: int, source: string,"
        " seq: long, op: string"
    )


def test_bloom_unit_no_false_negatives_and_bounded_fpr():
    keys = [f"k{i}" for i in range(5_000)]
    blob = bloom.build(keys, len(keys))
    bfp = _parse_blob(blob)
    assert all(bloom.might_contain(bfp, key) for key in keys)  # no false neg
    absent = [f"x{i}" for i in range(5_000)]
    fpr = sum(bloom.might_contain(bfp, key) for key in absent) / len(absent)
    assert fpr < 0.05  # 1% target, generous margin
    # deterministic: rebuild is byte-identical (cross-writer readable)
    assert bloom.build(keys, len(keys)) == blob
    # int keys normalize via str(): build with ints, probe with ints
    iblob = bloom.build(range(100), 100)
    ibf = _parse_blob(iblob)
    assert all(bloom.might_contain(ibf, i) for i in range(100))


def _parse_blob(blob):
    import struct

    m, k = struct.unpack_from("<QI", blob, len(bloom.MAGIC))
    return m, k, blob[len(bloom.MAGIC) + 12 :]


def test_point_lookup_skips_delta_files_via_bloom(spark, tmp_path):
    """A bucket stacked with MOR delta files: every delta's key RANGE spans
    the bucket (hash-scattered keys), so range pruning keeps them all —
    the bloom stage must cut the file list to the deltas actually holding
    the probed key, with identical results."""
    t = IceboxTable.create(spark, str(tmp_path / "t"), SCHEMA, n_buckets=2)
    t.merge(_batch(spark, range(400), 0), "base")
    # 6 delta batches with INTERLEAVED ids (ids ≡ b mod 6 over 400..880):
    # every delta's [key_min, key_max] spans the same range, so range
    # pruning keeps all of them — membership is disjoint, so only the
    # bloom can tell which delta holds a given key
    for b in range(6):
        ids = range(400 + b, 880, 6)
        t.merge(_batch(spark, ids, 1_000 + b * 100), f"delta-{b}", mor=True)
    probe = "d00410"  # lives in exactly one delta batch
    snap = t._snap
    kdf_buckets = {e["bucket"] for e in snap["manifest"]}
    assert len([e for e in snap["manifest"] if e.get("kind") == "delta"]) >= 6
    # reproduce read_keys' pruning stages
    from sparkcdc.icebox import bucket_expr

    b = spark.createDataFrame([(probe,)], "doc_id: string").select(
        bucket_expr("doc_id", t.n_buckets).alias("b")
    ).first().b
    in_bucket = [e for e in snap["manifest"] if e["bucket"] == b]
    ranged = t._entries_for_keys(in_bucket, [probe])
    bloomed = t._bloom_prune(ranged, [probe])
    assert len(bloomed) < len(ranged), (
        f"bloom stage pruned nothing: {len(ranged)} -> {len(bloomed)}"
    )
    # correctness: the pruned read returns exactly the row
    rows = t.read_keys([probe]).collect()
    assert [r.doc_id for r in rows] == [probe]
    # every registered DELTA file has a sidecar on disk; COW bases carry
    # none (bucket+range pruning already resolves them to one file, so a
    # sidecar there would cost an O(bucket) driver hash pass per merge
    # for nothing — the r6 delta-only policy)
    for e in snap["manifest"]:
        if e.get("kind") == "delta":
            assert e.get("bloom") and os.path.exists(
                os.path.join(t.path, e["bloom"])
            )
        else:
            assert not e.get("bloom")


def test_bloom_degrades_when_sidecar_missing_or_disabled(spark, tmp_path):
    t = IceboxTable.create(spark, str(tmp_path / "t"), SCHEMA, n_buckets=2)
    t.bloom_keys = False  # legacy-writer handle: no sidecars, no manifest ref
    t.merge(_batch(spark, range(100), 0), "b1")
    assert not any(e.get("bloom") for e in t._snap["manifest"])
    assert t.read_keys(["d00042"]).count() == 1
    # new-writer handle adds blooms (delta files); deleting a sidecar
    # degrades, not breaks
    t2 = IceboxTable.load(spark, str(tmp_path / "t"))
    t2.merge(_batch(spark, range(100, 200), 1_000), "b2", mor=True)
    victim = next(e for e in t2._snap["manifest"] if e.get("bloom"))
    os.remove(os.path.join(t2.path, victim["bloom"]))
    t2._bloom_cache.clear()
    assert t2.read_keys(["d00042", "d00150"]).count() == 2


def test_sweep_cleans_sidecars_with_their_data_files(spark, tmp_path):
    t = IceboxTable.create(spark, str(tmp_path / "t"), SCHEMA, n_buckets=2)
    t.merge(_batch(spark, range(20), 0), "b0")
    for i in range(1, 8):  # enough snapshots to expire some; MOR deltas
        t.merge(_batch(spark, range(i * 20, (i + 1) * 20), i * 100), f"b{i}",
                mor=True)
    n_bloom_before = len(glob.glob(os.path.join(t.path, "data", "**", "*.bloom"),
                                   recursive=True))
    assert n_bloom_before > 0
    t.expire_snapshots(keep_last=1, sweep_orphans=True, orphan_grace_sec=0)
    live_delta = {e["path"] for e in t._snap["manifest"]
                  if e.get("kind") == "delta"}
    blooms = glob.glob(os.path.join(t.path, "data", "**", "*.bloom"), recursive=True)
    # every surviving sidecar belongs to a live delta file, and every live
    # delta still has its sidecar (COW bases carry none — delta-only policy)
    assert {os.path.relpath(p[: -len(".bloom")], t.path)
            for p in blooms} == live_delta
    # reads still work post-sweep
    assert t.read_keys(["d00005"]).count() == 1
