"""fsck(): driver-side integrity audit — metadata fold, manifest-vs-footer
agreement (existence, size, rows, key range), bloom-sidecar degradation as
warning, unreferenced files as warnings; deep mode audits every retained
snapshot."""

import os

from pyspark.sql import types as T

from sparkcdc.icebox import IceboxTable

SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_tok", T.LongType()),
])


def _log(spark, rows, seq0):
    return spark.createDataFrame(
        [("upsert", i, n, seq0 + j) for j, (i, n) in enumerate(rows)],
        "op string, doc_id long, n_tok long, seq long",
    )


def _mk(spark, tmp_path):
    t = IceboxTable.create(spark, str(tmp_path / "t"), SCHEMA, key="doc_id",
                           n_buckets=2)
    t.merge(_log(spark, [(i, 10 + i) for i in range(8)], 1), "b1")
    t.merge(_log(spark, [(2, 999), (50, 5)], 100), "b2")
    return t


def _some_data_file(t):
    return os.path.join(t.path, t.snapshot["manifest"][0]["path"])


def test_clean_table_passes(spark, tmp_path):
    t = _mk(spark, tmp_path)
    rep = t.fsck(deep=True)
    assert rep["ok"] and rep["errors"] == [] and rep["orphans"] == 0
    assert rep["files_checked"] >= 2


def test_missing_and_corrupt_files_are_errors(spark, tmp_path):
    t = _mk(spark, tmp_path)
    victim = _some_data_file(t)
    with open(victim, "ab") as fh:  # size no longer matches the manifest
        fh.write(b"junk")
    rep = t.fsck()
    assert not rep["ok"] and any("size mismatch" in e for e in rep["errors"])
    os.remove(victim)
    rep = t.fsck()
    assert not rep["ok"] and any("missing data file" in e for e in rep["errors"])


def test_missing_bloom_sidecar_is_a_warning_not_error(spark, tmp_path):
    t = _mk(spark, tmp_path)  # bloom_keys defaults on (delta files only)
    t.merge(_log(spark, [(60, 6), (61, 7)], 200), "b3", mor=True)
    e = next(x for x in t.snapshot["manifest"] if x.get("bloom"))
    os.remove(os.path.join(t.path, e["bloom"]))
    rep = t.fsck()
    assert rep["ok"]
    assert any("bloom" in w for w in rep["warnings"])


def test_orphan_files_are_counted_not_deleted(spark, tmp_path):
    t = _mk(spark, tmp_path)
    cdir = os.path.dirname(_some_data_file(t))
    orphan = os.path.join(cdir, "orphan-debris.parquet")
    with open(orphan, "wb") as fh:
        fh.write(b"not really parquet")
    rep = t.fsck()
    assert rep["ok"] and rep["orphans"] == 1
    assert os.path.exists(orphan)  # fsck never deletes


def test_deep_mode_audits_retained_history(spark, tmp_path):
    """A file referenced ONLY by an older retained snapshot: shallow fsck
    passes (current manifest is intact), deep fsck flags it — exactly the
    case where time travel / rollback would break."""
    t = _mk(spark, tmp_path)
    cur = {e["path"] for e in t.snapshot["manifest"]}
    old_only = None
    for s in t.snapshots():
        for e in s["manifest"]:
            if e["path"] not in cur:
                old_only = e["path"]
    assert old_only is not None
    os.remove(os.path.join(t.path, old_only))
    assert t.fsck()["ok"]
    deep = t.fsck(deep=True)
    assert not deep["ok"] and any(old_only in e for e in deep["errors"])
