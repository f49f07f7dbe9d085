"""Engine-driven retention (cfg.expire_every): the run loop expires
snapshots on a batch cadence; consumer pins clamp the window so the
continuously-maintained AggView keeps its change feed; history stays
bounded while the replay still converges."""

from pyspark.sql import functions as F

from sparkcdc.changelog import generate_changelog, write_log_parquet
from sparkcdc.config import JobConfig
from sparkcdc.engine import CDCEngine


def test_engine_retention_bounds_history_without_breaking_consumers(
    spark, tmp_path
):
    log = generate_changelog(spark, 3_000, 200, seed=17, dup_pct=10)
    wal = str(tmp_path / "wal")
    write_log_parquet(log, wal)
    cfg = JobConfig(
        log_path=wal, table_path=str(tmp_path / "tbl"), n_buckets=4,
        batch_size=300,  # 10 batches
        expire_every=2, retention_keep_last=3,
        aggview_path=str(tmp_path / "view"),
        aggview_group_cols=["source"],
        aggview_aggs={"n_docs": ["count", None], "sum_tok": ["sum", "n_tok"]},
    )
    eng = CDCEngine(spark, cfg)
    eng.run()
    expires = [r for r in eng.metrics.records if r.get("kind") == "expire"]
    assert len(expires) >= 4  # every 2nd batch
    # history bounded (keep_last + the commits since the last expiration)
    assert len(eng.table._history_ids()) <= cfg.retention_keep_last + 4
    # the view's change feed survived every expiration (pin clamps) and
    # the maintained rollup equals the direct aggregate
    got = sorted(tuple(r) for r in eng.aggview.read().collect())
    want = sorted(tuple(r) for r in eng.table.read().groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum("n_tok").alias("sum_tok")).collect())
    assert got == want
    # replay correctness vs a retention-free run
    plain = CDCEngine(spark, JobConfig(
        log_path=wal, table_path=str(tmp_path / "plain"), n_buckets=4,
        batch_size=300))
    plain.run()
    assert sorted(tuple(r) for r in eng.table.read().collect()) == \
        sorted(tuple(r) for r in plain.table.read().collect())
