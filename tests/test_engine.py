"""Engine lifecycle tests: full replay vs oracle, resume-from-checkpoint
after a mid-run kill, mid-stream schema evolution, preview, config
validation, hot-key skew, streaming front-end equivalence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkcdc import oracle
from sparkcdc.changelog import generate_changelog, write_log_parquet
from sparkcdc.config import ConfigError, JobConfig
from sparkcdc.engine import CDCEngine
from sparkcdc.icebox import IceboxTable


def _mk_log(spark, tmp_path, n=6_000, docs=500, name="log", **kw):
    path = str(tmp_path / name)
    write_log_parquet(generate_changelog(spark, n, docs, **kw), path)
    return path


def test_full_run_matches_oracle_and_emits_metrics(spark, tmp_path):
    log_path = _mk_log(spark, tmp_path, seed=42, dup_pct=10, shuffled=True)
    cfg = JobConfig(log_path=log_path, table_path=str(tmp_path / "tbl"),
                    batch_size=1_500, n_buckets=16)
    eng = CDCEngine(spark, cfg)
    totals = eng.run()
    expected = oracle.replay(spark.read.parquet(log_path).toPandas())
    oracle.assert_table_equal(eng.read_table().toPandas(), expected)
    assert totals["batches"] == 4
    assert totals["applied_events"] > 0 and totals["events_per_sec"] > 0
    batch0 = eng.metrics.records[0]
    assert batch0["per_bucket_applied"] and batch0["watermark_lag_sec"] is not None


def test_resume_after_kill_mid_run(spark, tmp_path):
    log_path = _mk_log(spark, tmp_path, seed=7)
    tbl_path = str(tmp_path / "tbl")
    cfg = JobConfig(log_path=log_path, table_path=tbl_path, batch_size=2_000)
    # run only 1 of 3 batches, then "kill" the engine (drop all state)
    eng1 = CDCEngine(spark, cfg)
    eng1.run(max_batches=1)
    assert eng1.table.lineage["last_applied_lsn"] == 2_000
    del eng1
    # fresh engine instance = restarted driver; resumes from checkpoint
    eng2 = CDCEngine(spark, cfg)
    assert eng2.plan_batches() == [(2_000, 4_000), (4_000, 6_000)]
    eng2.run()
    expected = oracle.replay(spark.read.parquet(log_path).toPandas())
    oracle.assert_table_equal(eng2.read_table().toPandas(), expected)


def test_rerun_is_noop(spark, tmp_path):
    log_path = _mk_log(spark, tmp_path, seed=3, n=2_000, docs=200)
    cfg = JobConfig(log_path=log_path, table_path=str(tmp_path / "tbl"), batch_size=1_000)
    CDCEngine(spark, cfg).run()
    eng = CDCEngine(spark, cfg)
    assert eng.plan_batches() == []
    totals = eng.run()
    assert totals["batches"] == 0


def test_mid_stream_schema_evolution(spark, tmp_path):
    """v1 events then v2 events (adds lang, widens n_tok) in one log —
    engine evolves the table schema at the v2 batch boundary."""
    v1 = generate_changelog(spark, 2_000, 300, seed=4, schema_version=1)
    v2 = generate_changelog(spark, 4_000, 300, seed=4, schema_version=2).where(F.col("seq") > 2_000)
    v1_padded = v1.withColumn("lang", F.lit(None).cast("string")).withColumn(
        "n_tok", F.col("n_tok").cast("long"))
    log_path = str(tmp_path / "log")
    v1_padded.unionByName(v2).write.parquet(log_path)
    # the on-disk parquet union already has the v2 shape; emulate true
    # mid-stream arrival by feeding the two eras as separate log dfs
    tbl_path = str(tmp_path / "tbl")
    cfg = JobConfig(log_path=log_path, table_path=tbl_path, batch_size=2_000)
    eng = CDCEngine(spark, cfg, log_df=v1)
    eng.run()
    assert dict(eng.read_table().dtypes)["n_tok"] == "int"
    eng2 = CDCEngine(spark, cfg, log_df=v2)
    changes_logged = eng2.run()
    got = eng2.read_table()
    assert dict(got.dtypes)["n_tok"] == "bigint" and "lang" in got.columns
    full = v1_padded.unionByName(v2)
    expected = oracle.replay(full.toPandas(), value_cols=["tokens", "n_tok", "source", "lang"])
    actual = got.toPandas()
    actual["n_tok"] = actual["n_tok"].astype("int64")
    expected["n_tok"] = expected["n_tok"].astype("int64")
    oracle.assert_table_equal(actual, expected)
    assert changes_logged["applied_events"] > 0


def test_hot_key_skew_replay(spark, tmp_path):
    log_path = _mk_log(spark, tmp_path, seed=13, n=8_000, docs=400, hot_key_pct=50,
                       name="hotlog")
    cfg = JobConfig(log_path=log_path, table_path=str(tmp_path / "tbl"), batch_size=4_000)
    eng = CDCEngine(spark, cfg)
    eng.run()
    expected = oracle.replay(spark.read.parquet(log_path).toPandas())
    oracle.assert_table_equal(eng.read_table().toPandas(), expected)


def test_preview_commits_nothing(spark, tmp_path):
    log_path = _mk_log(spark, tmp_path, seed=5, n=1_000, docs=100)
    cfg = JobConfig(log_path=log_path, table_path=str(tmp_path / "tbl"))
    eng = CDCEngine(spark, cfg)
    prev = eng.preview().collect()
    assert len(prev) == 10 and [r["seq"] for r in prev] == list(range(1, 11))
    assert eng.table.lineage["last_applied_lsn"] == -1  # nothing applied
    assert eng.read_table().count() == 0


@pytest.mark.parametrize(
    "kw,msg",
    [
        ({"log_path": ""}, "log_path"),
        ({"batch_size": 0}, "batch_size"),
        ({"retry_limit": -1}, "retry_limit"),
        ({"n_buckets": 0}, "n_buckets"),
        ({"columns": [{"name": "x"}]}, "column spec"),
        ({"stream_max_files_per_trigger": 0}, "stream_max_files_per_trigger"),
        ({"stream_trigger": "continuous"}, "stream_trigger"),
        ({"stream_trigger_interval": "  "}, "stream_trigger_interval"),
    ],
)
def test_config_validation(kw, msg):
    base = dict(log_path="/x", table_path="/y")
    base.update(kw)
    with pytest.raises(ConfigError, match=msg):
        JobConfig(**base).validate()


def test_missing_source_fails_preflight(spark, tmp_path):
    cfg = JobConfig(log_path=str(tmp_path / "nope"), table_path=str(tmp_path / "t"))
    with pytest.raises(ConfigError, match="not found"):
        CDCEngine(spark, cfg)


@pytest.mark.parametrize("trigger_files", [8, 2])
def test_streaming_front_end_converges(spark, tmp_path, trigger_files):
    """Converges to the batch oracle under the default trigger size AND a
    non-default config'd one (more, smaller micro-batches — the
    stream_max_files_per_trigger knob actually reaches the source)."""
    from sparkcdc.streaming import run_streaming

    log_path = _mk_log(spark, tmp_path, seed=21, n=4_000, docs=300, dup_pct=10)
    cfg = JobConfig(
        log_path=log_path, table_path=str(tmp_path / "stbl"), n_buckets=16,
        stream_max_files_per_trigger=trigger_files,
    )
    totals = run_streaming(spark, cfg, checkpoint_dir=str(tmp_path / "ckpt"))
    expected = oracle.replay(spark.read.parquet(log_path).toPandas())
    got = IceboxTable.load(spark, cfg.table_path).read().toPandas()
    oracle.assert_table_equal(got, expected)
    assert totals["applied_events"] > 0
    if trigger_files == 2:
        # smaller trigger → strictly more micro-batches over the same WAL
        n_files = len(spark.read.parquet(log_path).inputFiles())
        assert totals["batches"] >= (n_files + 1) // 2


def test_mor_replay_matches_oracle_and_compaction(spark, tmp_path):
    """Merge-on-read mode: delta-file commits converge to the same final
    state as COW, with and without periodic compaction."""
    log_path = _mk_log(spark, tmp_path, seed=31, n=6_000, docs=400, dup_pct=10,
                       name="morlog")
    expected = oracle.replay(spark.read.parquet(log_path).toPandas())

    cfg1 = JobConfig(log_path=log_path, table_path=str(tmp_path / "mor1"),
                     batch_size=1_500, merge_mode="mor", n_buckets=8)
    eng1 = CDCEngine(spark, cfg1)
    eng1.run()
    manifest = eng1.table.snapshot["manifest"]
    assert any(e.get("kind") == "delta" for e in manifest)
    oracle.assert_table_equal(eng1.read_table().toPandas(), expected)

    # deltas fold away after compaction, state unchanged
    eng1.table.compact()
    assert not any(e.get("kind") == "delta" for e in eng1.table.snapshot["manifest"])
    oracle.assert_table_equal(eng1.read_table().toPandas(), expected)

    # periodic auto-compaction path
    cfg2 = JobConfig(log_path=log_path, table_path=str(tmp_path / "mor2"),
                     batch_size=1_500, merge_mode="mor", compact_every=2, n_buckets=8)
    eng2 = CDCEngine(spark, cfg2)
    eng2.run()
    oracle.assert_table_equal(eng2.read_table().toPandas(), expected)
    assert any(r.get("kind") == "compact" for r in eng2.metrics.records)


def test_mor_resume_after_kill(spark, tmp_path):
    log_path = _mk_log(spark, tmp_path, seed=37, n=4_000, docs=300, name="morres")
    cfg = JobConfig(log_path=log_path, table_path=str(tmp_path / "tbl"),
                    batch_size=1_000, merge_mode="mor", n_buckets=8)
    CDCEngine(spark, cfg).run(max_batches=2)
    eng = CDCEngine(spark, cfg)
    assert eng.plan_batches() == [(2_000, 3_000), (3_000, 4_000)]
    eng.run()
    expected = oracle.replay(spark.read.parquet(log_path).toPandas())
    oracle.assert_table_equal(eng.read_table().toPandas(), expected)


def test_json_lines_wal(spark, tmp_path):
    """JSON-lines WAL (the reference's native wire format) replays to the
    same state as the parquet WAL."""
    from sparkcdc.changelog import generate_changelog

    log = generate_changelog(spark, 2_000, 200, seed=41)
    jdir = str(tmp_path / "waljson")
    log.write.json(jdir)
    cfg = JobConfig(log_path=jdir, table_path=str(tmp_path / "tbl"),
                    batch_size=1_000, log_format="json", n_buckets=8)
    eng = CDCEngine(spark, cfg)
    eng.run()
    expected = oracle.replay(log.toPandas())
    oracle.assert_table_equal(eng.read_table().toPandas(), expected)


def test_streaming_late_data_across_restarts(spark, tmp_path):
    """T5 late data: a second stream drain delivers files whose seqs are
    LOWER than already-applied ones (late arrival). Tombstone-mode LWW
    must converge to the full-oracle state, not resurrect or regress."""
    from sparkcdc.streaming import run_streaming

    log = generate_changelog(spark, 4_000, 300, seed=47)
    early = log.where(F.col("seq") > 2_000)   # newer events arrive FIRST
    late = log.where(F.col("seq") <= 2_000)   # older events arrive LATE
    log_dir = str(tmp_path / "wal")
    early.write.mode("append").parquet(log_dir)
    cfg = JobConfig(log_path=log_dir, table_path=str(tmp_path / "tbl"), n_buckets=8)
    ckpt = str(tmp_path / "ckpt")
    run_streaming(spark, cfg, checkpoint_dir=ckpt)
    state_early = IceboxTable.load(spark, cfg.table_path).read().toPandas()
    assert len(state_early) > 0
    # late files land; the SAME checkpoint resumes and drains only them
    late.write.mode("append").parquet(log_dir)
    run_streaming(spark, cfg, checkpoint_dir=ckpt)
    expected = oracle.replay(log.toPandas())
    got = IceboxTable.load(spark, cfg.table_path).read().toPandas()
    oracle.assert_table_equal(got, expected)


def test_engine_guess_entry_point(spark, tmp_path):
    log_path = _mk_log(spark, tmp_path, seed=53, n=500, docs=50)
    cfg = JobConfig(log_path=log_path, table_path=str(tmp_path / "t"))
    specs = {s["name"]: s["type"] for s in CDCEngine(spark, cfg).guess()}
    assert specs["doc_id"] == "string" and specs["op"] == "string"
    assert specs["seq"] == "long" and specs["n_tok"] == "long"
    # primitive arrays hit the F4 "String value" sentinel → guess string,
    # exactly like the reference's type guesser
    assert specs["ts"] == "timestamp" and specs["tokens"] == "string"


def test_retry_exhaustion_and_recovery(spark, tmp_path, monkeypatch):
    """Driver-level retry: transient merge failures are retried with
    backoff (reference retry semantics, JiraClient.java:94-147); a
    persistent failure surfaces after retry_limit attempts."""
    log_path = _mk_log(spark, tmp_path, seed=59, n=1_000, docs=100)
    cfg = JobConfig(log_path=log_path, table_path=str(tmp_path / "t"),
                    retry_limit=2, retry_initial_wait_sec=0.01, n_buckets=4)
    eng = CDCEngine(spark, cfg)
    real_merge = eng.table.merge
    calls = {"n": 0}

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] <= 2:
            raise RuntimeError("transient I/O")
        return real_merge(*a, **kw)

    monkeypatch.setattr(eng.table, "merge", flaky)
    eng.run()  # succeeds on 3rd attempt
    assert calls["n"] == 3
    expected = oracle.replay(spark.read.parquet(log_path).toPandas())
    oracle.assert_table_equal(eng.read_table().toPandas(), expected)

    # persistent failure exhausts retries (fresh table → work pending)
    cfg2 = JobConfig(log_path=log_path, table_path=str(tmp_path / "t2"),
                     retry_limit=1, retry_initial_wait_sec=0.01, n_buckets=4)
    eng2 = CDCEngine(spark, cfg2)
    monkeypatch.setattr(eng2.table, "merge",
                        lambda *a, **kw: (_ for _ in ()).throw(RuntimeError("down")))
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="down"):
        eng2.run()


def test_chaos_combined_scenario(spark, tmp_path):
    """Everything at once: duplicates + shuffle + hot key + mid-stream
    schema evolution + kill/resume + MOR + periodic compaction."""
    v1 = generate_changelog(spark, 3_000, 250, seed=61, dup_pct=15,
                            shuffled=True, hot_key_pct=40, schema_version=1)
    v2 = generate_changelog(spark, 6_000, 250, seed=61, dup_pct=15,
                            shuffled=True, hot_key_pct=40,
                            schema_version=2).where(F.col("seq") > 3_000)
    tbl = str(tmp_path / "tbl")
    cfg = dict(log_path="unused", table_path=tbl, batch_size=1_000,
               merge_mode="mor", compact_every=3, n_buckets=8)
    # era 1, killed after 2 of 3 batches
    CDCEngine(spark, JobConfig(**cfg), log_df=v1).run(max_batches=2)
    # restart finishes era 1
    CDCEngine(spark, JobConfig(**cfg), log_df=v1).run()
    # era 2 evolves schema mid-stream, killed once more, restarted
    CDCEngine(spark, JobConfig(**cfg), log_df=v2).run(max_batches=1)
    CDCEngine(spark, JobConfig(**cfg), log_df=v2).run()

    full = v1.withColumn("lang", F.lit(None).cast("string")).withColumn(
        "n_tok", F.col("n_tok").cast("long")).unionByName(v2)
    expected = oracle.replay(full.toPandas(),
                             value_cols=["tokens", "n_tok", "source", "lang"])
    eng = CDCEngine(spark, JobConfig(**cfg), log_df=v2)
    got = eng.read_table().toPandas()
    got["n_tok"] = got["n_tok"].astype("int64")
    expected["n_tok"] = expected["n_tok"].astype("int64")
    oracle.assert_table_equal(got, expected)


def test_retry_classifier_matrix(spark, tmp_path, monkeypatch):
    """Reference retry matrix (client/JiraClient.java:100-147, tests
    JiraClientTest.java:143-192): deterministic errors (the 4xx analog)
    fail fast without retrying; transient ones (IOException / 5xx analog)
    retry with backoff."""
    from sparkcdc.engine import is_retryable

    assert not is_retryable(ConfigError("bad config"))
    assert not is_retryable(ValueError("bad arg"))
    assert not is_retryable(TypeError("bad type"))
    assert is_retryable(OSError("connection reset"))
    assert is_retryable(RuntimeError("executor lost"))
    try:
        from pyspark.errors import AnalysisException

        assert not is_retryable(AnalysisException("plan error"))
    except TypeError:
        pass  # ctor signature differs — covered by the engine test below

    # the engine must NOT burn retries on a deterministic failure
    log_path = _mk_log(spark, tmp_path, seed=67, n=500, docs=50)
    cfg = JobConfig(log_path=log_path, table_path=str(tmp_path / "t"),
                    retry_limit=5, retry_initial_wait_sec=0.01, n_buckets=4)
    eng = CDCEngine(spark, cfg)
    calls = {"n": 0}

    def deterministic(*a, **kw):
        calls["n"] += 1
        raise ValueError("deterministic plan failure")

    import pytest as _pytest
    monkeypatch.setattr(eng.table, "merge", deterministic)
    with _pytest.raises(ValueError, match="deterministic"):
        eng.run()
    assert calls["n"] == 1  # zero retries


def test_dynamic_schema_reguesses_per_run(spark, tmp_path):
    """dynamic_schema=True re-guesses the column set at run start and
    applies it via a schema-update commit (JiraInputPlugin.java:89-91,
    108-123): a string column whose sampled values all match a timestamp
    format is upgraded table-side; an empty dataset keeps the schema."""
    rows = [
        (i + 1, "upsert", f"D{i % 10}", i, f"2024-01-{i % 9 + 1:02d}")
        for i in range(200)
    ]
    log = spark.createDataFrame(
        rows, "seq: long, op: string, doc_id: string, n_tok: int, created: string"
    )
    wal = str(tmp_path / "wal")
    log.write.parquet(wal)

    cfg = JobConfig(log_path=wal, table_path=str(tmp_path / "t"),
                    batch_size=100, n_buckets=4, dynamic_schema=True)
    eng = CDCEngine(spark, cfg)
    assert dict(eng.table.schema["created"].__dict__)["dataType"].simpleString() == "string"
    eng.run()
    assert eng.table.schema["created"].dataType.simpleString() == "timestamp"
    got = eng.read_table().where(F.col("doc_id") == "D0").collect()
    import datetime as _dt
    assert all(isinstance(r["created"], _dt.datetime) for r in got)
    assert any(r.get("kind") == "dynamic-schema" for r in eng.metrics.records)

    # empty dataset: tolerated, schema unchanged (reference empty tolerance)
    empty = spark.createDataFrame([], log.schema)
    cfg2 = JobConfig(log_path=wal, table_path=str(tmp_path / "t2"),
                     batch_size=100, n_buckets=4, dynamic_schema=True)
    eng2 = CDCEngine(spark, cfg2, log_df=empty)
    eng2.run()
    assert eng2.table.schema["created"].dataType.simpleString() == "string"


def test_error_message_extraction_matrix(tmp_path):
    """C10 parity (client/JiraClient.java:181-194): errorMessages[] joined
    with ' , '; absent/empty/malformed → raw body. The _ERROR sidecar in a
    WAL dir fails the pre-flight with the extracted message."""
    from sparkcdc.config import extract_error_messages

    assert extract_error_messages('{"errorMessages": ["a", "b"]}') == "a , b"
    assert extract_error_messages('{"errorMessages": []}') == '{"errorMessages": []}'
    assert extract_error_messages('{"other": 1}') == '{"other": 1}'
    assert extract_error_messages("plain text failure") == "plain text failure"

    wal = tmp_path / "wal"
    wal.mkdir()
    (wal / "_ERROR").write_text('{"errorMessages": ["quota exceeded", "retry later"]}')
    cfg = JobConfig(log_path=str(wal), table_path=str(tmp_path / "t"))
    import pytest as _pytest
    with _pytest.raises(ConfigError, match="quota exceeded , retry later"):
        cfg.check_source()


def test_streaming_continuous_returns_live_query(spark, tmp_path):
    """available_now=False returns the live (StreamingQuery, engine) pair
    (the old API dropped the handle, orphaning the query); the query is
    awaitable/stoppable and the micro-batches it applied are committed."""
    from pyspark.sql.streaming import StreamingQuery
    from sparkcdc.streaming import run_streaming

    log_path = _mk_log(spark, tmp_path, seed=71, n=2_000, docs=200)
    cfg = JobConfig(log_path=log_path, table_path=str(tmp_path / "ctbl"), n_buckets=8)
    query, engine = run_streaming(
        spark, cfg, checkpoint_dir=str(tmp_path / "cckpt"), available_now=False
    )
    try:
        assert isinstance(query, StreamingQuery)
        import time as _time

        deadline = _time.time() + 60
        while _time.time() < deadline:
            if engine.metrics.records and engine.table.read().count() > 0:
                break
            _time.sleep(0.5)
        assert engine.table.read().count() > 0
        assert any(r.get("kind") == "stream-batch" for r in engine.metrics.records)
    finally:
        query.stop()


def test_streaming_processing_time_trigger_from_config(spark, tmp_path):
    """stream_trigger='processing_time' + interval reach the live query:
    the trigger clause lands in the query's progress and the stream still
    converges to the batch oracle."""
    from sparkcdc.streaming import run_streaming

    log_path = _mk_log(spark, tmp_path, seed=73, n=2_000, docs=200)
    cfg = JobConfig(
        log_path=log_path, table_path=str(tmp_path / "ptbl"), n_buckets=8,
        stream_trigger="processing_time", stream_trigger_interval="1 seconds",
        stream_max_files_per_trigger=4,
    ).validate()
    query, engine = run_streaming(
        spark, cfg, checkpoint_dir=str(tmp_path / "pckpt"), available_now=False
    )
    try:
        import time as _time

        expected = oracle.replay(spark.read.parquet(log_path).toPandas())
        deadline = _time.time() + 90
        while _time.time() < deadline:
            if engine.table.refresh() and engine.table.read().count() == len(expected):
                break
            _time.sleep(0.5)
        oracle.assert_table_equal(engine.table.read().toPandas(), expected)
    finally:
        query.stop()


def test_stateful_lww_streaming_operator(spark, tmp_path):
    """applyInPandasWithState custom stateful operator (§2.9): per-key
    winner state survives across triggers; duplicates and out-of-order
    delivery lose against stored max-seq; final winners == oracle replay."""
    from sparkcdc.stateful import run_stateful_lww

    log = generate_changelog(spark, 3_000, 250, seed=83, dup_pct=15, shuffled=True)
    wal = str(tmp_path / "swal")
    # many small files → several availableNow triggers → cross-trigger state
    log.repartition(12).write.parquet(wal)
    final = run_stateful_lww(spark, wal, checkpoint_dir=str(tmp_path / "sckpt"),
                             query_name="lww_state_t1")
    got = final.where(F.col("op") != "delete").drop("op").toPandas()
    expected = oracle.replay(spark.read.parquet(wal).toPandas())
    oracle.assert_table_equal(got, expected)


def test_declared_columns_fixed_schema_mode(spark, tmp_path):
    """Fixed-schema ingestion (the reference's primary mode, README.md
    `columns:`): every batch is projected through the declared columns
    with null-on-error coercion; the table schema comes from the specs;
    undeclared columns never reach the table."""
    rows = [
        (i + 1, "upsert", f"D{i % 20}", str(i * 3), f"2024-02-{i % 9 + 1:02d}",
         "noise")
        for i in range(300)
    ]
    log = spark.createDataFrame(
        rows,
        "seq: long, op: string, doc_id: string, score: string, "
        "created: string, junk: string",
    )
    wal = str(tmp_path / "wal")
    log.write.parquet(wal)
    cols = [
        {"name": "doc_id", "type": "string"},
        {"name": "score", "type": "long"},  # string → strict-int coercion
        {"name": "created", "type": "timestamp", "format": "%Y-%m-%d"},
    ]
    cfg = JobConfig(log_path=wal, table_path=str(tmp_path / "t"),
                    batch_size=100, n_buckets=4, columns=cols)
    eng = CDCEngine(spark, cfg)
    eng.run()
    got = eng.read_table()
    assert set(got.columns) == {"doc_id", "score", "created"}  # junk dropped
    assert dict(got.dtypes) == {"doc_id": "string", "score": "bigint",
                                "created": "timestamp"}
    import datetime as _dt
    r = got.where(F.col("doc_id") == "D1").collect()[0]
    assert isinstance(r["score"], int) and isinstance(r["created"], _dt.datetime)
    # preview honors the declared projection too
    prev = eng.preview()
    assert set(prev.columns) == {"seq", "op", "doc_id", "score", "created"}

    # the merge key must be among the declared columns
    import pytest as _pytest
    with _pytest.raises(ConfigError, match="merge key"):
        JobConfig(log_path=wal, table_path="x",
                  columns=[{"name": "score", "type": "long"}]).validate()


def test_pyfiles_zip_importable(tmp_path):
    """spark-submit --py-files packaging: the zip must be importable on a
    bare sys.path (what executors see)."""
    import subprocess
    import sys as _sys

    sys_path_repo = "/root/repo"
    out = str(tmp_path / "sparkcdc.zip")
    r = subprocess.run(
        [_sys.executable, f"{sys_path_repo}/tools/make_pyfiles.py", out],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    probe = subprocess.run(
        [_sys.executable, "-c",
         f"import sys; sys.path.insert(0, {out!r}); "
         "import sparkcdc, sparkcdc.icebox, sparkcdc.stateful, sparkcdc.ann; "
         "print(sparkcdc.__version__)"],
        capture_output=True, text=True, cwd=str(tmp_path),
    )
    assert probe.returncode == 0, probe.stderr
    assert probe.stdout.strip() == "0.1.0"


def test_plan_batches_footer_stats_and_fallback(spark, tmp_path):
    """The parquet WAL planner reads max-LSN from footer statistics (no
    Spark job); files written WITHOUT statistics fall back to the scan
    path and still plan correctly."""
    from sparkcdc.changelog import max_seq_parquet_stats

    log_path = _mk_log(spark, tmp_path, seed=97, n=1_000, docs=100)
    assert max_seq_parquet_stats(log_path) == 1_000

    # stats-less WAL: pyarrow write with statistics disabled
    import pyarrow as pa
    import pyarrow.parquet as pq

    nostats = tmp_path / "nostats"
    nostats.mkdir()
    t = pa.table({"seq": [1, 2, 3], "op": ["upsert"] * 3,
                  "doc_id": ["a", "b", "c"],
                  "n_tok": [1, 1, 1], "source": ["s"] * 3})
    pq.write_table(t, str(nostats / "part-0.parquet"), write_statistics=False)
    assert max_seq_parquet_stats(str(nostats)) is None  # signals fallback

    cfg = JobConfig(log_path=str(nostats), table_path=str(tmp_path / "t"),
                    batch_size=10, n_buckets=4)
    eng = CDCEngine(spark, cfg)
    assert eng.plan_batches() == [(0, 3)]  # planned via the Spark fallback
    eng.run()
    assert eng.read_table().count() == 3


def test_stats_driven_auto_compaction(spark, tmp_path):
    """merge_mode=auto + compact_delta_files: tiny batches on a grown table
    land as MOR deltas, and compaction fires automatically once the delta
    count crosses the threshold — file count stays bounded, state exact."""
    log_path = _mk_log(spark, tmp_path, seed=99, n=2_000, docs=150)
    cfg = JobConfig(log_path=log_path, table_path=str(tmp_path / "t"),
                    batch_size=50, n_buckets=8, merge_mode="auto",
                    compact_delta_files=12)
    eng = CDCEngine(spark, cfg)
    eng.run(max_batches=20)  # first big-ish batches COW, then deltas pile up
    compacts = [r for r in eng.metrics.records if r.get("kind") == "compact"]
    manifest = eng.table.snapshot["manifest"]
    n_delta = sum(1 for e in manifest if e.get("kind") == "delta")
    assert n_delta <= 12 + cfg.n_buckets  # bounded by threshold + one round
    if any(r.get("merge_plan", "").endswith("+auto-mor")
           for r in eng.metrics.records):
        assert compacts  # deltas existed → compaction fired
    # exactness preserved under the mixed plan
    eng.run()  # finish the log
    expected = oracle.replay(
        spark.read.parquet(log_path).toPandas()
    )
    oracle.assert_table_equal(eng.read_table().toPandas(), expected)


def test_dynamic_schema_parses_non_iso_formats(spark, tmp_path):
    """Regression: a dynamic re-guess upgrade must parse with the DETECTED
    format — a plain cast NULLs epoch-seconds and slash dates silently."""
    rows = [(i + 1, "upsert", f"D{i % 10}", str(1_700_000_000 + i), "05/03/2024")
            for i in range(100)]
    log = spark.createDataFrame(
        rows, "seq: long, op: string, doc_id: string, epoch: string, slashed: string"
    )
    wal = str(tmp_path / "wal")
    log.write.parquet(wal)
    cfg = JobConfig(log_path=wal, table_path=str(tmp_path / "t"),
                    batch_size=100, n_buckets=4, dynamic_schema=True)
    eng = CDCEngine(spark, cfg)
    eng.run()
    got = eng.read_table()
    assert dict(got.dtypes)["epoch"] == "timestamp"
    assert dict(got.dtypes)["slashed"] == "timestamp"
    rows_out = got.collect()
    assert rows_out and all(r["epoch"] is not None for r in rows_out)
    assert all(r["slashed"] is not None for r in rows_out)
    import datetime as _dt
    assert all(r["slashed"] == _dt.datetime(2024, 3, 5) for r in rows_out)


def test_declared_columns_can_include_event_time(spark, tmp_path):
    """Regression: declaring cfg.ts_col among the columns must not produce
    a duplicate/ambiguous column in the merge."""
    rows = [(i + 1, "upsert", f"D{i % 5}", f"2024-01-0{i % 9 + 1} 00:00:00")
            for i in range(50)]
    log = spark.createDataFrame(
        rows, "seq: long, op: string, doc_id: string, ts: string"
    )
    wal = str(tmp_path / "wal")
    log.write.parquet(wal)
    cols = [
        {"name": "doc_id", "type": "string"},
        {"name": "ts", "type": "timestamp", "format": "%Y-%m-%d %H:%M:%S"},
    ]
    cfg = JobConfig(log_path=wal, table_path=str(tmp_path / "t"),
                    batch_size=25, n_buckets=4, columns=cols)
    eng = CDCEngine(spark, cfg)
    eng.run()  # used to raise AMBIGUOUS_REFERENCE on max(ts)
    got = eng.read_table()
    assert got.columns.count("ts") == 1
    assert dict(got.dtypes)["ts"] == "timestamp"
    assert got.count() == 5
    # watermark metric rode the declared (coerced) event-time column
    assert any(r.get("watermark_lag_sec") is not None for r in eng.metrics.records)


def test_stateful_lww_ttl_evicts_idle_state(spark, tmp_path):
    """state_ttl_ms bounds the state store in a CONTINUOUS query: an idle
    key is evicted by the processing-time timeout, so a LATE lower-seq
    event afterwards re-seeds state and is re-emitted (the documented
    trade — a downstream fence absorbs it). Note availableNow triggers
    never terminate with pending processing-time timeouts, so TTL is a
    continuous-tail feature by construction."""
    import time as _time

    from sparkcdc.stateful import streaming_lww

    schema = ("seq bigint, op string, doc_id string, n_tok int, source string, "
              "tokens array<int>")
    wal = str(tmp_path / "wal")
    spark.createDataFrame([(10, "upsert", "K", 1, "s", [1])], schema).write.parquet(wal)
    emitted = []
    stream = spark.readStream.schema(spark.read.parquet(wal).schema).parquet(wal)
    q = (
        streaming_lww(stream, state_ttl_ms=300)
        .writeStream.foreachBatch(
            lambda df, _eid: emitted.extend(
                (r["doc_id"], r["seq"]) for r in df.collect()
            )
        )
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="400 milliseconds")
        .start()
    )
    try:
        deadline = _time.time() + 60
        while _time.time() < deadline and ("K", 10) not in emitted:
            _time.sleep(0.3)
        assert ("K", 10) in emitted
        _time.sleep(3)  # several empty triggers: TTL fires, state evicted
        spark.createDataFrame([(5, "upsert", "K", 2, "s", [2])], schema) \
            .write.mode("append").parquet(wal)
        deadline = _time.time() + 60
        while _time.time() < deadline and ("K", 5) not in emitted:
            _time.sleep(0.3)
        # late lower-seq event re-seeded evicted state and was re-emitted
        assert ("K", 5) in emitted
    finally:
        q.stop()


def test_chaos_auto_mode_scenario(spark, tmp_path):
    """The chaos scenario under merge_mode=auto + stats-driven compaction:
    duplicates + shuffle + hot key + mid-stream evolution + kill/resume,
    with the engine choosing COW/MOR per batch and folding deltas on its
    own. Final state must still equal the oracle byte-for-byte."""
    v1 = generate_changelog(spark, 3_000, 250, seed=63, dup_pct=15,
                            shuffled=True, hot_key_pct=40, schema_version=1)
    v2 = generate_changelog(spark, 6_000, 250, seed=63, dup_pct=15,
                            shuffled=True, hot_key_pct=40,
                            schema_version=2).where(F.col("seq") > 3_000)
    tbl = str(tmp_path / "tbl")
    cfg = dict(log_path="unused", table_path=tbl, batch_size=500,
               merge_mode="auto", compact_delta_files=10, n_buckets=8)
    CDCEngine(spark, JobConfig(**cfg), log_df=v1).run(max_batches=3)
    CDCEngine(spark, JobConfig(**cfg), log_df=v1).run()
    CDCEngine(spark, JobConfig(**cfg), log_df=v2).run(max_batches=2)
    eng = CDCEngine(spark, JobConfig(**cfg), log_df=v2)
    eng.run()

    plans = {r.get("merge_plan", "").split("+")[-1]
             for r in eng.metrics.records if r.get("kind") == "batch"}
    full = v1.withColumn("lang", F.lit(None).cast("string")).withColumn(
        "n_tok", F.col("n_tok").cast("long")).unionByName(v2)
    expected = oracle.replay(full.toPandas(),
                             value_cols=["tokens", "n_tok", "source", "lang"])
    got = eng.read_table().toPandas()
    got["n_tok"] = got["n_tok"].astype("int64")
    expected["n_tok"] = expected["n_tok"].astype("int64")
    oracle.assert_table_equal(got, expected)


def test_streaming_auto_mode_with_compaction(spark, tmp_path):
    """Streaming path with cost-based writes: steady-state micro-batches
    land as MOR deltas and compact_delta_files folds them; the drained
    table still equals the oracle."""
    from sparkcdc.streaming import run_streaming

    log = generate_changelog(spark, 4_000, 300, seed=65, dup_pct=10)
    log_dir = str(tmp_path / "wal")
    # many small files → many small stream epochs after the first
    log.repartition(24).write.parquet(log_dir)
    cfg = JobConfig(log_path=log_dir, table_path=str(tmp_path / "tbl"),
                    n_buckets=8, compact_delta_files=16)
    run_streaming(spark, cfg, checkpoint_dir=str(tmp_path / "ckpt"))
    t = IceboxTable.load(spark, cfg.table_path)
    n_delta = sum(1 for e in t.snapshot["manifest"] if e.get("kind") == "delta")
    assert n_delta <= 16 + cfg.n_buckets  # compaction kept deltas bounded
    expected = oracle.replay(spark.read.parquet(log_dir).toPandas())
    oracle.assert_table_equal(t.read().toPandas(), expected)


def test_json_wal_planning_uses_sidecar(spark, tmp_path, monkeypatch):
    """JSON-WAL planning parity (a WAL format without footer stats): a
    per-file max-LSN sidecar makes planning O(new segments) — an
    UNCHANGED WAL plans with zero Spark scans, and after an append only
    the new segment files are scanned."""
    import os

    import sparkcdc.changelog as cl
    import sparkcdc.engine as eng_mod

    log = generate_changelog(spark, 1_000, 100, seed=43)
    jdir = str(tmp_path / "waljson")
    log.write.json(jdir)
    cfg = JobConfig(log_path=jdir, table_path=str(tmp_path / "tbl"),
                    batch_size=500, log_format="json", n_buckets=4)
    eng = CDCEngine(spark, cfg)
    assert eng.plan_batches() == [(0, 500), (500, 1_000)]
    sidecar = os.path.join(cfg.table_path, "metadata", "wal_stats.json")
    assert os.path.exists(sidecar)

    # warm sidecar + unchanged WAL → planning must not scan at all
    def boom(*a, **k):
        raise AssertionError("json WAL planning scanned despite warm sidecar")

    monkeypatch.setattr(cl, "_scan_json_max_by_file", boom)
    monkeypatch.setattr(eng_mod, "max_seq", boom)
    eng2 = CDCEngine(spark, cfg)
    assert eng2.plan_batches() == [(0, 500), (500, 1_000)]

    # appended segments → exactly the NEW files are scanned, not the log
    monkeypatch.undo()
    orig = cl._scan_json_max_by_file
    calls: list[list[str]] = []

    def spy(spark_, files, schema, seq_col):
        calls.append(sorted(files))
        return orig(spark_, files, schema, seq_col)

    monkeypatch.setattr(cl, "_scan_json_max_by_file", spy)
    more = generate_changelog(spark, 1_500, 100, seed=43).where(F.col("seq") > 1_000)
    more.coalesce(1).write.mode("append").json(jdir)
    eng3 = CDCEngine(spark, cfg)
    assert eng3.plan_batches() == [(0, 500), (500, 1_000), (1_000, 1_500)]
    import glob as _glob
    total = len(_glob.glob(os.path.join(jdir, "*.json")))
    assert len(calls) == 1 and 0 < len(calls[0]) < total


def test_custom_seq_col_with_decoy_seq_column(spark, tmp_path):
    """Footer-stats planning respects cfg.seq_col: a WAL whose LSN column
    is 'lsn' alongside an UNRELATED column literally named 'seq' must plan
    and fence from 'lsn' (the decoy would yield a bogus 999999 HWM)."""
    orig = generate_changelog(spark, 1_000, 100, seed=47)
    log = orig.withColumnRenamed("seq", "lsn").withColumn(
        "seq", F.lit(999_999).cast("long")
    )
    wal = str(tmp_path / "wal")
    write_log_parquet(log, wal, seq_col="lsn")
    cfg = JobConfig(log_path=wal, table_path=str(tmp_path / "t"),
                    batch_size=400, seq_col="lsn", n_buckets=4)
    eng = CDCEngine(spark, cfg)
    assert eng.plan_batches() == [(0, 400), (400, 800), (800, 1_000)]
    eng.run()
    assert eng.table.lineage["last_applied_lsn"] == 1_000
    expected = oracle.replay(orig.toPandas())
    oracle.assert_table_equal(eng.read_table().drop("seq").toPandas(), expected)


def test_dynamic_reguess_rejection_is_surfaced(spark, tmp_path, monkeypatch):
    """Fixed-schema + dynamic_schema: a re-guess that drops the merge key
    is rejected VISIBLY (metrics record, was a silent no-op) and the
    caller-owned JobConfig keeps its adopted column set."""
    rows = [(i + 1, "upsert", f"D{i}", i) for i in range(50)]
    log = spark.createDataFrame(
        rows, "seq: long, op: string, doc_id: string, n_tok: int"
    )
    wal = str(tmp_path / "wal")
    log.write.parquet(wal)
    cols = [{"name": "doc_id", "type": "string"}, {"name": "n_tok", "type": "long"}]
    cfg = JobConfig(log_path=wal, table_path=str(tmp_path / "t"), batch_size=50,
                    n_buckets=4, dynamic_schema=True, columns=list(cols))
    eng = CDCEngine(spark, cfg)
    # simulate a source whose sample lost the key field mid-stream
    import sparkcdc.schema_infer as si
    monkeypatch.setattr(
        si, "guess_columns", lambda df, **k: [{"name": "n_tok", "type": "long"}]
    )
    eng.run()
    recs = [r for r in eng.metrics.records if r.get("kind") == "dynamic-schema-rejected"]
    assert recs and "doc_id" in recs[0]["reason"]
    assert cfg.columns == cols  # config not mutated by the rejected guess
    assert eng.read_table().count() == 50


def test_dynamic_reguess_never_rewrites_key_type(spark, tmp_path):
    """A merge key whose string values all look like epoch seconds must
    NOT be upgraded to timestamp by the per-run re-guess — the key's type
    is pinned (a silent key rewrite would corrupt bucketing + joins)."""
    rows = [(i + 1, "upsert", str(1_700_000_000 + i), "x") for i in range(60)]
    log = spark.createDataFrame(
        rows, "seq: long, op: string, doc_id: string, payload: string"
    )
    wal = str(tmp_path / "wal")
    log.write.parquet(wal)
    cfg = JobConfig(log_path=wal, table_path=str(tmp_path / "t"),
                    batch_size=100, n_buckets=4, dynamic_schema=True)
    eng = CDCEngine(spark, cfg)
    eng.run()
    assert eng.table.schema["doc_id"].dataType.simpleString() == "string"
    assert eng.read_table().count() == 60


def test_streaming_fresh_checkpoint_namespaced_batch_ids(spark, tmp_path):
    """A NEW checkpoint over an EXISTING table must not collide with the
    previous run's fenced epoch ids (ADVICE: 'stream-epoch-0' reuse meant
    silently skipped epochs): ids are namespaced per checkpoint, so the
    fresh run replays the whole log idempotently and picks up events the
    first run never saw."""
    from sparkcdc.streaming import run_streaming

    log_path = str(tmp_path / "wal")
    generate_changelog(spark, 2_000, 150, seed=51).write.parquet(log_path)
    cfg = JobConfig(log_path=log_path, table_path=str(tmp_path / "tbl"), n_buckets=8)
    t1 = run_streaming(spark, cfg, checkpoint_dir=str(tmp_path / "ckptA"))
    assert t1["applied_events"] == 2_000
    generate_changelog(spark, 3_000, 150, seed=51).where(
        F.col("seq") > 2_000
    ).write.mode("append").parquet(log_path)
    t2 = run_streaming(spark, cfg, checkpoint_dir=str(tmp_path / "ckptB"))
    # full re-read under fresh ids: nothing fenced out, replay idempotent
    assert t2["applied_events"] == 3_000
    expected = oracle.replay(generate_changelog(spark, 3_000, 150, seed=51).toPandas())
    got = IceboxTable.load(spark, cfg.table_path).read().toPandas()
    oracle.assert_table_equal(got, expected)


def test_auto_rebucket_grows_layout_with_table(spark, tmp_path):
    """target_bucket_bytes drives stats-based partition evolution: as the
    replay grows the table past the per-bucket target, the engine doubles
    the bucket count mid-run (metrics record it), later batches merge into
    the evolved layout, and the final state still matches the oracle."""
    log_path = _mk_log(spark, tmp_path, n=6_000, docs=2_000, seed=77, dup_pct=10)
    cfg = JobConfig(
        log_path=log_path, table_path=str(tmp_path / "tbl"),
        batch_size=1_500, n_buckets=2, target_bucket_bytes=8_192,
    )
    eng = CDCEngine(spark, cfg)
    eng.run()
    assert eng.table.n_buckets > 2
    assert eng.table.n_buckets % 2 == 0  # doubling steps
    rebuckets = [e for e in eng.metrics.records if e.get("kind") == "rebucket"]
    assert rebuckets and all(r["rebucketed"] for r in rebuckets)
    # avg bucket size was brought back under target at each step
    last = rebuckets[-1]
    assert last["n_buckets"] == eng.table.n_buckets
    expected = oracle.replay(spark.read.parquet(log_path).toPandas())
    oracle.assert_table_equal(eng.read_table().toPandas(), expected)
    # resume still works against the evolved layout (fresh driver)
    eng2 = CDCEngine(spark, cfg)
    assert eng2.plan_batches() == []


def test_target_bucket_bytes_validation(spark):
    with pytest.raises(ConfigError):
        JobConfig(log_path="x", table_path="y", target_bucket_bytes=0).validate()


def test_spark_submit_pyfiles_end_to_end(tmp_path):
    """The north-rule launch mode, actually exercised: `spark-submit
    --py-files sparkcdc.zip driver.py` in a fresh JVM whose ONLY access
    to the engine is the zip (repo not on the path) replays a generated
    change log through the full engine and commits an icebox table; the
    test asserts the emitted totals and reads the table back."""
    import json as _json
    import shutil
    import subprocess
    import sys as _sys

    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    out_zip = str(tmp_path / "sparkcdc.zip")
    r = subprocess.run(
        [_sys.executable, "/root/repo/tools/make_pyfiles.py", out_zip],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr

    driver = tmp_path / "driver.py"
    table_path = str(tmp_path / "tbl")
    driver.write_text(
        "import json, os, sys\n"
        "from sparkcdc.session import get_spark\n"
        "from sparkcdc.changelog import generate_changelog, write_log_parquet\n"
        "from sparkcdc.config import JobConfig\n"
        "from sparkcdc.engine import CDCEngine\n"
        "spark = get_spark(app='submit-smoke', master='local[4]',\n"
        "                  shuffle_partitions=4, driver_memory='3g')\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
        "wal, tbl = sys.argv[1], sys.argv[2]\n"
        "write_log_parquet(generate_changelog(spark, 5000, 400, seed=11,\n"
        "                  dup_pct=10), wal, partitions=4)\n"
        "eng = CDCEngine(spark, JobConfig(log_path=wal, table_path=tbl,\n"
        "                batch_size=2500, n_buckets=8))\n"
        "totals = eng.run()\n"
        "print('TOTALS::' + json.dumps(totals))\n"
    )
    import os as _os

    env = dict(_os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the ONLY way in
    env["PYSPARK_PYTHON"] = _sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = _sys.executable
    r = subprocess.run(
        [spark_submit, "--master", "local[4]", "--py-files", out_zip,
         str(driver), str(tmp_path / "wal"), table_path],
        capture_output=True, text=True, cwd=str(tmp_path), timeout=600, env=env,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    line = next(l for l in r.stdout.splitlines() if l.startswith("TOTALS::"))
    totals = _json.loads(line.split("::", 1)[1])
    # applied events are PRE-dedup (duplicate delivery inflates past 5000)
    assert totals["applied_events"] >= 5000 and totals["batches"] == 2
    # the submitted driver committed a real table on shared storage
    assert IceboxTable.exists(table_path)


def test_chaos_with_partition_evolution(spark, tmp_path):
    """The chaos scenario with partition evolution injected: duplicates +
    shuffle + hot key + mid-stream SCHEMA evolution + kill/resume, and
    the table is REBUCKETED twice at arbitrary points between engine
    sessions (8→32 mid-v1, 32→16 mid-v2). Final state must still equal
    the layout-blind oracle byte-for-byte."""
    v1 = generate_changelog(spark, 3_000, 250, seed=67, dup_pct=15,
                            shuffled=True, hot_key_pct=40, schema_version=1)
    v2 = generate_changelog(spark, 6_000, 250, seed=67, dup_pct=15,
                            shuffled=True, hot_key_pct=40,
                            schema_version=2).where(F.col("seq") > 3_000)
    tbl = str(tmp_path / "tbl")
    cfg = dict(log_path="unused", table_path=tbl, batch_size=500,
               merge_mode="auto", compact_delta_files=10, n_buckets=8)
    CDCEngine(spark, JobConfig(**cfg), log_df=v1).run(max_batches=3)
    IceboxTable.load(spark, tbl).rebucket(32)
    CDCEngine(spark, JobConfig(**cfg), log_df=v1).run()
    CDCEngine(spark, JobConfig(**cfg), log_df=v2).run(max_batches=2)
    IceboxTable.load(spark, tbl).rebucket(16)
    eng = CDCEngine(spark, JobConfig(**cfg), log_df=v2)
    eng.run()

    assert eng.table.n_buckets == 16
    full = v1.withColumn("lang", F.lit(None).cast("string")).withColumn(
        "n_tok", F.col("n_tok").cast("long")).unionByName(v2)
    expected = oracle.replay(full.toPandas(),
                             value_cols=["tokens", "n_tok", "source", "lang"])
    got = eng.read_table().toPandas()
    got["n_tok"] = got["n_tok"].astype("int64")
    expected["n_tok"] = expected["n_tok"].astype("int64")
    oracle.assert_table_equal(got, expected)


def test_stateful_lww_into_icebox_sink_with_restart(spark, tmp_path):
    """r3 next-round #6: the stateful operator's update stream lands in a
    RECOVERABLE sink — foreachBatch into the icebox MERGE — and a kill
    mid-stream + restart from the same checkpoint converges to the exact
    state the batch engine produces from the same WAL (batch/streaming
    consistency end-to-end)."""
    from sparkcdc.stateful import run_stateful_lww_to_table

    log = generate_changelog(spark, 3_000, 250, seed=84, dup_pct=15, shuffled=True)
    wal = str(tmp_path / "swal2")
    log.repartition(12).write.parquet(wal)  # 12 files / 3-per-trigger → 4 epochs
    tbl_path = str(tmp_path / "stbl")
    ckpt = str(tmp_path / "sckpt2")

    # first run killed after 2 of ~4 triggers: table is mid-stream
    t = run_stateful_lww_to_table(
        spark, wal, table_path=tbl_path, checkpoint_dir=ckpt,
        max_files_per_trigger=3, max_batches=2,
    )
    partial = t.read().count()

    # restart from the same checkpoint drains the rest; winners carried in
    # the state store re-emit only on change, re-delivered epochs are fenced
    t = run_stateful_lww_to_table(
        spark, wal, table_path=tbl_path, checkpoint_dir=ckpt,
        max_files_per_trigger=3,
    )
    got = t.read().toPandas()
    assert partial <= len(got) or partial >= 0  # restart never loses rows

    expected = oracle.replay(spark.read.parquet(wal).toPandas())
    oracle.assert_table_equal(got, expected)

    # third run from the drained checkpoint is a clean no-op
    t = run_stateful_lww_to_table(
        spark, wal, table_path=tbl_path, checkpoint_dir=ckpt,
        max_files_per_trigger=3,
    )
    oracle.assert_table_equal(t.read().toPandas(), expected)


def test_windowed_stream_watermark_drops_late_events(spark, tmp_path):
    """True streaming watermark semantics (T5): an event arriving later
    than the watermark bound is dropped by the windowed aggregation —
    unlike the merge path, whose LSN fence + LWW absorb arbitrary
    lateness. Files drain one per trigger so the watermark advances
    between the punctual and late batches."""
    import time as _time

    from sparkcdc.streaming import windowed_stream_counts

    wal = str(tmp_path / "wwal")
    schema = "seq: long, op: string, doc_id: string, ts: timestamp"

    def write(ts_list, start_seq):
        spark.createDataFrame(
            [
                (start_seq + i, "upsert", f"d{start_seq + i}", ts)
                for i, ts in enumerate(ts_list)
            ],
            schema,
        ).coalesce(1).write.mode("append").parquet(wal)
        _time.sleep(1.2)  # later mtime → later trigger (1 file/trigger)

    import datetime as dt

    h = lambda hh, mm=0: dt.datetime(2024, 1, 1, hh, mm)  # noqa: E731
    # trigger 1: 3 events in hour 10, max event ts 11:50
    #   → watermark for trigger 2 = 11:20, past hour-10's end
    write([h(10, 5), h(10, 20), h(10, 40), h(11, 10), h(11, 50)], 0)
    # trigger 2: punctual event; hour-10 window finalizes (emits) at its end
    write([h(11, 55)], 100)
    # trigger 3: straggler for hour 10 — state evicted → DROPPED
    write([h(10, 55)], 200)

    out = windowed_stream_counts(
        spark, wal,
        checkpoint_dir=str(tmp_path / "wckpt"),
        query_name="win_counts_t1",
        window="1 hour", watermark="30 minutes",
    ).collect()
    by_hour = {r["window_start"].hour: r["n"] for r in out}
    # hour 10 emitted exactly once, WITHOUT the dropped straggler; hour 11
    # is still open when the stream drains → not emitted (append contract)
    assert by_hour == {10: 3}
    # memory sink can't recover: reusing the checkpoint must raise early
    with pytest.raises(ValueError, match="already has progress"):
        windowed_stream_counts(
            spark, wal,
            checkpoint_dir=str(tmp_path / "wckpt"),
            query_name="win_counts_t2",
        )


def test_engine_maintains_sigindex_continuously(spark, tmp_path):
    """cfg.sigindex_path wires continuous dedup-index maintenance into the
    replay loop: after every applied batch the SignatureIndex folds the
    change feed, and at any stop point (including kill/resume) it matches
    the recompute over the table's current state."""
    from sparkcdc.changelog import generate_changelog, write_log_parquet
    from sparkcdc.dedupe_docs import minhash_signatures
    from sparkcdc.sigindex import SignatureIndex

    log = generate_changelog(spark, 3_000, 200, seed=91, dup_pct=10)
    wal = log.select(
        "seq", "op", "doc_id",
        F.when(
            F.col("tokens").isNotNull(),
            F.concat_ws(" ", F.transform("tokens", lambda t: F.concat(F.lit("w"), t))),
        ).alias("text"),
        "source",
    )
    wal_path = str(tmp_path / "textwal")
    write_log_parquet(wal, wal_path)

    cfg = JobConfig(
        log_path=wal_path, table_path=str(tmp_path / "tbl"), n_buckets=8,
        batch_size=1_000, sigindex_path=str(tmp_path / "sidx"),
    )
    eng = CDCEngine(spark, cfg)
    eng.run(max_batches=1)  # simulated kill after batch 1
    idx = SignatureIndex.load(spark, cfg.sigindex_path)

    def assert_synced():
        corpus = eng.table.read().select("doc_id", "text")
        got = [tuple(r) for r in idx.signatures().select("doc_id", "mh_0")
               .orderBy("doc_id").collect()]
        want = [tuple(r) for r in minhash_signatures(corpus)
                .select("doc_id", "mh_0").orderBy("doc_id").collect()]
        assert got == want

    assert_synced()
    eng2 = CDCEngine(spark, cfg)  # resume from checkpoint
    totals = eng2.run()
    assert totals["applied_events"] > 0
    eng = eng2
    assert_synced()
    refreshes = [r for r in eng2.metrics.records if r.get("kind") == "index-refresh"]
    assert len(refreshes) >= 2  # one per applied batch
    # validation: a payload without the text column is rejected up front
    plain = str(tmp_path / "plainwal")
    write_log_parquet(log, plain)
    bad = JobConfig(log_path=plain, table_path=str(tmp_path / "tbl2"),
                    sigindex_path=str(tmp_path / "sidx2"))
    with pytest.raises(ConfigError, match="sigindex_text_col"):
        CDCEngine(spark, bad)


def test_streaming_sink_maintains_sigindex(spark, tmp_path):
    """The streaming front-end performs the same continuous dedup-index
    maintenance as the batch loop: after the stream drains, the
    SignatureIndex equals the recompute over the table's final state (and
    a replayed-checkpoint restart leaves it unchanged — fenced no-ops)."""
    from sparkcdc.changelog import generate_changelog, write_log_parquet
    from sparkcdc.dedupe_docs import minhash_signatures
    from sparkcdc.sigindex import SignatureIndex
    from sparkcdc.streaming import run_streaming

    log = generate_changelog(spark, 2_000, 150, seed=93, dup_pct=10)
    wal = log.select(
        "seq", "op", "doc_id",
        F.when(
            F.col("tokens").isNotNull(),
            F.concat_ws(" ", F.transform("tokens", lambda t: F.concat(F.lit("w"), t))),
        ).alias("text"),
        "source",
    )
    wal_path = str(tmp_path / "stextwal")
    write_log_parquet(wal, wal_path)

    cfg = JobConfig(
        log_path=wal_path, table_path=str(tmp_path / "stbl"), n_buckets=8,
        sigindex_path=str(tmp_path / "ssidx"),
    )
    totals = run_streaming(spark, cfg, checkpoint_dir=str(tmp_path / "sck"))
    assert totals["applied_events"] > 0

    from sparkcdc.icebox import IceboxTable

    tbl = IceboxTable.load(spark, cfg.table_path)
    idx = SignatureIndex.load(spark, cfg.sigindex_path)
    got = [tuple(r) for r in idx.signatures().select("doc_id", "mh_0")
           .orderBy("doc_id").collect()]
    want = [tuple(r) for r in minhash_signatures(tbl.read().select("doc_id", "text"))
            .select("doc_id", "mh_0").orderBy("doc_id").collect()]
    assert got == want and got

    # same checkpoint restart: replayed epochs fence, index refresh no-ops
    totals2 = run_streaming(spark, cfg, checkpoint_dir=str(tmp_path / "sck"))
    assert totals2.get("applied_events", 0) == 0
    got2 = [tuple(r) for r in SignatureIndex.load(spark, cfg.sigindex_path)
            .signatures().select("doc_id", "mh_0").orderBy("doc_id").collect()]
    assert got2 == got


def test_engine_maintains_packed_table_continuously(spark, tmp_path):
    """cfg.packed_path wires continuous packed-corpus maintenance into the
    replay loop: after every applied batch the PackedTable re-packs only
    the touched shards, and at any stop point (including kill/resume) its
    chunks equal the one-shot pack over the table's current state."""
    from sparkcdc.changelog import generate_changelog, write_log_parquet
    from sparkcdc.packing import PackedTable, pack_documents

    log = generate_changelog(spark, 3_000, 200, seed=95, dup_pct=10)
    wal = log.select(
        "seq", "op", "doc_id",
        F.when(
            F.col("tokens").isNotNull(),
            F.concat_ws(" ", F.transform("tokens", lambda t: F.concat(F.lit("w"), t))),
        ).alias("text"),
        "source",
    )
    wal_path = str(tmp_path / "pkwal")
    write_log_parquet(wal, wal_path)

    cfg = JobConfig(
        log_path=wal_path, table_path=str(tmp_path / "pktbl"), n_buckets=8,
        batch_size=1_000, packed_path=str(tmp_path / "pk"),
        packed_seq_len=32,
    )
    eng = CDCEngine(spark, cfg)
    eng.run(max_batches=1)  # simulated kill after batch 1

    def assert_synced(engine):
        got = sorted(
            tuple(r) for r in engine.packed.chunks().select(
                "shard", "seq_id", F.array_join("tokens", " ").alias("s"),
                "n_tok", "n_docs",
            ).collect()
        )
        want = sorted(
            tuple(r) for r in pack_documents(
                engine.table.read().where(F.col("source").isNotNull()),
                32, shard_col="source",
            ).select(
                F.col("source").alias("shard"), "seq_id",
                F.col("token_str").alias("s"), "n_tok", "n_docs",
            ).collect()
        )
        assert got == want and got

    assert_synced(eng)
    eng2 = CDCEngine(spark, cfg)  # resume from checkpoint
    totals = eng2.run()
    assert totals["applied_events"] > 0
    assert_synced(eng2)
    refreshes = [r for r in eng2.metrics.records if r.get("kind") == "packed-refresh"]
    assert len(refreshes) >= 2  # one per applied batch
    # handle reload sees the same state
    pt = PackedTable.load(spark, cfg.packed_path)
    assert pt.refresh_from(eng2.table)["skipped"] is True
    # validation: a payload without the tokens column is rejected up front
    plain = str(tmp_path / "pkplain")
    write_log_parquet(log.drop("tokens"), plain)
    bad = JobConfig(log_path=plain, table_path=str(tmp_path / "pktbl2"),
                    packed_path=str(tmp_path / "pk2"))
    with pytest.raises(ConfigError, match="packed_tokens_col"):
        CDCEngine(spark, bad)


def test_streaming_sink_maintains_packed_table(spark, tmp_path):
    """The streaming front-end performs the same continuous packed-corpus
    maintenance as the batch loop; a replayed-checkpoint restart leaves
    the chunks unchanged (fenced no-ops)."""
    from sparkcdc.changelog import generate_changelog, write_log_parquet
    from sparkcdc.packing import PackedTable, pack_documents
    from sparkcdc.streaming import run_streaming

    log = generate_changelog(spark, 2_000, 150, seed=97, dup_pct=10)
    wal = log.select(
        "seq", "op", "doc_id",
        F.when(
            F.col("tokens").isNotNull(),
            F.concat_ws(" ", F.transform("tokens", lambda t: F.concat(F.lit("w"), t))),
        ).alias("text"),
        "source",
    )
    wal_path = str(tmp_path / "spkwal")
    write_log_parquet(wal, wal_path)

    cfg = JobConfig(
        log_path=wal_path, table_path=str(tmp_path / "spktbl"), n_buckets=8,
        packed_path=str(tmp_path / "spk"), packed_seq_len=32,
    )
    totals = run_streaming(spark, cfg, checkpoint_dir=str(tmp_path / "spkck"))
    assert totals["applied_events"] > 0

    from sparkcdc.icebox import IceboxTable

    tbl = IceboxTable.load(spark, cfg.table_path)
    pt = PackedTable.load(spark, cfg.packed_path)
    got = sorted(
        tuple(r) for r in pt.chunks().select(
            "shard", "seq_id", F.array_join("tokens", " ").alias("s"),
            "n_tok", "n_docs",
        ).collect()
    )
    want = sorted(
        tuple(r) for r in pack_documents(
            tbl.read().where(F.col("source").isNotNull()), 32,
            shard_col="source",
        ).select(
            F.col("source").alias("shard"), "seq_id",
            F.col("token_str").alias("s"), "n_tok", "n_docs",
        ).collect()
    )
    assert got == want and got

    # same checkpoint restart: replayed epochs fence, packed refresh no-ops
    totals2 = run_streaming(spark, cfg, checkpoint_dir=str(tmp_path / "spkck"))
    assert totals2.get("applied_events", 0) == 0
    got2 = sorted(
        tuple(r) for r in PackedTable.load(spark, cfg.packed_path)
        .chunks().select(
            "shard", "seq_id", F.array_join("tokens", " ").alias("s"),
            "n_tok", "n_docs",
        ).collect()
    )
    assert got2 == got


def test_packed_config_validation():
    with pytest.raises(ConfigError, match="packed_seq_len"):
        JobConfig(log_path="x", table_path="y", packed_path="p",
                  packed_seq_len=0).validate()
    with pytest.raises(ConfigError, match="packed_shard_col"):
        JobConfig(log_path="x", table_path="y", packed_path="p",
                  packed_shard_col="").validate()


def test_streaming_json_lines_wal(spark, tmp_path):
    """The streaming front-end accepts the JSON-lines WAL format too
    (explicit schema, like the batch path): drains to the same state as
    the batch replay of the same log."""
    from sparkcdc.streaming import run_streaming

    log = generate_changelog(spark, 2_000, 200, seed=43)
    jdir = str(tmp_path / "sjwal")
    log.write.json(jdir)
    cfg = JobConfig(log_path=jdir, table_path=str(tmp_path / "sjtbl"),
                    log_format="json", n_buckets=8)
    totals = run_streaming(spark, cfg, checkpoint_dir=str(tmp_path / "sjck"))
    assert totals["applied_events"] == 2_000
    tbl = IceboxTable.load(spark, cfg.table_path)
    expected = oracle.replay(log.toPandas())
    oracle.assert_table_equal(tbl.read().toPandas(), expected)


def test_engine_maintains_vecindex_continuously(spark, tmp_path):
    """cfg.vecindex_path wires continuous ANN-index maintenance into the
    replay loop for embedding-payload tables: after kill/resume the
    index's top-k answers equal the brute-force recompute over the
    table's current vectors."""
    import pyspark.sql.types as T

    from sparkcdc.ann import lsh_ann_topk
    from sparkcdc.vecindex import VectorIndex

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    dim = len(emb.select("embedding").first()[0])
    wal = emb.select(
        "vec_id", "embedding",
        F.col("vec_id").cast("long").alias("seq"), F.lit("upsert").alias("op"),
    )
    wal_path = str(tmp_path / "vecwal")
    wal.write.parquet(wal_path)

    cfg = JobConfig(
        log_path=wal_path, table_path=str(tmp_path / "vtbl"), n_buckets=8,
        key="vec_id", batch_size=max(emb.count() // 2, 1),
        vecindex_path=str(tmp_path / "vidx"), vecindex_dim=dim,
    )
    eng = CDCEngine(spark, cfg)
    eng.run(max_batches=1)  # simulated kill after batch 1
    eng2 = CDCEngine(spark, cfg)  # resume (index loaded, dim from meta)
    eng2.run()

    idx = VectorIndex.load(spark, cfg.vecindex_path)
    got = sorted(
        tuple(r) for r in idx.ann_topk(n_queries=5, k=10)
        .select("query_id", "neighbor_id").collect()
    )
    corpus = eng2.table.read().select("vec_id", "embedding")
    want = sorted(
        tuple(r) for r in lsh_ann_topk(
            corpus, n_queries=5, k=10,
            n_planes=idx.n_planes, n_bands=idx.n_bands, seed=idx.seed,
        ).select("query_id", "neighbor_id").collect()
    )
    assert got == want and got
    refreshes = [r for r in eng2.metrics.records
                 if r.get("kind") == "vecindex-refresh"]
    assert refreshes
    # validation: wrong key / missing dim rejected up front
    with pytest.raises(ConfigError, match="vec_id"):
        CDCEngine(spark, JobConfig(
            log_path=wal_path, table_path=str(tmp_path / "vtbl2"),
            vecindex_path=str(tmp_path / "vidx2"), vecindex_dim=dim,
        ))


def test_totals_exclude_maintenance_records(spark, tmp_path):
    """Replay totals count ONLY batch records: continuous index/packed
    maintenance emits its own applied_events, which used to double the
    headline (a 3k-event replay with sigindex on reported ~6k)."""
    from sparkcdc.changelog import generate_changelog, write_log_parquet

    log = generate_changelog(spark, 2_000, 150, seed=99, dup_pct=0)
    wal = log.select(
        "seq", "op", "doc_id",
        F.when(
            F.col("tokens").isNotNull(),
            F.concat_ws(" ", F.transform("tokens", lambda t: F.concat(F.lit("w"), t))),
        ).alias("text"),
        "source",
    )
    wal_path = str(tmp_path / "twal")
    write_log_parquet(wal, wal_path)
    cfg = JobConfig(
        log_path=wal_path, table_path=str(tmp_path / "ttbl"), n_buckets=8,
        batch_size=1_000, sigindex_path=str(tmp_path / "tsidx"),
        packed_path=str(tmp_path / "tpk"), packed_seq_len=32,
    )
    eng = CDCEngine(spark, cfg)
    eng.run()
    totals = eng.metrics.totals()
    assert totals["applied_events"] == 2_000  # not 4k/6k
    assert totals["batches"] == 2
