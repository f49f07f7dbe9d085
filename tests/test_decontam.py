"""Benchmark decontamination: exact scan vs an independent Python n-gram
reference, hashed scan == exact scan on the same tokenization, and the
incremental NgramIndex invariant — change-feed maintenance == direct
recompute over the final corpus, probing the index table only."""

from __future__ import annotations

import math

import pyspark.sql.types as T
import pytest
from pyspark.sql import functions as F

from sparkcdc.decontam import (
    NgramIndex,
    contamination_scan,
    contamination_scan_hashed,
)
from sparkcdc.icebox import IceboxTable

SF001 = "/root/testdata/sf0.001"

TOK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
    ]
)


def _docs(spark):
    return spark.read.parquet(f"{SF001}/documents.parquet").select(
        "doc_id", "text", "lang"
    )


def _tokenized(spark):
    """The north-rule table shape: words hashed to a small int vocab —
    collisions in the vocab are FINE (both paths see the same tokens)."""
    return _docs(spark).select(
        "doc_id",
        F.expr(
            "transform(split(trim(text), '\\\\s+'), w -> abs(hash(w)) % 50000)"
        ).cast("array<int>").alias("tokens"),
    ).select(
        "doc_id", "tokens", F.size("tokens").alias("n_tok"), F.lit("web").alias("source")
    )


def _as_log(df, op="upsert", seq_base=0):
    return df.select(
        "doc_id", "tokens", "n_tok", "source",
        (F.col("doc_id") + F.lit(seq_base)).cast("long").alias("seq"),
        F.lit(op).alias("op"),
    )


def _py_ngrams(words, n):
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _tok_table(spark, tmp_path, name="toks"):
    return IceboxTable.create(spark, str(tmp_path / name), TOK_SCHEMA, n_buckets=4)


# ---------------- exact scan ----------------


def test_contamination_scan_matches_python_reference(spark):
    docs = [
        (1, "a b c d e f g h"),
        (2, "x b c d e y z w"),  # shares "b c d e" with doc 1
        (3, "p q r s t u v w"),  # clean
        (4, "a b c d"),          # exactly one 4-gram, contaminated
        (5, "short doc"),        # < n tokens: no grams, never flagged
    ]
    bench_ids = {1}
    df = spark.createDataFrame(docs, "doc_id long, text string")
    bench = df.where(F.col("doc_id").isin(list(bench_ids)))
    rest = df.where(~F.col("doc_id").isin(list(bench_ids)))
    got = {r.doc_id: (r.n_hits, r.n_grams) for r in contamination_scan(rest, bench, n=4).collect()}

    bgrams = set().union(*(_py_ngrams(t.split(), 4) for i, t in docs if i in bench_ids))
    expect = {}
    for i, t in docs:
        if i in bench_ids:
            continue
        g = _py_ngrams(t.split(), 4)
        hits = len(g & bgrams)
        if hits:
            expect[i] = (hits, len(g))
    assert got == expect
    assert 2 in got and 4 in got and 3 not in got and 5 not in got


def test_hashed_scan_equals_exact_on_same_tokenization(spark):
    """Word-level exact scan and int-token hashed scan over the SAME
    corpus flag identical doc sets with identical hit counts (xxhash64
    collisions at this scale: none)."""
    docs = _docs(spark)
    tok = _tokenized(spark)
    bench_f = F.col("doc_id") % 41 == 0
    exact = {
        r.doc_id: r.n_hits
        for r in contamination_scan(
            docs.where(~bench_f), docs.where(bench_f), n=4
        ).collect()
    }
    # token-level gram identity differs from word-level ONLY via vocab
    # collisions, which can merge distinct grams — compare against the
    # hashed path computed over the same int tokens instead
    hashed = {
        r.doc_id: r.n_hits
        for r in contamination_scan_hashed(
            tok.where(~bench_f), tok.where(bench_f), n=4
        ).collect()
    }
    # every exactly-contaminated doc must be hash-flagged (collisions can
    # only ADD token-level matches, never lose a word-level one)
    assert set(exact) <= set(hashed)
    for d, h in exact.items():
        assert hashed[d] >= h
    # and on this corpus the 50k vocab introduces no spurious docs
    assert set(exact) == set(hashed)


def test_short_docs_and_empty_bench(spark):
    df = spark.createDataFrame(
        [(1, "one two three"), (2, "a b")], "doc_id long, text string"
    )
    empty_bench = df.limit(0)
    assert contamination_scan(df, empty_bench, n=4).count() == 0
    # bench shorter than n contributes no grams
    assert contamination_scan(df, df.where("doc_id = 2"), n=4).count() == 0


def test_scan_plan_broadcasts_bench(spark):
    """Scale shape: the gram join must be a broadcast hash join (a
    gram-keyed shuffle would hot-spot on Zipfian n-grams)."""
    docs = _docs(spark)
    bench_f = F.col("doc_id") % 41 == 0
    df = contamination_scan(docs.where(~bench_f), docs.where(bench_f), n=4)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "BroadcastHashJoin" in plan


# ---------------- incremental NgramIndex ----------------


def test_index_bootstrap_equals_direct_scan(spark, tmp_path):
    tok = _tokenized(spark)
    tbl = _tok_table(spark, tmp_path)
    tbl.merge(_as_log(tok), "b1")
    idx = NgramIndex.create(spark, str(tmp_path / "ngidx"), n=4, n_buckets=4,
                            key_type=T.LongType())
    idx.refresh_from(tbl)
    bench = tok.where(F.col("doc_id") % 41 == 0)
    got = _rows(idx.probe(bench))
    expect = _rows(contamination_scan_hashed(tbl.read(), bench, n=4))
    assert got == expect and got


def test_index_incremental_update_delete_equals_recompute(spark, tmp_path):
    tok = _tokenized(spark)
    tbl = _tok_table(spark, tmp_path)
    idx = NgramIndex.create(spark, str(tmp_path / "ngidx"), n=4, n_buckets=4,
                            key_type=T.LongType())
    # batch 1: even docs; refresh
    tbl.merge(_as_log(tok.where("doc_id % 2 = 0")), "b1")
    idx.refresh_from(tbl)
    # batch 2: odd docs + REWRITE some evens with reversed tokens + delete
    rewritten = tok.where("doc_id % 10 = 0").select(
        "doc_id", F.reverse("tokens").alias("tokens"), "n_tok", "source"
    )
    b2 = (
        _as_log(tok.where("doc_id % 2 = 1"), seq_base=10_000)
        .unionByName(_as_log(rewritten, seq_base=20_000))
        .unionByName(_as_log(tok.where("doc_id % 14 = 7"), op="delete", seq_base=30_000))
    )
    tbl.merge(b2, "b2")
    idx.refresh_from(tbl)

    bench = tok.where(F.col("doc_id") % 41 == 0)
    got = _rows(idx.probe(bench))
    expect = _rows(contamination_scan_hashed(tbl.read(), bench, n=4))
    assert got == expect and got


def test_index_removes_docs_shortened_below_n(spark, tmp_path):
    rows = [
        (1, list(range(10)), 10, "s"),
        (2, list(range(100, 110)), 10, "s"),
    ]
    df = spark.createDataFrame(rows, TOK_SCHEMA)
    tbl = _tok_table(spark, tmp_path)
    tbl.merge(_as_log(df), "b1")
    idx = NgramIndex.create(spark, str(tmp_path / "ngidx"), n=4, n_buckets=2,
                            key_type=T.LongType())
    idx.refresh_from(tbl)
    assert {r.doc_id for r in idx.grams().collect()} == {1, 2}
    # doc 1 shrinks to 2 tokens: unindexable → removed, not stored empty
    short = spark.createDataFrame([(1, [0, 1], 2, "s")], TOK_SCHEMA)
    tbl.merge(_as_log(short, seq_base=50_000), "b2")
    idx.refresh_from(tbl)
    assert {r.doc_id for r in idx.grams().collect()} == {2}
    # a probe with doc 1's old grams finds nothing
    old = spark.createDataFrame([(99, list(range(10)), 10, "s")], TOK_SCHEMA)
    assert idx.probe(old).where("doc_id = 1").count() == 0


def test_probe_scans_only_index_table(spark, tmp_path):
    tok = _tokenized(spark)
    tbl = _tok_table(spark, tmp_path)
    tbl.merge(_as_log(tok), "b1")
    idx = NgramIndex.create(spark, str(tmp_path / "ngidx"), n=4, n_buckets=4,
                            key_type=T.LongType())
    idx.refresh_from(tbl)
    bench = spark.createDataFrame(
        [(0, list(range(20)), 20, "s")], TOK_SCHEMA
    )
    df = idx.probe(bench)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "BroadcastHashJoin" in plan
    assert idx.table.path in plan
    assert tbl.path not in plan
    assert "documents.parquet" not in plan


def test_index_meta_roundtrip_and_validation(spark, tmp_path):
    with pytest.raises(ValueError):
        NgramIndex.create(spark, str(tmp_path / "bad"), n=0)
    idx = NgramIndex.create(spark, str(tmp_path / "ok"), n=6, key_type=T.LongType())
    again = NgramIndex.load(spark, str(tmp_path / "ok"))
    assert again.n == 6


# ---------------- retired-gate-row backstop (A4 page math) ----------------


def test_a4_page_math_ceil_matches_python(spark):
    """a4_page_math left the 50-entry driver gate for the new operators;
    its ceil-division arithmetic stays pinned here against math.ceil."""
    ev = spark.read.parquet(f"{SF001}/events.parquet")
    got = {
        r.event_type: r.total_pages
        for r in ev.groupBy("event_type")
        .agg(F.ceil(F.count("*") / F.lit(50.0)).cast("long").alias("total_pages"))
        .collect()
    }
    counts = {r.event_type: r.n for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    assert got == {k: math.ceil(v / 50) for k, v in counts.items()} and got
