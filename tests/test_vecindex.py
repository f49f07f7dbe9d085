"""VectorIndex: incremental LSH-ANN index maintenance from the vector
table's change feed. Core invariant: the index path answers top-k
identically to the per-query-set recompute path (ann.lsh_ann_topk) while
never re-hashing unchanged vectors and never scanning the source table."""

from __future__ import annotations

import pyspark.sql.types as T
import pytest
from pyspark.sql import functions as F

from sparkcdc.ann import lsh_ann_topk
from sparkcdc.icebox import IceboxTable
from sparkcdc.vecindex import VectorIndex

SF001 = "/root/testdata/sf0.001"

VEC_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def _emb(spark):
    return spark.read.parquet(f"{SF001}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )


def _as_log(df, seq_base=0, op="upsert"):
    return df.select(
        "vec_id", "embedding",
        (F.col("vec_id") + F.lit(seq_base)).cast("long").alias("seq"),
        F.lit(op).alias("op"),
    )


def _rows(df):
    return [tuple(r) for r in df.orderBy("query_id", "rank").collect()]


@pytest.fixture()
def vec_table(spark, tmp_path):
    return IceboxTable.create(
        spark, str(tmp_path / "vecs"), VEC_SCHEMA, key="vec_id", n_buckets=8
    )


def test_index_topk_equals_recompute_after_incremental_builds(
    spark, tmp_path, vec_table
):
    emb = _emb(spark)
    dim = len(emb.select("embedding").first()[0])
    idx = VectorIndex.create(spark, str(tmp_path / "vidx"), dim=dim, n_buckets=4)

    vec_table.merge(_as_log(emb.where(F.col("vec_id") % 2 == 0)), "b1")
    m1 = idx.refresh_from(vec_table)
    assert not m1.get("skipped")
    vec_table.merge(
        _as_log(emb.where(F.col("vec_id") % 2 == 1), seq_base=1_000_000), "b2"
    )
    m2 = idx.refresh_from(vec_table)
    # incremental: second refresh hashed only the second half
    assert m2["applied_events"] == emb.where(F.col("vec_id") % 2 == 1).count()

    corpus = vec_table.read()
    expect = _rows(lsh_ann_topk(corpus, n_queries=5, k=10, max_bucket=0))
    got = _rows(idx.ann_topk(n_queries=5, k=10, max_bucket=0))
    assert got == expect and len(got) > 0


def test_index_tracks_updates_and_deletes(spark, tmp_path, vec_table):
    emb = _emb(spark)
    dim = len(emb.select("embedding").first()[0])
    idx = VectorIndex.create(spark, str(tmp_path / "vidx"), dim=dim, n_buckets=4)
    vec_table.merge(_as_log(emb), "b1")
    idx.refresh_from(vec_table)

    # update: negate 5 vectors (flips every sign bucket); delete 5 others;
    # null out 1 (must leave the index, not be stored degenerate)
    upd = emb.where(F.col("vec_id") < 5).select(
        "vec_id",
        F.transform("embedding", lambda v: -v).cast("array<float>").alias("embedding"),
    )
    dels = emb.where((F.col("vec_id") >= 5) & (F.col("vec_id") < 10))
    nulled = emb.where(F.col("vec_id") == 10).select(
        "vec_id", F.lit(None).cast("array<float>").alias("embedding")
    )
    vec_table.merge(
        _as_log(upd, seq_base=2_000_000)
        .unionByName(_as_log(dels, seq_base=2_000_000, op="delete"))
        .unionByName(_as_log(nulled, seq_base=2_000_000)),
        "b2",
    )
    m = idx.refresh_from(vec_table)
    assert not m.get("skipped")

    ids = {r.vec_id for r in idx.table.read().select("vec_id").collect()}
    assert not ids & set(range(5, 11))  # deletes AND the nulled vector gone
    corpus = vec_table.read().where(F.col("embedding").isNotNull())
    expect = _rows(lsh_ann_topk(corpus, n_queries=5, k=10, max_bucket=0))
    got = _rows(idx.ann_topk(n_queries=5, k=10, max_bucket=0))
    assert got == expect


def test_index_plan_never_scans_source_table(spark, tmp_path, vec_table):
    """The scan-size point of the index: answering a query set touches the
    index table only — neither the source icebox table nor the original
    embeddings parquet appear in the plan, and no plane hashing runs (the
    bucket columns are read, not computed)."""
    emb = _emb(spark)
    dim = len(emb.select("embedding").first()[0])
    idx = VectorIndex.create(spark, str(tmp_path / "vidx"), dim=dim, n_buckets=4)
    vec_table.merge(_as_log(emb), "b1")
    idx.refresh_from(vec_table)

    df = idx.ann_topk(n_queries=3, k=5)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert idx.table.path in plan
    assert vec_table.path not in plan
    assert "embeddings.parquet" not in plan
    files = set(df.inputFiles())
    assert files and all(idx.table.path in f for f in files)


def test_probe_external_queries_matches_manual_recompute(spark, tmp_path, vec_table):
    """probe_topk for held-out query vectors == candidates-by-shared-bucket
    + exact cosine computed independently with the same plane family."""
    from sparkcdc.ann import _dot, _norm, band_seed, lsh_bucket_expr, lsh_planes

    emb = _emb(spark)
    dim = len(emb.select("embedding").first()[0])
    corpus = emb.where(F.col("vec_id") % 5 != 0)
    held_out = emb.where(F.col("vec_id") % 5 == 0).limit(10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    idx = VectorIndex.create(spark, str(tmp_path / "vidx"), dim=dim, n_buckets=4)
    vec_table.merge(_as_log(corpus), "b1")
    idx.refresh_from(vec_table)

    got = _rows(idx.probe_topk(held_out, k=5, max_bucket=0))

    bucket_cols = [
        lsh_bucket_expr("embedding", lsh_planes(dim, idx.n_planes, band_seed(idx.seed, b)))
        for b in range(idx.n_bands)
    ]
    qtag = held_out.select(
        "query_id", F.col("embedding").alias("qv"),
        F.posexplode(F.array(*bucket_cols)).alias("band", "bucket"),
    )
    ctag = corpus.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"),
        F.posexplode(F.array(*bucket_cols)).alias("band", "bucket"),
    )
    cand = (
        ctag.join(qtag.select("query_id", "band", "bucket"), ["band", "bucket"])
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qv = qtag.select("query_id", "qv").distinct()
    cv = ctag.select("neighbor_id", "cv").distinct()
    joined = cand.join(qv, "query_id").join(cv, "neighbor_id")
    cos = F.round(_dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))), 6)
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    expect = _rows(
        joined.select("query_id", "neighbor_id", cos.alias("cos"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "rank", "cos")
    )
    assert got == expect and len(got) > 0


def test_load_roundtrip_freezes_plane_family(spark, tmp_path, vec_table):
    emb = _emb(spark)
    dim = len(emb.select("embedding").first()[0])
    idx = VectorIndex.create(
        spark, str(tmp_path / "vidx"), dim=dim, n_planes=6, n_bands=2,
        seed=7, n_buckets=4,
    )
    vec_table.merge(_as_log(emb), "b1")
    idx.refresh_from(vec_table)
    re = VectorIndex.load(spark, str(tmp_path / "vidx"))
    assert (re.dim, re.n_planes, re.n_bands, re.seed) == (dim, 6, 2, 7)
    assert _rows(re.ann_topk(n_queries=3, k=5, max_bucket=0)) == _rows(
        idx.ann_topk(n_queries=3, k=5, max_bucket=0)
    )


def test_racing_vector_maintainers_exactly_once(spark, tmp_path, vec_table):
    """Mirror of the sigindex racing test for the vector index: two
    handles refresh the same change window concurrently — at most one
    MERGE lands, and the index converges to the recompute."""
    from concurrent.futures import ThreadPoolExecutor

    emb = _emb(spark)
    dim = len(emb.select("embedding").first()[0])
    path = str(tmp_path / "vidx")
    idx = VectorIndex.create(spark, path, dim=dim, n_buckets=4)
    vec_table.merge(_as_log(emb.where(F.col("vec_id") < 250)), "b1")
    idx.refresh_from(vec_table)
    vec_table.merge(_as_log(emb.where(F.col("vec_id") >= 250),
                            seq_base=1_000_000), "b2")

    h1, h2 = VectorIndex.load(spark, path), VectorIndex.load(spark, path)
    t1 = IceboxTable.load(spark, vec_table.path)
    t2 = IceboxTable.load(spark, vec_table.path)
    with ThreadPoolExecutor(max_workers=2) as ex:
        r1 = ex.submit(h1.refresh_from, t1).result()
        r2 = ex.submit(h2.refresh_from, t2).result()
    applied = [r for r in (r1, r2)
               if not r.get("skipped") and r.get("applied_events", 0) > 0]
    assert len(applied) <= 1
    idx.refresh_from(vec_table)
    corpus = vec_table.read()
    expect = _rows(lsh_ann_topk(corpus, n_queries=5, k=10, max_bucket=0))
    assert _rows(idx.ann_topk(n_queries=5, k=10, max_bucket=0)) == expect


def test_doc_table_expiration_cannot_break_index_feed(spark, tmp_path, vec_table):
    """The index's consumer pin protects its change-feed window: an
    aggressive expire_snapshots on the source table between refreshes is
    clamped at the pin, so the next refresh still reads its window and
    the index stays recompute-identical."""
    emb = _emb(spark)
    dim = len(emb.select("embedding").first()[0])
    idx = VectorIndex.create(spark, str(tmp_path / "vidx"), dim=dim, n_buckets=4)
    vec_table.merge(_as_log(emb.where(F.col("vec_id") < 200)), "b1")
    idx.refresh_from(vec_table)
    for i in range(4):  # history the expirer would love to drop
        sl = emb.where((F.col("vec_id") >= 200 + i * 75) & (F.col("vec_id") < 275 + i * 75))
        vec_table.merge(_as_log(sl, seq_base=(i + 1) * 1_000_000), f"b{i+2}")
    res = vec_table.expire_snapshots(keep_last=1)
    assert res["clamped_by_consumers"] is True  # pin held the floor
    idx.refresh_from(vec_table)
    corpus = vec_table.read()
    expect = _rows(lsh_ann_topk(corpus, n_queries=5, k=10, max_bucket=0))
    assert _rows(idx.ann_topk(n_queries=5, k=10, max_bucket=0)) == expect
    # with the index synced and the pin advanced, expiration can reclaim
    res2 = vec_table.expire_snapshots(keep_last=1)
    assert res2["expired_snapshots"] > 0
