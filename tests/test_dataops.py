"""Training-data pipeline operators over the driver testdata
(documents/embeddings at sf0.001): dedup family, ANN, text analysis,
multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkcdc.ann import cosine_topk, lsh_ann_topk, lsh_planes
from sparkcdc.dedupe_docs import (
    exact_dedupe,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash64,
    simhash_near_pairs,
)
from sparkcdc.multimodal import extract_features, frame_sample_plan, with_binary_payload
from sparkcdc.textops import (
    with_fingerprint,
    with_lang_guess,
    with_quality,
    with_token_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_exact_dedupe_partitions_the_corpus(docs):
    d = exact_dedupe(docs)
    total = docs.count()
    assert d.agg(F.sum("n_dups")).collect()[0][0] == total
    assert d.count() <= total
    # canonical ids are real doc ids
    assert d.join(docs, d.canonical_doc_id == docs.doc_id).count() == d.count()


def test_ngram_jaccard_pairs_bounded_and_thresholded(docs):
    pairs = ngram_jaccard_pairs(docs, threshold=0.3).collect()
    for r in pairs:
        assert r["doc1"] < r["doc2"]
        assert 0.3 <= r["jaccard"] <= 1.0


def test_minhash_lsh_catches_high_jaccard_pairs(spark, docs):
    # construct guaranteed near-dups: copy 5 docs with one word changed
    base = docs.limit(5).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra")).alias("text"),
        "lang", "source", "n_chars",
    )
    corpus = docs.unionByName(base)
    cand = {(r["doc1"], r["doc2"]) for r in minhash_lsh_pairs(corpus).collect()}
    for r in docs.limit(5).collect():
        assert (r["doc_id"], r["doc_id"] + 1_000_000) in cand


def test_simhash_identical_and_near(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog"),
         (3, "completely different words entirely unrelated content here now")],
        "doc_id: long, text: string",
    )
    h = df.select("doc_id", simhash64(F.col("text")).alias("s")).collect()
    by = {r["doc_id"]: r["s"] for r in h}
    assert by[1] == by[2]
    pairs = simhash_near_pairs(df, max_hamming=4).collect()
    assert any(p["doc1"] == 1 and p["doc2"] == 2 and p["hamming"] == 0 for p in pairs)
    assert not any({p["doc1"], p["doc2"]} == {1, 3} for p in pairs)


def test_cosine_topk_exact(emb):
    out = cosine_topk(emb, n_queries=3, k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2}
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
        cosines = [r["cos"] for r in rows]
        assert cosines == sorted(cosines, reverse=True)
        assert all(r["neighbor_id"] != q for r in rows)


def test_lsh_ann_subset_of_bruteforce_space(emb):
    planes = lsh_planes(64, 4)
    assert all(v in (-1, 1) for row in planes for v in row)
    assert lsh_planes(64, 4) == planes  # deterministic
    approx = lsh_ann_topk(emb, n_queries=3, k=5)
    exact = cosine_topk(emb, n_queries=3, k=200)
    # every approx hit must carry the same cosine the exact path computed
    j = approx.alias("a").join(
        exact.alias("e"),
        (F.col("a.query_id") == F.col("e.query_id"))
        & (F.col("a.neighbor_id") == F.col("e.neighbor_id")),
    )
    mism = j.where(F.col("a.cos") != F.col("e.cos")).count()
    assert mism == 0 and approx.count() > 0


def test_textops_deterministic_and_sane(docs):
    out = with_fingerprint(with_quality(with_lang_guess(with_token_counts(docs)))).limit(50).collect()
    for r in out:
        assert r["n_tokens_ws"] >= 1
        assert r["n_tokens_bpe"] >= r["n_tokens_ws"] - 1
        assert r["lang_guess"] in {"en", "es", "de", "fr", "und"}
        assert 0 <= r["punct_ratio"] < 1
        assert len(r["fingerprint"]) == 32
    # fingerprint equals md5 of normalized text (portable definition)
    import hashlib

    r0 = out[0]
    norm = " ".join(r0["text"].split()).lower()
    assert r0["fingerprint"] == hashlib.md5(norm.encode()).hexdigest()


def test_multimodal_pipeline(docs):
    blobs = with_binary_payload(docs)
    feats = extract_features(blobs).orderBy("doc_id")
    rows = feats.limit(10).collect()
    src = {r["doc_id"]: r for r in docs.limit(50).collect()}
    for r in rows:
        assert r["n_bytes"] == src[r["doc_id"]]["n_chars"]  # ascii text
        assert len(r["features"]) == 8
        assert all(0.0 <= v <= 1.0 for v in r["features"])
        assert 1 <= r["width"] <= 1920 and 1 <= r["height"] <= 1080
    # deterministic across runs
    again = extract_features(blobs).orderBy("doc_id").limit(10).collect()
    assert [r["features"] for r in again] == [r["features"] for r in rows]
    # real decode is explicitly stubbed
    with pytest.raises(NotImplementedError):
        extract_features(blobs, decode_backend="real")
    fr = frame_sample_plan(blobs.limit(3), every_n=10).collect()
    assert all(r["byte_offset"] == r["frame_idx"] * 10 for r in fr)


def test_cosine_near_dup_pairs(emb):
    from sparkcdc.ann import cosine_near_dup_pairs

    pairs = cosine_near_dup_pairs(emb, threshold=0.3).collect()
    assert pairs, "sf0.001 should contain cosine>=0.3 bucket-mates"
    for p in pairs:
        assert p["id1"] < p["id2"] and p["cos"] >= 0.3


def test_ivf_ann_recall_and_determinism(emb):
    from sparkcdc.ann import cosine_topk, ivf_ann_topk, ivf_centroids

    cents = ivf_centroids(emb, n_clusters=8)
    assert ivf_centroids(emb, n_clusters=8) == cents  # deterministic
    assert len(cents) == 8 and all(len(c) == 64 for c in cents)

    approx = ivf_ann_topk(emb, n_queries=3, k=10, nprobe=3)
    exact = cosine_topk(emb, n_queries=3, k=10)
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    recall = len(a & e) / len(e)
    assert recall >= 0.5, f"IVF recall too low: {recall}"
    # approx cosines must equal the exact path's for shared pairs
    ja = approx.alias("a").join(
        exact.alias("x"),
        (F.col("a.query_id") == F.col("x.query_id"))
        & (F.col("a.neighbor_id") == F.col("x.neighbor_id")),
    )
    assert ja.where(F.col("a.cos") != F.col("x.cos")).count() == 0
