"""Sequence packing: concat-and-split vs an independent Python reference,
token-stream conservation/order, chunk-size law, shard-mode equivalence,
and degenerate inputs (empty docs, seq_len=1, one giant doc)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkcdc.packing import pack_documents, pack_sequences

SF001 = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF001}/documents.parquet").select(
        "doc_id", "text", "lang", "source"
    )


def _py_pack(doc_tokens, L):
    """Reference: concat in order, split every L."""
    stream, bounds = [], []
    for _id, toks in sorted(doc_tokens):
        bounds.append((len(stream), len(stream) + len(toks), _id))
        stream.extend(toks)
    chunks = {}
    for k in range(0, (len(stream) + L - 1) // L):
        lo, hi = k * L, min((k + 1) * L, len(stream))
        n_docs = sum(1 for a, b, _ in bounds if a < hi and b > lo and a != b)
        chunks[k] = (stream[lo:hi], hi - lo, n_docs)
    return chunks


def test_pack_matches_python_reference(spark):
    rows = [
        (1, [1, 2, 3, 4, 5]),
        (2, [6, 7]),
        (3, []),               # empty: skipped
        (4, [8, 9, 10, 11, 12, 13, 14]),
    ]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    got = {
        r.seq_id: (list(r.tokens), r.n_tok, r.n_docs)
        for r in pack_sequences(df, 4).collect()
    }
    expect = _py_pack([(i, t) for i, t in rows], 4)
    assert got == expect
    assert got[0][0] == [1, 2, 3, 4]  # doc 1 split across chunk 0/1
    assert got[1][0] == [5, 6, 7, 8]  # three docs meet in chunk 1


def test_token_stream_conserved_in_order(spark):
    docs = _docs(spark)
    L = 256
    p = pack_documents(docs, L)
    chunks = {r.seq_id: r.token_str for r in p.collect()}
    packed_stream = " ".join(chunks[k] for k in sorted(chunks))
    direct = " ".join(
        r.text.strip() and " ".join(r.text.split()) or ""
        for r in docs.orderBy("doc_id").collect()
    ).split()
    assert packed_stream.split() == direct
    # chunk-size law: every chunk is L except possibly the last
    sizes = {r.seq_id: r.n_tok for r in p.collect()}
    last = max(sizes)
    assert all(v == L for k, v in sizes.items() if k != last)
    assert 0 < sizes[last] <= L


def test_giant_doc_spans_many_chunks(spark):
    df = spark.createDataFrame(
        [(1, [0, 0]), (2, list(range(1000))), (3, [7])],
        "doc_id long, tokens array<int>",
    )
    got = {r.seq_id: (list(r.tokens), r.n_docs) for r in pack_sequences(df, 16).collect()}
    expect = _py_pack([(1, [0, 0]), (2, list(range(1000))), (3, [7])], 16)
    assert got == {k: (v[0], v[2]) for k, v in expect.items()}
    # interior chunks of the giant doc have exactly one contributor
    assert got[10][1] == 1


def test_seq_len_one_and_validation(spark):
    df = spark.createDataFrame([(1, [5, 6])], "doc_id long, tokens array<int>")
    got = {r.seq_id: list(r.tokens) for r in pack_sequences(df, 1).collect()}
    assert got == {0: [5], 1: [6]}
    with pytest.raises(ValueError):
        pack_sequences(df, 0)


def test_shard_mode_equals_per_shard_global(spark):
    """(shard, seq_id) output == running global packing independently per
    shard — the embarrassingly-parallel scale mode changes keys, not
    content."""
    docs = _docs(spark)
    sharded = {
        (r.source, r.seq_id): (r.token_str, r.n_tok, r.n_docs)
        for r in pack_documents(docs, 128, shard_col="source").collect()
    }
    expect = {}
    for src in [r.source for r in docs.select("source").distinct().collect()]:
        for r in pack_documents(docs.where(F.col("source") == src), 128).collect():
            expect[(src, r.seq_id)] = (r.token_str, r.n_tok, r.n_docs)
    assert sharded == expect and sharded


def test_all_empty_docs_yield_no_chunks(spark):
    df = spark.createDataFrame(
        [(1, []), (2, [])], "doc_id long, tokens array<int>"
    )
    assert pack_sequences(df, 8).count() == 0
