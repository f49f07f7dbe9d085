"""packing — fixed-length training-sequence packing.

A training run consumes fixed-length token sequences (e.g. 4096); the
corpus is variable-length documents. Packing concatenates the token
stream in a deterministic document order and splits it into consecutive
``seq_len`` chunks ("concat-and-split") — zero padding waste except the
final partial chunk, and bit-reproducible given the same input state
(no greedy bin-packing whose output depends on partitioning).

Semantics: documents are ordered by ``id_col`` (within ``shard_col`` if
given); each document's tokens occupy a contiguous range of the global
token stream at offset ``sum(n_tok of predecessors)``; chunk ``k`` is
stream positions ``[k*seq_len, (k+1)*seq_len)``. A document spanning a
chunk boundary is SPLIT across the two chunks (standard pretraining
packing; callers that must not split can pre-filter long docs).

Scale: the cumulative offset is a prefix sum — a window over the global
order, which Spark executes in a single sorted partition. That is fine
up to the sort capacity of one executor's spill path but is the wrong
plan at 100 TB, so ``shard_col`` packs each shard independently
(embarrassingly parallel; output chunks are keyed ``(shard, seq_id)``) —
the production mode, with shards chosen at bucket/source granularity.
Everything else is native Catalyst: one window, one explode of at most
``ceil(n/seq_len)+1`` pieces per doc, one id-keyed aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    *,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    shard_col: str | None = None,
) -> DataFrame:
    """Pack variable-length token arrays into fixed ``seq_len`` chunks.

    Returns ``(shard?, seq_id, tokens, n_tok, n_docs)``: chunk id within
    the (shard's) stream, the packed token array (``n_tok == seq_len``
    for every chunk except the last partial one), and how many documents
    contributed tokens to the chunk. Empty documents are skipped.

    Plan: prefix-sum window (per shard) → per-doc piece explode (a doc
    emits one piece per chunk it overlaps: ``(chunk, slice)``) → group by
    chunk, order pieces by their global stream offset, flatten. The
    explode is bounded — a doc overlaps at most ``ceil(n/seq_len)+1``
    chunks — so no operator sees more than O(tokens) rows."""
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    L = int(seq_len)
    toks = F.col(tokens_col)
    keys = ([shard_col] if shard_col else []) + ["seq_id"]

    w = (
        Window.partitionBy(shard_col).orderBy(id_col)
        if shard_col
        else Window.orderBy(id_col)
    )
    d = (
        df.select(*([shard_col] if shard_col else []), id_col, toks.alias("_t"))
        .where(F.size("_t") > 0)
        .withColumn("_n", F.size("_t"))
        .withColumn("_off", (F.sum("_n").over(w) - F.col("_n")).cast("long"))
    )
    off, n = F.col("_off"), F.col("_n")
    # chunks this doc overlaps: floor(off/L) .. floor((off+n-1)/L)
    first = F.floor(off / L)
    last = F.floor((off + n - 1) / L)
    piece = F.explode(
        F.transform(
            F.sequence(first, last),
            lambda k: F.struct(
                k.alias("seq_id"),
                # global stream start of this piece — the sort key that
                # re-orders pieces inside a chunk (struct sort is by
                # field order, so gstart leads)
                F.greatest(k * L, off).alias("gstart"),
                F.slice(
                    F.col("_t"),
                    (F.greatest(k * L - off, F.lit(0)) + 1).cast("int"),
                    (
                        F.least((k + 1) * L, off + n) - F.greatest(k * L, off)
                    ).cast("int"),
                ).alias("toks"),
            ),
        )
    )
    pieces = d.select(*([shard_col] if shard_col else []), piece.alias("p")).select(
        *([shard_col] if shard_col else []),
        F.col("p.seq_id").alias("seq_id"),
        F.struct(F.col("p.gstart").alias("gstart"), F.col("p.toks").alias("toks")).alias(
            "piece"
        ),
    )
    return (
        pieces.groupBy(*keys)
        .agg(
            F.flatten(
                F.transform(F.array_sort(F.collect_list("piece")), lambda x: x["toks"])
            ).alias("tokens"),
            F.count("*").alias("n_docs"),
        )
        .withColumn("n_tok", F.size("tokens"))
        .select(*keys, "tokens", "n_tok", "n_docs")
    )


def pack_documents(
    docs: DataFrame,
    seq_len: int,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard_col: str | None = None,
) -> DataFrame:
    """Convenience over text documents: whitespace-tokenize (textops'
    ws convention), pack, and emit the chunk as a joined ``token_str``
    (portable for cross-engine value comparison) beside the counts."""
    tok = docs.select(
        *([shard_col] if shard_col else []),
        id_col,
        F.split(F.trim(F.col(text_col)), r"\s+").alias("tokens"),
    )
    packed = pack_sequences(
        tok, seq_len, tokens_col="tokens", id_col=id_col, shard_col=shard_col
    )
    keys = ([shard_col] if shard_col else []) + ["seq_id"]
    return packed.select(
        *keys, F.array_join("tokens", " ").alias("token_str"), "n_tok", "n_docs"
    )
