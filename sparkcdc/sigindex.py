"""sigindex — a persistent MinHash/LSH signature index, maintained
incrementally from an icebox table's change feed.

This is the reference's incremental-pull principle (fetch only issues
updated since the last run — /root/reference/src/main/java/org/embulk/
input/jira/JiraInputPlugin.java:154-163) applied to the dedup family.
Recomputing shingles + MinHash for the whole corpus on every ingest is
O(corpus) CPU per batch — the dominant dedup cost at 100 TB. Instead the
signatures live in their OWN icebox table (``doc_id, mh_0 … mh_{k-1}``,
LWW-merged, hash-bucketed like any other table), and maintenance is:

  read_changes(from=last-synced snapshot)   -- O(changed buckets)
    → minhash_signatures(changed docs only) -- O(batch) CPU
    → MERGE into the index                  -- O(touched buckets)
    → advance_consumer                      -- pin released

The doc table's consumer registry pins the from-snapshot, so table
maintenance (expire_snapshots) can never break the index's incremental
reader; the MERGE's batch_id is derived from the (from, to) snapshot ids,
so a crash between MERGE and advance_consumer replays as an exactly-once
no-op. Deduping a NEW batch probes the batch's band keys against the
index: signatures are computed for the batch only, the batch side is
broadcast, and the index is scanned once with no shuffle — no document
text outside the batch is re-read or re-hashed.

Band keys are DERIVED from the stored minhashes at read time (a pure
projection) rather than stored, so the index stays one narrow row per
document and band parameters can be re-derived without a rebuild.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .commitstore import CommitStore
from .dedupe_docs import (
    LSH_BANDS,
    MINHASH_K,
    band_keys,
    banded_pairs,
    cap_hot_bands,
    minhash_signatures,
    sim_chunks,
    simhash64_native,
    simhash_chunk_pairs,
)
from .icebox import IceboxTable

_META_NAME = "sigindex.json"
_SIM_META_NAME = "simindex.json"


def _index_schema(k: int, key_type: T.DataType) -> T.StructType:
    return T.StructType(
        [T.StructField("doc_id", key_type)]
        + [T.StructField(f"mh_{i}", T.StringType()) for i in range(k)]
    )


class IncrementalIndex:
    """Shared machinery for derived icebox tables maintained incrementally
    from a source table's change feed (SignatureIndex here, VectorIndex in
    vecindex.py): consumer-pinned read_changes window, a subclass-supplied
    derivation over ONLY the changed rows, LWW MERGE into the index, and
    exactly-once replay via a (from, to)-snapshot batch id. Source rows
    the derivation cannot represent (too-short docs, null vectors) are
    REMOVED from the index rather than stored degenerate."""

    table: IceboxTable

    # fold MOR delta files back into bucket bases once more than this many
    # accumulate (the streaming sink's compact_delta_files discipline):
    # steady-state refreshes are small relative to the index, so the
    # cost-based merge lands them as O(batch) deltas — without periodic
    # folding, read-time LWW resolution degrades as deltas stack up
    compact_delta_files: int = 32

    def _window(
        self, src_table: IceboxTable, *, consumer: str, mode: str = "net"
    ) -> tuple:
        """Consumer-pinned change window: ``(from_sid, to_sid, changes)``.

        ``changes is None`` means up to date (nothing to fold);
        ``from_sid is None`` means bootstrap-onto-expired — the caller must
        register the consumer only AFTER its merge is durable (a crash in
        between just redoes the bootstrap; LWW makes the re-merge a
        harmless rewrite). ``mode`` is passed through to ``read_changes``
        ("net" or "cdf"); the bootstrap slice is shaped to match."""
        to_sid = src_table.refresh()["snapshot_id"]
        regs = src_table.consumers()
        if consumer in regs:
            from_sid = regs[consumer]
            if from_sid == to_sid:
                return from_sid, to_sid, None
            return from_sid, to_sid, src_table.read_changes(from_sid, to_sid, mode=mode)
        if 0 in src_table._history_ids():
            # bootstrap: snapshot 0 is the empty created table, so the
            # first refresh indexes the whole current corpus as "changes"
            from_sid = src_table.register_consumer(consumer, 0)
            if from_sid == to_sid:
                return from_sid, to_sid, None
            return from_sid, to_sid, src_table.read_changes(from_sid, to_sid, mode=mode)
        # bootstrap onto a table whose empty snapshot is already expired:
        # the full current state IS the change set (every visible row as
        # an insert/upsert at its own LSN).
        tag = F.lit("insert").alias("_change_type") if mode == "cdf" else (
            F.lit("upsert").alias("_change")
        )
        ch = src_table.read(to_sid, with_seq=True).select(tag, "*").drop("_deleted")
        return None, to_sid, ch

    def _advance(
        self, src_table: IceboxTable, consumer: str, from_sid, to_sid: int
    ) -> None:
        if from_sid is None:
            src_table.register_consumer(consumer, to_sid)
        else:
            src_table.advance_consumer(consumer, to_sid)

    def _compact_if_needed(self, m: dict) -> dict:
        n_delta = sum(
            1 for e in self.table.snapshot["manifest"] if e.get("kind") == "delta"
        )
        if self.compact_delta_files and n_delta > self.compact_delta_files:
            return {**m, "compacted": self.table.compact()}
        return m

    def _refresh(self, src_table: IceboxTable, *, consumer: str, derive) -> dict:
        """``derive(upserts) -> DataFrame`` maps changed source rows (the
        ``_change='upsert'`` slice of the feed, payload columns intact) to
        index payload rows keyed by the index key; rows it omits are
        deleted from the index. O(changed source buckets) end to end."""
        from_sid, to_sid, ch = self._window(src_table, consumer=consumer)
        if ch is None:
            return {
                "skipped": True, "from_snapshot": from_sid, "to_snapshot": to_sid,
            }
        key = self.table.key
        schema = self.table.schema
        payload_cols = [f.name for f in schema.fields if f.name != key]
        # the index row's LWW seq is the WINDOW's target snapshot id, not
        # the source row's own seq (PackedTable's convention): refresh
        # order is what must win. With row seqs, a rollback-restored row
        # (lower seq than the stale indexed version) would LOSE the merge
        # and the index would keep the rolled-back value forever — the
        # change feed now emits such reversals (icebox.read_changes) and
        # the monotone to_sid lets them land. Exactly-once is unchanged:
        # the batch id is still the (from, to) snapshot pair.
        win_seq = F.lit(int(to_sid)).cast("long").alias("_seq")
        ups = ch.where(F.col("_change") == "upsert")
        derived = derive(ups)
        keyed = ups.select(key)
        idx_up = keyed.join(derived, key).select(
            F.lit("upsert").alias("_change"), key, *payload_cols, win_seq
        )
        nulls = [
            F.lit(None).cast(f.dataType).alias(f.name)
            for f in schema.fields
            if f.name != key
        ]
        unrepresentable = keyed.join(derived.select(key), key, "left_anti")
        removals = (
            ch.where(F.col("_change") == "delete")
            .select(key)
            .unionByName(unrepresentable)
            .select(F.lit("delete").alias("_change"), key, *nulls, win_seq)
        )
        m = self.table.merge(
            idx_up.unionByName(removals),
            batch_id=f"{consumer}:{from_sid}->{to_sid}",
            seq_col="_seq",
            op_col="_change",
            delete_value="delete",
            fence=False,
            tombstones=True,
            # cost-based: a small steady-state refresh lands as MOR deltas
            # (O(batch) write) instead of COW-rewriting its buckets; the
            # bootstrap (batch ≈ index) goes copy-on-write
            mor=None,
        )
        self._advance(src_table, consumer, from_sid, to_sid)
        m = self._compact_if_needed(m)
        return {**m, "from_snapshot": from_sid, "to_snapshot": to_sid}


def consume_changes(
    src_table: IceboxTable,
    consumer: str,
    apply_fn,
    *,
    mode: str = "net",
) -> dict:
    """The consumer-window machinery as a PUBLIC primitive: feed a
    user-defined downstream sink from the table's change feed with the
    same discipline the built-in consumers (SignatureIndex, VectorIndex,
    NgramIndex, PackedTable) use — the registry pins the from-snapshot
    (expiration can never break the feed), the window is
    ``read_changes(from=last-synced)`` in ``mode`` ("net" or "cdf"), and
    the pin advances ONLY after ``apply_fn`` returns.

    ``apply_fn(changes_df, from_sid, to_sid)`` — a crash before the pin
    advance replays the SAME (from, to) window on the next call, so
    end-to-end semantics are exactly-once iff the sink is idempotent per
    window (e.g. keyed by the (from, to) pair — the icebox MERGE batch-id
    convention) and at-least-once otherwise. Returns the window metadata
    plus whatever dict ``apply_fn`` returned."""

    class _Shim(IncrementalIndex):
        def __init__(self):
            pass

    shim = _Shim()
    from_sid, to_sid, ch = shim._window(src_table, consumer=consumer, mode=mode)
    if ch is None:
        return {"skipped": True, "from_snapshot": from_sid, "to_snapshot": to_sid}
    out = apply_fn(ch, from_sid, to_sid)
    shim._advance(src_table, consumer, from_sid, to_sid)
    return {
        **(out if isinstance(out, dict) else {}),
        "from_snapshot": from_sid,
        "to_snapshot": to_sid,
    }


class SignatureIndex(IncrementalIndex):
    """Persistent MinHash signature index over a document corpus.

    Wraps an :class:`IceboxTable` keyed by ``doc_id``; ``k``/``bands`` are
    frozen at create time in a metadata sidecar so every maintainer and
    prober derives the same hash family.
    """

    def __init__(self, spark: SparkSession, table: IceboxTable, *, k: int, bands: int):
        self.spark = spark
        self.table = table
        self.k = k
        self.bands = bands

    # ---------------- lifecycle ----------------

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        *,
        k: int = MINHASH_K,
        bands: int = LSH_BANDS,
        n_buckets: int = 16,
        key_type: T.DataType = T.StringType(),
        store: CommitStore | None = None,
    ) -> "SignatureIndex":
        if k % bands:
            raise ValueError(f"k={k} must be divisible by bands={bands}")
        table = IceboxTable.create(
            spark, path, _index_schema(k, key_type), key="doc_id",
            n_buckets=n_buckets, store=store,
        )
        table._store.put(_META_NAME, json.dumps({"k": k, "bands": bands}).encode())
        return cls(spark, table, k=k, bands=bands)

    @classmethod
    def load(
        cls, spark: SparkSession, path: str, *, store: CommitStore | None = None
    ) -> "SignatureIndex":
        table = IceboxTable.load(spark, path, store=store)
        meta = json.loads(table._store.get(_META_NAME))
        return cls(spark, table, k=int(meta["k"]), bands=int(meta["bands"]))

    @staticmethod
    def table_exists(path: str) -> bool:
        return IceboxTable.exists(path)

    # ---------------- incremental maintenance ----------------

    def refresh_from(
        self,
        doc_table: IceboxTable,
        *,
        consumer: str = "sigindex",
        text_col: str = "text",
    ) -> dict:
        """Fold the doc table's changes since the last sync into the index.

        O(changed docs), not O(corpus): ``read_changes`` reads only buckets
        whose file set changed, shingling/hashing runs only over those
        docs, and the MERGE touches only their index buckets. An upserted
        doc too short to shingle (or a deleted doc) is REMOVED from the
        index — unindexable docs never pollute the band space. Safe to
        re-run after a crash: the batch id is the (from, to) snapshot pair,
        so the replayed MERGE is skipped by the idempotency fence, and the
        consumer pin is only advanced after the MERGE is durable."""
        return self._refresh(
            doc_table,
            consumer=consumer,
            derive=lambda ups: minhash_signatures(ups, k=self.k, text_col=text_col),
        )

    # ---------------- query ----------------

    def signatures(self) -> DataFrame:
        """Current (doc_id, mh_0 … mh_{k-1}) — identical to
        ``minhash_signatures`` over the current corpus state. Refreshes
        the table handle first: an index serves LIVE state even when
        another maintainer (or a fenced duplicate of our own refresh)
        committed through a different handle; snapshot-pinned reads are
        available via ``table.read(snapshot_id=...)`` directly."""
        self.table.refresh()
        return self.table.read()

    def pairs(self, *, max_band: int | None = None) -> DataFrame:
        """All candidate near-dup pairs from the stored index — equals
        ``minhash_lsh_pairs`` over the current corpus with zero signature
        recompute (band keys are a projection of the index scan)."""
        if max_band is None:
            max_band = 512
        banded = cap_hot_bands(
            band_keys(self.signatures(), k=self.k, bands=self.bands), max_band
        )
        return banded_pairs(banded)

    def probe(
        self,
        new_docs: DataFrame,
        *,
        text_col: str = "text",
        max_band: int | None = None,
    ) -> DataFrame:
        """Candidate pairs between a NEW batch and the indexed corpus:
        ``(new_id, indexed_id)`` sharing at least one LSH band.

        The scale path for ingest-time dedup: MinHash runs over the batch
        only, the batch's band rows are broadcast, and the index is scanned
        once with NO shuffle (broadcast hash join) — per-batch cost is
        O(batch CPU + index scan), independent of corpus text size. Docs
        already present in the index match themselves; callers dedup a
        batch pre-commit by probing before merging it into the doc table
        (``new_id != indexed_id`` filters the self-match either way)."""
        if max_band is None:
            max_band = 512
        nsig = minhash_signatures(new_docs, k=self.k, text_col=text_col)
        nb = band_keys(nsig, k=self.k, bands=self.bands).select(
            F.col("doc_id").alias("new_id"), "band", "band_key"
        )
        # r6: semi-join the index's band rows down to the batch's band
        # keys BEFORE the hot-band cap — the cap's rank is computed per
        # (band, band_key) group and the semi-join keeps whole groups, so
        # the retained members are identical, but the row_number window
        # now sorts only the matching groups instead of shuffling every
        # band row of the index on every probe.
        ib = band_keys(self.signatures(), k=self.k, bands=self.bands).join(
            F.broadcast(nb.select("band", "band_key").distinct()),
            ["band", "band_key"],
            "leftsemi",
        )
        ib = cap_hot_bands(ib, max_band)
        return (
            ib.join(F.broadcast(nb), ["band", "band_key"])
            .where(F.col("doc_id") != F.col("new_id"))
            .select("new_id", F.col("doc_id").alias("indexed_id"))
            .distinct()
        )


class SimhashIndex(IncrementalIndex):
    """Persistent 64-bit SimHash index over a document corpus — the simhash
    analog of :class:`SignatureIndex`, one narrow ``(doc_id, sim:long)``
    row per doc, maintained incrementally from the doc table's change feed
    via the shared :class:`IncrementalIndex` machinery (consumer-pinned
    window, exactly-once MERGE, unrepresentable-row removal).

    The stored family is the NATIVE one (``simhash64_native``: xxhash64
    tokens, JVM bit-vote — no Python per row), so index maintenance stays
    whole-stage-codegen'd; sims are not comparable to the md5 oracle
    family. A null-text doc has no sim and is removed from the index; a
    token-less doc stores the all-zero-vote sentinel (-2^63), matching the
    recompute path's conventions. Chunk banding is DERIVED at read time
    (a projection), mirroring SignatureIndex's derived band keys — the
    index never stores band layout."""

    def __init__(self, spark: SparkSession, table: IceboxTable):
        self.spark = spark
        self.table = table

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        *,
        n_buckets: int = 16,
        key_type: T.DataType = T.StringType(),
        store: CommitStore | None = None,
    ) -> "SimhashIndex":
        schema = T.StructType(
            [T.StructField("doc_id", key_type), T.StructField("sim", T.LongType())]
        )
        table = IceboxTable.create(
            spark, path, schema, key="doc_id", n_buckets=n_buckets, store=store
        )
        table._store.put(_SIM_META_NAME, json.dumps({"family": "native"}).encode())
        return cls(spark, table)

    @classmethod
    def load(
        cls, spark: SparkSession, path: str, *, store: CommitStore | None = None
    ) -> "SimhashIndex":
        table = IceboxTable.load(spark, path, store=store)
        json.loads(table._store.get(_SIM_META_NAME))  # existence = format check
        return cls(spark, table)

    # ---------------- incremental maintenance ----------------

    def refresh_from(
        self,
        doc_table: IceboxTable,
        *,
        consumer: str = "simindex",
        text_col: str = "text",
    ) -> dict:
        """Fold the doc table's changes since the last sync into the index:
        O(changed docs) hashing + O(touched buckets) MERGE, exactly-once
        under crash/replay (same contract as SignatureIndex.refresh_from)."""
        return self._refresh(
            doc_table,
            consumer=consumer,
            derive=lambda ups: simhash64_native(ups, text_col=text_col).where(
                F.col("sim").isNotNull()
            ),
        )

    # ---------------- query ----------------

    def sims(self) -> DataFrame:
        """Current (doc_id, sim) — identical to ``simhash64_native`` over
        the live corpus state (handle refreshed so racing maintainers'
        commits are visible)."""
        self.table.refresh()
        return self.table.read()

    def pairs(self, *, max_hamming: int = 4, max_chunk: int | None = None) -> DataFrame:
        """All near-dup pairs (hamming ≤ max_hamming) from the stored sims —
        equals ``simhash_near_pairs`` over the current corpus with ZERO
        re-hashing. Default hot-chunk cap sized from a zero-job row count
        of the index itself."""
        from .ann import _cap_row_count, default_bucket_cap

        sims = self.sims()
        if max_chunk is None:
            max_chunk = default_bucket_cap(_cap_row_count(sims, None), 65536)
        return simhash_chunk_pairs(sims, max_hamming=max_hamming, max_chunk=max_chunk)

    def probe(
        self,
        new_docs: DataFrame,
        *,
        text_col: str = "text",
        max_hamming: int = 4,
        max_chunk: int | None = None,
    ) -> DataFrame:
        """Near-dup pairs between a NEW batch and the indexed corpus:
        ``(new_id, indexed_id, hamming)`` with hamming ≤ max_hamming.

        Ingest-time scale shape, same as SignatureIndex.probe: simhash runs
        over the batch only, the batch's chunk rows are BROADCAST, and the
        index is scanned once with no shuffle. Docs already indexed match
        themselves; the self-pair is filtered."""
        from .ann import _cap_row_count, default_bucket_cap

        nsim = simhash64_native(new_docs, text_col=text_col).where(
            F.col("sim").isNotNull()
        )
        nb = sim_chunks(nsim).select(
            F.col("doc_id").alias("new_id"), F.col("sim").alias("nsim"),
            "chunk_idx", "chunk",
        )
        sims = self.sims()
        if max_chunk is None:
            max_chunk = default_bucket_cap(_cap_row_count(sims, None), 65536)
        # semi-join to the batch's chunk keys before the hot-chunk cap —
        # whole groups are kept, so the cap's per-group rank (and thus the
        # retained member set) is unchanged while the window no longer
        # shuffles every chunk row of the index per probe (same shape as
        # SignatureIndex.probe).
        ib = sim_chunks(sims).join(
            F.broadcast(nb.select("chunk_idx", "chunk").distinct()),
            ["chunk_idx", "chunk"],
            "leftsemi",
        )
        if max_chunk > 0:
            from pyspark.sql import Window

            w = Window.partitionBy("chunk_idx", "chunk").orderBy(
                F.abs(F.xxhash64(F.col("doc_id"))), F.col("doc_id")
            )
            ib = (
                ib.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") <= max_chunk)
                .drop("_rn")
            )
        ham = F.bit_count(F.col("sim").bitwiseXOR(F.col("nsim")))
        return (
            ib.join(F.broadcast(nb), ["chunk_idx", "chunk"])
            .where(F.col("doc_id") != F.col("new_id"))
            .select("new_id", F.col("doc_id").alias("indexed_id"), ham.alias("hamming"))
            .where(F.col("hamming") <= max_hamming)
            .distinct()
        )


def dedup_gated_ingest(
    doc_table: IceboxTable,
    index: SignatureIndex,
    batch: DataFrame,
    batch_id: str,
    *,
    threshold: float = 0.6,
    text_col: str = "text",
    seq_col: str = "seq",
    op_col: str = "op",
    max_band: int | None = None,
    point_read_threshold: int = 10_000,
) -> dict:
    """The production ingest shape: near-dup-gate a batch against the
    ALREADY-INGESTED corpus before committing it.

      probe      — the batch's band keys (computed over the batch only,
                   broadcast) against one scan of the signature index
      verify     — exact n-gram Jaccard on candidate pairs ONLY; the
                   indexed side's text is point-read from the doc table
                   by key (read_keys: bucket + footer-range pruning), so
                   verification reads O(candidate) rows, not the corpus
      commit     — survivors MERGE into the doc table (deletes and
                   non-candidate upserts pass straight through)
      maintain   — the index folds the same committed changes via its
                   change-feed refresh, staying exactly in sync

    Per-batch cost is O(batch CPU + index scan + candidate point-reads) —
    independent of corpus text size. In-batch duplicates are NOT handled
    here (run exact_dedupe / minhash over the batch first if producers
    can emit them); a batch doc pairing only with other batch docs is
    ingested.

    Candidate texts come via ``read_keys`` point lookups (bucket +
    footer-range pruning) while the distinct candidate id set fits
    ``point_read_threshold`` driver-side; a dup-heavy batch whose
    candidate set blows past it switches to a distributed semi-join
    against the table scan instead — no unbounded driver collect on any
    input. Returns counts + the merge and refresh metrics."""
    from .dedupe_docs import shingles

    ups = batch.where(F.col(op_col) != "delete")
    cand = index.probe(ups, text_col=text_col, max_band=max_band)
    cand_ids = cand.select("indexed_id").distinct()
    idx_ids = [r["indexed_id"] for r in cand_ids.limit(point_read_threshold + 1).collect()]
    dropped = 0
    if idx_ids:
        key = doc_table.key
        if len(idx_ids) <= point_read_threshold:
            cand_docs = doc_table.read_keys(idx_ids)
        else:
            # too many candidates for a keyed point-read: semi-join the
            # candidate ids against the table scan (distributed, no
            # driver materialization beyond the threshold probe above)
            cand_docs = doc_table.read().join(
                cand_ids.withColumnRenamed("indexed_id", key), key, "leftsemi"
            )
        idx_docs = cand_docs.select(
            F.col(key).alias("indexed_id"), F.col(text_col).alias("_itext")
        )
        sh_new = shingles(ups.select(F.col(key).alias("doc_id"), text_col))
        sh_idx = shingles(
            idx_docs.select(F.col("indexed_id").alias("doc_id"), F.col("_itext").alias(text_col))
        )
        cnt_new = sh_new.groupBy("doc_id").agg(F.count("*").alias("n_new"))
        cnt_idx = sh_idx.groupBy("doc_id").agg(F.count("*").alias("n_idx"))
        inter = (
            cand.join(sh_new.select(F.col("doc_id").alias("new_id"), "shingle"), "new_id")
            .join(sh_idx.select(F.col("doc_id").alias("indexed_id"), "shingle"),
                  ["indexed_id", "shingle"])
            .groupBy("new_id", "indexed_id")
            .agg(F.count("*").alias("n_common"))
        )
        verified = (
            inter.join(cnt_new.select(F.col("doc_id").alias("new_id"), "n_new"), "new_id")
            .join(cnt_idx.select(F.col("doc_id").alias("indexed_id"), "n_idx"), "indexed_id")
            .where(
                F.col("n_common")
                / (F.col("n_new") + F.col("n_idx") - F.col("n_common"))
                >= threshold
            )
        )
        losers = verified.select(F.col("new_id").alias(doc_table.key)).distinct()
        dropped = losers.count()
        batch = batch.join(losers, doc_table.key, "left_anti")
    m = doc_table.merge(batch, batch_id, seq_col=seq_col, op_col=op_col)
    ref = index.refresh_from(doc_table)
    return {
        "dropped_near_dups": dropped,
        "merge": m,
        "index_refresh": {k: ref[k] for k in ("from_snapshot", "to_snapshot")
                          if k in ref},
    }
