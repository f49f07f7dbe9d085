"""CommitStore abstraction + fault-injected commit protocol tests.

The OCC story must hold on the substrate a 100 TB table actually lives on
(S3/GCS conditional PUT), not just on POSIX hard links. These tests run
the FULL table stack against the in-memory store and race CAS losses,
transient faults, and crash-after-durable-CAS through merge, the consumer
registry, and the orphan sweep."""

from __future__ import annotations

import os

import pytest

from sparkcdc.changelog import generate_changelog, scan_slice
from sparkcdc.commitstore import (
    CommitStoreFault,
    InMemoryCommitStore,
    PosixCommitStore,
)
from sparkcdc.dedup import lww_dedup
from sparkcdc.icebox import IceboxTable
from tests.test_icebox import SCHEMA_V1


@pytest.mark.parametrize("make", [lambda p: PosixCommitStore(str(p)), lambda p: InMemoryCommitStore()])
def test_store_contract(tmp_path, make):
    """Both substrates satisfy the CommitStore contract the protocol
    depends on: exactly-once conditional create, atomic overwrite,
    prefix listing, idempotent delete."""
    s = make(tmp_path / "store")
    assert s.put_if_absent("commit-1.json", b"a") is True
    assert s.put_if_absent("commit-1.json", b"b") is False
    assert s.get("commit-1.json") == b"a"  # loser's bytes never visible
    s.put("VERSION", b"1")
    s.put("VERSION", b"2")
    assert s.get("VERSION") == b"2"
    with pytest.raises(FileNotFoundError):
        s.get("nope")
    assert s.exists("VERSION") and not s.exists("nope")
    s.put_if_absent("checkpoint-0.json", b"c")
    assert s.list_names("commit-") == ["commit-1.json"]
    assert set(s.list_names()) == {"commit-1.json", "checkpoint-0.json", "VERSION"}
    s.delete("commit-1.json")
    s.delete("commit-1.json")  # idempotent
    assert not s.exists("commit-1.json")


def test_table_runs_fully_on_inmemory_store(spark, tmp_path):
    """The whole metadata plane goes through the store interface: a table
    backed by the in-memory store runs create → merge → schema-free
    compact → time travel → expire with NO metadata directory on disk
    (data files still land under data/ via Spark)."""
    mem = InMemoryCommitStore()
    path = str(tmp_path / "tbl")
    t = IceboxTable.create(spark, path, SCHEMA_V1, n_buckets=4, store=mem)
    log = generate_changelog(spark, 2_000, 150, seed=11)
    t.merge(scan_slice(log, 0, 1_000), "b1")
    t.merge(scan_slice(log, 1_000, 2_000), "b2")
    expected = (
        lww_dedup(log.where("seq <= 2000"), key="doc_id", seq="seq")
        .where("op <> 'delete'")
        .count()
    )
    assert t.read().count() == expected
    assert t.read(snapshot_id=1).count() > 0  # time travel folds the log
    t.compact()
    assert t.read().count() == expected
    t.expire_snapshots(keep_last=1)
    assert t.read().count() == expected
    # the proof: nothing was written to the POSIX metadata location
    assert not os.path.exists(os.path.join(path, "metadata"))
    # and a second handle sharing the store sees the same state
    t2 = IceboxTable.load(spark, path, store=mem)
    assert t2.read().count() == expected


def test_cas_loss_to_disjoint_writer_rebases(spark, tmp_path):
    """A writer that loses the conditional PUT to a concurrent DISJOINT
    commit (injected at the exact race window) rebases and lands; both
    writers' rows survive."""
    mem = InMemoryCommitStore()
    path = str(tmp_path / "tbl")
    ta = IceboxTable.create(spark, path, SCHEMA_V1, n_buckets=8, store=mem)
    tb = IceboxTable.load(spark, path, store=mem)
    upd_a = spark.createDataFrame(
        [("ka", [1, 2], 2, "s", 10, "upsert")],
        "doc_id: string, tokens: array<int>, n_tok: int, source: string, seq: long, op: string",
    )
    upd_b = spark.createDataFrame(
        [("kb", [3], 1, "s", 11, "upsert")],
        "doc_id: string, tokens: array<int>, n_tok: int, source: string, seq: long, op: string",
    )

    def competitor(name):
        mem.before_put_if_absent = None  # one-shot: don't recurse on B's CAS
        tb.merge(upd_b, "batch-b")

    mem.before_put_if_absent = competitor
    m = ta.merge(upd_a, "batch-a")
    assert m["skipped"] is False
    ta.refresh()
    rows = {r["doc_id"] for r in ta.read().collect()}
    assert rows == {"ka", "kb"}
    # two real commits happened, serialized by the CAS
    assert ta.snapshot["snapshot_id"] == 2


def test_cas_loss_to_overlapping_writer_recomputes(spark, tmp_path):
    """Losing to an OVERLAPPING commit (same key → same bucket) forces a
    recompute against the winner's state; LWW still resolves correctly."""
    mem = InMemoryCommitStore()
    path = str(tmp_path / "tbl")
    ta = IceboxTable.create(spark, path, SCHEMA_V1, n_buckets=8, store=mem)
    tb = IceboxTable.load(spark, path, store=mem)
    schema = "doc_id: string, tokens: array<int>, n_tok: int, source: string, seq: long, op: string"
    older = spark.createDataFrame([("k", [1], 1, "s", 10, "upsert")], schema)
    newer = spark.createDataFrame([("k", [9, 9], 2, "s", 20, "upsert")], schema)

    def competitor(name):
        mem.before_put_if_absent = None
        tb.merge(newer, "batch-b")

    mem.before_put_if_absent = competitor
    m = ta.merge(older, "batch-a")  # loses, reloads, re-merges under LWW
    assert m["skipped"] is False
    ta.refresh()
    rows = ta.read(with_seq=True).collect()
    assert len(rows) == 1 and rows[0]["_seq"] == 20 and list(rows[0]["tokens"]) == [9, 9]


def test_transient_cas_fault_then_retry_is_exactly_once(spark, tmp_path):
    """A 503-style fault on the conditional PUT surfaces to the caller
    (nothing committed); the retried merge applies exactly once."""
    mem = InMemoryCommitStore()
    t = IceboxTable.create(spark, str(tmp_path / "tbl"), SCHEMA_V1, n_buckets=4, store=mem)
    log = generate_changelog(spark, 500, 50, seed=21)
    mem.fail_next_cas = 1
    with pytest.raises(CommitStoreFault):
        t.merge(log, "b1")
    assert t.snapshot["snapshot_id"] == 0  # nothing published
    m = t.merge(log, "b1")
    assert m["skipped"] is False
    n = t.read().count()
    m2 = t.merge(log, "b1")  # idempotent re-commit
    assert m2["skipped"] is True
    assert t.read().count() == n


def test_crash_after_durable_cas_retry_fences(spark, tmp_path):
    """THE object-store ambiguity: the conditional PUT lands durably but
    the writer dies before learning it. The retry must detect its own
    batch_id in the winning commit and skip — exactly-once, no double
    apply, and the committed file list stays the durable attempt's."""
    mem = InMemoryCommitStore()
    t = IceboxTable.create(spark, str(tmp_path / "tbl"), SCHEMA_V1, n_buckets=4, store=mem)
    log = generate_changelog(spark, 500, 50, seed=22)
    expected = (
        lww_dedup(log, key="doc_id", seq="seq").where("op <> 'delete'").count()
    )
    mem.crash_after_cas_once = True
    with pytest.raises(CommitStoreFault):
        t.merge(log, "b1")
    m = t.merge(log, "b1")  # driver retry after ambiguous failure
    assert m["skipped"] is True and "concurrently" in m["reason"]
    t.refresh()
    assert t.snapshot["snapshot_id"] == 1
    assert t.read().count() == expected


def test_concurrent_consumer_registration_race_both_survive(spark, tmp_path):
    """r3 soft spot #1: two consumers registering concurrently must BOTH
    survive — the loser of the registry CAS retries on the winner's state
    instead of clobbering it, and expiration honors both pins."""
    mem = InMemoryCommitStore()
    path = str(tmp_path / "tbl")
    ta = IceboxTable.create(spark, path, SCHEMA_V1, n_buckets=4, store=mem)
    log = generate_changelog(spark, 2_000, 100, seed=31)
    for i in range(6):
        ta.merge(scan_slice(log, i * 300, (i + 1) * 300), f"b{i}")
    tb = IceboxTable.load(spark, path, store=mem)

    def racing_registration(name):
        if name.startswith("consumers-"):
            mem.before_put_if_absent = None
            tb.register_consumer("reader-b", 2)

    mem.before_put_if_absent = racing_registration
    ta.register_consumer("reader-a", 3)
    regs = ta.consumers()
    assert regs == {"reader-a": 3, "reader-b": 2}
    # expiration clamps at the earliest surviving pin: both readers can
    # still materialize their from-snapshots afterwards
    ta.expire_snapshots(keep_last=1)
    assert ta.read_changes(2).count() >= 0
    assert ta.read_changes(3).count() >= 0


def test_sweep_during_inflight_merge_deletes_nothing_it_commits(spark, tmp_path):
    """r3 soft spot #3: an orphan sweep racing an uncommitted merge (data
    files written, commit not yet published — injected at the CAS window)
    must not delete anything the merge then commits."""
    mem = InMemoryCommitStore()
    path = str(tmp_path / "tbl")
    ta = IceboxTable.create(spark, path, SCHEMA_V1, n_buckets=4, store=mem)
    tb = IceboxTable.load(spark, path, store=mem)
    base = generate_changelog(spark, 500, 50, seed=41)
    ta.merge(base, "b0")
    swept = {}

    def sweeping_competitor(name):
        if name.startswith("commit-"):
            mem.before_put_if_absent = None
            tb.refresh()
            swept.update(tb.expire_snapshots(keep_last=1, sweep_orphans=True))

    log2 = generate_changelog(spark, 500, 50, seed=42)
    mem.before_put_if_absent = sweeping_competitor
    m = ta.merge(log2, "b1")
    assert m["skipped"] is False
    assert swept["orphan_files_swept"] == 0  # grace window protected them
    ta.refresh()
    assert ta.read().count() > 0  # every committed file still readable
    ta.read().collect()  # would raise if the sweep had deleted a data file


def test_registry_cas_under_real_thread_contention(spark, tmp_path):
    """8 threads register 8 distinct consumers through ONE shared store
    with no injected ordering: the versioned-chain CAS must serialize
    them so ALL survive (the lost-update bug this design replaces would
    drop some)."""
    from concurrent.futures import ThreadPoolExecutor

    mem = InMemoryCommitStore()
    t = IceboxTable.create(spark, str(tmp_path / "tbl"), SCHEMA_V1, n_buckets=4, store=mem)
    log = generate_changelog(spark, 500, 50, seed=51)
    t.merge(log, "b1")

    def reg(i: int) -> int:
        # each thread gets its own handle (fresh _snap) sharing the store
        h = IceboxTable.load(spark, t.path, store=mem)
        return h.register_consumer(f"reader-{i}", 1)

    with ThreadPoolExecutor(max_workers=8) as ex:
        list(ex.map(reg, range(8)))
    regs = t.consumers()
    assert regs == {f"reader-{i}": 1 for i in range(8)}
    # chain was GC'd down to a bounded number of versions
    assert len(mem.list_names("consumers-")) <= 8


@pytest.mark.parametrize("make", [lambda p: PosixCommitStore(str(p)), lambda p: InMemoryCommitStore()])
def test_put_if_absent_exactly_once_under_threads(tmp_path, make):
    """The contract the whole protocol rests on, under REAL contention:
    of 16 threads racing the same name, exactly one wins, and the bytes
    visible afterwards are the winner's (no torn/interleaved state)."""
    from concurrent.futures import ThreadPoolExecutor

    s = make(tmp_path / "race")
    for rnd in range(5):
        name = f"commit-{rnd}.json"

        def attempt(i: int) -> tuple[int, bool]:
            return i, s.put_if_absent(name, f"writer-{i}".encode())

        with ThreadPoolExecutor(max_workers=16) as ex:
            results = list(ex.map(attempt, range(16)))
        winners = [i for i, won in results if won]
        assert len(winners) == 1
        assert s.get(name) == f"writer-{winners[0]}".encode()


def test_registry_aba_stalled_mutator_not_lost(spark, tmp_path):
    """ADVICE r4 (icebox.py:875): GC frees superseded consumers-<v> names,
    so a STALLED mutator can win put_if_absent on a version below the live
    head — invisible to readers, its registration silently lost. The
    post-publish max-check must detect the shadowed publish, retract it,
    and retry on the real newest so the mutation still lands."""
    mem = InMemoryCommitStore()
    t = IceboxTable.create(
        spark, str(tmp_path / "tbl"), SCHEMA_V1, n_buckets=4, store=mem
    )
    log = generate_changelog(spark, 500, 50, seed=61)
    t.merge(log, "b1")
    t.register_consumer("reader-0", 1)  # registry now at consumers-1

    tb = IceboxTable.load(spark, t.path, store=mem)

    def stall_and_advance(name):
        # Fires on the stalled mutator's put of consumers-2: before its
        # CAS executes, six other registrations land (versions 2..7) and
        # GC with lag frees consumers-2 — re-opening the exact name the
        # stalled mutator is about to win.
        if name == "consumers-2.json":
            mem.before_put_if_absent = None
            for i in range(1, 7):
                tb.register_consumer(f"reader-{i}", 1)
            assert "consumers-2.json" not in mem.list_names("consumers-")

    mem.before_put_if_absent = stall_and_advance
    t.register_consumer("stalled", 1)  # ABA window: wins freed consumers-2
    regs = t.consumers()
    # every registration survives, the stalled one included
    assert regs == {**{f"reader-{i}": 1 for i in range(7)}, "stalled": 1}
    # and no shadow version below the head carries divergent state
    versions = sorted(
        int(n.rsplit("-", 1)[1].split(".")[0]) for n in mem.list_names("consumers-")
    )
    import json as _json

    head = _json.loads(mem.get(f"consumers-{versions[-1]}.json"))
    assert head == regs
