"""CommitStore — the metadata-plane storage primitives behind IceboxTable.

The table format's whole concurrency story rests on exactly one primitive:
an ATOMIC create-if-absent publish of ``commit-<id>.json`` (the CAS every
optimistic writer races on). Everything else the metadata plane needs is
plain durable reads/overwrites. This module isolates those primitives
behind an interface so the same commit protocol runs on any substrate:

  * ``PosixCommitStore`` (default): create-if-absent via ``os.link`` (POSIX
    guarantees hard-link creation is atomic and fails with EEXIST exactly
    once per name); overwrite via write-temp + ``os.replace``.
  * Object stores (the substrate a 100 TB table actually lives on): the
    SAME interface maps to conditional writes —
      - S3:  ``PutObject`` with ``If-None-Match: *`` (returns 412
        PreconditionFailed when the key exists → ``put_if_absent`` False);
        plain ``PutObject`` for ``put`` (last write wins, which is safe for
        checkpoints/VERSION because both are idempotent derivations of the
        commit log, never the source of truth).
      - GCS: ``insert`` with ``x-goog-if-generation-match: 0`` (or the
        ``ifGenerationMatch=0`` query param) → 412 when present.
      - Azure Blob: ``Put Blob`` with ``If-None-Match: *``.
    No rename, no hard link, no directory semantics are required — names
    are flat keys, ``list_names`` is a prefix LIST. That constraint shaped
    the protocol: the commit file IS the lock, and readers fold the log,
    so nothing ever depends on atomic rename-over or on mtime ordering.
  * ``InMemoryCommitStore``: dict-backed, lock-serialized — both the unit
    substrate proving no metadata op bypasses the interface, and (via the
    injection hooks) the fault harness that races CAS losses and crashes
    through merge/compact/rebucket.

Reference seed: the reference has no commit protocol at all — it forces a
single task (JiraInputPlugin.java:125 ``taskCount=1``) and disclaims
resume; a multi-writer lake sink must solve publish atomicity instead.
"""

from __future__ import annotations

import os
import threading
import uuid
from abc import ABC, abstractmethod


class CommitStoreFault(IOError):
    """Injected (or real) transient metadata-store failure."""


class CommitStore(ABC):
    """Flat key → bytes store with one atomic conditional-create primitive.

    Contract:
      * ``put_if_absent`` is ATOMIC: of N concurrent callers for the same
        name, exactly one returns True; the bytes visible afterwards are
        the winner's, complete (no torn reads).
      * ``put`` atomically overwrites (readers see old or new, never torn).
      * ``get`` raises FileNotFoundError for missing names.
      * ``list_names`` returns current names with the given prefix; it may
        be weakly consistent (an object-store LIST), so callers must treat
        it as a hint and handle get() misses — the icebox does.
    """

    @abstractmethod
    def put_if_absent(self, name: str, data: bytes) -> bool:
        """Atomically create ``name`` with ``data`` iff it does not exist.
        True = this caller created it (won the CAS)."""

    @abstractmethod
    def put(self, name: str, data: bytes) -> None:
        """Atomically overwrite ``name`` with ``data``."""

    @abstractmethod
    def get(self, name: str) -> bytes:
        """Read ``name`` or raise FileNotFoundError."""

    @abstractmethod
    def exists(self, name: str) -> bool: ...

    @abstractmethod
    def list_names(self, prefix: str = "") -> list[str]: ...

    @abstractmethod
    def delete(self, name: str) -> None:
        """Remove ``name``; missing names are a no-op (idempotent)."""


class PosixCommitStore(CommitStore):
    """Filesystem-backed store rooted at one directory (the table's
    ``metadata/``). ``put_if_absent`` uses ``os.link`` from a unique temp
    file — the POSIX analog of a conditional PUT: link(2) is atomic and
    raises FileExistsError when the target name already exists."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _p(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _tmp(self, data: bytes) -> str:
        tmp = os.path.join(self.root, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "wb") as fh:
            fh.write(data)
        return tmp

    def put_if_absent(self, name: str, data: bytes) -> bool:
        tmp = self._tmp(data)
        try:
            os.link(tmp, self._p(name))
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    def put(self, name: str, data: bytes) -> None:
        os.replace(self._tmp(data), self._p(name))

    def get(self, name: str) -> bytes:
        with open(self._p(name), "rb") as fh:
            return fh.read()

    def exists(self, name: str) -> bool:
        return os.path.exists(self._p(name))

    def list_names(self, prefix: str = "") -> list[str]:
        try:
            names = os.listdir(self.root)
        except FileNotFoundError:
            return []
        return sorted(
            n for n in names if n.startswith(prefix) and not n.startswith(".tmp-")
        )

    def delete(self, name: str) -> None:
        try:
            os.remove(self._p(name))
        except FileNotFoundError:
            pass

    def sweep_debris(self, grace_sec: float = 600.0) -> int:
        """Remove `.tmp-` staging files older than ``grace_sec`` — debris
        from writers that crashed between staging and publish (the link/
        replace never ran, so nothing references them). Age-gated for the
        same reason as the data-file orphan sweep: a LIVE writer's staged
        temp is younger than the grace window. Called from
        ``expire_snapshots``; object-store impls have no staging files
        (a conditional PUT is single-shot) and need no equivalent."""
        import time

        now = time.time()
        swept = 0
        for n in os.listdir(self.root):
            if not n.startswith(".tmp-"):
                continue
            p = os.path.join(self.root, n)
            try:
                if now - os.path.getmtime(p) >= grace_sec:
                    os.remove(p)
                    swept += 1
            except FileNotFoundError:
                pass
        return swept


class InMemoryCommitStore(CommitStore):
    """Dict-backed store with the same atomicity contract (a lock stands in
    for the substrate's conditional write) plus fault-injection hooks for
    racing the commit protocol:

      * ``before_put_if_absent(name)`` — runs just before the CAS is
        evaluated, OUTSIDE the lock: the canonical race window. A test
        hook that commits a competing delta here makes THIS caller lose
        exactly like a concurrent writer on S3 would make it lose.
      * ``fail_next_cas = k`` — the next k put_if_absent calls raise
        CommitStoreFault before touching state (network flake / 503).
      * ``crash_after_cas_once`` — the next WINNING put_if_absent applies
        its write, then raises (process death after a durable conditional PUT:
        the commit exists but the writer never learns) — the exact
        ambiguity an object-store writer must survive.
    """

    def __init__(self):
        self._data: dict[str, bytes] = {}
        self._lock = threading.Lock()
        self.before_put_if_absent = None
        self.fail_next_cas = 0
        self.crash_after_cas_once = False
        self.cas_attempts = 0

    def put_if_absent(self, name: str, data: bytes) -> bool:
        if self.before_put_if_absent is not None:
            self.before_put_if_absent(name)
        with self._lock:
            self.cas_attempts += 1
            if self.fail_next_cas > 0:
                self.fail_next_cas -= 1
                raise CommitStoreFault(f"injected CAS fault on {name}")
            if name in self._data:
                return False
            self._data[name] = bytes(data)
            if self.crash_after_cas_once:
                self.crash_after_cas_once = False
                raise CommitStoreFault(f"injected crash AFTER durable CAS of {name}")
            return True

    def put(self, name: str, data: bytes) -> None:
        with self._lock:
            self._data[name] = bytes(data)

    def get(self, name: str) -> bytes:
        with self._lock:
            if name not in self._data:
                raise FileNotFoundError(name)
            return self._data[name]

    def exists(self, name: str) -> bool:
        with self._lock:
            return name in self._data

    def list_names(self, prefix: str = "") -> list[str]:
        with self._lock:
            return sorted(n for n in self._data if n.startswith(prefix))

    def delete(self, name: str) -> None:
        with self._lock:
            self._data.pop(name, None)
