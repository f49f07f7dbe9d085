"""Per-data-file key bloom filters for point-lookup file skipping — the
Iceberg Puffin / Parquet bloom-filter analog for the icebox format.

Footer [key_min, key_max] ranges (icebox._entries_for_keys) prune
point lookups well ONLY when files are key-clustered (compact
cluster_by). The hot production shape is the opposite: a bucket carrying
a stack of MOR delta files, each holding a hash-scattered slice of the
key space — every delta's range covers essentially the whole bucket, so
range pruning keeps them all. A per-file bloom answers "might this file
contain key k" with ~1% false positives at ~10 bits/row, so a point
lookup on a 50-delta bucket opens the 1-2 files that actually hold the
key.

Blooms are DATA-plane sidecars (``<file>.parquet.bloom`` next to the
data file), not manifest payload: at 100 TB a manifest carrying megabits
of filter per file would sink the metadata plane that every commit CAS
round-trips. The manifest stores only the sidecar's relative path; read
paths load sidecars lazily, only for entries that survive bucket + range
pruning, and cache them per table handle. A missing/corrupt sidecar
degrades to "keep the file" — blooms are an optimization, never a
correctness dependency.

Hashing is double-hashing over md5 (h_i = h1 + i·h2 mod m): process-
and platform-independent, so a bloom built by one writer serves every
reader. Keys are normalized via ``str(key)`` — stable for the string
and integer key types the tables use.
"""

from __future__ import annotations

import hashlib
import math
import os
import struct

MAGIC = b"SCBF1"
DEFAULT_FPP = 0.01
# cap filter size per file: 2^22 bits = 512 KiB ≈ optimal for ~437k rows
# at 1% fpp; bigger files keep the cap and degrade fpp gracefully
MAX_BITS = 1 << 22


def _norm(key) -> bytes:
    return str(key).encode("utf-8")


def _h12(key_bytes: bytes) -> tuple[int, int]:
    d = hashlib.md5(key_bytes).digest()
    return int.from_bytes(d[:8], "big"), int.from_bytes(d[8:], "big") | 1


def params(n_rows: int, fpp: float = DEFAULT_FPP) -> tuple[int, int]:
    """(m bits, k hashes) for n rows at target fpp, size-capped."""
    n = max(int(n_rows), 1)
    m = int(-n * math.log(fpp) / (math.log(2) ** 2))
    m = min(max(m, 64), MAX_BITS)
    k = max(1, round(m / n * math.log(2)))
    return m, min(k, 16)


def build(keys, n_rows: int, *, fpp: float = DEFAULT_FPP) -> bytes:
    """Serialized bloom over an iterable of keys."""
    m, k = params(n_rows, fpp)
    bits = bytearray((m + 7) // 8)
    for key in keys:
        if key is None:
            continue
        h1, h2 = _h12(_norm(key))
        for i in range(k):
            h = (h1 + i * h2) % m
            bits[h >> 3] |= 1 << (h & 7)
    return MAGIC + struct.pack("<QI", m, k) + bytes(bits)


def load(path: str) -> tuple[int, int, bytes] | None:
    """Parse a sidecar; None on missing/corrupt (callers keep the file)."""
    try:
        with open(path, "rb") as f:
            raw = f.read()
        if raw[: len(MAGIC)] != MAGIC:
            return None
        m, k = struct.unpack_from("<QI", raw, len(MAGIC))
        bits = raw[len(MAGIC) + 12 :]
        if len(bits) != (m + 7) // 8 or not (0 < k <= 64):
            return None
        return m, k, bits
    except (OSError, struct.error):
        return None


def might_contain(bf: tuple[int, int, bytes], key) -> bool:
    m, k, bits = bf
    h1, h2 = _h12(_norm(key))
    for i in range(k):
        h = (h1 + i * h2) % m
        if not bits[h >> 3] & (1 << (h & 7)):
            return False
    return True


def write_sidecar(data_file_path: str, blob: bytes) -> str:
    """Atomically place ``<data_file>.bloom`` beside the data file."""
    out = data_file_path + ".bloom"
    tmp = out + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, out)
    return out
