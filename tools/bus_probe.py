"""Measure the single-box memory-bandwidth ceiling that caps high-core
"cluster size" scaling in this sandbox — evidence for BENCH/BASELINE.md's
interpretation section, with NO Spark involved.

Each worker PROCESS repeatedly copies a buffer much larger than L3 cache
(numpy memcpy ≈ the byte-moving core of shuffle write/read, sort spill and
parquet encode). Per-worker bandwidth at w workers is uncontended until the
aggregate hits the socket's memory bandwidth; past that, aggregate GB/s
flattens and per-worker GB/s falls ∝ 1/w — exactly the shape the CDC
replay's 8→32-core efficiency shows. A real 4N-node cluster multiplies
memory channels with the cores, so this ceiling does not exist there.

Usage: python tools/bus_probe.py [workers_csv] [mb_per_buffer] [seconds]
Appends a JSON line per worker count; prints a summary table.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def _worker(mb: int, seconds: float, out: "mp.Queue", barrier) -> None:
    import numpy as np

    # cheap deterministic init (no RNG), touch every page before timing
    src = np.arange(mb * 1024 * 1024, dtype=np.uint8)
    dst = np.empty_like(src)
    np.copyto(dst, src)  # warm-up / page-fault outside the window
    barrier.wait()  # ALL workers start the timed window together —
    # without this, early finishers measure an uncontended bus
    t0 = time.time()
    t_end = t0 + seconds
    n = 0
    while time.time() < t_end:
        np.copyto(dst, src)
        n += 1
    elapsed = time.time() - t0
    # each copy reads src + writes dst → 2×mb of bus traffic
    out.put(2 * n * mb / elapsed)  # MB/s for this worker


def measure(workers: int, mb: int, seconds: float) -> dict:
    q: "mp.Queue" = mp.Queue()
    barrier = mp.Barrier(workers)
    procs = [
        mp.Process(target=_worker, args=(mb, seconds, q, barrier))
        for _ in range(workers)
    ]
    for p in procs:
        p.start()
    rates = [q.get() for _ in procs]
    for p in procs:
        p.join()
    agg = sum(rates) / 1024  # GB/s
    return {
        "workers": workers,
        "aggregate_gb_s": round(agg, 2),
        "per_worker_gb_s": round(agg / workers, 2),
    }


def main() -> int:
    levels = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "1,2,4,8,16,32").split(",")]
    mb = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    seconds = float(sys.argv[3]) if len(sys.argv) > 3 else 6.0
    rows = []
    for w in levels:
        r = measure(w, mb, seconds)
        rows.append(r)
        print(json.dumps(r), flush=True)
    base = rows[0]["aggregate_gb_s"]
    print("\n| workers | aggregate GB/s | per-worker GB/s | scaling vs 1 worker |")
    print("|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['workers']} | {r['aggregate_gb_s']} | {r['per_worker_gb_s']} "
            f"| {r['aggregate_gb_s'] / base:.2f}x |"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
