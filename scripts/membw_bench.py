"""Memory-bandwidth microbenchmark — the single-box scaling normalizer.

The north rule's scaling criterion assumes N vs 4N EXECUTORS (independent
machines with independent memory buses). This sandbox substitutes JVM
threads on ONE box, so aggregate memory bandwidth is shared: when K
processes each run the same STREAM-triad-like kernel, per-process
throughput decays once the bus saturates. The decay factor measured here
bounds the parallel efficiency ANY bandwidth-bound workload can show on
this box — it is the environment's ceiling, not the engine's.

Prints one JSON line:
  {"threads": {1: MB/s-per-proc, 8: ..., 32: ...},
   "bus_scaling_8_to_32": aggregate32 / (4 * aggregate8), ...}

Usage: python scripts/membw_bench.py [size_mb] [reps]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def _triad(size_mb: int, reps: int, out_q) -> None:
    import numpy as np

    n = size_mb * 1024 * 1024 // 8
    a = np.ones(n)
    b = np.full(n, 2.0)
    c = np.zeros(n)
    # warm
    np.add(b, a, out=c)
    t0 = time.perf_counter()
    for _ in range(reps):
        # c = a + 2.0 * b : 3 streams (2 reads + 1 write) like STREAM triad
        np.multiply(b, 2.0, out=c)
        np.add(c, a, out=c)
    dt = time.perf_counter() - t0
    bytes_moved = reps * 5 * n * 8  # 2 kernels × (2 reads + 1 write) − reuse ≈ 5n
    out_q.put(bytes_moved / dt / 1e6)


def run_level(k: int, size_mb: int, reps: int) -> dict:
    q = mp.Queue()
    procs = [mp.Process(target=_triad, args=(size_mb, reps, q)) for _ in range(k)]
    for p in procs:
        p.start()
    rates = [q.get() for _ in procs]
    for p in procs:
        p.join()
    per_proc = sum(rates) / len(rates)
    return {"procs": k, "mb_per_s_per_proc": round(per_proc, 1),
            "aggregate_mb_per_s": round(per_proc * k, 1)}


def main() -> None:
    size_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    levels = [1, 8, 32]
    results = {k: run_level(k, size_mb, reps) for k in levels}
    agg = {k: v["aggregate_mb_per_s"] for k, v in results.items()}
    out = {
        "levels": results,
        "bus_scaling_8_to_32": round(agg[32] / (4 * agg[8]), 3),
        "bus_scaling_1_to_32": round(agg[32] / (32 * agg[1]), 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
