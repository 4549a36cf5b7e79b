#!/usr/bin/env python3
"""Scaling-ceiling control experiment (round-4 verdict item 3).

The page-processing stage scales 8 -> 32 threads at only 0.62-0.71
efficiency on this box, and BASELINE.md attributed that to single-
socket memory-bandwidth saturation. This harness tests the
attribution with compute-heavy / memory-LIGHT kernels at the same two
thread levels, interleaved best-of-N (the round-4 measurement lesson):

* jvm_hash  — 256 chained xxhash64 rounds per row over spark.range
              (scalar integer, working set = registers, zero input
              bytes): does the JVM side scale when nothing streams?
* mp_numpy  — raw multiprocessing (NO Spark): allocation-free
              in-place numpy sweeps over an 8192-double buffer
              (64 KiB, L2-resident): does the MACHINE's per-core
              throughput itself hold up at full width? Also reports
              per-proc rates and steal% from /proc/stat.

Measured round 5 (32 physical cores, 1 thread/core, 1 socket,
1 NUMA node, steal 0%):
  jvm_hash  8->32 efficiency 0.89-0.91
  mp_numpy  8->32 efficiency 0.60-0.73; per-proc sweep rate drops
            197k/s (8 busy cores) -> 143k/s (32 busy) = 0.73x
Conclusion in BASELINE.md: the ceiling is dominated by per-core
throughput droop under full-width vector/FP load (platform power /
all-core-turbo behavior invisible to the guest: no steal, no cpufreq
interface), with DRAM bandwidth a contributor for the streaming-heavy
real pipeline — not the sole cause as previously asserted.

Usage: python scripts/dram_control.py -> one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOW = int(os.environ.get("EFIN_CTRL_LOW", "8"))
HIGH = int(os.environ.get("EFIN_CTRL_HIGH", "32"))
REPS = int(os.environ.get("EFIN_CTRL_REPS", "3"))
# fixed task count at both levels so task granularity is identical
PARTS = HIGH * 4


def _session(threads: int, app: str):
    from edgar_finance_ontology_spark.session import build_session

    return build_session(app, master=f"local[{threads}]",
                         shuffle_partitions=PARTS)


def jvm_hash_kernel(spark, rows: int = 160_000_000, salt: int = 0) -> int:
    """256 chained xxhash64 rounds per row; input is generated
    (spark.range), output is one aggregated long — no memory streaming
    beyond codegen-local registers. `salt` keeps each timed plan
    distinct (identical re-collected plans return in ~70 ms from plan-
    level reuse — a repeat-timing trap found while building this)."""
    from pyspark.sql import functions as F

    c = F.col("id") + F.lit(salt)
    for _ in range(256):
        c = F.xxhash64(c)
    return spark.range(0, rows, 1, PARTS).select(
        F.sum(c).alias("s")
    ).collect()[0]["s"]


def _mp_spin(n_sweeps: int) -> float:
    """Allocation-free in-place sweeps over an L2-resident buffer —
    zero DRAM streaming, pure per-core FP throughput."""
    import numpy as np

    buf = np.arange(8192, dtype=np.float64)
    tmp = np.empty_like(buf)
    for _ in range(n_sweeps):
        np.multiply(buf, 1.0000001, out=tmp)
        np.add(tmp, 0.5, out=buf)
    return float(buf[0])


def _proc_stat():
    with open("/proc/stat") as f:
        return list(map(int, f.readline().split()[1:]))


def mp_numpy_control(total_sweeps: int = 1_600_000) -> dict:
    """Strong-scaling of the no-Spark numpy kernel + per-core rates."""
    out: dict = {}
    walls: dict[int, float] = {}
    for _rep in range(REPS):
        for procs in (LOW, HIGH):
            per = total_sweeps // procs
            with mp.Pool(procs) as p:
                p.map(_mp_spin, [1000] * procs)  # warm
                t0 = time.monotonic()
                p.map(_mp_spin, [per] * procs)
                w = time.monotonic() - t0
            if w < walls.get(procs, float("inf")):
                walls[procs] = w
    speed = walls[LOW] / walls[HIGH]
    out.update({
        "low_wall_sec": round(walls[LOW], 3),
        "high_wall_sec": round(walls[HIGH], 3),
        "speedup": round(speed, 3),
        "efficiency": round(speed / (HIGH / LOW), 3),
    })
    # per-proc throughput + steal while N cores are busy
    for procs in (LOW, HIGH):
        s0 = _proc_stat()
        per = total_sweeps // procs
        with mp.Pool(procs) as p:
            t0 = time.monotonic()
            p.map(_mp_spin, [per] * procs)
            w = time.monotonic() - t0
        s1 = _proc_stat()
        d = [b - a for a, b in zip(s0, s1)]
        out[f"per_proc_sweeps_per_sec_{procs}"] = round(per / w)
        out[f"steal_pct_{procs}"] = round(100 * d[7] / max(1, sum(d)), 2)
    return out


def main():
    walls: dict[int, float] = {}
    for rep in range(REPS):
        # interleave thread levels within each rep (round-4 lesson:
        # per-level-sequential runs let machine-state drift land
        # entirely on one side of the ratio)
        for threads in (LOW, HIGH):
            spark = _session(threads, f"dram-ctrl-{threads}")
            try:
                jvm_hash_kernel(spark, rows=100_000, salt=rep)  # warm
                t0 = time.monotonic()
                jvm_hash_kernel(spark, salt=rep * 100 + threads)
                w = time.monotonic() - t0
                if w < walls.get(threads, float("inf")):
                    walls[threads] = w
            finally:
                spark.stop()
    speed = walls[LOW] / walls[HIGH]
    out = {
        "low_threads": LOW,
        "high_threads": HIGH,
        "kernels": {
            "jvm_hash": {
                "low_wall_sec": round(walls[LOW], 3),
                "high_wall_sec": round(walls[HIGH], 3),
                "speedup": round(speed, 3),
                "efficiency": round(speed / (HIGH / LOW), 3),
            },
            "mp_numpy": mp_numpy_control(),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
