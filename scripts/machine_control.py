"""Machine scaling control (BENCH.md §3.1 / round-3 protocol).

Measures what THIS VM delivers for N -> 4N independent processes with
zero shared state: each worker is a single-threaded integer-LCG stream
over a 16 MB int64 array (bandwidth-ish workload, no Python allocation
in the loop, no Spark). The aggregate throughput ratio across process
counts is the hardware ceiling any engine measurement must be read
against — hypervisor co-tenancy makes it drift between windows.

Usage: python scripts/machine_control.py [levels, default "1,2,4,8,16"]
Prints one JSON line with per-level aggregate Mops/s and the 2->8 and
4->16 efficiencies.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ARR_WORDS = 2 * 1024 * 1024  # 16 MB of int64
PASSES = 40


def worker() -> None:
    import numpy as np
    a = np.arange(ARR_WORDS, dtype=np.int64)
    t0 = time.time()
    x = np.int64(88172645463325252)
    for _ in range(PASSES):
        # LCG-update the whole array: one read + one write per word
        a *= np.int64(6364136223846793005)
        a += x
        x ^= x << np.int64(13)
    t1 = time.time()
    print(json.dumps({"ops": ARR_WORDS * PASSES, "sec": t1 - t0,
                      "start": t0, "end": t1}))


def run_level(n: int) -> tuple:
    # Two aggregates, both reported (code-review r4/r5):
    #   rate_sum  = SUM of per-worker rates over each worker's OWN
    #               timed window — unbiased per-stream speed, but it
    #               overstates AGGREGATE throughput when worker windows
    #               don't fully overlap (fork stagger, co-tenant
    #               scheduling at high N excludes each worker's idle
    #               time from its own denominator);
    #   wall      = total_ops / (max(end) - min(start)) over worker
    #               self-stamped absolute timestamps — the true
    #               aggregate delivered in the union window (still
    #               excludes fork cost, since clocks start inside the
    #               worker after numpy warmup).
    # `wall` is the primary number for the scaling ceiling; rate_sum
    # is logged so overlap loss is visible (rate_sum >> wall at a
    # level means the level's windows were staggered, not slow).
    procs = [subprocess.Popen([sys.executable, os.path.abspath(__file__),
                               "--worker"], stdout=subprocess.PIPE, text=True)
             for _ in range(n)]
    rate_sum, total_ops = 0.0, 0
    starts, ends = [], []
    for p in procs:
        out, _ = p.communicate()
        rec = json.loads(out.strip().splitlines()[-1])
        rate_sum += rec["ops"] / rec["sec"]
        total_ops += rec["ops"]
        starts.append(rec["start"])
        ends.append(rec["end"])
    wall = total_ops / (max(ends) - min(starts))
    return wall / 1e6, rate_sum / 1e6


def main() -> None:
    levels = [int(x) for x in
              (sys.argv[1] if len(sys.argv) > 1 else "1,2,4,8,16").split(",")]
    out, out_sum = {}, {}
    for n in levels:
        run_level(min(n, 2))  # tiny warmup to amortize numpy import
        best = max((run_level(n) for _ in range(2)),
                   key=lambda t: t[0])
        out[str(n)] = round(best[0], 1)
        out_sum[str(n)] = round(best[1], 1)
    rep = {"metric": "machine control aggregate Mops/s (LCG 16MB streams)",
           "levels": out, "levels_rate_sum": out_sum}
    for lo, hi in ((2, 8), (4, 16)):
        if str(lo) in out and str(hi) in out:
            rep[f"{lo}->{hi}_speedup"] = round(out[str(hi)] / out[str(lo)], 2)
            rep[f"{lo}->{hi}_efficiency"] = round(
                out[str(hi)] / out[str(lo)] / (hi / lo), 3)
    print(json.dumps(rep))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker()
    else:
        main()
