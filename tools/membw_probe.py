"""Host memory-bandwidth saturation probe — evidence for the BASELINE.md
8→32 caveat, independent of Ray and of this engine.

Runs N worker PROCESSES (fork; no Ray) that each stream a private ~512 MB
float64 array through a sum-reduction for a fixed wall window, and reports
aggregate GB/s at each process count.  If aggregate bandwidth stops growing
well before 32 workers while per-worker bandwidth collapses, the host's
memory bus — not task scheduling, not the engine — is the 8→32 ceiling:
the same per-worker work gets slower only because workers contend for the
same DRAM channels.  A real 4N-node cluster adds DRAM channels with every
node, which is why the 2→8 pair (below saturation) is the honest N-vs-4N
stand-in on this single VM.

Usage: python tools/membw_probe.py [counts ...]   (default: 2 8 32)
Prints one JSON line: {"levels": {"2": {...}, ...}}
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

import numpy as np

ARR_MB = 512
FAULT_MB = 256
WINDOW_S = 6.0


def _worker_read(q):
    a = np.ones(ARR_MB * 1024 * 1024 // 8, dtype=np.float64)
    a.sum()  # first-touch fault + warm once, untimed
    t0 = time.perf_counter()
    passes = 0
    while time.perf_counter() - t0 < WINDOW_S:
        a.sum()
        passes += 1
    secs = time.perf_counter() - t0
    q.put(passes * ARR_MB / 1024.0 / secs)  # GB/s read by this worker


def _worker_fault(q):
    # first-touch (allocation) bandwidth: every pass maps FRESH pages and
    # writes one byte per 4K page, then frees — the guest kernel must
    # zero-fill and the hypervisor must back every page.  This is the
    # allocation burst shape of a Ray worker cold-starting a build task
    # (arena growth + plasma object creation), NOT a streaming read.
    import mmap

    t0 = time.perf_counter()
    passes = 0
    while time.perf_counter() - t0 < WINDOW_S:
        m = mmap.mmap(-1, FAULT_MB * 1024 * 1024)
        b = np.frombuffer(m, dtype=np.uint8)
        b[::4096] = 1  # one write per page → one minor fault per page
        del b  # drop the exported pointer before unmapping
        m.close()
        passes += 1
    secs = time.perf_counter() - t0
    q.put(passes * FAULT_MB / 1024.0 / secs)  # GB/s faulted in by this worker


def measure(n: int, mode: str = "read") -> dict:
    ctx = mp.get_context("fork")
    q = ctx.Queue()
    target = _worker_read if mode == "read" else _worker_fault
    procs = [ctx.Process(target=target, args=(q,)) for _ in range(n)]
    for p in procs:
        p.start()
    rates = [q.get() for _ in procs]
    for p in procs:
        p.join()
    return {
        "workers": n,
        "aggregate_gbps": round(sum(rates), 2),
        "per_worker_gbps": round(sum(rates) / n, 2),
        "min_worker_gbps": round(min(rates), 2),
    }


if __name__ == "__main__":
    args = sys.argv[1:]
    mode = "read"
    if args and args[0] in ("read", "fault"):
        mode, args = args[0], args[1:]
    counts = [int(c) for c in args] or [2, 8, 32]
    out = {"mode": mode, "levels": {}}
    for n in counts:
        out["levels"][str(n)] = measure(n, mode)
    print(json.dumps(out))
