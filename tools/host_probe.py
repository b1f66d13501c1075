"""Host-health probe for this microVM: measures first-touch page-fault
bandwidth (the resource that free-page reporting throttles) and warm-reuse
bandwidth.  Benches are only meaningful when fault_gbps is in a healthy
window (empirically >1 GB/s on this host; degraded phases sit at
0.03-0.3 GB/s and inflate every stage 5-30x).  Prints one JSON line.

Usage: python tools/host_probe.py [--size-mb 512]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def probe(size_mb: int = 512) -> dict:
    n = size_mb * (1 << 20)
    # first-touch: fresh allocation, write every page
    t0 = time.perf_counter()
    a = np.zeros(n, dtype=np.uint8)  # zeros faults lazily on write below
    a[:: 4096] = 1
    fault_s = time.perf_counter() - t0
    # warm reuse: rewrite the same (now resident) pages
    t0 = time.perf_counter()
    a[:: 4096] = 2
    reuse_s = time.perf_counter() - t0
    del a
    la1, la5, la15 = open("/proc/loadavg").read().split()[:3]
    return {
        "fault_gbps": round(size_mb / 1024 / fault_s, 3),
        "reuse_gbps": round(size_mb / 1024 / reuse_s, 3),
        "loadavg": [float(la1), float(la5), float(la15)],
        "healthy": size_mb / 1024 / fault_s > 1.0,
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--size-mb", type=int, default=512)
    args = ap.parse_args()
    print(json.dumps(probe(args.size_mb)))
