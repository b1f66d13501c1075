"""index-search analog (SURVEY §2.2): run a query task file against an index.

Task file = one query per line, Lucene-benchmark-ish prefixed syntax:

    term: the
    or: error plan merge
    and: agent error
    minmatch2: run test data
    phrase: the a
    prefix: w00
    wildcard: w%1
    fuzzy1: agent
    keyword:role tool

Runs standalone or via ``ray job submit``:

    python bench/query_bench.py --index-dir IDX [--tasks FILE] [-k 10] \\
        [--repeat 3] [--mode local|ray]

Prints one JSON line: per-query latencies (warm best-of), p50/p95, rows.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_TASKS = [
    "term: the",
    "term: agent",
    "or: error plan merge",
    "and: agent error",
    "minmatch2: run test data",
    "phrase: the a",
    "prefix: w00",
    "wildcard: w%1",
    "fuzzy1: agent",
    "keyword:role tool",
]


def parse_task(line: str):
    from iresearch_ray.query import filters as F

    head, _, rest = line.partition(":")
    head = head.strip()
    args = rest.strip().split()
    if head == "term":
        return F.Term("text", args[0])
    if head == "or":
        return F.Or(tuple(F.Term("text", t) for t in args))
    if head == "and":
        return F.And(tuple(F.Term("text", t) for t in args))
    if head.startswith("minmatch"):
        return F.Or(tuple(F.Term("text", t) for t in args), min_match=int(head[8:]))
    if head == "phrase":
        return F.Phrase("text", tuple(args))
    if head == "prefix":
        return F.Prefix("text", args[0])
    if head == "wildcard":
        return F.Wildcard("text", args[0])
    if head.startswith("fuzzy"):
        return F.Fuzzy("text", args[0], int(head[5:] or 1))
    if head == "keyword":  # "keyword: <field> <term>" — exact keyword-field match
        return F.Term(args[0], args[1])
    raise ValueError(f"unknown task line: {line!r}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--tasks", default=None, help="task file (default: built-in set)")
    ap.add_argument("-k", type=int, default=10)
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--mode", choices=("local", "ray"), default="local")
    ap.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import numpy as np
    import ray

    owns = not ray.is_initialized()
    if owns:
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    try:
        from iresearch_ray import Searcher

        lines = (
            [l.strip() for l in open(args.tasks) if l.strip() and not l.startswith("#")]
            if args.tasks
            else DEFAULT_TASKS
        )
        queries = {f"q{i:03d} {l}": parse_task(l) for i, l in enumerate(lines)}
        s = Searcher(args.index_dir)
        lat: dict[str, float] = {}
        rows: dict[str, int] = {}
        if args.mode == "ray":
            t0 = time.perf_counter()
            out = s.search_ray(queries, k=args.k, concurrency=8)
            total = time.perf_counter() - t0
            payload = {"mode": "ray", "batch_secs": round(total, 3), "rows": len(out)}
        else:
            for name, f in queries.items():
                best = None
                for _ in range(args.repeat):
                    t0 = time.perf_counter()
                    r = s.search_local(f, k=args.k)
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
                lat[name] = round(best * 1e3, 2)
                rows[name] = len(r)
            vals = np.array(list(lat.values()))
            payload = {
                "mode": "local",
                "latency_ms": lat,
                "p50_ms": float(np.percentile(vals, 50)),
                "p95_ms": float(np.percentile(vals, 95)),
                "rows": rows,
            }
        print(json.dumps(payload))
    finally:
        if owns:
            ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
