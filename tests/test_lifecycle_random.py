"""Randomized lifecycle sequences — build → {append, delete-by-filter,
consolidate}* with a brute-force logical table as the oracle.  Each step
re-derives the expected live (conv_id, turn_idx) set and asserts term and
phrase queries over a fresh Searcher match exactly (ids AND df-sensitive
BM25 ordering is covered elsewhere; here the target is lifecycle plumbing:
tombstone scope, purge-on-merge, incremental segments, resume keys)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from iresearch_ray import Searcher, build_index
from iresearch_ray.functions.analysis import tokenize_text
from iresearch_ray.pipelines.build import append_index
from iresearch_ray.pipelines.consolidate import consolidate
from iresearch_ray.pipelines.delete import delete_by_filter, update_rows
from iresearch_ray.query import filters as F

WORDS = ["error", "agent", "tool", "retry", "plan", "ok", "fail"]


def _batch(rng, batch_id: int, n: int) -> pa.Table:
    rows = []
    for i in range(n):
        rows.append(
            {
                "conv_id": f"b{batch_id:02d}c{i:03d}",
                "turn_idx": int(rng.integers(0, 3)),
                "text": " ".join(rng.choice(WORDS, int(rng.integers(1, 8)))),
                "role": "user",
                "tool": None,
            }
        )
    t = pa.Table.from_pylist(rows)
    # key-dedup within the batch the same way the engine's primary sort does
    df = t.to_pandas().drop_duplicates(["conv_id", "turn_idx"])
    return pa.Table.from_pandas(df, preserve_index=False)


def _expected_hits(live: dict, term: str) -> set:
    return {k for k, txt in live.items() if term in tokenize_text(txt)}


def _engine_hits(idx: str, term: str) -> set:
    s = Searcher(idx)
    out = s.search_local(F.Term("text", term), k=10_000_000)
    return set(zip(out["conv_id"], (int(x) for x in out["turn_idx"])))


@pytest.mark.parametrize("seed", [0, 1])
def test_random_lifecycle_sequences(ray_session, tmp_path, seed):
    rng = np.random.default_rng(seed)
    idx = str(tmp_path / "idx")
    live: dict[tuple, str] = {}

    def write_and(batch_id, fn):
        t = _batch(rng, batch_id, int(rng.integers(8, 30)))
        p = str(tmp_path / f"batch{batch_id}.parquet")
        pq.write_table(t, p)
        fn(p)
        for row in t.to_pylist():
            live[(row["conv_id"], int(row["turn_idx"]))] = row["text"]

    write_and(0, lambda p: build_index(p, idx, num_partitions=2))
    batch_id = 1
    for step in range(8):
        op = rng.choice(["append", "delete", "consolidate", "update", "check"])
        if op == "append":
            write_and(batch_id, lambda p: append_index(p, idx, num_partitions=2))
            batch_id += 1
        elif op == "update" and live:
            # update = delete + re-insert under the same key
            keys = list(live)
            picked = [keys[i] for i in rng.choice(len(keys), size=min(5, len(keys)), replace=False)]
            rows = pa.Table.from_pylist(
                [
                    {"conv_id": c, "turn_idx": t,
                     "text": " ".join(rng.choice(WORDS, int(rng.integers(1, 8)))),
                     "role": "user", "tool": None}
                    for c, t in picked
                ]
            )
            update_rows(idx, rows, num_partitions=2)
            for row in rows.to_pylist():
                live[(row["conv_id"], int(row["turn_idx"]))] = row["text"]
        elif op == "delete":
            term = str(rng.choice(WORDS))
            delete_by_filter(idx, F.Term("text", term))
            for key in _expected_hits(live, term):
                del live[key]
        elif op == "consolidate":
            policy = str(rng.choice(["tier", "count"]))
            kwargs = {"threshold": 2} if policy == "count" else {}
            consolidate(idx, policy=policy, policy_kwargs=kwargs,
                        gc=bool(rng.integers(0, 2)), repeat=True)
        for term in ("error", "retry"):
            assert _engine_hits(idx, term) == _expected_hits(live, term), (
                seed, step, op, term
            )
    # final full-equality pass: every live doc reachable, no resurrections
    s = Searcher(idx)
    got = s.search_local(F.AllDocs(), k=10_000_000)
    got_keys = set(zip(got["conv_id"], (int(x) for x in got["turn_idx"])))
    assert got_keys == set(live)
