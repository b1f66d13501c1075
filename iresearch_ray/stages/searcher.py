"""SegmentSearcher — the stateful query actor (SURVEY.md §3.2).

A callable class for ``map_batches(SegmentSearcher, concurrency=N)``: segment
tables are opened lazily and cached per actor (the load-once-per-worker
mmap-shard analog — ref: core/store/fs_directory.cpp refcounted handles), so
repeated queries against the same shard pay the Parquet read once.  Work
units are (segment_dir, query_id, plan, k) rows; output is the per-segment
top-k (query_id, conv_id, turn_idx, score).
"""

from __future__ import annotations

import json
from collections import OrderedDict

import pyarrow as pa

from iresearch_ray.query.exec import segment_topk
from iresearch_ray.stages.segment import SegmentReader

RESULT_SCHEMA = pa.schema(
    [
        ("query_id", pa.string()),
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("score", pa.float64()),
    ]
)


def search_batch_task(
    batch: pa.Table, *, tombstones_json: str = "", index_dir: str = "", crypto=None
) -> pa.Table:
    """Stateless task-pool variant of :class:`SegmentSearcher` for one-shot
    cold batches: readers are built fresh inside the task (identical cold
    I/O), but the task runs in a prestarted Ray worker process — no actor
    spawn/import before the first posting block is read.  Work items are
    grouped one-segment × all-queries per batch, so an actor's cross-batch
    reader cache would never hit on this path anyway."""
    return SegmentSearcher(
        tombstones_json=tombstones_json, index_dir=index_dir, crypto=crypto
    )(batch)


class SegmentSearcher:
    """Actor-pool callable; ``max_cached_segments`` bounds per-actor memory
    (LRU eviction) so a pool can serve an index wider than worker heap."""

    def __init__(self, max_cached_segments: int = 64,
                 tombstones_json: str = "", index_dir: str = "", crypto=None):
        self._readers: OrderedDict[str, SegmentReader] = OrderedDict()
        self._max = max_cached_segments
        self._plan_cache: dict[str, dict] = {}
        self._tomb_cache: dict[str, set] = {}
        self._mask_cache: dict[tuple, object] = {}
        # shipped once per actor (constructor) instead of per work item
        self._tombs_json = tombstones_json or ""
        self._index_dir = index_dir or ""
        self._crypto = crypto

    def _deleted(self, seg_dir: str, index_dir: str, tombstones_json: str):
        """Per-(segment, tombstone-list) deleted mask, cached per actor.
        Entries are pre-normalized scoped dicts ({"file", "segments"}) so the
        mask honors per-segment delete scope (update = delete + re-insert)."""
        if not tombstones_json:
            return None
        import os

        seg_name = os.path.basename(seg_dir.rstrip("/"))
        key = (seg_dir, tombstones_json)
        if key in self._mask_cache:
            return self._mask_cache[key]
        tkey = (tombstones_json, seg_name)
        keys = self._tomb_cache.get(tkey)
        if keys is None:
            from iresearch_ray.pipelines.delete import load_tombstone_keys

            keys = load_tombstone_keys(
                index_dir,
                {"tombstones": json.loads(tombstones_json), "segments": []},
                for_segment=seg_name,
            )
            self._tomb_cache[tkey] = keys
        from iresearch_ray.pipelines.delete import deleted_doc_mask

        mask = deleted_doc_mask(self._reader(seg_dir), keys)
        self._mask_cache[key] = mask
        return mask

    def _reader(self, seg_dir: str) -> SegmentReader:
        r = self._readers.get(seg_dir)
        if r is None:
            # per-actor posting-cache budget split across the cached shard
            # readers (ephemeral Dataset-job actors hold up to _max readers;
            # the full per-reader default would multiply past worker heaps)
            r = SegmentReader(
                seg_dir,
                cache_bytes=max(8 << 20, SegmentReader.POSTING_CACHE_BYTES // self._max),
                crypto=self._crypto,
            )
            self._readers[seg_dir] = r
            if len(self._readers) > self._max:
                self._readers.popitem(last=False)
        else:
            self._readers.move_to_end(seg_dir)
        return r

    def _plan(self, plan_json: str) -> dict:
        p = self._plan_cache.get(plan_json)
        if p is None:
            p = json.loads(plan_json)
            if len(self._plan_cache) > 256:
                self._plan_cache.clear()
            self._plan_cache[plan_json] = p
        return p

    def __call__(self, batch: pa.Table) -> pa.Table:
        from iresearch_ray.state.meter import cpu_mark, report_since

        mk = cpu_mark()
        out: list[pa.Table] = []
        seg_dirs = batch["seg_dir"].to_pylist()
        qids = batch["query_id"].to_pylist()
        plans = batch["plan"].to_pylist()
        ks = batch["k"].to_pylist()
        wands = batch["wand"].to_pylist()
        idx_dirs = (
            batch["index_dir"].to_pylist()
            if "index_dir" in batch.column_names
            else [self._index_dir] * len(seg_dirs)
        )
        tombs = (
            batch["tombstones"].to_pylist()
            if "tombstones" in batch.column_names
            else [self._tombs_json] * len(seg_dirs)
        )
        for seg_dir, qid, plan_json, k, wand, idx_dir, tj in zip(
            seg_dirs, qids, plans, ks, wands, idx_dirs, tombs
        ):
            t = segment_topk(
                self._reader(seg_dir),
                self._plan(plan_json),
                int(k),
                bool(wand),
                deleted=self._deleted(seg_dir, idx_dir, tj),
            )
            t = pa.table(
                {
                    "query_id": pa.array([qid] * t.num_rows, pa.string()),
                    "conv_id": t["conv_id"].cast(pa.string()),
                    "turn_idx": t["turn_idx"].cast(pa.int32()),
                    "score": t["score"],
                }
            )
            out.append(t)
        report_since("query", mk)
        if not out:
            return RESULT_SCHEMA.empty_table()
        return pa.concat_tables(out).cast(RESULT_SCHEMA)
