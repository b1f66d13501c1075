"""Shuffle-based wide merge — the salted partial-posting path
(B north_star: "handles hot-term skew via salted partial-posting shuffle
and term-frequency-aware partitioning").

``merge_segments`` (stages/merge.py) runs one k-way merge per task — right
for tier-policy sets of ≤10 segments.  When a consolidation spans MANY
segments (wide rebuilds, epoch compactions of 100s of shards), a single
task would pull every dictionary+blob; this module instead SHUFFLES the
term rows:

  stage 0 (narrow): read every candidate's ``terms.parquet`` with
      ``include_paths`` → attach the segment's doc-id offset + rank
      (global doc order = sorted segment-name order, SURVEY §2.3).
  stage 1 (groupby field, term, salt): Zipf-hot terms are split by
      ``salt = rank // ceil(n/num_salts)``; RANGE salting keeps each salt
      group a contiguous run of segments, so partial posting blobs stay
      globally ordered.  Each group blob-concats its members (doc ids
      rebased to global by the offset map — deltas inside blocks survive
      because every doc in a segment shifts equally).

      Hotness is decided ONCE per (field, term) from a parallel pre-pass
      (column-pruned + predicate-pushdown reads of every candidate's
      ``df`` column): a term is hot iff its df reaches ``hot_df_threshold``
      in ANY candidate segment.  A per-row (per-segment-df) decision would
      split a mixed-hotness term into a salted group PLUS a cold salt=-1
      group whose segment ranks interleave with the salted ranges — stage 2
      orders partials by first rank only, so the merged postings would come
      out doc-id-unsorted (breaking Not, WAND skips and phrase membership).
      The global pre-pass keeps every stage-1 group a contiguous rank range.
  stage 2 (groupby field, term): ≤ num_salts partials per term merge in
      rank order into the final row.  Cold terms take this path directly
      (salt = -1 → singleton stage-1 groups).

Doc tables concat in rank order (ids = offset + local), so the merged
segment is identical to the task-merge output; the equivalence is asserted
in tests.  Deletes route to the rebuild path (merge_segments) — masked
drops invalidate blob concat.
"""

from __future__ import annotations

import json
import math
import os
import time
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from iresearch_ray.stages.merge import _concat_term_postings
from iresearch_ray.stages.segment import (
    IndexConfig,
    SegmentReader,
    TERMS_SCHEMA,
    write_segment,
)

_BLOB_COLS = [f.name for f in TERMS_SCHEMA]


def merge_segments_shuffle(
    index_dir: str,
    seg_names: list[str],
    generation: int,
    hot_df_threshold: int = 10_000,
    num_salts: int = 8,
) -> dict:
    """Merge the named segments into one via a term-keyed Ray shuffle with
    range-salted hot terms.  Same output contract as merge_segments."""
    import ray
    import ray.data as rd

    t0 = time.perf_counter()
    seg_names = sorted(seg_names)
    seg_root = os.path.join(index_dir, "segments")
    readers = [SegmentReader(os.path.join(seg_root, n)) for n in seg_names]
    cfg = IndexConfig.from_json(readers[0].meta["config"])

    from iresearch_ray.state.manifest import load_manifest

    man = load_manifest(index_dir) or {}
    if man.get("tombstones"):
        from iresearch_ray.pipelines.delete import load_tombstone_keys

        for name, r in zip(seg_names, readers):
            keys = load_tombstone_keys(index_dir, man, for_segment=name)
            if keys:
                # masked drops need the rebuild path
                from iresearch_ray.stages.merge import merge_segments

                return merge_segments(index_dir, seg_names, generation)

    counts = [r.meta["docs_count"] for r in readers]
    offsets = np.concatenate(([0], np.cumsum(counts)))
    total = int(offsets[-1])
    rank_of = {
        os.path.join(seg_root, n, "terms.parquet"): i for i, n in enumerate(seg_names)
    }
    off_ref = ray.put({p: int(offsets[i]) for p, i in rank_of.items()})
    rank_ref = ray.put(rank_of)
    n_segs = len(seg_names)
    run = max(1, math.ceil(n_segs / num_salts))

    paths = list(rank_of)

    # global hotness pre-pass: (field, term) keys whose df reaches the
    # threshold in ANY candidate — tiny by Zipf (predicate-pushdown read of
    # just the df column), one parallel task per candidate segment
    @ray.remote(num_cpus=1)
    def _hot_keys(path: str, thr: int) -> set[tuple[str, str]]:
        import pyarrow.dataset as pads

        t = pads.dataset(path).to_table(
            columns=["field", "term"], filter=pads.field("df") >= thr
        )
        return set(zip(t["field"].to_pylist(), t["term"].to_pylist()))

    hot: set[tuple[str, str]] = set()
    for part in ray.get([_hot_keys.remote(p, hot_df_threshold) for p in paths]):
        hot |= part
    hot_ref = ray.put(hot)

    ds = rd.read_parquet(paths, include_paths=True)

    def tag(batch: pa.Table) -> pa.Table:
        offs = ray.get(off_ref)
        ranks = ray.get(rank_ref)
        hot_set = ray.get(hot_ref)
        p = batch["path"].to_pylist()
        rank = np.array([ranks[x] for x in p], dtype=np.int64)
        off = np.array([offs[x] for x in p], dtype=np.int64)
        # term-frequency-aware partitioning: only globally-hot terms pay the
        # salt split; cold terms go straight to their final (term) group.
        # The decision is per (field, term) — NEVER per row — so every
        # stage-1 group is a contiguous rank range (see module docstring).
        if hot_set:
            is_hot = np.fromiter(
                (
                    (f, t) in hot_set
                    for f, t in zip(batch["field"].to_pylist(), batch["term"].to_pylist())
                ),
                dtype=bool,
                count=batch.num_rows,
            )
        else:
            is_hot = np.zeros(batch.num_rows, dtype=bool)
        salt = np.where(is_hot, rank // run, -1)
        return (
            batch.drop_columns(["path"])
            .append_column("__rank", pa.array(rank))
            .append_column("__off", pa.array(off))
            .append_column("__salt", pa.array(salt))
        )

    def combine(group: pa.Table, final: bool) -> pa.Table:
        rows = group.sort_by([("__rank", "ascending")]).to_pylist()
        parts = [(r, int(r["__off"])) for r in rows]
        merged = _concat_term_postings(parts)
        merged["field"] = rows[0]["field"]
        merged["term"] = rows[0]["term"]
        out = {k: [merged[k]] for k in _BLOB_COLS}
        out["__rank"] = [rows[0]["__rank"]]
        out["__off"] = [0]  # partial blobs already carry GLOBAL doc ids
        out["__salt"] = [-1]
        return pa.table(out)

    stage1 = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby(["field", "term", "__salt"])
        .map_groups(lambda g: combine(g, final=False), batch_format="pyarrow")
    )
    stage2 = stage1.groupby(["field", "term"]).map_groups(
        lambda g: combine(g, final=True), batch_format="pyarrow"
    )
    # materialize() first: to_arrow_refs() on an un-materialized plan calls
    # schema(fetch_if_missing=True) AFTER consuming the bundles, and with
    # schema-drifting empty blocks that re-executes the ENTIRE shuffle as a
    # limit-1 probe (observed 2x wall time).  Materialized datasets answer
    # schema from the cached blocks.
    # schema arg: zero-batch refs (empty stage-2 blocks) can't infer one
    mat = stage2.materialize()
    parts = [
        pa.Table.from_batches(t.to_batches(), schema=t.schema)
        for t in ray.get(mat.to_arrow_refs())
    ]
    terms = (
        pa.concat_tables([p.select(_BLOB_COLS) for p in parts if p.num_rows])
        if parts
        else TERMS_SCHEMA.empty_table()
    )
    if terms.num_rows:
        terms = terms.cast(TERMS_SCHEMA).sort_by(
            [("field", "ascending"), ("term", "ascending")]
        )
    else:
        terms = TERMS_SCHEMA.empty_table()

    # docs: concat in rank order with dense global ids
    doc_tables = [r.docs for r in readers]
    docs = pa.concat_tables(doc_tables, promote_options="default")
    docs = docs.set_column(
        docs.schema.get_field_index("doc_id"),
        "doc_id",
        pa.array(np.arange(1, total + 1, dtype=np.int64), pa.int64()),
    )

    field_stats: dict[str, dict] = {}
    for r in readers:
        for fname, fs in r.meta["field_stats"].items():
            acc = field_stats.setdefault(fname, {"docs_with_field": 0, "total_term_freq": 0})
            acc["docs_with_field"] += fs["docs_with_field"]
            acc["total_term_freq"] += fs["total_term_freq"]

    key = zlib.crc32(("|".join(seg_names) + "|shuffle").encode())
    name = f"seg-s{generation:04d}-{key:08x}"
    return write_segment(
        index_dir,
        name,
        terms,
        docs,
        field_stats,
        cfg,
        lineage={"merged_from": seg_names, "engine": "shuffle", "num_salts": num_salts},
        metrics={"merge_secs": round(time.perf_counter() - t0, 4), "docs": total},
    )
