"""Segment merge — the merge_writer analog (SURVEY.md §3.3; ref:
core/index/merge_writer.cpp doc_map remap).

Doc spaces are CONCATENATED in segment-name order (the reference's behavior:
merged doc order = (source segment order, local doc id)); the doc-id remap is
a pure offset add per source.  Because every doc in a source shifts by the
same offset, within-block deltas are unchanged — so posting blobs are merged
by BYTE CONCATENATION, re-encoding only each source's first block (whose
first delta re-bases against the previous source's last doc for that term).
Positions blobs append completely unchanged.  This makes consolidation I/O
bound rather than CPU bound: no full decode/re-encode of the long tail.

The merged segment's blocks are therefore not uniformly 128 docs at source
seams; all decode paths honor ``block_doc_count`` (functions/codec.py).

Scale note (SURVEY §4.1 hot-term skew): this merge never shuffles by term —
each candidate set is one task doing a k-way dictionary merge, so Zipf-hot
terms cost sequential byte appends, not a skewed exchange.  The term-keyed
+ salted shuffle variant only pays off above ~dozens of sources; see
pipelines/consolidate.py notes.
"""

from __future__ import annotations

import time
import zlib

import numpy as np
import pyarrow as pa

from iresearch_ray.functions.codec import varint_encode
from iresearch_ray.stages.segment import (
    IndexConfig,
    SegmentReader,
    TERMS_SCHEMA,
    write_segment,
)


def _concat_term_postings(parts: list[tuple[dict, int]]) -> dict:
    """parts: [(term-row as python dict, doc_id offset)] in segment order.

    The offset remap only changes ONE value in each part's doc blob: the
    very first delta (doc₀ − 0 becomes doc₀ + offset − prev_last).  Every
    other delta, every tf and the whole positions stream are offset-
    invariant, so the merge splices a re-encoded first varint onto the
    untouched remainder — no block decode/re-encode at all (this is what
    keeps consolidation I/O-bound)."""
    out_doc = bytearray()
    out_pos = bytearray()
    out_offs = bytearray()
    bl_last: list[int] = []
    bl_off: list[int] = []
    p_off: list[int] = []
    o_off: list[int] = []
    bl_maxtf: list[int] = []
    bl_mindl: list[int] = []
    bl_cnt: list[int] = []
    prev_last = 0
    # offsets survive the merge only if EVERY part carries them — a mixed
    # set would desync off_off from the global block index
    keep_offs = all(r.get("off_blob") for r, _ in parts)
    for row, offset in parts:
        offs = row["block_off"]
        blob = row["doc_blob"]
        # parse the first varint (the part's first doc delta)
        i = 0
        while blob[i] & 0x80:
            i += 1
        first_len = i + 1
        first_val = 0
        for k in range(first_len):
            first_val |= (blob[k] & 0x7F) << (7 * k)
        new_first = first_val + offset - prev_last
        enc_first = varint_encode(np.array([new_first], dtype=np.uint64))
        shift = len(enc_first) - first_len
        base = len(out_doc)
        bl_off.append(base)
        for b in range(1, len(offs)):
            bl_off.append(base + offs[b] + shift)
        out_doc += enc_first
        out_doc += blob[first_len:]
        bl_last += [x + offset for x in row["block_last_doc"]]
        bl_cnt += list(row["block_doc_count"])
        bl_maxtf += list(row["block_max_tf"])
        bl_mindl += list(row["block_min_dl"])
        pos_base = len(out_pos)
        p_off += [pos_base + x for x in row["pos_off"]]
        out_pos += row["pos_blob"]
        # character-offset stream: per-doc values, doc-id-invariant —
        # byte append exactly like positions
        if keep_offs:
            off_base = len(out_offs)
            o_off += [off_base + x for x in row["off_off"]]
            out_offs += row["off_blob"]
        prev_last = bl_last[-1]
    return {
        "df": sum(r["df"] for r, _ in parts),
        "cf": sum(r["cf"] for r, _ in parts),
        "max_tf": max(r["max_tf"] for r, _ in parts),
        "min_dl": min(r["min_dl"] for r, _ in parts),
        "doc_blob": bytes(out_doc),
        "pos_blob": bytes(out_pos),
        "block_last_doc": bl_last,
        "block_off": bl_off,
        "pos_off": p_off,
        "block_max_tf": bl_maxtf,
        "block_min_dl": bl_mindl,
        "block_doc_count": bl_cnt,
        "off_blob": bytes(out_offs),
        "off_off": o_off,
    }


def merge_segments(index_dir: str, seg_names: list[str], generation: int, crypto=None) -> dict:
    """Merge the named segments into one new segment dir; returns its meta."""
    import os

    t0 = time.perf_counter()
    seg_names = sorted(seg_names)
    readers = [SegmentReader(os.path.join(index_dir, "segments", n), crypto=crypto) for n in seg_names]
    cfg = IndexConfig.from_json(readers[0].meta["config"])

    # deletes present? purge by REBUILDING from the stored doc rows (the
    # doc_map-with-drops path, ref: merge_writer doc_map remap; our blob-
    # concat fast path is only valid for the no-drops offset remap)
    from iresearch_ray.pipelines.delete import load_tombstone_keys
    from iresearch_ray.state.manifest import load_manifest as _lm

    man = _lm(index_dir) or {}
    if man.get("tombstones"):
        masks = []
        any_deleted = False
        for name, r in zip(seg_names, readers):
            keys = load_tombstone_keys(index_dir, man, for_segment=name)
            conv = r.docs["conv_id"].to_pylist()
            turn = r.docs["turn_idx"].to_pylist()
            m = np.fromiter(((c, t) in keys for c, t in zip(conv, turn)), dtype=bool, count=len(conv))
            masks.append(m)
            any_deleted = any_deleted or bool(m.any())
        if any_deleted:
            if not cfg.store_text:
                raise NotImplementedError(
                    "purging deletes requires store_text=True (rebuild from stored rows)"
                )
            return _merge_with_purge(index_dir, seg_names, readers, masks, cfg, generation, t0, crypto=crypto)

    offsets = np.concatenate(([0], np.cumsum([r.meta["docs_count"] for r in readers])))

    # --- docs: concat + dense re-id ------------------------------------
    doc_tables = [r.docs for r in readers]
    docs = pa.concat_tables(doc_tables, promote_options="default")
    total = docs.num_rows
    docs = docs.set_column(
        docs.schema.get_field_index("doc_id"),
        "doc_id",
        pa.array(np.arange(1, total + 1, dtype=np.int64), pa.int64()),
    )

    # --- terms: k-way dictionary merge + blob concat --------------------
    by_key: dict[tuple[str, str], list[tuple[dict, int]]] = {}
    for si, r in enumerate(readers):
        t = r.terms
        fields = t["field"].to_pylist()
        terms = t["term"].to_pylist()
        rows = t.to_pylist()
        for f, tm, row in zip(fields, terms, rows):
            by_key.setdefault((f, tm), []).append((row, int(offsets[si])))
    term_rows = []
    for (f, tm) in sorted(by_key):
        merged = _concat_term_postings(by_key[(f, tm)])
        merged["field"] = f
        merged["term"] = tm
        term_rows.append(merged)
    terms = (
        pa.Table.from_pylist(term_rows, schema=TERMS_SCHEMA)
        if term_rows
        else TERMS_SCHEMA.empty_table()
    )

    field_stats: dict[str, dict] = {}
    for r in readers:
        for fname, fs in r.meta["field_stats"].items():
            acc = field_stats.setdefault(fname, {"docs_with_field": 0, "total_term_freq": 0})
            acc["docs_with_field"] += fs["docs_with_field"]
            acc["total_term_freq"] += fs["total_term_freq"]

    key = zlib.crc32("|".join(seg_names).encode())
    name = f"seg-m{generation:04d}-{key:08x}"
    return write_segment(
        index_dir,
        name,
        terms,
        docs,
        field_stats,
        cfg,
        lineage={"merged_from": seg_names},
        metrics={"merge_secs": round(time.perf_counter() - t0, 4), "docs": total},
        crypto=crypto,
    )


def _merge_with_purge(index_dir, seg_names, readers, masks, cfg, generation, t0, crypto=None):
    """Drop masked docs and rebuild the merged segment from stored rows —
    correctness path for deletes; slower than blob concat, but deletes are
    purged exactly once."""
    import pyarrow as pa

    from iresearch_ray.stages.segment import build_segment_tables

    keep_tables = []
    for r, m in zip(readers, masks):
        t = r.docs.drop_columns([c for c in ("doc_id", "dl") if c in r.docs.column_names])
        keep_tables.append(t.filter(pa.array(~m)))
    rows = pa.concat_tables(keep_tables, promote_options="default")
    terms, docs, field_stats = build_segment_tables(rows, cfg)
    key = zlib.crc32(("|".join(seg_names) + "|purged").encode())
    name = f"seg-m{generation:04d}-{key:08x}"
    return write_segment(
        index_dir,
        name,
        terms,
        docs,
        field_stats,
        cfg,
        lineage={"merged_from": seg_names, "purged": True},
        metrics={"merge_secs": round(time.perf_counter() - t0, 4), "docs": docs.num_rows},
        crypto=crypto,
    )
