"""Deletes — the document-mask / remove-by-filter analog (SURVEY §2.3;
ref: core/index/index_writer.cpp documents().remove(filter), document_mask).

A delete is a TOMBSTONE parquet of (conv_id, turn_idx) keys committed as a
new manifest generation — segments are immutable, exactly like the
reference's bitset side files.  Query time applies the mask per segment
(docs excluded from iteration; term stats keep counting them until a merge,
matching the reference).  Consolidation PURGES masked docs: when any merge
candidate contains tombstoned keys the merge rebuilds the new segment from
the stored doc rows instead of blob-concat (requires ``store_text=True``).
"""

from __future__ import annotations

import os
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from iresearch_ray.state.manifest import commit_manifest, load_manifest

TOMBSTONE_SCHEMA = pa.schema([("conv_id", pa.string()), ("turn_idx", pa.int32())])


def _keys_table(keys: pa.Table | list[tuple[str, int]]) -> pa.Table:
    if isinstance(keys, pa.Table):
        return pa.table(
            {
                "conv_id": keys["conv_id"].cast(pa.string()),
                "turn_idx": keys["turn_idx"].cast(pa.int32()),
            }
        )
    return pa.table(
        {
            "conv_id": pa.array([k[0] for k in keys], pa.string()),
            "turn_idx": pa.array([k[1] for k in keys], pa.int32()),
        }
    )


def delete_keys(index_dir: str, keys: pa.Table | list[tuple[str, int]]) -> dict:
    """Tombstone explicit (conv_id, turn_idx) keys; returns the new manifest."""
    manifest = load_manifest(index_dir)
    if manifest is None:
        raise FileNotFoundError(f"no manifest in {index_dir}")
    t = _keys_table(keys)
    if t.num_rows == 0:
        return manifest
    tdir = os.path.join(index_dir, "tombstones")
    os.makedirs(tdir, exist_ok=True)
    crc = zlib.crc32(
        "\x00".join(
            f"{c}\x01{i}" for c, i in zip(t["conv_id"].to_pylist(), t["turn_idx"].to_pylist())
        ).encode()
    )
    name = f"ts-{crc:08x}.parquet"  # content-hash name => idempotent re-delete
    path = os.path.join(tdir, name)
    if not os.path.exists(path):  # idempotent (content-hash name)
        tmp = f"{path}.tmp.{os.getpid()}"
        pq.write_table(t, tmp)
        os.rename(tmp, path)
    scope = sorted(sm["name"] for sm in manifest["segments"])
    entry = {"file": name, "segments": scope}
    live = [e for e in _entries(manifest)]
    if not any(e["file"] == name and e["segments"] == scope for e in live):
        live.append(entry)
    live = sorted(live, key=lambda e: (e["file"], e["segments"]))
    return commit_manifest(
        index_dir,
        manifest["segments"],
        manifest["config"],
        lineage={**manifest.get("lineage", {}), "last_delete": name},
        metrics={
            **manifest.get("metrics", {}),
            "tombstoned_keys": _count_keys(index_dir, sorted({e["file"] for e in live})),
        },
        tombstones=live,
    )


def _entries(manifest: dict) -> list[dict]:
    """Normalize tombstone entries: each is {"file", "segments"(scope)}.
    The scope records which segments were live when the delete was issued —
    a re-inserted key in a LATER segment (update = delete + insert) is not
    masked, matching the reference's per-segment document masks."""
    out = []
    for e in manifest.get("tombstones", []):
        if isinstance(e, str):  # legacy global-scope entry
            out.append({"file": e, "segments": [s["name"] for s in manifest["segments"]]})
        else:
            out.append(e)
    return out


def delete_by_filter(index_dir: str, flt, k: int = 10_000_000) -> dict:
    """remove(filter) analog: evaluate the filter against the CURRENT
    snapshot, tombstone every matching key in one transaction."""
    from iresearch_ray.pipelines.search import Searcher

    s = Searcher(index_dir)
    hits = s.search_local(flt, k=k)
    return delete_keys(
        index_dir, list(zip(hits["conv_id"].tolist(), hits["turn_idx"].tolist()))
    )


def _count_keys(index_dir: str, names: list[str]) -> int:
    total = 0
    for n in names:
        total += pq.read_metadata(os.path.join(index_dir, "tombstones", n)).num_rows
    return total


def load_tombstone_keys(
    index_dir: str, manifest: dict, for_segment: str | None = None
) -> set[tuple[str, int]]:
    """Tombstoned keys applying to ``for_segment`` (or the union over all
    scopes when None), deduped across files."""
    out: set[tuple[str, int]] = set()
    for e in _entries(manifest):
        if for_segment is not None and for_segment not in e["segments"]:
            continue
        t = pq.read_table(os.path.join(index_dir, "tombstones", e["file"]))
        out.update(zip(t["conv_id"].to_pylist(), t["turn_idx"].to_pylist()))
    return out


def update_rows(index_dir: str, rows: pa.Table, num_partitions: int = 1) -> dict:
    """Update = delete + re-insert in ONE committed generation (ref:
    index_writer: update is remove(filter)+insert in a single trx).
    ``rows`` are full replacement turns (transcript schema).  The delete is
    scoped to the segments live BEFORE the update, so the freshly-built
    segment's copies stay visible."""
    import numpy as np

    from iresearch_ray.stages.segment import (
        IndexConfig,
        build_segment_tables,
        segment_content_key,
        write_segment,
    )

    manifest = load_manifest(index_dir)
    if manifest is None:
        raise FileNotFoundError(f"no manifest in {index_dir}")
    cfg = IndexConfig.from_json(manifest["config"])
    scope = sorted(sm["name"] for sm in manifest["segments"])

    # 1) tombstone the replaced keys against the pre-update segments
    keys = _keys_table(rows.select(["conv_id", "turn_idx"]))
    tdir = os.path.join(index_dir, "tombstones")
    os.makedirs(tdir, exist_ok=True)
    crc = zlib.crc32(
        "\x00".join(
            f"{c}\x01{i}"
            for c, i in zip(keys["conv_id"].to_pylist(), keys["turn_idx"].to_pylist())
        ).encode()
    )
    fname = f"ts-{crc:08x}.parquet"
    path = os.path.join(tdir, fname)
    if not os.path.exists(path):
        tmp = f"{path}.tmp.{os.getpid()}"
        pq.write_table(keys, tmp)
        os.rename(tmp, path)

    # 2) build the replacement segment(s) from the new rows
    gen = manifest["generation"] + 1
    name = f"seg-u{gen:04d}-{segment_content_key(rows)}"
    terms, docs, field_stats = build_segment_tables(rows, cfg)
    meta = write_segment(
        index_dir,
        name,
        terms,
        docs,
        field_stats,
        cfg,
        lineage={"update": True, "rows": rows.num_rows},
        metrics={},
    )

    # 3) one atomic commit with both effects
    live = _entries(manifest) + [{"file": fname, "segments": scope}]
    return commit_manifest(
        index_dir,
        manifest["segments"] + [meta],
        manifest["config"],
        lineage={**manifest.get("lineage", {}), "last_update": name},
        metrics=manifest.get("metrics", {}),
        tombstones=sorted(live, key=lambda e: (e["file"], str(e["segments"]))),
    )


def deleted_doc_mask(reader, keys: set[tuple[str, int]]) -> np.ndarray | None:
    """Boolean mask over the reader's doc space (index doc_id-1): True =
    deleted.  None when no key touches this segment."""
    if not keys:
        return None
    conv = reader.docs["conv_id"].to_pylist()
    turn = reader.docs["turn_idx"].to_pylist()
    mask = np.fromiter(
        ((c, t) in keys for c, t in zip(conv, turn)), dtype=bool, count=len(conv)
    )
    return mask if mask.any() else None
