"""Index build pipeline — SURVEY.md §3.1 (entry point 1).

Two physical plans with identical output (content-hash segment names prove
it in tests/test_build_direct.py):

- ``build_index`` — Dataset-native: groupby(__part).map_groups (sort-based
  shuffle); simplest expression, used by the driver-contract corpus.
- ``build_index_direct`` — explicit two-stage hash exchange (grouped read
  tasks × num_returns=P); the scaling path used by bench/-scale runs.

    ray.data.read_parquet(transcripts, columns=<pruned>)
      → map_batches: deterministic hash(conv_id) % P partition assignment
        (+ resume filter: rows of already-completed partitions are dropped
         BEFORE the shuffle, so a resumed build re-reads but never re-shuffles
         or re-indexes finished work)
      → groupby(__part).map_groups: per-partition segment build + atomic write
      → driver: collect tiny meta rows → manifest generation+1 (two-phase commit)

The only shuffle is the partition groupby, keyed by hash(conv_id) — one
conversation's turns always land in one segment, which preserves stable
(conv_id, turn_idx)-local doc ids and makes per-turn text equality checks
partition-local (SURVEY §4.2).  The postings accumulator lives entirely
inside one map_groups task (the field_data analog) — no cross-task mutable
state (SURVEY §3.1).

Skew note (SURVEY §4.1): conv_id hash partitioning is uniform by construction
(conv sizes are bounded: one conversation ≪ partition size), unlike term-keyed
shuffles — term-keyed salting only matters on the consolidation path.
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

from iresearch_ray.stages.segment import (
    IndexConfig,
    build_segment_tables,
    segment_content_key,
    write_segment,
)
from iresearch_ray.state.manifest import commit_manifest, completed_segments, load_manifest

TARGET_PARTITION_BYTES = 256 << 20  # SURVEY §4.2: P = ceil(input_bytes / 256MB)


def hash_partition(conv_ids, num_partitions: int) -> np.ndarray:
    """Deterministic (process- and version-independent) partition id per conv_id:
    crc32 over the utf-8 bytes — stable for resume across runs.

    Accepts an Arrow (Chunked)Array or a Python list.  Arrow inputs are
    dictionary-encoded first so crc32 (a per-string Python call) runs only
    over the UNIQUES — turns repeat per conversation, so this is
    ~turns/convs× fewer Python calls on the build hot path (round-2 review
    #4) — then the codes are gathered.  Bit-identical to the per-row path
    (same crc32 over the same utf-8 bytes), so resume fingerprints and
    partition assignments are unchanged; test_build_direct asserts this."""
    if isinstance(conv_ids, (pa.Array, pa.ChunkedArray)):
        arr = (
            conv_ids.combine_chunks()
            if isinstance(conv_ids, pa.ChunkedArray)
            else conv_ids
        )
        enc = arr.dictionary_encode()
        uniq = enc.dictionary.to_pylist()
        uhash = np.fromiter(
            (zlib.crc32(s.encode()) % num_partitions for s in uniq),
            dtype=np.int64,
            count=len(uniq),
        )
        return uhash[np.asarray(enc.indices)]
    return np.fromiter(
        (zlib.crc32(s.encode()) % num_partitions for s in conv_ids),
        dtype=np.int64,
        count=len(conv_ids),
    )


def _expand_files(source) -> list[str]:
    """str | list[str] (files or dirs) → flat sorted parquet file list —
    the ONE expansion rule shared by build/append/fingerprint/verify so
    resume fingerprints can never diverge between paths."""
    out: list[str] = []
    for s_ in [source] if isinstance(source, str) else list(source):
        if os.path.isdir(s_):
            out += [
                os.path.join(s_, f) for f in sorted(os.listdir(s_)) if f.endswith(".parquet")
            ]
        else:
            out.append(s_)
    return out


def _input_columns(schema_names: list[str], cfg: IndexConfig) -> list[str]:
    wanted = ["conv_id", "turn_idx", cfg.text_field, *cfg.keyword_fields,
              *cfg.numeric_fields, *cfg.json_fields, *cfg.geo_fields, "ts"]
    return [c for c in wanted if c in schema_names]


def _source_fingerprint(source) -> dict:
    if isinstance(source, str):
        source = [source]
    if isinstance(source, (list, tuple)) and all(isinstance(s, str) for s in source):
        # json-shaped (lists, not tuples) so the manifest round-trip
        # compares equal on resume
        return {"files": [[f, os.path.getsize(f)] for f in _expand_files(list(source))]}
    return {"files": None}


def _num_partitions(ds, explicit: int | None) -> int:
    if explicit:
        return explicit
    try:
        nbytes = ds.size_bytes()
    except Exception:
        nbytes = None
    if not nbytes:
        return 1
    return max(1, math.ceil(nbytes / TARGET_PARTITION_BYTES))


def _build_group_fn(index_dir: str, cfg: IndexConfig, num_partitions: int, fingerprint: dict | None = None, crypto=None):
    def build_group(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"meta": pa.array([], pa.string())})
        part = int(group["__part"][0].as_py())
        rows = group.drop_columns(["__part"])
        t0 = time.perf_counter()
        c0 = time.process_time()
        from iresearch_ray.state.meter import cpu_mark, report_since

        mk = cpu_mark()
        key = segment_content_key(rows, cfg, crypto)
        name = f"seg-p{part:05d}-{key}"
        terms, docs, field_stats = build_segment_tables(rows, cfg)
        cpu = time.process_time() - c0
        report_since("build", mk)
        meta = write_segment(
            index_dir,
            name,
            terms,
            docs,
            field_stats,
            cfg,
            lineage={"partition": part, "of_partitions": num_partitions,
                     "rows": rows.num_rows, "input": fingerprint},
            metrics={
                "build_secs": round(time.perf_counter() - t0, 4),
                "build_cpu_secs": round(cpu, 4),
                "tokens": field_stats.get(cfg.text_field, {}).get("total_term_freq", 0),
            },
            crypto=crypto,
        )
        return pa.table({"meta": pa.array([json.dumps(meta)], pa.string())})

    return build_group


def build_index(
    source,
    index_dir: str,
    cfg: IndexConfig | None = None,
    num_partitions: int | None = None,
    resume: bool = True,
    crypto=None,
) -> dict:
    """Build (or resume) an index from a Parquet path / list of paths / an
    existing ``ray.data.Dataset`` of transcript rows.  Returns the committed
    manifest.  Does NOT call ray.init() — caller owns the session."""
    import ray.data as rd

    cfg = cfg or IndexConfig()
    if isinstance(source, (str, list, tuple)):
        expanded = _expand_files(source)
        schema = pq.read_schema(expanded[0]) if expanded else None
        cols = _input_columns(schema.names, cfg) if schema is not None else None
        ds = rd.read_parquet(source, columns=cols)
    else:
        ds = source

    P = _num_partitions(ds, num_partitions)
    fingerprint = _source_fingerprint(source)

    # ----- resume: find completed partitions of a matching prior run -----
    done: dict[int, dict] = {}
    if resume and fingerprint.get("files") is not None:
        # adoption requires per-segment provenance: the segment must record
        # THIS source fingerprint and THIS config in its own lineage/meta —
        # orphan segments from a crashed run over different data (or a prior
        # config) are never adopted (round-2 review fix).  In-memory Dataset
        # sources have no fingerprint ({"files": None}) and are NEVER
        # resume-adopted — None == None must not alias different data.
        cfg_json = cfg.to_json()
        for name, meta in completed_segments(index_dir).items():
            lin = meta.get("lineage", {})
            if (
                lin.get("of_partitions") == P
                and isinstance(lin.get("partition"), int)
                and lin.get("input") == fingerprint
                and meta.get("config") == cfg_json
                and meta.get("encrypted") == getattr(crypto, "key_id", None)
                # key-bytes fingerprint too: a rotated master key under a
                # reused key_id must force a rebuild, not a silent
                # mixed-key adoption (ADVICE r3)
                and meta.get("key_fp") == getattr(crypto, "key_fingerprint", None)
            ):
                done[lin["partition"]] = meta

    done_parts = np.array(sorted(done), dtype=np.int64)

    def assign(batch: pa.Table) -> pa.Table:
        part = hash_partition(batch["conv_id"], P)
        batch = batch.append_column("__part", pa.array(part, pa.int64()))
        if done_parts.size:
            keep = ~np.isin(part, done_parts)
            batch = batch.filter(pa.array(keep))
        return batch

    ds = ds.map_batches(assign, batch_format="pyarrow")
    metas_ds = ds.groupby("__part").map_groups(
        _build_group_fn(index_dir, cfg, P, fingerprint, crypto), batch_format="pyarrow"
    )
    new_metas = [json.loads(r["meta"]) for r in metas_ds.take_all()]

    all_metas = list(done.values()) + new_metas
    manifest = commit_manifest(
        index_dir,
        all_metas,
        cfg.to_json(),
        lineage={
            "input": fingerprint,
            "num_partitions": P,
            "resumed_partitions": sorted(int(p) for p in done),
            "built_partitions": sorted(m["lineage"]["partition"] for m in new_metas),
        },
        metrics={
            "docs_count": sum(m["docs_count"] for m in all_metas),
            "segments": len(all_metas),
            "build_secs_per_partition": {
                str(m["lineage"]["partition"]): m["metrics"].get("build_secs")
                for m in new_metas
            },
        },
    )
    return manifest


def build_index_direct(
    source,
    index_dir: str,
    cfg: IndexConfig | None = None,
    num_partitions: int | None = None,
    resume: bool = True,
    crypto=None,
) -> dict:
    """Same contract as ``build_index`` but with an EXPLICIT two-stage hash
    exchange instead of the Dataset sort-based groupby:

      stage A (one Ray task per input file): read + column-prune + split rows
        by crc32(conv_id) % P, returning P separate objects (num_returns=P)
        so stage B fetches ONLY its partition's bytes;
      stage B (one Ray task per partition): concat its F shard tables →
        build + write the segment.

    Rationale (SURVEY §4.1): the sort-based shuffle pays a global sort with a
    poorly-parallelized boundary that dominates small-to-mid builds and caps
    scaling efficiency; this exchange is the classic M×R map-side split, all
    stages embarrassingly parallel, no ordering requirement (each partition
    re-sorts locally by (conv_id, turn_idx) anyway).  Metadata cost is F×P
    refs — fine up to ~10⁴ files × ~10³ partitions per job; at larger F the
    job is split by input directory (resume makes that free).
    """
    import ray

    cfg = cfg or IndexConfig()
    files = _expand_files(source)
    fingerprint = {"files": [[f, os.path.getsize(f)] for f in files]}

    schema = pq.read_schema(files[0])
    cols = _input_columns(schema.names, cfg)
    if num_partitions:
        P = num_partitions
    else:
        nbytes = sum(sz for _, sz in fingerprint["files"])
        # parquet is ~4x smaller than in-memory arrow for text; aim partitions
        # at TARGET_PARTITION_BYTES of in-memory rows
        P = max(1, math.ceil(4 * nbytes / TARGET_PARTITION_BYTES))

    done: dict[int, dict] = {}
    if resume:
        # per-segment provenance required for adoption (round-2 review fix)
        cfg_json = cfg.to_json()
        for name, meta in completed_segments(index_dir).items():
            lin = meta.get("lineage", {})
            if (
                lin.get("of_partitions") == P
                and isinstance(lin.get("partition"), int)
                and lin.get("input") == fingerprint
                and meta.get("config") == cfg_json
                and meta.get("encrypted") == getattr(crypto, "key_id", None)
                # key-bytes fingerprint too: a rotated master key under a
                # reused key_id must force a rebuild, not a silent
                # mixed-key adoption (ADVICE r3)
                and meta.get("key_fp") == getattr(crypto, "key_fingerprint", None)
            ):
                done[lin["partition"]] = meta
    done_parts = np.array(sorted(done), dtype=np.int64)

    @ray.remote(num_cpus=1, num_returns=P)
    def read_split(paths: list[str]):
        t = pa.concat_tables(pq.read_table(f, columns=cols) for f in paths)
        part = hash_partition(t["conv_id"], P)
        # one stable sort + P zero-copy slices beats P table.filter scans
        order = np.argsort(part, kind="stable")
        t = t.take(pa.array(order))
        sorted_part = part[order]
        bounds = np.searchsorted(sorted_part, np.arange(P + 1))
        out = []
        for p in range(P):
            lo, hi = int(bounds[p]), int(bounds[p + 1])
            if hi == lo or p in done:
                out.append(None)
            else:
                out.append(t.slice(lo, hi - lo))
        return tuple(out) if P > 1 else out[0]

    build = _build_group_fn(index_dir, cfg, P, fingerprint, crypto)

    @ray.remote(num_cpus=1)
    def build_part(p: int, *shards):
        tables = [t for t in shards if t is not None and t.num_rows]
        if not tables:
            return None
        rows = pa.concat_tables(tables)
        rows = rows.append_column("__part", pa.array(np.full(rows.num_rows, p), pa.int64()))
        out = build(rows)
        return out["meta"][0].as_py()

    # group files so stage A is O(P) tasks: F independent read tasks each
    # returning P objects floods the object store with F×P refs (observed to
    # collapse throughput at a few hundred files); ~P groups keeps the ref
    # count at P² while still saturating the cluster
    n_groups = min(len(files), max(P, 16))
    groups: list[list[str]] = [files[i::n_groups] for i in range(n_groups)]
    groups = [g for g in groups if g]
    refs = [read_split.remote(g) for g in groups]  # [G][P] object refs
    if P == 1:
        build_refs = [] if 0 in done else [build_part.remote(0, *refs)]
    else:
        build_refs = [
            build_part.remote(p, *[refs[g][p] for g in range(len(groups))])
            for p in range(P)
            if p not in done
        ]
    new_metas = [json.loads(m) for m in ray.get(build_refs) if m is not None]

    all_metas = list(done.values()) + new_metas
    return commit_manifest(
        index_dir,
        all_metas,
        cfg.to_json(),
        lineage={
            "input": fingerprint,
            "num_partitions": P,
            "resumed_partitions": sorted(int(p) for p in done),
            "built_partitions": sorted(m["lineage"]["partition"] for m in new_metas),
        },
        metrics={
            "docs_count": sum(m["docs_count"] for m in all_metas),
            "segments": len(all_metas),
            "build_secs_per_partition": {
                str(m["lineage"]["partition"]): m["metrics"].get("build_secs")
                for m in new_metas
            },
        },
    )


def append_index(
    source,
    index_dir: str,
    num_partitions: int | None = None,
    resume: bool = True,
    crypto=None,
) -> dict:
    """Incremental ingest (SURVEY §2.10: incremental = NEW segments +
    consolidation, never rewriting old ones): build segments for a NEW batch
    of transcript parquet and append them to the existing manifest in one
    generation.  The batch is identified by a content fingerprint; resume
    within a batch skips its completed partitions (matched by batch key, so
    partitions of different batches can never alias).  Config comes from the
    existing manifest.  Follow with consolidate() to fold small batch
    segments into the tiers."""
    import zlib as _zlib

    import ray

    manifest = load_manifest(index_dir)
    if manifest is None:
        raise FileNotFoundError(f"no manifest in {index_dir} — use build_index first")
    cfg = IndexConfig.from_json(manifest["config"])

    files = _expand_files(source)
    fingerprint = {"files": [[f, os.path.getsize(f)] for f in files]}
    batch_key = f"{_zlib.crc32(json.dumps(fingerprint, sort_keys=True).encode()):08x}"

    schema = pq.read_schema(files[0])
    cols = _input_columns(schema.names, cfg)
    if num_partitions:
        P = num_partitions
    else:
        nbytes = sum(sz for _, sz in fingerprint["files"])
        P = max(1, math.ceil(4 * nbytes / TARGET_PARTITION_BYTES))

    done: dict[int, dict] = {}
    if resume:
        for name, meta in completed_segments(index_dir).items():
            lin = meta.get("lineage", {})
            if (
                lin.get("batch") == batch_key
                and lin.get("of_partitions") == P
                and isinstance(lin.get("partition"), int)
                and meta.get("encrypted") == getattr(crypto, "key_id", None)
                # key-bytes fingerprint too: a rotated master key under a
                # reused key_id must force a rebuild, not a silent
                # mixed-key adoption (ADVICE r3)
                and meta.get("key_fp") == getattr(crypto, "key_fingerprint", None)
            ):
                done[lin["partition"]] = meta

    @ray.remote(num_cpus=1, num_returns=P)
    def read_split(paths: list[str]):
        t = pa.concat_tables(pq.read_table(f, columns=cols) for f in paths)
        part = hash_partition(t["conv_id"], P)
        order = np.argsort(part, kind="stable")
        t = t.take(pa.array(order))
        sorted_part = part[order]
        bounds = np.searchsorted(sorted_part, np.arange(P + 1))
        out = []
        for p in range(P):
            lo, hi = int(bounds[p]), int(bounds[p + 1])
            out.append(None if hi == lo or p in done else t.slice(lo, hi - lo))
        return tuple(out) if P > 1 else out[0]

    def build_batch_part(rows: pa.Table, part: int) -> dict:
        key = segment_content_key(rows, cfg, crypto)
        name = f"seg-b{batch_key}-p{part:05d}-{key}"
        terms, docs, field_stats = build_segment_tables(rows, cfg)
        return write_segment(
            index_dir,
            name,
            terms,
            docs,
            field_stats,
            cfg,
            lineage={
                "partition": part,
                "of_partitions": P,
                "batch": batch_key,
                "rows": rows.num_rows,
            },
            metrics={},
            crypto=crypto,
        )

    @ray.remote(num_cpus=1)
    def build_part(p: int, *shards):
        tables = [t for t in shards if t is not None and t.num_rows]
        if not tables:
            return None
        return json.dumps(build_batch_part(pa.concat_tables(tables), p))

    n_groups = min(len(files), max(P, 16))
    groups = [g for g in ([files[i::n_groups] for i in range(n_groups)]) if g]
    refs = [read_split.remote(g) for g in groups]
    if P == 1:
        build_refs = [] if 0 in done else [build_part.remote(0, *refs)]
    else:
        build_refs = [
            build_part.remote(p, *[refs[g][p] for g in range(len(groups))])
            for p in range(P)
            if p not in done
        ]
    new_metas = [json.loads(m) for m in ray.get(build_refs) if m is not None]

    batch_metas = list(done.values()) + new_metas
    # re-appending an already-committed batch must be a no-op: segments the
    # manifest already references (matched by content-derived name) are not
    # added twice
    existing = {sm["name"] for sm in manifest["segments"]}
    batch_metas = [m for m in batch_metas if m["name"] not in existing]
    return commit_manifest(
        index_dir,
        manifest["segments"] + batch_metas,
        manifest["config"],
        lineage={
            **manifest.get("lineage", {}),
            # re-appending the same batch stays a true no-op: no duplicate
            # lineage entry either (round-2 review fix)
            "appended_batches": (
                manifest.get("lineage", {}).get("appended_batches", [])
                + (
                    [{"batch": batch_key, "input": fingerprint, "num_partitions": P}]
                    if batch_key
                    not in {
                        b.get("batch")
                        for b in manifest.get("lineage", {}).get("appended_batches", [])
                    }
                    else []
                )
            ),
        },
        metrics={
            "docs_count": sum(
                m["docs_count"] for m in manifest["segments"] + batch_metas
            ),
            "segments": len(manifest["segments"]) + len(batch_metas),
        },
    )


def verify_text_equality(index_dir: str, source, distributed: bool | None = None, crypto=None) -> dict:
    """Per-turn text equality against the source corpus under stable
    (conv_id, turn_idx) ordering — the end-to-end invariant pinned by the
    BASELINE input_hint.  Compares the stored doc-table text of EVERY live
    segment row to the source rows; returns counts and raises on mismatch.

    With a live Ray session and file-backed source (the default there),
    the comparison runs as a DISTRIBUTED co-located anti-join — source
    rows and segment doc rows shuffled once by conv-hash shard, compared
    vectorized inside each group, only per-shard count rows reaching the
    driver — so the check itself survives 100 TB (the round-2 version
    built a whole-corpus Python dict on the driver).  The driver path
    remains for pa.Table inputs / no-Ray contexts; both raise the same
    errors in the same priority order."""
    from iresearch_ray.stages.segment import SegmentReader
    from iresearch_ray.state.manifest import load_manifest, segment_dirs

    manifest = load_manifest(index_dir)
    if manifest is None:
        raise FileNotFoundError(f"no manifest in {index_dir}")
    cfg = IndexConfig.from_json(manifest["config"])
    if not cfg.store_text:
        raise ValueError("verify_text_equality requires store_text=True")

    if distributed is None:
        try:
            import ray

            distributed = ray.is_initialized() and not isinstance(source, pa.Table)
        except Exception:
            distributed = False
    if distributed:
        return _verify_text_equality_distributed(index_dir, source, cfg, manifest)

    if isinstance(source, pa.Table):
        src = source
    else:
        src = pa.concat_tables(
            pq.read_table(f, columns=["conv_id", "turn_idx", cfg.text_field])
            for f in _expand_files(source)
        )
    expect = {
        (c, t): x
        for c, t, x in zip(
            src["conv_id"].to_pylist(),
            src["turn_idx"].to_pylist(),
            src[cfg.text_field].to_pylist(),
        )
    }
    if len(expect) != src.num_rows:
        raise AssertionError(
            f"source has duplicate (conv_id, turn_idx) keys: {src.num_rows - len(expect)}"
        )

    checked = 0
    seen: set = set()
    mismatches = []
    dup_keys = []
    for d in segment_dirs(index_dir, manifest):
        r = SegmentReader(d, crypto=crypto)
        for c, t, x in zip(
            r.docs["conv_id"].to_pylist(),
            r.docs["turn_idx"].to_pylist(),
            r.docs[cfg.text_field].to_pylist(),
        ):
            checked += 1
            if (c, t) in seen:
                dup_keys.append((c, t))
            seen.add((c, t))
            if expect.get((c, t)) != x:
                mismatches.append((c, t))
    if mismatches:
        raise AssertionError(
            f"text mismatch for {len(mismatches)} keys, e.g. {mismatches[:3]}"
        )
    if dup_keys:
        raise AssertionError(
            f"{len(dup_keys)} duplicate indexed keys, e.g. {dup_keys[:3]}"
        )
    if checked != src.num_rows:
        # missing-doc blindness fix (round-2 review): equality of the rows
        # that EXIST is not enough — every source row must be indexed
        raise AssertionError(
            f"indexed row count {checked} != source rows {src.num_rows}"
        )
    return {"checked": checked, "source_rows": src.num_rows, "equal": True}


def _verify_text_equality_distributed(index_dir: str, source, cfg, manifest) -> dict:
    """Dataset-native text-equality check: normalize source rows (side 0)
    and segment doc rows (side 1) to (conv_id, turn_idx, text, side),
    co-locate by conv-hash shard (ONE keyed shuffle), and inside each
    group sort by (conv_id, turn_idx, side) and scan (conv, turn) runs
    vectorized — src rows lead each run, so per-key comparison is a
    reduceat over run boundaries.  Output: one count row per shard."""
    import pyarrow.compute as pc
    import ray.data as rd

    from iresearch_ray.stages.segment import docs_paths
    from iresearch_ray.state.manifest import segment_dirs

    tf = cfg.text_field
    S = 512

    def norm(side: int):
        def f(b: pa.Table) -> pa.Table:
            t = pa.table(
                {
                    "conv_id": b["conv_id"].cast(pa.string()),
                    "turn_idx": b["turn_idx"].cast(pa.int64()),
                    "__text": b[tf].cast(pa.string()),
                    "side": pa.array(np.full(b.num_rows, side, np.int8)),
                }
            )
            return t.append_column(
                "__shard", pa.array(hash_partition(t["conv_id"], S))
            )

        return f

    src_files = _expand_files(source)
    doc_files = [p for d in segment_dirs(index_dir, manifest) for p in docs_paths(d)]
    src = rd.read_parquet(src_files, columns=["conv_id", "turn_idx", tf]).map_batches(
        norm(0), batch_format="pyarrow"
    )
    idx = rd.read_parquet(doc_files, columns=["conv_id", "turn_idx", tf]).map_batches(
        norm(1), batch_format="pyarrow"
    )

    def check(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            g,
            sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending"), ("side", "ascending")],
        )
        g = g.take(order)
        conv = np.asarray(g["conv_id"].to_pylist(), dtype=object)
        turn = g["turn_idx"].to_numpy(zero_copy_only=False)
        text = np.asarray(g["__text"].to_pylist(), dtype=object)
        side = g["side"].to_numpy(zero_copy_only=False)
        n = conv.size
        new_run = np.ones(n, bool)
        if n > 1:
            new_run[1:] = (conv[1:] != conv[:-1]) | (turn[1:] != turn[:-1])
        starts = np.nonzero(new_run)[0]
        counts = np.diff(np.append(starts, n))
        run_of = np.repeat(np.arange(starts.size), counts)
        n0 = np.add.reduceat((side == 0).astype(np.int64), starts)
        n1 = counts - n0
        # src rows sort first within a run; the run's reference text is the
        # first row IF it is a src row
        has_src = side[starts] == 0
        is_idx = side == 1
        ref_ok = has_src[run_of]
        mism_rows = is_idx & (~ref_ok | (text != text[starts[run_of]]))
        run_bad = (
            np.bincount(run_of, weights=mism_rows.astype(np.float64), minlength=starts.size)
            > 0
        )
        ex = [(str(conv[i]), int(turn[i])) for i in starts[run_bad][:3]]
        return pa.table(
            {
                "checked": pa.array([int(n1.sum())], pa.int64()),
                "src_rows": pa.array([int(n0.sum())], pa.int64()),
                "mismatch_rows": pa.array([int(mism_rows.sum())], pa.int64()),
                "dup_idx_keys": pa.array([int(np.maximum(n1 - 1, 0).sum())], pa.int64()),
                "dup_src_keys": pa.array([int(np.maximum(n0 - 1, 0).sum())], pa.int64()),
                "examples": pa.array([json.dumps(ex)], pa.string()),
            }
        )

    rep = (
        src.union(idx)
        .groupby("__shard")
        .map_groups(check, batch_format="pyarrow")
        .to_pandas()
    )
    src_rows = int(rep["src_rows"].sum())
    checked = int(rep["checked"].sum())
    dup_src = int(rep["dup_src_keys"].sum())
    mism = int(rep["mismatch_rows"].sum())
    dup_idx = int(rep["dup_idx_keys"].sum())
    examples = [e for s in rep["examples"] for e in json.loads(s)]
    if dup_src:
        raise AssertionError(f"source has duplicate (conv_id, turn_idx) keys: {dup_src}")
    if mism:
        raise AssertionError(f"text mismatch for {mism} keys, e.g. {examples[:3]}")
    if dup_idx:
        raise AssertionError(f"{dup_idx} duplicate indexed keys")
    if checked != src_rows:
        raise AssertionError(f"indexed row count {checked} != source rows {src_rows}")
    return {"checked": checked, "source_rows": src_rows, "equal": True}


def build_index_local(
    table: pa.Table,
    index_dir: str,
    cfg: IndexConfig | None = None,
    num_partitions: int = 1,
    crypto=None,
) -> dict:
    """Pure-local (no Ray) build over an in-memory table — unit-test and
    golden-fixture path; byte-identical segment layout to the Ray path."""
    cfg = cfg or IndexConfig()
    part = hash_partition(table["conv_id"], num_partitions)
    metas = []
    build = _build_group_fn(index_dir, cfg, num_partitions, crypto=crypto)
    for p in range(num_partitions):
        rows = table.filter(pa.array(part == p))
        if rows.num_rows == 0:
            continue
        rows = rows.append_column("__part", pa.array(np.full(rows.num_rows, p), pa.int64()))
        out = build(rows)
        metas.append(json.loads(out["meta"][0].as_py()))
    return commit_manifest(
        index_dir,
        metas,
        cfg.to_json(),
        lineage={"input": {"files": None}, "num_partitions": num_partitions,
                 "built_partitions": [m["lineage"]["partition"] for m in metas]},
        metrics={"docs_count": sum(m["docs_count"] for m in metas), "segments": len(metas)},
    )
