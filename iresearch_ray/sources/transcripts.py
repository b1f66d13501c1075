"""Deterministic synthetic transcript generator — FIXTURES.md §1.

Schema (BASELINE.json input_hint):
    conv_id: string, turn_idx: int32, role: string, text: string,
    tool: string, ts: timestamp[us]

All randomness derives from ``numpy.random.default_rng(seed ^ conv_index)``
so any conversation (hence any hash partition) can be regenerated
independently — the property the resume test relies on (FIXTURES §1).
Zipf(s=1.1) over a 2,000-word vocabulary with a 50-word hot head produces
the hot-term skew the engine must handle (SURVEY §4.1).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

HOT_HEAD = (
    "the a to of and in is it for on agent tool model run error plan step call "
    "result file code test data query index search token batch merge sort key "
    "row turn user answer question think act observe state done fail retry ok "
    "yes no help"
).split()

VOCAB: list[str] = HOT_HEAD + [f"w{i:04d}" for i in range(1950)]
ROLES = ("user", "assistant", "tool")
TOOLS = ("search", "python", "browser", "sql")

_BASE_TS_US = np.datetime64("2025-01-01T00:00:00", "us").astype("int64")


def _zipf_weights(n: int, s: float = 1.1) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, n + 1, dtype=np.float64), s)
    return w / w.sum()


_WEIGHTS = _zipf_weights(len(VOCAB))
_CUM = np.cumsum(_WEIGHTS)


def turns_per_conv(conv_index: int) -> int:
    # 3..12, derived from the conv id string hash (crc-free, stable)
    import zlib

    return 3 + (zlib.crc32(f"conv-{conv_index:07d}".encode()) % 10)


def gen_conv(conv_index: int, seed: int = 42) -> dict[str, list]:
    rng = np.random.default_rng(seed ^ conv_index)
    conv_id = f"conv-{conv_index:07d}"
    n_turns = turns_per_conv(conv_index)
    rows: dict[str, list] = {k: [] for k in ("conv_id", "turn_idx", "role", "text", "tool", "ts")}
    conv_offset_us = int(conv_index) * 60_000_000  # 1 min between conv starts
    prev_role = None
    for t in range(n_turns):
        if t == 0:
            role = "user"
        elif prev_role == "assistant" and rng.random() < 0.25:
            role = "tool"
        elif prev_role == "user":
            role = "assistant"
        else:
            role = "user" if rng.random() < 0.5 else "assistant"
        prev_role = role
        n_words = 5 + int(rng.integers(0, 60))
        if role == "assistant":
            n_words = min(n_words * 2, 120)
        words_idx = np.searchsorted(_CUM, rng.random(n_words))
        text = " ".join(VOCAB[i] for i in words_idx)
        rows["conv_id"].append(conv_id)
        rows["turn_idx"].append(t)
        rows["role"].append(role)
        rows["text"].append(text)
        rows["tool"].append(str(TOOLS[int(rng.integers(0, 4))]) if role == "tool" else None)
        rows["ts"].append(int(_BASE_TS_US + conv_offset_us + 7_000_000 * t))
    return rows


def gen_transcripts(n_convs: int, seed: int = 42) -> pa.Table:
    cols: dict[str, list] = {k: [] for k in ("conv_id", "turn_idx", "role", "text", "tool", "ts")}
    for ci in range(n_convs):
        r = gen_conv(ci, seed)
        for k in cols:
            cols[k].extend(r[k])
    return pa.table(
        {
            "conv_id": pa.array(cols["conv_id"], pa.string()),
            "turn_idx": pa.array(cols["turn_idx"], pa.int32()),
            "role": pa.array(cols["role"], pa.string()),
            "text": pa.array(cols["text"], pa.string()),
            "tool": pa.array(cols["tool"], pa.string()),
            "ts": pa.array(cols["ts"], pa.timestamp("us")),
        }
    )


def write_transcripts(path: str, n_convs: int, seed: int = 42, rows_per_file: int = 200_000) -> list[str]:
    """Materialize a transcript corpus as (possibly several) parquet files —
    the bench-scale input writer.  Chunked by conv ranges so generation
    memory stays bounded."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    files = []
    # ~7.5 turns/conv average
    convs_per_file = max(1, rows_per_file // 8)
    part = 0
    start = 0
    while start < n_convs:
        end = min(start + convs_per_file, n_convs)
        tbl = gen_transcripts_range(start, end, seed)
        f = os.path.join(path, f"part-{part:05d}.parquet")
        pq.write_table(tbl, f)
        files.append(f)
        start = end
        part += 1
    return files


def gen_transcripts_range(start_conv: int, end_conv: int, seed: int = 42) -> pa.Table:
    cols: dict[str, list] = {k: [] for k in ("conv_id", "turn_idx", "role", "text", "tool", "ts")}
    for ci in range(start_conv, end_conv):
        r = gen_conv(ci, seed)
        for k in cols:
            cols[k].extend(r[k])
    return pa.table(
        {
            "conv_id": pa.array(cols["conv_id"], pa.string()),
            "turn_idx": pa.array(cols["turn_idx"], pa.int32()),
            "role": pa.array(cols["role"], pa.string()),
            "text": pa.array(cols["text"], pa.string()),
            "tool": pa.array(cols["tool"], pa.string()),
            "ts": pa.array(cols["ts"], pa.timestamp("us")),
        }
    )


def documents_as_transcripts(sf_dir: str):
    """Adapt the driver's ``documents`` table to the transcript shape
    (FIXTURES §4: doc key (\"doc\", doc_id) ↦ (conv_id, turn_idx)) so the
    same engine indexes both corpora.  lang/source become the keyword
    fields (role/tool analogs)."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet")
    n = t.num_rows
    conv = pa.array([f"d{int(i):09d}" for i in t["doc_id"].to_pylist()], pa.string())
    return pa.table(
        {
            "conv_id": conv,
            "turn_idx": pa.array(np.zeros(n, dtype=np.int32), pa.int32()),
            "role": t["lang"],
            "text": t["text"],
            "tool": t["source"],
            "n_chars": t["n_chars"],
        }
    )


# --------------------------------------------------------------- ingestion

_CANON_TYPES = {
    "conv_id": pa.string(),
    "turn_idx": pa.int32(),
    "role": pa.string(),
    "text": pa.string(),
    "tool": pa.string(),
    "ts": pa.timestamp("us"),
}
_REQUIRED = ("conv_id", "turn_idx", "text")


def coerce_transcripts(batch: pa.Table) -> pa.Table:
    """One Arrow batch of raw rows → the canonical transcript schema.

    Casts turn_idx to int32, parses ISO-string (zoned or naive, fractional
    or whole-second) / epoch-micros (int or float) timestamps to
    timestamp[us], fills the optional columns (role/tool → "", ts → epoch 0
    whether the column is absent OR present-but-null) and drops extras —
    so JSONL/CSV exports with loose types index identically to curated
    Parquet.  Vectorized (Arrow casts), usable directly as a
    ``map_batches`` stage."""
    for col in _REQUIRED:
        if col not in batch.column_names:
            raise ValueError(f"transcripts: missing required column {col!r}")
    out = {}
    for name, typ in _CANON_TYPES.items():
        if name not in batch.column_names:
            if name == "ts":
                arr = pa.nulls(batch.num_rows, pa.timestamp("us")).fill_null(0)
            else:
                arr = pa.array([""] * batch.num_rows, pa.string())
            out[name] = arr
            continue
        col = batch[name]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if name == "ts":
            if pa.types.is_floating(col.type):
                col = col.cast(pa.int64())  # float epoch micros (JSON)
            if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                try:
                    # Arrow's ISO-8601 parser: naive strings, any precision
                    col = col.cast(pa.timestamp("us"))
                except pa.lib.ArrowInvalid:
                    # zoned ISO-8601 ('Z' / ±hh:mm) → UTC wall time
                    col = col.cast(pa.timestamp("us", tz="UTC")).cast(
                        pa.timestamp("us"))
        col = col.cast(typ) if col.type != typ else col
        if name in ("role", "tool"):
            # CSV readers surface empty cells as nulls — same meaning here
            col = col.fill_null("")
        elif name == "ts":
            # consistent with an absent ts column: "no timestamp" = epoch 0
            col = col.fill_null(0)
        out[name] = col
    return pa.table(out)


def read_transcripts(source, columns: list[str] | None = None):
    """Format-dispatching transcript reader → ``ray.data.Dataset`` in the
    canonical schema, ready for ``build_index`` (which accepts a Dataset
    anywhere it accepts Parquet paths).

    ``source``: path(s) or directory; dispatches on extension —
    ``.parquet`` via ``read_parquet`` (column-pruned at the read),
    ``.jsonl``/``.json`` via ``read_json``, ``.csv`` via ``read_csv``.
    Text formats may carry a compression suffix (``.gz``/``.zst``/
    ``.bz2`` — e.g. ``part-0.jsonl.gz``); blocks are then decompressed
    streamingly in the read tasks via Arrow's CompressedInputStream, so a
    100 TB compressed export never materializes an uncompressed copy.
    Non-Parquet rows pass through :func:`coerce_transcripts`, so the loose
    types real JSONL exports carry (int64 turn_idx, ISO-string ts) build
    byte-identical indexes to curated Parquet."""
    import os

    import ray.data as rd

    _codec_of = {".gz": "gzip", ".zst": "zstd", ".bz2": "bz2"}

    def _kind(name: str):
        """filename → (data_ext, codec | None), or None if unrecognized."""
        base, ext = os.path.splitext(name)
        ext = ext.lower()
        codec = _codec_of.get(ext)
        if codec is not None:
            ext = os.path.splitext(base)[1].lower()
            if ext == ".parquet":
                # parquet is internally compressed; a wrapper codec is a
                # packaging mistake we surface rather than guess around
                raise ValueError(f"transcripts: compressed parquet {name!r}")
        if ext in (".parquet", ".jsonl", ".json", ".csv"):
            return ext, codec
        return None

    paths = [source] if isinstance(source, str) else list(source)
    expanded: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            # keep only recognized DATA files — real export directories
            # carry _SUCCESS markers, READMEs, nested dirs, checksums
            expanded.extend(
                fp for f in sorted(os.listdir(p))
                if not f.startswith(".")
                and os.path.isfile(fp := os.path.join(p, f))
                and _kind(f) is not None
            )
        else:
            expanded.append(p)
    if not expanded:
        raise ValueError(f"transcripts: no data files found in {source!r}")
    kinds = {_kind(os.path.basename(p)) for p in expanded}
    if len(kinds) != 1 or None in kinds:
        raise ValueError(f"transcripts: mixed/unknown source formats {kinds}")
    ext, codec = kinds.pop()
    open_args = {"compression": codec} if codec else None
    if ext == ".parquet":
        return rd.read_parquet(expanded, columns=columns)
    if ext in (".jsonl", ".json"):
        ds = rd.read_json(expanded, arrow_open_stream_args=open_args,
                          file_extensions=None)
    elif ext == ".csv":
        ds = rd.read_csv(expanded, arrow_open_stream_args=open_args,
                         file_extensions=None)
    else:
        raise ValueError(f"transcripts: unsupported extension {ext!r}")
    ds = ds.map_batches(coerce_transcripts, batch_format="pyarrow")
    if columns:
        ds = ds.select_columns(columns)
    return ds
