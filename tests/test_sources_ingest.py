"""Format-dispatching transcript ingestion (sources/transcripts.py
read_transcripts / coerce_transcripts): JSONL and CSV exports with loose
types (int64 turn_idx, epoch-micros or ISO-string ts, missing optional
columns) must index identically to curated Parquet."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from iresearch_ray.sources.transcripts import (
    coerce_transcripts,
    gen_transcripts,
    read_transcripts,
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """One small corpus written three ways: parquet (canonical), jsonl
    (int64 turn_idx + epoch-micros ts), csv (ISO-string ts, whole-second
    resolution so the string round-trip is exact)."""
    d = tmp_path_factory.mktemp("ingest")
    tbl = gen_transcripts(40)
    # floor ts to whole seconds so the CSV ISO-string path is lossless
    ts_us = tbl["ts"].cast(pa.int64()).to_numpy()
    ts_us = (ts_us // 1_000_000) * 1_000_000
    tbl = tbl.set_column(
        tbl.schema.get_field_index("ts"), "ts",
        pa.array(ts_us, pa.int64()).cast(pa.timestamp("us")))
    pq.write_table(tbl, str(d / "part-00000.parquet"))

    rows = tbl.to_pylist()
    with open(d / "part-00000.jsonl", "w") as f:
        for r in rows:
            r = dict(r)
            r["ts"] = int(np.datetime64(r["ts"], "us").astype("int64"))
            f.write(json.dumps(r) + "\n")
    import csv as _csv

    with open(d / "part-00000.csv", "w", newline="") as f:
        w = _csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        for r in rows:
            r = dict(r)
            r["ts"] = r["ts"].strftime("%Y-%m-%dT%H:%M:%S")
            w.writerow(r)
    return d, tbl


def _canon(df):
    # null and "" are the same engine semantic on the optional keyword
    # columns ("no tool on this turn"); CSV cannot even represent the
    # difference, so the comparison normalizes both sides
    df = df.copy()
    for c in ("role", "tool"):
        df[c] = df[c].fillna("")
    return (df.sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)[["conv_id", "turn_idx", "role", "text",
                                     "tool", "ts"]])


def test_jsonl_and_csv_match_parquet(ray_session, corpus):
    d, tbl = corpus
    want = _canon(tbl.to_pandas())
    for name in ("part-00000.parquet", "part-00000.jsonl", "part-00000.csv"):
        ds = read_transcripts(str(d / name))
        got = _canon(ds.to_pandas())
        assert got["turn_idx"].dtype == np.int32, name
        assert got.equals(want), name
    # directory dispatch rejects mixed formats loudly
    with pytest.raises(ValueError, match="mixed"):
        read_transcripts(str(d))


def test_jsonl_builds_identical_index(ray_session, corpus, tmp_path):
    from iresearch_ray import Searcher, build_index
    from iresearch_ray.query import filters as F

    d, _ = corpus
    build_index(str(d / "part-00000.parquet"), str(tmp_path / "idx_pq"),
                num_partitions=3)
    build_index(read_transcripts(str(d / "part-00000.jsonl")),
                str(tmp_path / "idx_jl"), num_partitions=3)
    q = F.Or((F.Term("text", "agent"), F.Term("text", "error")))
    a = Searcher(str(tmp_path / "idx_pq")).search_local(q, k=15)
    b = Searcher(str(tmp_path / "idx_jl")).search_local(q, k=15)
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_coerce_fills_optionals_and_validates():
    batch = pa.table({
        "conv_id": pa.array(["c1", "c1"]),
        "turn_idx": pa.array([0, 1], pa.int64()),
        "text": pa.array(["hello world", "again"]),
        "extra_col": pa.array([1, 2]),
    })
    out = coerce_transcripts(batch)
    assert out.column_names == ["conv_id", "turn_idx", "role", "text",
                                "tool", "ts"]
    assert out["turn_idx"].type == pa.int32()
    assert out["role"].to_pylist() == ["", ""]
    assert out["ts"].type == pa.timestamp("us")
    with pytest.raises(ValueError, match="missing required"):
        coerce_transcripts(pa.table({"text": pa.array(["x"])}))


def test_coerce_real_world_timestamp_shapes():
    """Zoned ('Z' / +hh:mm), fractional, float-epoch and null timestamps —
    the shapes real JSONL/CSV exports actually carry."""
    def mk(vals, typ=None):
        return pa.table({
            "conv_id": pa.array(["c"] * len(vals)),
            "turn_idx": pa.array(range(len(vals)), pa.int64()),
            "text": pa.array(["x"] * len(vals)),
            "ts": pa.array(vals, typ) if typ else pa.array(vals),
        })

    z = coerce_transcripts(mk(["2025-01-01T00:00:00Z"]))["ts"][0].as_py()
    assert z.isoformat() == "2025-01-01T00:00:00"
    off = coerce_transcripts(mk(["2025-01-01 02:00:00+02:00"]))["ts"][0].as_py()
    assert off.isoformat() == "2025-01-01T00:00:00"  # UTC wall time
    frac = coerce_transcripts(mk(["2025-01-01T00:00:00.123456"]))["ts"][0].as_py()
    assert frac.microsecond == 123456
    flt = coerce_transcripts(mk([1.7e15], pa.float64()))["ts"][0].as_py()
    assert flt.year == 2023
    # present-but-null ts coerces to epoch 0, same as an absent column
    nul = coerce_transcripts(mk([None], pa.string()))["ts"][0].as_py()
    assert nul.year == 1970


def test_directory_read_skips_sidecar_files(ray_session, corpus, tmp_path):
    """Spark-style export dirs carry _SUCCESS markers, READMEs, nested
    dirs — the reader must keep only recognized data files."""
    import shutil

    d, tbl = corpus
    exp = tmp_path / "export"
    exp.mkdir()
    shutil.copy(d / "part-00000.parquet", exp / "part-00000.parquet")
    (exp / "_SUCCESS").write_text("")
    (exp / "README").write_text("notes")
    (exp / "subdir").mkdir()
    got = _canon(read_transcripts(str(exp)).to_pandas())
    assert got.equals(_canon(tbl.to_pandas()))


def test_compressed_jsonl_and_csv(ray_session, corpus, tmp_path):
    """Real exports ship compressed text: .jsonl.gz / .jsonl.zst /
    .csv.gz must decode streamingly and match the parquet canon."""
    import bz2
    import gzip

    import pyarrow as pa_mod

    d, tbl = corpus
    want = _canon(tbl.to_pandas())

    raw = (d / "part-00000.jsonl").read_bytes()
    gz = tmp_path / "part-00000.jsonl.gz"
    gz.write_bytes(gzip.compress(raw))
    got = _canon(read_transcripts(str(gz)).to_pandas())
    assert got.equals(want)

    zst = tmp_path / "part-00000.jsonl.zst"
    zst.write_bytes(pa_mod.Codec("zstd").compress(raw, asbytes=True))
    got = _canon(read_transcripts(str(zst)).to_pandas())
    assert got.equals(want)

    raw_csv = (d / "part-00000.csv").read_bytes()
    bz = tmp_path / "part-00000.csv.bz2"
    bz.write_bytes(bz2.compress(raw_csv))
    got = _canon(read_transcripts(str(bz)).to_pandas())
    assert got.equals(want)

    # a directory of uniformly-compressed parts dispatches fine
    exp = tmp_path / "gz_export"
    exp.mkdir()
    import shutil

    shutil.copy(gz, exp / "part-00000.jsonl.gz")
    (exp / "_SUCCESS").write_text("")
    got = _canon(read_transcripts(str(exp)).to_pandas())
    assert got.equals(want)

    # compressed + plain of the same format is still "mixed" — loud error
    shutil.copy(d / "part-00000.jsonl", exp / "part-00001.jsonl")
    with pytest.raises(ValueError, match="mixed"):
        read_transcripts(str(exp))

    # gzipped parquet is a packaging mistake, not a format
    pqgz = tmp_path / "part-00000.parquet.gz"
    pqgz.write_bytes(gzip.compress((d / "part-00000.parquet").read_bytes()))
    with pytest.raises(ValueError, match="compressed parquet"):
        read_transcripts(str(pqgz))
