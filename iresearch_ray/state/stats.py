"""Index-global statistics — the prepare()-time collector analog (SURVEY §2.6).

BM25's idf and avg_dl are index-global (ref: core/search/filter.hpp
prepare(index_reader,…) iterates every segment's collect; bm25.cpp
field_collector/term_collector).  Here:

- field stats (N = docs_with_field, total_term_freq ⇒ avg_dl) are summed from
  the per-segment meta.json entries — O(#segments), no data read.
- the global term dictionary (field, term → df, cf, max_tf, min_dl) is the
  union of per-segment term tables WITHOUT the posting blobs.  For small
  segment counts this is a driver-side pyarrow concat+groupby; beyond
  RAY_MERGE_THRESHOLD segments it becomes a Ray Data groupby so no single
  process has to hold every dictionary (SURVEY §3.2 "cached per generation").

The merged dictionary is cached per (index_dir, generation) both on disk
(``stats-g{N}.parquet`` next to the manifest) and in-process.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from iresearch_ray.state.manifest import segment_dirs

RAY_MERGE_THRESHOLD = 64  # above this many segments, merge dictionaries via Ray

_STATS_COLS = ["field", "term", "df", "cf", "max_tf", "min_dl"]
_STATS_SCHEMA = pa.schema(
    [
        ("field", pa.string()),
        ("term", pa.string()),
        ("df", pa.int64()),
        ("cf", pa.int64()),
        ("max_tf", pa.int64()),
        ("min_dl", pa.int64()),
    ]
)
# bounded per-process LRU: long-lived serving processes open a new Searcher
# per committed generation; unbounded caching leaked one term dictionary
# per consolidation forever
_CACHE_MAX = 8
import collections as _collections

_cache: "_collections.OrderedDict[tuple[str, int], GlobalStats]" = _collections.OrderedDict()


class GlobalStats:
    def __init__(self, field_stats: dict[str, dict], term_table: pa.Table):
        self.field_stats = field_stats  # field -> {docs_with_field, total_term_freq}
        self.term_table = term_table    # field, term, df, cf, max_tf, min_dl (sorted)
        self._by_field: dict[str, dict[str, np.ndarray]] = {}

    def field(self, field_name: str) -> tuple[float, float]:
        """(N, avg_dl) for a field."""
        fs = self.field_stats.get(field_name)
        if not fs or fs["docs_with_field"] == 0:
            return 0.0, 1.0
        N = float(fs["docs_with_field"])
        return N, float(fs["total_term_freq"]) / N

    def _field_arrays(self, field_name: str) -> dict[str, np.ndarray]:
        arrs = self._by_field.get(field_name)
        if arrs is None:
            mask = pc.equal(self.term_table["field"], field_name)
            sub = self.term_table.filter(mask)
            arrs = {
                "term": sub["term"].to_pandas().to_numpy(dtype=object),
                "df": sub["df"].to_numpy(),
                "cf": sub["cf"].to_numpy(),
            }
            self._by_field[field_name] = arrs
        return arrs

    def term_df(self, field_name: str, term: str) -> int:
        a = self._field_arrays(field_name)
        i = np.searchsorted(a["term"], term)
        if i < a["term"].size and a["term"][i] == term:
            return int(a["df"][i])
        return 0

    def field_terms(self, field_name: str) -> tuple[np.ndarray, np.ndarray]:
        """(sorted terms, dfs) — the global term dictionary slice used for
        multiterm expansion (prefix/range/wildcard/fuzzy, SURVEY §2.5)."""
        a = self._field_arrays(field_name)
        return a["term"], a["df"]


def _merge_term_tables(tables: list[pa.Table]) -> pa.Table:
    if not tables:
        return _STATS_SCHEMA.empty_table()
    merged = pa.concat_tables(tables)
    if merged.num_rows == 0:
        return merged
    out = pa.TableGroupBy(merged, ["field", "term"]).aggregate(
        [("df", "sum"), ("cf", "sum"), ("max_tf", "max"), ("min_dl", "min")]
    )
    out = out.rename_columns(["field", "term", "df", "cf", "max_tf", "min_dl"])
    return out.sort_by([("field", "ascending"), ("term", "ascending")])


def _merge_with_ray(paths: list[str]) -> pa.Table:
    """Wide merge of many segment dictionaries as a Ray Data groupby —
    the consolidation-scale path (hot terms appear in every segment; the
    groupby key (field, term) shuffles only dictionary rows, never blobs)."""
    import ray.data as rd

    ds = rd.read_parquet(paths, columns=_STATS_COLS)
    ds = ds.groupby(["field", "term"]).aggregate(
        *_ray_aggs()
    )
    t = ds.to_arrow_refs()
    import ray

    tables = [pa.Table.from_batches(tbl.to_batches()) for tbl in ray.get(t)]
    merged = pa.concat_tables(tables)
    merged = merged.rename_columns(["field", "term", "df", "cf", "max_tf", "min_dl"])
    return merged.sort_by([("field", "ascending"), ("term", "ascending")])


def _ray_aggs():
    from ray.data.aggregate import Max, Min, Sum

    return [
        Sum("df", alias_name="df"),
        Sum("cf", alias_name="cf"),
        Max("max_tf", alias_name="max_tf"),
        Min("min_dl", alias_name="min_dl"),
    ]


def build_global_stats(index_dir: str, manifest: dict) -> GlobalStats:
    gen = manifest["generation"]
    key = (os.path.abspath(index_dir), gen)
    hit = _cache.get(key)
    if hit is not None:
        _cache.move_to_end(key)
        return hit

    field_stats: dict[str, dict] = {}
    for seg in manifest["segments"]:
        for f, fs in seg["field_stats"].items():
            acc = field_stats.setdefault(
                f, {"docs_with_field": 0, "total_term_freq": 0}
            )
            acc["docs_with_field"] += fs["docs_with_field"]
            acc["total_term_freq"] += fs["total_term_freq"]

    cache_path = os.path.join(index_dir, f"stats-g{gen}.parquet")
    if os.path.exists(cache_path):
        term_table = pq.read_table(cache_path)
    else:
        from iresearch_ray.stages.segment import terms_paths

        paths = [p for d in segment_dirs(index_dir, manifest) for p in terms_paths(d)]
        if len(paths) == 0:
            term_table = _merge_term_tables([])
        elif len(paths) > RAY_MERGE_THRESHOLD:
            term_table = _merge_with_ray(paths)
        else:
            term_table = _merge_term_tables(
                [pq.read_table(p, columns=_STATS_COLS) for p in paths]
            )
        tmp = f"{cache_path}.tmp.{os.getpid()}"
        pq.write_table(term_table, tmp)
        os.replace(tmp, cache_path)

    stats = GlobalStats(field_stats, term_table)
    _cache[key] = stats
    while len(_cache) > _CACHE_MAX:
        _cache.popitem(last=False)
    return stats
