"""Dynamic JSON field flattening tests (SURVEY §1.1 dynamic schema —
ArangoDB-style path flattening into ordinary (field, term) postings).

Covers: flatten_json path semantics, dynamic_postings type routing,
and end-to-end build→query parity vs a brute-force oracle, including
the multi-valued-array case where one doc holds values in SEVERAL
disjoint granular-range intervals (exec.py dedupes with np.unique).
"""

import json

import numpy as np
import pyarrow as pa
import pytest

from iresearch_ray.functions.dynamic import (
    dynamic_postings,
    flatten_json,
    numeric_token_lists,
)


def test_flatten_json_paths():
    doc = {"a": {"b": 1, "c": "x"}, "arr": [1, 2, {"d": "y"}], "z": None}
    pairs = flatten_json(doc)
    assert ("a.b", 1) in pairs
    assert ("a.c", "x") in pairs
    # [*] semantics: array elements index under the SAME path
    assert pairs.count(("arr", 1)) == 1 and ("arr", 2) in pairs
    assert ("arr.d", "y") in pairs
    assert ("z", None) in pairs


def test_dynamic_postings_type_routing():
    rows = [
        json.dumps({"k": 5, "s": "hello", "b": True, "n": None, "f": 2.0, "g": 2.5}),
        json.dumps({"k": [1, 9], "s": ["a", "b"]}),  # multi-valued
        "not json {{{",  # unparsable → contributes nothing
        None,
    ]
    kw, num = dynamic_postings("props", rows, len(rows))
    # ints + integral floats → numeric occurrence pairs
    r, v = num["props.k"]
    assert r.tolist() == [0, 1, 1] and v.tolist() == [5, 1, 9]
    assert num["props.f"][1].tolist() == [2]
    # strings / bools / nulls / non-integral floats → keyword tokens
    assert kw["props.s"][0] == ["hello"] and kw["props.s"][1] == ["a", "b"]
    assert kw["props.b"][0] == ["true"]
    assert kw["props.n"][0] == ["null"]
    assert kw["props.g"][0] == [repr(2.5)]
    # bad rows absent everywhere
    assert kw["props.s"][2] == [] and kw["props.s"][3] == []


def test_dynamic_bigint_becomes_keyword():
    # JSON bigints beyond int64 must index as keywords, never crash the build
    big = 2**64 + 7
    kw, num = dynamic_postings("props", [json.dumps({"k": big, "m": -(2**70)})], 1)
    assert kw["props.k"][0] == [str(big)]
    assert kw["props.m"][0] == [str(-(2**70))]
    assert "props.k" not in num and "props.m" not in num


def test_numeric_token_lists_multivalue_concat():
    rows = np.array([0, 0, 2], dtype=np.int64)
    vals = np.array([7, 900, -3], dtype=np.int64)
    lists = numeric_token_lists(rows, vals, 3)
    from iresearch_ray.functions.numeric import LEVELS

    assert len(lists[0]) == 2 * LEVELS  # two values concat their trie terms
    assert lists[1] == []
    assert len(lists[2]) == LEVELS


@pytest.fixture(scope="module")
def dyn_index(tmp_path_factory, ray_session):
    import ray.data as rd

    from iresearch_ray import Searcher, build_index
    from iresearch_ray.stages.segment import IndexConfig

    rng = np.random.default_rng(7)
    n = 150
    props = []
    for i in range(n):
        doc = {
            "k": int(rng.integers(0, 100)),
            "tag": ["red", "green", "blue"][i % 3],
            "nested": {"flag": bool(i % 2)},
        }
        if i % 5 == 0:
            # multi-valued array: values far apart so a range query's
            # disjoint intervals can each match the SAME doc
            doc["multi"] = [int(rng.integers(0, 10)), int(rng.integers(90, 100))]
        if i % 7 == 0:
            doc["k"] = None  # mixed-type path: null in some docs
        props.append(json.dumps(doc))
    tbl = pa.table(
        {
            "conv_id": pa.array([f"c{i:04d}" for i in range(n)]),
            "turn_idx": pa.array([0] * n, pa.int32()),
            "text": pa.array([f"turn {i}" for i in range(n)]),
            "props": pa.array(props),
        }
    )
    idx = str(tmp_path_factory.mktemp("dynidx"))
    cfg = IndexConfig(keyword_fields=(), json_fields=("props",))
    build_index(rd.from_arrow(tbl), idx, cfg=cfg, num_partitions=3)
    return Searcher(idx), [json.loads(p) for p in props]


def _keys(out):
    return set(zip(out["conv_id"], out["turn_idx"]))


def test_dynamic_keyword_term(dyn_index):
    from iresearch_ray.query import filters as F

    s, docs = dyn_index
    got = _keys(s.search_local(F.Term("props.tag", "green"), k=10_000))
    expect = {(f"c{i:04d}", 0) for i, d in enumerate(docs) if d["tag"] == "green"}
    assert got == expect


def test_dynamic_bool_and_null_tokens(dyn_index):
    from iresearch_ray.query import filters as F

    s, docs = dyn_index
    got = _keys(s.search_local(F.Term("props.nested.flag", "true"), k=10_000))
    expect = {(f"c{i:04d}", 0) for i, d in enumerate(docs) if d["nested"]["flag"]}
    assert got == expect
    got = _keys(s.search_local(F.Term("props.k", "null"), k=10_000))
    expect = {(f"c{i:04d}", 0) for i, d in enumerate(docs) if d["k"] is None}
    assert got == expect


def test_dynamic_granular_range(dyn_index):
    from iresearch_ray.query import filters as F

    s, docs = dyn_index
    got = _keys(s.search_local(F.GranularRange("props.k", 20, 60), k=10_000))
    expect = {
        (f"c{i:04d}", 0)
        for i, d in enumerate(docs)
        if d["k"] is not None and 20 <= d["k"] <= 60
    }
    assert got == expect


def test_dynamic_multivalue_range_dedup(dyn_index):
    """A doc whose array holds values in TWO disjoint trie intervals must
    appear exactly once (exec.py range eval uses np.unique, not sort)."""
    from iresearch_ray.query import filters as F

    s, docs = dyn_index
    out = s.search_local(F.GranularRange("props.multi", 0, 100), k=10_000)
    keys = list(zip(out["conv_id"], out["turn_idx"]))
    assert len(keys) == len(set(keys))  # no duplicate emission
    expect = {(f"c{i:04d}", 0) for i, d in enumerate(docs) if "multi" in d}
    assert set(keys) == expect


def test_dynamic_exists(dyn_index):
    from iresearch_ray.query import filters as F

    s, docs = dyn_index
    got = _keys(s.search_local(F.Exists("props.multi"), k=10_000))
    expect = {(f"c{i:04d}", 0) for i, d in enumerate(docs) if "multi" in d}
    assert got == expect
