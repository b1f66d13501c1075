"""Numeric precision-trie + granular range tests (SURVEY §2.1 numeric,
§2.4 by_granular_range)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from iresearch_ray.functions import numeric as N


def _covered(runs, lo, hi):
    """Expand (level, lo_u, hi_u) runs back to the set of covered u64 values."""
    vals = set()
    for lv, a, b in runs:
        for x in range(a, b + 1):
            base = x << (lv * N.STEP)
            vals.update(range(base, base + (1 << (lv * N.STEP))))
    return vals


@given(
    st.integers(min_value=-5000, max_value=5000),
    st.integers(min_value=0, max_value=4000),
)
@settings(max_examples=200, deadline=None)
def test_decompose_partition_exact(lo, width):
    """Every value in [lo, hi] is covered by exactly one run; nothing outside."""
    hi = lo + width
    runs = N.decompose_range(lo, hi)
    lo_u = int(N.to_sortable_u64(np.array([lo]))[0])
    hi_u = int(N.to_sortable_u64(np.array([hi]))[0])
    # disjointness + exact cover ⇒ total covered count == hi-lo+1
    total = sum((b - a + 1) << (lv * N.STEP) for lv, a, b in runs)
    assert total == hi_u - lo_u + 1
    covered = _covered(runs, lo, hi)
    assert min(covered) == lo_u and max(covered) == hi_u
    assert len(covered) == total  # disjoint


def test_trie_terms_shape_and_order():
    terms = N.trie_terms(np.array([-5, 0, 5, 1 << 40], dtype=np.int64))
    assert all(len(t) == N.LEVELS for t in terms)
    # level-0 terms sort lexicographically in numeric order
    lvl0 = [t[0] for t in terms]
    assert lvl0 == sorted(lvl0)
    # coarse levels shared by close values
    a = N.trie_terms(np.array([100], dtype=np.int64))[0]
    b = N.trie_terms(np.array([101], dtype=np.int64))[0]
    assert a[0] != b[0] and a[-1] == b[-1]


@pytest.fixture(scope="module")
def num_index(tmp_path_factory, ray_session):
    import ray.data as rd

    from iresearch_ray import Searcher, build_index
    from iresearch_ray.sources.transcripts import gen_transcripts
    from iresearch_ray.stages.segment import IndexConfig

    tbl = gen_transcripts(120)
    idx = str(tmp_path_factory.mktemp("numidx"))
    cfg = IndexConfig(numeric_fields=("turn_idx", "ts"))
    build_index(rd.from_arrow(tbl), idx, cfg=cfg, num_partitions=3)
    return Searcher(idx), tbl


def _brute_range(tbl, col, lo, hi, include_low=True, include_high=True):
    import pyarrow.compute as pc

    v = tbl[col]
    if str(v.type).startswith("timestamp"):
        v = v.cast("int64")
    v = v.to_numpy(zero_copy_only=False).astype(np.int64)
    m = np.ones(len(v), dtype=bool)
    if lo is not None:
        m &= (v >= lo) if include_low else (v > lo)
    if hi is not None:
        m &= (v <= hi) if include_high else (v < hi)
    keys = set(
        zip(
            np.array(tbl["conv_id"].to_pylist(), dtype=object)[m],
            np.array(tbl["turn_idx"].to_pylist())[m],
        )
    )
    return keys


@pytest.mark.parametrize(
    "col,lo,hi,il,ih",
    [
        ("turn_idx", 2, 5, True, True),
        ("turn_idx", 0, 0, True, True),
        ("turn_idx", 3, 11, False, True),
        ("turn_idx", None, 4, True, True),
        ("ts", 1735693200000000, 1735696000000000, True, False),
        ("ts", None, None, True, True),
    ],
)
def test_granular_range_vs_brute(num_index, col, lo, hi, il, ih):
    from iresearch_ray.query import filters as F

    s, tbl = num_index
    expect = _brute_range(tbl, col, lo, hi, il, ih)
    got = s.search_local(
        F.GranularRange(col, lo, hi, include_low=il, include_high=ih),
        k=10_000,
    )
    got_keys = set(zip(got["conv_id"], got["turn_idx"]))
    assert got_keys == expect
    if len(got):
        assert (got["score"] == 1.0).all()  # constant boost score


def test_granular_range_boost_and_compose(num_index):
    from iresearch_ray.query import filters as F

    s, tbl = num_index
    # And(numeric range, term) composes: score = term score + boost constant
    f_and = F.And((F.GranularRange("turn_idx", 0, 1, boost=2.0), F.Term("text", "the")))
    out = s.search_local(f_and, k=50)
    assert (out["turn_idx"] <= 1).all()
    term_only = s.search_local(F.Term("text", "the"), k=100_000)
    t = term_only.set_index(["conv_id", "turn_idx"])["score"]
    for _, r in out.iterrows():
        assert abs(r["score"] - (t.loc[(r["conv_id"], r["turn_idx"])] + 2.0)) < 1e-9
