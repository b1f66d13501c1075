"""GlobalStats lazy (pushdown/streamed) mode must be plan- and
result-identical to the in-memory mode — the scale path for
multi-billion-term dictionaries where the driver cannot hold the
vocabulary (SURVEY §2.6 stats scope; round-2 review item 3)."""

import numpy as np
import pytest

from iresearch_ray.pipelines.build import build_index_local
from iresearch_ray.query import filters as F
from iresearch_ray.query.filters import prepare
from iresearch_ray.sources.transcripts import gen_transcripts
from iresearch_ray.stages.segment import IndexConfig
from iresearch_ray.state.manifest import load_manifest
from iresearch_ray.state.stats import build_global_stats


@pytest.fixture(scope="module")
def idx(tmp_path_factory):
    tbl = gen_transcripts(120)
    d = str(tmp_path_factory.mktemp("lazystats") / "idx")
    build_index_local(
        tbl, d, cfg=IndexConfig(numeric_fields=("turn_idx",)), num_partitions=3
    )
    return d


@pytest.fixture(scope="module")
def both(idx):
    man = load_manifest(idx)
    mem = build_global_stats(idx, man, mem_limit=1 << 40)
    lazy = build_global_stats(idx, man, mem_limit=0)
    assert not mem.lazy and lazy.lazy
    return mem, lazy


QUERIES = [
    F.Term("text", "the"),
    F.Term("text", "notaterm@@"),
    F.Terms("text", ("agent", "error", "plan"), min_match=2, boosts=(2.0, None, 0.5)),
    F.Prefix("text", "w0"),
    F.Prefix("text", ""),
    F.TermRange("text", low="a", high="c", include_high=False),
    F.TermRange("text", low=None, high="b"),
    F.TermRange("text", low="t", high=None, include_low=False),
    F.Wildcard("text", "w0%"),
    F.Wildcard("text", "%0a"),          # no literal head: streamed scan
    F.Wildcard("text", "w_0%", scored_terms_limit=3),
    F.Fuzzy("text", "agent", max_distance=1),
    F.Fuzzy("text", "eror", max_distance=2, with_transpositions=True),
    F.Phrase("text", ("the", F.Prefix("text", "a"))),
    F.Phrase("text", (F.Wildcard("text", "pla%"), "the"), slop=2, ordered=False),
    F.SamePosition("text", ("the", "a")),
    F.GranularRange("turn_idx", low=2, high=7),
    F.And((F.Term("text", "agent"), F.Or((F.Prefix("text", "er"), F.Term("text", "plan"))))),
    F.Not(F.Term("text", "the"), F.Fuzzy("text", "agent")),
]


def test_plans_identical(both):
    mem, lazy = both
    for q in QUERIES:
        p_mem = prepare(q, mem).plan
        p_lazy = prepare(q, lazy).plan
        assert p_mem == p_lazy, f"plan divergence for {q}"


def test_primitive_parity(both):
    mem, lazy = both
    t1, d1 = mem.field_terms("text")
    t2, d2 = lazy.field_terms("text")
    np.testing.assert_array_equal(t1, t2)
    np.testing.assert_array_equal(d1, d2)
    assert mem.term_df("text", "the") == lazy.term_df("text", "the") > 0
    assert lazy.term_df("text", "zz@@absent") == 0
    np.testing.assert_array_equal(
        mem.term_dfs("text", ["the", "absent@@", "agent"]),
        lazy.term_dfs("text", ["the", "absent@@", "agent"]),
    )
    # lazy LRU answers repeats without re-probing (monkey-check via cache)
    lazy.term_df("text", "the")
    assert ("text", "the") in lazy._df_lru
    # unknown field
    assert lazy.term_dfs("nofield", ["x"]).tolist() == [0]
    t, d = lazy.terms_in_range("nofield", None, None)
    assert t.size == 0 and d.size == 0


def test_lazy_searcher_results(idx, monkeypatch):
    """End-to-end: a Searcher forced into lazy-stats mode returns the exact
    rows of the default in-memory mode."""
    from iresearch_ray.pipelines.search import Searcher

    s_mem = Searcher(idx)
    monkeypatch.setenv("IRE_STATS_MEM", "0")
    s_lazy = Searcher(idx)
    assert s_lazy.stats.lazy and not s_mem.stats.lazy
    for q in QUERIES:
        a = s_mem.search_local(q, k=15).reset_index(drop=True)
        b = s_lazy.search_local(q, k=15).reset_index(drop=True)
        assert a.equals(b), f"result divergence for {q}"
