"""View-link layer (pipelines/views.py — the ArangoSearch view analog,
SURVEY §2.11 link config / §7.6 closing item).

Pinned invariants:
- view-global scoring: a view over two links with identical configs scores
  EXACTLY like one index built over the union of both collections;
- link lifecycle: add → docs appear; remove → results identical to the
  pre-add view; view.json never references missing data;
- refresh: new collection documents become searchable via append;
- per-link analyzers: each collection is tokenized by its own link config;
- consolidation: consolidate_view leaves results bit-identical.
"""

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from iresearch_ray.pipelines.views import (
    LinkDef,
    ViewSearcher,
    ViewStats,
    _merge_sum,
    consolidate_view,
    create_view,
    link_config,
    load_view,
    refresh_link,
    update_links,
)
from iresearch_ray.query import filters as F
from iresearch_ray.sources.transcripts import gen_transcripts_range


@pytest.fixture(scope="module")
def corpora(tmp_path_factory, ray_session):
    root = tmp_path_factory.mktemp("views")
    a = os.path.join(root, "coll_a.parquet")
    b = os.path.join(root, "coll_b.parquet")
    b2 = os.path.join(root, "coll_b_more.parquet")
    pq.write_table(gen_transcripts_range(0, 120), a)
    pq.write_table(gen_transcripts_range(120, 240), b)
    pq.write_table(gen_transcripts_range(240, 280), b2)
    return str(root), a, b, b2


def _frame_key(df: pd.DataFrame) -> list[tuple]:
    return list(zip(df["conv_id"], df["turn_idx"], np.round(df["score"].to_numpy(), 6)))


def test_view_scores_equal_merged_index(corpora, ray_session, tmp_path):
    from iresearch_ray import Searcher, build_index

    root, a, b, _ = corpora
    vdir = str(tmp_path / "v")
    create_view(vdir, "conv_view", {
        "docs_a": LinkDef(source=a, fields={"text": {"analyzers": ["text"]},
                                            "role": {"analyzers": ["identity"]}}),
        "docs_b": LinkDef(source=b, fields={"text": {"analyzers": ["text"]},
                                            "role": {"analyzers": ["identity"]}}),
    }, num_partitions=2)
    merged_dir = str(tmp_path / "merged")
    build_index([a, b], merged_dir, num_partitions=2)

    vs = ViewSearcher(vdir)
    ms = Searcher(merged_dir)
    for flt in (
        F.Term("text", "the"),
        F.And((F.Term("text", "the"), F.Term("text", "a"))),
        F.Or((F.Term("text", "error"), F.Term("text", "tool"))),
        F.Prefix("text", "s"),
        F.Term("role", "user"),
    ):
        got = vs.search_local(flt, k=25)
        want = ms.search_local(flt, k=25)
        # same doc set with the same scores (tie order may differ only among
        # equal-score docs; both merges tie-break by (conv_id, turn_idx) and
        # conv ranges are disjoint, so frames must be identical)
        assert _frame_key(got) == _frame_key(want)
        # collection labels match the conv ranges
        lab = np.where(got["conv_id"].str.slice(5).astype(int) < 120, "docs_a", "docs_b")
        assert (got["collection"].to_numpy() == lab).all()
    vs.close()


def test_view_pooled_matches_local(corpora, ray_session, tmp_path):
    root, a, b, _ = corpora
    vdir = str(tmp_path / "v")
    create_view(vdir, "pview", {
        "docs_a": LinkDef(source=a, fields={"text": {"analyzers": ["text"]}}),
        "docs_b": LinkDef(source=b, fields={"text": {"analyzers": ["text"]}}),
    }, num_partitions=2)
    vs = ViewSearcher(vdir)
    queries = {"q1": F.Term("text", "the"), "q2": F.Prefix("text", "err")}
    pooled = vs.search_pooled(queries, k=15, num_actors=2)
    for qid, flt in queries.items():
        local = vs.search_local(flt, k=15)
        sub = pooled[pooled["query_id"] == qid]
        assert _frame_key(sub) == _frame_key(local)
        assert list(sub["collection"]) == list(local["collection"])
    vs.close()


def test_link_lifecycle_add_remove(corpora, ray_session, tmp_path):
    root, a, b, _ = corpora
    vdir = str(tmp_path / "v")
    create_view(vdir, "lview",
                {"docs_a": LinkDef(source=a, fields={"text": {"analyzers": ["text"]}})},
                num_partitions=2)
    base = ViewSearcher(vdir).search_local(F.Term("text", "the"), k=20)
    assert set(base["collection"]) == {"docs_a"}

    update_links(vdir, add={"docs_b": LinkDef(source=b, fields={"text": {"analyzers": ["text"]}})},
                 num_partitions=2)
    both = ViewSearcher(vdir).search_local(F.Term("text", "the"), k=20)
    assert set(both["collection"]) == {"docs_a", "docs_b"}
    assert set(load_view(vdir)["links"]) == {"docs_a", "docs_b"}

    update_links(vdir, remove=["docs_b"])
    back = ViewSearcher(vdir).search_local(F.Term("text", "the"), k=20)
    assert _frame_key(back) == _frame_key(base)
    assert not os.path.exists(os.path.join(vdir, "links", "docs_b", "MANIFEST"))
    # re-adding after remove is legal (orphan-dir tolerance)
    update_links(vdir, add={"docs_b": LinkDef(source=b, fields={"text": {"analyzers": ["text"]}})},
                 num_partitions=2)
    again = ViewSearcher(vdir).search_local(F.Term("text", "the"), k=20)
    assert _frame_key(again) == _frame_key(both)


def test_refresh_link_appends(corpora, ray_session, tmp_path):
    root, a, b, b2 = corpora
    vdir = str(tmp_path / "v")
    create_view(vdir, "rview", {
        "docs_b": LinkDef(source=b, fields={"text": {"analyzers": ["text"]}}),
    }, num_partitions=2)
    pre = ViewSearcher(vdir).search_local(F.Term("text", "the"), k=1000)
    refresh_link(vdir, "docs_b", b2, num_partitions=1)
    post = ViewSearcher(vdir).search_local(F.Term("text", "the"), k=1000)
    pre_max = pre["conv_id"].str.slice(5).astype(int).max()
    post_max = post["conv_id"].str.slice(5).astype(int).max()
    assert pre_max < 240 <= post_max  # new batch's convs are now served
    assert len(post) > len(pre) or post_max >= 240
    assert b2 in load_view(vdir)["links"]["docs_b"]["source"]


def test_per_link_analyzers(corpora, ray_session, tmp_path):
    """docs_a indexes text with the stemming text analyzer, docs_b with the
    plain one — a stemmed term matches only through docs_a's link config."""
    root, a, b, _ = corpora
    vdir = str(tmp_path / "v")
    create_view(vdir, "aview", {
        "docs_a": LinkDef(source=a, fields={"text": {
            "analyzers": ["text"], "analyzer_opts": {"stemmer": True}}}),
        "docs_b": LinkDef(source=b, fields={"text": {"analyzers": ["text"]}}),
    }, num_partitions=2)
    vs = ViewSearcher(vdir)
    # per-link IndexConfig derivation recorded in each sub-index manifest
    from iresearch_ray.state.manifest import load_manifest

    assert load_manifest(os.path.join(vdir, "links", "docs_a"))["config"]["analyzer_opts"] == {"stemmer": True}
    assert load_manifest(os.path.join(vdir, "links", "docs_b"))["config"]["analyzer_opts"] == {}
    # "queries" stems to "queri": present only under the stem link
    got = vs.search_local(F.Term("text", "queri"), k=50)
    assert len(got) > 0 and set(got["collection"]) == {"docs_a"}
    vs.close()


def test_consolidate_view_invariance(corpora, ray_session, tmp_path):
    root, a, b, _ = corpora
    vdir = str(tmp_path / "v")
    create_view(vdir, "cview", {
        "docs_a": LinkDef(source=a, fields={"text": {"analyzers": ["text"]}}),
        "docs_b": LinkDef(source=b, fields={"text": {"analyzers": ["text"]}}),
    }, num_partitions=3,
        properties={"consolidation_policy": {"type": "count", "threshold": 2}})
    pre = ViewSearcher(vdir).search_local(F.Term("text", "the"), k=30)
    consolidate_view(vdir)
    post = ViewSearcher(vdir).search_local(F.Term("text", "the"), k=30)
    assert _frame_key(pre) == _frame_key(post)
    assert list(pre["collection"]) == list(post["collection"])


def test_multiterm_expansion_unions_links(corpora, ray_session, tmp_path):
    """Wildcard/fuzzy expansion consults the VIEW dictionary (union of all
    links): a term present in only one collection still expands and scores
    with view-global df."""
    root, a, b, _ = corpora
    vdir = str(tmp_path / "v")
    create_view(vdir, "wview", {
        "docs_a": LinkDef(source=a, fields={"text": {"analyzers": ["text"]}}),
        "docs_b": LinkDef(source=b, fields={"text": {"analyzers": ["text"]}}),
    }, num_partitions=2)
    vs = ViewSearcher(vdir)
    wide = vs.search_local(F.Prefix("text", "t"), k=40)
    assert set(wide["collection"]) == {"docs_a", "docs_b"}
    # ViewStats df = sum of link dfs
    per_link = [c.term_df("text", "the") for c in vs.stats.children]
    assert vs.stats.term_df("text", "the") == sum(per_link) and all(d > 0 for d in per_link)
    vs.close()


def test_link_config_derivation(corpora):
    root, a, b, _ = corpora
    cfg = link_config(LinkDef(
        source=a,
        fields={"text": {"analyzers": ["ngram"], "analyzer_opts": {"min": 2, "max": 2}},
                "role": {"analyzers": ["identity"]},
                "tool": {"analyzers": ["keyword"]},
                "turn_idx": {"analyzers": ["numeric"]}},
        store_values="none",
    ))
    assert cfg.analyzer == "ngram" and cfg.analyzer_opts == {"min": 2, "max": 2}
    assert set(cfg.keyword_fields) == {"role", "tool"}
    assert cfg.numeric_fields == ("turn_idx",) and cfg.store_text is False

    # include_all_fields classifies leftover columns by parquet type
    cfg2 = link_config(LinkDef(source=a, fields={"text": {"analyzers": ["text"]}},
                               include_all_fields=True))
    assert "role" in cfg2.keyword_fields and "tool" in cfg2.keyword_fields
    assert "ts" not in cfg2.keyword_fields  # timestamps not indexed

    with pytest.raises(ValueError):  # two analyzed text fields
        link_config(LinkDef(source=a, fields={"text": {"analyzers": ["text"]},
                                              "role": {"analyzers": ["stem"]}}))
    with pytest.raises(ValueError):  # unknown field
        link_config(LinkDef(source=a, fields={"nope": {"analyzers": ["text"]}}))
    with pytest.raises(ValueError):  # unknown analyzer
        link_config(LinkDef(source=a, fields={"text": {"analyzers": ["martian"]}}))


def test_merge_sum_and_viewstats_units():
    t1 = np.array(["a", "b", "c"], dtype=object)
    t2 = np.array(["b", "d"], dtype=object)
    terms, dfs = _merge_sum([(t1, np.array([1, 2, 3])), (t2, np.array([10, 5]))])
    assert list(terms) == ["a", "b", "c", "d"] and list(dfs) == [1, 12, 3, 5]
    terms, dfs = _merge_sum([])
    assert terms.size == 0 and dfs.size == 0

    class _Fake:
        lazy = False
        field_stats = {"text": {"docs_with_field": 10, "total_term_freq": 50}}

    vs = ViewStats([_Fake(), _Fake()])
    N, avg = vs.field("text")
    assert N == 20 and avg == 5.0
    assert vs.field("absent") == (0.0, 1.0)


def test_encrypted_view_composes(corpora, ray_session, tmp_path):
    """Views pass crypto through every lifecycle stage: an encrypted view
    builds, searches, consolidates — and a wrong key fails loudly."""
    from iresearch_ray import IndexEncryption

    root, a, b, _ = corpora
    key = IndexEncryption(b"k" * 32)
    vdir = str(tmp_path / "v")
    create_view(vdir, "eview", {
        "docs_a": LinkDef(source=a, fields={"text": {"analyzers": ["text"]}}),
        "docs_b": LinkDef(source=b, fields={"text": {"analyzers": ["text"]}}),
    }, num_partitions=2, crypto=key,
        properties={"consolidation_policy": {"type": "count", "threshold": 2}})
    vs = ViewSearcher(vdir, crypto=key)
    pre = vs.search_local(F.Term("text", "the"), k=15)
    assert len(pre) == 15 and set(pre["collection"]) == {"docs_a", "docs_b"}
    vs.close()
    consolidate_view(vdir, crypto=key)
    post = ViewSearcher(vdir, crypto=key).search_local(F.Term("text", "the"), k=15)
    assert _frame_key(pre) == _frame_key(post)
    with pytest.raises(Exception):
        ViewSearcher(vdir, crypto=IndexEncryption(b"x" * 32)).search_local(
            F.Term("text", "the"), k=5)
    with pytest.raises(Exception):  # no key at all
        ViewSearcher(vdir).search_local(F.Term("text", "the"), k=5)


def test_collections_restriction_and_view_highlights(corpora, ray_session, tmp_path):
    """collections= prunes whole sub-indexes (scores stay view-global);
    view highlights merge per-link spans under the view tie-break."""
    root, a, b, _ = corpora
    vdir = str(tmp_path / "v")
    create_view(vdir, "hview", {
        "docs_a": LinkDef(source=a, fields={"text": {"analyzers": ["text"]}}),
        "docs_b": LinkDef(source=b, fields={"text": {"analyzers": ["text"]}}),
    }, num_partitions=2)
    vs = ViewSearcher(vdir)

    only_a = vs.search_local(F.Term("text", "the"), k=10, collections=["docs_a"])
    assert set(only_a["collection"]) == {"docs_a"}
    # same docs as the full search filtered to docs_a's members (view-global
    # scores are unchanged by the restriction: top-10 of docs_a's hits)
    full = vs.search_local(F.Term("text", "the"), k=1000)
    want = full[full["collection"] == "docs_a"].head(10).reset_index(drop=True)
    assert _frame_key(only_a) == _frame_key(want)
    with pytest.raises(KeyError):
        vs.search_local(F.Term("text", "the"), k=5, collections=["nope"])
    pooled_a = vs.search_pooled({"q": F.Term("text", "the")}, k=10,
                                num_actors=2, collections=["docs_a"])
    assert _frame_key(pooled_a) == _frame_key(only_a)

    hl = vs.highlights(F.Term("text", "the"), k=10)
    top = vs.search_local(F.Term("text", "the"), k=10)
    assert _frame_key(hl) == _frame_key(top)  # same docs, same order
    spans_col = [c for c in hl.columns if "span" in c or "offset" in c or "highlight" in c]
    assert spans_col, f"no spans column in {list(hl.columns)}"
    assert hl[spans_col[0]].map(len).gt(0).all()
    vs.close()


def test_view_pool_actor_budget(corpora, ray_session, tmp_path):
    """search_pooled's num_actors is a VIEW-level budget split across links:
    a 4-link view with num_actors=4 must allocate at most 4 pool actors in
    total (one per link), not 4 per link."""
    root, a, *_ = corpora
    import pyarrow.parquet as _pq

    tbl = _pq.read_table(a)
    quarter = max(1, tbl.num_rows // 4)
    links = {}
    for i in range(4):
        p = str(tmp_path / f"part{i}.parquet")
        _pq.write_table(tbl.slice(i * quarter, quarter), p)
        links[f"l{i}"] = LinkDef(source=p, fields={"text": {"analyzers": ["text"]}})
    vdir = str(tmp_path / "v")
    create_view(vdir, "budget_view", links, num_partitions=1)
    vs = ViewSearcher(vdir)
    budget = 4
    pooled = vs.search_pooled({"q": F.Term("text", "the")}, k=10, num_actors=budget)
    total = sum(len(s._pool.actors) for s in vs.searchers.values() if s._pool)
    assert total <= budget, f"{total} actors allocated for budget {budget}"
    # correctness under the shared budget: pooled == local fan-out
    local = vs.search_local(F.Term("text", "the"), k=10)
    assert _frame_key(pooled) == _frame_key(local)
    vs.close()


def test_refresh_link_change_capture(corpora, ray_session, tmp_path):
    """Full change-stream tick (inserts + updates + deletes) on a linked
    collection: after consolidation purges the tombstones, the view must be
    indistinguishable from a view rebuilt over the logically-equal table."""
    import pyarrow as pa
    import pyarrow.parquet as _pq

    root, a, b, b2 = corpora
    vdir = str(tmp_path / "v")
    create_view(vdir, "ccview", {
        "docs_b": LinkDef(source=b, fields={"text": {"analyzers": ["text"]}}),
    }, num_partitions=2)

    tbl = _pq.read_table(b)
    extra = _pq.read_table(b2)
    # change stream: update 5 turns' text, delete 7 other turns, append b2
    upd_rows = tbl.slice(0, 5).to_pylist()
    for r in upd_rows:
        r["text"] = "zzupdated sentinel corpus text " + r["conv_id"]
    updates = pa.Table.from_pylist(upd_rows, schema=tbl.schema)
    del_keys = [(tbl["conv_id"][i].as_py(), tbl["turn_idx"][i].as_py())
                for i in range(5, 12)]

    out = refresh_link(vdir, "docs_b", b2, num_partitions=1,
                       updates=updates, deletes=del_keys)
    assert set(out) == {"append", "update", "delete"}
    consolidate_view(vdir)  # purge tombstones so stats equal a rebuild

    # the logically-equal collection, rebuilt from scratch
    key = {(r["conv_id"], r["turn_idx"]) for r in upd_rows}
    dead = set(del_keys)
    kept = [r for r in tbl.to_pylist()
            if (r["conv_id"], r["turn_idx"]) not in key | dead]
    logical = pa.Table.from_pylist(kept + upd_rows + extra.to_pylist(),
                                   schema=tbl.schema)
    lp = str(tmp_path / "logical.parquet")
    _pq.write_table(logical, lp)
    rdir = str(tmp_path / "rebuilt")
    create_view(rdir, "ccview2", {
        "docs_b": LinkDef(source=lp, fields={"text": {"analyzers": ["text"]}}),
    }, num_partitions=2)

    got_s, want_s = ViewSearcher(vdir), ViewSearcher(rdir)
    for flt in (F.Term("text", "the"), F.Term("text", "zzupdated"),
                F.Prefix("text", "err")):
        got = got_s.search_local(flt, k=500)
        want = want_s.search_local(flt, k=500)
        assert _frame_key(got) == _frame_key(want)
    # deletes are gone, updates replaced (old text unmatchable)
    hit = got_s.search_local(F.Term("text", "zzupdated"), k=100)
    assert set(zip(hit["conv_id"], hit["turn_idx"])) == key
    got_s.close(); want_s.close()

    # lineage compaction: many ticks under a small cap never grow the list
    before = len(load_view(vdir)["links"]["docs_b"]["source"])
    for i in range(4):
        p = str(tmp_path / f"tick{i}.parquet")
        _pq.write_table(extra.slice(0, 1), p)
        refresh_link(vdir, "docs_b", p, num_partitions=1, source_lineage_max=3)
    link = load_view(vdir)["links"]["docs_b"]
    assert len(link["source"]) <= 3
    assert link["source_compacted"] >= before + 4 - 3
