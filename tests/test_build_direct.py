"""build_index_direct (two-stage hash exchange) — equivalence with the
Dataset-groupby build and resume semantics."""

import json
import os
import shutil

import pytest

from iresearch_ray import Searcher, build_index
from iresearch_ray.pipelines.build import build_index_direct
from iresearch_ray.query import filters as F
from iresearch_ray.sources.transcripts import write_transcripts


@pytest.fixture(scope="module")
def corpus(tmp_path_factory, ray_session):
    d = str(tmp_path_factory.mktemp("direct_src"))
    write_transcripts(d, n_convs=400, rows_per_file=900)
    return d


def test_direct_equals_groupby(corpus, tmp_path):
    files = [os.path.join(corpus, f) for f in sorted(os.listdir(corpus)) if f.endswith(".parquet")]
    a_dir, b_dir = str(tmp_path / "a"), str(tmp_path / "b")
    ma = build_index(files, a_dir, num_partitions=5, resume=False)
    mb = build_index_direct(files, b_dir, num_partitions=5, resume=False)
    assert ma["metrics"]["docs_count"] == mb["metrics"]["docs_count"]
    assert sorted(s["name"] for s in ma["segments"]) == sorted(
        s["name"] for s in mb["segments"]
    )  # content-hash segment names ⇒ identical partition contents
    a, b = Searcher(a_dir), Searcher(b_dir)
    for f in [
        F.Term("text", "agent"),
        F.Or((F.Term("text", "error"), F.Term("text", "plan")), min_match=1),
        F.Phrase("text", ("the", "a")),
        F.Prefix("text", "w00"),
    ]:
        ra = a.search_local(f, k=25).reset_index(drop=True)
        rb = b.search_local(f, k=25).reset_index(drop=True)
        assert ra.equals(rb), f


def test_direct_resume_skips_done(corpus, tmp_path):
    idx = str(tmp_path / "idx")
    m1 = build_index_direct(corpus, idx, num_partitions=4, resume=True)
    built1 = m1["lineage"]["built_partitions"]
    assert sorted(built1) == [0, 1, 2, 3]
    # simulate partial failure: drop the manifest and one segment
    os.remove(os.path.join(idx, "manifest.json"))
    victim = m1["segments"][0]["name"]
    shutil.rmtree(os.path.join(idx, "segments", victim))
    m2 = build_index_direct(corpus, idx, num_partitions=4, resume=True)
    assert m2["metrics"]["docs_count"] == m1["metrics"]["docs_count"]
    assert len(m2["lineage"]["built_partitions"]) == 1  # only the victim rebuilt
    assert len(m2["lineage"]["resumed_partitions"]) == 3
    assert sorted(s["name"] for s in m2["segments"]) == sorted(
        s["name"] for s in m1["segments"]
    )


def test_append_index_incremental(corpus, tmp_path, ray_session):
    """Incremental ingest: new batch → new segments appended in one
    generation; results equal a from-scratch build over the union."""
    import pyarrow.parquet as pq

    from iresearch_ray import Searcher
    from iresearch_ray.pipelines.build import append_index
    from iresearch_ray.pipelines.consolidate import consolidate
    from iresearch_ray.query import filters as F
    from iresearch_ray.sources.transcripts import gen_transcripts_range

    idx = str(tmp_path / "inc")
    build_index(corpus, idx, num_partitions=3)
    base_docs = Searcher(idx).manifest["docs_count"]

    batch_dir = str(tmp_path / "batch")
    os.makedirs(batch_dir)
    new_tbl = gen_transcripts_range(400, 460)  # conv ids disjoint from corpus (0..399)
    pq.write_table(new_tbl, f"{batch_dir}/new.parquet")

    m = append_index(batch_dir, idx, num_partitions=2)
    assert m["docs_count"] == base_docs + new_tbl.num_rows
    g1 = m["generation"]

    # idempotent re-append of the same batch: resume skips everything
    m2 = append_index(batch_dir, idx, num_partitions=2)
    assert m2["docs_count"] == m["docs_count"]
    assert {s["name"] for s in m2["segments"]} == {s["name"] for s in m["segments"]}

    # appended docs queryable; old docs unaffected
    s = Searcher(idx)
    out = s.search_local(F.Term("text", "the"), k=10_000_000)
    keys = set(zip(out["conv_id"], out["turn_idx"]))
    new_keys = {
        (c, t)
        for c, t, txt in zip(
            new_tbl["conv_id"].to_pylist(),
            new_tbl["turn_idx"].to_pylist(),
            new_tbl["text"].to_pylist(),
        )
        if "the" in txt.split(" ")
    }
    assert new_keys <= keys

    # consolidation folds batch segments; results invariant
    pre = s.search_local(F.Or((F.Term("text", "agent"), F.Term("text", "error"))), k=30)
    consolidate(idx, policy="count", policy_kwargs={"threshold": 1}, gc=True, repeat=True)
    post = Searcher(idx).search_local(
        F.Or((F.Term("text", "agent"), F.Term("text", "error"))), k=30
    )
    assert pre.reset_index(drop=True).equals(post.reset_index(drop=True))
