"""Shuffle-based wide merge with salted hot terms — equivalence with the
single-task k-way merge (same queries, same results)."""

import pytest

from iresearch_ray import Searcher, build_index
from iresearch_ray.query import filters as F
from iresearch_ray.sources.transcripts import gen_transcripts
from iresearch_ray.stages.shuffle_merge import merge_segments_shuffle
from iresearch_ray.state.manifest import commit_manifest, load_manifest


@pytest.fixture(scope="module")
def wide_idx(tmp_path_factory, ray_session):
    import ray.data as rd

    tbl = gen_transcripts(300)
    d = str(tmp_path_factory.mktemp("wide") / "idx")
    build_index(rd.from_arrow(tbl), d, num_partitions=12)
    return d


QUERIES = [
    F.Term("text", "the"),          # Zipf-hottest term — exercises the salt path
    F.Term("text", "agent"),
    F.Or((F.Term("text", "error"), F.Term("text", "plan")), min_match=1),
    F.Phrase("text", ("the", "a")),
    F.Prefix("text", "w00"),
]


def test_shuffle_merge_equals_unmerged(wide_idx):
    d = wide_idx
    before = [Searcher(d).search_local(q, k=25) for q in QUERIES]

    man = load_manifest(d)
    names = [s["name"] for s in man["segments"]]
    assert len(names) == 12
    # salt threshold low enough that hot-head terms (df ≈ docs/2) get salted
    meta = merge_segments_shuffle(d, names, man["generation"], hot_df_threshold=50, num_salts=4)
    assert meta["lineage"]["engine"] == "shuffle"
    commit_manifest(d, [meta], man["config"], lineage={"shuffle_merge": True})

    s = Searcher(d)
    assert len(s.seg_dirs) == 1
    for q, exp in zip(QUERIES, before):
        got = s.search_local(q, k=25).reset_index(drop=True)
        assert got.equals(exp.reset_index(drop=True)), q
        # wand parity holds on the concat-merged blobs too
        got0 = s.search_local(q, k=25, wand=False).reset_index(drop=True)
        assert got.equals(got0)
