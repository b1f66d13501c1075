"""BM25 golden tests — SURVEY §5.2 item 3 (the bm25_test analog).

engine == hand/machine-computed goldens == brute-force oracle, exact to 1e-6,
including the BM15 score-tie row that pins the doc-order tie-break.
"""

import pyarrow as pa
import pytest

from iresearch_ray.pipelines.build import build_index_local
from iresearch_ray.pipelines.search import Searcher
from iresearch_ray.query import filters as F
from iresearch_ray.query.filters import ScorerCfg
from iresearch_ray.query.oracle import BruteForceOracle
from tests.golden_bm25 import CORPUS, GOLDEN_BM15_QUICK, GOLDENS, compute


@pytest.fixture(scope="module")
def gold_index(tmp_path_factory):
    tbl = pa.table(
        {
            "conv_id": [c for c, _, _ in CORPUS],
            "turn_idx": pa.array([t for _, t, _ in CORPUS], pa.int32()),
            "role": ["user"] * len(CORPUS),
            "text": [x for _, _, x in CORPUS],
            "tool": pa.array([None] * len(CORPUS), pa.string()),
        }
    )
    d = str(tmp_path_factory.mktemp("goldidx"))
    build_index_local(tbl, d, num_partitions=1)
    return d, tbl


def _rows(df):
    return [(r.conv_id, r.turn_idx, pytest.approx(r.score, abs=1e-6)) for r in df.itertuples()]


@pytest.mark.parametrize("terms", list(GOLDENS))
def test_golden(gold_index, terms):
    d, tbl = gold_index
    s = Searcher(d)
    flt = (
        F.Term("text", terms[0])
        if len(terms) == 1
        else F.Or(tuple(F.Term("text", t) for t in terms))
    )
    got = _rows(s.search_local(flt, k=10))
    want = [(c, t, pytest.approx(sc, abs=1e-6)) for c, t, sc in GOLDENS[terms]]
    assert got == want
    # regeneration script agrees
    regen = [(c, t, pytest.approx(sc, abs=1e-6)) for c, t, sc in compute(list(terms))]
    assert got == regen
    # oracle agrees
    o = BruteForceOracle(tbl)
    assert _rows(o.search(flt, 10)) == want


def test_golden_bm15_tiebreak(gold_index):
    d, tbl = gold_index
    s = Searcher(d)
    got = _rows(s.search_local(F.Term("text", "quick"), k=10, scorer=ScorerCfg(b=0.0)))
    want = [(c, t, pytest.approx(sc, abs=1e-6)) for c, t, sc in GOLDEN_BM15_QUICK]
    assert got == want
    # tie resolved by doc order: (c1,0) before (c2,1)
    assert got[1][0] == "c1" and got[2][0] == "c2"


def test_boost(gold_index):
    d, tbl = gold_index
    s = Searcher(d)
    base = s.search_local(F.Term("text", "quick"), k=10)
    boosted = s.search_local(F.Term("text", "quick", boost=2.0), k=10)
    assert (boosted["score"].to_numpy() == 2.0 * base["score"].to_numpy()).all()


def test_custom_scorer_registry(tmp_path, ray_session):
    """SURVEY §2.11: a registered custom scorer runs end-to-end by name."""
    import numpy as np

    from iresearch_ray import Searcher, build_index_local
    from iresearch_ray.functions.score import register_scorer
    from iresearch_ray.query import filters as F
    from iresearch_ray.sources.transcripts import gen_transcripts

    register_scorer(
        "constant2",
        idf=lambda n, N: 2.0,
        tf_factor=lambda tf, dl, avg_dl, k1, b: np.ones_like(np.asarray(tf, dtype=np.float64)),
    )
    idx = str(tmp_path / "idx")
    build_index_local(gen_transcripts(30), idx, num_partitions=2)
    s = Searcher(idx)
    out = s.search_local(F.Term("text", "the"), k=50, scorer=F.ScorerCfg("constant2"))
    assert len(out) > 0
    assert (out["score"] == 2.0).all()  # boost(1) * idf(2) * tf_factor(1)
