"""assert_index analog — SURVEY §5.2 item 4.

Build an index over synthetic transcripts and deep-compare terms / df / cf /
postings / norms against an independently built pure-python inverted index
from the same rows.
"""

from collections import Counter, defaultdict

import numpy as np
import pytest

from iresearch_ray.functions.analysis import tokenize_text
from iresearch_ray.functions.codec import decode_postings
from iresearch_ray.pipelines.build import build_index_local, hash_partition
from iresearch_ray.sources.transcripts import gen_transcripts
from iresearch_ray.stages.segment import SegmentReader
from iresearch_ray.state.manifest import load_manifest, segment_dirs


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    tbl = gen_transcripts(60)
    d = str(tmp_path_factory.mktemp("idx"))
    build_index_local(tbl, d, num_partitions=4)
    return d, tbl


def _expected_segment_index(rows):
    """Pure-python reference index for one partition's rows."""
    rows = sorted(rows, key=lambda r: (r["conv_id"], r["turn_idx"]))
    postings = defaultdict(list)  # (field, term) -> [(doc_id, tf, positions)]
    dls = []
    for doc_id, r in enumerate(rows, start=1):
        toks = tokenize_text(r["text"])
        dls.append(len(toks))
        pos = defaultdict(list)
        for p, t in enumerate(toks):
            pos[t].append(p)
        for t, ps in pos.items():
            postings[("text", t)].append((doc_id, len(ps), ps))
        for kf in ("role", "tool"):
            if r[kf] is not None:
                postings[(kf, r[kf])].append((doc_id, 1, []))
    return rows, postings, dls


def test_assert_index(built):
    d, tbl = built
    manifest = load_manifest(d)
    all_rows = tbl.to_pylist()
    P = manifest["lineage"]["num_partitions"]
    parts = hash_partition([r["conv_id"] for r in all_rows], P)
    by_part = defaultdict(list)
    for r, p in zip(all_rows, parts):
        by_part[int(p)].append(r)

    seen_docs = 0
    for seg_dir in segment_dirs(d, manifest):
        reader = SegmentReader(seg_dir)
        part = reader.meta["lineage"]["partition"]
        rows, exp_postings, exp_dls = _expected_segment_index(by_part[part])
        # doc table: ids dense from 1, rows in (conv_id, turn_idx) order, dl exact
        docs = reader.docs
        assert docs["doc_id"].to_pylist() == list(range(1, len(rows) + 1))
        assert docs["conv_id"].to_pylist() == [r["conv_id"] for r in rows]
        assert docs["turn_idx"].to_pylist() == [r["turn_idx"] for r in rows]
        assert docs["dl"].to_pylist() == exp_dls
        # per-turn text equality under stable order (B input_hint)
        assert docs["text"].to_pylist() == [r["text"] for r in rows]
        # term dictionary + postings deep-compare
        terms_tbl = reader.terms
        got_terms = set(zip(terms_tbl["field"].to_pylist(), terms_tbl["term"].to_pylist()))
        assert got_terms == set(exp_postings)
        for i in range(terms_tbl.num_rows):
            key = (terms_tbl["field"][i].as_py(), terms_tbl["term"][i].as_py())
            exp = exp_postings[key]
            doc_ids, tfs = decode_postings(terms_tbl["doc_blob"][i].as_py())
            assert doc_ids.tolist() == [e[0] for e in exp]
            assert tfs.tolist() == [e[1] for e in exp]
            assert terms_tbl["df"][i].as_py() == len(exp)
            assert terms_tbl["cf"][i].as_py() == sum(e[1] for e in exp)
        seen_docs += len(rows)
    assert seen_docs == tbl.num_rows == manifest["docs_count"]


def test_field_stats_match(built):
    d, tbl = built
    manifest = load_manifest(d)
    texts = tbl["text"].to_pylist()
    dls = [len(tokenize_text(t)) for t in texts]
    total = {"docs_with_field": sum(1 for x in dls if x > 0), "total_term_freq": sum(dls)}
    acc = Counter()
    for seg in manifest["segments"]:
        for k, v in seg["field_stats"]["text"].items():
            acc[k] += v
    assert dict(acc) == total
