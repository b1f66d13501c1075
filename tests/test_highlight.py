"""Highlight offsets — goldens on hand-built docs (SURVEY §2.1 token
attributes / VERDICT r1 'highlight-grade positions → offsets').  Offsets are
recomputed from stored text by the pinned tokenizer, so they are asserted
exactly against hand-counted character positions."""

import pyarrow as pa
import pytest

from iresearch_ray.functions.highlight import highlight_text, plan_terms, token_spans
from iresearch_ray.pipelines.build import build_index_local
from iresearch_ray.pipelines.search import Searcher
from iresearch_ray.query import filters as F


def test_token_spans_golden():
    text = "The quick  brown-fox jumps"
    spans = token_spans(text)
    assert spans == [
        (0, 3, "the"),
        (4, 9, "quick"),
        (11, 16, "brown"),
        (17, 20, "fox"),
        (21, 26, "jumps"),
    ]
    # span slices recover the original (case-insensitively)
    for s, e, tok in spans:
        assert text[s:e].lower() == tok


def test_highlight_text_golden():
    text = "error in agent plan: agent retries"
    assert highlight_text(text, {"agent"}) == [(9, 14), (21, 26)]
    assert highlight_text(text, {"agent", "error"}) == [(0, 5), (9, 14), (21, 26)]
    assert highlight_text(text, {"absent"}) == []
    assert highlight_text(None, {"agent"}) == []


def test_plan_terms_walk(tmp_path):
    rows = [
        {"conv_id": "c0", "turn_idx": 0, "text": "alpha beta gamma", "role": "user", "tool": None},
        {"conv_id": "c0", "turn_idx": 1, "text": "beta delta beta", "role": "asst", "tool": None},
        {"conv_id": "c1", "turn_idx": 0, "text": "gamma alpha alpha", "role": "user", "tool": None},
    ]
    tbl = pa.Table.from_pylist(rows)
    d = str(tmp_path / "idx")
    build_index_local(tbl, d, num_partitions=1)
    s = Searcher(d)
    plan = s.prepare(F.Or((F.Term("text", "alpha"), F.Prefix("text", "ga")))).plan
    assert plan_terms(plan["root"], "text") == {"alpha", "gamma"}
    plan2 = s.prepare(F.Phrase("text", ("beta", F.Prefix("text", "de")))).plan
    assert plan_terms(plan2["root"], "text") == {"beta", "delta"}


def test_highlights_end_to_end(tmp_path):
    rows = [
        {"conv_id": "c0", "turn_idx": 0, "text": "alpha beta gamma", "role": "user", "tool": None},
        {"conv_id": "c0", "turn_idx": 1, "text": "beta delta beta", "role": "asst", "tool": None},
        {"conv_id": "c1", "turn_idx": 0, "text": "gamma alpha alpha", "role": "user", "tool": None},
    ]
    tbl = pa.Table.from_pylist(rows)
    d = str(tmp_path / "idx")
    build_index_local(tbl, d, num_partitions=2)
    s = Searcher(d)
    out = s.highlights(F.Term("text", "alpha"), k=10)
    got = {
        (r.conv_id, r.turn_idx): r.spans for r in out.itertuples()
    }
    assert got == {
        ("c0", 0): [(0, 5)],
        ("c1", 0): [(6, 11), (12, 17)],
    }
    # every span slices to the matched token in the original text
    for r in out.itertuples():
        for a, b in r.spans:
            assert r.text[a:b].lower() == "alpha"
