"""Gopher-rule filter, repetition stats, decontamination, and PII scrub —
each vs an independent pure-python brute-force oracle on sf0.001.
Reference semantics: Gopher (Rae et al. 2021) / C4 (Raffel et al. 2020)
rule families; SURVEY.md lists curation ops as first-class components."""

from collections import Counter

import numpy as np
import pyarrow.parquet as pq
import pytest

from iresearch_ray.pipelines import dataops as ops

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_tbl():
    return pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])


def _ds(tbl, ray_session):
    import ray.data as rd

    return rd.from_arrow(tbl)


def test_gopher_rules_brute(docs_tbl, ray_session):
    out = ops.gopher_rules(_ds(docs_tbl, ray_session)).to_pandas().set_index("doc_id")
    saw_pass = saw_fail = False
    for r in docs_tbl.to_pylist():
        w = r["text"].split(" ")
        n = len(w)
        ml = sum(len(x) for x in w) / n
        af = sum(1 for x in w if any(c.isalpha() for c in x)) / n
        sh = sum(1 for x in w if x in ops.STOPWORDS)
        row = out.loc[r["doc_id"]]
        assert row["n_words"] == n
        assert abs(row["mean_word_len"] - float(ops.round_half_away(np.array([ml]), 4)[0])) < 1e-9
        assert abs(row["alpha_frac"] - float(ops.round_half_away(np.array([af]), 4)[0])) < 1e-9
        assert row["stop_hits"] == sh
        exp = int(25 <= n <= 100_000 and 3.0 <= ml <= 10.0 and af >= 0.8 and sh >= 2)
        assert row["pass_gopher"] == exp
        saw_pass |= exp == 1
        saw_fail |= exp == 0
    # the fixture corpus must exercise both branches
    assert saw_pass and saw_fail


def test_repetition_stats_brute(docs_tbl, ray_session):
    out = ops.repetition_stats(_ds(docs_tbl, ray_session)).to_pandas().set_index("doc_id")
    for r in docs_tbl.to_pylist():
        w = r["text"].split(" ")
        grams = [f"{a} {b}" for a, b in zip(w, w[1:])]
        row = out.loc[r["doc_id"]]
        assert row["n_ngrams"] == len(grams)
        if grams:
            c = Counter(grams)
            top = max(c.values())
            dup = sum(v for v in c.values() if v > 1)
            assert abs(row["top_ngram_frac"] - float(ops.round_half_away(np.array([top / len(grams)]), 4)[0])) < 1e-9
            assert abs(row["dup_ngram_frac"] - float(ops.round_half_away(np.array([dup / len(grams)]), 4)[0])) < 1e-9
        else:
            assert row["top_ngram_frac"] == 0.0


def test_repetition_degenerate_short_docs(ray_session):
    import pyarrow as pa

    tbl = pa.table({"doc_id": [0, 1, 2], "text": ["solo", "x x x x", None]})
    out = (
        ops.repetition_stats(_ds(tbl, ray_session)).to_pandas().set_index("doc_id").sort_index()
    )
    assert out.loc[0, "n_ngrams"] == 0 and out.loc[0, "top_ngram_frac"] == 0.0
    # "x x x x" -> 3 identical 2-grams: top = dup = 1.0
    assert out.loc[1, "n_ngrams"] == 3
    assert out.loc[1, "top_ngram_frac"] == 1.0 and out.loc[1, "dup_ngram_frac"] == 1.0
    assert out.loc[2, "n_ngrams"] == 0  # null text == empty


def test_decontaminate_brute(docs_tbl, ray_session):
    rows = docs_tbl.to_pylist()
    bench = set()
    for r in rows:
        if r["doc_id"] % 13 == 0:
            w = r["text"].split(" ")
            for j in range(2, 6):
                if j + 5 <= len(w):
                    bench.add(" ".join(w[j : j + 5]))
    out = (
        ops.decontaminate(_ds(docs_tbl, ray_session), bench, n=5)
        .to_pandas()
        .set_index("doc_id")
    )
    hit_any = False
    for r in rows:
        w = r["text"].split(" ")
        grams = {" ".join(w[i : i + 5]) for i in range(len(w) - 4)}
        exp = len(grams & bench)
        row = out.loc[r["doc_id"]]
        assert row["n_contaminated"] == exp
        assert row["contaminated"] == int(exp > 0)
        hit_any |= exp > 0
    assert hit_any  # the contributing docs at least flag themselves


def test_pii_scrub_brute(ray_session):
    import pyarrow as pa
    import re

    texts = [
        "mail me at jo.doe+x@sub.example.org thanks",
        "two: a@b.co and c_d%e@f-g.io end",
        "server 192.168.0.1 and 10.0.0.255 up",
        "no pii here at all",
        "mixed bob@x.yz on 8.8.8.8",
        None,
    ]
    tbl = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    out = ops.pii_scrub(_ds(tbl, ray_session)).to_pandas().set_index("doc_id").sort_index()
    email = re.compile(ops.PII_EMAIL)
    ipv4 = re.compile(ops.PII_IPV4)
    for i, t in enumerate(texts):
        t = t or ""
        assert out.loc[i, "n_emails"] == len(email.findall(t))
        assert out.loc[i, "n_ipv4"] == len(ipv4.findall(t))
        assert out.loc[i, "redacted"] == ipv4.sub("<IP>", email.sub("<EMAIL>", t))
    assert out.loc[4, "redacted"] == "mixed <EMAIL> on <IP>"
