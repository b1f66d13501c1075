"""Regeneration script for the FIXTURES.md §2 golden BM25 numbers.

Computes the expected scores from the pinned formula (SURVEY §2.6) with
plain python floats — independent of both the engine and the numpy oracle.
Run directly to print the goldens; imported by test_golden_bm25.
"""

from __future__ import annotations

import math

CORPUS = [
    ("c1", 0, "quick brown fox jumps over the lazy dog"),
    ("c1", 1, "quick quick brown cat"),
    ("c2", 0, "the lazy dog sleeps"),
    ("c2", 1, "fox fox fox quick"),
    ("c3", 0, "wholly unrelated terms appear here only"),
]


def compute(terms: list[str], k1: float = 1.2, b: float = 0.75, k: int = 10):
    docs = [(c, t, x.split()) for c, t, x in CORPUS]
    N = len(docs)
    total_tf = sum(len(d[2]) for d in docs)
    avg_dl = total_tf / N
    out = []
    for c, t, toks in docs:
        dl = len(toks)
        score = 0.0
        matched = False
        for term in terms:
            tf = toks.count(term)
            if tf == 0:
                continue
            matched = True
            n = sum(1 for _, _, d in docs if term in d)
            idf = math.log(1.0 + (N - n + 0.5) / (n + 0.5))
            score += idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avg_dl))
        if matched:
            out.append((c, t, score))
    out.sort(key=lambda r: (-r[2], r[0], r[1]))
    return out[:k]


GOLDENS = {
    ("quick",): [("c1", 1, 0.792560), ("c2", 1, 0.595185), ("c1", 0, 0.441699)],
    ("fox",): [("c2", 1, 1.447307), ("c1", 0, 0.717433)],
    ("quick", "fox"): [("c2", 1, 2.042492), ("c1", 0, 1.159132), ("c1", 1, 0.792560)],
    ("lazy", "dog"): [("c2", 0, 1.933468), ("c1", 0, 1.434866)],
}
# BM15 (b=0): pins the (score-tie → doc-order) tie-break rule
GOLDEN_BM15_QUICK = [("c1", 1, 0.741120), ("c1", 0, 0.538997), ("c2", 1, 0.538997)]


if __name__ == "__main__":
    for terms in GOLDENS:
        print(terms, [(c, t, round(s, 6)) for c, t, s in compute(list(terms))])
    print("BM15 quick", [(c, t, round(s, 6)) for c, t, s in compute(["quick"], b=0.0)])
