"""Payload read surface — the ``payload`` token attribute served back from
the posting format (SURVEY §2.1 token_attributes.hpp payload; indexed via
``IndexConfig(payloads=True)`` + the ``delimited_payload`` analyzer).

Two consumers:

- :func:`term_payloads` — every (doc, [payload bytes...]) of one term, the
  raw attribute access (what the reference exposes through its payload
  iterator).
- :func:`payload_sum_topk` — top-k docs by the SUM of a term's payloads
  parsed as floats (the public idiom is Lucene's PayloadScoreQuery with the
  sum function): payload-carried weights replace tf as the relevance
  signal.  Non-numeric payloads contribute 0 (documented, asserted in
  tests) rather than erroring, matching the skip-quietly behavior a mixed
  corpus needs.

Deletes are honored through the same tombstone masks the search path uses.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from iresearch_ray.functions.codec import decode_payloads, decode_postings


def _reader_term_payloads(reader, field: str, term: str):
    """One segment's (local doc ids, tfs, flat payload list) for a term."""
    row = reader.term_row(field, term)
    if row is None:
        return None
    t = reader.terms
    pay_blob = t["pay_blob"][row].as_py() if "pay_blob" in t.column_names else None
    if not pay_blob:
        raise ValueError(
            "payload access needs the index built with IndexConfig(payloads=True)"
        )
    cnt = np.asarray(t["block_doc_count"][row].as_py(), dtype=np.int64)
    pay_off = np.asarray(t["pay_off"][row].as_py(), dtype=np.int64)
    docs, tfs = reader.cached_postings(
        row,
        lambda: decode_postings(t["doc_blob"][row].as_py(), cnt),
    )
    pays: list[bytes] = []
    for b in range(cnt.size):
        pays += decode_payloads(pay_blob, pay_off, tfs, b, cnt.size, cnt)
    return docs, tfs, pays


def term_payloads(searcher, field: str, term: str) -> pd.DataFrame:
    """(conv_id, turn_idx, payloads) for every live doc containing ``term``
    — payloads in position order, as a list of bytes per row."""
    out_conv, out_turn, out_pays = [], [], []
    for i, r in enumerate(searcher._local_readers()):
        hit = _reader_term_payloads(r, field, term)
        if hit is None:
            continue
        docs, tfs, pays = hit
        deleted = searcher._deleted_for(i, r)
        conv_all, turn_all = r.doc_keys
        ends = np.cumsum(tfs)
        starts = ends - tfs
        for j in range(docs.size):
            d = int(docs[j])
            if deleted is not None and deleted[d - 1]:
                continue
            out_conv.append(conv_all[d - 1])
            out_turn.append(int(turn_all[d - 1]))
            out_pays.append(pays[int(starts[j]) : int(ends[j])])
    df = pd.DataFrame({"conv_id": out_conv, "turn_idx": out_turn, "payloads": out_pays})
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def payload_sum_topk(searcher, field: str, term: str, k: int = 10) -> pd.DataFrame:
    """Top-k (conv_id, turn_idx, score) where score = Σ float(payload) over
    the term's occurrences in the doc; ties broken by (conv_id, turn_idx)
    ascending — the same total order the BM25 path pins."""
    rows = term_payloads(searcher, field, term)

    def _score(pays: list[bytes]) -> float:
        s = 0.0
        for p in pays:
            try:
                s += float(p.decode("utf-8"))
            except (ValueError, UnicodeDecodeError):
                pass  # non-numeric payloads carry no weight
        return s

    rows["score"] = [_score(p) for p in rows["payloads"]]
    rows = rows.drop(columns=["payloads"])
    rows = rows.sort_values(
        ["score", "conv_id", "turn_idx"], ascending=[False, True, True]
    )
    return rows.head(k).reset_index(drop=True)
