"""Highlighting — character offsets for matched query terms (SURVEY §2.1
token attributes [U core/analysis/token_attributes.hpp — offset]).

Two sources, same output:

- ``source="stored"`` (default): offsets are recomputed at highlight time
  from the stored ``text`` column (present anyway for per-turn equality
  verification, IndexConfig.store_text) by re-running the pinned tokenizer
  with span tracking.  100 TB rationale: storing start/end alongside every
  position roughly doubles the positions blob across the whole index for a
  feature that only ever touches the k documents a user actually views;
  recompute is O(doc length) per displayed doc and exactly consistent with
  the indexed positions because it IS the same tokenizer.
- ``source="index"``: offsets are read straight from the postings — the
  reference's ``offs`` index feature.  Requires the index built with
  ``IndexConfig(offsets=True)``; pays the bigger index for O(block) span
  reads with no stored text needed (the right trade when text is NOT
  stored, or when highlight volume is high enough that re-tokenization
  dominates).  Both sources are span-identical on the same index (asserted
  in tests/test_offsets.py).

Offsets are exact for ASCII text (where NFC + lower are length-preserving —
the §2.1.1 pinned regime); for non-ASCII input the spans index the
normalized string.
"""

from __future__ import annotations

import pandas as pd

from iresearch_ray.functions.analysis import _WORD_RE, _nfc_lower


def token_spans(text: str | None) -> list[tuple[int, int, str]]:
    """(start, end, normalized_token) for every token of the pinned `text`
    analyzer, in position order — span i corresponds to position i."""
    if text is None:
        return []
    return [(m.start(), m.end(), m.group()) for m in _WORD_RE.finditer(_nfc_lower(text))]


def plan_terms(node: dict, field: str) -> set[str]:
    """Collect every term of a prepared plan that touches ``field`` —
    term leaves, unscored multiterm remainders, granular-range trie terms,
    phrase/same-position parts."""
    out: set[str] = set()
    op = node.get("op")
    if op == "term" and node.get("field") == field:
        out.add(node["term"])
    elif op in ("unscored_terms", "filter_union", "same_position") and node.get("field") == field:
        out.update(node.get("terms", ()))
    elif op == "phrase" and node.get("field") == field:
        for slot in node.get("parts") or [[t] for t in node.get("terms", ())]:
            out.update(slot)
    elif op == "ngram_similarity" and node.get("field") == field:
        out.update(node.get("terms", ()))
    elif op == "union" or op == "and":
        for c in node.get("children", ()):
            out |= plan_terms(c, field)
    elif op == "not":
        # only the positive side produces visible matches
        out |= plan_terms(node.get("positive", {}), field)
    elif op == "nested":
        out |= plan_terms(node.get("child", {}), field)
    return out


def highlight_text(text: str | None, terms: set[str]) -> list[tuple[int, int]]:
    """Character (start, end) spans of tokens whose normalized form is in
    ``terms``, in document order."""
    return [(s, e) for s, e, t in token_spans(text) if t in terms]


def _index_doc_spans(reader, row: int, doc_id: int) -> list[tuple[int, int]]:
    """One term's (start, end) spans in one doc, read from the indexed
    offset stream: locate the doc's block via the skip table, decode only
    that block's offsets, slice the doc's occurrences."""
    import numpy as np

    from iresearch_ray.functions.codec import decode_offsets, decode_postings

    t = reader.terms
    docs_all, tfs_all = reader.cached_postings(
        row,
        lambda: decode_postings(
            t["doc_blob"][row].as_py(),
            np.asarray(t["block_doc_count"][row].as_py(), dtype=np.int64),
        ),
    )
    i = int(np.searchsorted(docs_all, doc_id))
    if i >= docs_all.size or docs_all[i] != doc_id:
        return []
    off_blob = t["off_blob"][row].as_py()
    if not off_blob:
        raise ValueError(
            "highlights(source='index') needs the index built with "
            "IndexConfig(offsets=True)"
        )
    block_cnt = np.asarray(t["block_doc_count"][row].as_py(), dtype=np.int64)
    off_off = np.asarray(t["off_off"][row].as_py(), dtype=np.int64)
    cum = np.cumsum(block_cnt)
    b = int(np.searchsorted(cum, i, side="right"))
    starts, ends = decode_offsets(
        off_blob, off_off, tfs_all, b, block_cnt.size, block_cnt
    )
    s_doc = int(cum[b - 1]) if b > 0 else 0
    occ_lo = int(tfs_all[s_doc:i].sum())
    occ_hi = occ_lo + int(tfs_all[i])
    return list(zip(starts[occ_lo:occ_hi].tolist(), ends[occ_lo:occ_hi].tolist()))


def highlights(
    searcher,
    flt,
    k: int = 10,
    scorer=None,
    field: str = "text",
    source: str = "stored",
) -> pd.DataFrame:
    """Top-k search + per-hit highlight spans:
    (conv_id, turn_idx, score, text, spans) where spans = [(start, end), …]
    for every token matching a query term of ``field``.

    ``source="stored"`` re-tokenizes the stored text column (needs
    store_text=True); ``source="index"`` reads the indexed offset stream
    (needs offsets=True) — span-identical outputs (see module docstring)."""
    import numpy as np

    if source == "index":
        return _highlights_from_index(searcher, flt, k, scorer, field)
    plan = searcher.prepare(flt, scorer).plan
    terms = plan_terms(plan["root"], field)
    hits = searcher.search_local(flt, k=k, scorer=scorer)
    texts: list[str | None] = []
    spans: list[list[tuple[int, int]]] = []
    readers = searcher._local_readers()
    # the stored column carries the configured text field's name
    stored_col = field
    if readers and any(stored_col not in r.docs.column_names for r in readers):
        raise ValueError(
            f"highlights() needs the index built with store_text=True "
            f"(stored column {stored_col!r} missing)"
        )
    def _key_view(r):
        # cached (perm, sorted conv, sorted turn): concat-merged segments
        # are NOT globally key-sorted, so binary search needs the lexsort
        # permutation (built once per reader, O(log n) per hit after)
        kv = getattr(r, "_hl_key_view", None)
        if kv is None:
            conv_all, turn_all = r.doc_keys
            perm = np.lexsort((turn_all, conv_all))
            kv = (perm, conv_all[perm], turn_all[perm])
            r._hl_key_view = kv
        return kv

    for row in hits.itertuples():
        text = None
        for r in readers:
            perm, sc, st = _key_view(r)
            lo = int(np.searchsorted(sc, row.conv_id, side="left"))
            hi = int(np.searchsorted(sc, row.conv_id, side="right"))
            if lo == hi:
                continue
            j = lo + int(np.searchsorted(st[lo:hi], row.turn_idx))
            if j < hi and st[j] == row.turn_idx:
                text = r.docs[stored_col][int(perm[j])].as_py()
                break
        texts.append(text)
        spans.append(highlight_text(text, terms))
    out = hits.copy()
    out["text"] = texts
    out["spans"] = spans
    return out


def _highlights_from_index(searcher, flt, k, scorer, field) -> pd.DataFrame:
    """Index-served spans: resolve each query term's row once per segment,
    then per hit read only the doc's offset block — no stored text touched.
    The ``text`` column is populated when stored, else None."""
    import numpy as np

    plan = searcher.prepare(flt, scorer).plan
    terms = sorted(plan_terms(plan["root"], field))
    hits = searcher.search_local(flt, k=k, scorer=scorer)
    readers = searcher._local_readers()
    if readers and not readers[0].meta.get("config", {}).get("offsets"):
        raise ValueError(
            "highlights(source='index') needs the index built with "
            "IndexConfig(offsets=True)"
        )
    # per reader: term rows resolved once, doc-key lexsort view cached
    term_rows = [
        {t: r.term_row(field, t) for t in terms} for r in readers
    ]

    def _key_view(r):
        kv = getattr(r, "_hl_key_view", None)
        if kv is None:
            conv_all, turn_all = r.doc_keys
            perm = np.lexsort((turn_all, conv_all))
            kv = (perm, conv_all[perm], turn_all[perm])
            r._hl_key_view = kv
        return kv

    texts: list[str | None] = []
    spans: list[list[tuple[int, int]]] = []
    for row_t in hits.itertuples():
        doc_spans: list[tuple[int, int]] = []
        text = None
        for ri, r in enumerate(readers):
            perm, sc, st = _key_view(r)
            lo = int(np.searchsorted(sc, row_t.conv_id, side="left"))
            hi = int(np.searchsorted(sc, row_t.conv_id, side="right"))
            if lo == hi:
                continue
            j = lo + int(np.searchsorted(st[lo:hi], row_t.turn_idx))
            if j >= hi or st[j] != row_t.turn_idx:
                continue
            doc_id = int(perm[j]) + 1  # docs are doc-id ordered, ids dense from 1
            for t in terms:
                trow = term_rows[ri].get(t)
                if trow is not None:
                    doc_spans += _index_doc_spans(r, trow, doc_id)
            if field in r.docs.column_names:
                text = r.docs[field][int(perm[j])].as_py()
            break
        texts.append(text)
        spans.append(sorted(doc_spans))
    out = hits.copy()
    out["text"] = texts
    out["spans"] = spans
    return out
