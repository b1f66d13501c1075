"""Highlighting — character offsets for matched query terms (SURVEY §2.1
token attributes [U core/analysis/token_attributes.hpp — offset]).

Design decision (100 TB rationale): offsets are NOT materialized in the
posting format.  They are recomputed at highlight time from the stored
``text`` column (present anyway for per-turn equality verification,
IndexConfig.store_text) by re-running the pinned tokenizer with span
tracking.  Storing start/end alongside every position would roughly double
the positions blob across the whole index for a feature that only ever
touches the k documents a user actually views; recompute is O(doc length)
per displayed doc and exactly consistent with the indexed positions because
it IS the same tokenizer.  Offsets are exact for ASCII text (where NFC +
lower are length-preserving — the §2.1.1 pinned regime); for non-ASCII
input the spans index the normalized string.
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


def highlights(
    searcher,
    flt,
    k: int = 10,
    scorer=None,
    field: str = "text",
) -> pd.DataFrame:
    """Top-k search + per-hit highlight spans from the stored text column:
    (conv_id, turn_idx, score, text, spans) where spans = [(start, end), …]
    for every token matching a query term of ``field``.  Requires the index
    to be built with store_text=True."""
    import numpy as np

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
