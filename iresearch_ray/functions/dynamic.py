"""Dynamic JSON field flattening — SURVEY.md §1.1 "dynamic schema".

The reference indexes documents as arbitrary field bags; ArangoDB flattens
JSON paths into field names (``a.b[0].c`` — SURVEY §1.1 "Nested/map types
are not native — ArangoDB flattens JSON paths into field names").  This
module brings that capability to the pinned transcript model: an
``IndexConfig(json_fields=("props",))`` column holds a JSON document per
row, and every leaf becomes a dynamic field named ``<col>.<path>``:

* strings           → keyword terms on the dynamic field
* booleans          → canonical "true"/"false" tokens
* nulls             → canonical "null" token
* integers          → precision-trie terms (by_granular_range works)
* floats            → trie terms of the integer part when integral, else a
                      canonical repr keyword (documented: float ranges are
                      out of scope, matching the int-first trie in
                      functions/numeric.py)
* arrays            → each element indexed under the SAME field path
                      (ArangoDB ``[*]`` semantics)
* nested objects    → dotted path recursion

Parsing is per-row Python (json.loads) — the cost is opt-in and isolated
to configured columns; everything downstream (postings, stats, by_term /
by_granular_range evaluation) is the existing vectorized machinery, which
needs NO changes because dynamic fields are ordinary (field, term) rows
in the segment terms table.
"""

from __future__ import annotations

import json

import numpy as np

from iresearch_ray.functions.numeric import trie_terms


def flatten_json(doc) -> list[tuple[str, object]]:
    """(dotted-path, leaf-value) pairs for one parsed JSON value."""
    out: list[tuple[str, object]] = []

    def rec(prefix: str, v) -> None:
        if isinstance(v, dict):
            for k, sub in v.items():
                rec(f"{prefix}.{k}" if prefix else str(k), sub)
        elif isinstance(v, list):
            for sub in v:  # [*] semantics: every element under the same path
                rec(prefix, sub)
        else:
            out.append((prefix, v))

    rec("", doc)
    return out


def dynamic_postings(
    col_name: str, json_strings: list, n_rows: int
) -> tuple[dict[str, list[list[str]]], dict[str, tuple[np.ndarray, np.ndarray]]]:
    """Split one JSON column into per-dynamic-field token inputs.

    Returns ``(keyword_lists, numeric_cols)``: ``keyword_lists[field]`` is a
    per-row list of keyword tokens; ``numeric_cols[field]`` is ``(rows
    int64[], values int64[])`` occurrence pairs (a row may carry MULTIPLE
    values for one path — array leaves).  Rows with unparsable /
    non-object JSON contribute nothing (field absent)."""
    kw: dict[str, list[list[str]]] = {}
    num_pairs: dict[str, tuple[list, list]] = {}

    def kw_add(field: str, row: int, token: str) -> None:
        lists = kw.get(field)
        if lists is None:
            lists = kw[field] = [[] for _ in range(n_rows)]
        lists[row].append(token)

    def num_add(field: str, row: int, value: int) -> None:
        pair = num_pairs.get(field)
        if pair is None:
            pair = num_pairs[field] = ([], [])
        pair[0].append(row)
        pair[1].append(value)

    for row, s in enumerate(json_strings):
        if s is None:
            continue
        try:
            doc = json.loads(s) if isinstance(s, str) else s
        except (ValueError, TypeError):
            continue
        for path, v in flatten_json(doc):
            field = f"{col_name}.{path}" if path else col_name
            if isinstance(v, bool):  # before int: bool is an int subclass
                kw_add(field, row, "true" if v else "false")
            elif isinstance(v, int):
                if -(2**63) <= v < 2**63:
                    num_add(field, row, v)
                else:  # JSON bigint beyond int64: keyword, never a crash
                    kw_add(field, row, str(v))
            elif isinstance(v, float):
                if v.is_integer() and abs(v) < 2**53:
                    num_add(field, row, int(v))
                else:
                    kw_add(field, row, repr(v))
            elif v is None:
                kw_add(field, row, "null")
            else:
                kw_add(field, row, str(v))

    numeric = {
        f: (np.asarray(r, dtype=np.int64), np.asarray(v, dtype=np.int64))
        for f, (r, v) in num_pairs.items()
    }
    return kw, numeric


def numeric_token_lists(rows: np.ndarray, vals: np.ndarray, n_rows: int) -> list[list[str]]:
    """Per-row trie term lists for (row, value) occurrence pairs of one
    dynamic numeric field (multi-valued rows concatenate their terms)."""
    all_terms = trie_terms(vals)
    lists: list[list[str]] = [[] for _ in range(n_rows)]
    for r, t in zip(rows.tolist(), all_terms):
        lists[r].extend(t)
    return lists
