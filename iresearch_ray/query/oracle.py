"""Brute-force query oracle — SURVEY.md §5.2 items 3–5.

An INDEPENDENT implementation of the pinned semantics (same tokenizer spec,
same BM25 formula, same tie-break) built on per-doc token lists and python
dict counting — no posting lists, no codec, no numpy set algebra — so that
agreement with the engine is meaningful.  "Rank-identical to IResearch"
(BASELINE.json metric) is operationalized as engine == this oracle ==
hand-computed goldens (SURVEY §0).
"""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd
import pyarrow as pa

from iresearch_ray.functions.analysis import TextAnalyzer
from iresearch_ray.query import filters as F
from iresearch_ray.query.filters import (
    ScorerCfg,
    levenshtein_distance,
    osa_distance,
    wildcard_literal_prefix,
    wildcard_to_regex,
)


class BruteForceOracle:
    def __init__(
        self,
        table: pa.Table,
        text_field: str = "text",
        keyword_fields: tuple[str, ...] = ("role", "tool"),
        scorer: ScorerCfg | None = None,
    ):
        self.scorer = scorer or ScorerCfg()
        df_ = table.to_pandas()
        df_ = df_.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
        self.docs = df_
        analyzer = TextAnalyzer()
        self.fields: dict[str, dict] = {}
        toks = [analyzer.tokenize_one(t) for t in df_[text_field]]
        self._index_field(text_field, toks)
        for kf in keyword_fields:
            if kf in df_.columns:
                kw = [[] if v is None or (isinstance(v, float) and pd.isna(v)) else [v] for v in df_[kf]]
                self._index_field(kf, kw)
        self.text_field = text_field

    def _index_field(self, name: str, token_lists: list[list[str]]):
        tfs = [Counter(t) for t in token_lists]
        df_count: Counter = Counter()
        for c in tfs:
            df_count.update(c.keys())
        dls = [len(t) for t in token_lists]
        n_with = sum(1 for d in dls if d > 0)
        total_tf = sum(dls)
        self.fields[name] = {
            "tfs": tfs,
            "tokens": token_lists,
            "dls": dls,
            "df": df_count,
            "N": n_with,
            "avg_dl": (total_tf / n_with) if n_with else 1.0,
            "vocab": sorted(df_count),
        }

    # -- scoring helpers --------------------------------------------------
    def _idf(self, field: str, term: str) -> float:
        f = self.fields[field]
        return self.scorer.idf(f["df"].get(term, 0), f["N"])

    def _tf_factor(self, tf: int, dl: int) -> float:
        s = self.scorer
        if s.name == "tfidf":
            return math.sqrt(tf) / math.sqrt(dl)
        if s.name != "bm25":
            import numpy as _np

            from iresearch_ray.functions.score import SCORERS

            return float(
                SCORERS[s.name]["tf_factor"](
                    _np.array([float(tf)]), _np.array([float(dl)]),
                    self._cur_avg, s.k1, s.b,
                )[0]
            )
        return (tf * (s.k1 + 1.0)) / (tf + s.k1 * (1.0 - s.b + s.b * dl / self._cur_avg))

    def _term_scores(self, field: str, term: str, boost: float) -> dict[int, float]:
        f = self.fields[field]
        self._cur_avg = f["avg_dl"]
        w = boost * self._idf(field, term)
        out = {}
        for i, c in enumerate(f["tfs"]):
            tf = c.get(term, 0)
            if tf:
                out[i] = w * self._tf_factor(tf, f["dls"][i])
        return out

    # -- filter evaluation ------------------------------------------------
    def _eval(self, flt: F.Filter, boost: float) -> tuple[dict[int, float], dict[int, int]]:
        """returns (doc→score, doc→matched-leg-count (for min_match))."""
        boost = boost * flt.boost
        if isinstance(flt, F.Term):
            s = self._term_scores(flt.field, flt.term, boost)
            return s, {d: 1 for d in s}
        if isinstance(flt, F.Terms):
            per = {}
            for i, t in enumerate(flt.terms):
                if t not in per:
                    b = flt.boosts[i] if getattr(flt, "boosts", None) is not None else 1.0
                    per[t] = boost * (1.0 if b is None else float(b))
            legs = [self._term_scores(flt.field, t, w) for t, w in per.items()]
            return self._union(legs, flt.min_match)
        if isinstance(flt, (F.Prefix, F.TermRange, F.Wildcard, F.Fuzzy)):
            terms = self._expand(flt)
            limit = getattr(flt, "scored_terms_limit", None)
            if limit is not None and len(terms) > limit:
                # limited_sample_collector analog (mirrors filters.py):
                # top-limit terms by (df desc, term asc) scored; the rest
                # MATCH with score 0 and count toward min_match
                df = self.fields[flt.field]["df"]
                ranked = sorted(terms, key=lambda t: (-df.get(t, 0), t))
                scored, unscored = ranked[:limit], ranked[limit:]
                legs = [self._term_scores(flt.field, t, boost) for t in scored]
                legs += [
                    {d: 0.0 for d in self._term_scores(flt.field, t, 1.0)}
                    for t in unscored
                ]
                return self._union(legs, 1)
            legs = [self._term_scores(flt.field, t, boost) for t in terms]
            return self._union(legs, 1)
        if isinstance(flt, F.Phrase):
            return self._phrase(flt, boost), {}
        if isinstance(flt, F.GranularRange):
            col = self.docs[flt.field]
            lo = float("-inf") if flt.low is None else flt.low + (0 if flt.include_low else 1)
            hi = float("inf") if flt.high is None else flt.high - (0 if flt.include_high else 1)
            out = {
                i: boost
                for i, v in enumerate(col)
                if v is not None and not pd.isna(v) and lo <= v <= hi
            }
            return out, {d: 1 for d in out}
        if isinstance(flt, F.SamePosition):
            f = self.fields[flt.field]
            self._cur_avg = f["avg_dl"]
            w = boost * sum(self._idf(flt.field, t) for t in flt.terms)
            out = {}
            # one token per position (word fields): distinct terms can never
            # share a position, so the filter degenerates to "all terms
            # identical" with tf = that term's occurrence count — exactly
            # the engine's key-intersection result on these fields
            for i, toks in enumerate(f["tokens"]):
                tf = toks.count(flt.terms[0]) if len(set(flt.terms)) == 1 else 0
                if tf:
                    out[i] = w * self._tf_factor(tf, f["dls"][i])
            return out, {}
        if isinstance(flt, F.NgramSimilarity):
            f = self.fields[flt.field]
            n = len(flt.terms)
            first_idx = {}
            for j, t in enumerate(flt.terms):
                first_idx.setdefault(t, j)
            out = {}
            for i, toks in enumerate(f["tokens"]):
                seq = [first_idx[t] for t in toks if t in first_idx]
                # LCS(query 0..n-1, seq) — classic DP
                prev = [0] * (n + 1)
                for x in seq:
                    cur = prev[:]
                    for q in range(1, n + 1):
                        if x == q - 1:
                            cur[q] = max(cur[q], prev[q - 1] + 1)
                        cur[q] = max(cur[q], cur[q - 1], prev[q])
                    prev = cur
                ratio = prev[n] / n
                if ratio >= flt.threshold:
                    out[i] = boost * ratio
            return out, {}
        if isinstance(flt, F.And):
            if not flt.children:
                return {}, {}  # empty conjunction matches nothing (pinned)
            evs = [self._eval(c, boost) for c in flt.children]
            docs = set(evs[0][0])
            for e, _ in evs[1:]:
                docs &= set(e)
            out = {d: sum(e[d] for e, _ in evs) for d in docs}
            return out, {d: 1 for d in out}
        if isinstance(flt, F.Or):
            evs = [self._eval(c, boost)[0] for c in flt.children]
            return self._union(evs, flt.min_match)
        if isinstance(flt, F.Not):
            pos = flt.positive if flt.positive is not None else F.AllDocs()
            p, _ = self._eval(pos, boost)
            n, _ = self._eval(flt.negative, 1.0)
            out = {d: s for d, s in p.items() if d not in n}
            return out, {d: 1 for d in out}
        if isinstance(flt, F.Nested):
            child, _ = self._eval(flt.child, 1.0)
            groups: dict[str, list[int]] = {}
            for d in sorted(child):
                groups.setdefault(self.docs["conv_id"][d], []).append(d)
            out: dict[int, float] = {}
            for _conv, members in groups.items():
                if len(members) < flt.min_match:
                    continue
                scores = [child[d] for d in members]
                if flt.score_merge == "sum":
                    m = sum(scores)
                elif flt.score_merge == "max":
                    m = max(scores)
                elif flt.score_merge == "min":
                    m = min(scores)
                elif flt.score_merge == "avg":
                    m = sum(scores) / len(scores)
                else:
                    m = 1.0
                out[members[0]] = boost * m
            return out, {d: 1 for d in out}
        if isinstance(flt, F.AllDocs):
            out = {i: boost for i in range(len(self.docs))}
            return out, {d: 1 for d in out}
        if isinstance(flt, F.Exists):
            f = self.fields.get(flt.field)
            if f is None:
                return {}, {}
            out = {i: boost for i, dl in enumerate(f["dls"]) if dl > 0}
            return out, {d: 1 for d in out}
        if isinstance(flt, F.Empty):
            return {}, {}
        raise TypeError(type(flt).__name__)

    @staticmethod
    def _union(legs: list[dict[int, float]], min_match: int):
        score: dict[int, float] = {}
        count: Counter = Counter()
        for leg in legs:
            for d, s in leg.items():
                score[d] = score.get(d, 0.0) + s
                count[d] += 1
        if min_match > 1:
            score = {d: s for d, s in score.items() if count[d] >= min_match}
        return score, dict(count)

    def _expand(self, flt) -> list[str]:
        vocab = self.fields[flt.field]["vocab"]
        if isinstance(flt, F.Prefix):
            return [t for t in vocab if t.startswith(flt.prefix)]
        if isinstance(flt, F.TermRange):
            def ok(t):
                if flt.low is not None:
                    if t < flt.low or (t == flt.low and not flt.include_low):
                        return False
                if flt.high is not None:
                    if t > flt.high or (t == flt.high and not flt.include_high):
                        return False
                return True
            return [t for t in vocab if ok(t)]
        if isinstance(flt, F.Wildcard):
            rx = wildcard_to_regex(flt.pattern)
            return [t for t in vocab if rx.fullmatch(t)]
        if isinstance(flt, F.Fuzzy):
            dist = osa_distance if flt.with_transpositions else levenshtein_distance
            d = min(flt.max_distance, 4)
            return [t for t in vocab if dist(flt.term, t, d) <= d]
        raise TypeError(type(flt).__name__)

    def _expand_part(self, part, field: str) -> list[str]:
        if isinstance(part, str):
            return [part]
        if isinstance(part, F.Term):
            return [part.term]
        # expansion is against the PHRASE's field (engine semantics:
        # expand_phrase_part ignores the part's own field attribute)
        import dataclasses

        return self._expand(dataclasses.replace(part, field=field))

    def _phrase(self, flt: F.Phrase, boost: float) -> dict[int, float]:
        if not flt.terms:
            return {}  # empty phrase matches nothing (pinned; engine agrees)
        f = self.fields[flt.field]
        self._cur_avg = f["avg_dl"]
        slot_sets = [set(self._expand_part(p, flt.field) or []) for p in flt.terms]
        w = boost * sum(
            self._idf(flt.field, t) for slot in slot_sets for t in sorted(slot)
        )
        L = len(slot_sets)
        slop = int(getattr(flt, "slop", 0))
        ordered = bool(getattr(flt, "ordered", True))
        out = {}
        for i, toks in enumerate(f["tokens"]):
            if len(toks) < L:
                continue
            pls = [
                [p for p, t in enumerate(toks) if t in slot] for slot in slot_sets
            ]
            if any(not pl for pl in pls):
                continue
            if not ordered and L > 1:
                # independent brute enumeration of the pinned unordered
                # window: every assignment of slots to DISTINCT positions
                # with span <= L-1+slop; tf = number of distinct minima
                from itertools import product

                anchors = set()
                for combo in product(*pls):
                    if len(set(combo)) != L:
                        continue
                    if max(combo) - min(combo) <= L - 1 + slop:
                        anchors.add(min(combo))
                tf = len(anchors)
            elif slop == 0:
                tf = 0
                for p in range(len(toks) - L + 1):
                    if all(toks[p + j] in slot_sets[j] for j in range(L)):
                        tf += 1
            else:
                # pinned greedy ordered-window slop (mirrors exec.py): each
                # candidate chain advances to the SMALLEST next-slot position
                # in (prev, prev+1+slop]; tf = distinct final positions
                cand = set(pls[0])
                for plist in pls[1:]:
                    nxt = set()
                    for prev in cand:
                        after = [q for q in plist if prev < q <= prev + 1 + slop]
                        if after:
                            nxt.add(min(after))
                    cand = nxt
                    if not cand:
                        break
                tf = len(cand)
            if tf:
                out[i] = w * self._tf_factor(tf, f["dls"][i])
        return out

    def search(self, flt: F.Filter, k: int = 10) -> pd.DataFrame:
        scores, _ = self._eval(flt, 1.0)
        rows = [
            (self.docs["conv_id"][d], int(self.docs["turn_idx"][d]), s)
            for d, s in scores.items()
        ]
        rows.sort(key=lambda r: (-r[2], r[0], r[1]))
        return pd.DataFrame(rows[:k], columns=["conv_id", "turn_idx", "score"])
