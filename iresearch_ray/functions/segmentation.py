"""UAX#29 word-boundary segmentation — SURVEY.md §2.1 `segmentation`.

Implements the Unicode Text Segmentation word-boundary rules (UAX #29,
rules WB1–WB999) as a VECTORIZED numpy pass per text: one int8 class per
char, boundary decisions as boolean kernels over shifted/gathered class
arrays.  This replaces the round-1/2 pinned regex approximation with the
real rule set (ref: core/analysis/segmentation_token_stream.cpp wraps
ICU's word BreakIterator; citation per SURVEY.md §0 convention).

Fidelity notes (documented, testable):

* Word_Break property classes are DERIVED from `unicodedata` general
  categories plus the spec's small fixed code-point sets (MidLetter,
  MidNum, MidNumLet, quotes, newline set) and script ranges (Katakana,
  Hebrew, ideographs).  The derivation matches the UCD assignments for
  the overwhelming majority of code points; exotic gaps (e.g. a handful
  of Emoji_Modifier / odd Mc cases) are approximation points and noted
  inline.  ASCII and Latin-1 behavior is exact.
* ICU additionally runs DICTIONARY-based breaking for Thai/Lao/Khmer/CJK
  sequences; pure UAX#29 (this module's default, and any non-dictionary
  ICU build) instead breaks between every pair of such chars (WB999).
  Tests pin that behavior explicitly.  r4: the dictionary MECHANISM is
  now implemented — ``SegmentationAnalyzer(dictionary=words)`` runs a
  minimum-pieces Viterbi over maximal runs of the dictionary scripts
  (Han, Hiragana, Thai, Lao, Khmer), exactly ICU's architecture
  (BreakIterator delegates those ranges to DictionaryBreakEngine).  The
  WORD LIST itself is a deployment input (ICU ships multi-MB frequency
  dictionaries; bundling one would be fake data — same stance as the
  IVF codebook); tests exercise the mechanism with small pinned
  dictionaries.

Modes mirror the reference options (`word_break`):
``alpha`` (default) keeps only word-like segments (contain an
alphanumeric char), ``graphic`` keeps any segment with a non-space
printable char, ``all`` keeps every segment.  ``case`` is
lower/upper/none, applied after segmentation (reference parity).
"""

from __future__ import annotations

import unicodedata
from typing import Sequence

import numpy as np

# Word_Break classes (int8 ids)
OTHER = 0
CR = 1
LF = 2
NEWLINE = 3
EXTEND = 4
ZWJ = 5
FORMAT = 6
KATAKANA = 7
HEBREW_LETTER = 8
ALETTER = 9
SINGLE_QUOTE = 10
DOUBLE_QUOTE = 11
MIDLETTER = 12
MIDNUM = 13
MIDNUMLET = 14
NUMERIC = 15
EXTENDNUMLET = 16
REGIONAL_INDICATOR = 17
WSEGSPACE = 18
EXT_PICT = 19  # Extended_Pictographic (only matters for WB3c right side)

# Fixed code-point sets straight from the UAX#29 property definitions.
_MIDLETTER = {0x003A, 0x00B7, 0x0387, 0x055F, 0x05F4, 0x2027, 0xFE13, 0xFE55, 0xFF1A}
_MIDNUMLET = {0x002E, 0x2018, 0x2019, 0x2024, 0xFE52, 0xFF07, 0xFF0E}
_MIDNUM = {
    0x002C, 0x003B, 0x037E, 0x0589, 0x060C, 0x060D, 0x066C, 0x07F8,
    0x2044, 0xFE10, 0xFE14, 0xFE50, 0xFE54, 0xFF0C, 0xFF1B,
}
_NEWLINES = {0x000B, 0x000C, 0x0085, 0x2028, 0x2029}
# Zs that are NOT WSegSpace (no-break spaces; line-break class GL)
_NB_SPACES = {0x00A0, 0x2007, 0x202F}
# Numeric additions beyond Nd per the UCD (arabic-indic separators join digits)
_NUMERIC_EXTRA = {0x066B}

_KATAKANA_RANGES = ((0x30A1, 0x30FA), (0x30FC, 0x30FF), (0x31F0, 0x31FF),
                    (0x32D0, 0x32FE), (0x3300, 0x3357), (0xFF66, 0xFF9D),
                    (0x1B000, 0x1B000))
_IDEO_RANGES = ((0x2E80, 0x2FDF), (0x3005, 0x3007), (0x3400, 0x4DBF),
                (0x4E00, 0x9FFF), (0xF900, 0xFAFF), (0x20000, 0x2FA1F),
                (0x30000, 0x3134F))
_HIRAGANA_RANGE = (0x3041, 0x309F)
_EXT_PICT_RANGES = ((0x2600, 0x27BF), (0x2B00, 0x2BFF), (0x1F000, 0x1FAFF),
                    (0x00A9, 0x00A9), (0x00AE, 0x00AE), (0x203C, 0x203C),
                    (0x2049, 0x2049), (0x2122, 0x2122))


def _in_ranges(cp: int, ranges) -> bool:
    return any(lo <= cp <= hi for lo, hi in ranges)


def _classify(cp: int) -> int:
    """Word_Break class of one code point (cached below)."""
    if cp == 0x000D:
        return CR
    if cp == 0x000A:
        return LF
    if cp in _NEWLINES:
        return NEWLINE
    if cp == 0x200D:
        return ZWJ
    if cp == 0x0027:
        return SINGLE_QUOTE
    if cp == 0x0022:
        return DOUBLE_QUOTE
    if cp in _MIDLETTER:
        return MIDLETTER
    if cp in _MIDNUMLET:
        return MIDNUMLET
    if cp in _MIDNUM:
        return MIDNUM
    if 0x1F1E6 <= cp <= 0x1F1FF:
        return REGIONAL_INDICATOR
    ch = chr(cp)
    cat = unicodedata.category(ch)
    # UAX#29 Extend = Grapheme_Extend ∪ Mc ∪ Emoji_Modifier; Mn/Me/Mc covers
    # the UCD set except a handful of exotics (approximation point).
    if cat in ("Mn", "Mc", "Me") or cp == 0x200C:
        return EXTEND
    if 0x1F3FB <= cp <= 0x1F3FF:  # emoji skin-tone modifiers
        return EXTEND
    if cat == "Cf":
        return FORMAT
    if cat == "Zs":
        return OTHER if cp in _NB_SPACES else WSEGSPACE
    if cat == "Nd" or cp in _NUMERIC_EXTRA:
        return NUMERIC
    if cat == "Pc":
        return EXTENDNUMLET
    if _in_ranges(cp, _KATAKANA_RANGES):
        return KATAKANA
    if 0x0590 <= cp <= 0x05FF and cat.startswith("L"):
        return HEBREW_LETTER
    if cat.startswith("L") or cat == "Nl" or cp in (0x02C2, 0x02C3):
        # ALetter = Alphabetic minus ideographic/Hiragana/Katakana per spec
        if _in_ranges(cp, _IDEO_RANGES):
            return OTHER
        if _HIRAGANA_RANGE[0] <= cp <= _HIRAGANA_RANGE[1]:
            return OTHER
        return ALETTER
    if _in_ranges(cp, _EXT_PICT_RANGES):
        return EXT_PICT
    return OTHER


# Dense LUT for the BMP-ish hot range, dict fallback above (lazy, per worker).
_LUT_SIZE = 0x3400
_LUT = np.array([_classify(cp) for cp in range(_LUT_SIZE)], dtype=np.int8)
_HIGH_CACHE: dict[int, int] = {}


def _class_array(text: str) -> np.ndarray:
    cps = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    cls = np.empty(len(cps), dtype=np.int8)
    low = cps < _LUT_SIZE
    cls[low] = _LUT[cps[low]]
    if not low.all():
        hc = _HIGH_CACHE
        hi_idx = np.flatnonzero(~low)
        for i in hi_idx:
            cp = int(cps[i])
            v = hc.get(cp)
            if v is None:
                v = hc[cp] = _classify(cp)
            cls[i] = v
    return cls


_AHL = (ALETTER, HEBREW_LETTER)
_MID_L = (MIDLETTER, MIDNUMLET, SINGLE_QUOTE)
_MID_N = (MIDNUM, MIDNUMLET, SINGLE_QUOTE)
_IGN = (EXTEND, FORMAT, ZWJ)


def _isin(a: np.ndarray, vals) -> np.ndarray:
    out = a == vals[0]
    for v in vals[1:]:
        out |= a == v
    return out


def word_boundaries(text: str) -> np.ndarray:
    """Indices i (0 < i < len) where a word boundary exists between
    text[i-1] and text[i], per UAX#29 WB1–WB999 (sot/eot implicit)."""
    cls = _class_array(text)
    n = len(cls)
    if n <= 1:
        return np.empty(0, dtype=np.int64)
    lraw, rraw = cls[:-1], cls[1:]

    ign = _isin(cls, _IGN)
    idx = np.arange(n)
    # last non-ignorable index at-or-before each position (-1 if none)
    base_upto = np.maximum.accumulate(np.where(~ign, idx, -1))
    # L = class of last non-ignorable strictly before i (boundary (i-1, i))
    prev_base = base_upto[:-1]  # index array, may be -1
    L = np.where(prev_base >= 0, cls[np.maximum(prev_base, 0)], OTHER).astype(np.int8)
    # L2 = class of the non-ignorable before L
    pb2_src = np.where(prev_base > 0, base_upto[np.maximum(prev_base - 1, 0)], -1)
    L2 = np.where(pb2_src >= 0, cls[np.maximum(pb2_src, 0)], OTHER).astype(np.int8)
    # R = cls[i] (rules below only fire when R is non-ignorable; WB4 covers
    # the ignorable case first).  R2 = next non-ignorable strictly after i.
    R = rraw
    nxt = np.where(~ign, idx, n)
    base_from = np.minimum.accumulate(nxt[::-1])[::-1]  # next nonign at/after i
    r2_src = np.empty(n - 1, dtype=np.int64)
    r2_src[: n - 2] = base_from[2:]
    r2_src[n - 2] = n
    R2 = np.where(r2_src < n, cls[np.minimum(r2_src, n - 1)], OTHER).astype(np.int8)

    nb = np.zeros(n - 1, dtype=bool)   # "no break" decided
    br = np.zeros(n - 1, dtype=bool)   # "break" decided
    decided = np.zeros(n - 1, dtype=bool)

    def rule(mask: np.ndarray, is_break: bool) -> None:
        m = mask & ~decided
        (br if is_break else nb)[m] = True
        decided[m] = True

    # WB3 / WB3a / WB3b (raw adjacency)
    rule((lraw == CR) & (rraw == LF), False)
    rule(_isin(lraw, (NEWLINE, CR, LF)), True)
    rule(_isin(rraw, (NEWLINE, CR, LF)), True)
    # WB3c ZWJ × ExtPict (raw)
    rule((lraw == ZWJ) & (rraw == EXT_PICT), False)
    # WB3d keep horizontal whitespace runs together
    rule((lraw == WSEGSPACE) & (rraw == WSEGSPACE), False)
    # WB4: X (Extend|Format|ZWJ)* → X  (no break before ignorables)
    rule(_isin(rraw, _IGN), False)
    # WB5–WB13b on skipped context
    ahl_L = _isin(L, _AHL)
    ahl_R = _isin(R, _AHL)
    rule(ahl_L & ahl_R, False)                                        # WB5
    rule(ahl_L & _isin(R, _MID_L) & _isin(R2, _AHL), False)           # WB6
    rule(_isin(L, _MID_L) & _isin(L2, _AHL) & ahl_R, False)           # WB7
    rule((L == HEBREW_LETTER) & (R == SINGLE_QUOTE), False)           # WB7a
    rule((L == HEBREW_LETTER) & (R == DOUBLE_QUOTE)
         & (R2 == HEBREW_LETTER), False)                              # WB7b
    rule((L == DOUBLE_QUOTE) & (L2 == HEBREW_LETTER)
         & (R == HEBREW_LETTER), False)                               # WB7c
    rule((L == NUMERIC) & (R == NUMERIC), False)                      # WB8
    rule(ahl_L & (R == NUMERIC), False)                               # WB9
    rule((L == NUMERIC) & ahl_R, False)                               # WB10
    rule(_isin(L, _MID_N) & (L2 == NUMERIC) & (R == NUMERIC), False)  # WB11
    rule((L == NUMERIC) & _isin(R, _MID_N)
         & (R2 == NUMERIC), False)                                    # WB12
    rule((L == KATAKANA) & (R == KATAKANA), False)                    # WB13
    rule(_isin(L, (ALETTER, HEBREW_LETTER, NUMERIC, KATAKANA, EXTENDNUMLET))
         & (R == EXTENDNUMLET), False)                                # WB13a
    rule((L == EXTENDNUMLET)
         & _isin(R, (ALETTER, HEBREW_LETTER, NUMERIC, KATAKANA)), False)  # WB13b
    # WB15/WB16: RI × RI only in pairs (even count of preceding RIs)
    is_ri = cls == REGIONAL_INDICATOR
    if is_ri.any():
        # run position parity: count of consecutive RIs ending at i-1
        ri_run = np.zeros(n, dtype=np.int64)
        for i in range(n):  # RI flags are rare; scalar loop over short runs
            if is_ri[i]:
                ri_run[i] = (ri_run[i - 1] + 1) if i else 1
        pair_ok = (L == REGIONAL_INDICATOR) & (R == REGIONAL_INDICATOR)
        odd_prefix = np.where(prev_base >= 0, ri_run[np.maximum(prev_base, 0)], 0) % 2 == 1
        rule(pair_ok & odd_prefix, False)
    # WB999: break everywhere else
    rule(~decided, True)
    return np.flatnonzero(br) + 1


def segment_words(text: str) -> list[str]:
    """Split text into UAX#29 word segments (every segment, incl. spaces)."""
    if not text:
        return []
    bounds = word_boundaries(text)
    out = []
    prev = 0
    for b in bounds.tolist():
        out.append(text[prev:b])
        prev = b
    out.append(text[prev:])
    return out


# scripts ICU hands to a DictionaryBreakEngine instead of UAX#29 rules
_DICT_SCRIPT_RANGES = (
    (0x3400, 0x4DBF),    # CJK Ext A
    (0x4E00, 0x9FFF),    # CJK Unified
    (0xF900, 0xFAFF),    # CJK Compatibility
    (0x3040, 0x309F),    # Hiragana
    (0x0E00, 0x0E7F),    # Thai
    (0x0E80, 0x0EFF),    # Lao
    (0x1780, 0x17FF),    # Khmer
)


def _is_dict_script(ch: str) -> bool:
    cp = ord(ch)
    return any(a <= cp <= b for a, b in _DICT_SCRIPT_RANGES)


def dict_segment(run: str, words: frozenset, max_len: int) -> list[str]:
    """Minimum-pieces Viterbi over one dictionary-script run: a dictionary
    word costs 1, an unknown single char 1.5 (so known words win, then
    fewer pieces win; ICU's engines minimize an equivalent cost with
    corpus frequencies).  Leftmost-longest on exact ties."""
    n = len(run)
    INF = float("inf")
    best = [INF] * (n + 1)
    best[0] = 0.0
    back = [0] * (n + 1)
    for i in range(n):
        b = best[i]
        if b == INF:
            continue
        c = b + 1.5  # unknown-char fallback
        if c < best[i + 1]:
            best[i + 1] = c
            back[i + 1] = i
        # longest candidate first so an equal-cost longer word wins
        for L in range(min(max_len, n - i), 0, -1):
            if run[i : i + L] in words:
                c = b + 1.0
                if c < best[i + L]:
                    best[i + L] = c
                    back[i + L] = i
    out = []
    j = n
    while j > 0:
        i = back[j]
        out.append(run[i:j])
        j = i
    out.reverse()
    return out


class SegmentationAnalyzer:
    """IResearch `segmentation` analyzer analog (ref:
    segmentation_token_stream.cpp — ICU word BreakIterator + token filter).

    Options mirror the reference JSON: ``word_break`` in {"alpha"
    (default: keep segments containing an alphanumeric), "graphic" (keep
    segments with any non-space printable), "all"}; ``case`` in {"lower"
    (default), "upper", "none"}.

    ``dictionary`` (r4) enables ICU-style dictionary breaking: maximal
    runs of the dictionary scripts (Han/Hiragana/Thai/Lao/Khmer) bypass
    the UAX#29 per-char WB999 breaks and are segmented by minimum-pieces
    Viterbi over the given word list instead.  Splitting the text at
    dictionary-script run edges is boundary-safe: a run edge is always a
    UAX#29 break too (those classes never chain with ALetter/Numeric).
    The word list is a deployment input — see the module header."""

    def __init__(self, word_break: str = "alpha", case: str = "lower",
                 dictionary=None):
        if word_break not in ("alpha", "graphic", "all"):
            raise ValueError("word_break must be alpha|graphic|all")
        if case not in ("lower", "upper", "none"):
            raise ValueError("case must be lower|upper|none")
        self.word_break = word_break
        self.case = case
        self.dict_words = frozenset(dictionary) if dictionary else None
        self._dict_max = max((len(w) for w in self.dict_words), default=1) \
            if self.dict_words else 0

    def _keep(self, seg: str) -> bool:
        if self.word_break == "all":
            return True
        if self.word_break == "alpha":
            return any(c.isalnum() for c in seg)
        return any(not c.isspace() for c in seg)  # graphic

    def _segment(self, text: str) -> list[str]:
        if self.dict_words is None:
            return segment_words(text)
        # split into alternating (dictionary-script run, other) spans;
        # UAX#29 inside the other spans, Viterbi inside the runs
        out: list[str] = []
        i, n = 0, len(text)
        while i < n:
            j = i
            if _is_dict_script(text[i]):
                while j < n and _is_dict_script(text[j]):
                    j += 1
                out.extend(dict_segment(text[i:j], self.dict_words,
                                        self._dict_max))
            else:
                while j < n and not _is_dict_script(text[j]):
                    j += 1
                out.extend(segment_words(text[i:j]))
            i = j
        return out

    def tokenize_one(self, text: str | None) -> list[str]:
        if text is None:
            return []
        segs = [s for s in self._segment(text) if self._keep(s)]
        if self.case == "lower":
            return [s.lower() for s in segs]
        if self.case == "upper":
            return [s.upper() for s in segs]
        return segs

    def __call__(self, texts: Sequence[str | None]) -> list[list[str]]:
        return [self.tokenize_one(t) for t in texts]


def load_test_lexicon() -> frozenset:
    """The shipped ~1k-word synthetic CJK TEST lexicon
    (resources/cjk_test_lexicon.txt) — deterministic fixture words plus the
    hand-picked sentinels the dictionary-segmentation driver query and
    tests rely on.  A production deployment supplies its own multi-MB word
    list (module header); this fixture exists so the Viterbi path is
    load-bearing end-to-end, not just unit-tested on toy lists."""
    import os

    p = os.path.join(os.path.dirname(__file__), os.pardir, "resources",
                     "cjk_test_lexicon.txt")
    with open(p, encoding="utf-8") as f:
        return frozenset(
            w for w in (line.strip() for line in f)
            if w and not w.startswith("#")
        )
