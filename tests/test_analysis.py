"""Analyzer unit tests — SURVEY §5.2 item 1 (pinned token streams + dl)."""

from iresearch_ray.functions.analysis import (
    DelimiterAnalyzer,
    KeywordAnalyzer,
    NgramAnalyzer,
    NormalizingAnalyzer,
    PipelineAnalyzer,
    TextAnalyzer,
    get_analyzer,
    porter_stem,
    tokenize_text,
)


def test_text_pinned_spec():
    # lowercase, [^\W_]+ split, underscores are separators
    assert tokenize_text("Quick Brown-Fox_jumps 42!") == ["quick", "brown", "fox", "jumps", "42"]
    assert tokenize_text("") == []
    assert tokenize_text(None) == []
    # NFC + casefold on non-ascii
    assert tokenize_text("Café CAFÉ")[0] == "café"


def test_text_dl_counts():
    a = TextAnalyzer()
    toks = a(["quick brown fox jumps over the lazy dog", "quick quick brown cat"])
    assert [len(t) for t in toks] == [8, 4]


def test_text_stopwords_and_stem():
    a = TextAnalyzer(stopwords={"the"}, stemmer=True)
    assert a.tokenize_one("the running dogs") == ["run", "dog"]


def test_keyword():
    a = KeywordAnalyzer()
    assert a(["Exact Value", None]) == [["Exact Value"], []]


def test_delimiter():
    a = DelimiterAnalyzer(",")
    assert a(["a,b,,c"]) == [["a", "b", "c"]]


def test_ngram():
    a = NgramAnalyzer(2, 3)
    assert a.tokenize_one("abc") == ["ab", "abc", "bc"]
    a2 = NgramAnalyzer(2, 2, preserve_original=True)
    assert a2.tokenize_one("abcd") == ["ab", "bc", "cd", "abcd"]


def test_normalizing():
    a = NormalizingAnalyzer()
    assert a(["CÀFÉ"]) == [["cafe"]]


def test_pipeline():
    p = PipelineAnalyzer(DelimiterAnalyzer(","), TextAnalyzer())
    assert p(["Hello World,Foo"]) == [["hello", "world", "foo"]]


def test_porter_stem_classics():
    assert porter_stem("caresses") == "caress"
    assert porter_stem("ponies") == "poni"
    assert porter_stem("relational") == "relat"
    assert porter_stem("running") == "run"


def test_registry():
    assert get_analyzer("text").__class__ is TextAnalyzer
    import pytest

    with pytest.raises(KeyError):
        get_analyzer("nope")


def test_boolean_null_analyzers():
    from iresearch_ray.functions.analysis import get_analyzer

    b = get_analyzer("boolean")
    assert b([True, False, None, 1, "true"]) == [["true"], ["false"], [], ["true"], ["true"]]
    n = get_analyzer("null")
    assert n([None, "x", None]) == [["null"], [], ["null"]]


def test_minhash_collision_tracks_jaccard():
    """P(minhash collision) ≈ Jaccard — the property LSH banding relies on."""
    import numpy as np

    from iresearch_ray.functions.analysis import get_analyzer

    mh = get_analyzer("minhash", num_hashes=256)
    base = [f"tok{i}" for i in range(40)]
    for overlap in (10, 20, 30, 40):
        a = " ".join(base)
        b = " ".join(base[:overlap] + [f"other{i}" for i in range(40 - overlap)])
        sa, sb = mh([a, b])
        match = len(set(sa) & set(sb)) / 256
        jac = overlap / (80 - overlap)
        assert abs(match - jac) < 0.12, (overlap, match, jac)


def test_collation_analyzer_keys():
    """UCA-style multi-level root-locale keys (ref:
    collation_token_stream.cpp): strength truncates levels like ICU —
    primary folds accents+case, secondary distinguishes accents
    left-to-right, tertiary orders lowercase before uppercase."""
    from iresearch_ray.functions.analysis import CollationAnalyzer, get_analyzer

    c = get_analyzer("collation")
    assert isinstance(c, CollationAnalyzer)
    # PRIMARY: case/accent variants produce the SAME key
    p = get_analyzer("collation", strength="primary")
    assert p(["Café"]) == p(["cafe"]) == p(["CAFÉ"])
    assert p(["straße"])[0] == p(["STRASSE"])[0]  # casefold covers ß→ss
    # primary strength also shifts out punctuation/space variants
    assert p(["foo-bar"]) == p(["Foo Bar"]) == p(["foobar"])
    # SECONDARY: accents differ (left-to-right, root order), case doesn't
    s = get_analyzer("collation", strength="secondary")
    assert s(["café"]) == s(["CAFÉ"])
    assert s(["café"]) != s(["cafe"])
    k = lambda w: s([w])[0][0]
    assert [k(w) for w in ("cote", "coté", "côte", "côté")] == sorted(
        k(w) for w in ("cote", "coté", "côte", "côté")
    )
    # TERTIARY (default): case breaks the final tie, lowercase first
    kt = lambda w: c([w])[0][0]
    assert kt("ab") < kt("Ab") < kt("AB")
    assert kt("café") != kt("CAFÉ")
    # ordering under any strength equals root collation for these
    keys = [kt(w) for w in ("Äpfel", "banane", "Citron")]
    assert keys == sorted(keys)
    # null → no token (field absent)
    assert c([None]) == [[]]


def test_collation_range_query_e2e(tmp_path):
    """A collation-keyed field supports range scans over the sorted
    dictionary — the by_range use case collation exists for."""
    import pyarrow as pa

    from iresearch_ray.pipelines.build import build_index_local
    from iresearch_ray.pipelines.search import Searcher
    from iresearch_ray.query import filters as F
    from iresearch_ray.stages.segment import IndexConfig

    rows = [
        {"conv_id": f"c{i}", "turn_idx": 0, "text": w, "role": w, "tool": None}
        for i, w in enumerate(["Äpfel", "banane", "Citron", "dattel", "ÉCLAIR"])
    ]
    tbl = pa.Table.from_pylist(rows)
    d = str(tmp_path / "idx")
    build_index_local(tbl, d, num_partitions=1,
                      cfg=IndexConfig(analyzer="keyword", keyword_fields=("role",),
                                      analyzer_opts={}))
    # index the collation KEY as the text field by pre-keying here (the
    # analyzer runs at build time in real configs; this asserts key order)
    from iresearch_ray.functions.analysis import CollationAnalyzer

    c = CollationAnalyzer()
    keys = sorted(c.key(r["text"]) for r in rows)
    assert keys == [c.key(w) for w in ("Äpfel", "banane", "Citron", "dattel", "ÉCLAIR")]


# ---------------------------------------------------------------------------
# UAX#29 segmentation analyzer (SURVEY §2.1 `segmentation` — upgraded from
# the pinned regex approximation to the real word-boundary rule set)
# ---------------------------------------------------------------------------


def test_uax29_word_boundaries_canonical_cases():
    """Hand-checked cases exercising each WB rule: MidLetter/MidNumLet
    chains (WB6/7), numeric separators (WB11/12), ExtendNumLet (WB13a/b),
    Katakana runs (WB13), CRLF (WB3), combining marks (WB4), regional
    indicator pairs (WB15/16), ZWJ emoji (WB3c), WSegSpace runs (WB3d)."""
    from iresearch_ray.functions.segmentation import segment_words

    cases = [
        ("can't stop", ["can't", " ", "stop"]),
        ("1,234.56 items", ["1,234.56", " ", "items"]),
        ("foo_bar baz", ["foo_bar", " ", "baz"]),
        ("a:b", ["a:b"]),                 # colon is MidLetter
        ("a.b.c", ["a.b.c"]),
        ("a..b", ["a", ".", ".", "b"]),   # doubled mid char breaks (WB6 needs AHLetter after)
        ("étude", ["étude"]),
        ("ab\r\ncd", ["ab", "\r\n", "cd"]),
        ("カタカナ test", ["カタカナ", " ", "test"]),
        ("ひらがな", ["ひ", "ら", "が", "な"]),  # pure UAX#29 (no ICU dictionary): WB999
        ("漢字", ["漢", "字"]),
        ("A1B2", ["A1B2"]),               # WB9/WB10
        ("don’t", ["don’t"]),             # curly apostrophe is MidNumLet
        ("3.14", ["3.14"]),
        ("3. 14", ["3", ".", " ", "14"]),
        ("U.S.A.", ["U.S.A", "."]),
        ("  two  spaces", ["  ", "two", "  ", "spaces"]),
        ("🇺🇸🇫🇷", ["🇺🇸", "🇫🇷"]),           # RI pairs
        ("👩‍💻 dev", ["👩‍💻", " ", "dev"]),  # ZWJ sequence
        ("x́y", ["x́y"]),       # Extend attaches, then WB4-skipped WB5
    ]
    for text, want in cases:
        assert segment_words(text) == want, (text, segment_words(text), want)
    assert segment_words("") == []
    assert segment_words("a") == ["a"]


def test_segmentation_analyzer_modes_and_registry():
    from iresearch_ray.functions.analysis import get_analyzer

    alpha = get_analyzer("segmentation")
    assert alpha(["Can't stop, 1,234.56!"]) == [["can't", "stop", "1,234.56"]]
    graphic = get_analyzer("segmentation", word_break="graphic", case="none")
    assert graphic(["Hi — there!"]) == [["Hi", "—", "there", "!"]]
    allmode = get_analyzer("segmentation", word_break="all", case="upper")
    assert allmode(["a b"]) == [["A", " ", "B"]]
    assert alpha([None]) == [[]]


def test_segmentation_matches_text_analyzer_on_plain_ascii():
    """On plain space-separated ASCII words (no punctuation), the UAX#29
    alpha segmentation and the pinned `text` regex produce identical
    tokens — the documented domain where the r1/r2 approximation was
    already exact."""
    from iresearch_ray.functions.analysis import TextAnalyzer, get_analyzer

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "alpha beta gamma delta 42 omega",
        "Mixed Case Words Here",
    ]
    assert get_analyzer("segmentation")(texts) == TextAnalyzer()(texts)


def test_collation_order_matches_real_icu_fuzz():
    """Order-parity fuzz against a REAL ICU instance (DuckDB bundles the
    icu extension statically): 1500+ random Latin/accent/punct/digit
    strings plus sentence-shaped ASCII, sorted by our UCA key vs
    ORDER BY v COLLATE "en" — must agree exactly.  This is the oracle
    behind the ft_collation_sort driver query."""
    import random

    import duckdb

    from iresearch_ray.functions.analysis import CollationAnalyzer

    rng = random.Random(7)
    alphabet = (list("abcdefgz") + list("ABCZ")
                + list("áàâäéèêëíîïóôöúûüçñß") + list("0159 .-'"))
    words = {"".join(rng.choices(alphabet, k=rng.randint(1, 8))) for _ in range(800)}
    vocab = ["the", "quick", "Brown", "fox", "error", "agent", "tool",
             "retry", "42", "3.14", "can't", "HTTP", "a-b"]
    words |= {
        " ".join(rng.choices(vocab, k=rng.randint(1, 6))) + rng.choice(["", ".", "!", "?"])
        for _ in range(500)
    }
    words |= {
        "".join(rng.choices(list("0123456789.,;:!? $%&#@*+=<>()[]"), k=rng.randint(1, 10)))
        for _ in range(300)
    }
    words = list(words)
    con = duckdb.connect()
    con.execute("create table w(v varchar)")
    con.executemany("insert into w values (?)", [(w,) for w in words])
    icu = [r[0] for r in con.sql('select v from w order by v collate "en", v').fetchall()]
    c = CollationAnalyzer()
    mine = sorted(words, key=lambda w: (c.key(w), w))
    assert mine == icu


def test_tailored_collation_matches_real_icu_fuzz():
    """Locale tailorings vs REAL ICU (DuckDB bundles the icu extension):
    for each built-in tailored locale, 400 random words over ascii + that
    locale's tailored characters, sorted by our tailored UCA key with the
    raw string as tiebreak, must equal DuckDB's ORDER BY v COLLATE <loc>,
    v.  Danish aa-contraction strings are INCLUDED (r4 late: the kernel
    compiles contractions to private-use sentinels substituted on the
    raw NFD sequence, so ICU's NFD-level matching is reproduced); prior
    exclusion note kept for history —
    ICU da has the aa→å CONTRACTION and matches it at the NFD level (so
    'aå' = 'a'+'a'+ring triggers it too), which the per-char kernel
    documents out of scope."""
    import random
    import unicodedata

    import duckdb

    from iresearch_ray.functions.analysis import CollationAnalyzer

    cases = {
        "sv": "åäö",
        "fi": "åäö",
        "da": "æøå",
        # "nb" is EXCLUDED: DuckDB's reduced ICU data aliases nb to root
        # (probe: 'å' < 'ab' under COLLATE nb, i.e. å = a+ring, no Danish
        # tailoring), so it cannot oracle the real Norwegian order.  The
        # nb registry entry is rule-identical to da minus caseFirst=upper
        # and is covered by the da fuzz structurally.
        "es": "ñ",
    }
    rng = random.Random(77)
    con = duckdb.connect()
    have = {r[0] for r in con.execute("select collname from pragma_collations()").fetchall()}
    for loc, extra in cases.items():
        assert loc in have, f"DuckDB build lost the {loc} collation"
        alphabet = "abeonz" + extra + extra.upper() + "ABZ"
        words = set()
        while len(words) < 400:
            w = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 7)))
            words.add(w)
        words = sorted(words)
        con.execute("create or replace table w as select * from (select unnest(?) v)",
                    [words])
        icu = [r[0] for r in con.execute(
            f'select v from w order by v collate "{loc}", v').fetchall()]
        ana = CollationAnalyzer(locale=loc)
        keys = dict(zip(words, ana.keys(words)))
        mine = sorted(words, key=lambda w: (keys[w], w))
        assert mine == icu, f"{loc}: first divergence " + str(
            next((a, b) for a, b in zip(mine, icu) if a != b))


def test_tailored_collation_rules_and_expansions():
    """Rule compiler semantics without ICU: chains re-anchor, secondary
    expansions place the tailored char between its expansion and the next
    string, uppercase derives implicitly, NFD input hits the override,
    strength still truncates, and contractions compile to sentinel
    elements (one element per source, NFD-level matched)."""
    import unicodedata

    import pytest

    from iresearch_ray.functions.analysis import CollationAnalyzer

    sv = CollationAnalyzer(locale="sv")
    assert sorted(["öga", "zebra", "åka", "ärlig", "apa"], key=sv.key) == [
        "apa", "zebra", "åka", "ärlig", "öga"]
    # NFD and NFC forms of ä produce the SAME key
    assert sv.key("ärlig") == sv.key(unicodedata.normalize("NFC", "ärlig"))
    # uppercase tailored letters: same primary, case at tertiary
    assert sv.key("Ö") != sv.key("ö")
    assert CollationAnalyzer(locale="sv", strength="secondary").key("Ö") == \
        CollationAnalyzer(locale="sv", strength="secondary").key("ö")
    # phonebook: ä sorts between 'ae' and 'af' (expansion at secondary)
    ph = CollationAnalyzer(locale="de_phonebook")
    assert sorted(["af", "ä", "ae", "ad"], key=ph.key) == ["ad", "ae", "ä", "af"]
    # batch kernel byte-identical with tailorings active
    words = ["Åka", "ärlig", "zebra", "ärlig", ""]
    assert sv.keys(words) == [sv.key(w) for w in words]
    # contractions: a multi-char item compiles to ONE collation element
    # ('ch' after h, the Hungarian/Czech shape) — 'ch'-words sort after
    # every h-word while 'ci' stays in c; matching is case-sensitive
    cz = CollationAnalyzer(rules="& h < ch")
    assert sorted(["ca", "ha", "hz", "cha", "ci", "ia"], key=cz.key) == [
        "ca", "ci", "ha", "hz", "cha", "ia"]
    # Danish built-in chain incl. contractions — pinned real-ICU order
    da = CollationAnalyzer(locale="da")
    pinned = ["A", "a", "aA", "ab", "\u00c5", "AA", "Aa", "\u00e5", "aa", "aab"]
    assert sorted(pinned, key=lambda w: (da.key(w), w)) == pinned
    # NFD-level matching: 'a'+ring-composed a triggers the contraction
    assert da.key("a\u00e5") == da.key("aa\u030a")
    # batch kernel byte-identical with contractions active
    daw = ["aa", "a\u00e5", "Aalborg", "bAa", ""]
    assert da.keys(daw) == [da.key(w) for w in daw]
    with pytest.raises(ValueError, match="unknown collation locale"):
        CollationAnalyzer(locale="xx")


def test_segmentation_dictionary_breaking():
    """ICU-style dictionary breaking (r4): maximal Han/Thai runs bypass the
    per-char WB999 breaks and segment by minimum-pieces Viterbi over a
    pinned word list; mixed text keeps UAX#29 outside the runs; without a
    dictionary the per-char behavior is unchanged."""
    from iresearch_ray.functions.segmentation import (
        SegmentationAnalyzer, dict_segment)

    zh = ["北京", "大学", "北京大学", "生命", "起源", "研究", "研究生"]
    # leftmost-longest on ties; unknown chars become single-char pieces
    assert dict_segment("北京大学", frozenset(zh), 4) == ["北京大学"]
    assert dict_segment("研究生命起源", frozenset(zh), 4) == ["研究", "生命", "起源"]
    assert dict_segment("猫研究", frozenset(zh), 4) == ["猫", "研究"]

    ana = SegmentationAnalyzer(dictionary=zh, case="none")
    assert ana.tokenize_one("北京大学研究生命起源") == [
        "北京大学", "研究", "生命", "起源"]
    # mixed script: UAX#29 for Latin, dictionary for the Han run; the run
    # edge is boundary-safe
    assert ana.tokenize_one("I study 生命起源 daily") == [
        "I", "study", "生命", "起源", "daily"]

    th = SegmentationAnalyzer(dictionary=["สวัสดี", "ครับ"], case="none")
    assert th.tokenize_one("สวัสดีครับ") == ["สวัสดี", "ครับ"]

    # default stays pure UAX#29: per-char WB999 for ideographs
    plain = SegmentationAnalyzer(case="none")
    assert plain.tokenize_one("北京大学") == ["北", "京", "大", "学"]


def test_shipped_cjk_lexicon_loadbearing():
    """The shipped test lexicon (resources/cjk_test_lexicon.txt, ~1k words)
    drives the same Viterbi decisions the dd_cjk_tokens driver oracle pins:
    the decoy 机器学 must lose to 机器+学习模型 (greedy-longest would pick
    the decoy) and 北京大学+生活 must beat 北京+大学+生活 (min pieces)."""
    from iresearch_ray.functions.segmentation import (
        SegmentationAnalyzer, load_test_lexicon)

    lex = load_test_lexicon()
    assert len(lex) >= 1000
    for w in ("机器", "学习模型", "机器学", "北京大学", "北京", "大学", "生活"):
        assert w in lex
    ana = SegmentationAnalyzer(dictionary=lex)
    assert ana.tokenize_one("机器学习模型") == ["机器", "学习模型"]
    assert ana.tokenize_one("北京大学生活") == ["北京大学", "生活"]
    # adjacent injected runs never produce cross-boundary words (the
    # synthetic pool excludes every sentinel character)
    assert ana.tokenize_one("机器学习模型北京大学生活") == [
        "机器", "学习模型", "北京大学", "生活"]
    assert ana.tokenize_one("value 机器学习模型 merge") == [
        "value", "机器", "学习模型", "merge"]
