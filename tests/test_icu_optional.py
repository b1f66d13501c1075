"""Optional PyICU parity — the documented swap-in for the built-in UCA
collation and UAX#29 segmentation (VERDICT r3 next-round #8).

Without PyICU (this container): the registry entries exist and raise a
clear NotImplementedError; everything else skips.  With PyICU: the ICU
variants must order-agree with the built-in collation on Latin text and
token-agree with the built-in segmentation on non-dictionary scripts.
"""

import random

import pytest

from iresearch_ray.functions.analysis import get_analyzer


def test_registry_entries_exist_and_fail_loudly_without_icu():
    try:
        import icu  # noqa: F401

        pytest.skip("PyICU present; covered by the parity tests below")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="PyICU"):
        get_analyzer("icu_collation")
    with pytest.raises(NotImplementedError, match="PyICU"):
        get_analyzer("icu_segmentation")


WORDS = ["the", "Agent", "café", "Cote", "coté", "côte", "côté", "Straße",
         "strasse", "x-9", "x 9", "ZOO", "zoo", "a"]


def _fuzz_strings(n=400, seed=11):
    rng = random.Random(seed)
    return ["".join(rng.choice(WORDS) + rng.choice(" -") for _ in range(rng.randint(1, 5))).strip()
            for _ in range(n)]


def test_icu_collation_order_parity_latin():
    pytest.importorskip("icu")
    builtin = get_analyzer("collation")
    icu_a = get_analyzer("icu_collation")
    texts = _fuzz_strings()
    a = sorted(texts, key=builtin.key)
    b = sorted(texts, key=icu_a.key)
    assert a == b


def test_icu_segmentation_token_parity():
    pytest.importorskip("icu")
    builtin = get_analyzer("segmentation")
    icu_a = get_analyzer("icu_segmentation")
    samples = [
        "The quick (brown) fox can't stop; e.g. 3.14 isn't x@y.com!",
        "tabs\tand  spaces\nnewlines",
        "hyphen-ated words_with_underscores 1,000.5",
    ]
    assert builtin(samples) == icu_a(samples)
