"""Text normalizer parity vs the reference NSF normalizer (oracle)."""

import sys

import pytest

from ts_asr_whisper_tpu.txt_norm import get_text_norm

sys.path.insert(0, "/root/reference/src")
try:
    from txt_norm.english import EnglishTextNormalizer as RefNSF

    ref_norm = RefNSF()
    HAVE_REF = True
except Exception:
    HAVE_REF = False

CASES = [
    "Hello World!",
    "I can't believe it's 365 days already...",
    "That costs $20 and 50% more",
    "the 12th of May in the 90s",
    "Mr Smith and Dr Jones y'all gonna go",
    "Umm I uh think hmm it's okay",
    "we won't need 70 000 dollars",
    "wi fi setup everyday ROUTINE",
    "She'd been there, he's got it, they'll've",
    "one hundred percent (aside) [noise] <tag>",
]


@pytest.mark.skipif(not HAVE_REF, reason="reference normalizer unavailable")
@pytest.mark.parametrize("case", CASES)
def test_nsf_matches_reference(case):
    ours = get_text_norm("whisper_nsf")
    assert ours(case) == ref_norm(case), case


def test_identity_norm():
    assert get_text_norm(None)("Hello") == "Hello"
    assert get_text_norm("other")("Hello") == "Hello"


@pytest.mark.skipif(not HAVE_REF, reason="reference normalizer unavailable")
def test_nsf_idempotent():
    ours = get_text_norm("whisper_nsf")
    for case in CASES:
        once = ours(case)
        assert ours(once) == once


@pytest.mark.skipif(not HAVE_REF, reason="reference normalizer unavailable")
def test_nsf_with_reference_spelling_maps(monkeypatch):
    """With the UK->US spelling JSONs supplied as external data (pointing at
    the reference's own assets), our NSF normalizer matches the reference on
    UK spellings too."""
    import os

    base = "/root/reference/src/txt_norm"
    if not os.path.exists(f"{base}/english.json"):
        pytest.skip("reference spelling assets unavailable")
    monkeypatch.setenv("TSAW_SPELLING_JSON", f"{base}/english.json")
    monkeypatch.setenv("TSAW_PRE_SPELLING_JSON", f"{base}/pre_english.json")
    from ts_asr_whisper_tpu.txt_norm.nsf import NsfEnglishTextNormalizer

    ours = NsfEnglishTextNormalizer()
    cases = [
        "The colour of the organised labour programme",
        "a metre of fibre at the theatre centre",
        "I analysed the behaviour of my neighbour",
    ] + CASES
    for case in cases:
        assert ours(case) == ref_norm(case), case
