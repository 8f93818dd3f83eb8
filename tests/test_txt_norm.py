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
