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


# -----------------------------------------------------------------------------
# vendored Whisper EnglishTextNormalizer: byte-identical to transformers
# -----------------------------------------------------------------------------

WHISPER_CASES = CASES + [
    "twenty one pilots",
    "one hundred and twenty three thousand four hundred and fifty six",
    "minus five degrees, plus two",
    "three dollars and seven cents",
    "twenty dollars fifty",
    "$20 million and €3.5 billion",
    "nineteen sixty seven",
    "one oh one dalmatians",
    "double oh seven",
    "triple nine emergency",
    "two point five percent",
    "seven and a half hours",
    "a hundred and a half",
    "the nineteen seventies and 1960s",
    "first second third fourth twelfth hundredth",
    "fifties sixties seventies",
    "two thirds and three quarters",
    "IP address ten dot zero dot zero dot one",
    "10.0.0.1 and 192.168.1.1",
    "one million billion",
    "zero zero seven",
    "I owe you $1,234.56 okay?",
    "naïve café jalapeño über señor",
    "Mr. O'Brien's co-operative colour flavour organisation",
    "he's been there she'd gone they've left we're here",
    "won't can't let's ain't y'all i'ma",
    "thirty-two degrees",
    "4th of July, 22nd street, 1st place",
    "100000000 dollars",
    "point five",
    "five point",
    "one one one",
    "sixty six six",
    "eleven hundred",
    "five hundred thousand million",
    "per cent and percent",
    "two per cent",
    "two per day",
    "œdipus æsthetic ßtraße łódź þing ðat",
]


def _hf_whisper_norm():
    import json
    import os

    from transformers.models.whisper.english_normalizer import (
        EnglishTextNormalizer as HFNorm,
    )

    asset = os.path.join(os.path.dirname(get_text_norm.__code__.co_filename),
                         "english.json")
    with open(asset) as f:
        return HFNorm(json.load(f))


@pytest.mark.parametrize("case", WHISPER_CASES)
def test_whisper_norm_matches_transformers(case):
    ours = get_text_norm("whisper")
    ref = _hf_whisper_norm()
    assert ours(case) == ref(case), case


def test_whisper_norm_no_transformers_import():
    """The vendored normalizer must not import transformers."""
    import subprocess
    import sys

    code = (
        "import sys\n"
        "from ts_asr_whisper_tpu.txt_norm import get_text_norm\n"
        "n = get_text_norm('whisper')\n"
        "out = n('Mr Smith owes $1,234.56 and twenty one pounds')\n"
        "assert 'transformers' not in sys.modules, 'transformers imported'\n"
        "print(out)\n"
    )
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    assert r.stdout.strip() == "mister smith owes $1234.56 and £21"


def test_whisper_norm_fuzz_matches_transformers():
    """Randomized compositions of number/currency/contraction vocab."""
    import numpy as np

    ours = get_text_norm("whisper")
    ref = _hf_whisper_norm()
    vocab = (
        "one two three nine ten eleven nineteen twenty ninety hundred "
        "thousand million billion first second third tenth twentieth "
        "hundredth ones twos sixes twenties oh zero o point double triple "
        "and a half minus plus dollar dollars cents pound euros percent per "
        "cent 5 42 3.14 1,000 $7 he's won't we'll colour organise the cat "
        "sat on a mat Dr Mr St 22nd 1st 1960s behaviour").split()
    rng = np.random.default_rng(0)
    for _ in range(300):
        n = int(rng.integers(1, 12))
        words = [vocab[int(i)] for i in rng.integers(0, len(vocab), n)]
        s = " ".join(words)
        assert ours(s) == ref(s), s
