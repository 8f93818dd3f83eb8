"""Hallucination-guard parity vs the reference postprocess module
(/root/reference/src/data/postprocess.py)."""

import sys

import numpy as np
import pytest

from oracles import REFERENCE_SRC

if REFERENCE_SRC not in sys.path:
    sys.path.insert(0, REFERENCE_SRC)
ref_pp = pytest.importorskip("data.postprocess")

from ts_asr_whisper_tpu.eval.postprocess import (  # noqa: E402
    truncate_at_repeating_ngram,
)

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "Alpha"]


def _cases():
    rng = np.random.default_rng(7)
    cases = [
        "short text stays as is",
        " ".join(["word"] * 50),                       # unigram run
        " ".join(["go", "stop"] * 40),                  # repeated 2-gram
        " ".join(["a", "b", "c"] * 25),                 # repeated 3-gram
        " ".join(rng.choice(WORDS, 60)),                # soup, few repeats
        " ".join(list(rng.choice(WORDS, 25)) + ["x", "y"] * 30),
        " ".join(["pre"] * 5 + ["one", "two", "three"] * 15 + ["post"] * 5),
    ]
    for _ in range(20):
        n = int(rng.integers(5, 120))
        cases.append(" ".join(rng.choice(WORDS + ["dup"] * 4, n)))
    return cases


@pytest.mark.parametrize("i,text", list(enumerate(_cases())))
def test_truncate_parity(i, text):
    ours = truncate_at_repeating_ngram(text)
    theirs = ref_pp.truncate_at_repeating_ngram(text)
    assert ours == theirs, (i, ours, theirs)
