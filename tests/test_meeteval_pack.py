"""Validate the WER engines against committed meeteval fixture packs.

A pack (tests/fixtures/meeteval_pack*.json) holds sessions plus EXPECTED
per-metric error counts — either captured from actual meeteval on a
meeteval-equipped machine (scripts/crosscheck_meeteval.py --write-pack) or
hand-derived from the metric definitions (meeteval_pack_hand.json). Once a
meeteval-sourced pack is committed, equivalence with meeteval itself stops
being an assumption of this zero-egress environment: this test re-validates
the engines against the recorded verdict on every run, forever.

Reference engines being matched: /root/reference/src/utils/wer.py:30-106
(meeteval tcpwer/cpwer/orcwer wrappers).
"""

import importlib.util
import json
from pathlib import Path

import pytest

_FIXTURES = Path(__file__).parent / "fixtures"
_PACKS = sorted(_FIXTURES.glob("meeteval_pack*.json"))


def _load_crosscheck():
    """Import scripts/crosscheck_meeteval.py (not a package) by path so the
    pack-checking logic is shared, not duplicated."""
    path = Path(__file__).parent.parent / "scripts" / "crosscheck_meeteval.py"
    spec = importlib.util.spec_from_file_location("crosscheck_meeteval", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize(
    "pack", _PACKS or [None],
    ids=[p.name for p in _PACKS] or ["absent"])
def test_meeteval_pack(pack):
    if pack is None:
        pytest.skip("no committed meeteval fixture pack")
    mod = _load_crosscheck()
    data = json.loads(pack.read_text())
    collar = data["meta"]["collar"]
    assert data["sessions"], f"{pack.name} holds no sessions"
    bad = []
    for i, sess in enumerate(data["sessions"]):
        bad.extend(mod.check_session(sess["ref"], sess["hyp"], sess,
                                     collar, label=f"[{i}]"))
    assert not bad, f"{pack.name}:\n" + "\n".join(bad)
