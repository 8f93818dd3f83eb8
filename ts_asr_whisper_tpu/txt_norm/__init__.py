"""Text normalizers for WER scoring.

Mirrors /root/reference/src/txt_norm/__init__.py:13-19:
- 'whisper'      -> the stock Whisper EnglishTextNormalizer (we reuse the
                    implementation shipped in transformers) with an optional
                    UK->US spelling mapping JSON;
- 'whisper_nsf'  -> the CHiME-8/NOTSOFAR English normalizer (reverse number
                    spelling, filler removal, contraction expansion) —
                    reimplemented in nsf.py;
- anything else  -> identity.

Spelling-mapping JSONs (tysto UK->US list) are external data assets; pass
paths via ``spelling_mapping_path`` or the TSAW_SPELLING_JSON /
TSAW_PRE_SPELLING_JSON env vars.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Optional


def get_text_norm(t_norm: Optional[str],
                  spelling_mapping_path: Optional[str] = None
                  ) -> Callable[[str], str]:
    if t_norm == "whisper":
        from transformers.models.whisper.english_normalizer import (
            EnglishTextNormalizer,
        )

        path = spelling_mapping_path or os.environ.get("TSAW_SPELLING_JSON")
        mapping = {}
        if path and os.path.exists(path):
            with open(path) as f:
                mapping = json.load(f)
        return EnglishTextNormalizer(mapping)
    if t_norm == "whisper_nsf":
        from .nsf import NsfEnglishTextNormalizer

        return NsfEnglishTextNormalizer()
    return lambda x: x
