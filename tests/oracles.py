"""Import the PyTorch reference implementation as a *test oracle*.

The reference at /root/reference is read-only and is never shipped in this
package; tests import it to verify numerical parity (SURVEY.md §4 requires
bit-match fixtures vs the PyTorch reference). Tests using it must skip
gracefully if the reference or its deps are unavailable.
"""

import sys

REFERENCE_SRC = "/root/reference/src"


def load_reference_dicow():
    """Returns (DiCoWConfig, DiCoWForConditionalGeneration) from the
    reference, or raises ImportError."""
    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)
    from models.dicow.config import DiCoWConfig as RefDiCoWConfig
    from models.dicow.modeling_dicow import (
        DiCoWForConditionalGeneration as RefDiCoW,
    )

    return RefDiCoWConfig, RefDiCoW
