"""Console/reproducibility setup (the reference's ``safe_state``).

Behavioral parity: ``utils/general_utils.py:130-151`` — wraps stdout so every
line is suffixed with a timestamp, optionally silences output under
``--quiet``, and seeds the host RNGs for run-to-run comparability. The
reference also pins ``cuda:0``; the TPU analog is a no-op (device selection
belongs to the jax platform config / mesh).
"""

from __future__ import annotations

import random
import sys
from datetime import datetime

import numpy as np


class _TimestampedStream:
    def __init__(self, stream, silent: bool):
        self._stream = stream
        self._silent = silent

    def write(self, text: str):
        if self._silent:
            return
        if text.endswith("\n"):
            body = text[:-1]
            if body:
                stamp = datetime.now().strftime("%d/%m %H:%M:%S")
                text = body.replace("\n", f" [{stamp}]\n") + f" [{stamp}]\n"
        self._stream.write(text)

    def flush(self):
        self._stream.flush()

    def __getattr__(self, name):
        return getattr(self._stream, name)


def safe_state(silent: bool = False, seed: int = 0) -> None:
    """Timestamp (or silence) stdout and seed host RNGs (general_utils.py:130-151)."""
    sys.stdout = _TimestampedStream(sys.stdout, silent)
    random.seed(seed)
    np.random.seed(seed)
