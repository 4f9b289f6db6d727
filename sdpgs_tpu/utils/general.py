"""General utilities (reference/utils/general_utils.py counterparts)."""

from __future__ import annotations

import random
import sys
from datetime import datetime

import numpy as np


def safe_state(quiet: bool = False, seed: int = 0) -> None:
    """Seed host RNGs and timestamp stdout lines
    (reference general_utils.py:122-143 seeds random/np/torch to 0; JAX keys
    are explicit so only host RNGs need seeding here)."""
    random.seed(seed)
    np.random.seed(seed)
    if not quiet:
        old_write = sys.stdout.write

        def write(x):
            if x.endswith("\n") and x != "\n":
                stamp = datetime.now().strftime("%d/%m %H:%M:%S")
                x = x.replace("\n", f" [{stamp}]\n")
            old_write(x)

        sys.stdout.write = write


def inverse_sigmoid_np(x: np.ndarray) -> np.ndarray:
    return np.log(x / (1.0 - x))
