"""Small numpy helpers shared by the similarity operators."""

from __future__ import annotations

import numpy as np


def normalize_rows(X: np.ndarray) -> np.ndarray:
    """L2-normalize rows; zero rows stay zero."""
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return X / norms
