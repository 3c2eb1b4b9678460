"""Small k-means (reference: core/src/utils/kmeans.h — used for signal
clustering in the fork's analysis utilities)."""

from __future__ import annotations

from typing import Tuple

import numpy as np


def kmeans(points: np.ndarray, k: int, iters: int = 50,
           seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """points [N, D] → (centers [k, D], assignment [N])."""
    points = np.asarray(points, np.float64)
    n = len(points)
    rng = np.random.default_rng(seed)
    centers = points[rng.choice(n, size=min(k, n), replace=False)]
    if len(centers) < k:
        centers = np.concatenate(
            [centers, np.zeros((k - len(centers), points.shape[1]))])
    assign = np.full(n, -1, np.int64)   # sentinel: never equals a label
    for _ in range(iters):
        d = np.linalg.norm(points[:, None, :] - centers[None], axis=-1)
        new_assign = np.argmin(d, axis=1)
        if np.array_equal(new_assign, assign):
            break
        assign = new_assign
        for j in range(k):
            sel = points[assign == j]
            if len(sel):
                centers[j] = sel.mean(axis=0)
    return centers, assign
