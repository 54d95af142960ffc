"""Driver-side numpy reference for K-means (test oracle only).

Replicates `clustering.kmeans` step for step: init = k ids with the smallest
md5-prefix hash (the engine's cross-engine hash convention), Lloyd
assignment with ties to the lowest cluster index, mean update, empty
clusters keep their centroid.  Float sums here are sequential while Spark's
are partial-aggregated, so comparisons use tolerances for centroids and a
match-fraction for assignments (boundary points may flip on 1e-15 noise).
"""

from __future__ import annotations

import hashlib

import numpy as np


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def lloyd_reference(
    ids: list[str], xy: np.ndarray, k: int, max_iters: int
) -> tuple[dict[str, int], list[tuple[float, float]]]:
    order = sorted(range(len(ids)), key=lambda i: _h(ids[i]))
    centroids = [tuple(map(float, xy[i])) for i in order[:k]]
    assign = None
    for _ in range(max_iters):
        c = np.array(centroids)
        d2 = ((xy[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        lab = d2.argmin(axis=1)  # argmin takes the first (lowest index) tie
        new_centroids = list(centroids)
        for j in range(k):
            m = lab == j
            if m.any():
                new_centroids[j] = (float(xy[m, 0].mean()), float(xy[m, 1].mean()))
        moved = max(
            (a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2
            for a, b in zip(centroids, new_centroids)
        )
        assign = {ids[i]: int(lab[i]) for i in range(len(ids))}
        centroids = new_centroids
        if moved < 1e-12:
            break
    return assign, centroids
