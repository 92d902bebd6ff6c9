"""Convex hull (Andrew's monotone chain) — replaces @turf/convex
(reference call: src/lib/formats/convex.ts:11).

The hull is an associative partial+final aggregate: hull(A ∪ B) =
hull(hull(A) ∪ hull(B)), so ``map_batches`` computes per-block partial
hulls and the tiny final combine runs on the driver (SURVEY §2.5 A2).
"""

from __future__ import annotations

import numpy as np


def convex_hull(points: np.ndarray) -> np.ndarray | None:
    """(n,2) points → closed CCW hull ring ((h+1,2)), or None when all
    points are collinear / fewer than 3 distinct points (the reference
    warns and returns null in that case, src/lib/formats/convex.ts:13-22).
    """
    pts = np.unique(np.asarray(points, dtype=np.float64), axis=0)
    if len(pts) < 3:
        return None
    # lexicographic sort by (x, y) — np.unique on axis=0 already did this
    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower: list[np.ndarray] = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list[np.ndarray] = []
    for p in pts[::-1]:
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    hull = np.array(lower[:-1] + upper[:-1])
    if len(hull) < 3:
        return None
    return np.vstack([hull, hull[:1]])
