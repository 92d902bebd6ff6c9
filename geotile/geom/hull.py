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

    def cross(o, a, b):
        v = (pts[a, 0] - pts[o, 0]) * (pts[b, 1] - pts[o, 1]) - (
            pts[a, 1] - pts[o, 1]
        ) * (pts[b, 0] - pts[o, 0])
        if -1e-200 < v < 1e-200:
            # underflow regime (subnormal spans / near-duplicate points):
            # the float cross can round to 0 or flip sign and pop a true
            # extreme vertex. Recompute exactly — Fraction(float) is
            # exact, and this branch never fires for real geo-range
            # coordinates, so the chain stays O(n) float in practice.
            from fractions import Fraction as F

            e = (F(pts[a, 0]) - F(pts[o, 0])) * (F(pts[b, 1]) - F(pts[o, 1])) - (
                F(pts[a, 1]) - F(pts[o, 1])
            ) * (F(pts[b, 0]) - F(pts[o, 0]))
            return 1.0 if e > 0 else (-1.0 if e < 0 else 0.0)
        return v

    # lexicographic sort by (x, y) — np.unique on axis=0 already did this
    idx = range(len(pts))
    lower: list[int] = []
    for i in idx:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], i) <= 0:
            lower.pop()
        lower.append(i)
    upper: list[int] = []
    for i in reversed(idx):
        while len(upper) >= 2 and cross(upper[-2], upper[-1], i) <= 0:
            upper.pop()
        upper.append(i)
    hull = pts[lower[:-1] + upper[:-1]]
    if len(hull) < 3:
        return None
    ring = np.vstack([hull, hull[:1]])
    # A sliver whose shoelace area underflows to 0 in the ORIGINAL coordinate
    # frame is indistinguishable from a collinear set downstream — treat it as
    # collinear (None), matching the reference's null-on-degenerate behavior.
    from .pip import signed_area

    if signed_area(ring) <= 0.0:
        return None
    return ring
