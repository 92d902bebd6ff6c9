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
    # Run the chain on min-max-normalized coordinates: a positive per-axis
    # affine map preserves lexicographic order and the sign of every cross
    # product, but keeps operands O(1) so subnormal spans (e.g. 5e-324) can't
    # underflow a cross product to 0 and pop a true extreme vertex.
    lo = pts.min(axis=0)
    span = pts.max(axis=0) - lo
    span[span == 0.0] = 1.0
    q = (pts - lo) / span

    def cross(o, a, b):
        return (q[a, 0] - q[o, 0]) * (q[b, 1] - q[o, 1]) - (
            q[a, 1] - q[o, 1]
        ) * (q[b, 0] - q[o, 0])

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
