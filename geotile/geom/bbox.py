"""Bounding box / envelope — replaces @turf/bbox + @turf/bbox-polygon
(reference: src/lib/formats/envelope.ts:14). Partial+final aggregate:
each block reduces to 4 scalars; the driver combines (SURVEY §2.5 A1).
"""

from __future__ import annotations

import numpy as np


def bbox_partial(xs: np.ndarray, ys: np.ndarray) -> tuple[float, float, float, float]:
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    if len(xs) == 0:
        return (np.inf, np.inf, -np.inf, -np.inf)
    return (float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max()))


def bbox_merge(a: tuple, b: tuple) -> tuple[float, float, float, float]:
    return (min(a[0], b[0]), min(a[1], b[1]), max(a[2], b[2]), max(a[3], b[3]))


def bbox_polygon(bb: tuple[float, float, float, float]) -> np.ndarray:
    """bbox → closed 5-point CCW rectangle ring, same vertex order as
    @turf/bbox-polygon ([w,s] [e,s] [e,n] [w,n] [w,s])."""
    w, s, e, n = bb
    return np.array([[w, s], [e, s], [e, n], [w, n], [w, s]], dtype=np.float64)
