"""Ramer–Douglas–Peucker simplification — replaces @turf/simplify
(reference: simplifyGeoJSON src/lib/geojson-utils.ts:119-147, tolerance
= 1/10**coordinatePrecision, highQuality=true ⇒ pure RDP with
point-to-segment distance, no radial pre-pass — same as simplify-js).
"""

from __future__ import annotations

import numpy as np


def rdp(points: np.ndarray, tolerance: float) -> np.ndarray:
    """Iterative (stack-based) RDP on an (n,2) array; returns the kept
    points in original order. Distances are vectorized per split."""
    pts = np.asarray(points, dtype=np.float64)
    n = len(pts)
    if n <= 2 or tolerance <= 0:
        return pts.copy()
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    tol2 = tolerance * tolerance
    stack = [(0, n - 1)]
    while stack:
        lo, hi = stack.pop()
        if hi - lo < 2:
            continue
        seg = pts[lo + 1:hi]
        a, b = pts[lo], pts[hi]
        dx, dy = b[0] - a[0], b[1] - a[1]
        L2 = dx * dx + dy * dy
        if L2 == 0.0:
            d2 = (seg[:, 0] - a[0]) ** 2 + (seg[:, 1] - a[1]) ** 2
        else:
            t = np.clip(((seg[:, 0] - a[0]) * dx + (seg[:, 1] - a[1]) * dy) / L2, 0.0, 1.0)
            d2 = (seg[:, 0] - (a[0] + t * dx)) ** 2 + (seg[:, 1] - (a[1] + t * dy)) ** 2
        imax = int(np.argmax(d2))
        if d2[imax] > tol2:
            mid = lo + 1 + imax
            keep[mid] = True
            stack.append((lo, mid))
            stack.append((mid, hi))
    return pts[keep]


def rdp_ring(ring: np.ndarray, tolerance: float, min_points: int = 4) -> np.ndarray:
    """RDP for a closed ring (first == last). Keeps the ring closed and
    refuses to collapse below a valid polygon ring (4 points incl. the
    closing one) — mirrors turf/simplify's ring-validity guard."""
    r = np.asarray(ring, dtype=np.float64)
    if len(r) <= min_points:
        return r.copy()
    out = rdp(r, tolerance)
    tol = tolerance
    while len(out) < min_points and tol > 1e-12:
        tol /= 2.0
        out = rdp(r, tol)
    if len(out) < min_points:
        return r.copy()
    return out


def round_coords(arr: np.ndarray, precision: int | None) -> np.ndarray:
    """truncateGeoJSONDecimals (reference src/lib/geojson-utils.ts:59-107)
    via @turf/helpers round = Math.round(x*10^p)/10^p — JS Math.round is
    HALF-UP (toward +inf), so exact binary ties like 100.125 @ p=2 must
    give 100.13; np.round's half-to-even gave 100.12 and broke byte
    parity on .125/.375-style coordinates."""
    if precision is None:
        return np.asarray(arr, dtype=np.float64)
    m = 10.0 ** precision
    return np.floor(np.asarray(arr, dtype=np.float64) * m + 0.5) / m
