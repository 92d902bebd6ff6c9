"""Vectorized Hilbert-curve index (xy2d) over int64 grid coordinates.

Space-filling-curve locality is the reason tile stores order rows by a
curve key at all (the reference orders GeoJSON output per route; a
10^12-row tile table orders its storage layout by curve index so range
reads touch contiguous row groups). Hilbert beats Morton on the
clustering number — the count of contiguous index runs a query
rectangle decomposes into (Moon, Jagadish, Faloutsos, Saltz: "Analysis
of the clustering properties of the Hilbert space-filling curve") —
and ``q_hilbert_range_counts`` measures exactly that metric against
the Morton order on the synthesized tile table.

The algorithm is the published iterative base conversion (Wikipedia
"Hilbert curve"), expressed level-synchronously over the whole array:
``order`` iterations of O(n) numpy ops, never a per-point loop. The
scalar replay lives in geotile/oracle_ref.hilbert_xy2d.
"""

from __future__ import annotations

import numpy as np


def hilbert_xy2d(order: int, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Hilbert index of each (x, y) on the 2^order grid, int64.

    x, y must already be quantized to [0, 2^order) (geom.cells._quantize
    does this). order ≤ 31 keeps s*s and the final index in int64.
    """
    if not 1 <= order <= 31:
        raise ValueError("order must be in [1, 31]")
    x = np.asarray(x, dtype=np.int64).copy()
    y = np.asarray(y, dtype=np.int64).copy()
    d = np.zeros(x.shape, dtype=np.int64)
    s = np.int64(1) << (order - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate the quadrant: where ry == 0, (optionally flip) then swap
        flip = (ry == 0) & (rx == 1)
        np.subtract(s - 1, x, out=x, where=flip)
        np.subtract(s - 1, y, out=y, where=flip)
        swap = ry == 0
        xs = np.where(swap, y, x)
        y = np.where(swap, x, y)
        x = xs
        s >>= 1
    return d
