"""Raster↔vector conversion — from-scratch replacement for polygon
buffering/union (@turf/buffer, @turf/union in the reference:
src/lib/formats/lines-buffer.ts:12, src/lib/geojson-utils.ts:159-170)
and the north_rule's "rasterize route buffers into tile masks and
vectorize tile coverage back to polygons".

Pipeline pieces (all pure numpy):

  polygon_mask      rings → boolean pixel mask (even-odd scanline fill)
  distance_mask     polyline + radius → mask of pixels within radius
                    (this IS the line buffer, computed exactly per pixel)
  trace_mask        boolean mask → closed boundary rings via marching
                    squares (deterministic; outer rings CCW, holes CW,
                    filled region always on the LEFT of travel)
  mask_to_polygons  rings → [(outer, [holes])] with hole containment
  polygon_cover_cells / cells_to_mask
                    polygon ↔ cell-id set at a cells.py resolution

Frames: a ``Grid`` is an axis-aligned frame with pixel (ix, iy) center
at (x0 + (ix+0.5)*step, y0 + (iy+0.5)*step); y increases upward so the
usual CCW = positive-signed-area convention holds.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from geotile.geom import cells as cellmod
from geotile.geom.pip import signed_area, points_in_polygon


@dataclass(frozen=True)
class Grid:
    x0: float
    y0: float
    step: float
    nx: int
    ny: int

    def centers_x(self) -> np.ndarray:
        return self.x0 + (np.arange(self.nx) + 0.5) * self.step

    def centers_y(self) -> np.ndarray:
        return self.y0 + (np.arange(self.ny) + 0.5) * self.step


def grid_for_bounds(
    xmin: float, ymin: float, xmax: float, ymax: float, step: float, pad: float = 0.0
) -> Grid:
    x0 = xmin - pad
    y0 = ymin - pad
    nx = max(1, int(np.ceil((xmax + pad - x0) / step)) + 1)
    ny = max(1, int(np.ceil((ymax + pad - y0) / step)) + 1)
    return Grid(x0, y0, step, nx, ny)


def polygon_mask(
    rings: list[np.ndarray], grid: Grid,
    window: tuple[int, int, int, int] | None = None,
) -> np.ndarray:
    """Even-odd scanline fill of a polygon (outer ring + holes) into a
    boolean (ny, nx) mask: pixel is filled iff its CENTER is inside.

    ``window=(i0, i1, j0, j1)`` fills only that sub-rectangle (shape
    (j1-j0, i1-i0)) — ALL arithmetic stays in the full grid's frame
    (crossings strictly left of the window fold into its first column,
    preserving parity), so the windowed fill is BIT-IDENTICAL to the
    corresponding slice of the full fill.  This is the dissolve's
    per-feature fast path: a small disc fills a ~17x17 window instead
    of allocating and cumsumming the whole metro grid."""
    if window is None:
        i0, i1, j0, j1 = 0, grid.nx, 0, grid.ny
    else:
        i0, i1, j0, j1 = window
        if i1 <= i0 or j1 <= j0:  # fully outside the grid
            return np.zeros((max(0, j1 - j0), max(0, i1 - i0)), bool)
    mask_acc = np.zeros((j1 - j0, i1 - i0), dtype=np.int32)
    yc = grid.centers_y()
    for ring in rings:
        r = np.asarray(ring, dtype=np.float64)
        if len(r) < 3:
            continue
        if not (r[0] == r[-1]).all():
            r = np.vstack([r, r[:1]])
        x1, y1 = r[:-1, 0], r[:-1, 1]
        x2, y2 = r[1:, 0], r[1:, 1]
        keep = y1 != y2
        x1, y1, x2, y2 = x1[keep], y1[keep], x2[keep], y2[keep]
        if len(x1) == 0:
            continue
        # rows each edge crosses: half-open [min_y, max_y)
        lo = np.minimum(y1, y2)
        hi = np.maximum(y1, y2)
        r0 = np.ceil((lo - grid.y0) / grid.step - 0.5).astype(np.int64)
        r1 = np.ceil((hi - grid.y0) / grid.step - 0.5).astype(np.int64)
        np.clip(r0, j0, j1, out=r0)
        np.clip(r1, j0, j1, out=r1)
        for e in range(len(x1)):
            rows = np.arange(r0[e], r1[e])
            if len(rows) == 0:
                continue
            y = yc[rows]
            xint = x1[e] + (y - y1[e]) * (x2[e] - x1[e]) / (y2[e] - y1[e])
            # c0 = first pixel index whose center is >= the crossing; the
            # crossing is "to the left" of pixels ix >= c0
            c0 = np.ceil((xint - grid.x0) / grid.step - 0.5).astype(np.int64)
            valid = c0 < i1
            rows, c0 = rows[valid], np.maximum(c0[valid] - i0, 0)
            np.add.at(mask_acc, (rows - j0, c0), 1)
    parity = np.cumsum(mask_acc, axis=1)  # crossings at-or-left of each pixel center
    return (parity % 2).astype(bool)


def distance_mask(line: np.ndarray, radius: float, grid: Grid) -> np.ndarray:
    """Mask of pixels whose center lies within ``radius`` of the polyline
    — the exact raster of a round-capped/round-joined line buffer.
    Vectorized per segment over the segment's local pixel window."""
    mask = np.zeros((grid.ny, grid.nx), dtype=bool)
    pts = np.asarray(line, dtype=np.float64)
    if len(pts) == 0:
        return mask
    xc = grid.centers_x()
    yc = grid.centers_y()
    segs = zip(pts[:-1], pts[1:]) if len(pts) > 1 else [(pts[0], pts[0])]
    for a, b in segs:
        xmin = min(a[0], b[0]) - radius
        xmax = max(a[0], b[0]) + radius
        ymin = min(a[1], b[1]) - radius
        ymax = max(a[1], b[1]) + radius
        i0 = max(0, int(np.floor((xmin - grid.x0) / grid.step - 0.5)))
        i1 = min(grid.nx, int(np.ceil((xmax - grid.x0) / grid.step + 0.5)))
        j0 = max(0, int(np.floor((ymin - grid.y0) / grid.step - 0.5)))
        j1 = min(grid.ny, int(np.ceil((ymax - grid.y0) / grid.step + 0.5)))
        if i0 >= i1 or j0 >= j1:
            continue
        X = xc[i0:i1][None, :]
        Y = yc[j0:j1][:, None]
        dx, dy = b[0] - a[0], b[1] - a[1]
        L2 = dx * dx + dy * dy
        if L2 == 0.0:
            d2 = (X - a[0]) ** 2 + (Y - a[1]) ** 2
        else:
            t = np.clip(((X - a[0]) * dx + (Y - a[1]) * dy) / L2, 0.0, 1.0)
            d2 = (X - (a[0] + t * dx)) ** 2 + (Y - (a[1] + t * dy)) ** 2
        mask[j0:j1, i0:i1] |= d2 <= radius * radius
    return mask


# ---------------------------------------------------------------------------
# marching squares
# ---------------------------------------------------------------------------
# Case index = v00 | v10<<1 | v11<<2 | v01<<3 where v00 is the pixel at
# (ix, iy), v10 at (ix+1, iy), v11 at (ix+1, iy+1), v01 at (ix, iy+1),
# y-up. Each case emits directed segments between edge midpoints with
# the FILLED side on the left of travel. Midpoints in doubled-integer
# node space (node (ix,iy) = pixel center): S=(2ix+1,2iy), E=(2ix+2,2iy+1),
# N=(2ix+1,2iy+2), W=(2ix,2iy+1). Saddles (5, 10) are resolved as
# "diagonal not connected" (4-connectivity of the filled region).

_S, _E, _N, _W = 0, 1, 2, 3
_CASE_SEGMENTS: dict[int, list[tuple[int, int]]] = {
    1: [(_S, _W)],
    2: [(_E, _S)],
    3: [(_E, _W)],
    4: [(_N, _E)],
    5: [(_S, _W), (_N, _E)],
    6: [(_N, _S)],
    7: [(_N, _W)],
    8: [(_W, _N)],
    9: [(_S, _N)],
    10: [(_E, _S), (_W, _N)],
    11: [(_E, _N)],
    12: [(_W, _E)],
    13: [(_S, _E)],
    14: [(_W, _S)],
}


def _midpoint_coords(which: int, ix: np.ndarray, iy: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    if which == _S:
        return 2 * ix + 1, 2 * iy
    if which == _E:
        return 2 * ix + 2, 2 * iy + 1
    if which == _N:
        return 2 * ix + 1, 2 * iy + 2
    return 2 * ix, 2 * iy + 1  # _W


def trace_mask(mask: np.ndarray, grid: Grid) -> list[np.ndarray]:
    """Boolean (ny, nx) mask → list of closed rings in world coords.
    Outer rings are CCW (signed_area > 0), holes CW. Deterministic:
    rings start at the smallest doubled-integer key and are returned
    sorted by that key."""
    m = np.zeros((mask.shape[0] + 2, mask.shape[1] + 2), dtype=np.uint8)
    m[1:-1, 1:-1] = mask
    v00 = m[:-1, :-1]
    v10 = m[:-1, 1:]
    v11 = m[1:, 1:]
    v01 = m[1:, :-1]
    case = (v00 | (v10 << 1) | (v11 << 2) | (v01 << 3)).astype(np.uint8)
    # keys pack doubled (x, y) node coords as x*key_mult + y; y ranges up
    # to 2*(ny+1)+2, so the multiplier must exceed that
    key_mult = np.int64(2 * (mask.shape[0] + 3))
    nxt: dict[int, int] = {}
    for c, segs in _CASE_SEGMENTS.items():
        jy, jx = np.nonzero(case == c)
        if len(jx) == 0:
            continue
        for frm, to in segs:
            fx, fy = _midpoint_coords(frm, jx, jy)
            tx, ty = _midpoint_coords(to, jx, jy)
            fkeys = fx.astype(np.int64) * key_mult + fy
            tkeys = tx.astype(np.int64) * key_mult + ty
            nxt.update(zip(fkeys.tolist(), tkeys.tolist()))
    rings: list[np.ndarray] = []
    visited: set[int] = set()
    for start in sorted(nxt):
        if start in visited:
            continue
        ring_keys = [start]
        visited.add(start)
        cur = nxt[start]
        while cur != start:
            ring_keys.append(cur)
            visited.add(cur)
            cur = nxt[cur]
        ring_keys.append(start)
        arr = np.asarray(ring_keys, dtype=np.int64)
        kx = arr // key_mult
        ky = arr % key_mult
        # doubled node coords → world: node = k/2 - 1 (padding), pixel
        # center world = origin + (node + 0.5) * step
        wx = grid.x0 + (kx / 2.0 - 1.0 + 0.5) * grid.step
        wy = grid.y0 + (ky / 2.0 - 1.0 + 0.5) * grid.step
        rings.append(np.column_stack([wx, wy]))
    return rings


def mask_to_polygons(mask: np.ndarray, grid: Grid) -> list[tuple[np.ndarray, list[np.ndarray]]]:
    """Mask → list of (outer_ring, [hole_rings]): orientation splits
    outers from holes; each hole is assigned to the smallest-area outer
    that contains its interior-leaning probe point."""
    return rings_to_polygons(trace_mask(mask, grid))


def _contains(pt: np.ndarray, ring: np.ndarray) -> bool:
    return bool(points_in_polygon(np.array([pt[0]]), np.array([pt[1]]), [ring])[0])


# ---------------------------------------------------------------------------
# polygon ↔ cell-id set (the H3-mask side of raster↔vector)
# ---------------------------------------------------------------------------

def polygon_cover_cells(
    rings: list[np.ndarray], res: int, return_interior: bool = False
) -> np.ndarray | tuple[np.ndarray, np.ndarray]:
    """uint64 cell ids (cells.py, resolution ``res``) that the polygon
    touches: all cells whose center is inside (scanline) plus every cell
    crossed by a boundary edge (supercover grid traversal) — a superset
    of the true intersection set is fine for join candidate generation;
    the exact PIP test runs on candidates afterwards.

    With ``return_interior=True`` also returns the FULLY-INSIDE subset
    (center inside and not crossed by any boundary edge): points in
    those cells are inside the polygon with no further test — the
    "full containment" fast path of the spatial join."""
    dlon, dlat = cellmod.cell_size_degrees(res)
    allx = np.concatenate([np.asarray(r)[:, 0] for r in rings])
    ally = np.concatenate([np.asarray(r)[:, 1] for r in rings])
    n = 1 << res
    ix_min = int(np.floor((allx.min() + 180.0) / dlon)) - 1
    iy_min = int(np.floor((ally.min() + 90.0) / dlat)) - 1
    # local frame origin aligned with the global cell lattice
    x0 = -180.0 + ix_min * dlon
    nx = int(np.ceil((allx.max() + 180.0) / dlon)) - ix_min + 2
    ny = int(np.ceil((ally.max() + 90.0) / dlat)) - iy_min + 2
    # center-inside fill: reuse polygon_mask on a lon-scaled frame.
    # polygon_mask assumes square steps, so scale lat into lon units.
    sy = dlon / dlat
    scaled = [np.column_stack([np.asarray(r)[:, 0], np.asarray(r)[:, 1] * sy]) for r in rings]
    g = Grid(x0=x0, y0=(-90.0 + iy_min * dlat) * sy, step=dlon, nx=nx, ny=ny)
    inside = polygon_mask(scaled, g)
    # boundary supercover: mark every cell an edge passes through
    # (exact parametric traversal — no false negatives, no dilation)
    edge = np.zeros_like(inside)
    for r in rings:
        r = np.asarray(r, dtype=np.float64)
        for k in range(len(r) - 1):
            _supercover_mark(edge, r[k], r[k + 1], ix_min, iy_min, dlon, dlat)
    m = inside | edge

    def _ids(mm: np.ndarray) -> np.ndarray:
        jy, jx = np.nonzero(mm)
        # CLAMP, matching cells._quantize (and its SQL oracle replay):
        # a % n wrap sent east-edge cells to column 0 while encode()
        # clamps points at lon=180 to column n-1 — the one disagreement
        # that could produce a candidate-pruning FALSE NEGATIVE at the
        # antimeridian (out of the engine's meter-frame domain, but the
        # no-false-negative invariant should not depend on that)
        gx = np.clip(jx + ix_min, 0, n - 1)
        gy = np.clip(jy + iy_min, 0, n - 1)
        return np.unique(cellmod.from_ixy(gx.astype(np.uint64), gy.astype(np.uint64), res))

    if return_interior:
        return _ids(m), _ids(inside & ~edge)
    return _ids(m)


def _supercover_mark(
    m: np.ndarray, a: np.ndarray, b: np.ndarray,
    ix_min: int, iy_min: int, dlon: float, dlat: float,
) -> None:
    """Mark ALL grid cells the segment a→b passes through — exact: split
    the segment at every grid-line crossing (parametric) and mark the
    cell containing each sub-segment midpoint."""
    ax = (a[0] + 180.0) / dlon - ix_min
    ay = (a[1] + 90.0) / dlat - iy_min
    bx = (b[0] + 180.0) / dlon - ix_min
    by = (b[1] + 90.0) / dlat - iy_min
    dx, dy = bx - ax, by - ay
    ts = [np.array([0.0, 1.0])]
    if dx != 0.0:
        gx = np.arange(np.ceil(min(ax, bx)), np.floor(max(ax, bx)) + 1)
        ts.append((gx - ax) / dx)
    if dy != 0.0:
        gy = np.arange(np.ceil(min(ay, by)), np.floor(max(ay, by)) + 1)
        ts.append((gy - ay) / dy)
    t = np.unique(np.clip(np.concatenate(ts), 0.0, 1.0))
    tm = (t[:-1] + t[1:]) / 2.0
    xs = np.floor(ax + dx * tm).astype(np.int64)
    ys = np.floor(ay + dy * tm).astype(np.int64)
    ok = (xs >= 0) & (xs < m.shape[1]) & (ys >= 0) & (ys < m.shape[0])
    m[ys[ok], xs[ok]] = True


def segment_cover_cells(a, b, res: int) -> np.ndarray:
    """uint64 cell ids (cells.py) that segment a→b passes through —
    exact parametric traversal in the global cell lattice."""
    dlon, dlat = cellmod.cell_size_degrees(res)
    n = 1 << res
    ax, ay = (a[0] + 180.0) / dlon, (a[1] + 90.0) / dlat
    bx, by = (b[0] + 180.0) / dlon, (b[1] + 90.0) / dlat
    dx, dy = bx - ax, by - ay
    ts = [np.array([0.0, 1.0])]
    if dx != 0.0:
        gx = np.arange(np.ceil(min(ax, bx)), np.floor(max(ax, bx)) + 1)
        ts.append((gx - ax) / dx)
    if dy != 0.0:
        gy = np.arange(np.ceil(min(ay, by)), np.floor(max(ay, by)) + 1)
        ts.append((gy - ay) / dy)
    t = np.unique(np.clip(np.concatenate(ts), 0.0, 1.0))
    tm = (t[:-1] + t[1:]) / 2.0
    ix = np.clip(np.floor(ax + dx * tm).astype(np.int64), 0, n - 1)
    iy = np.clip(np.floor(ay + dy * tm).astype(np.int64), 0, n - 1)
    return np.unique(cellmod.from_ixy(ix.astype(np.uint64), iy.astype(np.uint64), res))


def cells_to_mask(cell_ids: np.ndarray) -> tuple[np.ndarray, Grid, float]:
    """Distinct same-resolution cell ids → (mask, grid, lat_scale) in a
    lon-degree frame where lat is scaled by lat_scale so pixels are
    square. Feed the mask to mask_to_polygons, then divide y by
    lat_scale to return to degrees."""
    cell_ids = np.asarray(cell_ids, dtype=np.uint64)
    res = cellmod.resolution(cell_ids)
    if not np.all(res == res[0]):
        raise ValueError("cells_to_mask requires uniform resolution")
    r = int(res[0])
    dlon, dlat = cellmod.cell_size_degrees(r)
    ix, iy = cellmod.to_ixy(cell_ids)
    x_off, y_off = ix.min(), iy.min()
    nx = int(ix.max() - x_off) + 1
    ny = int(iy.max() - y_off) + 1
    mask = np.zeros((ny, nx), dtype=bool)
    mask[iy - y_off, ix - x_off] = True
    sy = dlon / dlat
    grid = Grid(
        x0=-180.0 + x_off * dlon,
        y0=(-90.0 + y_off * dlat) * sy,
        step=dlon,
        nx=nx,
        ny=ny,
    )
    return mask, grid, sy


# ---------------------------------------------------------------------------
# distributed marching squares (global lattice)
#
# The same case table as trace_mask, but windows are computed in GLOBAL
# cell coordinates so edge extraction can run per coarse parent cell on
# workers (each covered cell contributes its presence bit to the 4
# windows that see it) and only the directed contour segments — 
# O(perimeter), not O(area) — travel to the driver for ring chaining.
# Keys are translation-equal to trace_mask's local keys, so ring order,
# start nodes and traversal are identical to the in-memory path.
# ---------------------------------------------------------------------------

def global_key_mult(res: int) -> np.int64:
    """Packing multiplier for doubled global node coords at ``res``."""
    return np.int64(2 * (1 << res) + 8)


def window_segment_keys(
    gx: np.ndarray, gy: np.ndarray, case: np.ndarray, res: int
) -> tuple[np.ndarray, np.ndarray]:
    """Directed contour segments for windows anchored at global cell
    coords (gx, gy) with marching-squares ``case`` — vectorized over the
    15 cases. Returns packed (from_keys, to_keys)."""
    KM = global_key_mult(res)
    fs: list[np.ndarray] = []
    ts: list[np.ndarray] = []
    for c, segs in _CASE_SEGMENTS.items():
        m = case == c
        if not m.any():
            continue
        cx, cy = gx[m], gy[m]
        for frm, to in segs:
            fx, fy = _midpoint_coords(frm, cx, cy)
            tx, ty = _midpoint_coords(to, cx, cy)
            fs.append((fx + 2) * KM + (fy + 2))
            ts.append((tx + 2) * KM + (ty + 2))
    if not fs:
        z = np.empty(0, np.int64)
        return z, z
    return np.concatenate(fs), np.concatenate(ts)


def chain_ring_keys(frm: np.ndarray, to: np.ndarray) -> list[np.ndarray]:
    """Chain directed segments into closed rings — the same
    smallest-start-key / follow-next discipline as trace_mask, so ring
    order and vertex sequences match the in-memory trace exactly."""
    nxt: dict[int, int] = dict(zip(frm.tolist(), to.tolist()))
    rings: list[np.ndarray] = []
    visited: set[int] = set()
    for start in sorted(nxt):
        if start in visited:
            continue
        ring_keys = [start]
        visited.add(start)
        cur = nxt[start]
        while cur != start:
            ring_keys.append(cur)
            visited.add(cur)
            cur = nxt[cur]
        ring_keys.append(start)
        rings.append(np.asarray(ring_keys, dtype=np.int64))
    return rings


def keys_to_lonlat(keys: np.ndarray, res: int) -> np.ndarray:
    """Packed doubled-node keys → (lon, lat) ring vertices in degrees."""
    KM = global_key_mult(res)
    kx = keys // KM - 2
    ky = keys % KM - 2
    dlon, dlat = cellmod.cell_size_degrees(res)
    lon = -180.0 + (kx / 2.0 + 0.5) * dlon
    lat = -90.0 + (ky / 2.0 + 0.5) * dlat
    return np.column_stack([lon, lat])


def _interior_point(ring: np.ndarray) -> np.ndarray:
    """A point STRICTLY inside a simple closed ring (first==last) — the
    classical convex-vertex probe (O'Rourke): the vertex MEAN is outside
    for non-convex rings (a C-shape's mean sits in its mouth).  Take the
    lowest-then-leftmost vertex v (always convex), triangle (a, v, b)
    with its neighbors; if no other vertex lies inside that triangle its
    centroid is interior, else the midpoint of v and the inside vertex
    closest to v is."""
    pts = ring[:-1]
    n = len(pts)
    i = int(np.lexsort((pts[:, 0], pts[:, 1]))[0])
    a, v, b = pts[(i - 1) % n], pts[i], pts[(i + 1) % n]

    def _cross(o, p, q):
        return (p[0] - o[0]) * (q[1] - o[1]) - (p[1] - o[1]) * (q[0] - o[0])

    # signed-area orientation of the triangle (normalize to CCW)
    if _cross(a, v, b) < 0:
        a, b = b, a
    d1 = (pts[:, 0] - a[0]) * (v[1] - a[1]) - (pts[:, 1] - a[1]) * (v[0] - a[0])
    d2 = (pts[:, 0] - v[0]) * (b[1] - v[1]) - (pts[:, 1] - v[1]) * (b[0] - v[0])
    d3 = (pts[:, 0] - b[0]) * (a[1] - b[1]) - (pts[:, 1] - b[1]) * (a[0] - b[0])
    inside = (d1 < 0) & (d2 < 0) & (d3 < 0)  # strictly inside CCW triangle
    if not inside.any():
        return (a + v + b) / 3.0
    cand = pts[inside]
    q = cand[np.argmin(((cand - v) ** 2).sum(axis=1))]
    return (v + q) / 2.0


def rings_to_polygons(
    rings: list[np.ndarray],
) -> list[tuple[np.ndarray, list[np.ndarray]]]:
    """Closed rings → (outer, [holes]) by orientation + containment —
    the assignment half of mask_to_polygons, frame-agnostic (uniform
    y-scaling preserves area order and containment).

    Hole→parent assignment probes a TRUE interior point of the hole
    ring and takes the smallest containing outer whose area exceeds the
    hole's — both conditions matter: the vertex-mean probe mis-attached
    C-shaped holes (mean in the mouth → dropped) and, in the
    lake-with-island case, the island outer CONTAINS the probe point
    even though the lake hole can only belong to the land polygon (an
    outer smaller than the hole can never be its parent)."""
    outers: list[tuple[float, np.ndarray]] = []
    holes: list[tuple[float, np.ndarray]] = []
    for r in rings:
        a = signed_area(r)
        if a > 0:
            outers.append((a, r))
        elif a < 0:
            holes.append((-a, r))
    outers.sort(key=lambda t: t[0])  # smallest first → innermost match wins
    polys: list[tuple[np.ndarray, list[np.ndarray]]] = [(r, []) for _, r in outers]
    for ha, h in holes:
        p0 = _interior_point(h)
        for i, (oa, outer) in enumerate(outers):
            if oa > ha and _contains(p0, outer):
                polys[i][1].append(h)
                break
    return polys
