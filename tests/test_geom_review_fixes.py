"""Pins for the round-4 geometry-core review fixes (raster/buffer/
derive/rdp/cells)."""

from __future__ import annotations

import numpy as np

from geotile.geom.raster import Grid, mask_to_polygons, polygon_mask, signed_area


def test_hole_belongs_to_land_not_island():
    """Lake-with-island: the lake hole must attach to the LAND polygon
    (the island outer contains the probe point but is smaller than the
    hole, so it can never be the parent)."""
    m = np.zeros((40, 40), bool)
    m[5:35, 5:35] = True      # land
    m[10:30, 10:30] = False   # lake
    m[17:22, 17:22] = True    # island
    polys = mask_to_polygons(m, Grid(0.0, 0.0, 1.0, 40, 40))
    land = max(polys, key=lambda p: signed_area(p[0]))
    island = min(polys, key=lambda p: signed_area(p[0]))
    assert len(land[1]) == 1, "land must carry the lake hole"
    assert len(island[1]) == 0, "island must carry no hole"
    assert abs(signed_area(land[1][0])) < signed_area(land[0])


def test_c_shaped_hole_not_dropped():
    """A C-shaped hole's vertex mean sits in its mouth (outside every
    outer) — the interior-point probe must still attach it."""
    m = np.zeros((40, 60), bool)
    m[5:35, 5:55] = True
    m[10:30, 10:50] = False
    m[18:22, 10:45] = True   # bridge into the cavity -> C-shaped hole
    polys = mask_to_polygons(m, Grid(0.0, 0.0, 1.0, 60, 40))
    assert sum(len(h) for _, h in polys) >= 1


def test_polygon_buffer_is_filled():
    """@turf/buffer semantics: buffering a Polygon grows the FILLED
    shape; the result must contain the original interior, not be an
    annulus around the boundary."""
    from geotile.geom.pip import points_in_polygon
    from geotile.ops.derive import buffer_feature

    sq = {"type": "Feature", "properties": {},
          "geometry": {"type": "Polygon", "coordinates": [[
              [-122.40, 37.70], [-122.39, 37.70], [-122.39, 37.71],
              [-122.40, 37.71], [-122.40, 37.70]]]}}
    out = buffer_feature(sq, 50.0)
    assert out["geometry"]["type"] == "Polygon"
    rings = [np.asarray(r) for r in out["geometry"]["coordinates"]]
    assert points_in_polygon(np.array([-122.395]), np.array([37.705]),
                             rings)[0], "centroid must be inside"


def test_dissolve_empty_features():
    from geotile.ops.derive import dissolve_features

    assert dissolve_features([], "agency") == []


def test_round_coords_half_up_matches_js():
    """@turf round = Math.round(x*m)/m, HALF-UP toward +inf."""
    from geotile.geom.rdp import round_coords

    got = round_coords(np.array([100.125, -100.125, -2.5, 2.5]), 2)
    # JS: Math.round(10012.5)=10013; Math.round(-10012.5)=-10012
    assert got[0] == 100.13
    assert got[1] == -100.12
    got0 = round_coords(np.array([-2.5, 2.5]), 0)
    assert got0[0] == -2.0 and got0[1] == 3.0


def test_windowed_polygon_mask_bit_identical():
    rng = np.random.default_rng(7)
    g = Grid(-3.0, -2.0, 0.37, 211, 157)
    for _ in range(20):
        n = int(rng.integers(3, 12))
        c = rng.uniform([-2, -1], [60, 45])
        ang = np.sort(rng.uniform(0, 2 * np.pi, n))
        rad = rng.uniform(0.5, 12.0, n)
        ring = np.column_stack([c[0] + rad * np.cos(ang),
                                c[1] + rad * np.sin(ang)])
        ring = np.vstack([ring, ring[:1]])
        full = polygon_mask([ring], g)
        i0 = max(0, int(np.floor((ring[:, 0].min() - g.x0) / g.step)) - 1)
        i1 = min(g.nx, int(np.ceil((ring[:, 0].max() - g.x0) / g.step)) + 2)
        j0 = max(0, int(np.floor((ring[:, 1].min() - g.y0) / g.step)) - 1)
        j1 = min(g.ny, int(np.ceil((ring[:, 1].max() - g.y0) / g.step)) + 2)
        if i1 <= i0 or j1 <= j0:
            assert not full.any()
            continue
        win = polygon_mask([ring], g, window=(i0, i1, j0, j1))
        assert (win == full[j0:j1, i0:i1]).all()


def test_antimeridian_cover_matches_encode():
    """Points at lon=180 clamp to the east-edge cell column; the cover
    of a polygon touching the edge must include that SAME column (a %
    wrap sent it to column 0 — a candidate-pruning false negative)."""
    from geotile.geom import cells
    from geotile.geom.raster import polygon_cover_cells

    ring = np.array([[179.995, 10.0], [180.0, 10.0], [180.0, 10.01],
                     [179.995, 10.01], [179.995, 10.0]])
    res = 14
    cov = polygon_cover_cells([ring], res=res)
    pt = cells.encode(np.array([180.0]), np.array([10.005]), res)
    assert pt[0] in cov
