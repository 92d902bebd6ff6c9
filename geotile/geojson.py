"""GeoJSON feature-row model + property/coordinate formatting.

Intermediate representation between Ray Data stages: one Arrow row per
feature with columns

    file_key   string  output-file grouping key (agency / route_dir / shape)
    sort_key   int64   deterministic in-file feature order
    feature_json string  the serialized GeoJSON Feature

Heavy coordinate math happens in numpy BEFORE serialization (in the
producing ``map_groups``/``map_batches`` stage); these helpers cover the
reference's formatting semantics:

- ``format_properties``  → omit null values, '#'-prefix colors, recurse
  into the nested routes list (reference src/lib/geojson-utils.ts:31-54)
- ``simplify_feature``   → RDP at 1/10**precision then round, skipping
  simplification for MultiPolygon (reference :119-147); no-op when
  precision is None
- ``assemble_fc``        → FeatureCollection text (reference
  featureCollection + JSON.stringify, compact separators)
"""

from __future__ import annotations

import json
from typing import Any

import numpy as np

from geotile.geom.rdp import rdp, rdp_ring

_COLOR_KEYS = ("route_color", "route_text_color")


def format_properties(props: dict[str, Any]) -> dict[str, Any]:
    """Strip null-valued keys, '#'-format the two color fields, recurse
    into a nested ``routes`` list. Key order = insertion order (parity
    with lodash omitBy preserving key order)."""
    out: dict[str, Any] = {}
    for k, v in props.items():
        if v is None:
            continue
        if k == "routes":
            # nested route records recurse; a non-list value ('{}' quirk
            # for parent stations) rides through as-is
            out[k] = [format_properties(x) for x in v] if isinstance(v, list) else v
        elif k in _COLOR_KEYS:
            out[k] = f"#{v}"
        else:
            out[k] = v
    return out


def feature(geom_type: str, coordinates, properties: dict[str, Any],
            bbox: list[float] | None = None) -> dict[str, Any]:
    f: dict[str, Any] = {"type": "Feature"}
    if bbox is not None:
        f["bbox"] = bbox
    f["properties"] = properties
    f["geometry"] = {"type": geom_type, "coordinates": coordinates}
    return f


def dumps(obj: Any) -> str:
    """Compact JSON like JS JSON.stringify (no spaces); floats rely on
    repr shortest-roundtrip, ints stay ints."""
    return json.dumps(obj, separators=(",", ":"), ensure_ascii=False, default=_np_default)


def _np_default(o):
    if isinstance(o, (np.integer,)):
        return int(o)
    if isinstance(o, (np.floating,)):
        return float(o)
    if isinstance(o, np.ndarray):
        return o.tolist()
    raise TypeError(f"not JSON serializable: {type(o)}")


def assemble_fc(feature_jsons: list[str]) -> str:
    return '{"type":"FeatureCollection","features":[' + ",".join(feature_jsons) + "]}"


# ---------------------------------------------------------------------------
# simplification / rounding over feature dicts
# ---------------------------------------------------------------------------

def _round_half_up(x: float, p: int) -> float:
    """JS-Math.round-compatible rounding (ties toward +Infinity):
    Python round() is banker's (half-to-even), so ties at
    coordinatePrecision could differ from @turf round (ADVICE r1)."""
    import math

    scale = 10.0 ** p
    return math.floor(x * scale + 0.5) / scale


def _round_rec(c, p: int):
    if isinstance(c, (int, float)):
        return _round_half_up(float(c), p)
    return [_round_rec(x, p) for x in c]


def _simplify_coords(geom_type: str, coords, tol: float):
    if geom_type == "LineString":
        return rdp(np.asarray(coords, dtype=np.float64), tol).tolist()
    if geom_type == "MultiLineString":
        return [rdp(np.asarray(ls, dtype=np.float64), tol).tolist() for ls in coords]
    if geom_type == "Polygon":
        return [rdp_ring(np.asarray(r, dtype=np.float64), tol).tolist() for r in coords]
    return coords  # Point / MultiPolygon (skip rule) untouched


def simplify_feature(f: dict[str, Any], precision: int | None) -> dict[str, Any]:
    """Reference simplifyGeoJSON on ONE feature: no-op when precision is
    None; MultiPolygon → truncate only; else RDP(tol=1/10**p) + round."""
    if precision is None:
        return f
    g = f.get("geometry") or {}
    gt = g.get("type")
    if "coordinates" not in g:
        return f  # null/absent geometry is valid GeoJSON — pass through
    if gt and gt != "MultiPolygon":
        g = dict(g)
        g["coordinates"] = _simplify_coords(gt, g["coordinates"], 1.0 / 10**precision)
    g = dict(g)
    g["coordinates"] = _round_rec(g["coordinates"], precision)
    out = dict(f)
    out["geometry"] = g
    return out


def simplify_feature_json(fj: str, precision: int | None) -> str:
    if precision is None:
        return fj
    return dumps(simplify_feature(json.loads(fj), precision))
