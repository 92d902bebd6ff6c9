"""Route line assembly (reference O1-O3, src/lib/geojson-utils.ts:172-253).

Ray-Data split: the per-shape / per-trip ordering reductions run
distributed on the fact tables (``shapes``, ``stop_times``) via
``groupby().map_groups`` — those are the rows that scale. The reduced
result is dimension-scale (one row per shape / per trip), so route-level
feature assembly finalizes driver-side with the broadcast dims, exactly
the partial→final pattern of SURVEY §7.3.
"""

from __future__ import annotations

import json
from collections import defaultdict

import numpy as np
import pandas as pd
import pyarrow.compute as pc

from geotile.geojson import feature, format_properties
from geotile.ops.gtfs import GtfsContext


def _sorted_coords_per_shape(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values("shape_pt_sequence", kind="stable")
    coords = np.column_stack([df["shape_pt_lon"].to_numpy(), df["shape_pt_lat"].to_numpy()])
    return pd.DataFrame(
        {"shape_id": [df["shape_id"].iloc[0]], "coords_json": [json.dumps(coords.tolist())]}
    )


def shape_linestrings(ctx: GtfsContext, shape_ids: set[str]) -> list[dict]:
    """Distributed per-shape point ordering: groupby(shape_id) →
    in-group sort by shape_pt_sequence (reference relies on node-gtfs
    ORDER BY, src/lib/geojson-utils.ts:210). Returns per-shape rows
    (dimension-scale)."""
    if not shape_ids:
        return []
    import pyarrow as pa

    ids = pa.array(sorted(shape_ids))
    ds = ctx.shapes().map_batches(
        lambda t: t.filter(pc.is_in(t["shape_id"], ids)), batch_format="pyarrow"
    )
    rows = (
        ds.groupby("shape_id")
        .map_groups(_sorted_coords_per_shape, batch_format="pandas")
        .take_all()
    )
    return rows


def route_shape_map(ctx: GtfsContext, query: dict) -> dict[str, list[str]]:
    """Distinct route_id → [shape_id] from the (service-filtered) trips
    dim, narrowed by the query (route_id / direction_id / shape_id)."""
    t = ctx._trips_dim()
    if "shape_id" not in t.column_names:
        # trips.shape_id is OPTIONAL per the GTFS spec: a feed without
        # the column has no shapes mapping at all -> the stop-order
        # fallback path takes over (same as an all-null column)
        return {}
    if query.get("route_id") is not None:
        t = t.filter(pc.equal(t["route_id"], query["route_id"]))
    if query.get("direction_id") is not None:
        t = t.filter(pc.equal(t["direction_id"], query["direction_id"]))
    if query.get("shape_id") is not None:
        t = t.filter(pc.equal(t["shape_id"], query["shape_id"]))
    out: dict[str, list[str]] = defaultdict(list)
    # drop null shape_ids BEFORE sorting — None < str raises, and a
    # shapeless trip contributes nothing to the shapes join anyway
    pairs = {(rid, sid)
             for rid, sid in zip(t["route_id"].to_pylist(),
                                 t["shape_id"].to_pylist())
             if sid is not None}
    for rid, sid in sorted(pairs):
        out[rid].append(sid)
    return dict(out)


def _route_props(ctx: GtfsContext, route_id: str) -> dict:
    # memoized id->record map: the old per-route routes_table filter
    # scan made per-route loops O(routes^2) on the driver
    rec = ctx.routes_map().get(route_id) or {"route_id": route_id}
    attrs = ctx.route_attributes_map().get(route_id, {})
    # node-gtfs getShapesAsGeoJSON flattens route props + attributes and
    # adds agency_name (visible in examples/lines-buffer.geojson props)
    props = dict(rec)
    props.update(attrs)
    props["agency_name"] = ctx.agency_name
    return format_properties(props)


def shape_line_features(ctx: GtfsContext, query: dict) -> list[dict]:
    """Reference getShapesAsGeoJSON path: one MultiLineString Feature per
    route, shapes ordered by shape_id for determinism."""
    rmap = route_shape_map(ctx, query)
    all_sids = {s for sids in rmap.values() for s in sids}
    if not all_sids:
        return []
    shape_rows = {r["shape_id"]: json.loads(r["coords_json"])
                  for r in shape_linestrings(ctx, all_sids)}
    feats = []
    for rid in sorted(rmap):
        coords = [shape_rows[s] for s in sorted(set(rmap[rid])) if s in shape_rows]
        if not coords:
            continue
        feats.append(feature("MultiLineString", coords, _route_props(ctx, rid)))
    return feats


# ---------------------------------------------------------------------------
# stop-order fallback (reference O1/O2: toposort, else longest trip)
# ---------------------------------------------------------------------------

def _trip_stop_sequence(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values("stop_sequence", kind="stable")
    return pd.DataFrame(
        {
            "trip_id": [df["trip_id"].iloc[0]],
            "stop_ids_json": [json.dumps(df["stop_id"].tolist())],
        }
    )


def trip_stop_sequences(ctx: GtfsContext, trip_ids: list[str]) -> dict[str, list[str]]:
    """Distributed per-trip stoptime ordering (reference getStoptimes
    ORDER BY stop_sequence ASC, src/lib/geojson-utils.ts:176-180)."""
    if not trip_ids:
        return {}
    import pyarrow as pa

    ids = pa.array(sorted(trip_ids))
    ds = ctx.stop_times().map_batches(
        lambda t: t.filter(pc.is_in(t["trip_id"], ids)), batch_format="pyarrow"
    )
    rows = (
        ds.groupby("trip_id").map_groups(_trip_stop_sequence, batch_format="pandas").take_all()
    )
    return {r["trip_id"]: json.loads(r["stop_ids_json"]) for r in rows}


def toposort_stops(trip_sequences: list[list[str]]) -> list[str]:
    """Kahn's algorithm over consecutive-stop edges from all trips
    (reference builds the same edge list, src/lib/geojson-utils.ts:185-198,
    then calls npm toposort). Deterministic tie-break: first-seen order.
    Raises ValueError on a cycle (caller falls back to longest trip)."""
    order: dict[str, int] = {}
    edges: set[tuple[str, str]] = set()
    succ: dict[str, list[str]] = defaultdict(list)
    indeg: dict[str, int] = defaultdict(int)
    for seq in trip_sequences:
        for s in seq:
            if s not in order:
                order[s] = len(order)
                indeg.setdefault(s, 0)
        for a, b in zip(seq[:-1], seq[1:]):
            if (a, b) not in edges:
                edges.add((a, b))
                succ[a].append(b)
                indeg[b] += 1
    ready = sorted([s for s, d in indeg.items() if d == 0], key=order.__getitem__)
    out: list[str] = []
    while ready:
        ready.sort(key=order.__getitem__)
        n = ready.pop(0)
        out.append(n)
        for m in succ[n]:
            indeg[m] -= 1
            if indeg[m] == 0:
                ready.append(m)
    if len(out) != len(order):
        raise ValueError("stop graph has a cycle")
    return out


def ordered_stop_ids_for_route(ctx: GtfsContext, route_id: str,
                               trip_sequences: dict[str, list[str]] | None = None) -> list[str]:
    """Reference getOrderedStopIdsForRoute (src/lib/geojson-utils.ts:172-207):
    toposort across ALL the route's trips; on cycle use the trip with the
    most stoptimes (first max in trip_id order, like lodash maxBy)."""
    trips = ctx.trips_for(route_id)
    tids = sorted(trips["trip_id"].to_pylist())
    if trip_sequences is None:
        trip_sequences = trip_stop_sequences(ctx, tids)
    seqs = [trip_sequences.get(t, []) for t in tids]
    try:
        return toposort_stops(seqs)
    except ValueError:
        longest = max(seqs, key=len) if seqs else []
        return longest


def fallback_line_features(ctx: GtfsContext, query: dict) -> list[dict]:
    """Reference stop-order fallback (src/lib/geojson-utils.ts:227-252):
    one LineString per route through its ordered stops."""
    routes = ctx.routes_table(query.get("route_id"))
    stops = ctx._stops_dim()
    stop_xy = {
        sid: (lon, lat)
        for sid, lon, lat in zip(
            stops["stop_id"].to_pylist(),
            stops["stop_lon"].to_pylist(),
            stops["stop_lat"].to_pylist(),
        )
    }
    # one distributed pass fetches ordered stoptimes for every needed trip
    all_tids = sorted(
        t
        for rid in routes["route_id"].to_pylist()
        for t in ctx.trips_for(rid)["trip_id"].to_pylist()
    )
    seqs = trip_stop_sequences(ctx, all_tids)
    feats = []
    for rec in routes.to_pylist():
        rid = rec["route_id"]
        ordered = ordered_stop_ids_for_route(ctx, rid, seqs)
        coords = [[stop_xy[s][0], stop_xy[s][1]] for s in ordered if s in stop_xy]
        if not coords:
            # a route with no usable trips/stops: the reference throws
            # here (maxBy of an empty trip list); emitting an empty
            # LineString instead crashes the buffer/envelope formats
            # downstream — skip the route
            continue
        props = dict(rec)
        props.update(ctx.route_attributes_map().get(rid, {}))
        props["agency_name"] = ctx.agency_name
        feats.append(feature("LineString", coords, format_properties(props)))
    return feats


def route_lines(ctx: GtfsContext, query: dict) -> list[dict] | None:
    """Reference getRouteLinesAsGeoJSON (src/lib/geojson-utils.ts:209-253):
    prefer shapes; a missing queried shape_id → None; else stop fallback."""
    key = ("route_lines", query.get("route_id"), query.get("direction_id"),
           query.get("shape_id"))
    if key in ctx.cache:
        return ctx.cache[key]
    feats = shape_line_features(ctx, query)
    if not feats:
        feats = None if query.get("shape_id") is not None \
            else fallback_line_features(ctx, query)
    ctx.cache[key] = feats
    return feats
