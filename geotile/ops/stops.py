"""Stop→route assignment (reference J1 — node-gtfs getStopsAsGeoJSON).

The "spatial join analog" of the reference: stops ⋈ stop_times ⋈ trips
⋈ routes with a per-stop distinct-route list aggregation, dropping
unused stops (README.md:231) but keeping parent stations of used stops
(observed in examples/stops.geojson: place_SANL with ``"routes": {}``).

Ray-Data shape: ``stop_times`` is the fact → ``map_batches`` attaches
route/direction via the broadcast trips dim and pre-dedups per batch
(partial aggregation), then ONE ``groupby(stop_id)`` shuffle reduces to
distinct route lists. Stop/route property decoration happens driver-side
on the dimension-scale result.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from geotile.geojson import feature, format_properties
from geotile.ops.gtfs import GtfsContext

# the route fields embedded per stop (reference examples/stops.geojson
# BERY feature: route records without agency_id/text color when null)
_ROUTE_EMBED_FIELDS = (
    "route_id",
    "agency_id",
    "route_short_name",
    "route_long_name",
    "route_type",
    "route_url",
    "route_color",
    "route_text_color",
)


class _AttachRoutes:
    """Per-worker cached stage: holds the broadcast trip→route lookup
    (as parallel Arrow arrays) and emits per-batch deduped (stop_id,
    route_id) pairs — vectorized index_in gather + group_by distinct,
    no per-row Python on the stop_times fact."""

    def __init__(self, trips_ref, route_id=None, direction_id=None,
                 shape_id=None):
        import pyarrow.compute as pc

        trips: pa.Table = ray.get(trips_ref)
        if route_id is not None:
            trips = trips.filter(pc.equal(trips["route_id"], route_id))
        if direction_id is not None:
            trips = trips.filter(pc.equal(trips["direction_id"], direction_id))
        if shape_id is not None:
            # shape-scoped stop queries resolve through the shape's
            # trips, as node-gtfs getStops does for its join-key params
            # (reference formats pass {shape_id} for outputType=shape);
            # trips without the optional shape_id column match nothing
            if "shape_id" in trips.column_names:
                trips = trips.filter(pc.equal(trips["shape_id"], shape_id))
            else:
                trips = trips.slice(0, 0)
        self.trip_ids = trips["trip_id"].combine_chunks()
        self.route_ids = trips["route_id"].combine_chunks()

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.index_in(batch["trip_id"], self.trip_ids)
        hit = pc.is_valid(idx)
        pairs = pa.table(
            {
                "stop_id": batch["stop_id"].filter(hit),
                "route_id": pc.take(self.route_ids, idx.filter(hit)),
            }
        )
        return pairs.group_by(["stop_id", "route_id"]).aggregate([])


def _distinct_routes(df: pd.DataFrame) -> pd.DataFrame:
    rids = sorted(set(df["route_id"].tolist()))
    return pd.DataFrame(
        {"stop_id": [df["stop_id"].iloc[0]], "route_ids_json": [json.dumps(rids)]}
    )


def stop_route_lists(ctx: GtfsContext, query: dict) -> dict[str, list[str]]:
    """Distributed stop→routes aggregation; returns {stop_id: [route_id]}
    for used stops only."""
    key = ("stop_route_lists", query.get("route_id"),
           query.get("direction_id"), query.get("shape_id"))
    if key in ctx.cache:
        return ctx.cache[key]
    from geotile.ops.join import _cached_stage

    ds = ctx.stop_times(columns=["trip_id", "stop_id"])
    tref = ctx.trips_ref()
    rid, did = query.get("route_id"), query.get("direction_id")
    sid = query.get("shape_id")

    def attach_fn(batch: pa.Table) -> pa.Table:
        # stateless task + per-worker cached stage (no actor pool)
        return _cached_stage(
            ("stoproutes", tref.hex(), rid, did, sid),
            lambda: _AttachRoutes(tref, rid, did, sid)
        )(batch)

    ds = ds.map_batches(attach_fn, batch_format="pyarrow")
    rows = ds.groupby("stop_id").map_groups(_distinct_routes, batch_format="pandas").take_all()
    out = {r["stop_id"]: json.loads(r["route_ids_json"]) for r in rows}
    ctx.cache[key] = out
    return out


def _used_stop_ids(stops: dict[str, dict], used: dict) -> list[str]:
    """Ordered used-stop ids + their parent stations — the shared
    selection behind stop_features and stop_points (the parent-station
    quirk must stay identical in both or convex/buffer outputs diverge
    from the stop features)."""
    parents = {
        stops[s].get("parent_station")
        for s in used
        if s in stops and stops[s].get("parent_station")
    }
    return sorted(set(used) | {p for p in parents if p in stops})


def stop_features(ctx: GtfsContext, query: dict) -> list[dict]:
    """Point features for used stops (+ their parent stations), each with
    the nested distinct-route property list, ordered by stop_id."""
    used = stop_route_lists(ctx, query)
    stops = ctx.stops_map()
    routes = ctx.routes_map()
    agency_name = ctx.agency_name

    # parent stations of used stops ride along with an EMPTY routes dict
    # (the examples/stops.geojson "routes": {} quirk)
    feats = []
    for sid in _used_stop_ids(stops, used):
        rec = stops.get(sid)
        if rec is None:
            continue
        props = {k: v for k, v in rec.items() if k not in ("stop_lat", "stop_lon")}
        if sid in used:
            props["routes"] = [
                {f: routes[rid].get(f) for f in _ROUTE_EMBED_FIELDS}
                for rid in used[sid]
                if rid in routes
            ]
        else:
            props["routes"] = {}  # parent-station quirk
        props["agency_name"] = agency_name
        feats.append(
            feature(
                "Point",
                [rec["stop_lon"], rec["stop_lat"]],
                format_properties(props),
            )
        )
    return feats


def stop_points(ctx: GtfsContext, query: dict) -> np.ndarray:
    """(n, 2) lon/lat of used stops — the convex-hull / buffer input."""
    used = stop_route_lists(ctx, query)
    stops = ctx.stops_map()
    ids = _used_stop_ids(stops, used)
    return np.array([[stops[s]["stop_lon"], stops[s]["stop_lat"]] for s in ids], dtype=np.float64)
