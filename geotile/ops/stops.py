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

    def __init__(self, trips_ref, route_id=None, direction_id=None):
        import pyarrow.compute as pc

        trips: pa.Table = ray.get(trips_ref)
        if route_id is not None:
            trips = trips.filter(pc.equal(trips["route_id"], route_id))
        if direction_id is not None:
            trips = trips.filter(pc.equal(trips["direction_id"], direction_id))
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
    key = ("stop_route_lists", query.get("route_id"), query.get("direction_id"))
    if key in ctx.cache:
        return ctx.cache[key]
    from geotile.ops.join import _cached_stage

    ds = ctx.stop_times(columns=["trip_id", "stop_id"])
    tref = ctx.trips_ref()
    rid, did = query.get("route_id"), query.get("direction_id")

    def attach_fn(batch: pa.Table) -> pa.Table:
        # stateless task + per-worker cached stage (no actor pool)
        return _cached_stage(
            ("stoproutes", tref.hex(), rid, did), lambda: _AttachRoutes(tref, rid, did)
        )(batch)

    ds = ds.map_batches(attach_fn, batch_format="pyarrow")
    rows = ds.groupby("stop_id").map_groups(_distinct_routes, batch_format="pandas").take_all()
    out = {r["stop_id"]: json.loads(r["route_ids_json"]) for r in rows}
    ctx.cache[key] = out
    return out


def stop_features(ctx: GtfsContext, query: dict) -> list[dict]:
    """Point features for used stops (+ their parent stations), each with
    the nested distinct-route property list, ordered by stop_id."""
    used = stop_route_lists(ctx, query)
    stops = {r["stop_id"]: r for r in ctx.dims["stops"].to_pylist()}
    routes = {r["route_id"]: r for r in ctx.dims["routes"].to_pylist()}
    agency_name = ctx.agency_name

    # parent stations of used stops ride along with an EMPTY routes dict
    # (the examples/stops.geojson "routes": {} quirk)
    parents = sorted(
        {
            stops[s].get("parent_station")
            for s in used
            if s in stops and stops[s].get("parent_station")
        }
    )
    feats = []
    for sid in sorted(set(used) | set(p for p in parents if p in stops)):
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
    stops = {r["stop_id"]: r for r in ctx.dims["stops"].to_pylist()}
    parents = sorted(
        {
            stops[s].get("parent_station")
            for s in used
            if s in stops and stops[s].get("parent_station")
        }
    )
    ids = sorted(set(used) | set(p for p in parents if p in stops))
    return np.array([[stops[s]["stop_lon"], stops[s]["stop_lat"]] for s in ids], dtype=np.float64)
