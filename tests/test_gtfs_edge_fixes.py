"""Pins for the round-4 GTFS-path edge fixes (gtfs/stops/lines/geojson)."""

from __future__ import annotations

import pytest


def _write_feed(d, tables: dict[str, str]) -> str:
    d.mkdir(parents=True, exist_ok=True)
    for name, csv in tables.items():
        (d / f"{name}.txt").write_text(csv)
    return str(d)


_STOPS = (
    "stop_id,stop_name,stop_lat,stop_lon\n"
    "s1,A,37.70,-122.40\ns2,B,37.60,-122.30\ns3,C,37.50,-122.20\n")
_ROUTES = "route_id,route_short_name,route_type\nR1,1,3\n"


def test_mixed_null_shape_ids_do_not_crash(ray_session, tmp_path):
    """A route with both shaped and shapeless trips must not raise
    TypeError from sorting None against str."""
    from geotile.ops.gtfs import GtfsContext
    from geotile.ops.lines import route_shape_map

    feed = _write_feed(tmp_path / "feed", {
        "stops": _STOPS,
        "routes": _ROUTES,
        "trips": ("trip_id,route_id,direction_id,trip_headsign,"
                  "service_id,shape_id\n"
                  "t1,R1,0,North,WK,S1\n"
                  "t2,R1,0,North,WK,\n"),   # shapeless trip -> null
        "shapes": ("shape_id,shape_pt_lat,shape_pt_lon,shape_pt_sequence\n"
                   "S1,37.70,-122.40,1\nS1,37.60,-122.30,2\n"),
        "stop_times": ("trip_id,stop_id,stop_sequence\n"
                       "t1,s1,1\nt1,s2,2\nt2,s1,1\nt2,s3,2\n"),
    })
    ctx = GtfsContext(feed)
    m = route_shape_map(ctx, {})
    assert m == {"R1": ["S1"]}  # the null shape_id contributes nothing


def test_fallback_skips_tripless_route(ray_session, tmp_path):
    """A route with no trips yields NO feature (an empty LineString
    would crash buffer/envelope/dissolve downstream)."""
    from geotile.ops.gtfs import GtfsContext
    from geotile.ops.lines import route_lines

    feed = _write_feed(tmp_path / "feed", {
        "stops": _STOPS,
        "routes": _ROUTES + "R2,2,3\n",  # R2 has no trips
        "trips": ("trip_id,route_id,direction_id,trip_headsign,service_id\n"
                  "t1,R1,0,North,WK\n"),
        "stop_times": ("trip_id,stop_id,stop_sequence\n"
                       "t1,s1,1\nt1,s2,2\n"),
    })
    ctx = GtfsContext(feed)
    feats = route_lines(ctx, {})
    rids = {f["properties"]["route_id"] for f in feats}
    assert rids == {"R1"}
    assert all(f["geometry"]["coordinates"] for f in feats)


def test_simplify_feature_null_geometry_passthrough():
    from geotile.geojson import simplify_feature

    f = {"type": "Feature", "properties": {}, "geometry": None}
    assert simplify_feature(f, 5) == f


def test_missing_trips_table_clear_error(ray_session, tmp_path):
    from geotile.ops.gtfs import GtfsContext

    feed = _write_feed(tmp_path / "feed", {
        "shapes": ("shape_id,shape_pt_lat,shape_pt_lon,shape_pt_sequence\n"
                   "S1,37.70,-122.40,1\nS1,37.60,-122.30,2\n"),
    })
    ctx = GtfsContext(feed)  # construction legal (shapes-only fixture)
    with pytest.raises(FileNotFoundError, match="trips"):
        ctx.trips_for("R1")
    with pytest.raises(FileNotFoundError, match="routes"):
        ctx.routes_map()


def test_shape_scoped_stop_query_filters_by_shape(ray_session, tmp_path):
    """outputType=shape stop outputs must contain only the queried
    shape's stops, not the whole feed's."""
    from geotile.ops.gtfs import GtfsContext
    from geotile.ops.stops import stop_route_lists

    feed = _write_feed(tmp_path / "feed", {
        "stops": _STOPS,
        "routes": _ROUTES + "R2,2,3\n",
        "trips": ("trip_id,route_id,direction_id,trip_headsign,"
                  "service_id,shape_id\n"
                  "t1,R1,0,North,WK,S1\n"
                  "t2,R2,0,South,WK,S2\n"),
        "shapes": ("shape_id,shape_pt_lat,shape_pt_lon,shape_pt_sequence\n"
                   "S1,37.70,-122.40,1\nS1,37.60,-122.30,2\n"
                   "S2,37.60,-122.30,1\nS2,37.50,-122.20,2\n"),
        "stop_times": ("trip_id,stop_id,stop_sequence\n"
                       "t1,s1,1\nt1,s2,2\n"
                       "t2,s2,1\nt2,s3,2\n"),
    })
    ctx = GtfsContext(feed)
    s1 = stop_route_lists(ctx, {"shape_id": "S1"})
    s2 = stop_route_lists(ctx, {"shape_id": "S2"})
    assert set(s1) == {"s1", "s2"} and all(v == ["R1"] for v in s1.values())
    assert set(s2) == {"s2", "s3"} and all(v == ["R2"] for v in s2.values())
