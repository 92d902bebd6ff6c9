"""Structural parity vs the reference's de-facto fixtures
(/root/reference/examples/*.geojson, BART feed, read-only).

Exact coordinates differ (different feed), but the SHAPE of each
outputFormat — container type, geometry types, property conventions —
must match what the reference actually emits."""

import json
from pathlib import Path

import pytest

from geotile.config import PipelineConfig
from geotile.formats import get_geojson_by_format
from geotile.ops.gtfs import GtfsContext

REF = Path("/root/reference/examples")


@pytest.fixture(scope="module")
def ctx(ray_session, caltrain_dir):
    return GtfsContext(caltrain_dir)


def _ours(ctx, fmt):
    cfg = PipelineConfig(coordinate_precision=5, output_format=fmt)
    return get_geojson_by_format(ctx, cfg, {})


def _ref(fmt):
    return json.loads((REF / f"{fmt}.geojson").read_text())


class TestStructuralParity:
    @pytest.mark.parametrize("fmt", ["stops", "lines", "lines-and-stops",
                                     "stops-buffer", "lines-buffer",
                                     "stops-dissolved", "lines-dissolved"])
    def test_container_is_feature_collection(self, ctx, fmt):
        ours, ref = _ours(ctx, fmt), _ref(fmt)
        assert ours["type"] == ref["type"] == "FeatureCollection"

    @pytest.mark.parametrize("fmt", ["envelope", "convex"])
    def test_single_feature_formats(self, ctx, fmt):
        ours, ref = _ours(ctx, fmt), _ref(fmt)
        assert ours["type"] == ref["type"] == "Feature"
        assert ours["geometry"]["type"] == ref["geometry"]["type"] == "Polygon"
        assert set(ours["properties"]) == set(ref["properties"]) == {"agency_name"}

    def test_envelope_has_bbox_member(self, ctx):
        ours, ref = _ours(ctx, "envelope"), _ref("envelope")
        assert "bbox" in ours and "bbox" in ref
        assert len(ours["bbox"]) == len(ref["bbox"]) == 4

    def test_geometry_type_universe(self, ctx):
        pairs = {
            "stops": {"Point"},
            "lines": {"MultiLineString"},
            "lines-and-stops": {"Point", "MultiLineString"},
            "stops-buffer": {"Polygon"},
            "stops-dissolved": {"Polygon"},
        }
        for fmt, expected in pairs.items():
            ours = {f["geometry"]["type"] for f in _ours(ctx, fmt)["features"]}
            ref = {f["geometry"]["type"] for f in _ref(fmt)["features"]}
            assert ours == expected
            assert ref == expected  # and the reference agrees

    def test_stop_property_conventions(self, ctx):
        ours = _ours(ctx, "stops")["features"]
        ref = _ref("stops")["features"]
        ref_keys = set().union(*(f["properties"].keys() for f in ref))
        our_keys = set().union(*(f["properties"].keys() for f in ours))
        # every convention the reference exhibits appears in ours
        for k in ("stop_id", "stop_name", "location_type", "routes", "agency_name"):
            assert k in ref_keys and k in our_keys
        # nested route records use the same field conventions
        ref_route = next(
            f["properties"]["routes"][0] for f in ref
            if isinstance(f["properties"].get("routes"), list) and f["properties"]["routes"]
        )
        our_route = next(
            f["properties"]["routes"][0] for f in ours
            if isinstance(f["properties"].get("routes"), list) and f["properties"]["routes"]
        )
        for k in ("route_id", "route_color"):
            assert k in ref_route and k in our_route
        assert ref_route["route_color"].startswith("#")
        assert our_route["route_color"].startswith("#")
        # parent-station quirk: routes == {} (not []) in BOTH
        ref_parent = [f for f in ref if f["properties"].get("routes") == {}]
        our_parent = [f for f in ours if f["properties"].get("routes") == {}]
        assert ref_parent and our_parent

    def test_dissolved_properties_only_agency(self, ctx):
        for fmt in ("stops-dissolved", "lines-dissolved"):
            ours = _ours(ctx, fmt)["features"]
            ref = _ref(fmt)["features"]
            assert all(set(f["properties"]) == {"agency_name"} for f in ours)
            assert all(set(f["properties"]) == {"agency_name"} for f in ref)

    def test_stops_buffer_ring_arity(self, ctx):
        """Reference discs are 33-point rings (32-gon, turf 8 steps/quarter);
        ours are the same 32-gon (RDP at precision 5 may trim a vertex)."""
        ref_ring = _ref("stops-buffer")["features"][0]["geometry"]["coordinates"][0]
        our_ring = _ours(ctx, "stops-buffer")["features"][0]["geometry"]["coordinates"][0]
        assert len(ref_ring) == 33
        assert 25 <= len(our_ring) <= 33
