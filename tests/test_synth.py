"""Tests for the synthetic fixture generators + PNG codec (no Ray)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from geotile import synth
from geotile.png import decode_png, encode_png


class TestPng:
    def test_roundtrip(self):
        px = synth.pixel_pattern(np.arange(3), 32, 32)
        for i in range(3):
            data = encode_png(px[i])
            assert data[:8] == b"\x89PNG\r\n\x1a\n"
            back = decode_png(data)
            assert (back == px[i]).all()

    def test_non_square(self):
        px = synth.pixel_pattern(np.array([5]), w=48, h=20)[0]
        assert px.shape == (20, 48, 3)
        assert (decode_png(encode_png(px)) == px).all()

    def test_rejects_garbage(self):
        with pytest.raises(ValueError):
            decode_png(b"not a png at all")


class TestImageTable:
    def test_schema_is_input_hint(self, tmp_path):
        d = synth.make_image_table(100, tmp_path / "img")
        t = pq.read_table(d)
        assert t.num_rows == 100
        # input_hint columns first, then the materialized georef the
        # DuckDB oracles read (engine derives georef from image_id and
        # never reads lon/lat)
        assert [(f.name, str(f.type)) for f in t.schema] == [
            ("image_id", "string"), ("bytes", "binary"), ("w", "int32"),
            ("h", "int32"), ("fmt", "string"), ("caption", "string"),
            ("phash", "int64"), ("lon", "double"), ("lat", "double"),
        ]

    def test_deterministic(self, tmp_path):
        a = synth.make_image_batch(np.arange(50))
        b = synth.make_image_batch(np.arange(50))
        assert a.equals(b)

    def test_decode_invariant(self):
        """Per-row invariant (BASELINE input_hint): decoded pixels match
        the regenerated pattern exactly (raw + png are lossless)."""
        t = synth.make_image_batch(np.arange(20))
        for i in range(20):
            fmt = t["fmt"][i].as_py()
            raw = t["bytes"][i].as_py()
            w, h = t["w"][i].as_py(), t["h"][i].as_py()
            expect = synth.pixel_pattern(np.array([i]), w, h)[0]
            got = (
                np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
                if fmt == "raw"
                else decode_png(raw)
            )
            assert (got == expect).all()
            assert t["caption"][i].as_py() == f"tile {i} near stop {i % synth.N_STOPS}"

    def test_phash_stable_and_discriminative(self):
        t = synth.make_image_batch(np.arange(64))
        ph = np.array(t["phash"].to_pylist())
        ws, hs = synth.image_size(np.arange(64))
        for wi, hi in sorted(set(zip(ws.tolist(), hs.tolist()))):
            m = (ws == wi) & (hs == hi)
            px = synth.pixel_pattern(np.arange(64)[m], wi, hi)
            assert (synth.phash_from_pixels(px) == ph[m]).all()
        assert len(np.unique(ph)) > 32  # mostly distinct patterns

    def test_mixed_sizes_present(self):
        """The table is size-heterogeneous by construction (decode
        stages must group by (w, h))."""
        t = synth.make_image_batch(np.arange(32))
        assert len(set(t["w"].to_pylist())) > 1

    def test_image_index(self):
        ids = np.array(["img-00000042", "img-00012345", "img-00000000"])
        assert synth.image_index(ids).tolist() == [42, 12345, 0]

    def test_tile_centers_skew(self):
        lon, lat = synth.tile_centers(np.arange(10_000))
        # hot cluster: ~20% of tiles within ~200m of the hot stop
        m = 6371008.8 * np.pi / 180
        d = np.hypot(
            (lon - synth.STOP_LONS[synth.HOT_STOP]) * m * np.cos(np.radians(37.4)),
            (lat - synth.STOP_LATS[synth.HOT_STOP]) * m,
        )
        frac = (d < 200).mean()
        assert 0.15 < frac < 0.25

    def test_footprints_closed(self):
        q = synth.tile_footprints(np.arange(5))
        assert q.shape == (5, 5, 2)
        assert (q[:, 0] == q[:, -1]).all()


class TestCaltrainFixture:
    @pytest.fixture(scope="class")
    def fixture_dir(self, tmp_path_factory):
        return synth.make_caltrain_fixture(tmp_path_factory.mktemp("gtfs"))

    def test_tables_exist(self, fixture_dir):
        for name in ("agency", "routes", "trips", "stops", "stop_times", "shapes",
                     "calendar", "feed_info", "route_attributes"):
            t = pq.read_table(fixture_dir / f"{name}.parquet")
            assert t.num_rows > 0, name

    def test_fixture_shape(self, fixture_dir):
        routes = pq.read_table(fixture_dir / "routes.parquet")
        assert routes.num_rows == 4
        rids = routes["route_id"].to_pylist()
        assert rids.count("L3") == 2  # duplicate route_id across agency_ids
        assert None in routes["route_color"].to_pylist()  # nullable color row
        trips = pq.read_table(fixture_dir / "trips.parquet")
        shape_ids = set(trips["shape_id"].to_pylist())
        assert None in shape_ids  # L3 has no shapes → toposort fallback path
        assert any(s for s in shape_ids if s)
        stops = pq.read_table(fixture_dir / "stops.parquet")
        assert "unused0" in stops["stop_id"].to_pylist()
        assert 1 in stops["location_type"].to_pylist()
        cal = pq.read_table(fixture_dir / "calendar.parquet")
        assert "OLD" in cal["service_id"].to_pylist()

    def test_stoptimes_ordering(self, fixture_dir):
        st = pq.read_table(fixture_dir / "stop_times.parquet").to_pandas()
        g = st[st.trip_id == "t0000"].sort_values("stop_sequence")
        assert g.stop_sequence.tolist() == list(range(len(g)))
