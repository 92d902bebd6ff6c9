"""Pins for the round-5 ADVICE fixes (sanitize parity, kmeans guard,
stops_map loud failure)."""

from __future__ import annotations

import pytest


def test_sanitize_dot_reserved_and_trailing():
    """npm sanitize-filename reservedRe (^\\.+$) and windowsTrailingRe
    ([. ]+$) parity — without these an agencyKey of '..' escaped the
    output dir (geojson/.. = cwd) and prep_directory(overwrite=True)
    would clear the working directory."""
    from geotile.pipeline import sanitize

    assert sanitize(".") == ""
    assert sanitize("..") == ""
    assert sanitize("....") == ""
    assert sanitize("name.") == "name"
    assert sanitize("name . . ") == "name"
    assert sanitize("a.b") == "a.b"  # interior dots untouched
    assert sanitize(".hidden") == ".hidden"  # leading dot + text is fine
    # illegal-strip happens BEFORE the dot-only check, npm rule order
    assert sanitize("./.") == ""
    # trailing strip happens before truncation, like npm
    assert sanitize("x" * 300 + ".") == "x" * 255


def test_sanitize_dot_names_cannot_escape_output_dir(tmp_path):
    """End-to-end: a '..' agency key must not resolve to the parent of
    the output root."""
    from geotile.pipeline import sanitize

    root = tmp_path / "geojson"
    root.mkdir()
    out = root / sanitize("..")
    assert out.resolve() == root.resolve()


def test_kmeans_rejects_dim_ge_4096(ray_session):
    """The kd = k*4096 + dim packed groupby key collides for dim>=4096;
    the guard must be a driver-side ValueError (asserts vanish under
    -O), raised before any Lloyd round runs."""
    import numpy as np
    import ray.data as rd

    from geotile.ops.ann import kmeans_lloyd

    vecs = [np.zeros(4096, dtype=np.float64).tolist() for _ in range(4)]
    ds = rd.from_items(
        [{"vec_id": i, "embedding": v} for i, v in enumerate(vecs)])
    with pytest.raises(ValueError, match="dim < 4096"):
        kmeans_lloyd(ds, k=2, iters=2)


def test_stops_map_missing_stops_fails_loud(tmp_path):
    """A feed without stops.txt must raise FileNotFoundError naming the
    table, not an opaque NoneType attribute error (same contract as
    _routes_dim/_trips_dim)."""
    from geotile.ops.gtfs import GtfsContext

    feed = tmp_path / "feed"
    feed.mkdir()
    (feed / "agency.txt").write_text(
        "agency_id,agency_name,agency_url,agency_timezone\n"
        "a1,Test Agency,https://example.com,America/Los_Angeles\n")
    (feed / "routes.txt").write_text(
        "route_id,route_short_name,route_long_name,route_type\n"
        "r1,1,Route One,3\n")
    ctx = GtfsContext(str(feed))
    with pytest.raises(FileNotFoundError, match="stops"):
        ctx.stops_map()
