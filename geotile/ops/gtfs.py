"""GTFS table loading + the service-date semi-join (reference J5).

Facts vs dims: ``stop_times`` and ``shapes`` are the scale-out fact
tables (read lazily as Datasets, column-pruned at the read); ``agency``
``routes`` ``trips`` ``calendar`` ``stops`` ``route_attributes``
``feed_info`` are dimension tables — loaded once driver-side as pyarrow
tables and broadcast via ``ray.put`` into every stage (reference holds
them behind one shared SQLite handle, SURVEY §2.8).
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd

FACT_TABLES = ("stop_times", "shapes")
DIM_TABLES = ("agency", "routes", "trips", "calendar", "stops", "route_attributes", "feed_info")


class GtfsContext:
    """Holds lazy fact Datasets + broadcast dimension tables for one
    agency's feed directory."""

    def __init__(self, feed_dir: str | Path, start_date: str | None = None,
                 end_date: str | None = None, exclude: list[str] | None = None):
        self.feed_dir = Path(feed_dir)
        exclude = set(exclude or [])
        self.dims: dict[str, pa.Table] = {}
        for name in DIM_TABLES:
            p = self.feed_dir / f"{name}.parquet"
            if name in exclude or not p.exists():
                self.dims[name] = None
                continue
            self.dims[name] = pq.read_table(p)
        # J5: service_id set from the calendar date-range scan
        # (reference src/lib/gtfs-to-geojson.ts:49-71)
        self.service_ids: list[str] | None = None
        if (start_date or end_date) and self.dims.get("calendar") is not None:
            cal = self.dims["calendar"]
            m = pa.array([True] * cal.num_rows)
            if end_date:
                m = pc.and_(m, pc.less_equal(cal["start_date"], end_date))
            if start_date:
                m = pc.and_(m, pc.greater_equal(cal["end_date"], start_date))
            self.service_ids = cal.filter(m)["service_id"].to_pylist()
        # trips filtered by service (dimension-side semi-join)
        trips = self.dims["trips"]
        if self.service_ids is not None:
            trips = trips.filter(pc.is_in(trips["service_id"], pa.array(self.service_ids)))
        self.trips = trips
        self._trips_ref = None
        self._dim_refs: dict[str, "ray.ObjectRef"] = {}
        # memo for distributed results keyed by query — several formats
        # reuse the same stop/line pipelines (convex, buffer, dissolved
        # all start from stops/lines), so each heavy Dataset executes once
        self.cache: dict[tuple, object] = {}

    # -- broadcast helpers ------------------------------------------------
    def trips_ref(self):
        if self._trips_ref is None:
            self._trips_ref = ray.put(self.trips)
        return self._trips_ref

    def dim_ref(self, name: str):
        if name not in self._dim_refs:
            self._dim_refs[name] = ray.put(self.dims[name])
        return self._dim_refs[name]

    # -- facts ------------------------------------------------------------
    def stop_times(self, columns: list[str] | None = None) -> rd.Dataset:
        return rd.read_parquet(
            str(self.feed_dir / "stop_times.parquet"),
            columns=columns or ["trip_id", "stop_id", "stop_sequence"],
        )

    def shapes(self) -> rd.Dataset:
        return rd.read_parquet(
            str(self.feed_dir / "shapes.parquet"),
            columns=["shape_id", "shape_pt_lat", "shape_pt_lon", "shape_pt_sequence"],
        )

    def has_shapes_file(self) -> bool:
        return (self.feed_dir / "shapes.parquet").exists()

    # -- small lookups ----------------------------------------------------
    @property
    def agency_name(self) -> str:
        ag = self.dims.get("agency")
        if ag is not None and ag.num_rows > 0 and "agency_name" in ag.column_names:
            return ag["agency_name"][0].as_py()
        return "unknown"

    @property
    def feed_version(self) -> str | None:
        fi = self.dims.get("feed_info")
        if fi is not None and fi.num_rows > 0 and "feed_version" in fi.column_names:
            return fi["feed_version"][0].as_py()
        return None

    def routes_table(self, route_id: str | None = None) -> pa.Table:
        r = self.dims["routes"]
        if route_id is not None:
            r = r.filter(pc.equal(r["route_id"], route_id))
        return r

    def route_attributes_map(self) -> dict[str, dict]:
        ra = self.dims.get("route_attributes")
        if ra is None:
            return {}
        return {row["route_id"]: {k: v for k, v in row.items() if k != "route_id"}
                for row in ra.to_pylist()}

    def trips_for(self, route_id: str | None = None, direction_id: int | None = None) -> pa.Table:
        t = self.trips
        if route_id is not None:
            t = t.filter(pc.equal(t["route_id"], route_id))
        if direction_id is not None:
            t = t.filter(pc.equal(t["direction_id"], direction_id))
        return t
