"""Round-3c ops: 2-D skyline (Pareto frontier) and CUBE grouping-sets
aggregate — each vs an in-process brute-force reference on adversarial
small data (ties, duplicate points, single-row, empty)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _from_pandas(df):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def _brute_skyline(p, d):
    """O(n^2) dominance test: keep i iff no j with p[j] >= p[i],
    d[j] <= d[i], strictly better in one."""
    keep = []
    for i in range(len(p)):
        dominated = any(
            p[j] >= p[i] and d[j] <= d[i] and (p[j] > p[i] or d[j] < d[i])
            for j in range(len(p))
        )
        keep.append(not dominated)
    return np.array(keep, dtype=bool)


class TestSkylineMask:
    def test_matches_brute_force_random(self):
        from geotile.ops.relational import _skyline_mask

        rng = np.random.default_rng(11)
        for trial in range(20):
            n = int(rng.integers(1, 60))
            # small value ranges force heavy (p, d) ties
            p = rng.integers(0, 6, n).astype(np.float64)
            d = rng.integers(0, 6, n).astype(np.int64)
            got = _skyline_mask(p, d)
            want = _brute_skyline(p, d)
            np.testing.assert_array_equal(got, want)

    def test_duplicate_points_all_survive(self):
        from geotile.ops.relational import _skyline_mask

        p = np.array([5.0, 5.0, 1.0])
        d = np.array([2, 2, 1], dtype=np.int64)
        # the two identical (5, 2) points don't dominate each other;
        # (1, 1) survives on the d axis
        np.testing.assert_array_equal(
            _skyline_mask(p, d), np.array([True, True, True])
        )

    def test_equal_price_worse_date_dominated(self):
        from geotile.ops.relational import _skyline_mask

        p = np.array([5.0, 5.0])
        d = np.array([1, 2], dtype=np.int64)
        np.testing.assert_array_equal(
            _skyline_mask(p, d), np.array([True, False])
        )

    def test_higher_price_equal_date_dominates(self):
        from geotile.ops.relational import _skyline_mask

        p = np.array([5.0, 4.0])
        d = np.array([1, 1], dtype=np.int64)
        np.testing.assert_array_equal(
            _skyline_mask(p, d), np.array([True, False])
        )

    def test_empty_and_single(self):
        from geotile.ops.relational import _skyline_mask

        assert _skyline_mask(np.array([]), np.array([], dtype=np.int64)).size == 0
        np.testing.assert_array_equal(
            _skyline_mask(np.array([3.0]), np.array([7], dtype=np.int64)),
            np.array([True]),
        )


class TestSkylineDistributed:
    def test_matches_brute_force_across_blocks(self, ray_session):
        from geotile.ops.relational import skyline

        rng = np.random.default_rng(23)
        n = 500
        df = pd.DataFrame(
            {
                "k": np.arange(n, dtype=np.int64),
                "p": rng.integers(0, 40, n).astype(np.float64),
                "d": rng.integers(0, 40, n).astype(np.int64),
            }
        )
        ds = _from_pandas(df).repartition(7)  # local pruning per block
        got = skyline(ds, "p", "d").to_pandas().sort_values("k")
        want = df[_brute_skyline(df["p"].to_numpy(), df["d"].to_numpy())]
        np.testing.assert_array_equal(
            got["k"].to_numpy(), want["k"].to_numpy()
        )


class TestCubeAggregate:
    def test_matches_pandas_cube(self, ray_session):
        from geotile.ops.relational import cube_aggregate

        rng = np.random.default_rng(5)
        n = 400
        df = pd.DataFrame(
            {
                "a": rng.choice(["x", "y", "z"], n),
                "b": rng.choice(["u", "v"], n),
                "val": rng.integers(0, 100, n).astype(np.int64),
            }
        )
        got = (
            cube_aggregate(_from_pandas(df).repartition(5), ["a", "b"], "val")
            .to_pandas()
            .sort_values(["gid", "a", "b"])
            .reset_index(drop=True)
        )
        # brute force: one pandas groupby per grouping set
        frames = []
        for gid, kept in [(0, ["a", "b"]), (1, ["b"]), (2, ["a"]), (3, [])]:
            if kept:
                g = df.groupby(kept, as_index=False).agg(
                    n=("val", "size"), sum_val=("val", "sum")
                )
            else:
                g = pd.DataFrame({"n": [n], "sum_val": [df["val"].sum()]})
            for k in ["a", "b"]:
                if k not in kept:
                    g[k] = "*"
            g["gid"] = gid
            frames.append(g[["gid", "a", "b", "n", "sum_val"]])
        want = (
            pd.concat(frames)
            .sort_values(["gid", "a", "b"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got.astype({"n": np.int64, "sum_val": np.int64}), want
        )

    def test_empty_input(self, ray_session):
        from geotile.ops.relational import cube_aggregate

        df = pd.DataFrame(
            {"a": pd.Series(dtype=str), "b": pd.Series(dtype=str),
             "val": pd.Series(dtype=np.int64)}
        )
        out = cube_aggregate(_from_pandas(df), ["a", "b"], "val").to_pandas()
        # documented divergence from SQL: Ray never schedules empty
        # blocks, so an empty input yields 0 rows (SQL CUBE would emit
        # one n=0 grand-total row); what matters is no crash and no
        # phantom counts
        assert len(out) == 0 or (out["n"] == 0).all()
