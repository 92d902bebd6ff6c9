"""connected_components vs a brute-force union-find on adversarial
shapes: random sparse graphs, long paths (diameter stress), stars
(hot-node stress), duplicate/reversed/self edges."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _cc_brute(edges):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {n: find(n) for n in parent}


def _run(ray_session, edges, **kw):
    import ray.data as rd

    from geotile.ops.graph import connected_components

    t = pa.table(
        {
            "a": pa.array([u for u, _ in edges], pa.int64()),
            "b": pa.array([v for _, v in edges], pa.int64()),
        }
    )
    got = connected_components(rd.from_arrow(t).repartition(4), **kw).to_pandas()
    return dict(zip(got.node.astype(int), got.cluster_id.astype(int)))


class TestConnectedComponents:
    def test_random_sparse(self, ray_session):
        rng = np.random.default_rng(5)
        edges = [tuple(map(int, e)) for e in rng.integers(0, 200, (150, 2))]
        assert _run(ray_session, edges, n_buckets=8) == _cc_brute(edges)

    def test_path_and_star(self, ray_session):
        # an 18-node path (diameter stress: needs ~5 pointer-jump
        # rounds) + a 50-leaf star + a disjoint triangle with duplicate
        # and reversed edges
        edges = [(i, i + 1) for i in range(100, 118)]
        edges += [(500, 600 + i) for i in range(50)]
        edges += [(7, 8), (8, 9), (9, 7), (8, 7), (7, 7)]
        assert _run(ray_session, edges, n_buckets=4) == _cc_brute(edges)

    def test_single_edge_and_selfloop(self, ray_session):
        edges = [(3, 3), (10, 11)]
        got = _run(ray_session, edges)
        assert got == {3: 3, 10: 10, 11: 10}

    def test_max_rounds_guard(self, ray_session):
        edges = [(i, i + 1) for i in range(0, 30)]
        with pytest.raises(RuntimeError, match="converge"):
            _run(ray_session, edges, max_rounds=2)
