"""HLL sketch accuracy + mergeability vs exact distinct counts."""

import numpy as np
import pytest
import ray.data as rd

from geotile.ops.sketch import HLL, hll_distinct
from geotile.synth import splitmix64


class TestHll:
    @pytest.mark.parametrize("n", [100, 10_000, 200_000])
    def test_accuracy(self, n):
        h = splitmix64(np.arange(n, dtype=np.uint64))
        est = HLL(p=12).add_hashes(h).estimate()
        rel = abs(est - n) / n
        assert rel < 0.05, f"n={n} est={est:.0f} rel={rel:.3f}"

    def test_merge_equals_union(self):
        a = splitmix64(np.arange(0, 50_000, dtype=np.uint64))
        b = splitmix64(np.arange(30_000, 80_000, dtype=np.uint64))
        merged = HLL(12).add_hashes(a).merge(HLL(12).add_hashes(b))
        direct = HLL(12).add_hashes(np.concatenate([a, b]))
        assert (merged.registers == direct.registers).all()
        assert abs(merged.estimate() - 80_000) / 80_000 < 0.05

    def test_misra_gries_bounds(self):
        from geotile.ops.sketch import MisraGries

        rng = np.random.default_rng(5)
        # zipf-ish: heavy hitters + uniform tail
        vals = np.concatenate([
            np.repeat(np.arange(5), 2000),        # 5 heavy items × 2000
            rng.integers(100, 10_000, 5_000),     # tail
        ])
        rng.shuffle(vals)
        k = 64
        sk = MisraGries(k)
        for chunk in np.array_split(vals, 7):
            sk.merge(MisraGries(k).add(chunk))
        top = dict(sk.topk(5))
        n = len(vals)
        for item in range(5):
            assert item in top
            assert 2000 - n / k <= top[item] <= 2000

    def test_mg_distributed(self, ray_session):
        from geotile.ops.sketch import mg_topk

        ds = rd.read_parquet("/root/testdata/sf0.001/events.parquet", columns=["event_type"])
        top = mg_topk(ds, "event_type", k=16, top=3)
        exact = (
            rd.read_parquet("/root/testdata/sf0.001/events.parquet", columns=["event_type"])
            .to_pandas()["event_type"].value_counts()
        )
        assert top[0][0] == exact.index[0]

    def test_distributed_distinct_users(self, ray_session):
        ds = rd.read_parquet("/root/testdata/sf0.001/events.parquet", columns=["user_id"])
        exact = len(set(r["user_id"] for r in ds.take_all()))
        est = hll_distinct(ds, "user_id")
        assert abs(est - exact) / exact < 0.1
