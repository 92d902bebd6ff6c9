"""Mergeable sketches for approximate aggregation at scale.

HyperLogLog (from scratch, numpy): each ``map_batches`` emits ONE
serialized register array per batch; the merge is an elementwise max —
the shuffle moves ``2^p`` bytes per batch instead of the key stream
(ray_guide: "sketches are designed to be mergeable"). The reference has
no approximate aggregates (SURVEY §2.5); this is part of the
training-data toolkit where exact distinct counts over 10^12 keys are
impractical.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from geotile.synth import splitmix64


class HLL:
    """HyperLogLog with 2**p registers (standard bias-corrected
    estimator with small/large-range corrections)."""

    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = (
            registers if registers is not None else np.zeros(self.m, dtype=np.uint8)
        )

    def add_hashes(self, h: np.ndarray) -> "HLL":
        h = np.asarray(h, dtype=np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64(1)  # sentinel bit
        # rank = leading zeros of the remaining 64-p bits, + 1
        lz = np.zeros(len(h), dtype=np.uint8)
        cur = rest.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            mask = cur < (np.uint64(1) << np.uint64(64 - shift))
            lz[mask] += shift
            cur[mask] = cur[mask] << np.uint64(shift)
        rank = np.minimum(lz + 1, 64 - self.p + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)
        return self

    def merge(self, other: "HLL") -> "HLL":
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        am = 0.7213 / (1 + 1.079 / m)
        E = am * m * m / np.sum(2.0 ** (-self.registers.astype(np.float64)))
        if E <= 2.5 * m:
            zeros = int((self.registers == 0).sum())
            if zeros:
                return m * np.log(m / zeros)
        return float(E)


class MisraGries:
    """Heavy-hitters summary with k counters: any item with true
    frequency > n/k survives, and each kept counter undercounts by at
    most n/k. Merging = add counters, then trim back to k (summaries
    stay mergeable, error bounds add)."""

    def __init__(self, k: int = 64):
        self.k = k
        self.counts: dict = {}
        self.decremented = 0

    def add(self, values: np.ndarray) -> "MisraGries":
        uniq, cnt = np.unique(np.asarray(values), return_counts=True)
        for v, c in zip(uniq.tolist(), cnt.tolist()):
            self.counts[v] = self.counts.get(v, 0) + c
        self._trim()
        return self

    def merge(self, other: "MisraGries") -> "MisraGries":
        for v, c in other.counts.items():
            self.counts[v] = self.counts.get(v, 0) + c
        self.decremented += other.decremented
        self._trim()
        return self

    def _trim(self) -> None:
        while len(self.counts) > self.k:
            dec = min(self.counts.values())
            self.counts = {v: c - dec for v, c in self.counts.items() if c > dec}
            self.decremented += dec

    def topk(self, n: int) -> list[tuple]:
        return sorted(self.counts.items(), key=lambda kv: (-kv[1], kv[0]))[:n]


def mg_topk(ds: rd.Dataset, column: str, k: int = 64, top: int = 10) -> list[tuple]:
    """Approximate top-``top`` heavy hitters of a column: per-batch
    Misra-Gries partials (≤k counters each) merged on the driver."""
    import pickle

    def partial(t: pa.Table) -> pa.Table:
        sk = MisraGries(k).add(t[column].to_numpy(zero_copy_only=False))
        return pa.table({"sketch": pa.array([pickle.dumps((sk.counts, sk.decremented))], pa.binary())})

    merged = MisraGries(k)
    for r in ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).take_all():
        other = MisraGries(k)
        other.counts, other.decremented = pickle.loads(r["sketch"])
        merged.merge(other)
    return merged.topk(top)


def hll_distinct_grouped(
    ds: rd.Dataset, column: str, group_col: str, p: int = 12
) -> rd.Dataset:
    """Per-group approximate COUNT(DISTINCT column): each batch emits
    one serialized HLL register row PER GROUP PRESENT (2^p bytes each —
    the combiner), then a groupby merges a group's registers with
    elementwise max and estimates. The shuffle moves
    ``2^p × groups-per-batch`` bytes, never the key stream; the result
    is identical to running the global sketch on each group's
    sub-stream (register max is associative + commutative), which is
    what the scalar-replay oracle recomputes.

    Columns: <group_col>, est (int64, rounded estimate)."""

    def partial(t: pa.Table) -> pa.Table:
        v = t[column].to_numpy(zero_copy_only=False).astype(np.int64)
        h = splitmix64(v.view(np.uint64))
        g = t[group_col].to_numpy(zero_copy_only=False)
        groups, inv = np.unique(g, return_inverse=True)
        regs = [
            HLL(p).add_hashes(h[inv == gi]).registers.tobytes()
            for gi in range(len(groups))
        ]
        return pa.table(
            {group_col: pa.array(groups), "registers": pa.array(regs, pa.binary())}
        )

    def merge_est(t: pa.Table) -> pa.Table:
        regs = np.stack(
            [np.frombuffer(b, dtype=np.uint8) for b in t["registers"].to_pylist()]
        ).max(axis=0)
        est = HLL(p, regs.copy()).estimate()
        return pa.table(
            {
                group_col: t[group_col][:1],
                "est": pa.array([int(round(est))], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(group_col)
        .map_groups(merge_est, batch_format="pyarrow")
    )


def hll_distinct(ds: rd.Dataset, column: str, p: int = 12) -> float:
    """Approximate COUNT(DISTINCT column) for an int64 column: per-batch
    partial HLLs (one 4KB row each) → distributed pre-merge (elementwise
    register max per block after a small repartition) → driver merges
    the ~#CPUs surviving rows. Without the pre-merge, 4KB × #batches
    lands on the driver — 100k+ blocks at full scale is hundreds of MB."""

    def partial(t: pa.Table) -> pa.Table:
        v = t[column].to_numpy(zero_copy_only=False).astype(np.int64)
        h = splitmix64(v.view(np.uint64))
        sk = HLL(p).add_hashes(h)
        return pa.table({"registers": pa.array([sk.registers.tobytes()], pa.binary())})

    def combine(t: pa.Table) -> pa.Table:
        regs = np.stack(
            [np.frombuffer(b, dtype=np.uint8) for b in t["registers"].to_pylist()]
        ).max(axis=0)
        return pa.table({"registers": pa.array([regs.tobytes()], pa.binary())})

    import ray

    n_pre = max(4, int(ray.cluster_resources().get("CPU", 16)) // 2)
    parts = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(n_pre)
        .map_batches(combine, batch_format="pyarrow", batch_size=None)
        .take_all()
    )
    merged = HLL(p)
    for r in parts:
        merged.merge(HLL(p, np.frombuffer(r["registers"], dtype=np.uint8).copy()))
    return merged.estimate()


def _cm_hash(v_u64: np.ndarray, r: int, w: int) -> np.ndarray:
    """Row-r count-min hash: splitmix64(v XOR splitmix64(r+1)) % w —
    identical (bit-for-bit) to the scalar replay in oracle_ref."""
    seed = splitmix64(np.array([r + 1], dtype=np.uint64))[0]
    return (splitmix64(v_u64 ^ seed) % np.uint64(w)).astype(np.int64)


def cm_sketch(
    ds: rd.Dataset, column: str, w: int = 2048, d: int = 4
) -> np.ndarray:
    """Count-min sketch of an int64 column: a (d × w) int64 counter
    grid, est(x) = min_r grid[r, h_r(x)], NEVER below the true count.
    Per batch each row hashes d ways and the batch pre-aggregates to
    its NONZERO (row·w + slot, count) cells — the shuffle moves at most
    d·w packed rows per batch (64 KB), never the key stream; one
    groupby sums the cells and the driver holds only the d×w grid.
    Deterministic: fixed seeds, integer adds — est is bit-reproducible,
    so a pure-int scalar replay can oracle it."""
    import ray

    def partial(t: pa.Table) -> pa.Table:
        v = t[column].to_numpy(zero_copy_only=False).astype(np.int64)
        u = v.view(np.uint64)
        keys = []
        for r in range(d):
            keys.append(np.int64(r * w) + _cm_hash(u, r, w))
        packed = np.concatenate(keys)
        cells, cnts = np.unique(packed, return_counts=True)
        return pa.table(
            {"cell": pa.array(cells), "c": pa.array(cnts.astype(np.int64))}
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cell")
        .sum("c")
        .take_all()
    )  # ≤ d·w tiny rows
    grid = np.zeros((d, w), dtype=np.int64)
    for rw in rows:
        grid[rw["cell"] // w, rw["cell"] % w] = rw["sum(c)"]
    return grid


def cm_estimate(grid: np.ndarray, ids: np.ndarray) -> np.ndarray:
    """Point-query the sketch for int64 ids (vectorized min over rows)."""
    d, w = grid.shape
    u = ids.astype(np.int64).view(np.uint64)
    est = np.full(len(ids), np.iinfo(np.int64).max, dtype=np.int64)
    for r in range(d):
        est = np.minimum(est, grid[r, _cm_hash(u, r, w)])
    return est
