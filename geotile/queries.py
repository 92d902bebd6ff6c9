"""Driver-contract query battery (CORRECTNESS gate).

Each ``q_*`` function takes ``sf_dir`` (a /root/testdata/sf* directory)
and returns a Dataset / pandas DataFrame; ``ORACLE_SQL`` holds the
DuckDB-equivalent ANSI SQL for every SQL-expressible query, with
IDENTICAL column names and float rounding on both sides (the driver
hashes values after sorting columns by name).

Mapping to SURVEY §2 operators is noted per query. Scale disciplines
demonstrated: column pruning at the read, per-batch partial aggregation
before every groupby, broadcast small sides (never a fact-side
shuffle join), vectorized pyarrow/numpy batch bodies.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

_R = 4  # float rounding for driver value-hash comparability


def _e(col, scale: int):
    """Exact-integer lattice for a float aggregate: round(x*scale) as
    int64. Raw rounded doubles can differ by 1 ULP between pyarrow and
    DuckDB; the integer lattice makes the driver value-hash exact."""
    return pc.round(pc.multiply(col, pa.scalar(float(scale)))).cast(pa.int64())


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _rename(ds: rd.Dataset, names: list[str]) -> rd.Dataset:
    return ds.map_batches(lambda t: t.rename_columns(names), batch_format="pyarrow")


def _broadcast(ref):
    """Per-worker-process cached ray.get of a broadcast ObjectRef (the
    ops/join cache): stateless map tasks get actor-style amortization
    without reserving CPUs (the round-1 starvation lesson)."""
    from geotile.ops.join import _get_broadcast

    return _get_broadcast(ref)


# ---------------------------------------------------------------------------
# q1: pricing summary — the partial+final aggregation pattern (SURVEY A4/M)
# ---------------------------------------------------------------------------

def q_pricing_summary(sf_dir: str):
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
                "l_discount", "l_shipdate"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], pa.scalar(np.datetime64("1995-09-02", "us"))))
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        t = t.append_column("rev", rev)
        # Arrow-native combiner — no pandas round trip (VERDICT r2 #5)
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("rev", "sum"), ("rev", "count")]
        )
        return pa.table(
            {
                "l_returnflag": g["l_returnflag"],
                "l_linestatus": g["l_linestatus"],
                "sum_qty": g["l_quantity_sum"],
                "sum_rev": g["rev_sum"],
                "n": g["rev_count"],
            }
        )

    out = ds.map_batches(partial, batch_format="pyarrow").groupby(
        ["l_returnflag", "l_linestatus"]
    ).sum(["sum_qty", "sum_rev", "n"])
    out = _rename(out, ["l_returnflag", "l_linestatus", "sum_qty", "sum_rev", "n"])
    # exact-integer lattice: double rounding differs by 1 ULP between
    # engines, so hashable float outputs are scaled to BIGINT instead
    return out.map_batches(
        lambda t: t.set_column(2, "sum_qty", _e(t["sum_qty"], 100))
        .set_column(3, "sum_rev", _e(t["sum_rev"], 10000))
        .rename_columns(["l_returnflag", "l_linestatus", "sum_qty_e2", "sum_rev_e4", "n"]),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# stop→route assignment analog: orders fact grouped, dims broadcast (J1/J2)
# ---------------------------------------------------------------------------

def q_cust_nation_orders(sf_dir: str):
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])

    # partial per-batch combine, then one small groupby (same shape as J1)
    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("o_custkey").aggregate(
            [("o_orderkey", "count"), ("o_totalprice", "sum")]
        )
        return pa.table(
            {
                "o_custkey": g["o_custkey"],
                "n_orders": g["o_orderkey_count"],
                "total": g["o_totalprice_sum"],
            }
        )

    agg = orders.map_batches(partial, batch_format="pyarrow").groupby("o_custkey").sum(
        ["n_orders", "total"]
    )
    agg = _rename(agg, ["custkey", "n_orders", "total"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey"]).take_all()
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).take_all()
    nat = {r["n_nationkey"]: r["n_name"] for r in nation}
    ck = np.array(sorted(r["c_custkey"] for r in cust), dtype=np.int64)
    by_key = {r["c_custkey"]: r for r in cust}
    dim_ref = ray.put(
        (
            ck,
            pa.array([by_key[k]["c_name"] for k in ck], pa.string()),
            pa.array([nat[by_key[k]["c_nationkey"]] for k in ck], pa.string()),
        )
    )

    def attach(t: pa.Table) -> pa.Table:
        # stateless task + per-worker broadcast cache; searchsorted
        # gather instead of a per-row dict lookup (VERDICT r1 #6)
        keys, names, nats = _broadcast(dim_ref)
        idx = pa.array(np.searchsorted(keys, t["custkey"].to_numpy()))
        return (
            t.append_column("c_name", pc.take(names, idx))
            .append_column("nation", pc.take(nats, idx))
            .set_column(2, "total", _e(t["total"], 100))
            .rename_columns(["custkey", "n_orders", "total_e2", "c_name", "nation"])
        )

    return agg.map_batches(attach, batch_format="pyarrow")


def q_broadcast_join_brand_revenue(sf_dir: str):
    """J2-style broadcast join: lineitem fact × part dim (ray.put once)."""
    part = _read(sf_dir, "part", ["p_partkey", "p_brand"]).take_all()
    pk = np.array(sorted(r["p_partkey"] for r in part), dtype=np.int64)
    bmap = {r["p_partkey"]: r["p_brand"] for r in part}
    brands_sorted = sorted({r["p_brand"] for r in part})
    code_of = {b: i for i, b in enumerate(brands_sorted)}
    # brand CODE per sorted partkey: the fact-side gather is pure numpy
    codes = np.array([code_of[bmap[k]] for k in pk], dtype=np.int64)
    dim_ref = ray.put((pk, codes, brands_sorted))
    ds = _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        # searchsorted gather + bincount combiner: no per-row Python on
        # the lineitem fact (VERDICT r1 #6)
        pk_, codes_, brands_ = _broadcast(dim_ref)
        c = codes_[np.searchsorted(pk_, t["l_partkey"].to_numpy())]
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        ).to_numpy()
        sums = np.bincount(c, weights=rev, minlength=len(brands_))
        ns = np.bincount(c, minlength=len(brands_))
        nz = ns > 0
        return pa.table(
            {
                "p_brand": pa.array(np.asarray(brands_, dtype=object)[nz], pa.string()),
                "revenue": pa.array(sums[nz]),
                "n": pa.array(ns[nz].astype(np.int64)),
            }
        )

    out = ds.map_batches(partial, batch_format="pyarrow").groupby(
        "p_brand"
    ).sum(["revenue", "n"])
    out = _rename(out, ["p_brand", "revenue", "n"])
    return out.map_batches(
        lambda t: t.set_column(1, "revenue", _e(t["revenue"], 10000)).rename_columns(
            ["p_brand", "revenue_e4", "n"]
        ),
        batch_format="pyarrow",
    )


def q_semi_join_date_filter(sf_dir: str):
    """J5 analog: date-ranged orders → broadcast keyset semi-join on the
    lineitem fact (the reference's service_id filter)."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    keys = orders.map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.greater_equal(t["o_orderdate"], pa.scalar(np.datetime64("1995-01-01", "us"))),
                pc.less(t["o_orderdate"], pa.scalar(np.datetime64("1996-01-01", "us"))),
            )
        ).select(["o_orderkey"]),
        batch_format="pyarrow",
    ).take_all()
    keyset_ref = ray.put(pa.array(sorted(r["o_orderkey"] for r in keys)))
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def semi(t: pa.Table) -> pa.Table:
        f = t.filter(pc.is_in(t["l_orderkey"], _broadcast(keyset_ref)))
        return pa.table(
            {"n_items": pa.array([len(f)], pa.int64()),
             "sum_qty": pa.array([pc.sum(f["l_quantity"]).as_py() or 0.0], pa.float64())}
        )

    out = ds.map_batches(semi, batch_format="pyarrow")
    df = out.to_pandas().sum()
    return pd.DataFrame(
        {"n_items": [int(df.n_items)], "sum_qty_e2": [int(round(float(df.sum_qty) * 100))]}
    )


def q_left_join_customer_orders(sf_dir: str):
    """J4-style LEFT join: every customer row survives with n_orders=0."""
    orders = _read(sf_dir, "orders", ["o_custkey"])
    counts = orders.groupby("o_custkey").count()
    counts = _rename(counts, ["custkey", "cnt"])
    rows = counts.take_all()
    ck = np.array(sorted(r["custkey"] for r in rows), dtype=np.int64)
    by = {r["custkey"]: r["cnt"] for r in rows}
    cnt = np.array([by[k] for k in ck], dtype=np.int64)
    dim_ref = ray.put((ck, cnt))
    cust = _read(sf_dir, "customer", ["c_custkey"])

    def attach(t: pa.Table) -> pa.Table:
        # LEFT semantics: missing keys get 0 (masked searchsorted gather)
        ck_, cnt_ = _broadcast(dim_ref)
        k = t["c_custkey"].to_numpy()
        idx = np.searchsorted(ck_, k)
        idx_c = np.minimum(idx, len(ck_) - 1) if len(ck_) else idx
        hit = (ck_[idx_c] == k) if len(ck_) else np.zeros(len(k), bool)
        n = np.where(hit, cnt_[idx_c] if len(ck_) else 0, 0)
        return pa.table(
            {"custkey": t["c_custkey"], "n_orders": pa.array(n.astype(np.int64))}
        )

    return cust.map_batches(attach, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# distinct / dedup / union / sort-limit (SURVEY §2.7)
# ---------------------------------------------------------------------------

def q_distinct_parts_per_flag(sf_dir: str):
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_partkey"])
    # per-batch dedup (combiner) → exact distinct per flag
    pre = ds.map_batches(
        lambda t: t.group_by(["l_returnflag", "l_partkey"]).aggregate([]),
        batch_format="pyarrow",
    )
    pairs = pre.groupby(["l_returnflag", "l_partkey"]).count()
    out = pairs.groupby("l_returnflag").count()
    return _rename(out, ["l_returnflag", "n_parts"])


def q_exact_dedup_docs(sf_dir: str):
    from geotile.ops.dedup import exact_dedup

    return exact_dedup(_read(sf_dir, "documents", ["doc_id", "text"]))


def q_union_order_subsets(sf_dir: str):
    a = _read(sf_dir, "orders", ["o_orderstatus", "o_totalprice"]).map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], 200000.0)), batch_format="pyarrow"
    )
    b = _read(sf_dir, "orders", ["o_orderstatus", "o_totalprice"]).map_batches(
        lambda t: t.filter(pc.less(t["o_totalprice"], 50000.0)), batch_format="pyarrow"
    )
    u = a.union(b)
    out = u.groupby("o_orderstatus").count()
    return _rename(out, ["o_orderstatus", "n"])


def q_topk_orders(sf_dir: str):
    """Top-10 orders by price: per-batch partial top-k → one tiny final
    reduce. No global sort — the all-to-all a full ds.sort() would do
    moves every row for a 10-row answer (VERDICT r1 #5)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    k = 10

    def top_of(t: pa.Table) -> pa.Table:
        price = t["o_totalprice"].to_numpy()
        key = t["o_orderkey"].to_numpy()
        if len(price) > k:
            kth = np.partition(price, len(price) - k)[len(price) - k]
            m = price >= kth  # keeps every potential top-k row incl. ties
            price, key = price[m], key[m]
        order = np.lexsort((key, -price))[:k]
        return pa.table(
            {"o_orderkey": pa.array(key[order]), "o_totalprice": pa.array(price[order])}
        )

    partials = ds.map_batches(top_of, batch_format="pyarrow", zero_copy_batch=True)
    # final reduce over <= k*n_blocks rows — coalesce to one tiny block
    return partials.repartition(1).map_batches(top_of, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# geometry-flavored, SQL-checkable (cells / bbox / PIP / spatial join)
# ---------------------------------------------------------------------------

def q_envelope_events(sf_dir: str):
    """A1 envelope as partial+final min/max over derived x/y points."""
    ds = _read(sf_dir, "events", ["value", "user_id"])

    def partial(t: pa.Table) -> pa.Table:
        x = t["value"].to_numpy()
        y = t["user_id"].to_numpy().astype(np.float64)
        return pa.table(
            {"min_x": [float(x.min())], "max_x": [float(x.max())],
             "min_y": [float(y.min())], "max_y": [float(y.max())]}
        )

    p = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return pd.DataFrame(
        {
            "min_x": [p.min_x.min()],
            "max_x": [p.max_x.max()],
            "min_y": [p.min_y.min()],
            "max_y": [p.max_y.max()],
        }
    )


def q_cell_quantize_events(sf_dir: str):
    """Cell encoding (SQL-checkable square grid; the Morton packing of
    the same (ix, iy) is covered by geom unit tests)."""
    ds = _read(sf_dir, "events", ["value", "user_id"])

    def enc(t: pa.Table) -> pa.Table:
        ix = np.floor(t["value"].to_numpy() / 5.0).astype(np.int64)
        iy = (t["user_id"].to_numpy() // 10).astype(np.int64)
        g = pa.table({"ix": ix, "iy": iy, "one": np.ones(len(ix), np.int64)}).group_by(
            ["ix", "iy"]
        ).aggregate([("one", "count")])
        return pa.table({"ix": g["ix"], "iy": g["iy"], "n": g["one_count"]})

    out = ds.map_batches(enc, batch_format="pyarrow").groupby(["ix", "iy"]).sum("n")
    return _rename(out, ["ix", "iy", "n"])


_TRI = ((1.0, 1.0), (9.0, 2.0), (5.0, 9.0))  # CCW triangle


def _derived_points(doc_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic synthetic points, expressible identically in SQL."""
    x = (doc_id * 2654435761 % 4294967296).astype(np.float64) / 4294967296.0 * 10.0
    y = ((doc_id * 40503 + 7) % 65536).astype(np.float64) / 65536.0 * 10.0
    return x, y


def q_pip_triangle_docs(sf_dir: str):
    """Point-in-polygon spatial join with a SQL oracle: strict half-plane
    containment of derived points in a fixed CCW triangle."""
    ds = _read(sf_dir, "documents", ["doc_id"])

    def pip(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy()
        x, y = _derived_points(d)
        (ax, ay), (bx, by), (cx, cy) = _TRI
        s1 = (bx - ax) * (y - ay) - (by - ay) * (x - ax)
        s2 = (cx - bx) * (y - by) - (cy - by) * (x - bx)
        s3 = (ax - cx) * (y - cy) - (ay - cy) * (x - cx)
        inside = (s1 > 0) & (s2 > 0) & (s3 > 0)
        return pa.table({"doc_id": pa.array(d[inside])})

    return ds.map_batches(pip, batch_format="pyarrow")


def q_spatial_grid_join_docs(sf_dir: str):
    """Grid-cell spatial aggregation of the derived points: count per
    occupied unit cell — the tile-assignment shape with a SQL oracle."""
    ds = _read(sf_dir, "documents", ["doc_id"])

    def enc(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy()
        x, y = _derived_points(d)
        ix = np.floor(x).astype(np.int64)
        iy = np.floor(y).astype(np.int64)
        g = pa.table({"ix": ix, "iy": iy, "one": np.ones(len(ix), np.int64)}).group_by(
            ["ix", "iy"]
        ).aggregate([("one", "count")])
        return pa.table({"ix": g["ix"], "iy": g["iy"], "n": g["one_count"]})

    out = ds.map_batches(enc, batch_format="pyarrow").groupby(["ix", "iy"]).sum("n")
    return _rename(out, ["ix", "iy", "n"])


def q_anti_join_customers(sf_dir: str):
    """Anti-join with a size guard (VERDICT r2 #4): a small key set
    broadcasts and filters inside map_batches; beyond the cap the
    relational.anti_join helper falls back to the bucketed co-partition
    path — driver memory never scales with the filter's selectivity."""
    from geotile.ops.relational import anti_join

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    big = orders.map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], 350000.0)).select(["o_custkey"]),
        batch_format="pyarrow",
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    return anti_join(cust, big, "c_custkey", "o_custkey")


def q_sliding_window_events(sf_dir: str):
    """Sliding windows (10-min window, 5-min slide): each event lands in
    two windows — flat-map expansion per batch, then the same partial +
    groupby reduce as the tumbling case."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def expand(t: pa.Table) -> pa.Table:
        ts_us = t["ts"].cast(pa.int64()).to_numpy()
        slot = ts_us // 300_000_000
        et = t["event_type"].combine_chunks()
        val = t["value"].combine_chunks()
        both = pa.table(
            {
                "event_type": pa.concat_arrays([et, et]),
                "w": np.concatenate([slot, slot - 1]),
                "value": pa.concat_arrays([val, val]),
            }
        )
        both = both.filter(pc.greater_equal(both["w"], 0))
        g = both.group_by(["event_type", "w"]).aggregate(
            [("value", "count"), ("value", "sum")]
        )
        return pa.table(
            {"event_type": g["event_type"], "w": g["w"],
             "n": g["value_count"], "sum_value": g["value_sum"]}
        )

    out = ds.map_batches(expand, batch_format="pyarrow").groupby(["event_type", "w"]).sum(
        ["n", "sum_value"]
    )
    out = _rename(out, ["event_type", "w", "n", "sum_value"])
    return out.map_batches(
        lambda t: t.set_column(3, "sum_value", _e(t["sum_value"], 100)).rename_columns(
            ["event_type", "w", "n", "sum_value_e2"]
        ),
        batch_format="pyarrow",
    )


def q_event_props_stats(sf_dir: str):
    """JSON-metadata extraction (training pipelines parse JSON sidecar
    columns): pull ``k`` out of the props JSON with a vectorized regex
    (pyarrow extract — no per-row json.loads), aggregate per type."""
    ds = _read(sf_dir, "events", ["event_type", "props"])

    def extract(t: pa.Table) -> pa.Table:
        k = pc.extract_regex(t["props"], r'"k":\s*(?P<k>\d+)')
        kv = pc.struct_field(k, "k").cast(pa.int64())
        if isinstance(kv, pa.ChunkedArray):
            kv = kv.combine_chunks()
        g = pa.table(
            {"event_type": t["event_type"].combine_chunks(), "k": kv}
        ).group_by("event_type").aggregate([("k", "sum"), ("k", "count")])
        return pa.table(
            {"event_type": g["event_type"], "sum_k": g["k_sum"], "n": g["k_count"]}
        )

    out = ds.map_batches(extract, batch_format="pyarrow", zero_copy_batch=True).groupby(
        "event_type"
    ).sum(["sum_k", "n"])
    return _rename(out, ["event_type", "sum_k", "n"])


def q_hll_distinct_users(sf_dir: str):
    """Approximate distinct users via mergeable HLL sketch. Oracle
    contract (VERDICT r2): the estimate must match an INDEPENDENT scalar
    HLL replay (oracle_ref sidecar) exactly, the exact count must match
    SQL COUNT(DISTINCT), and the bounded-error flag |est−exact|/exact ≤
    0.05 must hold."""
    from geotile.ops.sketch import hll_distinct

    ds = _read(sf_dir, "events", ["user_id"])
    est = int(round(hll_distinct(ds, "user_id")))
    exact = int(q_distinct_users_exact(sf_dir)["distinct_users"][0])
    return pd.DataFrame(
        {
            "distinct_users_est": [est],
            "distinct_users": [exact],
            "est_ok": [abs(est - exact) / max(exact, 1) <= 0.05],
        }
    )


def q_hll_grouped_users(sf_dir: str):
    """Per-group approximate distinct users (sketch.hll_distinct_grouped
    — mergeable per-group HLL registers, one 4KB row per group per
    batch). Same oracle contract as the global sketch: estimate ==
    independent scalar replay (sidecar), exact == SQL COUNT(DISTINCT),
    bounded error flag genuinely computed engine-side."""
    from geotile.ops.sketch import hll_distinct_grouped

    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    est = {
        r["event_type"]: int(r["est"])
        for r in hll_distinct_grouped(ds, "user_id", "event_type").take_all()
    }

    # exact per group: batch-local distinct pairs → pair-scale groupby →
    # per-batch partial counts → group-scale sum
    def pair_distinct(t: pa.Table) -> pa.Table:
        g = t.group_by(["event_type", "user_id"]).aggregate([])
        return g

    def cnt(t: pa.Table) -> pa.Table:
        g = t.group_by("event_type").aggregate([([], "count_all")])
        return pa.table(
            {"event_type": g["event_type"], "n": g["count_all"].cast(pa.int64())}
        )

    exact_rows = (
        ds.map_batches(pair_distinct, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "user_id"])
        .count()
        .map_batches(cnt, batch_format="pyarrow")
        .groupby("event_type")
        .sum("n")
        .take_all()  # dimension-scale: one row per event_type
    )
    types = sorted(r["event_type"] for r in exact_rows)
    exact = {r["event_type"]: int(r["sum(n)"]) for r in exact_rows}
    return pd.DataFrame(
        {
            "event_type": types,
            "distinct_users_est": [est[t] for t in types],
            "distinct_users": [exact[t] for t in types],
            "est_ok": [
                abs(est[t] - exact[t]) / max(exact[t], 1) <= 0.05 for t in types
            ],
        }
    )


def q_distinct_users_exact(sf_dir: str):
    """Exact companion to the HLL sketch: per-batch dedup combiner →
    one groupby over the pre-deduped user ids → count. The shuffle
    moves distinct ids per block, never event rows."""
    ds = _read(sf_dir, "events", ["user_id"])
    pre = ds.map_batches(
        lambda t: pa.table({"user_id": t["user_id"].combine_chunks().unique()}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    n = pre.groupby("user_id").count().count()
    return pd.DataFrame({"distinct_users": [int(n)]})


def q_heavy_hitter_users(sf_dir: str):
    """Misra-Gries heavy hitters with an exactness contract: the engine
    computes the EXACT top-10 users by event count (deterministic
    tie-break: count DESC, user_id ASC — SQL-replayable) plus a flag
    that the MG(k=64) sketch retained every TRUE heavy hitter — the MG
    guarantee covers exactly the users with frequency > n/64 (vacuous
    on uniform data; the skewed-distribution case is asserted in
    tests/test_sketch.py)."""
    from geotile.ops.sketch import mg_topk

    ev = _read(sf_dir, "events", ["user_id"])
    counts = ev.groupby("user_id").count()

    def top_of(t: pa.Table) -> pa.Table:
        # partial top-10 per block (never pull the full distinct-user
        # set to the driver — same shape as q_topk_orders)
        u = t[t.column_names[0]].to_numpy()
        n = t[t.column_names[1]].to_numpy().astype(np.int64)
        order = np.lexsort((u, -n))[:10]
        return pa.table({"user_id": pa.array(u[order]), "n": pa.array(n[order])})

    top = (
        counts.map_batches(top_of, batch_format="pyarrow")
        .repartition(1)
        .map_batches(top_of, batch_format="pyarrow")
        .to_pandas()
    )
    mg_ids = {v for v, _ in mg_topk(ev, "user_id", k=64, top=64)}
    total = int(ev.count())
    heavies = top[top["n"] > total / 64]["user_id"]
    found = all(u in mg_ids for u in heavies)
    return pd.DataFrame(
        {
            "user_id": top["user_id"].to_numpy(),
            "n": top["n"].to_numpy(),
            "mg_found": np.full(len(top), found),
        }
    )


def q_hash_sample_docs(sf_dir: str):
    """Deterministic 10% hash sample (the reproducible, shard-stable way
    to sample at scale — rng sampling can't be oracle-checked)."""
    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def sample(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy()
        keep = (d * 2654435761 % 4294967296) % 10 == 0
        return t.filter(pa.array(keep))

    return ds.map_batches(sample, batch_format="pyarrow", zero_copy_batch=True)


def q_bucket_join_priority_revenue(sf_dir: str):
    """Both-sides-large hash join (bucketed co-partition, no broadcast):
    lineitem ⋈ orders on orderkey → revenue per order priority."""
    from geotile.ops.relational import bucketed_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    joined = bucketed_join(li, orders, "l_orderkey", "o_orderkey", n_buckets=16)

    def partial(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        g = (
            t.select(["o_orderpriority"]).append_column("rev", rev)
            .group_by("o_orderpriority")
            .aggregate([("rev", "sum"), ("rev", "count")])
        )
        return pa.table(
            {"o_orderpriority": g["o_orderpriority"], "revenue": g["rev_sum"],
             "n": g["rev_count"]}
        )

    out = joined.map_batches(partial, batch_format="pyarrow").groupby(
        "o_orderpriority"
    ).sum(["revenue", "n"])
    out = _rename(out, ["o_orderpriority", "revenue", "n"])
    return out.map_batches(
        lambda t: t.set_column(1, "revenue", _e(t["revenue"], 10000)).rename_columns(
            ["o_orderpriority", "revenue_e4", "n"]
        ),
        batch_format="pyarrow",
    )


def q_user_sessions(sf_dir: str):
    """Streaming-shaped sessionization: per user, 30-min-gap sessions."""
    from geotile.ops.relational import sessionize

    ev = _read(sf_dir, "events", ["user_id", "ts"])
    s = sessionize(ev, key="user_id", ts="ts", gap_s=1800.0)
    out = s.groupby("user_id").max("session_idx")
    return out.map_batches(
        lambda t: pa.table(
            {
                "user_id": t["user_id"],
                "n_sessions": pc.add(t["max(session_idx)"], pa.scalar(1, pa.int64())),
            }
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# events windowing (streaming-shaped; ray_guide pattern)
# ---------------------------------------------------------------------------

def q_window_events(sf_dir: str):
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def win(t: pa.Table) -> pa.Table:
        ts_us = t["ts"].cast(pa.int64()).to_numpy()
        w = ts_us // 300_000_000  # 5-minute tumbling windows
        g = pa.table(
            {"event_type": t["event_type"].combine_chunks(), "w": w,
             "value": t["value"].combine_chunks()}
        ).group_by(["event_type", "w"]).aggregate([("value", "count"), ("value", "sum")])
        return pa.table(
            {"event_type": g["event_type"], "w": g["w"],
             "n": g["value_count"], "sum_value": g["value_sum"]}
        )

    out = ds.map_batches(win, batch_format="pyarrow").groupby(["event_type", "w"]).sum(
        ["n", "sum_value"]
    )
    out = _rename(out, ["event_type", "w", "n", "sum_value"])
    return out.map_batches(
        lambda t: t.set_column(3, "sum_value", _e(t["sum_value"], 100)).rename_columns(
            ["event_type", "w", "n", "sum_value_e2"]
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# text + vector queries
# ---------------------------------------------------------------------------

def q_doc_token_stats(sf_dir: str):
    from geotile.ops.text import token_stats_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(token_stats_batch, batch_format="pyarrow", zero_copy_batch=True)
    return out.select_columns(["doc_id", "n_tokens", "n_stopwords", "n_punct"])


def q_doc_stats_by_lang(sf_dir: str):
    ds = _read(sf_dir, "documents", ["lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("lang").aggregate([("n_chars", "count"), ("n_chars", "sum")])
        return pa.table(
            {"lang": g["lang"], "n": g["n_chars_count"], "sum_chars": g["n_chars_sum"]}
        )

    out = ds.map_batches(partial, batch_format="pyarrow").groupby("lang").sum(
        ["n", "sum_chars"]
    )
    return _rename(out, ["lang", "n", "sum_chars"])


def q_knn_embeddings(sf_dir: str):
    from geotile.ops.ann import topk_bruteforce

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    q = emb.map_batches(
        lambda t: t.filter(pc.less(t["vec_id"], 5)), batch_format="pyarrow"
    ).take_all()
    qids = np.array([r["vec_id"] for r in q], dtype=np.int64)
    Q = np.array([r["embedding"] for r in q], dtype=np.float64)
    order = np.argsort(qids)
    out = topk_bruteforce(emb, qids[order], Q[order], k=3)
    return out.map_batches(
        lambda t: pa.table(
            {
                "query_id": t["query_id"],
                "vec_id": t["vec_id"],
                "cosine_e6": _e(t["cosine"], 1_000_000),
                "rank": t["rank"],
            }
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# rows-only queries (non-SQL-expressible; driver records weaker check)
# ---------------------------------------------------------------------------

def q_lang_id_docs(sf_dir: str):
    from geotile.ops.text import lang_id

    return lang_id(_read(sf_dir, "documents", ["doc_id", "text", "lang"])).select_columns(
        ["doc_id", "lang", "lang_pred"]
    )


def q_fingerprint_docs(sf_dir: str):
    from geotile.ops.text import fingerprint_batch

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fingerprint_batch, batch_format="pyarrow", zero_copy_batch=True
    ).select_columns(["doc_id", "fingerprint"])


def q_minhash_pairs_docs(sf_dir: str):
    """MinHash+LSH near-dup pairs; jaccard scaled to the e6 integer
    lattice so the driver hash matches the scalar-replay sidecar."""
    from geotile.ops.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(
        _read(sf_dir, "documents", ["doc_id", "text"]), threshold=0.35
    )
    return pairs.map_batches(
        lambda t: pa.table(
            {"a": t["a"], "b": t["b"], "jaccard_e6": _e(t["jaccard"], 1_000_000)}
        ),
        batch_format="pyarrow",
    )


def q_simhash_docs(sf_dir: str):
    from geotile.ops.dedup import simhash_batch

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        simhash_batch, batch_format="pyarrow", zero_copy_batch=True
    ).select_columns(["doc_id", "simhash"])


def q_simhash_pairs_docs(sf_dir: str):
    """SimHash near-dup PAIRS (pigeonhole banding + Hamming verify) —
    oracle: independent scalar replay sidecar."""
    from geotile.ops.dedup import simhash_pairs

    return simhash_pairs(_read(sf_dir, "documents", ["doc_id", "text"]), max_hamming=4)


def q_embedding_dups(sf_dir: str):
    from geotile.ops.dedup import embedding_dup_pairs

    return embedding_dup_pairs(_read(sf_dir, "embeddings", ["vec_id", "embedding"]), tau=0.35)


def q_ivf_ann(sf_dir: str):
    """IVF ANN with a bounded-recall oracle contract (VERDICT r2): the
    engine computes IVF top-3 AND the exact brute-force top-3 and emits
    deterministic pass/fail rows the driver hashes against the oracle's
    TRUE: per query recall@3 ≥ 1/3, and mean recall over the query set
    ≥ 0.6. (The testdata embeddings are near-uniform random — no cluster
    structure — so nprobe=4/8 IVF recall is inherently moderate: the
    measured per-scale means are 0.67-0.73, deterministic given the
    fixed data and seeded k-means.) The raw IVF neighbor rows are not
    oracle-predictable without replaying k-means; they stay covered by
    the pytest recall assertions."""
    from geotile.ops.ann import ivf_topk, topk_bruteforce

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    q = emb.map_batches(
        lambda t: t.filter(pc.less(t["vec_id"], 5)), batch_format="pyarrow"
    ).take_all()
    qids = np.array(sorted(r["vec_id"] for r in q), dtype=np.int64)
    Q = np.array([r["embedding"] for r in sorted(q, key=lambda r: r["vec_id"])], dtype=np.float64)
    ivf = ivf_topk(emb, qids, Q, k=3, n_centroids=8, nprobe=4).to_pandas()
    exact = topk_bruteforce(emb, qids, Q, k=3).to_pandas()
    recalls, rows = [], []
    for qid in qids:
        got = set(ivf[ivf["query_id"] == qid]["vec_id"])
        want = set(exact[exact["query_id"] == qid]["vec_id"])
        r = len(got & want) / max(len(want), 1)
        recalls.append(r)
        rows.append({"query_id": int(qid), "recall_ok": r >= 1 / 3})
    mean_ok = bool(np.mean(recalls) >= 0.6)
    return pd.DataFrame([{**row, "mean_ok": mean_ok} for row in rows])


# -- graft flagship over the synthesized image table (cached per sf) --------

_SF_IMAGE_ROWS = {"sf0.001": 2_000, "sf0.01": 20_000, "sf0.1": 200_000}


def _image_dir_for(sf_dir: str) -> str:
    import os
    from pathlib import Path

    from geotile.synth import make_image_table

    sf_name = Path(sf_dir).name
    n = _SF_IMAGE_ROWS.get(sf_name, 2_000)
    out = Path(os.environ.get("GEOTILE_CACHE", "/tmp/geotile_cache")) / f"images_{sf_name}"
    make_image_table(n, out)  # skips existing parts; auto-parallel
    return str(out)


def _fixture_ctx():
    import os
    from pathlib import Path

    from geotile.ops.gtfs import GtfsContext
    from geotile.synth import make_caltrain_fixture

    d = Path(os.environ.get("GEOTILE_CACHE", "/tmp/geotile_cache")) / "caltrain"
    if not (d / "_COMPLETE").exists():
        # atomic cache fill: build into a PID-unique dir, rename into
        # place, mark complete. Concurrent fillers each build their own
        # tmp (content is deterministic, so any winner is correct); a
        # loser whose rename fails re-checks for the winner's marker.
        import shutil

        if d.exists():  # stale partial from a killed run
            shutil.rmtree(d, ignore_errors=True)
        tmp = d.with_name(f"{d.name}.tmp-{os.getpid()}")
        if tmp.exists():
            shutil.rmtree(tmp)
        make_caltrain_fixture(tmp)
        # marker inside tmp BEFORE the rename: dest can never exist in an
        # unmarked state, so losers neither delete a winner nor raise
        (tmp / "_COMPLETE").touch()
        try:
            tmp.rename(d)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
            if not (d / "_COMPLETE").exists():
                raise
    return GtfsContext(d)


# in-process memos: each graft query re-ran the route-buffer raster +
# index build (~5-9 s); one driver session runs many queries serially
_MEMO: dict = {}


def _geom_digest() -> str:
    """CONTENT hash of the modules the fixture geometry depends on, so
    ANY code change to the index build, geometry kernels or fixture
    synth auto-invalidates cached artifacts (route-index pickle AND the
    oracle sidecar parquets — ADVICE r2: existence-keyed sidecars would
    silently replay stale geometry expectations after an edit)."""
    from pathlib import Path
    from hashlib import blake2b

    import geotile.geom.buffer as _b
    import geotile.geom.cells as _c
    import geotile.geom.pip as _p
    import geotile.geom.raster as _r
    import geotile.geom.rdp as _rd
    import geotile.ops.join as _j
    import geotile.synth as _sy

    hh = blake2b(digest_size=8)
    for mod in (_j, _r, _p, _c, _b, _rd, _sy):
        hh.update(Path(mod.__file__).read_bytes())
    return hh.hexdigest()


def _fixture_route_index():
    if "route_index" not in _MEMO:
        import os
        import pickle
        from pathlib import Path

        from geotile.config import PipelineConfig
        from geotile.ops.join import build_route_index, route_buffer_polygons

        # cross-process cache: the cover-raster + boundary-PIP build
        # costs 5-9 s per fresh process; content-keyed via _geom_digest.
        cache = Path(os.environ.get("GEOTILE_CACHE", "/tmp/geotile_cache"))
        pkl = cache / f"route_index_{_geom_digest()}.pkl"
        idx = None
        if pkl.exists():
            try:
                with open(pkl, "rb") as f:
                    idx = pickle.load(f)
            except Exception:
                idx = None  # stale/corrupt cache: rebuild below
        if idx is None:
            idx = build_route_index(
                route_buffer_polygons(_fixture_ctx(), PipelineConfig(coordinate_precision=5))
            )
            cache.mkdir(parents=True, exist_ok=True)
            tmp = pkl.with_suffix(f".tmp-{os.getpid()}")
            with open(tmp, "wb") as f:
                pickle.dump(idx, f)
            tmp.rename(pkl)
        _MEMO["route_index"] = idx
    return _MEMO["route_index"]


def q_tile_assignments(sf_dir: str):
    """THE flagship: image tiles → route buffers spatial join."""
    from geotile.ops.join import spatial_join
    from geotile.ops.tiles import JOIN_COLUMNS, read_image_table

    idx = _fixture_route_index()
    ds = read_image_table(_image_dir_for(sf_dir), columns=JOIN_COLUMNS)
    return spatial_join(ds, idx).select_columns(["image_id", "route_id", "cell", "caption"])


def q_tile_knn(sf_dir: str):
    from geotile.ops.join import knn_routes, route_polylines
    from geotile.ops.tiles import JOIN_COLUMNS, read_image_table

    ctx = _fixture_ctx()
    ds = read_image_table(_image_dir_for(sf_dir), columns=JOIN_COLUMNS)
    return knn_routes(ds, route_polylines(ctx), k=2)


def q_tile_cell_counts(sf_dir: str):
    from geotile.ops.join import cell_tile_counts
    from geotile.ops.tiles import JOIN_COLUMNS, read_image_table

    return cell_tile_counts(read_image_table(_image_dir_for(sf_dir), columns=JOIN_COLUMNS))


def q_route_feature_collections(sf_dir: str):
    from geotile.ops.join import assemble_route_fcs, spatial_join
    from geotile.ops.tiles import JOIN_COLUMNS, read_image_table

    idx = _fixture_route_index()
    ds = read_image_table(_image_dir_for(sf_dir), columns=JOIN_COLUMNS)
    fcs = assemble_route_fcs(spatial_join(ds, idx))
    return fcs.select_columns(["route_id", "n_tiles"])


def _ring_stats(rings: list, unit: float) -> tuple[int, int]:
    """(area_octo, euler) of a traced ring set: signed shoelace (rings
    translated to their first vertex first — raw corridor-scale
    coordinates would lose the exact 1/8-cell lattice to cancellation)
    summed over outers (+) and holes (−), scaled to eighth-cells;
    euler = #outer rings − #hole rings. Both derive from the traced
    CONTOURS while the SQL side derives them from window CASES — a
    marching-squares bug cannot cancel out of both."""
    from geotile.geom.pip import signed_area

    total = 0.0
    n_pos = n_neg = 0
    for r in rings:
        a = np.asarray(r, dtype=np.float64)
        s = signed_area(a - a[0])
        total += s
        if s > 0:
            n_pos += 1
        elif s < 0:
            n_neg += 1
    return int(round(total / (unit / 8.0))), n_pos - n_neg


def q_tile_dissolve(sf_dir: str):
    """Distributed raster↔vector dissolve of all tile footprints,
    summarized by three independently-derived invariants the DuckDB
    oracle replays from the footprint geometry alone: covered-cell
    count, total polygon area in exact eighth-cell units (marching
    squares preserves Σ case-area exactly), and the Euler number
    (#polygons − #holes == (Q1 − Q3 + 2·Q_diag)/4 for the 4-connected
    saddle convention). Per-polygon ring detail stays golden-tested in
    tests/test_join.py."""
    from geotile.geom import cells as cellmod
    from geotile.ops.join import DEFAULT_JOIN_RES, dissolve_tile_footprints
    from geotile.ops.tiles import JOIN_COLUMNS, read_image_table

    ds = read_image_table(_image_dir_for(sf_dir), columns=JOIN_COLUMNS)
    covered, polys = dissolve_tile_footprints(ds)
    n_cells = covered.count()
    dlon, dlat = cellmod.cell_size_degrees(DEFAULT_JOIN_RES)
    rings = [o for o, _ in polys] + [h for _, hs in polys for h in hs]
    area_octo, euler = _ring_stats(rings, dlon * dlat)
    return pd.DataFrame(
        {"n_cells": [int(n_cells)], "area_octo": [area_octo], "euler": [euler]}
    )


def q_image_invariants(sf_dir: str):
    """Per-row payload invariants (decode + phash) on a sample."""
    from geotile.ops.tiles import ImageDecodeStage, read_image_table

    ds = read_image_table(_image_dir_for(sf_dir)).limit(1000)
    return ds.map_batches(
        ImageDecodeStage, fn_constructor_kwargs={"verify": True},
        batch_format="pyarrow", batch_size=256, concurrency=2,
    ).select_columns(["image_id", "phash_ok"])


def q_image_channel_histogram(sf_dir: str):
    """Multimodal feature-stats: global per-channel 16-bin intensity
    histogram over the first 1024 images (deterministic prefix — the
    table is image_id-ordered, same convention as image_invariants).
    The actor-pool stage pre-aggregates per batch (48 partial rows per
    batch leave the stage, never pixels), so the shuffle is constant-
    size regardless of corpus scale. Oracle: generator-replay sidecar —
    the expected histogram is rebuilt from synth.pixel_pattern (the
    ground-truth generator, independent of the PNG decode path) with a
    different counting kernel (np.unique vs bincount)."""
    from geotile.ops.tiles import ImageHistogramStage, read_image_table

    ds = read_image_table(_image_dir_for(sf_dir)).limit(1024)
    part = ds.map_batches(
        ImageHistogramStage, batch_format="pyarrow", batch_size=256,
        concurrency=2,
    )
    return _rename(
        part.groupby(["channel", "bin"]).sum("cnt"), ["channel", "bin", "cnt"]
    )


def q_gtfs_envelope(sf_dir: str):
    """A1 envelope over the fixture's route lines. The feature's bbox
    member is UNROUNDED (reference envelope.ts keeps it raw), so the
    four values are bit-identical to SQL min/max over the shapes
    parquet (the fixture's line features are all shapes-path)."""
    from geotile.config import PipelineConfig
    from geotile.formats import fmt_envelope

    f = fmt_envelope(_fixture_ctx(), PipelineConfig(coordinate_precision=5), {})
    w, s, e, n = f["bbox"]
    return pd.DataFrame({"west": [w], "south": [s], "east": [e], "north": [n]})


def q_gtfs_convex_hull(sf_dir: str):
    """A2 convex hull ring over the fixture stop points, UNSIMPLIFIED
    (RDP/rounding are separately golden-tested; raw hull vertices are
    gathered input doubles, so the SQL replay — strict-vertex test +
    polar ordering — matches bit-exactly)."""
    from geotile.ops.derive import convex_feature
    from geotile.ops.stops import stop_points

    ctx = _fixture_ctx()
    f = convex_feature(stop_points(ctx, {}), ctx.agency_name)
    ring = f["geometry"]["coordinates"][0]
    return pd.DataFrame(
        {"idx": range(len(ring)), "lon": [p[0] for p in ring], "lat": [p[1] for p in ring]}
    )


def _shoelace(ring) -> float:
    a = np.asarray(ring, dtype=np.float64)
    return 0.5 * abs(float(np.sum(a[:-1, 0] * a[1:, 1] - a[1:, 0] * a[:-1, 1])))


def _route_line_parts(ctx) -> dict[str, list[np.ndarray]]:
    """route_id → raw centerline parts from the fixture's line features
    (the exact arrays fmt_lines_buffer buffers)."""
    from geotile.ops.lines import route_lines

    out: dict[str, list[np.ndarray]] = {}
    for f in route_lines(ctx, {}) or []:
        g = f["geometry"]
        parts = [g["coordinates"]] if g["type"] == "LineString" else g["coordinates"]
        out[f["properties"]["route_id"]] = [np.asarray(p, np.float64) for p in parts]
    return out


def q_gtfs_buffer_stats(sf_dir: str):
    """G1 line buffers with a full raster replay oracle: per route, the
    distance-mask pixel count, exact eighth-cell polygon area, and
    Euler number — the DuckDB side re-derives the SAME filled pixel set
    from the centerline segments (clamped point-to-segment distance ≤ r
    in identical IEEE order) and the area/Euler from window cases, so a
    bug anywhere in distance_mask / trace_mask flips a value."""
    from geotile.config import PipelineConfig
    from geotile.geom.buffer import buffer_raster
    from geotile.geom.raster import trace_mask

    ctx = _fixture_ctx()
    cfg = PipelineConfig()
    parts_by_route = _route_line_parts(ctx)
    rows = []
    for rid in sorted(parts_by_route):
        lines = parts_by_route[rid]
        mask, grid, _m, _lon0, _lat0, _mx, _my = buffer_raster(
            lines, cfg.buffer_size_meters, cfg.raster_cells_per_radius
        )
        area_octo, euler = _ring_stats(trace_mask(mask, grid), grid.step * grid.step)
        rows.append(
            {"route_id": rid, "n_pixels": int(mask.sum()),
             "area_octo": area_octo, "euler": euler}
        )
    return pd.DataFrame(rows)


def _dissolved_input_feats(ctx, cfg):
    """The simplified buffered stop discs fmt_stops_dissolved feeds into
    the raster union (buffer → simplify, reference order preserved)."""
    from geotile.formats import _simplify
    from geotile.ops.derive import buffer_feature
    from geotile.ops.stops import stop_features

    buffered = [
        buffer_feature(f, cfg.buffer_size_meters, cfg.raster_cells_per_radius)
        for f in stop_features(ctx, {})
    ]
    return _simplify({"type": "FeatureCollection", "features": buffered}, cfg)["features"]


def q_gtfs_dissolved_stats(sf_dir: str):
    """G3 raster-union dissolve with a full scanline replay oracle: the
    DuckDB side re-fills the SAME pixel grid from the disc-edge sidecar
    (even-odd parity, identical IEEE crossing arithmetic) and re-derives
    area/Euler from window cases; the engine derives them from the
    traced contours."""
    from geotile.config import PipelineConfig
    from geotile.geom.raster import trace_mask
    from geotile.ops.derive import dissolve_raster

    ctx = _fixture_ctx()
    cfg = PipelineConfig(coordinate_precision=5)
    feats = _dissolved_input_feats(ctx, cfg)
    cell_m = cfg.buffer_size_meters / cfg.raster_cells_per_radius
    mask, grid, _metric, _lon0, _lat0, _mx, _my = dissolve_raster(feats, cell_m)
    area_octo, euler = _ring_stats(trace_mask(mask, grid), grid.step * grid.step)
    return pd.DataFrame(
        {"n_pixels": [int(mask.sum())], "area_octo": [area_octo], "euler": [euler]}
    )


def q_doc_quality(sf_dir: str):
    from geotile.ops.text import doc_stats

    out = doc_stats(_read(sf_dir, "documents", ["doc_id", "text"]))
    return out.map_batches(
        lambda t: pa.table(
            {"doc_id": t["doc_id"], "quality_e6": _e(t["quality"], 1_000_000)}
        ),
        batch_format="pyarrow",
    )


def q_image_resize(sf_dir: str):
    """Actor-pool resize stage invariants: output dims are 8×8 raw, and
    the area-mean of the resized pixels equals the area-mean of the
    decoded original within quantization (±1 grey level per channel) —
    the engine computes the flag, the oracle states TRUE per row."""
    from geotile.ops.tiles import ImageDecodeStage, ImageResizeStage, read_image_table

    ds = read_image_table(_image_dir_for(sf_dir)).limit(256)
    resized = ds.map_batches(
        ImageResizeStage, fn_constructor_kwargs={"out_w": 8, "out_h": 8},
        batch_format="pyarrow", batch_size=128, concurrency=2,
    )

    def check(t: pa.Table) -> pa.Table:
        dec = ImageDecodeStage(verify=False).decoders
        ok = []
        from geotile.synth import image_index, image_size, pixel_pattern

        idx = image_index(t["image_id"])
        for i, (b, w, h) in enumerate(
            zip(t["bytes"].to_pylist(), t["w"].to_pylist(), t["h"].to_pylist())
        ):
            small = dec["raw"](b, w, h).astype(np.float64)
            ow, oh = image_size(np.array([idx[i]]))
            orig = pixel_pattern(np.array([idx[i]], np.uint64), int(ow[0]), int(oh[0]))[0]
            # resize crops to a multiple of the output dims, so compare
            # against the same cropped window's mean
            fy, fx = int(oh[0]) // 8, int(ow[0]) // 8
            win = orig[: fy * 8, : fx * 8].astype(np.float64)
            ok.append(bool(np.all(np.abs(small.mean((0, 1)) - win.mean((0, 1))) <= 1.0)))
        return pa.table(
            {
                "image_id": t["image_id"],
                "w": t["w"].cast(pa.int64()),
                "h": t["h"].cast(pa.int64()),
                "mean_ok": pa.array(ok),
            }
        )

    return resized.map_batches(check, batch_format="pyarrow", batch_size=128)


def q_image_embeddings(sf_dir: str):
    from geotile.ops.tiles import ImageEmbedStage, read_image_table

    ds = read_image_table(_image_dir_for(sf_dir)).limit(512)
    out = ds.map_batches(
        ImageEmbedStage, fn_constructor_kwargs={"dim": 64},
        batch_format="pyarrow", batch_size=128, concurrency=2,
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "image_id": t["image_id"],
                "dim": pa.array(
                    np.asarray([len(v) for v in t["embedding"].to_pylist()], dtype=np.int64)
                ),
            }
        ),
        batch_format="pyarrow",
    )


def q_embedding_buckets(sf_dir: str):
    from geotile.ops.ann import hyperplane_buckets

    ds = hyperplane_buckets(_read(sf_dir, "embeddings", ["vec_id", "embedding"]), n_planes=8)
    out = ds.groupby("bucket").count()
    return out.map_batches(lambda t: t.rename_columns(["bucket", "n"]), batch_format="pyarrow")


def q_gtfs_stop_features(sf_dir: str):
    """GTFS stop→route assignment summarized (parity gate is the golden
    pytest suite; this exposes it to the driver as rows)."""
    from geotile.ops.stops import stop_features

    feats = stop_features(_fixture_ctx(), {})
    return pd.DataFrame(
        {
            "stop_id": [f["properties"]["stop_id"] for f in feats],
            "n_routes": [
                len(f["properties"]["routes"]) if isinstance(f["properties"]["routes"], list) else 0
                for f in feats
            ],
        }
    )


def q_gtfs_line_features(sf_dir: str):
    """O1-O3 line assembly with an ORDERED-coordinate replay: per route
    emit part/point counts plus a position-weighted coordinate checksum
    Σ (i+1)·(lon_i + lat_i) over the flattened coordinates in emitted
    order (parts by shape_id, points by shape_pt_sequence) — any
    reordering, drop, or duplication shifts the checksum."""
    from geotile.ops.lines import route_lines

    feats = route_lines(_fixture_ctx(), {}) or []
    rows = []
    for f in feats:
        parts = f["geometry"]["coordinates"]
        flat = np.asarray([p for part in parts for p in part], dtype=np.float64)
        s = float(np.sum((np.arange(len(flat)) + 1.0) * (flat[:, 0] + flat[:, 1])))
        rows.append(
            {
                "route_id": f["properties"]["route_id"],
                "n_parts": len(parts),
                "n_points": len(flat),
                "checksum_e2": int(round(s * 100.0)),
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# registry + oracle SQL
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# as-of join / exact similarity join / exact quantiles (round 3)
# ---------------------------------------------------------------------------

def q_asof_clicks_views(sf_dir: str):
    """Backward as-of join: every click event picks the LATEST strictly
    earlier view event of the same user (hash-co-partitioned
    merge_asof — relational.asof_join); clicks with no prior view are
    dropped so the output is null-free for the driver hash."""
    from geotile.ops.relational import asof_join

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def split(kind):
        def fn(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["event_type"], kind)).drop_columns(
                ["event_type"]
            )

        return fn

    clicks = ev.map_batches(split("click"), batch_format="pyarrow")
    views = ev.map_batches(split("view"), batch_format="pyarrow")
    j = asof_join(clicks, views, key="user_id", ts="ts")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_id_r"].notna()]
        lts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        rts = df["ts_r"].to_numpy().astype("datetime64[us]").astype(np.int64)
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy().astype(np.int64),
                "prior_view_id": df["event_id_r"].to_numpy().astype(np.int64),
                "gap_us": lts - rts,
            }
        )

    return j.map_batches(finish, batch_format="pandas")


def q_jaccard_pairs_docs(sf_dir: str):
    """EXACT word-4-gram Jaccard set-similarity join at tau = 1/2
    (prefix-filtered PPJoin — dedup.ngram_jaccard_pairs); integer
    inter/union counts so the SQL replay is bit-deterministic."""
    from geotile.ops.dedup import ngram_jaccard_pairs

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return ngram_jaccard_pairs(docs, k=4, tau_num=1, tau_den=2)


def q_top_terms_docs(sf_dir: str):
    """Global top-20 terms by corpus frequency (inverted-index-style):
    per-batch Arrow value_counts combiner (one (token, n) row per
    distinct token per batch) → groupby(token).sum — the only shuffle,
    moving vocabulary-scale partials — → partial top-k per block →
    one tiny final reduce. Tokenization = split on single spaces with
    empties dropped, mirroring SQL string_split exactly (NOT
    utf8_split_whitespace, which merges runs)."""
    ds = _read(sf_dir, "documents", ["text"])
    k = 20

    def partial(t: pa.Table) -> pa.Table:
        flat = pc.list_flatten(pc.split_pattern(t["text"], " "))
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = flat.value_counts()
        return pa.table(
            {"token": vc.field("values"), "n": vc.field("counts").cast(pa.int64())}
        )

    def top_of(t: pa.Table) -> pa.Table:
        tok = t["token"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        order = np.lexsort((tok, -n))[:k]  # (n desc, token asc) — tie-stable
        return pa.table({"token": pa.array(tok[order]), "n": pa.array(n[order])})

    summed = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .sum("n")
        .map_batches(
            lambda t: t.rename_columns(["token", "n"]), batch_format="pyarrow"
        )
    )
    cands = summed.map_batches(top_of, batch_format="pyarrow")
    return cands.repartition(1).map_batches(top_of, batch_format="pyarrow")


def q_followup_events(sf_dir: str):
    """Keyed band RANGE join (relational.band_join): every (click,
    same-user event) pair with 0 < Δts <= 1 h, aggregated per click to
    (n_follow, min_gap_us); 1-hour band. Completes the custom-operator trio the
    engine adds over Ray Data's joins: as-of (1-to-1 latest), windowed
    aggregate, band range join (1-to-many)."""
    from geotile.ops.relational import band_join

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    clicks = ev.map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], "click")).drop_columns(
            ["event_type"]
        ),
        batch_format="pyarrow",
    )
    pairs = band_join(clicks, ev, key="user_id", ts="ts", max_delta_us=3_600_000_000)

    def gap(df: pd.DataFrame) -> pd.DataFrame:
        lt = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        rt = df["ts_r"].to_numpy().astype("datetime64[us]").astype(np.int64)
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(np.float64).astype(np.int64),
                "gap_us": rt - lt,
            }
        )

    from ray.data.aggregate import Count, Min

    agg = (
        pairs.map_batches(gap, batch_format="pandas")
        .groupby("event_id")
        .aggregate(Count(), Min("gap_us"))
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"].cast(pa.int64()),
                "n_follow": t["count()"].cast(pa.int64()),
                "min_gap_us": t["min(gap_us)"].cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def q_tfidf_docs(sf_dir: str):
    """Top-5 TF-IDF terms per document (text.tfidf_top_terms): the
    vocabulary-scale DF groupby is the only shuffle; the repeated
    (df >= 2) vocabulary broadcasts Heaps'-law small and the scoring /
    per-doc top-k pass is batch-local. IDF is the log-free rational
    variant (1e6 * N) // df so scores are exact int64 on both engines."""
    from geotile.ops.text import tfidf_top_terms

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return tfidf_top_terms(docs, k=5)


def q_dup_span_docs(sf_dir: str):
    """Per-doc duplicated 8-gram span counts (dedup.dup_ngram_spans) —
    the exact-substring-dedup signal (Lee et al.): distinct-gram
    postings → gram-bucket co-partition (df + per-doc partials in one
    vectorized pass) → doc-scale sum."""
    from geotile.ops.dedup import dup_ngram_spans

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return dup_ngram_spans(docs, k=8)


def q_rolling_window_user(sf_dir: str):
    """ROWS-frame window functions (relational.grouped_rolling): 3-row
    rolling sum of value + lag(event_id) per user ordered by (ts,
    event_id). Values quantized to an e4 integer lattice BEFORE the
    rolling sum so prefix-sum association is exact (float rolling sums
    are association-sensitive)."""
    from geotile.ops.relational import grouped_rolling

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def quant(t: pa.Table) -> pa.Table:
        v = pc.floor(pc.add(pc.multiply(t["value"], pa.scalar(10000.0)),
                            pa.scalar(0.5))).cast(pa.int64())
        return t.drop_columns(["value"]).append_column("v_e4", v)

    rolled = grouped_rolling(
        ev.map_batches(quant, batch_format="pyarrow", zero_copy_batch=True),
        key="user_id",
        order_cols=["ts", "event_id"],
        val="v_e4",
        frame=3,
        lag_col="event_id",
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"].cast(pa.int64()),
                "roll_sum_e4": t["roll_sum"].cast(pa.int64()),
                "roll_n": t["roll_n"].cast(pa.int64()),
                "prev_event_id": t["prev_event_id"].cast(pa.int64()),
            }
        )

    return rolled.map_batches(finish, batch_format="pyarrow")


def q_full_outer_customer_orders(sf_dir: str):
    """FULL OUTER co-partitioned join (relational.bucketed_join
    how='outer'): per-custkey open-order counts vs finished-order
    counts — custkeys with only one status survive from either side
    (nulls coalesced to 0 for the hash gate)."""
    from geotile.ops.relational import bucketed_join

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderstatus"])

    def side(status: str, key: str):
        def fn(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t["o_orderstatus"], status))
            g = t.group_by("o_custkey").aggregate([([], "count_all")])
            return pa.table(
                {key: g["o_custkey"].cast(pa.int64()),
                 f"n_{key}": g["count_all"].cast(pa.int64())}
            )

        return fn

    # per-batch combiner then a custkey-scale sum — the co-partition
    # join's two inputs are already aggregate-sized
    # custkey-scale aggregates, materialized so the join's schema probe
    # doesn't execute each plan a second time (bucketed_join contract)
    o = (
        orders.map_batches(side("O", "ck_o"), batch_format="pyarrow")
        .groupby("ck_o").sum("n_ck_o")
        .map_batches(lambda t: t.rename_columns(["ck_o", "n_open"]),
                     batch_format="pyarrow")
        .materialize()
    )
    f = (
        orders.map_batches(side("F", "ck_f"), batch_format="pyarrow")
        .groupby("ck_f").sum("n_ck_f")
        .map_batches(lambda t: t.rename_columns(["ck_f", "n_fin"]),
                     batch_format="pyarrow")
        .materialize()
    )
    joined = bucketed_join(o, f, "ck_o", "ck_f", how="outer")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        ck = df["ck_o"].where(df["ck_o"].notna(), df["ck_f"])
        return pd.DataFrame(
            {
                "custkey": ck.to_numpy(np.float64).astype(np.int64),
                "n_open": df["n_open"].fillna(0).to_numpy(np.float64).astype(np.int64),
                "n_fin": df["n_fin"].fillna(0).to_numpy(np.float64).astype(np.int64),
            }
        )

    return joined.map_batches(finish, batch_format="pandas")


def q_rollup_docs(sf_dir: str):
    """Multi-level GROUP BY ROLLUP(lang, source) in one streaming pass
    (relational.rollup_aggregate): the per-batch combiner derives every
    rollup level from the detail PARTIALS, so rows are read once and
    the single shuffle moves (levels x groups) partial rows."""
    from geotile.ops.relational import rollup_aggregate

    docs = _read(sf_dir, "documents", ["lang", "source", "n_chars"])
    return rollup_aggregate(docs, keys=["lang", "source"], sum_col="n_chars")


def q_pivot_docs(sf_dir: str):
    """PIVOT: per-source language distribution as wide columns (one
    conditional-count column per language). One pass: the per-batch
    combiner emits (source, lang) counts, a group-cardinality groupby
    sums, and the widening happens on the aggregate — never on rows."""
    langs = ["de", "en", "es", "fr", "zh"]
    ds = _read(sf_dir, "documents", ["source", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["source", "lang"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "source": g["source"],
                "lang": g["lang"],
                "n": g["count_all"].cast(pa.int64()),
            }
        )

    summed = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["source", "lang"])
        .sum("n")
    )

    def widen(df: pd.DataFrame) -> pd.DataFrame:
        # one group = one source (groupby key), rows = its langs
        src = df["source"].iloc[0]
        cnt = dict(zip(df["lang"], df["sum(n)"]))
        return pd.DataFrame(
            {
                "source": [src],
                **{f"n_{l}": [int(cnt.get(l, 0))] for l in langs},
            }
        )

    return summed.groupby("source").map_groups(widen, batch_format="pandas")


def q_grouped_topk_users(sf_dir: str):
    """Grouped top-k (top-3 users by total value per event_type):
    two-level aggregate — per-batch (type, user) partial sums, one
    pair-cardinality groupby, per-block partial top-3, tiny final
    per-group selection. No global sort; value on the e4 integer
    lattice so sums replay bit-exactly."""
    ds = _read(sf_dir, "events", ["event_type", "user_id", "value"])
    K = 3

    def partial(t: pa.Table) -> pa.Table:
        v = pc.floor(pc.add(pc.multiply(t["value"], pa.scalar(10000.0)),
                            pa.scalar(0.5))).cast(pa.int64())
        t = pa.table(
            {"event_type": t["event_type"], "user_id": t["user_id"], "v": v}
        )
        g = t.group_by(["event_type", "user_id"]).aggregate([("v", "sum")])
        return pa.table(
            {
                "event_type": g["event_type"],
                "user_id": g["user_id"],
                "sum_v_e4": g["v_sum"],
            }
        )

    summed = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "user_id"])
        .sum("sum_v_e4")
        .map_batches(
            lambda t: t.rename_columns(["event_type", "user_id", "sum_v_e4"]),
            batch_format="pyarrow",
        )
    )

    def topk(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sv = t["sum_v_e4"].to_numpy(zero_copy_only=False).astype(np.int64)
        codes, inv = np.unique(et, return_inverse=True)
        order = np.lexsort((uid, -sv, inv))
        inv_s = inv[order]
        starts = np.flatnonzero(np.r_[True, inv_s[1:] != inv_s[:-1]])
        run_id = np.cumsum(np.r_[True, inv_s[1:] != inv_s[:-1]]) - 1
        keep = order[(np.arange(len(inv_s)) - starts[run_id]) < K]
        keep = np.sort(keep)
        return pa.table(
            {
                "event_type": pa.array(et[keep]),
                "user_id": pa.array(uid[keep]),
                "sum_v_e4": pa.array(sv[keep]),
            }
        )

    # per-block partial top-3 (combiner), then one tiny final selection
    cands = summed.map_batches(topk, batch_format="pyarrow")
    return cands.repartition(1).map_batches(topk, batch_format="pyarrow")


def q_corr_moments_docs(sf_dir: str):
    """Algebraic aggregate family beyond sum/count: per-language
    correlation MOMENT SUMS of (n_tokens, n_chars) — n, Σx, Σy, Σxy,
    Σx², Σy² — everything any covariance/correlation/regression needs,
    kept on the integer lattice so partial sums merge associatively
    and the SQL replay is exact (the float corr itself is a trivial
    driver-side epilogue at these magnitudes)."""
    ds = _read(sf_dir, "documents", ["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        x = pc.list_value_length(pc.split_pattern(t["text"], " ")).cast(pa.int64())
        y = pc.utf8_length(t["text"]).cast(pa.int64())
        tt = pa.table(
            {
                "lang": t["lang"],
                "x": x,
                "y": y,
                "xy": pc.multiply(x, y),
                "x2": pc.multiply(x, x),
                "y2": pc.multiply(y, y),
            }
        )
        g = tt.group_by("lang").aggregate(
            [([], "count_all"), ("x", "sum"), ("y", "sum"),
             ("xy", "sum"), ("x2", "sum"), ("y2", "sum")]
        )
        return pa.table(
            {
                "lang": g["lang"],
                "n": g["count_all"].cast(pa.int64()),
                "sum_x": g["x_sum"],
                "sum_y": g["y_sum"],
                "sum_xy": g["xy_sum"],
                "sum_x2": g["x2_sum"],
                "sum_y2": g["y2_sum"],
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang")
        .sum(["n", "sum_x", "sum_y", "sum_xy", "sum_x2", "sum_y2"])
    )
    return _rename(out, ["lang", "n", "sum_x", "sum_y", "sum_xy", "sum_x2", "sum_y2"])


def q_ntile_events(sf_dir: str):
    """ntile(4) rank bucketing per user (relational.grouped_ntile) —
    completes the window-function family (tumbling/sliding time
    windows, ROWS-frame rolling, lag, row_number-style top-k, ntile)."""
    from geotile.ops.relational import grouped_ntile

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    out = grouped_ntile(ev, key="user_id", order_cols=["ts", "event_id"], n_tiles=4)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"].cast(pa.int64()),
                "tile": t["tile"].cast(pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def _user_type_flags(sf_dir: str, min_value: float | None = None):
    """Distinct-user flag table for the set-op queries: one row per
    user who clicked or purchased (optionally only counting events with
    value > ``min_value``), with per-batch distinct combiner → one
    user-scale groupby(max) — set ops on flag aggregates, the shuffle
    never moves event rows."""
    cols = ["user_id", "event_type"] + (["value"] if min_value is not None else [])
    ds = _read(sf_dir, "events", cols)

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["event_type"], pa.array(["click", "purchase"]))
        if min_value is not None:
            keep = pc.and_(keep, pc.greater(t["value"], pa.scalar(float(min_value))))
        t = t.filter(keep)
        tt = pa.table(
            {
                "user_id": t["user_id"],
                "c": pc.equal(t["event_type"], "click").cast(pa.int64()),
                "p": pc.equal(t["event_type"], "purchase").cast(pa.int64()),
            }
        )
        g = tt.group_by("user_id").aggregate([("c", "max"), ("p", "max")])
        return pa.table(
            {"user_id": g["user_id"], "c": g["c_max"], "p": g["p_max"]}
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .max(["c", "p"])
        .map_batches(
            lambda t: t.rename_columns(["user_id", "c", "p"]),
            batch_format="pyarrow",
        )
    )


def q_intersect_users(sf_dir: str):
    """Set INTERSECT: users with >=1 click AND >=1 purchase (distinct
    flag aggregate, no row-stream self-join)."""
    flags = _user_type_flags(sf_dir)
    return flags.map_batches(
        lambda t: pa.table(
            {
                "user_id": t.filter(
                    pc.and_(pc.equal(t["c"], 1), pc.equal(t["p"], 1))
                )["user_id"].cast(pa.int64())
            }
        ),
        batch_format="pyarrow",
    )


def q_except_users(sf_dir: str):
    """Set EXCEPT: users with a high-value (>200) click but no
    high-value purchase. (The unthresholded sets are identical in this
    dense synth — every user does every event type — so the EXCEPT is
    exercised on sparse subsets where it has a non-empty answer.)"""
    flags = _user_type_flags(sf_dir, min_value=200.0)
    return flags.map_batches(
        lambda t: pa.table(
            {
                "user_id": t.filter(
                    pc.and_(pc.equal(t["c"], 1), pc.equal(t["p"], 0))
                )["user_id"].cast(pa.int64())
            }
        ),
        batch_format="pyarrow",
    )


def q_right_join_orders_customer(sf_dir: str):
    """RIGHT OUTER co-partitioned join: per-custkey order counts RIGHT
    JOIN customer — every customer survives, order-less ones at 0.
    (Dimension-side broadcast would also work at this cardinality; the
    query exists to drive bucketed_join's right-outer path, the
    both-sides-large form.)"""
    from geotile.ops.relational import bucketed_join

    orders = _read(sf_dir, "orders", ["o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey"])

    def cnt(t: pa.Table) -> pa.Table:
        g = t.group_by("o_custkey").aggregate([([], "count_all")])
        return pa.table(
            {"ok": g["o_custkey"].cast(pa.int64()),
             "n": g["count_all"].cast(pa.int64())}
        )

    agg = (
        orders.map_batches(cnt, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("ok").sum("n")
        .map_batches(lambda t: t.rename_columns(["ok", "n"]), batch_format="pyarrow")
        .materialize()  # custkey-scale; join's schema probe would
        # otherwise execute the aggregate a second time
    )
    joined = bucketed_join(agg, cust, "ok", "c_custkey", how="right")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "custkey": df["c_custkey"].to_numpy(np.float64).astype(np.int64),
                "n_orders": df["n"].fillna(0).to_numpy(np.float64).astype(np.int64),
            }
        )

    return joined.map_batches(finish, batch_format="pandas")


def q_funnel_users(sf_dir: str):
    """Ordered event-sequence (funnel) matching: users who did
    view → click → purchase in strict time order, with each stage's
    earliest qualifying timestamp. ONE shuffle (hash co-partition by
    user), then every user of a bucket is resolved in a single
    vectorized pass — per-stage min-reduce via np.minimum.at, next
    stage filtered by the previous stage's per-user time. No per-user
    Python, no window sort."""
    from geotile.ops.relational import _with_bucket

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    STAGES = ("view", "click", "purchase")

    def funnel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["bucket"])
        out_cols = ["user_id", "t_view_us", "t_click_us", "t_purchase_us"]
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series(dtype=np.int64) for c in out_cols})
        u = df["user_id"].to_numpy(np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        et = df["event_type"].to_numpy()
        users = np.unique(u)
        uidx = np.searchsorted(users, u)
        prev = np.full(len(users), -(1 << 62), dtype=np.int64)  # stage-0 gate
        stage_ts = []
        alive = np.ones(len(users), dtype=bool)
        for stage in STAGES:
            cur = np.full(len(users), np.iinfo(np.int64).max, dtype=np.int64)
            m = (et == stage) & (ts > prev[uidx])
            np.minimum.at(cur, uidx[m], ts[m])
            alive &= cur != np.iinfo(np.int64).max
            stage_ts.append(cur)
            prev = cur
        return pd.DataFrame(
            {
                "user_id": users[alive],
                "t_view_us": stage_ts[0][alive],
                "t_click_us": stage_ts[1][alive],
                "t_purchase_us": stage_ts[2][alive],
            }
        )

    return (
        _with_bucket(ev, "user_id", 32)
        .groupby("bucket")
        .map_groups(funnel, batch_format="pandas")
    )


def q_quantiles_cont_events(sf_dir: str):
    """percentile_cont-style interpolated quantiles (quantile.
    quantiles_cont): bracketing order statistics + exact rational
    fraction (the float interpolation itself is a scalar epilogue, kept
    out of the compared columns so both engines stay bit-exact)."""
    from geotile.ops.quantile import quantiles_cont

    ev = _read(sf_dir, "events", ["value"])
    return quantiles_cont(ev, "value", q_pcts=(50, 90), max_pull=2000)


def q_phash_neighbor_stats(sf_dir: str):
    """Multimodal near-dup on the IMAGE side: perceptual-hash Hamming
    join at distance <= 1 (dedup.hamming_pairs, exact 2-band pigeonhole
    — cap=None so a SQL band-join replay matches row for row), reduced
    to the near-dup DEGREE HISTOGRAM (n_neighbors -> n_images). The
    bytes column never leaves storage — the read prunes to
    (image_id, phash)."""
    from geotile.ops.dedup import hamming_pairs
    from geotile.ops.tiles import read_image_table
    from geotile.synth import image_index

    ds = read_image_table(_image_dir_for(sf_dir), columns=["image_id", "phash"])

    def to_int_id(t: pa.Table) -> pa.Table:
        return pa.table(
            {"img": pa.array(image_index(t["image_id"]).astype(np.int64)),
             "phash": t["phash"]}
        )

    ids = ds.map_batches(to_int_id, batch_format="pyarrow", zero_copy_batch=True)
    pairs = hamming_pairs(ids, "img", "phash", max_hamming=1, cap=None)

    def degrees(t: pa.Table) -> pa.Table:
        both = np.concatenate(
            [t["a"].to_numpy(zero_copy_only=False),
             t["b"].to_numpy(zero_copy_only=False)]
        ).astype(np.int64)
        u, c = np.unique(both, return_counts=True)
        return pa.table({"img": pa.array(u), "d": pa.array(c.astype(np.int64))})

    deg = (
        pairs.map_batches(degrees, batch_format="pyarrow")
        .groupby("img").sum("d")
    )

    def hist_partial(t: pa.Table) -> pa.Table:
        d = t["sum(d)"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, c = np.unique(d, return_counts=True)
        return pa.table(
            {"n_neighbors": pa.array(u), "n_images": pa.array(c.astype(np.int64))}
        )

    out = (
        deg.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("n_neighbors").sum("n_images")
    )
    return _rename(out, ["n_neighbors", "n_images"])


def q_grouped_quantiles_events(sf_dir: str):
    """Exact per-group p50/p95 of events.value by event_type — the
    grouped variant of the histogram-refinement selection (ops/
    quantile.grouped_quantiles): one streaming pass per round covers
    every group, no per-group sort, no all-to-all."""
    from geotile.ops.quantile import grouped_quantiles

    ev = _read(sf_dir, "events", ["event_type", "value"])
    return grouped_quantiles(
        ev, "value", "event_type", q_pcts=(50, 95), max_pull=2000
    )


def q_stratified_sample_events(sf_dir: str):
    """Deterministic stratified sample: the 100 events with the
    smallest Knuth hash per event_type (reproducible, shard-stable —
    the per-batch partial top-k is the combiner, the per-group final
    top-k is the only shuffle and moves ≤ 100×batches rows)."""
    ds = _read(sf_dir, "events", ["event_id", "event_type", "user_id"])
    N = 100

    def partial(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = ids * 2654435761 % 4294967296
        et = t["event_type"].to_numpy(zero_copy_only=False)
        codes, inv = np.unique(et, return_inverse=True)
        order = np.lexsort((ids, h, inv))
        inv_s = inv[order]
        # first N rows of each group run
        starts = np.flatnonzero(np.r_[True, inv_s[1:] != inv_s[:-1]])
        run_id = np.cumsum(np.r_[True, inv_s[1:] != inv_s[:-1]]) - 1
        offset = np.arange(len(inv_s)) - starts[run_id]
        keep = order[offset < N]
        return t.take(pa.array(np.sort(keep)))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["event_id"].to_numpy().astype(np.int64)
        h = ids * 2654435761 % 4294967296
        order = np.lexsort((ids, h))[:N]
        return df.iloc[np.sort(order)][["event_id", "event_type", "user_id"]]

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .map_groups(final, batch_format="pandas")
    )


def q_dup_clusters_embeddings(sf_dir: str):
    """Near-dup pair generation → duplicate CLUSTERS: the embedding
    cosine pairs (tau = 0.35, the oracle-checked exact block-pair join)
    fed through distributed connected components (graph.
    connected_components, hash-to-min + pointer jumping). Output
    (node, cluster_id = min vec_id in component) — the canonical-
    representative election every dedup pipeline ends with."""
    from geotile.ops.dedup import embedding_dup_pairs
    from geotile.ops.graph import connected_components

    pairs = embedding_dup_pairs(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]), tau=0.35
    )
    # n_buckets sizes the co-partition to the EDGE volume (pair graphs
    # here are dimension-scale); raise it proportionally for corpus-
    # scale edge lists
    return connected_components(
        pairs.select_columns(["a", "b"]), "a", "b", n_buckets=8
    )


def q_quantiles_events(sf_dir: str):
    """Exact p25/p50/p75/p95/p99 of events.value via iterative histogram
    refinement (ops/quantile.exact_quantiles) — no global sort; the
    selected elements are bit-identical to a rank-based SQL replay."""
    from geotile.ops.quantile import exact_quantiles

    ev = _read(sf_dir, "events", ["value"])
    return exact_quantiles(ev, "value", max_pull=2000)


_WEEK_US = 604_800_000_000  # 7 * 86400 * 1e6


def q_cohort_retention_users(sf_dir: str):
    """Cohort retention matrix: users bucketed by first-seen week
    (cohort), counted once per (cohort, active-week offset). ONE hash
    co-partition by user; inside a bucket everything is vectorized —
    per-user first week via np.minimum.at, distinct (user, week) via
    one np.unique over packed keys — then a tiny (cohorts x offsets)
    groupby sums the per-bucket partials. The classic two-pass
    first-touch + self-join collapses to a single shuffle because each
    user's rows are co-located."""
    from geotile.ops.relational import _with_bucket

    ev = _read(sf_dir, "events", ["user_id", "ts"])
    out_cols = ["cohort_week", "week_offset", "n_users"]

    def retain(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["bucket"])
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series(dtype=np.int64) for c in out_cols})
        u = df["user_id"].to_numpy(np.int64)
        w = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64) // _WEEK_US
        users, uidx = np.unique(u, return_inverse=True)
        first = np.full(len(users), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(first, uidx, w)
        offs = w - first[uidx]  # >= 0 by construction
        uw = np.unique(uidx * 1_000_000 + offs)  # distinct (user, offset)
        cw = first[uw // 1_000_000]
        pk, cnt = np.unique(cw * 1_000_000 + uw % 1_000_000, return_counts=True)
        return pd.DataFrame(
            {
                "cohort_week": pk // 1_000_000,
                "week_offset": pk % 1_000_000,
                "n_users": cnt.astype(np.int64),
            }
        )

    partials = (
        _with_bucket(ev, "user_id", 32)
        .groupby("bucket")
        .map_groups(retain, batch_format="pandas")
    )
    return _rename(
        partials.groupby(["cohort_week", "week_offset"]).sum("n_users"),
        out_cols,
    )


def q_transition_counts_events(sf_dir: str):
    """Event-sequence transition (Markov bigram) counts: consecutive
    event_type pairs per user under the total order (ts, event_id).
    ONE co-partition by user; per bucket a single lexsort + shifted
    compare builds every adjacent pair, np.unique over packed type
    codes counts them — no window function, no per-user Python. Final
    groupby is type-pair cardinality (~tens of rows)."""
    from geotile.ops.relational import _with_bucket

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    out_cols = ["prev_type", "next_type", "n"]

    def trans(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["bucket"])
        if len(df) < 2:
            return pd.DataFrame(
                {"prev_type": pd.Series(dtype=str),
                 "next_type": pd.Series(dtype=str),
                 "n": pd.Series(dtype=np.int64)}
            )
        u = df["user_id"].to_numpy(np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        types, code = np.unique(df["event_type"].to_numpy(), return_inverse=True)
        order = np.lexsort((eid, ts, u))
        u, code = u[order], code[order]
        same = u[1:] == u[:-1]
        k = len(types)
        pair, cnt = np.unique(
            code[:-1][same] * k + code[1:][same], return_counts=True
        )
        return pd.DataFrame(
            {
                "prev_type": types[pair // k],
                "next_type": types[pair % k],
                "n": cnt.astype(np.int64),
            }
        )

    partials = (
        _with_bucket(ev, "user_id", 32)
        .groupby("bucket")
        .map_groups(trans, batch_format="pandas")
    )
    return _rename(partials.groupby(["prev_type", "next_type"]).sum("n"), out_cols)


def q_mode_event_type_user(sf_dir: str):
    """MODE per group (most frequent event_type per user, ties broken
    lexicographically) — SQL's row_number-over-count-desc idiom as a
    two-level aggregate: per-batch Arrow (user, type) partial counts,
    one co-partition shuffle of partials, then a vectorized per-bucket
    argmax (np.bincount sum + np.maximum.at max + np.minimum.at
    tie-break). Nothing per-user runs in Python."""
    from geotile.ops.relational import _with_bucket

    ev = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["user_id", "event_type"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "user_id": g["user_id"].cast(pa.int64()),
                "event_type": g["event_type"],
                "n": g["count_all"].cast(pa.int64()),
            }
        )

    out_cols = ["user_id", "mode_type", "n_events"]

    def mode(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["bucket"])
        if len(df) == 0:
            return pd.DataFrame(
                {"user_id": pd.Series(dtype=np.int64),
                 "mode_type": pd.Series(dtype=str),
                 "n_events": pd.Series(dtype=np.int64)}
            )
        u = df["user_id"].to_numpy(np.int64)
        n = df["n"].to_numpy(np.int64)
        types, code = np.unique(df["event_type"].to_numpy(), return_inverse=True)
        users, uidx = np.unique(u, return_inverse=True)
        k = len(types)
        # compact O(present pairs) reduction — a dense users×k matrix
        # would be per-bucket memory proportional to user cardinality
        uk, inv = np.unique(uidx * k + code, return_inverse=True)
        tot = np.zeros(len(uk), dtype=np.int64)
        np.add.at(tot, inv, n)  # sum split partials per (user, type)
        uu = uk // k
        new = np.r_[True, uu[1:] != uu[:-1]]
        starts = np.flatnonzero(new)
        runid = np.cumsum(new) - 1
        mx = np.maximum.reduceat(tot, starts)
        # first index achieving the run max — uk ascending means code
        # ascending within a user, so "first" = lexicographic-min type
        cand = np.where(tot == mx[runid], np.arange(len(uk)), np.iinfo(np.int64).max)
        sel = np.minimum.reduceat(cand, starts)
        return pd.DataFrame(
            {
                "user_id": users[uu[sel]],
                "mode_type": types[uk[sel] % k],
                "n_events": tot[sel],
            }
        )

    return (
        _with_bucket(
            ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
            "user_id",
            32,
        )
        .groupby("bucket")
        .map_groups(mode, batch_format="pandas")
    )


def q_cube_docs(sf_dir: str):
    """GROUP BY CUBE(lang, source) — every grouping set (detail,
    lang-only, source-only, grand total) from one streaming pass
    (relational.cube_aggregate); ``gid`` replays SQL's
    grouping(lang) + 2*grouping(source)."""
    from geotile.ops.relational import cube_aggregate

    docs = _read(sf_dir, "documents", ["lang", "source", "n_chars"])
    return cube_aggregate(docs, keys=["lang", "source"], sum_col="n_chars")


def q_skyline_orders(sf_dir: str):
    """2-D skyline / Pareto frontier: orders not dominated on
    (maximize o_totalprice, minimize o_orderdate). Per-block local
    frontier (dominance is transitive, so local pruning is lossless),
    then one tiny final pass — the SQL replay is the quadratic
    NOT EXISTS dominance test; the engine does it in
    O(n log n) + O(frontier)."""
    from geotile.ops.relational import skyline

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice", "o_orderdate"])

    def to_us(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_totalprice": t["o_totalprice"],
                "o_date_us": t["o_orderdate"].cast(pa.int64()),
            }
        )

    us = orders.map_batches(to_us, batch_format="pyarrow", zero_copy_batch=True)
    return skyline(us, max_col="o_totalprice", min_col="o_date_us")


def q_embedding_dim_stats(sf_dir: str):
    """Per-dimension feature statistics over the embedding column
    (UNNEST + GROUP BY dim in SQL): min / max / positive-count / count
    per dimension. The list column is flattened ZERO-COPY to one
    (rows x dim) float32 matrix per batch and reduced with one numpy
    pass; the shuffle moves only dim-cardinality partial rows. min and
    max are order-independent (bit-exact across engines); the counts
    are integers — no float summation anywhere."""
    from ray.data.aggregate import Max, Min, Sum

    emb = _read(sf_dir, "embeddings", ["embedding"])

    def partial(t: pa.Table) -> pa.Table:
        col = t["embedding"].combine_chunks()
        n = len(col)
        if n == 0:
            return pa.table(
                {
                    "dim": pa.array([], pa.int64()),
                    "vmin": pa.array([], pa.float64()),
                    "vmax": pa.array([], pa.float64()),
                    "n_pos": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        vals = col.values.to_numpy(zero_copy_only=False)
        m = vals.reshape(n, len(vals) // n)
        d = m.shape[1]
        return pa.table(
            {
                "dim": pa.array(np.arange(d, dtype=np.int64)),
                # float32 -> float64 is exact; DuckDB side CASTs to
                # DOUBLE the same way, so hashes stay bit-identical
                "vmin": pa.array(m.min(axis=0).astype(np.float64)),
                "vmax": pa.array(m.max(axis=0).astype(np.float64)),
                "n_pos": pa.array((m > 0).sum(axis=0).astype(np.int64)),
                "n": pa.array(np.full(d, n, dtype=np.int64)),
            }
        )

    agg = (
        emb.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("dim")
        .aggregate(Min("vmin"), Max("vmax"), Sum("n_pos"), Sum("n"))
    )
    return _rename(agg, ["dim", "vmin", "vmax", "n_pos", "n"])


def q_event_gap_stats_user(sf_dir: str):
    """Inter-event gap statistics per user (SQL's LAG-diff aggregate):
    count / max / sum of the time gaps between consecutive events under
    the total order (ts, event_id). ONE co-partition by user; per
    bucket a single lexsort + shifted diff materializes every gap, then
    three bincount/maximum.at reduces — no window function, no per-user
    Python. Users with a single event drop out (no gap), matching the
    oracle's WHERE pt IS NOT NULL."""
    from geotile.ops.relational import _with_bucket

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id"])
    out_cols = ["user_id", "n_gaps", "max_gap_us", "sum_gap_us"]

    def gaps_fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["bucket"])
        if len(df) < 2:
            return pd.DataFrame({c: pd.Series(dtype=np.int64) for c in out_cols})
        u = df["user_id"].to_numpy(np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        order = np.lexsort((eid, ts, u))
        u, ts = u[order], ts[order]
        same = u[1:] == u[:-1]
        gu = u[1:][same]
        g = ts[1:][same] - ts[:-1][same]  # >= 0: ts ascending within a run
        if len(gu) == 0:
            return pd.DataFrame({c: pd.Series(dtype=np.int64) for c in out_cols})
        users, gidx = np.unique(gu, return_inverse=True)
        mx = np.zeros(len(users), dtype=np.int64)
        np.maximum.at(mx, gidx, g)
        return pd.DataFrame(
            {
                "user_id": users,
                "n_gaps": np.bincount(gidx).astype(np.int64),
                "max_gap_us": mx,
                "sum_gap_us": np.bincount(gidx, weights=g).astype(np.int64),
            }
        )

    return (
        _with_bucket(ev, "user_id", 32)
        .groupby("bucket")
        .map_groups(gaps_fn, batch_format="pandas")
    )


def _last_per_user(u, ts, eid, extra):
    """Indices of each user's (ts, event_id)-max row — vectorized
    run-tail select after one ascending lexsort."""
    order = np.lexsort((eid, ts, u))
    u_s = u[order]
    is_last = np.empty(len(u_s), dtype=bool)
    is_last[:-1] = u_s[1:] != u_s[:-1]
    is_last[-1] = True
    return order[is_last]


def q_last_event_user(sf_dir: str):
    """max_by / last-touch attribution: each user's most recent event
    (row with max (ts, event_id)) — SQL's row_number-over-desc idiom.
    Per-batch partial argmax first (the shuffle moves at most one row
    per user per batch, not the event stream), then the same vectorized
    run-tail select per co-partitioned bucket."""
    from geotile.ops.relational import _with_bucket

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(u) == 0:
            return pa.table(
                {"user_id": pa.array([], pa.int64()),
                 "last_type": pa.array([], pa.string()),
                 "last_ts_us": pa.array([], pa.int64()),
                 "last_event_id": pa.array([], pa.int64())}
            )
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sel = _last_per_user(u, ts, eid, None)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": pa.array(u[sel]),
                "last_type": pa.array(et[sel]),
                "last_ts_us": pa.array(ts[sel]),
                "last_event_id": pa.array(eid[sel]),
            }
        )

    out_cols = ["user_id", "last_type", "last_ts_us", "last_event_id"]

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["bucket"])
        if len(df) == 0:
            return pd.DataFrame(
                {"user_id": pd.Series(dtype=np.int64),
                 "last_type": pd.Series(dtype=str),
                 "last_ts_us": pd.Series(dtype=np.int64),
                 "last_event_id": pd.Series(dtype=np.int64)}
            )
        sel = _last_per_user(
            df["user_id"].to_numpy(np.int64),
            df["last_ts_us"].to_numpy(np.int64),
            df["last_event_id"].to_numpy(np.int64),
            None,
        )
        return df.iloc[sel][out_cols].reset_index(drop=True)

    partials = ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return (
        _with_bucket(partials, "user_id", 32)
        .groupby("bucket")
        .map_groups(final, batch_format="pandas")
    )


def q_type_cooccurrence_users(sf_dir: str):
    """Co-occurrence matrix: for every unordered event-type pair, how
    many users did BOTH — the distinct self-join collapsed to a bitmask
    aggregate. Per-batch distinct (user, type) partials, one user
    co-partition, then each user's type set becomes one int64 bitmask
    (np.bitwise_or.at); pair counts are derived from the ≤2^k distinct
    masks, never from user rows. Requires < 64 distinct types — the
    documented assumption of the bitmask path (wider vocabularies
    would shard the mask)."""
    from geotile.ops.relational import _with_bucket

    ev = _read(sf_dir, "events", ["user_id", "event_type"])

    def distinct(t: pa.Table) -> pa.Table:
        g = t.group_by(["user_id", "event_type"]).aggregate([])
        return pa.table(
            {"user_id": g["user_id"].cast(pa.int64()), "event_type": g["event_type"]}
        )

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["bucket"])
        out = {"type_a": [], "type_b": [], "n_users": []}
        if len(df) == 0:
            return pd.DataFrame(
                {"type_a": pd.Series(dtype=str), "type_b": pd.Series(dtype=str),
                 "n_users": pd.Series(dtype=np.int64)}
            )
        types, code = np.unique(df["event_type"].to_numpy(), return_inverse=True)
        if len(types) >= 64:
            raise ValueError("bitmask co-occurrence supports < 64 types")
        users, uidx = np.unique(
            df["user_id"].to_numpy(np.int64), return_inverse=True
        )
        mask = np.zeros(len(users), dtype=np.int64)
        np.bitwise_or.at(mask, uidx, np.int64(1) << code.astype(np.int64))
        vals, cnts = np.unique(mask, return_counts=True)
        acc: dict[tuple[int, int], int] = {}
        for m, c in zip(vals.tolist(), cnts.tolist()):  # aggregate-scale loop
            bits = [i for i in range(len(types)) if (m >> i) & 1]
            for x in range(len(bits)):
                for y in range(x + 1, len(bits)):
                    key = (bits[x], bits[y])
                    acc[key] = acc.get(key, 0) + c
        for (a, b), c in acc.items():
            out["type_a"].append(types[a])
            out["type_b"].append(types[b])
            out["n_users"].append(c)
        return pd.DataFrame(out)

    partials = (
        _with_bucket(
            ev.map_batches(distinct, batch_format="pyarrow", zero_copy_batch=True),
            "user_id",
            32,
        )
        .groupby("bucket")
        .map_groups(pairs, batch_format="pandas")
    )
    return _rename(
        partials.groupby(["type_a", "type_b"]).sum("n_users"),
        ["type_a", "type_b", "n_users"],
    )


def q_pagerank_dups(sf_dir: str):
    """Fixed-iteration PageRank (3 BSP rounds, exact integer lattice)
    over the embedding near-dup pair graph — the iterative-algorithm
    counterpart to connected components: dup-cluster centrality ranks
    which duplicate is the best canonical representative. Bit-exact SQL
    replay via three chained CTEs (floor division per source, integer
    sums — no float summation order anywhere)."""
    from geotile.ops.dedup import embedding_dup_pairs
    from geotile.ops.graph import pagerank_int

    pairs = embedding_dup_pairs(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]), tau=0.35
    )
    return pagerank_int(pairs.select_columns(["a", "b"]), iters=3, n_buckets=8)


def q_weighted_avg_lineitem(sf_dir: str):
    """Weighted average as exact numerator/denominator pairs (the
    float division is a scalar epilogue, kept out of the compared
    columns): per returnflag, quantity-weighted extendedprice. Partial
    sums per batch, flag-cardinality shuffle. Sums stay exact in
    float64 (cents x integral quantities < 2^53), then land on the
    integer lattice once."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.append_column(
            "wv", pc.multiply(t["l_extendedprice"], t["l_quantity"])
        ).group_by("l_returnflag").aggregate(
            [("wv", "sum"), ("l_quantity", "sum"), ([], "count_all")]
        )
        return pa.table(
            {
                "l_returnflag": g["l_returnflag"],
                "wsum": g["wv_sum"],
                "wtot": g["l_quantity_sum"],
                "n": g["count_all"].cast(pa.int64()),
            }
        )

    agg = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("l_returnflag").sum(["wsum", "wtot", "n"])

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "wsum_e2": _e(t["sum(wsum)"], 100),
                "wtot": pc.round(t["sum(wtot)"]).cast(pa.int64()),
                "n": t["sum(n)"].cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def q_embedding_cov_moments(sf_dir: str):
    """Covariance / Gram-matrix moments over the embedding column (the
    PCA-prep every representation-learning pipeline runs): for every
    dimension pair i <= j, exact integer moments (n, Σq_i q_j, Σq_i,
    Σq_j) on the trunc(v·10⁴) lattice. Per batch the list column
    flattens zero-copy to an (n × d) matrix and ONE float64 BLAS
    matmul produces all d(d+1)/2 partial products — exact, because
    every intermediate sum of lattice products stays below 2^53
    (|q| ≤ ~10⁴ ⇒ batch sums ≤ 1e12). The shuffle moves only
    pair-cardinality partial rows; covariance itself is a scalar
    epilogue (s_ij/n − s_i s_j/n²) left out of the compared columns."""
    emb = _read(sf_dir, "embeddings", ["embedding"])

    def partial(t: pa.Table) -> pa.Table:
        col = t["embedding"].combine_chunks()
        n = len(col)
        empty = pa.table(
            {
                "i": pa.array([], pa.int64()),
                "j": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "s_ij": pa.array([], pa.int64()),
                "s_i": pa.array([], pa.int64()),
                "s_j": pa.array([], pa.int64()),
            }
        )
        if n == 0:
            return empty
        vals = col.values.to_numpy(zero_copy_only=False)
        d = len(vals) // n
        q = np.trunc(vals.reshape(n, d).astype(np.float64) * 10000.0)
        s = q.T @ q  # float64 BLAS on exact integers — see docstring
        cs = q.sum(axis=0)
        iu, ju = np.triu_indices(d)
        # pack (i, j) into ONE int64 groupby key: Ray's sort-based
        # multi-key aggregate cost ~0.7s/block on these 2080-row
        # partials (60s of cpu across 64 blocks — measured); the
        # single-int key collapses that to the cheap path. 4096 bounds
        # any embedding dim.
        return pa.table(
            {
                "ij": pa.array((iu * 4096 + ju).astype(np.int64)),
                "n": pa.array(np.full(len(iu), n, dtype=np.int64)),
                "s_ij": pa.array(s[iu, ju].astype(np.int64)),
                "s_i": pa.array(cs[iu].astype(np.int64)),
                "s_j": pa.array(cs[ju].astype(np.int64)),
            }
        )

    # block-COUNT law: the partials are pair-cardinality (2080 rows per
    # input block, identical key set), so coalesce before the sort-
    # based aggregate — 64 tiny blocks cost the Aggregate ~5s of
    # machinery; 4 blocks make it sub-second (measured)
    # batch_size spans blocks: Ray's size-based read split leaves this
    # narrow table in dozens of ~31-row blocks, and every partial call
    # emits 2080 rows — a 67× blowup per tiny block. Bundling to 64k-
    # row batches (16 MB of f32 at d=64) makes the blowup per-BATCH,
    # and the repartition keeps the sort-based aggregate at a handful
    # of blocks (block-COUNT law — 64 tiny blocks cost it ~5s).
    agg = (
        emb.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=65536,
        )
        .repartition(4)
        .groupby("ij")
        .sum(["n", "s_ij", "s_i", "s_j"])
    )

    def unpack(t: pa.Table) -> pa.Table:
        ij = t["ij"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "i": pa.array(ij // 4096),
                "j": pa.array(ij % 4096),
                "n": t["sum(n)"].cast(pa.int64()),
                "s_ij": t["sum(s_ij)"].cast(pa.int64()),
                "s_i": t["sum(s_i)"].cast(pa.int64()),
                "s_j": t["sum(s_j)"].cast(pa.int64()),
            }
        )

    return agg.map_batches(unpack, batch_format="pyarrow")


_STOPWORDS = ("the", "a")


def q_stopword_filter_docs(sf_dir: str):
    """Text-cleaning op: stopword removal as token-level statistics
    (kept-token count + kept-char count per doc) — the filter stage of
    a training-data cleaning pipeline, fully vectorized: one Arrow
    split per batch, one index_in against the broadcast stopword list,
    two segmented sums. No Python touches a token."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    sw = pa.array(list(_STOPWORDS), pa.string())

    def clean(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        flat = pc.list_flatten(toks).combine_chunks()
        keep = pc.is_null(pc.index_in(flat, sw)).to_numpy(zero_copy_only=False)
        lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
        counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        seg = np.repeat(np.arange(len(t), dtype=np.int64), counts)
        n_keep = np.zeros(len(t), dtype=np.int64)
        np.add.at(n_keep, seg[keep], 1)
        c_keep = np.zeros(len(t), dtype=np.int64)
        np.add.at(c_keep, seg[keep], lens[keep])
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens_clean": pa.array(n_keep),
                "n_chars_clean": pa.array(c_keep),
            }
        )

    return docs.map_batches(clean, batch_format="pyarrow", zero_copy_batch=True)


def q_value_histogram_events(sf_dir: str):
    """Fixed-width histogram (SQL width_bucket model): events.value
    binned at width 25, one partial bincount per batch, bin-cardinality
    shuffle. floor(value/25) is bit-deterministic on doubles, so both
    engines agree on every edge case."""
    ev = _read(sf_dir, "events", ["value"])

    def partial(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        b = np.floor(v / 25.0).astype(np.int64)
        vals, cnts = np.unique(b, return_counts=True)
        return pa.table(
            {"bin": pa.array(vals), "n": pa.array(cnts.astype(np.int64))}
        )

    return _rename(
        ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bin")
        .sum("n"),
        ["bin", "n"],
    )


def q_hourly_activity_events(sf_dir: str):
    """Calendar/time-dimension extraction: activity by hour of day
    (UTC) with count + value mass per hour. hour = (epoch_us //
    3_600_000_000) % 24 on the int64 lattice — identical to SQL
    date_part('hour', ts) for non-negative epochs; values land on the
    e4 integer lattice PER ELEMENT (before any summation), so partial
    sums are exact int64 and summation order can never matter."""
    ev = _read(sf_dir, "events", ["ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        hour = (us // 3_600_000_000) % 24
        v = t["value"].to_numpy(zero_copy_only=False)
        q = np.round(v * 10000.0).astype(np.int64)  # half-even == pc.round
        n = np.bincount(hour, minlength=24).astype(np.int64)
        sq = np.zeros(24, dtype=np.int64)
        np.add.at(sq, hour, q)
        return pa.table(
            {
                "hour": pa.array(np.arange(24, dtype=np.int64)),
                "n": pa.array(n),
                "sum_value_e4": pa.array(sq),
            }
        )

    return _rename(
        ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("hour")
        .sum(["n", "sum_value_e4"]),
        ["hour", "n", "sum_value_e4"],
    )


def q_kmeans_embeddings(sf_dir: str):
    """Distributed Lloyd k-means (k=8, 2 rounds) on the exact
    trunc(v·10⁴) integer lattice (ann.kmeans_lloyd): per round one
    streaming pass — a single float64 BLAS matmul per batch against the
    broadcast centroid matrix (exact below 2^53) and k·d-cardinality
    partial sums; centroids are FLOOR integer means, so the chained-CTE
    SQL replay (with the positive-mod floordiv identity — DuckDB //
    truncates, numpy floors) matches bit-for-bit. The driver holds only
    the k×d centroid matrix, never vector data."""
    from geotile.ops.ann import kmeans_lloyd

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return kmeans_lloyd(emb, k=8, iters=2)


def q_resampled_hourly_events(sf_dir: str):
    """Time-series resampling: events bucketed to a DENSE hourly grid —
    missing hours gap-filled with 0 — plus a trailing 3-hour moving
    sum. Row-scale work is one partial bincount per batch; the dense
    series itself is AGGREGATE-scale (it grows with the time span, not
    the row count), so the gap-fill + window runs as one small final
    task over the materialized hour counts. The moving sum is two
    shifted adds, not a window loop."""
    ev = _read(sf_dir, "events", ["ts"])

    def partial(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        vals, cnts = np.unique(us // 3_600_000_000, return_counts=True)
        return pa.table(
            {"hi": pa.array(vals), "n": pa.array(cnts.astype(np.int64))}
        )

    agg = _rename(
        ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("hi")
        .sum("n"),
        ["hi", "n"],
    ).repartition(1)

    def fill(t: pa.Table) -> pa.Table:
        hi = t["hi"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        if len(hi) == 0:
            return pa.table(
                {"hi": pa.array([], pa.int64()), "n": pa.array([], pa.int64()),
                 "ma3": pa.array([], pa.int64())}
            )
        lo, hx = hi.min(), hi.max()
        dense = np.zeros(hx - lo + 1, dtype=np.int64)
        dense[hi - lo] = n
        ma3 = dense.copy()
        ma3[1:] += dense[:-1]
        ma3[2:] += dense[:-2]
        return pa.table(
            {
                "hi": pa.array(np.arange(lo, hx + 1, dtype=np.int64)),
                "n": pa.array(dense),
                "ma3": pa.array(ma3),
            }
        )

    return agg.map_batches(fill, batch_format="pyarrow", batch_size=None)


def q_mad_events(sf_dir: str):
    """Median absolute deviation per group (robust dispersion — the
    statistic quality-filter pipelines prefer over stddev): two passes
    on the exact grouped-quantile core. Pass 1 selects each group's
    lower median (rank ceil(n/2), an actual element); the group-
    cardinality median dict is broadcast via ray.put; pass 2 runs the
    same rank selection over |v − med|. Both selected values are real
    elements of deterministic float64 expressions, so the SQL replay is
    bit-exact — no interpolation anywhere."""
    from geotile.ops.quantile import grouped_quantiles

    ev = _read(sf_dir, "events", ["event_type", "value"])
    # max_pull trades streaming passes for a bounded driver pull: MAD
    # already needs 2 chained quantile selections, so at 2000 each one
    # runs extra refinement rounds (~14s at sf0.1); 50k pulls whole
    # final intervals in one round (measured ~2x faster, pull stays
    # <1 MB). grouped_quantiles_events keeps 2000 to exercise the
    # refinement path.
    med_t = grouped_quantiles(
        ev, "value", "event_type", q_pcts=(50,), max_pull=50_000
    )
    med = dict(zip(med_t["group"].to_pylist(), med_t["value"].to_pylist()))
    mref = ray.put(med)

    def dev(t: pa.Table, _mref=mref) -> pa.Table:
        m = ray.get(_mref)
        g = t["event_type"].to_numpy(zero_copy_only=False)
        v = t["value"].to_numpy(zero_copy_only=False)
        ug, inv = np.unique(g, return_inverse=True)
        marr = np.asarray([m[x] for x in ug.tolist()], dtype=np.float64)
        return pa.table(
            {"event_type": t["event_type"], "av": pa.array(np.abs(v - marr[inv]))}
        )

    devs = ev.map_batches(dev, batch_format="pyarrow", zero_copy_batch=True)
    mad_t = grouped_quantiles(
        devs, "av", "event_type", q_pcts=(50,), max_pull=50_000
    )
    mad = dict(zip(mad_t["group"].to_pylist(), mad_t["value"].to_pylist()))
    groups = sorted(med)
    return pd.DataFrame(
        {
            "event_type": groups,
            "med": [med[g] for g in groups],
            "mad": [mad[g] for g in groups],
        }
    )


_THROTTLE_US = 3 * 86400 * 1_000_000  # 3 days


def q_throttled_events(sf_dir: str):
    """Rate-limit dedup (log-cleaning staple): keep an event only if
    it's the FIRST of its (user, type) or arrived more than 3 days
    after the previous one — SQL's LAG-gap filter. One co-partition by
    user; per bucket a single lexsort + shifted compare decides every
    row. (Unlike sessionization this emits the surviving ROWS, not
    session aggregates.)"""
    from geotile.ops.relational import _with_bucket

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    out_cols = ["event_id", "user_id", "event_type", "ts_us"]

    def throttle(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["bucket"])
        if len(df) == 0:
            return pd.DataFrame(
                {"event_id": pd.Series(dtype=np.int64),
                 "user_id": pd.Series(dtype=np.int64),
                 "event_type": pd.Series(dtype=str),
                 "ts_us": pd.Series(dtype=np.int64)}
            )
        u = df["user_id"].to_numpy(np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        types, code = np.unique(df["event_type"].to_numpy(), return_inverse=True)
        order = np.lexsort((eid, ts, code, u))
        us, cs, tss = u[order], code[order], ts[order]
        keep = np.empty(len(order), dtype=bool)
        keep[0] = True
        same = (us[1:] == us[:-1]) & (cs[1:] == cs[:-1])
        keep[1:] = ~same | (tss[1:] - tss[:-1] > _THROTTLE_US)
        sel = order[keep]
        return pd.DataFrame(
            {
                "event_id": eid[sel],
                "user_id": u[sel],
                "event_type": df["event_type"].to_numpy()[sel],
                "ts_us": ts[sel],
            }
        )[out_cols]

    return (
        _with_bucket(ev, "user_id", 32)
        .groupby("bucket")
        .map_groups(throttle, batch_format="pandas")
    )


def q_dedup_keep_canonical(sf_dir: str):
    """The APPLY phase of near-dup dedup — what the pipeline actually
    ships: every vector untouched by any dup pair, plus exactly one
    canonical representative (min id) per duplicate cluster. Pair
    generation → connected components → size-guarded anti-join back to
    the corpus; the corpus never shuffles — only the (small) dup-node
    id set moves."""
    from geotile.ops.dedup import embedding_dup_pairs
    from geotile.ops.graph import connected_components
    from geotile.ops.relational import anti_join

    ids = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    pairs = embedding_dup_pairs(ids, tau=0.35)
    cc = connected_components(
        pairs.select_columns(["a", "b"]), "a", "b", n_buckets=8
    ).materialize()  # node-scale; reused twice below

    untouched = anti_join(
        ids.select_columns(["vec_id"]), cc, "vec_id", "node"
    )
    canonical = cc.map_batches(
        lambda t: pa.table(
            {"vec_id": t.filter(pc.equal(t["node"], t["cluster_id"]))["node"]}
        ),
        batch_format="pyarrow",
    )
    return untouched.union(canonical)


def q_union_by_name_orders(sf_dir: str):
    """Schema-evolution union (UNION ALL BY NAME): two projections of
    orders with different columns align by NAME, null-filling what each
    side lacks (relational.union_by_name — the Dataset API's union
    requires identical schemas). Nulls are COALESCE-filled to sentinels
    in the output so the driver's value hash is null-free."""
    from geotile.ops.relational import union_by_name

    f = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus", "o_totalprice"])
    o = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus", "o_orderpriority"])

    fa = f.map_batches(
        lambda t: t.filter(pc.equal(t["o_orderstatus"], "F")).drop_columns(
            ["o_orderstatus"]
        ),
        batch_format="pyarrow",
    )
    ob = o.map_batches(
        lambda t: t.filter(pc.equal(t["o_orderstatus"], "O")).drop_columns(
            ["o_orderstatus"]
        ),
        batch_format="pyarrow",
    )
    u = union_by_name(fa, ob)

    def fill(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_totalprice": pc.coalesce(
                    t["o_totalprice"], pa.scalar(-1.0)
                ),
                "o_orderpriority": pc.coalesce(
                    t["o_orderpriority"], pa.scalar("NONE")
                ),
            }
        )

    return u.map_batches(fill, batch_format="pyarrow")


def q_grouping_sets_docs(sf_dir: str):
    """GROUP BY GROUPING SETS ((lang), (source)) — the explicit-sets
    generalization of CUBE/ROLLUP on the same one-pass combiner
    (relational.cube_aggregate with ``sets``): both summaries from one
    read, gid keeping SQL's bitmask convention."""
    from geotile.ops.relational import cube_aggregate

    docs = _read(sf_dir, "documents", ["lang", "source", "n_chars"])
    return cube_aggregate(
        docs, keys=["lang", "source"], sum_col="n_chars",
        sets=[("lang",), ("source",)],
    )


def q_percent_rank_events(sf_dir: str):
    """percent_rank per user over event value, as EXACT rational parts
    (pr_num = RANK−1 with SQL's shared-tie semantics, pr_den = n−1; the
    float division is an epilogue outside the compared columns). One
    co-partition by user; ranks fall out of one (user, value) lexsort —
    tie runs inherit their first row's rank via a run-start gather."""
    from geotile.ops.relational import _with_bucket

    ev = _read(sf_dir, "events", ["user_id", "event_id", "value"])
    out_cols = ["event_id", "pr_num", "pr_den"]

    def pr(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["bucket"])
        n = len(df)
        if n == 0:
            return pd.DataFrame({c: pd.Series(dtype=np.int64) for c in out_cols})
        u = df["user_id"].to_numpy(np.int64)
        v = df["value"].to_numpy()
        eid = df["event_id"].to_numpy(np.int64)
        order = np.lexsort((v, u))
        us, vs = u[order], v[order]
        i = np.arange(n)
        new_u = np.r_[True, us[1:] != us[:-1]]
        ustart = i[new_u][np.cumsum(new_u) - 1]
        ulen = np.diff(np.r_[np.flatnonzero(new_u), n])[np.cumsum(new_u) - 1]
        new_uv = new_u | np.r_[True, vs[1:] != vs[:-1]]
        uvstart = i[new_uv][np.cumsum(new_uv) - 1]  # first row of tie run
        rank0 = uvstart - ustart  # RANK-1: tie runs share first pos
        out = np.empty(n, dtype=np.int64)
        den = np.empty(n, dtype=np.int64)
        out[order] = rank0
        den[order] = ulen - 1
        return pd.DataFrame({"event_id": eid, "pr_num": out, "pr_den": den})

    return (
        _with_bucket(ev, "user_id", 32)
        .groupby("bucket")
        .map_groups(pr, batch_format="pandas")
    )


def q_top_bigrams_docs(sf_dir: str):
    """Global top-20 token BIGRAMS (the n-gram LM statistic one step up
    from q_top_terms_docs): adjacent-token pairs within each doc via
    two Arrow slices + one binary_join_element_wise concat — no Python
    string work — then the same value_counts combiner → vocabulary-
    scale groupby → partial top-k plan."""
    ds = _read(sf_dir, "documents", ["text"])
    k = 20

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        flat = pc.list_flatten(toks).combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        n = len(flat)
        if n < 2:
            return pa.table(
                {"bigram": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        bg = pc.binary_join_element_wise(
            flat.slice(0, n - 1), flat.slice(1), " "
        )
        # drop pairs that straddle a document boundary
        keep = np.ones(n - 1, dtype=bool)
        last = np.cumsum(lens) - 1  # last token index of each doc
        keep[last[last < n - 1]] = False
        vc = bg.filter(pa.array(keep)).value_counts()
        return pa.table(
            {"bigram": vc.field("values"), "n": vc.field("counts").cast(pa.int64())}
        )

    def top_of(t: pa.Table) -> pa.Table:
        bg = t["bigram"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        order = np.lexsort((bg, -n))[:k]  # (n desc, bigram asc)
        return pa.table({"bigram": pa.array(bg[order]), "n": pa.array(n[order])})

    summed = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bigram")
        .sum("n")
        .map_batches(
            lambda t: t.rename_columns(["bigram", "n"]), batch_format="pyarrow"
        )
    )
    cands = summed.map_batches(top_of, batch_format="pyarrow")
    return cands.repartition(1).map_batches(
        top_of, batch_format="pyarrow", batch_size=None
    )


def q_cm_user_counts(sf_dir: str):
    """Count-min sketch (the frequency-sketch companion to HLL and
    Misra-Gries): per-user event counts estimated from a d×w counter
    grid whose shuffle is ≤ d·w packed cells per batch — never the key
    stream — then point-queried for every user next to the exact count.
    over_ok asserts CM's one-sided guarantee (est ≥ truth, always).
    Deterministic fixed-seed hashing makes est bit-reproducible; the
    oracle replays it with a pure-int scalar sidecar
    (oracle_ref.cm_estimates_ref)."""
    from geotile.ops.sketch import cm_estimate, cm_sketch

    ev = _read(sf_dir, "events", ["user_id"])
    grid = cm_sketch(ev, "user_id")
    gref = ray.put(grid)

    def exact(t: pa.Table) -> pa.Table:
        g = t.group_by("user_id").aggregate([([], "count_all")])
        return pa.table(
            {"user_id": g["user_id"].cast(pa.int64()),
             "n": g["count_all"].cast(pa.int64())}
        )

    agg = (
        ev.map_batches(exact, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .sum("n")
    )

    def finish(t: pa.Table, _g=gref) -> pa.Table:
        gr = ray.get(_g)
        ids = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ex = t["sum(n)"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        est = cm_estimate(gr, ids)
        return pa.table(
            {
                "user_id": pa.array(ids),
                "est_cnt": pa.array(est),
                "exact_cnt": pa.array(ex),
                "over_ok": pa.array(est >= ex),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def q_train_split_docs(sf_dir: str):
    """Deterministic train/val/test split (90/5/5) — the assignment
    every training-data pipeline ends with: split = Knuth hash of
    doc_id mod 100 (shard-stable, reproducible, no RNG state), then
    per-(split, lang) counts + char mass. One vectorized partial per
    batch; the shuffle is (3 × languages) rows."""
    docs = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = ((did * np.uint64(2654435761)) % np.uint64(4294967296)) % np.uint64(100)
        split = np.where(b < 90, "train", np.where(b < 95, "val", "test"))
        tt = pa.table(
            {"split": pa.array(split), "lang": t["lang"], "n_chars": t["n_chars"]}
        )
        g = tt.group_by(["split", "lang"]).aggregate(
            [([], "count_all"), ("n_chars", "sum")]
        )
        return pa.table(
            {
                "split": g["split"],
                "lang": g["lang"],
                "n": g["count_all"].cast(pa.int64()),
                "sum_n_chars": g["n_chars_sum"].cast(pa.int64()),
            }
        )

    return _rename(
        docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["split", "lang"])
        .sum(["n", "sum_n_chars"]),
        ["split", "lang", "n", "sum_n_chars"],
    )


def q_global_sort_orders(sf_dir: str):
    """Global ORDER BY via Ray's range-partitioned distributed sort —
    the one all-to-all primitive the rest of this engine deliberately
    avoids (top-k uses partial reduction, quantiles use histogram
    refinement). Exposed as its own query because total ordering IS
    sometimes the requirement (final deliverable files, merge-join
    prep); (o_totalprice DESC, o_orderkey ASC) makes the order total so
    both engines agree on ties."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    top = orders.sort(
        ["o_totalprice", "o_orderkey"], descending=[True, False]
    ).limit(1000)

    def rank(t: pa.Table) -> pa.Table:
        return pa.table(
            {"o_orderkey": t["o_orderkey"], "o_totalprice": t["o_totalprice"]}
        )

    return top.map_batches(rank, batch_format="pyarrow")


def _ndjson_cache(sf_dir: str) -> str:
    """events as newline-delimited JSON (ts as epoch_us int), derived
    once from the parquet and cached content-free (pure projection —
    keyed by sf name only; regenerating is cheap and deterministic)."""
    import json as _json
    import pathlib

    import pyarrow.parquet as pq

    out = _oracle_cache_dir() / f"events_ndjson_{pathlib.Path(sf_dir).name}"
    marker = out / "_DONE"
    if not marker.exists():
        out.mkdir(parents=True, exist_ok=True)
        t = pq.read_table(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "event_type", "value", "ts"],
        )
        us = t["ts"].cast(pa.int64()).to_pylist()
        with open(out / "part-0.jsonl", "w") as f:
            for eid, et, v, u in zip(
                t["event_id"].to_pylist(), t["event_type"].to_pylist(),
                t["value"].to_pylist(), us,
            ):
                f.write(_json.dumps(
                    {"event_id": eid, "event_type": et, "value": v, "ts_us": u}
                ) + "\n")
        marker.touch()
    return str(out / "part-0.jsonl")


def q_ndjson_events_ingest(sf_dir: str):
    """Source-format breadth: the same per-type aggregate computed from
    an NDJSON shard via ``ray.data.read_json`` (log-style ingestion —
    the format most raw event streams arrive in), oracled against the
    PARQUET view: two independent ingestion paths must produce
    identical counts and e4-lattice value sums."""
    path = _ndjson_cache(sf_dir)
    ds = rd.read_json(path)

    def partial(t: pa.Table) -> pa.Table:
        q = pc.round(pc.multiply(t["value"], pa.scalar(10000.0))).cast(pa.int64())
        g = t.append_column("q", q).group_by("event_type").aggregate(
            [([], "count_all"), ("q", "sum")]
        )
        return pa.table(
            {
                "event_type": g["event_type"],
                "n": g["count_all"].cast(pa.int64()),
                "sum_value_e4": g["q_sum"].cast(pa.int64()),
            }
        )

    return _rename(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .sum(["n", "sum_value_e4"]),
        ["event_type", "n", "sum_value_e4"],
    )


def q_user_sequence_strings(sf_dir: str):
    """Sequence serialization — turning each user's event stream into a
    TEXT token sequence (the events→LM-training-corpus step): the first
    10 events per user under the (ts, event_id) total order, joined
    with '>'. One co-partition by user; inside a bucket one lexsort
    builds per-user runs, the ≤10-prefix mask is run arithmetic, and
    the string assembly is ONE Arrow ``binary_join`` over a ListArray —
    no per-user Python string work."""
    from geotile.ops.relational import _with_bucket

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    LIMIT = 10

    def seqs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["bucket"])
        if len(df) == 0:
            return pd.DataFrame(
                {"user_id": pd.Series(dtype=np.int64),
                 "seq": pd.Series(dtype=str)}
            )
        u = df["user_id"].to_numpy(np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        et = df["event_type"].to_numpy()
        order = np.lexsort((eid, ts, u))
        us, ets = u[order], et[order]
        n = len(us)
        i = np.arange(n)
        new = np.r_[True, us[1:] != us[:-1]]
        run_start = i[new][np.cumsum(new) - 1]
        keep = (i - run_start) < LIMIT
        us, ets = us[keep], ets[keep]
        users, counts = np.unique(us, return_counts=True)
        offsets = np.r_[0, np.cumsum(counts)].astype(np.int32)
        lst = pa.ListArray.from_arrays(
            pa.array(offsets), pa.array(ets, pa.string())
        )
        seq = pc.binary_join(lst, ">")
        return pd.DataFrame({"user_id": users, "seq": seq.to_pandas()})

    return (
        _with_bucket(ev, "user_id", 32)
        .groupby("bucket")
        .map_groups(seqs, batch_format="pandas")
    )


def q_winsorized_stats_events(sf_dir: str):
    """Winsorized aggregate (outlier-robust cleaning: clip to the exact
    p05/p95 order statistics, then aggregate): two rank selections via
    histogram refinement, both cuts broadcast as scalars, one clipping
    pass — counts of clipped tails are integers and the clipped sum
    lands on the e4 lattice per element, so the SQL replay (rank-select
    CTE + LEAST/GREATEST) matches bit-for-bit."""
    from geotile.ops.quantile import exact_quantiles

    ev = _read(sf_dir, "events", ["value"])
    qt = exact_quantiles(ev, "value", q_pcts=(5, 95), max_pull=50_000)
    cuts = dict(zip(qt["q_pct"].to_pylist(), qt["value"].to_pylist()))
    lo, hi = float(cuts[5]), float(cuts[95])

    def clip(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        w = np.minimum(np.maximum(v, lo), hi)
        q = np.round(w * 10000.0).astype(np.int64)
        return pa.table(
            {
                "n": pa.array([len(v)], pa.int64()),
                "n_lo": pa.array([int((v < lo).sum())], pa.int64()),
                "n_hi": pa.array([int((v > hi).sum())], pa.int64()),
                "sum_w_e4": pa.array([int(q.sum())], pa.int64()),
            }
        )

    agg = (
        ev.map_batches(clip, batch_format="pyarrow", zero_copy_batch=True)
        .sum(["n", "n_lo", "n_hi", "sum_w_e4"])
    )
    return pd.DataFrame(
        {
            "n": [agg["sum(n)"]],
            "n_lo": [agg["sum(n_lo)"]],
            "n_hi": [agg["sum(n_hi)"]],
            "sum_w_e4": [agg["sum(sum_w_e4)"]],
        }
    )


def _semi_lookup_join(fact, fact_key, dim, dim_key, dim_val, out_key):
    """lookup_join then project to (out_key, dim_val)."""
    from geotile.ops.relational import lookup_join

    j = lookup_join(fact, fact_key, dim, dim_key, dim_val)
    return j.map_batches(
        lambda t: t.select([out_key, dim_val]), batch_format="pyarrow"
    )


def q_region_revenue(sf_dir: str):
    """TPC-H Q5-shaped 5-table join — the deepest relational pipeline
    in the battery: lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region with
    a date filter and per-region revenue. Join strategy by SIZE at
    every hop: nation+region (tiny) broadcast-fold into customer at the
    map; orders ⋈ customer and lineitem ⋈ (orders×region) go through
    relational.lookup_join — broadcast searchsorted when the dim side
    fits the 2^20-row guard (bench scale: zero shuffle on the fact
    side, measured 10.7 s → ~3 s), bucketed co-partition beyond it (the
    10^12-row path, where customer no longer broadcasts). Revenue lands
    on the e4 lattice PER ELEMENT before any summation, so join order
    and summation order can never shift the driver hash."""
    from geotile.ops.relational import bucketed_join

    nat = {r["n_nationkey"]: r["n_regionkey"]
           for r in _read(sf_dir, "nation").take_all()}
    reg = {r["r_regionkey"]: r["r_name"]
           for r in _read(sf_dir, "region").take_all()}
    n2r = {nk: reg[rk] for nk, rk in nat.items()}
    n2r_ref = ray.put(n2r)

    def cust_map(t: pa.Table, _ref=n2r_ref) -> pa.Table:
        m = ray.get(_ref)
        nk = t["c_nationkey"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(nk, return_inverse=True)
        names = np.asarray([m[int(x)] for x in uk])
        return pa.table(
            {"c_custkey": t["c_custkey"].cast(pa.int64()),
             "region": pa.array(names[inv])}
        )

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        cust_map, batch_format="pyarrow", zero_copy_batch=True
    )

    CUT = np.datetime64("1998-01-01").astype("datetime64[us]").astype(np.int64)

    def ord_proj(t: pa.Table) -> pa.Table:
        us = t["o_orderdate"].cast(pa.int64())
        keep = pc.less(us, pa.scalar(CUT))
        f = t.filter(keep)
        return pa.table(
            {"o_orderkey": f["o_orderkey"].cast(pa.int64()),
             "o_custkey": f["o_custkey"].cast(pa.int64())}
        )

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(ord_proj, batch_format="pyarrow", zero_copy_batch=True)

    oc = _semi_lookup_join(
        orders, "o_custkey", cust, "c_custkey", "region",
        out_key="o_orderkey",
    )  # → (o_orderkey, region)

    def li_proj(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        return pa.table(
            {"l_orderkey": t["l_orderkey"].cast(pa.int64()),
             "q": _e(rev, 10000)}
        )

    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"]
    ).map_batches(li_proj, batch_format="pyarrow", zero_copy_batch=True)

    joined = _semi_lookup_join(
        li, "l_orderkey", oc, "o_orderkey", "region", out_key="q"
    )  # → (q, region)

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("region").aggregate([("q", "sum"), ([], "count_all")])
        return pa.table(
            {"region": g["region"], "rev_e4": g["q_sum"].cast(pa.int64()),
             "n": g["count_all"].cast(pa.int64())}
        )

    return _rename(
        joined.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("region")
        .sum(["rev_e4", "n"]),
        ["region", "rev_e4", "n"],
    )


def q_multi_distinct_daily(sf_dir: str):
    """Multi-DISTINCT aggregate — COUNT(DISTINCT user_id) AND
    COUNT(DISTINCT event_type) per day, each from one pass of deduped
    partials (the classic hard case for single-shuffle engines). Users:
    per-batch distinct (day·2^33 + user) packed keys → ONE single-int
    groupby (packing contract: user_id < 2^33, asserted — wider id
    spaces would swap in the hash-bucket co-partition dedup the engine
    already uses for pair dedup). Types: per-batch distinct
    (day, type) string rows → a (days × vocab)-cardinality groupby.
    Both aggregates are day-scale; the driver merges two tiny tables —
    never row data."""
    ev = _read(sf_dir, "events", ["ts", "user_id", "event_type"])
    DAY_US = 86_400_000_000

    def upart(t: pa.Table) -> pa.Table:
        day = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False) // DAY_US
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        assert (u < (1 << 33)).all() and (u >= 0).all(), "packing contract"
        return pa.table({"k": pa.array(np.unique(day * (1 << 33) + u))})

    def tpart(t: pa.Table) -> pa.Table:
        day = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False) // DAY_US
        et = t["event_type"].to_numpy()
        types, code = np.unique(et, return_inverse=True)
        dt = np.unique(day * len(types) + code)
        return pa.table(
            {"day": pa.array(dt // len(types)),
             "event_type": pa.array(types[dt % len(types)])}
        )

    users = (
        ev.map_batches(upart, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("k").count()
        .map_batches(
            lambda t: pa.table(
                {"day": pc.shift_right(t["k"], pa.scalar(33)),
                 "one": pa.array(np.ones(len(t), np.int64))}
            ),
            batch_format="pyarrow",
        )
        .groupby("day").sum("one")
        .take_all()
    )  # day-scale
    types = (
        ev.map_batches(tpart, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["day", "event_type"]).count()
        .map_batches(
            lambda t: pa.table(
                {"day": t["day"], "one": pa.array(np.ones(len(t), np.int64))}
            ),
            batch_format="pyarrow",
        )
        .groupby("day").sum("one")
        .take_all()
    )
    nu = {r["day"]: r["sum(one)"] for r in users}
    nt = {r["day"]: r["sum(one)"] for r in types}
    days = sorted(nu)
    return pd.DataFrame(
        {
            "day": np.asarray(days, dtype=np.int64),
            "n_users": np.asarray([nu[d] for d in days], dtype=np.int64),
            "n_types": np.asarray([nt.get(d, 0) for d in days], dtype=np.int64),
        }
    )


QUERIES = {
    "pricing_summary": q_pricing_summary,
    "cust_nation_orders": q_cust_nation_orders,
    "broadcast_join_brand_revenue": q_broadcast_join_brand_revenue,
    "semi_join_date_filter": q_semi_join_date_filter,
    "left_join_customer_orders": q_left_join_customer_orders,
    "distinct_parts_per_flag": q_distinct_parts_per_flag,
    "exact_dedup_docs": q_exact_dedup_docs,
    "union_order_subsets": q_union_order_subsets,
    "topk_orders": q_topk_orders,
    "bucket_join_priority_revenue": q_bucket_join_priority_revenue,
    "user_sessions": q_user_sessions,
    "asof_clicks_views": q_asof_clicks_views,
    "followup_events": q_followup_events,
    "top_terms_docs": q_top_terms_docs,
    "tfidf_docs": q_tfidf_docs,
    "dup_span_docs": q_dup_span_docs,
    "rolling_window_user": q_rolling_window_user,
    "rollup_docs": q_rollup_docs,
    "pivot_docs": q_pivot_docs,
    "grouped_topk_users": q_grouped_topk_users,
    "corr_moments_docs": q_corr_moments_docs,
    "ntile_events": q_ntile_events,
    "right_join_orders_customer": q_right_join_orders_customer,
    "intersect_users": q_intersect_users,
    "except_users": q_except_users,
    "full_outer_customer_orders": q_full_outer_customer_orders,
    "jaccard_pairs_docs": q_jaccard_pairs_docs,
    "quantiles_events": q_quantiles_events,
    "quantiles_cont_events": q_quantiles_cont_events,
    "funnel_users": q_funnel_users,
    "cohort_retention_users": q_cohort_retention_users,
    "event_gap_stats_user": q_event_gap_stats_user,
    "last_event_user": q_last_event_user,
    "type_cooccurrence_users": q_type_cooccurrence_users,
    "pagerank_dups": q_pagerank_dups,
    "weighted_avg_lineitem": q_weighted_avg_lineitem,
    "embedding_cov_moments": q_embedding_cov_moments,
    "stopword_filter_docs": q_stopword_filter_docs,
    "kmeans_embeddings": q_kmeans_embeddings,
    "resampled_hourly_events": q_resampled_hourly_events,
    "mad_events": q_mad_events,
    "throttled_events": q_throttled_events,
    "grouping_sets_docs": q_grouping_sets_docs,
    "percent_rank_events": q_percent_rank_events,
    "top_bigrams_docs": q_top_bigrams_docs,
    "cm_user_counts": q_cm_user_counts,
    "train_split_docs": q_train_split_docs,
    "global_sort_orders": q_global_sort_orders,
    "ndjson_events_ingest": q_ndjson_events_ingest,
    "user_sequence_strings": q_user_sequence_strings,
    "winsorized_stats_events": q_winsorized_stats_events,
    "region_revenue": q_region_revenue,
    "multi_distinct_daily": q_multi_distinct_daily,
    "dedup_keep_canonical": q_dedup_keep_canonical,
    "union_by_name_orders": q_union_by_name_orders,
    "value_histogram_events": q_value_histogram_events,
    "hourly_activity_events": q_hourly_activity_events,
    "transition_counts_events": q_transition_counts_events,
    "mode_event_type_user": q_mode_event_type_user,
    "cube_docs": q_cube_docs,
    "skyline_orders": q_skyline_orders,
    "embedding_dim_stats": q_embedding_dim_stats,
    "grouped_quantiles_events": q_grouped_quantiles_events,
    "stratified_sample_events": q_stratified_sample_events,
    "dup_clusters_embeddings": q_dup_clusters_embeddings,
    "distinct_users_exact": q_distinct_users_exact,
    "hash_sample_docs": q_hash_sample_docs,
    "heavy_hitter_users": q_heavy_hitter_users,
    "image_resize": q_image_resize,
    "anti_join_customers": q_anti_join_customers,
    "sliding_window_events": q_sliding_window_events,
    "hll_distinct_users": q_hll_distinct_users,
    "hll_grouped_users": q_hll_grouped_users,
    "phash_neighbor_stats": q_phash_neighbor_stats,
    "event_props_stats": q_event_props_stats,
    "envelope_events": q_envelope_events,
    "cell_quantize_events": q_cell_quantize_events,
    "pip_triangle_docs": q_pip_triangle_docs,
    "spatial_grid_join_docs": q_spatial_grid_join_docs,
    "window_events": q_window_events,
    "doc_token_stats": q_doc_token_stats,
    "doc_stats_by_lang": q_doc_stats_by_lang,
    "knn_embeddings": q_knn_embeddings,
    # rows-only (non-SQL-expressible)
    "lang_id_docs": q_lang_id_docs,
    "fingerprint_docs": q_fingerprint_docs,
    "minhash_pairs_docs": q_minhash_pairs_docs,
    "simhash_docs": q_simhash_docs,
    "simhash_pairs_docs": q_simhash_pairs_docs,
    "embedding_dups": q_embedding_dups,
    "ivf_ann": q_ivf_ann,
    "tile_assignments": q_tile_assignments,
    "tile_knn": q_tile_knn,
    "tile_cell_counts": q_tile_cell_counts,
    "route_feature_collections": q_route_feature_collections,
    "tile_dissolve": q_tile_dissolve,
    "image_invariants": q_image_invariants,
    "image_channel_histogram": q_image_channel_histogram,
    "gtfs_stop_features": q_gtfs_stop_features,
    "gtfs_line_features": q_gtfs_line_features,
    "gtfs_envelope": q_gtfs_envelope,
    "gtfs_convex_hull": q_gtfs_convex_hull,
    "gtfs_buffer_stats": q_gtfs_buffer_stats,
    "gtfs_dissolved_stats": q_gtfs_dissolved_stats,
    "doc_quality": q_doc_quality,
    "image_embeddings": q_image_embeddings,
    "embedding_buckets": q_embedding_buckets,
}

ORACLE_SQL = {
    "asof_clicks_views": """
        WITH u AS (SELECT event_id, user_id, ts, event_type FROM events
                   WHERE event_type IN ('click', 'view')),
        m AS (
          SELECT event_id, event_type, ts,
                 last_value(CASE WHEN event_type = 'view' THEN event_id END
                            IGNORE NULLS) OVER w AS prior_view_id,
                 last_value(CASE WHEN event_type = 'view' THEN ts END
                            IGNORE NULLS) OVER w AS prior_ts
          FROM u
          WINDOW w AS (PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        SELECT event_id, CAST(prior_view_id AS BIGINT) AS prior_view_id,
               CAST(epoch_us(ts) - epoch_us(prior_ts) AS BIGINT) AS gap_us
        FROM m WHERE event_type = 'click' AND prior_view_id IS NOT NULL
    """,
    "top_terms_docs": """
        SELECT w AS token, count(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        WHERE w <> '' GROUP BY w
        ORDER BY n DESC, w LIMIT 20
    """,
    "tfidf_docs": """
        WITH nd AS (SELECT count(*) AS n FROM documents),
        w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
              FROM documents),
        wf AS (SELECT doc_id, token, count(*) AS tf FROM w
               WHERE token <> '' GROUP BY 1, 2),
        dfq AS (SELECT token, count(*) AS df FROM wf GROUP BY 1),
        sc AS (SELECT doc_id, wf.token, tf, df,
                      tf * ((1000000 * nd.n) // df) AS score
               FROM wf JOIN dfq USING (token) CROSS JOIN nd),
        r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, token) rn FROM sc)
        SELECT doc_id, token, tf, df, score FROM r WHERE rn <= 5
    """,
    "dup_span_docs": """
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                   FROM documents),
        g AS (SELECT DISTINCT doc_id,
                     array_to_string(list_slice(toks, i, i + 7), ' ') AS gram
              FROM t, unnest(generate_series(1, len(toks) - 7)) AS u(i)
              WHERE len(toks) >= 8),
        d AS (SELECT gram, count(*) AS nd FROM g GROUP BY 1)
        SELECT g.doc_id, count(*) AS n_grams,
               CAST(sum(CASE WHEN d.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_dup_grams
        FROM g JOIN d USING (gram) GROUP BY 1
    """,
    "rolling_window_user": """
        WITH q AS (SELECT event_id, user_id, ts,
                          CAST(floor(value * 10000 + 0.5) AS BIGINT) AS v
                   FROM events)
        SELECT event_id,
               CAST(sum(v) OVER w AS BIGINT) AS roll_sum_e4,
               count(*) OVER w AS roll_n,
               coalesce(lag(event_id) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id), -1) AS prev_event_id
        FROM q WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    "ntile_events": """
        SELECT event_id,
               CAST(ntile(4) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS BIGINT) AS tile
        FROM events
    """,
    "right_join_orders_customer": """
        WITH a AS (SELECT o_custkey ok, count(*) n FROM orders GROUP BY 1)
        SELECT c.c_custkey AS custkey, COALESCE(a.n, 0) AS n_orders
        FROM a RIGHT JOIN customer c ON c.c_custkey = a.ok
    """,
    "intersect_users": """
        SELECT user_id FROM events WHERE event_type = 'click'
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
    "except_users": """
        SELECT user_id FROM events
        WHERE event_type = 'click' AND value > 200
        EXCEPT
        SELECT user_id FROM events
        WHERE event_type = 'purchase' AND value > 200
    """,
    "multi_distinct_daily": """
        SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
               CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
        FROM events GROUP BY 1
    """,
    "region_revenue": """
        SELECT r.r_name AS region,
               CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                                   * 10000) AS BIGINT)) AS BIGINT) AS rev_e4,
               COUNT(*) AS n
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE o.o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY 1
    """,
    "winsorized_stats_events": """
        WITH s AS (SELECT value,
                          row_number() OVER (ORDER BY value) rn,
                          count(*) OVER () c
                   FROM events),
        lo AS (SELECT value AS v FROM s
               WHERE rn = CAST(ceil(0.05 * c) AS BIGINT)),
        hi AS (SELECT value AS v FROM s
               WHERE rn = CAST(ceil(0.95 * c) AS BIGINT))
        SELECT COUNT(*) AS n,
               CAST(COUNT(*) FILTER (e.value < lo.v) AS BIGINT) AS n_lo,
               CAST(COUNT(*) FILTER (e.value > hi.v) AS BIGINT) AS n_hi,
               CAST(SUM(CAST(round(LEAST(GREATEST(e.value, lo.v), hi.v)
                                   * 10000) AS BIGINT)) AS BIGINT)
                 AS sum_w_e4
        FROM events e, lo, hi
    """,
    "user_sequence_strings": """
        WITH r AS (SELECT user_id, event_type,
                          ROW_NUMBER() OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) AS rn
                   FROM events)
        SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS seq
        FROM r WHERE rn <= 10 GROUP BY user_id
    """,
    "global_sort_orders": """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 1000
    """,
    "ndjson_events_ingest": """
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(CAST(round(value * 10000) AS BIGINT)) AS BIGINT)
                 AS sum_value_e4
        FROM events GROUP BY event_type
    """,
    "train_split_docs": """
        WITH s AS (SELECT CASE WHEN b < 90 THEN 'train'
                               WHEN b < 95 THEN 'val'
                               ELSE 'test' END AS split, lang, n_chars
                   FROM (SELECT (doc_id * 2654435761 % 4294967296) % 100 AS b,
                                lang, n_chars
                         FROM documents))
        SELECT split, lang, COUNT(*) AS n,
               CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars
        FROM s GROUP BY 1, 2
    """,
    "top_bigrams_docs": """
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk
                   FROM documents),
        b AS (SELECT tk[CAST(u + 1 AS BIGINT)] || ' '
                     || tk[CAST(u + 2 AS BIGINT)] AS bigram
              FROM t, UNNEST(range(len(tk) - 1)) s(u)
              WHERE len(tk) > 1)
        SELECT bigram, COUNT(*) AS n FROM b GROUP BY bigram
        ORDER BY n DESC, bigram LIMIT 20
    """,
    "grouping_sets_docs": """
        SELECT CAST(grouping(lang) + 2 * grouping(source) AS BIGINT) AS gid,
               COALESCE(lang, '*') AS lang,
               COALESCE(source, '*') AS source,
               COUNT(*) AS n,
               CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars
        FROM documents GROUP BY GROUPING SETS ((lang), (source))
    """,
    "percent_rank_events": """
        SELECT event_id,
               CAST(RANK() OVER (PARTITION BY user_id ORDER BY value) - 1
                    AS BIGINT) AS pr_num,
               CAST(COUNT(*) OVER (PARTITION BY user_id) - 1 AS BIGINT)
                 AS pr_den
        FROM events
    """,
    "throttled_events": """
        WITH s AS (SELECT event_id, user_id, event_type,
                          epoch_us(ts) AS ts_us,
                          LAG(epoch_us(ts)) OVER (
                            PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS pt
                   FROM events)
        SELECT event_id, user_id, event_type, ts_us
        FROM s WHERE pt IS NULL OR ts_us - pt > 259200000000
    """,
    "union_by_name_orders": """
        SELECT o_orderkey, o_totalprice, 'NONE' AS o_orderpriority
        FROM orders WHERE o_orderstatus = 'F'
        UNION ALL
        SELECT o_orderkey, -1.0 AS o_totalprice, o_orderpriority
        FROM orders WHERE o_orderstatus = 'O'
    """,
    "mad_events": """
        WITH s AS (SELECT event_type, value,
                          row_number() OVER (PARTITION BY event_type
                                             ORDER BY value) rn,
                          count(*) OVER (PARTITION BY event_type) c
                   FROM events),
        m AS (SELECT event_type, value AS med FROM s
              WHERE rn = CAST(ceil(0.5 * c) AS BIGINT)),
        d AS (SELECT e.event_type, abs(e.value - m.med) AS av
              FROM events e JOIN m USING (event_type)),
        s2 AS (SELECT event_type, av,
                      row_number() OVER (PARTITION BY event_type
                                         ORDER BY av) rn,
                      count(*) OVER (PARTITION BY event_type) c
               FROM d),
        x AS (SELECT event_type, av AS mad FROM s2
              WHERE rn = CAST(ceil(0.5 * c) AS BIGINT))
        SELECT m.event_type, m.med, x.mad FROM m JOIN x USING (event_type)
    """,
    "resampled_hourly_events": """
        WITH h AS (SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hi,
                          COUNT(*) AS n
                   FROM events GROUP BY 1),
        lim AS (SELECT MIN(hi) AS lo, MAX(hi) AS hx FROM h),
        b AS (SELECT lo + CAST(u AS BIGINT) AS hi
              FROM lim, UNNEST(range(CAST(hx - lo + 1 AS BIGINT))) t(u)),
        f AS (SELECT b.hi, COALESCE(h.n, 0) AS n FROM b LEFT JOIN h USING (hi))
        SELECT hi, n,
               CAST(SUM(n) OVER (ORDER BY hi ROWS BETWEEN 2 PRECEDING
                                 AND CURRENT ROW) AS BIGINT) AS ma3
        FROM f
    """,
    "kmeans_embeddings": """
        WITH e AS (SELECT vec_id,
                          unnest(range(len(embedding))) AS dim,
                          CAST(trunc(CAST(unnest(embedding) AS DOUBLE)
                                     * 10000) AS BIGINT) AS q
                   FROM embeddings),
        c0 AS (SELECT DENSE_RANK() OVER (ORDER BY vec_id) - 1 AS k, dim,
                      q AS c
               FROM e WHERE vec_id IN (SELECT vec_id FROM embeddings
                                       ORDER BY vec_id LIMIT 8)),
        a1 AS (SELECT vec_id, k FROM (
                 SELECT e.vec_id, c0.k,
                        ROW_NUMBER() OVER (
                          PARTITION BY e.vec_id
                          ORDER BY SUM((e.q - c0.c) * (e.q - c0.c)),
                                   c0.k) AS rn
                 FROM e JOIN c0 USING (dim) GROUP BY e.vec_id, c0.k)
               WHERE rn = 1),
        c1 AS (SELECT a1.k, e.dim,
                      (SUM(e.q) - ((SUM(e.q) % COUNT(*)) + COUNT(*))
                                  % COUNT(*)) // COUNT(*) AS c
               FROM e JOIN a1 USING (vec_id) GROUP BY a1.k, e.dim),
        a2 AS (SELECT vec_id, k, d FROM (
                 SELECT e.vec_id, c1.k,
                        SUM((e.q - c1.c) * (e.q - c1.c)) AS d,
                        ROW_NUMBER() OVER (
                          PARTITION BY e.vec_id
                          ORDER BY SUM((e.q - c1.c) * (e.q - c1.c)),
                                   c1.k) AS rn
                 FROM e JOIN c1 USING (dim) GROUP BY e.vec_id, c1.k)
               WHERE rn = 1)
        SELECT vec_id, CAST(k AS BIGINT) AS cluster, CAST(d AS BIGINT) AS dist
        FROM a2
    """,
    "stopword_filter_docs": """
        SELECT doc_id,
               CAST(COUNT(*) FILTER (tok NOT IN ('the', 'a')) AS BIGINT)
                 AS n_tokens_clean,
               CAST(COALESCE(SUM(length(tok))
                             FILTER (tok NOT IN ('the', 'a')), 0) AS BIGINT)
                 AS n_chars_clean
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
              FROM documents)
        GROUP BY doc_id
    """,
    "value_histogram_events": """
        SELECT CAST(floor(value / 25.0) AS BIGINT) AS bin,
               COUNT(*) AS n
        FROM events GROUP BY 1
    """,
    "hourly_activity_events": """
        SELECT CAST(date_part('hour', ts) AS BIGINT) AS hour,
               COUNT(*) AS n,
               CAST(SUM(CAST(round(value * 10000) AS BIGINT)) AS BIGINT)
                 AS sum_value_e4
        FROM events GROUP BY 1
    """,
    "weighted_avg_lineitem": """
        SELECT l_returnflag,
               CAST(round(sum(l_extendedprice * l_quantity) * 100) AS BIGINT)
                 AS wsum_e2,
               CAST(round(sum(l_quantity)) AS BIGINT) AS wtot,
               count(*) AS n
        FROM lineitem GROUP BY l_returnflag
    """,
    "embedding_cov_moments": """
        WITH e AS (SELECT vec_id,
                          unnest(range(len(embedding))) AS i,
                          CAST(trunc(CAST(unnest(embedding) AS DOUBLE)
                                     * 10000) AS BIGINT) AS q
                   FROM embeddings)
        SELECT a.i AS i, b.i AS j, COUNT(*) AS n,
               CAST(SUM(a.q * b.q) AS BIGINT) AS s_ij,
               CAST(SUM(a.q) AS BIGINT) AS s_i,
               CAST(SUM(b.q) AS BIGINT) AS s_j
        FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
        GROUP BY 1, 2
    """,
    "pagerank_dups": """
        WITH pairs AS (
            SELECT a.vec_id AS a, b.vec_id AS b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) >= 0.35
        ),
        e AS (SELECT a AS u, b AS v FROM pairs
              UNION ALL SELECT b AS u, a AS v FROM pairs),
        deg AS (SELECT u, COUNT(*) AS d FROM e GROUP BY u),
        s1 AS (SELECT e.v AS node,
                      150000 + SUM((85 * 1000000) // (100 * deg.d)) AS s
               FROM e JOIN deg ON e.u = deg.u GROUP BY e.v),
        s2 AS (SELECT e.v AS node,
                      150000 + SUM((85 * s1.s) // (100 * deg.d)) AS s
               FROM e JOIN deg ON e.u = deg.u
                      JOIN s1 ON s1.node = e.u GROUP BY e.v),
        s3 AS (SELECT e.v AS node,
                      150000 + SUM((85 * s2.s) // (100 * deg.d)) AS s
               FROM e JOIN deg ON e.u = deg.u
                      JOIN s2 ON s2.node = e.u GROUP BY e.v)
        SELECT node, CAST(s AS BIGINT) AS score FROM s3
    """,
    "event_gap_stats_user": """
        WITH s AS (SELECT user_id, epoch_us(ts) AS t,
                          LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                                  ORDER BY ts, event_id) AS pt
                   FROM events)
        SELECT user_id, COUNT(*) AS n_gaps,
               CAST(MAX(t - pt) AS BIGINT) AS max_gap_us,
               CAST(SUM(t - pt) AS BIGINT) AS sum_gap_us
        FROM s WHERE pt IS NOT NULL GROUP BY user_id
    """,
    "last_event_user": """
        WITH r AS (SELECT user_id, event_type, event_id,
                          epoch_us(ts) AS t_us,
                          ROW_NUMBER() OVER (PARTITION BY user_id
                                             ORDER BY ts DESC,
                                                      event_id DESC) AS rn
                   FROM events)
        SELECT user_id, event_type AS last_type, t_us AS last_ts_us,
               event_id AS last_event_id
        FROM r WHERE rn = 1
    """,
    "type_cooccurrence_users": """
        WITH d AS (SELECT DISTINCT user_id, event_type FROM events)
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               COUNT(*) AS n_users
        FROM d a JOIN d b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
    """,
    "cohort_retention_users": """
        WITH wk AS (SELECT user_id,
                           CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS w
                    FROM events),
        fw AS (SELECT user_id, MIN(w) AS cw FROM wk GROUP BY user_id),
        uw AS (SELECT DISTINCT wk.user_id, fw.cw, wk.w - fw.cw AS offs
               FROM wk JOIN fw USING (user_id))
        SELECT cw AS cohort_week, offs AS week_offset,
               COUNT(*) AS n_users
        FROM uw GROUP BY 1, 2
    """,
    "transition_counts_events": """
        WITH s AS (SELECT user_id, event_type,
                          LAG(event_type) OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id) AS prev
                   FROM events)
        SELECT prev AS prev_type, event_type AS next_type,
               COUNT(*) AS n
        FROM s WHERE prev IS NOT NULL GROUP BY 1, 2
    """,
    "mode_event_type_user": """
        WITH c AS (SELECT user_id, event_type, COUNT(*) AS n
                   FROM events GROUP BY 1, 2),
        r AS (SELECT user_id, event_type, n,
                     ROW_NUMBER() OVER (PARTITION BY user_id
                                        ORDER BY n DESC, event_type ASC) AS rn
              FROM c)
        SELECT user_id, event_type AS mode_type, n AS n_events
        FROM r WHERE rn = 1
    """,
    "cube_docs": """
        SELECT CAST(grouping(lang) + 2 * grouping(source) AS BIGINT) AS gid,
               COALESCE(lang, '*') AS lang,
               COALESCE(source, '*') AS source,
               COUNT(*) AS n,
               CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars
        FROM documents GROUP BY CUBE(lang, source)
    """,
    "skyline_orders": """
        SELECT a.o_orderkey, a.o_totalprice,
               epoch_us(a.o_orderdate) AS o_date_us
        FROM orders a
        WHERE NOT EXISTS (
          SELECT 1 FROM orders b
          WHERE b.o_totalprice >= a.o_totalprice
            AND b.o_orderdate <= a.o_orderdate
            AND (b.o_totalprice > a.o_totalprice
                 OR b.o_orderdate < a.o_orderdate))
    """,
    "embedding_dim_stats": """
        WITH e AS (SELECT unnest(range(len(embedding))) AS dim,
                          unnest(embedding) AS v
                   FROM embeddings)
        SELECT dim, CAST(MIN(v) AS DOUBLE) AS vmin,
               CAST(MAX(v) AS DOUBLE) AS vmax,
               CAST(SUM(CASE WHEN v > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
               COUNT(*) AS n
        FROM e GROUP BY dim
    """,
    "funnel_users": """
        WITH v AS (SELECT user_id, min(epoch_us(ts)) t_v FROM events
                   WHERE event_type = 'view' GROUP BY 1),
        c AS (SELECT e.user_id, min(epoch_us(e.ts)) t_c
              FROM events e JOIN v ON v.user_id = e.user_id
              WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t_v
              GROUP BY 1),
        p AS (SELECT e.user_id, min(epoch_us(e.ts)) t_p
              FROM events e JOIN c ON c.user_id = e.user_id
              WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t_c
              GROUP BY 1)
        SELECT v.user_id, t_v AS t_view_us, t_c AS t_click_us,
               t_p AS t_purchase_us
        FROM v JOIN c USING (user_id) JOIN p USING (user_id)
    """,
    "quantiles_cont_events": """
        WITH s AS (SELECT value, row_number() OVER (ORDER BY value) rn,
                          count(*) OVER () n
                   FROM events),
        qs(q_pct) AS (VALUES (50), (90)),
        calc AS (SELECT q_pct,
                        (SELECT any_value(n) FROM s) AS n,
                        ((SELECT any_value(n) FROM s) - 1) * q_pct AS num
                 FROM qs),
        rk AS (SELECT q_pct, num // 100 + 1 AS lo_rn,
                      num // 100 + 1 +
                        (CASE WHEN num % 100 = 0 THEN 0 ELSE 1 END) AS hi_rn,
                      (num % 100) * 1000000 // 100 AS frac_e6
               FROM calc)
        SELECT CAST(q_pct AS BIGINT) AS q_pct,
               lo.value AS lo_value, hi.value AS hi_value,
               CAST(frac_e6 AS BIGINT) AS frac_e6
        FROM rk JOIN s lo ON lo.rn = rk.lo_rn
                JOIN s hi ON hi.rn = rk.hi_rn
    """,
    "grouped_topk_users": """
        WITH s AS (
          SELECT event_type, user_id,
                 CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT))
                      AS BIGINT) AS sum_v_e4
          FROM events GROUP BY 1, 2),
        r AS (SELECT *, row_number() OVER (PARTITION BY event_type
                        ORDER BY sum_v_e4 DESC, user_id) rn FROM s)
        SELECT event_type, user_id, sum_v_e4 FROM r WHERE rn <= 3
    """,
    "corr_moments_docs": """
        SELECT lang, count(*) AS n,
               CAST(sum(x) AS BIGINT) AS sum_x,
               CAST(sum(y) AS BIGINT) AS sum_y,
               CAST(sum(x * y) AS BIGINT) AS sum_xy,
               CAST(sum(x * x) AS BIGINT) AS sum_x2,
               CAST(sum(y * y) AS BIGINT) AS sum_y2
        FROM (SELECT lang,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS x,
                     CAST(length(text) AS BIGINT) AS y
              FROM documents)
        GROUP BY lang
    """,
    "pivot_docs": """
        SELECT source,
               count(*) FILTER (lang = 'de') AS n_de,
               count(*) FILTER (lang = 'en') AS n_en,
               count(*) FILTER (lang = 'es') AS n_es,
               count(*) FILTER (lang = 'fr') AS n_fr,
               count(*) FILTER (lang = 'zh') AS n_zh
        FROM documents GROUP BY source
    """,
    "rollup_docs": """
        SELECT CAST(GROUPING(lang) + GROUPING(source) AS BIGINT) AS lvl,
               COALESCE(lang, '*') AS lang, COALESCE(source, '*') AS source,
               count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sum_n_chars
        FROM documents GROUP BY ROLLUP (lang, source)
    """,
    "full_outer_customer_orders": """
        WITH o AS (SELECT o_custkey ck, count(*) n FROM orders
                   WHERE o_orderstatus = 'O' GROUP BY 1),
             f AS (SELECT o_custkey ck, count(*) n FROM orders
                   WHERE o_orderstatus = 'F' GROUP BY 1)
        SELECT COALESCE(o.ck, f.ck) AS custkey,
               COALESCE(o.n, 0) AS n_open, COALESCE(f.n, 0) AS n_fin
        FROM o FULL OUTER JOIN f ON f.ck = o.ck
    """,
    "followup_events": """
        SELECT l.event_id,
               count(*) AS n_follow,
               min(epoch_us(r.ts) - epoch_us(l.ts)) AS min_gap_us
        FROM events l JOIN events r
          ON r.user_id = l.user_id
         AND epoch_us(r.ts) - epoch_us(l.ts) BETWEEN 1 AND 3600000000
        WHERE l.event_type = 'click'
        GROUP BY l.event_id
    """,
    "jaccard_pairs_docs": """
        WITH w AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS w,
                 generate_subscripts(string_split(text, ' '), 1) AS i
          FROM documents
        ),
        sh AS (
          SELECT DISTINCT a.doc_id,
                 a.w || ' ' || b.w || ' ' || c.w || ' ' || d.w AS g
          FROM w a JOIN w b ON b.doc_id = a.doc_id AND b.i = a.i + 1
                   JOIN w c ON c.doc_id = a.doc_id AND c.i = a.i + 2
                   JOIN w d ON d.doc_id = a.doc_id AND d.i = a.i + 3
        ),
        sz AS (SELECT doc_id, count(*) s FROM sh GROUP BY 1),
        pr AS (SELECT a.doc_id d1, b.doc_id d2, count(*) inter
               FROM sh a JOIN sh b USING (g)
               WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
        SELECT d1, d2, inter, (sa.s + sb.s - inter) AS uni,
               (inter * 1000000) // (sa.s + sb.s - inter) AS jacc_e6
        FROM pr JOIN sz sa ON sa.doc_id = pr.d1
                JOIN sz sb ON sb.doc_id = pr.d2
        WHERE 2 * inter >= (sa.s + sb.s - inter)
    """,
    "grouped_quantiles_events": """
        WITH s AS (SELECT event_type, value,
                          row_number() OVER (PARTITION BY event_type
                                             ORDER BY value) rn,
                          count(*) OVER (PARTITION BY event_type) c
                   FROM events),
        qs(q_pct, q) AS (VALUES (50, CAST(0.5 AS DOUBLE)),
                                (95, CAST(0.95 AS DOUBLE)))
        SELECT s.event_type AS "group", CAST(q_pct AS BIGINT) AS q_pct,
               s.value AS value
        FROM qs JOIN s ON s.rn = CAST(ceil(q * s.c) AS BIGINT)
    """,
    "stratified_sample_events": """
        SELECT event_id, event_type, user_id FROM (
            SELECT event_id, event_type, user_id,
                   row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY (event_id * 2654435761 % 4294967296), event_id
                   ) AS rn
            FROM events) WHERE rn <= 100
    """,
    "quantiles_events": """
        WITH s AS (SELECT value, row_number() OVER (ORDER BY value) rn
                   FROM events),
        n AS (SELECT count(*) c FROM events),
        qs(q_pct, q) AS (VALUES (25, CAST(0.25 AS DOUBLE)),
                                (50, CAST(0.5 AS DOUBLE)),
                                (75, CAST(0.75 AS DOUBLE)),
                                (95, CAST(0.95 AS DOUBLE)),
                                (99, CAST(0.99 AS DOUBLE)))
        SELECT CAST(q_pct AS BIGINT) AS q_pct, s.value AS value
        FROM qs, n JOIN s ON s.rn = CAST(ceil(q * n.c) AS BIGINT)
    """,
    "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(round(sum(l_quantity) * 100) AS BIGINT) AS sum_qty_e2,
               CAST(round(sum(l_extendedprice * (1 - l_discount)) * 10000) AS BIGINT) AS sum_rev_e4,
               count(*) AS n
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1995-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "cust_nation_orders": """
        SELECT o.o_custkey AS custkey,
               count(*) AS n_orders,
               CAST(round(sum(o.o_totalprice) * 100) AS BIGINT) AS total_e2,
               c.c_name AS c_name,
               n.n_name AS nation
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY o.o_custkey, c.c_name, n.n_name
    """,
    "broadcast_join_brand_revenue": """
        SELECT p.p_brand AS p_brand,
               CAST(round(sum(l.l_extendedprice * (1 - l.l_discount)) * 10000) AS BIGINT) AS revenue_e4,
               count(*) AS n
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY p.p_brand
    """,
    "semi_join_date_filter": """
        SELECT count(*) AS n_items,
               CAST(round(sum(l_quantity) * 100) AS BIGINT) AS sum_qty_e2
        FROM lineitem
        WHERE l_orderkey IN (
            SELECT o_orderkey FROM orders
            WHERE o_orderdate >= TIMESTAMP '1995-01-01'
              AND o_orderdate < TIMESTAMP '1996-01-01')
    """,
    "left_join_customer_orders": """
        SELECT c.c_custkey AS custkey, count(o.o_custkey) AS n_orders
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
    """,
    "distinct_parts_per_flag": """
        SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts
        FROM lineitem GROUP BY l_returnflag
    """,
    "exact_dedup_docs": """
        SELECT text, min(doc_id) AS doc_id FROM documents GROUP BY text
    """,
    "union_order_subsets": """
        SELECT o_orderstatus, count(*) AS n FROM (
            SELECT o_orderstatus FROM orders WHERE o_totalprice > 200000
            UNION ALL
            SELECT o_orderstatus FROM orders WHERE o_totalprice < 50000
        ) GROUP BY o_orderstatus
    """,
    "topk_orders": """
        SELECT o_orderkey, o_totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
    "bucket_join_priority_revenue": """
        SELECT o.o_orderpriority AS o_orderpriority,
               CAST(round(sum(l.l_extendedprice * (1 - l.l_discount)) * 10000) AS BIGINT) AS revenue_e4,
               count(*) AS n
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_orderpriority
    """,
    "hash_sample_docs": """
        SELECT doc_id, n_chars FROM documents
        WHERE (doc_id * 2654435761 % 4294967296) % 10 = 0
    """,
    "event_props_stats": """
        SELECT event_type,
               CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               count(*) AS n
        FROM events GROUP BY event_type
    """,
    "anti_join_customers": """
        SELECT c_custkey, c_mktsegment FROM customer
        WHERE c_custkey NOT IN (
            SELECT o_custkey FROM orders WHERE o_totalprice > 350000)
    """,
    "sliding_window_events": """
        SELECT event_type, w, count(*) AS n,
               CAST(round(sum(value) * 100) AS BIGINT) AS sum_value_e2
        FROM (
            SELECT event_type, value,
                   CAST(floor(epoch(ts) / 300) AS BIGINT) AS w FROM events
            UNION ALL
            SELECT event_type, value,
                   CAST(floor(epoch(ts) / 300) AS BIGINT) - 1 AS w FROM events
        )
        WHERE w >= 0
        GROUP BY event_type, w
    """,
    "user_sessions": """
        SELECT user_id, count(*) AS n_sessions FROM (
            SELECT user_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ) WHERE is_new = 1 GROUP BY user_id
    """,
    "envelope_events": """
        SELECT min(value) AS min_x, max(value) AS max_x,
               min(CAST(user_id AS DOUBLE)) AS min_y,
               max(CAST(user_id AS DOUBLE)) AS max_y
        FROM events
    """,
    "cell_quantize_events": """
        SELECT CAST(floor(value / 5.0) AS BIGINT) AS ix,
               CAST(user_id // 10 AS BIGINT) AS iy,
               count(*) AS n
        FROM events GROUP BY 1, 2
    """,
    "pip_triangle_docs": """
        WITH pts AS (
            SELECT doc_id,
                   (doc_id * 2654435761 % 4294967296) / 4294967296.0 * 10.0 AS x,
                   ((doc_id * 40503 + 7) % 65536) / 65536.0 * 10.0 AS y
            FROM documents)
        SELECT doc_id FROM pts
        WHERE (9.0-1.0)*(y-1.0) - (2.0-1.0)*(x-1.0) > 0
          AND (5.0-9.0)*(y-2.0) - (9.0-2.0)*(x-9.0) > 0
          AND (1.0-5.0)*(y-9.0) - (1.0-9.0)*(x-5.0) > 0
    """,
    "spatial_grid_join_docs": """
        WITH pts AS (
            SELECT doc_id,
                   (doc_id * 2654435761 % 4294967296) / 4294967296.0 * 10.0 AS x,
                   ((doc_id * 40503 + 7) % 65536) / 65536.0 * 10.0 AS y
            FROM documents)
        SELECT CAST(floor(x) AS BIGINT) AS ix, CAST(floor(y) AS BIGINT) AS iy,
               count(*) AS n
        FROM pts GROUP BY 1, 2
    """,
    "window_events": """
        SELECT event_type,
               CAST(floor(epoch(ts) / 300) AS BIGINT) AS w,
               count(*) AS n,
               CAST(round(sum(value) * 100) AS BIGINT) AS sum_value_e2
        FROM events GROUP BY 1, 2
    """,
    "distinct_users_exact": """
        SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_users FROM events
    """,
    "heavy_hitter_users": """
        SELECT user_id, n, TRUE AS mg_found FROM (
            SELECT user_id, CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY user_id
            ORDER BY n DESC, user_id ASC LIMIT 10)
    """,
    "doc_token_stats": """
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               len(list_filter(string_split(text, ' '),
                   x -> x IN ('the','and','of','a','to','in','is','it'))) AS n_stopwords,
               len(regexp_extract_all(text, '[\\.,;:!\\?]')) AS n_punct
        FROM documents
    """,
    "doc_stats_by_lang": """
        SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents GROUP BY lang
    """,
    "knn_embeddings": """
        WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
                   FROM embeddings WHERE vec_id < 5),
             s AS (SELECT q.qid AS query_id, e.vec_id AS vec_id,
                          round(list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])), 6) AS cosine,
                          row_number() OVER (
                              PARTITION BY q.qid
                              ORDER BY round(list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])), 6) DESC,
                                       e.vec_id ASC) AS rn
                   FROM q CROSS JOIN embeddings e
                   WHERE e.vec_id <> q.qid)
        SELECT query_id, vec_id,
               CAST(round(cosine * 1000000) AS BIGINT) AS cosine_e6,
               CAST(rn - 1 AS BIGINT) AS rank
        FROM s WHERE rn <= 3
    """,
}


# ---------------------------------------------------------------------------
# DuckDB oracles for the flagship graft queries (driver CORRECTNESS gate)
#
# The synth image parquet materializes the derived (lon, lat) georef as
# columns (geotile/synth.py make_image_batch), and two tiny sidecars are
# written under GEOTILE_CACHE:
#   oracle_route_edges.parquet    — every edge of every route-buffer
#       polygon ring (pip._edges layout), keyed (poly_id, route_id)
#   oracle_route_segments.parquet — RDP-simplified centerline segments
#       in the kNN meter frame, with precomputed (dx, dy, inv_l2)
#       mirroring geom/pip.points_to_polyline_distance
# so pure ANSI SQL can replay the even-odd PIP join, the Morton cell
# encode (bit ops), the coarse cell counts, and the k-nearest-route
# distances with DOUBLE arithmetic in the SAME operation order as the
# numpy kernels (bit-identical results, verified in tests).
# ---------------------------------------------------------------------------

_MORTON_MASKS = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def _sql_spread(expr: str) -> str:
    """SQL mirror of geom.cells._spread (bit-interleave prep)."""
    for shift, mask in _MORTON_MASKS:
        expr = f"(({expr} | ({expr} << {shift})) & {mask})"
    return expr


def _sql_quant(col: str, off: str, span: str, res: int) -> str:
    """SQL mirror of geom.cells._quantize for one axis: floor in DOUBLE
    with numpy's exact operation order, clamp, cast."""
    n = 1 << res
    return (
        f"CAST(least(greatest(floor(({col} + {off}) / {span} * {float(n)!r}), 0.0), "
        f"{float(n - 1)!r}) AS BIGINT)"
    )


def _sql_cell(lon: str, lat: str, res: int) -> str:
    """SQL mirror of geom.cells.encode (int64 view of the uint64 id)."""
    ix = _sql_quant(lon, "180.0", "360.0", res)
    iy = _sql_quant(lat, "90.0", "180.0", res)
    return f"(({_sql_spread(ix)} | ({_sql_spread(iy)} << 1)) | {res << 58})"


def _oracle_cache_dir():
    import os
    from pathlib import Path

    return Path(os.environ.get("GEOTILE_CACHE", "/tmp/geotile_cache"))


def _atomic_write_table(t: pa.Table, path) -> None:
    import os

    import pyarrow.parquet as pq

    tmp = path.with_suffix(f".tmp-{os.getpid()}")
    pq.write_table(t, tmp)
    tmp.rename(path)


def _oracle_edges_path() -> str:
    """Sidecar: route-buffer polygon edges, exactly as pip._edges builds
    them from build_route_index's ring list ([outer] + holes).
    Content-keyed on the geometry-module digest (ADVICE r2)."""
    p = _oracle_cache_dir() / f"oracle_route_edges_{_geom_digest()}.parquet"
    if not p.exists():
        from geotile.config import PipelineConfig
        from geotile.geom.pip import _edges
        from geotile.ops.join import route_buffer_polygons

        polys = route_buffer_polygons(_fixture_ctx(), PipelineConfig(coordinate_precision=5))
        pid = 0
        cols = {"poly_id": [], "route_id": [], "x1": [], "y1": [], "x2": [], "y2": []}
        for rid in sorted(polys):
            for outer, holes in polys[rid]:
                x1, y1, x2, y2 = _edges([outer] + list(holes))
                cols["poly_id"].append(np.full(len(x1), pid, dtype=np.int64))
                cols["route_id"].extend([rid] * len(x1))
                cols["x1"].append(x1)
                cols["y1"].append(y1)
                cols["x2"].append(x2)
                cols["y2"].append(y2)
                pid += 1
        t = pa.table(
            {
                "poly_id": pa.array(np.concatenate(cols["poly_id"])),
                "route_id": pa.array(cols["route_id"], pa.string()),
                **{k: pa.array(np.concatenate(cols[k])) for k in ("x1", "y1", "x2", "y2")},
            }
        )
        _atomic_write_table(t, p)
    return str(p)


def _oracle_segments_path() -> str:
    """Sidecar: kNN centerline segments in the meter frame with the same
    precomputation as points_to_polyline_distance (ax/ay, dx/dy,
    inv_l2 with the L2==0 -> 1.0 substitution). Content-keyed."""
    p = _oracle_cache_dir() / f"oracle_route_segments_{_geom_digest()}.parquet"
    if not p.exists():
        from geotile.geom.buffer import meter_frame
        from geotile.ops.join import _ANCHOR_LAT, _ANCHOR_LON, route_polylines

        mx, my = meter_frame(_ANCHOR_LAT)
        lines = route_polylines(_fixture_ctx())
        cols = {"route_id": [], "ax": [], "ay": [], "dx": [], "dy": [], "inv_l2": []}
        for rid in sorted(lines):
            for part in lines[rid]:
                assert len(part) >= 2, "single-point centerline part"
                m = np.column_stack(
                    [(part[:, 0] - _ANCHOR_LON) * mx, (part[:, 1] - _ANCHOR_LAT) * my]
                )
                ax, ay = m[:-1, 0], m[:-1, 1]
                dx, dy = m[1:, 0] - ax, m[1:, 1] - ay
                L2 = dx * dx + dy * dy
                L2 = np.where(L2 == 0.0, 1.0, L2)
                cols["route_id"].extend([rid] * len(ax))
                cols["ax"].append(ax)
                cols["ay"].append(ay)
                cols["dx"].append(dx)
                cols["dy"].append(dy)
                cols["inv_l2"].append(1.0 / L2)
        t = pa.table(
            {
                "route_id": pa.array(cols["route_id"], pa.string()),
                **{
                    k: pa.array(np.concatenate(cols[k]))
                    for k in ("ax", "ay", "dx", "dy", "inv_l2")
                },
            }
        )
        _atomic_write_table(t, p)
    return str(p)


def tile_oracle_sql(sf_dir: str) -> dict[str, str]:
    """Build the DuckDB oracle SQL for the graft flagship queries over
    ``sf_dir``'s synthesized image table. Materializes the image parquet
    and the two sidecars first (idempotent, cached)."""
    from geotile.ops.join import DEFAULT_JOIN_RES, _ANCHOR_LAT, _ANCHOR_LON
    from geotile.geom.buffer import meter_frame

    img = _image_dir_for(sf_dir)
    edges = _oracle_edges_path()
    segs = _oracle_segments_path()
    mx, my = meter_frame(_ANCHOR_LAT)
    cell18 = _sql_cell("p.lon", "p.lat", DEFAULT_JOIN_RES)
    cell12 = _sql_cell("lon", "lat", 12)

    assignments = f"""
        WITH pts AS (SELECT image_id, caption, lon, lat
                     FROM read_parquet('{img}/part-*.parquet')),
        par AS (
            SELECT p.image_id, e.poly_id, e.route_id
            FROM pts p JOIN read_parquet('{edges}') e
              ON ((e.y1 > p.lat) <> (e.y2 > p.lat))
             AND (p.lon < e.x1 + (p.lat - e.y1) * (e.x2 - e.x1) / (e.y2 - e.y1))
            GROUP BY p.image_id, e.poly_id, e.route_id
            HAVING count(*) % 2 = 1
        ),
        sel AS (SELECT DISTINCT image_id, route_id FROM par)
        SELECT s.image_id, s.route_id, {cell18} AS cell, p.caption
        FROM sel s JOIN pts p USING (image_id)
    """
    cell_counts = f"""
        SELECT {cell12} AS cell, count(*) AS n_tiles
        FROM read_parquet('{img}/part-*.parquet')
        GROUP BY 1
    """
    route_fcs = f"""
        WITH pts AS (SELECT image_id, lon, lat
                     FROM read_parquet('{img}/part-*.parquet')),
        par AS (
            SELECT p.image_id, e.poly_id, e.route_id
            FROM pts p JOIN read_parquet('{edges}') e
              ON ((e.y1 > p.lat) <> (e.y2 > p.lat))
             AND (p.lon < e.x1 + (p.lat - e.y1) * (e.x2 - e.x1) / (e.y2 - e.y1))
            GROUP BY p.image_id, e.poly_id, e.route_id
            HAVING count(*) % 2 = 1
        )
        SELECT route_id, count(DISTINCT image_id) AS n_tiles
        FROM par GROUP BY route_id
    """
    knn = f"""
        WITH p AS (SELECT image_id,
                          (lon - ({_ANCHOR_LON!r})) * {mx!r} AS px,
                          (lat - ({_ANCHOR_LAT!r})) * {my!r} AS py
                   FROM read_parquet('{img}/part-*.parquet')),
        ps AS (
            SELECT p.image_id, s.route_id, p.px, p.py, s.ax, s.ay, s.dx, s.dy,
                   greatest(0.0, least(1.0,
                       ((p.px - s.ax) * s.dx + (p.py - s.ay) * s.dy) * s.inv_l2)) AS t
            FROM p CROSS JOIN read_parquet('{segs}') s
        ),
        d AS (
            SELECT image_id, route_id,
                   min(((px - ax) - t * dx) * ((px - ax) - t * dx)
                     + ((py - ay) - t * dy) * ((py - ay) - t * dy)) AS d2
            FROM ps GROUP BY image_id, route_id
        ),
        r AS (
            SELECT image_id, route_id, sqrt(d2) AS dist_m,
                   row_number() OVER (
                       PARTITION BY image_id ORDER BY sqrt(d2), route_id) AS rn
            FROM d
        )
        SELECT image_id, CAST(rn - 1 AS INTEGER) AS rank, route_id, dist_m
        FROM r WHERE rn <= 2
    """
    return {
        "tile_covered_cells": _covered_cells_sql(img),
        "tile_assignments": assignments,
        "tile_cell_counts": cell_counts,
        "route_feature_collections": route_fcs,
        "tile_knn": knn,
        "tile_dissolve": _tile_dissolve_sql(img),
    }


def oracle_sql() -> dict[str, str]:
    """Full oracle dict for the driver: the static SQL-view oracles plus
    the generated tile oracles at the driver's correctness sf (0.01)."""
    out = dict(ORACLE_SQL)
    out.update(tile_oracle_sql("/root/testdata/sf0.01"))
    out["doc_quality"] = DOC_QUALITY_SQL
    out["embedding_dups"] = EMBEDDING_DUPS_SQL
    out["dup_clusters_embeddings"] = f"""
        WITH RECURSIVE pairs AS ({EMBEDDING_DUPS_SQL}),
        e AS (SELECT a AS u, b AS v FROM pairs
              UNION SELECT b, a FROM pairs),
        walk(u, lbl) AS (
            SELECT u, u FROM (SELECT DISTINCT u FROM e)
            UNION
            SELECT e.u, w.lbl FROM e JOIN walk w ON w.u = e.v
        )
        SELECT u AS node, min(lbl) AS cluster_id FROM walk GROUP BY u
    """
    out["dedup_keep_canonical"] = f"""
        WITH RECURSIVE pairs AS ({EMBEDDING_DUPS_SQL}),
        e AS (SELECT a AS u, b AS v FROM pairs
              UNION SELECT b, a FROM pairs),
        walk(u, lbl) AS (
            SELECT u, u FROM (SELECT DISTINCT u FROM e)
            UNION
            SELECT e.u, w.lbl FROM e JOIN walk w ON w.u = e.v
        ),
        cc AS (SELECT u AS node, min(lbl) AS cluster_id FROM walk GROUP BY u)
        SELECT vec_id FROM embeddings
        WHERE vec_id NOT IN (SELECT node FROM cc)
        UNION ALL
        SELECT node AS vec_id FROM cc WHERE node = cluster_id
    """
    out["embedding_buckets"] = _embedding_buckets_sql()
    out["lang_id_docs"] = _lang_id_sql()
    img01 = _image_dir_for("/root/testdata/sf0.01")
    out["image_invariants"] = _image_invariants_sql(img01)
    out["image_channel_histogram"] = _image_hist_sql(img01)
    out["image_patch_sums"] = _image_patch_sql(img01)
    out["fmt_size_association"] = f"""
        WITH cell AS (SELECT fmt,
                             CASE WHEN w * h >= 1024 THEN 1 ELSE 0 END
                               AS size_class,
                             count(*) AS n
                      FROM read_parquet('{img01}/part-*.parquet')
                      GROUP BY 1, 2),
        m AS (SELECT *, SUM(n) OVER (PARTITION BY fmt) AS r,
                     SUM(n) OVER (PARTITION BY size_class) AS c,
                     SUM(n) OVER () AS nn
              FROM cell)
        SELECT fmt, CAST(size_class AS BIGINT) AS size_class,
               CAST(n AS BIGINT) AS n,
               CAST(n * nn - r * c AS BIGINT) AS dev
        FROM m
    """
    out["caption_stop_stats"] = f"""
        SELECT fmt,
               CAST(string_split(caption, ' ')[5] AS BIGINT) // 4
                 AS stop_bucket,
               count(*) AS n, CAST(SUM(w * h) AS BIGINT) AS sum_px
        FROM read_parquet('{img01}/part-*.parquet') GROUP BY 1, 2
    """
    out["image_embeddings"] = _image_embeddings_sql(img01)
    out["tile_pyramid_counts"] = _tile_pyramid_sql(img01)
    out["caption_geo_consistency"] = _caption_geo_sql(img01)
    out["image_resize"] = f"""
        SELECT image_id, CAST(8 AS BIGINT) AS w, CAST(8 AS BIGINT) AS h,
               TRUE AS mean_ok
        FROM read_parquet('{img01}/part-*.parquet')
        ORDER BY image_id LIMIT 256
    """
    out["gtfs_stop_features"] = _gtfs_stop_features_sql()
    out["gtfs_envelope"] = _gtfs_envelope_sql()
    out["gtfs_line_features"] = _gtfs_line_features_sql()
    out["gtfs_convex_hull"] = _gtfs_convex_hull_sql()
    out["gtfs_buffer_stats"] = _gtfs_buffer_stats_sql()
    out["gtfs_dissolved_stats"] = _gtfs_dissolved_stats_sql()
    sf01 = "/root/testdata/sf0.01"
    out["fingerprint_docs"] = _fingerprint_sql(sf01)
    out["simhash_docs"] = _simhash_sql(sf01)
    out["simhash_pairs_docs"] = _simhash_pairs_sql(sf01)
    out["minhash_pairs_docs"] = _minhash_pairs_sql(sf01)
    out["hll_distinct_users"] = _hll_sql(sf01)
    out["cm_user_counts"] = _cm_sql(sf01)
    out["hll_grouped_users"] = _hll_grouped_sql(sf01)
    out["phash_neighbor_stats"] = _phash_neighbor_sql(img01)
    out["image_dup_clusters"] = _image_dup_clusters_sql(img01)
    out["ivf_ann"] = _IVF_ANN_SQL
    out["image_glcm_energy"] = _image_glcm_sql(img01)
    aud01 = _audio_dir_for("/root/testdata/sf0.01")
    out["audio_frame_energy"] = _audio_energy_sql(aud01)
    out["audio_silence_runs"] = _audio_silence_sql(aud01)
    out["tile_autocorr_cells"] = _spatial_autocorr_sql(img01)
    out["tile_stop_hulls"] = _stop_hulls_sql(img01)
    out["audio_autocorr_tracks"] = _audio_autocorr_sql(aud01)
    out["tile_viewport_query"] = _tile_viewport_sql(img01)
    out["image_median_gray"] = _image_median_sql(img01)
    out["tile_corridor_query"] = _tile_corridor_sql(img01)
    out["cell_dominant_stop"] = _cell_dominant_sql(img01)
    out["segment_octants_routes"] = _segment_octants_sql()
    out["video_frame_sums"] = _video_sums_sql(
        _video_dir_for("/root/testdata/sf0.01"))
    out["lang_confusion_matrix"] = _lang_confusion_sql()
    out["crossmodal_pairing_audit"] = _crossmodal_sql(
        img01, _audio_dir_for("/root/testdata/sf0.01"))
    out["image_center_bias"] = _image_center_bias_sql(img01)
    out["stop_spacing_legs"] = _stop_spacing_sql()
    out["route_overlap_matrix"] = _route_overlap_sql("/root/testdata/sf0.01")
    out["audio_half_drift"] = _audio_half_drift_sql(aud01)
    out["stop_hull_area_parts"] = _stop_hull_area_sql(img01)
    out["dup_degree_hist"] = _dup_degree_sql(sf01)
    out["stop_bbox_iou_pairs"] = _stop_bbox_iou_sql(img01)
    out["phash_popcount_stats"] = _phash_popcount_sql(img01)
    out["audio_zcr_tracks"] = _audio_zcr_sql(aud01)
    out["video_motion_energy"] = _video_motion_sql(
        _video_dir_for("/root/testdata/sf0.01"))
    out["image_gradient_energy"] = _image_gradient_sql(img01)
    out["poly_edge_crossings"] = _poly_crossings_sql()
    out["bloom_fpr_audit"] = _bloom_fpr_sql("/root/testdata/sf0.01")
    out["scene_change_runs"] = _scene_change_sql(
        _video_dir_for("/root/testdata/sf0.01"))
    out["triplet_violation_labels"] = _triplet_sql(sf01)
    out["dup_component_sizes"] = f"""
        WITH RECURSIVE pairs AS ({EMBEDDING_DUPS_SQL}),
        e AS (SELECT a AS u, b AS v FROM pairs
              UNION SELECT b, a FROM pairs),
        walk(u, lbl) AS (
            SELECT u, u FROM (SELECT DISTINCT u FROM e)
            UNION
            SELECT e.u, w.lbl FROM e JOIN walk w ON w.u = e.v
        ),
        cc AS (SELECT u AS node, min(lbl) AS cluster_id
               FROM walk GROUP BY u),
        s AS (SELECT cluster_id, count(*) AS sz FROM cc GROUP BY 1)
        SELECT CAST(sz AS BIGINT) AS size, count(*) AS n_clusters
        FROM s GROUP BY 1
    """
    out["hist_equalize_sums"] = _hist_eq_sql(img01)
    out["phash_nn_images"] = _phash_nn_sql(img01)
    out["blob_count_images"] = _blob_count_sql(img01)
    out["audio_onsets_tracks"] = _audio_onsets_sql(aud01)
    out["range_density_labels"] = _range_density_sql(sf01)
    out["disc_tile_counts"] = _disc_tile_counts_sql(sf01)
    out["mirror_symmetry_images"] = _mirror_sql(img01)
    out["video_flicker_parts"] = _video_flicker_sql(
        _video_dir_for("/root/testdata/sf0.01"))
    out["quadkey_occupancy"] = _quadkey_occupancy_sql(sf01)
    out["simhash_bit_bias"] = _simhash_bit_bias_sql(sf01)
    out["coverage_holes_cells"] = _coverage_holes_sql(sf01)
    out["nearest_route_share"] = _nearest_route_share_sql(sf01)
    out["cross_source_leakage"] = _cross_source_leakage_sql(sf01)
    out["closest_pair_tiles"] = _closest_pair_sql(sf01)
    out["audio_loudest_window"] = _audio_loudest_sql(aud01)
    out["otsu_threshold_images"] = _otsu_sql(img01)
    out["kcore_dups"] = _kcore_sql(sf01)
    out["audio_haar_detail_tracks"] = _audio_haar_sql(aud01)
    out["video_quadrant_motion"] = _video_quadrant_sql(
        _video_dir_for("/root/testdata/sf0.01"))
    out["zorder_range_counts"] = _zorder_range_sql(img01)
    out["image_haar_bands"] = _image_haar_sql(img01)
    out["audio_walsh_bands"] = _audio_walsh_sql(aud01)
    out["best_split_daily"] = _best_split_sql(sf01)
    out["largest_blob_images"] = _largest_blob_sql(img01)
    out["containment_pairs_docs"] = _containment_sql(sf01)
    out["video_temporal_haar"] = _video_thaar_sql(
        _video_dir_for("/root/testdata/sf0.01"))
    return out


def _mods_digest(*mods) -> str:
    """Content hash of arbitrary modules (sidecar cache keys)."""
    from hashlib import blake2b
    from pathlib import Path

    hh = blake2b(digest_size=8)
    for mod in mods:
        hh.update(Path(mod.__file__).read_bytes())
    return hh.hexdigest()


def _oracle_planes_path() -> str:
    """Sidecar: the hyperplane_buckets random planes (seed 7, n_planes=8,
    embedding dim from the testdata schema) so the bucket assignment is
    SQL-expressible via list_dot_product. Content-keyed on ann.py."""
    import geotile.ops.ann as _ann

    p = _oracle_cache_dir() / f"oracle_hyperplanes_{_mods_digest(_ann)}.parquet"
    if not p.exists():
        import pyarrow.parquet as pq

        # embedding is fixed_size_list or list<float>; probe the dim
        t0 = pq.read_table(
            "/root/testdata/sf0.01/embeddings.parquet", columns=["embedding"]
        ).slice(0, 1)
        dim = len(t0["embedding"][0])
        planes = np.random.default_rng(7).standard_normal((8, dim))
        t = pa.table(
            {
                "plane_id": pa.array(np.arange(8, dtype=np.int64)),
                "v": pa.array([row.tolist() for row in planes],
                              pa.list_(pa.float64())),
            }
        )
        _atomic_write_table(t, p)
    return str(p)


_STOPWORD_SQL = "('the','and','of','a','to','in','is','it')"

DOC_QUALITY_SQL = f"""
    WITH t AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tok,
               CAST(length(text) AS DOUBLE) AS n_chars,
               CAST(len(list_filter(string_split(text, ' '),
                        x -> x IN {_STOPWORD_SQL})) AS DOUBLE) AS n_stop
        FROM documents
    ), s AS (
        SELECT doc_id,
               CASE WHEN n_tok > 0 THEN n_stop / n_tok ELSE 0.0 END AS stop_ratio,
               CASE WHEN n_tok > 0 THEN (n_chars - (n_tok - 1)) / n_tok ELSE 0.0 END AS mean_len,
               least(greatest((n_tok - 5) / 45.0, 0.0), 1.0) AS len_ok
        FROM t
    )
    SELECT doc_id,
           CAST(round(round(least(greatest(
               0.4 * len_ok
               + 0.3 * least(greatest(1.0 - abs(stop_ratio - 0.08) * 4.0, 0.0), 1.0)
               + 0.3 * least(greatest(1.0 - abs(mean_len - 4.5) / 4.5, 0.0), 1.0)
           , 0.0), 1.0), 6) * 1000000.0) AS BIGINT) AS quality_e6
    FROM s
"""

EMBEDDING_DUPS_SQL = """
    SELECT a.vec_id AS a, b.vec_id AS b,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 6) AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])) >= 0.35
"""


def _embedding_buckets_sql() -> str:
    planes = _oracle_planes_path()
    return f"""
        SELECT bucket, count(*) AS n FROM (
            SELECT e.vec_id,
                   CAST(sum(CASE WHEN list_dot_product(CAST(e.embedding AS DOUBLE[]), p.v) > 0
                            THEN (1 << p.plane_id) ELSE 0 END) AS BIGINT) AS bucket
            FROM embeddings e CROSS JOIN read_parquet('{planes}') p
            GROUP BY e.vec_id
        ) GROUP BY bucket
    """


def _sql_list(words) -> str:
    return "[" + ", ".join(f"'{w}'" for w in sorted(words)) + "]"


def _lang_id_sql() -> str:
    from geotile.ops.text import _LANG_MARKERS

    en, es, fr, de = (_sql_list(_LANG_MARKERS[k]) for k in ("en", "es", "fr", "de"))
    return f"""
        WITH t AS (
            SELECT doc_id, lang,
                   regexp_matches(substr(text, 1, 400), '[一-鿿]') AS cjk,
                   list_distinct(string_split_regex(
                       lower(substr(text, 1, 2000)), '\\s+')) AS words
            FROM documents
        ), v AS (
            SELECT doc_id, lang, cjk,
                   len(list_intersect(words, {en})) AS en_n,
                   len(list_intersect(words, {es})) AS es_n,
                   len(list_intersect(words, {fr})) AS fr_n,
                   len(list_intersect(words, {de})) AS de_n
            FROM t
        )
        SELECT doc_id, lang,
               CASE WHEN cjk THEN 'zh'
                    WHEN en_n >= es_n AND en_n >= fr_n AND en_n >= de_n THEN 'en'
                    WHEN es_n >= fr_n AND es_n >= de_n THEN 'es'
                    WHEN fr_n >= de_n THEN 'fr'
                    ELSE 'de' END AS lang_pred
        FROM v
    """


# ---------------------------------------------------------------------------
# hash-family oracle sidecars: INDEPENDENT scalar-Python replays
# (geotile/oracle_ref.py — pure-int arithmetic, no numpy data path) so a
# vectorization bug in ops/hashing/dedup/sketch cannot hide in the oracle
# ---------------------------------------------------------------------------

def _read_docs(sf_dir: str) -> list[tuple[int, str]]:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return list(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))


def _ref_sidecar(sf_dir: str, name: str, build) -> str:
    """Cached scalar-replay sidecar under GEOTILE_CACHE, content-keyed
    on oracle_ref.py (ADVICE r2: existence-keyed sidecars go stale)."""
    import geotile.oracle_ref as _ref
    from pathlib import Path

    sf = Path(sf_dir).name
    p = _oracle_cache_dir() / f"oracle_{name}_{sf}_{_mods_digest(_ref)}.parquet"
    if not p.exists():
        _oracle_cache_dir().mkdir(parents=True, exist_ok=True)
        _atomic_write_table(build(), p)
    return str(p)


def _u2i(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def _fingerprint_sidecar(sf_dir: str) -> str:
    from geotile.oracle_ref import fingerprint

    def build() -> pa.Table:
        docs = _read_docs(sf_dir)
        return pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "fingerprint": pa.array([_u2i(fingerprint(t)) for _, t in docs], pa.int64()),
            }
        )

    return _ref_sidecar(sf_dir, "fingerprint", build)


def _simhash_sidecar(sf_dir: str) -> str:
    from geotile.oracle_ref import simhash

    def build() -> pa.Table:
        docs = _read_docs(sf_dir)
        return pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "simhash": pa.array([_u2i(simhash(t)) for _, t in docs], pa.int64()),
            }
        )

    return _ref_sidecar(sf_dir, "simhash", build)


def _simhash_pairs_sidecar(sf_dir: str) -> str:
    from geotile.oracle_ref import simhash_pairs_ref

    def build() -> pa.Table:
        pairs = simhash_pairs_ref(_read_docs(sf_dir), max_hamming=4)
        return pa.table(
            {
                "a": pa.array([a for a, _, _ in pairs], pa.int64()),
                "b": pa.array([b for _, b, _ in pairs], pa.int64()),
                "hamming": pa.array([d for _, _, d in pairs], pa.int64()),
            }
        )

    return _ref_sidecar(sf_dir, "simhash_pairs", build)


def _simhash_pairs_sql(sf_dir: str) -> str:
    return f"SELECT a, b, hamming FROM read_parquet('{_simhash_pairs_sidecar(sf_dir)}')"


def _minhash_pairs_sidecar(sf_dir: str) -> str:
    from geotile.oracle_ref import minhash_lsh_pairs_ref

    def build() -> pa.Table:
        pairs = minhash_lsh_pairs_ref(_read_docs(sf_dir), threshold=0.35)
        return pa.table(
            {
                "a": pa.array([a for a, _, _ in pairs], pa.int64()),
                "b": pa.array([b for _, b, _ in pairs], pa.int64()),
                "jaccard_e6": pa.array(
                    [int(round(j * 1_000_000)) for _, _, j in pairs], pa.int64()
                ),
            }
        )

    return _ref_sidecar(sf_dir, "minhash_pairs", build)


def _hll_sidecar(sf_dir: str) -> str:
    from geotile.oracle_ref import hll_estimate_ref

    def build() -> pa.Table:
        import pyarrow.parquet as pq

        users = pq.read_table(f"{sf_dir}/events.parquet", columns=["user_id"])
        distinct = sorted(set(users["user_id"].to_pylist()))
        # HLL registers over distinct values == over the full stream
        est = int(round(hll_estimate_ref(distinct, p=12)))
        return pa.table({"est": pa.array([est], pa.int64())})

    return _ref_sidecar(sf_dir, "hll", build)


def _hll_grouped_sidecar(sf_dir: str) -> str:
    from geotile.oracle_ref import hll_estimate_ref

    def build() -> pa.Table:
        import pyarrow.parquet as pq

        t = pq.read_table(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])
        df = t.to_pandas()
        rows = [
            (et, int(round(hll_estimate_ref(sorted(set(g["user_id"])), p=12))))
            for et, g in df.groupby("event_type")
        ]
        return pa.table(
            {
                "event_type": pa.array([r[0] for r in rows], pa.string()),
                "est": pa.array([r[1] for r in rows], pa.int64()),
            }
        )

    return _ref_sidecar(sf_dir, "hll_grouped", build)


def _phash_neighbor_sql(img_dir: str) -> str:
    """Exact SQL replay of the 2-band pigeonhole Hamming-1 join: any
    pair within distance 1 agrees exactly on the low or high 32-bit
    half, so the band self-join is a lossless candidate generator; the
    bit_count(xor) filter and the degree histogram replay the engine's
    reduction. Ids never reach the output, so the engine's int ids and
    this replay's string ids hash identically."""
    return f"""
        WITH t AS (SELECT image_id, phash
                   FROM read_parquet('{img_dir}/part-*.parquet')),
        b AS (SELECT image_id, phash, u.band,
                     CASE u.band WHEN 0 THEN phash & 4294967295
                                 ELSE (phash >> 32) & 4294967295 END AS key
              FROM t, unnest([0, 1]) AS u(band)),
        cand AS (SELECT DISTINCT a.image_id i1, c.image_id i2,
                        a.phash p1, c.phash p2
                 FROM b a JOIN b c
                   ON c.band = a.band AND c.key = a.key
                  AND a.image_id < c.image_id),
        pairs AS (SELECT i1, i2 FROM cand WHERE bit_count(xor(p1, p2)) <= 1),
        deg AS (SELECT image_id, count(*) AS n_neighbors
                FROM (SELECT i1 AS image_id FROM pairs
                      UNION ALL SELECT i2 FROM pairs)
                GROUP BY 1)
        SELECT CAST(n_neighbors AS BIGINT) AS n_neighbors,
               count(*) AS n_images
        FROM deg GROUP BY 1
    """


def _hll_grouped_sql(sf_dir: str) -> str:
    return f"""
        SELECT e.event_type,
               CAST(any_value(s.est) AS BIGINT) AS distinct_users_est,
               CAST(count(DISTINCT e.user_id) AS BIGINT) AS distinct_users,
               TRUE AS est_ok
        FROM events e JOIN read_parquet('{_hll_grouped_sidecar(sf_dir)}') s
          ON s.event_type = e.event_type
        GROUP BY e.event_type
    """


def _fingerprint_sql(sf_dir: str) -> str:
    return f"SELECT doc_id, fingerprint FROM read_parquet('{_fingerprint_sidecar(sf_dir)}')"


def _simhash_sql(sf_dir: str) -> str:
    return f"SELECT doc_id, simhash FROM read_parquet('{_simhash_sidecar(sf_dir)}')"


def _minhash_pairs_sql(sf_dir: str) -> str:
    return f"SELECT a, b, jaccard_e6 FROM read_parquet('{_minhash_pairs_sidecar(sf_dir)}')"


def _hll_sql(sf_dir: str) -> str:
    return f"""
        SELECT CAST((SELECT est FROM read_parquet('{_hll_sidecar(sf_dir)}')) AS BIGINT)
                   AS distinct_users_est,
               CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_users,
               TRUE AS est_ok
        FROM events
    """


_IVF_ANN_SQL = """
    SELECT DISTINCT CAST(vec_id AS BIGINT) AS query_id,
           TRUE AS recall_ok, TRUE AS mean_ok
    FROM embeddings WHERE vec_id < 5
"""


def q_tile_covered_cells(sf_dir: str):
    """Distinct res-18 cells covered by any tile footprint — the
    dissolve operator's raster input set, exposed for the driver's
    correctness gate (the dissolve polygons themselves are checked
    against the in-memory trace in tests/test_join.py)."""
    from geotile.ops.join import DEFAULT_JOIN_RES, _footprint_cells
    from geotile.ops.tiles import JOIN_COLUMNS, read_image_table

    ds = read_image_table(_image_dir_for(sf_dir), columns=JOIN_COLUMNS)
    cov = ds.map_batches(
        lambda b: _footprint_cells(b, DEFAULT_JOIN_RES),
        batch_format="pyarrow", batch_size=65536, zero_copy_batch=True,
    )
    return cov.groupby("cell").count().select_columns(["cell"])


QUERIES["tile_covered_cells"] = q_tile_covered_cells


_WINDOW_STATS_SQL = """
        anchors AS (
            SELECT cov.ix - d.dx AS gx, cov.iy - d.dy AS gy, d.bit AS bit
            FROM cov, (VALUES (0,0,1),(1,0,2),(1,1,4),(0,1,8)) d(dx,dy,bit)
        ),
        cases AS (
            SELECT gx, gy, bit_or(bit) AS c FROM anchors GROUP BY gx, gy
        ),
        w AS (
            SELECT CASE WHEN c IN (1,2,4,8) THEN 1 WHEN c IN (3,6,9,12) THEN 4
                        WHEN c IN (5,10) THEN 2 WHEN c IN (7,11,13,14) THEN 7
                        ELSE 8 END AS a8,
                   CASE WHEN c IN (1,2,4,8) THEN 1 ELSE 0 END AS q1,
                   CASE WHEN c IN (7,11,13,14) THEN 1 ELSE 0 END AS q3,
                   CASE WHEN c IN (5,10) THEN 1 ELSE 0 END AS qd
            FROM cases
        )
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM cov) AS {count_col},
               CAST(sum(a8) AS BIGINT) AS area_octo,
               CAST((sum(q1) - sum(q3) + 2 * sum(qd)) // 4 AS BIGINT) AS euler
        FROM w
"""


def _covered_ixy_cte(img: str) -> str:
    """WITH-fragment producing ``cov(ix, iy)`` — the DISTINCT integer
    cell coordinates any tile footprint touches; SQL replay of
    _footprint_cells (constants mirror synth.tile_footprints /
    cells.cell_size_degrees bit-for-bit)."""
    from geotile.geom import cells as cellmod
    from geotile.ops.join import DEFAULT_JOIN_RES
    from geotile.synth import TILE_SIDE_M

    res = DEFAULT_JOIN_RES
    dlon, dlat = cellmod.cell_size_degrees(res)
    m_per_deg_lat = float(np.float64(6371008.8) * np.pi / 180.0)
    m_per_deg_lon = float(m_per_deg_lat * np.cos(np.radians(37.4)))
    hw_lon = float(TILE_SIDE_M / 2 / m_per_deg_lon)
    hw_lat = float(TILE_SIDE_M / 2 / m_per_deg_lat)

    def q(expr, off, step):
        return f"CAST(floor((({expr}) + {off}) / {step!r}) AS BIGINT)"

    return f"""
        pts AS (SELECT lon, lat FROM read_parquet('{img}/part-*.parquet')),
        c AS (
            SELECT {q(f'lon - ({hw_lon!r})', '180.0', dlon)} AS x0,
                   {q(f'lon + ({hw_lon!r})', '180.0', dlon)} AS x1,
                   {q(f'lat - ({hw_lat!r})', '90.0', dlat)} AS y0,
                   {q(f'lat + ({hw_lat!r})', '90.0', dlat)} AS y1
            FROM pts
        ),
        cov AS (
            -- full integer bbox: a 100 m tile spans up to 2 cells in lon
            -- but up to 3 in lat (res-18 lat cells are ~76 m)
            SELECT DISTINCT x0 + dx.v AS ix, y0 + dy.v AS iy
            FROM c, (VALUES (0),(1),(2)) dx(v), (VALUES (0),(1),(2)) dy(v)
            WHERE x0 + dx.v <= x1 AND y0 + dy.v <= y1
        )"""


def _covered_cells_sql(img: str) -> str:
    """Packed DISTINCT cell ids from the covered-(ix,iy) CTE."""
    from geotile.ops.join import DEFAULT_JOIN_RES

    cell = (
        f"(({_sql_spread('ix')} | ({_sql_spread('iy')} << 1)) | {DEFAULT_JOIN_RES << 58})"
    )
    return f"""
        WITH {_covered_ixy_cte(img)}
        SELECT DISTINCT {cell} AS cell FROM cov
    """


def _tile_dissolve_sql(img: str) -> str:
    """Dissolve invariants replayed from geometry alone: covered-cell
    count + marching-squares window-case area (exact eighth-cells) +
    Euler number (Q1 − Q3 + 2·Q_diag)/4 — the engine derives the same
    three numbers from the traced contours instead."""
    stats = _WINDOW_STATS_SQL.format(count_col="n_cells")
    return f"""
        WITH {_covered_ixy_cte(img)},
        {stats}
    """


def _cm_sidecar(sf_dir: str) -> str:
    from geotile.oracle_ref import cm_estimates_ref
    import pyarrow.parquet as pq

    def build() -> pa.Table:
        vals = pq.read_table(
            f"{sf_dir}/events.parquet", columns=["user_id"]
        )["user_id"].to_pylist()
        est = cm_estimates_ref(vals, sorted(set(vals)))
        ids = sorted(est)
        return pa.table(
            {
                "user_id": pa.array(ids, pa.int64()),
                "est_cnt": pa.array([est[i] for i in ids], pa.int64()),
            }
        )

    return _ref_sidecar(sf_dir, "cm_user", build)


def _cm_sql(sf_dir: str) -> str:
    return f"""
        SELECT e.user_id, s.est_cnt, COUNT(*) AS exact_cnt,
               s.est_cnt >= COUNT(*) AS over_ok
        FROM events e JOIN read_parquet('{_cm_sidecar(sf_dir)}') s
          USING (user_id)
        GROUP BY e.user_id, s.est_cnt
    """


def _image_hist_sidecar(img: str, n: int = 1024) -> str:
    """Generator-replay sidecar for image_channel_histogram: rebuild
    the expected per-channel histogram from synth.pixel_pattern (the
    ground truth the payloads were ENCODED from — independent of the
    engine's PNG decode path) with a different counting kernel
    (np.unique vs the stage's bincount). Content-keyed on synth.py so
    generator edits invalidate it (ADVICE r2: existence-keyed sidecars
    go stale)."""
    import geotile.synth as _sy
    import pyarrow.parquet as pq
    from pathlib import Path

    p = _oracle_cache_dir() / (
        f"oracle_imghist_{Path(img).name}_{n}_{_mods_digest(_sy)}.parquet"
    )
    if not p.exists():
        t = pq.read_table(img, columns=["image_id", "w", "h"])
        order = pc.sort_indices(t["image_id"])[:n]
        ids = t["image_id"].take(order)
        ws = t["w"].take(order).to_numpy(zero_copy_only=False)
        hs = t["h"].take(order).to_numpy(zero_copy_only=False)
        idx = _sy.image_index(ids).astype(np.uint64)
        acc = np.zeros((3, 16), dtype=np.int64)
        for wi, hi in set(zip(ws.tolist(), hs.tolist())):
            m = (ws == wi) & (hs == hi)
            px = _sy.pixel_pattern(idx[m], wi, hi)  # (k, h, w, 3) uint8
            for c in range(3):
                vals, cnts = np.unique(px[..., c] >> 4, return_counts=True)
                acc[c, vals] += cnts
        out = pa.table(
            {
                "channel": pa.array(np.repeat(np.arange(3, dtype=np.int64), 16)),
                "bin": pa.array(np.tile(np.arange(16, dtype=np.int64), 3)),
                "cnt": pa.array(acc.ravel()),
            }
        )
        _oracle_cache_dir().mkdir(parents=True, exist_ok=True)
        _atomic_write_table(out, p)
    return str(p)


def _image_hist_sql(img: str) -> str:
    return (
        f"SELECT channel, bin, cnt "
        f"FROM read_parquet('{_image_hist_sidecar(img)}')"
    )


def _image_patch_sidecar(img: str, n: int = 512) -> str:
    """Generator-replay sidecar for image_patch_sums: rebuild the
    expected patch sums from synth.pixel_pattern (ground truth the
    payloads were ENCODED from — independent of the PNG decode path)
    with a DIFFERENT reduction kernel (2D inclusion-exclusion over
    prefix sums vs the stage's reduceat). Content-keyed on synth.py."""
    from pathlib import Path

    import pyarrow.parquet as pq

    import geotile.synth as _sy

    G = 4
    p = _oracle_cache_dir() / (
        f"oracle_imgpatch_{Path(img).name}_{n}_{_mods_digest(_sy)}.parquet"
    )
    if not p.exists():
        t = pq.read_table(img, columns=["image_id", "w", "h"])
        order = pc.sort_indices(t["image_id"])[:n]
        ids = t["image_id"].take(order).to_numpy(zero_copy_only=False)
        ws = t["w"].take(order).to_numpy(zero_copy_only=False)
        hs = t["h"].take(order).to_numpy(zero_copy_only=False)
        idx = _sy.image_index(t["image_id"].take(order)).astype(np.uint64)
        rows_id, rows_patch, rows_sum, rows_npx = [], [], [], []
        for wi, hi in set(zip(ws.tolist(), hs.tolist())):
            m = (ws == wi) & (hs == hi)
            px = _sy.pixel_pattern(idx[m], wi, hi)  # (k, h, w, 3) uint8
            g2 = px.astype(np.int64).sum(axis=3)
            # 2D prefix sums with a zero border, then inclusion-exclusion
            P = np.zeros((g2.shape[0], hi + 1, wi + 1), np.int64)
            P[:, 1:, 1:] = g2.cumsum(axis=1).cumsum(axis=2)
            rb = np.r_[(np.arange(G) * hi) // G, hi]
            cb = np.r_[(np.arange(G) * wi) // G, wi]
            for r in range(G):
                for c in range(G):
                    sm = (P[:, rb[r + 1], cb[c + 1]] - P[:, rb[r], cb[c + 1]]
                          - P[:, rb[r + 1], cb[c]] + P[:, rb[r], cb[c]])
                    rows_id.append(ids[m])
                    rows_patch.append(np.full(int(m.sum()), r * G + c,
                                              np.int64))
                    rows_sum.append(sm)
                    rows_npx.append(np.full(
                        int(m.sum()),
                        int((rb[r + 1] - rb[r]) * (cb[c + 1] - cb[c])),
                        np.int64))
        out = pa.table({
            "image_id": pa.array(np.concatenate(rows_id)),
            "patch": pa.array(np.concatenate(rows_patch)),
            "sum_px": pa.array(np.concatenate(rows_sum)),
            "n_px": pa.array(np.concatenate(rows_npx)),
        })
        import pyarrow.parquet as pqw

        pqw.write_table(out, p)
    return str(p)


def _image_patch_sql(img: str) -> str:
    return (
        f"SELECT image_id, patch, sum_px, n_px "
        f"FROM read_parquet('{_image_patch_sidecar(img)}')"
    )


def _image_invariants_sql(img: str) -> str:
    """Invariant oracle: the engine DECODES each payload (raw + from-
    scratch PNG) and re-derives the perceptual hash; the oracle states
    the expected result — phash_ok true for the first 1000 image ids.
    A decode or phash regression flips rows to false and fails the
    value hash."""
    return f"""
        SELECT image_id, TRUE AS phash_ok
        FROM read_parquet('{img}/part-*.parquet')
        ORDER BY image_id LIMIT 1000
    """


def _image_embeddings_sql(img: str) -> str:
    """Invariant oracle: the embed stage must emit one 64-dim vector per
    image for the first 512 ids."""
    return f"""
        SELECT image_id, CAST(64 AS BIGINT) AS dim
        FROM read_parquet('{img}/part-*.parquet')
        ORDER BY image_id LIMIT 512
    """


def _fixture_sql_dir() -> str:
    import os
    from pathlib import Path

    _fixture_ctx()  # ensure the fixture parquet exists before SQL reads it
    return str(Path(os.environ.get("GEOTILE_CACHE", "/tmp/geotile_cache")) / "caltrain")


def _gtfs_envelope_sql() -> str:
    """bbox replay: raw min/max over the shape points of routes that
    have shapes (reference envelope.ts:14 keeps bbox unrounded)."""
    d = _fixture_sql_dir()
    return f"""
        SELECT min(shape_pt_lon) AS west, min(shape_pt_lat) AS south,
               max(shape_pt_lon) AS east, max(shape_pt_lat) AS north
        FROM read_parquet('{d}/shapes.parquet')
        WHERE shape_id IN (
            SELECT DISTINCT shape_id FROM read_parquet('{d}/trips.parquet')
            WHERE shape_id IS NOT NULL)
    """


def _gtfs_line_features_sql() -> str:
    """Ordered-coordinate replay of shape_line_features: flatten each
    route's shape points by (shape_id, shape_pt_sequence) and fold the
    position-weighted checksum (row_number replays the emit order)."""
    d = _fixture_sql_dir()
    return f"""
        WITH rs AS (
            SELECT DISTINCT route_id, shape_id
            FROM read_parquet('{d}/trips.parquet') WHERE shape_id IS NOT NULL
        ),
        pts AS (
            SELECT r.route_id, s.shape_pt_lon AS lon, s.shape_pt_lat AS lat,
                   r.shape_id,
                   row_number() OVER (
                       PARTITION BY r.route_id
                       ORDER BY r.shape_id, s.shape_pt_sequence) AS rn
            FROM rs r JOIN read_parquet('{d}/shapes.parquet') s USING (shape_id)
        )
        SELECT route_id,
               CAST(count(DISTINCT shape_id) AS BIGINT) AS n_parts,
               CAST(count(*) AS BIGINT) AS n_points,
               CAST(round(sum(rn * (lon + lat)) * 100) AS BIGINT) AS checksum_e2
        FROM pts GROUP BY route_id
    """


def _gtfs_convex_hull_sql() -> str:
    """Convex-hull replay over the used-stop point set: a point is a
    STRICT hull vertex iff no triangle (or degenerate segment) of other
    points contains it (the three crosses sum to 2·area(abc), so a
    degenerate triangle never false-positives an off-line point); ring
    order = polar angle around the lexicographic-min vertex (Graham
    order == monotone-chain CCW ring), closed by repeating vertex 0."""
    d = _fixture_sql_dir()
    return f"""
        WITH used AS (
            SELECT DISTINCT s.stop_id
            FROM read_parquet('{d}/stop_times.parquet') s
            JOIN read_parquet('{d}/trips.parquet') t USING (trip_id)
            WHERE t.route_id IN (SELECT route_id FROM read_parquet('{d}/routes.parquet'))
        ),
        stops AS (SELECT * FROM read_parquet('{d}/stops.parquet')),
        sel AS (
            SELECT stop_id FROM used
            UNION
            SELECT DISTINCT st.parent_station
            FROM stops st JOIN used u ON u.stop_id = st.stop_id
            WHERE st.parent_station IS NOT NULL AND st.parent_station <> ''
        ),
        pts AS (
            SELECT lon, lat, row_number() OVER (ORDER BY lon, lat) AS pid FROM (
                SELECT DISTINCT st.stop_lon AS lon, st.stop_lat AS lat
                FROM sel JOIN stops st USING (stop_id)
            )
        ),
        vtx AS (
            SELECT p.lon, p.lat FROM pts p
            WHERE NOT EXISTS (
                SELECT 1 FROM pts a, pts b, pts c
                WHERE a.pid < b.pid AND b.pid < c.pid
                  AND p.pid NOT IN (a.pid, b.pid, c.pid)
                  AND (
                    SELECT CASE WHEN least(c1, c2, c3) >= 0 OR greatest(c1, c2, c3) <= 0
                           THEN 1 ELSE 0 END
                    FROM (SELECT
                        (b.lon-a.lon)*(p.lat-a.lat) - (b.lat-a.lat)*(p.lon-a.lon) AS c1,
                        (c.lon-b.lon)*(p.lat-b.lat) - (c.lat-b.lat)*(p.lon-b.lon) AS c2,
                        (a.lon-c.lon)*(p.lat-c.lat) - (a.lat-c.lat)*(p.lon-c.lon) AS c3)
                  ) = 1
            )
        ),
        s AS (SELECT lon, lat FROM vtx ORDER BY lon, lat LIMIT 1),
        ring AS (
            SELECT v.lon, v.lat,
                   row_number() OVER (ORDER BY
                       CASE WHEN v.lon = s.lon AND v.lat = s.lat THEN -10.0
                            ELSE atan2(v.lat - s.lat, v.lon - s.lon) END) - 1 AS idx
            FROM vtx v, s
        )
        SELECT CAST(idx AS BIGINT) AS idx, lon, lat FROM ring
        UNION ALL
        SELECT (SELECT count(*) FROM ring), lon, lat FROM ring WHERE idx = 0
    """


# ---------------------------------------------------------------------------
# raster replay sidecars + SQL (buffer / dissolve): the DuckDB side
# re-derives the filled pixel set from geometry with the engine's exact
# IEEE arithmetic, then computes area/Euler from window cases while the
# engine computes them from the traced contours
# ---------------------------------------------------------------------------

def _buffer_segments_sidecar() -> str:
    """Per-route centerline segments in the buffer's metric frame plus
    the integer pixel windows distance_mask scans (same float ops), and
    the grid origin. Content-keyed on the geometry digest."""
    p = _oracle_cache_dir() / f"oracle_buffer_segments_{_geom_digest()}.parquet"
    if not p.exists():
        from geotile.config import PipelineConfig
        from geotile.geom.buffer import buffer_raster

        ctx = _fixture_ctx()
        cfg = PipelineConfig()
        r = cfg.buffer_size_meters
        cols = {k: [] for k in ("route_id", "ax", "ay", "dx", "dy", "l2",
                                "i0", "i1", "j0", "j1", "x0", "y0")}
        parts_by_route = _route_line_parts(ctx)
        for rid in sorted(parts_by_route):
            _mask, grid, metric, _l0, _a0, _mx, _my = buffer_raster(
                parts_by_route[rid], r, cfg.raster_cells_per_radius
            )
            for ml in metric:
                segs = (
                    list(zip(ml[:-1], ml[1:])) if len(ml) > 1 else [(ml[0], ml[0])]
                )
                for a, b in segs:
                    # the same window math as raster.distance_mask
                    xmin = min(a[0], b[0]) - r
                    xmax = max(a[0], b[0]) + r
                    ymin = min(a[1], b[1]) - r
                    ymax = max(a[1], b[1]) + r
                    i0 = max(0, int(np.floor((xmin - grid.x0) / grid.step - 0.5)))
                    i1 = min(grid.nx, int(np.ceil((xmax - grid.x0) / grid.step + 0.5)))
                    j0 = max(0, int(np.floor((ymin - grid.y0) / grid.step - 0.5)))
                    j1 = min(grid.ny, int(np.ceil((ymax - grid.y0) / grid.step + 0.5)))
                    dx, dy = b[0] - a[0], b[1] - a[1]
                    cols["route_id"].append(rid)
                    cols["ax"].append(float(a[0]))
                    cols["ay"].append(float(a[1]))
                    cols["dx"].append(float(dx))
                    cols["dy"].append(float(dy))
                    cols["l2"].append(float(dx * dx + dy * dy))
                    cols["i0"].append(i0)
                    cols["i1"].append(i1)
                    cols["j0"].append(j0)
                    cols["j1"].append(j1)
                    cols["x0"].append(grid.x0)
                    cols["y0"].append(grid.y0)
        t = pa.table(
            {
                "route_id": pa.array(cols["route_id"], pa.string()),
                **{k: pa.array(cols[k], pa.float64())
                   for k in ("ax", "ay", "dx", "dy", "l2", "x0", "y0")},
                **{k: pa.array(cols[k], pa.int64()) for k in ("i0", "i1", "j0", "j1")},
            }
        )
        _atomic_write_table(t, p)
    return str(p)


def _gtfs_buffer_stats_sql() -> str:
    import pyarrow.parquet as pq

    from geotile.config import PipelineConfig

    cfg = PipelineConfig()
    step = cfg.buffer_size_meters / cfg.raster_cells_per_radius
    r2 = cfg.buffer_size_meters * cfg.buffer_size_meters
    segs = _buffer_segments_sidecar()
    # DuckDB 1.0 can't take lateral column params in generate_series —
    # join a static 0..max offset table with range predicates instead
    st = pq.read_table(segs, columns=["i0", "i1", "j0", "j1"])
    wmax = int(pc.max(pc.subtract(st["i1"], st["i0"])).as_py() or 1)
    hmax = int(pc.max(pc.subtract(st["j1"], st["j0"])).as_py() or 1)
    return f"""
        WITH segs AS (SELECT * FROM read_parquet('{segs}')),
        xr AS (SELECT CAST(a AS BIGINT) AS v FROM generate_series(0, {wmax - 1}) t(a)),
        yr AS (SELECT CAST(a AS BIGINT) AS v FROM generate_series(0, {hmax - 1}) t(a)),
        hits AS (
            SELECT DISTINCT s.route_id, s.i0 + xr.v AS ix, s.j0 + yr.v AS iy
            FROM segs s
            JOIN xr ON xr.v < s.i1 - s.i0
            JOIN yr ON yr.v < s.j1 - s.j0,
                 LATERAL (SELECT s.x0 + ((s.i0 + xr.v) + 0.5) * {step!r} AS px,
                                 s.y0 + ((s.j0 + yr.v) + 0.5) * {step!r} AS py) p,
                 LATERAL (SELECT CASE WHEN s.l2 = 0.0 THEN 0.0
                          ELSE least(greatest(
                              ((p.px - s.ax) * s.dx + (p.py - s.ay) * s.dy) / s.l2,
                              0.0), 1.0) END AS t) tt
            WHERE (p.px - (s.ax + tt.t * s.dx)) * (p.px - (s.ax + tt.t * s.dx))
                + (p.py - (s.ay + tt.t * s.dy)) * (p.py - (s.ay + tt.t * s.dy))
                <= {r2!r}
        ),
        anchors AS (
            SELECT h.route_id, h.ix - d.dx AS gx, h.iy - d.dy AS gy, d.bit AS bit
            FROM hits h, (VALUES (0,0,1),(1,0,2),(1,1,4),(0,1,8)) d(dx,dy,bit)
        ),
        cases AS (
            SELECT route_id, gx, gy, bit_or(bit) AS c FROM anchors GROUP BY 1, 2, 3
        ),
        w AS (
            SELECT route_id,
                   CASE WHEN c IN (1,2,4,8) THEN 1 WHEN c IN (3,6,9,12) THEN 4
                        WHEN c IN (5,10) THEN 2 WHEN c IN (7,11,13,14) THEN 7
                        ELSE 8 END AS a8,
                   CASE WHEN c IN (1,2,4,8) THEN 1 ELSE 0 END AS q1,
                   CASE WHEN c IN (7,11,13,14) THEN 1 ELSE 0 END AS q3,
                   CASE WHEN c IN (5,10) THEN 1 ELSE 0 END AS qd
            FROM cases
        ),
        px AS (SELECT route_id, count(*) AS n FROM hits GROUP BY 1)
        SELECT w.route_id, CAST(any_value(px.n) AS BIGINT) AS n_pixels,
               CAST(sum(w.a8) AS BIGINT) AS area_octo,
               CAST((sum(w.q1) - sum(w.q3) + 2 * sum(w.qd)) // 4 AS BIGINT) AS euler
        FROM w JOIN px USING (route_id)
        GROUP BY w.route_id
    """


def _dissolve_edges_sidecar() -> str:
    """Per-feature polygon edges of the simplified buffered stop discs
    in the dissolve's shared metric frame, plus per-feature integer
    pixel windows and the grid origin. Content-keyed."""
    p = _oracle_cache_dir() / f"oracle_dissolve_edges_{_geom_digest()}.parquet"
    if not p.exists():
        from geotile.config import PipelineConfig
        from geotile.ops.derive import dissolve_raster

        ctx = _fixture_ctx()
        cfg = PipelineConfig(coordinate_precision=5)
        cell_m = cfg.buffer_size_meters / cfg.raster_cells_per_radius
        feats = _dissolved_input_feats(ctx, cfg)
        _mask, grid, metric, _l0, _a0, _mx, _my = dissolve_raster(feats, cell_m)
        cols = {k: [] for k in ("fid", "x1", "y1", "x2", "y2",
                                "fi0", "fi1", "fj0", "fj1", "x0", "y0")}
        for fid, rings in enumerate(metric):
            allp = np.vstack(rings)
            # pixel centers possibly inside the feature's bbox (±1 margin
            # is harmless: outside the ring the parity is even)
            fi0 = max(0, int(np.floor((allp[:, 0].min() - grid.x0) / grid.step - 0.5)) - 1)
            fi1 = min(grid.nx - 1, int(np.ceil((allp[:, 0].max() - grid.x0) / grid.step)) + 1)
            fj0 = max(0, int(np.floor((allp[:, 1].min() - grid.y0) / grid.step - 0.5)) - 1)
            fj1 = min(grid.ny - 1, int(np.ceil((allp[:, 1].max() - grid.y0) / grid.step)) + 1)
            for ring in rings:
                rr = np.asarray(ring, np.float64)
                if len(rr) < 3:
                    continue
                if not (rr[0] == rr[-1]).all():
                    rr = np.vstack([rr, rr[:1]])
                n_e = len(rr) - 1
                cols["fid"].append(np.full(n_e, fid, dtype=np.int64))
                cols["x1"].append(rr[:-1, 0])
                cols["y1"].append(rr[:-1, 1])
                cols["x2"].append(rr[1:, 0])
                cols["y2"].append(rr[1:, 1])
                for k, v in (("fi0", fi0), ("fi1", fi1), ("fj0", fj0), ("fj1", fj1)):
                    cols[k].append(np.full(n_e, v, dtype=np.int64))
                cols["x0"].append(np.full(n_e, grid.x0))
                cols["y0"].append(np.full(n_e, grid.y0))
        t = pa.table({k: pa.array(np.concatenate(v)) for k, v in cols.items()})
        _atomic_write_table(t, p)
    return str(p)


def _gtfs_dissolved_stats_sql() -> str:
    import pyarrow.parquet as pq

    from geotile.config import PipelineConfig

    cfg = PipelineConfig(coordinate_precision=5)
    step = cfg.buffer_size_meters / cfg.raster_cells_per_radius
    edges = _dissolve_edges_sidecar()
    et = pq.read_table(edges, columns=["fi0", "fi1", "fj0", "fj1"])
    wmax = int(pc.max(pc.subtract(et["fi1"], et["fi0"])).as_py() or 1)
    hmax = int(pc.max(pc.subtract(et["fj1"], et["fj0"])).as_py() or 1)
    stats = _WINDOW_STATS_SQL.format(count_col="n_pixels")
    return f"""
        WITH e AS (SELECT * FROM read_parquet('{edges}')),
        f AS (SELECT DISTINCT fid, fi0, fi1, fj0, fj1, x0, y0 FROM e),
        xr AS (SELECT CAST(a AS BIGINT) AS v FROM generate_series(0, {wmax}) t(a)),
        yr AS (SELECT CAST(a AS BIGINT) AS v FROM generate_series(0, {hmax}) t(a)),
        cov AS (
            SELECT DISTINCT ix, iy FROM (
                SELECT ff.fid, ff.fi0 + xr.v AS ix, ff.fj0 + yr.v AS iy
                FROM f ff
                JOIN xr ON xr.v <= ff.fi1 - ff.fi0
                JOIN yr ON yr.v <= ff.fj1 - ff.fj0,
                     LATERAL (SELECT ff.x0 + ((ff.fi0 + xr.v) + 0.5) * {step!r} AS px,
                                     ff.y0 + ((ff.fj0 + yr.v) + 0.5) * {step!r} AS py) p
                JOIN e ON e.fid = ff.fid
                 AND ((e.y1 <= p.py AND p.py < e.y2) OR (e.y2 <= p.py AND p.py < e.y1))
                 AND e.x1 + (p.py - e.y1) * (e.x2 - e.x1) / (e.y2 - e.y1) <= p.px
                GROUP BY ff.fid, ix, iy
                HAVING count(*) % 2 = 1
            )
        ),
        {stats}
    """


def _gtfs_stop_features_sql() -> str:
    """Relational replay of ops/stops.stop_features over the fixture
    parquet: used stops (distinct routes via stop_times ⋈ trips, routes
    that exist in the routes table) plus parent stations of used stops
    riding along with n_routes = 0 (the reference's "routes": {} quirk)."""
    import os
    from pathlib import Path

    _fixture_ctx()  # ensure the fixture parquet exists before SQL reads it
    d = str(Path(os.environ.get("GEOTILE_CACHE", "/tmp/geotile_cache")) / "caltrain")
    return f"""
        WITH pair AS (
            SELECT DISTINCT s.stop_id, t.route_id
            FROM read_parquet('{d}/stop_times.parquet') s
            JOIN read_parquet('{d}/trips.parquet') t USING (trip_id)
        ),
        used AS (
            -- SEMI join + distinct: route_id can repeat in the routes
            -- table across agencies (the duplicate-L3 fixture case);
            -- the engine keys routes by id so each id counts once
            SELECT p.stop_id, CAST(count(DISTINCT p.route_id) AS BIGINT) AS n_routes
            FROM pair p
            WHERE p.route_id IN (SELECT route_id FROM read_parquet('{d}/routes.parquet'))
            GROUP BY p.stop_id
        ),
        stops AS (SELECT * FROM read_parquet('{d}/stops.parquet')),
        parents AS (
            SELECT DISTINCT s.parent_station AS stop_id
            FROM stops s JOIN used u ON u.stop_id = s.stop_id
            WHERE s.parent_station IS NOT NULL AND s.parent_station <> ''
        )
        SELECT u.stop_id, u.n_routes
        FROM used u JOIN stops ss ON ss.stop_id = u.stop_id
        UNION ALL
        SELECT p.stop_id, CAST(0 AS BIGINT)
        FROM parents p JOIN stops ss ON ss.stop_id = p.stop_id
        WHERE p.stop_id NOT IN (SELECT stop_id FROM used)
    """


# ---------------------------------------------------------------------------
# Bloom-filter semi-join — the broadcast-vs-shuffle middle ground (ops/bloom)
# ---------------------------------------------------------------------------

def q_bloom_semi_join_lineitem(sf_dir: str):
    """EXACT semi-join via a Bloom prefilter (geotile/ops/bloom.py):
    lineitems whose order is URGENT. The distributed-built 10-bit/key
    filter (constant-size partial bitmaps, driver OR is filter-scale)
    broadcasts at 1.25 bytes/key — 6.4× smaller than a raw int64
    keyset — and kills ~99% of non-matching fact rows BEFORE the exact
    hash-bucketed verify join, so the shuffle carries survivors only.
    Bloom has no false negatives and the verify is exact, hence the
    plain IN-subquery SQL replay."""
    from geotile.ops.bloom import bloom_semi_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity", "l_returnflag"])
    keys = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"]).map_batches(
        lambda t: t.filter(pc.equal(t["o_orderpriority"], "1-URGENT")).select(
            ["o_orderkey"]),
        batch_format="pyarrow",
    ).materialize()  # executed once; count() below is metadata-cheap
    j = bloom_semi_join(li, keys, "l_orderkey", "o_orderkey",
                        n_keys=max(keys.count(), 1))

    def part(t: pa.Table) -> pa.Table:
        t = t.append_column("q_e2", _e(t["l_quantity"], 100))
        g = t.group_by("l_returnflag").aggregate([("q_e2", "sum"), ("q_e2", "count")])
        return pa.table({"l_returnflag": g["l_returnflag"],
                         "sum_qty_e2": g["q_e2_sum"].cast(pa.int64()),
                         "n_items": g["q_e2_count"].cast(pa.int64())})

    out = j.map_batches(part, batch_format="pyarrow").groupby(
        "l_returnflag").sum(["sum_qty_e2", "n_items"])
    return _rename(out, ["l_returnflag", "sum_qty_e2", "n_items"])


QUERIES["bloom_semi_join_lineitem"] = q_bloom_semi_join_lineitem
ORACLE_SQL["bloom_semi_join_lineitem"] = """
        SELECT l_returnflag,
               SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS sum_qty_e2,
               COUNT(*) AS n_items
        FROM lineitem
        WHERE l_orderkey IN (
            SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
        GROUP BY l_returnflag
    """


# ---------------------------------------------------------------------------
# Contiguous token-budget sharding — the LLM-corpus packing step
# ---------------------------------------------------------------------------

def q_token_shards_docs(sf_dir: str):
    """Pack documents (in doc_id order) into contiguous ~20k-char
    shards: a doc's shard is its EXCLUSIVE running-char prefix // C —
    the deterministic token-budget sharding an LLM training pipeline
    uses to cut a corpus into fixed-cost work units. Distributed
    prefix sum in two row-scale passes and zero driver row data:
    (1) per-batch (bucket, chars) partials with bucket = doc_id >> 10
    → bucket-scale groupby → driver exclusive scan over bucket sums
    (bucket count is N/1024; a 100-TB corpus would add one more scan
    level, same shape); (2) one bucket co-partition pass where each
    bucket sorts its own ≤1024 rows, cumsums from its broadcast base
    offset, and pre-aggregates per shard — shards spanning a bucket
    boundary merge in the final shard-scale groupby."""
    return _shard_by_chars(_read(sf_dir, "documents",
                                 ["doc_id", "n_chars"]))


def _shard_by_chars(ds, C: int = 20_000, SHIFT: int = 10):
    """Contiguous char-budget sharding of a (doc_id, n_chars) dataset
    (doc_id order): the two-pass distributed exclusive prefix sum used
    by token_shards_docs and llm_corpus_prep — bucket-scale driver
    scan, one co-partition pass, shard-scale merge."""

    def bpart(t: pa.Table) -> pa.Table:
        b = pc.shift_right(t["doc_id"], pa.scalar(SHIFT))
        g = pa.table({"bucket": b, "chars": t["n_chars"]}).group_by(
            "bucket").aggregate([("chars", "sum")])
        return pa.table({"bucket": g["bucket"],
                         "chars": g["chars_sum"].cast(pa.int64())})

    sums = ds.map_batches(bpart, batch_format="pyarrow",
                          zero_copy_batch=True).groupby("bucket").sum(
        "chars").take_all()  # bucket-scale
    sums.sort(key=lambda r: r["bucket"])
    base, acc = {}, 0
    for r in sums:
        base[r["bucket"]] = acc
        acc += r["sum(chars)"]
    base_ref = ray.put(base)

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "bucket", pc.shift_right(t["doc_id"], pa.scalar(SHIFT)))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        offs = _broadcast(base_ref)
        df = df.sort_values("doc_id", kind="stable")
        chars = df["n_chars"].to_numpy(np.int64)
        pre = offs[int(df["bucket"].iloc[0])] + np.cumsum(chars) - chars
        shard = pre // C
        uniq, inv = np.unique(shard, return_inverse=True)
        n = np.bincount(inv)
        tot = np.zeros(len(uniq), np.int64)
        np.add.at(tot, inv, chars)
        return pd.DataFrame({"shard_id": uniq, "n_docs": n.astype(np.int64),
                             "sum_chars": tot})

    out = (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket").map_groups(per_bucket, batch_format="pandas")
        .groupby("shard_id").sum(["n_docs", "sum_chars"])
    )
    return _rename(out, ["shard_id", "n_docs", "sum_chars"])


QUERIES["token_shards_docs"] = q_token_shards_docs
ORACLE_SQL["token_shards_docs"] = """
        WITH p AS (
            SELECT doc_id, n_chars,
                   COALESCE(SUM(n_chars) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS pre
            FROM documents)
        SELECT CAST(pre // 20000 AS BIGINT) AS shard_id,
               COUNT(*) AS n_docs,
               SUM(n_chars) AS sum_chars
        FROM p GROUP BY 1
    """


# ---------------------------------------------------------------------------
# RFM segmentation — recency/frequency/monetary customer pipeline
# ---------------------------------------------------------------------------

def q_rfm_segments(sf_dir: str):
    """RFM segmentation over orders: per customer, last-order day
    (recency), order count (frequency), e2 spend (monetary), each
    folded into fixed integer buckets, then segment counts. One
    customer-cardinality shuffle (per-batch partials merge with
    Max/Sum aggregates); the bucket fold and final groupby are
    segment-scale. All arithmetic on integer lattices so the SQL
    replay is bit-exact."""
    from ray.data.aggregate import Max, Sum

    DAY_US = 86_400_000_000
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"])

    def part(t: pa.Table) -> pa.Table:
        day = pc.divide(t["o_orderdate"].cast(pa.int64()),
                        pa.scalar(DAY_US)).cast(pa.int64())
        g = pa.table({
            "c": t["o_custkey"], "day": day,
            "m_e2": _e(t["o_totalprice"], 100),
        }).group_by("c").aggregate(
            [("day", "max"), ("m_e2", "sum"), ("m_e2", "count")])
        return pa.table({"c": g["c"], "last_day": g["day_max"],
                         "m_e2": g["m_e2_sum"].cast(pa.int64()),
                         "n": g["m_e2_count"].cast(pa.int64())})

    per_cust = ds.map_batches(part, batch_format="pyarrow",
                              zero_copy_batch=True).groupby("c").aggregate(
        Max("last_day"), Sum("n"), Sum("m_e2"))

    def seg(t: pa.Table) -> pa.Table:
        last = t["max(last_day)"].to_numpy(zero_copy_only=False)
        n = t["sum(n)"].to_numpy(zero_copy_only=False)
        m = t["sum(m_e2)"].to_numpy(zero_copy_only=False)
        g = pa.table({
            "r_bucket": pa.array(last // 365, pa.int64()),
            "f_bucket": pa.array(np.minimum(n // 5, 3).astype(np.int64)),
            "m_bucket": pa.array(np.minimum(m // 10_000_000, 3).astype(np.int64)),
            "m_e2": pa.array(m.astype(np.int64)),
        }).group_by(["r_bucket", "f_bucket", "m_bucket"]).aggregate(
            [("m_e2", "sum"), ("m_e2", "count")])
        return pa.table({"r_bucket": g["r_bucket"], "f_bucket": g["f_bucket"],
                         "m_bucket": g["m_bucket"],
                         "total_m_e2": g["m_e2_sum"].cast(pa.int64()),
                         "n_customers": g["m_e2_count"].cast(pa.int64())})

    out = per_cust.map_batches(seg, batch_format="pyarrow").groupby(
        ["r_bucket", "f_bucket", "m_bucket"]).sum(["total_m_e2", "n_customers"])
    return _rename(out, ["r_bucket", "f_bucket", "m_bucket",
                         "total_m_e2", "n_customers"])


QUERIES["rfm_segments"] = q_rfm_segments
ORACLE_SQL["rfm_segments"] = """
        WITH per_cust AS (
            SELECT o_custkey,
                   MAX(CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT))
                     AS last_day,
                   COUNT(*) AS n_orders,
                   SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS m_e2
            FROM orders GROUP BY o_custkey)
        SELECT CAST(last_day // 365 AS BIGINT) AS r_bucket,
               CAST(LEAST(n_orders // 5, 3) AS BIGINT) AS f_bucket,
               CAST(LEAST(m_e2 // 10000000, 3) AS BIGINT) AS m_bucket,
               SUM(m_e2) AS total_m_e2,
               COUNT(*) AS n_customers
        FROM per_cust GROUP BY 1, 2, 3
    """


# ---------------------------------------------------------------------------
# Graph analytics over the near-dup pair graph: triangles + BFS levels
# ---------------------------------------------------------------------------

def q_triangle_dups(sf_dir: str):
    """Exact triangle count (ops/graph.triangle_count — degree-ordered
    orientation bounds per-source wedge fan-out at O(√m), wedge closure
    checked by a bucketed co-partition semi-count, never an edge-set
    broadcast) over the embedding near-dup pair graph: triangle density
    distinguishes tight dup clusters from chains of borderline pairs.
    SQL replay = canonical 3-way self-join on the a<b pair list."""
    from geotile.ops.dedup import embedding_dup_pairs
    from geotile.ops.graph import triangle_count

    pairs = embedding_dup_pairs(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]), tau=0.35
    )
    return triangle_count(pairs.select_columns(["a", "b"]))


QUERIES["triangle_dups"] = q_triangle_dups
ORACLE_SQL["triangle_dups"] = f"""
        WITH pairs AS ({EMBEDDING_DUPS_SQL}),
        e AS (SELECT a, b FROM pairs),
        nodes AS (SELECT DISTINCT n FROM
                  (SELECT a AS n FROM e UNION ALL SELECT b FROM e))
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM nodes) AS n_nodes,
               (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
               (SELECT CAST(count(*) AS BIGINT)
                FROM e ab JOIN e bc ON bc.a = ab.b
                          JOIN e ac ON ac.a = ab.a AND ac.b = bc.b)
                 AS n_triangles
    """


def q_bfs_dups(sf_dir: str):
    """Fixed-round BSP breadth-first search (ops/graph.bfs_levels):
    hop distance ≤ 3 from the seed set (vec_id % 11 == 0) over the
    symmetrized near-dup graph — the reachability primitive behind
    'quarantine everything within k hops of a known-bad document'.
    Every round is a size-guarded semi-join (frontier) + anti-join
    (visited) over the materialized edge list; no frontier row lands
    on the driver. SQL replay = three chained level CTEs."""
    from geotile.ops.dedup import embedding_dup_pairs
    from geotile.ops.graph import bfs_levels

    pairs = embedding_dup_pairs(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]), tau=0.35
    )
    def pick_seeds(t: pa.Table) -> pa.Table:
        v = t["vec_id"].to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(v[v % 11 == 0])})

    seeds = _read(sf_dir, "embeddings", ["vec_id"]).map_batches(
        pick_seeds, batch_format="pyarrow", zero_copy_batch=True)
    return bfs_levels(pairs.select_columns(["a", "b"]), seeds, rounds=3)


QUERIES["bfs_dups"] = q_bfs_dups
ORACLE_SQL["bfs_dups"] = f"""
        WITH pairs AS ({EMBEDDING_DUPS_SQL}),
        e AS (SELECT a AS u, b AS v FROM pairs
              UNION ALL SELECT b, a FROM pairs),
        l0 AS (SELECT vec_id AS node FROM embeddings WHERE vec_id % 11 = 0),
        l1 AS (SELECT DISTINCT e.v AS node FROM e JOIN l0 ON e.u = l0.node
               WHERE e.v NOT IN (SELECT node FROM l0)),
        l2 AS (SELECT DISTINCT e.v AS node FROM e JOIN l1 ON e.u = l1.node
               WHERE e.v NOT IN (SELECT node FROM l0)
                 AND e.v NOT IN (SELECT node FROM l1)),
        l3 AS (SELECT DISTINCT e.v AS node FROM e JOIN l2 ON e.u = l2.node
               WHERE e.v NOT IN (SELECT node FROM l0)
                 AND e.v NOT IN (SELECT node FROM l1)
                 AND e.v NOT IN (SELECT node FROM l2))
        SELECT node, CAST(0 AS BIGINT) AS level FROM l0
        UNION ALL SELECT node, CAST(1 AS BIGINT) FROM l1
        UNION ALL SELECT node, CAST(2 AS BIGINT) FROM l2
        UNION ALL SELECT node, CAST(3 AS BIGINT) FROM l3
    """


# ---------------------------------------------------------------------------
# Grouped linear regression — exact rational slope per group
# ---------------------------------------------------------------------------

def q_linreg_hour_value(sf_dir: str):
    """Per-event-type least-squares slope of value vs hour-of-day, as
    an EXACT rational: slope = (n·Σxy − Σx·Σy) / (n·Σxx − Σx²). Per
    batch one Arrow groupby emits the five integer moments on the
    (hour, value·10⁴) lattice — every batch/group sum fits int64 —
    then the type-scale epilogue forms the >64-bit numerator /
    denominator in Python arbitrary-precision ints and emits them as
    digit strings (DuckDB replays in HUGEINT and casts to VARCHAR;
    the driver's value hash compares decimal digits, not floats)."""
    ev = _read(sf_dir, "events", ["ts", "event_type", "value"])
    HOUR_US = 3_600_000_000

    def part(t: pa.Table) -> pa.Table:
        x = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
             // HOUR_US) % 24
        y = pc.round(pc.multiply(t["value"], pa.scalar(1e4))).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        g = pa.table({
            "event_type": t["event_type"],
            "x": pa.array(x), "y": pa.array(y),
            "xy": pa.array(x * y), "xx": pa.array(x * x),
        }).group_by("event_type").aggregate(
            [("x", "sum"), ("y", "sum"), ("xy", "sum"), ("xx", "sum"),
             ([], "count_all")])
        return pa.table({
            "event_type": g["event_type"],
            "sx": g["x_sum"], "sy": g["y_sum"], "sxy": g["xy_sum"],
            "sxx": g["xx_sum"], "n": g["count_all"].cast(pa.int64()),
        })

    rows = ev.map_batches(part, batch_format="pyarrow", zero_copy_batch=True
                          ).groupby("event_type").sum(
        ["sx", "sy", "sxy", "sxx", "n"]).take_all()  # type-scale
    rows.sort(key=lambda r: r["event_type"])
    num, den = [], []
    for r in rows:
        n, sx, sy = int(r["sum(n)"]), int(r["sum(sx)"]), int(r["sum(sy)"])
        num.append(str(n * int(r["sum(sxy)"]) - sx * sy))
        den.append(str(n * int(r["sum(sxx)"]) - sx * sx))
    return pd.DataFrame({
        "event_type": [r["event_type"] for r in rows],
        "n": np.array([r["sum(n)"] for r in rows], np.int64),
        "slope_num": num, "slope_den": den,
    })


QUERIES["linreg_hour_value"] = q_linreg_hour_value
ORACLE_SQL["linreg_hour_value"] = """
        WITH b AS (
            SELECT event_type,
                   CAST(date_part('hour', ts) AS BIGINT) AS x,
                   CAST(round(value * 10000) AS BIGINT) AS y
            FROM events),
        s AS (
            SELECT event_type, COUNT(*) AS n,
                   SUM(x) AS sx, SUM(y) AS sy,
                   SUM(x * y) AS sxy, SUM(x * x) AS sxx
            FROM b GROUP BY event_type)
        SELECT event_type, n,
               CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy
                    AS VARCHAR) AS slope_num,
               CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
                    AS VARCHAR) AS slope_den
        FROM s
    """


# ---------------------------------------------------------------------------
# Image near-dup clustering: pHash Hamming pairs -> connected components
# ---------------------------------------------------------------------------

def q_image_dup_clusters(sf_dir: str):
    """Image-corpus deduplication end-to-end: perceptual-hash Hamming
    pairs at distance <= 1 (dedup.hamming_pairs — exact 2-band
    pigeonhole, cap=None so the SQL band-join replay matches row for
    row) fed through distributed connected components, electing the
    min image index as each cluster's canonical representative — the
    keep-one-per-cluster step of an image training-set dedup. The
    bytes column never leaves storage (read prunes to image_id/phash);
    int ids come from the zero-padded id suffix so the SQL replay
    parses the same integers."""
    from geotile.ops.dedup import hamming_pairs
    from geotile.ops.graph import connected_components
    from geotile.ops.tiles import read_image_table
    from geotile.synth import image_index

    ds = read_image_table(_image_dir_for(sf_dir), columns=["image_id", "phash"])

    def to_int_id(t: pa.Table) -> pa.Table:
        return pa.table(
            {"img": pa.array(image_index(t["image_id"]).astype(np.int64)),
             "phash": t["phash"]}
        )

    ids = ds.map_batches(to_int_id, batch_format="pyarrow", zero_copy_batch=True)
    pairs = hamming_pairs(ids, "img", "phash", max_hamming=1, cap=None)
    return connected_components(
        pairs.select_columns(["a", "b"]), "a", "b", n_buckets=8
    )


QUERIES["image_dup_clusters"] = q_image_dup_clusters


def _image_dup_clusters_sql(img_dir: str) -> str:
    """Recursive-CTE replay of pigeonhole Hamming-1 pairs + label
    propagation to the min-id component representative (same walk CTE
    as the embedding dup-cluster oracle)."""
    return f"""
        WITH RECURSIVE t AS (
            SELECT CAST(substr(image_id, 5) AS BIGINT) AS img, phash
            FROM read_parquet('{img_dir}/part-*.parquet')),
        b AS (SELECT img, phash, u.band,
                     CASE u.band WHEN 0 THEN phash & 4294967295
                                 ELSE (phash >> 32) & 4294967295 END AS key
              FROM t, unnest([0, 1]) AS u(band)),
        cand AS (SELECT DISTINCT a.img i1, c.img i2, a.phash p1, c.phash p2
                 FROM b a JOIN b c
                   ON c.band = a.band AND c.key = a.key AND a.img < c.img),
        pairs AS (SELECT i1, i2 FROM cand WHERE bit_count(xor(p1, p2)) <= 1),
        e AS (SELECT i1 AS u, i2 AS v FROM pairs
              UNION SELECT i2, i1 FROM pairs),
        walk(u, lbl) AS (
            SELECT u, u FROM (SELECT DISTINCT u FROM e)
            UNION
            SELECT e.u, w.lbl FROM e JOIN walk w ON w.u = e.v
        )
        SELECT u AS node, min(lbl) AS cluster_id FROM walk GROUP BY u
    """


# ---------------------------------------------------------------------------
# Grid-density spatial clustering (DBSCAN-style) over derived event points
# ---------------------------------------------------------------------------

_DBSCAN_MINPTS = 5


def q_spatial_dbscan_events(sf_dir: str):
    """Grid-density spatial clustering (the DBSCAN-on-a-grid classic):
    deterministic non-uniform points derived from event ids (squared
    uniforms concentrate mass toward the origin, so the density
    threshold is non-trivial), quantized to a 20x20 cell grid; cells
    with >= 5 points are dense; dense cells merge into clusters via
    4-adjacency connected components, singletons keeping their own
    key as cluster id. Output (cluster_id, n_cells, n_points).

    Scale shape: the ONLY data-scale pass is the per-batch cell-count
    partial; everything after (dense filter, adjacency semi-join, CC,
    label lookup) runs at grid-resolution scale, independent of row
    count — the property that makes grid clustering the 100-TB
    substitute for point-pair DBSCAN."""
    from geotile.ops.graph import connected_components
    from geotile.ops.relational import anti_join, lookup_join, semi_join

    ev = _read(sf_dir, "events", ["event_id"])

    def cell_counts(t: pa.Table) -> pa.Table:
        e = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        u = (e * 2654435761 % 4294967296).astype(np.float64) / 4294967296.0
        w = ((e * 40503 + 7) % 65536).astype(np.float64) / 65536.0
        ix = np.floor(u * u * 10.0 / 0.5).astype(np.int64)
        iy = np.floor(w * w * 10.0 / 0.5).astype(np.int64)
        k = ix * 64 + iy
        uk, c = np.unique(k, return_counts=True)
        return pa.table({"k": pa.array(uk), "n": pa.array(c.astype(np.int64))})

    counts = (
        ev.map_batches(cell_counts, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("k").sum("n")
    )
    dense = _rename(counts, ["k", "n"]).map_batches(
        lambda t: t.filter(pc.greater_equal(t["n"], _DBSCAN_MINPTS)),
        batch_format="pyarrow",
    ).materialize()  # grid-resolution scale (<= 400 rows at any sf)

    if dense.count() == 0:
        # no dense cell at all (degenerate tiny input): Ray drops empty
        # blocks, so the downstream semi/lookup joins would see a
        # SCHEMALESS dataset — short-circuit with the typed empty result
        return ray.data.from_arrow(pa.table({
            "cluster_id": pa.array([], pa.int64()),
            "n_cells": pa.array([], pa.int64()),
            "n_points": pa.array([], pa.int64()),
        }))

    def adjacency(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy(zero_copy_only=False)
        # rightward (ix+1) and upward (iy+1) candidates; iy < 20 << 64
        # so +1 never carries across the packing boundary
        return pa.table({
            "a": pa.array(np.concatenate([k, k])),
            "b": pa.array(np.concatenate([k + 64, k + 1])),
        })

    cand = dense.map_batches(adjacency, batch_format="pyarrow")
    edges = semi_join(cand, dense, "b", "k")  # keep edges whose nb is dense
    cc = connected_components(edges, "a", "b", n_buckets=4)
    singles = anti_join(dense.select_columns(["k"]), cc, "k", "node")
    labels = cc.union(
        singles.map_batches(
            lambda t: pa.table({"node": t["k"], "cluster_id": t["k"]}),
            batch_format="pyarrow",
        )
    )
    labeled = lookup_join(dense, "k", labels, "node", "cluster_id")
    out = labeled.map_batches(
        lambda t: pa.table({
            "cluster_id": t["cluster_id"],
            "one": pa.array(np.ones(len(t), np.int64)),
            "n": t["n"],
        }),
        batch_format="pyarrow",
    ).groupby("cluster_id").sum(["one", "n"])
    return _rename(out, ["cluster_id", "n_cells", "n_points"])


QUERIES["spatial_dbscan_events"] = q_spatial_dbscan_events
ORACLE_SQL["spatial_dbscan_events"] = f"""
        WITH RECURSIVE pts AS (
            SELECT CAST(floor(((CAST(event_id * 2654435761 % 4294967296
                                     AS DOUBLE) / 4294967296.0)
                               * (CAST(event_id * 2654435761 % 4294967296
                                       AS DOUBLE) / 4294967296.0))
                              * 10.0 / 0.5) AS BIGINT) AS ix,
                   CAST(floor(((CAST((event_id * 40503 + 7) % 65536
                                     AS DOUBLE) / 65536.0)
                               * (CAST((event_id * 40503 + 7) % 65536
                                       AS DOUBLE) / 65536.0))
                              * 10.0 / 0.5) AS BIGINT) AS iy
            FROM events),
        cells AS (SELECT ix * 64 + iy AS k, count(*) AS n
                  FROM pts GROUP BY 1),
        dense AS (SELECT k, n FROM cells WHERE n >= {_DBSCAN_MINPTS}),
        e0 AS (SELECT d.k AS a, nb.k AS b
               FROM dense d JOIN dense nb
                 ON nb.k = d.k + 64 OR nb.k = d.k + 1),
        e AS (SELECT a AS u, b AS v FROM e0 UNION SELECT b, a FROM e0),
        walk(u, lbl) AS (
            SELECT u, u FROM (SELECT DISTINCT u FROM e)
            UNION
            SELECT e.u, w.lbl FROM e JOIN walk w ON w.u = e.v
        ),
        cc AS (SELECT u AS node, min(lbl) AS cluster_id FROM walk GROUP BY u),
        lab AS (SELECT d.k, d.n,
                       coalesce(cc.cluster_id, d.k) AS cluster_id
                FROM dense d LEFT JOIN cc ON cc.node = d.k)
        SELECT cluster_id, count(*) AS n_cells,
               CAST(SUM(n) AS BIGINT) AS n_points
        FROM lab GROUP BY 1
    """


# ---------------------------------------------------------------------------
# Time-RANGE windowed aggregate + decorrelated correlated-aggregate subquery
# ---------------------------------------------------------------------------

def q_range_window_events(sf_dir: str):
    """RANGE-frame time window (relational.grouped_range_rolling):
    per-user trailing 1-hour sum + count of value, ordered by ts —
    the value-based frame the ROWS-frame rolling op can't express
    (peers at the same timestamp share one frame, exactly SQL's RANGE
    semantics). Values on the e4 integer lattice so the prefix-sum
    difference replays bit-exactly."""
    from geotile.ops.relational import grouped_range_rolling

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    HOUR_US = 3_600_000_000

    def quant(t: pa.Table) -> pa.Table:
        v = pc.floor(pc.add(pc.multiply(t["value"], pa.scalar(10000.0)),
                            pa.scalar(0.5))).cast(pa.int64())
        return pa.table({
            "event_id": t["event_id"],
            "user_id": t["user_id"],
            "tsi": t["ts"].cast(pa.int64()),
            "v_e4": v,
        })

    rolled = grouped_range_rolling(
        ev.map_batches(quant, batch_format="pyarrow", zero_copy_batch=True),
        key="user_id", ts_col="tsi", val="v_e4", span=HOUR_US,
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t["event_id"].cast(pa.int64()),
            "range_sum_e4": t["range_sum"].cast(pa.int64()),
            "range_n": t["range_n"].cast(pa.int64()),
        })

    return rolled.map_batches(finish, batch_format="pyarrow")


QUERIES["range_window_events"] = q_range_window_events
ORACLE_SQL["range_window_events"] = """
        SELECT event_id,
               SUM(CAST(floor(value * 10000.0 + 0.5) AS BIGINT)) OVER w
                 AS range_sum_e4,
               COUNT(*) OVER w AS range_n
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                           AND CURRENT ROW)
    """


def q_above_avg_orders(sf_dir: str):
    """Correlated aggregate subquery, decorrelated (the TPC-H Q17
    family): orders whose price exceeds 1.5x their OWN customer's
    average order price. Plan = one customer-scale groupby building
    (sum_cents, n) packed into a single int64 dim value, then a
    size-guarded lookup_join appends it to every fact row — zero
    fact-side shuffle — and the filter compares the exact integer
    rational 2·price·n > 3·sum (no float division anywhere, so the
    threshold can't flip on summation order)."""
    from geotile.ops.relational import lookup_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def cents(t: pa.Table) -> pa.Table:
        c = pc.floor(pc.add(pc.multiply(t["o_totalprice"], pa.scalar(100.0)),
                            pa.scalar(0.5))).cast(pa.int64())
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_custkey": t["o_custkey"],
                         "cents": c})

    fact = orders.map_batches(cents, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()

    def partial(t: pa.Table) -> pa.Table:
        g = t.select(["o_custkey", "cents"]).group_by("o_custkey").aggregate(
            [("cents", "sum"), ([], "count_all")])
        return pa.table({"o_custkey": g["o_custkey"],
                         "s": g["cents_sum"],
                         "n": g["count_all"].cast(pa.int64())})

    agg = fact.map_batches(partial, batch_format="pyarrow").groupby(
        "o_custkey").sum(["s", "n"])

    def pack(t: pa.Table) -> pa.Table:
        s = t["sum(s)"].to_numpy(zero_copy_only=False)
        n = t["sum(n)"].to_numpy(zero_copy_only=False)
        assert (n < (1 << 16)).all() and (s < (1 << 46)).all(), \
            "above_avg packing contract: n < 2^16, sum_cents < 2^46"
        return pa.table({"o_custkey": t["o_custkey"],
                         "packed": pa.array(s * (1 << 16) + n)})

    dim = agg.map_batches(pack, batch_format="pyarrow")
    joined = lookup_join(fact, "o_custkey", dim, "o_custkey", "packed")

    def keep(t: pa.Table) -> pa.Table:
        p = t["packed"].to_numpy(zero_copy_only=False)
        s, n = p >> 16, p & 0xFFFF
        c = t["cents"].to_numpy(zero_copy_only=False)
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_custkey": t["o_custkey"],
                         "price_cents": t["cents"]}).filter(
            pa.array(2 * c * n > 3 * s))

    return joined.map_batches(keep, batch_format="pyarrow")


QUERIES["above_avg_orders"] = q_above_avg_orders
ORACLE_SQL["above_avg_orders"] = """
        WITH f AS (SELECT o_orderkey, o_custkey,
                          CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
                            AS cents
                   FROM orders),
        c AS (SELECT o_custkey, SUM(cents) AS s, COUNT(*) AS n
              FROM f GROUP BY 1)
        SELECT f.o_orderkey, f.o_custkey, f.cents AS price_cents
        FROM f JOIN c USING (o_custkey)
        WHERE 2 * f.cents * c.n > 3 * c.s
    """


def q_streaks_users(sf_dir: str):
    """Gaps-and-islands (the SQL `step - ROW_NUMBER()` classic): per
    user, maximal runs of CONSECUTIVE active hours — longest streak,
    its start, island count, distinct active hours. Plan = per-batch
    (user, hour) Arrow dedup partial (the shuffle carries distinct
    pairs, never raw events), then ops/relational.grouped_islands: one
    hash co-partition on user_id and a single vectorized pass per
    bucket group (lexsort + run-length via np.diff + per-key
    reduceat). Reference parity: the dedup-then-order family of
    gtfs-to-geojson's stop-sequence handling (SURVEY O1/D2), lifted to
    the time axis."""
    from geotile.ops.relational import grouped_islands

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def hours(t: pa.Table) -> pa.Table:
        h = pc.divide(t["ts"].cast(pa.int64()),
                      pa.scalar(3_600_000_000, pa.int64()))
        return pa.table({"user_id": t["user_id"], "h": h}).group_by(
            ["user_id", "h"]).aggregate([])

    pairs = ev.map_batches(hours, batch_format="pyarrow",
                           zero_copy_batch=True)
    # block-count law: the dedup partials are pair-cardinality (tiny)
    # but arrive as one block per read block — coalesce before the
    # co-partition groupby so its sort machinery sees 4 blocks, not 64
    # (measured 4.9 -> ~1s warm at sf0.1/32cpu)
    return grouped_islands(pairs.repartition(4), "user_id", "h")


QUERIES["streaks_users"] = q_streaks_users
ORACLE_SQL["streaks_users"] = """
        WITH d AS (SELECT DISTINCT user_id,
                          epoch_us(ts) // 3600000000 AS h FROM events),
        r AS (SELECT user_id, h,
                     h - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY h)
                       AS grp
              FROM d),
        i AS (SELECT user_id, min(h) AS start, count(*) AS len
              FROM r GROUP BY user_id, grp),
        i2 AS (SELECT *, max(len) OVER (PARTITION BY user_id) AS mx FROM i)
        SELECT user_id, count(*) AS n_islands,
               CAST(max(len) AS BIGINT) AS longest,
               min(start) FILTER (WHERE len = mx) AS longest_start,
               CAST(sum(len) AS BIGINT) AS n_active
        FROM i2 GROUP BY user_id
    """


def q_novelty_daily(sf_dir: str):
    """First-seen novelty curve: how many NEW (user, event_type) pairs
    appear each day — the discovery-rate statistic of a growing corpus
    (same shape as "new URLs/day" in a crawl). Plan = pack the pair
    into ONE int64 key (user_id * 8 + type index over the closed
    5-type vocabulary — asserted), per-batch min-ts partial, a
    pair-cardinality groupby min, then a day-scale count. The fact
    table is never shuffled; the one exchange carries distinct pairs
    only (multi-key-groupby law: packed single-int key)."""
    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts"])
    types = pa.array(["click", "error", "purchase", "signup", "view"])

    def partial(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t["event_type"], value_set=types)
        assert idx.null_count == 0, "novelty packing: unseen event_type"
        k = pc.add(pc.multiply(t["user_id"], pa.scalar(8, pa.int64())),
                   idx.cast(pa.int64()))
        us = t["ts"].cast(pa.int64())
        g = pa.table({"k": k, "us": us}).group_by("k").aggregate(
            [("us", "min")])
        return g.rename_columns(["k", "us"])

    firsts = ev.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True).groupby("k").min("us")

    def to_day(t: pa.Table) -> pa.Table:
        day = pc.divide(t["min(us)"], pa.scalar(86_400_000_000, pa.int64()))
        g = pa.table({"day": day}).group_by("day").aggregate(
            [([], "count_all")])
        return g.rename_columns(["day", "n_new"])

    out = (firsts.map_batches(to_day, batch_format="pyarrow")
           .groupby("day").sum("n_new"))
    return _rename(out, ["day", "n_new"])


QUERIES["novelty_daily"] = q_novelty_daily
ORACLE_SQL["novelty_daily"] = """
        WITH f AS (SELECT user_id, event_type, min(epoch_us(ts)) AS us
                   FROM events GROUP BY 1, 2)
        SELECT us // 86400000000 AS day, count(*) AS n_new
        FROM f GROUP BY 1
    """


def q_snapshot_diff_orders(sf_dir: str):
    """Change-data-capture: diff two snapshots of the orders table —
    snapshot A drops every 97th key ("deleted later"), snapshot B drops
    every 89th key ("not yet created") and bumps every 7th key's price
    by 500 cents ("updated") — emitting added/removed/changed rows
    only. Plan = ops/relational.snapshot_diff: one co-partition per
    side, a single vectorized sorted-composite classify per bucket
    (no pandas merge), output at change-cardinality with -1 sentinels
    keeping the value columns non-nullable."""
    from geotile.ops.relational import snapshot_diff

    def snap(which: str):
        def fn(t: pa.Table) -> pa.Table:
            k = t["o_orderkey"].to_numpy(zero_copy_only=False)
            cents = pc.floor(pc.add(pc.multiply(
                t["o_totalprice"], pa.scalar(100.0)),
                pa.scalar(0.5))).cast(pa.int64()).to_numpy(
                    zero_copy_only=False)
            if which == "a":
                keep = k % 97 != 0
                return pa.table({"o_orderkey": k[keep], "cents": cents[keep]})
            keep = k % 89 != 0
            bump = np.where(k % 7 == 0, 500, 0)
            return pa.table({"o_orderkey": k[keep],
                             "cents": (cents + bump)[keep]})

        return fn

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    a = orders.map_batches(snap("a"), batch_format="pyarrow",
                           zero_copy_batch=True)
    b = orders.map_batches(snap("b"), batch_format="pyarrow",
                           zero_copy_batch=True)
    out = snapshot_diff(a, b, "o_orderkey", "cents")
    return _rename(out, ["o_orderkey", "change", "a_cents", "b_cents"])


QUERIES["snapshot_diff_orders"] = q_snapshot_diff_orders
ORACLE_SQL["snapshot_diff_orders"] = """
        WITH f AS (SELECT o_orderkey,
                          CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
                            AS cents
                   FROM orders),
        a AS (SELECT o_orderkey, cents FROM f WHERE o_orderkey % 97 <> 0),
        b AS (SELECT o_orderkey,
                     cents + CASE WHEN o_orderkey % 7 = 0
                                  THEN 500 ELSE 0 END AS cents
              FROM f WHERE o_orderkey % 89 <> 0)
        SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
               CASE WHEN a.o_orderkey IS NULL THEN 'added'
                    WHEN b.o_orderkey IS NULL THEN 'removed'
                    ELSE 'changed' END AS change,
               COALESCE(a.cents, -1) AS a_cents,
               COALESCE(b.cents, -1) AS b_cents
        FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
        WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
           OR a.cents <> b.cents
    """


def q_profile_orders(sf_dir: str):
    """Data-quality profile of the orders table: per-column null
    count, EXACT distinct count, min/max — the pre-training ingest
    audit. Plan = ops/profile.profile_dataset: a column-cardinality
    bounds pass (one row per column per batch) + a distinct pass whose
    per-batch Arrow dedup bounds the one shuffle by distinct values;
    floats profile on the cents lattice, timestamps as epoch-µs, so
    every cell is exact against the SQL replay."""
    from geotile.ops.profile import profile_dataset

    ds = _read(sf_dir, "orders")
    return profile_dataset(ds, {
        "o_orderkey": "int",
        "o_custkey": "int",
        "o_orderstatus": "str",
        "o_totalprice": "cents",
        "o_orderdate": "ts_us",
        "o_orderpriority": "str",
    })


QUERIES["profile_orders"] = q_profile_orders
ORACLE_SQL["profile_orders"] = """
        WITH f AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                          CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
                            AS cents,
                          epoch_us(o_orderdate) AS us, o_orderpriority
                   FROM orders)
        SELECT 'o_custkey' AS col,
               count(*) - count(o_custkey) AS nulls,
               count(DISTINCT o_custkey) AS n_distinct,
               CAST(min(o_custkey) AS VARCHAR) AS min_v,
               CAST(max(o_custkey) AS VARCHAR) AS max_v FROM f
        UNION ALL
        SELECT 'o_orderdate', count(*) - count(us), count(DISTINCT us),
               CAST(min(us) AS VARCHAR), CAST(max(us) AS VARCHAR) FROM f
        UNION ALL
        SELECT 'o_orderkey', count(*) - count(o_orderkey),
               count(DISTINCT o_orderkey),
               CAST(min(o_orderkey) AS VARCHAR),
               CAST(max(o_orderkey) AS VARCHAR) FROM f
        UNION ALL
        SELECT 'o_orderpriority', count(*) - count(o_orderpriority),
               count(DISTINCT o_orderpriority),
               min(o_orderpriority), max(o_orderpriority) FROM f
        UNION ALL
        SELECT 'o_orderstatus', count(*) - count(o_orderstatus),
               count(DISTINCT o_orderstatus),
               min(o_orderstatus), max(o_orderstatus) FROM f
        UNION ALL
        SELECT 'o_totalprice', count(*) - count(cents),
               count(DISTINCT cents),
               CAST(min(cents) AS VARCHAR), CAST(max(cents) AS VARCHAR) FROM f
    """


def q_linear_scores_embeddings(sf_dir: str):
    """Batched model inference + top-k: score every embedding with a
    broadcast linear model (deterministic int weights w_j =
    ((j+1)·2654435761) mod 2001 − 1000) and keep the global top-20 —
    the relevance-scoring / reranking stage of a retrieval pipeline.
    Per batch the list column flattens zero-copy to an (n × d) matrix
    and ONE float64 BLAS matvec scores all rows on the trunc(v·10⁴)
    lattice (exact: |score| ≤ 64·10⁴·10³ ≪ 2^53); each batch emits
    only its top-20 partial, so the final reduce sees k·num_blocks
    rows, never the corpus."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    K = 20

    def score(t: pa.Table) -> pa.Table:
        col = t["embedding"].combine_chunks()
        n = len(col)
        if n == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.int64())})
        vals = col.values.to_numpy(zero_copy_only=False)
        d = len(vals) // n
        j = np.arange(d, dtype=np.int64)
        w = ((j + 1) * 2654435761) % 2001 - 1000
        q = np.trunc(vals.reshape(n, d).astype(np.float64) * 10000.0)
        s = (q @ w.astype(np.float64)).astype(np.int64)
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        # partial top-K by (score desc, vec_id asc)
        order = np.lexsort([ids, -s])[:K]
        return pa.table({"vec_id": pa.array(ids[order]),
                         "score": pa.array(s[order])})

    parts = emb.map_batches(score, batch_format="pyarrow",
                            zero_copy_batch=True,
                            batch_size=65536).materialize()
    df = parts.to_pandas()  # k × num_blocks rows — tiny final reduce
    df = df.sort_values(["score", "vec_id"], ascending=[False, True],
                        kind="stable").head(K).reset_index(drop=True)
    return df


QUERIES["linear_scores_embeddings"] = q_linear_scores_embeddings
ORACLE_SQL["linear_scores_embeddings"] = """
        WITH e AS (SELECT vec_id,
                          unnest(range(len(embedding))) AS j,
                          CAST(trunc(CAST(unnest(embedding) AS DOUBLE)
                                     * 10000) AS BIGINT) AS q
                   FROM embeddings),
        s AS (SELECT vec_id,
                     SUM(q * (((j + 1) * 2654435761) % 2001 - 1000)) AS sc
              FROM e GROUP BY 1)
        SELECT vec_id, CAST(sc AS BIGINT) AS score
        FROM s ORDER BY sc DESC, vec_id LIMIT 20
    """


def q_revenue_deciles(sf_dir: str):
    """Revenue-concentration report: rank every customer by exact
    lifetime revenue and aggregate per decile (rank-formula decile
    ``idx·10 // n``, NOT value quantiles — ties split by custkey).
    Plan = customer-scale revenue groupby, then
    ops/relational.global_row_number: a distributed ROW_NUMBER with no
    all-to-all sort — one bucket-cardinality count partial on the
    order-aligned coarse bucket (cents >> 16), a driver exclusive scan
    over bucket counts, one co-partition pass lexsorting each bucket
    from its broadcast base offset — and a decile-scale final sum."""
    from geotile.ops.relational import global_row_number

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.floor(pc.add(pc.multiply(
            t["o_totalprice"], pa.scalar(100.0)),
            pa.scalar(0.5))).cast(pa.int64())
        g = pa.table({"o_custkey": t["o_custkey"], "rev": cents}).group_by(
            "o_custkey").aggregate([("rev", "sum")])
        return g.rename_columns(["o_custkey", "rev"])

    rev = (orders.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
           .groupby("o_custkey").sum("rev"))
    rev = _rename(rev, ["o_custkey", "rev"]).materialize()  # customer-scale
    n = rev.count()
    ranked = global_row_number(rev, "rev", "o_custkey", shift=16)

    def to_decile(t: pa.Table) -> pa.Table:
        dec = pc.divide(pc.multiply(t["idx"], pa.scalar(10, pa.int64())),
                        pa.scalar(n, pa.int64()))
        g = pa.table({"decile": dec, "rev": t["rev"],
                      }).group_by("decile").aggregate(
            [("rev", "sum"), ([], "count_all")])
        return pa.table({"decile": g["decile"],
                         "revenue": g["rev_sum"],
                         "n_cust": g["count_all"].cast(pa.int64())})

    out = (ranked.map_batches(to_decile, batch_format="pyarrow")
           .groupby("decile").sum(["revenue", "n_cust"]))
    return _rename(out, ["decile", "revenue", "n_cust"])


QUERIES["revenue_deciles"] = q_revenue_deciles
ORACLE_SQL["revenue_deciles"] = """
        WITH r AS (SELECT o_custkey,
                          SUM(CAST(floor(o_totalprice * 100.0 + 0.5)
                                   AS BIGINT)) AS rev
                   FROM orders GROUP BY 1),
        k AS (SELECT o_custkey, rev,
                     ROW_NUMBER() OVER (ORDER BY rev, o_custkey) - 1 AS idx,
                     COUNT(*) OVER () AS n
              FROM r)
        SELECT (idx * 10) // n AS decile,
               CAST(SUM(rev) AS BIGINT) AS revenue,
               COUNT(*) AS n_cust
        FROM k GROUP BY 1
    """


def q_fuzzy_token_pairs_docs(sf_dir: str):
    """Fuzzy vocabulary dedup (FastSS, Bocek et al. 2007): every
    distinct token pair within Levenshtein distance 2, with corpus
    counts — the spelling-variant collapse step of a text-cleaning
    pipeline. Plan = ops/fuzzy.fuzzy_token_pairs: one corpus-scale
    token-count groupby, then everything runs at VOCABULARY scale —
    deletion-neighborhood candidate generation (lev<=d pairs must
    share a <=d-deletion variant), hash-bucketed all-pairs inside
    variant runs, pair-string dedup, exact DP verify at candidate
    scale. The oracle replays with DuckDB's levenshtein over the
    distinct-token self-join."""
    from geotile.ops.fuzzy import fuzzy_token_pairs

    return fuzzy_token_pairs(_read(sf_dir, "documents", ["text"]),
                             max_d=2)


QUERIES["fuzzy_token_pairs_docs"] = q_fuzzy_token_pairs_docs
ORACLE_SQL["fuzzy_token_pairs_docs"] = """
        WITH v AS (SELECT w AS tok, count(*) AS n
                   FROM (SELECT unnest(string_split(text, ' ')) AS w
                         FROM documents)
                   GROUP BY 1)
        SELECT a.tok AS tok_a, b.tok AS tok_b,
               CAST(levenshtein(a.tok, b.tok) AS BIGINT) AS dist,
               a.n AS n_a, b.n AS n_b
        FROM v a JOIN v b
          ON a.tok < b.tok AND levenshtein(a.tok, b.tok) <= 2
    """


def q_session_concurrency_events(sf_dir: str):
    """Peak concurrency sweep-line (interval algebra): sessionize
    events (30-min gap), then find the maximum number of sessions
    active at once, the earliest instant it happens, and the session
    count. Plan = relational.session_intervals (one co-partition,
    vectorized lexsort/reduceat sessions-to-intervals) feeding
    relational.interval_max_concurrency — a GLOBAL prefix sum over
    boundary deltas done with the order-aligned coarse-bucket pattern
    (per-bucket delta sums, driver exclusive scan, per-bucket cumsum
    from broadcast bases, bucket-cardinality final reduce). Per-ts
    delta grouping makes equal-time starts/ends tie-break-free."""
    from geotile.ops.relational import (interval_max_concurrency,
                                        session_intervals)

    ev = _read(sf_dir, "events", ["user_id", "ts"])
    return interval_max_concurrency(session_intervals(ev))


QUERIES["session_concurrency_events"] = q_session_concurrency_events
ORACLE_SQL["session_concurrency_events"] = """
        WITH s AS (SELECT user_id, epoch_us(ts) AS us,
                          CASE WHEN lag(ts) OVER w IS NULL
                                    OR ts - lag(ts) OVER w
                                       > INTERVAL 30 MINUTE
                               THEN 1 ELSE 0 END AS is_new
                   FROM events
                   WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        s2 AS (SELECT user_id, us,
                      SUM(is_new) OVER (PARTITION BY user_id ORDER BY us
                                        ROWS UNBOUNDED PRECEDING) AS sid
               FROM s),
        iv AS (SELECT user_id, sid, min(us) AS a, max(us) AS b
               FROM s2 GROUP BY 1, 2),
        bd AS (SELECT a AS t, 1 AS d FROM iv
               UNION ALL SELECT b + 1, -1 FROM iv),
        g AS (SELECT t, SUM(d) AS d FROM bd GROUP BY t),
        run AS (SELECT t, SUM(d) OVER (ORDER BY t
                                       ROWS UNBOUNDED PRECEDING) AS cc
                FROM g),
        m AS (SELECT max(cc) AS mx FROM run)
        SELECT CAST(m.mx AS BIGINT) AS max_cc,
               CAST(min(run.t) AS BIGINT) AS t_at_max,
               (SELECT count(*) FROM iv) AS n_intervals
        FROM run JOIN m ON run.cc = m.mx
        GROUP BY m.mx
    """


def q_sliding_distinct_users(sf_dir: str):
    """Sliding-window COUNT DISTINCT (3-hour window, 1-hour hop): how
    many distinct users were active in each trailing 3h window — the
    distinct-cardinality variant the sliding SUM windows can't
    express. Plan = explode each event into its 3 covering windows,
    pack (window, user) into ONE int64 key (user < 2^33 asserted,
    hour index < 2^30), per-batch Arrow dedup partial so the one
    shuffle carries distinct pairs, then a window-scale count."""
    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def explode(t: pa.Table) -> pa.Table:
        h = pc.divide(t["ts"].cast(pa.int64()),
                      pa.scalar(3_600_000_000, pa.int64()))
        u = t["user_id"].to_numpy(zero_copy_only=False)
        assert (u < (1 << 33)).all() and u.min(initial=0) >= 0, \
            "sliding_distinct packing contract: user_id < 2^33"
        hv = h.to_numpy(zero_copy_only=False)
        ks = [((hv - k) << 33) | u for k in (0, 1, 2)]
        g = pa.table({"k": pa.array(np.concatenate(ks))}).group_by(
            "k").aggregate([])
        return g

    pairs = ev.map_batches(explode, batch_format="pyarrow",
                           zero_copy_batch=True).groupby("k").count()

    def to_window(t: pa.Table) -> pa.Table:
        w = pc.shift_right(t["k"], pa.scalar(33))
        g = pa.table({"w": w}).group_by("w").aggregate([([], "count_all")])
        return g.rename_columns(["w", "n_users"])

    out = (pairs.map_batches(to_window, batch_format="pyarrow")
           .groupby("w").sum("n_users"))
    return _rename(out, ["w", "n_users"])


QUERIES["sliding_distinct_users"] = q_sliding_distinct_users
ORACLE_SQL["sliding_distinct_users"] = """
        WITH x AS (SELECT DISTINCT
                          (epoch_us(ts) // 3600000000) - k AS w, user_id
                   FROM events CROSS JOIN unnest([0, 1, 2]) AS t(k))
        SELECT w, count(*) AS n_users FROM x GROUP BY 1
    """


def q_running_revenue_orders(sf_dir: str):
    """Running total (SUM OVER ... ROWS UNBOUNDED PRECEDING): each
    order's cumulative customer revenue and order sequence number, in
    (date, key) order. Plan = relational.grouped_rolling with the
    frame opened to the whole run (one key co-partition, prefix sums
    clamped to run starts — unbounded is the frame=infinity special
    case of the ROWS-frame family). Exact-integer cents lattice so the
    cumulative sum is association-order-proof."""
    from geotile.ops.relational import grouped_rolling

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_totalprice",
                    "o_orderdate"])

    def prep(t: pa.Table) -> pa.Table:
        cents = pc.floor(pc.add(pc.multiply(
            t["o_totalprice"], pa.scalar(100.0)),
            pa.scalar(0.5))).cast(pa.int64())
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_custkey": t["o_custkey"],
                         "date_us": t["o_orderdate"].cast(pa.int64()),
                         "cents": cents})

    ds = orders.map_batches(prep, batch_format="pyarrow",
                            zero_copy_batch=True)
    out = grouped_rolling(ds, "o_custkey", ["date_us", "o_orderkey"],
                          "cents", frame=1 << 40)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "running_cents": t["roll_sum"],
                         "seq": t["roll_n"]})

    return out.map_batches(finish, batch_format="pyarrow")


QUERIES["running_revenue_orders"] = q_running_revenue_orders
ORACLE_SQL["running_revenue_orders"] = """
        SELECT o_orderkey,
               SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                 OVER w AS running_cents,
               COUNT(*) OVER w AS seq
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """


def q_session_stats_users(sf_dir: str):
    """Session-length distribution: for each session size (events per
    session) the number of sessions and their total wall duration —
    the engagement histogram of a sessionized event stream. Plan =
    relational.session_intervals (one co-partition, vectorized
    lexsort/reduceat pass emitting per-session rows with n_rows), then
    a per-batch Arrow partial and a session-size-scale groupby."""
    from geotile.ops.relational import session_intervals

    iv = session_intervals(_read(sf_dir, "events", ["user_id", "ts"]))

    def partial(t: pa.Table) -> pa.Table:
        dur = pc.subtract(t["b_us"], t["a_us"])
        g = pa.table({"n_events": t["n_rows"], "dur": dur}).group_by(
            "n_events").aggregate([([], "count_all"), ("dur", "sum")])
        return pa.table({"n_events": g["n_events"],
                         "n_sessions": g["count_all"].cast(pa.int64()),
                         "sum_duration_us": g["dur_sum"]})

    out = (iv.map_batches(partial, batch_format="pyarrow")
           .groupby("n_events").sum(["n_sessions", "sum_duration_us"]))
    return _rename(out, ["n_events", "n_sessions", "sum_duration_us"])


QUERIES["session_stats_users"] = q_session_stats_users
ORACLE_SQL["session_stats_users"] = """
        WITH s AS (SELECT user_id, epoch_us(ts) AS us,
                          CASE WHEN lag(ts) OVER w IS NULL
                                    OR ts - lag(ts) OVER w
                                       > INTERVAL 30 MINUTE
                               THEN 1 ELSE 0 END AS is_new
                   FROM events
                   WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        s2 AS (SELECT user_id, us,
                      SUM(is_new) OVER (PARTITION BY user_id ORDER BY us
                                        ROWS UNBOUNDED PRECEDING) AS sid
               FROM s),
        iv AS (SELECT user_id, sid, min(us) AS a, max(us) AS b,
                      count(*) AS n_ev
               FROM s2 GROUP BY 1, 2)
        SELECT CAST(n_ev AS BIGINT) AS n_events,
               count(*) AS n_sessions,
               CAST(SUM(b - a) AS BIGINT) AS sum_duration_us
        FROM iv GROUP BY 1
    """


def q_upsert_orders(sf_dir: str):
    """Lakehouse MERGE / upsert compaction: apply an update batch to
    the orders snapshot — every 10th key's row is REPLACED (status 'U',
    price +1111 cents), every 500th key also INSERTS a new row under
    key+10^9 — untouched rows pass through. Plan =
    relational.upsert_merge: one co-partition per side, winners
    resolved in one vectorized lexsort keep-last pass (no pandas
    merge), with a one-row-per-key-per-side contract assert."""
    from geotile.ops.relational import upsert_merge

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderstatus", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        cents = pc.floor(pc.add(pc.multiply(
            t["o_totalprice"], pa.scalar(100.0)),
            pa.scalar(0.5))).cast(pa.int64())
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_orderstatus": t["o_orderstatus"],
                         "cents": cents})

    base = orders.map_batches(prep, batch_format="pyarrow",
                              zero_copy_batch=True)

    def updates(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False)
        c = t["cents"].to_numpy(zero_copy_only=False)
        rep = k % 10 == 0
        ins = k % 500 == 0
        return pa.table({
            "o_orderkey": np.r_[k[rep], k[ins] + 1_000_000_000],
            "o_orderstatus": pa.array(
                ["U"] * int(rep.sum()) + ["N"] * int(ins.sum())),
            "cents": np.r_[c[rep] + 1111, c[ins]],
        })

    upd = base.map_batches(updates, batch_format="pyarrow")
    return upsert_merge(base, upd, "o_orderkey")


QUERIES["upsert_orders"] = q_upsert_orders
ORACLE_SQL["upsert_orders"] = """
        WITH base AS (SELECT o_orderkey, o_orderstatus,
                             CAST(floor(o_totalprice * 100.0 + 0.5)
                                  AS BIGINT) AS cents
                      FROM orders),
        upd AS (SELECT o_orderkey, 'U' AS o_orderstatus,
                       cents + 1111 AS cents
                FROM base WHERE o_orderkey % 10 = 0
                UNION ALL
                SELECT o_orderkey + 1000000000, 'N', cents
                FROM base WHERE o_orderkey % 500 = 0)
        SELECT * FROM upd
        UNION ALL
        SELECT * FROM base
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
    """


def q_label_centroids(sf_dir: str):
    """Grouped vector aggregate (class centroids): per (label, dim)
    the exact count and lattice coordinate sum — the supervised
    counterpart of the covariance moments, and the input to LDA /
    nearest-centroid classifiers. Per batch the list column flattens
    zero-copy to an (n × d) matrix; rows group by label with ONE
    argsort + reduceat (no per-label Python); partials pack
    (label, dim) into a single int64 key so the pair-cardinality
    groupby stays on the cheap path. The float centroid itself
    (s_q/n) is a scalar epilogue left out of the compared columns."""
    emb = _read(sf_dir, "embeddings", ["label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        col = t["embedding"].combine_chunks()
        n = len(col)
        if n == 0:
            return pa.table({"key": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "s_q": pa.array([], pa.int64())})
        vals = col.values.to_numpy(zero_copy_only=False)
        d = len(vals) // n
        q = np.trunc(vals.reshape(n, d).astype(np.float64) * 10000.0)
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(lab, kind="stable")
        q, lab = q[order], lab[order]
        start = np.flatnonzero(np.r_[True, lab[1:] != lab[:-1]])
        cnt = np.diff(np.r_[start, n])
        sums = np.add.reduceat(q, start, axis=0)  # (labels, d)
        ul = lab[start]
        key = (np.repeat(ul, d) * 4096 +
               np.tile(np.arange(d, dtype=np.int64), len(ul)))
        return pa.table({
            "key": pa.array(key),
            "n": pa.array(np.repeat(cnt, d).astype(np.int64)),
            "s_q": pa.array(sums.reshape(-1).astype(np.int64)),
        })

    agg = (emb.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=65536)
           .groupby("key").sum(["n", "s_q"]))

    def unpack(t: pa.Table) -> pa.Table:
        k = t["key"].to_numpy(zero_copy_only=False)
        return pa.table({"label": pa.array(k // 4096),
                         "dim": pa.array(k % 4096),
                         "n": t["sum(n)"],
                         "s_q": t["sum(s_q)"]})

    return agg.map_batches(unpack, batch_format="pyarrow")


QUERIES["label_centroids"] = q_label_centroids
ORACLE_SQL["label_centroids"] = """
        WITH e AS (SELECT label,
                          unnest(range(len(embedding))) AS dim,
                          CAST(trunc(CAST(unnest(embedding) AS DOUBLE)
                                     * 10000) AS BIGINT) AS q
                   FROM embeddings)
        SELECT CAST(label AS BIGINT) AS label, dim,
               count(*) AS n, CAST(SUM(q) AS BIGINT) AS s_q
        FROM e GROUP BY 1, 2
    """


def q_dense_rank_orders(sf_dir: str):
    """Per-key DENSE_RANK window (rank of each order inside its
    customer by price, ties share a rank with no gaps) — the in-group
    ranking member of the window family (alongside lag, rolling,
    range, ntile, percent_rank). One hash co-partition on custkey,
    then each bucket group ranks ALL its keys in a single vectorized
    pass: lexsort by (key, cents desc), distinct-value cumsum reset at
    run starts. No global sort, no per-key Python."""
    from geotile.ops.relational import _with_bucket

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        cents = pc.floor(pc.add(pc.multiply(
            t["o_totalprice"], pa.scalar(100.0)),
            pa.scalar(0.5))).cast(pa.int64())
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_custkey": t["o_custkey"], "cents": cents})

    ds = orders.map_batches(prep, batch_format="pyarrow",
                            zero_copy_batch=True)

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        k = df["o_custkey"].to_numpy(np.int64)
        c = df["cents"].to_numpy(np.int64)
        order = np.lexsort([-c, k])
        df = df.iloc[order].drop(columns=["bucket"]).reset_index(drop=True)
        k, c = k[order], c[order]
        new_run = np.r_[True, k[1:] != k[:-1]]
        new_val = np.r_[True, new_run[1:] | (c[1:] != c[:-1])]
        d = np.cumsum(new_val)
        run_start_d = d[np.flatnonzero(new_run)[np.cumsum(new_run) - 1]]
        df["drank"] = (d - run_start_d + 1).astype(np.int64)
        return df

    out = (_with_bucket(ds, "o_custkey", 32)
           .groupby("bucket").map_groups(rank, batch_format="pandas"))
    return out.select_columns(["o_orderkey", "drank"])


QUERIES["dense_rank_orders"] = q_dense_rank_orders
ORACLE_SQL["dense_rank_orders"] = """
        SELECT o_orderkey,
               DENSE_RANK() OVER (
                   PARTITION BY o_custkey
                   ORDER BY CAST(floor(o_totalprice * 100.0 + 0.5)
                                 AS BIGINT) DESC) AS drank
        FROM orders
    """


def q_double_charge_orders(sf_dir: str):
    """Duplicate-transaction detection (GROUP BY ... HAVING n >= 2):
    customers with 2+ orders in the same $1000 price band — the
    anomaly-screening scan of a payments pipeline. Pack
    (custkey, band) into ONE int64 key (band < 2^27 over the $1000
    lattice, custkey < 2^36 asserted), per-batch count partials, one
    pair-cardinality groupby, filter n >= 2 inside the epilogue
    batch (HAVING never materializes the passing groups driver-side)."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.floor(pc.add(pc.multiply(
            t["o_totalprice"], pa.scalar(100.0)),
            pa.scalar(0.5))).cast(pa.int64()).to_numpy(
                zero_copy_only=False)
        band = cents // 100_000
        cust = t["o_custkey"].to_numpy(zero_copy_only=False)
        assert (cust < (1 << 36)).all() and (band < (1 << 27)).all(), \
            "double_charge packing contract"
        k = cust * (1 << 27) + band
        g = pa.table({"k": pa.array(k)}).group_by("k").aggregate(
            [([], "count_all")])
        return g.rename_columns(["k", "n"])

    agg = (orders.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
           .groupby("k").sum("n"))

    def having(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["sum(n)"], pa.scalar(2)))
        k = t["k"].to_numpy(zero_copy_only=False)
        return pa.table({"o_custkey": pa.array(k >> 27),
                         "band": pa.array(k & ((1 << 27) - 1)),
                         "n": t["sum(n)"].cast(pa.int64())})

    return agg.map_batches(having, batch_format="pyarrow")


QUERIES["double_charge_orders"] = q_double_charge_orders
ORACLE_SQL["double_charge_orders"] = """
        SELECT o_custkey,
               CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
                 // 100000 AS band,
               count(*) AS n
        FROM orders GROUP BY 1, 2 HAVING count(*) >= 2
    """


def q_centroid_confusion(sf_dir: str):
    """Two-phase ML scoring: learn nearest-centroid class prototypes
    from the data (pass 1 = the label_centroids aggregate), broadcast
    the tiny model, classify every vector, and emit the confusion
    matrix (true label × predicted, counts) — train-then-score inside
    one engine, the evaluation loop of an embedding-quality pipeline.
    All arithmetic is exact integer: centroids are floor(Σq·10³/n+½)
    on the 10⁷ lattice (IEEE double division, bit-identical in numpy
    and DuckDB below the asserted 2^53 bound), distances are int64
    ‖q·10³‖² − 2q·10³·μ + ‖μ‖² via one integer matmul per batch, ties
    break to the smaller label. The model is vec-count-independent
    (classes × dims), so phase 2 is a pure broadcast map — no
    shuffle touches the corpus."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "label", "embedding"])

    def _mat(t: pa.Table):
        col = t["embedding"].combine_chunks()
        n = len(col)
        vals = col.values.to_numpy(zero_copy_only=False)
        d = len(vals) // n if n else 0
        q = np.trunc(vals.reshape(n, d).astype(np.float64) * 10000.0)
        return q, d

    def moments(t: pa.Table) -> pa.Table:
        q, d = _mat(t)
        if not len(q):
            return pa.table({"key": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "s_q": pa.array([], pa.int64())})
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(lab, kind="stable")
        q, lab = q[order], lab[order]
        start = np.flatnonzero(np.r_[True, lab[1:] != lab[:-1]])
        cnt = np.diff(np.r_[start, len(lab)])
        sums = np.add.reduceat(q, start, axis=0)
        ul = lab[start]
        key = (np.repeat(ul, d) * 4096 +
               np.tile(np.arange(d, dtype=np.int64), len(ul)))
        return pa.table({"key": pa.array(key),
                         "n": pa.array(np.repeat(cnt, d).astype(np.int64)),
                         "s_q": pa.array(sums.reshape(-1).astype(np.int64))})

    agg = (emb.map_batches(moments, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=65536)
           .groupby("key").sum(["n", "s_q"]).take_all())  # classes×dims
    labels = sorted({r["key"] // 4096 for r in agg})
    lidx = {l: i for i, l in enumerate(labels)}
    dmax = max(r["key"] % 4096 for r in agg) + 1
    mu = np.zeros((len(labels), dmax), np.int64)
    for r in agg:
        s_q, n = r["sum(s_q)"], r["sum(n)"]
        assert abs(s_q) * 1000 < (1 << 53), "centroid lattice contract"
        mu[lidx[r["key"] // 4096], r["key"] % 4096] = int(
            np.floor(s_q * 1000.0 / n + 0.5))
    model_ref = ray.put((np.array(labels, np.int64), mu))

    def classify(t: pa.Table) -> pa.Table:
        labs, mu = _broadcast(model_ref)
        q, d = _mat(t)
        if not len(q):
            return pa.table({"key": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        qq = q.astype(np.int64) * 1000
        # ||qq - mu_c||^2 = ||qq||^2 - 2 qq.mu_c + ||mu_c||^2, int64
        cross = qq @ mu.T                      # (n, classes) exact int64
        dist = (qq * qq).sum(axis=1, keepdims=True) - 2 * cross \
            + (mu * mu).sum(axis=1)[None, :]
        pred = labs[np.argmin(dist, axis=1)]   # ties -> smaller label
        true = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = pa.table({"key": pa.array(true * 4096 + pred)}).group_by(
            "key").aggregate([([], "count_all")])
        return g.rename_columns(["key", "n"])

    conf = (emb.map_batches(classify, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=65536)
            .groupby("key").sum("n"))

    def unpack(t: pa.Table) -> pa.Table:
        k = t["key"].to_numpy(zero_copy_only=False)
        return pa.table({"label": pa.array(k // 4096),
                         "pred": pa.array(k % 4096),
                         "n": t["sum(n)"].cast(pa.int64())})

    return conf.map_batches(unpack, batch_format="pyarrow")


QUERIES["centroid_confusion"] = q_centroid_confusion
ORACLE_SQL["centroid_confusion"] = """
        WITH e AS (SELECT vec_id, label,
                          unnest(range(len(embedding))) AS dim,
                          CAST(trunc(CAST(unnest(embedding) AS DOUBLE)
                                     * 10000) AS BIGINT) AS q
                   FROM embeddings),
        c AS (SELECT label AS c_label, dim,
                     CAST(floor(SUM(q) * 1000.0 / count(*) + 0.5)
                          AS BIGINT) AS mu
              FROM e GROUP BY 1, 2),
        d AS (SELECT e.vec_id, e.label, c.c_label,
                     SUM((e.q * 1000 - c.mu) * (e.q * 1000 - c.mu))
                       AS dist2
              FROM e JOIN c ON e.dim = c.dim GROUP BY 1, 2, 3),
        p AS (SELECT vec_id, label, c_label,
                     ROW_NUMBER() OVER (PARTITION BY vec_id
                                        ORDER BY dist2, c_label) AS rn
              FROM d)
        SELECT CAST(label AS BIGINT) AS label,
               CAST(c_label AS BIGINT) AS pred, count(*) AS n
        FROM p WHERE rn = 1 GROUP BY 1, 2
    """


def q_dominant_dim_embeddings(sf_dir: str):
    """Per-row ARGMAX over a list column: which dimension dominates
    each embedding (ties to the smaller dim), counted per dimension —
    the "dead/hot neuron" activation histogram of a representation
    check. One np.argmax per batch on the trunc(v·10⁴) lattice (ties
    resolve to the first index, matching the ROW_NUMBER replay's
    (q DESC, dim) order), then a dim-cardinality count shuffle."""
    emb = _read(sf_dir, "embeddings", ["embedding"])

    def partial(t: pa.Table) -> pa.Table:
        col = t["embedding"].combine_chunks()
        n = len(col)
        if n == 0:
            return pa.table({"dim": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        vals = col.values.to_numpy(zero_copy_only=False)
        d = len(vals) // n
        q = np.trunc(vals.reshape(n, d).astype(np.float64) * 10000.0)
        top = np.argmax(q, axis=1)  # first max = smallest dim on ties
        cnt = np.bincount(top, minlength=d)
        nz = np.flatnonzero(cnt)
        return pa.table({"dim": pa.array(nz.astype(np.int64)),
                         "n": pa.array(cnt[nz].astype(np.int64))})

    out = (emb.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=65536)
           .groupby("dim").sum("n"))
    return _rename(out, ["dim", "n"])


QUERIES["dominant_dim_embeddings"] = q_dominant_dim_embeddings
ORACLE_SQL["dominant_dim_embeddings"] = """
        WITH e AS (SELECT vec_id,
                          unnest(range(len(embedding))) AS dim,
                          CAST(trunc(CAST(unnest(embedding) AS DOUBLE)
                                     * 10000) AS BIGINT) AS q
                   FROM embeddings),
        p AS (SELECT vec_id, dim,
                     ROW_NUMBER() OVER (PARTITION BY vec_id
                                        ORDER BY q DESC, dim) AS rn
              FROM e)
        SELECT dim, count(*) AS n FROM p WHERE rn = 1 GROUP BY 1
    """


def q_weekly_type_wow(sf_dir: str):
    """Week-over-week reporting: per (event_type, week) the event
    count, the previous week's count (LAG, -1 when absent), and the
    delta — the trend table every metrics pipeline materializes. Plan
    = packed (type-index, week) count partials (closed 5-type
    vocabulary asserted), one pair-cardinality groupby, then the LAG
    runs INSIDE one tiny aggregate-scale task via the co-partitioned
    grouped_rolling lag path."""
    from geotile.ops.relational import grouped_rolling

    ev = _read(sf_dir, "events", ["event_type", "ts"])
    types = pa.array(["click", "error", "purchase", "signup", "view"])

    def partial(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t["event_type"], value_set=types)
        assert idx.null_count == 0, "weekly_wow: unseen event_type"
        wk = pc.divide(t["ts"].cast(pa.int64()),
                       pa.scalar(604_800_000_000, pa.int64()))
        k = pc.add(pc.multiply(idx.cast(pa.int64()),
                               pa.scalar(1 << 32, pa.int64())), wk)
        g = pa.table({"k": k}).group_by("k").aggregate([([], "count_all")])
        return g.rename_columns(["k", "n"])

    agg = (ev.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("k").sum("n"))

    def unpack(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy(zero_copy_only=False)
        return pa.table({"ti": pa.array(k >> 32),
                         "week": pa.array(k & 0xFFFFFFFF),
                         "n": t["sum(n)"].cast(pa.int64())})

    weekly = agg.map_batches(unpack, batch_format="pyarrow")
    rolled = grouped_rolling(weekly, "ti", ["week"], "n", frame=1,
                             lag_col="n", lag_default=-1)

    def finish(t: pa.Table) -> pa.Table:
        ti = t["ti"].to_numpy(zero_copy_only=False)
        names = types.to_pylist()
        et = pa.array([names[i] for i in ti], pa.string())
        prev = t["prev_n"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        return pa.table({"event_type": et, "week": t["week"],
                         "n": t["n"], "prev_n": t["prev_n"],
                         "wow": pa.array(np.where(prev >= 0, n - prev, 0))})

    return rolled.map_batches(finish, batch_format="pyarrow")


QUERIES["weekly_type_wow"] = q_weekly_type_wow
ORACLE_SQL["weekly_type_wow"] = """
        WITH w AS (SELECT event_type,
                          epoch_us(ts) // 604800000000 AS week,
                          count(*) AS n
                   FROM events GROUP BY 1, 2)
        SELECT event_type, week, n,
               COALESCE(LAG(n) OVER (PARTITION BY event_type
                                     ORDER BY week), -1) AS prev_n,
               CASE WHEN LAG(n) OVER (PARTITION BY event_type
                                      ORDER BY week) IS NULL THEN 0
                    ELSE n - LAG(n) OVER (PARTITION BY event_type
                                          ORDER BY week) END AS wow
        FROM w
    """


def q_image_patch_sums(sf_dir: str):
    """ViT patch prep (multimodal): each of the first 512 images
    reduces to a 4×4 grid of exact integer patch statistics (channel
    sum + pixel count, integer split boundaries so mixed sizes coexist
    in one batch). Actor-pool stage (decoder state once per actor),
    two reduceat passes per size group — no per-pixel Python. Oracle:
    generator-replay sidecar rebuilt from synth.pixel_pattern with an
    independent inclusion-exclusion prefix-sum kernel."""
    from geotile.ops.tiles import ImagePatchStage, read_image_table

    ds = read_image_table(_image_dir_for(sf_dir)).limit(512)
    return ds.map_batches(
        ImagePatchStage, batch_format="pyarrow", batch_size=256,
        concurrency=2,
    )


QUERIES["image_patch_sums"] = q_image_patch_sums


def q_caption_stop_stats(sf_dir: str):
    """Structured extraction from captions on a METADATA-ONLY scan of
    the multimodal table: parse the stop id out of each caption
    ("tile N near stop M"), aggregate image count + pixel mass per
    (fmt, stop-bucket of 4). The read prunes to (fmt, caption, w, h) — the
    binary payload column never leaves storage, the core discipline
    for wide image tables. Packed (fmt-index, bucket) single-int key
    over the closed {png, raw} fmt set (asserted)."""
    from geotile.ops.tiles import read_image_table

    ds = read_image_table(_image_dir_for(sf_dir),
                          columns=["fmt", "caption", "w", "h"])
    fmts = pa.array(["png", "raw"])

    def partial(t: pa.Table) -> pa.Table:
        fi = pc.index_in(t["fmt"], value_set=fmts)
        assert fi.null_count == 0, "caption_stop_stats: unseen fmt"
        stop = pc.cast(pc.list_element(
            pc.split_pattern(t["caption"], " "), 4), pa.int64())
        k = pc.add(pc.multiply(fi.cast(pa.int64()),
                               pa.scalar(1 << 40, pa.int64())),
                   pc.divide(stop, pa.scalar(4, pa.int64())))
        px = pc.multiply(t["w"].cast(pa.int64()), t["h"].cast(pa.int64()))
        g = pa.table({"k": k, "px": px}).group_by("k").aggregate(
            [([], "count_all"), ("px", "sum")])
        return g.rename_columns(["k", "n", "sum_px"])

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("k").sum(["n", "sum_px"]))

    def unpack(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy(zero_copy_only=False)
        names = fmts.to_pylist()
        return pa.table({
            "fmt": pa.array([names[i] for i in (k >> 40)], pa.string()),
            "stop_bucket": pa.array(k & ((1 << 40) - 1)),
            "n": t["sum(n)"].cast(pa.int64()),
            "sum_px": t["sum(sum_px)"].cast(pa.int64()),
        })

    return agg.map_batches(unpack, batch_format="pyarrow")


QUERIES["caption_stop_stats"] = q_caption_stop_stats


def q_hierarchy_rollup_customers(sf_dir: str):
    """Hierarchical (tree-path) rollup — the BOM/org-chart aggregate:
    customers form a decimal-digit hierarchy (node = custkey // 10^k),
    and every level-k ancestor accumulates its descendants' revenue
    and customer count. Unlike the column ROLLUP/CUBE ops this rolls
    up a PATH: each customer-scale row explodes to its 4 ancestors
    (bounded fan-out), packed (node, level) single-int keys, one
    ancestor-cardinality groupby. Revenue stays on the exact cents
    lattice end to end."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.floor(pc.add(pc.multiply(
            t["o_totalprice"], pa.scalar(100.0)),
            pa.scalar(0.5))).cast(pa.int64())
        g = pa.table({"c": t["o_custkey"], "rev": cents}).group_by(
            "c").aggregate([("rev", "sum"), ([], "count_all")])
        c = g["c"].to_numpy(zero_copy_only=False)
        rev = g["rev_sum"].to_numpy(zero_copy_only=False)
        n = g["count_all"].to_numpy(zero_copy_only=False).astype(np.int64)
        assert (c < (1 << 40)).all(), "hierarchy packing contract"
        keys, revs, ns = [], [], []
        for lvl, d in enumerate((1, 10, 100, 1000)):
            keys.append((c // d) * 4 + lvl)
            revs.append(rev)
            ns.append(n)
        return pa.table({"k": pa.array(np.concatenate(keys)),
                         "rev": pa.array(np.concatenate(revs)),
                         "n_orders": pa.array(np.concatenate(ns))})

    agg = (orders.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
           .groupby("k").sum(["rev", "n_orders"]))

    def unpack(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(k >> 2),
                         "level": pa.array(k & 3),
                         "rev": t["sum(rev)"],
                         "n_orders": t["sum(n_orders)"].cast(pa.int64())})

    return agg.map_batches(unpack, batch_format="pyarrow")


QUERIES["hierarchy_rollup_customers"] = q_hierarchy_rollup_customers
ORACLE_SQL["hierarchy_rollup_customers"] = """
        WITH f AS (SELECT o_custkey,
                          CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
                            AS cents
                   FROM orders),
        x AS (SELECT o_custkey // t.d AS node, t.level, cents
              FROM f CROSS JOIN (VALUES (0, 1), (1, 10), (2, 100),
                                        (3, 1000)) t(level, d))
        SELECT node, CAST(level AS BIGINT) AS level,
               CAST(SUM(cents) AS BIGINT) AS rev,
               count(*) AS n_orders
        FROM x GROUP BY 1, 2
    """


def q_daily_metrics_long(sf_dir: str):
    """UNPIVOT / melt: one wide per-day aggregate fanned into the long
    (day, metric, v) shape a metrics store ingests — n_events,
    n_users (exact distinct), sum_value_e4 as three rows per day.
    Plan = per-batch partials for all three metrics at once (packed
    (day, user) keys feed the distinct), two day-scale groupbys, one
    tiny melt epilogue batch."""
    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.divide(t["ts"].cast(pa.int64()),
                        pa.scalar(86_400_000_000, pa.int64()))
        v = pc.floor(pc.add(pc.multiply(t["value"], pa.scalar(10000.0)),
                            pa.scalar(0.5))).cast(pa.int64())
        g = pa.table({"day": day, "v": v}).group_by("day").aggregate(
            [([], "count_all"), ("v", "sum")])
        return pa.table({"day": g["day"],
                         "n_events": g["count_all"].cast(pa.int64()),
                         "sum_v": g["v_sum"]})

    base = (ev.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("day").sum(["n_events", "sum_v"]))
    base = _rename(base, ["day", "n_events", "sum_v"]).materialize()

    def upart(t: pa.Table) -> pa.Table:
        day = pc.divide(t["ts"].cast(pa.int64()),
                        pa.scalar(86_400_000_000, pa.int64()))
        u = t["user_id"].to_numpy(zero_copy_only=False)
        assert (u < (1 << 33)).all(), "daily_metrics packing contract"
        d = day.to_numpy(zero_copy_only=False)
        g = pa.table({"k": pa.array((d << 33) | u)}).group_by(
            "k").aggregate([])
        return g

    users = (ev.map_batches(upart, batch_format="pyarrow",
                            zero_copy_batch=True)
             .groupby("k").count()
             .map_batches(lambda t: pa.table(
                 {"day": pc.shift_right(t["k"], pa.scalar(33))})
                 .group_by("day").aggregate([([], "count_all")])
                 .rename_columns(["day", "n_users"]),
                 batch_format="pyarrow")
             .groupby("day").sum("n_users"))
    users = _rename(users, ["day", "n_users"]).materialize()

    # day-scale epilogue: melt the wide row into (day, metric, v)
    b = base.to_pandas().merge(users.to_pandas(), on="day")
    out = pd.DataFrame({
        "day": np.tile(b["day"].to_numpy(), 3),
        "metric": np.repeat(
            np.array(["n_events", "n_users", "sum_value_e4"]), len(b)),
        "v": np.r_[b["n_events"].to_numpy(), b["n_users"].to_numpy(),
                   b["sum_v"].to_numpy()],
    })
    return out


QUERIES["daily_metrics_long"] = q_daily_metrics_long
ORACLE_SQL["daily_metrics_long"] = """
        WITH w AS (SELECT epoch_us(ts) // 86400000000 AS day,
                          count(*) AS n_events,
                          count(DISTINCT user_id) AS n_users,
                          SUM(CAST(floor(value * 10000.0 + 0.5)
                                   AS BIGINT)) AS sum_v
                   FROM events GROUP BY 1)
        SELECT day, 'n_events' AS metric, CAST(n_events AS BIGINT) AS v
        FROM w
        UNION ALL
        SELECT day, 'n_users', CAST(n_users AS BIGINT) FROM w
        UNION ALL
        SELECT day, 'sum_value_e4', CAST(sum_v AS BIGINT) FROM w
    """


def q_type_lift_daily(sf_dir: str):
    """Market-basket pair analysis: over (user, day) baskets, for every
    event-type pair the number of baskets containing BOTH, plus each
    type's basket count and the basket total — the exact integer parts
    of support/lift (the float lift itself is a scalar epilogue kept
    out of the compared columns). Scale trick: baskets collapse to a
    5-bit type MASK (packed (user, day) key, bitwise-OR partials), so
    pair expansion runs at 2^5 mask cardinality — the quadratic step
    never touches basket-scale data."""
    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    types = pa.array(["click", "error", "purchase", "signup", "view"])

    def partial(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t["event_type"], value_set=types)
        assert idx.null_count == 0, "type_lift: unseen event_type"
        u = t["user_id"].to_numpy(zero_copy_only=False)
        assert (u < (1 << 28)).all(), "type_lift packing contract"
        day = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // 86_400_000_000)
        k = (u << 20) | day
        bit = np.int64(1) << idx.cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        # per-batch bitwise-OR combiner via max over per-(basket,bit)
        # dedup, then OR at the groupby below can't express OR — use
        # sum of DISTINCT bits: dedup (basket, bit) then sum is OR
        g = pa.table({"k": pa.array(k), "bit": pa.array(bit)}).group_by(
            ["k", "bit"]).aggregate([])
        return g

    # distinct (basket, bit) pairs -> sum(bit) per basket == OR
    masks = (ev.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True)
             .groupby(["k", "bit"]).count()
             .map_batches(lambda t: pa.table(
                 {"k": t["k"], "bit": t["bit"]}).group_by("k").aggregate(
                 [("bit", "sum")]).rename_columns(["k", "mask"]),
                 batch_format="pyarrow")
             .groupby("k").sum("mask"))

    def mask_counts(t: pa.Table) -> pa.Table:
        m = t["sum(mask)"].to_numpy(zero_copy_only=False)
        cnt = np.bincount(m, minlength=32)
        nz = np.flatnonzero(cnt)
        return pa.table({"mask": pa.array(nz.astype(np.int64)),
                         "n": pa.array(cnt[nz].astype(np.int64))})

    mc = (masks.map_batches(mask_counts, batch_format="pyarrow")
          .groupby("mask").sum("n").take_all())  # 2^5 rows
    cnt = np.zeros(32, np.int64)
    for r in mc:
        cnt[r["mask"]] = r["sum(n)"]
    total = int(cnt.sum())
    names = types.to_pylist()
    rows = []
    for a in range(5):
        n_a = int(cnt[(np.arange(32) & (1 << a)) > 0].sum())
        for b in range(a + 1, 5):
            n_b = int(cnt[(np.arange(32) & (1 << b)) > 0].sum())
            both = int(cnt[((np.arange(32) & (1 << a)) > 0)
                           & ((np.arange(32) & (1 << b)) > 0)].sum())
            if both:  # oracle's inner join only emits co-occurring pairs
                rows.append((names[a], names[b], both, n_a, n_b, total))
    return pd.DataFrame(rows, columns=["type_a", "type_b", "n_both",
                                       "n_a", "n_b", "n_baskets"])


QUERIES["type_lift_daily"] = q_type_lift_daily
ORACLE_SQL["type_lift_daily"] = """
        WITH b AS (SELECT DISTINCT user_id,
                          epoch_us(ts) // 86400000000 AS day, event_type
                   FROM events),
        m AS (SELECT event_type, count(*) AS n
              FROM b GROUP BY 1),
        tot AS (SELECT count(*) AS n FROM
                (SELECT DISTINCT user_id, day FROM b))
        SELECT a.event_type AS type_a, c.event_type AS type_b,
               count(*) AS n_both,
               (SELECT n FROM m WHERE event_type = a.event_type) AS n_a,
               (SELECT n FROM m WHERE event_type = c.event_type) AS n_b,
               (SELECT n FROM tot) AS n_baskets
        FROM b a JOIN b c ON a.user_id = c.user_id AND a.day = c.day
                         AND a.event_type < c.event_type
        GROUP BY 1, 2
    """


def q_topk_ties_orders(sf_dir: str):
    """Global top-k WITH ties (RANK() <= k): rows whose rank — ties
    share, gaps after — is <= 5, i.e. every row with cents >= the
    value at global rank 5; the SQL-semantics variant of the partial
    top-k operator. Plan: per-batch partial top-5 values
    (threshold-pruned), tiny driver reduce finds the global rank-5
    threshold, one broadcast filter pass — the corpus never sorts."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        cents = pc.floor(pc.add(pc.multiply(
            t["o_totalprice"], pa.scalar(100.0)),
            pa.scalar(0.5))).cast(pa.int64())
        return pa.table({"o_orderkey": t["o_orderkey"], "cents": cents})

    fact = orders.map_batches(prep, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()

    def top5(t: pa.Table) -> pa.Table:
        c = t["cents"].to_numpy(zero_copy_only=False)
        k = min(5, len(c))
        top = np.partition(c, len(c) - k)[len(c) - k:]
        return pa.table({"cents": pa.array(np.sort(top)[::-1])})

    parts = fact.map_batches(top5, batch_format="pyarrow").take_all()
    allv = np.sort(np.array([r["cents"] for r in parts]))[::-1]
    thr = int(allv[4])  # value at global rank 5 (ties included below)

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["cents"], pa.scalar(thr)))

    return fact.map_batches(keep, batch_format="pyarrow")


QUERIES["topk_ties_orders"] = q_topk_ties_orders
ORACLE_SQL["topk_ties_orders"] = """
        WITH r AS (SELECT o_orderkey,
                          CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
                            AS cents,
                          RANK() OVER (ORDER BY
                            CAST(floor(o_totalprice * 100.0 + 0.5)
                                 AS BIGINT) DESC) AS rk
                   FROM orders)
        SELECT o_orderkey, cents FROM r WHERE rk <= 5
    """


def q_type_trigrams_users(sf_dir: str):
    """Sequential pattern mining one level past bigrams: counts of
    (prev2, prev1, cur) event-type TRIGRAMS over each user's time-
    ordered stream — double-LAG windowing. One co-partition on user,
    each bucket group handles all its keys in a single vectorized
    pass (lexsort by (user, ts, event_id), two shifted views masked at
    run starts, packed 3-digit base-5 type codes), then a
    125-cardinality count shuffle."""
    from geotile.ops.relational import _with_bucket

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id",
                                  "event_type"])
    types = pa.array(["click", "error", "purchase", "signup", "view"])
    names = types.to_pylist()

    def prep(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t["event_type"], value_set=types)
        assert idx.null_count == 0, "trigrams: unseen event_type"
        return pa.table({"user_id": t["user_id"],
                         "us": t["ts"].cast(pa.int64()),
                         "event_id": t["event_id"],
                         "ti": idx.cast(pa.int64())})

    ds = ev.map_batches(prep, batch_format="pyarrow",
                        zero_copy_batch=True)

    def tri(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy(np.int64)
        us = df["us"].to_numpy(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        ti = df["ti"].to_numpy(np.int64)
        order = np.lexsort([eid, us, u])
        u, ti = u[order], ti[order]
        n = len(u)
        if n < 3:
            return pd.DataFrame({"code": pd.Series(dtype=np.int64),
                                 "n": pd.Series(dtype=np.int64)})
        same2 = u[2:] == u[:-2]  # rows 2.. whose two predecessors share
        code = ti[:-2] * 25 + ti[1:-1] * 5 + ti[2:]
        cnt = np.bincount(code[same2], minlength=125)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({"code": nz.astype(np.int64),
                             "n": cnt[nz].astype(np.int64)})

    agg = (_with_bucket(ds, "user_id", 32)
           .groupby("bucket").map_groups(tri, batch_format="pandas")
           .groupby("code").sum("n"))

    def unpack(t: pa.Table) -> pa.Table:
        c = t["code"].to_numpy(zero_copy_only=False)
        return pa.table({
            "t1": pa.array([names[i] for i in c // 25], pa.string()),
            "t2": pa.array([names[i] for i in (c // 5) % 5], pa.string()),
            "t3": pa.array([names[i] for i in c % 5], pa.string()),
            "n": t["sum(n)"].cast(pa.int64()),
        })

    return agg.map_batches(unpack, batch_format="pyarrow")


QUERIES["type_trigrams_users"] = q_type_trigrams_users
ORACLE_SQL["type_trigrams_users"] = """
        WITH s AS (SELECT user_id, event_type,
                          LAG(event_type, 1) OVER w AS p1,
                          LAG(event_type, 2) OVER w AS p2
                   FROM events
                   WINDOW w AS (PARTITION BY user_id
                                ORDER BY ts, event_id))
        SELECT p2 AS t1, p1 AS t2, event_type AS t3, count(*) AS n
        FROM s WHERE p2 IS NOT NULL GROUP BY 1, 2, 3
    """


def q_llm_corpus_prep(sf_dir: str):
    """Composite flagship for LLM corpus preparation — three engine
    stages CHAINED: (1) boilerplate dedup — keep the smallest doc_id
    per 30-char text prefix, grouped on the composite (h64, prefix) so
    the shuffle compares 8-byte hashes, with (doc_id, n_chars,
    n_tokens) packed into ONE int64 min-value (doc_id in the high bits
    makes min() pick the canonical row and carry its attributes for
    free); (2) quality filter — survivors with 30..90 whitespace
    tokens; (3) contiguous 20k-char shard packing via the two-pass
    distributed exclusive prefix sum. Output: per shard, doc count and
    char mass. The oracle replays the whole chain as nested CTEs."""
    from geotile.ops.hashing import hash_strings

    docs = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])

    def prep(t: pa.Table) -> pa.Table:
        pfx = pc.utf8_slice_codeunits(t["text"], 0, 30).combine_chunks()
        ntok = pc.list_value_length(
            pc.split_pattern(t["text"], " ")).cast(pa.int64())
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        nc = t["n_chars"].to_numpy(zero_copy_only=False)
        nt = ntok.to_numpy(zero_copy_only=False)
        assert (d < (1 << 38)).all() and (nc < (1 << 14)).all() \
            and (nt < (1 << 10)).all(), "corpus_prep packing contract"
        v = (d << 24) | (nc << 10) | nt
        h = hash_strings(pfx).view(np.int64)
        g = pa.table({"h64": pa.array(h), "pfx": pfx,
                      "v": pa.array(v)}).group_by(
            ["h64", "pfx"]).aggregate([("v", "min")])
        return g.rename_columns(["h64", "pfx", "v"])

    survivors = (docs.map_batches(prep, batch_format="pyarrow",
                                  zero_copy_batch=True)
                 .groupby(["h64", "pfx"]).min("v"))

    def unpack(t: pa.Table) -> pa.Table:
        v = t["min(v)"].to_numpy(zero_copy_only=False)
        nt = v & ((1 << 10) - 1)
        keep = (nt >= 30) & (nt <= 90)
        return pa.table({"doc_id": pa.array((v >> 24)[keep]),
                         "n_chars": pa.array(((v >> 10)
                                              & ((1 << 14) - 1))[keep])})

    kept = survivors.map_batches(unpack, batch_format="pyarrow")
    return _shard_by_chars(kept)


QUERIES["llm_corpus_prep"] = q_llm_corpus_prep
ORACLE_SQL["llm_corpus_prep"] = """
        WITH t AS (SELECT doc_id, n_chars,
                          len(string_split(text, ' ')) AS n_tokens,
                          text[:30] AS pfx
                   FROM documents),
        d AS (SELECT pfx, min(doc_id) AS doc_id FROM t GROUP BY 1),
        s AS (SELECT t.doc_id, t.n_chars
              FROM t JOIN d USING (doc_id)
              WHERE t.n_tokens BETWEEN 30 AND 90),
        p AS (SELECT doc_id, n_chars,
                     COALESCE(SUM(n_chars) OVER (
                         ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING), 0) AS pre
              FROM s)
        SELECT pre // 20000 AS shard_id, count(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM p GROUP BY 1
    """


def q_ks_lang_docs(sf_dir: str):
    """Distribution-drift detector: EXACT Kolmogorov–Smirnov statistic
    between each language's n_chars distribution and the global one,
    as integer rational parts — ks_num = max over the value grid of
    |F_lang·n_all − F_all·n_lang| (both cumulative counts, so the max
    is exact; the float KS = ks_num / (n_lang·n_all) stays out of the
    compared columns). Plan: one (lang, n_chars)-cardinality count
    groupby (packed key over the closed 5-lang set), then the grid
    walk runs in a single aggregate-scale epilogue task."""
    docs = _read(sf_dir, "documents", ["lang", "n_chars"])
    langs = pa.array(["de", "en", "es", "fr", "zh"])

    def partial(t: pa.Table) -> pa.Table:
        li = pc.index_in(t["lang"], value_set=langs)
        assert li.null_count == 0, "ks: unseen lang"
        k = pc.add(pc.multiply(li.cast(pa.int64()),
                               pa.scalar(1 << 20, pa.int64())),
                   t["n_chars"])
        g = pa.table({"k": k}).group_by("k").aggregate([([], "count_all")])
        return g.rename_columns(["k", "n"])

    agg = (docs.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True)
           .groupby("k").sum("n").take_all())  # (lang, value)-scale
    names = langs.to_pylist()
    k = np.array([r["k"] for r in agg], np.int64)
    n = np.array([r["sum(n)"] for r in agg], np.int64)
    li, val = k >> 20, k & ((1 << 20) - 1)
    grid = np.unique(val)
    rows = []
    n_all = int(n.sum())
    # global cumulative counts over the grid
    g_cnt = np.zeros(len(grid), np.int64)
    np.add.at(g_cnt, np.searchsorted(grid, val), n)
    g_cum = np.cumsum(g_cnt)
    for L in range(len(names)):
        m = li == L
        if not m.any():
            continue
        l_cnt = np.zeros(len(grid), np.int64)
        np.add.at(l_cnt, np.searchsorted(grid, val[m]), n[m])
        l_cum = np.cumsum(l_cnt)
        n_lang = int(l_cnt.sum())
        ks_num = int(np.abs(l_cum * n_all - g_cum * n_lang).max())
        rows.append((names[L], n_lang, n_all, ks_num))
    return pd.DataFrame(rows, columns=["lang", "n_lang", "n_all",
                                       "ks_num"])


QUERIES["ks_lang_docs"] = q_ks_lang_docs
ORACLE_SQL["ks_lang_docs"] = """
        WITH grid AS (SELECT DISTINCT n_chars AS v FROM documents),
        tot AS (SELECT count(*) AS n_all FROM documents),
        lt AS (SELECT lang, count(*) AS n_lang FROM documents GROUP BY 1),
        cum AS (SELECT l.lang, g.v,
                       (SELECT count(*) FROM documents d
                        WHERE d.lang = l.lang AND d.n_chars <= g.v)
                         AS f_lang,
                       (SELECT count(*) FROM documents d
                        WHERE d.n_chars <= g.v) AS f_all
                FROM lt l CROSS JOIN grid g)
        SELECT c.lang, lt.n_lang, tot.n_all,
               CAST(max(abs(c.f_lang * tot.n_all - c.f_all * lt.n_lang))
                    AS BIGINT) AS ks_num
        FROM cum c JOIN lt ON lt.lang = c.lang CROSS JOIN tot
        GROUP BY 1, 2, 3
    """


def q_benford_prices(sf_dir: str):
    """Benford first-digit screen over order prices (the classic fraud
    / synthetic-data audit): leading digit of the cents lattice,
    counts per digit. Vectorized digit extraction via one decimal
    string cast (matching the SQL substring replay exactly — no float
    log10 edge cases)."""
    orders = _read(sf_dir, "orders", ["o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.floor(pc.add(pc.multiply(
            t["o_totalprice"], pa.scalar(100.0)),
            pa.scalar(0.5))).cast(pa.int64())
        d = pc.utf8_slice_codeunits(cents.cast(pa.string()), 0, 1)
        g = pa.table({"digit": d}).group_by("digit").aggregate(
            [([], "count_all")])
        return g.rename_columns(["digit", "n"])

    out = (orders.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
           .groupby("digit").sum("n"))
    return _rename(out, ["digit", "n"])


QUERIES["benford_prices"] = q_benford_prices
ORACLE_SQL["benford_prices"] = """
        SELECT substr(CAST(CAST(floor(o_totalprice * 100.0 + 0.5)
                                AS BIGINT) AS VARCHAR), 1, 1) AS digit,
               count(*) AS n
        FROM orders GROUP BY 1
    """


def q_regex_tokens_docs(sf_dir: str):
    """BPE-style regex pre-tokenization (the GPT-2 front-end split:
    alpha runs | digit runs | lone symbols) as an ACTOR-POOL stage —
    the three regexes compile once per actor in __init__, each batch
    only runs findall (the stateful-stage pattern, SURVEY §2.8).
    Oracle: DuckDB regexp_extract_all over the same pure
    character-class patterns (re and RE2 agree on these)."""
    from geotile.ops.text import RegexTokenizerStage

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        RegexTokenizerStage, batch_format="pyarrow", batch_size=512,
        concurrency=2,
    )


QUERIES["regex_tokens_docs"] = q_regex_tokens_docs
ORACLE_SQL["regex_tokens_docs"] = """
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT)
                 AS n_alpha,
               CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT)
                 AS n_digit,
               CAST(len(regexp_extract_all(text, '[^a-z0-9\\s]'))
                    AS BIGINT) AS n_symbol
        FROM documents
    """


def q_pushdown_orders(sf_dir: str):
    """Prune at the read — BOTH prunings the 100-TB discipline asks
    for: a row-group/predicate filter (1996-H1 order dates, pushed
    into the parquet scan via a pyarrow expression so non-matching row
    groups never leave storage) AND column projection (3 of 6
    columns). Downstream is one priority-scale aggregate on the cents
    lattice."""
    import datetime

    expr = ((pc.field("o_orderdate")
             >= pa.scalar(datetime.datetime(1996, 1, 1)))
            & (pc.field("o_orderdate")
               < pa.scalar(datetime.datetime(1996, 7, 1))))
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderpriority", "o_totalprice"],
                         filter=expr)

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.floor(pc.add(pc.multiply(
            t["o_totalprice"], pa.scalar(100.0)),
            pa.scalar(0.5))).cast(pa.int64())
        g = pa.table({"o_orderpriority": t["o_orderpriority"],
                      "cents": cents}).group_by(
            "o_orderpriority").aggregate(
            [([], "count_all"), ("cents", "sum")])
        return pa.table({"o_orderpriority": g["o_orderpriority"],
                         "n": g["count_all"].cast(pa.int64()),
                         "rev": g["cents_sum"]})

    out = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("o_orderpriority").sum(["n", "rev"]))
    return _rename(out, ["o_orderpriority", "n", "rev"])


QUERIES["pushdown_orders"] = q_pushdown_orders
ORACLE_SQL["pushdown_orders"] = """
        SELECT o_orderpriority, count(*) AS n,
               CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                    AS BIGINT) AS rev
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-07-01'
        GROUP BY 1
    """


def q_near_price_pairs(sf_dir: str):
    """Inequality self-join WITHOUT a join: count unordered order
    pairs whose prices differ by <= 1 cent ACROSS different customers
    (near-duplicate payment screening). The quadratic |a-b|<=1 range
    join collapses to counting algebra on two count tables —
    Σ C(n_c,2) + Σ n_c·n_{c+1} over per-cents counts, minus the same
    two sums over per-(customer,cents) counts — so the engine does two
    count groupbys (value- and pair-cardinality) and a value-domain
    epilogue; no row ever meets another row. The oracle runs the real
    range join (DuckDB IEJoin) — two entirely different algorithms
    must agree on one number."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        cents = pc.floor(pc.add(pc.multiply(
            t["o_totalprice"], pa.scalar(100.0)),
            pa.scalar(0.5))).cast(pa.int64())
        return pa.table({"cust": t["o_custkey"], "c": cents})

    fact = orders.map_batches(prep, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()

    def cpart(t: pa.Table) -> pa.Table:
        g = t.select(["c"]).group_by("c").aggregate([([], "count_all")])
        return g.rename_columns(["c", "n"])

    by_c = (fact.map_batches(cpart, batch_format="pyarrow")
            .groupby("c").sum("n").take_all())  # value-cardinality

    def ucpart(t: pa.Table) -> pa.Table:
        cu = t["cust"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False)
        assert (cu < (1 << 24)).all() and (c < (1 << 38)).all(), \
            "near_price packing contract"
        g = pa.table({"k": pa.array((cu << 38) | c)}).group_by(
            "k").aggregate([([], "count_all")])
        return g.rename_columns(["k", "n"])

    by_uc = (fact.map_batches(ucpart, batch_format="pyarrow")
             .groupby("k").sum("n").take_all())  # pair-cardinality

    def pair_sum(keys: np.ndarray, n: np.ndarray,
                 stride: int = 1) -> int:
        """Σ C(n_k,2) + Σ n_k · n_{k+stride} over a sparse count map."""
        order = np.argsort(keys)
        keys, n = keys[order], n[order]
        same = int((n * (n - 1) // 2).sum())
        j = np.searchsorted(keys, keys + stride)
        ok = (j < len(keys)) & (keys[np.minimum(j, len(keys) - 1)]
                                == keys + stride)
        adj = int((n[ok] * n[np.minimum(j, len(keys) - 1)[ok]]).sum())
        return same + adj

    kc = np.array([r["c"] for r in by_c], np.int64)
    nc = np.array([r["sum(n)"] for r in by_c], np.int64)
    ku = np.array([r["k"] for r in by_uc], np.int64)
    nu = np.array([r["sum(n)"] for r in by_uc], np.int64)
    total = pair_sum(kc, nc)
    same_cust = pair_sum(ku, nu)  # stride 1 within the same cust block
    return pd.DataFrame({"n_pairs": [total - same_cust]})


QUERIES["near_price_pairs"] = q_near_price_pairs
ORACLE_SQL["near_price_pairs"] = """
        WITH f AS (SELECT row_number() OVER () AS rid, o_custkey,
                          CAST(floor(o_totalprice * 100.0 + 0.5)
                               AS BIGINT) AS c
                   FROM orders)
        SELECT count(*) AS n_pairs
        FROM f a JOIN f b
          ON b.c BETWEEN a.c - 1 AND a.c + 1
         AND a.o_custkey <> b.o_custkey AND a.rid < b.rid
    """


def q_weighted_median_lineitem(sf_dir: str):
    """Grouped WEIGHTED median: per return flag, the quantity at which
    half the revenue mass sits below (lower weighted median, ties
    down) — the inventory-planning statistic plain medians can't
    express. quantity's closed integer domain (1..50) makes this
    exact with ONE packed (flag, qty) revenue-sum groupby at
    flag×domain cardinality; the cumulative threshold walk is a
    domain-size epilogue. Weights stay on the cents lattice."""
    li = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_quantity", "l_extendedprice"])
    flags = pa.array(["A", "N", "R"])

    def partial(t: pa.Table) -> pa.Table:
        fi = pc.index_in(t["l_returnflag"], value_set=flags)
        assert fi.null_count == 0, "wmedian: unseen returnflag"
        q = t["l_quantity"].cast(pa.int64())
        cents = pc.floor(pc.add(pc.multiply(
            t["l_extendedprice"], pa.scalar(100.0)),
            pa.scalar(0.5))).cast(pa.int64())
        k = pc.add(pc.multiply(fi.cast(pa.int64()),
                               pa.scalar(1 << 10, pa.int64())), q)
        g = pa.table({"k": k, "w": cents}).group_by("k").aggregate(
            [("w", "sum")])
        return g.rename_columns(["k", "w"])

    agg = (li.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("k").sum("w").take_all())  # flag x domain scale
    names = flags.to_pylist()
    k = np.array([r["k"] for r in agg], np.int64)
    w = np.array([r["sum(w)"] for r in agg], np.int64)
    rows = []
    for fi in range(len(names)):
        m = (k >> 10) == fi
        if not m.any():
            continue
        qs, ws = k[m] & 1023, w[m]
        order = np.argsort(qs)
        qs, ws = qs[order], ws[order]
        cum = np.cumsum(ws)
        tot = int(cum[-1])
        at = int(np.searchsorted(2 * cum, tot))  # first 2*cum >= tot
        rows.append((names[fi], int(qs[at]), tot))
    return pd.DataFrame(rows, columns=["l_returnflag", "wmedian_qty",
                                       "total_cents"])


QUERIES["weighted_median_lineitem"] = q_weighted_median_lineitem
ORACLE_SQL["weighted_median_lineitem"] = """
        WITH w AS (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q,
                          SUM(CAST(floor(l_extendedprice * 100.0 + 0.5)
                                   AS BIGINT)) AS ws
                   FROM lineitem GROUP BY 1, 2),
        c AS (SELECT l_returnflag, q,
                     SUM(ws) OVER (PARTITION BY l_returnflag
                                   ORDER BY q) AS cum,
                     SUM(ws) OVER (PARTITION BY l_returnflag) AS tot
              FROM w)
        SELECT l_returnflag, CAST(min(q) AS BIGINT) AS wmedian_qty,
               CAST(min(tot) AS BIGINT) AS total_cents
        FROM c WHERE 2 * cum >= tot GROUP BY 1
    """


def q_fmt_size_association(sf_dir: str):
    """Categorical-association screen on multimodal metadata (the
    chi-square contingency test in exact integer parts): for each
    (fmt, size-class) cell the observed count and the signed deviation
    numerator dev = n_ij·N − r_i·c_j (zero iff fmt ⟂ size; the float
    chi² = Σ dev²/(r·c·N) stays out of the compared columns; the
    2^53 bound is asserted). One metadata-only scan — the payload
    column never leaves storage — and a cell-cardinality groupby; the
    marginals join is a cell-scale epilogue."""
    from geotile.ops.tiles import read_image_table

    ds = read_image_table(_image_dir_for(sf_dir),
                          columns=["fmt", "w", "h"])
    fmts = pa.array(["png", "raw"])

    def partial(t: pa.Table) -> pa.Table:
        fi = pc.index_in(t["fmt"], value_set=fmts)
        assert fi.null_count == 0, "fmt_size: unseen fmt"
        px = pc.multiply(t["w"].cast(pa.int64()), t["h"].cast(pa.int64()))
        size_cls = pc.if_else(pc.greater_equal(px, pa.scalar(1024)),
                              pa.scalar(1, pa.int64()),
                              pa.scalar(0, pa.int64()))
        k = pc.add(pc.multiply(fi.cast(pa.int64()),
                               pa.scalar(2, pa.int64())), size_cls)
        g = pa.table({"k": k}).group_by("k").aggregate(
            [([], "count_all")])
        return g.rename_columns(["k", "n"])

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("k").sum("n").take_all())  # 4 cells
    names = fmts.to_pylist()
    k = np.array([r["k"] for r in agg], np.int64)
    n = np.array([r["sum(n)"] for r in agg], np.int64)
    N = int(n.sum())
    r = np.zeros(2, np.int64)
    c = np.zeros(2, np.int64)
    np.add.at(r, k >> 1, n)
    np.add.at(c, k & 1, n)
    assert N * int(n.max()) < (1 << 53), "fmt_size lattice contract"
    rows = []
    for i in range(len(k)):
        fi, sc = int(k[i] >> 1), int(k[i] & 1)
        dev = int(n[i]) * N - int(r[fi]) * int(c[sc])
        rows.append((names[fi], sc, int(n[i]), dev))
    return pd.DataFrame(rows, columns=["fmt", "size_class", "n", "dev"])


QUERIES["fmt_size_association"] = q_fmt_size_association


def q_daily_churn_users(sf_dir: str):
    """Day-over-day churn: for each day, how many users were active
    the PREVIOUS day but not this one (every activity-island end emits
    a churn event at end+1, including the final island — the LEAD
    IS NULL convention). Plan = per-batch (user, day) Arrow dedup
    partial, one co-partition on user, a single vectorized pass per
    bucket group (island ends via np.diff over the sorted dedup'd
    composite), then a day-scale count."""
    from geotile.ops.relational import _with_bucket

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def days(t: pa.Table) -> pa.Table:
        d = pc.divide(t["ts"].cast(pa.int64()),
                      pa.scalar(86_400_000_000, pa.int64()))
        return pa.table({"user_id": t["user_id"], "day": d}).group_by(
            ["user_id", "day"]).aggregate([])

    pairs = ev.map_batches(days, batch_format="pyarrow",
                           zero_copy_batch=True)

    def ends(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy(np.int64)
        d = df["day"].to_numpy(np.int64)
        order = np.lexsort([d, u])
        u, d = u[order], d[order]
        keep = np.r_[True, (u[1:] != u[:-1]) | (d[1:] != d[:-1])]
        u, d = u[keep], d[keep]
        # island end = next row is another user OR a non-consecutive day
        end = np.r_[(u[1:] != u[:-1]) | (d[1:] - d[:-1] != 1), True]
        churn_day = d[end] + 1
        uniq, cnt = np.unique(churn_day, return_counts=True)
        return pd.DataFrame({"day": uniq, "n_churned": cnt.astype(np.int64)})

    out = (_with_bucket(pairs, "user_id", 32)
           .groupby("bucket").map_groups(ends, batch_format="pandas")
           .groupby("day").sum("n_churned"))
    return _rename(out, ["day", "n_churned"])


QUERIES["daily_churn_users"] = q_daily_churn_users
ORACLE_SQL["daily_churn_users"] = """
        WITH d AS (SELECT DISTINCT user_id,
                          epoch_us(ts) // 86400000000 AS day FROM events),
        x AS (SELECT user_id, day,
                     LEAD(day) OVER (PARTITION BY user_id
                                     ORDER BY day) AS nxt
              FROM d)
        SELECT day + 1 AS day, count(*) AS n_churned
        FROM x WHERE nxt IS NULL OR nxt > day + 1 GROUP BY 1
    """


def q_dense_type_day_matrix(sf_dir: str):
    """Cross-join spine + zero-fill: the DENSE (event_type × day)
    count matrix — every combination present even when no event
    happened (the reporting-grid contract; sparse groupbys silently
    drop empty cells). Plan = packed (type, day) count partials, then
    the densification runs in one aggregate-scale epilogue against the
    5 × day-range spine derived from the data's own min/max day. The
    oracle builds the same spine with CROSS JOIN generate_series."""
    ev = _read(sf_dir, "events", ["event_type", "ts"])
    types = pa.array(["click", "error", "purchase", "signup", "view"])

    def partial(t: pa.Table) -> pa.Table:
        ti = pc.index_in(t["event_type"], value_set=types)
        assert ti.null_count == 0, "dense_matrix: unseen event_type"
        day = pc.divide(t["ts"].cast(pa.int64()),
                        pa.scalar(86_400_000_000, pa.int64()))
        k = pc.add(pc.multiply(ti.cast(pa.int64()),
                               pa.scalar(1 << 32, pa.int64())), day)
        g = pa.table({"k": k}).group_by("k").aggregate(
            [([], "count_all")])
        return g.rename_columns(["k", "n"])

    agg = (ev.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("k").sum("n").take_all())  # type x day scale
    names = types.to_pylist()
    k = np.array([r["k"] for r in agg], np.int64)
    n = np.array([r["sum(n)"] for r in agg], np.int64)
    ti, day = k >> 32, k & 0xFFFFFFFF
    d0, d1 = int(day.min()), int(day.max())
    span = d1 - d0 + 1
    dense = np.zeros((len(names), span), np.int64)
    dense[ti, day - d0] = n
    return pd.DataFrame({
        "event_type": np.repeat(np.array(names), span),
        "day": np.tile(np.arange(d0, d1 + 1, dtype=np.int64),
                       len(names)),
        "n": dense.reshape(-1),
    })


QUERIES["dense_type_day_matrix"] = q_dense_type_day_matrix
ORACLE_SQL["dense_type_day_matrix"] = """
        WITH b AS (SELECT min(epoch_us(ts) // 86400000000) AS d0,
                          max(epoch_us(ts) // 86400000000) AS d1
                   FROM events),
        spine AS (SELECT t.event_type, g.day
                  FROM (VALUES ('click'), ('error'), ('purchase'),
                               ('signup'), ('view')) t(event_type)
                  CROSS JOIN (SELECT unnest(generate_series(
                      (SELECT d0 FROM b), (SELECT d1 FROM b))) AS day) g),
        c AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                     count(*) AS n
              FROM events GROUP BY 1, 2)
        SELECT s.event_type, s.day, COALESCE(c.n, 0) AS n
        FROM spine s LEFT JOIN c USING (event_type, day)
    """


def q_anomaly_counts_users(sf_dir: str):
    """Own-distribution anomaly screen: per user the exact p95 of
    their value distribution (rank ceil(0.95·n), the ROW_NUMBER
    semantics) and how many of their events exceed it. Unlike the
    histogram-refinement grouped quantiles (whose interval lattice is
    dimension-scale in the group count), this co-partitions on the
    HIGH-cardinality user key and does quantile + threshold count in
    ONE vectorized pass per bucket group (lexsort, per-run rank pick,
    reduceat count) — the per-user contract is only that one user's
    rows fit one bucket task."""
    from geotile.ops.relational import _with_bucket

    ev = _read(sf_dir, "events", ["user_id", "value"])

    def screen(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy(np.int64)
        v = df["value"].to_numpy(np.float64)
        order = np.lexsort([v, u])
        u, v = u[order], v[order]
        start = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        n = np.diff(np.r_[start, len(u)])
        idx95 = start + np.ceil(0.95 * n).astype(np.int64) - 1
        p95 = v[idx95]
        above = np.add.reduceat(
            (v > np.repeat(p95, n)).astype(np.int64), start)
        return pd.DataFrame({"user_id": u[start],
                             "n": n.astype(np.int64),
                             "p95": p95,
                             "n_above": above.astype(np.int64)})

    return (_with_bucket(ev, "user_id", 32)
            .groupby("bucket").map_groups(screen, batch_format="pandas"))


QUERIES["anomaly_counts_users"] = q_anomaly_counts_users
ORACLE_SQL["anomaly_counts_users"] = """
        WITH r AS (SELECT user_id, value,
                          row_number() OVER (PARTITION BY user_id
                                             ORDER BY value) AS rn,
                          count(*) OVER (PARTITION BY user_id) AS n
                   FROM events),
        t AS (SELECT user_id, value AS p95, n FROM r
              WHERE rn = CAST(ceil(0.95 * n) AS BIGINT))
        SELECT e.user_id, CAST(t.n AS BIGINT) AS n, t.p95,
               SUM(CASE WHEN e.value > t.p95 THEN 1 ELSE 0 END)
                 AS n_above
        FROM events e JOIN t USING (user_id)
        GROUP BY 1, 2, 3
    """


def q_drawdown_users(sf_dir: str):
    """Running-extreme window (MAX OVER ... ROWS UNBOUNDED PRECEDING):
    per event, the user's running maximum value so far and the current
    drawdown (run-max − value) — the peak-tracking member of the
    window family the rolling SUMs don't cover. One co-partition on
    user, np.maximum.accumulate per run (reset at run starts by
    substituting −∞ at each first row), e4 lattice end to end."""
    from geotile.ops.relational import _with_bucket

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        v = pc.floor(pc.add(pc.multiply(t["value"], pa.scalar(10000.0)),
                            pa.scalar(0.5))).cast(pa.int64())
        return pa.table({"event_id": t["event_id"],
                         "user_id": t["user_id"],
                         "us": t["ts"].cast(pa.int64()), "v": v})

    ds = ev.map_batches(prep, batch_format="pyarrow",
                        zero_copy_batch=True)

    def window(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy(np.int64)
        us = df["us"].to_numpy(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        v = df["v"].to_numpy(np.int64)
        order = np.lexsort([eid, us, u])
        u, eid, v = u[order], eid[order], v[order]
        new = np.r_[True, u[1:] != u[:-1]]
        # segment-reset cumulative max: pandas' grouped cummax is the
        # C-path prefix max with per-run resets (a lift/offset trick
        # would overflow int64 once a bucket holds ~2^18 users)
        seg = np.cumsum(new) - 1
        run_max = pd.Series(v).groupby(seg).cummax().to_numpy(np.int64)
        return pd.DataFrame({"event_id": eid,
                             "run_max_e4": run_max,
                             "drawdown_e4": run_max - v})

    return (_with_bucket(ds, "user_id", 32)
            .groupby("bucket").map_groups(window, batch_format="pandas"))


QUERIES["drawdown_users"] = q_drawdown_users
ORACLE_SQL["drawdown_users"] = """
        WITH f AS (SELECT event_id, user_id, ts,
                          CAST(floor(value * 10000.0 + 0.5) AS BIGINT)
                            AS v
                   FROM events)
        SELECT event_id,
               MAX(v) OVER w AS run_max_e4,
               MAX(v) OVER w - v AS drawdown_e4
        FROM f
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """


def q_rolling_distinct_types(sf_dir: str):
    """Windowed COUNT DISTINCT (distinct event types among each
    user's last 5 events) — the distinct-cardinality ROWS frame that
    plain rolling sums can't express. Over the closed 5-type
    vocabulary the window collapses to a rolling BITMASK OR: five
    shifted views of the per-row type bit, run-start masked, one
    popcount — fully vectorized in the per-bucket pass, no per-row
    set structure."""
    from geotile.ops.relational import _with_bucket

    ev = _read(sf_dir, "events",
               ["event_id", "user_id", "ts", "event_type"])
    types = pa.array(["click", "error", "purchase", "signup", "view"])

    def prep(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t["event_type"], value_set=types)
        assert idx.null_count == 0, "rolling_distinct: unseen type"
        return pa.table({"event_id": t["event_id"],
                         "user_id": t["user_id"],
                         "us": t["ts"].cast(pa.int64()),
                         "ti": idx.cast(pa.int64())})

    ds = ev.map_batches(prep, batch_format="pyarrow",
                        zero_copy_batch=True)

    def window(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy(np.int64)
        us = df["us"].to_numpy(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        ti = df["ti"].to_numpy(np.int64)
        order = np.lexsort([eid, us, u])
        u, eid, ti = u[order], eid[order], ti[order]
        n = len(u)
        bit = np.int64(1) << ti
        pos = np.arange(n)
        run_start = pos[np.r_[True, u[1:] != u[:-1]]][
            np.cumsum(np.r_[True, u[1:] != u[:-1]]) - 1]
        mask = bit.copy()
        for s in range(1, 5):  # OR in the s-th predecessor if in-run
            ok = pos - s >= run_start
            shifted = np.zeros(n, np.int64)
            shifted[s:] = bit[:-s]
            mask |= np.where(ok, shifted, 0)
        # popcount over 5 bits
        d = (mask & 1) + ((mask >> 1) & 1) + ((mask >> 2) & 1) \
            + ((mask >> 3) & 1) + ((mask >> 4) & 1)
        return pd.DataFrame({"event_id": eid,
                             "n_distinct_5": d.astype(np.int64)})

    return (_with_bucket(ds, "user_id", 32)
            .groupby("bucket").map_groups(window, batch_format="pandas"))


QUERIES["rolling_distinct_types"] = q_rolling_distinct_types
ORACLE_SQL["rolling_distinct_types"] = """
        SELECT event_id,
               count(DISTINCT event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
                 AS n_distinct_5
        FROM events
    """


def q_decay_score_users(sf_dir: str):
    """Geometric-decay engagement score (the bounded-horizon EWMA,
    exact): per event, Σ_{j=0..9} v_{i−j}·2^{9−j} over the user's last
    10 events — recency-weighted relevance on the e4 lattice, exact
    integers end to end (an unbounded EWMA forces floats; the bounded
    horizon keeps the driver hash bit-stable). Vectorized as ten
    run-masked shifted adds in one co-partition pass; the SQL replay
    writes the same ten LAG terms explicitly."""
    from geotile.ops.relational import _with_bucket

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        v = pc.floor(pc.add(pc.multiply(t["value"], pa.scalar(10000.0)),
                            pa.scalar(0.5))).cast(pa.int64())
        return pa.table({"event_id": t["event_id"],
                         "user_id": t["user_id"],
                         "us": t["ts"].cast(pa.int64()), "v": v})

    ds = ev.map_batches(prep, batch_format="pyarrow",
                        zero_copy_batch=True)

    def window(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy(np.int64)
        us = df["us"].to_numpy(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        v = df["v"].to_numpy(np.int64)
        order = np.lexsort([eid, us, u])
        u, eid, v = u[order], eid[order], v[order]
        n = len(u)
        pos = np.arange(n)
        new = np.r_[True, u[1:] != u[:-1]]
        run_start = pos[new][np.cumsum(new) - 1]
        score = v * (1 << 9)
        for j in range(1, 10):
            ok = pos - j >= run_start
            shifted = np.zeros(n, np.int64)
            shifted[j:] = v[:-j]
            score += np.where(ok, shifted, 0) * (1 << (9 - j))
        return pd.DataFrame({"event_id": eid,
                             "decay_score_e4": score})

    return (_with_bucket(ds, "user_id", 32)
            .groupby("bucket").map_groups(window, batch_format="pandas"))


QUERIES["decay_score_users"] = q_decay_score_users
ORACLE_SQL["decay_score_users"] = """
        WITH f AS (SELECT event_id, user_id, ts,
                          CAST(floor(value * 10000.0 + 0.5) AS BIGINT)
                            AS v
                   FROM events)
        SELECT event_id,
               v * 512
               + COALESCE(LAG(v, 1) OVER w, 0) * 256
               + COALESCE(LAG(v, 2) OVER w, 0) * 128
               + COALESCE(LAG(v, 3) OVER w, 0) * 64
               + COALESCE(LAG(v, 4) OVER w, 0) * 32
               + COALESCE(LAG(v, 5) OVER w, 0) * 16
               + COALESCE(LAG(v, 6) OVER w, 0) * 8
               + COALESCE(LAG(v, 7) OVER w, 0) * 4
               + COALESCE(LAG(v, 8) OVER w, 0) * 2
               + COALESCE(LAG(v, 9) OVER w, 0) AS decay_score_e4
        FROM f
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """


def q_gini_impurity_users(sf_dir: str):
    """Per-group diversity / concentration metric (Gini impurity of
    each user's event-type mix) — exact integer parts end to end:
    gini = 1 − Σ(c/n)² is reported as n, ssq = Σc², and
    gini_ppm = (n² − ssq)·10⁶ ÷ n² in INTEGER division, so no float
    ever enters the driver hash. Per-batch packed (user,type) count
    partials → one exact pair groupby → a pair-cardinality per-user
    combine. (n²·10⁶ overflows int64 only past ~3M events per user —
    asserted.)"""
    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    types = pa.array(["click", "error", "purchase", "signup", "view"])

    def partial(t: pa.Table) -> pa.Table:
        ti = pc.index_in(t["event_type"], value_set=types).cast(pa.int64())
        assert ti.null_count == 0, "gini: unseen event type"
        k = pc.add(pc.multiply(t["user_id"], pa.scalar(8, pa.int64())), ti)
        return pa.table({"k": k}).group_by("k").aggregate([("k", "count")])

    pairs = ev.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True) \
              .groupby("k").sum("k_count")

    def per_user(t: pa.Table) -> pa.Table:
        c = t["sum(k_count)"].to_numpy().astype(np.int64)
        u = np.right_shift(t["k"].to_numpy().astype(np.int64), 3)
        return pa.table({"user_id": u, "n": c, "ssq": c * c}) \
                 .group_by("user_id") \
                 .aggregate([("n", "sum"), ("ssq", "sum")])

    from ray.data.aggregate import Sum

    per = pairs.map_batches(per_user, batch_format="pyarrow",
                            zero_copy_batch=True) \
               .groupby("user_id") \
               .aggregate(Sum("n_sum", alias_name="n"),
                          Sum("ssq_sum", alias_name="ssq"))

    def epilogue(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy().astype(np.int64)
        ssq = t["ssq"].to_numpy().astype(np.int64)
        assert (n < 3_000_000).all(), "gini: n^2*1e6 would overflow"
        ppm = (n * n - ssq) * 1_000_000 // (n * n)
        return pa.table({"user_id": t["user_id"], "n": n, "ssq": ssq,
                         "gini_ppm": ppm})

    return per.map_batches(epilogue, batch_format="pyarrow",
                           zero_copy_batch=True)


QUERIES["gini_impurity_users"] = q_gini_impurity_users
ORACLE_SQL["gini_impurity_users"] = """
        WITH c AS (SELECT user_id, event_type, count(*) AS c
                   FROM events GROUP BY 1, 2)
        SELECT user_id, SUM(c) AS n, SUM(c * c) AS ssq,
               (SUM(c) * SUM(c) - SUM(c * c)) * 1000000
                 // (SUM(c) * SUM(c)) AS gini_ppm
        FROM c GROUP BY 1
    """


def q_division_completion_users(sf_dir: str):
    """Relational DIVISION with a completion timestamp: users who
    performed ALL five event types, and the day their vocabulary
    became complete (max over types of each type's first-seen day) —
    the \"for all\" join no equi-join family member expresses. Two
    exact aggregate levels: per-batch packed (user,type) MIN-day
    partials → pair groupby MIN → per-user (count, max) combine with
    a HAVING count = |vocabulary| filter."""
    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    types = pa.array(["click", "error", "purchase", "signup", "view"])

    def partial(t: pa.Table) -> pa.Table:
        ti = pc.index_in(t["event_type"], value_set=types).cast(pa.int64())
        assert ti.null_count == 0, "division: unseen event type"
        k = pc.add(pc.multiply(t["user_id"], pa.scalar(8, pa.int64())), ti)
        day = pc.divide(t["ts"].cast(pa.int64()),
                        pa.scalar(86_400_000_000, pa.int64()))
        return pa.table({"k": k, "d": day}).group_by("k") \
                 .aggregate([("d", "min")])

    first = ev.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).groupby("k").min("d_min")

    def per_user(t: pa.Table) -> pa.Table:
        u = np.right_shift(t["k"].to_numpy().astype(np.int64), 3)
        d = t["min(d_min)"].to_numpy().astype(np.int64)
        one = np.ones(len(u), np.int64)
        return pa.table({"user_id": u, "nt": one, "d": d}) \
                 .group_by("user_id") \
                 .aggregate([("nt", "sum"), ("d", "max")])

    from ray.data.aggregate import Max, Sum

    per = first.map_batches(per_user, batch_format="pyarrow",
                            zero_copy_batch=True) \
               .groupby("user_id") \
               .aggregate(Sum("nt_sum", alias_name="nt"),
                          Max("d_max", alias_name="completed_day"))

    def having(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(t["nt"], pa.scalar(5, pa.int64())))
        return f.select(["user_id", "completed_day"])

    return per.map_batches(having, batch_format="pyarrow",
                           zero_copy_batch=True)


QUERIES["division_completion_users"] = q_division_completion_users
ORACLE_SQL["division_completion_users"] = """
        WITH m AS (SELECT user_id, event_type,
                          MIN(CAST(ts AS DATE)) AS d0
                   FROM events GROUP BY 1, 2)
        SELECT user_id,
               CAST(MAX(d0) - DATE '1970-01-01' AS BIGINT)
                 AS completed_day
        FROM m GROUP BY 1 HAVING COUNT(*) = 5
    """


def q_locf_events(sf_dir: str):
    """LOCF gap-fill (last-observation-carried-forward): per event,
    the value of the user's most recent PURCHASE at-or-before it
    (−1 before the first purchase) — the imputation window the
    frame-sum family can't express because the carried value rides an
    arbitrary distance. Vectorized as an index-carrying forward fill:
    marker = position where purchase else −1, grouped cummax (pandas
    C path, resets per user run), then one gather. The SQL replay
    uses LAST_VALUE ... IGNORE NULLS."""
    from geotile.ops.relational import _with_bucket

    ev = _read(sf_dir, "events",
               ["event_id", "user_id", "ts", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        v = pc.floor(pc.add(pc.multiply(t["value"], pa.scalar(10000.0)),
                            pa.scalar(0.5))).cast(pa.int64())
        isp = pc.equal(t["event_type"], pa.scalar("purchase")) \
                .cast(pa.int64())
        return pa.table({"event_id": t["event_id"],
                         "user_id": t["user_id"],
                         "us": t["ts"].cast(pa.int64()),
                         "v": v, "isp": isp})

    ds = ev.map_batches(prep, batch_format="pyarrow",
                        zero_copy_batch=True)

    def window(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy(np.int64)
        us = df["us"].to_numpy(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        v = df["v"].to_numpy(np.int64)
        isp = df["isp"].to_numpy(np.int64)
        order = np.lexsort([eid, us, u])
        u, eid, v, isp = u[order], eid[order], v[order], isp[order]
        n = len(u)
        pos = np.arange(n)
        seg = np.cumsum(np.r_[True, u[1:] != u[:-1]]) - 1
        marker = np.where(isp == 1, pos, np.int64(-1))
        carried = pd.Series(marker).groupby(seg).cummax() \
                    .to_numpy(np.int64)
        out = np.where(carried >= 0, v[np.maximum(carried, 0)],
                       np.int64(-1))
        return pd.DataFrame({"event_id": eid,
                             "last_purchase_e4": out})

    return (_with_bucket(ds, "user_id", 32)
            .groupby("bucket").map_groups(window, batch_format="pandas"))


QUERIES["locf_events"] = q_locf_events
ORACLE_SQL["locf_events"] = """
        WITH f AS (SELECT event_id, user_id, ts,
                          CASE WHEN event_type = 'purchase'
                               THEN CAST(floor(value * 10000.0 + 0.5)
                                         AS BIGINT) END AS pv
                   FROM events)
        SELECT event_id,
               COALESCE(LAST_VALUE(pv IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 -1) AS last_purchase_e4
        FROM f
    """


def q_clamped_balance_users(sf_dir: str):
    """Clamped running balance (inventory / credit semantics):
    S_i = max(0, S_{i−1} + Δ_i) with Δ = value_e4 − 500000 — the
    nonlinear recurrence a plain window SUM can't express. Collapsed
    to closed form S_i = P_i − min(0, min_{j≤i} P_j) (P = prefix sum),
    so the engine runs two C-path grouped scans (cumsum + cummin) per
    co-partition instead of a sequential loop; the SQL replay computes
    the same closed form from two stacked window passes — both sides
    exact int64 on the e4 lattice."""
    from geotile.ops.relational import _with_bucket

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        v = pc.floor(pc.add(pc.multiply(t["value"], pa.scalar(10000.0)),
                            pa.scalar(0.5))).cast(pa.int64())
        return pa.table({"event_id": t["event_id"],
                         "user_id": t["user_id"],
                         "us": t["ts"].cast(pa.int64()),
                         "d": pc.subtract(v, pa.scalar(500000, pa.int64()))})

    ds = ev.map_batches(prep, batch_format="pyarrow",
                        zero_copy_batch=True)

    def window(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy(np.int64)
        us = df["us"].to_numpy(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        d = df["d"].to_numpy(np.int64)
        order = np.lexsort([eid, us, u])
        u, eid, d = u[order], eid[order], d[order]
        seg = np.cumsum(np.r_[True, u[1:] != u[:-1]]) - 1
        g = pd.Series(d).groupby(seg)
        p = g.cumsum().to_numpy(np.int64)
        low = np.minimum(pd.Series(p).groupby(seg).cummin()
                         .to_numpy(np.int64), 0)
        return pd.DataFrame({"event_id": eid, "balance_e4": p - low})

    return (_with_bucket(ds, "user_id", 32)
            .groupby("bucket").map_groups(window, batch_format="pandas"))


QUERIES["clamped_balance_users"] = q_clamped_balance_users
ORACLE_SQL["clamped_balance_users"] = """
        WITH f AS (SELECT event_id, user_id, ts,
                          CAST(floor(value * 10000.0 + 0.5) AS BIGINT)
                            - 500000 AS d
                   FROM events),
        p AS (SELECT event_id, user_id, ts,
                     SUM(d) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND CURRENT ROW) AS pp
              FROM f)
        SELECT event_id,
               pp - LEAST(0, MIN(pp) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                 AS balance_e4
        FROM p
    """


def q_posting_lists_embeddings(sf_dir: str):
    """Inverted-index build over a vector column (embedding
    sparsification): every dim whose activation clears the threshold
    on the trunc-e4 lattice becomes a posting; output = per-dim
    posting count + activation mass — the index-construction shape of
    sparse retrieval. Per-batch 2-D mask → bincount/add.at partials at
    dim cardinality (64), one dim-scale groupby; the corpus itself
    never shuffles. UNNEST-with-position replay in SQL."""
    em = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        from geotile.ops.ann import _emb_matrix
        arr = _emb_matrix(t)
        q = np.trunc(arr * 10000.0).astype(np.int64)
        mask = q >= 2500
        rows, dims = np.nonzero(mask)
        n = np.bincount(dims, minlength=arr.shape[1]).astype(np.int64)
        s = np.zeros(arr.shape[1], np.int64)
        np.add.at(s, dims, q[rows, dims])
        keep = n > 0
        return pa.table({"dim": np.nonzero(keep)[0].astype(np.int64),
                         "n_postings": n[keep], "mass_e4": s[keep]})

    out = em.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True) \
            .groupby("dim").sum(["n_postings", "mass_e4"])
    return _rename(out, ["dim", "n_postings", "mass_e4"])


QUERIES["posting_lists_embeddings"] = q_posting_lists_embeddings
ORACLE_SQL["posting_lists_embeddings"] = """
        WITH e AS (SELECT unnest(range(len(embedding))) AS dim,
                          CAST(trunc(CAST(unnest(embedding) AS DOUBLE)
                                     * 10000) AS BIGINT) AS q
                   FROM embeddings)
        SELECT dim, COUNT(*) AS n_postings, SUM(q) AS mass_e4
        FROM e WHERE q >= 2500 GROUP BY dim
    """


def q_shipping_priority_q3(sf_dir: str):
    """TPC-H Q3 shape (shipping priority): segment-filtered customers
    ⋈ date-filtered orders ⋈ ship-date-filtered lineitem, revenue per
    order, global top 10. Two bucketed co-partition joins on DIFFERENT
    keys (custkey then orderkey) — the multi-shuffle chain a single
    broadcast can't honestly replace once the dimension side is
    fact-scale — with predicates applied before each shuffle so only
    qualifying rows move. Revenue on the per-element e4 lattice BEFORE
    summation; top-k via per-block partials, never a global sort."""
    from geotile.ops.relational import bucketed_join

    CUT = np.datetime64("1996-06-01", "us")

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]) \
        .map_batches(lambda t: t.filter(
            pc.equal(t["c_mktsegment"], pa.scalar("BUILDING")))
            .select(["c_custkey"]), batch_format="pyarrow")
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(lambda t: t.filter(
            pc.less(t["o_orderdate"], pa.scalar(CUT))),
            batch_format="pyarrow")
    oc = bucketed_join(orders, cust, "o_custkey", "c_custkey",
                       n_buckets=16)
    oc = oc.map_batches(
        lambda t: pa.table({
            "o_orderkey": t["o_orderkey"],
            "o_day": pc.divide(t["o_orderdate"].cast(pa.int64()),
                               pa.scalar(86_400_000_000, pa.int64()))}),
        batch_format="pyarrow").materialize()  # schema-probe law

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount",
                "l_shipdate"]) \
        .map_batches(lambda t: t.filter(
            pc.greater(t["l_shipdate"], pa.scalar(CUT))),
            batch_format="pyarrow")
    j = bucketed_join(li, oc, "l_orderkey", "o_orderkey", n_buckets=16)

    def partial(t: pa.Table) -> pa.Table:
        rev = pc.floor(pc.add(pc.multiply(
            pc.multiply(t["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), t["l_discount"])),
            pa.scalar(10000.0)), pa.scalar(0.5))).cast(pa.int64())
        g = pa.table({"o_orderkey": t["o_orderkey"], "o_day": t["o_day"],
                      "revenue_e4": rev}) \
            .group_by(["o_orderkey", "o_day"]) \
            .aggregate([("revenue_e4", "sum")])
        return pa.table({"o_orderkey": g["o_orderkey"],
                         "o_day": g["o_day"],
                         "revenue_e4": g["revenue_e4_sum"]})

    per_order = j.map_batches(partial, batch_format="pyarrow") \
                 .groupby(["o_orderkey", "o_day"]).sum("revenue_e4")
    per_order = _rename(per_order, ["o_orderkey", "o_day", "revenue_e4"])

    def block_topk(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("revenue_e4", "descending"),
                                            ("o_orderkey", "ascending")])
        return t.take(idx[:10])

    return per_order.map_batches(block_topk, batch_format="pyarrow") \
                    .repartition(1) \
                    .map_batches(block_topk, batch_format="pyarrow")


QUERIES["shipping_priority_q3"] = q_shipping_priority_q3
ORACLE_SQL["shipping_priority_q3"] = """
        SELECT l_orderkey AS o_orderkey,
               CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS o_day,
               SUM(CAST(floor(l_extendedprice * (1 - l_discount)
                              * 10000.0 + 0.5) AS BIGINT)) AS revenue_e4
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1996-06-01'
          AND l_shipdate > TIMESTAMP '1996-06-01'
        GROUP BY 1, 2
        ORDER BY revenue_e4 DESC, o_orderkey LIMIT 10
    """


def q_revenue_share_nations(sf_dir: str):
    """Ratio-to-report (percent-of-total contribution): revenue per
    nation plus its share of the grand total in exact ppm by integer
    division — the SUM() OVER () report window. Fact side maps
    custkey→nation through the per-worker broadcast dim cache and
    pre-aggregates per batch; the grand total is an aggregate-scale
    (25-row) driver epilogue, so no second pass over the facts."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).take_all()
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).take_all()
    nat = {r["n_nationkey"]: r["n_name"] for r in nation}
    ck = np.array(sorted(r["c_custkey"] for r in cust), dtype=np.int64)
    by_key = {r["c_custkey"]: r["c_nationkey"] for r in cust}
    dim_ref = ray.put(
        (ck, pa.array([nat[by_key[k]] for k in ck], pa.string())))

    def partial(t: pa.Table) -> pa.Table:
        keys, nats = _broadcast(dim_ref)
        idx = pa.array(np.searchsorted(keys, t["o_custkey"].to_numpy()))
        rev = pc.floor(pc.add(pc.multiply(t["o_totalprice"],
                                          pa.scalar(100.0)),
                              pa.scalar(0.5))).cast(pa.int64())
        g = pa.table({"nation": pc.take(nats, idx), "rev_e2": rev}) \
            .group_by("nation").aggregate([("rev_e2", "sum")])
        return pa.table({"nation": g["nation"],
                         "rev_e2": g["rev_e2_sum"]})

    per = orders.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True) \
                .groupby("nation").sum("rev_e2")
    df = _rename(per, ["nation", "rev_e2"]).to_pandas()  # 25 rows
    total = int(df["rev_e2"].sum())
    df["share_ppm"] = (df["rev_e2"].to_numpy(np.int64) * 1_000_000
                       // total).astype(np.int64)
    return df


QUERIES["revenue_share_nations"] = q_revenue_share_nations
ORACLE_SQL["revenue_share_nations"] = """
        WITH r AS (SELECT n_name AS nation,
                          SUM(CAST(floor(o_totalprice * 100.0 + 0.5)
                                   AS BIGINT)) AS rev_e2
                   FROM orders
                   JOIN customer ON o_custkey = c_custkey
                   JOIN nation ON c_nationkey = n_nationkey
                   GROUP BY 1)
        SELECT nation, rev_e2,
               rev_e2 * 1000000 // SUM(rev_e2) OVER () AS share_ppm
        FROM r
    """


def q_monotone_run_users(sf_dir: str):
    """Longest strictly-increasing run per user (value-adjacency
    islands — momentum/trend detection): runs break wherever
    v ≤ previous v or the user changes, island lengths via one
    bincount, per-user max over islands at island cardinality. The
    calendar-streak operator counts day gaps; this one is ordered on
    event time and cuts on the VALUE sequence."""
    from geotile.ops.relational import _with_bucket

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        v = pc.floor(pc.add(pc.multiply(t["value"], pa.scalar(10000.0)),
                            pa.scalar(0.5))).cast(pa.int64())
        return pa.table({"event_id": t["event_id"],
                         "user_id": t["user_id"],
                         "us": t["ts"].cast(pa.int64()), "v": v})

    ds = ev.map_batches(prep, batch_format="pyarrow",
                        zero_copy_batch=True)

    def window(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy(np.int64)
        us = df["us"].to_numpy(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        v = df["v"].to_numpy(np.int64)
        order = np.lexsort([eid, us, u])
        u, v = u[order], v[order]
        brk = np.r_[True, (u[1:] != u[:-1]) | (v[1:] <= v[:-1])]
        isl = np.cumsum(brk) - 1
        lengths = np.bincount(isl).astype(np.int64)
        isl_user = u[brk]  # island start rows carry the island's user
        per = pd.DataFrame({"user_id": isl_user, "L": lengths}) \
            .groupby("user_id", sort=False)["L"].max()
        return pd.DataFrame({"user_id": per.index.to_numpy(np.int64),
                             "longest_inc_run": per.to_numpy(np.int64)})

    return (_with_bucket(ds, "user_id", 32)
            .groupby("bucket").map_groups(window, batch_format="pandas"))


QUERIES["monotone_run_users"] = q_monotone_run_users
ORACLE_SQL["monotone_run_users"] = """
        WITH f AS (SELECT user_id, ts, event_id,
                          CAST(floor(value * 10000.0 + 0.5) AS BIGINT)
                            AS v
                   FROM events),
        l AS (SELECT user_id, ts, event_id, v,
                     LAG(v) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS pv
              FROM f),
        g AS (SELECT user_id,
                     SUM(CASE WHEN pv IS NULL OR v <= pv THEN 1
                              ELSE 0 END) OVER (
                         PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS isl
              FROM l),
        c AS (SELECT user_id, isl, COUNT(*) AS c
              FROM g GROUP BY 1, 2)
        SELECT user_id, CAST(MAX(c) AS BIGINT) AS longest_inc_run
        FROM c GROUP BY 1
    """


def _tile_pyramid_sql(img_dir: str) -> str:
    """Oracle for tile_pyramid_counts: each level's cell id derived
    DIRECTLY from lon/lat (quantize + Morton spread at that res) —
    independent of the engine's shift-based parent coarsening, so a
    nesting bug in either derivation breaks the match."""
    parts = []
    for r in (12, 10, 8, 6):
        parts.append(f"""
        SELECT {_sql_cell('lon', 'lat', r)} AS cell,
               CAST({r} AS BIGINT) AS level, count(*) AS n_tiles
        FROM read_parquet('{img_dir}/part-*.parquet')
        GROUP BY 1""")
    return " UNION ALL ".join(parts)


def q_tile_pyramid_counts(sf_dir: str):
    """Zoom-pyramid rollup (tile map-server aggregation): tile counts
    at res 12 coarsened up through res 10/8/6 — the multi-resolution
    aggregation a slippy-map service precomputes. The fine cell is
    encoded ONCE per row; every coarser level is a 2-bit-per-step
    shift (aperture-4 Morton nesting), so the pyramid costs one encode
    + three shifts, and the shuffle moves only per-cell count partials
    (≤ 1.33× the res-12 cell cardinality, geometric series)."""
    from geotile.geom import cells

    from geotile.ops.tiles import read_image_table

    img = _image_dir_for(sf_dir)
    ds = read_image_table(img, columns=["lon", "lat"])

    def partial(t: pa.Table) -> pa.Table:
        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        fine = cells.encode(lon, lat, 12)
        levels = []
        for r in (12, 10, 8, 6):
            levels.append(fine if r == 12 else cells.parent(fine, r))
        cell = np.concatenate(levels).view(np.int64)
        return pa.table({"cell": cell}).group_by("cell") \
                 .aggregate([("cell", "count")])

    out = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True) \
            .groupby("cell").sum("cell_count")

    def epilogue(t: pa.Table) -> pa.Table:
        c = t["cell"].to_numpy()
        return pa.table({"cell": c,
                         "level": (c >> 58).astype(np.int64),
                         "n_tiles": t["sum(cell_count)"].cast(pa.int64())})

    return out.map_batches(epilogue, batch_format="pyarrow",
                           zero_copy_batch=True)


QUERIES["tile_pyramid_counts"] = q_tile_pyramid_counts


def q_scd2_orders(sf_dir: str):
    """SCD Type-2 dimension build (validity intervals from a change
    log): per customer, the order-priority history as
    [valid_from_day, valid_to_day) rows — a new interval opens at
    every priority CHANGE point, closes at the next one (−1 = open).
    One co-partition pass: shifted-view change detection, then the
    next-change day gathered by one roll of the change-row subset —
    no LEAD materialization over the full fact."""
    from geotile.ops.relational import _with_bucket

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate",
                    "o_orderpriority"])

    vocab = pa.array(["1-URGENT", "2-HIGH", "3-MEDIUM",
                      "4-NOT SPECIFIED", "5-LOW"])

    def prep(t: pa.Table) -> pa.Table:
        day = pc.divide(t["o_orderdate"].cast(pa.int64()),
                        pa.scalar(86_400_000_000, pa.int64()))
        pi = pc.index_in(t["o_orderpriority"], value_set=vocab)
        assert pi.null_count == 0, "scd2: unseen priority"
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_custkey": t["o_custkey"], "day": day,
                         "pi": pi.cast(pa.int64())})

    ds = orders.map_batches(prep, batch_format="pyarrow",
                            zero_copy_batch=True)
    names = np.asarray(vocab.to_pylist())

    def window(df: pd.DataFrame) -> pd.DataFrame:
        c = df["o_custkey"].to_numpy(np.int64)
        k = df["o_orderkey"].to_numpy(np.int64)
        d = df["day"].to_numpy(np.int64)
        p = df["pi"].to_numpy(np.int64)
        order = np.lexsort([k, d, c])
        c, d, p = c[order], d[order], p[order]
        new = np.r_[True, c[1:] != c[:-1]]
        chg = new | np.r_[False, p[1:] != p[:-1]]
        cc, dc, pc_ = c[chg], d[chg], p[chg]
        nxt = np.r_[dc[1:], np.int64(-1)]
        same = np.r_[cc[1:] == cc[:-1], False]
        return pd.DataFrame({"o_custkey": cc,
                             "o_orderpriority": names[pc_],
                             "valid_from_day": dc,
                             "valid_to_day": np.where(same, nxt,
                                                      np.int64(-1))})

    return (_with_bucket(ds, "o_custkey", 32)
            .groupby("bucket").map_groups(window, batch_format="pandas"))


QUERIES["scd2_orders"] = q_scd2_orders
ORACLE_SQL["scd2_orders"] = """
        WITH f AS (SELECT o_custkey, o_orderkey, o_orderpriority,
                          CAST(CAST(o_orderdate AS DATE)
                               - DATE '1970-01-01' AS BIGINT) AS day
                   FROM orders),
        l AS (SELECT *, LAG(o_orderpriority) OVER (
                    PARTITION BY o_custkey ORDER BY day, o_orderkey)
                  AS pp
              FROM f),
        c AS (SELECT o_custkey, o_orderpriority, day,
                     LEAD(day) OVER (PARTITION BY o_custkey
                                     ORDER BY day, o_orderkey) AS nxt
              FROM l WHERE pp IS NULL OR pp <> o_orderpriority)
        SELECT o_custkey, o_orderpriority, day AS valid_from_day,
               COALESCE(nxt, -1) AS valid_to_day
        FROM c
    """


def q_gap_filled_daily_users(sf_dir: str):
    """Gap-filled per-user daily time series: each user's activity
    counts on a DENSE day spine bounded by their own [first, last]
    active day, absent days zero-filled — the per-key variable-length
    spine the fixed-vocabulary dense matrix can't express. Exact
    (user, day) count partials shuffle at pair cardinality; the spine
    explosion (repeat + cumsum-arange) and the searchsorted zero-fill
    merge run inside the per-bucket pass, so fan-out stays bounded by
    each user's own span."""
    from geotile.ops.relational import _with_bucket

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.divide(t["ts"].cast(pa.int64()),
                        pa.scalar(86_400_000_000, pa.int64()))
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = day.to_numpy(zero_copy_only=False)
        assert (d >= 0).all() and (d < 1 << 20).all(), "day pack range"
        k = (u << 20) | d
        return pa.table({"k": k}).group_by("k") \
                 .aggregate([("k", "count")])

    pairs = ev.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True) \
              .groupby("k").sum("k_count")

    def add_user(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy()
        return pa.table({"k": k, "n": t["sum(k_count)"].cast(pa.int64()),
                         "user_id": (k >> 20).astype(np.int64)})

    def spine(df: pd.DataFrame) -> pd.DataFrame:
        k = df["k"].to_numpy(np.int64)
        n = df["n"].to_numpy(np.int64)
        order = np.argsort(k)
        k, n = k[order], n[order]
        u = k >> 20
        d = k & ((1 << 20) - 1)
        new = np.r_[True, u[1:] != u[:-1]]
        starts = np.nonzero(new)[0]
        ends = np.r_[starts[1:], len(u)] - 1
        lo, hi, uu = d[starts], d[ends], u[starts]
        span = hi - lo + 1
        # dense day spine per user: repeat + cumsum-arange explosion
        user_col = np.repeat(uu, span)
        base = np.repeat(lo, span)
        off = np.arange(span.sum(), dtype=np.int64) \
            - np.repeat(np.cumsum(span) - span, span)
        day_col = base + off
        kk = (user_col << 20) | day_col
        pos = np.searchsorted(k, kk)
        hit = (pos < len(k)) & (k[np.minimum(pos, len(k) - 1)] == kk)
        out_n = np.where(hit, n[np.minimum(pos, len(k) - 1)],
                         np.int64(0))
        return pd.DataFrame({"user_id": user_col, "day": day_col,
                             "n": out_n})

    enriched = pairs.map_batches(add_user, batch_format="pyarrow",
                                 zero_copy_batch=True)
    return (_with_bucket(enriched, "user_id", 32)
            .groupby("bucket").map_groups(spine, batch_format="pandas"))


QUERIES["gap_filled_daily_users"] = q_gap_filled_daily_users
ORACLE_SQL["gap_filled_daily_users"] = """
        WITH c AS (SELECT user_id,
                          CAST(CAST(ts AS DATE) - DATE '1970-01-01'
                               AS BIGINT) AS day, count(*) AS n
                   FROM events GROUP BY 1, 2),
        b AS (SELECT user_id, MIN(day) AS lo, MAX(day) AS hi
              FROM c GROUP BY 1),
        s AS (SELECT user_id, unnest(generate_series(lo, hi)) AS day
              FROM b)
        SELECT s.user_id, CAST(s.day AS BIGINT) AS day,
               COALESCE(c.n, 0) AS n
        FROM s LEFT JOIN c USING (user_id, day)
    """


def _caption_geo_sql(img_dir: str) -> str:
    """Oracle for caption_geo_consistency: nearest stop replayed as a
    30-row CROSS JOIN + ROW_NUMBER argmin in the same meter frame
    (identical literals and multiply/add order as the engine's numpy
    kernel, so d² is bit-identical and the argmin tie-break — first
    stop index — matches exactly)."""
    from geotile.geom.buffer import meter_frame
    from geotile.ops.join import _ANCHOR_LAT
    from geotile.synth import N_STOPS, STOP_LATS, STOP_LONS

    mx, my = meter_frame(_ANCHOR_LAT)
    vals = ", ".join(
        f"({i}, {STOP_LONS[i]!r}, {STOP_LATS[i]!r})"
        for i in range(N_STOPS))
    return f"""
        WITH s(sid, slon, slat) AS (VALUES {vals}),
        p AS (SELECT image_id,
                     CAST(string_split(caption, ' ')[5] AS BIGINT)
                       AS caption_stop, lon, lat
              FROM read_parquet('{img_dir}/part-*.parquet')),
        d AS (SELECT p.image_id, p.caption_stop, s.sid,
                     ((p.lon - s.slon) * {mx!r})
                       * ((p.lon - s.slon) * {mx!r})
                     + ((p.lat - s.slat) * {my!r})
                       * ((p.lat - s.slat) * {my!r}) AS d2
              FROM p CROSS JOIN s),
        r AS (SELECT image_id, caption_stop, sid,
                     ROW_NUMBER() OVER (PARTITION BY image_id
                                        ORDER BY d2, sid) AS rn
              FROM d)
        SELECT caption_stop, count(*) AS n,
               SUM(CASE WHEN sid = caption_stop THEN 1 ELSE 0 END)
                 AS n_match
        FROM r WHERE rn = 1 GROUP BY 1
    """


def q_caption_geo_consistency(sf_dir: str):
    """Cross-modal consistency audit on the multimodal table: does the
    stop id WRITTEN IN each image's caption agree with the stop
    nearest to the image's georeferenced position? Per caption-stop:
    image count + geometric agreement count — the caption-vs-geometry
    validation a georeferenced image corpus needs before training on
    either modality. Metadata-only scan (payload pruned); the 30-stop
    table is a module constant on every worker, the N×30 meter-frame
    d² argmin is one vectorized kernel per batch; only 30-row count
    partials shuffle."""
    from geotile.geom.buffer import meter_frame
    from geotile.ops.join import _ANCHOR_LAT
    from geotile.ops.tiles import read_image_table
    from geotile.synth import STOP_LATS, STOP_LONS

    mx, my = meter_frame(_ANCHOR_LAT)
    ds = read_image_table(_image_dir_for(sf_dir),
                          columns=["caption", "lon", "lat"])

    def partial(t: pa.Table) -> pa.Table:
        stop = pc.cast(pc.list_element(
            pc.split_pattern(t["caption"], " "), 4), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        dx = (lon[:, None] - STOP_LONS[None, :]) * mx
        dy = (lat[:, None] - STOP_LATS[None, :]) * my
        nearest = np.argmin(dx * dx + dy * dy, axis=1)  # first-index tie
        match = (nearest == stop).astype(np.int64)
        g = pa.table({"caption_stop": stop, "m": match}) \
            .group_by("caption_stop") \
            .aggregate([([], "count_all"), ("m", "sum")])
        return g.rename_columns(["caption_stop", "n", "n_match"])

    out = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True) \
            .groupby("caption_stop").sum(["n", "n_match"])
    return _rename(out, ["caption_stop", "n", "n_match"])


QUERIES["caption_geo_consistency"] = q_caption_geo_consistency


def q_rebase_index_users(sf_dir: str):
    """FIRST_VALUE rebase (indexed time series): every event's value
    expressed per-mille of the SAME user's first observation
    (idx_pm = v·1000 ÷ v_first in integer division) — the
    base-100-style normalization comparative series need. The first
    value is gathered once per run (run-start positions broadcast by
    segment id), no expanding window."""
    from geotile.ops.relational import _with_bucket

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        v = pc.floor(pc.add(pc.multiply(t["value"], pa.scalar(10000.0)),
                            pa.scalar(0.5))).cast(pa.int64())
        return pa.table({"event_id": t["event_id"],
                         "user_id": t["user_id"],
                         "us": t["ts"].cast(pa.int64()), "v": v})

    ds = ev.map_batches(prep, batch_format="pyarrow",
                        zero_copy_batch=True)

    def window(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy(np.int64)
        us = df["us"].to_numpy(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        v = df["v"].to_numpy(np.int64)
        order = np.lexsort([eid, us, u])
        u, eid, v = u[order], eid[order], v[order]
        new = np.r_[True, u[1:] != u[:-1]]
        first = v[new][np.cumsum(new) - 1]  # run-start value per row
        return pd.DataFrame({"event_id": eid,
                             "idx_pm": v * 1000 // first})

    return (_with_bucket(ds, "user_id", 32)
            .groupby("bucket").map_groups(window, batch_format="pandas"))


QUERIES["rebase_index_users"] = q_rebase_index_users
ORACLE_SQL["rebase_index_users"] = """
        WITH f AS (SELECT event_id, user_id, ts,
                          CAST(floor(value * 10000.0 + 0.5) AS BIGINT)
                            AS v
                   FROM events)
        SELECT event_id,
               v * 1000 // FIRST_VALUE(v) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS idx_pm
        FROM f
    """


def q_except_all_users(sf_dir: str):
    """EXCEPT ALL (bag/multiset difference, the set op the DISTINCT
    set family doesn't cover): each user's click occurrences minus
    their view occurrences, kept only where positive — computed as
    count algebra (two per-side counts, one subtraction) instead of
    materializing and anti-matching occurrence rows. Per-batch packed
    (user, side) count partials; the shuffle is user-cardinality."""
    ev = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        is_c = pc.equal(t["event_type"], pa.scalar("click"))
        is_v = pc.equal(t["event_type"], pa.scalar("view"))
        keep = pc.or_(is_c, is_v)
        f = t.append_column("side", is_c.cast(pa.int64())).filter(keep)
        k = pc.add(pc.multiply(f["user_id"], pa.scalar(2, pa.int64())),
                   f["side"])
        return pa.table({"k": k}).group_by("k") \
                 .aggregate([("k", "count")])

    counts = ev.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True) \
               .groupby("k").sum("k_count")

    def per_user(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy()
        n = t["sum(k_count)"].to_numpy().astype(np.int64)
        sign = np.where((k & 1) == 1, n, -n)
        return pa.table({"user_id": (k >> 1).astype(np.int64),
                         "d": sign}) \
                 .group_by("user_id").aggregate([("d", "sum")])

    diff = counts.map_batches(per_user, batch_format="pyarrow",
                              zero_copy_batch=True) \
                 .groupby("user_id").sum("d_sum")

    def positive(t: pa.Table) -> pa.Table:
        f = t.filter(pc.greater(t["sum(d_sum)"], pa.scalar(0)))
        return pa.table({"user_id": f["user_id"],
                         "mult": f["sum(d_sum)"].cast(pa.int64())})

    return diff.map_batches(positive, batch_format="pyarrow",
                            zero_copy_batch=True)


QUERIES["except_all_users"] = q_except_all_users
ORACLE_SQL["except_all_users"] = """
        WITH d AS (SELECT user_id FROM events
                   WHERE event_type = 'click'
                   EXCEPT ALL
                   SELECT user_id FROM events
                   WHERE event_type = 'view')
        SELECT user_id, count(*) AS mult FROM d GROUP BY 1
    """


def q_nation_pair_revenue(sf_dir: str):
    """TPC-H Q7 shape (volume shipping): revenue between every
    (supplier-nation, customer-nation) pair per ship year. The
    dual-dimension join plan: customer resolves through TWO bucketed
    co-partition shuffles (orders⋈customer on custkey, then
    lineitem⋈that on orderkey — both fact-scale at 100 TB), while the
    supplier side is a broadcast searchsorted gather (suppkey→nationkey
    int array, ~10 MB even at 100 TB). Revenue on the per-element e4
    lattice before summation; partials are bounded by 25×25×years so
    the final shuffle is trivial."""
    from geotile.ops.relational import bucketed_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    oc = bucketed_join(orders, cust, "o_custkey", "c_custkey",
                       n_buckets=16)
    oc = oc.map_batches(
        lambda t: pa.table({"o_orderkey": t["o_orderkey"],
                            "cnat": t["c_nationkey"].cast(pa.int64())}),
        batch_format="pyarrow").materialize()  # schema-probe law

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice",
                "l_discount", "l_shipdate"])
    j = bucketed_join(li, oc, "l_orderkey", "o_orderkey", n_buckets=16)

    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).take_all()
    sk = np.array(sorted(r["s_suppkey"] for r in sup), dtype=np.int64)
    by = {r["s_suppkey"]: r["s_nationkey"] for r in sup}
    snat = np.array([by[k] for k in sk], dtype=np.int64)
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).take_all()
    nk = np.array(sorted(r["n_nationkey"] for r in nation), dtype=np.int64)
    nname = {r["n_nationkey"]: r["n_name"] for r in nation}
    names = pa.array([nname[k] for k in nk], pa.string())
    dim_ref = ray.put((sk, snat, nk, names))

    def partial(t: pa.Table) -> pa.Table:
        sk_, snat_, _, _ = _broadcast(dim_ref)
        s = t["l_suppkey"].to_numpy()
        idx = np.minimum(np.searchsorted(sk_, s), len(sk_) - 1)
        hit = sk_[idx] == s  # inner-join semantics on the broadcast side
        rev = pc.floor(pc.add(pc.multiply(
            pc.multiply(t["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), t["l_discount"])),
            pa.scalar(10000.0)), pa.scalar(0.5))).cast(pa.int64())
        g = pa.table({
            "snat": pa.array(snat_[idx[hit]]),
            "cnat": pc.array_filter(t["cnat"], pa.array(hit)),
            "l_year": pc.array_filter(pc.year(t["l_shipdate"]),
                                      pa.array(hit)),
            "revenue_e4": pc.array_filter(rev, pa.array(hit)),
        }).group_by(["snat", "cnat", "l_year"]).aggregate(
            [("revenue_e4", "sum"), ([], "count_all")])
        return pa.table({"snat": g["snat"], "cnat": g["cnat"],
                         "l_year": g["l_year"],
                         "revenue_e4": g["revenue_e4_sum"],
                         "n": g["count_all"].cast(pa.int64())})

    agg = (j.map_batches(partial, batch_format="pyarrow")
           .groupby(["snat", "cnat", "l_year"])
           .sum(["revenue_e4", "n"]))
    agg = _rename(agg, ["snat", "cnat", "l_year", "revenue_e4", "n"])

    def attach(t: pa.Table) -> pa.Table:
        _, _, nk_, names_ = _broadcast(dim_ref)
        si = pa.array(np.searchsorted(nk_, t["snat"].to_numpy()))
        ci = pa.array(np.searchsorted(nk_, t["cnat"].to_numpy()))
        return pa.table({"supp_nation": pc.take(names_, si),
                         "cust_nation": pc.take(names_, ci),
                         "l_year": t["l_year"],
                         "revenue_e4": t["revenue_e4"],
                         "n": t["n"]})

    return agg.map_batches(attach, batch_format="pyarrow")


QUERIES["nation_pair_revenue"] = q_nation_pair_revenue
ORACLE_SQL["nation_pair_revenue"] = """
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
               SUM(CAST(floor(l_extendedprice * (1 - l_discount)
                              * 10000.0 + 0.5) AS BIGINT)) AS revenue_e4,
               COUNT(*) AS n
        FROM lineitem
        JOIN orders   ON l_orderkey  = o_orderkey
        JOIN customer ON o_custkey   = c_custkey
        JOIN supplier ON l_suppkey   = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        GROUP BY 1, 2, 3
    """


def q_custdist_orders(sf_dir: str):
    """TPC-H Q13 shape (customer distribution): how many customers
    placed exactly k orders — INCLUDING the zero-order customers a
    plain orders groupby can never see. Plan = per-batch custkey count
    partials → custkey groupby (the honest shuffle), materialized per
    the bucketed_join schema-probe contract, then a LEFT co-partition
    join from customer so missing keys surface as NaN → 0, and a
    count-cardinality histogram (the second aggregation is over
    order-count values, a few dozen rows at any scale)."""
    from geotile.ops.relational import bucketed_join

    orders = _read(sf_dir, "orders", ["o_custkey"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("o_custkey").aggregate([([], "count_all")])
        return pa.table({"custkey": g["o_custkey"],
                         "cnt": g["count_all"].cast(pa.int64())})

    counts = (orders.map_batches(partial, batch_format="pyarrow")
              .groupby("custkey").sum("cnt"))
    counts = _rename(counts, ["custkey", "cnt"]).materialize()

    cust = _read(sf_dir, "customer", ["c_custkey"])
    j = bucketed_join(cust, counts, "c_custkey", "custkey",
                      n_buckets=16, how="left")

    def hist(t: pa.Table) -> pa.Table:
        c = t["cnt"].to_numpy(zero_copy_only=False).astype(np.float64)
        k = np.nan_to_num(c, nan=0.0).astype(np.int64)
        g = pa.table({"c_count": pa.array(k)}).group_by("c_count") \
            .aggregate([([], "count_all")])
        return pa.table({"c_count": g["c_count"],
                         "custdist": g["count_all"].cast(pa.int64())})

    out = (j.map_batches(hist, batch_format="pyarrow")
           .groupby("c_count").sum("custdist"))
    return _rename(out, ["c_count", "custdist"])


QUERIES["custdist_orders"] = q_custdist_orders
ORACLE_SQL["custdist_orders"] = """
        WITH per_cust AS (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY 1)
        SELECT CAST(c_count AS BIGINT) AS c_count,
               count(*) AS custdist
        FROM per_cust GROUP BY 1
    """


# 10 fixed promo windows over the Jan-2024 event domain: window w is
# [2024-01-01 12:00 + 3w days, +36 h) — sf-independent literals shared
# by the Ray plan and the SQL replay.
_PROMO_BASE_US = 1_704_110_400_000_000
_PROMO_STEP_US = 259_200 * 1_000_000
_PROMO_LEN_US = 129_600 * 1_000_000
_PROMO_WINDOWS = [(w, _PROMO_BASE_US + w * _PROMO_STEP_US,
                   _PROMO_BASE_US + w * _PROMO_STEP_US + _PROMO_LEN_US)
                  for w in range(10)]


def q_promo_session_overlap(sf_dir: str):
    """Broadcast interval-overlap join: sessionized user activity ×
    a small set of promo windows — sessions touching each window and
    the distinct users behind them. The small side is 10 literal
    intervals evaluated as a vectorized N×10 overlap mask per batch
    (never a shuffle join); the big side is
    relational.session_intervals (one co-partition). Distinct users
    per window via (window, user) dedup partials — cardinality is
    bounded by 10× users, then a 10-row epilogue."""
    from geotile.ops.relational import session_intervals

    iv = session_intervals(_read(sf_dir, "events", ["user_id", "ts"]))
    wa = np.array([a for _, a, _ in _PROMO_WINDOWS], dtype=np.int64)
    wb = np.array([b for _, _, b in _PROMO_WINDOWS], dtype=np.int64)

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        a = df["a_us"].to_numpy(np.int64)[:, None]
        b = df["b_us"].to_numpy(np.int64)[:, None]
        m = (a <= wb[None, :]) & (b >= wa[None, :])
        sess, win = np.nonzero(m)
        g = pd.DataFrame({"window_id": win.astype(np.int64),
                          "user_id": df["user_id"].to_numpy(np.int64)[sess]})
        g = g.groupby(["window_id", "user_id"], as_index=False).size()
        return g.rename(columns={"size": "n_sessions"})

    per_user = (iv.map_batches(pairs, batch_format="pandas")
                .groupby(["window_id", "user_id"]).sum("n_sessions"))

    def final(t: pa.Table) -> pa.Table:
        g = t.group_by("window_id").aggregate(
            [("sum(n_sessions)", "sum"), ([], "count_all")])
        return pa.table({"window_id": g["window_id"],
                         "n_sessions": g["sum(n_sessions)_sum"],
                         "n_users": g["count_all"].cast(pa.int64())})

    out = (per_user.map_batches(final, batch_format="pyarrow")
           .groupby("window_id").sum(["n_sessions", "n_users"]))
    return _rename(out, ["window_id", "n_sessions", "n_users"])


QUERIES["promo_session_overlap"] = q_promo_session_overlap
ORACLE_SQL["promo_session_overlap"] = """
        WITH s AS (SELECT user_id, epoch_us(ts) AS us,
                          CASE WHEN lag(ts) OVER w IS NULL
                                    OR ts - lag(ts) OVER w
                                       > INTERVAL 30 MINUTE
                               THEN 1 ELSE 0 END AS is_new
                   FROM events
                   WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        s2 AS (SELECT user_id, us,
                      SUM(is_new) OVER (PARTITION BY user_id ORDER BY us
                                        ROWS UNBOUNDED PRECEDING) AS sid
               FROM s),
        iv AS (SELECT user_id, sid, min(us) AS a, max(us) AS b
               FROM s2 GROUP BY 1, 2),
        promo(window_id, wa, wb) AS (VALUES """ + ", ".join(
    f"(CAST({w} AS BIGINT), CAST({a} AS BIGINT), CAST({b} AS BIGINT))"
    for w, a, b in _PROMO_WINDOWS) + """)
        SELECT window_id,
               count(*) AS n_sessions,
               count(DISTINCT user_id) AS n_users
        FROM iv JOIN promo ON a <= wb AND b >= wa
        GROUP BY 1
    """


def q_spearman_users(sf_dir: str):
    """Per-user Spearman rank statistic between event VALUE and event
    TIME (does a user's spend trend up over their history?) under a
    deterministic ROW_NUMBER tie-break — the rank-correlation window
    op. One co-partition on user, then BOTH rank permutations for
    every user in a bucket come from two lexsorts + reduceat (no
    per-user loop). rho_ppm = floor(num·10⁶/den + 0.5) evaluated in
    IEEE doubles with the identical op order as the SQL replay, so
    the hash matches bit-for-bit even where the product exceeds 2⁵³."""
    from geotile.ops.relational import _with_bucket

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"user_id": pd.Series(dtype=np.int64),
                                 "n": pd.Series(dtype=np.int64),
                                 "sum_d2": pd.Series(dtype=np.int64),
                                 "rho_ppm": pd.Series(dtype=np.int64)})
        u = df["user_id"].to_numpy(np.int64)
        e = df["event_id"].to_numpy(np.int64)
        t = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        v = df["value"].to_numpy(np.float64)
        n = len(u)
        o_t = np.lexsort((e, t, u))
        ut = u[o_t]
        new = np.r_[True, ut[1:] != ut[:-1]]
        first = np.flatnonzero(new)
        seg = np.cumsum(new) - 1
        rank_t = np.empty(n, np.int64)
        rank_t[o_t] = np.arange(n) - first[seg] + 1
        o_v = np.lexsort((e, t, v, u))
        rank_v = np.empty(n, np.int64)
        rank_v[o_v] = np.arange(n) - first[seg] + 1
        d2 = (rank_t - rank_v) ** 2
        sum_d2 = np.add.reduceat(d2[o_t], first)
        nn = np.diff(np.r_[first, n]).astype(np.int64)
        users = ut[first]
        keep = nn >= 2
        nn, sum_d2, users = nn[keep], sum_d2[keep], users[keep]
        den = nn * (nn * nn - 1)
        num = den - 6 * sum_d2
        rho = np.floor(num.astype(np.float64) * 1000000.0
                       / den.astype(np.float64) + 0.5).astype(np.int64)
        return pd.DataFrame({"user_id": users, "n": nn,
                             "sum_d2": sum_d2, "rho_ppm": rho})

    return (_with_bucket(ev, "user_id", 32)
            .groupby("bucket").map_groups(per_bucket, batch_format="pandas"))


QUERIES["spearman_users"] = q_spearman_users
ORACLE_SQL["spearman_users"] = """
        WITH r AS (SELECT user_id,
                          ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS rt,
                          ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY value, ts, event_id) AS rv
                   FROM events),
        agg AS (SELECT user_id, count(*) AS n,
                       SUM((rt - rv) * (rt - rv)) AS sum_d2
                FROM r GROUP BY 1 HAVING count(*) >= 2)
        SELECT user_id, CAST(n AS BIGINT) AS n,
               CAST(sum_d2 AS BIGINT) AS sum_d2,
               CAST(floor(CAST(n * (n * n - 1) - 6 * sum_d2 AS DOUBLE)
                          * 1000000.0
                          / CAST(n * (n * n - 1) AS DOUBLE) + 0.5)
                    AS BIGINT) AS rho_ppm
        FROM agg
    """


def q_mannwhitney_daily(sf_dir: str):
    """Per-day Mann-Whitney U (×2, exact integer) between click and
    view values on the cents lattice — the nonparametric A/B test as
    COUNT ALGEBRA: per-batch (day, cents, side) count partials packed
    into one int key, a lattice-cardinality groupby, then each day's
    U from one sorted-merge pass over its distinct-cents rows
    (2·Σ n_a·cumB(<c) + Σ n_a·n_b(c)). Row pairs never materialize;
    the shuffle is value-domain-bounded, not row-bounded."""
    ev = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        is_c = pc.equal(t["event_type"], pa.scalar("click"))
        is_v = pc.equal(t["event_type"], pa.scalar("view"))
        f = t.append_column("side", is_c.cast(pa.int64())) \
             .filter(pc.or_(is_c, is_v))
        day = pc.divide(f["ts"].cast(pa.int64()),
                        pa.scalar(86_400_000_000, pa.int64()))
        cents = pc.floor(pc.multiply(f["value"],
                                     pa.scalar(100.0))).cast(pa.int64())
        # domain filter (mirrored in the SQL replay): the lattice pack
        # carries 20 bits of non-negative cents
        ok = pc.and_(pc.greater_equal(cents, pa.scalar(0, pa.int64())),
                     pc.less(cents, pa.scalar(1 << 20, pa.int64())))
        f = f.filter(ok)
        day = day.filter(ok)
        cents = cents.filter(ok)
        key = pc.add(pc.add(
            pc.multiply(day, pa.scalar(1 << 21, pa.int64())),
            pc.multiply(cents, pa.scalar(2, pa.int64()))), f["side"])
        g = pa.table({"k": key}).group_by("k").aggregate([([], "count_all")])
        return pa.table({"k": g["k"],
                         "n": g["count_all"].cast(pa.int64())})

    counts = (ev.map_batches(partial, batch_format="pyarrow")
              .groupby("k").sum("n"))

    def unpack(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy()
        return pa.table({"day": pa.array(k >> 21),
                         "cents": pa.array((k >> 1) & ((1 << 20) - 1)),
                         "side": pa.array(k & 1),
                         "n": t["sum(n)"]})

    lattice = counts.map_batches(unpack, batch_format="pyarrow")

    def per_day(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"day": pd.Series(dtype=np.int64),
                              "n_click": pd.Series(dtype=np.int64),
                              "n_view": pd.Series(dtype=np.int64),
                              "u2x": pd.Series(dtype=np.int64)})
        if len(df) == 0:
            return empty
        a = df[df["side"] == 1].sort_values("cents")
        b = df[df["side"] == 0].sort_values("cents")
        if len(a) == 0 or len(b) == 0:
            return empty
        ca = a["cents"].to_numpy(np.int64)
        na = a["n"].to_numpy(np.int64)
        cb = b["cents"].to_numpy(np.int64)
        nb = b["n"].to_numpy(np.int64)
        cum = np.cumsum(nb)
        lo = np.searchsorted(cb, ca, "left")
        hi = np.searchsorted(cb, ca, "right")
        lt = np.where(lo > 0, cum[lo - 1], 0)
        eq = np.where(hi > lo, nb[np.minimum(lo, len(nb) - 1)], 0)
        return pd.DataFrame({
            "day": [np.int64(df["day"].iloc[0])],
            "n_click": [na.sum()], "n_view": [nb.sum()],
            "u2x": [2 * int((na * lt).sum()) + int((na * eq).sum())]})

    return lattice.groupby("day").map_groups(per_day,
                                             batch_format="pandas")


QUERIES["mannwhitney_daily"] = q_mannwhitney_daily
ORACLE_SQL["mannwhitney_daily"] = """
        WITH e AS (SELECT epoch_us(ts) // 86400000000 AS day,
                          CAST(floor(value * 100.0) AS BIGINT) AS c,
                          event_type
                   FROM events WHERE event_type IN ('click', 'view')
                     AND floor(value * 100.0) >= 0
                     AND floor(value * 100.0) < 1048576),
        a AS (SELECT day, c, count(*) AS n FROM e
              WHERE event_type = 'click' GROUP BY 1, 2),
        b AS (SELECT day, c, count(*) AS n FROM e
              WHERE event_type = 'view' GROUP BY 1, 2),
        lt AS (SELECT a.day, SUM(a.n * b.n) AS s
               FROM a JOIN b ON a.day = b.day AND b.c < a.c GROUP BY 1),
        eq AS (SELECT a.day, SUM(a.n * b.n) AS s
               FROM a JOIN b ON a.day = b.day AND b.c = a.c GROUP BY 1),
        na AS (SELECT day, SUM(n) AS n FROM a GROUP BY 1),
        nb AS (SELECT day, SUM(n) AS n FROM b GROUP BY 1)
        SELECT CAST(na.day AS BIGINT) AS day,
               CAST(na.n AS BIGINT) AS n_click,
               CAST(nb.n AS BIGINT) AS n_view,
               CAST(2 * COALESCE(lt.s, 0) + COALESCE(eq.s, 0) AS BIGINT)
                   AS u2x
        FROM na JOIN nb ON na.day = nb.day
        LEFT JOIN lt ON na.day = lt.day
        LEFT JOIN eq ON na.day = eq.day
    """


def q_twap_users(sf_dir: str):
    """Time-weighted average position per user (each event's value
    holds until the user's next event — the TWAP/state-duration
    integral): one co-partition on user, then durations for every
    user in a bucket from ONE shifted-diff over the lexsorted frame
    (run-boundary masked), weighted sums via reduceat on the exact
    cents×µs integer lattice (≤ 2⁶³ by domain bound). The LEAD window
    never materializes per-row next-event columns into a shuffle."""
    from geotile.ops.relational import _with_bucket

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"user_id": pd.Series(dtype=np.int64),
                                 "n": pd.Series(dtype=np.int64),
                                 "dur_us": pd.Series(dtype=np.int64),
                                 "wsum": pd.Series(dtype=np.int64)})
        u = df["user_id"].to_numpy(np.int64)
        e = df["event_id"].to_numpy(np.int64)
        t = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        cents = np.floor(df["value"].to_numpy(np.float64)
                         * 100.0).astype(np.int64)
        o = np.lexsort((e, t, u))
        uu, tu, cu = u[o], t[o], cents[o]
        same = np.r_[uu[1:] == uu[:-1], False]
        dur = np.where(same, np.r_[tu[1:] - tu[:-1], 0], 0)
        new = np.r_[True, uu[1:] != uu[:-1]]
        first = np.flatnonzero(new)
        return pd.DataFrame({
            "user_id": uu[first],
            "n": np.diff(np.r_[first, len(uu)]).astype(np.int64),
            "dur_us": np.add.reduceat(dur, first),
            "wsum": np.add.reduceat(cu * dur, first)})

    return (_with_bucket(ev, "user_id", 32)
            .groupby("bucket").map_groups(per_bucket, batch_format="pandas"))


QUERIES["twap_users"] = q_twap_users
ORACLE_SQL["twap_users"] = """
        WITH x AS (SELECT user_id, epoch_us(ts) AS us,
                          CAST(floor(value * 100.0) AS BIGINT) AS cents,
                          LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS nxt
                   FROM events)
        SELECT user_id, count(*) AS n,
               CAST(COALESCE(SUM(nxt - us), 0) AS BIGINT) AS dur_us,
               CAST(COALESCE(SUM(cents * (nxt - us)), 0) AS BIGINT) AS wsum
        FROM x GROUP BY 1
    """


def q_distance_rings_docs(sf_dir: str):
    """Distance-ring bucketing (the radial variant of the square-grid
    quantizer): each derived point is assigned to a concentric ring
    around (5,5) by comparing d² against fixed squared radii — no
    sqrt ever runs, so the float path is two subtractions, two
    multiplies, one add, five compares, identical to the SQL replay.
    Ring counts + char mass are 6-row partials; nothing shuffles at
    row scale."""
    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    radii2 = np.array([1.0, 4.0, 9.0, 16.0, 25.0])

    def rings(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy()
        x, y = _derived_points(d)
        d2 = (x - 5.0) * (x - 5.0) + (y - 5.0) * (y - 5.0)
        ring = (d2[:, None] > radii2[None, :]).sum(axis=1).astype(np.int64)
        g = pa.table({"ring": pa.array(ring),
                      "n_chars": t["n_chars"]}).group_by("ring") \
            .aggregate([([], "count_all"), ("n_chars", "sum")])
        return pa.table({"ring": g["ring"],
                         "n": g["count_all"].cast(pa.int64()),
                         "sum_chars": g["n_chars_sum"]})

    out = (ds.map_batches(rings, batch_format="pyarrow")
           .groupby("ring").sum(["n", "sum_chars"]))
    return _rename(out, ["ring", "n", "sum_chars"])


QUERIES["distance_rings_docs"] = q_distance_rings_docs
ORACLE_SQL["distance_rings_docs"] = """
        WITH pts AS (
            SELECT doc_id, n_chars,
                   (doc_id * 2654435761 % 4294967296) / 4294967296.0
                       * 10.0 AS x,
                   ((doc_id * 40503 + 7) % 65536) / 65536.0 * 10.0 AS y
            FROM documents),
        r AS (SELECT n_chars,
                     CAST((x-5.0)*(x-5.0) + (y-5.0)*(y-5.0) > 1.0 AS INT)
                   + CAST((x-5.0)*(x-5.0) + (y-5.0)*(y-5.0) > 4.0 AS INT)
                   + CAST((x-5.0)*(x-5.0) + (y-5.0)*(y-5.0) > 9.0 AS INT)
                   + CAST((x-5.0)*(x-5.0) + (y-5.0)*(y-5.0) > 16.0 AS INT)
                   + CAST((x-5.0)*(x-5.0) + (y-5.0)*(y-5.0) > 25.0 AS INT)
                       AS ring
              FROM pts)
        SELECT CAST(ring AS BIGINT) AS ring, count(*) AS n,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM r GROUP BY 1
    """


# PQ codebook: 4 subspaces × 16 dims, 4 centroids per subspace;
# centroid j's coordinate i is _PQ_CVALS[(i + j) % 4] — literals shared
# verbatim by the numpy path and the generated SQL replay.
_PQ_CVALS = (-0.3, -0.1, 0.1, 0.3)
_PQ_M, _PQ_SUB, _PQ_K = 4, 16, 4


def q_pq_codes_embeddings(sf_dir: str):
    """Product-quantization encoding of the 64-dim embedding column:
    each vector is compressed to a 4-symbol code (argmin centroid per
    16-dim subspace, first-wins ties), then the corpus becomes a
    256-cardinality code histogram — the ANN-compression layout step.
    Distances accumulate left-to-right per coordinate so the IEEE
    float path is the literal op-order of the SQL replay's generated
    expression; partials are code-cardinality, the corpus never
    shuffles."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])

    def encode(t: pa.Table) -> pa.Table:
        emb = t["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        vals = emb.values.to_numpy(zero_copy_only=False) \
            .astype(np.float64).reshape(len(t), 64)
        code = np.zeros(len(t), np.int64)
        for s in range(_PQ_M):
            sub = vals[:, s * _PQ_SUB:(s + 1) * _PQ_SUB]
            dists = []
            for j in range(_PQ_K):
                acc = None
                for i in range(_PQ_SUB):
                    c = _PQ_CVALS[(i + j) % 4]
                    term = (sub[:, i] - c) * (sub[:, i] - c)
                    acc = term if acc is None else acc + term
                dists.append(acc)
            d = np.stack(dists, axis=1)
            code = code * 4 + np.argmin(d, axis=1)
        lab = t["label"].to_numpy().astype(np.int64)
        g = pa.table({"code": pa.array(code),
                      "label": pa.array(lab)}).group_by("code") \
            .aggregate([([], "count_all"), ("label", "sum")])
        return pa.table({"code": g["code"],
                         "n": g["count_all"].cast(pa.int64()),
                         "label_sum": g["label_sum"]})

    out = (ds.map_batches(encode, batch_format="pyarrow")
           .groupby("code").sum(["n", "label_sum"]))
    return _rename(out, ["code", "n", "label_sum"])


def _pq_oracle_sql() -> str:
    def dist(s: int, j: int) -> str:
        terms = []
        for i in range(_PQ_SUB):
            c = repr(_PQ_CVALS[(i + j) % 4])
            e = f"CAST(embedding[{s * _PQ_SUB + i + 1}] AS DOUBLE)"
            terms.append(f"(({e}) - ({c})) * (({e}) - ({c}))")
        return " + ".join(terms)

    subs = []
    for s in range(_PQ_M):
        d = [dist(s, j) for j in range(_PQ_K)]
        case = (f"CASE WHEN ({d[0]}) <= ({d[1]}) AND ({d[0]}) <= ({d[2]})"
                f" AND ({d[0]}) <= ({d[3]}) THEN 0"
                f" WHEN ({d[1]}) <= ({d[2]}) AND ({d[1]}) <= ({d[3]})"
                f" THEN 1 WHEN ({d[2]}) <= ({d[3]}) THEN 2 ELSE 3 END")
        subs.append(f"({case}) AS c{s}")
    return f"""
        WITH codes AS (SELECT label, {', '.join(subs)} FROM embeddings)
        SELECT CAST(((c0 * 4 + c1) * 4 + c2) * 4 + c3 AS BIGINT) AS code,
               count(*) AS n, CAST(SUM(label) AS BIGINT) AS label_sum
        FROM codes GROUP BY 1
    """


QUERIES["pq_codes_embeddings"] = q_pq_codes_embeddings
ORACLE_SQL["pq_codes_embeddings"] = _pq_oracle_sql()


def q_pattern_triples_users(sf_dir: str):
    """MATCH_RECOGNIZE-lite: per user, occurrences of the exact
    consecutive event pattern view → click → purchase in time order
    (deterministic event_id tie-break). One co-partition on user,
    then the whole bucket's pattern scan is two shifted compares over
    the lexsorted type-code array with run-boundary masking — the
    two-LAG window replay without materializing lag columns."""
    from geotile.ops.relational import _with_bucket

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id",
                                  "event_type"])
    tcode = {"view": 0, "click": 1, "purchase": 2, "signup": 3,
             "error": 4}

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"user_id": pd.Series(dtype=np.int64),
                                 "n_triples": pd.Series(dtype=np.int64)})
        u = df["user_id"].to_numpy(np.int64)
        e = df["event_id"].to_numpy(np.int64)
        t = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        c = df["event_type"].map(tcode).to_numpy(np.int64)
        o = np.lexsort((e, t, u))
        uu, cu = u[o], c[o]
        hit = np.zeros(len(uu), bool)
        if len(uu) >= 3:
            hit[:-2] = ((cu[:-2] == 0) & (cu[1:-1] == 1) & (cu[2:] == 2)
                        & (uu[:-2] == uu[2:]))
        g = pd.DataFrame({"user_id": uu[hit]}) \
            .groupby("user_id", as_index=False).size()
        return g.rename(columns={"size": "n_triples"})

    return (_with_bucket(ev, "user_id", 32)
            .groupby("bucket").map_groups(per_bucket,
                                          batch_format="pandas"))


QUERIES["pattern_triples_users"] = q_pattern_triples_users
ORACLE_SQL["pattern_triples_users"] = """
        WITH s AS (SELECT user_id, event_type,
                          LEAD(event_type, 1) OVER w AS t1,
                          LEAD(event_type, 2) OVER w AS t2
                   FROM events
                   WINDOW w AS (PARTITION BY user_id
                                ORDER BY ts, event_id))
        SELECT user_id, count(*) AS n_triples
        FROM s
        WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
        GROUP BY 1
    """


_COMPACT_TARGET = 20_000  # chars per output bin


def q_compaction_plan_docs(sf_dir: str):
    """Lakehouse file-compaction planner: assign doc_id-ordered files
    to output bins by cumulative size (bin = exclusive-prefix-chars //
    target) — the greedy floor-cumsum packing every table-maintenance
    service runs. NO global sort: pass A takes order-aligned coarse
    id-range buckets (per-batch sum partials, driver exclusive scan
    over ≤4096 bucket bases), pass B restores each bucket's exact
    prefix with one in-bucket lexsorted cumsum + broadcast base, then
    bins aggregate at bin cardinality. The window-cumsum replay costs
    one bucket-count driver scan, never an all-to-all."""
    docs = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    n = docs.count()  # metadata-only on a pure parquet read
    shift = max(0, int(n).bit_length() - 12)

    def partial(t: pa.Table) -> pa.Table:
        b = pc.shift_right(t["doc_id"], pa.scalar(shift, pa.int64()))
        g = pa.table({"bucket": b, "c": t["n_chars"]}).group_by(
            "bucket").aggregate([("c", "sum")])
        return pa.table({"bucket": g["bucket"], "c": g["c_sum"]})

    per_bucket = (docs.map_batches(partial, batch_format="pyarrow")
                  .groupby("bucket").sum("c")).take_all()
    per_bucket.sort(key=lambda r: r["bucket"])
    bk = np.array([r["bucket"] for r in per_bucket], dtype=np.int64)
    sums = np.array([r["sum(c)"] for r in per_bucket], dtype=np.int64)
    bases = np.r_[0, np.cumsum(sums)[:-1]]
    base_ref = ray.put((bk, bases))

    def bins(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"bin": pd.Series(dtype=np.int64),
                                 "n_docs": pd.Series(dtype=np.int64),
                                 "sum_chars": pd.Series(dtype=np.int64),
                                 "min_doc": pd.Series(dtype=np.int64),
                                 "max_doc": pd.Series(dtype=np.int64)})
        bk_, bases_ = _broadcast(base_ref)
        d = df["doc_id"].to_numpy(np.int64)
        c = df["n_chars"].to_numpy(np.int64)
        o = np.argsort(d, kind="stable")
        d, c = d[o], c[o]
        base = bases_[np.searchsorted(bk_, d[0] >> shift)]
        prev = base + np.cumsum(c) - c
        g = pd.DataFrame({"bin": prev // _COMPACT_TARGET,
                          "n_chars": c, "doc_id": d}) \
            .groupby("bin", as_index=False) \
            .agg(n_docs=("doc_id", "size"), sum_chars=("n_chars", "sum"),
                 min_doc=("doc_id", "min"), max_doc=("doc_id", "max"))
        return g

    ded = docs.map_batches(
        lambda t: t.append_column(
            "bucket", pc.shift_right(t["doc_id"],
                                     pa.scalar(shift, pa.int64()))),
        batch_format="pyarrow")
    out = (ded.groupby("bucket").map_groups(bins, batch_format="pandas")
           .groupby("bin")
           .aggregate(rd.aggregate.Sum("n_docs"),
                      rd.aggregate.Sum("sum_chars"),
                      rd.aggregate.Min("min_doc"),
                      rd.aggregate.Max("max_doc")))
    return _rename(out, ["bin", "n_docs", "sum_chars", "min_doc",
                         "max_doc"])


QUERIES["compaction_plan_docs"] = q_compaction_plan_docs
ORACLE_SQL["compaction_plan_docs"] = """
        WITH c AS (SELECT doc_id, n_chars,
                          COALESCE(SUM(n_chars) OVER (ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING), 0) AS prev
                   FROM documents)
        SELECT CAST(prev // 20000 AS BIGINT) AS bin,
               count(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
               min(doc_id) AS min_doc, max(doc_id) AS max_doc
        FROM c GROUP BY 1
    """


def q_dominant_supplier_parts(sf_dir: str):
    """TPC-H Q20-flavoured dominance ranking: per supplier, how many
    parts where THIS supplier is the STRICT top shipper by total
    quantity (unique argmax — ties disqualify the part). Quantity
    sums are integer-exact (TPC-H quantities are integral), so the
    argmax needs no float tie hazard. Plan: (part,supp) sum partials
    → pair-cardinality groupby, then ONE part-bucket co-partition
    resolves every part's argmax + tie flag in a single lexsort pass
    — no join back, and only supplier-cardinality partials leave."""
    from geotile.ops.relational import _with_bucket

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        q = t["l_quantity"].cast(pa.int64())
        g = pa.table({"l_partkey": t["l_partkey"],
                      "l_suppkey": t["l_suppkey"], "q": q}) \
            .group_by(["l_partkey", "l_suppkey"]).aggregate([("q", "sum")])
        return pa.table({"l_partkey": g["l_partkey"],
                         "l_suppkey": g["l_suppkey"], "q": g["q_sum"]})

    ps = (li.map_batches(partial, batch_format="pyarrow")
          .groupby(["l_partkey", "l_suppkey"]).sum("q"))
    ps = _rename(ps, ["l_partkey", "l_suppkey", "q"])

    def winners(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"l_suppkey": pd.Series(dtype=np.int64),
                                 "n_top_parts": pd.Series(dtype=np.int64)})
        p = df["l_partkey"].to_numpy(np.int64)
        sk = df["l_suppkey"].to_numpy(np.int64)
        q = df["q"].to_numpy(np.int64)
        o = np.lexsort((sk, -q, p))
        p, sk, q = p[o], sk[o], q[o]
        first = np.r_[True, p[1:] != p[:-1]]
        # unique max: the next row is a different part or a strictly
        # smaller quantity
        nxt_same = np.r_[p[1:] == p[:-1], False]
        nxt_eq = np.r_[q[1:] == q[:-1], False]
        win = first & ~(nxt_same & nxt_eq)
        g = pd.DataFrame({"l_suppkey": sk[win]}) \
            .groupby("l_suppkey", as_index=False).size()
        return g.rename(columns={"size": "n_top_parts"})

    out = (_with_bucket(ps, "l_partkey", 16)
           .groupby("bucket").map_groups(winners, batch_format="pandas")
           .groupby("l_suppkey").sum("n_top_parts"))
    return _rename(out, ["l_suppkey", "n_top_parts"])


QUERIES["dominant_supplier_parts"] = q_dominant_supplier_parts
ORACLE_SQL["dominant_supplier_parts"] = """
        WITH ps AS (SELECT l_partkey, l_suppkey,
                           SUM(CAST(l_quantity AS BIGINT)) AS q
                    FROM lineitem GROUP BY 1, 2),
        pt AS (SELECT l_partkey, max(q) AS mq FROM ps GROUP BY 1),
        top AS (SELECT ps.l_partkey, ps.l_suppkey
                FROM ps JOIN pt ON ps.l_partkey = pt.l_partkey
                              AND ps.q = pt.mq),
        uniq AS (SELECT l_partkey FROM top
                 GROUP BY 1 HAVING count(*) = 1)
        SELECT l_suppkey, count(*) AS n_top_parts
        FROM top JOIN uniq USING (l_partkey)
        GROUP BY 1
    """


def q_activity_bitmap_users(sf_dir: str):
    """User-activity bitmaps: each user's 30-day January activity as
    one packed int64 bitmask (bit d = active on day d), then the
    corpus collapses to a histogram over exact activity PATTERNS —
    the roaring-bitmap layout step for cohort tooling. Distinct
    (user, day) pairs via packed dedup partials, per-user mask as a
    plain SUM of 1<<day over distinct days (bit_or without a bit_or
    kernel), pattern histogram at mask cardinality."""
    _DAY0 = 19723  # 2024-01-01
    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def pairs(t: pa.Table) -> pa.Table:
        day = pc.divide(t["ts"].cast(pa.int64()),
                        pa.scalar(86_400_000_000, pa.int64()))
        rel = pc.subtract(day, pa.scalar(_DAY0, pa.int64()))
        # domain filter (mirrored in the SQL replay): rows outside the
        # 31-day January window are out of the bitmap's key space
        keep = pc.and_(pc.greater_equal(rel, pa.scalar(0, pa.int64())),
                       pc.less(rel, pa.scalar(31, pa.int64())))
        k = pc.add(pc.multiply(t["user_id"], pa.scalar(32, pa.int64())),
                   rel).filter(keep)
        return pa.table({"k": k}).group_by("k").aggregate([])

    ded = (ev.map_batches(pairs, batch_format="pyarrow")
           .groupby("k").count())

    def per_user(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy()
        bits = np.int64(1) << (k & 31)
        g = pa.table({"user_id": pa.array(k >> 5),
                      "bit": pa.array(bits)}).group_by("user_id") \
            .aggregate([("bit", "sum"), ([], "count_all")])
        return pa.table({"user_id": g["user_id"], "mask": g["bit_sum"],
                         "n_days": g["count_all"].cast(pa.int64())})

    masks = (ded.map_batches(per_user, batch_format="pyarrow")
             .groupby("user_id").sum(["mask", "n_days"]))

    def hist(t: pa.Table) -> pa.Table:
        g = t.group_by(["sum(mask)", "sum(n_days)"]).aggregate(
            [([], "count_all")])
        return pa.table({"mask": g["sum(mask)"],
                         "n_days": g["sum(n_days)"],
                         "n_users": g["count_all"].cast(pa.int64())})

    out = (masks.map_batches(hist, batch_format="pyarrow")
           .groupby(["mask", "n_days"]).sum("n_users"))
    return _rename(out, ["mask", "n_days", "n_users"])


QUERIES["activity_bitmap_users"] = q_activity_bitmap_users
ORACLE_SQL["activity_bitmap_users"] = """
        WITH d AS (SELECT DISTINCT user_id,
                          epoch_us(ts) // 86400000000 - 19723 AS day
                   FROM events
                   WHERE epoch_us(ts) // 86400000000 - 19723
                         BETWEEN 0 AND 30),
        m AS (SELECT user_id,
                     CAST(SUM(CAST(1 AS BIGINT) << CAST(day AS INT))
                          AS BIGINT) AS mask,
                     count(*) AS n_days
              FROM d GROUP BY 1)
        SELECT mask, CAST(n_days AS BIGINT) AS n_days,
               count(*) AS n_users
        FROM m GROUP BY 1, 2
    """


def q_important_parts(sf_dir: str):
    """TPC-H Q11 shape (important stock): parts whose revenue exceeds
    2× the mean part revenue — the global-fraction filter that needs
    a whole-corpus scalar before any row can be kept. Two passes over
    the PART-cardinality aggregate, not the fact table: per-part e4
    revenue partials → part groupby (materialized once), then the
    total/count reduce to two driver scalars that ride into the
    filter closure — the fact table is read exactly once."""
    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        rev = pc.floor(pc.add(pc.multiply(
            pc.multiply(t["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), t["l_discount"])),
            pa.scalar(10000.0)), pa.scalar(0.5))).cast(pa.int64())
        g = pa.table({"l_partkey": t["l_partkey"], "revenue_e4": rev}) \
            .group_by("l_partkey").aggregate([("revenue_e4", "sum")])
        return pa.table({"l_partkey": g["l_partkey"],
                         "revenue_e4": g["revenue_e4_sum"]})

    pr = (li.map_batches(partial, batch_format="pyarrow")
          .groupby("l_partkey").sum("revenue_e4"))
    pr = _rename(pr, ["l_partkey", "revenue_e4"]).materialize()
    tot = int(pr.sum("revenue_e4"))
    n_parts = int(pr.count())

    return pr.map_batches(
        lambda t: t.filter(pc.greater(
            pc.multiply(t["revenue_e4"],
                        pa.scalar(2 * n_parts, pa.int64())),
            pa.scalar(3 * tot, pa.int64()))),
        batch_format="pyarrow")


QUERIES["important_parts"] = q_important_parts
ORACLE_SQL["important_parts"] = """
        WITH pr AS (SELECT l_partkey,
                           SUM(CAST(floor(l_extendedprice * (1 - l_discount)
                                          * 10000.0 + 0.5) AS BIGINT))
                               AS revenue_e4
                    FROM lineitem GROUP BY 1),
        t AS (SELECT SUM(revenue_e4) AS tot, count(*) AS np FROM pr)
        SELECT l_partkey, revenue_e4
        FROM pr, t WHERE revenue_e4 * 2 * np > 3 * tot
    """


def q_image_glcm_energy(sf_dir: str):
    """Texture analysis over the image corpus: per-image 8-level gray
    co-occurrence energy (Σ counts² over the 64-cell horizontal-pair
    GLCM) for the first 1024 images — the classic Haralick feature as
    an actor-pool stage. The whole size group counts in one bincount
    over image-offset-packed pair codes; every value is integer, so
    the generator-replay sidecar (different kernel: per-column add.at
    over pixel_pattern ground truth) matches exactly."""
    from geotile.ops.tiles import ImageGlcmStage, read_image_table

    ds = read_image_table(_image_dir_for(sf_dir)).limit(1024)
    return ds.map_batches(
        ImageGlcmStage, batch_format="pyarrow", batch_size=256,
        concurrency=2,
    )


QUERIES["image_glcm_energy"] = q_image_glcm_energy


def _image_glcm_sidecar(img: str, n: int = 1024) -> str:
    """Generator-replay sidecar for image_glcm_energy: rebuild each
    image's GLCM from synth.pixel_pattern with a per-column np.add.at
    kernel + python-int energy (vs the stage's single offset-packed
    bincount). Content-keyed on synth.py."""
    import geotile.synth as _sy
    import pyarrow.parquet as pq
    from pathlib import Path

    p = _oracle_cache_dir() / (
        f"oracle_imgglcm_{Path(img).name}_{n}_{_mods_digest(_sy)}.parquet"
    )
    if not p.exists():
        t = pq.read_table(img, columns=["image_id", "w", "h"])
        order = pc.sort_indices(t["image_id"])[:n]
        ids = t["image_id"].take(order)
        ws = t["w"].take(order).to_numpy(zero_copy_only=False)
        hs = t["h"].take(order).to_numpy(zero_copy_only=False)
        idx = _sy.image_index(ids).astype(np.uint64)
        ids_py = ids.to_pylist()
        en = np.zeros(len(ids_py), np.int64)
        npair = np.zeros(len(ids_py), np.int64)
        for wi, hi in set(zip(ws.tolist(), hs.tolist())):
            m = np.nonzero((ws == wi) & (hs == hi))[0]
            px = _sy.pixel_pattern(idx[m], wi, hi)
            gray = (px[..., 0].astype(np.int64) + px[..., 1]
                    + px[..., 2]) // 3
            q = gray >> 5
            for j, slot in enumerate(m):
                acc = np.zeros(64, np.int64)
                for x in range(wi - 1):
                    np.add.at(acc, q[j, :, x] * 8 + q[j, :, x + 1], 1)
                en[slot] = sum(int(c) * int(c) for c in acc)
                npair[slot] = hi * (wi - 1)
        out = pa.table({"image_id": ids, "glcm_energy": pa.array(en),
                        "n_pairs": pa.array(npair)})
        _oracle_cache_dir().mkdir(parents=True, exist_ok=True)
        _atomic_write_table(out, p)
    return str(p)


def _image_glcm_sql(img: str) -> str:
    return (f"SELECT image_id, glcm_energy, n_pairs "
            f"FROM read_parquet('{_image_glcm_sidecar(img)}')")


_SF_AUDIO_ROWS = {"sf0.001": 64, "sf0.01": 256, "sf0.1": 1024}


def _audio_dir_for(sf_dir: str) -> str:
    import os
    from pathlib import Path

    from geotile.synth import make_audio_table

    sf_name = Path(sf_dir).name
    n = _SF_AUDIO_ROWS.get(sf_name, 64)
    out = Path(os.environ.get("GEOTILE_CACHE",
                              "/tmp/geotile_cache")) / f"audio_{sf_name}"
    make_audio_table(n, out)
    return str(out)


def q_audio_frame_energy(sf_dir: str):
    """Audio-modality frame features: decode each PCM track and emit
    one row per 1024-sample frame with its exact integer energy
    (Σ s², < 2⁴⁰ so int64 is safe) — the framing front end of any
    audio feature pipeline, run as an actor-pool stage over opaque
    binary payloads + typed metadata (ops/audio.py; unsupported
    codecs raise NotImplementedError by design in this container)."""
    from geotile.ops.audio import AudioFrameStage, read_audio_table

    ds = read_audio_table(_audio_dir_for(sf_dir))
    return ds.map_batches(
        AudioFrameStage, batch_format="pyarrow", batch_size=64,
        concurrency=2,
    )


QUERIES["audio_frame_energy"] = q_audio_frame_energy


def _audio_energy_sidecar(aud: str) -> str:
    """Generator-replay sidecar for audio_frame_energy: regenerate the
    PCM from synth.audio_samples and sum squares per frame in PYTHON
    INTS (vs the stage's vectorized int64 square/reshape/sum) —
    integer-exact, so any decode/frame bug shows as a mismatch.
    Content-keyed on synth.py."""
    import geotile.synth as _sy
    import pyarrow.parquet as pq
    from pathlib import Path

    p = _oracle_cache_dir() / (
        f"oracle_audioenergy_{Path(aud).name}_{_mods_digest(_sy)}.parquet"
    )
    if not p.exists():
        t = pq.read_table(aud, columns=["track_id"])
        ids = np.sort(t["track_id"].to_numpy(zero_copy_only=False))
        pcm = _sy.audio_samples(ids)
        frame = 1024
        nfr = pcm.shape[1] // frame
        rows_id, rows_fr, rows_en = [], [], []
        for j, tid in enumerate(ids.tolist()):
            for f in range(nfr):
                chunk = pcm[j, f * frame:(f + 1) * frame].tolist()
                rows_id.append(tid)
                rows_fr.append(f)
                rows_en.append(sum(int(v) * int(v) for v in chunk))
        out = pa.table({"track_id": pa.array(rows_id, pa.int64()),
                        "frame": pa.array(rows_fr, pa.int64()),
                        "energy": pa.array(rows_en, pa.int64())})
        _oracle_cache_dir().mkdir(parents=True, exist_ok=True)
        _atomic_write_table(out, p)
    return str(p)


def _audio_energy_sql(aud: str) -> str:
    return (f"SELECT track_id, frame, energy "
            f"FROM read_parquet('{_audio_energy_sidecar(aud)}')")


def q_token_pair_support_docs(sf_dir: str):
    """Market-basket co-occurrence at TEXT scale: unordered token
    pairs sharing a document, kept at ≥25% support — a-priori's first
    join as a GRAM MATRIX. Pass 1 reduces the corpus to its distinct
    token vocabulary (dedup partials; vocab is Heaps'-law bounded and
    broadcast sorted). Pass 2 builds each batch's doc×vocab presence
    matrix and computes ALL pair counts in one V×V integer matmul —
    pair rows never exist until the V²-bounded partials; the corpus
    text never shuffles."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = docs.count()  # metadata-only on a pure parquet read

    def toks(t: pa.Table) -> pa.Table:
        w = pc.list_flatten(pc.split_pattern(t["text"], " "))
        w = w.filter(pc.not_equal(w, pa.scalar("")))
        return pa.table({"token": w}).group_by("token").aggregate([])

    vocab_rows = (docs.map_batches(toks, batch_format="pyarrow")
                  .groupby("token").count()).take_all()
    vocab = np.array(sorted(r["token"] for r in vocab_rows))
    vref = ray.put(vocab)

    def pairs(t: pa.Table) -> pa.Table:
        v = _broadcast(vref)
        V = len(v)
        lists = pc.split_pattern(t["text"], " ")
        flat = pc.list_flatten(lists).to_numpy(zero_copy_only=False)
        lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        doc_of = np.repeat(np.arange(len(t)), lens)
        keep = flat != ""
        code = np.searchsorted(v, flat[keep])
        m = np.zeros((len(t), V), np.int64)
        m[doc_of[keep], code] = 1
        gram = m.T @ m
        iu, ju = np.triu_indices(V, k=1)
        s = gram[iu, ju]
        nz = s > 0
        return pa.table({"i": pa.array(iu[nz].astype(np.int64)),
                         "j": pa.array(ju[nz].astype(np.int64)),
                         "support": pa.array(s[nz])})

    agg = (docs.map_batches(pairs, batch_format="pyarrow")
           .groupby(["i", "j"]).sum("support"))

    def final(t: pa.Table) -> pa.Table:
        v = _broadcast(vref)
        s = t["sum(support)"].to_numpy()
        keep = s * 4 >= n_docs
        return pa.table({
            "t1": pa.array(v[t["i"].to_numpy()[keep]]),
            "t2": pa.array(v[t["j"].to_numpy()[keep]]),
            "support": pa.array(s[keep])})

    return agg.map_batches(final, batch_format="pyarrow")


QUERIES["token_pair_support_docs"] = q_token_pair_support_docs
ORACLE_SQL["token_pair_support_docs"] = """
        WITH tok AS (SELECT DISTINCT doc_id, w
                     FROM (SELECT doc_id,
                                  unnest(string_split(text, ' ')) AS w
                           FROM documents) t(doc_id, w)
                     WHERE w <> ''),
        nd AS (SELECT count(*) AS n FROM documents),
        p AS (SELECT a.w AS t1, b.w AS t2, count(*) AS support
              FROM tok a JOIN tok b
                ON a.doc_id = b.doc_id AND a.w < b.w
              GROUP BY 1, 2)
        SELECT t1, t2, support FROM p, nd WHERE support * 4 >= nd.n
    """


def q_attribution_lasttouch(sf_dir: str):
    """Marketing last-touch attribution: every purchase credits the
    user's most recent PRIOR non-purchase event type ('none' when the
    purchase opens the history) — the IGNORE-NULLS backward fill that
    powers attribution reporting. One co-partition on user; the
    forward-fill for every user in a bucket is a single
    maximum.accumulate over segment-offset-shifted valid positions
    (the reset never crosses a user), then one gather + one shift —
    no per-user loop, no LAG column materialization."""
    from geotile.ops.relational import _with_bucket

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id",
                                  "event_type"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"touch_type": pd.Series(dtype=object),
                                 "n_purchases":
                                     pd.Series(dtype=np.int64)})
        u = df["user_id"].to_numpy(np.int64)
        e = df["event_id"].to_numpy(np.int64)
        t = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        ty = df["event_type"].to_numpy()
        o = np.lexsort((e, t, u))
        uu, tyu = u[o], ty[o]
        n = len(uu)
        new = np.r_[True, uu[1:] != uu[:-1]]
        seg = np.cumsum(new) - 1
        gpos = np.arange(n, dtype=np.int64)
        valid = tyu != "purchase"
        big = np.int64(n + 2)
        w = np.where(valid, gpos, -1) + seg * big
        acc = np.maximum.accumulate(w)
        prev = np.r_[np.int64(-1), acc[:-1]]
        prev[new] = -1  # a purchase at history start has no touch
        last_idx = np.where(prev >= 0, prev - seg * big, -1)
        is_p = tyu == "purchase"
        li = last_idx[is_p]
        touch = np.where(li >= 0, tyu[np.maximum(li, 0)], "none")
        g = pd.DataFrame({"touch_type": touch}) \
            .groupby("touch_type", as_index=False).size()
        return g.rename(columns={"size": "n_purchases"})

    out = (_with_bucket(ev, "user_id", 32)
           .groupby("bucket").map_groups(per_bucket,
                                         batch_format="pandas")
           .groupby("touch_type").sum("n_purchases"))
    return _rename(out, ["touch_type", "n_purchases"])


QUERIES["attribution_lasttouch"] = q_attribution_lasttouch
ORACLE_SQL["attribution_lasttouch"] = """
        WITH s AS (SELECT user_id, event_type,
                          LAST_VALUE(CASE WHEN event_type <> 'purchase'
                                          THEN event_type END
                                     IGNORE NULLS)
                              OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) AS touch
                   FROM events)
        SELECT COALESCE(touch, 'none') AS touch_type,
               count(*) AS n_purchases
        FROM s WHERE event_type = 'purchase' GROUP BY 1
    """


def q_audio_silence_runs(sf_dir: str):
    """Silence detection over the audio corpus: per track, the number
    of quiet samples (|s| < 8192) and the LONGEST quiet run — the
    gaps-and-islands scan on the sample axis. The whole batch's runs
    resolve in one diff pass over the row-padded flat mask (a False
    column between tracks breaks runs), maxima via np.maximum.at —
    no per-track loop. Oracle: python-int replay sidecar."""
    from geotile.ops.audio import read_audio_table

    ds = read_audio_table(_audio_dir_for(sf_dir))

    def runs(t: pa.Table) -> pa.Table:
        ids = t["track_id"].to_numpy(zero_copy_only=False)
        payloads = t["bytes"].to_pylist()
        pcm = np.stack([np.frombuffer(p, dtype=np.int16)
                        for p in payloads])
        quiet = np.abs(pcm.astype(np.int32)) < 8192
        n_quiet = quiet.sum(axis=1).astype(np.int64)
        padded = np.concatenate(
            [quiet, np.zeros((len(ids), 1), bool)], axis=1).ravel()
        d = np.diff(np.r_[np.int8(0), padded.view(np.int8)])
        starts = np.flatnonzero(d == 1)
        ends = np.flatnonzero(d == -1)
        lengths = (ends - starts).astype(np.int64)
        row = starts // (quiet.shape[1] + 1)
        max_run = np.zeros(len(ids), np.int64)
        np.maximum.at(max_run, row, lengths)
        return pa.table({"track_id": pa.array(ids),
                         "n_quiet": pa.array(n_quiet),
                         "max_run": pa.array(max_run)})

    return ds.map_batches(runs, batch_format="pyarrow", batch_size=64)


QUERIES["audio_silence_runs"] = q_audio_silence_runs


def _audio_silence_sidecar(aud: str) -> str:
    """Python-loop replay for audio_silence_runs (per-sample scan with
    plain ints vs the engine's flat diff kernel). Content-keyed on
    synth.py."""
    import geotile.synth as _sy
    import pyarrow.parquet as pq
    from pathlib import Path

    p = _oracle_cache_dir() / (
        f"oracle_audiosilence_{Path(aud).name}_{_mods_digest(_sy)}.parquet"
    )
    if not p.exists():
        t = pq.read_table(aud, columns=["track_id"])
        ids = np.sort(t["track_id"].to_numpy(zero_copy_only=False))
        pcm = _sy.audio_samples(ids)
        nq, mr = [], []
        for j in range(len(ids)):
            cnt = best = cur = 0
            for v in pcm[j].tolist():
                if abs(v) < 8192:
                    cnt += 1
                    cur += 1
                    best = max(best, cur)
                else:
                    cur = 0
            nq.append(cnt)
            mr.append(best)
        out = pa.table({"track_id": pa.array(ids),
                        "n_quiet": pa.array(nq, pa.int64()),
                        "max_run": pa.array(mr, pa.int64())})
        _oracle_cache_dir().mkdir(parents=True, exist_ok=True)
        _atomic_write_table(out, p)
    return str(p)


def _audio_silence_sql(aud: str) -> str:
    return (f"SELECT track_id, n_quiet, max_run "
            f"FROM read_parquet('{_audio_silence_sidecar(aud)}')")


def _ntile_of(idx: np.ndarray, n: int, k: int) -> np.ndarray:
    """SQL NTILE(k) bucket (1-based) from a 0-based global rank:
    the first n % k buckets hold n//k + 1 rows (standard remainder-
    to-the-front semantics), computed branch-free."""
    r = idx  # 0-based rank
    q, rem = divmod(n, k)
    cut = rem * (q + 1)
    small = np.where(q > 0, (r - cut) // max(q, 1) + rem, 0)
    return np.where(r < cut, r // (q + 1), small).astype(np.int64) + 1


def q_decile_transition_users(sf_dir: str):
    """Rank-mobility matrix: each user's spend QUINTILE in the first
    half of January vs the second — the churn-analysis transition
    table two independent distributed rankings feed. Spend partials
    pack (user, half); each half ranks via
    relational.global_row_number (order-aligned coarse buckets, no
    all-to-all sort) and converts rank→NTILE(5) with the exact
    remainder-to-the-front rule; the halves then meet in ONE
    user-cardinality groupby of nibble-packed codes (q1 + q2·8 —
    no join), and the 5×5 matrix falls out of code-cardinality
    partials."""
    from geotile.ops.relational import global_row_number

    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def spend(t: pa.Table) -> pa.Table:
        day = pc.divide(t["ts"].cast(pa.int64()),
                        pa.scalar(86_400_000_000, pa.int64()))
        half = pc.greater_equal(day, pa.scalar(19738, pa.int64()))
        cents = pc.floor(pc.multiply(t["value"],
                                     pa.scalar(100.0))).cast(pa.int64())
        k = pc.add(pc.multiply(t["user_id"], pa.scalar(2, pa.int64())),
                   half.cast(pa.int64()))
        g = pa.table({"k": k, "cents": cents}).group_by("k") \
            .aggregate([("cents", "sum")])
        return pa.table({"k": g["k"], "spend": g["cents_sum"]})

    sp = (ev.map_batches(spend, batch_format="pyarrow")
          .groupby("k").sum("spend"))

    def unpack(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy()
        return pa.table({"user_id": pa.array(k >> 1),
                         "half": pa.array((k & 1).astype(np.int64)),
                         "spend": t["sum(spend)"]})

    sp = sp.map_batches(unpack, batch_format="pyarrow").materialize()

    codes = []
    for h, mul in ((0, 1), (1, 8)):
        part = sp.filter(lambda r, _h=h: r["half"] == _h).materialize()
        n_h = part.count()
        ranked = global_row_number(part, "spend", "user_id", shift=12)
        codes.append(ranked.map_batches(
            lambda t, _n=n_h, _m=mul: pa.table({
                "user_id": t["user_id"],
                "code": pa.array(_ntile_of(t["idx"].to_numpy(), _n, 5)
                                 * _m)}),
            batch_format="pyarrow"))

    both = (codes[0].union(codes[1])
            .groupby("user_id").sum("code"))

    def matrix(t: pa.Table) -> pa.Table:
        c = t["sum(code)"].to_numpy()
        q1, q2 = c % 8, c // 8
        keep = (q1 > 0) & (q2 > 0)
        g = pa.table({"q1": pa.array(q1[keep]),
                      "q2": pa.array(q2[keep])}) \
            .group_by(["q1", "q2"]).aggregate([([], "count_all")])
        return pa.table({"q1": g["q1"], "q2": g["q2"],
                         "n_users": g["count_all"].cast(pa.int64())})

    out = (both.map_batches(matrix, batch_format="pyarrow")
           .groupby(["q1", "q2"]).sum("n_users"))
    return _rename(out, ["q1", "q2", "n_users"])


QUERIES["decile_transition_users"] = q_decile_transition_users
ORACLE_SQL["decile_transition_users"] = """
        WITH s AS (SELECT user_id,
                          CAST(epoch_us(ts) // 86400000000 >= 19738
                               AS INT) AS half,
                          CAST(floor(value * 100.0) AS BIGINT) AS cents
                   FROM events),
        sp AS (SELECT user_id, half, SUM(cents) AS spend
               FROM s GROUP BY 1, 2),
        h1 AS (SELECT user_id, NTILE(5) OVER (ORDER BY spend, user_id)
                   AS q1 FROM sp WHERE half = 0),
        h2 AS (SELECT user_id, NTILE(5) OVER (ORDER BY spend, user_id)
                   AS q2 FROM sp WHERE half = 1)
        SELECT CAST(q1 AS BIGINT) AS q1, CAST(q2 AS BIGINT) AS q2,
               count(*) AS n_users
        FROM h1 JOIN h2 USING (user_id) GROUP BY 1, 2
    """


def q_revenue_concentration_orders(sf_dir: str):
    """Lorenz-point concentration: what share of order revenue sits in
    the top 1% of orders — WITHOUT ranking a single row. Equal prices
    contribute equally to a SUM, so the top-k sum is pure count
    algebra over the cents-value histogram (value-domain-bounded
    partials): sort the histogram driver-side, take whole buckets
    from the top, and pro-rate the one boundary bucket by count. One
    scan, no co-partition, exact integers end-to-end."""
    orders = _read(sf_dir, "orders", ["o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.floor(pc.add(pc.multiply(
            t["o_totalprice"], pa.scalar(100.0)),
            pa.scalar(0.5))).cast(pa.int64())
        g = pa.table({"cents": cents}).group_by("cents") \
            .aggregate([([], "count_all")])
        return pa.table({"cents": g["cents"],
                         "n": g["count_all"].cast(pa.int64())})

    hist = (orders.map_batches(partial, batch_format="pyarrow")
            .groupby("cents").sum("n")).take_all()
    cents = np.array([r["cents"] for r in hist], dtype=np.int64)
    cnt = np.array([r["sum(n)"] for r in hist], dtype=np.int64)
    o = np.argsort(-cents)
    cents, cnt = cents[o], cnt[o]
    n = int(cnt.sum())
    k = max(1, n // 100)
    cum = np.cumsum(cnt)
    j = int(np.searchsorted(cum, k))  # boundary bucket index
    whole = int((cents[:j] * cnt[:j]).sum())
    used = int(cum[j - 1]) if j else 0
    top = whole + (k - used) * int(cents[j])
    total = int((cents * cnt).sum())
    return pd.DataFrame({
        "n_orders": [n], "top_k": [k], "top_cents": [top],
        "total_cents": [total],
        "share_ppm": [top * 1_000_000 // total]})


QUERIES["revenue_concentration_orders"] = q_revenue_concentration_orders
ORACLE_SQL["revenue_concentration_orders"] = """
        WITH r AS (SELECT CAST(floor(o_totalprice * 100.0 + 0.5)
                               AS BIGINT) AS cents,
                          ROW_NUMBER() OVER (ORDER BY
                              floor(o_totalprice * 100.0 + 0.5) DESC)
                              AS rn,
                          count(*) OVER () AS n
                   FROM orders),
        t AS (SELECT max(n) AS n,
                     greatest(1, max(n) // 100) AS k,
                     SUM(cents) AS tot,
                     SUM(CASE WHEN rn <= greatest(1, n // 100)
                              THEN cents ELSE 0 END) AS top
              FROM r)
        SELECT CAST(n AS BIGINT) AS n_orders, CAST(k AS BIGINT) AS top_k,
               CAST(top AS BIGINT) AS top_cents,
               CAST(tot AS BIGINT) AS total_cents,
               top * 1000000 // tot AS share_ppm
        FROM t
    """


def q_partitioned_sink_events(sf_dir: str):
    """Resumable-output round trip: stream events into a
    day-partitioned parquet layout (ray write_parquet with
    partition_cols — one directory per day, the skip/retry unit at
    100 TB) and verify by reading the LAYOUT back: per-partition row
    counts come from the hive-partitioned re-read, not from the
    writer's accounting, so a lost or truncated partition shows up as
    a count mismatch against the source-side oracle."""
    import shutil
    from pathlib import Path

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id"])

    def with_day(t: pa.Table) -> pa.Table:
        return t.append_column(
            "day", pc.divide(t["ts"].cast(pa.int64()),
                             pa.scalar(86_400_000_000, pa.int64())))

    out = Path("/tmp/geotile_cache") / f"sink_events_{Path(sf_dir).name}"
    if out.exists():
        shutil.rmtree(out)
    ev.map_batches(with_day, batch_format="pyarrow") \
        .drop_columns(["ts"]) \
        .write_parquet(str(out), partition_cols=["day"])

    back = rd.read_parquet(str(out))

    def counts(t: pa.Table) -> pa.Table:
        g = t.select(["day"]).group_by("day").aggregate(
            [([], "count_all")])
        return pa.table({"day": g["day"].cast(pa.int64()),
                         "n_rows": g["count_all"].cast(pa.int64())})

    return (back.map_batches(counts, batch_format="pyarrow")
            .groupby("day").sum("n_rows")
            .map_batches(lambda t: t.rename_columns(["day", "n_rows"]),
                         batch_format="pyarrow"))


QUERIES["partitioned_sink_events"] = q_partitioned_sink_events
ORACLE_SQL["partitioned_sink_events"] = """
        SELECT epoch_us(ts) // 86400000000 AS day,
               count(*) AS n_rows
        FROM events GROUP BY 1
    """


def q_spatial_autocorr_cells(sf_dir: str):
    """Spatial-autocorrelation raw parts over the occupied res-10
    grid (the Moran/Geary building blocks, exact integers): per-cell
    tile counts c_i, plus Σ c_i·c_j and the pair count over all
    8-neighbor ordered pairs of OCCUPIED cells. The neighbor 'join'
    is count algebra: each occupied cell scatters (mass=c, occ=1) to
    its ≤8 in-range neighbor keys, one cell-cardinality groupby merges
    scatter with counts (union + sum — no join operator), and the
    cross terms reduce to a single row. Nothing ever shuffles at tile
    scale, only at occupied-cell scale."""
    from geotile.geom import cells
    from geotile.ops.tiles import read_image_table

    img = _image_dir_for(sf_dir)
    ds = read_image_table(img, columns=["lon", "lat"])
    RES = 10

    def partial(t: pa.Table) -> pa.Table:
        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        ix, iy = cells.to_ixy(cells.encode(lon, lat, RES))
        k = (ix << 20) | iy
        g = pa.table({"k": pa.array(k)}).group_by("k") \
            .aggregate([([], "count_all")])
        return pa.table({"k": g["k"],
                         "c": g["count_all"].cast(pa.int64())})

    counts = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("k").sum("c")).materialize()
    counts = _rename(counts, ["k", "c"])

    def scatter(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy()
        c = t["c"].to_numpy()
        ix, iy = k >> 20, k & ((1 << 20) - 1)
        ks, ms, os_ = [], [], []
        n = 1 << RES
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                jx, jy = ix + dx, iy + dy
                ok = (jx >= 0) & (jx < n) & (jy >= 0) & (jy < n)
                ks.append((jx[ok] << 20) | jy[ok])
                ms.append(c[ok])
                os_.append(np.ones(int(ok.sum()), np.int64))
        return pa.table({"k": pa.array(np.concatenate(ks)),
                         "c": pa.array(np.zeros(sum(map(len, ks)),
                                                np.int64)),
                         "mass": pa.array(np.concatenate(ms)),
                         "occ": pa.array(np.concatenate(os_))})

    tagged = counts.map_batches(
        lambda t: pa.table({"k": t["k"], "c": t["c"],
                            "mass": pa.array(np.zeros(len(t), np.int64)),
                            "occ": pa.array(np.zeros(len(t), np.int64))}),
        batch_format="pyarrow")
    merged = (tagged.union(counts.map_batches(scatter,
                                              batch_format="pyarrow"))
              .groupby("k").sum(["c", "mass", "occ"]))

    def reduce_row(t: pa.Table) -> pa.Table:
        c = t["sum(c)"].to_numpy()
        mass = t["sum(mass)"].to_numpy()
        occ = t["sum(occ)"].to_numpy()
        occu = c > 0
        return pa.table({
            "n_cells": pa.array([int(occu.sum())], pa.int64()),
            "sum_c": pa.array([int(c.sum())], pa.int64()),
            "ssq_c": pa.array([int((c * c).sum())], pa.int64()),
            "w_pairs": pa.array([int(occ[occu].sum())], pa.int64()),
            "cross_sum": pa.array([int((c[occu] * mass[occu]).sum())],
                                  pa.int64())})

    return (merged.map_batches(reduce_row, batch_format="pyarrow")
            .groupby(None)
            .sum(["n_cells", "sum_c", "ssq_c", "w_pairs", "cross_sum"])
            .map_batches(lambda t: t.rename_columns(
                ["n_cells", "sum_c", "ssq_c", "w_pairs", "cross_sum"]),
                batch_format="pyarrow"))


QUERIES["tile_autocorr_cells"] = q_spatial_autocorr_cells


def _spatial_autocorr_sql(img_dir: str) -> str:
    qx = _sql_quant("lon", "180.0", "360.0", 10)
    qy = _sql_quant("lat", "90.0", "180.0", 10)
    return f"""
        WITH pts AS (SELECT {qx} AS ix, {qy} AS iy
                     FROM read_parquet('{img_dir}/part-*.parquet')),
        c AS (SELECT ix, iy, count(*) AS c FROM pts GROUP BY 1, 2),
        pair AS (SELECT a.c AS ca, b.c AS cb
                 FROM c a JOIN c b
                   ON abs(a.ix - b.ix) <= 1 AND abs(a.iy - b.iy) <= 1
                  AND NOT (a.ix = b.ix AND a.iy = b.iy))
        SELECT (SELECT count(*) FROM c) AS n_cells,
               (SELECT CAST(SUM(c) AS BIGINT) FROM c) AS sum_c,
               (SELECT CAST(SUM(c * c) AS BIGINT) FROM c) AS ssq_c,
               (SELECT count(*) FROM pair) AS w_pairs,
               (SELECT CAST(COALESCE(SUM(ca * cb), 0) AS BIGINT)
                FROM pair) AS cross_sum
    """


def q_funnel_windowed_users(sf_dir: str):
    """Windowed event-to-event join: per purchase, views by the same
    user in the trailing 24 h — the attribution-window count a plain
    funnel can't express. One co-partition on user; inside a bucket
    BOTH sides pack to local_user·SPAN + (ts − t₀) (SPAN covers the
    time domain + window, overflow-asserted), so every purchase's
    window count is two global searchsorteds over the packed view
    array — no per-user loop, no row-pair materialization."""
    from geotile.ops.relational import _with_bucket

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id",
                                  "event_type"])
    W = 86_400_000_000  # 24 h in µs

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"user_id": pd.Series(dtype=np.int64),
                              "n_purchases": pd.Series(dtype=np.int64),
                              "n_converted": pd.Series(dtype=np.int64),
                              "n_view_hits": pd.Series(dtype=np.int64)})
        p = df[df["event_type"] == "purchase"]
        v = df[df["event_type"] == "view"]
        if len(p) == 0:
            return empty
        pu = p["user_id"].to_numpy(np.int64)
        pt = p["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        vu = v["user_id"].to_numpy(np.int64)
        vt = v["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        users = np.unique(np.r_[pu, vu])
        lu_p = np.searchsorted(users, pu)
        lu_v = np.searchsorted(users, vu)
        t0 = int(min(pt.min(), vt.min() if len(vt) else pt.min()))
        span = np.int64(max(pt.max(), vt.max() if len(vt) else 0)
                        - t0 + W + 2)
        assert len(users) * span < (1 << 62), "pack overflow"
        packed_v = np.sort(lu_v * span + (vt - t0))
        base = lu_p * span
        hi = np.searchsorted(packed_v, base + (pt - t0))
        lo = np.searchsorted(packed_v,
                             np.maximum(base + (pt - t0) - W, base))
        hits = (hi - lo).astype(np.int64)
        g = pd.DataFrame({"user_id": pu, "hits": hits,
                          "conv": (hits > 0).astype(np.int64)}) \
            .groupby("user_id", as_index=False) \
            .agg(n_purchases=("hits", "size"),
                 n_converted=("conv", "sum"),
                 n_view_hits=("hits", "sum"))
        return g

    return (_with_bucket(ev, "user_id", 32)
            .groupby("bucket").map_groups(per_bucket,
                                          batch_format="pandas"))


QUERIES["funnel_windowed_users"] = q_funnel_windowed_users
ORACLE_SQL["funnel_windowed_users"] = """
        WITH p AS (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'purchase'),
        v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
        j AS (SELECT p.user_id, p.event_id, count(v.ts) AS hits
              FROM p LEFT JOIN v
                ON v.user_id = p.user_id AND v.ts < p.ts
               AND v.ts >= p.ts - INTERVAL 24 HOUR
              GROUP BY 1, 2)
        SELECT user_id, count(*) AS n_purchases,
               CAST(count(*) FILTER (hits > 0) AS BIGINT) AS n_converted,
               CAST(SUM(hits) AS BIGINT) AS n_view_hits
        FROM j GROUP BY 1
    """


def q_bounce_rate_daily(sf_dir: str):
    """Per-day session bounce rate inputs: sessions STARTING each day
    and how many were single-event bounces — the engagement KPI over
    the sessionized stream. relational.session_intervals does the one
    co-partition; per-day partials are calendar-bounded."""
    from geotile.ops.relational import session_intervals

    iv = session_intervals(_read(sf_dir, "events", ["user_id", "ts"]))

    def partial(t: pa.Table) -> pa.Table:
        day = pc.divide(t["a_us"], pa.scalar(86_400_000_000, pa.int64()))
        bounce = pc.equal(t["n_rows"], pa.scalar(1)).cast(pa.int64())
        g = pa.table({"day": day, "b": bounce}).group_by("day") \
            .aggregate([([], "count_all"), ("b", "sum")])
        return pa.table({"day": g["day"],
                         "n_sessions": g["count_all"].cast(pa.int64()),
                         "n_bounce": g["b_sum"]})

    out = (iv.map_batches(partial, batch_format="pyarrow")
           .groupby("day").sum(["n_sessions", "n_bounce"]))
    return _rename(out, ["day", "n_sessions", "n_bounce"])


QUERIES["bounce_rate_daily"] = q_bounce_rate_daily
ORACLE_SQL["bounce_rate_daily"] = """
        WITH s AS (SELECT user_id, epoch_us(ts) AS us,
                          CASE WHEN lag(ts) OVER w IS NULL
                                    OR ts - lag(ts) OVER w
                                       > INTERVAL 30 MINUTE
                               THEN 1 ELSE 0 END AS is_new
                   FROM events
                   WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        s2 AS (SELECT user_id, us,
                      SUM(is_new) OVER (PARTITION BY user_id ORDER BY us
                                        ROWS UNBOUNDED PRECEDING) AS sid
               FROM s),
        iv AS (SELECT user_id, sid, min(us) AS a, count(*) AS n_ev
               FROM s2 GROUP BY 1, 2)
        SELECT CAST(a // 86400000000 AS BIGINT) AS day,
               count(*) AS n_sessions,
               CAST(count(*) FILTER (n_ev = 1) AS BIGINT) AS n_bounce
        FROM iv GROUP BY 1
    """


def q_adjacent_vector_dots(sf_dir: str):
    """Windowed vector algebra with HALO exchange: for every adjacent
    id pair (v, v+1), the exact trunc-e4 lattice dot product and both
    squared norms — the LAG-over-a-vector-column op. Vectors
    co-partition by vec_id>>6 (64 per group) and each group-boundary
    vector is DUPLICATED into the previous bucket (ghost cell), so
    every pair is complete in exactly one group — the owner guard
    (a>>6 == bucket) makes the halo copy emit nothing of its own.
    All arithmetic is int64 on the trunc lattice; the UNNEST-zip SQL
    replay computes the same sums positionally."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def with_halo(t: pa.Table) -> pa.Table:
        vid = t["vec_id"].to_numpy()
        b = vid >> 6
        halo = (vid % 64 == 0) & (vid > 0)
        out = pa.table({
            "bucket": pa.array(np.r_[b, b[halo] - 1]),
            "vec_id": pa.array(np.r_[vid, vid[halo]]),
            "embedding": pa.concat_arrays(
                [t["embedding"].combine_chunks(),
                 t["embedding"].combine_chunks().take(
                     pa.array(np.nonzero(halo)[0]))]),
        })
        return out

    def dots(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"vec_id": pd.Series(dtype=np.int64),
                              "dot_e8": pd.Series(dtype=np.int64),
                              "norm_a_e8": pd.Series(dtype=np.int64),
                              "norm_b_e8": pd.Series(dtype=np.int64)})
        if len(df) < 2:
            return empty
        bucket = int(df["bucket"].iloc[0])
        vid = df["vec_id"].to_numpy(np.int64)
        o = np.argsort(vid, kind="stable")
        vid = vid[o]
        q = np.trunc(np.stack(df["embedding"].to_numpy()[o])
                     .astype(np.float64) * 10000.0).astype(np.int64)
        adj = (np.diff(vid) == 1) & ((vid[:-1] >> 6) == bucket)
        a = np.nonzero(adj)[0]
        if len(a) == 0:
            return empty
        qa, qb = q[a], q[a + 1]
        return pd.DataFrame({
            "vec_id": vid[a],
            "dot_e8": (qa * qb).sum(axis=1),
            "norm_a_e8": (qa * qa).sum(axis=1),
            "norm_b_e8": (qb * qb).sum(axis=1)})

    return (ds.map_batches(with_halo, batch_format="pyarrow")
            .groupby("bucket").map_groups(dots, batch_format="pandas"))


QUERIES["adjacent_vector_dots"] = q_adjacent_vector_dots
ORACLE_SQL["adjacent_vector_dots"] = """
        WITH u AS (SELECT vec_id,
                          unnest(range(len(embedding))) AS i,
                          CAST(trunc(CAST(unnest(embedding) AS DOUBLE)
                                     * 10000) AS BIGINT) AS q
                   FROM embeddings)
        SELECT a.vec_id AS vec_id,
               CAST(SUM(a.q * b.q) AS BIGINT) AS dot_e8,
               CAST(SUM(a.q * a.q) AS BIGINT) AS norm_a_e8,
               CAST(SUM(b.q * b.q) AS BIGINT) AS norm_b_e8
        FROM u a JOIN u b ON b.vec_id = a.vec_id + 1 AND b.i = a.i
        GROUP BY 1
    """


def q_watermark_late_events(sf_dir: str):
    """Streaming watermark accounting: replay the stream in a
    deterministic out-of-order ARRIVAL permutation (hash of event_id —
    the same derived-shuffle idiom as train_split) and count, per
    event-time day, the events that arrive later than watermark−1h —
    the lateness audit a streaming sink needs. The running max is a
    DISTRIBUTED PREFIX-MAX: order-aligned arrival buckets, one
    per-bucket max partial + a driver exclusive scan (≤4096 rows),
    then each bucket resolves its own rows with one
    maximum.accumulate seeded by its broadcast base."""
    ev = _read(sf_dir, "events", ["event_id", "ts"])
    SHIFT = 20  # arrival domain is 2^32 → ≤4096 fine buckets

    def arrival_of(vid: np.ndarray) -> np.ndarray:
        return ((vid.astype(np.uint64) * np.uint64(2654435761))
                % np.uint64(4294967296)).astype(np.int64)

    def pass_a(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64())
        b = arrival_of(t["event_id"].to_numpy()) >> SHIFT
        g = pa.table({"b": pa.array(b), "us": us}).group_by("b") \
            .aggregate([("us", "max")])
        return pa.table({"b": g["b"], "mx": g["us_max"]})

    rows = (ev.map_batches(pass_a, batch_format="pyarrow")
            .groupby("b").max("mx")).take_all()
    rows.sort(key=lambda r: r["b"])
    # coarsen to ≤256 groups: map_groups pays a per-GROUP machinery
    # cost (the multi-key-groupby law — 4096 groups measured 16.4 s on
    # a 10k-row pass, 256 run it in ~2 s); shift-aligned merging keeps
    # the order alignment, maxima merge by max
    extra = 0
    while len({r["b"] >> extra for r in rows}) > 256:
        extra += 1
    eff = SHIFT + extra
    merged: dict[int, int] = {}
    for r in rows:
        k = r["b"] >> extra
        merged[k] = max(merged.get(k, -(1 << 62)), r["max(mx)"])
    bks = np.array(sorted(merged), dtype=np.int64)
    mxs = np.array([merged[k] for k in bks], dtype=np.int64)
    bases = np.r_[np.int64(-(1 << 62)),
                  np.maximum.accumulate(mxs)[:-1]]
    base_ref = ray.put((bks, bases))

    def with_bucket(t: pa.Table) -> pa.Table:
        a = arrival_of(t["event_id"].to_numpy())
        return pa.table({"event_id": t["event_id"],
                         "us": t["ts"].cast(pa.int64()),
                         "arrival": pa.array(a),
                         "bucket": pa.array(a >> eff)})

    def late(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"day": pd.Series(dtype=np.int64),
                                 "n_events": pd.Series(dtype=np.int64),
                                 "n_late": pd.Series(dtype=np.int64)})
        bks_, bases_ = _broadcast(base_ref)
        a = df["arrival"].to_numpy(np.int64)
        e = df["event_id"].to_numpy(np.int64)
        us = df["us"].to_numpy(np.int64)
        o = np.lexsort((e, a))
        us = us[o]
        base = bases_[np.searchsorted(bks_, a[o[0]] >> eff)]
        wm = np.maximum.accumulate(np.r_[base, us[:-1]])
        seen_any = np.r_[base > -(1 << 61),
                         np.ones(len(us) - 1, bool)]
        is_late = seen_any & (us < wm - 3_600_000_000)
        g = pd.DataFrame({"day": us // 86_400_000_000,
                          "late": is_late.astype(np.int64)}) \
            .groupby("day", as_index=False) \
            .agg(n_events=("late", "size"), n_late=("late", "sum"))
        return g

    out = (ev.map_batches(with_bucket, batch_format="pyarrow")
           .groupby("bucket").map_groups(late, batch_format="pandas")
           .groupby("day").sum(["n_events", "n_late"]))
    return _rename(out, ["day", "n_events", "n_late"])


QUERIES["watermark_late_events"] = q_watermark_late_events
ORACLE_SQL["watermark_late_events"] = """
        WITH w AS (SELECT epoch_us(ts) AS us,
                          MAX(epoch_us(ts)) OVER (
                              ORDER BY (event_id * 2654435761
                                        % 4294967296), event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS wm
                   FROM events)
        SELECT CAST(us // 86400000000 AS BIGINT) AS day,
               count(*) AS n_events,
               CAST(count(*) FILTER (wm IS NOT NULL
                    AND us < wm - 3600000000) AS BIGINT) AS n_late
        FROM w GROUP BY 1
    """


def q_keyspace_gaps_orders(sf_dir: str):
    """Key-space integrity audit over the F-status order ids: gap
    count, missing-key total and largest hole between consecutive
    present keys — the LEAD-diff island scan, distributed with NO
    sort: keys co-partition into order-aligned id-range buckets
    (driver-coarsened to ≤2048), each bucket resolves its interior
    gaps in one sorted-diff pass, and the driver stitches the ≤2048
    inter-bucket seams from per-bucket (min, max). The final answer
    is one row; keys never leave their bucket."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])
    keys = orders.map_batches(
        lambda t: t.filter(pc.equal(t["o_orderstatus"],
                                    pa.scalar("F")))
        .select(["o_orderkey"]), batch_format="pyarrow")

    def pass_a(t: pa.Table) -> pa.Table:
        b = pc.shift_right(t["o_orderkey"], pa.scalar(12, pa.int64()))
        g = pa.table({"b": b}).group_by("b").aggregate(
            [([], "count_all")])
        return pa.table({"b": g["b"], "n": g["count_all"]})

    fine = (keys.map_batches(pass_a, batch_format="pyarrow")
            .groupby("b").sum("n")).take_all()
    extra = 0
    while len({r["b"] >> extra for r in fine}) > 2048:
        extra += 1
    eff = 12 + extra

    def with_bucket(t: pa.Table) -> pa.Table:
        return pa.table({"k": t["o_orderkey"],
                         "bucket": pc.shift_right(
                             t["o_orderkey"],
                             pa.scalar(eff, pa.int64()))})

    def in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        k = np.sort(df["k"].to_numpy(np.int64))
        d = np.diff(k) - 1
        g = d[d > 0]
        return pd.DataFrame({
            "bucket": [np.int64(df["bucket"].iloc[0])],
            "n_keys": [len(k)], "n_gaps": [len(g)],
            "missing": [int(g.sum())],
            "max_gap": [int(g.max()) if len(g) else 0],
            "kmin": [int(k[0])], "kmax": [int(k[-1])]})

    per_bucket = (keys.map_batches(with_bucket, batch_format="pyarrow")
                  .groupby("bucket")
                  .map_groups(in_bucket, batch_format="pandas")
                  ).take_all()
    per_bucket.sort(key=lambda r: r["bucket"])
    n_keys = sum(r["n_keys"] for r in per_bucket)
    n_gaps = sum(r["n_gaps"] for r in per_bucket)
    missing = sum(r["missing"] for r in per_bucket)
    max_gap = max((r["max_gap"] for r in per_bucket), default=0)
    for prev, cur in zip(per_bucket, per_bucket[1:]):
        seam = cur["kmin"] - prev["kmax"] - 1
        if seam > 0:
            n_gaps += 1
            missing += seam
            max_gap = max(max_gap, seam)
    return pd.DataFrame({"n_keys": [n_keys], "n_gaps": [n_gaps],
                         "missing_total": [missing],
                         "max_gap": [max_gap]})


QUERIES["keyspace_gaps_orders"] = q_keyspace_gaps_orders
ORACLE_SQL["keyspace_gaps_orders"] = """
        WITH k AS (SELECT o_orderkey AS k FROM orders
                   WHERE o_orderstatus = 'F'),
        d AS (SELECT k, LEAD(k) OVER (ORDER BY k) AS nk FROM k)
        SELECT count(*) AS n_keys,
               CAST(count(*) FILTER (nk - k > 1) AS BIGINT) AS n_gaps,
               CAST(COALESCE(SUM(nk - k - 1) FILTER (nk - k > 1), 0)
                    AS BIGINT) AS missing_total,
               CAST(COALESCE(MAX(nk - k - 1), 0) AS BIGINT) AS max_gap
        FROM d
    """


def q_tile_stop_hulls(sf_dir: str):
    """Distributed convex hull per caption stop: the hull is an
    ASSOCIATIVE aggregate (hull(A∪B) = hull(hull(A)∪hull(B))), so each
    batch emits only its ≤30 per-stop partial-hull vertices and the
    final chain runs per stop over vertex-count-scale candidates —
    the corpus's coordinates never shuffle. Companion count/bbox pass
    is a plain 30-row Arrow aggregate; both scans prune to
    (caption, lon, lat) so the payload column never leaves storage.
    Oracle: independent Jarvis-march (gift-wrapping, exact Fraction
    crosses) sidecar vs the engine's monotone chain."""
    from geotile.geom.hull import convex_hull
    from geotile.ops.tiles import read_image_table

    img = _image_dir_for(sf_dir)
    ds = read_image_table(img, columns=["caption", "lon", "lat"])

    def stats(t: pa.Table) -> pa.Table:
        stop = pc.cast(pc.list_element(
            pc.split_pattern(t["caption"], " "), 4), pa.int64())
        g = pa.table({"stop": stop, "lon": t["lon"], "lat": t["lat"]}) \
            .group_by("stop").aggregate(
                [([], "count_all"), ("lon", "min"), ("lon", "max"),
                 ("lat", "min"), ("lat", "max")])
        return g.rename_columns(["stop", "n_points", "west", "east",
                                 "south", "north"])

    box = (ds.map_batches(stats, batch_format="pyarrow")
           .groupby("stop")
           .aggregate(rd.aggregate.Sum("n_points"),
                      rd.aggregate.Min("west"), rd.aggregate.Max("east"),
                      rd.aggregate.Min("south"),
                      rd.aggregate.Max("north")))
    box = _rename(box, ["stop", "n_points", "west", "east", "south",
                        "north"]).to_pandas()

    def partial_hulls(t: pa.Table) -> pa.Table:
        stop = pc.cast(pc.list_element(
            pc.split_pattern(t["caption"], " "), 4),
            pa.int64()).to_numpy(zero_copy_only=False)
        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        ss, xs, ys = [], [], []
        for s in np.unique(stop):
            m = stop == s
            ring = convex_hull(np.c_[lon[m], lat[m]])
            pts = np.c_[lon[m], lat[m]] if ring is None else ring[:-1]
            ss.append(np.full(len(pts), s, np.int64))
            xs.append(pts[:, 0])
            ys.append(pts[:, 1])
        return pa.table({"stop": pa.array(np.concatenate(ss)),
                         "lon": pa.array(np.concatenate(xs)),
                         "lat": pa.array(np.concatenate(ys))})

    def final_hull(df: pd.DataFrame) -> pd.DataFrame:
        ring = convex_hull(np.c_[df["lon"].to_numpy(),
                                 df["lat"].to_numpy()])
        n = 0 if ring is None else len(ring) - 1
        return pd.DataFrame({"stop": [np.int64(df["stop"].iloc[0])],
                             "n_hull": [np.int64(n)]})

    hull = (ds.map_batches(partial_hulls, batch_format="pyarrow")
            .groupby("stop").map_groups(final_hull,
                                        batch_format="pandas")
            ).to_pandas()
    out = box.merge(hull, on="stop")
    out["stop"] = out["stop"].astype(np.int64)
    return out[["stop", "n_points", "n_hull", "west", "south",
                "east", "north"]]


QUERIES["tile_stop_hulls"] = q_tile_stop_hulls


def _stop_hulls_sidecar(img: str) -> str:
    """Independent replay for tile_stop_hulls: Jarvis march with exact
    Fraction cross products (vs the engine's monotone chain with
    float-fast/Fraction-fallback), per-stop, over the same synth
    coordinates. Content-keyed on synth.py."""
    import geotile.synth as _sy
    import pyarrow.parquet as pq
    from fractions import Fraction as F
    from pathlib import Path

    p = _oracle_cache_dir() / (
        f"oracle_stophulls_{Path(img).name}_{_mods_digest(_sy)}.parquet"
    )
    if not p.exists():
        t = pq.read_table(img, columns=["caption", "lon", "lat"])
        stop = np.array([int(c.split(" ")[4])
                         for c in t["caption"].to_pylist()], np.int64)
        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)

        def jarvis(pts: list[tuple[float, float]]) -> int:
            pts = sorted(set(pts))
            if len(pts) < 3:
                return 0
            start = min(pts, key=lambda q: (q[1], q[0]))
            hull, cur = [], start
            while True:
                hull.append(cur)
                cand = pts[0] if pts[0] != cur else pts[1]
                for q in pts:
                    if q == cur:
                        continue
                    cr = ((F(cand[0]) - F(cur[0]))
                          * (F(q[1]) - F(cur[1]))
                          - (F(cand[1]) - F(cur[1]))
                          * (F(q[0]) - F(cur[0])))
                    if cr < 0:
                        cand = q
                    elif cr == 0:
                        # collinear: keep the farthest (strict hull)
                        d_c = ((F(cand[0]) - F(cur[0])) ** 2
                               + (F(cand[1]) - F(cur[1])) ** 2)
                        d_q = ((F(q[0]) - F(cur[0])) ** 2
                               + (F(q[1]) - F(cur[1])) ** 2)
                        if d_q > d_c:
                            cand = q
                cur = cand
                if cur == start:
                    return len(hull)

        rows = []
        for s in sorted(set(stop.tolist())):
            m = stop == s
            pts = list(zip(lon[m].tolist(), lat[m].tolist()))
            rows.append({
                "stop": s, "n_points": int(m.sum()),
                "n_hull": jarvis(pts),
                "west": float(lon[m].min()),
                "south": float(lat[m].min()),
                "east": float(lon[m].max()),
                "north": float(lat[m].max())})
        out = pa.Table.from_pylist(rows)
        _oracle_cache_dir().mkdir(parents=True, exist_ok=True)
        _atomic_write_table(out, p)
    return str(p)


def _stop_hulls_sql(img: str) -> str:
    return (f"SELECT stop, n_points, n_hull, west, south, east, north "
            f"FROM read_parquet('{_stop_hulls_sidecar(img)}')")


def q_ri_audit_edges(sf_dir: str):
    """Referential-integrity audit across three FK edges with injected
    quarantine (parents with key % 97 / % 89 == 0 withheld — the
    orphan-detection drill a lake ingestion gate runs). Each edge is
    ONE relational.anti_join: small surviving keysets broadcast, and
    the helper's co-partition fallback keeps the same plan legal when
    the parent side outgrows a broadcast at 100 TB. Output is one row
    per edge with child and orphan counts."""
    from geotile.ops.relational import anti_join

    li = _read(sf_dir, "lineitem", ["l_orderkey"])
    orders_k = _read(sf_dir, "orders", ["o_orderkey"])
    orders_c = _read(sf_dir, "orders", ["o_custkey"])
    cust_k = _read(sf_dir, "customer", ["c_custkey"])
    cust_n = _read(sf_dir, "customer", ["c_nationkey"])
    nation_k = _read(sf_dir, "nation", ["n_nationkey"])

    def quarantine(col: str, mod: int):
        def fn(t: pa.Table) -> pa.Table:
            keep = pc.not_equal(
                pc.subtract(t[col], pc.multiply(
                    pc.divide(t[col], pa.scalar(mod)),
                    pa.scalar(mod))), pa.scalar(0))
            return t.filter(keep)
        return fn

    edges = [
        ("lineitem->orders", li, "l_orderkey",
         orders_k.map_batches(quarantine("o_orderkey", 97),
                              batch_format="pyarrow"), "o_orderkey"),
        ("orders->customer", orders_c, "o_custkey",
         cust_k.map_batches(quarantine("c_custkey", 89),
                            batch_format="pyarrow"), "c_custkey"),
        ("customer->nation",
         cust_n.map_batches(lambda t: pa.table(
             {"c_nationkey": t["c_nationkey"].cast(pa.int64())}),
             batch_format="pyarrow"), "c_nationkey",
         nation_k.map_batches(lambda t: pa.table(
             {"n_nationkey": t["n_nationkey"].cast(pa.int64())}),
             batch_format="pyarrow"), "n_nationkey"),
    ]
    rows = []
    for name, child, ck, parent, pk in edges:
        n_child = child.count()
        n_orphans = anti_join(child, parent, ck, pk).count()
        rows.append({"edge": name, "n_child": n_child,
                     "n_orphans": n_orphans})
    return pd.DataFrame(rows)


QUERIES["ri_audit_edges"] = q_ri_audit_edges
ORACLE_SQL["ri_audit_edges"] = """
        SELECT 'lineitem->orders' AS edge,
               (SELECT count(*) FROM lineitem) AS n_child,
               (SELECT count(*) FROM lineitem
                WHERE l_orderkey NOT IN
                      (SELECT o_orderkey FROM orders
                       WHERE o_orderkey % 97 <> 0)) AS n_orphans
        UNION ALL
        SELECT 'orders->customer',
               (SELECT count(*) FROM orders),
               (SELECT count(*) FROM orders
                WHERE o_custkey NOT IN
                      (SELECT c_custkey FROM customer
                       WHERE c_custkey % 89 <> 0))
        UNION ALL
        SELECT 'customer->nation',
               (SELECT count(*) FROM customer),
               (SELECT count(*) FROM customer
                WHERE c_nationkey NOT IN
                      (SELECT n_nationkey FROM nation))
    """


def q_conversion_latency_users(sf_dir: str):
    """Conversion-latency histogram: days from each user's FIRST event
    to their FIRST purchase (non-converters drop out) — the activation
    curve. Two exact MIN aggregates ride one user-cardinality shuffle
    (purchase-min uses a sentinel so Arrow's min never sees a null),
    then the histogram is latency-cardinality."""
    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    SENT = np.int64(1) << 62

    def partial(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64())
        is_p = pc.equal(t["event_type"], pa.scalar("purchase"))
        pus = pc.if_else(is_p, us, pa.scalar(int(SENT), pa.int64()))
        g = pa.table({"user_id": t["user_id"], "a": us, "p": pus}) \
            .group_by("user_id").aggregate([("a", "min"), ("p", "min")])
        return g.rename_columns(["user_id", "a", "p"])

    firsts = (ev.map_batches(partial, batch_format="pyarrow")
              .groupby("user_id").min(["a", "p"]))

    def hist(t: pa.Table) -> pa.Table:
        a = t["min(a)"].to_numpy()
        p = t["min(p)"].to_numpy()
        conv = p < SENT
        lat = (p[conv] // 86_400_000_000) - (a[conv] // 86_400_000_000)
        g = pa.table({"latency_days": pa.array(lat)}) \
            .group_by("latency_days").aggregate([([], "count_all")])
        return pa.table({"latency_days": g["latency_days"],
                         "n_users": g["count_all"].cast(pa.int64())})

    out = (firsts.map_batches(hist, batch_format="pyarrow")
           .groupby("latency_days").sum("n_users"))
    return _rename(out, ["latency_days", "n_users"])


QUERIES["conversion_latency_users"] = q_conversion_latency_users
ORACLE_SQL["conversion_latency_users"] = """
        WITH f AS (SELECT user_id, min(epoch_us(ts)) AS a,
                          min(CASE WHEN event_type = 'purchase'
                                   THEN epoch_us(ts) END) AS p
                   FROM events GROUP BY 1)
        SELECT CAST(p // 86400000000 - a // 86400000000 AS BIGINT)
                   AS latency_days,
               count(*) AS n_users
        FROM f WHERE p IS NOT NULL GROUP BY 1
    """


def q_moments4_by_type(sf_dir: str):
    """Higher-moment sketch: per event type the exact power sums
    Σq⁰..Σq⁴ on the floor-dollars lattice — the mergeable parts that
    reconstruct variance, skewness and kurtosis downstream without a
    second pass. q ≤ 490 keeps q⁴ ≤ 5.8·10¹⁰, so the int64 sums are
    exact at any corpus size that fits a lake; partials are
    type-cardinality."""
    ev = _read(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        q = pc.floor(t["value"]).cast(pa.int64())
        q2 = pc.multiply(q, q)
        g = pa.table({"event_type": t["event_type"], "s1": q,
                      "s2": q2, "s3": pc.multiply(q2, q),
                      "s4": pc.multiply(q2, q2)}) \
            .group_by("event_type").aggregate(
                [([], "count_all"), ("s1", "sum"), ("s2", "sum"),
                 ("s3", "sum"), ("s4", "sum")])
        return pa.table({"event_type": g["event_type"],
                         "n": g["count_all"].cast(pa.int64()),
                         "s1": g["s1_sum"], "s2": g["s2_sum"],
                         "s3": g["s3_sum"], "s4": g["s4_sum"]})

    out = (ev.map_batches(partial, batch_format="pyarrow")
           .groupby("event_type").sum(["n", "s1", "s2", "s3", "s4"]))
    return _rename(out, ["event_type", "n", "s1", "s2", "s3", "s4"])


QUERIES["moments4_by_type"] = q_moments4_by_type
ORACLE_SQL["moments4_by_type"] = """
        WITH q AS (SELECT event_type,
                          CAST(floor(value) AS BIGINT) AS q
                   FROM events)
        SELECT event_type, count(*) AS n,
               CAST(SUM(q) AS BIGINT) AS s1,
               CAST(SUM(q * q) AS BIGINT) AS s2,
               CAST(SUM(q * q * q) AS BIGINT) AS s3,
               CAST(SUM(q * q * q * q) AS BIGINT) AS s4
        FROM q GROUP BY 1
    """


def q_bottomk_quantile_events(sf_dir: str):
    """Deterministic bottom-k quantile SKETCH with a two-phase exact
    audit: sample = the k=1024 events with the smallest hash of
    event_id (a mergeable bottom-k sketch — per-batch partial bottom-k,
    one tiny final reduce, same shape as topk_orders), median
    estimated from the sample, then ONE broadcast-scalar pass counts
    how many corpus rows sit strictly below the estimate — the
    exact-rank certificate an approximate op should ship with. Every
    step is deterministic, so the SQL replay reproduces the sketch
    itself, not just a tolerance."""
    ev = _read(sf_dir, "events", ["event_id", "value"])
    K = 1024

    def bottom(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy()
        h = ((eid.astype(np.uint64) * np.uint64(2654435761))
             % np.uint64(4294967296)).astype(np.int64)
        cents = pc.floor(pc.multiply(t["value"], pa.scalar(100.0))) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        o = np.lexsort((eid, h))[:K]
        return pa.table({"h": pa.array(h[o]),
                         "event_id": pa.array(eid[o]),
                         "cents": pa.array(cents[o])})

    sample = (ev.map_batches(bottom, batch_format="pyarrow")
              .repartition(1)
              .map_batches(lambda t: t.take(pa.array(
                  np.lexsort((t["event_id"].to_numpy(),
                              t["h"].to_numpy()))[:K])),
                  batch_format="pyarrow")).take_all()
    k = len(sample)
    cs = np.sort(np.array([r["cents"] for r in sample], dtype=np.int64))
    est = int(cs[(k - 1) // 2])

    def lt_count(t: pa.Table) -> pa.Table:
        cents = pc.floor(pc.multiply(t["value"], pa.scalar(100.0))) \
            .cast(pa.int64())
        n_lt = pc.sum(pc.less(cents, pa.scalar(est)).cast(pa.int64()))
        return pa.table({"n_lt": pa.array([n_lt.as_py() or 0],
                                          pa.int64()),
                         "n": pa.array([len(t)], pa.int64())})

    agg = ev.map_batches(lt_count, batch_format="pyarrow").to_pandas()
    n_lt, n = int(agg["n_lt"].sum()), int(agg["n"].sum())
    return pd.DataFrame({"sample_k": [k], "est_med_cents": [est],
                         "n_lt": [n_lt], "n_total": [n],
                         "rank_ppm": [n_lt * 1_000_000 // n]})


QUERIES["bottomk_quantile_events"] = q_bottomk_quantile_events
ORACLE_SQL["bottomk_quantile_events"] = """
        WITH s AS (SELECT value FROM events
                   ORDER BY (event_id * 2654435761 % 4294967296),
                            event_id
                   LIMIT 1024),
        m AS (SELECT CAST(floor(value * 100.0) AS BIGINT) AS c
              FROM s ORDER BY 1
              LIMIT 1 OFFSET (SELECT (count(*) - 1) // 2 FROM s))
        SELECT (SELECT count(*) FROM s) AS sample_k,
               (SELECT c FROM m) AS est_med_cents,
               (SELECT count(*) FROM events
                WHERE CAST(floor(value * 100.0) AS BIGINT)
                      < (SELECT c FROM m)) AS n_lt,
               (SELECT count(*) FROM events) AS n_total,
               (SELECT count(*) FROM events
                WHERE CAST(floor(value * 100.0) AS BIGINT)
                      < (SELECT c FROM m)) * 1000000
                   // (SELECT count(*) FROM events) AS rank_ppm
    """


def q_ab_conversion_parts(sf_dir: str):
    """Experimentation readout: users split into two deterministic
    variants (user_id parity), per variant the exact two-proportion
    parts — exposed users, converted users (≥1 purchase), events and
    purchases — everything a z/χ² test consumes, no float on the
    shuffle. Per-user flags ride one user-cardinality groupby; the
    variant rollup is 2 rows."""
    ev = _read(sf_dir, "events", ["user_id", "event_type"])

    def per_user(t: pa.Table) -> pa.Table:
        is_p = pc.equal(t["event_type"],
                        pa.scalar("purchase")).cast(pa.int64())
        g = pa.table({"user_id": t["user_id"], "p": is_p}) \
            .group_by("user_id").aggregate(
                [([], "count_all"), ("p", "sum")])
        return pa.table({"user_id": g["user_id"],
                         "n_events": g["count_all"].cast(pa.int64()),
                         "n_purch": g["p_sum"]})

    users = (ev.map_batches(per_user, batch_format="pyarrow")
             .groupby("user_id").sum(["n_events", "n_purch"]))

    def variants(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        npu = t["sum(n_purch)"].to_numpy()
        g = pa.table({
            "variant": pa.array((u % 2).astype(np.int64)),
            "one": pa.array(np.ones(len(u), np.int64)),
            "conv": pa.array((npu > 0).astype(np.int64)),
            "ev": t["sum(n_events)"], "pu": pa.array(npu)}) \
            .group_by("variant").aggregate(
                [("one", "sum"), ("conv", "sum"), ("ev", "sum"),
                 ("pu", "sum")])
        return pa.table({"variant": g["variant"],
                         "n_users": g["one_sum"],
                         "n_converted": g["conv_sum"],
                         "n_events": g["ev_sum"],
                         "n_purchases": g["pu_sum"]})

    out = (users.map_batches(variants, batch_format="pyarrow")
           .groupby("variant").sum(["n_users", "n_converted",
                                    "n_events", "n_purchases"]))
    return _rename(out, ["variant", "n_users", "n_converted",
                         "n_events", "n_purchases"])


QUERIES["ab_conversion_parts"] = q_ab_conversion_parts
ORACLE_SQL["ab_conversion_parts"] = """
        WITH u AS (SELECT user_id, count(*) AS n_events,
                          count(*) FILTER (event_type = 'purchase')
                              AS n_purch
                   FROM events GROUP BY 1)
        SELECT user_id % 2 AS variant, count(*) AS n_users,
               CAST(count(*) FILTER (n_purch > 0) AS BIGINT)
                   AS n_converted,
               CAST(SUM(n_events) AS BIGINT) AS n_events,
               CAST(SUM(n_purch) AS BIGINT) AS n_purchases
        FROM u GROUP BY 1
    """


def q_session_duration_quantiles(sf_dir: str):
    """Exact discrete quantiles OVER AN OPERATOR'S OUTPUT (composability
    drill): p50/p90/p99 of sessionized durations, quantized to whole
    seconds so the selection is count algebra over a bounded value
    histogram — no sort, no sample. relational.session_intervals does
    the one co-partition; the histogram partials are duration-domain
    rows; the driver scan picks index floor((n−1)·p/100) exactly as
    the SQL replay's LIMIT/OFFSET does."""
    from geotile.ops.relational import session_intervals

    iv = session_intervals(_read(sf_dir, "events", ["user_id", "ts"]))

    def partial(t: pa.Table) -> pa.Table:
        dur = pc.divide(pc.subtract(t["b_us"], t["a_us"]),
                        pa.scalar(1_000_000, pa.int64()))
        g = pa.table({"d": dur}).group_by("d").aggregate(
            [([], "count_all")])
        return pa.table({"d": g["d"],
                         "n": g["count_all"].cast(pa.int64())})

    hist = (iv.map_batches(partial, batch_format="pyarrow")
            .groupby("d").sum("n")).take_all()
    hist.sort(key=lambda r: r["d"])
    ds_ = np.array([r["d"] for r in hist], dtype=np.int64)
    ns = np.array([r["sum(n)"] for r in hist], dtype=np.int64)
    cum = np.cumsum(ns)
    n = int(cum[-1])
    rows = []
    for p in (50, 90, 99):
        idx = (n - 1) * p // 100
        rows.append({"p": p,
                     "dur_s": int(ds_[np.searchsorted(cum, idx + 1)]),
                     "n_sessions": n})
    return pd.DataFrame(rows)


QUERIES["session_duration_quantiles"] = q_session_duration_quantiles
ORACLE_SQL["session_duration_quantiles"] = """
        WITH s AS (SELECT user_id, epoch_us(ts) AS us,
                          CASE WHEN lag(ts) OVER w IS NULL
                                    OR ts - lag(ts) OVER w
                                       > INTERVAL 30 MINUTE
                               THEN 1 ELSE 0 END AS is_new
                   FROM events
                   WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        s2 AS (SELECT user_id, us,
                      SUM(is_new) OVER (PARTITION BY user_id ORDER BY us
                                        ROWS UNBOUNDED PRECEDING) AS sid
               FROM s),
        iv AS (SELECT (max(us) - min(us)) // 1000000 AS d
               FROM s2 GROUP BY user_id, sid),
        nn AS (SELECT count(*) AS n FROM iv)
        SELECT p, dur_s, n AS n_sessions FROM nn, (
            SELECT 50 AS p,
                   (SELECT d FROM iv ORDER BY d LIMIT 1 OFFSET
                    (SELECT (count(*) - 1) * 50 // 100 FROM iv)) AS dur_s
            UNION ALL
            SELECT 90,
                   (SELECT d FROM iv ORDER BY d LIMIT 1 OFFSET
                    (SELECT (count(*) - 1) * 90 // 100 FROM iv))
            UNION ALL
            SELECT 99,
                   (SELECT d FROM iv ORDER BY d LIMIT 1 OFFSET
                    (SELECT (count(*) - 1) * 99 // 100 FROM iv))) q
    """


def q_dau_overlap_daily(sf_dir: str):
    """Day-over-day active-user overlap (retention Jaccard): for each
    consecutive day pair, |A∩B|, |A|, |B| and the Jaccard in exact
    ppm. Set algebra without a self-join: distinct (user, day) pairs
    dedup once; each user's sorted day list yields its adjacent-day
    hits in one shifted compare inside a user co-partition, and the
    per-day distinct counts ride the same dedup — the day-pair table
    is calendar-bounded."""
    from geotile.ops.relational import _with_bucket

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def pairs(t: pa.Table) -> pa.Table:
        day = pc.divide(t["ts"].cast(pa.int64()),
                        pa.scalar(86_400_000_000, pa.int64()))
        k = pc.add(pc.multiply(t["user_id"],
                               pa.scalar(1 << 20, pa.int64())), day)
        return pa.table({"k": k}).group_by("k").aggregate([])

    ded = (ev.map_batches(pairs, batch_format="pyarrow")
           .groupby("k").count())

    def unpack(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy()
        return pa.table({"user_id": pa.array(k >> 20),
                         "day": pa.array(k & ((1 << 20) - 1))})

    ud = ded.map_batches(unpack, batch_format="pyarrow").materialize()

    def daily(t: pa.Table) -> pa.Table:
        g = t.select(["day"]).group_by("day").aggregate(
            [([], "count_all")])
        return pa.table({"day": g["day"],
                         "n": g["count_all"].cast(pa.int64())})

    per_day = (ud.map_batches(daily, batch_format="pyarrow")
               .groupby("day").sum("n")).take_all()
    counts = {r["day"]: r["sum(n)"] for r in per_day}

    def inter(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"day": pd.Series(dtype=np.int64),
                                 "n_inter": pd.Series(dtype=np.int64)})
        u = df["user_id"].to_numpy(np.int64)
        d = df["day"].to_numpy(np.int64)
        o = np.lexsort((d, u))
        uu, dd = u[o], d[o]
        adj = (uu[1:] == uu[:-1]) & (dd[1:] == dd[:-1] + 1)
        g = pd.DataFrame({"day": dd[:-1][adj]}) \
            .groupby("day", as_index=False).size()
        return g.rename(columns={"size": "n_inter"})

    inter_rows = (_with_bucket(ud, "user_id", 32)
                  .groupby("bucket").map_groups(inter,
                                                batch_format="pandas")
                  .groupby("day").sum("n_inter")).take_all()
    rows = []
    for r in sorted(inter_rows, key=lambda r: r["day"]):
        d = r["day"]
        i = r["sum(n_inter)"]
        a, b = counts.get(d, 0), counts.get(d + 1, 0)
        rows.append({"day": d, "n_inter": i, "n_a": a, "n_b": b,
                     "jaccard_ppm": i * 1_000_000 // (a + b - i)})
    return pd.DataFrame(rows)


QUERIES["dau_overlap_daily"] = q_dau_overlap_daily
ORACLE_SQL["dau_overlap_daily"] = """
        WITH d AS (SELECT DISTINCT user_id,
                          epoch_us(ts) // 86400000000 AS day
                   FROM events),
        c AS (SELECT day, count(*) AS n FROM d GROUP BY 1),
        i AS (SELECT a.day, count(*) AS n_inter
              FROM d a JOIN d b ON a.user_id = b.user_id
                              AND b.day = a.day + 1
              GROUP BY 1)
        SELECT CAST(i.day AS BIGINT) AS day, i.n_inter,
               ca.n AS n_a, cb.n AS n_b,
               i.n_inter * 1000000 // (ca.n + cb.n - i.n_inter)
                   AS jaccard_ppm
        FROM i JOIN c ca ON ca.day = i.day
        JOIN c cb ON cb.day = i.day + 1
    """


def q_audio_autocorr_tracks(sf_dir: str):
    """Audio periodicity features: per track the exact zero-lag energy,
    the lag-64 autocorrelation Σ s_i·s_{i+64} and the first peak
    index (argmax |s|, first-wins) — the pitch-detection front end as
    one vectorized pass per batch. All sums are int64-exact
    (2¹⁵·2¹⁵·4096 < 2⁴³); python-int replay sidecar."""
    from geotile.ops.audio import read_audio_table

    ds = read_audio_table(_audio_dir_for(sf_dir))
    LAG = 64

    def feats(t: pa.Table) -> pa.Table:
        ids = t["track_id"].to_numpy(zero_copy_only=False)
        pcm = np.stack([np.frombuffer(p, dtype=np.int16)
                        for p in t["bytes"].to_pylist()]).astype(np.int64)
        return pa.table({
            "track_id": pa.array(ids),
            "energy0": pa.array((pcm * pcm).sum(axis=1)),
            "ac_lag64": pa.array(
                (pcm[:, :-LAG] * pcm[:, LAG:]).sum(axis=1)),
            "peak_idx": pa.array(
                np.argmax(np.abs(pcm), axis=1).astype(np.int64))})

    return ds.map_batches(feats, batch_format="pyarrow", batch_size=64)


QUERIES["audio_autocorr_tracks"] = q_audio_autocorr_tracks


def _audio_autocorr_sidecar(aud: str) -> str:
    """Python-int replay for audio_autocorr_tracks. Content-keyed on
    synth.py."""
    import geotile.synth as _sy
    import pyarrow.parquet as pq
    from pathlib import Path

    p = _oracle_cache_dir() / (
        f"oracle_audioac_{Path(aud).name}_{_mods_digest(_sy)}.parquet"
    )
    if not p.exists():
        t = pq.read_table(aud, columns=["track_id"])
        ids = np.sort(t["track_id"].to_numpy(zero_copy_only=False))
        pcm = _sy.audio_samples(ids)
        rows = []
        for j, tid in enumerate(ids.tolist()):
            s = [int(v) for v in pcm[j]]
            e0 = sum(v * v for v in s)
            ac = sum(s[i] * s[i + 64] for i in range(len(s) - 64))
            best, arg = -1, 0
            for i, v in enumerate(s):
                if abs(v) > best:
                    best, arg = abs(v), i
            rows.append({"track_id": tid, "energy0": e0,
                         "ac_lag64": ac, "peak_idx": arg})
        out = pa.Table.from_pylist(rows)
        _oracle_cache_dir().mkdir(parents=True, exist_ok=True)
        _atomic_write_table(out, p)
    return str(p)


def _audio_autocorr_sql(aud: str) -> str:
    return (f"SELECT track_id, energy0, ac_lag64, peak_idx "
            f"FROM read_parquet('{_audio_autocorr_sidecar(aud)}')")


def q_zonemap_events(sf_dir: str):
    """Zone-map / partition-stats builder: per day partition the
    min/max event_id, min/max value cents and row count — the
    metadata layer a scan planner prunes with (the write-side twin of
    pushdown_orders). One pass, day-cardinality partials, five exact
    aggregates on one shuffle."""
    ev = _read(sf_dir, "events", ["event_id", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.divide(t["ts"].cast(pa.int64()),
                        pa.scalar(86_400_000_000, pa.int64()))
        cents = pc.floor(pc.multiply(t["value"],
                                     pa.scalar(100.0))).cast(pa.int64())
        g = pa.table({"day": day, "eid": t["event_id"],
                      "c": cents}).group_by("day").aggregate(
            [([], "count_all"), ("eid", "min"), ("eid", "max"),
             ("c", "min"), ("c", "max")])
        return g.rename_columns(["day", "n_rows", "min_id", "max_id",
                                 "min_cents", "max_cents"])

    out = (ev.map_batches(partial, batch_format="pyarrow")
           .groupby("day")
           .aggregate(rd.aggregate.Sum("n_rows"),
                      rd.aggregate.Min("min_id"),
                      rd.aggregate.Max("max_id"),
                      rd.aggregate.Min("min_cents"),
                      rd.aggregate.Max("max_cents")))
    return _rename(out, ["day", "n_rows", "min_id", "max_id",
                         "min_cents", "max_cents"])


QUERIES["zonemap_events"] = q_zonemap_events
ORACLE_SQL["zonemap_events"] = """
        SELECT epoch_us(ts) // 86400000000 AS day,
               count(*) AS n_rows,
               min(event_id) AS min_id, max(event_id) AS max_id,
               min(CAST(floor(value * 100.0) AS BIGINT)) AS min_cents,
               max(CAST(floor(value * 100.0) AS BIGINT)) AS max_cents
        FROM events GROUP BY 1
    """


def q_user_feature_matrix(sf_dir: str):
    """Feature-store assembly: one wide per-user feature row
    (recency/frequency/monetary/diversity/sessions) merged from THREE
    differently-shaped passes — plain aggregates, a (user,type) dedup
    pass, and the sessionizer — via the tagged-union trick: every
    pass emits the full column set with zeros elsewhere, so one
    user-cardinality groupby-sum replaces three joins."""
    from geotile.ops.relational import session_intervals

    COLS = ["n_events", "spend_cents", "first_day", "last_day",
            "n_types", "n_sessions"]

    def tagged(user, **vals):
        cols = {"user_id": user}
        n = len(user)
        for c in COLS:
            cols[c] = vals.get(c, pa.array(np.zeros(n, np.int64)))
        return pa.table(cols)

    ev = _read(sf_dir, "events", ["user_id", "ts", "value",
                                  "event_type"])

    def base_partial(t: pa.Table) -> pa.Table:
        day = pc.divide(t["ts"].cast(pa.int64()),
                        pa.scalar(86_400_000_000, pa.int64()))
        cents = pc.floor(pc.multiply(t["value"],
                                     pa.scalar(100.0))).cast(pa.int64())
        g = pa.table({"user_id": t["user_id"], "c": cents,
                      "d": day}).group_by("user_id").aggregate(
            [([], "count_all"), ("c", "sum"), ("d", "min"),
             ("d", "max")])
        return pa.table({"user_id": g["user_id"],
                         "n": g["count_all"].cast(pa.int64()),
                         "c": g["c_sum"], "dmin": g["d_min"],
                         "dmax": g["d_max"]})

    # min/max cannot ride the tagged sum-merge, so the base pass is
    # FULLY aggregated first — after that each user owns exactly one
    # base row and its day fields survive the union's sum untouched
    base_agg = (ev.map_batches(base_partial, batch_format="pyarrow")
                .groupby("user_id")
                .aggregate(rd.aggregate.Sum("n"), rd.aggregate.Sum("c"),
                           rd.aggregate.Min("dmin"),
                           rd.aggregate.Max("dmax")))
    base_tagged = _rename(base_agg, ["user_id", "n", "c", "dmin",
                                     "dmax"]).map_batches(
        lambda t: tagged(t["user_id"], n_events=t["n"],
                         spend_cents=t["c"], first_day=t["dmin"],
                         last_day=t["dmax"]),
        batch_format="pyarrow")

    tcode = pa.array(["view", "click", "purchase", "signup", "error"])

    def types_pass(t: pa.Table) -> pa.Table:
        ti = pc.index_in(t["event_type"], value_set=tcode).cast(pa.int64())
        k = pc.add(pc.multiply(t["user_id"], pa.scalar(8, pa.int64())),
                   ti)
        return pa.table({"k": k}).group_by("k").aggregate([])

    types = (_read(sf_dir, "events", ["user_id", "event_type"])
             .map_batches(types_pass, batch_format="pyarrow")
             .groupby("k").count()
             .map_batches(lambda t: tagged(
                 pa.array(t["k"].to_numpy() >> 3),
                 n_types=pa.array(np.ones(len(t), np.int64))),
                 batch_format="pyarrow"))

    sess = (session_intervals(_read(sf_dir, "events",
                                    ["user_id", "ts"]))
            .map_batches(lambda t: tagged(
                t["user_id"],
                n_sessions=pa.array(np.ones(len(t), np.int64))),
                batch_format="pyarrow"))

    merged = (base_tagged.union(types).union(sess)
              .groupby("user_id").sum(COLS))
    return _rename(merged, ["user_id"] + COLS)


QUERIES["user_feature_matrix"] = q_user_feature_matrix
ORACLE_SQL["user_feature_matrix"] = """
        WITH b AS (SELECT user_id, count(*) AS n_events,
                          SUM(CAST(floor(value * 100.0) AS BIGINT))
                              AS spend_cents,
                          min(epoch_us(ts) // 86400000000) AS first_day,
                          max(epoch_us(ts) // 86400000000) AS last_day,
                          count(DISTINCT event_type) AS n_types
                   FROM events GROUP BY 1),
        s AS (SELECT user_id, epoch_us(ts) AS us,
                     CASE WHEN lag(ts) OVER w IS NULL
                               OR ts - lag(ts) OVER w
                                  > INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS is_new
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        ns AS (SELECT user_id, SUM(is_new) AS n_sessions
               FROM s GROUP BY 1)
        SELECT b.user_id, b.n_events, b.spend_cents,
               CAST(b.first_day AS BIGINT) AS first_day,
               CAST(b.last_day AS BIGINT) AS last_day,
               CAST(b.n_types AS BIGINT) AS n_types,
               CAST(ns.n_sessions AS BIGINT) AS n_sessions
        FROM b JOIN ns USING (user_id)
    """


def q_dict_encoding_audit(sf_dir: str):
    """Storage-layout advisor: for each low-cardinality string column
    (events.event_type, documents.lang, documents.source) the exact
    dictionary-encoding ledger — rows, distinct values, raw UTF-8
    bytes vs dictionary bytes. Distinct values + their lengths ride
    per-column dedup partials; the per-column ledger is a 3-row
    epilogue."""
    specs = [("events.event_type", "events", "event_type"),
             ("documents.lang", "documents", "lang"),
             ("documents.source", "documents", "source")]
    rows = []
    for name, table, col in specs:
        ds = _read(sf_dir, table, [col])

        def partial(t: pa.Table, _c=col) -> pa.Table:
            lens = pc.binary_length(t[_c]).cast(pa.int64())
            g = pa.table({"v": t[_c], "l": lens}).group_by("v") \
                .aggregate([([], "count_all"), ("l", "sum")])
            return pa.table({"v": g["v"],
                             "n": g["count_all"].cast(pa.int64()),
                             "raw": g["l_sum"]})

        agg = (ds.map_batches(partial, batch_format="pyarrow")
               .groupby("v").sum(["n", "raw"])).take_all()
        rows.append({
            "column": name,
            "n_rows": int(sum(r["sum(n)"] for r in agg)),
            "n_distinct": len(agg),
            "raw_bytes": int(sum(r["sum(raw)"] for r in agg)),
            "dict_bytes": int(sum(len(r["v"].encode()) for r in agg))})
    return pd.DataFrame(rows)


QUERIES["dict_encoding_audit"] = q_dict_encoding_audit
ORACLE_SQL["dict_encoding_audit"] = """
        SELECT 'events.event_type' AS column,
               count(*) AS n_rows,
               count(DISTINCT event_type) AS n_distinct,
               CAST(SUM(strlen(event_type)) AS BIGINT) AS raw_bytes,
               (SELECT CAST(SUM(strlen(v)) AS BIGINT) FROM
                (SELECT DISTINCT event_type AS v FROM events))
                   AS dict_bytes
        FROM events
        UNION ALL
        SELECT 'documents.lang', count(*), count(DISTINCT lang),
               CAST(SUM(strlen(lang)) AS BIGINT),
               (SELECT CAST(SUM(strlen(v)) AS BIGINT) FROM
                (SELECT DISTINCT lang AS v FROM documents))
        FROM documents
        UNION ALL
        SELECT 'documents.source', count(*), count(DISTINCT source),
               CAST(SUM(strlen(source)) AS BIGINT),
               (SELECT CAST(SUM(strlen(v)) AS BIGINT) FROM
                (SELECT DISTINCT source AS v FROM documents))
        FROM documents
    """


def q_tile_viewport_query(sf_dir: str):
    """Viewport (slippy-map bbox) query: filter the tile corpus to a
    literal lon/lat window BEFORE anything else moves — the payload
    column never leaves storage, rows outside the viewport never
    leave the read task — then aggregate res-12 cell counts inside
    the window. The engine-side predicate mirrors the SQL replay's
    BETWEEN literals exactly."""
    from geotile.geom import cells
    from geotile.ops.tiles import read_image_table

    ds = read_image_table(_image_dir_for(sf_dir),
                          columns=["lon", "lat"])
    W, E, S, N = -122.3, -122.0, 37.3, 37.6

    def part(t: pa.Table) -> pa.Table:
        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        m = (lon >= W) & (lon <= E) & (lat >= S) & (lat <= N)
        cell = cells.encode(lon[m], lat[m], 12).view(np.int64)
        g = pa.table({"cell": pa.array(cell)}).group_by("cell") \
            .aggregate([([], "count_all")])
        return pa.table({"cell": g["cell"],
                         "n_tiles": g["count_all"].cast(pa.int64())})

    out = (ds.map_batches(part, batch_format="pyarrow")
           .groupby("cell").sum("n_tiles"))
    return _rename(out, ["cell", "n_tiles"])


QUERIES["tile_viewport_query"] = q_tile_viewport_query


def _tile_viewport_sql(img_dir: str) -> str:
    return f"""
        SELECT {_sql_cell('lon', 'lat', 12)} AS cell,
               count(*) AS n_tiles
        FROM read_parquet('{img_dir}/part-*.parquet')
        WHERE lon BETWEEN -122.3 AND -122.0
          AND lat BETWEEN 37.3 AND 37.6
        GROUP BY 1
    """


def q_silhouette_parts_labels(sf_dir: str):
    """Clustering-quality (silhouette-style) parts: per label, the
    exact per-vector distance mass to the OWN centroid vs the NEAREST
    OTHER centroid — intra/inter cohesion the evaluation loop reads.
    Same two-phase shape as centroid_confusion (train prototypes on
    the 10⁷ lattice, broadcast, one integer matmul per batch); each
    per-vector distance is floor-divided by 10³ before summation so
    the label sums stay inside int64 at any corpus size."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "label", "embedding"])

    def _mat(t: pa.Table):
        col = t["embedding"].combine_chunks()
        n = len(col)
        vals = col.values.to_numpy(zero_copy_only=False)
        d = len(vals) // n if n else 0
        q = np.trunc(vals.reshape(n, d).astype(np.float64) * 10000.0)
        return q, d

    def moments(t: pa.Table) -> pa.Table:
        q, d = _mat(t)
        if not len(q):
            return pa.table({"key": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "s_q": pa.array([], pa.int64())})
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(lab, kind="stable")
        q, lab = q[order], lab[order]
        start = np.flatnonzero(np.r_[True, lab[1:] != lab[:-1]])
        cnt = np.diff(np.r_[start, len(lab)])
        sums = np.add.reduceat(q, start, axis=0)
        ul = lab[start]
        key = (np.repeat(ul, d) * 4096 +
               np.tile(np.arange(d, dtype=np.int64), len(ul)))
        return pa.table({"key": pa.array(key),
                         "n": pa.array(np.repeat(cnt, d).astype(np.int64)),
                         "s_q": pa.array(sums.reshape(-1).astype(np.int64))})

    agg = (emb.map_batches(moments, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=65536)
           .groupby("key").sum(["n", "s_q"]).take_all())
    labels = sorted({r["key"] // 4096 for r in agg})
    lidx = {l: i for i, l in enumerate(labels)}
    dmax = max(r["key"] % 4096 for r in agg) + 1
    mu = np.zeros((len(labels), dmax), np.int64)
    for r in agg:
        s_q, n = r["sum(s_q)"], r["sum(n)"]
        assert abs(s_q) * 1000 < (1 << 53), "centroid lattice contract"
        mu[lidx[r["key"] // 4096], r["key"] % 4096] = int(
            np.floor(s_q * 1000.0 / n + 0.5))
    model_ref = ray.put((np.array(labels, np.int64), mu))

    def score(t: pa.Table) -> pa.Table:
        labs, mu_ = _broadcast(model_ref)
        q, d = _mat(t)
        if not len(q):
            return pa.table({"label": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "own_k": pa.array([], pa.int64()),
                             "other_k": pa.array([], pa.int64())})
        qq = q.astype(np.int64) * 1000
        cross = qq @ mu_.T
        dist = (qq * qq).sum(axis=1, keepdims=True) - 2 * cross \
            + (mu_ * mu_).sum(axis=1)[None, :]
        true = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        li = np.searchsorted(labs, true)
        own = dist[np.arange(len(qq)), li] // 1000
        masked = dist.copy()
        masked[np.arange(len(qq)), li] = np.iinfo(np.int64).max
        other = masked.min(axis=1) // 1000
        g = pa.table({"label": pa.array(true),
                      "own_k": pa.array(own),
                      "other_k": pa.array(other)}) \
            .group_by("label").aggregate(
                [([], "count_all"), ("own_k", "sum"),
                 ("other_k", "sum")])
        return pa.table({"label": g["label"],
                         "n": g["count_all"].cast(pa.int64()),
                         "own_k": g["own_k_sum"],
                         "other_k": g["other_k_sum"]})

    out = (emb.map_batches(score, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=65536)
           .groupby("label").sum(["n", "own_k", "other_k"]))
    return _rename(out, ["label", "n", "own_k", "other_k"])


QUERIES["silhouette_parts_labels"] = q_silhouette_parts_labels
ORACLE_SQL["silhouette_parts_labels"] = """
        WITH e AS (SELECT vec_id, label,
                          unnest(range(len(embedding))) AS dim,
                          CAST(trunc(CAST(unnest(embedding) AS DOUBLE)
                                     * 10000) AS BIGINT) AS q
                   FROM embeddings),
        c AS (SELECT label AS c_label, dim,
                     CAST(floor(SUM(q) * 1000.0 / count(*) + 0.5)
                          AS BIGINT) AS mu
              FROM e GROUP BY 1, 2),
        d AS (SELECT e.vec_id, e.label, c.c_label,
                     SUM((e.q * 1000 - c.mu) * (e.q * 1000 - c.mu))
                       AS dist2
              FROM e JOIN c ON e.dim = c.dim GROUP BY 1, 2, 3),
        v AS (SELECT vec_id, label,
                     SUM(CASE WHEN c_label = label
                              THEN dist2 // 1000 ELSE 0 END) AS own_k,
                     MIN(CASE WHEN c_label <> label
                              THEN dist2 END) // 1000 AS other_k
              FROM d GROUP BY 1, 2)
        SELECT CAST(label AS BIGINT) AS label, count(*) AS n,
               CAST(SUM(own_k) AS BIGINT) AS own_k,
               CAST(SUM(other_k) AS BIGINT) AS other_k
        FROM v GROUP BY 1
    """


def q_ivm_priority_revenue(sf_dir: str):
    """Incremental view maintenance with RETRACTIONS: the per-priority
    revenue view is updated by a delta batch (every 10th order's
    price +1111 cents as a REPLACE, every 500th key a fresh INSERT)
    without rescanning unchanged rows — the merged view is
    base ⊎ (−old versions) ⊎ (+new versions), three signed aggregate
    streams settled by ONE priority-cardinality groupby-sum. The
    oracle recomputes the post-merge table from scratch; equality IS
    the IVM correctness proof."""
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderpriority", "o_totalprice"])

    def signed(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy()
        cents = pc.floor(pc.add(pc.multiply(
            t["o_totalprice"], pa.scalar(100.0)),
            pa.scalar(0.5))).cast(pa.int64()).to_numpy(
                zero_copy_only=False)
        pri = t["o_orderpriority"].to_numpy(zero_copy_only=False)
        rep = k % 10 == 0
        ins = k % 500 == 0
        # base(+) ; retract old replaced(−) ; new replaced(+) ; inserts(+)
        pris = np.concatenate([pri, pri[rep], pri[rep], pri[ins]])
        cs = np.concatenate([cents, -cents[rep], cents[rep] + 1111,
                             cents[ins]])
        ns = np.concatenate([np.ones(len(k), np.int64),
                             -np.ones(int(rep.sum()), np.int64),
                             np.ones(int(rep.sum()), np.int64),
                             np.ones(int(ins.sum()), np.int64)])
        g = pa.table({"o_orderpriority": pa.array(pris),
                      "cents": pa.array(cs), "n": pa.array(ns)}) \
            .group_by("o_orderpriority").aggregate(
                [("cents", "sum"), ("n", "sum")])
        return pa.table({"o_orderpriority": g["o_orderpriority"],
                         "revenue_cents": g["cents_sum"],
                         "n_orders": g["n_sum"]})

    out = (orders.map_batches(signed, batch_format="pyarrow")
           .groupby("o_orderpriority").sum(["revenue_cents",
                                            "n_orders"]))
    return _rename(out, ["o_orderpriority", "revenue_cents",
                         "n_orders"])


QUERIES["ivm_priority_revenue"] = q_ivm_priority_revenue
ORACLE_SQL["ivm_priority_revenue"] = """
        WITH base AS (SELECT o_orderkey, o_orderpriority,
                             CAST(floor(o_totalprice * 100.0 + 0.5)
                                  AS BIGINT) AS cents
                      FROM orders),
        merged AS (
            SELECT o_orderpriority,
                   CASE WHEN o_orderkey % 10 = 0 THEN cents + 1111
                        ELSE cents END AS cents
            FROM base
            UNION ALL
            SELECT o_orderpriority, cents FROM base
            WHERE o_orderkey % 500 = 0)
        SELECT o_orderpriority,
               CAST(SUM(cents) AS BIGINT) AS revenue_cents,
               count(*) AS n_orders
        FROM merged GROUP BY 1
    """


def q_doc_top_tokens(sf_dir: str):
    """Per-document top-3 tokens (count desc, token asc tie-break) —
    the doc-LOCAL grouped top-k that needs NO shuffle at all: every
    document's answer is complete inside its own batch, so the
    operator is embarrassingly parallel and the output is the only
    thing that moves. One lexsort per batch ranks every doc's tokens
    at once."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def topk(t: pa.Table) -> pa.Table:
        lists = pc.split_pattern(t["text"], " ")
        flat = pc.list_flatten(lists).to_numpy(zero_copy_only=False)
        lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        doc = np.repeat(t["doc_id"].to_numpy(), lens)
        keep = flat != ""
        doc, tok = doc[keep], flat[keep]
        if len(doc) == 0:  # a batch of empty documents (edge fixture)
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "token": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64()),
                             "rk": pa.array([], pa.int64())})
        # count per (doc, token)
        order = np.lexsort((tok, doc))
        doc, tok = doc[order], tok[order]
        new = np.r_[True, (doc[1:] != doc[:-1]) | (tok[1:] != tok[:-1])]
        gdoc, gtok = doc[new], tok[new]
        cnt = np.diff(np.r_[np.flatnonzero(new), len(doc)])
        # rank within doc by (-cnt, token): stable rank via lexsort
        o2 = np.lexsort((gtok, -cnt, gdoc))
        gd = gdoc[o2]
        starts = np.r_[True, gd[1:] != gd[:-1]]
        first = np.flatnonzero(starts)
        seg = np.cumsum(starts) - 1
        rk = np.arange(len(gd)) - first[seg]
        m = rk < 3
        return pa.table({"doc_id": pa.array(gd[m]),
                         "token": pa.array(gtok[o2][m]),
                         "cnt": pa.array(cnt[o2][m].astype(np.int64)),
                         "rk": pa.array(rk[m].astype(np.int64) + 1)})

    return docs.map_batches(topk, batch_format="pyarrow")


QUERIES["doc_top_tokens"] = q_doc_top_tokens
ORACLE_SQL["doc_top_tokens"] = """
        WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                   FROM documents),
        c AS (SELECT doc_id, t, count(*) AS cnt FROM w
              WHERE t <> '' GROUP BY 1, 2),
        r AS (SELECT doc_id, t AS token, cnt,
                     ROW_NUMBER() OVER (PARTITION BY doc_id
                                        ORDER BY cnt DESC, t) AS rk
              FROM c)
        SELECT doc_id, token, cnt, rk FROM r WHERE rk <= 3
    """


def q_above_nation_avg_customers(sf_dir: str):
    """Correlated-aggregate semi-filter: per nation, how many
    customers hold an above-nation-average balance — the EXISTS/
    scalar-subquery shape. Balances floor to exact cents; the
    comparison cents·n > Σcents runs in integers, so no float mean is
    ever formed. Two passes over the customer table: nation sums
    (25-row broadcast) then the filtered count — the fact side is
    read twice but never shuffled at row scale."""
    cust = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])

    def sums(t: pa.Table) -> pa.Table:
        cents = pc.floor(pc.add(pc.multiply(
            t["c_acctbal"], pa.scalar(100.0)),
            pa.scalar(0.5))).cast(pa.int64())
        g = pa.table({"nk": t["c_nationkey"].cast(pa.int64()),
                      "c": cents}).group_by("nk").aggregate(
            [([], "count_all"), ("c", "sum")])
        return pa.table({"nk": g["nk"],
                         "n": g["count_all"].cast(pa.int64()),
                         "s": g["c_sum"]})

    rows = (cust.map_batches(sums, batch_format="pyarrow")
            .groupby("nk").sum(["n", "s"])).take_all()
    rows.sort(key=lambda r: r["nk"])
    nk = np.array([r["nk"] for r in rows], dtype=np.int64)
    nn = np.array([r["sum(n)"] for r in rows], dtype=np.int64)
    ss = np.array([r["sum(s)"] for r in rows], dtype=np.int64)
    ref = ray.put((nk, nn, ss))

    def above(t: pa.Table) -> pa.Table:
        nk_, nn_, ss_ = _broadcast(ref)
        cents = pc.floor(pc.add(pc.multiply(
            t["c_acctbal"], pa.scalar(100.0)),
            pa.scalar(0.5))).cast(pa.int64()).to_numpy(
                zero_copy_only=False)
        k = t["c_nationkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        i = np.searchsorted(nk_, k)
        hit = cents * nn_[i] > ss_[i]
        g = pa.table({"nk": pa.array(k),
                      "a": pa.array(hit.astype(np.int64))}) \
            .group_by("nk").aggregate([([], "count_all"), ("a", "sum")])
        return pa.table({"n_nationkey": g["nk"],
                         "n_total": g["count_all"].cast(pa.int64()),
                         "n_above": g["a_sum"]})

    out = (cust.map_batches(above, batch_format="pyarrow")
           .groupby("n_nationkey").sum(["n_total", "n_above"]))
    return _rename(out, ["n_nationkey", "n_total", "n_above"])


QUERIES["above_nation_avg_customers"] = q_above_nation_avg_customers
ORACLE_SQL["above_nation_avg_customers"] = """
        WITH c AS (SELECT CAST(c_nationkey AS BIGINT) AS nk,
                          CAST(floor(c_acctbal * 100.0 + 0.5)
                               AS BIGINT) AS cents
                   FROM customer),
        a AS (SELECT nk, count(*) AS n, SUM(cents) AS s
              FROM c GROUP BY 1)
        SELECT c.nk AS n_nationkey, count(*) AS n_total,
               CAST(count(*) FILTER (c.cents * a.n > a.s) AS BIGINT)
                   AS n_above
        FROM c JOIN a ON c.nk = a.nk GROUP BY 1
    """


def q_dow_seasonality_orders(sf_dir: str):
    """Day-of-week seasonality parts over order dates: counts per
    epoch-aligned weekday bucket plus the exact deviation-from-uniform
    numerators 7·n_d − N (the χ² inputs without a float division) —
    7-row partials, one shuffle."""
    orders = _read(sf_dir, "orders", ["o_orderdate"])

    def part(t: pa.Table) -> pa.Table:
        day = pc.divide(t["o_orderdate"].cast(pa.int64()),
                        pa.scalar(86_400_000_000, pa.int64()))
        dow = pc.subtract(day, pc.multiply(
            pc.divide(day, pa.scalar(7, pa.int64())),
            pa.scalar(7, pa.int64())))
        g = pa.table({"dow": dow}).group_by("dow").aggregate(
            [([], "count_all")])
        return pa.table({"dow": g["dow"],
                         "n": g["count_all"].cast(pa.int64())})

    hist = (orders.map_batches(part, batch_format="pyarrow")
            .groupby("dow").sum("n")).take_all()
    n_total = sum(r["sum(n)"] for r in hist)
    return pd.DataFrame(
        sorted(({"dow": r["dow"], "n": r["sum(n)"],
                 "dev7": 7 * r["sum(n)"] - n_total} for r in hist),
               key=lambda x: x["dow"]))


QUERIES["dow_seasonality_orders"] = q_dow_seasonality_orders
ORACLE_SQL["dow_seasonality_orders"] = """
        WITH d AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day
                   FROM orders),
        h AS (SELECT day % 7 AS dow, count(*) AS n FROM d GROUP BY 1),
        t AS (SELECT SUM(n) AS nn FROM h)
        SELECT CAST(dow AS BIGINT) AS dow, CAST(n AS BIGINT) AS n,
               CAST(7 * n - nn AS BIGINT) AS dev7
        FROM h, t
    """


def q_matryoshka_energy_labels(sf_dir: str):
    """Matryoshka (MRL) truncation audit: per label, how much of the
    embedding's squared mass lives in the first 16 dims — the exact
    integer parts of the prefix-energy ratio that decides whether
    truncated vectors are servable. Per-vector norms floor-scale by
    10³ before summation (int64-safe at any corpus size);
    label-cardinality partials."""
    emb = _read(sf_dir, "embeddings", ["label", "embedding"])

    def part(t: pa.Table) -> pa.Table:
        col = t["embedding"].combine_chunks()
        n = len(col)
        vals = col.values.to_numpy(zero_copy_only=False)
        d = len(vals) // n if n else 0
        q = np.trunc(vals.reshape(n, d).astype(np.float64)
                     * 10000.0).astype(np.int64)
        pre = (q[:, :16] * q[:, :16]).sum(axis=1) // 1000
        tot = (q * q).sum(axis=1) // 1000
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = pa.table({"label": pa.array(lab), "p": pa.array(pre),
                      "tt": pa.array(tot)}).group_by("label") \
            .aggregate([([], "count_all"), ("p", "sum"), ("tt", "sum")])
        return pa.table({"label": g["label"],
                         "n": g["count_all"].cast(pa.int64()),
                         "prefix_k": g["p_sum"], "total_k": g["tt_sum"]})

    out = (emb.map_batches(part, batch_format="pyarrow")
           .groupby("label").sum(["n", "prefix_k", "total_k"]))
    return _rename(out, ["label", "n", "prefix_k", "total_k"])


QUERIES["matryoshka_energy_labels"] = q_matryoshka_energy_labels
ORACLE_SQL["matryoshka_energy_labels"] = """
        WITH e AS (SELECT label,
                          unnest(range(len(embedding))) AS dim,
                          CAST(trunc(CAST(unnest(embedding) AS DOUBLE)
                                     * 10000) AS BIGINT) AS q,
                          vec_id
                   FROM embeddings),
        v AS (SELECT vec_id, label,
                     SUM(CASE WHEN dim < 16 THEN q * q ELSE 0 END)
                         // 1000 AS p,
                     SUM(q * q) // 1000 AS tt
              FROM e GROUP BY 1, 2)
        SELECT CAST(label AS BIGINT) AS label, count(*) AS n,
               CAST(SUM(p) AS BIGINT) AS prefix_k,
               CAST(SUM(tt) AS BIGINT) AS total_k
        FROM v GROUP BY 1
    """


def q_trend_slope_users(sf_dir: str):
    """Recent-trend regression: per user (≥5 events), the exact
    integer least-squares slope parts over their LAST five events
    (times rebased to the window start in whole seconds, values in
    cents) — the 'is this account heating up' feature. One user
    co-partition; the five window rows come from four shifted gathers
    off each user's segment END, no per-user loop and no full LAG
    materialization."""
    from geotile.ops.relational import _with_bucket

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"user_id": pd.Series(dtype=np.int64),
                                 "slope_num": pd.Series(dtype=np.int64),
                                 "slope_den": pd.Series(dtype=np.int64)})
        u = df["user_id"].to_numpy(np.int64)
        e = df["event_id"].to_numpy(np.int64)
        t = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        v = np.floor(df["value"].to_numpy(np.float64)
                     * 100.0).astype(np.int64)
        o = np.lexsort((e, t, u))
        uu, tu, vu = u[o], t[o] // 1_000_000, v[o]
        new = np.r_[True, uu[1:] != uu[:-1]]
        first = np.flatnonzero(new)
        ends = np.r_[first[1:], len(uu)] - 1
        nn = ends - first + 1
        keep = nn >= 5
        ends = ends[keep]
        idx = ends[:, None] - np.arange(4, -1, -1)[None, :]  # (k, 5)
        tw = tu[idx]
        vw = vu[idx]
        tw = tw - tw[:, :1]
        st, sv = tw.sum(axis=1), vw.sum(axis=1)
        stv = (tw * vw).sum(axis=1)
        stt = (tw * tw).sum(axis=1)
        return pd.DataFrame({"user_id": uu[ends],
                             "slope_num": 5 * stv - st * sv,
                             "slope_den": 5 * stt - st * st})

    return (_with_bucket(ev, "user_id", 32)
            .groupby("bucket").map_groups(per_bucket,
                                          batch_format="pandas"))


QUERIES["trend_slope_users"] = q_trend_slope_users
ORACLE_SQL["trend_slope_users"] = """
        WITH x AS (SELECT user_id, epoch_us(ts) // 1000000 AS tsec,
                          CAST(floor(value * 100.0) AS BIGINT) AS v,
                          ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn,
                          count(*) OVER (PARTITION BY user_id) AS n
                   FROM events),
        w AS (SELECT user_id, tsec, v FROM x
              WHERE rn <= 5 AND n >= 5),
        r AS (SELECT user_id,
                     tsec - min(tsec) OVER (PARTITION BY user_id) AS t,
                     v
              FROM w)
        SELECT user_id,
               CAST(5 * SUM(t * v) - SUM(t) * SUM(v) AS BIGINT)
                   AS slope_num,
               CAST(5 * SUM(t * t) - SUM(t) * SUM(t) AS BIGINT)
                   AS slope_den
        FROM r GROUP BY 1
    """


def q_image_median_gray(sf_dir: str):
    """Per-image median gray level (lower median of the integer
    (r+g+b)//3 histogram) for the first 1024 images — the exact
    per-item order statistic a brightness-normalization stage keys
    on. The whole batch's histograms come from ONE bincount over
    image-offset-packed gray codes; the median is a cumsum
    searchsorted at rank (n−1)//2. Python-Counter replay sidecar."""
    from geotile.ops.tiles import ImageDecodeStage, read_image_table

    ds = read_image_table(_image_dir_for(sf_dir)).limit(1024)

    class MedianStage:
        def __init__(self):
            self.decoders = ImageDecodeStage(verify=False).decoders

        def __call__(self, batch: pa.Table) -> pa.Table:
            fmts = batch["fmt"].to_pylist()
            ws = batch["w"].to_pylist()
            hs = batch["h"].to_pylist()
            payloads = batch["bytes"].to_pylist()
            ids = batch["image_id"].to_numpy(zero_copy_only=False)
            out_id, out_med = [], []
            groups: dict[tuple[int, int], list[int]] = {}
            for i, (wi, hi) in enumerate(zip(ws, hs)):
                groups.setdefault((wi, hi), []).append(i)
            for (wi, hi), slots in groups.items():
                px = np.stack([self.decoders[fmts[i]](payloads[i],
                                                      wi, hi)
                               for i in slots])
                gray = px.astype(np.int64).sum(axis=3) // 3
                k = len(slots)
                code = (np.arange(k)[:, None, None] * 256 + gray)
                hist = np.bincount(code.ravel(),
                                   minlength=k * 256).reshape(k, 256)
                cum = np.cumsum(hist, axis=1)
                npx = wi * hi
                rank = (npx - 1) // 2 + 1
                med = (cum < rank).sum(axis=1)
                out_id.append(ids[slots])
                out_med.append(med.astype(np.int64))
            return pa.table({
                "image_id": pa.array(np.concatenate(out_id)),
                "median_gray": pa.array(np.concatenate(out_med))})

    return ds.map_batches(MedianStage, batch_format="pyarrow",
                          batch_size=256, concurrency=2)


QUERIES["image_median_gray"] = q_image_median_gray


def _image_median_sidecar(img: str, n: int = 1024) -> str:
    """Counter-replay for image_median_gray (per-image python sort +
    index vs the engine's packed bincount/cumsum). Content-keyed on
    synth.py."""
    import geotile.synth as _sy
    import pyarrow.parquet as pq
    from pathlib import Path

    p = _oracle_cache_dir() / (
        f"oracle_imgmedian_{Path(img).name}_{n}_{_mods_digest(_sy)}.parquet"
    )
    if not p.exists():
        t = pq.read_table(img, columns=["image_id", "w", "h"])
        order = pc.sort_indices(t["image_id"])[:n]
        ids = t["image_id"].take(order)
        ws = t["w"].take(order).to_numpy(zero_copy_only=False)
        hs = t["h"].take(order).to_numpy(zero_copy_only=False)
        idx = _sy.image_index(ids).astype(np.uint64)
        meds = np.zeros(len(ws), np.int64)
        for wi, hi in set(zip(ws.tolist(), hs.tolist())):
            m = np.nonzero((ws == wi) & (hs == hi))[0]
            px = _sy.pixel_pattern(idx[m], wi, hi)
            gray = (px[..., 0].astype(np.int64) + px[..., 1]
                    + px[..., 2]) // 3
            for j, slot in enumerate(m):
                vals = sorted(gray[j].ravel().tolist())
                meds[slot] = vals[(len(vals) - 1) // 2]
        out = pa.table({"image_id": ids,
                        "median_gray": pa.array(meds)})
        _oracle_cache_dir().mkdir(parents=True, exist_ok=True)
        _atomic_write_table(out, p)
    return str(p)


def _image_median_sql(img: str) -> str:
    return (f"SELECT image_id, median_gray "
            f"FROM read_parquet('{_image_median_sidecar(img)}')")


# Corridor segment (lon/lat) and width — literals shared with the SQL
# replay; the meter-frame constants are embedded by repr so both sides
# evaluate the identical IEEE doubles.
_CORRIDOR_A = (-122.25, 37.45)
_CORRIDOR_B = (-121.95, 37.65)
_CORRIDOR_R2 = 25_000_000.0  # 5 km squared, m²


def q_tile_corridor_query(sf_dir: str):
    """Corridor query: tiles within 5 km of a literal route segment
    (the along-track buffer a transit planner draws), aggregated to
    res-12 cell counts. The clamped-projection distance runs in the
    engine's meter frame with the EXACT op order of the SQL replay
    (rx/ry → t → residual), so the d² ≤ R² boundary is bit-identical;
    the filter runs inside the read task and only surviving cell
    partials shuffle."""
    from geotile.geom import cells
    from geotile.geom.buffer import meter_frame
    from geotile.ops.join import _ANCHOR_LAT
    from geotile.ops.tiles import read_image_table

    mx, my = meter_frame(_ANCHOR_LAT)
    ax_lon, ax_lat = _CORRIDOR_A
    dx = (_CORRIDOR_B[0] - ax_lon) * mx
    dy = (_CORRIDOR_B[1] - ax_lat) * my
    inv = 1.0 / (dx * dx + dy * dy)

    ds = read_image_table(_image_dir_for(sf_dir),
                          columns=["lon", "lat"])

    def part(t: pa.Table) -> pa.Table:
        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        px = (lon - ax_lon) * mx
        py = (lat - ax_lat) * my
        tt = (px * dx + py * dy) * inv
        tc = np.minimum(np.maximum(tt, 0.0), 1.0)
        ddx = px - tc * dx
        ddy = py - tc * dy
        d2 = ddx * ddx + ddy * ddy
        m = d2 <= _CORRIDOR_R2
        cell = cells.encode(lon[m], lat[m], 12).view(np.int64)
        g = pa.table({"cell": pa.array(cell)}).group_by("cell") \
            .aggregate([([], "count_all")])
        return pa.table({"cell": g["cell"],
                         "n_tiles": g["count_all"].cast(pa.int64())})

    out = (ds.map_batches(part, batch_format="pyarrow")
           .groupby("cell").sum("n_tiles"))
    return _rename(out, ["cell", "n_tiles"])


QUERIES["tile_corridor_query"] = q_tile_corridor_query


def _tile_corridor_sql(img_dir: str) -> str:
    from geotile.geom.buffer import meter_frame
    from geotile.ops.join import _ANCHOR_LAT

    mx, my = meter_frame(_ANCHOR_LAT)
    ax_lon, ax_lat = _CORRIDOR_A
    dx = (_CORRIDOR_B[0] - ax_lon) * mx
    dy = (_CORRIDOR_B[1] - ax_lat) * my
    inv = 1.0 / (dx * dx + dy * dy)
    return f"""
        WITH p AS (SELECT lon, lat,
                          (lon - ({ax_lon!r})) * {mx!r} AS px,
                          (lat - ({ax_lat!r})) * {my!r} AS py
                   FROM read_parquet('{img_dir}/part-*.parquet')),
        t AS (SELECT lon, lat,
                     least(greatest((px * ({dx!r}) + py * ({dy!r}))
                                    * ({inv!r}), 0.0), 1.0) AS tc,
                     px, py
              FROM p),
        d AS (SELECT lon, lat,
                     (px - tc * ({dx!r})) * (px - tc * ({dx!r}))
                   + (py - tc * ({dy!r})) * (py - tc * ({dy!r})) AS d2
              FROM t)
        SELECT {_sql_cell('lon', 'lat', 12)} AS cell,
               count(*) AS n_tiles
        FROM d WHERE d2 <= {_CORRIDOR_R2!r}
        GROUP BY 1
    """


def q_session_entry_exit_matrix(sf_dir: str):
    """Session flow matrix: (entry event type × exit event type)
    counts over all sessions — where journeys start vs where they die.
    One user co-partition; every bucket's session boundaries, entry
    gathers and exit gathers come from ONE lexsorted pass (starts =
    user-change|gap mask, ends = next start − 1); the 5×5 histogram
    is closed-vocabulary partials."""
    from geotile.ops.relational import _with_bucket

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id",
                                  "event_type"])
    GAP = 1_800_000_000

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"entry_type": pd.Series(dtype=object),
                                 "exit_type": pd.Series(dtype=object),
                                 "n_sessions":
                                     pd.Series(dtype=np.int64)})
        u = df["user_id"].to_numpy(np.int64)
        e = df["event_id"].to_numpy(np.int64)
        t = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        ty = df["event_type"].to_numpy()
        o = np.lexsort((e, t, u))
        uu, tu, tyu = u[o], t[o], ty[o]
        new = np.r_[True, (uu[1:] != uu[:-1])
                    | (np.diff(tu) > GAP)]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(uu)] - 1
        g = pd.DataFrame({"entry_type": tyu[starts],
                          "exit_type": tyu[ends]}) \
            .groupby(["entry_type", "exit_type"], as_index=False).size()
        return g.rename(columns={"size": "n_sessions"})

    out = (_with_bucket(ev, "user_id", 32)
           .groupby("bucket").map_groups(per_bucket,
                                         batch_format="pandas")
           .groupby(["entry_type", "exit_type"]).sum("n_sessions"))
    return _rename(out, ["entry_type", "exit_type", "n_sessions"])


QUERIES["session_entry_exit_matrix"] = q_session_entry_exit_matrix
ORACLE_SQL["session_entry_exit_matrix"] = """
        WITH s AS (SELECT user_id, event_id, event_type,
                          epoch_us(ts) AS us,
                          CASE WHEN lag(ts) OVER w IS NULL
                                    OR ts - lag(ts) OVER w
                                       > INTERVAL 30 MINUTE
                               THEN 1 ELSE 0 END AS is_new
                   FROM events
                   WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        s2 AS (SELECT user_id, event_id, event_type, us,
                      SUM(is_new) OVER (PARTITION BY user_id ORDER BY us
                                        ROWS UNBOUNDED PRECEDING) AS sid
               FROM s),
        en AS (SELECT user_id, sid, event_type,
                      ROW_NUMBER() OVER (PARTITION BY user_id, sid
                          ORDER BY us, event_id) AS ra,
                      ROW_NUMBER() OVER (PARTITION BY user_id, sid
                          ORDER BY us DESC, event_id DESC) AS rz
               FROM s2)
        SELECT a.event_type AS entry_type, z.event_type AS exit_type,
               count(*) AS n_sessions
        FROM (SELECT * FROM en WHERE ra = 1) a
        JOIN (SELECT * FROM en WHERE rz = 1) z
          ON a.user_id = z.user_id AND a.sid = z.sid
        GROUP BY 1, 2
    """


def q_forecast_revenue_q6(sf_dir: str):
    """TPC-H Q6 (forecast revenue change): the pure predicate-and-sum
    scan — date year, discount band (exact on the integer percent
    lattice, no double BETWEEN hazard) and quantity cap, revenue =
    Σ floor(price·disc·10⁴+½). One pass, one row, zero shuffles
    beyond a scalar reduce."""
    li = _read(sf_dir, "lineitem",
               ["l_shipdate", "l_discount", "l_quantity",
                "l_extendedprice"])
    LO = np.datetime64("1995-01-01", "us")
    HI = np.datetime64("1996-01-01", "us")

    def part(t: pa.Table) -> pa.Table:
        disc_pct = pc.floor(pc.add(pc.multiply(
            t["l_discount"], pa.scalar(100.0)),
            pa.scalar(0.5))).cast(pa.int64())
        keep = pc.and_(pc.and_(pc.and_(pc.and_(
            pc.greater_equal(t["l_shipdate"], pa.scalar(LO)),
            pc.less(t["l_shipdate"], pa.scalar(HI))),
            pc.greater_equal(disc_pct, pa.scalar(5))),
            pc.less_equal(disc_pct, pa.scalar(7))),
            pc.less(t["l_quantity"], pa.scalar(24.0)))
        f = t.filter(keep)
        rev = pc.floor(pc.add(pc.multiply(
            pc.multiply(f["l_extendedprice"], f["l_discount"]),
            pa.scalar(10000.0)), pa.scalar(0.5))).cast(pa.int64())
        s = pc.sum(rev).as_py() or 0
        return pa.table({"revenue_e4": pa.array([s], pa.int64()),
                         "n_items": pa.array([len(f)], pa.int64())})

    df = li.map_batches(part, batch_format="pyarrow").to_pandas()
    return pd.DataFrame({"revenue_e4": [int(df["revenue_e4"].sum())],
                         "n_items": [int(df["n_items"].sum())]})


QUERIES["forecast_revenue_q6"] = q_forecast_revenue_q6
ORACLE_SQL["forecast_revenue_q6"] = """
        SELECT CAST(COALESCE(SUM(CAST(floor(l_extendedprice
                       * l_discount * 10000.0 + 0.5) AS BIGINT)), 0)
                    AS BIGINT) AS revenue_e4,
               count(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate < TIMESTAMP '1996-01-01'
          AND CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)
              BETWEEN 5 AND 7
          AND l_quantity < 24
    """


def q_late_shipments_q12(sf_dir: str):
    """TPC-H Q12 shape (shipping-mode audit, adapted to this schema):
    per order priority, lineitems shipped LATE (more than 90 days
    after the order date) vs on time. One bucketed co-partition join
    on orderkey (both sides fact-scale), the late/on-time split
    resolved inside the join pass — only priority-cardinality
    partials leave it. The 90-day boundary is integer day math."""
    from geotile.ops.relational import bucketed_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderpriority"])
    j = bucketed_join(li, orders, "l_orderkey", "o_orderkey",
                      n_buckets=16)

    def split(t: pa.Table) -> pa.Table:
        sd = pc.divide(t["l_shipdate"].cast(pa.int64()),
                       pa.scalar(86_400_000_000, pa.int64()))
        od = pc.divide(t["o_orderdate"].cast(pa.int64()),
                       pa.scalar(86_400_000_000, pa.int64()))
        late = pc.greater(pc.subtract(sd, od),
                          pa.scalar(90, pa.int64())).cast(pa.int64())
        g = pa.table({"o_orderpriority": t["o_orderpriority"],
                      "late": late}).group_by("o_orderpriority") \
            .aggregate([([], "count_all"), ("late", "sum")])
        return pa.table({"o_orderpriority": g["o_orderpriority"],
                         "n_items": g["count_all"].cast(pa.int64()),
                         "n_late": g["late_sum"]})

    out = (j.map_batches(split, batch_format="pyarrow")
           .groupby("o_orderpriority").sum(["n_items", "n_late"]))
    return _rename(out, ["o_orderpriority", "n_items", "n_late"])


QUERIES["late_shipments_q12"] = q_late_shipments_q12
ORACLE_SQL["late_shipments_q12"] = """
        SELECT o_orderpriority, count(*) AS n_items,
               CAST(count(*) FILTER (
                   epoch_us(l_shipdate) // 86400000000
                   - epoch_us(o_orderdate) // 86400000000 > 90)
                   AS BIGINT) AS n_late
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1
    """


def q_priority_exists_check_q4(sf_dir: str):
    """TPC-H Q4 shape (order-priority checking): orders placed in 1995
    with AT LEAST ONE heavy lineitem (quantity ≥ 45) — the correlated
    EXISTS as a semi-join. The heavy-orderkey set is deduped per
    batch and fed through relational.semi_join (broadcast keyset with
    the co-partition fallback); counts per priority are 5-row
    partials."""
    from geotile.ops.relational import semi_join

    heavy = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]) \
        .map_batches(
            lambda t: t.filter(pc.greater_equal(
                t["l_quantity"], pa.scalar(45.0)))
            .select(["l_orderkey"])
            .group_by("l_orderkey").aggregate([]),
            batch_format="pyarrow")
    LO = np.datetime64("1995-01-01", "us")
    HI = np.datetime64("1996-01-01", "us")
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderpriority"]) \
        .map_batches(lambda t: t.filter(pc.and_(
            pc.greater_equal(t["o_orderdate"], pa.scalar(LO)),
            pc.less(t["o_orderdate"], pa.scalar(HI)))),
            batch_format="pyarrow")
    sj = semi_join(orders, heavy, "o_orderkey", "l_orderkey")

    def count(t: pa.Table) -> pa.Table:
        g = t.group_by("o_orderpriority").aggregate([([], "count_all")])
        return pa.table({"o_orderpriority": g["o_orderpriority"],
                         "n_orders": g["count_all"].cast(pa.int64())})

    out = (sj.map_batches(count, batch_format="pyarrow")
           .groupby("o_orderpriority").sum("n_orders"))
    return _rename(out, ["o_orderpriority", "n_orders"])


QUERIES["priority_exists_check_q4"] = q_priority_exists_check_q4
ORACLE_SQL["priority_exists_check_q4"] = """
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate < TIMESTAMP '1996-01-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_quantity >= 45)
        GROUP BY 1
    """


def q_embedding_drift_labels(sf_dir: str):
    """Embedding drift monitor: per label, the exact squared distance
    between the centroid of the EVEN-id half and the ODD-id half of
    the corpus (both on the 10⁷ lattice with the house floor rule) —
    the deploy-time check that a re-embedded shard still lands where
    the old one did. One (label, half, dim) moments pass; the drift
    epilogue is classes×dims driver math with an asserted 2⁵³
    contract."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "label", "embedding"])

    def moments(t: pa.Table) -> pa.Table:
        col = t["embedding"].combine_chunks()
        n = len(col)
        vals = col.values.to_numpy(zero_copy_only=False)
        d = len(vals) // n if n else 0
        q = np.trunc(vals.reshape(n, d).astype(np.float64)
                     * 10000.0).astype(np.int64)
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        half = (t["vec_id"].to_numpy() % 2).astype(np.int64)
        key2 = lab * 2 + half
        order = np.argsort(key2, kind="stable")
        q, key2 = q[order], key2[order]
        start = np.flatnonzero(np.r_[True, key2[1:] != key2[:-1]])
        cnt = np.diff(np.r_[start, len(key2)])
        sums = np.add.reduceat(q, start, axis=0)
        uk = key2[start]
        key = (np.repeat(uk, d) * 4096 +
               np.tile(np.arange(d, dtype=np.int64), len(uk)))
        return pa.table({"key": pa.array(key),
                         "n": pa.array(np.repeat(cnt, d).astype(np.int64)),
                         "s_q": pa.array(sums.reshape(-1))})

    agg = (emb.map_batches(moments, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=65536)
           .groupby("key").sum(["n", "s_q"]).take_all())
    mu: dict[tuple[int, int, int], int] = {}
    ns: dict[tuple[int, int], int] = {}
    for r in agg:
        k2, dim = r["key"] // 4096, r["key"] % 4096
        lab, half = k2 // 2, k2 % 2
        s_q, n = r["sum(s_q)"], r["sum(n)"]
        assert abs(s_q) * 1000 < (1 << 53), "centroid lattice contract"
        mu[(lab, half, dim)] = int(np.floor(s_q * 1000.0 / n + 0.5))
        ns[(lab, half)] = n
    labels = sorted({l for l, _ in ns})
    dims = sorted({d for _, _, d in mu})
    rows = []
    for lab in labels:
        d2 = sum((mu.get((lab, 0, d), 0) - mu.get((lab, 1, d), 0)) ** 2
                 for d in dims)
        rows.append({"label": lab, "n_even": ns.get((lab, 0), 0),
                     "n_odd": ns.get((lab, 1), 0), "drift_d2": d2})
    return pd.DataFrame(rows)


QUERIES["embedding_drift_labels"] = q_embedding_drift_labels
ORACLE_SQL["embedding_drift_labels"] = """
        WITH e AS (SELECT vec_id % 2 AS half, label,
                          unnest(range(len(embedding))) AS dim,
                          CAST(trunc(CAST(unnest(embedding) AS DOUBLE)
                                     * 10000) AS BIGINT) AS q
                   FROM embeddings),
        c AS (SELECT label, half, dim,
                     CAST(floor(SUM(q) * 1000.0 / count(*) + 0.5)
                          AS BIGINT) AS mu
              FROM e GROUP BY 1, 2, 3),
        n AS (SELECT label, half, count(DISTINCT dim) AS nd,
                     SUM(1) AS x FROM e GROUP BY 1, 2),
        cnt AS (SELECT label, half, count(*) AS n
                FROM (SELECT DISTINCT label, half, vec_id FROM
                      (SELECT vec_id % 2 AS half, label, vec_id
                       FROM embeddings) z) y
                GROUP BY 1, 2),
        d AS (SELECT a.label,
                     SUM((a.mu - b.mu) * (a.mu - b.mu)) AS drift_d2
              FROM c a JOIN c b ON a.label = b.label AND a.dim = b.dim
              WHERE a.half = 0 AND b.half = 1
              GROUP BY 1)
        SELECT CAST(d.label AS BIGINT) AS label,
               CAST(ce.n AS BIGINT) AS n_even,
               CAST(co.n AS BIGINT) AS n_odd,
               CAST(d.drift_d2 AS BIGINT) AS drift_d2
        FROM d
        JOIN cnt ce ON ce.label = d.label AND ce.half = 0
        JOIN cnt co ON co.label = d.label AND co.half = 1
    """


def q_promo_revenue_share_q14(sf_dir: str):
    """TPC-H Q14 (promotion effect): the share of one month's revenue
    earned by PROMO-type parts, in exact ppm. The part dimension
    broadcasts as a sorted-key bit array (searchsorted gather — no
    shuffle join); both revenue sums ride the same one-row partials,
    and the ppm division is integer, so no float ratio ever forms."""
    part = _read(sf_dir, "part", ["p_partkey", "p_type"]).take_all()
    pk = np.array(sorted(r["p_partkey"] for r in part), dtype=np.int64)
    ptype = {r["p_partkey"]: r["p_type"] for r in part}
    promo = np.array([ptype[k] == "PROMO" for k in pk])
    ref = ray.put((pk, promo))
    LO = np.datetime64("1995-06-01", "us")
    HI = np.datetime64("1995-07-01", "us")

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_shipdate", "l_extendedprice",
                "l_discount"])

    def part_fn(t: pa.Table) -> pa.Table:
        f = t.filter(pc.and_(
            pc.greater_equal(t["l_shipdate"], pa.scalar(LO)),
            pc.less(t["l_shipdate"], pa.scalar(HI))))
        pk_, promo_ = _broadcast(ref)
        k = f["l_partkey"].to_numpy(zero_copy_only=False)
        idx = np.minimum(np.searchsorted(pk_, k), len(pk_) - 1)
        hit = pk_[idx] == k
        rev = pc.floor(pc.add(pc.multiply(
            pc.multiply(f["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), f["l_discount"])),
            pa.scalar(10000.0)), pa.scalar(0.5))).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        rev = rev[hit]
        is_promo = promo_[idx[hit]]
        return pa.table({
            "promo_e4": pa.array([int(rev[is_promo].sum())], pa.int64()),
            "total_e4": pa.array([int(rev.sum())], pa.int64())})

    df = li.map_batches(part_fn, batch_format="pyarrow").to_pandas()
    promo_e4 = int(df["promo_e4"].sum())
    total_e4 = int(df["total_e4"].sum())
    return pd.DataFrame({"promo_e4": [promo_e4],
                         "total_e4": [total_e4],
                         "share_ppm": [promo_e4 * 1_000_000 // total_e4
                                       if total_e4 else 0]})


QUERIES["promo_revenue_share_q14"] = q_promo_revenue_share_q14
ORACLE_SQL["promo_revenue_share_q14"] = """
        WITH r AS (SELECT p_type,
                          CAST(floor(l_extendedprice * (1 - l_discount)
                                     * 10000.0 + 0.5) AS BIGINT) AS rev
                   FROM lineitem JOIN part ON l_partkey = p_partkey
                   WHERE l_shipdate >= TIMESTAMP '1995-06-01'
                     AND l_shipdate < TIMESTAMP '1995-07-01')
        SELECT CAST(SUM(rev) FILTER (p_type = 'PROMO') AS BIGINT)
                   AS promo_e4,
               CAST(SUM(rev) AS BIGINT) AS total_e4,
               SUM(rev) FILTER (p_type = 'PROMO') * 1000000
                   // SUM(rev) AS share_ppm
        FROM r
    """


def q_small_qty_revenue_q17(sf_dir: str):
    """TPC-H Q17 shape (small-quantity-order revenue): revenue from
    lineitems whose quantity is below 20% of their part's average —
    the aggregate-join-back with the threshold kept INTEGER
    (5·qty·n < Σqty avoids the float mean entirely). Per-part sums
    materialize once (schema-probe law), the fact side re-joins by
    bucketed co-partition, and only a one-row partial leaves the
    filter pass."""
    from geotile.ops.relational import bucketed_join

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice"])

    def psum(t: pa.Table) -> pa.Table:
        q = t["l_quantity"].cast(pa.int64())
        g = pa.table({"pk": t["l_partkey"], "q": q}).group_by("pk") \
            .aggregate([([], "count_all"), ("q", "sum")])
        return pa.table({"pk": g["pk"],
                         "n": g["count_all"].cast(pa.int64()),
                         "sq": g["q_sum"]})

    ps = (li.map_batches(psum, batch_format="pyarrow")
          .groupby("pk").sum(["n", "sq"]))
    ps = _rename(ps, ["pk", "n", "sq"]).materialize()

    j = bucketed_join(li, ps, "l_partkey", "pk", n_buckets=16)

    def small(t: pa.Table) -> pa.Table:
        q = t["l_quantity"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        sq = t["sq"].to_numpy(zero_copy_only=False)
        keep = 5 * q * n < sq
        cents = pc.floor(pc.add(pc.multiply(
            t["l_extendedprice"], pa.scalar(100.0)),
            pa.scalar(0.5))).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)[keep]
        return pa.table({
            "revenue_cents": pa.array([int(cents.sum())], pa.int64()),
            "n_items": pa.array([int(keep.sum())], pa.int64())})

    df = j.map_batches(small, batch_format="pyarrow").to_pandas()
    return pd.DataFrame({
        "revenue_cents": [int(df["revenue_cents"].sum())],
        "n_items": [int(df["n_items"].sum())]})


QUERIES["small_qty_revenue_q17"] = q_small_qty_revenue_q17
ORACLE_SQL["small_qty_revenue_q17"] = """
        WITH ps AS (SELECT l_partkey AS pk, count(*) AS n,
                           SUM(CAST(l_quantity AS BIGINT)) AS sq
                    FROM lineitem GROUP BY 1)
        SELECT CAST(COALESCE(SUM(CAST(floor(l_extendedprice * 100.0
                                            + 0.5) AS BIGINT)), 0)
                    AS BIGINT) AS revenue_cents,
               count(*) AS n_items
        FROM lineitem JOIN ps ON l_partkey = pk
        WHERE 5 * CAST(l_quantity AS BIGINT) * n < sq
    """


def q_order_gap_median_hist(sf_dir: str):
    """Repeat-purchase cadence: the histogram of per-customer MEDIAN
    order gaps (lower median, days) — the grouped order statistic
    computed where the group lives. One customer co-partition; every
    customer's sorted gaps, median gather and the histogram partial
    come from one lexsorted pass per bucket. Deterministic LAG
    (day, orderkey) tie-break mirrored in the SQL replay."""
    from geotile.ops.relational import _with_bucket

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderkey",
                                      "o_orderdate"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"median_gap": pd.Series(dtype=np.int64),
                                 "n_customers":
                                     pd.Series(dtype=np.int64)})
        c = df["o_custkey"].to_numpy(np.int64)
        k = df["o_orderkey"].to_numpy(np.int64)
        d = (df["o_orderdate"].to_numpy().astype("datetime64[us]")
             .astype(np.int64) // 86_400_000_000)
        o = np.lexsort((k, d, c))
        cc, dd = c[o], d[o]
        same = cc[1:] == cc[:-1]
        gaps = (dd[1:] - dd[:-1])[same]
        gc = cc[1:][same]
        if len(gaps) == 0:  # no repeat customers in this bucket
            return pd.DataFrame({"median_gap": pd.Series(dtype=np.int64),
                                 "n_customers":
                                     pd.Series(dtype=np.int64)})
        og = np.lexsort((gaps, gc))
        gc, gaps = gc[og], gaps[og]
        new = np.r_[True, gc[1:] != gc[:-1]]
        first = np.flatnonzero(new)
        cnt = np.diff(np.r_[first, len(gc)])
        med = gaps[first + (cnt - 1) // 2]
        g = pd.DataFrame({"median_gap": med}) \
            .groupby("median_gap", as_index=False).size()
        return g.rename(columns={"size": "n_customers"})

    out = (_with_bucket(orders, "o_custkey", 32)
           .groupby("bucket").map_groups(per_bucket,
                                         batch_format="pandas")
           .groupby("median_gap").sum("n_customers"))
    return _rename(out, ["median_gap", "n_customers"])


QUERIES["order_gap_median_hist"] = q_order_gap_median_hist
ORACLE_SQL["order_gap_median_hist"] = """
        WITH o AS (SELECT o_custkey,
                          epoch_us(o_orderdate) // 86400000000 AS day,
                          o_orderkey
                   FROM orders),
        g AS (SELECT o_custkey,
                     day - LAG(day) OVER (PARTITION BY o_custkey
                         ORDER BY day, o_orderkey) AS gap
              FROM o),
        gg AS (SELECT o_custkey, gap,
                      ROW_NUMBER() OVER (PARTITION BY o_custkey
                          ORDER BY gap) AS rn,
                      count(*) OVER (PARTITION BY o_custkey) AS n
               FROM g WHERE gap IS NOT NULL),
        m AS (SELECT o_custkey, gap AS median_gap FROM gg
              WHERE rn = (n - 1) // 2 + 1)
        SELECT CAST(median_gap AS BIGINT) AS median_gap,
               count(*) AS n_customers
        FROM m GROUP BY 1
    """


def q_disjunctive_pred_q19(sf_dir: str):
    """TPC-H Q19 shape (discounted revenue, OR-of-ANDs): revenue from
    lineitems matching any of three (brand, size-cap, quantity-band)
    arms — the disjunctive predicate that defeats naive single-column
    pushdown. The part dimension broadcasts as TWO parallel arrays
    (brand code, size); the whole disjunction evaluates as one
    vectorized boolean expression per batch, and only a one-row
    partial leaves."""
    part = _read(sf_dir, "part",
                 ["p_partkey", "p_brand", "p_size"]).take_all()
    pk = np.array(sorted(r["p_partkey"] for r in part), dtype=np.int64)
    by = {r["p_partkey"]: r for r in part}
    brand = np.array([by[k]["p_brand"] for k in pk])
    size = np.array([by[k]["p_size"] for k in pk], dtype=np.int64)
    ref = ray.put((pk, brand, size))

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice",
                "l_discount"])

    def arm(brand_, size_, qty, b, smax, qlo, qhi):
        return ((brand_ == b) & (size_ <= smax)
                & (qty >= qlo) & (qty <= qhi))

    def part_fn(t: pa.Table) -> pa.Table:
        pk_, brand_, size_ = _broadcast(ref)
        k = t["l_partkey"].to_numpy(zero_copy_only=False)
        idx = np.minimum(np.searchsorted(pk_, k), len(pk_) - 1)
        hit = pk_[idx] == k
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        b, s = brand_[idx], size_[idx]
        keep = hit & (arm(b, s, qty, "Brand#1", 10, 1.0, 11.0)
                      | arm(b, s, qty, "Brand#12", 20, 10.0, 20.0)
                      | arm(b, s, qty, "Brand#23", 35, 20.0, 30.0))
        rev = pc.floor(pc.add(pc.multiply(
            pc.multiply(t["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), t["l_discount"])),
            pa.scalar(10000.0)), pa.scalar(0.5))).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)[keep]
        return pa.table({
            "revenue_e4": pa.array([int(rev.sum())], pa.int64()),
            "n_items": pa.array([int(keep.sum())], pa.int64())})

    df = li.map_batches(part_fn, batch_format="pyarrow").to_pandas()
    return pd.DataFrame({
        "revenue_e4": [int(df["revenue_e4"].sum())],
        "n_items": [int(df["n_items"].sum())]})


QUERIES["disjunctive_pred_q19"] = q_disjunctive_pred_q19
ORACLE_SQL["disjunctive_pred_q19"] = """
        SELECT CAST(COALESCE(SUM(CAST(floor(l_extendedprice
                       * (1 - l_discount) * 10000.0 + 0.5)
                       AS BIGINT)), 0) AS BIGINT) AS revenue_e4,
               count(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size <= 10
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#12' AND p_size <= 20
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#23' AND p_size <= 35
               AND l_quantity BETWEEN 20 AND 30)
    """


def q_top_supplier_q15(sf_dir: str):
    """TPC-H Q15 (top supplier): supplier(s) achieving THE maximum
    quarterly revenue — max-of-aggregate then equality-filter, the
    two-phase pattern where the second phase costs one broadcast
    scalar, not a rank. Supplier revenue partials pack on suppkey;
    the max reduces from the same materialized aggregate the filter
    reads, so the fact table is scanned exactly once."""
    LO = np.datetime64("1996-01-01", "us")
    HI = np.datetime64("1996-04-01", "us")
    li = _read(sf_dir, "lineitem",
               ["l_suppkey", "l_shipdate", "l_extendedprice",
                "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        f = t.filter(pc.and_(
            pc.greater_equal(t["l_shipdate"], pa.scalar(LO)),
            pc.less(t["l_shipdate"], pa.scalar(HI))))
        rev = pc.floor(pc.add(pc.multiply(
            pc.multiply(f["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), f["l_discount"])),
            pa.scalar(10000.0)), pa.scalar(0.5))).cast(pa.int64())
        g = pa.table({"l_suppkey": f["l_suppkey"], "r": rev}) \
            .group_by("l_suppkey").aggregate([("r", "sum")])
        return pa.table({"l_suppkey": g["l_suppkey"],
                         "revenue_e4": g["r_sum"]})

    per_supp = (li.map_batches(partial, batch_format="pyarrow")
                .groupby("l_suppkey").sum("revenue_e4"))
    per_supp = _rename(per_supp,
                       ["l_suppkey", "revenue_e4"]).materialize()
    mx = int(per_supp.max("revenue_e4"))
    return per_supp.map_batches(
        lambda t: t.filter(pc.equal(t["revenue_e4"],
                                    pa.scalar(mx, pa.int64()))),
        batch_format="pyarrow")


QUERIES["top_supplier_q15"] = q_top_supplier_q15
ORACLE_SQL["top_supplier_q15"] = """
        WITH r AS (SELECT l_suppkey,
                          SUM(CAST(floor(l_extendedprice
                              * (1 - l_discount) * 10000.0 + 0.5)
                              AS BIGINT)) AS revenue_e4
                   FROM lineitem
                   WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                     AND l_shipdate < TIMESTAMP '1996-04-01'
                   GROUP BY 1)
        SELECT l_suppkey, revenue_e4 FROM r
        WHERE revenue_e4 = (SELECT max(revenue_e4) FROM r)
    """


def q_waiting_customers_q22(sf_dir: str):
    """TPC-H Q22 shape (global-market opportunity): customers with an
    above-average balance (among positive balances — the global
    scalar computed as an integer cross-multiplication) who have
    NEVER ordered (relational.anti_join), rolled up per nation. Three
    primitives compose: broadcast scalar, anti-join, small groupby —
    each keeping its own scale story."""
    from geotile.ops.relational import anti_join

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey", "c_acctbal"])

    def pos_sum(t: pa.Table) -> pa.Table:
        cents = pc.floor(pc.add(pc.multiply(
            t["c_acctbal"], pa.scalar(100.0)),
            pa.scalar(0.5))).cast(pa.int64())
        f = cents.filter(pc.greater(cents, pa.scalar(0)))
        return pa.table({
            "n": pa.array([len(f)], pa.int64()),
            "s": pa.array([pc.sum(f).as_py() or 0], pa.int64())})

    agg = cust.map_batches(pos_sum, batch_format="pyarrow").to_pandas()
    n_pos, s_pos = int(agg["n"].sum()), int(agg["s"].sum())

    rich = cust.map_batches(
        lambda t: t.filter(pc.greater(
            pc.multiply(pc.floor(pc.add(pc.multiply(
                t["c_acctbal"], pa.scalar(100.0)),
                pa.scalar(0.5))).cast(pa.int64()),
                pa.scalar(n_pos, pa.int64())),
            pa.scalar(s_pos, pa.int64()))),
        batch_format="pyarrow")
    CUT = np.datetime64("2000-01-01", "us")
    orders_k = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"]) \
        .map_batches(lambda t: t.filter(pc.greater_equal(
            t["o_orderdate"], pa.scalar(CUT)))
            .select(["o_custkey"]), batch_format="pyarrow")
    waiting = anti_join(rich, orders_k, "c_custkey", "o_custkey")

    def rollup(t: pa.Table) -> pa.Table:
        cents = pc.floor(pc.add(pc.multiply(
            t["c_acctbal"], pa.scalar(100.0)),
            pa.scalar(0.5))).cast(pa.int64())
        g = pa.table({"nk": t["c_nationkey"].cast(pa.int64()),
                      "c": cents}).group_by("nk").aggregate(
            [([], "count_all"), ("c", "sum")])
        return pa.table({"n_nationkey": g["nk"],
                         "n_cust": g["count_all"].cast(pa.int64()),
                         "bal_cents": g["c_sum"]})

    out = (waiting.map_batches(rollup, batch_format="pyarrow")
           .groupby("n_nationkey").sum(["n_cust", "bal_cents"]))
    return _rename(out, ["n_nationkey", "n_cust", "bal_cents"])


QUERIES["waiting_customers_q22"] = q_waiting_customers_q22
ORACLE_SQL["waiting_customers_q22"] = """
        WITH c AS (SELECT c_custkey,
                          CAST(c_nationkey AS BIGINT) AS nk,
                          CAST(floor(c_acctbal * 100.0 + 0.5)
                               AS BIGINT) AS cents
                   FROM customer),
        t AS (SELECT count(*) AS n, SUM(cents) AS s FROM c
              WHERE cents > 0)
        SELECT nk AS n_nationkey, count(*) AS n_cust,
               CAST(SUM(cents) AS BIGINT) AS bal_cents
        FROM c, t
        WHERE cents * n > s
          AND c_custkey NOT IN (SELECT o_custkey FROM orders
                                WHERE o_orderdate
                                      >= TIMESTAMP '2000-01-01')
        GROUP BY 1
    """


def q_returned_revenue_q10(sf_dir: str):
    """TPC-H Q10 shape (returned-item reporting): top-20 customers by
    revenue lost to returned lineitems in a quarter. Chain: flag+date
    filtered lineitem ⋈ date-filtered orders (bucketed, orderkey) →
    custkey revenue partials → customer name attach via broadcast →
    top-20 by per-block threshold partials + one tiny reduce — the
    global sort never happens."""
    from geotile.ops.relational import bucketed_join

    LO = np.datetime64("1995-10-01", "us")
    HI = np.datetime64("1996-01-01", "us")
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(lambda t: t.filter(pc.and_(
            pc.greater_equal(t["o_orderdate"], pa.scalar(LO)),
            pc.less(t["o_orderdate"], pa.scalar(HI))))
            .select(["o_orderkey", "o_custkey"]),
            batch_format="pyarrow")
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_returnflag", "l_extendedprice",
                "l_discount"]) \
        .map_batches(lambda t: t.filter(pc.equal(
            t["l_returnflag"], pa.scalar("R")))
            .drop_columns(["l_returnflag"]), batch_format="pyarrow")
    j = bucketed_join(li, orders, "l_orderkey", "o_orderkey",
                      n_buckets=16)

    def partial(t: pa.Table) -> pa.Table:
        rev = pc.floor(pc.add(pc.multiply(
            pc.multiply(t["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), t["l_discount"])),
            pa.scalar(10000.0)), pa.scalar(0.5))).cast(pa.int64())
        g = pa.table({"c_custkey": t["o_custkey"], "r": rev}) \
            .group_by("c_custkey").aggregate([("r", "sum")])
        return pa.table({"c_custkey": g["c_custkey"],
                         "revenue_e4": g["r_sum"]})

    per_cust = (j.map_batches(partial, batch_format="pyarrow")
                .groupby("c_custkey").sum("revenue_e4"))
    per_cust = _rename(per_cust, ["c_custkey", "revenue_e4"])

    def topk(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[
            ("revenue_e4", "descending"), ("c_custkey", "ascending")])
        return t.take(idx[:20])

    return (per_cust.map_batches(topk, batch_format="pyarrow")
            .repartition(1)
            .map_batches(topk, batch_format="pyarrow"))


QUERIES["returned_revenue_q10"] = q_returned_revenue_q10
ORACLE_SQL["returned_revenue_q10"] = """
        SELECT o_custkey AS c_custkey,
               SUM(CAST(floor(l_extendedprice * (1 - l_discount)
                              * 10000.0 + 0.5) AS BIGINT))
                   AS revenue_e4
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1995-10-01'
          AND o_orderdate < TIMESTAMP '1996-01-01'
        GROUP BY 1
        ORDER BY revenue_e4 DESC, c_custkey LIMIT 20
    """


def q_volatility_users(sf_dir: str):
    """Per-user L1 volatility: Σ|Δcents| and max|Δ| over consecutive
    events (deterministic tie order) — the successive-difference
    roughness measure. One co-partition; the whole bucket's
    differences come from one shifted subtract with run-boundary
    masking."""
    from geotile.ops.relational import _with_bucket

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"user_id": pd.Series(dtype=np.int64),
                                 "n_steps": pd.Series(dtype=np.int64),
                                 "sum_abs": pd.Series(dtype=np.int64),
                                 "max_abs": pd.Series(dtype=np.int64)})
        u = df["user_id"].to_numpy(np.int64)
        e = df["event_id"].to_numpy(np.int64)
        t = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        c = np.floor(df["value"].to_numpy(np.float64)
                     * 100.0).astype(np.int64)
        o = np.lexsort((e, t, u))
        uu, cu = u[o], c[o]
        same = uu[1:] == uu[:-1]
        d = np.abs(cu[1:] - cu[:-1])[same]
        du = uu[1:][same]
        g = pd.DataFrame({"user_id": du, "d": d}) \
            .groupby("user_id", as_index=False) \
            .agg(n_steps=("d", "size"), sum_abs=("d", "sum"),
                 max_abs=("d", "max"))
        return g

    return (_with_bucket(ev, "user_id", 32)
            .groupby("bucket").map_groups(per_bucket,
                                          batch_format="pandas"))


QUERIES["volatility_users"] = q_volatility_users
ORACLE_SQL["volatility_users"] = """
        WITH x AS (SELECT user_id,
                          CAST(floor(value * 100.0) AS BIGINT)
                          - LAG(CAST(floor(value * 100.0) AS BIGINT))
                            OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS d
                   FROM events)
        SELECT user_id, count(*) AS n_steps,
               CAST(SUM(abs(d)) AS BIGINT) AS sum_abs,
               CAST(MAX(abs(d)) AS BIGINT) AS max_abs
        FROM x WHERE d IS NOT NULL GROUP BY 1
    """


def q_hapax_rate_sources(sf_dir: str):
    """Hapax-legomena audit per source: token occurrences whose token
    appears EXACTLY ONCE in the whole corpus — the vocabulary-tail
    health check for training data. Global token counts reduce to a
    Heaps'-bounded broadcast; each source's hapax hits then ride
    per-batch partials, so the corpus text is read twice but never
    shuffled."""
    docs = _read(sf_dir, "documents", ["source", "text"])

    def toks(t: pa.Table) -> pa.Table:
        w = pc.list_flatten(pc.split_pattern(t["text"], " "))
        w = w.filter(pc.not_equal(w, pa.scalar("")))
        g = pa.table({"token": w}).group_by("token").aggregate(
            [([], "count_all")])
        return pa.table({"token": g["token"],
                         "n": g["count_all"].cast(pa.int64())})

    counts = (docs.map_batches(toks, batch_format="pyarrow")
              .groupby("token").sum("n")).take_all()
    hapax = np.array(sorted(r["token"] for r in counts
                            if r["sum(n)"] == 1))
    ref = ray.put(hapax)

    def per_source(t: pa.Table) -> pa.Table:
        h = _broadcast(ref)
        lists = pc.split_pattern(t["text"], " ")
        flat = pc.list_flatten(lists).to_numpy(zero_copy_only=False)
        lens = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False)
        src = np.repeat(t["source"].to_numpy(zero_copy_only=False),
                        lens)
        keep = flat != ""
        src, flat = src[keep], flat[keep]
        if len(h):
            i = np.minimum(np.searchsorted(h, flat), len(h) - 1)
            is_h = (h[i] == flat).astype(np.int64)
        else:
            is_h = np.zeros(len(flat), np.int64)
        g = pa.table({"source": pa.array(src),
                      "h": pa.array(is_h)}).group_by("source") \
            .aggregate([([], "count_all"), ("h", "sum")])
        return pa.table({"source": g["source"],
                         "n_tokens": g["count_all"].cast(pa.int64()),
                         "n_hapax": g["h_sum"]})

    out = (docs.map_batches(per_source, batch_format="pyarrow")
           .groupby("source").sum(["n_tokens", "n_hapax"]))
    return _rename(out, ["source", "n_tokens", "n_hapax"])


QUERIES["hapax_rate_sources"] = q_hapax_rate_sources
ORACLE_SQL["hapax_rate_sources"] = """
        WITH w AS (SELECT source,
                          unnest(string_split(text, ' ')) AS t
                   FROM documents),
        ww AS (SELECT source, t FROM w WHERE t <> ''),
        c AS (SELECT t, count(*) AS n FROM ww GROUP BY 1)
        SELECT source, count(*) AS n_tokens,
               CAST(count(*) FILTER (c.n = 1) AS BIGINT) AS n_hapax
        FROM ww JOIN c USING (t)
        GROUP BY 1
    """


def q_stream_dedup_ttl(sf_dir: str):
    """Streaming dedup with a TTL window: an event is a duplicate when
    the PREVIOUS event with the same (user, type, cents) key sits
    within one hour — the at-least-once → effectively-once filter of
    an ingestion edge. One user co-partition; the whole bucket's LAG
    over composite keys is one lexsort + shifted compare (no per-key
    state machine); per-day drop counts are calendar-bounded."""
    from geotile.ops.relational import _with_bucket

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id",
                                  "event_type", "value"])
    TTL = 3_600_000_000

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"day": pd.Series(dtype=np.int64),
                                 "n_events": pd.Series(dtype=np.int64),
                                 "n_dropped": pd.Series(dtype=np.int64)})
        u = df["user_id"].to_numpy(np.int64)
        e = df["event_id"].to_numpy(np.int64)
        t = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        ty = df["event_type"].to_numpy()
        c = np.floor(df["value"].to_numpy(np.float64)
                     * 100.0).astype(np.int64)
        o = np.lexsort((e, t, c, ty, u))
        uu, tyu, cu, tu = u[o], ty[o], c[o], t[o]
        same = (uu[1:] == uu[:-1]) & (tyu[1:] == tyu[:-1]) \
            & (cu[1:] == cu[:-1])
        dup = np.r_[False, same & (tu[1:] - tu[:-1] <= TTL)]
        g = pd.DataFrame({"day": tu // 86_400_000_000,
                          "drop": dup.astype(np.int64)}) \
            .groupby("day", as_index=False) \
            .agg(n_events=("drop", "size"), n_dropped=("drop", "sum"))
        return g

    out = (_with_bucket(ev, "user_id", 32)
           .groupby("bucket").map_groups(per_bucket,
                                         batch_format="pandas")
           .groupby("day").sum(["n_events", "n_dropped"]))
    return _rename(out, ["day", "n_events", "n_dropped"])


QUERIES["stream_dedup_ttl"] = q_stream_dedup_ttl
ORACLE_SQL["stream_dedup_ttl"] = """
        WITH x AS (SELECT epoch_us(ts) AS us,
                          epoch_us(ts)
                          - LAG(epoch_us(ts)) OVER (
                              PARTITION BY user_id, event_type,
                                  CAST(floor(value * 100.0) AS BIGINT)
                              ORDER BY ts, event_id) AS gap
                   FROM events)
        SELECT CAST(us // 86400000000 AS BIGINT) AS day,
               count(*) AS n_events,
               CAST(count(*) FILTER (gap IS NOT NULL
                    AND gap <= 3600000000) AS BIGINT) AS n_dropped
        FROM x GROUP BY 1
    """


def q_nation_quarter_qoq(sf_dir: str):
    """Nation × quarter revenue with quarter-over-quarter delta: the
    time-bucketed dimension rollup plus a LAG gathered by one roll of
    the (nation, quarter) aggregate — quarters are calendar-bounded,
    so the window never touches fact rows. Customer nation resolves
    through the bucketed custkey co-partition (fact-scale safe)."""
    from geotile.ops.relational import bucketed_join

    orders = _read(sf_dir, "orders",
                   ["o_custkey", "o_orderdate", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    j = bucketed_join(orders, cust, "o_custkey", "c_custkey",
                      n_buckets=16)

    def partial(t: pa.Table) -> pa.Table:
        day = pc.divide(t["o_orderdate"].cast(pa.int64()),
                        pa.scalar(86_400_000_000, pa.int64()))
        q = pc.add(pc.multiply(pc.year(t["o_orderdate"]),
                               pa.scalar(4, pa.int64())),
                   pc.divide(pc.subtract(pc.month(t["o_orderdate"]),
                                         pa.scalar(1, pa.int64())),
                             pa.scalar(3, pa.int64())))
        _ = day
        cents = pc.floor(pc.add(pc.multiply(
            t["o_totalprice"], pa.scalar(100.0)),
            pa.scalar(0.5))).cast(pa.int64())
        g = pa.table({"nk": t["c_nationkey"].cast(pa.int64()),
                      "q": q, "c": cents}).group_by(["nk", "q"]) \
            .aggregate([("c", "sum")])
        return pa.table({"nk": g["nk"], "q": g["q"],
                         "cents": g["c_sum"]})

    agg = (j.map_batches(partial, batch_format="pyarrow")
           .groupby(["nk", "q"]).sum("cents")).take_all()
    rows = sorted(agg, key=lambda r: (r["nk"], r["q"]))
    out = []
    for i, r in enumerate(rows):
        prev = rows[i - 1] if i else None
        delta = (r["sum(cents)"] - prev["sum(cents)"]
                 if prev and prev["nk"] == r["nk"]
                 and prev["q"] == r["q"] - 1 else None)
        out.append({"n_nationkey": r["nk"], "quarter": r["q"],
                    "revenue_cents": r["sum(cents)"],
                    "qoq_delta": -1 if delta is None else delta})
    return pd.DataFrame(out)


QUERIES["nation_quarter_qoq"] = q_nation_quarter_qoq
ORACLE_SQL["nation_quarter_qoq"] = """
        WITH a AS (SELECT CAST(c_nationkey AS BIGINT) AS nk,
                          CAST(EXTRACT(year FROM o_orderdate) * 4
                               + (EXTRACT(month FROM o_orderdate) - 1)
                                 // 3 AS BIGINT) AS q,
                          SUM(CAST(floor(o_totalprice * 100.0 + 0.5)
                                   AS BIGINT)) AS cents
                   FROM orders JOIN customer ON o_custkey = c_custkey
                   GROUP BY 1, 2),
        d AS (SELECT nk, q, cents,
                     CASE WHEN LAG(q) OVER w = q - 1
                          THEN cents - LAG(cents) OVER w
                          ELSE -1 END AS qoq_delta
              FROM a WINDOW w AS (PARTITION BY nk ORDER BY q))
        SELECT nk AS n_nationkey, q AS quarter,
               CAST(cents AS BIGINT) AS revenue_cents,
               CAST(qoq_delta AS BIGINT) AS qoq_delta
        FROM d
    """


def q_growth_accounting_quarters(sf_dir: str):
    """Growth accounting (new / retained / resurrected): each active
    (customer, quarter) classified by that customer's PREVIOUS active
    quarter — first-ever = new, exactly-previous = retained, gap ≥ 2
    = resurrected — the product-analytics ledger. Distinct
    (cust, quarter) pairs dedup once; each customer's classification
    is one shifted compare inside a customer co-partition; quarter
    ledger rows are calendar-bounded."""
    from geotile.ops.relational import _with_bucket

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def pairs(t: pa.Table) -> pa.Table:
        q = pc.add(pc.multiply(pc.year(t["o_orderdate"]),
                               pa.scalar(4, pa.int64())),
                   pc.divide(pc.subtract(pc.month(t["o_orderdate"]),
                                         pa.scalar(1, pa.int64())),
                             pa.scalar(3, pa.int64())))
        k = pc.add(pc.multiply(t["o_custkey"],
                               pa.scalar(1 << 16, pa.int64())), q)
        return pa.table({"k": k}).group_by("k").aggregate([])

    ded = (orders.map_batches(pairs, batch_format="pyarrow")
           .groupby("k").count())

    def unpack(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy()
        return pa.table({"cust": pa.array(k >> 16),
                         "q": pa.array(k & 0xFFFF)})

    cq = ded.map_batches(unpack, batch_format="pyarrow")

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"quarter": pd.Series(dtype=np.int64),
                                 "n_new": pd.Series(dtype=np.int64),
                                 "n_retained": pd.Series(dtype=np.int64),
                                 "n_resurrected":
                                     pd.Series(dtype=np.int64)})
        c = df["cust"].to_numpy(np.int64)
        q = df["q"].to_numpy(np.int64)
        o = np.lexsort((q, c))
        cc, qq = c[o], q[o]
        first = np.r_[True, cc[1:] != cc[:-1]]
        prev_q = np.r_[np.int64(0), qq[:-1]]
        retained = ~first & (qq == prev_q + 1)
        resurrected = ~first & (qq >= prev_q + 2)
        g = pd.DataFrame({"quarter": qq,
                          "n_new": first.astype(np.int64),
                          "n_retained": retained.astype(np.int64),
                          "n_resurrected":
                              resurrected.astype(np.int64)}) \
            .groupby("quarter", as_index=False).sum()
        return g

    out = (_with_bucket(cq, "cust", 32)
           .groupby("bucket").map_groups(classify,
                                         batch_format="pandas")
           .groupby("quarter").sum(["n_new", "n_retained",
                                    "n_resurrected"]))
    return _rename(out, ["quarter", "n_new", "n_retained",
                         "n_resurrected"])


QUERIES["growth_accounting_quarters"] = q_growth_accounting_quarters
ORACLE_SQL["growth_accounting_quarters"] = """
        WITH cq AS (SELECT DISTINCT o_custkey AS cust,
                           CAST(EXTRACT(year FROM o_orderdate) * 4
                                + (EXTRACT(month FROM o_orderdate) - 1)
                                  // 3 AS BIGINT) AS q
                    FROM orders),
        x AS (SELECT cust, q,
                     LAG(q) OVER (PARTITION BY cust ORDER BY q) AS pq
              FROM cq)
        SELECT q AS quarter,
               CAST(count(*) FILTER (pq IS NULL) AS BIGINT) AS n_new,
               CAST(count(*) FILTER (pq = q - 1) AS BIGINT)
                   AS n_retained,
               CAST(count(*) FILTER (pq IS NOT NULL AND pq <= q - 2)
                    AS BIGINT) AS n_resurrected
        FROM x GROUP BY 1
    """


def q_cell_dominant_stop(sf_dir: str):
    """GIS majority filter: each occupied res-10 cell's DOMINANT
    caption stop (most images; ties to the smaller stop id) — the
    categorical raster a choropleth renders. (cell, stop) count
    partials bound the shuffle; the per-cell argmax resolves inside
    a cell co-partition lexsort, never a global rank."""
    from geotile.geom import cells
    from geotile.ops.tiles import read_image_table

    ds = read_image_table(_image_dir_for(sf_dir),
                          columns=["caption", "lon", "lat"])

    def part(t: pa.Table) -> pa.Table:
        stop = pc.cast(pc.list_element(
            pc.split_pattern(t["caption"], " "), 4), pa.int64())
        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        cell = cells.encode(lon, lat, 10).view(np.int64)
        g = pa.table({"cell": pa.array(cell), "stop": stop}) \
            .group_by(["cell", "stop"]).aggregate([([], "count_all")])
        return pa.table({"cell": g["cell"], "stop": g["stop"],
                         "n": g["count_all"].cast(pa.int64())})

    counts = (ds.map_batches(part, batch_format="pyarrow")
              .groupby(["cell", "stop"]).sum("n"))
    counts = _rename(counts, ["cell", "stop", "n"])

    def argmax(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"cell": pd.Series(dtype=np.int64),
                                 "stop": pd.Series(dtype=np.int64),
                                 "n": pd.Series(dtype=np.int64)})
        c = df["cell"].to_numpy(np.int64)
        s = df["stop"].to_numpy(np.int64)
        n = df["n"].to_numpy(np.int64)
        o = np.lexsort((s, -n, c))
        c, s, n = c[o], s[o], n[o]
        first = np.r_[True, c[1:] != c[:-1]]
        return pd.DataFrame({"cell": c[first], "stop": s[first],
                             "n": n[first]})

    from geotile.ops.relational import _with_bucket

    return (_with_bucket(counts, "cell", 16)
            .groupby("bucket").map_groups(argmax,
                                          batch_format="pandas"))


QUERIES["cell_dominant_stop"] = q_cell_dominant_stop


def _cell_dominant_sql(img_dir: str) -> str:
    return f"""
        WITH c AS (SELECT {_sql_cell('lon', 'lat', 10)} AS cell,
                          CAST(string_split(caption, ' ')[5] AS BIGINT)
                              AS stop,
                          count(*) AS n
                   FROM read_parquet('{img_dir}/part-*.parquet')
                   GROUP BY 1, 2),
        r AS (SELECT cell, stop, n,
                     ROW_NUMBER() OVER (PARTITION BY cell
                         ORDER BY n DESC, stop) AS rk
              FROM c)
        SELECT cell, stop, CAST(n AS BIGINT) AS n FROM r WHERE rk = 1
    """


def q_calibration_bins_embeddings(sf_dir: str):
    """Model calibration bins: score every embedding with the
    deterministic linear model, split the corpus into ten
    equal-count bins by score rank (exact NTILE semantics over the
    order-aligned distributed row number — no sort), and report each
    bin's exact positive-label mass — the reliability-diagram input.
    Scores are int64-exact on the trunc lattice; label 'positive' is
    label ≥ 5."""
    from geotile.ops.relational import global_row_number

    emb = _read(sf_dir, "embeddings", ["vec_id", "label", "embedding"])

    def score(t: pa.Table) -> pa.Table:
        col = t["embedding"].combine_chunks()
        n = len(col)
        if n == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64())})
        vals = col.values.to_numpy(zero_copy_only=False)
        d = len(vals) // n
        q = np.trunc(vals.reshape(n, d).astype(np.float64) * 10000.0)
        j = np.arange(d, dtype=np.int64)
        w = ((j + 1) * 2654435761 % 2001 - 1000).astype(np.float64)
        s = (q @ w).astype(np.int64)
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"vec_id": t["vec_id"],
                         "score": pa.array(s),
                         "pos": pa.array((lab >= 5).astype(np.int64))})

    scored = emb.map_batches(score, batch_format="pyarrow")

    def shift_nonneg(t: pa.Table) -> pa.Table:
        # global_row_number wants non-negative vals: |score| < 64·10⁷,
        # so a constant literal shift keeps order and stays exact
        return pa.table({"vec_id": t["vec_id"],
                         "score": pc.add(t["score"],
                                         pa.scalar(1 << 40, pa.int64())),
                         "pos": t["pos"]})

    scored = scored.map_batches(shift_nonneg,
                                batch_format="pyarrow").materialize()
    n_total = scored.count()
    ranked = global_row_number(scored, "score", "vec_id", shift=32)

    def bins(t: pa.Table) -> pa.Table:
        b = _ntile_of(t["idx"].to_numpy(), n_total, 10)
        g = pa.table({"bin": pa.array(b), "pos": t["pos"]}) \
            .group_by("bin").aggregate(
                [([], "count_all"), ("pos", "sum")])
        return pa.table({"bin": g["bin"],
                         "n": g["count_all"].cast(pa.int64()),
                         "n_pos": g["pos_sum"]})

    out = (ranked.map_batches(bins, batch_format="pyarrow")
           .groupby("bin").sum(["n", "n_pos"]))
    return _rename(out, ["bin", "n", "n_pos"])


QUERIES["calibration_bins_embeddings"] = q_calibration_bins_embeddings
ORACLE_SQL["calibration_bins_embeddings"] = """
        WITH e AS (SELECT vec_id, label,
                          unnest(range(len(embedding))) AS j,
                          CAST(trunc(CAST(unnest(embedding) AS DOUBLE)
                                     * 10000) AS BIGINT) AS q
                   FROM embeddings),
        s AS (SELECT vec_id, max(label) AS label,
                     CAST(SUM(q * ((j + 1) * 2654435761 % 2001
                                   - 1000)) AS BIGINT) AS score
              FROM e GROUP BY 1),
        r AS (SELECT vec_id, label,
                     NTILE(10) OVER (ORDER BY score, vec_id) AS bin
              FROM s)
        SELECT CAST(bin AS BIGINT) AS bin, count(*) AS n,
               CAST(count(*) FILTER (label >= 5) AS BIGINT) AS n_pos
        FROM r GROUP BY 1
    """


def q_hhi_nations(sf_dir: str):
    """Market-concentration HHI per nation: Σ(customer revenue
    share)² in ppm — the antitrust curve over the customer base.
    Exact integer parts (per-customer cents ride ONE custkey
    shuffle, nation sums a second 25-row one); the final ppm goes
    through the IEEE-double floor path that matches DuckDB
    bit-for-bit. Customer nation attaches via broadcast."""
    from geotile.ops.relational import bucketed_join

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def per_cust(t: pa.Table) -> pa.Table:
        cents = pc.floor(pc.add(pc.multiply(
            t["o_totalprice"], pa.scalar(100.0)),
            pa.scalar(0.5))).cast(pa.int64())
        g = pa.table({"ck": t["o_custkey"], "c": cents}) \
            .group_by("ck").aggregate([("c", "sum")])
        return pa.table({"ck": g["ck"], "c": g["c_sum"]})

    pc_rev = (orders.map_batches(per_cust, batch_format="pyarrow")
              .groupby("ck").sum("c"))
    pc_rev = _rename(pc_rev, ["ck", "c"]).materialize()

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    j = bucketed_join(pc_rev, cust, "ck", "c_custkey", n_buckets=16)

    def nation_parts(t: pa.Table) -> pa.Table:
        c = t["c"].to_numpy(zero_copy_only=False)
        g = pa.table({"nk": t["c_nationkey"].cast(pa.int64()),
                      "s": pa.array(c), "ssq": pa.array(c * c)}) \
            .group_by("nk").aggregate(
                [([], "count_all"), ("s", "sum"), ("ssq", "sum")])
        return pa.table({"n_nationkey": g["nk"],
                         "n_cust": g["count_all"].cast(pa.int64()),
                         "sum_cents": g["s_sum"],
                         "ssq": g["ssq_sum"]})

    agg = (j.map_batches(nation_parts, batch_format="pyarrow")
           .groupby("n_nationkey").sum(["n_cust", "sum_cents",
                                        "ssq"])).take_all()
    rows = []
    for r in sorted(agg, key=lambda r: r["n_nationkey"]):
        s, ssq = r["sum(sum_cents)"], r["sum(ssq)"]
        hhi = int(np.floor(np.float64(ssq) * 1000000.0
                           / (np.float64(s) * np.float64(s)) + 0.5))
        rows.append({"n_nationkey": r["n_nationkey"],
                     "n_cust": r["sum(n_cust)"], "sum_cents": s,
                     "hhi_ppm": hhi})
    return pd.DataFrame(rows)


QUERIES["hhi_nations"] = q_hhi_nations
ORACLE_SQL["hhi_nations"] = """
        WITH pc AS (SELECT o_custkey,
                           SUM(CAST(floor(o_totalprice * 100.0 + 0.5)
                                    AS BIGINT)) AS c
                    FROM orders GROUP BY 1),
        n AS (SELECT CAST(c_nationkey AS BIGINT) AS nk, pc.c
              FROM pc JOIN customer ON o_custkey = c_custkey)
        SELECT nk AS n_nationkey, count(*) AS n_cust,
               CAST(SUM(c) AS BIGINT) AS sum_cents,
               CAST(floor(CAST(SUM(c * c) AS DOUBLE) * 1000000.0
                          / (CAST(SUM(c) AS DOUBLE)
                             * CAST(SUM(c) AS DOUBLE)) + 0.5)
                    AS BIGINT) AS hhi_ppm
        FROM n GROUP BY 1
    """


def q_bigram_coverage_langs(sf_dir: str):
    """Held-out n-gram coverage: split the corpus by doc parity
    (even = train, odd = test), build the train bigram vocabulary
    once (Heaps-bounded broadcast), and measure per language how many
    test bigram occurrences the train side already knows — the OOV
    audit before an n-gram LM ships. Bigrams keep top_bigrams'
    convention (raw adjacent split tokens). Corpus text is read
    twice, shuffled never."""
    docs = _read(sf_dir, "documents", ["doc_id", "lang", "text"])

    def bigrams_of(t: pa.Table):
        lists = pc.split_pattern(t["text"], " ")
        flat = pc.list_flatten(lists).to_numpy(zero_copy_only=False)
        lens = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(t)), lens)
        # adjacent within the same doc
        same = doc_idx[1:] == doc_idx[:-1]
        left = flat[:-1][same]
        right = flat[1:][same]
        bg = np.char.add(np.char.add(left.astype(str), " "),
                         right.astype(str))
        return bg, doc_idx[:-1][same]

    def train_part(t: pa.Table) -> pa.Table:
        even = pc.equal(pc.bit_wise_and(t["doc_id"], pa.scalar(1)),
                        pa.scalar(0))
        f = t.filter(even)
        if len(f) == 0:
            return pa.table({"bg": pa.array([], pa.string())})
        bg, _ = bigrams_of(f)
        return pa.table({"bg": pa.array(np.unique(bg))}) \
            .group_by("bg").aggregate([])

    vocab_rows = (docs.map_batches(train_part, batch_format="pyarrow")
                  .groupby("bg").count()).take_all()
    vocab = np.array(sorted(r["bg"] for r in vocab_rows))
    ref = ray.put(vocab)

    def test_part(t: pa.Table) -> pa.Table:
        odd = pc.equal(pc.bit_wise_and(t["doc_id"], pa.scalar(1)),
                       pa.scalar(1))
        f = t.filter(odd)
        if len(f) == 0:
            return pa.table({"lang": pa.array([], pa.string()),
                             "n_bigrams": pa.array([], pa.int64()),
                             "n_covered": pa.array([], pa.int64())})
        v = _broadcast(ref)
        bg, dmap = bigrams_of(f)
        lang = f["lang"].to_numpy(zero_copy_only=False)[dmap]
        if len(v):
            i = np.minimum(np.searchsorted(v, bg), len(v) - 1)
            cov = (v[i] == bg).astype(np.int64)
        else:
            cov = np.zeros(len(bg), np.int64)
        g = pa.table({"lang": pa.array(lang),
                      "c": pa.array(cov)}).group_by("lang") \
            .aggregate([([], "count_all"), ("c", "sum")])
        return pa.table({"lang": g["lang"],
                         "n_bigrams": g["count_all"].cast(pa.int64()),
                         "n_covered": g["c_sum"]})

    out = (docs.map_batches(test_part, batch_format="pyarrow")
           .groupby("lang").sum(["n_bigrams", "n_covered"]))
    return _rename(out, ["lang", "n_bigrams", "n_covered"])


QUERIES["bigram_coverage_langs"] = q_bigram_coverage_langs
ORACLE_SQL["bigram_coverage_langs"] = """
        WITH t AS (SELECT doc_id, lang,
                          string_split(text, ' ') AS tk
                   FROM documents),
        b AS (SELECT doc_id, lang,
                     tk[CAST(u + 1 AS BIGINT)] || ' '
                     || tk[CAST(u + 2 AS BIGINT)] AS bg
              FROM t, UNNEST(range(len(tk) - 1)) s(u)
              WHERE len(tk) > 1),
        train AS (SELECT DISTINCT bg FROM b WHERE doc_id % 2 = 0)
        SELECT lang, count(*) AS n_bigrams,
               CAST(count(*) FILTER (bg IN (SELECT bg FROM train))
                    AS BIGINT) AS n_covered
        FROM b WHERE doc_id % 2 = 1
        GROUP BY 1
    """


def q_segment_octants_routes(sf_dir: str):
    """Route-bearing octant histogram: every centerline segment of
    every fixture route classified into one of eight compass octants
    using ONLY sign/magnitude compares in the meter frame (no atan2 —
    libm-free, so the SQL replay over the segments sidecar is exact
    by construction). The polyline set distributes as a segments
    dataset; partials are route×8."""
    from geotile.geom.buffer import meter_frame
    from geotile.ops.join import (_ANCHOR_LAT, _ANCHOR_LON,
                                  route_polylines)

    mx, my = meter_frame(_ANCHOR_LAT)
    lines = route_polylines(_fixture_ctx())
    cols = {"route_id": [], "dx": [], "dy": []}
    for rid in sorted(lines):
        for part in lines[rid]:
            m = np.column_stack([(part[:, 0] - _ANCHOR_LON) * mx,
                                 (part[:, 1] - _ANCHOR_LAT) * my])
            cols["route_id"].extend([rid] * (len(m) - 1))
            cols["dx"].append(m[1:, 0] - m[:-1, 0])
            cols["dy"].append(m[1:, 1] - m[:-1, 1])
    segs = rd.from_arrow(pa.table({
        "route_id": pa.array(cols["route_id"], pa.string()),
        "dx": pa.array(np.concatenate(cols["dx"])),
        "dy": pa.array(np.concatenate(cols["dy"]))}))

    def octant(t: pa.Table) -> pa.Table:
        dx = t["dx"].to_numpy(zero_copy_only=False)
        dy = t["dy"].to_numpy(zero_copy_only=False)
        o = ((dy < 0).astype(np.int64) * 4
             + (dx < 0).astype(np.int64) * 2
             + (np.abs(dx) < np.abs(dy)).astype(np.int64))
        g = pa.table({"route_id": t["route_id"],
                      "octant": pa.array(o)}) \
            .group_by(["route_id", "octant"]).aggregate(
                [([], "count_all")])
        return pa.table({"route_id": g["route_id"],
                         "octant": g["octant"],
                         "n_segments": g["count_all"].cast(pa.int64())})

    out = (segs.map_batches(octant, batch_format="pyarrow")
           .groupby(["route_id", "octant"]).sum("n_segments"))
    return _rename(out, ["route_id", "octant", "n_segments"])


QUERIES["segment_octants_routes"] = q_segment_octants_routes


def _segment_octants_sql() -> str:
    return f"""
        SELECT route_id,
               CAST(CAST(dy < 0 AS INT) * 4 + CAST(dx < 0 AS INT) * 2
                    + CAST(abs(dx) < abs(dy) AS INT) AS BIGINT)
                   AS octant,
               count(*) AS n_segments
        FROM read_parquet('{_oracle_segments_path()}')
        GROUP BY 1, 2
    """


def q_unigram_l1_langs(sf_dir: str):
    """Exact distribution divergence without a single float: the L1
    distance between the en and de unigram distributions computed on
    the CROSS-SCALED integer lattice Σ|n_en·N_de − n_de·N_en| — the
    corpus-drift check between two language shards. Token counts ride
    one vocab-cardinality shuffle; the epilogue is vocab-sized.
    Domain bound: n·N < 2⁶³ holds to ~3·10⁹ tokens per shard —
    beyond that, pre-scale by gcd or move to Python ints in the
    epilogue."""
    docs = _read(sf_dir, "documents", ["lang", "text"])

    def counts(t: pa.Table) -> pa.Table:
        f = t.filter(pc.is_in(t["lang"],
                              value_set=pa.array(["en", "de"])))
        if len(f) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "n1": pa.array([], pa.int64()),
                             "n2": pa.array([], pa.int64())})
        lists = pc.split_pattern(f["text"], " ")
        flat = pc.list_flatten(lists).to_numpy(zero_copy_only=False)
        lens = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False)
        lang = np.repeat(f["lang"].to_numpy(zero_copy_only=False),
                         lens)
        keep = flat != ""
        flat, lang = flat[keep], lang[keep]
        is_en = (lang == "en").astype(np.int64)
        g = pa.table({"token": pa.array(flat),
                      "n1": pa.array(is_en),
                      "n2": pa.array(1 - is_en)}).group_by("token") \
            .aggregate([("n1", "sum"), ("n2", "sum")])
        return pa.table({"token": g["token"], "n1": g["n1_sum"],
                         "n2": g["n2_sum"]})

    agg = (docs.map_batches(counts, batch_format="pyarrow")
           .groupby("token").sum(["n1", "n2"])).take_all()
    n1 = np.array([r["sum(n1)"] for r in agg], dtype=np.int64)
    n2 = np.array([r["sum(n2)"] for r in agg], dtype=np.int64)
    N1, N2 = int(n1.sum()), int(n2.sum())
    l1 = int(np.abs(n1 * N2 - n2 * N1).sum())
    return pd.DataFrame({"n_en": [N1], "n_de": [N2],
                         "l1_cross": [l1]})


QUERIES["unigram_l1_langs"] = q_unigram_l1_langs
ORACLE_SQL["unigram_l1_langs"] = """
        WITH w AS (SELECT lang, unnest(string_split(text, ' ')) AS t
                   FROM documents WHERE lang IN ('en', 'de')),
        c AS (SELECT t,
                     count(*) FILTER (lang = 'en') AS n1,
                     count(*) FILTER (lang = 'de') AS n2
              FROM w WHERE t <> '' GROUP BY 1),
        tt AS (SELECT SUM(n1) AS t1, SUM(n2) AS t2 FROM c)
        SELECT CAST(any_value(t1) AS BIGINT) AS n_en,
               CAST(any_value(t2) AS BIGINT) AS n_de,
               CAST(SUM(abs(n1 * t2 - n2 * t1)) AS BIGINT) AS l1_cross
        FROM c, tt
    """


def q_business_lead_hist(sf_dir: str):
    """Business-day lead-time histogram (order date → ship date,
    weekends excluded): the calendar arithmetic runs entirely in the
    closed form bizdays = span − (G(d₂) − G(d₁)) with
    G(d) = 2·((d+4)//7) + max(0, (d+4)%7 − 5) — integer //,%,max
    only, identical in numpy and SQL, verified against a brute scan.
    One bucketed orderkey co-partition carries the pair; the
    histogram is lead-time-cardinality."""
    from geotile.ops.relational import bucketed_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    j = bucketed_join(li, orders, "l_orderkey", "o_orderkey",
                      n_buckets=16)

    def hist(t: pa.Table) -> pa.Table:
        d2 = (t["l_shipdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False) // 86_400_000_000)
        d1 = (t["o_orderdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False) // 86_400_000_000)

        def G(d):
            m = d + 4
            return 2 * (m // 7) + np.maximum(0, m % 7 - 5)

        biz = (d2 - d1) - (G(d2) - G(d1))
        g = pa.table({"biz_days": pa.array(biz)}).group_by(
            "biz_days").aggregate([([], "count_all")])
        return pa.table({"biz_days": g["biz_days"],
                         "n_items": g["count_all"].cast(pa.int64())})

    out = (j.map_batches(hist, batch_format="pyarrow")
           .groupby("biz_days").sum("n_items"))
    return _rename(out, ["biz_days", "n_items"])


QUERIES["business_lead_hist"] = q_business_lead_hist
ORACLE_SQL["business_lead_hist"] = """
        WITH d AS (SELECT epoch_us(o_orderdate) // 86400000000 AS d1,
                          epoch_us(l_shipdate) // 86400000000 AS d2
                   FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        SELECT CAST((d2 - d1)
                    - ((2 * ((d2 + 4) // 7)
                        + greatest(0, (d2 + 4) % 7 - 5))
                       - (2 * ((d1 + 4) // 7)
                          + greatest(0, (d1 + 4) % 7 - 5)))
                    AS BIGINT) AS biz_days,
               count(*) AS n_items
        FROM d GROUP BY 1
    """


def q_transition_dwell_matrix(sf_dir: str):
    """Dwell-weighted transition matrix: for each (from-type,
    to-type) adjacent pair inside a user's stream, the count AND the
    exact total dwell microseconds spent in the from-state — the
    Markov chain with holding times. One user co-partition; pairs and
    dwells come from one shifted compare over the lexsorted bucket;
    the matrix is 5×5 partials."""
    from geotile.ops.relational import _with_bucket

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id",
                                  "event_type"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"from_type": pd.Series(dtype=object),
                                 "to_type": pd.Series(dtype=object),
                                 "n": pd.Series(dtype=np.int64),
                                 "dwell_us": pd.Series(dtype=np.int64)})
        u = df["user_id"].to_numpy(np.int64)
        e = df["event_id"].to_numpy(np.int64)
        t = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        ty = df["event_type"].to_numpy()
        o = np.lexsort((e, t, u))
        uu, tu, tyu = u[o], t[o], ty[o]
        same = uu[1:] == uu[:-1]
        g = pd.DataFrame({"from_type": tyu[:-1][same],
                          "to_type": tyu[1:][same],
                          "dwell_us": (tu[1:] - tu[:-1])[same]}) \
            .groupby(["from_type", "to_type"], as_index=False) \
            .agg(n=("dwell_us", "size"), dwell_us=("dwell_us", "sum"))
        return g

    out = (_with_bucket(ev, "user_id", 32)
           .groupby("bucket").map_groups(per_bucket,
                                         batch_format="pandas")
           .groupby(["from_type", "to_type"]).sum(["n", "dwell_us"]))
    return _rename(out, ["from_type", "to_type", "n", "dwell_us"])


QUERIES["transition_dwell_matrix"] = q_transition_dwell_matrix
ORACLE_SQL["transition_dwell_matrix"] = """
        WITH s AS (SELECT user_id, event_type,
                          LEAD(event_type) OVER w AS nxt,
                          LEAD(epoch_us(ts)) OVER w - epoch_us(ts)
                              AS dwell
                   FROM events
                   WINDOW w AS (PARTITION BY user_id
                                ORDER BY ts, event_id))
        SELECT event_type AS from_type, nxt AS to_type,
               count(*) AS n, CAST(SUM(dwell) AS BIGINT) AS dwell_us
        FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2
    """


def q_abc_classification_customers(sf_dir: str):
    """ABC (Pareto) classification: customers ranked by revenue
    descending, class A while the running total stays ≤ 80% of the
    grand total, B to 95%, C after — counts and revenue per class
    WITHOUT ranking a row. Equal-revenue runs split arithmetically
    (within a tied run the r-th rank's cum is base + r·c, so the
    crossing rank is one ceil-division) — the histogram scan gives
    the same counts as the per-rank window, tie order provably
    irrelevant. Thresholds compare as 5·cum vs 4·T and 20·cum vs
    19·T, all integer."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def per_cust(t: pa.Table) -> pa.Table:
        cents = pc.floor(pc.add(pc.multiply(
            t["o_totalprice"], pa.scalar(100.0)),
            pa.scalar(0.5))).cast(pa.int64())
        g = pa.table({"ck": t["o_custkey"], "c": cents}) \
            .group_by("ck").aggregate([("c", "sum")])
        return pa.table({"ck": g["ck"], "c": g["c_sum"]})

    rev = (orders.map_batches(per_cust, batch_format="pyarrow")
           .groupby("ck").sum("c"))

    def hist(t: pa.Table) -> pa.Table:
        g = pa.table({"c": t["sum(c)"]}).group_by("c").aggregate(
            [([], "count_all")])
        return pa.table({"c": g["c"],
                         "n": g["count_all"].cast(pa.int64())})

    rows = (rev.map_batches(hist, batch_format="pyarrow")
            .groupby("c").sum("n")).take_all()
    c = np.array([r["c"] for r in rows], dtype=np.int64)
    n = np.array([r["sum(n)"] for r in rows], dtype=np.int64)
    o = np.argsort(-c)
    c, n = c[o], n[o]
    T = int((c * n).sum())
    cum_before = np.r_[0, np.cumsum(c * n)[:-1]]
    cnt_before = np.r_[0, np.cumsum(n)[:-1]]

    def crossing(num: int, den: int) -> int:
        """# of ranks (desc order) whose running total · den ≤ num · T."""
        thresh = num * T
        full = den * (cum_before + c * n) <= thresh
        k = int(n[full].sum())
        j = int(full.sum())  # first bucket not fully inside
        if j < len(c) and den * cum_before[j] <= thresh and c[j] > 0:
            k += min(int(n[j]),
                     int((thresh - den * cum_before[j])
                         // (den * c[j])))
        return k

    a = crossing(4, 5)
    b = crossing(19, 20)
    total_n = int(n.sum())

    def rev_of(k: int) -> int:
        full = cnt_before + n <= k
        s = int((c[full] * n[full]).sum())
        j = int(full.sum())
        if j < len(c):
            s += int(c[j]) * (k - int(n[full].sum()))
        return s

    ra, rb = rev_of(a), rev_of(b)
    return pd.DataFrame([
        {"cls": "A", "n_customers": a, "revenue_cents": ra},
        {"cls": "B", "n_customers": b - a, "revenue_cents": rb - ra},
        {"cls": "C", "n_customers": total_n - b,
         "revenue_cents": T - rb}])


QUERIES["abc_classification_customers"] = q_abc_classification_customers
ORACLE_SQL["abc_classification_customers"] = """
        WITH pc AS (SELECT o_custkey,
                           SUM(CAST(floor(o_totalprice * 100.0 + 0.5)
                                    AS BIGINT)) AS c
                    FROM orders GROUP BY 1),
        r AS (SELECT c,
                     SUM(c) OVER (ORDER BY c DESC, o_custkey
                                  ROWS UNBOUNDED PRECEDING) AS cum,
                     SUM(c) OVER () AS t
              FROM pc),
        k AS (SELECT c,
                     CASE WHEN 5 * cum <= 4 * t THEN 'A'
                          WHEN 20 * cum <= 19 * t THEN 'B'
                          ELSE 'C' END AS cls
              FROM r)
        SELECT cls, count(*) AS n_customers,
               CAST(SUM(c) AS BIGINT) AS revenue_cents
        FROM k GROUP BY 1
    """


_SF_VIDEO_ROWS = {"sf0.001": 32, "sf0.01": 128, "sf0.1": 512}


def _video_dir_for(sf_dir: str) -> str:
    import os
    from pathlib import Path

    from geotile.synth import make_video_table

    sf_name = Path(sf_dir).name
    n = _SF_VIDEO_ROWS.get(sf_name, 32)
    out = Path(os.environ.get("GEOTILE_CACHE",
                              "/tmp/geotile_cache")) / f"video_{sf_name}"
    make_video_table(n, out)
    return str(out)


def q_video_frame_sums(sf_dir: str):
    """Video-modality frame sampling: decode each clip's raw frame
    sequence, keep every 4th frame, emit exact integer pixel sums per
    sampled frame (ops/video.py VideoFrameStage — real actor-pool
    plumbing, honest 'rawseq' codec, NotImplementedError gate for the
    rest). Oracle: generator-replay sidecar rederives every sampled
    frame independently from synth.pixel_pattern with a python-int
    sum."""
    from geotile.ops.video import VideoFrameStage, read_video_table

    ds = read_video_table(_video_dir_for(sf_dir))
    return ds.map_batches(
        VideoFrameStage, batch_format="pyarrow", batch_size=32,
        concurrency=2,
    )


QUERIES["video_frame_sums"] = q_video_frame_sums


def _video_sums_sidecar(vid: str) -> str:
    """Generator replay for video_frame_sums: every sampled frame is
    rederived directly (clip·64 + frame index into pixel_pattern) and
    summed with python ints. Content-keyed on synth.py."""
    import geotile.synth as _sy
    import pyarrow.parquet as pq
    from pathlib import Path

    p = _oracle_cache_dir() / (
        f"oracle_videosums_{Path(vid).name}_{_mods_digest(_sy)}.parquet"
    )
    if not p.exists():
        t = pq.read_table(vid, columns=["clip_id", "n_frames"])
        ids = np.sort(t["clip_id"].to_numpy(zero_copy_only=False))
        nf = int(t["n_frames"][0].as_py())
        rows = []
        for cid in ids.tolist():
            for f in range(0, nf, 4):
                px = _sy.pixel_pattern(
                    np.array([cid * 64 + f], np.uint64),
                    _sy.VIDEO_W, _sy.VIDEO_H)[0]
                rows.append({"clip_id": cid, "frame_idx": f,
                             "pixel_sum": int(sum(
                                 int(v) for v in px.ravel().tolist()))})
        out = pa.Table.from_pylist(rows)
        _oracle_cache_dir().mkdir(parents=True, exist_ok=True)
        _atomic_write_table(out, p)
    return str(p)


def _video_sums_sql(vid: str) -> str:
    return (f"SELECT clip_id, frame_idx, pixel_sum "
            f"FROM read_parquet('{_video_sums_sidecar(vid)}')")


def q_supplier_mad_nations(sf_dir: str):
    """Grouped robust statistics: per nation the LOWER-median supplier
    balance and the median absolute deviation around it — two nested
    order statistics computed where the group lives (one nation
    co-partition, sorted-gather per group; no global rank). Balances
    on the exact cents lattice; the SQL replay selects both medians
    with deterministic ROW_NUMBER offsets."""
    from geotile.ops.relational import _with_bucket

    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey",
                                     "s_acctbal"])

    def prep(t: pa.Table) -> pa.Table:
        cents = pc.floor(pc.add(pc.multiply(
            t["s_acctbal"], pa.scalar(100.0)),
            pa.scalar(0.5))).cast(pa.int64())
        return pa.table({"nk": t["s_nationkey"].cast(pa.int64()),
                         "sk": t["s_suppkey"], "c": cents})

    ds = sup.map_batches(prep, batch_format="pyarrow")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"n_nationkey": pd.Series(dtype=np.int64),
                                 "n_supp": pd.Series(dtype=np.int64),
                                 "median_cents":
                                     pd.Series(dtype=np.int64),
                                 "mad_cents": pd.Series(dtype=np.int64)})
        rows = []
        for nk, g in df.groupby("nk"):
            c = np.sort(g["c"].to_numpy(np.int64))
            med = int(c[(len(c) - 1) // 2])
            dev = np.sort(np.abs(c - med))
            rows.append({"n_nationkey": np.int64(nk), "n_supp": len(c),
                         "median_cents": med,
                         "mad_cents": int(dev[(len(dev) - 1) // 2])})
        return pd.DataFrame(rows)

    return (_with_bucket(ds, "nk", 8)
            .groupby("bucket").map_groups(per_bucket,
                                          batch_format="pandas"))


QUERIES["supplier_mad_nations"] = q_supplier_mad_nations
ORACLE_SQL["supplier_mad_nations"] = """
        WITH c AS (SELECT CAST(s_nationkey AS BIGINT) AS nk,
                          CAST(floor(s_acctbal * 100.0 + 0.5)
                               AS BIGINT) AS c
                   FROM supplier),
        r AS (SELECT nk, c,
                     ROW_NUMBER() OVER (PARTITION BY nk ORDER BY c)
                         AS rn,
                     count(*) OVER (PARTITION BY nk) AS n
              FROM c),
        med AS (SELECT nk, c AS med, n FROM r
                WHERE rn = (n - 1) // 2 + 1),
        dev AS (SELECT c.nk, abs(c.c - med.med) AS d, med.med, med.n
                FROM c JOIN med ON c.nk = med.nk),
        r2 AS (SELECT nk, d, med, n,
                      ROW_NUMBER() OVER (PARTITION BY nk ORDER BY d)
                          AS rn
               FROM dev)
        SELECT nk AS n_nationkey, CAST(n AS BIGINT) AS n_supp,
               med AS median_cents, d AS mad_cents
        FROM r2 WHERE rn = (n - 1) // 2 + 1
    """


def q_acquisition_conversion(sf_dir: str):
    """Acquisition-channel readout: users grouped by their FIRST-ever
    event type (the acquisition touch), with exposure and conversion
    counts — first-touch × outcome in one pass. Each user's first
    event and purchase flag ride a single user-cardinality shuffle
    (argmin gather inside a user co-partition); the readout is
    5-row."""
    from geotile.ops.relational import _with_bucket

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id",
                                  "event_type"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"first_type": pd.Series(dtype=object),
                                 "n_users": pd.Series(dtype=np.int64),
                                 "n_converted":
                                     pd.Series(dtype=np.int64)})
        u = df["user_id"].to_numpy(np.int64)
        e = df["event_id"].to_numpy(np.int64)
        t = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        ty = df["event_type"].to_numpy()
        o = np.lexsort((e, t, u))
        uu, tyu = u[o], ty[o]
        first = np.r_[True, uu[1:] != uu[:-1]]
        starts = np.flatnonzero(first)
        ends = np.r_[starts[1:], len(uu)]
        conv = np.zeros(len(starts), np.int64)
        is_p = tyu == "purchase"
        cum = np.r_[0, np.cumsum(is_p)]
        conv = (cum[ends] - cum[starts] > 0).astype(np.int64)
        g = pd.DataFrame({"first_type": tyu[starts], "conv": conv}) \
            .groupby("first_type", as_index=False) \
            .agg(n_users=("conv", "size"), n_converted=("conv", "sum"))
        return g

    out = (_with_bucket(ev, "user_id", 32)
           .groupby("bucket").map_groups(per_bucket,
                                         batch_format="pandas")
           .groupby("first_type").sum(["n_users", "n_converted"]))
    return _rename(out, ["first_type", "n_users", "n_converted"])


QUERIES["acquisition_conversion"] = q_acquisition_conversion
ORACLE_SQL["acquisition_conversion"] = """
        WITH f AS (SELECT user_id, event_type,
                          ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS rn
                   FROM events),
        u AS (SELECT user_id, count(*) FILTER (event_type = 'purchase')
                         AS np
              FROM events GROUP BY 1)
        SELECT f.event_type AS first_type, count(*) AS n_users,
               CAST(count(*) FILTER (u.np > 0) AS BIGINT)
                   AS n_converted
        FROM f JOIN u USING (user_id)
        WHERE f.rn = 1 GROUP BY 1
    """


def q_burst_minutes_events(sf_dir: str):
    """Burst detection inputs: per day, how many one-minute windows
    carry ≥3 events and the hottest minute's count — the rate-spike
    audit before an alerting rule ships. Per-batch (minute) count
    partials (minute-cardinality, calendar-bounded), then a per-day
    epilogue over the minute histogram."""
    ev = _read(sf_dir, "events", ["ts"])

    def per_minute(t: pa.Table) -> pa.Table:
        m = pc.divide(t["ts"].cast(pa.int64()),
                      pa.scalar(60_000_000, pa.int64()))
        g = pa.table({"m": m}).group_by("m").aggregate(
            [([], "count_all")])
        return pa.table({"m": g["m"],
                         "n": g["count_all"].cast(pa.int64())})

    minutes = (ev.map_batches(per_minute, batch_format="pyarrow")
               .groupby("m").sum("n"))

    def per_day(t: pa.Table) -> pa.Table:
        day = pc.divide(t["m"], pa.scalar(1440, pa.int64()))
        n = t["sum(n)"]
        hot = pc.greater_equal(n, pa.scalar(3)).cast(pa.int64())
        g = pa.table({"day": day, "hot": hot, "n": n}) \
            .group_by("day").aggregate(
                [([], "count_all"), ("hot", "sum"), ("n", "max")])
        return pa.table({"day": g["day"],
                         "n_active_minutes":
                             g["count_all"].cast(pa.int64()),
                         "n_burst_minutes": g["hot_sum"],
                         "max_minute": g["n_max"]})

    out = (minutes.map_batches(per_day, batch_format="pyarrow")
           .groupby("day")
           .aggregate(rd.aggregate.Sum("n_active_minutes"),
                      rd.aggregate.Sum("n_burst_minutes"),
                      rd.aggregate.Max("max_minute")))
    return _rename(out, ["day", "n_active_minutes", "n_burst_minutes",
                         "max_minute"])


QUERIES["burst_minutes_events"] = q_burst_minutes_events
ORACLE_SQL["burst_minutes_events"] = """
        WITH m AS (SELECT epoch_us(ts) // 60000000 AS m, count(*) AS n
                   FROM events GROUP BY 1)
        SELECT CAST(m // 1440 AS BIGINT) AS day,
               count(*) AS n_active_minutes,
               CAST(count(*) FILTER (n >= 3) AS BIGINT)
                   AS n_burst_minutes,
               CAST(max(n) AS BIGINT) AS max_minute
        FROM m GROUP BY 1
    """


def q_supplier_cov_nations(sf_dir: str):
    """Cross-table grouped covariance parts: per nation, the exact
    integer moments (n, Σx, Σy, Σxy) between each supplier's account
    balance and their shipped revenue — does capital predict volume?
    Per-supplier revenue rides one suppkey shuffle; the supplier dim
    (balance, nation) attaches by sorted-key broadcast; nation moments
    are 25-row partials. x in cents, y in whole dollars so Σxy stays
    far inside int64."""
    li = _read(sf_dir, "lineitem",
               ["l_suppkey", "l_extendedprice", "l_discount"])

    def per_supp(t: pa.Table) -> pa.Table:
        rev = pc.floor(pc.add(pc.multiply(
            pc.multiply(t["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), t["l_discount"])),
            pa.scalar(1.0)), pa.scalar(0.5))).cast(pa.int64())
        g = pa.table({"sk": t["l_suppkey"], "y": rev}) \
            .group_by("sk").aggregate([("y", "sum")])
        return pa.table({"sk": g["sk"], "y": g["y_sum"]})

    rev = (li.map_batches(per_supp, batch_format="pyarrow")
           .groupby("sk").sum("y"))
    rev = _rename(rev, ["sk", "y"])

    sup = _read(sf_dir, "supplier",
                ["s_suppkey", "s_nationkey", "s_acctbal"]).take_all()
    sk = np.array(sorted(r["s_suppkey"] for r in sup), dtype=np.int64)
    by = {r["s_suppkey"]: r for r in sup}
    nk = np.array([by[k]["s_nationkey"] for k in sk], dtype=np.int64)
    bal = np.array([int(np.floor(by[k]["s_acctbal"] * 100.0 + 0.5))
                    for k in sk], dtype=np.int64)
    ref = ray.put((sk, nk, bal))

    def moments(t: pa.Table) -> pa.Table:
        sk_, nk_, bal_ = _broadcast(ref)
        s = t["sk"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        i = np.minimum(np.searchsorted(sk_, s), len(sk_) - 1)
        hit = sk_[i] == s
        i, y = i[hit], y[hit]
        x = bal_[i]
        g = pa.table({"nk": pa.array(nk_[i]), "x": pa.array(x),
                      "y": pa.array(y), "xy": pa.array(x * y)}) \
            .group_by("nk").aggregate(
                [([], "count_all"), ("x", "sum"), ("y", "sum"),
                 ("xy", "sum")])
        return pa.table({"n_nationkey": g["nk"],
                         "n_supp": g["count_all"].cast(pa.int64()),
                         "sum_x": g["x_sum"], "sum_y": g["y_sum"],
                         "sum_xy": g["xy_sum"]})

    out = (rev.map_batches(moments, batch_format="pyarrow")
           .groupby("n_nationkey").sum(["n_supp", "sum_x", "sum_y",
                                        "sum_xy"]))
    return _rename(out, ["n_nationkey", "n_supp", "sum_x", "sum_y",
                         "sum_xy"])


QUERIES["supplier_cov_nations"] = q_supplier_cov_nations
ORACLE_SQL["supplier_cov_nations"] = """
        WITH r AS (SELECT l_suppkey,
                          SUM(CAST(floor(l_extendedprice
                              * (1 - l_discount) * 1.0 + 0.5)
                              AS BIGINT)) AS y
                   FROM lineitem GROUP BY 1),
        m AS (SELECT CAST(s_nationkey AS BIGINT) AS nk,
                     CAST(floor(s_acctbal * 100.0 + 0.5) AS BIGINT)
                         AS x,
                     r.y
              FROM r JOIN supplier ON l_suppkey = s_suppkey)
        SELECT nk AS n_nationkey, count(*) AS n_supp,
               CAST(SUM(x) AS BIGINT) AS sum_x,
               CAST(SUM(y) AS BIGINT) AS sum_y,
               CAST(SUM(x * y) AS BIGINT) AS sum_xy
        FROM m GROUP BY 1
    """


def q_lang_confusion_matrix(sf_dir: str):
    """Language-ID quality readout: the (stored lang × predicted
    lang) confusion matrix over the whole corpus — the eval loop
    around ops/text.lang_id run as a 25-cell aggregate instead of a
    row-level export. The scorer runs exactly once per doc inside the
    batch; only closed-vocabulary matrix partials shuffle."""
    from geotile.ops.text import lang_id

    scored = lang_id(_read(sf_dir, "documents",
                           ["doc_id", "text", "lang"]))

    def matrix(t: pa.Table) -> pa.Table:
        g = t.select(["lang", "lang_pred"]) \
            .group_by(["lang", "lang_pred"]).aggregate(
                [([], "count_all")])
        return pa.table({"lang": g["lang"],
                         "lang_pred": g["lang_pred"],
                         "n": g["count_all"].cast(pa.int64())})

    out = (scored.map_batches(matrix, batch_format="pyarrow")
           .groupby(["lang", "lang_pred"]).sum("n"))
    return _rename(out, ["lang", "lang_pred", "n"])


QUERIES["lang_confusion_matrix"] = q_lang_confusion_matrix


def _lang_confusion_sql() -> str:
    return f"""
        WITH p AS ({_lang_id_sql()})
        SELECT lang, lang_pred, count(*) AS n
        FROM p GROUP BY 1, 2
    """


def q_crossmodal_pairing_audit(sf_dir: str):
    """Multimodal sample assembly audit: pair every image with an
    audio track by shared id space (image index mod track count — the
    deterministic pairing a paired-training dataset builder uses) and
    verify per track: images paired, their pixel mass, and the
    track's own sample count. The audio side is a tiny broadcast
    (track metadata only — payloads never move); the image scan
    prunes to (image_id, w, h). Track-cardinality partials."""
    import pyarrow.parquet as _pq

    from geotile.ops.tiles import read_image_table
    from geotile.synth import image_index

    aud = _audio_dir_for(sf_dir)
    at = _pq.read_table(f"{aud}/part-00000.parquet",
                        columns=["track_id", "n_samples"])
    tids = at["track_id"].to_numpy(zero_copy_only=False)
    nsamp = at["n_samples"].to_numpy(zero_copy_only=False)
    n_tracks = int(len(tids))
    ref = ray.put((np.sort(tids),
                   nsamp[np.argsort(tids)].astype(np.int64)))

    ds = read_image_table(_image_dir_for(sf_dir),
                          columns=["image_id", "w", "h"])

    def pair(t: pa.Table) -> pa.Table:
        idx = image_index(t["image_id"])
        track = idx % n_tracks
        px = (t["w"].to_numpy(zero_copy_only=False).astype(np.int64)
              * t["h"].to_numpy(zero_copy_only=False))
        g = pa.table({"track_id": pa.array(track),
                      "px": pa.array(px)}).group_by("track_id") \
            .aggregate([([], "count_all"), ("px", "sum")])
        return pa.table({"track_id": g["track_id"],
                         "n_images": g["count_all"].cast(pa.int64()),
                         "sum_px": g["px_sum"]})

    agg = (ds.map_batches(pair, batch_format="pyarrow")
           .groupby("track_id").sum(["n_images", "sum_px"]))
    agg = _rename(agg, ["track_id", "n_images", "sum_px"])

    def attach(t: pa.Table) -> pa.Table:
        tids_, nsamp_ = _broadcast(ref)
        i = np.searchsorted(tids_, t["track_id"].to_numpy())
        return t.append_column("n_samples", pa.array(nsamp_[i]))

    return agg.map_batches(attach, batch_format="pyarrow")


QUERIES["crossmodal_pairing_audit"] = q_crossmodal_pairing_audit


def _crossmodal_sql(img_dir: str, aud_dir: str) -> str:
    return f"""
        WITH i AS (SELECT CAST(substr(image_id, 5) AS BIGINT) AS idx,
                          w, h
                   FROM read_parquet('{img_dir}/part-*.parquet')),
        a AS (SELECT track_id, n_samples,
                     (SELECT count(*) FROM
                      read_parquet('{aud_dir}/part-*.parquet')) AS nt
              FROM read_parquet('{aud_dir}/part-*.parquet'))
        SELECT a.track_id, count(*) AS n_images,
               CAST(SUM(i.w * i.h) AS BIGINT) AS sum_px,
               CAST(any_value(a.n_samples) AS BIGINT) AS n_samples
        FROM i JOIN a ON i.idx % a.nt = a.track_id
        GROUP BY 1
    """


def q_diversified_topk_orders(sf_dir: str):
    """Diversified top-k (search-result dedup rule): the ten priciest
    orders subject to AT MOST TWO per customer nation. Greedy-by-rank
    is provably 'nation-rank ≤ 2, then global top-10', so the plan is
    one bucketed custkey join, per-block (nation, top-2-by-price)
    partials — 50-row bound per block — and a tiny final reduce that
    reapplies both rules. No global sort."""
    from geotile.ops.relational import bucketed_join

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    j = bucketed_join(orders, cust, "o_custkey", "c_custkey",
                      n_buckets=16)

    def prep(t: pa.Table) -> pa.Table:
        cents = pc.floor(pc.add(pc.multiply(
            t["o_totalprice"], pa.scalar(100.0)),
            pa.scalar(0.5))).cast(pa.int64())
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "nk": t["c_nationkey"].cast(pa.int64()),
                         "cents": cents})

    def diversify(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy()
        nk = t["nk"].to_numpy()
        c = t["cents"].to_numpy()
        o = np.lexsort((k, -c, nk))
        nks = nk[o]
        first = np.r_[True, nks[1:] != nks[:-1]]
        starts = np.flatnonzero(first)
        seg = np.cumsum(first) - 1
        rk = np.arange(len(nks)) - starts[seg]
        keep = o[rk < 2]
        # then global top-10 among survivors
        oo = np.lexsort((k[keep], -c[keep]))[:10]
        keep = keep[oo]
        return pa.table({"o_orderkey": pa.array(k[keep]),
                         "nk": pa.array(nk[keep]),
                         "cents": pa.array(c[keep])})

    return (j.map_batches(prep, batch_format="pyarrow")
            .map_batches(diversify, batch_format="pyarrow")
            .repartition(1)
            .map_batches(diversify, batch_format="pyarrow"))


QUERIES["diversified_topk_orders"] = q_diversified_topk_orders
ORACLE_SQL["diversified_topk_orders"] = """
        WITH o AS (SELECT o_orderkey,
                          CAST(c_nationkey AS BIGINT) AS nk,
                          CAST(floor(o_totalprice * 100.0 + 0.5)
                               AS BIGINT) AS cents
                   FROM orders JOIN customer ON o_custkey = c_custkey),
        r AS (SELECT o_orderkey, nk, cents,
                     ROW_NUMBER() OVER (PARTITION BY nk
                         ORDER BY cents DESC, o_orderkey) AS rn
              FROM o)
        SELECT o_orderkey, nk, cents FROM r WHERE rn <= 2
        ORDER BY cents DESC, o_orderkey LIMIT 10
    """


def q_session_gap_sweep(sf_dir: str):
    """Sessionization parameter sweep: session counts under gap
    thresholds {5, 15, 30, 60} minutes from ONE pass — every gap's
    count is n_users + #(inter-event diffs > gap), so the sweep costs
    four vectorized compares over the same diff array, not four
    sessionizations. The knee of this curve picks the production
    timeout."""
    from geotile.ops.relational import _with_bucket

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    GAPS = (300, 900, 1800, 3600)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"gap_s": pd.Series(dtype=np.int64),
                                 "n_sessions":
                                     pd.Series(dtype=np.int64)})
        u = df["user_id"].to_numpy(np.int64)
        e = df["event_id"].to_numpy(np.int64)
        t = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        o = np.lexsort((e, t, u))
        uu, tu = u[o], t[o]
        same = uu[1:] == uu[:-1]
        d = (tu[1:] - tu[:-1])[same]
        n_users = int(np.unique(uu).size)
        rows = [{"gap_s": g,
                 "n_sessions": n_users + int((d > g * 1_000_000).sum())}
                for g in GAPS]
        return pd.DataFrame(rows)

    out = (_with_bucket(ev, "user_id", 32)
           .groupby("bucket").map_groups(per_bucket,
                                         batch_format="pandas")
           .groupby("gap_s").sum("n_sessions"))
    return _rename(out, ["gap_s", "n_sessions"])


QUERIES["session_gap_sweep"] = q_session_gap_sweep
ORACLE_SQL["session_gap_sweep"] = """
        WITH d AS (SELECT epoch_us(ts)
                          - LAG(epoch_us(ts)) OVER (
                              PARTITION BY user_id
                              ORDER BY ts, event_id) AS gap
                   FROM events),
        u AS (SELECT count(DISTINCT user_id) AS nu FROM events)
        SELECT g.gap_s, CAST(u.nu + (SELECT count(*) FROM d
                    WHERE gap > g.gap_s * 1000000) AS BIGINT)
                   AS n_sessions
        FROM (VALUES (CAST(300 AS BIGINT)), (900), (1800), (3600))
             g(gap_s), u
    """


def q_pq_residual_energy(sf_dir: str):
    """PQ reconstruction-quality audit: per subspace, the corpus's
    total quantization residual (each vector's min centroid distance,
    truncated to the e6 lattice BEFORE summation so the int64 sum is
    order-free) — the codebook-health metric an ANN service tracks.
    Reuses the module PQ codebook; one broadcast-free vectorized pass,
    4-row partials. The generated SQL replay evaluates the identical
    distance expressions and LEAST-min."""
    ds = _read(sf_dir, "embeddings", ["embedding"])

    def resid(t: pa.Table) -> pa.Table:
        emb = t["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        vals = emb.values.to_numpy(zero_copy_only=False) \
            .astype(np.float64).reshape(len(t), 64)
        subs, sums, ns = [], [], []
        for s in range(_PQ_M):
            sub = vals[:, s * _PQ_SUB:(s + 1) * _PQ_SUB]
            dists = []
            for j in range(_PQ_K):
                acc = None
                for i in range(_PQ_SUB):
                    c = _PQ_CVALS[(i + j) % 4]
                    term = (sub[:, i] - c) * (sub[:, i] - c)
                    acc = term if acc is None else acc + term
                dists.append(acc)
            d = np.stack(dists, axis=1).min(axis=1)
            r = np.trunc(d * 1_000_000.0).astype(np.int64)
            subs.append(s)
            sums.append(int(r.sum()))
            ns.append(len(t))
        return pa.table({"subspace": pa.array(subs, pa.int64()),
                         "n": pa.array(ns, pa.int64()),
                         "sum_res_e6": pa.array(sums, pa.int64())})

    out = (ds.map_batches(resid, batch_format="pyarrow")
           .groupby("subspace").sum(["n", "sum_res_e6"]))
    return _rename(out, ["subspace", "n", "sum_res_e6"])


def _pq_residual_sql() -> str:
    def dist(s: int, j: int) -> str:
        terms = []
        for i in range(_PQ_SUB):
            c = repr(_PQ_CVALS[(i + j) % 4])
            e = f"CAST(embedding[{s * _PQ_SUB + i + 1}] AS DOUBLE)"
            terms.append(f"(({e}) - ({c})) * (({e}) - ({c}))")
        return " + ".join(terms)

    arms = []
    for s in range(_PQ_M):
        d = ", ".join(f"({dist(s, j)})" for j in range(_PQ_K))
        arms.append(f"""
        SELECT CAST({s} AS BIGINT) AS subspace, count(*) AS n,
               CAST(SUM(CAST(trunc(least({d}) * 1000000.0)
                             AS BIGINT)) AS BIGINT) AS sum_res_e6
        FROM embeddings""")
    return " UNION ALL ".join(arms)


QUERIES["pq_residual_energy"] = q_pq_residual_energy
ORACLE_SQL["pq_residual_energy"] = _pq_residual_sql()


def q_image_center_bias(sf_dir: str):
    """Composition audit: is the image corpus center-heavy? Per image
    the exact channel-sum mass of the four CENTER patches of the 4×4
    ViT grid vs the whole frame — stage REUSE: the same
    ImagePatchStage powers image_patch_sums; this query just folds
    its exact integer patch ledger differently (patches 5/6/9/10 vs
    all), so the oracle is a CASE re-aggregation of the same
    sidecar."""
    from geotile.ops.tiles import ImagePatchStage, read_image_table

    # same 512-image prefix as image_patch_sums (shared sidecar)
    ds = read_image_table(_image_dir_for(sf_dir)).limit(512)
    patches = ds.map_batches(ImagePatchStage, batch_format="pyarrow",
                             batch_size=256, concurrency=2)

    def fold(t: pa.Table) -> pa.Table:
        p = t["patch"].to_numpy()
        center = ((p == 5) | (p == 6) | (p == 9)
                  | (p == 10)).astype(np.int64)
        s = t["sum_px"].to_numpy()
        n = t["n_px"].to_numpy()
        g = pa.table({"image_id": t["image_id"],
                      "c_sum": pa.array(center * s),
                      "c_px": pa.array(center * n),
                      "t_sum": pa.array(s), "t_px": pa.array(n)}) \
            .group_by("image_id").aggregate(
                [("c_sum", "sum"), ("c_px", "sum"), ("t_sum", "sum"),
                 ("t_px", "sum")])
        return g.rename_columns(["image_id", "center_sum", "center_px",
                                 "total_sum", "total_px"])

    out = (patches.map_batches(fold, batch_format="pyarrow")
           .groupby("image_id").sum(["center_sum", "center_px",
                                     "total_sum", "total_px"]))
    return _rename(out, ["image_id", "center_sum", "center_px",
                         "total_sum", "total_px"])


QUERIES["image_center_bias"] = q_image_center_bias


def _image_center_bias_sql(img: str) -> str:
    return f"""
        SELECT image_id,
               CAST(SUM(CASE WHEN patch IN (5, 6, 9, 10)
                             THEN sum_px ELSE 0 END) AS BIGINT)
                   AS center_sum,
               CAST(SUM(CASE WHEN patch IN (5, 6, 9, 10)
                             THEN n_px ELSE 0 END) AS BIGINT)
                   AS center_px,
               CAST(SUM(sum_px) AS BIGINT) AS total_sum,
               CAST(SUM(n_px) AS BIGINT) AS total_px
        FROM read_parquet('{_image_patch_sidecar(img)}')
        GROUP BY 1
    """


def q_stop_spacing_legs(sf_dir: str):
    """Stop-spacing profile: for every route of the GTFS fixture, each
    consecutive served-stop leg's squared meter-frame length — the
    inter-station distance table a service planner reads. Emitted
    per-LEG (never summed), so every d² is a single IEEE expression
    replayable bit-exactly from the stop-coordinate literals in the
    SQL VALUES list. Distances need no sqrt; the four routes' served
    sequences derive from their step patterns."""
    from geotile.geom.buffer import meter_frame
    from geotile.ops.join import _ANCHOR_LAT, _ANCHOR_LON
    from geotile.synth import ROUTE_DEFS, STOP_IDS, STOP_LATS, \
        STOP_LONS, _route_stop_ids

    mx, my = meter_frame(_ANCHOR_LAT)
    rows_r, rows_l, rows_d = [], [], []
    for ridx, (rid, agid, _k, step, _hs, _c, _tc) in enumerate(
            ROUTE_DEFS):
        idx = [STOP_IDS.index(s) for s in _route_stop_ids(step)]
        lon = STOP_LONS[idx]
        lat = STOP_LATS[idx]
        px = (lon - _ANCHOR_LON) * mx
        py = (lat - _ANCHOR_LAT) * my
        d2 = (px[1:] - px[:-1]) * (px[1:] - px[:-1]) \
            + (py[1:] - py[:-1]) * (py[1:] - py[:-1])
        key = f"{agid}:{rid}"
        rows_r.extend([key] * len(d2))
        rows_l.extend(range(len(d2)))
        rows_d.extend(d2.tolist())
    legs = rd.from_arrow(pa.table({
        "route_key": pa.array(rows_r, pa.string()),
        "leg": pa.array(rows_l, pa.int64()),
        "d2_m2": pa.array(rows_d, pa.float64())}))
    return legs


QUERIES["stop_spacing_legs"] = q_stop_spacing_legs


def _stop_spacing_sql() -> str:
    from geotile.geom.buffer import meter_frame
    from geotile.ops.join import _ANCHOR_LAT, _ANCHOR_LON
    from geotile.synth import ROUTE_DEFS, STOP_IDS, STOP_LATS, \
        STOP_LONS, _route_stop_ids

    mx, my = meter_frame(_ANCHOR_LAT)

    def dbl(v: float) -> str:
        # DuckDB parses bare decimal literals as DECIMAL and the
        # DECIMAL→DOUBLE cast double-rounds (measured 1-ulp drift);
        # a quoted-string cast goes through strtod and is correctly
        # rounded, matching Python's repr round-trip exactly
        return f"CAST('{v!r}' AS DOUBLE)"

    vals = []
    for rid, agid, _k, step, _hs, _c, _tc in ROUTE_DEFS:
        idx = [STOP_IDS.index(s) for s in _route_stop_ids(step)]
        for leg in range(len(idx) - 1):
            a, b = idx[leg], idx[leg + 1]
            vals.append(
                f"('{agid}:{rid}', {leg}, {dbl(STOP_LONS[a])},"
                f" {dbl(STOP_LATS[a])}, {dbl(STOP_LONS[b])},"
                f" {dbl(STOP_LATS[b])})")
    ax, ay, fx, fy = (dbl(_ANCHOR_LON), dbl(_ANCHOR_LAT),
                      dbl(mx), dbl(my))
    return f"""
        WITH legs(route_key, leg, lon_a, lat_a, lon_b, lat_b)
             AS (VALUES {', '.join(vals)})
        SELECT route_key, CAST(leg AS BIGINT) AS leg,
               ((lon_b - ({ax})) * {fx} - (lon_a - ({ax})) * {fx})
               * ((lon_b - ({ax})) * {fx} - (lon_a - ({ax})) * {fx})
               + ((lat_b - ({ay})) * {fy} - (lat_a - ({ay})) * {fy})
               * ((lat_b - ({ay})) * {fy} - (lat_a - ({ay})) * {fy})
                   AS d2_m2
        FROM legs
    """


def q_wallet_share_customers(sf_dir: str):
    """Wallet concentration: each customer's biggest single order as
    an exact-ppm share of their lifetime spend — the dependence risk
    metric. MAX and SUM ride the same custkey shuffle; the ppm is
    integer division (both operands positive)."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.floor(pc.add(pc.multiply(
            t["o_totalprice"], pa.scalar(100.0)),
            pa.scalar(0.5))).cast(pa.int64())
        g = pa.table({"ck": t["o_custkey"], "c": cents}) \
            .group_by("ck").aggregate(
                [([], "count_all"), ("c", "sum"), ("c", "max")])
        return g.rename_columns(["ck", "n_orders", "total_cents",
                                 "max_cents"])

    agg = (orders.map_batches(partial, batch_format="pyarrow")
           .groupby("ck")
           .aggregate(rd.aggregate.Sum("n_orders"),
                      rd.aggregate.Sum("total_cents"),
                      rd.aggregate.Max("max_cents")))
    agg = _rename(agg, ["ck", "n_orders", "total_cents", "max_cents"])

    def share(t: pa.Table) -> pa.Table:
        mx = t["max_cents"].to_numpy()
        tot = t["total_cents"].to_numpy()
        return t.append_column(
            "share_ppm", pa.array(mx * 1_000_000 // tot)) \
            .rename_columns(["o_custkey", "n_orders", "total_cents",
                             "max_cents", "share_ppm"])

    return agg.map_batches(share, batch_format="pyarrow")


QUERIES["wallet_share_customers"] = q_wallet_share_customers
ORACLE_SQL["wallet_share_customers"] = """
        WITH c AS (SELECT o_custkey,
                          CAST(floor(o_totalprice * 100.0 + 0.5)
                               AS BIGINT) AS cents
                   FROM orders)
        SELECT o_custkey, count(*) AS n_orders,
               CAST(SUM(cents) AS BIGINT) AS total_cents,
               CAST(MAX(cents) AS BIGINT) AS max_cents,
               MAX(cents) * 1000000 // SUM(cents) AS share_ppm
        FROM c GROUP BY 1
    """


def q_time_pyramid_counts(sf_dir: str):
    """Time-axis pyramid (the temporal twin of the tile zoom
    pyramid): event counts at hour, day and week grains from ONE
    encode — each coarser bucket is a division of the same epoch
    value, all three grains ride one packed-key shuffle (grain tag in
    the top bits), and the oracle derives EVERY grain independently
    from ts."""
    ev = _read(sf_dir, "events", ["ts"])

    def partial(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        hour = us // 3_600_000_000
        day = hour // 24
        week = day // 7
        k = np.concatenate([
            (np.int64(0) << 40) | hour,
            (np.int64(1) << 40) | day,
            (np.int64(2) << 40) | week])
        g = pa.table({"k": pa.array(k)}).group_by("k").aggregate(
            [([], "count_all")])
        return pa.table({"k": g["k"],
                         "n": g["count_all"].cast(pa.int64())})

    agg = (ev.map_batches(partial, batch_format="pyarrow")
           .groupby("k").sum("n"))

    def unpack(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy()
        return pa.table({"grain": pa.array(k >> 40),
                         "bucket": pa.array(k & ((1 << 40) - 1)),
                         "n_events": t["sum(n)"]})

    return agg.map_batches(unpack, batch_format="pyarrow")


QUERIES["time_pyramid_counts"] = q_time_pyramid_counts
ORACLE_SQL["time_pyramid_counts"] = """
        SELECT CAST(0 AS BIGINT) AS grain,
               epoch_us(ts) // 3600000000 AS bucket,
               count(*) AS n_events
        FROM events GROUP BY 2
        UNION ALL
        SELECT 1, epoch_us(ts) // 86400000000, count(*)
        FROM events GROUP BY 2
        UNION ALL
        SELECT 2, epoch_us(ts) // 604800000000, count(*)
        FROM events GROUP BY 2
    """


def q_route_overlap_matrix(sf_dir: str):
    """Network-redundancy matrix: for every unordered route pair, how
    many image tiles sit inside BOTH buffers — the corridor-overlap
    readout on top of the flagship spatial join. Assignments
    co-partition on the image key; each image's ≤R routes expand to
    pairs with a bounded-width shifted loop; the matrix is
    route²-cardinality partials. Oracle: the full generated PIP
    replay wrapped in a self-join."""
    from geotile.ops.join import spatial_join
    from geotile.ops.relational import _with_bucket
    from geotile.ops.tiles import JOIN_COLUMNS, read_image_table
    from geotile.synth import image_index

    idx = _fixture_route_index()
    ds = read_image_table(_image_dir_for(sf_dir), columns=JOIN_COLUMNS)
    asg = spatial_join(ds, idx).select_columns(["image_id", "route_id"])

    def with_key(t: pa.Table) -> pa.Table:
        return pa.table({"img": pa.array(image_index(t["image_id"])),
                         "route_id": t["route_id"]})

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"route_a": pd.Series(dtype=object),
                                 "route_b": pd.Series(dtype=object),
                                 "n_images": pd.Series(dtype=np.int64)})
        img = df["img"].to_numpy(np.int64)
        rt = df["route_id"].to_numpy()
        o = np.lexsort((rt, img))
        img, rt = img[o], rt[o]
        new = np.r_[True, img[1:] != img[:-1]]
        first = np.flatnonzero(new)
        cnt = np.diff(np.r_[first, len(img)])
        out_a, out_b = [], []
        for w in range(1, int(cnt.max()) if len(cnt) else 0):
            has = cnt > w
            base = first[has]
            for j in range(w):
                out_a.append(rt[base + j])
                out_b.append(rt[base + w])
        if not out_a:
            return pd.DataFrame({"route_a": pd.Series(dtype=object),
                                 "route_b": pd.Series(dtype=object),
                                 "n_images": pd.Series(dtype=np.int64)})
        g = pd.DataFrame({"route_a": np.concatenate(out_a),
                          "route_b": np.concatenate(out_b)}) \
            .groupby(["route_a", "route_b"], as_index=False).size()
        return g.rename(columns={"size": "n_images"})

    keyed = asg.map_batches(with_key, batch_format="pyarrow")
    return (_with_bucket(keyed, "img", 16)
            .groupby("bucket").map_groups(pairs, batch_format="pandas")
            .groupby(["route_a", "route_b"]).sum("n_images")
            .map_batches(lambda t: t.rename_columns(
                ["route_a", "route_b", "n_images"]),
                batch_format="pyarrow"))


QUERIES["route_overlap_matrix"] = q_route_overlap_matrix


def _route_overlap_sql(sf_dir: str) -> str:
    asg = tile_oracle_sql(sf_dir)["tile_assignments"]
    return f"""
        WITH asg AS ({asg})
        SELECT a.route_id AS route_a, b.route_id AS route_b,
               count(*) AS n_images
        FROM asg a JOIN asg b
          ON a.image_id = b.image_id AND a.route_id < b.route_id
        GROUP BY 1, 2
    """


def q_dow_hour_heatmap_events(sf_dir: str):
    """Weekly activity heatmap: event counts per (epoch-aligned
    weekday, hour-of-day) — the 7×24 rhythm plot behind every ops
    dashboard. One packed-key shuffle at 168-cell cardinality."""
    ev = _read(sf_dir, "events", ["ts"])

    def part(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        hour = us // 3_600_000_000
        day = hour // 24
        k = (day % 7) * 24 + hour % 24
        g = pa.table({"k": pa.array(k)}).group_by("k").aggregate(
            [([], "count_all")])
        return pa.table({"k": g["k"],
                         "n": g["count_all"].cast(pa.int64())})

    agg = (ev.map_batches(part, batch_format="pyarrow")
           .groupby("k").sum("n"))
    return agg.map_batches(
        lambda t: pa.table({"dow": pa.array(t["k"].to_numpy() // 24),
                            "hour": pa.array(t["k"].to_numpy() % 24),
                            "n_events": t["sum(n)"]}),
        batch_format="pyarrow")


QUERIES["dow_hour_heatmap_events"] = q_dow_hour_heatmap_events
ORACLE_SQL["dow_hour_heatmap_events"] = """
        SELECT (epoch_us(ts) // 86400000000) % 7 AS dow,
               (epoch_us(ts) // 3600000000) % 24 AS hour,
               count(*) AS n_events
        FROM events GROUP BY 1, 2
    """


def q_status_priority_crosstab(sf_dir: str):
    """Order status × priority contingency with exact independence
    deviations n·N − r·c (the χ² numerators, integer) — the orders
    twin of fmt_size_association. 15-cell partials; margins reduce
    from the same aggregate."""
    orders = _read(sf_dir, "orders",
                   ["o_orderstatus", "o_orderpriority"])

    def part(t: pa.Table) -> pa.Table:
        g = t.group_by(["o_orderstatus", "o_orderpriority"]) \
            .aggregate([([], "count_all")])
        return pa.table({"o_orderstatus": g["o_orderstatus"],
                         "o_orderpriority": g["o_orderpriority"],
                         "n": g["count_all"].cast(pa.int64())})

    cells = (orders.map_batches(part, batch_format="pyarrow")
             .groupby(["o_orderstatus", "o_orderpriority"])
             .sum("n")).take_all()
    tot = sum(r["sum(n)"] for r in cells)
    row = {}
    col = {}
    for r in cells:
        row[r["o_orderstatus"]] = row.get(r["o_orderstatus"], 0) \
            + r["sum(n)"]
        col[r["o_orderpriority"]] = col.get(r["o_orderpriority"], 0) \
            + r["sum(n)"]
    rows = [{"o_orderstatus": r["o_orderstatus"],
             "o_orderpriority": r["o_orderpriority"],
             "n": r["sum(n)"],
             "dev": r["sum(n)"] * tot
             - row[r["o_orderstatus"]] * col[r["o_orderpriority"]]}
            for r in cells]
    return pd.DataFrame(rows)


QUERIES["status_priority_crosstab"] = q_status_priority_crosstab
ORACLE_SQL["status_priority_crosstab"] = """
        WITH cell AS (SELECT o_orderstatus, o_orderpriority,
                             count(*) AS n
                      FROM orders GROUP BY 1, 2),
        m AS (SELECT *, SUM(n) OVER (PARTITION BY o_orderstatus) AS r,
                     SUM(n) OVER (PARTITION BY o_orderpriority) AS c,
                     SUM(n) OVER () AS nn
              FROM cell)
        SELECT o_orderstatus, o_orderpriority, CAST(n AS BIGINT) AS n,
               CAST(n * nn - r * c AS BIGINT) AS dev
        FROM m
    """


def q_nation_percentile_customers(sf_dir: str):
    """Within-group percentile rank: every customer's spend rank
    inside their OWN nation as exact ppm (rank·10⁶ // (n−1),
    deterministic custkey tie-break) — the grouped PERCENT_RANK.
    Spend rides one custkey shuffle; ranks resolve inside a nation
    co-partition lexsort (each group ranks all its members in one
    pass); single-member nations emit 0 like SQL's PERCENT_RANK."""
    from geotile.ops.relational import _with_bucket, bucketed_join

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def per_cust(t: pa.Table) -> pa.Table:
        cents = pc.floor(pc.add(pc.multiply(
            t["o_totalprice"], pa.scalar(100.0)),
            pa.scalar(0.5))).cast(pa.int64())
        g = pa.table({"ck": t["o_custkey"], "c": cents}) \
            .group_by("ck").aggregate([("c", "sum")])
        return pa.table({"ck": g["ck"], "c": g["c_sum"]})

    spend = (orders.map_batches(per_cust, batch_format="pyarrow")
             .groupby("ck").sum("c"))
    spend = _rename(spend, ["ck", "c"]).materialize()
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    j = bucketed_join(spend, cust, "ck", "c_custkey", n_buckets=16)

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"ck": t["ck"],
                         "nk": t["c_nationkey"].cast(pa.int64()),
                         "c": t["c"]})

    def ranks(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"o_custkey": pd.Series(dtype=np.int64),
                                 "n_nationkey":
                                     pd.Series(dtype=np.int64),
                                 "spend_cents":
                                     pd.Series(dtype=np.int64),
                                 "pr_ppm": pd.Series(dtype=np.int64)})
        ck = df["ck"].to_numpy(np.int64)
        nk = df["nk"].to_numpy(np.int64)
        c = df["c"].to_numpy(np.int64)
        o = np.lexsort((ck, c, nk))
        ck, nk, c = ck[o], nk[o], c[o]
        new = np.r_[True, nk[1:] != nk[:-1]]
        first = np.flatnonzero(new)
        seg = np.cumsum(new) - 1
        n = np.diff(np.r_[first, len(nk)])[seg]
        rk = np.arange(len(nk)) - first[seg]
        pr = np.where(n > 1, rk * 1_000_000 // np.maximum(n - 1, 1), 0)
        return pd.DataFrame({"o_custkey": ck, "n_nationkey": nk,
                             "spend_cents": c,
                             "pr_ppm": pr.astype(np.int64)})

    keyed = j.map_batches(prep, batch_format="pyarrow")
    return (_with_bucket(keyed, "nk", 8)
            .groupby("bucket").map_groups(ranks, batch_format="pandas"))


QUERIES["nation_percentile_customers"] = q_nation_percentile_customers
ORACLE_SQL["nation_percentile_customers"] = """
        WITH sp AS (SELECT o_custkey,
                           SUM(CAST(floor(o_totalprice * 100.0 + 0.5)
                                    AS BIGINT)) AS c
                    FROM orders GROUP BY 1),
        jj AS (SELECT o_custkey, CAST(c_nationkey AS BIGINT) AS nk, c
               FROM sp JOIN customer ON o_custkey = c_custkey),
        r AS (SELECT o_custkey, nk, c,
                     ROW_NUMBER() OVER (PARTITION BY nk
                         ORDER BY c, o_custkey) - 1 AS rk,
                     count(*) OVER (PARTITION BY nk) AS n
              FROM jj)
        SELECT o_custkey, nk AS n_nationkey, c AS spend_cents,
               CAST(CASE WHEN n > 1 THEN rk * 1000000 // (n - 1)
                         ELSE 0 END AS BIGINT) AS pr_ppm
        FROM r
    """


def q_audio_half_drift(sf_dir: str):
    """Audio stationarity audit: per track, exact frame-energy mass in
    the first half vs the second (frames 0–1 vs 2–3) — stage REUSE of
    the AudioFrameStage ledger folded along the frame axis, so the
    oracle is a CASE re-aggregation of the same replay sidecar."""
    from geotile.ops.audio import AudioFrameStage, read_audio_table

    ds = read_audio_table(_audio_dir_for(sf_dir))
    frames = ds.map_batches(AudioFrameStage, batch_format="pyarrow",
                            batch_size=64, concurrency=2)

    def fold(t: pa.Table) -> pa.Table:
        f = t["frame"].to_numpy()
        e = t["energy"].to_numpy()
        first = (f < 2).astype(np.int64)
        g = pa.table({"track_id": t["track_id"],
                      "e1": pa.array(first * e),
                      "e2": pa.array((1 - first) * e)}) \
            .group_by("track_id").aggregate(
                [("e1", "sum"), ("e2", "sum")])
        return g.rename_columns(["track_id", "first_half",
                                 "second_half"])

    out = (frames.map_batches(fold, batch_format="pyarrow")
           .groupby("track_id").sum(["first_half", "second_half"]))
    return _rename(out, ["track_id", "first_half", "second_half"])


QUERIES["audio_half_drift"] = q_audio_half_drift


def _audio_half_drift_sql(aud: str) -> str:
    return f"""
        SELECT track_id,
               CAST(SUM(CASE WHEN frame < 2 THEN energy ELSE 0 END)
                    AS BIGINT) AS first_half,
               CAST(SUM(CASE WHEN frame >= 2 THEN energy ELSE 0 END)
                    AS BIGINT) AS second_half
        FROM read_parquet('{_audio_energy_sidecar(aud)}')
        GROUP BY 1
    """


def q_lines_per_order_hist(sf_dir: str):
    """Order-size distribution: how many orders have exactly k line
    items — the Q13 twin on the lineitem edge (no zero class: every
    lineitem implies its order). Orderkey count partials → count-value
    histogram; the second aggregation is a few dozen rows at any
    scale."""
    li = _read(sf_dir, "lineitem", ["l_orderkey"])

    def per_order(t: pa.Table) -> pa.Table:
        g = t.group_by("l_orderkey").aggregate([([], "count_all")])
        return pa.table({"k": g["l_orderkey"],
                         "n": g["count_all"].cast(pa.int64())})

    counts = (li.map_batches(per_order, batch_format="pyarrow")
              .groupby("k").sum("n"))

    def hist(t: pa.Table) -> pa.Table:
        g = pa.table({"n_lines": t["sum(n)"]}).group_by("n_lines") \
            .aggregate([([], "count_all")])
        return pa.table({"n_lines": g["n_lines"],
                         "n_orders": g["count_all"].cast(pa.int64())})

    out = (counts.map_batches(hist, batch_format="pyarrow")
           .groupby("n_lines").sum("n_orders"))
    return _rename(out, ["n_lines", "n_orders"])


QUERIES["lines_per_order_hist"] = q_lines_per_order_hist
ORACLE_SQL["lines_per_order_hist"] = """
        WITH c AS (SELECT l_orderkey, count(*) AS n
                   FROM lineitem GROUP BY 1)
        SELECT CAST(n AS BIGINT) AS n_lines, count(*) AS n_orders
        FROM c GROUP BY 1
    """


def q_stop_hull_area_parts(sf_dir: str):
    """Hull geometry parts: per caption stop, the hull vertex count
    plus twice-the-area as an ORDER-FREE integer — each directed hull
    edge contributes trunc(cross(vᵢ, vᵢ₊₁)·10⁶) and the edge SET of a
    convex hull is start-invariant, so the engine's monotone chain and
    the sidecar's Jarvis march (different starting vertex, exact
    Fraction crosses) sum to the identical int64. Same distributed
    partial-hull plan as tile_stop_hulls."""
    from geotile.geom.hull import convex_hull
    from geotile.ops.tiles import read_image_table

    ds = read_image_table(_image_dir_for(sf_dir),
                          columns=["caption", "lon", "lat"])

    def partial_hulls(t: pa.Table) -> pa.Table:
        stop = pc.cast(pc.list_element(
            pc.split_pattern(t["caption"], " "), 4),
            pa.int64()).to_numpy(zero_copy_only=False)
        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        ss, xs, ys = [], [], []
        for s in np.unique(stop):
            m = stop == s
            ring = convex_hull(np.c_[lon[m], lat[m]])
            pts = np.c_[lon[m], lat[m]] if ring is None else ring[:-1]
            ss.append(np.full(len(pts), s, np.int64))
            xs.append(pts[:, 0])
            ys.append(pts[:, 1])
        return pa.table({"stop": pa.array(np.concatenate(ss)),
                         "lon": pa.array(np.concatenate(xs)),
                         "lat": pa.array(np.concatenate(ys))})

    def area_parts(df: pd.DataFrame) -> pd.DataFrame:
        ring = convex_hull(np.c_[df["lon"].to_numpy(),
                                 df["lat"].to_numpy()])
        if ring is None:
            return pd.DataFrame(
                {"stop": [np.int64(df["stop"].iloc[0])],
                 "n_hull": [np.int64(0)], "area2_e6": [np.int64(0)]})
        v = ring[:-1]
        nxt = np.roll(v, -1, axis=0)
        cross = v[:, 0] * nxt[:, 1] - v[:, 1] * nxt[:, 0]
        a2 = int(np.trunc(cross * 1_000_000.0).astype(np.int64).sum())
        return pd.DataFrame({"stop": [np.int64(df["stop"].iloc[0])],
                             "n_hull": [np.int64(len(v))],
                             "area2_e6": [np.int64(a2)]})

    return (ds.map_batches(partial_hulls, batch_format="pyarrow")
            .groupby("stop").map_groups(area_parts,
                                        batch_format="pandas"))


QUERIES["stop_hull_area_parts"] = q_stop_hull_area_parts


def _stop_hull_area_sidecar(img: str) -> str:
    """Jarvis-march replay for stop_hull_area_parts (exact Fraction
    crosses; the cyclic edge set matches the monotone chain's, so the
    truncated shoelace terms sum identically). Content-keyed."""
    import geotile.synth as _sy
    import pyarrow.parquet as pq
    from fractions import Fraction as F
    from pathlib import Path

    p = _oracle_cache_dir() / (
        f"oracle_stophullarea_{Path(img).name}_{_mods_digest(_sy)}"
        ".parquet")
    if not p.exists():
        t = pq.read_table(img, columns=["caption", "lon", "lat"])
        stop = np.array([int(c.split(" ")[4])
                         for c in t["caption"].to_pylist()], np.int64)
        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)

        def jarvis_ring(pts):
            pts = sorted(set(pts))
            if len(pts) < 3:
                return None
            start = min(pts, key=lambda q: (q[1], q[0]))
            hull, cur = [], start
            while True:
                hull.append(cur)
                cand = pts[0] if pts[0] != cur else pts[1]
                for q in pts:
                    if q == cur:
                        continue
                    cr = ((F(cand[0]) - F(cur[0]))
                          * (F(q[1]) - F(cur[1]))
                          - (F(cand[1]) - F(cur[1]))
                          * (F(q[0]) - F(cur[0])))
                    if cr < 0:
                        cand = q
                    elif cr == 0:
                        dc = ((F(cand[0]) - F(cur[0])) ** 2
                              + (F(cand[1]) - F(cur[1])) ** 2)
                        dq = ((F(q[0]) - F(cur[0])) ** 2
                              + (F(q[1]) - F(cur[1])) ** 2)
                        if dq > dc:
                            cand = q
                cur = cand
                if cur == start:
                    return hull

        rows = []
        for s in sorted(set(stop.tolist())):
            m = stop == s
            ring = jarvis_ring(list(zip(lon[m].tolist(),
                                        lat[m].tolist())))
            if ring is None:
                rows.append({"stop": s, "n_hull": 0, "area2_e6": 0})
                continue
            # this jarvis (cr < 0 keeps the most-counterclockwise
            # candidate) already walks CCW — same orientation as the
            # engine's monotone chain, no reversal
            a2 = 0
            for (x1, y1), (x2, y2) in zip(ring,
                                          ring[1:] + ring[:1]):
                a2 += int(np.trunc((np.float64(x1) * np.float64(y2)
                                    - np.float64(y1) * np.float64(x2))
                                   * 1_000_000.0))
            rows.append({"stop": s, "n_hull": len(ring),
                         "area2_e6": a2})
        out = pa.Table.from_pylist(rows)
        _oracle_cache_dir().mkdir(parents=True, exist_ok=True)
        _atomic_write_table(out, p)
    return str(p)


def _stop_hull_area_sql(img: str) -> str:
    return (f"SELECT stop, n_hull, area2_e6 "
            f"FROM read_parquet('{_stop_hull_area_sidecar(img)}')")


def q_dup_rate_sources(sf_dir: str):
    """Per-source duplication rate: docs vs distinct texts — the
    dedup-savings estimate per ingestion feed. Distinct keys are
    composite (Rabin-Karp h64, first-16-chars) exactly as
    llm_corpus_prep shards, so long texts never ride the shuffle;
    partials dedup per batch first."""
    from geotile.ops.hashing import hash_strings

    docs = _read(sf_dir, "documents", ["source", "text"])

    def keys(t: pa.Table) -> pa.Table:
        h = hash_strings(t["text"]).view(np.int64)
        pref = pc.utf8_slice_codeunits(t["text"], 0, 16)
        g = pa.table({"source": t["source"], "h": pa.array(h),
                      "p": pref}).group_by(["source", "h", "p"]) \
            .aggregate([([], "count_all")])
        return pa.table({"source": g["source"], "h": g["h"],
                         "p": g["p"],
                         "n": g["count_all"].cast(pa.int64())})

    ded = (docs.map_batches(keys, batch_format="pyarrow")
           .groupby(["source", "h", "p"]).sum("n"))

    def per_source(t: pa.Table) -> pa.Table:
        g = pa.table({"source": t["source"],
                      "n": t["sum(n)"]}).group_by("source") \
            .aggregate([([], "count_all"), ("n", "sum")])
        return pa.table({"source": g["source"],
                         "n_unique": g["count_all"].cast(pa.int64()),
                         "n_docs": g["n_sum"]})

    out = (ded.map_batches(per_source, batch_format="pyarrow")
           .groupby("source").sum(["n_unique", "n_docs"]))
    return _rename(out, ["source", "n_unique", "n_docs"])


QUERIES["dup_rate_sources"] = q_dup_rate_sources
ORACLE_SQL["dup_rate_sources"] = """
        SELECT source,
               CAST(count(DISTINCT text) AS BIGINT) AS n_unique,
               count(*) AS n_docs
        FROM documents GROUP BY 1
    """


def q_dup_degree_hist(sf_dir: str):
    """Near-dup graph degree distribution: how many docs have k
    MinHash-LSH neighbors — the fan-out audit before clustering.
    Stage REUSE of dedup.minhash_lsh_pairs; degrees come from one
    both-endpoint scatter + node groupby, the histogram from a
    degree-cardinality second pass. Oracle folds the scalar-replay
    pairs sidecar the same way."""
    from geotile.ops.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(
        _read(sf_dir, "documents", ["doc_id", "text"]), threshold=0.35)

    def scatter(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        g = pa.table({"node": pa.array(np.r_[a, b])}) \
            .group_by("node").aggregate([([], "count_all")])
        return pa.table({"node": g["node"],
                         "d": g["count_all"].cast(pa.int64())})

    deg = (pairs.map_batches(scatter, batch_format="pyarrow")
           .groupby("node").sum("d"))

    def hist(t: pa.Table) -> pa.Table:
        g = pa.table({"degree": t["sum(d)"]}).group_by("degree") \
            .aggregate([([], "count_all")])
        return pa.table({"degree": g["degree"],
                         "n_docs": g["count_all"].cast(pa.int64())})

    out = (deg.map_batches(hist, batch_format="pyarrow")
           .groupby("degree").sum("n_docs"))
    return _rename(out, ["degree", "n_docs"])


QUERIES["dup_degree_hist"] = q_dup_degree_hist


def _dup_degree_sql(sf_dir: str) -> str:
    return f"""
        WITH p AS (SELECT a, b
                   FROM read_parquet('{_minhash_pairs_sidecar(sf_dir)}')),
        e AS (SELECT a AS node FROM p UNION ALL SELECT b FROM p),
        d AS (SELECT node, count(*) AS degree FROM e GROUP BY 1)
        SELECT CAST(degree AS BIGINT) AS degree, count(*) AS n_docs
        FROM d GROUP BY 1
    """


def q_all_ontime_orders(sf_dir: str):
    """FOR-ALL over a join edge: orders whose EVERY lineitem shipped
    within 30 days — the NOT-EXISTS-late phrasing that reduces to a
    per-order MAX lead + threshold, never a correlated probe. One
    bucketed co-partition carries the pair; per-order max-lead
    partials collapse to priority counts."""
    from geotile.ops.relational import bucketed_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderpriority"])
    j = bucketed_join(li, orders, "l_orderkey", "o_orderkey",
                      n_buckets=16)

    def per_order(t: pa.Table) -> pa.Table:
        lead = pc.subtract(
            pc.divide(t["l_shipdate"].cast(pa.int64()),
                      pa.scalar(86_400_000_000, pa.int64())),
            pc.divide(t["o_orderdate"].cast(pa.int64()),
                      pa.scalar(86_400_000_000, pa.int64())))
        g = pa.table({"k": t["o_orderkey"],
                      "pri": t["o_orderpriority"], "lead": lead}) \
            .group_by(["k", "pri"]).aggregate([("lead", "max")])
        return pa.table({"k": g["k"], "pri": g["pri"],
                         "mx": g["lead_max"]})

    per = (j.map_batches(per_order, batch_format="pyarrow")
           .groupby(["k", "pri"]).max("mx"))

    def count(t: pa.Table) -> pa.Table:
        ok = pc.less_equal(t["max(mx)"], pa.scalar(30)).cast(pa.int64())
        g = pa.table({"pri": t["pri"], "ok": ok}).group_by("pri") \
            .aggregate([([], "count_all"), ("ok", "sum")])
        return pa.table({"o_orderpriority": g["pri"],
                         "n_orders": g["count_all"].cast(pa.int64()),
                         "n_all_ontime": g["ok_sum"]})

    out = (per.map_batches(count, batch_format="pyarrow")
           .groupby("o_orderpriority").sum(["n_orders",
                                            "n_all_ontime"]))
    return _rename(out, ["o_orderpriority", "n_orders",
                         "n_all_ontime"])


QUERIES["all_ontime_orders"] = q_all_ontime_orders
ORACLE_SQL["all_ontime_orders"] = """
        WITH per AS (SELECT o_orderkey, o_orderpriority,
                            MAX(epoch_us(l_shipdate) // 86400000000
                                - epoch_us(o_orderdate) // 86400000000)
                                AS mx
                     FROM lineitem
                     JOIN orders ON l_orderkey = o_orderkey
                     GROUP BY 1, 2)
        SELECT o_orderpriority, count(*) AS n_orders,
               CAST(count(*) FILTER (mx <= 30) AS BIGINT)
                   AS n_all_ontime
        FROM per GROUP BY 1
    """


def q_stop_bbox_iou_pairs(sf_dir: str):
    """BBox-overlap refinement table: for every stop pair whose
    bounding boxes intersect, the exact truncated-lattice areas of
    the intersection and both boxes — the filter-stage IoU inputs of
    a spatial join. The per-stop bbox aggregate is 30 rows; the pair
    expansion is driver-side epilogue math with each area a SINGLE
    IEEE product before truncation, mirrored verbatim in SQL."""
    from geotile.ops.tiles import read_image_table

    ds = read_image_table(_image_dir_for(sf_dir),
                          columns=["caption", "lon", "lat"])

    def stats(t: pa.Table) -> pa.Table:
        stop = pc.cast(pc.list_element(
            pc.split_pattern(t["caption"], " "), 4), pa.int64())
        g = pa.table({"stop": stop, "lon": t["lon"],
                      "lat": t["lat"]}).group_by("stop").aggregate(
            [("lon", "min"), ("lon", "max"), ("lat", "min"),
             ("lat", "max")])
        return g.rename_columns(["stop", "w", "e", "s", "n"])

    box = (ds.map_batches(stats, batch_format="pyarrow")
           .groupby("stop")
           .aggregate(rd.aggregate.Min("w"), rd.aggregate.Max("e"),
                      rd.aggregate.Min("s"), rd.aggregate.Max("n"))
           ).take_all()
    box.sort(key=lambda r: r["stop"])
    rows = []
    for i, a in enumerate(box):
        for b in box[i + 1:]:
            iw = min(a["max(e)"], b["max(e)"]) - max(a["min(w)"],
                                                     b["min(w)"])
            ih = min(a["max(n)"], b["max(n)"]) - max(a["min(s)"],
                                                     b["min(s)"])
            if iw <= 0.0 or ih <= 0.0:
                continue
            rows.append({
                "stop_a": a["stop"], "stop_b": b["stop"],
                "inter_e6": int(np.trunc(np.float64(iw)
                                         * np.float64(ih)
                                         * 1_000_000.0)),
                "area_a_e6": int(np.trunc(
                    np.float64(a["max(e)"] - a["min(w)"])
                    * np.float64(a["max(n)"] - a["min(s)"])
                    * 1_000_000.0)),
                "area_b_e6": int(np.trunc(
                    np.float64(b["max(e)"] - b["min(w)"])
                    * np.float64(b["max(n)"] - b["min(s)"])
                    * 1_000_000.0))})
    return pd.DataFrame(rows)


QUERIES["stop_bbox_iou_pairs"] = q_stop_bbox_iou_pairs


def _stop_bbox_iou_sql(img_dir: str) -> str:
    return f"""
        WITH b AS (SELECT CAST(string_split(caption, ' ')[5] AS BIGINT)
                              AS stop,
                          min(lon) AS w, max(lon) AS e,
                          min(lat) AS s, max(lat) AS n
                   FROM read_parquet('{img_dir}/part-*.parquet')
                   GROUP BY 1)
        SELECT a.stop AS stop_a, c.stop AS stop_b,
               CAST(trunc((least(a.e, c.e) - greatest(a.w, c.w))
                          * (least(a.n, c.n) - greatest(a.s, c.s))
                          * 1000000.0) AS BIGINT) AS inter_e6,
               CAST(trunc((a.e - a.w) * (a.n - a.s) * 1000000.0)
                    AS BIGINT) AS area_a_e6,
               CAST(trunc((c.e - c.w) * (c.n - c.s) * 1000000.0)
                    AS BIGINT) AS area_b_e6
        FROM b a JOIN b c ON a.stop < c.stop
        WHERE least(a.e, c.e) - greatest(a.w, c.w) > 0.0
          AND least(a.n, c.n) - greatest(a.s, c.s) > 0.0
    """


def q_source_trigram_affinity(sf_dir: str):
    """Character-trigram profile affinity between two fixed
    sources (src0 vs src1): exact integer cosine PARTS — dot product and
    both squared norms of the trigram count vectors. (source,
    trigram) counts ride one vocabulary-bounded shuffle; the dot is a
    sorted-merge over the two count maps. No float ever forms; the
    epilogue emits three ints."""
    docs = _read(sf_dir, "documents", ["source", "text"])

    def counts(t: pa.Table) -> pa.Table:
        f = t.filter(pc.is_in(t["source"],
                              value_set=pa.array(["src0", "src1"])))
        if len(f) == 0:
            return pa.table({"source": pa.array([], pa.string()),
                             "tg": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        src = f["source"].to_numpy(zero_copy_only=False)
        txt = f["text"].to_numpy(zero_copy_only=False)
        ss, gs = [], []
        for s, x in zip(src, txt):
            k = len(x) - 2
            if k <= 0:
                continue
            ss.extend([s] * k)
            gs.extend(x[i:i + 3] for i in range(k))
        g = pa.table({"source": pa.array(ss, pa.string()),
                      "tg": pa.array(gs, pa.string())}) \
            .group_by(["source", "tg"]).aggregate([([], "count_all")])
        return pa.table({"source": g["source"], "tg": g["tg"],
                         "n": g["count_all"].cast(pa.int64())})

    agg = (docs.map_batches(counts, batch_format="pyarrow")
           .groupby(["source", "tg"]).sum("n")).take_all()
    c0, c1 = {}, {}
    for r in agg:
        (c0 if r["source"] == "src0" else c1)[r["tg"]] = r["sum(n)"]
    dot = sum(v * c1.get(k, 0) for k, v in c0.items())
    n0 = sum(v * v for v in c0.values())
    n1 = sum(v * v for v in c1.values())
    return pd.DataFrame({"dot": [dot], "norm0_sq": [n0],
                         "norm1_sq": [n1]})


QUERIES["source_trigram_affinity"] = q_source_trigram_affinity
ORACLE_SQL["source_trigram_affinity"] = """
        WITH g AS (SELECT source,
                          substr(text, CAST(u + 1 AS BIGINT), 3) AS tg
                   FROM documents,
                        UNNEST(range(greatest(len(text) - 2, 0))) s(u)
                   WHERE source IN ('src0', 'src1')),
        c AS (SELECT tg,
                     count(*) FILTER (source = 'src0') AS n0,
                     count(*) FILTER (source = 'src1') AS n1
              FROM g GROUP BY 1)
        SELECT CAST(SUM(n0 * n1) AS BIGINT) AS dot,
               CAST(SUM(n0 * n0) AS BIGINT) AS norm0_sq,
               CAST(SUM(n1 * n1) AS BIGINT) AS norm1_sq
        FROM c
    """


def q_seasonal_index_months(sf_dir: str):
    """Seasonal index parts: revenue per calendar month-of-year
    across all years, plus the grand total — the exact-integer
    seasonality profile (index = 12·month_share, left as parts).
    12-row partials, one shuffle."""
    orders = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def part(t: pa.Table) -> pa.Table:
        m = pc.month(t["o_orderdate"]).cast(pa.int64())
        cents = pc.floor(pc.add(pc.multiply(
            t["o_totalprice"], pa.scalar(100.0)),
            pa.scalar(0.5))).cast(pa.int64())
        g = pa.table({"month": m, "c": cents}).group_by("month") \
            .aggregate([([], "count_all"), ("c", "sum")])
        return pa.table({"month": g["month"],
                         "n_orders": g["count_all"].cast(pa.int64()),
                         "revenue_cents": g["c_sum"]})

    rows = (orders.map_batches(part, batch_format="pyarrow")
            .groupby("month").sum(["n_orders",
                                   "revenue_cents"])).take_all()
    tot = sum(r["sum(revenue_cents)"] for r in rows)
    return pd.DataFrame(sorted(
        ({"month": r["month"], "n_orders": r["sum(n_orders)"],
          "revenue_cents": r["sum(revenue_cents)"],
          "share_ppm": r["sum(revenue_cents)"] * 1_000_000 // tot}
         for r in rows), key=lambda x: x["month"]))


QUERIES["seasonal_index_months"] = q_seasonal_index_months
ORACLE_SQL["seasonal_index_months"] = """
        WITH m AS (SELECT CAST(EXTRACT(month FROM o_orderdate)
                               AS BIGINT) AS month,
                          count(*) AS n_orders,
                          SUM(CAST(floor(o_totalprice * 100.0 + 0.5)
                                   AS BIGINT)) AS revenue_cents
                   FROM orders GROUP BY 1),
        t AS (SELECT SUM(revenue_cents) AS tot FROM m)
        SELECT month, n_orders, revenue_cents,
               revenue_cents * 1000000 // tot AS share_ppm
        FROM m, t
    """


def q_weekend_aov_parts(sf_dir: str):
    """Weekend vs weekday average-order-value parts: exact counts and
    cent sums per side (epoch-aligned weekday split, same closed form
    as the business-day op) — the AOV lift readout without a float
    mean. 2-row partials."""
    orders = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def part(t: pa.Table) -> pa.Table:
        day = pc.divide(t["o_orderdate"].cast(pa.int64()),
                        pa.scalar(86_400_000_000, pa.int64())) \
            .to_numpy(zero_copy_only=False)
        is_we = (((day + 4) % 7) >= 5).astype(np.int64)
        cents = pc.floor(pc.add(pc.multiply(
            t["o_totalprice"], pa.scalar(100.0)),
            pa.scalar(0.5))).cast(pa.int64())
        g = pa.table({"weekend": pa.array(is_we), "c": cents}) \
            .group_by("weekend").aggregate(
                [([], "count_all"), ("c", "sum")])
        return pa.table({"weekend": g["weekend"],
                         "n_orders": g["count_all"].cast(pa.int64()),
                         "revenue_cents": g["c_sum"]})

    out = (orders.map_batches(part, batch_format="pyarrow")
           .groupby("weekend").sum(["n_orders", "revenue_cents"]))
    return _rename(out, ["weekend", "n_orders", "revenue_cents"])


QUERIES["weekend_aov_parts"] = q_weekend_aov_parts
ORACLE_SQL["weekend_aov_parts"] = """
        SELECT CAST((epoch_us(o_orderdate) // 86400000000 + 4) % 7 >= 5
                    AS BIGINT) AS weekend,
               count(*) AS n_orders,
               CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5)
                             AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM orders GROUP BY 1
    """


def q_purchase_gap_median(sf_dir: str):
    """Global inter-purchase cadence: the lower-median gap (whole
    seconds) between a user's consecutive purchases, over ALL users'
    gaps — per-user diffs inside one co-partition, then the selection
    is count algebra over the seconds histogram (no sort). Also
    reports the gap count."""
    from geotile.ops.relational import _with_bucket

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id",
                                  "event_type"])

    def gaps(df: pd.DataFrame) -> pd.DataFrame:
        p = df[df["event_type"] == "purchase"]
        if len(p) < 2:
            return pd.DataFrame({"gap_s": pd.Series(dtype=np.int64),
                                 "n": pd.Series(dtype=np.int64)})
        u = p["user_id"].to_numpy(np.int64)
        e = p["event_id"].to_numpy(np.int64)
        t = p["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        o = np.lexsort((e, t, u))
        uu, tu = u[o], t[o]
        same = uu[1:] == uu[:-1]
        g = ((tu[1:] - tu[:-1]) // 1_000_000)[same]
        if len(g) == 0:
            return pd.DataFrame({"gap_s": pd.Series(dtype=np.int64),
                                 "n": pd.Series(dtype=np.int64)})
        vc = pd.Series(g).value_counts().sort_index()
        return pd.DataFrame({"gap_s": vc.index.to_numpy(np.int64),
                             "n": vc.to_numpy(np.int64)})

    hist = (_with_bucket(ev, "user_id", 32)
            .groupby("bucket").map_groups(gaps, batch_format="pandas")
            .groupby("gap_s").sum("n")).take_all()
    hist.sort(key=lambda r: r["gap_s"])
    ns = np.array([r["sum(n)"] for r in hist], dtype=np.int64)
    gs = np.array([r["gap_s"] for r in hist], dtype=np.int64)
    cum = np.cumsum(ns)
    n = int(cum[-1]) if len(cum) else 0
    med = int(gs[np.searchsorted(cum, (n - 1) // 2 + 1)]) if n else 0
    return pd.DataFrame({"n_gaps": [n], "median_gap_s": [med]})


QUERIES["purchase_gap_median"] = q_purchase_gap_median
ORACLE_SQL["purchase_gap_median"] = """
        WITH p AS (SELECT user_id, epoch_us(ts) AS us, event_id
                   FROM events WHERE event_type = 'purchase'),
        g AS (SELECT (us - LAG(us) OVER (PARTITION BY user_id
                          ORDER BY us, event_id)) // 1000000 AS gap_s
              FROM p),
        gg AS (SELECT gap_s FROM g WHERE gap_s IS NOT NULL),
        nn AS (SELECT count(*) AS n FROM gg)
        SELECT (SELECT n FROM nn) AS n_gaps,
               (SELECT gap_s FROM gg ORDER BY gap_s LIMIT 1 OFFSET
                (SELECT (n - 1) // 2 FROM nn)) AS median_gap_s
    """


def q_balance_asymmetry_nations(sf_dir: str):
    """Two-dimension reconciliation: per nation, total supplier
    account balance vs total customer balance and their exact
    difference — the counterparty-exposure sheet. Both dimension
    scans reduce to 25-row partials and meet in a driver merge; no
    join operator runs."""
    def side(table: str, key: str, bal: str):
        ds = _read(sf_dir, table, [key, bal])

        def part(t: pa.Table) -> pa.Table:
            cents = pc.floor(pc.add(pc.multiply(
                t[bal], pa.scalar(100.0)),
                pa.scalar(0.5))).cast(pa.int64())
            g = pa.table({"nk": t[key].cast(pa.int64()),
                          "c": cents}).group_by("nk").aggregate(
                [([], "count_all"), ("c", "sum")])
            return pa.table({"nk": g["nk"],
                             "n": g["count_all"].cast(pa.int64()),
                             "c": g["c_sum"]})

        return {r["nk"]: (r["sum(n)"], r["sum(c)"])
                for r in (ds.map_batches(part, batch_format="pyarrow")
                          .groupby("nk").sum(["n", "c"])).take_all()}

    sup = side("supplier", "s_nationkey", "s_acctbal")
    cus = side("customer", "c_nationkey", "c_acctbal")
    rows = []
    for nk in sorted(set(sup) | set(cus)):
        sn, sc = sup.get(nk, (0, 0))
        cn, cc = cus.get(nk, (0, 0))
        rows.append({"n_nationkey": nk, "n_supp": sn,
                     "supp_cents": sc, "n_cust": cn, "cust_cents": cc,
                     "gap_cents": sc - cc})
    return pd.DataFrame(rows)


QUERIES["balance_asymmetry_nations"] = q_balance_asymmetry_nations
ORACLE_SQL["balance_asymmetry_nations"] = """
        WITH s AS (SELECT CAST(s_nationkey AS BIGINT) AS nk,
                          count(*) AS n,
                          SUM(CAST(floor(s_acctbal * 100.0 + 0.5)
                                   AS BIGINT)) AS c
                   FROM supplier GROUP BY 1),
        c AS (SELECT CAST(c_nationkey AS BIGINT) AS nk, count(*) AS n,
                     SUM(CAST(floor(c_acctbal * 100.0 + 0.5)
                              AS BIGINT)) AS c
              FROM customer GROUP BY 1)
        SELECT COALESCE(s.nk, c.nk) AS n_nationkey,
               CAST(COALESCE(s.n, 0) AS BIGINT) AS n_supp,
               CAST(COALESCE(s.c, 0) AS BIGINT) AS supp_cents,
               CAST(COALESCE(c.n, 0) AS BIGINT) AS n_cust,
               CAST(COALESCE(c.c, 0) AS BIGINT) AS cust_cents,
               CAST(COALESCE(s.c, 0) - COALESCE(c.c, 0) AS BIGINT)
                   AS gap_cents
        FROM s FULL OUTER JOIN c ON s.nk = c.nk
    """


def q_vocab_growth_curve(sf_dir: str):
    """Heaps'-law audit: distinct token count after the first 10%,
    50% and 100% of documents (by doc_id) — is the vocabulary still
    growing? Three prefix-distinct counts from ONE tagged dedup pass:
    each (token, tier) marks the smallest prefix that contains the
    token, so tiers accumulate without re-scanning."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = docs.count()
    cut10, cut50 = n_docs // 10, n_docs // 2

    def toks(t: pa.Table) -> pa.Table:
        lists = pc.split_pattern(t["text"], " ")
        flat = pc.list_flatten(lists).to_numpy(zero_copy_only=False)
        lens = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False)
        did = np.repeat(t["doc_id"].to_numpy(), lens)
        keep = flat != ""
        flat, did = flat[keep], did[keep]
        tier = np.where(did < cut10, 0,
                        np.where(did < cut50, 1, 2)).astype(np.int64)
        g = pa.table({"token": pa.array(flat),
                      "tier": pa.array(tier)}).group_by("token") \
            .aggregate([("tier", "min")])
        return pa.table({"token": g["token"], "tier": g["tier_min"]})

    first_tier = (docs.map_batches(toks, batch_format="pyarrow")
                  .groupby("token").min("tier")).take_all()
    counts = [0, 0, 0]
    for r in first_tier:
        counts[r["min(tier)"]] += 1
    return pd.DataFrame({
        "prefix_pct": [10, 50, 100],
        "n_distinct": [counts[0], counts[0] + counts[1],
                       counts[0] + counts[1] + counts[2]]})


QUERIES["vocab_growth_curve"] = q_vocab_growth_curve
ORACLE_SQL["vocab_growth_curve"] = """
        WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                   FROM documents),
        ww AS (SELECT doc_id, t FROM w WHERE t <> ''),
        n AS (SELECT count(*) AS nd FROM documents)
        SELECT 10 AS prefix_pct,
               (SELECT count(DISTINCT t) FROM ww, n
                WHERE doc_id < nd // 10) AS n_distinct
        UNION ALL
        SELECT 50, (SELECT count(DISTINCT t) FROM ww, n
                    WHERE doc_id < nd // 2)
        UNION ALL
        SELECT 100, (SELECT count(DISTINCT t) FROM ww)
    """


def q_nn1_accuracy_labels(sf_dir: str):
    """1-NN label-agreement audit: every vector queries the corpus for
    its nearest OTHER vector (exact cosine, the knn tie discipline —
    round-6 then vec_id) and we score per true label how often the
    neighbor agrees — the intrinsic embedding-quality readout.
    ann.topk_bruteforce keeps shuffle at k-per-query-per-batch; the
    label lookup is a broadcast gather; at 100 TB the LSH-bucketed
    path replaces the broadcast query matrix."""
    from geotile.ops.ann import topk_bruteforce

    emb = _read(sf_dir, "embeddings", ["vec_id", "label", "embedding"])
    rows = emb.select_columns(["vec_id", "label"]).take_all()
    ids = np.array(sorted(r["vec_id"] for r in rows), dtype=np.int64)
    lab_of = {r["vec_id"]: r["label"] for r in rows}
    labels = np.array([lab_of[i] for i in ids], dtype=np.int64)
    all_rows = emb.select_columns(["vec_id", "embedding"]).take_all()
    all_rows.sort(key=lambda r: r["vec_id"])
    Q = np.array([r["embedding"] for r in all_rows], dtype=np.float64)
    nn = topk_bruteforce(emb, ids, Q, k=1)
    lref = ray.put((ids, labels))

    def score(t: pa.Table) -> pa.Table:
        ids_, labels_ = _broadcast(lref)
        qi = np.searchsorted(ids_, t["query_id"].to_numpy(
            zero_copy_only=False))
        ni = np.searchsorted(ids_, t["vec_id"].to_numpy(
            zero_copy_only=False))
        true = labels_[qi]
        ok = (labels_[ni] == true).astype(np.int64)
        g = pa.table({"label": pa.array(true),
                      "ok": pa.array(ok)}).group_by("label") \
            .aggregate([([], "count_all"), ("ok", "sum")])
        return pa.table({"label": g["label"],
                         "n": g["count_all"].cast(pa.int64()),
                         "n_correct": g["ok_sum"]})

    out = (nn.map_batches(score, batch_format="pyarrow")
           .groupby("label").sum(["n", "n_correct"]))
    return _rename(out, ["label", "n", "n_correct"])


QUERIES["nn1_accuracy_labels"] = q_nn1_accuracy_labels
ORACLE_SQL["nn1_accuracy_labels"] = """
        WITH s AS (SELECT q.vec_id AS qid, q.label AS ql,
                          e.label AS nl,
                          row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY round(list_cosine_similarity(
                                  CAST(q.embedding AS DOUBLE[]),
                                  CAST(e.embedding AS DOUBLE[])), 6)
                                  DESC, e.vec_id ASC) AS rn
                   FROM embeddings q CROSS JOIN embeddings e
                   WHERE e.vec_id <> q.vec_id)
        SELECT CAST(ql AS BIGINT) AS label, count(*) AS n,
               CAST(count(*) FILTER (nl = ql) AS BIGINT) AS n_correct
        FROM s WHERE rn = 1 GROUP BY 1
    """


def q_status_share_monthly(sf_dir: str):
    """Order-status mix time series: per month, counts per status and
    the exact ppm share — the fulfillment-health trend. Month×status
    partials (≤ months·3), shares from the same aggregate."""
    orders = _read(sf_dir, "orders", ["o_orderdate", "o_orderstatus"])

    def part(t: pa.Table) -> pa.Table:
        m = pc.add(pc.multiply(pc.year(t["o_orderdate"]),
                               pa.scalar(12, pa.int64())),
                   pc.subtract(pc.month(t["o_orderdate"]),
                               pa.scalar(1, pa.int64())))
        g = pa.table({"month": m, "st": t["o_orderstatus"]}) \
            .group_by(["month", "st"]).aggregate([([], "count_all")])
        return pa.table({"month": g["month"], "st": g["st"],
                         "n": g["count_all"].cast(pa.int64())})

    rows = (orders.map_batches(part, batch_format="pyarrow")
            .groupby(["month", "st"]).sum("n")).take_all()
    tot = {}
    for r in rows:
        tot[r["month"]] = tot.get(r["month"], 0) + r["sum(n)"]
    return pd.DataFrame(sorted(
        ({"month": r["month"], "o_orderstatus": r["st"],
          "n": r["sum(n)"],
          "share_ppm": r["sum(n)"] * 1_000_000 // tot[r["month"]]}
         for r in rows),
        key=lambda x: (x["month"], x["o_orderstatus"])))


QUERIES["status_share_monthly"] = q_status_share_monthly
ORACLE_SQL["status_share_monthly"] = """
        WITH m AS (SELECT CAST(EXTRACT(year FROM o_orderdate) * 12
                               + EXTRACT(month FROM o_orderdate) - 1
                               AS BIGINT) AS month,
                          o_orderstatus, count(*) AS n
                   FROM orders GROUP BY 1, 2),
        t AS (SELECT month, SUM(n) AS tot FROM m GROUP BY 1)
        SELECT m.month, m.o_orderstatus, CAST(m.n AS BIGINT) AS n,
               m.n * 1000000 // t.tot AS share_ppm
        FROM m JOIN t USING (month)
    """


def q_size_price_moments_brands(sf_dir: str):
    """Grouped correlation parts on the part dimension: per brand the
    exact integer moments (n, Σsize, Σcents, Σsize², Σsize·cents) —
    does bigger stock cost more? Brand-cardinality partials, one
    shuffle."""
    part = _read(sf_dir, "part", ["p_brand", "p_size",
                                  "p_retailprice"])

    def moments(t: pa.Table) -> pa.Table:
        sz = t["p_size"].cast(pa.int64())
        cents = pc.floor(pc.add(pc.multiply(
            t["p_retailprice"], pa.scalar(100.0)),
            pa.scalar(0.5))).cast(pa.int64())
        g = pa.table({"p_brand": t["p_brand"], "s": sz, "c": cents,
                      "ss": pc.multiply(sz, sz),
                      "sc": pc.multiply(sz, cents)}) \
            .group_by("p_brand").aggregate(
                [([], "count_all"), ("s", "sum"), ("c", "sum"),
                 ("ss", "sum"), ("sc", "sum")])
        return pa.table({"p_brand": g["p_brand"],
                         "n": g["count_all"].cast(pa.int64()),
                         "sum_size": g["s_sum"], "sum_cents": g["c_sum"],
                         "sum_size_sq": g["ss_sum"],
                         "sum_size_cents": g["sc_sum"]})

    out = (part.map_batches(moments, batch_format="pyarrow")
           .groupby("p_brand").sum(["n", "sum_size", "sum_cents",
                                    "sum_size_sq", "sum_size_cents"]))
    return _rename(out, ["p_brand", "n", "sum_size", "sum_cents",
                         "sum_size_sq", "sum_size_cents"])


QUERIES["size_price_moments_brands"] = q_size_price_moments_brands
ORACLE_SQL["size_price_moments_brands"] = """
        WITH p AS (SELECT p_brand, CAST(p_size AS BIGINT) AS s,
                          CAST(floor(p_retailprice * 100.0 + 0.5)
                               AS BIGINT) AS c
                   FROM part)
        SELECT p_brand, count(*) AS n,
               CAST(SUM(s) AS BIGINT) AS sum_size,
               CAST(SUM(c) AS BIGINT) AS sum_cents,
               CAST(SUM(s * s) AS BIGINT) AS sum_size_sq,
               CAST(SUM(s * c) AS BIGINT) AS sum_size_cents
        FROM p GROUP BY 1
    """


def q_phash_popcount_stats(sf_dir: str):
    """Perceptual-hash bit-density audit: per image format, the
    population-count distribution of stored phashes (sum/min/max of
    set bits) — a skewed bit density flags a degenerate hash. Pure
    METADATA scan (payload never read); popcount via unpackbits on
    the int64 view, replayed by DuckDB's bit_count."""
    from geotile.ops.tiles import read_image_table

    ds = read_image_table(_image_dir_for(sf_dir),
                          columns=["fmt", "phash"])

    def pop(t: pa.Table) -> pa.Table:
        h = t["phash"].to_numpy(zero_copy_only=False)
        bits = np.unpackbits(h.view(np.uint8)).reshape(len(h), 64) \
            .sum(axis=1).astype(np.int64)
        g = pa.table({"fmt": t["fmt"], "b": pa.array(bits)}) \
            .group_by("fmt").aggregate(
                [([], "count_all"), ("b", "sum"), ("b", "min"),
                 ("b", "max")])
        return g.rename_columns(["fmt", "n", "sum_bits", "min_bits",
                                 "max_bits"])

    out = (ds.map_batches(pop, batch_format="pyarrow")
           .groupby("fmt")
           .aggregate(rd.aggregate.Sum("n"),
                      rd.aggregate.Sum("sum_bits"),
                      rd.aggregate.Min("min_bits"),
                      rd.aggregate.Max("max_bits")))
    return _rename(out, ["fmt", "n", "sum_bits", "min_bits",
                         "max_bits"])


QUERIES["phash_popcount_stats"] = q_phash_popcount_stats


def _phash_popcount_sql(img_dir: str) -> str:
    return f"""
        SELECT fmt, count(*) AS n,
               CAST(SUM(bit_count(CAST(phash AS BIGINT))) AS BIGINT)
                   AS sum_bits,
               CAST(MIN(bit_count(CAST(phash AS BIGINT))) AS BIGINT)
                   AS min_bits,
               CAST(MAX(bit_count(CAST(phash AS BIGINT))) AS BIGINT)
                   AS max_bits
        FROM read_parquet('{img_dir}/part-*.parquet')
        GROUP BY 1
    """


def q_large_volume_orders_q18(sf_dir: str):
    """TPC-H Q18 shape (large-volume customers): orders whose total
    line quantity exceeds 250 units, with the buyer's name attached.
    The per-order sums form via batch partials + ONE orderkey
    groupby; the HAVING filter is so selective (~1.4% of orders)
    that the survivors broadcast — orders and customer are each
    scanned once with the small side as a lookup, no fact-fact
    shuffle. l_quantity is integral by TPC-H construction; the cast
    asserts it stays exact."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def part(t: pa.Table) -> pa.Table:
        q = t["l_quantity"].cast(pa.int64())
        g = pa.table({"k": t["l_orderkey"], "q": q}) \
            .group_by("k").aggregate([("q", "sum")])
        return pa.table({"l_orderkey": g["k"], "q": g["q_sum"]})

    big = (li.map_batches(part, batch_format="pyarrow")
           .groupby("l_orderkey").sum("q")
           .map_batches(lambda t: t.filter(pc.greater(
               t["sum(q)"], pa.scalar(250, pa.int64()))),
               batch_format="pyarrow")).take_all()
    qty_of = {r["l_orderkey"]: r["sum(q)"] for r in big}
    kref = ray.put(qty_of)

    def pick_orders(t: pa.Table) -> pa.Table:
        m = _broadcast(kref)
        keys = t["o_orderkey"].to_numpy(zero_copy_only=False)
        keep = np.fromiter((k in m for k in keys.tolist()),
                           bool, len(keys))
        t = t.filter(pa.array(keep))
        cents = pc.floor(pc.add(pc.multiply(
            t["o_totalprice"], pa.scalar(100.0)),
            pa.scalar(0.5))).cast(pa.int64())
        sq = pa.array([m[k] for k in
                       t["o_orderkey"].to_pylist()], pa.int64())
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "c_custkey": t["o_custkey"],
                         "total_cents": cents, "sum_qty": sq})

    hits = _read(sf_dir, "orders",
                 ["o_orderkey", "o_custkey", "o_totalprice"]) \
        .map_batches(pick_orders, batch_format="pyarrow").take_all()
    by_cust: dict[int, list] = {}
    for r in hits:
        by_cust.setdefault(r["c_custkey"], []).append(r)
    cref = ray.put(by_cust)

    def attach_name(t: pa.Table) -> pa.Table:
        m = _broadcast(cref)
        rows = []
        for ck, nm in zip(t["c_custkey"].to_pylist(),
                          t["c_name"].to_pylist()):
            for r in m.get(ck, ()):
                rows.append((r["o_orderkey"], ck, nm,
                             r["total_cents"], r["sum_qty"]))
        if not rows:
            return pa.table({"o_orderkey": pa.array([], pa.int64()),
                             "c_custkey": pa.array([], pa.int64()),
                             "c_name": pa.array([], pa.string()),
                             "total_cents": pa.array([], pa.int64()),
                             "sum_qty": pa.array([], pa.int64())})
        ok, ckk, nm, tc, sq = zip(*rows)
        return pa.table({"o_orderkey": pa.array(ok, pa.int64()),
                         "c_custkey": pa.array(ckk, pa.int64()),
                         "c_name": pa.array(nm, pa.string()),
                         "total_cents": pa.array(tc, pa.int64()),
                         "sum_qty": pa.array(sq, pa.int64())})

    return _read(sf_dir, "customer", ["c_custkey", "c_name"]) \
        .map_batches(attach_name, batch_format="pyarrow")


QUERIES["large_volume_orders_q18"] = q_large_volume_orders_q18
ORACLE_SQL["large_volume_orders_q18"] = """
        WITH s AS (SELECT l_orderkey,
                          CAST(SUM(CAST(l_quantity AS BIGINT))
                               AS BIGINT) AS q
                   FROM lineitem GROUP BY 1
                   HAVING SUM(CAST(l_quantity AS BIGINT)) > 250)
        SELECT o.o_orderkey, c.c_custkey, c.c_name,
               CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT)
                   AS total_cents,
               s.q AS sum_qty
        FROM s JOIN orders o ON o.o_orderkey = s.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
    """


def q_supplier_count_q16(sf_dir: str):
    """TPC-H Q16 shape (parts/supplier relationship): how many
    DISTINCT suppliers ship each (brand, size) combination, excluding
    one boycotted brand. lineitem collapses to its distinct
    (partkey, suppkey) edge set first (batch dedup partials + one
    pair-cardinality groupby on a packed int64 — partkey·2²⁰+suppkey,
    exact while partkey < 2⁴³); the part dim broadcasts sorted; the
    (brand,size,supp) distinct pass then rides brand-code-packed keys
    so no string ever shuffles."""
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def pair_part(t: pa.Table) -> pa.Table:
        packed = pc.add(pc.multiply(t["l_partkey"],
                                    pa.scalar(1 << 20, pa.int64())),
                        t["l_suppkey"])
        return pa.table({"pk": packed}).group_by("pk").aggregate([])

    pairs = (li.map_batches(pair_part, batch_format="pyarrow")
             .groupby("pk").count())

    part_rows = _read(sf_dir, "part",
                      ["p_partkey", "p_brand", "p_size"]).take_all()
    part_rows.sort(key=lambda r: r["p_partkey"])
    pkeys = np.array([r["p_partkey"] for r in part_rows], np.int64)
    brands = sorted({r["p_brand"] for r in part_rows})
    bcode = {b: i for i, b in enumerate(brands)}
    bidx = np.array([bcode[r["p_brand"]] for r in part_rows], np.int64)
    sizes = np.array([r["p_size"] for r in part_rows], np.int64)
    ban = bcode.get("Brand#45", -1)
    dref = ray.put((pkeys, bidx, sizes, ban))

    def attach(t: pa.Table) -> pa.Table:
        pk, bi, sz, banned = _broadcast(dref)
        packed = t["pk"].to_numpy(zero_copy_only=False)
        partkey = packed >> 20
        supp = packed & ((1 << 20) - 1)
        i = np.minimum(np.searchsorted(pk, partkey),
                       max(len(pk) - 1, 0))
        hit = (pk[i] == partkey) if len(pk) else \
            np.zeros(len(partkey), bool)
        i, supp = i[hit], supp[hit]
        b, s = bi[i], sz[i]
        keep = b != banned
        # brand-code · 2^40 + size · 2^20 + suppkey (all < 2^20)
        trip = (b[keep] << 40) | (s[keep] << 20) | supp[keep]
        return pa.table({"trip": pa.array(trip)}) \
            .group_by("trip").aggregate([])

    trips = (pairs.map_batches(attach, batch_format="pyarrow")
             .groupby("trip").count())

    def count_bs(t: pa.Table) -> pa.Table:
        trip = t["trip"].to_numpy(zero_copy_only=False)
        bs = trip >> 20  # (brand_code << 20) | size
        g = pa.table({"bs": pa.array(bs)}).group_by("bs") \
            .aggregate([([], "count_all")])
        return pa.table({"bs": g["bs"],
                         "n": g["count_all"].cast(pa.int64())})

    rows = (trips.map_batches(count_bs, batch_format="pyarrow")
            .groupby("bs").sum("n")).take_all()
    return pd.DataFrame(sorted(
        ({"p_brand": brands[r["bs"] >> 20],
          "p_size": int(r["bs"] & ((1 << 20) - 1)),
          "supplier_cnt": r["sum(n)"]} for r in rows),
        key=lambda x: (x["p_brand"], x["p_size"])))


QUERIES["supplier_count_q16"] = q_supplier_count_q16
ORACLE_SQL["supplier_count_q16"] = """
        WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey
                       FROM lineitem)
        SELECT p.p_brand, CAST(p.p_size AS BIGINT) AS p_size,
               CAST(COUNT(DISTINCT pr.l_suppkey) AS BIGINT)
                   AS supplier_cnt
        FROM pairs pr JOIN part p ON p.p_partkey = pr.l_partkey
        WHERE p.p_brand <> 'Brand#45'
        GROUP BY 1, 2
    """


def q_audio_zcr_tracks(sf_dir: str):
    """Zero-crossing-rate audit over the audio corpus: per track the
    number of strict sign flips (s[i-1]·s[i] < 0), positive samples
    and negative samples — the classic cheap voiced/unvoiced feature,
    computed as one shifted product over the stacked batch tensor
    (int16·int16 < 2³⁰, promoted to int64). Payload batches stay
    small per the image-stage law. Oracle: python-int replay
    sidecar."""
    from geotile.ops.audio import read_audio_table

    ds = read_audio_table(_audio_dir_for(sf_dir))

    def zcr(t: pa.Table) -> pa.Table:
        ids = t["track_id"].to_numpy(zero_copy_only=False)
        pcm = np.stack([np.frombuffer(p, dtype=np.int16)
                        for p in t["bytes"].to_pylist()]) \
            .astype(np.int64)
        flips = (pcm[:, :-1] * pcm[:, 1:] < 0).sum(axis=1)
        return pa.table({"track_id": pa.array(ids),
                         "n_flips": pa.array(flips.astype(np.int64)),
                         "n_pos": pa.array(
                             (pcm > 0).sum(axis=1).astype(np.int64)),
                         "n_neg": pa.array(
                             (pcm < 0).sum(axis=1).astype(np.int64))})

    return ds.map_batches(zcr, batch_format="pyarrow", batch_size=64)


QUERIES["audio_zcr_tracks"] = q_audio_zcr_tracks


def _audio_zcr_sidecar(aud: str) -> str:
    """Python-int replay for audio_zcr_tracks (per-sample loop with
    plain ints vs the engine's shifted-product kernel). Content-keyed
    on synth.py."""
    import geotile.synth as _sy
    import pyarrow.parquet as pq
    from pathlib import Path

    p = _oracle_cache_dir() / (
        f"oracle_audiozcr_{Path(aud).name}_{_mods_digest(_sy)}.parquet"
    )
    if not p.exists():
        t = pq.read_table(aud, columns=["track_id"])
        ids = np.sort(t["track_id"].to_numpy(zero_copy_only=False))
        pcm = _sy.audio_samples(ids)
        nf, npos, nneg = [], [], []
        for j in range(len(ids)):
            samples = [int(v) for v in pcm[j].tolist()]
            flips = pos = neg = 0
            for a, b in zip(samples, samples[1:]):
                if a * b < 0:
                    flips += 1
            for v in samples:
                if v > 0:
                    pos += 1
                elif v < 0:
                    neg += 1
            nf.append(flips)
            npos.append(pos)
            nneg.append(neg)
        out = pa.table({"track_id": pa.array(ids),
                        "n_flips": pa.array(nf, pa.int64()),
                        "n_pos": pa.array(npos, pa.int64()),
                        "n_neg": pa.array(nneg, pa.int64())})
        _oracle_cache_dir().mkdir(parents=True, exist_ok=True)
        _atomic_write_table(out, p)
    return str(p)


def _audio_zcr_sql(aud: str) -> str:
    return (f"SELECT track_id, n_flips, n_pos, n_neg "
            f"FROM read_parquet('{_audio_zcr_sidecar(aud)}')")


def q_video_motion_energy(sf_dir: str):
    """Video motion profiling: per clip the exact integer inter-frame
    motion energy (total, peak transition, first peak index) — the
    scene-change / static-clip triage a sampling curator keys on,
    computed as ONE |diff| over each payload group's stacked 5-D
    tensor (ops/video.py VideoMotionStage). Oracle: generator-replay
    sidecar rederives every frame pair with python ints."""
    from geotile.ops.video import VideoMotionStage, read_video_table

    ds = read_video_table(_video_dir_for(sf_dir))
    return ds.map_batches(
        VideoMotionStage, batch_format="pyarrow", batch_size=32,
        concurrency=2,
    )


QUERIES["video_motion_energy"] = q_video_motion_energy


def _video_motion_sidecar(vid: str) -> str:
    """Python-int replay for video_motion_energy: every consecutive
    frame pair rederived from synth.pixel_pattern and |a−b|-summed in
    a plain loop; max + FIRST argmax tracked scalar-side. Content-
    keyed on synth.py."""
    import geotile.synth as _sy
    import pyarrow.parquet as pq
    from pathlib import Path

    p = _oracle_cache_dir() / (
        f"oracle_videomotion_{Path(vid).name}_{_mods_digest(_sy)}.parquet"
    )
    if not p.exists():
        t = pq.read_table(vid, columns=["clip_id", "n_frames"])
        ids = np.sort(t["clip_id"].to_numpy(zero_copy_only=False))
        nf = int(t["n_frames"][0].as_py())
        rows = []
        for cid in ids.tolist():
            frames = [
                [int(v) for v in _sy.pixel_pattern(
                    np.array([cid * 64 + f], np.uint64),
                    _sy.VIDEO_W, _sy.VIDEO_H)[0].ravel().tolist()]
                for f in range(nf)]
            total, peak, pidx = 0, -1, -1
            for f in range(nf - 1):
                e = sum(abs(a - b) for a, b in
                        zip(frames[f + 1], frames[f]))
                total += e
                if e > peak:
                    peak, pidx = e, f
            rows.append({"clip_id": cid, "motion_total": total,
                         "motion_peak": peak, "peak_idx": pidx})
        out = pa.Table.from_pylist(rows)
        _oracle_cache_dir().mkdir(parents=True, exist_ok=True)
        _atomic_write_table(out, p)
    return str(p)


def _video_motion_sql(vid: str) -> str:
    return (f"SELECT clip_id, motion_total, motion_peak, peak_idx "
            f"FROM read_parquet('{_video_motion_sidecar(vid)}')")


def q_image_gradient_energy(sf_dir: str):
    """Per-image gradient energy for the first 1024 images: exact
    integer Σ|∂gray/∂x| and Σ|∂gray/∂y| over the (r+g+b)//3 plane —
    the blur/sharpness score an image-quality filter thresholds on.
    Decode groups by (w, h) within the batch (mixed-size law); both
    sums come from one vectorized |diff| per axis. Python-int replay
    sidecar."""
    from geotile.ops.tiles import ImageDecodeStage, read_image_table

    ds = read_image_table(_image_dir_for(sf_dir)).limit(1024)

    class GradStage:
        def __init__(self):
            self.decoders = ImageDecodeStage(verify=False).decoders

        def __call__(self, batch: pa.Table) -> pa.Table:
            fmts = batch["fmt"].to_pylist()
            ws = batch["w"].to_pylist()
            hs = batch["h"].to_pylist()
            payloads = batch["bytes"].to_pylist()
            ids = batch["image_id"].to_numpy(zero_copy_only=False)
            groups: dict[tuple[int, int], list[int]] = {}
            for i, (wi, hi) in enumerate(zip(ws, hs)):
                groups.setdefault((wi, hi), []).append(i)
            out_id, out_h, out_v = [], [], []
            for (wi, hi), slots in groups.items():
                px = np.stack([self.decoders[fmts[i]](payloads[i],
                                                      wi, hi)
                               for i in slots])
                gray = px.astype(np.int64).sum(axis=3) // 3
                gh = np.abs(np.diff(gray, axis=2)).sum(axis=(1, 2))
                gv = np.abs(np.diff(gray, axis=1)).sum(axis=(1, 2))
                out_id.append(ids[slots])
                out_h.append(gh)
                out_v.append(gv)
            return pa.table({
                "image_id": pa.array(np.concatenate(out_id)),
                "grad_h": pa.array(np.concatenate(out_h)),
                "grad_v": pa.array(np.concatenate(out_v))})

    return ds.map_batches(GradStage, batch_format="pyarrow",
                          batch_size=256, concurrency=2)


QUERIES["image_gradient_energy"] = q_image_gradient_energy


def _image_gradient_sidecar(img: str, n: int = 1024) -> str:
    """Python-int replay for image_gradient_energy (nested per-pixel
    loops vs the engine's vectorized |diff|). Content-keyed on
    synth.py."""
    import geotile.synth as _sy
    import pyarrow.parquet as pq
    from pathlib import Path

    p = _oracle_cache_dir() / (
        f"oracle_imggrad_{Path(img).name}_{n}_{_mods_digest(_sy)}.parquet"
    )
    if not p.exists():
        t = pq.read_table(img, columns=["image_id", "w", "h"])
        order = pc.sort_indices(t["image_id"])[:n]
        ids = t["image_id"].take(order)
        ws = t["w"].take(order).to_numpy(zero_copy_only=False)
        hs = t["h"].take(order).to_numpy(zero_copy_only=False)
        idx = _sy.image_index(ids).astype(np.uint64)
        ghs = np.zeros(len(ws), np.int64)
        gvs = np.zeros(len(ws), np.int64)
        for wi, hi in set(zip(ws.tolist(), hs.tolist())):
            m = np.nonzero((ws == wi) & (hs == hi))[0]
            px = _sy.pixel_pattern(idx[m], wi, hi)
            for j, slot in enumerate(m):
                g = [[(int(px[j, y, x, 0]) + int(px[j, y, x, 1])
                       + int(px[j, y, x, 2])) // 3
                      for x in range(wi)] for y in range(hi)]
                gh = sum(abs(g[y][x + 1] - g[y][x])
                         for y in range(hi) for x in range(wi - 1))
                gv = sum(abs(g[y + 1][x] - g[y][x])
                         for y in range(hi - 1) for x in range(wi))
                ghs[slot], gvs[slot] = gh, gv
        out = pa.table({"image_id": ids, "grad_h": pa.array(ghs),
                        "grad_v": pa.array(gvs)})
        _oracle_cache_dir().mkdir(parents=True, exist_ok=True)
        _atomic_write_table(out, p)
    return str(p)


def _image_gradient_sql(img: str) -> str:
    return (f"SELECT image_id, grad_h, grad_v "
            f"FROM read_parquet('{_image_gradient_sidecar(img)}')")


def q_market_share_q8(sf_dir: str):
    """TPC-H Q8 shape (national market share): of all revenue sold
    into one region's market (customer nation ∈ ASIA), what ppm came
    from suppliers of one nation, per order year. Same dual-dimension
    plan as Q7: orders⋈customer rides two bucketed co-partitions
    (custkey then orderkey — the fact-scale sides at 100 TB), the
    customer-nation→region filter and suppkey→nation gather are
    broadcast sorted arrays. Year-cardinality partials; the ppm
    division happens once per year row in exact python ints."""
    from geotile.ops.relational import bucketed_join

    REGION = 2       # ASIA
    SUPP_NATION = 7  # NATION_7 (regionkey 2)

    nat = _read(sf_dir, "nation",
                ["n_nationkey", "n_regionkey"]).take_all()
    nkeys = np.array(sorted(r["n_nationkey"] for r in nat), np.int64)
    nreg = {r["n_nationkey"]: r["n_regionkey"] for r in nat}
    regs = np.array([nreg[k] for k in nkeys], np.int64)
    sup = _read(sf_dir, "supplier",
                ["s_suppkey", "s_nationkey"]).take_all()
    skeys = np.array(sorted(r["s_suppkey"] for r in sup), np.int64)
    snat_of = {r["s_suppkey"]: r["s_nationkey"] for r in sup}
    snats = np.array([snat_of[k] for k in skeys], np.int64)
    dref = ray.put((nkeys, regs, skeys, snats))

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def in_region(t: pa.Table) -> pa.Table:
        nk, rg, _, _ = _broadcast(dref)
        cn = t["c_nationkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        i = np.minimum(np.searchsorted(nk, cn),
                       max(len(nk) - 1, 0))
        keep = (rg[i] == REGION) & (nk[i] == cn) if len(nk) else \
            np.zeros(len(cn), bool)
        return t.filter(pa.array(keep)).select(["c_custkey"])

    cust_asia = cust.map_batches(in_region, batch_format="pyarrow")
    oc = bucketed_join(orders, cust_asia, "o_custkey", "c_custkey",
                       n_buckets=16)
    oc = oc.map_batches(
        lambda t: pa.table({"o_orderkey": t["o_orderkey"],
                            "o_year": pc.year(t["o_orderdate"])}),
        batch_format="pyarrow").materialize()  # schema-probe law

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice",
                "l_discount"])
    j = bucketed_join(li, oc, "l_orderkey", "o_orderkey", n_buckets=16)

    def partial(t: pa.Table) -> pa.Table:
        _, _, sk, sn = _broadcast(dref)
        s = t["l_suppkey"].to_numpy(zero_copy_only=False)
        i = np.minimum(np.searchsorted(sk, s), max(len(sk) - 1, 0))
        hit = (sk[i] == s) if len(sk) else np.zeros(len(s), bool)
        rev = pc.floor(pc.add(pc.multiply(
            pc.multiply(t["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), t["l_discount"])),
            pa.scalar(10000.0)), pa.scalar(0.5))).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        yr = t["o_year"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)[hit]
        rv = rev[hit]
        is_n = (sn[i][hit] == SUPP_NATION).astype(np.int64)
        g = pa.table({"o_year": pa.array(yr),
                      "total_e4": pa.array(rv),
                      "nation_e4": pa.array(rv * is_n)}) \
            .group_by("o_year").aggregate(
                [("total_e4", "sum"), ("nation_e4", "sum")])
        return pa.table({"o_year": g["o_year"],
                         "total_e4": g["total_e4_sum"],
                         "nation_e4": g["nation_e4_sum"]})

    rows = (j.map_batches(partial, batch_format="pyarrow")
            .groupby("o_year").sum(["total_e4", "nation_e4"])) \
        .take_all()
    return pd.DataFrame(sorted(
        ({"o_year": r["o_year"], "total_e4": r["sum(total_e4)"],
          "nation_e4": r["sum(nation_e4)"],
          "share_ppm": r["sum(nation_e4)"] * 1_000_000
          // r["sum(total_e4)"]} for r in rows),
        key=lambda x: x["o_year"]))


QUERIES["market_share_q8"] = q_market_share_q8
ORACLE_SQL["market_share_q8"] = """
        WITH j AS (
            SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT)
                       AS y,
                   CAST(floor(l.l_extendedprice
                              * (1 - l.l_discount) * 10000.0 + 0.5)
                        AS BIGINT) AS rev,
                   s.s_nationkey AS snat
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation cn ON cn.n_nationkey = c.c_nationkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            WHERE cn.n_regionkey = 2)
        SELECT y AS o_year, CAST(SUM(rev) AS BIGINT) AS total_e4,
               CAST(COALESCE(SUM(rev) FILTER (snat = 7), 0) AS BIGINT)
                   AS nation_e4,
               COALESCE(SUM(rev) FILTER (snat = 7), 0) * 1000000
                   // SUM(rev) AS share_ppm
        FROM j GROUP BY 1
    """


def q_char_class_docs(sf_dir: str):
    """Character-class composition per source: digits, ASCII letters,
    spaces and total chars — the cheap boilerplate/table detector a
    corpus-quality gate runs first. Three re2 count kernels + one
    utf8_length per batch, source-cardinality partials, one tiny
    shuffle."""
    docs = _read(sf_dir, "documents", ["source", "text"])

    def counts(t: pa.Table) -> pa.Table:
        txt = t["text"]
        g = pa.table({
            "source": t["source"],
            "n_digits": pc.count_substring_regex(txt, r"[0-9]")
            .cast(pa.int64()),
            "n_alpha": pc.count_substring_regex(txt, r"[A-Za-z]")
            .cast(pa.int64()),
            "n_spaces": pc.count_substring(txt, " ").cast(pa.int64()),
            "n_chars": pc.utf8_length(txt).cast(pa.int64()),
        }).group_by("source").aggregate(
            [("n_digits", "sum"), ("n_alpha", "sum"),
             ("n_spaces", "sum"), ("n_chars", "sum"),
             ([], "count_all")])
        return pa.table({"source": g["source"],
                         "n_digits": g["n_digits_sum"],
                         "n_alpha": g["n_alpha_sum"],
                         "n_spaces": g["n_spaces_sum"],
                         "n_chars": g["n_chars_sum"],
                         "n_docs": g["count_all"].cast(pa.int64())})

    out = (docs.map_batches(counts, batch_format="pyarrow")
           .groupby("source").sum(["n_digits", "n_alpha", "n_spaces",
                                   "n_chars", "n_docs"]))
    return _rename(out, ["source", "n_digits", "n_alpha", "n_spaces",
                         "n_chars", "n_docs"])


QUERIES["char_class_docs"] = q_char_class_docs
ORACLE_SQL["char_class_docs"] = """
        SELECT source,
               CAST(SUM(length(regexp_replace(text, '[^0-9]', '', 'g')))
                    AS BIGINT) AS n_digits,
               CAST(SUM(length(regexp_replace(text, '[^A-Za-z]', '',
                                              'g'))) AS BIGINT)
                   AS n_alpha,
               CAST(SUM(length(text)
                        - length(replace(text, ' ', ''))) AS BIGINT)
                   AS n_spaces,
               CAST(SUM(length(text)) AS BIGINT) AS n_chars,
               count(*) AS n_docs
        FROM documents GROUP BY 1
    """


def q_global_max_gap_events(sf_dir: str):
    """Longest silence in the whole event stream: the maximum gap
    between consecutive DISTINCT event timestamps, with the epoch-µs
    start of the earliest such gap — the ingestion-outage detector.
    No global sort: timestamps co-partition by calendar DAY (batch
    dedup partials ride the day shuffle), each day resolves its own
    sorted gaps, and only per-day (max, argmax, min_ts, max_ts)
    summaries reach the driver, where day-boundary gaps stitch in an
    O(days) epilogue."""
    ev = _read(sf_dir, "events", ["ts"])
    DAY = 86_400_000_000

    def part(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64())
        g = pa.table({"day": pc.divide(us, pa.scalar(DAY, pa.int64())),
                      "us": us}).group_by(["day", "us"]).aggregate([])
        return g

    def day_kernel(df: pd.DataFrame) -> pd.DataFrame:
        us = np.unique(df["us"].to_numpy())
        d = np.diff(us)
        if len(d):
            mx = int(d.max())
            start = int(us[:-1][d == mx].min())
        else:
            mx, start = -1, -1
        return pd.DataFrame({"day": [int(df["day"].iloc[0])],
                             "max_gap": [mx], "start_us": [start],
                             "lo": [int(us[0])], "hi": [int(us[-1])]})

    days = (ev.map_batches(part, batch_format="pyarrow")
            .groupby("day").map_groups(day_kernel)).take_all()
    days.sort(key=lambda r: r["day"])
    best, best_start = -1, -1
    for i, r in enumerate(days):
        cands = []
        if r["max_gap"] >= 0:
            cands.append((r["max_gap"], r["start_us"]))
        if i:
            cands.append((r["lo"] - days[i - 1]["hi"],
                          days[i - 1]["hi"]))
        for g, s in cands:
            if g > best or (g == best and s < best_start):
                best, best_start = g, s
    return pd.DataFrame({"max_gap_us": [best],
                         "start_us": [best_start]})


QUERIES["global_max_gap_events"] = q_global_max_gap_events
ORACLE_SQL["global_max_gap_events"] = """
        WITH t AS (SELECT DISTINCT ts FROM events),
        d AS (SELECT epoch_us(ts) AS u,
                     epoch_us(ts) - LAG(epoch_us(ts))
                         OVER (ORDER BY ts) AS g
              FROM t)
        SELECT CAST(MAX(g) AS BIGINT) AS max_gap_us,
               CAST(MIN(u - g) FILTER (g = (SELECT MAX(g) FROM d))
                    AS BIGINT) AS start_us
        FROM d
    """


def q_label_gram_matrix(sf_dir: str):
    """Label-centroid affinity as EXACT integer algebra: the Gram
    matrix of per-label embedding SUM vectors on the e3 lattice
    (floor(x·1000) per element — sums stay ≪ 2⁶³ while vectors/label
    < 10⁸). Per-batch partials reduce each block to ≤ labels×dim
    rows; the 640-row final meets in a driver epilogue that forms all
    label-pair dots in one int64 matmul."""
    emb = _read(sf_dir, "embeddings", ["label", "embedding"])

    def part(t: pa.Table) -> pa.Table:
        lab = t["label"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        m = np.floor(np.stack(
            [np.asarray(v, np.float64) for v in
             t["embedding"].to_pylist()]) * 1000.0).astype(np.int64)
        labs = np.unique(lab)
        sums = np.zeros((len(labs), m.shape[1]), np.int64)
        np.add.at(sums, np.searchsorted(labs, lab), m)
        dim = np.tile(np.arange(m.shape[1], dtype=np.int64),
                      len(labs))
        return pa.table({"label": pa.array(np.repeat(labs,
                                                     m.shape[1])),
                         "dim": pa.array(dim),
                         "s": pa.array(sums.ravel())})

    rows = (emb.map_batches(part, batch_format="pyarrow")
            .groupby(["label", "dim"]).sum("s")).take_all()
    labs = sorted({r["label"] for r in rows})
    dims = 1 + max(r["dim"] for r in rows)
    S = np.zeros((len(labs), dims), np.int64)
    li = {l: i for i, l in enumerate(labs)}
    for r in rows:
        S[li[r["label"]], r["dim"]] = r["sum(s)"]
    G = S @ S.T
    out = [{"label_a": a, "label_b": b, "dot_e6": int(G[i, j])}
           for i, a in enumerate(labs)
           for j, b in enumerate(labs) if a <= b]
    return pd.DataFrame(out)


QUERIES["label_gram_matrix"] = q_label_gram_matrix
ORACLE_SQL["label_gram_matrix"] = """
        WITH u AS (SELECT label,
                          unnest(range(len(embedding))) AS dim,
                          CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                                     * 1000.0) AS BIGINT) AS v
                   FROM embeddings),
        s AS (SELECT label, dim, SUM(v) AS sv FROM u GROUP BY 1, 2)
        SELECT CAST(a.label AS BIGINT) AS label_a,
               CAST(b.label AS BIGINT) AS label_b,
               CAST(SUM(a.sv * b.sv) AS BIGINT) AS dot_e6
        FROM s a JOIN s b ON a.dim = b.dim AND a.label <= b.label
        GROUP BY 1, 2
    """


def _poly_edges_path() -> str:
    """Sidecar: every boundary edge of the 256 synthetic station-buffer
    discs (synth.synthetic_route_polygons — the spatial_join_256_polys
    dimension set), with explicit edge ids in pip._edges order.
    Content-keyed on synth.py + the geometry modules."""
    import geotile.synth as _sy
    from geotile.geom.pip import _edges

    p = _oracle_cache_dir() / (
        f"oracle_poly_edges_{_mods_digest(_sy)}_{_geom_digest()}.parquet")
    if not p.exists():
        polys = _sy.synthetic_route_polygons(256)
        cols = {"poly_id": [], "eid": [], "x1": [], "y1": [],
                "x2": [], "y2": []}
        eid = 0
        for rid in sorted(polys):
            for outer, holes in polys[rid]:
                x1, y1, x2, y2 = _edges([outer] + list(holes))
                cols["poly_id"].extend([rid] * len(x1))
                cols["eid"].append(
                    np.arange(eid, eid + len(x1), dtype=np.int64))
                eid += len(x1)
                cols["x1"].append(x1)
                cols["y1"].append(y1)
                cols["x2"].append(x2)
                cols["y2"].append(y2)
        t = pa.table({
            "poly_id": pa.array(cols["poly_id"], pa.string()),
            "eid": pa.array(np.concatenate(cols["eid"])),
            **{k: pa.array(np.concatenate(cols[k]))
               for k in ("x1", "y1", "x2", "y2")}})
        _oracle_cache_dir().mkdir(parents=True, exist_ok=True)
        _atomic_write_table(t, p)
    return str(p)


def q_poly_edge_crossings(sf_dir: str):
    """Segment-intersection join: for every unordered pair of the 256
    station-buffer discs, how many boundary-edge pairs STRICTLY cross
    (both orientation sign pairs opposite, zeros excluded) — the
    conflict-detection primitive under overlay/dissolve. The scale
    path, not all-pairs: edges scatter to coarse grid cells covered by
    their bbox, candidate pairs form only within a cell, dedup by
    packed (eid_i < eid_j) key rides one bounded shuffle, and the
    exact IEEE orientation test runs ONCE per surviving pair against
    the broadcast edge arrays (dimension-scale by construction). A
    crossing pair shares the cell containing its intersection point,
    so cell candidacy has no false negatives."""
    import pyarrow.parquet as pq

    edges = pq.read_table(_poly_edges_path())
    x1 = edges["x1"].to_numpy()
    y1 = edges["y1"].to_numpy()
    x2 = edges["x2"].to_numpy()
    y2 = edges["y2"].to_numpy()
    pids = np.array(edges["poly_id"].to_pylist())
    upolys, pcode = np.unique(pids, return_inverse=True)
    eref = ray.put((x1, y1, x2, y2, pcode.astype(np.int64), upolys))
    G = 0.005  # cell size (deg) ≫ edge span (~0.0006°)

    ds = rd.from_arrow(edges.select(["eid", "x1", "y1", "x2", "y2"])) \
        .repartition(8)

    def scatter(t: pa.Table) -> pa.Table:
        eid = t["eid"].to_numpy()
        ax1 = t["x1"].to_numpy()
        ay1 = t["y1"].to_numpy()
        ax2 = t["x2"].to_numpy()
        ay2 = t["y2"].to_numpy()
        cx_lo = np.floor(np.minimum(ax1, ax2) / G).astype(np.int64)
        cx_hi = np.floor(np.maximum(ax1, ax2) / G).astype(np.int64)
        cy_lo = np.floor(np.minimum(ay1, ay2) / G).astype(np.int64)
        cy_hi = np.floor(np.maximum(ay1, ay2) / G).astype(np.int64)
        out_c, out_e = [], []
        for i in range(len(eid)):
            for cx in range(cx_lo[i], cx_hi[i] + 1):
                for cy in range(cy_lo[i], cy_hi[i] + 1):
                    out_c.append((cx << 32) | (cy & 0xFFFFFFFF))
                    out_e.append(eid[i])
        return pa.table({"cell": pa.array(out_c, pa.int64()),
                         "eid": pa.array(out_e, pa.int64())})

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        # per-group-cost law: cells coarsen into ≤256 shuffle groups;
        # same-cell runs resolve after one lexsort inside the bucket
        _, _, _, _, pcode_, _ = _broadcast(eref)
        cell = df["cell"].to_numpy(np.int64)
        eid = df["eid"].to_numpy(np.int64)
        o = np.lexsort((eid, cell))
        cell, eid = cell[o], eid[o]
        new = np.r_[True, cell[1:] != cell[:-1]]
        first = np.flatnonzero(new)
        cnt = np.diff(np.r_[first, len(cell)])
        pairs = []
        for f, c in zip(first[cnt > 1], cnt[cnt > 1]):
            e = np.unique(eid[f:f + c])
            if len(e) < 2:
                continue
            ii, jj = np.triu_indices(len(e), k=1)
            a, b = e[ii], e[jj]
            keep = pcode_[a] != pcode_[b]
            if keep.any():
                pairs.append((a[keep] << 20) | b[keep])
        if not pairs:
            return pd.DataFrame({"pair": pd.Series(dtype=np.int64)})
        return pd.DataFrame({"pair": np.concatenate(pairs)})

    scattered = ds.map_batches(scatter, batch_format="pyarrow") \
        .map_batches(lambda t: t.append_column(
            "bkt", pc.bit_wise_and(t["cell"],
                                   pa.scalar(0xFF, pa.int64()))),
            batch_format="pyarrow")
    # block-type + block-count laws: map_groups emits one tiny PANDAS
    # block per bucket — convert to arrow and coalesce before the
    # dedup shuffle (10× on the groupby, measured)
    cand = (scattered.groupby("bkt").map_groups(bucket_pairs)
            .map_batches(lambda t: t, batch_format="pyarrow")
            .repartition(4).groupby("pair").count())

    def test(t: pa.Table) -> pa.Table:
        X1, Y1, X2, Y2, pcode_, upolys_ = _broadcast(eref)
        pair = t["pair"].to_numpy(zero_copy_only=False)
        i, j = pair >> 20, pair & ((1 << 20) - 1)
        dxi, dyi = X2[i] - X1[i], Y2[i] - Y1[i]
        dxj, dyj = X2[j] - X1[j], Y2[j] - Y1[j]
        o1 = dxi * (Y1[j] - Y1[i]) - dyi * (X1[j] - X1[i])
        o2 = dxi * (Y2[j] - Y1[i]) - dyi * (X2[j] - X1[i])
        o3 = dxj * (Y1[i] - Y1[j]) - dyj * (X1[i] - X1[j])
        o4 = dxj * (Y2[i] - Y1[j]) - dyj * (X2[i] - X1[j])
        hit = (((o1 < 0) != (o2 < 0)) & (o1 != 0) & (o2 != 0)
               & ((o3 < 0) != (o4 < 0)) & (o3 != 0) & (o4 != 0))
        pi, pj = pcode_[i[hit]], pcode_[j[hit]]
        lo, hi = np.minimum(pi, pj), np.maximum(pi, pj)
        g = pa.table({"pp": pa.array(lo * 4096 + hi)}) \
            .group_by("pp").aggregate([([], "count_all")])
        return pa.table({"pp": g["pp"],
                         "n": g["count_all"].cast(pa.int64())})

    rows = (cand.map_batches(test, batch_format="pyarrow")
            .groupby("pp").sum("n")).take_all()
    return pd.DataFrame(sorted(
        ({"poly_a": upolys[r["pp"] // 4096],
          "poly_b": upolys[r["pp"] % 4096],
          "n_crossings": r["sum(n)"]} for r in rows),
        key=lambda x: (x["poly_a"], x["poly_b"])))


QUERIES["poly_edge_crossings"] = q_poly_edge_crossings


def _poly_crossings_sql() -> str:
    """SQL replay: poly-pair bbox prefilter (necessary condition, so
    lossless), then the SAME strict-crossing IEEE expressions edge
    against edge. Endpoint coords are stored, so every orientation
    term is sub/mul/sub in the engine's exact op order."""
    p = _poly_edges_path()
    return f"""
        WITH e AS (SELECT * FROM read_parquet('{p}')),
        bb AS (SELECT poly_id, min(least(x1, x2)) AS xlo,
                      max(greatest(x1, x2)) AS xhi,
                      min(least(y1, y2)) AS ylo,
                      max(greatest(y1, y2)) AS yhi
               FROM e GROUP BY 1),
        cand AS (SELECT a.poly_id AS pa_, b.poly_id AS pb_
                 FROM bb a JOIN bb b ON a.poly_id < b.poly_id
                 WHERE a.xlo <= b.xhi AND b.xlo <= a.xhi
                   AND a.ylo <= b.yhi AND b.ylo <= a.yhi),
        x AS (SELECT c.pa_, c.pb_,
                     (ea.x2 - ea.x1) AS dxi, (ea.y2 - ea.y1) AS dyi,
                     (eb.x2 - eb.x1) AS dxj, (eb.y2 - eb.y1) AS dyj,
                     ea.x1 AS xi, ea.y1 AS yi, ea.x2 AS xi2,
                     ea.y2 AS yi2,
                     eb.x1 AS xj, eb.y1 AS yj, eb.x2 AS xj2,
                     eb.y2 AS yj2
              FROM cand c
              JOIN e ea ON ea.poly_id = c.pa_
              JOIN e eb ON eb.poly_id = c.pb_),
        o AS (SELECT pa_, pb_,
                     dxi * (yj - yi) - dyi * (xj - xi) AS o1,
                     dxi * (yj2 - yi) - dyi * (xj2 - xi) AS o2,
                     dxj * (yi - yj) - dyj * (xi - xj) AS o3,
                     dxj * (yi2 - yj) - dyj * (xi2 - xj) AS o4
              FROM x)
        SELECT pa_ AS poly_a, pb_ AS poly_b,
               count(*) AS n_crossings
        FROM o
        WHERE ((o1 < 0) <> (o2 < 0)) AND o1 <> 0 AND o2 <> 0
          AND ((o3 < 0) <> (o4 < 0)) AND o3 <> 0 AND o4 <> 0
        GROUP BY 1, 2
    """


def q_bloom_fpr_audit(sf_dir: str):
    """Bloom-filter quality audit: build the distributed filter over
    January-1995 buyer keys (ops/bloom — constant-size bitmap partials
    OR-merged at the driver), probe EVERY customer key, and report the
    exact pass/true/false-positive counts — the measured FPR behind
    bloom_semi_join's ~1% design point. Probe partials carry three
    counters per batch; exact truth comes from the month-bounded
    keyset broadcast sorted."""
    from geotile.ops.bloom import bloom_build, bloom_prefilter

    LO = np.datetime64("1995-01-01", "us")
    HI = np.datetime64("1995-02-01", "us")
    jan = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"]) \
        .map_batches(lambda t: t.filter(pc.and_(
            pc.greater_equal(t["o_orderdate"], pa.scalar(LO)),
            pc.less(t["o_orderdate"], pa.scalar(HI))))
            .select(["o_custkey"]), batch_format="pyarrow")
    jan = jan.materialize()  # schema-probe law: count + build + truth
    n_rows = jan.count()
    fref, m, k = bloom_build(jan, "o_custkey", max(n_rows, 1))
    truth = np.unique(np.array(
        [r["o_custkey"] for r in jan.take_all()], np.int64))
    tref = ray.put(truth)

    cust = _read(sf_dir, "customer", ["c_custkey"])
    passed = bloom_prefilter(cust, "c_custkey", fref, m, k)

    def stats(t: pa.Table) -> pa.Table:
        tr = _broadcast(tref)
        keys = t["c_custkey"].to_numpy(zero_copy_only=False)
        i = np.minimum(np.searchsorted(tr, keys),
                       max(len(tr) - 1, 0))
        n_true = int((tr[i] == keys).sum()) if len(tr) else 0
        return pa.table({"n_pass": pa.array([len(keys)], pa.int64()),
                         "n_true": pa.array([n_true], pa.int64())})

    parts = passed.map_batches(stats, batch_format="pyarrow") \
        .take_all()
    n_pass = sum(r["n_pass"] for r in parts)
    n_true = sum(r["n_true"] for r in parts)
    n_probed = cust.count()
    return pd.DataFrame({"n_probed": [n_probed], "n_pass": [n_pass],
                         "n_true": [n_true],
                         "n_fp": [n_pass - n_true]})


QUERIES["bloom_fpr_audit"] = q_bloom_fpr_audit


def _bloom_fpr_sidecar(sf_dir: str) -> str:
    """Python-int replay for bloom_fpr_audit: rebuild the SAME filter
    (k=4 splitmix64 streams seeded (i+1)·GOLDEN, m = 10·n_rows rounded
    to words) with scalar arithmetic over a python set of bit
    positions, probe every customer, and emit the one-row truth.
    Content-keyed on ops/bloom.py + oracle_ref.py."""
    import geotile.oracle_ref as _oref
    import geotile.ops.bloom as _obloom
    import pyarrow.parquet as pq
    from pathlib import Path

    p = _oracle_cache_dir() / (
        f"oracle_bloomfpr_{Path(sf_dir).name}_"
        f"{_mods_digest(_obloom, _oref)}.parquet")
    if not p.exists():
        M64 = (1 << 64) - 1
        GOLD = 0x9E3779B97F4A7C15

        def sm64_nogold(x: int) -> int:
            # synth.splitmix64 adds the gamma itself; oracle_ref.sm64
            # matches it exactly (gamma = GOLD)
            return _oref.sm64(x)

        o = pq.read_table(f"{sf_dir}/orders.parquet",
                          columns=["o_custkey", "o_orderdate"])
        us = o["o_orderdate"].cast(pa.int64()).to_pylist()
        lo = int(np.datetime64("1995-01-01", "us").astype(np.int64))
        hi = int(np.datetime64("1995-02-01", "us").astype(np.int64))
        keys = [c for c, u in zip(o["o_custkey"].to_pylist(), us)
                if lo <= u < hi]
        n_rows = len(keys)
        m = max(64, max(n_rows, 1) * 10)
        m = (m + 63) // 64 * 64
        kk = 4
        bits = set()
        for key in keys:
            ku = key & M64  # int64 view as uint64
            for i in range(kk):
                seed = ((i + 1) * GOLD) & M64
                bits.add(sm64_nogold((ku + seed) & M64) % m)
        truth = set(keys)
        cust = pq.read_table(f"{sf_dir}/customer.parquet",
                             columns=["c_custkey"])["c_custkey"] \
            .to_pylist()
        n_pass = n_true = 0
        for ck in cust:
            ku = ck & M64
            ok = all(
                sm64_nogold((ku + (((i + 1) * GOLD) & M64)) & M64) % m
                in bits for i in range(kk))
            if ok:
                n_pass += 1
                if ck in truth:
                    n_true += 1
        out = pa.table({
            "n_probed": pa.array([len(cust)], pa.int64()),
            "n_pass": pa.array([n_pass], pa.int64()),
            "n_true": pa.array([n_true], pa.int64()),
            "n_fp": pa.array([n_pass - n_true], pa.int64())})
        _oracle_cache_dir().mkdir(parents=True, exist_ok=True)
        _atomic_write_table(out, p)
    return str(p)


def _bloom_fpr_sql(sf_dir: str) -> str:
    return (f"SELECT n_probed, n_pass, n_true, n_fp "
            f"FROM read_parquet('{_bloom_fpr_sidecar(sf_dir)}')")


def q_scene_change_runs(sf_dir: str):
    """Scene-change segmentation per clip: with the fixed energy
    threshold 50 000, the number of CHANGE transitions (inter-frame
    |diff| energy above threshold) and the longest STATIC run of
    consecutive below-threshold transitions — the gaps-and-islands
    scan on the frame axis that picks which clips need denser
    sampling. Per-pair energies come from the same stacked-tensor
    |diff| as VideoMotionStage; runs resolve in one padded flat diff
    pass (False column between clips). Python-int replay sidecar."""
    from geotile.ops.video import read_video_table

    T = 50_000
    ds = read_video_table(_video_dir_for(sf_dir))

    def runs(t: pa.Table) -> pa.Table:
        codecs = set(t["codec"].to_pylist())
        if codecs - {"rawseq"}:
            raise NotImplementedError(
                "only rawseq ships in this container")
        ids = t["clip_id"].to_numpy(zero_copy_only=False)
        nf = t["n_frames"].to_numpy(zero_copy_only=False)
        ws = t["w"].to_numpy(zero_copy_only=False)
        hs = t["h"].to_numpy(zero_copy_only=False)
        payloads = t["bytes"].to_pylist()
        groups: dict[tuple[int, int, int], list[int]] = {}
        for i, key in enumerate(zip(nf, ws, hs)):
            groups.setdefault(tuple(int(x) for x in key), []).append(i)
        out_id, out_ch, out_st = [], [], []
        for (f, w, h), slots in groups.items():
            clips = np.stack([
                np.frombuffer(payloads[i], dtype=np.uint8)
                .reshape(f, h, w, 3) for i in slots]).astype(np.int64)
            pp = np.abs(clips[:, 1:] - clips[:, :-1]).sum(axis=(2, 3, 4))
            static = pp <= T
            n_ch = (~static).sum(axis=1).astype(np.int64)
            padded = np.concatenate(
                [static, np.zeros((len(slots), 1), bool)],
                axis=1).ravel()
            d = np.diff(np.r_[np.int8(0), padded.view(np.int8)])
            starts = np.flatnonzero(d == 1)
            ends = np.flatnonzero(d == -1)
            lengths = (ends - starts).astype(np.int64)
            row = starts // (static.shape[1] + 1)
            longest = np.zeros(len(slots), np.int64)
            np.maximum.at(longest, row, lengths)
            out_id.append(ids[slots])
            out_ch.append(n_ch)
            out_st.append(longest)
        return pa.table({
            "clip_id": pa.array(np.concatenate(out_id)),
            "n_changes": pa.array(np.concatenate(out_ch)),
            "longest_static": pa.array(np.concatenate(out_st))})

    return ds.map_batches(runs, batch_format="pyarrow", batch_size=32)


QUERIES["scene_change_runs"] = q_scene_change_runs


def _scene_change_sidecar(vid: str) -> str:
    """Python-int replay for scene_change_runs (per-pair scalar energy
    + a plain run loop). Content-keyed on synth.py."""
    import geotile.synth as _sy
    import pyarrow.parquet as pq
    from pathlib import Path

    p = _oracle_cache_dir() / (
        f"oracle_scenechange_{Path(vid).name}_{_mods_digest(_sy)}.parquet"
    )
    if not p.exists():
        T = 50_000
        t = pq.read_table(vid, columns=["clip_id", "n_frames"])
        ids = np.sort(t["clip_id"].to_numpy(zero_copy_only=False))
        nf = int(t["n_frames"][0].as_py())
        rows = []
        for cid in ids.tolist():
            frames = [
                [int(v) for v in _sy.pixel_pattern(
                    np.array([cid * 64 + f], np.uint64),
                    _sy.VIDEO_W, _sy.VIDEO_H)[0].ravel().tolist()]
                for f in range(nf)]
            n_ch = best = cur = 0
            for f in range(nf - 1):
                e = sum(abs(a - b) for a, b in
                        zip(frames[f + 1], frames[f]))
                if e > T:
                    n_ch += 1
                    cur = 0
                else:
                    cur += 1
                    best = max(best, cur)
            rows.append({"clip_id": cid, "n_changes": n_ch,
                         "longest_static": best})
        out = pa.Table.from_pylist(rows)
        _oracle_cache_dir().mkdir(parents=True, exist_ok=True)
        _atomic_write_table(out, p)
    return str(p)


def _scene_change_sql(vid: str) -> str:
    return (f"SELECT clip_id, n_changes, longest_static "
            f"FROM read_parquet('{_scene_change_sidecar(vid)}')")


def q_last_supplier_orders_q21(sf_dir: str):
    """TPC-H Q21 flavour (suppliers who kept orders waiting, recast on
    this schema's columns): per supplier, the number of MULTI-supplier
    orders where that supplier strictly shipped last (its latest
    shipdate beats every other supplier's in the order). One orderkey
    co-partition: each bucket lexsorts once, reduces to per-(order,
    supplier) max-shipdate runs, resolves the per-order strict-argmax
    with segmented maxima, and emits supplier-cardinality partials."""
    from geotile.ops.relational import _with_bucket

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_shipdate"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"s_suppkey": pd.Series(dtype=np.int64),
                              "n_orders": pd.Series(dtype=np.int64)})
        if len(df) == 0:
            return empty
        ok = df["l_orderkey"].to_numpy(np.int64)
        sk = df["l_suppkey"].to_numpy(np.int64)
        sd = df["l_shipdate"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        o = np.lexsort((sd, sk, ok))
        ok, sk, sd = ok[o], sk[o], sd[o]
        # per-(order, supplier) max shipdate = last row of each run
        last = np.r_[(ok[1:] != ok[:-1]) | (sk[1:] != sk[:-1]), True]
        ok, sk, md = ok[last], sk[last], sd[last]
        # per order (runs are still ok-sorted): nsupp, max md, strictness
        new = np.r_[True, ok[1:] != ok[:-1]]
        first = np.flatnonzero(new)
        cnt = np.diff(np.r_[first, len(ok)])
        oid = np.cumsum(new) - 1
        omax = np.zeros(len(first), np.int64)
        np.maximum.at(omax, oid, md)
        at_max = md == omax[oid]
        n_at_max = np.zeros(len(first), np.int64)
        np.add.at(n_at_max, oid, at_max.astype(np.int64))
        win = at_max & (n_at_max[oid] == 1) & (cnt[oid] >= 2)
        if not win.any():
            return empty
        g = pd.DataFrame({"s_suppkey": sk[win]}) \
            .groupby("s_suppkey", as_index=False).size()
        return g.rename(columns={"size": "n_orders"})

    out = (_with_bucket(li, "l_orderkey", 32)
           .groupby("bucket").map_groups(per_bucket,
                                         batch_format="pandas")
           .map_batches(lambda t: t, batch_format="pyarrow")
           .groupby("s_suppkey").sum("n_orders"))
    return _rename(out, ["s_suppkey", "n_orders"])


QUERIES["last_supplier_orders_q21"] = q_last_supplier_orders_q21
ORACLE_SQL["last_supplier_orders_q21"] = """
        WITH s AS (SELECT l_orderkey, l_suppkey,
                          MAX(l_shipdate) AS md
                   FROM lineitem GROUP BY 1, 2),
        o AS (SELECT l_orderkey, COUNT(*) AS nsupp, MAX(md) AS omax
              FROM s GROUP BY 1),
        j AS (SELECT s.l_orderkey, s.l_suppkey, s.md, o.nsupp, o.omax
              FROM s JOIN o USING (l_orderkey)),
        cm AS (SELECT l_orderkey,
                      COUNT(*) FILTER (md = omax) AS n_at_max
               FROM j GROUP BY 1)
        SELECT j.l_suppkey AS s_suppkey,
               count(*) AS n_orders
        FROM j JOIN cm USING (l_orderkey)
        WHERE j.nsupp >= 2 AND j.md = j.omax AND cm.n_at_max = 1
        GROUP BY 1
    """


def q_triplet_violation_labels(sf_dir: str):
    """Embedding-space label coherence: per label, how many anchors
    have a DIFFERENT-label vector strictly closer (exact squared L2 on
    the e6 integer lattice) than their nearest same-label peer — the
    triplet-loss violation rate that flags mislabeled clusters.
    Anchors without a same-label peer are skipped. Per batch: one
    int64 Gram matmul against the broadcast lattice corpus gives every
    anchor both masked minima at once. Oracle: scalar python-int
    replay (oracle_ref.triplet_violations_ref) via sidecar."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    rows = emb.take_all()
    rows.sort(key=lambda r: r["vec_id"])
    V = np.floor(np.array([r["embedding"] for r in rows], np.float64)
                 * 1_000_000.0).astype(np.int64)
    labs = np.array([r["label"] for r in rows], np.int64)
    ids = np.array([r["vec_id"] for r in rows], np.int64)
    cref = ray.put((ids, V, labs))
    BIG = np.int64(2**62)

    def part(t: pa.Table) -> pa.Table:
        ids_, V_, labs_ = _broadcast(cref)
        a_ids = t["vec_id"].to_numpy(zero_copy_only=False)
        ai = np.searchsorted(ids_, a_ids)
        A = V_[ai]
        # d² = |a|² + |b|² − 2 a·b, exact in int64 on the e6 lattice
        n2 = (V_ * V_).sum(axis=1)
        D = n2[ai][:, None] + n2[None, :] - 2 * (A @ V_.T)
        D[np.arange(len(ai)), ai] = BIG  # self out
        same = labs_[None, :] == labs_[ai][:, None]
        d_same = np.where(same, D, BIG).min(axis=1)
        d_other = np.where(~same, D, BIG).min(axis=1)
        keep = d_same < BIG
        viol = keep & (d_other < d_same)
        g = pa.table({"label": pa.array(labs_[ai][keep]),
                      "v": pa.array(viol[keep].astype(np.int64))}) \
            .group_by("label").aggregate(
                [([], "count_all"), ("v", "sum")])
        return pa.table({"label": g["label"],
                         "n_anchors": g["count_all"].cast(pa.int64()),
                         "n_violations": g["v_sum"]})

    out = (emb.select_columns(["vec_id"])
           .map_batches(part, batch_format="pyarrow", batch_size=256)
           .groupby("label").sum(["n_anchors", "n_violations"]))
    return _rename(out, ["label", "n_anchors", "n_violations"])


QUERIES["triplet_violation_labels"] = q_triplet_violation_labels


def _triplet_sidecar(sf_dir: str) -> str:
    """Sidecar for triplet_violation_labels: the scalar replay over the
    same e6-lattice ints. Content-keyed on oracle_ref.py."""
    import geotile.oracle_ref as _oref
    import pyarrow.parquet as pq
    from pathlib import Path

    p = _oracle_cache_dir() / (
        f"oracle_triplet_{Path(sf_dir).name}_"
        f"{_mods_digest(_oref)}.parquet")
    if not p.exists():
        t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding", "label"])
        order = pc.sort_indices(t["vec_id"])
        emb = t["embedding"].take(order).to_pylist()
        labs = t["label"].take(order).to_pylist()
        import math
        vecs = [[int(math.floor(float(x) * 1_000_000.0)) for x in v]
                for v in emb]
        res = _oref.triplet_violations_ref(vecs,
                                           [int(x) for x in labs])
        out = pa.table({
            "label": pa.array(sorted(res), pa.int64()),
            "n_anchors": pa.array([res[k][0] for k in sorted(res)],
                                  pa.int64()),
            "n_violations": pa.array([res[k][1] for k in sorted(res)],
                                     pa.int64())})
        _oracle_cache_dir().mkdir(parents=True, exist_ok=True)
        _atomic_write_table(out, p)
    return str(p)


def _triplet_sql(sf_dir: str) -> str:
    return (f"SELECT label, n_anchors, n_violations "
            f"FROM read_parquet('{_triplet_sidecar(sf_dir)}')")


def q_daily_autocorr_events(sf_dir: str):
    """Periodicity probe on the event stream: exact integer
    autocovariance PARTS of the daily-count series at lags 1..7 —
    Σ c_t·c_{t+L} over the observed calendar span (absent days are
    zero), plus the term count. Day-cardinality partials feed one
    tiny groupby; the lag products form in an O(days) driver
    epilogue. Weekly seasonality shows as a lag-7 peak."""
    ev = _read(sf_dir, "events", ["ts"])
    DAY = 86_400_000_000

    def part(t: pa.Table) -> pa.Table:
        d = pc.divide(t["ts"].cast(pa.int64()),
                      pa.scalar(DAY, pa.int64()))
        g = pa.table({"day": d}).group_by("day").aggregate(
            [([], "count_all")])
        return pa.table({"day": g["day"],
                         "c": g["count_all"].cast(pa.int64())})

    rows = (ev.map_batches(part, batch_format="pyarrow")
            .groupby("day").sum("c")).take_all()
    if not rows:
        return pd.DataFrame({"lag": pd.Series(dtype=np.int64),
                             "n_terms": pd.Series(dtype=np.int64),
                             "sum_prod": pd.Series(dtype=np.int64)})
    days = {r["day"]: r["sum(c)"] for r in rows}
    lo, hi = min(days), max(days)
    out = []
    for lag in range(1, 8):
        sp = sum(c * days.get(d + lag, 0) for d, c in days.items()
                 if d + lag <= hi)
        out.append({"lag": lag, "n_terms": max(hi - lo + 1 - lag, 0),
                    "sum_prod": sp})
    return pd.DataFrame(out)


QUERIES["daily_autocorr_events"] = q_daily_autocorr_events
ORACLE_SQL["daily_autocorr_events"] = """
        WITH d AS (SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT)
                       AS day, COUNT(*) AS c
                   FROM events GROUP BY 1),
        b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM d),
        l AS (SELECT unnest(range(1, 8)) AS lag)
        SELECT CAST(l.lag AS BIGINT) AS lag,
               CAST(GREATEST(b.hi - b.lo + 1 - l.lag, 0) AS BIGINT)
                   AS n_terms,
               CAST(COALESCE((SELECT SUM(a.c * e.c)
                              FROM d a JOIN d e
                                ON e.day = a.day + l.lag), 0)
                    AS BIGINT) AS sum_prod
        FROM l, b
    """


def q_cheapest_supplier_parts(sf_dir: str):
    """TPC-H Q2-flavoured minimum-cost supplier election, EXACT over
    rationals: per part, the supplier with the lowest unit price
    (total cents / total qty) wins; ties break to the smaller
    suppkey. No float division ever orders the candidates — the sort
    key is floor(cents · 2⁵³ / qty) in python ints, which orders
    exactly like the rational while Σqty < 2²⁶ (asserted; distinct
    rationals with denominators ≤ Q separate once L ≥ Q²). Plan:
    per-(part,supp) packed-key sum partials → pair-cardinality
    groupby → ONE part-bucket co-partition elects every winner →
    supplier-cardinality partials."""
    from geotile.ops.relational import _with_bucket

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_quantity",
                "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.floor(pc.add(pc.multiply(
            t["l_extendedprice"], pa.scalar(100.0)),
            pa.scalar(0.5))).cast(pa.int64())
        packed = pc.add(pc.multiply(t["l_partkey"],
                                    pa.scalar(1 << 20, pa.int64())),
                        t["l_suppkey"])
        g = pa.table({"pk": packed, "c": cents,
                      "q": t["l_quantity"].cast(pa.int64())}) \
            .group_by("pk").aggregate([("c", "sum"), ("q", "sum")])
        return pa.table({"pk": g["pk"], "cents": g["c_sum"],
                         "qty": g["q_sum"]})

    pairs = (li.map_batches(partial, batch_format="pyarrow")
             .groupby("pk").sum(["cents", "qty"]))
    pairs = _rename(pairs, ["pk", "cents", "qty"]).map_batches(
        lambda t: pa.table({
            "part": pc.shift_right(t["pk"], pa.scalar(20, pa.int64())),
            "supp": pc.bit_wise_and(t["pk"],
                                    pa.scalar((1 << 20) - 1,
                                              pa.int64())),
            "cents": t["cents"], "qty": t["qty"]}),
        batch_format="pyarrow")

    L = 1 << 53

    def elect(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"s_suppkey": pd.Series(dtype=np.int64),
                              "n_parts": pd.Series(dtype=np.int64)})
        if len(df) == 0:
            return empty
        best: dict[int, tuple[int, int]] = {}
        for part, supp, cents, qty in zip(
                df["part"].to_numpy(np.int64).tolist(),
                df["supp"].to_numpy(np.int64).tolist(),
                df["cents"].to_numpy(np.int64).tolist(),
                df["qty"].to_numpy(np.int64).tolist()):
            assert 0 < qty < (1 << 26), "rational-key contract"
            key = cents * L // qty
            cur = best.get(part)
            if cur is None or (key, supp) < cur:
                best[part] = (key, supp)
        g = pd.DataFrame({"s_suppkey": [v[1] for v in best.values()]}) \
            .groupby("s_suppkey", as_index=False).size()
        return g.rename(columns={"size": "n_parts"})

    out = (_with_bucket(pairs, "part", 32)
           .groupby("bucket").map_groups(elect, batch_format="pandas")
           .map_batches(lambda t: t, batch_format="pyarrow")
           .groupby("s_suppkey").sum("n_parts"))
    return _rename(out, ["s_suppkey", "n_parts"])


QUERIES["cheapest_supplier_parts"] = q_cheapest_supplier_parts
ORACLE_SQL["cheapest_supplier_parts"] = """
        WITH ps AS (SELECT l_partkey AS p, l_suppkey AS s,
                           CAST(SUM(CAST(floor(l_extendedprice * 100.0
                                               + 0.5) AS BIGINT))
                                AS BIGINT) AS cents,
                           CAST(SUM(CAST(l_quantity AS BIGINT))
                                AS BIGINT) AS qty
                    FROM lineitem GROUP BY 1, 2),
        r AS (SELECT p, s,
                     row_number() OVER (PARTITION BY p
                         ORDER BY CAST(cents AS HUGEINT)
                                  * 9007199254740992 // qty, s) AS rn
              FROM ps)
        SELECT s AS s_suppkey, count(*) AS n_parts
        FROM r WHERE rn = 1 GROUP BY 1
    """


def q_dup_component_sizes(sf_dir: str):
    """Duplicate-cluster SIZE distribution: the embedding near-dup
    pairs flow through distributed connected components, then two
    bounded aggregations turn (node → cluster) into the size
    histogram a dedup-savings estimate reads off. Oracle: the
    recursive-CTE components replay wrapped in the same two
    aggregations."""
    from geotile.ops.dedup import embedding_dup_pairs
    from geotile.ops.graph import connected_components

    pairs = embedding_dup_pairs(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]), tau=0.35)
    cc = connected_components(
        pairs.select_columns(["a", "b"]), "a", "b", n_buckets=8)
    sizes = cc.groupby("cluster_id").count()
    sizes = _rename(sizes, ["cluster_id", "size"]) \
        .map_batches(lambda t: t.select(["size"]),
                     batch_format="pyarrow")
    out = sizes.groupby("size").count()
    return _rename(out, ["size", "n_clusters"])


QUERIES["dup_component_sizes"] = q_dup_component_sizes


def q_hist_equalize_sums(sf_dir: str):
    """Histogram equalization as an exact integer transform audit: for
    the first 1024 images, the pixel sum of the equalized gray plane
    — eq(p) = ⌊(cdf(p) − cdf_min)·255 / (npx − cdf_min)⌋, the
    classic contrast-stretch every vision pipeline owns. The whole
    batch's histograms come from ONE image-offset-packed bincount;
    the remap is a cumsum + gather. Python-int replay sidecar."""
    from geotile.ops.tiles import ImageDecodeStage, read_image_table

    ds = read_image_table(_image_dir_for(sf_dir)).limit(1024)

    class EqStage:
        def __init__(self):
            self.decoders = ImageDecodeStage(verify=False).decoders

        def __call__(self, batch: pa.Table) -> pa.Table:
            fmts = batch["fmt"].to_pylist()
            ws = batch["w"].to_pylist()
            hs = batch["h"].to_pylist()
            payloads = batch["bytes"].to_pylist()
            ids = batch["image_id"].to_numpy(zero_copy_only=False)
            groups: dict[tuple[int, int], list[int]] = {}
            for i, (wi, hi) in enumerate(zip(ws, hs)):
                groups.setdefault((wi, hi), []).append(i)
            out_id, out_sum = [], []
            for (wi, hi), slots in groups.items():
                px = np.stack([self.decoders[fmts[i]](payloads[i],
                                                      wi, hi)
                               for i in slots])
                gray = px.astype(np.int64).sum(axis=3) // 3
                k, npx = len(slots), wi * hi
                code = np.arange(k)[:, None, None] * 256 + gray
                hist = np.bincount(code.ravel(),
                                   minlength=k * 256).reshape(k, 256)
                cdf = np.cumsum(hist, axis=1)
                # cdf_min = cdf at the first occupied bin
                first = (hist > 0).argmax(axis=1)
                cdf_min = cdf[np.arange(k), first]
                den = np.maximum(npx - cdf_min, 1)
                lut = (cdf - cdf_min[:, None]) * 255 // den[:, None]
                lut = np.where((npx - cdf_min)[:, None] == 0, 0, lut)
                eq = np.take_along_axis(
                    lut, gray.reshape(k, -1), axis=1)
                out_id.append(ids[slots])
                out_sum.append(eq.sum(axis=1).astype(np.int64))
            return pa.table({
                "image_id": pa.array(np.concatenate(out_id)),
                "eq_sum": pa.array(np.concatenate(out_sum))})

    return ds.map_batches(EqStage, batch_format="pyarrow",
                          batch_size=256, concurrency=2)


QUERIES["hist_equalize_sums"] = q_hist_equalize_sums


def _hist_eq_sidecar(img: str, n: int = 1024) -> str:
    """Python-int replay for hist_equalize_sums (Counter histogram +
    per-pixel scalar remap). Content-keyed on synth.py."""
    import geotile.synth as _sy
    import pyarrow.parquet as pq
    from pathlib import Path

    p = _oracle_cache_dir() / (
        f"oracle_histeq_{Path(img).name}_{n}_{_mods_digest(_sy)}.parquet"
    )
    if not p.exists():
        t = pq.read_table(img, columns=["image_id", "w", "h"])
        order = pc.sort_indices(t["image_id"])[:n]
        ids = t["image_id"].take(order)
        ws = t["w"].take(order).to_numpy(zero_copy_only=False)
        hs = t["h"].take(order).to_numpy(zero_copy_only=False)
        idx = _sy.image_index(ids).astype(np.uint64)
        sums = np.zeros(len(ws), np.int64)
        for wi, hi in set(zip(ws.tolist(), hs.tolist())):
            m = np.nonzero((ws == wi) & (hs == hi))[0]
            px = _sy.pixel_pattern(idx[m], wi, hi)
            for j, slot in enumerate(m):
                vals = [(int(px[j, y, x, 0]) + int(px[j, y, x, 1])
                         + int(px[j, y, x, 2])) // 3
                        for y in range(hi) for x in range(wi)]
                hist = [0] * 256
                for v in vals:
                    hist[v] += 1
                cdf, run = [0] * 256, 0
                for b in range(256):
                    run += hist[b]
                    cdf[b] = run
                cdf_min = next(cdf[b] for b in range(256)
                               if hist[b] > 0)
                npx = wi * hi
                if npx == cdf_min:
                    sums[slot] = 0
                    continue
                total = 0
                for v in vals:
                    total += (cdf[v] - cdf_min) * 255 // (npx - cdf_min)
                sums[slot] = total
        out = pa.table({"image_id": ids, "eq_sum": pa.array(sums)})
        _oracle_cache_dir().mkdir(parents=True, exist_ok=True)
        _atomic_write_table(out, p)
    return str(p)


def _hist_eq_sql(img: str) -> str:
    return (f"SELECT image_id, eq_sum "
            f"FROM read_parquet('{_hist_eq_sidecar(img)}')")


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized SWAR popcount over uint64 — constant memory (no
    unpackbits blow-up on outer-product XOR matrices)."""
    x = x.astype(np.uint64, copy=True)
    x -= (x >> np.uint64(1)) & np.uint64(0x5555555555555555)
    x = (x & np.uint64(0x3333333333333333)) \
        + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)) \
        .astype(np.int64)


def q_phash_nn_images(sf_dir: str):
    """Perceptual-hash nearest neighbour: for the first 256 images,
    the closest OTHER image by phash Hamming distance (ties to the
    lexicographically smallest id) — the retrieval probe behind
    near-dup image triage, on a pure metadata scan. Per batch one
    outer XOR + SWAR popcount against the broadcast id-sorted phash
    corpus; argmin's first-hit rule IS the id tie-break. Oracle: SQL
    bit_count(xor()) window replay."""
    from geotile.ops.tiles import read_image_table

    img = _image_dir_for(sf_dir)
    corpus = read_image_table(img, columns=["image_id", "phash"]) \
        .take_all()
    corpus.sort(key=lambda r: r["image_id"])
    cids = np.array([r["image_id"] for r in corpus])
    cph = np.array([r["phash"] for r in corpus],
                   np.int64).view(np.uint64)
    cref = ray.put((cids, cph))

    ds = read_image_table(img, columns=["image_id", "phash"]) \
        .limit(256)

    def nn(t: pa.Table) -> pa.Table:
        cids_, cph_ = _broadcast(cref)
        qid = np.array(t["image_id"].to_pylist())
        qph = t["phash"].to_numpy(zero_copy_only=False) \
            .view(np.uint64)
        out_id, out_nn, out_d = [], [], []
        for lo in range(0, len(qid), 32):  # bound the XOR matrix
            q = qph[lo:lo + 32]
            D = _popcount64(q[:, None] ^ cph_[None, :])
            self_i = np.searchsorted(cids_, qid[lo:lo + 32])
            D[np.arange(len(q)), self_i] = 65
            best = D.argmin(axis=1)  # first hit = smallest id
            out_id.append(qid[lo:lo + 32])
            out_nn.append(cids_[best])
            out_d.append(D[np.arange(len(q)), best])
        return pa.table({
            "image_id": pa.array(np.concatenate(out_id)),
            "nn_id": pa.array(np.concatenate(out_nn)),
            "dist": pa.array(np.concatenate(out_d).astype(np.int64))})

    return ds.map_batches(nn, batch_format="pyarrow", batch_size=64)


QUERIES["phash_nn_images"] = q_phash_nn_images


def _phash_nn_sql(img: str) -> str:
    return f"""
        WITH a AS (SELECT image_id, phash
                   FROM read_parquet('{img}/part-*.parquet')
                   ORDER BY image_id LIMIT 256),
        e AS (SELECT image_id, phash
              FROM read_parquet('{img}/part-*.parquet')),
        p AS (SELECT a.image_id AS qid, e.image_id AS nid,
                     bit_count(CAST(xor(a.phash, e.phash) AS BIGINT))
                         AS d
              FROM a CROSS JOIN e WHERE e.image_id <> a.image_id),
        r AS (SELECT qid, nid, d,
                     row_number() OVER (PARTITION BY qid
                                        ORDER BY d, nid) AS rn
              FROM p)
        SELECT qid AS image_id, nid AS nn_id, CAST(d AS BIGINT) AS dist
        FROM r WHERE rn = 1
    """


def q_simpson_diversity_sources(sf_dir: str):
    """Lexical concentration per source: exact Simpson-index parts —
    total tokens, distinct tokens, and Σ n_t² over the per-source
    token counts (the collision probability numerator). Token-count
    partials ride one Heaps-bounded (source, token) shuffle; the
    Σn² reduction is a second source-cardinality pass."""
    docs = _read(sf_dir, "documents", ["source", "text"])

    def toks(t: pa.Table) -> pa.Table:
        lists = pc.split_pattern(t["text"], " ")
        src = pa.array(np.repeat(
            np.array(t["source"].to_pylist()),
            pc.list_value_length(lists).to_numpy(zero_copy_only=False)))
        w = pc.list_flatten(lists)
        keep = pc.not_equal(w, pa.scalar(""))
        g = pa.table({"source": pc.array_filter(src, keep),
                      "tok": pc.array_filter(w, keep)}) \
            .group_by(["source", "tok"]).aggregate([([], "count_all")])
        return pa.table({"source": g["source"], "tok": g["tok"],
                         "n": g["count_all"].cast(pa.int64())})

    counts = (docs.map_batches(toks, batch_format="pyarrow")
              .groupby(["source", "tok"]).sum("n"))

    def parts(t: pa.Table) -> pa.Table:
        n = t["sum(n)"]
        g = pa.table({"source": t["source"], "n": n,
                      "nsq": pc.multiply(n, n)}) \
            .group_by("source").aggregate(
                [("n", "sum"), ("nsq", "sum"), ([], "count_all")])
        return pa.table({"source": g["source"],
                         "n_tokens": g["n_sum"],
                         "sum_sq": g["nsq_sum"],
                         "n_distinct": g["count_all"]
                         .cast(pa.int64())})

    out = (counts.map_batches(parts, batch_format="pyarrow")
           .groupby("source").sum(["n_tokens", "sum_sq",
                                   "n_distinct"]))
    return _rename(out, ["source", "n_tokens", "sum_sq", "n_distinct"])


QUERIES["simpson_diversity_sources"] = q_simpson_diversity_sources
ORACLE_SQL["simpson_diversity_sources"] = """
        WITH w AS (SELECT source,
                          unnest(string_split(text, ' ')) AS tok
                   FROM documents),
        t AS (SELECT source, tok, count(*) AS n
              FROM w WHERE tok <> '' GROUP BY 1, 2)
        SELECT source, CAST(SUM(n) AS BIGINT) AS n_tokens,
               CAST(SUM(n * n) AS BIGINT) AS sum_sq,
               count(*) AS n_distinct
        FROM t GROUP BY 1
    """


def q_bursty_customers_nations(sf_dir: str):
    """Purchase-burstiness per nation: among repeat customers, how
    many have a SHORTEST order gap under a quarter of their mean gap
    (min_gap·4·n < Σgaps — exact integer cross-multiplication, no
    float mean). One custkey co-partition resolves every customer's
    gap stats after a single lexsort (day, orderkey LAG discipline);
    the nation rollup is a broadcast searchsorted gather."""
    from geotile.ops.relational import _with_bucket

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey"]).take_all()
    ck = np.array(sorted(r["c_custkey"] for r in cust), np.int64)
    byc = {r["c_custkey"]: r["c_nationkey"] for r in cust}
    cn = np.array([byc[k] for k in ck], np.int64)
    dref = ray.put((ck, cn))

    orders = _read(sf_dir, "orders",
                   ["o_custkey", "o_orderkey", "o_orderdate"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"nation": pd.Series(dtype=np.int64),
                              "n_repeat": pd.Series(dtype=np.int64),
                              "n_bursty": pd.Series(dtype=np.int64)})
        if len(df) == 0:
            return empty
        ck_, cn_ = _broadcast(dref)
        c = df["o_custkey"].to_numpy(np.int64)
        k = df["o_orderkey"].to_numpy(np.int64)
        d = (df["o_orderdate"].to_numpy().astype("datetime64[us]")
             .astype(np.int64) // 86_400_000_000)
        o = np.lexsort((k, d, c))
        cc, dd = c[o], d[o]
        same = cc[1:] == cc[:-1]
        gaps = (dd[1:] - dd[:-1])[same]
        gc = cc[1:][same]
        if len(gaps) == 0:
            return empty
        ucust, inv = np.unique(gc, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        sg = np.bincount(inv, weights=gaps).astype(np.int64)
        mg = np.full(len(ucust), np.iinfo(np.int64).max)
        np.minimum.at(mg, inv, gaps)
        bursty = (mg * 4 * n < sg).astype(np.int64)
        i = np.minimum(np.searchsorted(ck_, ucust),
                       max(len(ck_) - 1, 0))
        hit = (ck_[i] == ucust) if len(ck_) else \
            np.zeros(len(ucust), bool)
        g = pd.DataFrame({"nation": cn_[i[hit]],
                          "n_repeat": np.ones(hit.sum(), np.int64),
                          "n_bursty": bursty[hit]}) \
            .groupby("nation", as_index=False).sum()
        return g

    out = (_with_bucket(orders, "o_custkey", 32)
           .groupby("bucket").map_groups(per_bucket,
                                         batch_format="pandas")
           .map_batches(lambda t: t, batch_format="pyarrow")
           .groupby("nation").sum(["n_repeat", "n_bursty"]))
    return _rename(out, ["nation", "n_repeat", "n_bursty"])


QUERIES["bursty_customers_nations"] = q_bursty_customers_nations
ORACLE_SQL["bursty_customers_nations"] = """
        WITH o AS (SELECT o_custkey AS c,
                          CAST(epoch_us(o_orderdate) // 86400000000
                               AS BIGINT) AS d,
                          o_orderkey AS k
                   FROM orders),
        g AS (SELECT c, d - LAG(d) OVER (PARTITION BY c
                                         ORDER BY d, k) AS gap
              FROM o),
        s AS (SELECT c, count(gap) AS n, SUM(gap) AS sg,
                     MIN(gap) AS mg
              FROM g WHERE gap IS NOT NULL GROUP BY 1)
        SELECT CAST(cu.c_nationkey AS BIGINT) AS nation,
               count(*) AS n_repeat,
               CAST(count(*) FILTER (s.mg * 4 * s.n < s.sg)
                    AS BIGINT) AS n_bursty
        FROM s JOIN customer cu ON cu.c_custkey = s.c
        GROUP BY 1
    """


def q_local_clustering_dups(sf_dir: str):
    """Per-node clustering parts on the near-dup graph: degree and
    local triangle count for every node — deg·(deg−1)/2 vs n_tri is
    the exact local clustering ratio that separates dup CLIQUES from
    dup CHAINS. The edge set is dedup-output-scale, so the sorted
    adjacency (CSR arrays) broadcasts once; each node batch counts
    its neighbours' pairwise adjacency by sorted-array intersection.
    Oracle: 3-way self-join per node."""
    from geotile.ops.dedup import embedding_dup_pairs

    pairs = embedding_dup_pairs(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
        tau=0.35).take_all()
    a = np.array([r["a"] for r in pairs], np.int64)
    b = np.array([r["b"] for r in pairs], np.int64)
    u = np.concatenate([a, b])
    v = np.concatenate([b, a])
    o = np.lexsort((v, u))
    u, v = u[o], v[o]
    nodes, starts = np.unique(u, return_index=True)
    ends = np.r_[starts[1:], len(u)]
    aref = ray.put((nodes, starts, ends, v))

    ds = rd.from_arrow(pa.table({"node": pa.array(nodes)})) \
        .repartition(4)

    def tri(t: pa.Table) -> pa.Table:
        nodes_, starts_, ends_, adj = _broadcast(aref)
        out_n, out_d, out_t = [], [], []
        for nd in t["node"].to_numpy(zero_copy_only=False).tolist():
            i = np.searchsorted(nodes_, nd)
            nb = adj[starts_[i]:ends_[i]]
            deg = len(nb)
            ntri = 0
            for w in nb.tolist():
                j = np.searchsorted(nodes_, w)
                wn = adj[starts_[j]:ends_[j]]
                # sorted-array intersection size
                ntri += int(np.searchsorted(wn, nb, side="right")
                            .sum() - np.searchsorted(wn, nb,
                                                     side="left")
                            .sum())
            out_n.append(nd)
            out_d.append(deg)
            out_t.append(ntri // 2)  # each triangle seen twice
        return pa.table({"node": pa.array(out_n, pa.int64()),
                         "degree": pa.array(out_d, pa.int64()),
                         "n_tri": pa.array(out_t, pa.int64())})

    return ds.map_batches(tri, batch_format="pyarrow", batch_size=512)


QUERIES["local_clustering_dups"] = q_local_clustering_dups


def q_haar_energy_daily(sf_dir: str):
    """Multi-resolution burst detector: exact integer Haar detail
    energies of the daily event-count series at levels 1..3 —
    Σ(pair difference)² over aligned 2ᵏ-day pairs (absent days are
    zero; an odd tail pairs with zero). Day-cardinality partials +
    an O(days) driver epilogue; a level-1 spike means day-to-day
    churn, level-3 means week-scale regime shifts."""
    ev = _read(sf_dir, "events", ["ts"])
    DAY = 86_400_000_000

    def part(t: pa.Table) -> pa.Table:
        d = pc.divide(t["ts"].cast(pa.int64()),
                      pa.scalar(DAY, pa.int64()))
        g = pa.table({"day": d}).group_by("day").aggregate(
            [([], "count_all")])
        return pa.table({"day": g["day"],
                         "c": g["count_all"].cast(pa.int64())})

    rows = (ev.map_batches(part, batch_format="pyarrow")
            .groupby("day").sum("c")).take_all()
    if not rows:
        return pd.DataFrame({"level": pd.Series(dtype=np.int64),
                             "n_pairs": pd.Series(dtype=np.int64),
                             "energy": pd.Series(dtype=np.int64)})
    days = {r["day"]: r["sum(c)"] for r in rows}
    lo, hi = min(days), max(days)
    series = [days.get(d, 0) for d in range(lo, hi + 1)]
    out = []
    for level in (1, 2, 3):
        if len(series) % 2:
            series = series + [0]
        a, bvals = series[0::2], series[1::2]
        energy = sum((x - y) * (x - y) for x, y in zip(a, bvals))
        out.append({"level": level, "n_pairs": len(a),
                    "energy": energy})
        series = [x + y for x, y in zip(a, bvals)]  # approx coeffs ×√2
    return pd.DataFrame(out)


QUERIES["haar_energy_daily"] = q_haar_energy_daily
ORACLE_SQL["haar_energy_daily"] = """
        WITH d AS (SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT)
                       AS day, COUNT(*) AS c
                   FROM events GROUP BY 1),
        b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM d),
        idx AS (SELECT unnest(range(0,
                    CAST((SELECT hi - lo + 1 FROM b) AS BIGINT))) AS i),
        s0 AS (SELECT i.i, COALESCE(d.c, 0) AS c
               FROM idx i LEFT JOIN d
                 ON d.day = i.i + (SELECT lo FROM b)),
        -- level 1: pair (2j, 2j+1); an odd tail pairs with zero
        l1 AS (SELECT i // 2 AS j,
                      SUM(CASE WHEN i % 2 = 0 THEN c ELSE 0 END) AS a,
                      SUM(CASE WHEN i % 2 = 1 THEN c ELSE 0 END) AS bb
               FROM s0 GROUP BY 1),
        l2 AS (SELECT j // 2 AS j,
                      SUM(CASE WHEN j % 2 = 0 THEN a + bb ELSE 0 END)
                          AS a,
                      SUM(CASE WHEN j % 2 = 1 THEN a + bb ELSE 0 END)
                          AS bb
               FROM l1 GROUP BY 1),
        l3 AS (SELECT j // 2 AS j,
                      SUM(CASE WHEN j % 2 = 0 THEN a + bb ELSE 0 END)
                          AS a,
                      SUM(CASE WHEN j % 2 = 1 THEN a + bb ELSE 0 END)
                          AS bb
               FROM l2 GROUP BY 1)
        SELECT 1 AS level, (SELECT count(*) FROM l1) AS n_pairs,
               CAST((SELECT SUM((a - bb) * (a - bb)) FROM l1)
                    AS BIGINT) AS energy
        UNION ALL
        SELECT 2, (SELECT count(*) FROM l2),
               CAST((SELECT SUM((a - bb) * (a - bb)) FROM l2)
                    AS BIGINT)
        UNION ALL
        SELECT 3, (SELECT count(*) FROM l3),
               CAST((SELECT SUM((a - bb) * (a - bb)) FROM l3)
                    AS BIGINT)
    """


def q_lifetime_span_customers(sf_dir: str):
    """Customer-lifetime distribution: the (last − first) order-day
    span per customer, bucketed into quarters (90-day bins) — the
    retention-horizon histogram. Per-batch min/max partials collapse
    each block to customer-cardinality rows before ONE custkey
    groupby; the histogram is a second bounded aggregation."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def part(t: pa.Table) -> pa.Table:
        d = pc.divide(t["o_orderdate"].cast(pa.int64()),
                      pa.scalar(86_400_000_000, pa.int64()))
        g = pa.table({"c": t["o_custkey"], "d": d}) \
            .group_by("c").aggregate([("d", "min"), ("d", "max")])
        return pa.table({"c": g["c"], "lo": g["d_min"],
                         "hi": g["d_max"]})

    spans = (orders.map_batches(part, batch_format="pyarrow")
             .groupby("c").aggregate(rd.aggregate.Min("lo"),
                                     rd.aggregate.Max("hi")))

    def hist(t: pa.Table) -> pa.Table:
        lo = t["min(lo)"].to_numpy(zero_copy_only=False)
        hi = t["max(hi)"].to_numpy(zero_copy_only=False)
        q = (hi - lo) // 90
        g = pa.table({"span_q": pa.array(q)}).group_by("span_q") \
            .aggregate([([], "count_all")])
        return pa.table({"span_q": g["span_q"],
                         "n_customers": g["count_all"]
                         .cast(pa.int64())})

    out = (spans.map_batches(hist, batch_format="pyarrow")
           .groupby("span_q").sum("n_customers"))
    return _rename(out, ["span_q", "n_customers"])


QUERIES["lifetime_span_customers"] = q_lifetime_span_customers
ORACLE_SQL["lifetime_span_customers"] = """
        WITH s AS (SELECT o_custkey,
                          (MAX(CAST(epoch_us(o_orderdate)
                                    // 86400000000 AS BIGINT))
                           - MIN(CAST(epoch_us(o_orderdate)
                                      // 86400000000 AS BIGINT)))
                          // 90 AS span_q
                   FROM orders GROUP BY 1)
        SELECT span_q, count(*) AS n_customers
        FROM s GROUP BY 1
    """


ORACLE_SQL["local_clustering_dups"] = f"""
        WITH pairs AS ({EMBEDDING_DUPS_SQL}),
        e AS (SELECT a AS u, b AS v FROM pairs
              UNION SELECT b, a FROM pairs),
        deg AS (SELECT u AS node, count(*) AS degree FROM e GROUP BY 1),
        tri AS (SELECT x.u AS node, count(*) AS n_tri
                FROM e x JOIN e y ON y.u = x.u AND y.v > x.v
                         JOIN e z ON z.u = x.v AND z.v = y.v
                GROUP BY 1)
        SELECT d.node, CAST(d.degree AS BIGINT) AS degree,
               CAST(COALESCE(t.n_tri, 0) AS BIGINT) AS n_tri
        FROM deg d LEFT JOIN tri t USING (node)
    """


def q_blob_count_images(sf_dir: str):
    """Binary-morphology audit: per image (first 1024), the number of
    4-connected foreground blobs (gray ≥ 128) and the foreground
    pixel count — the object-count feature a labeling stage feeds
    downstream. Engine labels by vectorized min-neighbour relaxation
    over the whole batch tensor (each pixel starts at its own index;
    iterate until fixpoint — iterations ≤ image diameter, all images
    in the batch converge together); blob count = number of surviving
    root labels. Oracle: scalar flood-fill replay — two genuinely
    different algorithms, one answer."""
    from geotile.ops.tiles import ImageDecodeStage, read_image_table

    ds = read_image_table(_image_dir_for(sf_dir)).limit(1024)

    class BlobStage:
        def __init__(self):
            self.decoders = ImageDecodeStage(verify=False).decoders

        def __call__(self, batch: pa.Table) -> pa.Table:
            fmts = batch["fmt"].to_pylist()
            ws = batch["w"].to_pylist()
            hs = batch["h"].to_pylist()
            payloads = batch["bytes"].to_pylist()
            ids = batch["image_id"].to_numpy(zero_copy_only=False)
            groups: dict[tuple[int, int], list[int]] = {}
            for i, (wi, hi) in enumerate(zip(ws, hs)):
                groups.setdefault((wi, hi), []).append(i)
            out_id, out_b, out_fg = [], [], []
            BIG = np.int64(1 << 62)
            for (wi, hi), slots in groups.items():
                px = np.stack([self.decoders[fmts[i]](payloads[i],
                                                      wi, hi)
                               for i in slots])
                gray = px.astype(np.int64).sum(axis=3) // 3
                fg = gray >= 128
                k = len(slots)
                lab = np.arange(k * hi * wi, dtype=np.int64) \
                    .reshape(k, hi, wi)
                lab = np.where(fg, lab, BIG)
                while True:
                    new = lab.copy()
                    new[:, 1:, :] = np.minimum(new[:, 1:, :],
                                               lab[:, :-1, :])
                    new[:, :-1, :] = np.minimum(new[:, :-1, :],
                                                lab[:, 1:, :])
                    new[:, :, 1:] = np.minimum(new[:, :, 1:],
                                               lab[:, :, :-1])
                    new[:, :, :-1] = np.minimum(new[:, :, :-1],
                                                lab[:, :, 1:])
                    new = np.where(fg, new, BIG)
                    if (new == lab).all():
                        break
                    lab = new
                n_fg = fg.sum(axis=(1, 2)).astype(np.int64)
                flat = lab.reshape(k, -1)
                base = (np.arange(k, dtype=np.int64)
                        * (hi * wi))[:, None]
                roots = flat == (np.arange(hi * wi,
                                           dtype=np.int64)[None, :]
                                 + base)
                n_blobs = (roots & fg.reshape(k, -1)).sum(axis=1) \
                    .astype(np.int64)
                out_id.append(ids[slots])
                out_b.append(n_blobs)
                out_fg.append(n_fg)
            return pa.table({
                "image_id": pa.array(np.concatenate(out_id)),
                "n_blobs": pa.array(np.concatenate(out_b)),
                "n_fg": pa.array(np.concatenate(out_fg))})

    return ds.map_batches(BlobStage, batch_format="pyarrow",
                          batch_size=128, concurrency=2)


QUERIES["blob_count_images"] = q_blob_count_images


def _blob_count_sidecar(img: str, n: int = 1024) -> str:
    """Scalar flood-fill replay for blob_count_images. Content-keyed
    on synth.py."""
    import geotile.synth as _sy
    import pyarrow.parquet as pq
    from pathlib import Path

    p = _oracle_cache_dir() / (
        f"oracle_blobs_{Path(img).name}_{n}_{_mods_digest(_sy)}.parquet"
    )
    if not p.exists():
        t = pq.read_table(img, columns=["image_id", "w", "h"])
        order = pc.sort_indices(t["image_id"])[:n]
        ids = t["image_id"].take(order)
        ws = t["w"].take(order).to_numpy(zero_copy_only=False)
        hs = t["h"].take(order).to_numpy(zero_copy_only=False)
        idx = _sy.image_index(ids).astype(np.uint64)
        blobs = np.zeros(len(ws), np.int64)
        nfg = np.zeros(len(ws), np.int64)
        for wi, hi in set(zip(ws.tolist(), hs.tolist())):
            m = np.nonzero((ws == wi) & (hs == hi))[0]
            px = _sy.pixel_pattern(idx[m], wi, hi)
            for j, slot in enumerate(m):
                fg = [[(int(px[j, y, x, 0]) + int(px[j, y, x, 1])
                        + int(px[j, y, x, 2])) // 3 >= 128
                       for x in range(wi)] for y in range(hi)]
                seen = [[False] * wi for _ in range(hi)]
                n_blobs = n_fg = 0
                for y in range(hi):
                    for x in range(wi):
                        if not fg[y][x]:
                            continue
                        n_fg += 1
                        if seen[y][x]:
                            continue
                        n_blobs += 1
                        stack = [(y, x)]
                        seen[y][x] = True
                        while stack:
                            cy, cx = stack.pop()
                            for dy, dx in ((1, 0), (-1, 0),
                                           (0, 1), (0, -1)):
                                ny, nx = cy + dy, cx + dx
                                if (0 <= ny < hi and 0 <= nx < wi
                                        and fg[ny][nx]
                                        and not seen[ny][nx]):
                                    seen[ny][nx] = True
                                    stack.append((ny, nx))
                blobs[slot] = n_blobs
                nfg[slot] = n_fg
        out = pa.table({"image_id": ids, "n_blobs": pa.array(blobs),
                        "n_fg": pa.array(nfg)})
        _oracle_cache_dir().mkdir(parents=True, exist_ok=True)
        _atomic_write_table(out, p)
    return str(p)


def _blob_count_sql(img: str) -> str:
    return (f"SELECT image_id, n_blobs, n_fg "
            f"FROM read_parquet('{_blob_count_sidecar(img)}')")


def q_daily_xcorr_types(sf_dir: str):
    """Lead/lag coupling between two event streams: exact integer
    cross-correlation parts Σ click(t)·purchase(t+L) for lags −3..3
    over the daily count series (absent days zero) — does engagement
    LEAD conversion? Two day-cardinality partial sets ride one
    groupby; the lag products form in an O(days) epilogue."""
    ev = _read(sf_dir, "events", ["ts", "event_type"])
    DAY = 86_400_000_000

    def part(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["event_type"],
                        value_set=pa.array(["click", "purchase"]))
        t = t.filter(keep)
        d = pc.divide(t["ts"].cast(pa.int64()),
                      pa.scalar(DAY, pa.int64()))
        g = pa.table({"day": d, "et": t["event_type"]}) \
            .group_by(["day", "et"]).aggregate([([], "count_all")])
        return pa.table({"day": g["day"], "et": g["et"],
                         "c": g["count_all"].cast(pa.int64())})

    rows = (ev.map_batches(part, batch_format="pyarrow")
            .groupby(["day", "et"]).sum("c")).take_all()
    click = {r["day"]: r["sum(c)"] for r in rows
             if r["et"] == "click"}
    buy = {r["day"]: r["sum(c)"] for r in rows
           if r["et"] == "purchase"}
    out = []
    for lag in range(-3, 4):
        sp = sum(c * buy.get(d + lag, 0) for d, c in click.items())
        out.append({"lag": lag, "sum_prod": sp})
    return pd.DataFrame(out)


QUERIES["daily_xcorr_types"] = q_daily_xcorr_types
ORACLE_SQL["daily_xcorr_types"] = """
        WITH d AS (SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT)
                       AS day, event_type, COUNT(*) AS c
                   FROM events
                   WHERE event_type IN ('click', 'purchase')
                   GROUP BY 1, 2),
        l AS (SELECT unnest(range(-3, 4)) AS lag)
        SELECT CAST(l.lag AS BIGINT) AS lag,
               CAST(COALESCE((SELECT SUM(a.c * b.c)
                              FROM d a JOIN d b
                                ON b.day = a.day + l.lag
                               AND a.event_type = 'click'
                               AND b.event_type = 'purchase'), 0)
                    AS BIGINT) AS sum_prod
        FROM l
    """


def q_audio_onsets_tracks(sf_dir: str):
    """Attack/onset detection over the audio corpus: per track, the
    number of frame transitions where energy more than DOUBLES
    (e_t > 2·e_{t−1}, exact integers) and the first such frame index
    (−1 if none) — the percussive-content triage on top of the
    AudioFrameStage ledger. Stage REUSE: frame energies come from the
    shared actor-pool stage; the temporal fold is one shifted compare
    per track row-group. Python-int replay sidecar."""
    from geotile.ops.audio import AudioFrameStage, read_audio_table

    ds = read_audio_table(_audio_dir_for(sf_dir))
    frames = ds.map_batches(AudioFrameStage, batch_format="pyarrow",
                            batch_size=64, concurrency=2)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"track_id": pd.Series(dtype=np.int64),
                                 "n_onsets": pd.Series(dtype=np.int64),
                                 "first_onset":
                                     pd.Series(dtype=np.int64)})
        tid = df["track_id"].to_numpy(np.int64)
        fr = df["frame"].to_numpy(np.int64)
        en = df["energy"].to_numpy(np.int64)
        o = np.lexsort((fr, tid))
        tid, fr, en = tid[o], fr[o], en[o]
        same = tid[1:] == tid[:-1]
        onset = same & (en[1:] > 2 * en[:-1])
        ut, inv = np.unique(tid, return_inverse=True)
        n_on = np.bincount(inv[1:][onset],
                           minlength=len(ut)).astype(np.int64)
        first = np.full(len(ut), np.iinfo(np.int64).max)
        np.minimum.at(first, inv[1:][onset], fr[1:][onset])
        first = np.where(n_on > 0, first, -1)
        return pd.DataFrame({"track_id": ut, "n_onsets": n_on,
                             "first_onset": first})

    from geotile.ops.relational import _with_bucket

    out = (_with_bucket(frames, "track_id", 8)
           .groupby("bucket").map_groups(fold, batch_format="pandas")
           .map_batches(lambda t: t, batch_format="pyarrow"))
    return out


QUERIES["audio_onsets_tracks"] = q_audio_onsets_tracks


def _audio_onsets_sidecar(aud: str) -> str:
    """Python-int replay for audio_onsets_tracks. Content-keyed on
    synth.py."""
    import geotile.synth as _sy
    import pyarrow.parquet as pq
    from pathlib import Path

    p = _oracle_cache_dir() / (
        f"oracle_audioonsets_{Path(aud).name}_{_mods_digest(_sy)}.parquet"
    )
    if not p.exists():
        t = pq.read_table(aud, columns=["track_id"])
        ids = np.sort(t["track_id"].to_numpy(zero_copy_only=False))
        pcm = _sy.audio_samples(ids)
        frame = 1024
        nfr = pcm.shape[1] // frame
        rows = []
        for j, tid in enumerate(ids.tolist()):
            en = []
            for f in range(nfr):
                chunk = pcm[j, f * frame:(f + 1) * frame].tolist()
                en.append(sum(int(v) * int(v) for v in chunk))
            n_on, first = 0, -1
            for f in range(1, nfr):
                if en[f] > 2 * en[f - 1]:
                    n_on += 1
                    if first < 0:
                        first = f
            rows.append({"track_id": tid, "n_onsets": n_on,
                         "first_onset": first})
        out = pa.Table.from_pylist(rows)
        _oracle_cache_dir().mkdir(parents=True, exist_ok=True)
        _atomic_write_table(out, p)
    return str(p)


def _audio_onsets_sql(aud: str) -> str:
    return (f"SELECT track_id, n_onsets, first_onset "
            f"FROM read_parquet('{_audio_onsets_sidecar(aud)}')")


def q_csv_roundtrip_events(sf_dir: str):
    """Source/sink lossless round trip through CSV: events project to
    (event_id, user_id, cents — the e2 lattice formed BEFORE the
    sink so no float ever rides the text format), write as a
    partitioned CSV directory, read back with an explicit schema,
    and aggregate per user. The oracle aggregates the original
    parquet directly — any encode/parse loss breaks equality.
    Idempotent cache keyed by sf."""
    import os
    from pathlib import Path

    out = Path(os.environ.get("GEOTILE_CACHE", "/tmp/geotile_cache")) \
        / f"csv_events_{Path(sf_dir).name}"
    # marker OUTSIDE the csv dir (explicit concat — with_suffix would
    # truncate the dotted sf name and collide across scale factors)
    done = out.parent / (out.name + ".done")
    if not done.exists():
        import shutil

        if out.exists():  # a half-written dir would double rows
            shutil.rmtree(out)
        ev = _read(sf_dir, "events", ["event_id", "user_id", "value"])

        def to_cents(t: pa.Table) -> pa.Table:
            cents = pc.floor(pc.add(pc.multiply(
                t["value"], pa.scalar(100.0)),
                pa.scalar(0.5))).cast(pa.int64())
            return pa.table({"event_id": t["event_id"],
                             "user_id": t["user_id"],
                             "cents": cents})

        ev.map_batches(to_cents, batch_format="pyarrow") \
            .repartition(4).write_csv(str(out))
        done.touch()

    back = rd.read_csv(str(out))

    def agg(t: pa.Table) -> pa.Table:
        g = pa.table({"user_id": t["user_id"].cast(pa.int64()),
                      "cents": t["cents"].cast(pa.int64())}) \
            .group_by("user_id").aggregate(
                [([], "count_all"), ("cents", "sum")])
        return pa.table({"user_id": g["user_id"],
                         "n": g["count_all"].cast(pa.int64()),
                         "sum_cents": g["cents_sum"]})

    out_ds = (back.map_batches(agg, batch_format="pyarrow")
              .groupby("user_id").sum(["n", "sum_cents"]))
    return _rename(out_ds, ["user_id", "n", "sum_cents"])


QUERIES["csv_roundtrip_events"] = q_csv_roundtrip_events
ORACLE_SQL["csv_roundtrip_events"] = """
        SELECT user_id, count(*) AS n,
               CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
                    AS BIGINT) AS sum_cents
        FROM events GROUP BY 1
    """


def q_range_density_labels(sf_dir: str):
    """Fixed-radius range search: per label, how many (anchor,
    neighbour) pairs sit within squared-L2 1.5e12 on the e6 integer
    lattice (self excluded) — the density audit behind choosing a
    dedup tau or DBSCAN eps. One int64 Gram matmul per batch against
    the broadcast lattice corpus; counts are exact. Oracle: scalar
    python-int replay (oracle_ref.range_counts_ref) with early-exit
    accumulation — a different algorithm, same integers."""
    R2 = 1_500_000_000_000
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    rows = emb.take_all()
    rows.sort(key=lambda r: r["vec_id"])
    V = np.floor(np.array([r["embedding"] for r in rows], np.float64)
                 * 1_000_000.0).astype(np.int64)
    labs = np.array([r["label"] for r in rows], np.int64)
    ids = np.array([r["vec_id"] for r in rows], np.int64)
    cref = ray.put((ids, V, labs))

    def part(t: pa.Table) -> pa.Table:
        ids_, V_, labs_ = _broadcast(cref)
        ai = np.searchsorted(ids_, t["vec_id"].to_numpy(
            zero_copy_only=False))
        A = V_[ai]
        n2 = (V_ * V_).sum(axis=1)
        D = n2[ai][:, None] + n2[None, :] - 2 * (A @ V_.T)
        D[np.arange(len(ai)), ai] = np.int64(2**62)
        cnt = (D <= R2).sum(axis=1).astype(np.int64)
        g = pa.table({"label": pa.array(labs_[ai]),
                      "c": pa.array(cnt)}) \
            .group_by("label").aggregate(
                [([], "count_all"), ("c", "sum")])
        return pa.table({"label": g["label"],
                         "n_anchors": g["count_all"].cast(pa.int64()),
                         "n_in_range": g["c_sum"]})

    out = (emb.select_columns(["vec_id"])
           .map_batches(part, batch_format="pyarrow", batch_size=256)
           .groupby("label").sum(["n_anchors", "n_in_range"]))
    return _rename(out, ["label", "n_anchors", "n_in_range"])


QUERIES["range_density_labels"] = q_range_density_labels


def _range_density_sidecar(sf_dir: str) -> str:
    """Sidecar for range_density_labels (scalar early-exit replay).
    Content-keyed on oracle_ref.py."""
    import geotile.oracle_ref as _oref
    import pyarrow.parquet as pq
    from pathlib import Path

    p = _oracle_cache_dir() / (
        f"oracle_rangedensity_{Path(sf_dir).name}_"
        f"{_mods_digest(_oref)}.parquet")
    if not p.exists():
        import math

        t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding", "label"])
        order = pc.sort_indices(t["vec_id"])
        emb = t["embedding"].take(order).to_pylist()
        labs = [int(x) for x in t["label"].take(order).to_pylist()]
        vecs = [[int(math.floor(float(x) * 1_000_000.0)) for x in v]
                for v in emb]
        res = _oref.range_counts_ref(vecs, labs, 1_500_000_000_000)
        out = pa.table({
            "label": pa.array(sorted(res), pa.int64()),
            "n_anchors": pa.array([res[k][0] for k in sorted(res)],
                                  pa.int64()),
            "n_in_range": pa.array([res[k][1] for k in sorted(res)],
                                   pa.int64())})
        _oracle_cache_dir().mkdir(parents=True, exist_ok=True)
        _atomic_write_table(out, p)
    return str(p)


def _range_density_sql(sf_dir: str) -> str:
    return (f"SELECT label, n_anchors, n_in_range "
            f"FROM read_parquet('{_range_density_sidecar(sf_dir)}')")


def q_order_delta_signs(sf_dir: str):
    """Self-asof on the order stream: each order joins its customer's
    PREVIOUS order and the totalprice delta's sign tallies per nation
    — are wallets trending up? Cents lattice before comparison, LAG
    discipline (day, orderkey), one custkey co-partition, broadcast
    nation gather, 25×3-bounded partials."""
    from geotile.ops.relational import _with_bucket

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey"]).take_all()
    ck = np.array(sorted(r["c_custkey"] for r in cust), np.int64)
    byc = {r["c_custkey"]: r["c_nationkey"] for r in cust}
    cn = np.array([byc[k] for k in ck], np.int64)
    dref = ray.put((ck, cn))

    orders = _read(sf_dir, "orders",
                   ["o_custkey", "o_orderkey", "o_orderdate",
                    "o_totalprice"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"nation": pd.Series(dtype=np.int64),
                              "n_up": pd.Series(dtype=np.int64),
                              "n_down": pd.Series(dtype=np.int64),
                              "n_flat": pd.Series(dtype=np.int64)})
        if len(df) == 0:
            return empty
        ck_, cn_ = _broadcast(dref)
        c = df["o_custkey"].to_numpy(np.int64)
        k = df["o_orderkey"].to_numpy(np.int64)
        d = (df["o_orderdate"].to_numpy().astype("datetime64[us]")
             .astype(np.int64) // 86_400_000_000)
        cents = np.floor(df["o_totalprice"].to_numpy(np.float64)
                         * 100.0 + 0.5).astype(np.int64)
        o = np.lexsort((k, d, c))
        cc, pp = c[o], cents[o]
        same = cc[1:] == cc[:-1]
        delta = (pp[1:] - pp[:-1])[same]
        dc = cc[1:][same]
        if len(delta) == 0:
            return empty
        i = np.minimum(np.searchsorted(ck_, dc),
                       max(len(ck_) - 1, 0))
        hit = (ck_[i] == dc) if len(ck_) else np.zeros(len(dc), bool)
        g = pd.DataFrame({
            "nation": cn_[i[hit]],
            "n_up": (delta[hit] > 0).astype(np.int64),
            "n_down": (delta[hit] < 0).astype(np.int64),
            "n_flat": (delta[hit] == 0).astype(np.int64)}) \
            .groupby("nation", as_index=False).sum()
        return g

    out = (_with_bucket(orders, "o_custkey", 32)
           .groupby("bucket").map_groups(per_bucket,
                                         batch_format="pandas")
           .map_batches(lambda t: t, batch_format="pyarrow")
           .groupby("nation").sum(["n_up", "n_down", "n_flat"]))
    return _rename(out, ["nation", "n_up", "n_down", "n_flat"])


QUERIES["order_delta_signs"] = q_order_delta_signs
ORACLE_SQL["order_delta_signs"] = """
        WITH o AS (SELECT o_custkey AS c,
                          CAST(epoch_us(o_orderdate) // 86400000000
                               AS BIGINT) AS d,
                          o_orderkey AS k,
                          CAST(floor(o_totalprice * 100.0 + 0.5)
                               AS BIGINT) AS cents
                   FROM orders),
        g AS (SELECT c, cents - LAG(cents)
                         OVER (PARTITION BY c ORDER BY d, k) AS delta
              FROM o)
        SELECT CAST(cu.c_nationkey AS BIGINT) AS nation,
               CAST(count(*) FILTER (g.delta > 0) AS BIGINT) AS n_up,
               CAST(count(*) FILTER (g.delta < 0) AS BIGINT)
                   AS n_down,
               CAST(count(*) FILTER (g.delta = 0) AS BIGINT)
                   AS n_flat
        FROM g JOIN customer cu ON cu.c_custkey = g.c
        WHERE g.delta IS NOT NULL
        GROUP BY 1
    """


def q_disc_tile_counts(sf_dir: str):
    """The flagship spatial join against the MANY-polygon dimension
    set: image tiles vs the 256 synthetic station-buffer discs, one
    count per disc — the stop-catchment readout. Same cell-indexed
    join operator as tile_assignments (interior-cell fast path,
    boundary PIP), different dimension shape (256 small rings instead
    of 2 long corridors). Oracle: the even-odd crossing replay over
    the poly_edges sidecar, identical IEEE expression to the engine's
    pip kernel."""
    from geotile.ops.join import build_route_index, spatial_join
    from geotile.ops.tiles import JOIN_COLUMNS, read_image_table
    from geotile.synth import synthetic_route_polygons

    idx = build_route_index(synthetic_route_polygons(256))
    ds = read_image_table(_image_dir_for(sf_dir), columns=JOIN_COLUMNS)
    out = (spatial_join(ds, idx)
           .select_columns(["route_id"])
           .groupby("route_id").count())
    return _rename(out, ["route_id", "n_tiles"])


QUERIES["disc_tile_counts"] = q_disc_tile_counts


def _disc_tile_counts_sql(sf_dir: str) -> str:
    img = _image_dir_for(sf_dir)
    edges = _poly_edges_path()
    return f"""
        WITH pts AS (SELECT image_id, lon, lat
                     FROM read_parquet('{img}/part-*.parquet')),
        par AS (
            SELECT p.image_id, e.poly_id, e.poly_id AS route_poly,
                   e.poly_id AS pid
            FROM pts p JOIN read_parquet('{edges}') e
              ON ((e.y1 > p.lat) <> (e.y2 > p.lat))
             AND (p.lon < e.x1 + (p.lat - e.y1) * (e.x2 - e.x1)
                          / (e.y2 - e.y1))
            GROUP BY p.image_id, e.poly_id
            HAVING count(*) % 2 = 1
        )
        SELECT poly_id AS route_id,
               CAST(count(DISTINCT image_id) AS BIGINT) AS n_tiles
        FROM par GROUP BY 1
    """


def q_mirror_symmetry_images(sf_dir: str):
    """Horizontal mirror-symmetry score for the first 1024 images:
    the exact integer Σ|gray(x) − gray(w−1−x)| over the left half —
    zero means a perfectly symmetric frame, the cheap aesthetic /
    synthetic-artifact flag. One vectorized flip-diff per (w, h)
    group. Python-int replay sidecar."""
    from geotile.ops.tiles import ImageDecodeStage, read_image_table

    ds = read_image_table(_image_dir_for(sf_dir)).limit(1024)

    class MirrorStage:
        def __init__(self):
            self.decoders = ImageDecodeStage(verify=False).decoders

        def __call__(self, batch: pa.Table) -> pa.Table:
            fmts = batch["fmt"].to_pylist()
            ws = batch["w"].to_pylist()
            hs = batch["h"].to_pylist()
            payloads = batch["bytes"].to_pylist()
            ids = batch["image_id"].to_numpy(zero_copy_only=False)
            groups: dict[tuple[int, int], list[int]] = {}
            for i, (wi, hi) in enumerate(zip(ws, hs)):
                groups.setdefault((wi, hi), []).append(i)
            out_id, out_s = [], []
            for (wi, hi), slots in groups.items():
                px = np.stack([self.decoders[fmts[i]](payloads[i],
                                                      wi, hi)
                               for i in slots])
                gray = px.astype(np.int64).sum(axis=3) // 3
                half = wi // 2
                asym = np.abs(gray[:, :, :half]
                              - gray[:, :, ::-1][:, :, :half]) \
                    .sum(axis=(1, 2)).astype(np.int64)
                out_id.append(ids[slots])
                out_s.append(asym)
            return pa.table({
                "image_id": pa.array(np.concatenate(out_id)),
                "asym": pa.array(np.concatenate(out_s))})

    return ds.map_batches(MirrorStage, batch_format="pyarrow",
                          batch_size=256, concurrency=2)


QUERIES["mirror_symmetry_images"] = q_mirror_symmetry_images


def _mirror_sidecar(img: str, n: int = 1024) -> str:
    """Python-int replay for mirror_symmetry_images. Content-keyed on
    synth.py."""
    import geotile.synth as _sy
    import pyarrow.parquet as pq
    from pathlib import Path

    p = _oracle_cache_dir() / (
        f"oracle_mirror_{Path(img).name}_{n}_{_mods_digest(_sy)}.parquet"
    )
    if not p.exists():
        t = pq.read_table(img, columns=["image_id", "w", "h"])
        order = pc.sort_indices(t["image_id"])[:n]
        ids = t["image_id"].take(order)
        ws = t["w"].take(order).to_numpy(zero_copy_only=False)
        hs = t["h"].take(order).to_numpy(zero_copy_only=False)
        idx = _sy.image_index(ids).astype(np.uint64)
        asym = np.zeros(len(ws), np.int64)
        for wi, hi in set(zip(ws.tolist(), hs.tolist())):
            m = np.nonzero((ws == wi) & (hs == hi))[0]
            px = _sy.pixel_pattern(idx[m], wi, hi)
            for j, slot in enumerate(m):
                total = 0
                for y in range(hi):
                    for x in range(wi // 2):
                        a = (int(px[j, y, x, 0]) + int(px[j, y, x, 1])
                             + int(px[j, y, x, 2])) // 3
                        xx = wi - 1 - x
                        b2 = (int(px[j, y, xx, 0])
                              + int(px[j, y, xx, 1])
                              + int(px[j, y, xx, 2])) // 3
                        total += abs(a - b2)
                asym[slot] = total
        out = pa.table({"image_id": ids, "asym": pa.array(asym)})
        _oracle_cache_dir().mkdir(parents=True, exist_ok=True)
        _atomic_write_table(out, p)
    return str(p)


def _mirror_sql(img: str) -> str:
    return (f"SELECT image_id, asym "
            f"FROM read_parquet('{_mirror_sidecar(img)}')")


def q_pareto_frontier_nations(sf_dir: str):
    """Grouped SKYLINE: per nation, the Pareto-frontier size over
    (account balance cents, order count) — the 'best customers no
    one dominates' census. Order counts come from custkey partials +
    one groupby; balances broadcast sorted; each nation's frontier
    resolves in a 25-group co-partition with the group-max scan
    (dominated iff a strictly-richer customer orders at least as
    much, or an equal-balance customer orders strictly more).
    NOT-EXISTS self-join replay."""
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey", "c_acctbal"]).take_all()
    ck = np.array(sorted(r["c_custkey"] for r in cust), np.int64)
    byc = {r["c_custkey"]: r for r in cust}
    bal = np.array([np.floor(byc[k]["c_acctbal"] * 100.0 + 0.5)
                    for k in ck]).astype(np.int64)
    nat = np.array([byc[k]["c_nationkey"] for k in ck], np.int64)
    dref = ray.put((ck, bal, nat))

    orders = _read(sf_dir, "orders", ["o_custkey"])

    def cnt(t: pa.Table) -> pa.Table:
        g = pa.table({"c": t["o_custkey"]}).group_by("c") \
            .aggregate([([], "count_all")])
        return pa.table({"c": g["c"],
                         "n": g["count_all"].cast(pa.int64())})

    per_cust = (orders.map_batches(cnt, batch_format="pyarrow")
                .groupby("c").sum("n"))

    def attach(t: pa.Table) -> pa.Table:
        ck_, bal_, nat_ = _broadcast(dref)
        c = t["c"].to_numpy(zero_copy_only=False)
        i = np.minimum(np.searchsorted(ck_, c),
                       max(len(ck_) - 1, 0))
        hit = (ck_[i] == c) if len(ck_) else np.zeros(len(c), bool)
        return pa.table({
            "nation": pa.array(nat_[i[hit]]),
            "bal": pa.array(bal_[i[hit]]),
            "n": pc.array_filter(t["sum(n)"], pa.array(hit))})

    def frontier(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {"nation": pd.Series(dtype=np.int64),
                 "n_customers": pd.Series(dtype=np.int64),
                 "n_frontier": pd.Series(dtype=np.int64)})
        nation = int(df["nation"].iloc[0])
        b = df["bal"].to_numpy(np.int64)
        n = df["n"].to_numpy(np.int64)
        o = np.lexsort((-n, -b))
        b, n = b[o], n[o]
        prev_max = -1
        n_front = 0
        i = 0
        while i < len(b):
            j = i
            while j < len(b) and b[j] == b[i]:
                j += 1
            gmax = int(n[i:j].max())
            if gmax > prev_max:
                n_front += int((n[i:j] == gmax).sum())
                prev_max = gmax
            i = j
        return pd.DataFrame({"nation": [nation],
                             "n_customers": [len(b)],
                             "n_frontier": [n_front]})

    out = (per_cust.map_batches(attach, batch_format="pyarrow")
           .groupby("nation").map_groups(frontier,
                                         batch_format="pandas")
           .map_batches(lambda t: t, batch_format="pyarrow"))
    return out


QUERIES["pareto_frontier_nations"] = q_pareto_frontier_nations
ORACLE_SQL["pareto_frontier_nations"] = """
        WITH pts AS (SELECT cu.c_nationkey AS nation,
                            CAST(floor(cu.c_acctbal * 100.0 + 0.5)
                                 AS BIGINT) AS bal,
                            count(*) AS n
                     FROM orders o
                     JOIN customer cu ON cu.c_custkey = o.o_custkey
                     GROUP BY 1, cu.c_custkey,
                              floor(cu.c_acctbal * 100.0 + 0.5))
        SELECT CAST(p.nation AS BIGINT) AS nation,
               count(*) AS n_customers,
               CAST(count(*) FILTER (NOT EXISTS (
                   SELECT 1 FROM pts q
                   WHERE q.nation = p.nation
                     AND q.bal >= p.bal AND q.n >= p.n
                     AND (q.bal > p.bal OR q.n > p.n)))
                    AS BIGINT) AS n_frontier
        FROM pts p GROUP BY 1
    """


def q_dow_detrended_parts(sf_dir: str):
    """Seasonal decomposition, integer-exact: detrend the daily
    revenue-dollars series with a centered 7-day window (residual
    r_t = 7·c_t − Σ_{|k|≤3} c_{t+k}, absent days zero) and emit the
    day-of-week residual parts Σr and Σr² over interior days (dollar lattice keeps Σr² inside int64) — the
    weekday effect AFTER removing the weekly trend, no float ever
    forms. Day-cardinality partials + an O(days) epilogue.
    Day-of-week uses the 1970-01-01=Thursday epoch convention,
    mirrored in SQL via (day + 4) % 7."""
    orders = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def part(t: pa.Table) -> pa.Table:
        d = pc.divide(t["o_orderdate"].cast(pa.int64()),
                      pa.scalar(86_400_000_000, pa.int64()))
        dollars = pc.floor(pc.add(t["o_totalprice"],
                                   pa.scalar(0.5))).cast(pa.int64())
        g = pa.table({"day": d, "c": dollars}).group_by("day") \
            .aggregate([("c", "sum")])
        return pa.table({"day": g["day"], "c": g["c_sum"]})

    rows = (orders.map_batches(part, batch_format="pyarrow")
            .groupby("day").sum("c")).take_all()
    if not rows:
        return pd.DataFrame({"dow": pd.Series(dtype=np.int64),
                             "n_days": pd.Series(dtype=np.int64),
                             "sum_r": pd.Series(dtype=np.int64),
                             "sum_r2": pd.Series(dtype=np.int64)})
    days = {r["day"]: r["sum(c)"] for r in rows}
    lo, hi = min(days), max(days)
    series = [days.get(d, 0) for d in range(lo, hi + 1)]
    acc: dict[int, list[int]] = {}
    for t in range(3, len(series) - 3):
        trend = sum(series[t - 3:t + 4])
        r = 7 * series[t] - trend
        dow = (lo + t + 4) % 7  # 1970-01-01 was a Thursday
        st = acc.setdefault(dow, [0, 0, 0])
        st[0] += 1
        st[1] += r
        st[2] += r * r
    return pd.DataFrame(sorted(
        ({"dow": k, "n_days": v[0], "sum_r": v[1], "sum_r2": v[2]}
         for k, v in acc.items()), key=lambda x: x["dow"]))


QUERIES["dow_detrended_parts"] = q_dow_detrended_parts
ORACLE_SQL["dow_detrended_parts"] = """
        WITH d AS (SELECT CAST(epoch_us(o_orderdate) // 86400000000
                       AS BIGINT) AS day,
                          SUM(CAST(floor(o_totalprice + 0.5)
                                   AS BIGINT)) AS c
                   FROM orders GROUP BY 1),
        b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM d),
        idx AS (SELECT unnest(range(0, CAST((SELECT hi - lo + 1 FROM b)
                    AS BIGINT))) AS i),
        s0 AS (SELECT i.i, COALESCE(d.c, 0) AS c
               FROM idx i LEFT JOIN d
                 ON d.day = i.i + (SELECT lo FROM b)),
        w AS (SELECT i, c,
                     SUM(c) OVER (ORDER BY i
                                  ROWS BETWEEN 3 PRECEDING
                                  AND 3 FOLLOWING) AS trend,
                     COUNT(*) OVER (ORDER BY i
                                    ROWS BETWEEN 3 PRECEDING
                                    AND 3 FOLLOWING) AS nw
              FROM s0),
        r AS (SELECT ((SELECT lo FROM b) + i + 4) % 7 AS dow,
                     7 * c - trend AS res
              FROM w WHERE nw = 7)
        SELECT CAST(dow AS BIGINT) AS dow, count(*) AS n_days,
               CAST(SUM(res) AS BIGINT) AS sum_r,
               CAST(SUM(res * res) AS BIGINT) AS sum_r2
        FROM r GROUP BY 1
    """


def q_video_flicker_parts(sf_dir: str):
    """Temporal-noise (flicker) parts per clip: the exact integers
    behind per-pixel variance across frames — a = Σ_{t,px} x²,
    b = Σ_px (Σ_t x)², so flicker energy = F·a − b. One stacked
    reduction per payload group (ops/video decode contract). Python-
    int replay sidecar."""
    from geotile.ops.video import read_video_table

    ds = read_video_table(_video_dir_for(sf_dir))

    def parts(t: pa.Table) -> pa.Table:
        codecs = set(t["codec"].to_pylist())
        if codecs - {"rawseq"}:
            raise NotImplementedError(
                "only rawseq ships in this container")
        ids = t["clip_id"].to_numpy(zero_copy_only=False)
        nf = t["n_frames"].to_numpy(zero_copy_only=False)
        ws = t["w"].to_numpy(zero_copy_only=False)
        hs = t["h"].to_numpy(zero_copy_only=False)
        payloads = t["bytes"].to_pylist()
        groups: dict[tuple[int, int, int], list[int]] = {}
        for i, key in enumerate(zip(nf, ws, hs)):
            groups.setdefault(tuple(int(x) for x in key), []).append(i)
        out_id, out_a, out_b, out_f = [], [], [], []
        for (f, w, h), slots in groups.items():
            clips = np.stack([
                np.frombuffer(payloads[i], dtype=np.uint8)
                .reshape(f, h * w * 3) for i in slots]) \
                .astype(np.int64)
            a = (clips * clips).sum(axis=(1, 2))
            psum = clips.sum(axis=1)  # per-pixel across frames
            b2 = (psum * psum).sum(axis=1)
            out_id.append(ids[slots])
            out_a.append(a)
            out_b.append(b2)
            out_f.append(np.full(len(slots), f, np.int64))
        return pa.table({
            "clip_id": pa.array(np.concatenate(out_id)),
            "sum_sq": pa.array(np.concatenate(out_a)),
            "sq_sum": pa.array(np.concatenate(out_b)),
            "n_frames": pa.array(np.concatenate(out_f))})

    return ds.map_batches(parts, batch_format="pyarrow",
                          batch_size=32)


QUERIES["video_flicker_parts"] = q_video_flicker_parts


def _video_flicker_sidecar(vid: str) -> str:
    """Python-int replay for video_flicker_parts. Content-keyed on
    synth.py."""
    import geotile.synth as _sy
    import pyarrow.parquet as pq
    from pathlib import Path

    p = _oracle_cache_dir() / (
        f"oracle_videoflicker_{Path(vid).name}_{_mods_digest(_sy)}.parquet"
    )
    if not p.exists():
        t = pq.read_table(vid, columns=["clip_id", "n_frames"])
        ids = np.sort(t["clip_id"].to_numpy(zero_copy_only=False))
        nf = int(t["n_frames"][0].as_py())
        rows = []
        for cid in ids.tolist():
            frames = [
                [int(v) for v in _sy.pixel_pattern(
                    np.array([cid * 64 + f], np.uint64),
                    _sy.VIDEO_W, _sy.VIDEO_H)[0].ravel().tolist()]
                for f in range(nf)]
            a = sum(v * v for fr in frames for v in fr)
            npx = len(frames[0])
            b2 = 0
            for px in range(npx):
                s = sum(frames[f][px] for f in range(nf))
                b2 += s * s
            rows.append({"clip_id": cid, "sum_sq": a, "sq_sum": b2,
                         "n_frames": nf})
        out = pa.Table.from_pylist(rows)
        _oracle_cache_dir().mkdir(parents=True, exist_ok=True)
        _atomic_write_table(out, p)
    return str(p)


def _video_flicker_sql(vid: str) -> str:
    return (f"SELECT clip_id, sum_sq, sq_sum, n_frames "
            f"FROM read_parquet('{_video_flicker_sidecar(vid)}')")


def q_near_simultaneous_pairs(sf_dir: str):
    """Temporal band SELF-join: per unordered event-type pair, how
    many same-user event pairs landed within 60 seconds of each other
    — the multi-device / bot-burst signature. One user co-partition;
    each bucket sorts by (ts, event_id) once, finds every 60-second
    window end by searchsorted, and resolves all five types' counts
    from per-type prefix sums — no pair row ever materializes. The
    (ts, event_id) order is the pair-once discipline, mirrored in the
    SQL replay."""
    from geotile.ops.relational import _with_bucket

    ev = _read(sf_dir, "events", ["user_id", "event_id", "ts",
                                  "event_type"])
    W = 60_000_000  # 60 s in µs

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"type_a": pd.Series(dtype=object),
                              "type_b": pd.Series(dtype=object),
                              "n_pairs": pd.Series(dtype=np.int64)})
        if len(df) == 0:
            return empty
        u = df["user_id"].to_numpy(np.int64)
        e = df["event_id"].to_numpy(np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        et = df["event_type"].to_numpy()
        types, tcode = np.unique(et, return_inverse=True)
        o = np.lexsort((e, ts, u))
        u, ts, tcode = u[o], ts[o], tcode[o]
        k = len(types)
        # composite (user-segment << 48) + relative-ts key: sorted
        # ascending, and windows can never cross users because the
        # segment offset dwarfs any in-bucket time range (asserted)
        seg_of = np.cumsum(np.r_[True, u[1:] != u[:-1]]) - 1
        rel = ts - ts.min()
        assert rel.max(initial=0) < (1 << 48) - W, "ts-range contract"
        comp = seg_of * (1 << 48) + rel
        P = np.zeros((len(u) + 1, k), np.int64)
        P[1:] = np.eye(k, dtype=np.int64)[tcode].cumsum(axis=0)
        hi = np.searchsorted(comp, comp + W, side="right")
        cnt = np.zeros((k, k), np.int64)
        for b in range(k):
            win = P[hi, b] - P[np.arange(len(u)) + 1, b]
            np.add.at(cnt[:, b], tcode, win)
        rows = []
        for a in range(k):
            for b in range(k):
                lo_t, hi_t = sorted((types[a], types[b]))
                if cnt[a, b]:
                    rows.append((lo_t, hi_t, int(cnt[a, b])))
        if not rows:
            return empty
        g = pd.DataFrame(rows, columns=["type_a", "type_b",
                                        "n_pairs"]) \
            .groupby(["type_a", "type_b"], as_index=False).sum()
        return g

    out = (_with_bucket(ev, "user_id", 32)
           .groupby("bucket").map_groups(per_bucket,
                                         batch_format="pandas")
           .map_batches(lambda t: t, batch_format="pyarrow")
           .groupby(["type_a", "type_b"]).sum("n_pairs"))
    return _rename(out, ["type_a", "type_b", "n_pairs"])


QUERIES["near_simultaneous_pairs"] = q_near_simultaneous_pairs
ORACLE_SQL["near_simultaneous_pairs"] = """
        SELECT LEAST(e1.event_type, e2.event_type) AS type_a,
               GREATEST(e1.event_type, e2.event_type) AS type_b,
               count(*) AS n_pairs
        FROM events e1 JOIN events e2
          ON e2.user_id = e1.user_id
         AND (e2.ts > e1.ts
              OR (e2.ts = e1.ts AND e2.event_id > e1.event_id))
         AND epoch_us(e2.ts) - epoch_us(e1.ts) <= 60000000
        GROUP BY 1, 2
    """


def q_reorder_after_return(sf_dir: str):
    """Post-return behavior: of the customers who ever had a returned
    lineitem, how many ordered AGAIN strictly after their first
    return shipment — the churn-after-defect probe. Chain: R-flagged
    lineitems ⋈ orders (bucketed, orderkey) → per-customer MIN ship
    date → orders ⋈ that (bucketed, custkey) → per-customer later
    counts → three global counters from customer-cardinality
    partials. Both joins are fact-scale co-partitions at 100 TB."""
    from geotile.ops.relational import bucketed_join

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_returnflag", "l_shipdate"]) \
        .map_batches(lambda t: t.filter(pc.equal(
            t["l_returnflag"], pa.scalar("R")))
            .select(["l_orderkey", "l_shipdate"]),
            batch_format="pyarrow")
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])
    j1 = bucketed_join(li, orders, "l_orderkey", "o_orderkey",
                       n_buckets=16)

    def min_part(t: pa.Table) -> pa.Table:
        g = pa.table({"c": t["o_custkey"],
                      "md": t["l_shipdate"].cast(pa.int64())}) \
            .group_by("c").aggregate([("md", "min")])
        return pa.table({"c": g["c"], "md": g["md_min"]})

    first_ret = (j1.map_batches(min_part, batch_format="pyarrow")
                 .groupby("c").min("md"))
    first_ret = _rename(first_ret, ["c", "md"]).materialize()

    j2 = bucketed_join(orders, first_ret, "o_custkey", "c",
                       n_buckets=16)

    def later_part(t: pa.Table) -> pa.Table:
        later = pc.greater(t["o_orderdate"].cast(pa.int64()),
                           t["md"]).cast(pa.int64())
        g = pa.table({"c": t["o_custkey"], "lat": later}) \
            .group_by("c").aggregate([("lat", "sum")])
        return pa.table({"c": g["c"], "n_later": g["lat_sum"]})

    per_cust = (j2.map_batches(later_part, batch_format="pyarrow")
                .groupby("c").sum("n_later"))

    def tally(t: pa.Table) -> pa.Table:
        nl = t["sum(n_later)"].to_numpy(zero_copy_only=False)
        return pa.table({
            "n_ret_customers": pa.array([len(nl)], pa.int64()),
            "n_reordered": pa.array([int((nl > 0).sum())], pa.int64()),
            "n_later_orders": pa.array([int(nl.sum())], pa.int64())})

    parts = per_cust.map_batches(tally,
                                 batch_format="pyarrow").take_all()
    return pd.DataFrame({
        "n_ret_customers": [sum(r["n_ret_customers"] for r in parts)],
        "n_reordered": [sum(r["n_reordered"] for r in parts)],
        "n_later_orders": [sum(r["n_later_orders"] for r in parts)]})


QUERIES["reorder_after_return"] = q_reorder_after_return
ORACLE_SQL["reorder_after_return"] = """
        WITH r AS (SELECT o.o_custkey AS c, MIN(l.l_shipdate) AS md
                   FROM lineitem l
                   JOIN orders o ON o.o_orderkey = l.l_orderkey
                   WHERE l.l_returnflag = 'R' GROUP BY 1),
        j AS (SELECT r.c,
                     COUNT(*) FILTER (o.o_orderdate > r.md) AS n_later
              FROM r JOIN orders o ON o.o_custkey = r.c
              GROUP BY 1)
        SELECT count(*) AS n_ret_customers,
               CAST(count(*) FILTER (n_later > 0) AS BIGINT)
                   AS n_reordered,
               CAST(SUM(n_later) AS BIGINT) AS n_later_orders
        FROM j
    """


def q_early_breadth_users(sf_dir: str):
    """Early-behavior breadth: for every user, how many DISTINCT
    event types appear in their FIRST five events ((ts, event_id)
    order) — the onboarding-diversity histogram. One user
    co-partition, one lexsort; the first-5 slice and the per-user
    distinct count are both segment algebra."""
    from geotile.ops.relational import _with_bucket

    ev = _read(sf_dir, "events", ["user_id", "event_id", "ts",
                                  "event_type"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"breadth": pd.Series(dtype=np.int64),
                              "n_users": pd.Series(dtype=np.int64)})
        if len(df) == 0:
            return empty
        u = df["user_id"].to_numpy(np.int64)
        e = df["event_id"].to_numpy(np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        _, tcode = np.unique(df["event_type"].to_numpy(),
                             return_inverse=True)
        o = np.lexsort((e, ts, u))
        u, tcode = u[o], tcode[o]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        run = np.cumsum(np.r_[True, u[1:] != u[:-1]]) - 1
        offset = np.arange(len(u)) - starts[run]
        keep = offset < 5
        ku, kt = run[keep], tcode[keep]
        # distinct types per user among kept rows
        pair = ku * 8 + kt  # ≤5 event types
        up = np.unique(pair)
        breadth = np.bincount(up // 8).astype(np.int64)
        breadth = breadth[breadth > 0]
        g = pd.DataFrame({"breadth": breadth}) \
            .groupby("breadth", as_index=False).size()
        return g.rename(columns={"size": "n_users"})

    out = (_with_bucket(ev, "user_id", 32)
           .groupby("bucket").map_groups(per_bucket,
                                         batch_format="pandas")
           .map_batches(lambda t: t, batch_format="pyarrow")
           .groupby("breadth").sum("n_users"))
    return _rename(out, ["breadth", "n_users"])


QUERIES["early_breadth_users"] = q_early_breadth_users
ORACLE_SQL["early_breadth_users"] = """
        WITH r AS (SELECT user_id, event_type,
                          row_number() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS rn
                   FROM events),
        b AS (SELECT user_id,
                     CAST(COUNT(DISTINCT event_type) AS BIGINT)
                         AS breadth
              FROM r WHERE rn <= 5 GROUP BY 1)
        SELECT breadth, count(*) AS n_users FROM b GROUP BY 1
    """


def q_nation_quartile_bands(sf_dir: str):
    """Quantile-band ASSIGN join: each order lands in its own
    nation's revenue quartile band — boundaries are the exact cents
    values at 0-based ranks (n−1)·q//4 (q = 1..3) computed where the
    nation lives, broadcast back, and band = #boundaries strictly
    below the order's cents (ties stay in the lower band). Two
    scans: one nation co-partition for boundaries, one stateless
    banding pass with 25×4 partials."""
    from geotile.ops.relational import _with_bucket

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey"]).take_all()
    ck = np.array(sorted(r["c_custkey"] for r in cust), np.int64)
    byc = {r["c_custkey"]: r["c_nationkey"] for r in cust}
    cn = np.array([byc[k] for k in ck], np.int64)
    dref = ray.put((ck, cn))

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def with_nation(t: pa.Table) -> pa.Table:
        ck_, cn_ = _broadcast(dref)
        c = t["o_custkey"].to_numpy(zero_copy_only=False)
        i = np.minimum(np.searchsorted(ck_, c),
                       max(len(ck_) - 1, 0))
        hit = (ck_[i] == c) if len(ck_) else np.zeros(len(c), bool)
        cents = pc.floor(pc.add(pc.multiply(
            t["o_totalprice"], pa.scalar(100.0)),
            pa.scalar(0.5))).cast(pa.int64())
        return pa.table({
            "nation": pa.array(cn_[i[hit]]),
            "cents": pc.array_filter(cents, pa.array(hit))})

    tagged = orders.map_batches(with_nation,
                                batch_format="pyarrow").materialize()

    def bounds(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"nation": pd.Series(dtype=np.int64),
                                 "b1": pd.Series(dtype=np.int64),
                                 "b2": pd.Series(dtype=np.int64),
                                 "b3": pd.Series(dtype=np.int64)})
        v = np.sort(df["cents"].to_numpy(np.int64))
        n = len(v)
        return pd.DataFrame({
            "nation": [int(df["nation"].iloc[0])],
            "b1": [int(v[(n - 1) * 1 // 4])],
            "b2": [int(v[(n - 1) * 2 // 4])],
            "b3": [int(v[(n - 1) * 3 // 4])]})

    brows = tagged.groupby("nation").map_groups(
        bounds, batch_format="pandas").take_all()
    nats = np.array(sorted(r["nation"] for r in brows), np.int64)
    byn = {r["nation"]: r for r in brows}
    B = np.array([[byn[k]["b1"], byn[k]["b2"], byn[k]["b3"]]
                  for k in nats], np.int64)
    bref = ray.put((nats, B))

    def band(t: pa.Table) -> pa.Table:
        nats_, B_ = _broadcast(bref)
        nat = t["nation"].to_numpy(zero_copy_only=False)
        v = t["cents"].to_numpy(zero_copy_only=False)
        i = np.searchsorted(nats_, nat)
        bd = (v > B_[i, 0]).astype(np.int64) \
            + (v > B_[i, 1]) + (v > B_[i, 2])
        g = pa.table({"nation": pa.array(nat), "band": pa.array(bd),
                      "cents": pa.array(v)}) \
            .group_by(["nation", "band"]).aggregate(
                [([], "count_all"), ("cents", "sum")])
        return pa.table({"nation": g["nation"], "band": g["band"],
                         "n": g["count_all"].cast(pa.int64()),
                         "sum_cents": g["cents_sum"]})

    out = (tagged.map_batches(band, batch_format="pyarrow")
           .groupby(["nation", "band"]).sum(["n", "sum_cents"]))
    return _rename(out, ["nation", "band", "n", "sum_cents"])


QUERIES["nation_quartile_bands"] = q_nation_quartile_bands
ORACLE_SQL["nation_quartile_bands"] = """
        WITH o AS (SELECT cu.c_nationkey AS nation,
                          CAST(floor(o.o_totalprice * 100.0 + 0.5)
                               AS BIGINT) AS cents
                   FROM orders o
                   JOIN customer cu ON cu.c_custkey = o.o_custkey),
        r AS (SELECT nation, cents,
                     row_number() OVER (PARTITION BY nation
                                        ORDER BY cents) AS rn,
                     COUNT(*) OVER (PARTITION BY nation) AS n
              FROM o),
        b AS (SELECT nation,
                     MAX(cents) FILTER (rn - 1 = (n - 1) * 1 // 4)
                         AS b1,
                     MAX(cents) FILTER (rn - 1 = (n - 1) * 2 // 4)
                         AS b2,
                     MAX(cents) FILTER (rn - 1 = (n - 1) * 3 // 4)
                         AS b3
              FROM r GROUP BY 1)
        SELECT CAST(o.nation AS BIGINT) AS nation,
               CAST((o.cents > b.b1)::BIGINT + (o.cents > b.b2)::BIGINT
                    + (o.cents > b.b3)::BIGINT AS BIGINT) AS band,
               count(*) AS n,
               CAST(SUM(o.cents) AS BIGINT) AS sum_cents
        FROM o JOIN b USING (nation)
        GROUP BY 1, 2
    """


def q_type_run_lengths(sf_dir: str):
    """Gaps-and-islands on the event stream: per event type, how many
    maximal same-type RUNS each user produced, total events and the
    longest run — repetitive-behavior fingerprinting. One user
    co-partition; run boundaries, lengths and all three per-type
    reductions are segment algebra after a single lexsort. Classic
    rn−rt island replay in SQL."""
    from geotile.ops.relational import _with_bucket

    ev = _read(sf_dir, "events", ["user_id", "event_id", "ts",
                                  "event_type"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"event_type": pd.Series(dtype=object),
                              "n_runs": pd.Series(dtype=np.int64),
                              "n_events": pd.Series(dtype=np.int64),
                              "max_run": pd.Series(dtype=np.int64)})
        if len(df) == 0:
            return empty
        u = df["user_id"].to_numpy(np.int64)
        e = df["event_id"].to_numpy(np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        et = df["event_type"].to_numpy()
        types, tcode = np.unique(et, return_inverse=True)
        o = np.lexsort((e, ts, u))
        u, tcode = u[o], tcode[o]
        brk = np.r_[True, (u[1:] != u[:-1])
                    | (tcode[1:] != tcode[:-1])]
        starts = np.flatnonzero(brk)
        lens = np.diff(np.r_[starts, len(u)])
        rtype = tcode[starts]
        k = len(types)
        n_runs = np.bincount(rtype, minlength=k).astype(np.int64)
        n_ev = np.bincount(rtype, weights=lens,
                           minlength=k).astype(np.int64)
        mx = np.zeros(k, np.int64)
        np.maximum.at(mx, rtype, lens)
        return pd.DataFrame({"event_type": types, "n_runs": n_runs,
                             "n_events": n_ev, "max_run": mx})

    out = (_with_bucket(ev, "user_id", 32)
           .groupby("bucket").map_groups(per_bucket,
                                         batch_format="pandas")
           .map_batches(lambda t: t, batch_format="pyarrow")
           .groupby("event_type")
           .aggregate(rd.aggregate.Sum("n_runs"),
                      rd.aggregate.Sum("n_events"),
                      rd.aggregate.Max("max_run")))
    return _rename(out, ["event_type", "n_runs", "n_events",
                         "max_run"])


QUERIES["type_run_lengths"] = q_type_run_lengths
ORACLE_SQL["type_run_lengths"] = """
        WITH r AS (SELECT user_id, event_type,
                          row_number() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS rn,
                          row_number() OVER (
                              PARTITION BY user_id, event_type
                              ORDER BY ts, event_id) AS rt
                   FROM events),
        runs AS (SELECT event_type, count(*) AS run_len
                 FROM r GROUP BY user_id, event_type, rn - rt)
        SELECT event_type, count(*) AS n_runs,
               CAST(SUM(run_len) AS BIGINT) AS n_events,
               CAST(MAX(run_len) AS BIGINT) AS max_run
        FROM runs GROUP BY 1
    """


def q_quadkey_occupancy(sf_dir: str):
    """Spatial-index fill audit: for every occupied res-11 parent
    cell, how many of its four res-12 Morton children hold at least
    one tile — the 1..4 occupancy histogram that predicts pyramid
    compressibility. Child dedup partials → parent bit algebra
    (payload >> 2, res tag rewritten) → two bounded aggregations.
    SQL replays the full Morton encode plus the same bit ops."""
    from geotile.geom import cells
    from geotile.ops.tiles import read_image_table

    ds = read_image_table(_image_dir_for(sf_dir),
                          columns=["lon", "lat"])
    PAYLOAD = (1 << 58) - 1

    def child(t: pa.Table) -> pa.Table:
        c = cells.encode(t["lon"].to_numpy(), t["lat"].to_numpy(),
                         12).view(np.int64)
        g = pa.table({"cell": pa.array(c)}).group_by("cell") \
            .aggregate([])
        return g

    kids = (ds.map_batches(child, batch_format="pyarrow")
            .groupby("cell").count())

    def parent(t: pa.Table) -> pa.Table:
        c = t["cell"].to_numpy(zero_copy_only=False)
        par = ((c & PAYLOAD) >> 2) + (11 << 58)
        g = pa.table({"parent": pa.array(par)}).group_by("parent") \
            .aggregate([([], "count_all")])
        return pa.table({"parent": g["parent"],
                         "k": g["count_all"].cast(pa.int64())})

    occ = (kids.map_batches(parent, batch_format="pyarrow")
           .groupby("parent").sum("k"))

    def hist(t: pa.Table) -> pa.Table:
        k = t["sum(k)"]
        g = pa.table({"occupancy": k}).group_by("occupancy") \
            .aggregate([([], "count_all")])
        return pa.table({"occupancy": g["occupancy"],
                         "n_parents": g["count_all"]
                         .cast(pa.int64())})

    out = (occ.map_batches(hist, batch_format="pyarrow")
           .groupby("occupancy").sum("n_parents"))
    return _rename(out, ["occupancy", "n_parents"])


QUERIES["quadkey_occupancy"] = q_quadkey_occupancy


def _quadkey_occupancy_sql(sf_dir: str) -> str:
    img = _image_dir_for(sf_dir)
    cell12 = _sql_cell("lon", "lat", 12)
    return f"""
        WITH kids AS (SELECT DISTINCT {cell12} AS cell
                      FROM read_parquet('{img}/part-*.parquet')),
        par AS (SELECT ((cell & {(1 << 58) - 1}) >> 2)
                       + {11 << 58} AS parent,
                       count(*) AS k
                FROM kids GROUP BY 1)
        SELECT CAST(k AS BIGINT) AS occupancy,
               count(*) AS n_parents
        FROM par GROUP BY 1
    """


def q_simhash_bit_bias(sf_dir: str):
    """Hash-quality audit: per bit position 0..63, how many document
    simhashes have the bit SET — a biased position flags a weak
    feature mix. The engine folds its own vectorized simhash batches
    with 64 shift-and-mask reductions (64-row partials); the oracle
    replays the same bit extraction over the independent scalar
    simhash sidecar."""
    from geotile.ops.dedup import simhash_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        simhash_batch, batch_format="pyarrow", zero_copy_batch=True)

    def bits(t: pa.Table) -> pa.Table:
        h = t["simhash"].to_numpy(zero_copy_only=False)
        ns = np.array([int(((h >> b) & 1).sum()) for b in range(64)],
                      np.int64)
        return pa.table({"bit": pa.array(np.arange(64,
                                                   dtype=np.int64)),
                         "n_set": pa.array(ns)})

    out = (ds.map_batches(bits, batch_format="pyarrow")
           .groupby("bit").sum("n_set"))
    return _rename(out, ["bit", "n_set"])


QUERIES["simhash_bit_bias"] = q_simhash_bit_bias


def _simhash_bit_bias_sql(sf_dir: str) -> str:
    return f"""
        WITH s AS (SELECT simhash
                   FROM read_parquet('{_simhash_sidecar(sf_dir)}')),
        b AS (SELECT unnest(range(0, 64)) AS bit)
        SELECT CAST(b.bit AS BIGINT) AS bit,
               CAST(SUM((s.simhash >> b.bit) & 1) AS BIGINT) AS n_set
        FROM b, s GROUP BY 1
    """


def q_coverage_holes_cells(sf_dir: str):
    """Network coverage-fringe map: tiles farther than 500 m from
    EVERY route centerline, rolled up per res-12 cell — where the
    network thins out. Per batch: the same clamped-projection meter-frame
    distance kernel as kNN against the broadcast route parts (min
    across parts = min across routes, sqrt is monotone so the order
    of sqrt/min matches the replay bit-for-bit), threshold, Morton
    encode, cell partials. Oracle: the segments-sidecar d² replay
    with a global per-image min."""
    from geotile.geom import cells
    from geotile.geom.buffer import meter_frame
    from geotile.geom.pip import points_to_polyline_distance
    from geotile.ops.join import (_ANCHOR_LAT, _ANCHOR_LON,
                                  route_polylines)
    from geotile.ops.tiles import read_image_table

    mx, my = meter_frame(_ANCHOR_LAT)
    lines = route_polylines(_fixture_ctx())
    parts = [p for rid in sorted(lines) for p in lines[rid]]
    pref = ray.put(parts)

    ds = read_image_table(_image_dir_for(sf_dir),
                          columns=["lon", "lat"])

    def holes(t: pa.Table) -> pa.Table:
        parts_ = _broadcast(pref)
        lon = t["lon"].to_numpy()
        lat = t["lat"].to_numpy()
        px = (lon - _ANCHOR_LON) * mx
        py = (lat - _ANCHOR_LAT) * my
        best = np.full(len(lon), np.inf)
        for part in parts_:
            m = np.column_stack([(part[:, 0] - _ANCHOR_LON) * mx,
                                 (part[:, 1] - _ANCHOR_LAT) * my])
            best = np.minimum(best,
                              points_to_polyline_distance(px, py, m))
        hole = best > 500.0
        c = cells.encode(lon[hole], lat[hole], 12).view(np.int64)
        g = pa.table({"cell": pa.array(c)}).group_by("cell") \
            .aggregate([([], "count_all")])
        return pa.table({"cell": g["cell"],
                         "n_holes": g["count_all"].cast(pa.int64())})

    out = (ds.map_batches(holes, batch_format="pyarrow")
           .groupby("cell").sum("n_holes"))
    return _rename(out, ["cell", "n_holes"])


QUERIES["coverage_holes_cells"] = q_coverage_holes_cells


def _coverage_holes_sql(sf_dir: str) -> str:
    from geotile.geom.buffer import meter_frame
    from geotile.ops.join import _ANCHOR_LAT, _ANCHOR_LON

    img = _image_dir_for(sf_dir)
    segs = _oracle_segments_path()
    mx, my = meter_frame(_ANCHOR_LAT)
    cell12 = _sql_cell("p.lon", "p.lat", 12)
    return f"""
        WITH p AS (SELECT image_id, lon, lat,
                          (lon - ({_ANCHOR_LON!r})) * {mx!r} AS px,
                          (lat - ({_ANCHOR_LAT!r})) * {my!r} AS py
                   FROM read_parquet('{img}/part-*.parquet')),
        ps AS (SELECT p.image_id, p.px, p.py, s.ax, s.ay, s.dx, s.dy,
                      greatest(0.0, least(1.0,
                          ((p.px - s.ax) * s.dx + (p.py - s.ay) * s.dy)
                          * s.inv_l2)) AS t
               FROM p CROSS JOIN read_parquet('{segs}') s),
        d AS (SELECT image_id,
                     min(((px - ax) - t * dx) * ((px - ax) - t * dx)
                       + ((py - ay) - t * dy) * ((py - ay) - t * dy))
                         AS d2
              FROM ps GROUP BY 1)
        SELECT {cell12} AS cell, count(*) AS n_holes
        FROM d JOIN p USING (image_id)
        WHERE sqrt(d.d2) > 500.0
        GROUP BY 1
    """


def q_sessions_crossing_midnight(sf_dir: str):
    """Session-boundary audit: of all 30-minute-gap sessions, how
    many span a UTC midnight — the bias a naive daily rollup
    introduces. Stage reuse: ops/relational.sessionize assigns
    session ids where the user lives; per-session day extents and
    the two global counters are bounded partials."""
    from geotile.ops.relational import sessionize

    ev = _read(sf_dir, "events", ["user_id", "ts"])
    s = sessionize(ev, key="user_id", ts="ts", gap_s=1800.0)

    def extents(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"n_sessions":
                                 pd.Series(dtype=np.int64),
                                 "n_crossing":
                                 pd.Series(dtype=np.int64)})
        d = df["ts"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64) // 86_400_000_000
        u = df["user_id"].to_numpy(np.int64)
        sid = df["session_idx"].to_numpy(np.int64)
        key = u * (1 << 20) + sid  # sessions/user ≪ 2^20
        o = np.argsort(key, kind="stable")
        key, d = key[o], d[o]
        new = np.r_[True, key[1:] != key[:-1]]
        first = np.flatnonzero(new)
        gid = np.cumsum(new) - 1
        d0 = np.full(len(first), np.iinfo(np.int64).max)
        d1 = np.full(len(first), np.iinfo(np.int64).min)
        np.minimum.at(d0, gid, d)
        np.maximum.at(d1, gid, d)
        return pd.DataFrame({"n_sessions": [len(first)],
                             "n_crossing": [int((d1 > d0).sum())]})

    parts = s.map_batches(extents, batch_format="pandas").take_all()
    return pd.DataFrame({
        "n_sessions": [sum(int(r["n_sessions"]) for r in parts)],
        "n_crossing": [sum(int(r["n_crossing"]) for r in parts)]})


QUERIES["sessions_crossing_midnight"] = q_sessions_crossing_midnight
ORACLE_SQL["sessions_crossing_midnight"] = """
        WITH s AS (SELECT user_id, ts,
                          CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                              OVER (PARTITION BY user_id ORDER BY ts)
                              > 1800000000 THEN 1 ELSE 0 END AS brk
                   FROM events),
        x AS (SELECT user_id, ts,
                     SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                         ROWS UNBOUNDED PRECEDING) AS sid
              FROM s),
        g AS (SELECT user_id, sid,
                     MIN(epoch_us(ts) // 86400000000) AS d0,
                     MAX(epoch_us(ts) // 86400000000) AS d1
              FROM x GROUP BY 1, 2)
        SELECT count(*) AS n_sessions,
               CAST(count(*) FILTER (d1 > d0) AS BIGINT) AS n_crossing
        FROM g
    """


def q_price_endings_orders(sf_dir: str):
    """Psychological-pricing / data-quality audit: the distribution of
    order totalprice CENT endings (cents mod 100) — synthetic data
    shows uniform noise, scraped catalogs spike at .99. One 100-row
    aggregate from batch partials."""
    orders = _read(sf_dir, "orders", ["o_totalprice"])

    def part(t: pa.Table) -> pa.Table:
        cents = pc.floor(pc.add(pc.multiply(
            t["o_totalprice"], pa.scalar(100.0)),
            pa.scalar(0.5))).cast(pa.int64())
        ending = pc.subtract(cents, pc.multiply(
            pc.divide(cents, pa.scalar(100, pa.int64())),
            pa.scalar(100, pa.int64())))
        g = pa.table({"ending": ending}).group_by("ending") \
            .aggregate([([], "count_all")])
        return pa.table({"ending": g["ending"],
                         "n": g["count_all"].cast(pa.int64())})

    out = (orders.map_batches(part, batch_format="pyarrow")
           .groupby("ending").sum("n"))
    return _rename(out, ["ending", "n"])


QUERIES["price_endings_orders"] = q_price_endings_orders
ORACLE_SQL["price_endings_orders"] = """
        WITH c AS (SELECT CAST(floor(o_totalprice * 100.0 + 0.5)
                               AS BIGINT) AS cents
                   FROM orders)
        SELECT cents % 100 AS ending, count(*) AS n
        FROM c GROUP BY 1
    """


def q_nearest_route_share(sf_dir: str):
    """Catchment share: how many tiles have each route as their
    NEAREST centerline (kNN rank-0 counts) — the market-share view of
    the corridor. Reuses the exact kNN operator (per-batch partial
    top-k, round-6 distance + route-id tie discipline); the share
    readout is a route-cardinality aggregate. Oracle: the kNN replay
    filtered to rn = 1 and grouped."""
    from geotile.ops.join import knn_routes, route_polylines
    from geotile.ops.tiles import JOIN_COLUMNS, read_image_table

    ctx = _fixture_ctx()
    ds = read_image_table(_image_dir_for(sf_dir), columns=JOIN_COLUMNS)
    nn = knn_routes(ds, route_polylines(ctx), k=1)
    out = (nn.map_batches(lambda t: t.select(["route_id"]),
                          batch_format="pyarrow")
           .groupby("route_id").count())
    return _rename(out, ["route_id", "n_tiles"])


QUERIES["nearest_route_share"] = q_nearest_route_share


def _nearest_route_share_sql(sf_dir: str) -> str:
    from geotile.geom.buffer import meter_frame
    from geotile.ops.join import _ANCHOR_LAT, _ANCHOR_LON

    img = _image_dir_for(sf_dir)
    segs = _oracle_segments_path()
    mx, my = meter_frame(_ANCHOR_LAT)
    return f"""
        WITH p AS (SELECT image_id,
                          (lon - ({_ANCHOR_LON!r})) * {mx!r} AS px,
                          (lat - ({_ANCHOR_LAT!r})) * {my!r} AS py
                   FROM read_parquet('{img}/part-*.parquet')),
        ps AS (SELECT p.image_id, s.route_id, p.px, p.py,
                      s.ax, s.ay, s.dx, s.dy,
                      greatest(0.0, least(1.0,
                          ((p.px - s.ax) * s.dx + (p.py - s.ay) * s.dy)
                          * s.inv_l2)) AS t
               FROM p CROSS JOIN read_parquet('{segs}') s),
        d AS (SELECT image_id, route_id,
                     min(((px - ax) - t * dx) * ((px - ax) - t * dx)
                       + ((py - ay) - t * dy) * ((py - ay) - t * dy))
                         AS d2
              FROM ps GROUP BY 1, 2),
        r AS (SELECT image_id, route_id,
                     row_number() OVER (PARTITION BY image_id
                         ORDER BY sqrt(d2), route_id) AS rn
              FROM d)
        SELECT route_id, count(*) AS n_tiles
        FROM r WHERE rn = 1 GROUP BY 1
    """


def q_priority_migration_customers(sf_dir: str):
    """Priority migration matrix: each repeat customer's FIRST order
    priority vs their LAST ((day, orderkey) order) — do buyers
    escalate? One custkey co-partition, two segment-end gathers,
    25-cell partials. Double-ROW_NUMBER replay."""
    from geotile.ops.relational import _with_bucket

    orders = _read(sf_dir, "orders",
                   ["o_custkey", "o_orderkey", "o_orderdate",
                    "o_orderpriority"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"first_prio": pd.Series(dtype=object),
                              "last_prio": pd.Series(dtype=object),
                              "n_customers":
                                  pd.Series(dtype=np.int64)})
        if len(df) == 0:
            return empty
        c = df["o_custkey"].to_numpy(np.int64)
        k = df["o_orderkey"].to_numpy(np.int64)
        d = (df["o_orderdate"].to_numpy().astype("datetime64[us]")
             .astype(np.int64) // 86_400_000_000)
        pr = df["o_orderpriority"].to_numpy()
        o = np.lexsort((k, d, c))
        cc, pp = c[o], pr[o]
        starts = np.flatnonzero(np.r_[True, cc[1:] != cc[:-1]])
        ends = np.r_[starts[1:], len(cc)] - 1
        multi = ends > starts  # repeat customers only
        g = pd.DataFrame({"first_prio": pp[starts[multi]],
                          "last_prio": pp[ends[multi]]}) \
            .groupby(["first_prio", "last_prio"],
                     as_index=False).size()
        return g.rename(columns={"size": "n_customers"})

    out = (_with_bucket(orders, "o_custkey", 32)
           .groupby("bucket").map_groups(per_bucket,
                                         batch_format="pandas")
           .map_batches(lambda t: t, batch_format="pyarrow")
           .groupby(["first_prio", "last_prio"]).sum("n_customers"))
    return _rename(out, ["first_prio", "last_prio", "n_customers"])


QUERIES["priority_migration_customers"] = q_priority_migration_customers
ORACLE_SQL["priority_migration_customers"] = """
        WITH r AS (SELECT o_custkey AS c, o_orderpriority AS p,
                          row_number() OVER (PARTITION BY o_custkey
                              ORDER BY CAST(epoch_us(o_orderdate)
                                  // 86400000000 AS BIGINT),
                                  o_orderkey) AS rn,
                          row_number() OVER (PARTITION BY o_custkey
                              ORDER BY CAST(epoch_us(o_orderdate)
                                  // 86400000000 AS BIGINT) DESC,
                                  o_orderkey DESC) AS rnd,
                          COUNT(*) OVER (PARTITION BY o_custkey) AS n
                   FROM orders)
        SELECT f.p AS first_prio, l.p AS last_prio,
               count(*) AS n_customers
        FROM r f JOIN r l ON l.c = f.c AND l.rnd = 1
        WHERE f.rn = 1 AND f.n >= 2
        GROUP BY 1, 2
    """


def q_cusum_daily_revenue(sf_dir: str):
    """Change-point detection, integer-exact: the CUSUM excursion of
    daily revenue against the global mean WITHOUT forming the mean —
    E_k = D·P_k − (k+1)·T (D days, P_k the dollar prefix, T the
    total), max |E_k| and its earliest day. Day partials + an
    O(days) epilogue; a regime shift shows as a deep excursion.
    Dollar lattice (cents·days·prefix would court int64 overflow at
    100 TB). Window-SUM replay."""
    orders = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def part(t: pa.Table) -> pa.Table:
        d = pc.divide(t["o_orderdate"].cast(pa.int64()),
                      pa.scalar(86_400_000_000, pa.int64()))
        dollars = pc.floor(pc.add(t["o_totalprice"],
                                  pa.scalar(0.5))).cast(pa.int64())
        g = pa.table({"day": d, "c": dollars}).group_by("day") \
            .aggregate([("c", "sum")])
        return pa.table({"day": g["day"], "c": g["c_sum"]})

    rows = (orders.map_batches(part, batch_format="pyarrow")
            .groupby("day").sum("c")).take_all()
    if not rows:
        return pd.DataFrame({"max_excursion":
                             pd.Series(dtype=np.int64),
                             "argmax_day": pd.Series(dtype=np.int64)})
    days = {r["day"]: r["sum(c)"] for r in rows}
    lo, hi = min(days), max(days)
    series = [days.get(d, 0) for d in range(lo, hi + 1)]
    D = len(series)
    T = sum(series)
    best, best_day, P = -1, -1, 0
    for k, c in enumerate(series):
        P += c
        e = abs(D * P - (k + 1) * T)
        if e > best:
            best, best_day = e, lo + k
    return pd.DataFrame({"max_excursion": [best],
                         "argmax_day": [best_day]})


QUERIES["cusum_daily_revenue"] = q_cusum_daily_revenue
ORACLE_SQL["cusum_daily_revenue"] = """
        WITH d AS (SELECT CAST(epoch_us(o_orderdate) // 86400000000
                       AS BIGINT) AS day,
                          SUM(CAST(floor(o_totalprice + 0.5)
                                   AS BIGINT)) AS c
                   FROM orders GROUP BY 1),
        b AS (SELECT MIN(day) AS lo, MAX(day) AS hi,
                     CAST(SUM(c) AS BIGINT) AS t FROM d),
        idx AS (SELECT unnest(range(0, CAST((SELECT hi - lo + 1 FROM b)
                    AS BIGINT))) AS i),
        s0 AS (SELECT i.i, COALESCE(d.c, 0) AS c
               FROM idx i LEFT JOIN d
                 ON d.day = i.i + (SELECT lo FROM b)),
        e AS (SELECT i,
                     abs((SELECT hi - lo + 1 FROM b)
                         * SUM(c) OVER (ORDER BY i
                             ROWS UNBOUNDED PRECEDING)
                         - (i + 1) * (SELECT t FROM b)) AS exc
              FROM s0)
        SELECT CAST(MAX(exc) AS BIGINT) AS max_excursion,
               CAST((SELECT lo FROM b)
                    + MIN(i) FILTER (exc = (SELECT MAX(exc) FROM e))
                    AS BIGINT) AS argmax_day
        FROM e
    """


def q_repetitiveness_docs(sf_dir: str):
    """Template/boilerplate detector: per document the ratio of
    DISTINCT adjacent token pairs to total pairs, bucketed to deciles
    (distinct·10 // total, single-token docs land in bucket 10) —
    low buckets are copy-paste templates. Vectorized: one flatten
    builds every doc's pair strings with doc-offset prefixes, one
    np.unique dedups per doc; doc-cardinality partials."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def part(t: pa.Table) -> pa.Table:
        lists = pc.split_pattern(t["text"], " ")
        lens = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = np.asarray(pc.list_flatten(lists).to_pylist(),
                          dtype=object)
        doc_of = np.repeat(np.arange(len(lens)), lens)
        # adjacent pairs within each doc: positions where the next
        # token belongs to the same doc
        ok = np.flatnonzero(doc_of[1:] == doc_of[:-1]) \
            if len(doc_of) > 1 else np.array([], np.int64)
        n_pairs = np.bincount(doc_of[ok], minlength=len(lens)) \
            .astype(np.int64)
        if len(ok):
            pair = np.char.add(
                np.char.add(doc_of[ok].astype(str), "\x1f"),
                np.char.add(np.char.add(
                    flat[ok].astype(str), "\x1f"),
                    flat[ok + 1].astype(str)))
            upair = np.unique(pair)
            udoc = np.array([int(s.split("\x1f", 1)[0])
                             for s in upair.tolist()], np.int64)
            n_dist = np.bincount(udoc, minlength=len(lens)) \
                .astype(np.int64)
        else:
            n_dist = np.zeros(len(lens), np.int64)
        bucket = np.where(n_pairs > 0,
                          n_dist * 10 // np.maximum(n_pairs, 1), 10)
        g = pa.table({"bucket": pa.array(bucket.astype(np.int64))}) \
            .group_by("bucket").aggregate([([], "count_all")])
        return pa.table({"bucket": g["bucket"],
                         "n_docs": g["count_all"].cast(pa.int64())})

    out = (docs.map_batches(part, batch_format="pyarrow")
           .groupby("bucket").sum("n_docs"))
    return _rename(out, ["bucket", "n_docs"])


QUERIES["repetitiveness_docs"] = q_repetitiveness_docs
ORACLE_SQL["repetitiveness_docs"] = """
        WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks
                   FROM documents),
        p AS (SELECT doc_id,
                     toks[CAST(i AS BIGINT)] || chr(31)
                         || toks[CAST(i AS BIGINT) + 1] AS pair
              FROM w, unnest(range(1, len(toks))) AS u(i)),
        s AS (SELECT doc_id, count(*) AS n_pairs,
                     CAST(COUNT(DISTINCT pair) AS BIGINT) AS n_dist
              FROM p GROUP BY 1),
        all_docs AS (SELECT w.doc_id,
                            COALESCE(s.n_pairs, 0) AS n_pairs,
                            COALESCE(s.n_dist, 0) AS n_dist
                     FROM w LEFT JOIN s USING (doc_id))
        SELECT CASE WHEN n_pairs > 0
                    THEN n_dist * 10 // GREATEST(n_pairs, 1)
                    ELSE 10 END AS bucket,
               count(*) AS n_docs
        FROM all_docs GROUP BY 1
    """


def q_burst_window_max_users(sf_dir: str):
    """Bot-likeness: each user's MAXIMUM event count inside any
    60-second window anchored at one of their events, as a histogram
    — humans cap at a handful, scripts do not. One user co-partition;
    the composite (segment << 48) + relative-ts key lets a single
    searchsorted resolve every window, window counts are index
    algebra, per-user maxima are segment maxima."""
    from geotile.ops.relational import _with_bucket

    ev = _read(sf_dir, "events", ["user_id", "event_id", "ts"])
    W = 60_000_000

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"max_burst": pd.Series(dtype=np.int64),
                              "n_users": pd.Series(dtype=np.int64)})
        if len(df) == 0:
            return empty
        u = df["user_id"].to_numpy(np.int64)
        e = df["event_id"].to_numpy(np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        o = np.lexsort((e, ts, u))
        u, ts = u[o], ts[o]
        seg_of = np.cumsum(np.r_[True, u[1:] != u[:-1]]) - 1
        rel = ts - ts.min()
        assert rel.max(initial=0) < (1 << 48) - W, "ts-range contract"
        comp = seg_of * (1 << 48) + rel
        # count of events in [t_i, t_i + W) within the user segment
        hi = np.searchsorted(comp, comp + W, side="left")
        win = hi - np.arange(len(u))
        mx = np.zeros(seg_of[-1] + 1, np.int64)
        np.maximum.at(mx, seg_of, win)
        g = pd.DataFrame({"max_burst": mx}) \
            .groupby("max_burst", as_index=False).size()
        return g.rename(columns={"size": "n_users"})

    out = (_with_bucket(ev, "user_id", 32)
           .groupby("bucket").map_groups(per_bucket,
                                         batch_format="pandas")
           .map_batches(lambda t: t, batch_format="pyarrow")
           .groupby("max_burst").sum("n_users"))
    return _rename(out, ["max_burst", "n_users"])


QUERIES["burst_window_max_users"] = q_burst_window_max_users
ORACLE_SQL["burst_window_max_users"] = """
        WITH c AS (SELECT e1.user_id, e1.event_id, count(*) AS w
                   FROM events e1 JOIN events e2
                     ON e2.user_id = e1.user_id
                    AND e2.ts >= e1.ts
                    AND epoch_us(e2.ts) - epoch_us(e1.ts) < 60000000
                   GROUP BY 1, 2),
        m AS (SELECT user_id, CAST(MAX(w) AS BIGINT) AS max_burst
              FROM c GROUP BY 1)
        SELECT max_burst, count(*) AS n_users FROM m GROUP BY 1
    """


def q_weak_edges_dups(sf_dir: str):
    """Weak-link audit on the near-dup graph: edges whose endpoints
    share NO common neighbour (triangle-free links — one borderline
    pair, not a cluster) vs the total. Broadcast CSR adjacency;
    per-edge sorted-array intersection. Oracle: NOT-EXISTS common-
    neighbour replay over the pair list."""
    from geotile.ops.dedup import embedding_dup_pairs

    pairs = embedding_dup_pairs(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
        tau=0.35).take_all()
    a = np.array([r["a"] for r in pairs], np.int64)
    b = np.array([r["b"] for r in pairs], np.int64)
    u = np.concatenate([a, b])
    v = np.concatenate([b, a])
    o = np.lexsort((v, u))
    u, v = u[o], v[o]
    nodes, starts = np.unique(u, return_index=True)
    ends = np.r_[starts[1:], len(u)]
    aref = ray.put((nodes, starts, ends, v))

    ds = rd.from_arrow(pa.table({"a": pa.array(a),
                                 "b": pa.array(b)})).repartition(4)

    def weak(t: pa.Table) -> pa.Table:
        nodes_, starts_, ends_, adj = _broadcast(aref)
        aa = t["a"].to_numpy(zero_copy_only=False)
        bb = t["b"].to_numpy(zero_copy_only=False)
        n_weak = 0
        for x, y in zip(aa.tolist(), bb.tolist()):
            i = np.searchsorted(nodes_, x)
            j = np.searchsorted(nodes_, y)
            nx = adj[starts_[i]:ends_[i]]
            ny = adj[starts_[j]:ends_[j]]
            common = int(np.searchsorted(ny, nx, side="right").sum()
                         - np.searchsorted(ny, nx, side="left").sum())
            # x and y are in each other's lists but never in both
            if common == 0:
                n_weak += 1
        return pa.table({"n_edges": pa.array([len(aa)], pa.int64()),
                         "n_weak": pa.array([n_weak], pa.int64())})

    parts = ds.map_batches(weak, batch_format="pyarrow").take_all()
    return pd.DataFrame({
        "n_edges": [sum(r["n_edges"] for r in parts)],
        "n_weak": [sum(r["n_weak"] for r in parts)]})


QUERIES["weak_edges_dups"] = q_weak_edges_dups


ORACLE_SQL["weak_edges_dups"] = f"""
        WITH pairs AS ({EMBEDDING_DUPS_SQL}),
        e AS (SELECT a AS u, b AS v FROM pairs
              UNION SELECT b, a FROM pairs)
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM pairs)
                   AS n_edges,
               (SELECT CAST(count(*) AS BIGINT) FROM pairs p
                WHERE NOT EXISTS (
                    SELECT 1 FROM e x JOIN e y
                      ON y.v = x.v AND y.u = p.b
                    WHERE x.u = p.a)) AS n_weak
    """


def q_mutual_best_pairs(sf_dir: str):
    """Reciprocal best match: (part, supplier) pairs where the
    supplier is the part's top revenue source AND the part is that
    supplier's top revenue part — the mutual-argmax matching used in
    alignment/dedup. One packed (part,supp) revenue aggregate feeds
    TWO strict argmax passes (part co-partition, then supplier
    co-partition of the same pair table); mutual pairs meet in a
    driver set intersection bounded by min(parts, suppliers). Ties
    break to the smaller counterpart key. Double-ROW_NUMBER replay."""
    from geotile.ops.relational import _with_bucket

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.floor(pc.add(pc.multiply(
            t["l_extendedprice"], pa.scalar(100.0)),
            pa.scalar(0.5))).cast(pa.int64())
        packed = pc.add(pc.multiply(t["l_partkey"],
                                    pa.scalar(1 << 20, pa.int64())),
                        t["l_suppkey"])
        g = pa.table({"pk": packed, "c": cents}).group_by("pk") \
            .aggregate([("c", "sum")])
        return pa.table({"pk": g["pk"], "cents": g["c_sum"]})

    pairs = (li.map_batches(partial, batch_format="pyarrow")
             .groupby("pk").sum("cents"))
    pairs = _rename(pairs, ["pk", "cents"]).map_batches(
        lambda t: pa.table({
            "part": pc.shift_right(t["pk"], pa.scalar(20, pa.int64())),
            "supp": pc.bit_wise_and(t["pk"],
                                    pa.scalar((1 << 20) - 1,
                                              pa.int64())),
            "cents": t["cents"]}),
        batch_format="pyarrow").materialize()

    def argmax_by(key: str, other: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return pd.DataFrame({key: pd.Series(dtype=np.int64),
                                     other: pd.Series(dtype=np.int64)})
            k = df[key].to_numpy(np.int64)
            o_ = df[other].to_numpy(np.int64)
            c = df["cents"].to_numpy(np.int64)
            # best = max cents, tie -> smaller counterpart key
            order = np.lexsort((o_, -c, k))
            kk = k[order]
            first = np.flatnonzero(np.r_[True, kk[1:] != kk[:-1]])
            return pd.DataFrame({key: kk[first],
                                 other: o_[order][first]})
        return fn

    best_supp = (_with_bucket(pairs, "part", 16)
                 .groupby("bucket").map_groups(
                     argmax_by("part", "supp"),
                     batch_format="pandas")).take_all()
    best_part = (_with_bucket(pairs, "supp", 16)
                 .groupby("bucket").map_groups(
                     argmax_by("supp", "part"),
                     batch_format="pandas")).take_all()
    bs = {(r["part"], r["supp"]) for r in best_supp}
    bp = {(r["part"], r["supp"]) for r in best_part}
    mutual = sorted(bs & bp)
    return pd.DataFrame({
        "p_partkey": [p for p, _ in mutual],
        "s_suppkey": [s for _, s in mutual]})


QUERIES["mutual_best_pairs"] = q_mutual_best_pairs
ORACLE_SQL["mutual_best_pairs"] = """
        WITH ps AS (SELECT l_partkey AS p, l_suppkey AS s,
                           CAST(SUM(CAST(floor(l_extendedprice * 100.0
                                               + 0.5) AS BIGINT))
                                AS BIGINT) AS c
                    FROM lineitem GROUP BY 1, 2),
        bp AS (SELECT p, s, row_number() OVER (PARTITION BY p
                   ORDER BY c DESC, s) AS rn FROM ps),
        bs AS (SELECT p, s, row_number() OVER (PARTITION BY s
                   ORDER BY c DESC, p) AS rn FROM ps)
        SELECT bp.p AS p_partkey, bp.s AS s_suppkey
        FROM bp JOIN bs ON bs.p = bp.p AND bs.s = bp.s
        WHERE bp.rn = 1 AND bs.rn = 1
    """


def q_cross_source_leakage(sf_dir: str):
    """Contamination audit: NEAR-duplicate documents (MinHash+LSH
    verified pairs, tau = 0.35) whose two sides live in DIFFERENT
    sources, counted per unordered source pair — train/eval leakage's
    most common shape. Stage reuse: the oracle-checked pair operator
    runs unchanged; sources attach via a broadcast sorted id→source
    gather (corpus-dim here; co-partition the pair list against
    documents at 100 TB). LEAST/GREATEST pair-once discipline."""
    from geotile.ops.dedup import minhash_lsh_pairs

    docs = _read(sf_dir, "documents", ["doc_id", "source"]).take_all()
    ids = np.array(sorted(r["doc_id"] for r in docs), np.int64)
    byd = {r["doc_id"]: r["source"] for r in docs}
    srcs = np.array([byd[k] for k in ids])
    sref = ray.put((ids, srcs))

    pairs = minhash_lsh_pairs(
        _read(sf_dir, "documents", ["doc_id", "text"]), threshold=0.35)

    def tag(t: pa.Table) -> pa.Table:
        ids_, srcs_ = _broadcast(sref)
        a = srcs_[np.searchsorted(ids_, t["a"].to_numpy(
            zero_copy_only=False))]
        b = srcs_[np.searchsorted(ids_, t["b"].to_numpy(
            zero_copy_only=False))]
        keep = a != b
        a, b = a[keep], b[keep]
        swap = a > b  # np.minimum has no str ufunc; compare + where
        lo = np.where(swap, b, a)
        hi = np.where(swap, a, b)
        g = pa.table({"source_a": pa.array(lo),
                      "source_b": pa.array(hi)}) \
            .group_by(["source_a", "source_b"]).aggregate(
                [([], "count_all")])
        return pa.table({"source_a": g["source_a"],
                         "source_b": g["source_b"],
                         "n_pairs": g["count_all"].cast(pa.int64())})

    out = (pairs.map_batches(tag, batch_format="pyarrow")
           .groupby(["source_a", "source_b"]).sum("n_pairs"))
    return _rename(out, ["source_a", "source_b", "n_pairs"])


QUERIES["cross_source_leakage"] = q_cross_source_leakage


def _cross_source_leakage_sql(sf_dir: str) -> str:
    return f"""
        SELECT LEAST(da.source, db.source) AS source_a,
               GREATEST(da.source, db.source) AS source_b,
               count(*) AS n_pairs
        FROM read_parquet('{_minhash_pairs_sidecar(sf_dir)}') p
        JOIN documents da ON da.doc_id = p.a
        JOIN documents db ON db.doc_id = p.b
        WHERE da.source <> db.source
        GROUP BY 1, 2
    """


def q_value_ecdf_probes(sf_dir: str):
    """ECDF probes: per event type, how many values fall at or below
    each fixed threshold (1, 10, 100, 250) — the monitoring
    dashboard's cheap distribution fingerprint. type×4 partials, one
    tiny shuffle."""
    ev = _read(sf_dir, "events", ["event_type", "value"])
    PROBES = (1.0, 10.0, 100.0, 250.0)

    def part(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        types, inv = np.unique(et, return_inverse=True)
        cols = {"event_type": pa.array(types),
                "n": pa.array(np.bincount(
                    inv, minlength=len(types)).astype(np.int64))}
        for p in PROBES:
            cols[f"le_{int(p)}"] = pa.array(np.bincount(
                inv, weights=(v <= p).astype(np.float64),
                minlength=len(types)).astype(np.int64))
        return pa.table(cols)

    out = (ev.map_batches(part, batch_format="pyarrow")
           .groupby("event_type")
           .sum(["n", "le_1", "le_10", "le_100", "le_250"]))
    return _rename(out, ["event_type", "n", "le_1", "le_10",
                         "le_100", "le_250"])


QUERIES["value_ecdf_probes"] = q_value_ecdf_probes
ORACLE_SQL["value_ecdf_probes"] = """
        SELECT event_type, count(*) AS n,
               CAST(count(*) FILTER (value <= 1.0) AS BIGINT)
                   AS le_1,
               CAST(count(*) FILTER (value <= 10.0) AS BIGINT)
                   AS le_10,
               CAST(count(*) FILTER (value <= 100.0) AS BIGINT)
                   AS le_100,
               CAST(count(*) FILTER (value <= 250.0) AS BIGINT)
                   AS le_250
        FROM events GROUP BY 1
    """


def q_closest_pair_tiles(sf_dir: str):
    """Distributed CLOSEST PAIR over the tile points: grid cells of
    side g = 0.01° scatter every point to its cell, candidate pairs
    form only inside a cell and its 8 neighbours (dedup by packed
    index pair), and the exact squared degree distance elects the
    global minimum with the earliest (id_a, id_b) tie rule. The grid
    guarantee — the true closest pair shares a 3×3 neighbourhood
    whenever its distance ≤ g — is ASSERTED on the result. SQL
    replays the same quantized join."""
    import pyarrow.parquet as pq

    from geotile.ops.tiles import read_image_table

    G = 0.01
    ds = read_image_table(_image_dir_for(sf_dir),
                          columns=["image_id", "lon", "lat"])
    rows = ds.take_all()  # ids + 2 doubles; corpus-dim for the demo
    rows.sort(key=lambda r: r["image_id"])
    ids = np.array([r["image_id"] for r in rows])
    lon = np.array([r["lon"] for r in rows])
    lat = np.array([r["lat"] for r in rows])
    pref = ray.put((ids, lon, lat))

    src = rd.from_arrow(pa.table({
        "i": pa.array(np.arange(len(ids), dtype=np.int64)),
        "cx": pa.array(np.floor(lon / G).astype(np.int64)),
        "cy": pa.array(np.floor(lat / G).astype(np.int64))})) \
        .repartition(8)

    def scatter(t: pa.Table) -> pa.Table:
        i = t["i"].to_numpy(zero_copy_only=False)
        cx = t["cx"].to_numpy(zero_copy_only=False)
        cy = t["cy"].to_numpy(zero_copy_only=False)
        oc, oi = [], []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                oc.append((cx + dx) << 32 | ((cy + dy) & 0xFFFFFFFF))
                oi.append(i)
        return pa.table({"cell": pa.array(np.concatenate(oc)),
                         "i": pa.array(np.concatenate(oi)),
                         "home": pa.array(np.tile(
                             (cx << 32) | (cy & 0xFFFFFFFF), 9))})

    def best_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"d2": pd.Series(dtype=np.float64),
                              "ia": pd.Series(dtype=np.int64),
                              "ib": pd.Series(dtype=np.int64)})
        if len(df) == 0:
            return empty
        _, lon_, lat_ = _broadcast(pref)
        cell = df["cell"].to_numpy(np.int64)
        i = df["i"].to_numpy(np.int64)
        home = df["home"].to_numpy(np.int64)
        o = np.lexsort((i, cell))
        cell, i, home = cell[o], i[o], home[o]
        first = np.flatnonzero(np.r_[True, cell[1:] != cell[:-1]])
        cnt = np.diff(np.r_[first, len(cell)])
        best = (np.inf, -1, -1)
        for f, c in zip(first[cnt > 1], cnt[cnt > 1]):
            ii = i[f:f + c]
            hh = home[f:f + c]
            # pair once: only when this cell is the FIRST point's home
            own = hh == cell[f]
            if not own.any():
                continue
            a, b = np.meshgrid(ii, ii, indexing="ij")
            oa = np.repeat(own, len(ii)).reshape(len(ii), len(ii))
            m = (a < b) & oa
            if not m.any():
                continue
            aa, bb = a[m], b[m]
            dx = lon_[aa] - lon_[bb]
            dy = lat_[aa] - lat_[bb]
            d2 = dx * dx + dy * dy
            k = np.lexsort((bb, aa, d2))[0]
            if (d2[k], aa[k], bb[k]) < best:
                best = (float(d2[k]), int(aa[k]), int(bb[k]))
        if best[1] < 0:
            return empty
        return pd.DataFrame({"d2": [best[0]], "ia": [best[1]],
                             "ib": [best[2]]})

    cands = (src.map_batches(scatter, batch_format="pyarrow")
             .map_batches(lambda t: t.append_column(
                 "bkt", pc.bit_wise_and(t["cell"],
                                        pa.scalar(0x3F, pa.int64()))),
                 batch_format="pyarrow")
             .groupby("bkt").map_groups(best_in_bucket,
                                        batch_format="pandas")
             ).take_all()
    assert cands, "no candidate pair — raise the grid size g"
    best = min((r["d2"], r["ia"], r["ib"]) for r in cands)
    assert best[0] <= G * G, "grid guarantee violated — raise g"
    return pd.DataFrame({"img_a": [ids[best[1]]],
                         "img_b": [ids[best[2]]],
                         "d2_e12": [int(np.floor(
                             best[0] * 1e12 + 0.5))]})


QUERIES["closest_pair_tiles"] = q_closest_pair_tiles


def _closest_pair_sql(sf_dir: str) -> str:
    img = _image_dir_for(sf_dir)
    return f"""
        WITH p AS (SELECT image_id, lon, lat,
                          CAST(floor(lon / 0.01) AS BIGINT) AS cx,
                          CAST(floor(lat / 0.01) AS BIGINT) AS cy
                   FROM read_parquet('{img}/part-*.parquet')),
        d AS (SELECT a.image_id AS ia, b.image_id AS ib,
                     (a.lon - b.lon) * (a.lon - b.lon)
                     + (a.lat - b.lat) * (a.lat - b.lat) AS d2
              FROM p a JOIN p b
                ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
               AND a.image_id < b.image_id),
        r AS (SELECT ia, ib, d2,
                     row_number() OVER (ORDER BY d2, ia, ib) AS rn
              FROM d)
        SELECT ia AS img_a, ib AS img_b,
               CAST(floor(d2 * 1e12 + 0.5) AS BIGINT) AS d2_e12
        FROM r WHERE rn = 1
    """


def q_quarter_close_spike(sf_dir: str):
    """Quarter-close pull-forward audit: per calendar quarter, the
    share of orders landing in the LAST three days — the revenue-
    recognition spike every sales org denies. Quarter boundaries via
    exact month arithmetic (datetime64[M] in the engine, date_trunc
    + INTERVAL in SQL); quarter-cardinality partials with ppm
    shares."""
    orders = _read(sf_dir, "orders", ["o_orderdate"])

    def part(t: pa.Table) -> pa.Table:
        d = t["o_orderdate"].to_numpy().astype("datetime64[us]")
        day = d.astype("datetime64[D]")
        month = d.astype("datetime64[M]")
        y = month.astype(np.int64) // 12 + 1970
        m = month.astype(np.int64) % 12
        q = m // 3
        nq_start = ((y - 1970) * 12 + (q + 1) * 3) \
            .astype("datetime64[M]").astype("datetime64[D]")
        gap = (nq_start - day).astype(np.int64)
        qid = y * 4 + q
        last3 = (gap <= 3).astype(np.int64)
        g = pa.table({"quarter": pa.array(qid),
                      "l3": pa.array(last3)}) \
            .group_by("quarter").aggregate(
                [([], "count_all"), ("l3", "sum")])
        return pa.table({"quarter": g["quarter"],
                         "n": g["count_all"].cast(pa.int64()),
                         "n_last3": g["l3_sum"]})

    rows = (orders.map_batches(part, batch_format="pyarrow")
            .groupby("quarter").sum(["n", "n_last3"])).take_all()
    return pd.DataFrame(sorted(
        ({"quarter": r["quarter"], "n": r["sum(n)"],
          "n_last3": r["sum(n_last3)"],
          "share_ppm": r["sum(n_last3)"] * 1_000_000 // r["sum(n)"]}
         for r in rows), key=lambda x: x["quarter"]))


QUERIES["quarter_close_spike"] = q_quarter_close_spike
ORACLE_SQL["quarter_close_spike"] = """
        WITH o AS (SELECT CAST(EXTRACT(year FROM o_orderdate) * 4
                               + (EXTRACT(month FROM o_orderdate) - 1)
                                 // 3 AS BIGINT) AS quarter,
                          CASE WHEN date_diff('day',
                                   CAST(o_orderdate AS DATE),
                                   CAST(date_trunc('quarter',
                                        o_orderdate)
                                        + INTERVAL 3 MONTH AS DATE))
                                   <= 3
                               THEN 1 ELSE 0 END AS l3
                   FROM orders)
        SELECT quarter, count(*) AS n,
               CAST(SUM(l3) AS BIGINT) AS n_last3,
               SUM(l3) * 1000000 // count(*) AS share_ppm
        FROM o GROUP BY 1
    """


def q_audio_loudest_window(sf_dir: str):
    """Loudest second per track: the maximum rolling 43-frame energy
    sum over the AudioFrameStage ledger (43·1024 samples ≈ 1 s at
    44.1 kHz) with its earliest start frame — highlight extraction.
    Stage reuse + one cumsum sliding window per track row-group.
    Python-int replay sidecar."""
    from geotile.ops.audio import AudioFrameStage, read_audio_table
    from geotile.ops.relational import _with_bucket

    WIN = 43
    ds = read_audio_table(_audio_dir_for(sf_dir))
    frames = ds.map_batches(AudioFrameStage, batch_format="pyarrow",
                            batch_size=64, concurrency=2)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"track_id": pd.Series(dtype=np.int64),
                                 "max_energy":
                                     pd.Series(dtype=np.int64),
                                 "start_frame":
                                     pd.Series(dtype=np.int64)})
        tid = df["track_id"].to_numpy(np.int64)
        fr = df["frame"].to_numpy(np.int64)
        en = df["energy"].to_numpy(np.int64)
        o = np.lexsort((fr, tid))
        tid, fr, en = tid[o], fr[o], en[o]
        out_t, out_m, out_s = [], [], []
        starts = np.flatnonzero(np.r_[True, tid[1:] != tid[:-1]])
        ends = np.r_[starts[1:], len(tid)]
        for s, e in zip(starts, ends):
            seg = en[s:e]
            w = min(WIN, len(seg))
            c = np.concatenate([[0], np.cumsum(seg)])
            sums = c[w:] - c[:-w]
            k = int(sums.argmax())  # first hit = earliest start
            out_t.append(tid[s])
            out_m.append(int(sums[k]))
            out_s.append(int(fr[s + k]))
        return pd.DataFrame({"track_id": out_t,
                             "max_energy": out_m,
                             "start_frame": out_s})

    out = (_with_bucket(frames, "track_id", 8)
           .groupby("bucket").map_groups(fold, batch_format="pandas")
           .map_batches(lambda t: t, batch_format="pyarrow"))
    return out


QUERIES["audio_loudest_window"] = q_audio_loudest_window


def _audio_loudest_sidecar(aud: str) -> str:
    """Python-int replay for audio_loudest_window. Content-keyed on
    synth.py."""
    import geotile.synth as _sy
    import pyarrow.parquet as pq
    from pathlib import Path

    p = _oracle_cache_dir() / (
        f"oracle_audioloudest_{Path(aud).name}_{_mods_digest(_sy)}.parquet"
    )
    if not p.exists():
        WIN = 43
        t = pq.read_table(aud, columns=["track_id"])
        ids = np.sort(t["track_id"].to_numpy(zero_copy_only=False))
        pcm = _sy.audio_samples(ids)
        frame = 1024
        nfr = pcm.shape[1] // frame
        rows = []
        for j, tid in enumerate(ids.tolist()):
            en = [sum(int(v) * int(v)
                      for v in pcm[j, f * frame:(f + 1) * frame]
                      .tolist()) for f in range(nfr)]
            w = min(WIN, nfr)
            best, bs = -1, -1
            for s in range(nfr - w + 1):
                tot = sum(en[s:s + w])
                if tot > best:
                    best, bs = tot, s
            rows.append({"track_id": tid, "max_energy": best,
                         "start_frame": bs})
        out = pa.Table.from_pylist(rows)
        _oracle_cache_dir().mkdir(parents=True, exist_ok=True)
        _atomic_write_table(out, p)
    return str(p)


def _audio_loudest_sql(aud: str) -> str:
    return (f"SELECT track_id, max_energy, start_frame "
            f"FROM read_parquet('{_audio_loudest_sidecar(aud)}')")


def q_gmd_nations(sf_dir: str):
    """Gini mean difference of order totals per nation: the exact
    pairwise |xi − xj| sum on the cents lattice via the sorted-rank
    identity Σ(2i−n+1)·x(i) — inequality-of-spend audit without the
    O(n²) join. Broadcast custkey→nation map; one nation co-partition
    holds each nation's cents whole, the weighted sum is int64 index
    algebra. ROW_NUMBER replay."""
    from geotile.ops.relational import _with_bucket

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey"]).take_all()
    ck = np.array([r["c_custkey"] for r in cust], np.int64)
    nk = np.array([r["c_nationkey"] for r in cust], np.int64)
    o = np.argsort(ck)
    cref = ray.put((ck[o], nk[o]))

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def annotate(t: pa.Table) -> pa.Table:
        ck_, nk_ = _broadcast(cref)
        c = t["o_custkey"].to_numpy(zero_copy_only=False)
        nat = nk_[np.searchsorted(ck_, c)]
        cents = np.floor(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
            + 0.5).astype(np.int64)
        return pa.table({"nationkey": pa.array(nat),
                         "cents": pa.array(cents)})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"nationkey": pd.Series(dtype=np.int64),
                              "n": pd.Series(dtype=np.int64),
                              "pairsum_cents":
                                  pd.Series(dtype=np.int64),
                              "md_cents": pd.Series(dtype=np.int64)})
        if len(df) == 0:
            return empty
        nat = df["nationkey"].to_numpy(np.int64)
        cents = df["cents"].to_numpy(np.int64)
        o = np.lexsort((cents, nat))
        nat, cents = nat[o], cents[o]
        starts = np.flatnonzero(np.r_[True, nat[1:] != nat[:-1]])
        seg_of = np.cumsum(np.r_[True, nat[1:] != nat[:-1]]) - 1
        n_seg = seg_of[-1] + 1
        k = np.bincount(seg_of, minlength=n_seg).astype(np.int64)
        i_local = np.arange(len(nat)) - starts[seg_of]
        w = 2 * i_local - k[seg_of] + 1
        acc = np.zeros(n_seg, np.int64)
        np.add.at(acc, seg_of, w * cents)
        md = np.where(k >= 2, acc * 2 // np.maximum(k * (k - 1), 1),
                      0)
        return pd.DataFrame({"nationkey": nat[starts], "n": k,
                             "pairsum_cents": acc, "md_cents": md})

    ds = orders.map_batches(annotate, batch_format="pyarrow")
    return (_with_bucket(ds, "nationkey", 8)
            .groupby("bucket").map_groups(fold, batch_format="pandas")
            .map_batches(lambda t: t, batch_format="pyarrow"))


QUERIES["gmd_nations"] = q_gmd_nations
ORACLE_SQL["gmd_nations"] = """
        WITH o AS (SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
                          CAST(floor(o_totalprice * 100.0 + 0.5)
                               AS BIGINT) AS cents
                   FROM orders JOIN customer ON c_custkey = o_custkey),
        r AS (SELECT nationkey, cents,
                     ROW_NUMBER() OVER (PARTITION BY nationkey
                                        ORDER BY cents) AS rn,
                     COUNT(*) OVER (PARTITION BY nationkey) AS n
              FROM o)
        SELECT nationkey, CAST(MAX(n) AS BIGINT) AS n,
               CAST(SUM((2 * rn - n - 1) * cents) AS BIGINT)
                 AS pairsum_cents,
               CASE WHEN MAX(n) >= 2
                    THEN CAST(SUM((2 * rn - n - 1) * cents) * 2
                              // (MAX(n) * (MAX(n) - 1)) AS BIGINT)
                    ELSE 0 END AS md_cents
        FROM r GROUP BY nationkey
    """


def q_interval_merge_users(sf_dir: str):
    """Gaps-and-islands interval merge: every event opens a 300-second
    presence interval; merge overlaps per user and report interval
    count + exact covered microseconds — the classic uptime/coverage
    operator. Equal-width intervals make merged ends monotone within
    the per-user ts sort, so island breaks are one diff and coverage
    is first/last index algebra per island. LAG + island-sum replay."""
    from geotile.ops.relational import _with_bucket

    W = 300_000_000
    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"user_id": pd.Series(dtype=np.int64),
                              "n_intervals":
                                  pd.Series(dtype=np.int64),
                              "covered_us":
                                  pd.Series(dtype=np.int64)})
        if len(df) == 0:
            return empty
        u = df["user_id"].to_numpy(np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        o = np.lexsort((ts, u))
        u, ts = u[o], ts[o]
        new_user = np.r_[True, u[1:] != u[:-1]]
        brk = new_user | np.r_[False, ts[1:] - ts[:-1] > W]
        isl_starts = np.flatnonzero(brk)
        isl_ends = np.r_[isl_starts[1:], len(u)]
        cover = ts[isl_ends - 1] - ts[isl_starts] + W
        isl_user = u[isl_starts]
        ustarts = np.flatnonzero(np.r_[True,
                                       isl_user[1:] != isl_user[:-1]])
        uends = np.r_[ustarts[1:], len(isl_user)]
        seg_of = np.cumsum(np.r_[True,
                                 isl_user[1:] != isl_user[:-1]]) - 1
        n_u = seg_of[-1] + 1
        cov = np.zeros(n_u, np.int64)
        np.add.at(cov, seg_of, cover)
        return pd.DataFrame({"user_id": isl_user[ustarts],
                             "n_intervals": (uends - ustarts)
                                 .astype(np.int64),
                             "covered_us": cov})

    return (_with_bucket(ev, "user_id", 32)
            .groupby("bucket").map_groups(fold, batch_format="pandas")
            .map_batches(lambda t: t, batch_format="pyarrow"))


QUERIES["interval_merge_users"] = q_interval_merge_users
ORACLE_SQL["interval_merge_users"] = """
        WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events),
        s AS (SELECT user_id, t,
                     CASE WHEN t - LAG(t) OVER (PARTITION BY user_id
                                                ORDER BY t)
                              > 300000000
                          OR LAG(t) OVER (PARTITION BY user_id
                                          ORDER BY t) IS NULL
                          THEN 1 ELSE 0 END AS brk
              FROM e),
        g AS (SELECT user_id, t,
                     SUM(brk) OVER (PARTITION BY user_id ORDER BY t
                                    ROWS UNBOUNDED PRECEDING) AS isl
              FROM s),
        i AS (SELECT user_id, isl, MIN(t) AS a, MAX(t) AS b
              FROM g GROUP BY 1, 2)
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_intervals,
               CAST(SUM(b - a + 300000000) AS BIGINT) AS covered_us
        FROM i GROUP BY 1
    """


def q_otsu_threshold_images(sf_dir: str):
    """Per-image Otsu binarization threshold for the first 1024
    images, EXACT: maximize the between-class score (s·N − S·c)² /
    (c·(N−c)) over gray levels with python-int cross-multiplication
    (the products exceed int64), earliest level on ties — the
    auto-threshold front end of any segmentation stage. Histograms,
    cumulative counts and the int64 numerators are fully vectorized
    per (w, h) group; only the 255-step argmax runs per image.
    Fraction-replay sidecar."""
    from geotile.ops.tiles import ImageDecodeStage, read_image_table

    ds = read_image_table(_image_dir_for(sf_dir)).limit(1024)

    class OtsuStage:
        def __init__(self):
            self.decoders = ImageDecodeStage(verify=False).decoders

        def __call__(self, batch: pa.Table) -> pa.Table:
            fmts = batch["fmt"].to_pylist()
            ws = batch["w"].to_pylist()
            hs = batch["h"].to_pylist()
            payloads = batch["bytes"].to_pylist()
            ids = batch["image_id"].to_numpy(zero_copy_only=False)
            groups: dict[tuple[int, int], list[int]] = {}
            for i, (wi, hi) in enumerate(zip(ws, hs)):
                groups.setdefault((wi, hi), []).append(i)
            out_id, out_t, out_fg = [], [], []
            for (wi, hi), slots in groups.items():
                px = np.stack([self.decoders[fmts[i]](payloads[i],
                                                      wi, hi)
                               for i in slots])
                gray = px.astype(np.int64).sum(axis=3) // 3
                n = len(slots)
                npx = wi * hi
                code = (np.arange(n)[:, None, None] * 256 + gray)
                hist = np.bincount(code.ravel(),
                                   minlength=n * 256) \
                    .reshape(n, 256).astype(np.int64)
                c = np.cumsum(hist, axis=1)
                s = np.cumsum(hist * np.arange(256), axis=1)
                S = s[:, 255]
                num = (s * npx - S[:, None] * c) ** 2
                den = c * (npx - c)
                for j in range(n):
                    bt, bnum, bden = -1, 0, 1
                    cj, nj, dj = c[j], num[j], den[j]
                    for t in range(255):
                        if cj[t] == 0 or cj[t] == npx:
                            continue
                        # exact: num/den > bnum/bden (python ints)
                        if int(nj[t]) * bden > bnum * int(dj[t]):
                            bt, bnum, bden = t, int(nj[t]), int(dj[t])
                    out_id.append(ids[slots[j]])
                    out_t.append(bt)
                    out_fg.append(int(npx - cj[bt]) if bt >= 0 else 0)
            return pa.table({
                "image_id": pa.array(out_id, pa.string()),
                "threshold": pa.array(out_t, pa.int64()),
                "n_fg": pa.array(out_fg, pa.int64())})

    return ds.map_batches(OtsuStage, batch_format="pyarrow",
                          batch_size=256, concurrency=2)


QUERIES["otsu_threshold_images"] = q_otsu_threshold_images


def _otsu_sidecar(img: str, n: int = 1024) -> str:
    """Fraction replay for otsu_threshold_images. Content-keyed on
    synth.py."""
    from fractions import Fraction

    import geotile.synth as _sy
    import pyarrow.parquet as pq
    from pathlib import Path

    p = _oracle_cache_dir() / (
        f"oracle_otsu_{Path(img).name}_{n}_{_mods_digest(_sy)}.parquet"
    )
    if not p.exists():
        t = pq.read_table(img, columns=["image_id", "w", "h"])
        order = pc.sort_indices(t["image_id"])[:n]
        ids = t["image_id"].take(order)
        ws = t["w"].take(order).to_numpy(zero_copy_only=False)
        hs = t["h"].take(order).to_numpy(zero_copy_only=False)
        idx = _sy.image_index(ids).astype(np.uint64)
        thr = np.zeros(len(ws), np.int64)
        nfg = np.zeros(len(ws), np.int64)
        for wi, hi in set(zip(ws.tolist(), hs.tolist())):
            m = np.nonzero((ws == wi) & (hs == hi))[0]
            px = _sy.pixel_pattern(idx[m], wi, hi)
            npx = wi * hi
            for j, slot in enumerate(m):
                hist = [0] * 256
                for y in range(hi):
                    for x in range(wi):
                        g = (int(px[j, y, x, 0])
                             + int(px[j, y, x, 1])
                             + int(px[j, y, x, 2])) // 3
                        hist[g] += 1
                S = sum(g * hist[g] for g in range(256))
                best = Fraction(-1)
                bt = -1
                cc = ss = 0
                bfg = 0
                for t2 in range(255):
                    cc += hist[t2]
                    ss += t2 * hist[t2]
                    if cc == 0 or cc == npx:
                        continue
                    f = Fraction((ss * npx - S * cc) ** 2,
                                 cc * (npx - cc))
                    if f > best:
                        best, bt, bfg = f, t2, npx - cc
                thr[slot] = bt
                nfg[slot] = bfg if bt >= 0 else 0
        out = pa.table({"image_id": ids,
                        "threshold": pa.array(thr),
                        "n_fg": pa.array(nfg)})
        _oracle_cache_dir().mkdir(parents=True, exist_ok=True)
        _atomic_write_table(out, p)
    return str(p)


def _otsu_sql(img: str) -> str:
    return (f"SELECT image_id, threshold, n_fg "
            f"FROM read_parquet('{_otsu_sidecar(img)}')")


def q_kcore_dups(sf_dir: str):
    """Core decomposition of the near-dup graph: every node's core
    number (the largest k for which it survives k-core peeling) —
    the standard dense-cluster strength measure that separates
    borderline dup chains (core 1) from tight clique clusters. Pair
    generation is the distributed LSH+verify stage; the edge set is
    dedup-output scale, so peeling runs once over broadcastable CSR
    arrays with vectorized batch removal (bincount degree decrements
    per round). Oracle: independent pure-python peeling over the SQL
    cosine-join pair list (two algorithms, one answer)."""
    from geotile.ops.dedup import embedding_dup_pairs

    pairs = embedding_dup_pairs(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
        tau=0.35).take_all()
    empty = pd.DataFrame({"node": pd.Series(dtype=np.int64),
                          "core": pd.Series(dtype=np.int64)})
    if not pairs:
        return empty
    a = np.array([r["a"] for r in pairs], np.int64)
    b = np.array([r["b"] for r in pairs], np.int64)
    u = np.concatenate([a, b])
    v = np.concatenate([b, a])
    o = np.lexsort((v, u))
    u, v = u[o], v[o]
    nodes, starts = np.unique(u, return_index=True)
    ends = np.r_[starts[1:], len(u)]
    # neighbor ids → dense indices for bincount decrements
    vi = np.searchsorted(nodes, v)
    n = len(nodes)
    deg = (ends - starts).astype(np.int64)
    core = np.zeros(n, np.int64)
    alive = np.ones(n, bool)
    k = 0
    while alive.any():
        k += 1
        while True:
            rem = np.flatnonzero(alive & (deg < k))
            if len(rem) == 0:
                break
            core[rem] = k - 1
            alive[rem] = False
            nb = np.concatenate([vi[starts[r]:ends[r]] for r in rem])
            nb = nb[alive[nb]]
            deg -= np.bincount(nb, minlength=n)
    return pd.DataFrame({"node": nodes, "core": core})


QUERIES["kcore_dups"] = q_kcore_dups


def _kcore_sidecar(sf_dir: str) -> str:
    """Pure-python peeling replay over the SQL cosine-join pairs.
    Content-keyed on the pair SQL text."""
    from hashlib import blake2b
    from pathlib import Path

    import duckdb

    key = blake2b((EMBEDDING_DUPS_SQL + sf_dir + "kcore-v1")
                  .encode(), digest_size=8).hexdigest()
    p = _oracle_cache_dir() / (
        f"oracle_kcore_{Path(sf_dir).name}_{key}.parquet")
    if not p.exists():
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{sf_dir}/embeddings.parquet')")
        prs = con.execute(
            f"SELECT a, b FROM ({EMBEDDING_DUPS_SQL})").fetchall()
        adj: dict[int, set[int]] = {}
        for x, y in prs:
            adj.setdefault(int(x), set()).add(int(y))
            adj.setdefault(int(y), set()).add(int(x))
        core: dict[int, int] = {}
        k = 0
        while adj:
            k += 1
            changed = True
            while changed:
                changed = False
                for nd in [nd for nd, nb in adj.items()
                           if len(nb) < k]:
                    core[nd] = k - 1
                    for w in adj.pop(nd):
                        if w in adj:
                            adj[w].discard(nd)
                    changed = True
        out = pa.table({
            "node": pa.array(sorted(core), pa.int64()),
            "core": pa.array([core[nd] for nd in sorted(core)],
                             pa.int64())})
        _oracle_cache_dir().mkdir(parents=True, exist_ok=True)
        _atomic_write_table(out, p)
    return str(p)


def _kcore_sql(sf_dir: str) -> str:
    return (f"SELECT node, core "
            f"FROM read_parquet('{_kcore_sidecar(sf_dir)}')")


def q_anagram_groups_docs(sf_dir: str):
    """Anagram classes over the corpus vocabulary: group distinct
    tokens by their sorted-character signature and keep classes with
    ≥2 distinct members (signature, n_tokens, n_occ) — the cheap
    token-normalization/typo-class audit. Per-batch value_counts
    partials → one vocabulary-scale token shuffle → signatures
    computed once per DISTINCT token (never per occurrence) →
    signature groupby; n_tokens > 1 flags an anagram class.
    Tokenization = split on single spaces, empties dropped
    (string_split parity). list_sort char replay."""
    ds = _read(sf_dir, "documents", ["text"])

    def partial(t: pa.Table) -> pa.Table:
        flat = pc.list_flatten(pc.split_pattern(t["text"], " "))
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = flat.value_counts()
        return pa.table({"token": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    vocab = (ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True)
             .groupby("token").sum("n"))
    vocab = _rename(vocab, ["token", "n"])

    def sig_part(t: pa.Table) -> pa.Table:
        toks = t["token"].to_pylist()
        sigs = ["".join(sorted(tk)) for tk in toks]
        return pa.table({"signature": pa.array(sigs, pa.string()),
                         "n_tokens": pa.array([1] * len(toks),
                                              pa.int64()),
                         "n_occ": t["n"]})

    agg = (vocab.map_batches(sig_part, batch_format="pyarrow")
           .groupby("signature").sum(["n_tokens", "n_occ"]))
    agg = _rename(agg, ["signature", "n_tokens", "n_occ"])
    return agg


QUERIES["anagram_groups_docs"] = q_anagram_groups_docs
ORACLE_SQL["anagram_groups_docs"] = """
        WITH tok AS (SELECT unnest(string_split(text, ' ')) AS t
                     FROM documents),
        u AS (SELECT t, count(*) AS occ FROM tok
              WHERE t <> '' GROUP BY 1),
        sig AS (SELECT array_to_string(list_sort(string_split(t, '')),
                                       '') AS signature, occ
                FROM u)
        SELECT signature, CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(SUM(occ) AS BIGINT) AS n_occ
        FROM sig GROUP BY 1
    """


def q_mann_kendall_nations(sf_dir: str):
    """Mann-Kendall trend statistic per nation: S = Σ_{i<j}
    sign(cents_j − cents_i) over the day-ordered daily revenue
    series — the distribution-free monotone-trend test with exact
    integer S (no variance, no floats). Day×nation partial sums +
    one small groupby; the day series is calendar-bounded, so the
    per-nation pair scan is chunked index algebra inside a 25-group
    co-partition. Self-join sign replay."""
    from geotile.ops.relational import _with_bucket

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey"]).take_all()
    ck = np.array([r["c_custkey"] for r in cust], np.int64)
    nk = np.array([r["c_nationkey"] for r in cust], np.int64)
    o = np.argsort(ck)
    cref = ray.put((ck[o], nk[o]))

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate",
                                      "o_totalprice"])
    DAY = 86_400_000_000

    def part(t: pa.Table) -> pa.Table:
        ck_, nk_ = _broadcast(cref)
        c = t["o_custkey"].to_numpy(zero_copy_only=False)
        nat = nk_[np.searchsorted(ck_, c)]
        day = (t["o_orderdate"].cast(pa.int64()).to_numpy()
               // DAY)
        cents = np.floor(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
            + 0.5).astype(np.int64)
        g = pa.table({"nationkey": pa.array(nat),
                      "day": pa.array(day),
                      "cents": pa.array(cents)}) \
            .group_by(["nationkey", "day"]).aggregate([("cents",
                                                        "sum")])
        return pa.table({"nationkey": g["nationkey"],
                         "day": g["day"],
                         "cents": g["cents_sum"]})

    daily = (orders.map_batches(part, batch_format="pyarrow")
             .groupby(["nationkey", "day"]).sum("cents"))
    daily = _rename(daily, ["nationkey", "day", "cents"])

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"nationkey": pd.Series(dtype=np.int64),
                              "n_days": pd.Series(dtype=np.int64),
                              "s_stat": pd.Series(dtype=np.int64)})
        if len(df) == 0:
            return empty
        nat = df["nationkey"].to_numpy(np.int64)
        day = df["day"].to_numpy(np.int64)
        cents = df["cents"].to_numpy(np.int64)
        o = np.lexsort((day, nat))
        nat, cents = nat[o], cents[o]
        starts = np.flatnonzero(np.r_[True, nat[1:] != nat[:-1]])
        ends = np.r_[starts[1:], len(nat)]
        out_n, out_d, out_s = [], [], []
        for s, e in zip(starts, ends):
            c = cents[s:e]
            d = len(c)
            total = 0
            for j0 in range(1, d, 512):
                js = np.arange(j0, min(j0 + 512, d))
                sub = np.sign(c[js][:, None]
                              - c[None, :js[-1]]).astype(np.int64)
                mask = np.arange(js[-1])[None, :] < js[:, None]
                total += int((sub * mask).sum())
            out_n.append(nat[s])
            out_d.append(d)
            out_s.append(total)
        return pd.DataFrame({"nationkey": out_n,
                             "n_days": np.array(out_d, np.int64),
                             "s_stat": np.array(out_s, np.int64)})

    return (_with_bucket(daily, "nationkey", 8)
            .groupby("bucket").map_groups(fold, batch_format="pandas")
            .map_batches(lambda t: t, batch_format="pyarrow"))


QUERIES["mann_kendall_nations"] = q_mann_kendall_nations
ORACLE_SQL["mann_kendall_nations"] = """
        WITH d AS (SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
                          epoch_us(o_orderdate) // 86400000000 AS day,
                          CAST(SUM(CAST(floor(o_totalprice * 100.0
                                              + 0.5) AS BIGINT))
                               AS BIGINT) AS cents
                   FROM orders JOIN customer ON c_custkey = o_custkey
                   GROUP BY 1, 2),
        s AS (SELECT a.nationkey,
                     SUM(CASE WHEN b.cents > a.cents THEN 1
                              WHEN b.cents < a.cents THEN -1
                              ELSE 0 END) AS s_stat
              FROM d a JOIN d b ON b.nationkey = a.nationkey
                               AND b.day > a.day
              GROUP BY 1),
        n AS (SELECT nationkey, count(*) AS n_days FROM d GROUP BY 1)
        SELECT n.nationkey, CAST(n.n_days AS BIGINT) AS n_days,
               CAST(COALESCE(s.s_stat, 0) AS BIGINT) AS s_stat
        FROM n LEFT JOIN s USING (nationkey)
    """


def q_local_supplier_volume_q5(sf_dir: str):
    """TPC-H Q5 proper — local supplier volume: revenue from 1996
    lineitems where the SUPPLIER and the ordering CUSTOMER sit in the
    same nation. region_revenue covers the Q5 join shape; this adds
    Q5's defining s_nationkey = c_nationkey equality, which needs both
    nation keys ON the fact row before the filter. supplier nation
    broadcasts into the lineitem map; customer nation rides
    orders→lineitem through the size-guarded lookup_join (broadcast at
    dim scale, bucketed co-partition past 2^20 rows). Revenue lands on
    the e4 lattice per element (region_revenue convention)."""
    from geotile.ops.relational import lookup_join

    sup = _read(sf_dir, "supplier",
                ["s_suppkey", "s_nationkey"]).take_all()
    sk = np.array([r["s_suppkey"] for r in sup], np.int64)
    sn = np.array([r["s_nationkey"] for r in sup], np.int64)
    o = np.argsort(sk)
    sref = ray.put((sk[o], sn[o]))
    nname = {r["n_nationkey"]: r["n_name"]
             for r in _read(sf_dir, "nation").take_all()}

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]) \
        .map_batches(lambda t: pa.table(
            {"c_custkey": t["c_custkey"].cast(pa.int64()),
             "cnat": t["c_nationkey"].cast(pa.int64())}),
            batch_format="pyarrow")

    LO = np.datetime64("1996-01-01").astype("datetime64[us]") \
        .astype(np.int64)
    HI = np.datetime64("1997-01-01").astype("datetime64[us]") \
        .astype(np.int64)

    def ord_proj(t: pa.Table) -> pa.Table:
        us = t["o_orderdate"].cast(pa.int64())
        keep = pc.and_(pc.greater_equal(us, pa.scalar(LO)),
                       pc.less(us, pa.scalar(HI)))
        f = t.filter(keep)
        return pa.table({"o_orderkey": f["o_orderkey"].cast(pa.int64()),
                         "o_custkey": f["o_custkey"].cast(pa.int64())})

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(ord_proj, batch_format="pyarrow",
                     zero_copy_batch=True)
    oc = _semi_lookup_join(orders, "o_custkey", cust, "c_custkey",
                           "cnat", out_key="o_orderkey")

    def li_proj(t: pa.Table) -> pa.Table:
        sk_, sn_ = _broadcast(sref)
        s = t["l_suppkey"].to_numpy(zero_copy_only=False)
        snat = sn_[np.searchsorted(sk_, s)]
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"l_orderkey": t["l_orderkey"].cast(pa.int64()),
                         "snat": pa.array(snat),
                         "q": _e(rev, 10000)})

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice",
                "l_discount"]) \
        .map_batches(li_proj, batch_format="pyarrow",
                     zero_copy_batch=True)
    j = lookup_join(li, "l_orderkey", oc, "o_orderkey", "cnat")

    def partial(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(t["snat"], t["cnat"]))
        g = pa.table({"nat": f["snat"], "q": f["q"]}) \
            .group_by("nat").aggregate([("q", "sum"),
                                        ([], "count_all")])
        return pa.table({"nat": g["nat"],
                         "rev_e4": g["q_sum"].cast(pa.int64()),
                         "n": g["count_all"].cast(pa.int64())})

    rows = (j.map_batches(partial, batch_format="pyarrow")
            .groupby("nat").sum(["rev_e4", "n"])).take_all()
    return pd.DataFrame(sorted(
        ({"n_name": nname[int(r["nat"])],
          "rev_e4": r["sum(rev_e4)"], "n": r["sum(n)"]}
         for r in rows), key=lambda x: x["n_name"]))


QUERIES["local_supplier_volume_q5"] = q_local_supplier_volume_q5
ORACLE_SQL["local_supplier_volume_q5"] = """
        SELECT n.n_name,
               CAST(SUM(CAST(round(l.l_extendedprice
                                   * (1 - l.l_discount) * 10000)
                             AS BIGINT)) AS BIGINT) AS rev_e4,
               COUNT(*) AS n
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE s.s_nationkey = c.c_nationkey
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY 1
    """


def q_audio_haar_detail_tracks(sf_dir: str):
    """Haar wavelet detail energies per audio track, levels 1 and 2 —
    exact integers: d1 = Σ(s[2i] − s[2i+1])², d2 = Σ((s[4i]+s[4i+1])
    − (s[4i+2]+s[4i+3]))² — the transient-vs-sustained fingerprint a
    music/speech discriminator thresholds on. One reshape-diff-square
    per stacked batch tensor; no per-sample Python. Python-int replay
    sidecar."""
    from geotile.ops.audio import AudioFrameStage, read_audio_table

    ds = read_audio_table(_audio_dir_for(sf_dir))

    class HaarStage:
        def __init__(self):
            self.dec = AudioFrameStage().decoders["pcm16"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["track_id"].to_numpy(zero_copy_only=False)
            codecs = batch["codec"].to_pylist()
            payloads = batch["bytes"].to_pylist()
            if set(codecs) - {"pcm16"}:
                raise NotImplementedError("only pcm16 in container")
            rows = [self.dec(p) for p in payloads]
            groups: dict[int, list[int]] = {}
            for i, r in enumerate(rows):
                groups.setdefault(len(r), []).append(i)
            out_id, out_1, out_2 = [], [], []
            for length, slots in groups.items():
                pcm = np.stack([rows[i] for i in slots]) \
                    .astype(np.int64)
                n2 = (length // 2) * 2
                p2 = pcm[:, :n2].reshape(len(slots), -1, 2)
                d1 = ((p2[:, :, 0] - p2[:, :, 1]) ** 2).sum(axis=1)
                n4 = (length // 4) * 4
                p4 = pcm[:, :n4].reshape(len(slots), -1, 4)
                d2 = (((p4[:, :, 0] + p4[:, :, 1])
                       - (p4[:, :, 2] + p4[:, :, 3])) ** 2) \
                    .sum(axis=1)
                out_id.append(ids[slots])
                out_1.append(d1)
                out_2.append(d2)
            return pa.table({
                "track_id": pa.array(np.concatenate(out_id)),
                "d1_energy": pa.array(np.concatenate(out_1)),
                "d2_energy": pa.array(np.concatenate(out_2))})

    return ds.map_batches(HaarStage, batch_format="pyarrow",
                          batch_size=64, concurrency=2)


QUERIES["audio_haar_detail_tracks"] = q_audio_haar_detail_tracks


def _audio_haar_sidecar(aud: str) -> str:
    """Python-int replay for audio_haar_detail_tracks. Content-keyed
    on synth.py."""
    import geotile.synth as _sy
    import pyarrow.parquet as pq
    from pathlib import Path

    p = _oracle_cache_dir() / (
        f"oracle_audiohaar_{Path(aud).name}_{_mods_digest(_sy)}.parquet"
    )
    if not p.exists():
        t = pq.read_table(aud, columns=["track_id"])
        ids = np.sort(t["track_id"].to_numpy(zero_copy_only=False))
        pcm = _sy.audio_samples(ids)
        rows = []
        for j, tid in enumerate(ids.tolist()):
            s = [int(v) for v in pcm[j].tolist()]
            d1 = sum((s[2 * i] - s[2 * i + 1]) ** 2
                     for i in range(len(s) // 2))
            d2 = sum(((s[4 * i] + s[4 * i + 1])
                      - (s[4 * i + 2] + s[4 * i + 3])) ** 2
                     for i in range(len(s) // 4))
            rows.append({"track_id": tid, "d1_energy": d1,
                         "d2_energy": d2})
        out = pa.Table.from_pylist(rows)
        _oracle_cache_dir().mkdir(parents=True, exist_ok=True)
        _atomic_write_table(out, p)
    return str(p)


def _audio_haar_sql(aud: str) -> str:
    return (f"SELECT track_id, d1_energy, d2_energy "
            f"FROM read_parquet('{_audio_haar_sidecar(aud)}')")


def q_video_quadrant_motion(sf_dir: str):
    """Spatially-localized motion: per clip, the exact integer
    Σ|frame diff| inside each of the four frame quadrants (TL TR BL
    BR) — where in the frame the action happens, the feature a
    cropping/attention stage keys on. One stacked 5-D |diff| per
    (frames, w, h) group, then four quadrant slices of the same diff
    tensor. Python-int replay sidecar."""
    from geotile.ops.video import read_video_table

    ds = read_video_table(_video_dir_for(sf_dir))

    class QuadStage:
        def __call__(self, batch: pa.Table) -> pa.Table:
            codecs = set(batch["codec"].to_pylist())
            if codecs - {"rawseq"}:
                raise NotImplementedError("only rawseq in container")
            ids = batch["clip_id"].to_numpy(zero_copy_only=False)
            nf = batch["n_frames"].to_numpy(zero_copy_only=False)
            ws = batch["w"].to_numpy(zero_copy_only=False)
            hs = batch["h"].to_numpy(zero_copy_only=False)
            payloads = batch["bytes"].to_pylist()
            groups: dict[tuple[int, int, int], list[int]] = {}
            for i, key in enumerate(zip(nf, ws, hs)):
                groups.setdefault(tuple(int(x) for x in key),
                                  []).append(i)
            cols = {"clip_id": [], "tl": [], "tr": [],
                    "bl": [], "br": []}
            for (f, w, h), slots in groups.items():
                clips = np.stack([
                    np.frombuffer(payloads[i], dtype=np.uint8)
                    .reshape(f, h, w, 3) for i in slots]) \
                    .astype(np.int64)
                d = np.abs(clips[:, 1:] - clips[:, :-1])
                hh, wh = h // 2, w // 2
                quads = {"tl": d[:, :, :hh, :wh],
                         "tr": d[:, :, :hh, wh:],
                         "bl": d[:, :, hh:, :wh],
                         "br": d[:, :, hh:, wh:]}
                cols["clip_id"].append(ids[slots])
                for k, v in quads.items():
                    cols[k].append(v.sum(axis=(1, 2, 3, 4)))
            return pa.table({k: pa.array(np.concatenate(v))
                             for k, v in cols.items()})

    return ds.map_batches(QuadStage, batch_format="pyarrow",
                          batch_size=32, concurrency=2)


QUERIES["video_quadrant_motion"] = q_video_quadrant_motion


def _video_quadrant_sidecar(vid: str) -> str:
    """Python-int replay for video_quadrant_motion. Content-keyed on
    synth.py."""
    import geotile.synth as _sy
    import pyarrow.parquet as pq
    from pathlib import Path

    p = _oracle_cache_dir() / (
        f"oracle_videoquad_{Path(vid).name}_{_mods_digest(_sy)}.parquet"
    )
    if not p.exists():
        t = pq.read_table(vid, columns=["clip_id", "n_frames"])
        ids = np.sort(t["clip_id"].to_numpy(zero_copy_only=False))
        nf = int(t["n_frames"][0].as_py())
        W, H = _sy.VIDEO_W, _sy.VIDEO_H
        hh, wh = H // 2, W // 2
        rows = []
        for cid in ids.tolist():
            frames = [_sy.pixel_pattern(
                np.array([cid * 64 + f], np.uint64), W, H)[0]
                for f in range(nf)]
            acc = {"tl": 0, "tr": 0, "bl": 0, "br": 0}
            for f in range(nf - 1):
                a, b = frames[f], frames[f + 1]
                for y in range(H):
                    for x in range(W):
                        q = ("t" if y < hh else "b") \
                            + ("l" if x < wh else "r")
                        for ch in range(3):
                            acc[q] += abs(int(b[y, x, ch])
                                          - int(a[y, x, ch]))
            rows.append({"clip_id": cid, **acc})
        out = pa.Table.from_pylist(rows)
        _oracle_cache_dir().mkdir(parents=True, exist_ok=True)
        _atomic_write_table(out, p)
    return str(p)


def _video_quadrant_sql(vid: str) -> str:
    return (f"SELECT clip_id, tl, tr, bl, br "
            f"FROM read_parquet('{_video_quadrant_sidecar(vid)}')")


def q_profit_by_nation_year(sf_dir: str):
    """TPC-H Q9-shaped profit rollup (no partsupp table in this
    schema, so profit = revenue): for lineitems of RED parts
    (p_name LIKE 'red %'), revenue by SUPPLIER nation × order year.
    Part filter ships as a broadcast sorted keyset (dim scale);
    supplier nation folds into the same lineitem map; the order year
    rides the size-guarded lookup_join. e4 lattice per element."""
    from geotile.ops.relational import lookup_join

    parts = _read(sf_dir, "part", ["p_partkey", "p_name"]).take_all()
    red = np.array(sorted(r["p_partkey"] for r in parts
                          if r["p_name"].startswith("red ")), np.int64)
    sup = _read(sf_dir, "supplier",
                ["s_suppkey", "s_nationkey"]).take_all()
    sk = np.array([r["s_suppkey"] for r in sup], np.int64)
    sn = np.array([r["s_nationkey"] for r in sup], np.int64)
    o = np.argsort(sk)
    bref = ray.put((red, sk[o], sn[o]))
    nname = {r["n_nationkey"]: r["n_name"]
             for r in _read(sf_dir, "nation").take_all()}

    def ord_proj(t: pa.Table) -> pa.Table:
        y = pc.year(t["o_orderdate"]).cast(pa.int64())
        return pa.table({"o_orderkey": t["o_orderkey"].cast(pa.int64()),
                         "year": y})

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"]) \
        .map_batches(ord_proj, batch_format="pyarrow",
                     zero_copy_batch=True)

    def li_proj(t: pa.Table) -> pa.Table:
        red_, sk_, sn_ = _broadcast(bref)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(red_, pk)
        safe = np.minimum(pos, max(len(red_) - 1, 0))
        keep = (pos < len(red_)) & (red_[safe] == pk) \
            if len(red_) else np.zeros(len(pk), bool)
        f = t.filter(pa.array(keep))
        s = f["l_suppkey"].to_numpy(zero_copy_only=False)
        snat = sn_[np.searchsorted(sk_, s)]
        rev = pc.multiply(f["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), f["l_discount"]))
        return pa.table({"l_orderkey": f["l_orderkey"].cast(pa.int64()),
                         "snat": pa.array(snat),
                         "q": _e(rev, 10000)})

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_partkey", "l_suppkey",
                "l_extendedprice", "l_discount"]) \
        .map_batches(li_proj, batch_format="pyarrow",
                     zero_copy_batch=True)
    j = lookup_join(li, "l_orderkey", orders, "o_orderkey", "year")

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({"snat": t["snat"], "year": t["year"],
                      "q": t["q"]}) \
            .group_by(["snat", "year"]).aggregate([("q", "sum"),
                                                   ([], "count_all")])
        return pa.table({"snat": g["snat"], "year": g["year"],
                         "rev_e4": g["q_sum"].cast(pa.int64()),
                         "n": g["count_all"].cast(pa.int64())})

    rows = (j.map_batches(partial, batch_format="pyarrow")
            .groupby(["snat", "year"]).sum(["rev_e4", "n"])).take_all()
    return pd.DataFrame(sorted(
        ({"n_name": nname[int(r["snat"])], "year": r["year"],
          "rev_e4": r["sum(rev_e4)"], "n": r["sum(n)"]}
         for r in rows), key=lambda x: (x["n_name"], x["year"])))


QUERIES["profit_by_nation_year"] = q_profit_by_nation_year
ORACLE_SQL["profit_by_nation_year"] = """
        SELECT n.n_name, CAST(EXTRACT(year FROM o.o_orderdate)
                              AS BIGINT) AS year,
               CAST(SUM(CAST(round(l.l_extendedprice
                                   * (1 - l.l_discount) * 10000)
                             AS BIGINT)) AS BIGINT) AS rev_e4,
               COUNT(*) AS n
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE p.p_name LIKE 'red %'
        GROUP BY 1, 2
    """


def q_tumbling_argmax_events(sf_dir: str):
    """Per 1-hour tumbling window, the ARGMAX event: (window, event_id
    of the max value, the value) with the smallest event_id breaking
    value ties — the representative-sample selection every
    dashboarding pipeline runs. Mergeable argmax: per-batch partial
    argmax per window (one lexsort + segment head), then the same fold
    as the final reduce — selection only, no float arithmetic, so
    doubles hash exactly. ROW_NUMBER replay."""
    ev = _read(sf_dir, "events", ["event_id", "ts", "value"])
    HOUR = 3_600_000_000

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"win": pa.array([], pa.int64()),
                             "event_id": pa.array([], pa.int64()),
                             "value": pa.array([], pa.float64())})
        w = (t["ts"].cast(pa.int64()).to_numpy() // HOUR
             if t.schema.field("ts").type != pa.int64()
             else t["ts"].to_numpy(zero_copy_only=False))
        e = t["event_id"].to_numpy(zero_copy_only=False)
        v = t["value"].to_numpy(zero_copy_only=False)
        o = np.lexsort((e, -v, w))
        w, e, v = w[o], e[o], v[o]
        heads = np.flatnonzero(np.r_[True, w[1:] != w[:-1]])
        return pa.table({"win": pa.array(w[heads]),
                         "event_id": pa.array(e[heads]),
                         "value": pa.array(v[heads])})

    part = ev.map_batches(fold, batch_format="pyarrow",
                          zero_copy_batch=True)
    return (part.groupby("win")
            .map_groups(lambda df: df.sort_values(
                ["value", "event_id"],
                ascending=[False, True]).head(1),
                batch_format="pandas")
            .map_batches(lambda t: t, batch_format="pyarrow"))


QUERIES["tumbling_argmax_events"] = q_tumbling_argmax_events
ORACLE_SQL["tumbling_argmax_events"] = """
        WITH e AS (SELECT epoch_us(ts) // 3600000000 AS win,
                          event_id, value,
                          ROW_NUMBER() OVER (
                              PARTITION BY epoch_us(ts) // 3600000000
                              ORDER BY value DESC, event_id) AS rn
                   FROM events)
        SELECT win, event_id, value FROM e WHERE rn = 1
    """


def q_probe_energy_labels(sf_dir: str):
    """Random-probe quadratic form per label: Σ_i (v·q_i)² where q_i
    is the embedding on the e3 integer lattice and v the
    deterministic ±1 probe (splitmix64 parity per dimension) — the
    one-probe trace estimator of the label Gram matrix energy
    (Hutchinson step), exact in int64. One matvec per batch; the
    shuffle carries 10 label partials. Literal ±1 list replay."""
    from geotile.synth import splitmix64

    emb = _read(sf_dir, "embeddings", ["label", "embedding"])

    def part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"label": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "probe_energy": pa.array([], pa.int64())})
        x = np.stack(t["embedding"].to_numpy(zero_copy_only=False))
        dim = x.shape[1]
        sgn = np.where(
            splitmix64(np.arange(dim, dtype=np.uint64))
            & np.uint64(1), 1, -1).astype(np.int64)
        q = np.floor(x.astype(np.float64) * 1000.0 + 0.5) \
            .astype(np.int64)
        d = q @ sgn
        lab = t["label"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        g = pa.table({"label": pa.array(lab),
                      "e": pa.array(d * d),
                      "one": pa.array(np.ones(len(lab), np.int64))}) \
            .group_by("label").aggregate([("e", "sum"),
                                          ("one", "sum")])
        return pa.table({"label": g["label"],
                         "n": g["one_sum"],
                         "probe_energy": g["e_sum"]})

    out = (emb.map_batches(part, batch_format="pyarrow")
           .groupby("label").sum(["n", "probe_energy"]))
    return _rename(out, ["label", "n", "probe_energy"])


QUERIES["probe_energy_labels"] = q_probe_energy_labels


def _probe_sign_literal(dim: int = 64) -> str:
    from geotile.synth import splitmix64

    sgn = np.where(splitmix64(np.arange(dim, dtype=np.uint64))
                   & np.uint64(1), 1.0, -1.0)
    return "[" + ", ".join(f"{v:.1f}" for v in sgn) + "]"


ORACLE_SQL["probe_energy_labels"] = f"""
        WITH q AS (SELECT CAST(label AS BIGINT) AS label,
                          CAST(list_dot_product(
                              list_transform(
                                  CAST(embedding AS DOUBLE[]),
                                  x -> floor(x * 1000.0 + 0.5)),
                              CAST({_probe_sign_literal()}
                                   AS DOUBLE[])) AS BIGINT) AS d
                   FROM embeddings)
        SELECT label, count(*) AS n,
               CAST(SUM(d * d) AS BIGINT) AS probe_energy
        FROM q GROUP BY 1
    """


_ZQ_RES = 14
_ZQ_BOXES = ((-122.5, -121.9, 37.2, 37.7),
             (-122.35, -122.15, 37.35, 37.55),
             (-122.28, -122.22, 37.44, 37.52))


def _zorder_ranges(ix0: int, ix1: int, iy0: int, iy1: int,
                   res: int) -> list[tuple[int, int]]:
    """Exact quadtree decomposition of the INCLUSIVE grid rectangle
    into maximal aligned quads = contiguous Morton ranges [lo, hi) in
    the res-tagged cell-id space."""
    from geotile.geom import cells

    out: list[tuple[int, int]] = []

    def rec(qx: int, qy: int, size: int) -> None:
        if qx > ix1 or qx + size - 1 < ix0 \
                or qy > iy1 or qy + size - 1 < iy0:
            return
        if qx >= ix0 and qx + size - 1 <= ix1 \
                and qy >= iy0 and qy + size - 1 <= iy1:
            lo = int(cells.from_ixy(np.array([qx]), np.array([qy]),
                                    res).view(np.int64)[0])
            out.append((lo, lo + size * size))
            return
        h = size // 2
        for dx in (0, h):
            for dy in (0, h):
                rec(qx + dx, qy + dy, h)

    rec(0, 0, 1 << res)
    out.sort()
    return out


def q_zorder_range_counts(sf_dir: str):
    """Z-order INDEX-RANGE scan: each viewport rectangle decomposes
    (driver-side, O(perimeter)) into maximal aligned quadtree Morton
    ranges; tiles match by pure cell-id interval membership — two
    searchsorteds per batch, never a lon/lat comparison. This is the
    scan shape a Morton-sorted 100-TB tile store serves from its
    block index. The oracle replays the RECTANGLE predicate on the
    quantized grid axes instead — the count matches iff the
    decomposition is exact."""
    from geotile.geom import cells
    from geotile.ops.tiles import read_image_table

    ranges = []
    for (wlo, whi, slo, nhi) in _ZQ_BOXES:
        ix, iy = cells._quantize(np.array([wlo, whi]),
                                 np.array([slo, nhi]), _ZQ_RES)
        ranges.append(_zorder_ranges(int(ix[0]), int(ix[1]),
                                     int(iy[0]), int(iy[1]), _ZQ_RES))
    los = [np.array([r[0] for r in rs], np.int64) for rs in ranges]
    his = [np.array([r[1] for r in rs], np.int64) for rs in ranges]
    rref = ray.put((los, his))

    ds = read_image_table(_image_dir_for(sf_dir),
                          columns=["lon", "lat"])

    def part(t: pa.Table) -> pa.Table:
        los_, his_ = _broadcast(rref)
        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        cell = cells.encode(lon, lat, _ZQ_RES).view(np.int64)
        qid, cnt = [], []
        for q, (lo, hi) in enumerate(zip(los_, his_)):
            pos = np.searchsorted(lo, cell, side="right") - 1
            ok = pos >= 0
            ok[ok] &= cell[ok] < hi[pos[ok]]
            qid.append(q)
            cnt.append(int(ok.sum()))
        return pa.table({"query_id": pa.array(qid, pa.int64()),
                         "n_tiles": pa.array(cnt, pa.int64())})

    out = (ds.map_batches(part, batch_format="pyarrow")
           .groupby("query_id").sum("n_tiles"))
    return _rename(out, ["query_id", "n_tiles"])


QUERIES["zorder_range_counts"] = q_zorder_range_counts


def _zorder_range_sql(img_dir: str) -> str:
    from geotile.geom import cells

    parts = []
    for q, (wlo, whi, slo, nhi) in enumerate(_ZQ_BOXES):
        ix, iy = cells._quantize(np.array([wlo, whi]),
                                 np.array([slo, nhi]), _ZQ_RES)
        parts.append(
            f"SELECT {q} AS query_id, count(*) AS n_tiles "
            f"FROM g WHERE ix BETWEEN {int(ix[0])} AND {int(ix[1])} "
            f"AND iy BETWEEN {int(iy[0])} AND {int(iy[1])}")
    union = " UNION ALL ".join(parts)
    return f"""
        WITH g AS (SELECT
            {_sql_quant('lon', '180.0', '360.0', _ZQ_RES)} AS ix,
            {_sql_quant('lat', '90.0', '180.0', _ZQ_RES)} AS iy
            FROM read_parquet('{img_dir}/part-*.parquet'))
        {union}
    """


def q_head_vocab_coverage_sources(sf_dir: str):
    """Head-vocabulary coverage per source: what fraction (ppm) of
    each source's token stream falls in the corpus-wide top-10
    vocabulary — the 'generic vs niche content' signal a corpus
    mixer weights sources by. Phase 1 = the distributed top-k
    pattern (per-batch value_counts partials → vocabulary shuffle →
    partial top-k); the 10-token head then broadcasts into a single
    per-source counting pass. Top-10 CTE replay."""
    ds = _read(sf_dir, "documents", ["source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        flat = pc.list_flatten(pc.split_pattern(t["text"], " "))
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = flat.value_counts()
        return pa.table({"token": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    vocab = (ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True)
             .groupby("token").sum("n")).take_all()
    toks = np.array([r["token"] for r in vocab])
    ns = np.array([r["sum(n)"] for r in vocab], np.int64)
    order = np.lexsort((toks, -ns))[:10]
    head = set(toks[order].tolist())
    href = ray.put(np.sort(np.array(sorted(head))))

    def cover(t: pa.Table) -> pa.Table:
        head_ = _broadcast(href)
        toks_l = pc.split_pattern(t["text"], " ")
        flat = pc.list_flatten(toks_l)
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        lens = pc.list_value_length(toks_l).to_numpy(
            zero_copy_only=False)
        src = t["source"].to_numpy(zero_copy_only=False)
        src_rep = np.repeat(src, lens)[
            keep.to_numpy(zero_copy_only=False)]
        fa = flat.to_numpy(zero_copy_only=False)
        pos = np.searchsorted(head_, fa)
        safe = np.minimum(pos, len(head_) - 1)
        in_head = (head_[safe] == fa).astype(np.int64)
        g = pa.table({"source": pa.array(src_rep),
                      "n_head": pa.array(in_head),
                      "n_total": pa.array(np.ones(len(fa),
                                                  np.int64))}) \
            .group_by("source").aggregate([("n_head", "sum"),
                                           ("n_total", "sum")])
        return pa.table({"source": g["source"],
                         "n_head": g["n_head_sum"],
                         "n_total": g["n_total_sum"]})

    agg = (ds.map_batches(cover, batch_format="pyarrow")
           .groupby("source").sum(["n_head", "n_total"]))
    agg = _rename(agg, ["source", "n_head", "n_total"])

    def fin(t: pa.Table) -> pa.Table:
        nh = t["n_head"].to_numpy(zero_copy_only=False)
        nt = t["n_total"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "head_ppm", pa.array(nh * 1_000_000 // nt))

    return agg.map_batches(fin, batch_format="pyarrow")


QUERIES["head_vocab_coverage_sources"] = q_head_vocab_coverage_sources
ORACLE_SQL["head_vocab_coverage_sources"] = """
        WITH tok AS (SELECT source,
                            unnest(string_split(text, ' ')) AS t
                     FROM documents),
        tk AS (SELECT source, t FROM tok WHERE t <> ''),
        vocab AS (SELECT t, count(*) AS n FROM tk GROUP BY 1),
        head AS (SELECT t FROM vocab ORDER BY n DESC, t LIMIT 10),
        c AS (SELECT source,
                     CAST(SUM(CASE WHEN t IN (SELECT t FROM head)
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_head,
                     count(*) AS n_total
              FROM tk GROUP BY 1)
        SELECT source, n_head, CAST(n_total AS BIGINT) AS n_total,
               n_head * 1000000 // n_total AS head_ppm
        FROM c
    """


def q_image_haar_bands(sf_dir: str):
    """2-D Haar band energies per image (first 1024): non-overlapping
    2×2 blocks of the gray plane → exact integer ΣLH², ΣHL², ΣHH²
    (horizontal / vertical / diagonal detail) — the orientation-energy
    fingerprint a texture or compressibility stage keys on. One
    reshape per (w, h) group; all three bands from the same block
    tensor. Python-int replay sidecar."""
    from geotile.ops.tiles import ImageDecodeStage, read_image_table

    ds = read_image_table(_image_dir_for(sf_dir)).limit(1024)

    class HaarBandStage:
        def __init__(self):
            self.decoders = ImageDecodeStage(verify=False).decoders

        def __call__(self, batch: pa.Table) -> pa.Table:
            fmts = batch["fmt"].to_pylist()
            ws = batch["w"].to_pylist()
            hs = batch["h"].to_pylist()
            payloads = batch["bytes"].to_pylist()
            ids = batch["image_id"].to_numpy(zero_copy_only=False)
            groups: dict[tuple[int, int], list[int]] = {}
            for i, (wi, hi) in enumerate(zip(ws, hs)):
                groups.setdefault((wi, hi), []).append(i)
            out = {"image_id": [], "lh_energy": [], "hl_energy": [],
                   "hh_energy": []}
            for (wi, hi), slots in groups.items():
                px = np.stack([self.decoders[fmts[i]](payloads[i],
                                                      wi, hi)
                               for i in slots])
                gray = px.astype(np.int64).sum(axis=3) // 3
                h2, w2 = (hi // 2) * 2, (wi // 2) * 2
                b = gray[:, :h2, :w2] \
                    .reshape(len(slots), h2 // 2, 2, w2 // 2, 2)
                a = b[:, :, 0, :, 0]
                bb = b[:, :, 0, :, 1]
                c = b[:, :, 1, :, 0]
                d = b[:, :, 1, :, 1]
                lh = ((a - bb + c - d) ** 2).sum(axis=(1, 2))
                hl = ((a + bb - c - d) ** 2).sum(axis=(1, 2))
                hh = ((a - bb - c + d) ** 2).sum(axis=(1, 2))
                out["image_id"].append(ids[slots])
                out["lh_energy"].append(lh)
                out["hl_energy"].append(hl)
                out["hh_energy"].append(hh)
            return pa.table({k: pa.array(np.concatenate(v))
                             for k, v in out.items()})

    return ds.map_batches(HaarBandStage, batch_format="pyarrow",
                          batch_size=256, concurrency=2)


QUERIES["image_haar_bands"] = q_image_haar_bands


def _image_haar_sidecar(img: str, n: int = 1024) -> str:
    """Python-int replay for image_haar_bands. Content-keyed on
    synth.py."""
    import geotile.synth as _sy
    import pyarrow.parquet as pq
    from pathlib import Path

    p = _oracle_cache_dir() / (
        f"oracle_imghaar_{Path(img).name}_{n}_{_mods_digest(_sy)}.parquet"
    )
    if not p.exists():
        t = pq.read_table(img, columns=["image_id", "w", "h"])
        order = pc.sort_indices(t["image_id"])[:n]
        ids = t["image_id"].take(order)
        ws = t["w"].take(order).to_numpy(zero_copy_only=False)
        hs = t["h"].take(order).to_numpy(zero_copy_only=False)
        idx = _sy.image_index(ids).astype(np.uint64)
        lhs = np.zeros(len(ws), np.int64)
        hls = np.zeros(len(ws), np.int64)
        hhs = np.zeros(len(ws), np.int64)
        for wi, hi in set(zip(ws.tolist(), hs.tolist())):
            m = np.nonzero((ws == wi) & (hs == hi))[0]
            px = _sy.pixel_pattern(idx[m], wi, hi)
            for j, slot in enumerate(m):
                lh = hl = hh = 0
                for y in range(0, (hi // 2) * 2, 2):
                    for x in range(0, (wi // 2) * 2, 2):
                        def g(yy, xx):
                            return (int(px[j, yy, xx, 0])
                                    + int(px[j, yy, xx, 1])
                                    + int(px[j, yy, xx, 2])) // 3
                        a, b2 = g(y, x), g(y, x + 1)
                        c, d = g(y + 1, x), g(y + 1, x + 1)
                        lh += (a - b2 + c - d) ** 2
                        hl += (a + b2 - c - d) ** 2
                        hh += (a - b2 - c + d) ** 2
                lhs[slot], hls[slot], hhs[slot] = lh, hl, hh
        out = pa.table({"image_id": ids,
                        "lh_energy": pa.array(lhs),
                        "hl_energy": pa.array(hls),
                        "hh_energy": pa.array(hhs)})
        _oracle_cache_dir().mkdir(parents=True, exist_ok=True)
        _atomic_write_table(out, p)
    return str(p)


def _image_haar_sql(img: str) -> str:
    return (f"SELECT image_id, lh_energy, hl_energy, hh_energy "
            f"FROM read_parquet('{_image_haar_sidecar(img)}')")


def q_two_hop_dups(sf_dir: str):
    """2-hop neighbourhood size per node of the near-dup graph — the
    'transitive contamination radius' a dedup-propagation pass needs
    to budget for. CSR adjacency broadcasts once (edge set is
    dedup-output scale); each node batch unions its neighbours'
    neighbour lists with one np.unique — no per-edge Python beyond
    the gather. DISTINCT 2-path replay."""
    from geotile.ops.dedup import embedding_dup_pairs

    pairs = embedding_dup_pairs(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
        tau=0.35).take_all()
    if not pairs:
        return pd.DataFrame({"node": pd.Series(dtype=np.int64),
                             "n_2hop": pd.Series(dtype=np.int64)})
    a = np.array([r["a"] for r in pairs], np.int64)
    b = np.array([r["b"] for r in pairs], np.int64)
    u = np.concatenate([a, b])
    v = np.concatenate([b, a])
    o = np.lexsort((v, u))
    u, v = u[o], v[o]
    nodes, starts = np.unique(u, return_index=True)
    ends = np.r_[starts[1:], len(u)]
    aref = ray.put((nodes, starts, ends, v))

    ds = rd.from_arrow(pa.table({"node": pa.array(nodes)})) \
        .repartition(4)

    def hop2(t: pa.Table) -> pa.Table:
        nodes_, starts_, ends_, adj = _broadcast(aref)
        out_n, out_c = [], []
        for nd in t["node"].to_numpy(zero_copy_only=False).tolist():
            i = np.searchsorted(nodes_, nd)
            nb = adj[starts_[i]:ends_[i]]
            js = np.searchsorted(nodes_, nb)
            reach = np.concatenate(
                [nb] + [adj[starts_[j]:ends_[j]] for j in js])
            reach = np.unique(reach)
            n2 = len(reach) - int(
                np.searchsorted(reach, nd, side="right")
                - np.searchsorted(reach, nd, side="left"))
            out_n.append(nd)
            out_c.append(n2)
        return pa.table({"node": pa.array(out_n, pa.int64()),
                         "n_2hop": pa.array(out_c, pa.int64())})

    return ds.map_batches(hop2, batch_format="pyarrow",
                          batch_size=512)


QUERIES["two_hop_dups"] = q_two_hop_dups
ORACLE_SQL["two_hop_dups"] = f"""
        WITH pairs AS ({EMBEDDING_DUPS_SQL}),
        e AS (SELECT a AS u, b AS v FROM pairs
              UNION SELECT b, a FROM pairs),
        two AS (SELECT e1.u, e2.v AS w
                FROM e e1 JOIN e e2 ON e2.u = e1.v
                WHERE e2.v <> e1.u
                UNION SELECT u, v FROM e)
        SELECT u AS node, CAST(count(DISTINCT w) AS BIGINT) AS n_2hop
        FROM two GROUP BY 1
    """


def q_token_burstiness_head(sf_dir: str):
    """Burstiness moments for the top-20 head tokens: per token, the
    number of docs containing it, total occurrences, and Σ(per-doc
    count)² — the exact integer moments behind the Fano factor that
    separates bursty topical terms from uniform function words.
    Documents are row-atomic, so per-doc counts complete inside each
    batch; the shuffle carries 20 partial rows per batch. Per-doc
    unnest replay."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        flat = pc.list_flatten(pc.split_pattern(t["text"], " "))
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = flat.value_counts()
        return pa.table({"token": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    vocab = (ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True)
             .groupby("token").sum("n")).take_all()
    toks = np.array([r["token"] for r in vocab])
    ns = np.array([r["sum(n)"] for r in vocab], np.int64)
    order = np.lexsort((toks, -ns))[:20]
    href = ray.put(np.sort(toks[order]))

    def moments(t: pa.Table) -> pa.Table:
        head_ = _broadcast(href)
        toks_l = pc.split_pattern(t["text"], " ")
        flat = pc.list_flatten(toks_l)
        keep = pc.not_equal(flat, "")
        lens = pc.list_value_length(toks_l).to_numpy(
            zero_copy_only=False)
        doc_rep = np.repeat(np.arange(len(lens)), lens)[
            keep.to_numpy(zero_copy_only=False)]
        fa = flat.filter(keep).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(head_, fa)
        safe = np.minimum(pos, len(head_) - 1)
        ok = head_[safe] == fa
        code = doc_rep[ok] * len(head_) + safe[ok]
        cnt = np.bincount(code, minlength=len(lens) * len(head_)) \
            .reshape(len(lens), len(head_)).astype(np.int64)
        return pa.table({
            "token": pa.array(np.tile(head_, 1)),
            "n_docs": pa.array((cnt > 0).sum(axis=0)
                               .astype(np.int64)),
            "n_occ": pa.array(cnt.sum(axis=0)),
            "sum_sq": pa.array((cnt * cnt).sum(axis=0))})

    out = (ds.map_batches(moments, batch_format="pyarrow")
           .groupby("token").sum(["n_docs", "n_occ", "sum_sq"]))
    return _rename(out, ["token", "n_docs", "n_occ", "sum_sq"])


QUERIES["token_burstiness_head"] = q_token_burstiness_head
ORACLE_SQL["token_burstiness_head"] = """
        WITH tok AS (SELECT doc_id,
                            unnest(string_split(text, ' ')) AS t
                     FROM documents),
        tk AS (SELECT doc_id, t FROM tok WHERE t <> ''),
        vocab AS (SELECT t, count(*) AS n FROM tk GROUP BY 1),
        head AS (SELECT t FROM vocab ORDER BY n DESC, t LIMIT 20),
        dc AS (SELECT t, doc_id, count(*) AS c FROM tk
               WHERE t IN (SELECT t FROM head) GROUP BY 1, 2)
        SELECT h.t AS token,
               CAST(COALESCE(count(dc.doc_id), 0) AS BIGINT)
                 AS n_docs,
               CAST(COALESCE(SUM(dc.c), 0) AS BIGINT) AS n_occ,
               CAST(COALESCE(SUM(dc.c * dc.c), 0) AS BIGINT)
                 AS sum_sq
        FROM head h LEFT JOIN dc ON dc.t = h.t
        GROUP BY 1
    """


def q_audio_walsh_bands(sf_dir: str):
    """8-point Walsh-Hadamard band energies per track: frames of 8
    samples transform with the ±1 Hadamard matrix (sequency order);
    output Σcoef² per band — the integer-exact 'spectrum' a cheap
    audio classifier bins on (Haar levels 1-2 are two of these eight
    bands; the other six are new information). One (tracks × frames
    × 8) @ H8ᵀ matmul per batch. Python-int replay sidecar."""
    from geotile.ops.audio import AudioFrameStage, read_audio_table

    ds = read_audio_table(_audio_dir_for(sf_dir))
    H8 = np.array([[1 if bin(i & j).count("1") % 2 == 0 else -1
                    for j in range(8)] for i in range(8)], np.int64)

    class WalshStage:
        def __init__(self):
            self.dec = AudioFrameStage().decoders["pcm16"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["track_id"].to_numpy(zero_copy_only=False)
            codecs = batch["codec"].to_pylist()
            if set(codecs) - {"pcm16"}:
                raise NotImplementedError("only pcm16 in container")
            rows = [self.dec(p) for p in batch["bytes"].to_pylist()]
            groups: dict[int, list[int]] = {}
            for i, r in enumerate(rows):
                groups.setdefault(len(r), []).append(i)
            out_id, out_b, out_e = [], [], []
            for length, slots in groups.items():
                n8 = (length // 8) * 8
                pcm = np.stack([rows[i][:n8] for i in slots]) \
                    .astype(np.int64).reshape(len(slots), -1, 8)
                coef = pcm @ H8.T  # (k, frames, 8)
                en = (coef * coef).sum(axis=1)  # (k, 8)
                k = len(slots)
                out_id.append(np.repeat(ids[slots], 8))
                out_b.append(np.tile(np.arange(8, dtype=np.int64),
                                     k))
                out_e.append(en.reshape(-1))
            return pa.table({
                "track_id": pa.array(np.concatenate(out_id)),
                "band": pa.array(np.concatenate(out_b)),
                "energy": pa.array(np.concatenate(out_e))})

    return ds.map_batches(WalshStage, batch_format="pyarrow",
                          batch_size=64, concurrency=2)


QUERIES["audio_walsh_bands"] = q_audio_walsh_bands


def _audio_walsh_sidecar(aud: str) -> str:
    """Python-int replay for audio_walsh_bands. Content-keyed on
    synth.py."""
    import geotile.synth as _sy
    import pyarrow.parquet as pq
    from pathlib import Path

    p = _oracle_cache_dir() / (
        f"oracle_audiowalsh_{Path(aud).name}_{_mods_digest(_sy)}.parquet"
    )
    if not p.exists():
        t = pq.read_table(aud, columns=["track_id"])
        ids = np.sort(t["track_id"].to_numpy(zero_copy_only=False))
        pcm = _sy.audio_samples(ids)
        h8 = [[1 if bin(i & j).count("1") % 2 == 0 else -1
               for j in range(8)] for i in range(8)]
        rows = []
        for j, tid in enumerate(ids.tolist()):
            s = [int(v) for v in pcm[j].tolist()]
            nfr = len(s) // 8
            en = [0] * 8
            for f in range(nfr):
                fr = s[f * 8:(f + 1) * 8]
                for band in range(8):
                    c = sum(h8[band][k] * fr[k] for k in range(8))
                    en[band] += c * c
            for band in range(8):
                rows.append({"track_id": tid, "band": band,
                             "energy": en[band]})
        out = pa.Table.from_pylist(rows)
        _oracle_cache_dir().mkdir(parents=True, exist_ok=True)
        _atomic_write_table(out, p)
    return str(p)


def _audio_walsh_sql(aud: str) -> str:
    return (f"SELECT track_id, band, energy "
            f"FROM read_parquet('{_audio_walsh_sidecar(aud)}')")


def q_best_split_daily(sf_dir: str):
    """Optimal 2-segmentation of the daily revenue series: the single
    change-point minimizing total within-segment SSE, chosen EXACTLY —
    candidates compare by the rational objective sum_l²/n_l +
    sum_r²/n_r on the cents lattice (Fraction arithmetic, earliest
    split on ties), so no float ever decides the argmax. Day partials
    are distributed; the candidate scan is an O(days) driver epilogue
    over the calendar-bounded series (cusum_daily_revenue pattern).
    Brute-force Fraction replay from SQL daily sums."""
    DAY = 86_400_000_000
    orders = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def part(t: pa.Table) -> pa.Table:
        day = t["o_orderdate"].cast(pa.int64()).to_numpy() // DAY
        cents = np.floor(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
            + 0.5).astype(np.int64)
        g = pa.table({"day": pa.array(day),
                      "cents": pa.array(cents)}) \
            .group_by("day").aggregate([("cents", "sum")])
        return pa.table({"day": g["day"], "cents": g["cents_sum"]})

    rows = (orders.map_batches(part, batch_format="pyarrow")
            .groupby("day").sum("cents")).take_all()
    empty = pd.DataFrame({"split_day": pd.Series(dtype=np.int64),
                          "n_l": pd.Series(dtype=np.int64),
                          "n_r": pd.Series(dtype=np.int64),
                          "sum_l": pd.Series(dtype=np.int64),
                          "sum_r": pd.Series(dtype=np.int64)})
    if len(rows) < 2:
        return empty
    days = np.array([r["day"] for r in rows], np.int64)
    cents = np.array([r["sum(cents)"] for r in rows], np.int64)
    o = np.argsort(days)
    days, cents = days[o], cents[o]
    from fractions import Fraction

    d = len(days)
    pref = np.concatenate([[0], np.cumsum(cents)])
    total = int(pref[-1])
    best, bt = Fraction(-1), -1
    for t in range(1, d):
        sl, sr = int(pref[t]), total - int(pref[t])
        g = Fraction(sl * sl, t) + Fraction(sr * sr, d - t)
        if g > best:
            best, bt = g, t
    return pd.DataFrame({"split_day": [int(days[bt])],
                         "n_l": [bt], "n_r": [d - bt],
                         "sum_l": [int(pref[bt])],
                         "sum_r": [total - int(pref[bt])]})


QUERIES["best_split_daily"] = q_best_split_daily


_DAILY_CENTS_SQL = """
    SELECT epoch_us(o_orderdate) // 86400000000 AS day,
           CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5)
                         AS BIGINT)) AS BIGINT) AS cents
    FROM read_parquet('{sf}/orders.parquet') GROUP BY 1
"""


def _best_split_sidecar(sf_dir: str) -> str:
    """Brute-force Fraction replay for best_split_daily: daily sums
    from SQL, every split's segment sums recomputed from scratch."""
    from fractions import Fraction
    from hashlib import blake2b
    from pathlib import Path

    import duckdb

    sql = _DAILY_CENTS_SQL.format(sf=sf_dir)
    key = blake2b((sql + "bestsplit-v1").encode(),
                  digest_size=8).hexdigest()
    p = _oracle_cache_dir() / (
        f"oracle_bestsplit_{Path(sf_dir).name}_{key}.parquet")
    if not p.exists():
        rows = sorted(duckdb.connect().execute(sql).fetchall())
        days = [int(r[0]) for r in rows]
        cents = [int(r[1]) for r in rows]
        d = len(days)
        best, bt = Fraction(-1), -1
        for t in range(1, d):
            sl = sum(cents[:t])
            sr = sum(cents[t:])
            g = Fraction(sl * sl, t) + Fraction(sr * sr, d - t)
            if g > best:
                best, bt = g, t
        out = pa.table({
            "split_day": pa.array([days[bt]], pa.int64()),
            "n_l": pa.array([bt], pa.int64()),
            "n_r": pa.array([d - bt], pa.int64()),
            "sum_l": pa.array([sum(cents[:bt])], pa.int64()),
            "sum_r": pa.array([sum(cents[bt:])], pa.int64())})
        _oracle_cache_dir().mkdir(parents=True, exist_ok=True)
        _atomic_write_table(out, p)
    return str(p)


def _best_split_sql(sf_dir: str) -> str:
    return (f"SELECT split_day, n_l, n_r, sum_l, sum_r "
            f"FROM read_parquet('{_best_split_sidecar(sf_dir)}')")


def q_largest_blob_images(sf_dir: str):
    """Largest and second-largest 4-connected foreground component
    per image (first 1024) — the object-dominance feature that
    separates one-big-region frames from speckle. Reuses the
    whole-batch min-neighbour relaxation labelling (blob_count law);
    component sizes are one bincount of converged labels per image.
    Scalar flood-fill replay."""
    from geotile.ops.tiles import ImageDecodeStage, read_image_table

    ds = read_image_table(_image_dir_for(sf_dir)).limit(1024)

    class LargestBlobStage:
        def __init__(self):
            self.decoders = ImageDecodeStage(verify=False).decoders

        def __call__(self, batch: pa.Table) -> pa.Table:
            fmts = batch["fmt"].to_pylist()
            ws = batch["w"].to_pylist()
            hs = batch["h"].to_pylist()
            payloads = batch["bytes"].to_pylist()
            ids = batch["image_id"].to_numpy(zero_copy_only=False)
            groups: dict[tuple[int, int], list[int]] = {}
            for i, (wi, hi) in enumerate(zip(ws, hs)):
                groups.setdefault((wi, hi), []).append(i)
            out_id, out_1, out_2 = [], [], []
            BIG = np.int64(1 << 62)
            for (wi, hi), slots in groups.items():
                px = np.stack([self.decoders[fmts[i]](payloads[i],
                                                      wi, hi)
                               for i in slots])
                gray = px.astype(np.int64).sum(axis=3) // 3
                fg = gray >= 128
                k = len(slots)
                lab = np.arange(k * hi * wi, dtype=np.int64) \
                    .reshape(k, hi, wi)
                lab = np.where(fg, lab, BIG)
                while True:
                    new = lab.copy()
                    new[:, 1:, :] = np.minimum(new[:, 1:, :],
                                               lab[:, :-1, :])
                    new[:, :-1, :] = np.minimum(new[:, :-1, :],
                                                lab[:, 1:, :])
                    new[:, :, 1:] = np.minimum(new[:, :, 1:],
                                               lab[:, :, :-1])
                    new[:, :, :-1] = np.minimum(new[:, :, :-1],
                                                lab[:, :, 1:])
                    new = np.where(fg, new, BIG)
                    if (new == lab).all():
                        break
                    lab = new
                for j in range(k):
                    m = fg[j].ravel()
                    if not m.any():
                        out_id.append(ids[slots[j]])
                        out_1.append(0)
                        out_2.append(0)
                        continue
                    _, counts = np.unique(lab[j].ravel()[m],
                                          return_counts=True)
                    counts = np.sort(counts)[::-1]
                    out_id.append(ids[slots[j]])
                    out_1.append(int(counts[0]))
                    out_2.append(int(counts[1])
                                 if len(counts) > 1 else 0)
            return pa.table({
                "image_id": pa.array(out_id, pa.string()),
                "max_blob": pa.array(out_1, pa.int64()),
                "second_blob": pa.array(out_2, pa.int64())})

    return ds.map_batches(LargestBlobStage, batch_format="pyarrow",
                          batch_size=128, concurrency=2)


QUERIES["largest_blob_images"] = q_largest_blob_images


def _largest_blob_sidecar(img: str, n: int = 1024) -> str:
    """Flood-fill replay for largest_blob_images. Content-keyed on
    synth.py."""
    import geotile.synth as _sy
    import pyarrow.parquet as pq
    from pathlib import Path

    p = _oracle_cache_dir() / (
        f"oracle_lblob_{Path(img).name}_{n}_{_mods_digest(_sy)}.parquet"
    )
    if not p.exists():
        t = pq.read_table(img, columns=["image_id", "w", "h"])
        order = pc.sort_indices(t["image_id"])[:n]
        ids = t["image_id"].take(order)
        ws = t["w"].take(order).to_numpy(zero_copy_only=False)
        hs = t["h"].take(order).to_numpy(zero_copy_only=False)
        idx = _sy.image_index(ids).astype(np.uint64)
        m1 = np.zeros(len(ws), np.int64)
        m2 = np.zeros(len(ws), np.int64)
        for wi, hi in set(zip(ws.tolist(), hs.tolist())):
            mm = np.nonzero((ws == wi) & (hs == hi))[0]
            px = _sy.pixel_pattern(idx[mm], wi, hi)
            for j, slot in enumerate(mm):
                fg = [[(int(px[j, y, x, 0]) + int(px[j, y, x, 1])
                        + int(px[j, y, x, 2])) // 3 >= 128
                       for x in range(wi)] for y in range(hi)]
                seen = [[False] * wi for _ in range(hi)]
                sizes = []
                for y0 in range(hi):
                    for x0 in range(wi):
                        if not fg[y0][x0] or seen[y0][x0]:
                            continue
                        stack, sz = [(y0, x0)], 0
                        seen[y0][x0] = True
                        while stack:
                            y, x = stack.pop()
                            sz += 1
                            for dy, dx in ((1, 0), (-1, 0),
                                           (0, 1), (0, -1)):
                                yy, xx = y + dy, x + dx
                                if 0 <= yy < hi and 0 <= xx < wi \
                                        and fg[yy][xx] \
                                        and not seen[yy][xx]:
                                    seen[yy][xx] = True
                                    stack.append((yy, xx))
                        sizes.append(sz)
                sizes.sort(reverse=True)
                m1[slot] = sizes[0] if sizes else 0
                m2[slot] = sizes[1] if len(sizes) > 1 else 0
        out = pa.table({"image_id": ids,
                        "max_blob": pa.array(m1),
                        "second_blob": pa.array(m2)})
        _oracle_cache_dir().mkdir(parents=True, exist_ok=True)
        _atomic_write_table(out, p)
    return str(p)


def _largest_blob_sql(img: str) -> str:
    return (f"SELECT image_id, max_blob, second_blob "
            f"FROM read_parquet('{_largest_blob_sidecar(img)}')")


def q_supplier_breadth_customers(sf_dir: str):
    """Bipartite degree histogram: how many DISTINCT suppliers each
    customer has bought from (via orders→lineitem), as a histogram —
    supply-chain diversification at a glance. The custkey rides the
    size-guarded lookup_join onto lineitem; (custkey, suppkey) pairs
    pack into one int64 key (packed-key law) for the distinct
    shuffle; per-customer counts and the final histogram are two tiny
    follow-up groupbys. DISTINCT-pair SQL replay."""
    from geotile.ops.relational import lookup_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]) \
        .map_batches(lambda t: pa.table(
            {"o_orderkey": t["o_orderkey"].cast(pa.int64()),
             "cust": t["o_custkey"].cast(pa.int64())}),
            batch_format="pyarrow")
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"])
    j = lookup_join(li, "l_orderkey", orders, "o_orderkey", "cust")
    PACK = np.int64(1) << np.int64(20)

    def pack(t: pa.Table) -> pa.Table:
        c = t["cust"].to_numpy(zero_copy_only=False)
        s = t["l_suppkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        assert s.max(initial=0) < PACK, "suppkey packing contract"
        k = np.unique(c * PACK + s)
        return pa.table({"k": pa.array(k)})

    pairs = (j.map_batches(pack, batch_format="pyarrow")
             .groupby("k").count())

    def per_cust(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy(zero_copy_only=False)
        g = pa.table({"cust": pa.array(k // PACK),
                      "ns": pa.array(np.ones(len(k), np.int64))}) \
            .group_by("cust").aggregate([("ns", "sum")])
        return pa.table({"cust": g["cust"], "ns": g["ns_sum"]})

    counts = (pairs.map_batches(per_cust, batch_format="pyarrow")
              .groupby("cust").sum("ns"))

    def hist(t: pa.Table) -> pa.Table:
        ns = t["sum(ns)"].to_numpy(zero_copy_only=False)
        g = pa.table({"n_suppliers": pa.array(ns),
                      "n_customers": pa.array(np.ones(len(ns),
                                                      np.int64))}) \
            .group_by("n_suppliers").aggregate([("n_customers",
                                                 "sum")])
        return pa.table({"n_suppliers": g["n_suppliers"],
                         "n_customers": g["n_customers_sum"]})

    out = (counts.map_batches(hist, batch_format="pyarrow")
           .groupby("n_suppliers").sum("n_customers"))
    return _rename(out, ["n_suppliers", "n_customers"])


QUERIES["supplier_breadth_customers"] = q_supplier_breadth_customers
ORACLE_SQL["supplier_breadth_customers"] = """
        WITH cs AS (SELECT DISTINCT o.o_custkey AS c,
                                    l.l_suppkey AS s
                    FROM lineitem l
                    JOIN orders o ON l.l_orderkey = o.o_orderkey),
        d AS (SELECT c, count(*) AS ns FROM cs GROUP BY 1)
        SELECT CAST(ns AS BIGINT) AS n_suppliers,
               count(*) AS n_customers
        FROM d GROUP BY 1
    """


def q_containment_pairs_docs(sf_dir: str):
    """Asymmetric containment for the verified MinHash near-dup
    pairs: |Sa∩Sb| with both distinct-shingle set sizes — the
    partial-copy detector (high containment, low Jaccard = one doc
    embedded in another) that symmetric dedup misses. Pair discovery
    is the distributed LSH+verify stage; shingle sets recompute with
    the engine's vectorized Rabin-Karp shingling for just the paired
    docs (pair-output scale broadcast; co-partition the pair list
    against documents at 100 TB). Scalar shingle-set replay."""
    from geotile.ops.dedup import (_shingle_flat, hashed_tokens,
                                   minhash_lsh_pairs)

    pairs = minhash_lsh_pairs(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        threshold=0.35)
    plist = pairs.take_all()
    if not plist:
        return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                             "b": pd.Series(dtype=np.int64),
                             "inter": pd.Series(dtype=np.int64),
                             "na": pd.Series(dtype=np.int64),
                             "nb": pd.Series(dtype=np.int64)})
    need = sorted({r["a"] for r in plist} | {r["b"] for r in plist})
    need_arr = np.array(need, np.int64)
    nref = ray.put(need_arr)

    def gather(t: pa.Table) -> pa.Table:
        need_ = _broadcast(nref)
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(need_, d)
        safe = np.minimum(pos, len(need_) - 1)
        keep = need_[safe] == d
        return t.filter(pa.array(keep))

    texts = (_read(sf_dir, "documents", ["doc_id", "text"])
             .map_batches(gather, batch_format="pyarrow")).take_all()
    shing: dict[int, np.ndarray] = {}
    for r in texts:
        h, off = hashed_tokens(pa.array([r["text"]], pa.string()))
        sh, _ = _shingle_flat(h, off, 3)
        shing[r["doc_id"]] = np.unique(sh)
    sref = ray.put(shing)

    ds = rd.from_arrow(pa.table(
        {"a": pa.array([r["a"] for r in plist], pa.int64()),
         "b": pa.array([r["b"] for r in plist], pa.int64())})) \
        .repartition(4)

    def cont(t: pa.Table) -> pa.Table:
        sh_ = _broadcast(sref)
        aa = t["a"].to_numpy(zero_copy_only=False)
        bb = t["b"].to_numpy(zero_copy_only=False)
        inter = np.zeros(len(aa), np.int64)
        na = np.zeros(len(aa), np.int64)
        nb = np.zeros(len(aa), np.int64)
        for i, (x, y) in enumerate(zip(aa.tolist(), bb.tolist())):
            sa, sb = sh_[x], sh_[y]
            inter[i] = len(np.intersect1d(sa, sb,
                                          assume_unique=True))
            na[i], nb[i] = len(sa), len(sb)
        return pa.table({"a": t["a"], "b": t["b"],
                         "inter": pa.array(inter),
                         "na": pa.array(na), "nb": pa.array(nb)})

    return ds.map_batches(cont, batch_format="pyarrow")


QUERIES["containment_pairs_docs"] = q_containment_pairs_docs


def _containment_sidecar(sf_dir: str) -> str:
    from geotile.oracle_ref import minhash_lsh_pairs_ref, shingles

    def build() -> pa.Table:
        docs = _read_docs(sf_dir)
        byid = dict(docs)
        pairs = minhash_lsh_pairs_ref(docs, threshold=0.35)
        rows = []
        for a, b, _j in pairs:
            sa = set(shingles(byid[a], 3))
            sb = set(shingles(byid[b], 3))
            rows.append({"a": a, "b": b,
                         "inter": len(sa & sb),
                         "na": len(sa), "nb": len(sb)})
        if not rows:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "inter": pa.array([], pa.int64()),
                             "na": pa.array([], pa.int64()),
                             "nb": pa.array([], pa.int64())})
        return pa.Table.from_pylist(rows)

    return _ref_sidecar(sf_dir, "containment", build)


def _containment_sql(sf_dir: str) -> str:
    return (f"SELECT a, b, inter, na, nb "
            f"FROM read_parquet('{_containment_sidecar(sf_dir)}')")


def q_butterfly_count_cs(sf_dir: str):
    """Butterfly (bipartite 4-cycle) census of the customer–supplier
    purchase graph: wedges = Σ_pairs-of-suppliers-sharing-a-customer,
    butterflies = Σ_wedge-keys C(w, 2) — the bipartite clustering
    primitive behind fraud-ring and co-purchase mining. Distinct
    (cust, supp) edges via the packed-key shuffle; each customer
    group emits its C(ns, 2) supplier pairs (bounded by the supplier
    dimension); one pair-key groupby and a tiny Σ C(w,2) epilogue.
    DISTINCT double-join replay."""
    from geotile.ops.relational import _with_bucket, lookup_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]) \
        .map_batches(lambda t: pa.table(
            {"o_orderkey": t["o_orderkey"].cast(pa.int64()),
             "cust": t["o_custkey"].cast(pa.int64())}),
            batch_format="pyarrow")
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"])
    j = lookup_join(li, "l_orderkey", orders, "o_orderkey", "cust")
    PACK = np.int64(1) << np.int64(20)

    def pack(t: pa.Table) -> pa.Table:
        c = t["cust"].to_numpy(zero_copy_only=False)
        s = t["l_suppkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        k = np.unique(c * PACK + s)
        return pa.table({"k": pa.array(k)})

    edges = (j.map_batches(pack, batch_format="pyarrow")
             .groupby("k").count())

    def wedge_pairs(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"pk": pd.Series(dtype=np.int64),
                                 "w": pd.Series(dtype=np.int64)})
        k = np.sort(df["k"].to_numpy(np.int64))
        cust = k // PACK
        supp = k % PACK
        starts = np.flatnonzero(np.r_[True, cust[1:] != cust[:-1]])
        ends = np.r_[starts[1:], len(k)]
        out = []
        for s, e in zip(starts, ends):
            ss = supp[s:e]
            if len(ss) < 2:
                continue
            iu = np.triu_indices(len(ss), k=1)
            out.append(ss[iu[0]] * PACK + ss[iu[1]])
        if not out:
            return pd.DataFrame({"pk": pd.Series(dtype=np.int64),
                                 "w": pd.Series(dtype=np.int64)})
        pk = np.concatenate(out)
        return pd.DataFrame({"pk": pk,
                             "w": np.ones(len(pk), np.int64)})

    def cust_col(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy(zero_copy_only=False)
        return pa.table({"k": t["k"],
                         "cust": pa.array(k // PACK)})

    wedges = (_with_bucket(edges.map_batches(cust_col,
                                             batch_format="pyarrow"),
                           "cust", 16)
              .groupby("bucket")
              .map_groups(wedge_pairs, batch_format="pandas")
              .map_batches(lambda t: t, batch_format="pyarrow")
              .groupby("pk").sum("w"))

    def part(t: pa.Table) -> pa.Table:
        w = t["sum(w)"].to_numpy(zero_copy_only=False)
        return pa.table({
            "wedges": pa.array([int(w.sum())], pa.int64()),
            "butterflies": pa.array([int((w * (w - 1) // 2).sum())],
                                    pa.int64()),
            "wedge_keys": pa.array([len(w)], pa.int64())})

    rows = wedges.map_batches(part, batch_format="pyarrow").take_all()
    return pd.DataFrame({
        "wedges": [int(sum(r["wedges"] for r in rows))],
        "butterflies": [int(sum(r["butterflies"] for r in rows))],
        "wedge_keys": [int(sum(r["wedge_keys"] for r in rows))]})


QUERIES["butterfly_count_cs"] = q_butterfly_count_cs
ORACLE_SQL["butterfly_count_cs"] = """
        WITH cs AS (SELECT DISTINCT o.o_custkey AS c,
                                    l.l_suppkey AS s
                    FROM lineitem l
                    JOIN orders o ON l.l_orderkey = o.o_orderkey),
        wedge AS (SELECT x.s AS s1, y.s AS s2, count(*) AS w
                  FROM cs x JOIN cs y ON y.c = x.c AND y.s > x.s
                  GROUP BY 1, 2)
        SELECT CAST(SUM(w) AS BIGINT) AS wedges,
               CAST(SUM(w * (w - 1) // 2) AS BIGINT) AS butterflies,
               CAST(count(*) AS BIGINT) AS wedge_keys
        FROM wedge
    """


def q_video_temporal_haar(sf_dir: str):
    """Temporal micro-structure per clip from the per-frame pixel-sum
    series (EVERY frame: the sampling stage runs with every_n=1):
    total variation Σ|Δ| and level-1 Haar detail Σ(s₂ᵢ−s₂ᵢ₊₁)² —
    exact integers separating smooth pans from strobing content. One
    frame-ledger pass, per-clip folds are index algebra. Python-int
    replay sidecar."""
    from geotile.ops.relational import _with_bucket
    from geotile.ops.video import VideoFrameStage, read_video_table

    ds = read_video_table(_video_dir_for(sf_dir))
    frames = ds.map_batches(VideoFrameStage, batch_format="pyarrow",
                            batch_size=32, concurrency=2,
                            fn_constructor_kwargs={"every_n": 1})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"clip_id": pd.Series(dtype=np.int64),
                                 "tv": pd.Series(dtype=np.int64),
                                 "d1_energy":
                                     pd.Series(dtype=np.int64)})
        cid = df["clip_id"].to_numpy(np.int64)
        fr = df["frame_idx"].to_numpy(np.int64)
        s = df["pixel_sum"].to_numpy(np.int64)
        o = np.lexsort((fr, cid))
        cid, s = cid[o], s[o]
        starts = np.flatnonzero(np.r_[True, cid[1:] != cid[:-1]])
        ends = np.r_[starts[1:], len(cid)]
        out_c, out_tv, out_d1 = [], [], []
        for a, e in zip(starts, ends):
            seg = s[a:e]
            tv = int(np.abs(np.diff(seg)).sum())
            n2 = (len(seg) // 2) * 2
            p = seg[:n2].reshape(-1, 2)
            d1 = int(((p[:, 0] - p[:, 1]) ** 2).sum())
            out_c.append(cid[a])
            out_tv.append(tv)
            out_d1.append(d1)
        return pd.DataFrame({"clip_id": out_c,
                             "tv": np.array(out_tv, np.int64),
                             "d1_energy": np.array(out_d1,
                                                   np.int64)})

    return (_with_bucket(frames, "clip_id", 8)
            .groupby("bucket").map_groups(fold, batch_format="pandas")
            .map_batches(lambda t: t, batch_format="pyarrow"))


QUERIES["video_temporal_haar"] = q_video_temporal_haar


def _video_thaar_sidecar(vid: str) -> str:
    """Python-int replay for video_temporal_haar. Content-keyed on
    synth.py."""
    import geotile.synth as _sy
    import pyarrow.parquet as pq
    from pathlib import Path

    p = _oracle_cache_dir() / (
        f"oracle_videothaar_{Path(vid).name}_{_mods_digest(_sy)}.parquet"
    )
    if not p.exists():
        t = pq.read_table(vid, columns=["clip_id", "n_frames"])
        ids = np.sort(t["clip_id"].to_numpy(zero_copy_only=False))
        nf = int(t["n_frames"][0].as_py())
        rows = []
        for cid in ids.tolist():
            sums = []
            for f in range(nf):
                px = _sy.pixel_pattern(
                    np.array([cid * 64 + f], np.uint64),
                    _sy.VIDEO_W, _sy.VIDEO_H)[0]
                sums.append(sum(int(v) for v in px.ravel().tolist()))
            tv = sum(abs(sums[i + 1] - sums[i])
                     for i in range(nf - 1))
            d1 = sum((sums[2 * i] - sums[2 * i + 1]) ** 2
                     for i in range(nf // 2))
            rows.append({"clip_id": cid, "tv": tv, "d1_energy": d1})
        out = pa.Table.from_pylist(rows)
        _oracle_cache_dir().mkdir(parents=True, exist_ok=True)
        _atomic_write_table(out, p)
    return str(p)


def _video_thaar_sql(vid: str) -> str:
    return (f"SELECT clip_id, tv, d1_energy "
            f"FROM read_parquet('{_video_thaar_sidecar(vid)}')")
