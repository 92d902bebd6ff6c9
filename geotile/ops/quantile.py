"""Exact distributed quantiles by iterative histogram refinement.

The classic exact-selection-at-scale algorithm (distributed k-th
element): rather than a global ``sort`` (an all-to-all shuffle of EVERY
row), each round makes one streaming pass that bins the column into
``n_bins`` per active quantile interval, pre-merges the per-block
partial histograms with a tiny ``groupby(qi, bin)`` aggregate (rows are
(interval, bin, count, min, max) for NON-EMPTY bins only — the shuffle
moves KB-scale summaries, never data rows), narrows each target rank to
one bin, and repeats until the surviving interval holds at most
``max_pull`` rows; only those land on the driver for the final exact
selection.  Passes: 1 (extent) + ceil(log_B(n / max_pull)) histogram
rounds + 1 bounded pull — at 100 TB with B=8192 that is ~3 histogram
rounds, each a column-pruned streaming read, vs one full-data
all-to-all shuffle for a distributed sort.

Exactness: bin assignment ``clip(floor((v - lo)/w))`` is monotone in v,
so bins partition the interval's values into contiguous runs of the
sorted order; the refined interval is snapped to the ACTUAL min/max
value observed in the chosen bin, so the next round's range predicate
``lo <= v <= hi`` selects exactly that bin's multiset — no float
boundary drift, and a bin collapsing to a single double (a mass point
heavier than ``max_pull``) resolves immediately without a pull.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Max, Min, Sum


def exact_quantiles(
    ds: rd.Dataset,
    col: str = "value",
    q_pcts: tuple[int, ...] = (25, 50, 75, 95, 99),
    n_bins: int = 8192,
    max_pull: int = 200_000,
    max_rounds: int = 12,
) -> pa.Table:
    """Exact rank-based quantiles of ``ds[col]`` (float64).

    Semantics: quantile p is the element at 1-based rank
    ``ceil(p/100 * n)`` of the ascending sort — the same double
    arithmetic a SQL replay uses (``ceil(CAST(p AS DOUBLE)/100 * n)``),
    so the selected element is bit-identical to the oracle's.

    Returns a driver-side ``pa.Table(q_pct int64, value float64)`` —
    quantiles are a summary, not a dataset."""
    n, vals = _rank_select(
        ds, col,
        lambda n: [int(math.ceil(float(p) / 100.0 * n)) for p in q_pcts],
        n_bins=n_bins, max_pull=max_pull, max_rounds=max_rounds,
    )
    if n == 0:
        return pa.table({"q_pct": pa.array([], pa.int64()),
                         "value": pa.array([], pa.float64())})
    return pa.table(
        {
            "q_pct": pa.array([int(p) for p in q_pcts], pa.int64()),
            "value": pa.array(vals, pa.float64()),
        }
    )


def quantiles_cont(
    ds: rd.Dataset,
    col: str = "value",
    q_pcts: tuple[int, ...] = (50, 90),
    **kw,
) -> pa.Table:
    """Interpolated (percentile_cont-style) quantiles, kept EXACT for
    the oracle: instead of emitting the float interpolation (whose
    ``lo + frac*(hi-lo)`` rounding could differ between engines), emit
    the two bracketing order statistics plus the exact rational
    fraction — SQL's quantile_cont rank model ``h = (n-1)*p/100``,
    ``lo = s[floor(h)+1]``, ``hi = s[ceil(h)+1]``, ``frac = h-floor(h)``
    with frac as the integer ``((n-1)*p mod 100) * 1e6 // 100``. The
    caller (or the reader) finishes ``lo + frac*(hi-lo)`` in one scalar
    op; everything distributed and compared is bit-exact.

    Columns: q_pct, lo_value, hi_value, frac_e6. Same histogram-
    refinement rank selection as ``exact_quantiles`` (one streaming
    pass per round for ALL target ranks, no global sort)."""

    def ranks_of(n: int) -> list[int]:
        out = []
        for p in q_pcts:
            num = (n - 1) * int(p)
            lo = num // 100 + 1  # 1-based
            hi = lo + (0 if num % 100 == 0 else 1)
            out.extend([lo, hi])
        return out

    n, vals = _rank_select(ds, col, ranks_of, **kw)
    if n == 0:
        return pa.table(
            {"q_pct": pa.array([], pa.int64()),
             "lo_value": pa.array([], pa.float64()),
             "hi_value": pa.array([], pa.float64()),
             "frac_e6": pa.array([], pa.int64())}
        )
    lo_vals = vals[0::2]
    hi_vals = vals[1::2]
    fracs = [((n - 1) * int(p) % 100) * 1_000_000 // 100 for p in q_pcts]
    return pa.table(
        {
            "q_pct": pa.array([int(p) for p in q_pcts], pa.int64()),
            "lo_value": pa.array(lo_vals, pa.float64()),
            "hi_value": pa.array(hi_vals, pa.float64()),
            "frac_e6": pa.array(fracs, pa.int64()),
        }
    )


def _rank_select(
    ds: rd.Dataset,
    col: str,
    ranks_of,
    n_bins: int = 8192,
    max_pull: int = 200_000,
    max_rounds: int = 12,
) -> tuple[int, list[float]]:
    """Distributed order-statistic selection: returns (n, values) where
    ``values[i]`` is the element at 1-based rank ``ranks_of(n)[i]`` of
    the ascending sort. Iterative histogram refinement — every round is
    ONE streaming pass covering all pending ranks; per-round shuffle
    volume is ≤ ranks × n_bins count rows; no global sort."""
    proj = ds.select_columns([col])

    def extent(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False)
        if len(v) == 0:
            return pa.table(
                {"n": pa.array([0], pa.int64()),
                 "mn": pa.array([np.inf]), "mx": pa.array([-np.inf])}
            )
        return pa.table(
            {"n": pa.array([len(v)], pa.int64()),
             "mn": pa.array([float(v.min())]), "mx": pa.array([float(v.max())])}
        )

    parts = proj.map_batches(extent, batch_format="pyarrow").take_all()
    n = int(sum(p["n"] for p in parts))
    if n == 0:
        return 0, []
    lo0 = min(p["mn"] for p in parts)
    hi0 = max(p["mx"] for p in parts)

    # state per target: [lo, hi] interval (inclusive, snapped to data
    # values), 1-based rank within it, candidate row count
    state = []
    for rank in ranks_of(n):
        state.append({"lo": lo0, "hi": hi0, "rank": int(rank), "count": n})

    def hist_pass(intervals):
        los = np.array([iv[0] for iv in intervals])
        his = np.array([iv[1] for iv in intervals])
        widths = (his - los) / n_bins
        ni = len(intervals)

        def hist(t: pa.Table) -> pa.Table:
            v = t[col].to_numpy(zero_copy_only=False)
            qi_l, bin_l, cnt_l, mn_l, mx_l = [], [], [], [], []
            for i in range(ni):
                sel = v[(v >= los[i]) & (v <= his[i])]
                if not sel.size:
                    continue
                if widths[i] > 0:
                    b = np.clip(
                        ((sel - los[i]) / widths[i]).astype(np.int64), 0, n_bins - 1
                    )
                else:  # lo == hi: everything in bin 0
                    b = np.zeros(sel.size, dtype=np.int64)
                cnt = np.bincount(b, minlength=n_bins)
                mn = np.full(n_bins, np.inf)
                mx = np.full(n_bins, -np.inf)
                np.minimum.at(mn, b, sel)
                np.maximum.at(mx, b, sel)
                nz = np.flatnonzero(cnt)
                qi_l.append(np.full(nz.size, i, dtype=np.int64))
                bin_l.append(nz)
                cnt_l.append(cnt[nz])
                mn_l.append(mn[nz])
                mx_l.append(mx[nz])
            if not qi_l:
                return pa.table(
                    {"qi": pa.array([], pa.int64()), "bin": pa.array([], pa.int64()),
                     "cnt": pa.array([], pa.int64()), "mn": pa.array([], pa.float64()),
                     "mx": pa.array([], pa.float64())}
                )
            return pa.table(
                {"qi": pa.array(np.concatenate(qi_l)),
                 "bin": pa.array(np.concatenate(bin_l)),
                 "cnt": pa.array(np.concatenate(cnt_l)),
                 "mn": pa.array(np.concatenate(mn_l)),
                 "mx": pa.array(np.concatenate(mx_l))}
            )

        merged = (
            proj.map_batches(hist, batch_format="pyarrow")
            .groupby(["qi", "bin"])
            .aggregate(Sum("cnt"), Min("mn"), Max("mx"))
            .take_all()
        )  # <= n_intervals * n_bins tiny rows
        cnt = np.zeros((ni, n_bins), dtype=np.int64)
        mn = np.full((ni, n_bins), np.inf)
        mx = np.full((ni, n_bins), -np.inf)
        for r in merged:
            cnt[r["qi"], r["bin"]] = r["sum(cnt)"]
            mn[r["qi"], r["bin"]] = r["min(mn)"]
            mx[r["qi"], r["bin"]] = r["max(mx)"]
        return cnt, mn, mx

    for _round in range(max_rounds):
        active = [s for s in state if "value" not in s and s["count"] > max_pull]
        if not active:
            break
        cnt, mn, mx = hist_pass([(s["lo"], s["hi"]) for s in active])
        for i, s in enumerate(active):
            cum = np.cumsum(cnt[i])
            j = int(np.searchsorted(cum, s["rank"], side="left"))
            below = int(cum[j - 1]) if j > 0 else 0
            if mn[i, j] == mx[i, j]:
                # the whole bin is one double — that IS the quantile
                s["value"] = float(mn[i, j])
                continue
            s["lo"], s["hi"] = float(mn[i, j]), float(mx[i, j])
            s["rank"] -= below
            s["count"] = int(cnt[i, j])

    # final bounded pull: values inside each unresolved interval
    pending = [s for s in state if "value" not in s]
    if pending:
        los = np.array([s["lo"] for s in pending])
        his = np.array([s["hi"] for s in pending])

        def pull(t: pa.Table) -> pa.Table:
            v = t[col].to_numpy(zero_copy_only=False)
            outs, idxs = [], []
            for i in range(len(pending)):
                sel = v[(v >= los[i]) & (v <= his[i])]
                outs.append(sel)
                idxs.append(np.full(sel.size, i, dtype=np.int64))
            return pa.table(
                {"i": pa.array(np.concatenate(idxs)),
                 "v": pa.array(np.concatenate(outs))}
            )

        rows = proj.map_batches(pull, batch_format="pyarrow").take_all()
        vals = np.array([r["v"] for r in rows])
        idx = np.array([r["i"] for r in rows], dtype=np.int64)
        for i, s in enumerate(pending):
            mine = np.sort(vals[idx == i])
            s["value"] = float(mine[s["rank"] - 1])

    return n, [float(s["value"]) for s in state]


def grouped_quantiles(
    ds: rd.Dataset,
    col: str = "value",
    group_col: str = "event_type",
    q_pcts: tuple[int, ...] = (50, 95),
    n_bins: int = 4096,
    max_pull: int = 200_000,
    max_rounds: int = 12,
) -> pa.Table:
    """Exact per-group rank-based quantiles — the grouped/windowed
    variant of :func:`exact_quantiles`, same histogram-refinement
    passes with a (group × quantile) interval lattice. One streaming
    pass per round covers EVERY group's every active interval (the
    per-batch loop is over #groups × #q intervals — dimension-scale by
    the grouping-column contract, the same assumption every groupby in
    this engine makes), so the pass count stays ceil(log_B(n_g /
    max_pull)) for the LARGEST group, not per group.

    Rank semantics per group g: element at 1-based rank
    ``ceil(p/100 * n_g)`` of g's ascending sort (bit-identical to a SQL
    ``row_number() OVER (PARTITION BY g ORDER BY v)`` replay).

    Returns a driver-side ``pa.Table(group, q_pct, value)`` sorted by
    (group, q_pct) — a #groups × #q summary, not a dataset."""
    proj = ds.select_columns([group_col, col])

    def extent(t: pa.Table) -> pa.Table:
        tg = pa.table({"g": t[group_col], "v": t[col]})
        gb = tg.group_by("g").aggregate(
            [("v", "count"), ("v", "min"), ("v", "max")]
        )
        # select by name — pyarrow puts group keys LAST in the result
        return pa.table(
            {"g": gb["g"], "n": gb["v_count"].cast(pa.int64()),
             "mn": gb["v_min"], "mx": gb["v_max"]}
        )

    ext = (
        proj.map_batches(extent, batch_format="pyarrow")
        .groupby("g")
        .aggregate(Sum("n"), Min("mn"), Max("mx"))
        .take_all()
    )  # one row per group — dimension-scale
    if not ext:
        return pa.table(
            {"group": pa.array([], pa.string()), "q_pct": pa.array([], pa.int64()),
             "value": pa.array([], pa.float64())}
        )
    groups = sorted(r["g"] for r in ext)
    ginfo = {r["g"]: r for r in ext}

    state = []
    for g in groups:
        n_g = int(ginfo[g]["sum(n)"])
        for p in q_pcts:
            state.append(
                {
                    "g": g,
                    "q": p,
                    "lo": float(ginfo[g]["min(mn)"]),
                    "hi": float(ginfo[g]["max(mx)"]),
                    "rank": int(math.ceil(float(p) / 100.0 * n_g)),
                    "count": n_g,
                }
            )

    def hist_pass(active):
        los = np.array([s["lo"] for s in active])
        his = np.array([s["hi"] for s in active])
        widths = (his - los) / n_bins
        gs = [s["g"] for s in active]
        ni = len(active)

        def hist(t: pa.Table) -> pa.Table:
            gcol = t[group_col].to_numpy(zero_copy_only=False)
            v = t[col].to_numpy(zero_copy_only=False)
            qi_l, bin_l, cnt_l, mn_l, mx_l = [], [], [], [], []
            for i in range(ni):
                sel = v[(gcol == gs[i]) & (v >= los[i]) & (v <= his[i])]
                if not sel.size:
                    continue
                if widths[i] > 0:
                    b = np.clip(
                        ((sel - los[i]) / widths[i]).astype(np.int64), 0, n_bins - 1
                    )
                else:
                    b = np.zeros(sel.size, dtype=np.int64)
                cnt = np.bincount(b, minlength=n_bins)
                mn = np.full(n_bins, np.inf)
                mx = np.full(n_bins, -np.inf)
                np.minimum.at(mn, b, sel)
                np.maximum.at(mx, b, sel)
                nz = np.flatnonzero(cnt)
                qi_l.append(np.full(nz.size, i, dtype=np.int64))
                bin_l.append(nz)
                cnt_l.append(cnt[nz])
                mn_l.append(mn[nz])
                mx_l.append(mx[nz])
            if not qi_l:
                return pa.table(
                    {"qi": pa.array([], pa.int64()), "bin": pa.array([], pa.int64()),
                     "cnt": pa.array([], pa.int64()), "mn": pa.array([], pa.float64()),
                     "mx": pa.array([], pa.float64())}
                )
            return pa.table(
                {"qi": pa.array(np.concatenate(qi_l)),
                 "bin": pa.array(np.concatenate(bin_l)),
                 "cnt": pa.array(np.concatenate(cnt_l)),
                 "mn": pa.array(np.concatenate(mn_l)),
                 "mx": pa.array(np.concatenate(mx_l))}
            )

        merged = (
            proj.map_batches(hist, batch_format="pyarrow")
            .groupby(["qi", "bin"])
            .aggregate(Sum("cnt"), Min("mn"), Max("mx"))
            .take_all()
        )
        cnt = np.zeros((ni, n_bins), dtype=np.int64)
        mn = np.full((ni, n_bins), np.inf)
        mx = np.full((ni, n_bins), -np.inf)
        for r in merged:
            cnt[r["qi"], r["bin"]] = r["sum(cnt)"]
            mn[r["qi"], r["bin"]] = r["min(mn)"]
            mx[r["qi"], r["bin"]] = r["max(mx)"]
        return cnt, mn, mx

    for _round in range(max_rounds):
        active = [s for s in state if "value" not in s and s["count"] > max_pull]
        if not active:
            break
        cnt, mn, mx = hist_pass(active)
        for i, s in enumerate(active):
            cum = np.cumsum(cnt[i])
            j = int(np.searchsorted(cum, s["rank"], side="left"))
            below = int(cum[j - 1]) if j > 0 else 0
            if mn[i, j] == mx[i, j]:
                s["value"] = float(mn[i, j])
                continue
            s["lo"], s["hi"] = float(mn[i, j]), float(mx[i, j])
            s["rank"] -= below
            s["count"] = int(cnt[i, j])

    pending = [s for s in state if "value" not in s]
    if pending:
        los = np.array([s["lo"] for s in pending])
        his = np.array([s["hi"] for s in pending])
        pgs = [s["g"] for s in pending]

        def pull(t: pa.Table) -> pa.Table:
            gcol = t[group_col].to_numpy(zero_copy_only=False)
            v = t[col].to_numpy(zero_copy_only=False)
            outs, idxs = [], []
            for i in range(len(pending)):
                sel = v[(gcol == pgs[i]) & (v >= los[i]) & (v <= his[i])]
                outs.append(sel)
                idxs.append(np.full(sel.size, i, dtype=np.int64))
            return pa.table(
                {"i": pa.array(np.concatenate(idxs), pa.int64()),
                 "v": pa.array(np.concatenate(outs), pa.float64())}
            )

        rows = proj.map_batches(pull, batch_format="pyarrow").take_all()
        vals = np.array([r["v"] for r in rows])
        idx = np.array([r["i"] for r in rows], dtype=np.int64)
        for i, s in enumerate(pending):
            mine = np.sort(vals[idx == i])
            s["value"] = float(mine[s["rank"] - 1])

    order = sorted(range(len(state)), key=lambda i: (state[i]["g"], state[i]["q"]))
    return pa.table(
        {
            "group": pa.array([state[i]["g"] for i in order]),
            "q_pct": pa.array([int(state[i]["q"]) for i in order], pa.int64()),
            "value": pa.array([float(state[i]["value"]) for i in order], pa.float64()),
        }
    )
