"""Round-3 batch: Dinic max-flow, Gale-Shapley stable matching,
rectangle-union area — pins, independent cross-checks, parity."""

import duckdb
import numpy as np

from geotile.queries import (
    QUERIES,
    _dinic,
    _edmonds_karp,
    _flow_sql,
    _gale_shapley,
    _gale_shapley_rec,
    _gs_prefs,
    _gs_sql,
    _image_dir_for,
    _rect_sql,
    _rects_from_centers,
    _union_area_grid,
    _union_area_sweep,
)

SF = "/root/testdata/sf0.001"


def _canon(df):
    df = df.to_pandas() if hasattr(df, "to_pandas") else df
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def _cmp(got, exp):
    g, x = _canon(got), _canon(exp)
    assert list(g.columns) == list(x.columns)
    assert len(g) == len(x)
    for c in g.columns:
        assert (g[c].to_numpy() == x[c].to_numpy()).all(), c


# -- max flow --------------------------------------------------------------------


def test_flow_known_network():
    # classic: S=0,T=1; 0→2 (3), 0→3 (2), 2→3 (1), 2→1 (2), 3→1 (3)
    edges = [(0, 2, 3), (0, 3, 2), (2, 3, 1), (2, 1, 2), (3, 1, 3)]
    assert _dinic(4, edges, 0, 1) == 5
    assert _edmonds_karp(4, edges, 0, 1) == 5


def test_flow_bottleneck_cut():
    # min cut is the middle edge
    edges = [(0, 2, 9), (2, 3, 1), (3, 1, 9)]
    assert _dinic(4, edges, 0, 1) == 1
    assert _edmonds_karp(4, edges, 0, 1) == 1


def test_flow_dinic_vs_ek_random():
    rng = np.random.default_rng(157)
    for _ in range(30):
        n = int(rng.integers(2, 8))
        edges = []
        for _e in range(int(rng.integers(0, 14))):
            u, v = rng.integers(0, n, 2)
            if u != v:
                edges.append((int(u), int(v), int(rng.integers(1, 9))))
        s, t = 0, n - 1
        if s == t:
            continue
        assert _dinic(n, edges, s, t) == _edmonds_karp(n, edges, s, t)


def test_oracle_parity_flow(ray_session):
    con = duckdb.connect()
    _cmp(QUERIES["dinic_flow_nations"](SF),
         con.execute(_flow_sql(SF)).df())


# -- stable matching -------------------------------------------------------------


def test_gs_queue_vs_recursive_random():
    rng = np.random.default_rng(163)
    for _ in range(40):
        k = int(rng.integers(1, 8))
        cc = rng.integers(0, 1000, k).astype(np.int64)
        sc = rng.integers(0, 1000, k).astype(np.int64)
        cpref, spref = _gs_prefs(cc, sc)
        assert _gale_shapley(cpref, spref) \
            == _gale_shapley_rec(cpref, spref)


def test_gs_stability_vs_hungarian_differs():
    # crafted instance: the stable matching is NOT min-cost —
    # stability and optimality are different solution concepts
    from geotile.queries import _hungarian

    cc = np.array([0, 10], np.int64)
    sc = np.array([1, 8], np.int64)
    cpref, spref = _gs_prefs(cc, sc)
    m = _gale_shapley(cpref, spref)
    stable_cost = sum(abs(int(cc[i]) - int(sc[j]))
                      for i, j in enumerate(m))
    cost = [[abs(int(a) - int(b)) for b in sc] for a in cc]
    assert stable_cost == _hungarian(cost) == 3
    # displacement pin: both customers prefer supplier 0? no —
    # verify no blocking pair exists by brute force
    for i in range(2):
        for j in range(2):
            if m[i] == j:
                continue
            i_pref = cpref[i].index(j) < cpref[i].index(m[i])
            cur = m.index(j) if j in m else -1
            j_pref = cur < 0 or spref[j].index(i) < spref[j].index(cur)
            assert not (i_pref and j_pref)


def test_gs_contested_supplier():
    # both customers closest to the same supplier: the supplier's own
    # preference decides, loser takes second choice
    cc = np.array([5, 6], np.int64)
    sc = np.array([5, 100], np.int64)
    cpref, spref = _gs_prefs(cc, sc)
    m = _gale_shapley(cpref, spref)
    assert m[0] == 0          # exact match wins (|5-5| < |6-5|)
    assert m[1] == 1


def test_oracle_parity_gs(ray_session):
    con = duckdb.connect()
    _cmp(QUERIES["gale_shapley_nations"](SF),
         con.execute(_gs_sql(SF)).df())


# -- rect union ------------------------------------------------------------------


def test_union_disjoint_and_identical():
    x0 = np.array([0, 10], np.int64)
    y0 = np.array([0, 10], np.int64)
    x1 = np.array([2, 12], np.int64)
    y1 = np.array([3, 13], np.int64)
    assert _union_area_sweep(x0, y0, x1, y1) == 6 + 6
    assert _union_area_grid(x0, y0, x1, y1) == 12
    # two identical rects: counted once
    x0 = np.array([0, 0], np.int64)
    y0 = np.array([0, 0], np.int64)
    x1 = np.array([5, 5], np.int64)
    y1 = np.array([4, 4], np.int64)
    assert _union_area_sweep(x0, y0, x1, y1) == 20
    assert _union_area_grid(x0, y0, x1, y1) == 20


def test_union_partial_overlap():
    # 2x2 squares offset by 1: union = 4 + 4 − 1
    x0 = np.array([0, 1], np.int64)
    y0 = np.array([0, 1], np.int64)
    x1 = np.array([2, 3], np.int64)
    y1 = np.array([2, 3], np.int64)
    assert _union_area_sweep(x0, y0, x1, y1) == 7
    assert _union_area_grid(x0, y0, x1, y1) == 7


def test_union_sweep_vs_grid_random():
    rng = np.random.default_rng(167)
    for _ in range(30):
        n = int(rng.integers(0, 15))
        x0 = rng.integers(0, 30, n).astype(np.int64)
        y0 = rng.integers(0, 30, n).astype(np.int64)
        x1 = x0 + rng.integers(1, 10, n)
        y1 = y0 + rng.integers(1, 10, n)
        assert _union_area_sweep(x0, y0, x1, y1) \
            == _union_area_grid(x0, y0, x1, y1)


def test_union_bounds():
    # union ≤ Σ areas; footprint helper is consistent
    ix = np.array([0, 100, 5000], np.int64)
    iy = np.array([0, 50, 5000], np.int64)
    x0, y0, x1, y1 = _rects_from_centers(ix, iy)
    u = _union_area_sweep(x0, y0, x1, y1)
    per = int((x1[0] - x0[0]) * (y1[0] - y0[0]))
    assert u <= 3 * per
    assert u > per            # not all coincident


def test_oracle_parity_rect(ray_session):
    con = duckdb.connect()
    _cmp(QUERIES["rect_union_cells"](SF),
         con.execute(_rect_sql(_image_dir_for(SF))).df())
