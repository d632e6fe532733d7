"""Property-based tests (hypothesis) for the round-3 deterministic
kernels — the pure-NumPy/Python functions whose SQL oracles mirror
them op-for-op. No Spark session needed; these check the *semantic*
invariants that the oracle-parity harness cannot (it only proves both
engines agree)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from urban_pointcloud_processing_spark.operators.alpha_shape import (
    _loop_area,
    alpha_shape_loops,
)
from urban_pointcloud_processing_spark.operators.gapfill import (
    smoothen_edges_grid,
)
from urban_pointcloud_processing_spark.operators.morphology import (
    _binned_line,
)

# small integer-lattice point clouds: dedup-friendly, degenerate-rich
points_strategy = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)),
    min_size=4, max_size=40,
)


@settings(max_examples=60, deadline=None)
@given(points_strategy)
def test_alpha_loops_are_simple_even_degree_cycles(pts):
    """Every boundary loop is a simple cycle (no repeated vertex), the
    loops partition the boundary edges, and every boundary vertex has
    even degree — the planar invariants the fan-pairing walk relies
    on."""
    xy = np.array(pts, dtype=float)
    p, loops = alpha_shape_loops(xy, alpha=0.6)
    all_edges = []
    for key, idx in loops:
        assert len(idx) >= 3
        assert len(set(idx)) == len(idx), "loop revisits a vertex"
        k = len(idx)
        edges = {tuple(sorted((idx[i], idx[(i + 1) % k]))) for i in range(k)}
        assert len(edges) == k, "loop repeats an edge"
        all_edges.append(edges)
        assert _loop_area(idx, p) >= 0.0
        # loop_key is the minimal edge of the loop
        assert min(edges) == key
    # loops are edge-disjoint
    flat = [e for s in all_edges for e in s]
    assert len(flat) == len(set(flat)), "two loops share an edge"


@settings(max_examples=60, deadline=None)
@given(points_strategy)
def test_alpha_loops_match_boundary_edge_set(pts):
    """The union of walked loop edges equals the boundary-edge set of
    the alpha complex (edges used by exactly one kept triangle)."""
    from urban_pointcloud_processing_spark.operators.alpha_shape import (
        _circumcircle,
        delaunay_triangles,
    )

    xy = np.array(pts, dtype=float)
    p, loops = alpha_shape_loops(xy, alpha=0.6)
    if len(p) < 4:
        assert loops == []
        return
    rmax2 = (1.0 / 0.6) * (1.0 / 0.6)
    kept = []
    for t in delaunay_triangles(p):
        ts = (min(t), sorted(t)[1], max(t))
        if _circumcircle(p[ts[0]], p[ts[1]], p[ts[2]])[1] < rmax2:
            kept.append(ts)
    counts: dict[tuple[int, int], int] = {}
    for t in kept:
        for e in ((t[0], t[1]), (t[1], t[2]), (t[0], t[2])):
            k = (min(e), max(e))
            counts[k] = counts.get(k, 0) + 1
    boundary = {e for e, c in counts.items() if c == 1}
    walked = set()
    for _, idx in loops:
        k = len(idx)
        for i in range(k):
            walked.add(tuple(sorted((idx[i], idx[(i + 1) % k]))))
    if loops:  # engine bails (returns []) only on degenerate fans
        assert walked == boundary


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.floats(-50, 50), min_size=2, max_size=60),
    st.lists(st.floats(-5, 5), min_size=2, max_size=60),
)
def test_binned_line_tracks_np_interp(ts, vs):
    """The deterministic binned-line fit agrees with the
    np.interp-based original to within the µm quantization error."""
    n = min(len(ts), len(vs))
    tc = np.array(ts[:n], dtype=float)
    vc = np.array(vs[:n], dtype=float)
    at = _binned_line(tc, vc, binwidth=2.0)
    # rebuild reference bins exactly, then compare vs np.interp
    t0 = float(tc.min())
    idx = np.floor((tc - t0) / 2.0).astype(np.int64)
    nb = int(idx.max()) + 1
    sums = np.bincount(idx, weights=vc, minlength=nb)
    cnts = np.bincount(idx, minlength=nb)
    ok = cnts > 0
    centers = t0 + (np.arange(nb)[ok] + 0.5) * 2.0
    means = sums[ok] / cnts[ok]
    probe = np.linspace(tc.min() - 1.0, tc.max() + 1.0, 23)
    got = at(probe)
    want = np.interp(probe, centers, means)
    assert np.all(np.abs(got - want) < 1e-5)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.lists(st.one_of(st.none(), st.integers(-50, 50)),
                 min_size=3, max_size=8),
        min_size=3, max_size=8,
    )
)
def test_smoothen_edges_only_touches_border_gaps(rows):
    """Valid cells are never modified; a NaN cell changes iff it is at
    Manhattan distance ≤ 1 from a valid cell AND has ≥ 1 valid
    8-neighbor."""
    w = min(len(r) for r in rows)
    g = np.array(
        [[np.nan if v is None else v / 4.0 for v in r[:w]] for r in rows],
        dtype=float,
    )
    out = smoothen_edges_grid(g, thickness=1)
    nx, ny = g.shape
    for i in range(nx):
        for j in range(ny):
            if not np.isnan(g[i, j]):
                assert out[i, j] == g[i, j]
                continue
            near = any(
                0 <= i + di < nx and 0 <= j + dj < ny
                and not np.isnan(g[i + di, j + dj])
                for di, dj in ((-1, 0), (1, 0), (0, -1), (0, 1))
            )
            nbr = any(
                0 <= i + di < nx and 0 <= j + dj < ny
                and not np.isnan(g[i + di, j + dj])
                for di in (-1, 0, 1) for dj in (-1, 0, 1)
                if (di, dj) != (0, 0)
            )
            if near and nbr:
                assert not np.isnan(out[i, j])
            else:
                assert np.isnan(out[i, j])


def test_armatuur_direction_matches_eigh():
    """The closed-form integer-moment principal direction agrees with
    np.linalg.eigh (up to sign) on random non-degenerate clusters."""
    rng = np.random.RandomState(7)
    for _ in range(50):
        n = rng.randint(3, 200)
        ang = rng.uniform(0, np.pi)
        d = np.array([np.cos(ang), np.sin(ang)])
        t = rng.uniform(-20, 20, n)
        noise = rng.normal(0, 0.3, (n, 2))
        xy = np.outer(t, d) + noise
        # engine recipe (mirrors morphology.per_cluster)
        xm = np.round(xy[:, 0] * 1000.0)
        ym = np.round(xy[:, 1] * 1000.0)
        minx, miny = float(xm.min()), float(ym.min())
        dxq, dyq = xm - minx, ym - miny
        nn = float(n)
        sx, sy = float(dxq.sum()), float(dyq.sum())
        sxx = float((dxq * dxq).sum())
        syy = float((dyq * dyq).sum())
        sxy = float((dxq * dyq).sum())
        a = (sxx - sx * sx / nn) / nn / 1e6
        cc = (syy - sy * sy / nn) / nn / 1e6
        b = (sxy - sx * sy / nn) / nn / 1e6
        lam1 = ((a + cc) + np.sqrt((a - cc) * (a - cc) + 4.0 * b * b)) / 2.0
        if b != 0.0:
            vx, vy = b, lam1 - a
        elif a >= cc:
            vx, vy = 1.0, 0.0
        else:
            vx, vy = 0.0, 1.0
        nrm = np.sqrt(vx * vx + vy * vy)
        got = np.array([vx / nrm, vy / nrm])
        cov = np.cov(xy.T, bias=True)
        w, v = np.linalg.eigh(cov)
        want = v[:, int(np.argmax(w))]
        assert abs(abs(got @ want) - 1.0) < 1e-6
