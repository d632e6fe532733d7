"""Cable-cluster merging (reference _cable_merging,
src/upcp/fusion/cable_fuser.py:333-389; merge condition :247-273,
catenary gap test :275-315, box test :317-331).

Reference semantics: iteratively merge cable cluster pairs whose
principal directions align (angle < max_angle), whose nearest
endpoints are close (< max_gap), and whose combined points still fit a
hanging-cable curve; repeat to fixpoint. The reference fits the exact
catenary `a + c*cosh((x−b)/c)` with scipy curve_fit; scipy is absent
here, so ``catenary_fit`` is a self-contained Gauss-Newton (with
Levenberg damping) on the same model — parabola-seeded, fixed
iteration budget, pure NumPy — falling back to the small-sag parabola
only when the nonlinear fit cannot improve on it.

Spark strategy: clusters are few per tile (the reference loops them on
one core), so merging is a grouped-map ``applyInPandas`` per tile —
the per-group fixpoint is bounded by the handful of clusters a 50 m
tile can hold.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def _principal(xy: np.ndarray) -> np.ndarray:
    """Unit principal direction of a 2-D point set (largest eigvec)."""
    c = xy - xy.mean(axis=0)
    cov = c.T @ c / len(xy)
    w, v = np.linalg.eigh(cov)
    d = v[:, int(np.argmax(w))]
    return d / (np.linalg.norm(d) or 1.0)


def _endpoints(xy: np.ndarray, d: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    t = xy @ d
    return xy[int(np.argmin(t))], xy[int(np.argmax(t))]


def _parabola_rmse(t: np.ndarray, z: np.ndarray) -> float:
    coef = np.polyfit(t, z, 2)
    return float(np.sqrt(np.mean((np.polyval(coef, t) - z) ** 2)))


def catenary_fit(
    t: np.ndarray, z: np.ndarray, max_iter: int = 60, tol: float = 1e-12
) -> tuple[float, float, float, float]:
    """Least-squares fit of z = a + c·cosh((t−b)/c) (reference
    catenary_func, src/upcp/utils/math_utils.py + cable_fuser.py:
    275-315 curve_fit call). Gauss-Newton with Levenberg damping,
    parabola-seeded:

    near the vertex z ≈ (a+c) + (t−b)²/(2c), so the quadratic
    coefficient q2 seeds c₀ = 1/(2·q2) and the vertex seeds b₀/a₀.
    Returns (a, b, c, rmse). Deterministic (fixed seeds, fixed
    iteration budget); raises no warnings — a degenerate/diverging fit
    just returns its best-so-far parameters."""
    t = np.asarray(t, dtype=float)
    z = np.asarray(z, dtype=float)
    q = np.polyfit(t, z, 2)
    if q[0] > 1e-12:
        c = 1.0 / (2.0 * q[0])
        b = -q[1] / (2.0 * q[0])
    else:
        c = max(np.ptp(t), 1.0) * 100.0  # near-straight: huge radius
        b = float(t.mean())
    a = float(np.min(z)) - c
    params = np.array([a, b, c], dtype=float)
    lam = 1e-3

    def residuals(p):
        u = (t - p[1]) / p[2]
        # clip to keep cosh finite during wild damping steps
        u = np.clip(u, -300.0, 300.0)
        return p[0] + p[2] * np.cosh(u) - z, u

    r, u = residuals(params)
    sse = float(r @ r)
    for _ in range(max_iter):
        sh, ch = np.sinh(u), np.cosh(u)
        J = np.column_stack([np.ones_like(u), -sh, ch - u * sh])
        g = J.T @ r
        H = J.T @ J
        try:
            step = np.linalg.solve(H + lam * np.diag(np.diag(H)), g)
        except np.linalg.LinAlgError:
            break
        trial = params - step
        if trial[2] <= 1e-9:  # c must stay positive
            lam *= 10.0
            continue
        r_new, u_new = residuals(trial)
        sse_new = float(r_new @ r_new)
        if sse_new < sse:
            improvement = sse - sse_new
            params, r, u, sse = trial, r_new, u_new, sse_new
            lam = max(lam / 10.0, 1e-12)
            if improvement < tol * max(sse, 1.0):
                break
        else:
            lam *= 10.0
            if lam > 1e12:
                break
    rmse = float(np.sqrt(sse / len(t)))
    return float(params[0]), float(params[1]), float(params[2]), rmse


def _pair_mergeable(
    a: np.ndarray, az: np.ndarray, b: np.ndarray, bz: np.ndarray,
    max_angle_deg: float, max_gap: float, max_rmse: float,
) -> bool:
    da, db = _principal(a), _principal(b)
    cosang = abs(float(np.clip(da @ db, -1.0, 1.0)))
    if np.degrees(np.arccos(cosang)) > max_angle_deg:
        return False
    ea = _endpoints(a, da)
    eb = _endpoints(b, db)
    gap = min(np.linalg.norm(p - q) for p in ea for q in eb)
    if gap > max_gap:
        return False
    # exact catenary fit over the merged span (parabola fallback for
    # the fit seed lives inside catenary_fit)
    xy = np.vstack([a, b])
    z = np.concatenate([az, bz])
    d = _principal(xy)
    t = xy @ d
    if len(t) < 3 or np.ptp(t) < 1e-9:
        return True
    _, _, _, rmse = catenary_fit(t, z)
    return min(rmse, _parabola_rmse(t, z)) <= max_rmse


def merge_clusters_np(
    pdf: pd.DataFrame,
    max_angle_deg: float,
    max_gap: float,
    max_rmse: float,
    cluster_col: str = "cluster_id",
) -> dict[int, int]:
    """Fixpoint pairwise merge within one group; returns
    cluster_id → merged_id (min id of the merged set)."""
    groups: dict[int, list[int]] = {}
    for cid in pdf[cluster_col].unique():
        groups[int(cid)] = [int(cid)]
    pts = {
        int(cid): (
            pdf.loc[pdf[cluster_col] == cid, ["x", "y"]].to_numpy(float),
            pdf.loc[pdf[cluster_col] == cid, "z"].to_numpy(float),
        )
        for cid in groups
    }
    changed = True
    while changed:
        changed = False
        ids = sorted(groups)
        for i, ca in enumerate(ids):
            if ca not in groups:
                continue
            for cb in ids[i + 1:]:
                if cb not in groups or ca not in groups:
                    continue
                a, az = pts[ca]
                b, bz = pts[cb]
                if _pair_mergeable(a, az, b, bz, max_angle_deg, max_gap, max_rmse):
                    pts[ca] = (np.vstack([a, b]), np.concatenate([az, bz]))
                    groups[ca].extend(groups.pop(cb))
                    del pts[cb]
                    changed = True
    out = {}
    for root, members in groups.items():
        target = min(members)
        for m in members:
            out[m] = target
    return out


def merge_cables(
    clustered: DataFrame,
    max_angle_deg: float = 15.0,
    max_gap: float = 10.0,
    max_rmse: float = 0.5,
    group_col: str | None = "tile_x",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """(cluster_id, merged_id) per group (tile at scale; pass
    group_col=None for a single group on small inputs)."""
    schema = StructType(
        [
            StructField("cluster_id", LongType()),
            StructField("merged_id", LongType()),
        ]
    )

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        mapping = merge_clusters_np(
            pdf, max_angle_deg, max_gap, max_rmse, cluster_col
        )
        return pd.DataFrame(
            {"cluster_id": list(mapping), "merged_id": list(mapping.values())}
        )

    if group_col is None:
        clustered = clustered.withColumn("_g", F.lit(0))
        group_col = "_g"
    return clustered.groupBy(group_col).applyInPandas(per_group, schema=schema)
