"""Concave hull (alpha shape) per cluster — scipy-free.

Reference: src/upcp/utils/alpha_shape_utils.py:11-202 — Delaunay
triangulation, keep triangles whose circumradius < 1/alpha, boundary
edges are those used by exactly one kept triangle, then assemble edge
chains into polygons (the algorithm is public: stackoverflow.com/a/
50159452, CC BY-SA 4.0, cited by the reference itself). scipy is not
in this container, so the Delaunay step is an incremental
Bowyer–Watson in pure NumPy — O(n²) per cluster, fine because clusters
are bounded (a 50 m tile's worth at most; same batch shape the
reference runs per cluster).

Spark strategy: one ``applyInPandas`` per component; output is one row
per hull polygon with vertex count, area (shoelace) and the
largest-polygon argmax flag (reference alpha_shape_utils.py:179-180 —
downstream pipelines keep the biggest outer ring).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)


def _circumcircle(pa, pb, pc):
    """(center, radius²) of the triangle circumcircle; radius² = inf
    for (near-)collinear triangles."""
    ax, ay = pa
    bx, by = pb
    cx, cy = pc
    d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
    if abs(d) < 1e-12:
        return (0.0, 0.0), np.inf
    ux = (
        (ax * ax + ay * ay) * (by - cy)
        + (bx * bx + by * by) * (cy - ay)
        + (cx * cx + cy * cy) * (ay - by)
    ) / d
    uy = (
        (ax * ax + ay * ay) * (cx - bx)
        + (bx * bx + by * by) * (ax - cx)
        + (cx * cx + cy * cy) * (bx - ax)
    ) / d
    r2 = (ax - ux) ** 2 + (ay - uy) ** 2
    return (ux, uy), r2


def delaunay_triangles(pts: np.ndarray) -> list[tuple[int, int, int]]:
    """Bowyer–Watson incremental Delaunay over (n, 2) points. Returns
    triangles as index triples into ``pts``. Pure NumPy/Python —
    O(n²) with small constants; meant for bounded per-cluster sets."""
    n = len(pts)
    if n < 3:
        return []
    # super-triangle far outside the data
    cx, cy = pts.mean(axis=0)
    m = max(pts[:, 0].ptp(), pts[:, 1].ptp(), 1.0) * 100.0
    sup = np.array(
        [[cx - 20 * m, cy - m], [cx + 20 * m, cy - m], [cx, cy + 20 * m]]
    )
    allp = np.vstack([pts, sup])
    si = [n, n + 1, n + 2]
    tris: list[tuple[int, int, int]] = [tuple(si)]
    cc = {tuple(si): _circumcircle(*allp[list(si)])}
    for p in range(n):
        px, py = allp[p]
        bad = []
        for t in tris:
            (ux, uy), r2 = cc[t]
            if (px - ux) ** 2 + (py - uy) ** 2 <= r2:
                bad.append(t)
        # boundary of the cavity = edges used by exactly one bad tri
        edge_count: dict[tuple[int, int], int] = {}
        for t in bad:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                k = (min(e), max(e))
                edge_count[k] = edge_count.get(k, 0) + 1
        for t in bad:
            tris.remove(t)
            del cc[t]
        for (a, b), cnt in edge_count.items():
            if cnt == 1:
                nt = (a, b, p)
                tris.append(nt)
                cc[nt] = _circumcircle(allp[a], allp[b], allp[p])
    out = [t for t in tris if all(i < n for i in t)]
    return out


def alpha_shape_polys(
    xy: np.ndarray, alpha: float = 1.0
) -> list[np.ndarray]:
    """Concave hull rings (each (k, 2), closed implicitly) of a point
    set: triangles with circumradius < 1/alpha are kept; edges used by
    exactly one kept triangle form the boundary; chains assemble into
    rings (reference alpha_shape + generate_poly_from_edges)."""
    pts = np.unique(xy.astype(float), axis=0)
    if len(pts) < 4:
        return []  # reference asserts >= 4 points (alpha_shape_utils.py:50)
    r_max2 = np.inf if alpha <= 0 else (1.0 / alpha) ** 2
    kept = [
        t
        for t in delaunay_triangles(pts)
        if _circumcircle(pts[t[0]], pts[t[1]], pts[t[2]])[1] < r_max2
    ]
    edge_count: dict[tuple[int, int], int] = {}
    for t in kept:
        for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
            k = (min(e), max(e))
            edge_count[k] = edge_count.get(k, 0) + 1
    boundary = [e for e, cnt in edge_count.items() if cnt == 1]
    # assemble chains: adjacency walk with smallest-index start for
    # determinism
    adj: dict[int, list[int]] = {}
    for a, b in boundary:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    unused = {tuple(sorted(e)) for e in boundary}
    rings = []
    while unused:
        start = min(min(e) for e in unused)
        ring = [start]
        cur, prev = start, -1
        while True:
            nxts = [
                v for v in sorted(adj[cur])
                if tuple(sorted((cur, v))) in unused
            ]
            if not nxts:
                break
            nxt = nxts[0]
            unused.discard(tuple(sorted((cur, nxt))))
            if nxt == start:
                break
            ring.append(nxt)
            prev, cur = cur, nxt
        if len(ring) >= 3:
            rings.append(pts[ring])
    return rings


def _ring_area(ring: np.ndarray) -> float:
    if len(ring) < 3:
        return 0.0
    x, y = ring[:, 0], ring[:, 1]
    return float(
        abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))) / 2.0
    )


ALPHA_SCHEMA = StructType(
    [
        StructField("component", LongType()),
        StructField("poly_idx", IntegerType()),
        StructField("n_vertices", IntegerType()),
        StructField("area", DoubleType()),
        StructField("is_largest", BooleanType()),
    ]
)


def cluster_alpha_shape(
    with_comp: DataFrame,
    alpha: float = 1.0,
    comp_col: str = "component",
) -> DataFrame:
    """Per-component concave hull polygons + the biggest-polygon argmax
    (reference keeps the largest outer ring, alpha_shape_utils.py:
    179-180). Grouped-map NumPy; one row per hull polygon."""

    def per_comp(pdf: pd.DataFrame) -> pd.DataFrame:
        comp = int(pdf[comp_col].iloc[0])
        rings = alpha_shape_polys(
            pdf[["x", "y"]].to_numpy(dtype=float), alpha
        )
        rows = []
        areas = [_ring_area(r) for r in rings]
        big = int(np.argmax(areas)) if areas else -1
        for i, (r, a) in enumerate(zip(rings, areas)):
            rows.append((comp, i, int(len(r)), round(a, 6), i == big))
        if not rows:
            rows.append((comp, -1, int(len(pdf)), 0.0, False))
        return pd.DataFrame(
            rows,
            columns=["component", "poly_idx", "n_vertices", "area",
                     "is_largest"],
        )

    return with_comp.groupBy(comp_col).applyInPandas(
        per_comp, schema=ALPHA_SCHEMA
    )
