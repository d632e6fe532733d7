"""Per-cluster voxel morphology (the armatuur/hanging-object search).

Reference: src/upcp/fusion/cable_fuser.py:576-673 — voxelize a
cluster's neighborhood (:751-760), binary-dilate/erode the occupancy
grid, label connected regions per z-slice with scipy.ndimage, and test
region bounding boxes. scipy is not in this container, so dilation,
erosion and 2-D CC are implemented in pure NumPy (shift-stack
dilation; two-pass union-find CC) — same semantics, no external dep.

Spark strategy: clusters are bounded (a 50 m tile's worth of points at
most), so the whole morphology pass is one ``applyInPandas`` per
cluster — a grouped-map over the cluster id, embarrassingly parallel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)


def binary_dilate(grid: np.ndarray, iterations: int = 1) -> np.ndarray:
    """8-neighborhood binary dilation via shifted ORs (pure NumPy)."""
    g = grid.astype(bool, copy=True)
    for _ in range(iterations):
        padded = np.pad(g, 1, constant_values=False)
        acc = np.zeros_like(g)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                acc |= padded[1 + dx : 1 + dx + g.shape[0],
                              1 + dy : 1 + dy + g.shape[1]]
        g = acc
    return g


def binary_erode(grid: np.ndarray, iterations: int = 1) -> np.ndarray:
    """8-neighborhood binary erosion (dual of dilation)."""
    g = grid.astype(bool, copy=True)
    for _ in range(iterations):
        padded = np.pad(g, 1, constant_values=False)
        acc = np.ones_like(g)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                acc &= padded[1 + dx : 1 + dx + g.shape[0],
                              1 + dy : 1 + dy + g.shape[1]]
        g = acc
    return g


def label_regions(grid: np.ndarray) -> tuple[np.ndarray, int]:
    """2-D 8-connected component labelling (union-find; the scipy
    ndimage.label analog). Returns (labels, n_regions); 0 = background."""
    labels = np.zeros(grid.shape, dtype=np.int64)
    parent: dict[int, int] = {}

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    nxt = 1
    nx, ny = grid.shape
    for i in range(nx):
        for j in range(ny):
            if not grid[i, j]:
                continue
            nbs = []
            for di, dj in ((-1, -1), (-1, 0), (-1, 1), (0, -1)):
                a, b = i + di, j + dj
                if 0 <= a < nx and 0 <= b < ny and labels[a, b]:
                    nbs.append(find(int(labels[a, b])))
            if not nbs:
                labels[i, j] = nxt
                parent[nxt] = nxt
                nxt += 1
            else:
                m = min(nbs)
                labels[i, j] = m
                for r in nbs:
                    ra, rb = find(r), find(m)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    # second pass: canonicalize + densify ids
    remap: dict[int, int] = {}
    out_n = 0
    for i in range(nx):
        for j in range(ny):
            if labels[i, j]:
                r = find(int(labels[i, j]))
                if r not in remap:
                    out_n += 1
                    remap[r] = out_n
                labels[i, j] = remap[r]
    return labels, out_n


MORPH_SCHEMA = StructType(
    [
        StructField("component", LongType()),
        StructField("region", IntegerType()),
        StructField("n_voxels", LongType()),
        StructField("width_x", DoubleType()),
        StructField("width_y", DoubleType()),
    ]
)


def cluster_morphology(
    with_comp: DataFrame,
    voxel: float = 1.0,
    dilate: int = 1,
    erode: int = 1,
    comp_col: str = "component",
) -> DataFrame:
    """Per-cluster: voxelize occupancy, close (dilate then erode),
    label regions, report per-region voxel counts + extents —
    the armatuur-search skeleton (cable_fuser.py:576-673)."""

    def per_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        xs = np.floor(pdf["x"].to_numpy() / voxel).astype(int)
        ys = np.floor(pdf["y"].to_numpy() / voxel).astype(int)
        pad = dilate + erode  # margin so closing is not clipped at the
        x0, y0 = xs.min() - pad, ys.min() - pad  # cluster's bbox border
        grid = np.zeros(
            (xs.max() - x0 + 1 + pad, ys.max() - y0 + 1 + pad), dtype=bool
        )
        grid[xs - x0, ys - y0] = True
        closed = binary_erode(binary_dilate(grid, dilate), erode)
        labels, n = label_regions(closed)
        comp = int(pdf[comp_col].iloc[0])
        rows = []
        for r in range(1, n + 1):
            ii, jj = np.nonzero(labels == r)
            rows.append(
                (
                    comp, r, int(len(ii)),
                    float((ii.max() - ii.min() + 1) * voxel),
                    float((jj.max() - jj.min() + 1) * voxel),
                )
            )
        if not rows:
            rows.append((comp, 0, 0, 0.0, 0.0))
        return pd.DataFrame(
            rows, columns=["component", "region", "n_voxels", "width_x", "width_y"]
        )

    return with_comp.groupBy(comp_col).applyInPandas(
        per_cluster, schema=MORPH_SCHEMA
    )
