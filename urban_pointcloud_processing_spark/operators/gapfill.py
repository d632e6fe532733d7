"""Per-tile raster gap filling.

Reference: src/upcp/utils/ahn_utils.py:346-456 — `fill_gaps` (scipy
griddata over gap regions ≤ max_gap_size) and `fill_gaps_intuitive`
(iterative 3×3 nanmean dilation). scipy is not in this container, so
the engine implements the *intuitive* variant in pure NumPy: each
round, every NULL cell with ≥1 known 8-neighbor becomes the mean of
its known neighbors; `max_rounds` bounds how deep into a gap the fill
reaches (the reference's max_gap_size analog).

Spark strategy: grids are per-tile bounded (500×500 in the reference),
so the fill is a grouped-map `applyInPandas` per tilecode — one NumPy
batch per tile, no driver collect, embarrassingly parallel across
tiles. Deterministic: the per-cell mean divides an np.nansum by a
count, both reductions over a fixed 8-slot stencil order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FILLED_SCHEMA = StructType(
    [
        StructField("tilecode", StringType()),
        StructField("gx", LongType()),
        StructField("gy", LongType()),
        StructField("building_z", DoubleType()),
        StructField("was_gap", BooleanType()),
        StructField("filled", BooleanType()),
    ]
)


def fill_grid(grid: np.ndarray, max_rounds: int = 2) -> np.ndarray:
    """Iterative 3×3 neighbor-mean fill of NaN cells (pure NumPy,
    reference fill_gaps_intuitive semantics)."""
    g = grid.astype(np.float64, copy=True)
    for _ in range(max_rounds):
        isnan = np.isnan(g)
        if not isnan.any():
            break
        padded = np.pad(g, 1, constant_values=np.nan)
        stacks = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                stacks.append(
                    padded[1 + dx : 1 + dx + g.shape[0],
                           1 + dy : 1 + dy + g.shape[1]]
                )
        neigh = np.stack(stacks)
        counts = np.sum(~np.isnan(neigh), axis=0)
        sums = np.nansum(neigh, axis=0)
        fillable = isnan & (counts > 0)
        g[fillable] = sums[fillable] / counts[fillable]
    return g


def fill_grid_linear(grid: np.ndarray, max_gap: int = 6) -> np.ndarray:
    """Separable linear interpolation fill (the scipy-free analog of
    reference fill_gaps' griddata(method='linear'), ahn_utils.py:
    346-400): every NaN cell whose nearest valid anchors along a row or
    column span ≤ max_gap cells gets the distance-weighted linear
    value; where both row and column estimates exist they average.
    Gaps wider than max_gap stay NaN (the reference's max_gap_size
    region gate)."""
    g = grid.astype(np.float64, copy=True)

    def axis_fill(a: np.ndarray) -> np.ndarray:
        out = np.full_like(a, np.nan)
        for i in range(a.shape[0]):
            row = a[i]
            valid = np.where(~np.isnan(row))[0]
            if len(valid) < 2:
                continue
            nan_idx = np.where(np.isnan(row))[0]
            inside = nan_idx[(nan_idx > valid[0]) & (nan_idx < valid[-1])]
            if len(inside) == 0:
                continue
            left = valid[np.searchsorted(valid, inside) - 1]
            right = valid[np.searchsorted(valid, inside)]
            ok = (right - left) <= max_gap
            li, ri, ii = left[ok], right[ok], inside[ok]
            t = (ii - li) / (ri - li)
            out[i, ii] = row[li] * (1.0 - t) + row[ri] * t
        return out

    rows = axis_fill(g)
    cols = axis_fill(g.T).T
    est = np.stack([rows, cols])
    counts = np.sum(~np.isnan(est), axis=0)
    # all-NaN stacks stay NaN without the nanmean empty-slice warning
    both = np.where(counts > 0, np.nansum(est, axis=0) / np.maximum(counts, 1),
                    np.nan)
    fillable = np.isnan(g) & ~np.isnan(both)
    g[fillable] = both[fillable]
    return g


def fill_grid_cubic(grid: np.ndarray, max_gap: int = 6) -> np.ndarray:
    """Separable cubic (Catmull–Rom) interpolation fill — the
    griddata(method='cubic') analog (reference ahn_utils.py:346-400):
    like fill_grid_linear but each in-gap cell interpolates through the
    four nearest valid anchors (two per side) with the Catmull–Rom
    basis, falling back to linear where only one anchor exists on a
    side. Same max_gap region gate."""
    g = grid.astype(np.float64, copy=True)

    def axis_fill(a: np.ndarray) -> np.ndarray:
        out = np.full_like(a, np.nan)
        for i in range(a.shape[0]):
            row = a[i]
            valid = np.where(~np.isnan(row))[0]
            if len(valid) < 2:
                continue
            nan_idx = np.where(np.isnan(row))[0]
            inside = nan_idx[(nan_idx > valid[0]) & (nan_idx < valid[-1])]
            for j in inside:
                r = int(np.searchsorted(valid, j))
                i1, i2 = valid[r - 1], valid[r]
                if i2 - i1 > max_gap:
                    continue
                t = (j - i1) / (i2 - i1)
                p1, p2 = row[i1], row[i2]
                # outer anchors (Catmull-Rom); duplicate ends if absent
                p0 = row[valid[r - 2]] if r - 2 >= 0 else p1
                p3 = row[valid[r + 1]] if r + 1 < len(valid) else p2
                out[i, j] = 0.5 * (
                    (2.0 * p1)
                    + (-p0 + p2) * t
                    + (2.0 * p0 - 5.0 * p1 + 4.0 * p2 - p3) * t * t
                    + (-p0 + 3.0 * p1 - 3.0 * p2 + p3) * t * t * t
                )
        return out

    rows = axis_fill(g)
    cols = axis_fill(g.T).T
    est = np.stack([rows, cols])
    counts = np.sum(~np.isnan(est), axis=0)
    both = np.where(counts > 0, np.nansum(est, axis=0) / np.maximum(counts, 1),
                    np.nan)
    fillable = np.isnan(g) & ~np.isnan(both)
    g[fillable] = both[fillable]
    return g


def fill_building_gaps(raster: DataFrame, max_rounds: int = 2) -> DataFrame:
    """Grouped-map gap fill of the building surface per tile."""

    def per_tile(pdf: pd.DataFrame) -> pd.DataFrame:
        gx0, gy0 = int(pdf["gx"].min()), int(pdf["gy"].min())
        nx = int(pdf["gx"].max()) - gx0 + 1
        ny = int(pdf["gy"].max()) - gy0 + 1
        grid = np.full((nx, ny), np.nan)
        ix = pdf["gx"].to_numpy(dtype=int) - gx0
        iy = pdf["gy"].to_numpy(dtype=int) - gy0
        vals = pdf["building_z"].to_numpy(dtype=np.float64)
        grid[ix, iy] = vals
        was_gap = np.isnan(vals)
        filled_grid = fill_grid(grid, max_rounds)
        out_vals = filled_grid[ix, iy]
        return pd.DataFrame(
            {
                "tilecode": pdf["tilecode"],
                "gx": pdf["gx"].astype("int64"),
                "gy": pdf["gy"].astype("int64"),
                "building_z": out_vals,
                "was_gap": was_gap,
                "filled": was_gap & ~np.isnan(out_vals),
            }
        )

    return raster.select(
        "tilecode",
        F.col("gx").cast("long").alias("gx"),
        F.col("gy").cast("long").alias("gy"),
        "building_z",
    ).groupBy("tilecode").applyInPandas(per_tile, schema=FILLED_SCHEMA)


def fill_building_gaps_linear(raster: DataFrame, max_gap: int = 6) -> DataFrame:
    """Grouped-map LINEAR gap fill per tile (fill_grid_linear)."""

    def per_tile(pdf: pd.DataFrame) -> pd.DataFrame:
        gx0, gy0 = int(pdf["gx"].min()), int(pdf["gy"].min())
        nx = int(pdf["gx"].max()) - gx0 + 1
        ny = int(pdf["gy"].max()) - gy0 + 1
        grid = np.full((nx, ny), np.nan)
        ix = pdf["gx"].to_numpy(dtype=int) - gx0
        iy = pdf["gy"].to_numpy(dtype=int) - gy0
        vals = pdf["building_z"].to_numpy(dtype=np.float64)
        grid[ix, iy] = vals
        was_gap = np.isnan(vals)
        filled_grid = fill_grid_linear(grid, max_gap)
        out_vals = filled_grid[ix, iy]
        return pd.DataFrame(
            {
                "tilecode": pdf["tilecode"],
                "gx": pdf["gx"].astype("int64"),
                "gy": pdf["gy"].astype("int64"),
                "building_z": out_vals,
                "was_gap": was_gap,
                "filled": was_gap & ~np.isnan(out_vals),
            }
        )

    return raster.select(
        "tilecode",
        F.col("gx").cast("long").alias("gx"),
        F.col("gy").cast("long").alias("gy"),
        "building_z",
    ).groupBy("tilecode").applyInPandas(per_tile, schema=FILLED_SCHEMA)
