"""RegionGrowing semantics on a hand-built two-plane fixture.

Reference behavior re-created (region_growing.py:15-170): seeds grow
across a smooth low-angle surface, are blocked where the normal angle
exceeds threshold_angle, and cannot pass THROUGH high-curvature
(rough) voxels although those may join the region as frontier.
"""

from __future__ import annotations

import pytest

from urban_pointcloud_processing_spark.operators.region_growing import (
    region_grow,
    voxel_normals,
)


def _plane_points(spark, seed_x_max=5.0):
    """3 voxel-columns wide in y, 12 in x (voxel=5): flat plane for
    x<30, 45-degree ramp for x>=30, rough voxel column at x in [20,25).
    4x4 grid of points per 5m voxel footprint => n=16 per column."""
    rows = []
    pid = 0
    for gx in range(48):          # x = gx * 1.25 in [0, 60)
        for gy in range(12):      # y = gy * 1.25 in [0, 15)
            x = gx * 1.25 + 0.5
            y = gy * 1.25 + 0.5
            if x < 30.0:
                z = 2.0
            else:
                z = 2.0 + (x - 30.0)  # 45-degree ramp: blocked
            if 20.0 <= x < 25.0:
                # deterministic rough jitter, +-2 m (double-mod scramble:
                # a single mod of the sequential pid is near-affine per
                # voxel and would fit the plane perfectly)
                z += (((pid * 2654435761) % 1000003) % 4001 - 2000) / 1000.0
            rows.append((pid, x, y, z, x < seed_x_max))
            pid += 1
    return spark.createDataFrame(rows, ["page_id", "x", "y", "z", "is_seed"])


def test_voxel_normals_flat_plane(spark):
    df = _plane_points(spark)
    vox = voxel_normals(df).filter("vx < 4").collect()
    assert vox, "flat zone should produce voxels with normals"
    for r in vox:
        # flat plane: normal is +z, curvature 0
        assert r["nx"] == 0.0 and r["ny"] == 0.0 and r["nz"] > 0
        assert r["curv"] == 0.0


def test_region_grow_gates(spark):
    df = _plane_points(spark)
    got = {r["page_id"]: r["grown"] for r in region_grow(df).collect()}
    pts = df.collect()
    for r in pts:
        if r["x"] < 20.0:
            assert got[r["page_id"]], f"smooth flat zone must grow (x={r['x']})"
        elif 25.0 <= r["x"] < 30.0:
            # beyond the rough column: unreachable (curvature gate)
            assert not got[r["page_id"]], (
                f"growth must not pass through the rough column (x={r['x']})"
            )
        elif r["x"] >= 35.0:
            # well inside the 45-degree ramp: angle gate blocks
            assert not got[r["page_id"]], (
                f"45-degree ramp must not grow (x={r['x']})"
            )


def test_region_grow_no_seeds_grows_nothing(spark):
    df = _plane_points(spark, seed_x_max=-1.0)
    grown = region_grow(df).filter("grown").count()
    assert grown == 0


def test_unsupported_voxel_points_blocked(spark):
    # 3 collinear points: degenerate xy spread -> det == 0 -> no normal
    rows = [(0, 1.0, 1.0, 0.0, True), (1, 2.0, 1.0, 0.0, False),
            (2, 3.0, 1.0, 0.0, False), (3, 4.0, 1.0, 0.0, False)]
    df = spark.createDataFrame(rows, ["page_id", "x", "y", "z", "is_seed"])
    assert voxel_normals(df).count() == 0
    got = {r["page_id"]: r["grown"] for r in region_grow(df).collect()}
    # seed voxel itself is always accepted; nothing else can be reached
    assert got[0] and got[1] and got[2] and got[3]  # all in the one seed voxel
