"""Clip-family selection predicates (the reference's WHERE clauses).

Reference: numba kernels in src/upcp/utils/clip_utils.py —
rectangle_clip (:22-40), box_clip (:43-65), circle_clip (:68-89),
cylinder_clip (:92-116). Here each is a plain Column predicate:
Catalyst pushes them into the parquet scan and whole-stage codegen
evaluates them JVM-side — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def rectangle_clip(x: Column, y: Column,
                   x_min: float, y_min: float, x_max: float, y_max: float) -> Column:
    return (x >= F.lit(x_min)) & (x <= F.lit(x_max)) & \
           (y >= F.lit(y_min)) & (y <= F.lit(y_max))


def box_clip(x: Column, y: Column, z: Column,
             x_min: float, y_min: float, x_max: float, y_max: float,
             bottom: float, top: float) -> Column:
    return rectangle_clip(x, y, x_min, y_min, x_max, y_max) & \
           (z >= F.lit(bottom)) & (z <= F.lit(top))


def circle_clip(x: Column, y: Column, cx: float, cy: float, radius: float) -> Column:
    dx, dy = x - F.lit(cx), y - F.lit(cy)
    return dx * dx + dy * dy <= F.lit(radius * radius)


def cylinder_clip(x: Column, y: Column, z: Column,
                  cx: float, cy: float, radius: float,
                  bottom: float, top: float) -> Column:
    return circle_clip(x, y, cx, cy, radius) & \
           (z >= F.lit(bottom)) & (z <= F.lit(top))
