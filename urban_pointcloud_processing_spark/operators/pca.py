"""Per-cell PCA shape features (the cable fuser's candidate detector).

Reference: src/upcp/fusion/cable_fuser.py:133-149 computes per-voxel
covariance eigen-decompositions (via Open3D) and keeps "linear" voxels
(λ1 ≫ λ2) as cable candidates.

Spark-first re-expression, fully oracle-exact:
- Coordinates are exact millimetre integers (the geocode grid), so the
  covariance moments are computed as BIGINT sums of CENTERED products
  (two-pass: per-cell minimum first, then Σdx, Σdx², Σdx·dy … —
  centering keeps every product < 2^63, and integer sums are
  order-independent, SURVEY.md §7.3 item 1).
- The 2×2 eigenvalues are closed-form:
      λ = ((cxx+cyy) ± sqrt((cxx−cyy)² + 4·cxy²)) / 2
  sqrt is correctly rounded in IEEE-754, so doubles match DuckDB
  bit-for-bit. (atan2-based orientation is deliberately NOT in the
  compared output — libm atan2 is not cross-engine reproducible.)
- linearity = (λ1 − λ2) / λ1, the reference's cable-ness score.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mm(c):
    return F.round(c * F.lit(1000.0)).cast("long")


def pca_cell_features(pages: DataFrame, res: float = 5.0,
                      min_points: int = 3) -> DataFrame:
    cell_x = F.floor(F.col("x") / F.lit(res)).cast("long")
    cell_y = F.floor(F.col("y") / F.lit(res)).cast("long")
    pts = pages.select(
        cell_x.alias("cell_x"), cell_y.alias("cell_y"),
        _mm(F.col("x")).alias("x_mm"), _mm(F.col("y")).alias("y_mm"),
    )
    mins = pts.groupBy("cell_x", "cell_y").agg(
        F.min("x_mm").alias("min_x"), F.min("y_mm").alias("min_y"),
        F.count("*").alias("n_points"),
    )
    centered = pts.join(F.broadcast(mins), ["cell_x", "cell_y"]).select(
        "cell_x", "cell_y", "n_points",
        (F.col("x_mm") - F.col("min_x")).alias("dx"),
        (F.col("y_mm") - F.col("min_y")).alias("dy"),
    )
    sums = centered.groupBy("cell_x", "cell_y", "n_points").agg(
        F.sum("dx").alias("sx"), F.sum("dy").alias("sy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).alias("syy"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
    ).filter(F.col("n_points") >= min_points)
    n = F.col("n_points").cast("double")
    # covariance from exact integer moments (double arithmetic mirrors
    # the oracle SQL expression shape exactly); metres², so /1e6
    cxx = (F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double") / n) / n / F.lit(1e6)
    cyy = (F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy").cast("double") / n) / n / F.lit(1e6)
    cxy = (F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double") / n) / n / F.lit(1e6)
    out = sums.select("cell_x", "cell_y", "n_points",
                      cxx.alias("cov_xx"), cyy.alias("cov_yy"), cxy.alias("cov_xy"))
    tr = F.col("cov_xx") + F.col("cov_yy")
    disc = F.sqrt(
        (F.col("cov_xx") - F.col("cov_yy")) * (F.col("cov_xx") - F.col("cov_yy"))
        + F.lit(4.0) * F.col("cov_xy") * F.col("cov_xy")
    )
    l1 = (tr + disc) / F.lit(2.0)
    l2 = (tr - disc) / F.lit(2.0)
    return out.select(
        "cell_x", "cell_y", "n_points", "cov_xx", "cov_yy", "cov_xy",
        l1.alias("lambda1"), l2.alias("lambda2"),
        F.when(l1 > 0, (l1 - l2) / l1).otherwise(F.lit(0.0)).alias("linearity"),
    )


def pca_cell_features_sql(pts_cte: str, res: float = 5.0,
                          min_points: int = 3) -> str:
    """Oracle over a CTE producing (page_id, x, y)."""
    return f"""
WITH pts AS ({pts_cte}),
cells AS (
  SELECT CAST(floor(x / {res}) AS BIGINT) AS cell_x,
         CAST(floor(y / {res}) AS BIGINT) AS cell_y,
         CAST(round(x * 1000.0) AS BIGINT) AS x_mm,
         CAST(round(y * 1000.0) AS BIGINT) AS y_mm
  FROM pts
),
mins AS (
  SELECT cell_x, cell_y, MIN(x_mm) AS min_x, MIN(y_mm) AS min_y,
         COUNT(*) AS n_points
  FROM cells GROUP BY cell_x, cell_y
),
sums AS (
  SELECT c.cell_x, c.cell_y, m.n_points,
         SUM(c.x_mm - m.min_x) AS sx, SUM(c.y_mm - m.min_y) AS sy,
         SUM((c.x_mm - m.min_x) * (c.x_mm - m.min_x)) AS sxx,
         SUM((c.y_mm - m.min_y) * (c.y_mm - m.min_y)) AS syy,
         SUM((c.x_mm - m.min_x) * (c.y_mm - m.min_y)) AS sxy
  FROM cells c JOIN mins m ON m.cell_x = c.cell_x AND m.cell_y = c.cell_y
  WHERE m.n_points >= {min_points}
  GROUP BY c.cell_x, c.cell_y, m.n_points
),
cov AS (
  SELECT cell_x, cell_y, n_points,
         (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
            / CAST(n_points AS DOUBLE)) / CAST(n_points AS DOUBLE) / 1e6 AS cov_xx,
         (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
            / CAST(n_points AS DOUBLE)) / CAST(n_points AS DOUBLE) / 1e6 AS cov_yy,
         (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
            / CAST(n_points AS DOUBLE)) / CAST(n_points AS DOUBLE) / 1e6 AS cov_xy
  FROM sums
),
eig AS (
  SELECT cell_x, cell_y, n_points, cov_xx, cov_yy, cov_xy,
         ((cov_xx + cov_yy) + sqrt((cov_xx - cov_yy) * (cov_xx - cov_yy)
                                   + 4.0 * cov_xy * cov_xy)) / 2.0 AS lambda1,
         ((cov_xx + cov_yy) - sqrt((cov_xx - cov_yy) * (cov_xx - cov_yy)
                                   + 4.0 * cov_xy * cov_xy)) / 2.0 AS lambda2
  FROM cov
)
SELECT cell_x, cell_y, n_points, cov_xx, cov_yy, cov_xy, lambda1, lambda2,
       CASE WHEN lambda1 > 0 THEN (lambda1 - lambda2) / lambda1
            ELSE 0.0 END AS linearity
FROM eig
"""
