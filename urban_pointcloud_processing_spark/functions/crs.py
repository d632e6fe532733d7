"""CRS conversion + hierarchical spatial cell ids.

- ``rd_to_wgs84``: the published RD (EPSG:28992) → WGS84 approximation
  polynomial (Schreutelkamp & Strang van Hees, GPS Nieuwsbrief 1999 —
  the same public formula the reference implements in
  src/upcp/utils/rd_converter.py:43-95). Pure fixed-coefficient
  polynomial → plain Column arithmetic, no UDF; the DuckDB oracle is
  generated from the SAME coefficient list in the same fold order, so
  latitudes/longitudes are bit-identical.

- ``zcell``: hierarchical Z-order (Morton) cell id over WGS84 — the
  H3/S2-style index of the north_star. The true H3 library is not in
  this container, so the engine ships a deterministic equal-area-grid
  analog with the property that matters for the engine (prefix
  nesting): parent(cell, Δres) = cell >> 2Δres. Bit interleaving is a
  fixed 2×res-term integer expression, identical in SQL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (p, q, coefficient) — lat first, lon second; public tables.
K_PHI = [
    (0, 1, 3235.65389), (2, 0, -32.58297), (0, 2, -0.24750),
    (2, 1, -0.84978), (0, 3, -0.06550), (2, 2, -0.01709),
    (1, 0, -0.00738), (4, 0, 0.00530), (2, 3, -0.00039),
    (4, 1, 0.00033), (1, 1, -0.00012),
]
L_LAM = [
    (1, 0, 5260.52916), (1, 1, 105.94684), (1, 2, 2.45656),
    (3, 0, -0.81885), (1, 3, 0.05594), (3, 1, -0.05607),
    (0, 1, 0.01199), (3, 2, -0.00256), (1, 4, 0.00128),
    (0, 2, 0.00022), (2, 0, -0.00022), (5, 0, 0.00026),
]
X0, Y0 = 155000.0, 463000.0
PHI0, LAM0 = 52.15517440, 5.38720621


def _poly_col(dx: Column, dy: Column, terms) -> Column:
    acc = F.lit(0.0)
    for p, q, c in terms:
        t = F.lit(c)
        for _ in range(p):
            t = t * dx
        for _ in range(q):
            t = t * dy
        acc = acc + t
    return acc


def rd_to_wgs84(x: Column, y: Column) -> tuple[Column, Column]:
    dx = (x - F.lit(X0)) * F.lit(1e-5)
    dy = (y - F.lit(Y0)) * F.lit(1e-5)
    lat = F.lit(PHI0) + _poly_col(dx, dy, K_PHI) / F.lit(3600.0)
    lon = F.lit(LAM0) + _poly_col(dx, dy, L_LAM) / F.lit(3600.0)
    return lat, lon


def _poly_sql(dx: str, dy: str, terms) -> str:
    acc = "0.0"
    for p, q, c in terms:
        t = repr(c)
        for _ in range(p):
            t = f"({t} * {dx})"
        for _ in range(q):
            t = f"({t} * {dy})"
        acc = f"({acc} + {t})"
    return acc


def rd_to_wgs84_sql(x: str, y: str) -> tuple[str, str]:
    dx = f"(({x} - {X0}) * 1e-05)"
    dy = f"(({y} - {Y0}) * 1e-05)"
    lat = f"({PHI0} + {_poly_sql(dx, dy, K_PHI)} / 3600.0)"
    lon = f"({LAM0} + {_poly_sql(dx, dy, L_LAM)} / 3600.0)"
    return lat, lon


# ----------------------------------------------------------------------
# Z-order hierarchical cells (H3/S2-style prefix-nested index)
# ----------------------------------------------------------------------

# fixed window so cell fractions are in [0, 1): the Netherlands-ish
# bounding box of the fixture geocode, generous margins
LAT_LO, LAT_HI = 50.0, 54.0
LON_LO, LON_HI = 3.0, 8.0


def _frac_bits(v: Column, lo: float, hi: float, res: int) -> Column:
    return F.floor((v - F.lit(lo)) / F.lit(hi - lo) * F.lit(float(1 << res))).cast(
        "long"
    )


def zcell(lat: Column, lon: Column, res: int = 16) -> Column:
    """Morton-interleaved cell id at ``res`` bits per axis. Parent at
    res−k is ``zcell >> 2k`` (prefix nesting, like H3/S2)."""
    ix = _frac_bits(lat, LAT_LO, LAT_HI, res)
    iy = _frac_bits(lon, LON_LO, LON_HI, res)
    acc = F.lit(0).cast("long")
    for b in range(res):
        acc = (
            acc
            + (F.shiftright(ix, b).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * b + 1)))
            + (F.shiftright(iy, b).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * b)))
        )
    return acc


def zcell_sql(lat: str, lon: str, res: int = 16) -> str:
    ix = (
        f"CAST(floor(({lat} - {LAT_LO}) / {LAT_HI - LAT_LO} * {float(1 << res)}) AS BIGINT)"
    )
    iy = (
        f"CAST(floor(({lon} - {LON_LO}) / {LON_HI - LON_LO} * {float(1 << res)}) AS BIGINT)"
    )
    parts = []
    for b in range(res):
        parts.append(f"((({ix} >> {b}) & 1) * {1 << (2 * b + 1)})")
        parts.append(f"((({iy} >> {b}) & 1) * {1 << (2 * b)})")
    return "CAST(" + " + ".join(parts) + " AS BIGINT)"
