"""Deterministic HyperLogLog distinct-count sketch.

The cardinality-sketch operator class (the "novel sketch" slot of the
build brief): estimate the number of distinct keys with a
fixed-size, MERGEABLE register table instead of an exact
`COUNT(DISTINCT ...)` shuffle. At 100 TB an exact distinct over a
high-cardinality key shuffles every distinct value; the HLL register
table is 64 integers regardless of input size, the per-partition
partial is the same `max(rho)` aggregate Spark's map-side combine
already performs, and two sketches merge with an element-wise max —
`test_sketch.py` pins merge(a ⊕ b) == sketch(a ∪ b) exactly.

Everything is engine-exact, not approximately equal:

- the 60-bit hash is the first 15 hex chars of SHA-256 (both engines
  produce identical lowercase hex; parsed with `conv` on Spark and a
  16-ary char fold in DuckDB — max 2^60, no i64 overflow anywhere);
- bucket = h % 64 (6 bits), w = h DIV 64 (54 bits),
  rho = 55 - bitlen(w) (w = 0 → 55), so registers are small ints;
- the harmonic sum is kept INTEGER at scale 2^55
  (term = 2^(55 - rho) ≤ 2^55, 64 terms < 2^61) — order-free, so the
  distributed sum is bit-stable;
- only the final estimate touches doubles, in ONE mirrored expression
  (constant · 2^55 / S, then ·1000 and floor → `est_e3`): identical
  IEEE ops in both engines. The small-range linear-counting
  correction needs ln(), whose libm rounding is not cross-engine
  reproducible, so the operator emits `v_zero` (empty registers) and
  leaves that correction to the consumer — documented, not hidden.

alpha_64 = 0.709 (Flajolet et al. 2007, m = 64).

Reference analog: none (the reference is exact-only); this extends
the training-data family's distinct-counting at web scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

P = 6                 # bucket bits — the ONE tunable
H_BITS = 60           # hash width (15 hex chars of sha-256)
M = 1 << P            # registers
W_BITS = H_BITS - P   # suffix bits feeding rho
RHO_MAX = W_BITS + 1  # rho for an all-zero suffix
ALPHA_M = 0.709       # alpha for m = 64; re-derive if P changes

# 2^RHO_MAX as an exact double literal (mirrored in the SQL oracle)
_SCALE = float(1 << RHO_MAX)


def hll_hash_expr(col_sql: str) -> str:
    """60-bit hash of a string expression, Spark SQL."""
    return (
        f"CAST(conv(substring(sha2({col_sql}, 256), 1, 15), 16, 10) "
        f"AS BIGINT)"
    )


def hll_sketch(df: DataFrame, key_sql: str) -> DataFrame:
    """64-row register table (bucket, rho) for the distinct values of
    ``key_sql`` (a Spark SQL string expression over ``df``). Every
    bucket is present (absent → rho 0), so sketches are positionally
    mergeable with an element-wise max."""
    spark = df.sparkSession
    h = df.selectExpr(f"{hll_hash_expr(key_sql)} AS h")
    reg = (
        h.selectExpr(
            f"h % {M} AS bucket",
            f"CASE WHEN h DIV {M} = 0 THEN CAST({RHO_MAX} AS BIGINT) "
            f"ELSE {RHO_MAX} - length(bin(h DIV {M})) END AS rho",
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )
    allb = spark.range(M).select(F.col("id").alias("bucket"))
    return allb.join(reg, "bucket", "left").select(
        "bucket", F.coalesce("rho", F.lit(0)).cast("long").alias("rho")
    )


def hll_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two register tables: element-wise max per bucket."""
    return (
        a.unionByName(b)
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(registers: DataFrame) -> DataFrame:
    """One-row summary from a register table: m (register count, read
    from the data), v_zero (empty registers), s55 (integer harmonic
    sum at scale 2^RHO_MAX) and the raw HLL estimate in milli-units
    (`est_e3`). The estimate uses the DATA-derived m so a register
    table of unexpected size can't silently pair with the m=64
    constant — though ALPHA_M itself is only correct for m = 64."""
    agg = registers.agg(
        F.count("*").alias("m"),
        F.sum(F.when(F.col("rho") == 0, 1).otherwise(0))
        .cast("long")
        .alias("v_zero"),
        F.sum(
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST({RHO_MAX} - rho AS INT))"
            )
        )
        .cast("long")
        .alias("s55"),
    )
    est = F.floor(
        F.lit(ALPHA_M)
        * (F.col("m") * F.col("m")).cast("double")
        * F.lit(_SCALE)
        / F.col("s55").cast("double")
        * F.lit(1000.0)
    ).cast("long")
    return agg.select("m", "v_zero", "s55", est.alias("est_e3"))


def hll_distinct(df: DataFrame, key_sql: str) -> DataFrame:
    return hll_estimate(hll_sketch(df, key_sql))


def hll_hash_sql(col_sql: str) -> str:
    """The same 60-bit hash in DuckDB (no conv() — 16-ary char fold,
    list_reduce seeded by a prepended 0 per the house fold rule)."""
    return (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split(substr(sha256({col_sql}), 1, 15), ''), "
        "c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))), "
        "(a, c) -> a * 16 + c)"
    )


def hll_distinct_sql(table: str, key_sql: str) -> str:
    est = (
        f"CAST(FLOOR({ALPHA_M} * CAST(m * m AS DOUBLE) * {_SCALE!r} "
        f"/ CAST(s55 AS DOUBLE) * 1000.0) AS BIGINT)"
    )
    return f"""
WITH h AS (SELECT {hll_hash_sql(key_sql)} AS h FROM {table}),
b AS (SELECT h % {M} AS bucket, h // {M} AS w FROM h),
r AS (SELECT bucket,
             MAX(CASE WHEN w = 0 THEN CAST({RHO_MAX} AS BIGINT)
                      ELSE {RHO_MAX} - length(bin(w)) END) AS rho
      FROM b GROUP BY bucket),
regs AS (SELECT g.bucket, COALESCE(r.rho, 0) AS rho
         FROM (SELECT CAST(range AS BIGINT) AS bucket FROM range({M})) g
         LEFT JOIN r ON r.bucket = g.bucket),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS v_zero,
             CAST(SUM(CAST(1 AS BIGINT) << CAST({RHO_MAX} - rho AS INTEGER))
               AS BIGINT) AS s55
      FROM regs)
SELECT m, v_zero, s55, {est} AS est_e3 FROM s
"""
