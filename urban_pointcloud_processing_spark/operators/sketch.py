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


# ----------------------------------------------------------------------
# 2-universal hash family over the cross-engine str_hash id
#
# h_j(sid) = ((A_J[j] * sid + B_J[j]) % HASH_MOD) % m — the standard
# (a·x + b mod p) mod m family, seeded per derived function j. sid is
# the proven str_hash polynomial (functions.text, < HASH_MOD = 1e9+7),
# so A_J[j] * sid < 1e9 * (1e9 + 6) < 2^60: every intermediate fits a
# 64-bit signed integer in BOTH engines — no HUGEINT promotion on the
# DuckDB side, no overflow on the JVM side. Shared by the Bloom
# filter (operators.dedup.bloom_decontaminate) and the count-min
# sketch below.
# ----------------------------------------------------------------------

HASH_MOD = 1_000_000_007  # = functions.text.HASH_MOD (kept literal —
                          # changing either breaks recorded oracles)

UHASH_A = (961_748_941, 982_451_653, 899_809_343, 879_190_841)
UHASH_B = (316_691, 520_381, 104_729, 15_485_863)


def uhash_sql(sid_expr: str, j: int, m: int) -> str:
    """((a_j * sid + b_j) % p) % m — identical text works as Spark SQL
    and DuckDB SQL (integer ops only)."""
    return (
        f"(({UHASH_A[j]} * ({sid_expr}) + {UHASH_B[j]}) "
        f"% {HASH_MOD}) % {m}"
    )


# ----------------------------------------------------------------------
# Count-min sketch — frequency estimation / heavy hitters
#
# The counting counterpart of the HLL sketch above: estimate per-key
# occurrence counts with a fixed d×w counter table instead of an exact
# vocabulary-sized groupBy held in memory. est(t) = min_j cms[j][h_j(t)]
# ≥ exact(t) always (counters only over-count on collisions), so a
# "heavy hitter" report from the sketch has perfect recall. Everything
# is integer arithmetic on both engines — the sketch, the estimates
# and the threshold test reproduce bit-exactly in DuckDB.
#
# Scale shape: the ONLY corpus-sized operation is the token groupBy
# that builds the vocabulary count table (map-side combine); the
# sketch itself is d·w rows (a broadcast), built FROM the vocab table
# — at 100 TB the d×w counter grid is what ships between stages, not
# the vocabulary. d and w are deliberately small here (w=32 forces
# real collisions at fixture scale so min-over-rows is exercised, not
# vacuous).
# ----------------------------------------------------------------------

CMS_D = 4    # hash rows (≤ len(UHASH_A))
CMS_W = 32   # counters per row


def cms_heavy_hitters(docs: DataFrame, tokens_expr_col, pm: int = 33,
                      d: int = CMS_D, w: int = CMS_W) -> DataFrame:
    """(tok, n_exact, cms_est, is_heavy) for every distinct token.

    ``tokens_expr_col`` is a bound Column producing the token array
    (functions.text.tokens_expr over the text column). is_heavy uses
    the SKETCH estimate: cms_est · 1000 ≥ pm · total_occurrences
    (pm per-mille) — all-integer, order-free. The exact count rides
    along so consumers (and the parity gate) can see the
    overestimation error explicitly."""
    from ..functions.text import str_hash_udf

    # tc feeds THREE consumers (sketch build, estimate join, corpus
    # total); localCheckpoint materializes the corpus-sized token
    # aggregate once — the checkpointed table itself is only
    # vocabulary-sized (house style for small reused tables,
    # operators/dedup.py)
    tc = (
        docs.select(F.explode(tokens_expr_col).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("long").alias("n"))
        .localCheckpoint()
    )
    th = tc.select("tok", "n", str_hash_udf()(F.col("tok")).alias("sid"))
    rows = th.select(
        "tok", "n",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).cast("long").alias("j"),
                    F.expr(uhash_sql("sid", j, w)).alias("col"),
                )
                for j in range(d)
            ])
        ).alias("h"),
    ).select("tok", "n", "h.j", "h.col")
    sketch = rows.groupBy("j", "col").agg(F.sum("n").alias("cnt"))
    est = (
        rows.join(F.broadcast(sketch), ["j", "col"])
        .groupBy("tok")
        .agg(
            F.max("n").alias("n_exact"),
            F.min("cnt").alias("cms_est"),
        )
    )
    total = tc.agg(F.sum("n").alias("total"))
    return est.crossJoin(F.broadcast(total)).select(
        "tok", "n_exact", "cms_est",
        (F.col("cms_est") * 1000 >= F.col("total") * pm).alias("is_heavy"),
    )


def cms_heavy_hitters_sql(tokens_sql_expr: str, pm: int = 33,
                          d: int = CMS_D, w: int = CMS_W) -> str:
    from ..functions.text import str_hash_sql

    hp = ", ".join(
        f"({j}, {UHASH_A[j]}, {UHASH_B[j]})" for j in range(d)
    )
    return f"""
WITH toks AS (SELECT unnest({tokens_sql_expr}) AS tok FROM documents),
tc AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY tok),
th AS (SELECT tok, n, {str_hash_sql('tok')} AS sid FROM tc),
hp(j, a, b) AS (VALUES {hp}),
rows_ AS (
  SELECT tok, n, hp.j AS j, ((hp.a * sid + hp.b) % {HASH_MOD}) % {w} AS col
  FROM th CROSS JOIN hp
),
sketch AS (
  SELECT j, col, CAST(SUM(n) AS BIGINT) AS cnt
  FROM rows_ GROUP BY j, col
),
est AS (
  SELECT r.tok, MAX(r.n) AS n_exact, MIN(s.cnt) AS cms_est
  FROM rows_ r JOIN sketch s ON s.j = r.j AND s.col = r.col
  GROUP BY r.tok
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM tc)
SELECT tok, n_exact, cms_est,
       cms_est * 1000 >= total * {pm} AS is_heavy
FROM est CROSS JOIN tot
"""
