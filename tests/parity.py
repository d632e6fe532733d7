"""Driver-mimic parity harness: run a registered query on Spark and its
DuckDB oracle on the same parquet dir, compare schema + sorted rows.

Used by tests/test_parity.py; import-safe for ad-hoc debugging.
"""

from __future__ import annotations

import math

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(rows, cols):
    """Sort columns by name, then rows; floats kept bit-exact."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    def key(t):
        return tuple(
            (v is None, str(type(v)), repr(v)) for v in t
        )
    return sorted(out, key=key), [cols[i] for i in order]


def compare(spark, sf_dir: str, name: str, query_fn, sql: str,
            float_tol: float = 0.0) -> dict:
    sdf = query_fn(spark, sf_dir)
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]
    con = duck_con(sf_dir)
    res = con.execute(sql)
    d_cols = [c[0].lower() for c in res.description]
    d_rows = [tuple(r) for r in res.fetchall()]
    con.close()

    report = {"name": name, "spark_rows": len(s_rows), "duck_rows": len(d_rows)}
    report["cols_match"] = sorted(s_cols) == sorted(d_cols)
    if not report["cols_match"]:
        report["spark_cols"], report["duck_cols"] = s_cols, d_cols
        report["ok"] = False
        return report
    sc, _ = _canon(s_rows, s_cols)
    dc, _ = _canon(d_rows, d_cols)
    if len(sc) != len(dc):
        report["ok"] = False
        report["first_spark"] = sc[:3]
        report["first_duck"] = dc[:3]
        return report
    mismatches = 0
    first_bad = None
    for a, b in zip(sc, dc):
        same = True
        for va, vb in zip(a, b):
            if isinstance(va, float) and isinstance(vb, float):
                if va != vb and not (math.isnan(va) and math.isnan(vb)):
                    if float_tol and abs(va - vb) <= float_tol:
                        continue
                    same = False
            elif va != vb:
                same = False
        if not same:
            mismatches += 1
            if first_bad is None:
                first_bad = (a, b)
    report["mismatches"] = mismatches
    report["ok"] = mismatches == 0
    if first_bad:
        report["first_bad"] = first_bad
    return report
