"""HyperLogLog sketch gates: mergeability (exact), estimate sanity,
and the all-buckets-present register-table invariant."""

from __future__ import annotations

from pyspark.sql import functions as F

from urban_pointcloud_processing_spark.operators.sketch import (
    M,
    hll_estimate,
    hll_merge,
    hll_sketch,
)

SF = "/root/testdata/sf0.01"


def _regs(df):
    return {r["bucket"]: r["rho"] for r in df.collect()}


def test_register_table_has_all_buckets(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    regs = _regs(hll_sketch(ev, "CAST(user_id AS STRING)"))
    assert sorted(regs) == list(range(M))


def test_merge_equals_sketch_of_union(spark):
    """merge(sketch(A), sketch(B)) == sketch(A ∪ B), bit-exact — the
    property that makes the sketch a safe partial aggregate."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    merged = hll_merge(
        hll_sketch(a, "CAST(user_id AS STRING)"),
        hll_sketch(b, "CAST(user_id AS STRING)"),
    )
    whole = hll_sketch(ev, "CAST(user_id AS STRING)")
    assert _regs(merged) == _regs(whole)


def test_estimate_close_to_truth(spark):
    """m=64 HLL has ~13% std error; the fixture has 150 distinct
    users — accept a generous 3-sigma band (raw estimate, no
    small-range correction)."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    truth = ev.select("user_id").distinct().count()
    row = hll_estimate(hll_sketch(ev, "CAST(user_id AS STRING)")).first()
    est = row["est_e3"] / 1000.0
    assert row["m"] == M
    assert abs(est - truth) / truth < 0.4, (est, truth)


def test_registers_match_independent_python_hll(spark):
    """The Spark sketch must equal a from-first-principles Python HLL
    (hashlib sha-256, int.bit_length) — an INDEPENDENT third
    implementation, so the Spark/DuckDB pair can't agree on a wrong
    hash or rho convention."""
    import hashlib

    keys = [str(i * 37) for i in range(500)]
    expected = {b: 0 for b in range(M)}
    for k in keys:
        h = int(hashlib.sha256(k.encode()).hexdigest()[:15], 16)
        bucket, w = h % M, h // M
        rho = 55 - w.bit_length() if w else 55
        expected[bucket] = max(expected[bucket], rho)

    df = spark.createDataFrame([(k,) for k in keys], "k string")
    assert _regs(hll_sketch(df, "k")) == expected


def test_estimate_monotone_in_cardinality(spark):
    """More distinct keys must not shrink the register table: every
    register of the subset sketch is <= the full sketch's."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    sub = ev.filter(F.col("user_id") < 50)
    sub_r = _regs(hll_sketch(sub, "CAST(user_id AS STRING)"))
    full_r = _regs(hll_sketch(ev, "CAST(user_id AS STRING)"))
    assert all(sub_r[b] <= full_r[b] for b in range(M))
