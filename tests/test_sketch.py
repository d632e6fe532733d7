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


def test_estimate_monotone_in_cardinality(spark):
    """More distinct keys must not shrink the register table: every
    register of the subset sketch is <= the full sketch's."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    sub = ev.filter(F.col("user_id") < 50)
    sub_r = _regs(hll_sketch(sub, "CAST(user_id AS STRING)"))
    full_r = _regs(hll_sketch(ev, "CAST(user_id AS STRING)"))
    assert all(sub_r[b] <= full_r[b] for b in range(M))
