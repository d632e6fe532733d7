"""Deterministic DBSCAN variant (pole seed search) unit tests."""

from __future__ import annotations

from urban_pointcloud_processing_spark.operators.dbscan import dbscan_windows


def _df(spark, rows):
    return spark.createDataFrame(rows, ["win_id", "pid", "x", "y"])


def test_two_clusters_and_noise(spark):
    # cluster A: 5 points in a tight blob; cluster B: 5 points far away;
    # one isolated noise point
    rows = []
    for i in range(5):
        rows.append((1, i, 0.0 + i * 0.01, 0.0))
    for i in range(5):
        rows.append((1, 10 + i, 10.0 + i * 0.01, 0.0))
    rows.append((1, 99, 5.0, 5.0))
    got = {
        r["pid"]: r["cluster"]
        for r in dbscan_windows(_df(spark, rows), eps=0.1, min_samples=3).collect()
    }
    assert {got[i] for i in range(5)} == {0}          # min core pid
    assert {got[10 + i] for i in range(5)} == {10}
    assert got[99] == -1


def test_border_point_attaches_to_nearest_core(spark):
    # 5-point core blob at x=0; a border point at x=0.08 (within eps of
    # one core point but itself has only 2 neighbors -> not core)
    rows = [(1, i, i * 0.001, 0.0) for i in range(5)]
    rows.append((1, 50, 0.084, 0.0))
    got = {
        r["pid"]: r["cluster"]
        for r in dbscan_windows(_df(spark, rows), eps=0.1, min_samples=5).collect()
    }
    assert got[50] == 0


def test_min_samples_includes_self(spark):
    # exactly min_samples=3 points within eps of each other -> all core
    rows = [(1, 0, 0.0, 0.0), (1, 1, 0.05, 0.0), (1, 2, 0.0, 0.05)]
    got = {
        r["pid"]: r["cluster"]
        for r in dbscan_windows(_df(spark, rows), eps=0.1, min_samples=3).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0}


def test_windows_are_independent(spark):
    rows = [(1, 0, 0.0, 0.0), (1, 1, 0.01, 0.0), (1, 2, 0.02, 0.0),
            (2, 0, 0.0, 0.0), (2, 1, 5.0, 0.0), (2, 2, 10.0, 0.0)]
    out = dbscan_windows(_df(spark, rows), eps=0.1, min_samples=3).collect()
    got = {(r["win_id"], r["pid"]): r["cluster"] for r in out}
    assert got[(1, 0)] == 0 and got[(1, 2)] == 0
    assert got[(2, 0)] == -1 and got[(2, 1)] == -1 and got[(2, 2)] == -1
