"""Hand-built edge cases for the event-table query family — the
situations the synthetic fixture can't guarantee to exercise. Every
case is ALSO run through the registered DuckDB oracle on the same
rows (the sf0.01 parity gate can't see e.g. equal-timestamp ties, so
a tie-handling divergence would otherwise survive both suites)."""

from __future__ import annotations

import datetime as dt

import duckdb

from urban_pointcloud_processing_spark import queries as Q

from .parity import _canon

UTC = dt.timezone.utc


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    return str(tmp_path)


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _assert_oracle_agrees(spark_df, sf, name):
    """Run the registered oracle over ONLY the events view (the other
    fixture tables don't exist in the tmp dir) and compare with the
    driver's canonicalization."""
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf}/events.parquet/*.parquet')"
    )
    res = con.execute(Q.ORACLES[name])
    d_cols = [c[0].lower() for c in res.description]
    d_rows = [tuple(r) for r in res.fetchall()]
    con.close()
    s_cols = [c.lower() for c in spark_df.columns]
    s_rows = [tuple(r) for r in spark_df.collect()]
    assert sorted(s_cols) == sorted(d_cols)
    assert _canon(s_rows, s_cols)[0] == _canon(d_rows, d_cols)[0]


def test_event_asof_no_preceding_click_is_null(spark, tmp_path):
    sf = _write_events(
        spark,
        tmp_path,
        [
            # error BEFORE any click → NULL match; error after → click 2
            (1, _ts("2024-01-01T00:00:00"), 7, "error", 1.0, "{}"),
            (2, _ts("2024-01-01T00:01:00"), 7, "click", 2.5, "{}"),
            (3, _ts("2024-01-01T00:02:30"), 7, "error", 3.0, "{}"),
            # another user's click must not leak across users
            (4, _ts("2024-01-01T00:02:00"), 8, "click", 9.0, "{}"),
            (5, _ts("2024-01-01T00:03:00"), 9, "error", 0.5, "{}"),
        ],
    )
    out = Q.QUERIES["event_asof"](spark, sf)
    _assert_oracle_agrees(out, sf, "event_asof")
    rows = {r["event_id"]: r for r in out.collect()}
    assert rows[1]["click_event_id"] is None and rows[1]["gap_us"] is None
    assert rows[3]["click_event_id"] == 2
    assert rows[3]["gap_us"] == 90_000_000
    assert rows[3]["click_value"] == 2.5
    assert rows[5]["click_event_id"] is None


def test_event_asof_tie_breaks_on_event_id(spark, tmp_path):
    t = _ts("2024-01-01T00:00:00")
    sf = _write_events(
        spark,
        tmp_path,
        [
            (10, t, 1, "click", 1.0, "{}"),
            (11, t, 1, "click", 2.0, "{}"),  # same ts — higher id wins
            (12, _ts("2024-01-01T00:00:01"), 1, "error", 0.0, "{}"),
        ],
    )
    out = Q.QUERIES["event_asof"](spark, sf)
    _assert_oracle_agrees(out, sf, "event_asof")
    row = out.collect()[0]
    assert row["click_event_id"] == 11 and row["click_value"] == 2.0


def test_cohort_retention_excludes_pre_signup_weeks(spark, tmp_path):
    sf = _write_events(
        spark,
        tmp_path,
        [
            # activity a week BEFORE signup → excluded; same-week-pre
            # activity → week 0; next-week activity → week 1
            (1, _ts("2024-01-01T00:00:00"), 1, "view", 0.0, "{}"),
            (2, _ts("2024-01-10T00:00:00"), 1, "signup", 0.0, "{}"),
            (3, _ts("2024-01-09T00:00:00"), 1, "view", 0.0, "{}"),
            (4, _ts("2024-01-16T00:00:00"), 1, "view", 0.0, "{}"),
            # user with no signup → absent entirely
            (5, _ts("2024-01-10T00:00:00"), 2, "view", 0.0, "{}"),
        ],
    )
    res = Q.QUERIES["cohort_retention"](spark, sf)
    _assert_oracle_agrees(res, sf, "cohort_retention")
    out = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in res.collect()
    }
    offsets = {k[1] for k in out}
    assert offsets == {0, 1}, out
    assert all(v == 1 for v in out.values())


def test_event_pivot_ignores_out_of_universe_types(spark, tmp_path):
    sf = _write_events(
        spark,
        tmp_path,
        [
            (1, _ts("2024-01-01T00:00:00"), 1, "click", 1.5, "{}"),
            (2, _ts("2024-01-01T00:01:00"), 1, "refund", 99.0, "{}"),
            # user with ONLY an out-of-universe type → no output row
            (3, _ts("2024-01-01T00:02:00"), 2, "refund", 5.0, "{}"),
        ],
    )
    out = Q.QUERIES["event_pivot"](spark, sf)
    _assert_oracle_agrees(out, sf, "event_pivot")
    rows = {r["user_id"]: r for r in out.collect()}
    assert set(rows) == {1}
    assert rows[1]["n_click"] == 1
    # the refund's 99.0 must NOT leak into the profiled total
    assert rows[1]["v_sum_e6"] == 1_500_000


def test_funnel_strict_order_and_ties(spark, tmp_path):
    t0 = _ts("2024-01-01T00:00:00")
    sf = _write_events(
        spark,
        tmp_path,
        [
            # user 1: full ordered funnel view→click→purchase
            (1, _ts("2024-01-01T00:00:00"), 1, "view", 0.0, "{}"),
            (2, _ts("2024-01-01T00:01:00"), 1, "click", 0.0, "{}"),
            (3, _ts("2024-01-01T00:02:00"), 1, "purchase", 0.0, "{}"),
            # user 2: purchase BEFORE the click → step 3 not reached
            (4, _ts("2024-01-01T00:00:00"), 2, "view", 0.0, "{}"),
            (5, _ts("2024-01-01T00:02:00"), 2, "click", 0.0, "{}"),
            (6, _ts("2024-01-01T00:01:00"), 2, "purchase", 0.0, "{}"),
            # user 3: click before any view → funnel stops at step 1
            (7, _ts("2024-01-01T00:01:00"), 3, "click", 0.0, "{}"),
            (8, _ts("2024-01-01T00:02:00"), 3, "view", 0.0, "{}"),
            # user 4: no view at all → not in the funnel
            (9, _ts("2024-01-01T00:00:00"), 4, "purchase", 0.0, "{}"),
            # user 5: view/click/purchase ALL at the same timestamp —
            # ascending event_id resolves the tie, so the chain counts
            (10, t0, 5, "view", 0.0, "{}"),
            (11, t0, 5, "click", 0.0, "{}"),
            (12, t0, 5, "purchase", 0.0, "{}"),
            # user 6: same-instant tie but purchase's event_id BELOW
            # the click's → strictly-after fails at step 3
            (13, t0, 6, "view", 0.0, "{}"),
            (15, t0, 6, "click", 0.0, "{}"),
            (14, t0, 6, "purchase", 0.0, "{}"),
        ],
    )
    out = Q.QUERIES["funnel_steps"](spark, sf)
    _assert_oracle_agrees(out, sf, "funnel_steps")
    rows = {r["step"]: r["n_users"] for r in out.collect()}
    # views: users 1,2,3,5,6; clicks after first view: 1,2,5,6;
    # purchases after that click: 1,5
    assert rows == {"view": 5, "click": 4, "purchase": 2}


def test_funnel_empty_events_is_all_zero(spark, tmp_path):
    sf = _write_events(spark, tmp_path, [])
    out = Q.QUERIES["funnel_steps"](spark, sf)
    _assert_oracle_agrees(out, sf, "funnel_steps")
    rows = {r["step"]: r["n_users"] for r in out.collect()}
    assert rows == {"view": 0, "click": 0, "purchase": 0}
