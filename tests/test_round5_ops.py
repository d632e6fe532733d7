"""Gates for the round-5 late operators (url_domains, sliding_window,
bloom_decontaminate, cms_heavy_hitters) beyond the oracle parity the
driver checks: the structural invariants each sketch/rollup must hold
by construction."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from urban_pointcloud_processing_spark import queries as Q

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


# ----------------------------------------------------------------------
# count-min sketch
# ----------------------------------------------------------------------

def test_cms_never_underestimates_and_collides(spark):
    """CMS estimates are upper bounds (counters only over-count on
    collisions), and w=32 actually produces collisions at fixture
    scale — the min-over-rows is exercised, not vacuous."""
    rows = Q.QUERIES["cms_heavy_hitters"](spark, SF001).collect()
    assert len(rows) > 0
    assert all(r["cms_est"] >= r["n_exact"] for r in rows)
    assert any(r["cms_est"] > r["n_exact"] for r in rows)


def test_cms_heavy_verdict_matches_sketch_recompute(spark):
    """is_heavy is the SKETCH's verdict (est·1000 ≥ pm·total) and the
    threshold splits the fixture vocabulary non-trivially."""
    rows = Q.QUERIES["cms_heavy_hitters"](spark, SF001).collect()
    total = sum(r["n_exact"] for r in rows)
    for r in rows:
        assert r["is_heavy"] == (r["cms_est"] * 1000 >= 33 * total)
    n_heavy = sum(1 for r in rows if r["is_heavy"])
    assert 0 < n_heavy < len(rows)


# ----------------------------------------------------------------------
# Bloom decontamination
# ----------------------------------------------------------------------

def test_bloom_flags_are_superset_of_exact(spark):
    """Bloom membership can only ADD hits (false positives), never
    drop one: per doc n_bloom_hits ≥ the exact operator's n_hits, and
    every exactly-contaminated doc is flagged."""
    exact = {
        r["doc_id"]: r
        for r in Q.QUERIES["decontaminate"](spark, SF001).collect()
    }
    bloom = {
        r["doc_id"]: r
        for r in Q.QUERIES["bloom_decontaminate"](spark, SF001).collect()
    }
    assert set(bloom) == set(exact)  # same training-doc universe
    for did, e in exact.items():
        b = bloom[did]
        assert b["n_bloom_hits"] >= e["n_hits"], did
        if e["contaminated"]:
            assert b["flagged"], did


# ----------------------------------------------------------------------
# url_domains
# ----------------------------------------------------------------------

def test_url_domains_suffix_rule_and_share(spark):
    docs_total = spark.read.parquet(f"{SF01}/documents.parquet").count()
    rows = Q.QUERIES["url_domains"](spark, SF01).collect()
    assert sum(r["n_docs"] for r in rows) == docs_total
    for r in rows:
        d = r["reg_domain"]
        # multi-label suffix keeps the site label: never a bare co.uk
        assert re.fullmatch(r"site\d+\.(com|org|nl|co\.uk)", d), d
        assert r["share_e6"] == r["n_docs"] * 1_000_000 // docs_total
    assert any(r["reg_domain"].endswith(".co.uk") for r in rows)


# ----------------------------------------------------------------------
# sliding_window
# ----------------------------------------------------------------------

SLIDE_US = 300_000_000
SIZE_US = 600_000_000


def test_sliding_window_expansion_and_alignment(spark):
    """size = 2·slide ⇒ every event lands in exactly two windows, and
    every emitted window start is slide-aligned."""
    ev = spark.read.parquet(f"{SF001}/events.parquet")
    n_events = ev.count()
    rows = Q.QUERIES["sliding_window"](spark, SF001).collect()
    assert sum(r["n_events"] for r in rows) == 2 * n_events
    assert all(r["window_start_us"] % SLIDE_US == 0 for r in rows)


def test_sliding_window_matches_hand_recompute(spark):
    """Recompute one fixture group in Python from the raw events."""
    ev = (
        spark.read.parquet(f"{SF001}/events.parquet")
        .select(
            F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
            "event_type",
            F.expr("CAST(FLOOR(value * 1000000.0) AS BIGINT)").alias("v"),
        )
        .collect()
    )
    expect: dict[tuple[int, str], list[int]] = {}
    for r in ev:
        base = (r["t_us"] // SLIDE_US) * SLIDE_US
        for k in (0, 1):
            ws = base - k * SLIDE_US
            if 0 <= r["t_us"] - ws < SIZE_US:
                g = expect.setdefault((ws, r["event_type"]), [0, 0])
                g[0] += 1
                g[1] += r["v"]
    got = {
        (r["window_start_us"], r["event_type"]): [
            r["n_events"], r["sum_value_e6"]
        ]
        for r in Q.QUERIES["sliding_window"](spark, SF001).collect()
    }
    assert got == expect
