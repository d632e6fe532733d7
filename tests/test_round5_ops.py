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


# ----------------------------------------------------------------------
# domain_pagerank
# ----------------------------------------------------------------------

def _py_pagerank(doc_ids, iters=5):
    """Independent pure-Python replica of the documented recurrence
    (exact integer arithmetic) — not a port of the operator's Spark
    code: dict-based, driver-style."""
    from urban_pointcloud_processing_spark.operators.pagerank import (
        _H_ADD, _H_MUL, _H_RED, D_DEN, D_NUM, SCALE,
    )
    from urban_pointcloud_processing_spark.functions.text import HASH_MOD

    def dom(x):
        tld = ("com", "org", "co.uk", "nl")[x % 4]
        return f"site{x % 37}.{tld}"

    edges = {}
    for i in doc_ids:
        h = (_H_MUL * (i % _H_RED) + _H_ADD) % HASH_MOD
        k = (dom(i), dom(h))
        edges[k] = edges.get(k, 0) + 1
    outd = {}
    for (s, _), w in edges.items():
        outd[s] = outd.get(s, 0) + w
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    n = len(nodes)
    base = (15 * SCALE) // (100 * n)
    r = {v: SCALE // n for v in nodes}
    for _ in range(iters):
        nxt = {v: base for v in nodes}
        for (s, d), w in edges.items():
            nxt[d] += w * ((D_NUM * r[s]) // (D_DEN * outd[s]))
        r = nxt
    return r


def test_pagerank_matches_pure_python_reference(spark):
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    expect = _py_pagerank([r["doc_id"] for r in docs.select("doc_id").collect()])
    got = {
        r["domain"]: r["rank_e12"]
        for r in Q.QUERIES["domain_pagerank"](spark, SF001).collect()
    }
    assert got == expect


def test_pagerank_mass_and_motion(spark):
    """Rank mass only LEAKS (DIV truncation + dangling targets), and
    five iterations actually move rank off the uniform start."""
    from urban_pointcloud_processing_spark.operators.pagerank import SCALE

    rows = Q.QUERIES["domain_pagerank"](spark, SF001).collect()
    total = sum(r["rank_e12"] for r in rows)
    assert total <= SCALE
    assert total > 0
    uniform = SCALE // len(rows)
    assert any(r["rank_e12"] != uniform for r in rows)
