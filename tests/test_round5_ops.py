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
    code: dict-based, driver-style, and with every constant LITERAL
    (importing the operator's constants would let a constant-level
    edit change both sides in lockstep)."""
    SCALE = 10**12

    def dom(x):
        tld = ("com", "org", "co.uk", "nl")[x % 4]
        return f"site{x % 37}.{tld}"

    edges = {}
    for i in doc_ids:
        h = (2654435761 * (i % 1000003) + 12345) % 1000000007
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
            nxt[d] += w * ((85 * r[s]) // (100 * outd[s]))
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


def test_pagerank_domains_consistent_with_url_domains(spark):
    """The docstrings claim pagerank's node universe is the
    url_domains synthesis rule; pin the two copies of the rule
    together: every pagerank SOURCE domain (a domain some page lives
    on) must appear in url_domains' registrable-domain report, and
    vice versa."""
    from urban_pointcloud_processing_spark.operators.pagerank import (
        _dom_expr,
    )
    from pyspark.sql import functions as F2

    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    src = {
        r["d"]
        for r in docs.select(
            _dom_expr(F2.col("doc_id")).alias("d")
        ).distinct().collect()
    }
    reg = {
        r["reg_domain"]
        for r in Q.QUERIES["url_domains"](spark, SF001).collect()
    }
    assert src == reg


def test_pagerank_sql_zero_iterations_is_valid(spark):
    """iters=0 must be the uniform init on BOTH engines (the SQL
    builder must not emit a dangling comma)."""
    import duckdb

    from urban_pointcloud_processing_spark.operators.pagerank import (
        domain_pagerank, domain_pagerank_sql,
    )

    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    got = {
        r["domain"]: r["rank_e12"]
        for r in domain_pagerank(docs, 0).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF001}/documents.parquet')"
    )
    oracle = dict(con.execute(domain_pagerank_sql(0)).fetchall())
    con.close()
    assert got == oracle
    assert len(set(got.values())) == 1  # uniform init


def test_pagerank_empty_corpus_returns_empty(spark):
    from urban_pointcloud_processing_spark.operators.pagerank import (
        domain_pagerank,
    )

    empty = spark.read.parquet(f"{SF001}/documents.parquet").filter(
        "doc_id < 0"
    )
    out = domain_pagerank(empty, 5)
    assert out.collect() == []
    assert out.columns == ["domain", "rank_e12"]
