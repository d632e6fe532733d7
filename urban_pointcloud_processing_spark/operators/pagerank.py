"""Deterministic integer-arithmetic PageRank over a domain link graph.

The iterative fixed-point operator class over a WEB LINK GRAPH — the
missing sibling of the engine's connected-components / region-growing
iteration (operators/components.py, operators/region_growing.py): a
rank vector repeatedly redistributed along weighted edges. This is
the canonical "host reputation" signal of a Common-Crawl-style
pipeline (seed quality scores, crawl prioritization, spam demotion).

The documents fixture has no hyperlinks, so each page contributes one
deterministic link: its own registrable domain (the url_domains
synthesis rule) links to the domain derived from a multiplicative
hash of its doc_id (the stratified_sample overflow-safe form —
doc_id is reduced mod 1e6+3 BEFORE the Knuth multiplier so the
product stays < 2^63). Both engines build the identical edge list, so
everything downstream is exact.

Exactness (SURVEY.md §7.3 item 1 — no floats anywhere):

- ranks live at integer scale 1e12; the damping step is
  ``w · ((85 · r) DIV (100 · outdeg_w))`` — every division is an
  explicit integer DIV, mirrored token-for-token in DuckDB (``//``),
  so 5 iterations reproduce bit-exactly;
- per-edge bound: 85·r ≤ 8.5e13, quotient ≤ 8.5e11, so edge weights
  up to ~1e7 fit i64 — beyond that (hot domain pairs at 10^12 docs)
  drop SCALE a few decades; the sum per node is order-free integer;
- rank mass is NOT conserved: DIV truncation loses ≤1 unit per edge
  and dangling targets (hash domains no page lives on) leak their
  inflow — the classic simplified formulation, identical both sides.

Scale shape: the ONLY corpus-sized stage is the (src, dst) edge
aggregate (map-side combine). Each iteration is one
ranks ⋈ edges ⋈ outdeg join + a dst-keyed aggregate — rank and
degree tables are DOMAIN-sized, edges are domain-pair-sized; per
iteration the frontier is localCheckpointed (flat plans, the
checkpointed-frontier pattern the north_star names for region
growing). Iteration count is fixed (5), not convergence-polled — no
driver round-trips beyond the N scalar.

Reference analog: none (no graph ranking in the reference); extends
§2.9's iterative machinery to weighted fixed-point iteration.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.text import HASH_MOD

SCALE = 10**12        # integer rank scale
D_NUM, D_DEN = 85, 100  # damping 0.85 as a ratio
ITERS = 5
# overflow-safe multiplicative hash (mod BEFORE multiply — the
# stratified_sample rule: (1e6+3)·2654435761 + 12345 < 2^63)
_H_RED = 1_000_003
_H_MUL = 2_654_435_761
_H_ADD = 12_345


def _dom_expr(x: Column) -> Column:
    """'siteN.tld' registrable domain from a non-negative integer —
    the url_domains synthesis rule, minus the URL wrapping."""
    return F.concat(
        F.lit("site"), (x % 37).cast("string"), F.lit("."),
        F.when(x % 4 == 0, F.lit("com"))
        .when(x % 4 == 1, F.lit("org"))
        .when(x % 4 == 2, F.lit("co.uk"))
        .otherwise(F.lit("nl")),
    )


def _dom_sql(x: str) -> str:
    return (
        f"'site' || CAST(({x}) % 37 AS VARCHAR) || '.' || "
        f"CASE ({x}) % 4 WHEN 0 THEN 'com' WHEN 1 THEN 'org' "
        f"WHEN 2 THEN 'co.uk' ELSE 'nl' END"
    )


def _hash_sql(x: str) -> str:
    return f"(({_H_MUL} * (({x}) % {_H_RED}) + {_H_ADD}) % {HASH_MOD})"


def domain_pagerank(docs: DataFrame, iters: int = ITERS) -> DataFrame:
    """(domain, rank_e12) after ``iters`` exact integer PageRank
    iterations over the synthesized per-page domain→domain link
    graph."""
    i = F.col("doc_id")
    h = (F.lit(_H_MUL) * (i % _H_RED) + _H_ADD) % HASH_MOD
    bare = (
        docs.select(
            _dom_expr(i).alias("src"),
            _dom_expr(h).alias("dst"),
        )
        .groupBy("src", "dst")
        .agg(F.count("*").cast("long").alias("w"))
    )
    outd = bare.groupBy("src").agg(F.sum("w").alias("out_w"))
    # out_w rides along on every edge row so no iteration re-runs the
    # degree aggregate or its join
    edges = bare.join(outd, "src").localCheckpoint()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()          # domain-sized; reused every iteration
    )
    n = nodes.count()
    if n == 0:
        # empty corpus → empty ranking (the oracle's per-row divisions
        # never execute, so it too returns zero rows)
        return nodes.select(
            F.col("node").alias("domain"),
            F.lit(0).cast("long").alias("rank_e12"),
        )
    base = (15 * SCALE) // (100 * n)

    ranks = nodes.select(
        "node", F.lit(SCALE // n).cast("long").alias("r")
    )
    contrib_sql = (
        f"w * (({D_NUM} * r) DIV ({D_DEN} * out_w))"
    )
    for _ in range(iters):
        contrib = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .select("dst", F.expr(contrib_sql).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                (F.lit(base) + F.coalesce(F.col("inflow"), F.lit(0)))
                .cast("long")
                .alias("r"),
            )
            .localCheckpoint()      # flat plan per iteration
        )
    return ranks.select(
        F.col("node").alias("domain"), F.col("r").alias("rank_e12")
    )


def domain_pagerank_sql(iters: int = ITERS) -> str:
    """The identical computation as ``iters`` unrolled DuckDB CTEs."""
    its = []
    for t in range(1, iters + 1):
        its.append(f"""
r{t} AS (
  SELECT n.node,
         (15 * CAST({SCALE} AS BIGINT)) // (100 * cnt.c)
           + COALESCE(SUM(e.w * (({D_NUM} * p.r) // ({D_DEN} * o.out_w))), 0)
           AS r
  FROM nodes n
  CROSS JOIN cnt
  LEFT JOIN e ON e.dst = n.node
  LEFT JOIN r{t - 1} p ON p.node = e.src
  LEFT JOIN outd o ON o.src = e.src
  GROUP BY n.node, cnt.c
)""")
    # each CTE carries its own leading comma so iters=0 stays valid SQL
    chain = "".join("," + it for it in its)
    return f"""
WITH u AS (
  SELECT {_dom_sql('doc_id')} AS src,
         {_dom_sql(_hash_sql('doc_id'))} AS dst
  FROM documents
),
e AS (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w
      FROM u GROUP BY src, dst),
outd AS (SELECT src, CAST(SUM(w) AS BIGINT) AS out_w FROM e GROUP BY src),
nodes AS (SELECT src AS node FROM e UNION SELECT dst AS node FROM e),
cnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM nodes),
r0 AS (SELECT node, CAST({SCALE} AS BIGINT) // c AS r
       FROM nodes CROSS JOIN cnt){chain}
SELECT node AS domain, r AS rank_e12 FROM r{iters}
"""
