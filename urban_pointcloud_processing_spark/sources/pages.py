"""Pages fact-table sources.

The engine's fact table is a Common-Crawl-style pages table
(url, warc_ts, html, text, lang) per BASELINE.json input_hint; the
reference's analog is the per-tile LAS point table
(src/upcp/pipeline.py:123-129). Three sources:

- ``pages_from_orders``: geocodes the driver's TPC-H-ish ``orders``
  parquet (o_orderkey → page_id) — the correctness-gate fact table.
- ``synthetic_pages``: ``spark.range``-based generator at arbitrary row
  count — the bench/scaling fact table (seeded, no external data).
- ``synthetic_html_pages``: adds the (url, warc_ts, html, lang) payload
  for the html→text byte-identical invariant tests.

All are map-only: geocode + tile assignment fold into the scan
projection (no shuffle), which is what makes tile assignment of a
10^12-row table a single pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..geocode import geocode
from ..tiling import with_tiles


def spread_small_scan(df: DataFrame) -> DataFrame:
    """Single-file test parquet arrives as one input split, which would
    serialize every downstream stage on one core. Round-robin the rows
    across the default parallelism BEFORE the compute-heavy projection
    (the shuffle carries only the scanned columns). At production scale
    the scan has many splits and this is a no-op."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def pages_from_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("page_id")
    )
    return with_tiles(geocode(spread_small_scan(df)))


def synthetic_pages(spark: SparkSession, n_rows: int,
                    partitions: int | None = None,
                    start: int = 0) -> DataFrame:
    """Deterministic pages over ids [start, start + n_rows) — `start`
    lets multi-executor shards carve disjoint ranges of one input."""
    end = start + n_rows
    rng = (
        spark.range(start, end, 1, partitions)
        if partitions
        else spark.range(start, end)
    )
    return with_tiles(geocode(rng.select(F.col("id").alias("page_id"))))


def synthetic_html_pages(spark: SparkSession, n_rows: int,
                         partitions: int | None = None) -> DataFrame:
    """Pages with web payload (FIXTURES.md §1): url/warc_ts/html/lang.

    The html body embeds a token derived with sha1 — computed JVM-side
    with F.sha1 so generation itself is codegen'd, no Python UDF.
    """
    df = synthetic_pages(spark, n_rows, partitions)
    i = F.col("page_id")
    tok = F.substring(F.sha1(F.concat(F.lit("42:"), i.cast("string"))), 1, 8)
    url = F.concat(
        F.lit("https://site"), (i % 997).cast("string"), F.lit(".example/"),
        F.lpad(i.cast("string"), 12, "0"),
    )
    body = F.concat(F.lit("doc "), i.cast("string"), F.lit(" tok "), tok)
    html = F.concat(
        F.lit("<html><body><p>"), body, F.lit("</p></body></html>")
    ).cast("binary")
    return df.withColumns(
        {
            "url": url,
            "warc_ts": F.timestamp_seconds(F.lit(1609459200) + (i % 86400)),
            "html": html,
            "lang": F.element_at(
                F.array(F.lit("nl"), F.lit("en"), F.lit("de"), F.lit("fr")),
                (i % 4 + 1).cast("int"),
            ),
        }
    )
