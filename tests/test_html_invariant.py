"""Per-row invariant (BASELINE.json input_hint): byte-identical
extracted text per url, against an independent Python golden."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from urban_pointcloud_processing_spark.functions.html import extract_text_col
from urban_pointcloud_processing_spark.sources.pages import synthetic_html_pages


def test_html_extraction_byte_identical(spark):
    pages = synthetic_html_pages(spark, 500)
    out = pages.select(
        "page_id", "url", extract_text_col(F.col("html")).alias("text")
    ).collect()
    assert len(out) == 500
    for r in out:
        i = r["page_id"]
        tok = hashlib.sha1(f"42:{i}".encode()).hexdigest()[:8]
        golden = f"doc {i} tok {tok}"
        assert r["text"] == golden, (i, r["text"], golden)
        assert r["text"].encode("utf-8") == golden.encode("utf-8")


def test_html_entities_and_whitespace(spark):
    rows = [
        (0, b"<html><p>a &amp; b</p>\n\n<p>c &lt;d&gt;</p></html>"),
        (1, b"  <div>x</div>\t<div>y</div>  "),
        (2, b"&amp;lt;"),  # double-encoded: must decode to "&lt;" not "<"
    ]
    df = spark.createDataFrame(rows, ["i", "html"])
    got = {
        r["i"]: r["t"]
        for r in df.select("i", extract_text_col(F.col("html")).alias("t")).collect()
    }
    assert got[0] == "a & b c <d>"
    assert got[1] == "x y"
    assert got[2] == "&lt;"
