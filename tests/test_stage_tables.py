"""Per-tile stage tables: dynamic-partition-overwrite semantics
(VERDICT r04 item 8 — the parquet-closest analog of Iceberg
overwritePartitions; reference per-tile resume
scripts/ahn_batch_processor.py:53-57)."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from urban_pointcloud_processing_spark.plans.stage_tables import (
    missing_partitions,
    present_partitions,
    resume_stage_by_tile,
    write_stage_partitions,
)
from urban_pointcloud_processing_spark.sources.pages import pages_from_orders

SF = "/root/testdata/sf0.001"


def _tiled(spark):
    """(page_id, tilecode, label-ish payload) — the engine's 50 m tile
    assignment over the pages fixture, a real tile-partitioned stage
    shape."""
    pages = pages_from_orders(spark, SF)
    tilecode = F.concat_ws(
        "_",
        F.floor(F.col("x") / 50.0).cast("string"),
        F.floor(F.col("y") / 50.0).cast("string"),
    )
    return pages.select(
        "page_id",
        tilecode.alias("tilecode"),
        (F.col("page_id") % 97).alias("payload"),
    )


def _files(root):
    out = {}
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(".crc") or f == "_SUCCESS":
                continue
            p = os.path.join(dirpath, f)
            with open(p, "rb") as fh:
                out[os.path.relpath(p, root)] = fh.read()
    return out


def test_dynamic_overwrite_replaces_only_written_tiles(spark):
    tmp = tempfile.mkdtemp(prefix="upcp_stage_tiles_")
    try:
        df = _tiled(spark)
        tiles = {r["tilecode"] for r in df.select("tilecode").distinct().collect()}
        assert len(tiles) >= 3, "fixture needs >=3 tiles"
        write_stage_partitions(df, tmp)
        assert present_partitions(spark, tmp) == tiles
        before = _files(tmp)

        # overwrite ONE tile's rows (same values) — only that tile's
        # files may change; every other partition stays byte-identical
        one = sorted(tiles)[0]
        write_stage_partitions(df.filter(F.col("tilecode") == one), tmp)
        after = _files(tmp)
        changed_dirs = {
            p.split(os.sep)[0]
            for p in set(before) ^ set(after)
            | {p for p in before if p in after and before[p] != after[p]}
        }
        assert changed_dirs <= {f"tilecode={one}"}, changed_dirs
        # row-level: no duplicates, full table intact
        got = spark.read.parquet(tmp)
        assert got.count() == df.count()
        assert got.groupBy("page_id").count().filter("count > 1").count() == 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_resume_recomputes_only_missing_tiles(spark):
    tmp = tempfile.mkdtemp(prefix="upcp_stage_resume_")
    try:
        df = _tiled(spark)
        tiles = {r["tilecode"] for r in df.select("tilecode").distinct().collect()}
        write_stage_partitions(df, tmp)

        # simulate a mid-run kill: two tiles never landed
        lost = set(sorted(tiles)[:2])
        for t in lost:
            shutil.rmtree(os.path.join(tmp, f"tilecode={t}"))
        assert missing_partitions(spark, tmp, tiles) == lost
        untouched_before = {
            p: b for p, b in _files(tmp).items()
            if p.split(os.sep)[0] not in {f"tilecode={t}" for t in lost}
        }

        computed: list[set] = []

        def compute(missing):
            computed.append(set(missing))
            return df.filter(F.col("tilecode").isin([*missing]))

        out, recomputed = resume_stage_by_tile(spark, tmp, tiles, compute)
        assert recomputed == lost and computed == [lost]
        assert missing_partitions(spark, tmp, tiles) == set()
        # completed tiles untouched byte-for-byte
        untouched_after = {
            p: b for p, b in _files(tmp).items() if p in untouched_before
        }
        assert untouched_after == untouched_before
        # result equals the full table, no duplicates
        assert sorted(map(tuple, out.collect())) == sorted(
            map(tuple, df.select(out.columns).collect())
        )

        # a SECOND resume over the complete table computes nothing
        out2, recomputed2 = resume_stage_by_tile(spark, tmp, tiles, compute)
        assert recomputed2 == set() and len(computed) == 1
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_resume_converges_on_zero_row_tile(spark):
    """A tile whose compute legitimately yields ZERO rows must still
    read as completed afterwards (empty partition dir), so resume
    converges instead of recomputing it on every run."""
    tmp = tempfile.mkdtemp(prefix="upcp_stage_empty_")
    try:
        df = _tiled(spark)
        tiles = {r["tilecode"] for r in df.select("tilecode").distinct().collect()}
        phantom = "999_999"  # no fixture rows land in this tile
        expected = tiles | {phantom}

        calls: list[set] = []

        def compute(missing):
            calls.append(set(missing))
            return df.filter(F.col("tilecode").isin([*missing]))

        out, rec1 = resume_stage_by_tile(spark, tmp, expected, compute)
        assert rec1 == expected and calls == [expected]
        assert missing_partitions(spark, tmp, expected) == set()
        assert out.count() == df.count()

        # second resume: nothing missing, compute not called again
        out2, rec2 = resume_stage_by_tile(spark, tmp, expected, compute)
        assert rec2 == set() and len(calls) == 1
        assert out2.count() == df.count()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
