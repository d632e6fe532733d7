"""Checkpoint-resume + per-partition lineage (north_rule: every stage
writes per-tile lineage/metrics; job resumes from checkpoint)."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from urban_pointcloud_processing_spark.operators.fusers import (
    BelowGroundNoiseFilter,
    GroundSurfaceFuser,
    RasterEnricher,
)
from urban_pointcloud_processing_spark.plans.lineage import read_lineage
from urban_pointcloud_processing_spark.plans.pipeline import Pipeline
from urban_pointcloud_processing_spark.sources.pages import pages_from_orders
from urban_pointcloud_processing_spark.sources.raster import raster_df


def _procs():
    return [GroundSurfaceFuser(epsilon=0.2), BelowGroundNoiseFilter(epsilon=0.2)]


def test_checkpoint_resume_and_lineage(spark, sf_dir):
    tmp = tempfile.mkdtemp(prefix="upcp_ckpt_")
    try:
        pages = RasterEnricher(raster_df(spark))(
            pages_from_orders(spark, "/root/testdata/sf0.001")
        )

        p1 = Pipeline(_procs(), checkpoint_dir=tmp, run_id="r1")
        out1 = p1.run(pages).select("page_id", "label").collect()
        assert p1.resumed_stages == []
        assert len(p1.metrics) == 2

        # lineage table: one row per (stage, tile) with counts
        lin = read_lineage(spark, f"{tmp}/_lineage")
        stages = {r["stage_name"] for r in lin.select("stage_name").distinct().collect()}
        assert stages == {"ground_surface", "noise_below_ground"}
        ground_claimed = (
            lin.filter(F.col("stage_name") == "ground_surface")
            .agg(F.sum("rows_labelled"))
            .collect()[0][0]
        )
        n_ground = sum(1 for r in out1 if r["label"] == 9)
        assert ground_claimed == n_ground
        # per-tile granularity: more than one tile row per stage
        assert lin.filter(F.col("stage_name") == "ground_surface").count() > 1

        # resume: a fresh pipeline over the same dir skips both stages
        p2 = Pipeline(_procs(), checkpoint_dir=tmp, run_id="r2")
        out2 = p2.run(pages).select("page_id", "label").collect()
        assert p2.resumed_stages == ["ground_surface", "noise_below_ground"]
        assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _stage_bytes(root):
    """{relpath: file bytes} for every data file under the stage dirs."""
    import os

    out = {}
    for dirpath, _, files in os.walk(root):
        if "_lineage" in dirpath:
            continue
        for f in files:
            if f.endswith(".crc"):
                continue
            p = os.path.join(dirpath, f)
            with open(p, "rb") as fh:
                out[os.path.relpath(p, root)] = fh.read()
    return out


def test_uncommitted_stage_not_resumed(spark):
    """A stage table without its _SUCCESS job-commit marker (job killed
    mid-commit / committer v2 partial output) must be RECOMPUTED, even
    though its parquet reads back fine — resuming from it would
    silently drop label state (ADVICE r04)."""
    import glob
    import os

    tmp = tempfile.mkdtemp(prefix="upcp_ckpt_uncommitted_")
    try:
        pages = RasterEnricher(raster_df(spark))(
            # repartition: the mid-commit-kill simulation below must
            # delete ONE OF SEVERAL part files, but the tiny sf0.001
            # scan stays on a single split since the round-6 spread
            # floor (sources/pages.spread_small_scan)
            pages_from_orders(spark, "/root/testdata/sf0.001").repartition(4)
        )
        p1 = Pipeline(_procs(), checkpoint_dir=tmp, run_id="r1")
        out1 = p1.run(pages).select("page_id", "label").collect()

        # simulate a mid-commit kill of stage 0: marker gone AND one
        # data file missing — readable, non-empty, but incomplete
        stage0 = f"{tmp}/stage_00_ground_surface"
        os.remove(f"{stage0}/_SUCCESS")
        parts = sorted(glob.glob(f"{stage0}/part-*"))
        assert len(parts) > 1, "fixture must write >1 part file"
        os.remove(parts[0])

        p2 = Pipeline(_procs(), checkpoint_dir=tmp, run_id="r2")
        out2 = p2.run(pages).select("page_id", "label").collect()
        # stage 0 recomputed (not resumed); stage 1 still resumes
        assert p2.resumed_stages == ["noise_below_ground"]
        assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
        assert os.path.exists(f"{stage0}/_SUCCESS")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_rerun_leaves_completed_stages_byte_identical(spark):
    """Idempotent re-run contract (reference resume analog
    scripts/ahn_batch_processor.py:53-57): re-running over a directory
    of fully committed stage tables must replace nothing and duplicate
    nothing — every stage data file stays byte-identical."""
    tmp = tempfile.mkdtemp(prefix="upcp_ckpt_idem_")
    try:
        pages = RasterEnricher(raster_df(spark))(
            pages_from_orders(spark, "/root/testdata/sf0.001")
        )
        p1 = Pipeline(_procs(), checkpoint_dir=tmp, run_id="r1")
        p1.run(pages).select("page_id", "label").collect()
        before = _stage_bytes(tmp)

        p2 = Pipeline(_procs(), checkpoint_dir=tmp, run_id="r2")
        p2.run(pages).select("page_id", "label").collect()
        assert p2.resumed_stages == ["ground_surface", "noise_below_ground"]
        assert _stage_bytes(tmp) == before
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
