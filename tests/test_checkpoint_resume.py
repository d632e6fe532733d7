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
