"""Public API façade (api.py — SURVEY.md §7.4): the reference
notebook chain (`0. Complete solution.ipynb`) expressed through
Engine → readers → Pipeline.run → label_statistics."""

from __future__ import annotations

from pyspark.sql import functions as F

from urban_pointcloud_processing_spark.api import (
    Engine,
    Labels,
    full_pipeline_processors,
)
from urban_pointcloud_processing_spark.plans.full_pipeline import (
    full_pipeline_labels,
)

SF_DIR = "/root/testdata/sf0.001"


def test_engine_readers_expose_reference_layers(spark):
    eng = Engine(spark)
    assert eng.pages(SF_DIR).count() == 1500
    assert {"tile_x", "tile_y", "x", "y", "z"} <= set(
        eng.pages(SF_DIR).columns
    )
    assert eng.raster().count() > 0
    assert eng.point_layer().filter(F.col("bgt_type") == "boom").count() > 0
    assert eng.polygon_edges().count() > 0
    assert eng.line_layer().count() > 0


def test_engine_pipeline_matches_canonical_fold(spark):
    """The notebook chain via the façade must reproduce the canonical
    15-stage fold exactly, and expose per-stage metrics + reference
    get_label_stats output."""
    eng = Engine(spark)
    pipe = eng.pipeline()
    labelled = pipe.run(eng.enriched_pages(SF_DIR))

    got = {r["page_id"]: r["label"]
           for r in labelled.select("page_id", "label").collect()}
    want = {r["page_id"]: r["label"]
            for r in full_pipeline_labels(spark, SF_DIR).collect()}
    assert got == want

    # one metric row per stage, claimed counts consistent
    assert [m.name for m in pipe.metrics] == [
        p.name for p in full_pipeline_processors()
    ]
    ground = next(m for m in pipe.metrics if m.name == "ground_refine")
    assert ground.rows_claimed == sum(
        1 for v in want.values() if v == int(Labels.GROUND)
    ) + sum(1 for v in want.values() if v == int(Labels.ROAD))
    # ^ road retarget rewrites GROUND→ROAD later; at fold time the
    #   ground stage claimed both populations

    stats = {r["label"]: r for r in pipe.label_statistics(labelled).collect()}
    assert abs(sum(r["perc"] for r in stats.values()) - 100.0) < 0.5
    assert stats[int(Labels.GROUND)]["n_points"] == sum(
        1 for v in want.values() if v == int(Labels.GROUND)
    )
