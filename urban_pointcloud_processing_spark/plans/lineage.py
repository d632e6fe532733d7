"""Per-stage, per-partition lineage + metrics table.

North-rule requirement (BASELINE.json): "Every stage writes
per-partition lineage and metrics ... so the job is resumable from
checkpoint mid-pipeline". The partition unit is the tile (the
reference's unit of work, src/upcp/pipeline.py:186-194); every pipeline
stage appends one row per tile with rows-in/rows-claimed/label counts,
keyed by (run_id, stage_idx, stage_name).

Storage is a parquet table partitioned by ``stage_idx`` (the
Iceberg-append analog available in this sandbox — swap the writer for
``df.writeTo(...).append()`` on a real cluster). The append is
idempotent per (run_id, stage): resume reruns overwrite their own
partition only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TILE_KEYS = ("tile_x", "tile_y")


def stage_lineage(
    before: DataFrame, after: DataFrame, label: int | list[int]
) -> DataFrame:
    """Per-tile rows-in / rows-out / rows-now-carrying-this-label.
    One shuffle per side (map-side combined counts). ``label`` may be
    a list for fused stage families — rows carrying ANY of them."""
    labels = [int(label)] if isinstance(label, int) else [int(x) for x in label]
    keys = [k for k in TILE_KEYS if k in after.columns]
    if not keys:
        after = after.withColumn("tile_x", F.lit(-1)).withColumn(
            "tile_y", F.lit(-1)
        )
        before = before.withColumn("tile_x", F.lit(-1)).withColumn(
            "tile_y", F.lit(-1)
        )
        keys = list(TILE_KEYS)
    b = before.groupBy(*keys).agg(F.count("*").alias("rows_in"))
    a = after.groupBy(*keys).agg(
        F.count("*").alias("rows_out"),
        F.sum(F.col("label").isin(labels).cast("long")).alias(
            "rows_labelled"
        ),
    )
    return b.join(a, keys, "full").select(
        *keys,
        F.coalesce("rows_in", F.lit(0)).alias("rows_in"),
        F.coalesce("rows_out", F.lit(0)).alias("rows_out"),
        F.coalesce("rows_labelled", F.lit(0)).alias("rows_labelled"),
    )


def append_stage_lineage(
    lineage_dir: str,
    run_id: str,
    stage_idx: int,
    stage_name: str,
    before: DataFrame,
    after: DataFrame,
    label: int | list[int],
    wall_sec: float,
) -> None:
    rows = (
        stage_lineage(before, after, label)
        .withColumn("run_id", F.lit(run_id))
        .withColumn("stage_idx", F.lit(stage_idx))
        .withColumn("stage_name", F.lit(stage_name))
        .withColumn("wall_sec", F.lit(float(wall_sec)))
    )
    (
        rows.write.mode("overwrite")
        .partitionBy("run_id", "stage_idx")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(lineage_dir)
    )


def read_lineage(spark: SparkSession, lineage_dir: str) -> DataFrame:
    return spark.read.parquet(lineage_dir)
