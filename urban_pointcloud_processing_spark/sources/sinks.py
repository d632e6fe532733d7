"""File sinks (reference las_utils.label_and_save_las + CSV writers,
src/upcp/utils/las_utils.py:186-205, scrapers' csv outputs).

At engine scale a sink is a partitioned columnar write; CSV exists for
interop with the reference's layer tooling. Deterministic layout:
repartition by tile so each output file holds one tile's rows (the
reference's one-file-per-tile convention)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_labels_csv(labelled: DataFrame, path: str,
                     partition_by_tile: bool = True) -> None:
    """Write (page_id, …, label) rows as headers-on CSV, one directory;
    tile-partitioned when the columns are present."""
    df = labelled
    writer = df.write.mode("overwrite").option("header", "true")
    if partition_by_tile and "tile_x" in df.columns and "tile_y" in df.columns:
        writer = writer.partitionBy("tile_x", "tile_y")
    writer.csv(path)


def read_labels_csv(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.option("header", "true").option(
        "inferSchema", "true"
    ).csv(path)
