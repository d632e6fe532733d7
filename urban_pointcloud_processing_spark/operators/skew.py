"""Skew handling: frequency-sketch pre-pass + explicit salting +
adaptive repartitioning on spatial-cell prefix.

North-rule requirement (BASELINE.json): dense urban cells concentrate
Common-Crawl pages; AQE's skew-join split helps shuffle joins but NOT
hot partitions feeding grouped-map UDFs or per-tile writers. The
engine therefore:

1. runs a cheap frequency sketch — ``groupBy(cell).count()`` over a
   map-side-combined single pass (SURVEY.md §4 item 1);
2. derives a per-cell salt factor ``ceil(count / target_rows)``;
3. repartitions on ``(cell, salt)`` where ``salt = pmod(xxhash64(id),
   factor)`` — hot cells fan out across that many tasks, cold cells
   keep salt 0 and stay single-task.

Salting is exact for *row-local* work (labelling, UDF batches, sinks).
For per-cell aggregates, ``salted_count`` shows the canonical
two-stage partial→final pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cell_frequency_sketch(
    df: DataFrame, cell_cols: list[str], target_rows: int
) -> DataFrame:
    """(cell → salt_factor) for cells larger than target_rows. One
    map-side-combined pass; output is tiny (only hot cells) and is
    broadcast into the salting join."""
    return (
        df.groupBy(*cell_cols)
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") > target_rows)
        .select(
            *cell_cols,
            F.ceil(F.col("_n") / F.lit(target_rows)).cast("int").alias("_salt_factor"),
        )
    )


def salted_repartition(
    df: DataFrame,
    cell_cols: list[str],
    target_rows: int = 1_000_000,
    id_col: str = "page_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Adaptive repartition on (cells..., salt): hot cells (> target_rows)
    split into ceil(n/target) salted sub-partitions; others keep salt 0."""
    hot = cell_frequency_sketch(df, cell_cols, target_rows)
    salted = (
        df.join(F.broadcast(hot), cell_cols, "left")
        .withColumn(
            "_salt",
            F.when(
                F.col("_salt_factor").isNotNull(),
                F.pmod(F.xxhash64(F.col(id_col)), F.col("_salt_factor")).cast("int"),
            ).otherwise(F.lit(0)),
        )
        .drop("_salt_factor")
    )
    keys = [F.col(c) for c in cell_cols] + [F.col("_salt")]
    if num_partitions:
        return salted.repartition(num_partitions, *keys)
    return salted.repartition(*keys)


def salted_count(
    df: DataFrame, cell_cols: list[str], salt_mod: int = 16
) -> DataFrame:
    """Two-stage skew-safe count: partial per (cells, salt) then final
    per cells. (Spark's hash aggregate already map-side-combines counts;
    this is the explicit pattern for aggregates that don't, e.g.
    collect_list/exact-median over hot cells.)"""
    salted = df.withColumn(
        "_salt", F.pmod(F.spark_partition_id(), F.lit(salt_mod))
    )
    partial = salted.groupBy(*cell_cols, "_salt").agg(
        F.count("*").alias("_pn")
    )
    return partial.groupBy(*cell_cols).agg(F.sum("_pn").alias("n_rows"))
