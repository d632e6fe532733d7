"""Salting + adaptive repartition semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from urban_pointcloud_processing_spark.operators.skew import (
    cell_frequency_sketch,
    salted_count,
    salted_repartition,
)


def _skewed(spark):
    # one hot cell (9000 rows in tile (0,0)), nine cold cells of 100
    hot = spark.range(9000).select(
        F.col("id").alias("page_id"), F.lit(0).alias("tile_x"), F.lit(0).alias("tile_y")
    )
    cold = spark.range(9000, 9900).select(
        F.col("id").alias("page_id"),
        (F.col("id") % 3 + 1).cast("int").alias("tile_x"),
        (F.col("id") % 3 + 1).cast("int").alias("tile_y"),
    )
    return hot.unionAll(cold)


def test_frequency_sketch_finds_hot_cells(spark):
    df = _skewed(spark)
    hot = cell_frequency_sketch(df, ["tile_x", "tile_y"], target_rows=1000).collect()
    assert len(hot) == 1
    assert (hot[0]["tile_x"], hot[0]["tile_y"]) == (0, 0)
    assert hot[0]["_salt_factor"] == 9  # ceil(9000/1000)


def test_salted_repartition_splits_hot_cell(spark):
    df = _skewed(spark)
    out = salted_repartition(
        df, ["tile_x", "tile_y"], target_rows=1000, num_partitions=16
    )
    # no rows lost or duplicated
    assert out.count() == 9900
    # the hot cell fans out over >1 salt value → >1 partition
    hot_salts = (
        out.filter((F.col("tile_x") == 0) & (F.col("tile_y") == 0))
        .select("_salt").distinct().count()
    )
    assert hot_salts == 9
    # max rows co-located for the hot cell shrinks to ~target
    per_task = (
        out.filter((F.col("tile_x") == 0) & (F.col("tile_y") == 0))
        .groupBy("_salt").count().agg(F.max("count")).collect()[0][0]
    )
    assert per_task < 2000


def test_salted_count_matches_plain_count(spark):
    df = _skewed(spark)
    plain = {
        (r["tile_x"], r["tile_y"]): r["n"]
        for r in df.groupBy("tile_x", "tile_y").agg(F.count("*").alias("n")).collect()
    }
    salted = {
        (r["tile_x"], r["tile_y"]): r["n_rows"]
        for r in salted_count(df, ["tile_x", "tile_y"]).collect()
    }
    assert plain == salted


def test_salted_knn_candidates_identical_to_unsalted(spark):
    """Salted (cell, salt) join must return the exact same candidate
    pair set as the plain cell join — salting only changes layout."""
    from urban_pointcloud_processing_spark.operators.neighbors import (
        knn_candidates_shuffle,
    )

    # hot cell: 400 probe points clustered at origin; cold elsewhere
    probe = [(i, (i % 20) * 0.1, (i // 20 % 20) * 0.1) for i in range(400)]
    probe += [(1000 + i, 50.0 + i, 50.0) for i in range(10)]
    build = [(i, (i % 5) * 0.3, (i % 7) * 0.3, i % 3) for i in range(30)]
    build += [(100 + i, 50.0 + i, 50.0, 1) for i in range(10)]
    pdf = spark.createDataFrame(probe, ["page_id", "x", "y"])
    bdf = spark.createDataFrame(build, ["nb_id", "x", "y", "label"])

    def pairs(salt_target):
        rows = knn_candidates_shuffle(
            pdf, bdf, max_dist=5.0, build_id="nb_id",
            build_cols=("label",), salt_target=salt_target,
        ).collect()
        return {(r["page_id"], r["nb_id"], r["dist_sq"]) for r in rows}

    unsalted = pairs(None)
    salted = pairs(50)  # hot cell (400 rows) far above target
    assert salted == unsalted
    assert len(unsalted) > 0


def test_salted_simhash_neardup_identical(spark):
    from urban_pointcloud_processing_spark.operators.dedup import simhash_neardup

    texts = ["alpha beta gamma delta"] * 6 + [
        "alpha beta gamma epsilon", "one two three four",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )

    def pairs(salt_target):
        return {
            (r["doc_a"], r["doc_b"], r["hamming"])
            for r in simhash_neardup(docs, salt_target=salt_target).collect()
        }

    unsalted = pairs(None)
    salted = pairs(2)  # every identical-text bucket exceeds the target
    assert salted == unsalted
    assert len(unsalted) >= 15  # 6 identical docs -> C(6,2) pairs
