#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline query suite at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": <total sec>, "unit": "sec",
"queries": {name: sec, ...}, "sf": ..., "pages_per_sec": ...}.

Each query is forced to full materialization with the `noop` sink (no
collect-to-driver skew in the timing). A warm-up query absorbs JVM/
codegen start-up so per-query numbers measure the plan, not the JIT.

Scaling evidence (BASELINE.json north_rule: ≥0.8 efficiency from N to
4N executors; sandbox protocol per SURVEY.md §6): `bench.py --scaling`
re-execs this script at local[8] and local[32] on the SAME input and
reports throughput at both plus efficiency = (T8/T32)/(32/8).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# Headline suite: the reference-derived spatial operators plus the
# training-data pipeline operators (SURVEY.md §2). Names must exist in
# the queries() registry.
HEADLINE = [
    "tile_histogram",
    "pip_join",
    "raster_lookup",
    "pipeline_labels",
    "bbox_join",
    "nearest_object",
    "knn_idw",
    "binned_stats",
    "connected_components",
    "exact_dedup",
    "text_stats",
    "minhash_lsh",
    "simhash_neardup",
    "cosine_topk",
    "ann_lsh_topk",
    "media_features",
]

# Queries timed for the scaling ratio: the flagship spatial-join +
# tile-assignment path (throughput metric of BASELINE.json).
SCALING = ["tile_histogram", "pip_join", "pipeline_labels"]

# Rows for the synthetic scaling input: the sf0.1 parquet (150k rows)
# finishes in seconds and scheduler overhead dominates, so the scaling
# protocol uses a deterministic spark.range-generated pages table big
# enough to be compute-bound at 32 cores (no external data, same
# generator as the test fixtures).
SCALE_ROWS = int(os.environ.get("SPARK_GRAFT_SCALE_ROWS", 60_000_000))


def _run_scaling() -> dict:
    """Flagship spatial pipeline (geocode → tile-assign → PIP join →
    raster enrich → first-writer-wins label fold → label histogram)
    over SCALE_ROWS synthetic pages at local[$SPARK_GRAFT_CPUS]."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import functions as F

    from urban_pointcloud_processing_spark import queries as Q
    from urban_pointcloud_processing_spark.operators.fusers import (
        BelowGroundNoiseFilter,
        BuildingFuser,
        GroundSurfaceFuser,
        PipEnricher,
        RasterEnricher,
        RoadFuser,
    )
    from urban_pointcloud_processing_spark.plans.pipeline import Pipeline
    from urban_pointcloud_processing_spark.session import get_spark
    from urban_pointcloud_processing_spark.sources.layers import (
        ROAD_TYPES,
        polygon_edges_df,
    )
    from urban_pointcloud_processing_spark.sources.pages import synthetic_pages
    from urban_pointcloud_processing_spark.sources.raster import raster_df

    cores = int(CPUS)
    spark = get_spark(master=f"local[{CPUS}]", app_name="upcp-scaling")
    pages = synthetic_pages(spark, SCALE_ROWS, partitions=4 * cores)
    edges = polygon_edges_df(spark)
    pipe = Pipeline(
        [
            GroundSurfaceFuser(epsilon=0.2),
            RoadFuser(edges.filter(F.col("bgt_type").isin(*ROAD_TYPES))),
            BelowGroundNoiseFilter(epsilon=0.2),
            BuildingFuser(edges.filter(F.col("bgt_type") == "pand"), ahn_eps=0.2),
        ]
    )

    enrich_pip = PipEnricher(
        edges, {"_in_road": list(ROAD_TYPES), "_in_building": ["pand"]}
    )

    def job():
        labelled = pipe.run_fused(enrich_pip(RasterEnricher(raster_df(spark))(pages)))
        labelled.groupBy("label").agg(F.count("*").alias("n")).write.mode(
            "overwrite"
        ).format("noop").save()

    job()  # warm-up (JVM + codegen)
    # The sandbox host is shared (external load spikes to 15+); take the
    # MIN over several reps — contention only ever adds time, so the
    # minimum is the least-polluted estimate of true job cost.
    reps = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", 3))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        job()
        best = min(best, time.perf_counter() - t0)
    dt = best
    spark.stop()
    return {
        "queries": {"flagship_pipeline": round(dt, 3)},
        "pages_per_sec": round(SCALE_ROWS / dt),
        "n_pages": SCALE_ROWS,
        "loadavg": [round(v, 1) for v in os.getloadavg()],
    }


def _run_suite(names: list[str]) -> dict:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from urban_pointcloud_processing_spark import queries as Q
    from urban_pointcloud_processing_spark.session import get_spark

    spark = get_spark(master=f"local[{CPUS}]", app_name="upcp-bench")
    registry = Q.queries()

    # Warm-up: JVM + codegen + parquet footer caches.
    registry["tile_assign"](spark, SF_DIR).write.mode("overwrite").format(
        "noop"
    ).save()

    n_pages = spark.read.parquet(f"{SF_DIR}/orders.parquet").count()
    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        registry[name](spark, SF_DIR).write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 3)
    spark.stop()
    return {"timings": timings, "n_pages": n_pages}


def main() -> None:
    if "--scaling" in sys.argv:
        results = {}
        for cores in ("8", "32"):
            env = dict(os.environ, SPARK_GRAFT_CPUS=cores)
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--suite-scaling"],
                env=env, capture_output=True, text=True, check=True,
            )
            results[cores] = json.loads(out.stdout.strip().splitlines()[-1])
        t8 = sum(results["8"]["queries"].values())
        t32 = sum(results["32"]["queries"].values())
        eff = (t8 / t32) / (32 / 8)
        print(json.dumps({
            "metric": "scaling efficiency local[8]→local[32], flagship "
                      "pipeline over %d synthetic pages" % SCALE_ROWS,
            "value": round(eff, 3),
            "unit": "efficiency",
            "n_pages": SCALE_ROWS,
            "t_local8_sec": round(t8, 3),
            "t_local32_sec": round(t32, 3),
            "pages_per_sec_local8": results["8"]["pages_per_sec"],
            "pages_per_sec_local32": results["32"]["pages_per_sec"],
            "queries_local8": results["8"]["queries"],
            "queries_local32": results["32"]["queries"],
            "loadavg_local8": results["8"].get("loadavg"),
            "loadavg_local32": results["32"].get("loadavg"),
        }))
        return

    if "--suite-scaling" in sys.argv:
        out = _run_scaling()
        print(json.dumps({
            "metric": "flagship pipeline, local[%s]" % CPUS,
            "value": sum(out["queries"].values()),
            "unit": "sec",
            "queries": out["queries"],
            "pages_per_sec": out["pages_per_sec"],
            "n_pages": out["n_pages"],
        }))
        return

    res = _run_suite(HEADLINE)
    timings, n_pages = res["timings"], res["n_pages"]
    total = round(sum(timings.values()), 3)
    flagship = sum(timings[n] for n in SCALING if n in timings)
    print(json.dumps({
        "metric": "headline suite wall time (spatial join + tiling + "
                  "training-data ops), local[%s]" % CPUS,
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "n_pages": n_pages,
        "pages_per_sec": round(3 * n_pages / flagship) if flagship else None,
    }))


if __name__ == "__main__":
    main()
