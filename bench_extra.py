#!/usr/bin/env python
"""Round-6 optimization measurement harness (guide §1).

NOT the driver contract — bench.py stays frozen. This file exists to:

- time individual queries in isolation with the noop sink, splitting
  per rep the DataFrame *construction* time (driver-side plan building,
  including any eager localCheckpoint jobs inside query builders) from
  the *execution* time of the final noop write;
- dump `.explain("formatted")` for each query to plans/r06/ so plan
  claims in OPTIMIZATION_r06.md are auditable.

Usage:
  python bench_extra.py q1 q2 ...          # time queries (default: headline)
  python bench_extra.py --plans q1 q2 ...  # also dump plans/r06/<q>_<TAG>.txt
  SPARK_GRAFT_PLAN_TAG=before python bench_extra.py --plans ...
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPS = int(os.environ.get("SPARK_GRAFT_EXTRA_REPS", "3"))
TAG = os.environ.get("SPARK_GRAFT_PLAN_TAG", "before")

HEADLINE = [
    "tile_histogram", "pip_join", "raster_lookup", "pipeline_labels",
    "bbox_join", "nearest_object", "knn_idw", "binned_stats",
    "connected_components", "exact_dedup", "text_stats", "minhash_lsh",
    "simhash_neardup", "cosine_topk", "ann_lsh_topk", "media_features",
    "pca_linearity", "geocode_wgs84", "knn_label_fusion", "raster_build",
]


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from urban_pointcloud_processing_spark import queries as Q
    from urban_pointcloud_processing_spark.session import get_spark

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    dump_plans = "--plans" in sys.argv
    names = args or HEADLINE

    spark = get_spark(master=f"local[{CPUS}]", app_name="upcp-bench-extra")
    registry = Q.queries()

    # Same warm-up as bench.py: JVM/codegen/parquet footers + Python workers.
    registry["tile_assign"](spark, SF_DIR).write.mode("overwrite").format(
        "noop").save()
    registry["doc_fingerprint"](spark, SF_DIR).write.mode("overwrite").format(
        "noop").save()

    plan_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "plans", "r06")
    os.makedirs(plan_dir, exist_ok=True)

    out = {}
    for name in names:
        sc = spark.sparkContext
        best_total = best_build = best_exec = float("inf")
        loads = []
        for _ in range(REPS):
            sc.setJobDescription(f"{name}: build")
            t0 = time.perf_counter()
            df = registry[name](spark, SF_DIR)
            t1 = time.perf_counter()
            sc.setJobDescription(f"{name}: exec")
            df.write.mode("overwrite").format("noop").save()
            t2 = time.perf_counter()
            sc.setJobDescription(None)
            if t2 - t0 < best_total:
                best_total, best_build, best_exec = t2 - t0, t1 - t0, t2 - t1
            loads.append(round(os.getloadavg()[0], 1))
        out[name] = {
            "total": round(best_total, 3),
            "build": round(best_build, 3),
            "exec": round(best_exec, 3),
            "loadavg": loads,
        }
        if dump_plans:
            df = registry[name](spark, SF_DIR)
            with open(os.path.join(plan_dir, f"{name}_{TAG}.txt"), "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        print(json.dumps({name: out[name]}), flush=True)
    spark.stop()
    total = round(sum(v["total"] for v in out.values()), 3)
    print(json.dumps({"metric": "bench_extra total", "value": total,
                      "unit": "sec", "queries": out, "sf": SF_DIR,
                      "reps": REPS}))


if __name__ == "__main__":
    main()
