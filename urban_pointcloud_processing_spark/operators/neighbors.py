"""Distance joins: nearest-match, bounded kNN + IDW, binned statistics.

Reference semantics re-created:
- nearest-match with distance cap: street_furniture_fuser.py:80-85,
  pole_fuser.py:203-208 (argmin over small object set).
- kNN + IDW: SpatialInterpolator (src/upcp/utils/interpolation.py:
  119-308) — k neighbours within max_dist, weights 1/(d^p + reg),
  weighted average; 'max' variant returns max of neighbours.
- 2-D binned statistics: pole_fuser.py:171-196 (binned_statistic_2d
  min/max/median/count per voxel column).

Spark strategy (SURVEY.md §2.3): every theta-join becomes an equi-join
on spatial-cell keys + residual distance predicate. The build side is
exploded to its 3×3 cell neighbourhood (grid_disk ring-1), the probe
joins on its own cell — with cell_res ≥ max_dist this is exhaustive,
so results are EXACT, not approximate. Distances are compared as
squared distances (exact double arithmetic, no sqrt) and top-k uses a
deterministic (dist_sq, obj_id) tie-break (SURVEY.md §7.3 item 3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..tiling import cell_x, cell_y, neighbor_cells


def _dist_sq(ax, ay, bx, by):
    dx, dy = ax - bx, ay - by
    return dx * dx + dy * dy


def knn_candidates(
    probe: DataFrame,
    build: DataFrame,
    max_dist: float,
    probe_id: str = "page_id",
    build_id: str = "obj_id",
    build_cols: tuple[str, ...] = ("bgt_type", "z"),
    cell_res: float | None = None,
) -> DataFrame:
    """(probe × build) candidate pairs within max_dist, via the
    cell-neighborhood broadcast index. Exact when cell_res ≥ max_dist."""
    cell_res = cell_res or max_dist
    bx, by = F.col("_bx"), F.col("_by")
    build_idx = (
        build.select(
            F.col(build_id),
            F.col("x").alias("_bx"),
            F.col("y").alias("_by"),
            *[F.col(c) for c in build_cols],
        )
        .withColumn(
            "_cell",
            F.explode(neighbor_cells(cell_x(bx, cell_res), cell_y(by, cell_res))),
        )
    )
    probe_keyed = probe.select(probe_id, "x", "y").withColumn(
        "_cell",
        cell_x(F.col("x"), cell_res) * F.lit(1 << 31) + cell_y(F.col("y"), cell_res),
    )
    d2 = _dist_sq(F.col("x"), F.col("y"), bx, by)
    return (
        probe_keyed.join(F.broadcast(build_idx), "_cell")
        .withColumn("dist_sq", d2)
        .filter(F.col("dist_sq") <= F.lit(max_dist * max_dist))
        .drop("_cell", "_bx", "_by")
    )


def knn_candidates_shuffle(
    probe: DataFrame,
    build: DataFrame,
    max_dist: float,
    probe_id: str = "page_id",
    build_id: str = "obj_id",
    build_cols: tuple[str, ...] = ("label",),
    cell_res: float | None = None,
    salt_target: int | None = None,
    join_hint: str | None = None,
    keep_keys: bool = False,
) -> DataFrame:
    """Shuffle-join twin of ``knn_candidates`` for BUILD SIDES THAT
    SCALE WITH THE DATA (e.g. labeled pages feeding label propagation):
    both sides are keyed by spatial cell, the build side explodes to
    its 3×3 neighborhood, and the join is a plain equi-join on the cell
    key — sort-merge/shuffle-hash at scale, never a broadcast. Exact
    for cell_res ≥ max_dist (same guarantee as the broadcast variant).

    ``salt_target`` arms explicit skew salting (operators/skew.py, the
    north-rule dense-urban-cell case AQE's join split does not fully
    cover): probe cells holding more than salt_target rows spread over
    ceil(n/target) salt values (pmod of the probe id hash) and the
    build rows of those cells replicate to every salt — the join key
    becomes (cell, salt), each probe×build pair still meets exactly
    once, so the result set is IDENTICAL to the unsalted join
    (tests/test_skew.py asserts this).

    ``join_hint`` (e.g. 'merge') pins the join strategy — used by
    bench.py's skew fixture to reproduce the at-scale sort-merge shape
    when the synthetic build side is small enough that Catalyst would
    broadcast it (at 10^12 rows the build side never fits a
    broadcast, so SMJ/shuffle-hash is the real plan)."""
    cell_res = cell_res or max_dist
    bx, by = F.col("_bx"), F.col("_by")
    build_idx = (
        build.select(
            F.col(build_id),
            F.col("x").alias("_bx"),
            F.col("y").alias("_by"),
            *[F.col(c) for c in build_cols],
        )
        .withColumn(
            "_cell",
            F.explode(neighbor_cells(cell_x(bx, cell_res), cell_y(by, cell_res))),
        )
    )
    probe_keyed = probe.select(probe_id, "x", "y").withColumn(
        "_cell",
        cell_x(F.col("x"), cell_res) * F.lit(1 << 31) + cell_y(F.col("y"), cell_res),
    )
    d2 = _dist_sq(F.col("x"), F.col("y"), bx, by)
    keys = ["_cell"]
    if salt_target:
        from .skew import cell_frequency_sketch

        hot = cell_frequency_sketch(probe_keyed, ["_cell"], salt_target)
        probe_keyed = (
            probe_keyed.join(F.broadcast(hot), "_cell", "left")
            .withColumn(
                "_salt",
                F.when(
                    F.col("_salt_factor").isNotNull(),
                    F.pmod(
                        F.xxhash64(F.col(probe_id)), F.col("_salt_factor")
                    ).cast("int"),
                ).otherwise(F.lit(0)),
            )
            .drop("_salt_factor")
        )
        build_idx = (
            build_idx.join(F.broadcast(hot), "_cell", "left")
            .withColumn(
                "_salt",
                F.explode(
                    F.when(
                        F.col("_salt_factor").isNotNull(),
                        F.sequence(
                            F.lit(0), F.col("_salt_factor") - F.lit(1)
                        ),
                    ).otherwise(F.array(F.lit(0)))
                ),
            )
            .drop("_salt_factor")
        )
        keys = ["_cell", "_salt"]
    if join_hint:
        build_idx = build_idx.hint(join_hint)
    out = (
        probe_keyed.join(build_idx, keys)
        .withColumn("dist_sq", d2)
        .filter(F.col("dist_sq") <= F.lit(max_dist * max_dist))
    )
    # keep_keys: a probe row has exactly one (cell[, salt]), so a
    # downstream per-probe aggregation can group by (keys..., probe_id)
    # — identical groups, and when the join ran as a shuffle join its
    # cell hash-partitioning already satisfies that clustering, so the
    # aggregation adds NO exchange (guide §2.4: share one exchange)
    drop = ["_bx", "_by"] if keep_keys else [*keys, "_bx", "_by"]
    return out.drop(*drop)


def knn_label_fusion(
    probe: DataFrame,
    labeled: DataFrame,
    k: int = 5,
    max_dist: float = 20.0,
    probe_id: str = "page_id",
    build_id: str = "nb_id",
    label_col: str = "label",
    salt_target: int | None = 500_000,
) -> DataFrame:
    """kNN label propagation (north_star: "k-nearest-neighbor label
    fusion"): each probe row takes the MAJORITY label of its k nearest
    labeled rows within max_dist; ties break to the smaller label, the
    neighbor set is deterministic via (dist_sq, id) ordering. The
    labeled side scales with the data → shuffle cell join, no
    broadcast. Cells above salt_target probe rows take the salted join
    path (identical results; see knn_candidates_shuffle)."""
    cand = knn_candidates_shuffle(
        probe, labeled, max_dist, probe_id, build_id, (label_col,),
        salt_target=salt_target, keep_keys=True,
    )
    join_keys = ["_cell", "_salt"] if salt_target else ["_cell"]
    # Round 6: ONE probe-keyed aggregation replaces the chain
    # row_number window → (probe,label) regroup → second window — three
    # exchanges down to one (guide §2.4). The sorted slice reproduces
    # the rn<=k neighbor set exactly ((dist_sq, build_id) ordering);
    # the majority vote with ties to the SMALLER label is computed over
    # the ≤k-element array in the projection: array_max over
    # (n_votes, -label) pairs == (n_votes DESC, label ASC) row_number=1.
    # group by (join keys..., probe_id): a probe determines its cell
    # and salt, so groups are IDENTICAL to groupBy(probe_id) — but the
    # shuffle-join's cell partitioning already satisfies the clustering
    # and the 10^2-candidates-per-probe pair table is aggregated
    # in place instead of re-shuffled (guide §2.4)
    topk = cand.groupBy(*join_keys, probe_id).agg(
        F.slice(
            F.sort_array(
                F.collect_list(F.struct("dist_sq", build_id, label_col))
            ),
            1, k,
        ).alias("_nb"),
    ).drop(*join_keys)
    labels = F.transform("_nb", lambda s: s[label_col])
    scored = topk.select(
        probe_id,
        F.array_max(
            F.transform(
                F.array_distinct(labels),
                lambda v: F.struct(
                    F.size(F.filter(labels, lambda x: x == v)).alias("n"),
                    (-v).alias("neg_label"),
                ),
            )
        ).alias("_win"),
    )
    return scored.select(
        probe_id,
        (-F.col("_win.neg_label")).alias("fused_label"),
        F.col("_win.n").cast("long").alias("n_votes"),
    )


def nearest_match(
    probe: DataFrame,
    build: DataFrame,
    max_dist: float,
    probe_id: str = "page_id",
    build_id: str = "obj_id",
    build_cols: tuple[str, ...] = ("bgt_type",),
) -> DataFrame:
    """Nearest build object within max_dist per probe row; deterministic
    (dist_sq, obj_id) tie-break. Reference street_furniture_fuser.py:80-85.

    Round 6: the per-probe argmin is one struct-min aggregation instead
    of a row_number window — the min combines map-side, so the exchange
    carries one row per (map partition, probe) instead of every
    candidate pair, and the whole-partition window sort disappears
    (guide §2.3 "aggregate before you shuffle"). The struct leads with
    (dist_sq, build_id), so the selected row and its payload columns
    are identical to the old rn=1 pick (build_id is unique)."""
    cand = knn_candidates(probe, build, max_dist, probe_id, build_id, build_cols)
    payload = [c for c in cand.columns if c not in (probe_id,)]
    ordered = ["dist_sq", build_id] + [
        c for c in payload if c not in ("dist_sq", build_id)
    ]
    best = cand.groupBy(probe_id).agg(
        F.min(F.struct(*ordered)).alias("_b")
    )
    return best.select(
        probe_id, *[F.col(f"_b.{c}").alias(c) for c in payload]
    ).select(probe_id, *payload)


def knn_idw(
    probe: DataFrame,
    build: DataFrame,
    k: int = 8,
    max_dist: float = 50.0,
    power: int = 2,
    reg: float = 1e-9,
    probe_id: str = "page_id",
    build_id: str = "obj_id",
    value_col: str = "z",
) -> DataFrame:
    """k-nearest IDW interpolation (reference interpolation.py:285-301:
    weights 1/(d^p + reg), weighted mean of neighbour values).

    The weighted sum is folded over a SORTED neighbour array
    (sort_array + aggregate) so the float accumulation order is
    deterministic — required for bit-exact oracle comparison.
    """
    cand = knn_candidates(
        probe, build, max_dist, probe_id, build_id, (value_col,)
    )

    # d^p with integer p as exact multiplication chain (no pow/libm);
    # the weight 1/(d^p + reg) is recomputed from dist_sq inside the
    # fold — the same deterministic double as a precomputed column,
    # and the collected struct stays 8 bytes/row narrower (guide §2.3
    # "narrower types / shuffle fewer bytes")
    def _w_of(d2):
        if power == 2:
            dp = d2
        elif power == 1:
            dp = F.sqrt(d2)
        else:
            dp = F.pow(F.sqrt(d2), F.lit(float(power)))
        return F.lit(1.0) / (dp + F.lit(reg))

    # Round 6: ONE aggregation replaces the row_number window + regroup:
    # sort_array over the collected candidates then slice(1, k) selects
    # exactly the rows rn<=k used to keep — the struct leads with
    # (dist_sq, build_id), the same ordering key, and the fold below
    # consumes the identical sorted prefix, so the float accumulation
    # order is unchanged (bit-exact). n_neighbors = the slice length.
    grouped = cand.groupBy(probe_id).agg(
        F.slice(
            F.sort_array(
                F.collect_list(F.struct("dist_sq", build_id, value_col))
            ),
            1, k,
        ).alias("_nb"),
    )
    return grouped.select(
        probe_id,
        F.size("_nb").cast("long").alias("n_neighbors"),
        (
            F.aggregate(
                "_nb", F.lit(0.0),
                lambda a, s: a + _w_of(s["dist_sq"]) * s[value_col],
            )
            / F.aggregate(
                "_nb", F.lit(0.0), lambda a, s: a + _w_of(s["dist_sq"])
            )
        ).alias("idw"),
    )


def knn_max(
    probe: DataFrame,
    build: DataFrame,
    k: int = 8,
    max_dist: float = 50.0,
    probe_id: str = "page_id",
    build_id: str = "obj_id",
    value_col: str = "z",
) -> DataFrame:
    """'max' variant (reference interpolation.py:302-303): max of the k
    nearest neighbour values — used to build the building surface."""
    cand = knn_candidates(probe, build, max_dist, probe_id, build_id, (value_col,))
    # same one-aggregation top-k as knn_idw; max over the sorted slice
    # is order-independent, so results are unchanged
    grouped = cand.groupBy(probe_id).agg(
        F.slice(
            F.sort_array(
                F.collect_list(F.struct("dist_sq", build_id, value_col))
            ),
            1, k,
        ).alias("_nb"),
    )
    return grouped.select(
        probe_id,
        F.array_max(F.transform("_nb", lambda s: s[value_col])).alias("max_val"),
        F.size("_nb").cast("long").alias("n_neighbors"),
    )


def binned_statistic_2d(
    points: DataFrame,
    res: float,
    value_col: str = "z",
) -> DataFrame:
    """Voxel-column statistics (reference pole_fuser.py:171-196):
    min/max/exact-median/count of ``value_col`` per (res × res) bin.
    Pure Catalyst groupBy — the median uses the exact percentile
    aggregate (sort-based), not approx, to keep oracle-exact matches."""
    return (
        points.groupBy(
            cell_x(F.col("x"), res).alias("bin_x"),
            cell_y(F.col("y"), res).alias("bin_y"),
        )
        .agg(
            F.min(value_col).alias("z_min"),
            F.max(value_col).alias("z_max"),
            F.expr(f"percentile({value_col}, 0.5)").alias("z_median"),
            F.count(value_col).alias("n_points"),
        )
    )
