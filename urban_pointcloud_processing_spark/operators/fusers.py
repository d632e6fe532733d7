"""Concrete fuser processors (the reference's canned query plans).

Each re-creates one reference fuser's semantics as a Pipeline stage
(SURVEY.md §2.10). Joins are broadcast (layers are dimension tables);
predicates are plain columns so the whole stage stays in codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.pip import pip_flag
from ..labels import Labels
from ..plans.pipeline import Processor
from ..sources.raster import with_raster


class RasterEnricher:
    """Shared enrichment: attach ground_z / building_z once, early —
    the Spark analog of the reference's cached per-tile interpolator
    (src/upcp/utils/ahn_utils.py:59-102, primed in pipeline.py:84-86).
    Later stages reuse the columns instead of re-joining."""

    def __init__(self, raster: DataFrame, res: float = 1.0):
        self.raster = raster
        self.res = res

    def __call__(self, pages: DataFrame) -> DataFrame:
        if "ground_z" in pages.columns:
            return pages
        return with_raster(pages, self.raster, self.res)


class GroundSurfaceFuser(Processor):
    """AHNFuser ground: |z − ground_z| < ε (src/upcp/fusion/ahn_fuser.py:159)."""

    label = Labels.GROUND
    name = "ground_surface"

    def __init__(self, epsilon: float = 0.2):
        self.epsilon = epsilon

    def claim(self, df: DataFrame):
        return F.abs(F.col("z") - F.col("ground_z")) < F.lit(self.epsilon)


class _PipProcessor(Processor):
    """Base for PIP-driven fusers: enrich = broadcast PIP flag join."""

    flag = "_pip"

    def __init__(self, edges: DataFrame):
        self.edges = edges

    def enrich(self, df: DataFrame) -> DataFrame:
        return pip_flag(df, self.edges, self.flag)

    def claim(self, df: DataFrame):
        return F.col(self.flag)

    def apply(self, df: DataFrame) -> DataFrame:
        return super().apply(df).drop(self.flag)


class BuildingFuser(_PipProcessor):
    """BGTBuildingFuser: PIP vs building polygons, optionally ANDed with
    z ≤ building_z + ε where the raster is finite
    (src/upcp/fusion/building_fuser.py:83-95)."""

    label = Labels.BUILDING
    name = "bgt_building"
    flag = "_in_building"

    def __init__(self, edges: DataFrame, ahn_eps: float | None = None):
        super().__init__(edges)
        self.ahn_eps = ahn_eps

    def claim(self, df: DataFrame):
        c = F.col(self.flag)
        if self.ahn_eps is not None:
            c = c & (
                F.col("building_z").isNull()
                | (F.col("z") <= F.col("building_z") + F.lit(self.ahn_eps))
            )
        return c


class RoadFuser(_PipProcessor):
    """BGTRoadFuser: relabels GROUND rows inside road polygons
    (src/upcp/fusion/road_fuser.py:81-87)."""

    label = Labels.ROAD
    target_label = Labels.GROUND
    name = "bgt_road"
    flag = "_in_road"


class BelowGroundNoiseFilter(Processor):
    """NoiseFilter's below-ground half: z − ground_z < −ε
    (src/upcp/fusion/noise_filter.py:72-74)."""

    label = Labels.NOISE
    name = "noise_below_ground"

    def __init__(self, epsilon: float = 0.2):
        self.epsilon = epsilon

    def claim(self, df: DataFrame):
        return F.col("z") - F.col("ground_z") < F.lit(-self.epsilon)
