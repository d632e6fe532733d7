"""PySpark-native spatial-join + tiling engine.

From-scratch re-creation of the query/data-processing capabilities of
Amsterdam-AI-Team/Urban_PointCloud_Processing (reference, read-only at
/root/reference) as idiomatic Spark DataFrame programs over a
Common-Crawl-style pages table. See SURVEY.md for the blueprint.
"""

from .labels import Labels
from .session import get_spark


def __getattr__(name):
    # Engine lives in .api; lazy import keeps bare `import
    # urban_pointcloud_processing_spark` free of the operator modules.
    if name == "Engine":
        from .api import Engine

        return Engine
    raise AttributeError(name)


__all__ = ["Engine", "Labels", "get_spark"]
__version__ = "0.1.0"
