"""Oracle parity for every registered query — mirrors the driver's
CORRECTNESS gate (row-count + schema + order-insensitive values)."""

from __future__ import annotations

import pytest

from urban_pointcloud_processing_spark import queries as Q

from .parity import compare

NAMES = sorted(set(Q.queries()) & set(Q.oracle_sql()))


@pytest.mark.parametrize("name", NAMES)
def test_oracle_parity(spark, sf_dir, name):
    report = compare(spark, sf_dir, name, Q.queries()[name], Q.oracle_sql()[name])
    assert report.get("ok"), report
