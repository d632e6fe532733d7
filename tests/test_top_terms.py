"""top_terms invariance gates: the Zipf hot/cold join split is a
physical optimization — moving the document-frequency threshold must
never change the answer."""

from __future__ import annotations

import pytest

from urban_pointcloud_processing_spark import queries as Q

SF = "/root/testdata/sf0.001"


def _rows(spark):
    return {
        tuple(r)
        for r in Q.QUERIES["top_terms"](spark, SF).collect()
    }


@pytest.mark.parametrize("threshold", [0, 10**9])
def test_split_threshold_invariance(spark, monkeypatch, threshold):
    """threshold 0 → every token takes the broadcast-hot path;
    threshold 1e9 → every token takes the shuffled-cold path; both
    must equal the default mixed split (fixture df range 25..402
    keeps both paths live at the default 200)."""
    base = _rows(spark)
    monkeypatch.setattr(Q, "_TOP_TERMS_HOT_DF", threshold)
    assert _rows(spark) == base and len(base) > 0
