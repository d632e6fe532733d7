"""Plan-shape regression gates.

Spark does not hoist non-lambda subexpressions out of LambdaFunction
bodies, so a gram-construction lambda referencing an INLINE
tokenizer re-runs the regex split once per gram element — O(k·L²)
per document (round-5 review finding; >100× on 2k-token docs). The
fix binds the token array in its own projection; these tests pin the
optimized plans so the quadratic pattern cannot be reintroduced: the
tokenizer split must appear a small constant number of times (once
per plan branch), never once per F.get reference.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _split_count(df) -> int:
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    return plan.count("split(")


def test_shingle_table_tokenizes_once(spark):
    """Round 6: shingle construction moved into one vectorized Arrow
    UDF (text crosses the boundary once per doc, explode ships longs).
    The JVM tokenizer must no longer appear at all, and the plan must
    contain exactly one Python evaluation node."""
    from urban_pointcloud_processing_spark.operators.dedup import (
        shingle_table,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = shingle_table(docs, 3)
    n = _split_count(df)
    assert n == 0, f"shingle_table plan evaluates split() {n}×, want 0"
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert phys.count("ArrowEvalPython") == 1, phys


def test_span_dedup_tokenizes_once_per_branch(spark):
    from urban_pointcloud_processing_spark.operators.dedup import span_dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    # the gram table feeds both the frequency gate and the flagged
    # join (a self-join), so the tokenizer appears once per branch
    n = _split_count(span_dedup(docs, 8))
    assert n <= 2, f"span_dedup plan evaluates split() {n}×, want ≤2"


def test_repetition_query_tokenizes_once(spark):
    from urban_pointcloud_processing_spark.queries import QUERIES

    n = _split_count(QUERIES["repetition_ngrams"](spark, SF))
    # n_grams/ndist/dup_frac all reference the one bound token column;
    # token_count_expr contributes the only other split reference
    assert n <= 2, f"repetition plan evaluates split() {n}×, want ≤2"
