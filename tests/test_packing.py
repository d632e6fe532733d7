"""Sequence-packing (concat-and-chunk) unit gates.

The operator's scale claim is that the global exclusive prefix sum is
computed with range buckets + broadcast offsets, never a corpus-wide
single-task window — so (a) results must be invariant to the bucket
count, and (b) the physical plan's Window must partition by bucket.
"""

from __future__ import annotations

from urban_pointcloud_processing_spark.operators.packing import pack_chunks

SF = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hand_checked_manifest(spark):
    # 3 + 1 + 5 tokens, ctx=4 → offsets 0,3,4; chunks 0/0, 0/0, 1/2
    docs = _docs(
        spark,
        [(1, "a b c"), (2, "d"), (3, "e f g h i")],
    )
    rows = {r["doc_id"]: r for r in pack_chunks(docs, ctx=4).collect()}
    assert rows[1]["start_tok"] == 0 and rows[1]["last_chunk"] == 0
    assert rows[2]["start_tok"] == 3 and rows[2]["first_chunk"] == 0
    assert rows[3]["start_tok"] == 4
    assert (rows[3]["first_chunk"], rows[3]["last_chunk"]) == (1, 2)
    assert rows[3]["n_chunks"] == 2


def test_zero_token_doc_has_zero_chunks(spark):
    docs = _docs(spark, [(1, "a b"), (2, ""), (3, "c")])
    rows = {r["doc_id"]: r for r in pack_chunks(docs, ctx=2).collect()}
    assert rows[2]["n_tokens"] == 0 and rows[2]["n_chunks"] == 0
    # the empty doc still owns a well-defined offset
    assert rows[2]["start_tok"] == 2 and rows[3]["start_tok"] == 2


def test_bucket_count_invariance(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = {
        r["doc_id"]: tuple(r)
        for r in pack_chunks(docs, ctx=128, n_buckets=3).collect()
    }
    b = {
        r["doc_id"]: tuple(r)
        for r in pack_chunks(docs, ctx=128, n_buckets=97).collect()
    }
    assert a == b and len(a) > 0


def test_empty_input(spark):
    out = pack_chunks(_docs(spark, []), ctx=16)
    assert out.count() == 0
    assert out.columns == [
        "doc_id", "n_tokens", "start_tok",
        "first_chunk", "last_chunk", "n_chunks",
    ]


def test_window_partitions_by_bucket(spark):
    """The prefix-sum Window must be bucket-partitioned — a global
    (partition-less) window shows an empty partition spec and an
    Exchange SinglePartition feeding it."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = (
        pack_chunks(docs, ctx=128)
        ._jdf.queryExecution().executedPlan().toString()
    )
    window_lines = [ln for ln in plan.splitlines() if "Window " in ln]
    assert window_lines, plan
    for ln in window_lines:
        assert "[bucket" in ln, ln
