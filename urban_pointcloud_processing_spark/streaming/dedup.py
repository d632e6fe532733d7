"""Stateful STREAMING exact dedup — the ingest-time dedup gate of a
training-data pipeline (new documents arrive continuously; a document
whose content hash was ever seen before is suppressed; the first
arrival becomes the canonical).

Spark expression: ``applyInPandasWithState`` keyed by the 256-bit
content hash (the same key as the batch operator
``operators.dedup.exact_dedup``). State per hash is a single boolean —
bounded by the number of DISTINCT documents, never by arrivals — and
persists in the streaming checkpoint, so a hash first seen in batch k
suppresses every later arrival in batches k+1, k+2, … across drains.

STREAM SEMANTICS (precise): the canonical is the min doc_id within
the hash's FIRST micro-batch, and n_docs counts that batch's arrivals
— later arrivals are suppressed, never merged (append-mode sinks
cannot retract an emitted row). This equals the batch operator
(global min + total count) exactly WHEN the first drain is a single
micro-batch, which the registered query guarantees by writing the
input as one file (AvailableNow over one file = one batch). A drain
split across micro-batches (maxFilesPerTrigger, multiple files) keeps
the same first-seen contract but may emit a non-global-min canonical
and an undercounted n_docs — that is the streaming contract, not a
bug, and tests/test_streaming.py pins it (two-file drain: 'alpha'
keeps its original canonical, no re-emission).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ]
)

OUT_SCHEMA = StructType(
    [
        StructField("canonical_id", LongType()),
        StructField("n_docs", LongType()),
    ]
)

# state: has this hash been emitted already (in any earlier batch)?
STATE_SCHEMA = StructType([StructField("seen", LongType())])


def _dedup_group(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        # hash seen in an earlier batch → every arrival is a duplicate;
        # skip the chunk materialization entirely
        return iter(())
    ids: list[int] = []
    for pdf in pdfs:
        ids.extend(int(v) for v in pdf["doc_id"])
    state.update((1,))
    return iter(
        [pd.DataFrame({"canonical_id": [min(ids)], "n_docs": [len(ids)]})]
    )


def exact_dedup_stream(docs: DataFrame) -> DataFrame:
    """(canonical_id, n_docs) per FIRST-SEEN content hash."""
    hashed = docs.select(
        "doc_id", F.sha2(F.col("text"), 256).alias("_h")
    )
    return hashed.groupBy("_h").applyInPandasWithState(
        _dedup_group,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_dedup_available_now(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    output_dir: str,
) -> DataFrame:
    """Drain the documents currently in input_dir (AvailableNow) into a
    parquet sink; seen-hash state persists in the checkpoint so a later
    drain over new files suppresses previously-seen content. Returns
    ALL rows appended so far.

    Batch-equivalence caveat: output matches operators.dedup.exact_dedup
    only if a hash's first drain is one micro-batch (see module
    docstring) — callers wanting the batch-exact pairing must present
    the initial corpus as a single file, as the registered query does."""
    raw = spark.readStream.schema(DOCS_SCHEMA).parquet(input_dir)
    out = exact_dedup_stream(raw)
    q = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.schema(OUT_SCHEMA).parquet(output_dir)


# ----------------------------------------------------------------------
# Merged (batch-exact) variant: per-micro-batch PARTIAL aggregates +
# merge-on-read. Restores batch-operator-exact canonicals and counts
# under ANY micro-batch split (maxFilesPerTrigger > 1, multi-file
# drains, multiple drains) — the first-seen gate above cannot, because
# an append sink can never retract an emitted row (module docstring).
# ----------------------------------------------------------------------

PARTIAL_SCHEMA = StructType(
    [
        StructField("_h", StringType()),
        StructField("batch_min", LongType()),
        StructField("batch_n", LongType()),
    ]
)


def run_dedup_merged_available_now(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Drain input_dir and return the BATCH-EXACT dedup view
    (canonical_id, n_docs) over every document drained so far.

    Shape: foreachBatch runs a JVM-side partial aggregate per
    micro-batch — groupBy(content hash) → (min doc_id, count), the
    map-side-combine half of the batch operator — and lands it in a
    ``batch=<id>`` subdirectory with mode="overwrite", so a retried
    micro-batch REPLACES its own partials (idempotent under the
    at-least-once contract of foreachBatch; a plain append sink would
    double-count retried batches). The returned view merges partials:
    min of mins, sum of counts — associative/commutative, hence exact
    regardless of how arrivals were split across micro-batches or
    drains. State lives in the sink partials, not the state store, so
    per-hash memory is zero and the sink itself is the resumable
    artifact (the Iceberg-rollup pattern at cluster scale)."""

    def emit(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.groupBy("_h")
            .agg(
                F.min("doc_id").alias("batch_min"),
                F.count("*").alias("batch_n"),
            )
            .write.mode("overwrite")
            .parquet(f"{output_dir}/batch={batch_id}")
        )

    reader = spark.readStream.schema(DOCS_SCHEMA)
    if max_files_per_trigger is not None:
        # AvailableNow respects this as the batch-size cap, so a
        # multi-file drain splits into several micro-batches — the
        # exact condition the merge must (and does) stay exact under
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.parquet(input_dir)
    hashed = raw.select("doc_id", F.sha2(F.col("text"), 256).alias("_h"))
    q = (
        hashed.writeStream.foreachBatch(emit)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    partials = spark.read.schema(PARTIAL_SCHEMA).option(
        "basePath", output_dir
    ).parquet(f"{output_dir}/batch=*")
    return (
        partials.groupBy("_h")
        .agg(
            F.min("batch_min").cast("long").alias("canonical_id"),
            F.sum("batch_n").cast("long").alias("n_docs"),
        )
        .select("canonical_id", "n_docs")
    )
