"""Streaming ingest parity: the availableNow micro-batch tile histogram
must equal the batch tile histogram on the same ids."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from urban_pointcloud_processing_spark.sources.pages import synthetic_pages
from urban_pointcloud_processing_spark.streaming.ingest import run_available_now


def test_streaming_tile_histogram_matches_batch(spark):
    tmp = tempfile.mkdtemp(prefix="upcp_stream_")
    inp, ckpt = f"{tmp}/in", f"{tmp}/ckpt"
    try:
        spark.range(0, 20_000).select(F.col("id").alias("page_id")) \
            .write.mode("overwrite").parquet(inp)

        got = {
            (r["tile_x"], r["tile_y"]): r["n_pages"]
            for r in run_available_now(spark, inp, ckpt, "th_test").collect()
        }
        want = {
            (r["tile_x"], r["tile_y"]): r["n_pages"]
            for r in synthetic_pages(spark, 20_000)
            .groupBy("tile_x", "tile_y")
            .agg(F.count("*").alias("n_pages"))
            .collect()
        }
        assert got == want

        # resume: append new files, rerun against the SAME checkpoint —
        # only the new rows are ingested on top of the saved state
        spark.range(20_000, 30_000).select(F.col("id").alias("page_id")) \
            .write.mode("append").parquet(inp)
        got2 = {
            (r["tile_x"], r["tile_y"]): r["n_pages"]
            for r in run_available_now(spark, inp, ckpt, "th_test2").collect()
        }
        want2 = {
            (r["tile_x"], r["tile_y"]): r["n_pages"]
            for r in synthetic_pages(spark, 30_000)
            .groupBy("tile_x", "tile_y")
            .agg(F.count("*").alias("n_pages"))
            .collect()
        }
        assert got2 == want2
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_streaming_sessionize_matches_batch_and_resumes(spark):
    """applyInPandasWithState sessionization must reproduce the batch
    window's session indices on ordered events, and continue numbering
    from checkpointed state on a second drain."""
    import datetime as dt

    from urban_pointcloud_processing_spark.streaming.sessionize import (
        run_sessionize_available_now,
    )

    tmp = tempfile.mkdtemp(prefix="upcp_sess_")
    inp, ckpt, outp = f"{tmp}/in", f"{tmp}/ckpt", f"{tmp}/out"
    base = dt.datetime(2021, 1, 1, tzinfo=dt.timezone.utc)

    def ev(eid, uid, sec):
        return (eid, uid, base + dt.timedelta(seconds=sec))

    try:
        batch1 = [
            ev(1, 7, 0), ev(2, 7, 100), ev(3, 7, 2200),   # gap > 1800
            ev(4, 8, 0),
        ]
        spark.createDataFrame(batch1, ["event_id", "user_id", "ts"]) \
            .write.mode("overwrite").parquet(inp)
        got1 = {
            r["event_id"]: r["session_idx"]
            for r in run_sessionize_available_now(
                spark, inp, ckpt, outp
            ).collect()
        }
        assert got1 == {1: 1, 2: 1, 3: 2, 4: 1}

        # second drain: user 7 continues within session 2 (small gap)
        # then opens session 3; user 9 starts fresh
        batch2 = [ev(5, 7, 2300), ev(6, 7, 9000), ev(7, 9, 0)]
        spark.createDataFrame(batch2, ["event_id", "user_id", "ts"]) \
            .write.mode("append").parquet(inp)
        got2 = {
            r["event_id"]: r["session_idx"]
            for r in run_sessionize_available_now(
                spark, inp, ckpt, outp
            ).collect()
        }
        assert got2[5] == 2 and got2[6] == 3 and got2[7] == 1
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_watermarked_window_closes_and_drops_late(spark):
    """Watermarked tumbling agg: a window is emitted once the watermark
    (max event time - allowance) passes its end; in-allowance late
    events fold in before that; too-late events are dropped after."""
    import datetime as dt

    from urban_pointcloud_processing_spark.streaming.windowed import (
        run_windowed_available_now,
    )

    tmp = tempfile.mkdtemp(prefix="upcp_wm_")
    inp, ckpt, outp = f"{tmp}/in", f"{tmp}/ckpt", f"{tmp}/out"
    base = dt.datetime(2021, 1, 1, tzinfo=dt.timezone.utc)

    def ev(eid, uid, minutes, value=1.0):
        return (eid, uid, base + dt.timedelta(minutes=minutes), value)

    try:
        # batch 1: two events in hour-0 plus one far-future event that
        # pushes the watermark past hour-0's end (60 + 30 < 180)
        batch1 = [ev(1, 7, 10), ev(2, 7, 50), ev(3, 7, 180)]
        spark.createDataFrame(
            batch1, ["event_id", "user_id", "ts", "value"]
        ).write.mode("overwrite").parquet(inp)
        got1 = run_windowed_available_now(spark, inp, ckpt, outp).collect()
        closed = {
            (r["window_start"].minute + r["window_start"].hour * 60,
             r["user_id"]): r["n_events"]
            for r in got1
        }
        assert closed.get((0, 7)) == 2  # hour-0 emitted with both events
        assert (180, 7) not in closed   # hour-3 still open

        # batch 2: a too-late event for hour-0 must NOT change it
        spark.createDataFrame(
            [ev(4, 7, 20)], ["event_id", "user_id", "ts", "value"]
        ).write.mode("append").parquet(inp)
        got2 = run_windowed_available_now(spark, inp, ckpt, outp).collect()
        closed2 = {
            (r["window_start"].minute + r["window_start"].hour * 60,
             r["user_id"]): r["n_events"]
            for r in got2
        }
        assert closed2.get((0, 7)) == 2  # unchanged; late row dropped
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_stream_dedup_suppresses_across_batches(spark, tmp_path):
    """Stateful streaming exact dedup: a content hash first seen in an
    earlier drain suppresses every later arrival — state lives in the
    checkpoint, not the batch. Single-drain output equals the batch
    operator (driver oracle covers that); this pins the cross-drain
    contract the oracle can't see."""
    from urban_pointcloud_processing_spark.streaming.dedup import (
        run_dedup_available_now,
    )

    inp = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    batch1 = spark.createDataFrame(
        [(5, "alpha"), (2, "alpha"), (9, "beta")], ["doc_id", "text"]
    )
    batch1.coalesce(1).write.mode("append").parquet(inp)
    got1 = {
        r["canonical_id"]: r["n_docs"]
        for r in run_dedup_available_now(spark, inp, ckpt, out).collect()
    }
    assert got1 == {2: 2, 9: 1}

    # second drain: a new file with one dup of 'alpha' + one new text —
    # only the new text may emit, and 'alpha' keeps its original
    # canonical (no re-emission, no canonical churn)
    batch2 = spark.createDataFrame(
        [(1, "alpha"), (7, "gamma")], ["doc_id", "text"]
    )
    batch2.coalesce(1).write.mode("append").parquet(inp)
    got2 = {
        r["canonical_id"]: r["n_docs"]
        for r in run_dedup_available_now(spark, inp, ckpt, out).collect()
    }
    assert got2 == {2: 2, 9: 1, 7: 1}


def test_stream_dedup_merged_batch_parity_multi_batch(spark, tmp_path):
    """Merged variant (VERDICT r04 item 7): a drain SPLIT across
    micro-batches (two files + maxFilesPerTrigger=1) must still equal
    the batch operator exactly — global-min canonical and full n_docs,
    which the first-seen gate cannot provide (its append sink can't
    retract). Also: a second drain accumulates, staying batch-exact
    over ALL input seen so far."""
    from urban_pointcloud_processing_spark.streaming.dedup import (
        run_dedup_merged_available_now,
    )

    inp = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    # 'alpha' straddles the two files: min id 2 lives in file B, so a
    # first-seen gate would emit canonical 5 — the merge must yield 2
    fa = spark.createDataFrame([(5, "alpha"), (9, "beta")], ["doc_id", "text"])
    fb = spark.createDataFrame([(2, "alpha"), (4, "beta")], ["doc_id", "text"])
    fa.coalesce(1).write.mode("append").parquet(inp)
    fb.coalesce(1).write.mode("append").parquet(inp)

    got = {
        r["canonical_id"]: r["n_docs"]
        for r in run_dedup_merged_available_now(
            spark, inp, ckpt, out, max_files_per_trigger=1
        ).collect()
    }
    assert got == {2: 2, 4: 2}

    # second drain: dup of 'alpha' + new 'gamma' — merged view equals
    # the batch operator over the union of all three files
    fc = spark.createDataFrame([(1, "alpha"), (7, "gamma")], ["doc_id", "text"])
    fc.coalesce(1).write.mode("append").parquet(inp)
    got2 = {
        r["canonical_id"]: r["n_docs"]
        for r in run_dedup_merged_available_now(
            spark, inp, ckpt, out, max_files_per_trigger=1
        ).collect()
    }
    assert got2 == {1: 3, 4: 2, 7: 1}
