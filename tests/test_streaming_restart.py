"""Checkpoint-restart recovery: streaming state must survive a query
restart. Two separate availableNow runs share one checkpoint location;
the second run sees only newly-arrived files but must emit aggregates
covering BOTH batches — i.e., its state store was restored, not rebuilt.
This is the property that makes long-lived production streams safe to
redeploy; a single-run availableNow test cannot catch a broken
checkpoint contract.
"""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from steam_prices_data_engineering_spark.sources.tables import (
    TABLE_SCHEMAS,
    read_table,
)

SF_DIR = "/root/testdata/sf0.001"


def _agg(stream_df):
    return (
        stream_df.groupBy(
            F.window("ts", "1 day").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").cast("long").alias("day_start"),
            "event_type",
            "n",
        )
    )


def _run_once(spark, src_dir: str, ckpt: str) -> str:
    stream = (
        spark.readStream.schema(TABLE_SCHEMAS["events"])
        .format("parquet")
        .load(src_dir)
    )
    sink = f"restart_{uuid.uuid4().hex[:8]}"
    q = (
        _agg(stream)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sink


def test_streaming_checkpoint_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    events = read_table(spark, SF_DIR, "events")

    # Batch 1 lands; first run aggregates it and checkpoints its state.
    events.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    sink1 = _run_once(spark, src, ckpt)
    n1 = spark.table(sink1).agg(F.sum("n")).collect()[0][0]

    # Batch 2 arrives while the query is DOWN; the restarted run reads only
    # the new files yet must produce totals over both batches.
    events.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    sink2 = _run_once(spark, src, ckpt)
    got = {
        (r.day_start, r.event_type): r.n for r in spark.table(sink2).collect()
    }

    expected = {
        (r.day_start, r.event_type): r.n
        for r in _agg(events).collect()
    }
    assert got == expected
    # and run 1 genuinely saw only half the data (the restart added state,
    # it did not recompute from scratch via a full re-read)
    assert n1 < sum(expected.values())
