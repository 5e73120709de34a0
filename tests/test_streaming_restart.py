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


def test_late_data_dropped_after_watermark(spark, tmp_path):
    """Watermark enforcement across restarts: rows older than the advanced
    watermark are DROPPED, not aggregated. Run 1 processes hours 0-9 and
    leaves the watermark at 8h; run 2 delivers one late row (hour 2, far
    behind the watermark) plus fresh rows (hour 12). The late row must not
    resurrect its long-finalized window, and the union of appended outputs
    must equal the batch aggregation of the on-time data only."""
    import datetime

    from pyspark.sql import types as T

    base = datetime.datetime(2024, 3, 1, 0, 0, 0)

    def rows(hours):
        return [
            (i, base + datetime.timedelta(hours=h, minutes=7), 1.0)
            for i, h in enumerate(hours)
        ]

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    src = str(tmp_path / "late_src")
    ckpt = str(tmp_path / "late_ckpt")
    out = str(tmp_path / "late_out")

    def run(_prefix):
        # memory sink cannot recover from a checkpoint in append mode; the
        # file sink is the production shape and makes both runs' emissions
        # durable + unioned for free.
        stream = (
            spark.readStream.schema(schema).format("parquet").load(src)
        )
        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").cast("long").alias("h"), "n")
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out).collect()

    on_time = rows(range(10))  # hours 0..9 -> watermark ends at 8h
    spark.createDataFrame(on_time, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    out1 = run("late1")

    late_and_fresh = [(100, base + datetime.timedelta(hours=2, minutes=30), 1.0),
                      (101, base + datetime.timedelta(hours=12, minutes=7), 1.0)]
    spark.createDataFrame(late_and_fresh, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    out2 = run("late2")

    def epoch(h):
        return int((base + datetime.timedelta(hours=h)).timestamp())

    # run 1: watermark ended at 8h07, so exactly windows 0..7 are final
    assert {r.h for r in out1} == {epoch(h) for h in range(8)}

    # cumulative output after run 2: each on-time hour 0..9 exactly once
    # with count 1 — the late hour-2 row did NOT bump its window (it would
    # show as n=2), and hour 12 stays in state (watermark 11h < end 13h)
    got = {}
    for r in out2:
        assert r.h not in got, "window emitted twice across restarts"
        got[r.h] = r.n
    assert got == {epoch(h): 1 for h in range(10)}


def test_streaming_listener_reports_progress_metrics(spark, tmp_path):
    """Ops observability: a StreamingQueryListener receives progress events
    carrying row counts and state metrics — the hook a production
    deployment uses for lag/throughput dashboards and SLO alerts. The
    summed numInputRows across progress events must equal the rows
    actually ingested."""
    import threading

    from pyspark.sql.streaming import StreamingQueryListener

    from steam_prices_data_engineering_spark.sources.tables import read_table

    seen = {"rows": 0, "progress": 0, "terminated": threading.Event()}

    class Capture(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            seen["rows"] += event.progress.numInputRows
            seen["progress"] += 1

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            seen["terminated"].set()

    src = str(tmp_path / "listener_src")
    events = read_table(spark, "/root/testdata/sf0.001", "events")
    n_rows = events.count()
    events.coalesce(1).write.mode("append").parquet(src)

    listener = Capture()
    spark.streams.addListener(listener)
    try:
        stream = (
            spark.readStream.schema(events.schema).format("parquet").load(src)
        )
        agg = stream.groupBy("event_type").count()
        q = (
            agg.writeStream.format("noop")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        assert seen["terminated"].wait(timeout=30)
    finally:
        spark.streams.removeListener(listener)

    assert seen["progress"] >= 1
    assert seen["rows"] == n_rows


def test_chained_stateful_runs_two_state_operators(spark):
    """The multi-resolution rollup really chains TWO stateful operators in
    one query (not a collapsed single agg): the microbatch progress
    reports two state operators, each having committed state rows."""
    import uuid

    from pyspark.sql import functions as F

    from steam_prices_data_engineering_spark.sources.tables import (
        events_stream,
    )

    stream = events_stream(spark, "/root/testdata/sf0.001").withWatermark(
        "ts", "1 hour"
    )
    lvl1 = stream.groupBy(
        F.window("ts", "10 minutes").alias("w"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    lvl2 = lvl1.groupBy(
        F.window(F.window_time("w"), "1 hour").alias("hw"), "event_type"
    ).agg(F.sum("n").alias("n_events"))
    sink = f"chain_{uuid.uuid4().hex[:8]}"
    q = (
        lvl2.select(F.col("hw.start").alias("hs"), "event_type", "n_events")
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    batches = [p["stateOperators"] for p in q.recentProgress]
    assert all(len(ops) == 2 for ops in batches), batches
    # availableNow runs (at least) two microbatches: the first fills the
    # 10-min level's state, the watermark-advance batch finalizes those
    # windows into the hour level. Each operator must have updated rows in
    # SOME batch (the final batch alone shows zeros for whichever side
    # already drained — state totals end at ~0 once the watermark passes).
    updated_per_op = [
        sum(ops[i]["numRowsUpdated"] for ops in batches) for i in (0, 1)
    ]
    assert all(u > 0 for u in updated_per_op), batches
    assert spark.table(sink).count() > 0
