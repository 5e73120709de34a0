"""RocksDB state store provider: the production state backend for large
stateful streaming (state spills to local disk + changelog checkpoints,
instead of the default HDFS-backed in-memory map whose size is bounded by
executor heap). Pins that the bundled provider actually runs here and
produces results identical to the default provider — the config flip a
100 TB deployment makes on day one.
"""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from steam_prices_data_engineering_spark.sources.tables import events_stream

SF = "/root/testdata/sf0.001"

_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def _windowed_counts(spark, provider: str | None):
    conf_key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(conf_key, None)
    try:
        if provider:
            spark.conf.set(conf_key, provider)
        stream = events_stream(spark, SF).withWatermark("ts", "1 hour")
        agg = (
            stream.groupBy(
                F.window("ts", "30 minutes").alias("w"), "event_type"
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                F.col("w.start").cast("long").alias("ws"), "event_type", "n"
            )
        )
        sink = f"rocks_{uuid.uuid4().hex[:8]}"
        q = (
            agg.writeStream.format("memory")
            .queryName(sink)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rows = {
            (r.ws, r.event_type): r.n for r in spark.table(sink).collect()
        }
        return rows
    finally:
        if old is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, old)


def test_rocksdb_provider_matches_default(spark):
    default = _windowed_counts(spark, None)
    rocks = _windowed_counts(spark, _ROCKSDB)
    assert rocks == default
    assert len(rocks) > 0
