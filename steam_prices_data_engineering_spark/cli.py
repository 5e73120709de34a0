"""Config-driven job runner — the engine's equivalent of the reference's
`run.py` entry point (O35, `/root/reference/run.py:17-67`): parse a YAML
config, build the session, run job 1 (prices ETL) and job 2 (world-map
deviation) sequentially, landing each as a run-partitioned snappy-parquet
table (S7/S9), plus job 2's PNG artifact (S8) rendered driver-side from
the collected aggregate by the dependency-free encoder in sinks/png.py —
one parquet landing per job and one PNG per run, the same artifact set
as a reference run.

Usage:
    python -m steam_prices_data_engineering_spark.cli configs/etl_config.yml
"""

from __future__ import annotations

import argparse
import logging
from datetime import datetime, timezone

import yaml

from pyspark.sql import functions as F

from .plans.pipelines import steam_job1_prices_etl, world_map_job2_deviation
from .session import get_spark
from .sinks.png import world_map_png
from .sources.io import join_uri, local_path

log = logging.getLogger("steam_prices_spark")


def run_jobs(config: dict, spark=None, run_ts: str | None = None) -> dict:
    """Run both jobs per the config; returns {job: output_path}. `run_ts`
    is injectable for reproducible tests (the reference bakes
    `datetime.now()` into its output keys, steam_prices_transformer.py:206 —
    the non-determinism the survey flags as a test risk)."""
    spark = spark or get_spark(app_name=config.get("app_name", "steam-prices-etl"))
    sf_dir = config["source"]["sf_dir"]
    out_root = config["target"]["output_dir"]
    fmt = config["target"].get("run_key_date_format", "%Y%m%d%H%M%S")
    run_key = run_ts or datetime.now(timezone.utc).strftime(fmt)

    outputs = {}

    # join_uri: output_dir may be a plain dir or an object-store-shaped
    # URI (file:// in tests, s3a:// on a cluster) — see sources/io.py.
    prices_path = join_uri(out_root, config["target"]["prices_key"])
    log.info("job 1: prices ETL -> %s (run %s)", prices_path, run_key)
    (
        steam_job1_prices_etl(spark, sf_dir)
        .withColumn("run_key", F.lit(run_key))
        .write.mode("append")
        .partitionBy("run_key")
        .parquet(prices_path)
    )
    outputs["prices"] = prices_path

    worldmap_path = join_uri(out_root, config["target"]["worldmap_key"])
    log.info("job 2: world-map deviation -> %s (run %s)", worldmap_path, run_key)
    # One built frame feeds both the parquet landing and the PNG artifact
    # below — the builder (plan construction + py4j) runs once per
    # invocation instead of twice (r11; same plan object, same results).
    worldmap_df = world_map_job2_deviation(spark, sf_dir)
    (
        worldmap_df.withColumn("run_key", F.lit(run_key))
        .write.mode("append")
        .partitionBy("run_key")
        .parquet(worldmap_path)
    )
    outputs["worldmap"] = worldmap_path

    png_path = local_path(
        join_uri(
            out_root,
            config["target"].get("worldmap_png_key", "world_map_png"),
            f"run_key={run_key}",
            "world_map.png",
        )
    )
    log.info("job 2: PNG artifact -> %s", png_path)
    outputs["worldmap_png"] = world_map_png(
        worldmap_df, "usd_dif", "iso_a3", png_path
    )

    # Job 3 (opt-in): incremental streaming rollup of the events stream to
    # a checkpointed parquet landing. availableNow + checkpoint gives the
    # production incremental-batch shape: each invocation processes ONLY
    # files not yet in the checkpoint, append-mode emits a window once its
    # watermark passes (exactly-once into the sink), and state carries
    # across runs. The reference has no streaming surface — this is the
    # §2b north-star extension productized behind the same config file.
    stream_cfg = config.get("streaming") or {}
    if stream_cfg.get("enabled"):
        from .sources.tables import events_stream
        from .streaming.windows import tumbling_counts

        rollup_path = join_uri(
            out_root, stream_cfg.get("events_rollup_key", "events_rollup")
        )
        ckpt_path = join_uri(out_root, "_checkpoints", "events_rollup")
        duration = stream_cfg.get("window", "10 minutes")
        log.info("job 3: streaming events rollup -> %s", rollup_path)
        stream = events_stream(spark, sf_dir).withWatermark(
            "ts", stream_cfg.get("watermark", "1 hour")
        )
        q = (
            tumbling_counts(stream, duration)
            .writeStream.format("parquet")
            .option("path", rollup_path)
            .option("checkpointLocation", ckpt_path)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        outputs["events_rollup"] = rollup_path
    return outputs


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("config", help="path to the YAML job config")
    args = parser.parse_args(argv)
    with open(args.config) as f:
        config = yaml.safe_load(f)
    logging.basicConfig(
        level=config.get("logging", {}).get("level", "INFO"),
        format="%(asctime)s %(name)s %(levelname)s %(message)s",
    )
    outputs = run_jobs(config)
    for job, path in outputs.items():
        log.info("done: %s -> %s", job, path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
