"""Pipeline metrics via df.observe / Observation: data-quality counters
computed inside the SAME job as the write — at 100 TB this replaces the
"run the pipeline, then run a validation query" double scan with one pass
(the accumulator-style metrics ride the existing tasks for free).

Complements dq_validation_report (which builds a queryable report table);
observe() is the cheap always-on instrument for landing jobs.
"""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from steam_prices_data_engineering_spark.sources.tables import read_table

SF = "/root/testdata/sf0.001"


def test_observation_metrics_match_direct_aggregates(spark, tmp_path):
    docs = read_table(spark, SF, "documents")
    obs = Observation("landing_metrics")
    instrumented = docs.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("n_chars")).alias("total_chars"),
        F.count(F.when(F.col("lang").isNull(), 1)).alias("null_lang"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )
    # One action drives BOTH the landing and the metrics — no second scan.
    instrumented.write.mode("overwrite").parquet(str(tmp_path / "landing"))

    got = obs.get
    direct = docs.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("n_chars").alias("total_chars"),
        F.count(F.when(F.col("lang").isNull(), 1)).alias("null_lang"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    ).collect()[0]
    assert got["n_rows"] == direct["n_rows"] > 0
    assert got["total_chars"] == direct["total_chars"]
    assert got["null_lang"] == direct["null_lang"] == 0
    assert got["min_id"] == direct["min_id"]
    assert got["max_id"] == direct["max_id"]

    # The landing itself is intact (observe is transparent to the data).
    assert (
        spark.read.parquet(str(tmp_path / "landing")).count() == got["n_rows"]
    )


def test_observation_survives_filter_pushdown(spark, tmp_path):
    """Metrics attach at the observe point, not the scan: observing AFTER a
    filter counts post-filter rows even when the predicate is pushed into
    the parquet scan."""
    docs = read_table(spark, SF, "documents")
    obs = Observation("filtered_metrics")
    filtered = docs.filter(F.col("n_chars") >= 150).observe(
        obs, F.count(F.lit(1)).alias("n_rows")
    )
    filtered.write.mode("overwrite").parquet(str(tmp_path / "filtered"))
    expect = docs.filter(F.col("n_chars") >= 150).count()
    assert obs.get["n_rows"] == expect > 0
