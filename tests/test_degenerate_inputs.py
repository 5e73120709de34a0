"""Degenerate-data robustness: every event on ONE user (maximal key
skew), every measure NULL, every document identical (100% duplicates).
These are the worst-case shapes a 100 TB pipeline meets in the wild —
a bot account, a dead sensor column, a mirrored crawl — and they must
produce defined results, not exceptions or NaNs."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from steam_prices_data_engineering_spark.plans import registry
from steam_prices_data_engineering_spark.sources.tables import (
    TABLE_SCHEMAS,
    read_table,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def degenerate_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("degenerate_sf")
    for name, schema in TABLE_SCHEMAS.items():
        df = read_table(spark, SF, name)
        if name == "events":
            df = df.withColumn("user_id", F.lit(1).cast("long")).withColumn(
                "value", F.lit(None).cast("double")
            )
        if name == "documents":
            df = df.withColumn("text", F.lit("same text every time"))
        df.coalesce(1).write.mode("overwrite").parquet(
            str(d / f"{name}.parquet")
        )
    return str(d)


def test_single_user_session_window(spark, degenerate_dir):
    """All sessions belong to one key: the window still partitions by
    user correctly and NULL values sum to NULL, not NaN/0."""
    df = registry.queries()["events_session_window"](spark, degenerate_dir)
    rows = df.collect()
    assert len(rows) >= 1
    assert all(r.user_id == 1 for r in rows)
    assert all(r.sum_value is None for r in rows)
    assert sum(r.n_events for r in rows) == 1000


def test_all_null_measures_aggregate_to_null(spark, degenerate_dir):
    """Grouped stats over an all-NULL measure return NULL per group —
    never NaN (the NaN!=NULL discipline from SURVEY.md §7.3 row 1)."""
    e = read_table(spark, degenerate_dir, "events")
    row = e.groupBy("event_type").agg(
        F.avg("value").alias("a"),
        F.sum("value").alias("s"),
        F.max("value").alias("m"),
    ).collect()
    for r in row:
        assert r.a is None and r.s is None and r.m is None
        assert not any(
            isinstance(v, float) and math.isnan(v) for v in (r.a, r.s, r.m)
        )


def test_fully_duplicated_corpus_dedups_to_one(spark, degenerate_dir):
    """A 100%-duplicate corpus collapses to a single survivor with full
    multiplicity, in both the raw-text and content-hash forms."""
    for name in ("dedup_exact_groups", "dedup_exact_by_hash"):
        rows = registry.queries()[name](spark, degenerate_dir).collect()
        assert len(rows) == 1, name
        assert rows[0].n_copies == 500
        assert rows[0].keeper_id == 0


def test_single_key_scd2_still_versions(spark, degenerate_dir):
    """SCD2 on one hot key: versions stay dense 1..N with exactly one
    open (is_current) row."""
    df = registry.queries()["scd2_purchase_history"](spark, degenerate_dir)
    rows = sorted(df.collect(), key=lambda r: r.version)
    assert [r.version for r in rows] == list(range(1, len(rows) + 1))
    assert sum(r.is_current for r in rows) == 1
    assert rows[-1].is_current == 1


def test_identical_corpus_chunk_dedup_all_duplicated(spark, degenerate_dir):
    """100%-duplicate corpus: every chunk occurs in all 500 docs, so every
    doc's duplicated-span ratio is exactly 1.0."""
    rows = registry.queries()["chunk_dedup_ratio"](spark, degenerate_dir).collect()
    assert len(rows) == 500
    assert all(r.dup_ratio == 1.0 for r in rows)
    assert all(r.dup_chunks == r.n_chunks for r in rows)


def test_identical_embeddings_pq_ties_break_deterministically(spark, tmp_path):
    """All-identical embeddings: every subspace distance ties across all
    K centroids, so every vector must encode to code 0 (lowest-code
    tie-break) and all ADC distances are 0 — the ordering then falls to
    the vec_id tie-break. Guards the argmin tie-break both engines
    replay."""
    from pyspark.sql import types as T

    vec = [1.0] * 64
    df = spark.createDataFrame(
        [(i, vec, 0) for i in range(30)],
        T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.FloatType())),
                T.StructField("label", T.IntegerType()),
            ]
        ),
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    rows = registry.queries()["simsearch_pq_adc_topk"](
        spark, str(tmp_path)
    ).collect()
    assert [r.vec_id for r in rows] == list(range(1, 11))
    assert all(r.adc_dist == 0.0 for r in rows)
