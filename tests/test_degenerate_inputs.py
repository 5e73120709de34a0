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


def test_kmeans_sub_seed_landing_empty_on_both_engines(spark, tmp_path):
    """A landing with fewer rows than seeds: Spark degrades to empty AND
    the unrolled-CTE oracle's seed guard mirrors it — both engines agree
    (the hash-gate scenario from review: a 2-vector table)."""
    import duckdb
    from pyspark.sql import types as T

    df = spark.createDataFrame(
        [(0, [1.0] * 64, 0), (1, [2.0] * 64, 0)],
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
    spark_rows = registry.queries()["kmeans_embeddings"](
        spark, str(tmp_path)
    ).collect()
    assert spark_rows == []

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{tmp_path}/embeddings.parquet/*.parquet')"
    )
    duck_rows = con.execute(registry.oracle_sql()["kmeans_embeddings"]).fetchall()
    assert duck_rows == []


def test_approx_aggregates_empty_landing_booleans_true(spark, tmp_path):
    """Fresh partition: the sketch-error booleans must be vacuously TRUE
    (never NULL — a NULL would hash-mismatch the oracle's literal)."""
    from steam_prices_data_engineering_spark.sources.tables import TABLE_SCHEMAS

    spark.createDataFrame([], TABLE_SCHEMAS["events"]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))
    row = registry.queries()["approx_aggregates"](spark, str(tmp_path)).collect()[0]
    assert row.exact_users == 0
    assert row.approx_users_ok is True
    assert row.p50_sketch_ok is True
    assert row.p95_sketch_ok is True


def test_chunk_dedup_ignores_within_doc_repeats(spark, tmp_path):
    """A doc whose two chunks are identical but unique to it: NOT
    duplicated (cross-doc semantics); a chunk shared across two docs IS."""
    from steam_prices_data_engineering_spark.sources.tables import TABLE_SCHEMAS

    ten = " ".join(["selfsame"] * 10)
    shared = " ".join(f"w{i}" for i in range(10))
    rows = [
        (1, f"{ten} {ten}", "en", "s", 200),        # internal repeat only
        (2, shared, "en", "s", 100),                # shared with doc 3
        (3, f"{shared} tail word here now", "en", "s", 140),
    ]
    spark.createDataFrame(rows, TABLE_SCHEMAS["documents"]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    got = {
        r.doc_id: r
        for r in registry.queries()["chunk_dedup_ratio"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got[1].dup_chunks == 0, got[1]           # within-doc repeat ignored
    assert got[2].dup_chunks == 1                    # its one chunk is shared
    assert got[3].dup_chunks >= 1                    # the shared prefix chunk


def test_single_token_docs_have_no_bigrams(spark, tmp_path):
    """A one-token document produces zero bigrams and is ABSENT from the
    bigram-LM result (contract: the gate scores bigram occurrences; docs
    without any are unscorable, not zero-surprisal). Multi-token docs in
    the same corpus still score."""
    from steam_prices_data_engineering_spark.sources.tables import TABLE_SCHEMAS

    d = tmp_path / "sf"
    rows = [
        (1, "hello", "en", "web", 5),
        (2, "hello world hello world", "en", "web", 23),
    ]
    spark.createDataFrame(rows, TABLE_SCHEMAS["documents"]).write.parquet(
        str(d / "documents.parquet")
    )
    out = registry.queries()["doc_bigram_lm_quality"](spark, str(d)).collect()
    assert {r.doc_id for r in out} == {2}
    assert out[0].n_bigrams == 3


def test_identical_corpus_gopher_flags_dominance(spark, degenerate_dir):
    """An all-identical corpus ('same text every time'): every doc has 4
    words — below the 50-word floor — and 0.25 modal-token dominance,
    so the keep flag is False everywhere (defined, not NaN)."""
    out = registry.queries()["gopher_quality_rules"](
        spark, degenerate_dir
    ).collect()
    assert out and all(not r.keep for r in out)
    assert all(r.n_words == 4 and abs(r.top_token_frac - 0.25) < 1e-9 for r in out)


def test_snapshot_diff_identical_snapshots_all_unchanged(spark, tmp_path):
    """When the drift filters don't fire (no keys divisible by 89/97 and
    no 'P'-status rows), every key classifies as unchanged."""
    from steam_prices_data_engineering_spark.sources.tables import read_table

    src = read_table(spark, SF, "orders").filter(
        (F.col("o_orderkey") % 89 != 0)
        & (F.col("o_orderkey") % 97 != 0)
        & (F.col("o_orderstatus") != "P")
    )
    d = tmp_path / "sf"
    src.write.parquet(str(d / "orders.parquet"))
    out = registry.queries()["snapshot_diff_report"](spark, str(d)).collect()
    assert len(out) == 1 and out[0].change_type == "unchanged"
    assert out[0].n_keys == src.count()


def test_cohen_kappa_degenerate_agreement_is_null_in_both_engines(
    spark, degenerate_dir
):
    """100%-identical docs drive both labeling rules to the same label
    for every doc: p_expected = 1 and kappa is 0/0. The nullif guard
    (ADVICE r6) must make BOTH engines return NULL — Spark's unguarded
    double 0/0 is NULL but DuckDB's is not, the exact divergence the
    jackknife and BH-FDR queries already guard."""
    import duckdb

    import sys as _sys
    import os as _os

    _sys.path.insert(
        0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    )
    from tools.check_oracle import TABLES, compare

    row = (
        registry.queries()["cohen_kappa_labels"](spark, degenerate_dir)
        .collect()[0]
    )
    assert row["p_expected"] == 1.0
    assert row["kappa"] is None
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{degenerate_dir}/{t}.parquet/*.parquet')"
        )
    rel = con.execute(registry.oracle_sql()["cohen_kappa_labels"])
    cols = [d[0] for d in rel.description]
    rows = rel.fetchall()
    df = registry.queries()["cohen_kappa_labels"](spark, degenerate_dir)
    assert compare("cohen_kappa_labels", df, rows, cols) is None
    con.close()
