"""Unit tests for the end-to-end pipeline plans (plans/pipelines.py) and the
LLM-text operators (plans/llm_text.py) — semantics points the oracle compare
can't isolate: missing-rate NULL path, EU max-fill, uk->gb remap, sink
partition pruning, language-ID determinism.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from steam_prices_data_engineering_spark.plans.llm_text import (
    lang_id_ngram,
    neardup_embedding_cosine,
    token_count_bpe,
)
from steam_prices_data_engineering_spark.plans.pipelines import (
    COUNTRIES,
    steam_job1_prices_etl,
    world_map_job2_deviation,
    sink_partitioned_latest_run,
    steam_api_json_extract,
)

SF = "/root/testdata/sf0.001"


def test_job1_shape_and_missing_rate_null(spark):
    rows = steam_job1_prices_etl(spark, SF).collect()
    # 15 apps (p_partkey 0..14) x len(COUNTRIES) pairs (cross product, O10).
    assert len(rows) == 15 * len(COUNTRIES)
    by_cc = {}
    for r in rows:
        by_cc.setdefault(r.country_iso, []).append(r)
    # 'ar' has no FX rate -> every ar row must be NULL (O11 missing-key path).
    assert all(r.usd_price is None for r in by_cc["ar"])
    # Every currency with a rate parses successfully for every app.
    for cc in ("us", "de", "jp", "se", "uk"):
        assert all(r.usd_price is not None for r in by_cc[cc]), cc
    # Parsed prices are positive. (No tight upper bound: when hypothesis A
    # lands just outside [0.1, 100] the reference returns hypothesis B
    # unconditionally — "96,15 €" -> A=104.5 -> B=9615/rate — and we keep
    # that exact behavior, steam_prices_transformer.py:125-128.)
    vals = [r.usd_price for r in rows if r.usd_price is not None]
    assert all(v > 0 for v in vals)


def test_job2_eu_fill_and_uncovered_countries(spark):
    rows = world_map_job2_deviation(spark, SF).collect()
    by_a3 = {r.iso_a3: r for r in rows}
    # One row per geo country.
    assert len(rows) == len(by_a3) == 14
    # Euro-zone countries collapse to the synthetic EU key (O24)...
    eu = [r for r in rows if r.iso_a2 == "EU"]
    assert {r.iso_a3 for r in eu} == {"DEU", "FRA", "ESP", "ITA"}
    # ...and all share the SAME filled usd_dif = the EU group max (O29).
    eu_difs = {r.usd_dif for r in eu}
    assert len(eu_difs) == 1
    # Uncovered geo countries (no prices) keep NULL stats but steam_value=0
    # (O14 left join + O31 constant fill).
    for a3 in ("CHN", "IND"):
        assert by_a3[a3].usd_price is None
        assert by_a3[a3].steam_value == 0.0
    # uk prices flow to GBR via the uk->gb remap (O23).
    assert by_a3["GBR"].usd_price is not None
    # ARG has prices rows but all-NULL usd_price (no ARS rate) -> NULL mean.
    assert by_a3["ARG"].usd_price is None


def test_api_json_extract_failure_row(spark):
    rows = {r.app: r for r in steam_api_json_extract(spark, SF).collect()}
    assert rows[10].usd_price is not None  # $19.99 / 1.0
    assert abs(rows[10].usd_price - 19.99) < 1e-9
    assert rows[20].currency == "EUR"
    assert rows[40].price_str is None  # success=false payload -> NULLs
    assert rows[40].usd_price is None


def test_sink_reads_only_latest_partition(spark):
    rows = sink_partitioned_latest_run(spark, SF).collect()
    assert len(rows) == 1
    # Latest year in the fixture orders table.
    o = spark.read.parquet(f"{SF}/orders.parquet")
    expect = o.agg(F.max(F.year("o_orderdate").cast("int"))).collect()[0][0]
    assert rows[0].yr == expect


def test_lang_id_deterministic_and_self_consistent(spark):
    out = lang_id_ngram(spark, SF)
    rows = out.collect()
    d = spark.read.parquet(f"{SF}/documents.parquet")
    assert len(rows) == d.count()  # exactly one prediction per document
    # Deterministic across runs (window tiebreaks are total orders).
    again = {r.doc_id: r.pred_lang for r in lang_id_ngram(spark, SF).collect()}
    assert {r.doc_id: r.pred_lang for r in rows} == again
    # The profile heuristic must beat random guessing on its own train set.
    acc = sum(r.correct for r in rows) / len(rows)
    n_langs = d.select("lang").distinct().count()
    assert acc > 1.0 / n_langs


def test_bpe_tokens_at_least_ws_tokens(spark):
    rows = token_count_bpe(spark, SF).collect()
    # Splitting on punctuation can only create MORE tokens than whitespace.
    assert all(r.n_bpe_tokens >= r.n_ws_tokens for r in rows)
    assert all(r.n_ws_tokens > 0 for r in rows)


def test_embedding_neardup_pairs_are_ordered_and_thresholded(spark):
    rows = neardup_embedding_cosine(spark, SF).collect()
    for r in rows:
        assert r.vec_id_a < r.vec_id_b
        assert r.score >= 0.4
