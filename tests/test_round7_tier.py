"""Semantic contracts of the round-7 tier (plans/round7.py): pure-python
replays and invariants the row-hash oracles can't state — Fleiss kappa
arithmetic consistency, Theil-Sen's exact median slope, PII pattern
counts recomputed with `re`, split exactness per stratum, keeper-policy
dominance, packing-bound arithmetic, and the stream-static/batch
equivalence — at sf0.001."""

from __future__ import annotations

import math
import re
from collections import defaultdict

from pyspark.sql import functions as F

from steam_prices_data_engineering_spark.plans import registry
from steam_prices_data_engineering_spark.sources.tables import read_table

SF = "/root/testdata/sf0.001"


def pyround(x: float, scale: int) -> float:
    f = float(10**scale)
    return math.floor(x * f + 0.5) / f


def test_streaming_enriched_tumbling_agg_equals_batch(spark):
    """availableNow stream-static left join == the batch left join +
    tumbling group (the streaming equivalence contract)."""
    got = {
        (r.window_start, r.segment): (r.n_events, r.sum_value)
        for r in registry.queries()["streaming_enriched_tumbling_agg"](
            spark, SF
        ).collect()
    }
    e = read_table(spark, SF, "events")
    c = read_table(spark, SF, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    batch = (
        e.join(c, e.user_id == c.c_custkey, "left")
        .groupBy(
            (F.floor(F.col("ts").cast("long") / 900) * 900)
            .cast("long")
            .alias("ws"),
            F.coalesce(F.col("c_mktsegment"), F.lit("UNKNOWN")).alias("seg"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect()
    )
    assert len(got) == len(batch)
    for r in batch:
        assert got[(r.ws, r.seg)][0] == r.n


def test_pii_counts_match_re_replay(spark):
    """The three pattern counters recomputed with python `re` over the
    same synthesized lines — exact."""
    from steam_prices_data_engineering_spark.plans.round7 import (
        _PII_DIGITS,
        _PII_EMAIL,
        _PII_PHONE,
    )

    rows = read_table(spark, SF, "events").collect()
    exp = defaultdict(lambda: [0, 0, 0, 0])  # n, email, phone, digit_runs
    for r in rows:
        parts = ["evt", str(r.event_id).zfill(8), "user", str(r.user_id),
                 r.props]
        if r.user_id % 3 == 0:
            parts.append(f"contact u{r.user_id}@example.com")
        if r.event_id % 5 < 2:
            parts.append("call +1415555" + str(r.event_id % 1000).zfill(4))
        line = " ".join(parts)
        a = exp[r.event_type]
        a[0] += 1
        a[1] += 1 if re.search(_PII_EMAIL, line) else 0
        a[2] += 1 if re.search(_PII_PHONE, line) else 0
        a[3] += len(re.findall(_PII_DIGITS, line))
    got = registry.queries()["pii_pattern_audit"](spark, SF).collect()
    assert len(got) == len(exp)
    for r in got:
        n, em, ph, dg = exp[r.event_type]
        assert (r.n_events, r.n_with_email, r.n_with_phone) == (n, em, ph)
        assert r.n_digit_runs == dg
        assert r.email_rate == pyround(em / n, 4)
        assert r.phone_rate == pyround(ph / n, 4)


def test_fleiss_kappa_internally_consistent(spark):
    """kappa == (p_bar - p_e) / (1 - p_e) from the query's own columns;
    p_e >= 0.5 for two categories; kappa <= 1."""
    r = registry.queries()["fleiss_kappa_rules"](spark, SF).collect()[0]
    assert r.n_docs > 0
    assert 0.5 - 1e-9 <= r.p_e <= 1.0
    assert r.fleiss_kappa <= 1.0 + 1e-9
    recomputed = pyround((r.p_bar - r.p_e) / (1 - r.p_e), 6)
    # the query rounds p_bar/p_e before display but computes kappa from
    # the unrounded aggregates — allow the display-rounding slack
    assert abs(r.fleiss_kappa - recomputed) < 5e-6


def test_theil_sen_matches_python_replay(spark):
    """Median pairwise slope replayed exactly (same dround, same
    (n-1)*p percentile interpolation)."""
    from steam_prices_data_engineering_spark.plans.insights import (
        _daily_revenue,
    )

    daily = sorted(
        (r.d, r.rev) for r in _daily_revenue(spark, SF).collect()
    )
    slopes = sorted(
        pyround((rb - ra) / (db - da), 6)
        for i, (da, ra) in enumerate(daily)
        for db, rb in daily[i + 1 :]
    )

    def q50(vals):
        pos = (len(vals) - 1) * 0.5
        lo, hi = int(math.floor(pos)), int(math.ceil(pos))
        return vals[lo] + (vals[hi] - vals[lo]) * (pos - lo)

    got = registry.queries()["theil_sen_daily_trend"](spark, SF).collect()[0]
    assert got.n_days == len(daily)
    assert got.n_pairs == len(slopes)
    assert got.slope_med == pyround(q50(slopes), 6)
    sm = got.slope_med
    resid = sorted(pyround(rev - sm * d, 4) for d, rev in daily)
    assert got.intercept_med == pyround(q50(resid), 4)


def test_keeper_policy_dominance_and_bounds(spark):
    """Per group the quality-max keeper's doc quality >= the keep-first
    keeper's, so the averages must be ordered; disagreements are bounded
    by the multi-group count."""
    r = registry.queries()["dedup_keeper_policy_eval"](spark, SF).collect()[
        0
    ]
    assert r.n_multi_groups > 0  # fixture has repeated full 8-token chunks
    assert r.n_dup_occurrences > r.n_multi_groups
    assert 0 <= r.n_policy_differs <= r.n_multi_groups
    assert r.avg_quality_keep_best >= r.avg_quality_keep_first - 1e-9


def test_spearman_bounds_and_counts(spark):
    rows = registry.queries()["spearman_scorer_agreement"](
        spark, SF
    ).collect()
    d = read_table(spark, SF, "documents")
    per = {
        r.source: r.n
        for r in d.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert {r.source for r in rows} == set(per)
    for r in rows:
        assert r.n_docs == per[r.source]
        assert -1.0 - 1e-9 <= r.spearman_rho <= 1.0 + 1e-9


def test_split_exact_proportions_per_stratum(spark):
    rows = registry.queries()["stratified_three_way_split"](
        spark, SF
    ).collect()
    by_src = defaultdict(dict)
    for r in rows:
        by_src[r.source][r.split] = r.n_docs
    for source, splits in by_src.items():
        n = sum(splits.values())
        f_train, f_val = int(n * 0.8), int(n * 0.1)
        short = n - f_train - 2 * f_val
        assert splits.get("train", 0) == f_train + (1 if short >= 1 else 0)
        assert splits.get("val", 0) == f_val + (1 if short >= 2 else 0)
        assert splits.get("test", 0) == n - splits["train"] - splits["val"]


def test_packing_bound_arithmetic(spark):
    rows = registry.queries()["sequence_packing_efficiency"](
        spark, SF
    ).collect()
    assert rows
    for r in rows:
        assert r.packed_batches == math.ceil(r.sum_tokens / 512)
        assert r.packed_batches <= r.n_docs  # packing never needs more
        assert r.packed_utilization == pyround(
            r.sum_tokens / (r.packed_batches * 512), 6
        )
        assert r.naive_utilization <= r.packed_utilization + 1e-9


def test_knn_shapley_matches_python_replay(spark):
    """Exact KNN-Shapley recursion replayed in pure python (same dround,
    same rank tie-breaks, same suffix order) — top-10 identical."""
    from steam_prices_data_engineering_spark.plans.round7b import (
        _KSV_K,
        _KSV_PANEL,
        _KSV_TOP,
    )

    rows = read_table(spark, SF, "embeddings").collect()
    val = [(r.vec_id, list(r.embedding), r.label) for r in rows
           if r.vec_id < _KSV_PANEL]
    trn = [(r.vec_id, list(r.embedding), r.label) for r in rows
           if r.vec_id >= _KSV_PANEL]
    n = len(trn)
    acc = defaultdict(float)
    for _vid, vv, vy in val:
        ranked = sorted(
            (
                pyround(
                    sum((float(a) - float(b)) ** 2 for a, b in zip(tv, vv)),
                    6,
                ),
                tid,
                ty,
            )
            for tid, tv, ty in trn
        )
        m = [1.0 if ty == vy else 0.0 for _d, _tid, ty in ranked]
        # match the engine's association exactly: the window computes a
        # suffix CUMSUM of the terms in rank-descending order, then adds
        # m_last/n once outside the sum
        terms = [
            (m[i] - m[i + 1]) / max(_KSV_K, i + 1) if i < n - 1 else 0.0
            for i in range(n)
        ]
        s = [0.0] * n
        c = 0.0
        for i in range(n - 1, -1, -1):
            c += terms[i]
            s[i] = m[n - 1] / n + c
        for i, (_d, tid, _ty) in enumerate(ranked):
            acc[tid] += s[i]
    values = {tid: pyround(v / len(val), 6) for tid, v in acc.items()}
    exp = sorted(values.items(), key=lambda kv: (-kv[1], kv[0]))[:_KSV_TOP]
    got = registry.queries()["knn_shapley_valuation"](spark, SF).collect()
    assert [(r.vec_id, r.shapley_value) for r in got] == exp
    assert [r.value_rank for r in got] == list(range(1, len(exp) + 1))
    # efficiency sanity: values are bounded by the utility range
    assert all(-1.0 <= v <= 1.0 for _t, v in values.items())


def test_fairness_gate_audit_gaps_consistent(spark):
    """Group rates weighted by group size must reproduce the pooled
    rate (so every parity gap is measured against the true pooled
    value), and all rates live in [0, 1]."""
    rows = registry.queries()["fairness_gate_audit"](spark, SF).collect()
    assert rows
    n_tot = sum(r.n_docs for r in rows)
    # accept_rate is rounded per group; allow rounding slack only
    pooled_from_groups = (
        sum(r.accept_rate * r.n_docs for r in rows) / n_tot
    )
    pooled = rows[0].accept_rate - rows[0].parity_gap
    assert abs(pooled_from_groups - pooled) < 1e-4
    for r in rows:
        for v in (r.accept_rate, r.tpr, r.fpr):
            if v is not None:
                assert -1e-9 <= v <= 1 + 1e-9
        assert abs((r.accept_rate - r.parity_gap) - pooled) < 1e-9


def test_coreset_kcenter_matches_python_replay(spark):
    """Farthest-first traversal replayed exactly (same dround per
    pairwise distance, same least() composition, same argmax
    tie-break); selection distances are non-increasing."""
    from steam_prices_data_engineering_spark.plans.round7c import _KC_K

    rows = read_table(spark, SF, "embeddings").collect()
    pts = {r.vec_id: [float(x) for x in r.embedding] for r in rows}
    first = min(pts)
    centers = [first]
    md = {
        vid: pyround(
            sum((a - b) ** 2 for a, b in zip(v, pts[first])), 6
        )
        for vid, v in pts.items()
    }
    expected = [(0, first, None)]
    for t in range(1, _KC_K):
        far = max(md.items(), key=lambda kv: (kv[1], -kv[0]))
        expected.append((t, far[0], far[1]))
        centers.append(far[0])
        for vid, v in pts.items():
            d = pyround(
                sum((a - b) ** 2 for a, b in zip(v, pts[far[0]])), 6
            )
            if d < md[vid]:
                md[vid] = d
    got = sorted(
        (
            (r.center_idx, r.vec_id, r.sel_dist)
            for r in registry.queries()["coreset_kcenter_selection"](
                spark, SF
            ).collect()
        )
    )
    assert got == expected
    dists = [d for _i, _v, d in got if d is not None]
    assert dists == sorted(dists, reverse=True)


def test_fellegi_sunter_em_separates_and_bounds(spark):
    """After EM the match class must dominate the unmatch class on every
    field (m_k > u_k), the all-agree pattern carries the maximum match
    weight and the all-disagree pattern the minimum, and posteriors are
    probabilities."""
    rows = registry.queries()["fellegi_sunter_em"](spark, SF).collect()
    assert rows
    by_pat = {
        (r.name_agrees, r.brand_agrees, r.type_agrees): r for r in rows
    }
    weights = {k: r.match_weight for k, r in by_pat.items()}
    if (1, 1, 1) in weights:
        assert weights[(1, 1, 1)] == max(weights.values())
    if (0, 0, 0) in weights:
        assert weights[(0, 0, 0)] == min(weights.values())
    for r in rows:
        assert -1e-9 <= r.posterior <= 1 + 1e-9
        assert 0 < r.est_match_share < 1
        assert r.n_pairs > 0
    # adding an agreement never lowers the weight (m_k > u_k per field)
    for k, r in by_pat.items():
        for f in range(3):
            if k[f] == 0:
                up = (*k[:f], 1, *k[f + 1 :])
                if up in weights:
                    assert weights[up] > weights[k]


def test_knn_shapley_truncation_error_bounds(spark):
    """The truncation audit's invariants: overlap in [0, 10], deltas
    non-negative with mean <= max, n_train matches the train split, and
    a cut M >= the train count must reproduce the exact values
    (deltas 0, overlap 10)."""
    from steam_prices_data_engineering_spark.plans.round7b import (
        _KSV_M,
        _KSV_PANEL,
    )

    r = registry.queries()["knn_shapley_truncation_error"](
        spark, SF
    ).collect()[0]
    n_emb = read_table(spark, SF, "embeddings").count()
    assert r.m_cut == _KSV_M
    assert r.n_train == n_emb - _KSV_PANEL
    assert 0 <= r.top10_overlap <= 10
    assert 0 <= r.mean_abs_delta <= r.max_abs_delta + 1e-9
    if _KSV_M >= r.n_train:
        assert r.top10_overlap == 10
        assert r.max_abs_delta == 0.0


def test_quantile_sketch_error_eval_gates_true_and_exact(spark):
    """All five rank gates hold at fixture scale, and the exact
    companions equal F.percentile recomputed directly."""
    from pyspark.sql import functions as F

    from steam_prices_data_engineering_spark.plans.round7e import (
        _QSE_QS,
    )

    rows = {
        r.q: r
        for r in registry.queries()["quantile_sketch_error_eval"](
            spark, SF
        ).collect()
    }
    assert set(rows) == set(float(q) for q in _QSE_QS)
    li = read_table(spark, SF, "lineitem")
    n = li.count()
    for q, r in rows.items():
        assert r.rank_dev_ok is True
        assert r.n == n
        exp = li.agg(F.percentile("l_extendedprice", q)).collect()[0][0]
        assert r.exact_value == pyround(exp, 6)
