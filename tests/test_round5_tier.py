"""Semantic contracts of the round-5 tier (plans/round5.py): SPRT LLR
and Wasserstein distance reproduced by independent pure-Python
recomputations, RBO bounds and self-agreement algebra, association-rule
direction symmetry against the undirected pair lattice, pruning
retention mass, and entropy/outlier sanity."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from steam_prices_data_engineering_spark.plans import registry
from steam_prices_data_engineering_spark.sources.tables import read_table

SF = "/root/testdata/sf0.001"


def test_sprt_llr_matches_python(spark):
    rows = {
        r.variant: r
        for r in registry.queries()["sprt_sequential_monitor"](
            spark, SF
        ).collect()
    }
    ev = (
        read_table(spark, SF, "events")
        .select("user_id", "ts", "event_type")
        .collect()
    )
    a = math.log(0.22 / 0.18)
    b = math.log(0.78 / 0.82)
    up, dn = math.log(0.95 / 0.05), math.log(0.05 / 0.95)
    hourly = defaultdict(lambda: [0, 0])  # (variant, hour) -> [n, x]
    for r in ev:
        hr = int(r.ts.timestamp()) // 3600
        key = (r.user_id % 2, hr)
        hourly[key][0] += 1
        hourly[key][1] += int(r.event_type == "purchase")
    for variant in (0, 1):
        hrs = sorted(h for (v, h) in hourly if v == variant)
        cn = cx = 0
        llr_last = None
        first_up = first_dn = None
        for h in hrs:
            n, x = hourly[(variant, h)]
            cn += n
            cx += x
            llr = cx * a + (cn - cx) * b
            llr_last = llr
            if llr >= up and first_up is None:
                first_up = h
            if llr <= dn and first_dn is None:
                first_dn = h
        got = rows[variant]
        assert got.n_hours == len(hrs)
        assert abs(got.llr_final - llr_last) < 1e-4
        if first_up is not None and (first_dn is None or first_up <= first_dn):
            assert got.decision == "reject_h0"
            assert got.crossing_hour == first_up
        elif first_dn is not None:
            assert got.decision == "accept_h0"
            assert got.crossing_hour == first_dn
        else:
            assert got.decision == "continue"
            assert got.crossing_hour == -1


def test_wasserstein_matches_python(spark):
    row = registry.queries()["wasserstein_1d_drift"](spark, SF).collect()[0]
    orders = (
        read_table(spark, SF, "orders")
        .select("o_orderpriority", "o_totalprice")
        .collect()
    )
    ca: Counter = Counter()
    cb: Counter = Counter()
    for r in orders:
        v = int(math.floor(r.o_totalprice))
        if r.o_orderpriority == "1-URGENT":
            ca[v] += 1
        elif r.o_orderpriority == "5-LOW":
            cb[v] += 1
    grid = sorted(set(ca) | set(cb))
    na, nb = sum(ca.values()), sum(cb.values())
    cum_a = cum_b = 0
    w1 = 0.0
    for v, nxt in zip(grid, grid[1:]):
        cum_a += ca.get(v, 0)
        cum_b += cb.get(v, 0)
        w1 += (nxt - v) * abs(cum_a / na - cum_b / nb)
    assert row.n_grid == len(grid)
    assert row.n_a == na and row.n_b == nb
    assert abs(row.w1_dollars - w1) < 1e-2
    # W1 of a distribution against itself is 0; these two differ
    assert row.w1_dollars >= 0


def test_nmi_purity_bounds_and_python(spark):
    row = registry.queries()["cluster_eval_nmi_purity"](spark, SF).collect()[0]
    docs = read_table(spark, SF, "documents").select("source", "lang").collect()
    n = len(docs)
    ct = Counter((r.source, r.lang) for r in docs)
    cs = Counter(r.source for r in docs)
    cl = Counter(r.lang for r in docs)
    mi = sum(
        (c / n) * math.log(c * n / (cs[s] * cl[g]))
        for (s, g), c in ct.items()
    )
    hs = -sum((c / n) * math.log(c / n) for c in cs.values())
    hl = -sum((c / n) * math.log(c / n) for c in cl.values())
    purity = sum(
        max(c for (s2, _), c in ct.items() if s2 == s) for s in cs
    ) / n
    assert row.n_docs == n
    assert abs(row.nmi - mi / math.sqrt(hs * hl)) < 1e-5
    assert abs(row.purity - purity) < 1e-6
    assert 0.0 <= row.nmi <= 1.0 + 1e-9
    # purity is bounded below by the majority-class share
    assert row.purity >= max(cl.values()) / n - 1e-9


def test_rbo_bounds_and_overlap_consistency(spark):
    row = registry.queries()["rank_agreement_rbo"](spark, SF).collect()[0]
    k, p = 20, 0.9
    assert row.k == k
    assert 0 <= row.overlap_at_k <= k
    # truncated RBO is bounded by the identical-rankings value (1 - p^K
    # after normalizing each depth's maximum overlap d)
    rbo_max = (1 - p) * sum(p ** (d - 1) for d in range(1, k + 1))
    assert 0.0 <= row.rbo_at_k <= rbo_max + 1e-9


def test_association_rules_direction_symmetry(spark):
    rules = registry.queries()["association_rules_confidence"](
        spark, SF
    ).collect()
    pairs = registry.queries()["frequent_itempairs"](spark, SF).collect()
    by_dir = {(r.antecedent, r.consequent): r for r in rules}
    assert len(by_dir) == len(rules)  # rule grain is unique
    # every undirected frequent pair emits exactly its two directions,
    # with equal support and lift (symmetric measures), and the
    # direction-dependent confidence obeys conf = supp / count(ante)
    assert len(rules) == 2 * len(pairs)
    for pr in pairs:
        fwd = by_dir[(pr.part_a, pr.part_b)]
        rev = by_dir[(pr.part_b, pr.part_a)]
        assert fwd.support == rev.support == pr.support
        assert abs(fwd.lift - rev.lift) < 1e-6
        assert abs(fwd.lift - pr.lift) < 1e-6
        assert 0 < fwd.confidence <= 1.0 and 0 < rev.confidence <= 1.0


def test_pruning_keeps_ninety_percent_mass(spark):
    rows = registry.queries()["data_pruning_surprisal"](spark, SF).collect()
    n = sum(r.n_docs for r in rows)
    kept = sum(r.n_kept for r in rows)
    # the 0.9-quantile cutoff keeps ~90% globally (ties on the rounded
    # score can pull a little extra across the boundary)
    assert 0.85 * n <= kept <= 0.95 * n
    for r in rows:
        assert 0 <= r.n_kept <= r.n_docs
        assert r.mean_surprisal_kept is None or r.mean_surprisal_kept > 0


def test_slot_entropy_sanity(spark):
    rows = registry.queries()["template_slot_entropy"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.min_slot_entropy >= -1e-9  # entropy is non-negative
        assert r.avg_slot_entropy >= r.min_slot_entropy - 1e-9
        assert r.n_docs > 0


def test_embedding_outliers_bounded(spark):
    rows = registry.queries()["embedding_outlier_zscore"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_outliers <= r.n_vecs
        assert r.mean_cos <= 1.0 + 1e-9
    # z > 2 cannot flag more than ~a quarter of any label by Chebyshev
    for r in rows:
        assert r.n_outliers <= max(1, r.n_vecs // 4)


def test_ips_snips_relationship(spark):
    row = registry.queries()["ips_offline_policy_value"](spark, SF).collect()[0]
    assert row.n_events > 0
    assert row.behavior_value > 0
    # SNIPS is the self-normalized form: both estimates positive, and
    # SNIPS stays within the reward range while IPS may not
    assert row.snips_value > 0
    assert row.ips_value > 0


def test_markov_removal_shares_normalize(spark):
    rows = registry.queries()["attribution_markov_removal"](
        spark, SF
    ).collect()
    assert len(rows) == 4  # the four non-converting channels
    assert abs(sum(r.attribution_share for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert 0.0 <= r.removal_effect <= 1.0
        assert 0.0 < r.p_conv_full <= 1.0
    # every channel's removal hurts conversion on this fixture
    assert all(r.removal_effect > 0 for r in rows)


def test_temperature_weights_normalize_and_flatten(spark):
    rows = sorted(
        registry.queries()["lang_sampling_temperature"](spark, SF).collect(),
        key=lambda r: r.p_raw,
    )
    assert abs(sum(r.q_alpha for r in rows) - 1.0) < 1e-4
    # alpha < 1 flattens: upsample factor decreases as raw share grows
    factors = [r.upsample_factor for r in rows]
    assert factors == sorted(factors, reverse=True)
    assert factors[0] > 1.0 > factors[-1]


def test_token_allocation_sums_to_budget(spark):
    rows = registry.queries()["mixture_token_allocation"](spark, SF).collect()
    assert sum(r.alloc_tokens for r in rows) == 100_000
    for r in rows:
        # each allocation is the floor or the floor + 1 of its ideal
        assert r.alloc_tokens - r.ideal_tokens < 1.0 + 1e-6
        assert r.ideal_tokens - r.alloc_tokens < 1.0 + 1e-6


def test_lsh_curve_monotone_and_threshold_order(spark):
    rows = registry.queries()["lsh_parameter_curve"](spark, SF).collect()
    by_cfg = {}
    for r in rows:
        by_cfg.setdefault((r.bands, r.rws), []).append(r)
    assert len(by_cfg) == 4
    th = {}
    for cfg, rs in by_cfg.items():
        rs.sort(key=lambda r: r.jaccard_s)
        ps = [r.p_candidate for r in rs]
        assert all(a <= b + 1e-9 for a, b in zip(ps, ps[1:]))  # monotone
        assert 0.0 <= ps[0] and ps[-1] <= 1.0 + 1e-9
        th[cfg] = rs[0].threshold_50
    # more rows per band -> higher similarity threshold
    assert th[(16, 1)] < th[(8, 2)] < th[(4, 4)] < th[(2, 8)]


def test_cem_and_rdd_sanity(spark):
    cem = registry.queries()["cem_att_estimate"](spark, SF).collect()[0]
    assert cem.n_treated_matched > 0 and cem.n_control_matched > 0
    assert cem.att is not None
    rdd = registry.queries()["regression_discontinuity"](spark, SF).collect()[0]
    assert rdd.n_left > 0 and rdd.n_right > 0
    # outcome is a share: intercepts live in [0, 1]
    assert 0.0 <= rdd.intercept_left <= 1.0
    assert 0.0 <= rdd.intercept_right <= 1.0
    assert abs(rdd.rdd_effect - (rdd.intercept_right - rdd.intercept_left)) < 2e-6


def test_woe_iv_partitions_lineitem(spark):
    rows = registry.queries()["woe_iv_binning"](spark, SF).collect()
    li_n = read_table(spark, SF, "lineitem").count()
    assert sum(r.n_good + r.n_bad for r in rows) == li_n
    for r in rows:
        # (g - b) and ln(g/b) share sign, so IV contributions are
        # non-negative up to smoothing slack
        assert r.iv_contrib >= -1e-3


def test_bh_stepup_is_contiguous(spark):
    rows = sorted(
        registry.queries()["ab_benjamini_hochberg"](spark, SF).collect(),
        key=lambda r: r.p_rank,
    )
    # BH rejects a PREFIX of the p-ordered list
    flags = [r.rejected for r in rows]
    assert flags == sorted(flags, reverse=True)
    for r in rows:
        assert 0.0 <= r.p_value <= 1.0 + 1e-9


def test_gbm_boosting_reduces_mse(spark):
    row = registry.queries()["gbm_stumps_two_rounds"](spark, SF).collect()[0]
    # each boosting round can only reduce squared loss on train
    assert row.mse_round1 <= row.mse_baseline + 1e-6
    assert row.mse_round2 <= row.mse_round1 + 1e-6


def test_bandit_replay_covers_all_hours(spark):
    from pyspark.sql import functions as F

    rows = registry.queries()["bandit_ucb_replay"](spark, SF).collect()
    n_hours = (
        read_table(spark, SF, "events")
        .select(F.floor(F.col("ts").cast("long") / 3600).alias("h"))
        .distinct()
        .count()
    )
    # exactly one arm is picked per hour, so the chosen-hours partition
    # the hour grid
    assert sum(r.hours_chosen for r in rows) == n_hours
