"""Semantic contracts of the round-6 part-G tier (plans/round6g.py):
the Selinger bucket estimate and exact join sizes replayed in Python,
and the zone-map prunability/scan-efficiency arithmetic — at sf0.001.
Both also pin the diagnostic's INVARANTS: the estimate never
under-counts when one side's keys are unique, and a prunable zone
contains no matching rows."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from steam_prices_data_engineering_spark.plans import registry
from steam_prices_data_engineering_spark.sources.tables import read_table

SF = "/root/testdata/sf0.001"
B = 64


def test_join_cardinality_matches_python(spark):
    got = {
        r.bucket: r
        for r in registry.queries()["join_cardinality_audit"](
            spark, SF
        ).collect()
    }
    ok = Counter(
        r.o_orderkey
        for r in read_table(spark, SF, "orders")
        .select("o_orderkey")
        .collect()
    )
    lk = Counter(
        r.l_orderkey
        for r in read_table(spark, SF, "lineitem")
        .select("l_orderkey")
        .collect()
    )
    ob, lb, ex = (
        defaultdict(lambda: [0, 0]),
        defaultdict(lambda: [0, 0]),
        Counter(),
    )
    for k, c in ok.items():
        ob[k % B][0] += c
        ob[k % B][1] += 1
    for k, c in lk.items():
        lb[k % B][0] += c
        lb[k % B][1] += 1
        if k in ok:
            ex[k % B] += ok[k] * c
    assert set(got) == set(ob) & set(lb)
    for b, g in got.items():
        assert g.n_orders == ob[b][0]
        assert g.d_orders == ob[b][1]
        assert g.n_lineitem == lb[b][0]
        assert g.d_lineitem == lb[b][1]
        assert g.exact_join == ex.get(b, 0)
        est = ob[b][0] * lb[b][0] / max(ob[b][1], lb[b][1])
        assert abs(g.est_join - est) < 0.5
        if ex.get(b, 0):
            assert abs(g.est_over_exact - est / ex[b]) < 1e-4
        # with unique orders keys the uniform estimate never undercounts
        # rows whose key exists on both sides; it can only over-count by
        # assuming EVERY lineitem key matches
        assert g.est_join >= g.exact_join - 0.5


def test_zonemap_pruning_matches_python(spark):
    got = {
        r.bucket: r
        for r in registry.queries()["zonemap_pruning_audit"](
            spark, SF
        ).collect()
    }
    ev = [
        (r.event_id, int(math.floor(r.ts.timestamp())))
        for r in read_table(spark, SF, "events")
        .select("event_id", "ts")
        .collect()
    ]
    mn = min(e for e, _ in ev)
    mx = max(e for e, _ in ev)
    cutoff = max(s for _, s in ev) - 7 * 86400
    zones = defaultdict(list)
    for e, s in ev:
        b = min(31, math.floor((e - mn) * 32.0 / (mx - mn + 1)))
        zones[b].append(s)
    assert set(got) == set(zones)
    for b, secs in zones.items():
        g = got[b]
        assert g.zone_min_epoch == min(secs)
        assert g.zone_max_epoch == max(secs)
        assert g.n_rows == len(secs)
        match = sum(1 for s in secs if s >= cutoff)
        assert g.n_match == match
        assert g.prunable == (max(secs) < cutoff)
        if g.prunable:
            # the invariant zone-map pruning relies on
            assert g.n_match == 0
            assert g.scan_efficiency is None
        else:
            assert abs(g.scan_efficiency - match / len(secs)) < 1e-5
