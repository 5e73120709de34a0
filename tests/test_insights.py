"""Semantic contracts of the round-2c decision-support tier
(plans/insights.py + the linkage/diagnostics additions): properties the
oracle hash-compare proves only indirectly — probe completeness of the
spatial cell join (vs a brute-force ground truth), directional
containment on an embedded document, recommendation top-k bounds, Holt
equivalence to the scalar recursion, and RFM quartile balance."""

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


def test_spatial_cell_join_matches_brute_force(spark):
    """The 3x3 probe at 0.25-deg cells must find EXACTLY the pairs a
    brute-force all-pairs haversine finds at 25 km — cell bucketing is
    an optimization, never a recall trade."""
    out = {
        (r.cust_a, r.cust_b)
        for r in registry.queries()["spatial_cell_join"](spark, SF).collect()
    }
    cust = read_table(spark, SF, "customer").select("c_custkey").collect()

    import hashlib

    def h6(key: str) -> int:
        return int(hashlib.md5(key.encode()).hexdigest()[:6], 16)

    pts = {
        r.c_custkey: (
            (h6(f"glat_{r.c_custkey}") % 50000) / 10000.0,
            (h6(f"glon_{r.c_custkey}") % 50000) / 10000.0,
        )
        for r in cust
    }

    def hav(a, b):
        (la1, lo1), (la2, lo2) = pts[a], pts[b]
        dla = math.radians(la2 - la1) / 2
        dlo = math.radians(lo2 - lo1) / 2
        x = math.sin(dla) ** 2 + math.cos(math.radians(la1)) * math.cos(
            math.radians(la2)
        ) * math.sin(dlo) ** 2
        return 2 * 6371.0 * math.asin(math.sqrt(x))

    keys = sorted(pts)
    brute = {
        (a, b)
        for i, a in enumerate(keys)
        for b in keys[i + 1 :]
        if math.floor(hav(a, b) * 1000 + 0.5) / 1000 <= 25.0
    }
    assert out == brute
    assert brute  # non-vacuous: the fixture region is dense enough


def test_containment_detects_embedded_document(spark, tmp_path):
    """A short doc fully embedded in a longer one must surface as a
    directional pair (inner=short) with containment 1.0 — the case
    symmetric Jaccard dilutes below any usable threshold."""
    d = tmp_path / "contain_sf"
    d.mkdir()
    inner = "alpha beta gamma delta epsilon zeta"
    outer = inner + " " + "eta theta iota kappa " * 8
    rows = [
        (1, inner, "en", "web", len(inner)),
        (2, outer, "en", "web", len(outer)),
        (3, "totally different words entirely here now", "en", "web", 42),
    ]
    spark.createDataFrame(rows, TABLE_SCHEMAS["documents"]).write.parquet(
        str(d / "documents.parquet")
    )
    for name in ("region", "nation", "customer", "supplier", "part", "orders",
                 "lineitem", "events", "embeddings"):
        spark.createDataFrame([], TABLE_SCHEMAS[name]).write.parquet(
            str(d / f"{name}.parquet")
        )
    got = {
        (r.inner_doc, r.outer_doc): r.containment
        for r in registry.queries()["containment_dedup_pairs"](
            spark, str(d)
        ).collect()
    }
    assert got.get((1, 2)) == 1.0
    assert (2, 1) not in got  # the long doc is NOT contained in the short
    assert not any(3 in k for k in got)


def test_item_item_topk_bounds(spark):
    rows = registry.queries()["item_item_cosine"](spark, SF).collect()
    assert rows
    per_item = {}
    for r in rows:
        per_item.setdefault(r.item_a, []).append(r)
        assert 1 <= r.rec_rank <= 3
        assert 0.0 < r.cosine <= 1.0
        assert r.support >= 3
    for item, rs in per_item.items():
        assert len(rs) <= 3
        ranks = sorted(x.rec_rank for x in rs)
        assert ranks == list(range(1, len(rs) + 1))


def test_holt_matches_scalar_recursion(spark):
    """The engine fold equals the straightforward per-user Python
    recursion (alpha=.5, beta=.3) on every user at sf0.001."""
    e = read_table(spark, SF, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    series: dict[int, list] = {}
    for r in sorted(e.collect(), key=lambda r: (r.user_id, r.ts, r.event_id)):
        series.setdefault(r.user_id, []).append(r.value)
    got = {
        r.user_id: (r.holt_level, r.holt_trend)
        for r in registry.queries()["holt_trend_smoothing"](spark, SF).collect()
    }
    assert set(got) == set(series)
    for uid, xs in series.items():
        l, b = xs[0], 0.0
        for x in xs[1:]:
            nl = 0.5 * x + 0.5 * (l + b)
            b = 0.3 * (nl - l) + 0.7 * b
            l = nl
        assert got[uid] == (
            math.floor(l * 1e6 + 0.5) / 1e6,
            math.floor(b * 1e6 + 0.5) / 1e6,
        ), uid


def test_rfm_quartiles_balanced(spark):
    """ntile(4) bucket sizes along each axis differ by at most one, all
    scores live in 1..4, and the cells partition the customer set."""
    rows = registry.queries()["rfm_segments"](spark, SF).collect()
    n_cust = (
        read_table(spark, SF, "orders").select("o_custkey").distinct().count()
    )
    assert sum(r.n_customers for r in rows) == n_cust
    for axis in ("r_score", "f_score", "m_score"):
        per = {}
        for r in rows:
            k = getattr(r, axis)
            assert 1 <= k <= 4
            per[k] = per.get(k, 0) + r.n_customers
        assert max(per.values()) - min(per.values()) <= 1


def test_record_linkage_weights_consistent(spark):
    """Pair weights equal the product of the names' record counts, and
    every pair shares the blocking noun."""
    rows = registry.queries()["record_linkage_blocking"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.implied_record_pairs == r.n_records_a * r.n_records_b
        assert r.name_a.split(" ")[1] == r.name_b.split(" ")[1]
        assert r.lev <= 3
        assert (r.match_class == "strong") == (r.lev <= 1)


def test_isotonic_calibration_is_pav_solution(spark):
    """The minimax-identity fit must equal the sequential
    pool-adjacent-violators solution on the same binned (n, keeps), and
    be nondecreasing in the score order."""
    from steam_prices_data_engineering_spark.plans import registry

    rows = (
        registry.queries()["quality_isotonic_calibration"](
            spark, "/root/testdata/sf0.001"
        )
        .orderBy("bin")
        .collect()
    )
    assert rows
    iso = [r.iso_keep_rate for r in rows]
    assert all(a <= b + 1e-9 for a, b in zip(iso, iso[1:]))
    # reference sequential PAV over the same bins
    blocks = [
        [r.n_docs * r.raw_keep_rate, r.n_docs] for r in rows
    ]  # [sum_keep, n]
    merged: list[list[float]] = []
    for blk in blocks:
        merged.append(list(blk))
        while len(merged) >= 2 and (
            merged[-2][0] / merged[-2][1] > merged[-1][0] / merged[-1][1]
        ):
            s2, n2 = merged.pop()
            merged[-1][0] += s2
            merged[-1][1] += n2
    # expand blocks back to per-bin fitted values
    ref: list[float] = []
    idx = 0
    for s, n in merged:
        # count how many original bins this block covers by consuming n
        acc = 0
        while acc < n - 1e-6:
            acc += rows[idx].n_docs
            ref.append(s / n)
            idx += 1
    assert len(ref) == len(iso)
    for a, b in zip(iso, ref):
        assert abs(a - b) < 1e-6, (iso, ref)


def test_logreg_beats_trivial_predictor(spark):
    """Two Newton steps must land a model with train log-loss strictly
    better than the best constant predictor's entropy bound (and finite,
    i.e. no saturated mu hit ln(0))."""
    import math

    from steam_prices_data_engineering_spark.plans import registry

    row = registry.queries()["logreg_newton_irls"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert row.n_orders > 0
    assert row.log_loss is not None and math.isfinite(row.log_loss)
    assert row.log_loss < math.log(2.0)
