"""Semantic contracts of the round-6 part-F tier (plans/round6f.py):
the Chinchilla N/D arithmetic, the Heaps log-log OLS (recomputed
independently, plus the exponent sanity band), and the k-anonymity
ladder's monotonicity — each replayed in pure Python at sf0.001."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

from steam_prices_data_engineering_spark.plans import registry
from steam_prices_data_engineering_spark.sources.tables import read_table

SF = "/root/testdata/sf0.001"


def test_chinchilla_matches_formula(spark):
    rows = registry.queries()["chinchilla_optimal_allocation"](
        spark, SF
    ).collect()
    docs = (
        read_table(spark, SF, "documents").select("text").collect()
    )
    uniq = {}
    for r in docs:
        uniq[hashlib.md5(r.text.encode()).hexdigest()] = len(
            r.text.split(" ")
        )
    u = sum(uniq.values())
    assert len(rows) == 5
    for r in sorted(rows, key=lambda r: r.flops):
        n_opt = math.sqrt(r.flops / 120.0)
        assert abs(r.n_opt_params - n_opt) < 0.5
        assert abs(r.d_opt_tokens - 20 * n_opt) < 1.0
        assert r.unique_tokens == u
        assert abs(r.data_ratio - u / (20 * n_opt)) < 1e-4
        assert abs(r.epochs_needed - (20 * n_opt) / u) < 1e-2
        assert r.data_sufficient == (u >= 20 * n_opt)
    # ten-fold compute -> sqrt(10)-fold optimal size
    by_f = sorted(rows, key=lambda r: r.flops)
    for a, b in zip(by_f, by_f[1:]):
        assert abs(b.n_opt_params / a.n_opt_params - math.sqrt(10)) < 0.01


def test_heaps_fit_matches_python(spark):
    got = {
        r.decile: r
        for r in registry.queries()["heaps_law_fit"](spark, SF).collect()
    }
    docs = (
        read_table(spark, SF, "documents")
        .select("doc_id", "text")
        .collect()
    )
    mn = min(r.doc_id for r in docs)
    mx = max(r.doc_id for r in docs)
    toks = Counter()
    first = {}
    for r in docs:
        dec = min(9, math.floor((r.doc_id - mn) * 10.0 / (mx - mn + 1)))
        for t in r.text.split(" "):
            toks[dec] += 1
            if t not in first or dec < first[t]:
                first[t] = dec
    newt = Counter(first.values())
    decs = sorted(toks)
    n_cum, v_cum, cn, cv = {}, {}, 0, 0
    for d in decs:
        cn += toks[d]
        cv += newt.get(d, 0)
        n_cum[d], v_cum[d] = cn, cv
    xs = [math.log(n_cum[d]) for d in decs]
    ys = [math.log(v_cum[d]) for d in decs]
    g = len(decs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    beta = (g * sxy - sx * sy) / (g * sxx - sx * sx)
    lk = (sy - beta * sx) / g
    assert set(got) == set(decs)
    for d in decs:
        r = got[d]
        assert r.n_tokens_cum == n_cum[d]
        assert r.vocab_cum == v_cum[d]
        assert abs(r.heaps_beta - beta) < 1e-5
        assert abs(r.heaps_k - math.exp(lk)) < 1e-2
        fitted = math.exp(lk + beta * math.log(n_cum[d]))
        assert abs(r.fitted_vocab - fitted) < 0.5
        assert abs(r.rel_residual - (v_cum[d] - fitted) / v_cum[d]) < 1e-4
    # sublinear exponent; the synthetic fixture's bounded vocabulary
    # saturates in decile 0, so beta can legitimately read 0.0 here
    assert 0.0 <= got[decs[0]].heaps_beta < 1.0
    # cumulative curves are monotone by construction
    ns = [got[d].n_tokens_cum for d in decs]
    vs = [got[d].vocab_cum for d in decs]
    assert ns == sorted(ns) and vs == sorted(vs)


def test_kanon_ladder_monotone(spark):
    got = {
        r.level: r
        for r in registry.queries()["kanon_generalization_sweep"](
            spark, SF
        ).collect()
    }
    cust = (
        read_table(spark, SF, "customer")
        .select("c_nationkey", "c_mktsegment", "c_acctbal")
        .collect()
    )
    levels = {
        "nation+segment+band": lambda r: (
            r.c_nationkey,
            r.c_mktsegment,
            math.floor(r.c_acctbal / 500.0),
        ),
        "nation+segment": lambda r: (r.c_nationkey, r.c_mktsegment),
        "nation": lambda r: (r.c_nationkey,),
        "all": lambda r: (),
    }
    assert set(got) == set(levels)
    total = len(cust)
    for name, keyfn in levels.items():
        groups = Counter(keyfn(r) for r in cust)
        g = got[name]
        assert g.n_groups == len(groups)
        assert g.k_min == min(groups.values())
        small = sum(n for n in groups.values() if n < 10)
        assert abs(g.pct_rows_below_k - small / total) < 1e-5
        assert g.k_anonymous == (min(groups.values()) >= 10)
    # generalizing can only raise the minimum group size
    assert (
        got["nation+segment+band"].k_min
        <= got["nation+segment"].k_min
        <= got["nation"].k_min
        <= got["all"].k_min
    )
