"""Semantic contracts of the round-6 part-D tier (plans/round6d.py):
Good-Turing/Chao1 counts, the quantile-normalization decile mapping,
Cohen's kappa arithmetic, and the delete-one-group jackknife — each
reproduced by an independent pure-Python recomputation at sf0.001."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from steam_prices_data_engineering_spark.plans import registry
from steam_prices_data_engineering_spark.sources.tables import read_table

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return (
        read_table(spark, SF, "documents")
        .select("doc_id", "source", "text")
        .collect()
    )


def _quality(text: str) -> float:
    sp = text.split(" ")
    n = len(sp)
    diversity = len(set(sp)) / n
    stop = sum(1 for x in sp if x in ("the", "a")) / n
    return 0.5 * diversity + 0.3 * (1 - stop) + 0.2 * min(n / 100.0, 1.0)


def _pctl(sorted_vals, p):
    idx = (len(sorted_vals) - 1) * p
    lo, hi = int(math.floor(idx)), int(math.ceil(idx))
    return sorted_vals[lo] + (idx - lo) * (sorted_vals[hi] - sorted_vals[lo])


def test_good_turing_matches_python(spark):
    got = {
        r.source: r
        for r in registry.queries()["good_turing_unseen_mass"](
            spark, SF
        ).collect()
    }
    per = defaultdict(Counter)
    for r in _docs(spark):
        per[r.source].update(r.text.split(" "))
    assert set(got) == set(per)
    for src, cnt in per.items():
        g = got[src]
        n = sum(cnt.values())
        v = len(cnt)
        n1 = sum(1 for c in cnt.values() if c == 1)
        n2 = sum(1 for c in cnt.values() if c == 2)
        assert (g.n_tokens, g.vocab, g.hapax, g.dis) == (n, v, n1, n2)
        assert abs(g.turing_coverage - (1 - n1 / n)) < 1e-5
        chao_extra = n1 * (n1 - 1) / (2 * (n2 + 1))
        assert abs(g.chao1_richness - (v + chao_extra)) < 0.01
        assert abs(g.unseen_type_frac - chao_extra / (v + chao_extra)) < 1e-5


def test_quantile_normalize_matches_python(spark):
    got = {
        (r.source, r.decile): r
        for r in registry.queries()["quantile_normalize_scores"](
            spark, SF
        ).collect()
    }
    per = defaultdict(list)
    pool = []
    for r in _docs(spark):
        q = _quality(r.text)
        per[r.source].append(q)
        pool.append(q)
    pool.sort()
    assert set(got) == {(s, d) for s in per for d in range(1, 10)}
    for (src, d), g in got.items():
        sv = _pctl(sorted(per[src]), d / 10.0)
        pv = _pctl(pool, d / 10.0)
        assert abs(g.src_value - sv) < 1e-5
        assert abs(g.pooled_value - pv) < 1e-5
        assert abs(g.shift - (pv - sv)) < 1e-5
    # within a source the mapping is monotone in the decile
    for src in per:
        vals = [got[(src, d)].src_value for d in range(1, 10)]
        assert vals == sorted(vals)


def test_cohen_kappa_matches_python(spark):
    row = registry.queries()["cohen_kappa_labels"](spark, SF).collect()[0]
    labels = []
    for r in _docs(spark):
        sp = r.text.split(" ")
        a = 1 if len(set(sp)) / len(sp) >= 0.5 else 0
        labels.append((a, round(_quality(r.text), 6)))
    qs = sorted(q for _, q in labels)
    med = round(_pctl(qs, 0.5), 6)
    n = len(labels)
    na = sum(a for a, _ in labels)
    nb = sum(1 for _, q in labels if q >= med)
    nagree = sum(1 for a, q in labels if a == (1 if q >= med else 0))
    pa, pb, po = na / n, nb / n, nagree / n
    pe = pa * pb + (1 - pa) * (1 - pb)
    assert row.n_docs == n
    assert abs(row.p_a_hi - pa) < 1e-5
    assert abs(row.p_b_hi - pb) < 1e-5
    assert abs(row.p_observed - po) < 1e-5
    assert abs(row.p_expected - pe) < 1e-5
    assert abs(row.kappa - (po - pe) / (1 - pe)) < 1e-4
    assert -1.0 <= row.kappa <= 1.0


def test_jackknife_matches_python(spark):
    got = {
        r.source: r
        for r in registry.queries()["jackknife_source_influence"](
            spark, SF
        ).collect()
    }
    per = defaultdict(lambda: [0, 0.0])
    for r in _docs(spark):
        p = per[r.source]
        p[0] += 1
        p[1] += _quality(r.text)
    nt = sum(n for n, _ in per.values())
    st = sum(s for _, s in per.values())
    full = st / nt
    loo = {
        src: (st - s) / (nt - n) for src, (n, s) in per.items()
    }
    g = len(per)
    m = sum(loo.values()) / g
    se = math.sqrt((g - 1) / g * sum((x - m) ** 2 for x in loo.values()))
    assert set(got) == set(per)
    for src, r in got.items():
        assert r.n_docs == per[src][0]
        assert abs(r.loo_mean - loo[src]) < 1e-5
        assert abs(r.influence - (full - loo[src])) < 1e-5
        assert abs(r.jackknife_se - se) < 1e-5
    # influences sum to ~0 weighted by nothing in the balanced case —
    # at minimum they must straddle zero unless all sources identical
    infl = [r.influence for r in got.values()]
    assert min(infl) <= 0.0 <= max(infl)
