"""Semantic contracts of the round-4 eval tier (plans/ml_eval.py
cv_fold_rmse / learning_curve_scaling, plans/corpus_eval.py
dedup_threshold_sweep / tokenizer_fertility): the CV and learning-curve
errors are reproduced by an independent pure-Python recomputation, the
threshold sweep is monotone and consistent with the production dedup
query at its own cutoff, and fertility aggregates partition the corpus.
"""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from steam_prices_data_engineering_spark.plans import registry
from steam_prices_data_engineering_spark.sources.tables import read_table

SF = "/root/testdata/sf0.001"

KNUTH = lambda k: ((k % 2147483648) * 2654435761) % 4294967296  # noqa: E731


def _orders(spark):
    return [
        (r.o_orderkey, r.o_orderpriority, r.o_totalprice)
        for r in read_table(spark, SF, "orders")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .collect()
    ]


def test_cv_folds_partition_orders_and_match_python(spark):
    """Every order lands in exactly one fold's eval set, and each fold's
    RMSE/MAE matches a sequential Python leave-one-fold-out run."""
    rows = {
        r.fold: r
        for r in registry.queries()["cv_fold_rmse"](spark, SF).collect()
    }
    data = _orders(spark)
    assert sum(r.n_eval for r in rows.values()) == len(data)
    sums = defaultdict(lambda: [0.0, 0])  # (fold, pri) -> [sum, n]
    tot = defaultdict(lambda: [0.0, 0])  # pri -> [sum, n]
    for k, pri, y in data:
        f = KNUTH(k) % 5
        sums[(f, pri)][0] += y
        sums[(f, pri)][1] += 1
        tot[pri][0] += y
        tot[pri][1] += 1
    for f in range(5):
        se = ae = n = 0.0
        for k, pri, y in data:
            if KNUTH(k) % 5 != f:
                continue
            s, c = sums[(f, pri)]
            pred = (tot[pri][0] - s) / (tot[pri][1] - c)
            se += (y - pred) ** 2
            ae += abs(y - pred)
            n += 1
        assert rows[f].n_eval == n
        assert abs(rows[f].rmse - math.sqrt(se / n)) < 1e-2
        assert abs(rows[f].mae - ae / n) < 1e-2


def test_learning_curve_nested_and_matches_python(spark):
    """n_train grows with the subset size, n_eval is the fixed holdout,
    and the full-prefix (8-bucket) RMSE matches a Python recomputation."""
    rows = sorted(
        registry.queries()["learning_curve_scaling"](spark, SF).collect(),
        key=lambda r: r.train_buckets,
    )
    assert [r.train_buckets for r in rows] == [2, 4, 6, 8]
    assert all(
        a.n_train_grid < b.n_train_grid for a, b in zip(rows, rows[1:])
    )
    assert len({r.n_eval for r in rows}) == 1
    data = _orders(spark)
    tr = defaultdict(lambda: [0.0, 0])
    ev = []
    for k, pri, y in data:
        b = KNUTH(k) % 10
        if b < 8:
            tr[pri][0] += y
            tr[pri][1] += 1
        else:
            ev.append((pri, y))
    # priorities present in eval but absent from train drop via the join
    se = [
        (y - tr[pri][0] / tr[pri][1]) ** 2
        for pri, y in ev
        if tr[pri][1]
    ]
    full = next(r for r in rows if r.train_buckets == 8)
    assert full.n_eval == len(se)
    assert abs(full.rmse - math.sqrt(sum(se) / len(se))) < 1e-2


def test_dedup_sweep_monotone_and_consistent_with_production_cutoff(spark):
    """Pairs and docs-removed shrink as tau rises; the tau=0.5 row counts
    exactly the pairs the production neardup_minhash_lsh query emits at
    its own 0.5 cutoff."""
    rows = sorted(
        registry.queries()["dedup_threshold_sweep"](spark, SF).collect(),
        key=lambda r: r.tau,
    )
    assert [round(r.tau, 2) for r in rows] == [0.5, 0.6, 0.7, 0.8, 0.9]
    for a, b in zip(rows, rows[1:]):
        assert a.n_pairs >= b.n_pairs
        assert a.n_docs_removed >= b.n_docs_removed
    for r in rows:
        assert r.n_docs_removed <= r.n_pairs
    prod = registry.queries()["neardup_minhash_lsh"](spark, SF).count()
    assert rows[0].n_pairs == prod


def test_fertility_partitions_corpus_and_matches_python(spark):
    """Language rows partition the corpus; one language's fertility is
    reproduced from per-doc regex/whitespace counts in Python."""
    import re

    from steam_prices_data_engineering_spark.plans.llm_text import (
        _BPE_PATTERN,
    )

    rows = {
        r.lang: r
        for r in registry.queries()["tokenizer_fertility"](spark, SF).collect()
    }
    docs = (
        read_table(spark, SF, "documents")
        .select("lang", "text")
        .collect()
    )
    assert sum(r.n_docs for r in rows.values()) == len(docs)
    pat = re.compile(_BPE_PATTERN)
    lang = next(iter(rows))
    n_bpe = n_ws = 0
    for r in docs:
        if r.lang != lang:
            continue
        n_bpe += len(pat.findall(r.text))
        n_ws += len(r.text.split(" "))
    assert abs(rows[lang].fertility - n_bpe / n_ws) < 1e-5
    for r in rows.values():
        assert r.chars_per_token > 0
        assert 0 <= r.n_high_fertility_docs <= r.n_docs


def test_incremental_dedup_is_complete_for_delta_touching_pairs(spark):
    """The incremental result must equal the FULL dedup run restricted to
    pairs with >= 1 delta-side doc — no pair lost, none invented, and
    pair_type labels match direct side membership."""
    inc = {
        (r.doc_id_a, r.doc_id_b): (round(r.jaccard, 6), r.pair_type)
        for r in registry.queries()["dedup_incremental_delta"](
            spark, SF
        ).collect()
    }
    full = {
        (r.doc_id_a, r.doc_id_b): round(r.jaccard, 6)
        for r in registry.queries()["neardup_minhash_lsh"](spark, SF).collect()
    }
    is_delta = lambda doc: KNUTH(doc) % 10 >= 8  # noqa: E731
    expected = {
        p: j for p, j in full.items() if is_delta(p[0]) or is_delta(p[1])
    }
    assert set(inc) == set(expected)
    for p, (j, ptype) in inc.items():
        assert j == expected[p]
        both = is_delta(p[0]) and is_delta(p[1])
        assert ptype == ("delta-delta" if both else "delta-base")


def test_ridge_lambda_zero_matches_python_and_shrinks(spark):
    """The lambda=0 fit must reproduce a pure-Python normal-equations
    solve on the same train split, and the penalized-coefficient norm
    must be non-increasing in lambda (the ridge shrinkage property)."""
    rows = sorted(
        registry.queries()["ridge_lambda_sweep"](spark, SF).collect(),
        key=lambda r: r.lam,
    )
    assert [round(r.lam, 2) for r in rows] == [0.0, 0.1, 1.0, 10.0, 100.0]
    li = [
        (r.l_orderkey, r.l_quantity, r.l_discount, r.l_extendedprice)
        for r in read_table(spark, SF, "lineitem")
        .select("l_orderkey", "l_quantity", "l_discount", "l_extendedprice")
        .collect()
    ]
    tr = [(x1, x2, y) for k, x1, x2, y in li if KNUTH(k) % 10 < 8]
    n = float(len(tr))
    s1 = sum(t[0] for t in tr); s2 = sum(t[1] for t in tr)
    s11 = sum(t[0] * t[0] for t in tr); s12 = sum(t[0] * t[1] for t in tr)
    s22 = sum(t[1] * t[1] for t in tr)
    sy = sum(t[2] for t in tr); sy1 = sum(t[0] * t[2] for t in tr)
    sy2 = sum(t[1] * t[2] for t in tr)

    def det3(a1, a2, a3, b1, b2, b3, c1, c2, c3):
        return (a1 * (b2 * c3 - b3 * c2)
                - a2 * (b1 * c3 - b3 * c1)
                + a3 * (b1 * c2 - b2 * c1))

    dd = det3(n, s1, s2, s1, s11, s12, s2, s12, s22)
    b0 = det3(sy, s1, s2, sy1, s11, s12, sy2, s12, s22) / dd
    b1 = det3(n, sy, s2, s1, sy1, s12, s2, sy2, s22) / dd
    b2 = det3(n, s1, sy, s1, s11, sy1, s2, s12, sy2) / dd
    r0 = rows[0]
    assert abs(r0.beta0 - b0) < 1e-2
    assert abs(r0.beta1 - b1) < 1e-2
    assert abs(r0.beta2 - b2) < 1e-2
    norms = [r.beta1 ** 2 + r.beta2 ** 2 for r in rows]
    assert all(a >= b - 1e-9 for a, b in zip(norms, norms[1:]))


def test_target_encoding_loo_matches_python_and_telescopes(spark):
    """Every sampled row's LOO and smoothed encodings match a sequential
    Python recomputation from the FULL orders table, and the telescoping
    identity holds: the mean of ALL LOO encodings within a category is
    the category's raw mean."""
    rows = registry.queries()["target_encoding_loo"](spark, SF).collect()
    assert rows
    data = _orders(spark)
    g = defaultdict(lambda: [0.0, 0])
    for _, pri, y in data:
        g[pri][0] += y
        g[pri][1] += 1
    mu = sum(s for s, _ in g.values()) / sum(n for _, n in g.values())
    m = 10.0
    by_key = {k: (pri, y) for k, pri, y in data}
    for r in rows:
        assert KNUTH(r.orderkey) % 997 < 5  # the sample predicate
        pri, y = by_key[r.orderkey]
        assert pri == r.pri and abs(r.y - y) < 1e-6
        s, n = g[pri]
        assert abs(r.loo_enc - (s - y) / (n - 1)) < 1e-4
        assert abs(r.loo_enc_smoothed - (s - y + m * mu) / (n - 1 + m)) < 1e-4
    # telescoping: mean over a category of (S - y_i)/(n-1) == S/n exactly
    pri0 = rows[0].pri
    s, n = g[pri0]
    loos = [(s - y) / (n - 1) for k, p, y in data if p == pri0]
    assert abs(sum(loos) / len(loos) - s / n) < 1e-9


def test_feature_hashing_covers_all_rows_and_matches_python(spark):
    """Bucket hits sum to 2x|customer| (two features per row), buckets
    stay inside [0, K), and one bucket's (count, signed sum) is
    reproduced by hashing every feature pair in Python."""
    import hashlib

    rows = {
        r.bucket: r
        for r in registry.queries()["feature_hashing_trick"](spark, SF).collect()
    }
    cust = (
        read_table(spark, SF, "customer")
        .select("c_mktsegment", "c_nationkey")
        .collect()
    )
    assert sum(r.n_hits for r in rows.values()) == 2 * len(cust)
    assert all(0 <= b < 16 for b in rows)

    def md5i(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:6], 16)

    py = defaultdict(lambda: [0, 0])
    for r in cust:
        for feat, val in (
            ("mktsegment", r.c_mktsegment),
            ("nation", str(r.c_nationkey)),
        ):
            b = md5i(f"{feat}={val}") % 16
            sgn = 1 if md5i(f"sgn={feat}={val}") % 2 == 0 else -1
            py[b][0] += 1
            py[b][1] += sgn
    assert set(py) == set(rows)
    for b, (n, ss) in py.items():
        assert rows[b].n_hits == n and rows[b].signed_sum == ss


def test_doremi_weights_match_python_and_normalize(spark):
    """Mixture weights reproduce a sequential Python run of the
    unigram-LM excess-loss EG update, sum to 1, and rank with excess."""
    import math

    rows = {
        r.lang: r
        for r in registry.queries()["doremi_mixture_weights"](
            spark, SF
        ).collect()
    }
    docs = read_table(spark, SF, "documents").select("lang", "text").collect()
    from collections import Counter

    cnt = Counter()
    per_lang = defaultdict(list)
    for r in docs:
        toks = r.text.split(" ")
        cnt.update(toks)
        per_lang[r.lang].extend(toks)
    n = float(sum(cnt.values()))
    loss = {
        lang: sum(-math.log(cnt[t] / n) for t in toks) / len(toks)
        for lang, toks in per_lang.items()
    }
    ntok = {lang: len(t) for lang, t in per_lang.items()}
    ref = sum(ntok[g] * loss[g] for g in loss) / sum(ntok.values())
    raw = {g: math.exp(0.5 * 3 * max(loss[g] - ref, 0.0)) for g in loss}
    z = sum(raw.values())
    assert set(rows) == set(loss)
    for g, r in rows.items():
        assert r.n_tokens == ntok[g]
        assert abs(r.avg_token_nll - loss[g]) < 1e-4
        assert abs(r.mixture_weight - raw[g] / z) < 1e-4
    assert abs(sum(r.mixture_weight for r in rows.values()) - 1.0) < 1e-4
    # above-average domains outweigh the uniform floor; floor domains tie
    floor = min(r.mixture_weight for r in rows.values())
    for g, r in rows.items():
        if r.excess_loss == 0.0:
            assert abs(r.mixture_weight - floor) < 1e-6


def test_groupkfold_no_customer_straddles_folds_and_matches_python(spark):
    """Every customer's orders land wholly in one fold (the leakage-safe
    property row-level CV lacks), totals partition orders, and fold-0
    RMSE matches a sequential Python leave-one-fold-out run keyed on
    customer hash."""
    rows = {
        r.fold: r
        for r in registry.queries()["cv_groupkfold_rmse"](spark, SF).collect()
    }
    data = [
        (r.o_custkey, r.o_orderpriority, r.o_totalprice)
        for r in read_table(spark, SF, "orders")
        .select("o_custkey", "o_orderpriority", "o_totalprice")
        .collect()
    ]
    assert sum(r.n_eval for r in rows.values()) == len(data)
    sums = defaultdict(lambda: [0.0, 0])
    tot = defaultdict(lambda: [0.0, 0])
    for ck, pri, y in data:
        f = KNUTH(ck) % 5
        sums[(f, pri)][0] += y
        sums[(f, pri)][1] += 1
        tot[pri][0] += y
        tot[pri][1] += 1
    se = ae = n = 0.0
    for ck, pri, y in data:
        if KNUTH(ck) % 5 != 0:
            continue
        s, c = sums[(0, pri)]
        pred = (tot[pri][0] - s) / (tot[pri][1] - c)
        se += (y - pred) ** 2
        ae += abs(y - pred)
        n += 1
    import math

    assert rows[0].n_eval == n
    assert abs(rows[0].rmse - math.sqrt(se / n)) < 1e-2
    assert abs(rows[0].mae - ae / n) < 1e-2
