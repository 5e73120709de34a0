"""Semantic contracts of the round-3c ML-evaluation tier
(plans/ml_eval.py + the KMV sketch in plans/patterns.py + LPA in
plans/graph_ops.py): the NB classifier beats chance and its confusion
matrix partitions the scored holdout, the stump's information gain is
reproduced by an independent Python recomputation, the Murphy identity
holds, KMV estimates land within the published sketch error, and LPA
matches a sequential Python label-propagation run."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from steam_prices_data_engineering_spark.plans import registry
from steam_prices_data_engineering_spark.sources.tables import read_table

SF = "/root/testdata/sf0.001"


def test_naive_bayes_beats_chance_and_partitions_holdout(spark):
    """Diagonal accuracy must beat the 1/|langs| chance floor, every
    lang in the matrix must exist in the corpus, and the matrix total
    equals the number of eval-split docs that share >=1 token with the
    train vocabulary (the closed-vocabulary protocol drops the rest in
    BOTH engines)."""
    rows = registry.queries()["naive_bayes_lang_eval"](spark, SF).collect()
    assert rows
    langs = {
        r.lang
        for r in read_table(spark, SF, "documents")
        .select("lang")
        .distinct()
        .collect()
    }
    tot = sum(r.n_docs for r in rows)
    diag = sum(r.n_docs for r in rows if r.true_lang == r.pred_lang)
    assert diag / tot > 1.0 / len(langs)
    for r in rows:
        assert r.true_lang in langs and r.pred_lang in langs
    # independent holdout count: eval docs with >=1 train-vocab token
    from steam_prices_data_engineering_spark.functions.text import tokens
    from steam_prices_data_engineering_spark.plans.ml_eval import (
        _split_bucket_spark,
    )

    d = read_table(spark, SF, "documents").withColumn(
        "bkt", _split_bucket_spark()
    )
    tr_vocab = (
        d.filter(F.col("bkt") < 8)
        .select(F.explode(tokens(F.col("text"))).alias("tok"))
        .distinct()
    )
    n_scored = (
        d.filter(F.col("bkt") >= 8)
        .select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
        .join(tr_vocab, "tok")
        .select("doc_id")
        .distinct()
        .count()
    )
    assert tot == n_scored


def test_decision_stump_gain_matches_python_recomputation(spark):
    """Recompute the information gain of the winning threshold from raw
    order rows in Python and compare; also check the split partitions
    the table and the threshold is one of the 9 integer-floored exact
    deciles."""
    row = registry.queries()["decision_stump_infogain"](spark, SF).collect()[0]
    orders = read_table(spark, SF, "orders").select(
        "o_totalprice", "o_orderpriority"
    ).collect()
    n = len(orders)
    assert row.n_left + row.n_right == n
    pos = sum(1 for r in orders if r.o_orderpriority == "1-URGENT")
    n_l = sum(1 for r in orders if r.o_totalprice <= row.split_threshold)
    pos_l = sum(
        1
        for r in orders
        if r.o_totalprice <= row.split_threshold
        and r.o_orderpriority == "1-URGENT"
    )
    assert n_l == row.n_left

    def ent(p: float) -> float:
        if p <= 0.0 or p >= 1.0:
            return 0.0
        return -p * math.log(p) - (1 - p) * math.log(1 - p)

    gain = ent(pos / n)
    if n_l:
        gain -= (n_l / n) * ent(pos_l / n_l)
    if n - n_l:
        gain -= ((n - n_l) / n) * ent((pos - pos_l) / (n - n_l))
    assert abs(gain - row.info_gain) < 1e-5
    # threshold is a floored exact decile of the empirical distribution
    vals = sorted(r.o_totalprice for r in orders)
    deciles = set()
    for k in range(1, 10):
        pr = k / 10.0
        idx = (n - 1) * pr
        lo, hi = int(math.floor(idx)), int(math.ceil(idx))
        v = vals[lo] + (idx - lo) * (vals[hi] - vals[lo])
        deciles.add(int(math.floor(v)))
    assert row.split_threshold in deciles


def test_brier_murphy_identity_and_bounds(spark):
    """brier = reliability - resolution + uncertainty (identity_ok
    pinned in-query), every component in its theoretical range."""
    row = registry.queries()["brier_score_decomposition"](spark, SF).collect()[
        0
    ]
    assert row.identity_ok
    assert 0.0 <= row.brier <= 1.0
    assert row.reliability >= 0.0
    assert row.resolution >= 0.0
    assert 0.0 <= row.uncertainty <= 0.25
    assert (
        abs(
            row.brier
            - (row.reliability - row.resolution + row.uncertainty)
        )
        < 2e-6  # components are dround(6)-quantized independently
    )
    assert row.n_docs == read_table(spark, SF, "documents").count()


def test_kmv_estimates_within_sketch_error(spark):
    """K=64 KMV has RSE ~ 1/sqrt(K-2) ~ 12.7%; allow 4 sigma. When a
    set is smaller than K the sketch is exhaustive and the estimate is
    EXACT by construction."""
    row = registry.queries()["kmv_theta_intersection"](spark, SF).collect()[0]
    from steam_prices_data_engineering_spark.plans.patterns import _KMV_K

    for exact, est in (
        (row.exact_urgent, row.est_urgent),
        (row.exact_returned, row.est_returned),
        (row.exact_overlap, row.est_overlap),
    ):
        assert exact > 0
        if exact < _KMV_K:
            assert abs(est - exact) < 1e-6
        else:
            assert abs(est - exact) / exact < 4.0 / math.sqrt(_KMV_K - 2)


def test_lpa_matches_sequential_python_rounds(spark):
    """Community assignment after 3 SYNCHRONOUS rounds with the
    (count DESC, label ASC) tie-break must equal an independent Python
    run over the same near-dup edges."""
    from steam_prices_data_engineering_spark.plans.graph_ops import (
        _LPA_ROUNDS,
        neardup_edges,
    )

    docs = read_table(spark, SF, "documents")
    edges = [(r.u, r.v) for r in neardup_edges(docs).collect()]
    nbrs = defaultdict(list)
    for u, v in edges:
        nbrs[u].append(v)
        nbrs[v].append(u)
    lab = {n: n for n in nbrs}
    for _ in range(_LPA_ROUNDS):
        nxt = {}
        for n, ns in nbrs.items():
            cnt = Counter(lab[m] for m in ns)
            nxt[n] = min(
                cnt.items(), key=lambda kv: (-kv[1], kv[0])
            )[0]
        lab = nxt
    expected = Counter(lab.values())
    rows = registry.queries()["label_propagation_communities"](
        spark, SF
    ).collect()
    got = {r.community: r.n_members for r in rows}
    assert got == dict(expected)
    for r in rows:
        members = [n for n, l_ in lab.items() if l_ == r.community]
        assert r.min_doc == min(members) and r.max_doc == max(members)
