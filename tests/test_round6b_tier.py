"""Semantic contracts of the round-6 part-B tier (plans/round6b.py):
Neyman allocation integerization, the anisotropy sum-vector identity
checked against a brute-force O(n^2 d) pairwise mean, the confident-
learning joint, RM3 relevance-model mixing over the engine's own BM25
feedback set, and a full pure-Python Kneser-Ney recomputation plus the
sum-to-one probability property that the DuckDB oracle alone could not
catch (both engines could share a mis-derived formula)."""

from __future__ import annotations

import hashlib
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


def _md5i(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:6], 16)


def test_neyman_allocation_matches_python(spark):
    got = {
        r.source: r
        for r in registry.queries()["neyman_allocation"](
            spark, SF
        ).collect()
    }
    per = defaultdict(lambda: [0, 0.0, 0.0])  # n, sum, sumsq
    for r in _docs(spark):
        n = float(len(r.text.split(" ")))
        p = per[r.source]
        p[0] += 1
        p[1] += n
        p[2] += n * n
    sd = {
        src: (
            math.sqrt(max(q - s * s / n, 0.0) / (n - 1)) if n > 1 else 0.0
        )
        for src, (n, s, q) in per.items()
    }
    z_ney = sum(per[s][0] * sd[s] for s in per)
    z_prop = sum(per[s][0] for s in per)
    ideal_n = {s: 100 * per[s][0] * sd[s] / z_ney for s in per}
    ideal_p = {s: 100 * per[s][0] / z_prop for s in per}

    def lrem(ideal):
        fl = {s: int(math.floor(v)) for s, v in ideal.items()}
        k = 100 - sum(fl.values())
        order = sorted(
            ideal,
            key=lambda s: (-round(ideal[s] - math.floor(ideal[s]), 6), s),
        )
        for s in order[:k]:
            fl[s] += 1
        return fl

    an, ap = lrem(ideal_n), lrem(ideal_p)
    assert set(got) == set(per)
    assert sum(r.alloc_neyman for r in got.values()) == 100
    assert sum(r.alloc_proportional for r in got.values()) == 100
    for src, g in got.items():
        assert g.n_docs == per[src][0]
        assert abs(g.sd_tokens - sd[src]) < 1e-3
        assert abs(g.ideal_neyman - ideal_n[src]) < 1e-3
        assert g.alloc_neyman == an[src]
        assert abs(g.ideal_proportional - ideal_p[src]) < 1e-3
        assert g.alloc_proportional == ap[src]


def test_anisotropy_identity_matches_bruteforce(spark):
    """The (||sum u||^2 - n) / (n(n-1)) identity vs an explicit O(n^2)
    pairwise cosine mean over every distinct pair."""
    import numpy as np

    row = registry.queries()["embedding_anisotropy"](spark, SF).collect()[
        0
    ]
    X = np.array(
        [
            r.embedding
            for r in read_table(spark, SF, "embeddings")
            .select("embedding")
            .collect()
        ],
        dtype=np.float64,
    )
    n = X.shape[0]
    assert row.n_vecs == n

    def mean_pairwise(M):
        U = M / np.linalg.norm(M, axis=1, keepdims=True)
        G = U @ U.T
        return (G.sum() - np.trace(G)) / (n * (n - 1))

    assert abs(row.mean_cos_raw - mean_pairwise(X)) < 1e-5
    cen = mean_pairwise(X - X.mean(axis=0))
    assert abs(row.mean_cos_centered - cen) < 1e-5
    assert (
        abs(row.anisotropy_gap - (row.mean_cos_raw - row.mean_cos_centered))
        < 2e-6
    )


def _quality(text: str) -> float:
    sp = text.split(" ")
    n = len(sp)
    diversity = len(set(sp)) / n
    stop = sum(1 for x in sp if x in ("the", "a")) / n
    return 0.5 * diversity + 0.3 * (1 - stop) + 0.2 * min(n / 100.0, 1.0)


def test_confident_learning_matches_python(spark):
    got = {
        (r.given_label, r.confident_label): r
        for r in registry.queries()["confident_learning_noise"](
            spark, SF
        ).collect()
    }
    scored = [
        (
            "hi"
            if len(set(r.text.split(" "))) / len(r.text.split(" ")) >= 0.5
            else "lo",
            round(_quality(r.text), 6),
        )
        for r in _docs(spark)
    ]
    hi = [p for s, p in scored if s == "hi"]
    lo = [1.0 - p for s, p in scored if s == "lo"]
    t_hi, t_lo = sum(hi) / len(hi), sum(lo) / len(lo)
    joint = Counter()
    for s, p in scored:
        if p >= t_hi and (1.0 - p < t_lo or p >= 1.0 - p):
            joint[(s, "hi")] += 1
        elif 1.0 - p >= t_lo:
            joint[(s, "lo")] += 1
    z = sum(joint.values())
    assert set(got) == set(joint)
    assert abs(sum(r.q_joint for r in got.values()) - 1.0) < 1e-4
    for cell, n in joint.items():
        g = got[cell]
        assert g.n == n
        assert abs(g.q_joint - n / z) < 1e-5
        assert g.is_error_cell == (cell[0] != cell[1])


def test_rm3_mixes_engine_feedback_set(spark):
    """Recompute p(w|R) in Python from the engine's OWN BM25 top-5
    (bm25_search_topk carries its own contract tests) and check the
    interpolated weights and per-query ranking."""
    from steam_prices_data_engineering_spark.plans.retrieval import (
        _PANEL_ROWS,
    )

    got = registry.queries()["rm3_query_expansion"](spark, SF).collect()
    fb = [
        r
        for r in registry.queries()["bm25_search_topk"](
            spark, SF
        ).collect()
        if r.rank <= 5
    ]
    mass = defaultdict(float)
    for r in fb:
        mass[r.q_id] += r.score
    toks = {
        r.doc_id: r.text.split(" ")
        for r in _docs(spark)
        if r.doc_id in {f.doc_id for f in fb}
    }
    rel = defaultdict(float)
    for r in fb:
        t = toks[r.doc_id]
        pd = r.score / mass[r.q_id]
        for term, tf in Counter(t).items():
            rel[(r.q_id, term)] += pd * tf / len(t)
    panel = defaultdict(list)
    for q_id, term in _PANEL_ROWS:
        panel[q_id].append(term)
    w = {}
    for (q, term), p_rel in rel.items():
        w[(q, term)] = 0.5 * p_rel
    for q, terms in panel.items():
        for term in terms:
            w[(q, term)] = w.get((q, term), 0.0) + 0.5 / len(terms)
    expect = {}
    for q in panel:
        cand = sorted(
            (
                (round(wt, 6), term)
                for (qq, term), wt in w.items()
                if qq == q
            ),
            key=lambda x: (-x[0], x[1]),
        )[:8]
        for i, (wt, term) in enumerate(cand, 1):
            expect[(q, term)] = (wt, i)
    assert len(got) == len(expect)
    for r in got:
        wt, rnk = expect[(r.q_id, r.term)]
        assert abs(r.rm3_weight - wt) < 1e-6
        assert r.rnk == rnk
        assert r.in_query == (r.term in panel[r.q_id])


def _kn_model(docs):
    """Train-side KN tables from the doc rows (split rule mirrors
    md5_hex6('gh_'+source) % 10 == 0 -> val)."""
    tb = Counter()
    vocab = set()
    ev = Counter()
    for r in docs:
        t = r.text.split(" ")
        val = _md5i(f"gh_{r.source}") % 10 == 0
        if val:
            for i in range(len(t) - 1):
                ev[(r.source, t[i], t[i + 1])] += 1
        else:
            vocab.update(t)
            for i in range(len(t) - 1):
                tb[(t[i], t[i + 1])] += 1
    cv = Counter()
    n1v = Counter()
    n1w = Counter()
    for (v, w), c in tb.items():
        cv[v] += c
        n1v[v] += 1
        n1w[w] += 1
    return tb, cv, n1v, n1w, len(tb), len(vocab), ev


def _kn_p(tb, cv, n1v, n1w, n1dd, vsz, v, w, D=0.75):
    pc = (n1w.get(w, 0) + 1.0) / (n1dd + vsz + 1.0)
    if v not in cv:
        return pc
    return (
        max(tb.get((v, w), 0) - D, 0.0) + D * n1v[v] * pc
    ) / cv[v]


def test_kneser_ney_matches_python(spark):
    got = {
        r.source: r
        for r in registry.queries()["kneser_ney_bigram_ppl"](
            spark, SF
        ).collect()
    }
    tb, cv, n1v, n1w, n1dd, vsz, ev = _kn_model(_docs(spark))
    agg = defaultdict(lambda: [0, 0.0, 0])  # n, n*-ln p, oov n
    for (src, v, w), n in ev.items():
        p = _kn_p(tb, cv, n1v, n1w, n1dd, vsz, v, w)
        a = agg[src]
        a[0] += n
        a[1] += n * -math.log(p)
        if v not in cv:
            a[2] += n
    assert set(got) == set(agg)
    for src, (n, s, oov) in agg.items():
        g = got[src]
        assert g.n_bigrams == n
        assert abs(g.mean_surprisal - s / n) < 1e-5
        assert abs(g.perplexity - math.exp(s / n)) < 1e-3
        assert abs(g.oov_context_rate - oov / n) < 1e-5


def test_kneser_ney_distribution_sums_to_one(spark):
    """For every seen context v, sum_w p(w|v) over the train vocabulary
    plus the single reserved OOV-word share must be exactly 1 — the
    property that validates the discount/continuation derivation
    independently of the oracle (which shares the formula)."""
    tb, cv, n1v, n1w, n1dd, vsz, _ = _kn_model(_docs(spark))
    vocab = set(n1w)  # words seen as continuations
    all_words = vocab | {v for v, _ in tb}
    for v in list(cv)[:20]:
        total = sum(
            _kn_p(tb, cv, n1v, n1w, n1dd, vsz, v, w) for w in all_words
        )
        # words never seen anywhere share the same pc mass
        n_unseen_types = vsz - len(all_words)
        pc_unseen = 1.0 / (n1dd + vsz + 1.0)
        D = 0.75
        backoff = D * n1v[v] / cv[v]
        total += backoff * pc_unseen * (n_unseen_types + 1)
        assert abs(total - 1.0) < 1e-9
