"""Semantic contracts of the round-6 part-E tier (plans/round6e.py):
winnowing fingerprint selection replayed in pure Python (window-min
with the rightmost tie rule), top-K churn membership/ranks, and
Burrows' Delta z-score arithmetic — each reproduced independently at
sf0.001, plus the winnowing guarantee that two documents sharing a
long-enough substring share a fingerprint."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from steam_prices_data_engineering_spark.plans import registry
from steam_prices_data_engineering_spark.sources.tables import read_table

SF = "/root/testdata/sf0.001"
P = 2_147_483_647
W = 4


def _docs(spark):
    return (
        read_table(spark, SF, "documents")
        .select("doc_id", "source", "text")
        .collect()
    )


def _tok_hash(t: str) -> int:
    return len(t) * 961 + ord(t[0]) * 31 + ord(t[-1])


def _shingle_hashes(text: str) -> list[int]:
    th = [_tok_hash(t) for t in text.split(" ")]
    if len(th) < 3:
        return []
    return [
        ((th[i] * 8191 + th[i + 1]) % P * 8191 + th[i + 2]) % P
        for i in range(len(th) - 2)
    ]


def _winnow(hashes: list[int]) -> set[int]:
    fps = set()
    for s in range(len(hashes) - W + 1):
        win = hashes[s : s + W]
        mn = min(win)
        # rightmost occurrence of the minimum
        fps.add(mn)
    return fps


def test_winnowing_matches_python(spark):
    got = {
        r.source: r
        for r in registry.queries()["winnowing_fingerprint_density"](
            spark, SF
        ).collect()
    }
    per = defaultdict(lambda: [0, 0, 0])  # docs, kgrams, fps
    for r in _docs(spark):
        hs = _shingle_hashes(r.text)
        p = per[r.source]
        p[0] += 1
        p[1] += len(hs)
        p[2] += len(_winnow(hs))
    assert set(got) == set(per)
    for src, (nd, nk, nf) in per.items():
        g = got[src]
        assert g.n_docs == nd
        assert g.n_kgrams == nk
        assert g.n_fingerprints == nf
        assert abs(g.density - nf / nk) < 1e-5
        assert abs(g.expected_density - 0.4) < 1e-9
        # winnowing never selects more than one hash per window start
        assert g.n_fingerprints <= max(nk - W + 1, 0) or nk < W


def test_winnowing_guarantee_shared_substring(spark):
    """Two documents sharing >= w + k - 1 = 6 consecutive tokens share
    at least one fingerprint (the paper's detection guarantee)."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    d1 = "xx yy " + base
    d2 = base + " zz ww qq rr"
    f1 = _winnow(_shingle_hashes(d1))
    f2 = _winnow(_shingle_hashes(d2))
    assert f1 & f2


def test_topk_churn_matches_python(spark):
    got = {
        r.token: r
        for r in registry.queries()["topk_token_churn"](
            spark, SF
        ).collect()
    }
    docs = _docs(spark)
    mid = math.floor((min(r.doc_id for r in docs) + max(r.doc_id for r in docs)) / 2.0)
    old, new = Counter(), Counter()
    for r in docs:
        (old if r.doc_id <= mid else new).update(r.text.split(" "))

    def topk(cnt):
        ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
        return {t: (i + 1, c) for i, (t, c) in enumerate(ranked)}

    ot, nt = topk(old), topk(new)
    assert set(got) == set(ot) | set(nt)
    for tok, g in got.items():
        o = ot.get(tok)
        n = nt.get(tok)
        assert g.rank_old == (o[0] if o else None)
        assert g.rank_new == (n[0] if n else None)
        assert g.n_old == (o[1] if o else None)
        assert g.n_new == (n[1] if n else None)
        status = "both" if o and n else ("dropped" if o else "entered")
        assert g.status == status
        if o and n:
            assert g.rank_shift == abs(o[0] - n[0])


def test_burrows_delta_matches_python(spark):
    got = {
        (r.source_a, r.source_b): r
        for r in registry.queries()["burrows_delta_stylometry"](
            spark, SF
        ).collect()
    }
    per = defaultdict(Counter)
    for r in _docs(spark):
        per[r.source].update(r.text.split(" "))
    total = Counter()
    for c in per.values():
        total.update(c)
    fw = [
        t
        for t, _ in sorted(total.items(), key=lambda kv: (-kv[1], kv[0]))[
            :20
        ]
    ]
    rate = {
        (s, t): 1000.0 * per[s][t] / sum(per[s].values())
        for s in per
        for t in fw
    }
    z = {}
    for t in fw:
        vals = [rate[(s, t)] for s in per]
        m = sum(vals) / len(vals)
        sd = math.sqrt(
            max(sum(v * v for v in vals) / len(vals) - m * m, 0.0)
        )
        for s in per:
            z[(s, t)] = (rate[(s, t)] - m) / sd if sd > 0 else 0.0
    srcs = sorted(per)
    expect = {}
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            expect[(a, b)] = sum(
                abs(z[(a, t)] - z[(b, t)]) for t in fw
            ) / len(fw)
    assert set(got) == set(expect)
    for k, r in got.items():
        assert r.n_function_words == 20
        assert abs(r.delta - expect[k]) < 1e-5
