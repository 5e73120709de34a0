"""Semantic contracts of the round-6 tier (plans/round6.py): keep-first
chunk dedup, reservoir ranks, shard assignment, centroid drift,
hard-negative ranking, rolling-origin MAE, bigram entropy, OBF group-
sequential z/boundary arithmetic, and covariate-shift weighting — each
reproduced by an independent pure-Python recomputation at sf0.001, plus
set-algebra invariants for the LSH recall evaluation and the novelty
curve."""

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


def _quality(text: str) -> float:
    sp = text.split(" ")
    n = len(sp)
    diversity = len(set(sp)) / n
    stop = sum(1 for x in sp if x in ("the", "a")) / n
    return 0.5 * diversity + 0.3 * (1 - stop) + 0.2 * min(n / 100.0, 1.0)


def test_substring_keepfirst_matches_python(spark):
    got = {
        r.source: r
        for r in registry.queries()["substring_dedup_keep_first"](
            spark, SF
        ).collect()
    }
    W, POSK = 10, 1_000_000
    first = {}
    chunks = []  # (source, doc_id, pos_key, cl, h)
    for r in sorted(_docs(spark), key=lambda r: r.doc_id):
        t = r.text.split(" ")
        for s in range(1, len(t) + 1, W):
            piece = " ".join(t[s - 1 : s - 1 + W])
            h = hashlib.md5(piece.encode()).hexdigest()
            pos = r.doc_id * POSK + s
            cl = min(s + W - 1, len(t)) - s + 1
            chunks.append((r.source, r.doc_id, pos, cl, h))
            if h not in first or pos < first[h]:
                first[h] = pos
    per = defaultdict(lambda: [set(), 0, 0, 0, 0])
    for src, did, pos, cl, h in chunks:
        p = per[src]
        p[0].add(did)
        p[1] += 1
        p[3] += cl
        if pos != first[h]:
            p[2] += 1
            p[4] += cl
    assert set(got) == set(per)
    for src, (docs, n_chunks, removed, toks, toks_rm) in per.items():
        g = got[src]
        assert g.n_docs == len(docs)
        assert g.n_chunks == n_chunks
        assert g.chunks_removed == removed
        assert g.tokens_total == toks
        assert g.tokens_removed == toks_rm
        assert abs(g.token_retention - (1.0 - toks_rm / toks)) < 1e-5


def test_reservoir_ranks_match_python(spark):
    got = {
        r.source: r
        for r in registry.queries()["eval_reservoir_sample"](
            spark, SF
        ).collect()
    }
    K = 5
    by_src = defaultdict(list)
    for r in _docs(spark):
        key = hashlib.md5(f"rsv1|{r.doc_id}".encode()).hexdigest()
        by_src[r.source].append((key, r.doc_id, len(r.text.split(" "))))
    for src, rows in by_src.items():
        rows.sort()
        g = got[src]
        assert g.n_docs == len(rows)
        assert g.n_sampled == min(K, len(rows))
        sampled = rows[:K]
        assert (
            abs(g.avg_tokens_sampled - sum(x[2] for x in sampled) / len(sampled))
            < 1e-3
        )
        assert (
            abs(g.avg_tokens_all - sum(x[2] for x in rows) / len(rows)) < 1e-3
        )


def test_calibration_drift_internal_consistency(spark):
    rows = registry.queries()["quality_calibration_drift"](
        spark, SF
    ).collect()
    assert rows
    pooled = {r.pooled_ece for r in rows}
    assert len(pooled) == 1  # the pooled ECE is one global number
    for r in rows:
        assert 0.0 <= r.ece <= 1.0
        assert abs(r.drift - abs(r.ece - r.pooled_ece)) < 1e-5


def test_lsh_recall_set_algebra(spark):
    row = registry.queries()["lsh_recall_empirical"](spark, SF).collect()[0]
    assert row.n_truth_hit <= row.n_truth
    assert row.n_verified <= row.n_candidates
    if row.n_truth:
        assert abs(row.recall - row.n_truth_hit / row.n_truth) < 1e-5
        assert 0.0 <= row.recall <= 1.0
    if row.n_candidates:
        assert abs(row.precision - row.n_verified / row.n_candidates) < 1e-5
        assert 0.0 <= row.precision <= 1.0


def test_shard_assignment_matches_python(spark):
    row = registry.queries()["shard_skew_audit"](spark, SF).collect()[0]
    per = Counter()
    toks = Counter()
    for r in _docs(spark):
        h = int(
            hashlib.md5(f"shard1|{r.doc_id}".encode()).hexdigest()[:6], 16
        )
        per[h % 16] += 1
        toks[h % 16] += len(r.text.split(" "))
    assert row.shards_used == len(per)
    assert row.min_docs == min(per.values())
    assert row.max_docs == max(per.values())
    avg = sum(per.values()) / len(per)
    assert abs(row.doc_skew - max(per.values()) / avg) < 1e-5
    avg_t = sum(toks.values()) / len(toks)
    assert abs(row.token_skew - max(toks.values()) / avg_t) < 1e-5


def test_novelty_curve_conserves_first_occurrences(spark):
    rows = registry.queries()["ngram_novelty_curve"](spark, SF).collect()
    # every distinct corpus shingle HASH is novel exactly once, so the
    # novel occurrences across deciles must sum to the distinct hash
    # count (the curve runs at the hash grain — at sf0.001 two string
    # shingles collide, so the raw-string count reads 2 high)
    from steam_prices_data_engineering_spark.operators.dedup import (
        hashed_shingle_table,
    )
    from pyspark.sql import functions as F

    docs = _docs(spark)
    d = read_table(spark, SF, "documents")
    n_hashes = (
        hashed_shingle_table(d)
        .select(F.explode("hs").alias("h"))
        .distinct()
        .count()
    )
    assert sum(r.n_novel for r in rows) == n_hashes
    assert sum(r.n_docs for r in rows) == len(
        [r for r in docs if len(r.text.split(" ")) >= 3]
    )
    for r in rows:
        assert 0.0 < r.novelty_rate <= 1.0
    # the earliest decile is the most novel (first docs define the pool)
    first = min(rows, key=lambda r: r.decile)
    assert first.novelty_rate == max(r.novelty_rate for r in rows)


def _embeddings(spark):
    return (
        read_table(spark, SF, "embeddings")
        .select("vec_id", "label", "embedding")
        .collect()
    )


def test_centroid_drift_matches_python(spark):
    got = {
        r.label: r
        for r in registry.queries()["embedding_label_centroid_drift"](
            spark, SF
        ).collect()
    }
    vecs = _embeddings(spark)
    dim = len(vecs[0].embedding)
    by_label = defaultdict(list)
    for r in vecs:
        by_label[r.label].append([float(x) for x in r.embedding])
    gsum = [0.0] * dim
    for r in vecs:
        for i, x in enumerate(r.embedding):
            gsum[i] += float(x)
    g = [x / len(vecs) for x in gsum]

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    assert set(got) == set(by_label)
    for label, members in by_label.items():
        c = [sum(col) / len(members) for col in zip(*members)]
        want_drift = cos(c, g)
        want_coh = sum(cos(m, c) for m in members) / len(members)
        assert got[label].n_vecs == len(members)
        assert abs(got[label].cos_to_global - want_drift) < 1e-5
        assert abs(got[label].mean_member_cos - want_coh) < 1e-5


def test_hard_negatives_match_python(spark):
    rows = registry.queries()["hard_negative_mining"](spark, SF).collect()
    vecs = {r.vec_id: r for r in _embeddings(spark)}

    def cos(a, b):
        num = sum(float(x) * float(y) for x, y in zip(a, b))
        return num / (
            math.sqrt(sum(float(x) ** 2 for x in a))
            * math.sqrt(sum(float(y) ** 2 for y in b))
        )

    by_q = defaultdict(list)
    for r in rows:
        by_q[r.q_id].append(r)
    for q_id, got in by_q.items():
        q = vecs[q_id]
        scored = sorted(
            (
                (round(cos(v.embedding, q.embedding), 6), v.vec_id)
                for v in vecs.values()
                if v.label != q.label
            ),
            key=lambda t: (-t[0], t[1]),
        )[:3]
        got.sort(key=lambda r: r.rnk)
        assert [r.neg_id for r in got] == [vid for _, vid in scored]
        for r, (score, _) in zip(got, scored):
            assert abs(r.score - score) < 2e-6
            assert vecs[r.neg_id].label != q.label


def test_rolling_origin_matches_python(spark):
    got = {
        r.horizon: r
        for r in registry.queries()["rolling_origin_backtest"](
            spark, SF
        ).collect()
    }
    ev = (
        read_table(spark, SF, "events")
        .select("ts", "event_type", "value")
        .collect()
    )
    daily = defaultdict(float)
    for r in ev:
        if r.event_type == "purchase":
            daily[int(r.ts.timestamp()) // 86400] += r.value
    mx = max(daily)
    origins = [d for d in daily if mx - 14 <= d <= mx - 7]
    for h in (1, 3, 7):
        en, es = [], []
        for o in origins:
            if o + h in daily and o + h - 7 in daily:
                en.append(abs(daily[o] - daily[o + h]))
                es.append(abs(daily[o + h - 7] - daily[o + h]))
        if not en:
            assert h not in got
            continue
        g = got[h]
        assert g.n_evals == len(en)
        assert abs(g.mae_naive - sum(en) / len(en)) < 1e-2
        assert abs(g.mae_snaive - sum(es) / len(es)) < 1e-2
        want_skill = 1.0 - (sum(es) / len(es)) / (sum(en) / len(en))
        assert abs(g.skill_vs_naive - want_skill) < 1e-4


def test_bigram_entropy_matches_python(spark):
    got = {
        r.source: r
        for r in registry.queries()["bigram_entropy_rate"](
            spark, SF
        ).collect()
    }
    big = defaultdict(Counter)
    uni = defaultdict(Counter)
    for r in _docs(spark):
        t = r.text.split(" ")
        uni[r.source].update(t)
        for i in range(len(t) - 1):
            big[r.source][(t[i], t[i + 1])] += 1
    for src, bc in big.items():
        prev = Counter()
        for (p, _), c in bc.items():
            prev[p] += c
        n = sum(bc.values())
        hb = -sum(c * math.log(c / prev[p]) for (p, _), c in bc.items()) / n
        nu = sum(uni[src].values())
        hu = -sum(
            (c / nu) * math.log(c / nu) for c in uni[src].values()
        )
        g = got[src]
        assert g.n_bigrams == n
        assert abs(g.h_bigram - hb) < 1e-4
        assert abs(g.h_unigram - hu) < 1e-4
        if hu:
            assert abs(g.entropy_ratio - hb / hu) < 1e-4


def test_group_sequential_matches_python(spark):
    got = {
        r.look: r
        for r in registry.queries()["group_sequential_obf"](
            spark, SF
        ).collect()
    }
    ev = (
        read_table(spark, SF, "events")
        .select("user_id", "ts", "event_type")
        .collect()
    )
    dv = defaultdict(lambda: [0, 0])  # (variant, day) -> [n, x]
    for r in ev:
        d = int(r.ts.timestamp()) // 86400
        k = (r.user_id % 2, d)
        dv[k][0] += 1
        dv[k][1] += int(r.event_type == "purchase")
    days = [d for _, d in dv]
    mn, mx = min(days), max(days)
    K = 5
    cum = {k: [0, 0, 0, 0] for k in range(1, K + 1)}  # na xa nb xb
    for (v, d), (n, x) in dv.items():
        lk = min(K - 1, int(math.floor((d - mn) * K / (mx - mn + 1)))) + 1
        for k in range(lk, K + 1):
            cum[k][0 if v == 0 else 2] += n
            cum[k][1 if v == 0 else 3] += x
    assert set(got) == set(cum)
    for k, (na, xa, nb, xb) in cum.items():
        g = got[k]
        assert (g.n_ctrl, g.x_ctrl, g.n_trt, g.x_trt) == (na, xa, nb, xb)
        bound = 2.04 * math.sqrt(K / k)
        assert abs(g.obf_bound - bound) < 1e-5
        if na and nb and 0 < xa + xb < na + nb:
            pp = (xa + xb) / (na + nb)
            z = (xb / nb - xa / na) / math.sqrt(
                pp * (1 - pp) * (1 / na + 1 / nb)
            )
            assert abs(g.z_stat - z) < 1e-5
            assert g.crossed == int(abs(z) >= bound)
        else:
            assert g.z_stat is None
            assert g.crossed == 0


def test_covariate_shift_matches_python(spark):
    rows = registry.queries()["covariate_shift_eval"](spark, SF).collect()
    docs = _docs(spark)
    esrc = min(r.source for r in docs)
    tgt = Counter()
    ev_n = Counter()
    ev_q = defaultdict(float)
    for r in docs:
        b = min(7, len(r.text.split(" ")) // 32)
        tgt[b] += 1
        if r.source == esrc:
            ev_n[b] += 1
            ev_q[b] += _quality(r.text)
    nt, ne = sum(tgt.values()), sum(ev_n.values())
    per_bin = {r.len_bin: r for r in rows if r.len_bin >= 0}
    assert set(per_bin) == set(tgt)
    w = {}
    for b, r in per_bin.items():
        assert r.n_target == tgt[b]
        assert r.n_eval == ev_n[b]
        if ev_n[b]:
            w[b] = (tgt[b] / nt) / (ev_n[b] / ne)
            assert abs(r.weight - w[b]) < 1e-5
            assert abs(r.mean_q_eval - ev_q[b] / ev_n[b]) < 1e-5
        else:
            assert r.weight is None
    overall = [r for r in rows if r.len_bin == -1]
    assert len(overall) == 1
    o = overall[0]
    assert o.n_target == nt and o.n_eval == ne
    naive = sum(ev_q.values()) / ne
    shifted = sum(w[b] * ev_q[b] for b in w) / sum(w[b] * ev_n[b] for b in w)
    ess = sum(w[b] * ev_n[b] for b in w) ** 2 / sum(
        w[b] ** 2 * ev_n[b] for b in w
    )
    assert abs(o.mean_q_eval - naive) < 1e-5
    assert abs(o.shifted_mean_q - shifted) < 1e-5
    assert abs(o.ess - ess) < 1e-3
