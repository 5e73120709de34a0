"""Semantic contracts of the round-6 part-C tier (plans/round6c.py):
PSI bins/terms, IPF margin convergence, the Muennighoff decay formula,
HITS normalization + independent recomputation, the Hill estimator over
explicitly sorted order stats, and the shard-order agreement audit —
each reproduced by an independent pure-Python recomputation at sf0.001
(the oracle gate can't catch a formula mis-derived the same way in both
engines)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

from steam_prices_data_engineering_spark.plans import registry
from steam_prices_data_engineering_spark.sources.tables import read_table

SF = "/root/testdata/sf0.001"


def _md5i(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:6], 16)


def _pctl(sorted_vals, p):
    """Spark `percentile` / DuckDB `quantile_cont` (n-1)*p interpolation."""
    idx = (len(sorted_vals) - 1) * p
    lo = int(math.floor(idx))
    hi = int(math.ceil(idx))
    return sorted_vals[lo] + (idx - lo) * (sorted_vals[hi] - sorted_vals[lo])


def _dround(x, d=6):
    return math.floor(x * 10**d + 0.5) / 10**d


def test_psi_bins_and_terms_match_python(spark):
    got = {
        r.bin: r
        for r in registry.queries()["psi_value_drift"](spark, SF).collect()
    }
    ev = [
        (int(math.floor(r.ts.timestamp())), r.value)
        for r in read_table(spark, SF, "events")
        .select("ts", "value")
        .collect()
    ]
    secs = [s for s, _ in ev]
    mid = int(math.floor((min(secs) + max(secs)) / 2.0))
    ref = sorted(v for s, v in ev if s <= mid)
    cur = [v for s, v in ev if s > mid]
    edges = [_dround(_pctl(ref, i / 10.0)) for i in range(1, 10)]

    def binof(v):
        return 1 + sum(1 for e in edges if v > e)

    cr = Counter(binof(v) for v in ref)
    cc = Counter(binof(v) for v in cur)
    bins = set(cr) | set(cc)
    assert set(got) == bins
    psi_total = 0.0
    for b in bins:
        g = got[b]
        pr, pc = cr.get(b, 0) / len(ref), cc.get(b, 0) / len(cur)
        assert g.n_ref == cr.get(b, 0)
        assert g.n_cur == cc.get(b, 0)
        assert abs(g.p_ref - pr) < 1e-5
        assert abs(g.p_cur - pc) < 1e-5
        term = (pc - pr) * math.log(max(pc, 1e-6) / max(pr, 1e-6))
        assert abs(g.psi_term - term) < 1e-5
        psi_total += term
    assert psi_total >= 0.0  # PSI is a sum of non-negative terms


def test_ipf_weights_converge_margins(spark):
    rows = registry.queries()["raking_ipf_weights"](spark, SF).collect()
    cells = {(r.lang, r.source): r for r in rows}
    n = {k: r.n_docs for k, r in cells.items()}
    total = sum(n.values())
    langs = {k[0] for k in n}
    sources = {k[1] for k in n}
    # independent IPF
    w = {k: 1.0 for k in n}
    tl, ts = total / len(langs), total / len(sources)
    for _ in range(3):
        for lg in langs:
            z = sum(w[k] * n[k] for k in n if k[0] == lg)
            for k in n:
                if k[0] == lg:
                    w[k] *= tl / z
        for s in sources:
            z = sum(w[k] * n[k] for k in n if k[1] == s)
            for k in n:
                if k[1] == s:
                    w[k] *= ts / z
    for k, r in cells.items():
        assert abs(r.raking_weight - w[k]) < 1e-5
        assert abs(r.raw_share - n[k] / total) < 1e-5
        assert abs(r.weighted_share - w[k] * n[k] / total) < 1e-5
    # after the final source-adjust the SOURCE margins are exact
    for s in sources:
        share = sum(r.weighted_share for k, r in cells.items() if k[1] == s)
        assert abs(share - 1.0 / len(sources)) < 1e-4
    # and the lang margins are close (IPF converges geometrically)
    for lg in langs:
        share = sum(r.weighted_share for k, r in cells.items() if k[0] == lg)
        assert abs(share - 1.0 / len(langs)) < 0.02


def test_data_constrained_scaling_matches_formula(spark):
    rows = registry.queries()["data_constrained_scaling"](
        spark, SF
    ).collect()
    docs = read_table(spark, SF, "documents").collect()
    uniq = {}
    for r in docs:
        uniq[(r.source, hashlib.md5(r.text.encode()).hexdigest())] = len(
            r.text.split(" ")
        )
    u = defaultdict(int)
    for (src, _h), t in uniq.items():
        u[src] += t
    R = 15.39
    assert {(r.source, r.epochs) for r in rows} == {
        (s, m) for s in u for m in (1, 2, 4, 8, 16)
    }
    for r in rows:
        uu = u[r.source]
        assert r.unique_tokens == uu
        assert r.budget_tokens == uu * r.epochs
        eff = uu * (1.0 + R * (1.0 - math.exp(-(r.epochs - 1.0) / R)))
        assert abs(r.effective_tokens - eff) < 0.5
        assert abs(r.effective_fraction - eff / (uu * r.epochs)) < 1e-5
        if r.epochs == 1:
            assert abs(r.effective_fraction - 1.0) < 1e-9
    # value per budget token strictly decreases with epochs
    by_src = defaultdict(dict)
    for r in rows:
        by_src[r.source][r.epochs] = r.effective_fraction
    for fr in by_src.values():
        assert fr[1] > fr[2] > fr[4] > fr[8] > fr[16]


def test_hits_matches_python_power_iteration(spark):
    got = {
        r.node: r
        for r in registry.queries()["hits_event_graph"](spark, SF).collect()
    }
    ev = sorted(
        read_table(spark, SF, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    edges = Counter()
    for a, b in zip(ev, ev[1:]):
        if a.user_id == b.user_id:
            edges[(a.event_type, b.event_type)] += 1
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    h = {v: 1.0 for v in nodes}
    for _ in range(4):
        a = {v: 0.0 for v in nodes}
        for (s, t), n in edges.items():
            a[t] += n * h[s]
        za = sum(a.values())
        a = {v: x / za for v, x in a.items()}
        h = {v: 0.0 for v in nodes}
        for (s, t), n in edges.items():
            h[s] += n * a[t]
        zh = sum(h.values())
        h = {v: x / zh for v, x in h.items()}
    assert set(got) == set(nodes)
    assert abs(sum(r.authority for r in got.values()) - 1.0) < 1e-4
    assert abs(sum(r.hub for r in got.values()) - 1.0) < 1e-4
    for v in nodes:
        assert abs(got[v].authority - a[v]) < 1e-5
        assert abs(got[v].hub - h[v]) < 1e-5


def test_hill_matches_sorted_order_stats(spark):
    row = registry.queries()["hill_tail_index"](spark, SF).collect()[0]
    xs = sorted(
        (
            (r.o_totalprice, r.o_orderkey)
            for r in read_table(spark, SF, "orders")
            .select("o_totalprice", "o_orderkey")
            .collect()
        ),
        key=lambda t: (-t[0], t[1]),
    )
    top = [x for x, _ in xs[:100]]
    xk = xs[100][0]
    hm = sum(math.log(x / xk) for x in top) / 100
    assert row.k == 100
    assert abs(row.x_kplus1 - xk) < 1e-3
    assert abs(row.hill_mean_log - hm) < 1e-5
    assert abs(row.tail_alpha - 1.0 / hm) < 1e-4


def test_shard_order_autocorr_matches_python(spark):
    got = {
        r.shard: r
        for r in registry.queries()["shard_order_autocorr"](
            spark, SF
        ).collect()
    }
    per = defaultdict(list)  # shard -> [(h, doc_id, source)]
    for r in (
        read_table(spark, SF, "documents")
        .select("doc_id", "source")
        .collect()
    ):
        h = _md5i(f"shard1|{r.doc_id}")
        per[h % 16].append((h, r.doc_id, r.source))
    for shard, rows in per.items():
        if len(rows) <= 1:
            assert shard not in got
            continue
        rows.sort()
        same = sum(
            1 for a, b in zip(rows, rows[1:]) if a[2] == b[2]
        )
        cnt = Counter(s for _, _, s in rows)
        n = len(rows)
        exp = sum(c * (c - 1) for c in cnt.values()) / (n * (n - 1))
        g = got[shard]
        assert g.n_docs == n
        assert g.n_same == same
        assert abs(g.agree_rate - same / (n - 1)) < 1e-5
        assert abs(g.expected_rate - exp) < 1e-5
        if exp > 0:
            assert abs(g.order_bias_ratio - (same / (n - 1)) / exp) < 1e-4


def test_shard_order_tie_proof(spark, tmp_path):
    """Duplicate (h, doc_id) ties with DIFFERENT sources plus NULL
    doc_ids: the lag order must be the PINNED total order (h, doc_id
    NULLS FIRST, source NULLS FIRST) in BOTH engines, never scan order
    (the CORRECTNESS_r07 red-row class — engines disagree on NULL
    placement and break exact ties by partition/scan order). The
    doc_id=7 trio is written in source order (web, books, web): a
    scan-order lag yields 0 same-adjacent pairs inside the trio, the
    pinned order (books, web, web) yields 1 — scan-order tie-breaking
    fails this test. All filler docs use a third source so boundary
    pairs contribute 0 under either order."""
    import duckdb

    from steam_prices_data_engineering_spark.sources.tables import (
        TABLE_SCHEMAS,
    )

    rows = [
        (7, "t", "en", "web", 1),
        (7, "t", "en", "books", 1),
        (7, "t", "en", "web", 1),
        (None, "t", "en", "books", 1),
        (None, "t", "en", "web", 1),
    ]
    rows += [(i, "t", "en", "wiki", 1) for i in range(100, 140)]
    spark.createDataFrame(rows, TABLE_SCHEMAS["documents"]).coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = {
        r.shard: r
        for r in registry.queries()["shard_order_autocorr"](
            spark, str(tmp_path)
        ).collect()
    }

    # python oracle under the pinned order
    per = defaultdict(list)
    for doc_id, _, _, source, _ in rows:
        key = "shard1" if doc_id is None else f"shard1|{doc_id}"
        h = _md5i(key)
        per[h % 16].append(
            (h, doc_id is not None, doc_id or 0, source)
        )
    for shard, rs in per.items():
        if len(rs) <= 1:
            assert shard not in got
            continue
        rs.sort()
        same = sum(1 for a, b in zip(rs, rs[1:]) if a[3] == b[3])
        assert got[shard].n_same == same, f"shard {shard}"
        assert got[shard].n_docs == len(rs)

    # cross-engine parity on the same hostile fixture
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    duck = {
        r[0]: r
        for r in con.execute(
            registry.oracle_sql()["shard_order_autocorr"]
        ).fetchall()
    }
    assert set(duck) == set(got)
    for shard, r in got.items():
        assert duck[shard] == (
            r.shard,
            r.n_docs,
            r.n_same,
            r.agree_rate,
            r.expected_rate,
            r.order_bias_ratio,
        ), f"shard {shard}"


def test_shard_order_probes_hostile_parity(spark, tmp_path):
    """The r10 stage-pure bisection probes on the SAME hostile fixture
    the tie-proof test uses (duplicate doc_ids with differing sources,
    NULL doc_ids): every order-free checksum and the composition rollup
    must match DuckDB exactly, and the inputs probe must actually see
    the full-digest duplicates (n_m_dup > 0 on the shard holding the
    doc_id=7 trio) — proving the probe can detect input-stage
    divergence, not just trivially agree."""
    import duckdb

    from steam_prices_data_engineering_spark.sources.tables import (
        TABLE_SCHEMAS,
    )

    rows = [
        (7, "t", "en", "web", 1),
        (7, "t", "en", "books", 1),
        (7, "t", "en", "web", 1),
        (None, "t", "en", "books", 1),
        (None, "t", "en", "web", 1),
    ]
    rows += [(i, "t", "en", "wiki", 1) for i in range(100, 140)]
    spark.createDataFrame(rows, TABLE_SCHEMAS["documents"]).coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    for name in ("shard_order_probe_inputs", "shard_order_probe_pairs"):
        got = sorted(
            tuple(r)
            for r in registry.queries()[name](
                spark, str(tmp_path)
            ).collect()
        )
        duck = sorted(
            tuple(r) for r in con.execute(registry.oracle_sql()[name]).fetchall()
        )
        assert got == duck, name

    inputs = {
        r.shard: r
        for r in registry.queries()["shard_order_probe_inputs"](
            spark, str(tmp_path)
        ).collect()
    }
    trio_shard = _md5i("shard1|7") % 16
    assert inputs[trio_shard].n_m_dup >= 2  # the doc_id=7 trio
    null_shard = _md5i("shard1") % 16
    assert inputs[null_shard].n_null_doc >= 2  # NULL doc_ids counted
