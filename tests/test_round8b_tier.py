"""Round-8b tier semantics: V-optimal histogram (vs a brute-force
enumeration oracle), UniMax allocation (vs a waterfill mirror),
Krippendorff's alpha (vs the coincidence-matrix definition), the
partition-fingerprint diff statuses, and NB overdispersion."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from itertools import combinations

from steam_prices_data_engineering_spark.plans import registry
from steam_prices_data_engineering_spark.sources.tables import read_table

SF = "/root/testdata/sf0.001"


def test_voptimal_matches_bruteforce(spark):
    """The DP's optimal SSE per bucket budget must equal a brute-force
    enumeration over ALL boundary placements on the same cell grain —
    an independent oracle, not a second DP."""
    got = {
        r.n_buckets: r.total_sse
        for r in registry.queries()["voptimal_histogram"](
            spark, SF
        ).collect()
    }
    vs = [
        int(math.floor(r.o_totalprice * 100.0 + 0.5)) // 1000
        for r in read_table(spark, SF, "orders")
        .select("o_totalprice")
        .collect()
    ]
    lo, hi = min(vs), max(vs)
    N = 24
    cells = Counter(min((v - lo) * N // (hi - lo + 1), N - 1) for v in vs)
    s = defaultdict(int)
    ss = defaultdict(int)
    for v in vs:
        c = min((v - lo) * N // (hi - lo + 1), N - 1)
        s[c] += v
        ss[c] += v * v

    def cost(a: int, b: int) -> float:  # cells a..b inclusive
        n = sum(cells[c] for c in range(a, b + 1))
        if n == 0:
            return 0.0
        sv = sum(s[c] for c in range(a, b + 1))
        sq = sum(ss[c] for c in range(a, b + 1))
        return float(sq) - float(sv) * sv / n

    for b, sse in got.items():
        best = min(
            sum(
                cost(st, en)
                for st, en in zip(
                    (0, *[c + 1 for c in cut]), (*cut, N - 1)
                )
            )
            for cut in combinations(range(N - 1), b - 1)
        )
        assert abs(sse - best) < max(1e-3, abs(best) * 1e-9), (b, sse, best)
    # more buckets never hurt
    curve = [got[b] for b in sorted(got)]
    assert all(x >= y - 1e-6 for x, y in zip(curve, curve[1:]))


def test_unimax_waterfill_semantics(spark):
    rows = registry.queries()["unimax_allocation"](spark, SF).collect()
    by_src = {r.source: r for r in rows}
    toks = {r.source: r.n_tokens for r in rows}
    corpus = sum(toks.values())
    budget, cap = 0.5 * corpus, 2.0
    # waterfill mirror
    order = sorted(toks, key=lambda sx: (toks[sx], sx))
    alloc = {}
    remaining, left = budget, len(order)
    for sx in order:
        u = remaining / left
        a = min(cap * toks[sx], u)
        alloc[sx] = a
        remaining -= a
        left -= 1
    for sx, a in alloc.items():
        assert abs(by_src[sx].alloc_tokens - a) < max(1.0, a * 1e-6), sx
        assert by_src[sx].epochs <= cap + 1e-6
    assert abs(sum(r.alloc_tokens for r in rows) - budget) < 1.0


def test_krippendorff_matches_python(spark):
    row = registry.queries()["krippendorff_alpha_rules"](
        spark, SF
    ).collect()[0]
    docs = read_table(spark, SF, "documents").select(
        "doc_id", "text", "n_chars"
    ).collect()
    o = defaultdict(float)
    n_rows = 0
    for r in docs:
        toks = r.text.split(" ")
        div = len(set(toks)) / len(toks)
        ratings = [
            "hi" if div >= 0.5 else "lo",
            "hi" if len(toks) >= 60 else "lo",
        ]
        if r.doc_id % 5 != 0:
            ratings.append("hi" if r.n_chars >= 300 else "lo")
        m = len(ratings)
        if m < 2:
            continue
        cnt = Counter(ratings)
        n_rows += len(cnt)
        for c in cnt:
            o[(c, c)] += cnt[c] * (cnt[c] - 1) / (m - 1)
            for k in cnt:
                if k != c:
                    o[(c, k)] += cnt[c] * cnt[k] / (m - 1)
    nbar = defaultdict(float)
    for (c, _k), v in o.items():
        nbar[c] += v
    n = sum(nbar.values())
    do = sum(v for (c, k), v in o.items() if c != k)
    de = sum(
        nbar[c] * nbar[k] for c in nbar for k in nbar if c != k
    ) / (n - 1)
    assert row.n_rating_rows == n_rows
    assert abs(row.disagreement_obs - do) < 1e-5
    assert abs(row.disagreement_exp - de) < 1e-5
    assert abs(row.alpha - (1 - do / de)) < 1e-5


def test_partition_fingerprint_statuses(spark):
    rows = registry.queries()["partition_fingerprint_diff"](
        spark, SF
    ).collect()
    ev = read_table(spark, SF, "events").select("ts", "event_type").collect()
    d0 = min(math.floor(r.ts.timestamp()) // 86400 for r in ev)
    by_day = {}
    for r in rows:
        by_day[r.day_start // 86400 - d0] = r
    assert set(by_day) == {
        math.floor(r.ts.timestamp()) // 86400 - d0 for r in ev
    }
    for rel, r in by_day.items():
        if rel >= 21:
            assert r.status == "added" and r.n_prior == 0, rel
        elif 15 <= rel <= 20:
            # late error rows are missing from the prior snapshot
            assert r.status == "changed", rel
            assert r.n_prior < r.n_current
        else:
            assert r.status == "unchanged", rel
            assert r.n_prior == r.n_current


def test_nb_overdispersion_matches_python(spark):
    got = {
        r.event_type: r
        for r in registry.queries()["nb_overdispersion_daily"](
            spark, SF
        ).collect()
    }
    ev = read_table(spark, SF, "events").select("ts", "event_type").collect()
    daily = Counter(
        (r.event_type, math.floor(r.ts.timestamp()) // 86400) for r in ev
    )
    per = defaultdict(list)
    for (et, _d), c in daily.items():
        per[et].append(c)
    for et, cs in per.items():
        if len(cs) <= 1:
            assert et not in got
            continue
        n = len(cs)
        mean = sum(cs) / n
        var = (sum(c * c for c in cs) - sum(cs) ** 2 / n) / (n - 1)
        g = got[et]
        assert g.n_days == n
        assert abs(g.mean_daily - mean) < 1e-5
        assert abs(g.var_daily - var) < 1e-4
        assert abs(g.dispersion - var / mean) < 1e-5
        if var > mean:
            assert abs(g.nb_size_r - mean * mean / (var - mean)) < 1e-4


def test_round8b_null_text_parity(spark, tmp_path):
    """ADVICE r8 (both high items): krippendorff's r1/r2 ratings and
    unimax's per-source token sums must agree with the DuckDB oracle on
    NULL-text docs. The shared text fragments are NULL-gated at the
    source (functions/text.py:_null_gate), so a NULL-text driver
    regeneration rates 'lo' / skips the doc in BOTH engines."""
    import duckdb

    from steam_prices_data_engineering_spark.sources.tables import (
        TABLE_SCHEMAS,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again",
         "en", "web", 60),
        (2, None, "en", "web", 0),
        (3, None, "en", "books", 0),  # NULL text on its own source
        (None, "a a a a the the", "en", "books", 15),
        (5, " ".join(f"w{i}" for i in range(70)), "en", "wiki", 350),
        (10, "b c d e f g", "en", "wiki", 11),  # doc_id % 5 = 0 abstain
    ]
    spark.createDataFrame(rows, TABLE_SCHEMAS["documents"]).coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    for name in ("krippendorff_alpha_rules", "unimax_allocation"):
        sdf = registry.queries()[name](spark, str(tmp_path))
        srows = sorted(
            tuple(r) for r in sdf.select(sorted(sdf.columns)).collect()
        )
        rel = con.execute(registry.oracle_sql()[name])
        cols = [d[0] for d in rel.description]
        idx = [cols.index(c) for c in sorted(cols)]
        drows = sorted(tuple(r[i] for i in idx) for r in rel.fetchall())
        assert srows == drows, (name, srows, drows)
