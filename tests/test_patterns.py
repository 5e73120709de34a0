"""Semantic contracts of the round-2d pattern tier (plans/patterns.py):
skyline equals the brute-force dominance filter, DBSCAN clusters are
exactly the brute-force union-find over core cells, the CEP session
strings match an independent Python re-implementation, and the group
holdout split really is group-disjoint."""

from __future__ import annotations

import math
import re
from collections import defaultdict

from pyspark.sql import functions as F

from steam_prices_data_engineering_spark.plans import registry
from steam_prices_data_engineering_spark.plans.patterns import (
    _CEP_GAP_S,
    _CEP_PATTERNS,
    _DB_CELLS_PER_DEG,
    _DB_CID,
)
from steam_prices_data_engineering_spark.sources.tables import read_table

SF = "/root/testdata/sf0.001"


def test_pareto_frontier_matches_brute_force(spark):
    """The bucket-decomposed skyline must equal the O(n^2) textbook
    dominance filter — bucketing is an optimization, never a semantics
    change."""
    li = read_table(spark, SF, "lineitem")
    grain = (
        li.groupBy("l_partkey")
        .agg(
            F.sum("l_quantity").alias("qty"),
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("price"),
        )
        .groupBy("qty")
        .agg(F.min("price").alias("price"))
        .collect()
    )
    pts = [(r.qty, r.price) for r in grain]
    brute = {
        (q, p)
        for q, p in pts
        if not any(
            (q2 >= q and p2 <= p and (q2 > q or p2 < p)) for q2, p2 in pts
        )
    }
    out = registry.queries()["pareto_frontier_parts"](spark, SF).collect()
    got = {(r.total_qty, None) for r in out}
    assert {(int(q), None) for q, _ in brute} == got
    # along the frontier, higher qty can only survive with higher price
    # (a cheaper-and-bigger point would dominate everything below it):
    srt = sorted(((r.total_qty, r.best_unit_price) for r in out))
    prices = [p for _, p in srt]
    assert prices == sorted(prices) and len(set(prices)) == len(prices)


def test_dbscan_matches_brute_force_union_find(spark):
    """Cluster labels equal a Python union-find over the same core cells
    (8-adjacency), and every reported cluster is maximal."""
    cust = registry.queries()["dbscan_grid_clusters"](spark, SF).collect()
    # Recompute core cells independently.
    from steam_prices_data_engineering_spark.functions.text import md5_hex6_to_int

    c = read_table(spark, SF, "customer")

    def coord(salt):
        key = F.concat_ws("", F.lit(salt), F.col("c_custkey").cast("string"))
        return (md5_hex6_to_int(key) % 50000) / F.lit(10000.0)

    cells = (
        c.select(
            (
                F.floor(coord("glat_") * _DB_CELLS_PER_DEG).cast("long") * _DB_CID
                + F.floor(coord("glon_") * _DB_CELLS_PER_DEG).cast("long")
            ).alias("cid")
        )
        .groupBy("cid")
        .count()
        .collect()
    )
    counts = {r.cid: r["count"] for r in cells}
    avg = sum(counts.values()) / len(counts)
    minpts = max(math.ceil(2 * avg), 3)
    core = {cid: n for cid, n in counts.items() if n >= minpts}
    parent = {cid: cid for cid in core}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a in core:
        for b in core:
            if (
                abs(a // _DB_CID - b // _DB_CID) <= 1
                and abs(a % _DB_CID - b % _DB_CID) <= 1
            ):
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    comps = defaultdict(list)
    for cid in core:
        comps[find(cid)].append(cid)
    expect = {
        min(v): (len(v), sum(core[c] for c in v)) for v in comps.values()
    }
    got = {r.cluster_id: (r.n_cells, r.n_points) for r in cust}
    assert expect == got


def test_event_pattern_match_python_parity(spark):
    """Pattern counts equal an independent Python sessionizer + re.search
    over the same events."""
    rows = (
        read_table(spark, SF, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    sym = {"view": "V", "click": "C", "purchase": "P", "signup": "S"}
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append((r.ts, r.event_id, sym.get(r.event_type, "E")))
    sessions = []
    for uid, evs in by_user.items():
        evs.sort()
        cur, prev = [], None
        for ts, eid, s in evs:
            ep = int(ts.timestamp())
            if prev is not None and ep - prev > _CEP_GAP_S:
                sessions.append((uid, "".join(cur)))
                cur = []
            cur.append(s)
            prev = ep
        if cur:
            sessions.append((uid, "".join(cur)))
    expect = {}
    for name, pat in _CEP_PATTERNS:
        hit = [(u, s) for u, s in sessions if re.search(pat, s)]
        if hit:
            expect[name] = (len(hit), len({u for u, _ in hit}))
    out = registry.queries()["event_pattern_match"](spark, SF).collect()
    got = {r.pattern_name: (r.n_sessions, r.n_users) for r in out}
    assert expect == got


def test_group_holdout_is_group_disjoint(spark):
    """No source may appear in both splits, and doc counts must cover the
    corpus exactly."""
    docs = read_table(spark, SF, "documents")
    from steam_prices_data_engineering_spark.functions.text import md5_hex6_to_int

    assigned = docs.select(
        "source",
        (
            md5_hex6_to_int(F.concat_ws("", F.lit("gh_"), F.col("source"))) % 10
        ).alias("b"),
    )
    overlap = (
        assigned.select(
            "source", F.when(F.col("b") == 0, "val").otherwise("train").alias("s")
        )
        .groupBy("source")
        .agg(F.countDistinct("s").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert overlap == 0
    out = registry.queries()["trainset_group_holdout"](spark, SF).collect()
    assert sum(r.n_docs for r in out) == docs.count()
    assert {r.split for r in out} <= {"train", "val"}


def test_kcore_is_a_fixpoint_and_subgraph_consistent(spark):
    """The fixed peel rounds must actually converge on the fixture: every
    reported core_degree is the node's degree within the survivor set,
    and all are >= K (one more peel would change nothing)."""
    from steam_prices_data_engineering_spark.plans.graph_ops import (
        _KCORE_K,
        neardup_edges,
    )

    docs = read_table(spark, SF, "documents")
    out = registry.queries()["kcore_neardup_graph"](spark, SF).collect()
    core = {r.doc_id: r.core_degree for r in out}
    edges = [(r.u, r.v) for r in neardup_edges(docs).collect()]
    deg = defaultdict(int)
    for u, v in edges:
        if u in core and v in core:
            deg[u] += 1
            deg[v] += 1
    assert all(d >= _KCORE_K for d in core.values())
    assert {k: deg[k] for k in core} == core


def test_streaming_event_pattern_matches_batch(spark):
    """Complete-mode streaming CEP over one availableNow batch equals the
    batch sessionization + flags (arrival order must not matter because
    the symbol string sorts inside the projection)."""
    out = registry.queries()["streaming_event_pattern"](spark, SF)
    rows = {(r.user_id, r.session_start): (r.syms, r.m_browse_then_buy) for r in out.collect()}
    assert rows, "stream produced no sessions"
    for (uid, start), (syms, m) in rows.items():
        assert m == bool(re.search("V+C+P", syms))


def test_textrank_matches_python_pagerank(spark):
    """TextRank top-k equals an independent Python PageRank over the same
    df-gated co-occurrence graph (graph build AND iteration algebra)."""
    from steam_prices_data_engineering_spark.plans.corpus_eval import (
        _TR_DAMPING,
        _TR_ITERS,
        _TR_MIN_DF,
        _TR_TOPK,
    )

    docs = read_table(spark, SF, "documents").select("doc_id", "text").collect()
    nd = len(docs)
    df = defaultdict(set)
    pair_w = defaultdict(float)
    for r in docs:
        t = r.text.split(" ")
        for w in t:
            df[w].add(r.doc_id)
        for a, b in zip(t, t[1:]):
            if a != b:
                pair_w[(min(a, b), max(a, b))] += 1.0
    kept = {w for w, s in df.items() if len(s) >= _TR_MIN_DF and len(s) * 10 <= nd * 9}
    pair_w = {k: v for k, v in pair_w.items() if k[0] in kept and k[1] in kept}
    adj = defaultdict(list)
    outw = defaultdict(float)
    for (u, v), w in pair_w.items():
        adj[u].append((v, w))
        adj[v].append((u, w))
        outw[u] += w
        outw[v] += w
    nodes = sorted(adj)
    n = len(nodes)
    rank = {u: 1.0 / n for u in nodes}
    for _ in range(_TR_ITERS):
        contrib = defaultdict(float)
        for u in nodes:
            for v, w in adj[u]:
                contrib[v] += rank[u] * w / outw[u]
        rank = {
            u: (1 - _TR_DAMPING) / n + _TR_DAMPING * contrib[u] for u in nodes
        }
    expect = sorted(
        ((round(r, 6), tok) for tok, r in rank.items()),
        key=lambda x: (-x[0], x[1]),
    )[:_TR_TOPK]
    out = registry.queries()["textrank_keywords"](spark, SF).collect()
    got = [(r.tr_rank, r.token) for r in out]
    assert [t for _, t in expect] == [t for _, t in got]
    for (er, _), (gr, _) in zip(expect, got):
        assert abs(er - gr) < 2e-6


def test_round2d_plans_have_no_cartesian_products(spark):
    """Every round-2d join must be keyed or broadcast — a CartesianProduct
    node (unbroadcast all-pairs) in any of these plans is a scale bug.
    (BroadcastNestedLoopJoin is allowed: those are the intentional 1-row
    threshold/pattern-dim cross joins and the bounded core-cell
    adjacency.)"""
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in [
        "event_pattern_match",
        "pareto_frontier_parts",
        "dbscan_grid_clusters",
        "trainset_group_holdout",
        "hll_sketch_rollup",
        "frequent_event_sequences",
        "weighted_median_price",
        "ks_two_sample_drift",
        "xcorr_error_revenue",
        "attribution_position_based",
        "linkpred_neighbor_jaccard",
        "holdout_lm_perplexity",
        "textrank_keywords",
    ]:
        df = registry.queries()[name](spark, SF)
        plan = df._jdf.queryExecution().explainString(mode)
        assert "CartesianProduct" not in plan, name
