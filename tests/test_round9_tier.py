"""Round-9 tier semantics, each against an INDEPENDENT mirror (pure
Python, or a property the construction must satisfy) — the DuckDB
oracle parity layer is tools/check_oracle.py; these tests pin intent.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from steam_prices_data_engineering_spark.plans import registry
from steam_prices_data_engineering_spark.sources.tables import read_table

SF = "/root/testdata/sf0.001"

_P = 2_147_483_647
_W = 8


def _tok_hash(tok: str) -> int:
    return len(tok) * 961 + 31 * ord(tok[0]) + ord(tok[-1])


def _window_hashes(text: str) -> list[int]:
    th = [_tok_hash(t) for t in text.split(" ")]
    if len(th) < _W:
        return []
    out = []
    for i in range(len(th) - _W + 1):
        acc = th[i]
        for j in range(1, _W):
            acc = (acc * 8191 + th[i + j]) % _P
        out.append(acc)
    return out


def test_longest_dup_substring_matches_python(spark):
    """Brute-force mirror: mark window positions whose hash occurs in
    >= 2 distinct docs, merge consecutive positions into runs, report
    the per-doc longest run + W - 1; the query's top-20 must match the
    mirror's (same total order: longest DESC, doc_id ASC)."""
    docs = {
        r.doc_id: r.text
        for r in read_table(spark, SF, "documents")
        .select("doc_id", "text")
        .collect()
    }
    owners: dict[int, set[int]] = {}
    wh = {d: _window_hashes(t) for d, t in docs.items()}
    for d, hs in wh.items():
        for h in hs:
            owners.setdefault(h, set()).add(d)
    per_doc = []
    for d, hs in wh.items():
        dup_pos = [i + 1 for i, h in enumerate(hs) if len(owners[h]) >= 2]
        if not dup_pos:
            continue
        runs, cur = [], 1
        for a, b in zip(dup_pos, dup_pos[1:]):
            if b == a + 1:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        per_doc.append((max(runs) + _W - 1, d, len(runs), sum(runs)))
    want = sorted(per_doc, key=lambda r: (-r[0], r[1]))[:20]
    got = [
        (r.longest_dup_tokens, r.doc_id, r.n_spans, r.n_dup_windows)
        for r in registry.queries()["longest_dup_substring"](
            spark, SF
        ).collect()
    ]
    assert sorted(got, key=lambda r: (-r[0], r[1])) == want
    assert len(want) > 0  # the fixture's replicas must produce real runs


def test_streaming_restart_equals_batch(spark):
    """The registered restart query (two availableNow runs over one
    checkpoint) must equal the batch hourly aggregate — the carryover
    property itself is asserted in-builder (run1 strictly partial)."""
    got = {
        (r.hour_start, r.event_type): (r.n_events, r.sum_value_micro)
        for r in registry.queries()["streaming_restart_carryover"](
            spark, SF
        ).collect()
    }
    ev = read_table(spark, SF, "events").filter(
        F.col("event_id").isNotNull()
    )
    want = {
        (r.hour_start, r.event_type): (r.n_events, r.sum_value_micro)
        for r in ev.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(
                F.floor(F.col("value") * F.lit(1000000.0) + F.lit(0.5)).cast(
                    "long"
                )
            )
            .cast("long")
            .alias("sum_value_micro"),
        )
        .select(
            F.col("w.start").cast("long").alias("hour_start"),
            "event_type",
            "n_events",
            "sum_value_micro",
        )
        .collect()
    }
    assert got == want


def test_restart_null_and_negative_event_id_hostile_parity(
    spark, tmp_path
):
    """NULL and negative event_ids must not leak through the restart
    query's parity batch split (the r9 NULL-branch-predicate gotcha,
    ADVICE r10): a NULL id falls in neither batch under any split, and
    a negative odd id under `%` gives remainder -1 (also neither) —
    the builder filters NULLs (mirrored in the oracle) and splits on
    pmod so negatives land in a batch. Cross-engine parity plus an
    exact row census pin it."""
    import datetime as dt

    import duckdb

    from steam_prices_data_engineering_spark.sources.tables import (
        TABLE_SCHEMAS,
    )

    t0 = dt.datetime(2024, 1, 1, 10, 15)
    rows = [
        (1, t0, 1, "click", 1.0, None),
        (2, t0, 1, "click", 2.0, None),
        (-3, t0, 1, "click", 4.0, None),  # negative ODD id: pmod -> 1
        (-4, t0, 1, "view", 8.0, None),   # negative EVEN id
        (None, t0, 1, "click", 16.0, None),  # NULL id: excluded
    ]
    spark.createDataFrame(rows, TABLE_SCHEMAS["events"]).coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    sdf = registry.queries()["streaming_restart_carryover"](
        spark, str(tmp_path)
    )
    got = sorted(tuple(r) for r in sdf.collect())

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    rel = con.execute(
        registry.oracle_sql()["streaming_restart_carryover"]
    )
    cols = [d[0] for d in rel.description]
    idx = [cols.index(c) for c in sdf.columns]
    want = sorted(tuple(r[i] for i in idx) for r in rel.fetchall())
    assert got == want, (got, want)
    # the NULL-id row (value 16.0) is in NEITHER engine's totals; the
    # negative ids are in BOTH
    by_type = {r[1]: r for r in got}
    assert by_type["click"][2] == 3  # ids 1, 2, -3 — not the NULL row
    assert by_type["click"][3] == 1_000_000 + 2_000_000 + 4_000_000
    assert by_type["view"][2] == 1  # id -4


def test_dedup_index_compaction_invariants(spark):
    """Per-band bookkeeping must reconcile with the band index derived
    directly from the shared minhash stages: base+delta partition the
    entries, tombstones are a subset of base, and live counts add up."""
    from steam_prices_data_engineering_spark.operators.dedup import (
        hashed_shingle_table,
        minhash_banded,
        minhash_sig_table,
    )
    from steam_prices_data_engineering_spark.plans.trainset import knuth_hash

    rows = registry.queries()["dedup_index_compaction"](spark, SF).collect()
    assert rows
    d = read_table(spark, SF, "documents")
    banded = minhash_banded(minhash_sig_table(hashed_shingle_table(d)))
    bucket = knuth_hash() % 10
    sides = d.select(
        "doc_id",
        (bucket >= 8).alias("is_delta"),
        (bucket == 0).alias("is_tomb"),
    )
    tagged = banded.join(sides, "doc_id")
    per_band = {
        r.band_idx: (r.n_base, r.n_tomb, r.n_delta)
        for r in tagged.groupBy("band_idx")
        .agg(
            F.sum(F.when(~F.col("is_delta"), 1).otherwise(0)).alias("n_base"),
            F.sum(F.when(F.col("is_tomb"), 1).otherwise(0)).alias("n_tomb"),
            F.sum(F.when(F.col("is_delta"), 1).otherwise(0)).alias("n_delta"),
        )
        .collect()
    }
    for r in rows:
        nb, nt, nd = per_band[r.band_idx]
        assert (r.n_base, r.n_tombstoned, r.n_delta) == (nb, nt, nd)
        assert r.n_live == nb - nt + nd
        assert 0 <= r.n_tombstoned <= r.n_base
        assert 0 < r.n_live_buckets <= r.n_live


def _dround(x: float, s: int = 6) -> float:
    f = float(10**s)
    return math.floor(x * f + 0.5) / f


def test_embedding_source_psi_matches_python(spark):
    """Pure-Python mirror with the SAME arithmetic: the dim-1 marginal
    (float32 -> double is exact), Spark's WEIGHTED percentile
    interpolation ((hi-pos)*lo + (pos-lo)*hi, CLAUDE.md), decile
    binning by value > edge, PSI terms with the 1e-6 epsilon."""
    e = {
        r.vec_id: float(r.embedding[0])
        for r in read_table(spark, SF, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    }
    src = {
        r.doc_id: r.source
        for r in read_table(spark, SF, "documents")
        .select("doc_id", "source")
        .collect()
    }
    vals: dict[str, list[float]] = {}
    for vid, x0 in e.items():
        if vid not in src:
            continue
        vals.setdefault(src[vid], []).append(_dround(x0))
    ref = min(vals)
    rv = sorted(vals[ref])
    edges = []
    for i in range(1, 10):
        pos = (len(rv) - 1) * (i / 10.0)
        lo, hi = math.floor(pos), math.ceil(pos)
        # integral pos: both weights vanish — the edge IS the exact rank
        ev = rv[lo] if lo == hi else (hi - pos) * rv[lo] + (pos - lo) * rv[hi]
        edges.append(_dround(ev))

    def binof(v: float) -> int:
        return 1 + sum(1 for ed in edges if v > ed)

    cnt: dict[tuple[str, int], int] = {}
    for s, vs in vals.items():
        for v in vs:
            cnt[(s, binof(v))] = cnt.get((s, binof(v)), 0) + 1
    ref_tot = float(len(vals[ref]))
    p_ref = {b: cnt.get((ref, b), 0) / ref_tot for b in range(1, 11)}
    got = registry.queries()["embedding_source_psi"](spark, SF).collect()
    assert {r.source for r in got} == set(vals) - {ref}
    eps = 1e-6
    for r in got:
        n = cnt.get((r.source, r.bin), 0)
        assert r.n_cur == n
        pc = n / float(len(vals[r.source]))
        pr = p_ref[r.bin]
        assert abs(r.p_cur - _dround(pc)) < 1e-12
        assert abs(r.p_ref - _dround(pr)) < 1e-12
        term = (pc - pr) * math.log(max(pc, eps) / max(pr, eps))
        assert abs(r.psi_term - term) <= 1.1e-6


def test_state_introspection_matches_batch_rollup(spark):
    """The state read back from checkpoint files must hold EXACTLY one
    row per (hour, event_type) with the batch count folded in."""
    got = {
        r.event_type: (r.n_state_rows, r.sum_state_count, r.first_hour,
                       r.last_hour)
        for r in registry.queries()["streaming_state_introspection"](
            spark, SF
        ).collect()
    }
    ev = read_table(spark, SF, "events")
    want = {
        r.event_type: (r.n, r.tot, r.lo, r.hi)
        for r in ev.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("c").cast("long").alias("tot"),
            F.min(F.col("w.start").cast("long")).cast("long").alias("lo"),
            F.max(F.col("w.start").cast("long")).cast("long").alias("hi"),
        )
        .collect()
    }
    assert got == want


def test_longest_dup_span_pairs_matches_python(spark):
    """Brute-force mirror of the constant-diagonal matched-span
    extension: for every doc pair sharing a window hash (held by 2..CAP
    docs), runs of consecutive pa on the same pa - pb diagonal are
    maximal shared spans; per pair report max + count, top-20 on the
    pinned total order."""
    docs = {
        r.doc_id: r.text
        for r in read_table(spark, SF, "documents")
        .select("doc_id", "text")
        .collect()
    }
    wh = {d: _window_hashes(t) for d, t in docs.items()}
    owners: dict[int, set[int]] = {}
    for d, hs in wh.items():
        for h in hs:
            owners.setdefault(h, set()).add(d)
    eligible = {h for h, o in owners.items() if 2 <= len(o) <= 16}
    pos: dict[int, list[tuple[int, int]]] = {}
    for d, hs in wh.items():
        for i, h in enumerate(hs):
            if h in eligible:
                pos.setdefault(h, []).append((d, i + 1))
    cells: dict[tuple[int, int, int], list[int]] = {}
    for h, occ in pos.items():
        for da, pa in occ:
            for db, pb in occ:
                if da < db:
                    cells.setdefault((da, db, pa - pb), []).append(pa)
    spans: dict[tuple[int, int], list[int]] = {}
    for (da, db, _diag), pas in cells.items():
        pas = sorted(set(pas))
        cur = 1
        for a, b in zip(pas, pas[1:]):
            if b == a + 1:
                cur += 1
            else:
                spans.setdefault((da, db), []).append(cur)
                cur = 1
        spans.setdefault((da, db), []).append(cur)
    per_pair = [
        (max(rs) + _W - 1, da, db, len(rs))
        for (da, db), rs in spans.items()
    ]
    want = sorted(per_pair, key=lambda r: (-r[0], r[1], r[2]))[:20]
    got = [
        (r.longest_shared_tokens, r.doc_id_a, r.doc_id_b, r.n_shared_spans)
        for r in registry.queries()["longest_dup_span_pairs"](
            spark, SF
        ).collect()
    ]
    assert sorted(got, key=lambda r: (-r[0], r[1], r[2])) == want
    assert len(want) > 0


def test_round9_text_queries_null_hostile_parity(spark, tmp_path):
    """Driver regenerations may carry NULL text / NULL doc_id; pin
    Spark == DuckDB for the round-9 suffix-dedup queries on a hostile
    fixture (NULL text explodes to 0 windows on BOTH sides: Spark's
    size(NULL) = -1 < W picks the empty array, DuckDB's range(1, NULL)
    unnests to nothing)."""
    import duckdb

    from steam_prices_data_engineering_spark.sources.tables import (
        TABLE_SCHEMAS,
    )

    base = "x y " + " ".join(f"t{i}" for i in range(12))
    rows = [
        (1, base + " tail one", "en", "web", 60),
        (2, None, "en", "web", 0),          # NULL text
        (None, base + " tail two", "en", "books", 60),  # NULL doc_id
        (4, base + " tail one", "en", "wiki", 60),      # exact dup of 1
        (5, "short words only here", "en", "web", 20),  # < W tokens
    ]
    spark.createDataFrame(rows, TABLE_SCHEMAS["documents"]).coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    def nkey(t):  # NULL doc_id rows sort without None < int TypeErrors
        return tuple((v is None, v) for v in t)

    for name in ("longest_dup_substring", "longest_dup_span_pairs"):
        sdf = registry.queries()[name](spark, str(tmp_path))
        srows = sorted(
            (tuple(r) for r in sdf.select(sorted(sdf.columns)).collect()),
            key=nkey,
        )
        rel = con.execute(registry.oracle_sql()[name])
        cols = [d[0] for d in rel.description]
        idx = [cols.index(c) for c in sorted(cols)]
        drows = sorted(
            (tuple(r[i] for i in idx) for r in rel.fetchall()), key=nkey
        )
        assert srows == drows, (name, srows, drows)
        assert srows, name  # the dup pair must actually surface


def test_pii_redaction_matches_python_re(spark):
    """Independent mirror with Python's re module: same staged order
    (emails, then phones, then residual digit runs), counts taken on the
    string state each replacement sees, checksum = sum of 24-bit md5
    prefixes of the redacted lines."""
    import hashlib
    import re

    from steam_prices_data_engineering_spark.plans.round7 import (
        _PII_DIGITS,
        _PII_EMAIL,
        _PII_PHONE,
    )

    rows = (
        read_table(spark, SF, "events")
        .select("event_id", "user_id", "event_type", "props")
        .collect()
    )
    agg: dict[str, list[int]] = {}
    for r in rows:
        parts = [
            "evt",
            str(r.event_id).rjust(8, "0"),
            "user",
            str(r.user_id),
            r.props,
        ]
        if r.user_id % 3 == 0:
            parts.append(f"contact u{r.user_id}@example.com")
        if r.event_id % 5 < 2:
            parts.append("call +1415555" + str(r.event_id % 1000).rjust(4, "0"))
        line = " ".join(p for p in parts if p is not None)
        e_cnt = len(re.findall(_PII_EMAIL, line))
        r1 = re.sub(_PII_EMAIL, "<EMAIL>", line)
        p_cnt = len(re.findall(_PII_PHONE, r1))
        r2 = re.sub(_PII_PHONE, "<PHONE>", r1)
        d_cnt = len(re.findall(_PII_DIGITS, r2))
        r3 = re.sub(_PII_DIGITS, "<NUM>", r2)
        chk = int(hashlib.md5(r3.encode()).hexdigest()[:6], 16)
        a = agg.setdefault(r.event_type, [0, 0, 0, 0, 0, 0])
        a[0] += 1
        a[1] += 1 if line != r3 else 0
        a[2] += e_cnt
        a[3] += p_cnt
        a[4] += d_cnt
        a[5] += chk
    got = {
        r.event_type: [
            r.n_events,
            r.n_redacted,
            r.n_email_repl,
            r.n_phone_repl,
            r.n_digit_repl,
            r.redacted_checksum,
        ]
        for r in registry.queries()["pii_redaction_transform"](
            spark, SF
        ).collect()
    }
    assert got == agg


def test_matryoshka_prefix_recall_matches_python(spark):
    """Independent mirror replicating the engines' LEFT-TO-RIGHT double
    fold for the dot product and the integer micro-unit ranking."""
    rows = (
        read_table(spark, SF, "embeddings")
        .filter(F.col("vec_id").isNotNull() & F.col("embedding").isNotNull())
        .select("vec_id", "embedding")
        .collect()
    )
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in rows}

    def micro_dot(a, b, n):
        acc = 0.0
        for i in range(n):
            acc = acc + a[i] * b[i]
        return math.floor(acc * 1e6 + 0.5)

    expected = {}
    for qid in sorted(v for v in vecs if v < 16):
        qv = vecs[qid]
        scored = [
            (cid, micro_dot(cv, qv, 64), micro_dot(cv, qv, 16))
            for cid, cv in vecs.items()
            if cid != qid
        ]
        by_full = sorted(scored, key=lambda t: (-t[1], t[0]))
        by_pref = sorted(scored, key=lambda t: (-t[2], t[0]))
        top_f = {t[0] for t in by_full[:10]}
        top_p = {t[0] for t in by_pref[:10]}
        expected[qid] = (
            len(top_f & top_p),
            by_full[0][0],
            by_pref[0][0],
        )

    got = {
        r.qid: (r.overlap10, r.full_top1, r.pref_top1)
        for r in registry.queries()["matryoshka_prefix_recall"](
            spark, SF
        ).collect()
    }
    assert got == expected
    # non-vacuous: the prefix must actually DEGRADE retrieval somewhere
    assert any(ov < 10 for ov, _, _ in expected.values())


def test_ivm_quadrants_partition_the_full_join(spark):
    """The four maintenance terms must be a disjoint, complete partition
    of the direct full join (recomputed here in Spark, independently of
    the DuckDB oracle), and revenue must be the exact cents sum."""
    o = read_table(spark, SF, "orders")
    li = read_table(spark, SF, "lineitem")
    direct = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(
                F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast(
                    "long"
                )
            )
            .cast("long")
            .alias("revenue_cents"),
        )
    )
    want = {r.priority: (r.n_pairs, r.revenue_cents) for r in direct.collect()}
    got_rows = registry.queries()["ivm_join_delta_merge"](spark, SF).collect()
    got = {r.priority: (r.n_pairs, r.revenue_cents) for r in got_rows}
    assert got == want
    for r in got_rows:
        assert r.pairs_bb + r.pairs_db + r.pairs_bd + r.pairs_dd == r.n_pairs
        # every quadrant is exercised by the fixture cuts (non-vacuous)
        assert min(r.pairs_bb, r.pairs_db, r.pairs_bd, r.pairs_dd) >= 0
    assert sum(r.pairs_dd for r in got_rows) > 0
    assert sum(r.pairs_db for r in got_rows) > 0
    assert sum(r.pairs_bd for r in got_rows) > 0


def test_bitext_margin_invariants(spark):
    """margin = best / mean(top-k) is >= 1 by construction (the best IS
    the max of the top-k), and avg_topk can never exceed best_cos."""
    rows = registry.queries()["bitext_margin_mining"](spark, SF).collect()
    assert len(rows) == 16
    for r in rows:
        assert r.margin >= 1.0, r
        assert r.best_cos >= r.avg_topk - 1e-9, r
        assert r.best_tid is not None
    # non-vacuous: margins must spread (not all hubs, not all identical)
    margins = sorted(r.margin for r in rows)
    assert margins[-1] > margins[0]


def test_containment_chain_pointer_jumping_depth(spark, tmp_path):
    """The driver fixture's duplicates are equal-size replicas, so its
    containment forest is all depth-1 stars (probed); pin the log-round
    capability on a fixture with REAL nested chains (A ⊂ B ⊂ C ⊂ D):
    pointer jumping must resolve every doc to the chain root with the
    exact depth, matching the recursive-CTE oracle."""
    import duckdb

    from steam_prices_data_engineering_spark.sources.tables import (
        TABLE_SCHEMAS,
    )

    # unique (first, last) chars: the shared token hash keys on
    # (len, first, last), so wN-style names would collide (w10 == w20)
    toks = [
        chr(97 + i // 8) + "x" + chr(97 + i % 8) for i in range(64)
    ]
    # nested prefixes: doc k = first 12 + 8k tokens; strictly growing
    # shingle sets, each fully contained in the next => a depth-6 chain
    chain = [
        (k, " ".join(toks[: 12 + 8 * k]), "en", "web", 0) for k in range(7)
    ]
    # plus an unrelated doc and an equal-size duplicate star
    extra = [
        (100, " ".join(f"z{i}" for i in range(20)), "en", "web", 0),
        (101, " ".join(f"q{i}" for i in range(16)), "en", "web", 0),
        (102, " ".join(f"q{i}" for i in range(16)), "en", "web", 0),
    ]
    spark.createDataFrame(
        chain + extra, TABLE_SCHEMAS["documents"]
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    sdf = registry.queries()["containment_root_resolution"](
        spark, str(tmp_path)
    )
    srows = sorted(tuple(r) for r in sdf.select("doc_id", "root_doc", "depth").collect())
    rel = con.execute(registry.oracle_sql()["containment_root_resolution"])
    cols = [d[0] for d in rel.description]
    idx = [cols.index(c) for c in ("doc_id", "root_doc", "depth")]
    drows = sorted(tuple(r[i] for i in idx) for r in rel.fetchall())
    assert srows == drows, (srows, drows)
    got = {d: (r, dep) for d, r, dep in srows}
    # every chain member resolves to the LARGEST doc (the chain root)
    for k in range(6):
        assert got[k] == (6, 6 - k), (k, got.get(k))
    # the equal-size duplicate pair forms a depth-1 star on the min id
    assert got[102] == (101, 1)
    assert 100 not in got  # unrelated doc has no parent


def test_ivm_null_date_hostile_parity(spark, tmp_path):
    """A NULL-date driver regeneration must not diverge the IVM view:
    NULL o_orderdate / l_shipdate rows belong to no quadrant and are
    excluded in BOTH engines (Spark's base/delta filters would drop
    them silently while a bare oracle count(*) would keep them)."""
    import datetime as dt

    import duckdb

    from steam_prices_data_engineering_spark.sources.tables import (
        TABLE_SCHEMAS,
    )

    d_old = dt.datetime(1999, 1, 1)
    d_new = dt.datetime(2001, 6, 1)
    orders = [
        (1, 1, "O", 10.0, d_old, "1-URGENT"),
        (2, 1, "O", 10.0, d_new, "1-URGENT"),
        (3, 1, "O", 10.0, None, "2-HIGH"),  # NULL order date
    ]
    li = [
        (1, 1, 1, 1, 1.0, 100.004, 0.0, 0.0, "N", "O", d_old),
        (1, 1, 1, 2, 1.0, 50.0, 0.0, 0.0, "N", "O", d_new),
        (2, 1, 1, 1, 1.0, 25.0, 0.0, 0.0, "N", "O", d_new),
        (2, 1, 1, 2, 1.0, None, 0.0, 0.0, "N", "O", d_old),  # NULL price
        (3, 1, 1, 1, 1.0, 75.0, 0.0, 0.0, "N", "O", d_old),
        (1, 1, 1, 3, 1.0, 60.0, 0.0, 0.0, "N", "O", None),  # NULL shipdate
    ]
    spark.createDataFrame(orders, TABLE_SCHEMAS["orders"]).coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(li, TABLE_SCHEMAS["lineitem"]).coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{tmp_path}/{t}.parquet/*.parquet')"
        )
    sdf = registry.queries()["ivm_join_delta_merge"](spark, str(tmp_path))
    cols = sorted(sdf.columns)
    srows = sorted(tuple(r) for r in sdf.select(cols).collect())
    rel = con.execute(registry.oracle_sql()["ivm_join_delta_merge"])
    rcols = [d[0] for d in rel.description]
    idx = [rcols.index(c) for c in cols]
    drows = sorted(tuple(r[i] for i in idx) for r in rel.fetchall())
    assert srows == drows, (srows, drows)
    got = {r.priority: r for r in sdf.collect()}
    # NULL-date rows joined nothing; NULL price counted but not summed
    assert "2-HIGH" not in got  # its only lineitem pairing is via doc 3
    r1 = got["1-URGENT"]
    # (1,bb), (1,bd), (2,db: NULL price counts, sums nothing), (2,dd);
    # the NULL-shipdate lineitem and NULL-orderdate order join nothing
    assert r1.n_pairs == 4
    assert (r1.pairs_bb, r1.pairs_db, r1.pairs_bd, r1.pairs_dd) == (1, 1, 1, 1)
    assert r1.revenue_cents == 10000 + 5000 + 2500


def test_embedding_queries_null_hostile_parity(spark, tmp_path):
    """NULL vec_id / NULL embedding / NULL label rows must be excluded
    identically in both engines for the round-9d embedding queries."""
    import duckdb

    from steam_prices_data_engineering_spark.sources.tables import (
        TABLE_SCHEMAS,
    )

    def vec(seed: int) -> list[float]:
        return [((seed * 31 + i * 7) % 13 - 6) / 6.0 for i in range(64)]

    rows = []
    for i in range(40):
        rows.append((i, vec(i), i % 3))
    rows.append((100, None, 0))       # NULL embedding
    rows.append((None, vec(99), 1))   # NULL vec_id
    rows.append((101, vec(7), None))  # NULL label
    spark.createDataFrame(rows, TABLE_SCHEMAS["embeddings"]).coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{tmp_path}/embeddings.parquet/*.parquet')"
    )
    for name in ("matryoshka_prefix_recall", "bitext_margin_mining"):
        sdf = registry.queries()[name](spark, str(tmp_path))
        cols = sorted(sdf.columns)
        srows = sorted(tuple(r) for r in sdf.select(cols).collect())
        rel = con.execute(registry.oracle_sql()[name])
        rcols = [d[0] for d in rel.description]
        idx = [rcols.index(c) for c in cols]
        drows = sorted(tuple(r[i] for i in idx) for r in rel.fetchall())
        assert srows == drows, (name, srows, drows)
        assert srows, name


def test_setjoin_prefix_filter_matches_bruteforce(spark):
    """Independent brute-force mirror: distinct 3-gram shingle sets
    (same token/shingle hash formulas), df-cap 50, ALL-pairs exact
    Jaccard >= 0.7 — the query's prefix-filtered pair set must equal it
    (completeness + correctness of the pruning)."""
    docs = {
        r.doc_id: r.text
        for r in read_table(spark, SF, "documents")
        .select("doc_id", "text")
        .collect()
        if r.text is not None and r.doc_id is not None
    }

    def shingles(text: str) -> set[int]:
        th = [_tok_hash(t) for t in text.split(" ")]
        return {
            (((th[i] * 8191 + th[i + 1]) % _P) * 8191 + th[i + 2]) % _P
            for i in range(len(th) - 2)
        }

    sets = {d: shingles(t) for d, t in docs.items()}
    df: dict[int, int] = {}
    for s in sets.values():
        for h in s:
            df[h] = df.get(h, 0) + 1
    capped = {
        d: {h for h in s if df[h] <= 50} for d, s in sets.items()
    }
    want = set()
    ids = sorted(capped)
    for i, a in enumerate(ids):
        sa = capped[a]
        if not sa:
            continue
        for b in ids[i + 1 :]:
            sb = capped[b]
            inter = len(sa & sb)
            if inter and inter / (len(sa) + len(sb) - inter) >= 0.7 - 1e-12:
                import math as _m

                jd = _m.floor(inter / (len(sa) + len(sb) - inter) * 1e6 + 0.5) / 1e6
                if jd >= 0.7:
                    want.add((a, b))
    got = {
        (r.doc_a, r.doc_b)
        for r in registry.queries()["setjoin_prefix_filter"](
            spark, SF
        ).collect()
    }
    assert got == want, (sorted(got - want), sorted(want - got))
    assert want  # replicas must produce real pairs


def test_ams_f2_estimate_is_sane(spark):
    """The md5-sign AMS estimate must land within the sketch's
    statistical band (sigma/F2 = sqrt(2/16) ~ 0.35; allow 3 sigma) —
    the correlated-affine family this replaced was 25x off."""
    r = registry.queries()["ams_f2_join_size"](spark, SF).collect()[0]
    assert r.exact_f2 > 0 and r.n_keys > 0
    assert r.ams_f2_x16 >= 0
    assert abs(r.rel_err) < 1.05, r
