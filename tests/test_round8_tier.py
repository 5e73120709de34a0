"""Round-8 tier semantics: 13-gram decontamination, SLO burn-rate
windows, shard-rebalance movement, BPE round trip, range-partition
planning — each checked against an independent Python oracle on the
sf0.001 fixture, plus the parametric-n-gram parity pin."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from steam_prices_data_engineering_spark.plans import registry
from steam_prices_data_engineering_spark.sources.tables import read_table

SF = "/root/testdata/sf0.001"
P = 2_147_483_647


def _tok_hash(t: str) -> int:
    return len(t) * 961 + (ord(t[0]) * 31 + ord(t[-1]) if t else 0)


def _ngram_hashes(text: str, n: int) -> list[int]:
    th = [_tok_hash(t) for t in text.split(" ")]
    if len(th) < n:
        return []
    out = []
    for i in range(len(th) - n + 1):
        acc = th[i]
        for j in range(1, n):
            acc = (acc * 8191 + th[i + j]) % P
        out.append(acc)
    return out


def _md5i(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:6], 16)


def test_ngram_hash_parametric_parity(spark):
    """ngram_hash_array(th, 3) must equal shingle_hash_array(th)
    element-for-element in BOTH engines — the no-inline-copy contract
    for the parametric generalization."""
    import duckdb
    from pyspark.sql import functions as F

    from steam_prices_data_engineering_spark.functions.sqlfrag import (
        sql_ngram_hashes,
        sql_shingle_hashes,
        sql_token_hashes,
    )
    from steam_prices_data_engineering_spark.functions.text import (
        ngram_hash_array,
        shingle_hash_array,
        token_hash_array,
    )

    d = read_table(spark, SF, "documents").limit(50)
    staged = d.select("doc_id", token_hash_array(F.col("text")).alias("th"))
    rows = staged.select(
        "doc_id",
        ngram_hash_array(F.col("th"), 3).alias("a"),
        shingle_hash_array(F.col("th")).alias("b"),
    ).collect()
    assert rows and all(list(r.a) == list(r.b) for r in rows)

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    bad = con.execute(
        f"""
        WITH t AS (SELECT doc_id, {sql_token_hashes()} AS th
                   FROM documents LIMIT 50)
        SELECT count(*) FROM t
        WHERE {sql_ngram_hashes('th', 3)} <> {sql_shingle_hashes('th')}
        """
    ).fetchone()[0]
    assert bad == 0


def test_decontam13_matches_python(spark):
    got = {
        r.source: r
        for r in registry.queries()["decontam_ngram13_eval"](
            spark, SF
        ).collect()
    }
    docs = (
        read_table(spark, SF, "documents")
        .select("doc_id", "source", "text")
        .collect()
    )
    ev_grams: set[int] = set()
    for r in docs:
        if r.doc_id % 97 == 0:
            ev_grams |= set(_ngram_hashes(r.text, 13))
    per = defaultdict(lambda: [0, 0])
    for r in docs:
        if r.doc_id % 97 == 0:
            continue
        per[r.source][0] += 1
        if ev_grams & set(_ngram_hashes(r.text, 13)):
            per[r.source][1] += 1
    assert set(got) == set(per)
    for src, (n_train, n_flagged) in per.items():
        g = got[src]
        assert g.n_train == n_train and g.n_flagged == n_flagged, src
        assert abs(g.flag_rate - n_flagged / n_train) < 1e-5


def test_decontam13_contaminates_exact_dup(spark, tmp_path):
    """A train doc that duplicates an eval doc's 13-token run is
    flagged; a doc sharing only shorter runs is not."""
    from steam_prices_data_engineering_spark.sources.tables import (
        TABLE_SCHEMAS,
    )

    run13 = " ".join(f"w{i}" for i in range(13))
    rows = [
        (0, f"{run13} tail tokens here", "en", "eval", 1),  # eval (0%97==0)
        (1, f"prefix {run13}", "en", "web", 1),  # shares the full run
        (2, " ".join(f"w{i}" for i in range(12)) + " zzz", "en", "web", 1),
        (3, "totally different text entirely", "en", "books", 1),
    ]
    spark.createDataFrame(rows, TABLE_SCHEMAS["documents"]).coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        r.source: r
        for r in registry.queries()["decontam_ngram13_eval"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got["web"].n_train == 2 and got["web"].n_flagged == 1
    assert got["books"].n_flagged == 0


def test_slo_burn_matches_python(spark):
    got = {
        r.hour_start: r
        for r in registry.queries()["slo_burn_rate_windows"](
            spark, SF
        ).collect()
    }
    ev = read_table(spark, SF, "events").select("ts", "event_type").collect()
    hourly = defaultdict(lambda: [0, 0])
    for r in ev:
        hb = math.floor(r.ts.timestamp()) // 3600
        hourly[hb][0] += 1
        hourly[hb][1] += r.event_type == "error"
    assert set(got) == {hb * 3600 for hb in hourly}
    for hb, (n, err) in hourly.items():
        n6 = sum(
            v[0] for k, v in hourly.items() if hb - 5 <= k <= hb
        )
        e6 = sum(
            v[1] for k, v in hourly.items() if hb - 5 <= k <= hb
        )
        g = got[hb * 3600]
        assert (g.n_1h, g.err_1h, g.n_6h, g.err_6h) == (n, err, n6, e6)
        b1, b6 = err / n / 0.2, e6 / n6 / 0.2
        assert abs(g.burn_1h - b1) < 1e-5 and abs(g.burn_6h - b6) < 1e-5
        assert g.fast_burn_alert == (b1 > 1.3 and b6 > 1.15)


def test_shard_rebalance_matches_python_and_beats_mod(spark):
    from steam_prices_data_engineering_spark.plans.round8 import (
        _RB_A,
        _RB_C,
        _RB_P,
    )

    got = {
        r.policy: r
        for r in registry.queries()["shard_rebalance_movement"](
            spark, SF
        ).collect()
    }
    doc_ids = [
        r.doc_id
        for r in read_table(spark, SF, "documents").select("doc_id").collect()
    ]

    def hrw(h: int, n: int) -> int:
        best, bj = -1, -1
        for j in range(n):
            v = ((h + _RB_C[j]) * _RB_A[j]) % _RB_P
            if v > best:
                best, bj = v, j
        return bj

    mm = mh = 0
    for d in doc_ids:
        h = _md5i(f"rb1|{d}")
        mm += (h % 16) != (h % 17)
        mh += hrw(h, 16) != hrw(h, 17)
    assert got["mod"].n_moved == mm and got["rendezvous"].n_moved == mh
    assert got["mod"].n_docs == len(doc_ids)
    # the operator's point: consistent placement moves ~1/17, mod ~16/17
    assert got["rendezvous"].moved_frac < 0.12
    assert got["mod"].moved_frac > 0.8


def test_bpe_roundtrip_exact(spark):
    row = registry.queries()["bpe_roundtrip_fidelity"](spark, SF).collect()[0]
    assert row.roundtrip_exact is True
    assert row.n_roundtrip_ok == row.n_words > 0
    assert row.n_merged_words > 0  # the learned merges actually apply
    assert row.n_symbols_total >= row.n_words
    assert 0 < row.n_distinct_symbols <= row.n_symbols_total


def test_range_planner_balance(spark):
    rows = sorted(
        registry.queries()["range_partition_planner"](spark, SF).collect(),
        key=lambda r: r.bucket,
    )
    li = read_table(spark, SF, "lineitem")
    n = li.count()
    assert [r.bucket for r in rows] == list(range(8))
    assert sum(r.n_rows for r in rows) == n
    assert rows[0].lo is None and rows[-1].hi is None
    bounds = [r.hi for r in rows[:-1]]
    assert bounds == sorted(bounds)
    for r in rows[1:]:
        assert r.lo is not None
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-4
    # equi-depth target: every bucket within 3x of the ideal eighth
    for r in rows:
        assert r.n_rows < 3 * n / 8
