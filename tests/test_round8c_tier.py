"""Round-8c tier semantics: trigram similarity join (python mirror),
Soundex-style phonetic keys (known-word values + cross-engine parity),
Youden-J operating point (python argmax mirror)."""

from __future__ import annotations

from collections import Counter

from steam_prices_data_engineering_spark.plans import registry
from steam_prices_data_engineering_spark.sources.tables import read_table

SF = "/root/testdata/sf0.001"


def _trigrams(s: str) -> set:
    return {s[i : i + 3] for i in range(len(s) - 2)}


def test_trigram_join_matches_python(spark):
    got = {
        (r.name_a, r.name_b): (r.n_shared, r.jaccard)
        for r in registry.queries()["trigram_similarity_join"](
            spark, SF
        ).collect()
    }
    names = sorted(
        {
            r.p_name
            for r in read_table(spark, SF, "part")
            .select("p_name")
            .collect()
            if len(r.p_name) >= 3
        }
    )
    tg = {n: _trigrams(n) for n in names}
    df = Counter(t for n in names for t in tg[n])
    rare = {t for t, c in df.items() if c <= 30}
    pairs = {}
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            if not (tg[a] & tg[b] & rare):
                continue
            shared = len(tg[a] & tg[b])
            j = shared / (len(tg[a]) + len(tg[b]) - shared)
            if j >= 0.4:
                pairs[(a, b)] = (shared, j)
    top = sorted(
        pairs.items(), key=lambda kv: (-kv[1][1], kv[0][0], kv[0][1])
    )[:20]
    assert set(got) == {k for k, _ in top}
    for (a, b), (shared, j) in top:
        gs, gj = got[(a, b)]
        assert gs == shared and abs(gj - j) < 1e-5, (a, b)


def test_soundex_known_words_and_parity(spark):
    """The simplified (h/w-less) Soundex keys of the classic examples,
    identical in BOTH engines."""
    import duckdb
    from pyspark.sql import functions as F

    from steam_prices_data_engineering_spark.plans.round8c import (
        _SDX_SPARK_CODE,
        _SDX_SPARK_COLLAPSE,
        _SDX_SPARK_DIGITS,
        _sdx_sql_expr,
    )

    words = ["robert", "rupert", "ashcraft", "tymczak", "pfister", "a", "key"]
    expect = {
        "robert": "R163",
        "rupert": "R163",
        "ashcraft": "A226",  # the h/w-less variant's known value
        "tymczak": "T522",
        "pfister": "P236",
        "a": "A000",
        "key": "K000",
    }
    df = spark.createDataFrame([(w,) for w in words], "w string")
    sp = {
        r.w: r.code
        for r in df.select("w", F.expr(_SDX_SPARK_DIGITS).alias("dg"))
        .select("w", F.expr(_SDX_SPARK_COLLAPSE).alias("cl"))
        .select("w", F.expr(_SDX_SPARK_CODE).alias("code"))
        .collect()
    }
    assert sp == expect
    arr = ", ".join(f"'{w}'" for w in words)
    du = dict(
        duckdb.connect()
        .execute(
            f"SELECT w, {_sdx_sql_expr('w')} FROM "
            f"(SELECT unnest([{arr}]) AS w)"
        )
        .fetchall()
    )
    assert du == expect


def test_youden_matches_python_argmax(spark):
    row = registry.queries()["youden_threshold_pick"](spark, SF).collect()[0]
    docs = read_table(spark, SF, "documents").select("text").collect()

    def dround(x, s=6):
        import math

        f = float(10**s)
        return math.floor(x * f + 0.5) / f

    scored = []
    for r in docs:
        toks = r.text.split(" ")
        div = len(set(toks)) / len(toks)
        stop = sum(1 for t in toks if t in ("the", "a")) / len(toks)
        s = dround(
            0.5 * div + 0.3 * (1 - stop) + 0.2 * min(len(toks) / 100.0, 1.0)
        )
        scored.append((s, div >= 0.5))
    p = sum(1 for _s, pos in scored if pos)
    n = len(scored) - p
    best = None
    for t in sorted({s for s, _ in scored}):
        tp = sum(1 for s, pos in scored if s >= t and pos)
        fp = sum(1 for s, pos in scored if s >= t and not pos)
        key = (tp * n - fp * p, -t)  # max J (integer form), min threshold
        if best is None or key > best[0]:
            best = (key, t, tp, fp)
    _, t, tp, fp = best
    assert abs(row.threshold - t) < 1e-9
    assert (row.tp, row.fp, row.tn, row.fn) == (tp, fp, n - fp, p - tp)
    assert abs(row.youden_j - (tp / p - fp / n)) < 1e-5


def test_round8_text_queries_null_text_parity(spark, tmp_path):
    """Driver regenerations may carry NULL/degenerate text (the
    shard_order lesson: engines disagree on NULL ordering). Pin
    Spark == DuckDB for the round-8 text queries on a hostile fixture
    with NULL text, empty text, and a NULL doc_id."""
    import duckdb

    from steam_prices_data_engineering_spark.sources.tables import (
        TABLE_SCHEMAS,
    )

    # NOTE empty-string text is OUT of this contract: DuckDB
    # string_split('', ' ') = [] while Spark split('', ' ') = [''], a
    # divergence baked into every shared tokenize fragment; the driver
    # generator emits non-empty word sequences (CLAUDE.md gotcha).
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again", "en", "web", 60),
        (2, None, "en", "web", 0),
        (None, "a a a a the the", "en", "books", 15),
        (97 * 2, "held out eval words " + " ".join(f"e{i}" for i in range(15)), "en", "wiki", 80),
    ]
    spark.createDataFrame(rows, TABLE_SCHEMAS["documents"]).coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    for name in (
        "youden_threshold_pick",
        "decontam_ngram13_eval",
        "soundex_token_blocks",
    ):
        sdf = registry.queries()[name](spark, str(tmp_path))
        srows = sorted(
            tuple(r) for r in sdf.select(sorted(sdf.columns)).collect()
        )
        rel = con.execute(registry.oracle_sql()[name])
        cols = [d[0] for d in rel.description]
        idx = [cols.index(c) for c in sorted(cols)]
        drows = sorted(tuple(r[i] for i in idx) for r in rel.fetchall())
        assert srows == drows, (name, srows, drows)
