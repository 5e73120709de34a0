"""Property-based cross-engine parity for the shared hash fragments
(functions/sqlfrag.py vs functions/text.py): random token streams must
hash identically through the Spark expressions and the DuckDB lambdas.
This is the foundation the whole shingle/MinHash oracle family stands on
— if these two ever diverge, every dedup oracle fails at once, so the
property test localizes the blame to the fragment layer.
"""

from __future__ import annotations

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from steam_prices_data_engineering_spark.functions.sqlfrag import (
    sql_shingle_hashes,
    sql_token_hashes,
)
from steam_prices_data_engineering_spark.functions.text import (
    shingle_hash_array,
    token_hash_array,
)

# Tokens shaped like the fixture's: non-empty lowercase ASCII words.
_token = st.text(
    alphabet=st.characters(min_codepoint=ord("a"), max_codepoint=ord("z")),
    min_size=1,
    max_size=12,
)
_doc = st.lists(_token, min_size=1, max_size=30).map(" ".join)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(text=_doc)
def test_token_and_shingle_hashes_match_duckdb(spark, text):
    row = (
        spark.createDataFrame([(text,)], "text string")
        .select(
            token_hash_array(F.col("text")).alias("th"),
        )
        .select(
            "th",
            shingle_hash_array(F.col("th"), 3).alias("sh"),
        )
        .collect()[0]
    )
    duck = duckdb.execute(
        f"SELECT {sql_token_hashes('?')} AS th",
        [text],
    ).fetchone()[0]
    assert list(row.th) == list(duck)
    duck_sh = duckdb.execute(
        f"""WITH t AS (SELECT {sql_token_hashes('?')} AS th)
            SELECT {sql_shingle_hashes('th')} FROM t""",
        [text],
    ).fetchone()[0]
    assert list(row.sh) == list(duck_sh)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    s=st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        max_size=40,
    )
)
def test_md5_hex6_matches_duckdb(spark, s):
    """The uniform-hash primitive behind dp_noisy_release: Spark's
    conv(substr(md5,1,6),16,10) == the oracle's hex digit-sum."""
    from steam_prices_data_engineering_spark.functions.sqlfrag import (
        sql_md5_hex6_to_int,
    )
    from steam_prices_data_engineering_spark.functions.text import (
        md5_hex6_to_int,
    )

    got = (
        spark.createDataFrame([(s,)], "s string")
        .select(md5_hex6_to_int(F.col("s")).alias("h"))
        .collect()[0]
        .h
    )
    duck = duckdb.execute(
        f"WITH t AS (SELECT ? AS s) SELECT {sql_md5_hex6_to_int('s')} FROM t",
        [s],
    ).fetchone()[0]
    assert got == duck


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    s=st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        max_size=40,
    )
)
def test_hex_slice_to_int_matches_duckdb(spark, s):
    """The numeric digest-quarter order behind shard_order_autocorr's
    lag window (r10): the four 8-char md5 slices must parse identically
    in both engines, and their tuple order must equal the lexicographic
    order of the full digest (fixed-width lowercase hex)."""
    import hashlib

    from steam_prices_data_engineering_spark.functions.sqlfrag import (
        sql_hex_slice_to_int,
    )
    from steam_prices_data_engineering_spark.functions.text import (
        hex_slice_to_int,
    )

    digest = hashlib.md5(s.encode()).hexdigest()
    starts = (1, 9, 17, 25)
    row = (
        spark.createDataFrame([(digest,)], "m string")
        .select(
            *[
                hex_slice_to_int(F.col("m"), st_, 8).alias(f"h{k}")
                for k, st_ in enumerate(starts, start=1)
            ]
        )
        .collect()[0]
    )
    duck = duckdb.execute(
        "WITH t AS (SELECT ? AS m) SELECT "
        + ", ".join(sql_hex_slice_to_int("m", st_, 8) for st_ in starts)
        + " FROM t",
        [digest],
    ).fetchone()
    expected = tuple(
        int(digest[st_ - 1 : st_ + 7], 16) for st_ in starts
    )
    assert tuple(row) == expected
    assert tuple(duck) == expected


def test_quality_fragments_null_text_parity(spark):
    """r9 fragment hardening (VERDICT r8 #2): the quality-feature
    fragments must NULL-propagate on NULL text in BOTH engines (this
    session runs legacy size(NULL) = -1, which used to make Spark's
    quality_score(NULL) a finite 0.498 while the DuckDB twin was NULL).
    After functions/text.py:_null_gate, every fragment is NULL for NULL
    text on both sides."""
    from steam_prices_data_engineering_spark.functions.text import (
        avg_token_length,
        distinct_token_ratio,
        quality_score,
        stopword_ratio,
        token_count,
    )

    row = (
        spark.createDataFrame([(None,)], "text string")
        .select(
            token_count(F.col("text")).alias("n"),
            distinct_token_ratio(F.col("text")).alias("div"),
            stopword_ratio(F.col("text")).alias("stop"),
            avg_token_length(F.col("text")).alias("atl"),
            quality_score(F.col("text")).alias("q"),
        )
        .collect()[0]
    )
    assert (row.n, row.div, row.stop, row.atl, row.q) == (
        None,
        None,
        None,
        None,
        None,
    )
    duck = duckdb.execute(
        "SELECT len(string_split(text, ' ')),"
        " CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)"
        "   / len(string_split(text, ' '))"
        " FROM (SELECT CAST(NULL AS VARCHAR) AS text)"
    ).fetchone()
    assert duck == (None, None)


def test_quality_fragments_non_null_unchanged(spark):
    """The NULL gate must be a bit-exact no-op on non-NULL text — the
    0-addend arithmetic cannot perturb any existing oracle value."""
    from steam_prices_data_engineering_spark.functions.text import (
        distinct_token_ratio,
        quality_score,
        stopword_ratio,
        token_count,
    )

    row = (
        spark.createDataFrame(
            [("the quick brown fox the a fox",)], "text string"
        )
        .select(
            token_count(F.col("text")).alias("n"),
            distinct_token_ratio(F.col("text")).alias("div"),
            stopword_ratio(F.col("text")).alias("stop"),
            quality_score(F.col("text")).alias("q"),
        )
        .collect()[0]
    )
    assert row.n == 7
    assert row.div == 5.0 / 7.0
    assert row.stop == 3.0 / 7.0
    assert row.q == 0.5 * (5.0 / 7.0) + 0.3 * (1 - 3.0 / 7.0) + 0.2 * (
        7.0 / 100.0
    )


def test_empty_string_tokenize_agreement_is_pinned(spark):
    """r9 re-probe of the r8 'empty-string tokenize divergence' gotcha:
    on the INSTALLED DuckDB (1.0.0), string_split('', ' ') is [''] (len
    1) — exactly Spark's split('', ' ') — so the engines AGREE on empty
    text and the r8 note overstated the hazard. Pin the agreement so a
    DuckDB upgrade that changes it (newer versions return []) fails
    loudly here instead of as a mystery oracle red."""
    from steam_prices_data_engineering_spark.functions.text import (
        token_count,
    )

    assert duckdb.execute(
        "SELECT len(string_split('', ' '))"
    ).fetchone()[0] == 1
    got = (
        spark.createDataFrame([("",)], "text string")
        .select(token_count(F.col("text")).alias("n"))
        .collect()[0]
        .n
    )
    assert got == 1
