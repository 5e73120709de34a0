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
