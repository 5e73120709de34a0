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
