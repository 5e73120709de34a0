"""Regeneration-proofing for the driver's fixture tables (VERDICT r8 #3).

The driver has twice shipped a regeneration that flipped a physical type
or nullability (events.ts nanos; NULL text). The hazard class for every
md5-keyed oracle is doc_id RENDERING: Spark reads through read_table's
canonical BIGINT cast while the DuckDB oracle reads the RAW view, so a
double-typed doc_id used to render '42.0' oracle-side vs '42' Spark-side
and flip every hash. r9 normalizes the oracle side with
CAST(CAST(doc_id AS BIGINT) AS VARCHAR) (plans/round6c.py:_SOA_KEY_SQL
and the round6/round7/round8 md5-key twins); these tests pin that both
engines now produce identical keys for int32 / int64 / double doc_id
physicals.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from steam_prices_data_engineering_spark.sources.tables import read_table

_DOC_IDS = [0, 1, 7, 42, 100, 123456]
_SOURCES = ["web", "books", "web", "wiki", "books", "web"]


def _write_docs(tmp_path, doc_id_type: pa.DataType) -> str:
    tbl = pa.table(
        {
            "doc_id": pa.array(_DOC_IDS, type=doc_id_type),
            "text": pa.array([f"tok{i} tok{i} alpha" for i in _DOC_IDS]),
            "lang": pa.array(["en"] * len(_DOC_IDS)),
            "source": pa.array(_SOURCES),
            "n_chars": pa.array([15] * len(_DOC_IDS), type=pa.int64()),
        }
    )
    path = str(tmp_path / "documents.parquet")
    pq.write_table(tbl, path)
    return str(tmp_path)


@pytest.mark.parametrize(
    "physical", [pa.int32(), pa.int64(), pa.float64()], ids=str
)
def test_read_table_canonicalizes_doc_id(spark, tmp_path, physical):
    sf_dir = _write_docs(tmp_path, physical)
    df = read_table(spark, sf_dir, "documents")
    assert isinstance(df.schema["doc_id"].dataType, T.LongType)
    assert sorted(r.doc_id for r in df.select("doc_id").collect()) == sorted(
        _DOC_IDS
    )


@pytest.mark.parametrize(
    "physical", [pa.int32(), pa.int64(), pa.float64()], ids=str
)
def test_md5_keys_identical_across_engines_and_physicals(
    spark, tmp_path, physical
):
    """The seeded md5 key both shard-order queries (and the round6/7/8
    md5-key twins) build must be byte-identical between Spark's
    canonical read and the DuckDB oracle's raw-view read, for EVERY
    doc_id physical the driver might regenerate."""
    from steam_prices_data_engineering_spark.plans.round6c import (
        _SOA_KEY_SQL,
    )

    sf_dir = _write_docs(tmp_path, physical)
    d = read_table(spark, sf_dir, "documents")
    got = sorted(
        r.m
        for r in d.select(
            F.md5(
                F.concat_ws(
                    "|", F.lit("shard1"), F.col("doc_id").cast("string")
                )
            ).alias("m")
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    want = sorted(
        r[0]
        for r in con.execute(
            f"SELECT {_SOA_KEY_SQL} FROM documents"
        ).fetchall()
    )
    assert got == want
