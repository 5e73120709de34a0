"""End-to-end: every registry query runs at sf0.001 and matches its DuckDB
oracle (the same comparison the driver performs at sf0.01)."""

from __future__ import annotations

import duckdb
import pytest

from steam_prices_data_engineering_spark.plans import registry

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.check_oracle import TABLES, compare  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


ALL = sorted(registry.queries())


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, duck, name):
    fn = registry.queries()[name]
    df = fn(spark, SF_DIR)
    oracles = registry.oracle_sql()
    if name not in oracles:
        assert df.count() >= 0  # rows-only contract
        return
    rel = duck.execute(oracles[name])
    cols = [d[0] for d in rel.description]
    rows = rel.fetchall()
    err = compare(name, df, rows, cols)
    assert err is None, f"{name}: {err}"


def test_entry_smoke(spark):
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) == 25
    assert set(df.columns) == {"n_name", "usd_price", "perc_dif", "usd_dif"}
    assert set(entrymod.queries()) >= set(entrymod.oracle_sql())
