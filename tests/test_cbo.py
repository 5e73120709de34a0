"""Cost-based optimizer readiness: ANALYZE TABLE statistics feed the
planner. At 100 TB, join ordering and broadcast decisions come from
catalog statistics, not file sizes — this pins that the engine's tables
carry stats after ANALYZE and that the CBO consumes them (row counts in
the costed plan), so the deployment recipe (analyze after each landing)
is verified, not folklore.
"""

from __future__ import annotations

import pytest

from steam_prices_data_engineering_spark.sources.tables import read_table

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def stats_tables(spark):
    # The in-memory catalog forgets tables between sessions but their
    # warehouse directories persist; clear them so saveAsTable can't hit
    # LOCATION_ALREADY_EXISTS (same dance as tests/test_bucketing.py).
    import shutil
    from urllib.parse import urlparse

    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for t in ("cbo_nation", "cbo_customer"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    read_table(spark, SF, "nation").write.mode("overwrite").saveAsTable(
        "cbo_nation"
    )
    read_table(spark, SF, "customer").write.mode("overwrite").saveAsTable(
        "cbo_customer"
    )
    spark.sql(
        "ANALYZE TABLE cbo_nation COMPUTE STATISTICS FOR COLUMNS n_nationkey"
    )
    spark.sql(
        "ANALYZE TABLE cbo_customer COMPUTE STATISTICS FOR COLUMNS c_nationkey"
    )
    yield
    spark.sql("DROP TABLE IF EXISTS cbo_nation")
    spark.sql("DROP TABLE IF EXISTS cbo_customer")


def test_analyze_populates_catalog_stats(spark, stats_tables):
    desc = {
        r.col_name: r.data_type
        for r in spark.sql("DESCRIBE TABLE EXTENDED cbo_nation").collect()
    }
    stats = desc.get("Statistics", "")
    assert "rows" in stats, desc
    col = spark.sql(
        "DESCRIBE EXTENDED cbo_nation n_nationkey"
    ).collect()
    info = {r.info_name: r.info_value for r in col}
    assert info.get("distinct_count") not in (None, "NULL"), info


def test_cbo_costed_plan_uses_row_counts(spark, stats_tables):
    try:
        spark.conf.set("spark.sql.cbo.enabled", "true")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
        plan = spark.sql(
            "EXPLAIN COST SELECT n_name, count(*) FROM cbo_customer c "
            "JOIN cbo_nation n ON c.c_nationkey = n.n_nationkey "
            "GROUP BY n_name"
        ).collect()[0][0]
        # The costed optimized plan carries catalog row counts, not just
        # sizeInBytes guesses.
        assert "rowCount=" in plan, plan[:2000]
    finally:
        spark.conf.unset("spark.sql.cbo.enabled")
        spark.conf.unset("spark.sql.cbo.joinReorder.enabled")
