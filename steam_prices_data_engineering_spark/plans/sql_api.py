"""SQL-entry-point surface: the same engine driven through `spark.sql` over
registered temp views — scalar subqueries, HAVING, and IN-subqueries, which
exercise Catalyst's subquery decorrelation. The reference has no SQL layer
(SURVEY.md §3: eager pandas dataflow); this is the Spark-native query
doorway a user of the engine gets for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.rounding import dround_sql as R
from ..sources.tables import read_table
from .registry import register


def _register_views(spark: SparkSession, sf_dir: str, names: list[str]) -> None:
    for name in names:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)


# Scalar subquery: customers whose balance beats the global average —
# Catalyst plans the scalar subquery as a broadcast one-row join.
_SCALAR_SUBQ = f"""
SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_above_avg
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
GROUP BY c_nationkey
"""


@register("sql_scalar_subquery", _SCALAR_SUBQ)
def sql_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """spark.sql + scalar subquery (above-global-average filter). The SQL
    text doubles as its own oracle — both engines parse the same query."""
    _register_views(spark, sf_dir, ["customer"])
    return spark.sql(_SCALAR_SUBQ)


# HAVING + IN-subquery: TPC-H Q18 shape (large-order customers).
# CAST(... AS DOUBLE) because this exact text runs on BOTH engines and
# Spark SQL parses the 10^s literals inside dround_sql as DECIMAL (the
# DataFrame-API dround uses Python float literals and never hits this).
_Q18_SQL = f"""
SELECT o.o_orderkey,
       CAST({R('agg.qty', 2)} AS DOUBLE) AS total_qty,
       CAST({R('o.o_totalprice', 2)} AS DOUBLE) AS o_totalprice
FROM orders o
JOIN (
    SELECT l_orderkey, sum(l_quantity) AS qty
    FROM lineitem
    GROUP BY l_orderkey
    HAVING sum(l_quantity) > 150
) agg ON o.o_orderkey = agg.l_orderkey
ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
LIMIT 20
"""


@register("sql_tpch_q18_large_orders", _Q18_SQL)
def sql_tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape via spark.sql: grouped HAVING over the fact table,
    joined back to orders, top-20. The HAVING aggregation shuffles on
    l_orderkey once; the join back to orders reuses high-cardinality keys
    (sort-merge or shuffled-hash under AQE); top-k is TakeOrderedAndProject."""
    _register_views(spark, sf_dir, ["orders", "lineitem"])
    return spark.sql(_Q18_SQL)


# IN-subquery (decorrelated to a semi join by Catalyst).
_IN_SUBQ_SQL = """
SELECT p_brand, CAST(count(*) AS BIGINT) AS n_parts
FROM part
WHERE p_partkey IN (
    SELECT l_partkey FROM lineitem WHERE l_quantity >= 45
)
GROUP BY p_brand
"""


@register("sql_in_subquery", _IN_SUBQ_SQL)
def sql_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery via spark.sql — Catalyst decorrelates it into a left semi
    join (same physical shape as semi_join_active_customers)."""
    _register_views(spark, sf_dir, ["part", "lineitem"])
    return spark.sql(_IN_SUBQ_SQL)
