"""Round-7 part E: per-quantile sketch-accuracy audit — the q-grid
generalization of `approx_aggregates`' single p50/p95 brackets, run
against an UNBOUNDED-DISTINCT measure (order line revenue), which is
exactly the value class where the production path must live on the
sketch (the exact percentile's value map grows with distinct count —
see operators/ranking.py:exact_quantile_cont notes).

For each q in the grid the query emits the EXACT interpolated value
(reproducible in DuckDB) and a boolean asserting the GK sketch's
deterministic rank guarantee: the number of rows strictly below the
sketch's answer deviates from q*n by at most n/accuracy. The sketch
value itself never appears in the output (not reproducible by an exact
engine) — the approx_aggregates hash-verifiable discipline.

Scale shape: one pass for the sketch array, one for the exact
companion + n, one conditional-sum pass for the five rank counts; the
grid is a 5-row literal. The exact companion exists to make the gate
assertable at test scale; at 100 TB the sketch side runs alone.

No counterpart in the reference (a single-threaded pandas ETL,
/root/reference/Scripts/transformers/steam_prices_transformer.py:1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import dround, dround_sql as R
from ..sources.tables import read_table
from .registry import register

_QSE_QS = (0.1, 0.25, 0.5, 0.75, 0.9)
_QSE_ACC = 10_000

_QSE_SQL = f"""
SELECT CAST(0.1 AS DOUBLE) AS q, CAST(count(*) AS BIGINT) AS n,
       {R(f'quantile_cont(l_extendedprice, 0.1)', 6)} AS exact_value,
       TRUE AS rank_dev_ok
FROM lineitem
UNION ALL
SELECT CAST(0.25 AS DOUBLE) AS q, CAST(count(*) AS BIGINT) AS n,
       {R(f'quantile_cont(l_extendedprice, 0.25)', 6)} AS exact_value,
       TRUE AS rank_dev_ok
FROM lineitem
UNION ALL
SELECT CAST(0.5 AS DOUBLE) AS q, CAST(count(*) AS BIGINT) AS n,
       {R(f'quantile_cont(l_extendedprice, 0.5)', 6)} AS exact_value,
       TRUE AS rank_dev_ok
FROM lineitem
UNION ALL
SELECT CAST(0.75 AS DOUBLE) AS q, CAST(count(*) AS BIGINT) AS n,
       {R(f'quantile_cont(l_extendedprice, 0.75)', 6)} AS exact_value,
       TRUE AS rank_dev_ok
FROM lineitem
UNION ALL
SELECT CAST(0.9 AS DOUBLE) AS q, CAST(count(*) AS BIGINT) AS n,
       {R(f'quantile_cont(l_extendedprice, 0.9)', 6)} AS exact_value,
       TRUE AS rank_dev_ok
FROM lineitem
"""


@register("quantile_sketch_error_eval", _QSE_SQL)
def quantile_sketch_error_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantile companions + GK rank-guarantee booleans for a
    5-point q grid over line revenue."""
    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("x")
    )
    li = li.cache()  # session-per-query (sketch + exact + rank counts)
    qs_arr = "array({})".format(
        ", ".join(f"{q}D" for q in _QSE_QS)
    )
    # exact companions via the bracket-then-exact SELECTION, not the
    # percentile value map: l_extendedprice is ~97% distinct (583k/600k
    # at sf0.1) and the exact-percentile aggregate measured ~9 s here —
    # the precise cost class this query exists to audit.
    from ..operators.ranking import exact_quantiles_cont

    ex = exact_quantiles_cont(li, F.col("x"), _QSE_QS)
    stats = li.agg(
        F.expr(
            f"percentile_approx(x, {qs_arr}, {_QSE_ACC})"
        ).alias("sv"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    counts = li.crossJoin(F.broadcast(stats)).agg(
        *[
            c
            for i in range(len(_QSE_QS))
            for c in (
                F.sum(
                    F.when(F.col("x") < F.col("sv")[i], 1).otherwise(0)
                )
                .cast("double")
                .alias(f"below_{i}"),
                F.sum(
                    F.when(F.col("x") <= F.col("sv")[i], 1).otherwise(0)
                )
                .cast("double")
                .alias(f"le_{i}"),
            )
        ]
    )
    one = stats.crossJoin(F.broadcast(counts))
    rows = None
    for i, q in enumerate(_QSE_QS):
        # GK guarantee: the returned element has SOME rank r with
        # |r - q*n| <= n/accuracy. Its rank interval is
        # [below+1, le] (duplicates widen it), so the guarantee holds
        # iff that interval intersects [q*n - eps, q*n + eps]:
        # below <= q*n + eps AND le >= q*n - eps. Empty input: NULL
        # sketch -> vacuously TRUE (the approx_aggregates coalesce
        # discipline).
        eps = F.col("n") / F.lit(float(_QSE_ACC)) + F.lit(1.0)
        part = one.select(
            F.lit(float(q)).alias("q"),
            F.coalesce(
                (F.col(f"below_{i}") <= F.lit(q) * F.col("n") + eps)
                & (F.col(f"le_{i}") >= F.lit(q) * F.col("n") - eps),
                F.lit(True),
            ).alias("rank_dev_ok"),
        )
        rows = part if rows is None else rows.unionAll(part)
    return ex.join(rows, "q").select(
        "q",
        "n",
        dround(F.col("value"), 6).alias("exact_value"),
        "rank_dev_ok",
    )
