"""Deeper TPC-H-shaped workload + analytic-window / array / time-series
coverage. The reference has none of these (SURVEY.md §2a "explicitly absent"
list: grouping sets, ranking windows, set ops, distinct agg, ...); they are
part of the complete-engine contract — a user of a batch ETL engine expects
the standard analytic surface, and the 100 TB goal demands the fact-fact
join / conditional-agg / window-frame shapes exercised here.

Every query follows the registry conventions (alias parity, dround on float
aggregates, BIGINT casts on counts, epoch longs for timestamps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import dround, dround_sql as R
from ..sources.tables import read_table, values_frame
from .registry import register

# ===========================================================================
# TPC-H Q4 shape: EXISTS correlated subquery -> left semi fact-fact join.
# (Adapted to the fixture schema: lineitem has no commit/receipt dates, so
# the exists-predicate is "some line shipped after the order date".)
# ===========================================================================

_Q4_SQL = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o.o_orderkey AND l_shipdate > o.o_orderdate
  )
GROUP BY o_orderpriority
"""


@register("tpch_q4_order_priority", _Q4_SQL)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS decorrelated to a LEFT SEMI join between two fact tables.
    At scale this is the one join shape that cannot broadcast — both sides
    shuffle on l_orderkey/o_orderkey and AQE picks SMJ/shuffled-hash; the
    quarter filter on orders is pushed to the parquet scan first."""
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    l = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    matched = o.join(
        l,
        (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return matched.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


# ===========================================================================
# TPC-H Q6 shape: pure scan-filter-aggregate (the pushdown showcase).
# ===========================================================================

_Q6_SQL = f"""
SELECT {R('sum(l_extendedprice * l_discount)', 2)} AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("tpch_q6_revenue_forecast", _Q6_SQL)
def tpch_q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan-heavy filter + single-row aggregate. All four predicates reach
    the parquet scan (PushedFilters), so at 100 TB entire row groups are
    skipped on l_shipdate min/max statistics; no shuffle at all (partial
    aggs reduce to one row)."""
    l = read_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dround(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ===========================================================================
# TPC-H Q10 shape: returned-item revenue per customer, top-20.
# ===========================================================================

_Q10_SQL = f"""
SELECT c_custkey, c_name, n_name,
       {R("sum(l_extendedprice * (1 - l_discount))", 2)} AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


@register("tpch_q10_returned_items", _Q10_SQL)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join (lineitem⋈orders on the shared high-cardinality key)
    + broadcast dims + grouped agg + top-k. The returnflag filter prunes
    lineitem at the scan; top-20 is TakeOrderedAndProject (no global sort)."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = read_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = read_table(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            dround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ===========================================================================
# TPC-H Q12 shape: conditional (CASE-sum) aggregation over a fact-fact join.
# ===========================================================================

_Q12_SQL = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_linestatus
"""


@register("tpch_q12_priority_by_linestatus", _Q12_SQL)
def tpch_q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot-style conditional counts (sum-of-CASE) — the map-side-combinable
    form of a pivot; 2 groups so partial aggregation does all the work."""
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    l = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


# ===========================================================================
# TPC-H Q14 shape: conditional revenue ratio (promo effect).
# ===========================================================================

_Q14_SQL = f"""
SELECT {R("100.0 * sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END) / sum(l_extendedprice * (1 - l_discount))", 6)} AS promo_revenue_pct
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
"""


@register("tpch_q14_promo_revenue", _Q14_SQL)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dim join + two conditional sums folded into one ratio —
    a single pass over the filtered fact scan."""
    l = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    p = read_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            dround(100.0 * F.sum(promo) / F.sum(rev), 6).alias("promo_revenue_pct")
        )
    )


# ===========================================================================
# Analytic windows: lead/lag order gaps and ROWS-frame moving average.
# ===========================================================================

_LEAD_LAG_SQL = """
SELECT o_orderkey,
       CAST(lead(floor(epoch(o_orderdate))) OVER w
            - floor(epoch(o_orderdate)) AS BIGINT) AS next_gap_s,
       CAST(floor(epoch(o_orderdate))
            - lag(floor(epoch(o_orderdate))) OVER w AS BIGINT) AS prev_gap_s
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@register("lead_lag_order_gaps", _LEAD_LAG_SQL)
def lead_lag_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-order gaps per customer via lead/lag (NULL at the partition
    edges). One shuffle on o_custkey; the key is high-cardinality so the
    window parallelizes across executors at scale."""
    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ep = F.col("o_orderdate").cast("long")
    return o.select(
        "o_orderkey",
        (F.lead(ep).over(w) - ep).cast("long").alias("next_gap_s"),
        (ep - F.lag(ep).over(w)).cast("long").alias("prev_gap_s"),
    )


_MOVING_AVG_SQL = f"""
SELECT event_id,
       {R("avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)", 4)} AS mov_avg_3
FROM events
"""


@register("moving_avg_user_value", _MOVING_AVG_SQL)
def moving_avg_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row trailing moving average per user (explicit ROWS frame) —
    the time-series smoothing primitive; event_id tie-break keeps the
    frame deterministic."""
    e = read_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return e.select(
        "event_id", dround(F.avg("value").over(w), 4).alias("mov_avg_3")
    )


# ===========================================================================
# Pivot (wide conditional aggregate) — Spark .pivot vs SQL conditional agg.
# ===========================================================================

_PIVOT_SQL = """
SELECT o_orderstatus,
       CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS urgent,
       CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS high,
       CAST(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS medium,
       CAST(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS notspec,
       CAST(sum(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS low
FROM orders
GROUP BY o_orderstatus
"""

_PIVOT_VALUES = [
    ("1-URGENT", "urgent"),
    ("2-HIGH", "high"),
    ("3-MEDIUM", "medium"),
    ("4-NOT SPECIFIED", "notspec"),
    ("5-LOW", "low"),
]


@register("pivot_status_priority_counts", _PIVOT_SQL)
def pivot_status_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`groupBy().pivot()` with the value list given explicitly — with the
    list provided Spark skips the distinct-values collect job and plans the
    scalable two-phase shape: pre-aggregate on (status, priority), then
    pivot the tiny pre-aggregate (first shuffle carries pre-combined rows,
    second carries ~|status| x |priority| rows)."""
    o = read_table(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", [v for v, _ in _PIVOT_VALUES])
        .count()
    )
    return piv.select(
        "o_orderstatus",
        *[
            F.coalesce(F.col(f"`{v}`"), F.lit(0)).cast("long").alias(alias)
            for v, alias in _PIVOT_VALUES
        ],
    )


# ===========================================================================
# Exact percentiles (interpolated) per group — the exact counterpart of the
# approx_aggregates query; both engines use the (n-1)*p linear interpolation.
# ===========================================================================

_PERCENTILE_SQL = f"""
SELECT l_returnflag,
       {R('quantile_cont(l_quantity, 0.5)', 4)} AS p50_qty,
       {R('quantile_cont(l_extendedprice, 0.9)', 4)} AS p90_price,
       {R('quantile_cont(l_discount, 0.25)', 6)} AS p25_disc
FROM lineitem
GROUP BY l_returnflag
"""


@register("percentile_exact_by_flag", _PERCENTILE_SQL)
def percentile_exact_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per return flag (Spark `percentile`
    == DuckDB `quantile_cont`). Exact percentile materializes per-group
    value lists — fine at 3 groups; at high group cardinality the
    percentile_approx variant (see approx_aggregates) is the scale path."""
    l = read_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        dround(F.percentile("l_quantity", 0.5), 4).alias("p50_qty"),
        dround(F.percentile("l_extendedprice", 0.9), 4).alias("p90_price"),
        dround(F.percentile("l_discount", 0.25), 6).alias("p25_disc"),
    )


# ===========================================================================
# Time-series gap-fill: dense hourly grid (sequence + explode) left-joined
# with observed counts — the hypertable-rollup / resample primitive.
# ===========================================================================

_GAPFILL_SQL = """
WITH b AS (
    SELECT CAST(floor(floor(epoch(ts)) / 3600) * 3600 AS BIGINT) AS h, event_type
    FROM events
),
bounds AS (SELECT min(h) AS lo, max(h) AS hi FROM b),
hours AS (SELECT unnest(range(lo, hi + 3600, 3600)) AS h FROM bounds),
types AS (SELECT DISTINCT event_type FROM events),
counts AS (SELECT h, event_type, count(*) AS n FROM b GROUP BY 1, 2)
SELECT hours.h AS hour_start, types.event_type,
       CAST(coalesce(counts.n, 0) AS BIGINT) AS n_events
FROM hours
CROSS JOIN types
LEFT JOIN counts ON counts.h = hours.h AND counts.event_type = types.event_type
"""


@register("timeseries_hourly_gapfill", _GAPFILL_SQL)
def timeseries_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-filled hourly counts per event type: observed range -> dense
    `sequence` grid (one row, exploded) x type dim, left join actuals.
    The grid side is tiny (hours x types) so it broadcasts; the only real
    work is the pre-aggregation of the fact table."""
    e = read_table(spark, sf_dir, "events")
    b = e.select(
        (F.floor(F.col("ts").cast("long") / 3600) * 3600)
        .cast("long")
        .alias("h"),
        "event_type",
    )
    hours = (
        b.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
        .select(
            F.explode(
                F.sequence(F.col("lo"), F.col("hi"), F.lit(3600).cast("long"))
            ).alias("h")
        )
    )
    types = e.select("event_type").distinct()
    counts = b.groupBy("h", "event_type").agg(F.count(F.lit(1)).alias("n"))
    grid = hours.crossJoin(types)
    return (
        grid.join(
            counts,
            (grid.h == counts.h) & (grid.event_type == counts.event_type),
            "left",
        )
        .select(
            grid.h.alias("hour_start"),
            grid.event_type,
            F.coalesce(counts.n, F.lit(0)).cast("long").alias("n_events"),
        )
    )


# ===========================================================================
# Higher-order array functions over the embedding column (transform /
# filter / aggregate — the expression toolkit every vector op builds on).
# ===========================================================================

_ARRAY_HOF_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT vec_id,
       CAST(len(list_filter(v, x -> x > 0)) AS BIGINT) AS n_pos,
       {R('sqrt(list_dot_product(v, v))', 6)} AS l2_norm,
       {R('list_max(list_transform(v, x -> abs(x)))', 6)} AS max_abs
FROM e
"""


@register("array_higher_order_stats", _ARRAY_HOF_SQL)
def array_higher_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector stats via higher-order functions only (no UDF): filter ->
    size, aggregate (sum-of-squares in array order, so bit-identical to the
    oracle's list_dot_product), transform -> array_max."""
    emb = read_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    sumsq = F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    return emb.select(
        "vec_id",
        F.size(F.filter(v, lambda x: x > 0)).cast("long").alias("n_pos"),
        dround(F.sqrt(sumsq), 6).alias("l2_norm"),
        dround(F.array_max(F.transform(v, lambda x: F.abs(x))), 6).alias("max_abs"),
    )


# ===========================================================================
# Fuzzy string match (levenshtein theta join) — entity-resolution primitive.
# ===========================================================================

_FUZZY_CANDIDATES = [
    "NATION_O",
    "NATOIN_5",
    "NATION-12",
    "NATIN_7",
    "COUNTRY_3",
]

_FUZZY_SQL = f"""
SELECT cand, n_name, CAST(dist AS BIGINT) AS dist
FROM (
    SELECT c.cand, n.n_name, levenshtein(c.cand, n.n_name) AS dist
    FROM (VALUES {", ".join(f"('{c}')" for c in _FUZZY_CANDIDATES)}) c(cand)
    CROSS JOIN nation n
)
WHERE dist <= 2
"""


@register("fuzzy_match_levenshtein", _FUZZY_SQL)
def fuzzy_match_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance theta join of a dirty-name list against the nation dim
    (entity resolution / record linkage). Non-equi, so Spark broadcasts the
    tiny candidate list and streams the dim — at scale the dirty side is the
    fact table and the same plan holds with sides swapped."""
    n = read_table(spark, sf_dir, "nation")
    cands = values_frame(spark, [(c,) for c in _FUZZY_CANDIDATES], ["cand"])
    dist = F.levenshtein(F.col("cand"), F.col("n_name"))
    return (
        n.crossJoin(F.broadcast(cands))
        .select("cand", "n_name", dist.cast("long").alias("dist"))
        .filter(F.col("dist") <= 2)
    )


# ===========================================================================
# GROUPING SETS (explicit, between rollup and cube) via the shared-SQL-text
# doorway — the same string runs on Catalyst and on DuckDB.
# ===========================================================================

_GROUPING_SETS_SQL = f"""
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST({R('sum(o_totalprice)', 2)} AS DOUBLE) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
"""


@register("sql_grouping_sets", _GROUPING_SETS_SQL)
def sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (detail + per-status + grand total in one
    pass) — Spark expands to a single Expand + hash aggregate, i.e. one
    shuffle regardless of how many sets are requested. CAST..AS DOUBLE
    wrapper because this exact text also runs on Spark SQL, which parses
    the dround literals as DECIMAL (same pattern as sql_tpch_q18)."""
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_GROUPING_SETS_SQL)


# ---------------------------------------------------------------------------
# Time-RANGE window frame: trailing 30-minute average per user — the frame
# is defined by the ORDER value (epoch seconds), not a row count, so sparse
# and bursty users both get a true time window. One shuffle on user_id; no
# self-join, no explode-per-minute grid.
# ---------------------------------------------------------------------------

_RANGE_FRAME_SQL = f"""
SELECT user_id, event_id,
       {R("avg(value) OVER (PARTITION BY user_id ORDER BY floor(epoch(ts)) RANGE BETWEEN 1800 PRECEDING AND CURRENT ROW)", 4)} AS trailing_avg
FROM events
"""


@register("timeseries_range_frame_avg", _RANGE_FRAME_SQL)
def timeseries_range_frame_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE BETWEEN over epoch seconds (Spark's rangeBetween needs a
    numeric sort key, so ts casts to long): each row averages the events
    of ITS OWN trailing 30 minutes."""
    e = read_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-1800, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        dround(F.avg("value").over(w), 4).alias("trailing_avg"),
    )
