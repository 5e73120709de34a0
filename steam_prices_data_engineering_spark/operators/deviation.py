"""Group-mean-vs-global-mean deviation — the reference's analytical core.

Re-expresses `world_map_transformer.py:104-129` (O26 grouped mean, O27 global
mean, O28 derived deviation columns): per-group avg, the global avg, then
``perc_dif = group/global - 1`` and ``usd_dif = perc_dif * global``
(algebraically ``group - global``; we keep the reference's formula).

Scale design: the global aggregate is computed as a 1-row DataFrame and
broadcast-cross-joined into the grouped result — never a
``Window.partitionBy()`` over nothing, which would funnel every row through a
single task at 100 TB. Two passes over the fact table; both are map-side
partial aggregations with tiny shuffle output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_vs_global_avg(
    df: DataFrame,
    group_col: str,
    value_col: str,
    avg_alias: str = "usd_price",
    global_alias: str = "world_avg",
) -> DataFrame:
    """Returns group_col, avg_alias, perc_dif, usd_dif (un-rounded)."""
    per_group = df.groupBy(group_col).agg(F.avg(value_col).alias(avg_alias))
    global_avg = df.agg(F.avg(value_col).alias(global_alias))
    joined = per_group.crossJoin(F.broadcast(global_avg))
    return (
        joined.withColumn("perc_dif", F.col(avg_alias) / F.col(global_alias) - 1)
        .withColumn("usd_dif", F.col("perc_dif") * F.col(global_alias))
        .drop(global_alias)
    )
