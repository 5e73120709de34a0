"""Round-7 part B: training-data valuation via exact KNN-Shapley
(Jia et al. 2019, "Efficient Task-Specific Data Valuation for Nearest
Neighbor Algorithms", VLDB — the closed-form Shapley value of every
training point for a KNN classifier, computable from one sorted
neighbor ranking instead of 2^N coalitions).

For one validation point with label y and the training points sorted by
ascending distance (d_1 <= ... <= d_N, labels y_i):

    s_N = 1[y_N = y] / N
    s_i = s_{i+1} + (1[y_i = y] - 1[y_{i+1} = y]) / max(K, i)

s_i is EXACTLY train point i's Shapley value for the KNN(K) utility on
that validation point; the total value of a train point is its average
over the validation panel. This is the data-valuation readout a
training-data platform uses to price, prune, or debug individual
examples — a different question from channel attribution
(`attribution_shapley`, which values marketing touchpoints in a
journey) and from influence-free selection scores (DSIR, surprisal).

Scale shape: the validation panel is BOUNDED (16 points) and broadcast,
so the distance stage is panel x train narrow rows — never train x
train. The ranking window partitions by validation point; each
partition holds the full train ranking, which is the EXACT algorithm's
requirement — the production scale path truncates the ranking at the
top-M ANN neighbors (Jia et al.'s own truncation: values decay as 1/i
past rank K), plugging `simsearch_*` in as the candidate generator and
leaving this module's suffix-recursion unchanged. The suffix recursion
itself is a rank-ordered window cumsum (both engines sum in rank order,
so the doubles agree bit-for-bit), and the final report is a
deterministic global top-10 (TakeOrderedAndProject, never a full sort).

No counterpart in the reference (a single-threaded pandas ETL,
/root/reference/Scripts/transformers/steam_prices_transformer.py:1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import dround, dround_sql as R
from ..sources.tables import read_table
from .registry import register

_KSV_PANEL = 16  # validation points: vec_id < 16 (deterministic)
_KSV_K = 5
_KSV_TOP = 10

_KNN_SHAPLEY_SQL = f"""
WITH e AS (
    SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings
),
val AS (SELECT vec_id AS val_id, v AS vv, label AS vy FROM e
        WHERE vec_id < {_KSV_PANEL}),
trn AS (SELECT vec_id AS trn_id, v AS tv, label AS ty FROM e
        WHERE vec_id >= {_KSV_PANEL}),
dist AS (
    SELECT val.val_id, val.vy, trn.trn_id, trn.ty,
           {R("list_aggregate(list_transform(range(1, len(trn.tv) + 1),"
              " j -> (trn.tv[j] - val.vv[j]) * (trn.tv[j] - val.vv[j])),"
              " 'sum')", 6)} AS d2
    FROM trn CROSS JOIN val
),
ranked AS (
    SELECT val_id, trn_id,
           CASE WHEN ty = vy THEN 1.0 ELSE 0.0 END AS m,
           row_number() OVER (PARTITION BY val_id
                              ORDER BY d2, trn_id) AS rnk,
           CAST(count(*) OVER (PARTITION BY val_id) AS BIGINT) AS n
    FROM dist
),
terms AS (
    SELECT val_id, trn_id, rnk, n, m,
           lead(m) OVER (PARTITION BY val_id ORDER BY rnk) AS m_next,
           max(CASE WHEN rnk = n THEN m END)
               OVER (PARTITION BY val_id) AS m_last
    FROM ranked
),
svals AS (
    SELECT val_id, trn_id,
           m_last / n
           + sum(CASE WHEN rnk < n
                      THEN (m - m_next) / greatest({_KSV_K}, rnk)
                      ELSE 0.0 END)
             OVER (PARTITION BY val_id ORDER BY rnk DESC
                   ROWS UNBOUNDED PRECEDING) AS s
    FROM terms
),
pertrain AS (
    SELECT trn_id, {R('avg(s)', 6)} AS shapley_value
    FROM svals GROUP BY trn_id
)
SELECT p.trn_id AS vec_id, t.ty AS label, p.shapley_value,
       CAST(row_number() OVER (ORDER BY p.shapley_value DESC, p.trn_id)
            AS BIGINT) AS value_rank
FROM pertrain p JOIN trn t ON t.trn_id = p.trn_id
ORDER BY p.shapley_value DESC, p.trn_id
LIMIT {_KSV_TOP}
"""


@register("knn_shapley_valuation", _KNN_SHAPLEY_SQL)
def knn_shapley_valuation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most valuable training vectors by exact KNN-Shapley
    (K=5) against the 16-point validation panel."""
    from ..functions.vectors import to_double_array

    e = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array(F.col("embedding")).alias("v"), "label"
    )
    val = e.filter(F.col("vec_id") < _KSV_PANEL).select(
        F.col("vec_id").alias("val_id"),
        F.col("v").alias("vv"),
        F.col("label").alias("vy"),
    )
    trn = e.filter(F.col("vec_id") >= _KSV_PANEL).select(
        F.col("vec_id").alias("trn_id"),
        F.col("v").alias("tv"),
        F.col("label").alias("ty"),
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col("tv"), F.col("vv"), lambda a, b: (a - b) * (a - b)
        ),
        F.lit(0.0),
        lambda acc, term: acc + term,
    )
    dist = trn.crossJoin(F.broadcast(val)).select(
        "val_id", "vy", "trn_id", "ty", dround(d2, 6).alias("d2")
    )
    wv = Window.partitionBy("val_id")
    wr = Window.partitionBy("val_id").orderBy("d2", "trn_id")
    ranked = dist.select(
        "val_id",
        "trn_id",
        F.when(F.col("ty") == F.col("vy"), 1.0).otherwise(0.0).alias("m"),
        F.row_number().over(wr).alias("rnk"),
        F.count(F.lit(1)).over(wv).cast("long").alias("n"),
    )
    wrk = Window.partitionBy("val_id").orderBy("rnk")
    terms = ranked.select(
        "val_id",
        "trn_id",
        "rnk",
        "n",
        "m",
        F.lead("m").over(wrk).alias("m_next"),
        F.max(F.when(F.col("rnk") == F.col("n"), F.col("m")))
        .over(wv)
        .alias("m_last"),
    )
    wsuf = (
        Window.partitionBy("val_id")
        .orderBy(F.desc("rnk"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    svals = terms.select(
        "val_id",
        "trn_id",
        (
            F.col("m_last") / F.col("n")
            + F.sum(
                F.when(
                    F.col("rnk") < F.col("n"),
                    (F.col("m") - F.col("m_next"))
                    / F.greatest(F.lit(_KSV_K), F.col("rnk")),
                ).otherwise(0.0)
            ).over(wsuf)
        ).alias("s"),
    )
    pertrain = svals.groupBy("trn_id").agg(
        dround(F.avg("s"), 6).alias("shapley_value")
    )
    top = (
        pertrain.join(trn.select("trn_id", "ty"), "trn_id")
        .orderBy(F.desc("shapley_value"), F.asc("trn_id"))
        .limit(_KSV_TOP)
    )
    w_rank = Window.orderBy(F.desc("shapley_value"), F.asc("trn_id"))
    return top.select(
        F.col("trn_id").alias("vec_id"),
        F.col("ty").alias("label"),
        "shapley_value",
        F.row_number().over(w_rank).cast("long").alias("value_rank"),
    )
