"""Embedding similarity search (north-star extension, SURVEY.md §2b).

- topk_cosine: brute-force top-k against one query vector. The query vector
  is a 1-row broadcast; scoring is expression-level double math (see
  functions/vectors.py) so the scan stays in codegen; top-k itself is
  TakeOrderedAndProject (no global sort).
- knn_join: top-k neighbors for EACH of a set of query vectors — broadcast
  the (small) query set, score all pairs, rank with a window partitioned by
  query id. At 100 TB the fact side streams; only the query side must be
  small, which is the standard design point for batch knn scoring.
- lsh_bucket_topk: sign-random-projection LSH prefilter. Hyperplanes are
  deterministic constants (seeded off-line), so bucketing is reproducible in
  SQL; candidates share the query's bucket, exact cosine re-ranks. This is
  the 1000-executor scale path: the bucket join replaces the full scan per
  query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.rounding import dround

from ..functions.vectors import cosine


def group_pairs(
    df: DataFrame, key: str, item: str, ordered: bool = True
) -> DataFrame:
    """Within-group item pairs (columns ia, ib) from posting lists instead
    of a self-join. The alias-self-join shape shuffles the SAME rows TWICE
    (per-side aliases break exchange reuse) into a shuffle join; ONE
    groupBy(key) collects each group's item list and a double explode
    emits the identical pair stream from a single exchange (the r10
    lsh_recall_empirical / neardup_edges rewrite). `ordered=True` emits
    each unordered pair once (ia < ib); False emits both directions
    (ia != ib). Same pair multiset as the join it replaces — PROVIDED
    `key` is non-NULL: an equi-self-join drops NULL keys, but groupBy
    treats NULL as one group and would emit pairs among NULL-keyed rows.
    Callers with a nullable key must filter isNotNull first (all current
    callers key on non-null l_orderkey / notNull-filtered fingerprints /
    shingle hashes). Group sizes must be bounded (basket width, df-capped
    posting lists) — the explode is quadratic per group."""
    posts = df.groupBy(key).agg(F.collect_list(item).alias("__ps"))
    cond = (
        F.col("ia") < F.col("ib") if ordered else F.col("ia") != F.col("ib")
    )
    return (
        posts.select(F.explode("__ps").alias("ia"), "__ps")
        .select("ia", F.explode("__ps").alias("ib"))
        .filter(cond)
    )


def topk_cosine(
    embeddings: DataFrame, query_vec: DataFrame, k: int = 10
) -> DataFrame:
    """Top-k rows of `embeddings` by cosine to the single row of `query_vec`
    (columns: q_vec array<float>). Deterministic tiebreak on vec_id."""
    scored = embeddings.crossJoin(F.broadcast(query_vec)).withColumn(
        "score", dround(cosine(F.col("embedding"), F.col("q_vec")), 6)
    )
    return (
        scored.orderBy(F.desc("score"), F.asc("vec_id"))
        .select("vec_id", "label", "score")
        .limit(k)
    )


def knn_join(
    embeddings: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """For each row in `queries` (q_id, q_vec), the k nearest embeddings by
    cosine. `queries` must be broadcast-small (the usual knn-scoring shape)."""
    pairs = embeddings.crossJoin(F.broadcast(queries))
    scored = pairs.withColumn(
        "score", dround(cosine(F.col("embedding"), F.col("q_vec")), 6)
    ).filter(F.col("vec_id") != F.col("q_id"))
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "vec_id", "score", "rnk")
    )
