"""Iterative algorithms (driver-coordinated loops over distributed steps):
connected-component dedup clustering and deterministic k-means. The loop
body is always a full DataFrame plan — the driver only checks convergence
(a count) or collects K tiny centroids, never row data.

Connected components is THE missing piece between near-dup pair generation
and actual deduplication: pairs form a graph; each component keeps one
representative (its min doc_id). Min-label propagation converges to a
unique fixpoint, so the result is deterministic and the DuckDB oracle can
verify it with a recursive CTE computing true reachability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import dround
from ..operators.dedup import minhash_lsh_pairs
from ..sources.tables import read_table
from .registry import _NEARDUP_MINHASH_SQL, register

# ---------------------------------------------------------------------------
# Connected components over the MinHash-LSH near-dup pair graph.
# ---------------------------------------------------------------------------

_COMPONENTS_SQL = f"""
WITH RECURSIVE edges AS (
    SELECT doc_id_a, doc_id_b FROM ({_NEARDUP_MINHASH_SQL}) t
),
bidir AS (
    SELECT doc_id_a AS u, doc_id_b AS v FROM edges
    UNION
    SELECT doc_id_b AS u, doc_id_a AS v FROM edges
),
reach(u, label) AS (
    SELECT u, u AS label FROM (SELECT DISTINCT u FROM bidir)
    UNION
    SELECT b.v AS u, r.label FROM reach r JOIN bidir b ON b.u = r.u
)
SELECT u AS doc_id, CAST(min(label) AS BIGINT) AS component
FROM reach GROUP BY u
"""


@register("dedup_connected_components", _COMPONENTS_SQL)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster near-dup pairs into components by min-label propagation; the
    component id (= min doc_id in the cluster) is the kept representative.
    Each iteration is one shuffle join on the edge list; the driver sees
    only the converged/not-converged count. At 100 TB this is the standard
    large-graph CC loop (alternating small-star/large-star variants change
    the constant, not the shape)."""
    d = read_table(spark, sf_dir, "documents")
    edges = minhash_lsh_pairs(d, threshold=0.5).select("doc_id_a", "doc_id_b")
    bidir = (
        edges.select(F.col("doc_id_a").alias("u"), F.col("doc_id_b").alias("v"))
        .union(edges.select(F.col("doc_id_b").alias("u"), F.col("doc_id_a").alias("v")))
        .distinct()
        .persist()
    )
    labels = (
        bidir.select(F.col("u").alias("node")).distinct()
        .withColumn("label", F.col("node"))
    )
    for _ in range(15):
        labels = labels.persist()
        # Candidate new label per node: min of own label and neighbors'.
        neighbor_min = (
            bidir.join(labels, bidir.v == labels.node)
            .groupBy(bidir.u.alias("nu"))
            .agg(F.min("label").alias("nlabel"))
        )
        updated = (
            labels.join(neighbor_min, labels.node == F.col("nu"), "left")
            .select(
                "node",
                "label",
                F.least(
                    F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
                ).alias("new_label"),
            )
            .persist()
        )
        changed = updated.filter(F.col("new_label") != F.col("label")).count()
        labels = updated.select("node", F.col("new_label").alias("label"))
        if changed == 0:
            break
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").cast("long").alias("component")
    )


# ---------------------------------------------------------------------------
# Deterministic k-means over embeddings (rows-only check: iterative, and the
# unrolled SQL equivalent is impractical — the contract's documented
# exemption). Fixed seeds + fixed iteration count => deterministic output.
# ---------------------------------------------------------------------------

_KMEANS_K = 4
_KMEANS_ITERS = 3


@register("kmeans_embeddings", None)
def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means, K=4, 3 iterations, seeds = vec_id < K. Assignment
    is a broadcast argmin over K centroids (narrow map over the corpus);
    the centroid update is posexplode -> groupBy(cluster, dim) avg — one
    shuffle of K*dim partial means per iteration. Only the K x dim centroid
    matrix ever reaches the driver."""
    e = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    centroids = [
        [float(x) for x in r.v]
        for r in e.filter(F.col("vec_id") < _KMEANS_K).orderBy("vec_id").collect()
    ]

    def assign(cents: list[list[float]]) -> DataFrame:
        best_cluster, best_dist = None, None
        for ci, cent in enumerate(cents):
            lit = F.array(*[F.lit(x) for x in cent])
            dist = F.aggregate(
                F.zip_with(F.col("v"), lit, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            if best_cluster is None:
                best_cluster, best_dist = F.lit(ci), dist
            else:
                is_better = dist < best_dist
                best_cluster = F.when(is_better, F.lit(ci)).otherwise(best_cluster)
                best_dist = F.when(is_better, dist).otherwise(best_dist)
        return e.select(
            "vec_id", "v", best_cluster.alias("cluster"), best_dist.alias("dist")
        )

    for _ in range(_KMEANS_ITERS):
        assigned = assign(centroids)
        new_cents = (
            assigned.select("cluster", F.posexplode("v").alias("dim", "val"))
            .groupBy("cluster", "dim")
            .agg(F.avg("val").alias("m"))
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
            .select("cluster", F.col("dm.m").alias("centroid"))
            .orderBy("cluster")
            .collect()
        )
        cents = dict((r.cluster, list(r.centroid)) for r in new_cents)
        centroids = [cents.get(i, centroids[i]) for i in range(_KMEANS_K)]

    final = assign(centroids)
    return final.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        dround(F.sum("dist"), 4).alias("inertia"),
    )
