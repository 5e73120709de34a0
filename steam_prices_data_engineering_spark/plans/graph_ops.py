"""Graph analytics over the near-dup candidate graph (north-star
extension, SURVEY.md §2b). Complements the iterative algorithms in
`plans/iterative.py` (connected components, PageRank) with the classic
non-iterative one: distributed triangle counting.

Why it belongs in a dedup pipeline: the candidate-pair graph's triangle
density says whether near-dup clusters are tight cliques (template
families — safe to collapse to one survivor) or loose chains (topic
overlap — collapsing loses real data). Pipelines look at exactly this
before choosing an aggressive vs conservative dedup policy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import read_table
from .registry import register

_MIN_SHARED_FPS = 2  # docs sharing >= 2 shingle hashes form an edge
_MAX_POSTING_DF = 50  # drop shingles appearing in more docs (stop-shingles)

# Shared canonical hash fragments (functions/sqlfrag.py) — the triangle
# graph must use the SAME shingle space as the LSH candidate graph it
# analyzes, so the formulas are composed, never inlined.
from ..functions.sqlfrag import sql_shinglehash_ctes as _sql_shinglehash_ctes  # noqa: E402

_TRIANGLE_SQL = f"""
WITH {_sql_shinglehash_ctes()},
fps AS (SELECT doc_id, unnest(hs) AS fp FROM shinglehash),
kept AS (
    SELECT fp FROM fps GROUP BY fp
    HAVING count(*) <= {_MAX_POSTING_DF}
),
capped AS (SELECT f.doc_id, f.fp FROM fps f JOIN kept k ON k.fp = f.fp),
edges AS (
    SELECT a.doc_id AS u, b.doc_id AS v
    FROM capped a JOIN capped b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING count(*) >= {_MIN_SHARED_FPS}
),
tri AS (
    SELECT e1.u AS a, e1.v AS b, e2.v AS c
    FROM edges e1
    JOIN edges e2 ON e2.u = e1.v
    JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
),
tri_member AS (
    SELECT unnest([a, b, c]) AS doc_id FROM tri
),
tri_count AS (
    SELECT doc_id, count(*) AS n_triangles FROM tri_member GROUP BY doc_id
),
degree AS (
    SELECT doc_id, count(*) AS degree FROM (
        SELECT u AS doc_id FROM edges UNION ALL SELECT v FROM edges
    ) GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(d.degree AS BIGINT) AS degree,
       CAST(coalesce(t.n_triangles, 0) AS BIGINT) AS n_triangles
FROM degree d LEFT JOIN tri_count t ON t.doc_id = d.doc_id
"""


@register("graph_neardup_triangles", _TRIANGLE_SQL)
def graph_neardup_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document degree + triangle count in the shared-shingle candidate
    graph (edges: >= 2 shared shingle hashes (_MIN_SHARED_FPS), posting
    lists df-capped at 50 (_MAX_POSTING_DF)).

    Scale shape: the inverted index joins on the shingle hash (never
    all-pairs); the df-cap semi join removes stop-shingle posting lists
    BEFORE the pair join — the standard guard that keeps the quadratic
    per-posting blowup bounded (a shingle shared by 10^6 docs would
    otherwise emit 10^12 pairs). Triangle enumeration is the ordered-edge
    (u<v<w) double join — each edge shuffles by its endpoint keys, the
    textbook distributed triangle count. Per-doc totals are two
    map-side-combined aggregations."""
    from ..operators.dedup import hashed_shingle_table

    d = read_table(spark, sf_dir, "documents")
    # Shared staged+cached shingle index (operators/dedup.py) — same
    # shingle space as the LSH pipeline, and the cache barrier before the
    # explode (Generate over the uncached interpreted chain re-evaluates
    # it per exploded row; measured 50s vs 3s at sf0.1 for this stage).
    hashed = hashed_shingle_table(d)
    fps = hashed.select("doc_id", F.explode("hs").alias("fp"))
    kept = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("df")).filter(
        F.col("df") <= _MAX_POSTING_DF
    )
    capped = fps.join(kept.select("fp"), "fp", "left_semi")
    a = capped.alias("a")
    b = capped.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("u"), F.col("b.doc_id").alias("v"))
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= _MIN_SHARED_FPS)
        .select("u", "v")
        .cache()
    )
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.u") == F.col("e1.v"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")),
        )
        .select(
            F.col("e1.u").alias("ta"),
            F.col("e1.v").alias("tb"),
            F.col("e2.v").alias("tc"),
        )
    )
    tri_count = (
        tri.select(
            F.explode(F.array(F.col("ta"), F.col("tb"), F.col("tc"))).alias(
                "doc_id"
            )
        )
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    degree = (
        edges.select(F.col("u").alias("doc_id"))
        .unionAll(edges.select(F.col("v").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return degree.join(tri_count, "doc_id", "left").select(
        "doc_id",
        F.col("degree").cast("long").alias("degree"),
        F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long").alias(
            "n_triangles"
        ),
    )
