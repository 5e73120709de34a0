"""In-engine linear algebra / classic ML primitives (round-2c): PCA by
relational power iteration and multi-feature OLS by closed-form normal
equations. Both run entirely as DataFrame plans — the "ML on the query
engine" tier that avoids exporting 100 TB to a separate system for
models this small.

Scale design:
- PCA: the covariance matrix is built from ONE pass over the exploded
  (vector, dim, value) table — per-vector (i, j) product pairs feed a
  map-side-combined sum keyed on (i, j), so the shuffle is d^2 cells,
  not N rows. Power iterations are matrix-vector products expressed as
  a join on the shared dim index + a groupBy sum: each iteration moves
  only d^2 + d rows. Three iterations are unrolled statically (same
  discipline as `iterative.py:kmeans_embeddings`'s unrolled oracle).
- OLS: the normal equations' moment matrix (X'X, X'y) is one
  conditional-sum scan emitting 9 monoid columns; the 3x3 solve is
  Cramer's rule in plain arithmetic on a 1-row frame. No iteration, no
  driver loop, bit-identical across engines before rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import dround, dround_sql as R
from ..sources.tables import read_table
from .registry import register

# ---------------------------------------------------------------------------
# PCA top component via power iteration (Mises-Pollaczek 1929; the
# standard big-data PCA when only the leading components are needed).
# Mean-centered covariance C = E[xx'] - mu mu'; v_{k+1} = C v_k / |C v_k|
# from the uniform start vector; 3 unrolled iterations; Rayleigh
# quotient as the eigenvalue estimate.
# ---------------------------------------------------------------------------

_PCA_ITERS = 3


def _pca_sql() -> str:
    # One iteration: w = C v (join on j, sum over i), then normalize.
    def iter_cte(k: int) -> str:
        return f"""
w{k} AS (
    SELECT c.i, sum(c.c * v.x) AS x
    FROM cov c JOIN v{k - 1} v ON c.j = v.i
    GROUP BY c.i
),
n{k} AS (SELECT sqrt(sum(x * x)) AS nrm FROM w{k}),
v{k} AS (SELECT i, x / nrm AS x FROM w{k} CROSS JOIN n{k})"""

    iters = ",".join(iter_cte(k) for k in range(1, _PCA_ITERS + 1))
    last = f"v{_PCA_ITERS}"
    return f"""
WITH ev AS (
    SELECT vec_id, i - 1 AS i, CAST(x AS DOUBLE) AS x
    FROM (SELECT vec_id, unnest(embedding) AS x,
                 generate_subscripts(embedding, 1) AS i
          FROM embeddings)
),
mu AS (SELECT i, avg(x) AS m FROM ev GROUP BY i),
n_ AS (SELECT CAST(count(DISTINCT vec_id) AS DOUBLE) AS n FROM ev),
cov AS (
    SELECT a.i AS i, b.i AS j,
           sum(a.x * b.x) / (SELECT n FROM n_) - ma.m * mb.m AS c
    FROM ev a
    JOIN ev b ON a.vec_id = b.vec_id
    JOIN mu ma ON ma.i = a.i
    JOIN mu mb ON mb.i = b.i
    GROUP BY a.i, b.i, ma.m, mb.m
),
d_ AS (SELECT count(*) AS d FROM mu),
v0 AS (SELECT i, 1.0 / sqrt((SELECT d FROM d_)) AS x FROM mu),
{iters},
ray AS (
    SELECT sum(v.x * c.c * u.x) AS lam
    FROM {last} v JOIN cov c ON c.i = v.i JOIN {last} u ON u.i = c.j
)
SELECT CAST(v.i AS BIGINT) AS dim,
       {R("v.x", 6)} AS loading,
       {R("(SELECT lam FROM ray)", 4)} AS eigenvalue
FROM {last} v
"""


_PCA_SQL = _pca_sql()


@register("pca_power_iteration", _PCA_SQL)
def pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leading principal component of the embedding corpus: relational
    covariance + 3 unrolled power iterations + Rayleigh eigenvalue."""
    emb = read_table(spark, sf_dir, "embeddings")
    ev = emb.select(
        "vec_id", F.posexplode(F.col("embedding").cast("array<double>"))
    ).select("vec_id", F.col("pos").alias("i"), F.col("col").alias("x"))
    ev = ev.cache()
    mu = ev.groupBy("i").agg(F.avg("x").alias("m"))
    n_rows = ev.select("vec_id").distinct().count()
    head = emb.select(F.size("embedding").alias("d")).first()
    # Empty corpus: no dims exist, every downstream frame is empty; any
    # positive d keeps the start-vector literal finite.
    d = head["d"] if head is not None else 1
    n_rows = n_rows or 1
    a = ev.select(F.col("vec_id"), F.col("i"), F.col("x"))
    b = ev.select(
        F.col("vec_id"), F.col("i").alias("j"), F.col("x").alias("xb")
    )
    prod = (
        a.join(b, "vec_id")
        .groupBy("i", "j")
        .agg((F.sum(F.col("x") * F.col("xb")) / F.lit(float(n_rows))).alias("exx"))
    )
    mua = mu.select(F.col("i"), F.col("m").alias("ma"))
    mub = mu.select(F.col("i").alias("j"), F.col("m").alias("mb"))
    cov = (
        prod.join(F.broadcast(mua), "i")
        .join(F.broadcast(mub), "j")
        .select("i", "j", (F.col("exx") - F.col("ma") * F.col("mb")).alias("c"))
        .cache()
    )
    v = mu.select("i", F.lit(1.0 / float(d) ** 0.5).alias("x"))
    for _ in range(_PCA_ITERS):
        w = (
            cov.join(v.select(F.col("i").alias("j"), "x"), "j")
            .groupBy("i")
            .agg(F.sum(F.col("c") * F.col("x")).alias("x"))
        )
        nrm = w.agg(F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("nrm"))
        v = w.crossJoin(F.broadcast(nrm)).select(
            "i", (F.col("x") / F.col("nrm")).alias("x")
        )
    u = v.select(F.col("i").alias("j"), F.col("x").alias("u"))
    ray = (
        v.join(cov, "i")
        .join(u, "j")
        .agg(F.sum(F.col("x") * F.col("c") * F.col("u")).alias("lam"))
    )
    return v.crossJoin(F.broadcast(ray)).select(
        F.col("i").cast("long").alias("dim"),
        dround(F.col("x"), 6).alias("loading"),
        dround(F.col("lam"), 4).alias("eigenvalue"),
    )


# ---------------------------------------------------------------------------
# Multi-feature OLS by normal equations (the closed form every
# in-warehouse regression uses below ~100 features): y = b0 + b1 x1 +
# b2 x2 over lineitem (y = extendedprice, x1 = quantity, x2 = discount).
# X'X and X'y are 9 monoid sums from ONE scan; the 3x3 system solves by
# Cramer's rule; R^2 from the residual identity. `stats_corr_regr_by_flag`
# is the single-feature form — this is the general shape.
# ---------------------------------------------------------------------------

_OLS_SQL = f"""
WITH m AS (
    SELECT CAST(count(*) AS DOUBLE) AS n,
           sum(l_quantity) AS s1, sum(l_discount) AS s2,
           sum(l_quantity * l_quantity) AS s11,
           sum(l_quantity * l_discount) AS s12,
           sum(l_discount * l_discount) AS s22,
           sum(l_extendedprice) AS sy,
           sum(l_quantity * l_extendedprice) AS sy1,
           sum(l_discount * l_extendedprice) AS sy2,
           sum(l_extendedprice * l_extendedprice) AS syy
    FROM lineitem
),
det AS (
    SELECT *,
           n * (s11 * s22 - s12 * s12)
         - s1 * (s1 * s22 - s12 * s2)
         + s2 * (s1 * s12 - s11 * s2) AS dd
    FROM m
),
beta AS (
    SELECT *,
           (sy * (s11 * s22 - s12 * s12)
          - s1 * (sy1 * s22 - s12 * sy2)
          + s2 * (sy1 * s12 - s11 * sy2)) / dd AS b0,
           (n * (sy1 * s22 - sy2 * s12)
          - sy * (s1 * s22 - s12 * s2)
          + s2 * (s1 * sy2 - sy1 * s2)) / dd AS b1,
           (n * (s11 * sy2 - s12 * sy1)
          - s1 * (s1 * sy2 - sy1 * s2)
          + sy * (s1 * s12 - s11 * s2)) / dd AS b2
    FROM det
)
SELECT CAST(n AS BIGINT) AS n_rows,
       {R("b0", 4)} AS beta0, {R("b1", 4)} AS beta1, {R("b2", 4)} AS beta2,
       {R("1 - (syy - b0 * sy - b1 * sy1 - b2 * sy2) / (syy - sy * sy / n)", 6)} AS r2
FROM beta
"""


@register("ols_normal_equations", _OLS_SQL)
def ols_normal_equations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-feature OLS (quantity, discount -> extendedprice): moment
    sums from one scan, Cramer's-rule solve, R^2 from residual algebra."""
    li = read_table(spark, sf_dir, "lineitem")
    x1 = F.col("l_quantity")
    x2 = F.col("l_discount")
    y = F.col("l_extendedprice")
    m = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x1).alias("s1"),
        F.sum(x2).alias("s2"),
        F.sum(x1 * x1).alias("s11"),
        F.sum(x1 * x2).alias("s12"),
        F.sum(x2 * x2).alias("s22"),
        F.sum(y).alias("sy"),
        F.sum(x1 * y).alias("sy1"),
        F.sum(x2 * y).alias("sy2"),
        F.sum(y * y).alias("syy"),
    )
    c = {k: F.col(k) for k in ("n", "s1", "s2", "s11", "s12", "s22", "sy", "sy1", "sy2", "syy")}
    dd = (
        c["n"] * (c["s11"] * c["s22"] - c["s12"] * c["s12"])
        - c["s1"] * (c["s1"] * c["s22"] - c["s12"] * c["s2"])
        + c["s2"] * (c["s1"] * c["s12"] - c["s11"] * c["s2"])
    )
    b0 = (
        c["sy"] * (c["s11"] * c["s22"] - c["s12"] * c["s12"])
        - c["s1"] * (c["sy1"] * c["s22"] - c["s12"] * c["sy2"])
        + c["s2"] * (c["sy1"] * c["s12"] - c["s11"] * c["sy2"])
    ) / dd
    b1 = (
        c["n"] * (c["sy1"] * c["s22"] - c["sy2"] * c["s12"])
        - c["sy"] * (c["s1"] * c["s22"] - c["s12"] * c["s2"])
        + c["s2"] * (c["s1"] * c["sy2"] - c["sy1"] * c["s2"])
    ) / dd
    b2 = (
        c["n"] * (c["s11"] * c["sy2"] - c["s12"] * c["sy1"])
        - c["s1"] * (c["s1"] * c["sy2"] - c["sy1"] * c["s2"])
        + c["sy"] * (c["s1"] * c["s12"] - c["s11"] * c["s2"])
    ) / dd
    r2 = 1 - (c["syy"] - b0 * c["sy"] - b1 * c["sy1"] - b2 * c["sy2"]) / (
        c["syy"] - c["sy"] * c["sy"] / c["n"]
    )
    return m.select(
        F.col("n").cast("long").alias("n_rows"),
        dround(b0, 4).alias("beta0"),
        dround(b1, 4).alias("beta1"),
        dround(b2, 4).alias("beta2"),
        dround(r2, 6).alias("r2"),
    )
