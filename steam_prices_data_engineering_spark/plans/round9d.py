"""Round-9d extension tier: incremental view maintenance for JOINS,
prefix-dimension (Matryoshka) retrieval fidelity, and margin-based
parallel-pair mining.

- `ivm_join_delta_merge` — incremental maintenance of a join view: the
  stored view (base ⋈ base) is refreshed by three DELTA-sIZED join
  terms (ΔA⋈B, A⋈ΔB, ΔA⋈ΔB) instead of a full recompute. The oracle
  computes the SAME view with ONE direct full join, so any
  decomposition bug (overlapping or missing quadrants) hash-reds the
  row. This is the join counterpart of `incremental_agg_merge`.
- `matryoshka_prefix_recall` — retrieval fidelity of truncated
  embedding prefixes (Kusupati et al. 2022, Matryoshka Representation
  Learning): top-10 by the full 64-dim score vs top-10 by the first-16
  -dim prefix score, overlap/recall per query. The decision input for
  "can we serve ANN from the 16-dim prefix and re-rank with the tail?"
- `bitext_margin_mining` — margin-scored parallel-pair mining
  (Artetxe & Schwenk 2019, margin-based bitext mining): for a panel of
  source-side vectors, the best target-side candidate is accepted on
  the RATIO margin cos(x,y) / avg-top-k-cos(x,·) rather than raw
  cosine, which suppresses hubness false positives.

No counterpart in the reference (a single-threaded pandas ETL,
/root/reference/Scripts/transformers/steam_prices_transformer.py);
these are the view-maintenance and cross-corpus alignment jobs a
100 TB training-data platform runs on the same engine.

Scale notes (the 100 TB lens):
- IVM: the whole point — maintenance shuffles are sized by the DELTA,
  not the base; the delta order side is broadcast. The base⋈base term
  is recomputed here only so the query is self-contained (in
  production it IS the stored view).
- Both embedding queries score a FIXED panel (16 queries) against the
  corpus: O(16·N) per decade — linear, never N². Ranking happens on
  integer micro-unit scores (floor(dot·1e6 + 0.5) as BIGINT), so no
  float comparison can flip an ordering between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vectors import dot
from ..sources.tables import read_table
from .registry import register

# ---------------------------------------------------------------------------
# Incremental join-view maintenance
# ---------------------------------------------------------------------------

_O_CUT = "2000-01-01"  # orders delta: o_orderdate >= _O_CUT
_L_CUT = "2001-01-01"  # lineitem delta: l_shipdate >= _L_CUT

_IVM_SQL = f"""
WITH j AS (
    SELECT o.o_orderpriority AS priority,
           (o.o_orderdate >= TIMESTAMP '{_O_CUT}') AS od,
           (l.l_shipdate  >= TIMESTAMP '{_L_CUT}') AS ld,
           CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderdate IS NOT NULL AND l.l_shipdate IS NOT NULL
)
SELECT priority,
       CAST(sum(CASE WHEN NOT od AND NOT ld THEN 1 ELSE 0 END) AS BIGINT) AS pairs_bb,
       CAST(sum(CASE WHEN od AND NOT ld THEN 1 ELSE 0 END) AS BIGINT) AS pairs_db,
       CAST(sum(CASE WHEN NOT od AND ld THEN 1 ELSE 0 END) AS BIGINT) AS pairs_bd,
       CAST(sum(CASE WHEN od AND ld THEN 1 ELSE 0 END) AS BIGINT) AS pairs_dd,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(cents) AS BIGINT) AS revenue_cents
FROM j
GROUP BY priority
"""


@register("ivm_join_delta_merge", _IVM_SQL)
def ivm_join_delta_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintain a join view incrementally: base⋈base (the stored view)
    plus the three delta terms ΔO⋈L, O⋈ΔL, ΔO⋈ΔL, merged by a final
    re-aggregation. The oracle recomputes the view with one direct full
    join — the two paths agree only if the quadrant decomposition is
    exactly disjoint and complete. Revenue accumulates in integer cents
    (order-free long sums). NULL dates are excluded in BOTH engines
    (a NULL-date row belongs to no quadrant — Spark's base/delta
    filters would silently drop it while a bare oracle count(*) would
    keep it; the NULL-regeneration lesson applied up front)."""
    o = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").isNotNull())
        .select("o_orderkey", "o_orderpriority", "o_orderdate")
    )
    li = (
        read_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate").isNotNull())
        .select(
            "l_orderkey",
            "l_shipdate",
            F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents"),
        )
    )
    o_cut = F.lit(_O_CUT).cast("timestamp")
    l_cut = F.lit(_L_CUT).cast("timestamp")
    o_base = o.filter(F.col("o_orderdate") < o_cut)
    o_delta = o.filter(F.col("o_orderdate") >= o_cut)
    l_base = li.filter(F.col("l_shipdate") < l_cut)
    l_delta = li.filter(F.col("l_shipdate") >= l_cut)

    def term(os: DataFrame, ls: DataFrame, tag: str) -> DataFrame:
        j = os.join(ls, os.o_orderkey == ls.l_orderkey)
        return j.groupBy(F.col("o_orderpriority").alias("priority")).agg(
            F.count(F.lit(1)).cast("long").alias("pairs"),
            F.sum("cents").cast("long").alias("cents"),
            F.lit(tag).alias("quadrant"),
        )

    # Maintenance terms are delta-sized: broadcast the delta order side.
    merged = (
        term(o_base, l_base, "bb")  # the stored view being refreshed
        .unionByName(term(F.broadcast(o_delta), l_base, "db"))
        .unionByName(term(o_base, l_delta, "bd"))
        .unionByName(term(F.broadcast(o_delta), l_delta, "dd"))
    )

    def q(tag: str) -> F.Column:
        return (
            F.sum(F.when(F.col("quadrant") == tag, F.col("pairs")).otherwise(0))
            .cast("long")
            .alias(f"pairs_{tag}")
        )

    return merged.groupBy("priority").agg(
        q("bb"),
        q("db"),
        q("bd"),
        q("dd"),
        F.sum("pairs").cast("long").alias("n_pairs"),
        F.sum("cents").cast("long").alias("revenue_cents"),
    )


# ---------------------------------------------------------------------------
# Matryoshka prefix-dimension retrieval fidelity
# ---------------------------------------------------------------------------

_MPR_PANEL = 16  # fixed query panel: vec_id < 16 — O(panel x N), linear
_MPR_PREFIX = 16  # score on the first 16 of 64 dims
_MPR_K = 10

_MPR_SQL = f"""
WITH vecs AS (
    SELECT vec_id, embedding::DOUBLE[] AS v
    FROM embeddings
    WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
),
q AS (SELECT vec_id AS qid, v AS qv FROM vecs WHERE vec_id < {_MPR_PANEL}),
scored AS (
    SELECT q.qid, c.vec_id,
           CAST(floor(list_dot_product(c.v, q.qv) * 1000000.0 + 0.5) AS BIGINT) AS full_i,
           CAST(floor(list_dot_product(c.v[1:{_MPR_PREFIX}], q.qv[1:{_MPR_PREFIX}]) * 1000000.0 + 0.5) AS BIGINT) AS pref_i
    FROM vecs c, q
    WHERE c.vec_id <> q.qid
),
ranked AS (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid ORDER BY full_i DESC, vec_id ASC) AS rf,
           row_number() OVER (PARTITION BY qid ORDER BY pref_i DESC, vec_id ASC) AS rp
    FROM scored
)
SELECT qid,
       CAST(sum(CASE WHEN rf <= {_MPR_K} AND rp <= {_MPR_K} THEN 1 ELSE 0 END) AS BIGINT) AS overlap10,
       CAST(sum(CASE WHEN rf <= {_MPR_K} AND rp <= {_MPR_K} THEN 1 ELSE 0 END) AS DOUBLE) / {_MPR_K}.0 AS recall10,
       max(CASE WHEN rf = 1 THEN vec_id END) AS full_top1,
       max(CASE WHEN rp = 1 THEN vec_id END) AS pref_top1
FROM ranked
GROUP BY qid
"""


@register("matryoshka_prefix_recall", _MPR_SQL)
def matryoshka_prefix_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of first-16-dim prefix scoring against full 64-dim
    scoring, per panel query. Scores rank as integer micro-units
    (floor(dot*1e6 + 0.5) as long), so cross-engine float comparison
    cannot flip an ordering; the dot itself is the left-to-right
    double fold both engines share (functions/vectors.py)."""
    e = read_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id").isNotNull() & F.col("embedding").isNotNull()
    )
    vecs = e.select("vec_id", F.col("embedding").alias("v"))
    q = vecs.filter(F.col("vec_id") < _MPR_PANEL).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )

    def micro(c: F.Column) -> F.Column:
        return F.floor(c * F.lit(1e6) + F.lit(0.5)).cast("long")

    scored = (
        vecs.join(F.broadcast(q), vecs.vec_id != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            micro(dot(F.col("v"), F.col("qv"))).alias("full_i"),
            micro(
                dot(
                    F.slice(F.col("v"), 1, _MPR_PREFIX),
                    F.slice(F.col("qv"), 1, _MPR_PREFIX),
                )
            ).alias("pref_i"),
        )
    )
    wf = Window.partitionBy("qid").orderBy(
        F.desc("full_i"), F.asc("vec_id")
    )
    wp = Window.partitionBy("qid").orderBy(
        F.desc("pref_i"), F.asc("vec_id")
    )
    ranked = scored.select(
        "qid",
        "vec_id",
        F.row_number().over(wf).alias("rf"),
        F.row_number().over(wp).alias("rp"),
    )
    both = (F.col("rf") <= _MPR_K) & (F.col("rp") <= _MPR_K)
    return ranked.groupBy("qid").agg(
        F.sum(F.when(both, 1).otherwise(0)).cast("long").alias("overlap10"),
        (
            F.sum(F.when(both, 1).otherwise(0)).cast("double")
            / F.lit(float(_MPR_K))
        ).alias("recall10"),
        F.max(F.when(F.col("rf") == 1, F.col("vec_id"))).alias("full_top1"),
        F.max(F.when(F.col("rp") == 1, F.col("vec_id"))).alias("pref_top1"),
    )


# ---------------------------------------------------------------------------
# Margin-based parallel-pair mining (bitext mining)
# ---------------------------------------------------------------------------

_BMM_K = 4  # neighborhood size for the margin denominator
_BMM_PANEL = 16  # source-side panel: 16 lowest vec_ids of label 0
_BMM_SRC_LABEL = 0
_BMM_TGT_LABEL = 1

_BMM_SQL = f"""
WITH vecs AS (
    SELECT vec_id, label, embedding::DOUBLE[] AS v
    FROM embeddings
    WHERE vec_id IS NOT NULL AND label IS NOT NULL AND embedding IS NOT NULL
),
src AS (
    SELECT vec_id AS sid, v AS sv FROM vecs
    WHERE label = {_BMM_SRC_LABEL} ORDER BY vec_id LIMIT {_BMM_PANEL}
),
tgt AS (SELECT vec_id AS tid, v AS tv FROM vecs WHERE label = {_BMM_TGT_LABEL}),
scored AS (
    SELECT src.sid, tgt.tid,
           CAST(floor(list_dot_product(tgt.tv, src.sv) * 1000000.0 + 0.5) AS BIGINT) AS cos_i
    FROM src, tgt
),
ranked AS (
    SELECT sid, tid, cos_i,
           row_number() OVER (PARTITION BY sid ORDER BY cos_i DESC, tid ASC) AS rn
    FROM scored
),
agg AS (
    SELECT sid,
           max(CASE WHEN rn = 1 THEN tid END) AS best_tid,
           max(CASE WHEN rn = 1 THEN cos_i END) AS best_i,
           CAST(sum(CASE WHEN rn <= {_BMM_K} THEN cos_i ELSE 0 END) AS BIGINT) AS topk_sum_i,
           CAST(sum(CASE WHEN rn <= {_BMM_K} THEN 1 ELSE 0 END) AS BIGINT) AS topk_n
    FROM ranked
    GROUP BY sid
)
SELECT sid, best_tid,
       CAST(best_i AS DOUBLE) / 1000000.0 AS best_cos,
       CAST(topk_sum_i AS DOUBLE) / (CAST(topk_n AS DOUBLE) * 1000000.0) AS avg_topk,
       floor((CAST(best_i AS DOUBLE) * CAST(topk_n AS DOUBLE) / CAST(topk_sum_i AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS margin
FROM agg
"""


@register("bitext_margin_mining", _BMM_SQL)
def bitext_margin_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-scored cross-corpus pair mining: per source-panel vector,
    the best label-1 candidate with the ratio margin
    cos(best) / mean(top-k cos) — raw-cosine hubs score near their own
    neighborhood average and get margin ~1, true pairs stand out. All
    ordering and accumulation happens on integer micro-unit scores
    (order-free long sums), with two double divisions at the end."""
    e = read_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id").isNotNull()
        & F.col("label").isNotNull()
        & F.col("embedding").isNotNull()
    )
    vecs = e.select("vec_id", "label", F.col("embedding").alias("v"))
    src = (
        vecs.filter(F.col("label") == _BMM_SRC_LABEL)
        .orderBy("vec_id")
        .limit(_BMM_PANEL)
        .select(F.col("vec_id").alias("sid"), F.col("v").alias("sv"))
    )
    tgt = vecs.filter(F.col("label") == _BMM_TGT_LABEL).select(
        F.col("vec_id").alias("tid"), F.col("v").alias("tv")
    )
    scored = tgt.crossJoin(F.broadcast(src)).select(
        "sid",
        "tid",
        F.floor(dot(F.col("tv"), F.col("sv")) * F.lit(1e6) + F.lit(0.5))
        .cast("long")
        .alias("cos_i"),
    )
    w = Window.partitionBy("sid").orderBy(F.desc("cos_i"), F.asc("tid"))
    ranked = scored.select(
        "sid", "tid", "cos_i", F.row_number().over(w).alias("rn")
    )
    topk = F.col("rn") <= _BMM_K
    agg = ranked.groupBy("sid").agg(
        F.max(F.when(F.col("rn") == 1, F.col("tid"))).alias("best_tid"),
        F.max(F.when(F.col("rn") == 1, F.col("cos_i"))).alias("best_i"),
        F.sum(F.when(topk, F.col("cos_i")).otherwise(0))
        .cast("long")
        .alias("topk_sum_i"),
        F.sum(F.when(topk, 1).otherwise(0)).cast("long").alias("topk_n"),
    )
    best_d = F.col("best_i").cast("double")
    n_d = F.col("topk_n").cast("double")
    sum_d = F.col("topk_sum_i").cast("double")
    return agg.select(
        "sid",
        "best_tid",
        (best_d / F.lit(1e6)).alias("best_cos"),
        (sum_d / (n_d * F.lit(1e6))).alias("avg_topk"),
        (
            F.floor((best_d * n_d / sum_d) * F.lit(1e6) + F.lit(0.5))
            / F.lit(1e6)
        ).alias("margin"),
    )
