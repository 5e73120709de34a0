"""Round-10 extension tier: the online dedup-index query path and the
IVF-PQ operating curve (VERDICT r9 Next-round #4 and #5), plus layout
and quality-gate design tables.

- `dedup_membership_probe` — the ONLINE query path the LSM-style index
  maintenance exists to serve: probe a batch of incoming docs against
  the LIVE (compacted) MinHash band index — base minus tombstones plus
  delta — and return per-probe index-hit accounting plus the verified
  best match. Composes `dedup_incremental_delta`'s band probing with
  `dedup_index_compaction`'s live/tombstone split; the probe side is
  broadcast (plan-pinned) because an ingest batch is bounded while the
  index is the corpus.
- `ivf_pq_nprobe_curve` — recall@10 and scanned-fraction at
  nprobe in {1, 2, 4, 8} from ONE landed cell/PQ build: the design
  table you read BEFORE picking nprobe for a 100 TB deployment
  (sibling of `lsh_parameter_curve`). Ground truth is the exact
  L2 top-10 on true floats; every candidate is ADC-scored once with
  its cell's probe rank, and each curve point filters that one scored
  set — the cells/codes/LUT stages each run a single fact pass.

No counterpart in the reference (a single-threaded pandas ETL,
/root/reference/Scripts/transformers/steam_prices_transformer.py);
these are the serving-path and index-tuning surfaces of the dedup/ANN
stack.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import dround, dround_sql as R
from ..sources.tables import read_table
from .registry import register

# ---------------------------------------------------------------------------
# Online near-dup membership probe against the compacted band index
# ---------------------------------------------------------------------------

# Roles reuse the knuth bucket split shared with dedup_incremental_delta
# (delta = buckets 8-9) and dedup_index_compaction (tombstones = bucket
# 0 inside the base 0-7). AFTER compaction the live index is buckets
# 1-9; the probe batch is the tombstoned bucket-0 docs re-submitted by a
# new crawl — exactly the "is tonight's incoming doc already in the
# index?" serving question, and it exercises the tombstone semantics:
# a probe doc's own dropped entries must NOT answer the probe.
_PROBE_TAU = 0.5  # same verify threshold as dedup_incremental_delta


def _probe_sql() -> str:
    from ..functions.sqlfrag import (
        sql_exact_jaccard,
        sql_minhash_sig_band_ctes,
    )
    from .trainset import knuth_sql

    bucket = f"({knuth_sql()} % 10)"
    return f"""
WITH {sql_minhash_sig_band_ctes()},
roles AS (SELECT doc_id, {bucket} AS bk FROM documents),
probe_ids AS (SELECT doc_id FROM roles WHERE bk = 0),
live_ids AS (SELECT doc_id FROM roles WHERE bk >= 1),
probe_bands AS (
    SELECT b.doc_id, b.band_idx, b.band_key
    FROM banded b SEMI JOIN probe_ids p ON p.doc_id = b.doc_id
),
live_bands AS (
    SELECT b.doc_id, b.band_idx, b.band_key
    FROM banded b SEMI JOIN live_ids l ON l.doc_id = b.doc_id
),
hits AS (
    SELECT DISTINCT p.doc_id AS probe_doc, l.doc_id AS live_doc
    FROM probe_bands p
    JOIN live_bands l
      ON l.band_idx = p.band_idx AND l.band_key = p.band_key
),
scored AS (
    SELECT h.probe_doc, h.live_doc,
           {R(sql_exact_jaccard("sa.hs", "sb.hs"), 6)} AS j
    FROM hits h
    JOIN shinglehash sa ON sa.doc_id = h.probe_doc
    JOIN shinglehash sb ON sb.doc_id = h.live_doc
),
hitagg AS (
    SELECT probe_doc, CAST(count(*) AS BIGINT) AS n_band_hits
    FROM hits GROUP BY probe_doc
),
ver AS (
    SELECT probe_doc, live_doc, j FROM scored
    WHERE j >= CAST({_PROBE_TAU} AS DOUBLE)
),
vagg AS (
    SELECT probe_doc, CAST(count(*) AS BIGINT) AS n_verified,
           max(j) AS best_jaccard
    FROM ver GROUP BY probe_doc
),
best AS (
    SELECT v.probe_doc,
           CAST(min(ver.live_doc) AS BIGINT) AS best_match
    FROM vagg v
    JOIN ver ON ver.probe_doc = v.probe_doc AND ver.j = v.best_jaccard
    GROUP BY v.probe_doc
)
SELECT CAST(CAST(h.probe_doc AS BIGINT) AS BIGINT) AS probe_doc,
       h.n_band_hits,
       CAST(coalesce(v.n_verified, 0) AS BIGINT) AS n_verified,
       b.best_match,
       v.best_jaccard
FROM hitagg h
LEFT JOIN vagg v ON v.probe_doc = h.probe_doc
LEFT JOIN best b ON b.probe_doc = h.probe_doc
"""


@register("dedup_membership_probe", _probe_sql())
def dedup_membership_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per incoming probe doc (the tombstoned bucket re-submitted):
    distinct live index docs sharing >= 1 band bucket (n_band_hits),
    how many verify at Jaccard >= 0.5 (n_verified), and the verified
    best match (max rounded jaccard, min doc_id tie-break — the
    two-phase keeper discipline). Tombstoned entries are OUT of the
    index, so a probe can never be answered by its own dead entry.
    Cost: |probe bands| x bucket occupancy, never |corpus|^2 — the
    probe side is an ingest batch and rides a broadcast join."""
    from ..operators.dedup import (
        _jaccard,
        hashed_shingle_table,
        minhash_banded,
        minhash_sig_table,
    )
    from .trainset import knuth_hash

    d = read_table(spark, sf_dir, "documents")
    roles = d.select("doc_id", (knuth_hash() % 10).alias("bk"))
    probe_ids = roles.filter(F.col("bk") == 0).select("doc_id")
    live_ids = roles.filter(F.col("bk") >= 1).select("doc_id")
    hashed = hashed_shingle_table(d)
    banded = minhash_banded(minhash_sig_table(hashed))
    probe_bands = banded.join(probe_ids, "doc_id", "left_semi").select(
        F.col("doc_id").alias("probe_doc"), "band_idx", "band_key"
    )
    live_bands = banded.join(live_ids, "doc_id", "left_semi").select(
        F.col("doc_id").alias("live_doc"), "band_idx", "band_key"
    )
    hits = (
        live_bands.join(
            F.broadcast(probe_bands), ["band_idx", "band_key"]
        )
        .select("probe_doc", "live_doc")
        .distinct()
    ).cache()  # session-per-query (hit census + verify + argmax)
    hitagg = hits.groupBy("probe_doc").agg(
        F.count(F.lit(1)).cast("long").alias("n_band_hits")
    )
    sh_p = hashed.select(
        F.col("doc_id").alias("probe_doc"), F.col("hs").alias("hs_p")
    )
    sh_l = hashed.select(
        F.col("doc_id").alias("live_doc"), F.col("hs").alias("hs_l")
    )
    ver = (
        hits.join(sh_p, "probe_doc")
        .join(sh_l, "live_doc")
        .select(
            "probe_doc",
            "live_doc",
            dround(_jaccard(F.col("hs_p"), F.col("hs_l")), 6).alias("j"),
        )
        .filter(F.col("j") >= _PROBE_TAU)
    ).cache()  # session-per-query (agg + argmax re-join)
    vagg = ver.groupBy("probe_doc").agg(
        F.count(F.lit(1)).cast("long").alias("n_verified"),
        F.max("j").alias("best_jaccard"),
    )
    best = (
        vagg.select("probe_doc", "best_jaccard")
        .join(
            ver.select("probe_doc", "live_doc", F.col("j").alias("best_jaccard")),
            ["probe_doc", "best_jaccard"],
        )
        .groupBy("probe_doc")
        .agg(F.min("live_doc").cast("long").alias("best_match"))
    )
    return (
        hitagg.join(vagg, "probe_doc", "left")
        .join(best, "probe_doc", "left")
        .select(
            F.col("probe_doc").cast("long").alias("probe_doc"),
            "n_band_hits",
            F.coalesce(F.col("n_verified"), F.lit(0))
            .cast("long")
            .alias("n_verified"),
            "best_match",
            "best_jaccard",
        )
    )


# ---------------------------------------------------------------------------
# IVF-PQ nprobe operating curve
# ---------------------------------------------------------------------------

_NPROBE_LEVELS = (1, 2, 4, 8)
_CURVE_TOPK = 10


def _nprobe_curve_sql() -> str:
    from .ann_pq import _IVFPQ_COS, _IVFPQ_K, _PQ_PIPELINE_CTES

    levels = ", ".join(f"({v})" for v in _NPROBE_LEVELS)
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
seeds AS (SELECT vec_id AS seed_id, v AS sv FROM e WHERE vec_id < {_IVFPQ_K}),
assign AS (
    SELECT e.vec_id, s.seed_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_IVFPQ_COS} DESC, s.seed_id ASC) AS rn
    FROM e CROSS JOIN seeds s
),
cells AS (SELECT vec_id, seed_id AS cell FROM assign WHERE rn = 1),
probe AS (
    SELECT seed_id AS cell, rn AS probe_rank
    FROM assign WHERE vec_id = 0 AND rn <= {max(_NPROBE_LEVELS)}
),
{_PQ_PIPELINE_CTES},
cand AS (
    SELECT c.vec_id, p.probe_rank, c.sub, c.code
    FROM codes c
    JOIN cells cl ON cl.vec_id = c.vec_id
    JOIN probe p ON p.cell = cl.cell
    WHERE c.vec_id <> 0
),
adc AS (
    SELECT c.vec_id, any_value(c.probe_rank) AS probe_rank,
           {R('sum(l.qd)', 6)} AS adc_dist
    FROM cand c JOIN lut l ON l.sub = c.sub AND l.code = c.code
    GROUP BY c.vec_id
),
truth AS (
    SELECT e.vec_id
    FROM e CROSS JOIN (SELECT v AS qv FROM e WHERE vec_id = 0) q
    WHERE e.vec_id <> 0
    ORDER BY list_sum(list_transform(range(1, len(e.v) + 1),
                      i -> (e.v[i] - q.qv[i]) * (e.v[i] - q.qv[i]))),
             e.vec_id
    LIMIT {_CURVE_TOPK}
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_corpus FROM e WHERE vec_id <> 0),
lv AS (SELECT * FROM (VALUES {levels}) t(nprobe)),
ranked AS (
    SELECT lv.nprobe, a.vec_id,
           row_number() OVER (PARTITION BY lv.nprobe
                              ORDER BY a.adc_dist, a.vec_id) AS rk
    FROM lv JOIN adc a ON a.probe_rank <= lv.nprobe
),
curve AS (
    SELECT r.nprobe,
           CAST(sum(CASE WHEN t.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS adc_hits
    FROM ranked r LEFT JOIN truth t ON t.vec_id = r.vec_id
    WHERE r.rk <= {_CURVE_TOPK}
    GROUP BY r.nprobe
),
scanned AS (
    SELECT lv.nprobe,
           CAST(count(*) AS BIGINT) AS n_scanned,
           CAST(sum(CASE WHEN t.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS cand_hits
    FROM lv JOIN adc a ON a.probe_rank <= lv.nprobe
    LEFT JOIN truth t ON t.vec_id = a.vec_id
    GROUP BY lv.nprobe
)
SELECT CAST(c.nprobe AS BIGINT) AS nprobe,
       s.n_scanned,
       {R('CAST(s.n_scanned AS DOUBLE) / n.n_corpus', 6)} AS scan_frac,
       s.cand_hits,
       {R(f'CAST(s.cand_hits AS DOUBLE) / {_CURVE_TOPK}', 6)}
           AS cand_recall_at_10,
       c.adc_hits,
       {R(f'CAST(c.adc_hits AS DOUBLE) / {_CURVE_TOPK}', 6)}
           AS adc_recall_at_10
FROM curve c JOIN scanned s ON s.nprobe = c.nprobe CROSS JOIN n
"""


@register("ivf_pq_nprobe_curve", _nprobe_curve_sql())
def ivf_pq_nprobe_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 vs scanned-fraction at nprobe in {1,2,4,8} from ONE
    landed IVF/PQ build: cells, codes and the query LUT each run a
    single fact pass; every candidate in the widest probe set is
    ADC-scored ONCE carrying its cell's probe rank, and each curve
    point filters that scored set (candidate sets nest as nprobe
    grows). Ground truth = exact L2 top-10 on true floats. The design
    table read before picking nprobe at 100 TB — at production scale
    this eval runs over a query/corpus sample, the operators are the
    landed index's own."""
    from ..functions.vectors import cosine
    from .ann_pq import (
        _IVFPQ_K,
        _pq_cents,
        _pq_codes,
        _pq_lut,
        _pq_parts,
    )

    e = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    seeds = e.filter(F.col("vec_id") < _IVFPQ_K).select(
        F.col("vec_id").alias("seed_id"), F.col("v").alias("sv")
    )
    w_cell = Window.partitionBy("vec_id").orderBy(
        F.desc("seed_cos"), F.asc("seed_id")
    )
    nprobe_max = max(_NPROBE_LEVELS)
    assign = (
        e.crossJoin(F.broadcast(seeds))
        .withColumn("seed_cos", cosine(F.col("v"), F.col("sv")))
        .withColumn("rn", F.row_number().over(w_cell))
        .filter(F.col("rn") <= nprobe_max)
        .select("vec_id", "seed_id", "rn")
    ).cache()  # session-per-query (cells + probe read the same argsort)
    cells = assign.filter(F.col("rn") == 1).select(
        "vec_id", F.col("seed_id").alias("cell")
    )
    probe = assign.filter(F.col("vec_id") == 0).select(
        F.col("seed_id").alias("cell"), F.col("rn").alias("probe_rank")
    )

    parts = _pq_parts(e)
    cents = _pq_cents(parts)
    codes = _pq_codes(parts, cents)
    lut = _pq_lut(parts, cents)
    cand = (
        codes.filter(F.col("vec_id") != 0)
        .join(cells, "vec_id")
        .join(F.broadcast(probe), "cell")
    )
    adc = (
        cand.join(F.broadcast(lut), ["sub", "code"])
        .groupBy("vec_id")
        .agg(
            F.first("probe_rank").alias("probe_rank"),
            dround(F.sum("qd"), 6).alias("adc_dist"),
        )
    ).cache()  # session-per-query (materialized once; the fused curve
    # pass replicates each scored row per surviving level — without the
    # cache the 4-way replication join re-scans the PQ scoring subtree)

    # exact L2 ground truth on true floats (order == cosine order on
    # unit-norm vectors, but L2 matches the ADC metric)
    q = e.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    l2 = F.aggregate(
        F.zip_with(
            F.col("v"), F.col("qv"), lambda a, b: (a - b) * (a - b)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    truth_frame = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", l2.alias("d2"))
        .orderBy("d2", "vec_id")
        .limit(_CURVE_TOPK)
        .select("vec_id")
    )
    # the truth top-10 is referenced by all 8 hit counters below — a
    # TakeOrdered chain re-executes once PER REFERENCE (CLAUDE.md);
    # collect the 10-row result and re-inject as a local relation
    truth = spark.createDataFrame(
        truth_frame.collect(), truth_frame.schema
    )
    n_corpus = e.filter(F.col("vec_id") != 0).count()

    # ALL curve points in ONE pass (was: 4 levels x 3 single-row jobs +
    # 8 crossJoin chains = 12 tiny jobs of pure scheduling overhead over
    # the same cached frame). Mirror of the oracle's ranked/curve CTEs:
    # replicate each scored candidate once per level it survives
    # (probe_rank <= nprobe; candidate sets nest), rank within the level
    # by (adc_dist, vec_id) — the exact TakeOrdered tie-break the
    # per-level loop used — and reduce every counter in one groupBy.
    lv = spark.sql(
        "SELECT * FROM VALUES "
        + ", ".join(f"({v})" for v in _NPROBE_LEVELS)
        + " AS lv(nprobe)"
    )
    flagged = adc.join(
        F.broadcast(truth.withColumn("hit", F.lit(1))), "vec_id", "left"
    )
    at = flagged.join(
        F.broadcast(lv), F.col("probe_rank") <= F.col("nprobe")
    )
    w_lvl = Window.partitionBy("nprobe").orderBy("adc_dist", "vec_id")
    ranked = at.withColumn("rk", F.row_number().over(w_lvl))
    per_level = ranked.groupBy("nprobe").agg(
        F.count(F.lit(1)).cast("long").alias("n_scanned"),
        F.sum(F.coalesce(F.col("hit"), F.lit(0)))
        .cast("long")
        .alias("cand_hits"),
        F.sum(
            F.when(
                F.col("rk") <= _CURVE_TOPK,
                F.coalesce(F.col("hit"), F.lit(0)),
            ).otherwise(0)
        )
        .cast("long")
        .alias("adc_hits"),
    )
    return per_level.select(
        F.col("nprobe").cast("long").alias("nprobe"),
        "n_scanned",
        dround(
            F.col("n_scanned").cast("double") / F.lit(float(n_corpus)), 6
        ).alias("scan_frac"),
        "cand_hits",
        dround(
            F.col("cand_hits").cast("double") / F.lit(float(_CURVE_TOPK)), 6
        ).alias("cand_recall_at_10"),
        "adc_hits",
        dround(
            F.col("adc_hits").cast("double") / F.lit(float(_CURVE_TOPK)), 6
        ).alias("adc_recall_at_10"),
    )


# ---------------------------------------------------------------------------
# Physical-layout design table: z-order vs linear sort for a 2-D probe
# ---------------------------------------------------------------------------

# The decision `zorder_cell_stats` (key arithmetic) and
# `zonemap_pruning_audit` (1-D zone maps) feed into: given a range
# predicate on BOTH (l_partkey, l_suppkey), how many range-partitioned
# files does each layout let the scanner SKIP via footer min/max stats?
# Files are modeled as range buckets of the layout's sort key (the
# repartitionByRange write pattern pinned in tests/test_sinks.py) — no
# actual rewrite, so both engines replay the bucketing exactly.
_LAYOUT_FILES = 64
_Z_FILE_SHIFT = 24 - 6  # 2^24 z-space / 64 files = 2^18 per file
# probe: the middle ~10% band of each dimension
_Q_LO_FRAC = 0.45
_Q_HI_FRAC = 0.55


def _layout_sql() -> str:
    from .sources_extra import sql_zinterleave, sql_znorm

    pred = (
        "(l_partkey BETWEEN qa_lo AND qa_hi "
        "AND l_suppkey BETWEEN qb_lo AND qb_hi)"
    )
    per_layout = """
    SELECT '{name}' AS layout,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(CASE WHEN scan THEN 1 ELSE 0 END) AS BIGINT)
               AS files_scanned,
           CAST(sum(CASE WHEN scan THEN n_rows ELSE 0 END) AS BIGINT)
               AS rows_scanned,
           CAST(sum(n_match) AS BIGINT) AS rows_matched
    FROM (
        SELECT {file} AS f,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN {pred} THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_match,
               NOT (max(l_partkey) < any_value(qa_lo)
                    OR min(l_partkey) > any_value(qa_hi)
                    OR max(l_suppkey) < any_value(qb_lo)
                    OR min(l_suppkey) > any_value(qb_hi)) AS scan
        FROM rws GROUP BY 1
    )
    """
    linear_file = (
        f"CAST(floor((CAST(l_partkey - mn_a AS DOUBLE)) "
        f"* {_LAYOUT_FILES} / (mx_a - mn_a + 1)) AS BIGINT)"
    )
    z_file = f"(zkey // {1 << _Z_FILE_SHIFT})"
    return f"""
WITH li AS (
    SELECT l_partkey, l_suppkey FROM lineitem
    WHERE l_partkey IS NOT NULL AND l_suppkey IS NOT NULL
),
mm AS (
    SELECT CAST(min(l_partkey) AS BIGINT) AS mn_a,
           CAST(max(l_partkey) AS BIGINT) AS mx_a,
           CAST(min(l_suppkey) AS BIGINT) AS mn_b,
           CAST(max(l_suppkey) AS BIGINT) AS mx_b
    FROM li
),
q AS (
    SELECT mn_a, mx_a, mn_b, mx_b,
           mn_a + CAST(floor((mx_a - mn_a) * {_Q_LO_FRAC}) AS BIGINT)
               AS qa_lo,
           mn_a + CAST(floor((mx_a - mn_a) * {_Q_HI_FRAC}) AS BIGINT)
               AS qa_hi,
           mn_b + CAST(floor((mx_b - mn_b) * {_Q_LO_FRAC}) AS BIGINT)
               AS qb_lo,
           mn_b + CAST(floor((mx_b - mn_b) * {_Q_HI_FRAC}) AS BIGINT)
               AS qb_hi
    FROM mm
),
rws AS MATERIALIZED (
    SELECT li.l_partkey, li.l_suppkey, q.*,
           CAST({sql_zinterleave('na', 'nb')} AS BIGINT) AS zkey
    FROM (
        SELECT l_partkey, l_suppkey,
               {sql_znorm('l_partkey', 'CAST(mn_a AS DOUBLE)',
                          'CAST(mx_a AS DOUBLE)')} AS na,
               {sql_znorm('l_suppkey', 'CAST(mn_b AS DOUBLE)',
                          'CAST(mx_b AS DOUBLE)')} AS nb
        FROM li CROSS JOIN q
    ) li CROSS JOIN q
),
agg AS (
    {per_layout.format(name='linear', file=linear_file, pred=pred)}
    UNION ALL
    {per_layout.format(name='zorder', file=z_file, pred=pred)}
)
SELECT layout, n_files, files_scanned, rows_scanned, rows_matched,
       {R('1.0 - CAST(files_scanned AS DOUBLE) / n_files', 6)}
           AS prune_frac,
       {R('CAST(rows_scanned AS DOUBLE) / greatest(rows_matched, 1)', 4)}
           AS scan_amplification
FROM agg
"""


@register("layout_zorder_vs_linear_eval", _layout_sql())
def layout_zorder_vs_linear_eval(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Footer-stats prunability of a 2-D range probe (the middle ~10%
    band of BOTH l_partkey and l_suppkey) under two modeled layouts of
    the same 64-file landing: range-partitioned by l_partkey (linear
    sort) vs range-partitioned by the Morton zkey. Per layout: files
    whose per-file min/max overlap the probe, rows in those files, and
    the scan amplification vs true matches — the re-layout decision
    table. One scan to per-file zone maps (map-side combined); the
    65-row file grain then folds to one row per layout."""
    from ..functions.zorder import with_zorder_key

    li = (
        read_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .filter(
            F.col("l_partkey").isNotNull()
            & F.col("l_suppkey").isNotNull()
        )
    )
    mm = li.agg(
        F.min("l_partkey").cast("long").alias("mn_a"),
        F.max("l_partkey").cast("long").alias("mx_a"),
        F.min("l_suppkey").cast("long").alias("mn_b"),
        F.max("l_suppkey").cast("long").alias("mx_b"),
    )
    q = mm.select(
        "mn_a",
        "mx_a",
        "mn_b",
        "mx_b",
        (
            F.col("mn_a")
            + F.floor((F.col("mx_a") - F.col("mn_a")) * _Q_LO_FRAC)
        )
        .cast("long")
        .alias("qa_lo"),
        (
            F.col("mn_a")
            + F.floor((F.col("mx_a") - F.col("mn_a")) * _Q_HI_FRAC)
        )
        .cast("long")
        .alias("qa_hi"),
        (
            F.col("mn_b")
            + F.floor((F.col("mx_b") - F.col("mn_b")) * _Q_LO_FRAC)
        )
        .cast("long")
        .alias("qb_lo"),
        (
            F.col("mn_b")
            + F.floor((F.col("mx_b") - F.col("mn_b")) * _Q_HI_FRAC)
        )
        .cast("long")
        .alias("qb_hi"),
    )
    rows = (
        with_zorder_key(li, "l_partkey", "l_suppkey")
        .crossJoin(F.broadcast(q))
        .select(
            "l_partkey",
            "l_suppkey",
            "zkey",
            "qa_lo",
            "qa_hi",
            "qb_lo",
            "qb_hi",
            F.floor(
                (F.col("l_partkey") - F.col("mn_a")).cast("double")
                * _LAYOUT_FILES
                / (F.col("mx_a") - F.col("mn_a") + 1)
            )
            .cast("long")
            .alias("linear_file"),
            F.shiftright(F.col("zkey"), _Z_FILE_SHIFT).alias("z_file"),
        )
        .withColumn(
            "is_match",
            F.col("l_partkey").between(F.col("qa_lo"), F.col("qa_hi"))
            & F.col("l_suppkey").between(F.col("qb_lo"), F.col("qb_hi")),
        )
    ).cache()  # session-per-query (two layout rollups of one derivation)

    def layout_agg(file_col: str, name: str) -> DataFrame:
        per_file = rows.groupBy(F.col(file_col).alias("f")).agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.when(F.col("is_match"), 1).otherwise(0))
            .cast("long")
            .alias("n_match"),
            (
                ~(
                    (F.max("l_partkey") < F.first("qa_lo"))
                    | (F.min("l_partkey") > F.first("qa_hi"))
                    | (F.max("l_suppkey") < F.first("qb_lo"))
                    | (F.min("l_suppkey") > F.first("qb_hi"))
                )
            ).alias("scan"),
        )
        return per_file.agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum(F.when(F.col("scan"), 1).otherwise(0))
            .cast("long")
            .alias("files_scanned"),
            F.sum(F.when(F.col("scan"), F.col("n_rows")).otherwise(0))
            .cast("long")
            .alias("rows_scanned"),
            F.sum("n_match").cast("long").alias("rows_matched"),
        ).select(
            F.lit(name).alias("layout"),
            "n_files",
            "files_scanned",
            "rows_scanned",
            "rows_matched",
            dround(
                F.lit(1.0)
                - F.col("files_scanned").cast("double") / F.col("n_files"),
                6,
            ).alias("prune_frac"),
            dround(
                F.col("rows_scanned").cast("double")
                / F.greatest(F.col("rows_matched"), F.lit(1)),
                4,
            ).alias("scan_amplification"),
        )

    return layout_agg("linear_file", "linear").unionByName(
        layout_agg("z_file", "zorder")
    )


# ---------------------------------------------------------------------------
# Degenerate-repetition quality gate (generation-loop detection)
# ---------------------------------------------------------------------------

_LOOP_TOP = 20
_LOOP_MIN_REP = 4     # any trigram occurring >= 4x flags the doc
_LOOP_DUP_FRAC = 0.2  # or >= 20% of trigram slots are repeats


def _loop_sql() -> str:
    from ..functions.sqlfrag import sql_shingle_hashes, sql_token_hashes

    dupf = R(
        "CAST(n_trigrams - n_distinct_trigrams AS DOUBLE) / n_trigrams", 6
    )
    return f"""
WITH tokhash AS (
    SELECT doc_id, {sql_token_hashes()} AS th FROM documents
),
tri AS (
    SELECT doc_id, unnest({sql_shingle_hashes('th')}) AS h FROM tokhash
),
per_h AS (
    SELECT doc_id, h, CAST(count(*) AS BIGINT) AS c
    FROM tri GROUP BY doc_id, h
),
per_doc AS (
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_trigrams,
           CAST(count(*) AS BIGINT) AS n_distinct_trigrams,
           CAST(max(c) AS BIGINT) AS top_trigram_count
    FROM per_h GROUP BY doc_id
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       n_trigrams, n_distinct_trigrams, top_trigram_count,
       {dupf} AS dup_trigram_frac,
       (top_trigram_count >= {_LOOP_MIN_REP}
        OR {dupf} >= CAST({_LOOP_DUP_FRAC} AS DOUBLE)) AS loop_flag
FROM per_doc
ORDER BY {dupf} DESC, top_trigram_count DESC, CAST(doc_id AS BIGINT) ASC
LIMIT {_LOOP_TOP}
"""


@register("repeated_ngram_loop_gate", _loop_sql())
def repeated_ngram_loop_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 docs by repeated-trigram fraction: the degeneration gate
    that catches model-generated loop text ("the the the", cycled
    phrases) which per-token quality scores miss. Composes the shared
    token/shingle hash fragments on the NON-distinct trigram multiset;
    repeats are counted relationally (explode + two map-side-combined
    groupBys — the codegen'd form, never a per-row HOF histogram). The
    order key is the ROUNDED fraction with integer/doc_id tie-breaks
    (the ntile lesson)."""
    from ..functions.text import shingle_hash_array, token_hash_array

    d = read_table(spark, sf_dir, "documents")
    th = d.select("doc_id", token_hash_array(F.col("text")).alias("th"))
    sh = th.select(
        "doc_id", shingle_hash_array(F.col("th"), 3).alias("sh")
    ).cache()  # session-per-query (HOF array cached BEFORE explode)
    tri = sh.select("doc_id", F.explode("sh").alias("h"))
    per_h = tri.groupBy("doc_id", "h").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    per_doc = per_h.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_trigrams"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_trigrams"),
        F.max("c").cast("long").alias("top_trigram_count"),
    )
    dupf = dround(
        (F.col("n_trigrams") - F.col("n_distinct_trigrams")).cast("double")
        / F.col("n_trigrams"),
        6,
    )
    return (
        per_doc.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "n_trigrams",
            "n_distinct_trigrams",
            "top_trigram_count",
            dupf.alias("dup_trigram_frac"),
            (
                (F.col("top_trigram_count") >= _LOOP_MIN_REP)
                | (dupf >= _LOOP_DUP_FRAC)
            ).alias("loop_flag"),
        )
        .orderBy(
            F.desc("dup_trigram_frac"),
            F.desc("top_trigram_count"),
            F.asc("doc_id"),
        )
        .limit(_LOOP_TOP)
    )


# ---------------------------------------------------------------------------
# Differential-privacy budget ledger (composition accounting)
# ---------------------------------------------------------------------------

# One DP release per event DAY; per-release epsilon is schedule-driven
# (10/15/20 centi-eps by day mod 3 — deterministic, so both engines
# replay it). The ledger tracks cumulative spend under BASIC composition
# (sum eps_i) and the ADVANCED composition bound (Dwork-Roth Thm 3.20,
# heterogeneous form):
#   eps_adv = sqrt(2 ln(1/delta) sum eps_i^2) + sum eps_i (e^{eps_i}-1)
# All cumulative sums run on EXACT integers (centi-eps, centi^2, and
# nano-quantized per-release e^eps terms whose three possible values are
# schedule constants — pinned cross-engine by the round-10 tier test);
# transcendentals are applied per-row to identical inputs.
_DP_DELTA_INV = 1_000_000  # delta = 1e-6
_DP_BUDGET = 3.0


def _dp_ledger_sql() -> str:
    eps = "(CAST(eps_centi AS DOUBLE) / 100.0)"
    adv = (
        "sqrt(2.0 * (CAST(sq_sum AS DOUBLE) / 10000.0) "
        f"* ln(CAST({_DP_DELTA_INV} AS DOUBLE))) "
        "+ CAST(adv_sum_nano AS DOUBLE) / 1000000000.0"
    )
    return f"""
WITH daily AS (
    SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM events WHERE ts IS NOT NULL
    GROUP BY 1
),
sched AS (
    SELECT day, n_rows,
           10 + 5 * (day % 3) AS eps_centi
    FROM daily
),
terms AS (
    SELECT day, n_rows, eps_centi,
           eps_centi * eps_centi AS sq,
           CAST(floor({eps} * (exp({eps}) - 1.0) * 1000000000.0 + 0.5)
                AS BIGINT) AS adv_nano
    FROM sched
),
led AS (
    SELECT day, n_rows, eps_centi,
           CAST(row_number() OVER w AS BIGINT) AS k,
           CAST(sum(eps_centi) OVER w AS BIGINT) AS eps_sum,
           CAST(sum(sq) OVER w AS BIGINT) AS sq_sum,
           CAST(sum(adv_nano) OVER w AS BIGINT) AS adv_sum_nano
    FROM terms
    WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW)
)
SELECT day, n_rows,
       {R('CAST(eps_centi AS DOUBLE) / 100.0', 2)} AS eps_release,
       k,
       {R('CAST(eps_sum AS DOUBLE) / 100.0', 2)} AS eps_basic,
       {R(adv, 6)} AS eps_advanced,
       ({adv} > CAST({_DP_BUDGET} AS DOUBLE)) AS over_budget
FROM led
"""


@register("dp_budget_ledger", _dp_ledger_sql())
def dp_budget_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per release day: the privacy budget ledger — release epsilon,
    cumulative basic composition, the advanced composition bound at
    delta=1e-6, and the budget breach flag. The day grain is bounded
    (a calendar), so the running window is a bounded frame; every
    cumulative sum is integer (order-free), and the two transcendental
    steps are per-row functions of exact integers."""
    ev = read_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
    )
    daily = ev.groupBy(
        F.floor(F.col("ts").cast("long") / 86400).cast("long").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    eps_centi = (F.lit(10) + F.lit(5) * F.pmod(F.col("day"), F.lit(3)))
    eps = eps_centi.cast("double") / 100.0
    terms = daily.select(
        "day",
        "n_rows",
        eps_centi.alias("eps_centi"),
        (eps_centi * eps_centi).alias("sq"),
        F.floor(eps * (F.exp(eps) - 1.0) * 1e9 + 0.5)
        .cast("long")
        .alias("adv_nano"),
    )
    w = (
        Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    led = terms.select(
        "day",
        "n_rows",
        "eps_centi",
        F.row_number()
        .over(Window.orderBy("day"))
        .cast("long")
        .alias("k"),
        F.sum("eps_centi").over(w).cast("long").alias("eps_sum"),
        F.sum("sq").over(w).cast("long").alias("sq_sum"),
        F.sum("adv_nano").over(w).cast("long").alias("adv_sum_nano"),
    )
    adv = F.sqrt(
        2.0
        * (F.col("sq_sum").cast("double") / 10000.0)
        * F.log(F.lit(float(_DP_DELTA_INV)))
    ) + F.col("adv_sum_nano").cast("double") / 1e9
    return led.select(
        "day",
        "n_rows",
        dround(F.col("eps_centi").cast("double") / 100.0, 2).alias(
            "eps_release"
        ),
        "k",
        dround(F.col("eps_sum").cast("double") / 100.0, 2).alias(
            "eps_basic"
        ),
        dround(adv, 6).alias("eps_advanced"),
        (adv > _DP_BUDGET).alias("over_budget"),
    )
