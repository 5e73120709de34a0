"""Scale-safe global ordering primitives: binned prefix sums, global
ranks, and exact ntile — none of which ever run a partition-less Window
over a fact-scale grain.

The problem: `Window.orderBy(...)` with no PARTITION BY drags every row
through ONE task. Fine at sf0.1; a scale-killer at 100 TB. The classic
two-phase fix (per-partition partials + broadcast offsets) needs a
DETERMINISTIC order-preserving partitioner — `repartitionByRange` samples
and can re-sample differently on the offset branch vs the rank branch,
so we derive the partition (the "bin") from the DATA instead:

    bin(v) = floor((v - min) * N_BINS / (max - min)),  clipped to N_BINS-1

min/max come from a 1-row broadcast aggregate, so the bin id is a pure
deterministic expression of the row, order-preserving, and the bin COUNT
is a constant (default 64) independent of data volume. Then:

  * per-bin partials: one map-side-combined groupBy over N_BINS groups;
  * bin offsets: a bins x bins broadcast theta-join (<= N_BINS^2 = 4096
    pairs — no window at all on the bins grain);
  * within-bin detail: a Window PARTITIONED by bin — every task touches
    only its own bin.

Exactness note: prefix sums of integer-valued columns (counts, longs)
are exact under any association, so two-phase == sequential bit-for-bit.
Double-valued prefix sums re-associate (last-ULP drift vs a sequential
window); callers that hash-compare against a sequential oracle should
keep integer accumulators (every current caller does).

Skew: all-equal order keys collapse to one bin, degrading to the global
window's behaviour — callers pick an order column with real spread
(spend, timestamps, ids), which every current caller has.

No counterpart in the reference (single-threaded pandas ranks in memory,
e.g. /root/reference/Scripts/transformers/world_map_transformer.py's
frame-wide ops); this is the Spark-native scale substitute.
"""

from __future__ import annotations

import math
from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

N_BINS = 64

_MN, _MX, _BIN = "_rk_mn", "_rk_mx", "_rk_bin"


def _with_bin(
    df: DataFrame, order_col: Column, n_bins: int
) -> DataFrame:
    """Attach the deterministic min-max bin id (always ascending in the
    order column; descending consumers flip the comparison, not the id).
    """
    mnmx = df.agg(
        F.min(order_col).cast("double").alias(_MN),
        F.max(order_col).cast("double").alias(_MX),
    )
    v = order_col.cast("double")
    span = F.col(_MX) - F.col(_MN)
    bin_id = F.when(span <= F.lit(0.0), F.lit(0)).otherwise(
        F.least(
            F.lit(n_bins - 1),
            F.floor((v - F.col(_MN)) * n_bins / span).cast("int"),
        )
    )
    return (
        df.crossJoin(F.broadcast(mnmx))
        .withColumn(_BIN, bin_id)
        .drop(_MN, _MX)
    )


def _bin_offsets(
    binned: DataFrame, sums: Mapping[str, Column], desc: bool
) -> DataFrame:
    """Per-bin totals -> per-bin EXCLUSIVE offsets via a broadcast
    theta-join over the constant-size bin table (no window)."""
    bins = binned.groupBy(_BIN).agg(
        *[expr.alias(name) for name, expr in sums.items()]
    )
    before = (
        F.col(f"y.{_BIN}") > F.col(f"x.{_BIN}")
        if desc
        else F.col(f"y.{_BIN}") < F.col(f"x.{_BIN}")
    )
    return (
        bins.alias("x")
        .join(F.broadcast(bins.alias("y")), before, "left")
        .groupBy(F.col(f"x.{_BIN}").alias(_BIN))
        .agg(
            *[
                F.coalesce(F.sum(F.col(f"y.{name}")), F.lit(0)).alias(name)
                for name in sums
            ]
        )
    )


def prefix_sums_binned(
    df: DataFrame,
    order_col: Column,
    vals: Mapping[str, Column],
    *,
    desc: bool = False,
    exclusive: bool = False,
    tie_cols: Sequence[Column] = (),
    n_bins: int = N_BINS,
) -> DataFrame:
    """Cumulative sums of `vals` over the total order (order_col [+
    tie_cols]) — the two-phase, bin-partitioned equivalent of
    `sum(v) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING [AND 1
    PRECEDING])`. Output column names are the mapping keys.

    `order_col` must be numeric and non-null; with `tie_cols` empty it
    must be unique per row (distinct-value grains) for the order to be
    total — prefix sums are still well-defined under ties either way.
    """
    binned = _with_bin(df, order_col, n_bins)
    offs = _bin_offsets(
        binned, {n: F.sum(c) for n, c in vals.items()}, desc
    )
    order = [order_col.desc() if desc else order_col.asc()] + list(tie_cols)
    frame = Window.partitionBy(_BIN).orderBy(*order)
    hi = -1 if exclusive else Window.currentRow
    w = frame.rowsBetween(Window.unboundedPreceding, hi)
    renamed = offs.select(
        _BIN, *[F.col(n).alias(f"_off_{n}") for n in vals]
    )
    out = binned.join(F.broadcast(renamed), _BIN)
    for name, col in vals.items():
        cum = F.sum(col).over(w)
        if exclusive:
            cum = F.coalesce(cum, F.lit(0))
        out = out.withColumn(name, F.col(f"_off_{name}") + cum)
    return out.drop(_BIN, *[f"_off_{n}" for n in vals])


def _ntile_from_rank(p: Column, n: Column, k: int) -> Column:
    """Spark's / DuckDB's ntile(k) fill rule, arithmetically from the
    1-based rank p and total n: with q = n div k and r = n mod k, the
    first r buckets hold q+1 rows and the rest q."""
    q = F.floor(n / k).cast("long")
    r = (n % k).cast("long")
    head = r * (q + F.lit(1))
    # q == 0 (n < k) makes the tail branch unreachable (head == n), but
    # ANSI mode still type-checks the div-by-zero — greatest() guards it.
    qs = F.greatest(q, F.lit(1))
    return (
        F.when(p <= head, F.floor((p + q) / (q + F.lit(1))))
        .otherwise(r + F.floor((p - head + qs - 1) / qs))
        .cast("long")
    )


def ntile_scores(
    df: DataFrame,
    key_col: str,
    measures: Mapping[str, tuple[Column, bool]],
    n_buckets: int,
    *,
    n_bins: int = N_BINS,
) -> DataFrame:
    """Exact ntile(n_buckets) for SEVERAL measures of one keyed frame,
    scale-safe: adds one BIGINT score column per `measures` entry
    (mapping output name -> (measure Column, descending?)); ties always
    break ascending on `key_col`; all other columns pass through.

    ONE driver-coordinated prep pass over `df` (which callers should
    .cache()) collects BOUNDED state — the same discipline as the
    k-means centroid / BPE argmax loops: the per-measure min/max + row
    count are a 1-row in-plan aggregate broadcast onto a prep-only
    melt, whose (measure, bin) histogram (<= |measures| * n_bins rows,
    bounds replicated on each row) is the single collect. Everything
    folds into LITERAL expressions — bin bounds and exclusive rank
    offsets — so the final plan is |measures| chained row_number
    windows, each PARTITIONED by that measure's constant-count min-max
    bin, plus pure ntile arithmetic from (rank, n). Desc measures rank
    on the negated value. No partition-less window anywhere, no
    broadcast chain, no melt/pivot in the hot path (a broadcast-join
    draft of this operator serialized ~6 local jobs and benched 5x over
    the global-window form it replaced; a melt+pivot draft still paid
    two extra fact-grain shuffles; a two-collect draft — bounds job,
    then a literal-binned histogram job — paid a second driver
    round-trip, ~0.5 s of pure scheduling at sf0.1).

    At 100 TB the prep pass is a map-side-combined aggregation, the
    collected state stays <= |measures| * n_bins rows, and each rank
    partition holds ~n/n_bins rows — raise n_bins if a single bin's
    sort must stay smaller."""
    names = list(measures)
    ordv = {
        name: (-col if desc else col).cast("double")
        for name, (col, desc) in measures.items()
    }

    # Prep: ONE action. The 1-row bounds aggregate stays IN-PLAN
    # (broadcast onto the melt), bins derive from its columns, and the
    # histogram rows carry the bounds back so a single collect returns
    # both. (A giant single-row |measures| * n_bins sum(when) aggregate
    # was tried and benched SLOWER — codegen compile per build; separate
    # bounds + histogram collects were tried and pay an extra job.)
    aggs: list[Column] = [F.count(F.lit(1)).cast("long").alias("_rk_n")]
    for i, name in enumerate(names):
        aggs.append(F.min(ordv[name]).alias(f"_rk_mn{i}"))
        aggs.append(F.max(ordv[name]).alias(f"_rk_mx{i}"))
    bounds = df.agg(*aggs)
    bounds_cols = [f.name for f in bounds.schema.fields]

    def bin_from_bounds(i: int, name: str) -> Column:
        mn, mx = F.col(f"_rk_mn{i}"), F.col(f"_rk_mx{i}")
        span = mx - mn
        return F.when(
            mn.isNull() | (span <= F.lit(0.0)), F.lit(0)
        ).otherwise(
            F.least(
                F.lit(n_bins - 1),
                F.floor((ordv[name] - mn) * n_bins / span).cast("int"),
            )
        )

    melt = (
        df.crossJoin(F.broadcast(bounds))
        .select(
            *bounds_cols,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("m"),
                            bin_from_bounds(i, name).alias("b"),
                        )
                        for i, name in enumerate(names)
                    ]
                )
            ).alias("e"),
        )
        .select(
            *bounds_cols,
            F.col("e.m").alias("_m"),
            F.col("e.b").alias(_BIN),
        )
    )
    hist = melt.groupBy(*bounds_cols, "_m", _BIN).agg(
        F.count(F.lit(1)).cast("long").alias("bc")
    ).collect()
    if not hist:  # empty input: bounds row still needed for n_total
        st = bounds.collect()[0]
    else:
        st = hist[0]
    n_total = st["_rk_n"]

    def bin_expr(i: int, name: str) -> Column:
        mn, mx = st[f"_rk_mn{i}"], st[f"_rk_mx{i}"]
        if mn is None or mx is None or mx <= mn:
            return F.lit(0)
        return (
            F.least(
                F.lit(n_bins - 1),
                F.floor(
                    (ordv[name] - F.lit(mn)) * n_bins / F.lit(mx - mn)
                ).cast("int"),
            )
        )

    offsets: dict[int, dict[int, int]] = {i: {} for i in range(len(names))}
    for i in range(len(names)):
        acc = 0
        for r in sorted(
            (r for r in hist if r["_m"] == i), key=lambda r: r[_BIN]
        ):
            offsets[i][r[_BIN]] = acc
            acc += r["bc"]

    out = df
    for i, name in enumerate(names):
        bcol = f"_rk_b{i}"
        out = out.withColumn(bcol, bin_expr(i, name))
        if offsets[i]:
            pairs: list[Column] = []
            for k, v in offsets[i].items():
                pairs.extend((F.lit(k), F.lit(v)))
            off = F.coalesce(
                F.element_at(F.create_map(*pairs), F.col(bcol)),
                F.lit(0),
            )
        else:
            off = F.lit(0)
        w = Window.partitionBy(bcol).orderBy(
            ordv[name].asc(), F.col(key_col).asc()
        )
        rank = F.row_number().over(w).cast("long") + off
        out = out.withColumn(
            name, _ntile_from_rank(rank, F.lit(n_total), n_buckets)
        ).drop(bcol)
    return out


def exact_quantile_cont(
    df: DataFrame, value_col: Column, q: float, n_bins: int = N_BINS
) -> DataFrame:
    """Exact interpolated quantile — the (n-1)*q rule, value-identical to
    Spark `percentile` / DuckDB `quantile_cont` — WITHOUT the value-map
    percentile aggregate, whose merged per-distinct-value hashmap
    measured ~9 s over 2.9M mostly-distinct doubles (theil_sen's
    slopes).

    Method: BRACKET-THEN-EXACT selection.
      1. n <= 100k: Spark's exact `percentile` directly (the map is
         cheap at that size).
      2. else: `percentile_approx(q ± 5e-4, accuracy 10k)` brackets the
         target. The GK sketch's rank error is a DETERMINISTIC bound
         (<= n/accuracy = 1e-4 n), so the true order statistics at
         floor/ceil((n-1)q) PROVABLY lie inside the bracket; the
         bracket VALUES may vary with partition merge order, but the
         final answer is exact rank arithmetic relative to whatever
         bracket was returned — reproducible either way.
      3. One exact pass counts values below the bracket; the bracket's
         members (~2*5e-4 n + 2e-4 n rows — ~3.5k at n = 2.9M) collect
         to the driver, sort, and the two bracketing order statistics
         interpolate.

    Driver-coordination contract (the kmeans-seed discipline): this
    runs bounded actions at BUILD time — a count, a 2-value sketch row,
    a count, and an O(1e-3 n)-row fetch. Callers pass a CACHED frame
    when the input is expensive to recompute (each step is a pass).
    A value-first binned-window variant was tried and REVERTED: uniform
    min-max bins collapse under heavy-tailed value distributions (all
    mass lands in the median bin, and the within-bin rank window
    degenerates to a 2.9M-row single-task sort — measured 7-10 s).

    Returns a 1-row frame (value double, n long); value NULL on empty
    input. Defensive fallback: if the sketch bound is ever violated
    (out-of-bracket rank), falls back to the exact percentile
    aggregate.
    """
    spark = df.sparkSession
    val = value_col.cast("double").alias("_qv")
    # NULLs are excluded to match percentile/percentile_approx null
    # semantics (they'd otherwise inflate n and mis-place p_lo/p_hi in
    # the bracket rank arithmetic). NaN inputs remain a documented
    # precondition violation (engines disagree on NaN ordering).
    slim = df.select(val).filter(F.col("_qv").isNotNull())
    w = 5e-4
    acc = 10_000
    q0, q1 = max(0.0, q - w), min(1.0, q + w)
    # ONE fused pass computes n + the bracket sketch (was two passes);
    # the sketch is wasted work only on the small-n path, where it is
    # as cheap as the count itself.
    head = slim.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.percentile_approx(
            F.col("_qv"), F.array(F.lit(q0), F.lit(q1)), F.lit(acc)
        ).alias("b"),
    ).collect()[0]
    n = head["n"]
    if n == 0:
        return spark.createDataFrame(
            [(None, 0)], "value double, n long"
        )
    p_lo = int(math.floor((n - 1) * q))
    p_hi = int(math.ceil((n - 1) * q))
    if n <= 100_000:
        picked = slim.agg(
            F.percentile(F.col("_qv"), q).alias("value"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        return picked
    br = head["b"]
    v_lo_b, v_hi_b = float(br[0]), float(br[1])
    cnt_below = slim.filter(F.col("_qv") < v_lo_b).count()
    mid = sorted(
        r["_qv"]
        for r in slim.filter(
            (F.col("_qv") >= v_lo_b) & (F.col("_qv") <= v_hi_b)
        ).collect()
    )
    i_lo, i_hi = p_lo - cnt_below, p_hi - cnt_below
    if not (0 <= i_lo <= i_hi < len(mid)):
        # sketch contract violated (should be impossible) — exact+slow
        return slim.agg(
            F.percentile(F.col("_qv"), q).alias("value"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    # Spark's Percentile interpolates with the WEIGHTED two-product form
    # ((higher - pos) * lowerValue + (pos - lower) * higherValue), which
    # differs from lower + (higher - lower) * frac in the last ULP —
    # replicate it exactly so this is bit-identical to F.percentile.
    pos = (n - 1) * q
    if i_lo == i_hi:
        value = mid[i_lo]
    else:
        value = (p_hi - pos) * mid[i_lo] + (pos - p_lo) * mid[i_hi]
    return spark.createDataFrame(
        [(float(value), n)], "value double, n long"
    )


def exact_quantiles_cont(
    df: DataFrame,
    value_col: Column,
    qs: Sequence[float],
    probe_extra: Sequence[float] = (),
    extra_aggs=None,
):
    """Multi-q form of exact_quantile_cont: ONE fused pass computes n +
    a sketch bracketing every requested quantile, one conditional-sum
    pass counts below each bracket, one filtered collect fetches all
    brackets' members — the per-q work never re-scans the input.
    Returns a frame (q double, value double, n long), one row per
    requested q. Same caller contract: pass a CACHED frame when the
    input is expensive; interpolation replicates Spark's weighted form;
    NULLs are excluded (percentile semantics); NaNs are a precondition
    violation.

    Piggyback hooks (so a caller auditing the sketch never pays its own
    extra passes — the round7e quantile-sketch gate):
      probe_extra: additional quantile points APPENDED to the single
        GK sketch call; their sketch values are returned.
      extra_aggs: callable (value_column, probe_values) -> list of
        named aggregate Columns fused into the below-counts pass; the
        collected Row is returned (None when the pass didn't run).
    With either hook the return is a tuple
    (frame, probe_values | None, extra_row | None).
    """
    spark = df.sparkSession
    val = value_col.cast("double").alias("_qv")
    slim = df.select(val).filter(F.col("_qv").isNotNull())
    out_schema = "q double, value double, n long"
    w = 5e-4
    acc = 10_000
    probe_qs: list[float] = []
    for q in qs:
        probe_qs += [max(0.0, q - w), min(1.0, q + w)]
    n_bracket = len(probe_qs)
    probe_qs += [float(p) for p in probe_extra]
    head = slim.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.percentile_approx(
            F.col("_qv"),
            F.array(*[F.lit(p) for p in probe_qs]),
            F.lit(acc),
        ).alias("b"),
    ).collect()[0]
    n = head["n"]
    extras_wanted = bool(probe_extra) or extra_aggs is not None

    def _ret(frame, pv=None, extra_row=None):
        return (frame, pv, extra_row) if extras_wanted else frame

    if n == 0:
        return _ret(
            spark.createDataFrame(
                [(float(q), None, 0) for q in qs], out_schema
            )
        )
    pv = (
        [float(head["b"][n_bracket + j]) for j in range(len(probe_extra))]
        if probe_extra
        else None
    )
    if n <= 100_000:
        aggs = [
            F.percentile(
                F.col("_qv"), F.array(*[F.lit(float(q)) for q in qs])
            ).alias("ev")
        ]
        if extra_aggs is not None:
            aggs += list(extra_aggs(F.col("_qv"), pv))
        row = slim.agg(*aggs).collect()[0]
        arr = row["ev"]
        return _ret(
            spark.createDataFrame(
                [(float(q), float(arr[i]), n) for i, q in enumerate(qs)],
                out_schema,
            ),
            pv,
            row,
        )
    br = head["b"]
    lo = [float(br[2 * i]) for i in range(len(qs))]
    hi = [float(br[2 * i + 1]) for i in range(len(qs))]
    count_aggs = [
        F.sum(F.when(F.col("_qv") < lo[i], 1).otherwise(0))
        .cast("long")
        .alias(f"_cb{i}")
        for i in range(len(qs))
    ]
    if extra_aggs is not None:
        count_aggs += list(extra_aggs(F.col("_qv"), pv))
    cnts = slim.agg(*count_aggs).collect()[0]
    cond = None
    for i in range(len(qs)):
        c = (F.col("_qv") >= lo[i]) & (F.col("_qv") <= hi[i])
        cond = c if cond is None else (cond | c)
    members = [r["_qv"] for r in slim.filter(cond).collect()]
    rows = []
    for i, q in enumerate(qs):
        mid = sorted(v for v in members if lo[i] <= v <= hi[i])
        p_lo = int(math.floor((n - 1) * q))
        p_hi = int(math.ceil((n - 1) * q))
        i_lo = p_lo - cnts[f"_cb{i}"]
        i_hi = p_hi - cnts[f"_cb{i}"]
        if not (0 <= i_lo <= i_hi < len(mid)):
            v = slim.agg(
                F.percentile(F.col("_qv"), float(q))
            ).collect()[0][0]
            rows.append((float(q), float(v), n))
            continue
        pos = (n - 1) * q
        if i_lo == i_hi:
            v = mid[i_lo]
        else:
            v = (p_hi - pos) * mid[i_lo] + (pos - p_lo) * mid[i_hi]
        rows.append((float(q), float(v), n))
    return _ret(spark.createDataFrame(rows, out_schema), pv, cnts)
