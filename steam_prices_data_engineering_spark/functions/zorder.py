"""Z-order (Morton) clustering key: multi-column data skipping for
parquet landings.

A single-column sort gives tight row-group min/max stats for ONE column;
filters on any other column still read every row group. Interleaving the
bits of two rank-normalized columns puts rows that are close in BOTH
dimensions into the same row groups, so footer stats prune scans for
filters on EITHER column — the layout trick behind Delta OPTIMIZE ZORDER
and Iceberg's sort-order z-curve, here as a pure Column expression over
built-in functions (no UDF, no shuffle beyond the final range partition).

Normalization uses global min/max (two scalar aggregates, broadcast back)
rather than rank/ntile — a window rank over the whole table would funnel
it through one partition, which is exactly what a 100 TB write job cannot
do. Min/max normalization is distribution-sensitive (skewed values crowd
cells) but preserves the pruning property for range predicates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS = 12  # 12 bits/dim -> 24-bit key: 4096 cells/dim, plenty for layout


def _normalize(c: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Scale c to an integer in [0, 2^bits) using global [lo, hi].

    NULL values map to cell 0 (the min corner) by explicit choice: Spark's
    greatest/least SKIP NULL arguments, so without the coalesce a NULL
    input would normalize to the MAX cell and silently cluster NULL rows
    with the true-max rows, diluting footer min/max pruning for that
    region. Cell 0 groups all NULLs into one compact z-range instead
    (matching the convention that NULLS FIRST sorts land them low)."""
    span = F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
    frac = (c.cast("double") - lo) / span
    scaled = F.floor(frac * ((1 << bits) - 1) + 0.5).cast("long")
    return F.greatest(
        F.lit(0), F.least(F.lit((1 << bits) - 1), F.coalesce(scaled, F.lit(0)))
    )


def _interleave(a: Column, b: Column, bits: int) -> Column:
    """Morton-interleave two bits-wide ints: a's bit i -> 2i+1, b's -> 2i.

    `bits` is a Python constant, so the interleave UNROLLS to 2*bits
    shift/mask/add terms — all whole-stage-codegen'd JVM expressions. The
    previous `F.aggregate(sequence(...))` form computed the same value
    but ran INTERPRETED per row (Spark higher-order functions don't
    codegen) and re-evaluated pow() per sequence element — measured 10.5s
    -> sub-second for the zkey of 600k rows at sf0.1."""
    acc: Column = F.lit(0).cast("long")
    for i in range(bits):
        bit_a = F.shiftright(a, i).bitwiseAND(F.lit(1))
        bit_b = F.shiftright(b, i).bitwiseAND(F.lit(1))
        acc = acc + bit_a * F.lit(1 << (2 * i + 1)) + bit_b * F.lit(1 << (2 * i))
    return acc


def with_zorder_key(
    df: DataFrame, col_a: str, col_b: str, bits: int = BITS
) -> DataFrame:
    """Append a `zkey` column: the Morton code of (col_a, col_b).

    Write pattern for a clustered landing:
        with_zorder_key(df, "a", "b")
          .repartitionByRange(n_files, "zkey")
          .sortWithinPartitions("zkey")
          .write.parquet(path)
    RepartitionByRange samples the key (no full sort); each output file
    then covers a compact z-range = a compact rectangle-ish region in
    (a, b) space, so min/max footer stats prune on either column.
    """
    mm = df.agg(
        F.min(col_a).cast("double").alias("_lo_a"),
        F.max(col_a).cast("double").alias("_hi_a"),
        F.min(col_b).cast("double").alias("_lo_b"),
        F.max(col_b).cast("double").alias("_hi_b"),
    )
    with_mm = df.crossJoin(F.broadcast(mm))
    na = _normalize(F.col(col_a), F.col("_lo_a"), F.col("_hi_a"), bits)
    nb = _normalize(F.col(col_b), F.col("_lo_b"), F.col("_hi_b"), bits)
    return with_mm.withColumn("zkey", _interleave(na, nb, bits)).drop(
        "_lo_a", "_hi_a", "_lo_b", "_hi_b"
    )
