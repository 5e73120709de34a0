"""Table-maintenance planning: small-file compaction bin-packing.

At 100 TB a landing accumulates small files (per-trigger streaming
commits, over-partitioned writes); read throughput then dies on file-open
overhead and footer reads. The fix is periodic compaction — rewrite many
small files into ~target-size files (what Delta/Iceberg OPTIMIZE does).
This module is the PLANNER: given a file inventory, assign every file to
a compaction bin whose total is ~target bytes. The executor is then one
`spark.read.parquet(<bin's files>).coalesce(1).write` job per bin.

Algorithm: next-fit over size-descending order via exclusive-prefix-sum
binning — `bin = floor(cumsum_before / target)`. Deterministic (pure
function of the inventory), single-pass, and the standard distributed
approximation of first-fit-decreasing (quality bounded within one file
of target per bin; FFD's backtracking is inherently sequential).

Scale note: the inventory is METADATA-sized (one row per file — ~10^5
rows for a 100 TB table at 1 GB files), so the global-order prefix-sum
window runs on one task by design; the data itself is never touched.
The planner's input comes free from any scan via `_metadata.file_path` /
`_metadata.file_size` (file_path, not the basename-only file_name —
basenames collide across partition directories and would merge under
the inventory's distinct()).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def compaction_plan(files: DataFrame, target_bytes: int) -> DataFrame:
    """Assign each inventory row (columns: path string, size_bytes long)
    to a compaction bin.

    Returns (bin_id long, path, size_bytes, bin_total long, n_files long)
    — one row per input file, annotated with its bin's totals. Files
    larger than `target_bytes` end up alone in their bin (their
    cumulative span covers >= one full target stride, so no smaller
    file lands on top of a same-bin boundary... within one file of
    target by the next-fit bound).
    """
    w = Window.orderBy(F.desc("size_bytes"), F.asc("path"))
    cum = files.select(
        "path",
        F.col("size_bytes").cast("long").alias("size_bytes"),
    ).withColumn(
        "cum_before",
        F.coalesce(
            F.sum("size_bytes").over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    # A file larger than target spans several prefix-sum strides, which
    # would leave holes in the raw bin numbering ([1, 200] @ target 100
    # -> raw bins {0, 2}); dense_rank re-enumerates so bin ids are the
    # executor's job indices 0..n_bins-1. (Global window, but the input
    # is the metadata-sized inventory — see module docstring.)
    binned = cum.select(
        F.floor(F.col("cum_before") / F.lit(target_bytes)).alias("raw_bin"),
        "path",
        "size_bytes",
    ).withColumn(
        "bin_id",
        (F.dense_rank().over(Window.orderBy("raw_bin")) - 1).cast("long"),
    )
    wb = Window.partitionBy("bin_id")
    return binned.select(
        "bin_id",
        "path",
        "size_bytes",
        F.sum("size_bytes").over(wb).cast("long").alias("bin_total"),
        F.count(F.lit(1)).over(wb).cast("long").alias("n_files"),
    )


def file_inventory(df: DataFrame) -> DataFrame:
    """The (path, size_bytes) inventory of a scanned landing, from the
    hidden `_metadata` struct — zero extra IO."""
    return (
        df.select(
            F.col("_metadata.file_path").alias("path"),
            F.col("_metadata.file_size").alias("size_bytes"),
        )
        .distinct()
    )
