"""Compaction-planner properties (operators/maintenance.py): coverage,
bin-size bounds, determinism under partitioning, and the _metadata-fed
inventory path over a deliberately fragmented landing."""

from __future__ import annotations

from pyspark.sql import functions as F

from steam_prices_data_engineering_spark.operators.maintenance import (
    compaction_plan,
    file_inventory,
)

_TARGET = 1000


def _plan(spark, sizes, target=_TARGET):
    files = spark.createDataFrame(
        [(f"f{i:03d}", s) for i, s in enumerate(sizes)],
        "path string, size_bytes long",
    )
    return compaction_plan(files, target).collect()


def test_plan_covers_every_file_once_and_preserves_bytes(spark):
    sizes = [700, 500, 400, 300, 200, 100, 50]
    rows = _plan(spark, sizes)
    assert len(rows) == len(sizes)
    assert sorted(r.size_bytes for r in rows) == sorted(sizes)
    # per-bin annotations agree with the actual bin contents
    bins = {}
    for r in rows:
        bins.setdefault(r.bin_id, []).append(r)
    for members in bins.values():
        total = sum(r.size_bytes for r in members)
        assert all(r.bin_total == total for r in members)
        assert all(r.n_files == len(members) for r in members)


def test_bins_bounded_within_one_file_of_target(spark):
    """Next-fit bound: a bin exceeds target only by (part of) its last
    member — bin_total - largest_member < target, and every bin except
    possibly the last reaches at least... its stride boundary."""
    sizes = [900, 800, 450, 450, 300, 250, 150, 100, 90, 10]
    rows = _plan(spark, sizes)
    bins = {}
    for r in rows:
        bins.setdefault(r.bin_id, []).append(r.size_bytes)
    for members in bins.values():
        if len(members) > 1:
            assert sum(members) - max(members) < _TARGET


def test_oversized_file_gets_its_own_bin(spark):
    rows = _plan(spark, [5000, 10, 10])
    big = [r for r in rows if r.size_bytes == 5000][0]
    assert big.n_files == 1  # nothing packs on top of a >=target file


def test_plan_deterministic_under_input_partitioning(spark):
    sizes = [317, 613, 229, 891, 47, 560, 731, 128]
    files = spark.createDataFrame(
        [(f"f{i:03d}", s) for i, s in enumerate(sizes)],
        "path string, size_bytes long",
    )
    a = {r.path: r.bin_id for r in compaction_plan(files, _TARGET).collect()}
    b = {
        r.path: r.bin_id
        for r in compaction_plan(files.repartition(7), _TARGET).collect()
    }
    assert a == b


def test_inventory_from_metadata_over_fragmented_landing(spark, tmp_path):
    """Write a deliberately over-partitioned landing, read it back, and
    plan its compaction purely from _metadata — every physical file
    appears exactly once and bin totals equal real on-disk bytes."""
    import os

    out = str(tmp_path / "frag.parquet")
    spark.range(0, 10_000).withColumn("x", F.col("id") * 2).repartition(
        17
    ).write.parquet(out)
    inv = file_inventory(spark.read.parquet(out))
    rows = inv.collect()
    on_disk = {
        f: os.path.getsize(os.path.join(out, f))
        for f in os.listdir(out)
        if f.endswith(".parquet")
    }
    assert len(rows) == len(on_disk) == 17
    assert {os.path.basename(r.path) for r in rows} == set(on_disk)
    assert sorted(r.size_bytes for r in rows) == sorted(on_disk.values())
    plan = compaction_plan(inv, target_bytes=4 * max(on_disk.values()))
    got = plan.collect()
    assert len(got) == 17
    # compaction actually compacts: fewer bins than files
    assert len({r.bin_id for r in got}) < 17


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@given(
    sizes=st.lists(st.integers(min_value=1, max_value=3000), min_size=1, max_size=40),
    target=st.integers(min_value=100, max_value=2000),
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_plan_properties_hold_for_any_inventory(spark, sizes, target):
    """For ANY inventory and target: every file binned exactly once,
    bytes preserved, bin ids dense from 0, and the next-fit bound
    (bin_total - largest member < target for multi-file bins)."""
    files = spark.createDataFrame(
        [(f"f{i:04d}", s) for i, s in enumerate(sizes)],
        "path string, size_bytes long",
    )
    rows = compaction_plan(files, target).collect()
    assert sorted(r.size_bytes for r in rows) == sorted(sizes)
    bins = {}
    for r in rows:
        bins.setdefault(r.bin_id, []).append(r.size_bytes)
    assert min(bins) == 0
    assert set(bins) == set(range(len(bins)))
    for members in bins.values():
        if len(members) > 1:
            assert sum(members) - max(members) < target
