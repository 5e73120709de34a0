"""Object-store-shaped IO under a URI prefix (sources/io.py).

file:// stands in for s3a:// — nothing in the code under test inspects
the scheme: path algebra is URI-safe, listing and latest-run discovery go
through the Hadoop FileSystem the URI resolves to, and the staged-commit
writer accepts a URI for its landing prefix. Mirrors the reference's
boto3 layer semantics (external_resources.py:22-98: keyed upload, list
keys, newest-first pick)."""

from __future__ import annotations

import json
import os

from steam_prices_data_engineering_spark.sources.io import (
    join_uri,
    latest_run,
    list_children,
    read_latest_run,
    run_dir,
    write_run,
)
from steam_prices_data_engineering_spark.sources.tables import (
    read_table,
    table_path,
)


def test_join_uri_algebra():
    assert join_uri("s3a://bucket/pre/", "a", "/b/") == "s3a://bucket/pre/a/b"
    assert join_uri("file:///tmp/x", "y.parquet") == "file:///tmp/x/y.parquet"
    assert table_path("file:///tmp/sf", "orders") == "file:///tmp/sf/orders.parquet"
    assert table_path("s3a://bucket/sf0.1", "events").startswith("s3a://")


def test_write_list_latest_under_uri_prefix(spark, tmp_path):
    base = f"file://{tmp_path}/landing"
    for ts, val in [
        ("20240101T000000", 1),
        ("20240301T120000", 3),
        ("20240215T060000", 2),
    ]:
        df = spark.createDataFrame([(i, val) for i in range(5)], ["i", "run_val"])
        write_run(df, base, ts)

    runs = list_children(spark, base)
    assert runs == [
        "run_ts=20240101T000000",
        "run_ts=20240215T060000",
        "run_ts=20240301T120000",
    ]
    # latest by NAME, not mtime: 20240301 wrote before 20240215 above
    assert latest_run(spark, base) == run_dir(base, "20240301T120000")
    back = read_latest_run(spark, base)
    assert back.count() == 5
    assert {r.run_val for r in back.collect()} == {3}


def test_latest_run_empty_prefix(spark, tmp_path):
    assert latest_run(spark, f"file://{tmp_path}/nothing-here") is None
    assert list_children(spark, f"file://{tmp_path}/nothing-here") == []


def test_read_table_through_file_uri(spark):
    plain = read_table(spark, "/root/testdata/sf0.001", "orders")
    via_uri = read_table(spark, "file:///root/testdata/sf0.001", "orders")
    assert via_uri.schema == plain.schema
    assert via_uri.count() == plain.count()


def test_staged_commit_writer_under_file_uri(spark, tmp_path):
    """The two-phase staged writer (S7 upload shape) addressed by URI:
    rows land invisible (dot-staged), commit promotes them and writes the
    manifest readers trust — the rename-free protocol an s3a:// landing
    needs, byte transport aside."""
    from steam_prices_data_engineering_spark.sources.steam_api_source import (
        register_steam_source,
    )

    register_steam_source(spark)
    out_dir = tmp_path / "upload"
    uri = f"file://{out_dir}"
    df = spark.createDataFrame([(10, "a"), (20, "b"), (30, "c")], ["app", "body"])
    df.repartition(2).write.format("steam_appdetails").option("path", uri).mode(
        "append"
    ).save()

    names = sorted(os.listdir(out_dir))
    assert "_MANIFEST.json" in names
    assert not any(n.startswith(".staged-") for n in names)  # nothing half-visible
    manifest = json.loads((out_dir / "_MANIFEST.json").read_text())
    assert sum(f["rows"] for f in manifest["files"]) == 3
    committed = {f["file"] for f in manifest["files"]}
    assert committed == {n for n in names if n != "_MANIFEST.json"}


def test_staged_commit_writer_rejects_object_store_scheme(spark, tmp_path):
    from py4j.protocol import Py4JJavaError
    import pytest

    from steam_prices_data_engineering_spark.sources.steam_api_source import (
        register_steam_source,
    )

    register_steam_source(spark)
    df = spark.createDataFrame([(1, "x")], ["app", "body"])
    with pytest.raises((Py4JJavaError, Exception), match="object-store client"):
        df.write.format("steam_appdetails").option(
            "path", "s3a://bucket/prefix"
        ).mode("append").save()


def test_cli_jobs_land_under_file_uri(spark, tmp_path):
    """The config-driven runner accepts an object-store-shaped output_dir:
    both parquet landings and the driver-side PNG artifact resolve through
    the URI layer (file:// standing in for s3a://)."""
    from steam_prices_data_engineering_spark.cli import run_jobs

    config = {
        "app_name": "uri-cli-test",
        "source": {"sf_dir": "/root/testdata/sf0.001"},
        "target": {
            "output_dir": f"file://{tmp_path}/landings",
            "prices_key": "prices",
            "worldmap_key": "worldmap",
        },
    }
    out = run_jobs(config, spark=spark, run_ts="20240101000000")
    landed = spark.read.parquet(out["prices"])
    assert landed.count() > 0
    assert "run_key" in landed.columns
    assert os.path.exists(out["worldmap_png"])
    assert out["worldmap_png"].startswith(str(tmp_path))


def test_sweep_runs_retention(spark, tmp_path):
    from steam_prices_data_engineering_spark.sources.io import sweep_runs

    base = f"file://{tmp_path}/landing"
    for ts, val in [
        ("20240101T000000", 1),
        ("20240201T000000", 2),
        ("20240301T120000", 3),
        ("20240401T060000", 4),
    ]:
        write_run(
            spark.range(val).toDF("v"), base, ts
        )
    kept, deleted = sweep_runs(spark, base, keep_latest=2)
    assert kept == ["run_ts=20240301T120000", "run_ts=20240401T060000"]
    assert deleted == ["run_ts=20240101T000000", "run_ts=20240201T000000"]
    # Listing agrees and the latest run still reads.
    assert list_children(spark, base) == kept
    assert read_latest_run(spark, base).count() == 4
    # Idempotent: a second sweep deletes nothing.
    kept2, deleted2 = sweep_runs(spark, base, keep_latest=2)
    assert kept2 == kept and deleted2 == []


def test_sweep_runs_guards(spark, tmp_path):
    import pytest

    from steam_prices_data_engineering_spark.sources.io import sweep_runs

    base = f"file://{tmp_path}/empty_landing"
    with pytest.raises(ValueError):
        sweep_runs(spark, base, keep_latest=0)
    # Empty prefix: nothing kept, nothing deleted, no error.
    assert sweep_runs(spark, base, keep_latest=3) == ([], [])
    # Fewer runs than the retention budget: all survive.
    write_run(spark.range(1).toDF("v"), base, "20240101T000000")
    kept, deleted = sweep_runs(spark, base, keep_latest=5)
    assert kept == ["run_ts=20240101T000000"] and deleted == []
