"""Sink hygiene for 100 TB landings: small-file compaction and sorted/
clustered writes. Small files are the classic large-table killer (every file
is a task + a NameNode/liststore entry); unsorted measures mean every query
reads every row group. These tests pin the two write-side disciplines the
engine's sinks rely on."""

from __future__ import annotations

import glob

import duckdb

from steam_prices_data_engineering_spark.sources.tables import read_table

SF = "/root/testdata/sf0.001"


def _parquet_files(d: str) -> list[str]:
    return glob.glob(f"{d}/*.parquet")


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    """Repartition-on-read compaction: a 32-file landing collapses to 2
    files with identical row count and content hash. (At scale: run as a
    maintenance job per partition; AQE's coalescePartitions does the same
    for shuffle outputs automatically.)"""
    src = str(tmp_path / "small_files")
    compacted = str(tmp_path / "compacted")
    e = read_table(spark, SF, "events").select("event_id", "user_id", "value")
    e.repartition(32).write.mode("overwrite").parquet(src)
    assert len(_parquet_files(src)) == 32

    spark.read.parquet(src).repartition(2).write.mode("overwrite").parquet(
        compacted
    )
    assert len(_parquet_files(compacted)) <= 2

    con = duckdb.connect()
    before = con.execute(
        f"SELECT count(*), sum(event_id), sum(user_id) FROM read_parquet('{src}/*.parquet')"
    ).fetchone()
    after = con.execute(
        f"SELECT count(*), sum(event_id), sum(user_id) FROM read_parquet('{compacted}/*.parquet')"
    ).fetchone()
    assert before == after


def test_range_sorted_write_gives_disjoint_file_ranges(spark, tmp_path):
    """repartitionByRange + sortWithinPartitions on the clustering column
    yields files with non-overlapping min/max ranges — the property that
    lets parquet footer stats skip entire files/row groups for a date
    predicate. Verified from the written footers themselves."""
    out = str(tmp_path / "clustered")
    l = read_table(spark, SF, "lineitem").select("l_orderkey", "l_shipdate")
    (
        l.repartitionByRange(4, "l_shipdate")
        .sortWithinPartitions("l_shipdate")
        .write.mode("overwrite")
        .parquet(out)
    )
    con = duckdb.connect()
    ranges = con.execute(
        f"""
        SELECT file_name,
               min(stats_min_value::TIMESTAMP) AS lo,
               max(stats_max_value::TIMESTAMP) AS hi
        FROM parquet_metadata('{out}/*.parquet')
        WHERE path_in_schema = 'l_shipdate'
        GROUP BY file_name ORDER BY lo
        """
    ).fetchall()
    assert len(ranges) == 4
    for (_, _, prev_hi), (_, next_lo, _) in zip(ranges, ranges[1:]):
        assert prev_hi <= next_lo, ranges


def test_png_sink_renders_decodable_artifact(spark, tmp_path):
    """S8 parity: the world-map deviation aggregate renders to a valid PNG
    (signature, IHDR geometry, IDAT inflates to the expected scanline
    bytes) written atomically. The renderer is the stdlib encoder in
    sinks/png.py — the matplotlib figure of the reference plugs into the
    same collect-then-render contract."""
    import struct
    import zlib

    from steam_prices_data_engineering_spark.plans import registry
    from steam_prices_data_engineering_spark.sinks.png import world_map_png

    df = registry.queries()["world_map_job2_deviation"](
        spark, "/root/testdata/sf0.001"
    )
    out = world_map_png(df, "usd_dif", "iso_a3", str(tmp_path / "world.png"))
    blob = open(out, "rb").read()
    assert blob.startswith(b"\x89PNG\r\n\x1a\n")
    # IHDR: the world-raster geometry, 8-bit RGB.
    from steam_prices_data_engineering_spark.sinks.png import (
        COUNTRY_LABEL_POINTS,
        WORLD_H,
        WORLD_W,
    )

    w, h, depth, ctype = struct.unpack(">IIBB", blob[16:26])
    assert (w, h) == (WORLD_W, WORLD_H) and depth == 8 and ctype == 2
    # IDAT inflates to h scanlines of (1 filter byte + 3*w pixel bytes).
    idat_off = blob.index(b"IDAT") + 4
    idat_len = struct.unpack(">I", blob[idat_off - 8 : idat_off - 4])[0]
    raw = zlib.decompress(blob[idat_off : idat_off + idat_len])
    assert len(raw) == h * (1 + 3 * w)

    def pixel(lon, lat):
        x = int((lon + 180.0) / 360.0 * w)
        y = int((90.0 - lat) / 180.0 * h)
        off = y * (1 + 3 * w) + 1 + 3 * x
        return tuple(raw[off : off + 3])

    ocean = (210, 228, 240)
    # Mid-Pacific and mid-Atlantic are ocean; covered countries are not.
    assert pixel(-150, 0) == ocean and pixel(-30, 30) == ocean
    covered = {r.iso_a3 for r in df.select("iso_a3").collect()}
    # Probe each country's INTERIOR label anchor (box centers can fall
    # in the sea for concave coastlines — Japan's is in the Sea of
    # Japan — so the round-5 high-fidelity atlas pairs each country
    # with a guaranteed-interior point).
    for iso3, (lon, lat) in COUNTRY_LABEL_POINTS.items():
        if iso3 in covered:
            assert pixel(lon, lat) != ocean, iso3


def test_zorder_write_prunes_on_both_columns(spark, tmp_path):
    """Z-order clustering: after a Morton-key range-partitioned write,
    every file's footer min/max covers only a FRACTION of both join keys'
    domains — so a filter on either column prunes files/row groups. A
    single-column sort would give this for one column and leave the other
    at ~full coverage; Z-order buys both at once."""
    import pyarrow.parquet as pq

    from steam_prices_data_engineering_spark.functions.zorder import (
        with_zorder_key,
    )

    li = read_table(spark, "/root/testdata/sf0.01", "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    out = str(tmp_path / "zordered")
    (
        with_zorder_key(li, "l_partkey", "l_suppkey")
        .repartitionByRange(8, "zkey")
        .sortWithinPartitions("zkey")
        .write.mode("overwrite")
        .parquet(out)
    )
    files = _parquet_files(out)
    assert len(files) >= 6  # range partitioner may merge near-empty ends

    def coverage(col: str) -> list[float]:
        glo, ghi = None, None
        spans = []
        for f in files:
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            lo = min(
                md.row_group(i).column(idx).statistics.min
                for i in range(md.num_row_groups)
            )
            hi = max(
                md.row_group(i).column(idx).statistics.max
                for i in range(md.num_row_groups)
            )
            spans.append((lo, hi))
            glo = lo if glo is None else min(glo, lo)
            ghi = hi if ghi is None else max(ghi, hi)
        return [(hi - lo) / (ghi - glo) for lo, hi in spans]

    cov_a = coverage("l_partkey")
    cov_b = coverage("l_suppkey")
    # Mean per-file coverage must be well below full-domain (~1.0 for a
    # random layout) on BOTH dimensions simultaneously.
    assert sum(cov_a) / len(cov_a) < 0.7, cov_a
    assert sum(cov_b) / len(cov_b) < 0.7, cov_b


def test_custom_writer_two_phase_commit(spark, tmp_path):
    """Custom Python DataSource WRITER: per-partition staged files promote
    only at driver commit, with a manifest recording the committed set —
    the exactly-once upload contract (S7's save_df_to_parquet shape with
    the atomicity the reference lacks)."""
    import json
    import os

    from steam_prices_data_engineering_spark.sources.steam_api_source import (
        register_steam_source,
    )

    register_steam_source(spark)
    out = str(tmp_path / "upload")
    df = spark.createDataFrame(
        [(i, f"body-{i}") for i in range(20)], "app LONG, body STRING"
    ).repartition(4)
    df.write.format("steam_appdetails").option("path", out).mode(
        "append"
    ).save()

    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert sum(e["rows"] for e in manifest["files"]) == 20
    # every manifest file exists, no stray staging files remain
    listed = set(os.listdir(out)) - {"_MANIFEST.json"}
    assert {e["file"] for e in manifest["files"]} == listed
    assert not any(name.startswith(".") for name in listed)
    # content round-trips
    rows = []
    for name in listed:
        with open(os.path.join(out, name)) as f:
            rows += [json.loads(line) for line in f]
    assert sorted((r["app"], r["body"]) for r in rows) == [
        (i, f"body-{i}") for i in range(20)
    ]


def test_custom_writer_abort_leaves_nothing_visible(spark, tmp_path):
    """If any partition fails, abort removes staged objects and no
    manifest appears: a failed job is invisible to readers."""
    import os

    import pytest

    from steam_prices_data_engineering_spark.sources.steam_api_source import (
        register_steam_source,
    )

    register_steam_source(spark)
    out = str(tmp_path / "upload_fail")
    df = spark.createDataFrame(
        [(i, f"body-{i}") for i in range(20)], "app LONG, body STRING"
    ).repartition(4)
    with pytest.raises(Exception, match="injected failure"):
        df.write.format("steam_appdetails").option("path", out).option(
            "fail_on_value", "13"
        ).mode("append").save()
    visible = [
        n for n in os.listdir(out) if not n.startswith(".")
    ] if os.path.isdir(out) else []
    assert "_MANIFEST.json" not in visible
    assert visible == []


def test_zorder_interleave_matches_reference_morton(spark):
    """The expression-built Morton code must equal the textbook bitwise
    interleave exactly: full 16x16 grid, bijective, a-bits at odd and
    b-bits at even positions."""
    from steam_prices_data_engineering_spark.functions.zorder import (
        _interleave,
    )
    from pyspark.sql import functions as F

    df = (
        spark.range(16)
        .selectExpr("id AS a")
        .crossJoin(spark.range(16).selectExpr("id AS b"))
        .select("a", "b", _interleave(F.col("a"), F.col("b"), 4).alias("z"))
    )
    rows = df.collect()

    def morton(a: int, b: int) -> int:
        z = 0
        for i in range(4):
            z |= ((a >> i) & 1) << (2 * i + 1)
            z |= ((b >> i) & 1) << (2 * i)
        return z

    assert len(rows) == 256
    assert len({r.z for r in rows}) == 256
    for r in rows:
        assert r.z == morton(r.a, r.b), (r.a, r.b, r.z)


def test_facet_map_pngs_partitioned_rendering(spark, tmp_path):
    """Per-continent facet artifact (round 7): the sink renders one
    CROPPED choropleth per facet group inside applyInPandas tasks —
    partitioned rendering, the driver sees only the (facet, path,
    n_keys, png_size) manifest. Each artifact decodes, its viewport is
    the facet's padded bbox (the probe country's label anchor must be
    non-ocean INSIDE ITS OWN facet's viewport), and the manifest's
    png_size matches the bytes on disk."""
    import struct
    import zlib

    from steam_prices_data_engineering_spark.plans import registry
    from steam_prices_data_engineering_spark.sinks.png import (
        COUNTRY_LABEL_POINTS,
        _facet_bbox,
    )
    from steam_prices_data_engineering_spark.sinks.png import (
        facet_map_pngs,
    )

    df = registry.queries()["world_map_job2_deviation"](
        spark, "/root/testdata/sf0.001"
    )
    out_dir = str(tmp_path / "facets")
    manifest = facet_map_pngs(
        df, "usd_dif", "iso_a3", "continent", out_dir
    ).collect()
    facets = {r["continent"]: r for r in manifest}
    assert len(facets) >= 2  # the geo dim spans several continents
    by_facet: dict = {}
    for r in df.select("continent", "iso_a3").collect():
        by_facet.setdefault(r["continent"], set()).add(r["iso_a3"])
    ocean = (210, 228, 240)
    for cont, row in facets.items():
        blob = open(row["path"], "rb").read()
        assert blob.startswith(b"\x89PNG\r\n\x1a\n"), cont
        assert row["png_size"] == len(blob), cont
        w, h, depth, ctype = struct.unpack(">IIBB", blob[16:26])
        assert (w, h) == (360, 180) and depth == 8 and ctype == 2
        idat_off = blob.index(b"IDAT") + 4
        idat_len = struct.unpack(">I", blob[idat_off - 8 : idat_off - 4])[0]
        raw = zlib.decompress(blob[idat_off : idat_off + idat_len])
        assert len(raw) == h * (1 + 3 * w), cont
        keys = by_facet[cont]
        assert row["n_keys"] == len(keys), cont
        lon0, lon1, lat0, lat1 = _facet_bbox(keys)

        def pixel(lon, lat):
            x = int((lon - lon0) / (lon1 - lon0) * w)
            y = int((lat1 - lat) / (lat1 - lat0) * h)
            off = y * (1 + 3 * w) + 1 + 3 * x
            return tuple(raw[off : off + 3])

        probed = 0
        for iso3 in keys:
            anchor = COUNTRY_LABEL_POINTS.get(iso3)
            if anchor is None:
                continue
            assert pixel(*anchor) != ocean, f"{cont}/{iso3}"
            probed += 1
        assert probed > 0, cont
