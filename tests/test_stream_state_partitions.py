"""Unit tests for the footer-derived state-partition sizing (r11,
VERDICT r10 next-round #8: replace the fixed local default with a
data-derived count, keeping the env override)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from steam_prices_data_engineering_spark.streaming.windows import (
    stream_state_partitions,
)


def _write(path, n):
    pq.write_table(pa.table({"x": pa.array(range(n))}), path)


def test_local_sf_rows_derive_the_measured_floor(tmp_path):
    # 100k rows (sf0.1 events) -> the measured-optimal 4.
    p = str(tmp_path / "e.parquet")
    _write(p, 100_000)
    assert stream_state_partitions(p) == "4"


def test_large_landing_scales_up_and_caps(tmp_path):
    p = str(tmp_path / "e.parquet")
    _write(p, 1_000_000)
    # 1M rows / 50k = 20 -> next pow2 = 32
    assert stream_state_partitions(p) == "32"
    assert stream_state_partitions(p, cap=16) == "16"


def test_directory_landing_sums_files(tmp_path):
    d = tmp_path / "land"
    d.mkdir()
    _write(str(d / "a.parquet"), 300_000)
    _write(str(d / "b.parquet"), 300_000)
    # 600k / 50k = 12 -> 16
    assert stream_state_partitions(str(d)) == "16"


def test_missing_path_falls_back_to_floor():
    assert stream_state_partitions(None) == "4"
    assert stream_state_partitions("/nonexistent/x.parquet", floor=8) == "8"


def test_env_override_wins(tmp_path, monkeypatch):
    p = str(tmp_path / "e.parquet")
    _write(p, 1_000_000)
    monkeypatch.setenv("SPARK_GRAFT_STREAM_STATE_PARTITIONS", "7")
    assert stream_state_partitions(p) == "7"
