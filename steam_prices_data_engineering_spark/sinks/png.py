"""PNG sink (S8): the reference's terminal artifact is a choropleth PNG
uploaded to object storage (`external_resources.py:54-68`,
`world_map_transformer.py:256-273`). The Spark-idiomatic split is:

- the ENGINE computes the small per-country aggregate (a few hundred
  rows after `world_map_job2_deviation`) — distributed, oracle-checked;
- the RENDER happens driver-side from the collected aggregate (SURVEY
  §1.1 "Figure" row), because rasterization of a <1 kB result is not
  cluster work.

This container ships no matplotlib/geopandas, so the renderer here is a
dependency-free PNG encoder (stdlib zlib + struct — PNG is zlib-deflated
filtered scanlines) drawing a deterministic heatmap strip: one column
per country, colored by the deviation value's position between the
min/max bounds (O30's Normalize(vmin, vmax) in the reference). A real
deployment swaps `render_heatmap_png` for a matplotlib/geopandas figure;
`save_png` (atomic tmp+rename write) and the collect-then-render
contract stay identical.
"""

from __future__ import annotations

import os
import struct
import zlib

from pyspark.sql import DataFrame

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _color(t: float) -> tuple[int, int, int]:
    """Blue (low) -> white (mid) -> red (high), t in [0, 1]."""
    t = min(1.0, max(0.0, t))
    if t < 0.5:
        s = t * 2.0
        return int(255 * s), int(255 * s), 255
    s = (t - 0.5) * 2.0
    return 255, int(255 * (1.0 - s)), int(255 * (1.0 - s))


def render_heatmap_png(
    values: list[float | None], height: int = 32, col_width: int = 4
) -> bytes:
    """Encode one heat column per value (NULL -> grey) as an RGB PNG."""
    vals = [v for v in values if v is not None]
    lo = min(vals) if vals else 0.0
    hi = max(vals) if vals else 1.0
    span = (hi - lo) or 1.0
    colors = [
        (_color((v - lo) / span) if v is not None else (128, 128, 128))
        for v in values
    ]
    width = max(1, len(colors) * col_width)
    row = bytearray()
    for c in colors:
        row.extend(bytes(c) * col_width)
    if not colors:
        row.extend(b"\x80\x80\x80" * width)
    raw = b"".join(b"\x00" + bytes(row) for _ in range(height))  # filter 0
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)  # 8-bit RGB
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 9))
        + _chunk(b"IEND", b"")
    )


def save_png(png_bytes: bytes, path: str) -> str:
    """Atomic local/object-store-adapter write (tmp + rename), mirroring
    the reference's buffer-then-upload (`external_resources.py:64-68`)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(png_bytes)
    os.replace(tmp, path)
    return path


def world_map_png(deviation_df: DataFrame, value_col: str, key_col: str, path: str) -> str:
    """S8 end-to-end: collect the (small) deviation aggregate, render,
    write. Sorted by key for a deterministic artifact."""
    rows = deviation_df.select(key_col, value_col).collect()
    rows.sort(key=lambda r: (r[key_col] is None, r[key_col]))
    png = render_heatmap_png([r[value_col] for r in rows])
    return save_png(png, path)
