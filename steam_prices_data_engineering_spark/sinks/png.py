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
filtered scanlines). Two renderers share it:

- `render_choropleth_png` (the S8 artifact): an equirectangular world
  raster where each country fills its approximate bounding box, colored
  by the deviation value's position between the min/max bounds (O30's
  Normalize(vmin, vmax) in the reference), NULL-valued countries grey,
  ocean light blue — the same visual contract as the reference's
  geopandas choropleth (`world_map_transformer.py:214-254`) minus true
  polygon outlines, which need a geometry source this container lacks.
- `render_heatmap_png`: the one-column-per-key strip, kept as the
  compact artifact for non-geographic aggregates.

A real deployment swaps the rectangle atlas for naturalearth polygons;
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


# Approximate country bounding boxes (lon_min, lon_max, lat_min, lat_max),
# public-geography approximations for the engine's static geo dim
# (plans/pipelines.py:WORLD_GEO). A real deployment replaces this atlas
# with naturalearth polygons; the renderer contract is unchanged.
COUNTRY_BOXES: dict[str, tuple[float, float, float, float]] = {
    "USA": (-125.0, -70.0, 25.0, 49.0),
    "BRA": (-74.0, -35.0, -33.0, 5.0),
    "ARG": (-73.0, -53.0, -55.0, -22.0),
    "GBR": (-8.0, 2.0, 50.0, 59.0),
    "FRA": (-5.0, 8.0, 42.0, 51.0),
    "ESP": (-9.0, 3.0, 36.0, 44.0),
    "DEU": (6.0, 15.0, 47.0, 55.0),
    "ITA": (7.0, 18.0, 37.0, 47.0),
    "SWE": (11.0, 24.0, 55.0, 69.0),
    "NOR": (4.0, 31.0, 58.0, 71.0),
    "POL": (14.0, 24.0, 49.0, 55.0),
    "JPN": (129.0, 146.0, 31.0, 45.0),
    "CHN": (74.0, 135.0, 18.0, 53.0),
    "IND": (68.0, 97.0, 8.0, 35.0),
}

_OCEAN = (210, 228, 240)
_NODATA = (128, 128, 128)

WORLD_W = 720  # 0.5 degree per pixel
WORLD_H = 360


def render_choropleth_png(
    values_by_iso3: dict[str, float | None],
    width: int = WORLD_W,
    height: int = WORLD_H,
) -> bytes:
    """Equirectangular world choropleth: each known country's bounding box
    filled with the blue-white-red colormap of its value (grey for NULL),
    ocean elsewhere. Unknown iso-3 keys are ignored (the reference's
    behavior for countries absent from the geo frame)."""
    vals = [v for v in values_by_iso3.values() if v is not None]
    lo = min(vals) if vals else 0.0
    hi = max(vals) if vals else 1.0
    span = (hi - lo) or 1.0

    # Paint into a flat RGB buffer, countries sorted for determinism.
    px = bytearray(bytes(_OCEAN) * (width * height))
    for iso3 in sorted(values_by_iso3):
        box = COUNTRY_BOXES.get(iso3)
        if box is None:
            continue
        v = values_by_iso3[iso3]
        color = _color((v - lo) / span) if v is not None else _NODATA
        lon_min, lon_max, lat_min, lat_max = box
        x0 = int((lon_min + 180.0) / 360.0 * width)
        x1 = int((lon_max + 180.0) / 360.0 * width)
        y0 = int((90.0 - lat_max) / 180.0 * height)
        y1 = int((90.0 - lat_min) / 180.0 * height)
        border = (
            max(0, color[0] - 60), max(0, color[1] - 60), max(0, color[2] - 60)
        )
        for y in range(max(0, y0), min(height, y1)):
            on_edge_y = y in (y0, y1 - 1)
            base = y * width
            for x in range(max(0, x0), min(width, x1)):
                c = border if (on_edge_y or x in (x0, x1 - 1)) else color
                off = (base + x) * 3
                px[off : off + 3] = bytes(c)

    raw = b"".join(
        b"\x00" + bytes(px[y * width * 3 : (y + 1) * width * 3])
        for y in range(height)
    )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
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
    """S8 end-to-end: collect the (small) deviation aggregate keyed by
    iso-3, render the world choropleth, write atomically. Last value wins
    on duplicate keys after a deterministic sort (the EU-collapsed rows
    carry equal fills, so order doesn't change the artifact)."""
    rows = deviation_df.select(key_col, value_col).collect()
    rows.sort(key=lambda r: (r[key_col] is None, r[key_col]))
    values = {r[key_col]: r[value_col] for r in rows if r[key_col] is not None}
    png = render_choropleth_png(values)
    return save_png(png, path)
