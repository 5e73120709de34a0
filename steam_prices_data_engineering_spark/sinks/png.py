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
  raster where each country's polygon outline (COUNTRY_POLYGONS — a
  coarse hand-digitized atlas; scanline even-odd fill) is colored by the
  deviation value's position between the min/max bounds (O30's
  Normalize(vmin, vmax) in the reference), NULL-valued countries grey,
  coastline 1-px darkened, ocean light blue — the reference's geopandas
  choropleth visual contract (`world_map_transformer.py:214-254`) with
  simplified geometry (naturalearth isn't shipped in this container).
- `render_heatmap_png`: the one-column-per-key strip, kept as the
  compact artifact for non-geographic aggregates.

A real deployment swaps the coarse atlas for naturalearth polygon rings
one-for-one (the scanline fill consumes any ring list); `save_png`
(atomic tmp+rename write) and the collect-then-render contract stay
identical.
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

# Coarse country OUTLINES (lon, lat vertex rings; multi-ring = islands),
# hand-digitized public-geography approximations (~10-25 vertices per
# country, deliberately generous so each COUNTRY_BOXES center is
# interior). This replaces the round-2 bounding-box fill with real
# scanline-filled polygons — the reference's visual contract
# (`world_map_transformer.py:214-254` draws naturalearth polygons); a
# production deployment swaps this atlas for naturalearth WKT one-for-one
# (the fill algorithm below consumes any ring list).
COUNTRY_POLYGONS: dict[str, list[list[tuple[float, float]]]] = {
    "USA": [[(-124.0, 48.0), (-124.0, 40.0), (-120.0, 34.0), (-117.0, 32.0),
             (-106.0, 31.0), (-103.0, 29.0), (-99.0, 27.0), (-97.0, 26.0),
             (-94.0, 29.0), (-90.0, 29.0), (-84.0, 30.0), (-81.0, 25.0),
             (-80.0, 27.0), (-76.0, 35.0), (-71.0, 41.0), (-67.0, 45.0),
             (-69.0, 47.0), (-83.0, 46.0), (-95.0, 49.0)]],
    "BRA": [[(-70.0, -4.0), (-60.0, 2.0), (-51.0, 4.0), (-44.0, -2.0),
             (-35.0, -7.0), (-39.0, -13.0), (-39.0, -18.0), (-41.0, -23.0),
             (-48.0, -26.0), (-53.0, -33.0), (-57.0, -30.0), (-58.0, -24.0),
             (-58.0, -20.0), (-65.0, -10.0), (-70.0, -8.0)]],
    "ARG": [[(-70.0, -22.0), (-62.0, -22.0), (-58.0, -27.0), (-58.0, -33.0),
             (-62.0, -39.0), (-62.0, -41.0), (-65.0, -45.0), (-66.0, -49.0),
             (-68.0, -52.0), (-65.0, -55.0), (-72.0, -54.0), (-72.0, -45.0),
             (-70.0, -36.0), (-70.0, -30.0)]],
    "GBR": [[(-5.5, 50.0), (-3.0, 51.0), (1.0, 51.0), (2.0, 52.5),
             (0.0, 53.0), (-0.5, 54.5), (-1.5, 56.0), (-2.0, 57.5),
             (-3.0, 58.5), (-5.0, 58.0), (-5.0, 56.5), (-3.5, 55.0),
             (-4.5, 53.5), (-3.2, 53.0), (-5.5, 51.5)]],
    "FRA": [[(-4.5, 48.5), (-1.5, 49.5), (1.5, 51.0), (4.0, 50.0),
             (8.0, 49.0), (7.5, 47.5), (6.0, 46.0), (7.0, 43.5),
             (3.0, 43.0), (0.0, 42.5), (-1.5, 43.5), (-1.0, 46.0),
             (-4.5, 47.5)]],
    "ESP": [[(-9.0, 43.0), (-7.5, 43.5), (-2.0, 43.5), (3.0, 42.0),
             (0.0, 40.0), (0.5, 38.5), (-2.0, 36.5), (-5.5, 36.0),
             (-7.0, 37.0), (-9.0, 38.5), (-8.5, 42.0)]],
    "DEU": [[(6.0, 51.5), (7.0, 53.5), (9.0, 54.5), (11.0, 54.0),
             (14.0, 54.0), (15.0, 51.0), (12.0, 50.0), (13.0, 48.5),
             (10.0, 47.5), (7.5, 47.5), (8.0, 49.0), (6.0, 49.5)]],
    "ITA": [[(7.0, 44.0), (9.0, 46.0), (13.5, 46.5), (13.5, 45.5),
             (12.5, 44.0), (14.0, 42.5), (16.0, 41.5), (18.5, 40.0),
             (16.5, 39.5), (16.0, 38.0), (15.5, 40.0), (14.0, 40.5),
             (11.8, 41.8), (10.0, 43.0), (7.5, 43.5)],
            # Sicily + Sardinia, coarse
            [(12.5, 38.2), (15.5, 38.3), (15.0, 36.7), (12.8, 37.5)],
            [(8.2, 41.2), (9.7, 41.0), (9.5, 39.0), (8.5, 39.0)]],
    "SWE": [[(12.0, 58.0), (11.5, 59.5), (17.0, 60.5), (17.5, 61.0),
             (20.0, 64.0), (22.0, 65.5), (23.5, 67.0), (20.0, 69.0),
             (17.5, 68.0), (15.5, 66.5), (14.0, 64.0), (12.5, 61.0)]],
    "NOR": [[(5.0, 58.0), (5.0, 61.0), (7.0, 63.0), (9.0, 65.0),
             (12.0, 67.0), (15.0, 68.5), (19.0, 70.0), (25.0, 71.0),
             (31.0, 70.5), (28.0, 69.0), (21.0, 67.5), (18.7, 64.8),
             (15.0, 62.5), (10.0, 60.0), (7.0, 58.0)]],
    "POL": [[(14.2, 53.8), (16.0, 54.5), (18.5, 54.8), (23.0, 54.2),
             (24.0, 52.0), (23.5, 50.5), (21.0, 49.2), (19.0, 49.4),
             (16.0, 50.2), (14.5, 51.0)]],
    "JPN": [[(130.0, 31.0), (132.0, 34.0), (134.0, 35.5), (135.0, 36.5),
             (136.0, 39.5), (138.0, 41.0), (140.0, 43.0), (142.5, 44.5),
             (145.5, 44.2), (144.0, 42.5), (141.5, 41.0), (141.0, 38.5),
             (140.3, 35.8), (138.5, 34.5), (135.5, 33.6), (132.5, 32.5),
             (131.0, 30.6)]],
    "CHN": [[(74.0, 38.0), (80.0, 45.0), (87.0, 49.0), (97.0, 43.0),
             (110.0, 43.0), (117.0, 41.0), (124.0, 46.0), (131.0, 48.0),
             (135.0, 48.5), (131.0, 43.0), (125.0, 40.0), (121.0, 37.0),
             (119.0, 35.0), (121.0, 31.0), (118.0, 25.0), (112.0, 21.0),
             (108.0, 21.5), (106.0, 23.0), (100.0, 22.0), (97.0, 25.0),
             (92.0, 28.0), (85.0, 29.0), (79.0, 32.0), (75.0, 35.0)]],
    "IND": [[(68.5, 23.5), (70.0, 21.0), (72.5, 19.0), (74.0, 15.0),
             (76.0, 9.0), (78.0, 8.5), (80.0, 13.0), (82.0, 17.0),
             (85.0, 19.5), (89.0, 21.5), (92.0, 22.0), (97.0, 28.0),
             (94.0, 29.5), (88.0, 27.5), (84.0, 28.5), (80.0, 30.5),
             (77.0, 33.0), (74.0, 34.5), (72.0, 31.0), (69.0, 27.0)]],
}

_OCEAN = (210, 228, 240)
_NODATA = (128, 128, 128)

WORLD_W = 720  # 0.5 degree per pixel
WORLD_H = 360


def _row_spans(
    rings: list[list[tuple[float, float]]], lat: float
) -> list[tuple[float, float]]:
    """Horizontal-scanline x-intervals (in lon) covered by the polygon at
    `lat`, even-odd rule with the half-open [y0, y1) edge convention (the
    standard fill rule — vertices and horizontal edges never double-count).
    """
    xs: list[float] = []
    for ring in rings:
        n = len(ring)
        for i in range(n):
            x0, y0 = ring[i]
            x1, y1 = ring[(i + 1) % n]
            if y0 == y1:
                continue
            if (y0 <= lat < y1) or (y1 <= lat < y0):
                xs.append(x0 + (lat - y0) * (x1 - x0) / (y1 - y0))
    xs.sort()
    return [(xs[i], xs[i + 1]) for i in range(0, len(xs) - 1, 2)]


def render_choropleth_png(
    values_by_iso3: dict[str, float | None],
    width: int = WORLD_W,
    height: int = WORLD_H,
) -> bytes:
    """Equirectangular world choropleth: each known country's polygon
    outline (COUNTRY_POLYGONS, scanline even-odd fill; bounding-box
    fallback for atlas misses) filled with the blue-white-red colormap of
    its value (grey for NULL), darkened 1-px coast border, ocean
    elsewhere. Unknown iso-3 keys are ignored (the reference's behavior
    for countries absent from the geo frame)."""
    vals = [v for v in values_by_iso3.values() if v is not None]
    lo = min(vals) if vals else 0.0
    hi = max(vals) if vals else 1.0
    span = (hi - lo) or 1.0

    # Paint into a flat RGB buffer, countries sorted for determinism.
    px = bytearray(bytes(_OCEAN) * (width * height))
    for iso3 in sorted(values_by_iso3):
        v = values_by_iso3[iso3]
        color = _color((v - lo) / span) if v is not None else _NODATA
        border = (
            max(0, color[0] - 60), max(0, color[1] - 60), max(0, color[2] - 60)
        )
        rings = COUNTRY_POLYGONS.get(iso3)
        if rings is not None:
            for y in range(height):
                lat = 90.0 - (y + 0.5) / height * 180.0
                base = y * width
                for lon0, lon1 in _row_spans(rings, lat):
                    x0 = max(0, int((lon0 + 180.0) / 360.0 * width))
                    x1 = min(width, int((lon1 + 180.0) / 360.0 * width) + 1)
                    # Sub-pixel span at small render sizes: keep the
                    # country visible with at least one pixel.
                    if x1 <= x0 and x0 < width:
                        x1 = x0 + 1
                    for x in range(x0, x1):
                        c = border if x in (x0, x1 - 1) else color
                        off = (base + x) * 3
                        px[off : off + 3] = bytes(c)
            continue
        box = COUNTRY_BOXES.get(iso3)
        if box is None:
            continue
        lon_min, lon_max, lat_min, lat_max = box
        x0 = int((lon_min + 180.0) / 360.0 * width)
        x1 = int((lon_max + 180.0) / 360.0 * width)
        y0 = int((90.0 - lat_max) / 180.0 * height)
        y1 = int((90.0 - lat_min) / 180.0 * height)
        # Sub-pixel box at small render sizes: paint at least one pixel.
        x1 = max(x1, min(x0 + 1, width))
        y1 = max(y1, min(y0 + 1, height))
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
