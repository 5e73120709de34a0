"""Audio-modality plumbing (north-star extension, SURVEY.md §2b
"multimodal columns"): windowed feature extraction over opaque audio
payloads.

The container has no audio codecs (librosa/ffmpeg), so the decode step is
a DETERMINISTIC FAKE PCM expansion — each payload byte stream expands to a
fixed-length int8 sample vector through pure arithmetic — while everything
Spark-side is the real contract a production decoder drops into:

- payloads travel as opaque `binary` next to typed metadata,
- decode + window-RMS runs as Arrow-batched `mapInPandas` (whole columnar
  batches through numpy, never row-at-a-time Python),
- the stage is narrow: windows inherit the input partitioning, no shuffle,
  so at 100 TB it scales with input splits exactly like a real
  decode/resample/feature stage.

The oracle replays the fake-decode arithmetic in SQL (integer ops + one
IEEE sqrt — bit-identical across engines), so unlike a stubbed decoder
this plumbing is value-verified end to end.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.rounding import dround_sql as R
from ..sources.tables import read_table
from .registry import register

_N_SAMPLES = 256  # fake-decoded samples per clip
_WINDOW = 64  # samples per analysis window -> 4 windows per clip

_AUDIO_RMS_SQL = f"""
WITH clip AS (
    -- zero-length payloads decode to NO windows (nothing to sample from);
    -- mirrored by the empty-guard in the UDF
    SELECT doc_id, text, length(text) AS len FROM documents
    WHERE length(text) > 0
),
smp AS (
    SELECT doc_id, i,
           ((unicode(substr(text, (i % len) + 1, 1)) * 31 + i * 7) % 256) - 128 AS s
    FROM (SELECT doc_id, text, len, unnest(range(0, {_N_SAMPLES})) AS i
          FROM clip)
)
SELECT doc_id,
       CAST(i // {_WINDOW} AS BIGINT) AS window_idx,
       CAST({_WINDOW} AS BIGINT) AS n_samples,
       {R(f"sqrt(sum(CAST(s * s AS DOUBLE)) / {_WINDOW})", 6)} AS rms
FROM smp
GROUP BY doc_id, i // {_WINDOW}
"""


@register("multimodal_audio_windows", _AUDIO_RMS_SQL)
def multimodal_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fake-PCM decode -> per-window RMS energy, via Arrow-batched
    mapInPandas (the audio-feature-extraction shape; swap the arithmetic
    expansion for a real codec one-for-one).

    Fake decode: sample_i = ((payload[i mod len] * 31 + 7*i) mod 256) - 128
    for i in [0, 256) (_N_SAMPLES); RMS over 64-sample (_WINDOW) windows. All
    integer arithmetic until one division + one correctly-rounded IEEE
    sqrt, so the SQL replay matches bit-for-bit."""
    from ..operators.multimodal import with_binary_payload

    media = with_binary_payload(read_table(spark, sf_dir, "documents"))

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("window_idx", T.LongType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("rms", T.DoubleType()),
        ]
    )

    def decode_rms(batches: Iterator) -> Iterator:
        import math

        import numpy as np
        import pandas as pd

        idx = np.arange(_N_SAMPLES, dtype=np.int64)
        n_windows = _N_SAMPLES // _WINDOW
        for pdf in batches:
            ids, widx, rms = [], [], []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                # Expand over CODE POINTS of the decoded payload (not raw
                # UTF-8 bytes) so the SQL replay's unicode(substr(...))
                # agrees even if a testdata regen introduces non-ASCII.
                chars = "" if content is None else bytes(content).decode("utf-8")
                if not chars:
                    # NULL/empty clip: no samples to expand -> no windows
                    # (matches the oracle's length(text) > 0 guard)
                    continue
                payload = np.fromiter(
                    map(ord, chars), dtype=np.int64, count=len(chars)
                )
                smp = (
                    (payload[idx % len(payload)] * 31 + idx * 7) % 256
                ) - 128
                sq = (smp * smp).reshape(n_windows, _WINDOW)
                # Integer window sums, then one float divide + sqrt per
                # window — mirrors the oracle's sum/div/sqrt exactly.
                sums = sq.sum(axis=1)
                for w in range(n_windows):
                    ids.append(doc_id)
                    widx.append(w)
                    rms.append(math.sqrt(float(sums[w]) / _WINDOW))
            out = pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "window_idx": pd.Series(widx, dtype="int64"),
                    "n_samples": pd.Series(
                        [_WINDOW] * len(ids), dtype="int64"
                    ),
                    "rms": pd.Series(rms, dtype="float64"),
                }
            )
            yield out

    decoded = media.mapInPandas(decode_rms, schema=out_schema)
    # dround the float AFTER the UDF stage (JVM-side) so the rounding
    # arithmetic is the shared cross-engine implementation.
    from ..functions.rounding import dround

    return decoded.select(
        "doc_id", "window_idx", "n_samples", dround(F.col("rms"), 6).alias("rms")
    )
