"""Vector math over `array<float>` embedding columns as pure expressions.

Dot product / norms / cosine via `zip_with` + `aggregate` higher-order
functions — JVM-side, no UDF, no shuffle. All math is done in double
precision with left-to-right accumulation so DuckDB's sequential list
aggregates produce bit-identical results (oracle parity).

For 100 TB scale the brute-force form is the verification baseline; the
LSH-bucketed form in operators/similarity.py is the scale path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(to_double_array(a), to_double_array(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            to_double_array(a), F.lit(0.0), lambda acc, x: acc + x * x
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
