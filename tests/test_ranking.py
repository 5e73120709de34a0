"""Unit semantics for operators/ranking.py against the global-window
reference implementations they replace — parity must hold on ties,
n % k != 0 fills, descending orders, degenerate (empty / all-equal /
n < k) inputs, and across bin-boundary placements."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from steam_prices_data_engineering_spark.operators.ranking import (
    ntile_scores,
    prefix_sums_binned,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v double, c long")


def _rows(n, tie_every=0):
    # deterministic values with optional tie groups
    out = []
    for i in range(n):
        v = float((i * 37) % 101)
        if tie_every and i % tie_every == 0:
            v = 50.0
        out.append((i, v, (i % 5) + 1))
    return out


@pytest.mark.parametrize("n,k,tie_every", [
    (97, 4, 0), (100, 4, 7), (11, 3, 2), (3, 4, 0), (64, 10, 3),
])
def test_ntile_scores_matches_global_ntile(spark, n, k, tie_every):
    df = _df(spark, _rows(n, tie_every))
    got = ntile_scores(
        df.cache(), "k", {"b_asc": (F.col("v"), False),
                          "b_desc": (F.col("v"), True)}, k
    ).select("k", "b_asc", "b_desc")
    ref = df.select(
        "k",
        F.ntile(k).over(Window.orderBy(F.asc("v"), F.asc("k")))
        .cast("long").alias("b_asc"),
        F.ntile(k).over(Window.orderBy(F.desc("v"), F.asc("k")))
        .cast("long").alias("b_desc"),
    )
    assert sorted(got.collect()) == sorted(ref.collect())


def test_ntile_scores_empty_and_all_equal(spark):
    empty = _df(spark, []).cache()
    assert ntile_scores(empty, "k", {"b": (F.col("v"), False)}, 4).count() == 0
    eq = _df(spark, [(i, 7.0, 1) for i in range(10)]).cache()
    got = ntile_scores(eq, "k", {"b": (F.col("v"), False)}, 4)
    ref = eq.select(
        "k",
        F.ntile(4).over(Window.orderBy(F.asc("v"), F.asc("k")))
        .cast("long").alias("b"),
    )
    assert sorted(r["b"] for r in got.collect()) == sorted(
        r["b"] for r in ref.collect()
    )


@pytest.mark.parametrize("desc,exclusive", [
    (False, False), (False, True), (True, False), (True, True),
])
def test_prefix_sums_binned_matches_global_window(spark, desc, exclusive):
    # distinct order values (the operator's distinct-grain contract)
    rows = [(i, float(i * 13 % 997), (i % 9) + 1) for i in range(200)]
    df = _df(spark, rows)
    got = prefix_sums_binned(
        df, F.col("v"), {"cs": F.col("c")}, desc=desc, exclusive=exclusive
    ).select("k", "cs")
    order = F.desc("v") if desc else F.asc("v")
    hi = -1 if exclusive else Window.currentRow
    w = Window.orderBy(order).rowsBetween(Window.unboundedPreceding, hi)
    cum = F.sum("c").over(w)
    if exclusive:
        cum = F.coalesce(cum, F.lit(0))
    ref = df.select("k", cum.alias("cs"))
    assert sorted(got.collect()) == sorted(ref.collect())


def test_prefix_sums_binned_empty(spark):
    empty = _df(spark, [])
    assert prefix_sums_binned(
        empty, F.col("v"), {"cs": F.col("c")}
    ).count() == 0


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=12), min_size=1, max_size=60
    ),
    k=st.integers(min_value=2, max_value=7),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_ntile_scores_property_matches_global_ntile(spark, vals, k):
    """Any tie structure, any n % k fill, any bucket count: the binned
    scorer equals the global-window ntile row for row."""
    rows = [(i, float(v), 1) for i, v in enumerate(vals)]
    df = _df(spark, rows)
    got = ntile_scores(
        df.cache(), "k", {"b": (F.col("v"), False)}, k
    ).select("k", "b")
    ref = df.select(
        "k",
        F.ntile(k).over(Window.orderBy(F.asc("v"), F.asc("k")))
        .cast("long").alias("b"),
    )
    assert sorted(got.collect()) == sorted(ref.collect())


def test_exact_quantile_cont_matches_percentile_small_and_large(spark):
    """Both code paths (direct percentile at n <= 100k; bracket-then-
    exact above) return the exact (n-1)*q interpolated value — compared
    against F.percentile on the same data, q in {0.1, 0.5, 0.9}."""
    from pyspark.sql import functions as F

    from steam_prices_data_engineering_spark.operators.ranking import (
        exact_quantile_cont,
    )

    # heavy-tailed values (cube of a hash-derived uniform) so the
    # bracket path faces the distribution that broke min-max binning
    big = spark.range(0, 250_000).select(
        (
            F.pow(
                (F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 6), 16, 10)
                 .cast("double") / 16777216.0) - 0.5,
                3,
            )
            * 1e6
        ).alias("v")
    )
    small = big.limit(5_000)
    for frame in (small, big):
        frame = frame.cache()
        for q in (0.1, 0.5, 0.9):
            got = exact_quantile_cont(frame, F.col("v"), q).collect()[0]
            exp = frame.agg(F.percentile("v", q)).collect()[0][0]
            assert got["value"] == exp, (q, got["value"], exp)
        assert got["n"] == frame.count()
        frame.unpersist()


def test_exact_quantile_cont_empty_input_null_row(spark):
    from pyspark.sql import functions as F

    from steam_prices_data_engineering_spark.operators.ranking import (
        exact_quantile_cont,
    )

    empty = spark.range(0).select(F.col("id").cast("double").alias("v"))
    r = exact_quantile_cont(empty, F.col("v"), 0.5).collect()
    assert len(r) == 1 and r[0]["value"] is None and r[0]["n"] == 0
