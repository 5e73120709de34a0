"""Watermark state-expiry boundary for the stream-stream LEFT OUTER
interval join (plans/scale_patterns.py).

The oracle encodes Spark's eviction rule with a STRICT inequality: an
unmatched purchase emits iff p_ts + join-interval < global watermark,
where watermark = min over inputs of (max event time - 1 h). This test
pins the boundary case on the installed Spark: a purchase whose join
window ends EXACTLY at the watermark is still in state (not emitted),
one ending a second earlier is expired (emitted null-extended). If a
Spark upgrade ever flips the boundary to <=, this fails loudly and the
oracle in scale_patterns must change with it.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq

from steam_prices_data_engineering_spark.plans.scale_patterns import (
    streaming_leftouter_interval_join,
)


def _ts(h: int, m: int, s: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, h, m, s)


def test_leftouter_expiry_boundary(spark, tmp_path):
    # max purchase ts = 12:00, max error ts = 13:00
    # => global watermark after the final no-data batch = 11:00.
    rows = [
        # matched pair: emits eagerly regardless of the watermark
        (1, _ts(9, 0), 3, "purchase", 10.0, "{}"),
        (2, _ts(9, 5), 3, "error", 0.0, "{}"),
        # boundary: window end 10:50 + 10 min == 11:00 == watermark
        # -> still in state, must NOT emit (strict <)
        (3, _ts(10, 50), 1, "purchase", 20.0, "{}"),
        # one second inside: window end 10:59:59 < 11:00 -> expired, emits
        (4, _ts(10, 49, 59), 2, "purchase", 30.0, "{}"),
        # sets max purchase ts; its own window (12:10) is past the
        # watermark -> still in state, absent
        (5, _ts(12, 0), 4, "purchase", 40.0, "{}"),
        # sets max error ts
        (6, _ts(13, 0), 9, "error", 0.0, "{}"),
    ]
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))

    out = streaming_leftouter_interval_join(spark, str(tmp_path))
    got = {
        (r.user_id, r.p_epoch, r.e_epoch) for r in out.collect()
    }

    def epoch(t: dt.datetime) -> int:
        return int(t.replace(tzinfo=dt.timezone.utc).timestamp())

    matched = (3, epoch(_ts(9, 0)), epoch(_ts(9, 5)))
    expired = (2, epoch(_ts(10, 49, 59)), None)
    assert matched in got, got
    assert expired in got, got
    # boundary purchase (user 1) and young purchase (user 4): in state, absent
    assert not any(u in (1, 4) for u, _, _ in got), got


def test_fullouter_expiry_boundary_both_sides(spark, tmp_path):
    """Full-outer variant: BOTH sides' expiry rules are strict. An error
    exactly ON the watermark stays in state (absent); one a second older
    is expired (emits null-extended). Left-side rule as in the left-outer
    test."""
    from steam_prices_data_engineering_spark.plans.scale_patterns import (
        streaming_fullouter_interval_join,
    )

    rows = [
        (1, _ts(9, 0), 3, "purchase", 10.0, "{}"),   # matched pair
        (2, _ts(9, 5), 3, "error", 0.0, "{}"),
        (3, _ts(11, 0), 1, "error", 0.0, "{}"),      # e_ts == wm: in state
        (4, _ts(10, 59, 59), 2, "error", 0.0, "{}"), # e_ts < wm: expired
        (5, _ts(10, 50), 5, "purchase", 20.0, "{}"), # window end == wm: in state
        (6, _ts(10, 49, 59), 6, "purchase", 30.0, "{}"),  # expired
        (7, _ts(12, 0), 4, "purchase", 40.0, "{}"),  # max p, young
        (8, _ts(13, 0), 9, "error", 0.0, "{}"),      # max e, young
    ]
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))

    out = streaming_fullouter_interval_join(spark, str(tmp_path))
    got = {(r.user_id, r.p_epoch, r.e_epoch) for r in out.collect()}

    def epoch(t: dt.datetime) -> int:
        return int(t.replace(tzinfo=dt.timezone.utc).timestamp())

    assert (3, epoch(_ts(9, 0)), epoch(_ts(9, 5))) in got, got      # matched
    assert (2, None, epoch(_ts(10, 59, 59))) in got, got            # err expired
    assert (6, epoch(_ts(10, 49, 59)), None) in got, got            # pur expired
    # boundary + young rows: still in state, absent
    assert not any(u in (1, 5, 4, 9) for u, _, _ in got), got


def test_join_then_window_emission_boundary(spark, tmp_path):
    """Multi-stateful chain (plans/round8.py): the interval join delays
    the downstream watermark by the join-interval UPPER bound, so a
    window emits iff window_end < least(max_p, max_e) - (1 h + 10 min),
    STRICT. Pin both the offset and the strictness: with max purchase
    11:55 the boundary is 10:45 — the window ending exactly 10:45 stays
    in state; the one ending 10:30 emits."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from steam_prices_data_engineering_spark.plans.round8 import (
        streaming_join_then_window,
    )

    rows = [
        # early pair -> window [9:00, 9:15) emits
        (1, _ts(9, 0), 3, "purchase", 10.0, "{}"),
        (2, _ts(9, 5), 3, "error", 0.0, "{}"),
        # boundary pair -> window [10:30, 10:45): end == boundary, held
        (3, _ts(10, 31), 1, "purchase", 20.0, "{}"),
        (4, _ts(10, 35), 1, "error", 0.0, "{}"),
        # just-inside pair -> window [10:15, 10:30) emits
        (5, _ts(10, 29), 2, "purchase", 30.0, "{}"),
        (6, _ts(10, 29, 30), 2, "error", 0.0, "{}"),
        # watermark setters (unmatched)
        (7, _ts(11, 55), 4, "purchase", 40.0, "{}"),
        (8, _ts(13, 0), 9, "error", 0.0, "{}"),
    ]
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))

    got = {
        r.window_start: (r.n_pairs, r.sum_purchase_value)
        for r in streaming_join_then_window(spark, str(tmp_path)).collect()
    }

    def epoch(t: dt.datetime) -> int:
        return int(t.replace(tzinfo=dt.timezone.utc).timestamp())

    assert got == {
        epoch(_ts(9, 0)): (1, 10.0),
        epoch(_ts(10, 15)): (1, 30.0),
    }, got
