"""Malformed-record ingestion policy: at 100 TB some fraction of any JSON
landing is garbage, and a single bad line must not kill a thousand-task
job (the engine-level form of the reference's per-row try/except -> NaN
policy, `steam_prices_transformer.py:119-132`). Spark's three parser
modes cover the triage spectrum; these tests pin their contracts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

GOOD = [
    '{"doc_id": 1, "text": "alpha", "n_chars": 5}',
    '{"doc_id": 2, "text": "beta", "n_chars": 4}',
    '{"doc_id": 3, "text": "gamma", "n_chars": 5}',
]
BAD = [
    '{"doc_id": 4, "text": "unterminated',
    "not json at all",
]

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)


@pytest.fixture()
def jsonl_path(tmp_path):
    p = tmp_path / "landing.jsonl"
    p.write_text("\n".join(GOOD + BAD) + "\n")
    return str(p)


def test_permissive_quarantines_corrupt_rows(spark, jsonl_path):
    """PERMISSIVE (default): bad lines become rows with every data column
    NULL and the raw line preserved in _corrupt_record — the quarantine
    pattern: good rows flow on, bad rows land in a reject table for
    inspection, nothing throws."""
    df = (
        spark.read.schema(SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(jsonl_path)
    ).cache()  # corrupt-column queries require a materialized frame
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert good.count() == 3
    assert bad.count() == 2
    assert good.agg(F.sum("n_chars")).collect()[0][0] == 14
    # the raw line survives verbatim for the reject table
    assert set(r._corrupt_record for r in bad.collect()) == set(BAD)
    df.unpersist()


def test_dropmalformed_keeps_only_parseable(spark, jsonl_path):
    schema = T.StructType(SCHEMA.fields[:3])
    df = (
        spark.read.schema(schema)
        .option("mode", "DROPMALFORMED")
        .json(jsonl_path)
    )
    assert [r.doc_id for r in df.orderBy("doc_id").collect()] == [1, 2, 3]


def test_failfast_raises_on_first_corrupt(spark, jsonl_path):
    schema = T.StructType(SCHEMA.fields[:3])
    df = spark.read.schema(schema).option("mode", "FAILFAST").json(jsonl_path)
    with pytest.raises(Exception, match="FAILFAST|Malformed"):
        df.collect()


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Landed tables evolve: a later batch adds a column. mergeSchema
    unions the footers — old files surface NULL for the new column, new
    files fill it; an explicit-schema read of the common subset keeps
    working against BOTH generations (the contract that lets readers and
    writers deploy independently)."""
    out = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id LONG, text STRING"
    ).write.mode("append").parquet(out)
    spark.createDataFrame(
        [(3, "gamma", "en")], "doc_id LONG, text STRING, lang STRING"
    ).write.mode("append").parquet(out)

    merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(merged.columns) == {"doc_id", "text", "lang"}
    rows = {r.doc_id: r.lang for r in merged.collect()}
    assert rows == {1: None, 2: None, 3: "en"}

    # explicit-subset read spans both file generations
    subset = (
        spark.read.schema("doc_id LONG, text STRING").parquet(out).collect()
    )
    assert sorted(r.doc_id for r in subset) == [1, 2, 3]


# ---------------------------------------------------------------------------
# Connector-edge semantics (reference O34): throttle + retry/backoff.
# Clock and sleeper are injected, so these are pure unit tests.
# ---------------------------------------------------------------------------


def test_rate_limiter_enforces_min_interval():
    from steam_prices_data_engineering_spark.sources.steam_api_source import (
        RateLimiter,
    )

    now = [0.0]
    slept = []

    def clock():
        return now[0]

    def sleeper(s):
        slept.append(s)
        now[0] += s

    rl = RateLimiter(3.0, clock=clock, sleeper=sleeper)
    assert rl.wait() == 0.0  # first call never sleeps
    now[0] += 1.0  # 1s of work elapsed
    assert rl.wait() == 2.0  # pad to the 3s interval
    now[0] += 5.0  # slow fetch: already past the interval
    assert rl.wait() == 0.0
    assert slept == [2.0]


def test_rate_limiter_zero_interval_never_sleeps():
    from steam_prices_data_engineering_spark.sources.steam_api_source import (
        RateLimiter,
    )

    slept = []
    rl = RateLimiter(0.0, clock=lambda: 0.0, sleeper=slept.append)
    for _ in range(3):
        assert rl.wait() == 0.0
    assert slept == []


def test_fetch_retry_backs_off_then_succeeds():
    from steam_prices_data_engineering_spark.sources.steam_api_source import (
        fetch_with_retry,
    )

    calls = []
    slept = []

    def flaky(app):
        calls.append(app)
        if len(calls) <= 2:
            raise ConnectionError("transient")
        return "ok"

    out = fetch_with_retry(
        10, fetch=flaky, max_retries=3, backoff_seconds=1.0,
        sleeper=slept.append,
    )
    assert out == "ok"
    assert calls == [10, 10, 10]
    assert slept == [1.0, 2.0]  # exponential: 1, then 2


def test_fetch_retry_exhausts_and_reraises():
    import pytest

    from steam_prices_data_engineering_spark.sources.steam_api_source import (
        fetch_with_retry,
    )

    slept = []

    def dead(app):
        raise ConnectionError("down")

    with pytest.raises(ConnectionError):
        fetch_with_retry(
            10, fetch=dead, max_retries=2, backoff_seconds=0.5,
            sleeper=slept.append,
        )
    assert slept == [0.5, 1.0]  # max_retries sleeps, then re-raise


def test_reader_batches_apps_and_paces_within_partition(monkeypatch):
    """ADVICE r4: one-app partitions made throttle_seconds a no-op (a
    fresh limiter's first wait never sleeps). With a throttle the reader
    must batch apps into one partition and pace requests 2..N through a
    SINGLE limiter instance."""
    from steam_prices_data_engineering_spark.sources import steam_api_source as m

    r = m.SteamAppDetailsReader({"throttle_seconds": "3.0"})
    parts = r.partitions()
    assert len(parts) == 1  # serial polite fetch by default when throttled
    assert [a for a in parts[0].value] == [10, 20, 30, 40]

    # drive read() with an injectable clock so the pacing is observable
    slept = []
    now = [0.0]

    class FakeTime:
        @staticmethod
        def monotonic():
            return now[0]

        @staticmethod
        def sleep(s):
            slept.append(s)
            now[0] += s

    real_init = m.RateLimiter.__init__

    def patched(self, min_interval, clock=None, sleeper=None):
        real_init(self, min_interval, clock=FakeTime.monotonic,
                  sleeper=FakeTime.sleep)

    monkeypatch.setattr(m.RateLimiter, "__init__", patched)
    rows = list(r.read(parts[0]))
    assert [app for app, _ in rows] == [10, 20, 30, 40]
    assert slept == [3.0, 3.0, 3.0]  # first request free, 2..N paced

    # unthrottled: max fan-out (one app per partition), nothing sleeps
    r0 = m.SteamAppDetailsReader({})
    parts0 = r0.partitions()
    assert len(parts0) == 4
    assert [p.value for p in parts0] == [[10], [20], [30], [40]]

    # explicit override: 2 apps per partition regardless of throttle
    r2 = m.SteamAppDetailsReader(
        {"throttle_seconds": "3.0", "apps_per_partition": "2"}
    )
    assert [p.value for p in r2.partitions()] == [[10, 20], [30, 40]]
