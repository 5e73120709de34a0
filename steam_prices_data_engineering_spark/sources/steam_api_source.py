"""Custom Python DataSource for the Steam appdetails connector (S1).

The reference fetches Steam prices driver-side, one HTTPS GET per
(app, country) with a 3 s throttle (`external_resources.py:116-137`,
`steam_prices_transformer.py:138,166` — O34). In Spark the idiomatic
shape for such a connector is a FIRST-CLASS SOURCE: Spark 4's Python
DataSource API (`pyspark.sql.datasource`) lets the REST client live
behind `spark.read.format("steam_appdetails")`, with

- `partitions()` -> one `InputPartition` per BATCH of app ids: the unit
  of parallel fetching AND of pacing. Unthrottled, each app is its own
  partition and 10k apps fan out across executors instead of
  serializing through the driver loop. With `throttle_seconds` set, all
  apps default into ONE partition so a single `RateLimiter` instance
  paces every request after the first — the reference's serial polite
  fetch; `apps_per_partition` dials the politeness/parallelism trade
  explicitly (aggregate rate = partitions / interval).
- `read(partition)` -> (app, body) rows: the RAW payload enters the
  engine; JSON-path extraction/parsing stays in the declarative layer
  (see plans/pipelines.py `steam_api_json_extract`) where Catalyst can
  see it — the connector never hides transformations.

Tests/oracle run against the same deterministic payload fixtures the
driver-side variant uses (`API_PAYLOADS` below); a live deployment swaps
`_fetch` for the HTTP call and nothing else changes.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

# Deterministic appdetails payloads: 3 parsable locales + 1 failed fetch
# (success=false -> NULL extraction downstream, the reference's
# assert-and-skip as NULL propagation).
API_PAYLOADS: list[tuple[int, str]] = [
    (
        10,
        '{"10": {"success": true, "data": {"price_overview": '
        '{"final_formatted": "$19.99", "currency": "USD"}}}}',
    ),
    (
        20,
        '{"20": {"success": true, "data": {"price_overview": '
        '{"final_formatted": "22,50 €", "currency": "EUR"}}}}',
    ),
    (
        30,
        '{"30": {"success": true, "data": {"price_overview": '
        '{"final_formatted": "1.299,00 kr", "currency": "SEK"}}}}',
    ),
    (40, '{"40": {"success": false}}'),
]


def _fetch(app_id: int) -> str:
    """Stand-in for the HTTPS GET. Deterministic fixture lookup here;
    a live connector issues the request (with its rate limiter) instead."""
    return dict(API_PAYLOADS)[app_id]


class RateLimiter:
    """Minimum-interval throttle — the reference's polite 3 s sleep
    between requests (`steam_prices_transformer.py:138` /
    `external_resources.py:116-137`, O34), PER PARTITION: on a cluster
    each fetch task throttles itself, so aggregate politeness scales as
    interval / parallelism and the cap is set via `throttle_seconds` x
    expected task concurrency. Clock and sleeper are injectable so the
    semantics are unit-testable without wall-clock waits."""

    def __init__(self, min_interval: float, clock=None, sleeper=None):
        import time

        self._interval = float(min_interval)
        self._clock = clock or time.monotonic
        self._sleep = sleeper or time.sleep
        self._last: float | None = None

    def wait(self) -> float:
        """Block until the interval has elapsed since the previous call;
        returns the seconds actually slept (0.0 on the first call)."""
        slept = 0.0
        if self._interval > 0 and self._last is not None:
            due = self._last + self._interval
            now = self._clock()
            if now < due:
                slept = due - now
                self._sleep(slept)
        self._last = self._clock()
        return slept


def fetch_with_retry(
    app_id: int,
    fetch=_fetch,
    max_retries: int = 3,
    backoff_seconds: float = 1.0,
    sleeper=None,
) -> str:
    """The reference's assert-and-retry fetch contract
    (`steam_prices_transformer.py:166`): re-issue a failed request up to
    `max_retries` times with exponential backoff (backoff * 2^attempt),
    then re-raise the last error so the task (and Spark's own task-retry
    layer above it) sees the failure."""
    import time

    sleep = sleeper or time.sleep
    last: Exception | None = None
    for attempt in range(max_retries + 1):
        try:
            return fetch(app_id)
        except Exception as e:  # noqa: BLE001 — transport errors are retryable
            last = e
            if attempt < max_retries:
                sleep(backoff_seconds * (2**attempt))
    raise last  # type: ignore[misc]


class SteamAppDetailsReader(DataSourceReader):
    def __init__(self, options):
        ids = options.get("app_ids")
        self._app_ids = (
            [int(x) for x in ids.split(",")]
            if ids
            else [app for app, _ in API_PAYLOADS]
        )
        # Connector-edge knobs (reference O34). Fixture fetches are local
        # so both default to "off"/instant; a live deployment sets
        # throttle_seconds=3 to reproduce the reference's pacing.
        self._throttle = float(options.get("throttle_seconds", 0.0))
        self._max_retries = int(options.get("max_retries", 3))
        self._backoff = float(options.get("backoff_seconds", 1.0))
        app = options.get("apps_per_partition")
        self._apps_per_partition = int(app) if app is not None else None

    def partitions(self):
        # A partition is a BATCH of app ids — the unit both of parallelism
        # and of pacing (one RateLimiter instance lives across a
        # partition's fetch loop; a limiter cannot pace across tasks).
        # Default sizing follows the throttle: with throttle_seconds > 0
        # the reference's O34 semantics are SERIAL polite fetching, so all
        # apps land in one partition and every request after the first
        # waits the full interval; with no throttle each app gets its own
        # partition for maximum fan-out. `apps_per_partition` overrides —
        # B apps per partition with P = N/B concurrent tasks trades
        # politeness for wall-clock (aggregate rate = P / interval).
        b = self._apps_per_partition
        if b is None:
            b = len(self._app_ids) if self._throttle > 0 else 1
        b = max(1, b)
        ids = self._app_ids
        return [
            InputPartition(ids[i : i + b]) for i in range(0, len(ids), b)
        ]

    def read(self, partition):
        limiter = RateLimiter(self._throttle)
        for app in partition.value:
            limiter.wait()
            yield app, fetch_with_retry(
                app,
                max_retries=self._max_retries,
                backoff_seconds=self._backoff,
            )


class SteamAppDetailsStreamReader(SimpleDataSourceStreamReader):
    """Streaming form: each microbatch is one POLL of the endpoint, and a
    poll returns everything past the reader's cursor (offset = index into
    the app list; a live connector tracks the endpoint's change cursor the
    same way). The offset contract — initialOffset / read -> (rows, next)
    / exact replay via readBetweenOffsets — is what gives the stream
    end-to-end-exactly-once over a restart: committed offsets re-read the
    same rows. An availableNow trigger drains one poll and stops."""

    def __init__(self, options):
        ids = options.get("app_ids")
        self._app_ids = (
            [int(x) for x in ids.split(",")]
            if ids
            else [app for app, _ in API_PAYLOADS]
        )

    def initialOffset(self) -> dict:
        return {"index": 0}

    def read(self, start: dict):
        i = start["index"]
        end = len(self._app_ids)
        # A LIST, not a generator: the prefetched batch is pickled into the
        # offset log cache for replay.
        rows = [(app, _fetch(app)) for app in self._app_ids[i:end]]
        return rows, {"index": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        for i in range(start["index"], end["index"]):
            app = self._app_ids[i]
            yield app, _fetch(app)


@dataclass
class _StagedFile(WriterCommitMessage):
    path: str
    rows: int


class SteamUploadWriter(DataSourceWriter):
    """The sink half of the connector (S7's `upload_fileobj` shape,
    `external_resources.py:38-52`) with the exactly-once two-phase
    protocol the reference lacks:

    - `write(iterator)` runs once per partition (executor-side): rows are
      serialized to a STAGED object invisible to readers (the dotfile
      prefix — a real deployment stages under a temp key / multipart
      upload), and a commit message describes what was staged.
    - `commit(messages)` runs once on the driver only after EVERY
      partition succeeded: staged objects are promoted and a manifest
      records the exact committed file set — readers trust the manifest,
      so partial job failures can never expose half a write.
    - `abort(messages)` deletes whatever was staged.
    """

    def __init__(self, options):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("steam_appdetails writer requires option 'path'")
        # Object-store-shaped addressing: accept a URI and resolve it
        # through the shared sources/io.py helper (this runs driver-side,
        # before the instance is pickled to executors, so only the
        # resolved string travels). The staged-object + manifest-commit
        # protocol below is exactly what an S3 deployment needs
        # (rename-free readers: they trust the manifest, not directory
        # listing) — only the byte transport would swap to a client SDK.
        from .io import local_path

        try:
            self._path = local_path(self._path)
        except NotImplementedError as e:
            raise NotImplementedError(
                f"steam_appdetails writer: {e}; the staged+manifest "
                "protocol is transport-agnostic (wire boto3/fsspec into "
                "write()/commit(); see sources/io.py committer note)"
            ) from e
        self._fail_on = options.get("fail_on_value")

    def write(self, iterator):
        import json
        import os
        import uuid

        os.makedirs(self._path, exist_ok=True)
        staged = os.path.join(self._path, f".staged-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(staged, "w") as f:
            for row in iterator:
                d = row.asDict()
                if self._fail_on is not None and str(
                    d.get("app")
                ) == self._fail_on:
                    raise RuntimeError(f"injected failure for app={d['app']}")
                f.write(json.dumps(d, default=str) + "\n")
                n += 1
        return _StagedFile(path=staged, rows=n)

    def commit(self, messages):
        import json
        import os

        final_names = []
        for m in messages:
            final = os.path.join(
                self._path, os.path.basename(m.path).lstrip(".")
            )
            os.rename(m.path, final)
            final_names.append(
                {"file": os.path.basename(final), "rows": m.rows}
            )
        with open(os.path.join(self._path, "_MANIFEST.json"), "w") as f:
            json.dump({"files": final_names}, f)

    def abort(self, messages):
        import os

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class SteamAppDetailsDataSource(DataSource):
    """`spark.read.format("steam_appdetails").option("app_ids", "10,20")`;
    `spark.readStream.format("steam_appdetails")` (one poll per microbatch
    via SteamAppDetailsStreamReader); and
    `df.write.format("steam_appdetails").option("path", dir)` (two-phase
    staged upload via SteamUploadWriter)."""

    @classmethod
    def name(cls) -> str:
        return "steam_appdetails"

    def schema(self) -> str:
        return "app BIGINT, body STRING"

    def reader(self, schema) -> DataSourceReader:
        return SteamAppDetailsReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return SteamAppDetailsStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return SteamUploadWriter(self.options)


def register_steam_source(spark) -> None:
    """Idempotent per-session registration of the custom format.

    The DataSource class is cloudpickled to the Python workers that
    instantiate it; those workers do not necessarily have this repo on
    sys.path (the driver may run from any cwd), so the module registers
    itself for pickle-BY-VALUE — the class definition travels inside the
    pickle instead of being re-imported by name on the worker."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(SteamAppDetailsDataSource)
