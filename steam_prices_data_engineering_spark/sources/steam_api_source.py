"""Custom Python DataSource for the Steam appdetails connector (S1).

The reference fetches Steam prices driver-side, one HTTPS GET per
(app, country) with a 3 s throttle (`external_resources.py:116-137`,
`steam_prices_transformer.py:138,166` — O34). In Spark the idiomatic
shape for such a connector is a FIRST-CLASS SOURCE: Spark 4's Python
DataSource API (`pyspark.sql.datasource`) lets the REST client live
behind `spark.read.format("steam_appdetails")`, with

- `partitions()` -> one `InputPartition` per app id: the unit of
  parallel fetching. On a cluster each partition is an independent task,
  so 10k apps fan out across executors instead of serializing through
  the driver loop; a per-partition rate limiter reproduces the
  reference's polite-throttle semantics where the real endpoint is used.
- `read(partition)` -> (app, body) rows: the RAW payload enters the
  engine; JSON-path extraction/parsing stays in the declarative layer
  (see plans/pipelines.py `steam_api_json_extract`) where Catalyst can
  see it — the connector never hides transformations.

Tests/oracle run against the same deterministic payload fixtures the
driver-side variant uses (`API_PAYLOADS` below); a live deployment swaps
`_fetch` for the HTTP call and nothing else changes.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
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


class SteamAppDetailsReader(DataSourceReader):
    def __init__(self, options):
        ids = options.get("app_ids")
        self._app_ids = (
            [int(x) for x in ids.split(",")]
            if ids
            else [app for app, _ in API_PAYLOADS]
        )

    def partitions(self):
        # One fetch unit per app: the parallelism contract. Executors each
        # fetch their partition's payload(s) independently.
        return [InputPartition(app) for app in self._app_ids]

    def read(self, partition):
        app = partition.value
        yield app, _fetch(app)


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


class SteamAppDetailsDataSource(DataSource):
    """`spark.read.format("steam_appdetails").option("app_ids", "10,20")`;
    also `spark.readStream.format("steam_appdetails")` (one poll per
    microbatch via SteamAppDetailsStreamReader)."""

    @classmethod
    def name(cls) -> str:
        return "steam_appdetails"

    def schema(self) -> str:
        return "app BIGINT, body STRING"

    def reader(self, schema) -> DataSourceReader:
        return SteamAppDetailsReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return SteamAppDetailsStreamReader(self.options)


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
