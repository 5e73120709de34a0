"""Audit Spark-vs-DuckDB OUTPUT dtypes for every registered query.

The r11 shard-order root cause (plans/round6c.py) was a client-side
dtype mismatch invisible to value comparison: DuckDB typed an un-CAST
`list_sum(...) % 16` as HUGEINT (float64 under .df()) while Spark
emitted int64. This audit catches the whole hazard class WITHOUT
executing anything: Spark schemas come from the (lazy) plan, DuckDB
types from `DESCRIBE <sql>`.

Reported levels:
- FAMILY:  int-vs-float/str/... family mismatch  (driver-red hazard)
- WIDTH:   int32-vs-int64 (or float32/float64) width-only mismatch —
           duckdb .df() and Spark toPandas() both preserve widths, so
           a dtype-carrying hash MAY distinguish them; empirically the
           driver has sampled width-mismatched queries green, so these
           are warnings, not failures.

Usage: python tools/audit_oracle_dtypes.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def duck_family(t: str) -> tuple[str, str]:
    t = t.upper()
    if t.endswith("[]"):
        return ("list:" + duck_family(t[:-2])[0], t)
    if t == "HUGEINT":
        return ("HUGEINT", t)
    if re.match(r"DECIMAL", t):
        return ("decimal", t)
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT",
             "USMALLINT", "UINTEGER", "UBIGINT"):
        return ("int", "int32" if t == "INTEGER" else "int64")
    if t in ("FLOAT", "REAL"):
        return ("float", "float32")
    if t == "DOUBLE":
        return ("float", "float64")
    if t == "VARCHAR":
        return ("str", t)
    if t == "BOOLEAN":
        return ("bool", t)
    if t == "DATE":
        return ("date", t)
    if t.startswith("TIMESTAMP"):
        return ("ts", t)
    return (t, t)


def spark_family(dt) -> tuple[str, str]:
    from pyspark.sql import types as T

    if isinstance(dt, T.ArrayType):
        return ("list:" + spark_family(dt.elementType)[0], str(dt))
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType)):
        return ("int", "int32")
    if isinstance(dt, T.LongType):
        return ("int", "int64")
    if isinstance(dt, T.FloatType):
        return ("float", "float32")
    if isinstance(dt, T.DoubleType):
        return ("float", "float64")
    if isinstance(dt, T.DecimalType):
        return ("decimal", str(dt))
    if isinstance(dt, T.StringType):
        return ("str", str(dt))
    if isinstance(dt, T.BooleanType):
        return ("bool", str(dt))
    if isinstance(dt, T.DateType):
        return ("date", str(dt))
    if isinstance(dt, T.TimestampType):
        return ("ts", str(dt))
    return (str(dt), str(dt))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from steam_prices_data_engineering_spark.plans import registry
    from steam_prices_data_engineering_spark.session import get_spark

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    spark = get_spark(app_name="dtype-audit", shuffle_partitions="8")
    spark.sparkContext.setLogLevel("ERROR")

    oracles = registry.oracle_sql()
    builders = registry.queries()
    n_fam = n_width = n_err = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        try:
            duck_cols = {
                r[0]: duck_family(r[1])
                for r in con.execute("DESCRIBE " + oracles[name]).fetchall()
            }
            df = builders[name](spark, sf_dir)
            spark_cols = {
                f.name: spark_family(f.dataType) for f in df.schema.fields
            }
        except Exception as e:  # noqa: BLE001
            n_err += 1
            print(f"ERR    {name}: {str(e).splitlines()[0][:140]}")
            continue
        for c, (sf_fam, sf_w) in spark_cols.items():
            if c not in duck_cols:
                print(f"FAMILY {name}.{c}: missing in oracle")
                n_fam += 1
                continue
            dk_fam, dk_w = duck_cols[c]
            if dk_fam == "HUGEINT":
                print(f"FAMILY {name}.{c}: duck=HUGEINT spark={sf_w}")
                n_fam += 1
            elif dk_fam == "decimal" and sf_fam == "float":
                pass  # harmonized (both float64 under .df()) — allowlisted
            elif dk_fam != sf_fam:
                print(f"FAMILY {name}.{c}: duck={dk_fam}/{dk_w} spark={sf_fam}/{sf_w}")
                n_fam += 1
            elif dk_w != sf_w and sf_fam in ("int", "float"):
                print(f"WIDTH  {name}.{c}: duck={dk_w} spark={sf_w}")
                n_width += 1
    print(f"done: {n_fam} family mismatches, {n_width} width warnings, {n_err} errors")


if __name__ == "__main__":
    main()
