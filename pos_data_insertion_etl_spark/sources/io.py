"""Multi-format source/sink layer (SURVEY.md §2.2 scans/sinks rows).

The reference reads exactly one format (zip-of-fixed-width text) and
writes exactly one sink (SQL Server via pyodbc, main.py:213-262). The
engine exposes the standard format matrix -- parquet/orc (columnar,
pushdown), csv/json/text (interchange), jdbc (parity sink; vendor
driver jar goes on the classpath -- tests execute the sink for real
against the embedded Derby that Spark already bundles).

Explicit schemas everywhere: csv/json inference is both slow (extra
pass) and nondeterministic under promotion -- never used.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

FORMATS = ("parquet", "orc", "csv", "json")


def write_table(df: DataFrame, path: str, fmt: str, **options) -> None:
    w = df.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        w = w.option("header", "true")
    for k, v in options.items():
        w = w.option(k, v)
    w.save(path)


def read_table(
    spark: SparkSession, path: str, fmt: str, schema: StructType | str | None = None, **options
) -> DataFrame:
    r = spark.read.format(fmt)
    if schema is not None:
        r = r.schema(schema)
    if fmt == "csv":
        r = r.option("header", "true")
    for k, v in options.items():
        r = r.option(k, v)
    return r.load(path)


def jdbc_options(
    url: str, table: str, batchsize: int = 150, **options
) -> dict[str, str]:
    """Assemble the JDBC writer options (unit-testable without a DB).

    batchsize defaults to 150 rows per round-trip, the reference's
    batching knob (Config.batch_size=150, main.py:53; executed via
    fast_executemany at main.py:226)."""
    return {
        "url": url,
        "dbtable": table,
        "batchsize": str(batchsize),
        **{k: str(v) for k, v in options.items()},
    }


def write_jdbc(
    df: DataFrame, url: str, table: str, batchsize: int = 150, **options
) -> None:
    """JDBC append sink. Requires the vendor driver jar on the Spark
    classpath; option assembly is `jdbc_options`. Executed end-to-end
    in tests against embedded Derby (bundled with Spark), batchsize
    included."""
    (
        df.write.format("jdbc")
        .options(**jdbc_options(url, table, batchsize, **options))
        .mode("append")
        .save()
    )
