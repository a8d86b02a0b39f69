"""Table sources: parquet directories and in-memory tables.

The reference reads tables through DataFusion ``TableProvider``s — a parquet
``ListingTable`` (``examples/nyc_taxi/src/main.rs:22-40``) or a ``MemTable``
(``examples/memtable/src/main.rs:86-114``). In Spark these are just
``spark.read.parquet`` and ``spark.createDataFrame``; this module adds the
driver-testdata conventions on top.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "TPCH_TABLES",
    "read_parquet",
    "read_csv",
    "read_json",
    "load_table",
    "register_tables",
    "memtable",
]

#: Tables the driver materializes per scale factor (TESTDATA.md).
TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _nanos_timestamp_columns(path: str) -> list[str]:
    """Columns stored as parquet ``TIMESTAMP(NANOS)`` — Spark's vectorized
    reader rejects that physical type outright (PARQUET_TYPE_ILLEGAL), while
    DuckDB/pyarrow read it fine. Detected from the parquet footer of one
    file: a driver-side metadata read, no data IO."""
    f = path
    if os.path.isdir(path):
        files = glob.glob(os.path.join(path, "*.parquet")) or glob.glob(
            os.path.join(path, "**", "*.parquet"), recursive=True
        )
        if not files:
            return []
        f = files[0]
    try:
        schema = pq.read_schema(f)
        phys = pq.ParquetFile(f).metadata.schema
        physical = {
            phys.column(i).name: phys.column(i).physical_type
            for i in range(len(phys))
        }
    except Exception:
        return []
    # pyarrow reports INT96 timestamps (Spark's default writer output) as
    # timestamp[ns] too, but Spark reads INT96 natively — only physical
    # INT64-with-NANOS columns trip PARQUET_TYPE_ILLEGAL and need the
    # nanosAsLong treatment.
    return [
        n
        for n, t in zip(schema.names, schema.types)
        if pa.types.is_timestamp(t)
        and t.unit == "ns"
        and physical.get(n) == "INT64"
    ]


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """``spark.read.parquet`` with timestamp normalization to TimestampType.

    Two parquet shapes need help (both detected from one footer read):

    - ``TIMESTAMP(MICROS/MILLIS, isAdjustedToUTC=false)`` — Spark infers
      ``timestamp_ntz`` by default; DuckDB/pandas read the same column as a
      naive timestamp and compare it against naive literals. We disable
      ``spark.sql.parquet.inferTimestampNTZ.enabled`` so the column comes
      back as plain TIMESTAMP interpreted in the session zone (pinned UTC by
      :func:`..session.get_spark`) — byte-identical values to the DuckDB
      oracle, and temporal predicates still reach the scan as
      ``PushedFilters`` (no derived column in the way).
    - ``TIMESTAMP(NANOS)`` — Spark's vectorized reader rejects it outright
      (PARQUET_TYPE_ILLEGAL). Nano columns are read as raw ``long``
      (``spark.sql.legacy.parquet.nanosAsLong``) and floored to microsecond
      timestamps with *integer* division — ns epochs (~1.7e18) exceed
      float53 precision, so the division must stay integral (``ts DIV
      1000``). Matches DuckDB's ns→µs truncation. Predicates on the derived
      timestamp cannot reach row-group stats; that is exactly the gap the
      wheel index closes (routed queries never scan), and for delegated
      scans at 100 TB prefer date/hour-partitioned layouts whose directory
      pruning is unaffected.
    """
    nanos = _nanos_timestamp_columns(path)
    if nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(path)
    for c in nanos:
        df = df.withColumn(c, F.expr(f"timestamp_micros(CAST(`{c}` DIV 1000 AS BIGINT))"))
    return df


def read_csv(
    spark: SparkSession, path: str, schema=None, header: bool = True
) -> DataFrame:
    """CSV listing source (the reference's host supports arbitrary listing
    formats; Spark's reader pushes column pruning, and with an explicit
    ``schema`` avoids the inference scan — always pass one at scale)."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """JSON-lines listing source; pass ``schema`` to skip the inference scan."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table. Plain columnar parquet scan — Catalyst pushes
    filters and prunes columns into this source."""
    return read_parquet(spark, os.path.join(sf_dir, f"{name}.parquet"))


def register_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TPCH_TABLES
) -> dict[str, DataFrame]:
    """Register every table as a temp view so ``spark.sql`` works over the
    same names the DuckDB oracle uses."""
    out = {}
    for n in names:
        df = load_table(spark, sf_dir, n)
        df.createOrReplaceTempView(n)
        out[n] = df
    return out


def memtable(spark: SparkSession, rows, schema) -> DataFrame:
    """In-memory table (LocalRelation) — the MemTable analogue."""
    return spark.createDataFrame(rows, schema)
