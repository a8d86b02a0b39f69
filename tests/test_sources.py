"""read_parquet timestamp normalization across the three physical shapes:
INT96 (Spark's default writer), INT64 TIMESTAMP(MICROS, ntz) (the driver
testdata), and INT64 TIMESTAMP(NANOS) (rejected outright by Spark's reader).
"""

from __future__ import annotations

from datetime import datetime

import pyarrow as pa
import pyarrow.parquet as pq

from datafusion_uwheel_spark.sources import read_parquet

TS = datetime(2024, 1, 5, 12, 30, 45, 123456)


def test_int96_spark_written_parquet_reads_natively(spark, tmp_path):
    """Spark's default writer emits INT96 timestamps, which pyarrow reports
    as timestamp[ns] — read_parquet must NOT apply the nanosAsLong
    treatment (physical INT96 is read natively); doing so breaks every
    engine built over Spark-written parquet."""
    p = str(tmp_path / "int96.parquet")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    try:
        spark.createDataFrame([(TS, 1.0)], "ts timestamp, v double").write.mode(
            "overwrite"
        ).parquet(p)
    finally:
        spark.conf.unset("spark.sql.parquet.outputTimestampType")
    df = read_parquet(spark, p)
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert df.collect()[0]["ts"] == TS


def test_micros_ntz_parquet_reads_as_session_timestamp(spark, tmp_path):
    p = str(tmp_path / "micros.parquet")
    pq.write_table(
        pa.table({"ts": pa.array([TS], pa.timestamp("us")), "v": [1.0]}), p
    )
    df = read_parquet(spark, p)
    assert dict(df.dtypes)["ts"] == "timestamp"  # not timestamp_ntz
    assert df.collect()[0]["ts"] == TS


def test_nanos_parquet_floored_to_micros(spark, tmp_path):
    import calendar

    p = str(tmp_path / "nanos.parquet")
    base = datetime(2024, 1, 5, 12, 30, 45)
    sec = calendar.timegm(base.timetuple())  # naive-UTC epoch second
    ns = sec * 10**9 + 123456789  # sub-µs tail truncates
    pq.write_table(
        pa.table({"ts": pa.array([ns], pa.timestamp("ns")), "v": [1.0]}), p
    )
    df = read_parquet(spark, p)
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = df.collect()[0]["ts"]
    assert got == base.replace(microsecond=123456)
