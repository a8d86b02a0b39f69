"""Shared bloom-filter plumbing for the shim-exposed expressions.

Spark ships ``BloomFilterAggregate`` / ``BloomFilterMightContain`` for its
own runtime row-level filters without registering them in the public
FunctionRegistry; the shim (``jvm/UwheelShim.scala`` ``UwheelBloom``)
exposes them as ``uw_bloom_agg`` / ``uw_might_contain``. This module owns
session wiring and sizing; :mod:`.contamination` and :mod:`.bloomjoin`
build on it.

Contract the callers rely on: NO false negatives (a ``might_contain``
FALSE is definitive; TRUE needs a downstream exact check), and non-BIGINT
inputs hash through ``xxhash64`` identically on the build and probe sides.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["ensure_bloom_fns", "bloom_num_bits", "build_bloom", "might_contain"]


def ensure_bloom_fns(spark) -> bool:
    """Make ``uw_bloom_agg`` / ``uw_might_contain`` resolvable on this
    session: already there (extensions-built session), else one py4j
    registration call into the shim jar (``get_spark`` puts it on the
    driver classpath). Returns False on a shim-less session."""
    try:
        if spark.catalog.functionExists("uw_might_contain"):
            return True
        spark._jvm.io.uwheel.spark.UwheelBloom.register(spark._jsparkSession)
        return bool(spark.catalog.functionExists("uw_might_contain"))
    except Exception:
        return False


def bloom_num_bits(spark, items: int, fpp: float) -> tuple[int, int]:
    """Optimal bloom sizing clamped to the session's Spark caps.

    ``m = -n ln(p) / (ln 2)^2`` (the standard optimum Spark's own
    ``BloomFilter.optimalNumOfBits`` uses); ``BloomFilterAggregate``
    analysis-rejects arguments above
    ``spark.sql.optimizer.runtime.bloomFilter.maxNumItems`` / ``maxNumBits``
    (defaults 4M / 67108864 ≈ 8 MB), so both are clamped — a clamped
    filter only raises the false-positive rate, never breaks the
    no-false-negative contract the exact verify paths rely on."""

    def conf_int(key: str, default: int) -> int:
        try:
            return int(spark.conf.get(key))
        except Exception:
            return default

    max_items = conf_int(
        "spark.sql.optimizer.runtime.bloomFilter.maxNumItems", 4_000_000
    )
    max_bits = conf_int(
        "spark.sql.optimizer.runtime.bloomFilter.maxNumBits", 67_108_864
    )
    items = max(1, min(items, max_items))
    bits = int(math.ceil(-items * math.log(fpp) / (math.log(2.0) ** 2)))
    return items, max(64, min(bits, max_bits))


def build_bloom(
    df: DataFrame,
    col: str | Column,
    fpp: float = 0.01,
    expected_items: int | None = None,
) -> bytes | None:
    """Aggregate ``col`` into one bloom blob — None when nothing reaches
    the aggregate (empty frame, or all-NULL BIGINT values, which pass raw
    and are skipped). Non-BIGINT NULLs hash through ``xxhash64(NULL)`` =
    the seed first, so an all-NULL string side builds a real one-entry
    bloom; callers' exact verify joins keep results correct either way.

    ``expected_items`` skips the sizing pass; without it the NDV estimate
    comes from one ``approx_count_distinct`` aggregate — a single scan of
    the build side, which is the SMALL side by construction wherever this
    is worth using."""
    c = F.col(col) if isinstance(col, str) else col
    spark = df.sparkSession
    if not ensure_bloom_fns(spark):
        raise RuntimeError(
            "uw_bloom_agg unavailable — the shim jar is not on this "
            "session's driver classpath (get_spark puts it there); "
            "higher-level callers fall back to exact joins instead"
        )
    items = expected_items
    if items is None:
        items = df.agg(F.approx_count_distinct(c).alias("n")).head()["n"] or 0
    # an all-NULL/empty build side aggregates to a NULL blob below anyway;
    # items just needs to be a legal positive literal
    items, bits = bloom_num_bits(spark, max(int(items), 1), fpp)
    row = df.agg(
        F.call_function(
            "uw_bloom_agg",
            c,
            F.lit(int(items)).cast("long"),
            F.lit(int(bits)).cast("long"),
        ).alias("bf")
    ).head()
    return None if row["bf"] is None else bytes(row["bf"])


def might_contain(blob: bytes, col: str | Column) -> Column:
    """Codegen'd membership probe against a literal blob."""
    c = F.col(col) if isinstance(col, str) else col
    return F.call_function("uw_might_contain", F.lit(bytes(blob)), c)
