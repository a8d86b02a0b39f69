"""Session construction with engine-required defaults.

UTC pinning is correctness-critical: wheel bucket math is pure epoch
arithmetic and the DuckDB oracle's timestamps are UTC-naive (SURVEY.md
§7.3.6). The remaining settings are scale hygiene: AQE re-plans shuffles at
runtime (skew joins, partition coalescing), Arrow makes the rollup collect
and any Pandas-UDF path columnar.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark"]


def _defaults_conf_value(key: str) -> str | None:
    """Look up ``key`` in ``spark-defaults.conf`` (SPARK_CONF_DIR, else
    $SPARK_HOME/conf) — a builder config silently OVERRIDES the file for
    the same key, so anything the deployment put there must be read and
    merged, never clobbered (review r10p5: a deployment's JDBC driver jar
    vanishing from the driver classpath is a nasty environment bug)."""
    conf_dir = os.environ.get("SPARK_CONF_DIR")
    if not conf_dir:
        home = os.environ.get("SPARK_HOME")
        conf_dir = os.path.join(home, "conf") if home else None
    if not conf_dir:
        return None
    try:
        with open(os.path.join(conf_dir, "spark-defaults.conf")) as f:
            for line in f:
                s = line.strip()
                if not s or s.startswith("#"):
                    continue
                parts = s.split(None, 1)
                if len(parts) == 2 and parts[0] == key:
                    return parts[1].strip()
    except OSError:
        return None
    return None


def get_spark(
    app_name: str = "datafusion-uwheel-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a session with the engine's required configuration.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``);
    ``shuffle_partitions`` defaults to the local core count — on a real
    cluster leave AQE's coalescing to size shuffles instead.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus) if cpus else 32
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    # r10: the shim jar on the DRIVER classpath enables the sketch
    # families' one-call direct asks (UwheelSketchOps — see
    # operators/sketch_retention.py). CLASSPATH ONLY: the Catalyst
    # optimizer-rule extension stays opt-in through jvmshim's builder
    # confs. Only the first session of a process reads launch confs;
    # sessions built elsewhere (e.g. the correctness harness's bare
    # session) simply lack the class and every ask falls back to the job
    # path. The jar is a BUILD ARTIFACT (gitignored): build_shim_jar
    # compiles it from the committed Scala source with the PySpark-bundled
    # scalac on first use (~40 s once per checkout), then caches by mtime.
    if os.environ.get("SPARK_GRAFT_NO_SHIM_JAR") != "1":
        try:
            from .jvmshim import build_shim_jar

            jar = build_shim_jar()
            # APPEND to any deployment-configured driver classpath
            # (spark-defaults.conf) — a builder value overrides the file
            # for the same key, so setting the jar alone would silently
            # drop e.g. a JDBC driver the environment relies on
            existing = _defaults_conf_value("spark.driver.extraClassPath")
            builder = builder.config(
                "spark.driver.extraClassPath",
                existing + os.pathsep + jar if existing else jar,
            )
        except Exception as e:  # no scalac/jar — job path still answers
            import warnings

            # visible, once: a silent fallback here reads as a ~100x
            # sketch-ask regression with no trail (review r10p3)
            warnings.warn(
                f"uwheel shim jar unavailable ({e!r}) — sketch asks take "
                "the Spark-job path on this session",
                RuntimeWarning,
                stacklevel=2,
            )
    return builder.getOrCreate()
