"""Build + wire the Catalyst shim (``jvm/UwheelShim.scala``) so plain
``spark.sql(...)`` is wheel-accelerated — SURVEY.md §7.3.1's deferred Scala
path, the reference's drop-in optimizer-rule integration
(``datafusion-uwheel/src/lib.rs:843-869``).

Everything here uses only what the PySpark distribution ships: the bundled
``scala-compiler`` jar compiles the rule offline (no sbt, no network), and
``SparkSessionExtensions`` + session confs wire it in. The Python engine
remains the source of truth — :func:`register_count_rollup` exports a wheel's
``(sec, cnt)`` buckets as a temp view and pins the table's parquet root +
time column in ``spark.uwheel.shim.*`` confs; the JVM rule rewrites matching
``COUNT(*)`` range plans against that view at optimization time.

Constraint worth knowing: ``spark.sql.extensions`` and the driver classpath
must be set **before the JVM starts**, i.e. on the first SparkSession of the
process — an existing local SparkContext cannot adopt the rule. Demos/tests
therefore run in a subprocess (``examples/jvm_shim_demo.py``).
"""

from __future__ import annotations

import glob
import os
import subprocess

__all__ = [
    "build_shim_jar",
    "shim_builder_confs",
    "register_count_rollup",
    "EXTENSIONS_CLASS",
]

EXTENSIONS_CLASS = "io.uwheel.spark.UwheelExtensions"

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_REPO, "jvm", "UwheelShim.scala")
_DEFAULT_JAR = os.path.join(_REPO, "jvm", "uwheel-shim.jar")


def pyspark_jars_dir() -> str:
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "jars")


def build_shim_jar(out_jar: str = _DEFAULT_JAR, force: bool = False) -> str:
    """Compile the shim with the PySpark-bundled Scala compiler and package
    it as a jar. Cached: skipped when the jar is newer than the source."""
    if (
        not force
        and os.path.exists(out_jar)
        and os.path.getmtime(out_jar) >= os.path.getmtime(_SRC)
    ):
        return out_jar
    jars = pyspark_jars_dir()
    java_home = os.environ.get("JAVA_HOME", "")
    java = os.path.join(java_home, "bin", "java") if java_home else "java"
    jar_tool = os.path.join(java_home, "bin", "jar") if java_home else "jar"
    classes = out_jar + ".classes"
    os.makedirs(classes, exist_ok=True)
    cp = ":".join(sorted(glob.glob(os.path.join(jars, "*.jar"))))
    subprocess.run(
        [
            java,
            "-cp",
            cp,
            "scala.tools.nsc.Main",
            "-classpath",
            cp,
            "-d",
            classes,
            _SRC,
        ],
        check=True,
        capture_output=True,
        text=True,
    )
    subprocess.run(
        [jar_tool, "cf", out_jar, "-C", classes, "."],
        check=True,
        capture_output=True,
        text=True,
    )
    return out_jar


def shim_builder_confs(jar: str | None = None) -> dict[str, str]:
    """Builder configs enabling the shim — apply them to the FIRST session of
    the process (the extensions class loads when the JVM starts)."""
    jar = jar or build_shim_jar()
    return {
        "spark.sql.extensions": EXTENSIONS_CLASS,
        "spark.driver.extraClassPath": jar,
        "spark.jars": jar,
    }


def register_count_rollup(spark, engine) -> str:
    """Export ``engine``'s COUNT wheel as the shim's rollup view and pin the
    table metadata in session confs. Returns the view name.

    The view is a LocalRelation of ``(sec, cnt)`` buckets — bounded by
    occupied seconds, the same driver-side payload the Python router reads —
    so the rewritten plan aggregates kilobytes-to-megabytes instead of
    scanning the table."""
    import pandas as pd

    from .operators.lookup import STAR_AGGREGATION_ALIAS

    w = engine.count_wheels[STAR_AGGREGATION_ALIAS]
    name = f"__uwheel_rollup_{engine.name}"
    pdf = pd.DataFrame({"sec": w.secs.astype("int64"), "cnt": w.cnt.astype("int64")})
    spark.createDataFrame(pdf).createOrReplaceTempView(name)
    path = getattr(engine, "source_path", None)
    if path is None:
        raise ValueError(
            "engine has no source_path — the shim recognizes tables by their "
            "parquet root; construct WheelEngine from a path"
        )
    existing = spark.conf.get("spark.uwheel.shim.tables", "")
    tables = [t for t in existing.split(",") if t.strip()]
    if engine.name not in tables:
        tables.append(engine.name)
    spark.conf.set("spark.uwheel.shim.tables", ",".join(tables))
    spark.conf.set(f"spark.uwheel.shim.{engine.name}.path", os.path.abspath(path))
    spark.conf.set(f"spark.uwheel.shim.{engine.name}.time_col", engine.time_column)
    return name
