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


_PROP_ESCAPES = {"t": "\t", "n": "\n", "r": "\r", "f": "\f"}


def _decode_properties(s: str) -> str:
    """Decode java.util.Properties backslash escapes the way
    ``Properties.load`` does: ``\\t \\n \\r \\f`` map to control chars,
    ``\\uXXXX`` decodes, and ANY other escaped char maps to itself (the
    backslash drops) — so the helper reads the same effective value Spark
    reads (r11 review: returning raw text made a backslash-bearing
    classpath differ from the file's Spark-effective value)."""
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "\\" and i + 1 < n:
            nxt = s[i + 1]
            if nxt == "u" and i + 5 < n:
                try:
                    out.append(chr(int(s[i + 2 : i + 6], 16)))
                    i += 6
                    continue
                except ValueError:
                    pass  # malformed \-u: fall through to drop-backslash
            out.append(_PROP_ESCAPES.get(nxt, nxt))
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


def _split_properties_line(s: str) -> tuple[str, str]:
    """Split one logical line into (key, value) per java.util.Properties:
    the key ends at the first unescaped ``=``, ``:`` or whitespace;
    whitespace around the (optional, single) separator is skipped;
    backslash escapes decode in both key and value
    (:func:`_decode_properties`)."""
    i, n = 0, len(s)
    key_chars: list[str] = []
    while i < n:
        c = s[i]
        if c == "\\" and i + 1 < n:
            key_chars.append(c)
            key_chars.append(s[i + 1])
            i += 2
            continue
        if c in "=:" or c.isspace():
            break
        key_chars.append(c)
        i += 1
    while i < n and s[i].isspace():
        i += 1
    if i < n and s[i] in "=:":
        i += 1
        while i < n and s[i].isspace():
            i += 1
    return _decode_properties("".join(key_chars)), _decode_properties(s[i:])


def _defaults_conf_value(key: str) -> str | None:
    """Look up ``key`` in ``spark-defaults.conf`` (SPARK_CONF_DIR, else
    $SPARK_HOME/conf) — a builder config silently OVERRIDES the file for
    the same key, so anything the deployment put there must be read and
    merged, never clobbered (review r10p5: a deployment's JDBC driver jar
    vanishing from the driver classpath is a nasty environment bug).

    Spark loads the file via ``java.util.Properties`` — ``key value``,
    ``key=value`` and ``key:value`` are all legal, as are backslash line
    continuations (ADVICE r10: the whitespace-only parse silently dropped
    '='-style deployments, re-introducing the clobber this guard exists
    to prevent)."""
    conf_dir = os.environ.get("SPARK_CONF_DIR")
    if not conf_dir:
        home = os.environ.get("SPARK_HOME")
        conf_dir = os.path.join(home, "conf") if home else None
    if not conf_dir:
        return None
    try:
        with open(os.path.join(conf_dir, "spark-defaults.conf")) as f:
            raw = f.read().splitlines()
    except OSError:
        return None
    # Fold backslash continuations into logical lines (an odd trailing-
    # backslash count continues; the next line's leading whitespace drops).
    logical: list[str] = []
    buf: str | None = None
    for line in raw:
        if buf is None:
            stripped = line.strip()
            if not stripped or stripped[0] in "#!":
                continue
            cur = stripped
        else:
            cur = buf + line.lstrip().rstrip()
        trailing = len(cur) - len(cur.rstrip("\\"))
        if trailing % 2 == 1:
            buf = cur[:-1]
        else:
            logical.append(cur)
            buf = None
    if buf is not None:
        logical.append(buf)
    # LAST occurrence wins, like java.util.Properties (r11 review: a
    # first-match return could preserve a value Spark itself overrides)
    found: str | None = None
    for s in logical:
        k, v = _split_properties_line(s)
        if k == key:
            found = v.strip() or None
    return found


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
