"""Catalyst shim (jvm/UwheelShim.scala): plain spark.sql answered from the
wheel rollup via SparkSessionExtensions — the reference's drop-in
optimizer-rule integration (lib.rs:843-869), SURVEY.md §7.3.1.

Runs the demo in a subprocess: spark.sql.extensions and the driver classpath
must be set before the JVM starts, which the shared test session cannot do.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_shim_compiles_with_shipped_scala():
    from datafusion_uwheel_spark.jvmshim import build_shim_jar

    jar = build_shim_jar()
    assert os.path.exists(jar) and os.path.getsize(jar) > 0


def test_shim_rewrites_plain_spark_sql():
    """Demo asserts: rewritten plans scan no table file; the COUNT answer
    equals both the Python router's and a true delegated scan's; the
    multi-agg family (COUNT/COUNT(col)/SUM/AVG/MIN/MAX) matches the scan in
    values AND schema; all-NULL ranges answer SQL NULLs; unaligned bounds
    and unsupported aggregates (STDDEV) fall through to the scan."""
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "jvm_shim_demo.py")],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )
    assert r.returncode == 0, (r.stdout[-3000:], r.stderr[-3000:])
    assert "OK shim" in r.stdout


def test_shim_fuzz_equivalence():
    """Randomized shapes across the whole matched surface and its edges:
    whatever the rule does, results must equal the delegate scan's."""
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "jvm_shim_fuzz.py")],
        capture_output=True,
        text=True,
        timeout=500,
        cwd=REPO,
    )
    assert r.returncode == 0, (r.stdout[-3000:], r.stderr[-3000:])
    assert "0 mismatches" in r.stdout


def test_shim_fuzz_equivalence_parquet_views():
    """The same fuzz matrix with every rollup view forced onto the parquet
    backing — the path any wheel past _MAX_LOCAL_ROWS buckets takes, so
    plain-spark.sql acceleration survives wheels too large to embed as
    driver LocalRelations."""
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "jvm_shim_fuzz.py")],
        capture_output=True,
        text=True,
        timeout=500,
        cwd=REPO,
        env={**os.environ, "SHIM_FUZZ_PARQUET_VIEWS": "1"},
    )
    assert r.returncode == 0, (r.stdout[-3000:], r.stderr[-3000:])
    assert "0 mismatches" in r.stdout
    assert "parquet-backed views" in r.stdout


def test_shim_fuzz_equivalence_ntz_tables():
    """The same fuzz matrix against TIMESTAMP_NTZ temp views — what a raw
    ``spark.read.parquet`` of isAdjustedToUTC=false data (pandas/pyarrow
    writers) gives a user who never calls sources.read_parquet. NTZ range
    literals are naive micros, which is exactly what the rollup's ``sec``
    buckets hold, so the whole surface must rewrite and match the scan."""
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "jvm_shim_fuzz.py")],
        capture_output=True,
        text=True,
        timeout=500,
        cwd=REPO,
        env={**os.environ, "SHIM_FUZZ_NTZ": "1"},
    )
    assert r.returncode == 0, (r.stdout[-3000:], r.stderr[-3000:])
    assert "0 mismatches" in r.stdout
    assert "NTZ tables" in r.stdout


def test_shim_hop_hybrid_boundaries():
    """Hopping window() group-bys with boundary bounds (strict >, inclusive
    <=, sub-bucket literals, OR-of-ranges) rewrite through the Expand over
    a rollup-core + raw-sliver Union and match the delegate scan."""
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "jvm_shim_hop_hybrid.py")],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )
    assert r.returncode == 0, (r.stdout[-3000:], r.stderr[-3000:])
    assert "OK shim hop-hybrid" in r.stdout


def test_shim_keyed_hopping_windows():
    """Keyed hopping window() group-bys (r7 — the last documented
    plain-spark.sql fall-through family): aligned bounds rewrite via the
    per-value keyed view / dim family with no table scan; boundary bounds
    rewrite via the hybrid with key-filtered core and sliver legs; an
    unregistered key column still falls through and matches the scan."""
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "jvm_shim_keyed_hop.py")],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )
    assert r.returncode == 0, (r.stdout[-3000:], r.stderr[-3000:])
    assert "OK shim keyed-hop" in r.stdout


def test_shim_dashboard_topk():
    """The routed top-k dashboard shape over plain spark.sql (r9):
    GROUP BY key ORDER BY n DESC, key LIMIT k answers from the registered
    dim view with no table scan; the count-led sort is a TOTAL order, so
    the LIMIT's kept set matches the delegate scan row-for-row INCLUDING
    row order; an unregistered key column falls through and matches."""
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "jvm_shim_topk.py")],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )
    assert r.returncode == 0, (r.stdout[-3000:], r.stderr[-3000:])
    assert "OK shim top-k" in r.stdout
