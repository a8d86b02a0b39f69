"""As-of join vs two independent oracles: DuckDB's native ASOF JOIN and
pandas merge_asof (tolerance + direction variants)."""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import duckdb
import pandas as pd
import pytest

from datafusion_uwheel_spark.operators.asof import asof_join

BASE = datetime(2024, 3, 1)


@pytest.fixture(scope="module")
def frames(spark):
    rng = random.Random(42)
    keys = ["a", "b", "c", "d"]
    lrows = [
        (k, BASE + timedelta(seconds=rng.randrange(0, 3600)), float(i))
        for i, k in enumerate(rng.choices(keys, k=300))
    ]
    # distinct right timestamps per key → deterministic matches in every oracle
    rrows = [
        (k, BASE + timedelta(seconds=s), f"{k}{s}")
        for k in keys[:3]  # key "d" has no right rows at all
        for s in sorted(rng.sample(range(-600, 3600), 40))
    ]
    left = spark.createDataFrame(lrows, "k string, ts timestamp, v double")
    right = spark.createDataFrame(rrows, "k string, ts timestamp, tag string")
    lpdf = pd.DataFrame(lrows, columns=["k", "ts", "v"])
    rpdf = pd.DataFrame(rrows, columns=["k", "ts", "tag"])
    return left, right, lpdf, rpdf


def _sorted(rows):
    return sorted(((r["k"], r["ts"], r["v"], r["ts_r"], r["tag"]) for r in rows))


def test_backward_inner_matches_duckdb(frames):
    left, right, lpdf, rpdf = frames
    got = asof_join(left, right, on="ts", by=("k",)).collect()
    con = duckdb.connect()
    con.register("l", lpdf)
    con.register("r", rpdf)
    want = con.sql(
        "SELECT l.k, l.ts, l.v, r.ts AS ts_r, r.tag "
        "FROM l ASOF JOIN r ON l.k = r.k AND l.ts >= r.ts"
    ).fetchall()
    assert _sorted(got) == sorted(want)
    assert len(got) > 0


def test_left_join_keeps_unmatched(frames):
    left, right, lpdf, rpdf = frames
    got = asof_join(left, right, on="ts", by=("k",), how="left").collect()
    assert len(got) == 300  # every left row survives
    con = duckdb.connect()
    con.register("l", lpdf)
    con.register("r", rpdf)
    want = con.sql(
        "SELECT l.k, l.ts, l.v, r.ts AS ts_r, r.tag "
        "FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.ts >= r.ts"
    ).fetchall()
    assert _sorted(got) == sorted(want)
    # key "d" never matches — payload NULL
    assert all(r["tag"] is None for r in got if r["k"] == "d")


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("tolerance", [None, 120.0])
def test_matches_pandas_merge_asof(frames, direction, tolerance):
    left, right, lpdf, rpdf = frames
    got = asof_join(
        left,
        right,
        on="ts",
        by=("k",),
        direction=direction,
        tolerance=tolerance,
        how="left",
    ).collect()
    want = pd.merge_asof(
        lpdf.sort_values("ts"),
        rpdf.rename(columns={"ts": "ts_r"}).sort_values("ts_r"),
        left_on="ts",
        right_on="ts_r",
        by="k",
        direction=direction,
        tolerance=pd.Timedelta(seconds=tolerance) if tolerance else None,
    )
    wrows = sorted(
        (
            r.k,
            r.ts.to_pydatetime(),
            r.v,
            None if pd.isna(r.ts_r) else r.ts_r.to_pydatetime(),
            None if (isinstance(r.tag, float) and pd.isna(r.tag)) else r.tag,
        )
        for r in want.itertuples()
    )
    assert _sorted(got) == wrows


def test_global_asof_no_keys(spark):
    left = spark.createDataFrame(
        [(BASE + timedelta(seconds=s),) for s in (5, 15, 25)], "ts timestamp"
    )
    right = spark.createDataFrame(
        [(BASE + timedelta(seconds=s), s) for s in (0, 10, 20)], "ts timestamp, rv int"
    )
    got = asof_join(left, right, on="ts").orderBy("ts").collect()
    assert [r["rv"] for r in got] == [0, 10, 20]
    # exact simultaneity: a right row at the same instant matches
    sim = asof_join(right.select("ts"), right, on="ts").orderBy("ts").collect()
    assert [r["rv"] for r in sim] == [0, 10, 20]


def test_validation_errors(frames):
    left, right, *_ = frames
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, direction="nearest")
    with pytest.raises(ValueError, match="how"):
        asof_join(left, right, how="outer")
    with pytest.raises(ValueError, match="must exist"):
        asof_join(left, right, by=("missing",))
    with pytest.raises(ValueError, match="reserved"):
        asof_join(left.withColumn("__asof_x", left.v), right)
