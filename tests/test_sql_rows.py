"""engine.sql_rows — the direct-rows fast path: routed answers as plain
Row lists with ZERO JVM round trips (no VALUES parse, no collect), byte-
equal to the DataFrame path; delegates still run through spark.sql."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from datafusion_uwheel_spark import WheelEngine


@pytest.fixture(scope="module")
def eng(spark, sf_small_dir):
    e = WheelEngine(
        spark, "rows_events", f"{sf_small_dir}/events.parquet",
        time_column="ts", min_max_columns=("value",),
    )
    e.build_index("value")
    e.build_index("value", filter="event_type = 'click'")
    e.build_partitioned_index("value", partition_by="event_type")
    return e


A, B = "2024-01-03 00:00:00", "2024-01-10 00:00:00"

ROUTED = [
    f"SELECT COUNT(*) AS c FROM rows_events WHERE ts >= '{A}' AND ts < '{B}'",
    f"SELECT COUNT(*) AS c, SUM(value) AS s, AVG(value) AS a, MIN(value) AS lo, "
    f"MAX(value) AS hi FROM rows_events WHERE ts >= '{A}' AND ts < '{B}'",
    f"SELECT date_trunc('day', ts) AS b, COUNT(*) AS n FROM rows_events "
    f"WHERE ts >= '{A}' AND ts < '{B}' GROUP BY date_trunc('day', ts) ORDER BY b",
    f"SELECT STDDEV(value) AS sd FROM rows_events WHERE ts >= '{A}' AND ts < '{B}'",
    f"SELECT SUM(value) AS s FROM rows_events WHERE ts >= '{A}' AND ts < '{B}' "
    "AND event_type = 'click'",
    "SELECT COUNT(*) AS c, SUM(value) AS s FROM rows_events",  # landmark
    f"SELECT COUNT(*) AS c FROM rows_events WHERE ts BETWEEN '{A}' AND "
    "'2024-01-09 23:59:59'",  # hybrid
    f"SELECT COUNT(*) AS c FROM rows_events WHERE (ts >= '{A}' AND ts < "
    f"'2024-01-05 00:00:00') OR (ts >= '2024-01-07 00:00:00' AND ts < '{B}')",
]

# r8 (VERDICT r7 item 5): the remaining routed families with grouped
# answers — dim group-by, OR-grouped, grouped-hybrid — ride the same
# capture channel; pin (expected kind, parity) for each.
GROUPED_DIRECT = [
    (
        f"SELECT date_trunc('day', ts) AS b, event_type AS et, COUNT(*) AS n, "
        f"SUM(value) AS s FROM rows_events WHERE ts >= '{A}' AND ts < '{B}' "
        "GROUP BY date_trunc('day', ts), event_type ORDER BY b, et",
        "group_by",  # dim group-by (partitioned family)
    ),
    (
        f"SELECT date_trunc('day', ts) AS b, COUNT(*) AS n, SUM(value) AS s "
        f"FROM rows_events WHERE (ts >= '{A}' AND ts < '2024-01-05 00:00:00') "
        f"OR (ts >= '2024-01-07 00:00:00' AND ts < '{B}') "
        "GROUP BY date_trunc('day', ts) ORDER BY b",
        "or_group_by",
    ),
    (
        f"SELECT date_trunc('day', ts) AS b, COUNT(*) AS n, SUM(value) AS s "
        f"FROM rows_events WHERE ts BETWEEN '{A}' AND '2024-01-09 23:59:59' "
        "GROUP BY date_trunc('day', ts) ORDER BY b",
        "group_by_hybrid",  # runs the sliver job, rows still captured
    ),
    # r9: the fuzzed ORDER BY / HAVING / LIMIT gate applies above these
    # two families too — LIMIT only answers under a TOTAL order (n DESC
    # ties broken by the unique bucket; plain bucket order is total).
    (
        f"SELECT date_trunc('day', ts) AS b, COUNT(*) AS n, SUM(value) AS s "
        f"FROM rows_events WHERE (ts >= '{A}' AND ts < '2024-01-05 00:00:00') "
        f"OR (ts >= '2024-01-07 00:00:00' AND ts < '{B}') "
        "GROUP BY date_trunc('day', ts) ORDER BY n DESC, b LIMIT 2",
        "or_group_by",
    ),
    (
        f"SELECT date_trunc('day', ts) AS b, COUNT(*) AS n, SUM(value) AS s "
        f"FROM rows_events WHERE ts BETWEEN '{A}' AND '2024-01-09 23:59:59' "
        "GROUP BY date_trunc('day', ts) HAVING COUNT(*) > 1 ORDER BY b LIMIT 3",
        "group_by_hybrid",
    ),
]


def test_grouped_families_direct_parity(eng):
    for sql, kind in GROUPED_DIRECT:
        rows = eng.sql_rows(sql)
        assert eng.last_route.kind == kind, (sql, eng.last_route)
        df_rows = eng.sql(sql).collect()
        assert eng.last_route.kind == kind
        assert [tuple(r) for r in rows] == [tuple(r) for r in df_rows], sql
        assert rows and [list(r.asDict()) for r in rows] == [
            list(r.asDict()) for r in df_rows
        ], sql


def test_dim_and_or_grouped_direct_zero_jobs(eng, spark):
    """The two fully-index-resolved grouped families must stay job-free on
    the direct path (grouped-hybrid legitimately runs its sliver job)."""
    for sql, _kind in GROUPED_DIRECT[:2]:
        eng.sql_rows(sql)  # warm parse/route caches
    sc = spark.sparkContext
    before = len(sc.statusTracker().getJobIdsForGroup(None) or [])
    for sql, _kind in GROUPED_DIRECT[:2]:
        eng._rows_cache.clear()
        eng.sql_rows(sql)
    after = len(sc.statusTracker().getJobIdsForGroup(None) or [])
    assert after == before


def test_rows_match_dataframe_path(eng):
    for sql in ROUTED:
        rows = eng.sql_rows(sql)
        route_rows = eng.last_route
        assert route_rows.rewritten, (sql, route_rows)
        df_rows = eng.sql(sql).collect()
        assert eng.last_route.kind == route_rows.kind
        assert [tuple(r) for r in rows] == [tuple(r) for r in df_rows], sql
        assert [list(r.asDict()) for r in rows] == [
            list(r.asDict()) for r in df_rows
        ], sql


def test_rows_zero_spark_jobs_and_fast(eng, spark):
    sql = ROUTED[0]
    eng.sql_rows(sql)  # warm (parse caches, nothing JVM)
    sc = spark.sparkContext
    before = len(sc.statusTracker().getJobIdsForGroup(None) or [])
    t0 = time.perf_counter()
    for _ in range(50):
        eng._rows_cache.clear()  # force full route every iteration
        eng.sql_rows(sql)
    dt = (time.perf_counter() - t0) / 50
    after = len(sc.statusTracker().getJobIdsForGroup(None) or [])
    assert after == before  # not a single Spark job
    # pure Python: parse + wheel lookup. Generous bound for slow boxes —
    # the DataFrame path's py4j floor alone is ~5-10 ms.
    assert dt < 0.005, f"direct path took {dt*1e3:.2f} ms"


def test_rows_cache_and_epoch_invalidation(eng):
    sql = ROUTED[0]
    r1 = eng.sql_rows(sql)
    assert eng._rows_cache  # memoized
    r2 = eng.sql_rows(sql)
    assert r1 == r2 and r1 is not r2  # cache hit returns a COPY
    r2.clear()  # caller mutation must not poison the memo
    assert eng.sql_rows(sql) == r1
    eng.build_index("user_id")  # epoch bump
    r3 = eng.sql_rows(sql)
    assert r3 == r1  # recomputed, same values


def test_rows_delegate_parity(eng):
    # user_id has no partitioned family -> keys-only GROUP BY delegates
    # (event_type would ROUTE since the fixture's r8 partitioned build)
    sql = (
        "SELECT user_id AS k, COUNT(*) AS n FROM rows_events "
        "GROUP BY user_id ORDER BY k"
    )
    rows = eng.sql_rows(sql)
    assert eng.last_route.kind == "delegate"
    assert [tuple(r) for r in rows] == [
        tuple(r) for r in eng.spark.sql(sql).collect()
    ]


def test_rows_prune_empty(eng):
    sql = (
        f"SELECT * FROM rows_events WHERE ts >= '{A}' AND ts < '{B}' "
        "AND value > 100000.0"
    )
    rows = eng.sql_rows(sql)
    assert eng.last_route.rewritten
    assert rows == []


def test_parse_cache_survives_epoch_bump(eng):
    """The streaming case the parse memo exists for: an index mutation
    invalidates the ANSWER memo but not the parse — re-routing the same
    text must hit the parse cache and still produce correct values."""
    sql = ROUTED[1]
    r1 = eng.sql_rows(sql)
    assert sql in eng._parse_cache
    parsed_obj = eng._parse_cache[sql]
    eng.index_epoch += 1  # what a streaming merge does
    r2 = eng.sql_rows(sql)
    assert r2 == r1
    assert eng._parse_cache[sql] is parsed_obj  # no re-tokenize


def test_parse_cache_caches_failures(eng):
    bad = "SELECT FROM WHERE nonsense ~~ rows_events"
    # unparseable → delegate; spark.sql raises its own analysis error
    with pytest.raises(Exception):
        eng.sql_rows(bad)
    assert bad in eng._parse_cache
    from datafusion_uwheel_spark.plans.sqlparse import ParseError

    assert isinstance(eng._parse_cache[bad], ParseError)
    with pytest.raises(Exception):  # the memoized error path delegates again
        eng.sql_rows(bad)


def test_memo_lru_evicts_oldest_keeps_hot(monkeypatch):
    """Route memos evict least-recently-used at the cap instead of clearing
    wholesale — a dashboard cycling >cap distinct strings keeps its hot set."""
    from datafusion_uwheel_spark import engine as engine_mod

    monkeypatch.setattr(engine_mod, "_MEMO_CAP", 3)
    cache = engine_mod.OrderedDict()
    for k in "abc":
        engine_mod._memo_put(cache, k, k.upper())
    assert engine_mod._memo_get(cache, "a") == "A"  # touch: a is now hot
    engine_mod._memo_put(cache, "d", "D")  # evicts b (LRU), not a
    assert list(cache) == ["c", "a", "d"]
    assert engine_mod._memo_get(cache, "b") is None
