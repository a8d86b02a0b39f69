"""Driver-contract invariants for __spark_entry__ (registry shape checks
need no Spark; the r14 verbatim-moved tpch_q6 check drives one delegate).

The r02 driver run recorded exactly 50 CORRECTNESS rows and silently
truncated the tail of a 53-entry registry — these guards pin the registry
at the observed cap and keep the two dicts aligned so every registered
entry can earn a row."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry


def test_registry_is_exactly_fifty():
    assert len(entry.queries()) == 50


def test_oracle_keys_match_query_keys():
    q, o = set(entry.queries()), set(entry.oracle_sql())
    assert q == o


def test_all_entries_are_callables():
    for name, fn in entry.queries().items():
        assert callable(fn), name


def test_oracle_sql_is_nonempty_ansi_text():
    for name, sql in entry.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_tpch_q6_matches_duckdb_real_table(spark, sf_medium_dir):
    """Funding for the r14 registry rotation (tpch_q6 out for the
    re-seated uw_point_instant, r9 debt): the retired row's DuckDB hash
    check moves here verbatim — the delegated filter + global agg vs
    DuckDB on the real lineitem parquet at the driver's comparison scale
    (sf0.01). The delegate surface stays seated via tpch_q1 / tpch_q3 /
    rel_window / rel_setop."""
    import duckdb

    got = [tuple(r) for r in entry.tpch_q6(spark, sf_medium_dir).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"'{sf_medium_dir}/lineitem.parquet'"
    )
    exp = [tuple(r) for r in con.execute(entry._TPCH_Q6).fetchall()]
    assert got == exp and len(got) == 1
