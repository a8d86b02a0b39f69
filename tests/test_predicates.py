"""Layer-1 tests: SQL shape parsing + predicate extraction.

Ports the reference's expression-extraction unit tests (FIXTURES.md F4;
reference ``expr.rs:259-442``) onto our conjunct representation.
"""

from __future__ import annotations

import pytest

from datafusion_uwheel_spark.plans.predicates import (
    canonical_filter_key,
    extract_min_max_predicate,
    extract_wheel_range,
    split_temporal_filter,
)
from datafusion_uwheel_spark.plans.sqlparse import (
    ParseError,
    parse_conjunction,
    parse_select,
)

A_US = 1_715_299_200_000_000  # 2024-05-10T00:00:00Z
B_US = 1_715_299_210_000_000  # 2024-05-10T00:00:10Z


def conj(s):
    return parse_conjunction(s)


# ---------------------------------------------------------------- parsing
def test_parse_count_star():
    q = parse_select("SELECT COUNT(*) FROM t WHERE ts >= '2024-05-10 00:00:00' AND ts < '2024-05-10 00:00:10'")
    assert q.table == "t"
    assert len(q.aggs) == 1 and q.aggs[0].func == "count" and q.aggs[0].arg is None
    assert len(q.conjuncts) == 2


def test_parse_aliases_and_multi_agg():
    q = parse_select("SELECT sum(value) AS s, avg(value) a2 FROM events WHERE ts >= '2024-01-01' AND ts < '2024-01-02'")
    assert [a.output_name for a in q.aggs] == ["s", "a2"]


def test_parse_group_by_date_trunc():
    q = parse_select(
        "SELECT date_trunc('hour', ts) AS bucket, count(*) AS cnt FROM events "
        "WHERE ts >= '2024-01-01' AND ts < '2024-01-02' GROUP BY date_trunc('hour', ts)"
    )
    assert q.group_by is not None
    assert q.group_by.granularity == "hour"
    assert q.group_by.output_name == "bucket"


def test_parse_timestamp_keyword_literal():
    q = parse_select("SELECT COUNT(*) FROM t WHERE ts >= TIMESTAMP '2024-05-10 00:00:00' AND ts < TIMESTAMP '2024-05-10 00:00:10'")
    rng = extract_wheel_range(q.conjuncts, "ts")
    assert rng.start_us == A_US and rng.end_us == B_US


def test_parse_cast_literal():
    # literal under CAST — reference tolerates casts (expr.rs:231-237)
    q = parse_select("SELECT COUNT(*) FROM t WHERE ts >= CAST('2024-05-10 00:00:00' AS TIMESTAMP) AND ts < CAST('2024-05-10 00:00:10' AS TIMESTAMP)")
    rng = extract_wheel_range(q.conjuncts, "ts")
    assert rng is not None and rng.routable


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT * FROM a JOIN b ON a.x = b.x",
        "SELECT count(*) FROM t WHERE a = 1 OR b = 2",
        "SELECT rank() OVER (ORDER BY x) FROM t",
        "SELECT count(*) FROM (SELECT 1)",
        "SELECT x + 1 FROM t",
    ],
)
def test_unroutable_shapes_raise(sql):
    with pytest.raises(ParseError):
        parse_select(sql)


# ----------------------------------------------------------- range extraction
def test_range_ge_lt_is_exact():
    rng = extract_wheel_range(conj("ts >= '2024-05-10 00:00:00' AND ts < '2024-05-10 00:00:10'"), "ts")
    assert (rng.start_us, rng.end_us) == (A_US, B_US)
    assert rng.exact and rng.second_aligned and rng.routable


def test_single_bound_returns_none():
    # expr.rs:317-328 — both bounds required
    assert extract_wheel_range(conj("ts >= '2024-05-10 00:00:00'"), "ts") is None


def test_range_wrong_column_none():
    # expr.rs:344-349
    assert extract_wheel_range(conj("other >= '2024-05-10' AND other < '2024-05-11'"), "ts") is None


def test_equality_on_time_column_none():
    # expr.rs:351-356 — `= literal` on the time column is not a range
    assert extract_wheel_range(conj("ts = '2024-05-10 00:00:00'"), "ts") is None


def test_ge_le_not_exact():
    # `<=` upper bound: the reference sloppily treats it as `<`
    # (expr.rs:219-222); we extract it but mark it unroutable.
    rng = extract_wheel_range(conj("ts >= '2024-05-10 00:00:00' AND ts <= '2024-05-10 00:00:10'"), "ts")
    assert rng is not None and not rng.exact and not rng.routable


def test_between_not_exact():
    rng = extract_wheel_range(conj("ts BETWEEN '2024-05-10 00:00:00' AND '2024-05-10 00:00:10'"), "ts")
    assert rng is not None and not rng.exact


def test_subsecond_bound_not_aligned():
    rng = extract_wheel_range(conj("ts >= '2024-05-10 00:00:00.500' AND ts < '2024-05-10 00:00:10'"), "ts")
    assert rng is not None and not rng.second_aligned and not rng.routable


def test_inverted_range_not_routable():
    # WheelRange::new validates start <= end (expr.rs:46-57)
    rng = extract_wheel_range(conj("ts >= '2024-05-10 00:00:10' AND ts < '2024-05-10 00:00:00'"), "ts")
    assert rng is not None and not rng.routable


# ------------------------------------------------------------ minmax + split
def test_min_max_predicate_extraction():
    # expr.rs:388-441: range AND value > 1000 → MinMax filter
    conjs = conj("ts >= '2024-05-10 00:00:00' AND ts < '2024-05-10 00:00:10' AND fare > 1000")
    rng, residual = split_temporal_filter(conjs, "ts")
    assert rng is not None and rng.routable
    pred = extract_min_max_predicate(residual)
    assert (pred.column, pred.op, pred.value) == ("fare", ">", 1000.0)


def test_min_max_requires_numeric_literal():
    assert extract_min_max_predicate(conj("name > 'abc'")) is None


def test_split_residual_keyed_filter():
    conjs = conj("ts >= '2024-05-10 00:00:00' AND ts < '2024-05-10 00:00:10' AND event_type = 'click'")
    rng, residual = split_temporal_filter(conjs, "ts")
    assert rng is not None
    assert canonical_filter_key(residual) == "event_type = 'click'"


def test_canonical_filter_key_order_insensitive():
    a = conj("a = 1 AND b = 2")
    b = conj("b = 2 AND a = 1")
    assert canonical_filter_key(a) == canonical_filter_key(b)
