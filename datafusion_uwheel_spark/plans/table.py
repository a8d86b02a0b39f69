"""DataFrame-style accelerated entry point (SURVEY.md §3.2).

The reference accepts hand-built logical plans through the same optimizer
pass as SQL (``LogicalPlanBuilder::scan().filter().aggregate().project()`` →
``ctx.execute_logical_plan``, ``examples/memtable/src/main.rs:47-66``). The
Spark-first analogue: :class:`WheelTable` records the same plan shape with
fluent verbs, renders it to the engine's routable SQL dialect, and terminal
verbs route-or-delegate through the identical :class:`..plans.router.Router`
path — so DataFrame-style and SQL-style queries can never disagree.

Fragments are SQL expression strings (predicates, aggregate lists) — the
same grammar :mod:`.sqlparse` accepts; anything outside it simply delegates
to Spark, exactly like the SQL front door.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import DataFrame

if TYPE_CHECKING:  # pragma: no cover
    from ..engine import WheelEngine

__all__ = ["WheelTable"]


class WheelTable:
    """Immutable fluent builder over one engine table.

    Example::

        engine.table_plan().filter("ts >= '2024-01-05 00:00:00' AND ts < '2024-01-12 00:00:00'") \
                           .agg("COUNT(*) AS n")
    """

    def __init__(
        self,
        engine: "WheelEngine",
        _filters: tuple[str, ...] = (),
        _group: str | None = None,
        _having: tuple[str, ...] = (),
        _order: tuple[str, ...] = (),
        _limit: int | None = None,
    ):
        self._engine = engine
        self._filters = _filters
        self._group = _group
        self._having = _having
        self._order = _order
        self._limit = _limit

    def _with(self, **kw) -> "WheelTable":
        args = {
            "_filters": self._filters,
            "_group": self._group,
            "_having": self._having,
            "_order": self._order,
            "_limit": self._limit,
        }
        args.update(kw)
        return WheelTable(self._engine, **args)

    # ------------------------------------------------------------- verbs
    def filter(self, predicate: str) -> "WheelTable":
        """AND another predicate conjunction (``Filter`` node)."""
        return self._with(_filters=(*self._filters, predicate))

    where = filter

    def group_by(self, expr: str) -> "WheelTable":
        """Group by a ``date_trunc('<gran>', ts)`` expression (the only group
        shape the index can answer; anything else delegates)."""
        return self._with(_group=expr)

    groupBy = group_by

    def having(self, predicate: str) -> "WheelTable":
        """AND a HAVING clause (``agg(col) op number``; index-evaluated)."""
        return self._with(_having=(*self._having, predicate))

    def order_by(self, *exprs: str) -> "WheelTable":
        """ORDER BY output columns (e.g. ``"bucket DESC"``)."""
        return self._with(_order=(*self._order, *exprs))

    orderBy = order_by

    def limit(self, n: int) -> "WheelTable":
        return self._with(_limit=int(n))

    # ---------------------------------------------------------- terminals
    def _sql(self, select_list: str) -> str:
        sql = f"SELECT {select_list} FROM {self._engine.name}"
        if self._filters:
            sql += " WHERE " + " AND ".join(f"{f}" for f in self._filters)
        if self._group is not None:
            sql += f" GROUP BY {self._group}"
        if self._having:
            sql += " HAVING " + " AND ".join(self._having)
        if self._order:
            sql += " ORDER BY " + ", ".join(self._order)
        if self._limit is not None:
            sql += f" LIMIT {self._limit}"
        return sql

    def agg(self, *aggregates: str) -> DataFrame:
        """Terminal: aggregate expressions (``Aggregate`` + ``Projection``).
        Group expression (if any) is prepended to the output columns."""
        select = ", ".join(
            ([f"{self._group} AS bucket"] if self._group is not None else [])
            + list(aggregates)
        )
        return self._engine.sql(self._sql(select))

    def agg_rows(self, *aggregates: str) -> list:
        """Terminal: :meth:`agg` through the direct-rows path
        (``engine.sql_rows``) — routed answers as plain ``Row`` lists with
        zero JVM round trips; delegates collect via ``spark.sql``."""
        select = ", ".join(
            ([f"{self._group} AS bucket"] if self._group is not None else [])
            + list(aggregates)
        )
        return self._engine.sql_rows(self._sql(select))

    def select_star(self) -> DataFrame:
        """Terminal: ``SELECT *`` — the pruning-eligible shape (R6/R7)."""
        return self._engine.sql(self._sql("*"))

    def sql(self, select_list: str) -> str:
        """The SQL this plan renders to (for tests/explain)."""
        return self._sql(select_list)
