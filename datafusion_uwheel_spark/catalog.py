"""Multi-table catalog: one SQL front door over many wheel engines.

The reference binds one optimizer instance to one table (``name: String``,
``datafusion-uwheel/src/lib.rs:76-77``); querying several indexed tables
means juggling several optimizers. :class:`WheelCatalog` lifts that
restriction: it owns one :class:`.engine.WheelEngine` per registered table
and dispatches each query to the owning engine by the parsed table name —
unknown tables, multi-table queries (joins), and unparseable SQL delegate
to ``spark.sql`` over the registered temp views, so the full relational
surface keeps working across tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .engine import WheelEngine, _memo_get, _memo_put
from .plans.router import RouteDecision
from .plans.sqlparse import ParseError, parse_select, split_with_ctes

__all__ = ["WheelCatalog"]

#: Monotonic suffix for routed-CTE temp views — keeps concurrent catalogs
#: (or re-entrant .sql calls) from clobbering each other's views.
_CTE_VIEW_SEQ = 0


class WheelCatalog:
    def __init__(self, spark: SparkSession):
        from collections import OrderedDict

        self.spark = spark
        self.engines: dict[str, WheelEngine] = {}
        self.sim_engines: dict[str, object] = {}
        self.last_route: RouteDecision | None = None
        #: query text → ParsedQuery | ParseError: the catalog's dispatch
        #: parse, memoized like the engines' (it survives index mutations —
        #: parses depend on text alone) so the direct path pays one
        #: tokenize total, amortized to zero for repeated dashboard text.
        self._parse_cache: OrderedDict[str, object] = OrderedDict()

    def register(self, name: str, source, time_column: str, **kwargs) -> WheelEngine:
        """Create and own an engine for ``name`` (same parameters as
        :class:`WheelEngine`); returns it for ``build_index`` calls."""
        eng = WheelEngine(self.spark, name, source, time_column, **kwargs)
        self.engines[name.lower()] = eng
        return eng

    def adopt(self, engine: WheelEngine) -> WheelEngine:
        """Register an ALREADY-constructed engine under its own table name —
        the migration path for code holding per-table engines that wants the
        catalog front door without rebuilding indexes."""
        self.engines[engine.name.lower()] = engine
        return engine

    def _parse(self, query: str):
        hit = _memo_get(self._parse_cache, query)
        if hit is not None:
            if isinstance(hit, ParseError):
                raise hit
            return hit
        try:
            parsed = parse_select(query)
        except ParseError as err:
            _memo_put(self._parse_cache, query, err)
            raise
        _memo_put(self._parse_cache, query, parsed)
        return parsed

    def engine(self, name: str) -> WheelEngine:
        return self.engines[name.lower()]

    def register_similarity(self, name: str, source, dim: int, **kwargs):
        """Create and own a :class:`.similarity_engine.SimilarityEngine` for
        an embedding table — the catalog is the one front door over both
        index families (temporal wheels + ANN)."""
        from .similarity_engine import SimilarityEngine

        eng = SimilarityEngine(self.spark, name, source, dim, **kwargs)
        self.sim_engines[name.lower()] = eng
        return eng

    def similarity(self, name: str):
        return self.sim_engines[name.lower()]

    def sql(self, query: str) -> DataFrame:
        """Route to the owning engine's wheel lookups, else delegate.

        Single-table routable queries go to the owning engine whole. A
        multi-table query is delegated — but first, if it is a plain
        ``WITH`` query, each CTE whose body is itself routable is answered
        from the wheel and spliced back in as a temp view, so a routable
        aggregate feeding a join still skips the scan (beyond the
        reference, which only matches whole plans — ``lib.rs:246-252``).
        The routed answers are tiny driver-built frames, so Catalyst
        broadcasts them into the surrounding join for free.
        """
        try:
            parsed = self._parse(query)
        except ParseError as err:
            routed = self._route_ctes(query)
            if routed is not None:
                return routed
            self.last_route = RouteDecision("delegate", detail={"reason": str(err)})
            return self.spark.sql(query)
        eng = self.engines.get(parsed.table.lower())
        if eng is None:
            self.last_route = RouteDecision(
                "delegate", detail={"reason": f"unregistered table {parsed.table!r}"}
            )
            return self.spark.sql(query)
        df = eng.sql(query)
        self.last_route = eng.last_route
        return df

    def sql_rows(self, query: str) -> list:
        """:meth:`sql` with the DataFrame layer peeled off — the catalog
        front door to :meth:`.engine.WheelEngine.sql_rows`: single-table
        routed answers come back as plain ``Row`` lists with zero JVM round
        trips (µs, not the ~5-10 ms py4j floor a DataFrame pays), so a
        multi-table dashboard needs no per-engine handles to get the direct
        path. Unregistered tables and unparseable SQL run
        ``spark.sql(...).collect()``; a ``WITH`` query goes through the CTE
        splicer first (its routed CTEs skip the table scans, but the outer
        join still executes on the JVM — there is nothing driver-resident
        to hand back). Identical rows to ``self.sql(query).collect()`` in
        every case."""
        try:
            parsed = self._parse(query)
        except ParseError as err:
            routed = self._route_ctes(query)
            if routed is not None:
                return routed.collect()
            self.last_route = RouteDecision("delegate", detail={"reason": str(err)})
            return self.spark.sql(query).collect()
        eng = self.engines.get(parsed.table.lower())
        if eng is None:
            self.last_route = RouteDecision(
                "delegate", detail={"reason": f"unregistered table {parsed.table!r}"}
            )
            return self.spark.sql(query).collect()
        out = eng.sql_rows(query, _parsed=parsed)
        self.last_route = eng.last_route
        return out

    def _route_ctes(self, query: str) -> DataFrame | None:
        """Wheel-answer the routable CTEs of a ``WITH`` query; ``None`` if
        the query isn't a splittable WITH or no CTE routed (caller then
        delegates the original text untouched)."""
        global _CTE_VIEW_SEQ
        try:
            ctes, main = split_with_ctes(query)
        except ParseError:
            return None
        parts: list[str] = []
        routed: dict[str, str] = {}
        delegated: list[str] = []
        for name, body in ctes:
            eng = None
            try:
                eng = self.engines.get(parse_select(body).table.lower())
            except ParseError:
                pass
            if eng is not None:
                df = eng.sql(body)
                if eng.last_route is not None and eng.last_route.rewritten:
                    _CTE_VIEW_SEQ += 1
                    view = f"__uw_cte_{_CTE_VIEW_SEQ}"
                    df.createOrReplaceTempView(view)
                    # Swap only the body: the CTE keeps its name, so the
                    # main query text never needs identifier rewriting.
                    parts.append(f"{name} AS (SELECT * FROM {view})")
                    routed[name] = eng.last_route.kind
                    continue
            delegated.append(name)
            parts.append(f"{name} AS ({body})")
        if not routed:
            return None
        rewritten = "WITH " + ", ".join(parts) + " " + main
        self.last_route = RouteDecision(
            "cte_rewrite",
            detail={"routed": routed, "delegated": delegated, "sql": rewritten},
        )
        return self.spark.sql(rewritten)

    def index_usage_bytes(self) -> int:
        return sum(e.index_usage_bytes() for e in self.engines.values())
