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

from .engine import WheelEngine
from .plans.router import RouteDecision
from .plans.sqlparse import ParseError, parse_select

__all__ = ["WheelCatalog"]


class WheelCatalog:
    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.engines: dict[str, WheelEngine] = {}
        self.sim_engines: dict[str, object] = {}
        self.last_route: RouteDecision | None = None

    def register(self, name: str, source, time_column: str, **kwargs) -> WheelEngine:
        """Create and own an engine for ``name`` (same parameters as
        :class:`WheelEngine`); returns it for ``build_index`` calls."""
        eng = WheelEngine(self.spark, name, source, time_column, **kwargs)
        self.engines[name.lower()] = eng
        return eng

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
        """Route to the owning engine's wheel lookups, else delegate."""
        try:
            parsed = parse_select(query)
        except ParseError as err:
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

    def index_usage_bytes(self) -> int:
        return sum(e.index_usage_bytes() for e in self.engines.values())
