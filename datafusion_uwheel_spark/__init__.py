"""datafusion_uwheel_spark — a PySpark-native temporal wheel-index engine.

A from-scratch re-expression of the capabilities of
``uwheel/datafusion-uwheel`` (reference snapshot at ``/root/reference``,
read-only) on Apache Spark: pre-aggregated temporal rollup indices over a
designated time column, plus a query router that answers matching temporal
aggregates / group-bys / pruning queries from driver-side index lookups at
plan time and delegates everything else to Spark SQL / Catalyst untouched.

Not a port: the reference is a Rust DataFusion ``OptimizerRule``; this engine
is built on DataFrames (declarative rollup jobs, LocalRelation answers) and
adds LLM-data-pipeline operators (dedup, similarity, text analysis,
multimodal plumbing) designed for 100 TB scale.
"""

from .catalog import WheelCatalog
from .engine import WheelEngine
from .operators.lookup import STAR_AGGREGATION_ALIAS, WheelIndex
from .plans.router import RouteDecision
from .session import get_spark
from .similarity_engine import SimilarityEngine, SimRoute

__all__ = [
    "WheelEngine",
    "WheelCatalog",
    "WheelIndex",
    "RouteDecision",
    "STAR_AGGREGATION_ALIAS",
    "get_spark",
    "SimilarityEngine",
    "SimRoute",
]

__version__ = "0.1.0"
