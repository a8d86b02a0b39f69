/*
 * Catalyst optimizer-rule shim: accelerate plain `spark.sql(...)` from the
 * wheel rollup — the drop-in host-optimizer integration the reference gets
 * from `SessionStateBuilder::with_optimizer_rules`
 * (datafusion-uwheel/src/lib.rs:843-869, examples/nyc_taxi/src/main.rs:71-79).
 *
 * Pure public Spark API (SparkSessionExtensions.injectOptimizerRule). The
 * Python engine stays the source of truth: it registers the COUNT rollup as
 * a temp view `__uwheel_rollup_<table>` (columns sec: long, cnt: long — one
 * row per occupied second) and pins per-table metadata in session confs:
 *
 *   spark.uwheel.shim.tables            = "events,..."
 *   spark.uwheel.shim.<table>.path      = parquet root the table reads
 *   spark.uwheel.shim.<table>.time_col  = designated time column
 *
 * Scope (prototype, mirroring the reference's R1 only): a logical plan of
 * shape Aggregate([], [COUNT(*) AS a], Filter(ts >= L AND ts < U, scan)) over
 * a registered parquet root, with second-aligned literal timestamp bounds, is
 * replaced by Aggregate([], [SUM(cnt) AS a], Filter(sec in range, rollup)).
 * The rewritten aggregate reuses the original output ExprId, so parent plans
 * resolve unchanged. Anything else falls through untouched — the same
 * whole-plan match-or-nothing discipline as `try_rewrite` returning None
 * (lib.rs:246-252).
 *
 * Tables are recognized by their file-source root path (by the time optimizer
 * rules run, EliminateSubqueryAliases has stripped the view name), which also
 * makes the rewrite safe under `SELECT ... FROM parquet.`/path/`` style scans.
 */
package io.uwheel.spark

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.TimestampType

class UwheelExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(session => UwheelCountRewrite(session))
}

case class UwheelCountRewrite(session: SparkSession)
    extends Rule[LogicalPlan]
    with PredicateHelper {

  private val Micros = 1000000L

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val tables = registeredTables()
    if (tables.isEmpty) plan
    else
      plan transformUp {
        case agg @ Aggregate(Nil, Seq(alias @ Alias(ae: AggregateExpression, _)), child, _)
            if isCountStar(ae) =>
          tryRewrite(alias, child, tables).getOrElse(agg)
      }
  }

  /** path root -> (table name, time column) */
  private def registeredTables(): Map[String, (String, String)] =
    session.conf.getOption("spark.uwheel.shim.tables") match {
      case Some(s) =>
        s.split(",").map(_.trim).filter(_.nonEmpty).flatMap { t =>
          for {
            p <- session.conf.getOption(s"spark.uwheel.shim.$t.path")
            c <- session.conf.getOption(s"spark.uwheel.shim.$t.time_col")
          } yield normalize(p) -> (t, c)
        }.toMap
      case None => Map.empty
    }

  private def normalize(p: String): String =
    p.stripPrefix("file:").stripSuffix("/")

  private def isCountStar(ae: AggregateExpression): Boolean =
    !ae.isDistinct && ae.filter.isEmpty && (ae.aggregateFunction match {
      case Count(children) => children.nonEmpty && children.forall(_.foldable)
      case _               => false
    })

  /** Unwrap column-pruning Projects around Filter(cond, parquet scan). */
  private def filterOverScan(plan: LogicalPlan): Option[(Expression, LogicalRelation)] =
    plan match {
      case Filter(c, r: LogicalRelation)             => Some((c, r))
      case Filter(c, Project(_, r: LogicalRelation)) => Some((c, r))
      case Project(_, inner)                         => filterOverScan(inner)
      case _                                         => None
    }

  private def scanRoot(rel: LogicalRelation): Option[String] =
    rel.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.headOption.map(p => normalize(p.toString))
      case _ => None
    }

  /** ts-range bounds [lo, hi) in epoch micros from exactly two conjuncts. */
  private def bounds(cond: Expression, timeCol: String): Option[(Long, Long)] = {
    def isTime(e: Expression): Boolean = e match {
      case a: AttributeReference => a.name.equalsIgnoreCase(timeCol)
      case _                     => false
    }
    val conjuncts = splitConjunctivePredicates(cond)
    if (conjuncts.size != 2) return None
    var lo: Option[Long] = None
    var hi: Option[Long] = None
    conjuncts.foreach {
      case GreaterThanOrEqual(a, Literal(v: Long, TimestampType)) if isTime(a) =>
        lo = Some(v)
      case LessThanOrEqual(Literal(v: Long, TimestampType), a) if isTime(a) =>
        lo = Some(v)
      case LessThan(a, Literal(v: Long, TimestampType)) if isTime(a) =>
        hi = Some(v)
      case GreaterThan(Literal(v: Long, TimestampType), a) if isTime(a) =>
        hi = Some(v)
      case _ => ()
    }
    (lo, hi) match {
      case (Some(l), Some(h))
          if l % Micros == 0 && h % Micros == 0 && l <= h =>
        Some((l, h))
      case _ => None
    }
  }

  private def tryRewrite(
      alias: Alias,
      child: LogicalPlan,
      tables: Map[String, (String, String)]
  ): Option[LogicalPlan] =
    for {
      (cond, rel) <- filterOverScan(child)
      root <- scanRoot(rel)
      (table, timeCol) <- tables.get(root)
      (lo, hi) <- bounds(cond, timeCol)
      rollup <- rollupPlan(table)
      sec <- rollup.output.find(_.name == "sec")
      cnt <- rollup.output.find(_.name == "cnt")
    } yield {
      val pruned = Filter(
        And(
          GreaterThanOrEqual(sec, Literal(lo / Micros)),
          LessThan(sec, Literal(hi / Micros))
        ),
        rollup
      )
      val sum = AggregateExpression(Sum(cnt), Complete, isDistinct = false)
      // COUNT over an empty range is 0, SUM is NULL — coalesce, and keep the
      // original output ExprId so references above the aggregate still bind.
      val out = Alias(Coalesce(Seq(sum, Literal(0L))), alias.name)(exprId = alias.exprId)
      Aggregate(Nil, Seq(out), pruned, None)
    }

  /** The rollup view's analyzed plan, with the SubqueryAlias/View wrappers
    * stripped: EliminateSubqueryAliases/EliminateView ran in the Finish
    * Analysis batch before this rule fires, so a subtree injected now must
    * arrive already stripped or physical planning has "No plan for" it. */
  private def stripViews(plan: LogicalPlan): LogicalPlan = plan match {
    case SubqueryAlias(_, child) => stripViews(child)
    case v: View                 => stripViews(v.child)
    case other                   => other
  }

  private def rollupPlan(table: String): Option[LogicalPlan] =
    try
      Some(stripViews(session.table(s"__uwheel_rollup_$table").queryExecution.analyzed))
    catch { case _: Exception => None }
}
