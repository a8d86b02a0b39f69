/*
 * Catalyst optimizer-rule shim: accelerate plain `spark.sql(...)` from the
 * wheel rollup — the drop-in host-optimizer integration the reference gets
 * from `SessionStateBuilder::with_optimizer_rules`
 * (datafusion-uwheel/src/lib.rs:843-869, examples/nyc_taxi/src/main.rs:71-79).
 *
 * Pure public Spark API (SparkSessionExtensions.injectOptimizerRule). The
 * Python engine stays the source of truth: it registers rollup temp views
 * and pins per-table metadata in session confs:
 *
 *   spark.uwheel.shim.tables            = "events,..."
 *   spark.uwheel.shim.<table>.path      = parquet root the table reads
 *   spark.uwheel.shim.<table>.time_col  = designated time column
 *   spark.uwheel.shim.<table>.bucket_sec= wheel bucket width in seconds
 *   spark.uwheel.shim.<table>.agg_cols  = "value,..." (lowercased)
 *
 * Views (one row per occupied bucket, `sec` = bucket-start epoch second):
 *   __uwheel_rollup_<table>       : (sec, cnt)                  COUNT wheel
 *   __uwheel_rollup_<table>__agg  : (sec, cnt, vcnt_<c>, sum_<c>, min_<c>,
 *     max_<c> per registered column c) — ONE combined view for all columns
 *     (every unfiltered wheel of a table shares the occupied-bucket
 *     domain), so mixed-column aggregates rewrite without view joins;
 *     sum/min/max are NULL where vcnt = 0 (all-NULL bucket), so the
 *     rewritten SUM/MIN/MAX skip them and an all-NULL range answers NULL —
 *     SQL aggregate semantics for free.
 *
 * Scope (the reference's R1–R4 whole-plan family): plans of shape
 *   Aggregate([], [agg1 AS a1, ..., aggN AS aN],
 *             Filter(ts >= L AND ts < U, scan))                 — scalar
 *   Aggregate([date_trunc(g, ts)], [date_trunc(g, ts) AS b, aggs...],
 *             Filter(ts >= L AND ts < U, scan))                 — group-by
 *   Aggregate([window], [window(.start/.end)?, aggs...],
 *             Project(TimeWindowing struct, Filter(..., scan))) — tumbling
 *             GROUP BY window(ts, w[, s[, off]]) when slide and offset
 *             tile the buckets; HOPPING windows (Expand plans) rewrite
 *             too when additionally w % s == 0 (see tryHop) — rollup
 *             rows replicate through the kept Expand exactly as raw rows
 *             would; non-dividing hops fall through
 * over a registered parquet root, with BUCKET-aligned literal timestamp
 * bounds, where every agg is a non-DISTINCT unfiltered COUNT(*) / COUNT(c) /
 * SUM(c) / MIN(c) / MAX(c) / AVG(c) over registered columns c,
 * are replaced by the same aggregate over the pruned rollup view
 * (every matched attribute must bind to the scan's own output — a
 * surviving rename alias never matches a rollup state column; absent-bound
 * landmark shapes additionally require the registration-time
 * `ts_nonnull = true` attestation, because the rollup drops NULL-ts rows
 * that an UNbounded scan would count):
 *   COUNT(*)→ COALESCE(SUM(cnt),0)   COUNT(c)→ COALESCE(SUM(vcnt),0)
 *   SUM(c)  → SUM(sum)               MIN/MAX(c)→ MIN(min)/MAX(max)
 *   AVG(c)  → SUM(sum) / SUM(vcnt)   (LEGACY division: NULL over empty)
 *   STDDEV/VARIANCE(_POP/_SAMP)(c) → algebraic form over SUM(sumsq_c),
 *     SUM(sum_c), SUM(vcnt_c) when the view exports the sum-of-squares
 *     state (negative-clamped against float cancellation; LEGACY divides
 *     give NULL over empty and for _SAMP at n=1)
 * Scalar shapes whose bounds the exact path cannot tile — BETWEEN, `<=`,
 * `>`, bucket-unaligned literals, `ts = instant` equality, and
 * OR-of-ranges (legs merged into disjoint intervals) — rewrite HYBRID:
 * the bucket-aligned cores come from the pruned rollup, the sub-bucket
 * remainders from a sliver scan whose pushed-down ts predicate covers at
 * most two bucket-widths per interval, unioned as partial states under
 * the original aggregates (see tryHybrid; the reference APPROXIMATES the
 * boundary ops, expr.rs:83-105, and rejects OR / time equality outright).
 * The group-by form regroups the rollup under the ORIGINAL TruncTimestamp
 * expression applied to the bucket-start (`date_trunc(g,
 * seconds_to_timestamp(sec))`), so Spark's own calendar logic (weeks,
 * months, session time zone) produces the grouping keys — no re-derivation
 * to diverge from. Sub-second granularities never rewrite; with coarse
 * wheel buckets (bucket_sec > 1) the granularity must tile into buckets
 * and the session zone must be UTC (epoch-aligned buckets only provably
 * tile local calendar boundaries there).
 * Result types are preserved because the Python side exports the rollup
 * columns with the indexed column's own Spark types. Rewritten aggregates
 * reuse the original output ExprIds, so parent plans (ORDER BY, HAVING,
 * projections) resolve unchanged. Anything else falls through untouched —
 * the same whole-plan match-or-nothing discipline as `try_rewrite`
 * returning None (lib.rs:246-252).
 *
 * SELECT * scan pruning (reference R6/R7, lib.rs:608-649): a Filter whose
 * temporal range (any alignment — the proof covers the enclosing buckets)
 * and optional single numeric comparison the driver-resident rollup
 * PROVES match zero rows is replaced with an empty relation at plan time —
 * count-proof from cnt, min/max-proof from the per-bucket envelopes;
 * file-backed views are not consulted (the proof stays an in-memory
 * iteration) and anything unprovable scans normally.
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
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType, IntegerType, LongType, StringType, TimestampNTZType, TimestampType}

class UwheelExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(session => UwheelAggRewrite(session))
    UwheelBloom.inject(ext)
  }
}

/** SQL-callable bloom-filter functions (r11): Spark ships
  * `BloomFilterAggregate` / `BloomFilterMightContain` for its own
  * runtime row-level filters but does NOT register them in the public
  * FunctionRegistry — `injectFunction` exposes the same codegen'd
  * expressions to any session built with the shim extensions:
  *
  *   uw_bloom_agg(x[, est_items[, num_bits]])  -> binary blob (one row)
  *   uw_might_contain(blob, x)                 -> boolean
  *
  * Non-BIGINT inputs are wrapped in `xxhash64(x)` on BOTH sides, so a
  * blob built over strings tests strings consistently; BIGINT inputs
  * (e.g. already-xxhash64'd n-gram keys) pass through untouched — the
  * layout then matches what `BloomFilter.putLong` would produce.
  * `est_items`/`num_bits` must be foldable positive BIGINTs within the
  * session's `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` /
  * `.maxNumBits` caps (Spark's own analysis check — raise the confs for
  * bigger filters). False positives only: a `might_contain` TRUE needs a
  * downstream exact check, FALSE is definitive. */
object UwheelBloom {
  import org.apache.spark.sql.catalyst.FunctionIdentifier

  private def hashed(e: Expression): Expression = e.dataType match {
    case LongType => e
    case _        => new XxHash64(Seq(e))
  }

  private val aggBuilder: Seq[Expression] => Expression = {
    case Seq(c)              => new BloomFilterAggregate(hashed(c))
    case Seq(c, items)       => new BloomFilterAggregate(hashed(c), items)
    case Seq(c, items, bits) => new BloomFilterAggregate(hashed(c), items, bits)
    case children =>
      throw new IllegalArgumentException(
        s"uw_bloom_agg takes 1-3 arguments, got ${children.length}")
  }

  private val containBuilder: Seq[Expression] => Expression = {
    case Seq(blob, v) => BloomFilterMightContain(blob, hashed(v))
    case children =>
      throw new IllegalArgumentException(
        s"uw_might_contain takes 2 arguments, got ${children.length}")
  }

  def inject(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("uw_bloom_agg"),
      new ExpressionInfo("io.uwheel.spark.UwheelBloom", "uw_bloom_agg"),
      aggBuilder
    ))
    ext.injectFunction((
      FunctionIdentifier("uw_might_contain"),
      new ExpressionInfo("io.uwheel.spark.UwheelBloom", "uw_might_contain"),
      containBuilder
    ))
  }

  /** Runtime registration for sessions built WITHOUT the extensions conf
    * (e.g. plain `get_spark`, which only puts this jar on the driver
    * classpath): one py4j call registers both functions as session temp
    * functions. Idempotent — createOrReplace semantics. */
  def register(session: org.apache.spark.sql.classic.SparkSession): Unit = {
    val reg = session.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("uw_bloom_agg", aggBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("uw_might_contain", containBuilder, "scala_udf")
  }
}

case class UwheelAggRewrite(session: SparkSession)
    extends Rule[LogicalPlan]
    with PredicateHelper {

  private val Micros = 1000000L

  /** `spark.uwheel.shim.debug=true` traces match decisions to stderr —
    * the rule is silent by design (fallthrough is always sound), so this
    * is the supported way to see WHY a query didn't rewrite. */
  private def dbg(msg: => String): Unit =
    if (session.conf.getOption("spark.uwheel.shim.debug").contains("true"))
      System.err.println(s"[uwheel-shim] $msg")

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val tables = registeredTables()
    if (tables.isEmpty) plan
    else
      plan transformUp {
        case agg @ Aggregate(gexprs, exprs, child, _)
            if exprs.nonEmpty && gexprs.size <= 2 =>
          val exact = resolveGroups(gexprs, child) match {
            case Some(groups) => tryRewrite(exprs, groups, child, tables)
            case None         => None
          }
          exact
            .orElse(
              // scalar aggregates whose bounds the exact path cannot tile
              // (<= / > ops, unaligned literals): rollup core + sliver scan
              if (gexprs.isEmpty) tryHybrid(exprs, child, tables) else None
            )
            .orElse(
              // GROUP BY date_trunc with hybrid (core + sliver) boundaries
              if (gexprs.size == 1) tryGroupHybrid(exprs, gexprs, child, tables)
              else None
            )
            .orElse(
              // hopping window() group-bys (Expand plans)
              tryHop(exprs, gexprs, child, tables)
            )
            .orElse(
              // hopping windows with hybrid (core + sliver) boundaries
              tryHopHybrid(exprs, gexprs, child, tables)
            )
            .getOrElse(agg)
        // SELECT * scan pruning (reference R6/R7, lib.rs:608-649): a
        // temporal/min-max predicate the driver-resident rollup PROVES
        // matches zero rows replaces the whole scan with an empty relation.
        // `spark.uwheel.shim.prune=false` is the ops kill-switch (it also
        // composes with the hybrid rewrite — a proven-empty sliver drops
        // the scan leg entirely — which the switch makes observable).
        case f @ Filter(cond, rel: LogicalRelation)
            if session.conf
              .getOption("spark.uwheel.shim.prune")
              .forall(_ != "false") =>
          if (provablyEmpty(cond, rel, tables)) LocalRelation(f.output) else f
      }
  }

  /** Grouping expressions the rollups can serve: at most one time-like
    * grouping (a `date_trunc` or a tumbling `window(ts, w[, s])` struct)
    * plus at most one plain key attribute (the partitioned-family view's
    * dimension). */
  private sealed trait GroupSpec { def orig: Expression }
  private sealed trait TimeLike extends GroupSpec
  private case class TimeGroup(orig: Expression, t: TruncTimestamp) extends TimeLike
  private case class WindowGroup(
      orig: Expression,
      struct: Expression,
      ts: AttributeReference,
      slide: Long,
      offset: Long
  ) extends TimeLike
  private case class KeyGroup(orig: AttributeReference) extends GroupSpec

  private def resolveGroups(
      gexprs: Seq[Expression],
      child: LogicalPlan
  ): Option[Seq[GroupSpec]] = {
    val specs = gexprs.map { g =>
      val aliased = g match {
        case t: TruncTimestamp     => Some(t: Expression)
        case a: AttributeReference => findAlias(a, child)
        case _                     => None
      }
      aliased match {
        case Some(t: TruncTimestamp) => Some(TimeGroup(g, t))
        case Some(e)                 => windowSpec(g, e)
        case None =>
          // not computed below the Aggregate: a plain scan column (the
          // rewrite later requires it binds to rel.outputSet — an alias
          // merely NAMED like a registered column never matches)
          g match {
            case a: AttributeReference => Some(KeyGroup(a))
            case _                     => None
          }
      }
    }
    if (specs.exists(_.isEmpty)) None
    else {
      val out = specs.map(_.get)
      val times = out.count(_.isInstanceOf[TimeLike])
      val keys = out.count(_.isInstanceOf[KeyGroup])
      if (times <= 1 && keys <= 1) Some(out) else None
    }
  }

  /** The expression a grouping attribute is bound to: after
    * PullOutGroupingExpressions (which runs before injected rules) computed
    * grouping keys live as `expr AS _groupingexpression` aliases in a
    * Project below the Aggregate; the analyzer's TimeWindowing leaves
    * `named_struct(...) AS window` the same way. */
  private def findAlias(a: AttributeReference, child: LogicalPlan): Option[Expression] = {
    def find(p: LogicalPlan): Option[Expression] = p match {
      case Project(list, inner) =>
        list.collectFirst {
          case al @ Alias(c, _) if al.exprId == a.exprId => c
        }.orElse(find(inner))
      case _ => None
    }
    find(child)
  }

  /** A grouping attribute bound to the struct the analyzer's TimeWindowing
    * rule generates for a TUMBLING `GROUP BY window(ts, w[, s])`: extract
    * (slide, offset) micros from the `(conv(ts) - offset) % slide`
    * arithmetic. Only TimeWindowing emits PreciseTimestampConversion, so
    * the match cannot fire on user-written structs; hopping windows
    * (slide < width) compile to an Expand and fall through. Sound to
    * regroup from bucket starts whenever whole buckets land in one window
    * cell — window start = offset + slide * floor((t - offset)/slide)
    * depends on t only through that floor, which is constant across an
    * epoch-aligned bucket when slide and offset are bucket multiples. */
  private def windowSpec(orig: Expression, e: Expression): Option[GroupSpec] = e match {
    case s: CreateNamedStruct if s.deterministic && s.references.size == 1 =>
      val params = s.collect {
        case Remainder(l, Literal(slide: Long, LongType), _) =>
          l match {
            case Subtract(_: PreciseTimestampConversion, Literal(off: Long, LongType), _) =>
              Some((slide, off))
            case _: PreciseTimestampConversion => Some((slide, 0L))
            case _                             => None
          }
      }
      s.references.head match {
        case ts: AttributeReference
            if params.nonEmpty && params.forall(_.isDefined) &&
              params.flatten.distinct.size == 1 =>
          val (slide, off) = params.flatten.head
          if (slide > 0) Some(WindowGroup(orig, s, ts, slide, off)) else None
        case _ => None
      }
    case _ => None
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

  // ------------------------------------------------- aggregate recognition

  private sealed trait AggKind { def col: Option[String] }
  private case object CountStar extends AggKind { val col = None }
  private case class CountCol(c: String) extends AggKind { val col = Some(c) }
  private case class SumCol(c: String) extends AggKind { val col = Some(c) }
  private case class MinCol(c: String) extends AggKind { val col = Some(c) }
  private case class MaxCol(c: String) extends AggKind { val col = Some(c) }
  private case class AvgCol(c: String) extends AggKind { val col = Some(c) }
  // variance family from the sum-of-squares state; vkind ∈
  // var_pop | var_samp | stddev_pop | stddev_samp
  private case class VarCol(c: String, vkind: String) extends AggKind {
    val col = Some(c)
  }
  // COUNT(DISTINCT dimkey): exact from the key-complete dim view; the
  // key is NOT a state column (col = None keeps it out of coverage math —
  // the view requirement is enforced separately)
  private case class CountDistinctKey(c: String) extends AggKind { val col = None }

  /** Column name of a DIRECT scan attribute — aggregates/keys are matched
    * by name against registered columns, so the attribute must bind to the
    * scan's own output (a surviving rename alias over some other
    * expression must never match a rollup state column). */
  private def attrName(e: Expression, allowed: AttributeSet): Option[String] = e match {
    case a: AttributeReference if allowed.contains(a) => Some(a.name.toLowerCase)
    case _                                            => None
  }

  private def classify(ae: AggregateExpression, allowed: AttributeSet): Option[AggKind] =
    if (ae.filter.nonEmpty) None
    else if (ae.isDistinct)
      ae.aggregateFunction match {
        case Count(Seq(child)) => attrName(child, allowed).map(CountDistinctKey)
        case _                 => None
      }
    else
      ae.aggregateFunction match {
        case Count(children) if children.nonEmpty && children.forall(_.foldable) =>
          Some(CountStar)
        case Count(Seq(child)) => attrName(child, allowed).map(CountCol)
        case s: Sum            => attrName(s.child, allowed).map(SumCol)
        case m: Min            => attrName(m.child, allowed).map(MinCol)
        case m: Max            => attrName(m.child, allowed).map(MaxCol)
        case a: Average        => attrName(a.child, allowed).map(AvgCol)
        case v: VariancePop    => attrName(v.child, allowed).map(VarCol(_, "var_pop"))
        case v: VarianceSamp   => attrName(v.child, allowed).map(VarCol(_, "var_samp"))
        case v: StddevPop      => attrName(v.child, allowed).map(VarCol(_, "stddev_pop"))
        case v: StddevSamp     => attrName(v.child, allowed).map(VarCol(_, "stddev_samp"))
        case _                 => None
      }

  /** Unwrap column-pruning Projects around [Filter(cond,)] parquet scan —
    * a bare scan (no WHERE) is the landmark shape, sound because only
    * complete wheels register (the rollup holds the whole timeline). */
  private def filterOverScan(
      plan: LogicalPlan
  ): Option[(Option[Expression], LogicalRelation)] =
    plan match {
      case Filter(c, r: LogicalRelation)             => Some((Some(c), r))
      case Filter(c, Project(_, r: LogicalRelation)) => Some((Some(c), r))
      case r: LogicalRelation                        => Some((None, r))
      case Project(_, inner)                         => filterOverScan(inner)
      case _                                         => None
    }

  private def scanRoot(rel: LogicalRelation): Option[String] =
    rel.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.headOption.map(p => normalize(p.toString))
      case _ => None
    }

  /** ts-range bounds (lo?, hi?) in epoch micros — [lo, hi), half-open when
    * one side is absent, (None, None) for no WHERE at all (landmark) — plus
    * an optional single `key = 'string'` / `key IN ('a', 'b', ...)`
    * restriction (the keyed-wheel / dim-family match). EVERY conjunct must
    * be a recognized aligned bound or the key restriction or the whole
    * plan falls through (match-or-nothing). Open sides are sound because
    * only complete wheels register. */
  private def bounds(
      cond: Option[Expression],
      timeCol: String,
      bucketSec: Long,
      allowed: AttributeSet
  ): Option[(Option[Long], Option[Long], Option[(String, Seq[String])])] = {
    def isTime(e: Expression): Boolean = e match {
      case a: AttributeReference =>
        allowed.contains(a) && a.name.equalsIgnoreCase(timeCol)
      case _ => false
    }
    val conjuncts = cond.toSeq.flatMap(splitConjunctivePredicates)
    var lo: Option[Long] = None
    var hi: Option[Long] = None
    var key: Option[(String, Seq[String])] = None
    var nn = 0 // IsNotNull(ts) conjuncts the optimizer infers from bounds —
    //           a no-op here: the rollup build drops NULL-ts rows already
    var n = 0
    conjuncts.foreach {
      case GreaterThanOrEqual(a, TsLit(v)) if isTime(a) =>
        lo = Some(v); n += 1
      case LessThanOrEqual(TsLit(v), a) if isTime(a) =>
        lo = Some(v); n += 1
      case LessThan(a, TsLit(v)) if isTime(a) =>
        hi = Some(v); n += 1
      case GreaterThan(TsLit(v), a) if isTime(a) =>
        hi = Some(v); n += 1
      case IsNotNull(a) if isTime(a) =>
        nn += 1; n += 1
      case EqualTo(a: AttributeReference, Literal(s, t))
          if t == StringType && s != null && allowed.contains(a) =>
        key = Some((a.name.toLowerCase, Seq(s.toString))); n += 1
      case EqualTo(Literal(s, t), a: AttributeReference)
          if t == StringType && s != null && allowed.contains(a) =>
        key = Some((a.name.toLowerCase, Seq(s.toString))); n += 1
      case In(a: AttributeReference, vals)
          if allowed.contains(a) && vals.nonEmpty && vals.forall {
            case Literal(s, t) => t == StringType && s != null
            case _             => false
          } =>
        key = Some(
          (a.name.toLowerCase, vals.collect { case Literal(s, _) => s.toString })
        )
        n += 1
      case other =>
        dbg(
          s"unrecognized conjunct ${other.getClass.getSimpleName}: $other " +
            s"(children: ${other.children.map(c => s"$c:${c.dataType}").mkString(", ")})"
        )
    }
    val align = Micros * bucketSec
    // n counts recognized conjuncts; a duplicate-side overwrite makes the
    // distinct-slot sum fall short of conjuncts.size — both reject.
    if (n != conjuncts.size) None
    else if (lo.size + hi.size + key.size + nn != conjuncts.size) None
    else if (lo.exists(_ % align != 0) || hi.exists(_ % align != 0)) None
    else if (lo.zip(hi).exists { case (l, h) => l > h }) None
    else Some((lo, hi, key))
  }

  /** Split ONE ``col = 'string'`` equality over a scan column out of a
    * conjunction (the keyed-wheel match): ``(keyEq, remaining)``. More
    * than one string equality → no match (the router delegates those
    * too); zero → ``(None, cond)`` unchanged. */
  private def splitKeyEquality(
      cond: Expression,
      timeCol: String,
      allowed: AttributeSet
  ): Option[(Option[(AttributeReference, String)], Option[Expression])] = {
    val cs = splitConjunctivePredicates(cond)
    def keyOf(e: Expression): Option[(AttributeReference, String)] = e match {
      case EqualTo(a: AttributeReference, Literal(s, StringType))
          if allowed.contains(a) && !a.name.equalsIgnoreCase(timeCol) && s != null =>
        Some((a, s.toString))
      case EqualTo(Literal(s, StringType), a: AttributeReference)
          if allowed.contains(a) && !a.name.equalsIgnoreCase(timeCol) && s != null =>
        Some((a, s.toString))
      case _ => None
    }
    val eqs = cs.flatMap(keyOf(_))
    if (eqs.size > 1) None
    else Some((eqs.headOption, cs.filter(keyOf(_).isEmpty).reduceOption(And)))
  }

  private def sumAgg(e: Expression): Expression =
    AggregateExpression(Sum(e), Complete, isDistinct = false)

  private def minAgg(e: Expression): Expression =
    AggregateExpression(Min(e), Complete, isDistinct = false)

  private def maxAgg(e: Expression): Expression =
    AggregateExpression(Max(e), Complete, isDistinct = false)

  /** Seconds per fixed date_trunc level; calendar levels (week and up) are
    * whole local days. Sub-second levels never rewrite — finer than the
    * wheel's resolution. */
  private val FixedGranSecs =
    Map("second" -> 1L, "minute" -> 60L, "hour" -> 3600L, "day" -> 86400L, "dd" -> 86400L)
  private val CalendarGrans =
    Set("week", "month", "mon", "mm", "quarter", "year", "yyyy", "yy")

  /** Can `date_trunc(fmt, ·)` of every row in a bucket be read off the
    * bucket start? True iff whole buckets land in one trunc cell. */
  /** Timestamp literal micros, for BOTH timestamp flavors. TIMESTAMP_NTZ
    * comparisons are naive-micros vs naive-micros, and the rollup's `sec`
    * buckets ARE naive seconds for an NTZ-annotated source (parquet stores
    * the same int64 either way; the build never converts) — so range
    * matching is timezone-independent for NTZ and epoch-based for LTZ. */
  private object TsLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Long, TimestampType | TimestampNTZType) => Some(v)
      case _                                                  => None
    }
  }

  /** The bucket-start `sec` column materialized back as a timestamp OF THE
    * ORIGINAL COLUMN'S TYPE — an NTZ grouping must reconstruct NTZ (same
    * naive instant: epoch→UTC wall clock, explicitly pinned so the session
    * zone cannot shift it) or the rewritten schema/grouping keys diverge. */
  private def bucketTs(sec: Expression, dt: DataType): Expression =
    if (dt == TimestampNTZType)
      Cast(SecondsToTimestamp(sec), TimestampNTZType, Some("UTC"))
    else SecondsToTimestamp(sec)

  private def granTiles(fmt: String, bucketSec: Long, tz: String): Boolean = {
    val f = fmt.toLowerCase
    val known = FixedGranSecs.contains(f) || CalendarGrans.contains(f)
    if (!known) false
    else if (bucketSec == 1L) true // IANA offsets are whole seconds
    else if (tz != "UTC") false // only UTC provably epoch-aligns boundaries
    else FixedGranSecs.get(f) match {
      case Some(s) => s % bucketSec == 0
      case None    => 86400L % bucketSec == 0 // calendar cells are whole days
    }
  }

  /** The recognized shape of one output expression. */
  private sealed trait OutKind
  private case class AggOut(kind: AggKind) extends OutKind
  private case class GroupOut(idx: Int) extends OutKind
  // window.start / window.end projected out of a struct grouping
  private case class FieldOut(idx: Int, ord: Int, fname: Option[String]) extends OutKind

  private def tryRewrite(
      exprs: Seq[NamedExpression],
      grouping: Seq[GroupSpec],
      child: LogicalPlan,
      tables: Map[String, (String, String)]
  ): Option[LogicalPlan] = {
    def groupIdx(e: Expression): Option[Int] =
      grouping.zipWithIndex.collectFirst {
        case (TimeGroup(orig, t), i) if e.semanticEquals(orig) || e.semanticEquals(t) => i
        case (WindowGroup(orig, s, _, _, _), i)
            if e.semanticEquals(orig) || e.semanticEquals(s) =>
          i
        case (KeyGroup(a), i) if e.semanticEquals(a) => i
      }
    val timeGroup = grouping.collectFirst { case tg: TimeLike => tg }
    val keyGroup = grouping.collectFirst { case kg: KeyGroup => kg }
    for {
      (cond, rel) <- orDbg(filterOverScan(child), "no filter-over-scan shape")
      root <- orDbg(scanRoot(rel), "scan has no file root")
      (table, timeCol) <- orDbg(tables.get(root), s"root not registered: $root")
      allowed = rel.outputSet
      bucketSec = session.conf
        .getOption(s"spark.uwheel.shim.$table.bucket_sec")
        .map(_.toLong)
        .getOrElse(1L)
      outs0 <- traverse(exprs.map {
        case a: Alias =>
          a.child match {
            case ae: AggregateExpression => classify(ae, allowed).map(AggOut)
            case GetStructField(g, ord, fname) =>
              groupIdx(g).map(FieldOut(_, ord, fname))
            case e => groupIdx(e).map(GroupOut)
          }
        case ar: AttributeReference => groupIdx(ar).map(GroupOut)
        case _                      => None
      })
      kinds = outs0.collect { case AggOut(k) => k }
      cols = kinds.flatMap(_.col).distinct
      // the grouped ts must be the registered time column BOUND TO THE SCAN,
      // at a granularity (trunc level / window slide+offset) whole buckets
      // tile into; a key grouping must bind to the scan and not be the
      // time column
      if timeGroup.forall {
        case TimeGroup(_, g) =>
          (g.timestamp match {
            case a: AttributeReference =>
              allowed.contains(a) && a.name.equalsIgnoreCase(timeCol)
            case _ => false
          }) && (g.format match {
            case Literal(s, _) if s != null =>
              granTiles(
                s.toString,
                bucketSec,
                // NTZ truncation is naive-calendar arithmetic — its
                // boundaries epoch-align exactly like UTC's do
                if (g.timestamp.dataType == TimestampNTZType) "UTC"
                else
                  g.timeZoneId.getOrElse(session.sessionState.conf.sessionLocalTimeZone)
              )
            case _ => false
          })
        case WindowGroup(_, _, ts, slide, off) =>
          allowed.contains(ts) && ts.name.equalsIgnoreCase(timeCol) &&
          slide % (Micros * bucketSec) == 0 && off % (Micros * bucketSec) == 0
      }
      if keyGroup.forall(kg =>
        allowed.contains(kg.orig) && !kg.orig.name.equalsIgnoreCase(timeCol)
      )
      (lo, hi, key) <- orDbg(
        bounds(cond, timeCol, bucketSec, allowed),
        s"bounds not tileable for $table: $cond"
      )
      // absent time bounds (landmark shapes) read the WHOLE rollup as the
      // whole table — sound only when the time column has no NULLs (the
      // rollup build drops NULL-ts rows; a bounded scan drops them too,
      // an unbounded scan does NOT). Registration probes the source and
      // pins the attestation; absent conf = assume NULLs possible.
      if lo.nonEmpty || hi.nonEmpty || session.conf
        .getOption(s"spark.uwheel.shim.$table.ts_nonnull")
        .contains("true")
      // (view, key value to filter the dim view's rows down to) — a keyed
      // equality is served by its per-value keyed view when registered,
      // else by the dim view with a key filter (ONE dim registration
      // covers every value of the key)
      distinctKeys = kinds.collect { case CountDistinctKey(c) => c }.distinct
      chosen <-
        if (distinctKeys.size > 1) None
        else
          distinctKeys.headOption match {
            case Some(dk) =>
              // COUNT(DISTINCT key) is exact only off the key-complete dim
              // view of THAT column; any key grouping / equality must be
              // on the same column
              val kgOk = keyGroup.forall(_.orig.name.toLowerCase == dk)
              val eqOk = key.forall(_._1 == dk)
              if (kgOk && eqOk) dimView(table, dk, cols).map((_, key.map(_._2)))
              else None
            case None =>
              (keyGroup, key) match {
                case (Some(_), Some(_)) => None // grouping + equality: punt
                case (Some(kg), None) =>
                  dimView(table, kg.orig.name.toLowerCase, cols).map((_, None))
                case (None, Some((kcol, Seq(kval)))) =>
                  keyedView(table, kcol, kval, cols)
                    .map((_, None))
                    .orElse(dimView(table, kcol, cols).map((_, Some(Seq(kval)))))
                case (None, Some((kcol, kvals))) => // IN list: dim view only
                  dimView(table, kcol, cols).map((_, Some(kvals)))
                case (None, None) =>
                  if (cols.isEmpty)
                    // COUNT(*)-only: the count view if registered, else any
                    // agg view (it carries cnt too)
                    Seq(s"__uwheel_rollup_$table", s"__uwheel_rollup_${table}__agg")
                      .find(v => rollupPlan(v).isDefined)
                      .map((_, None))
                  else {
                    val registered = session.conf
                      .getOption(s"spark.uwheel.shim.$table.agg_cols")
                      .toSeq
                      .flatMap(_.split(",").map(_.trim.toLowerCase))
                      .toSet
                    if (cols.forall(registered.contains))
                      Some((s"__uwheel_rollup_${table}__agg", None))
                    else None
                  }
              }
          }
      (viewName, keyFilter) = chosen
      rollup <- orDbg(rollupPlan(viewName), s"view not resolvable: $viewName")
      sec <- orDbg(rollup.output.find(_.name == "sec"), s"no sec col: $viewName")
      keyAttr = rollup.output.find(_.name == "key")
      // a dim-view key restriction needs the key column to be STRING (the
      // recognized equality literal is)
      if keyFilter.forall(_ => keyAttr.exists(_.dataType == StringType))
      // each grouping expression over the rollup: the ORIGINAL trunc over
      // the bucket-start timestamp (Spark's own calendar logic computes the
      // keys, nothing re-derived), and the dim view's key column
      // WindowGroup: the ORIGINAL TimeWindowing arithmetic evaluated at
      // the bucket start — whole buckets land in one window cell (checked
      // above), so this is the window of every row the bucket aggregates.
      // It must stay an ALIAS in a Project below the Aggregate (grouping
      // on its attribute, the shape TimeWindowing itself emits): inlined
      // into the result expressions, SimplifyExtractValueOps collapses
      // `window.start` extractions into raw arithmetic that no longer
      // embeds the grouping expression, breaking aggregate output binding.
      winAlias = grouping.collectFirst { case wg: WindowGroup =>
        Alias(
          wg.struct.transform {
            case a: AttributeReference if a.exprId == wg.ts.exprId =>
              bucketTs(sec, a.dataType)
          },
          "window"
        )()
      }
      newGroups <- traverse(grouping.map {
        case TimeGroup(_, g) =>
          Some(
            g.copy(timestamp = bucketTs(sec, g.timestamp.dataType)): Expression
          )
        case _: WindowGroup => winAlias.map(_.toAttribute: Expression)
        case KeyGroup(_)    => keyAttr.map(a => a: Expression)
      })
      outs <- traverse(outs0.zip(exprs).map {
        case (AggOut(k), a) =>
          replacement(k, rollup).map(e => Alias(e, a.name)(exprId = a.exprId))
        case (GroupOut(i), a) =>
          Some(Alias(newGroups(i), a.name)(exprId = a.exprId))
        case (FieldOut(i, ord, fn), a) =>
          Some(Alias(GetStructField(newGroups(i), ord, fn), a.name)(exprId = a.exprId))
      })
    } yield {
      val preds =
        lo.map(l => GreaterThanOrEqual(sec, Literal(l / Micros)): Expression).toSeq ++
          hi.map(h => LessThan(sec, Literal(h / Micros)): Expression).toSeq ++
          keyFilter.flatMap { vs =>
            keyAttr.map { a =>
              (if (vs.size == 1) EqualTo(a, Literal(vs.head))
               else In(a, vs.map(Literal(_)))): Expression
            }
          }.toSeq
      val pruned0 = preds.reduceOption(And).map(Filter(_, rollup)).getOrElse(rollup)
      val pruned = winAlias match {
        case Some(al) => Project(al +: rollup.output, pruned0)
        case None     => pruned0
      }
      Aggregate(newGroups, outs, pruned, None)
    }
  }

  /** The registered dim (partitioned-family) view for a key-column
    * grouping, when its exported columns cover every needed aggregate. */
  private def dimView(
      table: String,
      kcol: String,
      needed: Seq[String]
  ): Option[String] = {
    val count = session.conf
      .getOption(s"spark.uwheel.shim.$table.dim_count")
      .map(_.toInt)
      .getOrElse(0)
    (0 until count).collectFirst {
      case i
          if session.conf
            .getOption(s"spark.uwheel.shim.$table.dim.$i.col")
            .contains(kcol) && {
            val have = session.conf
              .getOption(s"spark.uwheel.shim.$table.dim.$i.cols")
              .toSeq
              .flatMap(_.split(",").map(_.trim.toLowerCase))
              .toSet
            needed.forall(have.contains)
          } =>
        s"__uwheel_rollup_${table}__dim$i"
    }
  }

  /** The merged-range expression for one recognized aggregate, over the
    * rollup view's columns; None when the view lacks a needed state column
    * (per-aggregate builds export subsets — absent state, no rewrite). */
  private def replacement(kind: AggKind, rollup: LogicalPlan): Option[Expression] = {
    def col(n: String) = rollup.output.find(_.name == n)
    kind match {
      case CountStar =>
        col("cnt").map(c => Coalesce(Seq(sumAgg(c), Literal(0L))))
      case CountCol(c) =>
        col(s"vcnt_$c").map(v => Coalesce(Seq(sumAgg(v), Literal(0L))))
      case SumCol(c) => col(s"sum_$c").map(sumAgg)
      case MinCol(c) => col(s"min_$c").map(minAgg)
      case MaxCol(c) => col(s"max_$c").map(maxAgg)
      case CountDistinctKey(_) =>
        // distinct key values among the pruned (bucket, key) rows — exact
        // by key-completeness; NULL keys excluded like any COUNT(DISTINCT)
        col("key").map(k =>
          AggregateExpression(Count(Seq(k)), Complete, isDistinct = true)
        )
      case AvgCol(c) =>
        for (s <- col(s"sum_$c"); v <- col(s"vcnt_$c"))
          // LEGACY division: NULL on zero/NULL denominator even under ANSI,
          // matching AVG-over-empty semantics of the original plan.
          yield Divide(
            Cast(sumAgg(s), DoubleType),
            Cast(sumAgg(v), DoubleType),
            EvalMode.LEGACY
          )
      case VarCol(c, vkind) =>
        // algebraic form over merged monoid states: (Σx² − (Σx)²/n)/denom.
        // LEGACY divides give NULL over empty ranges and for samp at n=1,
        // matching the original plan; the negative-clamp guards the tiny
        // float cancellation the incremental (Welford) delegate never sees
        // (If preserves NULL — a null predicate takes the else branch).
        for (s <- col(s"sum_$c"); q <- col(s"sumsq_$c"); v <- col(s"vcnt_$c"))
          yield {
            def dbl(e: Expression) = Cast(e, DoubleType)
            val n = dbl(sumAgg(v))
            val s1 = dbl(sumAgg(s))
            val num = Subtract(
              dbl(sumAgg(q)),
              Divide(Multiply(s1, s1, EvalMode.LEGACY), n, EvalMode.LEGACY),
              EvalMode.LEGACY
            )
            val denom =
              if (vkind.endsWith("pop")) n
              else Subtract(n, Literal(1.0), EvalMode.LEGACY)
            val va = Divide(num, denom, EvalMode.LEGACY)
            val clamped = If(LessThan(va, Literal(0.0)), Literal(0.0), va)
            if (vkind.startsWith("stddev")) Sqrt(clamped) else clamped
          }
    }
  }

  /** The registered keyed view matching a `key = 'value'` conjunct, if its
    * exported columns cover every aggregate the query needs (COUNT(*) rides
    * on the keyed view's cnt). */
  private def keyedView(
      table: String,
      kcol: String,
      kval: String,
      needed: Seq[String]
  ): Option[String] = {
    val count = session.conf
      .getOption(s"spark.uwheel.shim.$table.keyed_count")
      .map(_.toInt)
      .getOrElse(0)
    (0 until count).collectFirst {
      case i
          if session.conf
            .getOption(s"spark.uwheel.shim.$table.keyed.$i.col")
            .contains(kcol) &&
            session.conf
              .getOption(s"spark.uwheel.shim.$table.keyed.$i.value")
              .contains(kval) && {
            val have = session.conf
              .getOption(s"spark.uwheel.shim.$table.keyed.$i.cols")
              .toSeq
              .flatMap(_.split(",").map(_.trim.toLowerCase))
              .toSet
            needed.forall(have.contains)
          } =>
        s"__uwheel_rollup_${table}__key$i"
    }
  }

  // -------------------------------------------------------------- hopping

  /** HOPPING `GROUP BY window(ts, w, s[, off])` with `w % s == 0` — the
    * analyzer compiles it to an Expand replicating every row into the
    * w/s windows containing it (no residual containment filter in this
    * shape; non-dividing widths add one and fall through). The rewrite
    * keeps the Expand but feeds it pruned ROLLUP rows instead of the
    * table: each bucket-row replicates into exactly the windows its rows
    * would (window edges sit on the slide grid, which tiles the buckets —
    * same constancy argument as tumbling), and the original aggregates
    * become their partial-state merges. */
  private def tryHop(
      exprs: Seq[NamedExpression],
      gexprs: Seq[Expression],
      child: LogicalPlan,
      tables: Map[String, (String, String)]
  ): Option[LogicalPlan] = {
    for {
      groupAttr <- gexprs match {
        case Seq(a: AttributeReference) => Some(a)
        case _                          => None
      }
      expand <- child match {
        case e: Expand => Some(e)
        case _         => None
      }
      widx = expand.output.indexWhere(_.exprId == groupAttr.exprId)
      if widx >= 0
      specs <- traverse(
        expand.projections.map(p => windowSpec(groupAttr, p(widx)))
      )
      wspecs = specs.collect { case w: WindowGroup => w }
      if wspecs.size == specs.size && wspecs.nonEmpty
      // one window arithmetic across all replicas (offsets differ only by
      // the k*slide shifts OUTSIDE the remainder, which windowSpec ignores)
      if wspecs.map(w => (w.slide, w.offset)).distinct.size == 1
      tsA = wspecs.head.ts
      (cond, rel) <- filterOverScan(expand.child)
      root <- scanRoot(rel)
      (table, timeCol) <- tables.get(root)
      allowed = rel.outputSet
      if allowed.contains(tsA) && tsA.name.equalsIgnoreCase(timeCol)
      bucketSec = session.conf
        .getOption(s"spark.uwheel.shim.$table.bucket_sec")
        .map(_.toLong)
        .getOrElse(1L)
      if wspecs.head.slide % (Micros * bucketSec) == 0 &&
        wspecs.head.offset % (Micros * bucketSec) == 0
      outs0 <- traverse(exprs.map {
        case a: Alias =>
          a.child match {
            case ae: AggregateExpression => classify(ae, allowed).map(AggOut)
            case GetStructField(g, ord, fname) if g.semanticEquals(groupAttr) =>
              Some(FieldOut(0, ord, fname))
            case e if e.semanticEquals(groupAttr) => Some(GroupOut(0))
            case _                                => None
          }
        case ar: AttributeReference if ar.semanticEquals(groupAttr) =>
          Some(GroupOut(0))
        case _ => None
      })
      kinds = outs0.collect { case AggOut(k) => k }
      if !kinds.exists(_.isInstanceOf[CountDistinctKey]) // needs the dim view
      cols = kinds.flatMap(_.col).distinct
      (lo, hi, key) <- orDbg(
        bounds(cond, timeCol, bucketSec, allowed),
        s"bounds not tileable for $table: $cond"
      )
      if lo.nonEmpty || hi.nonEmpty || session.conf
        .getOption(s"spark.uwheel.shim.$table.ts_nonnull")
        .contains("true")
      registered = session.conf
        .getOption(s"spark.uwheel.shim.$table.agg_cols")
        .toSeq
        .flatMap(_.split(",").map(_.trim.toLowerCase))
        .toSet
      // keyed hopping (r7): a key equality is served by its per-value
      // keyed view, else by the dim family with a key filter — the rollup
      // rows replicate through the kept Expand exactly like the unkeyed
      // views' (the final Aggregate merge-sums states, so several
      // (sec, key) rows per bucket fold correctly). IN-lists ride the dim
      // view only.
      chosen <- key match {
        case None =>
          (if (cols.isEmpty)
             Seq(s"__uwheel_rollup_${table}__agg", s"__uwheel_rollup_$table")
               .find(v => rollupPlan(v).isDefined)
           else if (cols.forall(registered.contains))
             Some(s"__uwheel_rollup_${table}__agg")
           else None).map(v => (v, None: Option[Seq[String]]))
        case Some((kcol, Seq(kval))) =>
          keyedView(table, kcol, kval, cols)
            .map(v => (v, None: Option[Seq[String]]))
            .orElse(dimView(table, kcol, cols).map(v => (v, Some(Seq(kval)))))
        case Some((kcol, kvals)) =>
          dimView(table, kcol, cols).map(v => (v, Some(kvals)))
      }
      (viewName, keyFilter) = chosen
      rollup <- rollupPlan(viewName)
      sec <- rollup.output.find(_.name == "sec")
      keyAttr = rollup.output.find(_.name == "key")
      // a dim-view key restriction needs the key column to be STRING (the
      // recognized equality literal is)
      if keyFilter.forall(_ => keyAttr.exists(_.dataType == StringType))
      varCols = kinds.collect { case VarCol(c, _) => c }.distinct
      needed = "cnt" +: (cols.flatMap(c =>
        Seq(s"vcnt_$c", s"sum_$c", s"min_$c", s"max_$c")
      ) ++ varCols.map(c => s"sumsq_$c"))
      stateAttrs <- traverse(needed.map(n => rollup.output.find(_.name == n)))
    } yield {
      val keyPred = for {
        vals <- keyFilter
        ka <- keyAttr
      } yield vals.map(v => EqualTo(ka, Literal(v)): Expression).reduce(Or)
      val preds =
        keyPred.toSeq ++
          lo.map(l => GreaterThanOrEqual(sec, Literal(l / Micros)): Expression).toSeq ++
          hi.map(h => LessThan(sec, Literal(h / Micros)): Expression).toSeq
      val pruned = preds.reduceOption(And).map(Filter(_, rollup)).getOrElse(rollup)
      val newProjections = expand.projections.map { p =>
        (p(widx).transform {
          case a: AttributeReference if a.exprId == tsA.exprId =>
            bucketTs(sec, a.dataType)
        }) +: stateAttrs.map(a => a: Expression)
      }
      val winAttr = expand.output(widx)
      val newExpand =
        Expand(newProjections, winAttr +: stateAttrs, pruned)
      val outs = outs0.zip(exprs).map {
        case (AggOut(k), a) =>
          // state presence was required above, so replacement can't miss
          Alias(replacement(k, newExpand).get, a.name)(exprId = a.exprId)
        case (GroupOut(_), a) =>
          Alias(winAttr, a.name)(exprId = a.exprId)
        case (FieldOut(_, ord, fn), a) =>
          Alias(GetStructField(winAttr, ord, fn), a.name)(exprId = a.exprId)
      }
      Aggregate(Seq(winAttr), outs, newExpand, None)
    }
  }

  /** HOPPING `GROUP BY window(ts, w, s)` with boundary (core + sliver)
    * bounds — the hybrid extension of tryHop for the `<=` / `>` /
    * unaligned-literal / OR-of-ranges shapes tryHop's aligned-bounds gate
    * rejects. The Expand is kept, but fed a Union of pruned rollup rows
    * (bucket-aligned core, ts reconstructed from the bucket start) and raw
    * sliver rows (each row's own timestamp, per-row partial states) — the
    * same sliver-union the scalar and grouped hybrids build. Window
    * assignment stays exact on both legs: whole core buckets land in one
    * window cell per replica (slide and offset are bucket multiples,
    * checked), and sliver rows replicate by their raw timestamps. A key
    * equality restricts BOTH legs (r7): the core reads the per-value keyed
    * view (or the dim family filtered to the value), the sliver re-applies
    * the original equality to raw rows. */
  private def tryHopHybrid(
      exprs: Seq[NamedExpression],
      gexprs: Seq[Expression],
      child: LogicalPlan,
      tables: Map[String, (String, String)]
  ): Option[LogicalPlan] = {
    for {
      groupAttr <- gexprs match {
        case Seq(a: AttributeReference) => Some(a)
        case _                          => None
      }
      expand <- child match {
        case e: Expand => Some(e)
        case _         => None
      }
      widx = expand.output.indexWhere(_.exprId == groupAttr.exprId)
      if widx >= 0
      specs <- traverse(
        expand.projections.map(p => windowSpec(groupAttr, p(widx)))
      )
      wspecs = specs.collect { case w: WindowGroup => w }
      if wspecs.size == specs.size && wspecs.nonEmpty
      if wspecs.map(w => (w.slide, w.offset)).distinct.size == 1
      tsA = wspecs.head.ts
      (condOpt, rel) <- filterOverScan(expand.child)
      cond <- condOpt // landmark (boundless) hops are tryHop's job
      root <- scanRoot(rel)
      (table, timeCol) <- tables.get(root)
      allowed = rel.outputSet
      if allowed.contains(tsA) && tsA.name.equalsIgnoreCase(timeCol)
      bucketSec = session.conf
        .getOption(s"spark.uwheel.shim.$table.bucket_sec")
        .map(_.toLong)
        .getOrElse(1L)
      if wspecs.head.slide % (Micros * bucketSec) == 0 &&
        wspecs.head.offset % (Micros * bucketSec) == 0
      outs0 <- traverse(exprs.map {
        case a: Alias =>
          a.child match {
            case ae: AggregateExpression => classify(ae, allowed).map(AggOut)
            case GetStructField(g, ord, fname) if g.semanticEquals(groupAttr) =>
              Some(FieldOut(0, ord, fname))
            case e if e.semanticEquals(groupAttr) => Some(GroupOut(0))
            case _                                => None
          }
        case ar: AttributeReference if ar.semanticEquals(groupAttr) =>
          Some(GroupOut(0))
        case _ => None
      })
      kinds = outs0.collect { case AggOut(k) => k }
      if !kinds.exists(_.isInstanceOf[CountDistinctKey]) // needs the dim view
      cols = kinds.flatMap(_.col).distinct
      split <- splitKeyEquality(cond, timeCol, allowed)
      (keyEq, restOpt) = split
      rest <- restOpt
      intervals <- condIntervals(rest, timeCol, allowed)
      tsAttr <- rel.output.find(_.name.equalsIgnoreCase(timeCol))
      registered = session.conf
        .getOption(s"spark.uwheel.shim.$table.agg_cols")
        .toSeq
        .flatMap(_.split(",").map(_.trim.toLowerCase))
        .toSet
      // keyed hopping hybrids (r7): the core leg reads the per-value keyed
      // view (or the dim family filtered to the value); the sliver leg
      // re-applies the ORIGINAL key equality to the raw rows. Both legs
      // replicate through the kept Expand unchanged.
      chosen <- keyEq match {
        case None =>
          (if (cols.isEmpty)
             Seq(s"__uwheel_rollup_${table}__agg", s"__uwheel_rollup_$table")
               .find(v => rollupPlan(v).isDefined)
           else if (cols.forall(registered.contains))
             Some(s"__uwheel_rollup_${table}__agg")
           else None).map(v => (v, None: Option[String]))
        case Some((ka, kval)) =>
          keyedView(table, ka.name.toLowerCase, kval, cols)
            .map(v => (v, None: Option[String]))
            .orElse(
              dimView(table, ka.name.toLowerCase, cols).map(v => (v, Some(kval)))
            )
      }
      (viewName, keyFilter) = chosen
      rollup <- rollupPlan(viewName)
      sec <- rollup.output.find(_.name == "sec")
      keyAttr = rollup.output.find(_.name == "key")
      if keyFilter.forall(_ => keyAttr.exists(_.dataType == StringType))
      varCols = kinds.collect { case VarCol(c, _) => c }.distinct
      needed = "cnt" +: (cols.flatMap(c =>
        Seq(s"vcnt_$c", s"sum_$c", s"min_$c", s"max_$c")
      ) ++ varCols.map(c => s"sumsq_$c"))
      stateAttrs <- traverse(needed.map(n => rollup.output.find(_.name == n)))
      colAttrs <- traverse(
        cols.map(c => rel.output.find(_.name.equalsIgnoreCase(c)))
      )
    } yield {
      val colAttr = cols.zip(colAttrs).toMap
      val align = Micros * bucketSec
      def ceilA(v: Long) = {
        val m = Math.floorMod(v, align); if (m == 0) v else v + (align - m)
      }
      def floorA(v: Long) = v - Math.floorMod(v, align)
      var corePreds = Seq.empty[Expression]
      var slivers = Seq.empty[(Option[Long], Option[Long])]
      intervals.foreach { iv =>
        val coreLo = iv.lo.map(ceilA)
        val coreHi = iv.hi.map(floorA)
        val emptyCore = coreLo.zip(coreHi).exists { case (l, h) => l >= h }
        if (emptyCore) slivers :+= ((iv.lo, iv.hi))
        else {
          val ps =
            coreLo.map(l => GreaterThanOrEqual(sec, Literal(l / Micros)): Expression).toSeq ++
              coreHi.map(h => LessThan(sec, Literal(h / Micros)): Expression).toSeq
          corePreds :+= ps.reduceOption(And).getOrElse(Literal(true))
          slivers ++=
            iv.lo.filter(l => coreLo.exists(_ > l)).map(l => (Some(l), coreLo)).toSeq ++
              iv.hi.filter(h => coreHi.exists(_ < h)).map(h => (coreHi, Some(h))).toSeq
        }
      }
      val corePred0: Expression =
        if (intervals.isEmpty) Literal(false)
        else corePreds.reduceOption(Or).getOrElse(Literal(false))
      val corePred = (for {
        kval <- keyFilter
        ka <- keyAttr
      } yield And(EqualTo(ka, Literal(kval)), corePred0)).getOrElse(corePred0)
      val core = Project(
        Alias(bucketTs(sec, tsAttr.dataType), "__hts")()
          +: stateAttrs.map(a => a: NamedExpression),
        Filter(corePred, rollup)
      )
      // the sliver leg re-applies the original key equality to raw rows
      // (the keyed/dim VIEW restricted the core leg; raw rows need it too)
      val sliverKey: Option[Expression] =
        keyEq.map { case (ka, kval) => EqualTo(ka, Literal(kval)) }
      def tsLit(v: Long) = Literal(v, tsAttr.dataType)
      def ivalPred(a: Option[Long], b: Option[Long]): Expression = {
        val ps = a.map(v => GreaterThanOrEqual(tsAttr, tsLit(v)): Expression).toSeq ++
          b.map(v => LessThan(tsAttr, tsLit(v)): Expression).toSeq
        ps.reduceOption(And).getOrElse(Literal(true))
      }
      def sliverExpr(a: Attribute): Expression = a.name match {
        case "cnt" => Literal(1L)
        case n if n.startsWith("vcnt_") =>
          If(IsNull(colAttr(n.stripPrefix("vcnt_"))), Literal(0L), Literal(1L))
        case n if n.startsWith("sumsq_") =>
          val c = Cast(colAttr(n.stripPrefix("sumsq_")), DoubleType)
          Multiply(c, c, EvalMode.LEGACY)
        case n =>
          val c = colAttr(n.dropWhile(_ != '_').drop(1))
          if (c.dataType == a.dataType) c else Cast(c, a.dataType)
      }
      val unionPlan =
        if (slivers.isEmpty) core
        else {
          val ivals = slivers.map { case (a, b) => ivalPred(a, b) }.reduce(Or)
          val sliverPred = sliverKey.map(And(_, ivals)).getOrElse(ivals)
          val sliver = Project(
            Alias(tsAttr, "__hts")()
              +: stateAttrs.map(a => Alias(sliverExpr(a), a.name)(): NamedExpression),
            Filter(sliverPred, rel)
          )
          Union(Seq(core, sliver))
        }
      val tsU = unionPlan.output.head
      val stateU = unionPlan.output.tail
      val newProjections = expand.projections.map { p =>
        (p(widx).transform {
          case a: AttributeReference if a.exprId == tsA.exprId => tsU
        }) +: stateU.map(a => a: Expression)
      }
      val winAttr = expand.output(widx)
      val newExpand = Expand(newProjections, winAttr +: stateU, unionPlan)
      val outs = outs0.zip(exprs).map {
        case (AggOut(k), a) =>
          // state presence was required above, so replacement can't miss
          Alias(replacement(k, newExpand).get, a.name)(exprId = a.exprId)
        case (GroupOut(_), a) =>
          Alias(winAttr, a.name)(exprId = a.exprId)
        case (FieldOut(_, ord, fn), a) =>
          Alias(GetStructField(winAttr, ord, fn), a.name)(exprId = a.exprId)
      }
      Aggregate(Seq(winAttr), outs, newExpand, None)
    }
  }

  // --------------------------------------------------------------- hybrid

  /** A half-open µs interval; None = unbounded on that side. */
  private case class Ival(lo: Option[Long], hi: Option[Long])

  /** One leg's temporal bounds including the ops the exact path cannot
    * tile — `>` / `<=` (normalized by ±1µs: timestamps are µs-discrete)
    * and `ts = instant` (a 1µs interval). Every conjunct must be a
    * recognized bound or IsNotNull(ts) — key equalities and anything else
    * reject (match-or-nothing). Returns None for a boundless leg. */
  private def legInterval(
      conjuncts: Seq[Expression],
      timeCol: String,
      allowed: AttributeSet
  ): Option[Ival] = {
    def isTime(e: Expression): Boolean = e match {
      case a: AttributeReference =>
        allowed.contains(a) && a.name.equalsIgnoreCase(timeCol)
      case _ => false
    }
    var lo: Option[Long] = None // inclusive micros
    var hi: Option[Long] = None // EXCLUSIVE micros
    var loN, hiN, n, nn = 0
    conjuncts.foreach {
      case GreaterThanOrEqual(a, TsLit(v)) if isTime(a) =>
        lo = Some(v); loN += 1; n += 1
      case LessThanOrEqual(TsLit(v), a) if isTime(a) =>
        lo = Some(v); loN += 1; n += 1
      case GreaterThan(a, TsLit(v)) if isTime(a) =>
        lo = Some(v + 1); loN += 1; n += 1
      case LessThan(TsLit(v), a) if isTime(a) =>
        lo = Some(v + 1); loN += 1; n += 1
      case LessThan(a, TsLit(v)) if isTime(a) =>
        hi = Some(v); hiN += 1; n += 1
      case GreaterThan(TsLit(v), a) if isTime(a) =>
        hi = Some(v); hiN += 1; n += 1
      case LessThanOrEqual(a, TsLit(v)) if isTime(a) =>
        hi = Some(v + 1); hiN += 1; n += 1
      case GreaterThanOrEqual(TsLit(v), a) if isTime(a) =>
        hi = Some(v + 1); hiN += 1; n += 1
      case EqualTo(a, TsLit(v)) if isTime(a) =>
        lo = Some(v); hi = Some(v + 1); loN += 1; hiN += 1; n += 1
      case EqualTo(TsLit(v), a) if isTime(a) =>
        lo = Some(v); hi = Some(v + 1); loN += 1; hiN += 1; n += 1
      case IsNotNull(a) if isTime(a) => nn += 1; n += 1
      case _                         => ()
    }
    if (n != conjuncts.size || loN > 1 || hiN > 1) None
    else if (lo.isEmpty && hi.isEmpty) None // boundless leg
    else Some(Ival(lo, hi))
  }

  /** The Filter condition as DISJOINT half-open µs intervals: plain
    * conjunctions give one; a single OR-of-range-conjunctions conjunct
    * (alongside inferred IsNotNull(ts)) gives several, merged so a row in
    * overlapping legs is counted once. Any conjunct the grammar doesn't
    * recognize rejects the plan. */
  private def condIntervals(
      cond: Expression,
      timeCol: String,
      allowed: AttributeSet
  ): Option[Seq[Ival]] = {
    def isTimeNN(e: Expression): Boolean = e match {
      case IsNotNull(a: AttributeReference) =>
        allowed.contains(a) && a.name.equalsIgnoreCase(timeCol)
      case _ => false
    }
    val conjuncts = splitConjunctivePredicates(cond)
    val (nn, rest) = conjuncts.partition(isTimeNN)
    val raw: Option[Seq[Ival]] = rest match {
      case Seq(or: Or) =>
        traverse(
          splitDisjunctivePredicates(or)
            .map(leg => legInterval(splitConjunctivePredicates(leg), timeCol, allowed))
        )
      case _ if rest.nonEmpty =>
        legInterval(rest, timeCol, allowed).map(Seq(_))
      case _ => None // no bounds at all: the exact landmark path's job
    }
    val _ = nn
    raw.map { ivs =>
      // drop provably-empty legs, then merge on the sorted lower bounds
      val live = ivs.filter(iv =>
        iv.lo.zip(iv.hi).forall { case (l, h) => l < h }
      )
      val sorted = live.sortBy(iv => iv.lo.getOrElse(Long.MinValue))
      val merged = scala.collection.mutable.ArrayBuffer.empty[Ival]
      sorted.foreach { iv =>
        merged.lastOption match {
          case Some(last)
              if last.hi.isEmpty ||
                iv.lo.exists(l => last.hi.exists(l <= _)) || iv.lo.isEmpty =>
            val hi =
              if (last.hi.isEmpty || iv.hi.isEmpty) None
              else Some(Math.max(last.hi.get, iv.hi.get))
            merged(merged.size - 1) = Ival(last.lo, hi)
          case _ => merged += iv
        }
      }
      merged.toSeq
    }
  }

  /** Boundary-exact rewrite for scalar aggregates whose bounds the exact
    * path cannot tile — `<=` / `>` comparisons, bucket-unaligned
    * literals, `ts = instant` equality (a 1µs interval), and
    * OR-of-temporal-ranges (legs merged into disjoint intervals so
    * overlaps count once; the Python router's hybrid + or_ranges +
    * point families, through the host optimizer; the reference
    * APPROXIMATES the boundary ops, expr.rs:83-105, and rejects OR and
    * time equality outright, expr.rs:198-207,351-356). Each interval
    * splits into a bucket-aligned CORE answered from the pruned rollup
    * view and ≤2 sub-bucket SLIVERS answered by a scan whose pushed-down
    * ts predicate covers ≤ 2 bucket-widths per interval; a Union of the
    * cores' partial states with per-row partials from the slivers feeds
    * the original aggregates, so results are exact monoid sums
    * (timestamps are µs-discrete: `ts <= U` ≡ `ts < U+1µs`). */
  private def tryHybrid(
      exprs: Seq[NamedExpression],
      child: LogicalPlan,
      tables: Map[String, (String, String)]
  ): Option[LogicalPlan] = {
    for {
      (condOpt, rel) <- filterOverScan(child)
      cond <- condOpt
      root <- scanRoot(rel)
      (table, timeCol) <- tables.get(root)
      allowed = rel.outputSet
      bucketSec = session.conf
        .getOption(s"spark.uwheel.shim.$table.bucket_sec")
        .map(_.toLong)
        .getOrElse(1L)
      kinds <- traverse(exprs.map {
        case a: Alias =>
          a.child match {
            case ae: AggregateExpression =>
              classify(ae, allowed).filter {
                case CountDistinctKey(_) => false // needs the dim view
                case _                   => true
              }
            case _ => None
          }
        case _ => None
      })
      cols = kinds.flatMap(_.col).distinct
      split <- splitKeyEquality(cond, timeCol, allowed)
      (keyEq, restOpt) = split
      rest <- restOpt // a bare key equality is the exact path's landmark job
      intervals <- condIntervals(rest, timeCol, allowed)
      tsAttr <- rel.output.find(_.name.equalsIgnoreCase(timeCol))
      registered = session.conf
        .getOption(s"spark.uwheel.shim.$table.agg_cols")
        .toSeq
        .flatMap(_.split(",").map(_.trim.toLowerCase))
        .toSet
      // keyed equality: the per-value keyed view, else the dim family view
      // restricted to the value; unkeyed: the agg/count views as before
      chosen <- keyEq match {
        case Some((ka, kval)) =>
          keyedView(table, ka.name.toLowerCase, kval, cols)
            .map(v => (v, None: Option[(AttributeReference, String)]))
            .orElse(
              dimView(table, ka.name.toLowerCase, cols)
                .map(v => (v, Some((ka, kval))))
            )
        case None =>
          (if (cols.isEmpty)
             Seq(s"__uwheel_rollup_${table}__agg", s"__uwheel_rollup_$table")
               .find(v => rollupPlan(v).isDefined)
           else if (cols.forall(registered.contains))
             Some(s"__uwheel_rollup_${table}__agg")
           else None).map(v => (v, None))
      }
      (viewName, dimRestrict) = chosen
      rollup0 <- rollupPlan(viewName)
      rollup <- dimRestrict match {
        case None => Some(rollup0)
        case Some((_, kval)) =>
          rollup0.output
            .find(a => a.name == "key" && a.dataType == StringType)
            .map(ka => Filter(EqualTo(ka, Literal(kval)), rollup0))
      }
      sec <- rollup.output.find(_.name == "sec")
      // every state column the aggregates merge must exist on the view AND
      // resolve to a scan column for the sliver side
      varCols = kinds.collect { case VarCol(c, _) => c }.distinct
      needed = "cnt" +: (cols.flatMap(c =>
        Seq(s"vcnt_$c", s"sum_$c", s"min_$c", s"max_$c")
      ) ++ varCols.map(c => s"sumsq_$c"))
      stateAttrs <- traverse(needed.map(n => rollup.output.find(_.name == n)))
      colAttrs <- traverse(
        cols.map(c => rel.output.find(_.name.equalsIgnoreCase(c)))
      )
    } yield {
      val colAttr = cols.zip(colAttrs).toMap
      val align = Micros * bucketSec
      def ceilA(v: Long) = {
        val m = Math.floorMod(v, align); if (m == 0) v else v + (align - m)
      }
      def floorA(v: Long) = v - Math.floorMod(v, align)
      // per disjoint interval: a bucket-aligned core plus ≤2 slivers
      var corePreds = Seq.empty[Expression] // one conjunction per interval
      var slivers = Seq.empty[(Option[Long], Option[Long])]
      intervals.foreach { iv =>
        val coreLo = iv.lo.map(ceilA)
        val coreHi = iv.hi.map(floorA)
        val emptyCore = coreLo.zip(coreHi).exists { case (l, h) => l >= h }
        if (emptyCore) slivers :+= ((iv.lo, iv.hi))
        else {
          val ps =
            coreLo.map(l => GreaterThanOrEqual(sec, Literal(l / Micros)): Expression).toSeq ++
              coreHi.map(h => LessThan(sec, Literal(h / Micros)): Expression).toSeq
          corePreds :+= ps.reduceOption(And).getOrElse(Literal(true))
          slivers ++=
            iv.lo.filter(l => coreLo.exists(_ > l)).map(l => (Some(l), coreLo)).toSeq ++
              iv.hi.filter(h => coreHi.exists(_ < h)).map(h => (coreHi, Some(h))).toSeq
        }
      }
      val corePred: Expression =
        if (intervals.isEmpty) Literal(false) // all legs provably empty
        else corePreds.reduceOption(Or).getOrElse(Literal(false))
      val core = Project(
        stateAttrs.map(a => a: NamedExpression),
        Filter(corePred, rollup)
      )
      // sliver-scan bounds typed as the COLUMN's timestamp flavor (an NTZ
      // column compared to an LTZ literal would re-introduce casts/shift)
      def tsLit(v: Long) = Literal(v, tsAttr.dataType)
      def ivalPred(a: Option[Long], b: Option[Long]): Expression = {
        val ps = a.map(v => GreaterThanOrEqual(tsAttr, tsLit(v)): Expression).toSeq ++
          b.map(v => LessThan(tsAttr, tsLit(v)): Expression).toSeq
        ps.reduceOption(And).getOrElse(Literal(true))
      }
      def sliverExpr(a: Attribute): Expression = a.name match {
        case "cnt" => Literal(1L)
        case n if n.startsWith("vcnt_") =>
          If(IsNull(colAttr(n.stripPrefix("vcnt_"))), Literal(0L), Literal(1L))
        case n if n.startsWith("sumsq_") =>
          val c = Cast(colAttr(n.stripPrefix("sumsq_")), DoubleType)
          Multiply(c, c, EvalMode.LEGACY)
        case n =>
          val c = colAttr(n.dropWhile(_ != '_').drop(1))
          if (c.dataType == a.dataType) c else Cast(c, a.dataType)
      }
      val plan =
        if (slivers.isEmpty) core
        else {
          val ivals = slivers.map { case (a, b) => ivalPred(a, b) }.reduce(Or)
          // a keyed query's sliver scans only the key's raw rows
          val pred = keyEq
            .map { case (ka, kval) => And(ivals, EqualTo(ka, Literal(kval))) }
            .getOrElse(ivals)
          val sliver = Project(
            stateAttrs.map(a => Alias(sliverExpr(a), a.name)(): NamedExpression),
            Filter(pred, rel)
          )
          Union(Seq(core, sliver))
        }
      val outs = kinds.zip(exprs).map { case (k, a) =>
        // state columns were required above, so replacement can't miss
        Alias(replacement(k, plan).get, a.name)(exprId = a.exprId)
      }
      Aggregate(Nil, outs, plan, None)
    }
  }

  /** GROUP BY date_trunc with hybrid (core + sliver) boundaries — the
    * grouped form of tryHybrid, matching the Python router's
    * `_try_group_by_hybrid` (reference contrast: approximates the boundary
    * ops AND has no grouped surface for them, expr.rs:83-105,219-222).
    * The union gains a computed group-key column: the rollup side
    * re-evaluates the trunc at bucket starts (Spark's own calendar logic,
    * nothing re-derived), the sliver side keeps the ORIGINAL trunc over
    * raw timestamps; the final Aggregate groups on that column, so parent
    * plans (HAVING, ORDER BY) resolve unchanged through the preserved
    * ExprIds. Handles date_trunc AND tumbling window() groupings (both are
    * TimeLike here); hopping windows take the Expand path (tryHopHybrid)
    * and key groupings fall through via the same match-or-nothing
    * discipline. */
  private def tryGroupHybrid(
      exprs: Seq[NamedExpression],
      gexprs: Seq[Expression],
      child: LogicalPlan,
      tables: Map[String, (String, String)]
  ): Option[LogicalPlan] = {
    for {
      groups <- resolveGroups(gexprs, child)
      if groups.size == 1
      tl <- groups.collectFirst { case t: TimeLike => t }
      (condOpt, rel) <- filterOverScan(child)
      cond <- condOpt
      root <- scanRoot(rel)
      (table, timeCol) <- tables.get(root)
      allowed = rel.outputSet
      bucketSec = session.conf
        .getOption(s"spark.uwheel.shim.$table.bucket_sec")
        .map(_.toLong)
        .getOrElse(1L)
      // the grouping must be over the scan's registered time column, at a
      // granularity (trunc level / tumbling window slide+offset) whole
      // buckets tile into (NTZ truncates on the naive calendar)
      if (tl match {
        case tg: TimeGroup =>
          (tg.t.timestamp match {
            case a: AttributeReference =>
              allowed.contains(a) && a.name.equalsIgnoreCase(timeCol)
            case _ => false
          }) && (tg.t.format match {
            case Literal(s, _) if s != null =>
              granTiles(
                s.toString,
                bucketSec,
                if (tg.t.timestamp.dataType == TimestampNTZType) "UTC"
                else
                  tg.t.timeZoneId
                    .getOrElse(session.sessionState.conf.sessionLocalTimeZone)
              )
            case _ => false
          })
        case wg: WindowGroup =>
          allowed.contains(wg.ts) && wg.ts.name.equalsIgnoreCase(timeCol) &&
          wg.slide % (Micros * bucketSec) == 0 &&
          wg.offset % (Micros * bucketSec) == 0
      })
      // group-out shapes: the whole key, or a window-struct field
      outs0 <- traverse(exprs.map { e0 =>
        def groupOut(e: Expression): Option[scala.util.Either[AggKind, Option[(Int, Option[String])]]] =
          e match {
            case _
                if e.semanticEquals(tl.orig) || (tl match {
                  case tg: TimeGroup   => e.semanticEquals(tg.t)
                  case wg: WindowGroup => e.semanticEquals(wg.struct)
                }) =>
              Some(scala.util.Right(None))
            case GetStructField(g, ord, fname) if groupOut(g).contains(scala.util.Right(None)) =>
              Some(scala.util.Right(Some((ord, fname))))
            case _ => None
          }
        e0 match {
          case a: Alias =>
            a.child match {
              case ae: AggregateExpression =>
                classify(ae, allowed)
                  .filter {
                    case CountDistinctKey(_) => false // needs the dim view
                    case _                   => true
                  }
                  .map(k => scala.util.Left(k): scala.util.Either[AggKind, Option[(Int, Option[String])]])
              case e => groupOut(e)
            }
          case ar: AttributeReference => groupOut(ar)
          case _                      => None
        }
      })
      kinds = outs0.collect { case scala.util.Left(k) => k }
      cols = kinds.flatMap(_.col).distinct
      split <- splitKeyEquality(cond, timeCol, allowed)
      (keyEq, restOpt) = split
      rest <- restOpt // a bare key equality is the exact path's landmark job
      intervals <- condIntervals(rest, timeCol, allowed)
      tsAttr <- rel.output.find(_.name.equalsIgnoreCase(timeCol))
      registered = session.conf
        .getOption(s"spark.uwheel.shim.$table.agg_cols")
        .toSeq
        .flatMap(_.split(",").map(_.trim.toLowerCase))
        .toSet
      // keyed equality: the per-value keyed view, else the dim family view
      // restricted to the value; unkeyed: the agg/count views as before
      chosen <- keyEq match {
        case Some((ka, kval)) =>
          keyedView(table, ka.name.toLowerCase, kval, cols)
            .map(v => (v, None: Option[(AttributeReference, String)]))
            .orElse(
              dimView(table, ka.name.toLowerCase, cols)
                .map(v => (v, Some((ka, kval))))
            )
        case None =>
          (if (cols.isEmpty)
             Seq(s"__uwheel_rollup_${table}__agg", s"__uwheel_rollup_$table")
               .find(v => rollupPlan(v).isDefined)
           else if (cols.forall(registered.contains))
             Some(s"__uwheel_rollup_${table}__agg")
           else None).map(v => (v, None))
      }
      (viewName, dimRestrict) = chosen
      rollup0 <- rollupPlan(viewName)
      // a dim-view restriction needs the view's STRING key column
      rollup <- dimRestrict match {
        case None => Some(rollup0)
        case Some((_, kval)) =>
          rollup0.output
            .find(a => a.name == "key" && a.dataType == StringType)
            .map(ka => Filter(EqualTo(ka, Literal(kval)), rollup0))
      }
      sec <- rollup.output.find(_.name == "sec")
      varCols = kinds.collect { case VarCol(c, _) => c }.distinct
      needed = "cnt" +: (cols.flatMap(c =>
        Seq(s"vcnt_$c", s"sum_$c", s"min_$c", s"max_$c")
      ) ++ varCols.map(c => s"sumsq_$c"))
      stateAttrs <- traverse(needed.map(n => rollup.output.find(_.name == n)))
      colAttrs <- traverse(
        cols.map(c => rel.output.find(_.name.equalsIgnoreCase(c)))
      )
    } yield {
      val colAttr = cols.zip(colAttrs).toMap
      val align = Micros * bucketSec
      def ceilA(v: Long) = {
        val m = Math.floorMod(v, align); if (m == 0) v else v + (align - m)
      }
      def floorA(v: Long) = v - Math.floorMod(v, align)
      var corePreds = Seq.empty[Expression]
      var slivers = Seq.empty[(Option[Long], Option[Long])]
      intervals.foreach { iv =>
        val coreLo = iv.lo.map(ceilA)
        val coreHi = iv.hi.map(floorA)
        val emptyCore = coreLo.zip(coreHi).exists { case (l, h) => l >= h }
        if (emptyCore) slivers :+= ((iv.lo, iv.hi))
        else {
          val ps =
            coreLo.map(l => GreaterThanOrEqual(sec, Literal(l / Micros)): Expression).toSeq ++
              coreHi.map(h => LessThan(sec, Literal(h / Micros)): Expression).toSeq
          corePreds :+= ps.reduceOption(And).getOrElse(Literal(true))
          slivers ++=
            iv.lo.filter(l => coreLo.exists(_ > l)).map(l => (Some(l), coreLo)).toSeq ++
              iv.hi.filter(h => coreHi.exists(_ < h)).map(h => (coreHi, Some(h))).toSeq
        }
      }
      val corePred: Expression =
        if (intervals.isEmpty) Literal(false)
        else corePreds.reduceOption(Or).getOrElse(Literal(false))
      // the group key recomputed per union leg: bucket starts on the
      // rollup side, the original expression over raw rows on the sliver
      def keyAt(tsExpr: Expression => Expression): Expression = tl match {
        case tg: TimeGroup =>
          tg.t.copy(timestamp = tsExpr(tg.t.timestamp))
        case wg: WindowGroup =>
          wg.struct.transform {
            case a: AttributeReference if a.exprId == wg.ts.exprId =>
              tsExpr(a)
          }
      }
      val coreKey = Alias(keyAt(e => bucketTs(sec, e.dataType)), "__gkey")()
      val core = Project(
        stateAttrs.map(a => a: NamedExpression) :+ coreKey,
        Filter(corePred, rollup)
      )
      def tsLit(v: Long) = Literal(v, tsAttr.dataType)
      def ivalPred(a: Option[Long], b: Option[Long]): Expression = {
        val ps = a.map(v => GreaterThanOrEqual(tsAttr, tsLit(v)): Expression).toSeq ++
          b.map(v => LessThan(tsAttr, tsLit(v)): Expression).toSeq
        ps.reduceOption(And).getOrElse(Literal(true))
      }
      def sliverExpr(a: Attribute): Expression = a.name match {
        case "cnt" => Literal(1L)
        case n if n.startsWith("vcnt_") =>
          If(IsNull(colAttr(n.stripPrefix("vcnt_"))), Literal(0L), Literal(1L))
        case n if n.startsWith("sumsq_") =>
          val c = Cast(colAttr(n.stripPrefix("sumsq_")), DoubleType)
          Multiply(c, c, EvalMode.LEGACY)
        case n =>
          val c = colAttr(n.dropWhile(_ != '_').drop(1))
          if (c.dataType == a.dataType) c else Cast(c, a.dataType)
      }
      val plan =
        if (slivers.isEmpty) core
        else {
          val ivals = slivers.map { case (a, b) => ivalPred(a, b) }.reduce(Or)
          // a keyed query's sliver scans only the key's raw rows
          val pred = keyEq
            .map { case (ka, kval) => And(ivals, EqualTo(ka, Literal(kval))) }
            .getOrElse(ivals)
          val sliver = Project(
            stateAttrs.map(a => Alias(sliverExpr(a), a.name)(): NamedExpression)
              :+ Alias(keyAt(identity), "__gkey")(),
            Filter(pred, rel)
          )
          Union(Seq(core, sliver))
        }
      val gattr = plan.output.last
      val outs = outs0.zip(exprs).map {
        case (scala.util.Left(k), a) =>
          Alias(replacement(k, plan).get, a.name)(exprId = a.exprId)
        case (scala.util.Right(None), a) => Alias(gattr, a.name)(exprId = a.exprId)
        case (scala.util.Right(Some((ord, fn))), a) =>
          Alias(GetStructField(gattr, ord, fn), a.name)(exprId = a.exprId)
      }
      Aggregate(Seq(gattr), outs, plan, None)
    }
  }

  // -------------------------------------------------------- scan pruning

  /** Whether `cond` over a registered scan PROVABLY matches zero rows,
    * judged entirely from a driver-resident (LocalRelation) rollup view at
    * plan time — zero jobs, the reference's count- and min/max-based scan
    * pruning (lib.rs:608-649) through the host optimizer. Recognized:
    * ts-range conjuncts at ANY alignment (the proof covers the enclosing
    * bucket-aligned range — emptiness of the cover implies emptiness) plus
    * at most one numeric comparison on a registered column, proven from
    * the per-bucket min/max states. Parquet-backed views are not consulted
    * (the proof must stay an in-memory iteration); any unrecognized
    * conjunct, and the default, is "cannot prove" — never prune. */
  private def provablyEmpty(
      cond: Expression,
      rel: LogicalRelation,
      tables: Map[String, (String, String)]
  ): Boolean = {
    val proved = for {
      root <- scanRoot(rel)
      (table, timeCol) <- tables.get(root)
      allowed = rel.outputSet
      bucketSec = session.conf
        .getOption(s"spark.uwheel.shim.$table.bucket_sec")
        .map(_.toLong)
        .getOrElse(1L)
      parsed <- orDbg(
        prunePredicates(cond, timeCol, allowed),
        s"prune: predicates not provable for $table: $cond"
      )
      (ival, vpred) = parsed
      // no ts bound at all: the rollup misses NULL-ts rows an unbounded
      // scan would keep — require the registration-time attestation
      if ival.lo.nonEmpty || ival.hi.nonEmpty || session.conf
        .getOption(s"spark.uwheel.shim.$table.ts_nonnull")
        .contains("true")
      viewName <- vpred match {
        case Some((c, _, _)) =>
          val registered = session.conf
            .getOption(s"spark.uwheel.shim.$table.agg_cols")
            .toSeq
            .flatMap(_.split(",").map(_.trim.toLowerCase))
            .toSet
          if (registered.contains(c)) Some(s"__uwheel_rollup_${table}__agg")
          else None
        case None =>
          Seq(s"__uwheel_rollup_$table", s"__uwheel_rollup_${table}__agg")
            .find(v => rollupPlan(v).isDefined)
      }
      local <- rollupPlan(viewName) match {
        case Some(lr: LocalRelation) => Some(lr)
        case other => // file-backed: no driver proof
          dbg(s"prune: view $viewName not a LocalRelation: ${other.map(_.getClass.getSimpleName)}")
          None
      }
      secIdx = local.output.indexWhere(_.name == "sec")
      cntIdx = local.output.indexWhere(_.name == "cnt")
      if secIdx >= 0 && cntIdx >= 0
    } yield {
      val align = Micros * bucketSec
      // bucket-aligned COVER of the asked interval: emptiness of the
      // cover implies emptiness of the (possibly unaligned) interval
      val loSec = ival.lo.map(l => (l - Math.floorMod(l, align)) / Micros)
      val hiSec = ival.hi.map { h =>
        val m = Math.floorMod(h, align)
        (if (m == 0) h else h + (align - m)) / Micros
      }
      val stateIdx = vpred.map { case (c, op, _) =>
        val n = if (op == ">" || op == ">=") s"max_$c" else s"min_$c"
        local.output.indexWhere(_.name == n)
      }
      if (stateIdx.exists(_ < 0)) false
      else
        local.data.forall { row =>
          val sec = row.getLong(secIdx)
          val inRange = loSec.forall(sec >= _) && hiSec.forall(sec < _)
          if (!inRange || row.getLong(cntIdx) == 0L) true
          else
            vpred match {
              case None => false // an occupied bucket in range: rows exist
              case Some((_, op, x)) =>
                val i = stateIdx.get
                row.isNullAt(i) || { // all-NULL bucket can't match
                  val vOpt = local.output(i).dataType match {
                    case LongType    => Some(row.getLong(i).toDouble)
                    case DoubleType  => Some(row.getDouble(i))
                    case FloatType   => Some(row.getFloat(i).toDouble)
                    case IntegerType => Some(row.getInt(i).toDouble)
                    case _           => None // unprovable state type
                  }
                  vOpt.exists { v =>
                    op match {
                      case ">"  => v <= x // bucket max <= x: nothing exceeds
                      case ">=" => v < x
                      case "<"  => v >= x // bucket min >= x: nothing below
                      case "<=" => v > x
                    }
                  }
                }
            }
        }
    }
    proved.getOrElse(false)
  }

  /** `cond` parsed for the pruning proof: a ts interval (any alignment,
    * same grammar as the hybrid path minus OR) plus at most ONE numeric
    * comparison `col op literal` over a scan column. Anything else is
    * unprovable. */
  private def prunePredicates(
      cond: Expression,
      timeCol: String,
      allowed: AttributeSet
  ): Option[(Ival, Option[(String, String, Double)])] = {
    def numLit(l: Literal): Option[Double] = l match {
      case Literal(v: Double, DoubleType) => Some(v)
      case Literal(v: Float, _)           => Some(v.toDouble)
      case Literal(v: Long, LongType)     => Some(v.toDouble)
      case Literal(v: Int, _)             => Some(v.toDouble)
      case _                              => None
    }
    def colOf(e: Expression): Option[String] = e match {
      case a: AttributeReference
          if allowed.contains(a) && !a.name.equalsIgnoreCase(timeCol) =>
        Some(a.name.toLowerCase)
      case _ => None
    }
    val conjuncts = splitConjunctivePredicates(cond)
    var vpred: Option[(String, String, Double)] = None
    var vN = 0
    val rest = conjuncts.filter {
      case GreaterThan(e, l: Literal) if colOf(e).isDefined && numLit(l).isDefined =>
        vpred = Some((colOf(e).get, ">", numLit(l).get)); vN += 1; false
      case GreaterThanOrEqual(e, l: Literal)
          if colOf(e).isDefined && numLit(l).isDefined =>
        vpred = Some((colOf(e).get, ">=", numLit(l).get)); vN += 1; false
      case LessThan(e, l: Literal) if colOf(e).isDefined && numLit(l).isDefined =>
        vpred = Some((colOf(e).get, "<", numLit(l).get)); vN += 1; false
      case LessThanOrEqual(e, l: Literal)
          if colOf(e).isDefined && numLit(l).isDefined =>
        vpred = Some((colOf(e).get, "<=", numLit(l).get)); vN += 1; false
      case LessThan(l: Literal, e) if colOf(e).isDefined && numLit(l).isDefined =>
        vpred = Some((colOf(e).get, ">", numLit(l).get)); vN += 1; false
      case GreaterThan(l: Literal, e) if colOf(e).isDefined && numLit(l).isDefined =>
        vpred = Some((colOf(e).get, "<", numLit(l).get)); vN += 1; false
      case IsNotNull(a: AttributeReference) if allowed.contains(a) => false
      case _ => true
    }
    if (vN > 1) None
    else if (rest.isEmpty && vpred.isEmpty) None
    else if (rest.isEmpty) Some((Ival(None, None), vpred))
    else legInterval(rest, timeCol, allowed).map(iv => (iv, vpred))
  }

  private def traverse[A](xs: Seq[Option[A]]): Option[Seq[A]] =
    if (xs.forall(_.isDefined)) Some(xs.map(_.get)) else None

  /** Pass-through that traces a None to the debug log with `why`. */
  private def orDbg[A](o: Option[A], why: => String): Option[A] = {
    if (o.isEmpty) dbg(why)
    o
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

  private def rollupPlan(view: String): Option[LogicalPlan] =
    try
      Some(stripViews(session.table(view).queryExecution.analyzed))
    catch { case _: Exception => None }
}

/** One-call driver-side sketch algebra over FRAMED byte blobs — the
  * frequency family's driver-mirror economics extended to the three
  * JVM-sketch families WITHOUT reimplementing any DataSketches wire
  * format: the bytes collected from the rollup tables are handed straight
  * to the SAME datasketches-java classes Spark's own expressions use
  * (call chains pinned from the bundled bytecode — HllSketchEstimate:
  * heapify→getEstimate→Math.round; HllUnionAgg: wrap→Union(lgK)→update;
  * KllSketchGetQuantileDouble: wrap→getQuantile (default inclusive
  * criteria); KllMergeAggBase: newHeapInstance(k)→merge(heapify);
  * ThetaSketchUtils: Memory.wrap→CompactSketch.wrap; ThetaIntersection:
  * default buildIntersection→intersect). One py4j round trip per ask: the
  * Python side numpy-slices its (sec, bytes) mirror to the asked range and
  * ships ONE length-prefixed blob (frame = [count:int32][len:int32 bytes]*
  * big-endian), so a fresh sketch ask costs ~1 ms instead of the ~120 ms
  * small-job floor of a Spark job over the cached rollup.
  *
  * Scala object = static forwarders, reachable as
  * spark._jvm.io.uwheel.spark.UwheelSketchOps on any session whose driver
  * classpath carries the shim jar; Python falls back to the job path when
  * the class is absent (driver harnesses with bare sessions).
  */
object UwheelSketchOps {
  import org.apache.datasketches.memory.Memory
  import org.apache.datasketches.hll.{HllSketch, Union => HllUnion}
  import org.apache.datasketches.kll.{KllDoublesSketch, KllLongsSketch}
  import org.apache.datasketches.theta.{CompactSketch, SetOperation}

  /** Liveness probe: py4j resolves classes lazily, so Python calls this
    * once to decide direct-vs-job (a missing jar raises here, not
    * mid-ask). */
  def ping(): Int = 1

  private def frames(framed: Array[Byte]): Array[Array[Byte]] = {
    val bb = java.nio.ByteBuffer.wrap(framed) // big-endian by default
    val n = bb.getInt()
    val out = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val a = new Array[Byte](len)
      bb.get(a)
      out(i) = a
      i += 1
    }
    out
  }

  /** Split one grouped blob into cells — the GROUPED ask shape (r11).
    * Layout: ``[n_cells:int32][count_i:int32]*n [len:int32 bytes]*`` (all
    * big-endian), i.e. the per-cell frame counts ride INSIDE the blob and
    * results return as packed byte blobs too: py4j moves byte[] in one
    * bulk transfer, while an int[]/long[] argument or return pays one
    * gateway round trip PER ELEMENT (~0.3 ms each — measured: a 29-cell
    * series cost ~9 ms in counts alone before this layout). One call, two
    * bulk transfers, whatever the series length. */
  private def groupedCellFrames(framed: Array[Byte]): Array[Array[Array[Byte]]] = {
    val bb = java.nio.ByteBuffer.wrap(framed)
    val n = bb.getInt()
    val counts = Array.fill(n)(bb.getInt())
    counts.map { c =>
      Array.fill(c) {
        val len = bb.getInt()
        val a = new Array[Byte](len)
        bb.get(a)
        a
      }
    }
  }

  private def packLongs(xs: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * xs.length)
    xs.foreach(bb.putLong)
    bb.array()
  }

  private def packDoubles(xs: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * xs.length)
    xs.foreach(bb.putDouble)
    bb.array()
  }

  // ------------------------------------------------------------------ HLL
  private def hllUnionEstimate(fs: Array[Array[Byte]]): Long = {
    if (fs.isEmpty) return 0L
    val first = HllSketch.wrap(Memory.wrap(fs(0)))
    val u = new HllUnion(first.getLgConfigK)
    fs.foreach(b => u.update(HllSketch.wrap(Memory.wrap(b))))
    Math.round(u.getEstimate)
  }

  /** Union all framed HLL sketches and return the rounded estimate —
    * exactly hll_sketch_estimate(hll_union_agg(...)): the union adopts the
    * first sketch's lgConfigK (all buckets of one rollup share it). */
  def hllEstimate(framed: Array[Byte]): Long = hllUnionEstimate(frames(framed))

  /** Per-cell union estimates — approx_distinct_by's series in one call.
    * Empty cells (a bucket whose sketches were all NULL) return 0 here;
    * the Python caller maps them to the job path's NULL via its counts.
    * Returns n big-endian int64s packed as bytes (see groupedCellFrames
    * for why not long[]). */
  def hllEstimateGrouped(framed: Array[Byte]): Array[Byte] =
    packLongs(groupedCellFrames(framed).map(hllUnionEstimate))

  // ------------------------------------------------------------------ KLL
  private def mergeDoubles(fs: Array[Array[Byte]]): KllDoublesSketch = {
    val first = KllDoublesSketch.heapify(Memory.wrap(fs(0)))
    val acc = KllDoublesSketch.newHeapInstance(first.getK)
    fs.foreach(b => acc.merge(KllDoublesSketch.heapify(Memory.wrap(b))))
    acc
  }

  private def mergeLongs(fs: Array[Array[Byte]]): KllLongsSketch = {
    val first = KllLongsSketch.heapify(Memory.wrap(fs(0)))
    val acc = KllLongsSketch.newHeapInstance(first.getK)
    fs.foreach(b => acc.merge(KllLongsSketch.heapify(Memory.wrap(b))))
    acc
  }

  private def mergedDoubles(framed: Array[Byte]): KllDoublesSketch =
    mergeDoubles(frames(framed))

  private def mergedLongs(framed: Array[Byte]): KllLongsSketch =
    mergeLongs(frames(framed))

  /** Per-cell quantiles — approx_quantile_by's series in one call.
    * Packed per cell: one occupancy byte (0 = no frames / only empty
    * sketches, the job path's get_n(...) > 0 gate -> NULL per rank),
    * then — only when occupied — one big-endian double/int64 per asked
    * rank. */
  def kllQuantilesDoubleGrouped(
      framed: Array[Byte], qs: Array[Double]
  ): Array[Byte] = {
    val cells = groupedCellFrames(framed)
    val bb = java.nio.ByteBuffer.allocate(cells.length * (1 + 8 * qs.length))
    cells.foreach { fs =>
      val acc = if (fs.isEmpty) null else mergeDoubles(fs)
      if (acc == null || acc.isEmpty) bb.put(0: Byte)
      else {
        bb.put(1: Byte)
        qs.foreach(q => bb.putDouble(acc.getQuantile(q)))
      }
    }
    java.util.Arrays.copyOf(bb.array(), bb.position())
  }

  def kllQuantilesLongGrouped(
      framed: Array[Byte], qs: Array[Double]
  ): Array[Byte] = {
    val cells = groupedCellFrames(framed)
    val bb = java.nio.ByteBuffer.allocate(cells.length * (1 + 8 * qs.length))
    cells.foreach { fs =>
      val acc = if (fs.isEmpty) null else mergeLongs(fs)
      if (acc == null || acc.isEmpty) bb.put(0: Byte)
      else {
        bb.put(1: Byte)
        qs.foreach(q => bb.putLong(acc.getQuantile(q)))
      }
    }
    java.util.Arrays.copyOf(bb.array(), bb.position())
  }

  /** Quantiles at the given ranks, or null when every sketch is empty —
    * the Python caller maps null to the job path's NULL-per-rank. */
  def kllQuantilesDouble(framed: Array[Byte], qs: Array[Double]): Array[Double] = {
    val acc = mergedDoubles(framed)
    if (acc.isEmpty) null else qs.map(acc.getQuantile(_))
  }

  def kllRankDouble(framed: Array[Byte], v: Double): java.lang.Double = {
    val acc = mergedDoubles(framed)
    if (acc.isEmpty) null else java.lang.Double.valueOf(acc.getRank(v))
  }

  def kllQuantilesLong(framed: Array[Byte], qs: Array[Double]): Array[Long] = {
    val acc = mergedLongs(framed)
    if (acc.isEmpty) null else qs.map(acc.getQuantile(_))
  }

  def kllRankLong(framed: Array[Byte], v: Long): java.lang.Double = {
    val acc = mergedLongs(framed)
    if (acc.isEmpty) null else java.lang.Double.valueOf(acc.getRank(v))
  }

  // ---------------------------------------------------------------- theta
  private def unionAll(framed: Array[Byte]): CompactSketch = {
    val u = SetOperation.builder().buildUnion()
    frames(framed).foreach(b => u.union(CompactSketch.wrap(Memory.wrap(b))))
    u.getResult
  }

  def thetaEstimate(framed: Array[Byte]): Long =
    Math.round(unionAll(framed).getEstimate)

  /** |A ∩ B| of the two range-unions — approx_retained's shape. */
  def thetaIntersectEstimate(a: Array[Byte], b: Array[Byte]): Long =
    Math.round(
      SetOperation.builder().buildIntersection()
        .intersect(unionAll(a), unionAll(b)).getEstimate
    )

  /** |A \ B| (elements of A not in B) — approx_new asks with A = the
    * LATER range, matching theta_difference(__u2, __u1). */
  def thetaANotBEstimate(a: Array[Byte], b: Array[Byte]): Long =
    Math.round(
      SetOperation.builder().buildANotB()
        .aNotB(unionAll(a), unionAll(b)).getEstimate
    )

  /** (|A ∩ B|, |A ∪ B|) in one call — approx_jaccard's two numerators
    * without a second blob shipment. */
  def thetaJaccardPair(a: Array[Byte], b: Array[Byte]): Array[Long] = {
    val ua = unionAll(a)
    val ub = unionAll(b)
    val i = SetOperation.builder().buildIntersection().intersect(ua, ub)
    val u = SetOperation.builder().buildUnion().union(ua, ub)
    Array(Math.round(i.getEstimate), Math.round(u.getEstimate))
  }

  /** retained_by_key's whole cohort table in one call: the two grouped
    * blobs carry each key's frames in r1 and r2 (same cells, same order —
    * the Python caller framed both against one mirror snapshot); returns
    * 3n RAW doubles packed as bytes ``[est1_0..n-1, est2_0..n-1,
    * inter_0..n-1]``. A key with no frames on one side unions to the
    * EMPTY sketch (estimate 0), exactly the job path's WHEN-projection
    * all-NULL side (theta_union_agg over NULLs is an empty sketch —
    * probed r10), so the coalesce algebra needs no occupancy bytes. */
  private def groupedUnions(framed: Array[Byte]): Array[CompactSketch] =
    groupedCellFrames(framed).map { fs =>
      val u = SetOperation.builder().buildUnion()
      fs.foreach(x => u.union(CompactSketch.wrap(Memory.wrap(x))))
      u.getResult
    }

  def thetaRetainedGrouped(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val ua = groupedUnions(a)
    val ub = groupedUnions(b)
    val n = ua.length
    val out = new Array[Double](3 * n)
    var i = 0
    while (i < n) {
      out(i) = ua(i).getEstimate
      out(n + i) = ub(i).getEstimate
      out(2 * n + i) = SetOperation.builder().buildIntersection()
        .intersect(ua(i), ub(i)).getEstimate
      i += 1
    }
    packDoubles(out)
  }

  /** The FULL per-cell cohort algebra in one call: 5n RAW doubles
    * ``[est1, est2, inter, bNotA, union]`` per cell block — cohort_by_key's
    * (n_r1, n_r2, n_retained, n_new, jaccard) shape, where n_new is
    * ``|r2 \ r1|`` (aNotB(ub, ua) — new audience in the LATER range,
    * matching theta_difference(__u2, __u1)) and the caller computes
    * jaccard = inter/union from the raw doubles like the job path's
    * expression algebra. */
  def thetaCohortGrouped(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val ua = groupedUnions(a)
    val ub = groupedUnions(b)
    val n = ua.length
    val out = new Array[Double](5 * n)
    var i = 0
    while (i < n) {
      out(i) = ua(i).getEstimate
      out(n + i) = ub(i).getEstimate
      out(2 * n + i) = SetOperation.builder().buildIntersection()
        .intersect(ua(i), ub(i)).getEstimate
      out(3 * n + i) = SetOperation.builder().buildANotB()
        .aNotB(ub(i), ua(i)).getEstimate
      out(4 * n + i) = SetOperation.builder().buildUnion()
        .union(ua(i), ub(i)).getEstimate
      i += 1
    }
    packDoubles(out)
  }

  /** retention_by's whole series in one call: per-period union estimates
    * and each period's intersection with the PREVIOUS period, returned as
    * RAW doubles ``[est_0..est_{n-1}, ret_0..ret_{n-1}]`` packed as bytes
    * (ret_0 is 0 and unused) — the Python caller applies the job path's
    * exact NULL/coalesce/CAST(long) semantics using its per-cell counts,
    * so the truncation matches theta_sketch_estimate(...).cast('long')
    * bit-for-bit. Empty cells union to the empty sketch (estimate 0). */
  def thetaRetentionGrouped(framed: Array[Byte]): Array[Byte] = {
    val unions = groupedCellFrames(framed).map { fs =>
      val u = SetOperation.builder().buildUnion()
      fs.foreach(b => u.union(CompactSketch.wrap(Memory.wrap(b))))
      u.getResult
    }
    val n = unions.length
    val out = new Array[Double](2 * n)
    var i = 0
    while (i < n) {
      out(i) = unions(i).getEstimate
      out(n + i) =
        if (i == 0) 0.0
        else
          SetOperation.builder().buildIntersection()
            .intersect(unions(i - 1), unions(i)).getEstimate
      i += 1
    }
    packDoubles(out)
  }

  // --------------------------------------------- coarse-tier pre-merge (r12)
  /** Re-frame per-cell results as ``[n:int32][len:int32 bytes]*`` — the
    * inverse of `frames`; a zero-length entry marks an EMPTY cell (no
    * non-NULL input frames), which the Python caller maps back to None. */
  private def frameBack(cells: Array[Array[Byte]]): Array[Byte] = {
    var total = 4
    cells.foreach(c => total += 4 + c.length)
    val bb = java.nio.ByteBuffer.allocate(total)
    bb.putInt(cells.length)
    cells.foreach { c => bb.putInt(c.length); bb.put(c) }
    bb.array()
  }

  /** Pre-merge each cell's frames into ONE serialized sketch (r12: the
    * tier ladder applied to the bytes mirror). The Python mirror caches
    * the returned day-level sketches so a full-span coarse series ask
    * frames O(days) merged sketches instead of the span's raw bucket
    * bytes — theta unions are exact set algebra, so union(union(day
    * cells)) over any grouping equals union(raw cells). */
  def thetaMergeGrouped(framed: Array[Byte]): Array[Byte] =
    frameBack(groupedCellFrames(framed).map { fs =>
      if (fs.isEmpty) Array.emptyByteArray
      else {
        val u = SetOperation.builder().buildUnion()
        fs.foreach(b => u.union(CompactSketch.wrap(Memory.wrap(b))))
        u.getResult.toByteArray
      }
    })

  /** HLL pre-merge: register-wise max / coupon-set union is associative,
    * so the merged tier's final register state is identical to a flat
    * union of the raw frames; the ESTIMATE is exact-equal only in the
    * coupon regime — estimator selection (HIP vs composite) is
    * path-dependent once a day merge promotes to HLL mode, the same
    * bound-based contract the direct-vs-job parity documents. The
    * union adopts the first frame's lgConfigK (one rollup, one lgK). */
  def hllMergeGrouped(framed: Array[Byte]): Array[Byte] =
    frameBack(groupedCellFrames(framed).map { fs =>
      if (fs.isEmpty) Array.emptyByteArray
      else {
        val first = HllSketch.wrap(Memory.wrap(fs(0)))
        val u = new HllUnion(first.getLgConfigK)
        fs.foreach(b => u.update(HllSketch.wrap(Memory.wrap(b))))
        u.getResult(first.getTgtHllType).toCompactByteArray
      }
    })

  /** KLL pre-merge (doubles): merge is rank-bounded (randomized
    * compaction), not bit-exact — the same contract the direct-vs-job
    * parity already documents for multi-bucket KLL asks. */
  def kllMergeDoublesGrouped(framed: Array[Byte]): Array[Byte] =
    frameBack(groupedCellFrames(framed).map { fs =>
      if (fs.isEmpty) Array.emptyByteArray else mergeDoubles(fs).toByteArray
    })

  /** KLL pre-merge (longs) — see kllMergeDoublesGrouped. */
  def kllMergeLongsGrouped(framed: Array[Byte]): Array[Byte] =
    frameBack(groupedCellFrames(framed).map { fs =>
      if (fs.isEmpty) Array.emptyByteArray else mergeLongs(fs).toByteArray
    })
}

/** Routed-answer fast path (r14, guide §1.2 per-task work): materialize the
  * constant LocalRelation a routed query answers with in ONE py4j call,
  * replacing the `spark.sql("SELECT * FROM VALUES ...")` round trip whose
  * ~4-5 ms parse+analysis dominated every FRESH routed DataFrame answer.
  * The rows ride py4j as a single byte[] blob (bulk transfer — the
  * UwheelSketchOps discipline: per-element list arguments pay one gateway
  * round trip each).
  *
  * Blob layout (big-endian): [nrows:int32][ncols:int32], then one type
  * code byte per column (0 BIGINT, 1 INT, 2 SMALLINT, 3 TINYINT,
  * 4 DOUBLE, 5 FLOAT, 6 TIMESTAMP µs, 7 STRING), then cells row-major:
  * [isnull:int8] followed (when non-null) by int64 for codes 0-3 and 6,
  * float64 for 4-5, [len:int32][utf8 bytes] for 7. Column names arrive
  * in one string, separated by U+001F.
  *
  * `createDataFrame(java.util.List[Row], schema)` builds a LocalRelation
  * directly (no RDD, no job) — the same zero-job constant-plan property
  * the VALUES form folded to. Schema nullability mirrors the VALUES fold:
  * a column is nullable iff it carries a NULL or is DOUBLE/FLOAT (whose
  * VALUES literals are string CASTs, hence nullable), and every column is
  * nullable when there are no rows (the `WHERE FALSE` shape).
  */
object UwheelLocalRelation {
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  /** Liveness probe — see UwheelSketchOps.ping. */
  def ping(): Int = 1

  def build(
      session: org.apache.spark.sql.classic.SparkSession,
      namesJoined: String,
      blob: Array[Byte]): org.apache.spark.sql.classic.DataFrame = {
    // The caller packs TIMESTAMP cells as UTC microseconds, which is only
    // the session's rendering when the session zone is UTC. The Python
    // side checks once and memoizes per session; this per-call guard
    // (free — it rides the same py4j call) closes the memo-staleness
    // window where the zone is changed MID-session: the throw makes the
    // caller fall back to the VALUES path, which renders literals in the
    // live session zone.
    require(
      session.sessionState.conf.sessionLocalTimeZone == "UTC",
      "UwheelLocalRelation requires spark.sql.session.timeZone=UTC")
    val names: Array[String] =
      if (namesJoined.isEmpty) Array.empty[String]
      else namesJoined.split('')
    val bb = java.nio.ByteBuffer.wrap(blob)
    val nrows = bb.getInt()
    val ncols = bb.getInt()
    require(ncols == names.length, s"ncols $ncols != names ${names.length}")
    val codes = Array.fill(ncols)(bb.get())
    val types: Array[DataType] = codes.map {
      case 0 => LongType
      case 1 => IntegerType
      case 2 => ShortType
      case 3 => ByteType
      case 4 => DoubleType
      case 5 => FloatType
      case 6 => TimestampType
      case 7 => StringType
      case c => throw new IllegalArgumentException(s"bad type code $c")
    }
    val hasNull = Array.fill(ncols)(false)
    val rows = new java.util.ArrayList[Row](nrows)
    var r = 0
    while (r < nrows) {
      val cells = new Array[Any](ncols)
      var c = 0
      while (c < ncols) {
        if (bb.get() != 0) { hasNull(c) = true; cells(c) = null }
        else
          cells(c) = codes(c) match {
            case 0 => bb.getLong()
            case 1 => bb.getLong().toInt
            case 2 => bb.getLong().toShort
            case 3 => bb.getLong().toByte
            case 4 => bb.getDouble()
            case 5 => bb.getDouble().toFloat
            case 6 =>
              val us = bb.getLong()
              java.time.Instant.ofEpochSecond(
                java.lang.Math.floorDiv(us, 1000000L),
                java.lang.Math.floorMod(us, 1000000L) * 1000L)
            case 7 =>
              val len = bb.getInt()
              val a = new Array[Byte](len)
              bb.get(a)
              new String(a, java.nio.charset.StandardCharsets.UTF_8)
          }
        c += 1
      }
      rows.add(Row.fromSeq(cells.toIndexedSeq))
      r += 1
    }
    val fields = names.zipWithIndex.map { case (n, i) =>
      // VALUES-fold parity: float/double literals render as string CASTs
      // there (nullable Cast), so those columns are always nullable
      val nn =
        if (nrows == 0) true
        else hasNull(i) || codes(i) == 4 || codes(i) == 5
      StructField(n, types(i), nullable = nn)
    }
    session.createDataFrame(rows, StructType(fields))
  }
}
