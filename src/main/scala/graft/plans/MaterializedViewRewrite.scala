package graft.plans

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions.{Alias, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Transparent materialized-view rewrite: queries whose (sub)plan is
  * plan-identical to a registered view definition are served from the
  * view's parquet instead of recomputing — the caller keeps writing the
  * query against the BASE tables and the optimizer swaps in the
  * precomputed result. Combined with the incremental-maintenance family
  * ([[graft.operators.Maintain]]), this is the aggregate-table pattern
  * every warehouse grows: maintain cheap, rewrite transparently.
  *
  * Matching is exact-plan (canonicalized OPTIMIZED plan equality): the
  * rule never attempts containment reasoning (a query "subsumed by" a
  * view), so a rewrite fires only when recomputation would provably
  * produce the identical result — column order, aggregate expressions,
  * filters and all. Canonicalization erases exprIds and cosmetic aliases,
  * so a re-built identical DataFrame or an equivalent `spark.sql` query
  * still matches. Staleness is the caller's contract, exactly as with any
  * aggregate table: re-[[MaterializedViews.register]] after refreshing.
  *
  * Scale: the win is the read path — a 100 TB scan + shuffle collapses
  * to a scan of the (typically MB-scale) aggregate parquet. The rule
  * itself only canonicalizes candidate nodes of the same class as a
  * registered definition root, so plans pay ~nothing when no view can
  * match.
  */
object MaterializedViews {

  private[plans] final case class Entry(name: String, path: String,
      defnCanonical: LogicalPlan, defnClass: Class[_],
      replacement: LogicalPlan)

  private val registry = new ConcurrentHashMap[String, Entry]()

  // register() computes the definition with the rewrite SUSPENDED on this
  // thread: a re-registration's definition matches the registry's previous
  // entry, and rewriting it would (a) read the stale view instead of
  // recomputing from base — a refresh that refreshes nothing — and
  // (b) self-overwrite the parquet dir it is concurrently reading
  private val registering = ThreadLocal.withInitial[java.lang.Boolean](() => false)
  private[plans] def suspended: Boolean = registering.get()

  /** Write `definition`'s result to `path` and register it for rewrite.
    * Returns the view reader. The definition is stored as its optimized
    * canonical plan; the replacement is the parquet read-back, column
    * order and types verified against the definition (a parquet round
    * trip that changed either would corrupt, not accelerate, rewritten
    * queries — refused here).
    */
  def register(spark: SparkSession, name: String, definition: DataFrame,
      path: String): DataFrame = {
    // Evict any entry served from this path BEFORE the overwrite: the
    // ThreadLocal suspension below only covers THIS thread, and a query
    // optimizing concurrently (e.g. Jobs' Future-per-sink submission)
    // must not be rewritten onto a directory being deleted. A query that
    // already HOLDS an optimized plan over the old files races the
    // overwrite exactly as it would with any non-transactional parquet
    // rewrite — callers needing full isolation refresh into a NEW path.
    registry.entrySet.removeIf(e =>
      e.getValue.name == name || e.getValue.path == path)
    // the rest runs suspended: definition.queryExecution.optimizedPlan is
    // LAZY, and letting the rewrite fire on it would store a canonical
    // form that already contains the (stale) view scan
    registering.set(true)
    try {
      definition.write.mode("overwrite").parquet(path)
      // re-registration at the same path: drop the session's cached file
      // listing/footers, or the new scan would serve the OVERWRITTEN
      // (deleted) files and fail mid-read
      spark.catalog.refreshByPath(path)
      val scan = spark.read.parquet(path)
      val defOut = definition.queryExecution.analyzed.output
      val scanOut = scan.queryExecution.analyzed.output
      require(scanOut.map(_.name) == defOut.map(_.name) &&
        scanOut.map(_.dataType) == defOut.map(_.dataType),
        s"materialized view '$name': parquet round-trip changed the schema " +
          s"(${defOut.map(a => s"${a.name}:${a.dataType.simpleString}")} -> " +
          s"${scanOut.map(a => s"${a.name}:${a.dataType.simpleString}")})")
      // canonicalize a FRESH execution of the definition's logical plan:
      // the caller's Dataset may have been executed before this call, and
      // its cached optimizedPlan could then already contain the previous
      // registration's view scan (the identity Project of select("*") is
      // collapsed away by the optimizer, so the canonical form is the
      // definition's own)
      val defnOptimized = definition.select(col("*")).queryExecution.optimizedPlan
      registry.put(name, Entry(name, path, defnOptimized.canonicalized,
        defnOptimized.getClass, scan.queryExecution.analyzed))
      scan
    } finally registering.set(false)
  }

  def deregister(name: String): Unit = registry.remove(name)
  def clear(): Unit = registry.clear()

  private[plans] def entries: Seq[Entry] = registry.values.asScala.toSeq
}

object MaterializedViewRewrite extends Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val views = MaterializedViews.entries
    if (views.isEmpty || MaterializedViews.suspended) plan
    else plan.transformUp {
      case p => rewriteNode(p, views).getOrElse(p)
    }
  }

  private def exactMatch(p: LogicalPlan,
      views: Seq[MaterializedViews.Entry]): Option[MaterializedViews.Entry] =
    views.find(v => v.defnClass == p.getClass && p.canonicalized == v.defnCanonical)

  private def rewriteNode(p: LogicalPlan,
      views: Seq[MaterializedViews.Entry]): Option[LogicalPlan] = {
    import org.apache.spark.sql.catalyst.expressions.{Attribute, IsNotNull}
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Project}
    exactMatch(p, views).map(substitute(p, _)).orElse(p match {
      // a join above an aggregate makes InferFiltersFromConstraints push
      // IsNotNull(groupKey) BELOW the aggregate, so the subtree is no
      // longer plan-identical to the definition. Stripping such a filter
      // is sound exactly when it touches ONLY grouping attributes: rows
      // with a null grouping key are precisely the null-key group, so
      // filtering them before the aggregate equals filtering the
      // aggregate's output — which the retained Filter (now over the
      // substituted view, same exprIds) does.
      case Aggregate(g, a, aggChild, hint) =>
        // the filter may sit directly under the aggregate or below the
        // column-pruning Project the optimizer leaves there
        val stripView: Option[(org.apache.spark.sql.catalyst.expressions.Expression,
            LogicalPlan)] = aggChild match {
          case Filter(cond, child) => Some((cond, child))
          case Project(pl, Filter(cond, child)) => Some((cond, Project(pl, child)))
          case _ => None
        }
        stripView.flatMap { case (cond, strippedChild) =>
          val notNullOnGroupKeys = splitConjunctivePredicates(cond).forall {
            case IsNotNull(attr: Attribute) => g.exists(_.semanticEquals(attr))
            case _ => false
          }
          if (!notNullOnGroupKeys) None
          else {
            val stripped = Aggregate(g, a, strippedChild, hint)
            exactMatch(stripped, views)
              .map(v => Filter(cond, substitute(stripped, v)))
          }
        }
      case _ => None
    })
  }

  /** Swap the matched subtree for a FRESH instance of the view scan
    * (newInstance() re-ids the relation so one view can substitute twice
    * in a self-join), aliased back to the subtree's exprIds so parent
    * operators' references stay bound.
    */
  private def substitute(p: LogicalPlan,
      v: MaterializedViews.Entry): LogicalPlan = {
    val fresh = v.replacement.transformUp {
      case m: LogicalPlan with MultiInstanceRelation => m.newInstance()
    }
    val projections: Seq[NamedExpression] = p.output.zip(fresh.output).map {
      case (orig, mv) => Alias(mv, orig.name)(orig.exprId, orig.qualifier)
    }
    org.apache.spark.sql.catalyst.plans.logical.Project(projections, fresh)
  }
}
