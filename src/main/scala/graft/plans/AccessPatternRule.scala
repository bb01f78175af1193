package graft.plans

import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** The access-pattern relation swap — the one genuinely useful custom
  * Catalyst extension for this engine (SURVEY §4): when a query filters on a
  * dimension that has a materialized `fast_<dim>` clustering
  * (`operators/AccessPatterns.optimize`, mirroring the reference's
  * `optimize/access_pattern.py:26-118`), rewrite the scan to read the
  * clustered copy. Same rows, but the Parquet min/max pruning on the sorted
  * layout skips most files — the reference's "pick the fast_inline array for
  * inline slices" logic, done inside the optimizer so user code never
  * changes.
  */
object AccessPatternCatalog {
  /** base data path → (dim name → fast table path) */
  private val entries = new ConcurrentHashMap[String, Map[String, String]]()

  def register(basePath: String, dim: String, fastPath: String): Unit =
    entries.merge(norm(basePath), Map(dim -> fastPath), (a, b) => a ++ b)

  def clear(): Unit = entries.clear()

  def lookup(basePath: String): Map[String, String] =
    entries.getOrDefault(norm(basePath), Map.empty)

  /** Scheme-insensitive compare: `file:/tmp/x`, `/tmp/x/` and `/tmp/x` are
    * the same location. */
  private def norm(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath.stripSuffix("/")

  def registered: Map[String, Map[String, String]] = entries.asScala.toMap
}

/** Optimizer rule: `Filter(dim = …, Scan(base))` → `Filter(dim = …,
  * Scan(fast_dim))` when the catalog has a clustering for `dim` and the fast
  * table exposes the same columns. Attribute identity is rewired by name so
  * the rest of the plan is untouched.
  */
final case class AccessPatternRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, rel: LogicalRelation) =>
      val swap = for {
        fsRel <- rel.relation match {
          case h: HadoopFsRelation => Some(h)
          case _ => None
        }
        root <- fsRel.location.rootPaths.headOption.map(_.toString)
        fastByDim = AccessPatternCatalog.lookup(root)
        if fastByDim.nonEmpty
        dim <- cond.references.map(_.name).toSeq.sorted.find(fastByDim.contains)
        fastPath = fastByDim(dim)
        newRel <- analyzedRelation(fastPath)
        // same columns in the same order — the clustering is a row-identical
        // rewrite of the base table
        if newRel.output.map(a => (a.name, a.dataType)) ==
          rel.output.map(a => (a.name, a.dataType))
      } yield {
        // Re-expose the ORIGINAL attribute identities on the swapped
        // relation (same names/types, different files) so every reference
        // above the scan — the filter, projections, aggregates — stays
        // valid. Only the files being read change.
        logInfo(s"access-pattern swap: $root → $fastPath (predicate on $dim)")
        Filter(cond, newRel.copy(output = rel.output))
      }
      swap.getOrElse(f)
  }

  private def analyzedRelation(path: String): Option[LogicalRelation] =
    try spark.read.parquet(path).queryExecution.analyzed match {
      case lr: LogicalRelation => Some(lr)
      case _ => None
    } catch { case _: Exception => None }
}

/** Session-extension entry point:
  * `spark.sql.extensions=graft.plans.GraftSparkExtensions`. */
final class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(AccessPatternRule.apply)
    ext.injectFunction(graft.functions.IbmFloatDecode.functionDescription)
  }
}

object GraftSparkExtensions {
  /** Install on an already-created session (extensions can only be declared
    * at session construction; `extraOptimizations` is the supported hook for
    * live sessions).
    */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[AccessPatternRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AccessPatternRule(spark)
}
