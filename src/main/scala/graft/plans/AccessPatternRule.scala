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

  /** (session UUID, fast table path) → analyzed relation. Analyzing a
    * relation lists its files (driver I/O); caching it means the optimizer
    * pays that listing once per registered fast table, not once per rule
    * application across a many-query session. Keyed BY SESSION because a
    * HadoopFsRelation captures its SparkSession and a file-listing
    * snapshot — a relation built in one session must never serve another.
    * Invalidated across all sessions when the fast table is re-registered
    * (re-materialization writes new files); any rewrite that bypasses
    * `register()` serves a stale listing, which is why
    * `AccessPatterns.optimize` always re-registers after writing.
    */
  private val relCache = new ConcurrentHashMap[(SparkSession, String), LogicalRelation]()
  private[plans] val relBuilds = new java.util.concurrent.atomic.AtomicLong()

  /** base data path → (z-ordered dim set → fast_z table path) — the
    * multi-dim clusterings ([[graft.operators.AccessPatterns.optimizeZorder]]).
    */
  private val multiEntries =
    new ConcurrentHashMap[String, Map[Set[String], String]]()

  def register(basePath: String, dim: String, fastPath: String): Unit = {
    relCache.keySet.removeIf(_._2 == fastPath)
    entries.merge(norm(basePath), Map(dim -> fastPath), (a, b) => a ++ b)
  }

  /** Register a Z-order clustering over `dims` for `basePath`. */
  def registerMulti(basePath: String, dims: Set[String], fastPath: String): Unit = {
    relCache.keySet.removeIf(_._2 == fastPath)
    multiEntries.merge(norm(basePath), Map(dims -> fastPath), (a, b) => a ++ b)
  }

  def clear(): Unit = { entries.clear(); multiEntries.clear(); relCache.clear() }

  def lookup(basePath: String): Map[String, String] =
    entries.getOrDefault(norm(basePath), Map.empty)

  def lookupMulti(basePath: String): Map[Set[String], String] =
    multiEntries.getOrDefault(norm(basePath), Map.empty)

  private[plans] def relationFor(session: SparkSession, path: String,
                                 build: String => Option[LogicalRelation]): Option[LogicalRelation] = {
    val key = (session, path)   // reference equality — per-session by identity
    Option(relCache.get(key)).orElse {
      relBuilds.incrementAndGet()
      val built = build(path)
      built.foreach(relCache.put(key, _))
      built
    }
  }

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
  *
  * When several filtered dims have fast tables, the swap dim is chosen by
  * PREDICATE CLASS — equality > IN > range > other — because an equality
  * predicate on the clustering key prunes to a single key range (one or two
  * row groups) while a range predicate keeps a span; the class outranks
  * alphabetical accident. Analyzed fast relations come from the catalog's
  * cache, so file listing happens once per fast table, not per query.
  */
final case class AccessPatternRule(spark: SparkSession) extends Rule[LogicalPlan] {

  import org.apache.spark.sql.catalyst.expressions._

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, rel: LogicalRelation) =>
      val swap = for {
        fsRel <- rel.relation match {
          case h: HadoopFsRelation => Some(h)
          case _ => None
        }
        root <- fsRel.location.rootPaths.headOption.map(_.toString)
        fastByDim = AccessPatternCatalog.lookup(root)
        fastByDims = AccessPatternCatalog.lookupMulti(root)
        if fastByDim.nonEmpty || fastByDims.nonEmpty
        // a Z-order clustering wins when EVERY one of its dims carries a
        // real predicate (a bbox) — the interleave spreads any single dim,
        // so a partially-covered z table never beats a fast_<dim> copy;
        // among covered z tables the widest (then highest-scored) wins
        multiHit = fastByDims.toSeq
          .filter(_._1.forall(d => predicateScore(cond, d) >= 1))
          .sortBy { case (ds, p) =>
            (-ds.size, -ds.toSeq.map(predicateScore(cond, _)).sum, p) }
          .headOption
        candidates = cond.references.map(_.name).toSeq.distinct.sorted
          .filter(fastByDim.contains)
        if multiHit.nonEmpty || candidates.nonEmpty
        fastPath = multiHit.map(_._2).getOrElse {
          val dim = candidates.maxBy(d => predicateScore(cond, d)) // sorted → ties pick first name
          fastByDim(dim)
        }
        newRel <- AccessPatternCatalog.relationFor(spark, fastPath, analyzedRelation)
        // same columns in the same order — the clustering is a row-identical
        // rewrite of the base table
        if newRel.output.map(a => (a.name, a.dataType)) ==
          rel.output.map(a => (a.name, a.dataType))
      } yield {
        // Re-expose the ORIGINAL attribute identities on the swapped
        // relation (same names/types, different files) so every reference
        // above the scan — the filter, projections, aggregates — stays
        // valid. Only the files being read change.
        logInfo(s"access-pattern swap: $root → $fastPath")
        Filter(cond, newRel.copy(output = rel.output))
      }
      swap.getOrElse(f)
  }

  /** Selectivity class of the strongest predicate on `dim` inside `cond`:
    * 3 = equality, 2 = IN, 1 = range comparison, 0 = any other reference. */
  private def predicateScore(cond: Expression, dim: String): Int = {
    def isDim(e: Expression): Boolean = e match {
      case a: AttributeReference => a.name == dim
      case c: Cast => isDim(c.child)
      case _ => false
    }
    var score = 0
    cond.foreach {
      case EqualTo(l, r) if (isDim(l) && r.foldable) || (isDim(r) && l.foldable) =>
        score = score.max(3)
      case EqualNullSafe(l, r) if (isDim(l) && r.foldable) || (isDim(r) && l.foldable) =>
        score = score.max(3)
      case In(v, list) if isDim(v) && list.forall(_.foldable) =>
        score = score.max(2)
      case InSet(v, _) if isDim(v) =>
        score = score.max(2)
      case b: BinaryComparison
        if (isDim(b.left) && b.right.foldable) || (isDim(b.right) && b.left.foldable) =>
        score = score.max(1)
      case _ => ()
    }
    score
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
    graft.functions.SqlFunctions.all.foreach(ext.injectFunction)
  }
}

object GraftSparkExtensions {
  /** Install on an already-created session (extensions can only be declared
    * at session construction; `extraOptimizations` is the supported hook for
    * rules on live sessions, the function registry for functions).
    */
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[AccessPatternRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AccessPatternRule(spark)
    (graft.functions.IbmFloatDecode.functionDescription +:
      graft.functions.SqlFunctions.all).foreach { case (id, info, builder) =>
      org.apache.spark.sql.graft.FunctionInstaller.register(spark, id, info, builder)
    }
  }
}
