package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProduct, SimHash64}

/** SQL-side registration of the engine's custom expressions.
  *
  * Two entry points:
  *  - cluster deployment: `--conf spark.sql.extensions=graft.GraftExtensions`
  *    (or `.withExtensions(new GraftExtensions)`) injects the functions
  *    at session build time;
  *  - an existing session: `GraftExtensions.register(spark)`.
  *
  * After either, `SELECT simhash64(split(text, '\\s+')) FROM docs` works
  * from plain SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(e.injectFunction)
    GraftExtensions.tableFunctions.foreach(e.injectTableFunction)
    e.injectOptimizerRule(_ => graft.plans.EditDistancePruning)
    e.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
  }
}

object GraftExtensions {

  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)),
    (FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))

  /** `SELECT * FROM table_changes('<table root>', from [, to])` —
    * the SQL surface of the gtable change feed (Delta's TVF of the
    * same name): rows of [[graft.format.GraftTable.readCdc]] with
    * `_change_type` ∈ insert / delete / update_preimage /
    * update_postimage, for the window `(from, to]` (to defaults to
    * the current version). A DISTRIBUTED read — the TVF resolves to
    * the CDC plan, not a driver-collected result set, so a wide
    * window streams through executors like any scan. Arguments must
    * be literals (the plan is resolved at analysis time). */
  val tableFunctions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] =>
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)] = Seq(
    (FunctionIdentifier("table_changes"),
      new ExpressionInfo("graft.format.GraftTable", "table_changes"),
      (exprs: Seq[Expression]) => {
        def lit(i: Int): Any = exprs(i) match {
          case l: org.apache.spark.sql.catalyst.expressions.Literal =>
            l.value
          case other => throw new IllegalArgumentException(
            s"table_changes arguments must be literals, got: $other")
        }
        require(exprs.length == 2 || exprs.length == 3,
          "table_changes(table_root, from_version[, to_version])")
        val root = String.valueOf(lit(0))
        val spark = SparkSession.active
        if (graft.format.GraftTable.versionAt(root) == 0)
          throw new IllegalArgumentException(
            s"table_changes: no committed gtable at $root")
        val t = graft.format.GraftTable.forPath(spark, root)
        val from = lit(1).asInstanceOf[Number].longValue
        val to =
          if (exprs.length > 2) lit(2).asInstanceOf[Number].longValue
          else t.currentVersion
        org.apache.spark.sql.graft.ColumnBridge
          .analyzed(t.readCdc(from, to))
      }))

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (id, info, builder) =>
      org.apache.spark.sql.graft.ColumnBridge
        .registerFunction(spark, id, info, builder)
    }
    tableFunctions.foreach { case (id, info, builder) =>
      org.apache.spark.sql.graft.ColumnBridge
        .registerTableFunction(spark, id, info, builder)
    }
    val extra = spark.sessionState.experimentalMethods
    if (!extra.extraOptimizations.contains(graft.plans.EditDistancePruning))
      extra.extraOptimizations =
        extra.extraOptimizations :+ graft.plans.EditDistancePruning
    if (!extra.extraStrategies.contains(graft.plans.TopKPerGroupStrategy))
      extra.extraStrategies =
        extra.extraStrategies :+ graft.plans.TopKPerGroupStrategy
  }
}
