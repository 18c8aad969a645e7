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

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (id, info, builder) =>
      org.apache.spark.sql.graft.ColumnBridge
        .registerFunction(spark, id, info, builder)
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
