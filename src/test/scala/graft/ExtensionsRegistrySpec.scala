package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{SimHash, TextFunctions}

class ExtensionsRegistrySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("edit-distance filters gain a length-difference guard, results " +
      "unchanged") {
    import org.apache.spark.sql.functions._
    // results WITHOUT the rule (fresh condition on a clean session state)
    val before = graft.operators.Dedup
      .q69EditDistancePairs(spark, "/root/testdata/sf0.01")
      .collect().map(_.toString).sorted
    GraftExtensions.register(spark)
    val df = graft.operators.Dedup
      .q69EditDistancePairs(spark, "/root/testdata/sf0.01")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("abs((length(") ||
      optimized.contains("abs((length("),
      s"expected length-difference guard in optimized plan:\n$optimized")
    val after = df.collect().map(_.toString).sorted
    assert(after === before, "the guard must be semantics-preserving")
    // idempotent under the optimizer fixpoint: exactly one guard
    val guards = "abs\\(".r.findAllIn(optimized).length
    assert(guards === 1, s"guard must be added once, saw $guards")
  }

  test("simhash64 callable from SQL after registration") {
    GraftExtensions.register(spark)
    val viaSql = spark
      .sql("SELECT simhash64(split('the quick brown fox', ' ')) AS h")
      .head().getLong(0)
    val viaColumn = Seq("the quick brown fox").toDF("text")
      .select(SimHash.simhash64(TextFunctions.tokens($"text")))
      .head().getLong(0)
    assert(viaSql === viaColumn)
  }
}
