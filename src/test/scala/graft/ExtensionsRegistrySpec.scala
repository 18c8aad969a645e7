package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{SimHash, TextFunctions}

class ExtensionsRegistrySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

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
