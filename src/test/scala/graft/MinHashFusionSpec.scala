package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Analytics, Dedup}

/** The fused MinHash expression must be BIT-identical to the builtin
  * formulation it replaces — LSH bucket assignment (and therefore the
  * dedup result) depends on every lane value. */
class MinHashFusionSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  test("fused minhash lanes == builtin lanes on the documents corpus") {
    val docs = Tables.load(spark, sfDir, "documents")
    val diff = docs.select(
        Dedup.minhashSignature(col("text")).as("fused"),
        Dedup.minhashSignatureBuiltin(col("text")).as("builtin"))
      .where(not(col("fused") <=> col("builtin")))
      .count()
    assert(diff === 0L)
  }

  test("fused minhash handles degenerate inputs like the builtin") {
    val edge = Seq("", " ", "one", "a b", "éé üü")
      .toDF("text")
    val rows = edge.select(
        Dedup.minhashSignature(col("text")).as("fused"),
        Dedup.minhashSignatureBuiltin(col("text")).as("builtin"))
      .collect()
    rows.foreach { r => assert(r.get(0) === r.get(1)) }
  }

  test("q51 salted aggregation equals the plain group-by") {
    val salted = Analytics.q51SaltedAgg(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .toSet
    val plain = Tables.load(spark, sfDir, "events")
      .groupBy(col("event_type"))
      .agg(
        round(sum(col("value").cast("decimal(18,4)")).cast("double"), 2)
          .as("total_amount"),
        count(col("value")).as("count_of_rows"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .toSet
    assert(salted === plain)
  }
}
