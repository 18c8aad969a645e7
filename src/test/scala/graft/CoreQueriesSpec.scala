package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.CoreQueries

class CoreQueriesSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  test("q03 left-join denormalization preserves fact cardinality") {
    val liCount = Tables.load(spark, sfDir, "lineitem").count()
    assert(CoreQueries.q03DenormJoin(spark, sfDir).count() === liCount)
  }

  test("q05 agg-then-join has one row per order key") {
    val distinctOrders = Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey").distinct().count()
    assert(CoreQueries.q05AggThenJoin(spark, sfDir).count() === distinctOrders)
  }

  test("q01 string-date BETWEEN equals timestamp BETWEEN") {
    val viaString = CoreQueries.q01PrunedAgg(spark, sfDir)
      .agg(sum("count_of_purchase")).head().getLong(0)
    val viaTs = Tables.load(spark, sfDir, "lineitem")
      .where(col("l_shipdate").between("1995-01-01", "1996-12-31 23:59:59"))
      .count()
    assert(viaString === viaTs)
  }

  test("q08 weekday names are ISO-consistent (Mon=1..Sun=7)") {
    val rows = CoreQueries.q08Weekday(spark, sfDir)
      .select("iso_dow", "day_of_week").distinct().collect()
    val expected = Map(1 -> "Monday", 2 -> "Tuesday", 3 -> "Wednesday",
      4 -> "Thursday", 5 -> "Friday", 6 -> "Saturday", 7 -> "Sunday")
    rows.foreach { r =>
      assert(expected(r.getInt(0)) === r.getString(1))
    }
  }

  test("q10 top-k is ordered descending") {
    val rev = CoreQueries.q10TopK(spark, sfDir)
      .select("revenue").collect().map(_.getDouble(0))
    assert(rev.length === 10)
    assert(rev.sameElements(rev.sorted(Ordering[Double].reverse)))
  }

  test("q11 window rank never exceeds 3 and starts at 1 per brand") {
    val df = CoreQueries.q11WindowRank(spark, sfDir)
    val byBrand = df.groupBy("p_brand")
      .agg(min("rank_in_brand").as("mn"), max("rank_in_brand").as("mx"))
      .collect()
    byBrand.foreach { r =>
      assert(r.getAs[Int]("mn") === 1)
      assert(r.getAs[Int]("mx") <= 3)
    }
  }

  test("q13/q14 anti and semi joins partition the F-order space") {
    val cust = Tables.load(spark, sfDir, "customer").count()
    val anti = CoreQueries.q13AntiJoin(spark, sfDir).count()
    val withF = Tables.load(spark, sfDir, "orders")
      .where(col("o_orderstatus") === "F")
      .select("o_custkey").distinct().count()
    assert(anti === cust - withF)
  }
}
