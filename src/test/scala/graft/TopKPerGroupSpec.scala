package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.TopKPerGroup

/** The custom bounded-heap top-k-per-group operator must be
  * result-identical to the window row_number formulation (for any k and
  * any total order) and must plan as partial → one exchange → final
  * with no sort of whole groups.
  */
class TopKPerGroupSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  private def windowTopK(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(orderCols.map { case (c, asc) =>
        if (asc) col(c).asc else col(c).desc }: _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k).drop("__rn")
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|"))
      .toSeq.sorted

  test("matches the window formulation on orders for k = 1, 3, 8") {
    val ord = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"),
        col("o_custkey"), col("o_totalprice"))
    val group = Seq("o_orderpriority")
    val order = Seq("o_totalprice" -> false, "o_orderkey" -> true)
    for (k <- Seq(1, 3, 8)) {
      val got = sortedRows(TopKPerGroup(ord, group, order, k))
      val exp = sortedRows(windowTopK(ord, group, order, k))
      assert(got === exp, s"mismatch at k=$k")
    }
  }

  test("matches the window formulation on a two-column group with " +
      "ascending order and groups smaller than k") {
    val li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus"),
        col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    val group = Seq("l_returnflag", "l_linestatus")
    val order = Seq("l_extendedprice" -> true, "l_orderkey" -> true,
      "l_linenumber" -> true)
    val got = sortedRows(TopKPerGroup(li, group, order, 5))
    val exp = sortedRows(windowTopK(li, group, order, 5))
    assert(got === exp)
    // k far beyond every group size degenerates to the full table
    val all = sortedRows(TopKPerGroup(li, group, order, 1000000))
    assert(all.size === li.count())
  }

  test("plans as partial and final TopKPerGroupExec around ONE " +
      "exchange, with no per-group sort") {
    val ord = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"),
        col("o_totalprice"))
    val df = TopKPerGroup(ord, Seq("o_orderpriority"),
      Seq("o_totalprice" -> false, "o_orderkey" -> true), 3)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the exec node prints without its Exec suffix
    assert("TopKPerGroup \\[".r.findAllIn(p).length === 2,
      s"expected partial+final exec:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 1,
      s"exactly one exchange between the phases:\n$p")
    assert(!p.contains("Sort ["), s"no sort belongs in this plan:\n$p")
    assert(!p.contains("Window"), s"no window belongs in this plan:\n$p")
  }

  test("property: matches the window formulation on random data with " +
      "nulls, duplicate keys, and skewed groups") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    val rowGen = for {
      g <- Gen.chooseNum(0, 4)
      v <- Gen.option(Gen.chooseNum(-50, 50))
      id <- Gen.chooseNum(0L, 1000000L)
    } yield (g, v.map(Integer.valueOf).orNull, id)
    for (seed <- 1 to 5) {
      val rows = (1 to 400).flatMap(i =>
        rowGen.apply(Gen.Parameters.default, Seed(seed * 10000L + i)))
      // unique tiebreak id so the order is total
      val df = rows.zipWithIndex
        .map { case ((g, v, id), i) => (g, Option(v).map(_.toInt), i.toLong) }
        .toDF("g", "v", "id")
      val group = Seq("g")
      val order = Seq("v" -> false, "id" -> true)
      for (k <- Seq(1, 4)) {
        val got = sortedRows(TopKPerGroup(df, group, order, k))
        val exp = sortedRows(windowTopK(df, group, order, k))
        assert(got === exp, s"seed=$seed k=$k")
      }
    }
  }

  test("q103 supplier top-k returns <= 3 winners per nation in rank " +
      "order with positive revenue") {
    val rows = graft.operators.Analytics.q103SupplierTopk(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val byNation = rows.groupBy(_.getAs[String]("n_name"))
    byNation.foreach { case (_, g) =>
      assert(g.length <= 3)
      g.foreach(r => assert(r.getAs[Double]("revenue") > 0.0))
    }
  }

  test("q97 returns exactly 3 deterministic winners per priority") {
    val rows = graft.operators.Analytics.q97TopkPerGroup(spark, sfDir)
      .collect()
    val byPrio = rows.groupBy(_.getAs[String]("o_orderpriority"))
    assert(byPrio.size === 5)
    byPrio.foreach { case (_, g) =>
      assert(g.length === 3)
      val prices = g.map(_.getAs[Double]("o_totalprice")).sorted.reverse
      assert(prices.head >= prices.last)
    }
  }
}
