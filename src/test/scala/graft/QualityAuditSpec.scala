package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Graph, Profiling, Stats}

/** Invariant specs for q148–q150 (FK integrity audit, CUSUM
  * changepoint, two-hop co-purchase recommendations). */
class QualityAuditSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  test("q148 audits every FK edge with child totals matching the " +
      "tables and no false orphans on the consistent testdata") {
    val got = Profiling.q148FkIntegrity(spark, sfDir).collect()
    assert(got.length === 8)
    val byFk = got.map(r => r.getAs[String]("fk") -> r).toMap
    val nLineitem = Tables.load(spark, sfDir, "lineitem").count()
    val nOrders = Tables.load(spark, sfDir, "orders").count()
    val nEvents = Tables.load(spark, sfDir, "events").count()
    assert(byFk("lineitem.l_orderkey->orders")
      .getAs[Long]("n_child") === nLineitem)
    assert(byFk("lineitem.l_partkey->part")
      .getAs[Long]("n_child") === nLineitem)
    assert(byFk("orders.o_custkey->customer")
      .getAs[Long]("n_child") === nOrders)
    assert(byFk("events.user_id->customer")
      .getAs[Long]("n_child") === nEvents)
    got.foreach { r =>
      val orows = r.getAs[Long]("n_orphan_rows")
      val okeys = r.getAs[Long]("n_orphan_keys")
      assert(okeys <= orows)
      // driver-generated testdata is referentially consistent
      assert(orows === 0L, s"unexpected orphans in ${r.getAs[String]("fk")}")
    }
  }

  test("q149 changepoint maximizes |cusum| against a driver-side " +
      "recomputation of each region's monthly series") {
    val got = Stats.q149CusumChangepoint(spark, sfDir).collect()
    assert(got.length === 5)
    // recompute one region's series brute-force
    val r0 = got.head.getAs[String]("r_name")
    val monthly = Tables.load(spark, sfDir, "orders")
      .join(Tables.load(spark, sfDir, "customer"),
        $"o_custkey" === $"c_custkey")
      .join(Tables.load(spark, sfDir, "nation"),
        $"c_nationkey" === $"n_nationkey")
      .join(Tables.load(spark, sfDir, "region"),
        $"n_regionkey" === $"r_regionkey")
      .where($"r_name" === r0)
      .groupBy(trunc($"o_orderdate".cast("date"), "month").as("mon"))
      .agg(sum($"o_totalprice".cast("decimal(18,4)")).as("rev"))
      .orderBy($"mon")
      .collect()
      .map(r => (r.getAs[java.sql.Date]("mon"),
        r.getAs[java.math.BigDecimal]("rev").doubleValue()))
    val mean = monthly.map(_._2).sum / monthly.length
    var run = 0.0
    val cusums = monthly.map { case (m, v) => run += v; (m, run - 0.0) }
      .zipWithIndex.map { case ((m, r), i) => (m, r - (i + 1) * mean) }
    val (bestM, bestC) = cusums.maxBy { case (_, c) => math.abs(c) }
    val row = got.head
    assert(row.getAs[Long]("n_months") === monthly.length.toLong)
    assert(row.getAs[java.sql.Date]("cp_month") === bestM)
    // driver recompute accumulates doubles vs the engine's exact
    // DECIMAL running sum — allow float slack, the oracle is the
    // bit-exactness check
    assert(math.abs(row.getAs[Double]("cusum_at_cp") - bestC)
      <= 1e-4 * math.max(1.0, math.abs(bestC)))
  }

  test("q150 recommends only unseen parts, ranks are dense per " +
      "customer, and every score clears the support floor") {
    val got = Graph.q150CopurchaseRecs(spark, sfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Long]("o_custkey") % 100 === 7L)
      assert(r.getAs[Long]("score") >= 2L)
      assert(r.getAs[Long]("n_paths") >= 1L)
    }
    // dense 1..k ranks per customer
    got.groupBy(_.getAs[Long]("o_custkey")).foreach { case (_, rows) =>
      val ranks = rows.map(_.getAs[Int]("rec_rank")).sorted
      assert(ranks.toSeq === (1 to ranks.length))
      assert(ranks.length <= 5)
    }
    // no recommended part already in the customer's basket
    val basket = Tables.load(spark, sfDir, "orders")
      .join(Tables.load(spark, sfDir, "lineitem"),
        $"o_orderkey" === $"l_orderkey")
      .select($"o_custkey", $"l_partkey").distinct()
      .collect()
      .map(r => (r.getAs[Long]("o_custkey"), r.getAs[Long]("l_partkey")))
      .toSet
    got.foreach { r =>
      val pair = (r.getAs[Long]("o_custkey"), r.getAs[Long]("rec_partkey"))
      assert(!basket.contains(pair), s"recommended an owned part: $pair")
    }
  }
}
