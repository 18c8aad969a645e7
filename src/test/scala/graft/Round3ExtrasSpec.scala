package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Analytics, Graph, Stats}

/** Invariant specs for q145–q147 (interval merge, hourly entropy,
  * triangle counting). */
class Round3ExtrasSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  test("q145 interval merge conserves order counts and bounds island " +
      "coverage by the 7-day window arithmetic") {
    val got = Analytics.q145IntervalMerge(spark, sfDir).collect()
    assert(got.nonEmpty)
    val nOrders = Tables.load(spark, sfDir, "orders").count()
    assert(got.map(_.getAs[Long]("n_orders")).sum === nOrders,
      "per-customer island orders must partition the orders table")
    got.foreach { r =>
      val orders = r.getAs[Long]("n_orders")
      val islands = r.getAs[Long]("n_islands")
      val covered = r.getAs[Long]("covered_days")
      val longest = r.getAs[Int]("longest_island_days")
      assert(islands >= 1L && islands <= orders)
      // every island spans >= 7 days (one window) and <= 7*orders
      assert(covered >= 7L * islands && covered <= 7L * orders)
      assert(longest >= 7 && longest.toLong <= covered)
    }
    // Brute-force the island merge for the heaviest customer.
    val heavy = got.maxBy(_.getAs[Long]("n_orders"))
    val custkey = heavy.getAs[Long]("o_custkey")
    val dates = Tables.load(spark, sfDir, "orders")
      .where($"o_custkey" === custkey)
      .select(to_date($"o_orderdate").as("d"))
      .collect().map(_.getAs[java.sql.Date]("d").toLocalDate)
      .sorted
    var islands = 0
    var covered = 0L
    var curStart = dates.head
    var curEnd = dates.head.plusDays(7)
    for (d <- dates.tail) {
      if (d.isAfter(curEnd)) {
        islands += 1
        covered += java.time.temporal.ChronoUnit.DAYS
          .between(curStart, curEnd)
        curStart = d
        curEnd = d.plusDays(7)
      } else if (d.plusDays(7).isAfter(curEnd)) curEnd = d.plusDays(7)
    }
    islands += 1
    covered += java.time.temporal.ChronoUnit.DAYS.between(curStart, curEnd)
    assert(heavy.getAs[Long]("n_islands") === islands.toLong)
    assert(heavy.getAs[Long]("covered_days") === covered)
  }

  test("q146 entropy is bounded by ln(24), evenness by 1, and the " +
      "histogram conserves the event count") {
    val got = Stats.q146HourlyEntropy(spark, sfDir).collect()
    assert(got.nonEmpty)
    val nEvents = Tables.load(spark, sfDir, "events").count()
    assert(got.map(_.getAs[Long]("n_events")).sum === nEvents)
    got.foreach { r =>
      val h = r.getAs[Double]("entropy_nats")
      val ev = r.getAs[Double]("evenness")
      val active = r.getAs[Long]("n_active_hours")
      assert(active >= 1L && active <= 24L)
      assert(h >= 0.0 && h <= math.log(24.0) + 1e-9)
      assert(ev >= 0.0 && ev <= 1.0 + 1e-9)
      // H <= ln(active hours): uniform over the active support maximizes
      assert(h <= math.log(active.toDouble) + 1e-6)
    }
  }

  test("q147 triangle counts match a brute-force enumeration of the " +
      "support-pruned co-purchase graph") {
    val got = Graph.q147TriangleCount(spark, sfDir).collect()
    assert(got.nonEmpty)
    // Brute force: rebuild edges (pairs co-ordered >= 2 times), count
    // triangles per vertex.
    val items = Tables.load(spark, sfDir, "lineitem")
      .select($"l_orderkey", $"l_partkey").distinct().collect()
      .map(r => (r.getAs[Long]("l_orderkey"), r.getAs[Long]("l_partkey")))
      .groupBy(_._1).values.map(_.map(_._2).distinct.sorted)
    val pairCounts = scala.collection.mutable.Map.empty[(Long, Long), Int]
    items.foreach { parts =>
      for (i <- parts.indices; j <- (i + 1) until parts.length)
        pairCounts((parts(i), parts(j))) =
          pairCounts.getOrElse((parts(i), parts(j)), 0) + 1
    }
    // NB: .collect on a Map with tuple results would rebuild a Map and
    // collapse edges sharing p1 — filter + keySet keeps every edge.
    val edges = pairCounts.filter(_._2 >= 2).keys.toSet
    val adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val triCount = scala.collection.mutable.Map.empty[Long, Long]
    edges.foreach { case (a, b) =>
      adj(a).intersect(adj(b)).filter(c => c > b).foreach { c =>
        Seq(a, b, c).foreach(v =>
          triCount(v) = triCount.getOrElse(v, 0L) + 1L)
      }
    }
    val degree = adj.map { case (k, v) => k -> v.size.toLong }
    got.foreach { r =>
      val p = r.getAs[Long]("part")
      assert(r.getAs[Long]("n_triangles") === triCount.getOrElse(p, 0L),
        s"triangle count mismatch for part $p")
      assert(r.getAs[Long]("degree") === degree.getOrElse(p, 0L))
    }
    // the result is the global top-25 by triangle count
    val want = triCount.toSeq.map { case (p, n) => (n, degree(p), p) }
      .sortBy { case (n, d, p) => (-n, -d, p) }.take(got.length)
      .map(_._3)
    assert(got.map(_.getAs[Long]("part")).toSeq === want)
  }
}
