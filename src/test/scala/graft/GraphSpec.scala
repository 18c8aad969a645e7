package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Graph

/** q101 PageRank must equal a driver-side reference power iteration
  * (same floored micro-unit contributions) exactly, and behave like
  * PageRank: mass conserved up to floor truncation, hubs ranked up. */
class GraphSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  private lazy val edges: Seq[(Long, Long)] = {
    val items = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    items.groupBy(_._1).values.flatMap { grp =>
      val ps = grp.map(_._2).distinct.toSeq
      for (a <- ps; b <- ps if a != b) yield (a, b)
    }.toSeq.distinct
  }

  private def referenceRanks: Map[Long, Double] = {
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size }
    val nodes = deg.keys.toSeq.sorted
    val n = nodes.size
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to Graph.Iterations) {
      val contrib = new scala.collection.mutable.HashMap[Long, Long]()
        .withDefaultValue(0L)
      edges.foreach { case (s, d) =>
        contrib(d) += math.floor(r(s) / deg(s) * 1e12).toLong
      }
      r = nodes.map(v =>
        v -> (Graph.Teleport / n + Graph.Damping * (contrib(v) / 1e12)))
        .toMap
    }
    r
  }

  test("q101 equals the driver-side reference iteration bit-for-bit " +
      "on the top-25") {
    val got = Graph.q101Pagerank(spark, sfDir).collect()
    assert(got.length === Graph.TopN)
    val ref = referenceRanks
    val refTop = ref.toSeq
      .map { case (v, r) =>
        (v, BigDecimal(r * 1e6).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .sortBy { case (v, ppm) => (-ppm, v) }
      .take(Graph.TopN)
    got.zip(refTop).foreach { case (row, (v, ppm)) =>
      assert(row.getAs[Long]("part") === v)
      assert(row.getAs[Double]("rank_ppm") === ppm)
    }
  }

  test("rank mass is conserved up to floor truncation") {
    val ref = referenceRanks
    val total = ref.values.sum
    // each floored edge contribution loses < 1e-12; three iterations
    // over |E| edges bound the loss
    val bound = 3.0 * edges.size * 1e-12 * Graph.Damping + 1e-9
    assert(total <= 1.0 + 1e-9 && total >= 1.0 - bound,
      s"mass $total outside [1 - $bound, 1]")
  }
}
