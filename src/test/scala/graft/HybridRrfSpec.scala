package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextQueries

/** q172 hybrid RRF — leg consistency and a driver-side recomputation
  * of the semantic leg and the fusion arithmetic. */
class HybridRrfSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  private lazy val rows = TextQueries.q172HybridRrf(spark, sfDir).collect()
    .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("rank"),
      r.getAs[Double]("rrf_score"), r.getAs[Int]("rank_lex"),
      r.getAs[Int]("rank_sem")))

  test("q172 fused score IS the RRF identity over its reported leg ranks") {
    assert(rows.length === TextQueries.RrfTopK)
    rows.foreach { case (doc, _, score, rl, rs) =>
      val expected =
        (if (rl > 0) 1.0 / (TextQueries.RrfK + rl) else 0.0) +
          (if (rs > 0) 1.0 / (TextQueries.RrfK + rs) else 0.0)
      val r9 = BigDecimal(expected)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(score === r9, s"doc $doc")
      assert(rl > 0 || rs > 0, s"doc $doc retrieved by neither leg")
    }
    // ranks are a contiguous 1..K ordered by (score desc, doc_id asc)
    val sorted = rows.sortBy { case (doc, _, score, _, _) => (-score, doc) }
    assert(sorted.map(_._2).toSeq === (1 to TextQueries.RrfTopK))
  }

  test("q172 lexical ranks agree with q83's BM25 ranking") {
    val q83 = TextQueries.q83Bm25(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("rank")).toMap
    rows.filter { case (_, _, _, rl, _) => rl > 0 && rl <= 20 }
      .foreach { case (doc, _, _, rl, _) =>
        assert(q83.get(doc).contains(rl), s"doc $doc lex rank $rl")
      }
  }

  test("q172 semantic ranks equal a driver-side PRF cosine recomputation") {
    def dot(a: Seq[Double], b: Seq[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map { r =>
        r.getAs[Long]("vec_id") ->
          r.getAs[scala.collection.Seq[Float]]("embedding")
            .map(_.toDouble).toSeq
      }.toMap
    val top3 = TextQueries.q83Bm25(spark, sfDir).collect()
      .filter(_.getAs[Int]("rank") <= TextQueries.RrfPrfDocs)
      .sortBy(_.getAs[Int]("rank"))
      .map(r => emb(r.getAs[Long]("doc_id")))
    val cent = (0 until 64).map(j => (top3(0)(j) + top3(1)(j) + top3(2)(j)) / 3.0)
    val cnorm = math.sqrt(cent.map(x => x * x).sum)
    val semRank = emb.toSeq.map { case (id, v) =>
      (id, dot(v, cent) / (math.sqrt(dot(v, v)) * cnorm))
    }.sortBy { case (id, c) => (-c, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap
    rows.filter(_._5 > 0).foreach { case (doc, _, _, _, rs) =>
      assert(semRank.get(doc).contains(rs), s"doc $doc sem rank $rs")
    }
  }
}
