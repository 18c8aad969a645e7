package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  test("dot and norm match hand-computed values") {
    val df = Seq((Seq(1.0, 2.0, 2.0), Seq(3.0, 0.0, 4.0))).toDF("a", "b")
    val r = df.select(
      Similarity.dot($"a", $"b").as("d"),
      Similarity.norm($"a").as("na"),
      Similarity.norm($"b").as("nb")).head()
    assert(r.getDouble(0) === 11.0)
    assert(r.getDouble(1) === 3.0)
    assert(r.getDouble(2) === 5.0)
  }

  test("brute-force knn returns 5 ranked neighbors per query") {
    val df = Similarity.q23KnnBruteForce(spark, sfDir)
    val perQuery = df.groupBy("query_id").count().collect()
    assert(perQuery.length === 10)
    perQuery.foreach(r => assert(r.getLong(1) === 5L))
    // ranks are 1..5, cosine non-increasing within a query
    val q0 = df.where($"query_id" === 0).orderBy("rank")
      .select("cosine").collect().map(_.getDouble(0))
    assert(q0.sameElements(q0.sorted(Ordering[Double].reverse)))
  }

  test("ANN results are a subset of the same-bucket brute-force scores") {
    val ann = Similarity.q24AnnLsh(spark, sfDir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.q23KnnBruteForce(spark, sfDir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // sanity: ANN produced something and every pair is a real vector pair
    assert(ann.nonEmpty)
    assert(ann.forall { case (q, n) => q != n })
    // recall over the sf0.001 corpus should be non-trivial
    val recall = ann.intersect(exact).size.toDouble / exact.size
    assert(recall > 0.2, s"suspiciously low ANN recall: $recall")
  }

  test("multimodal mapPartitions decode keeps ids and is deterministic") {
    val media = graft.multimodal.Multimodal.documentsAsMedia(spark, sfDir)
    val decoded = graft.multimodal.Multimodal
      .withDecodedMeta(media, "media_id", "content")
    assert(decoded.count() === media.count())
    val twice = graft.multimodal.Multimodal
      .withDecodedMeta(media, "media_id", "content")
    assert(decoded.orderBy("media_id").collect()
      .sameElements(twice.orderBy("media_id").collect()))
  }

  test("q105 correlation audit: upper triangle only, corr bounded, " +
      "ranked by |corr| descending") {
    val rows = graft.operators.Similarity
      .q105CorrelationAudit(spark, TestSpark.sfDir).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      assert(r.getAs[Int]("dim_i") < r.getAs[Int]("dim_j"))
      assert(math.abs(r.getAs[Double]("corr")) <= 1.0 + 1e-9)
    }
    // descending by |corr|
    val cs = rows.map(r => math.abs(r.getAs[Double]("corr"))).toSeq
    assert(cs === cs.sorted.reverse)
  }

  test("q110 outliers: ranked by distance descending and the top row " +
      "matches a driver-side recomputation") {
    val rows = graft.operators.Similarity
      .q110EmbeddingOutliers(spark, TestSpark.sfDir).collect()
    assert(rows.length === 50)
    val ds = rows.map(_.getAs[Double]("dist2")).toSeq
    assert(ds.forall(_ >= 0.0))
    assert(ds === ds.sorted.reverse)
    // driver-side recomputation of the top outlier's distance
    val top = rows.head
    val all = Tables.load(spark, TestSpark.sfDir, "embeddings")
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    val mine = all.filter(_._2 == top.getAs[Int]("label")).map(_._3)
    val cd = Array.tabulate(mine.head.length)(d =>
      mine.map(_(d)).sum / mine.length)
    val x = all.find(_._1 == top.getAs[Long]("vec_id")).get._3
    val d2 = x.zip(cd).map { case (a, c) => (a - c) * (a - c) }.sum
    assert(math.abs(d2 - top.getAs[Double]("dist2")) < 1e-6)
  }
}
