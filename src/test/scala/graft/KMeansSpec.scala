package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.KMeans

class KMeansSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  private def vecs = Tables.load(spark, sfDir, "embeddings")
    .select(col("vec_id").as("id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))

  test("kmeans recovers three well-separated synthetic clusters") {
    val pts = (
      Seq.tabulate(20)(i => (i.toLong, Array(0.0 + i * 0.01, 0.0))) ++
      Seq.tabulate(20)(i => (100L + i, Array(10.0 + i * 0.01, 10.0))) ++
      Seq.tabulate(20)(i => (200L + i, Array(-10.0, 5.0 + i * 0.01))))
      .toDF("id", "v")
    val model = KMeans.fit(pts, k = 3, iters = 5)
    val assigned = KMeans.assign(pts, model.centroids)
      .select("id", "cent_id").as[(Long, Int)].collect()
    val groups = assigned.groupBy(_._1 / 100).view.mapValues(_.map(_._2).toSet)
    // every synthetic cluster maps to exactly one centroid, all distinct
    assert(groups.values.forall(_.size == 1))
    assert(groups.values.flatten.toSet.size === 3)
  }

  test("inertia is non-increasing across iterations (Lloyd invariant)") {
    val inertias = (1 to 4).map(i => KMeans.fit(vecs, k = 8, iters = i).inertia)
    inertias.zip(inertias.tail).foreach { case (a, b) =>
      assert(b <= a + 1e-6, s"inertia rose: $inertias")
    }
  }

  test("training is deterministic under repartitioning") {
    val a = KMeans.fit(vecs, k = 4, iters = 3)
    val b = KMeans.fit(vecs.repartition(13), k = 4, iters = 3)
    // centroid means come from per-dimension double sums whose shuffle
    // order varies -> compare within tolerance
    a.centroids.zip(b.centroids).foreach { case ((ida, va), (idb, vb)) =>
      assert(ida === idb)
      va.zip(vb).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9) }
    }
  }

  test("assignment ties break to the lowest centroid id") {
    val pts = Seq((1L, Array(0.0, 0.0))).toDF("id", "v")
    val cents = Array((0, Array(1.0, 0.0)), (1, Array(-1.0, 0.0)))
    val got = KMeans.assign(pts, cents).select("cent_id").as[Int].head()
    assert(got === 0)
  }
}
