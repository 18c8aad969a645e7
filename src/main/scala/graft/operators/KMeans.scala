package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an array<double> embedding column —
  * the trainer behind a real IVF index (q34 stubs its centroids with
  * the lowest vec_ids; this is the production "train" step).
  *
  * Per iteration: ONE pass over the cached corpus — centroids broadcast
  * (they're k·dim doubles, kilobytes), each vector computes its argmin
  * centroid in a codegen'd expression chain, then a single k-keyed
  * shuffle aggregates per-centroid per-dimension sums as a wide
  * HashAggregate buffer (map-side partials; partitions×k rows move).
  * No corpus materialization between iterations, no driver-side data
  * loops (the driver only holds the k centroids, like a broadcast
  * join's build side).
  *
  * Deterministic init (the k lowest-id vectors) and tie-breaking (ties
  * to the lowest centroid id); centroid means are double sums whose
  * shuffle order varies, so different partitionings agree to ~1e-12
  * relative rather than bit-identically (spec-asserted).
  */
object KMeans {

  case class Model(centroids: Array[(Int, Array[Double])], inertia: Double)

  /** Train on `vecs` (columns: id long, v array<double>). */
  def fit(vecs: DataFrame, k: Int, iters: Int): Model = {
    val spark = vecs.sparkSession
    import spark.implicits._

    // Materialize the cache BEFORE the loop: every Lloyd pass must hit
    // memory, never the parquet source; without the eager count the
    // first pass pays the scan inside the training timing.
    val data = vecs.select(col("id"), col("v")).persist()
    data.count()
    var centroids: Array[(Int, Array[Double])] = data
      .orderBy(col("id")).limit(k)
      .select(col("id"), col("v")).as[(Long, Seq[Double])]
      .collect().zipWithIndex
      .map { case ((_, v), i) => (i, v.toArray) }
    var inertia = Double.MaxValue

    val dim = centroids.head._2.length
    for (_ <- 0 until iters) {
      val assigned = assign(data, centroids)
      // Per-centroid per-dimension sums as `dim` scalar aggregates over
      // CORPUS rows — no posexplode: exploding to corpus×dim skinny
      // rows multiplied the rows the aggregate hashes (and the
      // group-by key cardinality) by the dimension count for zero
      // information gain. A wide HashAggregate buffer (k rows × dim+2
      // doubles) with map-side partial aggregation shuffles only
      // partitions×k rows; the driver still holds k·(dim+2) doubles.
      val aggCols = (0 until dim).map(i => sum(col("v")(i)).as(s"s$i")) ++
        Seq(count(lit(1)).as("n"), sum(col("dist2")).as("sse"))
      val stats = assigned
        .groupBy(col("cent_id"))
        .agg(aggCols.head, aggCols.tail: _*)
        .collect()
      inertia = stats.map(_.getAs[Double]("sse")).sum
      val byCent = stats.map(r => r.getAs[Int]("cent_id") -> r).toMap
      centroids = centroids.map { case (cid, old) =>
        byCent.get(cid) match {
          case Some(r) =>
            val n = r.getAs[Long]("n")
            (cid, Array.tabulate(dim)(i => r.getDouble(1 + i) / n))
          case None => (cid, old) // empty cell keeps its centroid
        }
      }
    }
    data.unpersist()
    Model(centroids, inertia)
  }

  /** Assign each vector to its nearest centroid (squared L2), ties to
    * the lowest centroid id. Pure expression work against broadcast
    * literals — the corpus does not shuffle. Distances use the
    * ‖v−c‖² = ‖v‖² − 2·v·c + ‖c‖² identity so the per-centroid work is
    * ONE fused codegen'd dot product (VectorMath.DotProduct) instead of
    * an interpreted zip_with+aggregate pair that allocates a difference
    * array per (row, centroid) — at k=64 that's 64 allocations per row
    * gone from the training hot loop. ‖v‖² is computed once per row;
    * ‖c‖² folds to a driver-side literal. */
  def assign(vecs: DataFrame,
      centroids: Array[(Int, Array[Double])]): DataFrame = {
    import graft.functions.VectorMath.dotProduct
    val dists = centroids.map { case (cid, cv) =>
      // ONE ArrayType literal per centroid (typedLit), not 64 scalar
      // lit() nodes wrapped in array(): the k×dim scalar form made every
      // Lloyd pass carry a ~1k-node expression tree that Janino
      // recompiled per iteration (fresh literals each pass) and pushed
      // codegen toward the 8K-bytecode fallback cliff.
      val cArr = typedLit(cv.toSeq)
      val cn2 = cv.map(x => x * x).sum
      struct(
        (col("__vn2") - lit(2.0) * dotProduct(col("v"), cArr) + lit(cn2))
          .as("dist2"),
        lit(cid).as("cent_id"))
    }
    vecs
      .withColumn("__vn2", dotProduct(col("v"), col("v")))
      .withColumn("best", least(dists: _*))
      .select(col("id"), col("v"),
        col("best.cent_id").as("cent_id"), col("best.dist2").as("dist2"))
  }
}
