package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an array<double> embedding column —
  * the trainer behind a real IVF index (q34 stubs its centroids with
  * the lowest vec_ids; this is the production "train" step).
  *
  * Per iteration: ONE pass over the corpus — centroids broadcast
  * (they're k·dim doubles, kilobytes), each vector computes its argmin
  * centroid in a codegen'd expression chain, then a single shuffle
  * aggregates per-centroid dimension sums via `aggregate` on arrays.
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

    val data = vecs.select(col("id"), col("v")).persist()
    var centroids: Array[(Int, Array[Double])] = data
      .orderBy(col("id")).limit(k)
      .select(col("id"), col("v")).as[(Long, Seq[Double])]
      .collect().zipWithIndex
      .map { case ((_, v), i) => (i, v.toArray) }
    var inertia = Double.MaxValue

    val dim = centroids.head._2.length
    for (_ <- 0 until iters) {
      val assigned = assign(data, centroids)
      // Per-centroid per-dimension sums via posexplode: ONE shuffle of
      // corpus×dim skinny rows with map-side partial aggregation, k·dim
      // rows out — bounded driver state (vs collect_list, whose
      // per-group lists grow with the corpus). dist2 contributes to the
      // SSE only from dimension 0 so one aggregate carries both.
      val stats = assigned
        .select(col("cent_id"), col("dist2"),
          posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cent_id"), col("pos"))
        .agg(
          sum(col("x")).as("xsum"),
          count(lit(1)).as("n"),
          sum(when(col("pos") === 0, col("dist2")).otherwise(lit(0.0)))
            .as("sse_part"))
        .as[(Int, Int, Double, Long, Double)]
        .collect()
      inertia = stats.map(_._5).sum
      val byCent = stats.groupBy(_._1)
      centroids = centroids.map { case (cid, old) =>
        byCent.get(cid) match {
          case Some(rows) =>
            val mean = new Array[Double](dim)
            rows.foreach { case (_, pos, xsum, n, _) =>
              mean(pos) = xsum / n
            }
            (cid, mean)
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
