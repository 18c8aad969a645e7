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

    // Lloyd's loop runs 1 + `iters` tiny-output jobs back to back, so
    // per-job OVERHEAD — not arithmetic — is what training time is made
    // of. Two session knobs are scoped to the loop and restored after:
    //  - AQE off: every iteration's aggregate has a FIXED shape with a
    //    ≤k-row output; AQE's per-iteration query-stage barrier +
    //    re-optimization buys nothing for it at any scale and costs a
    //    scheduling round trip per pass.
    //  - shuffle.partitions = k: the reduce side holds at most k keys
    //    (k·(dim+2) doubles total); more reducers than keys is pure
    //    task-launch waste, again at any corpus size.
    val aqeKey = "spark.sql.adaptive.enabled"
    val shufKey = "spark.sql.shuffle.partitions"
    val aqeWas = spark.conf.get(aqeKey, "true")
    val shufWas = spark.conf.get(shufKey, "200")
    spark.conf.set(aqeKey, "false")
    spark.conf.set(shufKey, k.toString)
    // The init job below (per-partition TakeOrdered over EVERY input
    // partition) doubles as the cache materializer: after it, every
    // Lloyd pass hits memory, never the source — no separate count()
    // job needed. Unpersisted in the finally: a failed iteration must
    // not leave the corpus projection pinned in storage memory.
    val data = vecs.select(col("id"), col("v")).persist()
    try {
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
      Model(centroids, inertia)
    } finally {
      data.unpersist()
      spark.conf.set(aqeKey, aqeWas)
      spark.conf.set(shufKey, shufWas)
    }
  }

  /** Assign each vector to its nearest centroid (squared L2), ties to
    * the lowest centroid id. Pure expression work against broadcast
    * literals — the corpus does not shuffle. Distances use the
    * ‖v−c‖² = ‖v‖² − 2·v·c + ‖c‖² identity so the per-centroid work is
    * ONE fused codegen'd dot product (VectorMath.DotProduct) instead of
    * an interpreted zip_with+aggregate pair that allocates a difference
    * array per (row, centroid) — at k=64 that's 64 allocations per row
    * gone from the training hot loop.
    *
    * EVERY centroid-dependent number lives inside an ArrayType literal:
    * codegen emits array literals as `references[i]` lookups, while a
    * scalar `lit(‖c‖²)` would be inlined into the generated SOURCE — so
    * the scalar form produces different source each Lloyd pass (fresh
    * centroid values), misses the codegen cache, and pays a Janino
    * recompile per iteration, which DOMINATES training at bench scale.
    * Folding ‖c‖² into the array as c ++ [−‖c‖²/2] against v ++ [1]
    * (dist2 = ‖v‖² − 2·dot(v∥1, c∥−‖c‖²/2)) keeps the source
    * byte-identical across iterations: every pass is a cache hit. */
  def assign(vecs: DataFrame,
      centroids: Array[(Int, Array[Double])]): DataFrame = {
    import graft.functions.VectorMath.dotProduct
    val dists = centroids.map { case (cid, cv) =>
      val cExt = typedLit((cv :+ (-cv.map(x => x * x).sum / 2)).toSeq)
      struct(
        (col("__vn2") - lit(2.0) * dotProduct(col("__v1"), cExt))
          .as("dist2"),
        lit(cid).as("cent_id"))
    }
    vecs
      .withColumn("__vn2", dotProduct(col("v"), col("v")))
      .withColumn("__v1", array_append(col("v"), lit(1.0)))
      .withColumn("best", least(dists: _*))
      .select(col("id"), col("v"),
        col("best.cent_id").as("cent_id"), col("best.dist2").as("dist2"))
  }
}
