package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact prefix sum — the two-pass formulation that
  * replaces a single-partition global window at cluster scale.
  *
  * Pass structure:
  *  1. rows are bucketed by RANGE of the (unique) order key, using
  *     boundaries from `approxQuantile` — the bucket is a pure,
  *     deterministic function of the key (a codegen'd comparison
  *     chain), NOT of physical partitioning, so the result is
  *     reproducible under any shuffle layout;
  *  2. a per-bucket window computes the local exclusive cumsum (each
  *     bucket sorts locally — the global sort never happens);
  *  3. per-bucket totals (bucket-count rows) collect to the driver,
  *     scan into offsets, and broadcast back as a join.
  *
  * Cost at 100 TB: one range-ish shuffle + one bucket-local sort +
  * a driver array of `buckets` longs — versus the single-partition
  * window's "move the corpus through one task".
  */
object PrefixSum {

  /** Add `outCol` = exclusive prefix sum of `valueCol` over the total
    * order of unique `orderCol`. `buckets` bounds driver state and
    * per-bucket sort size. */
  def exclusive(df: DataFrame, orderCol: String, valueCol: String,
      outCol: String, buckets: Int = 32): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val boundaries = df
      .select(col(orderCol).cast("double").as("_k"))
      .stat.approxQuantile("_k", probs, 0.001)
      .distinct.sorted
    // monotone bucket id: number of boundaries at or below the key
    val bucket: Column = boundaries.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col(orderCol).cast("double") >= lit(b), 1).otherwise(0)
    }
    val bucketed = df.withColumn("_bkt", bucket)

    val w = Window.partitionBy(col("_bkt")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = bucketed.withColumn("_local",
      coalesce(sum(col(valueCol)).over(w), lit(0L)))

    val totals = bucketed
      .groupBy(col("_bkt"))
      .agg(sum(col(valueCol)).as("_t"))
      .as[(Int, Long)].collect().sortBy(_._1)
    val offsets = totals
      .scanLeft((Int.MinValue, 0L)) { case ((_, acc), (b, t)) => (b, acc + t) }
      .init // offset for bucket b = sum of totals of buckets before b
      .zip(totals.map(_._1))
      .map { case ((_, off), b) => (b, off) }
    val offDf = offsets.toSeq.toDF("_bkt", "_off")

    local
      .join(broadcast(offDf), Seq("_bkt"))
      .withColumn(outCol, col("_local") + col("_off"))
      .drop("_bkt", "_local", "_off")
  }

  /** Exact NTILE(k) over the total order of a UNIQUE `orderCol`,
    * WITHOUT the single-partition global window: rank = bucketed
    * exclusive prefix COUNT (+1), tile = pure integer arithmetic on
    * the rank (the first n%k tiles hold ⌈n/k⌉ rows, the rest ⌊n/k⌋ —
    * SQL NTILE's exact fill rule). Bit-identical to
    * `ntile(k).over(Window.orderBy(orderCol))`, spec-pinned; the cost
    * is one range-ish shuffle + bucket-local sorts instead of "the
    * table through one task". */
  def ntile(df: DataFrame, orderCol: String, k: Int, outCol: String,
      buckets: Int = 32): DataFrame = {
    val n = df.count()
    val q = n / k
    val rem = n % k
    val cut = (q + 1) * rem // ranks 1..cut land in the ⌈n/k⌉-sized tiles
    val ranked = exclusive(df.withColumn("_one", lit(1L)),
      orderCol, "_one", "_rank0", buckets)
    val tile =
      if (q == 0) col("_rank") // n < k: tile i holds exactly row of rank i
      else when(col("_rank") <= cut,
        expr(s"(_rank - 1) DIV ${q + 1}") + 1)
        .otherwise(lit(rem) + expr(s"(_rank - 1 - $cut) DIV $q") + 1)
    ranked
      .withColumn("_rank", col("_rank0") + 1)
      .withColumn(outCol, tile.cast("int"))
      .drop("_one", "_rank0", "_rank")
  }
}
