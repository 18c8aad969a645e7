package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Range (interval) join — a fact value joined into [lo, hi) intervals
  * with NO equi-key. Spark's default plan for a pure inequality join is
  * BroadcastNestedLoopJoin: every fact row is tested against every
  * interval, O(|fact|·|intervals|) comparisons — fine at 5 intervals,
  * hopeless at 10^5 (and a full cartesian shuffle if the interval side
  * ever outgrows the broadcast threshold).
  *
  * The scale path implemented here rewrites the range join as an
  * EQUI-join on a derived bin id: each interval is replicated onto every
  * fixed-width bin it overlaps (interval side only — it's the small,
  * static side), the fact computes its bin with one codegen'd floor
  * division (no replication of the big side), and a residual [lo, hi)
  * filter removes edge false-positives. Cost: |fact| hash probes against
  * a broadcast of |intervals|·avg_bins_spanned rows — linear in the fact,
  * and the fact is never shuffled. The same rewrite handles interval
  * containment at any scale by picking binWidth near the median interval
  * width.
  */
object RangeJoin {

  /** Equi-join rewrite of `fact.value in [intervals.lo, intervals.hi)`.
    * `intervals` carries lo/hi plus any payload columns. */
  def binned(fact: DataFrame, valueCol: String, intervals: DataFrame,
             lo: String, hi: String, binWidth: Double): DataFrame = {
    // Replicate each interval onto bins floor(lo/w) .. last bin whose
    // start is < hi; ceil(hi/w)-1 covers both the aligned and unaligned
    // hi cases because the interval is half-open.
    val binned = intervals.withColumn("__bin",
      explode(sequence(
        floor(col(lo) / binWidth).cast("long"),
        (ceil(col(hi) / binWidth).cast("long") - 1))))
    fact
      .withColumn("__bin", floor(col(valueCol) / binWidth).cast("long"))
      .join(broadcast(binned), Seq("__bin"))
      .where(col(valueCol) >= col(lo) && col(valueCol) < col(hi))
      .drop("__bin")
  }

  /** The irregular price bands q38 buckets orders into (in-code interval
    * dimension; the widths deliberately differ from the bin width so every
    * band spans multiple bins and the residual filter does real work). */
  val priceBands: Seq[(String, Double, Double)] = Seq(
    ("p00_micro", 0.0, 25000.0),
    ("p01_small", 25000.0, 75000.0),
    ("p02_medium", 75000.0, 150000.0),
    ("p03_large", 150000.0, 300000.0),
    ("p04_jumbo", 300000.0, 500000.0))

  /** q38 — non-equi range join: orders bucketed into irregular price
    * bands via the binned equi-join rewrite, then the usual money
    * aggregate per band. */
  def q38RangeJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = Tables.load(s, dir, "orders")
    val bands = priceBands.toDF("band", "lo", "hi")
    binned(orders, "o_totalprice", bands, "lo", "hi", binWidth = 20000.0)
      .groupBy(col("band"), col("lo"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        round(sum(col("o_totalprice").cast("decimal(18,4)")).cast("double"), 2)
          .as("total_amount"))
  }
}
