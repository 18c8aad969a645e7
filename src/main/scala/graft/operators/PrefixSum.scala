package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact prefix sum — the two-pass formulation that
  * replaces a single-partition global window at cluster scale.
  *
  * Pass structure:
  *  1. rows are bucketed by RANGE of the leading order key, using
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
  *
  * Multi-column order: `orderCols` are ASCENDING keys whose
  * combination is unique; express DESC by negating the key (exact for
  * the integer/decimal metrics used here). Bucketing uses only the
  * LEADING key, so ties on it stay in one bucket and the cross-bucket
  * order is preserved; heavy leading-key skew degrades balance, not
  * correctness.
  */
object PrefixSum {

  /** Add `outCol` = exclusive prefix sum of `valueCol` over the total
    * order of unique `orderCol`. `buckets` bounds driver state and
    * per-bucket sort size. */
  def exclusive(df: DataFrame, orderCol: String, valueCol: String,
      outCol: String, buckets: Int = 32): DataFrame =
    exclusiveCols(df, Seq(col(orderCol)), valueCol, outCol, buckets)

  /** Multi-key form: exclusive prefix sum over the total order of the
    * (unique, ascending) `orderCols` tuple. The leading key must be
    * castable to double — only bucket ASSIGNMENT uses the cast, and
    * any monotone bucketing is correct; within-bucket ordering uses
    * the typed columns themselves. */
  def exclusiveCols(df: DataFrame, orderCols: Seq[Column],
      valueCol: String, outCol: String, buckets: Int = 32): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    val keyed = df.withColumn("_bkey", orderCols.head.cast("double"))
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val boundaries = keyed
      .select(col("_bkey").as("_k"))
      .stat.approxQuantile("_k", probs, 0.001)
      .distinct.sorted
    // monotone bucket id: number of boundaries at or below the key
    val bucket: Column = boundaries.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col("_bkey") >= lit(b), 1).otherwise(0)
    }
    val bucketed = keyed.withColumn("_bkt", bucket)

    val w = Window.partitionBy(col("_bkt")).orderBy(orderCols.map(_.asc): _*)
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
      .drop("_bkey", "_bkt", "_local", "_off")
  }

  /** Exact NTILE(k) over the total order of a UNIQUE `orderCol`,
    * WITHOUT the single-partition global window — see [[rankNtile]]. */
  def ntile(df: DataFrame, orderCol: String, k: Int, outCol: String,
      buckets: Int = 32): DataFrame =
    rankNtile(df, Seq(col(orderCol)), k, None, outCol, buckets)

  /** Multi-key NTILE; DESC keys are passed negated (see object doc). */
  def ntileCols(df: DataFrame, orderCols: Seq[Column], k: Int,
      outCol: String, buckets: Int = 32): DataFrame =
    rankNtile(df, orderCols, k, None, outCol, buckets)

  /** rank (= ROW_NUMBER, 1-based, optional) and NTILE(k) over the
    * total order of the unique ascending `orderCols` tuple, from ONE
    * bucketed prefix-count pass: rank = exclusive prefix COUNT + 1,
    * tile = pure integer arithmetic on the rank (the first n%k tiles
    * hold ⌈n/k⌉ rows, the rest ⌊n/k⌋ — SQL NTILE's exact fill rule).
    * Bit-identical to `row_number()/ntile(k) over (order by ...)`,
    * spec-pinned; the cost is one range-ish shuffle + bucket-local
    * sorts instead of "the table through one task". */
  def rankNtile(df: DataFrame, orderCols: Seq[Column], k: Int,
      rankCol: Option[String], tileCol: String,
      buckets: Int = 32): DataFrame = {
    val n = df.count()
    val q = n / k
    val rem = n % k
    val cut = (q + 1) * rem // ranks 1..cut land in the ⌈n/k⌉-sized tiles
    val ranked = exclusiveCols(df.withColumn("_one", lit(1L)),
      orderCols, "_one", "_rank0", buckets)
      .withColumn("_rank", col("_rank0") + 1)
    val tile =
      if (q == 0) col("_rank") // n < k: tile i holds exactly row of rank i
      else when(col("_rank") <= cut,
        expr(s"(_rank - 1) DIV ${q + 1}") + 1)
        .otherwise(lit(rem) + expr(s"(_rank - 1 - $cut) DIV $q") + 1)
    val out = ranked.withColumn(tileCol, tile.cast("int"))
    rankCol.fold(out.drop("_one", "_rank0", "_rank")) { rc =>
      out.withColumn(rc, col("_rank").cast("int"))
        .drop("_one", "_rank0", "_rank")
    }
  }
}
