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
      valueCol: String, outCol: String, buckets: Int = 32): DataFrame =
    exclusiveColsTotal(df, orderCols, valueCol, outCol, buckets)._1

  /** [[exclusiveCols]] plus the grand total of `valueCol`, read off the
    * already-collected bucket totals — callers that need n (rankNtile)
    * get it for free instead of paying a separate count() job over the
    * input. */
  private[operators] def exclusiveColsTotal(df: DataFrame,
      orderCols: Seq[Column], valueCol: String, outCol: String,
      buckets: Int): (DataFrame, Long) = {
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

    val out = local
      .join(broadcast(offDf), Seq("_bkt"))
      .withColumn(outCol, col("_local") + col("_off"))
      .drop("_bkey", "_bkt", "_local", "_off")
    (out, totals.map(_._2).sum)
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

  /** Several exact NTILE(k) columns over DIFFERENT total orders of the
    * same table, in TWO driver jobs total instead of two per metric:
    * one multi-column `approxQuantile` yields every metric's bucket
    * boundaries, one exploded aggregate yields every metric's bucket
    * counts, and each rank is then a bucket-local ROW_NUMBER plus its
    * broadcast offset. `keyCol` must be unique (it re-joins the rank
    * branches) and each spec's orderCols tuple must be a total order.
    * The canonical use is RFM-style multi-metric quantiling, where the
    * per-metric formulation would pay 2 eager jobs per metric on plan
    * construction. Output = `df` minus nothing, plus one tile column
    * per spec; bit-identical to the per-metric [[ntileCols]]. */
  def ntileMulti(df: DataFrame, keyCol: String,
      specs: Seq[(String, Seq[Column])], k: Int,
      buckets: Int = 32): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val idx = specs.indices
    val keyed = idx.foldLeft(df) { (d, i) =>
      d.withColumn(s"_bk$i", specs(i)._2.head.cast("double"))
    }
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val allBounds = keyed.stat.approxQuantile(
      idx.map(i => s"_bk$i").toArray, probs, 0.001)
      .map(_.distinct.sorted)
    def bucketCol(i: Int): Column =
      allBounds(i).foldLeft(lit(0)) { (acc, b) =>
        acc + when(col(s"_bk$i") >= lit(b), 1).otherwise(0)
      }
    val bucketed = idx.foldLeft(keyed) { (d, i) =>
      d.withColumn(s"_bkt$i", bucketCol(i))
    }
    // one job: per-(metric, bucket) row counts via explode
    val counts = bucketed
      .select(explode(array(idx.map(i =>
        struct(lit(i).as("m"), col(s"_bkt$i").as("b"))): _*)).as("p"))
      .groupBy(col("p.m"), col("p.b")).agg(count(lit(1)).as("c"))
      .as[(Int, Int, Long)].collect()
    val n = if (idx.isEmpty) 0L
      else counts.filter(_._1 == 0).map(_._3).sum
    val q = n / k
    val rem = n % k
    val cut = (q + 1) * rem
    val branches = idx.map { i =>
      val (out, ordCols) = specs(i)
      val offsets = counts.filter(_._1 == i).map { case (_, b, c) => (b, c) }
        .sortBy(_._1)
      val off = offsets
        .scanLeft((Int.MinValue, 0L)) { case ((_, acc), (b, c)) => (b, acc + c) }
        .init.zip(offsets.map(_._1))
        .map { case ((_, o), b) => (b, o) }
      val offDf = off.toSeq.toDF("_bkt", "_off")
      val w = Window.partitionBy(col(s"_bkt$i"))
        .orderBy(ordCols.map(_.asc): _*)
      // rank = bucket offset + bucket-local ROW_NUMBER (the order is
      // total, so counting prior rows and numbering agree exactly)
      val ranked = bucketed
        .join(broadcast(offDf), col(s"_bkt$i") === col("_bkt"))
        .withColumn("_rank",
          row_number().over(w).cast("long") + col("_off"))
      // NTILE fill rule: first n%k tiles hold ⌈n/k⌉ rows
      val tile =
        if (q == 0) col("_rank")
        else when(col("_rank") <= cut,
          expr(s"(_rank - 1) DIV ${q + 1}") + 1)
          .otherwise(lit(rem) + expr(s"(_rank - 1 - $cut) DIV $q") + 1)
      ranked.withColumn(out, tile.cast("int"))
        .select(col(keyCol), col(out))
    }
    branches.foldLeft(df)((acc, b) => acc.join(b, Seq(keyCol)))
  }

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
    // n comes from the prefix pass's own bucket totals — no extra
    // count() job over the input
    val (ranked0, n) = exclusiveColsTotal(df.withColumn("_one", lit(1L)),
      orderCols, "_one", "_rank0", buckets)
    val q = n / k
    val rem = n % k
    val cut = (q + 1) * rem // ranks 1..cut land in the ⌈n/k⌉-sized tiles
    val ranked = ranked0.withColumn("_rank", col("_rank0") + 1)
    val tile =
      if (q == 0) col("_rank") // n < k: tile i holds exactly row of rank i
      else when(col("_rank") <= cut,
        expr(s"(_rank - 1) DIV ${q + 1}") + 1)
        .otherwise(lit(rem) + expr(s"(_rank - 1 - $cut) DIV $q") + 1)
    val out = ranked.withColumn(tileCol, tile.cast("int"))
    // rank stays LONG: this helper exists precisely for orders too big
    // for one task, where an int rank would wrap negative past 2^31
    // rows and silently corrupt the total order it defines
    rankCol.fold(out.drop("_one", "_rank0", "_rank")) { rc =>
      out.withColumn(rc, col("_rank"))
        .drop("_one", "_rank0", "_rank")
    }
  }
}
