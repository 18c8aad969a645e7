package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout for multi-dimensional data skipping.
  *
  * A linear sort gives perfect parquet min/max skipping on ONE column
  * and none on any other; interleaving the bits of two (or more)
  * normalized columns bounds EVERY z-column's range within each file,
  * so point/range predicates on any of them skip most files. This is
  * the standard lakehouse clustering play for 100 TB fact tables where
  * queries filter on different dimensions than the partition key.
  *
  * Everything here is expression-level (codegen'd bit arithmetic) — the
  * write is one tiny min/max agg job + one range repartition, no UDF,
  * no driver loop.
  */
object ZOrder {

  val Bits = 16 // per-dimension resolution; 2 dims → 32-bit z-values

  /** Normalize a numeric column to [0, 2^bits) given its min/max. */
  private def normalize(c: Column, mn: Column, mx: Column,
      bits: Int): Column = {
    val span = mx - mn
    val scaled = when(span <= 0, lit(0L)).otherwise(
      floor((c - mn).cast("double") / span.cast("double")
        * ((1 << bits) - 1))
        .cast("long"))
    scaled
  }

  /** Interleave the low [[Bits]] bits of two normalized longs:
    * x occupies odd bit positions, y even — a fold of shifts and ORs
    * that stays inside whole-stage codegen. */
  def interleave(x: Column, y: Column): Column =
    (0 until Bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i + 1))
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i))
    }

  /** Round-robin interleave of N normalized longs (`bits` low bits
    * each): dimension j contributes bit i at z-position n*i+(n-1-j).
    * Still a pure shift/OR fold — whole-stage codegen, no UDF. */
  def interleaveN(cols: Seq[Column], bits: Int): Column = {
    val n = cols.length
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      cols.zipWithIndex.foldLeft(acc) { case (a, (c, j)) =>
        a.bitwiseOR(shiftleft(
          shiftright(c, i).bitwiseAND(lit(1L)), n * i + (n - 1 - j)))
      }
    }
  }

  /** Per-dimension resolution for an n-dim curve: the interleaved
    * value must fit a signed 64-bit long. 2 dims keep the full 16
    * bits; 3 dims also get 16 (48 total); 4 dims drop to 15. */
  def bitsFor(n: Int): Int = math.min(Bits, 62 / n)

  /** Z-value of N ≥ 2 numeric columns over their observed ranges —
    * one tiny min/max agg, then pure expression arithmetic. */
  def zValueN(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "z-order needs at least 2 columns")
    val aggs = cols.flatMap(c => Seq(
      min(col(c)).cast("long").as(s"mn_$c"),
      max(col(c)).cast("long").as(s"mx_$c")))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val eff = bitsFor(cols.size)
    val normed = cols.map(c => normalize(col(c).cast("long"),
      lit(r.getAs[Long](s"mn_$c")), lit(r.getAs[Long](s"mx_$c")), eff))
    df.withColumn("_z", interleaveN(normed, eff))
  }

  /** Z-value of two numeric columns over their observed ranges. */
  def zValue(df: DataFrame, colX: String, colY: String): DataFrame =
    zValueN(df, Seq(colX, colY))

  /** Write `df` clustered on the z-curve of (colX, colY): range-
    * partition by z-value into `numFiles` files, sort within each, drop
    * the helper column. Each output file then covers a compact z-range
    * — a small rectangle in (x, y) space — so parquet footer min/max
    * stats prune files for predicates on EITHER column. */
  def writeZOrdered(df: DataFrame, path: String,
      colX: String, colY: String, numFiles: Int): Unit =
    zValue(df, colX, colY)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)

  /** File-skipping audit: per output file, the fraction of files whose
    * [min,max] envelope of `probe` overlaps [lo,hi] — the share a
    * stats-based reader must actually open. (Computed by scan here;
    * a real reader gets the same envelopes from parquet footers.) */
  def overlapFraction(df: DataFrame, probe: String,
      lo: Long, hi: Long): Double = {
    val perFile = df
      .groupBy(input_file_name().as("f"))
      .agg(min(col(probe)).as("mn"), max(col(probe)).as("mx"))
    val total = perFile.count()
    val touched = perFile
      .where(col("mx") >= lo && col("mn") <= hi).count()
    touched.toDouble / total
  }
}
