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

  /** Normalize a numeric column to [0, 2^Bits) given its min/max. */
  private def normalize(c: Column, mn: Column, mx: Column): Column = {
    val span = mx - mn
    val scaled = when(span <= 0, lit(0L)).otherwise(
      floor((c - mn).cast("double") / span.cast("double") * ((1 << Bits) - 1))
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

  /** Z-value of two numeric columns over their observed ranges. */
  def zValue(df: DataFrame, colX: String, colY: String): DataFrame = {
    val r = df.agg(
      min(col(colX)).cast("long").as("mnx"),
      max(col(colX)).cast("long").as("mxx"),
      min(col(colY)).cast("long").as("mny"),
      max(col(colY)).cast("long").as("mxy")).head()
    val (mnx, mxx) = (lit(r.getAs[Long]("mnx")), lit(r.getAs[Long]("mxx")))
    val (mny, mxy) = (lit(r.getAs[Long]("mny")), lit(r.getAs[Long]("mxy")))
    df.withColumn("_z", interleave(
      normalize(col(colX).cast("long"), mnx, mxx),
      normalize(col(colY).cast("long"), mny, mxy)))
  }

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
