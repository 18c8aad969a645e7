package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.ZOrder
import java.nio.file.Files

/** Z-order clustering must actually deliver two-dimensional file
  * skipping: a linear sort skips on its sort key only; the z-layout
  * skips on BOTH interleaved columns. */
class ZOrderSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  private lazy val events = Tables.load(spark, sfDir, "events")
    .select(col("event_id"), col("user_id"),
      (col("value") * 100).cast("long").as("cents"))

  test("interleave maps 2-d proximity to z-range compactness") {
    import spark.implicits._
    val df = Seq((0L, 0L), (1L, 1L), (65535L, 65535L)).toDF("x", "y")
      .select(ZOrder.interleave(col("x"), col("y")).as("z"))
    val zs = df.as[Long].collect()
    assert(zs(0) === 0L)
    assert(zs(1) === 3L)              // bits interleave: (1,1) -> 0b11
    assert(zs(2) === (1L << 32) - 1)  // all 32 bits set
  }

  test("z-order skips files on BOTH dimensions; linear sort only on one") {
    val n = 16
    val zDir = Files.createTempDirectory("graft_z_").toString
    val linDir = Files.createTempDirectory("graft_lin_").toString
    ZOrder.writeZOrdered(events, zDir, "user_id", "cents", n)
    events.repartitionByRange(n, col("user_id"))
      .sortWithinPartitions(col("user_id"))
      .write.mode("overwrite").parquet(linDir)

    val zDf = spark.read.parquet(zDir)
    val linDf = spark.read.parquet(linDir)
    assert(zDf.count() === events.count())

    // probe 1: narrow user_id range — both layouts skip
    val uLo = 10L; val uHi = 40L
    val zU = ZOrder.overlapFraction(zDf, "user_id", uLo, uHi)
    val linU = ZOrder.overlapFraction(linDf, "user_id", uLo, uHi)
    assert(linU < 0.5, s"linear layout must skip on its sort key ($linU)")
    assert(zU < 0.8, s"z layout must skip on dim 1 ($zU)")

    // probe 2: narrow cents range — ONLY the z layout skips
    val stats = events.agg(min("cents"), max("cents")).head()
    val (cMn, cMx) = (stats.getLong(0), stats.getLong(1))
    val mid = cMn + (cMx - cMn) / 2
    val width = (cMx - cMn) / 16
    val zC = ZOrder.overlapFraction(zDf, "cents", mid, mid + width)
    val linC = ZOrder.overlapFraction(linDf, "cents", mid, mid + width)
    // the linear layout has no order on cents, so most files straddle
    // the probed range; the z layout must touch materially fewer
    assert(zC <= linC - 0.25,
      s"z layout must out-skip linear on the second dimension " +
        s"($zC vs linear $linC)")
    assert(zC < 0.7, s"z layout must skip on the second dimension ($zC)")
  }
}
