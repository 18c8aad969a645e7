package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.{LakehousePipeline, Pipeline}
import graft.format.GraftTable

/** The T0-on-table-format path: silver row-identity with the classic
  * pipeline, snapshot-per-load accounting, and file-granular COW on
  * the incremental reload. */
class LakehousePipelineSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  test("lakehouse bronze produces row-identical silver to the classic " +
      "dynamic-overwrite pipeline; an incremental reload is one atomic " +
      "snapshot that carries untouched files forward") {
    val whClassic = java.nio.file.Files
      .createTempDirectory("graft_lake_classic_").toString
    val whLake = java.nio.file.Files
      .createTempDirectory("graft_lake_fmt_").toString
    val full = Pipeline.Config(sfDir, whClassic, "19920101", "20021231")
    val fullLake = full.copy(warehouseDir = whLake)
    try {
      // classic: T0 fact + dims, then silver off the bronze dirs
      Pipeline.t0Fact(spark, full)
      Pipeline.t0Dimensions(spark, full)
      val classicFact = spark.read.parquet(s"$whClassic/bronze/fact")
      val classicSilver = Pipeline.silverJoin(spark, full, classicFact)

      // lakehouse: same dims, fact through the table format
      Pipeline.t0Dimensions(spark, fullLake)
      assert(LakehousePipeline.t0FactLake(spark, fullLake) == 1)
      val lakeSilver = LakehousePipeline.silverLake(spark, fullLake)

      assert(lakeSilver.count() == classicSilver.count())
      val cols = classicSilver.columns.map(col).toSeq
      assert(lakeSilver.select(cols: _*)
        .exceptAll(classicSilver).isEmpty &&
        classicSilver.exceptAll(lakeSilver.select(cols: _*)).isEmpty,
        "silver must be row-identical across storage contracts")

      // incremental reload of ONE year = exactly one new snapshot,
      // with every out-of-window file carried forward by reference
      val t0 = GraftTable.forPath(spark, LakehousePipeline
        .bronzePath(whLake))
      val before = t0.manifest().select("path").as[String].collect().toSet
      val inc = fullLake.copy(fromDate = "19960101", toDate = "19961231")
      assert(LakehousePipeline.t0FactLake(spark, inc) == 2)
      val t1 = GraftTable.forPath(spark,
        LakehousePipeline.bronzePath(whLake))
      val after = t1.manifest().select("path").as[String].collect().toSet
      assert(before.intersect(after).nonEmpty,
        "files outside the reloaded window must carry forward")
      // content unchanged: the reload re-ingested the same source year
      assert(t1.read().count() == classicFact.count())
      val h = t1.history().collect().map(r => (r.getLong(0), r.getString(1)))
      assert(h.toSeq == Seq((2L, "replace"), (1L, "append")))
    } finally {
      import scala.reflect.io.Directory
      Seq(whClassic, whLake).foreach(d =>
        new Directory(new java.io.File(d)).deleteRecursively())
    }
  }
}
