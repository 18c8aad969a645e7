package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.etl.Pipeline
import java.nio.file.Files

/** Pipelined mode must be a pure scheduling change: byte-compatible
  * warehouse layout and identical mart content vs the staged S2S flow. */
class PipelineModesSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  private def freshDir(): String =
    Files.createTempDirectory("graft_modes_").toString

  private def dirNames(root: String): Set[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f +: f.listFiles.toSeq.flatMap(walk) else Seq.empty
    walk(new java.io.File(root))
      .map(_.getPath.stripPrefix(root)).filter(_.nonEmpty).toSet
  }

  test("staged and pipelined runs produce identical marts and layout") {
    val (whS, whP) = (freshDir(), freshDir())
    val reportS = Pipeline.run(spark,
      Pipeline.Config(sfDir, whS, "19940101", "19961231", pipelined = false))
    val reportP = Pipeline.run(spark,
      Pipeline.Config(sfDir, whP, "19940101", "19961231", pipelined = true))
    assert(reportS === reportP)

    for (mart <- reportS.keys) {
      val s = spark.read.parquet(s"$whS/gold/$mart")
      val p = spark.read.parquet(s"$whP/gold/$mart")
      assert(s.schema === p.schema, s"$mart schema diverged")
      assert(s.collect().toSet === p.collect().toSet, s"$mart content diverged")
      // identical Hive dir layout (same partition value formatting)
      assert(dirNames(s"$whS/gold/$mart") === dirNames(s"$whP/gold/$mart"))
    }
    assert(dirNames(s"$whS/silver") === dirNames(s"$whP/silver"))
    assert(dirNames(s"$whS/bronze") === dirNames(s"$whP/bronze"))
    val silverS = spark.read.parquet(s"$whS/silver/fact_all_info")
    val silverP = spark.read.parquet(s"$whP/silver/fact_all_info")
    assert(silverS.schema === silverP.schema)
    assert(silverS.count() === silverP.count())
  }

  test("incremental pipelined run over a staged initial load composes") {
    val wh = freshDir()
    Pipeline.run(spark,
      Pipeline.Config(sfDir, wh, "19940101", "19951231", pipelined = false))
    val y1994 = spark.read.parquet(s"$wh/gold/sales_by_region")
      .where(org.apache.spark.sql.functions.col("ship_year") === 1994)
      .collect().toSet
    // re-run 1995 pipelined: 1994 partitions must be untouched
    Pipeline.run(spark,
      Pipeline.Config(sfDir, wh, "19950101", "19951231", pipelined = true))
    val y1994After = spark.read.parquet(s"$wh/gold/sales_by_region")
      .where(org.apache.spark.sql.functions.col("ship_year") === 1994)
      .collect().toSet
    assert(y1994 === y1994After)
  }
}
