package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import graft.sources.EventLogSource

class EventLogSourceSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  private def stageAndRead() = {
    val scratch = Scratch.dir(spark, "evlog_spec")
    EventLogSource.toLines(
      Tables.load(spark, sfDir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value"))
      .repartition(4).write.mode("overwrite").text(scratch)
    spark.read.format(classOf[EventLogSource].getName)
      .option("path", scratch).load()
  }

  test("v2 eventlog reader round-trips every row exactly") {
    val back = stageAndRead()
    val orig = Tables.load(spark, sfDir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    assert(back.exceptAll(orig).count() === 0)
    assert(orig.exceptAll(back).count() === 0)
  }

  test("column pruning reaches the v2 scan, and parallelism is one " +
      "partition per file") {
    val pruned = stageAndRead().select("event_type")
    pruned.collect()
    val scans = pruned.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b
    }
    assert(scans.nonEmpty, "expected a BatchScanExec for the v2 source")
    assert(scans.head.output.map(_.name) === Seq("event_type"),
      s"scan must read only the pruned column: ${scans.head.output}")
    assert(scans.head.inputRDD.getNumPartitions === 4,
      "one InputPartition per staged file")
  }

  test("streaming connector resumes from the checkpoint: a second run " +
      "consumes only files that appeared after the first") {
    import java.nio.file.Files
    val logDir = Files.createTempDirectory("graft_evlog_tail_").toString
    val out = Files.createTempDirectory("graft_evlog_out_").toString
    val ckpt = Files.createTempDirectory("graft_evlog_ckpt_").toString
    val ev = Tables.load(spark, sfDir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    val first = ev.where(col("event_id") % 2 === 0)
    val second = ev.where(col("event_id") % 2 === 1)

    def append(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val rows = EventLogSource.toLines(df).collect().map(_.getString(0))
      Files.write(java.nio.file.Paths.get(logDir, name),
        rows.mkString("\n").getBytes("UTF-8"))
    }
    def drain(): Unit = {
      val stream = spark.readStream
        .format(classOf[EventLogSource].getName)
        .option("path", logDir).load()
      graft.streaming.EventStream.runToParquet(stream, out, ckpt, Nil)
    }

    append(first, "00000.log")
    drain()
    assert(spark.read.parquet(out).count() === first.count())
    append(second, "00001.log")
    drain()
    // the union of both halves, each exactly once — the offset in the
    // checkpoint made run 2 plan only the new file
    val back = spark.read.parquet(out)
    assert(back.count() === ev.count())
    assert(back.exceptAll(ev).count() === 0)
    assert(ev.exceptAll(back).count() === 0)
  }
}
