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
}
