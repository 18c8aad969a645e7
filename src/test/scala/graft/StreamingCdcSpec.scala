package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.format.GraftTable

/** STREAMING CHANGE DATA FEED: `readStream.format("gtable")
  * .option("readChangeFeed", true)` emits every committed change as
  * an event — 'insert' rows for files added per version, 'delete'
  * rows for (file, ordinal) pairs that joined the deletion vector —
  * so a downstream table can be maintained incrementally from a
  * mutating source without rescans (the streaming twin of the batch
  * readCdc, Delta CDF's contract). Pins: both event types, exact
  * event payloads, fold-to-live equivalence, and checkpoint resume
  * delivering only new commits. */
class StreamingCdcSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def tmp(): String = java.nio.file.Files
    .createTempDirectory("graft_cdcstream_").toString + "/t"

  test("the CDC stream emits inserts and deletes exactly once, folds " +
      "to the live table, and a resumed stream sees only new commits") {
    val root = tmp()
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_cdcstream_ckpt_").toString
    val t = GraftTable.create(spark, root,
      (1L to 100L).map(k => (k, k * 10L)).toDF("k", "v"),
      Seq("k"), numFiles = 2)                      // v1: 100 inserts
    t.deleteWhereMor(col("k") <= 10)               // v2: 10 deletes
    t.append((101L to 120L).map(k => (k, k * 10L)).toDF("k", "v"),
      numFiles = 1)                                // v3: 20 inserts

    // foreachBatch → parquet: unlike the memory sink it supports
    // checkpoint RECOVERY, which the resume half of this test needs
    def drain(outDir: String): Unit = {
      val q = spark.readStream.format("gtable")
        .option("readChangeFeed", "true")
        .load(root)
        .writeStream
        .foreachBatch {
          (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
              _: Long) =>
            df.write.mode("append").parquet(outDir); ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val out1 = s"$root-ev1"
    drain(out1)
    val ev1 = spark.read.parquet(out1)
    assert(ev1.columns.toSet == Set("k", "v", "_change_type"))
    assert(ev1.where(col("_change_type") === "insert").count() == 120)
    assert(ev1.where(col("_change_type") === "delete").count() == 10)
    // delete events carry the FULL deleted row (payload, not just id)
    assert(ev1.where(col("_change_type") === "delete" &&
      col("v") === 70L).count() == 1)
    // folding the feed reproduces the live table exactly
    val folded = ev1.groupBy(col("k"))
      .agg(sum(when(col("_change_type") === "insert", 1)
        .otherwise(-1)).as("net"))
      .where(col("net") > 0)
    assert(folded.count() == t.read().count())
    // resume: two more commits, a fresh drain over the SAME
    // checkpoint delivers exactly their events
    t.deleteWhereMor(col("k") > 100 && col("k") <= 105) // 5 deletes
    t.append(Seq((201L, 2010L)).toDF("k", "v"), numFiles = 1)
    val out2 = s"$root-ev2"
    drain(out2)
    val ev2 = spark.read.parquet(out2)
    assert(ev2.where(col("_change_type") === "insert").count() == 1)
    assert(ev2.where(col("_change_type") === "delete").count() == 5)
    assert(ev2.where(col("_change_type") === "delete")
      .agg(min(col("k"))).head().getLong(0) == 101L)
  }

  test("batch read with readChangeFeed declines with guidance; the " +
      "plain (non-CDC) stream is unaffected by the option's absence") {
    val root = tmp()
    GraftTable.create(spark, root, (1L to 10L).toDF("k"),
      Seq("k"), numFiles = 1)
    val e = intercept[Exception] {
      spark.read.format("gtable")
        .option("readChangeFeed", "true").load(root).count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("readChangesFrom")),
      s"expected batch-CDC guidance, got: ${msgs(e)}")
  }
}
