package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.EventStream

/** Streaming dedup index — the streaming twin of q168: the committed
  * (fingerprint → canonical) index must equal the one-shot batch
  * recompute however the stream was chunked, survive a checkpoint
  * replay unchanged, and report q168-style per-batch verdict counts
  * that account for every ingested doc. */
class StreamingDedupSpec extends AnyFunSuite {
  import TestSpark.spark
  import java.nio.file.Files

  test("streaming dedup index equals the batch recompute, is replay-safe, " +
      "and its verdict counts partition the ingest") {
    import spark.implicits._
    // A corpus with REAL duplicates (the testdata's fingerprints are
    // all unique, which would leave the dup branches vacuous): 30 docs
    // over 12 distinct texts, spread across 3 source files.
    val docs = (0L until 30L).map(i => (i, s"shared doc text ${i % 12}"))
      .toDF("doc_id", "text")
    val srcDir = Files.createTempDirectory("graft_sdx_src_").toString
    docs.repartition(3).write.mode("overwrite").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    val indexPath =
      Files.createTempDirectory("graft_sdx_idx_").toString + "/index"
    val ckpt = Files.createTempDirectory("graft_sdx_ckpt_").toString
    val counts =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    def run(): Unit = EventStream.streamingDedupIndex(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir),
      indexPath, Some(ckpt),
      (id, novel, dupHist, dupBatch) => counts.synchronized {
        counts += ((id, novel, dupHist, dupBatch))
      })
    run()

    def indexSet() = EventStream.readDedupIndex(spark, indexPath).collect()
      .map(r => (r.getAs[String]("fp"), r.getAs[Long]("canonical"),
        r.getAs[Long]("n_docs"))).toSet
    val want = docs
      .select(col("doc_id"),
        graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("canonical"), count(lit(1)).as("n_docs"))
      .collect()
      .map(r => (r.getAs[String]("fp"), r.getAs[Long]("canonical"),
        r.getAs[Long]("n_docs"))).toSet
    assert(indexSet() === want)
    assert(want.size === 12)
    assert(EventStream.appliedBatches(indexPath).size >= 3,
      "expected >=3 micro-batches")

    // verdict counts: every ingested doc lands in exactly one class,
    // and with 12 distinct texts over 30 docs, 18 are dups somewhere
    val totals = counts.toSeq.map { case (_, n, h, b) => (n, h, b) }
      .reduce[(Long, Long, Long)] { case ((a1, a2, a3), (b1, b2, b3)) =>
        (a1 + b1, a2 + b2, a3 + b3)
      }
    assert(totals._1 + totals._2 + totals._3 === 30L)
    assert(totals._2 + totals._3 === 18L,
      s"expected 18 dup verdicts, got $totals")

    // one live version dir after commit GC
    val versions = new java.io.File(indexPath + ".versions").listFiles()
    assert(versions != null && versions.length === 1)

    // checkpoint replay: nothing reprocesses, nothing changes
    val nBefore = counts.size
    run()
    assert(indexSet() === want, "checkpoint replay mutated the index")
    assert(counts.size === nBefore, "replay re-reported verdicts")
  }

  test("streaming quantile sketch equals the batch state however chunked, " +
      "and the finisher reads q180's quantiles off it") {
    import graft.operators.Profiling
    val docs = graft.Tables.load(spark, TestSpark.sfDir, "documents")
      .select(col("source"), col("text"))
    val srcDir = Files.createTempDirectory("graft_sqs_src_").toString
    docs.repartition(3).write.mode("overwrite").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema

    def stateSet(path: String) =
      EventStream.readQuantileSketch(spark, path).collect()
        .map(r => (r.getAs[String]("source"), r.getAs[Int]("bucket"),
          r.getAs[Long]("cnt"), r.getAs[Long]("bmax"))).toSet
    val want = Profiling.lengthBucketCounts(docs).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Int]("bucket"),
        r.getAs[Long]("cnt"), r.getAs[Long]("bmax"))).toSet

    // chunked run: one file per micro-batch
    val p1 = Files.createTempDirectory("graft_sqs_1_").toString + "/sk"
    val ck1 = Files.createTempDirectory("graft_sqs_ck1_").toString
    def run1(): Unit = EventStream.streamingQuantileSketch(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir), p1, Some(ck1))
    run1()
    assert(EventStream.appliedBatches(p1).size >= 3)
    assert(stateSet(p1) === want,
      "chunked streaming fold must equal the one-shot batch state")

    // single-batch run commits the same state: chunking independence
    val p2 = Files.createTempDirectory("graft_sqs_2_").toString + "/sk"
    val ck2 = Files.createTempDirectory("graft_sqs_ck2_").toString
    EventStream.streamingQuantileSketch(
      spark.readStream.schema(schema).parquet(srcDir), p2, Some(ck2))
    assert(stateSet(p2) === stateSet(p1))

    // the shared finisher over the committed state = q180 on the rows
    val got = Profiling
      .quantilesFromCounts(EventStream.readQuantileSketch(spark, p1))
      .collect().map(_.toSeq).toSeq
    val batch = Profiling
      .quantilesFromCounts(Profiling.lengthBucketCounts(docs))
      .collect().map(_.toSeq).toSeq
    assert(got === batch)

    // checkpoint replay: ledger blocks the re-merge
    run1()
    assert(stateSet(p1) === want, "checkpoint replay mutated the sketch")
  }
}
