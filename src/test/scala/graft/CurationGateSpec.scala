package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.format.GraftTable
import graft.operators.CurationGate

/** The q255 CDC-driven nightly curation pipeline (VERDICT r13 #5):
  * structural pins the DuckDB hash gate can't see — per-batch verdict
  * partitioning (verdict commit v holds EXACTLY ingest batches
  * 0..v-1, stamped with their batch id), ledger state, index/mart
  * consistency, verdict-canonical invariants, and a FULL-FEED REPLAY
  * (fresh checkpoint, same state roots) that must be a no-op. */
class CurationGateSpec extends AnyFunSuite {
  import TestSpark.spark

  private val sfDir = "/root/testdata/sf0.001"

  private def tmp(): String = java.nio.file.Files
    .createTempDirectory("graft_curation_").toString

  private def runPipeline(): (String, String, String, String) = {
    val base = tmp()
    val (ingest, idxR, verR, martR) =
      (s"$base/in", s"$base/idx", s"$base/ver", s"$base/mart")
    CurationGate.buildIngest(spark, sfDir, ingest)
    CurationGate.curate(spark, ingest, idxR, verR, martR,
      s"$base/ckpt1")
    (ingest, idxR, verR, martR)
  }

  test("per-batch verdict partitioning: verdict commit v holds " +
      "exactly ingest batches 0..v-1, each stamped with its batch id") {
    val (ingest, idxR, verR, martR) = runPipeline()
    val verT = GraftTable.forPath(spark, verR)
    val inT = GraftTable.forPath(spark, ingest)
    assert(verT.currentVersion == 3L,
      "one verdict commit per ingest batch")
    assert(verT.appliedBatches == Set(0L, 1L, 2L))
    // ingest batch sizes (per version diff) must equal the verdict
    // rows stamped with that batch id, at the verdict version that
    // folded it — and at every LATER version (append-only)
    val batchSizes = (1L to 3L).map(v =>
      inT.read(v).count() - (if (v == 1) 0L else inT.read(v - 1).count()))
    (1L to 3L).foreach { v =>
      val byB = verT.read(v).groupBy(col("b")).count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(byB.keySet == (0L until v).toSet,
        s"verdict v$v must hold exactly batches 0..${v - 1}: $byB")
      (0L until v).foreach(b =>
        assert(byB(b) == batchSizes(b.toInt),
          s"verdict v$v batch $b: ${byB(b)} rows, " +
            s"ingest had ${batchSizes(b.toInt)}"))
    }
    // the injected duplicate classes actually fire
    val statuses = verT.read().groupBy(col("status")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(statuses.getOrElse("dup_of_history", 0L) > 0)
    assert(statuses.getOrElse("dup_in_batch", 0L) > 0)
    assert(statuses.getOrElse("novel", 0L) > 0)
    // canonical invariants: dups point at a STRICTLY older id, novel
    // and quarantined at nothing
    val bad = verT.read().where(
      (col("status").isin("dup_of_history", "dup_in_batch") &&
        (col("canonical_id").isNull ||
          col("canonical_id") >= col("doc_id"))) ||
      (col("status").isin("novel", "quarantined") &&
        col("canonical_id").isNotNull)).count()
    assert(bad == 0L, s"$bad verdicts violate canonical invariants")
    // index: one row per novel doc, unique fingerprints, ledgered
    val idxT = GraftTable.forPath(spark, idxR)
    assert(idxT.appliedBatches == Set(0L, 1L, 2L))
    assert(idxT.read().count() == statuses("novel"))
    assert(idxT.read().select("fp").distinct().count()
      == statuses("novel"), "the index must never hold a dup fp")
    // mart equals a recomputation from the verdict table
    val want = verT.read().where(col("status") === "novel")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nch")).as("n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    val got = GraftTable.forPath(spark, martR).read()
      .select(col("lang"), col("n_docs"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == want, s"mart drifted from verdicts:\n$got\n$want")
  }

  test("replaying the FULL feed (fresh checkpoint, same state roots) " +
      "is a no-op: ledgers skip every batch, nothing double-counts") {
    val (ingest, idxR, verR, martR) = runPipeline()
    def state() = (
      GraftTable.forPath(spark, verR).currentVersion,
      GraftTable.forPath(spark, idxR).currentVersion,
      GraftTable.forPath(spark, martR).currentVersion,
      GraftTable.forPath(spark, verR).read().count(),
      GraftTable.forPath(spark, idxR).read().count(),
      GraftTable.forPath(spark, martR).read()
        .agg(sum(col("n_docs")), sum(col("n_chars"))).head().toSeq)
    val before = state()
    CurationGate.curate(spark, ingest, idxR, verR, martR,
      s"${tmp()}/ckpt2") // fresh checkpoint → all 3 batches replay
    assert(state() == before,
      "a full replay must change NOTHING through the batch ledgers")
  }
}
