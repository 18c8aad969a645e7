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

  test("the batch loop is O(batch): it NEVER reads the verdict " +
      "history, and index/mart reads are one per batch (VERDICT r14 " +
      "#1 — the mart previously recomputed totals from the full " +
      "verdict table every night)") {
    val (_, idxR, verR, martR) = runPipeline()
    import graft.format.ReadCounter
    // the drain processed 3 batches; the loop itself must never have
    // opened the verdict table (appends + ledger checks only), and
    // the index/mart state reads are one KEY-SIZED read per batch
    // that has prior state (batches 1 and 2)
    assert(ReadCounter.count(verR) == 0L,
      s"the batch loop read the verdict table " +
        s"${ReadCounter.count(verR)} times — mart maintenance must " +
        "be a ledgered delta-merge, not a history recompute")
    assert(ReadCounter.count(idxR) == 2L,
      s"expected 2 index reads (batches 1,2), got " +
        s"${ReadCounter.count(idxR)}")
    assert(ReadCounter.count(martR) == 2L,
      s"expected 2 mart reads (batches 1,2), got " +
        s"${ReadCounter.count(martR)}")
  }

  test("a crash BETWEEN the index append and the verdict append " +
      "replays exactly-once: tonight's own index rows are not read " +
      "as history, the mart never double-adds (ADVICE r14)") {
    val c = CurationGate.corpus(spark, sfDir).cache()
    try {
      def bdf(k: Int) = c.where(col("b") === k).drop("b")
        .withColumn("_change_type", lit("insert"))
      def state(idxR: String, verR: String, martR: String) = (
        GraftTable.forPath(spark, verR).read()
          .select("doc_id", "b", "lang", "nch", "status",
            "canonical_id")
          .collect().map(_.toSeq).toSet,
        GraftTable.forPath(spark, idxR).read()
          .collect().map(_.toSeq).toSet,
        GraftTable.forPath(spark, martR).read()
          .collect().map(_.toSeq).toSet)

      // reference: a clean batch-by-batch run
      val a = tmp()
      (0 to 2).foreach(k => CurationGate.curateBatch(spark, bdf(k),
        k.toLong, s"$a/idx", s"$a/ver", s"$a/mart"))
      val want = state(s"$a/idx", s"$a/ver", s"$a/mart")

      // crashy run: batch 1 dies right after its index fold landed
      val b = tmp()
      CurationGate.curateBatch(spark, bdf(0), 0L,
        s"$b/idx", s"$b/ver", s"$b/mart")
      intercept[RuntimeException] {
        CurationGate.curateBatch(spark, bdf(1), 1L,
          s"$b/idx", s"$b/ver", s"$b/mart",
          onAfterIndexFold = () => throw new RuntimeException("crash"))
      }
      // the crash window is real: the index holds batch 1, the
      // verdict ledger does not
      assert(GraftTable.forPath(spark, s"$b/idx")
        .appliedBatches == Set(0L, 1L))
      assert(GraftTable.forPath(spark, s"$b/ver")
        .appliedBatches == Set(0L))
      // replay batch 1 (at-least-once delivery), then batch 2
      CurationGate.curateBatch(spark, bdf(1), 1L,
        s"$b/idx", s"$b/ver", s"$b/mart")
      CurationGate.curateBatch(spark, bdf(2), 2L,
        s"$b/idx", s"$b/ver", s"$b/mart")
      val got = state(s"$b/idx", s"$b/ver", s"$b/mart")
      assert(got == want,
        "the crash-replayed run must land byte-identical state")
      // and the replayed batch's novels stayed novel — none were
      // reclassified as dups of their own index rows
      val selfDup = GraftTable.forPath(spark, s"$b/ver").read()
        .where(col("canonical_id") === col("doc_id")).count()
      assert(selfDup == 0L, s"$selfDup docs are duplicates of " +
        "themselves — the replay read its own batch as history")
    } finally { c.unpersist(); () }
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
