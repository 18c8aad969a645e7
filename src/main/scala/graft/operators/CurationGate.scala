package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.format.GraftTable
import graft.functions.TextFunctions.fingerprint

/** q255 — END-TO-END CDC-DRIVEN INCREMENTAL CURATION (VERDICT r13
  * #5): the nightly training-data pipeline composed ON the table
  * format, every stage of which exists separately in the registry:
  *
  *   1. INGEST — three nightly document batches land as three
  *      data-changing commits of one gtable (reference's incremental
  *      load, aws-glue-etl-sample-hist `src/main/etl_t2.py:38-55`,
  *      re-expressed as table-format commits);
  *   2. CHANGE FEED — `readStream(readChangeFeed)` with
  *      `maxVersionsPerTrigger=1` drains the ingest history ONE
  *      COMMIT PER MICRO-BATCH, so each nightly batch is curated
  *      exactly once, in commit order (q247's stream + q254's
  *      admission control);
  *   3. CURATE — per batch: a QUARANTINE rule (short text), then
  *      q168's incremental dedup against a PERSISTED fingerprint
  *      index table (history text is never rescanned — the index is
  *      the only state, and tonight's novel set is appended to it);
  *   4. VERDICTS — one row per ingested doc
  *      (quarantined/dup_of_history/dup_in_batch/novel + canonical),
  *      appended per batch through the applied-batch ledger
  *      ([[GraftTable.appendIfAbsent]], q210) — the COMMIT POINT of
  *      the whole batch: every earlier step is idempotent on replay
  *      (index append has its own ledger; the mart upsert recomputes
  *      absolute totals from pre-batch state), so a crash anywhere
  *      re-runs the batch without double-counting;
  *   5. MART — a per-language (docs, chars) rollup of the NOVEL set,
  *      incrementally maintained by upsert (q123's merge shape,
  *      [[GraftTable.merge]]).
  *
  * The gate output folds verdict counts per language NEXT TO the
  * mart's maintained totals and hash-checks both against a DuckDB
  * recomputation from raw documents — a drift in any stage (a lost
  * change event, a double-processed batch, a wrong verdict, a stale
  * mart) breaks the hash. Duplicates are injected deterministically
  * (the synthetic corpus has unique fingerprints): every 7th doc is
  * re-posted in the LAST batch (→ dup_of_history) and every 11th is
  * re-posted in its OWN batch (→ dup_in_batch).
  *
  * Scale shape: per-night work is batch-sized + index-sized — the
  * fingerprint join shuffles tonight's batch against the index on
  * `fp`, the mart upsert is key-window-local, and history text is
  * never reopened. At 100 TB the ingest table is the lake; this
  * pipeline reads only its nightly delta. */
object CurationGate {

  /** Quarantine rule: trimmed text shorter than this many chars. */
  val QuarantineLen = 120

  def q255CdcCuration(s: SparkSession, dir: String): DataFrame = {
    val base = graft.Scratch.dir(s, "gtable")
    val run = java.lang.Long.toHexString(System.nanoTime)
    val ingest = s"$base/cur_ingest_$run"
    val idxR = s"$base/cur_idx_$run"
    val verR = s"$base/cur_ver_$run"
    val martR = s"$base/cur_mart_$run"
    val ckpt = s"$base/cur_ckpt_$run"

    buildIngest(s, dir, ingest)

    // 2-5. drain the change feed one commit per micro-batch, curating
    // each nightly delta against the persisted index/mart state
    curate(s, ingest, idxR, verR, martR, ckpt)

    // gate: verdict counts per language NEXT TO the maintained mart —
    // both must equal the oracle's recomputation from raw documents
    val ver = GraftTable.forPath(s, verR).read()
    val mart = GraftTable.forPath(s, martR).read()
      .select(col("lang"), col("n_docs").as("mart_docs"),
        col("n_chars").as("mart_chars"))
    ver.groupBy(col("lang"))
      .agg(
        count(when(col("status") === "quarantined", 1))
          .as("n_quarantined"),
        count(when(col("status") === "dup_of_history", 1))
          .as("n_dup_hist"),
        count(when(col("status") === "dup_in_batch", 1))
          .as("n_dup_batch"),
        count(when(col("status") === "novel", 1)).as("n_novel"))
      .join(mart, Seq("lang"), "left")
      .select(col("lang"), col("n_quarantined"), col("n_dup_hist"),
        col("n_dup_batch"), col("n_novel"),
        coalesce(col("mart_docs"), lit(0L)).as("mart_docs"),
        coalesce(col("mart_chars"), lit(0L)).as("mart_chars"))
      .orderBy(col("lang"))
  }

  /** Corpus with injected duplicates (the synthetic fingerprints are
    * all unique), ingested as THREE data-changing commits — every 7th
    * doc re-posted in the LAST batch (dup_of_history), every 11th in
    * its OWN batch (dup_in_batch); batch labels derive from the
    * ORIGINAL id, before re-keying. */
  private[graft] def buildIngest(s: SparkSession, dir: String,
      ingest: String): Unit = {
    val docs = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"))
    val corpus = docs
      .withColumn("b", (col("doc_id") % 3).cast("int"))
      .unionByName(docs.where(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          col("text"), col("lang"), lit(2).as("b")))
      .unionByName(docs.where(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          col("text"), col("lang"),
          (col("doc_id") % 3).cast("int").as("b")))
    val tIn = GraftTable.create(s, ingest,
      corpus.where(col("b") === 0).drop("b"),
      statsCols = Seq("doc_id"), numFiles = 2)
    tIn.append(corpus.where(col("b") === 1).drop("b"), numFiles = 2)
    tIn.append(corpus.where(col("b") === 2).drop("b"), numFiles = 2)
    ()
  }

  /** Drain `ingest`'s change feed one commit per micro-batch through
    * [[curateBatch]] — separated so specs can REPLAY the whole feed
    * (fresh checkpoint, same state roots) and pin that the ledgers
    * make the second pass a no-op. */
  private[graft] def curate(s: SparkSession, ingest: String,
      idxR: String, verR: String, martR: String,
      ckpt: String): Unit = {
    val q = s.readStream.format("gtable")
      .option("readChangeFeed", "true")
      .option("maxVersionsPerTrigger", "1")
      .load(ingest)
      .writeStream
      .foreachBatch {
        (bdf: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            batchId: Long) => curateBatch(s, bdf, batchId,
          idxR, verR, martR)
      }
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** One nightly batch through quarantine → dedup-vs-index → verdict
    * append → index fold → mart upsert. Exactly-once: the verdict
    * append is the batch's commit point (its ledger is checked first
    * and written last); every earlier effect is idempotent on replay. */
  private def curateBatch(s: SparkSession,
      bdf: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
      batchId: Long, idxR: String, verR: String,
      martR: String): Unit = {
    val verT = GraftTable.openOrCreate(s, verR, Seq("doc_id"))
    if (verT.appliedBatches.contains(batchId)) return // replayed batch
    val idxT = GraftTable.openOrCreate(s, idxR, Seq("fp"))

    val batch = bdf.where(col("_change_type") === "insert")
      .select(col("doc_id"), col("text"), col("lang"))
      .withColumn("quar",
        length(trim(col("text"))) < QuarantineLen)
      .withColumn("fp", fingerprint(col("text")))
      .withColumn("nch", length(col("text")).cast("long"))
      .cache()
    try {
      // q168's rules against the PERSISTED index (history text never
      // rescanned)
      val hist =
        if (GraftTable.versionAt(idxR) == 0)
          s.emptyDataFrame.select(lit("").as("fp"),
            lit(0L).as("hist_canonical")).limit(0)
        else idxT.read()
          .select(col("fp"), col("canonical").as("hist_canonical"))
      val clean = batch.where(!col("quar"))
      val batchFirst = clean.groupBy(col("fp"))
        .agg(min(col("doc_id")).as("batch_first"))
      val verdicts = batch
        .join(hist, Seq("fp"), "left")
        .join(batchFirst, Seq("fp"), "left")
        .select(col("doc_id"), lit(batchId).cast("long").as("b"),
          col("lang"), col("nch"), col("fp"),
          when(col("quar"), lit("quarantined"))
            .when(col("hist_canonical").isNotNull,
              lit("dup_of_history"))
            .when(col("batch_first") < col("doc_id"),
              lit("dup_in_batch"))
            .otherwise(lit("novel")).as("status"),
          when(col("quar"), lit(null).cast("long"))
            .when(col("hist_canonical").isNotNull,
              col("hist_canonical"))
            .when(col("batch_first") < col("doc_id"),
              col("batch_first"))
            .otherwise(lit(null).cast("long")).as("canonical_id"))
        .cache()
      val novel = verdicts.where(col("status") === "novel")

      // 3b. fold tonight's novel fingerprints into the index
      // (ledgered: a replay after this landed appends nothing)
      idxT.appendIfAbsent(novel.select(col("fp"),
        col("doc_id").as("canonical")), batchId, numFiles = 1)

      // 5. mart upsert — ABSOLUTE totals recomputed from pre-batch
      // verdict state + tonight's novel set, so a replayed merge
      // writes the same rows (idempotent)
      val priorNovel =
        if (GraftTable.versionAt(verR) == 0)
          novel.limit(0).select(col("lang"), col("nch"))
        else verT.read().where(col("status") === "novel")
          .select(col("lang"), col("nch"))
      val totals = priorNovel
        .unionByName(novel.select(col("lang"), col("nch")))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("nch")).as("n_chars"))
      if (GraftTable.versionAt(martR) == 0) {
        GraftTable.create(s, martR, totals,
          statsCols = Seq("lang"), numFiles = 1); ()
      } else {
        GraftTable.forPath(s, martR).merge(totals, Seq("lang"),
          numFiles = 1); ()
      }

      // 4. COMMIT POINT: the batch's verdicts land exactly once
      verT.appendIfAbsent(verdicts.drop("fp"), batchId, numFiles = 1)
      verdicts.unpersist()
      ()
    } finally { batch.unpersist(); () }
  }
}
