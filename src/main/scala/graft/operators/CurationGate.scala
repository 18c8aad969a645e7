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
  *      data-changing commits of one gtable (the reference's
  *      incremental window load, aws-glue-etl-sample-hist
  *      `scripts/jb_de_enhancement_t0_fact_d2s.py:23,69-70`,
  *      re-expressed as table-format commits);
  *   2. CHANGE FEED — `readStream(readChangeFeed)` with
  *      `maxVersionsPerTrigger=1` drains the ingest history ONE
  *      COMMIT PER MICRO-BATCH, so each nightly batch is curated
  *      exactly once, in commit order (q247's stream + q254's
  *      admission control);
  *   3. CURATE — per batch: a QUARANTINE rule (short text), then
  *      q168's incremental dedup against a PERSISTED fingerprint
  *      index table (history text is never rescanned — the index is
  *      the only state, and tonight's novel set is appended to it,
  *      each row STAMPED with its batch id so a replay reads only
  *      strictly-earlier batches as history);
  *   4. VERDICTS — one row per ingested doc
  *      (quarantined/dup_of_history/dup_in_batch/novel + canonical),
  *      appended per batch through the applied-batch ledger
  *      ([[GraftTable.appendIfAbsent]], q210);
  *   5. MART — a per-language (docs, chars) rollup of the NOVEL set,
  *      maintained O(batch): read the current totals (one row per
  *      language), add tonight's deltas, land them through the
  *      mart's OWN ledger ([[GraftTable.mergeIfAbsent]]).
  *
  * EXACTLY-ONCE, per state table: each of the three writes (index
  * append, mart merge, verdict append) carries the batch id in its
  * own table's applied-batch ledger, IN the same atomic commit as
  * its data — so a crash between ANY two of them replays the batch
  * with the already-landed writes as no-ops. The replay recomputes
  * identical verdicts because the history read excludes the current
  * batch's own index rows (`b < batchId` — ADVICE r14: without the
  * stamp, a crash between the index and verdict appends made the
  * replay see tonight's novel fingerprints as history and classify
  * every novel doc as a dup of itself).
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
  * `fp`, the mart maintenance reads one row per language and merges
  * only tonight's touched languages (VERDICT r14 #1: it previously
  * recomputed absolute totals from the FULL verdict history, a
  * per-night cost that grew with the corpus; CurationGateSpec now
  * pins that the batch loop never reads the verdict table at all),
  * and history text is never reopened. At 100 TB the ingest table is
  * the lake; this pipeline reads only its nightly delta. */
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
    // cached: the three nightly commits each execute their slice of
    // the SAME injected corpus — uncached, that is three full
    // document scans + union trees instead of one (gate setup, not
    // the pipeline under test; identical bytes land either way)
    val c = corpus(s, dir).cache()
    try {
      val tIn = GraftTable.create(s, ingest,
        c.where(col("b") === 0).drop("b"),
        statsCols = Seq("doc_id"), numFiles = 2)
      tIn.append(c.where(col("b") === 1).drop("b"), numFiles = 2)
      tIn.append(c.where(col("b") === 2).drop("b"), numFiles = 2)
      ()
    } finally { c.unpersist(); () }
  }

  /** The duplicate-injected corpus `(doc_id, text, lang, b)` —
    * separated so specs can drive [[curateBatch]] directly (batch by
    * batch, with crash injection) on exactly the ingested batches. */
  private[graft] def corpus(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"))
    docs
      .withColumn("b", (col("doc_id") % 3).cast("int"))
      .unionByName(docs.where(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          col("text"), col("lang"), lit(2).as("b")))
      .unionByName(docs.where(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          col("text"), col("lang"),
          (col("doc_id") % 3).cast("int").as("b")))
  }

  /** Drain `ingest`'s change feed one commit per micro-batch through
    * [[curateBatch]] — separated so specs can REPLAY the whole feed
    * (fresh checkpoint, same state roots) and pin that the ledgers
    * make the second pass a no-op. `onBatch` receives each batch's
    * wall seconds (the bench's flatness series; default no-op). */
  private[graft] def curate(s: SparkSession, ingest: String,
      idxR: String, verR: String, martR: String, ckpt: String,
      onBatch: (Long, Double) => Unit = (_, _) => ()): Unit = {
    val q = s.readStream.format("gtable")
      .option("readChangeFeed", "true")
      .option("maxVersionsPerTrigger", "1")
      .load(ingest)
      .writeStream
      .foreachBatch {
        (bdf: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            batchId: Long) => {
          val t0 = System.nanoTime()
          curateBatch(s, bdf, batchId, idxR, verR, martR)
          onBatch(batchId, (System.nanoTime() - t0) / 1e9)
        }
      }
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Bench harness (VERDICT r14 #3): `nBatches` nightly batches
    * driven through the SAME change-feed drain and [[curateBatch]]
    * as q255, returning per-batch wall seconds — the flatness
    * regression guard for the O(batch) maintenance (a history-
    * rescanning regression shows as a RISING series as the index and
    * verdict history grow). Batch k is `mult` re-keyed replicas of
    * the documents table (+k·10⁷ + r·10⁵); one doc in five keeps its
    * raw text (→ exact dups across replicas and of night 0 once
    * k>0), the rest get a per-(night, replica) suffix (→ novel) — so
    * every batch is constant-sized while history grows by
    * ~0.8·|batch| fingerprints per night. */
  private[graft] def benchHistory(s: SparkSession, dir: String,
      base: String, nBatches: Int, mult: Int = 8): Seq[Double] = {
    val ingest = s"$base/bh_ingest"
    val docs = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"))
    var tIn: GraftTable = null
    (0 until nBatches).foreach { k =>
      val b = (0 until mult).map { r =>
        docs.select(
          (col("doc_id") + lit(k * 10000000L + r * 100000L))
            .as("doc_id"),
          when(col("doc_id") % 5 === 0, col("text"))
            .otherwise(concat(col("text"), lit(s" night$k rep$r")))
            .as("text"),
          col("lang"))
      }.reduce(_ unionByName _)
      if (k == 0)
        tIn = GraftTable.create(s, ingest, b,
          statsCols = Seq("doc_id"), numFiles = 2)
      else { tIn.append(b, numFiles = 2); () }
    }
    val times = new java.util.concurrent.ConcurrentHashMap[
      Long, Double]()
    graft.format.CommitProfile.reset()
    graft.format.CommitProfile.on.set(true)
    var prev = Map.empty[String, Long]
    curate(s, ingest, s"$base/bh_idx", s"$base/bh_ver",
      s"$base/bh_mart", s"$base/bh_ckpt",
      onBatch = (b, sec) => {
        times.put(b, sec)
        val now = graft.format.CommitProfile.snapshotNs
        val d = now.map { case (k, v) =>
          k -> (v - prev.getOrElse(k, 0L)) / 1e9 }
        prev = now
        System.err.println(f"CURATION b$b $sec%.2f s " + d.toSeq
          .sortBy(-_._2).map(kv => f"${kv._1}=${kv._2}%.2f")
          .mkString(" "))
        ()
      })
    graft.format.CommitProfile.on.set(false)
    (0L until nBatches.toLong).map(b => times.getOrDefault(b, -1.0))
  }

  /** One nightly batch through quarantine → dedup-vs-index → index
    * fold → mart delta-merge → verdict append. Exactly-once: every
    * state write carries the batch id in its own table's ledger (see
    * the object scaladoc); `onAfterIndexFold` is a crash-injection
    * seam for the spec (throws simulate a crash between the index
    * append and the later writes — the ADVICE r14 replay window). */
  private[graft] def curateBatch(s: SparkSession,
      bdf: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
      batchId: Long, idxR: String, verR: String,
      martR: String, onAfterIndexFold: () => Unit = () => ()): Unit = {
    val verT = GraftTable.openOrCreate(s, verR, Seq("doc_id"))
    if (verT.appliedBatches.contains(batchId)) return // replayed batch
    val idxT = GraftTable.openOrCreate(s, idxR, Seq("fp"))
    val martT = GraftTable.openOrCreate(s, martR, Seq("lang"))

    val batch = bdf.where(col("_change_type") === "insert")
      .select(col("doc_id"), col("text"), col("lang"))
      .withColumn("quar",
        length(trim(col("text"))) < QuarantineLen)
      .withColumn("fp", fingerprint(col("text")))
      .withColumn("nch", length(col("text")).cast("long"))
      .cache()
    try {
      // materialize ONCE before the dedup joins: AQE runs the
      // batch-first aggregate and the history-probe exchanges as
      // CONCURRENT stage jobs, and a cold cache makes each recompute
      // the fingerprint scan (see NeardupGate.curateBatch — same
      // profile, same fix)
      batch.count()
      // q168's rules against the PERSISTED index (history text never
      // rescanned). STRICTLY-EARLIER batches only: a replay after a
      // crash between the index append and the verdict append must
      // not read tonight's own novel fingerprints as history (ADVICE
      // r14 — they would reclassify every novel doc as dup_of_history
      // with canonical_id == its own doc_id).
      val hist =
        if (GraftTable.versionAt(idxR) == 0)
          s.emptyDataFrame.select(lit("").as("fp"),
            lit(0L).as("hist_canonical")).limit(0)
        else idxT.read().where(col("b") < batchId)
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

      // 3b. fold tonight's novel fingerprints into the index, each
      // row stamped with its batch id (the history read above keys
      // off it); ledgered: a replay after this landed appends nothing
      graft.format.CommitProfile.time("cur_idx") {
        idxT.appendIfAbsent(novel.select(col("fp"),
          col("doc_id").as("canonical"), col("b")), batchId,
          numFiles = 1)
      }
      onAfterIndexFold()

      // 5. mart delta-merge, O(batch) (VERDICT r14 #1)
      graft.format.CommitProfile.time("cur_mart") {
        martDeltaMerge(martT, martR,
          novel.select(col("lang"), col("nch")), batchId)
      }

      // 4. the batch's verdicts land exactly once
      graft.format.CommitProfile.time("cur_ver") {
        verT.appendIfAbsent(verdicts.drop("fp"), batchId,
          numFiles = 1)
      }
      verdicts.unpersist()
      ()
    } finally { batch.unpersist(); () }
  }

  /** O(batch) mart maintenance, shared by the curation gates (q255,
    * q256): current totals are ONE ROW PER KEY (language) — tonight's
    * `(lang, nch)` novel rows aggregate to deltas, join the current
    * totals, and only the TOUCHED languages are upserted, through the
    * mart's own applied-batch ledger ([[GraftTable.mergeIfAbsent]])
    * so a replayed batch is a no-op instead of a double-add (VERDICT
    * r14 #1: the previous absolute-recompute read the full verdict
    * history every night — correct, but a per-night cost that grew
    * with the corpus; this reads one mart row per language and never
    * opens the verdict table, pinned by CurationGateSpec's
    * ReadCounter assertions). */
  private[graft] def martDeltaMerge(martT: GraftTable, martR: String,
      novelLangChars: DataFrame, batchId: Long,
      keyCol: String = "lang", weightCol: String = "nch"): Unit = {
    if (martT.appliedBatches.contains(batchId)) return
    val delta = novelLangChars.groupBy(col(keyCol))
      .agg(count(lit(1)).as("d_docs"),
        sum(col(weightCol)).as("d_chars"))
    if (GraftTable.versionAt(martR) == 0) {
      // first batch: the deltas ARE the totals
      martT.appendIfAbsent(delta.select(col(keyCol),
        col("d_docs").as("n_docs"), col("d_chars").as("n_chars")),
        batchId, numFiles = 1); ()
    } else {
      // ONE execution into a driver-local frame (executeCollect): the
      // merge below then takes GraftTable's micro-merge fast path —
      // key set, stats envelope, hit set and survivor rows computed
      // on the driver, one candidate-scan job total. (Previously
      // cached: merge's COW machinery executed the update frame three
      // times — key-envelope aggregate, touched-file probe, survivor
      // write — each a ~0.1 s micro-job over ≤|languages| rows.)
      val totals = GraftTable.localFrame(novelLangChars.sparkSession,
        delta
          .join(martT.read(), Seq(keyCol), "left")
          .select(col(keyCol),
            (col("d_docs") + coalesce(col("n_docs"), lit(0L)))
              .as("n_docs"),
            (col("d_chars") + coalesce(col("n_chars"), lit(0L)))
              .as("n_chars")))
      martT.mergeIfAbsent(totals, Seq(keyCol), batchId,
        numFiles = 1); ()
    }
  }
}
