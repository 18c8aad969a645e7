package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.format.GraftTable
import graft.operators.Dedup.{bandKeys, md5Lanes}

/** q256 — NEAR-DUP COMPOSED INTO THE CDC PIPELINE (VERDICT r14 #2):
  * q255's feed-driven curation with q169's MinHash-band stage in
  * place of the exact-fingerprint stage, against a PERSISTED band
  * index with its own ledgered fold — the stage a real corpus
  * pipeline runs nightly (reference analogue: the incremental window
  * load, aws-glue-etl-sample-hist
  * `scripts/jb_de_enhancement_t0_fact_d2s.py:23,69-70`).
  *
  *   1. INGEST — three nightly batches of the near-dup-injected
  *      corpus land as three data-changing commits (every 7th doc
  *      re-posted in the LAST batch with a trailing mutation, every
  *      11th re-posted in its OWN batch with a leading mutation —
  *      similar text, different fingerprint, so only a FUZZY match
  *      can catch them);
  *   2. CHANGE FEED — drained one commit per micro-batch
  *      (`maxVersionsPerTrigger=1`), exactly as q255;
  *   3. NEAR-DUP — per batch: md5-lane MinHash signatures (q54's
  *      engine-portable lanes) band into 4 keys per doc
  *      ([[Dedup.bandKeys]]); a doc is `near_dup_of_history` when any
  *      band key collides with the PERSISTED index (canonical = the
  *      lowest colliding indexed doc), else `near_dup_in_batch` when
  *      it collides with a lower-id doc of the SAME batch (whatever
  *      that doc's own verdict — q255's batch-first convention), else
  *      `novel`. The LSH banding decision IS the verdict (the
  *      at-scale recipe — Gopher/FineWeb-style banded MinHash without
  *      pairwise verification; q169 carries the Jaccard-verified
  *      variant, and a production composition would add its
  *      bucket-size cap when index buckets grow adversarial);
  *   4. INDEX FOLD — only NOVEL docs' band rows enter the index
  *      (band, band_key, canonical, b), ledgered and batch-stamped
  *      exactly like q255's fingerprint index, so history text is
  *      never rescanned and a mid-batch crash replays exactly-once;
  *   5. MART + VERDICTS — the same O(batch) ledgered delta-merge and
  *      verdict append as q255 ([[CurationGate.martDeltaMerge]]).
  *
  * Everything is md5-seeded, so DuckDB recomputes the full 3-batch
  * index evolution (novel-only, sequential) from raw documents and
  * the gate hash-checks end-to-end — a lost event, a dup band row, a
  * wrong canonical, or a stale mart breaks the hash.
  *
  * Scale shape: per-night work is batch-sized + collision-sized —
  * the band probe equi-joins tonight's ≤4·|batch| band rows against
  * the index on (band, band_key); the index holds 4 rows per novel
  * doc EVER (signature-sized, not text-sized); the within-batch
  * self-join is batch-local. The mart reads one row per language.
  * At 100 TB: the probe shuffles only the batch and the colliding
  * index partitions (AQE handles the skewed-bucket tail; the q169
  * bucket cap bounds it adversarially). */
object NeardupGate {

  def q256CdcNeardup(s: SparkSession, dir: String): DataFrame = {
    val base = graft.Scratch.dir(s, "gtable")
    val run = java.lang.Long.toHexString(System.nanoTime)
    val ingest = s"$base/nd_ingest_$run"
    val idxR = s"$base/nd_idx_$run"
    val verR = s"$base/nd_ver_$run"
    val martR = s"$base/nd_mart_$run"
    val ckpt = s"$base/nd_ckpt_$run"

    buildIngest(s, dir, ingest)
    curate(s, ingest, idxR, verR, martR, ckpt)

    val ver = GraftTable.forPath(s, verR).read()
    val mart = GraftTable.forPath(s, martR).read()
      .select(col("lang"), col("n_docs").as("mart_docs"),
        col("n_chars").as("mart_chars"))
    ver.groupBy(col("lang"))
      .agg(
        count(when(col("status") === "near_dup_of_history", 1))
          .as("n_dup_hist"),
        count(when(col("status") === "near_dup_in_batch", 1))
          .as("n_dup_batch"),
        count(when(col("status") === "novel", 1)).as("n_novel"))
      .join(mart, Seq("lang"), "left")
      .select(col("lang"), col("n_dup_hist"), col("n_dup_batch"),
        col("n_novel"),
        coalesce(col("mart_docs"), lit(0L)).as("mart_docs"),
        coalesce(col("mart_chars"), lit(0L)).as("mart_chars"))
      .orderBy(col("lang"))
  }

  /** Near-dup-injected corpus `(doc_id, text, lang, b)`: re-posts
    * carry MUTATED text (a leading/trailing clause), so their md5
    * fingerprints differ but most MinHash bands survive — the fuzzy
    * analogue of [[CurationGate.corpus]]'s exact injections. Which
    * re-posts actually collide is decided by the md5 lanes, byte-
    * identically in both engines. */
  private[graft] def corpus(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"))
    docs
      .withColumn("b", (col("doc_id") % 3).cast("int"))
      .unionByName(docs.where(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit(" near duplicate repost"))
            .as("text"),
          col("lang"), lit(2).as("b")))
      .unionByName(docs.where(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          concat(lit("forwarded note "), col("text")).as("text"),
          col("lang"), (col("doc_id") % 3).cast("int").as("b")))
  }

  private[graft] def buildIngest(s: SparkSession, dir: String,
      ingest: String): Unit = {
    // cached: three commits, one corpus scan (see
    // CurationGate.buildIngest)
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

  /** Change-feed drain, one ingest commit per micro-batch — q255's
    * recipe verbatim, into [[curateBatch]]. */
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

  /** One nightly batch through signature → band probe → index fold →
    * mart delta-merge → verdict append. Exactly-once exactly as
    * q255's [[CurationGate.curateBatch]]: every state write carries
    * the batch id in its own table's ledger, and the history probe
    * reads only strictly-earlier batches (`b < batchId`).
    * `onAfterIndexFold` is the same crash-injection seam the q255
    * spec drives — a replay after a crash there must not read
    * tonight's own band rows as history. */
  private[graft] def curateBatch(s: SparkSession,
      bdf: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
      batchId: Long, idxR: String, verR: String,
      martR: String, onAfterIndexFold: () => Unit = () => ()): Unit = {
    val verT = GraftTable.openOrCreate(s, verR, Seq("doc_id"))
    if (verT.appliedBatches.contains(batchId)) return // replayed batch
    val idxT = GraftTable.openOrCreate(s, idxR, Seq("band_key"))
    val martT = GraftTable.openOrCreate(s, martR, Seq("lang"))

    // repartition like q54/q55/q169: a change-feed micro-batch
    // arrives in as few partitions as the commit wrote files (2
    // here), which would run the 16-lane md5 signature on 2 of the
    // cluster's cores — the signature is the batch's dominant
    // compute and must spread
    val batch = bdf.where(col("_change_type") === "insert")
      .select(col("doc_id"), col("text"), col("lang"))
      .withColumn("nch", length(col("text")).cast("long"))
      .repartition(s.sparkContext.defaultParallelism)
      .cache()
    try {
      // 4 band rows per doc; the signature is computed ONCE per doc
      // here and never again (the index stores keys, not text)
      val bands = batch
        .select(col("doc_id"),
          posexplode(bandKeys(md5Lanes(col("text")))))
        .toDF("doc_id", "band", "band_key")
        .cache()
      try {
        // materialize ONCE before the multi-consumer joins: AQE
        // submits the probe's independent exchange subtrees as
        // CONCURRENT stage jobs, and a cold cache makes each of them
        // recompute the 16-lane md5 signature — the job profiler
        // showed 4–5 parallel 2-stage jobs of 0.6–1.4 s per batch,
        // all running the same signature pipeline (the Pipeline.scala
        // count()-before-concurrent-consumers pattern)
        bands.count()
        val hist =
          if (GraftTable.versionAt(idxR) == 0)
            s.emptyDataFrame.select(lit(0).as("band"),
              lit("").as("band_key"), lit(0L).as("canonical"))
              .limit(0)
          else idxT.read().where(col("b") < batchId)
            .select(col("band"), col("band_key"), col("canonical"))
        val histHit = bands.join(hist, Seq("band", "band_key"))
          .groupBy(col("doc_id"))
          .agg(min(col("canonical")).as("hist_canonical"))
        val batchHit = bands.as("x")
          .join(bands.as("y"),
            col("x.band") === col("y.band") &&
              col("x.band_key") === col("y.band_key") &&
              col("y.doc_id") < col("x.doc_id"))
          .select(col("x.doc_id").as("doc_id"),
            col("y.doc_id").as("earlier_id"))
          .groupBy(col("doc_id"))
          .agg(min(col("earlier_id")).as("batch_first"))
        val verdicts = batch
          .join(histHit, Seq("doc_id"), "left")
          .join(batchHit, Seq("doc_id"), "left")
          .select(col("doc_id"), lit(batchId).cast("long").as("b"),
            col("lang"), col("nch"),
            when(col("hist_canonical").isNotNull,
              lit("near_dup_of_history"))
              .when(col("batch_first").isNotNull,
                lit("near_dup_in_batch"))
              .otherwise(lit("novel")).as("status"),
            coalesce(col("hist_canonical"), col("batch_first"))
              .as("canonical_id"))
          .cache()
        val novel = verdicts.where(col("status") === "novel")

        // index fold: only NOVEL docs' band rows, batch-stamped
        idxT.appendIfAbsent(
          bands.join(novel.select(col("doc_id")), Seq("doc_id"),
            "left_semi")
            .select(col("band"), col("band_key"),
              col("doc_id").as("canonical"),
              lit(batchId).cast("long").as("b")),
          batchId, numFiles = 1)
        onAfterIndexFold()

        CurationGate.martDeltaMerge(martT, martR,
          novel.select(col("lang"), col("nch")), batchId)

        verT.appendIfAbsent(verdicts, batchId, numFiles = 1)
        verdicts.unpersist()
        ()
      } finally { bands.unpersist(); () }
    } finally { batch.unpersist(); () }
  }
}
