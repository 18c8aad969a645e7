package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming surface (an extension — the reference is pure
  * scheduled batch, SURVEY §2.10; its capability equivalent is the
  * incremental date-window + dynamic-overwrite pipeline in graft.etl).
  *
  * The same `events` table drives both modes: `readStream` over the
  * parquet path with an explicit schema, watermarked event-time window
  * aggregation, and a `flatMapGroupsWithState` per-user session counter
  * as the custom-state example. `Trigger.AvailableNow` + memory sink
  * lets a batch of parquet drive the streaming query synchronously in
  * tests.
  */
object EventStream {

  /** The file-stream source needs a declared schema, but the upstream
    * writer's `ts` layout varies (TIMESTAMP(NANOS)-read-as-long vs
    * TIMESTAMP_NTZ vs TIMESTAMP — same zoo [[graft.Tables.load]]
    * handles). Probe the files' actual schema with ONE batch footer read,
    * declare exactly that to the stream, then apply the matching
    * canonical rebuild. Hardcoding any single layout breaks the moment
    * the writer changes (it did). */
  def eventsFileSchema(spark: SparkSession, dir: String): StructType = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.option("pathGlobFilter", "events.parquet").parquet(dir).schema
  }

  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = eventsFileSchema(spark, dir)
    val raw = spark.readStream
      .schema(schema)
      // file-stream source wants a directory; select just the events
      // table out of the shared sf dir
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    graft.Tables.normalizeEventTs(raw)
  }

  /** Watermarked hourly windowed aggregation — the streaming twin of
    * CoreQueries.q19HourlyEvents. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(col("event_id")).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Run a streaming query to completion against the (static) backlog
    * and return the materialized result from the memory sink.
    *
    * `noData = false` skips the trailing NO-DATA micro-batch (the one
    * AvailableNow runs after the backlog drains to advance the
    * watermark and evict state). For a COMPLETE-mode aggregation the
    * batch is pure cost: the sink already holds the full result and
    * the query stops right after, so the evicted state is discarded
    * anyway — but it costs one more full state-store pass (the job
    * profiler measured 0.9–1.0 s: one state reload+commit per store
    * partition × two stateful operators in q195), and at cluster
    * scale that pass reloads every state partition across the
    * cluster. Queries whose OUTPUT depends on the final watermark
    * advance (append-mode windows, q197's event-time timeouts) must
    * keep the default. */
  def runToCompletion(agg: DataFrame, name: String,
      mode: OutputMode = OutputMode.Complete(),
      noData: Boolean = true): DataFrame = {
    val spark = agg.sparkSession
    val key = "spark.sql.streaming.noDataMicroBatches.enabled"
    val saved = spark.conf.getOption(key)
    if (!noData) spark.conf.set(key, "false")
    try {
      val q = agg.writeStream
        .outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally if (!noData) {
      saved match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
    spark.table(name)
  }

  /** Durable streaming sink: append the transformed stream to
    * partitioned parquet with a checkpoint — the streaming twin of the
    * batch pipeline's bronze write. The checkpoint's WAL + file-sink
    * manifest give exactly-once file output across restarts
    * (re-running after a crash resumes from the last committed batch
    * instead of re-appending); `Trigger.AvailableNow` drains the
    * backlog and stops, which is also the idiomatic scheduled-batch
    * replacement for the reference's monthly cron ingest. */
  def runToParquet(df: DataFrame, outDir: String, checkpointDir: String,
      partitionCols: Seq[String]): Unit = {
    val q = df.writeStream
      .outputMode(OutputMode.Append())
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .partitionBy(partitionCols: _*)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Streaming exact dedup: first event wins per `event_id`, with state
    * bounded by the watermark (late duplicates beyond 2 hours are
    * dropped by the engine instead of accumulating state forever — the
    * property that makes streaming dedup viable on an unbounded 100 TB
    * feed; unbounded `dropDuplicates` state would OOM). */
  def dedupedEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Session-window aggregation: activity sessions per user closed by a
    * 30-minute gap — the event-time-native grouping for "visits" that a
    * fixed window can't express. */
  def userSessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(col("event_id")).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .select(
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"),
        col("user_id"), col("n_events"), col("total_value"))

  /** Stream-static enrich join: the event stream left-joined to a
    * static dimension snapshot (per-user lifetime order stats). The
    * static side is planned once and broadcast into every micro-batch —
    * no stream-side shuffle, no state store — which is how a 100 TB/day
    * feed takes a dimension without buffering anything. The static
    * snapshot is re-read per RESTART (not per batch); a slowly-changing
    * dim at scale would swap in the SCD2 current-rows view
    * (CorpusOps.q64 semantics) under the same plan. */
  def enrichedEvents(events: DataFrame, userDim: DataFrame): DataFrame =
    events.join(
      broadcast(userDim.select(col("user_key"), col("n_orders"),
        col("lifetime_value"))),
      events("user_id") === col("user_key"), "left")
      .drop("user_key")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), col("n_orders"), col("lifetime_value"))

  /** Stream-stream interval join: each click joined to the same user's
    * purchases within the hour AFTER the click. Both sides carry
    * watermarks and the join condition bounds purchase time to
    * [click, click+1h] — the two ingredients Structured Streaming needs
    * to know when buffered state for either side is complete and can be
    * evicted (an unbounded stream-stream join would otherwise keep every
    * row forever). Inner join: emitted as soon as both sides arrive. */
  def clickToPurchase(events: DataFrame): DataFrame = {
    val clicks = events.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "2 hours")
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
      .withWatermark("purchase_ts", "2 hours")
    clicks.join(purchases,
      col("c_user") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("click_id"), col("purchase_id"), col("c_user").as("user_id"),
        (unix_timestamp(col("purchase_ts")) - unix_timestamp(col("click_ts")))
          .as("secs_to_purchase"), col("purchase_value"))
  }

  /** Stream-stream LEFT OUTER interval join: like [[clickToPurchase]],
    * but clicks with NO purchase inside their hour still emit — with
    * null purchase columns — once the watermark passes the click's
    * join window and the engine can PROVE no match is coming. That
    * emission-on-watermark-expiry is the distinctive stateful
    * behavior: an outer stream-stream join without watermarks +
    * time bounds is rejected outright, because unmatched-row results
    * would never be final. Conversion analytics needs exactly this
    * shape (matched AND unmatched clicks in one pass). */
  def clickToPurchaseOuter(events: DataFrame): DataFrame = {
    val clicks = events.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "2 hours")
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
      .withWatermark("purchase_ts", "2 hours")
    clicks.join(purchases,
        col("c_user") === col("p_user") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"),
        "left_outer")
      .select(col("click_id"), col("c_user").as("user_id"),
        col("purchase_id"),
        (unix_timestamp(col("purchase_ts")) - unix_timestamp(col("click_ts")))
          .as("secs_to_purchase"), col("purchase_value"))
  }

  // ---- custom state: per-user activity sessions ----------------------

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)
  case class UserStats(user_id: Long, n_events: Long, total_value: Double)

  /** flatMapGroupsWithState: running per-user totals, emitted on every
    * trigger. State is one small struct per key — bounded by the user
    * cardinality, the scalable shape for streaming state. */
  def userStats(events: DataFrame): Dataset[UserStats] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(),
        GroupStateTimeout.NoTimeout())(updateUser)
  }

  private def updateUser(userId: Long, events: Iterator[Event],
      state: GroupState[UserStats]): Iterator[UserStats] = {
    val prev = state.getOption.getOrElse(UserStats(userId, 0L, 0.0))
    var n = prev.n_events
    var total = prev.total_value
    events.foreach { e => n += 1; total += e.value }
    val next = UserStats(userId, n, total)
    state.update(next)
    Iterator(next)
  }

  /** Streaming incremental aggregate view — the streaming twin of
    * q123's state merge: each micro-batch folds its per-user partial
    * aggregate (count + DECIMAL value sum) into a parquet view by
    * union + re-group, so the view is always the exact aggregate of
    * everything ingested and history is never rescanned.
    *
    * EXACTLY-ONCE via versioned dirs + an atomic pointer commit:
    * foreachBatch is at-least-once under retries, and a blind re-merge
    * of a replayed batch would double-count. Each merge writes a NEW
    * immutable version dir (`<view>.versions/v<batchId>`), then commits
    * by atomically renaming a pointer file (`<view>.current`) that
    * records BOTH the live version and the full applied-batch set in
    * one filesystem operation. A crash before the rename leaves the old
    * pointer (old view + old applied set → the batch replays into a
    * fresh overwrite of its version dir); a crash after the rename is
    * already committed (the replayed batch is in the applied set and is
    * skipped). There is no window where the view is deleted or the
    * ledger disagrees with the data — the old delete-then-rename swap
    * had both. Same recipe table formats use: immutable data files, one
    * atomic metadata pointer flip. State merges associatively (counts
    * add, DECIMAL sums add), so the view equals the batch groupBy
    * bit-for-bit — spec-asserted across multi-batch runs and a full
    * checkpoint replay. Read with [[readUserView]]. */
  def incrementalUserView(events: DataFrame, viewPath: String,
      checkpointDir: Option[String] = None): Unit = {
    val writer0 = events.writeStream.outputMode(OutputMode.Append())
    val q = checkpointDir.fold(writer0)(c =>
      writer0.option("checkpointLocation", c))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val prev = readPointer(viewPath)
        if (!prev.exists(_._2.contains(batchId))) {
          val spark = batch.sparkSession
          val delta = batch.groupBy(col("user_id"))
            .agg(count(lit(1)).as("n_events"),
              sum(col("value").cast("decimal(18,4)")).as("total_value"))
            .select(col("user_id"), col("n_events"),
              col("total_value").cast("decimal(28,4)").as("total_value"))
          val merged = prev match {
            case Some((dir, _)) =>
              spark.read.parquet(dir).unionByName(delta)
                .groupBy(col("user_id"))
                .agg(sum(col("n_events")).as("n_events"),
                  sum(col("total_value")).cast("decimal(28,4)")
                    .as("total_value"))
            case None => delta
          }
          val versionDir = s"$viewPath.versions/v$batchId"
          // overwrite: a partial dir from a crashed attempt is replaced
          merged.write.mode("overwrite").parquet(versionDir)
          commitPointer(viewPath, versionDir,
            prev.map(_._2).getOrElse(Set.empty) + batchId)
          // committed — old versions are garbage, best-effort removal
          prev.foreach { case (old, _) => deleteRecursively(
            new java.io.File(old)) }
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** The committed incremental view (resolves the pointer file). */
  def readUserView(spark: SparkSession, viewPath: String): DataFrame =
    readPointer(viewPath) match {
      case Some((dir, _)) => spark.read.parquet(dir)
      case None => throw new java.io.FileNotFoundException(
        s"no committed view at $viewPath")
    }

  /** Batch ids the committed view has already folded in. */
  def appliedBatches(viewPath: String): Set[Long] =
    readPointer(viewPath).map(_._2).getOrElse(Set.empty)

  /** Streaming exact-dedup index — q168's (fingerprint → canonical)
    * index maintained incrementally over an ARRIVING document stream,
    * closing the batch↔streaming loop on dedup: q168 assumes the
    * index exists; this is the operator that keeps it current without
    * ever rescanning history text.
    *
    * Index schema: `fp` (TextFunctions.fingerprint of the doc text),
    * `canonical` (the LOWEST doc_id ever ingested holding the
    * fingerprint — a min-monoid, so the committed index is identical
    * however the stream was chunked into micro-batches; arrival-order
    * first-wins would make the index depend on batch boundaries),
    * `n_docs` (total docs ever ingested with it). Both merge fields
    * are associative+commutative, so the index equals the one-shot
    * batch recompute bit-for-bit — spec-asserted.
    *
    * Exactly-once via [[incrementalUserView]]'s versioned-dir +
    * atomic-pointer-flip commit: foreachBatch replays under retries,
    * and the applied-batch ledger rides in the same atomic rename as
    * the data pointer. Per batch the cost is batch-fingerprinting +
    * one index-sized merge (at 100 TB: the merge rewrites only the
    * index, which is fingerprint-sized, not corpus-text-sized; a
    * partitioned index + dynamic overwrite of touched buckets is the
    * documented growth path).
    *
    * `onBatch(batchId, novel, dupHistory, dupInBatch)` reports each
    * micro-batch's q168-style verdict counts against the index as of
    * the previous commit — the ingest-health signal a pipeline
    * alerts on. */
  def streamingDedupIndex(docs: DataFrame, indexPath: String,
      checkpointDir: Option[String] = None,
      onBatch: (Long, Long, Long, Long) => Unit = (_, _, _, _) => ())
      : Unit = {
    val writer0 = docs.writeStream.outputMode(OutputMode.Append())
    val q = checkpointDir.fold(writer0)(c =>
      writer0.option("checkpointLocation", c))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val prev = readPointer(indexPath)
        if (!prev.exists(_._2.contains(batchId))) {
          val spark = batch.sparkSession
          val fps = batch.select(col("doc_id"),
            graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
          val delta = fps.groupBy(col("fp"))
            .agg(min(col("doc_id")).as("canonical"),
              count(lit(1)).as("n_docs"))
          val prevIdx = prev.map { case (dir, _) => spark.read.parquet(dir) }
          // verdict counts vs the PREVIOUS commit — observability only;
          // correctness rides on the ledger-guarded merge below
          val statused = prevIdx match {
            case Some(idx) => fps.join(
              idx.select(col("fp"), lit(true).as("in_hist")), Seq("fp"),
              "left")
            case None => fps.withColumn("in_hist", lit(null).cast("boolean"))
          }
          val wMin = org.apache.spark.sql.expressions.Window
            .partitionBy(col("fp"))
          val c0 = statused
            .withColumn("batch_min", min(col("doc_id")).over(wMin))
            .agg(
              coalesce(sum(when(col("in_hist").isNotNull, 1L)
                .otherwise(0L)), lit(0L)).as("dup_hist"),
              coalesce(sum(when(col("in_hist").isNull &&
                col("doc_id") > col("batch_min"), 1L)
                .otherwise(0L)), lit(0L)).as("dup_batch"),
              coalesce(sum(when(col("in_hist").isNull &&
                col("doc_id") === col("batch_min"), 1L)
                .otherwise(0L)), lit(0L)).as("novel"))
            .head()
          onBatch(batchId, c0.getAs[Long]("novel"),
            c0.getAs[Long]("dup_hist"), c0.getAs[Long]("dup_batch"))
          val merged = prevIdx match {
            case Some(idx) => idx.unionByName(delta).groupBy(col("fp"))
              .agg(min(col("canonical")).as("canonical"),
                sum(col("n_docs")).as("n_docs"))
            case None => delta
          }
          val versionDir = s"$indexPath.versions/v$batchId"
          merged.write.mode("overwrite").parquet(versionDir)
          commitPointer(indexPath, versionDir,
            prev.map(_._2).getOrElse(Set.empty) + batchId)
          prev.foreach { case (old, _) =>
            deleteRecursively(new java.io.File(old)) }
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** The committed dedup index (same pointer scheme as the user view). */
  def readDedupIndex(spark: SparkSession, indexPath: String): DataFrame =
    readUserView(spark, indexPath)

  /** Streaming maintenance of q180's quantile sketch — the sketch's
    * merge property exercised for real: each micro-batch of documents
    * folds its (source, bucket) length counts into the persistent
    * sketch by `sum(cnt) / max(bmax)`, both associative+commutative,
    * so the committed sketch equals the one-shot batch
    * `Profiling.lengthBucketCounts` bit-for-bit HOWEVER the stream was
    * chunked (spec-asserted), and `Profiling.quantilesFromCounts`
    * reads quantiles off it at any moment. State is ≤40 ints per
    * source no matter how many documents ever streamed — the
    * fixed-size-forever monitoring surface a 100 TB ingest wants.
    * Exactly-once via the same versioned-dir + atomic-pointer-flip +
    * applied-batch ledger as [[incrementalUserView]]. */
  def streamingQuantileSketch(docs: DataFrame, sketchPath: String,
      checkpointDir: Option[String] = None): Unit = {
    val writer0 = docs.writeStream.outputMode(OutputMode.Append())
    val q = checkpointDir.fold(writer0)(c =>
      writer0.option("checkpointLocation", c))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val prev = readPointer(sketchPath)
        if (!prev.exists(_._2.contains(batchId))) {
          val spark = batch.sparkSession
          val delta = graft.operators.Profiling.lengthBucketCounts(batch)
          val merged = prev.map { case (dir, _) =>
            spark.read.parquet(dir) } match {
            case Some(idx) => idx.unionByName(delta)
              .groupBy(col("source"), col("bucket"))
              .agg(sum(col("cnt")).as("cnt"), max(col("bmax")).as("bmax"))
            case None => delta
          }
          val versionDir = s"$sketchPath.versions/v$batchId"
          merged.write.mode("overwrite").parquet(versionDir)
          commitPointer(sketchPath, versionDir,
            prev.map(_._2).getOrElse(Set.empty) + batchId)
          prev.foreach { case (old, _) =>
            deleteRecursively(new java.io.File(old)) }
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** The committed quantile sketch (same pointer scheme). */
  def readQuantileSketch(spark: SparkSession, sketchPath: String): DataFrame =
    readUserView(spark, sketchPath)

  /** Pointer format: line 1 = live version dir, rest = applied batch
    * ids. Parsed leniently — a missing file means "no commits yet". */
  private def readPointer(viewPath: String): Option[(String, Set[Long])] = {
    val f = new java.io.File(viewPath + ".current")
    if (!f.exists()) None
    else {
      val lines = scala.io.Source.fromFile(f).getLines()
        .filter(_.nonEmpty).toSeq
      lines.headOption.map(dir => (dir, lines.tail.map(_.toLong).toSet))
    }
  }

  /** The single commit point: write the new pointer beside the target,
    * then an atomic POSIX rename over it. */
  private def commitPointer(viewPath: String, versionDir: String,
      applied: Set[Long]): Unit = {
    val content = (versionDir +: applied.toSeq.sorted.map(_.toString))
      .mkString("", "\n", "\n")
    val tmp = java.nio.file.Paths.get(viewPath + ".current.tmp")
    java.nio.file.Files.write(tmp, content.getBytes("UTF-8"))
    java.nio.file.Files.move(tmp,
      java.nio.file.Paths.get(viewPath + ".current"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(deleteRecursively)
    }
    f.delete()
    ()
  }

  /** Streaming data-quality monitor: every micro-batch runs the same
    * declarative constraint set the batch gate uses
    * (etl.QualityChecks — ONE aggregate pass per batch) and appends a
    * per-batch tall report via `foreachBatch`. The report sink is the
    * quality history a pipeline alerts on; a bad drop is visible the
    * batch it arrives instead of at the next full-table audit. Returns
    * the collected per-batch reports. */
  def qualityMonitor(events: DataFrame,
      onReport: (Long, DataFrame) => Unit): Unit = {
    import graft.etl.QualityChecks._
    val q = events.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val rep = report(
          batch,
          rowChecks = Seq(
            RowCheck("not_null_user", col("user_id").isNull),
            RowCheck("known_type", !col("event_type").isin(
              "view", "click", "purchase", "signup", "error")),
            RowCheck("nonneg_value", col("value") < 0)),
          uniqueChecks = Seq(
            UniqueCheck("unique_event_id", Seq(col("event_id")))))
        onReport(batchId, rep)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** q189 — the streaming engine INSIDE the hash-checked correctness
    * gate: the watermarked hourly window aggregation runs as a real
    * Structured Streaming query (file-stream source → event-time
    * window state → memory sink, `AvailableNow` draining the backlog),
    * and its materialized output is oracle-compared against the batch
    * SQL — the same rows q19 produces. This pins batch/stream parity
    * with a DuckDB hash, not just a spec: the value sum rides the
    * decimal-accumulator pattern so streaming state-merge order can't
    * drift a cent. On a live feed the identical query runs with a
    * processing-time trigger and an append parquet sink
    * ([[runToParquet]]); AvailableNow is the scheduled-batch mode. */
  def q189StreamingHourly(s: SparkSession, dir: String): DataFrame = {
    val agg = readEventStream(s, dir)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(col("event_id")).as("n_events"),
        round(sum(col("value").cast("decimal(18,4)")).cast("double"), 2)
          .as("total_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n_events"), col("total_value"))
    // memory-sink names are session-global: keep each run's unique
    runToCompletion(agg, s"q189_hourly_${System.nanoTime}",
      noData = false)
  }

  /** q192 — SESSIONIZATION through the streaming engine inside the
    * hash-checked gate, the stateful-merging companion to q189's fixed
    * windows: `session_window` grows/merges per-user session state as
    * events arrive (gap 30 min; a new session starts at diff ≥ gap,
    * the [start, last+gap) half-open-interval rule), the watermark
    * bounds that state, and the drained output is oracle-compared to a
    * DuckDB gaps-and-islands reconstruction keyed by (user,
    * session_start). Fixed windows only need a hash key per bucket;
    * session windows need RANGE-MERGE state — this query pins that the
    * harder state machine produces byte-identical sessions to the
    * batch SQL, money on the decimal accumulator, durations on
    * unix-second arithmetic. */
  def q192StreamingSessions(s: SparkSession, dir: String): DataFrame = {
    val agg = readEventStream(s, dir)
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(
        count(col("event_id")).as("n_events"),
        (unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts"))))
          .as("duration_sec"),
        round(sum(col("value").cast("decimal(18,4)")).cast("double"), 2)
          .as("session_value"))
      .select(
        col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"),
        col("n_events"), col("duration_sec"), col("session_value"))
    runToCompletion(agg, s"q192_sessions_${System.nanoTime}",
      noData = false)
  }

  /** q195 — streaming DEDUPLICATION inside the hash-checked gate: the
    * event feed is read TWICE and unioned (every event arrives
    * duplicated — the at-least-once delivery every real feed exhibits),
    * `dropDuplicatesWithinWatermark` collapses the dups with
    * watermark-bounded state (unbounded dropDuplicates state would OOM
    * on an infinite feed), and the downstream hourly aggregation is
    * hash-compared to the batch oracle over the ORIGINAL table — the
    * output is correct only if every duplicate was dropped and no
    * original lost. Also exercises chained stateful operators
    * (dedup → windowed agg) in one streaming query. */
  def q195StreamingDedup(s: SparkSession, dir: String): DataFrame = {
    val twice = readEventStream(s, dir)
      .unionByName(readEventStream(s, dir))
    val agg = twice
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(col("event_id")).as("n_events"),
        round(sum(col("value").cast("decimal(18,4)")).cast("double"), 2)
          .as("total_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n_events"), col("total_value"))
    runToCompletion(agg, s"q195_dedup_${System.nanoTime}",
      noData = false)
  }

  /** q196 — the stream-static enrich join inside the hash-checked gate:
    * the event stream takes a per-user lifetime-order dimension (batch
    * aggregate of `orders`) through [[enrichedEvents]]'s broadcast
    * left join — planned once, no stream-side shuffle, no state store —
    * and the known-vs-anonymous revenue split is hash-compared to the
    * batch SQL. This is the streaming twin of the batch pipeline's
    * dimension enrichment: at 100 TB/day the feed takes the dim without
    * buffering a single stream row. */
  def q196StreamStaticJoin(s: SparkSession, dir: String): DataFrame = {
    val userDim = graft.Tables.load(s, dir, "orders")
      .groupBy(col("o_custkey").as("user_key"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast("decimal(18,4)"))
          .cast("double"), 2).as("lifetime_value"))
    val agg = enrichedEvents(readEventStream(s, dir), userDim)
      .groupBy(col("event_type"),
        col("n_orders").isNotNull.as("known_user"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,4)")).cast("double"), 2)
          .as("total_value"))
    runToCompletion(agg, s"q196_enrich_${System.nanoTime}")
  }

  // ---- q197: custom event-time session state with timeouts -----------

  case class SessionState(startUs: Long, lastUs: Long, n: Long)
  case class ClosedSession(user_id: Long, session_start: String,
    n_events: Long, duration_sec: Long)

  private val SessionGapMs = 30L * 60 * 1000
  private val SessionFmt = new java.text.SimpleDateFormat(
    "yyyy-MM-dd HH:mm:ss") { setTimeZone(java.util.TimeZone.getTimeZone("UTC")) }

  private def fmtUs(us: Long): String = SessionFmt.synchronized {
    SessionFmt.format(new java.util.Date(us / 1000))
  }

  private def closed(userId: Long, st: SessionState): ClosedSession =
    ClosedSession(userId, fmtUs(st.startUs), st.n,
      st.lastUs / 1000000 - st.startUs / 1000000)

  private def sessionize(userId: Long, events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[ClosedSession] = {
    if (state.hasTimedOut) {
      // the watermark passed last_event + gap: the open session is over
      val out = state.getOption.map(closed(userId, _)).iterator
      state.remove()
      out
    } else {
      // within a batch the iterator is UNORDERED — sort by event time
      // (bounded per user per batch; the state itself stays O(1))
      val sorted = events.toArray.sortBy(e => (e.ts.getTime, e.event_id))
      val out = scala.collection.mutable.ArrayBuffer[ClosedSession]()
      var cur = state.getOption
      sorted.foreach { e =>
        val us = e.ts.getTime * 1000
        cur match {
          case Some(st) if us / 1000 - st.lastUs / 1000 >= SessionGapMs =>
            out += closed(userId, st)
            cur = Some(SessionState(us, us, 1))
          case Some(st) =>
            cur = Some(SessionState(st.startUs, math.max(st.lastUs, us),
              st.n + 1))
          case None =>
            cur = Some(SessionState(us, us, 1))
        }
      }
      cur.foreach { st =>
        state.update(st)
        state.setTimeoutTimestamp(st.lastUs / 1000 + SessionGapMs)
      }
      out.iterator
    }
  }

  /** q197 — CUSTOM event-time state through the hash-checked gate:
    * sessions built by hand in `flatMapGroupsWithState` (O(1) state per
    * user: start/last/count), closed sessions emitted as soon as the
    * in-batch gap exceeds 30 minutes, and the final OPEN session per
    * user closed by an EVENT-TIME TIMEOUT — the no-data micro-batch
    * that AvailableNow runs after draining advances the watermark to
    * max(ts) − 10 min and fires every timeout whose last_event + gap
    * lies behind it. The oracle states the full gaps-and-islands
    * sessionization MINUS the sessions still open at that watermark —
    * so the hash pins the timeout semantics themselves (which sessions
    * a timeout closes, at millisecond watermark precision), not just
    * the session arithmetic. Value sums are deliberately absent: this
    * query isolates the state machine; money rides q192. */
  def q197CustomStateSessions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = readEventStream(s, dir)
      .withWatermark("ts", "10 minutes")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(sessionize)
    runToCompletion(out.toDF(), s"q197_sessions_${System.nanoTime}",
      OutputMode.Append())
  }

  /** q204 — the EXACTLY-ONCE incremental view in the gate: the event
    * stream folds per-user partial aggregates into
    * [[incrementalUserView]]'s parquet view (immutable version dirs,
    * one atomic pointer rename committing both the live version and
    * the applied-batch set), and the committed view is hash-compared
    * to the batch aggregate over everything ingested. The merge
    * machinery — replay-skip ledger, version swap, DECIMAL state
    * addition — was previously only spec-tested; the gate now pins
    * that the view IS the aggregate, bit for bit. A fresh scratch
    * path per run keeps the fold deterministic. */
  def q204IncrementalView(s: SparkSession, dir: String): DataFrame = {
    val view = s"${graft.Scratch.dir(s, "q204")}/userview_${System.nanoTime}"
    incrementalUserView(readEventStream(s, dir), view)
    readUserView(s, view)
      .select(col("user_id"), col("n_events"),
        round(col("total_value").cast("double"), 2).as("total_value"))
  }

  /** Stream the event backlog into a [[graft.format.GraftTable]] with
    * exactly-once semantics: each micro-batch appends through
    * `appendIfAbsent`, whose batch-id ledger rides the format's own
    * atomic put-if-absent snapshot commit (q204's versioned-view
    * recipe generalized to the table layer). After the drain, batch 0
    * is deliberately REPLAYED — the at-least-once delivery a real
    * foreachBatch retry produces — and the ledger must swallow it.
    * Used by q210; the replay makes the hash gate pin exactly-once,
    * not just at-least-once. */
  def streamIntoTable(s: SparkSession, dir: String,
      tableRoot: String): Unit = {
    val t = graft.format.GraftTable.openOrCreate(s, tableRoot,
      statsCols = Seq("ts"))
    // The replay copy of batch 0 is MATERIALIZED inside foreachBatch (a
    // micro-batch DataFrame is only defined within its invocation —
    // re-running it after the query terminates would recompute against
    // a dead source if cached blocks were evicted).
    val replayDir = s"$tableRoot/_replay_batch0"
    val q = readEventStream(s, dir).writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        if (id == 0) batch.write.mode("overwrite").parquet(replayDir)
        t.appendIfAbsent(batch, id, numFiles = 2)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // simulate the retry: re-deliver batch 0 verbatim from the copy
    if (new java.io.File(replayDir).isDirectory) {
      t.appendIfAbsent(s.read.parquet(replayDir), 0L, numFiles = 2)
      ()
    }
  }

  /** q201 — the STREAMING half of the custom v2 connector in the gate:
    * the eventlog directory is consumed through
    * [[graft.sources.EventLogMicroBatchStream]] — sorted file list as
    * the log, "files consumed" as the offset, per-batch partitions
    * planned between offsets, the same per-file readers as the batch
    * scan — and the hourly aggregation over it is hash-compared to the
    * batch oracle over the ORIGINAL parquet (the q19 rows again: the
    * hash holds only if offset bookkeeping loses and duplicates
    * nothing). This closes the connector demonstration from both ends:
    * q198 proves the batch scan, q201 proves the streaming contract
    * (initialOffset → latestOffset → plan → commit) on the same
    * format. */
  def q201StreamingConnector(s: SparkSession, dir: String): DataFrame = {
    val scratch = graft.operators.ScaleOps.stageEventlog(s, dir)
    val stream = s.readStream
      .format(classOf[graft.sources.EventLogSource].getName)
      .option("path", scratch).load()
    val agg = stream
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(col("event_id")).as("n_events"),
        round(sum(col("value").cast("decimal(18,4)")).cast("double"), 2)
          .as("total_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n_events"), col("total_value"))
    runToCompletion(agg, s"q201_connector_${System.nanoTime}")
  }
}
