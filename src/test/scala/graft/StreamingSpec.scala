package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventStream
import graft.operators.CoreQueries

class StreamingSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  test("q192 registry entry: streamed session windows equal the batch " +
      "gaps-and-islands reconstruction") {
    val got = EventStream.q192StreamingSessions(spark, sfDir)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val want = Tables.load(spark, sfDir, "events")
      .withColumn("prev_ts", lag("ts", 1).over(w))
      // session_window compares RAW event times: micros, not seconds
      .withColumn("new_sess",
        (col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts"))
            >= 1800000000L).cast("int"))
      .withColumn("seq", sum("new_sess").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "seq")
      .agg(
        date_format(min("ts"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        count("event_id").as("n_events"),
        (unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts"))))
          .as("duration_sec"),
        round(sum(col("value").cast("decimal(18,4)")).cast("double"), 2)
          .as("session_value"))
      .select("user_id", "session_start", "n_events", "duration_sec",
        "session_value")
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
  }

  test("q189 registry entry: the streamed hourly rows equal q19's batch " +
      "rows exactly") {
    val got = EventStream.q189StreamingHourly(spark, sfDir)
    val batch = CoreQueries.q19HourlyEvents(spark, sfDir)
    assert(got.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(got).count() === 0)
  }

  test("q195 registry entry: a duplicated feed through streaming dedup " +
      "collapses back to q19's batch rows") {
    val got = EventStream.q195StreamingDedup(spark, sfDir)
    val batch = CoreQueries.q19HourlyEvents(spark, sfDir)
    assert(got.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(got).count() === 0)
  }

  test("q197 registry entry: custom-state sessions equal the batch " +
      "reconstruction minus the sessions the final watermark leaves open") {
    val got = EventStream.q197CustomStateSessions(spark, sfDir)
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.load(spark, sfDir, "events")
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    // exact millisecond truncation (integer div — Column./ is float)
    def msOf(c: org.apache.spark.sql.Column) =
      floor(unix_micros(c) / lit(1000L)).cast("long")
    val sessions = ev
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .withColumn("new_sess",
        (col("prev_ts").isNull ||
          msOf(col("ts")) - msOf(col("prev_ts")) >= 1800000L).cast("int"))
      .withColumn("seq", sum("new_sess").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "seq")
      .agg(min("ts").as("st"), max("ts").as("en"),
        count(lit(1)).as("n_events"))
    val wmMs = ev.agg(max(msOf(col("ts")))).head().getLong(0) - 600000L
    val want = sessions
      .where(msOf(col("en")) + 1800000L < wmMs)
      .select(col("user_id"),
        date_format(col("st"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n_events"),
        (unix_timestamp(col("en")) - unix_timestamp(col("st")))
          .as("duration_sec"))
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
    // the filter is real: some sessions ARE still open at the watermark
    assert(sessions.count() > want.count())
  }

  test("q196 registry entry: the stream-static enrich equals the batch " +
      "left join, and no event ever matches more than one dim row") {
    val got = EventStream.q196StreamStaticJoin(spark, sfDir)
    // total event count is preserved by the left join (key uniqueness)
    val total = got.agg(sum("n_events")).head().getLong(0)
    val nEvents = Tables.load(spark, sfDir, "events").count()
    assert(total === nEvents)
    val dim = Tables.load(spark, sfDir, "orders")
      .groupBy(col("o_custkey").as("user_key"))
      .agg(count(lit(1)).as("n_orders"))
    val want = Tables.load(spark, sfDir, "events")
      .join(dim, col("user_id") === col("user_key"), "left")
      .groupBy(col("event_type"), col("n_orders").isNotNull.as("known_user"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,4)")).cast("double"), 2)
          .as("total_value"))
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
  }

  test("streaming hourly aggregation equals the batch query") {
    val stream = EventStream.readEventStream(spark, sfDir)
    val got = EventStream
      .runToCompletion(EventStream.hourlyAgg(stream), "hourly_test")
      .select("hour", "event_type", "n_events")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    val want = CoreQueries.q19HourlyEvents(spark, sfDir)
      .select("hour", "event_type", "n_events")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(got === want)
  }

  test("stream-static enrich join equals the batch join, no state store") {
    val userDim = Tables.load(spark, sfDir, "orders")
      .groupBy(col("o_custkey").as("user_key"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast("decimal(18,4)")).cast("double"), 2)
          .as("lifetime_value"))
      .cache()
    val stream = EventStream.readEventStream(spark, sfDir)
    val got = EventStream
      .runToCompletion(EventStream.enrichedEvents(stream, userDim),
        "enrich_test", OutputMode.Append())
      .collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Any]("n_orders")))
      .toSet
    val ev = Tables.load(spark, sfDir, "events")
    val want = ev.join(broadcast(userDim),
        ev("user_id") === userDim("user_key"), "left")
      .collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Any]("n_orders")))
      .toSet
    assert(got === want)
    // enrichment must preserve stream cardinality (left join, unique dim)
    assert(got.size === ev.count())
    userDim.unpersist()
  }

  test("parquet sink with checkpoint is exactly-once across a re-run") {
    import java.nio.file.Files
    val out = Files.createTempDirectory("graft_stream_out_").toString
    val ckpt = Files.createTempDirectory("graft_stream_ckpt_").toString
    def enriched = EventStream.readEventStream(spark, sfDir)
      .withColumn("event_date", to_date(col("ts")))
    EventStream.runToParquet(enriched, out, ckpt, Seq("event_type"))
    val n = Tables.load(spark, sfDir, "events").count()
    assert(spark.read.parquet(out).count() === n)
    // partitioned layout on disk
    assert(new java.io.File(out).listFiles()
      .exists(_.getName.startsWith("event_type=")))
    // a second run against the SAME checkpoint finds no new data:
    // the sink must not double-append (exactly-once file output)
    EventStream.runToParquet(enriched, out, ckpt, Seq("event_type"))
    assert(spark.read.parquet(out).count() === n)
  }

  test("streaming dedup matches batch dropDuplicates on event_id") {
    val stream = EventStream.readEventStream(spark, sfDir)
    // the table has unique event_ids — self-union forces a duplicate of
    // every row so first-wins dedup actually has work to do
    val doubled = stream.union(stream)
    val got = EventStream
      .runToCompletion(EventStream.dedupedEvents(doubled), "dedup_test",
        OutputMode.Append())
      .count()
    val want = Tables.load(spark, sfDir, "events")
      .dropDuplicates("event_id").count()
    assert(got === want)
  }

  test("session windows close on a 30-minute gap and match a batch " +
      "session reconstruction") {
    val stream = EventStream.readEventStream(spark, sfDir)
    val got = EventStream
      .runToCompletion(EventStream.userSessions(stream), "sessions_test")
      .select("session_start", "user_id", "n_events")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    // batch oracle: sessionize with a window-function gap scan
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts")
    val want = Tables.load(spark, sfDir, "events")
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .withColumn("new_session",
        (col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") >= 1800)
          .cast("int"))
      .withColumn("session_no", sum("new_session").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_no")
      .agg(
        date_format(min("ts"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        count("event_id").as("n_events"))
      .select("session_start", "user_id", "n_events")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got === want)
  }

  test("stream-stream interval join matches the batch interval join") {
    val stream = EventStream.readEventStream(spark, sfDir)
    val got = EventStream
      .runToCompletion(EventStream.clickToPurchase(stream), "ssjoin_test",
        OutputMode.Append())
      .select("click_id", "purchase_id", "secs_to_purchase")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    // batch oracle: the same equi+range join over the static table
    val ev = Tables.load(spark, sfDir, "events")
    val c = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("click_ts"))
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"))
    val want = c.join(p,
        col("c_user") === col("p_user") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("click_id"), col("purchase_id"),
        (unix_timestamp(col("purchase_ts")) - unix_timestamp(col("click_ts")))
          .as("secs"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got === want)
    assert(got.nonEmpty, "interval join should produce matches on testdata")
  }

  test("stream-stream LEFT OUTER join emits matches immediately and " +
      "unmatched clicks once the watermark proves them final") {
    import java.nio.file.{Files, StandardCopyOption}
    // Mutable source dir: outer-join state only finalizes in a batch
    // AFTER the watermark has advanced past a click's join window, and
    // Trigger.AvailableNow runs no trailing no-data batch — exactly
    // the production shape, where the next day's data closes out the
    // previous day's unmatched rows. Sentinel 'noop' events far in
    // the future drive the watermark forward across checkpointed
    // re-runs (which also exercises restart-resume).
    // Canonicalize the backlog once via Tables.load (it absorbs whatever
    // ts layout the upstream writer used) so sentinels and backlog share
    // a single TimestampType schema.
    val srcDir = Files.createTempDirectory("graft_outer_src_")
    Tables.load(spark, sfDir, "events").coalesce(1)
      .write.mode("overwrite").parquet(srcDir.toString)
    val canonSchema = spark.read.parquet(srcDir.toString).schema
    val outDir = Files.createTempDirectory("graft_outer_out_").toString
    val ckpt = Files.createTempDirectory("graft_outer_ckpt_").toString

    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema(canonSchema)
        .parquet(srcDir.toString)
      EventStream.runToParquet(EventStream.clickToPurchaseOuter(stream),
        outDir, ckpt, Seq.empty)
    }
    val ev = Tables.load(spark, sfDir, "events")
    val maxEpochSec = ev.agg(max(unix_timestamp(col("ts")))).head().getLong(0)
    // The watermark operators sit AFTER the click/purchase filters, so
    // a sentinel only advances them if it IS a click (left) and a
    // purchase (right) — on a user (-1) that joins nothing real.
    def addSentinel(name: String, plusHours: Int): Unit = {
      val stage = Files.createTempDirectory("graft_sentinel_")
      import spark.implicits._
      Seq((-1L, "click"), (-2L, "purchase"))
        .toDF("event_id", "event_type")
        .withColumn("ts",
          timestamp_seconds(lit(maxEpochSec + plusHours * 3600L)))
        .withColumn("user_id", lit(-1L))
        .withColumn("value", lit(0.0))
        .withColumn("props", lit("{}"))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = Files.list(stage).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      Files.copy(part, srcDir.resolve(name),
        StandardCopyOption.REPLACE_EXISTING)
    }
    runOnce()                      // backlog: matches emit, state parks
    addSentinel("s1.parquet", 10)  // watermark -> maxTs + 8h
    runOnce()                      // evicts state vs OLD watermark
    addSentinel("s2.parquet", 20)  // watermark -> maxTs + 18h
    runOnce()                      // batch runs with +8h watermark: all
                                   // remaining unmatched clicks emit
    val got = spark.read.parquet(outDir)
      .where(col("click_id") >= 0)   // drop watermark-driver sentinels
      .collect().map { r =>
        (r.getAs[Long]("click_id"),
          Option(r.getAs[java.lang.Long]("purchase_id")).map(_.toLong))
      }.toSet

    val c = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("click_ts"))
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"))
    val want = c.join(p,
        col("c_user") === col("p_user") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"),
        "left_outer")
      .select(col("click_id"), col("purchase_id")).collect().map { r =>
        (r.getAs[Long]("click_id"),
          Option(r.getAs[java.lang.Long]("purchase_id")).map(_.toLong))
      }.toSet
    assert(got === want,
      "outer-join stream must converge to the batch left-outer join")
    assert(got.exists(_._2.isEmpty), "expected some null-extended rows")
  }

  test("streaming incremental view equals the batch aggregate across " +
      "multiple micro-batches and survives a checkpoint replay") {
    import java.nio.file.Files
    // Split the backlog into 3 source files so AvailableNow +
    // maxFilesPerTrigger=1 genuinely merges across micro-batches.
    val srcDir = Files.createTempDirectory("graft_iv_src_").toString
    Tables.load(spark, sfDir, "events")
      .repartition(3).write.mode("overwrite").parquet(srcDir)
    val canonSchema = spark.read.parquet(srcDir).schema
    val viewPath = Files.createTempDirectory("graft_iv_view_").toString +
      "/view"
    val ckpt = Files.createTempDirectory("graft_iv_ckpt_").toString
    def run(): Unit = {
      val stream = spark.readStream
        .schema(canonSchema)
        .option("maxFilesPerTrigger", "1")
        .parquet(srcDir)
      EventStream.incrementalUserView(stream, viewPath, Some(ckpt))
    }
    run()
    val want = Tables.load(spark, sfDir, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("decimal(28,4)")
          .as("total_value"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[java.math.BigDecimal]("total_value"))).toSet
    def viewSet() = EventStream.readUserView(spark, viewPath).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[java.math.BigDecimal]("total_value"))).toSet
    assert(viewSet() === want)
    val batches = EventStream.appliedBatches(viewPath)
    assert(batches.size >= 3, s"expected >=3 micro-batches: $batches")
    // the commit is a pointer flip: exactly one live version dir
    // remains after the older ones are garbage-collected
    val versions = new java.io.File(viewPath + ".versions").listFiles()
    assert(versions != null && versions.length === 1,
      s"expected one committed version, got: ${versions.mkString(",")}")
    // Replay: a fresh run against the SAME checkpoint must change
    // nothing (ledger + checkpoint make the merge exactly-once).
    run()
    assert(viewSet() === want, "checkpoint replay mutated the view")
  }

  test("stateful per-user stats match a batch groupBy") {
    val stream = EventStream.readEventStream(spark, sfDir)
    val got = EventStream
      .runToCompletion(EventStream.userStats(stream).toDF(), "users_test",
        OutputMode.Update())
      // Update mode emits one row per user per trigger; keep the last.
      .groupBy("user_id").agg(max("n_events").as("n_events"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Tables.load(spark, sfDir, "events")
      .groupBy("user_id").agg(count("event_id").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("streaming quality monitor audits every micro-batch with the " +
      "batch constraint set and a clean feed passes") {
    val reports = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Array[org.apache.spark.sql.Row])]
    EventStream.qualityMonitor(
      EventStream.readEventStream(spark, sfDir),
      (id, rep) => reports.synchronized {
        reports += ((id, rep.collect()))
      })
    assert(reports.nonEmpty)
    val nEvents = Tables.load(spark, sfDir, "events").count()
    val allRows = reports.flatMap(_._2)
    assert(allRows.map(_.getAs[String]("check_name")).toSet === Set(
      "not_null_user", "known_type", "nonneg_value", "unique_event_id"))
    // each batch's report covers exactly that batch's rows; across
    // AvailableNow the batches partition the backlog
    val perBatchN = reports.map(_._2.head.getAs[Long]("n_rows"))
    assert(perBatchN.sum === nEvents)
    assert(allRows.forall(_.getAs[Boolean]("passed")),
      "the synthetic feed is clean")
  }
}
