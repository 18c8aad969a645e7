package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventStream
import graft.operators.CoreQueries

class StreamingSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

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
}
