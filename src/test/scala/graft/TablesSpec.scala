package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** The registry boundary's type canonicalization: a 100 TB lake mixes
  * parquet writers, so `events.ts` must read as ONE type regardless of
  * which timestamp layout the upstream chose. The r6 testdata
  * regeneration flipped NANOS→NTZ and silently broke three queries +
  * the streaming path — this spec writes all three layouts and pins
  * that they normalize to the identical canonical column.
  */
class TablesSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  test("normalizeEventTs yields identical TimestampType instants from " +
      "nanos-as-long, TIMESTAMP_NTZ, and TIMESTAMP layouts") {
    import java.nio.file.Files
    val base = Files.createTempDirectory("graft_ts_layouts_").toString

    // canonical truth from the registry itself
    val canon = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("ts"))
    assert(canon.schema("ts").dataType === TimestampType)

    // layout 1: micros-as-long under a plain BIGINT column, rebuilt the
    // way the old NANOS file was (long nanos; here written as nanos)
    canon.select(col("event_id"),
        (unix_micros(col("ts")) * 1000L).as("ts"))
      .write.mode("overwrite").parquet(s"$base/long_nanos")

    // layout 2: TIMESTAMP_NTZ (what isAdjustedToUTC=false micros reads
    // as in Spark 4)
    canon.select(col("event_id"),
        col("ts").cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(s"$base/ntz")

    // layout 3: already-canonical TIMESTAMP
    canon.write.mode("overwrite").parquet(s"$base/ltz")

    val want = canon.select(col("event_id"),
        unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    Seq("long_nanos", "ntz", "ltz").foreach { layout =>
      val normalized =
        Tables.normalizeEventTs(spark.read.parquet(s"$base/$layout"))
      assert(normalized.schema("ts").dataType === TimestampType,
        s"$layout must canonicalize to TimestampType")
      val got = normalized
        .select(col("event_id"), unix_micros(col("ts")).as("us"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === want, s"$layout must preserve every instant")
    }
  }

  test("normalizeEventTs is idempotent") {
    val once = Tables.load(spark, sfDir, "events")
    val twice = Tables.normalizeEventTs(once)
    assert(twice.schema("ts").dataType === TimestampType)
    assert(twice.select(sum(unix_micros(col("ts")))).head.getLong(0) ===
      once.select(sum(unix_micros(col("ts")))).head.getLong(0))
  }
}
