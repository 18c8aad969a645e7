package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.CoreQueries

/** Volume assertions from executed-plan SQLMetrics: column pruning and
  * predicate pushdown must be visible in BYTES, not just plan shape. */
class MetricsSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  test("partition pruning cuts scan bytes and scan rows — visible in " +
      "volumes, not just plan shape") {
    // "size of files read" is fixed at planning time, AFTER partition
    // pruning but blind to in-reader row-group skipping — so the
    // volume evidence needs the hive-style partition layout the
    // reference's bronze table uses (SURVEY §1.4: partition by
    // year/month; the manifest-level twin is q124's zone map).
    val parted = java.nio.file.Files
      .createTempDirectory("graft_metrics_").toString
    Tables.load(spark, sfDir, "lineitem")
      .withColumn("ship_year", year(col("l_shipdate")))
      .write.mode("overwrite").partitionBy("ship_year").parquet(parted)

    val fullScan = spark.read.parquet(parted).select(col("*"))
    val fullCount = fullScan.collect().length.toLong
    val fm = Metrics.summary(fullScan)

    val filtered = spark.read.parquet(parted)
      .where(col("ship_year") === 1995)
      .select(col("l_returnflag"), col("l_quantity"))
    filtered.collect()
    val m = Metrics.summary(filtered)

    assert(m("scan_bytes") > 0 && fm("scan_bytes") > 0,
      s"no scan bytes recorded: $m / $fm")
    assert(m("scan_bytes") < fm("scan_bytes") / 2,
      s"partition pruning did not cut bytes: " +
        s"full=${fm("scan_bytes")} filtered=${m("scan_bytes")}")
    assert(m("scan_rows") > 0 && m("scan_rows") < fullCount / 2,
      s"partition pruning did not cut scan rows: " +
        s"${m("scan_rows")} vs $fullCount")
  }

  test("an aggregate's shuffle volume is key-sized, not fact-sized") {
    val agg = CoreQueries.q01PrunedAgg(spark, sfDir)
    agg.collect()
    val m = Metrics.summary(agg)
    assert(m("shuffle_records_written") > 0,
      s"no shuffle recorded for a groupBy: $m")
    // Partial aggregation means the exchange carries group states, not
    // fact rows: orders of magnitude below the scan row count.
    assert(m("shuffle_records_written") < m("scan_rows") / 10,
      s"map-side combine missing: shuffled ${m("shuffle_records_written")} " +
        s"of ${m("scan_rows")} scanned")
    assert(m("spill_bytes") == 0, s"unexpected spill at this scale: $m")
  }
}
