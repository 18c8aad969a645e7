package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning — the 100 TB mechanism that stops
  * a selective dim filter from scanning the whole fact side of a
  * shuffle join: Catalyst injects a bloom filter built from the
  * filtered (small) side into the fact scan. The size thresholds are
  * tuned for clusters, so the spec lowers them to demonstrate the plan
  * shape at test scale. */
class RuntimeFilterSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  test("selective dim filter injects a bloom filter into the fact side " +
      "of a shuffle join") {
    val conf = spark.conf
    val prevApp = conf.getOption(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    val prevEnabled =
      conf.getOption("spark.sql.optimizer.runtime.bloomFilter.enabled")
    val prevBroadcast = conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // cluster default is 10GB of fact scan — far above test data
      conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0")
      // InjectRuntimeFilter skips joins it canPlanAsBroadcastHashJoin —
      // at cluster scale the dim side is over the broadcast threshold,
      // which is the exact situation the bloom filter exists for
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val lineitem = Tables.load(spark, sfDir, "lineitem")
      val part = Tables.load(spark, sfDir, "part")
        .where(col("p_size") === 1) // selective: ~2% of parts
      // MERGE hint keeps the join a shuffle join — broadcast joins prune
      // by construction and need no runtime filter
      val joined = lineitem.hint("MERGE")
        .join(part, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand")).agg(sum(col("l_quantity")).as("qty"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter") || plan.contains("BloomFilter"),
        s"expected an injected runtime bloom filter in:\n$plan")
      assert(joined.count() > 0)
    } finally {
      def restore(key: String, prev: Option[String]): Unit = prev match {
        case Some(v) => conf.set(key, v)
        case None => conf.unset(key)
      }
      restore(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        prevApp)
      restore("spark.sql.optimizer.runtime.bloomFilter.enabled", prevEnabled)
      restore("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
    }
  }
}
