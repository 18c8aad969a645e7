package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.Bucketing
import graft.operators.TextQueries

class BucketingSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  test("bucketed fact-fact join plans with zero exchanges") {
    Bucketing.writeBucketed(Tables.load(spark, sfDir, "lineitem"),
      "li_bucketed", "l_orderkey", buckets = 8)
    Bucketing.writeBucketed(Tables.load(spark, sfDir, "orders"),
      "ord_bucketed", "o_orderkey", buckets = 8)
    // disable broadcast so the test proves bucketing (not small-table
    // broadcast) eliminated the shuffle — at 100 TB neither side
    // broadcasts anyway
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "li_bucketed",
        "ord_bucketed", "l_orderkey", "o_orderkey")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      // and it returns the same rows as the plain join
      val plain = Tables.load(spark, sfDir, "lineitem")
        .join(Tables.load(spark, sfDir, "orders"),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() === plain)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bottom-k aggregator equals ORDER BY hash LIMIT k") {
    val viaAgg = TextQueries.q30DeterministicSample(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val viaSort = Tables.load(spark, sfDir, "documents")
      .select(md5(col("text")).as("h"), col("doc_id"))
      .orderBy("h", "doc_id").limit(32)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(viaAgg === viaSort)
  }
}
