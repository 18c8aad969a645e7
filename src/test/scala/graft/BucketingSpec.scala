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

  test("q142 bucketed fact join plans zero exchanges and equals the " +
      "plain join aggregate") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // fact ⋈ fact-header must not silently broadcast at test scale
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = graft.etl.Bucketing.q142BucketedJoin(spark, sfDir)
      val got = df.collect()
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(p.contains("SortMergeJoin"), s"expected co-located SMJ:\n$p")
      assert(!p.contains("Exchange hashpartitioning(l_orderkey") &&
        !p.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join must not re-shuffle its inputs:\n$p")
      val plain = Tables.load(spark, sfDir, "lineitem")
        .join(Tables.load(spark, sfDir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          round(sum(col("l_extendedprice").cast("decimal(18,4)"))
            .cast("double"), 2).as("revenue"),
          round(sum(col("l_quantity").cast("decimal(18,4)"))
            .cast("double"), 2).as("sum_qty"))
        .orderBy(col("o_orderpriority")).collect()
      assert(got.map(_.toSeq).toSeq === plain.map(_.toSeq).toSeq)
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
