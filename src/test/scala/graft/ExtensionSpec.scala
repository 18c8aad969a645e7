package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Udfs
import graft.etl.Sources
import graft.operators.Skew

class ExtensionSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  test("U1 UDF: weekday name with the reference's fallback literal") {
    Udfs.register(spark)
    val df = Seq(("2014", "11", "12"), ("2014", "13", "45"))
      .toDF("y", "m", "d")
    val viaUdf = df.selectExpr("change_day_of_week(y, m, d) AS dow")
      .collect().map(_.getString(0))
    assert(viaUdf(0) === "Wednesday") // the reference's own sanity check
    assert(viaUdf(1) === "Invalid date format. Please")
    // builtin form agrees with the UDF on both paths
    val viaExpr = df.select(Udfs.dayOfWeekExpr($"y", $"m", $"d"))
      .collect().map(_.getString(0))
    assert(viaUdf.sameElements(viaExpr))
  }

  test("S5 CSV source with explicit schema keeps zero-padded ids as strings") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_").toString
    Seq(("00001", "A", 1.5), ("00002", "B", 2.5))
      .toDF("id", "grp", "v")
      .write.mode("overwrite").option("header", "true").csv(dir)
    val schema = StructType(Seq(
      StructField("id", StringType), StructField("grp", StringType),
      StructField("v", DoubleType)))
    val back = Sources.csv(spark, dir, schema)
    assert(back.schema("id").dataType === StringType)
    assert(back.orderBy("id").collect().map(_.getString(0))
      .sameElements(Array("00001", "00002")))
  }

  test("salted join equals plain join on skewed data") {
    val fact = (1 to 10000).map(i => (if (i % 10 == 0) 1L else i.toLong, i))
      .toDF("k", "v")
    val dim = (1L to 10000L).map(k => (k, s"name_$k")).toDF("k", "name")
    val plain = fact.join(dim, Seq("k"), "left")
      .agg(count("name"), sum("v")).head()
    val salted = Skew.saltedJoin(fact, dim, "k", buckets = 8)
      .agg(count("name"), sum("v")).head()
    assert(plain === salted)
  }

  test("salted two-phase aggregation equals direct aggregation") {
    val df = (1 to 5000)
      .map(i => (if (i % 2 == 0) "hot" else s"k$i", i.toDouble))
      .toDF("k", "amount")
    val direct = df.groupBy("k")
      .agg(round(sum($"amount".cast("decimal(18,4)")).cast("double"), 2)
        .as("total_amount"), count("amount").as("count_of_rows"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .toSet
    val salted = Skew.saltedSumCount(df, Seq("k"), "amount", buckets = 8)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .toSet
    assert(direct === salted)
  }

  test("A5 scale variant: approx_count_distinct within 5% of exact") {
    val ev = Tables.load(spark, sfDir, "events")
    val r = ev.agg(
      countDistinct($"user_id").as("exact"),
      approx_count_distinct($"user_id", 0.02).as("approx")).head()
    val exact = r.getLong(0).toDouble
    val approx = r.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05)
  }

  test("q188 null-bypass join equals the plain left join, and the " +
      "bypass branch never shuffles the null-key rows") {
    import org.apache.spark.sql.functions._
    val orders = Tables.load(spark, sfDir, "orders")
      .withColumn("cust_fk",
        when(col("o_orderkey") % 5 === 0, lit(null).cast("long"))
          .otherwise(col("o_custkey")))
      .select(col("o_orderkey"), col("cust_fk"), col("o_totalprice"))
    val cust = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    val bypass = Skew.nullBypassLeftJoin(orders, cust, "cust_fk", "c_custkey")
    val plain = orders.join(cust,
      col("cust_fk") === col("c_custkey"), "left")
    assert(bypass.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(bypass).count() === 0)
    // plan: the matchable branch sort-merge-joins; the null branch is a
    // filter+project with NO exchange between its scan and the union
    bypass.collect()
    val p = bypass.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), s"hinted SMJ missing:\n$p")
    assert(p.contains("Union"), s"bypass union missing:\n$p")
    val unionIdx = p.indexOf("Union")
    val tail = p.substring(unionIdx)
    // the second union child (the bypass branch) = isnull filter over
    // the scan; assert no Exchange appears below it
    val branch = tail.substring(tail.lastIndexOf("isnull"))
    assert(!branch.contains("Exchange"),
      s"null-key rows must not shuffle:\n$branch")
  }

  test("q193 AQE splits the skewed join partition at runtime " +
      "(skew=true in the executed plan) without changing results") {
    import org.apache.spark.sql.functions._
    val (p, gotRows) = Skew.withSkewConfs(spark) {
      val df = Skew.q193Frame(spark, sfDir, mappers = 16)
      val rows = df.collect()
      (df.queryExecution.executedPlan.toString, rows)
    }
    assert(p.contains("skew=true"),
      s"AQE's OptimizeSkewedJoin must fire on the hot key:\n$p")
    // results are identical to a broadcast-joined, skew-oblivious plan
    val fact = Tables.load(spark, sfDir, "lineitem")
      .select(
        when(col("l_orderkey") % 10 < 8, lit(1L))
          .otherwise(col("l_suppkey")).as("skew_key"),
        col("l_extendedprice"))
    val dim = Tables.load(spark, sfDir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))
    val want = fact.join(broadcast(dim), col("skew_key") === col("s_suppkey"))
      .groupBy(col("s_nationkey"))
      .agg(
        count(lit(1)).as("n_rows"),
        round(sum(col("l_extendedprice").cast("decimal(18,4)"))
          .cast("double"), 2).as("revenue"))
      .collect()
    assert(gotRows.map(_.toString).sorted.toSeq ===
      want.map(_.toString).sorted.toSeq)
  }

  test("q194 rebalance write splits the hot day across several bounded " +
      "files instead of one giant one") {
    // 1kb advisory: sf0.001's hot day is only a few KB of shuffle bytes
    val scratch = new java.io.File(Skew.q194Write(spark, sfDir, "1kb"))
    def files(d: String): Array[java.io.File] = {
      val fs = new java.io.File(scratch, d).listFiles()
      if (fs == null) Array.empty
      else fs.filter(_.getName.endsWith(".parquet"))
    }
    val hot = files("dt=2024-01-01")
    assert(hot.length > 1,
      s"the hot day must be written by several rebalanced tasks, " +
        s"got ${hot.length}")
    // and the split is real: no single file holds most of the hot day
    val total = hot.map(_.length).sum.toDouble
    assert(hot.map(_.length).max < 0.6 * total,
      s"hot-day bytes still concentrated: ${hot.map(_.length).toSeq}")
    // cold days may legitimately be multi-file when they share a hash
    // bucket with a split partition (a file per task×dt is how
    // partitioned sinks work); the bound that matters is that the
    // total file count stays task-shaped, not row-shaped
    val all = scratch.listFiles().filter(_.getName.startsWith("dt="))
      .map(d => files(d.getName).length)
    assert(all.sum < 80, s"file explosion: ${all.toSeq}")
  }

  test("q199 cogroup equals the full-outer join of the two rollups") {
    val got = graft.operators.Analytics.q199CogroupAlign(spark, sfDir)
    val e = Tables.load(spark, sfDir, "events")
      .groupBy(col("user_id").as("ek"))
      .agg(count(lit(1)).as("n_events"),
        round(percentile_approx(col("value"), lit(0.5), lit(1000000)), 2)
          .as("median_approx"))
    val o = Tables.load(spark, sfDir, "orders")
      .groupBy(col("o_custkey").as("ok"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast("decimal(18,4)"))
          .cast("double"), 2).as("total_spend"))
    val want = e.join(o, col("ek") === col("ok"), "full_outer")
      .select(
        coalesce(col("ek"), col("ok")).as("user_id"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("total_spend"), lit(0.0)).as("total_spend"))
    val gotCmp = got.select("user_id", "n_events", "n_orders", "total_spend")
    assert(gotCmp.exceptAll(want).count() === 0)
    assert(want.exceptAll(gotCmp).count() === 0)
    // the one-sided population is really present (event users are a
    // strict subset of order custkeys in the testdata, so the
    // order-only side is the one that exists)
    val rows = got.collect()
    assert(rows.exists(r => r.getAs[Long]("n_events") == 0L))
    assert(rows.forall(r =>
      r.getAs[Long]("n_events") > 0L || r.isNullAt(r.fieldIndex("median_value"))))
  }

  test("q202: observed metrics ride the write pass (CollectMetrics in " +
      "the plan) and equal a direct aggregate") {
    val obs = org.apache.spark.sql.Observation("q202_spec")
    val ev = Tables.load(spark, sfDir, "events")
    val observed = ev.observe(obs,
      count(lit(1)).as("n_rows"),
      sum(col("value").cast("decimal(18,4)")).as("value4"))
    val scratch = Scratch.dir(spark, "q202_spec")
    observed.write.mode("overwrite").parquet(scratch)
    assert(observed.queryExecution.executedPlan.toString
      .contains("CollectMetrics"))
    val want = ev.agg(count(lit(1)), sum(col("value")
      .cast("decimal(18,4)"))).head()
    assert(obs.get("n_rows") === want.getLong(0))
    assert(obs.get("value4").asInstanceOf[java.math.BigDecimal]
      .compareTo(want.getDecimal(1)) === 0)
    // the registry entry returns the same single audit row
    val row = graft.operators.ScaleOps
      .q202ObservedAudit(spark, sfDir).head()
    assert(row.getAs[Long]("n_rows") === want.getLong(0))
  }

  test("q200: ANALYZE statistics drive CostBasedJoinReorder — the " +
      "innermost join stops touching lineitem") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    import graft.operators.ScaleOps
    def innermostTouchesLineitem(df: org.apache.spark.sql.DataFrame)
        : Boolean = {
      val joins = df.queryExecution.optimizedPlan.collect {
        case j: Join => j
      }
      assert(joins.size === 2, s"expected a 2-join chain:\n$joins")
      // collect is pre-order, so the last Join is the innermost
      joins.last.output.exists(_.name.startsWith("l_"))
    }
    ScaleOps.withCboTables(spark, sfDir) {
      assert(!innermostTouchesLineitem(ScaleOps.q200Frame(spark, sfDir)),
        "with stats + CBO the dimension tables must join first")
    }
    // without CBO the written (worst) order stands
    assert(innermostTouchesLineitem(ScaleOps.q200Frame(spark, sfDir)),
      "without CBO the as-written order was expected to survive")
  }
}
