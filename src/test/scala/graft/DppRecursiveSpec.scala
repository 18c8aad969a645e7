package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{CoreQueries, ScaleOps}

/** q162: the partition filter must be a runtime `dynamicpruning`
  * subquery (join-driven pruning — q01/S4 covers the static form).
  * q163: Spark's recursive CTE must agree with an explicit iterative
  * climb computed with plain DataFrame ops. */
class DppRecursiveSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  test("q162 fact scan carries a dynamicpruning partition filter") {
    val df = ScaleOps.q162DppJoin(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruning"),
      s"expected a runtime partition-pruning subquery in:\n$p")
    assert(df.count() == 5)
  }

  test("q162 runtime prune opens only the probe-era partitions") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec,
      QueryStageExec}
    // the pruned scan must report fewer partitions than the layout has
    val df = ScaleOps.q162DppJoin(spark, sfDir)
    df.collect() // execute so runtime metrics are final
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val partitioned = scans(df.queryExecution.executedPlan)
      .filter(_.partitionFilters.nonEmpty)
    assert(partitioned.nonEmpty,
      "expected a partition-filtered FileSourceScanExec")
    // orders span 1995..2001 (7 year dirs); the probe era is 2 of them
    val m = partitioned.head.metrics
    assert(m.contains("numPartitions"),
      s"expected numPartitions metric, got ${m.keys.mkString(",")}")
    val read = m("numPartitions").value
    assert(read <= 2, s"DPP should open <=2 year partitions, read $read")
  }

  test("q163 recursive CTE matches an iterative DataFrame climb") {
    val got = CoreQueries.q163RecursiveHierarchy(spark, sfDir)
      .orderBy("root").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    // iterative equivalent: repeatedly divide until single-digit
    var cur = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey").as("k"), col("c_custkey").as("cur"),
        lit(0).as("depth"))
    var done = cur.where(col("cur") < 10)
    var live = cur.where(col("cur") >= 10)
    while (live.limit(1).count() > 0) {
      val next = live.select(col("k"), expr("cur div 10").as("cur"),
        (col("depth") + 1).as("depth"))
      done = done.unionByName(next.where(col("cur") < 10))
      live = next.where(col("cur") >= 10)
    }
    val want = done.groupBy(col("cur").as("root"))
      .agg(count(lit(1)).as("n_customers"), max(col("depth")).as("max_depth"),
        sum(col("k")).as("key_sum"))
      .orderBy("root").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(got.toSeq == want.toSeq)
  }
}
