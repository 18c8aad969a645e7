package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec,
  QueryStageExec}

/** Post-execution cost accounting from the executed plan's SQLMetrics —
  * the "what did this query actually read, shuffle, and spill"
  * observability a 100 TB deployment tunes against. No listeners, no
  * races: SQLMetrics accumulate on the driver as tasks finish, so once
  * an action returns, summing them over the (AQE-final) plan tree is
  * deterministic. This is the same data the Spark UI's SQL tab renders,
  * exposed as a queryable Map for CI assertions (PlanShapeSpec asserts
  * SHAPES; this asserts VOLUMES — e.g. "the pruned scan read less than
  * the full table").
  */
object Metrics {

  /** All nodes of the executed plan, descending through AQE's adaptive
    * subtrees and materialized query stages. */
  def allNodes(p: SparkPlan): Seq[SparkPlan] =
    allNodesDepth(p).map(_._1)

  /** Nodes paired with their depth from the root. Depth matters when
    * picking the "topmost" node with a given metric: a pre-order DFS
    * would descend the whole leftmost subtree before shallower
    * siblings, so for a join-rooted plan it can return the left scan
    * instead of the shallowest row-reporting operator. */
  def allNodesDepth(p: SparkPlan, d: Int = 0): Seq[(SparkPlan, Int)] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case o => o.children
    }
    (p, d) +: kids.flatMap(allNodesDepth(_, d + 1))
  }

  /** Raw (nodeName, metricKey, metricDescription, value) rows for every
    * metric in the executed plan. Run an action on `df` first. */
  def raw(df: DataFrame): Seq[(String, String, String, Long)] =
    allNodes(df.queryExecution.executedPlan).flatMap { n =>
      n.metrics.toSeq.map { case (k, m) =>
        (n.nodeName, k, m.name.getOrElse(k), m.value)
      }
    }

  private def sumWhere(rows: Seq[(String, String, String, Long)])(
      pred: (String, String, String) => Boolean): Long =
    rows.collect { case (n, k, d, v) if pred(n, k, d) && v > 0 => v }.sum

  /** Headline cost summary for an executed DataFrame. Keys:
    * scan_bytes ("size of files read" — fixed at planning time AFTER
    * partition pruning, blind to in-reader row-group skipping),
    * scan_rows (rows leaving scans — where row-group/page skipping
    * does show), shuffle_bytes_written, shuffle_records_written,
    * spill_bytes (memory+disk spills), output_rows (rows leaving the
    * root). */
  def summary(df: DataFrame): Map[String, Long] = {
    val rows = raw(df)
    val root = df.queryExecution.executedPlan
    // Topmost node that reports row counts (Sort/Exchange roots don't):
    // minimum-DEPTH node with the metric, so "topmost" matches actual
    // plan depth rather than pre-order DFS position.
    val rootRows = allNodesDepth(root)
      .flatMap { case (n, d) =>
        n.metrics.get("numOutputRows").map(m => (d, m.value)) }
      .sortBy(_._1).headOption.map(_._2).getOrElse(-1L)
    Map(
      "scan_bytes" -> sumWhere(rows)((n, _, d) =>
        n.toLowerCase.contains("scan") && d.contains("size of files read")),
      "scan_rows" -> sumWhere(rows)((n, k, _) =>
        n.toLowerCase.contains("scan") && k == "numOutputRows"),
      "shuffle_bytes_written" -> sumWhere(rows)((_, _, d) =>
        d.contains("shuffle bytes written")),
      "shuffle_records_written" -> sumWhere(rows)((_, _, d) =>
        d.contains("shuffle records written")),
      "spill_bytes" -> sumWhere(rows)((_, _, d) => d.contains("spill")),
      "output_rows" -> rootRows)
  }
}
