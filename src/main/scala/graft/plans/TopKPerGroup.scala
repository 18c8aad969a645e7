package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graft.ColumnBridge

/** Top-k per group as a first-class physical operator — the engine's
  * example of extension point (c): a custom `LogicalPlan` + planner
  * `Strategy` + `SparkPlan` registered through `SparkSessionExtensions`
  * (the Expression and optimizer-Rule points are covered by
  * functions.SimHash64/DotProduct and plans.EditDistancePruning).
  *
  * Why an operator instead of `row_number() OVER (...) <= k`: the
  * window form SORTS EVERY ROW of every group (a per-group sort of the
  * full input after shuffling all of it), while this plan keeps a
  * bounded heap of k rows per group on each input partition and ships
  * ONLY the per-partition winners — the exchange carries at most
  * k × groups × partitions rows however big the fact is, and memory is
  * O(groups × k) per task. Same partial→exchange→final shape as a hash
  * aggregate, so it slots into AQE like any aggregate does.
  *
  * Results are the exact top-k rows per group under `orderExprs`; make
  * the order total (add a unique tiebreak column) for deterministic
  * output under ties.
  */
case class TopKPerGroupNode(
    groupExprs: Seq[Expression], orderExprs: Seq[SortOrder], k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k >= 1, s"k must be >= 1, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(
      newChild: LogicalPlan): TopKPerGroupNode = copy(child = newChild)
}

/** Physical bounded-heap top-k. `partial = true` prunes within each
  * input partition (no distribution requirement); `partial = false`
  * requires clustering on the group key, so EnsureRequirements inserts
  * the one exchange between the two phases — carrying only survivors. */
case class TopKPerGroupExec(
    groupExprs: Seq[Expression], orderExprs: Seq[SortOrder], k: Int,
    partial: Boolean, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val groupE = groupExprs
    val orderE = orderExprs
    val kk = k
    val childOutput = child.output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(groupE, childOutput)
      val ord = RowOrdering.create(orderE, childOutput)
      // Max-heap under the sort order: the head is the WORST retained
      // row, the one a better newcomer evicts.
      val heaps = mutable.HashMap.empty[UnsafeRow,
        mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        heaps.get(key) match {
          case None =>
            val h = mutable.PriorityQueue.empty[InternalRow](ord)
            h.enqueue(row.copy())
            heaps.put(key.copy(), h)
          case Some(h) =>
            if (h.size < kk) h.enqueue(row.copy())
            else if (ord.compare(row, h.head) < 0) {
              h.dequeue(); h.enqueue(row.copy())
            }
        }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(
      newChild: SparkPlan): TopKPerGroupExec = copy(child = newChild)
}

/** Plans the logical node as partial → (exchange) → final. */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(g, o, k, child) =>
      TopKPerGroupExec(g, o, k, partial = false,
        TopKPerGroupExec(g, o, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** DataFrame-side API: `TopKPerGroup(df, Seq("grp"), Seq("x" -> false,
  * "id" -> true), 3)` keeps each group's top 3 by x descending,
  * orderkey ascending. Attributes resolve eagerly against the input's
  * analyzed plan, so the node enters analysis fully resolved. */
object TopKPerGroup {
  def apply(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    // Self-register the strategy so the API works on any session (the
    // cluster path is spark.sql.extensions=graft.GraftExtensions).
    val extra = df.sparkSession.sessionState.experimentalMethods
    if (!extra.extraStrategies.contains(TopKPerGroupStrategy))
      extra.extraStrategies = extra.extraStrategies :+ TopKPerGroupStrategy
    val analyzed = ColumnBridge.analyzed(df)
    val byName = analyzed.output.map(a => a.name -> a).toMap
    def attr(n: String): Attribute = byName.getOrElse(n,
      throw new IllegalArgumentException(
        s"column $n not in ${byName.keys.mkString(", ")}"))
    val order = orderCols.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    ColumnBridge.ofRows(df.sparkSession,
      TopKPerGroupNode(groupCols.map(attr), order, k, analyzed))
  }
}
