package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** The remaining Athena KPI shapes from the reference's declared query
  * surface (SURVEY §2.13; /root/reference/document/glue_t2.md:26-128),
  * re-expressed over the testdata's time-rich tables.
  */
object KpiQueries {

  private def moneySum(c: org.apache.spark.sql.Column) =
    round(sum(c.cast("decimal(18,4)")).cast("double"), 2)

  /** q27 — weekday × hour activity KPIs (glue_t2.md:40-52: the
    * day_of_week × purchase_time revenue mart). ISO weekday numbering
    * (F6 trap: weekday()+1, not dayofweek). */
  def q27WeekdayHour(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .withColumn("iso_dow", expr("weekday(ts) + 1"))
      .withColumn("day_of_week", date_format(col("ts"), "EEEE"))
      .withColumn("hour_of_day", hour(col("ts")))
      .groupBy(col("iso_dow"), col("day_of_week"), col("hour_of_day"))
      .agg(
        count(col("event_id")).as("n_events"),
        moneySum(col("value")).as("total_value"))

  /** q28 — per-customer monthly KPIs (glue_t2.md:116-128): order count,
    * revenue, average basket. */
  def q28CustomerMonthly(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .withColumn("order_month", date_format(col("o_orderdate"), "yyyy-MM"))
      .groupBy(col("o_custkey"), col("order_month"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        moneySum(col("o_totalprice")).as("revenue"))
      .withColumn("avg_basket",
        round(col("revenue") / col("n_orders"), 4))

  /** q29 — category revenue with share-of-total (glue_t2.md:55-67),
    * using an unpartitioned analytic window for the global total —
    * one extra exchange, no driver-side collect. */
  def q29CategoryShare(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    val part = Tables.load(s, dir, "part")
    val perType = li
      .join(broadcast(part), li("l_partkey") === part("p_partkey"), "inner")
      .groupBy(col("p_type"))
      .agg(moneySum(col("l_extendedprice")).as("revenue"))
    // decimal-cast the windowed total too: a double window-sum is
    // evaluation-order-dependent and can flip the rounded share.
    perType
      .withColumn("revenue_share",
        round(col("revenue") /
          sum(col("revenue").cast("decimal(18,4)"))
            .over(Window.partitionBy()).cast("double"),
          6))
  }
}
