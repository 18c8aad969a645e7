package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for joins whose key distribution is heavy-
  * tailed (at 100 TB a single hot key turns one task into the job's
  * critical path).
  *
  * First line of defense is AQE's runtime skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default); salting is
  * the explicit fallback for the cases AQE can't fix — e.g. a hot key in
  * a shuffle *aggregation*, or a broadcast-ineligible dimension join
  * with one pathological key.
  */
object Skew {

  /** Salted left-equi-join: fact keys get a random salt in [0, buckets);
    * the (small) right side is exploded `buckets`× so every salted fact
    * key finds its row. Trades `buckets`× replication of the right side
    * for an even shuffle of the left. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      buckets: Int, joinType: String = "left"): DataFrame = {
    val salted = fact.withColumn("_salt",
      (rand(seed = 7) * buckets).cast("int"))
    val exploded = dim.withColumn("_salt",
      explode(array((0 until buckets).map(lit): _*)))
    salted
      .join(exploded,
        salted(key) === exploded(key) && salted("_salt") === exploded("_salt"),
        joinType)
      .drop(exploded(key)).drop(exploded("_salt")).drop(salted("_salt"))
  }

  /** Two-phase skew-safe aggregation: partial aggregate on
    * (key, salt) — spreading a hot key over `buckets` tasks — then final
    * aggregate on the key. Correct for associative aggregates
    * (sum/count/min/max). */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
      buckets: Int): DataFrame = {
    val salted = df.withColumn("_salt",
      (rand(seed = 7) * buckets).cast("int"))
    val partial = salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(
        sum(col(valueCol).cast("decimal(18,4)")).as("_psum"),
        count(col(valueCol)).as("_pcount"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(
        round(sum(col("_psum")).cast("double"), 2).as("total_amount"),
        sum(col("_pcount")).as("count_of_rows"))
  }

  /** Null-bypass left outer join: rows whose join key is NULL can never
    * match, yet a shuffle join still hashes them — all into ONE
    * partition (hash(null) is a constant), so a fact with 20% null FKs
    * puts 20% of the table on a single task. Here the null-key rows
    * skip the join entirely (a map-side filter + literal-null dim
    * columns) and only the matchable rows shuffle; the union restores
    * the full left-outer result exactly. */
  def nullBypassLeftJoin(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String): DataFrame = {
    val matchable = fact.where(col(factKey).isNotNull)
      .hint("merge") // pin the shuffle join the pattern exists for
      .join(dim, col(factKey) === col(dimKey), "left")
    val dimCols = dim.columns
    val bypass = dimCols.foldLeft(fact.where(col(factKey).isNull)) {
      (df, c) => df.withColumn(c,
        lit(null).cast(dim.schema(c).dataType))
    }
    matchable.unionByName(bypass)
  }

  /** q188 — the null-skew join audit: 20% of orders get a NULL custkey
    * (the "anonymous checkout" pattern every clickstream fact has), the
    * enrichment join runs through [[nullBypassLeftJoin]], and the
    * audit aggregates revenue per nation with the anonymous traffic in
    * its own NULL-nation row. The sort-merge path is pinned by hint so
    * the pattern is exercised even where the dim would broadcast at
    * test scale; PlanShapeSpec asserts the bypass branch is
    * exchange-free. Oracle: the same CASE-derived null injection and
    * left join, stated directly over the originals. */
  def q188NullSkewJoin(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val orders = graft.Tables.load(s, dir, "orders")
      .withColumn("cust_fk",
        when(col("o_orderkey") % 5 === 0, lit(null).cast("long"))
          .otherwise(col("o_custkey")))
      .select(col("o_orderkey"), col("cust_fk"), col("o_totalprice"))
    val cust = graft.Tables.load(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    nullBypassLeftJoin(orders, cust, "cust_fk", "c_custkey")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast("decimal(18,4)"))
          .cast("double"), 2).as("revenue"))
  }
}
