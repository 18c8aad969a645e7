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
}
