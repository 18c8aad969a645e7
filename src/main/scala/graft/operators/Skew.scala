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

  /** Session confs that make AQE's runtime skew split observable at
    * test scale, scoped around an eager materialization and restored.
    * Production keeps the 256 MB default threshold — these exist so the
    * same MECHANISM fires on KB-sized test shuffles. Broadcast is
    * disabled because skew splitting only applies to shuffle joins. */
  def withSkewConfs[T](s: org.apache.spark.sql.SparkSession)(body: => T): T = {
    val scoped = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8kb",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8kb",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prior = scoped.map { case (k, _) => k -> s.conf.getOption(k) }
    scoped.foreach { case (k, v) => s.conf.set(k, v) }
    try body
    finally prior.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }

  /** The q193 join frame, unmaterialized: 80% of lineitem rows collapse
    * onto supplier key 1 (the hot-entity pattern — one power user, one
    * default SKU), and the enrichment equi-join is a shuffle sort-merge
    * join (broadcast disabled by [[withSkewConfs]]) whose hot partition
    * AQE splits at runtime.
    *
    * `mappers` exists because AQE splits a skewed REDUCE partition
    * along MAP-output boundaries — with the single map task a KB-sized
    * test file produces, there is nothing to split and
    * OptimizeSkewedJoin correctly reports zero skewed partitions (we
    * verified this empirically: 52 KB hot partition, 2 KB median,
    * rule logs `skewed partitions: left 0`). A 100 TB scan has
    * thousands of mappers, so the production plan needs no such knob;
    * the round-robin repartition reproduces that map topology at test
    * scale. Also note the dim must reach the join as a bare
    * scan→exchange→sort: the rule's pattern requires Sort directly
    * over the shuffle stage on BOTH sides, so a dim built by an inline
    * aggregate (Sort over HashAggregate) silently disqualifies the
    * join — at scale, enrich from materialized dim TABLES, not inline
    * rollups, if you want runtime skew handling. */
  def q193Frame(s: org.apache.spark.sql.SparkSession,
      dir: String, mappers: Int): DataFrame = {
    val fact = graft.Tables.load(s, dir, "lineitem")
      .select(
        when(col("l_orderkey") % 10 < 8, lit(1L))
          .otherwise(col("l_suppkey")).as("skew_key"),
        col("l_extendedprice"))
    val factM = if (mappers > 0) fact.repartition(mappers) else fact
    val dim = graft.Tables.load(s, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))
    factM.join(dim, col("skew_key") === col("s_suppkey"))
      .groupBy(col("s_nationkey"))
      .agg(
        count(lit(1)).as("n_rows"),
        round(sum(col("l_extendedprice").cast("decimal(18,4)"))
          .cast("double"), 2).as("revenue"))
  }

  /** q193 — AQE runtime skew-join: the FIRST line of defense the
    * object scaladoc names, demonstrated rather than assumed. The hot
    * key is only discoverable at runtime (it depends on data, not
    * schema), which is exactly what AQE's OptimizeSkewedJoin handles:
    * after the map stage it sees one partition at ~80% of the shuffle,
    * splits it into advisory-sized slices along map-output boundaries,
    * and replicates the matching dim partition per slice — the runtime
    * equivalent of [[saltedJoin]] with the salt count chosen from
    * observed sizes. ExtensionSpec pins `skew=true` in the executed
    * plan; the result is materialized under the scoped confs (AQE acts
    * at execution, so returning a lazy frame would escape them) and is
    * byte-identical to the plain-join oracle — the split changes
    * scheduling, never results. */
  def q193AqeSkewJoin(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val scratch = graft.Scratch.dir(s, "q193")
    withSkewConfs(s) {
      q193Frame(s, dir, mappers = 16).write.mode("overwrite")
        .parquet(scratch)
    }
    s.read.parquet(scratch)
  }

  /** The skewed projection q194 writes: 80% of January lands on one
    * partition date — the hot-day pattern every event lake has. */
  private[graft] def q194Events(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    graft.Tables.load(s, dir, "events")
      .select(
        when(dayofmonth(col("ts")) <= 24, lit("2024-01-01"))
          .otherwise(date_format(col("ts"), "yyyy-MM-dd")).as("dt"),
        col("event_id"), col("user_id"), col("value"))

  /** q194 — write-side skew: REBALANCE before a partitioned sink, the
    * WRITE twin of q193's join split. `partitionBy(dt)` with a plain
    * hash shuffle sends the whole hot day to ONE task, which then
    * writes one giant file while the rest of the cluster idles — the
    * classic lake-compaction pathology, created at write time. The
    * rebalance hint's shuffle carries the REBALANCE origin, which lets
    * AQE's OptimizeSkewInRebalancePartitions split oversized reduce
    * partitions along map-output boundaries (and merge undersized
    * ones), so the hot day is written by several advisory-sized tasks
    * → several bounded files. SkewSpec counts the files: the hot
    * partition directory holds >1, a cold day exactly 1. Same
    * test-scale notes as q193: the mapper knob simulates scan
    * parallelism, and the advisory size is lowered so KB-scale data
    * exhibits the mechanism. The registry output re-reads the written
    * table and aggregates it — hash-equality with the source-stated
    * oracle proves the skew split moved bytes, never changed them. */
  private[graft] def q194Write(s: org.apache.spark.sql.SparkSession,
      dir: String, advisory: String): String = {
    val scratch = graft.Scratch.dir(s, s"q194_$advisory")
    val scoped = Seq(
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> advisory)
    val prior = scoped.map { case (k, _) => k -> s.conf.getOption(k) }
    scoped.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      q194Events(s, dir)
        // simulate the multi-mapper scan a real lake has; the eager
        // localCheckpoint is the lineage barrier that keeps
        // CollapseRepartition from folding this shuffle INTO the
        // rebalance (adjacent repartition-like operators merge, and a
        // merged plan is back to the scan's single test-scale mapper —
        // with one map task there are no map-output boundaries to
        // split along, found empirically via per-map stats n=1)
        .repartition(16).localCheckpoint()
        .hint("rebalance", col("dt"))
        .write.partitionBy("dt").mode("overwrite").parquet(scratch)
    } finally prior.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
    scratch
  }

  def q194RebalanceWrite(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    s.read.parquet(q194Write(s, dir, "8kb"))
      .groupBy(col("dt").cast("string").as("dt"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,4)")).cast("double"), 2)
          .as("total_value"))
  }
}
