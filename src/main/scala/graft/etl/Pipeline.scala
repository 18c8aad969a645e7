package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import graft.Tables

/** The reference's batch medallion pipeline (bronze → silver → gold),
  * re-expressed over the TPC-H-ish testdata with plain-Scala
  * orchestration replacing Step Functions (SURVEY §2.12): T0 runs its
  * two ingests in parallel `Future`s, T1 depends on both, the four T2
  * marts fan out in parallel, all inside ONE SparkSession (the
  * reference paid a cluster per job; in-process the silver table is
  * cached across the marts — SURVEY §4's noted improvement).
  *
  * Role mapping: `lineitem`+`orders` = fact (purchase), `customer`/
  * `nation`/`region` = customer+zipcode geography, `part` =
  * products_info. Date window parameters replace the reference's
  * hardcoded year literals (jb_de_enhancement_t1_fulljoin_s2s.py:61-63).
  */
object Pipeline {

  case class Config(
    sourceDir: String,
    warehouseDir: String,
    fromDate: String, // yyyymmdd inclusive
    toDate: String)   // yyyymmdd inclusive

  val factPartitions: Seq[String] = Seq("l_returnflag", "ship_year", "ship_month")

  // ---- T0: bronze ---------------------------------------------------

  /** T0 fact ingest (S2→P1→X1→S7): filtered source scan with the
    * string-date window pushed to the scan, derived year/month partition
    * columns, partitioned dynamic-overwrite write. */
  def t0Fact(spark: SparkSession, cfg: Config): Unit = {
    val fact = Tables.load(spark, cfg.sourceDir, "lineitem")
      .withColumn("ship_ymd", date_format(col("l_shipdate"), "yyyyMMdd"))
      .where(col("ship_ymd").between(cfg.fromDate, cfg.toDate))
      .withColumn("ship_year", substring(col("ship_ymd"), 1, 4))
      .withColumn("ship_month", substring(col("ship_ymd"), 5, 2))
    Sinks.writePartitioned(fact, s"${cfg.warehouseDir}/bronze/fact",
      factPartitions)
  }

  /** T0 dimension ingest (S1→S6): full-table loads, unpartitioned.
    * The six writes are independent outputs, so they run as parallel
    * jobs — serializing them would pay six write-commit fixed costs
    * back-to-back (the reference runs dimension ingest as one Glue job
    * too, but its tables loop is driver-serial). */
  def t0Dimensions(spark: SparkSession, cfg: Config): Unit = {
    implicit val ec: ExecutionContext = ExecutionContext.global
    val writes = Seq("orders", "customer", "nation", "region", "part",
      "supplier").map { d =>
      Future {
        Sinks.writeTable(Tables.load(spark, cfg.sourceDir, d),
          s"${cfg.warehouseDir}/dimension/$d")
      }
    }
    Await.result(Future.sequence(writes), Duration.Inf)
  }

  // ---- T1: silver ----------------------------------------------------

  /** T1 denormalization (S4→J1,J2,J3→P3→S7): partition-pruned bronze
    * scan, left-join all dimensions (fact never shuffles — dims are
    * broadcast), write silver. */
  def t1Silver(spark: SparkSession, cfg: Config): Unit = {
    def dim(n: String): DataFrame =
      spark.read.parquet(s"${cfg.warehouseDir}/dimension/$n")

    val fromYear = cfg.fromDate.substring(0, 4)
    val toYear = cfg.toDate.substring(0, 4)
    // Partition-key predicate → file-listing-time pruning (S4); the
    // reference's push_down_predicate equivalent.
    val fact = spark.read.parquet(s"${cfg.warehouseDir}/bronze/fact")
      .where(col("ship_year").between(fromYear, toYear))

    val ord = dim("orders")
    val cust = dim("customer")
    val nat = dim("nation")
    val reg = dim("region")
    val part = dim("part")

    val custGeo = cust
      .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"), "left")
      .drop(nat("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === reg("r_regionkey"), "left")
      .drop(reg("r_regionkey"))

    val silver = fact
      .join(broadcast(ord), fact("l_orderkey") === ord("o_orderkey"), "left")
      .drop(ord("o_orderkey"))
      .join(broadcast(part), fact("l_partkey") === part("p_partkey"), "left")
      .drop(part("p_partkey"))
      .join(broadcast(custGeo), col("o_custkey") === custGeo("c_custkey"), "left")
      .drop(custGeo("c_custkey"))

    Sinks.writePartitioned(silver, s"${cfg.warehouseDir}/silver/fact_all_info",
      factPartitions)
  }

  // ---- T2: gold marts ------------------------------------------------

  private def moneySum(c: org.apache.spark.sql.Column) =
    round(sum(c.cast("decimal(18,4)")).cast("double"), 2)

  /** The four reference marts (SURVEY §2.4 A1–A4), sharing one cached
    * silver scan. */
  def t2Marts(spark: SparkSession, cfg: Config,
      silver: DataFrame): Map[String, DataFrame] = Map(
    "sales_by_datetime" -> silver
      .withColumn("ship_day", substring(date_format(col("l_shipdate"), "yyyyMMdd"), 7, 2))
      .withColumn("day_of_week", date_format(col("l_shipdate"), "EEEE"))
      .groupBy(col("l_returnflag"), col("ship_year"), col("ship_month"),
        col("ship_day"), col("day_of_week"))
      .agg(moneySum(col("l_extendedprice")).as("total_purchase_amount"),
        count(col("l_quantity")).as("count_of_purchase")),
    "sales_by_category" -> silver
      .groupBy(col("l_returnflag"), col("ship_year"), col("ship_month"),
        col("p_brand"), col("p_type"))
      .agg(moneySum(col("l_extendedprice")).as("total_purchase_amount"),
        count(col("l_quantity")).as("count_of_purchase")),
    "sales_by_region" -> silver
      .groupBy(col("l_returnflag"), col("ship_year"), col("ship_month"),
        col("r_name"), col("n_name"))
      .agg(moneySum(col("l_extendedprice")).as("total_purchase_amount"),
        count(col("l_quantity")).as("count_of_purchase"))
      .sort(col("l_returnflag"), col("ship_year"), col("ship_month"),
        col("total_purchase_amount").desc, col("count_of_purchase").desc),
    "sales_by_customer" -> {
      // J4: aggregate FIRST, then join the (now small) result to the
      // customer dimension.
      val perCust = silver
        .groupBy(col("o_custkey"), col("l_returnflag"), col("ship_year"),
          col("ship_month"))
        .agg(moneySum(col("l_extendedprice")).as("total_purchase_amount"),
          count(col("l_quantity")).as("count_of_purchase"))
      val cust = spark.read.parquet(s"${cfg.warehouseDir}/dimension/customer")
      perCust.join(broadcast(cust),
          perCust("o_custkey") === cust("c_custkey"), "left")
        .drop(cust("c_custkey"))
    })

  // ---- Orchestration (D1–D4) ----------------------------------------

  /** Full DAG: T0(fact ∥ dims) → T1 → T2(∥×4). Returns mart row counts
    * as a tiny run report. */
  def run(spark: SparkSession, cfg: Config): Map[String, Long] = {
    implicit val ec: ExecutionContext = ExecutionContext.global

    val t0 = Future.sequence(Seq(
      Future(t0Fact(spark, cfg)),
      Future(t0Dimensions(spark, cfg))))
    Await.result(t0, Duration.Inf)

    t1Silver(spark, cfg)

    // Window-prune the silver scan (partition filter) so an incremental
    // run recomputes and overwrites only the window's mart partitions —
    // every mart groups by ship_year/ship_month, so mart content is
    // partition-local and the pruned recompute is exact.
    val silver = spark.read
      .parquet(s"${cfg.warehouseDir}/silver/fact_all_info")
      .where(col("ship_year").between(
        cfg.fromDate.substring(0, 4), cfg.toDate.substring(0, 4)))
      .cache()
    try {
      val marts = t2Marts(spark, cfg, silver)
      val written = Future.sequence(marts.toSeq.map { case (name, df) =>
        Future {
          // repartition on the partition columns (not coalesce(1)): same
          // one-file-per-dir layout, but the ~250 dirs are written by
          // parallel tasks instead of one sequential task.
          Sinks.writePartitioned(df, s"${cfg.warehouseDir}/gold/$name",
            Seq("l_returnflag", "ship_year", "ship_month"))
          name -> spark.read.parquet(s"${cfg.warehouseDir}/gold/$name").count()
        }
      })
      val res = Await.result(written, Duration.Inf).toMap
      Sinks.register(spark, "fact_all_info",
        s"${cfg.warehouseDir}/silver/fact_all_info")
      marts.keys.foreach(n =>
        Sinks.register(spark, n, s"${cfg.warehouseDir}/gold/$n"))
      res
    } finally silver.unpersist()
  }
}
