package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.format.GraftTable

/** The reference's T0 fact ingest re-based onto the table format:
  * instead of directory-level dynamic partition overwrite
  * (`Sinks.writePartitioned`, SURVEY §2.2-S7), each windowed load
  * lands as ONE atomic [[GraftTable.replaceWhere]] snapshot —
  * delete-the-window + insert-the-reload with no moment where a
  * reader sees the gap, file-granular copy-on-write instead of
  * partition-directory rewrites, and time travel / CDC / metadata
  * aggregates for free on the bronze layer. Zone maps on
  * `l_shipdate` replace partition pruning: T1's windowed read is a
  * [[GraftTable.prunedWhere]] that opens only envelope-intersecting
  * files (the same skip the reference's push_down_predicate buys,
  * without a directory scheme).
  *
  * `LakehousePipelineSpec` pins that the silver produced through
  * this path is row-identical to the classic pipeline's, that an
  * incremental reload is exactly one new snapshot, and that
  * untouched files carry forward by reference. q218 hash-gates the
  * silver join through the lakehouse bronze against a DuckDB
  * restatement of the whole join chain.
  */
object LakehousePipeline {

  def bronzePath(warehouseDir: String): String =
    s"$warehouseDir/bronze/fact_lake"

  private def windowCond(cfg: Pipeline.Config) = {
    val lo = to_date(lit(cfg.fromDate), "yyyyMMdd").cast("timestamp")
    val hi = date_add(to_date(lit(cfg.toDate), "yyyyMMdd"), 1)
      .cast("timestamp")
    col("l_shipdate") >= lo && col("l_shipdate") < hi
  }

  /** T0 fact ingest (S2→S7, lakehouse form): the windowed fact lands
    * as one atomic snapshot — append on first load, replaceWhere on
    * every later one. The commit is RANGE-CLUSTERED on `l_shipdate`
    * (numFiles = 0 preserves it through the write): that's what makes
    * the zone maps selective AND what lets a window reload leave
    * out-of-window files untouched — a hash layout would smear every
    * date into every file and force replaceWhere to rewrite the whole
    * table. Returns the committed version. */
  def t0FactLake(spark: SparkSession, cfg: Pipeline.Config,
      numFiles: Int = 8): Long = {
    val fact = Pipeline.t0FactPlan(spark, cfg)
      .repartitionByRange(numFiles, col("l_shipdate"))
    val t = GraftTable.openOrCreate(spark, bronzePath(cfg.warehouseDir),
      statsCols = Seq("l_shipdate"))
    if (t.currentVersion == 0) t.append(fact, numFiles = 0)
    else t.replaceWhere(windowCond(cfg), fact, numFiles = 0)
  }

  /** T1's windowed bronze read: zone maps on `l_shipdate` stand in
    * for partition pruning (only envelope-intersecting files open). */
  def windowedBronze(spark: SparkSession, cfg: Pipeline.Config)
      : DataFrame =
    GraftTable.forPath(spark, bronzePath(cfg.warehouseDir))
      .prunedWhere(windowCond(cfg))._1

  /** T1 silver through the lakehouse bronze — same join chain as the
    * classic pipeline, different storage contract underneath. */
  def silverLake(spark: SparkSession, cfg: Pipeline.Config): DataFrame =
    Pipeline.silverJoin(spark, cfg, windowedBronze(spark, cfg))

  def goldPath(warehouseDir: String, martName: String): String =
    s"$warehouseDir/gold_lake/$martName"

  /** T2 gold THROUGH the format — the medallion DAG is lakehouse
    * END-TO-END: each of the reference's four marts is itself a
    * GraftTable, and a windowed run lands as ONE atomic snapshot per
    * mart (append on first load, [[GraftTable.replaceWhere]] on the
    * year/month window after — every mart groups by
    * ship_year/ship_month, so mart content is window-local and the
    * window swap is exact, the same property the classic pipeline's
    * dynamic partition overwrite exploits at directory level). Mart
    * commits are range-clustered on (ship_year, ship_month) with
    * stats on both, so the replaceWhere audit stats-prunes to the
    * window's files and a downstream month-range read skips the
    * rest. Readers never see a half-replaced mart — the gap the
    * reference's directory overwrite leaves between delete and
    * rename does not exist here. Returns mart → committed version. */
  def t2MartsLake(spark: SparkSession, cfg: Pipeline.Config)
      : Map[String, Long] = {
    val silver = silverLake(spark, cfg).cache()
    try {
      silver.count() // materialize once before the four mart consumers
      val fy = cfg.fromDate.substring(0, 4)
      val fm = cfg.fromDate.substring(4, 6)
      val ty = cfg.toDate.substring(0, 4)
      val tm = cfg.toDate.substring(4, 6)
      // (year, month) window as And/Or of plain comparisons — exactly
      // the shape the manifest-stats translation prunes with
      val windowCond =
        (col("ship_year") > fy ||
          (col("ship_year") === fy && col("ship_month") >= fm)) &&
        (col("ship_year") < ty ||
          (col("ship_year") === ty && col("ship_month") <= tm))
      Pipeline.t2Marts(spark, cfg, silver).map { case (name, df) =>
        val staged = df.repartitionByRange(2,
          col("ship_year"), col("ship_month"))
        val t = GraftTable.openOrCreate(spark,
          goldPath(cfg.warehouseDir, name),
          statsCols = Seq("ship_year", "ship_month"))
        val v =
          if (t.currentVersion == 0) t.append(staged, numFiles = 0)
          else t.replaceWhere(windowCond, staged, numFiles = 0)
        name -> v
      }
    } finally { silver.unpersist(); () }
  }
}
