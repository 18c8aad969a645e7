package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support: pre-shuffle once at write time so repeated
  * big-table ⋈ big-table joins run with NO exchange at read time.
  *
  * At 100 TB the lineitem ⋈ orders (fact ⋈ fact-header) join cannot
  * broadcast either side; without bucketing every query pays a full
  * shuffle of both. Writing both tables bucketed by the join key into
  * the session warehouse makes Catalyst plan a SortMergeJoin over the
  * co-located buckets — zero Exchange nodes (guarded by BucketingSpec).
  */
object Bucketing {

  /** Write a table bucketed (and sorted) by `key` into the session
    * catalog. Bucket count should approximate (table size / target
    * partition size) at deployment scale. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    val spark = df.sparkSession
    // drop stale metadata AND any orphaned managed location (a killed
    // session can leave the dir behind without the catalog entry, which
    // LOCATION_ALREADY_EXISTS then rejects)
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    val loc = new java.io.File(wh, table)
    if (loc.exists()) {
      import scala.reflect.io.Directory
      new Directory(loc).deleteRecursively()
    }
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key — exchange-free
    * when bucket counts match. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String,
      joinType: String = "inner"): DataFrame = {
    val l = spark.table(left)
    val r = spark.table(right)
    l.join(r, l(leftKey) === r(rightKey), joinType)
  }
}
