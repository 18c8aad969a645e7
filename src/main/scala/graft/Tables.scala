package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table registry over the driver-generated parquet testdata.
  *
  * Plays the role of the reference's Glue Data Catalog (SURVEY §2.1-S3/S9:
  * `create_dynamic_frame.from_catalog`,
  * /root/reference/scripts/jb_de_enhancement_t1_fulljoin_s2s.py:39-49) —
  * in-process session catalog instead of an external catalog service.
  * Reads are plain parquet scans, so Catalyst's filter pushdown + column
  * pruning reach the file source with no custom code.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // The testdata's events.ts is parquet TIMESTAMP(NANOS), which Spark 4
    // rejects unless read as a raw long; normalize it back to a (micro-
    // precision) TimestampType so downstream operators see one type.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(path(dir, name))
    if (name == "events"
        && df.schema("ts").dataType == org.apache.spark.sql.types.LongType) {
      df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts DIV 1000")))
    } else df
  }

  /** Register every table as a temp view so `spark.sql` queries can refer
    * to them by name (the reference reads by catalog table name). Views are
    * lazy: registration costs only a schema read. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
