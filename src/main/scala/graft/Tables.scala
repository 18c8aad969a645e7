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
    // events.ts arrives in whatever layout the upstream writer chose; a
    // 100 TB lake mixes writers, so normalize to ONE canonical type
    // (session-local TimestampType, micro precision) at the registry
    // boundary. Layouts seen in the wild here:
    //   - parquet TIMESTAMP(NANOS): Spark 4 rejects it unless read as a raw
    //     long (legacy.parquet.nanosAsLong) -> rebuild via micros = ns/1000
    //   - parquet TIMESTAMP(isAdjustedToUTC=false, MICROS): Spark reads
    //     TIMESTAMP_NTZ -> cast to TimestampType (session tz is pinned to
    //     UTC by Verify/Bench/specs, so the cast is semantics-preserving)
    //   - parquet TIMESTAMP(isAdjustedToUTC=true, MICROS): already
    //     TimestampType -> no-op
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(path(dir, name))
    if (name == "events") normalizeEventTs(df) else df
  }

  /** Canonicalize an `events`-shaped frame's `ts` column to TimestampType.
    * Idempotent; accepts nanos-as-long, TIMESTAMP_NTZ, or TIMESTAMP. */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  /** Register every table as a temp view so `spark.sql` queries can refer
    * to them by name (the reference reads by catalog table name). Views are
    * lazy: registration costs only a schema read. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
