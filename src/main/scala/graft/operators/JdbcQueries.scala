package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.etl.Sources

/** JDBC ingest made live (SURVEY §2.1 S1/S2) — the reference's T0 is a
  * JDBC extract from PostgreSQL (jb_de_enhancement_t0_fact_d2s.py:72-82,
  * jb_de_dehancement_t0_dimension_d2s.py:66-71; both dbtable mode and
  * the pushdown `(SELECT …) t` subquery mode). No network DB exists in
  * this environment, so the database is an embedded Derby instance the
  * query itself stages from the parquet table — the JDBC read path,
  * type mapping, predicate pushdown, and partitioned-split logic are
  * identical to a remote server's.
  */
object JdbcQueries {

  /** Derby URL for a per-context scratch database. Derby locks per
    * database directory, so concurrent drivers get disjoint DBs via
    * [[graft.Scratch]]. */
  def scratchUrl(s: SparkSession, name: String): String =
    s"jdbc:derby:${graft.Scratch.dir(s, "jdbc")}/$name;create=true"

  /** Stage a DataFrame into the embedded DB over a single connection —
    * deliberately mirroring the reference's single-connection T0 write
    * path (glue_t0.md:144); the partitioned READ below is where the
    * parallelism the reference lacked comes back. */
  def stage(df: DataFrame, url: String, table: String): Unit =
    df.coalesce(1).write.mode("overwrite")
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .save()

  /** q157 — JDBC extract → aggregate: supplier staged into Derby, read
    * back through [[Sources.jdbc]] in PUSHDOWN-SUBQUERY mode (the
    * `(SELECT … WHERE …) t` form ships the filter to the database, so
    * only qualifying rows ever cross the wire) with a 4-way partitioned
    * read on `s_suppkey` (each split is an independent connection —
    * at 100 TB this is the knob that turns a one-connection crawl into
    * a parallel extract), then the per-nation balance rollup. The
    * oracle runs the same aggregate on the parquet table, proving the
    * DB round trip is lossless (BIGINT/INTEGER/DOUBLE all map exactly).
    */
  def q157JdbcSource(s: SparkSession, dir: String): DataFrame = {
    val url = scratchUrl(s, "supplierdb")
    val sup = Tables.load(s, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"), col("s_acctbal"))
    stage(sup, url, "supplier")
    // identifiers quoted: Spark's JDBC writer creates case-sensitive
    // lowercase columns in Derby, so unquoted names would upcase+miss
    val src = Sources.jdbc(s, url,
      """(SELECT "s_suppkey", "s_nationkey", "s_acctbal" FROM supplier """ +
        """WHERE "s_acctbal" > 0) t""",
      Map(
        "partitionColumn" -> "\"s_suppkey\"",
        "lowerBound" -> "0",
        "upperBound" -> "1000000",
        "numPartitions" -> "4"))
    src
      .select(col("s_nationkey").as("s_nationkey"),
        col("s_acctbal").as("s_acctbal"))
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_suppliers"),
        round(sum(col("s_acctbal").cast("decimal(18,4)")).cast("double"), 2)
          .as("total_bal"))
      .orderBy(col("s_nationkey"))
  }
}
