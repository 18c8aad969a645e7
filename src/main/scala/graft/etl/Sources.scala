package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source readers (SURVEY §2.1 S1–S5) with explicit schemas.
  *
  * Schema is always declared, never inferred: inference needs an extra
  * pass over the data (prohibitive at 100 TB) and silently mistypes
  * zero-padded string ids (FIXTURES.md: customer_id `00001` must stay a
  * string).
  */
object Sources {

  /** S5 — CSV with declared schema; header skipped. */
  def csv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    spark.read
      .option("header", header.toString)
      .schema(schema)
      .csv(path)

  /** How a JDBC read obtains its connection secrets (D6) — the seam
    * the reference fills with SecretsManager
    * (`scripts/jb_de_enhancement_t0_fact_d2s.py:32-65`): credentials
    * are RESOLVED AT READ TIME by a provider function, never embedded
    * in job code or logged config. `fromEnv` is the container-native
    * default (user/password from environment variables, absent = no
    * auth — the embedded-Derby case); a deployment backs the same
    * signature with its vault of choice. The provider is invoked once
    * per read, so rotated credentials take effect on the next job
    * without a restart. */
  type CredentialsProvider = () => Map[String, String]

  /** Default provider: `GRAFT_JDBC_USER` / `GRAFT_JDBC_PASSWORD` env
    * vars, omitting keys that are unset. */
  val fromEnv: CredentialsProvider = () =>
    Seq("user" -> sys.env.get("GRAFT_JDBC_USER"),
      "password" -> sys.env.get("GRAFT_JDBC_PASSWORD"))
      .collect { case (k, Some(v)) => k -> v }.toMap

  /** S1/S2 — JDBC scan; `queryOrTable` is either a table name or a
    * pushdown `(SELECT …) t` subquery, exactly the reference's two T0
    * modes. Partitioned-read options parallelize what the reference left
    * single-threaded (glue_t0.md:144 notes the single-connection
    * bottleneck; partitionColumn/num splits it N ways). Credentials
    * come from `creds` (resolved per read, see
    * [[CredentialsProvider]]); explicit `props` win on key conflicts
    * so a caller can still override locally. */
  def jdbc(spark: SparkSession, url: String, queryOrTable: String,
      props: Map[String, String] = Map.empty,
      creds: CredentialsProvider = fromEnv): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", queryOrTable)
    (creds() ++ props).foldLeft(base) {
      case (r, (k, v)) => r.option(k, v)
    }.load()
  }

  /** S3/S4 — parquet table scan; filters/pruning ride on Catalyst. */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** ORC scan — same Catalyst pushdown/pruning story as parquet; the
    * engine is format-agnostic where the format has a columnar reader. */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** JSON-lines source (one JSON object per line — the interchange
    * format most raw training-data drops arrive in). Schema declared,
    * never inferred (inference = a full extra pass at 100 TB);
    * malformed lines land in a `_corrupt_record` column under PERMISSIVE
    * mode instead of failing the 10-hour job. (Spark refuses a query
    * whose only referenced column is `_corrupt_record` — project a data
    * column alongside it, or cache the parsed result first.) */
  def jsonl(spark: SparkSession, path: String, schema: StructType)
      : DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
}
