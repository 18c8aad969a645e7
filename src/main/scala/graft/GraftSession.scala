package graft

import org.apache.spark.sql.SparkSession

/** Turnkey session factory — the one-call entry point for a user
  * switching from the reference stack: returns a SparkSession with the
  * engine's custom SQL functions registered and the configuration the
  * reference's jobs relied on (dynamic partition overwrite, no success
  * markers) plus the engine's scale defaults (AQE with skew-join
  * handling) already set.
  *
  * Cluster deployments that build their own session instead can use
  * `--conf spark.sql.extensions=graft.GraftExtensions` and copy
  * [[defaults]].
  */
object GraftSession {

  /** Conf defaults the engine assumes. Callers' explicit confs win. */
  val defaults: Map[String, String] = Map(
    // the reference's load-bearing write semantics (SURVEY §1.4)
    "spark.sql.sources.partitionOverwriteMode" -> "dynamic",
    // runtime re-planning: partition coalescing + skew-join splitting
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    // engine sessions are UTC end-to-end (string-date semantics depend
    // on it; so does oracle parity)
    "spark.sql.session.timeZone" -> "UTC")

  def build(master: String = "local[*]",
      appName: String = "graft",
      extraConf: Map[String, String] = Map.empty): SparkSession = {
    val b = SparkSession.builder().master(master).appName(appName)
    (defaults ++ extraConf).foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    // suppress _SUCCESS markers (reference committer tuning, S8)
    spark.sparkContext.hadoopConfiguration
      .set("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
    GraftExtensions.register(spark)
    spark
  }
}
