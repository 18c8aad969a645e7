package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Key-based upsert (MERGE) into a parquet table — the row-level
  * complement to dynamic partition overwrite: partition overwrite
  * replaces whole partitions idempotently; upsert replaces individual
  * keys when updates don't align to partition boundaries (late
  * corrections, slowly-changing dimensions).
  *
  * Plan: target ANTI-JOIN updates on the key (drop stale versions) then
  * UNION the updates — one shuffle (or none: the anti-join broadcasts
  * when the update batch is small, the overwhelmingly common case).
  * The rewrite is staged through a temp directory because Spark cannot
  * overwrite a path it is concurrently reading.
  *
  * 100 TB note: this is the full-rewrite baseline semantics that table
  * formats (Delta/Iceberg/Hudi) optimize to matched-file rewrites; on
  * plain parquet, scope the rewrite by partitioning the target and
  * upserting per touched partition (compose with
  * Sinks.writePartitioned + a partition predicate).
  */
object Upsert {

  def upsertByKey(spark: SparkSession, targetPath: String,
      updates: DataFrame, keys: Seq[String]): Unit = {
    val fs = new java.io.File(targetPath)
    val merged =
      if (fs.exists()) {
        val target = spark.read.parquet(targetPath)
        target
          .join(updates.select(keys.map(updates.col): _*), keys, "left_anti")
          .unionByName(updates)
      } else updates
    val tmp = targetPath + ".upsert_tmp"
    merged.write.mode("overwrite").parquet(tmp)
    // swap: remove old target, move tmp into place
    def delete(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(delete)
      f.delete()
    }
    if (fs.exists()) delete(fs)
    if (!new java.io.File(tmp).renameTo(fs))
      throw new java.io.IOException(s"upsert swap failed for $targetPath")
  }
}
