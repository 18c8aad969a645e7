package graft.etl

import org.apache.spark.sql.SparkSession

/** Small-files compaction — the maintenance job every long-lived
  * parquet warehouse needs: incremental loads and per-partition writers
  * accrete files until file-open overhead and tiny row groups dominate
  * scan cost (the reference hit this with day-level partitioning:
  * ">30 min vs 3m40s", glue_t0.md:150-153, and fought it with
  * coalesce(1)).
  *
  * Rewrites a directory to ~`targetFileBytes` files based on its
  * MEASURED on-disk size (not a guessed partition count), staged
  * through a temp dir + atomic-ish swap so readers never see a
  * half-written table.
  */
object Compact {

  val DefaultTargetFileBytes: Long = 128L * 1024 * 1024

  /** Returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, dir: String,
      targetFileBytes: Long = DefaultTargetFileBytes): (Int, Int) = {
    def parquetFiles(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(parquetFiles)
      else if (f.getName.endsWith(".parquet")) Seq(f)
      else Seq.empty

    val root = new java.io.File(dir)
    val before = parquetFiles(root)
    val totalBytes = before.map(_.length()).sum
    val nFiles = math.max(1, (totalBytes / targetFileBytes).toInt +
      (if (totalBytes % targetFileBytes > 0) 1 else 0))

    val df = spark.read.parquet(dir)
    val tmp = dir + ".compact_tmp"
    df.repartition(nFiles).write.mode("overwrite").parquet(tmp)

    def delete(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(delete)
      f.delete()
    }
    delete(root)
    if (!new java.io.File(tmp).renameTo(root))
      throw new java.io.IOException(s"compact swap failed for $dir")
    (before.size, parquetFiles(root).size)
  }
}
