package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.format.GraftTable

/** The r15 manifest fixed-cost fixes, pinned: (1) the driver-local
  * manifest-rows cache serves EXACTLY what is on disk — a same-
  * process read (cached LocalRelations) and a fresh-process read
  * (parquet, after invalidate) must see identical manifests; (2) a
  * repeatedly-merged small table keeps a BOUNDED manifest list (the
  * removal path drops all-removed dirs instead of accreting one
  * empty dir per merge — the cur_mart term that grew ~0.3 s/night in
  * the curation-at-history bench). */
class ManifestCacheSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def tmp(): String = java.nio.file.Files
    .createTempDirectory("graft_manifest_cache_").toString + "/t"

  private def manifestRows(t: GraftTable): Set[Seq[Any]] =
    t.manifest().select(col("path"), col("row_count"),
      col("min_k"), col("max_k"))
      .collect().map(_.toSeq).toSet

  test("cached manifest reads equal a cold-process (parquet) read " +
      "across appends, merges and folds") {
    val root = tmp()
    val t = GraftTable.create(spark, root,
      (1L to 20L).map(k => (k, k)).toDF("k", "v"),
      statsCols = Seq("k"), numFiles = 2)
    // enough one-file appends to cross a manifest fold
    (1 to GraftTable.MaxManifestListLen + 2).foreach(i =>
      t.append(Seq((100L + i, i.toLong)).toDF("k", "v"), numFiles = 1))
    // a merge exercises the removal-rewrite path
    t.merge(Seq((5L, 500L), (105L, 5000L)).toDF("k", "v"), Seq("k"),
      numFiles = 1)
    val warm = manifestRows(t) // served from the rows cache
    assert(warm.nonEmpty)
    GraftTable.invalidate(root) // drop all caches: cold process twin
    val cold = manifestRows(GraftTable.forPath(spark, root))
    assert(warm == cold,
      "the driver-local manifest cache drifted from the on-disk dirs")
    // and the data reads agree with themselves
    assert(t.read().where(col("k") === 5L).head().getLong(1) == 500L)
  }

  test("repeated merges on a small table keep a BOUNDED manifest " +
      "list: all-removed dirs are dropped, not accreted") {
    val root = tmp()
    val t = GraftTable.create(spark, root,
      Seq(("en", 1L), ("de", 2L)).toDF("lang", "n"),
      statsCols = Seq("lang"), numFiles = 1)
    (1 to 12).foreach { i =>
      t.merge(Seq(("en", i * 10L), ("fr", i.toLong)).toDF("lang", "n"),
        Seq("lang"), numFiles = 1)
    }
    // every merge rewrites the single live file; the emptied source
    // dir must be dropped so the list stays O(live dirs)
    assert(t.fileCount() <= 2L)
    val dirs = t.manifest().inputFiles.length // proxy is unreliable —
    // assert through the snapshot record instead
    val rec = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/_log/snapshot-v13.txt")),
      "UTF-8")
    val nDirs = rec.linesIterator.find(_.startsWith("manifests="))
      .map(_.count(_ == ',') + 1).getOrElse(-1)
    assert(nDirs >= 1 && nDirs <= 3,
      s"12 merges accreted $nDirs manifest dirs (dirs=$dirs) — " +
        "all-removed dirs must not be carried")
    // totals stay exact through all 12 merges
    val got = t.read().collect().map(r =>
      r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("en" -> 120L, "de" -> 2L, "fr" -> 12L))
  }
}
