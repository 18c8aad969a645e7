package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.format.GraftTable

/** SQL stored procedures on GraftCatalog (`CALL cat.system.<p>(…)`):
  * the maintenance verbs — compact, vacuum, restore, zorder — as
  * scheduled-statement SQL, Iceberg's procedure surface on Spark 4's
  * ProcedureCatalog. Pins: results return through LocalScan, bodies
  * run the real format ops (content identity, layout change, history
  * rollback, file reclaim), positional and named arguments both bind. */
class ProcedureSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private lazy val wh: String = {
    val w = java.nio.file.Files
      .createTempDirectory("graft_proc_wh_").toString
    spark.conf.set("spark.sql.catalog.prc",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.prc.warehouse", w)
    w
  }

  private def dataFiles(root: String): Int = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(f)
    walk(new java.io.File(s"$root/data"))
      .count(_.getName.endsWith(".parquet"))
  }

  test("CALL system.compact bin-packs (and can re-cluster); content " +
      "identical; result row carries the new version") {
    val root = s"$wh/t_compact"
    val t = GraftTable.create(spark, root,
      (1L to 10000L).toDF("k"), Seq("k"), numFiles = 8)
    t.append((10001L to 20000L).toDF("k"), numFiles = 8)
    assert(dataFiles(root) == 16)
    val res = spark.sql(
      "CALL prc.system.compact('t_compact', 2, 'k')").collect()
    assert(res.map(_.getLong(0)).toSeq == Seq(3L),
      "compact must return the new version")
    assert(dataFiles(root) >= 16 + 2) // old files still on disk (history)
    val t2 = GraftTable.forPath(spark, root)
    assert(t2.manifest().count() == 2)
    assert(t2.read().count() == 20000)
    // cluster_by re-clustered: file envelopes disjoint on k
    val env = t2.manifest().select("min_k", "max_k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(env(0)._2 <= env(1)._1, s"compact('k') must re-cluster: $env")
  }

  test("incremental compaction (max_rows) rewrites ONLY the small-" +
      "file tail: big files carry by reference byte-identically, DV " +
      "entries on carried files survive, on rewritten ones vanish") {
    val root = s"$wh/t_compact_small"
    val t = GraftTable.create(spark, root,
      (1L to 100000L).toDF("k"), Seq("k"), numFiles = 1) // one BIG file
    (0 until 5).foreach(i => t.append(
      (100001L + i * 100L to 100100L + i * 100L).toDF("k"),
      numFiles = 1)) // five small tail files
    t.deleteWhereMor(col("k") === 5L)      // DV on the big file
    t.deleteWhereMor(col("k") === 100001L) // DV on a small file
    val bigPath = t.manifest().where(col("row_count") >= 1000)
      .select("path").collect().map(_.getString(0)).toSeq
    assert(bigPath.size == 1)
    val bigBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/${bigPath.head}"))
    val res = spark.sql(
      "CALL prc.system.compact('t_compact_small', 1, '', 1000)")
      .collect()
    assert(res.head.getLong(0) == t.currentVersion)
    val t2 = GraftTable.forPath(spark, root)
    val m2 = t2.manifest().select("path", "row_count").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(m2.length == 2, s"1 big + 1 rewritten tail, got ${m2.toSeq}")
    assert(m2.map(_._1).contains(bigPath.head),
      "the big file must carry forward by reference")
    assert(java.nio.file.Files.readAllBytes(java.nio.file.Paths
      .get(s"$root/${bigPath.head}")).sameElements(bigBytes),
      "carried files must be byte-identical")
    // the big file's DV entry survives; the small one's materialized
    assert(t2.hasDeletionVectors())
    assert(t2.deletionVectors().count() == 1)
    assert(t2.read().count() == 100000 + 500 - 2)
    assert(t2.read().where(col("k").isin(5L, 100001L)).count() == 0)
    // nothing left below the threshold: the next call is a NO-OP
    val v = t2.currentVersion
    assert(t2.compactSmall(maxRows = 2) == v,
      "no qualifying files must mean no new snapshot")
  }

  test("CALL system.restore rolls back; named arguments bind") {
    val root = s"$wh/t_restore"
    val t = GraftTable.create(spark, root,
      (1L to 100L).toDF("k"), Seq("k"), numFiles = 2)
    t.deleteWhere(col("k") > 50)
    assert(t.read().count() == 50)
    val res = spark.sql(
      "CALL prc.system.restore(table => 't_restore', version => 1)")
      .collect()
    assert(res.map(_.getLong(0)).toSeq == Seq(3L))
    assert(GraftTable.forPath(spark, root).read().count() == 100)
  }

  test("CALL system.vacuum reclaims expired history files") {
    val root = s"$wh/t_vacuum"
    val t = GraftTable.create(spark, root,
      (1L to 1000L).toDF("k"), Seq("k"), numFiles = 4)
    t.compact(numFiles = 1)
    assert(dataFiles(root) == 5) // 4 original + 1 compacted
    // min_age_ms = 0: reclaim the expired history NOW (the default
    // guard keeps young dead files for a possible in-flight writer)
    val res = spark.sql("CALL prc.system.vacuum('t_vacuum', 1, 0)")
      .collect()
    assert(res.map(_.getLong(0)).toSeq == Seq(4L),
      "vacuum must report the 4 reclaimed files")
    assert(dataFiles(root) == 1)
    assert(GraftTable.forPath(spark, root).read().count() == 1000)
  }

  test("CALL system.zorder re-clusters on two dimensions") {
    val root = s"$wh/t_zorder"
    GraftTable.create(spark, root,
      spark.range(0, 10000).select(col("id").as("x"),
        ((col("id") * 7919) % 10000).as("y")),
      Seq("x", "y"), numFiles = 4)
    val res = spark.sql(
      "CALL prc.system.zorder('t_zorder', 'x,y', 8)").collect()
    assert(res.map(_.getLong(0)).toSeq == Seq(2L))
    val t = GraftTable.forPath(spark, root)
    // pruning now works on the SECOND dimension
    val (rows, planned, total) = t.prunedWhere(col("y") < 100)
    assert(rows.count() == spark.range(0, 10000)
      .where((col("id") * 7919) % 10000 < 100).count())
    assert(planned < total,
      s"z-order must enable y-pruning: $planned/$total")
  }

  test("3-dimensional z-order prunes on EVERY listed dimension") {
    val root = s"$wh/t_zorder3"
    GraftTable.create(spark, root,
      spark.range(0, 30000).select(col("id").as("x"),
        ((col("id") * 7919) % 30000).as("y"),
        ((col("id") * 104729) % 30000).as("z")),
      Seq("x", "y", "z"), numFiles = 4)
    spark.sql("CALL prc.system.zorder('t_zorder3', 'x,y,z', 27)")
      .collect()
    val t = GraftTable.forPath(spark, root)
    Seq("x", "y", "z").foreach { c =>
      val (rows, planned, total) = t.prunedWhere(col(c) < 1000)
      assert(rows.count() == 30000 / 30,
        s"dimension $c content must be exact")
      assert(planned < total,
        s"3-dim z-order must prune on $c: $planned/$total")
    }
  }

  test("CALL system.history returns the commit log as a result set") {
    val root = s"$wh/t_history"
    val t = GraftTable.create(spark, root,
      (1L to 100L).toDF("k"), Seq("k"), numFiles = 1)
    t.append((101L to 200L).toDF("k"), numFiles = 1)
    t.deleteWhere(col("k") <= 10)
    val h = spark.sql("CALL prc.system.history('t_history')")
      .select("version", "op", "n_rows").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(h.toSeq == Seq((3L, "delete", 190L), (2L, "append", 200L),
      (1L, "append", 100L)))
    // commit_ts (r14): the recorded wall-clock each version committed
    // at — the exact timeline TIMESTAMP AS OF resolves against —
    // surfaces through the procedure AND the API, non-null and
    // non-decreasing
    val ts = spark.sql("CALL prc.system.history('t_history')")
      .orderBy(col("version"))
      .select("commit_ts").collect().map(_.getTimestamp(0))
    assert(ts.forall(_ != null) &&
      ts.sliding(2).forall(p => !p(1).before(p(0))),
      s"commit_ts must be recorded and non-decreasing: ${ts.toSeq}")
    assert(t.history().orderBy(col("version"))
      .select("commit_ts").collect().map(_.getTimestamp(0).getTime)
      .toSeq == (1L to 3L).map(v => t.commitTsMillis(v).get),
      "history() commit_ts must equal the recorded stamp")
  }

  test("unknown procedures and wrong namespaces fail loudly; SHOW " +
      "PROCEDURES-style listing works") {
    intercept[Exception](
      spark.sql("CALL prc.system.no_such_proc('x')").collect())
    val cat = spark.sessionState.catalogManager.catalog("prc")
      .asInstanceOf[graft.sources.GraftCatalog]
    assert(cat.listProcedures(Array("system")).map(_.name()).sorted
      .toSeq == Seq("compact", "compact_to_size", "compact_where",
        "drop_tag", "files", "history", "maintain", "restore", "tag",
        "tags", "vacuum", "zorder"))
  }

  test("CALL system.files lists live files with row counts and live " +
      "DV entry counts, largest first, capped by max_files") {
    val root = s"$wh/t_files"
    val t = GraftTable.create(spark, root,
      (1L to 900L).toDF("k"), Seq("k"), numFiles = 3)
    t.append((901L to 910L).toDF("k"), numFiles = 1) // small-file tail
    t.deleteWhereMor(col("k") <= 50)
    val rows = spark.sql("CALL prc.system.files('t_files')")
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 4)
    assert(rows.map(_._2).sum == 910L, "row counts must sum to physical")
    assert(rows.map(_._4).sum == 50L, "live DV entries must sum to 50")
    assert(rows.head._2 >= rows.last._2, "largest files first")
    assert(rows.last._2 == 10L, "the small-file tail is visible")
    // size_bytes (round 13): the ops view reports real on-disk bytes
    rows.foreach { case (p, _, sz, _) =>
      assert(sz == new java.io.File(s"$root/$p").length(),
        s"size_bytes must be the file's on-disk bytes for $p")
    }
    val capped = spark.sql(
      "CALL prc.system.files('t_files', max_files => 2)").collect()
    assert(capped.length == 2)
  }

  test("CALL system.maintain: compacts ONLY when the deletion-vector " +
      "ratio crosses the threshold — a no-op below it, a DV-clearing " +
      "rewrite above it, schedulable unconditionally") {
    val root = s"$wh/t_maintain"
    val t = GraftTable.create(spark, root,
      (1L to 10000L).toDF("k"), Seq("k"), numFiles = 4)
    t.deleteWhereMor(col("k") <= 500) // 5% deleted — below default 10%
    val v = t.currentVersion
    val below = spark.sql(
      "CALL prc.system.maintain('t_maintain')").head().getLong(0)
    assert(below == v, "5% DV must not trigger the rewrite")
    assert(t.hasDeletionVectors(), "the DV must be untouched")
    t.deleteWhereMor(col("k") > 500 && col("k") <= 1500) // now 15%
    val above = spark.sql(
      "CALL prc.system.maintain('t_maintain', dv_ratio => 0.1)")
      .head().getLong(0)
    assert(above == t.currentVersion && above > v + 1,
      "15% DV must trigger a compaction commit")
    assert(!t.hasDeletionVectors(),
      "compaction must materialize deletions away")
    assert(t.read().count() == 8500)
    // small-file path: below the DV threshold but with small files
    // and small_max_rows set, it folds the debt incrementally —
    // count LIVE manifest entries (old versions' files stay on disk
    // until vacuum)
    t.append((10001L to 10005L).toDF("k"), numFiles = 1)
    t.append((10006L to 10010L).toDF("k"), numFiles = 1)
    val live0 = t.manifest().count()
    spark.sql("CALL prc.system.maintain('t_maintain', " +
      "small_max_rows => 100, num_files => 1)").collect()
    assert(t.read().count() == 8510)
    assert(t.manifest().count() == live0 - 1,
      "the two small files must fold into one, big files untouched")
  }
}
