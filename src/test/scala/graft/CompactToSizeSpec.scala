package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.format.GraftTable

/** Size-targeted compaction (round 13, on the new `size_bytes`
  * manifest stat): `compactToSize` folds files under `smallBytes`
  * into ~`targetBytes` outputs with the output count derived from
  * RECORDED bytes, carries healthy files by reference, and commits
  * as `data_change=0` so incremental consumers skip it — Delta
  * OPTIMIZE's contract without a `numFiles` guess. */
class CompactToSizeSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def tmp(): String = java.nio.file.Files
    .createTempDirectory("graft_cts_").toString + "/t"

  test("small files fold to the byte target, healthy files carry by " +
      "reference, content and history semantics hold") {
    val root = tmp()
    // one "healthy" larger file + 20 tiny ones
    val t = GraftTable.create(spark, root,
      (1L to 20000L).map(k => (k, s"p-$k-${"z" * 30}")).toDF("k", "s"),
      Seq("k"), numFiles = 1)
    (1 to 20).foreach(i =>
      t.append(Seq((100000L + i, s"tiny-$i")).toDF("k", "s"),
        numFiles = 1))
    val before = t.manifest().select("path", "size_bytes").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(before.size == 21)
    val healthy = before.maxBy(_._2)
    val tinyBytes = before.values.sum - healthy._2
    val want = t.read().orderBy("k").collect()

    // threshold between tiny and healthy; target larger than all the
    // tiny bytes together → exactly ONE folded output
    val v = t.compactToSize(smallBytes = healthy._2,
      targetBytes = tinyBytes * 10L)
    assert(v == t.currentVersion)
    val after = t.manifest().select("path", "size_bytes").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after.contains(healthy._1),
      "the healthy file must carry by reference")
    assert(after.size == 2,
      s"20 tiny files must fold into one output, got ${after.size}")
    assert(t.read().orderBy("k").collect().toSeq == want.toSeq)
    // reorganization commit: CDC skips it
    assert(t.history().where(col("version") === v)
      .select("op").head().getString(0) == "compact_to_size")
    assert(t.readChanges(v - 1, v).isEmpty,
      "a size compaction must emit no change rows")
  }

  test("output count scales with the byte target; no-op below the " +
      "fold minimum") {
    val root = tmp()
    val t = GraftTable.create(spark, root,
      (1L to 4000L).map(k => (k, s"pad-$k-${"w" * 40}")).toDF("k", "s"),
      Seq("k"), numFiles = 16)
    val sizes = t.manifest().select("size_bytes").collect()
      .map(_.getLong(0))
    val total = sizes.sum
    // target ~ quarter of the total → ~4 outputs (ceil division)
    val v = t.compactToSize(smallBytes = sizes.max + 1L,
      targetBytes = total / 4L)
    val nOut = t.fileCount(v)
    val expect = (total + total / 4L - 1L) / (total / 4L)
    assert(nOut == expect,
      s"output count must derive from bytes ($nOut vs $expect)")
    assert(t.read().count() == 4000L)
    // everything is now at/over the small threshold → zero-IO no-op
    val v2 = t.compactToSize(smallBytes = 1024L, targetBytes = total)
    assert(v2 == v, "nothing under the threshold must not commit")
  }

  test("CALL system.compact_to_size folds by name with defaults") {
    val wh = java.nio.file.Files
      .createTempDirectory("graft_cts_wh_").toString
    val cat = "cts"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try {
      val root = s"$wh/t_cts"
      val t = GraftTable.create(spark, root,
        (1L to 50L).map(k => (k, k * 3L)).toDF("k", "v"), Seq("k"),
        numFiles = 1)
      (1 to 7).foreach(i =>
        t.append(Seq((100L + i, i.toLong)).toDF("k", "v"),
          numFiles = 1))
      val out = spark.sql(
        s"CALL $cat.system.compact_to_size('t_cts')").collect()
      assert(out.length == 1)
      val t2 = GraftTable.forPath(spark, root)
      assert(t2.fileCount() == 1L,
        "8 micro files under the default 32 MB threshold fold to one")
      assert(t2.read().count() == 57L)
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
    }
  }
}
