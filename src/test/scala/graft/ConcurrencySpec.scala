package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.format.GraftTable
import scala.concurrent.{Await, Future}
import scala.concurrent.duration.Duration
import scala.concurrent.ExecutionContext.Implicits.global

/** Multi-writer stress matrix (VERDICT r10 #4): the commit protocol
  * claims serializability — optimistic put-if-absent with loser
  * rebase, buildDelta/extraDv re-derived per attempt against the new
  * parent. These cases prove it under REAL thread interleaving:
  * gapless linear history, no lost rows, exactly-once ledger, and DV
  * integrity across every mutation pairing. */
class ConcurrencySpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {
  import TestSpark.spark
  import spark.implicits._

  /** Override to route every table this suite builds through an
    * alternate [[graft.format.LogStore]] — S3ConditionalCommitSpec
    * re-runs the full race matrix through the conditional-PUT store
    * against an S3-semantics HTTP fake (VERDICT r13 #3). */
  protected def raceStore: Option[graft.format.LogStore] = None

  private val base = java.nio.file.Files
    .createTempDirectory("graft_conc_spec_").toString
  private var prevProvider: String => graft.format.LogStore = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    raceStore.foreach { s =>
      prevProvider = graft.format.LogStore.provider
      graft.format.LogStore.provider =
        r => if (r.startsWith(base)) s else prevProvider(r)
    }
  }

  override def afterAll(): Unit = {
    if (raceStore.isDefined)
      graft.format.LogStore.provider = prevProvider
    super.afterAll()
  }

  protected def tmp(): String =
    s"$base/${java.util.UUID.randomUUID.toString.take(8)}/t"

  /** history() must be a gapless linear parent chain 1..cur. */
  private def assertLinear(t: GraftTable): Unit = {
    val h = t.history().orderBy(col("version"))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(h.map(_._1).toSeq == (1L to t.currentVersion),
      s"gapless versions expected: ${h.toSeq}")
    h.foreach { case (v, p) =>
      assert(p == v - 1, s"v$v must have parent ${v - 1}, had $p")
    }
  }

  private def awaitAll[A](fs: Seq[Future[A]]): Seq[A] =
    fs.map(Await.result(_, Duration.Inf))

  test("race 1: 4 writers x 3 appends each — every commit lands, " +
      "history is gapless, no row lost or duplicated") {
    val root = tmp()
    val t = GraftTable.create(spark, root,
      (1L to 100L).toDF("k"), Seq("k"), numFiles = 1)
    val handles = (0 until 4).map(_ => GraftTable.forPath(spark, root))
    awaitAll(handles.zipWithIndex.map { case (h, w) => Future {
      (0 until 3).foreach { i =>
        val lo = 1000L * (w * 3 + i + 1)
        h.append(((lo + 1) to (lo + 50)).toDF("k"), numFiles = 1)
      }
    }})
    assert(t.currentVersion == 13, "12 appends after create")
    assertLinear(t)
    assert(t.read().count() == 100 + 12 * 50)
    assert(t.read().agg(countDistinct(col("k"))).head().getLong(0)
      == 100 + 12 * 50)
  }

  test("race 2: appends racing a concurrent compact — content is the " +
      "union of all appends regardless of interleaving") {
    val root = tmp()
    val t = GraftTable.create(spark, root,
      (1L to 100L).toDF("k"), Seq("k"), numFiles = 4)
    val appender = GraftTable.forPath(spark, root)
    awaitAll(Seq(
      Future { (1 to 3).foreach { i =>
        val lo = 1000L * i
        appender.append(((lo + 1) to (lo + 50)).toDF("k"), numFiles = 2)
      }},
      Future { (1 to 3).foreach(_ => t.compact(numFiles = 1)) }))
    assertLinear(t)
    assert(t.read().count() == 250, "compactions must not drop appends")
    assert(t.read().agg(countDistinct(col("k"))).head().getLong(0)
      == 250)
  }

  test("race 3: deleteWhereMor racing compact — rows deleted exactly " +
      "once, no resurrection through either ordering, DV consistent") {
    val root = tmp()
    val t = GraftTable.create(spark, root,
      (1L to 1000L).toDF("k"), Seq("k"), numFiles = 8)
    val deleter = GraftTable.forPath(spark, root)
    awaitAll(Seq(
      Future { deleter.deleteWhereMor(col("k") <= 100) },
      Future { t.compact(numFiles = 2) }))
    assertLinear(t)
    val remaining = t.read()
    assert(remaining.count() == 900,
      "the MOR delete must survive a racing compact (or vice versa)")
    assert(remaining.agg(min(col("k"))).head().getLong(0) == 101)
    // every DV entry must point at a LIVE manifest file
    if (t.hasDeletionVectors()) {
      val orphans = t.deletionVectors()
        .join(t.manifest().select("path"), Seq("path"), "left_anti")
        .count()
      assert(orphans == 0, s"$orphans DV entries reference dead files")
    }
  }

  test("race 4: merge racing replaceWhere on disjoint key ranges — " +
      "both effects land whatever the commit order") {
    val root = tmp()
    val t = GraftTable.create(spark, root,
      (1L to 1000L).map(k => (k, 0L)).toDF("k", "v"),
      Seq("k"), numFiles = 8)
    val merger = GraftTable.forPath(spark, root)
    awaitAll(Seq(
      Future { merger.merge(
        (1L to 50L).map(k => (k, 999L)).toDF("k", "v"), Seq("k")) },
      Future { t.replaceWhere(col("k") > 900,
        (901L to 950L).map(k => (k, -1L)).toDF("k", "v")) }))
    assertLinear(t)
    val r = t.read()
    assert(r.count() == 950, "replaceWhere shrank 100 keys to 50")
    assert(r.where(col("k") <= 50 && col("v") === 999L).count() == 50,
      "the merge's updates must all be present")
    assert(r.where(col("k") > 900).count() == 50)
    assert(r.where(col("k") > 900 && col("v") === -1L).count() == 50,
      "the replacement rows must all be present")
  }

  test("race 5: two writers committing the SAME streaming batch id — " +
      "the ledger admits it exactly once") {
    val root = tmp()
    val t = GraftTable.openOrCreate(spark, root, Seq("k"))
    val rival = GraftTable.openOrCreate(spark, root, Seq("k"))
    val batch = (1L to 100L).toDF("k")
    awaitAll(Seq(
      Future { t.appendIfAbsent(batch, batchId = 7L, numFiles = 1) },
      Future { rival.appendIfAbsent(batch, batchId = 7L, numFiles = 1) }))
    assert(t.read().count() == 100,
      "a replayed epoch must not double-apply")
    assert(t.appliedBatches == Set(7L))
    // at most one of the two commits carried data; history stays linear
    assertLinear(t)
  }

  test("race 6: overlapping COW deletes — the survivor set is exactly " +
      "the rows matching neither predicate, with no phantom rows") {
    val root = tmp()
    val t = GraftTable.create(spark, root,
      (1L to 1000L).toDF("k"), Seq("k"), numFiles = 8)
    val rival = GraftTable.forPath(spark, root)
    awaitAll(Seq(
      Future { t.deleteWhere(col("k") <= 200) },
      Future { rival.deleteWhere(col("k") > 150 && col("k") <= 300) }))
    assertLinear(t)
    val r = t.read()
    assert(r.count() == 700, "both deletes must apply, overlap once")
    assert(r.agg(min(col("k"))).head().getLong(0) == 301)
    assert(r.agg(countDistinct(col("k"))).head().getLong(0) == 700)
  }

  test("race 7: 3 writers x 2 MOR merges on interleaved key slices — " +
      "every slice's final value wins exactly once, DV never points " +
      "at a dead file") {
    val root = tmp()
    val t = GraftTable.create(spark, root,
      (1L to 300L).map(k => (k, 0L)).toDF("k", "v"),
      Seq("k"), numFiles = 4)
    val handles = (0 until 3).map(_ => GraftTable.forPath(spark, root))
    awaitAll(handles.zipWithIndex.map { case (h, w) => Future {
      (0 until 2).foreach { i =>
        // writer w updates keys ≡ w (mod 3), twice (second overwrites)
        val updates = (1L to 300L).filter(_ % 3 == w)
          .map(k => (k, (w * 10 + i + 1).toLong)).toDF("k", "v")
        h.mergeMor(updates, Seq("k"))
      }
    }})
    assertLinear(t)
    val r = t.read()
    assert(r.count() == 300, "upserts must never duplicate a key")
    assert(r.agg(countDistinct(col("k"))).head().getLong(0) == 300)
    (0 until 3).foreach { w =>
      assert(r.where(col("k") % 3 === w && col("v") === (w * 10 + 2))
        .count() == 100,
        s"writer $w's second merge must be the final value for its slice")
    }
    val orphans = t.deletionVectors()
      .join(t.manifest().select("path"), Seq("path"), "left_anti")
      .count()
    assert(orphans == 0, s"$orphans DV entries reference dead files")
  }
}
