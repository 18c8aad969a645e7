package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.format.{CommitIO, GraftTable, PosixCommitIO}

/** The CommitIO seam (VERDICT r10 #3): the snapshot put-if-absent is
  * the ONLY storage primitive the commit protocol assumes, so an
  * object-store conditional-PUT implementation slots in without
  * touching the format. Contention is faked THROUGH the trait — a
  * rival's snapshot lands between a writer's manifest build and its
  * put — proving the rebase loop works against any conforming impl. */
class CommitIOSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def tmp(): String = java.nio.file.Files
    .createTempDirectory("graft_commitio_spec_").toString + "/t"

  test("PosixCommitIO contract: first put wins, second returns false " +
      "and leaves the winner's content intact") {
    val p = java.nio.file.Paths.get(
      java.nio.file.Files.createTempDirectory("cio_").toString, "s.txt")
    assert(PosixCommitIO.putIfAbsent(p, "winner".getBytes("UTF-8")))
    assert(!PosixCommitIO.putIfAbsent(p, "loser".getBytes("UTF-8")))
    assert(new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      == "winner")
  }

  test("a writer whose put loses to a rival injected through the " +
      "CommitIO seam rebases and lands at N+1 with both row sets") {
    val root = tmp()
    val t = GraftTable.create(spark, root,
      (1L to 100L).toDF("k"), Seq("k"), numFiles = 1)
    // fake an object store where a RIVAL's conditional PUT lands
    // first, exactly once: the first call reports "already exists"
    // after materializing the rival's commit via a second handle
    val rival = GraftTable.forPath(spark, root)
    var injected = false
    t.commitIO = new CommitIO {
      override def putIfAbsent(path: java.nio.file.Path,
          content: Array[Byte]): Boolean = {
        if (!injected) {
          injected = true
          rival.append((201L to 300L).toDF("k"), numFiles = 1)
          false // the store had the rival's object: conditional PUT fails
        } else PosixCommitIO.putIfAbsent(path, content)
      }
    }
    val landed = t.append((101L to 200L).toDF("k"), numFiles = 1)
    assert(injected, "the contention branch must have run")
    assert(landed == 3L,
      "the loser must rebase onto the rival's v2 and claim v3")
    assert(t.read().count() == 300, "no rows lost on either side")
    assert(t.read().agg(countDistinct(col("k"))).head().getLong(0)
      == 300)
    val h = t.history().collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(h.toSeq == Seq((3L, 2L), (2L, 1L), (1L, 0L)),
      "parent chain must be linear through the rebase")
  }

  test("a store that rejects every put exhausts the retry budget " +
      "with a ConcurrentCommitException, never a silent overwrite") {
    val root = tmp()
    val t = GraftTable.create(spark, root,
      (1L to 10L).toDF("k"), Seq("k"), numFiles = 1)
    t.commitIO = (_, _) => false
    intercept[GraftTable.ConcurrentCommitException](
      t.append((11L to 20L).toDF("k"), numFiles = 1))
    t.commitIO = PosixCommitIO
    assert(t.currentVersion == 1, "no commit may have landed")
    assert(t.append((11L to 20L).toDF("k"), numFiles = 1) == 2L)
    assert(t.read().count() == 20)
  }
}
