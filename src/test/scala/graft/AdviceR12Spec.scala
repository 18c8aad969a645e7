package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.format.GraftTable

/** ADVICE r12 regression pins (beyond the OnePassWriteSpec NaN /
  * Binary cases): the stats-present marker (`nulls_<c>`) — a file
  * whose stats column is ALL NULL records a genuinely-computed null
  * envelope, which must NOT read as "dir predates stats": SQL
  * MIN/MAX ignore nulls, so folding the remaining envelopes stays
  * exact and metadata-only aggregates keep answering. Dirs truly
  * missing the marker (pre-stats) stay conservative — AdviceR11Spec
  * pins that side. */
class AdviceR12Spec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def tmp(): String = java.nio.file.Files
    .createTempDirectory("graft_advice12_").toString + "/t"

  test("an ALL-NULL stats file does not poison metadata MIN/MAX: the " +
      "marker distinguishes computed-null from missing stats") {
    val root = tmp()
    val t = GraftTable.create(spark, root,
      (1L to 100L).map(k => (k, java.lang.Long.valueOf(k * 10)))
        .toDF("k", "v"), Seq("k", "v"), numFiles = 2)
    // a whole file of v = NULL (k stays populated)
    t.append((101L to 120L).map(k => (k, null: java.lang.Long))
      .toDF("k", "v"), numFiles = 1)
    assert(t.manifest().where(col("min_v").isNull).count() == 1,
      "the all-null file records a null v-envelope")
    assert(t.incompleteEnvelopeCols().isEmpty,
      "computed-null is not an incomplete envelope")
    val m = t.metadataAggregates().head()
    assert(m.getAs[Long]("min_v") == 10L &&
      m.getAs[Long]("max_v") == 1000L,
      "metadata MIN/MAX fold the non-null envelopes exactly")
    assert(m.getAs[Long]("min_k") == 1L &&
      m.getAs[Long]("max_k") == 120L)
    assert(m.getAs[Long]("n_rows") == 120L)
    // the data-level answer agrees (ground truth)
    val truth = t.read().agg(min("v"), max("v")).head()
    assert(truth.getLong(0) == 10L && truth.getLong(1) == 1000L)
  }

  test("the marker rides the TWO-PASS path too (bloom-indexed table) " +
      "and survives compaction of mixed null/non-null files") {
    val root = tmp()
    val t = GraftTable.create(spark, root,
      (1L to 50L).map(k => (k, java.lang.Long.valueOf(k)))
        .toDF("k", "v"),
      Seq("k", "v"), numFiles = 1, bloomCols = Seq("k"))
    t.append((51L to 60L).map(k => (k, null: java.lang.Long))
      .toDF("k", "v"), numFiles = 1)
    assert(t.incompleteEnvelopeCols().isEmpty)
    val m = t.metadataAggregates().head()
    assert(m.getAs[Long]("min_v") == 1L && m.getAs[Long]("max_v") == 50L)
    t.compact(numFiles = 1) // nulls fold into one file: 10 of 60 null
    assert(t.incompleteEnvelopeCols().isEmpty)
    val m2 = t.metadataAggregates().head()
    assert(m2.getAs[Long]("min_v") == 1L &&
      m2.getAs[Long]("max_v") == 50L &&
      m2.getAs[Long]("n_rows") == 60L)
  }
}
