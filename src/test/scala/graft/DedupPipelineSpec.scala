package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.DedupPipeline

/** End-to-end dedup: plant exact copies and near-duplicates into the
  * corpus and assert the pipeline removes exactly them. */
class DedupPipelineSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  test("planted exact and near duplicates are removed, originals kept") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text")
    val n = docs.count()

    // exact copies of 5 docs under new ids, near-copies (one appended
    // token) of 5 others
    val exactCopies = docs.where(col("doc_id") < 5)
      .select((col("doc_id") + 100000).as("doc_id"), col("text"))
    val nearCopies = docs.where(col("doc_id") >= 5 && col("doc_id") < 10)
      .select((col("doc_id") + 200000).as("doc_id"),
        concat(col("text"), lit(" zzz")).as("text"))
    val corpus = docs.unionByName(exactCopies).unionByName(nearCopies)

    val (cleaned, stats) = DedupPipeline.dedup(corpus, 0.5)

    assert(stats.nDocs === n + 10)
    // exact stage removes exactly the 5 byte-identical copies
    assert(stats.nAfterExact === n + 5)
    // near stage drops one of each planted near-pair (keeps min doc_id,
    // which is always the original) — plus whatever organic near-dups
    // the corpus itself contains
    assert(stats.nDroppedNear >= 5)
    val keptIds = cleaned.select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert((0L until 10L).forall(keptIds.contains),
      "originals must survive as cluster representatives")
    assert(!(100000L until 100005L).exists(keptIds.contains),
      "exact copies must drop")
    assert(!(200005L until 200010L).exists(keptIds.contains),
      "planted near-copies must drop")
    assert(stats.nKept === cleaned.count())
  }

  test("run() writes the cleaned corpus") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_dedup_").toString
    val stats = DedupPipeline.run(spark, sfDir, out)
    val written = spark.read.parquet(s"$out/documents_deduped").count()
    assert(written === stats.nKept)
    assert(stats.nKept > 0)
  }
}
