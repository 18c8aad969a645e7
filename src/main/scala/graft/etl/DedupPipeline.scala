package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.{Cluster, Dedup}

/** End-to-end corpus deduplication — the job the individual operators
  * exist for: exact dedup → MinHash/LSH near-dup pairs → connected-
  * component clustering → keep one representative per cluster → write
  * the cleaned corpus.
  *
  * Shuffle budget at 100 TB (the whole point of the staging order):
  *  1. exact dedup: ONE shuffle on a 32-byte fingerprint with map-side
  *     partial aggregation — removes byte-identical copies before any
  *     expensive signature work;
  *  2. LSH: one corpus-linear signature pass (fused MinHashLanes), one
  *     shuffle on band buckets, candidate-only Jaccard verification
  *     (bucket-size cap kills the quadratic tail);
  *  3. clustering runs on the PAIR list — orders of magnitude smaller
  *     than the corpus (driver union-find under the cutoff, distributed
  *     label propagation above it);
  *  4. the final filter is a broadcast-able anti-join of the corpus
  *     against the drop list.
  * Nothing in the flow is ever O(corpus²).
  */
object DedupPipeline {

  case class Stats(
    nDocs: Long, nAfterExact: Long, nNearDupPairs: Long,
    nClusters: Long, nDroppedNear: Long, nKept: Long)

  /** Dedup `documents`-shaped input (doc_id, text, ...); returns the
    * cleaned corpus and stats. `jaccardThreshold` gates what counts as
    * a near-duplicate after LSH candidate generation. */
  def dedup(docs: DataFrame, jaccardThreshold: Double = 0.6)
      : (DataFrame, Stats) = {
    val nDocs = docs.count()

    // 1. exact: keep the min doc_id per normalized fingerprint
    val keepIds = docs
      .groupBy(TextFunctions.fingerprint(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val exactDocs = docs.join(keepIds, Seq("doc_id"), "left_semi")
      .persist()
    val nAfterExact = exactDocs.count()

    // 2. near-dup pairs among the exact survivors
    val pairs = Dedup.candidatePairs(exactDocs, jaccardThreshold)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
      .persist()
    val nPairs = pairs.count()

    // 3. clusters; every member except the min-id representative drops
    val cc = Cluster.connectedComponents(pairs)
    val drops = cc.where(col("id") =!= col("label"))
      .select(col("id").as("doc_id"))
    val nClusters = cc.select(col("label")).distinct().count()
    val nDropped = nDocs - nAfterExact + drops.count()

    // 4. cleaned corpus
    val cleaned = exactDocs.join(drops, Seq("doc_id"), "left_anti")
    val nKept = cleaned.count()
    pairs.unpersist()

    (cleaned, Stats(nDocs, nAfterExact, nPairs, nClusters,
      nDropped - (nDocs - nAfterExact), nKept))
  }

  /** Run against a testdata dir and write the cleaned corpus. */
  def run(spark: SparkSession, sourceDir: String, outDir: String,
      jaccardThreshold: Double = 0.6): Stats = {
    val (cleaned, stats) =
      dedup(graft.Tables.load(spark, sourceDir, "documents"),
        jaccardThreshold)
    cleaned.write.mode("overwrite").parquet(s"$outDir/documents_deduped")
    stats
  }
}
