package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** The full training-corpus curation job — the flagship composition of
  * the corpus operators: per-document signals → quality/length gates →
  * exact + near-duplicate removal → benchmark-contamination filter →
  * sequence packing → curated parquet plus gzip-JSONL shards for the
  * tokenizer handoff, with a funnel report of what each stage dropped.
  *
  * Stage order is the shuffle-budget order (cheapest rejection first):
  *  1. signals + gates are MAP-ONLY — no shuffle spent on a document a
  *     length check would drop;
  *  2. dedup pays its fingerprint/LSH shuffles only for gate survivors
  *     (etl.DedupPipeline — nothing O(corpus²));
  *  3. the contamination filter joins survivor n-grams against a
  *     BROADCAST eval-gram set;
  *  4. packing is a prefix-sum over the final corpus (two-pass at
  *     cluster scale, see CorpusOps.q59SeqPacking).
  */
object CurationPipeline {

  case class Config(
    minTokens: Int = 5,
    maxTokens: Int = 100000,
    minQuality: Double = 0.3,
    maxDupTokenRatio: Double = 0.9,
    jaccardThreshold: Double = 0.6,
    maxContamination: Double = 0.5,
    contextTokens: Int = 512)

  case class Funnel(
    nInput: Long, nAfterGates: Long, nAfterDedup: Long,
    nAfterContamination: Long, nPacks: Long)

  /** Per-document signal projection (map-only, codegen'd). */
  def withSignals(docs: DataFrame): DataFrame = docs
    .withColumn("n_toks", nTokens(col("text")).cast("long"))
    .withColumn("quality", qualityScore(col("text")))
    .withColumn("dup_ratio",
      round(lit(1) - nUniqueTokens(col("text")) /
        nTokens(col("text")).cast("double"), 4))

  /** Quality/length/repetition gates (map-only). */
  def gate(signals: DataFrame, cfg: Config): DataFrame = signals
    .where(col("n_toks").between(cfg.minTokens, cfg.maxTokens) &&
      col("quality") >= cfg.minQuality &&
      col("dup_ratio") <= cfg.maxDupTokenRatio)

  /** Drop documents sharing more than `maxContamination` of their
    * distinct word 3-grams with the eval set (broadcast; same plan as
    * CorpusOps.q58Contamination). */
  def decontaminate(docs: DataFrame, evalDocs: DataFrame,
      cfg: Config): DataFrame = {
    val evalGrams = evalDocs
      .select(explode(array_distinct(shingles(col("text"), 3))).as("gram"))
      .distinct()
      .withColumn("in_eval", lit(1))
    val shares = docs
      .select(col("doc_id"),
        explode(array_distinct(shingles(col("text"), 3))).as("gram"))
      .join(broadcast(evalGrams), Seq("gram"), "left")
      .groupBy(col("doc_id"))
      .agg((sum(coalesce(col("in_eval"), lit(0))) /
        count(lit(1)).cast("double")).as("contamination"))
    docs.join(
      shares.where(col("contamination") > cfg.maxContamination)
        .select(col("doc_id")),
      Seq("doc_id"), "left_anti")
  }

  /** Assign each document to a fixed-size context-window pack
    * (CorpusOps.q59 semantics over the curated survivors, via the
    * distributed two-pass prefix sum — no global window). */
  def pack(docs: DataFrame, cfg: Config): DataFrame =
    graft.operators.PrefixSum
      .exclusive(docs, "doc_id", "n_toks", "cum_before")
      .withColumn("pack_id",
        floor(col("cum_before") / cfg.contextTokens).cast("long"))
      .drop("cum_before")

  /** Run the whole funnel; `evalDocs` defaults to doc_id ≡ 0 (mod 100)
    * held-out sample. Writes curated parquet + gzip JSONL shards. */
  def run(spark: SparkSession, sourceDir: String, outDir: String,
      cfg: Config = Config()): Funnel = {
    val docs = graft.Tables.load(spark, sourceDir, "documents")
    val nInput = docs.count()

    val gated = gate(withSignals(docs), cfg).persist()
    val nAfterGates = gated.count()

    val (deduped, _) = DedupPipeline.dedup(gated, cfg.jaccardThreshold)
    val nAfterDedup = deduped.count()

    val eval = docs.where(col("doc_id") % 100 === 0)
    val clean = decontaminate(
      deduped.where(col("doc_id") % 100 =!= 0), eval, cfg)
    val packed = pack(clean, cfg).persist()
    val nClean = packed.count()
    val nPacks = packed.select(col("pack_id")).distinct().count()

    packed.write.mode("overwrite").parquet(s"$outDir/curated")
    Sinks.writeJsonl(
      packed.select(col("doc_id"), col("pack_id"), col("text")),
      s"$outDir/curated_jsonl")
    gated.unpersist(); packed.unpersist()

    Funnel(nInput, nAfterGates, nAfterDedup, nClean, nPacks)
  }
}
