package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Corpus-preparation operators a large-scale training-data pipeline
  * needs beyond per-document scoring: boilerplate detection,
  * benchmark-contamination checks, sequence packing, vocabulary stats,
  * weighted sampling, repetition filters, curriculum bucketing, PII
  * scrubbing, and per-source corpus health rollups. Every query here is
  * DuckDB-oracle-checked (hash match), so the cross-engine determinism
  * rules apply: md5 for hashes, exactly-rounded single IEEE ops for
  * priorities, ROUND at fixed precision for doubles.
  *
  * Scale notes are per-operator; the common pattern is one shuffle on a
  * corpus-sized key (gram / token / fingerprint) with map-side partial
  * aggregation, which is the shape that survives 100 TB.
  */
object CorpusOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** The single-file documents table reads as ONE input partition, and
    * `shingles`/`tokens` are interpreted higher-order expressions —
    * explode-heavy queries must spread that per-row work across the
    * cluster first or one task grinds through the whole corpus. */
  private def docsSpread(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).repartition(s.sparkContext.defaultParallelism)

  /** q56 — boilerplate span detection: word 3-gram spans shared by ≥2
    * distinct documents, with corpus-wide occurrence counts. The
    * training-data use is stripping repeated headers/footers/navigation
    * chrome. Plan: explode grams (codegen'd), ONE shuffle on the gram
    * string with partial aggregation; the ≥2-docs filter runs post-agg
    * (HAVING). At 100 TB the gram key-space is bounded by corpus vocab,
    * and frequent-gram skew is absorbed by the partial aggregate. */
  def q56BoilerplateSpans(s: SparkSession, dir: String): DataFrame =
    docsSpread(s, dir)
      .select(col("doc_id"), explode(shingles(col("text"), 3)).as("span"))
      // two-stage instead of count(distinct): the (span, doc_id)
      // pre-aggregate collapses within-doc repeats map-side, then the
      // span rollup is a plain count+sum — no Expand, and a hot span's
      // rows were already thinned by the first stage (skew-safe)
      .groupBy(col("span"), col("doc_id"))
      .agg(count(lit(1)).as("occ"))
      .groupBy(col("span"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("occ")).as("n_occurrences"))
      .where(col("n_docs") >= 2)

  /** q57 — PII/identifier scrubbing: mask digit runs in the customer
    * name (account-number-shaped tokens) and count redacted characters
    * (the audit trail a compliance pipeline needs). Pure per-row regex
    * work — no shuffle, stays inside whole-stage codegen; at 100 TB
    * this is a map-only pass. */
  def q57PiiMask(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "customer").select(
      col("c_custkey"),
      regexp_replace(col("c_name"), "[0-9]+", "#").as("masked_name"),
      (length(col("c_name")) -
        length(regexp_replace(col("c_name"), "[0-9]", "")))
        .as("n_digits_redacted"))

  /** q58 — benchmark-contamination check: the held-out set is every
    * doc_id ≡ 0 (mod 100); for each training document, the share of its
    * distinct word 3-grams that also occur in the held-out set. Plan:
    * the eval-gram table is distinct-aggregated then BROADCAST (eval
    * sets are small by construction); training grams never shuffle —
    * explode → broadcast-hash left join → per-doc partial agg. */
  def q58Contamination(s: SparkSession, dir: String): DataFrame = {
    val d = docsSpread(s, dir)
    val evalGrams = d.where(col("doc_id") % 100 === 0)
      .select(explode(array_distinct(shingles(col("text"), 3))).as("gram"))
      .distinct()
      .withColumn("in_eval", lit(1))
    val trainGrams = d.where(col("doc_id") % 100 =!= 0)
      .select(col("doc_id"),
        explode(array_distinct(shingles(col("text"), 3))).as("gram"))
    trainGrams
      .join(broadcast(evalGrams), Seq("gram"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(coalesce(col("in_eval"), lit(0))).as("n_contaminated"))
      .withColumn("contamination_share",
        round(col("n_contaminated") / col("n_grams").cast("double"), 4))
  }

  /** q59 — sequence packing: stream documents in doc_id order into
    * fixed 512-token context windows (documents may straddle a
    * boundary — "packed pretraining batch" semantics), then report each
    * pack's fill. The running sum is the DISTRIBUTED two-pass prefix
    * sum ([[PrefixSum.exclusive]]: range-bucket → bucket-local window →
    * broadcast offsets) — no single-partition global window anywhere,
    * so the pass survives a 100 TB corpus. */
  def q59SeqPacking(s: SparkSession, dir: String): DataFrame = {
    val ctx = 512
    val perDoc = docs(s, dir)
      .select(col("doc_id"), nTokens(col("text")).cast("long").as("n_toks"))
    PrefixSum.exclusive(perDoc, "doc_id", "n_toks", "cum_before")
      .withColumn("pack_id", floor(col("cum_before") / ctx).cast("long"))
      .groupBy(col("pack_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
  }

  /** q60 — corpus vocabulary top-k: the 50 most frequent whitespace
    * tokens with deterministic tie-break (count desc, token asc). One
    * shuffle on the token with partial agg, then `rank <= 50` over an
    * EMPTY-partition window, which Spark 4's
    * LimitPushDownThroughWindow rule rewrites to a limit BELOW the
    * window: the executed plan is TakeOrderedAndProject(50) — a
    * per-partition top-50 heap + driver merge — feeding a Window over
    * exactly 50 rows. The vocabulary is never globally sorted or
    * gathered (plan-pinned in PlanShapeSpec; the partitioned-rank
    * cousin of this rewrite is WindowGroupLimitExec, which q97-style
    * per-group top-k shapes get instead). */
  def q60VocabTopK(s: SparkSession, dir: String): DataFrame = {
    val counts = docsSpread(s, dir)
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
    val w = Window.orderBy(col("n").desc, col("token").asc)
    counts
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 50)
  }

  /** q61 — deterministic weighted sampling (Efraimidis–Spirakis shape):
    * priority = hash(doc_id) / weight, keep the 64 smallest. The hash is
    * the first 8 md5 hex digits as an integer (engine-portable), the
    * weight is n_chars, and the priority is ONE exactly-rounded IEEE
    * division — so the ranking is bit-identical in any engine.
    * Longer docs ⇒ smaller priority ⇒ proportionally likelier selection.
    * Distributed shape: per-partition bottom-k then merge (same
    * Aggregator as q30); here expressed as the equivalent top-k plan. */
  def q61WeightedSample(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), col("n_chars"),
        (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long") / col("n_chars").cast("double")).as("priority"))
      .orderBy(col("priority").asc, col("doc_id").asc)
      .limit(64)
      .select(col("doc_id"), col("n_chars"), round(col("priority"), 4).as("priority"))

  /** q62 — repetition statistics (Gopher-style quality signals): per
    * document, the duplicate-token ratio and the most-frequent-token
    * share. Token counts explode through ONE (doc_id, token) shuffle
    * with partial agg, then collapse per doc — both keys are
    * high-cardinality, so the plan has no skew hotspot. */
  def q62RepetitionStats(s: SparkSession, dir: String): DataFrame =
    docsSpread(s, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_unique"),
        round(lit(1) - count(lit(1)) / sum(col("c")).cast("double"), 4)
          .as("dup_ratio"),
        round(max(col("c")) / sum(col("c")).cast("double"), 4)
          .as("top_token_share"))

  /** q63 — curriculum bucketing: NTILE(10) over (n_chars, doc_id) —
    * the deterministic total order makes bucket boundaries
    * engine-portable — with per-bucket size/length stats. The tiles
    * come from [[PrefixSum.ntile]] (bucketed prefix-count rank +
    * integer tile arithmetic), NOT a global window: bit-identical to
    * `ntile(10).over(Window.orderBy(...))` (the DuckDB oracle still
    * hash-matches) but the corpus never moves through one task. The
    * composite order key packs (n_chars, doc_id) into one long —
    * exact while n_chars·2³² + doc_id < 2⁵³ (the approxQuantile
    * boundary probe casts it to double; only bucket ASSIGNMENT uses
    * the cast, and any monotone bucketing is correct). */
  def q63CurriculumBuckets(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir)
      .select(col("doc_id"), col("n_chars"),
        nTokens(col("text")).cast("long").as("n_toks"))
      .withColumn("_ord",
        col("n_chars") * lit(4294967296L) + col("doc_id"))
    PrefixSum.ntile(base, "_ord", 10, "bucket")
      .withColumn("bucket", col("bucket").cast("long"))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        round(avg(col("n_toks")), 2).as("avg_tokens"))
  }

  /** q64 — SCD2 history build (the "hist" in the reference's name):
    * collapse each user's event stream into type-2 validity intervals —
    * a row per event_type CHANGE, valid until the next change (NULL =
    * current). Two window passes over the same (user_id, ts, event_id)
    * order → Catalyst reuses ONE sort+shuffle for both. */
  def q64Scd2History(s: SparkSession, dir: String): DataFrame = {
    val ord = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val changes = Tables.load(s, dir, "events")
      .withColumn("prev_type", lag(col("event_type"), 1).over(ord))
      .where(col("prev_type").isNull ||
        col("prev_type") =!= col("event_type"))
    changes
      .withColumn("valid_to_ts", lead(col("ts"), 1).over(ord))
      .select(
        col("user_id"), col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
        date_format(col("valid_to_ts"), "yyyy-MM-dd HH:mm:ss").as("valid_to"))
  }

  /** q65 — per-source corpus health rollup: doc counts, exact-duplicate
    * counts (corpus-wide fingerprint collisions attributed back to each
    * source), language diversity, and size stats. The fingerprint
    * count is a corpus-wide shuffle on md5 (uniform key), rejoined to
    * the docs — at 100 TB the fingerprint-count table is dedup-output-
    * sized, so the join shuffles both sides on the fingerprint. */
  def q65SourceRollup(s: SparkSession, dir: String): DataFrame = {
    val fp = docs(s, dir).select(
      col("doc_id"), col("source"), col("lang"), col("n_chars"),
      fingerprint(col("text")).as("f"))
    val counts = fp.groupBy(col("f")).agg(count(lit(1)).as("copies"))
    fp.join(counts, Seq("f"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("copies") > 1, 1).otherwise(0)).as("n_dup_docs"),
        countDistinct(col("lang")).as("n_langs"),
        round(avg(col("n_chars")), 2).as("avg_chars"))
  }

  /** q80 — deterministic train/val/test split with per-split health
    * stats: the split is a pure function of the doc id (md5 hex-prefix
    * buckets, ≈80/10/10), so any engine — and any rerun, at any
    * scale — assigns every document identically with zero coordination
    * (the same idiom as q49's stratified sample and q61's weighted
    * sample). One map-only projection + a 3-group aggregate; the
    * per-split token totals are exact integer sums. */
  def q80DatasetSplit(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("b", substring(md5(col("doc_id").cast("string")), 1, 2))
      .withColumn("split",
        when(col("b") < "cc", "train")       // 204/256 ≈ 79.7%
          .when(col("b") < "e6", "val")      //  26/256 ≈ 10.2%
          .otherwise("test"))                //  26/256 ≈ 10.2%
      .groupBy(col("split"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(nTokens(col("text")).cast("long")).as("n_tokens"),
        countDistinct(col("source")).as("n_sources"),
        round(sum(col("n_chars")) / count(lit(1)).cast("double"), 2)
          .as("avg_chars"))

  val ChunkTokens = 32
  val ChunkOverlap = 8

  /** q82 — document chunking for retrieval: fixed 32-token windows with
    * 8-token overlap (stride 24), emitted as boundaries + an md5 of the
    * re-joined chunk text so the result is hash-checkable without
    * dumping chunk bodies. The chunk starts come from sequence() over
    * each doc's own length — map-only generate + slice, no shuffle at
    * all; at 100 TB chunking is a pure scan whose output feeds the
    * embedding stage. Distinct from q59 packing: packing CONCATENATES
    * docs into fixed windows, chunking SPLITS each doc. */
  def q82Chunking(s: SparkSession, dir: String): DataFrame =
    docsSpread(s, dir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("n_toks", size(col("toks")))
      .select(col("doc_id"), col("toks"), col("n_toks"),
        posexplode(expr(
          s"sequence(0, n_toks - 1, ${ChunkTokens - ChunkOverlap})"))
          .as(Seq("chunk_idx", "start_tok")))
      .withColumn("chunk", expr(s"slice(toks, start_tok + 1, $ChunkTokens)"))
      .select(
        col("doc_id"), col("chunk_idx"), col("start_tok"),
        size(col("chunk")).as("n_in_chunk"),
        md5(concat_ws(" ", col("chunk"))).as("chunk_hash"))

  /** q81 — full-outer reconciliation: per-user order counts vs event
    * counts, keeping users present on EITHER side and classifying the
    * mismatch — the referential-integrity audit between two fact
    * tables. Both inputs aggregate before the join (user-sized, not
    * fact-sized), so the full-outer shuffle carries one row per user
    * per side. */
  def q81FullOuter(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
      .groupBy(col("o_custkey").as("user_id"))
      .agg(count(lit(1)).as("n_orders"))
    val e = Tables.load(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    o.join(e, o("user_id") === e("user_id"), "full_outer")
      .select(
        coalesce(o("user_id"), e("user_id")).as("user_id"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        when(o("user_id").isNull, "events_only")
          .when(e("user_id").isNull, "orders_only")
          .otherwise("both").as("presence"))
  }

  /** q115 — cross-source phrase-leakage matrix: for every source pair,
    * how many DISTINCT word-3-grams they share verbatim — the "which
    * feeds copy from which" diagnostic that decides whether dedup must
    * run globally or per-source (and the contamination screen when one
    * source is a held-out benchmark feed; q58 is the doc-level view,
    * this the source-pair rollup). Shape: one (source, gram) distinct,
    * one gram-keyed aggregate, then pairs expand MAP-SIDE from each
    * gram's source set — bounded by the source count, never corpus².
    * The top-50 is TakeOrderedAndProject under a full tiebreak. */
  def q115LeakageMatrix(s: SparkSession, dir: String): DataFrame = {
    val sg = docsSpread(s, dir)
      .select(col("source"),
        explode(array_distinct(shingles(col("text"), 3))).as("gram"))
      .distinct()
    sg.groupBy(col("gram")).agg(collect_set(col("source")).as("srcs"))
      .where(size(col("srcs")) >= 2)
      .select(explode(col("srcs")).as("src_a"), col("srcs"))
      .select(col("src_a"), explode(col("srcs")).as("src_b"))
      .where(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_shared_grams"))
      .orderBy(col("n_shared_grams").desc, col("src_a").asc,
        col("src_b").asc)
      .limit(50)
  }

  /** q130 — balanced per-class subsample: at most 20 documents per
    * language, chosen by md5 rank — the class-rebalancing step before
    * training on a skewed corpus. Determinism is the whole point:
    * rank = row_number over (md5(text), doc_id) within each language,
    * so any engine at any parallelism picks the SAME 20 docs (a
    * `TABLESAMPLE` or `rand()` sample is irreproducible and
    * un-oracle-able). Scale: the window partitions by language, and
    * at 100 TB per-class top-20-by-hash swaps to the bounded-heap
    * top-k-per-group operator (q97's plans.TopKPerGroup — same
    * semantics, winners-only shuffle, no per-class sort). */
  /** q143 — proportional sample allocation via Hamilton's
    * largest-remainder method: exactly K=100 documents allocated
    * across languages proportional to stratum size — floor quotas
    * first, then the K − Σfloor leftover seats go to the largest
    * integer remainders (K·n_l mod N, tie-broken by language) — and
    * each stratum's quota filled by q130's deterministic md5 rank.
    * Every step is INTEGER arithmetic (floor = div, remainder = mod),
    * so the allocation — not just its size — is engine-exact, unlike
    * float-quota rounding which ulp-flips seats between engines. The
    * apportionment runs on the language-sized table; only the final
    * rank-filter touches documents. Σquota = K by construction
    * (spec-checked), the property float rounding can't guarantee. */
  def q143ProportionalAllocation(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val K = 100
    val sizes = docs(s, dir).groupBy(col("lang"))
      .agg(count(lit(1)).as("n_stratum"))
    val tot = sizes.agg(sum(col("n_stratum")).as("n_total"))
    val wRem = Window.orderBy(col("rem").desc, col("lang").asc)
    val quotas = sizes.crossJoin(broadcast(tot))
      .withColumn("base", expr(s"($K * n_stratum) div n_total"))
      .withColumn("rem", (lit(K) * col("n_stratum")) % col("n_total"))
      .withColumn("seat_rank", row_number().over(wRem))
      .withColumn("total_base",
        sum(col("base")).over(Window.partitionBy()))
      .withColumn("quota",
        col("base") + when(col("seat_rank") <= lit(K) - col("total_base"),
          1L).otherwise(0L))
      .select(col("lang"), col("n_stratum"), col("quota"))
    val wPick = Window.partitionBy(col("lang"))
      .orderBy(md5(col("text")).asc, col("doc_id").asc)
    docs(s, dir)
      .withColumn("rk", row_number().over(wPick))
      .join(broadcast(quotas), Seq("lang"))
      .where(col("rk") <= col("quota"))
      .select(col("lang"), col("n_stratum"), col("quota"), col("rk"),
        col("doc_id"))
      .orderBy(col("lang"), col("rk"))
  }

  def q130BalancedSample(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5(col("text")).asc, col("doc_id").asc)
    docs(s, dir)
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 20)
      .select(col("lang"), col("rk"), col("doc_id"),
        substring(md5(col("text")), 1, 12).as("pick_hash"))
      .orderBy(col("lang"), col("rk"))
  }

  val PadBatch = 32

  /** q176 — padding-waste audit for length-bucketed batching: every
    * training batch pads to its longest sequence, so batch composition
    * decides how many GPU-step tokens are padding. The audit compares
    * the two canonical deterministic strategies on the same corpus —
    * `arrival` (doc_id order, the "no bucketing" baseline) vs
    * `length_sorted` ((n_tokens, doc_id) order, the standard
    * length-bucketing trick) — batched [[PadBatch]] at a time:
    * per strategy, total real tokens, padded slots, and the padding
    * share. The length-sorted wasted share collapsing (spec asserts
    * strictly less) IS the case for bucketed batch assembly; q59's
    * packing is the stronger sibling that eliminates padding entirely
    * by filling fixed windows.
    *
    * Engine-exact: lengths, batch assignments (integer division of a
    * rank), batch maxima, and waste sums are all integers; the share
    * is one divide. Both ranks run distributed via
    * [[PrefixSum.rankNtile]] (bucketed prefix-count, bit-identical to
    * ROW_NUMBER) — NOT a single-partition global window: at billions
    * of docs the corpus must never sort through one task
    * (PlanShapeSpec pins no `Exchange SinglePartition`). */
  def q176PaddingAudit(s: SparkSession, dir: String): DataFrame = {
    val lens = docs(s, dir)
      .select(col("doc_id"), nTokens(col("text")).cast("long").as("len"))
    def strategy(name: String, order: Seq[org.apache.spark.sql.Column])
        : DataFrame = {
      PrefixSum.rankNtile(lens, order, k = 1,
          rankCol = Some("_rk"), tileCol = "_tile")
        // integer DIV on the long rank — double division would lose
        // exactness past 2^53 rows
        .withColumn("batch", expr(s"(_rk - 1) DIV $PadBatch"))
        .groupBy(col("batch"))
        .agg(count(lit(1)).as("n_seqs"), sum(col("len")).as("real_tokens"),
          max(col("len")).as("batch_max"))
        .agg(count(lit(1)).as("n_batches"),
          sum(col("real_tokens")).as("total_tokens"),
          sum(col("batch_max") * col("n_seqs") - col("real_tokens"))
            .as("padded_tokens"))
        .select(lit(name).as("strategy"), col("n_batches"),
          col("total_tokens"), col("padded_tokens"),
          round(col("padded_tokens").cast("double") /
            (col("total_tokens") + col("padded_tokens")), 6)
            .as("waste_share"))
    }
    // rankNtile keys are ascending by contract (DESC would be negated)
    strategy("arrival", Seq(col("doc_id")))
      .unionByName(strategy("length_sorted",
        Seq(col("len"), col("doc_id"))))
      .orderBy(col("strategy"))
  }

  val NumShards = 16

  /** q178 — deterministic training-shard assignment + balance audit:
    * the last mile of the pipeline, where the curated corpus becomes N
    * equal-ish shard files a training job streams. Shard =
    * content-stable md5 bucket (re-ingesting the same document always
    * lands the same shard; no RNG, no partition-count dependence);
    * within-shard order is (md5, doc_id) — a deterministic global
    * shuffle that breaks source/time locality so every shard is an
    * iid-ish sample. The audit reports per-shard doc/token/source
    * counts, token share, the (md5, doc_id) order range, and an
    * ORDER-INDEPENDENT content checksum (BIGINT sum of 32-bit md5
    * prefixes — mergeable, so map-side combine applies). Production
    * writes via `repartition(NumShards, shard).sortWithinPartitions
    * (h, doc_id)` into the partitioned sink; the plan here is the
    * audit that gates that write. One shuffle on the shard key,
    * everything post-shuffle is shard-sized. Fully hash-checked. */
  def q178ShardPlan(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(
      col("source"), col("doc_id"),
      nTokens(col("text")).cast("long").as("tokens"),
      md5(col("text")).as("h"))
      .withColumn("shard",
        conv(substring(col("h"), 1, 2), 16, 10).cast("int") % NumShards)
    val perShard = d.groupBy(col("shard")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("tokens")).as("n_tokens"),
      count_distinct(col("source")).as("n_sources"),
      min(concat_ws("/", col("h"), col("doc_id"))).as("order_min"),
      max(concat_ws("/", col("h"), col("doc_id"))).as("order_max"),
      sum(conv(substring(col("h"), 1, 8), 16, 10).cast("long"))
        .as("content_checksum"))
    val total = perShard.agg(sum(col("n_tokens")).as("total_tokens"))
    perShard.crossJoin(broadcast(total))
      .select(col("shard"), col("n_docs"), col("n_tokens"),
        col("n_sources"),
        round(col("n_tokens").cast("double") /
          col("total_tokens").cast("double"), 6).as("token_share"),
        col("order_min"), col("order_max"), col("content_checksum"))
      .orderBy(col("shard"))
  }
}
