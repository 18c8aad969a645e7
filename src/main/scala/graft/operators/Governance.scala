package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions

/** Corpus-governance operators: the accounting a training-data pipeline
  * runs BEFORE committing a mixture — inter-document duplicated-passage
  * coverage, temperature-based token-budget allocation, per-source
  * dedup health, and leakage-safe splitting. (Absent in the reference,
  * whose governance was "the crawler ran"; first-class here because at
  * 100 TB the mixture decisions are what the whole pipeline exists to
  * inform.)
  */
object Governance {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  private def toks(c: Column): Column = split(trim(c), "\\s+")

  val PassageGram = 5

  /** q158 — cross-document duplicated-passage coverage (the
    * RefinedWeb/Dolma-style report that motivates span-level dedup
    * where document-level MinHash keeps both copies): per document,
    * the fraction of its distinct word 5-grams that also occur in at
    * least one OTHER document. Shape: docs explode to distinct
    * (doc, gram-md5) pairs map-side; one gram-keyed WINDOW counts the
    * docs sharing each gram (the pairs are per-doc distinct, so the
    * partition row count is exactly count_distinct(doc); gram keys
    * are 32-byte md5, never raw text); the per-doc rollup is
    * doc-sized. Two corpus-scale shuffles on hashed keys — the honest
    * minimum for inter-document evidence; both are AQE-skew-safe
    * because md5 keys are uniform by construction. */
  def q158DupPassageCoverage(s: SparkSession, dir: String): DataFrame = {
    val n = PassageGram
    val grams = docs(s, dir)
      .select(col("doc_id"), toks(col("text")).as("toks"))
      .where(size(col("toks")) >= n)
      .select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(0), size(col("toks")) - n),
          i => md5(concat_ws(" ",
            slice(col("toks"), i + 1, lit(n))))))).as("gh"))
    // ONE pass over the grams: (doc, gram) pairs are distinct per doc
    // (array_distinct above), so a plain row count over the gram
    // partition IS count_distinct(doc) — the previous groupBy + join
    // back computed the gram explosion (tokenize + md5 per gram, the
    // dominant per-task cost) TWICE and paid a third exchange for the
    // join. Identical rows; one exchange on gh instead of two plus a
    // join.
    grams
      .withColumn("nd", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("gh"))))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_shared_grams"))
      .withColumn("dup_coverage",
        round(col("n_shared_grams").cast("double") /
          col("n_grams").cast("double"), 6))
      .orderBy(col("doc_id"))
  }

  val MixTemperature = 2 // p_s ∝ tokens_s^(1/τ), the standard τ=2 mix
  val MaxEpochs = 4

  /** q159 — token-budget mix planner: allocate a training budget of
    * half the corpus's tokens across sources by temperature sampling
    * (weight ∝ √tokens, τ=2 — the standard flattening that keeps small
    * sources from vanishing), capped at [[MaxEpochs]] epochs per
    * source (upsampling cap; freed budget is NOT redistributed — the
    * single-pass allocation, documented). Engine-exactness: √tokens
    * FLOORS to integer micro-units so the 20-source weight sum is an
    * exact BIGINT (a float Σ√ would be order-dependent); every
    * allocation is then integer arithmetic (budget·w_s)/(Σw), with
    * epochs the only division left in IEEE. Works on source-sized
    * aggregates — the fact pass is one token-count rollup. At true
    * scale budget·w_s moves to DECIMAL(38,0); the floor/ratio shape is
    * unchanged. */
  /** Shared allocation chain for q159/q179: per-source token rollup,
    * τ=2 temperature weights in integer micro-units, budget-
    * proportional allocation with the epoch cap. Source-sized after
    * the one corpus rollup. */
  private def mixAlloc(s: SparkSession, dir: String): DataFrame = {
    val per = docs(s, dir)
      .groupBy(col("source"))
      .agg(sum(TextFunctions.nTokens(col("text")).cast("long"))
        .as("tokens"),
        count(lit(1)).as("n_docs"))
    val withW = per.withColumn("w",
      floor(sqrt(col("tokens").cast("double")) * lit(1e6)).cast("long"))
    val totals = withW.agg(
      sum(col("tokens")).as("total_tokens"),
      sum(col("w")).as("total_w"))
    withW.crossJoin(broadcast(totals))
      .withColumn("budget", expr("total_tokens DIV 2"))
      .withColumn("alloc_raw", expr("(budget * w) DIV total_w"))
      .withColumn("alloc_capped",
        least(col("alloc_raw"), col("tokens") * MaxEpochs))
  }

  def q159MixPlanner(s: SparkSession, dir: String): DataFrame = {
    mixAlloc(s, dir)
      .select(
        col("source"), col("tokens"), col("n_docs"),
        round(col("w").cast("double") / col("total_w").cast("double"), 6)
          .as("weight_share"),
        col("alloc_capped").as("alloc_tokens"),
        round(col("alloc_capped").cast("double") /
          col("tokens").cast("double"), 4).as("epochs"),
        (col("alloc_raw") > col("tokens") * MaxEpochs).as("capped"))
      .orderBy(col("source"))
  }

  /** q179 — epoch repetition schedule: operationalizes q159's
    * token-budget mix at document granularity. Each source's
    * allocation splits into `full_epochs` whole passes plus a
    * fractional epoch realized as a DETERMINISTIC per-document draw:
    * include a doc in the partial pass iff its salted-md5 value mod
    * 10⁶ clears the source's `frac_ppm` threshold — content-stable
    * (the same doc is drawn in every rerun; no RNG state to
    * coordinate across 1000 executors), and exact cross-engine. The
    * `(rem·10⁶) DIV tokens` ppm stays in BIGINT; at >9×10¹² tokens
    * per source, promote to DECIMAL(38,0) — same formula. Plan: one
    * corpus rollup for the allocation (source-sized after), one
    * map-only salted-hash filter joined against the broadcast
    * source-level thresholds, one source-keyed count — no corpus
    * shuffle at all. Fully hash-checked. */
  def q179EpochSchedule(s: SparkSession, dir: String): DataFrame = {
    val sched = mixAlloc(s, dir)
      .withColumn("full_epochs", expr("alloc_capped DIV tokens"))
      .withColumn("rem", expr("alloc_capped % tokens"))
      .withColumn("frac_ppm", expr("(rem * 1000000) DIV tokens"))
    val picks = docs(s, dir)
      .select(col("source"),
        TextFunctions.nTokens(col("text")).cast("long").as("dtok"),
        (conv(substring(md5(concat(col("text"), lit("|q179"))), 1, 8),
          16, 10).cast("long") % 1000000).as("u"))
      .join(broadcast(sched.select(col("source"), col("frac_ppm"))),
        Seq("source"))
      .where(col("u") < col("frac_ppm"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs_sampled"),
        sum(col("dtok")).as("sampled_tokens"))
    sched.join(picks, Seq("source"), "left")
      .na.fill(0L, Seq("n_docs_sampled", "sampled_tokens"))
      .select(col("source"), col("tokens"),
        col("alloc_capped").as("alloc_tokens"),
        col("full_epochs"), col("frac_ppm"),
        col("n_docs_sampled"), col("sampled_tokens"),
        (col("full_epochs") * col("tokens") + col("sampled_tokens"))
          .as("scheduled_tokens"))
      .orderBy(col("source"))
  }

  /** q160 — per-source dedup health: document counts, distinct
    * fingerprints, within-source duplicate rate, and how many of the
    * source's documents share their fingerprint with ANOTHER source
    * (cross-source contamination — the signal that two crawls overlap
    * and dedup must run globally, not per-source). One doc-sized
    * fingerprint projection, one fingerprint-keyed aggregate, one join
    * back; everything after the first shuffle is source- or
    * fingerprint-sized. */
  def q160SourceDedupHealth(s: SparkSession, dir: String): DataFrame = {
    val fp = docs(s, dir).select(col("source"), col("doc_id"),
      TextFunctions.fingerprint(col("text")).as("fp"))
    val spread = fp.groupBy(col("fp"))
      .agg(count_distinct(col("source")).as("n_sources"))
    fp.join(spread, Seq("fp"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        count_distinct(col("fp")).as("n_fingerprints"),
        sum(when(col("n_sources") >= 2, 1L).otherwise(0L))
          .as("n_cross_source_docs"))
      .withColumn("dup_rate",
        round(lit(1.0) - col("n_fingerprints").cast("double") /
          col("n_docs").cast("double"), 6))
      .select(col("source"), col("n_docs"), col("n_fingerprints"),
        col("dup_rate"), col("n_cross_source_docs"))
      .orderBy(col("source"))
  }

  val ValPermille = 100 // ~10% validation

  /** q161 — leakage-safe train/val split: the split decision is made
    * once per FINGERPRINT GROUP (hash of the group's min doc_id), and
    * every copy of a duplicated document follows its group — so no
    * near-identical text can sit on both sides of the split (the q115
    * leakage matrix measures the failure this construction makes
    * impossible for exact dups). The audit column `violations` counts
    * fingerprints with feet in both splits and must be 0 BY
    * CONSTRUCTION, not by luck — it's computed, not asserted, so the
    * report carries its own proof. Doc-sized work; the split hash is
    * md5-derived and engine-portable. */
  def q161LeakageSafeSplit(s: SparkSession, dir: String): DataFrame = {
    val fp = docs(s, dir).select(col("doc_id"),
      TextFunctions.fingerprint(col("text")).as("fp"))
    val groups = fp.groupBy(col("fp")).agg(min(col("doc_id")).as("rep"))
      .withColumn("split",
        when(conv(substring(md5(concat(lit("split_"),
          col("rep").cast("string"))), 1, 7), 16, 10).cast("long") %
          1000 < ValPermille, "val").otherwise("train"))
    val tagged = fp.join(groups, Seq("fp"))
    val viol = tagged.groupBy(col("fp"))
      .agg(count_distinct(col("split")).as("ns"))
      .agg(sum(when(col("ns") > 1, 1L).otherwise(0L)).as("violations"))
    tagged.groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        count_distinct(col("fp")).as("n_fingerprints"))
      .crossJoin(broadcast(viol))
      .select(col("split"), col("n_docs"), col("n_fingerprints"),
        col("violations"))
      .orderBy(col("split"))
  }

  /** q173 — k-anonymity / l-diversity privacy audit over the customer
    * dimension: the release gate a dataset passes BEFORE its rows feed
    * training. Quasi-identifiers (nation, market segment, account-
    * balance band — the attributes an attacker links from outside)
    * partition the table into equivalence classes; a row in a class of
    * size k is re-identifiable with probability 1/k, and a class whose
    * SENSITIVE attribute (balance sign — "delinquent or not") is
    * homogeneous discloses it even without re-identification
    * (l-diversity = 1). The report is the k-histogram: for every class
    * size, how many classes, rows, the row share, and how many of
    * those classes are sensitive-homogeneous — what a release policy
    * thresholds on ("suppress or generalize all classes with k < 5").
    *
    * Scale shape: ONE QI-keyed aggregate over the table (map-side
    * partial; the class table is QI-cardinality-sized), then a
    * class-sized k-rollup — the same two-level law as q65/q160.
    * Engine-exact: k and the class counts are integers, the balance
    * band is floor of one divide on bit-identical doubles, and the
    * row share is one divide of exact BIGINTs. */
  def q173KAnonymity(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(s, dir, "customer")
    val classes = cust
      .select(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / lit(1000.0)).cast("int").as("bal_band"),
        when(col("c_acctbal") < 0, lit("neg")).otherwise(lit("pos"))
          .as("sensitive"))
      .groupBy(col("c_nationkey"), col("c_mktsegment"), col("bal_band"))
      .agg(count(lit(1)).as("k"),
        count_distinct(col("sensitive")).as("l_div"))
    val total = cust.agg(count(lit(1)).as("n_total"))
    classes.groupBy(col("k"))
      .agg(count(lit(1)).as("n_classes"),
        sum(col("k")).as("n_rows"),
        sum(when(col("l_div") === 1, 1L).otherwise(0L))
          .as("n_homogeneous"))
      .crossJoin(broadcast(total))
      .select(col("k"), col("n_classes"), col("n_rows"),
        round(col("n_rows").cast("double") / col("n_total"), 6)
          .as("row_share"),
        col("n_homogeneous"))
      .orderBy(col("k"))
  }

  /** q174 — right-to-be-forgotten deletion-propagation audit: given a
    * deterministic delete list of customers (md5-prefix < "05" ≈ 2% —
    * the same engine-portable rule as q80's splits, standing in for
    * the legal request queue), measure the BLAST RADIUS a forget run
    * must erase and PROVE the erase leaves no residue:
    *   - per table, rows that reference a deleted customer (orders
    *     directly; lineitem transitively through its order) and the
    *     distinct deleted keys actually present;
    *   - `residual_rows`: the same count over the anti-join-cleaned
    *     table — computed, not assumed, and must read 0 (q161's
    *     "violations" discipline).
    *
    * Scale shape: the delete list is a customer-keyed aggregate
    * (broadcast-sized at a 2% rate of a dimension; at 100 TB you'd
    * bloom-prefilter the fact probe exactly as q120). The transitive
    * hop collapses orders to its AFFECTED key set before touching
    * lineitem, so the big fact joins a delete-sized key list twice
    * (semi for the count, anti for the residue) and never shuffles
    * itself. Pure integer counting — trivially engine-exact; what the
    * audit buys is the PLAN, not the arithmetic. */
  def q174DeletionAudit(s: SparkSession, dir: String): DataFrame = {
    val delList = Tables.load(s, dir, "customer")
      .where(substring(md5(concat(lit("forget_"),
        col("c_custkey").cast("string"))), 1, 2) < "05")
      .select(col("c_custkey").as("del_key"))
    val orders = Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val affOrders = orders
      .join(broadcast(delList), col("o_custkey") === col("del_key"))
    val affOrderKeys = affOrders.select(col("o_orderkey")).distinct()
    val li = Tables.load(s, dir, "lineitem").select(col("l_orderkey"))

    val custStats = delList.agg(
      count(lit(1)).as("n_rows"),
      count(lit(1)).as("n_deleted_keys"))
      .select(lit("customer").as("table"), col("n_rows"),
        col("n_deleted_keys"))
    val orderStats = affOrders.agg(
      count(lit(1)).as("n_rows"),
      count_distinct(col("del_key")).as("n_deleted_keys"))
      .select(lit("orders").as("table"), col("n_rows"),
        col("n_deleted_keys"))
    val liStats = li
      .join(broadcast(affOrderKeys), col("l_orderkey") === col("o_orderkey"),
        "left_semi")
      .agg(count(lit(1)).as("n_rows"))
      .crossJoin(broadcast(affOrders.agg(
        count_distinct(col("del_key")).as("n_deleted_keys"))))
      .select(lit("lineitem").as("table"), col("n_rows"),
        col("n_deleted_keys"))

    // residue: re-count against the anti-join-CLEANED tables; the erase
    // is only proven by the cleaned side reading zero
    val cleanOrders = orders.join(broadcast(delList),
      col("o_custkey") === col("del_key"), "left_anti")
    val residOrders = cleanOrders
      .join(broadcast(delList), col("o_custkey") === col("del_key"),
        "left_semi")
      .agg(count(lit(1)).as("residual_rows"))
    val residLi = li
      .join(broadcast(affOrderKeys), col("l_orderkey") === col("o_orderkey"),
        "left_anti")
      .join(broadcast(affOrderKeys), col("l_orderkey") === col("o_orderkey"),
        "left_semi")
      .agg(count(lit(1)).as("residual_rows"))
    val resid = residOrders.crossJoin(broadcast(residLi.select(
        col("residual_rows").as("r2"))))
      .select((col("residual_rows") + col("r2")).as("residual_rows"))

    custStats.unionByName(orderStats).unionByName(liStats)
      .crossJoin(broadcast(resid))
      .select(col("table"), col("n_rows"), col("n_deleted_keys"),
        col("residual_rows"))
      .orderBy(col("table"))
  }
}
