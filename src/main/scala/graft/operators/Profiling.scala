package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Data-profiling / distribution-analysis surface — the "look before
  * you train" operators a 100 TB pipeline runs on every new corpus
  * drop: per-column statistics, value histograms, and rank/percentile
  * placement. All single-pass over the table being profiled.
  */
object Profiling {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** q68 — per-column profile of `orders` (row count, null count,
    * distinct count, min/max rendered as strings so one schema covers
    * every column type). One pass: Spark plans the multi-column
    * distinct aggregate as a single Expand (×6) + two-phase
    * HashAggregate — the expanded rows collapse map-side, so the
    * shuffle carries only per-column partial states, not data. At
    * 100 TB swap `countDistinct` for `approx_count_distinct`: the
    * Expand stays, the per-column exact-distinct state (the only
    * unbounded piece) becomes a fixed-size HLL sketch. */
  def q68ColumnProfile(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"cnt_$c"),
        countDistinct(col(c)).as(s"dist_$c"),
        min(col(c)).cast("string").as(s"min_$c"),
        max(col(c)).cast("string").as(s"max_$c"))
    }
    val one = ord.agg(count(lit(1)).as("n_rows"), aggs: _*)
    one
      .select(explode(array(cols.map(c => struct(
        lit(c).as("column_name"),
        col("n_rows"),
        (col("n_rows") - col(s"cnt_$c")).as("n_nulls"),
        col(s"dist_$c").as("n_distinct"),
        col(s"min_$c").as("min_value"),
        col(s"max_$c").as("max_value"))): _*)).as("p"))
      .select(col("p.*"))
  }

  val HistBucketWidth = 25000.0

  /** q74 — fixed-width histogram of order totals: bucket index, bounds,
    * count, and exact-decimal revenue share per bucket. Bucketing is a
    * map-only floor-division (codegen'd, no UDF) followed by one small
    * aggregate — the shape that profiles a 100 TB column in a single
    * scan. floor() is explicit because Spark's double→int cast
    * truncates while other engines round. */
  def q74Histogram(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
    val total = ord.agg(
      sum(col("o_totalprice").cast("decimal(18,4)")).cast("double")
        .as("grand_total"))
    ord
      .withColumn("bucket",
        floor(col("o_totalprice") / HistBucketWidth).cast("long"))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,4)")).as("dec_rev"))
      .crossJoin(broadcast(total))
      .select(
        col("bucket"),
        (col("bucket") * HistBucketWidth).as("lo"),
        ((col("bucket") + 1) * HistBucketWidth).as("hi"),
        col("n_orders"),
        round(col("dec_rev").cast("double"), 2).as("revenue"),
        round(col("dec_rev").cast("double") / col("grand_total"), 6)
          .as("revenue_share"))
  }

  /** q75 — rank/percentile placement of every customer within its
    * market segment: percent_rank, cume_dist, and a decile via NTILE.
    * The analytic-window trio is one per-segment sort; ordering
    * includes the key (c_custkey) so NTILE's tie-splitting is a
    * deterministic total order — without it two engines (or two runs)
    * may assign tied balances to different deciles. */
  def q75SegmentPercentiles(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    t(s, dir, "customer")
      .select(
        col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"),
        ntile(10).over(w).as("decile"))
  }

  val HeavyHitterTopK = 20

  /** q77 — heavy-hitter skew report for a join/aggregation key: the
    * top keys by row count with individual and cumulative share of the
    * table. This is the diagnostic run before choosing a skew
    * mitigation (AQE skew join vs operators.Skew salting) — a key
    * holding >1/shuffle-partitions of the rows will serialize that
    * partition. One aggregate + a top-k window over the (small) key
    * count table; shares are single IEEE divisions of exact counts. */
  def q77HeavyHitters(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val counts = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_rows"))
    val total = counts.agg(sum(col("n_rows")).as("n_total"))
    // Top-k via orderBy().limit() → TakeOrderedAndProject: per-partition
    // heaps + a k-sized driver merge, never a single-partition sort of
    // the full key-count table. The rank/cum-share windows then run
    // over the k-row result only — bounded by k, not by key cardinality.
    val top = counts
      .orderBy(col("n_rows").desc, col("user_id").asc)
      .limit(HeavyHitterTopK)
    val w = Window.orderBy(col("n_rows").desc, col("user_id").asc)
    top
      .withColumn("rank", row_number().over(w))
      .crossJoin(broadcast(total))
      .withColumn("share",
        round(col("n_rows").cast("double") / col("n_total"), 6))
      .withColumn("cum_share",
        round(sum(col("n_rows"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double") / col("n_total"), 6))
      .select(col("rank"), col("user_id"), col("n_rows"),
        col("share"), col("cum_share"))
  }

  /** q96 — declarative data-quality audit over `orders`
    * (etl.QualityChecks): five row/uniqueness constraints compile into
    * ONE aggregate pass (the mixed distinct/non-distinct aggregate is
    * a single Expand — one scan however many checks), plus a
    * broadcast anti-join referential-integrity count against
    * `customer`, all unioned into one tall pass/fail report. The
    * reference pipeline has no quality gate; at 100 TB one-scan-per-
    * constraint vs one-scan-total is the whole ballgame. */
  def q96QualityReport(s: SparkSession, dir: String): DataFrame = {
    import graft.etl.QualityChecks._
    val ord = t(s, dir, "orders")
    // c_custkey is unique and customer broadcasts, so the FK gate folds
    // into the single-pass side as a row check on the joined row (the
    // QualityChecks.ForeignKeyCheck variant is for dims that can't).
    val cust = t(s, dir, "customer").select(col("c_custkey"))
    val audited = ord.join(broadcast(cust),
      ord("o_custkey") === cust("c_custkey"), "left")
    report(
      audited,
      rowChecks = Seq(
        RowCheck("not_null_custkey", col("o_custkey").isNull),
        RowCheck("positive_totalprice", !(col("o_totalprice") > 0)),
        RowCheck("valid_priority", !col("o_orderpriority").isin(
          "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")),
        RowCheck("date_in_range", !col("o_orderdate").between(
          "1990-01-01", "2005-12-31")),
        RowCheck("fk_customer",
          col("o_custkey").isNotNull && col("c_custkey").isNull)),
      uniqueChecks = Seq(UniqueCheck("unique_orderkey",
        Seq(col("o_orderkey")))))
  }

  /** q114 — corpus mixture diagnostics: per-source language
    * distribution with Gini impurity (1 − Σ p²) — the "how pure is
    * each source's language mix" check run before choosing sampling
    * weights. Gini instead of entropy BECAUSE of engine-exactness:
    * ln() is not correctly rounded in either engine, while each share
    * p = n/N is one exact-integer division, p² one multiply, and the
    * language-count-sized Σ flows through DECIMAL so addition order
    * can't move a bit. The dominant language is an arg-min over the
    * zero-padded (N−n, lang) string — count-descending with a
    * deterministic lexicographic tiebreak, identical in both engines.
    * Shape: one (source, lang) aggregate, then a source-sized rollup
    * — nothing after the first shuffle is corpus-sized. */
  def q114MixtureDiagnostics(s: SparkSession, dir: String): DataFrame = {
    val counts = t(s, dir, "documents")
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("source"))
      .agg(sum(col("n")).as("n_docs"), count(lit(1)).as("n_langs"),
        max(col("n")).as("top_n"))
    counts.join(broadcast(totals), Seq("source"))
      .withColumn("p", col("n").cast("double") / col("n_docs"))
      .groupBy(col("source"))
      .agg(
        first(col("n_docs")).as("n_docs"),
        first(col("n_langs")).as("n_langs"),
        min_by(col("lang"),
          concat(lpad((col("n_docs") - col("n")).cast("string"), 12, "0"),
            col("lang"))).as("top_lang"),
        round(first(col("top_n")).cast("double") /
          first(col("n_docs")), 6).as("top_share"),
        round(lit(1.0) -
          sum((col("p") * col("p")).cast("decimal(28,20)"))
            .cast("double"), 6).as("gini"))
      .orderBy(col("source").asc)
  }

  /** q137 — ingestion quarantine audit: classify every record of a
    * dirty JSON feed as ok / invalid_json / missing_key /
    * non_numeric_value, with per-class counts, an id-sum membership
    * fingerprint, and the good-row value total — the
    * reject-with-reason pattern every bronze ingest needs (fail the
    * batch on NOTHING, quarantine rows with a reason code, let the
    * clean majority proceed). The dirty feed derives
    * deterministically from events.props (truncate on id%11, retype
    * k to a string on id%13, drop the key on id%17) so both engines
    * classify identical bytes and every reason code is exercised; parsing is try-semantics all the way down (`from_json`
    * null on malformed ↔ DuckDB json_valid; `try_cast` null on
    * non-numeric ↔ TRY_CAST) — no exception ever aborts the scan,
    * which at 100 TB is the difference between a quarantine table
    * and a 3 a.m. page. Map-only until the status-sized rollup. */
  def q137QuarantineAudit(s: SparkSession, dir: String): DataFrame = {
    val dirty = t(s, dir, "events").select(col("event_id"),
      when(col("event_id") % 11 === 0, substring(col("props"), 1, 3))
        .when(col("event_id") % 13 === 0, lit("""{"k": "oops"}"""))
        .when(col("event_id") % 17 === 0, lit("""{"x": 1}"""))
        .otherwise(col("props")).as("props"))
    val parsed = dirty
      .withColumn("m", from_json(col("props"),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType)))
      .withColumn("kraw", element_at(col("m"), "k"))
      .withColumn("kval", expr("try_cast(kraw AS BIGINT)"))
      .withColumn("status",
        when(col("m").isNull, "invalid_json")
          .when(col("kraw").isNull, "missing_key")
          .when(col("kval").isNull, "non_numeric_value")
          .otherwise("ok"))
    parsed.groupBy(col("status"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("event_id")).as("id_sum"),
        coalesce(sum(col("kval")), lit(0L)).as("k_total"))
      .orderBy(col("status"))
  }

  /** q148 — referential-integrity audit over every FK edge in the
    * schema: per edge, the child row count, rows whose key has no
    * parent, and the distinct orphan keys. Shape per edge: the child
    * collapses to (key, count) FIRST — a partial-agg shuffle that is
    * key-sized, never fact-sized — then left-joins the parent's
    * distinct key set (broadcast for dimension parents; the one
    * fact-sized parent, orders←lineitem, is a key-on-key shuffle join
    * of two pre-aggregated sides). Eight key-sized audits union into
    * an 8-row report. Everything is exact integer counting. */
  def q148FkIntegrity(s: SparkSession, dir: String): DataFrame = {
    def audit(edge: String, child: DataFrame, key: String,
        parent: DataFrame, pkey: String): DataFrame = {
      val ck = child.groupBy(col(key).cast("bigint").as("k"))
        .agg(count(lit(1)).as("n"))
      val pk = parent.select(col(pkey).cast("bigint").as("k"))
        .distinct().withColumn("__hit", lit(1))
      ck.join(pk, Seq("k"), "left")
        .agg(sum(col("n")).as("n_child"),
          sum(when(col("__hit").isNull, col("n")).otherwise(lit(0L)))
            .as("n_orphan_rows"),
          sum(when(col("__hit").isNull, 1L).otherwise(0L))
            .as("n_orphan_keys"))
        .select(lit(edge).as("fk"), col("n_child"),
          col("n_orphan_rows"), col("n_orphan_keys"))
    }
    val li = t(s, dir, "lineitem"); val ord = t(s, dir, "orders")
    val cust = t(s, dir, "customer"); val supp = t(s, dir, "supplier")
    val part = t(s, dir, "part"); val nat = t(s, dir, "nation")
    val reg = t(s, dir, "region"); val ev = t(s, dir, "events")
    Seq(
      audit("customer.c_nationkey->nation", cust, "c_nationkey",
        nat, "n_nationkey"),
      audit("events.user_id->customer", ev, "user_id",
        cust, "c_custkey"),
      audit("lineitem.l_orderkey->orders", li, "l_orderkey",
        ord, "o_orderkey"),
      audit("lineitem.l_partkey->part", li, "l_partkey",
        part, "p_partkey"),
      audit("lineitem.l_suppkey->supplier", li, "l_suppkey",
        supp, "s_suppkey"),
      audit("nation.n_regionkey->region", nat, "n_regionkey",
        reg, "r_regionkey"),
      audit("orders.o_custkey->customer", ord, "o_custkey",
        cust, "c_custkey"),
      audit("supplier.s_nationkey->nation", supp, "s_nationkey",
        nat, "n_nationkey"),
    ).reduce(_.unionAll(_)).orderBy(col("fk"))
  }

  /** q180 — mergeable log-histogram quantile sketch over per-document
    * token lengths, the deterministic stand-in for KLL/t-digest in the
    * sketch family (q47 = distinct, q121 = heavy hitters, q180 =
    * quantiles): bucket b holds lengths in [2^b − 1, 2^(b+1) − 2], so a
    * value's bucket is `len(bin(len+1)) − 1` — pure integer/string ops,
    * no floating log whose ulp could flip a boundary. Bucket counts are
    * a plain two-phase aggregate, which IS the sketch's merge operator:
    * map-side partials combine associatively, shards/epochs/streams
    * merge by adding counts, and the state per source is ≤ 40 ints no
    * matter how many documents feed it. The p50/p90/p99 estimates are
    * each bucket upper bounds — within 2× of the true quantile by
    * construction (bucket width), which is the audit-grade answer a
    * 100 TB length scan can afford. Exact max_len rides along free.
    * Everything integer → fully hash-checked. */
  /** The sketch STATE: per-(source, bucket) counts + exact bucket max.
    * This is what merges — shards, epochs, and micro-batches combine by
    * `groupBy(source, bucket).agg(sum(cnt), max(bmax))` (see
    * `EventStream.streamingQuantileSketch` for the streaming fold). */
  def lengthBucketCounts(docs: DataFrame): DataFrame = {
    import graft.functions.TextFunctions
    docs.select(col("source"),
      TextFunctions.nTokens(col("text")).cast("long").as("len"))
      .withColumn("bucket", (length(bin(col("len") + 1)) - 1).cast("int"))
      .groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("cnt"), max(col("len")).as("bmax"))
  }

  /** The sketch FINISHER: quantile upper bounds from the bucket counts.
    * Runs on sketch-sized state (≤40 rows per source), so batch and
    * streaming read-side share it verbatim. */
  def quantilesFromCounts(counts: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("bucket"))
    val cum = counts
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("source"))))
      .withColumn("ub", expr("CAST(power(2, bucket + 1) AS BIGINT) - 2"))
    def est(p: Int) =
      min(when(col("cum") * 100 >= col("n") * p, col("ub")))
        .as(s"p${p}_ub")
    cum.groupBy(col("source")).agg(
      sum(col("cnt")).as("n_docs"),
      count(lit(1)).as("n_buckets"),
      max(col("bmax")).as("max_len"),
      est(50), est(90), est(99))
      .orderBy(col("source"))
  }

  def q180QuantileSketch(s: SparkSession, dir: String): DataFrame =
    quantilesFromCounts(lengthBucketCounts(t(s, dir, "documents")))
}
