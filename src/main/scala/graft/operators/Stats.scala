package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Statistical / behavioral analytics pack (round 3): point-in-time
  * feature lookup, Markov transitions, distribution diagnostics
  * (z-score anomalies, chi-square independence), market-basket pair
  * mining, and sliding-window distinct counts.
  *
  * Everything here follows the engine-exact arithmetic discipline the
  * rest of the suite uses: counts stay integral, money flows through
  * DECIMAL sums, and every derived double is produced by the same
  * correctly-rounded IEEE expression tree the DuckDB oracle evaluates,
  * so results hash-match bit-for-bit across engines.
  */
object Stats {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private def moneySum(c: Column): Column =
    round(sum(c.cast("decimal(18,4)")).cast("double"), 2)

  /** q90 — point-in-time-correct feature lookup against SCD2 history:
    * the user's state intervals (q64's build, restricted to
    * non-purchase events) are probed by each purchase event, attaching
    * the state that was valid AT purchase time — the
    * leakage-free dimension lookup every training pipeline needs
    * (joining current state would leak the future). Reuses
    * AsofJoin.backward, so the plan is ONE co-partitioned shuffle of
    * probes+changes and a single per-user window pass — no interval
    * blow-up, no per-key probing. */
  def q90PointInTime(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val ord = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    // SCD2 change rows: one row per state CHANGE (q64 semantics).
    val changes = ev.where(col("event_type") =!= "purchase")
      .withColumn("prev_type", lag(col("event_type"), 1).over(ord))
      .where(col("prev_type").isNull ||
        col("prev_type") =!= col("event_type"))
      .select(col("user_id"), col("ts"),
        col("event_id").as("chg_event_id"),
        col("event_type").as("state"),
        col("ts").as("state_since_ts"))
    val probes = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    AsofJoin.backward(probes, changes, "user_id", "ts",
        Seq("chg_event_id", "state", "state_since_ts"))
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
        col("value"), col("state"),
        date_format(col("state_since_ts"), "yyyy-MM-dd HH:mm:ss")
          .as("state_since"),
        (unix_timestamp(col("ts")) - unix_timestamp(col("state_since_ts")))
          .as("secs_in_state"))
  }

  /** q91 — first-order Markov transition matrix over the event stream:
    * P(next event type | current) per user-ordered adjacency. One
    * per-user window pass produces the adjacent pairs map-side; the
    * transition aggregate is |types|² rows, so the normalizing window
    * is vocabulary-sized however large the stream is. Probabilities
    * are one exact long/long division, engine-portable. */
  def q91MarkovTransitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val trans = t(s, dir, "events")
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .where(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val byFrom = Window.partitionBy(col("from_type"))
    trans.withColumn("p",
      round(col("n").cast("double") / sum(col("n")).over(byFrom), 6))
  }

  /** q92 — z-score anomaly detection on monthly revenue per region:
    * which months deviate >2σ from their region's mean. Moments come
    * from exact DECIMAL sums (Σx, Σx² of the 2-dp revenue — the square
    * of a 4-dp decimal is exact at 8 dp), so shuffle order can't move a
    * bit; mean/variance/z are then the same correctly-rounded IEEE
    * expression tree in both engines. The stats side is region-sized —
    * it broadcasts back onto the monthly series no matter the fact
    * volume. Population variance (÷n) keeps the formula
    * division-order-free. */
  def q92ZscoreAnomaly(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
    val cust = t(s, dir, "customer")
    val nat = t(s, dir, "nation")
    val monthly = ord
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === nat("n_nationkey"))
      .groupBy(col("n_regionkey").as("region"),
        date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(moneySum(col("o_totalprice")).as("revenue"))
    val rd = col("revenue").cast("decimal(18,4)")
    val stats = monthly.groupBy(col("region")).agg(
      count(lit(1)).as("n_months"),
      sum(rd).as("s1"),
      sum(rd * rd).as("s2"))
    monthly.join(broadcast(stats), Seq("region"))
      .withColumn("mean", col("s1").cast("double") / col("n_months"))
      .withColumn("variance",
        col("s2").cast("double") / col("n_months") -
          col("mean") * col("mean"))
      .withColumn("z", when(col("variance") > 0,
        round((col("revenue") - col("mean")) / sqrt(col("variance")), 4)))
      .select(col("region"), col("month"), col("revenue"),
        round(col("mean"), 2).as("mean_revenue"), col("z"),
        (abs(col("z")) > lit(2.0)).as("is_anomaly"))
  }

  /** q93 — chi-square contingency table for region × order priority:
    * observed counts, independence-expected counts, and per-cell χ²
    * contributions. The cell grid is |regions|×|priorities| rows, so
    * the three marginal windows run over a tiny aggregate — the only
    * fact-sized work is the first count. Expected counts are exact
    * BIGINT products divided once (both factors < 2⁵³ at any
    * realistic cardinality), contributions the same IEEE tree in both
    * engines. */
  def q93Chi2Contingency(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
    val cust = t(s, dir, "customer")
    val nat = t(s, dir, "nation")
    val reg = t(s, dir, "region")
    val cells = ord
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === nat("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === reg("r_regionkey"))
      .groupBy(col("r_name"), col("o_orderpriority"))
      .agg(count(lit(1)).as("observed"))
    val byRow = Window.partitionBy(col("r_name"))
    val byCol = Window.partitionBy(col("o_orderpriority"))
    val all = Window.partitionBy()
    cells
      .withColumn("row_total", sum(col("observed")).over(byRow))
      .withColumn("col_total", sum(col("observed")).over(byCol))
      .withColumn("grand", sum(col("observed")).over(all))
      .withColumn("expected",
        (col("row_total") * col("col_total")).cast("double") / col("grand"))
      .withColumn("chi2_contrib", round(
        (col("observed") - col("expected")) *
          (col("observed") - col("expected")) / col("expected"), 6))
      .select(col("r_name"), col("o_orderpriority"), col("observed"),
        round(col("expected"), 4).as("expected"), col("chi2_contrib"))
  }

  /** q94 — market-basket co-purchase pairs: the 50 part pairs most
    * often bought in the same order. NOT a self-join: items collapse
    * to one array per order (one shuffle), pairs expand MAP-SIDE from
    * the array (orders have bounded line counts, so the expansion is
    * O(k²) per row with small k), and the pair aggregate is the only
    * other shuffle. The final top-50 is TakeOrderedAndProject with a
    * full (count, p1, p2) tiebreak — deterministic, no global sort. */
  def q94CopurchasePairs(s: SparkSession, dir: String): DataFrame = {
    val items = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .groupBy(col("l_orderkey"))
      .agg(collect_set(col("l_partkey")).as("parts"))
    items
      .select(explode(col("parts")).as("p1"), col("parts"))
      .select(col("p1"), explode(col("parts")).as("p2"))
      .where(col("p1") < col("p2"))
      .groupBy(col("p1"), col("p2"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_orders").desc, col("p1").asc, col("p2").asc)
      .limit(50)
  }

  /** q98 — winsorized robust statistics per market segment: clip
    * account balances at the exact interpolated [p05, p95] (the same
    * percentile the q46 family proved engine-identical), then report
    * clip counts and the winsorized mean. The percentile bounds are a
    * segment-sized aggregate broadcast back onto the rows — the scale
    * path swaps `percentile` for `approx_percentile` (t-digest) with
    * the same plan shape. The winsorized mean flows through a DECIMAL
    * sum of the clipped values so row order can't move a bit. */
  def q98Winsorize(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val bounds = cust.groupBy(col("c_mktsegment"))
      .agg(expr("percentile(c_acctbal, array(0.05D, 0.95D))").as("ps"))
      .select(col("c_mktsegment"), col("ps")(0).as("p05"),
        col("ps")(1).as("p95"))
    cust.join(broadcast(bounds), Seq("c_mktsegment"))
      .withColumn("clipped",
        greatest(col("p05"), least(col("p95"), col("c_acctbal"))))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_customers"),
        sum(when(col("c_acctbal") < col("p05"), 1L).otherwise(0L))
          .as("n_clipped_low"),
        sum(when(col("c_acctbal") > col("p95"), 1L).otherwise(0L))
          .as("n_clipped_high"),
        round(min(col("p05")), 2).as("p05"),
        round(min(col("p95")), 2).as("p95"),
        round(sum(col("clipped").cast("decimal(18,4)")).cast("double")
          / count(lit(1)), 4).as("winsorized_mean"))
  }

  /** q99 — time-weighted average event value per user: each event's
    * value is weighted by how long it "held" (seconds until the user's
    * next event; the final open-ended event is excluded). One per-user
    * window pass produces (value, duration) pairs map-side; durations
    * are exact longs and the value×duration products are summed as
    * DECIMAL, so the weighted mean is engine-exact. The batch twin of
    * a state-store time-weighted aggregation. */
  def q99TimeWeighted(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    t(s, dir, "events")
      .withColumn("next_ts", lead(col("ts"), 1).over(w))
      .where(col("next_ts").isNotNull)
      .withColumn("dur",
        unix_timestamp(col("next_ts")) - unix_timestamp(col("ts")))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_intervals"),
        sum(col("dur")).as("total_secs"),
        round(
          sum((col("value") * col("dur")).cast("decimal(28,4)"))
            .cast("double") / sum(col("dur")), 4).as("twa_value"))
  }

  /** q100 — grouped ordinary-least-squares trend per region: slope and
    * intercept of monthly revenue against a month index, from exact
    * DECIMAL moment sums (Σx, Σy, Σxy, Σx² — x is an exact integer
    * month index, y the 2-dp revenue, so every product has a fixed
    * decimal width). The closed-form slope/intercept then evaluate the
    * same correctly-rounded IEEE tree in both engines (q92's z-score
    * discipline applied to regression). The moment aggregate is
    * region-sized; the fact is touched once. This is `regr_slope`
    * semantics made shuffle-order-proof — the builtin accumulates
    * doubles in partition order and can't hash-match across engines. */
  def q100GroupedRegression(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
    val cust = t(s, dir, "customer")
    val nat = t(s, dir, "nation")
    val monthly = ord
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === nat("n_nationkey"))
      .groupBy(col("n_regionkey").as("region"),
        ((year(col("o_orderdate")) * 12) + month(col("o_orderdate")))
          .as("month_idx"))
      .agg(moneySum(col("o_totalprice")).as("revenue"))
    // Center x at the group's first month: slope is shift-invariant,
    // the intercept becomes "level at series start", and — the
    // engine-exactness point — every moment's unscaled decimal stays
    // under 2^53, where BOTH engines' decimal→double casts are a
    // single exact-int conversion + one correctly-rounded division.
    // (Uncentered month indices push Σxy past 2^53, where DuckDB's
    // int128→double-then-scale cast drifts a ulp from the correctly-
    // rounded value and the intercept's cancellation amplifies it.)
    val m0 = monthly.groupBy(col("region"))
      .agg(min(col("month_idx")).as("m0"))
    val x = (col("month_idx") - col("m0")).cast("decimal(9,0)")
    val y = col("revenue").cast("decimal(15,2)")
    val m = monthly.join(broadcast(m0), Seq("region"))
      .groupBy(col("region")).agg(
        count(lit(1)).as("n"),
        sum(x).as("sx"),
        sum(y).as("sy"),
        sum(x * y).as("sxy"),
        sum(x * x).as("sxx"))
    m.select(col("region"), col("n"),
        col("sx").cast("double").as("sxd"),
        col("sy").cast("double").as("syd"),
        col("sxy").cast("double").as("sxyd"),
        col("sxx").cast("double").as("sxxd"))
      .withColumn("slope", round(
        (col("n") * col("sxyd") - col("sxd") * col("syd")) /
          (col("n") * col("sxxd") - col("sxd") * col("sxd")), 6))
      .withColumn("intercept", round(
        (col("syd") - (col("n") * col("sxyd") - col("sxd") * col("syd")) /
          (col("n") * col("sxxd") - col("sxd") * col("sxd")) * col("sxd"))
          / col("n"), 4))
      .select(col("region"), col("n").as("n_months"),
        col("slope"), col("intercept"))
  }

  /** q95 — trailing 7-day distinct active users per day, the sliding
    * window a plain window frame can't do distinct-ly. Each (day,
    * user) pair fans out map-side to the ≤7 window anchors it counts
    * toward, then ONE distinct aggregate per anchor day — fan-out ×7
    * instead of a per-day self-join (which would re-scan the stream
    * per window position). The bounds row broadcasts to clip the
    * spine to observed days. */
  def q95RollingDistinct(s: SparkSession, dir: String): DataFrame = {
    val pairs = t(s, dir, "events")
      .select(to_date(col("ts")).as("d"), col("user_id")).distinct()
    val bounds = pairs.agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
    pairs
      .select(explode(expr("sequence(d, date_add(d, 6))")).as("day"),
        col("user_id"))
      .join(broadcast(bounds), col("day").between(col("lo"), col("hi")))
      .groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("n_users_7d"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n_users_7d"))
  }

  /** q106 — item-item cosine similarity from co-purchase counts (the
    * classic item-based collaborative-filtering score over binary
    * order×part incidence): cosine(i,j) = n_co / √(deg_i·deg_j).
    * Reuses q94's joinless map-side pair expansion for the numerator;
    * the degree vector is part-sized and broadcasts onto the pair
    * aggregate (at dimension-table scale; a huge catalog falls back
    * to the sort-merge AQE picks). Engine-exact: all three inputs are
    * exact BIGINT counts, deg_i·deg_j stays far under 2⁵³, and the
    * score is one correctly-rounded divide of a correctly-rounded
    * sqrt — the identical IEEE tree in DuckDB. Support floor n_co ≥ 2
    * keeps singleton flukes (cosine 1.0 from one shared order) out of
    * the ranking; ties break on the full (cosine, p1, p2) key. */
  def q106ItemSimilarity(s: SparkSession, dir: String): DataFrame = {
    val items = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val deg = items.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("deg"))
    val pairs = items
      .groupBy(col("l_orderkey"))
      .agg(collect_set(col("l_partkey")).as("parts"))
      .select(explode(col("parts")).as("p1"), col("parts"))
      .select(col("p1"), explode(col("parts")).as("p2"))
      .where(col("p1") < col("p2"))
      .groupBy(col("p1"), col("p2"))
      .agg(count(lit(1)).as("n_co"))
      .where(col("n_co") >= 2)
    pairs
      .join(broadcast(deg.select(col("l_partkey").as("p1"),
        col("deg").as("d1"))), Seq("p1"))
      .join(broadcast(deg.select(col("l_partkey").as("p2"),
        col("deg").as("d2"))), Seq("p2"))
      .withColumn("cosine",
        col("n_co").cast("double") /
          sqrt((col("d1") * col("d2")).cast("double")))
      .orderBy(col("cosine").desc, col("p1").asc, col("p2").asc)
      .limit(50)
      .select(col("p1"), col("p2"), col("n_co"), col("d1"), col("d2"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** q107 — frequent triple mining (the Apriori step after q94's
    * pairs): part triples bought together in ≥ 2 orders. NO three-way
    * self-join — each order's part set expands its C(k,3) combinations
    * MAP-SIDE (line counts are bounded, so the per-row cost is a small
    * constant) and the triple aggregate is the only shuffle; the
    * final top-30 is TakeOrderedAndProject under a full tiebreak. At
    * 100 TB the same shape holds: the expansion is linear in orders,
    * never quadratic in the catalog. */
  def q107FrequentTriples(s: SparkSession, dir: String): DataFrame = {
    val items = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .groupBy(col("l_orderkey"))
      .agg(collect_set(col("l_partkey")).as("parts"))
    items
      .select(explode(col("parts")).as("p1"), col("parts"))
      .select(col("p1"), explode(col("parts")).as("p2"), col("parts"))
      .where(col("p1") < col("p2"))
      .select(col("p1"), col("p2"), explode(col("parts")).as("p3"))
      .where(col("p2") < col("p3"))
      .groupBy(col("p1"), col("p2"), col("p3"))
      .agg(count(lit(1)).as("n_orders"))
      .where(col("n_orders") >= 2)
      .orderBy(col("n_orders").desc, col("p1").asc, col("p2").asc,
        col("p3").asc)
      .limit(30)
  }

  /** q108 — MAD-based robust anomaly screen per market segment: the
    * robust twin of q92's z-score. Per-customer spend is an exact
    * DECIMAL sum; the segment median and the median absolute
    * deviation are the exact interpolated percentile the q46/q98
    * family proved engine-identical; the robust z-score
    * |x − med| / (1.4826·MAD) is then the same IEEE tree in both
    * engines (1.4826 is a PARSED literal on both sides). Two
    * segment-sized aggregate passes — the second needs the median
    * joined back — with the scale swap being approx_percentile for
    * the exact percentile at 100 TB (same plan shape). */
  def q108MadAnomaly(s: SparkSession, dir: String): DataFrame = {
    val spend = t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("c_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,4)"))
        .cast("double").as("spend"))
    val med = spend.groupBy(col("c_mktsegment"))
      .agg(expr("percentile(spend, 0.5D)").as("med"))
    val dev = spend.join(broadcast(med), Seq("c_mktsegment"))
      .withColumn("absdev", abs(col("spend") - col("med")))
    val mad = dev.groupBy(col("c_mktsegment"))
      .agg(expr("percentile(absdev, 0.5D)").as("mad"))
    dev.join(broadcast(mad), Seq("c_mktsegment"))
      .withColumn("rz", col("absdev") / (lit(1.4826) * col("mad")))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_customers"),
        round(first(col("med")), 4).as("median_spend"),
        round(first(col("mad")), 4).as("mad"),
        sum(when(col("rz") > 3.5, 1L).otherwise(0L)).as("n_anomalies"),
        round(max(col("rz")), 6).as("max_robust_z"))
      .orderBy(col("c_mktsegment").asc)
  }

  /** q111 — inter-purchase interval statistics per market segment:
    * the repeat-purchase cadence (days between a customer's
    * consecutive orders). One customer-partitioned window pass
    * produces the lag intervals — orders co-partition by customer, so
    * the window never sees more than one customer's history per
    * group, and ties on order date break on the order key for a
    * deterministic total order. The rollup is exact: intervals are
    * exact INT day diffs, mean is one BIGINT-sum divide, the median
    * the proven interpolated percentile. */
  def q111PurchaseIntervals(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val iv = t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      .withColumn("gap",
        datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w)))
      .where(col("gap").isNotNull)
    iv.join(broadcast(t(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_intervals"),
        min(col("gap")).as("min_days"),
        max(col("gap")).as("max_days"),
        round(sum(col("gap").cast("bigint")).cast("double") /
          count(lit(1)), 6).as("mean_days"),
        round(expr("percentile(gap, 0.5D)"), 4).as("median_days"))
      .orderBy(col("c_mktsegment").asc)
  }

  /** q116 — distribution drift on a decile grid (the KS-style check
    * PSI users want, WITHOUT the ln() that isn't engine-exact): order
    * values from 1995 vs 1996 compared at the 9 interior deciles of
    * the pooled distribution. The grid is a 9-row aggregate broadcast
    * back onto the pooled rows; per-decile CDFs are conditional
    * counts divided once (exact integers → one correctly-rounded
    * divide), the gap one subtraction — every number the identical
    * IEEE tree in DuckDB. Scale shape: one pass for the grid
    * (approx_percentile is the 100 TB swap), one conditional
    * aggregate for all 9 boundaries — the fact table is read twice,
    * never self-joined. */
  def q116DistributionDrift(s: SparkSession, dir: String): DataFrame = {
    val pop = t(s, dir, "orders")
      .where(year(col("o_orderdate")).isin(1995, 1996))
      .select(year(col("o_orderdate")).as("yr"),
        col("o_totalprice").as("v"))
    val grid = pop.agg(expr(
        "percentile(v, array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D))")
        .as("qs"))
      .select(posexplode(col("qs")).as(Seq("i", "boundary")))
    pop.crossJoin(broadcast(grid))
      .groupBy((col("i") + 1).as("decile"), col("boundary"))
      .agg(
        sum(when(col("yr") === 1995 && col("v") <= col("boundary"), 1L)
          .otherwise(0L)).as("le1"),
        sum(when(col("yr") === 1995, 1L).otherwise(0L)).as("n1"),
        sum(when(col("yr") === 1996 && col("v") <= col("boundary"), 1L)
          .otherwise(0L)).as("le2"),
        sum(when(col("yr") === 1996, 1L).otherwise(0L)).as("n2"))
      .select(col("decile"), round(col("boundary"), 4).as("boundary"),
        round(col("le1").cast("double") / col("n1"), 6).as("cdf_1995"),
        round(col("le2").cast("double") / col("n2"), 6).as("cdf_1996"),
        round(abs(col("le1").cast("double") / col("n1") -
          col("le2").cast("double") / col("n2")), 6).as("cdf_gap"))
      .orderBy(col("decile").asc)
  }

  /** q117 — revenue concentration: Lorenz-curve deciles of customer
    * spend plus the exact Gini coefficient via the sorted-rank
    * formula G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n. Everything that crosses
    * a shuffle is DECIMAL: per-customer spend at 2 dp, the rank-
    * weighted sum Σ(i·xᵢ) as exact decimal products (at sf0.1 its
    * unscaled value stays ~2×10¹⁵ < 2⁵³, so the one decimal→double
    * cast agrees across engines; at larger corpora rescale x to
    * coarser units first — same plan). The customer-sized total
    * order (spend, custkey) feeds rank and decile from ONE
    * [[PrefixSum.rankNtile]] pass — bit-identical to
    * row_number/NTILE over the global window, but the customer
    * aggregate crosses a range-ish shuffle instead of one task. The
    * three Gini terms evaluate the identical IEEE tree in DuckDB. */
  def q117LorenzGini(s: SparkSession, dir: String): DataFrame = {
    val spend = t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("x"))
    val ranked = PrefixSum.rankNtile(spend,
        Seq(col("x"), col("o_custkey")), 10, Some("_i"), "_dec")
      .withColumn("i", col("_i").cast("long"))
      .withColumn("decile", col("_dec").cast("long"))
      .drop("_i", "_dec")
    val g = ranked.agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum(col("x").cast("decimal(18,2)") * col("i")).as("sxi"))
      .select(col("n"), col("sx"),
        (lit(2.0) * col("sxi").cast("double") /
          (col("n") * col("sx").cast("double")) -
          (col("n") + 1).cast("double") / col("n")).as("gini_raw"))
    val cum = Window.orderBy(col("decile").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked.groupBy(col("decile"))
      .agg(count(lit(1)).as("n_customers"), sum(col("x")).as("dx"))
      .withColumn("cumx", sum(col("dx")).over(cum))
      .crossJoin(broadcast(g))
      .select(col("decile"), col("n_customers"),
        round(col("dx").cast("double"), 2).as("decile_spend"),
        round(col("cumx").cast("double") / col("sx").cast("double"), 6)
          .as("cum_share"),
        round(col("gini_raw"), 6).as("gini"))
      .orderBy(col("decile").asc)
  }

  /** q118 — CUPED variance-reduced A/B readout: per-user event value
    * splits into a pre-period covariate x (first 15 days) and the
    * experiment metric y (last 15 days); θ = cov(x,y)/var(x) is fit
    * POOLED, and each arm reports mean(y) alongside the CUPED-adjusted
    * mean(y) − θ·(mean(x) − mean(x)_global) — the standard trick that
    * shrinks A/B confidence intervals without touching the estimate's
    * expectation. Engine-exact by the q105 recipe: x and y are exact
    * 4-dp decimal sums; cross/square products of those bit-identical
    * doubles flow through DECIMAL(38,18) so partition order can't move
    * a bit; every mean/cov/θ/adjustment is then the identical
    * correctly-rounded IEEE tree in DuckDB, with the final 6-dp round
    * far above any residual cast noise. Scale shape: one user-keyed
    * aggregate (the only fact-sized shuffle), one 1-row moment
    * aggregate, one arm-sized rollup. */
  def q118Cuped(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("user_id"), col("ts"), col("value"))
    val cut = ev.agg(date_add(to_date(min(col("ts"))), 15).as("cut"))
    val zero = lit("0").cast("decimal(18,4)")
    val perUser = ev.crossJoin(broadcast(cut))
      .groupBy(col("user_id"))
      .agg(
        sum(when(to_date(col("ts")) < col("cut"),
          col("value").cast("decimal(18,4)")).otherwise(zero))
          .cast("double").as("x"),
        sum(when(to_date(col("ts")) >= col("cut"),
          col("value").cast("decimal(18,4)")).otherwise(zero))
          .cast("double").as("y"))
      .withColumn("arm",
        when(substring(md5(col("user_id").cast("string")), 1, 1) < "8",
          "A").otherwise("B"))
    val m = perUser.agg(
        count(lit(1)).as("n"),
        sum(col("x").cast("decimal(18,4)")).as("sx"),
        sum(col("y").cast("decimal(18,4)")).as("sy"),
        sum((col("x") * col("y")).cast("decimal(38,18)")).as("sxy"),
        sum((col("x") * col("x")).cast("decimal(38,18)")).as("sxx"))
      .select(col("n"),
        (col("sx").cast("double") / col("n")).as("mx"),
        (col("sy").cast("double") / col("n")).as("my"),
        (col("sxy").cast("double") / col("n")).as("mxy"),
        (col("sxx").cast("double") / col("n")).as("mxx"))
      .select(col("mx"),
        ((col("mxy") - col("mx") * col("my")) /
          (col("mxx") - col("mx") * col("mx"))).as("theta"))
    perUser.crossJoin(broadcast(m))
      .groupBy(col("arm"))
      .agg(
        count(lit(1)).as("n_users"),
        (sum(col("y").cast("decimal(18,4)")).cast("double") /
          count(lit(1))).as("my_raw"),
        (sum(col("x").cast("decimal(18,4)")).cast("double") /
          count(lit(1))).as("mx_raw"),
        first(col("theta")).as("th"),
        first(col("mx")).as("gmx"))
      .select(col("arm"), col("n_users"),
        round(col("my_raw"), 6).as("mean_y"),
        round(col("my_raw") - col("th") * (col("mx_raw") - col("gmx")), 6)
          .as("mean_y_cuped"),
        round(col("th"), 6).as("theta"))
      .orderBy(col("arm").asc)
  }

  /** q136 — cumulative distinct actives per day: "how many unique
    * users has the platform EVER seen, by day" — the growth metric
    * every dashboard wants and no engine supports directly, because
    * COUNT(DISTINCT) OVER a cumulative window isn't implementable as
    * a window (state would be set-sized). The standard rewrite IS the
    * operator: a user counts exactly once, in their FIRST month —
    * so cumulative-distinct = prefix-sum of first-appearance counts.
    * One user-keyed aggregate (min day per user), one calendar-sized
    * aggregate, one calendar-sized window; daily actives ride along
    * for the new-vs-returning split. The rewrite is spec-checked
    * against brute-force cumulative sets; the oracle runs the same
    * rewrite, pinning the arithmetic. */
  def q136CumulativeDistinct(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
    val firstDay = ev.groupBy(col("user_id"))
      .agg(min(col("day")).as("first_day"))
    val dailyNew = firstDay.groupBy(col("first_day").as("day"))
      .agg(count(lit(1)).as("n_new"))
    val dailyActive = ev.distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("n_active"))
    val w = Window.orderBy(col("day").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dailyActive
      .join(dailyNew, Seq("day"), "left")
      .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
      .withColumn("cum_distinct_users", sum(col("n_new")).over(w))
      .select(col("day"), col("n_active"), col("n_new"),
        (col("n_active") - col("n_new")).as("n_returning"),
        col("cum_distinct_users"))
      .orderBy(col("day"))
  }

  /** q132 — weighted median price per return flag, weighted by shipped
    * quantity: the "median dollar" rather than the median line — a
    * robust price statistic Spark has no builtin for. Definition:
    * lower weighted median = the smallest price whose cumulative
    * weight reaches half the total (2·cumw ≥ total, ALL-INTEGER
    * comparison — quantities are integral, so the halving never
    * touches a float). Shape: collapse to (flag, price) groups first
    * — the window then runs over the distinct-price table, not the
    * fact — one cumulative-sum window partitioned by flag, one
    * conditional min. PrefixSum's bucket pattern is the documented
    * swap if a single flag's price list outgrows a partition. */
  def q132WeightedMedian(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val byPrice = li.groupBy(col("l_returnflag"),
        col("l_extendedprice").as("price"))
      .agg(sum(col("l_quantity").cast("long")).as("w"))
    val ord = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("price").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(col("l_returnflag"))
    byPrice
      .withColumn("cumw", sum(col("w")).over(ord))
      .withColumn("total_w", sum(col("w")).over(tot))
      .where(col("cumw") * 2 >= col("total_w"))
      .groupBy(col("l_returnflag"))
      .agg(min(col("price")).as("weighted_median_price"),
        first(col("total_w")).as("tw"))
      .select(col("l_returnflag"), col("tw").as("total_weight"),
        col("weighted_median_price"))
      .orderBy(col("l_returnflag"))
  }

  /** q146 — temporal-concentration profile via Shannon entropy: how
    * spread over the 24 hours of the day is each event type's traffic?
    * H = −Σ p·ln p over the hour-of-day histogram, reported with the
    * normalized evenness H/ln(24) (1 = perfectly uniform). Shape: one
    * fact-sized (type,hour) aggregate, then a 24-row-per-type window
    * for the totals — histogram first, entropy over the histogram, so
    * the fact is touched once regardless of scale. Engine-exactness:
    * p is a quotient of exact longs, each p·ln p term is the same IEEE
    * expression in DuckDB, and the ≤24-term sum is rounded at 6 dp —
    * ~10⁹× above any libm ulp drift (the one caveat: this is the
    * suite's only transcendental, so the guard is the rounding margin,
    * not bit-equality of ln itself). */
  def q146HourlyEntropy(s: SparkSession, dir: String): DataFrame = {
    val hist = t(s, dir, "events")
      .groupBy(col("event_type"), hour(col("ts")).as("hod"))
      .agg(count(lit(1)).as("n"))
    val tot = Window.partitionBy(col("event_type"))
    hist
      .withColumn("n_total", sum(col("n")).over(tot))
      .select(col("event_type"), col("n"), col("n_total"),
        (col("n").cast("double") / col("n_total").cast("double")).as("p"))
      .groupBy(col("event_type"))
      .agg(sum(col("n")).as("n_events"),
        count(lit(1)).as("n_active_hours"),
        round(-sum(col("p") * log(col("p"))), 6).as("entropy_nats"),
        round(-sum(col("p") * log(col("p"))) / log(lit(24.0)), 6)
          .as("evenness"))
      .orderBy(col("event_type"))
  }

  /** q149 — CUSUM changepoint detection on each region's monthly
    * revenue series: the month where the cumulative sum of deviations
    * from the series mean peaks in magnitude is the classic
    * single-changepoint estimate (where the level shifted). Shape:
    * the fact collapses to a (region × month) aggregate — dimension
    * joins broadcast — then every window pass (running sum, series
    * totals, the argmax rank) runs over that calendar-sized table, so
    * 100 TB of orders costs one fact-sized partial-agg shuffle and
    * nothing else. Engine-exactness: the running sum stays DECIMAL
    * (exact, shuffle-order-proof); the mean and each CUSUM value are
    * then the same three-operation IEEE tree (`cast(run) − i·(tot/n)`)
    * in both engines, so even the argmax tie-break can't drift. */
  def q149CusumChangepoint(s: SparkSession, dir: String): DataFrame = {
    val monthly = t(s, dir, "orders")
      .join(t(s, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(t(s, dir, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .join(t(s, dir, "region"),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"),
        trunc(col("o_orderdate").cast("date"), "month").as("mon"))
      .agg(sum(col("o_totalprice").cast("decimal(18,4)")).as("rev"))
    val series = Window.partitionBy(col("r_name"))
    val ord = series.orderBy(col("mon"))
    val cusum = monthly
      .withColumn("i", row_number().over(ord))
      .withColumn("run",
        sum(col("rev")).over(ord.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .withColumn("tot", sum(col("rev")).over(series).cast("double"))
      .withColumn("nm", count(lit(1)).over(series))
      .withColumn("mean", col("tot") / col("nm").cast("double"))
      .withColumn("cusum",
        col("run").cast("double") - col("i").cast("double") * col("mean"))
    cusum
      .withColumn("rk", row_number().over(
        series.orderBy(abs(col("cusum")).desc, col("mon").asc)))
      .where(col("rk") === 1)
      .select(col("r_name"), col("mon").as("cp_month"),
        col("nm").as("n_months"),
        round(col("mean"), 2).as("mean_monthly"),
        round(col("cusum"), 2).as("cusum_at_cp"))
      .orderBy(col("r_name"))
  }

  /** q153 — dwell-time statistics per event transition: for each
    * (prev_type → type) pair, how long users linger before making that
    * transition (mean / median / p90 seconds). The behavioral
    * companion to q91's transition PROBABILITIES — same single
    * user-keyed window pass (one hash exchange on user_id, key-local
    * sort), then a |types|²-sized aggregate. Engine-exactness: gaps
    * are exact BIGINT microseconds from the same (ts, event_id) total
    * order both engines sort by; the mean divides two exact integers;
    * median/p90 use exact interpolated percentiles over integers
    * (q111's quantile_cont correspondence), with
    * approx_percentile the documented 100 TB swap. */
  def q153TransitionDwell(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val gaps = t(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("gap_us",
        unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
      .where(col("prev_type").isNotNull)
    gaps.groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("n_transitions"),
        round(sum(col("gap_us")).cast("double") /
          count(lit(1)).cast("double") / lit(1e6), 6).as("mean_s"),
        round(percentile(col("gap_us"), lit(0.5)) / lit(1e6), 6)
          .as("median_s"),
        round(percentile(col("gap_us"), lit(0.9)) / lit(1e6), 6)
          .as("p90_s"))
      .orderBy(col("prev_type"), col("event_type"))
  }

  /** q155 — Kaplan–Meier survival curve over SESSION durations:
    * observed lifetime = whole minutes between a session's first and
    * last event (q41's 30-minute-gap sessionization); sessions whose
    * last event falls within one gap of the corpus end are CENSORED —
    * they may still be open, so dropping them would bias durations
    * down and counting them closed would bias them up; the
    * product-limit estimator keeps them in the risk sets without
    * counting a death. Shape: one user-keyed window pass builds
    * sessions (exactly q41's single hash exchange), sessions collapse
    * to a ≤|minutes|-sized life table, and every KM quantity — risk
    * sets via a reverse running sum, the survival product — is a
    * window over that tiny table. Engine-exactness: the survival
    * PRODUCT is taken in log space with each factor's ln floored to
    * integer nano-nats (q101's trick) so the running sum is exact and
    * order-proof; survival back-transforms through one exp of an
    * identical double. Curve rows stop before a terminal d=n step
    * (where survival is exactly 0 and ln diverges). */
  def q155KmRetention(s: SparkSession, dir: String): DataFrame = {
    val GapUs = 30L * 60L * 1000000L
    val MinuteUs = 60L * 1000000L
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val marked = t(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        unix_micros(col("ts")).as("eu"))
      .withColumn("prev_eu", lag(col("eu"), 1).over(w))
      .withColumn("new_s",
        when(col("prev_eu").isNull ||
          col("eu") - col("prev_eu") > GapUs, 1L).otherwise(0L))
      .withColumn("sid",
        sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
    val sessions = marked.groupBy(col("user_id"), col("sid"))
      .agg(min(col("eu")).as("st"), max(col("eu")).as("en"))
    val withEnd = sessions.crossJoin(broadcast(
      t(s, dir, "events").agg(max(unix_micros(col("ts"))).as("end_us"))))
    val life = withEnd
      .select(
        expr(s"(en - st) DIV $MinuteUs").as("minute"),
        when(col("en") <= col("end_us") - GapUs, 1L)
          .otherwise(0L).as("died"))
      .groupBy(col("minute"))
      .agg(count(lit(1)).as("n_leaving"), sum(col("died")).as("n_died"))
    val ord = Window.orderBy(col("minute"))
    val curve = life
      .withColumn("n_at_risk",
        sum(col("n_leaving")).over(ord.rowsBetween(Window.currentRow,
          Window.unboundedFollowing)))
      .where(col("n_died") > 0 && col("n_died") < col("n_at_risk"))
      .withColumn("step_nn",
        floor(log(lit(1.0) - col("n_died").cast("double") /
          col("n_at_risk").cast("double")) * lit(1e9)).cast("bigint"))
      .withColumn("cum_nn",
        sum(col("step_nn")).over(ord.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
    curve.select(col("minute"), col("n_at_risk"), col("n_died"),
        col("n_leaving"),
        round(col("cum_nn").cast("double") / lit(1e9), 6)
          .as("log_survival"),
        round(exp(col("cum_nn").cast("double") / lit(1e9)), 6)
          .as("survival"))
      .orderBy(col("minute"))
  }
}
