package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Core relational operator surface (SURVEY.md §2), re-expressed
  * Spark-first over the TPC-H-ish testdata.
  *
  * Mapping of the reference's retail star schema onto the testdata:
  * fact `purchase` → `lineitem` (+`orders` header), dimensions
  * `customer`/`products_info`/`zipcode` → `customer`/`part`+`supplier`/
  * `nation`+`region`. Dates-as-strings semantics (`yyyymmdd`,
  * /root/reference/scripts/jb_de_enhancement_t0_fact_d2s.py:86-87) are
  * reproduced by deriving string year/month columns from `l_shipdate`.
  *
  * Every query is declarative DataFrame API: Catalyst plans partial+final
  * hash aggregates, broadcasts sub-10MB dimensions, and pushes
  * filters/column pruning into the parquet scan — verified by the
  * plan-shape specs in PlanShapeSpec.
  */
object CoreQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Deterministic money aggregation: double sums are order-dependent at
    * the ulp level, which can flip a ROUND boundary between engines (and
    * between runs at different parallelism). Summing via exact
    * DECIMAL(18,4) is associative, so partial/final aggregation order —
    * and a 1000-executor shuffle plan — cannot change the result. */
  private def moneySum(c: Column): Column =
    round(sum(c.cast("decimal(18,4)")).cast("double"), 2)

  /** Fact with derived string date-part columns, the T0 ingest projection
    * (SURVEY §2.2-P1: withColumn + 1-based substring over `yyyymmdd`). */
  def factWithDateParts(s: SparkSession, dir: String): DataFrame = {
    // date_format produces the canonical yyyymmdd string; substring then
    // slices it exactly like the reference (1-based, P1/F1 semantics).
    t(s, dir, "lineitem")
      .withColumn("ship_ymd", date_format(col("l_shipdate"), "yyyyMMdd"))
      .withColumn("ship_year", substring(col("ship_ymd"), 1, 4))
      .withColumn("ship_month", substring(col("ship_ymd"), 5, 2))
  }

  /** q01 — A1/A2 + P1 + S4: multi-key hash aggregate (sum + count) over
    * derived date parts, with the reference's alias discipline
    * (jb_de_enhancement_t2_salesbyageproducts_s2s.py:55-56).
    * `count(col)` (null-skipping), not count(*), exactly as A1 notes. */
  def q01PrunedAgg(s: SparkSession, dir: String): DataFrame =
    factWithDateParts(s, dir)
      // Range predicate on the raw timestamp column (equivalent to the
      // reference's lexicographic yyyymmdd BETWEEN, P4) — phrased on the
      // source column so it pushes into the parquet scan for row-group
      // skipping; a predicate on the derived date_format string would
      // read every row at 100 TB. The string-BETWEEN trap itself is
      // exercised in the ETL pipeline where dates ARE strings.
      .where(col("l_shipdate") >= "1995-01-01" &&
        col("l_shipdate") < "1997-01-01")
      .groupBy(col("l_returnflag"), col("ship_year"), col("ship_month"))
      .agg(
        moneySum(col("l_extendedprice")).as("total_purchase_amount"),
        count(col("l_quantity")).as("count_of_purchase"))

  /** q02 — S2/P4: filtered scan with a string-date range predicate pushed
    * to the parquet source (the JDBC pushdown-query analogue,
    * jb_de_enhancement_t0_fact_d2s.py:72-82). */
  def q02FilteredScan(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .where(col("l_shipdate").between("1995-01-01", "1995-12-31"))
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_quantity"), col("l_extendedprice"),
        date_format(col("l_shipdate"), "yyyyMMdd").as("ship_ymd"))

  /** q03 — J1+J2+J3+P3: the T1 denormalization join chain
    * (jb_de_enhancement_t1_fulljoin_s2s.py:53-86). Left-deep, fact-last,
    * fact never shuffled: every dimension is broadcast. Duplicate join
    * keys dropped via right-side references (P3 semantics). */
  def q03DenormJoin(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val ord = t(s, dir, "orders")
    val cust = t(s, dir, "customer")
    val nat = t(s, dir, "nation")
    val reg = t(s, dir, "region")

    // dim-side pre-join (customer ⟕ nation ⟕ region), like the
    // reference's customer ⟕ zipcode pre-join (J1).
    val custGeo = cust
      .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"), "left")
      .drop(nat("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === reg("r_regionkey"), "left")
      .drop(reg("r_regionkey"))

    val withOrder = li
      .join(broadcast(ord), li("l_orderkey") === ord("o_orderkey"), "left")
      .drop(ord("o_orderkey"))

    withOrder
      .join(broadcast(custGeo),
        withOrder("o_custkey") === custGeo("c_custkey"), "left")
      .drop(custGeo("c_custkey"))
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_returnflag"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"),
        col("o_custkey"), col("o_orderstatus"), col("o_orderpriority"),
        col("c_name"), col("c_mktsegment"),
        col("n_name").as("nation"), col("r_name").as("region_name"))
  }

  /** q04 — J5: the CTE + chained-joins ad-hoc query
    * (/root/reference/document/glue_t1.md:34-53) via spark.sql. */
  def q04CteSql(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql("""
      WITH cust_geo AS (
        SELECT c_custkey, c_mktsegment, n_name, r_name
        FROM customer
        LEFT JOIN nation ON c_nationkey = n_nationkey
        LEFT JOIN region ON n_regionkey = r_regionkey
      )
      SELECT /*+ BROADCAST(orders), BROADCAST(cust_geo) */
        r_name AS region_name,
        n_name AS nation,
        o_orderpriority,
        ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue,
        COUNT(l_quantity) AS count_of_purchase
      FROM lineitem
      LEFT JOIN orders ON l_orderkey = o_orderkey
      LEFT JOIN cust_geo ON o_custkey = c_custkey
      GROUP BY r_name, n_name, o_orderpriority
    """)
  }

  /** q05 — J4: aggregate-then-join (agg BEFORE the dimension join, the
    * semantic point of jb_de_enhancement_t2_salesbycustomer_s2s.py:54-78).
    * The per-key aggregate shrinks the fact before the broadcast join. */
  def q05AggThenJoin(s: SparkSession, dir: String): DataFrame = {
    val perOrder = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(
        moneySum(col("l_extendedprice")).as("order_amount"),
        count(col("l_quantity")).as("n_lines"))
    val ord = t(s, dir, "orders")
    val cust = t(s, dir, "customer")
    perOrder
      .join(broadcast(ord), perOrder("l_orderkey") === ord("o_orderkey"), "left")
      .drop(ord("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === cust("c_custkey"), "left")
      .drop(cust("c_custkey"))
      .select(
        col("l_orderkey"), col("order_amount"), col("n_lines"),
        col("o_custkey"), col("c_name"), col("c_mktsegment"))
  }

  /** q06 — A5: count + exact count(distinct) per group
    * (/root/reference/document/glue_t2.md:105). Spark expands
    * countDistinct into a two-phase aggregate automatically. */
  def q06CountDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        count(col("event_id")).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        moneySum(col("value")).as("total_value"))

  /** q07 — A6/F3/F4: derived aggregate arithmetic + round, the KPI-ratio
    * pattern (/root/reference/document/glue_t2.md:107-109). Long/Long
    * division yields double in both Spark and DuckDB `/`. */
  def q07KpiArithmetic(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_customers"),
        sum(col("o_totalprice").cast("decimal(18,4)")).cast("double").as("raw_amount"))
      .select(
        col("o_orderstatus"),
        col("n_orders"),
        col("n_customers"),
        round(col("n_orders") / col("n_customers"), 4)
          .as("orders_per_customer"),
        round(col("raw_amount") / col("n_orders") / lit(1000), 4)
          .as("avg_order_k"),
        round(col("raw_amount") / lit(1000000), 2).as("amount_mm"))

  /** q08 — F5/F6/U1: weekday analytics. The reference's semantic trap:
    * ISO numbering Mon=1..Sun=7 (glue_t2.md:41-45) while Spark's
    * dayofweek() is Sun=1 — so use weekday()+1, and date_format 'EEEE'
    * for the English day name (the Python UDF's output, U1). */
  def q08Weekday(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .withColumn("day_of_week", date_format(col("o_orderdate"), "EEEE"))
      .withColumn("iso_dow", expr("weekday(o_orderdate) + 1"))
      .groupBy(col("iso_dow"), col("day_of_week"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        moneySum(col("o_totalprice")).as("total_amount"))

  /** q09 — O1: multi-column global sort with mixed direction
    * (jb_de_enhancement_t2_salesbyresidence_s2s.py:57) — range-partitioned
    * SortExec; n_name tiebreak makes the order total. */
  def q09MultiSort(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val ord = t(s, dir, "orders")
    val cust = t(s, dir, "customer")
    val nat = t(s, dir, "nation")
    li.join(broadcast(ord), li("l_orderkey") === ord("o_orderkey"), "left")
      .join(broadcast(cust), col("o_custkey") === cust("c_custkey"), "left")
      .join(broadcast(nat), col("c_nationkey") === nat("n_nationkey"), "left")
      .groupBy(col("n_regionkey"), col("n_name"))
      .agg(
        moneySum(col("l_extendedprice")).as("total_amount"),
        count(col("l_quantity")).as("count_of_purchase"))
      .sort(
        col("n_regionkey").asc, col("total_amount").desc,
        col("count_of_purchase").desc, col("n_name").asc)
  }

  /** q36 — A7 (absent in the reference, builtin in Spark): ROLLUP over
    * (returnflag, year) producing subtotal and grand-total rows in the
    * same single two-phase aggregate — the plan stays one shuffle; the
    * grouping-set expansion happens map-side. `grouping()` flags
    * disambiguate real NULL keys from subtotal rows. */
  def q36Rollup(s: SparkSession, dir: String): DataFrame =
    factWithDateParts(s, dir)
      .rollup(col("l_returnflag"), col("ship_year"))
      .agg(
        moneySum(col("l_extendedprice")).as("total_purchase_amount"),
        count(col("l_quantity")).as("count_of_purchase"),
        grouping(col("l_returnflag")).cast("int").as("g_flag"),
        grouping(col("ship_year")).cast("int").as("g_year"))

  /** q10 — O3/O5: ORDER BY + LIMIT k → Catalyst's TakeOrderedAndProject
    * (no global sort materialized; per-partition top-k then merge). */
  def q10TopK(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val ord = t(s, dir, "orders")
    li.join(broadcast(ord), li("l_orderkey") === ord("o_orderkey"), "inner")
      .groupBy(col("o_custkey"))
      .agg(moneySum(col("l_extendedprice")).as("revenue"))
      .orderBy(col("revenue").desc, col("o_custkey").asc)
      .limit(10)
  }

  /** q11 — window-function extension (absent in the reference, SURVEY
    * §2.5; built-in Window covers it): top-3 parts by revenue per brand.
    * Deterministic rank via partkey tiebreak. */
  def q11WindowRank(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val part = t(s, dir, "part")
    val perPart = li
      .join(broadcast(part), li("l_partkey") === part("p_partkey"), "inner")
      .groupBy(col("p_brand"), col("p_partkey"), col("p_name"))
      .agg(moneySum(col("l_extendedprice")).as("revenue"))
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("revenue").desc, col("p_partkey").asc)
    perPart
      .withColumn("rank_in_brand", row_number().over(w))
      .where(col("rank_in_brand") <= 3)
      .select(col("p_brand"), col("rank_in_brand"), col("p_partkey"),
        col("p_name"), col("revenue"))
  }

  /** q12 — F8 extension: JSON field extraction (get_json_object is
    * codegen'd; no UDF). */
  def q12JsonExtract(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(
        count(col("k")).as("n_events"),
        sum(col("k")).as("sum_k"),
        round(avg(col("k")), 4).as("avg_k"))

  /** q203 — the VARIANT lane for semi-structured data (Spark 4's
    * native answer to schema-on-read JSON, q12's modern twin):
    * `parse_json` converts the payload ONCE into the binary variant
    * encoding, `variant_get` then extracts typed fields without
    * re-parsing text per access — at 100 TB, re-tokenizing JSON
    * strings per extraction is a real CPU line item, and variant's
    * shredded binary form is also what lets parquet readers push
    * subfield access down in the open-table formats adopting it. The
    * audit extracts, filters on, and aggregates a typed subfield;
    * DuckDB restates it over its own JSON parser — two independent
    * JSON implementations agreeing on every extracted value. */
  def q203VariantExtract(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_type"),
        parse_json(col("props")).as("v"))
      .select(col("event_type"),
        variant_get(col("v"), "$.k", "long").as("k"))
      .where(col("k").isNotNull)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        count(when(col("k") % 2 === 0, 1)).as("n_even"))

  /** q13 — set-op/anti-join surface (SURVEY §2.7 notes set ops absent in
    * the reference; left_anti is the scalable NOT EXISTS). Customers with
    * no completed ('F') orders. */
  def q13AntiJoin(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val done = t(s, dir, "orders").where(col("o_orderstatus") === "F")
    cust.join(done, cust("c_custkey") === done("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
  }

  /** q14 — left_semi (EXISTS): customers with at least one URGENT order. */
  def q14SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val urgent = t(s, dir, "orders")
      .where(col("o_orderpriority") === "1-URGENT")
    cust.join(urgent, cust("c_custkey") === urgent("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
  }

  /** q163 — recursive CTE hierarchy walk (WITH RECURSIVE, new SQL
    * surface in Spark 4): every customer climbs a synthetic reporting
    * tree (parent = key div 10) to its single-digit root, then the
    * walk rolls up per root — subtree size, max depth, and an
    * order-independent key-sum fingerprint pinning exact membership.
    * Spark executes the recursion as an iterated union (UnionLoop):
    * each step is one distributed map over the still-live rows, and
    * the step count is log₁₀(max key) — 7 levels at 15M customers,
    * never row-count-bounded — so the pattern holds at 100 TB where a
    * driver-side loop would not. DuckDB runs the identical recursion
    * natively, making this the rare graph-walk query that is fully
    * hash-checked rather than rows-only. */
  def q163RecursiveHierarchy(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql("""
      WITH RECURSIVE walk AS (
        SELECT c_custkey AS k, c_custkey AS cur, 0 AS depth FROM customer
        UNION ALL
        SELECT k, cur DIV 10, depth + 1 FROM walk WHERE cur >= 10
      )
      SELECT cur AS root,
             COUNT(*) AS n_customers,
             MAX(depth) AS max_depth,
             SUM(k) AS key_sum
      FROM walk WHERE cur < 10
      GROUP BY cur ORDER BY root
    """)
  }

  /** q19 — time-bucketed event aggregation (the batch form of the
    * Structured Streaming hourly window; see graft.streaming). Hour
    * formatted as string for engine-portable hashing. */
  def q19HourlyEvents(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("hour",
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss"))
      .groupBy(col("hour"), col("event_type"))
      .agg(
        count(col("event_id")).as("n_events"),
        moneySum(col("value")).as("total_value"))
}
