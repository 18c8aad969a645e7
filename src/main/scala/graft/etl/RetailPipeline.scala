package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType, StructField,
  StructType}
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** The reference's medallion DAG over its OWN retail star schema — the
  * golden end-to-end path (SURVEY §5.2.2), as opposed to [[Pipeline]],
  * which re-expresses the same operator chain over the TPC-H-ish
  * testdata for oracle checking.
  *
  * Sources are the reference's seed CSVs (customer / products_info /
  * zipcode; README.md:224-314 DDL) plus a synthesized purchase fact —
  * the original 28.6M-row parquet is an absent large blob, so
  * [[synthPurchase]] generates a deterministic fact honoring the DDL's
  * contracts (FIXTURES.md A.4): composite product keys drawn from
  * products_info with a small miss rate, nullable customer_id,
  * `yyyymmdd`/`HH` STRING dates and times, long-tailed amounts.
  *
  * Semantics mirrored from the reference scripts:
  *  - customer ⟕ zipcode on residence = short_zipcode, dropping the
  *    join key (jb_de_enhancement_t1_fulljoin_s2s.py:53-55) — the
  *    21 duplicated short_zipcodes FAN OUT (19,383 → 20,239 rows;
  *    RetailGoldenSpec pins it);
  *  - purchase ⟕ products_info on the 4-column composite key, dup keys
  *    dropped (t1_fulljoin_s2s.py:74-82);
  *  - the four T2 marts' exact grouping keys, aggregate aliases,
  *    column order, and the residence mart's sort
  *    (t2_*_s2s.py:55-86) — including salesbycustomer aggregating the
  *    RAW purchase table, not the silver join (t2_salesbycustomer
  *    _s2s.py:54-56);
  *  - the weekday UDF with the reference's exact fallback literal
  *    (functions.Udfs, U1).
  *
  * One deliberate upgrade: `sum(amount)` runs through DECIMAL(18,4)
  * and rounds once (Pipeline.moneySum's pattern) instead of a raw
  * double sum — a double Σ is shuffle-order-dependent, which at 100 TB
  * means two runs of the same mart can differ in the last ulp.
  */
object RetailPipeline {

  val customerSchema: StructType = StructType(Seq(
    StructField("customer_id", StringType),
    StructField("sex", StringType),
    StructField("age_group", StringType),
    StructField("residence", StringType)))

  val productsSchema: StructType = StructType(Seq(
    StructField("affiliate", StringType),
    StructField("division_cd", StringType),
    StructField("main_category_cd", StringType),
    StructField("sub_category_cd", StringType),
    StructField("main_category_desc", StringType),
    StructField("sub_category_desc", StringType)))

  val zipcodeSchema: StructType = StructType(Seq(
    StructField("zipcode", StringType),
    StructField("province_city", StringType),
    StructField("province_city_eng", StringType),
    StructField("city_county", StringType),
    StructField("city_county_eng", StringType),
    StructField("eup_myeon", StringType),
    StructField("eup_myeon_eng", StringType),
    StructField("road_nm", StringType),
    StructField("road_nm_eng", StringType),
    StructField("short_zipcode", StringType)))

  def customer(spark: SparkSession, dataDir: String): DataFrame =
    Sources.csv(spark, s"$dataDir/customer.csv", customerSchema)

  def productsInfo(spark: SparkSession, dataDir: String): DataFrame =
    Sources.csv(spark, s"$dataDir/products_info.csv", productsSchema)

  def zipcode(spark: SparkSession, dataDir: String): DataFrame =
    Sources.csv(spark, s"$dataDir/zipcode.csv", zipcodeSchema)

  /** Deterministic purchase fact per the DDL + FIXTURES.md A.4:
    * every column derives from xxhash64(id, salt) — no RNG state, so
    * any executor count reproduces identical bytes. ~1/50 product keys
    * miss products_info (left-join misses), ~1/40 customer_ids are
    * NULL (anonymous purchases), dates span 2014-01-01..2015-12-31 as
    * `yyyymmdd` STRINGS, amounts are long-tailed (1% × 50 spike). */
  def synthPurchase(spark: SparkSession, products: DataFrame,
      nRows: Long, nCustomers: Int = 19383): DataFrame = {
    val nProducts = products.count()
    val prodIdx = products
      .withColumn("pidx",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy("affiliate", "division_cd", "main_category_cd",
            "sub_category_cd")) - 1)
      .select(col("pidx"), col("affiliate"), col("division_cd"),
        col("main_category_cd"), col("sub_category_cd"))

    def h(salt: Int) = xxhash64(col("id"), lit(salt))

    val base = spark.range(nRows)
      // ~2% of keys deliberately miss products_info: pidx == nProducts
      // maps to no product row and becomes the synthetic miss key below
      .withColumn("pidx",
        when(pmod(h(1), lit(50)) === 0, lit(nProducts))
          .otherwise(pmod(h(2), lit(nProducts))).cast("int"))
      .withColumn("customer_id",
        when(pmod(h(3), lit(40)) === 0, lit(null).cast("string"))
          .otherwise(lpad(
            (pmod(h(4), lit(nCustomers)) + 1).cast("string"), 5, "0")))
      .withColumn("purchase_date", date_format(
        date_add(to_date(lit("2014-01-01")),
          pmod(h(5), lit(730)).cast("int")), "yyyyMMdd"))
      .withColumn("purchase_time",
        lpad(pmod(h(6), lit(24)).cast("string"), 2, "0"))
      .withColumn("store_cd",
        lpad(pmod(h(7), lit(100)).cast("string"), 3, "0"))
      .withColumn("receipt_no", concat(lit("R"),
        lpad(col("id").cast("string"), 10, "0")))
      .withColumn("amount",
        round((pmod(h(8), lit(99000)) + 1000).cast(DoubleType) / 100.0 *
          when(pmod(h(9), lit(100)) === 0, 50.0).otherwise(1.0), 2))

    base.join(broadcast(prodIdx), Seq("pidx"), "left")
      .select(
        // misses get a composite key absent from products_info
        coalesce(col("affiliate"), lit("Z")).as("affiliate"),
        col("receipt_no"),
        coalesce(col("division_cd"), lit("99")).as("division_cd"),
        coalesce(col("main_category_cd"), lit("9999"))
          .as("main_category_cd"),
        coalesce(col("sub_category_cd"), lit("Z999999"))
          .as("sub_category_cd"),
        col("customer_id"), col("store_cd"),
        col("purchase_date"), col("purchase_time"), col("amount"))
      // T0's derived-at-ingest partition columns
      // (jb_de_enhancement_t0_fact_d2s.py:86-87)
      .withColumn("purchase_year", substring(col("purchase_date"), 1, 4))
      .withColumn("purchase_month", substring(col("purchase_date"), 5, 2))
  }

  /** customer ⟕ zipcode (T1's dimension enrich; the duplicated
    * short_zipcodes fan out — preserved, exactly as the reference). */
  def customerWithZipcode(cust: DataFrame, zip: DataFrame): DataFrame =
    cust.join(zip, cust("residence") === zip("short_zipcode"), "left")
      .drop(zip("short_zipcode"))

  /** T1 silver: purchase ⟕ products_info (4-col composite key) ⟕
    * (customer ⟕ zipcode), duplicate join keys dropped. */
  def silver(purchase: DataFrame, products: DataFrame,
      custZip: DataFrame): DataFrame = {
    // prefix the product side's columns before joining: the fact can
    // share attribute lineage with products_info (synthPurchase draws
    // its composite keys from it), and a drop-after-join on shared
    // attribute ids is ambiguous
    val prod = products.columns.foldLeft(products)((d, c) =>
      d.withColumnRenamed(c, s"pi_$c"))
    val withProduct = purchase.join(prod,
        purchase("affiliate") === col("pi_affiliate") &&
          purchase("division_cd") === col("pi_division_cd") &&
          purchase("main_category_cd") === col("pi_main_category_cd") &&
          purchase("sub_category_cd") === col("pi_sub_category_cd"),
        "left")
      .drop("pi_affiliate", "pi_division_cd", "pi_main_category_cd",
        "pi_sub_category_cd")
      .withColumnRenamed("pi_main_category_desc", "main_category_desc")
      .withColumnRenamed("pi_sub_category_desc", "sub_category_desc")
    withProduct.join(custZip,
        withProduct("customer_id") === custZip("customer_id"), "left")
      .drop(custZip("customer_id"))
  }

  private def amountAggs(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(
        round(sum(col("amount").cast("decimal(18,4)")).cast("double"), 2)
          .as("total_purchase_amount"),
        count(col("amount")).as("count_of_purchase"))

  /** The four T2 marts, keyed by the reference's mart names. */
  def marts(purchase: DataFrame, silverDf: DataFrame,
      custZip: DataFrame): Map[String, DataFrame] = Map(
    "mart_salesbydatetime" -> {
      val byTime = amountAggs(
        silverDf.withColumn("purchase_day",
          substring(col("purchase_date"), 7, 2)),
        Seq("affiliate", "purchase_year", "purchase_month",
          "purchase_day", "purchase_time"))
      byTime
        .withColumn("day_of_week", graft.functions.Udfs.dayOfWeekExpr(
          col("purchase_year"), col("purchase_month"), col("purchase_day")))
        .select(col("affiliate"), col("purchase_year"),
          col("purchase_month"), col("purchase_day"), col("day_of_week"),
          col("purchase_time"), col("total_purchase_amount"),
          col("count_of_purchase"))
    },
    "mart_salesbyageproducts" -> amountAggs(silverDf,
      Seq("affiliate", "purchase_year", "purchase_month", "age_group",
        "division_cd", "main_category_desc", "sub_category_desc")),
    "mart_salesbyresidence" -> amountAggs(silverDf,
      Seq("affiliate", "purchase_year", "purchase_month",
        "province_city", "city_county"))
      .sort(col("affiliate"), col("purchase_year"), col("purchase_month"),
        col("total_purchase_amount").desc, col("count_of_purchase").desc),
    // aggregates the RAW fact (not silver), THEN joins the enriched
    // customer dim — the reference's J4 aggregate-then-join
    "mart_salesbycustomer" -> {
      val perCust = amountAggs(purchase,
        Seq("customer_id", "affiliate", "purchase_year", "purchase_month"))
      perCust.join(custZip,
          perCust("customer_id") === custZip("customer_id"), "left")
        .drop(custZip("customer_id"))
    })

  /** The reference's MONTHLY INCREMENTAL job shape over its own
    * schema: re-ingest ONE month of the fact, dynamic-overwrite only
    * that month's bronze/silver/gold partitions, recompute the marts
    * for the window alone (their grouping keys all carry
    * year/month, so a window recompute IS the mart delta — the same
    * property Pipeline's incremental leg exploits). Reads back
    * through partition-pruned scans; untouched months are never
    * rewritten or read. Mirrors the reference's EventBridge monthly
    * re-run (document/eventbridge.md:12, stepfunction.json DAG).
    * Returns per-mart window row counts. */
  def runIncremental(spark: SparkSession, dataDir: String,
      warehouseDir: String, nPurchaseRows: Long,
      year: String, month: String): Map[String, Long] = {
    val window = col("purchase_year") === year &&
      col("purchase_month") === month
    val products = productsInfo(spark, dataDir)
    // T0: the month's slice of the (deterministic) fact — in the
    // reference this is the JDBC pushdown query's date window
    val purchase = synthPurchase(spark, products, nPurchaseRows)
      .where(window)
    // bronze month-overwrite overlaps the silver stage (see [[run]]);
    // the month's fact is recomputed with the read-back's inferred
    // partition types instead of waiting for write + pruned re-read
    implicit val ec: ExecutionContext = ExecutionContext.global
    val bronzeWrite = Future(Sinks.writePartitioned(purchase,
      s"$warehouseDir/bronze/purchase",
      Seq("affiliate", "purchase_year", "purchase_month")))

    val custZip = customerWithZipcode(
      customer(spark, dataDir), zipcode(spark, dataDir))
    val fact = inferPartTypes(purchase)
    val silverDf = silver(fact, products, custZip)
    Sinks.writePartitioned(silverDf,
      s"$warehouseDir/silver/purchase_all_info",
      Seq("affiliate", "purchase_year", "purchase_month"))
    Await.result(bronzeWrite, Duration.Inf)

    val silverBack = spark.read
      .parquet(s"$warehouseDir/silver/purchase_all_info")
      .where(window)
    // The four mart writes are independent outputs — run them as
    // parallel jobs (guide §2.6: back-fill the tail; same D1 fan-out
    // Pipeline.writeMarts has always used). Output files, rows, and
    // dirs are identical to the serial loop.
    Await.result(Future.sequence(
      marts(fact, silverBack, custZip).toSeq.map { case (name, df) =>
        Future {
          Sinks.writePartitioned(df, s"$warehouseDir/gold/$name",
            Seq("affiliate", "purchase_year", "purchase_month"))
          name -> df.count()
        }
      }), Duration.Inf).toMap
  }

  /** The LAKEHOUSE-TIER variant of the full DAG (VERDICT r9 #8): every
    * tier lands as a [[graft.format.GraftTable]] instead of raw
    * partition directories — bronze fact, silver purchase_all_info,
    * and the four gold marts each commit as ONE atomic snapshot with
    * zone-map stats on the month key. Same dataflow, same row counts;
    * what changes is the storage contract (manifests + snapshots +
    * time travel instead of directory listings), so benchmarking this
    * next to [[run]] tracks the format's write amplification at the
    * reference's full 28.6M-row volume. */
  def runLake(spark: SparkSession, dataDir: String, warehouseDir: String,
      nPurchaseRows: Long): Map[String, Long] = {
    import graft.format.GraftTable
    val products = productsInfo(spark, dataDir)
    val purchase = synthPurchase(spark, products, nPurchaseRows)
    val stats = Seq("purchase_year", "purchase_month")
    // RANGE-cluster every tier on the window key (numFiles = 0
    // preserves the clustering through writeData): per-file (year,
    // month) envelopes stay disjoint, so the monthly replaceWhere's
    // stats-pruned audit reads ONLY the window's files. A hash
    // repartition here spreads every month across every file and
    // turns each incremental into a full-table rewrite.
    def clustered(df: DataFrame, n: Int) = df.repartitionByRange(
      n, col("purchase_year"), col("purchase_month"))
    val bronze = GraftTable.openOrCreate(
      spark, s"$warehouseDir/bronze_purchase", stats)
    // bronze commit overlaps the silver stage (see [[run]]): the fact
    // is recomputed from the deterministic synth with the read-back's
    // partition-type cast — same multiset of rows as bronze.read()
    implicit val ec: ExecutionContext = ExecutionContext.global
    val bronzeWrite =
      Future(bronze.overwrite(clustered(purchase, 32), numFiles = 0))

    val custZip = customerWithZipcode(
      customer(spark, dataDir), zipcode(spark, dataDir))
    val fact = inferPartTypes(purchase)
    val silverDf = silver(fact, products, custZip)
    val silverT = GraftTable.openOrCreate(
      spark, s"$warehouseDir/silver_purchase_all_info", stats)
    silverT.overwrite(clustered(silverDf, 32), numFiles = 0)
    Await.result(bronzeWrite, Duration.Inf)

    val silverBack = silverT.read()
    // parallel mart fan-out (guide §2.6) — four independent tables,
    // each commit its own atomic snapshot; same rows either way
    Await.result(Future.sequence(
      marts(fact, silverBack, custZip).toSeq.map { case (name, df) =>
        Future {
          val t = GraftTable.openOrCreate(
            spark, s"$warehouseDir/gold_$name", stats)
          t.overwrite(clustered(df, 8), numFiles = 0)
          name -> t.read().count()
        }
      }), Duration.Inf).toMap
  }

  /** The directory pipeline reads its partition keys back through
    * hive-style partition-type INFERENCE ("08" → 8) — and that
    * inference is semantically load-bearing: the re-formatted month
    * feeds the weekday UDF exactly the malformed date the reference's
    * own jobs feed it (the pinned `"Invalid date format. Please"`
    * rows, `jb_de_enhancement_t2_salesbydatetime_s2s.py`). The lake
    * tier preserves written strings, so it applies the same cast
    * explicitly — byte-identical marts either way. */
  private def inferPartTypes(df: DataFrame): DataFrame = df
    .withColumn("purchase_year", col("purchase_year").cast("int"))
    .withColumn("purchase_month", col("purchase_month").cast("int"))

  /** Monthly incremental through the lakehouse tier: ONE month of the
    * fact is re-synthesized and [[graft.format.GraftTable
    * .replaceWhere]]'d into each tier — delete-the-window + insert in
    * one atomic snapshot per table, zone maps confining the COW audit
    * to the window's files. The format-native restatement of the
    * reference's dynamic partition overwrite
    * (`jb_de_enhancement_t0_fact_d2s.py:23`). */
  def runIncrementalLake(spark: SparkSession, dataDir: String,
      warehouseDir: String, nPurchaseRows: Long,
      year: String, month: String): Map[String, Long] = {
    import graft.format.GraftTable
    val window = col("purchase_year") === year &&
      col("purchase_month") === month
    val products = productsInfo(spark, dataDir)
    val purchase = synthPurchase(spark, products, nPurchaseRows)
      .where(window)
    val bronze = GraftTable
      .forPath(spark, s"$warehouseDir/bronze_purchase")
    // bronze month-replace overlaps the silver stage (see [[run]]);
    // the window's fact is recomputed with the read-back's partition
    // cast — the same rows the pruned re-read returns
    implicit val ec: ExecutionContext = ExecutionContext.global
    val bronzeWrite =
      Future(bronze.replaceWhere(window, purchase, numFiles = 8))

    val custZip = customerWithZipcode(
      customer(spark, dataDir), zipcode(spark, dataDir))
    val fact = inferPartTypes(purchase)
    val silverDf = silver(fact, products, custZip)
    val silverT = GraftTable
      .forPath(spark, s"$warehouseDir/silver_purchase_all_info")
    silverT.replaceWhere(window, silverDf, numFiles = 8)
    Await.result(bronzeWrite, Duration.Inf)

    val silverBack = silverT.prunedWhere(window)._1.where(window)
    // parallel mart fan-out (guide §2.6) — independent tables
    Await.result(Future.sequence(
      marts(fact, silverBack, custZip).toSeq.map { case (name, df) =>
        Future {
          val t = GraftTable.forPath(spark, s"$warehouseDir/gold_$name")
          t.replaceWhere(window, df, numFiles = 4)
          name -> df.count()
        }
      }), Duration.Inf).toMap
  }

  /** Full golden DAG into a warehouse dir: bronze fact (partitioned,
    * dynamic overwrite) → silver purchase_all_info → four gold marts,
    * each registered. Returns mart row counts. */
  def run(spark: SparkSession, dataDir: String, warehouseDir: String,
      nPurchaseRows: Long): Map[String, Long] = {
    implicit val ec: ExecutionContext = ExecutionContext.global
    val products = productsInfo(spark, dataDir)
    // The bronze write OVERLAPS the silver stage
    // (Pipeline.runPipelined's D1 shape): the fact is a deterministic
    // hash synthesis, so recomputing it for the silver join costs
    // what the bronze read-back did, while the 28.6M-row partitioned
    // write — 15 s of the leg's critical path in the job profile —
    // runs concurrently. (Measured and REJECTED: caching the synth —
    // 115 s vs 84–89 s — the columnar cache build + memory pressure
    // at 28.6M rows costs far more than the codegen'd hash
    // recompute.) inferPartTypes reproduces the read-back's
    // partition-type inference ("08" → 8), which is semantically
    // load-bearing for the weekday UDF (see [[inferPartTypes]]);
    // marts are byte-identical (RetailGoldenSpec pins them).
    val purchase = synthPurchase(spark, products, nPurchaseRows)
    val bronzeWrite = Future(Sinks.writePartitioned(purchase,
      s"$warehouseDir/bronze/purchase",
      Seq("affiliate", "purchase_year", "purchase_month")))

    val custZip = customerWithZipcode(
      customer(spark, dataDir), zipcode(spark, dataDir))
    val fact = inferPartTypes(purchase)
    val silverDf = silver(fact, products, custZip)
    Sinks.writePartitioned(silverDf,
      s"$warehouseDir/silver/purchase_all_info",
      Seq("affiliate", "purchase_year", "purchase_month"))
    Await.result(bronzeWrite, Duration.Inf)
    runGold(spark, warehouseDir, fact, custZip)
  }

  /** Gold tier of [[run]]: read silver back, write + register the four
    * marts (split out so [[run]]'s fact cache scopes cleanly). */
  private def runGold(spark: SparkSession, warehouseDir: String,
      fact: DataFrame, custZip: DataFrame): Map[String, Long] = {
    implicit val ec: ExecutionContext = ExecutionContext.global

    val silverBack =
      spark.read.parquet(s"$warehouseDir/silver/purchase_all_info")
    // The four mart writes are independent outputs — run them as
    // parallel jobs (guide §2.6; the D1 fan-out Pipeline.writeMarts
    // has always used). Registration stays serial afterwards: the
    // embedded metastore serializes DDL anyway, and registration must
    // see the finished directory.
    val written = Await.result(Future.sequence(
      marts(fact, silverBack, custZip).toSeq.map { case (name, df) =>
        Future {
          Sinks.writePartitioned(df, s"$warehouseDir/gold/$name",
            Seq("affiliate", "purchase_year", "purchase_month"))
          name -> spark.read.parquet(s"$warehouseDir/gold/$name").count()
        }
      }), Duration.Inf).toMap
    written.keys.foreach { name =>
      // persistent (crawler-equivalent) registration: any OTHER session
      // on the same metastore reads the mart by name, like the
      // reference's Glue-catalog marts feeding Athena (SURVEY §2.13)
      Sinks.registerPersistent(spark, name, s"$warehouseDir/gold/$name")
    }
    written
  }
}
