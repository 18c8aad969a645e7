package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.ScaleOps

/** Invariant specs for the q120–q124 scale-pattern pack. Each query
  * also hash-matches a DuckDB oracle; these pin the properties the
  * hash can't express — that the sketches/manifests PRUNE without
  * changing answers.
  */
class ScaleOpsSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  test("q120 bloom prefilter passes every true key (no false negatives) " +
      "and the result equals the plain semi-join") {
    val dim = Tables.load(spark, sfDir, "customer")
      .where($"c_mktsegment" === "BUILDING" && $"c_acctbal" > 7500)
      .select($"c_custkey")
    val keys = dim.as[Long].collect()
    val bloom = dim.stat.bloomFilter("c_custkey", math.max(keys.length, 1), 0.01)
    keys.foreach(k => assert(bloom.mightContain(k), s"bloom dropped true key $k"))

    val got = ScaleOps.q120BloomJoin(spark, sfDir).collect()
    val plain = Tables.load(spark, sfDir, "orders")
      .join(dim, $"o_custkey" === $"c_custkey", "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        round(sum($"o_totalprice".cast("decimal(18,4)")).cast("double"), 2)
          .as("revenue"))
      .orderBy($"o_orderpriority")
      .collect()
    assert(got.map(_.toSeq).toSeq === plain.map(_.toSeq).toSeq)
  }

  test("q121 CMS never underestimates, so the recount output equals the " +
      "plain group-having form") {
    val ev = Tables.load(spark, sfDir, "events")
    val total = ev.count()
    val threshold = math.max(1L, total / 250)
    val cms = ev.stat.countMinSketch(col("user_id"), 0.001, 0.999, 42)
    val exact = ev.groupBy($"user_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n"))
    exact.foreach { case (u, n) =>
      assert(cms.estimateCount(u) >= n,
        s"CMS underestimated user $u: ${cms.estimateCount(u)} < $n")
    }
    val got = ScaleOps.q121SketchHeavyHitters(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events")))
    val want = exact.filter(_._2 >= threshold)
      .sortBy { case (u, n) => (-n, u) }
    assert(got.toSeq === want.toSeq)
  }

  test("q122 folds match a driver-side recomputation in the same " +
      "fold order") {
    val rows = ScaleOps.q122ArrayFold(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val embById = Tables.load(spark, sfDir, "embeddings")
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding"))
      .toMap
    rows.take(10).foreach { r =>
      val v = embById(r.getAs[Long]("vec_id"))
      val l1 = v.foldLeft(0.0)((a, x) => a + math.abs(x).toDouble)
      val l2 = v.foldLeft(0.0)((a, x) => a + (x * x).toDouble)
      assert(r.getAs[Double]("l1") === l1, "l1 fold differs")
      assert(r.getAs[Double]("l2sq") === l2, "l2sq fold differs")
      assert(r.getAs[Long]("n_pos") === v.count(_ > 0f).toLong)
      val top3 = v.sorted(Ordering[Float].reverse).take(3)
        .foldLeft(0.0)((a, x) => a + x.toDouble)
      assert(r.getAs[Double]("top3_sum") === top3, "top3 differs")
    }
  }

  test("q123 merged partial states are bit-identical to the full " +
      "recompute") {
    val got = ScaleOps.q123IncrementalAgg(spark, sfDir).collect()
    val ord = Tables.load(spark, sfDir, "orders")
    val full = ord
      .groupBy(year($"o_orderdate").as("o_year"), $"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        round(sum($"o_totalprice".cast("decimal(18,4)")).cast("double"), 2)
          .as("revenue"),
        round(sum($"o_totalprice".cast("decimal(18,4)")).cast("double") /
          count(lit(1)), 6).as("avg_price"),
        min($"o_orderdate").as("first_order"),
        max($"o_orderdate").as("last_order"))
      .orderBy($"o_year", $"o_orderpriority")
      .select("o_year", "o_orderpriority", "n_orders", "revenue",
        "avg_price", "first_order", "last_order")
      .collect()
    assert(got.map(_.toSeq).toSeq === full.map(_.toSeq).toSeq)
    // Both halves are non-empty, so the merge genuinely merged.
    assert(ord.where($"o_orderdate" < "1996-01-01").count() > 0)
    assert(ord.where($"o_orderdate" >= "1996-01-01").count() > 0)
  }

  test("q125 one-pass skyline equals the brute-force dominance filter") {
    val got = ScaleOps.q125Skyline(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("p_partkey"), r.getAs[Double]("p_retailprice"),
        r.getAs[Int]("p_size")))
    val pts = Tables.load(spark, sfDir, "part")
      .select($"p_partkey", $"p_retailprice", $"p_size").collect()
      .map(r => (r.getAs[Long]("p_partkey"), r.getAs[Double]("p_retailprice"),
        r.getAs[Int]("p_size")))
    val brute = pts.filter { case (_, bp, bs) =>
      !pts.exists { case (_, ap, as_) =>
        ap <= bp && as_ >= bs && (ap < bp || as_ > bs)
      }
    }.sortBy { case (k, p, _) => (p, k) }
    assert(got.toSeq === brute.toSeq)
    assert(got.nonEmpty)
    // Frontier is strictly monotone: as price rises, size strictly rises.
    got.sliding(2).foreach {
      case Array((_, p1, s1), (_, p2, s2)) =>
        if (p1 < p2) assert(s2 > s1, "non-dominated point out of order")
      case _ =>
    }
  }

  test("q126 RFM quintiles balance to the customer count and the " +
      "rollup preserves total monetary") {
    val seg = ScaleOps.q126Rfm(spark, sfDir).collect()
    val nCust = Tables.load(spark, sfDir, "orders")
      .select($"o_custkey").distinct().count()
    assert(seg.map(_.getAs[Long]("n_customers")).sum === nCust)
    seg.foreach { r =>
      assert(r.getAs[Int]("r_q") >= 1 && r.getAs[Int]("r_q") <= 5)
      assert(r.getAs[Int]("f_q") >= 1 && r.getAs[Int]("f_q") <= 5)
      assert(r.getAs[Int]("m_q") >= 1 && r.getAs[Int]("m_q") <= 5)
    }
    // Each NTILE axis splits customers into near-equal buckets
    // (sizes differ by at most 1).
    Seq("r_q", "f_q", "m_q").foreach { axis =>
      val sizes = seg.groupBy(_.getAs[Int](axis)).view
        .mapValues(_.map(_.getAs[Long]("n_customers")).sum).values.toSeq
      assert(sizes.max - sizes.min <= 1, s"$axis buckets unbalanced: $sizes")
    }
  }

  test("q127 pair counts are calendar-bounded and the median slope " +
      "matches a driver-side Theil-Sen fit") {
    val got = ScaleOps.q127TheilSen(spark, sfDir).collect()
    assert(got.nonEmpty)
    // Recompute one region's slopes brute-force from the monthly series.
    val monthly = Tables.load(spark, sfDir, "orders")
      .join(Tables.load(spark, sfDir, "customer"),
        $"o_custkey" === $"c_custkey")
      .join(Tables.load(spark, sfDir, "nation"),
        $"c_nationkey" === $"n_nationkey")
      .join(Tables.load(spark, sfDir, "region"),
        $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name",
        (year($"o_orderdate") * 12 + month($"o_orderdate")).as("m"))
      .agg(sum($"o_totalprice".cast("decimal(18,4)")).cast("double").as("y"))
      .collect()
      .groupBy(_.getAs[String]("r_name"))
    got.foreach { r =>
      val series = monthly(r.getAs[String]("r_name"))
        .map(x => (x.getAs[Int]("m"), x.getAs[Double]("y"))).sortBy(_._1)
      val n = series.length.toLong
      assert(r.getAs[Long]("n_pairs") === n * (n - 1) / 2)
      val slopes = (for {
        i <- series.indices; j <- (i + 1) until series.length
      } yield (series(j)._2 - series(i)._2) /
        (series(j)._1 - series(i)._1).toDouble).sorted
      val k = slopes.length
      val med =
        if (k % 2 == 1) slopes(k / 2)
        else slopes(k / 2 - 1) + (slopes(k / 2) - slopes(k / 2 - 1)) * 0.5
      assert(math.abs(r.getAs[Double]("theil_sen_slope") -
        math.rint(med * 1e6) / 1e6) < 1e-9)
    }
  }

  test("q128 checksum is order-independent and detects a one-row " +
      "perturbation") {
    val base = ScaleOps.q128TableChecksum(spark, sfDir).collect()
      .map(r => (r.getAs[String]("c_mktsegment"), r.getAs[String]("sum_hash"),
        r.getAs[Long]("xor_hash"))).toSeq
    // Same rows, shuffled into a different partitioning -> same checksums.
    val shuffled = Tables.load(spark, sfDir, "customer")
      .repartition(13, $"c_name")
    val reHash = conv(substring(md5(concat_ws("|",
        coalesce($"c_custkey".cast("string"), lit("∅")),
        coalesce($"c_name", lit("∅")),
        coalesce($"c_nationkey".cast("string"), lit("∅")),
        coalesce($"c_mktsegment", lit("∅")))), 1, 15), 16, 10).cast("long")
    val again = shuffled.withColumn("h", reHash)
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_rows"),
        sum($"h".cast("decimal(38,0)")).cast("string").as("sum_hash"),
        expr("bit_xor(h)").as("xor_hash"))
      .orderBy($"c_mktsegment").collect()
      .map(r => (r.getAs[String]("c_mktsegment"), r.getAs[String]("sum_hash"),
        r.getAs[Long]("xor_hash"))).toSeq
    assert(base === again)
    // Perturb one row's name -> that segment's sum and xor both move.
    val perturbed = Tables.load(spark, sfDir, "customer")
      .withColumn("c_name", when($"c_custkey" === 1L,
        concat($"c_name", lit("X"))).otherwise($"c_name"))
      .withColumn("h", reHash)
      .groupBy($"c_mktsegment")
      .agg(sum($"h".cast("decimal(38,0)")).cast("string").as("sum_hash"),
        expr("bit_xor(h)").as("xor_hash"))
      .collect()
      .map(r => r.getAs[String]("c_mktsegment") ->
        (r.getAs[String]("sum_hash"), r.getAs[Long]("xor_hash"))).toMap
    val seg1 = Tables.load(spark, sfDir, "customer")
      .where($"c_custkey" === 1L).select($"c_mktsegment")
      .collect().head.getString(0)
    val (origSum, origXor) = base.collect {
      case (s, sh, xh) if s == seg1 => (sh, xh)
    }.head
    assert(perturbed(seg1)._1 !== origSum)
    assert(perturbed(seg1)._2 !== origXor)
  }

  test("q129 scan reads only the touched nested leaves and pushes the " +
      "nested predicate") {
    val df = ScaleOps.q129NestedPruning(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val scan = df.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("FileScan")).mkString("\n")
    assert(scan.contains(
      "ReadSchema: struct<actor:struct<event_type:string>," +
        "payload:struct<value:double>>"),
      s"nested schema not pruned to the two leaves:\n$scan")
    assert(!scan.contains("props"), "untouched props leaf read from file")
    assert(scan.contains("PushedFilters: [IsNotNull(actor.event_type)"),
      s"nested predicate not pushed to parquet:\n$scan")
    // Equal to the flat-table aggregate.
    val flat = Tables.load(spark, sfDir, "events")
      .where($"event_type".isNotNull && $"event_type" =!= "purchase")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        round(sum($"value".cast("decimal(18,4)")).cast("double"), 2)
          .as("sum_value"))
      .orderBy($"event_type").collect()
    assert(rows.map(_.toSeq).toSeq === flat.map(_.toSeq).toSeq)
  }

  test("q124 manifest prune skips files yet the result equals the " +
      "plain filtered aggregate") {
    val (nFiles, nPicked) = ScaleOps.zonemapPruneStats(spark, sfDir)
    assert(nFiles > 1, "clustered write produced a single file")
    assert(nPicked < nFiles,
      s"zone map pruned nothing: $nPicked of $nFiles files picked")
    assert(nPicked > 0, "probe window overlaps no file")

    val got = ScaleOps.q124ZonemapSkipping(spark, sfDir).collect()
    val plain = Tables.load(spark, sfDir, "lineitem")
      .where($"l_shipdate".between("1995-06-01", "1995-08-31"))
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_rows"),
        round(sum($"l_extendedprice".cast("decimal(18,4)")).cast("double"), 2)
          .as("revenue"),
        round(sum($"l_quantity".cast("decimal(18,4)")).cast("double"), 2)
          .as("sum_qty"))
      .orderBy($"l_returnflag")
      .collect()
    assert(got.map(_.toSeq).toSeq === plain.map(_.toSeq).toSeq)
  }

  test("q181 ORC round-trip loses no row, column, or value") {
    val rows = graft.operators.ScaleOps.q181OrcRoundtrip(spark, sfDir)
      .collect()
    assert(rows.map(_.getAs[String]("table")).toSeq ===
      Seq("documents", "orders"))
    // Scratch.dir is stable within the session: inspect what was staged
    val orcBase = graft.Scratch.dir(spark, "orc")
    for ((name, audited) <- Seq("documents", "orders").zip(rows)) {
      val back = spark.read.orc(s"$orcBase/$name")
      val src = graft.Tables.load(spark, sfDir, name)
      assert(back.schema.fields.map(f => f.name -> f.dataType).toSeq ===
        src.schema.fields.map(f => f.name -> f.dataType).toSeq,
        s"$name: ORC must preserve names and types")
      assert(back.exceptAll(src).count() === 0)
      assert(src.exceptAll(back).count() === 0)
      assert(audited.getAs[Long]("n_rows") === src.count())
    }
  }

  test("q182 JSON round-trip preserves rows, timestamps, and doubles") {
    val rows = graft.operators.ScaleOps.q182JsonRoundtrip(spark, sfDir)
      .collect()
    assert(rows.map(_.getAs[String]("table")).toSeq ===
      Seq("documents", "events"))
    val jsonBase = graft.Scratch.dir(spark, "json")
    val tsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    for ((name, audited) <- Seq("documents", "events").zip(rows)) {
      val src = graft.Tables.load(spark, sfDir, name)
      val back = spark.read.schema(src.schema)
        .option("timestampFormat", tsFmt).json(s"$jsonBase/$name")
      assert(back.schema.fields.map(f => f.name -> f.dataType).toSeq ===
        src.schema.fields.map(f => f.name -> f.dataType).toSeq,
        s"$name: declared-schema JSON read must preserve names and types")
      assert(back.exceptAll(src).count() === 0, s"$name: rows mutated")
      assert(src.exceptAll(back).count() === 0, s"$name: rows lost")
      assert(audited.getAs[Long]("n_rows") === src.count())
    }
  }

  test("q185 mergeSchema read unions writer generations without loss") {
    graft.operators.ScaleOps.q185SchemaEvolution(spark, sfDir).count()
    val evo = graft.Scratch.dir(spark, "evo")
    val merged = spark.read.option("mergeSchema", "true").parquet(evo)
    val src = graft.Tables.load(spark, sfDir, "documents")
    // union schema: lang present (from the new writer), batch discovered
    assert(merged.columns.toSet ===
      Set("doc_id", "text", "lang", "source", "n_chars", "batch"))
    assert(merged.count() === src.count())
    // lang is NULL exactly on the old-writer rows
    assert(merged.where($"batch" === "old" && $"lang".isNotNull).count() === 0)
    assert(merged.where($"batch" === "new" && $"lang".isNull).count() ===
      src.where($"doc_id" % 2 === 1 && $"lang".isNull).count())
  }

  test("q187 type conflict: mergeSchema refuses, resolveChoice recovers " +
      "every row and value") {
    val out = graft.operators.ScaleOps.q187ResolveChoice(spark, sfDir)
    val src = graft.Tables.load(spark, sfDir, "events")
    assert(out.agg(sum($"n_events")).head.getLong(0) === src.count())
    // the conflicting-leaf read is NOT silently coerced — it throws
    val choice = graft.Scratch.dir(spark, "choice")
    val ex = intercept[Exception] {
      spark.read.option("mergeSchema", "true").parquet(choice).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("merg") ||
      ex.getMessage.toLowerCase.contains("schema"),
      s"expected a schema-merge failure, got: ${ex.getMessage.take(200)}")
    // doubles round-trip the string generation exactly
    val mills = src.agg(sum(floor($"value" * 1000))).head.getLong(0)
    assert(out.agg(sum($"sum_mills")).head.getLong(0) === mills)
  }
}
