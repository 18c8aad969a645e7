package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Stats

/** Invariant specs for the q90–q95 statistical analytics pack (each
  * also has a DuckDB oracle; these pin the semantic properties the
  * hash check can't express).
  */
class StatsSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  test("q90 point-in-time state is never from the future and matches " +
      "a brute-force interval lookup") {
    val got = Stats.q90PointInTime(spark, sfDir)
    val rows = got.collect()
    assert(rows.nonEmpty)
    rows.filter(_.getAs[String]("state") != null).foreach { r =>
      assert(r.getAs[String]("state_since") <= r.getAs[String]("purchase_ts"))
      assert(r.getAs[Long]("secs_in_state") >= 0L)
    }
    // Brute force: for each purchase, the latest earlier-or-equal
    // non-purchase event's type must equal the SCD2 state.
    val ev = Tables.load(spark, sfDir, "events")
    val st = ev.where($"event_type" =!= "purchase")
      .select($"user_id".as("u"), $"ts".as("sts"), $"event_type".as("stype"))
    val probes = ev.where($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val brute = probes.join(st, probes("user_id") === st("u") &&
        st("sts") <= probes("ts"), "left")
      .groupBy($"event_id")
      .agg(max_by($"stype", $"sts").as("bstate"))
    val cmp = got.select($"event_id", $"state")
      .join(brute, Seq("event_id"), "left").collect()
    cmp.foreach { r =>
      assert(r.getAs[String]("state") === r.getAs[String]("bstate"))
    }
  }

  test("q91 transition probabilities are positive and sum to 1 per " +
      "from-state") {
    val rows = Stats.q91MarkovTransitions(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Double]("p") > 0.0))
    rows.groupBy(_.getAs[String]("from_type")).foreach { case (_, g) =>
      val s = g.map(_.getAs[Double]("p")).sum
      assert(math.abs(s - 1.0) < 1e-4, s"probabilities sum to $s")
    }
  }

  test("q92 z-scores standardize to mean ~0 and flag only |z|>2") {
    val rows = Stats.q92ZscoreAnomaly(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Int]("region")).foreach { case (_, g) =>
      val zs = g.flatMap(r => Option(r.getAs[java.lang.Double]("z")))
        .map(_.doubleValue)
      if (zs.nonEmpty) {
        assert(math.abs(zs.sum / zs.size) < 1e-3, "z-scores center on 0")
      }
    }
    rows.foreach { r =>
      Option(r.getAs[java.lang.Boolean]("is_anomaly")).foreach { a =>
        val z = r.getAs[java.lang.Double]("z").doubleValue
        assert(a.booleanValue === (math.abs(z) > 2.0))
      }
    }
  }

  test("q93 chi-square expected counts preserve the marginals") {
    val rows = Stats.q93Chi2Contingency(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val grand = rows.map(_.getAs[Long]("observed")).sum
    // Sum of expected == grand total (up to rounding of each cell).
    val expSum = rows.map(_.getAs[Double]("expected")).sum
    assert(math.abs(expSum - grand) < 0.01 * rows.length)
    rows.foreach(r => assert(r.getAs[Double]("chi2_contrib") >= 0.0))
  }

  test("q94 co-purchase pairs are ordered, counted, and bounded by " +
      "order count") {
    val nOrders = Tables.load(spark, sfDir, "lineitem")
      .select($"l_orderkey").distinct().count()
    val rows = Stats.q94CopurchasePairs(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    rows.foreach { r =>
      assert(r.getAs[Long]("p1") < r.getAs[Long]("p2"))
      assert(r.getAs[Long]("n_orders") >= 1L &&
        r.getAs[Long]("n_orders") <= nOrders)
    }
    // Descending by count under the declared tiebreak.
    val ns = rows.map(_.getAs[Long]("n_orders")).toSeq
    assert(ns === ns.sorted.reverse)
  }

  test("q98 winsorized mean lies within the clip bounds and clips " +
      "about 5% on each side") {
    val rows = Stats.q98Winsorize(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p05, p95) = (r.getAs[Double]("p05"), r.getAs[Double]("p95"))
      val m = r.getAs[Double]("winsorized_mean")
      assert(p05 <= m && m <= p95, s"mean $m outside [$p05,$p95]")
      val n = r.getAs[Long]("n_customers").toDouble
      assert(r.getAs[Long]("n_clipped_low") <= math.ceil(n * 0.06) + 1)
      assert(r.getAs[Long]("n_clipped_high") <= math.ceil(n * 0.06) + 1)
    }
  }

  test("q99 time-weighted average is bounded by the user's raw value " +
      "range and durations are positive") {
    val rows = Stats.q99TimeWeighted(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val bounds = Tables.load(spark, sfDir, "events")
      .groupBy($"user_id")
      .agg(min($"value").as("lo"), max($"value").as("hi"))
    val joined = Stats.q99TimeWeighted(spark, sfDir)
      .join(bounds, Seq("user_id")).collect()
    joined.foreach { r =>
      assert(r.getAs[Long]("total_secs") > 0L)
      val twa = r.getAs[Double]("twa_value")
      assert(twa >= r.getAs[Double]("lo") - 1e-4 &&
        twa <= r.getAs[Double]("hi") + 1e-4)
    }
  }

  test("q100 regression recovers an exact line from synthetic points " +
      "and fits the real monthly series sanely") {
    val rows = Stats.q100GroupedRegression(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_months") > 2L)
      assert(!r.getAs[Double]("slope").isNaN)
      assert(!r.getAs[Double]("intercept").isNaN)
    }
    // Exactness probe: residual of the fit on a perfectly linear
    // synthetic series must be ~0 (slope=2.5, intercept=-10).
    val pts = (1 to 20).map(i => (1L, i, 2.5 * i - 10.0))
      .toDF("region", "month_idx", "revenue")
    val x = $"month_idx".cast("decimal(18,4)")
    val y = $"revenue".cast("decimal(19,4)")
    val m = pts.groupBy($"region").agg(
      count(lit(1)).as("n"), sum(x).as("sx"), sum(y).as("sy"),
      sum(x * y).as("sxy"), sum(x * x).as("sxx"))
      .select($"n", $"sx".cast("double").as("sxd"),
        $"sy".cast("double").as("syd"),
        $"sxy".cast("double").as("sxyd"),
        $"sxx".cast("double").as("sxxd"))
      .withColumn("slope",
        ($"n" * $"sxyd" - $"sxd" * $"syd") /
          ($"n" * $"sxxd" - $"sxd" * $"sxd"))
      .collect().head
    assert(math.abs(m.getAs[Double]("slope") - 2.5) < 1e-9)
  }

  test("q95 trailing 7-day distinct is >= the single-day distinct and " +
      "monotone vs a widening prefix") {
    val daily = Tables.load(spark, sfDir, "events")
      .groupBy(to_date($"ts").as("d"))
      .agg(countDistinct($"user_id").as("n1"))
      .select(date_format($"d", "yyyy-MM-dd").as("day"), $"n1")
    val rolling = Stats.q95RollingDistinct(spark, sfDir)
    val joined = rolling.join(daily, Seq("day"), "left").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val n7 = r.getAs[Long]("n_users_7d")
      Option(r.getAs[java.lang.Long]("n1")).foreach { n1 =>
        assert(n7 >= n1.longValue)
      }
    }
  }

  test("q106 item-item cosine is in (0,1], bounded by the smaller " +
      "degree, and recomputes from its own counts") {
    val rows = Stats.q106ItemSimilarity(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    rows.foreach { r =>
      val (nCo, d1, d2) = (r.getAs[Long]("n_co"), r.getAs[Long]("d1"),
        r.getAs[Long]("d2"))
      assert(nCo >= 2 && nCo <= math.min(d1, d2))
      val c = r.getAs[Double]("cosine")
      assert(c > 0.0 && c <= 1.0)
      val expect = BigDecimal(nCo.toDouble / math.sqrt((d1 * d2).toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(c - expect) < 1e-9)
    }
  }

  test("q107 triples obey Apriori anti-monotonicity against the q94 " +
      "pair counts") {
    val triples = Stats.q107FrequentTriples(spark, sfDir).collect()
    assert(triples.nonEmpty)
    val items = Tables.load(spark, sfDir, "lineitem")
      .select($"l_orderkey", $"l_partkey").distinct()
    val pairCount = items.as("a").join(items.as("b"),
        $"a.l_orderkey" === $"b.l_orderkey" &&
          $"a.l_partkey" < $"b.l_partkey")
      .groupBy($"a.l_partkey".as("p1"), $"b.l_partkey".as("p2"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("n")).toMap
    triples.foreach { r =>
      val (p1, p2, p3, n) = (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getAs[Long]("n_orders"))
      assert(n >= 2)
      Seq((p1, p2), (p1, p3), (p2, p3)).foreach { pr =>
        assert(pairCount.getOrElse(pr, 0L) >= n,
          s"pair $pr count < triple count $n")
      }
    }
  }

  test("q108 MAD screen: anomalies bounded by customers, mad >= 0, " +
      "and the median matches a recomputation") {
    val got = Stats.q108MadAnomaly(spark, sfDir).collect()
    assert(got.nonEmpty)
    val med = Tables.load(spark, sfDir, "orders")
      .join(Tables.load(spark, sfDir, "customer"),
        $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment", $"c_custkey")
      .agg(sum($"o_totalprice".cast("decimal(18,4)")).cast("double")
        .as("spend"))
      .groupBy($"c_mktsegment")
      .agg(expr("percentile(spend, 0.5D)").as("m")).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("m")).toMap
    got.foreach { r =>
      val seg = r.getAs[String]("c_mktsegment")
      assert(r.getAs[Long]("n_anomalies") <= r.getAs[Long]("n_customers"))
      assert(r.getAs[Double]("mad") >= 0.0)
      assert(math.abs(r.getAs[Double]("median_spend") -
        BigDecimal(med(seg)).setScale(4, BigDecimal.RoundingMode.HALF_UP)
          .toDouble) < 1e-9)
    }
  }

  test("q111 interval stats: median and mean inside [min,max], and " +
      "interval count = orders minus repeat customers per segment") {
    val got = Stats.q111PurchaseIntervals(spark, sfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (lo, hi) = (r.getAs[Int]("min_days"), r.getAs[Int]("max_days"))
      assert(lo <= hi)
      assert(r.getAs[Double]("mean_days") >= lo &&
        r.getAs[Double]("mean_days") <= hi)
      assert(r.getAs[Double]("median_days") >= lo &&
        r.getAs[Double]("median_days") <= hi)
    }
    val expect = Tables.load(spark, sfDir, "orders")
      .join(Tables.load(spark, sfDir, "customer"),
        $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg((count(lit(1)) - countDistinct($"o_custkey")).as("n")).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    got.foreach { r =>
      assert(r.getAs[Long]("n_intervals") ===
        expect(r.getAs[String]("c_mktsegment")))
    }
  }

  test("q116 drift: CDFs monotone in [0,1] along a nondecreasing " +
      "boundary grid, gap consistent with the two CDFs") {
    val rows = Stats.q116DistributionDrift(spark, sfDir).collect()
      .sortBy(_.getAs[Int]("decile"))
    assert(rows.length === 9)
    var (pb, p1, p2) = (Double.MinValue, 0.0, 0.0)
    rows.foreach { r =>
      val (b, c1, c2) = (r.getAs[Double]("boundary"),
        r.getAs[Double]("cdf_1995"), r.getAs[Double]("cdf_1996"))
      assert(b >= pb); pb = b
      assert(c1 >= p1 - 1e-9 && c1 >= 0.0 && c1 <= 1.0); p1 = c1
      assert(c2 >= p2 - 1e-9 && c2 >= 0.0 && c2 <= 1.0); p2 = c2
      assert(math.abs(r.getAs[Double]("cdf_gap") -
        math.abs(c1 - c2)) < 2e-6)
    }
  }

  test("q117 Lorenz curve is convex to the diagonal, cum_share ends " +
      "at 1, and the Gini matches a driver-side recomputation") {
    val rows = Stats.q117LorenzGini(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("decile"))
    assert(rows.length === 10)
    val shares = rows.map(_.getAs[Double]("cum_share"))
    assert(shares.zip(shares.tail).forall { case (a, b) => a < b })
    assert(math.abs(shares.last - 1.0) < 1e-6)
    // Lorenz: cumulative share of the k-th decile never exceeds k/10
    shares.zipWithIndex.foreach { case (sh, k) =>
      assert(sh <= (k + 1) / 10.0 + 1e-9)
    }
    val gini = rows.head.getAs[Double]("gini")
    assert(rows.forall(_.getAs[Double]("gini") === gini))
    // brute-force Gini over the sorted spend vector
    import spark.implicits._
    val xs = Tables.load(spark, sfDir, "orders")
      .groupBy($"o_custkey")
      .agg(sum($"o_totalprice".cast("decimal(18,2)")).as("x"))
      .orderBy($"x".asc, $"o_custkey".asc)
      .select($"x".cast("double")).collect().map(_.getDouble(0))
    val n = xs.length.toLong
    val sx = xs.sum
    val sxi = xs.zipWithIndex.map { case (x, i) => x * (i + 1) }.sum
    val brute = 2.0 * sxi / (n * sx) - (n + 1.0) / n
    assert(math.abs(gini - brute) < 1e-6)
    assert(gini > 0.0 && gini < 1.0)
  }

  test("q118 CUPED preserves the pooled mean and theta matches a " +
      "driver-side covariance fit") {
    val rows = Stats.q118Cuped(spark, sfDir).collect()
    assert(rows.length === 2)
    val th = rows.head.getAs[Double]("theta")
    assert(rows.forall(_.getAs[Double]("theta") === th))
    // the adjustment is mean-zero over the pooled population:
    // Σ n_arm·mean_adj == Σ n_arm·mean_raw
    def pooled(c: String): Double = rows.map(r =>
      r.getAs[Long]("n_users") * r.getAs[Double](c)).sum
    assert(math.abs(pooled("mean_y_cuped") - pooled("mean_y")) <
      rows.map(_.getAs[Long]("n_users")).sum * 2e-6)
    // driver-side theta: cov(x,y)/var(x) over per-user 15-day sums
    import spark.implicits._
    val ev = Tables.load(spark, sfDir, "events")
    val cutD = java.time.LocalDate.parse(
      ev.agg(date_format(date_add(to_date(min($"ts")), 15), "yyyy-MM-dd"))
        .head().getString(0))
    val xs = ev.select($"user_id", to_date($"ts").as("d"),
        $"value".cast("decimal(18,4)").as("v"))
      .groupBy($"user_id")
      .agg(
        coalesce(sum(when($"d" < lit(java.sql.Date.valueOf(cutD)), $"v")),
          lit(0).cast("decimal(28,4)")).cast("double").as("x"),
        coalesce(sum(when($"d" >= lit(java.sql.Date.valueOf(cutD)), $"v")),
          lit(0).cast("decimal(28,4)")).cast("double").as("y"))
      .collect().map(r => (r.getAs[Double]("x"), r.getAs[Double]("y")))
    val n = xs.length
    val (mx, my) = (xs.map(_._1).sum / n, xs.map(_._2).sum / n)
    val cov = xs.map { case (x, y) => (x - mx) * (y - my) }.sum / n
    val vx = xs.map { case (x, _) => (x - mx) * (x - mx) }.sum / n
    assert(math.abs(th - cov / vx) < 1e-4, s"theta $th vs ${cov / vx}")
  }

  test("q155 KM retention: survival is monotone non-increasing and the " +
      "whole curve matches a driver-side product-limit recomputation") {
    val GapUs = 30L * 60L * 1000000L
    val MinuteUs = 60L * 1000000L
    val got = Stats.q155KmRetention(spark, sfDir).collect()
    assert(got.nonEmpty, "curve must have rows on the testdata")
    // survival strictly positive (terminal d=n step excluded by design)
    // and monotone non-increasing along minutes
    got.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("minute") < b.getAs[Long]("minute"))
        assert(b.getAs[Double]("survival") <=
          a.getAs[Double]("survival") + 1e-12)
      case _ =>
    }
    got.foreach(r => assert(r.getAs[Double]("survival") > 0.0))

    // Driver-side recomputation from raw events (independent of every
    // Spark window/aggregate in the operator).
    val ev = Tables.load(spark, sfDir, "events")
      .select($"user_id", unix_micros($"ts").as("eu"), $"event_id")
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("eu"),
        r.getAs[Long]("event_id")))
    val endUs = ev.map(_._2).max
    val sessions = ev.groupBy(_._1).values.flatMap { rows =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      val sess = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var st, en = sorted.head._2
      sorted.tail.foreach { case (_, eu, _) =>
        if (eu - en > GapUs) { sess += ((st, en)); st = eu }
        en = eu
      }
      sess += ((st, en))
      sess
    }.toSeq
    val life = sessions
      .map { case (st, en) =>
        (Math.floorDiv(en - st, MinuteUs),
          if (en <= endUs - GapUs) 1L else 0L)
      }
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (m, xs) => (m, xs.size.toLong, xs.map(_._2).sum) }
    // suffix-sum risk sets, then the product-limit curve with the
    // operator's integer nano-nat log floor
    val suffix = life.map(_._2).scanRight(0L)(_ + _).init
    var cumNn = 0L
    val want = life.zip(suffix).flatMap { case ((m, leaving, died), risk) =>
      if (died > 0 && died < risk) {
        cumNn += math.floor(
          math.log(1.0 - died.toDouble / risk.toDouble) * 1e9).toLong
        Some((m, risk, died, leaving,
          BigDecimal(math.exp(cumNn / 1e9))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      } else None
    }
    val gotTuples = got.map(r => (r.getAs[Long]("minute"),
      r.getAs[Long]("n_at_risk"), r.getAs[Long]("n_died"),
      r.getAs[Long]("n_leaving"), r.getAs[Double]("survival"))).toSeq
    assert(gotTuples === want,
      s"KM curve mismatch:\n got=${gotTuples.take(5)}\nwant=${want.take(5)}")
  }
}
