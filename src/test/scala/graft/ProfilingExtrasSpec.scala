package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Analytics, Dedup, Profiling, Similarity, TextQueries}

/** Invariant specs for the q68–q75 profiling / OLAP-extras surface
  * (each also has a DuckDB oracle; these pin the properties the hash
  * compare can't express as clearly).
  */
class ProfilingExtrasSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  private lazy val nOrders =
    Tables.load(spark, sfDir, "orders").count()

  test("q68 profiles all six columns against the table's row count") {
    val rows = Profiling.q68ColumnProfile(spark, sfDir).collect()
    assert(rows.length === 6)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") === nOrders)
      assert(r.getAs[Long]("n_nulls") === 0L)
      assert(r.getAs[Long]("n_distinct") > 0L)
      assert(r.getAs[String]("min_value") <= r.getAs[String]("max_value")
        || r.getAs[String]("column_name") == "o_totalprice") // numeric-as-string
    }
    val byCol = rows.map(r => r.getAs[String]("column_name") ->
      r.getAs[Long]("n_distinct")).toMap
    assert(byCol("o_orderkey") === nOrders, "PK distinct = row count")
    assert(byCol("o_orderstatus") <= 3L)
  }

  test("q69 pairs stay within their (brand,size) block and threshold") {
    // sf0.001's part table is too small for (brand,size) collisions —
    // use the oracle scale, where blocking yields a real pair set
    val pairs =
      Dedup.q69EditDistancePairs(spark, "/root/testdata/sf0.01").collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(r.getAs[Long]("a_key") < r.getAs[Long]("b_key"))
      assert(r.getAs[Int]("edit_dist") <= Dedup.EditDistMax)
    }
    // exact-name duplicates (edit_dist 0) are legitimate finds
    assert(pairs.exists(_.getAs[Int]("edit_dist") > 0),
      "blocking should also surface non-identical near-dups")
  }

  test("q70 centroids cover label x dim with consistent counts") {
    val rows = Similarity.q70EmbeddingCentroids(spark, sfDir).collect()
    val dims = rows.map(_.getAs[Int]("dim")).distinct
    val labels = rows.map(_.getAs[Int]("label")).distinct
    assert(rows.length === dims.length * labels.length)
    // every (label, dim) cell counts the same vectors as its label
    rows.groupBy(_.getAs[Int]("label")).foreach { case (_, g) =>
      assert(g.map(_.getAs[Long]("n_vecs")).distinct.length === 1)
    }
    assert(rows.forall(r => math.abs(r.getAs[Double]("centroid")) <= 1.0))
  }

  test("q71 unpivot emits one row per (flag, measure) cell") {
    val rows = Analytics.q71Unpivot(spark, sfDir).collect()
    val flags = rows.map(_.getAs[String]("l_returnflag")).distinct
    assert(rows.length === flags.length * 3)
    val measures = rows.map(_.getAs[String]("measure")).distinct.sorted
    assert(measures === Array("n_rows", "sum_price", "sum_qty"))
  }

  test("q72 collocations are ranked 1..50 with positive lift") {
    val rows = TextQueries.q72Collocations(spark, sfDir).collect()
    assert(rows.length === TextQueries.CollocTopK)
    assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq === (1 to 50))
    val sorted = rows.sortBy(_.getAs[Int]("rank"))
    val lifts = sorted.map(_.getAs[Double]("lift"))
    assert(lifts.zip(lifts.tail).forall { case (a, b) => a >= b })
    assert(lifts.forall(_ > 0))
    rows.foreach(r => assert(r.getAs[Long]("c12") >= TextQueries.CollocMinCount))
  }

  test("q73 grouping sets contain matrix, both margins, and grand total") {
    val rows = Analytics.q73GroupingSets(spark, sfDir).collect()
    val byGrouping = rows.groupBy(r =>
      (r.getAs[Int]("g_region"), r.getAs[Int]("g_priority")))
    assert(byGrouping.keySet === Set((0, 0), (0, 1), (1, 0), (1, 1)))
    assert(byGrouping((1, 1)).length === 1)
    // each grouping level accounts for every order exactly once
    byGrouping.foreach { case (_, g) =>
      assert(g.map(_.getAs[Long]("n_orders")).sum === nOrders)
    }
  }

  test("q74 histogram partitions all orders with shares summing to 1") {
    val rows = Profiling.q74Histogram(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n_orders")).sum === nOrders)
    val shareSum = rows.map(_.getAs[Double]("revenue_share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-4)
    rows.foreach { r =>
      assert(r.getAs[Double]("lo") < r.getAs[Double]("hi"))
      assert(r.getAs[Long]("bucket") >= 0L)
    }
  }

  test("q76 BPE merge candidates are 2-char pairs ranked by weight") {
    val rows = TextQueries.q76BpeMergeStep(spark, sfDir).collect()
    assert(rows.length === TextQueries.BpeTopMerges)
    rows.foreach { r =>
      assert(r.getAs[String]("pair").length === 2)
      assert(r.getAs[Long]("pair_count") > 0L)
    }
    val sorted = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("pair_count"))
    assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b })
  }

  test("q77 heavy hitters: shares are consistent and cumulative") {
    val rows = Profiling.q77HeavyHitters(spark, sfDir).collect()
      .sortBy(_.getAs[Int]("rank"))
    // sf0.001 has fewer distinct users than the top-k budget
    assert(rows.nonEmpty && rows.length <= Profiling.HeavyHitterTopK)
    val shares = rows.map(_.getAs[Double]("share"))
    val cums = rows.map(_.getAs[Double]("cum_share"))
    assert(cums.last <= 1.0 + 1e-9)
    // cum_share tracks the running share sum (rounding drift only)
    assert(math.abs(shares.sum - cums.last) < 1e-3)
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
  }

  test("q78 date spine covers every region-month; gaps are zero-filled " +
      "and carry forward-fills") {
    val rows = Analytics.q78DateSpine(spark, sfDir).collect()
    val months = rows.map(_.getAs[String]("month")).distinct.sorted
    val regions = rows.map(_.getAs[Int]("r_regionkey")).distinct
    assert(rows.length === months.length * regions.length,
      "spine must be the full cross product")
    // contiguous month range (no calendar holes in the spine itself)
    val expected = Iterator.iterate(months.head) { m =>
      val Array(y, mo) = m.split("-").map(_.toInt)
      if (mo == 12) f"${y + 1}%04d-01" else f"$y%04d-${mo + 1}%02d"
    }.take(months.length).toSeq
    assert(months.toSeq === expected)
    val gaps = rows.filter(_.getAs[Long]("n_orders") == 0L)
    assert(gaps.forall(_.getAs[Double]("revenue") == 0.0))
    // carry at a gap equals the last non-gap revenue before it
    regions.foreach { rk =>
      val seq = rows.filter(_.getAs[Int]("r_regionkey") == rk)
        .sortBy(_.getAs[String]("month"))
      var lastObserved = 0.0
      seq.foreach { r =>
        if (r.getAs[Long]("n_orders") > 0L)
          lastObserved = r.getAs[Double]("revenue")
        assert(r.getAs[Double]("carry_revenue") === lastObserved)
      }
    }
  }

  test("q109 interpolation: observed rows keep their value, filled " +
      "rows lie between their anchors, spine is complete per nation") {
    val rows = Analytics.q109LinearInterp(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val nations = rows.map(_.getAs[Int]("nation")).distinct
    val mis = rows.map(_.getAs[Int]("mi")).distinct.sorted
    assert(rows.length === nations.length * mis.length)
    assert(mis.toSeq === (mis.head to mis.last))
    nations.foreach { n =>
      val seq = rows.filter(_.getAs[Int]("nation") == n)
        .sortBy(_.getAs[Int]("mi"))
      val obs = seq.filter(_.getAs[Boolean]("observed"))
        .map(r => r.getAs[Int]("mi") -> r.getAs[Double]("revenue_filled"))
      seq.filterNot(_.getAs[Boolean]("observed")).foreach { r =>
        val mi = r.getAs[Int]("mi")
        val v = r.getAs[Double]("revenue_filled")
        val before = obs.filter(_._1 < mi).map(_._2)
        val after = obs.filter(_._1 > mi).map(_._2)
        if (before.nonEmpty && after.nonEmpty) {
          val (p, nx) = (before.last, after.head)
          assert(v >= math.min(p, nx) - 1e-6 &&
            v <= math.max(p, nx) + 1e-6,
            s"nation $n mi $mi: $v outside [$p, $nx]")
        } else if (before.isEmpty && after.isEmpty) {
          assert(v === 0.0)
        } else {
          // edge extrapolation holds the nearest anchor flat
          assert(v === (before.lastOption orElse after.headOption).get)
        }
      }
    }
  }

  test("q79 salted join result is identical to the plain join") {
    val got = Analytics.q79SaltedJoin(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val ev = Tables.load(spark, sfDir, "events")
    val dim = Tables.load(spark, sfDir, "orders")
      .groupBy(col("o_custkey").as("user_id"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast("decimal(18,4)")).cast("double"), 2)
          .as("lifetime_value"))
    val want = ev.join(dim, Seq("user_id"), "left")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        count(col("n_orders")).as("n_matched"),
        round(sum(coalesce(col("lifetime_value"), lit(0.0))
          .cast("decimal(18,4)")).cast("double"), 2).as("total_lifetime"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got === want, "salting must be invisible in the result")
  }

  test("q80 split partitions the corpus deterministically, train largest") {
    import graft.operators.CorpusOps
    val rows = CorpusOps.q80DatasetSplit(spark, sfDir).collect()
    val bySplit = rows.map(r =>
      r.getAs[String]("split") -> r.getAs[Long]("n_docs")).toMap
    val nDocs = Tables.load(spark, sfDir, "documents").count()
    assert(bySplit.values.sum === nDocs, "every doc lands in exactly one split")
    assert(bySplit("train") > bySplit.getOrElse("val", 0L))
    assert(bySplit("train") > bySplit.getOrElse("test", 0L))
    // determinism: a second run assigns identically
    val again = CorpusOps.q80DatasetSplit(spark, sfDir).collect()
      .map(r => r.getAs[String]("split") -> r.getAs[Long]("n_docs")).toMap
    assert(again === bySplit)
  }

  test("q81 full-outer presence classes are consistent with the counts") {
    import graft.operators.CorpusOps
    val rows = CorpusOps.q81FullOuter(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (o, e) = (r.getAs[Long]("n_orders"), r.getAs[Long]("n_events"))
      r.getAs[String]("presence") match {
        case "events_only" => assert(o === 0L && e > 0L)
        case "orders_only" => assert(o > 0L && e === 0L)
        case "both"        => assert(o > 0L && e > 0L)
      }
    }
    val users = rows.map(_.getAs[Long]("user_id"))
    assert(users.distinct.length === users.length, "one row per user")
  }

  test("q82 chunks tile every document with the configured stride") {
    import graft.operators.CorpusOps
    val rows = CorpusOps.q82Chunking(spark, sfDir).collect()
    val stride = CorpusOps.ChunkTokens - CorpusOps.ChunkOverlap
    val nToks = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        size(graft.functions.TextFunctions.tokens(col("text"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, g) =>
      val sorted = g.sortBy(_.getAs[Int]("chunk_idx"))
      assert(sorted.head.getAs[Int]("start_tok") === 0)
      sorted.foreach { r =>
        assert(r.getAs[Int]("start_tok") ===
          r.getAs[Int]("chunk_idx") * stride)
        assert(r.getAs[Int]("n_in_chunk") > 0)
      }
      // the last chunk reaches the end of the doc
      val last = sorted.last
      assert(last.getAs[Int]("start_tok") + last.getAs[Int]("n_in_chunk")
        === nToks(id))
    }
  }

  test("q83 BM25 returns a descending positive top-20") {
    val rows = TextQueries.q83Bm25(spark, sfDir).collect()
      .sortBy(_.getAs[Int]("rank"))
    assert(rows.length === 20)
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.forall(_ > 0))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("q84 posting lists are sorted, capped, and df-consistent") {
    val rows = TextQueries.q84InvertedIndex(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val posts = r.getAs[String]("postings").split(",").map(_.toLong)
      assert(posts.length <= TextQueries.PostingsCap)
      assert(posts.sorted.sameElements(posts), "postings must be sorted")
      assert(posts.length.toLong <=  r.getAs[Long]("df"))
      assert(r.getAs[Long]("df") >= TextQueries.IndexMinDf)
    }
  }

  test("q85 funnel stages are monotone non-increasing") {
    val rows = Analytics.q85Funnel(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (v, c, p) = (r.getAs[Long]("n_viewers"),
        r.getAs[Long]("n_clickers"), r.getAs[Long]("n_purchasers"))
      assert(v >= c && c >= p, s"funnel must narrow: $v >= $c >= $p")
      assert(r.getAs[Double]("click_rate") <= 1.0)
      assert(r.getAs[Double]("purchase_rate") <=
        r.getAs[Double]("click_rate") + 1e-9)
    }
  }

  test("q86 cohorts start at full retention and never exceed it") {
    val rows = Analytics.q86RetentionCohorts(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getAs[String]("cohort_week"))
    byCohort.foreach { case (_, g) =>
      val week0 = g.find(_.getAs[Long]("weeks_later") == 0L).get
      assert(week0.getAs[Double]("retention") === 1.0)
      g.foreach { r =>
        assert(r.getAs[Long]("n_active") <= r.getAs[Long]("cohort_size"))
        assert(r.getAs[Long]("weeks_later") >= 0L,
          "no activity can precede the cohort's first week")
      }
    }
  }

  test("q87 A/B arms partition all users; z is finite") {
    val r = Analytics.q87AbTest(spark, sfDir).head()
    val nUsers = Tables.load(spark, sfDir, "events")
      .select(col("user_id")).distinct().count()
    assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") === nUsers)
    assert(r.getAs[Long]("c_a") <= r.getAs[Long]("n_a"))
    assert(r.getAs[Long]("c_b") <= r.getAs[Long]("n_b"))
    assert(!r.getAs[Double]("z").isNaN && !r.getAs[Double]("z").isInfinite)
  }

  test("q88 range frame counts itself and only same-user events " +
      "within the hour") {
    val rows = Analytics.q88RangeFrame(spark, sfDir).collect()
    assert(rows.forall(_.getAs[Long]("n_last_hour") >= 1L),
      "frame includes the current row")
    // spot-check one user's series against a brute-force recount
    val uid = rows.head.getAs[Long]("user_id")
    val series = rows.filter(_.getAs[Long]("user_id") == uid)
      .map(r => (r.getAs[String]("ts_s"), r.getAs[Long]("n_last_hour")))
    val times = series.map(_._1).sorted
    series.foreach { case (t, n) =>
      val brute = times.count(u => u <= t &&
        java.time.LocalDateTime.parse(u.replace(' ', 'T'))
          .isAfter(java.time.LocalDateTime.parse(t.replace(' ', 'T'))
            .minusSeconds(3601)))
      assert(n === brute.toLong, s"at $t")
    }
  }

  test("q89 correlated subqueries decorrelate and match a manual join") {
    val got = Analytics.q89CorrelatedSubquery(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // manual decorrelation: pre-aggregate per customer, join, compare
    val ord = Tables.load(spark, sfDir, "orders")
    val per = ord.groupBy(col("o_custkey").as("ck"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,4)")).as("s"))
    val cust = Tables.load(spark, sfDir, "customer")
      .where(col("c_acctbal") > 0).select(col("c_custkey"))
    val want = ord
      .join(per, ord("o_custkey") === col("ck"))
      .join(cust, ord("o_custkey") === col("c_custkey"), "left_semi")
      .where(col("o_totalprice").cast("decimal(18,4)") * col("n") >
        col("s") * 2)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_big"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want)
    // the executed plan must be join-shaped, not per-row subqueries
    val plan = Analytics.q89CorrelatedSubquery(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Subquery"), "scalar subqueries must decorrelate")
  }

  test("q75 percentiles are well-formed per segment") {
    val rows = Profiling.q75SegmentPercentiles(spark, sfDir).collect()
    val bySeg = rows.groupBy(_.getAs[String]("c_mktsegment"))
    bySeg.foreach { case (_, g) =>
      assert(math.abs(g.map(_.getAs[Double]("cume")).max - 1.0) < 1e-9)
      assert(g.map(_.getAs[Double]("pct_rank")).min === 0.0)
      val deciles = g.map(_.getAs[Int]("decile"))
      assert(deciles.min === 1 && deciles.max === 10)
    }
  }

  test("q96 quality report emits one row per check over the full table " +
      "and a clean table passes every gate") {
    val rows = Profiling.q96QualityReport(spark, sfDir).collect()
    assert(rows.length === 6)
    assert(rows.map(_.getAs[String]("check_name")).toSet === Set(
      "not_null_custkey", "positive_totalprice", "valid_priority",
      "date_in_range", "unique_orderkey", "fk_customer"))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") === nOrders)
      assert(r.getAs[Boolean]("passed") ===
        (r.getAs[Long]("n_violations") == 0L))
      assert(r.getAs[Double]("violation_rate") >= 0.0)
    }
    // The synthetic orders table is clean: every constraint holds.
    assert(rows.forall(_.getAs[Boolean]("passed")))
  }

  test("q96 single-pass plan: all six checks share ONE scan of orders " +
      "(the FK folds into the broadcast-joined row)") {
    val df = Profiling.q96QualityReport(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val scans = "Scan parquet".r.findAllIn(p).length
    // orders + broadcast customer = 2; any more means a constraint got
    // its own scan.
    assert(scans <= 2, s"expected <=2 scans, saw $scans:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the FK dim must broadcast:\n$p")
  }

  test("q114 mixture diagnostics: doc counts partition the corpus, " +
      "gini bounded by 1-1/k, dominant language matches brute force") {
    val rows = Profiling.q114MixtureDiagnostics(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val docs = Tables.load(spark, sfDir, "documents")
    assert(rows.map(_.getAs[Long]("n_docs")).sum === docs.count())
    rows.foreach { r =>
      val k = r.getAs[Long]("n_langs")
      val g = r.getAs[Double]("gini")
      assert(g >= -1e-9 && g <= 1.0 - 1.0 / k + 1e-9,
        s"gini $g outside [0, 1-1/$k]")
      assert(r.getAs[Double]("top_share") >= 1.0 / k - 1e-9)
    }
    // brute-force the dominant language of the first source
    val src = rows.head.getAs[String]("source")
    val langCounts = docs.where(col("source") === src)
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getAs[Long]("count"))
    val best = langCounts.sortBy { case (l, n) => (-n, l) }.head._1
    assert(rows.head.getAs[String]("top_lang") === best)
  }

  test("q112 credit shares sum to ~1 and bucket counts sum to the " +
      "purchase count; 'none' matches a brute-force recount") {
    val rows = Analytics.q112FirstTouch(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val ev = Tables.load(spark, sfDir, "events")
    val nPurch = ev.where(col("event_type") === "purchase").count()
    assert(rows.map(_.getAs[Long]("n_purchases")).sum === nPurch)
    val shareSum = rows.map(_.getAs[Double]("credit_share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-4)
    // brute-force 'none': purchases with no earlier same-user
    // non-purchase event in the strict 7-day lookback
    import spark.implicits._
    val evs = ev.select($"event_id", $"user_id", $"event_type",
        unix_timestamp($"ts").as("es")).collect()
    val byUser = evs.filter(_.getAs[String]("event_type") != "purchase")
      .groupBy(_.getAs[Long]("user_id"))
    val none = evs.filter(_.getAs[String]("event_type") == "purchase")
      .count { p =>
        val pes = p.getAs[Long]("es")
        !byUser.getOrElse(p.getAs[Long]("user_id"), Array.empty)
          .exists { t =>
            val tes = t.getAs[Long]("es")
            tes >= pes - 604800L && tes < pes
          }
      }
    val got = rows.find(_.getAs[String]("first_touch") == "none")
      .map(_.getAs[Long]("n_purchases")).getOrElse(0L)
    assert(got === none.toLong)
  }

  test("q119 path counts are bounded by the session-length budget and " +
      "use only real event types") {
    val rows = Analytics.q119PathMining(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val types = Tables.load(spark, sfDir, "events")
      .select("event_type").distinct().collect()
      .map(_.getString(0)).toSet
    rows.foreach { r =>
      Seq("step1", "step2", "step3").foreach(c =>
        assert(types.contains(r.getAs[String](c))))
      assert(r.getAs[Long]("n_paths") > 0L)
    }
    val ns = rows.map(_.getAs[Long]("n_paths")).toSeq
    assert(ns === ns.sorted.reverse)
    // every session of length n contributes exactly max(0, n-2) paths
    val budget = Analytics.q41Sessionize(spark, sfDir).collect()
      .map(r => math.max(0L, r.getAs[Long]("n_events") - 2L)).sum
    assert(ns.sum <= budget)
  }

  test("q113 streaks are genuinely consecutive and the longest streak " +
      "matches a brute-force scan") {
    val rows = Analytics.q113ActivityStreaks(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val fmt = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE
    rows.foreach { r =>
      val a = java.time.LocalDate.parse(r.getAs[String]("streak_start"), fmt)
      val b = java.time.LocalDate.parse(r.getAs[String]("streak_end"), fmt)
      assert(java.time.temporal.ChronoUnit.DAYS.between(a, b) + 1 ===
        r.getAs[Long]("streak_days"))
    }
    val lens = rows.map(_.getAs[Long]("streak_days")).toSeq
    assert(lens === lens.sorted.reverse)
    // brute-force the global max streak
    import spark.implicits._
    val days = Tables.load(spark, sfDir, "events")
      .select($"user_id", to_date($"ts").as("d")).distinct().collect()
      .map(r => r.getAs[Long]("user_id") ->
        r.getAs[java.sql.Date]("d").toLocalDate)
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val bruteMax = days.values.map { ds =>
      var best = 1L; var cur = 1L
      ds.toSeq.sliding(2).foreach { pair =>
        if (pair.length == 2) {
          if (java.time.temporal.ChronoUnit.DAYS
              .between(pair(0), pair(1)) == 1) {
            cur += 1; best = math.max(best, cur)
          } else cur = 1
        }
      }
      best
    }.max
    assert(rows.head.getAs[Long]("streak_days") === bruteMax)
  }

  test("q180 sketch quantile upper bounds bracket the exact quantiles within the 2x error law") {
    val lens = graft.Tables.load(spark, sfDir, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1).trim.split("\\s+").length.toLong))
      .groupBy(_._1).map { case (src, xs) => src -> xs.map(_._2).sorted }
    val rows = graft.operators.Profiling.q180QuantileSketch(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n_docs")).sum === lens.values.map(_.length.toLong).sum)
    rows.foreach { r =>
      val xs = lens(r.getAs[String]("source"))
      def exact(p: Int): Long = // smallest x with rank*100 >= n*p
        xs((((xs.length.toLong * p + 99) / 100) - 1).toInt.max(0))
      for (p <- Seq(50, 90, 99)) {
        val est = r.getAs[Long](s"p${p}_ub")
        val ex = exact(p)
        assert(est >= ex, s"p$p upper bound must dominate the exact quantile")
        // est is the containing bucket's upper bound: <= 2*(ex+1)-2
        assert(est <= 2 * (ex + 1) - 2, s"p$p bound must respect the bucket-width error law")
      }
      assert(r.getAs[Long]("p50_ub") <= r.getAs[Long]("p90_ub"))
      assert(r.getAs[Long]("p90_ub") <= r.getAs[Long]("p99_ub"))
      assert(r.getAs[Long]("max_len") === xs.max)
    }
  }
}
