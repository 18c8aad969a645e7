package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Analytics, CorpusOps, Stats}

/** Invariant specs for q130–q132 (balanced sampling, builtin session
  * windows, weighted median). */
class PackExtrasSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  test("q130 picks at most 20 docs per language and exactly the " +
      "smallest md5 ranks") {
    val got = CorpusOps.q130BalancedSample(spark, sfDir).collect()
    val byLang = got.groupBy(_.getAs[String]("lang"))
    byLang.foreach { case (_, rows) =>
      assert(rows.length <= 20)
      assert(rows.map(_.getAs[Int]("rk")).sorted.toSeq ===
        (1 to rows.length))
    }
    // Brute force: per language, the chosen doc_ids are the first 20
    // under (md5(text), doc_id) order.
    val all = Tables.load(spark, sfDir, "documents")
      .select($"lang", $"doc_id", md5($"text").as("h")).collect()
      .groupBy(_.getAs[String]("lang"))
    byLang.foreach { case (lang, rows) =>
      val want = all(lang)
        .map(r => (r.getAs[String]("h"), r.getAs[Long]("doc_id")))
        .sorted.take(20).map(_._2).toSeq
      val gotIds = rows.sortBy(_.getAs[Int]("rk"))
        .map(_.getAs[Long]("doc_id")).toSeq
      assert(gotIds === want, s"wrong picks for $lang")
    }
  }

  test("q131 builtin session_window reproduces the manual " +
      "gaps-and-islands sessions on this data") {
    val builtin = Analytics.q131SessionWindow(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("session_start"),
        r.getAs[Long]("n_events"), r.getAs[Double]("session_value")))
      .toSet
    val manual = Analytics.q41Sessionize(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("session_start"),
        r.getAs[Long]("n_events"), r.getAs[Double]("session_value")))
      .toSet
    // The two differ only on gaps of EXACTLY 30 minutes (builtin >=,
    // manual >); micro-precision timestamps make that measure-zero,
    // and on this data the session sets coincide.
    assert(builtin === manual)
  }

  test("q133 ordered listagg is deterministic and lists exactly the " +
      "nations that have customers") {
    val got = Analytics.q133ListAgg(spark, sfDir).collect()
    assert(got.nonEmpty)
    val expected = Tables.load(spark, sfDir, "customer")
      .join(Tables.load(spark, sfDir, "nation"),
        $"c_nationkey" === $"n_nationkey")
      .join(Tables.load(spark, sfDir, "region"),
        $"n_regionkey" === $"r_regionkey")
      .select($"r_name", $"n_name").distinct().collect()
      .groupBy(_.getAs[String]("r_name"))
      .view.mapValues(_.map(_.getAs[String]("n_name")).sorted).toMap
    got.foreach { r =>
      val want = expected(r.getAs[String]("r_name"))
      assert(r.getAs[Long]("n_nations") === want.length.toLong)
      assert(r.getAs[String]("nations") === want.mkString("|"))
    }
  }

  test("q134 rendezvous routing partitions every doc and adding a " +
      "shard moves only the keys the new shard wins") {
    import graft.operators.ScaleOps
    val rolled = ScaleOps.q134RendezvousRouting(spark, sfDir).collect()
    val nDocs = Tables.load(spark, sfDir, "documents").count()
    assert(rolled.map(_.getAs[Long]("n_docs")).sum === nDocs)

    def assign(nShards: Int) = {
      val hashes = (0 until nShards).map { k =>
        struct(md5(concat_ws(":", $"doc_id".cast("string"),
          lit(k.toString))).as("h"), lit(k).as("shard"))
      }
      Tables.load(spark, sfDir, "documents")
        .select($"doc_id", greatest(hashes: _*).getField("shard").as("s"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    }
    val a8 = assign(8)
    val a9 = assign(9)
    // HRW minimal disruption: every doc either keeps its shard or
    // moves to the NEW shard — never between old shards.
    a8.foreach { case (doc, s8) =>
      val s9 = a9(doc)
      assert(s9 == s8 || s9 == 8, s"doc $doc moved $s8 -> $s9")
    }
    // And some docs do move (the new shard takes ~1/9 of keys).
    assert(a9.values.count(_ == 8) > 0)
  }

  test("q135 snapshot diff classifies every key exactly once and " +
      "matches the deterministic derivation rules") {
    import graft.operators.ScaleOps
    val got = ScaleOps.q135SnapshotDiff(spark, sfDir).collect()
      .map(r => r.getAs[String]("status") ->
        (r.getAs[Long]("n_keys"), r.getAs[Long]("key_sum"))).toMap
    val keys = Tables.load(spark, sfDir, "customer")
      .select($"c_custkey").as[Long].collect()
    val removed = keys.filter(_ % 97 == 0)
    val added = keys.filter(_ % 101 == 0).map(_ + 1000000L)
    val changed = keys.filter(k => k % 97 != 0 && k % 13 == 0)
    val unchanged = keys.filter(k => k % 97 != 0 && k % 13 != 0)
    assert(got("removed") === ((removed.length.toLong, removed.sum)))
    assert(got("added") === ((added.length.toLong, added.sum)))
    assert(got("changed") === ((changed.length.toLong, changed.sum)))
    assert(got("unchanged") === ((unchanged.length.toLong, unchanged.sum)))
  }

  test("q136 first-appearance rewrite equals brute-force cumulative " +
      "distinct sets") {
    import graft.operators.Stats
    val got = Stats.q136CumulativeDistinct(spark, sfDir).collect()
    assert(got.length > 1)
    val pairs = Tables.load(spark, sfDir, "events")
      .select(date_format($"ts", "yyyy-MM-dd").as("day"), $"user_id")
      .distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val days = pairs.map(_._1).distinct.sorted
    var seen = Set.empty[Long]
    val brute = days.map { d =>
      val todays = pairs.filter(_._1 == d).map(_._2).toSet
      val newcomers = (todays -- seen).size.toLong
      seen ++= todays
      (d, todays.size.toLong, newcomers, seen.size.toLong)
    }
    val gotSeq = got.map(r => (r.getAs[String]("day"),
      r.getAs[Long]("n_active"), r.getAs[Long]("n_new"),
      r.getAs[Long]("cum_distinct_users"))).toSeq
    assert(gotSeq === brute.toSeq)
    got.foreach(r => assert(r.getAs[Long]("n_returning") ===
      r.getAs[Long]("n_active") - r.getAs[Long]("n_new")))
  }

  test("q137 quarantine classifies every record exactly once by the " +
      "derivation rules and loses no ids") {
    import graft.operators.Profiling
    val got = Profiling.q137QuarantineAudit(spark, sfDir).collect()
      .map(r => r.getAs[String]("status") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("id_sum"))).toMap
    assert(got.keySet === Set("ok", "invalid_json", "missing_key",
      "non_numeric_value"), s"classes seen: ${got.keySet}")
    val ids = Tables.load(spark, sfDir, "events")
      .select($"event_id").as[Long].collect()
    val invalid = ids.filter(_ % 11 == 0)
    val nonNum = ids.filter(i => i % 11 != 0 && i % 13 == 0)
    val missing = ids.filter(i => i % 11 != 0 && i % 13 != 0 && i % 17 == 0)
    val ok = ids.filter(i => i % 11 != 0 && i % 13 != 0 && i % 17 != 0)
    assert(got("invalid_json") === ((invalid.length.toLong, invalid.sum)))
    assert(got("non_numeric_value") === ((nonNum.length.toLong, nonNum.sum)))
    assert(got("missing_key") === ((missing.length.toLong, missing.sum)))
    assert(got("ok") === ((ok.length.toLong, ok.sum)))
    // Partition property: every record lands in exactly one class.
    assert(got.values.map(_._1).sum === ids.length.toLong)
  }

  test("q138 feature hashing conserves token mass and assigns buckets " +
      "by the md5 rule") {
    import graft.operators.TextQueries
    val got = TextQueries.q138FeatureHashing(spark, sfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val d = r.getAs[Long]("dim")
      assert(d >= 0 && d < 32)
      assert(r.getAs[Long]("max_doc_count") <= r.getAs[Long]("total_count"))
    }
    val tokenCount = Tables.load(spark, sfDir, "documents")
      .select(explode(split(trim($"text"), "\\s+")).as("w"))
      .where(length($"w") > 0).count()
    assert(got.map(_.getAs[Long]("total_count")).sum === tokenCount,
      "hashing dropped or duplicated tokens")
    // Spot-check the bucket rule on one token.
    val w = "the"
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val dim = java.lang.Long.parseLong(hex.take(7), 16) % 32
    val viaSpark = Tables.load(spark, sfDir, "documents").limit(1)
      .select((conv(substring(md5(lit(w)), 1, 7), 16, 10).cast("long") % 32)
        .as("d")).head().getLong(0)
    assert(viaSpark === dim)
  }

  test("q139 class weights are balanced: every class contributes equal " +
      "total weight") {
    import graft.operators.Similarity
    val got = Similarity.q139ClassWeights(spark, sfDir).collect()
    assert(got.length > 1)
    val n = got.map(_.getAs[Long]("n_examples")).sum
    val contributions = got.map(r =>
      r.getAs[Long]("n_examples") * r.getAs[Double]("class_weight"))
    // n_c * (N / (K * n_c)) = N / K for every class, up to 6-dp rounding.
    val expected = n.toDouble / got.length
    contributions.foreach(c => assert(math.abs(c - expected) < 1e-2,
      s"unbalanced contribution $c vs $expected"))
    // Rarer class -> strictly larger weight.
    val sorted = got.sortBy(_.getAs[Long]("n_examples"))
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        if (a.getAs[Long]("n_examples") < b.getAs[Long]("n_examples"))
          assert(a.getAs[Double]("class_weight") >
            b.getAs[Double]("class_weight"))
      case _ =>
    }
  }

  test("q140 banding recovers exactly the brute-force Hamming pairs " +
      "at the threshold (pigeonhole guarantee)") {
    import graft.operators.Dedup
    import graft.functions.SimHash
    import graft.functions.TextFunctions.tokens
    val got = Dedup.q140SimhashPairs(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Int]("hamming"))).toSet
    val sigs = Tables.load(spark, sfDir, "documents")
      .select($"doc_id", SimHash.simhash64(tokens($"text")).as("sig"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (a, b, h)).toSet
    assert(got === brute)
    got.foreach { case (_, _, h) => assert(h >= 0 && h <= 3) }
  }

  test("q141 as-of tolerance nulls stale matches and keeps fresh ones, " +
      "against a brute-force lookup") {
    import graft.operators.AsofJoin
    val got = AsofJoin.q141AsofTolerance(spark, sfDir).collect()
    assert(got.nonEmpty)
    val ev = Tables.load(spark, sfDir, "events")
      .select($"event_id", $"user_id", unix_timestamp($"ts").as("es"),
        $"event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val views = ev.filter(_._4 == "view").groupBy(_._2)
    got.foreach { r =>
      val pid = r.getAs[Long]("event_id")
      val (_, u, pts, _) = ev.find(_._1 == pid).get
      val prior = views.getOrElse(u, Array.empty)
        .filter(_._3 <= pts)
      if (prior.isEmpty) {
        assert(r.getAs[Any]("view_id") == null)
        assert(!r.getAs[Boolean]("stale_dropped"))
      } else {
        val best = prior.maxBy(v => (v._3, v._1))
        val secs = pts - best._3
        if (secs <= 7200) {
          assert(r.getAs[Long]("secs_since_view") === secs)
          assert(!r.getAs[Boolean]("stale_dropped"))
        } else {
          assert(r.getAs[Any]("view_id") == null)
          assert(r.getAs[Boolean]("stale_dropped"))
        }
      }
    }
  }

  test("q143 Hamilton allocation sums to exactly K, stays within one " +
      "seat of the exact share, and picks the smallest md5 ranks") {
    val got = CorpusOps.q143ProportionalAllocation(spark, sfDir).collect()
    assert(got.length === 100, s"allocation must sum to K: ${got.length}")
    val quotas = got.map(r => (r.getAs[String]("lang"),
      r.getAs[Long]("n_stratum"), r.getAs[Long]("quota"))).distinct
    val nTotal = quotas.map(_._2).sum
    quotas.foreach { case (lang, n, q) =>
      val exact = 100.0 * n / nTotal
      assert(q >= math.floor(exact) && q <= math.floor(exact) + 1,
        s"$lang quota $q outside [floor, floor+1] of $exact")
    }
    assert(quotas.map(_._3).sum === 100L)
    // Within each stratum the picks are ranks 1..quota.
    got.groupBy(_.getAs[String]("lang")).foreach { case (lang, rows) =>
      val q = rows.head.getAs[Long]("quota")
      assert(rows.length.toLong === q)
      assert(rows.map(_.getAs[Int]("rk")).sorted.toSeq ===
        (1 to q.toInt), s"$lang picks must be the top ranks")
    }
  }

  test("q144 bounce analysis reconciles with q41's session counts and " +
      "bounds its rates") {
    val got = Analytics.q144BounceAnalysis(spark, sfDir).collect()
    assert(got.nonEmpty)
    val sessions = Analytics.q41Sessionize(spark, sfDir).collect()
    assert(got.map(_.getAs[Long]("n_sessions")).sum === sessions.length.toLong,
      "entry-type groups must partition the session set")
    val bounces = sessions.count(_.getAs[Long]("n_events") == 1L)
    val gotBounces = got.map(r => math.round(
      r.getAs[Double]("bounce_rate") * r.getAs[Long]("n_sessions"))).sum
    assert(math.abs(gotBounces - bounces) <= got.length,
      s"bounce totals drifted: $gotBounces vs $bounces")
    got.foreach { r =>
      assert(r.getAs[Double]("bounce_rate") >= 0.0 &&
        r.getAs[Double]("bounce_rate") <= 1.0)
      assert(r.getAs[Double]("avg_session_events") >= 1.0)
      // a bounced session exits where it entered, so same_exit_rate
      // dominates bounce_rate
      assert(r.getAs[Double]("same_exit_rate") >=
        r.getAs[Double]("bounce_rate") - 1e-9)
    }
  }

  test("q132 weighted median matches a driver-side computation and " +
      "sits at the half-weight point") {
    val got = Stats.q132WeightedMedian(spark, sfDir).collect()
    assert(got.nonEmpty)
    val rows = Tables.load(spark, sfDir, "lineitem")
      .select($"l_returnflag", $"l_extendedprice", $"l_quantity")
      .collect()
      .map(r => (r.getAs[String]("l_returnflag"),
        r.getAs[Double]("l_extendedprice"),
        r.getAs[Double]("l_quantity").toLong))
      .groupBy(_._1)
    got.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val data = rows(flag).map(x => (x._2, x._3)).sortBy(_._1)
      val total = data.map(_._2).sum
      assert(r.getAs[Long]("total_weight") === total)
      var cum = 0L
      val med = data.find { case (_, w) => cum += w; cum * 2 >= total }
        .get._1
      assert(r.getAs[Double]("weighted_median_price") === med)
    }
  }
}
