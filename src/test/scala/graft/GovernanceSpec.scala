package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Governance

/** Corpus-governance operators (q158–q161): semantics pinned against
  * brute-force recomputation on the test corpus. */
class GovernanceSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  private lazy val docs = Tables.load(spark, sfDir, "documents").cache()

  test("q158 dup-passage coverage: doc 0's gram counts match a " +
      "driver-side brute force, and coverage is a valid fraction") {
    val rows = Governance.q158DupPassageCoverage(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val c = r.getAs[Double]("dup_coverage")
      c >= 0.0 && c <= 1.0 &&
        r.getAs[Long]("n_shared_grams") <= r.getAs[Long]("n_grams")
    })
    // brute force over the whole corpus in plain Scala
    val texts = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    def grams(t: String): Set[Seq[String]] = {
      val toks = t.trim.split("\\s+").toSeq
      if (toks.length < Governance.PassageGram) Set.empty
      else toks.sliding(Governance.PassageGram).map(_.toSeq).toSet
    }
    val byDoc = texts.map { case (id, t) => id -> grams(t) }
    val docFreq = byDoc.values.flatten
      .groupBy(identity).map { case (g, occ) => g -> occ.size }
    for (r <- rows.take(20)) {
      val id = r.getAs[Long]("doc_id")
      val g = byDoc(id)
      assert(r.getAs[Long]("n_grams") === g.size.toLong)
      assert(r.getAs[Long]("n_shared_grams") ===
        g.count(docFreq(_) >= 2).toLong)
    }
    // docs with <5 tokens are excluded, all others present
    val expectDocs = byDoc.count(_._2.nonEmpty)
    assert(rows.length === expectDocs)
  }

  test("q159 mix planner: allocation respects the budget and the " +
      "epoch cap, and weight shares sum to ~1") {
    val rows = Governance.q159MixPlanner(spark, sfDir).collect()
    assert(rows.length === 20)
    val totalTokens = docs
      .agg(sum(size(split(trim(col("text")), "\\s+")))).head.getLong(0)
    val budget = totalTokens / 2
    val allocSum = rows.map(_.getAs[Long]("alloc_tokens")).sum
    assert(allocSum <= budget,
      s"allocated $allocSum over budget $budget")
    assert(rows.forall(_.getAs[Double]("epochs") <=
      Governance.MaxEpochs + 1e-9))
    val shareSum = rows.map(_.getAs[Double]("weight_share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-4)
    // uncapped sources receive budget-proportional allocations: any
    // source with more tokens than another uncapped source gets >= its
    // allocation (monotone in weight)
    val uncapped = rows.filter(!_.getAs[Boolean]("capped"))
      .sortBy(_.getAs[Long]("tokens"))
    uncapped.sliding(2).foreach {
      case Array(a, b) => assert(a.getAs[Long]("alloc_tokens") <=
        b.getAs[Long]("alloc_tokens"))
      case _ => ()
    }
  }

  test("q160 per-source dedup health: counts partition the corpus and " +
      "cross-source flags match a brute-force recount") {
    val rows = Governance.q160SourceDedupHealth(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === docs.count())
    assert(rows.forall { r =>
      r.getAs[Long]("n_fingerprints") <= r.getAs[Long]("n_docs") &&
        r.getAs[Double]("dup_rate") >= 0.0
    })
    val crossTotal = rows.map(_.getAs[Long]("n_cross_source_docs")).sum
    val expectCross = docs
      .select(col("source"), md5(regexp_replace(lower(trim(col("text"))),
        "\\s+", " ")).as("fp"))
      .groupBy(col("fp"))
      .agg(count_distinct(col("source")).as("ns"), count(lit(1)).as("n"))
      .where(col("ns") >= 2)
      .agg(coalesce(sum(col("n")), lit(0L))).head.getLong(0)
    assert(crossTotal === expectCross)
  }

  test("q161 leakage-safe split: zero violations by construction, " +
      "every doc lands exactly once, and duplicate docs travel " +
      "together") {
    val rows = Governance.q161LeakageSafeSplit(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("split")).toSet
      .subsetOf(Set("train", "val")))
    assert(rows.forall(_.getAs[Long]("violations") === 0L))
    assert(rows.map(_.getAs[Long]("n_docs")).sum === docs.count())
    // group-consistency is structural: fingerprint count per split sums
    // to the distinct fingerprint total (no fingerprint counted twice)
    val fpTotal = docs.select(md5(regexp_replace(lower(trim(col("text"))),
      "\\s+", " "))).distinct().count()
    assert(rows.map(_.getAs[Long]("n_fingerprints")).sum === fpTotal)
    // both sides non-trivial at this corpus size
    assert(rows.length === 2, s"expected both splits, got ${rows.toSeq}")
  }

  test("q173 k-anonymity histogram equals a driver-side recomputation " +
      "and accounts for every customer exactly once") {
    val rows = Governance.q173KAnonymity(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("n_classes"),
        r.getAs[Long]("n_rows"), r.getAs[Double]("row_share"),
        r.getAs[Long]("n_homogeneous")))
    val cust = graft.Tables.load(spark, sfDir, "customer")
      .select(col("c_nationkey"), col("c_mktsegment"), col("c_acctbal"))
      .collect()
      .map(r => (r.getAs[Int]("c_nationkey"),
        r.getAs[String]("c_mktsegment"), r.getAs[Double]("c_acctbal")))
    val classes = cust
      .groupBy { case (n, m, b) => (n, m, math.floor(b / 1000.0).toInt) }
      .values.map { members =>
        (members.size.toLong,
          members.map { case (_, _, b) => b < 0 }.toSet.size)
      }.toSeq
    val want = classes.groupBy(_._1).toSeq.map { case (k, cs) =>
      (k, cs.size.toLong, k * cs.size,
        BigDecimal(k * cs.size.toDouble / cust.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        cs.count(_._2 == 1).toLong)
    }.sortBy(_._1)
    assert(rows.toSeq === want)
    // the histogram partitions the table: every row in exactly one class
    assert(rows.map(_._3).sum === cust.length.toLong)
    // the audit has teeth on this data: singleton classes exist
    assert(rows.exists(r => r._1 === 1L && r._2 > 0L))
  }

  test("q174 deletion audit: blast radius matches a driver-side " +
      "recomputation and the cleaned tables carry zero residue") {
    def md5Hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = Governance.q174DeletionAudit(spark, sfDir).collect()
      .map(r => r.getAs[String]("table") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_deleted_keys"),
          r.getAs[Long]("residual_rows")))).toMap
    assert(rows.keySet === Set("customer", "orders", "lineitem"))
    rows.values.foreach { case (_, _, resid) => assert(resid === 0L) }

    val delKeys = graft.Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey")).collect().map(_.getLong(0))
      .filter(k => md5Hex(s"forget_$k").substring(0, 2) < "05").toSet
    assert(delKeys.nonEmpty, "the md5 rule selected no customers")
    val orders = graft.Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val affOrders = orders.filter { case (_, ck) => delKeys.contains(ck) }
    val affKeys = affOrders.map(_._1).toSet
    val liHit = graft.Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey")).collect()
      .count(r => affKeys.contains(r.getLong(0)))
    assert(rows("customer")._1 === delKeys.size.toLong)
    assert(rows("orders")._1 === affOrders.length.toLong)
    assert(rows("orders")._2 ===
      affOrders.map(_._2).distinct.length.toLong)
    assert(rows("lineitem")._1 === liHit.toLong)
  }

  test("q179 schedule: epoch split is exact, the fractional draw is the " +
      "stated md5 threshold, and the schedule respects the q159 allocation") {
    def md5Hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val alloc = Governance.q159MixPlanner(spark, sfDir).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("alloc_tokens"))
      .toMap
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val rows = Governance.q179EpochSchedule(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val (tok, a) = (r.getAs[Long]("tokens"), r.getAs[Long]("alloc_tokens"))
      val (fe, ppm) = (r.getAs[Long]("full_epochs"), r.getAs[Long]("frac_ppm"))
      // the schedule is q159's allocation, split exactly
      assert(a === alloc(src))
      assert(fe === a / tok)
      assert(ppm === (a % tok) * 1000000L / tok && ppm >= 0 && ppm < 1000000)
      // the fractional draw is exactly the salted-md5 threshold rule
      val picked = docs.filter(_._1 == src).map(_._2).filter { t =>
        java.lang.Long.parseLong(
          md5Hex(t + "|q179").substring(0, 8), 16) % 1000000 < ppm
      }
      assert(r.getAs[Long]("n_docs_sampled") === picked.length.toLong)
      val sampledTok = picked.map(_.trim.split("\\s+").length.toLong).sum
      assert(r.getAs[Long]("sampled_tokens") === sampledTok)
      assert(r.getAs[Long]("scheduled_tokens") === fe * tok + sampledTok)
    }
  }
}
