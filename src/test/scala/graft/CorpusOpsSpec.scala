package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.CorpusOps

/** Round-3 corpus-preparation operator invariants. The DuckDB oracle
  * hash-checks exact values per round; these specs pin the structural
  * semantics (coverage, bounds, monotonicity, masking) on sf0.001 so a
  * refactor that silently changes an operator's meaning fails fast. */
class CorpusOpsSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  test("q56 boilerplate spans: every span hits >=2 docs and occurrences >= docs") {
    val rows = CorpusOps.q56BoilerplateSpans(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDocs, nOcc) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_occurrences"))
      assert(nDocs >= 2 && nOcc >= nDocs)
    }
  }

  test("q57 masking removes every digit and counts them") {
    val rows = CorpusOps.q57PiiMask(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!r.getAs[String]("masked_name").exists(_.isDigit))
      assert(r.getAs[Int]("n_digits_redacted") > 0) // c_name embeds the key
    }
  }

  test("q58 contamination share is a [0,1] ratio over the doc's grams") {
    val rows = CorpusOps.q58Contamination(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val share = r.getAs[Double]("contamination_share")
      assert(share >= 0.0 && share <= 1.0)
      assert(r.getAs[Long]("n_contaminated") <= r.getAs[Long]("n_grams"))
    }
    // eval docs (doc_id % 100 == 0) are excluded from the report
    assert(!rows.exists(_.getAs[Long]("doc_id") % 100 == 0))
  }

  test("q59 packing covers all docs exactly once with contiguous id ranges") {
    val docs = Tables.load(spark, sfDir, "documents").count()
    val packs = CorpusOps.q59SeqPacking(spark, sfDir)
      .orderBy("pack_id").collect()
    assert(packs.map(_.getAs[Long]("n_docs")).sum === docs)
    // doc-id ranges of consecutive packs must tile without overlap
    packs.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("last_doc") < b.getAs[Long]("first_doc"))
      case _ =>
    }
  }

  test("q60 vocab top-k ranks by count desc with deterministic ties") {
    val rows = CorpusOps.q60VocabTopK(spark, sfDir)
      .orderBy("rank").collect()
    assert(rows.nonEmpty && rows.length <= 50)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        val (ca, cb) = (a.getAs[Long]("n"), b.getAs[Long]("n"))
        assert(ca > cb || (ca == cb &&
          a.getAs[String]("token") < b.getAs[String]("token")))
      case _ =>
    }
  }

  test("q61 weighted sample is 64 rows favoring long docs") {
    val sample = CorpusOps.q61WeightedSample(spark, sfDir).collect()
    assert(sample.length === 64)
    val avgSampled = sample.map(_.getAs[Long]("n_chars")).sum.toDouble / 64
    val avgAll = Tables.load(spark, sfDir, "documents")
      .agg(avg("n_chars")).head.getDouble(0)
    assert(avgSampled > avgAll) // weight = n_chars biases toward long docs
  }

  test("q62 repetition stats are internally consistent") {
    CorpusOps.q62RepetitionStats(spark, sfDir).collect().foreach { r =>
      assert(r.getAs[Long]("n_unique") <= r.getAs[Long]("n_tokens"))
      val dup = r.getAs[Double]("dup_ratio")
      assert(dup >= 0.0 && dup < 1.0)
      assert(r.getAs[Double]("top_token_share") > 0.0)
    }
  }

  test("q63 ten buckets with non-overlapping char ranges covering all docs") {
    val docs = Tables.load(spark, sfDir, "documents").count()
    val buckets = CorpusOps.q63CurriculumBuckets(spark, sfDir)
      .orderBy("bucket").collect()
    assert(buckets.length === 10)
    assert(buckets.map(_.getAs[Long]("n_docs")).sum === docs)
    buckets.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("max_chars") <= b.getAs[Long]("min_chars"))
      case _ =>
    }
  }

  test("q64 SCD2 intervals chain per user and drop no-change events") {
    val hist = CorpusOps.q64Scd2History(spark, sfDir)
    val byUser = hist.collect().groupBy(_.getAs[Long]("user_id"))
    byUser.values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[String]("valid_from"))
      // exactly one open interval (valid_to null) per user: the current state
      assert(sorted.count(_.getAs[String]("valid_to") == null) === 1)
      assert(sorted.last.getAs[String]("valid_to") == null)
      // each interval closes exactly where the next opens
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[String]("valid_to") === b.getAs[String]("valid_from"))
          // consecutive intervals represent an actual state CHANGE
          assert(a.getAs[String]("event_type") !== b.getAs[String]("event_type"))
        case _ =>
      }
    }
  }

  test("q65 rollup accounts for every document once per source") {
    val total = Tables.load(spark, sfDir, "documents").count()
    val rows = CorpusOps.q65SourceRollup(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === total)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_dup_docs") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("n_langs") >= 1)
    }
  }

  test("q115 leakage matrix: ordered pairs, counts positive, and the " +
      "top pair matches a brute-force shared-gram recount") {
    val rows = CorpusOps.q115LeakageMatrix(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("src_a") < r.getAs[String]("src_b"))
      assert(r.getAs[Long]("n_shared_grams") > 0L)
    }
    val ns = rows.map(_.getAs[Long]("n_shared_grams")).toSeq
    assert(ns === ns.sorted.reverse)
    // brute-force the top pair's count via per-source gram sets
    import graft.functions.TextFunctions.shingles
    import org.apache.spark.sql.functions.{array_distinct, col, explode}
    val top = rows.head
    val grams = Tables.load(spark, sfDir, "documents")
      .where(col("source").isin(top.getAs[String]("src_a"),
        top.getAs[String]("src_b")))
      .select(col("source"),
        explode(array_distinct(shingles(col("text"), 3))).as("g"))
      .distinct().collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.map(_.getString(1)).toSet).toMap
    val shared = grams(top.getAs[String]("src_a"))
      .intersect(grams(top.getAs[String]("src_b"))).size
    assert(top.getAs[Long]("n_shared_grams") === shared.toLong)
  }

  test("q176 padding audit matches a driver-side recomputation and " +
      "length-sorting strictly reduces waste") {
    val rows = CorpusOps.q176PaddingAudit(spark, sfDir).collect()
      .map(r => r.getAs[String]("strategy") ->
        ((r.getAs[Long]("n_batches"), r.getAs[Long]("total_tokens"),
          r.getAs[Long]("padded_tokens"), r.getAs[Double]("waste_share"))))
      .toMap
    assert(rows.keySet === Set("arrival", "length_sorted"))
    val lens = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("text").trim.split("\\s+").length.toLong))
    def recompute(ordered: Seq[Long]): (Long, Long, Long) = {
      val batches = ordered.grouped(CorpusOps.PadBatch).toSeq
      (batches.size.toLong, ordered.sum,
        batches.map(b => b.max * b.size - b.sum).sum)
    }
    val arr = recompute(lens.sortBy(_._1).map(_._2).toSeq)
    val srt = recompute(lens.sortBy(t => (t._2, t._1)).map(_._2).toSeq)
    assert((rows("arrival")._1, rows("arrival")._2, rows("arrival")._3)
      === arr)
    assert((rows("length_sorted")._1, rows("length_sorted")._2,
      rows("length_sorted")._3) === srt)
    // token conservation: real tokens are strategy-independent
    assert(rows("arrival")._2 === rows("length_sorted")._2)
    // the point of the audit: sorting strictly reduces padding here
    assert(rows("length_sorted")._3 < rows("arrival")._3)
  }

  test("q178 shards partition the corpus exactly and the checksum matches a driver recompute") {
    def md5Hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val rows = CorpusOps.q178ShardPlan(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // every doc lands in exactly one shard; counts partition the corpus
    assert(rows.map(_.getAs[Long]("n_docs")).sum === docs.length.toLong)
    val expectedByShard = docs.groupBy { case (_, t) =>
      Integer.parseInt(md5Hex(t).substring(0, 2), 16) % CorpusOps.NumShards
    }
    rows.foreach { r =>
      val shard = r.getAs[Int]("shard")
      val members = expectedByShard(shard)
      assert(r.getAs[Long]("n_docs") === members.length.toLong)
      // content checksum: order-independent sum of 32-bit md5 prefixes
      val ck = members.map { case (_, t) =>
        java.lang.Long.parseLong(md5Hex(t).substring(0, 8), 16)
      }.sum
      assert(r.getAs[Long]("content_checksum") === ck)
      // order range witnesses the (md5, doc_id) within-shard order
      val keys = members.map { case (id, t) => s"${md5Hex(t)}/$id" }
      assert(r.getAs[String]("order_min") === keys.min)
      assert(r.getAs[String]("order_max") === keys.max)
    }
    // shares sum to ~1
    val shares = rows.map(_.getAs[Double]("token_share")).sum
    assert(math.abs(shares - 1.0) < 1e-3)
  }
}
