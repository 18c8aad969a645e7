package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Analytics, Stats, TextQueries}

/** Invariant specs for q151–q153 (unigram LM scoring, mix-shift
  * decomposition, transition dwell times). */
class LmMixDwellSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  test("q151 LM scores are positive, bounded by ln(corpus tokens), " +
      "and token counts partition the corpus token stream") {
    val got = TextQueries.q151UnigramLmScore(spark, sfDir).collect()
    val nDocs = Tables.load(spark, sfDir, "documents").count()
    assert(got.length === nDocs)
    val totalToks = Tables.load(spark, sfDir, "documents")
      .select(explode(split(trim($"text"), "\\s+")).as("t")).count()
    assert(got.map(_.getAs[Long]("n_tokens")).sum === totalToks)
    val bound = math.log(totalToks.toDouble) + 1e-6
    got.foreach { r =>
      val a = r.getAs[Double]("avg_neg_log_prob")
      assert(a > 0.0 && a <= bound)
    }
    // brute-force one document driver-side
    val vocab = Tables.load(spark, sfDir, "documents")
      .select(explode(split(trim($"text"), "\\s+")).as("t"))
      .groupBy($"t").count().collect()
      .map(r => r.getAs[String]("t") -> r.getAs[Long]("count")).toMap
    val text0 = Tables.load(spark, sfDir, "documents")
      .where($"doc_id" === 0L).select($"text").head().getString(0)
    val toks0 = text0.trim.split("\\s+")
    val sumNn = toks0.map { t =>
      math.floor(-math.log(vocab(t).toDouble / totalToks) * 1e9).toLong
    }.sum
    val want = BigDecimal(sumNn.toDouble / toks0.length / 1e9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val row0 = got.find(_.getAs[Long]("doc_id") == 0L).get
    assert(row0.getAs[Long]("n_tokens") === toks0.length.toLong)
    assert(math.abs(row0.getAs[Double]("avg_neg_log_prob") - want) <= 1e-6)
  }

  test("q152 shares sum to 1 per year and the effects reconcile with " +
      "the decomposition identity and the overall delta") {
    val got = Analytics.q152MixShift(spark, sfDir).collect()
    assert(got.length === 5)
    assert(math.abs(got.map(_.getAs[Double]("share_a")).sum - 1.0) <= 1e-5)
    assert(math.abs(got.map(_.getAs[Double]("share_b")).sum - 1.0) <= 1e-5)
    got.foreach { r =>
      val ve = r.getAs[Double]("value_effect")
      val me = r.getAs[Double]("mix_effect")
      val te = r.getAs[Double]("total_effect")
      // identity holds pre-rounding; rounded pieces drift <= 3 ulp(6dp)
      assert(math.abs(ve + me - te) <= 3e-6)
    }
    // sum of total effects = overall avg(2000) - avg(1995)
    val ords = Tables.load(spark, sfDir, "orders")
      .withColumn("y", year($"o_orderdate"))
      .where($"y".isin(1995, 2000))
      .groupBy($"y").agg(
        (sum($"o_totalprice".cast("decimal(18,4)")).cast("double") /
          count(lit(1)).cast("double")).as("avg"))
      .collect().map(r => r.getAs[Int]("y") -> r.getAs[Double]("avg"))
      .toMap
    val overall = ords(2000) - ords(1995)
    assert(math.abs(got.map(_.getAs[Double]("total_effect")).sum - overall)
      <= 1e-4 * math.max(1.0, math.abs(overall)))
  }

  test("q153 transitions partition consecutive event pairs and the " +
      "dwell statistics are ordered sanely") {
    val got = Stats.q153TransitionDwell(spark, sfDir).collect()
    assert(got.nonEmpty && got.length <= 25)
    val nEvents = Tables.load(spark, sfDir, "events").count()
    val nUsers = Tables.load(spark, sfDir, "events")
      .select($"user_id").distinct().count()
    assert(got.map(_.getAs[Long]("n_transitions")).sum === nEvents - nUsers)
    got.foreach { r =>
      val mean = r.getAs[Double]("mean_s")
      val med = r.getAs[Double]("median_s")
      val p90 = r.getAs[Double]("p90_s")
      assert(mean >= 0.0 && med >= 0.0)
      assert(med <= p90 + 1e-9)
    }
  }
}
