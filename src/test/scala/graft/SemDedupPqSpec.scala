package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** q170 semantic dedup + q171 PQ ANN — both recomputed driver-side from
  * the raw embeddings (independent md5 derivations, same fold orders),
  * so the spec pins the full verdict/ranking, not just shapes. */
class SemDedupPqSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def nib(s: String): Int =
    Integer.parseInt(md5Hex(s).substring(0, 1), 16)

  private def dot(a: Seq[Double], b: Seq[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

  /** (vec_id, v, ||v||) with the same float→double widening the engine
    * performs at scan. */
  private lazy val corpus: Seq[(Long, Seq[Double], Double)] =
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").collect().toSeq
      .map { r =>
        val v = r.getAs[scala.collection.Seq[Float]]("embedding")
          .map(_.toDouble).toSeq
        (r.getAs[Long]("vec_id"), v, math.sqrt(dot(v, v)))
      }.sortBy(_._1)

  // ---- q170 --------------------------------------------------------

  private lazy val q24Planes: Seq[Seq[Double]] =
    (0 until 4).map { p =>
      (0 until 64).map { i =>
        nib(s"q24_${p}_$i") % 4 match {
          case 0 => -3.0; case 1 => -1.0; case 2 => 1.0; case _ => 3.0
        }
      }
    }

  private def bucket(v: Seq[Double]): Int =
    q24Planes.zipWithIndex.map { case (p, i) =>
      if (dot(v, p) >= 0) 1 << i else 0
    }.sum

  test("q170 verdicts equal a driver-side brute-force SemDeDup pass") {
    val got = Similarity.q170SemanticDedup(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("bucket"),
        r.getAs[Long]("dup_of"), r.getAs[Double]("best_cosine"),
        r.getAs[Long]("n_lower_matches"))).toSet

    val byBucket = corpus.groupBy { case (_, v, _) => bucket(v) }
    val expected = byBucket.toSeq.flatMap { case (b, vs) =>
      vs.flatMap { case (id, v, n) =>
        val lower = vs.filter(_._1 < id).map { case (kid, kv, kn) =>
          (kid, dot(v, kv) / (n * kn))
        }.filter(_._2 >= Similarity.SemDedupTau)
        if (lower.isEmpty) None
        else {
          val (bestId, bestCos) = lower.minBy { case (kid, c) => (-c, kid) }
          Some((id, b.toLong, bestId,
            BigDecimal(bestCos).setScale(6, BigDecimal.RoundingMode.HALF_UP)
              .toDouble, lower.size.toLong))
        }
      }
    }.toSet

    assert(expected.nonEmpty, "threshold produced no dups at this sf")
    assert(got === expected)
  }

  test("q170 drops only docs with a lower-id near-match; survivors are clean") {
    val dropped = Similarity.q170SemanticDedup(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("dup_of"))).toMap
    dropped.foreach { case (id, keep) => assert(keep < id) }
    // greedy-lowest-id rule: the lowest vec_id can never be dropped
    assert(!dropped.contains(corpus.map(_._1).min))
  }

  test("q175 incremental semantic dedup equals a driver-side recompute " +
      "and verdicts are strictly batch-vs-history") {
    val got = graft.operators.Similarity
      .q175IncrementalSemdedup(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("dup_of_hist"),
        r.getAs[Double]("best_cosine"), r.getAs[Long]("n_collisions")))
      .toSet

    def isHist(id: Long): Boolean = md5Hex(id.toString).substring(0, 2) < "80"
    val byBucket = corpus.groupBy { case (_, v, _) => bucket(v) }
    val expected = byBucket.values.flatMap { vs =>
      val hist = vs.filter { case (id, _, _) => isHist(id) }
      vs.filterNot { case (id, _, _) => isHist(id) }.flatMap {
        case (id, v, n) =>
          val cols = hist.map { case (hid, hv, hn) =>
            (hid, dot(v, hv) / (n * hn))
          }.filter(_._2 >= graft.operators.Similarity.SemDedupTau)
          if (cols.isEmpty) None
          else {
            val (bid, bc) = cols.minBy { case (hid, c) => (-c, hid) }
            Some((id, bid,
              BigDecimal(bc).setScale(6, BigDecimal.RoundingMode.HALF_UP)
                .toDouble, cols.size.toLong))
          }
      }
    }.toSet
    assert(expected.nonEmpty, "threshold produced no verdicts at this sf")
    assert(got === expected)
    got.foreach { case (id, hid, _, _) =>
      assert(!isHist(id) && isHist(hid), s"verdict $id -> $hid crosses wrong")
    }
  }

  // ---- q171 --------------------------------------------------------

  private lazy val codebook: IndexedSeq[IndexedSeq[Seq[Double]]] =
    (0 until 8).map { s =>
      (0 until 16).map { k =>
        (0 until 8).map { i =>
          nib(s"pq_${s}_${k}_$i") % 4 match {
            case 0 => -0.3; case 1 => -0.1; case 2 => 0.1; case _ => 0.3
          }
        }: Seq[Double]
      }
    }

  private def encode(v: Seq[Double]): Seq[Int] =
    (0 until 8).map { s =>
      val xs = v.slice(s * 8, s * 8 + 8)
      (0 until 16).minBy { k =>
        val w = codebook(s)(k)
        (w.map(x => x * x).sum - 2.0 * dot(xs, w), k)
      }
    }

  test("q171 ADC ranking and exact re-rank equal a driver-side recomputation") {
    val got = Similarity.q171PqAnn(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("adc_cosine"),
        r.getAs[Double]("cosine_exact"))).toSet

    val enc = corpus.map { case (id, v, _) =>
      val c = encode(v)
      val rnorm2 = (0 until 8).map { s =>
        val w = codebook(s)(c(s)); w.map(x => x * x).sum
      }.reduce(_ + _)
      (id, c, rnorm2)
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = corpus.filter(_._1 < 10).flatMap { case (qid, qv, qn) =>
      val scored = enc.filter(_._1 != qid).map { case (cid, c, rnorm2) =>
        val adc = (0 until 8).map { s =>
          dot(qv.slice(s * 8, s * 8 + 8), codebook(s)(c(s)))
        }.reduce(_ + _) / (qn * math.sqrt(rnorm2))
        (cid, adc)
      }
      scored.sortBy { case (cid, adc) => (-adc, cid) }.take(5)
        .zipWithIndex.map { case ((cid, adc), i) =>
          val (_, cv, cn) = corpus.find(_._1 == cid).get
          (qid, i + 1, cid, r6(adc), r6(dot(cv, qv) / (cn * qn)))
        }
    }.toSet

    assert(got === expected)
  }

  test("q171 returns exactly 5 ranked neighbors per query") {
    val rows = Similarity.q171PqAnn(spark, sfDir).collect()
    val perQuery = rows.groupBy(_.getAs[Long]("query_id"))
    perQuery.foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq === (1 to 5),
        s"query $q")
    }
  }

  test("q171 quantization stays sane: top ADC neighbors carry real cosine signal") {
    // the 4-bit code keeps enough geometry that ADC's picks aren't
    // anti-correlated with the exact metric: over all shortlisted rows,
    // mean exact cosine must beat the corpus-wide mean pair cosine (~0)
    val rows = Similarity.q171PqAnn(spark, sfDir).collect()
    val meanExact =
      rows.map(_.getAs[Double]("cosine_exact")).sum / rows.length
    assert(meanExact > 0.02, s"mean exact cosine of ADC picks $meanExact")
  }
}
