package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Similarity, TextQueries}
import graft.multimodal.Multimodal

/** Invariant specs for the q31–q34 additions (each also has a DuckDB
  * oracle; these pin the semantic properties the oracle can't express).
  */
class NewQueriesSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  test("q31 near-dup pairs are within-block, ordered, above threshold") {
    val rows = Similarity.q31CosineNearDup(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("vec_a") < r.getAs[Long]("vec_b"))
      assert(r.getAs[Double]("cosine") >= 0.30)
    }
  }

  test("q32 BPE-ish count is bounded below by piece count") {
    val rows = TextQueries.q32BpeTokens(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_bpe_tokens") >= r.getAs[Int]("n_pieces").toLong)
    }
  }

  test("q177 banded aHash pairs equal a driver-side brute force (pigeonhole lossless)") {
    def hex(bytes: Array[Byte]): String =
      bytes.map(b => f"${b & 0xff}%02x").mkString
    def digest(alg: String, s: String): String =
      hex(java.security.MessageDigest.getInstance(alg)
        .digest(s.getBytes("UTF-8")))
    val docs = Tables.load(spark, sfDir, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val fps = for {
      (id, text) <- docs
      sha = digest("SHA-256", text)
      v <- 0 until Multimodal.PhashVariants
    } yield {
      val bits = Array.tabulate(64) { i =>
        val base = Integer.parseInt(digest("MD5", s"$sha:$i").substring(0, 2), 16)
        val px = if (i < 2 * v) (base + 128) % 256 else base
        if (px > 128) 1 else 0
      }
      (id, v, bits)
    }
    val expected = (for {
      ((ida, va, ba), ai) <- fps.zipWithIndex
      (idb, vb, bb) <- fps.drop(ai + 1)
      h = ba.zip(bb).count { case (x, y) => x != y }
      if h <= Multimodal.PhashHammingMax
    } yield {
      // orient by vid = media_id*3 + v, matching the query's pair order
      if (ida * 3 + va < idb * 3 + vb)
        (ida, va, idb, vb, h, if (ida == idb) 1 else 0)
      else (idb, vb, ida, va, h, if (ida == idb) 1 else 0)
    }).toSet
    val got = Multimodal.q177PhashNearDup(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("media_a"), r.getAs[Int]("variant_a"),
        r.getAs[Long]("media_b"), r.getAs[Int]("variant_b"),
        r.getAs[Int]("hamming"), r.getAs[Int]("same_media"))).toSet
    assert(got.nonEmpty)
    assert(got === expected,
      "band equi-join must recover EXACTLY the brute-force Hamming<=3 set")
    // the variant construction actually produces near-dups to find
    assert(got.count(_._6 == 1) >= docs.length,
      "each media's renditions should pair up")
  }

  test("q33 resize targets are aspect-bounded and never upscaled") {
    val rows = Multimodal.q33MediaPreprocess(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      val (rw, rh) = (r.getAs[Int]("resize_w"), r.getAs[Int]("resize_h"))
      assert(math.max(rw, rh) <= 512)
      assert(rw <= w && rh <= h, "never upscale")
      // the longest side is exactly min(longest, 512)
      assert(math.max(rw, rh) === math.min(math.max(w, h), 512))
      val sampled = r.getAs[Int]("n_sampled_frames")
      assert(sampled === (r.getAs[Int]("n_frames") - 1) / 5 + 1)
    }
  }

  test("q34 IVF probing returns ranked neighbors whose cosine never " +
      "beats brute force") {
    val ivf = Similarity.q34AnnIvf(spark, sfDir)
      .select($"query_id", $"rank", $"cosine".as("ivf_cos"))
    val bf = Similarity.q23KnnBruteForce(spark, sfDir)
      .select($"query_id", $"rank", $"cosine".as("bf_cos"))
    val joined = ivf.join(bf, Seq("query_id", "rank")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      // IVF searches a subset of the corpus: at equal rank its cosine
      // can't exceed brute force (ulp-equal at worst)
      assert(r.getAs[Double]("ivf_cos") <= r.getAs[Double]("bf_cos") + 1e-9)
    }
  }

  test("charTrigrams edge cases: short, unicode, and multi-space input") {
    import graft.functions.TextFunctions.charTrigrams
    val df = Seq("", "a", "ab", "héllo wörld", "a  b\t c").toDF("t")
      .select(col("t"), charTrigrams(col("t")).as("tg"))
    val got = df.collect().map(r =>
      r.getString(0) -> r.getSeq[String](1)).toMap
    // "" normalizes to "__" (len 2) → guarded empty, not a descending
    // sequence blowup
    assert(got("").isEmpty)
    assert(got("a") === Seq("_a_"))
    assert(got("ab") === Seq("_ab", "ab_"))
    // unicode chars survive the char-array split as single elements
    assert(got("héllo wörld").contains("_hé"))
    assert(got("héllo wörld").contains("o_w"))
    // runs of mixed whitespace collapse to one boundary
    assert(got("a  b\t c") === Seq("_a_", "a_b", "_b_", "b_c", "_c_"))
  }

  test("nBpeTokens: long words split, punctuation separates, " +
      "count bounded by piece count") {
    import graft.functions.TextFunctions.{bpePieces, nBpeTokens}
    val df = Seq("hello world", "internationalization", "a,b!c", "42 cats")
      .toDF("t")
      .select(col("t"), bpePieces(col("t")).as("p"),
        nBpeTokens(col("t")).as("n"))
    val got = df.collect().map(r =>
      r.getString(0) -> ((r.getSeq[String](1), r.getLong(2)))).toMap
    assert(got("hello world")._1 === Seq("hello", " world"))
    assert(got("hello world")._2 === 2L)
    // 20-char word → ceil(20/6) = 4 subword units
    assert(got("internationalization")._2 === 4L)
    assert(got("a,b!c")._1 === Seq("a", ",", "b", "!", "c"))
    assert(got("42 cats")._1 === Seq("42", " cats"))
  }

  test("bottom-k sample is invariant to input partitioning") {
    val data = (1 to 500).map(i => (f"h$i%04d-${i * 7 % 13}", i.toLong))
    def sample(parts: Int): Seq[(String, Long)] = {
      val agg = new graft.functions.BottomKSample(32)
      spark.createDataset(data).repartition(parts)
        .select(agg.toColumn).head()
    }
    val one = sample(1)
    assert(one.length === 32)
    assert(sample(7) === one)
    assert(sample(13) === one)
    // and it equals the global-sort answer
    assert(one === data.sorted.take(32))
  }

  test("q186 all-pairs TF-IDF: ordered pairs, cosine in (0,1], and every " +
      "identical-text pair surfaces at cosine 1") {
    val rows = TextQueries.q186AllPairsTfidf(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      val c = r.getAs[Double]("cosine")
      assert(c > 0.0 && c <= 1.0)
    }
    val got = rows.map(r =>
      (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    // identical normalized token streams => identical vectors => cos 1
    val dups = Tables.load(spark, sfDir, "documents")
      .select($"doc_id", md5($"text").as("h")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._2).values.toSeq.filter(_.length > 1)
      .flatMap { g =>
        val ids = g.map(_._1).toSeq
        for { a <- ids; b <- ids if a < b } yield (a, b)
      }.toSet
    assert(dups.subsetOf(got),
      s"missing exact-dup pairs: ${(dups -- got).take(5)}")
    val byPair = rows.map(r => (r.getAs[Long]("doc_a"),
      r.getAs[Long]("doc_b")) -> r.getAs[Double]("cosine")).toMap
    dups.foreach(p => assert(byPair(p) === 1.0))
  }

  test("q183 frame energies match a driver-side short-time recomputation") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.map { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      val n = bytes.length
      val nFrames =
        if (n >= Multimodal.AudioWin) (n - Multimodal.AudioWin) / Multimodal.AudioHop + 1
        else 0
      val en = Array.tabulate(nFrames) { f =>
        (0 until Multimodal.AudioWin).map { j =>
          val v = (bytes(f * Multimodal.AudioHop + j) & 0xff) - 128
          v.toLong * v
        }.sum
      }
      if (nFrames == 0) (id, n.toLong, 0, 0L, -1L, -1L, 0)
      else {
        val peak = en.max
        (id, n.toLong, nFrames, en.sum, peak,
          en.indexOf(peak).toLong, en.count(_ * 2 >= peak))
      }
    }.toSet
    val got = Multimodal.q183AudioFrames(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("n_samples"),
        r.getAs[Int]("n_frames"), r.getAs[Long]("total_energy"),
        r.getAs[Long]("peak_energy"), r.getAs[Long]("peak_frame"),
        r.getAs[Int]("n_loud"))).toSet
    assert(got === expected)
  }

  test("q203 variant extraction agrees with the string-JSON lane (q12)") {
    val variant = graft.operators.CoreQueries
      .q203VariantExtract(spark, sfDir)
      .select($"event_type", $"n_events", $"sum_k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val stringLane = graft.operators.CoreQueries
      .q12JsonExtract(spark, sfDir)
      .select($"event_type", $"n_events", $"sum_k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(variant === stringLane)
  }

  test("q191 md5-HLL registers and estimate match a driver-side sketch") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    val pairs = Tables.load(spark, sfDir, "events")
      .select($"event_type", $"user_id").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val expected = pairs.groupBy(_._1).map { case (et, rows) =>
      val regs = new Array[Int](64)
      rows.map(_._2).distinct.foreach { u =>
        val h = md5hex(s"q191_$u")
        val bucket = Integer.parseInt(h.substring(0, 2), 16) % 64
        val w = java.lang.Long.parseLong(h.substring(2, 15), 16)
        val rho =
          if (w == 0L) 53 else 53 - java.lang.Long.toBinaryString(w).length
        regs(bucket) = math.max(regs(bucket), rho)
      }
      val denom = regs.map(m => 1L << (53 - m)).sum
      (et, rows.map(_._2).distinct.length.toLong,
        regs.count(_ > 0).toLong, denom,
        BigDecimal(2.6157483096520143e19 / denom.toDouble)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSet
    val got = graft.operators.Analytics.q191HllMd5(spark, sfDir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("exact_users"),
        r.getAs[Long]("nonempty"), r.getAs[Long]("denom_scaled"),
        r.getAs[Double]("hll_est"))).toSet
    assert(got === expected)
    // raw HLL is only calibrated above ~2.5m distincts (below that a
    // production sketch switches to linear counting); assert accuracy
    // in the calibrated regime and the known overestimate bias below it
    got.foreach { case (_, exact, _, _, est) =>
      if (exact >= 160) assert(math.abs(est - exact) / exact.toDouble < 0.25)
      else assert(est >= exact.toDouble * 0.75)
    }
  }

  test("q190 shot boundaries and keyframe sample match a driver-side " +
      "recomputation") {
    val fl = Multimodal.VideoFrame
    val docs = Tables.load(spark, sfDir, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.map { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      val nFrames = bytes.length / fl
      val en = Array.tabulate(nFrames) { f =>
        (0 until fl).map { j =>
          val v = (bytes(f * fl + j) & 0xff) - 128; v.toLong * v
        }.sum
      }
      if (nFrames == 0) (id, 0, 0, -1, 0L, -1)
      else {
        val peak = en.max
        // 1-indexed frame positions, matching the query's convention
        val starts = 1 +: (2 to nFrames).filter(k =>
          math.abs(en(k - 1) - en(k - 2)) * 4 >= peak)
        val ends = starts.drop(1) :+ (nFrames + 1)
        (id, nFrames, starts.size,
          if (starts.size > 1) starts(1) else -1,
          starts.map(k => en(k - 1)).sum,
          starts.zip(ends).map { case (a, b) => b - a }.max)
      }
    }.toSet
    val got = Multimodal.q190VideoShots(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Int]("n_frames"),
        r.getAs[Int]("n_shots"), r.getAs[Int]("first_cut"),
        r.getAs[Long]("sampled_energy"), r.getAs[Int]("longest_shot")))
      .toSet
    assert(got === expected)
    // at least one real multi-shot video in the corpus, or the cut
    // predicate is vacuous at this sf
    assert(got.exists(_._3 > 1))
  }
}
