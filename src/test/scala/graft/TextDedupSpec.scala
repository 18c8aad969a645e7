package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.functions.SimHash
import graft.operators.{Dedup, TextQueries}

class TextDedupSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  test("token metrics on a known sentence") {
    val df = Seq((1L, "the cat sat on the mat")).toDF("doc_id", "text")
    val r = df.select(
      nTokens($"text").as("n"),
      nUniqueTokens($"text").as("u"),
      stopwordHits($"text").as("s")).head()
    assert(r.getInt(0) === 6)
    assert(r.getInt(1) === 5) // "the" repeats
    assert(r.getInt(2) === 3) // the, on, the
  }

  test("langId picks marker language; und when nothing matches") {
    val df = Seq(
      (1L, "the cat and the dog"),
      (2L, "el perro de la casa"),
      (3L, "der hund und die katze"),
      (4L, "le chat et les chiens"),
      (5L, "xyzzy plugh")).toDF("doc_id", "text")
    val got = df.select($"doc_id", langId($"text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "en", 2L -> "es", 3L -> "de", 4L -> "fr",
      5L -> "und"))
  }

  test("exact dedup groups whitespace/case variants") {
    val df = Seq(
      (1L, "Hello  World"),
      (2L, "hello world"),
      (3L, "something else")).toDF("doc_id", "text")
    val groups = df.groupBy(fingerprint($"text").as("fp"))
      .agg(min($"doc_id").as("keep"), count($"doc_id").as("n"))
      .collect()
    assert(groups.length === 2)
    val dupGroup = groups.find(_.getAs[Long]("n") == 2L).get
    assert(dupGroup.getAs[Long]("keep") === 1L)
  }

  test("LSH candidate pairs find a planted near-duplicate") {
    val base = "spark engine shuffles partitions across the cluster " +
      "while catalyst optimizes the logical plan into physical operators"
    val nearDup = base.replace("cluster", "fleet")
    val filler: Seq[(Long, String)] = (2L to 40L).map(i =>
      i -> (s"totally unrelated document number $i " +
        s"with content about topic${i} and subject${i * 7} plus filler${i}"))
    val docs = (Seq((0L, base), (1L, nearDup)) ++ filler)
      .toDF("doc_id", "text")
    val pairs = Dedup.candidatePairs(docs, 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((0L, 1L)))
  }

  test("simhash: near-dup texts within small hamming distance, unrelated far") {
    val df = Seq(
      (1L, "spark engine shuffles partitions across the cluster nodes fast"),
      (2L, "spark engine shuffles partitions across the cluster nodes quickly"),
      (3L, "completely different content about cooking pasta with tomatoes"))
      .toDF("doc_id", "text")
      .select($"doc_id", SimHash.simhash64(tokens($"text")).as("sh"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(m(1L), m(2L)) < hamming(m(1L), m(3L)))
    assert(hamming(m(1L), m(2L)) <= 16)
  }

  test("q16 langid confusion matrix covers every labeled language") {
    val langs = TextQueries.q16LangId(spark, sfDir)
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs === Set("en", "de", "es", "fr", "zh"))
  }

  test("q104 custom Generator emits exactly the trigrams of a known " +
      "token array and matches the builtin-explode formulation") {
    import org.apache.spark.sql.functions._
    val df = Seq((1L, "a b c d"), (2L, "x y"), (3L, "p q r"))
      .toDF("id", "text")
      .select(col("id"), split(col("text"), " ").as("toks"))
    val rows = graft.functions.NGramGenerate(df, "toks", 3)
      .select(col("id"), col("pos"), col("ngram")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(rows === Set((1L, 0, "a b c"), (1L, 1, "b c d"),
      (3L, 0, "p q r")), "2-token doc emits nothing; windows tile")
    // equivalence with the builtin formulation on real docs
    val d = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokens(col("text")).as("toks"))
    val got = graft.functions.NGramGenerate(d, "toks", 3)
      .groupBy("ngram").count()
    val want = d.select(explode(expr(
        "transform(sequence(0, size(toks) - 3), " +
          "i -> concat_ws(' ', slice(toks, i + 1, 3)))")).as("ngram"))
      .where(size(col("toks")) >= 3)
      .groupBy("ngram").count()
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("q102 prefix-filtered Jaccard join equals the brute-force " +
      "all-pairs join (losslessness) and respects the threshold") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions.tokens
    val tok = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        explode(array_distinct(tokens(col("text")))).as("token"))
    val sizes = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val brute = tok.as("a").join(tok.as("b"),
        col("a.token") === col("b.token") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("n_a")),
        Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("n_b")),
        Seq("doc_b"))
      .where(col("shared") * 39 >= (col("n_a") + col("n_b")) * 19)
      .select(col("doc_a"), col("doc_b"), col("shared"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val got = graft.operators.Dedup.q102PrefixJaccardJoin(spark, sfDir)
      .collect()
    got.foreach { r =>
      val jac = r.getAs[Double]("jaccard")
      assert(jac >= 0.95 - 1e-9, s"below threshold: $jac")
    }
    val gotSet = got.map(r => (r.getAs[Long]("doc_a"),
      r.getAs[Long]("doc_b"), r.getAs[Long]("shared"))).toSet
    assert(gotSet === brute, "prefix filtering must be lossless")
  }

  test("q168 incremental dedup matches a driver-side recomputation and " +
      "its statuses partition the batch correctly") {
    import graft.functions.TextFunctions.fingerprint
    val got = graft.operators.Dedup.q168IncrementalDedup(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("fingerprint"),
        r.getAs[String]("status"),
        Option(r.getAs[java.lang.Long]("canonical_id")).map(_.toLong)))

    // driver-side recomputation from raw rows
    val rows = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), fingerprint(col("text")).as("fp"),
        (substring(md5(col("doc_id").cast("string")), 1, 2) < "80")
          .as("is_hist"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    val histCanon = rows.filter(_._3).groupBy(_._2)
      .map { case (fp, xs) => fp -> xs.map(_._1).min }
    val batch = rows.filterNot(_._3)
    val batchFirst = batch.groupBy(_._2)
      .map { case (fp, xs) => fp -> xs.map(_._1).min }
    val want = batch.map { case (id, fp, _) =>
      histCanon.get(fp) match {
        case Some(c) => (id, fp, "dup_of_history", Some(c))
        case None if batchFirst(fp) < id =>
          (id, fp, "dup_in_batch", Some(batchFirst(fp)))
        case None => (id, fp, "novel", None)
      }
    }.toSet
    assert(got.toSet === want)
    // the batch half must be fully accounted for, and novel docs carry
    // fingerprints absent from history and unique among novels
    assert(got.length === batch.length)
    val novels = got.filter(_._3 == "novel")
    assert(novels.map(_._2).distinct.length === novels.length)
    novels.foreach { case (_, fp, _, c) =>
      assert(!histCanon.contains(fp) && c.isEmpty)
    }
  }

  test("q168 dup branches fire on a corpus with real duplicates: " +
      "dup_of_history and dup_in_batch canonicals are correct") {
    // The shipped testdata has all-unique fingerprints, so the dedup
    // branches would otherwise pass vacuously — this corpus forces
    // every status. Under the md5-prefix split of ids 0..39, ids
    // 6/9/11/17/... are history and 0/1/2/3/... are batch; assign:
    //  - key "H": history id 6 + batch ids 0,1  → dup_of_history
    //  - key "B": batch ids 2,3 only            → novel + dup_in_batch
    //  - key "N": batch id 4 only               → novel
    //  - everything else unique
    val docs = (0L until 40L).map { i =>
      val text = i match {
        case 6 | 0 | 1 => "key H"
        case 2 | 3 => "key B"
        case 4 => "key N"
        case _ => s"unique $i"
      }
      (i, text)
    }.toDF("doc_id", "text")
    val got = graft.operators.Dedup.incrementalDedup(docs)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("status"),
        Option(r.getAs[java.lang.Long]("canonical_id")).map(_.toLong)))
    val statuses = got.map(_._2).toSet
    assert(statuses === Set("dup_of_history", "dup_in_batch", "novel")
      || statuses === Set("dup_of_history", "dup_in_batch"),
      s"dup branches must fire, got $statuses")
    assert(got.count(_._2 == "dup_of_history") > 0)
    assert(got.count(_._2 == "dup_in_batch") > 0)

    // driver-side ground truth
    val isHist = (id: Long) => {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      md.substring(0, 2) < "80"
    }
    val key = (i: Long) => i match {
      case 6 | 0 | 1 => "key H"
      case 2 | 3 => "key B"
      case 4 => "key N"
      case _ => s"unique $i"
    }
    val all = (0L until 40L).map(i => (i, key(i), isHist(i)))
    val histCanon = all.filter(_._3).groupBy(_._2)
      .map { case (k, xs) => k -> xs.map(_._1).min }
    val batch = all.filterNot(_._3)
    val batchFirst = batch.groupBy(_._2)
      .map { case (k, xs) => k -> xs.map(_._1).min }
    val want = batch.map { case (id, k, _) =>
      histCanon.get(k) match {
        case Some(c) => (id, "dup_of_history", Some(c))
        case None if batchFirst(k) < id => (id, "dup_in_batch",
          Some(batchFirst(k)))
        case None => (id, "novel", None)
      }
    }.toSet
    assert(got.toSet === want)
  }

  test("q169 incremental near-dup: verdicts are batch-vs-history, " +
      "jaccards are exact, and LSH recall never exceeds brute force") {
    import graft.functions.TextFunctions
    val got = graft.operators.Dedup.q169IncrementalNeardup(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("best_match"),
        r.getAs[Double]("best_jaccard"), r.getAs[Long]("n_hist_matches")))
    assert(got.nonEmpty, "templated corpus must have cross-split near-dups")

    // driver-side shingle sets + split
    val rows = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        array_distinct(TextFunctions.shingles(col("text"), 2)).as("sh"),
        (substring(md5(col("doc_id").cast("string")), 1, 2) < "80")
          .as("is_hist"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toSet, r.getBoolean(2)))
    val hist = rows.filter(_._3).map(x => x._1 -> x._2).toMap
    val batch = rows.filterNot(_._3).map(x => x._1 -> x._2).toMap
    def jac(a: Set[String], b: Set[String]): Double =
      a.intersect(b).size / a.union(b).size.toDouble

    got.foreach { case (id, best, bj, n) =>
      assert(batch.contains(id), s"$id must be a batch doc")
      assert(hist.contains(best), s"$best must be a history doc")
      // the reported best jaccard is the exact recomputed value
      val exact = BigDecimal(jac(batch(id), hist(best)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(bj === exact, s"doc $id: $bj vs exact $exact")
      assert(bj >= 0.8 - 1e-12 && n >= 1)
      // banding is a filter, never an amplifier: matches and best
      // score are bounded by the brute-force truth
      val brute = hist.filter { case (_, s) => jac(batch(id), s) >= 0.8 }
      assert(n <= brute.size)
      if (brute.nonEmpty) {
        val bruteBest = BigDecimal(brute.values.map(jac(batch(id), _)).max)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(bj <= bruteBest + 1e-12)
      }
    }
  }
}
