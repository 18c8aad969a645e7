package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

/** Property-based invariants (SURVEY §5.2-4): join-cardinality laws,
  * date substring round-trips, lexicographic-BETWEEN equivalence —
  * checked over ScalaCheck-generated inputs (seeded sampling; the
  * scalatest-scalacheck glue artifact isn't available offline). */
class PropertySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("left join against a unique-key dim preserves cardinality; " +
    "dup keys fan out by exactly the dup count") {
    val factGen = Gen.listOfN(60, Gen.chooseNum(1L, 20L))
    samples(factGen, 10).foreach { keys =>
      val fact = keys.zipWithIndex.toDF("k", "v")
      val uniqueDim = (1L to 20L).map(k => (k, s"d$k")).toDF("k", "d")
      val dupDim = ((1L to 20L).map(k => (k, s"d$k")) :+ ((7L, "dup")))
        .toDF("k", "d")
      assert(fact.join(uniqueDim, Seq("k"), "left").count() === keys.size)
      val expectedFanOut = keys.size + keys.count(_ == 7L)
      assert(fact.join(dupDim, Seq("k"), "left").count() === expectedFanOut)
    }
  }

  test("yyyymmdd substring decomposition round-trips for any date") {
    val dateGen = Gen.chooseNum(0L, 3650L)
      .map(d => java.time.LocalDate.of(1995, 1, 1).plusDays(d))
    val fmt = java.time.format.DateTimeFormatter.BASIC_ISO_DATE
    val dates = samples(dateGen, 50).map(_.format(fmt))
    val rows = dates.toDF("ymd")
      .select(
        concat(substring($"ymd", 1, 4), substring($"ymd", 5, 2),
          substring($"ymd", 7, 2)).as("back"),
        $"ymd")
      .collect()
    rows.foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  test("string yyyymmdd BETWEEN == date BETWEEN (P4 trap holds generally)") {
    val dGen = Gen.chooseNum(0, 3650)
    val base = java.time.LocalDate.of(1995, 1, 1)
    val fmt = java.time.format.DateTimeFormatter.BASIC_ISO_DATE
    samples(Gen.zip(dGen, dGen, dGen), 100).foreach { case (a, b, x) =>
      val (lo, hi) = (base.plusDays(a min b), base.plusDays(a max b))
      val d = base.plusDays(x)
      val stringAnswer = {
        val s = d.format(fmt)
        s >= lo.format(fmt) && s <= hi.format(fmt)
      }
      val dateAnswer = !d.isBefore(lo) && !d.isAfter(hi)
      assert(stringAnswer === dateAnswer)
    }
  }

  test("distributed prefix sum equals the sequential scan on random " +
      "key/value sets and bucket counts") {
    val genRows = for {
      n <- Gen.chooseNum(1, 120)
      keys <- Gen.listOfN(n, Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2))
      vals <- Gen.listOfN(n, Gen.chooseNum(0L, 1000L))
    } yield keys.distinct.zip(vals)
    samples(genRows, 8).zipWithIndex.foreach { case (rows, i) =>
      val buckets = Seq(2, 5, 16, 64)(i % 4)
      val df = rows.toDF("k", "v")
      val got = graft.operators.PrefixSum
        .exclusive(df, "k", "v", "cum", buckets)
        .select("k", "cum").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expected = rows.sortBy(_._1)
        .scanLeft((0L, 0L)) { case ((_, acc), (k, v)) => (k, acc + v) }
      // scan yields (k_i, prefix INCLUSIVE of v_i); rebuild exclusive
      val exclusive = rows.sortBy(_._1).map(_._1)
        .zip(expected.init.map(_._2)).toMap
      assert(got === exclusive, s"buckets=$buckets n=${rows.size}")
    }
  }
}
