package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.PrefixSum

/** The distributed two-pass prefix sum must equal the single-partition
  * global-window formulation exactly — on real data, on skewed keys,
  * and for any bucket count. */
class PrefixSumSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  private def globalCumsum(df: org.apache.spark.sql.DataFrame,
      order: String, value: String) = {
    val w = Window.orderBy(col(order))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("expected", coalesce(sum(col(value)).over(w), lit(0L)))
  }

  test("matches the global window on the documents table") {
    val perDoc = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        size(graft.functions.TextFunctions.tokens(col("text")))
          .cast("long").as("n"))
    val got = PrefixSum.exclusive(perDoc, "doc_id", "n", "cum", buckets = 8)
      .select(col("doc_id"), col("cum"))
    val want = globalCumsum(perDoc, "doc_id", "n")
      .select(col("doc_id"), col("expected"))
    val joined = got.join(want, "doc_id")
      .where(col("cum") =!= col("expected"))
    assert(joined.count() === 0)
  }

  test("matches under heavy key skew and tiny bucket counts") {
    // keys clustered so approxQuantile boundaries collapse (duplicates)
    val df = ((1L to 50L) ++ (1000L to 1049L) ++ (1000000L to 1000049L))
      .map(k => (k, k % 7 + 1)).toDF("k", "v")
    for (buckets <- Seq(2, 4, 32)) {
      val got = PrefixSum.exclusive(df, "k", "v", "cum", buckets)
      val want = globalCumsum(df, "k", "v")
      val bad = got.join(want, "k").where(col("cum") =!= col("expected"))
      assert(bad.count() === 0, s"mismatch at buckets=$buckets")
    }
  }

  test("ntile matches the global-window ntile exactly") {
    // n chosen so n%k != 0 (uneven fill), plus n < k (degenerate)
    for ((n, k) <- Seq((103, 10), (100, 7), (5, 10), (64, 64))) {
      val df = (1 to n).map(i => (i.toLong * 13 % 997 * 1000 + i, i))
        .toDF("key", "payload")
      val got = PrefixSum.ntile(df, "key", k, "tile", buckets = 8)
        .select(col("key"), col("tile"))
      val want = df.withColumn("expected",
        ntile(k).over(Window.orderBy(col("key"))))
        .select(col("key"), col("expected"))
      val bad = got.join(want, "key").where(col("tile") =!= col("expected"))
      assert(bad.count() === 0, s"ntile mismatch at n=$n k=$k")
    }
  }

  test("ntileCols with negated DESC key matches the DESC-window ntile") {
    // duplicate metric values force the tiebreak column to matter
    val df = (1 to 120).map(i => (i.toLong, (i % 9).toLong)).toDF("ck", "metric")
    val got = PrefixSum.ntileCols(df,
        Seq(lit(0) - col("metric"), col("ck")), 5, "tile", buckets = 8)
      .select(col("ck"), col("tile"))
    val want = df.withColumn("expected",
        ntile(5).over(Window.orderBy(col("metric").desc, col("ck").asc)))
      .select(col("ck"), col("expected"))
    val bad = got.join(want, "ck").where(col("tile") =!= col("expected"))
    assert(bad.count() === 0)
  }

  test("rankNtile rank equals row_number over the same order") {
    val df = (1 to 77).map(i => (i.toLong, (i * 31 % 13).toLong)).toDF("ck", "m")
    val got = PrefixSum.rankNtile(df, Seq(col("m"), col("ck")), 10,
        Some("rk"), "tile", buckets = 4)
      .select(col("ck"), col("rk"), col("tile"))
    val w = Window.orderBy(col("m").asc, col("ck").asc)
    val want = df
      .withColumn("erk", row_number().over(w))
      .withColumn("etile", ntile(10).over(w))
      .select(col("ck"), col("erk"), col("etile"))
    val bad = got.join(want, "ck")
      .where(col("rk") =!= col("erk") || col("tile") =!= col("etile"))
    assert(bad.count() === 0)
  }

  test("ntileMulti matches per-metric global-window ntiles exactly") {
    // three orders over the same table, incl. negated-DESC and ties
    val df = (1 to 157).map(i =>
      (i.toLong, (i % 11).toLong, (i * 7 % 13).toLong, (i * 3 % 5).toLong))
      .toDF("ck", "a", "b", "c")
    val got = PrefixSum.ntileMulti(df, "ck", Seq(
        ("ta", Seq(col("a"), col("ck"))),
        ("tb", Seq(lit(0) - col("b"), col("ck"))),
        ("tc", Seq(col("c"), col("ck")))), 5, buckets = 8)
      .select(col("ck"), col("ta"), col("tb"), col("tc"))
    val want = df
      .withColumn("ea", ntile(5).over(Window.orderBy(col("a").asc, col("ck").asc)))
      .withColumn("eb", ntile(5).over(Window.orderBy(col("b").desc, col("ck").asc)))
      .withColumn("ec", ntile(5).over(Window.orderBy(col("c").asc, col("ck").asc)))
      .select(col("ck"), col("ea"), col("eb"), col("ec"))
    val bad = got.join(want, "ck").where(
      col("ta") =!= col("ea") || col("tb") =!= col("eb") ||
        col("tc") =!= col("ec"))
    assert(bad.count() === 0)
  }

  test("result is deterministic across repeated runs") {
    val perDoc = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        size(graft.functions.TextFunctions.tokens(col("text")))
          .cast("long").as("n"))
    val a = PrefixSum.exclusive(perDoc, "doc_id", "n", "cum")
      .select("doc_id", "cum").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = PrefixSum.exclusive(perDoc, "doc_id", "n", "cum")
      .select("doc_id", "cum").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b)
  }
}
