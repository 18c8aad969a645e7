package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.etl.{Sinks, Sources}

/** JSONL source/sink round-trip + corrupt-record handling. */
class JsonlSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  test("documents round-trip through gzip JSONL with schema intact") {
    val docs = Tables.load(spark, sfDir, "documents")
    val out = java.nio.file.Files
      .createTempDirectory("graft_jsonl_").toString
    Sinks.writeJsonl(docs, out)
    // Spark disallows querying only _corrupt_record from a raw JSON scan
    // (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — cache the parsed result first.
    val back = Sources.jsonl(spark, out, docSchema).cache()
    assert(back.where(col("_corrupt_record").isNotNull).count() === 0)
    val a = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = back.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b)
  }

  test("malformed lines land in _corrupt_record, not as a job failure") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_jsonl_bad_").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/part-0.json"),
      """{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}
        |this line is not json
        |{"doc_id": 2, "text": "also ok", "lang": "en", "source": "s", "n_chars": 7}
        |""".stripMargin)
    val df = Sources.jsonl(spark, dir, docSchema).cache()
    assert(df.count() === 3)
    assert(df.where(col("_corrupt_record").isNotNull).count() === 1)
    assert(df.where(col("_corrupt_record").isNull).count() === 2)
  }
}
