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

  test("ORC round-trip preserves rows and schema") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val out = java.nio.file.Files
      .createTempDirectory("graft_orc_").toString + "/t"
    Sinks.writeOrc(li, out)
    val back = Sources.orc(spark, out)
    assert(back.schema === li.schema)
    assert(back.count() === li.count())
  }

  test("CSV export round-trips through the schema-declared reader") {
    val cust = Tables.load(spark, sfDir, "customer")
      .select("c_custkey", "c_name", "c_mktsegment")
    val out = java.nio.file.Files
      .createTempDirectory("graft_csv_").toString + "/t"
    Sinks.writeCsv(cust, out)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("c_custkey",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("c_name",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("c_mktsegment",
        org.apache.spark.sql.types.StringType)))
    val back = Sources.csv(spark, out, schema)
    val a = cust.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val b = back.collect().map(r => (r.getLong(0), r.getString(1))).toSet
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
