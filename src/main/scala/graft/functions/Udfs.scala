package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import java.time.LocalDate
import java.time.format.{DateTimeFormatter, TextStyle}
import java.util.Locale

/** The engine's UDF extension surface (SURVEY §2.9-U1).
  *
  * The reference registers a Python UDF that concatenates
  * (year, month, day) strings, parses `%Y%m%d`, and returns the English
  * weekday name — with the literal fallback string
  * "Invalid date format. Please" on parse failure (sic, truncated in the
  * original source, jb_de_enhancement_t2_salesbydatetime_s2s.py:63-74).
  *
  * Primary implementation is the builtin-expression form (no
  * serialization boundary, codegen-friendly); the registered Scala UDF
  * exists to prove the extension point and byte-match the fallback.
  */
object Udfs {

  /** The reference UDF's exact fallback literal. */
  val InvalidDateFallback = "Invalid date format. Please"

  private val ymd = DateTimeFormatter.ofPattern("yyyyMMdd")

  /** Scala UDF form — runs in the JVM (no Python-worker boundary, the
    * reference's single worst structural inefficiency per SURVEY §3.3). */
  val changeDayOfWeek: (String, String, String) => String =
    (year, month, day) =>
      try LocalDate.parse(s"$year$month$day", ymd)
        .getDayOfWeek.getDisplayName(TextStyle.FULL, Locale.ENGLISH)
      catch { case _: Exception => InvalidDateFallback }

  /** Register for use from SQL / `expr` as `change_day_of_week`. */
  def register(spark: SparkSession): Unit =
    spark.udf.register("change_day_of_week", changeDayOfWeek)

  /** Builtin-expression equivalent (preferred): null-safe weekday name
    * with the same fallback literal, entirely inside codegen.
    * `try_to_date`, not `to_date` — ANSI mode (Spark 4 default) makes
    * `to_date` THROW on unparseable input instead of returning null. */
  def dayOfWeekExpr(year: Column, month: Column, day: Column): Column =
    coalesce(
      date_format(try_to_date(concat(year, month, day), "yyyyMMdd"),
        "EEEE"),
      lit(InvalidDateFallback))
}
