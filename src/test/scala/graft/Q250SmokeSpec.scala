package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Wiring smoke for the q250 gate query: the Spark result must equal
  * the oracle semantics (lineitem minus the MOR-deleted low band)
  * computed independently. */
class Q250SmokeSpec extends AnyFunSuite {
  import TestSpark.spark

  test("q250_compact_where matches its oracle semantics at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val got = operators.FormatQueries.q250CompactWhere(spark, dir)
      .collect().toSeq
    val li = Tables.load(spark, dir, "lineitem")
    val cut = li.agg(max("l_orderkey")).head().getLong(0) / 2
    val want = li
      .where(!(col("l_orderkey") % 10 === 0 &&
        col("l_orderkey") <= cut))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("l_quantity").cast("decimal(18,4)"))
          .cast("double"), 2).as("qty_sum"))
      .orderBy(col("l_returnflag"))
      .collect().toSeq
    assert(got == want)
  }
}
