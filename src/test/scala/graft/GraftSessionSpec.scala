package graft

import org.scalatest.funsuite.AnyFunSuite

/** GraftSession.build returns a ready session: custom SQL functions
  * registered, reference write semantics + engine defaults applied.
  * (In-JVM it resolves to the shared test session via getOrCreate;
  * runtime SQL confs and registrations still apply.) */
class GraftSessionSpec extends AnyFunSuite {

  test("build() yields a session with engine functions and defaults") {
    TestSpark.spark // ensure the shared session exists first
    val s = GraftSession.build(master = "local[8]")
    assert(s.sql("SELECT simhash64(array('a','b'))").collect().length === 1)
    assert(s.sql("SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d))")
      .collect().head.getDouble(0) === 11.0)
    assert(s.conf.get("spark.sql.sources.partitionOverwriteMode")
      === "dynamic")
    assert(s.conf.get("spark.sql.session.timeZone") === "UTC")
    assert(s.sparkContext.hadoopConfiguration
      .get("mapreduce.fileoutputcommitter.marksuccessfuljobs") === "false")
  }
}
