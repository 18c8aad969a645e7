package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.Sources
import graft.operators.JdbcQueries

/** S1/S2 JDBC ingest against an embedded Derby database — the closest
  * in-sandbox analogue of the reference's PostgreSQL T0 extract
  * (jb_de_enhancement_t0_fact_d2s.py:72-82). Covers both reference
  * modes (dbtable full scan, pushdown subquery) plus the two things
  * that matter at scale: Catalyst predicate pushdown INTO the database
  * and the partitioned multi-connection read. */
class JdbcSourceSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  private lazy val url = JdbcQueries.scratchUrl(spark, "specdb")
  private lazy val supplier = Tables.load(spark, sfDir, "supplier")
    .select(col("s_suppkey"), col("s_nationkey"), col("s_acctbal"))
  private lazy val staged: Unit =
    JdbcQueries.stage(supplier, url, "supplier")

  test("S1 dbtable mode: full-table scan round-trips every row and type") {
    staged
    val back = Sources.jdbc(spark, url, "supplier")
    assert(back.count() === supplier.count())
    // exact numeric round trip: BIGINT/INTEGER/DOUBLE map losslessly
    val a = supplier.agg(sum(col("s_suppkey")), sum(col("s_nationkey")),
      sum(col("s_acctbal").cast("decimal(18,4)"))).head
    val b = back.agg(sum(col("s_suppkey")), sum(col("s_nationkey")),
      sum(col("s_acctbal").cast("decimal(18,4)"))).head
    assert(a === b)
  }

  test("S2 pushdown-subquery mode: the (SELECT … WHERE …) t form " +
      "returns exactly the database-filtered rows") {
    staged
    val filtered = Sources.jdbc(spark, url,
      """(SELECT * FROM supplier WHERE "s_nationkey" < 10) t""")
    val expected = supplier.where(col("s_nationkey") < 10).count()
    assert(filtered.count() === expected)
    assert(filtered.agg(max(col("s_nationkey"))).head.getInt(0) < 10)
  }

  test("Catalyst pushes DataFrame filters into the JDBC scan " +
      "(the predicate runs in the database, not in Spark)") {
    staged
    val df = Sources.jdbc(spark, url, "supplier")
      .where(col("s_nationkey") < 10)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters:") && p.contains("LessThan(s_nationkey"),
      s"expected the nationkey predicate in PushedFilters:\n$p")
  }

  test("partitioned read splits into numPartitions independent " +
      "range-bounded connections") {
    staged
    val parts = Sources.jdbc(spark, url, "supplier", Map(
      "partitionColumn" -> "\"s_suppkey\"",
      "lowerBound" -> "0", "upperBound" -> "1000000",
      "numPartitions" -> "4"))
    assert(parts.rdd.getNumPartitions === 4)
    // splits partition the table: no row lost or duplicated
    assert(parts.count() === supplier.count())
  }

  test("D6 credential provider: secrets resolve AT READ TIME through " +
      "the provider seam (once per read), merge under explicit props, " +
      "and the env default no-ops when unset") {
    staged
    // counting fake standing in for a vault: invoked exactly once per
    // read, its secrets land in the connection options (Derby embedded
    // accepts any user, so the read succeeding proves they were
    // passed, not rejected)
    // (Derby scopes unqualified names by the connecting user's schema,
    // so authenticated reads qualify the staged table as APP.supplier)
    var calls = 0
    val vault: Sources.CredentialsProvider = () => {
      calls += 1
      Map("user" -> "svc_graft", "password" -> "rotatedsecret")
    }
    val viaVault = Sources.jdbc(spark, url, "APP.supplier", creds = vault)
    assert(viaVault.count() === supplier.count())
    assert(calls == 1, "the provider must resolve once per read")
    Sources.jdbc(spark, url, "APP.supplier", creds = vault).count()
    assert(calls == 2,
      "each read re-resolves — rotation needs no restart")
    // explicit props override the provider's keys on conflict
    var sawOverride = false
    val loud: Sources.CredentialsProvider = () => {
      sawOverride = true; Map("user" -> "fromvault")
    }
    val overridden = Sources.jdbc(spark, url, "APP.supplier",
      props = Map("user" -> "explicitwins"), creds = loud)
    assert(overridden.count() === supplier.count())
    assert(sawOverride)
    // default env provider: with neither env var set it contributes
    // nothing (the embedded-Derby/no-auth case)
    assert(Sources.fromEnv().isEmpty ||
      (sys.env.contains("GRAFT_JDBC_USER") ||
        sys.env.contains("GRAFT_JDBC_PASSWORD")))
  }

  test("q157 JDBC extract matches the same aggregate computed " +
      "directly on the parquet table") {
    val viaJdbc = JdbcQueries.q157JdbcSource(spark, sfDir).collect()
    val direct = supplier
      .where(col("s_acctbal") > 0)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_suppliers"),
        round(sum(col("s_acctbal").cast("decimal(18,4)")).cast("double"), 2)
          .as("total_bal"))
      .orderBy(col("s_nationkey"))
      .collect()
    assert(viaJdbc.toSeq === direct.toSeq)
  }
}
