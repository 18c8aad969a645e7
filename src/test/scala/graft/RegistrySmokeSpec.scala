package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-wide guards. The r6 testdata regeneration broke three
  * queries at ANALYSIS time and nothing in the suite noticed — the
  * failures only surfaced when the correctness harness silently
  * dropped their rows. Planning every registered query here makes any
  * analysis/optimization breakage (type flips, renamed columns,
  * unresolved functions) a suite failure with the query's name on it,
  * whatever its oracle status.
  */
class RegistrySmokeSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  test("every registered query plans against the sf0.001 testdata") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          // force full analysis + optimization + physical planning
          fn(spark, sfDir).queryExecution.executedPlan
          None
        } catch {
          case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName} " +
            s"${Option(e.getMessage).getOrElse("").linesIterator
              .take(2).mkString(" ")}")
        }
    }
    assert(failures.isEmpty,
      s"queries failed to plan:\n  ${failures.mkString("\n  ")}")
    spark.catalog.clearCache()
  }

  test("oracle keys match registered queries; the rows-only set is " +
      "exactly the declared four") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    val orphaned = os.diff(qs)
    assert(orphaned.isEmpty, s"oracles without queries: $orphaned")
    // Declared rows-only (see SparkEntry.oracleSql scaladoc): xxhash64
    // seeds (q20/q21), HLL registers (q47), k-means float accumulation
    // order (q53). Anything else missing an oracle is a regression.
    val rowsOnly = qs.diff(os)
    assert(rowsOnly === Set("q20_minhash_signature", "q21_lsh_pairs",
      "q47_approx_distinct", "q53_ann_ivf_trained"),
      s"rows-only set drifted: $rowsOnly")
  }

  test("flagship entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0L)
  }
}
