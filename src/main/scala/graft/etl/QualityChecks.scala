package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit (deequ-shaped, engine-native): a set
  * of constraints compiles into ONE aggregate pass over the table —
  * however many checks you declare, the fact is scanned once and the
  * report is checks-sized. The reference pipeline has no quality gate
  * at all (bad rows flow silently into the marts); at 100 TB a
  * second full scan per constraint is the difference between one job
  * and a day of them.
  *
  * Row-level checks (null / range / set-membership) become
  * `sum(case when violation)` columns in a single projection;
  * uniqueness rides the same pass as `count(*) - count(distinct key)`
  * (Catalyst plans the mixed distinct/non-distinct aggregate with one
  * Expand — still one scan). Referential integrity is the only
  * multi-table check: a broadcast anti-join count per foreign key,
  * unioned into the same tall report.
  */
object QualityChecks {

  /** A row-level constraint: `violation` is true on rows that BREAK it.
    * Null-valued predicates count as non-violations — write the
    * predicate so nulls land where the contract wants them. */
  final case class RowCheck(name: String, violation: Column)

  /** Key-uniqueness constraint: violations = n_rows − n_distinct. */
  final case class UniqueCheck(name: String, keys: Seq[Column])

  /** Referential-integrity constraint: rows of the audited table whose
    * `key` has no match in `dim(dimKey)`. Null keys don't violate
    * (SQL FK semantics). The dim side broadcasts when small; at
    * dimension scale the anti-join shuffles both sides on the key.
    *
    * When the dim key is UNIQUE and the dim broadcasts, prefer folding
    * the FK into the single-pass side instead: left-join the dim before
    * `report` and declare `RowCheck(name, key.isNotNull &&
    * dimKey.isNull)` — zero extra passes (q96 does this). This variant
    * exists for dims too big to broadcast or with non-unique keys
    * (where a join would fan out rows and corrupt the other checks). */
  final case class ForeignKeyCheck(
      name: String, key: Column, dim: DataFrame, dimKey: Column)

  /** Run all checks; returns one row per check:
    * (check_name, n_rows, n_violations, violation_rate, passed). */
  def report(df: DataFrame, rowChecks: Seq[RowCheck],
      uniqueChecks: Seq[UniqueCheck] = Nil,
      fkChecks: Seq[ForeignKeyCheck] = Nil): DataFrame = {
    require(rowChecks.nonEmpty || uniqueChecks.nonEmpty,
      "at least one single-pass check required")
    val aggs =
      rowChecks.map(c =>
        sum(when(c.violation, 1L).otherwise(0L)).as(c.name)) ++
      uniqueChecks.map(c =>
        (count(lit(1)) - count_distinct(c.keys.head, c.keys.tail: _*))
          .as(c.name))
    // The 1-row aggregate is referenced twice when FK checks need its
    // n_rows — cache it so the table isn't scanned once per reference.
    val wide0 = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val wide = if (fkChecks.nonEmpty) wide0.cache() else wide0
    val tall = wide.unpivot(
      Array(col("n_rows")),
      (rowChecks.map(_.name) ++ uniqueChecks.map(_.name)).map(col).toArray,
      "check_name", "n_violations")
    val nRows = wide.select(col("n_rows"))
    val fkTall = fkChecks.map { c =>
      df.select(c.key.as("__k")).where(col("__k").isNotNull)
        .join(c.dim.select(c.dimKey.as("__d")),
          col("__k") === col("__d"), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .withColumn("check_name", lit(c.name))
        .crossJoin(broadcast(nRows))
        .select(col("n_rows"), col("check_name"), col("n_violations"))
    }
    fkTall.foldLeft(tall)(_ unionByName _)
      .select(col("check_name"), col("n_rows"), col("n_violations"),
        round(col("n_violations").cast("double") / col("n_rows"), 6)
          .as("violation_rate"),
        (col("n_violations") === 0L).as("passed"))
  }
}
