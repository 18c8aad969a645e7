package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Backward as-of join — the point-in-time lookup the reference's batch
  * pipeline never needed but every event/feature pipeline does (and which
  * Spark has no built-in operator for).
  *
  * Implementation is the union-and-carry-forward plan, not a per-key
  * range probe: tag both sides, union them, and run ONE window pass that
  * carries the latest right-side payload forward in time. Cost at scale:
  * a single hash shuffle of |L|+|R| rows on the key plus a per-partition
  * sort — the same shape as a sort-merge join, with no range re-scan, no
  * driver-side loop, and no O(|L|·|R|) candidate blow-up. This is the
  * plan you want on a 1000-executor cluster: both inputs co-partition on
  * the key once and stream in time order.
  */
object AsofJoin {

  /** For every `left` row, attach `payload` from the `right` row with the
    * greatest `time` <= the left row's `time` within the same `key`
    * (inclusive). Left rows with no prior right row keep null payload.
    *
    * Ties: right rows sharing (key, time) resolve to the one with the
    * greatest payload struct (field order = `payload` order), so put a
    * unique id first in `payload` for a deterministic winner.
    */
  /** q141 — tolerance-bounded as-of join: each purchase attaches the
    * user's latest PRIOR view event, but only if it is fresh enough
    * (≤ 2 h old) — staler matches null out. This is the as-of
    * variant feature stores call a "staleness bound": a lookup that
    * silently joins month-old state is worse than no join at all.
    * Same single-shuffle union+window plan as q37/q90 (the tolerance
    * is a residual map-side filter on the matched pair, NOT a join
    * condition — the join stays equi+window shaped); DuckDB's native
    * ASOF LEFT JOIN plus one CASE is the oracle. */
  def q141AsofTolerance(s: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.load(s, dir, "events")
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id"), col("ts"),
        col("event_id").as("view_id"), col("ts").as("view_ts"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val ToleranceSec = 7200L
    backward(purchases, views, "user_id", "ts", Seq("view_id", "view_ts"))
      .withColumn("secs_since_view",
        unix_timestamp(col("ts")) - unix_timestamp(col("view_ts")))
      .select(col("event_id"), col("user_id"),
        when(col("secs_since_view") <= ToleranceSec, col("view_id"))
          .as("view_id"),
        when(col("secs_since_view") <= ToleranceSec,
          col("secs_since_view")).as("secs_since_view"),
        (col("view_ts").isNotNull &&
          col("secs_since_view") > ToleranceSec).as("stale_dropped"))
      .orderBy(col("event_id"))
  }

  def backward(left: DataFrame, right: DataFrame,
               key: String, time: String, payload: Seq[String]): DataFrame = {
    val packed = right.select(
      col(key), col(time), lit(0).as("__side"),
      struct(payload.map(col): _*).as("__p"))
    val tagged = left
      .withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(packed.schema("__p").dataType))
    // Right rows lack the left-only columns -> null-filled by unionByName.
    val unioned = tagged.unionByName(packed, allowMissingColumns = true)
    // At equal time, __side sorts right rows (0) before left rows (1), so
    // "<= time" is inclusive; rows-frame + last(ignoreNulls) carries the
    // latest payload forward. The struct is carried atomically — a null
    // field inside a matched payload can never mix rows.
    val w = Window.partitionBy(key)
      .orderBy(col(time).asc, col("__side").asc, col("__p").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(left.columns.map(col) ++
        payload.map(f => col("__m").getField(f).as(f)): _*)
  }

  /** q37 — as-of join over the event stream: every click event looks up
    * the user's most recent purchase at-or-before the click. The DuckDB
    * oracle is a native ASOF LEFT JOIN — semantics must match exactly,
    * including inclusivity at equal timestamps and null payloads for
    * never-purchased users. */
  def q37AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("purchase_event_id"),
        col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
    backward(clicks, purchases, "user_id", "ts",
      Seq("purchase_event_id", "purchase_ts", "purchase_value"))
      .select(
        col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"),
        col("purchase_event_id"), col("purchase_value"),
        // truncated-second difference == DuckDB date_diff('second', ...)
        (unix_timestamp(col("ts")) - unix_timestamp(col("purchase_ts")))
          .as("secs_since_purchase"))
  }
}
