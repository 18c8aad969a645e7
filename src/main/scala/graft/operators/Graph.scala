package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Iterative graph analytics over relational edges — PageRank on the
  * co-purchase graph (parts are nodes, "bought in the same order" the
  * edges, from q94's map-side pair expansion).
  *
  * Scale shape: each iteration is one join of the edge list with the
  * current rank vector plus one aggregate — the classic distributed
  * PageRank step. The edge list is the big side; it hash-partitions on
  * `src` ONCE and every iteration's join reuses that partitioning (the
  * rank vector is node-sized). Iterations are a fixed small count —
  * the engine runs scheduled batch refreshes, not convergence loops.
  *
  * Engine-exactness: per-edge contributions are FLOORED to integer
  * micro-units (×10¹²) before summing — floor is tie-free (unlike
  * round-half-up vs half-even, which can disagree on a ....5
  * boundary), the flooring of bit-identical doubles is bit-identical,
  * and integer sums are shuffle-order-proof. The damping update is
  * then the same correctly-rounded IEEE expression in both engines,
  * so three chained iterations stay hash-identical.
  */
object Graph {

  val Damping = 0.85
  // Written as its own literal, NOT 1.0 - Damping: both engines parse
  // the decimal string "0.15" to the same double, while 1.0 - 0.85
  // evaluates to a DIFFERENT double than parsed "0.15".
  val Teleport = 0.15
  val Iterations = 3
  val TopN = 25

  /** q101 — co-purchase PageRank: which parts sit at the center of the
    * basket graph. Returns the TopN parts by rank with degree
    * context. */
  def q101Pagerank(s: SparkSession, dir: String): DataFrame = {
    val items = Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
      // no pre-distinct: collect_set dedupes, and its PARTIAL aggregate
      // dedupes map-side — one exchange instead of two
      .groupBy(col("l_orderkey"))
      .agg(collect_set(col("l_partkey")).as("parts"))
    // Deduplicate pairs in CANONICAL p1<p2 orientation — half the rows
    // through the distinct's shuffle (the dominant cost of the whole
    // query) — and mirror afterwards; the edge SET is identical to
    // deduplicating both orientations directly.
    val half = items
      .select(explode(col("parts")).as("p1"), col("parts"))
      .select(col("p1"), explode(col("parts")).as("p2"))
      .where(col("p1") < col("p2"))
      .distinct()
    // Cache the edge list: every iteration re-joins it, and without the
    // cache each of the 3 iterations would recompute the pair explosion
    // from the fact table. No unpersist here — the returned DataFrame
    // is lazy, so an unpersist at build time would empty the cache
    // BEFORE execution and every iteration would recompute (callers
    // clear session caches between runs, as Bench does).
    val edges = half.select(col("p1").as("src"), col("p2").as("dst"))
      .unionAll(half.select(col("p2").as("src"), col("p1").as("dst")))
      .cache()
    // deg/nodes are NODE-sized; cache them too, or every iteration's
    // chained rank plan re-aggregates the edge list to rebuild them.
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .cache()
    val nodes = deg.select(col("src").as("node"), col("deg"))
    val nN = nodes.count()

    // The rank vector and degree table are NODE-sized (the catalog,
    // not the fact) — BROADCAST both, so each iteration is a map-side
    // join over the cached edge partitions and the per-iteration
    // shuffle is only the dst aggregate. Without the hint the planner
    // re-exchanges the 100×-bigger edge list every iteration.
    var rank = nodes.select(col("node"),
      (lit(1.0) / nN).as(s"r"))
    for (_ <- 1 to Iterations) {
      // cache the incoming rank vector (node-sized): iteration i+1's
      // broadcast build executes rank_i's plan — without the cache
      // that re-runs EVERY earlier iteration's edge aggregation, so 3
      // iterations paid 6 edge-sized aggregates (1+2+3) instead of 3.
      // Values are unchanged: the cache replays bit-identical rows.
      rank = rank.cache()
      // floor(r/deg·1e12) is a per-SOURCE constant, so compute it on
      // the node-sized side BEFORE touching edges: one broadcast join
      // per iteration instead of two, and the per-edge work drops to
      // carrying a long — at 100 TB edges, per-edge division is the
      // term that matters. Values are bit-identical to the per-edge
      // form (same floats, same ops, evaluated once per src).
      val contribPerSrc = rank.withColumnRenamed("node", "src")
        .join(deg, Seq("src"))
        .select(col("src"),
          floor(col("r") / col("deg") * lit(1e12)).cast("bigint")
            .as("c_micro"))
      val contrib = edges
        .join(broadcast(contribPerSrc), Seq("src"))
        .groupBy(col("dst"))
        .agg(sum(col("c_micro")).as("s_micro"))
      rank = nodes
        .join(contrib, nodes("node") === contrib("dst"), "left")
        .select(col("node"),
          (lit(Teleport) / nN + lit(Damping) *
            (coalesce(col("s_micro"), lit(0L)) / lit(1e12))).as("r"))
    }
    rank.join(nodes.select(col("node"), col("deg")), Seq("node"))
      .select(col("node").as("part"), col("deg").as("degree"),
        round(col("r") * lit(1e6), 6).as("rank_ppm"))
      .orderBy(col("rank_ppm").desc, col("part").asc)
      .limit(TopN)
  }

  /** q147 — triangle counting on the co-purchase graph: parts whose
    * neighborhoods close into triangles are cross-sell cores (the
    * clustering-coefficient numerator). Edges are q94's map-side pair
    * expansion kept in canonical `p1 < p2` orientation and pruned to
    * support ≥ 2 co-orders — the support filter is what keeps the
    * two-hop join from exploding on hub parts (the standard
    * heavy-edge prune; at 100 TB the same role is played by
    * degree-ordered orientation, which this canonical ordering
    * already approximates). Triangles enumerate once each as
    * a < b < c via wedge join + closing-edge semi-check: two
    * broadcast-able self-joins at this edge cardinality, two hash
    * exchanges on the big path. Counts are exact integers — nothing
    * to drift. */
  def q147TriangleCount(s: SparkSession, dir: String): DataFrame = {
    val MinSupport = 2
    val items = Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
      // no pre-distinct: collect_set dedupes, and its PARTIAL aggregate
      // dedupes map-side — one exchange instead of two
      .groupBy(col("l_orderkey"))
      .agg(collect_set(col("l_partkey")).as("parts"))
    val edges = items
      .select(explode(col("parts")).as("p1"), col("parts"))
      .select(col("p1"), explode(col("parts")).as("p2"))
      .where(col("p1") < col("p2"))
      .groupBy(col("p1"), col("p2"))
      .agg(count(lit(1)).as("n_orders"))
      .where(col("n_orders") >= MinSupport)
      .select(col("p1"), col("p2"))
      .cache()
    val tri = edges.as("e1")
      .join(edges.as("e2"), col("e1.p2") === col("e2.p1"))
      .join(edges.as("e3"),
        col("e1.p1") === col("e3.p1") && col("e2.p2") === col("e3.p2"))
      .select(col("e1.p1").as("a"), col("e1.p2").as("b"),
        col("e2.p2").as("c"))
    val perPart = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("part"))
      .groupBy(col("part"))
      .agg(count(lit(1)).as("n_triangles"))
    val deg = edges
      .select(explode(array(col("p1"), col("p2"))).as("part"))
      .groupBy(col("part"))
      .agg(count(lit(1)).as("degree"))
    perPart.join(deg, Seq("part"))
      .orderBy(col("n_triangles").desc, col("degree").desc, col("part").asc)
      .limit(TopN)
  }

  /** q150 — two-hop co-purchase recommendations (item-based
    * collaborative filtering serving path): for each customer in a
    * declared deterministic audit slice (`c_custkey % 100 = 7` —
    * engine-portable, coordination-free), score every part reachable
    * through one co-purchase hop from their basket by the summed
    * co-order counts, drop parts they already bought (anti-join),
    * and keep the top 5 under a full (score, n_paths, partkey)
    * tie-break. Scale shape: the edge list is q147's map-side pair
    * expansion with a support-≥2 prune — NO user×user or item×item
    * self-join on the fact — so the expensive object is the
    * support-pruned edge table, which hash-joins the slice's baskets
    * on partkey. At 100 TB the slice is "all customers" and the same
    * plan holds: incidence ⋈ edges is the one big shuffle, scores are
    * exact BIGINTs, and the per-customer top-k is a rank window over
    * the scored candidates. */
  def q150CopurchaseRecs(s: SparkSession, dir: String): DataFrame = {
    val MinSupport = 2
    val TopK = 5
    val cp = Tables.load(s, dir, "orders")
      .join(Tables.load(s, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_partkey")).distinct()
    val pairs = Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
      // no pre-distinct: collect_set dedupes, and its PARTIAL aggregate
      // dedupes map-side — one exchange instead of two
      .groupBy(col("l_orderkey"))
      .agg(collect_set(col("l_partkey")).as("parts"))
      .select(explode(col("parts")).as("p1"), col("parts"))
      .select(col("p1"), explode(col("parts")).as("p2"))
      .where(col("p1") < col("p2"))
      .groupBy(col("p1"), col("p2"))
      .agg(count(lit(1)).as("n_co"))
      .where(col("n_co") >= MinSupport)
      // persisted: the symmetrization below would otherwise run the
      // basket pair-expansion (the expensive object) once per branch
      .persist()
    val edges = pairs.select(col("p1").as("src"), col("p2").as("dst"),
        col("n_co"))
      .unionAll(pairs.select(col("p2").as("src"), col("p1").as("dst"),
        col("n_co")))
    // slice first, persist once: both the scoring join and the
    // "already bought" anti-join only ever need the slice's baskets,
    // so neither re-runs the orders⋈lineitem incidence build
    val cpSlice = cp.where(pmod(col("o_custkey"), lit(100)) === 7)
      .persist()
    val scored = cpSlice
      .join(edges, col("l_partkey") === col("src"))
      .groupBy(col("o_custkey"), col("dst"))
      .agg(sum(col("n_co")).as("score"), count(lit(1)).as("n_paths"))
    val unseen = scored.join(cpSlice
        .select(col("o_custkey").as("sc"), col("l_partkey").as("sp")),
        col("o_custkey") === col("sc") && col("dst") === col("sp"),
        "left_anti")
    unseen
      .withColumn("rec_rank", row_number().over(
        Window.partitionBy(col("o_custkey"))
          .orderBy(col("score").desc, col("n_paths").desc,
            col("dst").asc)))
      .where(col("rec_rank") <= TopK)
      .select(col("o_custkey"), col("dst").as("rec_partkey"),
        col("score"), col("n_paths"), col("rec_rank"))
      .orderBy(col("o_custkey"), col("rec_rank"))
  }
}
