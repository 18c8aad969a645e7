package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over a pair list — the step that turns pairwise
  * near-duplicate hits (MinHash/LSH, SimHash, embedding cosine) into
  * dedup CLUSTERS, so a pipeline can keep one representative per group
  * instead of dropping only directly-linked pairs.
  *
  * Algorithm: iterative min-label propagation (the classic MapReduce CC
  * loop): every vertex repeatedly adopts the smallest label among itself
  * and its neighbors until a fixpoint. Each iteration is one shuffle
  * (edges ⋈ labels, then min-aggregate) over O(|E|) rows — and |E| here
  * is the NEAR-DUP PAIR count, orders of magnitude below corpus size, so
  * the loop runs on a tiny fraction of the data. Convergence takes
  * O(diameter) rounds; dedup clusters are near-cliques, so 2–3 rounds in
  * practice (a `maxIter` cap guards pathological chains; the
  * large-star/small-star variant would cut worst-case rounds to
  * O(log d) if a workload ever produced long chains).
  *
  * Lineage is truncated with an eager localCheckpoint per round —
  * without it the iterated plan nests one join deeper per round and
  * re-executes from the source each action.
  */
object Cluster {

  /** Edge count below which the component computation runs as a single
    * driver-side union-find instead of the iterative distributed loop.
    * Same logic as a broadcast join's size cutoff: the near-dup pair
    * list is orders of magnitude smaller than the corpus, and when it
    * fits on the driver, one O(E·α(E)) union-find pass replaces 10+
    * scheduled shuffle rounds. The 100 TB path (LSH over billions of
    * docs can emit >10^9 pairs) takes the distributed branch. */
  val DriverUnionFindMaxEdges = 1000000L

  /** Rows per partition for the distributed loop — the loop must not
    * inherit corpus-sized shuffle parallelism or per-round task
    * overhead dwarfs the work. */
  val EdgesPerPartition = 500000L

  /** Connected components of the undirected graph given by `edges`
    * (two long columns: a, b). Returns (id, label) with label = min
    * vertex id of the component. */
  def connectedComponents(edges: DataFrame,
                          maxIter: Int = 50,
                          driverMaxEdges: Long = DriverUnionFindMaxEdges)
      : DataFrame = {
    val spark = edges.sparkSession
    val pairs = edges.toDF("a", "b").persist(StorageLevel.MEMORY_AND_DISK)
    val nPairs = pairs.count()
    val out =
      if (nPairs <= driverMaxEdges) driverUnionFind(spark, pairs)
      else distributedCC(pairs, maxIter)
    pairs.unpersist()
    out
  }

  /** Path-compressed union-find on the driver, roots = min member. */
  private def driverUnionFind(spark: SparkSession, pairs: DataFrame)
      : DataFrame = {
    val es = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    es.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    import spark.implicits._
    parent.keys.toSeq.sorted.map(id => (id, find(id))).toDF("id", "label")
  }

  /** Iterative distributed CC: per round, min-label propagation over
    * the edges then one pointer-doubling hop against the freshly
    * stepped labels (adopt your new label's new label), which collapses
    * chain diameters geometrically — O(log diameter) rounds instead of
    * O(diameter). Lineage is truncated with an eager localCheckpoint
    * per materialized map. */
  private def distributedCC(pairs: DataFrame, maxIter: Int): DataFrame = {
    val bidir = pairs
      .union(pairs.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nEdges = bidir.count()
    val parts = math.max(1L, math.min(
      pairs.sparkSession.sparkContext.defaultParallelism.toLong,
      nEdges / EdgesPerPartition + 1L)).toInt
    val e = bidir.repartition(parts, col("b"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    e.count()
    bidir.unpersist()

    var labels = e.select(col("a").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      val nbrMin = e.join(labels, e("b") === labels("id"))
        .groupBy(e("a").as("id"))
        .agg(min(col("label")).as("nbr_min"))
      val stepped = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("label").as("label0"),
          least(col("label"), coalesce(col("nbr_min"), col("label")))
            .as("label"))
        .localCheckpoint(true)
      val next = stepped.as("x")
        .join(stepped.select(col("id").as("pid"), col("label").as("plabel")),
          col("x.label") === col("pid"), "left")
        .select(col("x.id").as("id"),
          least(col("x.label"), coalesce(col("plabel"), col("x.label")))
            .as("label"),
          col("x.label0"))
        .withColumn("changed", col("label") < col("label0"))
        .localCheckpoint(true)
      changed = next.where(col("changed")).count()
      labels = next.select(col("id"), col("label"))
      iter += 1
    }
    if (changed > 0)
      System.err.println(
        s"WARN connectedComponents hit maxIter=$maxIter before convergence")
    e.unpersist()
    labels
  }

  /** q39 — dedup clustering: connected components over the q31
    * embedding-cosine near-duplicate pairs, with per-cluster size. The
    * cluster id (= min member) is the canonical "keep" representative;
    * everything else in the cluster is droppable. Oracle: recursive-CTE
    * transitive closure in DuckDB over the same pair SQL. */
  def q39DedupClusters(s: SparkSession, dir: String): DataFrame = {
    val pairs = Similarity.q31CosineNearDup(s, dir)
      .select(col("vec_a").as("a"), col("vec_b").as("b"))
    val cc = connectedComponents(pairs)
    val sizes = cc.groupBy(col("label")).agg(count(lit(1)).as("cluster_size"))
    cc.join(broadcast(sizes), "label")
      .select(col("id").as("vec_id"), col("label").as("cluster_id"),
        col("cluster_size"))
  }

  /** q184 — quality-weighted canonical selection per near-dup cluster,
    * the decision step after q39's clustering: instead of blindly
    * keeping the min-id member, each cluster keeps its HIGHEST-QUALITY
    * document (q15's quality score; doc_id tie-break) and the rest is
    * the dedup's byte savings. One equi-join (cluster members ×
    * documents — member-sized, orders below corpus) and one aggregate
    * whose arg-max rides a struct max (quality, -doc_id), so there is
    * no per-cluster window and no second shuffle; q39's CC dominates.
    * This is the curation pipeline's actual drop-list semantics: near
    * duplicates differ in boilerplate/truncation, and keeping the best
    * rendition instead of an arbitrary one is measurably better
    * training data. Oracle: q39's recursive closure + q15's quality
    * formula + a window rank in DuckDB. */
  def q184CanonicalDedup(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.qualityScore
    val members = q39DedupClusters(s, dir)
      .join(graft.Tables.load(s, dir, "documents"),
        col("vec_id") === col("doc_id"))
      .select(col("cluster_id"), col("doc_id"), col("n_chars"),
        qualityScore(col("text")).as("quality"))
    members
      .groupBy(col("cluster_id"))
      .agg(
        count(lit(1)).as("n_members"),
        sum(col("n_chars")).as("bytes_total"),
        min(col("quality")).as("min_quality"),
        // (quality, -doc_id) is unique per member, so appending the
        // payload field n_chars can't affect which struct wins
        max(struct(col("quality"), (-col("doc_id")).as("neg_id"),
          col("n_chars").as("best_chars"))).as("best"))
      .select(col("cluster_id"), col("n_members"),
        (-col("best.neg_id")).as("canonical_doc"),
        col("best.quality").as("canonical_quality"),
        col("bytes_total"),
        (col("bytes_total") - col("best.best_chars")).as("bytes_saved"),
        col("min_quality"))
  }
}
