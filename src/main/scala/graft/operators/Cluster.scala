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

  /** Connected components of the undirected graph given by `edges`
    * (two long columns: a, b). Returns (id, label) with label = min
    * vertex id of the component. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val bidir = edges.toDF("a", "b")
      .union(edges.toDF("b2", "a2").select(col("a2").as("a"), col("b2").as("b")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    var labels = bidir.select(col("a").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      val nbrMin = bidir.join(labels, bidir("b") === labels("id"))
        .groupBy(bidir("a").as("nid"))
        .agg(min(col("label")).as("nbr_min"))
      val next = labels.join(nbrMin, labels("id") === nbrMin("nid"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_min"), col("label")))
            .as("label"),
          (coalesce(col("nbr_min"), col("label")) < col("label"))
            .as("changed"))
        .localCheckpoint(true)
      changed = next.where(col("changed")).count()
      labels = next.drop("changed")
      iter += 1
    }
    bidir.unpersist()
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
}
