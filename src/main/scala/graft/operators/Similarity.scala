package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  * Baseline: brute-force cosine top-k — a broadcast of the (small) query
  * set against a distributed scan of the corpus; O(|corpus|·|queries|)
  * with no corpus shuffle, which is the right plan whenever the query set
  * fits in a broadcast (the common batch-scoring shape).
  *
  * Scale path: random-hyperplane LSH bucketing — each vector gets a
  * signature from the signs of `NumPlanes` fixed hyperplane projections;
  * candidates are same-bucket pairs only. Corpus-side cost becomes one
  * shuffle on the bucket key; within-bucket brute force is
  * O(|corpus|²/2^planes) in expectation. All vector math is
  * `zip_with`/`aggregate` over array<double> — codegen'd, no UDF.
  */
object Similarity {

  /** Dot product of two array<double> columns — the fused codegen
    * expression (one primitive loop, no per-pair array allocation; see
    * graft.functions.VectorMath). The builtin composition
    * `aggregate(zip_with(a,b,_*_), 0.0, _+_)` computes the identical
    * double, ~2× slower on the ANN scoring joins. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorMath.dotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  private def vecs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")
      // float32 → float64 once at scan; all arithmetic stays in double
      // (bit-identical to the DuckDB oracle's CAST(... AS DOUBLE[])).
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("v_norm", norm(col("v")))
      // Materialization barrier, deliberately: (a) the single-file table
      // is ONE input partition, so per-row vector work would otherwise
      // run on one task; (b) `transform` is an interpreted higher-order
      // function that CollapseProject happily inlines into every
      // downstream reference — behind a join each corpus row would
      // re-evaluate the cast-transform once PER MATCHED PAIR. The
      // shuffle writes v/v_norm as data, so joins and windows consume
      // attributes, not re-executed expressions.
      .repartition(s.sparkContext.defaultParallelism)

  /** q23 — brute-force cosine top-k: for each query vector (vec_id<10),
    * the 5 nearest corpus vectors. Query side broadcast; corpus scanned
    * once; per-query top-k via window over the joined result. */
  def q23KnnBruteForce(s: SparkSession, dir: String): DataFrame = {
    val all = vecs(s, dir)
    val queries = all.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("v_norm").as("q_norm"))
    val scored = all.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .withColumn("cosine",
        dot(col("v"), col("qv")) / (col("v_norm") * col("q_norm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** q31 — embedding-cosine near-duplicate pairs, blocked: candidate
    * pairs are generated only within a block (here the `label` column;
    * at 100 TB the block key is an LSH bucket or IVF centroid id — same
    * plan shape, one shuffle on the block key, never corpus²), then
    * verified with exact cosine. Exact blocking keeps the result
    * deterministic and DuckDB-checkable, unlike probe-based candidate
    * generation. */
  def q31CosineNearDup(s: SparkSession, dir: String): DataFrame = {
    val v = vecs(s, dir) // already repartitioned + materialized
    val a = v.select(col("label"), col("vec_id").as("vec_a"),
      col("v").as("va"), col("v_norm").as("na"))
    val b = v.select(col("label").as("label_b"), col("vec_id").as("vec_b"),
      col("v").as("vb"), col("v_norm").as("nb"))
    // broadcast the build side: a 10-value block key would otherwise cap
    // the shuffle at 10 partitions (and skew them); broadcast keeps the
    // probe side's full partitioning and removes the exchange entirely
    a.join(broadcast(b),
        col("label") === col("label_b") && col("vec_a") < col("vec_b"))
      .withColumn("cosine", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .where(col("cosine") >= 0.30)
      .select(col("label"), col("vec_a"), col("vec_b"),
        round(col("cosine"), 6).as("cosine"))
  }

  val IvfCentroids = 16
  val IvfProbes = 4

  /** q34 — IVF-style ANN: the second scale path next to LSH (q24).
    * "Train" picks [[IvfCentroids]] deterministic centroids (the lowest
    * vec_ids — a real build would k-means them; the plan shape is
    * identical). Every corpus vector is assigned to its best-cosine
    * centroid cell; each query probes its [[IvfProbes]] nearest cells
    * and brute-forces only those. Assignment here is a broadcast
    * join + window argmax (deterministic tie-break, oracle-matchable);
    * at 100 TB you'd collect the K tiny centroids and fold the argmax
    * into one codegen expression so the corpus never shuffles — same
    * result, zero exchanges on the big side. [[q53AnnIvfTrained]]
    * implements exactly that literal-cells map-only probe. */
  def q34AnnIvf(s: SparkSession, dir: String): DataFrame = {
    val v = vecs(s, dir)
    val cents = v.where(col("vec_id") < IvfCentroids)
      .select(col("vec_id").cast("int").as("cent_id"), col("v").as("cv"),
        col("v_norm").as("cnorm"))

    def nearestCells(side: DataFrame, n: Int): DataFrame = {
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("cos_c").desc, col("cent_id").asc)
      side.join(broadcast(cents))
        .withColumn("cos_c",
          dot(col("v"), col("cv")) / (col("v_norm") * col("cnorm")))
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= n)
        .drop("cv", "cnorm", "cos_c", "rk")
    }

    val corpus = nearestCells(v, 1)
    val queries = nearestCells(v.where(col("vec_id") < 10), IvfProbes)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("v_norm").as("q_norm"), col("cent_id"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    corpus.join(broadcast(queries),
        corpus("cent_id") === queries("cent_id") &&
          col("vec_id") =!= col("query_id"))
      .withColumn("cosine",
        dot(col("v"), col("qv")) / (col("v_norm") * col("q_norm")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** q53 — IVF ANN with TRAINED centroids: KMeans.fit replaces q34's
    * lowest-id centroid stub, then the probe runs with the trained
    * cells as broadcast literals — corpus assignment and query probing
    * are both map-only (see inline notes), so the probe's only shuffle
    * is the candidate top-k. No DuckDB oracle — Lloyd's isn't
    * SQL-expressible — so the driver records rows-only; the spec
    * asserts trained recall vs the brute-force ground truth meets or
    * beats the stub's. */
  def q53AnnIvfTrained(s: SparkSession, dir: String): DataFrame = {
    // ONE cached copy of the prepared vectors serves training AND both
    // probe sides: without it, the corpus and query branches each
    // re-run the parquet scan + interpreted cast-transform + repartition
    // shuffle that vecs() performs (fit's internal cache covers only its
    // own 2-column projection). fit is eager, so its init job also
    // materializes this cache before the lazy probe plan executes.
    // Bench/Verify clear session caches between executions.
    val v = vecs(s, dir).persist()
    val model = KMeans.fit(
      v.select(col("vec_id").as("id"), col("v")), IvfCentroids, iters = 3)
    import graft.functions.VectorMath.dotProduct

    // Trained cells as expression structs, scored by NEGATED cosine so
    // `least`/ascending struct order = nearest cell, ties to the lowest
    // cell id — the exact order the old join+window form produced.
    val cells = model.centroids.map { case (cid, cv) =>
      val cArr = typedLit(cv.toSeq)
      val cn = math.sqrt(cv.map(x => x * x).sum)
      struct(
        (-(dotProduct(col("v"), cArr) / (col("v_norm") * lit(cn))))
          .as("negcos"),
        lit(cid).as("cent_id"))
    }

    // Corpus→cell assignment is MAP-ONLY: argmin over k fused dot
    // products against literal cells. The previous join+window form
    // expanded every corpus row 16× and then ran a corpus-sized window
    // shuffle just to keep rank 1 — at 100 TB that shuffle IS the
    // probe's cost; here the corpus never leaves its partitions.
    val corpus = v
      .withColumn("best", least(cells: _*))
      .select(col("vec_id"), col("v"), col("v_norm"),
        col("best.cent_id").as("cent_id"))

    // Query→probed cells: per-row sort of the k cell scores, keep the
    // IvfProbes nearest — also map-only (array_sort on struct order =
    // negcos asc, cell id asc), then a 10×probes-row explode.
    val queries = v.where(col("vec_id") < 10)
      .withColumn("probe",
        explode(slice(array_sort(array(cells: _*)), 1, IvfProbes)))
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("v_norm").as("q_norm"), col("probe.cent_id").as("q_cent"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    corpus.join(broadcast(queries),
        col("cent_id") === col("q_cent") &&
          col("vec_id") =!= col("query_id"))
      .withColumn("cosine",
        dot(col("v"), col("qv")) / (col("v_norm") * col("q_norm")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))
  }

  val NumPlanes = 4

  /** Deterministic hyperplanes with components in {-3,-1,1,3}, derived
    * from md5 nibble parity (salt "q24") — engine-portable the same way
    * q66's ±1 planes are (any engine reproduces the weights from
    * `md5('q24_' || p || '_' || i)`), but a 4-level weight alphabet, so
    * the projections aren't a re-run of the Rademacher family. Small
    * integer weights keep each product a single exact-or-once-rounded
    * IEEE multiply and the dot an in-order double sum — identical
    * floats in Spark and DuckDB, hence identical bucket signs. */
  private def planes(dim: Int): Seq[Seq[Double]] =
    (0 until NumPlanes).map { p =>
      (0 until dim).map { i =>
        val nibble =
          Integer.parseInt(md5Hex(s"q24_${p}_$i").substring(0, 1), 16)
        nibble % 4 match {
          case 0 => -3.0
          case 1 => -1.0
          case 2 => 1.0
          case _ => 3.0
        }
      }
    }

  /** Bucket id from the sign pattern of hyperplane projections. */
  def lshBucket(v: Column, dim: Int): Column =
    planes(dim).zipWithIndex.map { case (p, i) =>
      val pl = typedLit(p)
      when(dot(v, pl) >= 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** q24 — LSH-bucketed ANN with multi-probe: same top-k task as q23 but
    * candidates are restricted to the query's bucket plus its
    * hamming-distance-1 neighbor buckets (multi-probe recovers most of
    * the recall a single probe loses, at 1+planes probes per query).
    * The corpus-side cost stays one shuffle on the bucket key — the
    * shape that scales to 100 TB. Hash-checkable: the planes derive
    * from md5 (see [[planes]]), so the DuckDB oracle reproduces the
    * exact buckets, probes, and ranking. */
  def q24AnnLsh(s: SparkSession, dir: String): DataFrame = {
    val dim = 64
    val all = vecs(s, dir).withColumn("bucket", lshBucket(col("v"), dim))
    val probeOffsets = lit(0) +: (0 until NumPlanes).map(i => lit(1 << i))
    val queries = all.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("v_norm").as("q_norm"), col("bucket").as("q_bucket"))
      // multi-probe: query row per probed bucket (XOR flips one plane bit)
      .withColumn("probe", explode(array(probeOffsets: _*)))
      .withColumn("q_bucket", col("q_bucket").bitwiseXOR(col("probe")))
      .drop("probe")
    val scored = all.join(broadcast(queries),
        col("bucket") === col("q_bucket") && col("vec_id") =!= col("query_id"))
      .withColumn("cosine",
        dot(col("v"), col("qv")) / (col("v_norm") * col("q_norm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))
  }

  // ---- Oracle-checkable ANN variants (round 3) -----------------------

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  val RademacherPlanes = 6
  val EmbeddingDim = 64

  /** ±1 hyperplanes derived from md5 parity — the same bits any engine
    * can derive from `md5(p || '_' || i)`, which is what makes q66
    * hash-checkable where q24's JVM-Random planes are not. */
  private lazy val rademacherPlanes: Seq[Seq[Double]] =
    (0 until RademacherPlanes).map { p =>
      (0 until EmbeddingDim).map { i =>
        val nibble = Integer.parseInt(md5Hex(s"${p}_$i").substring(0, 1), 16)
        if (nibble % 2 == 0) 1.0 else -1.0
      }
    }

  /** q66 — Rademacher-LSH ANN, fully oracle-checked: same multi-probe
    * bucketed search as q24, but the hyperplanes are ±1 vectors derived
    * from md5 parity, so DuckDB reproduces the exact buckets. The ±1
    * components make each projection a signed in-order sum of the
    * vector's own components — sequential in both engines' dot
    * products, hence bit-identical signs. Corpus cost: one bucket
    * computation per row (map-only) + broadcast of the probed query
    * buckets; the corpus never shuffles. */
  def q66AnnRademacher(s: SparkSession, dir: String): DataFrame = {
    val bucket = rademacherPlanes.zipWithIndex.map { case (pv, p) =>
      when(dot(col("v"), typedLit(pv)) > 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)
    val all = vecs(s, dir).withColumn("bucket", bucket)
    val probeOffsets = lit(0) +:
      (0 until RademacherPlanes).map(i => lit(1 << i))
    val queries = all.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("v_norm").as("q_norm"), col("bucket").as("q_bucket"))
      .withColumn("probe", explode(array(probeOffsets: _*)))
      .withColumn("q_bucket", col("q_bucket").bitwiseXOR(col("probe")))
      .drop("probe")
    val scored = all.join(broadcast(queries),
        col("bucket") === col("q_bucket") && col("vec_id") =!= col("query_id"))
      .withColumn("cosine",
        dot(col("v"), col("qv")) / (col("v_norm") * col("q_norm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** q67 — int8-quantized KNN: scalar-quantize each vector to
    * [-127,127] (the memory-bandwidth play that makes 100 TB ANN
    * affordable: 8× smaller vectors, integer dot products), rank by the
    * quantized cosine, and report the exact cosine alongside so the
    * quantization error is visible. All quantized arithmetic is
    * exact-integer-valued doubles (|sum| ≪ 2^53), so scores are
    * bit-identical across engines regardless of summation order.
    * floor(x+0.5) pins round-half behavior engine-portably. */
  def q67QuantizedKnn(s: SparkSession, dir: String): DataFrame = {
    val v = vecs(s, dir)
      .withColumn("mx", array_max(transform(col("v"), x => abs(x))))
      .withColumn("qv", transform(col("v"),
        x => floor(x * lit(127.0) / col("mx") + lit(0.5)).cast("double")))
      .withColumn("qn", sqrt(dot(col("qv"), col("qv"))))
      // Second barrier: qv is ANOTHER interpreted transform layered on
      // vecs' materialized v — without it, the 10-way query join
      // re-quantizes every corpus vector once per matched pair (the
      // round-3 bench caught exactly this: one task, 800+ s of
      // interpreted ArrayTransform eval).
      .repartition(s.sparkContext.defaultParallelism)
    val queries = v.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("qv").as("q_qv"),
        col("qn").as("q_qn"), col("v").as("q_v"), col("v_norm").as("q_vn"))
    val scored = v.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .withColumn("qcosine",
        dot(col("qv"), col("q_qv")) / (col("qn") * col("q_qn")))
      .withColumn("cosine_exact",
        dot(col("v"), col("q_v")) / (col("v_norm") * col("q_vn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("qcosine").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("qcosine"), 6).as("qcosine"),
        round(col("cosine_exact"), 6).as("cosine_exact"))
  }

  /** q70 — per-label embedding centroids (the IVF-training /
    * class-prototype primitive): posexplode to (label, dim, component),
    * one hash aggregate. Partial aggregation collapses each task's
    * exploded rows to label×dim states, so the shuffle is
    * O(labels·dims) regardless of corpus size — the same reason a
    * 100 TB mean fits in one pass. Components sum in exact DECIMAL
    * (float→double is exact, then one rounded cast) so summation order
    * can't move the mean; the division happens once, in doubles, in
    * both engines. */
  def q70EmbeddingCentroids(s: SparkSession, dir: String): DataFrame =
    graft.Tables.load(s, dir, "embeddings")
      .select(col("label"),
        posexplode(col("embedding")).as(Seq("dim", "component")))
      .groupBy(col("label"), col("dim"))
      .agg(
        count(lit(1)).as("n_vecs"),
        sum(col("component").cast("double").cast("decimal(18,12)"))
          .as("dec_sum"))
      .select(col("label"), col("dim"), col("n_vecs"),
        round(col("dec_sum").cast("double") / col("n_vecs"), 6)
          .as("centroid"))

  /** q105 — embedding feature-correlation audit: the 20 most-correlated
    * dimension pairs across the corpus (redundant dimensions are
    * wasted bytes at 100 TB — this is the "should we whiten/prune"
    * diagnostic). The cross-moment aggregate carries d·(d−1)/2 states
    * per task — the pair explosion collapses map-side, so the
    * SHUFFLE is d²-sized no matter the corpus row count (same law as
    * q70). Engine-exact: float components widen to double exactly,
    * per-row products are one correctly-rounded multiply, Σxy flows
    * through DECIMAL, and mean/var/cov/corr then evaluate the same
    * IEEE tree in both engines (q92's discipline). */
  def q105CorrelationAudit(s: SparkSession, dir: String): DataFrame = {
    // single-file table -> one input partition; spread BEFORE the d²
    // pair explosion or one task generates every cross-moment row
    val e = graft.Tables.load(s, dir, "embeddings")
      .repartition(s.sparkContext.defaultParallelism)
    val comp = e.select(col("vec_id"), col("embedding"),
        posexplode(col("embedding")).as(Seq("dim", "cf")))
      .withColumn("c", col("cf").cast("double"))
    val stats = comp.groupBy(col("dim")).agg(
        count(lit(1)).as("n"),
        sum(col("c").cast("decimal(18,12)")).as("s1"),
        sum((col("c") * col("c")).cast("decimal(28,20)")).as("s2"))
      .select(col("dim"),
        (col("s1").cast("double") / col("n")).as("mean"),
        (col("s2").cast("double") / col("n") -
          (col("s1").cast("double") / col("n")) *
          (col("s1").cast("double") / col("n"))).as("variance"))
    // Upper triangle only, AT GENERATION: each component row explodes
    // just the slice of the embedding AFTER its own dimension (j > i
    // by construction), halving generated rows vs explode-then-filter
    // — the filter after a Generate does not prune what the Generate
    // emits. Bit-identical cross moments (same terms, same decimal
    // sum; spec-checked against the filtered formulation).
    val cross = comp
      .select(col("vec_id"), col("dim").as("dim_i"), col("c").as("ci"),
        posexplode(expr("slice(embedding, dim + 2, size(embedding))"))
          .as(Seq("off", "cjf")))
      .withColumn("dim_j", col("dim_i") + 1 + col("off"))
      .withColumn("cj", col("cjf").cast("double"))
      .groupBy(col("dim_i"), col("dim_j"))
      .agg(count(lit(1)).as("n"),
        sum((col("ci") * col("cj")).cast("decimal(28,20)")).as("sxy"))
    cross
      .join(broadcast(stats.select(col("dim").as("dim_i"),
        col("mean").as("m_i"), col("variance").as("v_i"))), Seq("dim_i"))
      .join(broadcast(stats.select(col("dim").as("dim_j"),
        col("mean").as("m_j"), col("variance").as("v_j"))), Seq("dim_j"))
      .withColumn("cov",
        col("sxy").cast("double") / col("n") - col("m_i") * col("m_j"))
      .where(col("v_i") > 0 && col("v_j") > 0)
      .withColumn("corr", col("cov") / sqrt(col("v_i") * col("v_j")))
      .orderBy(abs(col("corr")).desc, col("dim_i").asc, col("dim_j").asc)
      .limit(20)
      .select(col("dim_i"), col("dim_j"), col("n").as("n_vecs"),
        round(col("cov"), 8).as("cov"), round(col("corr"), 6).as("corr"))
  }

  /** q110 — embedding outlier screen: the 50 vectors farthest from
    * their label centroid (mislabeled / noisy examples a curation
    * pipeline drops or routes to review before training). Same shuffle
    * law as q70/q105: the centroid aggregate collapses map-side to
    * labels×dims states, the centroid table broadcasts back onto the
    * component stream, and the per-doc distance aggregate collapses
    * 64 components to one row map-side — no stage carries more than
    * corpus-row-count rows. Engine-exact: centroid = exact DECIMAL
    * component sum / count (one correctly-rounded divide), each
    * squared deviation is correctly-rounded IEEE on bit-identical
    * inputs, and the 64-term Σ flows through DECIMAL so partition
    * order can't move a bit; the final top-50 is
    * TakeOrderedAndProject under a (dist², vec_id) tiebreak. */
  def q110EmbeddingOutliers(s: SparkSession, dir: String): DataFrame = {
    val e = graft.Tables.load(s, dir, "embeddings")
    val comp = e.select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("dim", "cf")))
      .withColumn("c", col("cf").cast("double"))
    val cent = comp.groupBy(col("label"), col("dim")).agg(
        count(lit(1)).as("n"),
        sum(col("c").cast("decimal(18,12)")).as("s1"))
      .select(col("label"), col("dim"),
        (col("s1").cast("double") / col("n")).as("cd"))
    comp.join(broadcast(cent), Seq("label", "dim"))
      .withColumn("t",
        ((col("c") - col("cd")) * (col("c") - col("cd")))
          .cast("decimal(28,20)"))
      .groupBy(col("label"), col("vec_id"))
      .agg(sum(col("t")).as("d2"))
      .select(col("label"), col("vec_id"),
        col("d2").cast("double").as("dist2"))
      .orderBy(col("dist2").desc, col("vec_id").asc)
      .limit(50)
      .select(col("label"), col("vec_id"), round(col("dist2"), 8).as("dist2"))
  }

  val SemDedupTau = 0.30

  /** q170 — semantic dedup (the SemDeDup recipe, Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embedding space, compare pairs only
    * WITHIN a cluster, and drop every document whose embedding is
    * within cosine τ of a lower-id survivor — the greedy
    * keep-lowest-id rule that makes the verdict deterministic and
    * order-free. The paper clusters with k-means; here the cluster key
    * is the md5-derived LSH bucket ([[lshBucket]], q24's planes) so
    * BOTH engines derive identical clusters and the verdict is fully
    * hash-checkable — the plan shape (cluster key → within-cluster
    * pairs → per-doc verdict) is exactly the k-means variant's.
    *
    * Scale: candidate pairs exist only within a bucket, so the pair
    * count is Σ|bucket|²/2, never corpus²; with p planes the expected
    * bucket is |corpus|/2^p — at 100 TB you raise p (and/or switch the
    * key to trained IVF cells, q53's machinery) so buckets stay
    * bounded, and the per-bucket work distributes on the bucket key.
    * Here the 16-bucket build-side broadcasts (q31's reasoning: a
    * 16-value shuffle key would cap parallelism at 16 partitions);
    * the probe side never leaves its partitions.
    *
    * Output: one row per DROPPED doc — the drop list a curation run
    * acts on — with the kept doc it duplicates (best lower-id match by
    * cosine, ties to the lowest id), the exact cosine, and how many
    * lower-id docs it matched. */
  def q170SemanticDedup(s: SparkSession, dir: String): DataFrame = {
    val dim = 64
    val all = vecs(s, dir).withColumn("bucket", lshBucket(col("v"), dim))
    val kept = all.select(col("bucket").as("k_bucket"),
      col("vec_id").as("keep_id"), col("v").as("kv"), col("v_norm").as("kn"))
    val matches = all.join(broadcast(kept),
        col("bucket") === col("k_bucket") && col("keep_id") < col("vec_id"))
      .withColumn("cosine",
        dot(col("v"), col("kv")) / (col("v_norm") * col("kn")))
      .where(col("cosine") >= SemDedupTau)
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cosine").desc, col("keep_id").asc)
    matches
      .withColumn("rk", row_number().over(w))
      .withColumn("n_lower_matches",
        count(lit(1)).over(Window.partitionBy(col("vec_id"))))
      .where(col("rk") === 1)
      .select(col("vec_id"), col("bucket").cast("long").as("bucket"),
        col("keep_id").as("dup_of"),
        round(col("cosine"), 6).as("best_cosine"), col("n_lower_matches"))
  }

  /** q175 — INCREMENTAL semantic dedup: q170's fuzzy-embedding verdict
    * in q168/q169's nightly-ingest shape, completing the dedup matrix
    * (exact/shingle/semantic × whole-corpus/incremental). The corpus
    * splits deterministically (md5-prefix of vec_id < "80" ≈ 50% is
    * history — q80's convention); the HISTORY side is an LSH-bucketed
    * index (q24's md5 planes, so both engines derive identical
    * buckets), tonight's BATCH computes its own bucket map-side and
    * probes only its bucket's history entries, and candidates verify
    * by exact cosine at τ=[[SemDedupTau]]. Each matched batch vec
    * emits ONE verdict row: its best historical match (max cosine,
    * ties to the lowest history id) and its collision count — the
    * drop list the ingest acts on.
    *
    * Scale shape: cost is batch-sized + collision-sized, never
    * history-sized — history contributes only bucket-indexed vectors
    * (at 100 TB: the materialized ANN index q171 compresses, sharded
    * by q134's rendezvous routing), the batch never shuffles (its
    * bucket is computed in codegen), and the per-vec verdict is a
    * collision-keyed aggregate. */
  def q175IncrementalSemdedup(s: SparkSession, dir: String): DataFrame = {
    val dim = 64
    val all = vecs(s, dir)
      .withColumn("bucket", lshBucket(col("v"), dim))
      .withColumn("is_hist",
        substring(md5(col("vec_id").cast("string")), 1, 2) < "80")
    val hist = all.where(col("is_hist"))
      .select(col("bucket").as("h_bucket"), col("vec_id").as("hist_id"),
        col("v").as("hv"), col("v_norm").as("hn"))
    val batch = all.where(!col("is_hist"))
    batch.join(broadcast(hist), col("bucket") === col("h_bucket"))
      .withColumn("cosine",
        dot(col("v"), col("hv")) / (col("v_norm") * col("hn")))
      .where(col("cosine") >= SemDedupTau)
      .groupBy(col("vec_id"))
      .agg(
        max_by(struct(col("hist_id"), round(col("cosine"), 6).as("c")),
          struct(col("cosine"), -col("hist_id"))).as("best"),
        count(lit(1)).as("n_collisions"))
      .select(col("vec_id"), col("best.hist_id").as("dup_of_hist"),
        col("best.c").as("best_cosine"), col("n_collisions"))
  }

  val PqSubspaces = 8
  val PqSubDim = 8
  val PqCodes = 16

  /** md5-derived PQ codebook: component i of codeword k in subspace s
    * comes from the first nibble of md5("pq_s_k_i"), mapped onto
    * {-0.3, -0.1, 0.1, 0.3} (the embedding components live in roughly
    * [-0.5, 0.5]). Deterministic-by-hash for the same reason as q66's
    * planes: any engine reproduces the exact codebook, which is what
    * makes a QUANTIZED index hash-checkable at all — a k-means-trained
    * codebook (the production variant) keeps this plan shape but goes
    * rows-only like q53. */
  private lazy val pqCodebook: IndexedSeq[IndexedSeq[Seq[Double]]] =
    (0 until PqSubspaces).map { sub =>
      (0 until PqCodes).map { k =>
        (0 until PqSubDim).map { i =>
          val nibble =
            Integer.parseInt(md5Hex(s"pq_${sub}_${k}_$i").substring(0, 1), 16)
          nibble % 4 match {
            case 0 => -0.3
            case 1 => -0.1
            case 2 => 0.1
            case _ => 0.3
          }
        }
      }
    }

  /** ‖w‖² per codeword, flattened to a 128-entry lookup aligned with
    * [[pqCodebook]] (index = s·16 + k). Left-fold sum matches DuckDB's
    * list_dot_product(w, w) term order bit-for-bit. */
  private lazy val pqWw: Seq[Double] =
    pqCodebook.flatten.map(w => w.map(x => x * x).sum)

  /** q171 — product-quantization ANN (the IVF-PQ compression layer,
    * Jégou et al. 2011): each 64-dim float vector is encoded as EIGHT
    * 4-bit codes — one per 8-dim subspace, the nearest of 16 codewords
    * — and queries rank the corpus by asymmetric-distance computation
    * (ADC): a per-query 128-entry lookup table of subspace dot
    * products, so scoring a candidate costs 8 table lookups + 7 adds
    * instead of a 64-dim dot. 512× smaller vectors (4 bits/dim → the
    * reason an exhaustive scan of a 100 TB corpus becomes a memory-
    * bandwidth problem you can actually pay), with the top-k re-ranked
    * by EXACT cosine fetched for the shortlist only — the standard
    * two-stage shape.
    *
    * Engine-exact end to end: the codebook derives from md5
    * ([[pqCodebook]]); encoding argmins compare `‖w‖² − 2·(x_s·w)`
    * where the dot is an in-order 8-term fold (identical to DuckDB's
    * list_dot_product on the same slice) and ties break to the lowest
    * code; ADC sums the 8 subspace terms in fixed s-order (left-assoc
    * in both engines); reconstruction norms come from the shared
    * [[pqWw]] table. Every comparison both engines make is over
    * bit-identical doubles.
    *
    * Plan shape: encoding is MAP-ONLY (128 literal-codeword dots per
    * row, inside codegen — the corpus never shuffles to get encoded);
    * the encoded table materializes once (codes + rnorm², the honest
    * PQ index payload); queries broadcast with their LUTs; the only
    * exchange is the final per-query top-5. */
  def q171PqAnn(s: SparkSession, dir: String): DataFrame = {
    val v = vecs(s, dir)

    // --- encode: codes[s] = argmin_k ‖x_s − w_sk‖², via the rank-
    // equivalent ‖w‖² − 2·x_s·w (‖x_s‖² is constant across k). least()
    // over (dist, k) structs = min dist, ties to lowest k.
    val codeCols = (0 until PqSubspaces).map { sub =>
      val xs = slice(col("v"), sub * PqSubDim + 1, PqSubDim)
      val cands = (0 until PqCodes).map { k =>
        val w = pqCodebook(sub)(k)
        struct(
          (lit(pqWw(sub * PqCodes + k)) -
            lit(2.0) * dot(xs, typedLit(w))).as("dist"),
          lit(k).as("code"))
      }
      least(cands: _*).getField("code")
    }
    val wwLit = typedLit(pqWw)
    // reconstruction norm² = Σ_s ‖w_{s,code_s}‖², fixed s-order adds
    val enc = v
      .withColumn("codes", array(codeCols: _*))
      .withColumn("rnorm2",
        (0 until PqSubspaces).map { sub =>
          element_at(wwLit,
            lit(sub * PqCodes + 1) + element_at(col("codes"), sub + 1))
        }.reduce(_ + _))
      .select(col("vec_id"), col("codes"), col("rnorm2"))
      // materialization barrier: the 128-dot encode must not re-run
      // per scored pair (vecs()'s reasoning; the single-file input
      // would also serialize the encode on one task)
      .repartition(s.sparkContext.defaultParallelism)

    // --- per-query ADC lookup table: lut[s·16+k] = q_s · w_sk
    val lutCol = array((0 until PqSubspaces * PqCodes).map { idx =>
      val sub = idx / PqCodes
      val xs = slice(col("v"), sub * PqSubDim + 1, PqSubDim)
      dot(xs, typedLit(pqCodebook(sub)(idx % PqCodes)))
    }: _*)
    val queries = v.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("v_norm").as("q_norm"), lutCol.as("lut"))

    // --- ADC scan: approx dot = Σ_s lut[s·16+code_s], same add order
    val adcDot = (0 until PqSubspaces).map { sub =>
      element_at(col("lut"),
        lit(sub * PqCodes + 1) + element_at(col("codes"), sub + 1))
    }.reduce(_ + _)
    val w5 = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_cosine").desc, col("vec_id").asc)
    val short = enc.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .withColumn("adc_cosine", adcDot / (col("q_norm") * sqrt(col("rnorm2"))))
      .withColumn("rank", row_number().over(w5))
      .where(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("vec_id"),
        col("adc_cosine"), col("qv"), col("q_norm"))

    // --- exact re-rank audit: fetch the ORIGINAL vectors for the 50
    // shortlisted ids only (broadcast the shortlist; the corpus side is
    // a map-side semi-probe, never a second full scan shape at scale)
    broadcast(short)
      .join(v.select(col("vec_id"), col("v"), col("v_norm")), Seq("vec_id"))
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("adc_cosine"), 6).as("adc_cosine"),
        round(dot(col("v"), col("qv")) / (col("v_norm") * col("q_norm")), 6)
          .as("cosine_exact"))
  }

  /** q139 — inverse-frequency class weights over the labeled
    * embeddings: weight_c = N / (K · n_c), the standard loss
    * reweighting for class-imbalanced training (sklearn's "balanced"
    * rule). Each weight is ONE division of exact BIGINT counts, so
    * the table is engine-exact; the label aggregate is K-sized and
    * the scalar total broadcasts. The sanity identity
    * Σ n_c·weight_c = N (spec-checked) is what makes the rule
    * "balanced": every class contributes equal total weight. */
  def q139ClassWeights(s: SparkSession, dir: String): DataFrame = {
    val emb = vecs(s, dir)
    val perLabel = emb.groupBy(col("label"))
      .agg(count(lit(1)).as("n_examples"))
    val totals = perLabel.agg(sum(col("n_examples")).as("n_total"),
      count(lit(1)).as("n_classes"))
    perLabel.crossJoin(broadcast(totals))
      .select(col("label"), col("n_examples"),
        round(col("n_total").cast("double") /
          (col("n_classes") * col("n_examples")), 6).as("class_weight"))
      .orderBy(col("label"))
  }
}
