import graft.operators._
import graft.SparkEntry
val dir = "/root/testdata/sf0.01"
val out = new java.io.PrintWriter("/root/repo/PLANS.md")
def section(title: String, note: String, df: org.apache.spark.sql.DataFrame,
    grep: Seq[String]): Unit = {
  df.collect() // force AQE final plan
  val plan = df.queryExecution.executedPlan.toString
  val lines = plan.linesIterator.toSeq
  val hits = lines.filter(l => grep.exists(l.contains)).map(_.trim).distinct.take(12)
  out.println(s"## $title\n")
  out.println(note + "\n")
  out.println("```")
  hits.foreach(l => out.println(l.take(160)))
  out.println("```\n")
}
out.println("# PLANS -- physical-plan evidence for the scale claims")
out.println()
out.println("Generated from `.queryExecution.executedPlan` AFTER execution (AQE final")
out.println("plans) at sf0.01. Greps pick the load-bearing lines; PlanShapeSpec asserts")
out.println("the same properties in CI. Regenerate with tools/dump_plans (spark-shell).")
out.println()
section("q01 pruned aggregate -- filter pushed to parquet, two-phase agg",
  "The date window reaches the scan (`PushedFilters`) and only the referenced columns are read (`ReadSchema`); aggregation is partial (map-side) then final.",
  CoreQueries.q01PrunedAgg(spark, dir),
  Seq("PushedFilters", "ReadSchema", "HashAggregate", "partial_"))
section("q03 denormalization join -- fact never shuffles",
  "All three dimension joins are BroadcastHashJoin: the only exchanges are broadcasts; the lineitem scan feeds the joins directly with no fact-side repartition.",
  CoreQueries.q03DenormJoin(spark, dir),
  Seq("BroadcastHashJoin", "BroadcastExchange", "Exchange "))
section("q10 top-k -- TakeOrderedAndProject, no global sort",
  "ORDER BY + LIMIT collapses to TakeOrderedAndProject: per-partition heaps, no full sort materialization.",
  CoreQueries.q10TopK(spark, dir),
  Seq("TakeOrderedAndProject"))
section("q21 MinHash LSH banding -- one bucket exchange, no corpus^2",
  "The only data shuffle is the band-bucket hash exchange; candidate verification joins bucket-local pairs.",
  Dedup.q21LshPairs(spark, dir),
  Seq("Exchange hashpartitioning", "SortMergeJoin", "BroadcastHashJoin"))
section("q38 range join -- binned equi-rewrite keeps the fact unshuffled",
  "The interval side is replicated per bin and broadcast; the event side computes its bin in codegen and joins without an exchange.",
  RangeJoin.q38RangeJoin(spark, dir),
  Seq("BroadcastHashJoin", "BroadcastExchange", "Exchange "))
section("q69 edit-distance pairs -- optimizer rule injects the length guard",
  "With GraftExtensions registered, plans.EditDistancePruning rewrites the levenshtein threshold (pushed into the blocked self-join) to short-circuit behind abs(length(a)-length(b)) <= k.",
  { graft.GraftExtensions.register(spark); graft.operators.Dedup.q69EditDistancePairs(spark, dir) },
  Seq("levenshtein", "abs(", "BroadcastHashJoin"))
section("q56 boilerplate spans -- skew-safe two-stage aggregate",
  "No Expand for count-distinct: the (span, doc) pre-aggregate collapses repeats map-side (partial_count), then the span rollup is a plain sum.",
  CorpusOps.q56BoilerplateSpans(spark, dir),
  Seq("HashAggregate", "partial_", "Exchange hashpartitioning"))
section("q59 sequence packing -- distributed prefix sum, no global window",
  "The running sum is the two-pass PrefixSum (range buckets + broadcast offsets): the plan shows bucket-partitioned windows and NO Exchange SinglePartition moving the corpus through one task.",
  graft.operators.CorpusOps.q59SeqPacking(spark, dir),
  Seq("Exchange", "Window", "Sort "))
section("q70 embedding centroids -- shuffle is O(labels x dims)",
  "posexplode feeds a partial aggregate: each task emits at most labels x dims states, so exchange size is independent of corpus row count.",
  Similarity.q70EmbeddingCentroids(spark, dir),
  Seq("HashAggregate", "partial_", "Generate", "Exchange hashpartitioning"))
section("q90 point-in-time SCD2 lookup -- one keyed window, no interval join",
  "AsofJoin.backward unions probes+changes and carries state forward in ONE per-user window pass: no SortMergeJoin, no per-key range probe, a single hash exchange.",
  graft.operators.Stats.q90PointInTime(spark, dir),
  Seq("Window", "Exchange hashpartitioning", "SortMergeJoin"))
section("q94 co-purchase pairs -- map-side pair expansion, TakeOrdered top-50",
  "Pairs explode from per-order arrays (no self-join anywhere); the deterministic top-50 is TakeOrderedAndProject over the two-phase pair aggregate.",
  graft.operators.Stats.q94CopurchasePairs(spark, dir),
  Seq("TakeOrderedAndProject", "Generate explode", "HashAggregate", "partial_"))
section("q96 quality audit -- six constraints, ONE scan of orders",
  "All row/uniqueness checks ride a single Expand aggregate over the broadcast-joined row; the FK gate is a null-check on the joined dim key, not an extra pass.",
  graft.operators.Profiling.q96QualityReport(spark, dir),
  Seq("Scan parquet", "Expand", "BroadcastHashJoin", "HashAggregate"))
section("q101 PageRank iteration -- edge list joins the node-sized rank vector",
  "Each of the 3 iterations is one join of the cached edge list with the rank vector plus one aggregate; contributions are floored BIGINT micro-units, so the aggregate is an exact integer sum.",
  graft.operators.Graph.q101Pagerank(spark, dir),
  Seq("InMemoryTableScan", "HashAggregate", "partial_sum", "FLOOR"))
section("q102 prefix-filtered Jaccard join -- no corpus^2 token join",
  "Only prefix collisions reach the verify stage, and verification is a broadcast array-intersect -- the token stream is never self-joined in full.",
  graft.operators.Dedup.q102PrefixJaccardJoin(spark, dir),
  Seq("BroadcastHashJoin", "array_intersect", "SortMergeJoin"))
section("q97 custom top-k-per-group operator -- winners-only exchange",
  "The injected planner Strategy plans partial and final TopKPerGroupExec around one exchange: bounded heaps prune per partition, the shuffle carries at most k x groups x partitions rows, and no Sort or Window appears.",
  graft.operators.Analytics.q97TopkPerGroup(spark, dir),
  Seq("TopKPerGroup", "Exchange hashpartitioning", "Sort ", "Window"))
section("q107 frequent triples -- map-side C(k,3) expansion, no 3-way self-join",
  "Triples generate from per-order arrays (three chained explodes inside one codegen stage); the only shuffles are the per-order collect and the triple aggregate; top-30 is TakeOrderedAndProject.",
  graft.operators.Stats.q107FrequentTriples(spark, dir),
  Seq("Generate explode", "TakeOrderedAndProject", "SortMergeJoin", "HashAggregate"))
section("q110 embedding outliers -- centroid broadcast, per-doc map-side collapse",
  "The labels x dims centroid table broadcasts back onto the component stream; the per-doc distance aggregate is partial (64 components collapse before the exchange), and the top-50 is TakeOrderedAndProject.",
  graft.operators.Similarity.q110EmbeddingOutliers(spark, dir),
  Seq("BroadcastHashJoin", "TakeOrderedAndProject", "partial_", "Exchange hashpartitioning"))
section("q112 first-touch attribution -- one user-keyed join, residual time filter",
  "The 7-day lookback is an equi-join on user_id with the time predicate as a join residual -- no range-join blowup, no per-purchase re-scan; the arg-min collapses in a two-phase aggregate.",
  graft.operators.Analytics.q112FirstTouch(spark, dir),
  Seq("SortMergeJoin", "BroadcastHashJoin", "HashAggregate", "partial_"))
section("q120 bloom-pruned semi-join -- sketch filter ahead of the join",
  "The bloom mightContain UDF filters the orders scan MAP-SIDE (a Filter directly over the FileScan, before any exchange); the exact broadcast semi-join then removes the sketch's false positives.",
  graft.operators.ScaleOps.q120BloomJoin(spark, dir),
  Seq("BroadcastHashJoin", "LeftSemi", "Filter", "Scan parquet"))
section("q122 higher-order array folds -- no explode, map-side only",
  "filter/transform/aggregate evaluate per row inside the projection: no Generate (explode) node exists, the array never becomes 64 rows, and the only exchange feeds TakeOrderedAndProject.",
  graft.operators.ScaleOps.q122ArrayFold(spark, dir),
  Seq("TakeOrderedAndProject", "Generate", "aggregate(", "Exchange"))
section("q123 incremental aggregate maintenance -- states merge, history unscanned",
  "Base and delta are each a two-phase aggregate; the union re-groups WITHOUT re-reading rows -- the merge input is the two state tables, and avg derives after the merge.",
  graft.operators.ScaleOps.q123IncrementalAgg(spark, dir),
  Seq("HashAggregate", "partial_", "Union", "Scan parquet"))
section("q127 Theil-Sen -- pair explosion runs on the month table, dims broadcast",
  "The fact collapses to (region, month) aggregates BEFORE the quadratic slope join; all three dimension joins broadcast, and the pair join's inputs are calendar-sized.",
  graft.operators.ScaleOps.q127TheilSen(spark, dir),
  Seq("BroadcastHashJoin", "SortMergeJoin", "HashAggregate", "partial_"))
section("q134 rendezvous routing -- map-side winner, one exchange to the rollup",
  "All 8 candidate hashes and the greatest() winner evaluate inside the scan's projection; the only exchange is the 8-group rollup aggregate.",
  graft.operators.ScaleOps.q134RendezvousRouting(spark, dir),
  Seq("Exchange", "HashAggregate", "partial_", "Scan parquet"))
section("q129 nested pruning -- ReadSchema holds two leaves, nested predicate pushed",
  "The scan reads actor.event_type + payload.value only (the wide props blob never leaves the file) and the nested filter reaches PushedFilters.",
  graft.operators.ScaleOps.q129NestedPruning(spark, dir),
  Seq("ReadSchema", "PushedFilters", "FileScan"))
section("q141 as-of tolerance -- same single-shuffle union+window as q37",
  "The staleness bound is a residual projection-level CASE, not a join condition: one hash exchange on user_id, one window pass, no range join.",
  graft.operators.AsofJoin.q141AsofTolerance(spark, dir),
  Seq("Exchange hashpartitioning", "Window", "SortMergeJoin", "RunningWindowFunction"))
section("q183 audio features -- exchange-free: decode inside the scan stage",
  "No Generate, no join, no Exchange anywhere: framing and per-frame energy evaluate as higher-order array expressions inside the scan's projection, so the media blob never leaves its input split and only 7 scalars per row exit the stage.",
  graft.multimodal.Multimodal.q183AudioFrames(spark, dir),
  Seq("FileScan", "Project", "Exchange", "Generate"))
section("q186 all-pairs TF-IDF -- candidates ride the term-keyed index join",
  "No CartesianProduct: pair generation is the inverted-index self-join on term (max_df-capped buckets), the 1-row corpus total is a broadcast, and both the dot-product and norm aggregates are two-phase integer sums.",
  graft.operators.TextQueries.q186AllPairsTfidf(spark, dir),
  Seq("SortMergeJoin", "BroadcastNestedLoopJoin", "HashAggregate", "partial_sum", "CartesianProduct"))
section("q190 video shots -- exchange-free like q183, same in-row discipline",
  "No Generate, no join, no Exchange: framing, the cut predicate, keyframe selection and shot-length stats all evaluate as higher-order array expressions inside the scan's projection.",
  graft.multimodal.Multimodal.q190VideoShots(spark, dir),
  Seq("FileScan", "Project", "Exchange", "Generate"))
{
  // q193 runs under the scoped skew confs so the runtime split is visible
  val df = graft.operators.Skew.withSkewConfs(spark) {
    val d = graft.operators.Skew.q193Frame(spark, dir, mappers = 16)
    d.collect()
    d
  }
  section("q193 AQE skew join -- the hot partition splits at runtime (skew=true)",
    "OptimizeSkewedJoin sees one reduce partition at ~80% of the shuffle after the map stage and rewrites the SortMergeJoin to skew=true with map-range reader slices; the skew-oblivious oracle hash proves the split changes scheduling, never results.",
    df,
    Seq("SortMergeJoin", "skew=true", "AQEShuffleRead"))
}
out.close()
println("PLANS_DONE")
sys.exit(0)
