package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.TextFunctions._

/** Text-analysis queries over the `documents` table — the LLM
  * training-data-pipeline surface (token counting, quality scoring,
  * language ID, fingerprinting, exact dedup). All per-row expression
  * work: scales linearly, no shuffle except the final dedup groupBy.
  */
object TextQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** q15 — token/quality metrics per document. */
  def q15TokensQuality(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      nTokens(col("text")).as("n_tokens"),
      nUniqueTokens(col("text")).as("n_unique_tokens"),
      length(col("text")).as("n_chars_actual"),
      stopwordHits(col("text")).as("n_stopwords"),
      typeTokenRatio(col("text")).as("ttr"),
      qualityScore(col("text")).as("quality"))

  /** q32 — BPE-ish subword token counting: GPT-2-style regex
    * pre-tokenization (letters / digits / symbol runs), each piece
    * contributing ~len/6 subword units. Complements q15's whitespace
    * count — the pair brackets real tokenizer counts from below and
    * above. */
  def q32BpeTokens(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      size(bpePieces(col("text"))).as("n_pieces"),
      nBpeTokens(col("text")).as("n_bpe_tokens"),
      nTokens(col("text")).cast("long").as("n_ws_tokens"))

  /** q35 — character-trigram-profile language ID (the n-gram
    * counterpart to q16's marker words), as a confusion matrix against
    * the labeled `lang` column. */
  def q35TrigramLangId(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("lang_pred", trigramLangId(col("text")))
      .groupBy(col("lang"), col("lang_pred"))
      .agg(count(col("doc_id")).as("n_docs"))

  /** q16 — language-ID heuristic vs the labeled `lang` column,
    * aggregated into a confusion-matrix view. */
  def q16LangId(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("lang_pred", langId(col("text")))
      .groupBy(col("lang"), col("lang_pred"))
      .agg(count(col("doc_id")).as("n_docs"))

  /** q17 — md5 fingerprint of normalized text per document (the
    * engine-portable document identity used by exact dedup). */
  def q17Fingerprint(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      fingerprint(col("text")).as("fingerprint"))

  /** q18 — exact deduplication: hash-groupBy on the normalized
    * fingerprint, keep the minimum doc_id per group. At 100 TB this is
    * one shuffle on a 32-byte key with map-side partial aggregation —
    * the canonical scalable exact-dedup plan. */
  def q18ExactDedup(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .groupBy(fingerprint(col("text")).as("fingerprint"))
      .agg(
        min(col("doc_id")).as("keep_doc_id"),
        count(col("doc_id")).as("n_copies"))

  /** q30 — deterministic distributed sample: the 32 documents with the
    * smallest md5 — computed by the BottomKSample Aggregator (one-pass
    * partial+final, no global sort) and auditable in any engine as
    * ORDER BY md5 LIMIT k. */
  def q30DeterministicSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val agg = new graft.functions.BottomKSample(32)
    docs(s, dir)
      .select(md5(col("text")).as("h"), col("doc_id"))
      .as[(String, Long)]
      .select(agg.toColumn)
      .flatMap(identity)
      .toDF("sample_hash", "doc_id")
  }

  /** q48 — TF-IDF top terms per document: tokenize (codegen'd
    * regexp_extract_all), explode (the generator/UDTF surface, SURVEY
    * §2.9-U3), term-frequency and document-frequency aggregates, then a
    * per-doc top-3 window. IDF is the RATIO (N+1)/(df+1) rather than its
    * log: one IEEE division + one multiply, bit-identical across
    * engines, where ln() is only correctly-rounded-ish in both and can
    * flip a ROUND boundary. Plan: tf is one shuffle on (doc, term), df
    * one on term, rejoined on term — at 100 TB the df table is vocab-
    * sized and stays a shuffle join; the scalar doc count broadcasts. */
  def q48TfIdf(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
      // single-file table -> one input partition; spread the tokenize+
      // explode work before the wide aggregates
      .repartition(s.sparkContext.defaultParallelism)
    val toks = d.select(col("doc_id"),
      explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)"))
        .as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val total = d.agg(count(lit(1)).as("n_docs"))
    val scored = tf
      .join(dfreq, "term")
      .crossJoin(broadcast(total))
      .where(col("doc_id") < 50)
      .withColumn("tfidf",
        round(col("tf") * ((col("n_docs") + 1).cast("double") /
          (col("df") + 1).cast("double")), 4))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select(col("doc_id"), col("rank"), col("term"), col("tfidf"))
  }

  /** q22 — n-gram Jaccard similarity between adjacent doc pairs
    * (deterministic pair choice keeps the oracle simple; the general
    * LSH-candidate pair generation lives in Dedup). */
  def q22NgramJaccard(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val a = d.select(col("doc_id").as("doc_a"),
      array_distinct(shingles(col("text"), 2)).as("sh_a"))
    val b = d.select(col("doc_id").as("doc_b"),
      array_distinct(shingles(col("text"), 2)).as("sh_b"))
    a.join(b, col("doc_a") + 1 === col("doc_b"), "inner")
      .select(
        col("doc_a"), col("doc_b"),
        round(
          size(array_intersect(col("sh_a"), col("sh_b"))) /
            size(array_union(col("sh_a"), col("sh_b"))).cast("double"),
          4).as("jaccard"))
  }

  val CollocMinCount = 5
  val CollocTopK = 50

  /** q72 — collocation mining: word bigrams ranked by lift
    * (P(w1w2) / P(w1)P(w2) = c12·N / c1·c2), the tokenizer-merge /
    * stock-phrase signal. Three aggregates over one exploded token
    * stream (unigrams, bigrams, corpus total), then the bigram table
    * joins its two word counts — vocabulary-sized sides, so at scale
    * both joins broadcast and the token stream shuffles only for the
    * counts. Lift is three IEEE ops on exact integer counts (doubles
    * first, so 100 TB token totals can't overflow), identical in any
    * engine; ranking ties break on the bigram text. */
  def q72Collocations(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).repartition(s.sparkContext.defaultParallelism)
    val uni = d.select(explode(tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val total = uni.agg(sum(col("c")).as("n_tokens"))
    val bi = d
      .where(size(tokens(col("text"))) >= 2)
      .select(explode(shingles(col("text"), 2)).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("c12"))
      .where(col("c12") >= CollocMinCount)
    val scored = bi
      .withColumn("w1", split(col("bigram"), " ").getItem(0))
      .withColumn("w2", split(col("bigram"), " ").getItem(1))
      .join(broadcast(uni.select(col("w").as("w1"), col("c").as("c1"))), Seq("w1"))
      .join(broadcast(uni.select(col("w").as("w2"), col("c").as("c2"))), Seq("w2"))
      .crossJoin(broadcast(total))
      .select(col("bigram"), col("c12"), col("c1"), col("c2"),
        round(col("c12").cast("double") * col("n_tokens").cast("double") /
          (col("c1").cast("double") * col("c2").cast("double")), 6)
          .as("lift"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("lift").desc, col("bigram").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= CollocTopK)
  }

  val Bm25K1 = 1.2
  val Bm25B = 0.75
  val Bm25Terms = Seq("join", "vector", "filter")

  /** q83 — BM25-shaped keyword retrieval: score every document against
    * a fixed term set and return the top 20. Standard BM25 saturation
    * (k1=1.2, b=0.75 length normalization), with the ln-IDF replaced by
    * the same ratio-IDF q48 uses ((N+1)/(df+1)) — pure IEEE ops on
    * exact counts, so scores are engine-exact (ln() differs in ulps
    * across math libraries). Per-term scores land in their own columns
    * via conditional aggregation and are added in FIXED order — a
    * sum() over terms would add in shuffle-arrival order and flip
    * rounding bits between engines. Plan: one explode + per-(doc,term)
    * count against a 3-term broadcast filter, then a doc-sized
    * aggregate — corpus-linear, like q48. */
  def q83Bm25(s: SparkSession, dir: String): DataFrame =
    bm25Ranking(s, dir)
      .where(col("rank") <= 20)
      .select(col("doc_id"), col("rank"), col("score"))

  /** Full BM25 ranking over every matching doc — q83 takes its top 20,
    * q172's lexical leg its top [[RrfLegK]]. The rank window is global
    * but bounded: Spark 4 plans row_number+filter via WindowGroupLimit,
    * so each partition pre-prunes to the limit before the single-
    * partition finish (q60's plan note). */
  private def bm25Ranking(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val stats = d.select(col("doc_id"), nTokens(col("text")).as("dl"))
    val corpus = stats.agg(
      count(lit(1)).as("n_docs"),
      (sum(col("dl")) / count(lit(1)).cast("double")).as("avgdl"))
    val tf = d
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .where(col("term").isin(Bm25Terms: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(df_), Seq("term"))
      .join(stats, Seq("doc_id"))
      .crossJoin(broadcast(corpus))
      .withColumn("idf",
        (col("n_docs") + 1).cast("double") / (col("df") + 1).cast("double"))
      .withColumn("tscore",
        col("idf") * (col("tf") * lit(Bm25K1 + 1.0)) /
          (col("tf") + lit(Bm25K1) *
            (lit(1.0 - Bm25B) + lit(Bm25B) * (col("dl") / col("avgdl")))))
    // one row per (doc, matched term) → conditional aggregation pivots
    // each term's score into its own column; the final score adds the
    // columns left-to-right (fixed order, engine-identical)
    val perTerm = Bm25Terms.map { t =>
      sum(when(col("term") === t, col("tscore")).otherwise(lit(0.0)))
        .as(s"s_$t")
    }
    val byDoc = scored.groupBy(col("doc_id"))
      .agg(perTerm.head, perTerm.tail: _*)
    val total = Bm25Terms.map(t => col(s"s_$t")).reduce(_ + _)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("doc_id").asc)
    byDoc
      .withColumn("score", round(total, 6))
      .withColumn("rank", row_number().over(w))
  }

  val RrfK = 60
  val RrfLegK = 30
  val RrfPrfDocs = 3
  val RrfTopK = 20

  /** q172 — hybrid retrieval with reciprocal-rank fusion (RRF,
    * Cormack et al. 2009 — the fusion rule production hybrid search
    * converged on): a LEXICAL leg (q83's BM25 ranking, top
    * [[RrfLegK]]) and a SEMANTIC leg (embedding cosine against a
    * pseudo-relevance-feedback query vector — the mean of the lexical
    * top-[[RrfPrfDocs]] docs' embeddings, the classic PRF bridge from
    * keywords into the dense space) fuse by
    * `Σ_legs 1/(k + rank_leg)` with k = [[RrfK]]. Rank-based fusion is
    * what makes the hybrid engine-exact: ranks are exact integers, so
    * each contribution is ONE correctly-rounded divide and the fused
    * score adds the two legs in fixed order — no score normalization
    * (min-max/z-score fusion would drift in the moments) and no ln().
    *
    * Scale shape: each leg ends in a bounded top-K (WindowGroupLimit
    * — per-partition pre-prune before the K-row finish), the PRF
    * centroid is a 3-row bounded collect (q53's literal-centroid
    * pattern), the semantic scan is map-only against centroid
    * literals, and the fusion join is K×K-sized — nothing after the
    * per-leg scans exceeds [[RrfLegK]] rows. Docs missing from a leg
    * contribute 0 from it (reported rank 0 = "not retrieved"). */
  def q172HybridRrf(s: SparkSession, dir: String): DataFrame = {
    val lex = bm25Ranking(s, dir).where(col("rank") <= RrfLegK)
      .select(col("doc_id"), col("rank").as("rank_lex"))
    // embeddings prepared exactly as Similarity.vecs: float→double at
    // scan, fused-dot norm, repartition barrier (same reasoning)
    val emb = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("v_norm",
        sqrt(Similarity.dot(col("v"), col("v"))))
      .repartition(s.sparkContext.defaultParallelism)
    // PRF centroid: the [[RrfPrfDocs]] LOWEST-RANK lexical docs that
    // HAVE embeddings (not "rank ≤ 3": when the embedding table covers
    // only part of the corpus — as at sf0.1 and on any real lake where
    // embedding backfill trails ingest — the raw top-3 can lack vectors
    // entirely). Vectors summed per-dimension IN RANK ORDER then
    // divided once — the same IEEE tree the oracle builds, so the
    // centroid literal is bit-identical. The collect is 3 rows.
    val top3 = lex
      .join(emb, col("doc_id") === col("vec_id"))
      .orderBy(col("rank_lex").asc)
      .limit(RrfPrfDocs)
      .select(col("rank_lex"), col("v"))
      .collect().sortBy(_.getAs[Int]("rank_lex"))
      .map(_.getSeq[Double](1))
    require(top3.length == RrfPrfDocs, s"PRF needs $RrfPrfDocs seed docs")
    val cent: Seq[Double] = (0 until 64).map { j =>
      (top3(0)(j) + top3(1)(j) + top3(2)(j)) / 3.0
    }
    val cnorm = math.sqrt(cent.map(x => x * x).sum)
    val sem = emb
      .withColumn("cos",
        Similarity.dot(col("v"), typedLit(cent)) /
          (col("v_norm") * lit(cnorm)))
      .withColumn("rank_sem", row_number().over(
        Window.orderBy(col("cos").desc, col("vec_id").asc)))
      .where(col("rank_sem") <= RrfLegK)
      .select(col("vec_id").as("sem_doc"), col("rank_sem"))
    val fused = lex.join(sem, col("doc_id") === col("sem_doc"), "full_outer")
      .select(coalesce(col("doc_id"), col("sem_doc")).as("doc_id"),
        col("rank_lex"), col("rank_sem"))
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(RrfK) + col("rank_lex")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK) + col("rank_sem")), lit(0.0)))
    fused
      .withColumn("rank", row_number().over(
        Window.orderBy(col("rrf").desc, col("doc_id").asc)))
      .where(col("rank") <= RrfTopK)
      .select(col("doc_id"), col("rank"),
        round(col("rrf"), 9).as("rrf_score"),
        coalesce(col("rank_lex"), lit(0)).as("rank_lex"),
        coalesce(col("rank_sem"), lit(0)).as("rank_sem"))
  }

  val PostingsCap = 10
  val IndexMinDf = 50

  /** q84 — inverted-index build: per-term document frequency and a
    * capped, sorted posting list (first 10 doc ids), serialized with
    * concat_ws for engine portability. One explode + per-(term, doc)
    * distinct collapse + per-term aggregate; the posting list sorts
    * INSIDE the aggregate value (sort_array of the collected ids) and
    * is capped with slice — collect_list arrival order never leaks
    * into the result, the same discipline as q50. At 100 TB the cap
    * bounds per-term state; full postings would go through the
    * chunk/shard layout instead of one aggregate value. */
  /** q104 — corpus trigram counts through the CUSTOM table-generating
    * expression (functions.NGramGenerate, extension point U3): each
    * doc's token array emits its word trigrams directly from the
    * generator — no intermediate n-gram array per row — then one
    * two-phase count and a TakeOrdered top-20 under a full tiebreak.
    * The builtin-explode formulation stays the codegen'd hot path;
    * this query pins the Generator surface end-to-end against a
    * positional-join oracle. */
  def q104NgramGenerate(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), tokens(col("text")).as("toks"))
    graft.functions.NGramGenerate(d, "toks", 3)
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("ngram").asc)
      .limit(20)
  }

  def q84InvertedIndex(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), explode(array_distinct(tokens(col("text"))))
        .as("term"))
      .groupBy(col("term"))
      .agg(
        count(lit(1)).as("df"),
        concat_ws(",",
          transform(
            slice(sort_array(collect_list(col("doc_id"))), 1, PostingsCap),
            d => d.cast("string"))).as("postings"))
      .where(col("df") >= IndexMinDf)

  val BpeTopMerges = 20

  /** q76 — one BPE-training merge step: count adjacent character
    * pairs across the corpus, weighted by word frequency, and rank the
    * top merge candidates. The corpus collapses to its vocabulary
    * FIRST (the token-count aggregate), so the quadratic-ish pair
    * explosion runs over distinct words — at 100 TB that's the
    * difference between exploding 10^13 tokens and 10^7 vocab entries.
    * The pair explode is an interpreted higher-order transform, which
    * is fine off the hot path (vocab-sized input); counts are exact
    * integers, so ranking is engine-portable. */
  def q76BpeMergeStep(s: SparkSession, dir: String): DataFrame = {
    val vocab = docs(s, dir)
      .repartition(s.sparkContext.defaultParallelism)
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .where(length(col("word")) >= 2)
    val pairs = vocab
      .select(col("freq"), explode(expr(
        "transform(sequence(1, length(word) - 1)," +
          " i -> substring(word, i, 2))")).as("pair"))
      .groupBy(col("pair"))
      .agg(sum(col("freq")).as("pair_count"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("pair_count").desc, col("pair").asc)
    pairs
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= BpeTopMerges)
  }

  /** q138 — feature hashing (the hashing trick): every token routes to
    * one of 32 feature dimensions by an md5-derived bucket, turning
    * unbounded vocabulary into fixed-width sparse vectors with ZERO
    * vocabulary state — no dictionary build, no broadcast, no OOV
    * problem, which is why it's the standard featurizer when the
    * vocabulary itself would not fit anywhere. Reported per
    * dimension: total token mass, documents with a nonzero entry,
    * and the heaviest single-document count — the collision-load
    * diagnostic that tells you whether 32 dims is too few. All
    * integer counts; the md5-bucket assignment is engine-exact, so
    * the whole feature matrix (not just its shape) is pinned by the
    * oracle hash. Map-side explode+bucket, two bounded aggregates. */
  def q138FeatureHashing(s: SparkSession, dir: String): DataFrame = {
    val tok = docs(s, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .where(length(col("w")) > 0)
    val perDoc = tok
      .withColumn("dim",
        conv(substring(md5(col("w")), 1, 7), 16, 10).cast("long") % 32)
      .groupBy(col("doc_id"), col("dim"))
      .agg(count(lit(1)).as("cnt"))
    perDoc.groupBy(col("dim"))
      .agg(sum(col("cnt")).as("total_count"),
        count(lit(1)).as("n_docs_nonzero"),
        max(col("cnt")).as("max_doc_count"))
      .orderBy(col("dim"))
  }

  /** q151 — unigram language-model quality scoring (the CCNet-style
    * perplexity filter, with the corpus itself as the LM): each doc's
    * average per-token surprise −ln p(token) under the corpus unigram
    * distribution; abnormally high = gibberish/noise, abnormally low =
    * boilerplate. Scale shape: ONE token explode; the vocabulary
    * aggregate is vocab-sized and broadcasts back onto the token
    * stream, so the only fact-sized shuffles are the vocab count and
    * the per-doc re-aggregate. Engine-exactness: p is a quotient of
    * exact longs; each token's surprise is FLOORED to integer
    * nano-nats (q101's trick — floor of a bit-identical double is
    * bit-identical, integer sums are shuffle-order-proof, where a
    * float Σ ln p would drift with partitioning); the per-doc mean
    * divides two exact integers and rounds at 6 dp, ~10² above any
    * libm ulp wobble in ln itself. */
  def q151UnigramLmScore(s: SparkSession, dir: String): DataFrame = {
    val toks = docs(s, dir)
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
    val vocab = toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val total = vocab.agg(sum(col("cnt")).as("t_total"))
    toks
      .join(broadcast(vocab), Seq("token"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"),
        floor(-log(col("cnt").cast("double") /
          col("t_total").cast("double")) * lit(1e9))
          .cast("bigint").as("surprise_nn"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("surprise_nn")).as("sum_nn"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("sum_nn").cast("double") /
          col("n_tokens").cast("double") / lit(1e9), 6)
          .as("avg_neg_log_prob"))
      .orderBy(col("doc_id"))
  }

  /** q186 — all-pairs TF-IDF cosine similarity via an inverted-index
    * join (Bayardo-style all-pairs, the sparse-vector twin of q31's
    * dense-embedding near-dup): per-doc term weights tf·idf are scaled
    * to INTEGER micro-units (floor ×10⁶, the q151/q159 house pattern)
    * so every sum — norms and pair dot products — is an integer
    * aggregate, deterministic under any shuffle order and therefore
    * bit-identical to the DuckDB oracle; the idf is the RATIO form
    * (q48/q83's pattern) so the float path into the floor is pure
    * IEEE +,/,× — no ln() whose last ulp differs per math library —
    * and the only remaining float ops are the two final sqrt/divide,
    * one fixed expression per pair. Terms in more
    * than a quarter of the corpus are dropped from the vector space
    * (the sklearn `max_df` convention): they carry near-zero idf but
    * would dominate the index join's bucket sizes. At 100 TB the
    * candidate join shuffles on term with buckets capped by max_df;
    * beyond that, q102's prefix-filter applies to this family
    * unchanged (sort terms by rarity, index only each vector's
    * τ-prefix). Output: pairs with cosine ≥ 0.5 — on the testdata
    * exactly the planted near-dup structure. */
  def q186AllPairsTfidf(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).repartition(s.sparkContext.defaultParallelism)
    val tf = d.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .persist()
    val dfc = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val total = d.agg(count(lit(1)).as("n"))
    // ratio-IDF ((n+1)/(df+1), q48/q83's house pattern): divide and
    // multiply are IEEE-correctly-rounded identically in both engines,
    // where ln() is implementation-defined per math library and a
    // 1-ulp divergence next to the ×10⁶ floor boundary would flip a
    // weight and the hash gate with it.
    val idf = (col("n") + lit(1.0)) / (col("df") + lit(1.0))
    val w = tf.join(dfc, "term").crossJoin(broadcast(total))
      .where(col("df") * 4 <= col("n"))
      .select(col("doc_id"), col("term"),
        floor(col("tf") * idf * lit(1000000)).cast("long").as("wi"))
      .persist()
    val nrm = w.groupBy(col("doc_id"))
      .agg(sum(col("wi") * col("wi")).as("sn"))
    val dot = w.select(col("doc_id").as("doc_a"), col("term"),
        col("wi").as("wa"))
      .join(w.select(col("doc_id").as("doc_b"), col("term"),
        col("wi").as("wb")), "term")
      .where(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(sum(col("wa") * col("wb")).as("dp"))
    dot
      .join(nrm.select(col("doc_id").as("doc_a"), col("sn").as("sna")),
        "doc_a")
      .join(nrm.select(col("doc_id").as("doc_b"), col("sn").as("snb")),
        "doc_b")
      .withColumn("cosine",
        col("dp") / (sqrt(col("sna")) * sqrt(col("snb"))))
      .where(col("cosine") >= 0.5)
      .select(col("doc_a"), col("doc_b"), round(col("cosine"), 6).as("cosine"))
  }
}
