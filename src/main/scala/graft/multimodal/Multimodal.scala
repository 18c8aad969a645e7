package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus a decode/feature-extract stage.
  *
  * The Spark-side shape is real and tested — schema, partitioning, batch
  * iteration via `mapPartitions` — while the actual media decode is a
  * STUB (the container has no image/audio libraries): `decodeStub`
  * derives deterministic fake metadata from the bytes. Swapping the stub
  * for a real decoder (e.g. javacv) changes one function, not the plan.
  *
  * At 100 TB: media blobs dominate row size, so the decode stage must
  * run AFTER partition pruning / metadata filtering, and the output
  * should drop the blob as early as possible (`select` away the binary
  * before any shuffle — blobs must never transit an exchange).
  */
object Multimodal {

  /** Typed metadata produced by the (stubbed) decoder. */
  case class MediaMeta(
    n_bytes: Long, format: String, width: Int, height: Int, n_frames: Int)

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", LongType, nullable = false),
      StructField("format", StringType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false))),
      nullable = true)))

  /** STUB decoder — deterministic fake metadata from the raw bytes.
    * Real implementation would parse the container header here; the
    * signature (bytes in, typed meta out, batch-per-partition) is the
    * production shape. */
  def decodeStub(bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length.toLong
    val fmt = if (n % 3 == 0) "png" else if (n % 3 == 1) "jpeg" else "webm"
    MediaMeta(n, fmt, (n % 1920).toInt + 1, (n % 1080).toInt + 1,
      (n % 30).toInt + 1)
  }

  /** Attach decoded metadata to a DataFrame with (`idCol`, binary
    * `contentCol`). Runs partition-at-a-time: one decoder instance per
    * partition (the expensive init amortizes across the batch), constant
    * memory (iterator in, iterator out). */
  def withDecodedMeta(df: DataFrame, idCol: String, contentCol: String)
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val idIdx = df.schema.fieldIndex(idCol)
    val cIdx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { rows =>
      // per-partition decoder init would go here (ImageIO/AudioSystem
      // are static; a model-backed decoder loads once per partition)
      rows.map { r =>
        val id = r.getLong(idIdx)
        val bytes =
          if (r.isNullAt(cIdx)) Array.emptyByteArray
          else r.getAs[Array[Byte]](cIdx)
        // REAL branch first: blobs whose magic bytes name a container
        // the JDK decodes (PNG/JPEG/GIF/BMP/WAV) get actual
        // dimensions/frame counts via MediaDecode; everything else
        // keeps the deterministic stub (the oracle-checked path).
        val m = MediaDecode.decodeMeta(bytes).getOrElse(decodeStub(bytes))
        (id, m.n_bytes, m.format, m.width, m.height, m.n_frames)
      }
    }.toDF(idCol, "n_bytes", "format", "width", "height", "n_frames")
  }

  /** Documents-as-media: treat the utf-8 text bytes as an opaque blob —
    * exercises the binary column path end-to-end on real testdata. */
  def documentsAsMedia(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("doc_id").as("media_id"),
        col("text").cast("binary").as("content"))

  /** Resize target preserving aspect ratio: longest side scaled to
    * `maxDim`, never upscaled. Integer arithmetic only, so the DuckDB
    * oracle states the identical formula; a real resize kernel would
    * consume these dims inside the mapPartitions decode stage. */
  def resizedDims(width: Column, height: Column, maxDim: Int)
      : (Column, Column) = {
    val longest = greatest(width, height)
    val scaleNum = least(longest, lit(maxDim)) // scaled longest side
    // explicit floor: Spark's cast(double→int) truncates but DuckDB's
    // rounds, so the shared formula must pin the rounding itself
    val w = floor(width * scaleNum / longest).cast("int")
    val h = floor(height * scaleNum / longest).cast("int")
    (w, h)
  }

  /** Frame-sample indices: every `step`-th frame id in [0, nFrames).
    * `sequence` is a codegen'd builtin — the expensive part (decoding
    * the sampled frames) stays in the batch decode stage; this just
    * plans WHICH frames to touch, which is what keeps video columns
    * tractable at 100 TB (decode cost ∝ sampled frames, not duration). */
  def frameSampleIdx(nFrames: Column, step: Int): Column =
    when(nFrames <= 0, array().cast("array<int>"))
      .otherwise(sequence(lit(0), nFrames - 1, lit(step)).cast("array<int>"))

  /** q33 — the media preprocessing plan over stub-decoded metadata:
    * resize target dims and sampled-frame counts per media row. All
    * arithmetic on the deterministic stub meta → full DuckDB oracle. */
  def q33MediaPreprocess(s: SparkSession, dir: String): DataFrame = {
    val meta = withDecodedMeta(documentsAsMedia(s, dir), "media_id", "content")
    val (rw, rh) = resizedDims(col("width"), col("height"), 512)
    meta.select(
      col("media_id"), col("format"), col("width"), col("height"),
      rw.as("resize_w"), rh.as("resize_h"),
      col("n_frames"),
      size(frameSampleIdx(col("n_frames"), 5)).as("n_sampled_frames"))
  }

  val FeatureDim = 16

  /** STUB feature extractor — stands in for the CLIP/audio-embedding
    * model a real pipeline runs here. The batch shape is the production
    * one (mapPartitions: model loads once per partition, streams the
    * batch, constant memory); the stub's arithmetic is deliberately
    * SQL-expressible so the DOWNSTREAM similarity search stays
    * end-to-end oracle-checkable. Real extractor: replace the formula
    * with a forward pass, nothing else moves. */
  def featureStub(mediaId: Long, nBytes: Long): Array[Double] =
    Array.tabulate(FeatureDim)(i =>
      ((mediaId * 31 + i * 7 + nBytes) % 1000) / 1000.0 - 0.5)

  /** Media → feature vectors, partition-at-a-time. Drops the blob in
    * the same pass (blobs must never transit an exchange). */
  def withFeatures(df: DataFrame, idCol: String, contentCol: String)
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val idIdx = df.schema.fieldIndex(idCol)
    val cIdx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { rows =>
      // per-partition model init would go here (STUB: none)
      rows.map { r =>
        val id = r.getLong(idIdx)
        val n =
          if (r.isNullAt(cIdx)) 0L
          else r.getAs[Array[Byte]](cIdx).length.toLong
        (id, featureStub(id, n))
      }
    }.toDF(idCol, "features")
  }

  /** q52 — multimodal similarity search end-to-end: binary media →
    * stub feature extraction (mapPartitions) → brute-force cosine top-5
    * for the first 10 media ids, reusing the fused DotProduct
    * expression. The complete media-dedup/search plumbing with a full
    * DuckDB oracle. */
  def q52MediaKnn(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity.{dot, norm}
    val feats = withFeatures(
      documentsAsMedia(s, dir)
        .repartition(s.sparkContext.defaultParallelism),
      "media_id", "content")
      .withColumn("f_norm", norm(col("features")))
    val queries = feats.where(col("media_id") < 10)
      .select(col("media_id").as("query_id"), col("features").as("qf"),
        col("f_norm").as("q_norm"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("media_id").asc)
    feats.join(broadcast(queries), col("media_id") =!= col("query_id"))
      .withColumn("cosine",
        dot(col("features"), col("qf")) / (col("f_norm") * col("q_norm")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 5)
      .select(col("query_id"), col("rank"),
        col("media_id").as("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** q25 — binary-column metadata extraction with an oracle: byte
    * length, sha256 content digest, and the stub-decoded dimensions
    * (pure arithmetic on byte length, so DuckDB can state the same
    * formula). Expression-only variant of the mapPartitions path. */
  def q25BinaryMeta(s: SparkSession, dir: String): DataFrame =
    documentsAsMedia(s, dir)
      .select(
        col("media_id"),
        length(col("content")).as("n_bytes"),
        sha2(col("content"), 256).as("sha256_hex"),
        (col("content").isNotNull).cast("int").as("has_content"),
        (length(col("content")) % 1920 + 1).as("fake_width"),
        (length(col("content")) % 1080 + 1).as("fake_height"))

  /** Variants per media row for q177: the original plus two derived
    * renditions (thumbnail, re-encode) — the real-world source of image
    * near-dups. */
  val PhashVariants = 3
  /** Pairs within this Hamming distance are near-dups; with 4 bands of
    * 16 bits, pigeonhole guarantees every such pair agrees exactly on
    * ≥1 band, so the band equi-join is lossless. */
  val PhashHammingMax = 3

  /** 8×8 "luminance" grid for one media row: pixel i is an md5-derived
    * byte of the content digest (the STUB decode — a real decoder would
    * downsample the actual image here; everything after this array is
    * the production aHash pipeline). Computed ONCE per media row,
    * BEFORE the variant explode — the generator carries the evaluated
    * array by value, so the 64 md5s are never re-derived per variant. */
  private def phashPixels(sha: Column): Column =
    transform(sequence(lit(0), lit(63)), i =>
      conv(substring(md5(concat(sha, lit(":"), i.cast("string"))), 1, 2),
        16, 10).cast("int"))

  /** One 16-bit band of the 64-bit average-hash fingerprint from the
    * precomputed pixel array: variant v shifts the first 2·v pixels by
    * +128 mod 256 (the deterministic stand-in for re-encode noise),
    * and bit i is set iff the pixel clears the fixed mid-gray
    * threshold. Pure builtin array arithmetic — stays inside
    * whole-stage codegen. */
  private def phashBand(px: Column, v: Column, b: Int): Column =
    aggregate(
      sequence(lit(b * 16), lit(b * 16 + 15)), lit(0),
      (acc: Column, i: Column) => {
        val base = element_at(px, i + 1)
        val pixel = when(i < v * 2, (base + 128) % 256).otherwise(base)
        acc + when(pixel > 128,
          pow(lit(2), i % 16).cast("int")).otherwise(lit(0))
      })

  /** Audio framing constants: 64-sample windows, 32-sample hop — the
    * standard overlapping short-time analysis grid, scaled down to the
    * testdata's byte counts (a real 16 kHz pipeline uses 400/160). */
  val AudioWin = 64
  val AudioHop = 32

  /** q183 — audio short-time-energy feature extraction, the audio leg
    * of the multimodal triple (q33 image resize, q177 image near-dup,
    * q183 audio): each media blob is (stub-)decoded to PCM samples
    * (byte → unsigned value recentered to [-128,127]; a real decoder
    * would parse the container and emit 16-bit samples), framed into
    * overlapping [[AudioWin]]/[[AudioHop]] windows, and each frame's
    * energy Σs² is computed IN-ROW by the native
    * [[graft.functions.FrameEnergies]] Catalyst expression — a
    * rolling-sum loop over the raw bytes inside whole-stage codegen
    * (the builtin-composition form paid two string allocations per
    * byte and O(win) work per sample; the expression is O(n) with one
    * output allocation). No explode, so a blob never fans out to
    * frames×samples rows, and nothing blob-sized ever shuffles: the
    * plan is exchange-free and 7 scalars per row leave the scan stage,
    * which at 100 TB is the entire point of feature extraction inside
    * the scan. Peak-picking and the loud-frame count (energy ≥ half
    * the peak) are the downstream VAD/trim primitives. Fully
    * oracle-checked: DuckDB states the identical arithmetic over
    * hex(encode(text)). */
  def q183AudioFrames(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.AudioFrames.frameEnergies
    // no repartition: a pre-decode repartition would ship the BLOB
    // through an exchange. Scan splits (maxPartitionBytes) already
    // parallelize a 100 TB media table; the plan below is exchange-free.
    documentsAsMedia(s, dir)
      .select(col("media_id"),
        length(col("content")).cast("long").as("n_samples"),
        frameEnergies(col("content"), AudioWin, AudioHop).as("en"))
      .withColumn("n_frames", size(col("en")))
      .select(col("media_id"), col("n_samples"), col("n_frames"),
        coalesce(aggregate(col("en"), lit(0L), _ + _), lit(0L))
          .as("total_energy"),
        when(col("n_frames") > 0, array_max(col("en")))
          .otherwise(lit(-1L)).as("peak_energy"),
        when(col("n_frames") > 0,
          array_position(col("en"), array_max(col("en"))) - 1)
          .otherwise(lit(-1L)).as("peak_frame"),
        when(col("n_frames") > 0,
          size(filter(col("en"), x => x * 2 >= array_max(col("en")))))
          .otherwise(lit(0)).as("n_loud"))
  }

  /** q177 — image perceptual-hash near-dup detection (aHash + banded
    * Hamming), the media twin of q140's SimHash banding: each media row
    * spawns 3 renditions, each rendition gets a 64-bit average-hash
    * fingerprint from the (stub-)decoded 8×8 luminance grid, and the
    * fingerprint's four 16-bit bands equi-join to surface every pair
    * within Hamming distance 3 — by pigeonhole, lossless, without the
    * corpus² Hamming join. Verification is 4 codegen'd
    * `bit_count(xor)` per candidate. At 100 TB the blob never leaves
    * the decode stage (only 4 ints shuffle per rendition), band
    * buckets stay collision-sized because the hash is uniform off-dup,
    * and the same plan serves real decoders by swapping the pixel
    * stub. Fully hash-checked: DuckDB reproduces the md5-derived grid,
    * the threshold bits, and the band arithmetic exactly. */
  def q177PhashNearDup(s: SparkSession, dir: String): DataFrame = {
    val fps = documentsAsMedia(s, dir)
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("media_id"),
        phashPixels(sha2(col("content"), 256)).as("px"))
      .withColumn("v", explode(sequence(lit(0), lit(PhashVariants - 1))))
      .select(
        col("media_id"), col("v"),
        (col("media_id") * PhashVariants + col("v")).as("vid"),
        phashBand(col("px"), col("v"), 0).as("b0"),
        phashBand(col("px"), col("v"), 1).as("b1"),
        phashBand(col("px"), col("v"), 2).as("b2"),
        phashBand(col("px"), col("v"), 3).as("b3"))

    // persisted: the self-join would otherwise re-derive the grid and
    // bands on both sides (at scale: the decode stage runs once, the
    // index is what joins)
    val banded = fps.select(col("media_id"), col("v"), col("vid"),
      col("b0"), col("b1"), col("b2"), col("b3"),
      posexplode(array(col("b0"), col("b1"), col("b2"), col("b3"))))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_val"))
      .persist()

    val a = banded.as("a")
    val b = banded.as("b")
    val hamming =
      bit_count(col("a.b0").bitwiseXOR(col("b.b0"))) +
      bit_count(col("a.b1").bitwiseXOR(col("b.b1"))) +
      bit_count(col("a.b2").bitwiseXOR(col("b.b2"))) +
      bit_count(col("a.b3").bitwiseXOR(col("b.b3")))
    a.join(b,
        col("a.band") === col("b.band") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.vid") < col("b.vid"))
      .where(hamming <= PhashHammingMax)
      .select(
        col("a.media_id").as("media_a"), col("a.v").as("variant_a"),
        col("b.media_id").as("media_b"), col("b.v").as("variant_b"),
        hamming.as("hamming"),
        (col("a.media_id") === col("b.media_id")).cast("int")
          .as("same_media"))
      .distinct()
  }

  /** REAL-image fingerprints: decode each blob with
    * [[MediaDecode.luminanceGrid]] (actual pixels, average-pooled 8×8)
    * and push the grid through the SAME 4×16-bit aHash band pipeline
    * q177 runs on the stub grid — so swapping stub→real moves one
    * mapPartitions stage and zero downstream operators (the banded
    * Hamming join, verification, and shuffle shape are untouched).
    * Non-decodable rows are dropped (an image near-dup pass only wants
    * images); the blob dies in the scan stage, 4 ints per row leave. */
  def realPhashFingerprints(df: DataFrame, idCol: String,
      contentCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val idIdx = df.schema.fieldIndex(idCol)
    val cIdx = df.schema.fieldIndex(contentCol)
    val px = df.mapPartitions { rows =>
      rows.flatMap { r =>
        if (r.isNullAt(cIdx)) None
        else MediaDecode.luminanceGrid(r.getAs[Array[Byte]](cIdx))
          .map(g => (r.getLong(idIdx), g))
      }
    }.toDF(idCol, "px")
    px.select(col(idCol),
      phashBand(col("px"), lit(0), 0).as("b0"),
      phashBand(col("px"), lit(0), 1).as("b1"),
      phashBand(col("px"), lit(0), 2).as("b2"),
      phashBand(col("px"), lit(0), 3).as("b3"))
  }

  /** Video frame length in bytes for the stub decode: each
    * non-overlapping [[VideoFrame]]-byte slice of the blob is one frame
    * and its energy the luma proxy (a real decoder emits per-frame luma
    * planes; the arithmetic downstream is identical). */
  val VideoFrame = 48

  /** q190 — video shot-boundary detection + keyframe sampling, the
    * frame-sample leg that completes the multimodal matrix (q33 image
    * resize, q177 image near-dup, q183 audio features, q190 video):
    * the blob is (stub-)decoded to non-overlapping [[VideoFrame]]-byte
    * frames whose energies are per-frame luma proxies — computed by the
    * same native [[graft.functions.FrameEnergies]] codegen expression
    * as q183, with win=hop so the rolling sum degenerates to one pass —
    * and a shot boundary is declared wherever adjacent frames' luma
    * jumps by ≥ peak/4 (relative threshold, integer-exact in both
    * engines). The sampled keyframes are each shot's first frame — the
    * standard one-frame-per-shot sampling a vision pipeline feeds its
    * encoder — and the audit emits per-video shot counts, the first cut,
    * the sampled frames' energy total, and the longest shot. Everything
    * is IN-ROW via higher-order array functions: no explode, no join,
    * and the plan is exchange-free, so a 100 TB video table never fans
    * out to frames×videos rows and no blob transits a shuffle. Fully
    * hash-checked: DuckDB restates the framing, the cut predicate, and
    * the shot-length recurrence over hex(encode(text)). */
  def q190VideoShots(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.AudioFrames.frameEnergies
    // frame positions are 1-indexed throughout (element_at / DuckDB
    // list semantics), so `starts` begins at 1 and frame k's energy is
    // element_at(en, k)
    val cutsFrom2 = filter(sequence(lit(2), col("n_frames")),
      k => abs(element_at(col("en"), k) - element_at(col("en"), k - 1))
        * 4 >= col("peak"))
    val shotEnds = concat(
      slice(col("starts"), lit(2), size(col("starts")) - 1),
      array(col("n_frames") + 1))
    documentsAsMedia(s, dir)
      .select(col("media_id"),
        frameEnergies(col("content"), VideoFrame, VideoFrame).as("en"))
      .withColumn("n_frames", size(col("en")))
      .withColumn("peak",
        when(col("n_frames") > 0, array_max(col("en"))).otherwise(lit(0L)))
      .withColumn("starts",
        when(col("n_frames") > 1, concat(array(lit(1)), cutsFrom2))
          .when(col("n_frames") === 1, array(lit(1)))
          .otherwise(array().cast("array<int>")))
      .select(
        col("media_id"), col("n_frames"),
        size(col("starts")).as("n_shots"),
        when(size(col("starts")) > 1, element_at(col("starts"), 2))
          .otherwise(lit(-1)).as("first_cut"),
        coalesce(aggregate(col("starts"), lit(0L),
          (acc, k) => acc + element_at(col("en"), k)), lit(0L))
          .as("sampled_energy"),
        when(col("n_frames") > 0,
          array_max(zip_with(col("starts"), shotEnds, (a, b) => b - a)))
          .otherwise(lit(-1)).as("longest_shot"))
  }
}
