package graft.format

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A minimal Delta/Iceberg-style TABLE FORMAT over plain parquet —
  * the unified manifest+snapshot layer VERDICT r7 named as the one
  * big engine feature a 100 TB lake user would still ask for. The
  * capabilities q124 (zone maps), q123 (incremental maintenance),
  * q204 (atomic pointer commits) and q64 (SCD2) approximate piecewise
  * live here as ONE on-disk contract:
  *
  * {{{
  * <root>/data/c<ver>_<uuid>/part-*.parquet     immutable data files
  * <root>/_log/manifest-v<N>_<uuid>/  (parquet) file list + per-file
  *                                              typed min/max stats
  * <root>/_log/snapshot-v<N>.txt                THE commit record
  * }}}
  *
  * Commit protocol (optimistic, lock-free): data files and the new
  * manifest are written to names no reader resolves, then the commit
  * is ONE atomic `Files.createFile` of `snapshot-v<N>.txt` — it names
  * the manifest dir, so a crash anywhere earlier leaves only
  * invisible garbage, and two racing writers of version N can't both
  * win (the loser gets [[ConcurrentCommitException]], re-reads the
  * new current version, rebases its already-written data files onto
  * the winner's manifest, and claims N+1). The current version is
  * `max(N)` over snapshot files — no mutable pointer, no window where
  * data and metadata disagree. This is exactly the recipe the
  * published formats use (Delta's `_delta_log/<N>.json` put-if-absent,
  * Iceberg's snapshot pointer swap), re-expressed on a filesystem.
  *
  * Reads: a snapshot's manifest IS the file list — `read(version)` is
  * time travel for free, and per-file min/max stats give zone-map
  * FILE SKIPPING ([[prunedRead]]): a range predicate on a stats
  * column opens only files whose [min,max] intersects it, the same
  * skipping partition pruning gives but at file granularity with no
  * directory scheme. Deletes are COPY-ON-WRITE at file granularity:
  * one audit aggregate finds per-file hit counts, untouched files
  * carry forward by reference, all-hit files drop from the manifest,
  * mixed files rewrite without their matching rows.
  *
  * Scale notes: every driver-side structure here is FILE-LIST-sized —
  * the same state Spark's own FileIndex holds for any parquet read —
  * and manifests are parquet, so a billion-file manifest is itself
  * distributed-scannable. Stats collection is one aggregate over the
  * just-written files (group by `input_file_name`), map-side
  * combinable. History parsing reads version-count-sized text files.
  *
  * The reference has no table format (raw S3 parquet + Glue catalog,
  * SURVEY §1.2); extension tier.
  */
final class GraftTable private (
    val spark: SparkSession, val root: String,
    val statsCols: Seq[String],
    val bloomCols: Seq[String] = Nil,
    bloomBits0: Int = graft.functions.BloomFilterIndex.DefaultBits) {

  /** Bloom width in bits. `forPath` passes the LAZY sentinel (-1):
    * detecting the recorded width costs a manifest job, and only the
    * write path needs it — a read-side open must stay metadata-cheap
    * (scans call forPath several times per query). */
  lazy val bloomBits: Int =
    if (bloomBits0 > 0) bloomBits0
    else manifest()
      .select(size(col(s"bloom_${bloomCols.head}")).as("w"))
      .where(col("w") > 0).limit(1).collect().headOption
      .map(_.getInt(0) * 64)
      .getOrElse(graft.functions.BloomFilterIndex.DefaultBits)

  import GraftTable._

  // ---- version / snapshot resolution --------------------------------

  /** Highest committed version (max over snapshot files), 0 = none. */
  def currentVersion: Long = GraftTable.versionAt(root)

  private def snapshot(v: Long): Snapshot = {
    val p = java.nio.file.Paths.get(logDir(root), s"snapshot-v$v.txt")
    val lines = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      .split("\n").map(_.trim).filter(_.nonEmpty)
    val kv = lines.map { l =>
      val i = l.indexOf('='); (l.take(i), l.drop(i + 1))
    }.toMap
    Snapshot(v, kv("op"), kv("parent").toLong, kv("manifest"),
      kv("n_files").toLong, kv("n_rows").toLong,
      kv.get("applied").filter(_.nonEmpty)
        .map(_.split(",").map(_.toLong).toSet).getOrElse(Set.empty),
      kv.get("schema").filter(_.nonEmpty),
      kv.get("dv").filter(_.nonEmpty),
      kv.get("n_dels").map(_.toLong).getOrElse(0L))
  }

  /** The table schema RECORDED AT COMMIT TIME (Delta's metadata
    * action restated): appends/merges union new columns onto the
    * parent's schema, overwrite replaces it, content-preserving ops
    * (delete/compact/zorder) carry it forward. Lets the connector
    * resolve a schema without opening a single data-file footer —
    * at 100 TB, one remote footer read per query planning is a real
    * cost. None only for tables committed before schema recording. */
  def recordedSchema(version: Long = currentVersion)
      : Option[org.apache.spark.sql.types.StructType] =
    snapshot(version).schemaJson.map(j =>
      org.apache.spark.sql.types.DataType.fromJson(j)
        .asInstanceOf[org.apache.spark.sql.types.StructType])

  /** Streaming-batch ids already folded into the current snapshot —
    * the table-format twin of q204's applied-batch ledger, carried in
    * the same atomic commit record as the data it describes. */
  def appliedBatches: Set[Long] =
    if (currentVersion == 0) Set.empty else snapshot(currentVersion).applied

  /** The manifest DataFrame of a version: one row per live data file
    * (`path` relative to root, `row_count`, typed `min_<c>`/`max_<c>`
    * per stats column). */
  def manifest(version: Long = currentVersion): DataFrame =
    spark.read.parquet(s"${logDir(root)}/${snapshot(version).manifestDir}")

  private def filePaths(version: Long): Seq[String] =
    manifest(version).select("path").collect()
      .map(r => s"$root/${r.getString(0)}").toSeq

  // ---- deletion vectors (merge-on-read) ------------------------------

  /** Whether `version` carries a DELETION VECTOR — logically-deleted
    * (file, row-ordinal) pairs recorded by [[deleteWhereMor]] instead
    * of a copy-on-write rewrite. */
  def hasDeletionVectors(version: Long = currentVersion): Boolean =
    version > 0 && snapshot(version).dvDir.isDefined

  /** Logically deleted rows of `version`: `(path, pos)` — root-
    * relative data-file path and the row's ordinal within that file
    * (parquet files are immutable, so the ordinal is a stable row id).
    * Empty frame when the version has none. */
  def deletionVectors(version: Long = currentVersion): DataFrame =
    (if (version == 0) None else snapshot(version).dvDir) match {
      case Some(d) => spark.read.parquet(s"${logDir(root)}/$d")
      case None => emptyDv
    }

  private def emptyDv: DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType(Seq(StructField("path", StringType),
        StructField("pos", LongType))))
  }

  /** `file_path` URI → root-relative `data/c…/part-….parquet` as a
    * codegen'd builtin — the same normalization [[writeData]] applies
    * to manifest paths, so DV paths and manifest paths always join. */
  private def relPathExpr(c: Column): Column =
    regexp_extract(c, "(data/c[^/]+/[^/]+)$", 1)

  /** Stamp each row with its stable identity: `_gt_path` (root-
    * relative file) and `_gt_pos` (row ordinal in file), off the
    * parquet source's `_metadata` column — join-safe, unlike
    * `input_file_name()`, and computed natively by the vectorized
    * reader. `df` must be a direct parquet read of table files. */
  private def withRowId(df: DataFrame): DataFrame = df
    .withColumn("_gt_path", relPathExpr(col("_metadata.file_path")))
    .withColumn("_gt_pos", col("_metadata.row_index"))

  /** Drop `version`'s logically-deleted rows from `df`, which must
    * already expose `_gt_path`/`_gt_pos`. The DV side is deletes-
    * since-last-compaction-sized — Catalyst broadcasts it when small;
    * a table whose DV has grown large should [[compact]], which
    * materializes deletions away. */
  private def minusDv(df: DataFrame, version: Long): DataFrame =
    if (!hasDeletionVectors(version)) df
    else df.join(
      deletionVectors(version)
        .select(col("path").as("_gt_path"), col("pos").as("_gt_pos")),
      Seq("_gt_path", "_gt_pos"), "left_anti")

  /** DV-filter a plain table read, preserving its column set. */
  private def applyDv(df: DataFrame, version: Long): DataFrame =
    if (!hasDeletionVectors(version)) df
    else {
      val cols = df.columns.toIndexedSeq
      minusDv(withRowId(df), version).select(cols.map(col): _*)
    }

  // ---- reads ---------------------------------------------------------

  /** The table at `version` (defaults to current) — time travel is
    * just resolving an older manifest. */
  def read(version: Long = currentVersion): DataFrame = {
    val paths = filePaths(version)
    if (paths.isEmpty) spark.emptyDataFrame
    else applyDv(spark.read.parquet(paths: _*), version)
  }

  /** Zone-map pruned read: only files whose [min,max] envelope of
    * `statsCol` intersects [lo, hi] are opened; the residual filter
    * still applies row-level (file skipping is a superset guarantee).
    * Returns (rows, filesOpened, filesTotal) so callers — and specs —
    * can see the skip rate. */
  def prunedRead(statsCol: String, lo: Column, hi: Column)
      : (DataFrame, Long, Long) = {
    require(statsCols.contains(statsCol), s"no stats for $statsCol")
    val m = manifest().cache()
    val total = m.count()
    val live = m.where(!(col(s"max_$statsCol") < lo ||
        col(s"min_$statsCol") > hi))
      .select("path").collect().map(r => s"$root/${r.getString(0)}")
    m.unpersist()
    val df =
      if (live.isEmpty) read().limit(0)
      else applyDv(spark.read.parquet(live.toSeq: _*), currentVersion)
    (df.where(col(statsCol) >= lo && col(statsCol) <= hi),
      live.length.toLong, total)
  }

  /** GENERAL predicate-driven zone maps: translate an arbitrary data
    * predicate into a manifest-stats predicate — each comparison on a
    * stats column becomes an interval test against that file's
    * [min,max] envelope, And/Or recurse, and anything the translation
    * doesn't understand (other columns, functions, NOT) becomes
    * `true` (keep the file) — so skipping is always CONSERVATIVE and
    * the row-level filter re-applied on the survivors makes the
    * result exact regardless. This is the Delta/Iceberg data-skipping
    * contract: pruning is an optimization, never a semantics change.
    * Returns (rows, filesOpened, filesTotal). */
  def prunedWhere(cond: Column): (DataFrame, Long, Long) = {
    val m = manifest().cache()
    val total = m.count()
    val live = m.where(statsKeep(cond, currentVersion))
      .select("path").collect().map(r => s"$root/${r.getString(0)}")
    m.unpersist()
    val df =
      if (live.isEmpty) read().limit(0)
      else applyDv(spark.read.parquet(live.toSeq: _*), currentVersion)
    (df.where(cond), live.length.toLong, total)
  }

  /** The manifest-level KEEP predicate for `cond` against `version`'s
    * schema — the envelope translation [[prunedWhere]] scans with,
    * shared by the COW mutation paths so their candidate audits read
    * only stats-intersecting files (a file this predicate drops
    * provably holds no cond-TRUE row). */
  private def statsKeep(cond: Column, version: Long): Column = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.graft.ColumnBridge
    // Resolve through the analyzer against the table's own schema:
    // Spark 4 Columns carry lazy ColumnNodes, and only analysis turns
    // them into the And/Or/comparison tree (with literals cast to the
    // column type) this translation walks.
    def attr(e: Expression): Option[String] = e match {
      case a: AttributeReference if statsCols.contains(a.name) =>
        Some(a.name)
      case _ => None // incl. Cast(attr): a cast can break monotonicity
    }
    // equality probes can also prune through a BLOOM INDEX (columns
    // the table is not clustered on); envelope and bloom tests AND
    def attrEq(e: Expression): Option[String] = e match {
      case a: AttributeReference
          if statsCols.contains(a.name) || bloomCols.contains(a.name) =>
        Some(a.name)
      case _ => None
    }
    def eqTest(c: String, lv: Column): Column = {
      val env =
        if (statsCols.contains(c))
          col(s"min_$c") <= lv && col(s"max_$c") >= lv
        else lit(true)
      val blm =
        if (bloomCols.contains(c))
          graft.functions.BloomFilterIndex
            .mightContain(col(s"bloom_$c"), lv)
        else lit(true)
      env && blm
    }
    def value(e: Expression): Option[Column] = e match {
      case l: Literal => Some(ColumnBridge.column(l))
      case c if c.foldable => // analyzer-inserted Cast over a literal
        Some(ColumnBridge.column(Literal.create(c.eval(null), c.dataType)))
      case _ => None
    }
    def keep(e: Expression): Column = e match {
      case And(l, r) => keep(l) && keep(r)
      case Or(l, r) => keep(l) || keep(r)
      case EqualTo(a, v) => (attrEq(a), value(v)) match {
        case (Some(c), Some(lv)) => eqTest(c, lv)
        case _ => (attrEq(v), value(a)) match { // literal on the left
          case (Some(c), Some(lv)) => eqTest(c, lv)
          case _ => lit(true)
        }
      }
      case GreaterThan(a, v) => (attr(a), value(v), attr(v), value(a)) match {
        case (Some(c), Some(lv), _, _) => col(s"max_$c") > lv   // c > v
        case (_, _, Some(c), Some(lv)) => col(s"min_$c") < lv   // v > c
        case _ => lit(true)
      }
      case GreaterThanOrEqual(a, v) =>
        (attr(a), value(v), attr(v), value(a)) match {
          case (Some(c), Some(lv), _, _) => col(s"max_$c") >= lv
          case (_, _, Some(c), Some(lv)) => col(s"min_$c") <= lv
          case _ => lit(true)
        }
      case LessThan(a, v) => (attr(a), value(v), attr(v), value(a)) match {
        case (Some(c), Some(lv), _, _) => col(s"min_$c") < lv
        case (_, _, Some(c), Some(lv)) => col(s"max_$c") > lv
        case _ => lit(true)
      }
      case LessThanOrEqual(a, v) =>
        (attr(a), value(v), attr(v), value(a)) match {
          case (Some(c), Some(lv), _, _) => col(s"min_$c") <= lv
          case (_, _, Some(c), Some(lv)) => col(s"max_$c") >= lv
          case _ => lit(true)
        }
      case In(a, vs)
          if attrEq(a).isDefined && vs.forall(value(_).isDefined) =>
        val c = attrEq(a).get
        vs.map(v => eqTest(c, value(v).get)).reduce(_ || _)
      case _ => lit(true) // NOT, functions, other columns: keep
    }
    val resolved = ColumnBridge
      .analyzed(read(version).where(cond))
      .collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition
      }
      .getOrElse(throw new IllegalArgumentException(
        s"predicate did not analyze to a Filter: $cond"))
    keep(resolved)
  }

  /** The table with schemas MERGED across commits (schema evolution:
    * files written before a column existed surface it as null —
    * q185's mergeSchema mechanics, owned by the format layer). */
  def readMerged(version: Long = currentVersion): DataFrame = {
    val paths = filePaths(version)
    if (paths.isEmpty) spark.emptyDataFrame
    else applyDv(
      spark.read.option("mergeSchema", "true").parquet(paths: _*), version)
  }

  /** CDC-style incremental read: the rows of files ADDED between two
    * snapshots (exactly the appended rows under append-only history;
    * under COW rewrites, the post-image of rewritten files). This is
    * what lets a downstream consumer maintain a derived table without
    * rescanning — Delta's change-data-feed restated at file
    * granularity. The file-set diff is manifest-sized. A
    * [[deleteWhereMor]] commit adds no files, so MOR deletes do not
    * surface here (stream/CDC from append-only tables). */
  def readChanges(fromVersion: Long, toVersion: Long): DataFrame = {
    val toPaths = manifest(toVersion).select("path")
    val added = (if (fromVersion == 0) toPaths // v0: everything is new
      else toPaths.except(manifest(fromVersion).select("path")))
      .collect().map(r => s"$root/${r.getString(0)}")
    if (added.isEmpty) read(toVersion).limit(0)
    else spark.read.parquet(added.toSeq: _*)
  }

  /** ROW-LEVEL CDC: every change between two snapshots as an event
    * stream — `_change_type` 'insert' for rows of files ADDED in the
    * window ([[readChanges]]' file diff), 'delete' for rows whose
    * (file, ordinal) JOINED THE DELETION VECTOR in the window,
    * materialized from their files by position. A row appended then
    * MOR-deleted inside the window emits both events (net zero under
    * a downstream fold — Delta CDF's contract). The delete
    * materialization reads only files carrying NEW DV entries. Same
    * COW caveat as [[readChanges]]: a copy-on-write rewrite surfaces
    * as its post-image inserts (feed CDC from append+MOR tables). */
  def readCdc(fromVersion: Long, toVersion: Long): DataFrame = {
    val inserts = readChanges(fromVersion, toVersion)
      .withColumn("_change_type", lit("insert"))
    val dvNew = deletionVectors(toVersion)
      .join(deletionVectors(fromVersion), Seq("path", "pos"), "left_anti")
      // only files still LIVE at toVersion can materialize their
      // deleted rows (a file both DV'd and rewritten left the
      // manifest and its entries with it)
      .join(manifest(toVersion).select("path"), Seq("path"), "left_semi")
    val touched = dvNew.select("path").distinct()
      .collect().map(_.getString(0))
    if (touched.isEmpty) return inserts
    val raw = spark.read
      .parquet(touched.toIndexedSeq.map(p => s"$root/$p"): _*)
    val dataCols = raw.columns.toIndexedSeq
    val deletes = withRowId(raw)
      .join(dvNew.select(col("path").as("_gt_path"),
        col("pos").as("_gt_pos")), Seq("_gt_path", "_gt_pos"),
        "left_semi")
      .select(dataCols.map(col): _*)
      .withColumn("_change_type", lit("delete"))
    inserts.unionByName(deletes, allowMissingColumns = true)
  }

  /** Physically delete everything the last `retainLast` snapshots no
    * longer reference: older snapshot records, their manifests, and
    * any data file only they pointed at. Time travel behind the
    * horizon is gone afterwards — that is the deal vacuum offers; the
    * horizon is visible in [[history]], and readers must stay inside
    * it (Delta's RETAIN contract — vacuum cannot see a remote
    * reader's plan, so the retention window IS the guard).
    *
    * Files referenced by NO snapshot at all are either crash orphans
    * or an IN-FLIGHT concurrent writer's not-yet-committed data
    * (writeData runs before the atomic snapshot create): those are
    * deleted only when older than `minOrphanAgeMs` (Delta's
    * retention-hours pattern), so vacuum never races a live commit.
    * Pass 0 to force-collect known-dead orphans (crash recovery).
    *
    * Returns the number of data files deleted. Driver work is
    * file-list-sized, IO is unreferenced-files-sized. */
  def vacuum(retainLast: Int = 1,
      minOrphanAgeMs: Long = DefaultOrphanRetentionMs): Int = {
    require(retainLast >= 1,
      "vacuum must retain at least the current snapshot")
    val cur = currentVersion
    val keepFrom = math.max(1L, cur - retainLast + 1)
    val live = (keepFrom to cur).flatMap(v =>
      manifest(v).select("path").collect().map(_.getString(0))).toSet
    // referenced by ANY committed snapshot ⇒ deleting it is reclaiming
    // expired history; referenced by none ⇒ orphan, age-guarded
    val referencedEver = (1L to cur).flatMap { v =>
      try manifest(v).select("path").collect().map(_.getString(0))
      catch { case _: java.nio.file.NoSuchFileException => Array.empty[String] }
    }.toSet
    val orphanCutoff = System.currentTimeMillis() - minOrphanAgeMs
    val dataDir = new java.io.File(s"$root/data")
    var deleted = 0
    val commitDirs = Option(dataDir.listFiles()).getOrElse(Array.empty)
    commitDirs.foreach { cd =>
      Option(cd.listFiles()).getOrElse(Array.empty).foreach { f =>
        val rel = s"data/${cd.getName}/${f.getName}"
        val collectable = !live.contains(rel) &&
          (referencedEver.contains(rel) || f.lastModified() < orphanCutoff)
        if (f.getName.endsWith(".parquet") && collectable) {
          if (f.delete()) deleted += 1
        }
      }
      val left = Option(cd.listFiles()).getOrElse(Array.empty)
      if (left.forall(f => !f.getName.endsWith(".parquet")))
        { left.foreach(_.delete()); cd.delete() }
    }
    (1L until keepFrom).foreach { v =>
      val s = snapshot(v)
      deleteRecursively(
        new java.io.File(s"${logDir(root)}/${s.manifestDir}"))
      // a DV dir is written per commit, never shared across snapshots
      s.dvDir.foreach(d =>
        deleteRecursively(new java.io.File(s"${logDir(root)}/$d")))
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(logDir(root), s"snapshot-v$v.txt"))
    }
    // orphaned manifest dirs (written by a commit that never created
    // its snapshot file) — same age guard as orphan data
    val namedDirs = (1L to currentVersion).flatMap { v =>
      try {
        val s = snapshot(v)
        s.manifestDir +: s.dvDir.toSeq
      } catch { case _: java.nio.file.NoSuchFileException => Nil }
    }.toSet
    Option(new java.io.File(logDir(root)).listFiles())
      .getOrElse(Array.empty)
      .filter(d => d.isDirectory &&
        (d.getName.startsWith("manifest-v") ||
          d.getName.startsWith("dv-v")) &&
        !namedDirs.contains(d.getName) &&
        d.lastModified() < orphanCutoff)
      .foreach(deleteRecursively)
    deleted
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete()
    ()
  }

  /** Commit history, newest first: one row per snapshot still on
    * disk (vacuum removes records behind its horizon). */
  def history(): DataFrame = {
    import spark.implicits._
    (1L to currentVersion).flatMap { v =>
      try {
        val s = snapshot(v)
        Some((s.version, s.op, s.parent, s.nFiles, s.nRows))
      } catch { case _: java.nio.file.NoSuchFileException => None }
    }.toDF("version", "op", "parent", "n_files", "n_rows")
      .orderBy(col("version").desc)
  }

  // ---- writes --------------------------------------------------------

  /** Append `df` as a new snapshot; returns the committed version.
    * Data files are written ONCE; only the (cheap) manifest+commit
    * step retries under a concurrent-writer conflict. */
  def append(df: DataFrame, numFiles: Int = 4): Long = {
    val stats = writeData(df, numFiles)
    commitWithRetry("append", newSchema = Some(df.schema)) { parent =>
      if (parent == 0) stats
      else manifest(parent).unionByName(stats, allowMissingColumns = true)
    }
  }

  /** (candidate files the last COW audit actually read, live files at
    * that commit) — spec hooks pinning that the mutation-path audit is
    * stats-pruned (reads ≤ envelope-intersecting files), not O(table). */
  @volatile private[graft] var lastAuditScanned: Long = -1L
  @volatile private[graft] var lastAuditTotal: Long = -1L

  /** The shared COW survivor manifest for [[deleteWhere]] /
    * [[replaceWhere]]: files whose stats envelope can't intersect
    * `cond` carry forward by reference WITHOUT BEING READ (the audit
    * is stats-pruned through [[statsKeep]] — at 100 TB a windowed
    * delete reads only the window's files, not the table); candidate
    * files get one hit-count audit; all-hit files drop, mixed files
    * rewrite. DELETE semantics are Delta/Iceberg's: only rows where
    * `cond` IS TRUE go — a NULL-evaluating row is not a hit and is
    * kept by audit and rewrite alike (`coalesce(cond, false)` on both
    * sides, so the outcome never depends on file layout). */
  private def cowSurvivors(parent: Long, cond: Column,
      numFiles: Int): DataFrame = {
    import spark.implicits._
    val all = manifest(parent)
    val allPaths = all.select("path").as[String].collect()
    lastAuditTotal = allPaths.length.toLong
    if (allPaths.isEmpty) { lastAuditScanned = 0L; return all }
    val candidates = all.where(statsKeep(cond, parent))
      .select("path").as[String].collect()
    lastAuditScanned = candidates.length.toLong
    if (candidates.isEmpty) return all
    val hit = coalesce(cond, lit(false))
    // audit over the LIVE view: rows already in the parent's deletion
    // vector count neither as total nor as hits, so a file whose
    // remaining live rows all match still drops cleanly, and per-file
    // totals are live-row totals
    val audit = minusDv(withRowId(spark.read
        .parquet(candidates.map(p => s"$root/$p").toSeq: _*)), parent)
      .groupBy(col("_gt_path"))
      .agg(count(lit(1)).as("total"),
        count(when(hit, lit(1))).as("hits"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val touched = audit.filter(_._3 > 0)
    val mixed = touched.filter(a => a._3 < a._2).map(_._1)
    // hit files are the SMALL side: drop them from the manifest with a
    // broadcast anti-join, never a driver-built In-list over the table
    val kept =
      if (touched.isEmpty) all
      else all.join(broadcast(touched.map(_._1).toSeq.toDF("path")),
        Seq("path"), "left_anti")
    if (mixed.isEmpty) kept
    else {
      val raw = spark.read.parquet(mixed.map(p => s"$root/$p").toSeq: _*)
      val dataCols = raw.columns.toIndexedSeq
      val survivors = minusDv(withRowId(raw), parent).where(!hit)
        .select(dataCols.map(col): _*)
      kept.unionByName(writeData(survivors, numFiles),
        allowMissingColumns = true)
    }
  }

  /** Replace the ENTIRE table content with `df` in one atomic
    * snapshot (the TRUNCATE+INSERT a `SaveMode.Overwrite` through the
    * v2 connector maps to). Old files become unreferenced history —
    * still time-travelable until vacuum. */
  def overwrite(df: DataFrame, numFiles: Int = 4): Long = {
    val stats = writeData(df, numFiles)
    commitWithRetry("overwrite", newSchema = Some(df.schema))(_ => stats)
  }

  /** Copy-on-write delete of rows where `cond` IS TRUE: files with no
    * hits carry forward BY REFERENCE (stats-pruned — non-intersecting
    * files aren't even read), all-hit files drop from the manifest,
    * mixed files rewrite. One audit aggregate + one rewrite of only
    * the mixed files; NULL-evaluating rows are kept (see
    * [[cowSurvivors]]). */
  def deleteWhere(cond: Column, numFiles: Int = 4): Long =
    commitWithRetry("delete")(parent => cowSurvivors(parent, cond, numFiles))

  /** MERGE-ON-READ delete (deletion vectors): rows where `cond` IS
    * TRUE are recorded as (file, row-ordinal) pairs in the snapshot's
    * DELETION VECTOR — NO data file is rewritten. The write cost is
    * O(matched rows), not O(touched files): at 100 TB, deleting 0.1%
    * of rows via [[deleteWhere]] rewrites every mixed file (terabytes
    * of IO for gigabytes of change); this commits kilobytes. Reads
    * anti-join the DV (file-local row ids, usually broadcast); all
    * reads and later mutations see the live view, and [[compact]] /
    * any full rewrite materializes deletions away (the DV follows the
    * manifest: entries whose file leaves the manifest are dropped at
    * commit). Same NULL semantics as [[deleteWhere]]; the audit is
    * stats-pruned the same way. Trade-off is the published formats'
    * (Delta deletion vectors, Iceberg v2 position deletes): cheap
    * writes now, a small per-read filter until the next compaction. */
  def deleteWhereMor(cond: Column): Long = {
    import spark.implicits._
    commitWithRetry("delete_mor", extraDv = Some { parent =>
      val all = manifest(parent)
      val allPaths = all.select("path").as[String].collect()
      lastAuditTotal = allPaths.length.toLong
      if (allPaths.isEmpty) { lastAuditScanned = 0L; emptyDv }
      else {
        val candidates = all.where(statsKeep(cond, parent))
          .select("path").as[String].collect()
        lastAuditScanned = candidates.length.toLong
        if (candidates.isEmpty) emptyDv
        else minusDv(withRowId(spark.read
            .parquet(candidates.map(p => s"$root/$p").toSeq: _*)), parent)
          .where(coalesce(cond, lit(false)))
          .select(col("_gt_path").as("path"), col("_gt_pos").as("pos"))
      }
    })(parent => manifest(parent))
  }

  /** METADATA-ONLY aggregates: COUNT(*) and per-stats-column MIN/MAX
    * answered from the manifest alone — zero data files opened (row
    * counts sum, envelopes fold), the Iceberg/Delta trick that makes
    * `SELECT count(*)` on a petabyte table a manifest scan. Exact
    * because commits record exact per-file counts and typed min/max.
    * Returns one row: n_rows, then min_<c>/max_<c> per stats col. */
  def metadataAggregates(version: Long = currentVersion): DataFrame = {
    // DV entries name distinct live physical rows (the MOR audit reads
    // the already-filtered view), so count = physical − n_dels stays
    // exact. MIN/MAX envelopes can be STALE under a DV (a deleted
    // extreme lingers) — still valid for pruning (superset), but
    // exactness-requiring callers (connector agg pushdown) must check
    // [[hasDeletionVectors]] and decline.
    val dels = if (version == 0) 0L else snapshot(version).nDels
    val aggs = (coalesce(sum(col("row_count")), lit(0L)) - lit(dels))
      .as("n_rows") +:
      statsCols.flatMap(c => Seq(
        min(col(s"min_$c")).as(s"min_$c"),
        max(col(s"max_$c")).as(s"max_$c")))
    manifest(version).agg(aggs.head, aggs.tail: _*)
  }

  /** Atomic REPLACE-WHERE (Delta's `replaceWhere`): delete every row
    * matching `cond` and insert `df`, as ONE snapshot — the
    * incremental-load primitive (rebuild a window in place, readers
    * never see the gap between delete and insert). File-granular like
    * [[deleteWhere]]: no-hit files carry forward by reference. */
  def replaceWhere(cond: Column, df: DataFrame,
      numFiles: Int = 4): Long = {
    val replacement = writeData(df, numFiles)
    commitWithRetry("replace", newSchema = Some(df.schema)) { parent =>
      cowSurvivors(parent, cond, numFiles)
        .unionByName(replacement, allowMissingColumns = true)
    }
  }

  /** EXACTLY-ONCE streaming append: `foreachBatch` is at-least-once
    * under retries, so each micro-batch commits its id into the
    * snapshot's applied-batch ledger IN the same atomic put-if-absent
    * as the data — a replayed batch is skipped, a commit-race loser
    * re-checks the ledger after rebasing. q204's recipe, generalized
    * from one view to the table format itself. */
  def appendIfAbsent(df: DataFrame, batchId: Long,
      numFiles: Int = 4): Long = {
    if (appliedBatches.contains(batchId)) return currentVersion
    val stats = writeData(df, numFiles)
    commitWithRetry("append", batchLedger = Some(batchId),
        newSchema = Some(df.schema)) { parent =>
      if (parent == 0) stats
      else manifest(parent).unionByName(stats, allowMissingColumns = true)
    }
  }

  /** MERGE (upsert) on `keyCols`, whole-row-replace semantics,
    * file-granular copy-on-write: files holding ≥1 matched key are
    * rewritten with their matched rows replaced by the update rows;
    * untouched files carry forward by reference; update keys present
    * nowhere become inserts. One key-probe audit + one rewrite of
    * only the touched files — the updates never fan out over the
    * table, and at scale the probe join broadcasts when the update
    * set is small (Catalyst's size-based choice). */
  def merge(updates: DataFrame, keyCols: Seq[String],
      numFiles: Int = 4): Long = {
    import spark.implicits._
    val keyed = updates.select(keyCols.map(col): _*).distinct()
    // Envelope of the update keys on stats-carrying key columns — ONE
    // small aggregate over the update side, then the key probe reads
    // only manifest files whose [min,max] intersects it. A range-local
    // merge (the incremental-upsert shape) therefore probes O(touched
    // window) files, never O(table). NULL update keys never join
    // (three-valued equality), so null-ignoring min/max stay sound.
    val statKeys = keyCols.filter(statsCols.contains)
    val keyBounds: Map[String, (Any, Any)] =
      if (statKeys.isEmpty) Map.empty
      else {
        val aggs = statKeys.flatMap(k =>
          Seq(min(col(k)).as(s"lo_$k"), max(col(k)).as(s"hi_$k")))
        val r = keyed.agg(aggs.head, aggs.tail: _*).head()
        statKeys.zipWithIndex.map { case (k, i) =>
          k -> ((r.get(2 * i), r.get(2 * i + 1)))
        }.toMap
      }
    commitWithRetry("merge", newSchema = Some(updates.schema)) { parent =>
      val all = manifest(parent)
      lastAuditTotal = all.count()
      val candPred = statKeys.map { k =>
        val (lo, hi) = keyBounds(k)
        // all-NULL update keys ⇒ nothing can match ⇒ prune every file
        if (lo == null) lit(false)
        else col(s"min_$k") <= lit(hi) && col(s"max_$k") >= lit(lo)
      }.reduceOption(_ && _).getOrElse(lit(true))
      val candidates = all.where(candPred)
        .select("path").as[String].collect()
      lastAuditScanned = candidates.length.toLong
      if (candidates.isEmpty) {
        // no live file can hold a matched key: pure insert
        all.unionByName(writeData(updates, numFiles),
          allowMissingColumns = true)
      } else {
        // `_gt_path` rides the scan project (the `_metadata` column is
        // join-safe, unlike input_file_name()); the probe sees only
        // LIVE rows — a row in the parent's deletion vector can't pin
        // its file into the rewrite set or resurrect through it
        val current = minusDv(withRowId(spark.read
          .parquet(candidates.map(p => s"$root/$p").toSeq: _*)), parent)
        val hits = current
          .join(keyed, keyCols, "left_semi")
          .groupBy(col("_gt_path"))
          .agg(count(lit(1)).as("hits"))
          .collect().map(_.getString(0)).toSet
        val untouched =
          if (hits.isEmpty) all
          else all.join(broadcast(hits.toSeq.toDF("path")),
            Seq("path"), "left_anti")
        val touchedPaths = hits.toSeq.map(rel => s"$root/$rel")
        val survivors =
          if (touchedPaths.isEmpty) updates
          else {
            val raw = spark.read.parquet(touchedPaths: _*)
            val dataCols = raw.columns.toIndexedSeq
            minusDv(withRowId(raw), parent)
              .select(dataCols.map(col): _*)
              .join(keyed, keyCols, "left_anti")
              .unionByName(updates)
          }
        untouched.unionByName(writeData(survivors, numFiles),
          allowMissingColumns = true)
      }
    }
  }

  /** MERGE-ON-READ upsert: whole-row-replace MERGE semantics
    * ([[merge]]'s contract) with ZERO file rewrites — matched live
    * rows enter the DELETION VECTOR, and the update set lands as
    * fresh appended files, in ONE atomic snapshot. Write cost is
    * O(update set + matched ordinals) regardless of how many
    * terabyte-sized files hold matched keys; COW [[merge]] rewrites
    * each of them for even one matched row. The probe is envelope-
    * pruned exactly like [[merge]]'s (a range-local upsert probes
    * O(window) files) and sees only live rows, so re-merging a key
    * twice deletes the first update's row via its new file's own
    * ordinal. Reads pay the DV anti-join until [[compact]]. */
  def mergeMor(updates: DataFrame, keyCols: Seq[String]): Long = {
    import spark.implicits._
    val keyed = updates.select(keyCols.map(col): _*).distinct()
    val statKeys = keyCols.filter(statsCols.contains)
    val keyBounds: Map[String, (Any, Any)] =
      if (statKeys.isEmpty) Map.empty
      else {
        val aggs = statKeys.flatMap(k =>
          Seq(min(col(k)).as(s"lo_$k"), max(col(k)).as(s"hi_$k")))
        val r = keyed.agg(aggs.head, aggs.tail: _*).head()
        statKeys.zipWithIndex.map { case (k, i) =>
          k -> ((r.get(2 * i), r.get(2 * i + 1)))
        }.toMap
      }
    val newFiles = writeData(updates, numFiles = 4)
    commitWithRetry("merge_mor", newSchema = Some(updates.schema),
      extraDv = Some { parent =>
        val all = manifest(parent)
        lastAuditTotal = all.count()
        val candPred = statKeys.map { k =>
          val (lo, hi) = keyBounds(k)
          if (lo == null) lit(false)
          else col(s"min_$k") <= lit(hi) && col(s"max_$k") >= lit(lo)
        }.reduceOption(_ && _).getOrElse(lit(true))
        val candidates = all.where(candPred)
          .select("path").as[String].collect()
        lastAuditScanned = candidates.length.toLong
        if (candidates.isEmpty) emptyDv
        else minusDv(withRowId(spark.read
            .parquet(candidates.map(p => s"$root/$p").toSeq: _*)), parent)
          .join(keyed, keyCols, "left_semi")
          .select(col("_gt_path").as("path"), col("_gt_pos").as("pos"))
      }) { parent =>
      manifest(parent).unionByName(newFiles, allowMissingColumns = true)
    }
  }

  /** Atomic REPLACE-FILES commit for the connector's row-level
    * operations (SQL MERGE/UPDATE/DELETE → `ReplaceData`): drop
    * `removed` (root-relative paths — the files the row-level scan
    * planned) from the parent manifest and add `newEntries` (the
    * executor writers' stats-carrying manifest rows), as ONE
    * snapshot. Write-serializable: if the table advanced past
    * `expectedParent` between scan and commit, fail loudly — the
    * replacement was computed against a version that no longer
    * exists, and rebasing it could silently drop a concurrent
    * writer's rows. */
  private[graft] def commitReplaceFiles(op: String,
      removed: Seq[String], newEntries: DataFrame,
      expectedParent: Long,
      newSchema: Option[org.apache.spark.sql.types.StructType] = None)
      : Long =
    commitWithRetry(op, newSchema = newSchema) { parent =>
      if (parent != expectedParent)
        throw new ConcurrentCommitException(
          s"row-level $op on $root planned against v$expectedParent " +
            s"but the table is now at v$parent; re-run the statement")
      import spark.implicits._
      if (parent == 0) newEntries
      else {
        val all = manifest(parent)
        val kept =
          if (removed.isEmpty) all
          else all.join(broadcast(removed.toDF("path")),
            Seq("path"), "left_anti")
        kept.unionByName(newEntries, allowMissingColumns = true)
      }
    }

  /** Atomic POSITION-DELTA commit for the connector's MOR row-level
    * operations (`SupportsDelta` → `WriteDelta`): `deletes` (file,
    * ordinal) pairs join the deletion vector, `newEntries` (executor
    * writers' stats-carrying manifest rows — None for a pure DELETE)
    * append to the parent manifest, one snapshot, zero rewrites.
    * Write-serializable like [[commitReplaceFiles]]: a concurrent
    * advance past `expectedParent` fails loudly — the matched row
    * ordinals were computed against a version that no longer exists. */
  private[graft] def commitDeltaRows(op: String, deletes: DataFrame,
      newEntries: Option[DataFrame], expectedParent: Long,
      newSchema: Option[org.apache.spark.sql.types.StructType]): Long =
    commitWithRetry(op, newSchema = newSchema,
        extraDv = Some(_ => deletes)) { parent =>
      if (parent != expectedParent)
        throw new ConcurrentCommitException(
          s"row-level $op on $root planned against v$expectedParent " +
            s"but the table is now at v$parent; re-run the statement")
      (parent, newEntries) match {
        case (0, Some(e)) => e
        case (0, None) => sys.error(s"$op on an empty table")
        case (_, Some(e)) =>
          manifest(parent).unionByName(e, allowMissingColumns = true)
        case (_, None) => manifest(parent)
      }
    }

  /** Atomic APPEND-FILES commit for writers that produced their own
    * manifest entries (the connector's streaming sink — executor
    * writers carry per-file stats in their commit messages, so no
    * re-read is needed). `batchId` rides the applied-batch ledger:
    * a replayed epoch is recognized and skipped, exactly-once. */
  private[graft] def commitAppendFiles(newEntries: DataFrame,
      batchId: Option[Long],
      newSchema: Option[org.apache.spark.sql.types.StructType]): Long =
    commitWithRetry("append", batchLedger = batchId,
        newSchema = newSchema) { parent =>
      if (parent == 0) newEntries
      else manifest(parent).unionByName(newEntries,
        allowMissingColumns = true)
    }

  /** ALTER TABLE ADD COLUMN: one content-preserving snapshot whose
    * recorded schema unions the new columns — no data file moves, and
    * every pre-existing file surfaces the new columns as null (the
    * schema-evolution contract reads already honor). */
  def addColumns(cols: org.apache.spark.sql.types.StructType): Long =
    commitWithRetry("alter", newSchema = Some(cols)) { parent =>
      if (parent == 0) sys.error(
        "addColumns on an empty table: declare the schema at CREATE")
      else manifest(parent)
    }

  /** RESTORE — re-point the table at snapshot `version`'s exact
    * content (Delta's `RESTORE TABLE`): manifest, deletion vector,
    * and recorded schema all revert AS OF `version`, committed as one
    * NEW snapshot. METADATA-ONLY: no data file is written, moved, or
    * deleted — files come back by reference, so a bad write, delete,
    * or merge is undone in O(manifest) regardless of table size, and
    * the mis-step itself stays in history (a mis-restore is
    * restorable). Versions after `version` remain time-travelable
    * until vacuum expires them; restoring to a vacuumed snapshot
    * fails explicitly. The applied-batch ledger is NOT reverted: a
    * streaming epoch that committed after `version` must not re-apply
    * on replay (exactly-once survives the rollback). */
  def restore(version: Long): Long = {
    val cur = currentVersion
    require(version >= 1 && version <= cur,
      s"restore: version $version outside committed range 1..$cur")
    require(new java.io.File(
        s"${logDir(root)}/snapshot-v$version.txt").isFile,
      s"restore: snapshot v$version has been vacuumed")
    val dvAt: Option[Long => DataFrame] =
      if (hasDeletionVectors(version)) Some(_ => deletionVectors(version))
      else None
    commitWithRetry("restore", newSchema = recordedSchema(version),
      extraDv = dvAt, dvReplace = true)(_ => manifest(version))
  }

  /** Rewrite the live file set into `numFiles` bin-packed files
    * (OPTIMIZE/compaction): content-identical snapshot, new layout.
    * `clusterBy` — range-cluster + sort the rewrite on the given
    * columns instead of hash-packing: a compaction that ignored the
    * table's cluster key would OVERLAP every file's stats envelope
    * and silently kill zone-map pruning/SPJ until the next full
    * rewrite (hash repartition spreads each key range across every
    * file). A clustered table compacts with its own key. */
  def compact(numFiles: Int = 1, clusterBy: Seq[String] = Nil): Long =
    commitWithRetry("compact") { parent =>
      if (clusterBy.isEmpty) writeData(read(parent), numFiles)
      else {
        val cs = clusterBy.map(col)
        writeData(read(parent)
          .repartitionByRange(math.max(numFiles, 1), cs: _*)
          .sortWithinPartitions(cs: _*), numFiles = 0)
      }
    }

  /** INCREMENTAL compaction: rewrite only live files holding fewer
    * than `maxRows` rows — the small-file tail streaming sinks and
    * frequent small appends accrete — carrying every other file
    * forward BY REFERENCE. At 100 TB a full [[compact]] is a
    * non-starter: maintenance must be proportional to the small-file
    * DEBT, not the table. Deletion-vector entries on rewritten files
    * materialize away (the rewrite reads the live view and their
    * paths leave the manifest); entries on carried files survive
    * untouched. No-op (no new snapshot) when nothing qualifies.
    * `clusterBy` range-clusters the rewrite like [[compact]]. */
  def compactSmall(maxRows: Long, numFiles: Int = 1,
      clusterBy: Seq[String] = Nil): Long = {
    val parent0 = currentVersion
    if (parent0 == 0) return 0L
    if (manifest(parent0).where(col("row_count") < maxRows).limit(1)
        .count() == 0) return parent0
    commitWithRetry("compact_small") { parent =>
      val m = manifest(parent)
      val small = m.where(col("row_count") < maxRows)
      val paths = small.select("path").collect().map(_.getString(0))
      val big = m.where(col("row_count") >= maxRows)
      if (paths.isEmpty) big // raced: the debt was compacted away
      else {
        val raw = spark.read.option("mergeSchema", "true")
          .parquet(paths.toIndexedSeq.map(p => s"$root/$p"): _*)
        val dataCols = raw.columns.toIndexedSeq
        val live = minusDv(withRowId(raw), parent)
          .select(dataCols.map(col): _*)
        val staged =
          if (clusterBy.isEmpty) live
          else live
            .repartitionByRange(math.max(numFiles, 1),
              clusterBy.map(col): _*)
            .sortWithinPartitions(clusterBy.map(col): _*)
        big.unionByName(
          writeData(staged, if (clusterBy.isEmpty) numFiles else 0),
          allowMissingColumns = true)
      }
    }
  }

  /** OPTIMIZE ZORDER: rewrite the live file set clustered on the
    * z-curve of two stats columns — content-identical snapshot whose
    * per-file envelopes become compact rectangles in BOTH dimensions,
    * so [[prunedRead]]/[[prunedWhere]] skip on either column from now
    * on. The retro-clustering half of q211 (which z-orders at write
    * time): a table that accreted under append order gets its zone
    * maps sharpened in one commit. */
  def optimizeZorder(colX: String, colY: String,
      numFiles: Int = 8): Long =
    optimizeZorder(Seq(colX, colY), numFiles)

  /** N-dimensional OPTIMIZE ZORDER (2 dims at 16 bits each, 3 at 16,
    * 4 at 15 — the interleave must fit a long): one commit whose files
    * are compact hyper-rectangles in every listed dimension, so zone
    * maps skip on ANY of them. */
  def optimizeZorder(cols: Seq[String], numFiles: Int): Long = {
    require(cols.forall(statsCols.contains),
      s"z-order columns must carry stats: $statsCols")
    commitWithRetry("zorder") { parent =>
      val staged = graft.etl.ZOrder.zValueN(read(parent), cols)
        .repartitionByRange(numFiles, col("_z"))
        .sortWithinPartitions(col("_z"))
        .drop("_z")
      writeData(staged, numFiles = 0)
    }
  }

  /** Write `df` into a fresh immutable commit dir and return its
    * manifest entries — ONE aggregate job collects per-file row counts
    * and typed min/max for every stats column. `numFiles = 0` keeps
    * the caller's partitioning — THE knob for zone-map locality:
    * `repartitionByRange(n, key)` upstream gives files disjoint
    * [min,max] envelopes on the prune key, which is what makes
    * [[prunedRead]] skip (a hash repartition spreads every key range
    * across every file and zone maps skip nothing). */
  private def writeData(df: DataFrame, numFiles: Int): DataFrame = {
    val commitDir = s"data/c${java.util.UUID.randomUUID.toString.take(8)}"
    val staged = if (numFiles > 0) df.repartition(numFiles) else df
    staged.write.parquet(s"$root/$commitDir")
    val written = spark.read.parquet(s"$root/$commitDir")
    // bloom indexes ride the same single aggregate as min/max; a
    // bloom column the incoming frame doesn't carry (schema
    // evolution) records null = "might contain anything"
    val present = written.columns.toSet
    val aggs = (count(lit(1)).as("row_count") +:
      statsCols.flatMap(c => Seq(
        min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))) ++
      bloomCols.map(c =>
        (if (present(c))
          graft.functions.BloomFilterIndex.buildAgg(col(c), bloomBits)
        else first(lit(null).cast("array<bigint>"))).as(s"bloom_$c"))
    written.groupBy(input_file_name().as("path"))
      .agg(aggs.head, aggs.tail: _*)
      // URI → root-relative path, as a codegen'd builtin (no UDF)
      .withColumn("path",
        regexp_extract(col("path"), "(data/c[^/]+/[^/]+)$", 1))
  }

  /** The single commit point: build the new manifest off the CURRENT
    * parent, write it, then atomically create `snapshot-v<N>.txt` —
    * put-if-absent. A loser rebuilds against the winner's version and
    * tries N+1; its already-written data files are reused as-is. */
  /** Test hook: invoked after data + manifest are written, immediately
    * before the atomic snapshot create — lets GraftTableSpec inject a
    * writer crash mid-commit and prove readers/vacuum behavior. */
  @volatile private[graft] var beforeSnapshotCreate: () => Unit = () => ()

  private def commitWithRetry(op: String,
      batchLedger: Option[Long] = None,
      newSchema: Option[org.apache.spark.sql.types.StructType] = None,
      extraDv: Option[Long => DataFrame] = None,
      dvReplace: Boolean = false)
      (buildManifest: Long => DataFrame): Long = {
    var attempts = 0
    while (attempts < MaxCommitAttempts) {
      attempts += 1
      val parent = currentVersion
      val next = parent + 1
      val parentApplied =
        if (parent == 0) Set.empty[Long] else snapshot(parent).applied
      // a rebasing loser re-checks the ledger: the winner may have
      // been a retry of the very batch this commit carries
      if (batchLedger.exists(parentApplied.contains)) return parent
      val applied = parentApplied ++ batchLedger
      val m0 = buildManifest(parent)
      // writers that can't compute blooms (executor-side manifest
      // entries from the SQL row-level / streaming paths) null-fill:
      // a null bloom keeps its file at planning time, never mis-prunes
      val m1 = bloomCols.foldLeft(m0) { (d, c) =>
        if (d.columns.contains(s"bloom_$c")) d
        else d.withColumn(s"bloom_$c", lit(null).cast("array<bigint>"))
      }
      // keep bloom columns the parent manifest already carries even if
      // THIS writer didn't declare them — an index must survive being
      // mutated through an instance that doesn't know about it
      val bloomKept = (bloomCols.map(c => s"bloom_$c") ++
        m1.columns.filter(_.startsWith("bloom_"))).distinct
      val m = m1
        .select(("path" +: "row_count" +:
          (statsCols.flatMap(c => Seq(s"min_$c", s"max_$c")) ++
            bloomKept))
          .map(col): _*)
      val manifestDir =
        s"manifest-v${next}_${java.util.UUID.randomUUID.toString.take(8)}"
      m.write.parquet(s"${logDir(root)}/$manifestDir")
      val (nFiles, nRows) = {
        val t = spark.read.parquet(s"${logDir(root)}/$manifestDir")
          .agg(count(lit(1)), coalesce(sum(col("row_count")), lit(0L)))
          .head()
        (t.getLong(0), t.getLong(1))
      }
      // schema evolution at the LOG level: append-like ops union new
      // columns onto the parent's recorded schema, overwrite replaces
      // it, content-preserving ops inherit it (StructType.json is one
      // line, so the k=v record format holds)
      val parentSchemaJson =
        if (parent == 0) None else snapshot(parent).schemaJson
      val schemaJson: Option[String] =
        // overwrite REPLACES the recorded schema; restore replaces it
        // with the restored version's (reverting later ADD COLUMNs)
        if (op == "overwrite" || op == "restore")
          newSchema.map(_.json).orElse(parentSchemaJson)
        else (parentSchemaJson, newSchema) match {
          case (Some(pj), Some(ns)) =>
            val ps = org.apache.spark.sql.types.DataType.fromJson(pj)
              .asInstanceOf[org.apache.spark.sql.types.StructType]
            // honor spark.sql.caseSensitive: under the (default)
            // case-insensitive resolution, appending column "X" onto a
            // table recorded with "x" must NOT store both fields — a
            // duplicate pair would make every connector read ambiguous
            // (ADVICE r9)
            def key(n: String): String =
              if (spark.sessionState.conf.caseSensitiveAnalysis) n
              else n.toLowerCase(java.util.Locale.ROOT)
            val names = ps.fieldNames.map(key).toSet
            Some(org.apache.spark.sql.types.StructType(
              ps.fields ++ ns.fields.filterNot(f => names(key(f.name)))).json)
          case (None, Some(ns)) => Some(ns.json)
          case (pj, None) => pj
        }
      // DELETION VECTORS follow the manifest with no per-op wiring:
      // the parent's DV restricted to paths still in the new manifest
      // (a rewritten or dropped file sheds its entries because its
      // path leaves the manifest — compact/overwrite therefore clear
      // the DV), plus this op's new deletions. Zero cost for DV-free
      // tables; DV-carrying commits pay one small join+write.
      // `dvReplace` (restore): the committed DV is EXACTLY `extraDv`,
      // not parent ∪ extraDv — deletions that postdate the restored
      // version must not survive the rollback
      val parentDvDir: Option[String] =
        if (parent == 0 || dvReplace) None else snapshot(parent).dvDir
      val dvLines: Seq[String] =
        if (parentDvDir.isEmpty && extraDv.isEmpty) Nil
        else {
          val pieces =
            parentDvDir.map(d =>
              spark.read.parquet(s"${logDir(root)}/$d")).toSeq ++
            extraDv.map(_(parent)).toSeq
          val mPaths = spark.read
            .parquet(s"${logDir(root)}/$manifestDir").select("path")
          val comb = pieces.reduce(_ unionByName _).distinct()
            .join(mPaths, Seq("path"), "left_semi")
            .repartition(1).sortWithinPartitions("path", "pos")
            .cache()
          val nDels = comb.count()
          val out =
            if (nDels == 0) Nil
            else {
              val dvDir = s"dv-v${next}_" +
                java.util.UUID.randomUUID.toString.take(8)
              comb.write.parquet(s"${logDir(root)}/$dvDir")
              Seq(s"dv=$dvDir", s"n_dels=$nDels")
            }
          comb.unpersist()
          out
        }
      val content = (Seq(s"op=$op", s"parent=$parent",
        s"manifest=$manifestDir", s"n_files=$nFiles", s"n_rows=$nRows",
        s"applied=${applied.toSeq.sorted.mkString(",")}") ++
        dvLines ++
        schemaJson.map(j => s"schema=$j"))
        .mkString("", "\n", "\n")
      beforeSnapshotCreate()
      try {
        val p = java.nio.file.Paths
          .get(logDir(root), s"snapshot-v$next.txt")
        java.nio.file.Files.write(p, content.getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.CREATE_NEW)
        return next
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => () // rebase
      }
    }
    throw new ConcurrentCommitException(
      s"lost $MaxCommitAttempts commit races on $root")
  }
}

object GraftTable {

  val MaxCommitAttempts = 10

  /** Orphan (never-committed) files younger than this survive vacuum:
    * they may belong to an in-flight concurrent writer whose atomic
    * snapshot create hasn't happened yet. 7 DAYS (Delta's retention
    * default) — a writer whose distributed data write takes hours
    * must never have its not-yet-referenced files collected out from
    * under its commit (ADVICE r9: 15 min could race a long write →
    * silent corruption). Crash recovery passes `minOrphanAgeMs = 0`. */
  val DefaultOrphanRetentionMs: Long = 7L * 24 * 3600 * 1000

  /** READ-ONLY existence/version probe — creates NOTHING on disk.
    * `openOrCreate` materializes `<root>/_log`, so using it from
    * `tableExists` / `loadTable` / `resolve` turned every probe of a
    * wrong path into a phantom namespace (ADVICE r9). All read-side
    * catalog/connector paths go through here. */
  def versionAt(root: String): Long = {
    val files = new java.io.File(logDir(root)).listFiles()
    if (files == null) 0L
    else files.iterator.map(_.getName).collect {
      case SnapshotName(v) => v.toLong
    }.foldLeft(0L)(math.max)
  }

  final class ConcurrentCommitException(msg: String)
    extends RuntimeException(msg)

  private case class Snapshot(version: Long, op: String, parent: Long,
    manifestDir: String, nFiles: Long, nRows: Long,
    applied: Set[Long] = Set.empty,
    schemaJson: Option[String] = None,
    dvDir: Option[String] = None, nDels: Long = 0L)

  private val SnapshotName = "snapshot-v(\\d+)\\.txt".r

  private def logDir(root: String) = s"$root/_log"

  /** Create a new table at `root` with `df` as snapshot v1. Fails if
    * the root already holds commits — silently appending onto an
    * existing table masked half-built scratch reuse (ADVICE r8). */
  def create(spark: SparkSession, root: String, df: DataFrame,
      statsCols: Seq[String], numFiles: Int = 4,
      bloomCols: Seq[String] = Nil,
      bloomBits: Int = graft.functions.BloomFilterIndex.DefaultBits)
      : GraftTable = {
    java.nio.file.Files
      .createDirectories(java.nio.file.Paths.get(logDir(root)))
    val t = new GraftTable(spark, root, statsCols, bloomCols, bloomBits)
    if (t.currentVersion != 0)
      throw new IllegalStateException(
        s"GraftTable.create: $root already has commits " +
          s"(v${t.currentVersion}); use forPath/openOrCreate")
    t.append(df, numFiles)
    t
  }

  /** Open a table that may not have its first commit yet (streaming
    * sinks start empty); declares the stats columns for writes. */
  def openOrCreate(spark: SparkSession, root: String,
      statsCols: Seq[String], bloomCols: Seq[String] = Nil,
      bloomBits: Int = graft.functions.BloomFilterIndex.DefaultBits)
      : GraftTable = {
    java.nio.file.Files
      .createDirectories(java.nio.file.Paths.get(logDir(root)))
    new GraftTable(spark, root, statsCols, bloomCols, bloomBits)
  }

  /** Open an existing table (stats + bloom columns read off the
    * manifest — `min_*`/`bloom_*` column presence IS the index
    * declaration, so any opener keeps maintaining it; bloom width is
    * read from the first indexed file so appends stay probe-
    * compatible). Version-0 safe: a created-but-never-written table
    * opens with no stats columns instead of failing on the missing
    * snapshot file (ADVICE r9: SELECT from a CREATE-TABLE-only table
    * must return zero rows, not crash). */
  def forPath(spark: SparkSession, root: String): GraftTable = {
    val probe = new GraftTable(spark, root, Nil)
    if (probe.currentVersion == 0)
      return new GraftTable(spark, root, Nil)
    val m = probe.manifest()
    val cols = m.columns.toSeq
      .filter(_.startsWith("min_")).map(_.stripPrefix("min_"))
    val blooms = m.columns.toSeq
      .filter(_.startsWith("bloom_")).map(_.stripPrefix("bloom_"))
    // -1 = detect the recorded width lazily, first write only
    new GraftTable(spark, root, cols, blooms,
      if (blooms.isEmpty) graft.functions.BloomFilterIndex.DefaultBits
      else -1)
  }
}
