package graft.format

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

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

  /** Commit wall-clock of `v` (recorded since r14); None on older
    * records. Throws NoSuchFileException for a vacuumed snapshot. */
  private[graft] def commitTsMillis(v: Long): Option[Long] =
    snapshot(v).tsMillis

  /** The manifest dir a FOLD at commit `v` wrote, if any. */
  private[graft] def foldDirAt(v: Long): Option[String] =
    snapshot(v).foldDir

  private def snapshot(v: Long): Snapshot =
    GraftTable.snapCached(root, v) {
      val lines = new String(
        logStore.read(s"${logDir(root)}/snapshot-v$v.txt"), "UTF-8")
        .split("\n").map(_.trim).filter(_.nonEmpty)
      val kv = lines.map { l =>
        val i = l.indexOf('='); (l.take(i), l.drop(i + 1))
      }.toMap
      // PROTOCOL GATE (VERDICT r12 #8): snapshots carry the minimum
      // reader protocol they need; an older library opening a newer
      // table must fail with "upgrade", never misread kv pairs it
      // does not understand (column mapping, DV lists, commit kinds —
      // each would silently corrupt a read if ignored). Legacy
      // records default to 1.
      val minReader =
        kv.get("min_reader_version").map(_.toInt).getOrElse(1)
      if (minReader > GraftTable.ReaderVersion)
        throw new IllegalStateException(
          s"gtable $root v$v requires reader protocol $minReader; " +
            s"this library supports ${GraftTable.ReaderVersion} — " +
            "upgrade the graft library to read this table")
      // MANIFEST LIST (Iceberg's model): `manifests=dir:entries:rows,…`
      // names SEVERAL disjoint manifest dirs whose union is the live
      // file set — an append commits only its own delta dir. Legacy
      // single-dir records (`manifest=dir`) read as a one-element list
      // with unknown counts (resolved lazily if ever needed).
      val dirs: Seq[ManifestRef] =
        kv.get("manifests").filter(_.nonEmpty).map(_.split(",").toSeq
          .map { s =>
            val p = s.split(":")
            // optional 4th field (round 14): the dir's exact
            // StatsTrunc state — records that predate it parse as
            // UNKNOWN and keep the conservative snapshot-level
            // inheritance
            ManifestRef(p(0), p(1).toLong, p(2).toLong,
              trunc = p.length > 3 && p(3) == "1",
              truncKnown = p.length > 3)
          })
        .orElse(kv.get("manifest").filter(_.nonEmpty)
          .map(d => Seq(ManifestRef(d, -1L, -1L))))
        .getOrElse(Nil)
      // DELETION VECTORS are a LIST of delta dirs too (`dvs=dir:rows,
      // …`): a MOR commit writes only ITS deletes and carries the
      // parent's dirs by reference — entries whose data file has left
      // the manifest are harmless (the read-side anti-join never
      // matches them) and are pruned/folded at commit. Legacy `dv=dir`
      // reads as a one-element list.
      val dvs: Seq[DvRef] =
        kv.get("dvs").filter(_.nonEmpty).map(_.split(",").toSeq
          .map { s =>
            val p = s.split(":"); DvRef(p(0), p(1).toLong)
          })
        .orElse(kv.get("dv").filter(_.nonEmpty)
          .map(d => Seq(DvRef(d, -1L))))
        .getOrElse(Nil)
      Snapshot(v, kv("op"), kv("parent").toLong, dirs,
        kv("n_files").toLong, kv("n_rows").toLong,
        kv.get("applied").filter(_.nonEmpty)
          .map(_.split(",").map(_.toLong).toSet).getOrElse(Set.empty),
        kv.get("schema").filter(_.nonEmpty),
        dvs,
        kv.get("n_dels").map(_.toLong).getOrElse(0L),
        kv.get("evolved").contains("1"),
        kv.get("dead_cols").filter(_.nonEmpty)
          .map(_.split(",").toSet).getOrElse(Set.empty),
        // commit kind for the change feed: new commits record both
        // flags exactly; legacy records classify by op name (rewrite
        // conservatively — refusal is safe, a missed rewrite is not)
        dataChange = kv.get("data_change").map(_ == "1")
          .getOrElse(!NonDataChangeOps(kv("op"))),
        rewrite = kv.get("rewrite").map(_ == "1")
          .getOrElse(LegacyRewriteOps(kv("op"))),
        mergeKeys = kv.get("merge_keys").filter(_.nonEmpty)
          .map(_.split(",").toSeq).getOrElse(Nil),
        statsTruncated = kv.get("stats_truncated").contains("1"),
        addedEntries = kv.get("added_entries").map(_.toLong),
        addedBytes = kv.get("added_bytes").map(_.toLong),
        foldDir = kv.get("fold_dir").filter(_.nonEmpty),
        tsMillis = kv.get("ts").map(_.toLong))
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
    * per stats column) — the union of the snapshot's manifest LIST
    * (dirs hold disjoint path sets; a dir written before a bloom/
    * schema change null-fills the newer columns, which reads treat as
    * "might contain anything"). */
  def manifest(version: Long = currentVersion): DataFrame = {
    val refs = snapshot(version).manifestDirs
    if (refs.isEmpty) return spark.emptyDataFrame
    // Every dir's rows still in the driver-local manifest-rows cache
    // under ONE schema (the commit-heavy same-process case: each dir
    // was written by this process's micro-commits or folds): ONE
    // LocalRelation, ZERO jobs. Without this, every state-table read
    // paid one parquet-read-plus-schema-inference PER manifest dir —
    // O(list length) jobs per read, which the r15 curation-at-history
    // bench exposed as the leading per-batch term (a sawtooth rising
    // ~0.3 s per accumulated dir until each fold reset the list).
    // Cross-process dirs miss the cache and take the union below.
    val cached = refs.map(r => GraftTable.manifestRows(root, r.dir))
    if (cached.forall(_.isDefined) &&
        cached.flatMap(_.map(_._1)).distinct.size == 1) {
      val schema = cached.head.get._1
      val attrs = schema.map(f =>
        org.apache.spark.sql.catalyst.expressions.AttributeReference(
          f.name, f.dataType, f.nullable)())
      return org.apache.spark.sql.graft.ColumnBridge.ofRows(spark,
        org.apache.spark.sql.catalyst.plans.logical.LocalRelation(
          attrs, cached.flatMap(_.get._2)))
    }
    refs.map(r => readManifestDir(r.dir))
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }

  private def readManifestDir(dir: String): DataFrame =
    // dirs are immutable; rows written by THIS process are served
    // from the driver-local cache as a LocalRelation — zero jobs,
    // zero footer reads. The merge/delete removal path reads every
    // parent dir per commit, so without this a table maintained by
    // micro-commits paid O(list length) parquet reads PER COMMIT
    // (the r15 curation-at-history sawtooth).
    GraftTable.manifestRows(root, dir) match {
      case Some((schema, rows)) =>
        org.apache.spark.sql.graft.ColumnBridge.ofRows(spark,
          org.apache.spark.sql.catalyst.plans.logical.LocalRelation(
            schema.map(f => org.apache.spark.sql.catalyst.expressions
              .AttributeReference(f.name, f.dataType, f.nullable)()),
            rows))
      case None => spark.read.parquet(s"${logDir(root)}/$dir")
    }

  /** Live data-file paths of `version`, memoized per (root, version) —
    * a committed version's file list is immutable, and every plain
    * [[read]] needs it, so the collect job runs once per session
    * instead of 4–6× per query (vacuum invalidates the root).
    *
    * MEASURED BOUND (SURVEY §8.9): the driver array costs ~100 bytes
    * per path — ~100 MB/10⁶ files, which covers 100 TB at 100 MB
    * files. Beyond ~10⁸ files, planning must batch from the manifest
    * Dataset instead of collecting; the manifest is already
    * distributed, only this materialization is not. */
  private def filePaths(version: Long): Seq[String] =
    GraftTable.pathsCached(root, version) {
      val m = manifest(version).select("path")
      val b = Seq.newBuilder[String]
      // BATCHED MATERIALIZATION (VERDICT r12 #1): the output Seq is
      // unavoidable (the reader API takes paths), but a plain
      // collect() ALSO buffers the whole result set as Rows +
      // serialized batches — 2-3× the steady-state footprint. Past
      // the collect limit, stream the manifest partition-by-partition
      // so transient planning memory is one manifest partition, not
      // the table. Small tables keep the single-job collect.
      if (fileCount(version) <= GraftTable.PlanCollectLimit)
        m.collect().foreach(r => b += s"$root/${r.getString(0)}")
      else
        m.toLocalIterator().forEachRemaining(r =>
          b += s"$root/${r.getString(0)}")
      b.result()
    }

  /** Live data-file count of `version` — a snapshot-record read, no
    * manifest job (per-dir entry counts ride the snapshot). */
  def fileCount(version: Long = currentVersion): Long =
    if (version == 0) 0L else snapshot(version).nFiles

  // ---- deletion vectors (merge-on-read) ------------------------------

  /** Whether `version` carries a DELETION VECTOR — logically-deleted
    * (file, row-ordinal) pairs recorded by [[deleteWhereMor]] instead
    * of a copy-on-write rewrite. */
  def hasDeletionVectors(version: Long = currentVersion): Boolean =
    version > 0 && snapshot(version).dvDirs.nonEmpty

  /** Logically deleted rows of `version`: `(path, pos)` — root-
    * relative data-file path and the row's ordinal within that file
    * (parquet files are immutable, so the ordinal is a stable row id).
    * The union of the version's DV delta dirs, LIVE-RESTRICTED to
    * files still in its manifest (carried dirs may hold entries for
    * files a later rewrite dropped — harmless to the anti-join but
    * excluded here so diff-consumers like CDC stay exact). Empty
    * frame when the version has none. */
  def deletionVectors(version: Long = currentVersion): DataFrame = {
    val refs = if (version == 0) Nil else snapshot(version).dvDirs
    if (refs.isEmpty) emptyDv
    else refs.map(r => spark.read.parquet(s"${logDir(root)}/${r.dir}"))
      .reduce(_ unionByName _)
      .join(manifest(version).select("path"), Seq("path"), "left_semi")
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

  // ---- schema evolution (rename / drop / widen) ----------------------

  /** Whether `version` has undergone a rename/drop/widen — the flag
    * that turns on physical→logical read reconciliation and
    * logical→physical write translation. False for every table that
    * never evolved, so those paths stay byte-identical. */
  def isEvolved(version: Long = currentVersion): Boolean =
    version > 0 && snapshot(version).evolved

  /** Logical column name → physical (file/manifest) name at
    * `version`; identity for non-evolved tables and unknown names. */
  private def physCol(name: String, version: Long): String =
    if (!isEvolved(version)) name
    else recordedSchema(version)
      .flatMap(_.fields.find(_.name.equalsIgnoreCase(name))
        .map(GraftTable.physName))
      .getOrElse(name)

  /** Physical→LOGICAL projection for evolved tables: each recorded
    * field reads from its physical column (null-filled when a file
    * predates it — incl. re-added names, whose fresh physical name
    * old files never carry, so dropped data cannot resurrect), cast
    * to the recorded (possibly widened) type, surfaced under its
    * logical name. `_gt_*` row-id columns ride through. Identity for
    * non-evolved tables. */
  private def reconcile(df: DataFrame, version: Long): DataFrame =
    if (!isEvolved(version)) df
    else recordedSchema(version) match {
      case Some(s) =>
        val present = df.columns.toSet
        val extras = df.columns.filter(_.startsWith("_gt_")).toSeq
        df.select(s.fields.toSeq.map { f =>
          val p = GraftTable.physName(f)
          (if (present(p)) col(p).cast(f.dataType)
           else lit(null).cast(f.dataType)).as(f.name)
        } ++ extras.map(col): _*)
      case None => df
    }

  /** LOGICAL→physical rename of an outbound frame, so every data file
    * carries physical names regardless of when it was written (the
    * write-side half of the column-mapping contract). A column the
    * recorded schema does NOT know whose name collides with a used or
    * dead physical name is REFUSED: the data would land under the
    * stale physical name while the commit records a fresh one — every
    * appended value would silently read back null. `ALTER TABLE ADD
    * COLUMN` first (the commit-side schema merge assigns the fresh
    * physical name with no data write), then append. */
  private def toPhysical(df: DataFrame): DataFrame = {
    val v = currentVersion
    if (!isEvolved(v)) df
    else recordedSchema(v) match {
      case Some(s) =>
        def key(n: String) = n.toLowerCase(java.util.Locale.ROOT)
        val m = s.fields.map(f => key(f.name) -> GraftTable.physName(f))
          .toMap
        requireNoPhysCollision(df.columns.toIndexedSeq, v)
        df.select(df.columns.toSeq.map(c =>
          col(c).as(m.getOrElse(key(c), c))): _*)
      case None => df
    }
  }

  /** [[toPhysical]]'s collision refusal, reusable by every write
    * entry point (the connector's executor write path included): a
    * NEW column whose name equals a used or dead PHYSICAL name is
    * refused — the data would land under the stale physical name
    * while the commit-side schema merge records a fresh one, and
    * every appended value would silently read back null. */
  private[graft] def requireNoPhysCollision(cols: Seq[String],
      v: Long = currentVersion): Unit = {
    if (isEvolved(v)) recordedSchema(v).foreach { s =>
      def key(n: String) = n.toLowerCase(java.util.Locale.ROOT)
      val known = s.fields.map(f => key(f.name)).toSet
      val taken = s.fields.map(f => key(GraftTable.physName(f)))
        .toSet ++ snapshot(v).deadCols.map(key)
      cols.foreach { c =>
        require(known(key(c)) || !taken(key(c)),
          s"column $c collides with a dropped or renamed column's " +
            "physical name; run ALTER TABLE ... ADD COLUMN (which " +
            "assigns it a fresh physical name) before writing it")
      }
    }
  }

  /** Raw data-file read. Evolved tables read under an EXPLICIT
    * physical schema (physical names, recorded/WIDE types): files
    * missing a column null-fill, files keeping a narrow pre-widening
    * type promote in the vectorized reader, and extra (dropped)
    * columns are ignored — `mergeSchema` can do none of that (it
    * refuses int-vs-long merges outright). */
  private def readRaw(paths: Seq[String], version: Long): DataFrame =
    if (!isEvolved(version)) spark.read.parquet(paths: _*)
    else recordedSchema(version) match {
      case Some(s) =>
        val phys = org.apache.spark.sql.types.StructType(s.fields.map(
          f => org.apache.spark.sql.types.StructField(
            GraftTable.physName(f), f.dataType, nullable = true)))
        spark.read.schema(phys).parquet(paths: _*)
      case None =>
        spark.read.option("mergeSchema", "true").parquet(paths: _*)
    }

  /** ALTER TABLE RENAME COLUMN, log-level: the field keeps its
    * physical name in `physical` metadata; no data file is touched —
    * at 100 TB a rename must be O(1), which is why Delta/Iceberg both
    * treat it as a metadata operation (column mapping / field ids). */
  def renameColumn(oldName: String, newName: String): Long =
    evolveSchema(renames = Seq(oldName -> newName))

  /** ALTER TABLE DROP COLUMN, log-level: the field leaves the
    * recorded schema; files keep the bytes (time travel still sees
    * them) but no current read surfaces them. The dropped PHYSICAL
    * name joins the dead-column set so a later re-add of the same
    * logical name maps to a FRESH physical name — old values can
    * never resurrect. */
  def dropColumn(name: String): Long = evolveSchema(drops = Seq(name))

  /** ALTER TABLE ALTER COLUMN TYPE, WIDENING only (int→long,
    * float→double, short→int/long): log-level — old files keep the
    * narrow physical type and reads cast up, exactly Iceberg's type-
    * promotion rule (safe because every narrow value embeds losslessly
    * in the wide type; narrowing is refused). */
  def widenColumn(name: String, to: org.apache.spark.sql.types.DataType)
      : Long = evolveSchema(widens = Seq(name -> to))

  /** ALL of an ALTER TABLE's renames/drops/widens as ONE atomic
    * commit: every change is validated against the evolving schema
    * UP FRONT (applied left to right: renames, then drops, then
    * widens), so a multi-change ALTER either fully applies or fully
    * fails — never a half-altered table (a mid-sequence refusal in a
    * commit-per-change loop would leave earlier changes applied with
    * no rollback). Log-level like the single-change forms: zero data
    * movement at any table size. */
  def evolveSchema(renames: Seq[(String, String)] = Nil,
      drops: Seq[String] = Nil,
      widens: Seq[(String, org.apache.spark.sql.types.DataType)] = Nil)
      : Long = {
    import org.apache.spark.sql.types._
    val s0 = recordedSchema().getOrElse(sys.error(
      "evolveSchema: table has no recorded schema"))
    var fields = s0.fields.toVector
    var dead = Set.empty[String]
    renames.foreach { case (oldName, newName) =>
      val idx = fields.indexWhere(_.name.equalsIgnoreCase(oldName))
      require(idx >= 0, s"renameColumn: no such column $oldName")
      require(!fields.exists(_.name.equalsIgnoreCase(newName)),
        s"renameColumn: column $newName already exists")
      val f = fields(idx)
      fields = fields.updated(idx, f.copy(name = newName,
        metadata = new MetadataBuilder().withMetadata(f.metadata)
          .putString("physical", GraftTable.physName(f)).build()))
    }
    drops.foreach { name =>
      val idx = fields.indexWhere(_.name.equalsIgnoreCase(name))
      require(idx >= 0, s"dropColumn: no such column $name")
      require(fields.length > 1,
        "dropColumn: cannot drop the last column")
      dead += GraftTable.physName(fields(idx))
      fields = fields.patch(idx, Nil, 1)
    }
    widens.foreach { case (name, to) =>
      val idx = fields.indexWhere(_.name.equalsIgnoreCase(name))
      require(idx >= 0, s"widenColumn: no such column $name")
      val f = fields(idx)
      val ok = (f.dataType, to) match {
        case (IntegerType, LongType) => true
        case (FloatType, DoubleType) => true
        case (ShortType, IntegerType | LongType) => true
        case (ByteType, ShortType | IntegerType | LongType) => true
        case _ => false
      }
      require(ok, s"widenColumn: ${f.dataType.simpleString} → " +
        s"${to.simpleString} is not a widening promotion")
      // bloom filters hash TYPED values (xxhash64(int) ≠
      // xxhash64(long)); widening a bloom-indexed column would turn
      // its index into a silent mis-pruner — refuse, the user must
      // drop the index first
      require(!bloomCols.contains(GraftTable.physName(f)),
        s"widenColumn: $name carries a bloom index keyed on the " +
          "narrow type; rebuild the table (or drop the index) to " +
          "widen it")
      fields = fields.updated(idx, f.copy(dataType = to))
    }
    commitWithRetry("alter",
      newSchema =
        Some(org.apache.spark.sql.types.StructType(fields.toArray)),
      schemaReplace = true, evolvedOverride = Some(true),
      addDeadCols = dead)(_ => AddRemove())
  }

  // ---- reads ---------------------------------------------------------

  /** The table at `version` (defaults to current) — time travel is
    * just resolving an older manifest. */
  def read(version: Long = currentVersion): DataFrame = {
    ReadCounter.bump(root)
    val paths = filePaths(version)
    if (paths.isEmpty) spark.emptyDataFrame
    else reconcile(applyDv(readRaw(paths, version), version), version)
  }

  /** Zone-map pruned read: only files whose [min,max] envelope of
    * `statsCol` intersects [lo, hi] are opened; the residual filter
    * still applies row-level (file skipping is a superset guarantee).
    * Returns (rows, filesOpened, filesTotal) so callers — and specs —
    * can see the skip rate. */
  def prunedRead(statsCol: String, lo: Column, hi: Column)
      : (DataFrame, Long, Long) = {
    val v = currentVersion
    val pc = physCol(statsCol, v) // manifest stats live under physical names
    require(statsCols.contains(pc), s"no stats for $statsCol")
    // NULL-SAFE: a null envelope (dir written before the stats column
    // was declared, null-filled by the manifest union) means "unknown"
    // — the file must be KEPT, never pruned (the residual row filter
    // keeps the answer exact either way).
    // ONE uncached job projecting (path, keep): caching the manifest
    // and filtering it is subtly WRONG for NaN envelopes — Spark's
    // in-memory columnar batch stats compare doubles with primitive
    // '<' (NaN never enters a batch's bound), so batch pruning drops
    // rows a NaN max should satisfy. Parquet pushdown is safe (footers
    // omit stats for NaN-bearing double columns).
    val keep = col(s"min_$pc").isNull ||
      !(col(s"max_$pc") < lo || col(s"min_$pc") > hi)
    val (live, total) = keptPaths(keep, v)
    val df =
      if (live.isEmpty) read().limit(0)
      else reconcile(applyDv(readRaw(live, v), v), v)
    (df.where(col(statsCol) >= lo && col(statsCol) <= hi),
      live.length.toLong, total)
  }

  /** Evaluate a manifest KEEP flag into (live paths, total entries).
    * Past [[GraftTable.PlanCollectLimit]] the flags STREAM
    * partition-by-partition (`toLocalIterator`) instead of one
    * whole-result collect — the kept-path Seq is unavoidable (the
    * reader API takes paths) but the transient Row/batch buffers of a
    * full collect are 2-3x the steady footprint at 2e5+ entries
    * (VERDICT r13 #6). One uncached job either way — see prunedRead's
    * NaN-envelope caveat for why the manifest is never cached here. */
  private def keptPaths(keepCol: Column, version: Long)
      : (Seq[String], Long) = {
    val sel = manifest(version)
      .select(col("path"), keepCol.as("keep"))
    var total = 0L
    val b = Seq.newBuilder[String]
    def add(r: org.apache.spark.sql.Row): Unit = {
      total += 1
      if (r.getBoolean(1)) b += s"$root/${r.getString(0)}"
    }
    if (fileCount(version) <= GraftTable.PlanCollectLimit)
      sel.collect().foreach(add)
    else
      sel.toLocalIterator().forEachRemaining(r => add(r))
    (b.result(), total)
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
    val v = currentVersion
    // one uncached job (see prunedRead: cached batch stats mishandle
    // NaN envelopes — the cache's batch pruning would skip a file
    // whose max is NaN for upper-range predicates)
    val (live, total) =
      keptPaths(coalesce(statsKeep(cond, v), lit(true)), v)
    val df =
      if (live.isEmpty) read().limit(0)
      else reconcile(applyDv(readRaw(live, v), v), v)
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
    // predicates reference LOGICAL names; manifest stats/blooms live
    // under PHYSICAL names — translate at the match (identity unless
    // the table evolved)
    def attr(e: Expression): Option[String] = e match {
      case a: AttributeReference
          if statsCols.contains(physCol(a.name, version)) =>
        Some(physCol(a.name, version))
      case _ => None // incl. Cast(attr): a cast can break monotonicity
    }
    // equality probes can also prune through a BLOOM INDEX (columns
    // the table is not clustered on); envelope and bloom tests AND
    def attrEq(e: Expression): Option[String] = e match {
      case a: AttributeReference
          if statsCols.contains(physCol(a.name, version)) ||
            bloomCols.contains(physCol(a.name, version)) =>
        Some(physCol(a.name, version))
      case _ => None
    }
    // NULL-SAFE envelopes throughout: a null min/max (dir predating
    // the stats column, null-filled at the manifest union) keeps the
    // file — same contract as a null bloom
    def eqTest(c: String, lv: Column): Column = {
      val env =
        if (statsCols.contains(c))
          col(s"min_$c").isNull ||
            (col(s"min_$c") <= lv && col(s"max_$c") >= lv)
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
        case (Some(c), Some(lv), _, _) =>
          col(s"max_$c").isNull || col(s"max_$c") > lv   // c > v
        case (_, _, Some(c), Some(lv)) =>
          col(s"min_$c").isNull || col(s"min_$c") < lv   // v > c
        case _ => lit(true)
      }
      case GreaterThanOrEqual(a, v) =>
        (attr(a), value(v), attr(v), value(a)) match {
          case (Some(c), Some(lv), _, _) =>
            col(s"max_$c").isNull || col(s"max_$c") >= lv
          case (_, _, Some(c), Some(lv)) =>
            col(s"min_$c").isNull || col(s"min_$c") <= lv
          case _ => lit(true)
        }
      case LessThan(a, v) => (attr(a), value(v), attr(v), value(a)) match {
        case (Some(c), Some(lv), _, _) =>
          col(s"min_$c").isNull || col(s"min_$c") < lv
        case (_, _, Some(c), Some(lv)) =>
          col(s"max_$c").isNull || col(s"max_$c") > lv
        case _ => lit(true)
      }
      case LessThanOrEqual(a, v) =>
        (attr(a), value(v), attr(v), value(a)) match {
          case (Some(c), Some(lv), _, _) =>
            col(s"min_$c").isNull || col(s"min_$c") <= lv
          case (_, _, Some(c), Some(lv)) =>
            col(s"max_$c").isNull || col(s"max_$c") >= lv
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
    // evolved tables must NOT mergeSchema (it refuses the int-vs-long
    // merges widening creates) — readRaw's explicit physical schema
    // already delivers merge semantics there
    else if (isEvolved(version))
      reconcile(applyDv(readRaw(paths, version), version), version)
    else reconcile(applyDv(
      spark.read.option("mergeSchema", "true").parquet(paths: _*),
      version), version)
  }

  /** Versions in `(fromVersion, toVersion]` a change-data reader must
    * materialize. Reorganization commits (`data_change=0` — compact/
    * zorder/alter) are SKIPPED: their rewritten survivor rows are not
    * new data, and emitting them as inserts double-counts every
    * surviving row in a downstream fold (Delta CDF's `dataChange`
    * contract). A data-changing commit that DROPPED live files
    * (`rewrite=1` — COW delete/replaceWhere/overwrite/merge/restore)
    * REFUSES loudly: a file diff cannot tell its survivor rows from
    * inserts, and a silently wrong increment is worse than a failed
    * read. Change-fed tables mutate through the MOR row-level ops
    * ([[deleteWhereMor]]/[[mergeMor]], `delete.mode=mor`). */
  private[graft] def changeVersions(fromVersion: Long,
      toVersion: Long): Seq[Long] = {
    require(fromVersion <= toVersion,
      s"change window is reversed: ($fromVersion, $toVersion]")
    ((fromVersion + 1) to toVersion).filter { v =>
      val s = snapshot(v)
      if (s.dataChange && s.rewrite)
        throw new IllegalStateException(
          s"gtable change feed on $root cannot express v$v " +
            s"(op=${s.op}): a copy-on-write rewrite dropped live " +
            "files, so a file diff would emit its surviving rows as " +
            "fresh inserts. Mutate change-fed tables through MOR ops " +
            "(deleteWhereMor/mergeMor, TBLPROPERTIES " +
            "('delete.mode'='mor')) — or restart the feed from " +
            s"v$v with a full snapshot.")
      s.dataChange
    }
  }

  /** Entry count of the data files ADDED at exactly `v` —
    * snapshot-record arithmetic (ZERO jobs). New commits record the
    * exact count (`added_entries=` kv, the fresh delta dir's size
    * BEFORE any fold swallowed it) so a version whose commit also
    * FOLDED the manifest list no longer charges the rate cap with the
    * whole table (ADVICE r13: a maxFilesPerTrigger stream crossing a
    * fold collapsed to one-version batches). Legacy records fall back
    * to the dir-level diff (fold over-charges → over-throttles, never
    * under). The streaming source's admission-control cost model,
    * never used for semantics. */
  private[graft] def addedEntryCountAt(v: Long): Long = {
    val s = snapshot(v)
    s.addedEntries.getOrElse {
      val prev = (if (v <= 1) Nil else snapshot(v - 1).manifestDirs)
        .map(_.dir).toSet
      s.manifestDirs.filterNot(r => prev(r.dir))
        .map(r => math.max(0L, r.entries)).sum
    }
  }

  /** Bytes of the data files ADDED at exactly `v` — the recorded
    * pre-fold exact count (`added_bytes=` kv since r15: when a fold
    * swallows the commit's own fresh delta dir — usually the smallest
    * — the dir-level diff below sees no new dir and would charge 0,
    * letting a maxBytesPerTrigger stream admit the version for free,
    * ADVICE r14); legacy records fall back to a delta-sized manifest
    * read over the new dirs (null sizes count 0). Paid ONLY by
    * streams that set `maxBytesPerTrigger`; like
    * [[addedEntryCountAt]] this is a rate cap's cost model, never
    * semantics. */
  private[graft] def addedBytesAt(v: Long): Long = {
    val s = snapshot(v)
    s.addedBytes.foreach(b => return b)
    val prev = (if (v <= 1) Nil else snapshot(v - 1).manifestDirs)
      .map(_.dir).toSet
    // a fold dir's entries were all carried from prior dirs — its
    // bytes are not new data (ADVICE r13)
    val newDirs = s.manifestDirs.filterNot(r =>
      prev(r.dir) || s.foldDir.contains(r.dir))
    if (newDirs.isEmpty) 0L
    else {
      val u = unionRefs(newDirs)
      if (!u.columns.contains("size_bytes")) 0L
      else u.agg(coalesce(sum(col("size_bytes")), lit(0L)))
        .head().getLong(0)
    }
  }

  /** Root-relative paths of the data files ADDED at exactly version
    * `v` — driver arithmetic over the snapshot's manifest-dir LIST
    * (delta dirs are immutable and carried by reference, so an
    * append's added files are its own delta dirs' contents, O(delta)
    * metadata); only a commit that also FOLDED the list pays a
    * path-level except over the folded dirs. */
  private[graft] def addedPathsAt(v: Long): Seq[String] = {
    import spark.implicits._
    val prevRefs =
      if (v <= 1) Nil else snapshot(v - 1).manifestDirs
    val prev = prevRefs.map(_.dir).toSet
    val cur = snapshot(v).manifestDirs
    val newDirs = cur.filterNot(r => prev(r.dir))
    if (newDirs.isEmpty) Nil
    else {
      val added = unionRefs(newDirs).select("path")
      val curSet = cur.map(_.dir).toSet
      val gone = prevRefs.filterNot(r => curSet(r.dir))
      val fresh =
        if (gone.isEmpty) added
        else added.except(unionRefs(gone).select("path"))
      fresh.as[String].collect().toSeq
    }
  }

  /** NEW deletion-vector entries `(path, pos)` at exactly version
    * `v`, restricted to files live at `v` — the same dir-level diff
    * as [[addedPathsAt]] over the DV delta list (a MOR commit's new
    * deletes are its own delta dir); only a DV-list fold pays an
    * entry-level except. */
  private[graft] def newDvEntriesAt(v: Long): DataFrame = {
    val prevRefs = if (v <= 1) Nil else snapshot(v - 1).dvDirs
    val prev = prevRefs.map(_.dir).toSet
    val cur = snapshot(v).dvDirs
    val newDirs = cur.filterNot(r => prev(r.dir))
    if (newDirs.isEmpty) emptyDv
    else {
      val added = newDirs
        .map(r => spark.read.parquet(s"${logDir(root)}/${r.dir}"))
        .reduce(_ unionByName _).select("path", "pos")
      val curSet = cur.map(_.dir).toSet
      val gone = prevRefs.filterNot(r => curSet(r.dir))
      val fresh =
        if (gone.isEmpty) added
        else added.except(gone
          .map(r => spark.read.parquet(s"${logDir(root)}/${r.dir}"))
          .reduce(_ unionByName _).select("path", "pos"))
      fresh.join(manifest(v).select("path"), Seq("path"), "left_semi")
    }
  }

  /** Materialize the rows named by `(path, pos)` DV entries, read
    * under `version`'s schema — only the named files are opened. */
  private def rowsByPos(dv: DataFrame, version: Long): Option[DataFrame] = {
    val touched = dv.select("path").distinct()
      .collect().map(_.getString(0))
    if (touched.isEmpty) None
    else {
      val raw = readRaw(touched.toIndexedSeq.map(p => s"$root/$p"),
        version)
      val dataCols = raw.columns.toIndexedSeq
      Some(reconcile(withRowId(raw)
        .join(dv.select(col("path").as("_gt_path"),
          col("pos").as("_gt_pos")), Seq("_gt_path", "_gt_pos"),
          "left_semi")
        .select(dataCols.map(col): _*), version))
    }
  }

  /** CDC-style incremental read: the rows of files ADDED by
    * data-changing commits between two snapshots — what lets a
    * downstream consumer maintain a derived table without rescanning
    * (Delta's change-data-feed restated at file granularity).
    * Per-version walk: reorganization commits (compact/zorder) are
    * skipped — their rewritten files are NOT new data — and a COW
    * rewrite in the window refuses (see [[changeVersions]]).
    * `fromVersion = 0` is the INITIAL SNAPSHOT: history collapses to
    * "every live row is new", so no walk and no refusal. A
    * [[deleteWhereMor]] commit adds no files, so MOR deletes do not
    * surface here (see [[readCdc]] for delete events). */
  def readChanges(fromVersion: Long, toVersion: Long): DataFrame = {
    val added =
      if (fromVersion == 0)
        manifest(toVersion).select("path")
          .collect().map(r => s"$root/${r.getString(0)}").toSeq
      else changeVersions(fromVersion, toVersion)
        .flatMap(addedPathsAt).map(p => s"$root/$p")
    if (added.isEmpty) read(toVersion).limit(0)
    else reconcile(readRaw(added, toVersion), toVersion)
  }

  /** ROW-LEVEL CDC: every change between two snapshots as an event
    * stream, walked PER COMMIT — `_change_type` 'insert' for rows of
    * files added by a data-changing commit, 'delete' for rows whose
    * (file, ordinal) joined the deletion vector, and for a
    * [[mergeMor]] commit 'update_preimage'/'update_postimage' for the
    * matched rows (the recorded `merge_keys` split the commit's
    * events: DV'd rows are pre-images, inserted rows with a matching
    * pre-image key are post-images, the rest genuine inserts — Delta
    * CDF's MERGE contract). A row appended then MOR-deleted inside
    * the window emits both events (net zero under a fold).
    * Reorganization commits emit NOTHING (a compaction inside the
    * window is invisible — it changed no data) and a COW rewrite
    * refuses ([[changeVersions]]). `fromVersion = 0` is the initial
    * snapshot: all live rows as inserts, all live DV entries as
    * deletes, no refusal. Planning is window-delta-sized: added
    * files and new DV entries resolve from each commit's own delta
    * dirs. */
  def readCdc(fromVersion: Long, toVersion: Long): DataFrame = {
    val parts: Seq[DataFrame] =
      if (fromVersion == 0) {
        val inserts = readChanges(0, toVersion)
          .withColumn("_change_type", lit("insert"))
        val dvAll = deletionVectors(toVersion)
        inserts +: rowsByPos(dvAll, toVersion)
          .map(_.withColumn("_change_type", lit("delete"))).toSeq
      } else changeVersions(fromVersion, toVersion).flatMap { v =>
        val s = snapshot(v)
        val addedP = addedPathsAt(v)
        val inserts =
          if (addedP.isEmpty) None
          else Some(reconcile(readRaw(addedP.map(p => s"$root/$p"),
            toVersion), toVersion))
        val dels = rowsByPos(newDvEntriesAt(v), toVersion)
        if (s.op == "merge_mor" && s.mergeKeys.nonEmpty &&
            dels.nonEmpty && inserts.nonEmpty) {
          val keys = s.mergeKeys
          val preKeys = dels.get.select(keys.map(col): _*).distinct()
          Seq(
            inserts.get.join(preKeys, keys, "left_anti")
              .withColumn("_change_type", lit("insert")),
            inserts.get.join(preKeys, keys, "left_semi")
              .withColumn("_change_type", lit("update_postimage")),
            dels.get
              .withColumn("_change_type", lit("update_preimage")))
        } else
          inserts.map(_.withColumn("_change_type", lit("insert"))).toSeq ++
            dels.map(_.withColumn("_change_type", lit("delete"))).toSeq
      }
    if (parts.isEmpty)
      read(toVersion).limit(0).withColumn("_change_type", lit("insert"))
    else parts.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Physically delete everything the last `retainLast` snapshots no
    * longer reference: older snapshot records, their manifests, and
    * any data file only they pointed at. Time travel behind the
    * horizon is gone afterwards — that is the deal vacuum offers; the
    * horizon is visible in [[history]], and readers must stay inside
    * it (Delta's RETAIN contract — vacuum cannot see a remote
    * reader's plan, so the retention window IS the guard).
    *
    * Reachability is computed from the RETAINED + TAGGED snapshots
    * only — one manifest pass per kept version, NEVER a full-history
    * replay (a 10⁵-commit table must not re-read every version's
    * manifest to vacuum). Any file outside that live set — expired
    * history, crash orphans, an IN-FLIGHT concurrent writer's
    * not-yet-committed data (writeData runs before the atomic
    * snapshot create) — is deleted only when older than
    * `minOrphanAgeMs` (Delta's retention-hours contract), so vacuum
    * never races a live commit. Pass 0 to force-collect expired
    * history and known-dead orphans now (post-compaction reclaim,
    * crash recovery).
    *
    * Returns the number of data files deleted. Driver work is
    * file-list-sized, IO is unreferenced-files-sized. */
  def vacuum(retainLast: Int = 1,
      minOrphanAgeMs: Long = DefaultOrphanRetentionMs): Int = {
    require(retainLast >= 1,
      "vacuum must retain at least the current snapshot")
    val cur = currentVersion
    val keepFrom = math.max(1L, cur - retainLast + 1)
    // TAGGED versions are pinned outside the horizon: their snapshot
    // record, metadata dirs, and data files all survive — a tag is a
    // reproducibility promise and vacuum must not be able to break it
    val protectedVs = tags.values.filter(v => v < keepFrom).toSet
    val keepVs = (keepFrom to cur) ++ protectedVs.toSeq
    // REACHABILITY FROM RETAINED + TAGGED SNAPSHOTS ONLY (VERDICT r11
    // #5): the one manifest pass vacuum pays is O(retained), never a
    // full-history replay — at a 10⁵-commit table re-reading every
    // version's manifest was the next metadata wall. A file outside
    // this live set is reclaimed once older than `minOrphanAgeMs`,
    // whether it is expired history or a crash orphan: the age guard
    // ALONE protects in-flight concurrent writers (their files are
    // always younger than the guard), which is Delta's retention
    // contract. Expired-history files younger than the guard linger
    // until it passes — lingering is cheap, a replay is not.
    lastVacuumManifestReads = keepVs.size.toLong
    val orphanCutoff = System.currentTimeMillis() - minOrphanAgeMs
    var deleted = 0
    val commitDirs = logStore.list(s"$root/data")
    val totalLive = keepVs.map(fileCount).sum
    if (totalLive <= GraftTable.PlanCollectLimit &&
        commitDirs.length < GraftTable.DistributedVacuumMinDirs) {
      // small table: driver walk through the LogStore seam
      val live = keepVs.flatMap(v =>
        manifest(v).select("path").collect().map(_.getString(0))).toSet
      commitDirs.foreach { cd =>
        val cdPath = s"$root/data/${cd.name}"
        logStore.list(cdPath).foreach { f =>
          val rel = s"data/${cd.name}/${f.name}"
          val collectable = !live.contains(rel) && f.mtimeMs < orphanCutoff
          if (f.name.endsWith(".parquet") && collectable) {
            if (logStore.delete(s"$cdPath/${f.name}")) deleted += 1
          }
        }
      }
    } else {
      // DISTRIBUTED ORPHAN SCAN (VERDICT r12 #1/#6): at 10⁶+ files the
      // live set no longer fits comfortably on the driver and a
      // sequential listing loop costs minutes — list the commit dirs
      // as a parallelized Spark job (Hadoop FS on executors, the
      // InMemoryFileIndex pattern) and LEFT-ANTI-JOIN against the
      // union of retained manifests. Driver memory is O(commit dirs)
      // + O(actual orphans); only the orphan list ever materializes.
      import spark.implicits._
      val rootL = root
      val confB = spark.sparkContext.broadcast(
        new org.apache.spark.util.SerializableConfiguration(
          spark.sessionState.newHadoopConf()))
      val listed = spark.createDataset(
          commitDirs.map(cd => s"data/${cd.name}"))
        .repartition(math.min(commitDirs.length,
          spark.sparkContext.defaultParallelism))
        .flatMap { cdRel =>
          val p = new org.apache.hadoop.fs.Path(s"$rootL/$cdRel")
          val fs = p.getFileSystem(confB.value.value)
          try fs.listStatus(p).toSeq
            .filter(_.getPath.getName.endsWith(".parquet"))
            .map(st =>
              (s"$cdRel/${st.getPath.getName}", st.getModificationTime))
          catch { case _: java.io.FileNotFoundException => Nil }
        }.toDF("path", "mtime")
      val liveDf = keepVs.map(v => manifest(v).select("path"))
        .reduce(_ union _).distinct()
      val orphans = listed
        .join(liveDf, Seq("path"), "left_anti")
        .where(col("mtime") < orphanCutoff)
        .select("path").as[String].collect()
      orphans.foreach { rel =>
        if (logStore.delete(s"$root/$rel")) deleted += 1
      }
    }
    // drop commit dirs emptied of data files (driver loop, O(dirs))
    commitDirs.foreach { cd =>
      val cdPath = s"$root/data/${cd.name}"
      val left = logStore.list(cdPath)
      if (left.forall(f => !f.name.endsWith(".parquet"))) {
        left.foreach(f => logStore.delete(s"$cdPath/${f.name}"))
        logStore.delete(cdPath)
      }
    }
    // manifest AND deletion-vector dirs are SHARED across snapshots
    // (appends/restores carry both lists by reference): an expired
    // snapshot's dir is deleted only if no RETAINED snapshot still
    // lists it.
    val keptDirs = keepVs.flatMap { v =>
      try {
        val s = snapshot(v)
        s.manifestDirs.map(_.dir) ++ s.dvDirs.map(_.dir)
      } catch { case _: java.nio.file.NoSuchFileException => Nil }
    }.toSet
    (1L until keepFrom).filterNot(protectedVs).foreach { v =>
      try {
        val s = snapshot(v)
        s.manifestDirs.map(_.dir).filterNot(keptDirs).foreach(d =>
          logStore.deleteRecursively(s"${logDir(root)}/$d"))
        s.dvDirs.map(_.dir).filterNot(keptDirs).foreach(d =>
          logStore.deleteRecursively(s"${logDir(root)}/$d"))
        logStore.delete(s"${logDir(root)}/snapshot-v$v.txt")
      } catch { // already vacuumed by an earlier pass
        case _: java.nio.file.NoSuchFileException => ()
      }
    }
    GraftTable.invalidate(root) // memoized snapshots/paths now stale
    // orphaned manifest dirs (written by a commit that never created
    // its snapshot file) — same age guard as orphan data. Only the
    // RETAINED + TAGGED snapshots still have records at this point
    // (expired ones were just deleted), so reachability over keepVs
    // is complete, with no (1..cur) probe loop.
    val namedDirs = keepVs.flatMap { v =>
      try {
        val s = snapshot(v)
        s.manifestDirs.map(_.dir) ++ s.dvDirs.map(_.dir)
      } catch { case _: java.nio.file.NoSuchFileException => Nil }
    }.toSet
    logStore.list(logDir(root))
      .filter(d => d.isDir &&
        (d.name.startsWith("manifest-v") ||
          d.name.startsWith("dv-v")) &&
        !namedDirs.contains(d.name) &&
        d.mtimeMs < orphanCutoff)
      .foreach(d => logStore.deleteRecursively(s"${logDir(root)}/${d.name}"))
    deleted
  }

  /** Logically-deleted (DV) row count of `version` — with [[rowCount]]
    * the input to the DV-compaction policy (`CALL system.maintain`):
    * when dels/rows crosses a threshold, the per-read anti-join tax
    * outweighs a one-time rewrite. Snapshot-record reads, no IO. */
  def deletedRowCount(version: Long = currentVersion): Long =
    if (version == 0) 0L else snapshot(version).nDels

  /** PHYSICAL row count of `version` (live rows = rowCount −
    * deletedRowCount). Snapshot-record read, no IO. */
  def rowCount(version: Long = currentVersion): Long =
    if (version == 0) 0L else snapshot(version).nRows

  // ---- tags: named immutable snapshot references ---------------------

  /** Create an IMMUTABLE named reference to `version` — the
    * dataset-pinning primitive a training pipeline needs: "the exact
    * bytes model X trained on" survives every later mutation AND
    * every vacuum ([[vacuum]] protects tagged versions outside its
    * horizon). Creation is a [[CommitIO.putIfAbsent]], so two racing
    * taggers resolve to exactly one winner and a tag can never be
    * silently repointed — reproducibility demands immutability
    * (Iceberg tags; Delta would call it a named version). Re-tagging
    * a name requires an explicit [[deleteTag]] first. */
  def tag(name: String, version: Long = currentVersion,
      message: String = ""): Unit = {
    require(name.matches("[A-Za-z0-9][A-Za-z0-9._-]*"),
      s"invalid tag name: $name")
    val cur = currentVersion
    require(version >= 1 && version <= cur,
      s"tag: version $version outside committed range 1..$cur")
    require(logStore.exists(s"${logDir(root)}/snapshot-v$version.txt"),
      s"tag: snapshot v$version has been vacuumed")
    // line 1 = the pinned version (the original format — old readers
    // keep working); optional kv lines carry provenance so "what did
    // train_v1 pin and why" is answerable from the log alone
    val body = (s"$version" +:
      (s"created_ms=${System.currentTimeMillis()}" +:
        (if (message.nonEmpty)
          Seq(s"message=${message.replace('\n', ' ')}") else Nil)))
      .mkString("", "\n", "\n")
    if (!putLogIfAbsent(s"tag-$name.txt", body.getBytes("UTF-8")))
      throw new IllegalStateException(
        s"tag $name already exists (tags are immutable; deleteTag " +
          "first to repoint)")
  }

  /** One tag's full record: pinned version, creation epoch millis
    * (0 for pre-provenance tags), and message (empty if none). */
  case class TagInfo(name: String, version: Long, createdMs: Long,
    message: String)

  /** All tags with provenance, name-sorted. */
  def tagInfos: Seq[TagInfo] =
    logStore.list(logDir(root)).iterator
      .flatMap(f => f.name match {
        case GraftTable.TagName(n) =>
          val lines = new String(
            logStore.read(s"${logDir(root)}/${f.name}"), "UTF-8")
            .split("\n").map(_.trim).filter(_.nonEmpty)
          val kv = lines.drop(1).flatMap { l =>
            val i = l.indexOf('=')
            if (i < 0) None else Some(l.take(i) -> l.drop(i + 1))
          }.toMap
          Some(TagInfo(n, lines.head.toLong,
            kv.get("created_ms").map(_.toLong).getOrElse(0L),
            kv.getOrElse("message", "")))
        case _ => None
      }).toSeq.sortBy(_.name)

  /** All tags of this table: name → version. */
  def tags: Map[String, Long] =
    tagInfos.map(t => t.name -> t.version).toMap

  /** Resolve a tag to its version; explicit error for unknown tags. */
  def versionForTag(name: String): Long =
    tags.getOrElse(name, throw new IllegalArgumentException(
      s"unknown tag $name on $root; known: ${tags.keys.toSeq.sorted
        .mkString(", ")}"))

  /** Remove a tag (the version it pinned becomes vacuumable again
    * once outside the retention horizon). */
  def deleteTag(name: String): Boolean =
    logStore.delete(s"${logDir(root)}/tag-$name.txt")

  /** Commit history, newest first: one row per snapshot still on
    * disk (vacuum removes records behind its horizon). */
  def history(): DataFrame = {
    import spark.implicits._
    (1L to currentVersion).flatMap { v =>
      try {
        val s = snapshot(v)
        // commit_ts = the RECORDED commit wall-clock (r14) — the
        // timeline `timestampAsOf` resolves against, surfaced so
        // users pick cutoffs from it (DESCRIBE HISTORY's contract);
        // null on pre-r14 records
        Some((s.version, s.op, s.parent, s.nFiles, s.nRows,
          s.tsMillis.map(m => new java.sql.Timestamp(m))))
      } catch { case _: java.nio.file.NoSuchFileException => None }
    }.toDF("version", "op", "parent", "n_files", "n_rows", "commit_ts")
      .orderBy(col("version").desc)
  }

  // ---- writes --------------------------------------------------------

  /** Append `df` as a new snapshot; returns the committed version.
    * Data files are written ONCE; only the (cheap) manifest+commit
    * step retries under a concurrent-writer conflict. O(appended)
    * metadata: the commit writes ONE delta manifest dir and carries
    * the parent's manifest list by reference — appending one file to
    * a billion-file table never rewrites the billion-row manifest. */
  def append(df: DataFrame, numFiles: Int = 4): Long = {
    val stats = CommitProfile.time("write_data")(writeData(df, numFiles))
    CommitProfile.time("commit")(
      commitWithRetry("append", newSchema = Some(df.schema))(
        _ => AddRemove(added = Some(stats))))
  }

  /** (candidate files the last COW audit actually read, live files at
    * that commit) — spec hooks pinning that the mutation-path audit is
    * stats-pruned (reads ≤ envelope-intersecting files), not O(table). */
  @volatile private[graft] var lastAuditScanned: Long = -1L
  @volatile private[graft] var lastAuditTotal: Long = -1L

  /** Manifest passes the last [[vacuum]] planned — spec-pinned to
    * O(retained + tagged), never O(all versions). */
  @volatile private[graft] var lastVacuumManifestReads: Long = -1L

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
      numFiles: Int): AddRemove = {
    import spark.implicits._
    val all = manifest(parent)
    val allPaths = all.select("path").as[String].collect()
    lastAuditTotal = allPaths.length.toLong
    if (allPaths.isEmpty) { lastAuditScanned = 0L; return AddRemove() }
    val candidates = all.where(statsKeep(cond, parent))
      .select("path").as[String].collect()
    lastAuditScanned = candidates.length.toLong
    if (candidates.isEmpty) return AddRemove()
    val hit = coalesce(cond, lit(false))
    // audit over the LIVE view: rows already in the parent's deletion
    // vector count neither as total nor as hits, so a file whose
    // remaining live rows all match still drops cleanly, and per-file
    // totals are live-row totals
    // audits evaluate `cond` (logical names) over the reconciled view
    val audit = reconcile(minusDv(withRowId(readRaw(
        candidates.map(p => s"$root/$p").toSeq, parent)), parent), parent)
      .groupBy(col("_gt_path"))
      .agg(count(lit(1)).as("total"),
        count(when(hit, lit(1))).as("hits"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val touched = audit.filter(_._3 > 0)
    val mixed = touched.filter(a => a._3 < a._2).map(_._1)
    // touched (all-hit + mixed) files LEAVE the manifest; only the
    // manifest dirs that list them are rewritten at commit — every
    // other dir carries by reference, so a windowed delete's metadata
    // cost follows the window, not the table
    if (mixed.isEmpty)
      AddRemove(removedPaths = touched.map(_._1).toSeq)
    else {
      val rec = reconcile(minusDv(withRowId(readRaw(
        mixed.map(p => s"$root/$p").toSeq, parent)), parent), parent)
      val dataCols = rec.columns.toIndexedSeq
        .filterNot(_.startsWith("_gt_"))
      val survivors = rec.where(!hit).select(dataCols.map(col): _*)
      AddRemove(added = Some(writeData(survivors, numFiles)),
        removedPaths = touched.map(_._1).toSeq)
    }
  }

  /** Replace the ENTIRE table content with `df` in one atomic
    * snapshot (the TRUNCATE+INSERT a `SaveMode.Overwrite` through the
    * v2 connector maps to). Old files become unreferenced history —
    * still time-travelable until vacuum. */
  def overwrite(df: DataFrame, numFiles: Int = 4): Long = {
    // full replacement resets evolution state: every file is new and
    // written under df's own names, so no mapping survives
    val stats = writeData(df, numFiles, translate = false)
    commitWithRetry("overwrite", newSchema = Some(df.schema),
      evolvedOverride = Some(false),
      deadColsOverride = Some(Set.empty))(_ => ReplaceAll(stats))
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
        else reconcile(minusDv(withRowId(readRaw(
            candidates.map(p => s"$root/$p").toSeq, parent)), parent),
            parent)
          .where(coalesce(cond, lit(false)))
          .select(col("_gt_path").as("path"), col("_gt_pos").as("pos"))
      }
      // the manifest list carries by reference UNCHANGED — a MOR
      // delete's metadata write is the DV alone, zero manifest IO
    })(_ => AddRemove())
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
    // stats columns live under PHYSICAL names; surface them to the
    // caller under the logical name and recorded (widened) type
    val p2l: Map[String, (String, org.apache.spark.sql.types.DataType)] =
      if (!isEvolved(version)) Map.empty
      else recordedSchema(version).map(_.fields.map(f =>
        GraftTable.physName(f) -> ((f.name, f.dataType))).toMap)
        .getOrElse(Map.empty)
    def outName(pre: String, c: String): String =
      s"${pre}_${p2l.get(c).map(_._1).getOrElse(c)}"
    def out(pre: String, c: String): Column = {
      val agg = if (pre == "min") min(col(s"min_$c"))
        else max(col(s"max_$c"))
      p2l.get(c) match {
        case Some((l, t)) => agg.cast(t).as(outName(pre, c))
        case None => agg.as(outName(pre, c))
      }
    }
    // A manifest row with rows but a NULL envelope (a dir written
    // before the column carried stats, null-filled by the list union)
    // means min/max over the manifest is NOT the table's min/max —
    // answer NULL for that column rather than a silently-wrong value.
    // EXCEPT an all-null file (nulls_c == row_count, the stats-present
    // marker): its null envelope is genuinely computed — SQL MIN/MAX
    // ignore nulls, so folding the other files' envelopes stays exact
    // (ADVICE r12). Old manifests lack the marker → conservative.
    val mdf = manifest(version)
    val mcols = mdf.columns.toSet
    def incomplete(c: String): Column = {
      val allNull =
        if (mcols.contains(s"nulls_$c"))
          col(s"nulls_$c") <=> col("row_count")
        else lit(false)
      // a TRUNCATED envelope (StatsTrunc) is a valid bound but not an
      // exact extreme — metadata MIN/MAX must decline it like a
      // missing one
      val truncd =
        if (mcols.contains(s"trunc_$c")) col(s"trunc_$c") <=> lit(true)
        else lit(false)
      max(when((col(s"min_$c").isNull &&
        coalesce(col("row_count"), lit(1L)) =!= lit(0L) && !allNull) ||
        truncd,
        lit(1)).otherwise(lit(0))).as(s"_inc_$c")
    }
    val aggs = (coalesce(sum(col("row_count")), lit(0L)) - lit(dels))
      .as("n_rows") +: statsCols.flatMap(c =>
        Seq(out("min", c), out("max", c), incomplete(c)))
    val folded = mdf.agg(aggs.head, aggs.tail: _*)
    val outs = col("n_rows") +: statsCols.flatMap { c =>
      Seq("min", "max").map { pre =>
        val n = outName(pre, c)
        when(col(s"_inc_$c") === 1, lit(null)).otherwise(col(n)).as(n)
      }
    }
    folded.select(outs: _*)
  }

  /** Physical stats columns whose manifest envelope is INCOMPLETE at
    * `version`: some non-empty file records a NULL min (its dir
    * predates the column's stats). Pruning keeps such files (null =
    * unknown = probe), but a metadata-only MIN/MAX would silently
    * skip their values — callers answering aggregates from metadata
    * (connector agg pushdown) must decline these columns. One
    * manifest-sized aggregate. */
  private[graft] def incompleteEnvelopeCols(
      version: Long = currentVersion): Set[String] = {
    if (version == 0 || statsCols.isEmpty) Set.empty
    else {
      val mdf = manifest(version)
      val mcols = mdf.columns.toSet
      val aggs = statsCols.map { c =>
        // all-null files carry the stats-present marker
        // (nulls_c == row_count) — their null envelope is computed,
        // not missing (ADVICE r12)
        val allNull =
          if (mcols.contains(s"nulls_$c"))
            col(s"nulls_$c") <=> col("row_count")
          else lit(false)
        // truncated envelopes (StatsTrunc) are bounds, not extremes —
        // agg pushdown must decline them too
        val truncd =
          if (mcols.contains(s"trunc_$c"))
            col(s"trunc_$c") <=> lit(true)
          else lit(false)
        max(when((col(s"min_$c").isNull &&
          coalesce(col("row_count"), lit(1L)) =!= lit(0L) && !allNull)
          || truncd,
          lit(1)).otherwise(lit(0))).as(c)
      }
      val r = mdf.agg(aggs.head, aggs.tail: _*).head()
      statsCols.zipWithIndex.collect {
        case (c, i) if !r.isNullAt(i) && r.getInt(i) == 1 => c
      }.toSet
    }
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
      val d = cowSurvivors(parent, cond, numFiles)
      d.copy(added = Some(d.added match {
        case Some(a) => a.unionByName(replacement,
          allowMissingColumns = true)
        case None => replacement
      }))
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
      newSchema = Some(df.schema))(_ => AddRemove(added = Some(stats)))
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
      numFiles: Int = 4): Long =
    mergeImpl(updates, keyCols, numFiles, batchLedger = None)

  /** EXACTLY-ONCE streaming upsert: [[merge]] whose commit carries a
    * streaming batch id in the snapshot's applied-batch ledger — the
    * merge twin of [[appendIfAbsent]]. A `foreachBatch` that
    * delta-merges running totals is at-least-once under retries;
    * checking the ledger first (and in the same atomic commit as the
    * data) makes a replayed batch a no-op instead of double-adding
    * its deltas (VERDICT r14 #1: the curation mart's scale-safe
    * maintenance is read-current + add-delta + ledgered merge). */
  def mergeIfAbsent(updates: DataFrame, keyCols: Seq[String],
      batchId: Long, numFiles: Int = 4): Long = {
    if (appliedBatches.contains(batchId)) return currentVersion
    mergeImpl(updates, keyCols, numFiles, batchLedger = Some(batchId))
  }

  private def mergeImpl(updates: DataFrame, keyCols: Seq[String],
      numFiles: Int, batchLedger: Option[Long]): Long = {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{Attribute,
      AttributeReference, GenericInternalRow, Literal}
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    import org.apache.spark.sql.types._

    // MICRO-MERGE FAST PATH (r15 optimization): a merge whose update
    // frame is already DRIVER-LOCAL (a LocalRelation — the shape of
    // every ledgered streaming delta-merge and small totals upsert)
    // used to spend ~6 micro-jobs of pure fixed cost per commit
    // (key-envelope aggregate, manifest count, candidate collect, key
    // probe, survivor re-read, removal join — each ~0.1 s of
    // plan+schedule while touching a handful of rows; the curation
    // gates' ≤3-row mart merges profiled at 0.66 s/batch). This path
    // computes the key set, the stats envelope, the hit set and the
    // survivor rows on the driver, pays exactly ONE scan job (the
    // candidate-file read), and writes through writeData's existing
    // driver-local micro-append. Row algebra is identical to the
    // generic path below (same candidate pruning, same left-semi /
    // left-anti null semantics, same commit shape); big update frames,
    // evolved schemas, DV'd parents, float/decimal keys (whose java
    // equality differs from SQL join equality on -0.0/NaN),
    // bloom-indexed and scheme'd roots all keep the generic path —
    // re-checked per commit attempt, so a racing writer that evolves
    // the table mid-retry demotes the rebase to the generic path.
    val updLocal: Option[(Seq[Attribute], Seq[InternalRow])] =
      updates.queryExecution.optimizedPlan match {
        case lr: LocalRelation
            if lr.data.length <= GraftTable.MicroMergeRows &&
              !root.contains("://") && bloomCols.isEmpty &&
              keyCols.forall(k =>
                lr.output.count(_.name.equalsIgnoreCase(k)) == 1) =>
          Some((lr.output, lr.data))
        case _ => None
      }
    def microKeyOk(dt: DataType): Boolean = dt match {
      case StringType | LongType | IntegerType | ShortType | ByteType |
          BooleanType | DateType | TimestampType | TimestampNTZType =>
        true
      case _ => false
    }
    val cmp = new Ordering[Any] {
      def compare(a: Any, b: Any): Int =
        a.asInstanceOf[Comparable[Any]].compareTo(b)
    }

    def microDelta(parent: Long): Option[Delta] = updLocal.flatMap {
      case (outAttrs, updRows) =>
        val updKeyIdx = keyCols.map(k =>
          outAttrs.indexWhere(_.name.equalsIgnoreCase(k)))
        val keyTypes = updKeyIdx.map(outAttrs(_).dataType)
        val fc = fileCount(parent)
        if (parent == 0 || isEvolved(parent) ||
            hasDeletionVectors(parent) || fc < 0 ||
            !keyTypes.forall(microKeyOk)) None
        else {
          // driver-side distinct key set; a tuple holding a NULL can
          // never equi-join (three-valued equality), exactly like the
          // generic path's left-semi/left-anti
          def keyTuple(r: InternalRow, idx: Seq[Int]): Seq[Any] =
            idx.zip(keyTypes).map { case (i, dt) =>
              if (r.isNullAt(i)) null else r.get(i, dt) }
          val keySet: Set[Seq[Any]] = updRows.iterator
            .map(keyTuple(_, updKeyIdx))
            .filterNot(_.contains(null)).toSet
          lastAuditTotal = fc
          // stats envelope of the update keys, computed on the driver
          // rows (not evolved ⇒ physCol is identity)
          val statKeys = keyCols.filter(statsCols.contains)
          val candPred = statKeys.map { k =>
            val i = outAttrs.indexWhere(_.name.equalsIgnoreCase(k))
            val dt = outAttrs(i).dataType
            val vals = updRows.iterator
              .filterNot(_.isNullAt(i)).map(_.get(i, dt)).toSeq
            // all-NULL update keys ⇒ nothing can match ⇒ prune all
            if (vals.isEmpty) lit(false)
            else {
              val lo = org.apache.spark.sql.graft.ColumnBridge
                .column(Literal(vals.min(cmp), dt))
              val hi = org.apache.spark.sql.graft.ColumnBridge
                .column(Literal(vals.max(cmp), dt))
              col(s"min_$k").isNull || // null envelope: probe
                (col(s"min_$k") <= hi && col(s"max_$k") >= lo)
            }
          }.reduceOption(_ && _).getOrElse(lit(true))
          val m = manifest(parent)
          if (!m.columns.contains("row_count")) None
          else {
            // zero jobs when the manifest dirs are driver-cached
            // (ConvertToLocalRelation folds where+select); one job —
            // the same one the generic path pays — otherwise
            val cand = m.where(candPred)
              .select(col("path"), col("row_count")).collect()
            lastAuditScanned = cand.length.toLong
            if (cand.isEmpty)
              Some(AddRemove(added = Some(writeData(updates, numFiles))))
            else if (cand.exists(_.isNullAt(1)) ||
                cand.map(_.getLong(1)).sum >
                  GraftTable.MicroMergeScanRows) None
            else {
              // THE one scan job: candidate files, internal rows
              // (executeCollect — no lossy UTF-8 hop, ADVICE r13)
              val paths = cand.map(r => s"$root/${r.getString(0)}")
              val recLocal = GraftTable.localFrame(spark,
                withRowId(readRaw(paths.toIndexedSeq, parent)))
              recLocal.queryExecution.logical match {
                case rl: LocalRelation =>
                  val recAttrs = rl.output
                  val pathIdx = recAttrs.indexWhere(_.name == "_gt_path")
                  val dataIdx = recAttrs.zipWithIndex
                    .filterNot(_._1.name.startsWith("_gt_")).map(_._2)
                  val recKeyIdx = keyCols.map(k =>
                    recAttrs.indexWhere(_.name.equalsIgnoreCase(k)))
                  // schema compatibility with the update frame: same
                  // column-name set (case-insensitive), identical
                  // types — else the generic unionByName coercion
                  // rules apply and we fall back. Names must also be
                  // case-insensitively DISTINCT on both sides: this
                  // path matches by folded name, so a (caseSensitive
                  // = true) table carrying both "A" and "a" could
                  // otherwise map to the wrong column — such frames
                  // take the generic resolver instead.
                  def lc(s: String) = s.toLowerCase(java.util.Locale.ROOT)
                  val namesDistinct =
                    recAttrs.map(a => lc(a.name)).distinct.size ==
                      recAttrs.size &&
                    outAttrs.map(a => lc(a.name)).distinct.size ==
                      outAttrs.size
                  val updByName =
                    outAttrs.map(a => lc(a.name) -> a).toMap
                  val updProj: Seq[Option[Int]] = dataIdx.map { i =>
                    updByName.get(lc(recAttrs(i).name)) match {
                      case Some(a) if a.dataType == recAttrs(i).dataType =>
                        Some(outAttrs.indexOf(a))
                      case _ => None
                    }
                  }
                  if (!namesDistinct ||
                      dataIdx.size != outAttrs.size ||
                      updProj.exists(_.isEmpty) ||
                      recKeyIdx.exists(_ < 0) ||
                      recKeyIdx.zip(keyTypes).exists { case (i, dt) =>
                        recAttrs(i).dataType != dt }) None
                  else {
                    def pathOf(r: InternalRow): String =
                      r.getUTF8String(pathIdx).toString
                    val hits =
                      scala.collection.mutable.LinkedHashSet[String]()
                    rl.data.foreach { r =>
                      val t = keyTuple(r, recKeyIdx)
                      if (!t.contains(null) && keySet(t))
                        hits += pathOf(r)
                    }
                    if (hits.isEmpty)
                      Some(AddRemove(
                        added = Some(writeData(updates, numFiles))))
                    else {
                      // survivors in the FILE schema's column order
                      // (what the generic anti-join ∪ unionByName
                      // writes), update rows projected into it
                      val surv = Seq.newBuilder[InternalRow]
                      rl.data.foreach { r =>
                        if (hits.contains(pathOf(r))) {
                          val t = keyTuple(r, recKeyIdx)
                          if (t.contains(null) || !keySet(t))
                            surv += new GenericInternalRow(
                              dataIdx.map(i =>
                                r.get(i, recAttrs(i).dataType)).toArray)
                        }
                      }
                      updRows.foreach { r =>
                        surv += new GenericInternalRow(
                          updProj.map(_.get).map(i =>
                            r.get(i, outAttrs(i).dataType)).toArray)
                      }
                      val survAttrs = dataIdx.map(i =>
                        AttributeReference(recAttrs(i).name,
                          recAttrs(i).dataType, nullable = true)())
                      val survDf = org.apache.spark.sql.graft
                        .ColumnBridge.ofRows(spark,
                          LocalRelation(survAttrs, surv.result()))
                      Some(AddRemove(
                        added = Some(writeData(survDf, numFiles)),
                        removedPaths = hits.toSeq))
                    }
                  }
                case _ => None
              }
            }
          }
        }
    }

    // generic-path inputs, LAZY: when every attempt takes the micro
    // path, neither job below runs
    lazy val keyed = updates.select(keyCols.map(col): _*).distinct()
    // Envelope of the update keys on stats-carrying key columns — ONE
    // small aggregate over the update side, then the key probe reads
    // only manifest files whose [min,max] intersects it. A range-local
    // merge (the incremental-upsert shape) therefore probes O(touched
    // window) files, never O(table). NULL update keys never join
    // (three-valued equality), so null-ignoring min/max stay sound.
    lazy val statKeys =
      keyCols.filter(k => statsCols.contains(physCol(k, currentVersion)))
    lazy val keyBounds: Map[String, (Any, Any)] =
      if (statKeys.isEmpty) Map.empty
      else {
        val aggs = statKeys.flatMap(k =>
          Seq(min(col(k)).as(s"lo_$k"), max(col(k)).as(s"hi_$k")))
        val r = keyed.agg(aggs.head, aggs.tail: _*).head()
        statKeys.zipWithIndex.map { case (k, i) =>
          k -> ((r.get(2 * i), r.get(2 * i + 1)))
        }.toMap
      }
    def genericDelta(parent: Long): Delta = {
      val all = manifest(parent)
      val fc = fileCount(parent)
      // entry count rides the snapshot record — no manifest count job
      // (legacy refs without per-dir counts keep the count)
      lastAuditTotal = if (fc >= 0) fc else all.count()
      val candPred = statKeys.map { k =>
        val (lo, hi) = keyBounds(k)
        val p = physCol(k, parent)
        // all-NULL update keys ⇒ nothing can match ⇒ prune every file
        if (lo == null) lit(false)
        else col(s"min_$p").isNull || // null envelope = unknown: probe
          (col(s"min_$p") <= lit(hi) && col(s"max_$p") >= lit(lo))
      }.reduceOption(_ && _).getOrElse(lit(true))
      val candidates = all.where(candPred)
        .select("path").as[String].collect()
      lastAuditScanned = candidates.length.toLong
      if (candidates.isEmpty) {
        // no live file can hold a matched key: pure insert
        AddRemove(added = Some(writeData(updates, numFiles)))
      } else {
        // `_gt_path` rides the scan project (the `_metadata` column is
        // join-safe, unlike input_file_name()); the probe sees only
        // LIVE rows — a row in the parent's deletion vector can't pin
        // its file into the rewrite set or resurrect through it
        val current = reconcile(minusDv(withRowId(readRaw(
          candidates.map(p => s"$root/$p").toSeq, parent)), parent),
          parent)
        val hits = current
          .join(keyed, keyCols, "left_semi")
          .groupBy(col("_gt_path"))
          .agg(count(lit(1)).as("hits"))
          .collect().map(_.getString(0)).toSet
        val touchedPaths = hits.toSeq.map(rel => s"$root/$rel")
        val survivors =
          if (touchedPaths.isEmpty) updates
          else {
            val rec = reconcile(minusDv(withRowId(
              readRaw(touchedPaths, parent)), parent), parent)
            val dataCols = rec.columns.toIndexedSeq
              .filterNot(_.startsWith("_gt_"))
            rec.select(dataCols.map(col): _*)
              .join(keyed, keyCols, "left_anti")
              .unionByName(updates)
          }
        AddRemove(added = Some(writeData(survivors, numFiles)),
          removedPaths = hits.toSeq)
      }
    }
    commitWithRetry("merge", batchLedger = batchLedger,
        newSchema = Some(updates.schema)) { parent =>
      microDelta(parent).getOrElse(genericDelta(parent))
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
    val statKeys =
      keyCols.filter(k => statsCols.contains(physCol(k, currentVersion)))
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
      // recorded so the change feed can split this commit's events
      // into update_preimage/update_postimage vs genuine inserts
      extraKvs = Seq(s"merge_keys=${keyCols.mkString(",")}"),
      extraDv = Some { parent =>
        val all = manifest(parent)
        val fc = fileCount(parent)
        // entry count rides the snapshot record — no manifest count
        // job (legacy refs without per-dir counts keep the count)
        lastAuditTotal = if (fc >= 0) fc else all.count()
        val candPred = statKeys.map { k =>
          val (lo, hi) = keyBounds(k)
          val p = physCol(k, parent)
          if (lo == null) lit(false)
          else col(s"min_$p").isNull || // null envelope = unknown: probe
            (col(s"min_$p") <= lit(hi) && col(s"max_$p") >= lit(lo))
        }.reduceOption(_ && _).getOrElse(lit(true))
        val candidates = all.where(candPred)
          .select("path").as[String].collect()
        lastAuditScanned = candidates.length.toLong
        if (candidates.isEmpty) emptyDv
        else reconcile(minusDv(withRowId(readRaw(
            candidates.map(p => s"$root/$p").toSeq, parent)), parent),
            parent)
          .join(keyed, keyCols, "left_semi")
          .select(col("_gt_path").as("path"), col("_gt_pos").as("pos"))
      })(_ => AddRemove(added = Some(newFiles)))
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
      AddRemove(added = Some(newEntries), removedPaths = removed)
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
      if (parent == 0 && newEntries.isEmpty)
        sys.error(s"$op on an empty table")
      AddRemove(added = newEntries)
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
      newSchema = newSchema)(_ => AddRemove(added = Some(newEntries)))

  /** ALTER TABLE ADD COLUMN: one content-preserving snapshot whose
    * recorded schema unions the new columns — no data file moves, and
    * every pre-existing file surfaces the new columns as null (the
    * schema-evolution contract reads already honor). */
  def addColumns(cols: org.apache.spark.sql.types.StructType): Long =
    commitWithRetry("alter", newSchema = Some(cols)) { parent =>
      if (parent == 0) sys.error(
        "addColumns on an empty table: declare the schema at CREATE")
      AddRemove() // metadata-only: the manifest list carries by reference
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
    require(logStore.exists(s"${logDir(root)}/snapshot-v$version.txt"),
      s"restore: snapshot v$version has been vacuumed")
    commitWithRetry("restore", newSchema = recordedSchema(version),
      // the restored version's DV delta dirs come back BY REFERENCE —
      // zero DV rows written, deletions that postdate the target drop
      dvReplace = true, extraDvList = Some(version),
      // evolution state reverts with the content it describes
      evolvedOverride = Some(isEvolved(version)),
      deadColsOverride = Some(snapshot(version).deadCols))(
      // METADATA-ONLY restated at the list level: the restored
      // version's manifest dirs come back BY REFERENCE — zero
      // manifest rows written regardless of table size
      _ => UseList(version))
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
      ReplaceAll( // compaction also folds the manifest list to one dir
        if (clusterBy.isEmpty) writeData(read(parent), numFiles)
        else {
          val cs = clusterBy.map(col)
          writeData(read(parent)
            .repartitionByRange(math.max(numFiles, 1), cs: _*)
            .sortWithinPartitions(cs: _*), numFiles = 0)
        })
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
      if (paths.isEmpty) AddRemove() // raced: debt was compacted away
      else rewriteSlice(parent, paths, numFiles, clusterBy)
    }
  }

  /** SIZE-TARGETED incremental compaction (Delta OPTIMIZE's
    * contract, expressible now that manifests record `size_bytes`):
    * fold live files smaller than `smallBytes` into outputs of
    * ~`targetBytes` each, auto-sizing the output count from the
    * candidates' RECORDED bytes instead of asking the caller to guess
    * `numFiles`. Entries that predate size recording (null
    * `size_bytes`) are candidates too — folding them is exactly how a
    * legacy table acquires sized, split-planable files — and are
    * charged the mean known candidate size (or `smallBytes/2` when no
    * size is known) for output sizing. Carried files, DV handling and
    * the `data_change=0` commit kind are [[compactSmall]]'s. */
  def compactToSize(smallBytes: Long = 32L << 20,
      targetBytes: Long = 128L << 20,
      clusterBy: Seq[String] = Nil): Long = {
    require(smallBytes > 0 && targetBytes > 0,
      "compactToSize: byte thresholds must be positive")
    val parent0 = currentVersion
    if (parent0 == 0) return 0L
    def cands(v: Long): Array[(String, Long)] = {
      val m = manifest(v)
      val sz =
        if (m.columns.contains("size_bytes")) col("size_bytes")
        else lit(null).cast("bigint")
      m.select(col("path"), sz.as("sz"))
        .where(col("sz").isNull || col("sz") < smallBytes)
        .collect()
        .map(r => (r.getString(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    }
    val minFold = if (clusterBy.isEmpty) 2 else 1
    if (cands(parent0).length < minFold) return parent0
    commitWithRetry("compact_to_size") { parent =>
      val cs = cands(parent)
      if (cs.length < minFold) AddRemove() // raced: debt folded away
      else {
        val known = cs.collect { case (_, s) if s >= 0 => s }
        val meanKnown =
          if (known.isEmpty) smallBytes / 2
          else known.sum / known.length
        val totalBytes = cs.map { case (_, s) =>
          if (s >= 0) s else meanKnown }.sum
        val nOut = math.max(1L,
          (totalBytes + targetBytes - 1L) / targetBytes).toInt
        rewriteSlice(parent, cs.map(_._1), nOut, clusterBy)
      }
    }
  }

  /** Shared slice-rewrite for the incremental compactors: read ONLY
    * `paths` (evolved tables via explicit physical schema — mergeSchema
    * refuses the int-vs-long merges widening creates), drop DV'd rows,
    * restore logical names, optionally re-cluster for zone-map
    * locality, and stage the AddRemove delta. */
  private def rewriteSlice(parent: Long, paths: Array[String],
      numFiles: Int, clusterBy: Seq[String]): Delta = {
    val raw =
      if (isEvolved(parent))
        readRaw(paths.toIndexedSeq.map(p => s"$root/$p"), parent)
      else spark.read.option("mergeSchema", "true")
        .parquet(paths.toIndexedSeq.map(p => s"$root/$p"): _*)
    val rec = reconcile(minusDv(withRowId(raw), parent), parent)
    val dataCols = rec.columns.toIndexedSeq
      .filterNot(_.startsWith("_gt_"))
    val live = rec.select(dataCols.map(col): _*)
    val staged =
      if (clusterBy.isEmpty) live
      else live
        .repartitionByRange(math.max(numFiles, 1),
          clusterBy.map(col): _*)
        .sortWithinPartitions(clusterBy.map(col): _*)
    AddRemove(
      added = Some(
        writeData(staged, if (clusterBy.isEmpty) numFiles else 0)),
      removedPaths = paths.toSeq)
  }

  /** Predicate-scoped incremental compaction (Delta's `OPTIMIZE …
    * WHERE`): fold file debt ONLY in the table slice whose stats
    * envelope can intersect `cond` — at 100 TB maintenance is always
    * windowed (yesterday's ingest range, one tenant, one key band),
    * never a table-wide rewrite. Candidates are the stats-intersecting
    * files with `row_count < maxRows` (the default takes every
    * intersecting file); every other file carries by reference with
    * zero IO. The rewrite keeps ALL rows of the candidate files
    * (compaction preserves content; `cond` only SELECTS files), drops
    * their DV'd rows like [[compactSmall]], and commits as
    * `data_change=0`, so a CDC window over it emits nothing.
    * Zero-IO no-op (current version, no commit) when the slice holds
    * nothing to fold. */
  def compactWhere(cond: Column, maxRows: Long = Long.MaxValue,
      numFiles: Int = 1, clusterBy: Seq[String] = Nil): Long = {
    val parent0 = currentVersion
    if (parent0 == 0) return 0L
    def cands(v: Long): Array[String] =
      manifest(v).where(statsKeep(cond, v) &&
        col("row_count") < maxRows)
        .select("path").collect().map(_.getString(0))
    // a single un-clustered candidate folds into itself: skip
    val minFold = if (clusterBy.isEmpty) 2 else 1
    if (cands(parent0).length < minFold) return parent0
    commitWithRetry("compact_where") { parent =>
      val paths = cands(parent)
      if (paths.length < minFold) AddRemove() // raced away
      else rewriteSlice(parent, paths, numFiles, clusterBy)
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
    require(
      cols.forall(c => statsCols.contains(physCol(c, currentVersion))),
      s"z-order columns must carry stats: $statsCols")
    commitWithRetry("zorder") { parent =>
      val staged = graft.etl.ZOrder.zValueN(read(parent), cols)
        .repartitionByRange(numFiles, col("_z"))
        .sortWithinPartitions(col("_z"))
        .drop("_z")
      ReplaceAll(writeData(staged, numFiles = 0))
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
  private def writeData(df: DataFrame, numFiles: Int,
      translate: Boolean = true): DataFrame = {
    val commitDir = s"data/c${java.util.UUID.randomUUID.toString.take(8)}"
    // logical→physical rename on evolved tables (identity otherwise):
    // files always carry physical names, reads always map back
    val phys = if (translate) toPhysical(df) else df
    // staged is DEFERRED (lazy): the micro-append path never builds
    // the repartitioned frame, so a one-row commit pays ONE Catalyst
    // analysis (phys), not two
    lazy val staged = if (numFiles > 0) phys.repartition(numFiles) else phys
    // ONE-PASS WRITE: all-scalar schemas ride the connector's
    // map-side-stats writer (graft.sources.GraftDataWriter) — per-file
    // row counts and min/max envelopes are tracked DURING the write
    // and come back in commit messages, so the commit never re-reads
    // what it just wrote (the two-pass fallback below re-scans every
    // written byte for one stats aggregate — 2× write-path IO at
    // 100 TB). Bloom-indexed tables keep the fallback: bloom width is
    // auto-sized from actual rows-per-file, which a streaming writer
    // cannot know up front. Scheme'd roots (s3a:/hdfs:) also fall
    // back — the Group writer resolves paths through a bare local
    // Hadoop conf, like the rest of the connector write path.
    val schema = phys.schema // == staged.schema (repartition preserves)
    val onePass = bloomCols.isEmpty && !root.contains("://") &&
      statsCols.forall(c => schema.fieldNames.contains(c) &&
        graft.sources.GraftParquetIO.supportedScalar(schema(c).dataType))
    if (onePass) {
      // DRIVER-LOCAL MICRO-APPEND: rows that already live on the
      // driver (a LocalRelation after optimization — literal batches,
      // collected ledgers) skip Spark entirely: one GraftDataWriter
      // writes one file and the commit costs ZERO jobs. The profiler
      // pinned ~85 ms/commit of pure job overhead (plan + 2-stage
      // shuffle of one row) on the previous path; a one-row append is
      // driver IO and should cost like it.
      phys.queryExecution.optimizedPlan match {
        case lr: org.apache.spark.sql.catalyst.plans.logical
            .LocalRelation if numFiles == 1 && lr.data.length <= 16384 =>
          val mSchema = org.apache.spark.sql.types.StructType(lr.output
            .map(a => org.apache.spark.sql.types.StructField(
              a.name, a.dataType, a.nullable)))
          val w = new graft.sources.GraftDataWriter(
            root, commitDir, mSchema, statsCols, 0, 0L)
          val msg = CommitProfile.time("data_local") {
            try { lr.data.foreach(w.write); w.commit() }
            catch { case e: Throwable => w.abort(); throw e }
          }
          return graft.sources.GraftParquetIO.manifestEntries(
            spark, root, Array(msg), mSchema, statsCols)
        case _ => ()
      }
      val (rootL, cd, schemaJson, sc) =
        (root, commitDir, schema.json, statsCols)
      val msgs = CommitProfile.time("data_job")(
        staged.queryExecution.toRdd.mapPartitions { iter =>
        if (iter.isEmpty) Iterator.empty
        else {
          val tc = org.apache.spark.TaskContext.get()
          val w = new graft.sources.GraftDataWriter(rootL, cd,
            org.apache.spark.sql.types.DataType.fromJson(schemaJson)
              .asInstanceOf[org.apache.spark.sql.types.StructType],
            sc, tc.partitionId(), tc.taskAttemptId())
          try { iter.foreach(w.write); Iterator.single(w.commit()) }
          catch { case e: Throwable => w.abort(); throw e }
        }
      }.collect())
      return graft.sources.GraftParquetIO.manifestEntries(
        spark, root, msgs.toArray, schema, statsCols)
    }
    staged.write.parquet(s"$root/$commitDir")
    // the files' schema is exactly what we just wrote — declaring it
    // skips footer-driven schema inference (one fewer job per commit)
    val nFiles = math.max(1, logStore.list(s"$root/$commitDir")
      .count(_.name.endsWith(".parquet")))
    val written = spark.read
      .schema(org.apache.spark.sql.types.StructType(
        staged.schema.fields.map(_.copy(nullable = true))))
      .parquet(s"$root/$commitDir")
    // bloom indexes ride the same single aggregate as min/max; a
    // bloom column the incoming frame doesn't carry (schema
    // evolution) records null = "might contain anything"
    val present = written.columns.toSet
    // SIZING GUARDRAIL (VERDICT r10 #8): a fixed-width bloom saturates
    // once a file holds more distinct values than ~bits/10 (every bit
    // set → keeps everything, silently useless). Derive the width from
    // this write's actual rows-per-file at ~10 bits/value (≈1% fpp at
    // K=5), never below the declared width — and it is SAFE for files
    // to differ in width, because the probe reads each file's m off
    // `size(bloom)` (mightContain). One metadata-only count job.
    val effBloomBits: Int =
      if (bloomCols.isEmpty) bloomBits
      else {
        // row count off the parquet FOOTERS for small commits (driver
        // metadata reads, no Spark job); a big rewrite amortizes the
        // count job so it keeps the scan-side counter
        val nRows =
          if (nFiles <= GraftTable.SmallCommitFiles)
            footerRowCount(s"$root/$commitDir")
          else written.count()
        val perFile = math.max(1L, nRows / nFiles)
        val target = java.lang.Long.highestOneBit(
          math.max(1L, 10L * perFile - 1L)) * 2L
        math.max(bloomBits.toLong,
          math.min(target, 1L << 23)).toInt // cap: 1 MiB/file/col
      }
    val aggs = (count(lit(1)).as("row_count") +:
      statsCols.flatMap(c => Seq(
        min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"),
        // stats-present marker: null envelope + nulls==row_count
        // reads as "all-null file", never "predates stats"
        (count(lit(1)) - count(col(c))).as(s"nulls_$c")))) ++
      bloomCols.map(c =>
        (if (present(c))
          graft.functions.BloomFilterIndex.buildAgg(col(c), effBloomBits)
        else first(lit(null).cast("array<bigint>"))).as(s"bloom_$c"))
    val entries0 = written.groupBy(input_file_name().as("path"))
      .agg(aggs.head, aggs.tail: _*)
      // URI → root-relative path, as a codegen'd builtin (no UDF)
      .withColumn("path",
        regexp_extract(col("path"), "(data/c[^/]+/[^/]+)$", 1))
    // file sizes off the SAME commit-dir listing nFiles already paid
    // for (driver, delta-sized): recorded as manifest `size_bytes`,
    // which scan planning bin-packs partitions by and the CBO sums
    // for post-prune sizeInBytes
    val sizeRows = logStore.list(s"$root/$commitDir")
      .filter(e => !e.isDir && e.name.endsWith(".parquet") &&
        e.sizeBytes >= 0L)
      .map(e => org.apache.spark.sql.Row(
        s"$commitDir/${e.name}", e.sizeBytes))
    val entries =
      if (sizeRows.isEmpty) entries0
      else entries0.join(
        broadcast(spark.createDataFrame(
          java.util.Arrays.asList(sizeRows: _*),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("path",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("size_bytes",
              org.apache.spark.sql.types.LongType))))),
        Seq("path"), "left")
    // Bounded string/binary envelopes for the two-pass path — the
    // same [[StatsTrunc]] contract the one-pass writer applies at
    // commit: min → code-point prefix, max → prefix with last code
    // point incremented, `trunc_<c>` marks the envelope inexact.
    // Entry-count-sized work (one UDF pass over manifest rows, never
    // data rows).
    val truncCols = statsCols.filter(c =>
      staged.schema.fieldNames.contains(c) &&
        (staged.schema(c).dataType ==
          org.apache.spark.sql.types.StringType ||
         staged.schema(c).dataType ==
          org.apache.spark.sql.types.BinaryType))
    val entriesT = truncCols.foldLeft(entries) { (d, c) =>
      staged.schema(c).dataType match {
        case org.apache.spark.sql.types.StringType =>
          // byte-level through a binary cast: a String-typed UDF
          // would decode the UTF8String through java.lang.String,
          // silently replacing invalid UTF-8 with U+FFFD BEFORE
          // StatsTrunc runs — the stored envelope could then exclude
          // the true extreme and pruning would skip live files
          // (ADVICE r13). string↔binary casts and the manifest
          // parquet round-trip are all byte-exact.
          val fMin = udf((b: Array[Byte]) => if (b == null) null else
            StatsTrunc.minUtf8(UTF8String.fromBytes(b))._1.getBytes)
          val fMax = udf((b: Array[Byte]) => if (b == null) null else
            StatsTrunc.maxUtf8(UTF8String.fromBytes(b))._1.getBytes)
          val fFlag = udf((mn: Array[Byte], mx: Array[Byte]) =>
            (mn != null &&
              StatsTrunc.minUtf8(UTF8String.fromBytes(mn))._2) ||
            (mx != null &&
              StatsTrunc.maxUtf8(UTF8String.fromBytes(mx))._2))
          val binT = org.apache.spark.sql.types.BinaryType
          val strT = org.apache.spark.sql.types.StringType
          d.withColumn(s"trunc_$c",
              fFlag(col(s"min_$c").cast(binT),
                col(s"max_$c").cast(binT)))
            .withColumn(s"min_$c",
              fMin(col(s"min_$c").cast(binT)).cast(strT))
            .withColumn(s"max_$c",
              fMax(col(s"max_$c").cast(binT)).cast(strT))
        case _ =>
          val fMin = udf((b: Array[Byte]) =>
            if (b == null) null else StatsTrunc.minBin(b)._1)
          val fMax = udf((b: Array[Byte]) =>
            if (b == null) null else StatsTrunc.maxBin(b)._1)
          val fFlag = udf((mn: Array[Byte], mx: Array[Byte]) =>
            (mn != null && StatsTrunc.minBin(mn)._2) ||
              (mx != null && StatsTrunc.maxBin(mx)._2))
          d.withColumn(s"trunc_$c",
              fFlag(col(s"min_$c"), col(s"max_$c")))
            .withColumn(s"min_$c", fMin(col(s"min_$c")))
            .withColumn(s"max_$c", fMax(col(s"max_$c")))
      }
    }
    // SMALL-COMMIT FAST PATH: a few-file delta's entry rows fit on the
    // driver (bounded below by file count × bloom width), so collect
    // them into a LocalRelation — the manifest write becomes one local
    // single-task job, its counts become driver math instead of a
    // read-back job, and a commit-race retry re-stages for free
    // instead of re-running the stats aggregate.
    val bloomBytes =
      nFiles.toLong * bloomCols.size * (effBloomBits.toLong / 8L)
    if (nFiles <= GraftTable.SmallCommitFiles &&
        bloomBytes <= 64L * 1024 * 1024) {
      // collect INTERNAL rows: an external collect() decodes string
      // stats through java.lang.String, silently replacing invalid
      // UTF-8 with U+FFFD — the re-encoded envelope could then
      // exclude the true extreme and pruning would skip live files
      // (ADVICE r13)
      GraftTable.localFrame(spark, entriesT)
    } else entriesT
  }

  /** Sum of the parquet footers' row counts under `dir` — driver-side
    * metadata reads (one small footer per file), no Spark job. */
  private def footerRowCount(dir: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    logStore.list(dir).filter(_.name.endsWith(".parquet")).map { e =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(s"$dir/${e.name}"), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getRecordCount finally r.close()
    }.sum
  }

  /** What a commit CHANGES, not the manifest it results in — the
    * contract that makes commit metadata O(delta). [[AddRemove]]
    * drops `removedPaths` and adds `added`'s entries onto the
    * parent's manifest list: untouched dirs carry by reference, only
    * dirs listing a removed path are rewritten (merged into one), and
    * the added entries become one new delta dir. [[ReplaceAll]]
    * (overwrite/compact/zorder) starts a fresh one-dir list.
    * [[UseList]] (restore) re-points at an older version's dirs with
    * zero manifest IO. */
  private sealed trait Delta
  private case class AddRemove(added: Option[DataFrame] = None,
      removedPaths: Seq[String] = Nil) extends Delta
  private case class ReplaceAll(entries: DataFrame) extends Delta
  private case class UseList(version: Long) extends Delta

  /** Write `entries` as one immutable manifest dir for version `next`
    * (bloom columns this writer can't compute null-fill = "might
    * contain anything"; blooms the entries carry from rewritten dirs
    * are kept even if this instance didn't declare them) and return
    * its ref with exact entry/row counts — ONE delta-sized aggregate. */
  private def writeManifestDir(entries: DataFrame, next: Long)
      : ManifestRef = CommitProfile.time("manifest_write") {
    val dir =
      s"manifest-v${next}_${java.util.UUID.randomUUID.toString.take(8)}"
    // MICRO-COMMIT FAST PATH: entries straight from a driver-local
    // manifestEntries call arrive as a LocalRelation already in this
    // writer's exact column layout — write its rows directly and skip
    // the select + a full analyzer/optimizer pass (~20 ms/commit the
    // profiler attributed to re-analysis of a frame we just built)
    entries.queryExecution.logical match {
      case lr: org.apache.spark.sql.catalyst.plans.logical.LocalRelation
          if !root.contains("://") && lr.data.length <= 1024 && {
            val names = lr.output.map(_.name)
            val want = ("path" +: "row_count" +: "size_bytes" +:
              (statsCols.flatMap(c =>
                Seq(s"min_$c", s"max_$c", s"nulls_$c", s"trunc_$c")) ++
                bloomCols.map(c => s"bloom_$c")))
            // every declared bloom col must be present (the slow path
            // null-fills missing ones so reads can resolve them)
            bloomCols.forall(c => names.contains(s"bloom_$c")) &&
            names == want.filter(names.toSet)
          } =>
        val mSchema = org.apache.spark.sql.types.StructType(lr.output
          .map(a => org.apache.spark.sql.types.StructField(
            a.name, a.dataType, a.nullable)))
        val w = new graft.sources.GraftDataWriter(
          logDir(root), dir, mSchema, Nil, 0, 0L)
        try { lr.data.foreach(w.write); w.commit() }
        catch { case e: Throwable => w.abort(); throw e }
        // remember the rows: a future FOLD over this (immutable) dir
        // can then run entirely on the driver (see foldInput)
        GraftTable.cacheManifestRows(root, dir, mSchema, lr.data)
        val rcIdx = lr.output.indexWhere(_.name == "row_count")
        val sbIdx = lr.output.indexWhere(_.name == "size_bytes")
        val tIdx = lr.output.zipWithIndex.collect {
          case (a, i) if a.name.startsWith("trunc_") => i }
        return ManifestRef(dir, lr.data.length.toLong,
          lr.data.map(_.getLong(rcIdx)).sum,
          trunc = lr.data.exists(r => tIdx.exists(i =>
            !r.isNullAt(i) && r.getBoolean(i))),
          truncKnown = true,
          bytes = if (sbIdx < 0) -1L
            else lr.data.map(r =>
              if (r.isNullAt(sbIdx)) 0L else r.getLong(sbIdx)).sum)
      case _ => ()
    }
    val present = entries.columns.toSet
    val withBlooms = bloomCols.foldLeft(entries) { (d, c) =>
      if (present(s"bloom_$c")) d
      else d.withColumn(s"bloom_$c", lit(null).cast("array<bigint>"))
    }
    val bloomKept = (bloomCols.map(c => s"bloom_$c") ++
      entries.columns.filter(_.startsWith("bloom_"))).distinct
    // stats columns ABSENT from these entries (a rewrite/fold over
    // dirs that predate a later-declared stats column) are simply not
    // written for this dir — manifest()'s unionByName null-fills them
    // and the null-safe envelope tests keep such files. Selecting an
    // unresolvable min_<c> would abort the commit instead.
    val cols = ("path" +: "row_count" +: "size_bytes" +:
      (statsCols.flatMap(c =>
        Seq(s"min_$c", s"max_$c", s"nulls_$c", s"trunc_$c")) ++
        bloomKept))
      .filter(c => (present(c) || c.startsWith("bloom_") ||
        c == "path" || c == "row_count") &&
        // entries that predate size/trunc recording simply omit the
        // column (manifest() null-fills; readers treat null as
        // unknown size / not-truncated)
        !((c == "size_bytes" || c.startsWith("trunc_")) && !present(c)))
    val finalDf = withBlooms.select(cols.map(col): _*)
    finalDf.queryExecution.optimizedPlan match {
      // writeData's small-commit fast path hands us a LocalRelation
      // (projections over it collapse via ConvertToLocalRelation):
      // write it as one local single-task file and take the exact
      // counts off the driver rows — no read-back aggregate job
      case lr: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        val mSchema = org.apache.spark.sql.types.StructType(lr.output
          .map(a => org.apache.spark.sql.types.StructField(
            a.name, a.dataType, a.nullable)))
        if (!root.contains("://")) {
          // stream the delta-sized manifest rows through Spark's
          // parquet WriteSupport ON THE DRIVER (bloom array columns
          // included) — the manifest write costs zero Spark jobs (an
          // append's only job is then the data write itself)
          val w = new graft.sources.GraftDataWriter(
            logDir(root), dir, mSchema, Nil, 0, 0L)
          try { lr.data.foreach(w.write); w.commit() }
          catch { case e: Throwable => w.abort(); throw e }
          // cache the rows like the micro-commit path above: fold
          // output dirs must stay cache-resident or one fold evicts
          // the whole table from manifest()'s zero-job fast path
          GraftTable.cacheManifestRows(root, dir, mSchema, lr.data)
        } else finalDf.coalesce(1).write.parquet(s"${logDir(root)}/$dir")
        val rcIdx = lr.output.indexWhere(_.name == "row_count")
        val sbIdx = lr.output.indexWhere(_.name == "size_bytes")
        val tIdx = lr.output.zipWithIndex.collect {
          case (a, i) if a.name.startsWith("trunc_") => i }
        ManifestRef(dir, lr.data.length.toLong,
          lr.data.map(_.getLong(rcIdx)).sum,
          trunc = lr.data.exists(r => tIdx.exists(i =>
            !r.isNullAt(i) && r.getBoolean(i))),
          truncKnown = true,
          bytes = if (sbIdx < 0) -1L
            else lr.data.map(r =>
              if (r.isNullAt(sbIdx)) 0L else r.getLong(sbIdx)).sum)
      case _ =>
        finalDf.write.parquet(s"${logDir(root)}/$dir")
        val truncCols = finalDf.columns.filter(_.startsWith("trunc_"))
        val truncAgg: Column =
          if (truncCols.isEmpty) max(lit(0))
          else max(when(truncCols.map(c => col(c) <=> lit(true))
            .reduce(_ || _), 1).otherwise(0))
        val hasBytes = finalDf.columns.contains("size_bytes")
        val bytesAgg: Column =
          if (hasBytes) coalesce(sum(col("size_bytes")), lit(0L))
          else max(lit(-1L))
        val t = readManifestDir(dir)
          .agg(count(lit(1)), coalesce(sum(col("row_count")), lit(0L)),
            truncAgg, bytesAgg)
          .head()
        ManifestRef(dir, t.getLong(0), t.getLong(1),
          trunc = !t.isNullAt(2) && t.getInt(2) == 1,
          truncKnown = true,
          bytes = if (!hasBytes || t.isNullAt(3)) -1L else t.getLong(3))
    }
  }

  /** Counts for a legacy single-dir ref (pre-list snapshots store no
    * per-dir counts) — resolved once, then carried in new commits. */
  private def ensureCounts(r: ManifestRef): ManifestRef =
    if (r.entries >= 0) r
    else {
      val t = readManifestDir(r.dir)
        .agg(count(lit(1)), coalesce(sum(col("row_count")), lit(0L)))
        .head()
      ManifestRef(r.dir, t.getLong(0), t.getLong(1),
        r.trunc, r.truncKnown)
    }

  private def unionRefs(refs: Seq[ManifestRef]): DataFrame =
    refs.map(r => readManifestDir(r.dir))
      .reduce(_.unionByName(_, allowMissingColumns = true))

  /** Fold input, sized to its job: a SMALL fold (the common case —
    * the delta tail small appends accrete) avoids the distributed
    * union. Best case, every input dir was written driver-locally by
    * THIS process (micro-commits) and its rows are still in the
    * manifest-rows cache — the fold is then pure driver work, ZERO
    * Spark jobs (manifest dirs are immutable once written, so the
    * cache can never be stale; vacuum invalidates the root). Next
    * best, one mergeSchema scan collects all dirs (schema inference
    * once, not per dir) so [[writeManifestDir]] still takes its
    * driver-local path. The profiler attributed ~1.3 s per fold to
    * the per-dir reads + write job + count job these replace. Big
    * folds keep the distributed union. */
  private def foldInput(refs: Seq[ManifestRef]): DataFrame = {
    val counted = refs.forall(_.entries >= 0)
    val total = refs.map(_.entries).sum
    if (!counted || total > 10000L)
      return unionRefs(refs)
    val cached = refs.map(r => GraftTable.manifestRows(root, r.dir))
    if (cached.forall(_.isDefined) &&
        cached.flatMap(_.map(_._1)).distinct.size == 1) {
      val schema = cached.head.get._1
      val attrs = schema.map(f =>
        org.apache.spark.sql.catalyst.expressions.AttributeReference(
          f.name, f.dataType, f.nullable)())
      return org.apache.spark.sql.graft.ColumnBridge.ofRows(spark,
        org.apache.spark.sql.catalyst.plans.logical.LocalRelation(
          attrs, cached.flatMap(_.get._2)))
    }
    val u = spark.read.option("mergeSchema", "true")
      .parquet(refs.map(r => s"${logDir(root)}/${r.dir}"): _*)
    // internal rows — see the small-commit fast path: a java-String
    // hop would corrupt invalid-UTF-8 stats envelopes (ADVICE r13)
    GraftTable.localFrame(spark, u)
  }

  /** The single commit point: build the new manifest off the CURRENT
    * parent, write it, then atomically create `snapshot-v<N>.txt` —
    * put-if-absent. A loser rebuilds against the winner's version and
    * tries N+1; its already-written data files are reused as-is. */
  /** Test hook: invoked after data + manifest are written, immediately
    * before the atomic snapshot create — lets GraftTableSpec inject a
    * writer crash mid-commit and prove readers/vacuum behavior. */
  @volatile private[graft] var beforeSnapshotCreate: () => Unit = () => ()

  /** Log-layer storage (snapshot/tag records, vacuum walks) — scheme-
    * dispatched: plain local paths stay on [[PosixLogStore]], `s3a:`/
    * `hdfs:`/`file:` roots go through the Hadoop [[HadoopLogStore]].
    * Swappable per table for tests. */
  @volatile private[graft] var logStore: LogStore =
    LogStore.forRoot(root)

  /** The storage commit primitive — swap for an object-store
    * conditional-PUT implementation (see [[CommitIO]]); specs inject
    * contention through it. Defaults to the log store itself. */
  @volatile private[graft] var commitIO: CommitIO = logStore match {
    case c: CommitIO => c
    case _ => PosixCommitIO
  }

  /** Atomic create of a log record named `name`, through whichever
    * seam is installed: an injected [[LogStore]] takes the scheme-
    * capable string path; a bare [[CommitIO]] (spec fakes) keeps its
    * original `java.nio.file.Path` signature. */
  private def putLogIfAbsent(name: String,
      content: Array[Byte]): Boolean = commitIO match {
    case ls: LogStore => ls.putIfAbsent(s"${logDir(root)}/$name", content)
    case c => c.putIfAbsent(
      java.nio.file.Paths.get(logDir(root), name), content)
  }

  private def commitWithRetry(op: String,
      batchLedger: Option[Long] = None,
      newSchema: Option[org.apache.spark.sql.types.StructType] = None,
      extraDv: Option[Long => DataFrame] = None,
      dvReplace: Boolean = false,
      extraDvList: Option[Long] = None,
      schemaReplace: Boolean = false,
      evolvedOverride: Option[Boolean] = None,
      deadColsOverride: Option[Set[String]] = None,
      addDeadCols: Set[String] = Set.empty,
      extraKvs: Seq[String] = Nil)
      (buildDelta: Long => Delta): Long = {
    import spark.implicits._
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
      // whether this commit can DROP data files from the live set —
      // decides if the DV live-count must be recomputed (a pure
      // append can carry the parent's DV accounting verbatim)
      var fileSetChanged = false
      // whether LIVE files actually leave the table at this commit —
      // a data-changing commit that drops files is a COW REWRITE the
      // change feed cannot express from file diffs (recorded as
      // `rewrite=1`; an overwrite of an EMPTY table drops nothing and
      // stays CDC-plannable as pure inserts)
      var droppedLive = false
      val parentHadFiles = parent > 0 && snapshot(parent).nFiles > 0
      // StatsTrunc protocol flag: inherited from whatever list this
      // commit builds on (carried dirs keep their truncated entries),
      // OR'd with the dirs written by this very commit below
      var inheritedTrunc = false
      // files genuinely ADDED by this commit (the fresh delta dir's
      // count, captured BEFORE the fold below can swallow the dir) —
      // rides the record as `added_entries=` for the stream rate cap
      var addedEntriesRec: Option[Long] = None
      // the byte twin (`added_bytes=`), same capture point (ADVICE
      // r14: when the fold swallows the fresh delta dir — the common
      // case, it is usually the smallest — the dir-level diff in
      // addedBytesAt sees no new dir and charged the version ZERO
      // bytes, so a maxBytesPerTrigger stream admitted it for free)
      var addedBytesRec: Option[Long] = None
      var list: Seq[ManifestRef] = buildDelta(parent) match {
        case ReplaceAll(entries) =>
          fileSetChanged = true
          droppedLive = parentHadFiles
          val ref = writeManifestDir(entries, next)
          addedEntriesRec = Some(ref.entries)
          if (ref.bytes >= 0) addedBytesRec = Some(ref.bytes)
          Seq(ref)
        case UseList(v) =>
          fileSetChanged = true
          droppedLive = parentHadFiles
          inheritedTrunc = snapshot(v).statsTruncated
          snapshot(v).manifestDirs.map(ensureCounts)
        case AddRemove(added, removed) =>
          fileSetChanged = removed.nonEmpty
          droppedLive = removed.nonEmpty
          inheritedTrunc = parent > 0 && snapshot(parent).statsTruncated
          val parentRefs =
            if (parent == 0) Nil
            else snapshot(parent).manifestDirs.map(ensureCounts)
          // DRIVER-SIDE REMOVAL FAST PATH (r15): when every parent
          // dir's rows are still in the manifest-rows cache (the
          // same-process micro-commit case — streaming sinks, ledgered
          // merges, the curation gates), finding the affected dirs and
          // building the survivor entries is pure driver work over a
          // few hundred rows; the generic path below pays two jobs per
          // rewriting commit (semi-join tag + anti-join rewrite),
          // ~0.1 s of fixed plan+schedule each. Semantics identical:
          // same affected-dir selection, same survivor set, same
          // keep-one-schema-carrying-dir rule on a rewrite that
          // emptied the table. Mixed-schema affected dirs (written
          // across a stats/bloom declaration change) fall back.
          def removalLocal(parentRefs: Seq[ManifestRef],
              removed: Seq[String], next: Long)
              : Option[Seq[ManifestRef]] = {
            val cachedDirs = parentRefs.map(r =>
              r -> GraftTable.manifestRows(root, r.dir))
            if (!cachedDirs.forall(_._2.isDefined)) None
            else {
              val removedSet = removed.toSet
              val withHit = cachedDirs.map { case (r, c) =>
                val (sch, rows) = c.get
                val pi = sch.fieldIndex("path")
                (r, sch, rows, pi,
                  rows.exists(row =>
                    removedSet.contains(row.getUTF8String(pi).toString)))
              }
              val affected = withHit.filter(_._5)
              if (affected.isEmpty) Some(parentRefs)
              else if (affected.map(_._2).distinct.size != 1) None
              else {
                val surv = affected.flatMap { case (_, _, rows, pi, _) =>
                  rows.filterNot(row =>
                    removedSet.contains(row.getUTF8String(pi).toString))
                }
                val carried = withHit.filterNot(_._5).map(_._1)
                if (surv.isEmpty && carried.nonEmpty) Some(carried)
                else {
                  val sch = affected.head._2
                  val attrs = sch.map(f =>
                    org.apache.spark.sql.catalyst.expressions
                      .AttributeReference(
                        f.name, f.dataType, f.nullable)())
                  val lf = org.apache.spark.sql.graft.ColumnBridge
                    .ofRows(spark, org.apache.spark.sql.catalyst.plans
                      .logical.LocalRelation(attrs, surv))
                  Some(carried :+ writeManifestDir(lf, next))
                }
              }
            }
          }
          val afterRemove =
            if (removed.isEmpty || parentRefs.isEmpty) parentRefs
            else removalLocal(parentRefs, removed, next).getOrElse {
              val removedDf = broadcast(removed.toDF("path"))
              // ONE metadata job (path column only) finds which dirs
              // list a removed file; every other dir carries by
              // reference — a windowed delete rewrites O(window)
              // manifest rows, never O(table)
              val tagged = parentRefs.map(r =>
                readManifestDir(r.dir).select(col("path"))
                  .withColumn("_src", lit(r.dir)))
                .reduce(_ unionByName _)
              val affected = tagged
                .join(removedDf, Seq("path"), "left_semi")
                .select("_src").distinct().as[String].collect().toSet
              val carried = parentRefs.filterNot(r => affected(r.dir))
              if (affected.isEmpty) carried
              else {
                val affectedRefs =
                  parentRefs.filter(r => affected(r.dir))
                val replacement = unionRefs(affectedRefs)
                  .join(removedDf, Seq("path"), "left_anti")
                // SMALL REWRITE FAST PATH (r15: the curation bench's
                // growing cur_mart term): collect the survivor
                // entries to a LocalRelation so (a) a rewrite that
                // removed EVERY entry carries NO dir at all — a
                // repeatedly-merged small table used to accrete one
                // empty dir per merge until the fold — and (b)
                // writeManifestDir takes its driver-local cached
                // path instead of a write job + read-back aggregate
                if (affectedRefs.forall(_.entries >= 0) &&
                    affectedRefs.map(_.entries).sum <= 10000L) {
                  val lf = GraftTable.localFrame(spark, replacement)
                  val empty = lf.queryExecution.logical match {
                    case l: org.apache.spark.sql.catalyst.plans
                        .logical.LocalRelation => l.data.isEmpty
                    case _ => false
                  }
                  // keep ONE (schema-carrying) dir when the rewrite
                  // emptied the whole table — a zero-dir snapshot
                  // would make manifest() a column-less frame and
                  // break schema-dependent consumers (TRUNCATE)
                  if (empty && carried.nonEmpty) carried
                  else carried :+ writeManifestDir(lf, next)
                } else carried :+ writeManifestDir(replacement, next)
              }
            }
          added match {
            case Some(a) =>
              val ref = writeManifestDir(a, next)
              addedEntriesRec = Some(ref.entries)
              if (ref.bytes >= 0) addedBytesRec = Some(ref.bytes)
              afterRemove :+ ref
            case None =>
              addedEntriesRec = Some(0L)
              addedBytesRec = Some(0L)
              afterRemove
          }
      }
      // FOLD: bound the list so reads/planning stay O(few dirs) — when
      // it outgrows MaxManifestListLen, merge the SMALLEST dirs (the
      // delta tail appends accrete) down to the target. Amortized
      // O(live/target) metadata per commit in the worst case; big dirs
      // from compactions are never re-copied.
      var foldDirRec: Option[String] = None
      if (list.length > MaxManifestListLen) CommitProfile.time("fold") {
        val sorted = list.sortBy(_.entries)
        val nMerge = list.length - TargetManifestListLen + 1
        val folded = writeManifestDir(foldInput(sorted.take(nMerge)), next)
        foldDirRec = Some(folded.dir)
        list = sorted.drop(nMerge) :+ folded
      }
      val nFiles = list.map(_.entries).sum
      val nRows = list.map(_.rows).sum
      // schema evolution at the LOG level: append-like ops union new
      // columns onto the parent's recorded schema, overwrite replaces
      // it, content-preserving ops inherit it (StructType.json is one
      // line, so the k=v record format holds)
      val parentSnap = if (parent == 0) None else Some(snapshot(parent))
      val parentSchemaJson = parentSnap.flatMap(_.schemaJson)
      // evolution state: inherited unless this op overrides it
      // (rename/drop/widen set it, overwrite clears it — content and
      // schema both replaced — and restore takes the restored
      // version's state)
      val evolvedFlag =
        evolvedOverride.getOrElse(parentSnap.exists(_.evolved))
      val deadCols = deadColsOverride
        .getOrElse(parentSnap.map(_.deadCols).getOrElse(Set.empty)) ++
        addDeadCols
      val schemaJson: Option[String] =
        // overwrite REPLACES the recorded schema; restore replaces it
        // with the restored version's (reverting later ADD COLUMNs);
        // schemaReplace is the explicit knob rename/drop/widen use
        if (op == "overwrite" || op == "restore" || schemaReplace)
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
            // a NEW column whose name collides with a physical name
            // still in use (renamed-away) or dead (dropped) gets a
            // FRESH physical name — old files' bytes under the old
            // name must never surface through the new column
            val taken = ps.fields.map(f => key(GraftTable.physName(f)))
              .toSet ++ deadCols.map(key)
            val fresh = ns.fields.filterNot(f => names(key(f.name)))
              .map { f =>
                if (evolvedFlag && taken(key(f.name)))
                  f.copy(metadata =
                    new org.apache.spark.sql.types.MetadataBuilder()
                      .withMetadata(f.metadata)
                      .putString("physical", s"${f.name}__v$next")
                      .build())
                else f
              }
            Some(org.apache.spark.sql.types.StructType(
              ps.fields ++ fresh).json)
          case (None, Some(ns)) => Some(ns.json)
          case (pj, None) => pj
        }
      // DELETION-VECTOR LIST, O(new deletes) per commit: the parent's
      // DV delta dirs carry BY REFERENCE and only this op's deletions
      // are written (one small sorted dir) — previously every
      // DV-carrying commit rewrote the full accumulated DV, an
      // O(total-deletes) metadata write. Stale entries (their file
      // left the manifest) are harmless to the read-side anti-join;
      // when this commit can drop files, ONE metadata-sized join
      // recomputes exact live counts, prunes fully-stale dirs, and
      // folds an overlong list into one live dir. A pure append
      // carries the parent's DV lines verbatim — zero DV jobs.
      // `dvReplace` (restore) re-points at the restored version's
      // list: deletions that postdate the rollback target vanish with
      // zero DV IO.
      val parentDvRefs: Seq[DvRef] =
        if (parent == 0 || dvReplace) Nil else snapshot(parent).dvDirs
      val newDels: Option[(String, Long)] = extraDv.map(_(parent))
        .flatMap { dels =>
          val staged = dels.repartition(1)
            .sortWithinPartitions("path", "pos").cache()
          val n = staged.count()
          val out =
            if (n == 0) None
            else {
              val dir = s"dv-v${next}_" +
                java.util.UUID.randomUUID.toString.take(8)
              staged.write.parquet(s"${logDir(root)}/$dir")
              Some((dir, n))
            }
          staged.unpersist()
          out
        }
      val restoredDvRefs: Seq[DvRef] =
        if (!dvReplace) Nil
        else extraDvList.map(v => snapshot(v).dvDirs).getOrElse(Nil)
      var dvList: Seq[DvRef] = (parentDvRefs ++ restoredDvRefs) ++
        newDels.map { case (d, n) => DvRef(d, n) }
      val dvLines: Seq[String] =
        if (dvList.isEmpty) Nil
        else if (!fileSetChanged && newDels.isEmpty && !dvReplace) {
          // nothing about the live file set or the deletions moved:
          // the parent's accounting is still exact, carry it verbatim
          Seq(s"dvs=${dvList.map(r => s"${r.dir}:${r.rows}")
            .mkString(",")}",
            s"n_dels=${snapshot(parent).nDels}")
        } else {
          val mPaths =
            if (list.isEmpty) emptyDv.select("path")
            else unionRefs(list).select("path")
          val liveBySrc = dvList.map(r =>
            spark.read.parquet(s"${logDir(root)}/${r.dir}")
              .select(col("path")).withColumn("_src", lit(r.dir)))
            .reduce(_ unionByName _)
            .join(mPaths, Seq("path"), "left_semi")
            .groupBy(col("_src")).agg(count(lit(1)).as("n"))
            .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
          dvList = dvList.filter(r => liveBySrc.getOrElse(r.dir, 0L) > 0)
          val nDels = dvList.map(r => liveBySrc(r.dir)).sum
          if (dvList.length > MaxDvListLen) {
            val folded = dvList.map(r =>
              spark.read.parquet(s"${logDir(root)}/${r.dir}"))
              .reduce(_ unionByName _).distinct()
              .join(mPaths, Seq("path"), "left_semi")
              .repartition(1).sortWithinPartitions("path", "pos")
            val dir = s"dv-v${next}_" +
              java.util.UUID.randomUUID.toString.take(8)
            folded.write.parquet(s"${logDir(root)}/$dir")
            dvList = Seq(DvRef(dir, nDels))
          }
          if (dvList.isEmpty) Nil
          else Seq(s"dvs=${dvList.map(r => s"${r.dir}:${r.rows}")
            .mkString(",")}",
            s"n_dels=$nDels")
        }
      val dataChange = !NonDataChangeOps(op)
      val snapTrunc = list.exists(r => r.truncKnown && r.trunc) ||
        (list.exists(!_.truncKnown) && inheritedTrunc)
      val content = (Seq(s"op=$op", s"parent=$parent",
        // commit wall-clock for timestamp travel (VERDICT r13 #7);
        // commits linearize through putIfAbsent, so stamps are
        // non-decreasing up to cross-writer clock skew (the same
        // caveat Delta's timestamp resolution documents)
        s"ts=${System.currentTimeMillis}",
        // commit kind for the change feed (Delta's dataChange flag):
        // reorganization commits are skipped by CDC readers, and a
        // data-changing commit that drops live files is a COW rewrite
        // CDC refuses — both recorded exactly, per commit
        s"data_change=${if (dataChange) 1 else 0}",
        s"rewrite=${if (dataChange && droppedLive) 1 else 0}",
        s"manifests=${list.map(r =>
          s"${r.dir}:${r.entries}:${r.rows}" +
            (if (r.truncKnown) s":${if (r.trunc) 1 else 0}" else ""))
          .mkString(",")}",
        s"n_files=$nFiles", s"n_rows=$nRows",
        // protocol: truncated envelopes demand a reader that knows
        // min/max are bounds, not extremes (StatsTrunc) — stamp 2
        // only then, so untouched tables stay readable by protocol-1
        // libraries. The flag is EXACT when every dir's trunc state
        // is recorded (list.exists) — a compaction that rewrites the
        // last truncated dir away drops the demand back to 1; only
        // refs carried from pre-r14 records fall back to the sticky
        // parent inheritance (ADVICE r13).
        s"min_reader_version=${if (snapTrunc) 2 else 1}",
        s"applied=${applied.toSeq.sorted.mkString(",")}") ++
        (if (snapTrunc) Seq("stats_truncated=1") else Nil) ++
        addedEntriesRec.map(n => s"added_entries=$n").toSeq ++
        addedBytesRec.map(n => s"added_bytes=$n").toSeq ++
        foldDirRec.map(d => s"fold_dir=$d").toSeq ++
        (if (evolvedFlag) Seq("evolved=1") else Nil) ++
        (if (deadCols.nonEmpty)
          Seq(s"dead_cols=${deadCols.toSeq.sorted.mkString(",")}")
         else Nil) ++
        dvLines ++ extraKvs ++
        schemaJson.map(j => s"schema=$j"))
        .mkString("", "\n", "\n")
      beforeSnapshotCreate()
      // the linearization point, behind the CommitIO seam — POSIX
      // CREATE_NEW here, a conditional PUT on an object store
      if (CommitProfile.time("snapshot_put")(putLogIfAbsent(
          s"snapshot-v$next.txt", content.getBytes("UTF-8")))) {
        CommitProfile.recordAttempts(attempts)
        // advisory latest-version hint (Delta's `_last_checkpoint`
        // pattern): committed AFTER the snapshot so it can only lag,
        // never lead — [[GraftTable.versionAt]] probes forward from
        // it instead of LISTing the whole log dir (O(1) vs O(commits)
        // on an object store). Best-effort: a lost race or failed
        // write just leaves a staler lower bound.
        try CommitProfile.time("hint_put")(
          logStore.put(s"${logDir(root)}/${GraftTable.LatestHint}",
            next.toString.getBytes("UTF-8")))
        catch { case _: Exception => () }
        return next
      }
      // lost the race: JITTERED BACKOFF before rebasing — immediate
      // retry makes the same losers collide again, and against an
      // object store each attempt is a wire round trip (the r14 HTTP
      // conditional-PUT races showed a writer can lose all 20
      // immediate retries under a 4-writer herd); linear-capped +
      // uniform jitter, ≤ ~0.4 s at the last attempt
      val base = math.min(200L, 5L * attempts)
      Thread.sleep(base + java.util.concurrent.ThreadLocalRandom
        .current().nextLong(base + 1))
    }
    throw new ConcurrentCommitException(
      s"lost $MaxCommitAttempts commit races on $root")
  }
}

/** Always-on per-root [[GraftTable.read]] counter — one concurrent-map
  * bump per read() call, negligible next to any query it fronts.
  * Exists so specs can PIN an incremental pipeline's access pattern
  * (VERDICT r14 #1: the curation batch loop must never rescan the
  * verdict history — `count(verdictRoot) == 0` across the whole drain
  * is that claim as an assertion, not a scaladoc promise). */
private[graft] object ReadCounter {
  private val counts = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.atomic.AtomicLong]()
  def bump(root: String): Unit = {
    counts.computeIfAbsent(root,
      _ => new java.util.concurrent.atomic.AtomicLong)
      .incrementAndGet(); ()
  }
  def count(root: String): Long =
    Option(counts.get(root)).map(_.get).getOrElse(0L)
}

/** Opt-in nanosecond accounting of the commit path's phases —
  * `CommitProfile.on.set(true)`, run commits, read [[snapshotNs]].
  * Zero overhead when off (one atomic read per wrap point). Exists so
  * per-commit fixed-cost regressions are ATTRIBUTED (data-write job
  * vs manifest write vs fold vs snapshot IO), not guessed. */
private[graft] object CommitProfile {
  val on = new java.util.concurrent.atomic.AtomicBoolean(false)
  private val ns = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.atomic.AtomicLong]()
  def time[T](k: String)(f: => T): T =
    if (!on.get) f
    else {
      val t0 = System.nanoTime()
      try f finally ns.computeIfAbsent(k,
        _ => new java.util.concurrent.atomic.AtomicLong)
        .addAndGet(System.nanoTime() - t0)
    }
  def reset(): Unit = { ns.clear(); attemptsLog.clear() }
  def snapshotNs: Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    ns.asScala.map { case (k, v) => k -> v.get }.toMap
  }

  // Attempt count of each SUCCESSFUL commit (1 = no race lost),
  // recorded when `on` — the multi-writer commit-throughput bench
  // (VERDICT r14 #4) reads the retry distribution off it instead of
  // guessing from aggregate PUT counts.
  private val attemptsLog =
    new java.util.concurrent.ConcurrentLinkedQueue[Integer]()
  def recordAttempts(n: Int): Unit =
    if (on.get) { attemptsLog.add(n); () }
  def attemptCounts: Seq[Int] = {
    import scala.jdk.CollectionConverters._
    attemptsLog.asScala.map(_.intValue).toSeq
  }
}

object GraftTable {

  /** Per-writer retry budget for lost commit races. Every loss means
    * a RIVAL committed (system-wide progress is guaranteed), so this
    * bounds only one straggler's patience — on a loaded host a slow
    * writer racing several fast ones can legitimately lose many in a
    * row (a full-suite run flaked at 10). */
  val MaxCommitAttempts = 20

  /** Reader protocol this library implements. Commits stamp it as
    * `min_reader_version` (bump ONLY when a new snapshot feature
    * would be silently misread by an older reader, Delta's protocol
    * rule); [[snapshot]] refuses records demanding a newer one.
    * History: 1 = base; 2 = StatsTrunc'd string/binary envelopes
    * (a v1 reader would fold a truncated max as an exact extreme —
    * stamped only on snapshots that actually carry one). */
  val ReaderVersion = 2

  /** Commits adding at most this many data files take the driver-local
    * manifest path (entry rows collected into a LocalRelation): the
    * stats aggregate is the commit's last distributed job, the
    * manifest write is a single local task, and its counts are driver
    * arithmetic. Bounded: 64 entries × ≤1 MiB bloom each stays far
    * under driver headroom; bigger rewrites keep the scan-side path. */
  val SmallCommitFiles = 64

  /** Micro-merge fast path bounds (mergeImpl): the update frame must
    * already be a driver-local LocalRelation of at most
    * [[MicroMergeRows]] rows, and the candidate file slice it touches
    * must hold at most [[MicroMergeScanRows]] live rows (that slice is
    * collected once — the path's single scan job). Above either bound
    * the generic distributed merge runs; the numbers mirror the
    * micro-append (16384) and keep transient driver memory at a few
    * MB of survivor rows. */
  val MicroMergeRows = 16384
  val MicroMergeScanRows = 65536

  /** Above this live-file count, planning/vacuum stop materializing
    * whole result sets on the driver in one collect: file paths
    * stream via `toLocalIterator` (transient memory = one manifest
    * partition) and vacuum's orphan detection runs as a distributed
    * anti-join. A `var` so specs can force the scale path on small
    * fixtures; the default keeps single-job planning for every table
    * that fits comfortably (2×10⁵ paths ≈ 20 MB). */
  @volatile var PlanCollectLimit: Long = 200000L

  /** Commit-dir count above which vacuum lists the data directory as
    * a parallelized job instead of a sequential driver loop. */
  @volatile var DistributedVacuumMinDirs: Int = 64

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
    val ls = LogStore.forRoot(root)
    // HINTED resolution: read the advisory `_latest.hint` (written
    // after every commit) and probe FORWARD with exists() until the
    // first missing snapshot — versions above a committed one are
    // contiguous, and the hint is always ≤ current (written after the
    // snapshot), so the walk is exact and usually zero steps. A
    // missing/corrupt/expired hint falls back to the full listing.
    // At 10⁵ commits this turns every table resolution from an
    // O(commits) object-store LIST into a GET + one or two HEADs.
    val hinted: Option[Long] =
      try {
        val h = new String(
          ls.read(s"${logDir(root)}/$LatestHint"), "UTF-8").trim.toLong
        if (h >= 1 && ls.exists(s"${logDir(root)}/snapshot-v$h.txt"))
          Some(h)
        else None
      } catch { case _: Exception => None }
    hinted match {
      case Some(h) =>
        var v = h
        while (ls.exists(s"${logDir(root)}/snapshot-v${v + 1}.txt"))
          v += 1
        v
      case None =>
        ls.list(logDir(root)).iterator
          .map(_.name).collect {
            case SnapshotName(v) => v.toLong
          }.foldLeft(0L)(math.max)
    }
  }

  /** Advisory latest-version hint file name (under `_log`). */
  private[graft] val LatestHint = "_latest.hint"

  final class ConcurrentCommitException(msg: String)
    extends RuntimeException(msg)

  /** One manifest dir in a snapshot's list, with its exact entry
    * (file) and row counts — counts ride the snapshot record so the
    * fold policy and n_files/n_rows totals are driver arithmetic,
    * never a manifest read. entries = -1 marks a legacy pre-list ref
    * whose counts resolve lazily. */
  /** `trunc` = this dir carries at least one StatsTrunc'd envelope.
    * Serialized per-dir since round 14 (optional 4th `manifests=`
    * field) so a commit whose list no longer contains any truncated
    * dir — a compaction that rewrote the long values away — can DROP
    * the protocol-2 demand instead of inheriting it forever (ADVICE
    * r13). `truncKnown=false` marks a ref parsed from a pre-r14
    * record: its state is unknown, so the snapshot-level flag falls
    * back to conservative parent inheritance. */
  private[graft] case class ManifestRef(dir: String, entries: Long,
    rows: Long, trunc: Boolean = false, truncKnown: Boolean = false,
    // data bytes listed by this dir's entries (sum of size_bytes),
    // known only for dirs written by THIS commit path since r15 — the
    // byte twin of the entry count, captured so `added_bytes=` can be
    // recorded pre-fold (-1 = unknown: carried/legacy dir)
    bytes: Long = -1L)

  /** List length that triggers a fold (merge of the smallest dirs)… */
  val MaxManifestListLen = 16
  /** …down to this many dirs. */
  val TargetManifestListLen = 8

  /** One deletion-vector delta dir in a snapshot's DV list, with its
    * raw entry count (entries may be stale — their file left the
    * manifest — which reads ignore; `Snapshot.nDels` is the exact
    * live count, recomputed per commit). -1 marks a legacy single-dir
    * ref. */
  private[graft] case class DvRef(dir: String, rows: Long)

  /** DV list length that triggers a fold into one live-restricted dir. */
  val MaxDvListLen = 8

  private case class Snapshot(version: Long, op: String, parent: Long,
    manifestDirs: Seq[ManifestRef], nFiles: Long, nRows: Long,
    applied: Set[Long] = Set.empty,
    schemaJson: Option[String] = None,
    dvDirs: Seq[DvRef] = Nil, nDels: Long = 0L,
    evolved: Boolean = false, deadCols: Set[String] = Set.empty,
    dataChange: Boolean = true, rewrite: Boolean = false,
    mergeKeys: Seq[String] = Nil,
    // some live manifest dir carries StatsTrunc'd envelopes — the
    // snapshot demands reader protocol ≥2 (an older reader would
    // fold a truncated max as an exact extreme)
    statsTruncated: Boolean = false,
    // exact count of data files this commit ADDED (recorded before
    // any manifest fold) — the stream rate cap's cost model; None on
    // pre-r14 records (falls back to the dir-level diff)
    addedEntries: Option[Long] = None,
    // exact data BYTES this commit added, same pre-fold capture
    // (ADVICE r14: the dir-diff fallback charges 0 when the fold
    // swallowed the fresh delta dir); None on pre-r15 records
    addedBytes: Option[Long] = None,
    // the manifest dir a FOLD at this commit wrote (entries all
    // carried from prior dirs) — excluded from the rate cap's
    // byte-cost diff so a fold version doesn't charge the whole table
    foldDir: Option[String] = None,
    // commit wall-clock (epoch millis), recorded since r14 — lets
    // timestamp travel binary-search records instead of LISTing the
    // whole log dir for mtimes; None on older records
    tsMillis: Option[Long] = None)

  /** Ops whose commits REORGANIZE files without changing the table's
    * logical content (Delta's `dataChange=false`): a change-data-feed
    * reader skips them entirely — their rewritten survivor rows are
    * NOT new data, and emitting them as inserts double-counts every
    * surviving row in a downstream fold (VERDICT r11 #1). */
  private[graft] val NonDataChangeOps =
    Set("compact", "compact_small", "compact_where", "compact_to_size",
      "zorder", "alter")

  /** Legacy-snapshot fallback for the `rewrite=1` kv: ops that MAY
    * drop live files while changing content — a CDC window containing
    * one cannot be planned from file diffs (the rewrite's survivor
    * rows would surface as fresh inserts). Conservative: a no-hit
    * legacy delete is also refused; new commits record the exact
    * flag. */
  private[graft] val LegacyRewriteOps =
    Set("delete", "replace", "overwrite", "restore", "merge", "update")

  /** A field's PHYSICAL column name — the name its values live under
    * in data files and manifest stats. Differs from the logical name
    * only after a RENAME (Delta's column-mapping name mode): the
    * rename records `physical` metadata and no file moves. */
  private[graft] def physName(
      f: org.apache.spark.sql.types.StructField): String =
    if (f.metadata.contains("physical")) f.metadata.getString("physical")
    else f.name

  // ---- session-scoped planning caches ------------------------------
  // A committed (root, version) is immutable, so its parsed snapshot
  // and resolved file list can be memoized for the session — without
  // this, every gtable query re-runs the manifest-path collect 4–6×
  // (forPath + scan planning each resolve the table). currentVersion
  // is NEVER cached (it is the cross-process coordination point);
  // vacuum invalidates its root (expired versions become unreadable).
  private val snapCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), Snapshot]()
  private val pathsCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), Seq[String]]()

  private def snapCached(root: String, v: Long)(load: => Snapshot)
      : Snapshot = {
    if (snapCache.size > 8192) snapCache.clear()
    val k = (root, v)
    val hit = snapCache.get(k)
    if (hit != null) hit
    else { val s = load; snapCache.put(k, s); s }
  }

  private def pathsCached(root: String, v: Long)(load: => Seq[String])
      : Seq[String] = {
    if (pathsCache.size > 4096) pathsCache.clear()
    val k = (root, v)
    val hit = pathsCache.get(k)
    if (hit != null) hit
    else { val s = load; pathsCache.put(k, s); s }
  }

  private val colsCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Long), (Seq[String], Seq[String])]()

  private def colsCached(root: String, v: Long)
      (load: => (Seq[String], Seq[String]))
      : (Seq[String], Seq[String]) = {
    if (colsCache.size > 4096) colsCache.clear()
    val k = (root, v)
    val hit = colsCache.get(k)
    if (hit != null) hit
    else { val s = load; colsCache.put(k, s); s }
  }

  /** Drop every cached entry for `root` — called by vacuum (snapshots
    * behind the horizon stop being readable and their files go) and
    * the catalog's DROP/RENAME TABLE (the root may be reused). */
  private[graft] def invalidate(root: String): Unit = {
    snapCache.keySet.removeIf(_._1 == root)
    pathsCache.keySet.removeIf(_._1 == root)
    colsCache.keySet.removeIf(_._1 == root)
    manifestRowsCache.keySet.removeIf(_._1 == root)
  }

  /** Rows of manifest dirs THIS process wrote driver-locally —
    * immutable once written, so never stale; lets [[foldInput]] fold
    * micro-commit debt with zero Spark jobs. Bounded: ≤1024 rows per
    * dir cached, ≤4096 dirs total (≈ a few MB), evicted wholesale on
    * [[invalidate]] (vacuum/drop). */
  private val manifestRowsCache = new java.util.concurrent
    .ConcurrentHashMap[(String, String),
      (org.apache.spark.sql.types.StructType,
        Seq[org.apache.spark.sql.catalyst.InternalRow])]()

  private[format] def cacheManifestRows(root: String, dir: String,
      schema: org.apache.spark.sql.types.StructType,
      rows: Seq[org.apache.spark.sql.catalyst.InternalRow]): Unit =
    if (rows.length <= 1024 && manifestRowsCache.size < 4096) {
      manifestRowsCache.put((root, dir), (schema, rows)); ()
    }

  private[format] def manifestRows(root: String, dir: String)
      : Option[(org.apache.spark.sql.types.StructType,
        Seq[org.apache.spark.sql.catalyst.InternalRow])] =
    Option(manifestRowsCache.get((root, dir)))

  /** Collect `df` into a driver-local frame WITHOUT the external-Row
    * hop: `collect()` + `createDataFrame` decodes every string column
    * through java.lang.String, silently replacing invalid UTF-8 with
    * U+FFFD — for stats envelopes that re-encoded value can exclude
    * the true extreme and pruning then skips live files (ADVICE r13).
    * `executeCollect` keeps catalyst rows (UTF8String bytes) intact. */
  private[graft] def localFrame(spark: SparkSession,
      df: DataFrame): DataFrame = {
    val qe = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution
    val rows = qe.executedPlan.executeCollect()
    org.apache.spark.sql.graft.ColumnBridge.ofRows(spark,
      org.apache.spark.sql.catalyst.plans.logical.LocalRelation(
        qe.analyzed.output, rows.toIndexedSeq))
  }

  private val SnapshotName = "snapshot-v(\\d+)\\.txt".r
  private val TagName = "tag-(.+)\\.txt".r

  private def logDir(root: String) = s"$root/_log"

  /** Create a new table at `root` with `df` as snapshot v1. Fails if
    * the root already holds commits — silently appending onto an
    * existing table masked half-built scratch reuse (ADVICE r8). */
  def create(spark: SparkSession, root: String, df: DataFrame,
      statsCols: Seq[String], numFiles: Int = 4,
      bloomCols: Seq[String] = Nil,
      bloomBits: Int = graft.functions.BloomFilterIndex.DefaultBits)
      : GraftTable = {
    LogStore.forRoot(root).mkdirs(logDir(root))
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
    LogStore.forRoot(root).mkdirs(logDir(root))
    new GraftTable(spark, root, statsCols, bloomCols, bloomBits)
  }

  /** CHEAP metadata-only handle: no manifest probe, no directory
    * creation — for snapshot-record questions (isEvolved,
    * recordedSchema, currentVersion) on read paths that must not pay
    * `forPath`'s manifest schema inference or `openOrCreate`'s
    * mkdir (ADVICE r9). Not suitable for writes (no stats/bloom
    * declaration). */
  private[graft] def readOnly(spark: SparkSession, root: String)
      : GraftTable = new GraftTable(spark, root, Nil)

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
    val v = probe.currentVersion
    if (v == 0) return new GraftTable(spark, root, Nil)
    // the stats/bloom declaration probe infers the manifest union's
    // schema — parquet footer reads across up to TargetManifestListLen
    // dirs. A committed version's manifest columns are immutable, so
    // memoize per (root, version): the connector resolves a table 4–6
    // times per query (scan builder, planning, SPJ, DV probe) and must
    // not pay the footer reads each time.
    val (cols, blooms) = colsCached(root, v) {
      val m = probe.manifest(v)
      (m.columns.toSeq
        .filter(_.startsWith("min_")).map(_.stripPrefix("min_")),
       m.columns.toSeq
        .filter(_.startsWith("bloom_")).map(_.stripPrefix("bloom_")))
    }
    // -1 = detect the recorded width lazily, first write only
    new GraftTable(spark, root, cols, blooms,
      if (blooms.isEmpty) graft.functions.BloomFilterIndex.DefaultBits
      else -1)
  }
}
