package graft.table

import java.nio.file.{Files, Paths, Path, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import com.fasterxml.jackson.databind.ObjectMapper

/** Snapshot-versioned Parquet table — the engine's realization of the north
  * star's "Iceberg table": a directory of immutable data files plus a JSON
  * manifest log with an atomically-swapped CURRENT pointer. Gives:
  *
  *   - atomic commits (readers see the old snapshot until the pointer swap);
  *   - time travel (`readAt`) over the manifest chain;
  *   - per-partition lineage + metrics: every manifest records its parent
  *     snapshot, the producing operation/stage, and per-file row/byte counts
  *     (read from the parquet footers, not by re-scanning data);
  *   - checkpoint/resume: a pipeline stage whose snapshot is already
  *     committed is read back instead of recomputed (`Resumable.stage`) —
  *     the SAVE_DW_FILE/USE_DW_FILE idea of the reference
  *     (src/vector_64bits/data_weight.c:19-160) generalized;
  *   - per-file integer column bounds in the manifest (Iceberg's column
  *     stats), driving `readWhereBetween` data skipping and the
  *     copy-on-write `merge` upsert that rewrites only key-range-matched
  *     files and carries every other file over BY PATH;
  *   - `changes` — a row-level change-data-feed between versions that
  *     never reads files shared by both manifests.
  *
  * Layout:  root/data/<snapshotId>/part-*.parquet
  *          root/meta/v<N>.json          (manifest)
  *          root/meta/CURRENT            (contains "v<N>"; atomic rename)
  *
  * The pointer swap uses an atomic filesystem move; on an object store this
  * maps to a conditional-put of the pointer object (same protocol Iceberg's
  * HadoopCatalog uses). Data files are never rewritten or deleted by commit.
  */
/** Per-file metrics + per-column integer min/max stats (from the parquet
  * footer — INT32/INT64 columns only; absent for others). The stats are
  * what make file-level pruning and copy-on-write MERGE metadata-only
  * decisions, as in Iceberg's manifest column bounds. */
final case class FileMetrics(path: String, rows: Long, bytes: Long,
                             stats: Map[String, (Long, Long)] = Map.empty)

final case class Snapshot(
    version: Int,
    id: String,
    parentId: Option[String],
    operation: String,
    stage: String,
    rows: Long,
    files: Seq[FileMetrics])

class SnapshotTable(val root: String) {
  private val metaDir = Paths.get(root, "meta")
  private val mapper = new ObjectMapper()

  Files.createDirectories(metaDir)
  Files.createDirectories(Paths.get(root, "data"))

  // ------------------------------------------------------------ manifests

  private def currentPath: Path = metaDir.resolve("CURRENT")

  def currentVersion: Option[Int] =
    if (Files.exists(currentPath))
      Some(new String(Files.readAllBytes(currentPath), "UTF-8").trim.stripPrefix("v").toInt)
    else None

  def current: Option[Snapshot] = currentVersion.map(snapshotAt)

  def snapshotAt(version: Int): Snapshot = {
    val p = metaDir.resolve(s"v$version.json")
    require(Files.exists(p),
      s"snapshot v$version does not exist under $root (expired or never committed)")
    val node = mapper.readTree(Files.readAllBytes(p))
    Snapshot(
      version = node.get("version").asInt(),
      id = node.get("id").asText(),
      parentId = Option(node.get("parentId")).filter(!_.isNull).map(_.asText()),
      operation = node.get("operation").asText(),
      stage = node.get("stage").asText(),
      rows = node.get("rows").asLong(),
      files = node.get("files").elements().asScala.map { f =>
        val stats = Option(f.get("stats")).filter(!_.isNull).map { s =>
          s.fields().asScala.map { e =>
            e.getKey -> (e.getValue.get("min").asLong(), e.getValue.get("max").asLong())
          }.toMap
        }.getOrElse(Map.empty[String, (Long, Long)])
        FileMetrics(f.get("path").asText(), f.get("rows").asLong(),
          f.get("bytes").asLong(), stats)
      }.toSeq)
  }

  /** Full lineage chain, newest first (expired versions skipped). */
  def snapshots: Seq[Snapshot] =
    (1 to currentVersion.getOrElse(0)).reverseIterator
      .filter(v => Files.exists(metaDir.resolve(s"v$v.json")))
      .map(snapshotAt).toSeq

  /** Most recent committed snapshot for a named pipeline stage. */
  def findStage(stage: String): Option[Snapshot] =
    snapshots.find(_.stage == stage)

  // ------------------------------------------------------------- commit

  /** Write `df` as a new immutable snapshot and atomically advance CURRENT.
    * Returns the committed snapshot (with per-file metrics from footers). */
  def commit(df: DataFrame, operation: String, stage: String): Snapshot = {
    val (_, files) = writeDataFiles(df)
    commitFiles(files, operation, stage)
  }

  /** Incremental (fast) append — Iceberg's most common commit: `df`'s
    * rows become new data files, every parent file carries over BY
    * REFERENCE, so the commit cost is O(new data) regardless of table
    * size. The appended frame may carry columns the existing files lack
    * (schema evolution): reads merge schemas across file generations and
    * older files return null for later-added columns. */
  def append(df: DataFrame, stage: String): Snapshot = {
    val parent = current.map(_.files).getOrElse(Seq.empty)
    val (_, files) = writeDataFiles(df)
    commitFiles(parent ++ files, "append", stage)
  }

  /** Copy-on-write DELETE: rows matching `cond` disappear by rewriting
    * ONLY the files that contain a match; every untouched file carries
    * over by reference — O(touched files) like merge(), the shape that
    * makes a right-to-be-forgotten pass affordable on a 100 TB table.
    * The touched-file probe is one scan projecting just the file name;
    * the collected list is metadata-scale (bounded by the file count). */
  def delete(spark: SparkSession, cond: org.apache.spark.sql.Column,
             stage: String): Snapshot = {
    val cur = current.getOrElse(
      throw new IllegalStateException("delete on an empty table"))
    import org.apache.spark.sql.functions.input_file_name
    val touched = readFiles(spark, cur.files)
      .withColumn("__file", input_file_name())
      .where(cond).select("__file").distinct()
      .collect().map(_.getString(0)).toSet
    val (hit, carried) = cur.files.partition(f =>
      touched.exists(_.endsWith(f.path)))
    if (hit.isEmpty) return cur
    // keep rows where the predicate is NOT TRUE: a NULL-valued predicate
    // (e.g. a condition on a nullable column) must KEEP the row, exactly
    // as SQL DELETE does — `!cond` alone evaluates NULL and silently
    // drops such rows from rewritten files while identical rows in
    // untouched files survive (round-5 advice, high)
    import org.apache.spark.sql.functions.{coalesce, lit}
    val keep = readFiles(spark, hit).where(!coalesce(cond, lit(false)))
    val (_, rewritten) = writeDataFiles(keep)
    commitFiles(carried ++ rewritten, "delete", stage)
  }

  /** Write `df`'s rows as immutable files under a fresh data id WITHOUT
    * committing a snapshot — the data half of copy-on-write operations. */
  private def writeDataFiles(df: DataFrame): (String, Seq[FileMetrics]) = {
    val id = f"d-${java.util.UUID.randomUUID().toString.take(12)}"
    val dataDir = Paths.get(root, "data", id)
    df.write.parquet(dataDir.toString)
    val listing = Files.list(dataDir)
    val files =
      try listing.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(p => FileMetrics(p.toString, parquetRowCount(p), Files.size(p),
          parquetIntStats(p)))
        .toSeq.sortBy(_.path)
      finally listing.close()
    (id, files)
  }

  /** Commit an explicit file list (mix of newly-written and REUSED files
    * from the parent snapshot — file-granular copy-on-write) as the next
    * snapshot. Metadata-only: no data is read or moved. */
  def commitFiles(files: Seq[FileMetrics], operation: String,
                  stage: String): Snapshot = {
    val version = currentVersion.getOrElse(0) + 1
    val id = f"s$version%05d-${java.util.UUID.randomUUID().toString.take(8)}"
    val snap = Snapshot(version, id, current.map(_.id), operation, stage,
      files.map(_.rows).sum, files)

    val json = mapper.createObjectNode()
    json.put("version", snap.version)
    json.put("id", snap.id)
    snap.parentId match {
      case Some(p) => json.put("parentId", p)
      case None    => json.putNull("parentId")
    }
    json.put("operation", operation)
    json.put("stage", stage)
    json.put("rows", snap.rows)
    val arr = json.putArray("files")
    files.foreach { f =>
      val o = arr.addObject()
      o.put("path", f.path); o.put("rows", f.rows); o.put("bytes", f.bytes)
      if (f.stats.nonEmpty) {
        val so = o.putObject("stats")
        f.stats.toSeq.sortBy(_._1).foreach { case (c, (lo, hi)) =>
          val co = so.putObject(c); co.put("min", lo); co.put("max", hi)
        }
      }
    }
    // CREATE_NEW: a lost commit race fails loudly instead of clobbering a
    // concurrent writer's manifest (the conditional-put half of the
    // protocol; the pointer swap below is the atomic-rename half)
    Files.write(metaDir.resolve(s"v$version.json"),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(json),
      java.nio.file.StandardOpenOption.CREATE_NEW)

    // atomic pointer swap — readers never observe a half-written state
    val tmp = metaDir.resolve(s"CURRENT.tmp.$id")
    Files.write(tmp, s"v$version".getBytes("UTF-8"))
    Files.move(tmp, currentPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    snap
  }

  /** Small-file compaction: rewrite the CURRENT snapshot's data into
    * `numFiles` files as a new snapshot (operation "compact"). Rows are
    * untouched; old snapshots and their data files stay on disk, so time
    * travel to pre-compaction versions keeps working (data files are
    * immutable — expiry of superseded snapshots is a separate, explicitly
    * destructive maintenance step, as in Iceberg).
    *
    * Scale note: the rewrite is one `coalesce(numFiles)` pass — no
    * shuffle (coalesce only merges read splits). At object-store scale
    * this is the manifest-churn killer: a streaming or per-stage pipeline
    * that commits many small files periodically folds them into
    * scan-efficient sizes without ever blocking readers (the pointer swap
    * is still atomic). */
  def compact(spark: SparkSession, numFiles: Int): Snapshot = {
    require(numFiles > 0, s"numFiles must be positive (got $numFiles)")
    val cur = current.getOrElse(
      throw new IllegalStateException(s"nothing to compact under $root"))
    commit(read(spark).coalesce(numFiles), "compact", cur.stage)
  }

  /** Expire everything older than the newest `keepLast` snapshots: delete
    * their manifests and any data files no retained manifest references,
    * returning the expired version numbers. EXPLICITLY DESTRUCTIVE
    * maintenance (the Iceberg expire_snapshots idea): time travel to an
    * expired version afterwards fails with a clear error; the current
    * snapshot can never be expired (`keepLast ≥ 1` enforced).
    *
    * Copy-on-write sharing makes this REFERENCE-COUNTED: a MERGE reuses
    * untouched files from its parent, so a file physically under an
    * expired snapshot's directory may still be live in a retained
    * manifest — only unreferenced files are deleted (exactly Iceberg's
    * reachability rule). */
  def expireSnapshots(keepLast: Int): Seq[Int] = {
    require(keepLast >= 1, s"keepLast must be >= 1 (got $keepLast)")
    val cur = currentVersion.getOrElse(0)
    val cutoff = cur - keepLast + 1
    val expired = (1 until cutoff)
      .filter(v => Files.exists(metaDir.resolve(s"v$v.json")))
    val retainedPaths: Set[String] = (cutoff to cur)
      .filter(v => Files.exists(metaDir.resolve(s"v$v.json")))
      .flatMap(v => snapshotAt(v).files.map(_.path)).toSet
    expired.foreach { v =>
      val snap = snapshotAt(v)
      snap.files.filterNot(f => retainedPaths(f.path)).foreach { f =>
        Files.deleteIfExists(Paths.get(f.path))
      }
      // a data dir with no retained reference left inside goes entirely
      // (its _SUCCESS/.crc markers carry no data)
      snap.files.map(f => Paths.get(f.path).getParent).distinct.foreach { d =>
        val liveInside = retainedPaths.exists(p => Paths.get(p).getParent == d)
        if (!liveInside && Files.exists(d))
          Files.walk(d).sorted(java.util.Comparator.reverseOrder[Path]())
            .forEach(p => Files.delete(p))
      }
      Files.delete(metaDir.resolve(s"v$v.json"))
    }
    expired
  }

  // ------------------------------------------------------ merge (upsert)

  /** Copy-on-write MERGE (upsert by `keyCol`): delete current rows whose
    * key appears in `updates`, insert every `updates` row — as a new
    * snapshot that REWRITES ONLY THE FILES WHOSE KEY RANGE CAN MATCH.
    *
    * The decision which files to rewrite is metadata + one narrow pass
    * over the update keys: each file's manifest [min, max] bound for
    * `keyCol` is broadcast, update keys map to the (few) file indices
    * whose range contains them, and only those DISTINCT indices — bounded
    * by the file count, never the row count — come back to the driver.
    * Untouched files carry over into the new manifest by path: at 100 TB
    * a point-update rewrites kilobytes of manifests plus the matched
    * files, not the table. Files without a `keyCol` bound (non-integer
    * key or legacy manifest) are conservatively rewritten. */
  def merge(spark: SparkSession, updates: DataFrame, keyCol: String): Snapshot = {
    import org.apache.spark.sql.functions.{col, countDistinct, count, lit}
    val cur = current.getOrElse(
      throw new IllegalStateException(s"nothing to merge into under $root"))
    val dup = updates.agg(count(lit(1)).as("n"), countDistinct(col(keyCol)).as("d"),
      count(col(keyCol)).as("nn")).head()
    require(dup.getLong(0) == dup.getLong(2),
      s"updates carry ${dup.getLong(0) - dup.getLong(2)} NULL $keyCol key(s) — a NULL key can never match")
    require(dup.getLong(0) == dup.getLong(1),
      s"updates carry duplicate $keyCol values (${dup.getLong(0)} rows, ${dup.getLong(1)} keys) — merge requires one row per key")

    val ranged = cur.files.zipWithIndex.map { case (f, i) =>
      (f.stats.get(keyCol), i)
    }
    val unbounded = ranged.collect { case (None, i) => i }
    val bounds = ranged.collect { case (Some((lo, hi)), i) => (lo, hi, i) }
    val matchedBounded: Set[Int] =
      if (bounds.isEmpty) Set.empty
      else {
        val bc = spark.sparkContext.broadcast(bounds)
        import spark.implicits._
        updates.select(col(keyCol).cast("long")).na.drop().as[Long]
          .flatMap(k => bc.value.collect { case (lo, hi, i) if k >= lo && k <= hi => i })
          .distinct().collect().toSet
      }
    val rewriteIdx = matchedBounded ++ unbounded
    val touched = cur.files.zipWithIndex.collect { case (f, i) if rewriteIdx(i) => f }
    val untouched = cur.files.zipWithIndex.collect { case (f, i) if !rewriteIdx(i) => f }

    val rewritten =
      if (touched.isEmpty) updates
      else spark.read.parquet(touched.map(_.path): _*)
        .join(updates.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
        .unionByName(updates)
    val (_, newFiles) = writeDataFiles(rewritten)
    commitFiles(untouched ++ newFiles, "merge", cur.stage)
  }

  // --------------------------------------------------- change data feed

  /** Row-level diff between two snapshots: `_op` = "insert" for rows in
    * `toVersion` but not `fromVersion`, "delete" for the reverse (an
    * update is a delete+insert pair on the same key).
    *
    * FILE-IDENTITY SHORT CIRCUIT: files present in both manifests (the
    * copy-on-write carry-overs) are provably identical and are never
    * read — the diff scans only the symmetric difference of the file
    * lists, so a CDF between adjacent merge snapshots costs the rewritten
    * files, not the table. */
  def changes(spark: SparkSession, fromVersion: Int, toVersion: Int): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val a = snapshotAt(fromVersion)
    val b = snapshotAt(toVersion)
    val aPaths = a.files.map(_.path)
    val bPaths = b.files.map(_.path)
    val removed = aPaths.diff(bPaths)
    val added = bPaths.diff(aPaths)
    // mergeSchema on BOTH sides (the readFiles discipline): an evolving
    // append can leave mixed-generation files inside one side's diff set,
    // and without the merge the schema comes from a single footer —
    // silently dropping the later-added column, or tripping exceptAll on a
    // schema mismatch between the two sides
    def readOrEmpty(paths: Seq[String], schemaFrom: Seq[String]): DataFrame =
      if (paths.nonEmpty)
        spark.read.option("mergeSchema", "true").parquet(paths: _*)
      else
        spark.read.option("mergeSchema", "true")
          .parquet(schemaFrom: _*).limit(0)
    require(aPaths.nonEmpty || bPaths.nonEmpty,
      s"both v$fromVersion and v$toVersion are empty — nothing to diff")
    val oldRows0 = readOrEmpty(removed, (aPaths ++ bPaths).take(1))
    val newRows0 = readOrEmpty(added, (aPaths ++ bPaths).take(1))
    // align both sides to the union schema (null-fill the columns one side
    // has never seen) so exceptAll compares like with like
    val unionCols = (oldRows0.schema ++ newRows0.schema)
      .groupBy(_.name).map { case (_, fs) => fs.head }.toSeq
      .sortBy(_.name)
    def align(df: DataFrame): DataFrame = {
      val have = df.columns.toSet
      df.select(unionCols.map { f =>
        if (have(f.name)) col(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }: _*)
    }
    val oldRows = align(oldRows0)
    val newRows = align(newRows0)
    newRows.exceptAll(oldRows).withColumn("_op", lit("insert"))
      .unionByName(oldRows.exceptAll(newRows).withColumn("_op", lit("delete")))
  }

  /** Row count from the parquet footer — no data scan. */
  private def parquetRowCount(p: Path): Long = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.hadoop.conf.Configuration
    val in = HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(p.toUri), new Configuration())
    val r = ParquetFileReader.open(in)
    try r.getRecordCount finally r.close()
  }

  /** Integer-column min/max from the parquet footer (no data scan):
    * per-column bounds aggregated across row groups, INT32/INT64 only. */
  private def parquetIntStats(p: Path): Map[String, (Long, Long)] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    import org.apache.hadoop.conf.Configuration
    val in = HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(p.toUri), new Configuration())
    val r = ParquetFileReader.open(in)
    try {
      val acc = scala.collection.mutable.Map.empty[String, (Long, Long)]
      // a column whose stats are missing in ANY row group has no sound
      // file-level bound — track and drop it
      val invalid = scala.collection.mutable.Set.empty[String]
      r.getFooter.getBlocks.asScala.foreach { b =>
        b.getColumns.asScala.foreach { c =>
          val name = c.getPath.toDotString
          val tn = c.getPrimitiveType.getPrimitiveTypeName
          if (tn == PrimitiveTypeName.INT64 || tn == PrimitiveTypeName.INT32) {
            val st = c.getStatistics
            if (st == null || st.isEmpty || !st.hasNonNullValue) invalid += name
            else {
              val (lo, hi) = tn match {
                case PrimitiveTypeName.INT64 =>
                  (st.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
                   st.genericGetMax.asInstanceOf[java.lang.Long].longValue())
                case _ =>
                  (st.genericGetMin.asInstanceOf[java.lang.Integer].longValue(),
                   st.genericGetMax.asInstanceOf[java.lang.Integer].longValue())
              }
              acc.get(name) match {
                case Some((alo, ahi)) => acc(name) = (math.min(alo, lo), math.max(ahi, hi))
                case None             => acc(name) = (lo, hi)
              }
            }
          }
        }
      }
      (acc -- invalid).toMap
    } finally r.close()
  }

  // -------------------------------------------------------------- read

  def read(spark: SparkSession): DataFrame =
    readAt(spark, currentVersion.getOrElse(
      throw new IllegalStateException(s"no committed snapshot under $root")))

  /** Time travel: read the table as of manifest version `version` — the
    * MANIFEST's file list, not a directory listing (copy-on-write
    * snapshots share files across data directories). */
  def readAt(spark: SparkSession, version: Int): DataFrame =
    readFiles(spark, snapshotAt(version).files)

  private def readFiles(spark: SparkSession, files: Seq[FileMetrics]): DataFrame = {
    require(files.nonEmpty, s"snapshot under $root has no data files")
    // mergeSchema: file generations may differ after an evolving append —
    // the union schema is the table schema, files missing a column read
    // null (Iceberg keeps the schema in table metadata; here the parquet
    // footers, already read once per commit for stats, stand in for it)
    spark.read.option("mergeSchema", "true").parquet(files.map(_.path): _*)
  }

  /** Stats-pruned scan: read only the files whose `[min, max]` bound for
    * `keyCol` intersects `[lo, hi]` — manifest-level data skipping (the
    * decision reads zero data). Files without a bound are conservatively
    * included. Layout-dependent selectivity: range-partitioning the table
    * by `keyCol` at write time gives disjoint per-file ranges and
    * single-file point reads. */
  def readWhereBetween(spark: SparkSession, keyCol: String,
                       lo: Long, hi: Long): DataFrame = {
    import org.apache.spark.sql.functions.col
    val files = prunedFiles(keyCol, lo, hi)
    if (files.isEmpty)
      read(spark).limit(0).where(col(keyCol).between(lo, hi))
    else
      readFiles(spark, files).where(col(keyCol).between(lo, hi))
  }

  /** The manifest-pruned file list for `[lo, hi]` on `keyCol` (exposed so
    * tests can assert how many files a scan touches). */
  def prunedFiles(keyCol: String, lo: Long, hi: Long): Seq[FileMetrics] =
    prunedFilesWhere(Seq((keyCol, lo, hi)))

  /** Conjunctive multi-column pruning: keep the files whose stats envelope
    * intersects EVERY `[lo, hi]` — the 2-D (and n-D) data-skipping read
    * that z-order clustering ([[graft.cells.ZOrder]]) makes selective: a
    * z-sorted file covers a compact lattice patch, so its per-axis min/max
    * bounds are tight and a bounding-box query touches only the files
    * whose patch intersects the box (Iceberg/Delta z-order semantics). */
  def prunedFilesWhere(preds: Seq[(String, Long, Long)]): Seq[FileMetrics] = {
    val cur = current.getOrElse(
      throw new IllegalStateException(s"no committed snapshot under $root"))
    cur.files.filter(f => preds.forall { case (c, lo, hi) =>
      f.stats.get(c) match {
        case Some((fmin, fmax)) => fmax >= lo && fmin <= hi
        case None               => true
      }
    })
  }

  /** Stats-pruned bounding-box scan: `prunedFilesWhere` for the file list,
    * then the exact residual predicate on the survivors. */
  def readWhereBox(spark: SparkSession,
                   preds: Seq[(String, Long, Long)]): DataFrame = {
    import org.apache.spark.sql.functions.col
    val files = prunedFilesWhere(preds)
    val base = if (files.isEmpty) read(spark).limit(0) else readFiles(spark, files)
    preds.foldLeft(base) { case (df, (c, lo, hi)) =>
      df.where(col(c).between(lo, hi))
    }
  }
}

/** Checkpoint/resume driver: each stage commits its result; on restart,
  * stages whose snapshots exist are read back, not recomputed. */
object Resumable {
  def stage(table: SnapshotTable, spark: SparkSession, name: String)
           (compute: => DataFrame): DataFrame =
    table.findStage(name) match {
      case Some(snap) => spark.read.option("mergeSchema", "true")
                           .parquet(snap.files.map(_.path): _*)
      case None       => table.commit(compute, "stage", name)
                         table.read(spark)
    }
}
