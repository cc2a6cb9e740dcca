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
  *     (src/vector_64bits/data_weight.c:19-160) generalized.
  *
  * Layout:  root/data/<snapshotId>/part-*.parquet
  *          root/meta/v<N>.json          (manifest)
  *          root/meta/CURRENT            (contains "v<N>"; atomic rename)
  *
  * The pointer swap uses an atomic filesystem move; on an object store this
  * maps to a conditional-put of the pointer object (same protocol Iceberg's
  * HadoopCatalog uses). Data files are never rewritten or deleted by commit.
  */
final case class FileMetrics(path: String, rows: Long, bytes: Long)

final case class Snapshot(
    version: Int,
    id: String,
    parentId: Option[String],
    operation: String,
    stage: String,
    rows: Long,
    files: Seq[FileMetrics]) {
  def dataDir(root: String): String = s"$root/data/$id"
}

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
        FileMetrics(f.get("path").asText(), f.get("rows").asLong(), f.get("bytes").asLong())
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
    val version = currentVersion.getOrElse(0) + 1
    val id = f"s$version%05d-${java.util.UUID.randomUUID().toString.take(8)}"
    val dataDir = Paths.get(root, "data", id)
    df.write.parquet(dataDir.toString)

    val files = Files.list(dataDir).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(p => FileMetrics(p.toString, parquetRowCount(p), Files.size(p)))
      .toSeq.sortBy(_.path)
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
    }
    Files.write(metaDir.resolve(s"v$version.json"),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(json))

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
    * their data directories and manifests, returning the expired version
    * numbers. EXPLICITLY DESTRUCTIVE maintenance (the Iceberg
    * expire_snapshots idea): time travel to an expired version afterwards
    * fails with a clear error; the current snapshot can never be expired
    * (`keepLast ≥ 1` enforced). Safe against concurrent readers of the
    * RETAINED versions — every snapshot owns its data directory, nothing
    * is shared or rewritten. */
  def expireSnapshots(keepLast: Int): Seq[Int] = {
    require(keepLast >= 1, s"keepLast must be >= 1 (got $keepLast)")
    val cur = currentVersion.getOrElse(0)
    val cutoff = cur - keepLast + 1
    val expired = (1 until cutoff)
      .filter(v => Files.exists(metaDir.resolve(s"v$v.json")))
    expired.foreach { v =>
      val snap = snapshotAt(v)
      val dd = Paths.get(snap.dataDir(root))
      if (Files.exists(dd))
        Files.walk(dd).sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(p => Files.delete(p))
      Files.delete(metaDir.resolve(s"v$v.json"))
    }
    expired
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

  // -------------------------------------------------------------- read

  def read(spark: SparkSession): DataFrame =
    readAt(spark, currentVersion.getOrElse(
      throw new IllegalStateException(s"no committed snapshot under $root")))

  /** Time travel: read the table as of manifest version `version`. */
  def readAt(spark: SparkSession, version: Int): DataFrame =
    spark.read.parquet(snapshotAt(version).dataDir(root))
}

/** Checkpoint/resume driver: each stage commits its result; on restart,
  * stages whose snapshots exist are read back, not recomputed. */
object Resumable {
  def stage(table: SnapshotTable, spark: SparkSession, name: String)
           (compute: => DataFrame): DataFrame =
    table.findStage(name) match {
      case Some(snap) => spark.read.parquet(snap.dataDir(table.root))
      case None       => table.commit(compute, "stage", name)
                         table.read(spark)
    }
}
