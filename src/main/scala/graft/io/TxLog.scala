package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID
import scala.jdk.CollectionConverters._

/** Minimal transactional table format over plain parquet — the
  * commit-protocol tier the reference's stack gets from Delta Lake
  * (extractor_polymarket.py:208-223 verifies `_delta_log`; this is the
  * same design, scoped to what the gold layer needs):
  *
  *  - a `_graft_log/` directory of VERSIONED manifests, each listing
  *    the complete set of live data files at that version;
  *  - readers resolve the highest manifest and read exactly its files
  *    — in-flight or orphaned data files are invisible, so a reader
  *    never sees a partial write (snapshot isolation);
  *  - writers stage uniquely-named data files (invisible until
  *    referenced), then publish with ONE atomic create of manifest
  *    v+1. The create is a POSIX hard-link (fails with EEXIST if the
  *    version was taken — on HDFS, plain rename has the same
  *    fail-if-exists contract), so two concurrent committers cannot
  *    both win a version: the loser re-reads the new snapshot,
  *    re-resolves its change, and retries (optimistic concurrency,
  *    Delta's protocol);
  *  - old manifests remain readable → time travel ([[readVersion]]);
  *  - [[compact]] rewrites live files into few and publishes the swap
  *    as a new version — readers on older versions are undisturbed;
  *    [[vacuum]] later drops files no surviving manifest references.
  *
  * At 100 TB the manifest lists stay driver-sized (file counts, not
  * rows) and every data-path operation is a distributed Spark job;
  * only the file-name bookkeeping is local. */
object TxLog {

  final case class Snapshot(version: Long, files: Seq[String],
      schemaJson: Option[String] = None)

  private def logDir(table: String): Path = Paths.get(table, "_graft_log")
  private def manifestPath(table: String, v: Long): Path =
    logDir(table).resolve(f"$v%020d.json")

  /** Structural schema equality (column name → type, order- and
    * nullability-insensitive at the top level): the drift a reader
    * would corrupt on, without rejecting harmless nullable flips. */
  private def schemaMatches(aJson: String, bJson: String): Boolean = {
    import org.apache.spark.sql.types.{DataType, StructType}
    def norm(j: String) = DataType.fromJson(j).asInstanceOf[StructType]
      .fields.map(f => (f.name, f.dataType.sql)).sortBy(_._1).toSeq
    norm(aJson) == norm(bJson)
  }

  /** Directory listing with the stream closed (a long-lived driver
    * must not leak fds across thousands of commits). */
  private def listNames(dir: Path): Seq[String] = {
    val st = Files.list(dir)
    try st.iterator().asScala.map(_.getFileName.toString).toList
    finally st.close()
  }

  /** Highest committed version, 0 = empty table (no manifest). */
  def currentSnapshot(table: String): Snapshot = {
    val ld = logDir(table)
    if (!Files.isDirectory(ld)) return Snapshot(0L, Nil)
    val versions = listNames(ld)
      .filter(_.endsWith(".json")).map(_.stripSuffix(".json").toLong)
    if (versions.isEmpty) Snapshot(0L, Nil)
    else snapshotAt(table, versions.max)
  }

  /** The snapshot a given manifest version pins (time travel).
    * Manifest format: header line, `schema=<json>` line, one data-file
    * name per line — no JSON parser dependency for the file list. */
  def snapshotAt(table: String, version: Long): Snapshot = {
    val p = manifestPath(table, version)
    require(Files.exists(p), s"version $version does not exist under $table")
    val lines = Files.readAllLines(p).asScala.toSeq
    val schema = lines.lift(1).filter(_.startsWith("schema=")).map(_.stripPrefix("schema="))
    Snapshot(version, lines.drop(2), schema)
  }

  /** Read the latest snapshot (empty-but-typed frame impossible for a
    * never-written table — caller guards on snapshot.files.nonEmpty). */
  def read(spark: SparkSession, table: String): DataFrame = {
    val s = currentSnapshot(table)
    require(s.files.nonEmpty, s"$table has no committed data")
    spark.read.parquet(s.files.map(f => s"$table/$f"): _*)
  }

  /** Read as of a pinned version (time travel). */
  def readVersion(spark: SparkSession, table: String, version: Long): DataFrame = {
    val s = snapshotAt(table, version)
    require(s.files.nonEmpty, s"$table@$version has no data files")
    spark.read.parquet(s.files.map(f => s"$table/$f"): _*)
  }

  /** Publish `files` as version `expectedVersion + 1`. Returns false
    * if another writer committed that version first (caller re-reads
    * and retries). The publish is atomic-create-if-absent: write the
    * manifest to a temp name, then hard-link it to the version path —
    * link(2) fails with EEXIST atomically on POSIX; a Hadoop
    * deployment swaps this seam for HDFS rename (same contract). */
  /** SCALE ADJUDICATION: TxLog is the SMALL-TABLE / bootstrap commit
    * tier BY FORMAT DESIGN — every manifest lists the complete live
    * file set, so commit cost and snapshot state are O(table files)
    * no matter how the in-memory side is tiered (contrast
    * [[DeltaRead]]'s checkpoint-plus-tail log, whose Dataset tier
    * keeps the driver at O(tail)). That is the right trade below
    * ~100k files: one fsync-able text file, zero format dependencies,
    * trivially auditable. Past the threshold the 100 TB exit is the
    * Delta writer ([[DeltaWrite]]) via [[DeltaBridge.exportTxLog]] —
    * a zero-copy log rewrite. Crossing the threshold WARNS loudly
    * instead of failing (a working pipeline must not break the day it
    * grows), once per commit, with the migration pointer. */
  private[graft] var scaleWarnFiles: Int = 100000
  /** TEST SEAM: fires with (table, live-file count) whenever a commit
    * crosses [[scaleWarnFiles]]. */
  private[graft] var onScaleWarning: Option[(String, Int) => Unit] = None
  private def warnScale(table: String, n: Int): Unit =
    if (n >= scaleWarnFiles) {
      onScaleWarning.foreach(_(table, n))
      System.err.println(s"[graft] TxLog manifest for $table lists $n live " +
        s"files (threshold $scaleWarnFiles). TxLog rewrites the FULL live " +
        "list per commit — it is the small-table tier. Migrate to the " +
        "Delta writer (graft.io.DeltaWrite) via DeltaBridge.exportTxLog " +
        "for O(delta) commits and a tiered metadata plane.")
    }

  def tryCommit(table: String, expectedVersion: Long, files: Seq[String],
      schemaJson: String = ""): Boolean = {
    warnScale(table, files.size)
    val ld = logDir(table)
    Files.createDirectories(ld)
    val tmp = ld.resolve(s".tmp-${UUID.randomUUID()}")
    Files.write(tmp,
      (Seq(s"graft-tx v${expectedVersion + 1}", s"schema=$schemaJson") ++ files).asJava)
    try {
      Files.createLink(manifestPath(table, expectedVersion + 1), tmp)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    } finally Files.deleteIfExists(tmp)
  }

  /** Stage a DataFrame as uniquely-named parquet files inside the
    * table directory (invisible until a manifest references them).
    * Returns the new relative file names. */
  private def stage(df: DataFrame, table: String): Seq[String] = {
    val tmpDir = Paths.get(table, s"_staging-${UUID.randomUUID()}")
    df.write.mode("overwrite").parquet(tmpDir.toString)
    val moved = listNames(tmpDir)
      .filter(_.endsWith(".parquet"))
      .map { f =>
        val name = s"part-${UUID.randomUUID()}.parquet"
        Files.move(tmpDir.resolve(f), Paths.get(table, name), StandardCopyOption.ATOMIC_MOVE)
        name
      }
    org.apache.commons.io.FileUtils.deleteDirectory(tmpDir.toFile)
    moved
  }

  private def dropStaged(table: String, files: Seq[String]): Unit =
    files.foreach(f => Files.deleteIfExists(Paths.get(table, f)))

  /** Transactional conflict-skip append (the MERGE-equivalent
    * [[Sinks.parquetAppendNew]] provides WITHOUT concurrent-writer
    * safety): dedup the batch on `keyCols`, anti-join against the
    * CURRENT snapshot's keys, stage only the fresh rows, commit. On a
    * version race the anti-join re-runs against the winner's snapshot
    * — so two writers racing the same keys resolve to exactly-once,
    * and a re-run of the same batch is a no-op at any interleaving.
    * Empty `keyCols` = full-row conflict skip, as in the plain sink. */
  def appendNew(df: DataFrame, table: String, keyCols: Seq[String],
      maxRetries: Int = 10): Snapshot = {
    val keys = if (keyCols.nonEmpty) keyCols else df.columns.toSeq
    val spark = df.sparkSession
    val incoming = df.dropDuplicates(keys)
    val incomingSchema = incoming.schema.json
    var attempt = 0
    while (attempt < maxRetries) {
      val s = currentSnapshot(table)
      // schema drift guard: the manifest records the committed schema,
      // so a batch whose columns/types moved fails HERE with names,
      // not downstream as a corrupt union of mismatched parquet files
      s.schemaJson.filter(_.nonEmpty).foreach { committed =>
        if (!schemaMatches(committed, incomingSchema))
          throw new IllegalArgumentException(
            s"appendNew: schema drift on $table — committed $committed, " +
              s"incoming $incomingSchema")
      }
      val fresh =
        if (s.files.isEmpty) incoming
        else {
          val existingKeys = read(spark, table)
            .select(keys.map(c => col(c).as(s"__ex_$c")): _*)
          // null-safe key equality — see parquetAppendNew
          val cond = keys.map(c => incoming(c) <=> col(s"__ex_$c")).reduce(_ && _)
          incoming.join(existingKeys, cond, "left_anti")
        }
      // empty batch or idempotent re-run: minting a version for zero
      // rows would let an empty first micro-batch commit a zero-file
      // manifest v1 (read() then throws despite version > 0) — return
      // the current snapshot untouched instead
      if (fresh.isEmpty) return s
      val staged = stage(fresh, table)
      if (staged.isEmpty) return s // belt-and-braces: zero part files
      if (tryCommit(table, s.version, s.files ++ staged, incomingSchema))
        return Snapshot(s.version + 1, s.files ++ staged, Some(incomingSchema))
      dropStaged(table, staged) // lost the race: unreference and retry
      attempt += 1
    }
    throw new IllegalStateException(
      s"appendNew: lost $maxRetries commit races on $table — raise maxRetries")
  }

  /** Transactional compaction: rewrite the live file set as
    * ceil(bytes/targetBytes) files and publish the swap as one new
    * version. Readers pinned to older versions keep their files
    * (nothing is deleted here — that's [[vacuum]]'s job). Returns the
    * new file count. */
  def compact(spark: SparkSession, table: String, targetBytes: Long = 128L << 20): Int = {
    var attempt = 0
    while (attempt < 10) {
      val s = currentSnapshot(table)
      require(s.files.nonEmpty, s"nothing to compact under $table")
      val bytes = s.files.map(f => Files.size(Paths.get(table, f))).sum
      val parts = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
      val staged = stage(
        spark.read.parquet(s.files.map(f => s"$table/$f"): _*).repartition(parts),
        table)
      if (tryCommit(table, s.version, staged, s.schemaJson.getOrElse("")))
        return staged.size
      dropStaged(table, staged)
      attempt += 1
    }
    throw new IllegalStateException(s"compact: lost 10 commit races on $table")
  }

  /** Drop data files no retained manifest references, and manifests
    * older than `keepVersions` behind the head. The time-travel
    * horizon moves forward; current readers are unaffected (their
    * snapshot's files are always retained).
    *
    * `retentionMs` is the concurrent-writer safety window (Delta's
    * retention-period design): [[stage]] moves data files into the
    * table root BEFORE [[tryCommit]] publishes the manifest that
    * references them, so an unreferenced-but-recent .parquet may be a
    * commit IN FLIGHT — deleting it would permanently break the
    * winner's manifest. Files younger than the window are therefore
    * never touched; only run with `retentionMs = 0` when all writers
    * are known quiesced. Crashed-writer `_staging-<uuid>` directories
    * past the window are reclaimed under the same rule (a live
    * stage() both creates and removes its directory well inside any
    * sane window). */
  def vacuum(table: String, keepVersions: Int = 1,
      retentionMs: Long = 60L * 60 * 1000): Int = {
    val head = currentSnapshot(table)
    if (head.version == 0L) return 0
    val cutoff = System.currentTimeMillis() - retentionMs
    def oldEnough(p: Path): Boolean =
      Files.getLastModifiedTime(p).toMillis <= cutoff
    val keepFrom = math.max(1L, head.version - keepVersions + 1)
    val ld = logDir(table)
    val allVersions = listNames(ld).filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json").toLong).sorted
    val (drop, keep) = allVersions.partition(_ < keepFrom)
    val live = keep.flatMap(v => snapshotAt(table, v).files).toSet
    val rootNames = listNames(Paths.get(table))
    val dead = rootNames.filter(_.endsWith(".parquet"))
      .filterNot(live)
      .filter(f => oldEnough(Paths.get(table, f)))
    dead.foreach(f => Files.deleteIfExists(Paths.get(table, f)))
    // reclaim staging dirs a crashed writer abandoned (stage() only
    // cleans up its own dir on success)
    rootNames.filter(_.startsWith("_staging-"))
      .map(d => Paths.get(table, d))
      .filter(d => Files.isDirectory(d) && oldEnough(d))
      .foreach(d => org.apache.commons.io.FileUtils.deleteDirectory(d.toFile))
    drop.foreach(v => Files.deleteIfExists(manifestPath(table, v)))
    dead.size
  }
}
