package graft.near

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic per-batch commit for the parquet warehouse: makes a
  * [[Stream.processBatch]] — its table appends AND its five cross-batch
  * state tables — all-or-nothing across a mid-batch crash, closing the
  * at-least-once window the reference side-steps with Postgres
  * `ON CONFLICT` (`database/src/adapters/receipts.rs:484-498`; parquet
  * appends have no PK to conflict on).
  *
  * Layout under the warehouse dir:
  * {{{
  *   _state/CURRENT        committed state version N (text)
  *   _state/v<N>/<name>    one parquet dir per state table; absent = empty
  *   _state/MANIFEST       in-flight batch: {"version":N+1,"files":[dst…]}
  *   _staging/<table>/     the batch's table output, pre-move
  * }}}
  *
  * Protocol per batch: write next states to `v(N+1)` (invisible — the
  * pointer still says N) → stage table output → write MANIFEST (the
  * exact target file list) → move staged files into the live tables →
  * advance CURRENT to N+1 (the commit point) → delete MANIFEST /
  * staging / `v(N)`. [[recover]] runs at batch start and rolls an
  * interrupted batch back (deletes the manifest's target files — moves
  * are the only live-table mutation, so deleting them restores the
  * pre-batch warehouse exactly) or forward (pointer already advanced:
  * only cleanup remains). Every step is idempotent, so a crash during
  * recovery itself re-recovers.
  *
  * PRECONDITIONS (the protocol is sound only under both):
  *
  *  - '''Atomic rename.''' Every transition rides on `FileSystem
  *    .rename` being atomic (HDFS, local file://, and other
  *    HDFS-semantics stores). On object stores (s3/s3a/gs/abfs/…)
  *    "rename" is copy+delete: a crash mid-copy can leave the dst file
  *    that a manifest rollback later deletes WHILE the src survives —
  *    silently voiding exactly-once. [[recover]] therefore FAILS FAST
  *    when the warehouse URI scheme is a known non-atomic store; use
  *    an HDFS-compatible filesystem, or front the object store with a
  *    table format that owns its own commit protocol.
  *  - '''Single writer.''' One stream (one driver) owns a warehouse
  *    dir: MANIFEST/CURRENT are per-warehouse singletons and two
  *    concurrent writers would roll back each other's in-flight
  *    batches. Spark's streaming checkpoint lock already enforces this
  *    for the intended one-stream-per-warehouse deployment.
  *
  * Scale note: the manifest lists only THIS batch's files — recovery
  * cost is O(batch), never O(warehouse). Renames are metadata-only on
  * HDFS-like stores.
  */
object BatchCommit {

  val StateDir = "_state"
  val StagingDir = "_staging"

  /** URI schemes whose `rename` is copy+delete (non-atomic): the
    * protocol's guarantee does not hold there — refuse loudly instead
    * of corrupting silently.
    */
  private val NonAtomicRenameSchemes = Set(
    "s3", "s3a", "s3n", "gs", "gcs", "oss", "cos", "swift",
    "wasb", "wasbs", "abfs", "abfss")

  private def requireAtomicRename(warehouseDir: String): Unit = {
    val scheme = Option(new Path(warehouseDir).toUri.getScheme)
      .map(_.toLowerCase).getOrElse("file")
    if (NonAtomicRenameSchemes.contains(scheme))
      throw new IllegalArgumentException(
        s"BatchCommit requires atomic rename; '$scheme://' is a " +
          "copy+delete object store where a mid-rename crash voids the " +
          "exactly-once guarantee. Point the warehouse at an " +
          "HDFS-compatible filesystem.")
  }

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def statePath(warehouseDir: String, version: Long, name: String): String =
    s"$warehouseDir/$StateDir/v$version/$name"

  private def currentPath(wh: String) = new Path(s"$wh/$StateDir/CURRENT")
  private def nextPath(wh: String) = new Path(s"$wh/$StateDir/CURRENT_next")
  private def manifestPath(wh: String) = new Path(s"$wh/$StateDir/MANIFEST")

  private def readSmall(f: FileSystem, p: Path): String = {
    val in = f.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** Hadoop rename reports many failures (dst exists, src missing,
    * transient store errors) by returning FALSE, not throwing. Every
    * rename in this protocol is load-bearing — a silent failure would
    * corrupt the exactly-once guarantee — so a false return fails the
    * batch loudly; the replay then recovers.
    */
  private def renameOrThrow(f: FileSystem, src: Path, dst: Path): Unit =
    if (!f.rename(src, dst))
      throw new java.io.IOException(s"batch commit: rename $src -> $dst " +
        "failed (filesystem returned false)")

  /** Create-then-rename so the file appears atomically. */
  private def writeSmallAtomic(f: FileSystem, p: Path, body: String): Unit = {
    val tmp = new Path(p.toString + "_tmp")
    val out = f.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    f.delete(p, false)
    renameOrThrow(f, tmp, p)
  }

  /** Committed state version (0 = fresh warehouse). Repairs a pointer
    * advance that crashed between deleting CURRENT and renaming
    * CURRENT_next in.
    */
  def currentVersion(spark: SparkSession, warehouseDir: String): Long = {
    val f = fs(spark, warehouseDir)
    if (!f.exists(currentPath(warehouseDir)) &&
        f.exists(nextPath(warehouseDir)))
      renameOrThrow(f, nextPath(warehouseDir), currentPath(warehouseDir))
    if (!f.exists(currentPath(warehouseDir))) 0L
    else readSmall(f, currentPath(warehouseDir)).trim.toLong
  }

  /** Roll an interrupted batch back or forward; returns the committed
    * version the new batch must read its state from. Idempotent.
    */
  def recover(spark: SparkSession, warehouseDir: String): Long = {
    requireAtomicRename(warehouseDir)
    val f = fs(spark, warehouseDir)
    val v = currentVersion(spark, warehouseDir)
    val mp = manifestPath(warehouseDir)
    if (f.exists(mp)) {
      val root = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(readSmall(f, mp))
      val mv = root.get("version").asLong()
      if (mv > v) {
        // Crash before the commit point: the batch never happened.
        // Deleting the listed target files restores the live tables;
        // the uncommitted v(mv) state dir goes with them.
        val it = root.get("files").elements()
        while (it.hasNext) f.delete(new Path(it.next().asText()), false)
        f.delete(new Path(s"$warehouseDir/$StateDir/v$mv"), true)
      }
      // mv <= v: crash after the commit point — files and state are
      // live and correct; only the cleanup below remained.
      f.delete(mp, false)
    }
    // Debris sweep (idempotent): staging from any interrupted batch,
    // and state versions other than the committed one — newer ones are
    // uncommitted leftovers (a crash before the manifest was written),
    // older ones already-superseded cleanup stragglers.
    f.delete(new Path(s"$warehouseDir/$StagingDir"), true)
    val sd = new Path(s"$warehouseDir/$StateDir")
    if (f.exists(sd)) f.listStatus(sd).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith("v") && n.drop(1).forall(_.isDigit) &&
          n.drop(1).toLong != v)
        f.delete(st.getPath, true)
    }
    v
  }

  /** Write one state table for the in-flight version. An empty frame
    * writes nothing — absence IS the empty state (empty parquet writes
    * leave schema-less dirs that poison later reads).
    */
  def writeState(spark: SparkSession, warehouseDir: String, version: Long,
      name: String, df: DataFrame): Unit =
    if (!df.isEmpty)
      df.write.mode("overwrite")
        .parquet(statePath(warehouseDir, version, name))

  /** Stage a table's batch output and return (src, dst) moves into the
    * live table dir. Staged file names carry fresh write-UUIDs, so dst
    * paths never collide with existing live files.
    */
  def stageTable(spark: SparkSession, warehouseDir: String, table: String,
      df: DataFrame, partitionCol: Option[String]): Seq[(String, String)] = {
    val staging = s"$warehouseDir/$StagingDir/$table"
    val w = partitionCol match {
      case Some(c) => df.write.partitionBy(c)
      case None    => df.write
    }
    w.mode("overwrite").parquet(staging)
    val f = fs(spark, warehouseDir)
    val base = new Path(staging).toUri.getPath
    val moves = scala.collection.mutable.ArrayBuffer[(String, String)]()
    val it = f.listFiles(new Path(staging), true)
    while (it.hasNext) {
      val p = it.next().getPath
      if (!p.getName.startsWith("_") && !p.getName.startsWith(".")) {
        val rel = p.toUri.getPath.stripPrefix(base).stripPrefix("/")
        moves += ((p.toUri.getPath, s"$warehouseDir/$table/$rel"))
      }
    }
    moves.toSeq
  }

  def writeManifest(spark: SparkSession, warehouseDir: String, version: Long,
      files: Seq[String]): Unit = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = m.createObjectNode()
    root.put("version", version)
    val arr = root.putArray("files")
    files.foreach(arr.add)
    writeSmallAtomic(fs(spark, warehouseDir), manifestPath(warehouseDir),
      m.writeValueAsString(root))
  }

  def applyMoves(spark: SparkSession, warehouseDir: String,
      moves: Seq[(String, String)]): Unit = {
    val f = fs(spark, warehouseDir)
    moves.foreach { case (src, dst) =>
      val d = new Path(dst)
      f.mkdirs(d.getParent)
      renameOrThrow(f, new Path(src), d)
    }
  }

  /** THE commit point: after this, recovery rolls forward. */
  def advance(spark: SparkSession, warehouseDir: String,
      version: Long): Unit = {
    val f = fs(spark, warehouseDir)
    writeSmallAtomic(f, nextPath(warehouseDir), version.toString)
    f.delete(currentPath(warehouseDir), false)
    renameOrThrow(f, nextPath(warehouseDir), currentPath(warehouseDir))
  }

  def cleanup(spark: SparkSession, warehouseDir: String,
      committed: Long): Unit = {
    val f = fs(spark, warehouseDir)
    f.delete(manifestPath(warehouseDir), false)
    f.delete(new Path(s"$warehouseDir/$StagingDir"), true)
    f.delete(new Path(s"$warehouseDir/$StateDir/v${committed - 1}"), true)
  }
}
