package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic snapshot-pointer table layout (VERDICT r15 item 3): the
  * transactional-table primitive the merge/partitioned sinks sit on,
  * without importing a table format.
  *
  * Layout under one table root:
  * {{{
  *   table/
  *     snap-00000001/   immutable parquet snapshot
  *     snap-00000002/
  *     _CURRENT         one small file naming the published snapshot
  * }}}
  *
  * Write protocol: materialize the full new snapshot into a fresh
  * `snap-N` directory (the old snapshot is untouched), then publish by
  * atomically replacing the `_CURRENT` pointer file (write a temp,
  * `FileContext.rename(OVERWRITE)` — atomic on HDFS and on POSIX local
  * filesystems). Readers resolve the pointer, then read ONLY that
  * immutable directory — a reader that resolved `snap-N` keeps a
  * consistent view even while `snap-N+1` is being written and
  * published, and a reader that resolves mid-publish sees either the
  * old pointer or the new one, never a torn table. This is the
  * delete/rename-swap fix: the previous layout deleted the live
  * directory before renaming the staging one into place, so a
  * concurrent reader mid-listing saw a vanishing or half-renamed
  * table. The reference's analogue is the server-side Socrata upsert
  * (publish_to_catalog.py:345), atomic per request; here one pointer
  * flip is the commit point.
  *
  * Crash safety: an unpublished `snap-N` left by a crashed writer was
  * never pointed at — the next writer of version N overwrites it; the
  * pointer is only ever replaced wholesale. [[vacuum]] reclaims old
  * snapshots but NEVER the pointed-at one; how many to keep is the
  * reader-staleness contract (a reader may read a snapshot for as
  * long as it holds the resolved DataFrame — vacuum only what no
  * reader can still hold).
  *
  * Scale: the pointer file is bytes; snapshots are ordinary parquet
  * directories (partitioned layouts included), so scan pruning,
  * pushdown, and partition discovery behave exactly as on a plain
  * path.
  */
object SnapshotStore {

  private val Pointer = "_CURRENT"
  private[graft] def snapName(v: Long): String = f"snap-$v%08d"

  private def fsOf(spark: SparkSession, path: Path): FileSystem =
    path.getFileSystem(spark.sessionState.newHadoopConf())

  /** The published snapshot version, if any. Each call re-resolves the
    * pointer (reader re-resolution is the point of the layout). */
  def currentVersion(spark: SparkSession, tablePath: String): Option[Long] = {
    val ptr = new Path(tablePath, Pointer)
    val fs = fsOf(spark, ptr)
    if (!fs.exists(ptr)) None
    else {
      val in = fs.open(ptr)
      val name =
        try {
          val buf = new Array[Byte](64)
          val n = in.read(buf)
          new String(buf, 0, math.max(n, 0), UTF_8).trim
        } finally in.close()
      // the pointer names the snapshot directory (self-describing);
      // a malformed pointer is a corrupt table — fail loudly, never
      // guess a version
      if (!name.startsWith("snap-"))
        throw new java.io.IOException(
          s"SnapshotStore: corrupt pointer $ptr: '$name'")
      Some(name.stripPrefix("snap-").toLong)
    }
  }

  /** Path of the published snapshot directory. */
  def currentPath(spark: SparkSession, tablePath: String): Option[String] =
    currentVersion(spark, tablePath)
      .map(v => new Path(tablePath, snapName(v)).toString)

  /** The published snapshot as a DataFrame; throws when nothing has
    * been published yet. */
  def read(spark: SparkSession, tablePath: String): DataFrame =
    spark.read.parquet(currentPath(spark, tablePath).getOrElse(
      throw new java.io.FileNotFoundException(
        s"SnapshotStore: $tablePath has no published snapshot")))

  /** Writes `df` as the next snapshot and publishes it. Returns the
    * published version. The previous snapshot stays on disk (readers
    * may still hold it) until [[vacuum]]. */
  def write(df: DataFrame, tablePath: String): Long =
    writeWith(df.sparkSession, tablePath) { dir =>
      df.write.mode("overwrite").parquet(dir)
    }

  /** Snapshot write with a caller-supplied writer (partitioned
    * layouts, custom options): `body` must materialize the snapshot
    * at exactly the directory it is given; publication happens only
    * after it returns. */
  def writeWith(spark: SparkSession, tablePath: String)
      (body: String => Unit): Long = {
    val table = new Path(tablePath)
    val fs = fsOf(spark, table)
    fs.mkdirs(table)
    val next = currentVersion(spark, tablePath).getOrElse(0L) + 1L
    val dir = new Path(table, snapName(next))
    // a crashed earlier attempt may have left an unpublished snap-N —
    // never pointed at, safe to overwrite
    body(fs.makeQualified(dir).toString)
    publish(spark, fs, table, next)
    next
  }

  /** Atomically repoints `_CURRENT` at version `v`: temp file +
    * overwrite-rename (one metadata operation — the commit point). */
  private def publish(spark: SparkSession, fs: FileSystem, table: Path,
      v: Long): Unit = {
    val tmp = new Path(table, s".$Pointer.tmp-${java.util.UUID.randomUUID}")
    val out = fs.create(tmp, true)
    try out.write(snapName(v).getBytes(UTF_8)) finally out.close()
    val fc = FileContext.getFileContext(
      fs.makeQualified(table).toUri, spark.sessionState.newHadoopConf())
    fc.rename(fs.makeQualified(tmp), fs.makeQualified(new Path(table, Pointer)),
      Options.Rename.OVERWRITE)
  }

  /** Deletes snapshots older than the `keepLast` most recent PUBLISHED
    * versions (the pointed-at snapshot is always kept). Returns the
    * deleted directory names. Safe to run beside readers whose
    * staleness is under `keepLast` publishes. */
  def vacuum(spark: SparkSession, tablePath: String,
      keepLast: Int = 2): Seq[String] = {
    require(keepLast >= 1, s"vacuum: keepLast must be >= 1, got $keepLast")
    val table = new Path(tablePath)
    val fs = fsOf(spark, table)
    currentVersion(spark, tablePath) match {
      case None => Seq.empty
      case Some(cur) =>
        val floor = cur - keepLast + 1
        fs.listStatus(table).toSeq
          .map(_.getPath)
          .filter { p =>
            val n = p.getName
            n.startsWith("snap-") &&
              scala.util.Try(n.stripPrefix("snap-").toLong).toOption
                .exists(v => v < floor)
          }
          .sortBy(_.getName)
          .flatMap { p =>
            if (fs.delete(p, true)) Some(p.getName)
            else throw new java.io.IOException(s"SnapshotStore: vacuum could not delete $p")
          }
    }
  }
}
