package graft.core

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Manifest-committed table versions: the minimal transaction-log pattern
  * (the core of what Delta/Iceberg provide, on plain parquet — no
  * table-format jars ship in this environment, BASELINE.json:6).
  *
  * Layout:
  * {{{
  *   dir/v=1/part-*.parquet     version data directories
  *   dir/v=2/part-*.parquet
  *   dir/_commit_00000000000000000001   commit markers (empty files)
  *   dir/_commit_00000000000000000002
  * }}}
  *
  * A version becomes visible through ONE atomic object creation: the commit
  * marker, written only after its data directory is complete. Readers list
  * the markers, take the max, and read that version's directory — so a
  * reader concurrent with a rewrite sees either the old or the new version,
  * never a missing or half-written directory (the reader-visible window of
  * rename-swap compaction, LakeCompaction.compactParquet, is gone). A crash
  * between data write and marker leaves an invisible orphan directory that
  * [[vacuum]] removes.
  *
  * Works on any Hadoop FileSystem including object stores (no rename
  * anywhere; a marker appears to readers all-or-nothing). The concurrency
  * model is SINGLE-writer/many-reader — the reference's publish model.
  * Concurrent writers are NOT arbitrated: `create(overwrite = false)` is
  * atomic on HDFS/local but check-then-act on S3A-style object stores, so
  * duplicate-commit detection there is best-effort only (two racing writers
  * can both "commit" the same version number; last PUT wins). A store with
  * conditional-PUT (If-None-Match) would close that hole — out of scope for
  * the single-writer model. [[vacuum]] keeps the previous version as a
  * grace window for in-flight readers; schedule it accordingly.
  */
object ManifestTable {

  private val MarkerPrefix = "_commit_"

  private def marker(n: Long): String = f"${MarkerPrefix}$n%020d"

  def versionDir(dir: String, n: Long): String = s"$dir/v=$n"

  /** Parse a name of the form `prefix<long>`; None for foreign files that
    * merely share the prefix (a stray `v=2_tmp` or `_commit_x` must not
    * crash manifest resolution or vacuum). */
  private def parseSuffix(name: String, prefix: String): Option[Long] =
    if (!name.startsWith(prefix)) None
    else scala.util.Try(name.stripPrefix(prefix).toLong).toOption

  /** Highest committed version, if any. */
  def currentVersion(dir: String): Option[Long] = allVersions(dir).lastOption

  /** Write `df` as the next version and commit it. Returns the version. */
  def write(df: DataFrame, dir: String): Long = {
    val next = currentVersion(dir).getOrElse(0L) + 1
    df.write.mode(SaveMode.Overwrite).parquet(versionDir(dir, next))
    commit(dir, next)
    next
  }

  /** Read the current committed version, or a specific one (time travel —
    * any version not yet vacuumed stays readable; an uncommitted or
    * vacuumed version rejects rather than resolving to a partial dir). */
  def read(spark: SparkSession, dir: String, asOfVersion: Option[Long] = None): DataFrame = {
    val committed = allVersions(dir)
    if (committed.isEmpty)
      throw new IllegalStateException(s"no committed version under $dir")
    val v = asOfVersion match {
      case None => committed.max
      case Some(req) =>
        if (!committed.contains(req)) throw new IllegalStateException(
          s"version $req is not committed under $dir (committed: ${committed.mkString(",")})")
        req
    }
    spark.read.parquet(versionDir(dir, v))
  }

  /** All committed versions still present (ascending). */
  def allVersions(dir: String): Seq[Long] = {
    val fs = LakeStorage.openFor(dir)
    val base = new Path(dir)
    if (!fs.exists(base)) return Seq.empty
    fs.listStatus(base).iterator
      .map(_.getPath.getName)
      .flatMap(parseSuffix(_, MarkerPrefix))
      .toSeq.sorted
  }

  /** Rewrite the current version into ~targetFileBytes files as a NEW
    * committed version (the OPTIMIZE/rewrite-files action without the
    * rename-swap window). Returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, dir: String,
              targetFileBytes: Long = 128L * 1024 * 1024): (Long, Long) = {
    val fs = LakeStorage.openFor(dir)
    val cur = currentVersion(dir).getOrElse(
      throw new IllegalStateException(s"no committed version under $dir"))
    val curPath = new Path(versionDir(dir, cur))
    val files = fs.listStatus(curPath)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val totalBytes = files.map(_.getLen).sum
    val nOut = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    val next = cur + 1
    spark.read.parquet(curPath.toString).coalesce(nOut)
      .write.mode(SaveMode.Overwrite).parquet(versionDir(dir, next))
    commit(dir, next)
    val after = fs.listStatus(new Path(versionDir(dir, next)))
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    (files.length.toLong, after.toLong)
  }

  /** Delete uncommitted orphan directories and committed versions older
    * than the `keep` most recent (keep >= 2 leaves a grace version for
    * readers that resolved the manifest just before a commit). Returns the
    * number of directories removed. */
  def vacuum(dir: String, keep: Int = 2): Int = {
    require(keep >= 1, "must keep at least the current version")
    val fs = LakeStorage.openFor(dir)
    val base = new Path(dir)
    if (!fs.exists(base)) return 0
    val committed = fs.listStatus(base)
      .map(_.getPath.getName)
      .flatMap(parseSuffix(_, MarkerPrefix))
      .sorted
    if (committed.isEmpty) return 0
    val cutoff = committed.takeRight(keep).head
    var removed = 0
    fs.listStatus(base).foreach { st =>
      val name = st.getPath.getName
      if (st.isDirectory) parseSuffix(name, "v=").foreach { v =>
        // orphans (no marker) below the current version are dead too
        val dead = v < cutoff || (!committed.contains(v) && v < committed.last)
        if (dead) {
          if (!fs.delete(st.getPath, true))
            throw new IllegalStateException(s"vacuum: failed to delete ${st.getPath}")
          removed += 1
        }
      }
      else parseSuffix(name, MarkerPrefix).foreach { v =>
        if (v < cutoff) { fs.delete(st.getPath, false); () }
      }
    }
    removed
  }

  private def commit(dir: String, n: Long): Unit = {
    val fs = LakeStorage.openFor(dir)
    val p = new Path(dir, marker(n))
    // overwrite=false fails a duplicate commit on filesystems with atomic
    // create (HDFS/local); on S3A it is check-then-act, i.e. best-effort
    // only — see the class doc's single-writer model
    val out = fs.create(p, false)
    out.close()
  }
}
