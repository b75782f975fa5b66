package graft.core

import java.io.IOException
import java.net.URI
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}

/** Key-addressed object storage over any Hadoop FileSystem.
  *
  * Replaces the reference's OCI client (ref: OCIClient.kt): `file://` for
  * local runs; s3a/abfs/gcs connectors on a cluster via the same API. All
  * operations are point operations on exact paths — the distributed write
  * path lives in [[DatalakePublishService]] (foreachPartition, one
  * FileSystem handle per partition, mirroring the reference's
  * one-dedicated-client-per-batch amortization,
  * ref: DatalakePublishService.kt:63,104).
  *
  * Semantics preserved (SURVEY.md §7.4):
  *  - get: missing object -> None (404 -> null, ref: OCIClient.kt:182-187);
  *    other IO errors propagate.
  *  - put: one retry after a fixed delay on IO failure, then false
  *    (ref: OCIClient.kt:139-161 — single retry, 5 s).
  *  - exists: HEAD-equivalent (ref: OCIClient.kt:231-247).
  */
class LakeStorage(val root: String, conf: Configuration, retryDelayMs: Long = 5000L)
    extends Serializable {

  @transient private lazy val fs: FileSystem =
    FileSystem.get(new URI(root), conf)

  private def path(fileName: String): Path = new Path(root, fileName)

  /** Write a document; true on success, single delayed retry on IO failure. */
  def put(fileName: String, data: String): Boolean =
    LakeStorage.putWith(fs, path(fileName), data, retryDelayMs)

  /** Byte-stream upload (the reference's InputStream variant,
    * ref: OCIClient.kt:101-137). */
  def putBytes(fileName: String, data: Array[Byte]): Boolean = {
    def attempt(): Boolean = {
      val out = fs.create(path(fileName), true)
      try { out.write(data); true } finally out.close()
    }
    try attempt()
    catch {
      case _: IOException =>
        Thread.sleep(retryDelayMs)
        try attempt() catch { case _: IOException => false }
    }
  }

  /** Point read; None when missing (the reference's 404->null). */
  def get(fileName: String): Option[String] = {
    val p = path(fileName)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), UTF_8))
      finally in.close()
    }
  }

  def exists(fileName: String): Boolean = fs.exists(path(fileName))

  def status(fileName: String): Option[FileStatus] =
    if (fs.exists(path(fileName))) Some(fs.getFileStatus(path(fileName))) else None

  /** Recursive listing of object names relative to the root (test/tooling
    * surface; at scale prefer partition-pruned reads over full listings). */
  def listRecursive(prefix: String = ""): Seq[String] = {
    val base = if (prefix.isEmpty) new Path(root) else path(prefix)
    if (!fs.exists(base)) return Seq.empty
    val it = fs.listFiles(base, true)
    val rootUri = fs.makeQualified(new Path(root)).toUri.getPath
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val st = it.next()
      val full = st.getPath.toUri.getPath
      buf += full.stripPrefix(rootUri).stripPrefix("/")
    }
    buf.toSeq
  }

  def delete(fileName: String): Boolean = fs.delete(path(fileName), true)
}

object LakeStorage {
  /** Shared by driver-side puts and executor-side foreachPartition writers. */
  def putWith(fs: FileSystem, p: Path, data: String, retryDelayMs: Long): Boolean = {
    def attempt(): Boolean = {
      val out = fs.create(p, true)
      try { out.write(data.getBytes(UTF_8)); true }
      finally out.close()
    }
    try attempt()
    catch {
      case _: IOException =>
        // Reference: exactly one retry after a fixed delay, only for
        // transient failures (OCIClient.kt:148-158). Hadoop FS surfaces
        // transient store errors as IOException.
        Thread.sleep(retryDelayMs)
        try attempt()
        catch { case _: IOException => false }
    }
  }

  def openFor(root: String): FileSystem =
    FileSystem.get(new URI(root), new Configuration())

  /** Atomic create-exclusive across PROCESSES — the claim primitive the
    * optimistic commit protocols (manifest markers, keyedlog journal,
    * seen-log fence) build on. Hadoop's LOCAL filesystem implements
    * `create(p, overwrite = false)` as check-then-act, so two JVMs could
    * both claim one path; `file://` URIs therefore go through java.nio's
    * CREATE_NEW (O_EXCL — atomic on POSIX), restoring exactly-one-winner.
    * Store-class matrix: local `file://` — atomic (this path); HDFS —
    * atomic (namenode create is exclusive by design); S3A-class object
    * stores without conditional PUT — check-then-act, best-effort (a
    * store with If-None-Match closes the hole; the documented protocol
    * caveat). Returns None when the path already exists — the caller
    * lost the race. CommitRaceSpec proves the local-FS guarantee with two
    * contending JVMs. */
  def createExclusive(fs: FileSystem, p: Path): Option[java.io.OutputStream] =
    if (fs.getScheme == "file") {
      val local = java.nio.file.Paths.get(p.toUri.getPath)
      Option(local.getParent).foreach(java.nio.file.Files.createDirectories(_))
      try Some(java.nio.file.Files.newOutputStream(local,
        java.nio.file.StandardOpenOption.CREATE_NEW,
        java.nio.file.StandardOpenOption.WRITE))
      catch { case _: java.nio.file.FileAlreadyExistsException => None }
    } else {
      try Some(fs.create(p, false))
      catch { case _: IOException => None }
    }
}
