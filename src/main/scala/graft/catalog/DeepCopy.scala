package graft.catalog

import org.apache.hadoop.fs.Path

/** Executor-runnable copy-and-verify task for deep clone (the distcp
  * shape): each invocation copies ONE file `srcRoot/rel -> dstRoot/rel`
  * and proves the copy by md5 before returning. It opens its own
  * FileSystem handles from the root URIs — Hadoop `FileSystem` is not
  * serializable, so the Spark-job path ships only three strings per task
  * and every task resolves its filesystems locally (FileSystem.get caches
  * per scheme+authority, so this is one lookup, not one connection, per
  * task).
  *
  * Writes are STAGED: each attempt streams to an attempt-unique `.tmp-`
  * name, verifies THAT file's md5 against the source, and only then
  * renames it over the final path (replacing any leftover from a crashed
  * earlier clone or a killed rival attempt). A speculative/zombie twin of
  * the same task therefore can never tear the final file after its
  * sibling verified it — only complete, verified bytes are ever renamed
  * into place (the same staged-rename protocol every writer in this
  * engine uses).
  */
private[catalog] object DeepCopy extends Serializable {

  /** Copy one file and prove the copy: md5 is computed over the source
    * stream WHILE copying into an attempt-unique temp, the written temp
    * is re-read and hashed — a torn or bit-flipped copy fails here,
    * before anything reaches the final name — and the verified temp is
    * renamed over the destination. Returns the byte count. */
  def copyVerified(srcRoot: String, dstRoot: String, rel: String): Long =
    copyVerified(srcRoot, rel, dstRoot, rel)

  /** [[copyVerified]] with independent source and destination relative
    * paths (the external-import shape: source layout is not ours). */
  def copyVerified(srcRoot: String, srcRel: String,
                   dstRoot: String, dstRel: String): Long = {
    val srcFs = graft.core.LakeStorage.openFor(srcRoot)
    val dstFs = graft.core.LakeStorage.openFor(dstRoot)
    val src = new Path(srcRoot, srcRel)
    val dst = new Path(dstRoot, dstRel)
    val tmp = new Path(dst.getParent,
      s".tmp-clone-${java.util.UUID.randomUUID()}-${dst.getName}")
    def digest(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
    try {
      val srcMd5 = digest()
      var bytes = 0L
      val in = srcFs.open(src)
      val out = dstFs.create(tmp, true)
      try {
        val buf = new Array[Byte](1 << 20)
        var n = in.read(buf)
        while (n >= 0) {
          if (n > 0) { srcMd5.update(buf, 0, n); out.write(buf, 0, n); bytes += n }
          n = in.read(buf)
        }
      } finally { in.close(); out.close() }
      val dstMd5 = digest()
      val back = dstFs.open(tmp)
      try {
        val buf = new Array[Byte](1 << 20)
        var n = back.read(buf)
        while (n >= 0) {
          if (n > 0) dstMd5.update(buf, 0, n)
          n = back.read(buf)
        }
      } finally back.close()
      require(java.util.Arrays.equals(srcMd5.digest(), dstMd5.digest()),
        s"deep clone copy verification failed: $src -> $tmp content hash mismatch")
      if (dstFs.exists(dst) && !dstFs.delete(dst, false))
        throw new java.io.IOException(s"deep clone: could not replace $dst")
      if (!dstFs.rename(tmp, dst))
        throw new java.io.IOException(s"deep clone: rename failed for $tmp -> $dst")
      bytes
    } catch { case e: Throwable =>
      try { dstFs.delete(tmp, false); () } catch { case _: java.io.IOException => () }
      throw e
    }
  }

  /** Copy+verify a whole (srcRel → dstRel) file list, choosing HOW by
    * size (shared by deep clone and the register_files import arm):
    * above `thresholdBytes` the copy runs as ONE Spark job over the list
    * — one task per file doing copy + md5, the distcp shape — so
    * throughput scales with the cluster, not one driver NIC; below it a
    * bounded driver pool wins (no job-scheduling latency on
    * metadata-sized moves). The planning pass reads file sizes from the
    * source listing (also a fail-fast existence check before any bytes
    * move) and bails out of the sum early once the threshold is crossed.
    * Returns total bytes copied. On failure the driver pool is
    * `shutdownNow`-stopped so in-flight rivals cannot keep writing into
    * a tree the caller is about to clean up. */
  def copyList(srcRoot: String, dstRoot: String,
               pairs: Seq[(String, String)], thresholdBytes: Long): Long = {
    if (pairs.isEmpty) return 0L
    val srcFs = graft.core.LakeStorage.openFor(srcRoot)
    var planned = 0L
    val it = pairs.iterator
    while (planned < thresholdBytes && it.hasNext)
      planned += srcFs.getFileStatus(new Path(srcRoot, it.next()._1)).getLen
    val active = org.apache.spark.sql.SparkSession.getActiveSession
    if (planned >= thresholdBytes && active.isDefined) {
      val sc = active.get.sparkContext
      val (sr, dr) = (srcRoot, dstRoot)
      sc.parallelize(pairs, pairs.length)
        .map { case (s, d) => copyVerified(sr, s, dr, d) }
        .fold(0L)(_ + _)
    } else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(16, math.max(1, pairs.length)))
      try {
        val futures = pairs.map { case (s, d) =>
          pool.submit(new java.util.concurrent.Callable[Long] {
            override def call(): Long = copyVerified(srcRoot, s, dstRoot, d)
          })
        }
        futures.map(_.get()).sum
      } finally pool.shutdownNow()
    }
  }
}
