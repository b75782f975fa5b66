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
  * The target is created with overwrite=true: a file left behind by a
  * crashed earlier clone attempt is simply rewritten, making retries
  * idempotent — the post-write re-read hash still proves the FINAL bytes,
  * so a torn or stale leftover can never survive verification.
  */
private[catalog] object DeepCopy extends Serializable {

  /** Copy one file and prove the copy: md5 is computed over the source
    * stream WHILE copying, then the written target is re-read and hashed
    * — a torn or bit-flipped copy fails here, before the migrated table
    * can commit over it. Returns the byte count. */
  def copyVerified(srcRoot: String, dstRoot: String, rel: String): Long = {
    val srcFs = graft.core.LakeStorage.openFor(srcRoot)
    val dstFs = graft.core.LakeStorage.openFor(dstRoot)
    val src = new Path(srcRoot, rel)
    val dst = new Path(dstRoot, rel)
    def digest(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
    val srcMd5 = digest()
    var bytes = 0L
    val in = srcFs.open(src)
    val out = dstFs.create(dst, true)
    try {
      val buf = new Array[Byte](1 << 20)
      var n = in.read(buf)
      while (n >= 0) {
        if (n > 0) { srcMd5.update(buf, 0, n); out.write(buf, 0, n); bytes += n }
        n = in.read(buf)
      }
    } finally { in.close(); out.close() }
    val dstMd5 = digest()
    val back = dstFs.open(dst)
    try {
      val buf = new Array[Byte](1 << 20)
      var n = back.read(buf)
      while (n >= 0) {
        if (n > 0) dstMd5.update(buf, 0, n)
        n = back.read(buf)
      }
    } finally back.close()
    require(java.util.Arrays.equals(srcMd5.digest(), dstMd5.digest()),
      s"deep clone copy verification failed: $src -> $dst content hash mismatch")
    bytes
  }
}
