package graft.core

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Bronze compaction (the north-star's OPTIMIZE/rewrite-files action,
  * BASELINE.json:7, on plain parquet since no table-format jars ship here).
  *
  * The one-document-per-object publish pattern (ref write amplification:
  * 1 object per resource, BASELINE.md) produces small-file storms at scale.
  * Compaction rewrites a partition subtree into ~targetFileBytes parquet
  * files: read -> coalesce to ceil(bytes/target) -> atomic swap via
  * temp-dir rename. Run per partition (tenant/date) so reads stay pruned
  * and the rewrite parallelizes across partitions.
  */
object LakeCompaction {

  /** Compact one directory of small files into parquet. Returns
    * (filesBefore, filesAfter). */
  def compactParquet(spark: SparkSession, dir: String,
                     targetFileBytes: Long = 128L * 1024 * 1024): (Long, Long) = {
    val fs = LakeStorage.openFor(dir)
    val path = new org.apache.hadoop.fs.Path(dir)
    val before = fs.listStatus(path).filter(_.isFile)
    val totalBytes = before.map(_.getLen).sum
    val nOut = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    val tmp = new org.apache.hadoop.fs.Path(dir + "__compacting")
    spark.read.parquet(dir).coalesce(nOut)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    // Hadoop delete/rename signal failure via booleans, not exceptions —
    // a swallowed failed rename after a successful delete would silently
    // drop the partition. Fail loudly instead; the compacted copy stays in
    // the __compacting dir for manual recovery.
    if (!fs.delete(path, true))
      throw new IllegalStateException(s"compaction: failed to delete $path")
    if (!fs.rename(tmp, path))
      throw new IllegalStateException(
        s"compaction: failed to move $tmp into place; data preserved at $tmp")
    val after = fs.listStatus(path).filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    (before.length.toLong, after.length.toLong)
  }
}
