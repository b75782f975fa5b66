package graft.core

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicReference

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Manifest-committed table versions: commit visibility, vacuum keep-window
  * and orphan removal, compact round-trip, and — the property the manifest
  * exists for — a reader loop concurrent with compaction never observing a
  * missing or half-written directory (the rename-swap window of
  * LakeCompaction.compactParquet that ManifestTable removes). */
class ManifestTableSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def freshDir(): String =
    "file://" + Files.createTempDirectory("graft_manifest_").toString

  private def df(n: Int, parts: Int = 4) = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong, s"row$i")).toDF("id", "v").repartition(parts)
  }

  test("no committed version: currentVersion None, read throws") {
    val dir = freshDir()
    assert(ManifestTable.currentVersion(dir).isEmpty)
    intercept[IllegalStateException](ManifestTable.read(spark, dir))
  }

  test("write commits monotonically increasing versions; read sees the latest") {
    val dir = freshDir()
    assert(ManifestTable.write(df(10), dir) === 1L)
    assert(ManifestTable.write(df(25), dir) === 2L)
    assert(ManifestTable.currentVersion(dir) === Some(2L))
    assert(ManifestTable.read(spark, dir).count() === 25L)
  }

  test("time travel: any unvacuumed committed version stays readable; others reject") {
    val dir = freshDir()
    ManifestTable.write(df(10), dir)
    ManifestTable.write(df(25), dir)
    ManifestTable.write(df(40), dir)
    assert(ManifestTable.allVersions(dir) === Seq(1L, 2L, 3L))
    assert(ManifestTable.read(spark, dir, Some(1L)).count() === 10L)
    assert(ManifestTable.read(spark, dir, Some(2L)).count() === 25L)
    assert(ManifestTable.read(spark, dir).count() === 40L)
    // uncommitted orphan must reject, not resolve to a partial directory
    df(99).write.parquet(ManifestTable.versionDir(dir, 4L))
    intercept[IllegalStateException](ManifestTable.read(spark, dir, Some(4L)))
    // vacuumed-away version rejects too (marker removed with the data)
    ManifestTable.vacuum(dir, keep = 2)
    intercept[IllegalStateException](ManifestTable.read(spark, dir, Some(1L)))
    assert(ManifestTable.read(spark, dir, Some(2L)).count() === 25L)
  }

  test("an uncommitted data directory is invisible to readers") {
    val dir = freshDir()
    ManifestTable.write(df(10), dir)
    // simulate a crash between data write and marker: v=2 data, no marker
    df(99).write.parquet(ManifestTable.versionDir(dir, 2L))
    assert(ManifestTable.currentVersion(dir) === Some(1L))
    assert(ManifestTable.read(spark, dir).count() === 10L)
  }

  test("compact rewrites into fewer files as a new committed version, rows preserved") {
    val dir = freshDir()
    ManifestTable.write(df(200, parts = 16), dir)
    val (before, after) = ManifestTable.compact(spark, dir)
    assert(before === 16L)
    assert(after < before)
    assert(ManifestTable.currentVersion(dir) === Some(2L))
    assert(ManifestTable.read(spark, dir).count() === 200L)
  }

  test("vacuum removes old versions and uncommitted orphans, keeps the grace window") {
    val dir = freshDir()
    ManifestTable.write(df(10), dir)  // v1
    ManifestTable.write(df(20), dir)  // v2
    ManifestTable.write(df(30), dir)  // v3
    // crash orphan BELOW the current version (no marker for v between commits
    // cannot happen under single-writer, but a leftover failed write can)
    val fs = LakeStorage.openFor(dir)
    df(5).write.parquet(ManifestTable.versionDir(dir, 2L) + "_tmp_orphan_probe")
    val removed = ManifestTable.vacuum(dir, keep = 2)
    assert(removed === 1) // v1 gone; v2 kept as grace; v3 current
    assert(!fs.exists(new Path(ManifestTable.versionDir(dir, 1L))))
    assert(fs.exists(new Path(ManifestTable.versionDir(dir, 2L))))
    assert(fs.exists(new Path(ManifestTable.versionDir(dir, 3L))))
    assert(ManifestTable.read(spark, dir).count() === 30L)
    // marker below the keep-window is gone too
    assert(ManifestTable.currentVersion(dir) === Some(3L))
  }

  test("vacuum removes an invisible crash-orphan version directory") {
    val dir = freshDir()
    ManifestTable.write(df(10), dir)            // v1 committed
    df(99).write.parquet(ManifestTable.versionDir(dir, 2L)) // orphan, no marker
    ManifestTable.write(df(20), dir)            // writer retries -> v2 marker?
    // NOTE: write() picks next = current+1 = 2, overwriting the orphan —
    // which is exactly the recovery a retrying single writer performs
    assert(ManifestTable.currentVersion(dir) === Some(2L))
    assert(ManifestTable.read(spark, dir).count() === 20L)
    // an orphan ABOVE the current version (crash after data, before marker)
    df(7).write.parquet(ManifestTable.versionDir(dir, 3L))
    assert(ManifestTable.read(spark, dir).count() === 20L) // still invisible
    val removed = ManifestTable.vacuum(dir, keep = 1)
    // v1 below keep-window removed; v=3 orphan is NOT below the current
    // version so it is retained for the retrying writer to overwrite
    assert(removed === 1)
    assert(ManifestTable.read(spark, dir).count() === 20L)
  }

  test("vacuum(keep=1) after repeated compaction leaves only the current version") {
    val dir = freshDir()
    ManifestTable.write(df(50, parts = 8), dir)
    ManifestTable.compact(spark, dir)
    ManifestTable.compact(spark, dir)
    val removed = ManifestTable.vacuum(dir, keep = 1)
    assert(removed === 2)
    assert(ManifestTable.read(spark, dir).count() === 50L)
  }

  test("reader loop concurrent with compaction never sees a missing or partial version") {
    val dir = freshDir()
    ManifestTable.write(df(300, parts = 12), dir)
    val failure = new AtomicReference[Throwable](null)
    @volatile var stop = false
    val reader = new Thread(() => {
      try {
        while (!stop) {
          val n = ManifestTable.read(spark, dir).count()
          if (n != 300L)
            failure.compareAndSet(null,
              new AssertionError(s"reader observed $n rows, expected 300"))
        }
      } catch { case t: Throwable => failure.compareAndSet(null, t) }
    })
    reader.start()
    try {
      // compact repeatedly while the reader hammers; also vacuum with a
      // grace version so a reader that resolved the manifest just before a
      // commit still finds its directory
      (1 to 3).foreach { _ =>
        ManifestTable.compact(spark, dir)
        ManifestTable.vacuum(dir, keep = 2)
      }
    } finally {
      stop = true
      reader.join(30000)
    }
    assert(failure.get() === null, s"concurrent reader failed: ${failure.get()}")
    assert(ManifestTable.read(spark, dir).count() === 300L)
  }
}
