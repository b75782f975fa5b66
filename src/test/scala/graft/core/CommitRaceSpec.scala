package graft.core

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** TWO-PROCESS commit races: a second JVM contends with this one on a
  * single table's optimistic commit protocol — the guarantee the
  * in-process specs cannot exercise (a same-JVM lock would mask a broken
  * claim primitive). Proves, for both the manifest marker log and the
  * keyedlog commit journal on a local filesystem:
  *   - no lost update: every commit either got its own version or
  *     rebased onto a later one; the final state contains every file
  *     both writers committed exactly once;
  *   - no duplicated version: the version sequence is gapless and each
  *     version was claimed by exactly one writer.
  * The claim primitive is [[LakeStorage.createExclusive]] (O_EXCL on
  * file:// — Hadoop's own local create(overwrite=false) is
  * check-then-act and WOULD lose updates here). Object stores without
  * conditional PUT remain best-effort; see the store-class matrix on
  * createExclusive. */
class CommitRaceSpec extends AnyFunSuite {

  private val PerWriter = 30

  /** Launch CommitRaceChild in a fresh JVM (same classpath as this forked
    * test JVM). Returns the running Process. */
  private def spawnChild(mode: String, dir: String): Process = {
    val java = s"${System.getProperty("java.home")}/bin/java"
    val cmd = java :: "-cp" :: System.getProperty("java.class.path") ::
      "graft.core.CommitRaceChild" :: mode :: dir :: PerWriter.toString :: "child" :: Nil
    new ProcessBuilder(cmd: _*).inheritIO().start()
  }

  private def awaitOk(p: Process): Unit = {
    assert(p.waitFor(120, java.util.concurrent.TimeUnit.SECONDS),
      "child JVM did not finish in time")
    assert(p.exitValue() === 0, s"child JVM failed with exit ${p.exitValue()}")
  }

  /** Start barrier: the child signals readiness (JVM up, Hadoop FS warm)
    * and blocks on the go-file; the parent releases it and then WAITS
    * until the child's first commit is visible — so the child's loop is
    * provably in flight when the parent's starts, and the two loops
    * genuinely interleave instead of running back-to-back around JVM
    * startup (a fixed sleep here flaked under full-suite box load). */
  private def releaseChildThenStart(dir: String)(childCommitted: => Boolean): Unit = {
    val local = CommitRaceChild.localPath(dir)
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    while (!Files.exists(local.resolve("_race_ready"))) {
      assert(System.nanoTime() < deadline, "child never became ready")
      Thread.sleep(10)
    }
    Files.write(local.resolve("_race_go"), Array.emptyByteArray)
    while (!childCommitted) {
      assert(System.nanoTime() < deadline, "child never committed")
      Thread.sleep(5)
    }
  }

  test("manifest: two JVMs appending concurrently lose nothing, duplicate nothing") {
    val dir = "file://" + Files.createTempDirectory("graft_race_manifest_").toString
    val child = spawnChild("manifest", dir)
    releaseChildThenStart(dir)(ManifestTable.currentVersion(dir).exists(_ >= 1L))
    val parentVersions = (1 to PerWriter).map { i =>
      ManifestTable.commitStagedAppend(dir, Seq(s"d-parent/f$i.parquet"))
    }
    awaitOk(child)
    // the barrier put child commits in flight first: the parent's first
    // commit must have rebased over at least one of them (real contention)
    assert(parentVersions.head > 1L,
      s"loops did not interleave (parent committed first at v${parentVersions.head})")
    val versions = ManifestTable.allVersions(dir)
    assert(versions === (1L to 2L * PerWriter),
      s"version sequence must be gapless and duplicate-free: $versions")
    val files = ManifestTable.manifest(dir, versions.last)
    assert(files.length === 2 * PerWriter, s"lost/duplicated appends: ${files.length}")
    assert(files.count(_.startsWith("d-parent/")) === PerWriter)
    assert(files.count(_.startsWith("d-child/")) === PerWriter)
    // every version resolves (checkpoints + deltas interleaved by two
    // writers must still form one consistent chain)
    assert(versions.forall(v => ManifestTable.manifest(dir, v).nonEmpty))
  }

  test("keyedlog journal: two JVMs committing concurrently lose nothing, duplicate nothing") {
    val dir = Files.createTempDirectory("graft_race_klog_").toString
    val conf = new org.apache.spark.util.SerializableConfiguration(
      new org.apache.hadoop.conf.Configuration())
    val child = spawnChild("keyedlog", dir)
    releaseChildThenStart(dir)(
      graft.sources.KeyedLogVersionLog.versions(dir, conf).nonEmpty)
    val parentVersions = (1 to PerWriter).map { i =>
      graft.sources.KeyedLogVersionLog.commit(dir, conf, Seq(f"parent-$i%03d.log"))
    }
    awaitOk(child)
    assert(parentVersions.head.exists(_ > 0L),
      s"loops did not interleave (parent committed first at ${parentVersions.head})")
    val versions = graft.sources.KeyedLogVersionLog.versions(dir, conf)
    assert(versions === (0L until 2L * PerWriter),
      s"journal versions must be gapless and duplicate-free: $versions")
    val all = versions.flatMap(v =>
      graft.sources.KeyedLogVersionLog.read(dir, conf, v))
    assert(all.length === all.distinct.length, "a file name was journaled twice")
    assert(all.count(_.startsWith("parent-")) === PerWriter)
    assert(all.count(_.startsWith("child-")) === PerWriter)
  }
}

/** The contending process of [[CommitRaceSpec]] — signals readiness,
  * blocks on the go-file, then commits `n` appends to the given table dir
  * as fast as it can and exits 0. Runs without a SparkSession: both
  * protocols are plain Hadoop-FS metadata writers. */
object CommitRaceChild {
  /** The local filesystem path of a (possibly file://-qualified) dir. */
  def localPath(dir: String): java.nio.file.Path =
    if (dir.startsWith("file:")) java.nio.file.Paths.get(new java.net.URI(dir))
    else java.nio.file.Paths.get(dir)

  def main(args: Array[String]): Unit = {
    val Array(mode, dir, nS, tag) = args
    val n = nS.toInt
    // warm the Hadoop FS (first touch loads the FileSystem service) BEFORE
    // signaling ready, so the commit loop starts at full speed on go
    LakeStorage.openFor(dir)
    val local = localPath(dir)
    java.nio.file.Files.createDirectories(local)
    java.nio.file.Files.write(local.resolve("_race_ready"), Array.emptyByteArray)
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (!java.nio.file.Files.exists(local.resolve("_race_go"))) {
      if (System.nanoTime() > deadline) sys.error("go signal never arrived")
      Thread.sleep(5)
    }
    mode match {
      case "manifest" =>
        (1 to n).foreach { i =>
          ManifestTable.commitStagedAppend(dir, Seq(s"d-$tag/f$i.parquet"))
        }
      case "keyedlog" =>
        val conf = new org.apache.spark.util.SerializableConfiguration(
          new org.apache.hadoop.conf.Configuration())
        (1 to n).foreach { i =>
          graft.sources.KeyedLogVersionLog.commit(dir, conf, Seq(f"$tag-$i%03d.log"))
        }
      case other => sys.error(s"unknown mode $other")
    }
  }
}
