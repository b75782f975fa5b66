package graft.core

import java.nio.file.{Files, Path}

/** Temp workspace allocation with JVM-exit cleanup: query functions create
  * scratch lakes/sinks per invocation; without cleanup repeated bench runs
  * accumulate unbounded /tmp usage. */
object TempDirs {
  private val created = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  sys.addShutdownHook {
    created.forEach { p =>
      try deleteRecursively(p.toFile) catch { case _: Exception => () }
    }
  }

  def create(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    created.add(p)
    p.toString
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }
}
