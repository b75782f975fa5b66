package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Per-query cost census for the optimization round: wall seconds plus the
  * overhead drivers that dominate at bench scale (tiny sf0.1 inputs) —
  * Spark jobs launched, stages run, tasks run, cumulative executor-run time.
  *
  * At 11 MB of lineitem the data is never the bottleneck; gates spend their
  * seconds on job/stage scheduling, shuffle fixed costs, planning, catalog
  * commits and stream-trigger machinery. A gate with 400 jobs is
  * driver-loop-bound no matter how fast each job is; a query with 9 stages
  * for 2 logical shuffles carries AQE re-materialization overhead.
  *
  * args: <sfDir> <nameSubstring>[,<nameSubstring>...] [rounds]
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val wanted = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val rounds = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (sys.env.getOrElse("SPARK_GRAFT_CACHE", "0") == "1") {
      graft.core.Tables.names.filterNot(_ == "events").foreach { t =>
        try graft.core.Tables.load(spark, sfDir, t).cache().count()
        catch { case _: Throwable => () }
      }
      try graft.core.Tables.events(spark, sfDir).cache().count()
      catch { case _: Throwable => () }
    }

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskTimeMs = new AtomicLong(0L)
    // verbose mode: one line per job with its call site + description —
    // attributes a driver-bound gate's job storm to the emitting code
    val verbose = sys.env.getOrElse("SPARK_GRAFT_PROBE_VERBOSE", "0") == "1"
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (verbose) {
          val cs = Option(j.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
          val desc = Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
          System.err.println(s"[probe-job] ${j.jobId} $cs | ${desc.take(80)}")
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null) taskTimeMs.addAndGet(t.taskInfo.duration)
    }
    spark.sparkContext.addSparkListener(listener)

    val sel = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => wanted.exists(n.contains) }

    println(f"${"query"}%-34s round  sec     jobs stages  tasks  taskSec")
    sel.foreach { case (name, fn) =>
      (0 to rounds).foreach { r =>
        // settle listener bus so counts attribute to this round
        Thread.sleep(200)
        jobs.set(0); stages.set(0); tasks.set(0); taskTimeMs.set(0)
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).queryExecution.toRdd.count()
          val sec = (System.nanoTime() - t0) / 1e9
          Thread.sleep(200)
          println(f"$name%-34s $r%5d  ${sec}%6.2f ${jobs.get}%6d ${stages.get}%6d ${tasks.get}%6d  ${taskTimeMs.get / 1e3}%7.1f")
        } catch { case e: Throwable =>
          println(s"$name round $r FAILED: ${e.getMessage}")
        }
        (spark +: graft.queries.QueryModule.trackedSessions).foreach { sess =>
          sess.streams.active.foreach { q => try q.stop() catch { case _: Throwable => () } }
        }
      }
    }
    spark.stop()
  }
}
