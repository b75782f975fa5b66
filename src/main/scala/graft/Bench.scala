package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, one JSON line on stdout.
  *
  * Each query gets one warmup execution (JIT + codegen compile + file-index
  * warm) and the reported time is the best of two measured runs —
  * steady-state throughput, which is what matters at cluster scale where
  * per-query JVM warmup amortizes to zero.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // let AQE coalesce post-shuffle partitions even when the plan is
      // cached/persisted (the dedup operators persist small intermediates;
      // without this, every one of their shuffles keeps all 32 partitions
      // and per-task fixed cost dominates the small candidate stages)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Hot-tier condition (default on; SPARK_GRAFT_CACHE=0 for cold scans):
    // cache the input tables once — Spark's CacheManager matches canonical
    // plans, so every query's spark.read.parquet of the same path serves
    // from memory, the serving condition of a warmed cluster cache tier.
    if (sys.env.getOrElse("SPARK_GRAFT_CACHE", "1") == "1") {
      // events needs its nanos conversion path (plain load rejects ns parquet)
      graft.core.Tables.names.filterNot(_ == "events").foreach { t =>
        try graft.core.Tables.load(spark, sfDir, t).cache().count()
        catch { case e: Throwable =>
          System.err.println(s"[bench] warm-cache of $t failed: ${e.getMessage}")
        }
      }
      try graft.core.Tables.events(spark, sfDir).cache().count()
      catch { case e: Throwable =>
        System.err.println(s"[bench] warm-cache of events failed: ${e.getMessage}")
      }
    }

    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      // Force FULL evaluation of the executed plan. A plain .count() lets
      // Catalyst prune every unreferenced projection and drop unused sorts,
      // so expression-only queries would be measured as a row count over
      // cached parquet instead of their real work. toRdd materializes every
      // output row of the optimized physical plan (AQE included) without
      // collecting to the driver.
      fn(spark, sfDir).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }

    // SPARK_GRAFT_FILTER: optional name-substring filter for local iteration
    // (the driver leaves it unset and benches everything)
    val nameFilter = sys.env.getOrElse("SPARK_GRAFT_FILTER", "")
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(_._1.contains(nameFilter))
    // Best-of-3 with INTERLEAVED rounds: run the whole suite once as warmup
    // (JIT + codegen + file-index warm, unrecorded), then three full
    // recorded passes, keeping each query's minimum. Interleaving separates
    // a query's three measurements by the length of a full pass, so a
    // minutes-long interference window on a shared box (observed: a
    // co-tenant burst turning a 5 s stream query into 61 s) can no longer
    // cover every measurement of the same query — back-to-back repeats
    // have no such protection. min is the steady-state estimator.
    val times = scala.collection.mutable.Map.empty[String, Double]
    val failed = scala.collection.mutable.Set.empty[String]
    // SPARK_GRAFT_STAT: per-query estimator over the 3 recorded rounds —
    // "min" (default; the steady-state estimator the driver compares) or
    // "median" (robust to one-shot co-tenant interference in BOTH
    // directions: a single lucky round can no longer mask a regression,
    // so round-over-round deltas are less noisy — the self-artifact's
    // estimator)
    val stat = sys.env.getOrElse("SPARK_GRAFT_STAT", "min")
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
    for (round <- 0 to 3; (name, fn) <- selected if !failed(name)) {
      try {
        val t = once(fn)
        if (round > 0) samples(name) = t :: samples.getOrElse(name, Nil)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed (round $round): ${e.getMessage}")
        failed += name
        times(name) = -1.0
      }
    }
    val mins = scala.collection.mutable.Map.empty[String, Double]
    val medians = scala.collection.mutable.Map.empty[String, Double]
    // a query that failed in ANY round reports -1 everywhere, even if an
    // earlier recorded round produced a sample — a partial result must
    // never masquerade as a healthy timing
    samples.foreach { case (name, ts) if !failed(name) =>
      val sorted = ts.sorted
      mins(name) = sorted.head
      medians(name) = sorted(sorted.length / 2)
      times(name) = if (stat == "median") medians(name) else mins(name)
    case _ => ()
    }
    failed.foreach { name =>
      mins(name) = -1.0; medians(name) = -1.0; times(name) = -1.0
    }
    val results = selected.map { case (name, _) => name -> times(name) }
    def obj(m: scala.collection.Map[String, Double]) =
      selected.map { case (k, _) => "\"" + k + "\":" + m(k) }
        .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    // "queries" = the selected estimator (driver contract); both
    // estimators ride alongside so rounds compare min-to-min AND
    // median-to-median regardless of which was selected
    // "env" records the harness shape: cpus sets BOTH parallelism and
    // shuffle.partitions, and a 32-cpu run doubles tiny sf0.1 stage counts
    // (~1.28× uniformly slower, measured round 10) — cross-round
    // comparisons must match env.cpus or compare the default-cpu
    // self-bench artifacts (BENCH_SELF_r*.json)
    val env = s"""{"cpus":"$cpus","shuffle_partitions":"$cpus","stat":"$stat",""" +
      s""""cache":"${sys.env.getOrElse("SPARK_GRAFT_CACHE", "1")}"}"""
    // per-micro-batch wall times the streaming gates recorded (all rounds,
    // arrival order; batch -1 = the whole drain): localizes a stream-gate
    // mover to real batch work vs trigger-wait machinery under contention
    val streamBatches = graft.queries.BatchTimings.snapshot()
      .groupBy(_._1).toSeq.sortBy(_._1).map { case (name, entries) =>
        val items = entries.map { case (_, b, sec) =>
          s"""{"batch":$b,"sec":${math.rint(sec * 1000) / 1000}}"""
        }.mkString("[", ",", "]")
        "\"" + name + "\":" + items
      }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${obj(times)},""" +
      s""""queries_min":${obj(mins)},"queries_median":${obj(medians)},""" +
      s""""stream_batches":$streamBatches,"sf":"$sfDir","env":$env}""")
    spark.stop()
  }
}
