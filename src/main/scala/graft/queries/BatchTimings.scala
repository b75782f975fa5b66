package graft.queries

/** Per-micro-batch wall-time telemetry for the streaming gates.
  *
  * A trigger-paced gate's wall time is micro-batch work PLUS stream
  * machinery (trigger waits, offset-log round trips) — on a contended
  * box the machinery amplifies while the work doesn't, which is
  * indistinguishable from a real regression in the gate's single
  * number. Gates record each foreachBatch body's wall time here (and
  * the whole drain as batch id -1); [[graft.Bench]] drains the queue
  * into a `stream_batches` field of its JSON line, so a bench-to-bench
  * comparison can localize a mover: slow BATCHES = real work
  * regression, slow drain with flat batches = machinery/contention. */
object BatchTimings {
  /** The whole-drain pseudo batch id. */
  val DrainId: Long = -1L

  private val q =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Double)]()

  def record(query: String, batchId: Long, sec: Double): Unit = {
    q.add((query, batchId, sec)); ()
  }

  /** Time `body`, record it, pass its result through. */
  def timed[T](query: String, batchId: Long)(body: => T): T = {
    val t0 = System.nanoTime()
    try body finally record(query, batchId, (System.nanoTime() - t0) / 1e9)
  }

  /** Everything recorded so far, in arrival order (recordings survive —
    * Bench snapshots once, after all rounds). */
  def snapshot(): Seq[(String, Long, Double)] = {
    val b = Seq.newBuilder[(String, Long, Double)]
    q.forEach(e => b += e)
    b.result()
  }
}
