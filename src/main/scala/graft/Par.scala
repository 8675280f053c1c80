package graft

/** Concurrent submission of INDEPENDENT Spark actions from the
  * driver (the guide's "overlap independent jobs" rule): actions are
  * only sequential because driver code calls them sequentially, so a
  * store build that writes four artifacts from one persisted frame, or
  * a compaction that rewrites six artifacts of one live view, submits
  * them together and lets the scheduler back-fill each job's straggler
  * tail with the next job's tasks. Callers guarantee independence
  * (disjoint output directories, shared inputs already materialized
  * in the block cache) — this helper only handles submission, waiting
  * and failure propagation. */
object Par {

  private lazy val pool = java.util.concurrent.Executors.newCachedThreadPool(
    (r: Runnable) => {
      val t = new Thread(r)
      t.setDaemon(true)
      t.setName("graft-par-" + t.getId)
      t
    })

  /** Run every task, wait for all, rethrow the first failure (after
    * every task has finished, so no write is abandoned mid-flight).
    * Single task short-circuits to a plain call — no thread hop.
    * EVERY outcome of the wait is absorbed until all tasks returned —
    * an interrupt of the waiting thread (flag re-set, surfaced after
    * the drain) must not abandon in-flight write jobs any more than a
    * task failure may; later failures ride along as suppressed. */
  def run(tasks: Seq[() => Unit]): Unit =
    if (tasks.sizeIs <= 1) tasks.foreach(_.apply())
    else {
      val futs = tasks.map { t =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = t()
        })
      }
      var failure: Option[Throwable] = None
      var interrupted = false
      def record(e: Throwable): Unit =
        if (failure.isEmpty) failure = Some(e)
        else if (failure.get ne e) failure.get.addSuppressed(e)
      futs.foreach { f =>
        var done = false
        while (!done) {
          try { f.get(); done = true }
          catch {
            case e: java.util.concurrent.ExecutionException =>
              record(Option(e.getCause).getOrElse(e)); done = true
            case _: InterruptedException =>
              interrupted = true // keep draining; flag restored below
            case e: Throwable =>
              record(e); done = true
          }
        }
      }
      if (interrupted) Thread.currentThread().interrupt()
      failure.foreach(throw _)
      if (interrupted) throw new InterruptedException(
        "interrupted while waiting for concurrent store jobs (all completed)")
    }
}
