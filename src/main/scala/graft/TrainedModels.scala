package graft

/** Session-scoped cache for DRIVER-SIDE trained artifacts — k-means
  * centroids (a4's IVF quantizer, d7's SemDeDup cells) and PQ
  * codebooks (a7): the train-once / serve-many discipline of a
  * production index build. A serving session answers many queries
  * against ONE trained index; without this memo every query that
  * touches a trained quantizer re-runs its Lloyd iterations — at
  * 100 TB that is re-paying the index-construction pass per query.
  *
  * Keyed by session identity + model kind + corpus dir +
  * hyperparameters: a corpus or parameter change trains fresh, and a
  * restarted session in the same JVM cannot inherit a foreign
  * session's model (the same rule as [[Caches.shared]]). Values are
  * small driver-side objects (k·dims doubles — the documented MLlib
  * collect shape), so the cache holds kilobytes, not data.
  */
object TrainedModels {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()
  private val builds =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  private val keyLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Build-or-reuse: `build` runs at most once per (session, key).
    * Locking is PER KEY (double-checked), not global: concurrent
    * trainings of DIFFERENT models (Bench overlaps the four trainer
    * chains; store builds nest memo calls for their quantizers) run
    * in parallel, while two requests for the SAME key still build
    * once — the second blocks on the first and reads its result.
    *
    * INVARIANT (unenforced, required because `build` runs under the
    * key's monitor): nested memo calls must form a DAG — a build for
    * key A may memo-call key B only if no build for B (transitively)
    * memo-calls A. Today's nesting is strictly hierarchical (store
    * builds memo their quantizers; quantizers memo nothing), so no
    * cycle exists; two overlapped chains that nest-memoized each
    * other's keys in OPPOSITE orders would deadlock — keep new
    * nesting one-directional. */
  def memo[T <: AnyRef](spark: org.apache.spark.sql.SparkSession,
                        key: String)(build: => T): T = {
    val full = s"${System.identityHashCode(spark)}:$key"
    val got = cache.get(full)
    if (got != null) return got.asInstanceOf[T]
    val lock = keyLocks.computeIfAbsent(full, _ => new Object)
    lock.synchronized {
      val again = cache.get(full)
      if (again != null) again.asInstanceOf[T]
      else {
        val v = build
        builds.merge(full, 1, (a, b) => a + b)
        cache.put(full, v)
        v
      }
    }
  }

  /** How many times `build` actually ran for this key (spec hook). */
  private[graft] def buildCount(spark: org.apache.spark.sql.SparkSession,
                                key: String): Int =
    Option(builds.get(s"${System.identityHashCode(spark)}:$key"))
      .fold(0)(_.intValue)

  /** Drop every cached model (corpus switch / process shutdown). The
    * lock map clears too — entries are per-corpus keys that would
    * otherwise accumulate across corpus switches. */
  def clear(): Unit = { cache.clear(); builds.clear(); keyLocks.clear() }
}
