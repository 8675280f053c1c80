package graft

import org.apache.spark.sql.DataFrame
import scala.collection.mutable

/** Registry for persist() handles created inside operator plans.
  *
  * Some plans contain genuine diamonds (a computed DataFrame feeding
  * two consumers) where Catalyst would re-evaluate an expensive
  * expression pipeline on each branch — persisting is the right call,
  * but a bare `.persist()` inside a query builder leaks: the handle
  * is unreachable to the caller, so the cached blocks pin executor
  * memory for the session lifetime (one new set per query).
  *
  * Operators route those persists through [[persist]] so the facade /
  * Bench / Verify can release them once the result is materialized
  * via [[releaseAll]].
  */
object Caches {
  private val tracked = mutable.ListBuffer.empty[DataFrame]
  private val sharedScans =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private val sharedLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  // bumped by releaseShared: a shared build finishing AFTER a corpus
  // switch must not re-register (and leak) a persisted frame for the
  // retired corpus
  private val sharedGen = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Persist `df` (MEMORY_AND_DISK) and track the handle. */
  def persist(df: DataFrame): DataFrame = synchronized {
    tracked += df
    df.persist()
  }

  /** Persist-once SHARED scan: a pipeline-level materialized
    * intermediate several operators read (e.g. the hashed-shingle
    * scan under d2/d4/p1) — the corpus-prep analog of a real
    * deployment computing document signatures once and running every
    * dedup pass against them. Keyed by session+name+dir (a cached
    * DataFrame is bound to the SparkSession that built it, so a
    * second or restarted session in the same JVM rebuilds its own
    * scan instead of inheriting a handle on a foreign/stopped one);
    * built and persisted on first request, returned as-is after.
    * Survives [[releaseAll]] (which scopes per-query diamonds);
    * dropped by [[releaseShared]]. */
  def shared(spark: org.apache.spark.sql.SparkSession, key: String)
            (build: => DataFrame): DataFrame = {
    // identity hash = one namespace per live SparkSession object
    // (sessionUUID is private[sql] in Spark 4). Locking is PER KEY
    // (double-checked): concurrent builds of DIFFERENT shared scans
    // (overlapped store-build jobs) proceed in parallel, the same
    // key still builds exactly once.
    val full = s"${System.identityHashCode(spark)}:$key"
    val got = sharedScans.get(full)
    if (got != null) return got
    val lock = sharedLocks.computeIfAbsent(full, _ => new Object)
    lock.synchronized {
      val again = sharedScans.get(full)
      if (again != null) again
      else {
        val gen = sharedGen.get()
        val df = build.persist()
        // a releaseShared that ran mid-build cleared the registry:
        // registering now would leak a persisted frame for a retired
        // corpus — hand the frame back unregistered and unpersisted
        if (sharedGen.get() == gen) sharedScans.put(full, df)
        else df.unpersist(false)
        df
      }
    }
  }

  /** Unpersist every tracked per-query handle. Call after the
    * consuming action (count/write/collect) has completed —
    * unpersisting earlier would just force recompute. */
  def releaseAll(): Unit = synchronized {
    tracked.foreach(_.unpersist(false))
    tracked.clear()
  }

  /** Run `body` and release the per-query handles it registered —
    * the long-running-process form of [[releaseAll]] (a streaming
    * epoch that calls kernels with internal diamonds must not let
    * one persisted vector-table copy per epoch accumulate for the
    * stream's lifetime). Handles registered CONCURRENTLY by another
    * query land in the scope and release early — semantically safe
    * (persist is a performance hint), and the single-writer
    * maintenance streams this serves don't interleave. */
  def scoped[T](body: => T): T = {
    val mark = synchronized(tracked.length)
    try body
    finally synchronized {
      tracked.drop(mark).foreach(_.unpersist(false))
      tracked.remove(mark, math.max(0, tracked.length - mark))
    }
  }

  /** Unpersist the shared scans (process shutdown / corpus switch).
    * Scans owned by an already-stopped session are dropped silently. */
  def releaseShared(): Unit = synchronized {
    sharedGen.incrementAndGet()
    sharedScans.values.forEach(df =>
      scala.util.Try(df.unpersist(false)): Unit)
    sharedScans.clear()
    sharedLocks.clear()
  }

  /** Number of currently tracked handles (for specs). */
  def trackedCount: Int = synchronized(tracked.size)
}
