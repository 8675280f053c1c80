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

  /** Persist `df` (MEMORY_AND_DISK) and track the handle. */
  def persist(df: DataFrame): DataFrame = synchronized {
    tracked += df
    df.persist()
  }

  /** Unpersist every tracked handle. Call after the consuming action
    * (count/write/collect) has completed — unpersisting earlier would
    * just force recompute. */
  def releaseAll(): Unit = synchronized {
    tracked.foreach(_.unpersist(false))
    tracked.clear()
  }

  /** Number of currently tracked handles (for specs). */
  def trackedCount: Int = synchronized(tracked.size)
}
