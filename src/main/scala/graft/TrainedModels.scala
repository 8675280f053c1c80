package graft

import scala.collection.mutable

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
  private val cache = mutable.Map[String, AnyRef]()
  private val builds = mutable.Map[String, Int]()

  /** Build-or-reuse: `build` runs at most once per (session, key). */
  def memo[T <: AnyRef](spark: org.apache.spark.sql.SparkSession,
                        key: String)(build: => T): T = synchronized {
    val full = s"${System.identityHashCode(spark)}:$key"
    cache.getOrElseUpdate(full, {
      builds(full) = builds.getOrElse(full, 0) + 1
      build
    }).asInstanceOf[T]
  }

  /** How many times `build` actually ran for this key (spec hook). */
  private[graft] def buildCount(spark: org.apache.spark.sql.SparkSession,
                                key: String): Int = synchronized {
    builds.getOrElse(s"${System.identityHashCode(spark)}:$key", 0)
  }

  /** Drop every cached model (corpus switch / process shutdown). */
  def clear(): Unit = synchronized { cache.clear(); builds.clear() }
}
