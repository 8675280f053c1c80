package graft

import graft.operators.{Dedup, Knn}

/** Train-once/serve-many: repeated queries against the same corpus
  * reuse the session's trained quantizer instead of re-running Lloyd
  * iterations per query. */
class TrainedModelsSpec extends SparkSpec {

  test("a4 trains its coarse quantizer once per session+corpus") {
    TrainedModels.clear()
    val first = Knn.a4IvfKmeans(spark, sfDir).collect()
    Caches.releaseAll()
    val second = Knn.a4IvfKmeans(spark, sfDir).collect()
    Caches.releaseAll()
    assert(TrainedModels.buildCount(spark, s"kmeans:$sfDir:k=8:it=3") === 1)
    assert(first.toSeq === second.toSeq,
      "cached centroids must reproduce the identical serving result")
  }

  test("d7's SemDeDup quantizer is a separate key from a4's (k differs)") {
    TrainedModels.clear()
    Dedup.d7SemDedup(spark, sfDir).count()
    Caches.releaseAll()
    assert(TrainedModels.buildCount(spark, s"kmeans:$sfDir:k=64:it=3") === 1)
    assert(TrainedModels.buildCount(spark, s"kmeans:$sfDir:k=8:it=3") === 0)
    // a second pass over the same corpus serves from the cache
    Dedup.d7SemDedup(spark, sfDir).count()
    Caches.releaseAll()
    assert(TrainedModels.buildCount(spark, s"kmeans:$sfDir:k=64:it=3") === 1)
  }

  test("clear() forces a fresh training pass") {
    TrainedModels.clear()
    Knn.a4IvfKmeans(spark, sfDir).count()
    Caches.releaseAll()
    TrainedModels.clear()
    Knn.a4IvfKmeans(spark, sfDir).count()
    Caches.releaseAll()
    assert(TrainedModels.buildCount(spark, s"kmeans:$sfDir:k=8:it=3") === 1)
    TrainedModels.clear()
  }
}
