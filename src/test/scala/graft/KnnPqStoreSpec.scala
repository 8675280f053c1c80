package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Knn

/** Persisted IVF+PQ store: the serving tier must read CODES
  * (partition-pruned), touch raw vectors only for the ADC survivors,
  * reproduce the in-memory a11 chain bit-exactly, and carry the full
  * append/delete/compact/optimize lifecycle with the staged `_gen`
  * commit guarantees of the other ANN stores. */
class KnnPqStoreSpec extends SparkSpec {

  import spark.implicits._

  private lazy val tmp = Files.createTempDirectory("graft-pq").toString

  private def queries = Tables.embeddings(spark, sfDir)
    .select($"vec_id",
      graft.functions.VectorFunctions.asDouble($"embedding").as("v"))
    .filter($"vec_id" < 10)
    .select($"vec_id".as("q_id"), $"v".as("qv"))

  test("persisted-PQ serve is bit-equal to in-memory a11; codes scan pruned; append parity") {
    // the session store builds the even half and APPENDS the odd half
    val served = Knn.a28PqStore(spark, sfDir)
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cid"),
      s"codes scan is not partition-pruned:\n${plan.take(1200)}")
    val fromStore = served.collect().map(_.toSeq).toSeq
    val inMemory = Knn.a11IvfPq(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(fromStore === inMemory)

    // the codes tier holds codes, never the raw vectors (the 100 TB
    // point of the store: scan bytes are the ~32x-smaller codes)
    val data = Knn.storeDataDir(spark, Knn.pqStorePath(spark, sfDir))
    val codeCols = spark.read.parquet(s"$data/codes").columns.toSet
    assert(codeCols === Set("vec_id", "code", "cid"))

    // a from-scratch full build serves identically to build+append:
    // the frozen-quantizer encode is order-independent
    val full = s"$tmp/pq_full"
    Knn.writePqIndex(spark, sfDir, full)
    val fullServed = Knn.serveFromPqIndex(spark, full, queries)
      .collect().map(_.toSeq).toSeq
    assert(fullServed === inMemory)
    Caches.releaseAll()
  }

  test("graph+PQ store: the disk-served walk is bit-equal to in-memory a23; codes tier carries no vectors") {
    val fromStore = Knn.a30GraphPqStoreServe(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val inMemory = Knn.a23GraphSearchPq(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(fromStore === inMemory)
    val path = Knn.graphPqStorePath(spark, sfDir)
    assert(spark.read.parquet(s"$path/codes").columns.toSet ===
      Set("vec_id", "code", "vbucket"),
      "the walk's corpus-wide tier must hold codes only (bucketed)")
    Caches.releaseAll()
  }

  test("PQ store delete/compact: tombstoned rows invisible, compact bit-equal and physical") {
    val p = s"$tmp/pq_life"
    Knn.writePqIndex(spark, sfDir, p)
    def served = Knn.serveFromPqIndex(spark, p, queries)
      .collect().map(_.toSeq).toSeq
    val s0 = served
    // delete a vec that IS being served (a top-1 neighbor)
    val victim = s0.head(1).asInstanceOf[Long]
    Knn.deleteFromIvfIndex(spark, p, Seq(victim).toDF("vec_id"))
    val s1 = served
    assert(!s1.exists(_(1) == victim), "tombstoned id must not serve")
    assert(s1 !== s0)
    // compact: serve bit-equal, tombstones cleared, rows physically gone
    Knn.compactPqIndex(spark, p)
    assert(served === s1, "serve must be bit-equal across compact")
    val data = Knn.storeDataDir(spark, p)
    assert(spark.read.parquet(s"$data/codes")
      .filter($"vec_id" === victim).count() === 0)
    assert(spark.read.parquet(s"$data/vectors")
      .filter($"vec_id" === victim).count() === 0)
    Caches.releaseAll()
  }

  test("PQ store upsert: stale copies replaced across cells, serve equals a fresh build") {
    import org.apache.spark.sql.functions.{transform => sqlTransform}
    val p = s"$tmp/pq_ups"
    val all = Tables.embeddings(spark, sfDir)
      .select($"vec_id",
        graft.functions.VectorFunctions.asDouble($"embedding").as("v"))
    // stale store: vec_id % 7 == 3 rows shifted +1.0/dim (the a24
    // recipe — the changed vector can land in a DIFFERENT cell)
    val stale = all.select($"vec_id",
      when($"vec_id" % 7 === 3, sqlTransform($"v", x => x + 1.0))
        .otherwise($"v").as("v"))
    Knn.writePqIndex(spark, sfDir, p, initial = Some(stale))
    Knn.upsertPqIndex(spark, p,
      all.filter($"vec_id" % 7 === 3).select($"vec_id", $"v"))
    val upserted = Knn.serveFromPqIndex(spark, p, queries)
      .collect().map(_.toSeq).toSeq
    val fresh = s"$tmp/pq_fresh"
    Knn.writePqIndex(spark, sfDir, fresh)
    val freshServed = Knn.serveFromPqIndex(spark, fresh, queries)
      .collect().map(_.toSeq).toSeq
    assert(upserted === freshServed,
      "upsert must converge the store to the true corpus")
    // no stale duplicate survives in either tier
    val data = Knn.storeDataDir(spark, p)
    Seq("codes", "vectors").foreach { tier =>
      val dup = spark.read.parquet(s"$data/$tier")
        .groupBy($"vec_id").count().filter($"count" > 1).count()
      assert(dup === 0, s"$tier carries duplicate ids after upsert")
    }
    Caches.releaseAll()
  }

  test("PQ store OPTIMIZE is a staged generation commit: torn staging invisible, swap bit-equal, old gens swept") {
    val p = s"$tmp/pq_genz"
    Knn.writePqIndex(spark, sfDir, p)
    def served = Knn.serveFromPqIndex(spark, p, queries)
      .collect().map(_.toSeq).toSeq
    val s0 = served
    // a crashed OPTIMIZE left garbage staging; the marker never
    // flipped, so readers stay on generation 0 bit-exactly
    Seq((999999L, Seq(1, 2), 0)).toDF("vec_id", "code", "cid")
      .write.mode("overwrite").partitionBy("cid")
      .parquet(s"$p/_gen_1/codes")
    assert(Knn.storeGen(spark, p) === 0L)
    assert(served === s0, "staged-but-uncommitted must be invisible")
    // delete one served row, then the retried OPTIMIZE commits
    val victim = s0.head(1).asInstanceOf[Long]
    Knn.deleteFromIvfIndex(spark, p, Seq(victim).toDF("vec_id"))
    val s1 = served
    Knn.optimizePqIndex(spark, p)
    assert(Knn.storeGen(spark, p) === 1L)
    assert(served === s1, "serve must be bit-equal across the swap")
    assert(!new java.io.File(s"$p/codes").exists() &&
      !new java.io.File(s"$p/vectors").exists(),
      "the gen-0 root tiers are swept after the flip")
    val data = Knn.storeDataDir(spark, p)
    assert(spark.read.parquet(s"$data/codes")
      .filter($"vec_id".isin(victim, 999999L)).count() === 0,
      "the committed generation drops tombstones and torn garbage")
    // a second OPTIMIZE advances and sweeps _gen_1
    Knn.optimizePqIndex(spark, p)
    assert(Knn.storeGen(spark, p) === 2L)
    assert(!new java.io.File(s"$p/_gen_1").exists(), "older gens swept")
    assert(served === s1)
    // incremental append lands in the CURRENT generation and serves
    Knn.appendToPqIndex(spark, p,
      Tables.embeddings(spark, sfDir)
        .select($"vec_id",
          graft.functions.VectorFunctions.asDouble($"embedding").as("v"))
        .filter($"vec_id" === victim)
        .select(($"vec_id" + 800000L).as("vec_id"), $"v"))
    assert(served.exists(_(1) == victim + 800000L),
      "a re-added copy of the deleted vector must serve again")
    Caches.releaseAll()
  }
}
