package graft

import graft.operators.{Dedup, EngineQueries, HybridSearch, Knn}

/** Plan-shape audits: these assert the *physical plan* properties the
  * 100 TB design depends on, so a regression that silently turns a
  * broadcast into a shuffle or un-pushes a filter fails CI, not a
  * cluster run. */
class PlanAuditSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q2: filters reach the parquet scan, schema pruned") {
    val p = plan(EngineQueries.q2FilterPushdown(spark, sfDir))
    assert(p.contains("PushedFilters:"), "expected parquet pushdown section")
    assert(p.contains("GreaterThanOrEqual(p_size,10") ||
           p.contains("p_size"), s"p_size filter not pushed:\n$p")
    assert(!p.contains("p_type"), "projection should prune unused columns")
  }

  test("q1: scan reads only the 7 needed lineitem columns") {
    val p = plan(EngineQueries.q1Agg(spark, sfDir))
    assert(p.contains("l_returnflag") && !p.contains("l_partkey"),
      "ReadSchema should exclude unused join keys")
  }

  test("q3/q5: dimension joins broadcast, no cartesian products") {
    Seq(EngineQueries.q3JoinAgg(spark, sfDir),
        EngineQueries.q5StarJoin(spark, sfDir)).foreach { df =>
      val p = plan(df)
      assert(p.contains("BroadcastHashJoin"), "dims must broadcast")
      assert(!p.contains("CartesianProduct"), "no cartesian join allowed")
    }
  }

  test("q3: global top-k compiles to TakeOrderedAndProject, not full sort") {
    val p = plan(EngineQueries.q3JoinAgg(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$p")
  }

  test("d2/d4: candidate joins are hash joins on block keys (no nested loop)") {
    Seq(Dedup.d2MinhashLsh(spark, sfDir), Dedup.d4NgramJaccard(spark, sfDir))
      .foreach { df =>
        val p = plan(df)
        assert(!p.contains("BroadcastNestedLoopJoin") || p.contains("HashJoin"),
          "blocked joins must be equi hash joins")
        assert(!p.contains("CartesianProduct"))
      }
  }

  test("q21: decorrelated EXISTS pair plans as hash joins, supplier broadcast") {
    val p = plan(EngineQueries.q21SoleBlame(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), "supplier dim must broadcast")
    assert(!p.contains("CartesianProduct"), "decorrelation must avoid cross joins")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "EXISTS/NOT EXISTS must become equi joins, not nested loops")
  }

  test("q22: never-ordered test is an anti join, no cartesian blowup") {
    val p = plan(EngineQueries.q22IdleCustomers(spark, sfDir))
    assert(p.contains("LeftAnti"), s"expected anti join:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q23: one lineitem aggregate, dims broadcast, top-k not full sort") {
    val p = plan(EngineQueries.q23LargeOrders(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), "orders/customer sides must broadcast")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"))
    assert(p.contains("TakeOrderedAndProject"), "LIMIT must ride top-k")
    // single-scan: the HAVING aggregate is reused, lineitem scanned once
    assert(p.split("lineitem.parquet").length - 1 == 1,
      "lineitem must be scanned exactly once")
  }

  test("q24: range-frame window costs one keyed exchange + one sort") {
    val p = plan(EngineQueries.q24RollingRevenue(spark, sfDir))
    assert(p.contains("Window"), "expected window operator")
    // exchanges: one hash (o_custkey) + one range (presentation sort)
    assert(p.split("Exchange").length - 1 <= 4,
      s"unexpected extra exchanges:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("st5: stream-static dim join broadcasts, agg is two-phase") {
    val p = plan(graft.streaming.EventStream.st5EnrichedAgg(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), "customer dim must broadcast")
    assert(p.split("HashAggregate").length - 1 >= 2,
      "partial + final aggregation expected")
  }

  test("native kernels appear in the dedup/knn plans") {
    assert(plan(Dedup.d2MinhashLsh(spark, sfDir)).contains("minhash_sig"))
    assert(plan(Dedup.d3Simhash(spark, sfDir)).contains("graft_simhash64"))
    assert(plan(Knn.a2Lsh(spark, sfDir)).contains("hyperplane_sig"))
    assert(plan(Knn.a1BruteForce(spark, sfDir)).contains("cosine_sim"))
  }

  test("bm25: idf/stats come back as broadcasts") {
    val p = plan(HybridSearch.s1KeywordBm25(spark, sfDir))
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin"),
      "idf and corpus stats should broadcast, not shuffle")
  }

  test("bm25 query serving: columnwise tf — no token explode, no wide shuffle") {
    val p = plan(HybridSearch.s1KeywordBm25(spark, sfDir))
    assert(!p.contains("Generate explode"),
      s"query scoring must not explode the corpus tokens:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"only the 1-row stats agg and the top-k may exchange:\n$p")
  }
}
