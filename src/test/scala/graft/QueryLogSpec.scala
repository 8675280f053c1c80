package graft

/** QueryLog — the reference QueryLogger's semantics (logger.go:
  * entry shape, latency derivation, append order; service.go: log
  * only successful calls, one entry per Search) re-expressed over
  * the batch serving path. */
class QueryLogSpec extends SparkSpec {

  import spark.implicits._

  test("entry derives latency_ms from duration_ns like the reference") {
    val e = QueryLog.entry("q", 3, 7_654_321L, "cid-1")
    assert(e.latency_ms === 7L)
    assert(e.duration_ns === 7_654_321L)
    assert(e.num_results === 3 && e.correlation_id === "cid-1")
    assert(e.timestamp_ms > 0L)
  }

  test("runSearch logs one entry per call with the served row count") {
    val eng = new GraftEngine(spark, Tables.documents(spark, sfDir))
    val r1 = eng.runSearch("spark shuffle", limit = 5, correlationId = "a")
    val r2 = eng.runSearch("markdown chunk", limit = 3, correlationId = "b")
    val entries = eng.queryLog.snapshot()
    assert(entries.length === 2)
    // every served hit carries renderable text (the reference's
    // SearchResult.Content): full content plus a query-term snippet
    assert(r1.nonEmpty)
    r1.foreach { row =>
      assert(row.getAs[String]("content").nonEmpty)
      assert(row.getAs[String]("snippet").nonEmpty)
    }
    assert(entries(0).query === "spark shuffle")
    assert(entries(0).num_results === r1.length && r1.length <= 5)
    assert(entries(1).query === "markdown chunk")
    assert(entries(1).num_results === r2.length && r2.length <= 3)
    assert(entries.forall(_.duration_ns > 0L))
    // append order is call order
    assert(entries(0).timestamp_ms <= entries(1).timestamp_ms)
  }

  test("stats rolls up per-query call count and latency percentiles") {
    val log = new QueryLog()
    Seq(10L, 20L, 30L, 40L).foreach { ms =>
      log.log(QueryLog.Entry(1000L + ms, "hot query", 10,
        ms * 1000000L, ms, ""))
    }
    log.log(QueryLog.Entry(2000L, "cold query", 2, 5_000_000L, 5L, ""))
    val s = log.stats(spark).collect()
    assert(s.length === 2)
    val hot = s.head
    assert(hot.getString(0) === "hot query") // most calls first
    assert(hot.getLong(1) === 4L)
    assert(hot.getDouble(2) === 25.0)            // avg
    assert(hot.getDouble(3) === 25.0)            // p50 (interpolated)
    assert(hot.getDouble(4) === 38.5)            // p95
    assert(hot.getDouble(5) === 10.0)
    assert(s(1).getString(0) === "cold query" && s(1).getLong(1) === 1L)
  }

  test("the ring drops oldest entries beyond capacity") {
    val log = new QueryLog(maxEntries = 3)
    (1 to 5).foreach { i =>
      log.log(QueryLog.Entry(i.toLong, s"q$i", i, 1L, 0L, ""))
    }
    assert(log.size === 3)
    assert(log.snapshot().map(_.query) === Seq("q3", "q4", "q5"))
  }

  test("toDF round-trips the entry schema") {
    val log = new QueryLog()
    log.log(QueryLog.Entry(42L, "q", 1, 2L, 0L, "c"))
    val df = log.toDF(spark)
    assert(df.columns.toSeq === Seq("timestamp_ms", "query", "num_results",
      "duration_ns", "latency_ms", "correlation_id"))
    assert(df.count() === 1L)
  }
}
