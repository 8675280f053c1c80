package graft

class GraftEngineSpec extends SparkSpec {

  private lazy val engine =
    new GraftEngine(spark, Tables.documents(spark, sfDir))

  test("search returns alpha-fused top-k with filters applied") {
    import spark.implicits._
    val hits = engine.search("spark join filter", alpha = 0.5, limit = 5)
    assert(hits.count() == 5)
    val filteredHits = engine
      .search("spark join filter", limit = 5, filters = Map("lang" -> "en"))
      .select($"doc_id").as[Long].collect().toSet
    val enIds = Tables.documents(spark, sfDir)
      .filter($"lang" === "en").select($"doc_id").as[Long].collect().toSet
    assert(filteredHits.subsetOf(enIds))
  }

  test("searchReranked returns rerank ordering over the same candidates") {
    val rr = engine.searchReranked("spark join", limit = 5).collect()
    assert(rr.length == 5)
    val scores = rr.map(_.getDouble(2)).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("chunksByUrl returns one page in order") {
    val page = engine.chunksByUrl("source", "src2").collect()
    assert(page.nonEmpty)
    assert(page.forall(_.getAs[String]("source") == "src2"))
    val ids = page.map(_.getAs[Long]("doc_id")).toSeq
    assert(ids == ids.sorted)
  }

  test("stats / deleteBySource / dedupExact agree with the corpus") {
    val total = Tables.documents(spark, sfDir).count()
    val st = engine.stats().head()
    assert(st.getLong(1) == total)
    val remaining = engine.deleteBySource("source", Seq("src0")).count()
    assert(remaining < total)
    assert(engine.dedupExact().count() <= total)
    val afterUrl = engine.deleteByUrl("source", "lang", "src0", "en").count()
    assert(afterUrl < total && afterUrl > remaining)
    assert(engine.countBySource("source").count() ==
      Tables.documents(spark, sfDir).select("source").distinct().count())
  }

  test("dedupNearMinHash finds the planted near-dups via the facade") {
    val pairs = engine.dedupNearMinHash(0.3).count()
    assert(pairs > 0)
  }

  test("knn over facade embeddings returns k ordered neighbors") {
    import spark.implicits._
    val emb = engine.embedChunks()
    val qv = emb.filter($"doc_id" === 0)
      .select($"embedding").as[Seq[Double]].head()
    val hits = engine.knn(emb.filter($"doc_id" =!= 0), qv, k = 7).collect()
    assert(hits.length == 7)
    val cos = hits.map(_.getDouble(1)).toSeq
    assert(cos == cos.sorted.reverse)
    assert(cos.head <= 1.000001)
  }

  test("chunkDocuments exposes the structural chunker") {
    val chunks = engine.chunkDocuments(maxTokens = 32)
    assert(chunks.count() > 0)
    assert(chunks.columns.toSet ==
      Set("doc_id", "chunk_index", "content", "chunk_type", "language"))
  }
}
