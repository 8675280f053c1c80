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

  test("fusion='ranked' selects reciprocal-rank fusion, same serving shape") {
    val rrf = engine.search("spark join filter", limit = 5, fusion = "ranked")
      .collect()
    assert(rrf.length == 5)
    // reciprocal-rank scores are bounded by the both-legs-rank-1 sum
    val scores = rrf.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse)
    assert(scores.forall(s => s > 0.0 && s <= 1.0 / 61.0 + 1e-9))
    // s6 is this facade path over the stock corpus tokenization
    intercept[IllegalArgumentException] {
      engine.search("spark", fusion = "bogus")
    }
  }

  test("searchReranked returns rerank ordering over the same candidates") {
    val rr = engine.searchReranked("spark join", limit = 5).collect()
    assert(rr.length == 5)
    val scores = rr.map(_.getDouble(2)).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("query terms tokenize with the word-class pattern, not a whitespace split") {
    // documents tokenize as \p{L}\p{N} runs — a query carrying
    // punctuation must tokenize identically or it matches nothing
    def rows(q: String) = engine.search(q, alpha = 0.5, limit = 5)
      .collect().map(_.toSeq).toSeq
    val plain = rows("spark join filter")
    assert(plain.nonEmpty)
    assert(rows("spark, join; filter!") == plain,
      "punctuation-carrying query must score like its clean twin")
    assert(rows("Spark,join\nfilter") == plain,
      "runs split on any non-alphanumeric, case-folded")
  }

  test("chunksByUrl returns one page in order") {
    val page = engine.chunksByUrl("source", "src2").collect()
    assert(page.nonEmpty)
    assert(page.forall(_.getAs[String]("source") == "src2"))
    val ids = page.map(_.getAs[Long]("doc_id")).toSeq
    assert(ids == ids.sorted)
  }

  test("approxDistinct lands within 3 standard errors of the exact count") {
    val exact = Tables.documents(spark, sfDir)
      .select("doc_id").distinct().count()
    val est = engine.approxDistinct("doc_id")
    assert(math.abs(est / exact - 1.0) < 0.195,
      s"estimate $est too far from exact $exact")
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

  test("dedupIncremental flags batch docs that near-match the corpus") {
    import spark.implicits._
    val baseText = Tables.documents(spark, sfDir)
      .filter($"doc_id" === 0L).select($"text").as[String].head()
    val batch = Seq(
      (100000L, baseText + " one extra trailing token"),
      (100001L, "an entirely novel document about something unrelated " +
        "with plenty of its own words that shingle to a disjoint set"))
      .toDF("doc_id", "text")
    val losers = engine.dedupIncremental(batch).collect()
    assert(losers.map(_.getLong(0)).toSet == Set(100000L),
      "only the near-copy may be flagged")
    assert(losers.head.getLong(1) == 0L ||
           losers.head.getDouble(2) >= 0.3,
      "best match must be a real high-jaccard prior")
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
    // the range form: exactly the >= tau subset of the same scores,
    // no k — pick tau between the 3rd and 4th knn hit so the exact
    // expected set is known
    val others = emb.filter($"doc_id" =!= 0)
    val tau = (cos(2) + cos(3)) / 2.0
    val ranged = engine.rangeSearch(others, qv, tau).collect()
    assert(ranged.map(_.getLong(0)).toSeq ==
      hits.take(3).map(_.getLong(0)).toSeq,
      "range at a tau between hit 3 and 4 returns exactly the top 3")
    assert(ranged.forall(_.getDouble(1) >= tau))
  }

  test("settings defaults resolve like the reference's settings service") {
    // reference defaults: search_alpha 0.5, search_top_k 10
    assert(engine.search("spark join filter").count() == 10)
    // engine-level settings act as the new defaults; per-call args override
    val tuned = new GraftEngine(spark, Tables.documents(spark, sfDir),
      GraftEngine.Settings(searchAlpha = 0.7, searchTopK = 3))
    assert(tuned.search("spark join filter").count() == 3)
    assert(tuned.search("spark join filter", limit = 6).count() == 6)
  }

  test("contextualString matches embedder_consumer's exact format") {
    import org.apache.spark.sql.functions.lit
    import graft.operators.ChunkQueries.contextualString
    def render(author: String, created: String): String =
      spark.range(1).select(contextualString(
        lit("Vue Docs"), lit("Reactivity"), lit("Guide > Basics"),
        lit("Reactive state is declared with ref()."),
        lit(author), lit(created)).as("s"))
        .head().getString(0)
    assert(render("", "") ==
      "Documentation: Vue Docs\nTitle: Reactivity\nSection: Guide > Basics" +
      "\n---\nReactive state is declared with ref().")
    assert(render("Evan", "") ==
      "Documentation: Vue Docs\nTitle: Reactivity\nSection: Guide > Basics" +
      "\nAuthor: Evan\n---\nReactive state is declared with ref().")
    assert(render("", "2024-01-01") ==
      "Documentation: Vue Docs\nTitle: Reactivity\nSection: Guide > Basics" +
      "\nCreated: 2024-01-01\n---\nReactive state is declared with ref().")
    assert(render("Evan", "2024-01-01") ==
      "Documentation: Vue Docs\nTitle: Reactivity\nSection: Guide > Basics" +
      "\nAuthor: Evan\nCreated: 2024-01-01\n---\nReactive state is declared with ref().")
  }

  test("prepareCorpus: quality floor, exact + near dedup, lang columns") {
    import spark.implicits._
    import org.apache.spark.sql.functions.md5
    val full = Tables.documents(spark, sfDir)
    val prepared = engine.prepareCorpus(minQuality = 0.2, nearDupThreshold = 0.3)
    val rows = prepared.count()
    assert(rows > 0 && rows < full.count(), "pipeline must drop something")
    assert(prepared.columns.contains("lang_id") && prepared.columns.contains("quality"))
    // no exact duplicates survive
    assert(prepared.select(md5($"text")).distinct().count() == rows)
    // every surviving doc meets the floor
    assert(prepared.filter($"quality" < 0.2).count() == 0)
    // near-dup losers (higher id of each pair) are gone
    val losers = engine.dedupNearMinHash(0.3)
      .select($"b_id").as[Long].collect().toSet
    engine.releaseCaches()
    val kept = prepared.select($"doc_id").as[Long].collect().toSet
    assert(kept.intersect(losers).isEmpty)
  }

  test("langId/quality column functions agree with the t1/t2 queries") {
    import spark.implicits._
    import graft.operators.{TextAnalysis => T}
    val viaCol = Tables.documents(spark, sfDir)
      .select($"doc_id", T.langId($"text").as("p"), T.quality($"text").as("q"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    val t1 = T.t1LangId(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("predicted")).toMap
    val t2 = T.t2QualityScore(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality")).toMap
    t1.foreach { case (id, p) => assert(viaCol(id)._1 == p, s"langId mismatch doc $id") }
    t2.foreach { case (id, q) => assert(viaCol(id)._2 == q, s"quality mismatch doc $id") }
  }

  test("chunkDocuments exposes the structural chunker") {
    val chunks = engine.chunkDocuments(maxTokens = 32)
    assert(chunks.count() > 0)
    assert(chunks.columns.toSet ==
      Set("doc_id", "chunk_index", "content", "chunk_type", "language"))
  }

  test("curation facade: decontaminate flags overlap, assignSplits is total") {
    import spark.implicits._
    val n = Tables.documents(spark, sfDir).count()
    val splits = engine.assignSplits().collect()
    assert(splits.length == n)
    assert(splits.map(_.getString(1)).toSet.subsetOf(Set("train", "val", "test")))
    // an eval set copied verbatim from the corpus must flag its twin
    val evalSet = Tables.documents(spark, sfDir)
      .filter($"doc_id" === 0).select(($"doc_id" + 10000).as("doc_id"), $"text")
    val flagged = engine.decontaminate(evalSet).collect().map(_.getLong(0))
    assert(flagged.contains(0L), "doc 0 shares every 8-gram with its eval copy")
  }

  test("ingestFiles runs the converter seam: error taxonomy + chunks") {
    import spark.implicits._
    val files = Seq(
      (1L, "# Doc\n\nA real markdown body with plenty of words to chunk."
        .getBytes("UTF-8"), "application/pdf", "report.pdf"),
      (2L, Array.emptyByteArray, "application/pdf", "empty.pdf"),
      (3L, "secret".getBytes("UTF-8"), "application/x-encrypted", "locked.pdf")
    ).toDF("doc_id", "payload", "mime", "filename")
    val out = engine.ingestFiles(files, maxTokens = 32).collect()
    assert(out.filter(_.getString(1) == "ok").map(_.getLong(0)).toSet == Set(1L))
    assert(out.find(_.getLong(0) == 2L).get.getString(1) == "error_empty")
    assert(out.find(_.getLong(0) == 3L).get.getString(1) == "error_encrypted")
    assert(out.find(_.getLong(0) == 1L).get.getString(5) == "report.pdf")
  }

  test("dedupClusters closes transitive chains through the facade") {
    import spark.implicits._
    val labels = engine.dedupClusters().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every clustered doc labels to the component minimum
    assert(labels.nonEmpty)
    labels.foreach { case (id, lbl) => assert(lbl <= id) }
    // representatives label to themselves
    assert(labels.values.toSet.forall(rep => labels(rep) == rep))
  }

  test("corpusFilterC4 and redactPii run over the engine corpus") {
    import spark.implicits._
    val c4 = engine.corpusFilterC4()
    assert(c4.count() > 0)
    assert(c4.columns.contains("doc_kept"))
    val red = engine.redactPii()
    // corpus word-soup has no PII; redaction is a no-op that keeps rows
    assert(red.count() > 0)
    assert(red.filter($"n_email" > 0 || $"n_phone" > 0 || $"n_ip" > 0).count() == 0)
  }

  test("gopherQuality emits every signal and a composable verdict") {
    import spark.implicits._
    val gq = engine.gopherQuality()
    val rows = gq.collect()
    assert(rows.nonEmpty)
    Seq("n_words", "mean_word_len", "symbol_ratio", "bullet_line_frac",
        "ellipsis_line_frac", "alpha_word_frac", "n_stop_present",
        "quality_kept").foreach(c => assert(gq.columns.contains(c), c))
    rows.foreach { r =>
      assert(r.getLong(1) > 0, "n_words")
      assert(r.getDouble(6) >= 0.0 && r.getDouble(6) <= 1.0, "alpha frac")
    }
  }

  test("facade delegates: pageRank, readability, packSequences") {
    val sparkSession = spark
    import sparkSession.implicits._
    val ranks = engine.pageRank(
      Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")).collect()
    assert(ranks.map(_.getLong(1)).toSet === Set(500000000000L))
    Caches.releaseAll()

    val read = engine.readability()
    assert(read.columns.toSeq ===
      Seq("doc_id", "n_sentences", "n_words", "n_syllables",
        "flesch_ease", "fk_grade"))
    assert(read.count() > 0)

    val packed = engine.packSequences(maxLen = 32)
    assert(packed.filter($"seq_pos" >= 32 || $"seq_pos" < 0).isEmpty)
    assert(packed.count() > 0)
  }

  test("facade delegates: curriculum, knnJoin, sniffTypes") {
    val sparkSession = spark
    import sparkSession.implicits._
    val cur = engine.curriculum()
    assert(cur.columns.toSeq === Seq("doc_id", "quality", "stage"))
    val stages = cur.select($"stage").distinct().collect().map(_.getLong(0))
    assert(stages.forall(s => s >= 1 && s <= 10))
    assert(stages.length > 1, "deciles should spread across stages")

    val emb = Tables.embeddings(spark, sfDir)
      .select($"vec_id", graft.functions.VectorFunctions.asDouble($"embedding").as("v"))
    val g = engine.knnJoin(emb, k = 2)
    assert(g.columns.toSeq === Seq("q_id", "vec_id", "cosine", "rnk"))
    assert(g.filter($"rnk" > 2).isEmpty)
    assert(g.filter($"q_id" === $"vec_id").isEmpty, "no self-neighbors")
    Caches.releaseAll()

    val files = Seq((1L, Array[Byte]('%', 'P', 'D', 'F', '-', 'x')))
      .toDF("doc_id", "payload")
    val sniffed = engine.sniffTypes(files).collect().head
    assert(sniffed.getAs[String]("mime") === "application/pdf")
  }


  test("facade delegates: vamanaPrune + vamanaInsert wire a new vector under the cap") {
    val sparkSession = spark
    import sparkSession.implicits._
    val emb = Tables.embeddings(spark, sfDir)
      .select($"vec_id",
        graft.functions.VectorFunctions.asDouble($"embedding").as("v"))
      .filter($"vec_id" < 40L).localCheckpoint(true)
    val g = engine.refineKnnGraph(emb, k = 3, rounds = 1)
    val pruned = engine.vamanaPrune(emb, g).localCheckpoint(true)
    assert(pruned.groupBy($"q_id").count()
      .agg(org.apache.spark.sql.functions.max("count")).head().getLong(0) <= 6)
    val ins = emb.filter($"vec_id" === 0L)
      .select(($"vec_id" + 500L).as("vec_id"), $"v")
    val entries = emb.filter($"vec_id" < 3L).select($"vec_id")
    val patched = engine.vamanaInsert(emb, pruned, ins, entries)
    assert(patched.filter($"q_id" === 500L).count() > 0,
      "the inserted vector must be wired")
    assert(patched.groupBy($"q_id").count()
      .agg(org.apache.spark.sql.functions.max("count")).head().getLong(0) <= 6)
    Caches.releaseAll()
  }

  test("facade delegates: detectChanges, evaluateRobots") {
    val sparkSession = spark
    import sparkSession.implicits._
    val fresh = Seq(("p1", "h1"), ("p2", "h2-new"), ("p4", "h4"))
      .toDF("page_key", "body_hash")
    val stored = Seq(("p1", "h1"), ("p2", "h2-old"), ("p3", "h3"))
      .toDF("page_key", "body_hash")
    val changes = engine.detectChanges(fresh, stored)
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getBoolean(2))).toMap
    assert(changes === Map(
      "p1" -> ("unchanged", false), "p2" -> ("changed", true),
      "p3" -> ("deleted", false), "p4" -> ("new", true)))

    val robots = Seq(("x.com", "User-agent: *\nDisallow: /no"))
      .toDF("host", "robots_txt")
    val frontier = Seq("https://x.com/no/page", "https://x.com/yes").toDF("url")
    val perms = engine.evaluateRobots(frontier, robots)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(perms === Map("https://x.com/no/page" -> false,
      "https://x.com/yes" -> true))
  }

  test("round-5 facade delegates run end to end over the corpus") {
    import spark.implicits._
    val e = engine
    // keywords: 5 ranked terms per doc, ranks dense from 1
    val kw = e.keywords(k = 3).limit(50).collect()
    assert(kw.nonEmpty && kw.forall(r => r.getLong(1) >= 1 && r.getLong(1) <= 3))
    // globalShuffle: a permutation of the corpus
    val sh = e.globalShuffle(nShards = 4).collect()
    assert(sh.map(_.getLong(0)).distinct.length == sh.length)
    // containment: runs and respects tau (no row below threshold)
    val ct = e.dedupContainment(tau = 0.9).collect()
    assert(ct.forall(_.getDouble(2) >= 0.9))
    // redirect resolution through the facade
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val rr = e.resolveRedirects(edges).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(rr == Map(1L -> true, 2L -> true, 3L -> true))
    // phrase search: every hit really contains the adjacent pair
    val ph = e.searchPhrase(Seq("hash", "join"), limit = 5).collect()
    assert(ph.length <= 5)
    // rate anomaly over a synthetic spike
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val evs = (0 until 30).flatMap { h =>
      val base = Seq.tabulate(2)(i =>
        ("ping", new java.sql.Timestamp(ts0.getTime + h * 3600000L + i * 1000)))
      if (h == 29)
        base ++ Seq.tabulate(20)(i =>
          ("ping", new java.sql.Timestamp(ts0.getTime + h * 3600000L + 60000 + i * 1000)))
      else base
    }.toDF("event_type", "ts")
    val an = e.rateAnomaly(evs).collect()
    val spikes = an.filter(_.getBoolean(5)).map(_.getTimestamp(1))
    assert(spikes.length == 1 &&
      spikes.head.getTime == ts0.getTime + 29 * 3600000L)
    Caches.releaseAll()
  }

  test("round-6 facade delegates equal their driver queries") {
    import org.apache.spark.sql.functions.col
    val e = new GraftEngine(spark, Tables.documents(spark, sfDir))
    // qualityFilter ≡ t16 (same corpus, untrained-memo path)
    val viaFacade = e.qualityFilter().collect().toSeq
    val viaQuery = graft.operators.QualityModel
      .t16QualityLr(spark, sfDir).collect().toSeq
    assert(viaFacade == viaQuery)
    // dsirWeights ≡ p13 with the same target slice
    val df = e.dsirWeights(col("lang") === "en").collect().toSeq
    val dq = graft.operators.Curation.p13Dsir(spark, sfDir).collect().toSeq
    assert(df == dq)
    // packReport ≡ p14
    val pf = e.packReport(1024L).collect().toSeq
    val pq = graft.operators.Curation.p14PackReport(spark, sfDir).collect().toSeq
    assert(pf == pq)
    // scd2 ≡ q47 on the events change log
    import spark.implicits._
    val log = Tables.events(spark, sfDir)
      .select($"user_id", $"ts", $"event_id", $"event_type".as("attr"))
    assert(e.scd2(log).collect().toSeq ==
      graft.operators.EngineQueries.q47Scd2(spark, sfDir).collect().toSeq)
    // trainTokenizer/tokenize ≡ the t17/t18 cores on the same corpus
    val tf = e.trainTokenizer().collect().map(_.toSeq).toSeq
    val tq = graft.operators.BpeTrainer
      .trainOf(Tables.documents(spark, sfDir)).collect().map(_.toSeq).toSeq
    assert(tf == tq)
    val mg = tf.map(r => (r(1).toString, r(2).toString))
    assert(e.tokenize(mg).collect().map(_.toSeq).toSeq ==
      graft.operators.BpeTrainer
        .tokenizeOf(Tables.documents(spark, sfDir), mg).collect().map(_.toSeq).toSeq)
    // sketchTrending estimates dominate exact windowed counts
    val ev = Tables.events(spark, sfDir).select($"ts", $"event_type")
    val est = e.sketchTrending(ev)
    val exact = ev.groupBy(
        org.apache.spark.sql.functions.window($"ts", "1 hour"), $"event_type")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .select($"window.start".as("window_start"), $"event_type", $"n")
    val joined = est.join(exact, Seq("window_start", "event_type")).collect()
    assert(joined.nonEmpty)
    joined.foreach(r => assert(r.getLong(2) >= r.getLong(3)))
    Caches.releaseAll()
  }

  test("searchExpanded facade: PRF over the engine corpus, degradable") {
    val expanded = engine.searchExpanded("spark join filter").collect()
    assert(expanded.nonEmpty && expanded.length <= 25)
    // nExpand=0 is plain BM25 over the same terms
    val plain = engine.searchExpanded("spark join filter", nExpand = 0).collect()
    assert(plain.nonEmpty)
    // expansion is doing real work on the engine corpus too
    assert(expanded.map(_.toSeq).toSeq != plain.map(_.toSeq).toSeq ||
      expanded.length == plain.length)
    intercept[IllegalArgumentException] { engine.searchExpanded("   ") }
    Caches.releaseAll()
  }

  test("searchMoreLikeThis facade: query-by-id over the engine corpus, seed excluded") {
    val seedId = Tables.documents(spark, sfDir)
      .select(org.apache.spark.sql.functions.min("doc_id"))
      .collect().head.getLong(0)
    val out = engine.searchMoreLikeThis(seedId).collect()
    assert(out.nonEmpty && out.length <= 25)
    assert(!out.exists(_.getLong(0) == seedId), "seed must not match itself")
    Caches.releaseAll()
  }

  test("clusterSplit / dedupSavings facades equal their driver queries") {
    val e = new GraftEngine(spark, Tables.documents(spark, sfDir))
    assert(e.clusterSplit().collect().map(_.toSeq).toSeq ==
      graft.operators.Pipeline.p19ClusterSplit(spark, sfDir)
        .collect().map(_.toSeq).toSeq)
    assert(e.dedupSavings().collect().map(_.toSeq).toSeq ==
      graft.operators.Pipeline.d15DedupSavings(spark, sfDir)
        .collect().map(_.toSeq).toSeq)
    Caches.releaseAll()
    Caches.releaseShared()
  }

  test("weightedSample / perceptualDedup facades equal their driver queries") {
    val e = new GraftEngine(spark, Tables.documents(spark, sfDir))
    // inline-scored facade == shared-scan query, row for row
    assert(e.weightedSample(50).collect().map(_.toSeq).toSeq ==
      graft.operators.Curation.p17WeightedSample(spark, sfDir, k = 50)
        .collect().map(_.toSeq).toSeq)
    assert(e.perceptualDedup().collect().map(_.toSeq).toSeq ==
      graft.operators.Multimodal.m11PerceptualDedup(spark, sfDir)
        .collect().map(_.toSeq).toSeq)
    Caches.releaseAll()
    Caches.releaseShared()
  }

  test("bigramPerplexity / temperatureMix facades equal their driver queries") {
    val e = new GraftEngine(spark, Tables.documents(spark, sfDir))
    assert(e.bigramPerplexity().collect().map(_.toSeq).toSeq ==
      graft.operators.TextAnalysis.t24BigramPpl(spark, sfDir)
        .collect().map(_.toSeq).toSeq)
    assert(e.temperatureMix().collect().map(_.toSeq).toSeq ==
      graft.operators.Curation.p20TemperatureMix(spark, sfDir)
        .collect().map(_.toSeq).toSeq)
    assert(e.thresholdSweep().collect().map(_.toSeq).toSeq ==
      graft.operators.Dedup.d16ThresholdSweep(spark, sfDir)
        .collect().map(_.toSeq).toSeq)
    Caches.releaseAll()
  }

  test("searchFuzzy corrects misspellings; searchCollapsed keeps one hit per dup cluster") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "spark streaming joins a filter pipeline with spark shuffles"),
      (2L, "spark streaming joins a filter pipeline with spark shuffles"),
      (3L, "spark streaming joins a filter pipeline with spark shuffle"),
      (4L, "gardening tips for tomato plants in dry climates"),
      (5L, "spark filter basics and join strategies explained here"))
      .toDF("doc_id", "text")
    val e = new GraftEngine(spark, corpus)
    // a one-deletion misspelling retrieves what the corrected term would
    val fuzzy = e.searchFuzzy("spak").collect().map(_.getLong(0)).toSet
    // plain-BM25 leg on the corrected term (searchExpanded at
    // nExpand=0 is exactly BM25) — fuzzy must retrieve the same docs
    val exact = e.searchExpanded("spark", nExpand = 0)
      .collect().map(_.getLong(0)).toSet
    assert(fuzzy.nonEmpty && fuzzy == exact,
      s"fuzzy $fuzzy should equal exact-term search $exact")
    // garbage with no near neighbor returns empty, never junk hits
    assert(e.searchFuzzy("zzqqzz").collect().isEmpty)
    // docs 1-3 are near-dups: collapsed serving keeps exactly one
    val collapsed = e.searchCollapsed("spark filter").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(collapsed.map(_._2).distinct.length == collapsed.length)
    assert(collapsed.count(r => Set(1L, 2L, 3L).contains(r._1)) == 1,
      s"dup cluster must collapse to one hit: ${collapsed.mkString(",")}")
    assert(collapsed.exists(_._1 == 5L), "the distinct relevant doc survives")
    Caches.releaseAll()
  }

  test("searchFielded ranks a title hit above the same hit in the body") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "spark tuning guide\nhow to size executors and partitions"),
      (2L, "general performance notes\nthis chapter covers spark too"),
      (3L, "unrelated gardening column\nwatering schedules for basil"))
      .toDF("doc_id", "text")
    val e = new GraftEngine(spark, corpus)
    val hits = e.searchFielded("spark").collect()
    assert(hits.map(_.getLong(0)).toSeq == Seq(1L, 2L),
      "title match first, body match second, non-match absent")
    assert(hits(0).getDouble(1) > hits(1).getDouble(1))
    intercept[IllegalArgumentException] { e.searchFielded("   ") }
    Caches.releaseAll()
  }

  test("scheduleRecrawl / crawlBudget facades equal their driver queries") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val e = new GraftEngine(spark, Tables.documents(spark, sfDir))
    // the same change classes + interval ladder + host mapping c24
    // synthesizes, fed through the caller-facing composition
    val changes = graft.operators.WebMeta.c18ChangeDetect(spark, sfDir)
      .withColumn("doc_id",
        regexp_extract($"page_key", "^page-(\\d+)$", 1).cast("long"))
      .withColumn("prev_interval_s",
        lit(60.0) * pow(lit(2.0), pmod($"doc_id", lit(5)).cast("double")))
      .withColumn("host",
        concat(lit("host"), pmod($"doc_id", lit(3)), lit(".example.com")))
    val delays = Seq(("host0.example.com", 2.0), ("host2.example.com", 5.0))
      .toDF("host", "crawl_delay_s")
    val viaFacade = e.scheduleRecrawl(changes, delays, orderCol = "doc_id")
      .select($"host", $"page_key", $"change", $"prev_interval_s",
        $"next_interval_s", $"crawl_delay_s", $"host_rank", $"fetch_at_s")
      .orderBy($"host", $"host_rank")
      .collect().map(_.toSeq).toSeq
    val viaQuery = graft.operators.Robots.c24RecrawlSchedule(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(viaFacade === viaQuery)
    val budgetFacade = e.crawlBudget(
        graft.operators.Robots.c17FrontierPriority(spark, sfDir))
      .collect().map(_.toSeq).toSeq
    val budgetQuery = graft.operators.Robots.c25CrawlBudget(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(budgetFacade === budgetQuery)
    Caches.releaseAll()
  }

  test("cleanUnicode and stripRepetition facades clean the corpus in place") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "Caf\u00c3\u00a9 menu\nMenu Home\nMenu Home\nre\u0301al body"),
      (2L, "plain doc with nothing to fix"))
      .toDF("doc_id", "text")
    val e = new GraftEngine(spark, corpus)
    val rows = e.cleanUnicode().collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("text"), r.getAs[Long]("n_repaired"),
          r.getAs[Long]("n_composed")))).toMap
    assert(rows(1L)._1.startsWith("Caf\u00e9 menu"))
    assert(rows(1L)._1.contains("r\u00e9al body"))
    assert(rows(1L)._2 == 1L && rows(1L)._3 == 1L)
    assert(rows(2L) == (("plain doc with nothing to fix", 0L, 0L)))
    val stripped = e.stripRepetition().collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(stripped(1L)._1 == 1L)
    assert(stripped(1L)._2.split("\n").count(_ == "Menu Home") == 1)
    assert(stripped(2L) == ((0L, "plain doc with nothing to fix")))
  }

  test("facade index lifecycle: build + append serves exactly like a one-shot build") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the hash join wins big"),
      (2L, "hash of the join table"),
      (3L, "spark filters push down"),
      (4L, "join the spark hash club")).toDF("doc_id", "text")
    val grown = java.nio.file.Files
      .createTempDirectory("graft-eng-ti").toString
    val oneShot = java.nio.file.Files
      .createTempDirectory("graft-eng-ti2").toString
    val half = new GraftEngine(spark, docs.filter($"doc_id" <= 2))
    half.buildSearchIndex(grown)
    half.appendToSearchIndex(grown, docs.filter($"doc_id" > 2))
    new GraftEngine(spark, docs).buildSearchIndex(oneShot)
    val full = new GraftEngine(spark, docs)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    assert(rows(full.searchFromIndex(grown, "hash join")) ==
      rows(full.searchFromIndex(oneShot, "hash join")))
    assert(rows(full.searchFromIndex(grown, "hash join")).nonEmpty)
    // phrase vs proximity through the facade
    assert(full.searchProximity(grown, Seq("hash", "join"))
      .collect().map(_.getLong(0)).toSeq == Seq(1L),
      "slop 1 = adjacency")
    assert(full.searchProximity(grown, Seq("hash", "join"), slop = 3)
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    // hybrid-with-alpha from the store (the reference's serving call)
    assert(rows(full.searchFromIndex(grown, "hash join", alpha = 0.5)) ==
      rows(full.searchFromIndex(oneShot, "hash join", alpha = 0.5)))
    assert(rows(full.searchFromIndex(grown, "hash join", alpha = 0.5)).nonEmpty)
    // upsert through the facade: replace doc 2's text, serve reflects it
    full.upsertIntoSearchIndex(grown,
      Seq((2L, "completely unrelated prose")).toDF("doc_id", "text"))
    assert(full.searchProximity(grown, Seq("hash", "join"), slop = 3)
      .collect().map(_.getLong(0)).toSet == Set(1L),
      "the replaced doc must stop matching its old phrase")
    // the store-served request path returns renderable rows and logs
    val before = full.queryLog.size
    val served = full.runSearchFromIndex(grown, "hash join", limit = 3)
    assert(served.nonEmpty && served.head.schema.fieldNames
      .count(Set("content", "snippet")) == 2,
      "every store-served hit carries content and a snippet")
    assert(full.queryLog.size == before + 1)
    Caches.releaseAll()
  }

  test("index-side delete-by-source/url facades; ids bridge the ANN tier") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the hash join wins big", "sA", "http://a/0"),
      (1L, "hash of the join table", "sB", "http://b/1"),
      (2L, "spark filters push down", "sA", "http://a/2"),
      (3L, "join the spark hash club", "sB", "http://b/3"),
      (4L, "hash join hash join echo", "sB", "http://b/4"))
      .toDF("doc_id", "text", "source", "url")
    val p = java.nio.file.Files
      .createTempDirectory("graft-eng-sdel").toString
    val e = new GraftEngine(spark, docs)
    e.buildSearchIndex(p)
    // by URL first: exactly one page of one source
    assert(e.deleteByUrlFromIndex(p, "sB", "http://b/4") == 1L)
    // then the whole source: only its remaining pages count
    assert(e.deleteBySourceFromIndex(p, "sB") == 2L)
    val left = graft.sources.TextIndex.docsTable(spark, p)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(left == Set(0L, 2L), s"only sA pages survive: $left")
    // an absent source is a zero-count no-op
    assert(e.deleteBySourceFromIndex(p, "nope") == 0L)
    // the ids bridge: the SAME metadata resolution addresses the ANN
    // tier — resolve before deleting from the text index, then the
    // vector store tombstones the same ids in its own commit
    val p2 = java.nio.file.Files
      .createTempDirectory("graft-eng-sdel2").toString
    val e2 = new GraftEngine(spark, Tables.documents(spark, sfDir))
    e2.buildSearchIndex(p2)
    val bridged = e2.idsBySourceFromIndex(p2, "src3")
    assert(bridged.columns.toSeq == Seq("vec_id"))
    val delIds = bridged.collect().map(_.getLong(0)).toSet
    assert(delIds.nonEmpty)
    val ivf = java.nio.file.Files
      .createTempDirectory("graft-eng-sdel-ivf").toString + "/ivf"
    val cents = graft.operators.Knn.writeIvfIndex(spark, sfDir, ivf)
    graft.operators.Knn.deleteFromIvfIndex(spark, ivf, bridged)
    val queries = Tables.embeddings(spark, sfDir)
      .select($"vec_id",
        graft.functions.VectorFunctions.asDouble($"embedding").as("v"))
      .filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"v".as("qv"))
    val servedIds = graft.operators.Knn
      .serveFromIvfIndex(spark, ivf, cents, queries)
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    assert(servedIds.intersect(delIds).isEmpty,
      "the purged source's ids must vanish from the ANN serve too")
    Caches.releaseAll()
  }

  test("resyncSource of the store's ONLY source converges (the purge empties the chunk store)") {
    import spark.implicits._
    // single-source store: the partition drop leaves nothing but the
    // _SUCCESS marker, so a bare existence probe says "present" while
    // a parquet read throws on schema inference — the re-ingest must
    // land as a first write and a re-run must converge, not wedge
    val stale = Seq((1L, "stale old content one", "sB", "http://sB/1"))
      .toDF("doc_id", "text", "source", "url")
    val fresh = Seq((1L, "fresh crawl content one", "sB", "http://sB/1"))
      .toDF("doc_id", "text", "source", "url")
    val idx = java.nio.file.Files
      .createTempDirectory("graft-eng-rsyn1-idx").toString
    val store = java.nio.file.Files
      .createTempDirectory("graft-eng-rsyn1-st").toString
    graft.streaming.IngestStream.reingest(stale, store)
    graft.sources.TextIndex.write(stale, idx)
    val e = new GraftEngine(spark, fresh)
    assert(e.resyncSource(idx, store, "sB", fresh) == 1L)
    // the re-run hits the purge-then-reingest path again — converges
    assert(e.resyncSource(idx, store, "sB", fresh) == 1L)
    val texts = spark.read.parquet(s"$store/chunks")
      .select($"content").collect().map(_.getString(0)).toSet
    assert(texts.exists(_.contains("fresh crawl")) &&
      !texts.exists(_.contains("stale old")),
      s"chunk store must hold only the fresh content: $texts")
    assert(graft.sources.TextIndex.docsTable(spark, idx)
      .select($"doc_id").collect().map(_.getLong(0)).toSeq == Seq(1L))
    Caches.releaseAll()
  }

  test("resyncSource: stale source converges to the fresh build across both stores") {
    import spark.implicits._
    def page(id: Long, text: String, src: String) =
      (id, text, src, s"http://$src/$id")
    val fresh = Seq(
      page(0L, "the hash join wins big", "sA"),
      page(1L, "fresh crawl content one", "sB"),
      page(2L, "spark filters push down", "sA"),
      page(3L, "fresh crawl content three", "sB"))
      .toDF("doc_id", "text", "source", "url")
    // sB went stale: both pages carry old text, and page 9 existed
    // then but is GONE from the fresh crawl
    val stale = Seq(
      page(0L, "the hash join wins big", "sA"),
      page(1L, "stale old content one", "sB"),
      page(2L, "spark filters push down", "sA"),
      page(3L, "stale old content three", "sB"),
      page(9L, "vanished page content", "sB"))
      .toDF("doc_id", "text", "source", "url")
    val idx = java.nio.file.Files
      .createTempDirectory("graft-eng-rsyn-idx").toString
    val idxFresh = java.nio.file.Files
      .createTempDirectory("graft-eng-rsyn-want").toString
    val store = java.nio.file.Files
      .createTempDirectory("graft-eng-rsyn-st").toString
    val storeFresh = java.nio.file.Files
      .createTempDirectory("graft-eng-rsyn-stw").toString
    graft.streaming.IngestStream.reingest(stale, store)
    graft.sources.TextIndex.write(stale, idx)
    graft.sources.TextIndex.write(fresh, idxFresh)
    graft.streaming.IngestStream.reingest(fresh, storeFresh)
    val e = new GraftEngine(spark, fresh)
    val purged = e.resyncSource(idx, store, "sB",
      fresh.filter($"source" === "sB"))
    assert(purged == 3L, s"stale sB pages 1,3,9 purge; got $purged")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    // serving tier: resynced index ≡ fresh-corpus rebuild (the
    // bookkeeping batch number legitimately differs — resync lands
    // fresh rows as a later batch — so compare the SERVED values)
    assert(rows(graft.sources.TextIndex.bm25Serve(spark, idx,
        Seq("fresh", "content")).orderBy($"score".desc, $"doc_id")) ==
      rows(graft.sources.TextIndex.bm25Serve(spark, idxFresh,
        Seq("fresh", "content")).orderBy($"score".desc, $"doc_id")))
    def content(p: String) =
      rows(graft.sources.TextIndex.contentTable(spark, p)
        .select($"doc_id", $"text").orderBy($"doc_id"))
    assert(content(idx) == content(idxFresh))
    // chunk store: the source partition carries exactly the fresh
    // chunks; untouched sources survive
    def chunks(s: String) = spark.read.parquet(s"$s/chunks")
      .select($"doc_id", $"source", $"chunk_index", $"content")
      .collect().map(_.toSeq).toSet
    assert(chunks(store) == chunks(storeFresh),
      "the chunk store must converge to the fresh-ingest state")
    // idempotence: a resync re-run converges (the crash-replay
    // contract) — now the "stale" ids ARE the fresh ids
    assert(e.resyncSource(idx, store, "sB",
      fresh.filter($"source" === "sB")) == 2L)
    assert(content(idx) == content(idxFresh))
    Caches.releaseAll()
  }

  test("store-serving defaults resolve to HYBRID; batch facade ≡ per-query loop") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the hash join wins big", "en"),
      (2L, "hash of the join table", "en"),
      (3L, "spark filters push down", "de"),
      (4L, "join the spark hash club", "en")).toDF("doc_id", "text", "lang")
    val p = java.nio.file.Files
      .createTempDirectory("graft-eng-def").toString
    val e = new GraftEngine(spark, docs)
    e.buildSearchIndex(p)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    // the default-args store call is the reference's serving call:
    // settings.searchAlpha (0.5) hybrid, NOT a silent pure-BM25 downgrade
    val byDefault = e.searchFromIndex(p, "hash join")
    assert(byDefault.columns.contains("hybrid_score"),
      "default store serve must be hybrid (settings.searchAlpha)")
    assert(rows(byDefault) ==
      rows(e.searchFromIndex(p, "hash join", alpha = 0.5)))
    assert(e.searchFromIndex(p, "hash join", alpha = 0.0)
      .columns.toSeq == Seq("doc_id", "score"),
      "alpha = 0 still opts down to the pure BM25 path")
    // filters ride into the store call like the reference's Search:
    // filter-first, same result as the scan path's search(filters)
    assert(rows(e.searchFromIndex(p, "hash join",
        filters = Map("lang" -> "en"))) ==
      rows(e.search("hash join", filters = Map("lang" -> "en"))),
      "filtered store serve must equal the scan path's filtered search")
    // batch facade: each qid block ≡ the per-query loop; one query-log
    // entry per query in the batch
    val qs = Seq(1L -> "hash join", 2L -> "spark filters")
    val before = e.queryLog.size
    val batch = e.runSearchBatchFromIndex(p, qs, limit = 3)
    assert(e.queryLog.size == before + 2)
    val blocks = batch.groupBy(_.getLong(0)).view
      .mapValues(_.map(r => Seq(r.getLong(1), r.getDouble(2)))).toMap
    qs.foreach { case (qid, q) =>
      val per = e.searchFromIndex(p, q, limit = 3).collect()
        .map(r => Seq(r.getLong(0), r.getDouble(1))).toSeq
      assert(blocks(qid) == per,
        s"batch qid $qid block must equal the per-query serve")
    }
    // rerank=true runs the service's rerank stage over the stored-
    // fields content and reorders the rendered hits by it
    val rr = e.runSearchFromIndex(p, "hash join", limit = 3, rerank = true)
    assert(rr.nonEmpty && rr.head.schema.fieldNames.contains("rerank_score"))
    val rrScores = rr.map(_.getAs[Double]("rerank_score"))
    assert(rrScores == rrScores.sorted.reverse)
    assert(rr.map(_.getAs[Long]("doc_id")) ==
      e.searchRerankedFromIndex(p, "hash join", limit = 3)
        .collect().map(_.getLong(0)).toSeq,
      "rendered order must follow the store-served rerank")
    // an explicit rerank applies at alpha = 0 too — the reference
    // service reranks whatever the store returned, BM25-only
    // included (service.go:112-130); it must not be silently dropped
    val rr0 = e.runSearchFromIndex(p, "hash join", alpha = 0.0,
      limit = 3, rerank = true)
    assert(rr0.nonEmpty && rr0.head.schema.fieldNames.contains("rerank_score"),
      "alpha = 0 with rerank = true must still rerank the BM25 hits")
    val rr0Scores = rr0.map(_.getAs[Double]("rerank_score"))
    assert(rr0Scores == rr0Scores.sorted.reverse)
    // the rerank stage REORDERS the BM25 result set, it must not
    // CHANGE it: no vector-only candidate may enter through the
    // hybrid fusion's full outer join at alpha = 0
    val bm25Ids = e.searchFromIndex(p, "hash join", alpha = 0.0,
      limit = 3).collect().map(_.getLong(0)).toSet
    assert(rr0.map(_.getAs[Long]("doc_id")).toSet == bm25Ids,
      "alpha = 0 rerank candidates must be exactly the BM25 hits")
    Caches.releaseAll()
  }
}
