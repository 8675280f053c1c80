package graft

import graft.operators.HybridSearch

class HybridSearchSpec extends SparkSpec {

  test("s1 BM25 scores rank docs containing the query terms") {
    import spark.implicits._
    val rows = HybridSearch.s1KeywordBm25(spark, sfDir).collect()
    assert(rows.length == 10)
    val scores = rows.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse)
    assert(scores.forall(_ > 0))
    // top doc really contains at least one query term
    val topId = rows.head.getLong(0)
    val text = Tables.documents(spark, sfDir)
      .filter($"doc_id" === topId).select($"text").as[String].head()
    assert(HybridSearch.QueryTerms.exists(text.toLowerCase.contains))
  }

  test("s3 hybrid fusion stays within [0,1] and returns top-10") {
    val rows = HybridSearch.s3HybridSearch(spark, sfDir).collect()
    assert(rows.length == 10)
    rows.foreach(r => assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0))
  }

  test("s4 rerank is a permutation of the hybrid candidates") {
    val hybrid = HybridSearch.s3HybridSearch(spark, sfDir).collect()
      .map(_.getLong(0)).toSet
    val reranked = HybridSearch.s4Rerank(spark, sfDir).collect()
    assert(reranked.map(_.getLong(0)).toSet == hybrid)
    assert(reranked.map(_.getLong(3)).toSeq == (1L to hybrid.size))
  }

  test("s6 RRF scores are bounded by the best-possible two-leg sum") {
    val rows = HybridSearch.s6RrfFusion(spark, sfDir).collect()
    assert(rows.length == 10)
    val scores = rows.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse)
    // max possible: rank 1 in both legs = 0.5/61 + 0.5/61
    assert(scores.forall(s => s > 0.0 && s <= 1.0 / 61.0 + 1e-9))
    // a doc ranked #1 by BOTH legs would hit the bound; every score is
    // a sum of at most two reciprocal-rank terms, so the top-10 set
    // must overlap the relative-score fusion's candidate pool
    val s3Ids = HybridSearch.s3HybridSearch(spark, sfDir).collect()
      .map(_.getLong(0)).toSet
    val s6Ids = rows.map(_.getLong(0)).toSet
    assert((s3Ids intersect s6Ids).nonEmpty)
  }

  test("s5 filtered search only returns lang=en docs with the term") {
    import spark.implicits._
    val rows = HybridSearch.s5FilteredSearch(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val ids = rows.map(_.getLong(0)).toSet
    val enIds = Tables.documents(spark, sfDir)
      .filter($"lang" === "en").select($"doc_id").as[Long].collect().toSet
    assert(ids.subsetOf(enIds))
    rows.foreach(r => assert(r.getLong(2) > 0))
  }

  test("s9 PRF: expansion changes the ranking and stays deterministic") {
    val expanded = HybridSearch.s9PrfExpansion(spark, sfDir).collect()
    assert(expanded.length == 10)
    // feedback must do real work: the widened query re-ranks —
    // either new docs surface or scores shift vs the seed-only run
    val seed = HybridSearch.s1KeywordBm25(spark, sfDir).collect()
    assert(expanded.map(r => (r.getLong(0), r.getDouble(1))).toSeq !=
      seed.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
    // nExpand = 0 degrades to exactly the seed ranking
    val noExp = HybridSearch.s9PrfExpansion(spark, sfDir, nExpand = 0).collect()
    assert(noExp.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      seed.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
    // repeat-stable (the driver-collected expansion terms are
    // deterministically tie-broken)
    assert(HybridSearch.s9PrfExpansion(spark, sfDir).collect().map(_.toSeq).toSeq ==
      expanded.map(_.toSeq).toSeq)
    Caches.releaseAll()
  }

  test("s16 more-like-this: salience mining on a planted corpus, seed excluded") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{lit, lower, regexp_extract_all, size}
    // planted: seed doc 0 repeats two rare terms; "common" appears in
    // every doc (ln(N/N) = 0 salience, must NOT be mined); doc 3
    // shares both rare terms, doc 4 only one
    val corpus = Seq(
      (0L, "zebra zebra quark quark quark common text"),
      (1L, "common filler words here"),
      (2L, "more common filler text"),
      (3L, "quark zebra common appears"),
      (4L, "zebra common only"),
      (5L, "nothing shared common")).toDF("doc_id", "text")
    val toks = corpus.select($"doc_id",
      regexp_extract_all(lower($"text"), lit("[\\p{L}\\p{N}]+"), lit(0)).as("tok"))
      .withColumn("dl", size($"tok").cast("double"))
    val mined = HybridSearch.mltTerms(spark, toks, seedId = 0L, n = 2)
    assert(mined.toSet == Set("quark", "zebra"),
      s"salience must rank rare repeated terms first, got $mined")
    val ranked = HybridSearch.bm25Scores(spark, toks, mined)
      .filter($"doc_id" =!= 0L)
      .orderBy($"score".desc, $"doc_id").collect()
    assert(ranked.head.getLong(0) == 3L,
      "the doc sharing both salient terms must rank first")
    assert(ranked.map(_.getLong(0)).toSet == Set(3L, 4L), "only term-sharers rank")
    // corpus-shaped run: k rows, seed absent, repeat-stable
    val out = HybridSearch.s16MoreLikeThis(spark, sfDir).collect()
    assert(out.length == 10 && !out.exists(_.getLong(0) == 0L))
    assert(HybridSearch.s16MoreLikeThis(spark, sfDir).collect()
      .map(_.toSeq).toSeq == out.map(_.toSeq).toSeq)
    Caches.releaseAll()
  }

  test("s8 eval: NDCG bounded, exact leg saturates, rankings carry signal") {
    val rows = HybridSearch.s8SearchEval(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("bm25", "fielded", "hybrid", "reranked", "rrf", "vector_exact"))
    val byM = rows.map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    byM.foreach { case (m, (dcg, ndcg)) =>
      assert(dcg > 0.0, s"$m retrieved zero relevance")
      assert(ndcg >= 0.0 && ndcg <= 1.0, s"$m ndcg $ndcg out of range")
    }
    // the ideal ranking scores itself perfectly
    assert(byM("vector_exact")._2 == 1.0)
    // fused rankings must capture at least as much semantic gain as
    // chance: both carry the vector leg, so they can't be the worst
    assert(byM("hybrid")._2 >= byM("bm25")._2 ||
           byM("rrf")._2 >= byM("bm25")._2)
    // repeat-stable
    assert(HybridSearch.s8SearchEval(spark, sfDir).collect().map(_.toSeq).toSeq ==
      rows.map(_.toSeq).toSeq)
    Caches.releaseAll()
  }

  test("s10 snippets: best window maximizes distinct query terms, slice is exact") {
    import spark.implicits._
    val rows = HybridSearch.s10Snippets(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
                 r.getLong(3), r.getString(4)))
    // one snippet per s1 hit, same ids, same order
    val s1 = HybridSearch.s1KeywordBm25(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.map(r => (r._1, r._2)).toSeq == s1.toSeq)
    rows.foreach { case (id, _, start, nTerms, snip) =>
      assert(start >= 1 && nTerms >= 1 && nTerms <= 3, s"doc $id")
      val toks = snip.split(" ")
      assert(toks.length <= 10, s"doc $id window too wide")
      // the span really contains nTerms distinct query terms and
      // STARTS on one (candidate starts are hit positions)
      val qt = Set("spark", "join", "filter")
      assert(toks.toSet.intersect(qt).size == nTerms, s"doc $id coverage")
      assert(qt.contains(toks.head), s"doc $id must start on a hit")
    }
    // planted: the window with all three terms beats earlier sparse hits
    val planted = Seq(
      (1L, "en", "s", "spark appears early then pad pad pad pad pad pad " +
        "pad pad pad pad finally spark join filter together here"))
      .toDF("doc_id", "lang", "source", "text")
    val tmp = java.nio.file.Files.createTempDirectory("s10").toString
    planted.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val p = HybridSearch.s10Snippets(spark, tmp).collect().head
    assert(p.getLong(3) == 3L)
    assert(p.getString(4).startsWith("spark join filter"))
    // 1-based: spark(1) ... pad×11 ... finally(15) spark(16)
    assert(p.getLong(2) == 16L)
    Caches.releaseAll()
  }

  test("s15 autocomplete: prefix fan-out, df ranking, short terms self-complete") {
    import spark.implicits._
    val vocab = Seq(("spark", 10L), ("spare", 5L), ("spa", 3L),
      ("join", 7L), ("jo", 2L), ("x", 99L)).toDF("term", "df")
    val out = HybridSearch.autocompleteOf(vocab, minPrefix = 2,
      maxPrefix = 4, k = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val byPfx = out.groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(t => (t._3, t._4)).toSeq).toMap
    // df-desc ranking at every indexed length
    assert(byPfx("sp") == Seq(("spark", 10L), ("spare", 5L)))
    assert(byPfx("spa") == Seq(("spark", 10L), ("spare", 5L)))
    assert(byPfx("spar") == Seq(("spark", 10L), ("spare", 5L)))
    // a term exactly at minPrefix is its own completion
    assert(byPfx("jo") == Seq(("join", 7L), ("jo", 2L)))
    // below-minPrefix terms are not indexed at all
    assert(!out.exists(_._3 == "x"))
    // prefixes longer than a term never index it ("spa" stops at 3)
    assert(byPfx.keys.forall(p => p.length >= 2 && p.length <= 4))
    out.foreach { case (p, _, term, _) => assert(term.startsWith(p)) }
    // corpus-shaped: completion invariants hold end to end
    val corpus = HybridSearch.s15Autocomplete(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(corpus.nonEmpty)
    corpus.groupBy(_._1).foreach { case (p, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq)
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sortBy(-_).toSeq,
        s"df not descending under prefix $p")
      rows.foreach(r => assert(r._3.startsWith(p)))
    }
    Caches.releaseAll()
  }

  test("s11 fuzzy correction: delete-1 neighborhood covers every ED-1 edit class") {
    import spark.implicits._
    val vocab = Seq(("spark", 50L), ("stark", 10L), ("spar", 5L),
      ("sparks", 3L), ("join", 20L), ("filter", 9L)).toDF("term", "df")
    val out = HybridSearch
      .fuzzyCorrections(vocab, Seq("spak", "spark", "xyzzy"), k = 5)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getLong(3), r.getInt(4)))
    // insertion fix ranks first by df; substitution also surfaces
    val spak = out.filter(_._1 == "spak")
    assert(spak.head == (("spak", "spark", 1, 50L, 1)))
    assert(spak.map(_._2).contains("spar"))
    // the exact term itself wins at distance 0; deletion (spar),
    // substitution (stark), and insertion (sparks) all surface
    val exact = out.filter(_._1 == "spark")
    assert(exact.head == (("spark", "spark", 0, 50L, 1)))
    assert(Seq("stark", "spar", "sparks").forall(exact.map(_._2).contains))
    // nothing within distance 1 → no row, never a junk correction
    assert(!out.exists(_._1 == "xyzzy"))
    out.foreach(r => assert(r._3 <= 1))
    Caches.releaseAll()
  }

  test("s12 collapsed serving: one hit per cluster, global best always survives") {
    import spark.implicits._
    val res = HybridSearch.s12CollapsedSearch(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(res.nonEmpty && res.length <= 10)
    // the collapse really collapsed: cluster reps are unique
    assert(res.map(_._2).distinct.length == res.length)
    // ranking is intact: scores nonincreasing, and the global best
    // doc (s1's #1) is always its own cluster's best → always kept
    assert(res.map(_._3).toSeq == res.map(_._3).sortBy(-_).toSeq)
    val s1Top = HybridSearch.s1KeywordBm25(spark, sfDir)
      .collect().head.getLong(0)
    assert(res.head._1 == s1Top)
    // every surviving doc outranks every clustermate it collapsed
    val labels = graft.operators.Pipeline.componentLabels(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    res.foreach { case (d, rep, _) =>
      assert(labels.getOrElse(d, d) == rep, s"doc $d carries wrong rep")
    }
    Caches.releaseAll()
  }

  test("s14 semantic collapse: one hit per mutual-kNN cluster, singletons pass through") {
    import spark.implicits._
    val res = HybridSearch.s14SemanticCollapsedSearch(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(res.nonEmpty && res.length <= 10)
    // the collapse really collapsed: cluster reps are unique
    assert(res.map(_._2).distinct.length == res.length)
    // ranking is intact and s1's global best survives (it is its own
    // cluster's best by definition)
    assert(res.map(_._3).toSeq == res.map(_._3).sortBy(-_).toSeq)
    val s1Top = HybridSearch.s1KeywordBm25(spark, sfDir)
      .collect().head.getLong(0)
    assert(res.head._1 == s1Top)
    // every survivor carries a20's label for it — the SEMANTIC
    // cluster assignment, not p5's near-dup text labels
    val labels = graft.operators.Knn.mutualKnnLabels(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    res.foreach { case (d, rep, _) =>
      assert(labels.getOrElse(d, d) == rep, s"doc $d carries wrong rep")
    }
    Caches.releaseAll()
  }

  test("s14 collapse drops the lower-scoring member of a planted semantic pair") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // two docs share a cluster (one mutual edge), a third is a
    // singleton: the pair must yield exactly ONE hit, the singleton
    // passes through untouched — replay the collapse core directly
    val scored = Seq((1L, 5.0), (2L, 3.0), (3L, 4.0))
      .toDF("doc_id", "score")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 3L))
      .toDF("vec_id", "cluster_rep")
    val lab = scored.join(labels, scored("doc_id") === labels("vec_id"), "left")
      .select($"doc_id", $"score",
        coalesce($"cluster_rep", $"doc_id").as("cluster_rep"))
    val w = Window.partitionBy($"cluster_rep").orderBy($"score".desc, $"doc_id")
    val out = lab.withColumn("r", row_number().over(w)).filter($"r" === 1)
      .select($"doc_id", $"cluster_rep", $"score")
      .orderBy($"score".desc, $"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 1L), (3L, 3L)),
      s"pair must collapse to its best member: ${out.mkString(",")}")
    Caches.releaseAll()
  }

  test("snippetsOf facade ≡ s10 query; no-hit docs fall back to the doc head") {
    import spark.implicits._
    // facade over the SAME corpus + ranking == the oracle-gated query
    val top = HybridSearch.s1KeywordBm25(spark, sfDir)
    val viaFacade = HybridSearch
      .snippetsOf(Tables.documents(spark, sfDir), top, HybridSearch.QueryTerms)
      .select($"doc_id", $"score", $"start_pos", $"n_terms", $"snippet")
      .orderBy($"score".desc, $"doc_id")
      .collect().map(_.toSeq).toSeq
    val viaQuery = HybridSearch.s10Snippets(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(viaFacade === viaQuery)
    // content rides along, and a hit containing NO query term still
    // renders (head fallback, n_terms = 0) instead of dropping out
    val corpus = Seq(
      (1L, "spark join filter makes this a term hit"),
      (2L, "vector only match with no keyword overlap at all"))
      .toDF("doc_id", "text")
    val ranked = Seq((1L, 0.9), (2L, 0.5)).toDF("doc_id", "hybrid_score")
    val out = HybridSearch
      .snippetsOf(corpus, ranked, HybridSearch.QueryTerms, window = 4)
      .orderBy($"doc_id")
      .collect()
    assert(out.length == 2)
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getAs[String]("content").startsWith("spark join"))
    assert(byId(1L).getAs[Long]("n_terms") == 3L)
    assert(byId(2L).getAs[Long]("n_terms") == 0L)
    assert(byId(2L).getAs[Long]("start_pos") == 1L)
    assert(byId(2L).getAs[String]("snippet") == "vector only match with")
    Caches.releaseAll()
  }

  test("s13 fielded split: first line is title, rest is body, no-newline is all title") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Spark Joins Explained\nthe body talks about shuffles"),
      (2L, "no newline here at all"),
      (3L, "\nstarts with the body")).toDF("doc_id", "text")
    val out = HybridSearch.fieldedSplitOf(docs).orderBy($"doc_id").collect()
    assert(out(0).getSeq[String](1) == Seq("spark", "joins", "explained"))
    assert(out(0).getSeq[String](2) == Seq("the", "body", "talks", "about", "shuffles"))
    assert(out(1).getSeq[String](1) == Seq("no", "newline", "here", "at", "all"))
    assert(out(1).getSeq[String](2).isEmpty)
    assert(out(2).getSeq[String](1).isEmpty)
    assert(out(2).getSeq[String](2) == Seq("starts", "with", "the", "body"))
    Caches.releaseAll()
  }

  test("s13 BM25F: title match outranks the same match in the body; fields saturate once") {
    import spark.implicits._
    // uniform field lengths → both per-field normalizers are exactly
    // 1.0, so tfw = wT·tf_t + wB·tf_b with nothing length-dependent
    def doc(id: Long, t: Seq[String], b: Seq[String]) = (id, t, b)
    val split = Seq(
      doc(1L, Seq("spark", "x", "y"), Seq("a", "b", "c", "d")),   // title hit
      doc(2L, Seq("x", "y", "z"), Seq("spark", "b", "c", "d")),   // body hit
      doc(3L, Seq("spark", "x", "y"), Seq("spark", "b", "c", "d")), // both
      doc(4L, Seq("x", "y", "z"), Seq("a", "b", "c", "d")))       // no hit
      .toDF("doc_id", "ttok", "btok")
    val res = HybridSearch.fieldedBm25Of(split, Seq("spark"), 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(!res.contains(4L), "non-matching doc must not score")
    // wTitle=2 > wBody=1: the title hit beats the identical body hit
    assert(res(1L) > res(2L))
    // single saturation: the both-fields doc combines tf BEFORE the
    // curve, so its score is strictly less than res(1)+res(2) (which
    // is what naive two-leg BM25 summing would give — same idf, and
    // x/(k+x) is strictly subadditive for x>0)
    assert(res(3L) > res(1L) && res(3L) < res(1L) + res(2L))
    // with equal weights, (1 title + 1 body) ≡ pseudo-tf 2: the
    // combined frequency, not the field it came from, drives the curve
    val eq = HybridSearch.fieldedBm25Of(
      Seq(doc(1L, Seq("spark", "x", "y"), Seq("spark", "b", "c")),
          doc(2L, Seq("spark", "spark", "y"), Seq("a", "b", "c")),
          doc(3L, Seq("x", "y", "z"), Seq("a", "b", "c")))
        .toDF("doc_id", "ttok", "btok"),
      Seq("spark"), 10, wTitle = 1.0, wBody = 1.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(eq(1L) == eq(2L))
    Caches.releaseAll()
  }

  test("s13 query returns a deterministic top-10 on the stock corpus") {
    val rows = HybridSearch.s13FieldedBm25(spark, sfDir).collect()
    assert(rows.length == 10)
    val scores = rows.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse)
    assert(scores.forall(_ > 0))
    Caches.releaseAll()
  }
}
