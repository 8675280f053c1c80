package graft

import graft.operators.Dedup

class DedupSpec extends SparkSpec {

  test("d1 exact dedup keeps one id per distinct text") {
    val rows = Dedup.d1Exact(spark, sfDir).collect()
    val total = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getLong(2)).sum == total) // copies partition the corpus
    assert(rows.map(_.getLong(1)).distinct.length == rows.length)
  }

  test("d2 minhash-LSH covers the min/max-shingle-blocked jaccard pairs") {
    val lsh = Dedup.d2MinhashLsh(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = Dedup.d4NgramJaccard(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked.nonEmpty, "test corpus should contain planted near-dups")
    // d2's 64-band LSH has strictly higher recall than d4's 1-perm block
    assert(blocked.subsetOf(lsh), s"d4 found pairs d2 missed: ${blocked -- lsh}")
  }

  test("d8 incremental losers are exactly d2's pairs with a new-side loser") {
    import org.apache.spark.sql.functions.expr
    val cut = Tables.documents(spark, sfDir)
      .agg(expr("max(doc_id) div 2")).head().getLong(0)
    val d8 = Dedup.d8IncrementalDedup(spark, sfDir).collect()
    // every loser is from the incoming slice, every match is older
    d8.foreach { r =>
      assert(r.getLong(0) >= cut, "losers must be incoming docs")
      assert(r.getLong(1) < r.getLong(0), "best match must be a prior doc")
    }
    assert(d8.map(_.getLong(0)).distinct.length == d8.length,
      "one best-match row per loser")
    // the incremental probe finds the same new-side losers the full
    // d2 pass does (store×store pairs are the only ones skipped)
    val d2Losers = Dedup.d2MinhashLsh(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter(_._2 >= cut).map(_._2).toSet
    assert(d8.map(_.getLong(0)).toSet == d2Losers)
  }

  test("d3 simhash recalls most high-jaccard near-dups") {
    val rows = Dedup.d3Simhash(spark, sfDir).collect()
    rows.foreach(r => assert(r.getInt(2) <= 5, "pair above hamming threshold"))
    val sim = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val strong = Dedup.d4NgramJaccard(spark, sfDir).collect()
      .filter(_.getDouble(2) >= 0.7).map(r => (r.getLong(0), r.getLong(1))).toSet
    // simhash over unigram bags is coarser than shingle jaccard; expect
    // good-but-not-perfect recall on planted near-dups
    val recall = strong.intersect(sim).size.toDouble / strong.size
    assert(recall >= 0.7, s"recall $recall, missed ${strong -- sim}")
  }

  test("d4 block cap kills the quadratic mega-bucket") {
    import spark.implicits._
    // pathological corpus: the same boilerplate-only page (license
    // header, cookie banner) repeated 300 times — every doc's single
    // shingle hash is both its min and max block key, so the uncapped
    // bucket would emit C(300,2) candidate pairs
    val docs = (0 until 300)
      .map(i => (i.toLong, "aaa aaa aaa"))
      .toDF("doc_id", "text")
    val sets = Dedup.hashedShingleSetsOf(docs)
    assert(Dedup.ngramCandidates(sets, 1000).count() == 300L * 299 / 2)
    assert(Dedup.ngramCandidates(sets, Dedup.MaxBlock).count() == 0)
  }

  test("d4 still finds true near-dups under the cap, via the salted fetch") {
    import spark.implicits._
    // theta/kappa chosen so the pair shares its MIN shingle hash
    // (5 of 7 union shingles are common; the min lands in the
    // intersection for this vocabulary) — a deterministic planted
    // near-dup that survives the mega-bucket drop
    val near1 = "alpha beta gamma delta epsilon zeta eta theta"
    val near2 = "alpha beta gamma delta epsilon zeta eta kappa"
    val docs = ((0 until 300)
      .map(i => (i.toLong, "aaa aaa aaa")) ++
      Seq((1000L, near1), (1001L, near2))).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(docs).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1000L, 1001L)))
    assert(math.abs(pairs.head.getDouble(2) - 5.0 / 7.0) < 1e-4)
  }

  test("d4 plan routes the shingle-set fetch through the salted join") {
    val plan = operators.Dedup.d4NgramJaccard(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), "expected salted join keys in the d4 plan")
  }

  test("d5 embedding pairs are symmetric-free and above threshold") {
    val rows = Dedup.d5EmbeddingCosine(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.4)
    }
  }

  test("incremental core: union-wide cap kills a boilerplate batch too") {
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    // 40 boilerplate copies in the store, 260 more arriving in the
    // batch: every copy collides in all 64 bands, so the capped
    // bucket must be measured across store ∪ batch — capping per side
    // would let the 40×260 cross pairs through
    def sigOf(ids: Range) = Dedup.hashedShingleSetsOf(
        ids.map(i => (i.toLong, "the same boilerplate page body everywhere"))
          .toDF("doc_id", "text"))
      .withColumn("mh", expr("minhash_sig(hs)"))
    val store = sigOf(0 until 40)
    val batch = sigOf(1000 until 1260)
    assert(Dedup.incrementalLosersOf(store, batch).count() == 0,
      "mega-bucket must be dropped before any probe pair is emitted")
    // sanity: a small honest batch IS matched against the store
    val ok = Dedup.incrementalLosersOf(store, sigOf(2000 until 2002))
    assert(ok.count() == 2, "true near-dups of the store must be flagged")
  }

  test("d2 band-bucket cap kills the quadratic boilerplate cluster") {
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    // pathological corpus: 300 byte-identical pages — identical
    // signatures collide in ALL 64 bands, so uncapped LSH would emit
    // C(300,2) candidate pairs (× 64 band collisions pre-distinct)
    val docs = (0 until 300)
      .map(i => (i.toLong, "the same boilerplate page body everywhere"))
      .toDF("doc_id", "text")
    val sig = Dedup.hashedShingleSetsOf(docs)
      .withColumn("mh", expr("minhash_sig(hs)"))
    assert(Dedup.lshCandidates(sig, 1000).count() == 300L * 299 / 2)
    assert(Dedup.lshCandidates(sig, Dedup.MaxBandBucket).count() == 0)
  }

  test("d5 label-cell cap bounds the hot quantizer cell") {
    import spark.implicits._
    // one degenerate 400-vector cell + one legitimate 2-vector cell
    val hot = (0 until 400).map(i => (i.toLong, 0L, Seq(1.0, 0.0)))
    val ok = Seq((1000L, 1L, Seq(0.6, 0.8)), (1001L, 1L, Seq(0.6, 0.8)))
    val e = (hot ++ ok).toDF("vec_id", "label", "v")
    // uncapped: the hot cell alone is C(400,2) pairs
    assert(Dedup.embeddingCosinePairsOf(e, 0.4, maxCell = 1000).count() ==
      400L * 399 / 2 + 1)
    // capped: hot cell dropped BEFORE the self-join, small cell kept
    assert(Dedup.embeddingCosinePairsOf(e, 0.4, maxCell = 100).count() == 1)
  }

  test("prepareCorpus chains near-dedup off exact survivors (1k-copy corpus)") {
    import spark.implicits._
    // 1000 byte-identical docs + one planted near-dup pair: the LSH
    // stage must see each distinct text once (the exact pass already
    // collapsed the copies), so the band join runs over 3 docs, not
    // 1002 — and the kept set is the exact keeper + the pair's keeper
    val boiler = (0 until 1000).map(i =>
      (i.toLong, "the same boilerplate page body repeated verbatim across the crawl"))
    val docs = (boiler ++ Seq(
      (5000L, "alpha beta gamma delta epsilon zeta eta theta"),
      (5001L, "alpha beta gamma delta epsilon zeta eta kappa")))
      .toDF("doc_id", "text")
    val eng = new GraftEngine(spark, docs)
    val kept = eng.prepareCorpus().select("doc_id").as[Long].collect().sorted.toSeq
    eng.releaseCaches()
    assert(kept == Seq(0L, 5000L))
  }

  test("p5 connected components closes transitive chains and rings") {
    import spark.implicits._
    // chain 1-2-3-4, ring 10-11-12-10, isolated pair 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
                    (10L, 12L), (20L, 21L)).toDF("a_id", "b_id")
    val labels = graft.operators.Pipeline.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(labels(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(labels(_) == 10L))
    assert(Seq(20L, 21L).forall(labels(_) == 20L))
  }

  test("d7 semantic dedup emits one verdict per vector, drops only pair b-sides") {
    val out = graft.operators.Dedup.d7SemDedup(spark, sfDir).collect()
    val total = Tables.embeddings(spark, sfDir).count()
    assert(out.length == total, "one verdict row per vector")
    val dropped = out.filter(!_.getBoolean(2)).map(_.getLong(0))
    assert(dropped.length < out.length, "quantizer cells must not drop everything")
    // the lowest vec_id can never be a pair's b-side
    assert(!dropped.contains(out.map(_.getLong(0)).min))
  }

  test("p5 star contraction converges in O(log) rounds on a long path") {
    import spark.implicits._
    // a 256-node path is the adversarial case for min-label
    // propagation (diameter rounds = 255); the alternating
    // large-star/small-star contraction closes it in O(log² n)
    val pairs = (0L until 255L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val (labelsDf, rounds) =
      graft.operators.Pipeline.connectedComponentsWithRounds(pairs)
    val labels = labelsDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 256)
    assert(labels.values.forall(_ == 0L), "every node labels to the path min")
    assert(rounds <= 12, s"expected logarithmic convergence, took $rounds rounds")
  }

  test("p5 star contraction matches union-find on a pseudo-random graph") {
    import spark.implicits._
    // deterministic scrambled edge set: multiple components, cycles,
    // cross links — compared against a driver-side union-find
    val n = 120
    val raw = (0 until 300).map { i =>
      val a = (i * 7919 + 13) % n
      val b = (a + 1 + (i * 104729) % 40) % n
      (a.toLong, b.toLong)
    }.filter { case (a, b) => a != b }
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    raw.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = raw.flatMap(p => Seq(p._1, p._2)).distinct
      .map(v => v -> find(v.toInt).toLong).toMap
    val got = graft.operators.Pipeline
      .connectedComponents(raw.toDF("a_id", "b_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // union-find parents compress to the same minimum per component
    // because unions always hang the larger root under the smaller
    assert(got == expected)
  }

  test("optimalBands minimizes the S-curve error and tracks the threshold") {
    import graft.operators.Dedup
    // the returned pair is the exhaustive argmin over divisor pairs
    for (t <- Seq(0.2, 0.3, 0.5, 0.8)) {
      val (b, r) = Dedup.optimalBands(t, 128)
      assert(b * r == 128)
      val best = Dedup.sCurveError(t, b, r)
      (1 to 128).filter(128 % _ == 0).foreach { b2 =>
        assert(best <= Dedup.sCurveError(t, b2, 128 / b2) + 1e-12)
      }
    }
    // higher thresholds want MORE rows per band (a steeper, later
    // S-curve): rows is monotone nondecreasing in the threshold
    val rows = Seq(0.1, 0.3, 0.5, 0.7, 0.9)
      .map(t => Dedup.optimalBands(t, 128)._2)
    assert(rows.zip(rows.tail).forall { case (a, c) => a <= c }, rows.toString)
    // the S-curve midpoint (1/b)^(1/r) of the chosen setting lands
    // near the requested threshold
    val (b3, r3) = Dedup.optimalBands(0.3, 128)
    val mid = math.pow(1.0 / b3, 1.0 / r3)
    assert(math.abs(mid - 0.3) < 0.15, s"midpoint $mid for b=$b3 r=$r3")
  }

  test("d11 containment flags a quoted subset that symmetric jaccard misses") {
    import spark.implicits._
    val small = (1 to 12).map(i => s"tok$i").mkString(" ")
    val big = small + " " + (100 to 260).map(i => s"pad$i").mkString(" ")
    val other = (300 to 340).map(i => s"zzz$i").mkString(" ")
    val docs = Seq((1L, big), (2L, small), (3L, other)).toDF("doc_id", "text")
    val out = graft.operators.Dedup
      .containmentOf(graft.operators.Dedup.hashedShingleSetsOf(docs))
      .collect()
    // the small doc is contained in the big one — and ONLY in that
    // direction (big-in-small containment is far below tau)
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 2L && r.getLong(1) == 1L)
    assert(r.getDouble(2) == 1.0) // every shingle of small is in big
    assert(r.getDouble(3) < 0.3)  // symmetric jaccard would never flag it
  }

  test("d11 posting cap drops boilerplate shingle keys before the join") {
    import spark.implicits._
    // 40 docs sharing one boilerplate prefix: with cap=8 the shared
    // shingles' postings are dropped, so no candidate explosion; the
    // planted true subset pair still surfaces through its rare probes
    val boiler = (1 to 10).map(i => s"same$i").mkString(" ")
    val herd = (0 until 40).map(i => (i.toLong, boiler))
    val small = (1 to 12).map(i => s"rare$i").mkString(" ")
    val big = small + " " + (1 to 50).map(i => s"fill$i").mkString(" ")
    val docs = (herd ++ Seq((100L, small), (101L, big))).toDF("doc_id", "text")
    val out = graft.operators.Dedup
      .containmentOf(graft.operators.Dedup.hashedShingleSetsOf(docs), cap = 8)
      .collect()
    // herd pairs (containment 1.0 among copies) are cut by the cap;
    // only the rare-probe subset pair survives
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((100L, 101L)))
  }

  test("p5 cluster output marks exactly one representative per cluster") {
    import spark.implicits._
    val out = graft.operators.Pipeline.p5DedupClusters(spark, sfDir).collect()
    assert(out.nonEmpty)
    val byRep = out.groupBy(_.getLong(1))
    byRep.foreach { case (rep, rows) =>
      assert(rows.count(_.getBoolean(3)) == 1, s"cluster $rep reps")
      assert(rows.forall(_.getLong(2) == rows.length), s"cluster $rep size")
      assert(rows.map(_.getLong(0)).min == rep, s"cluster $rep min")
    }
  }

  test("p19 cluster split: near-dup clusters are split-atomic, singletons match p3") {
    import spark.implicits._
    val split = graft.operators.Pipeline.p19ClusterSplit(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(split.nonEmpty && split.map(_._3).toSet.subsetOf(Set("train", "val", "test")))
    // cluster-atomicity: every member of a cluster shares one split
    split.groupBy(_._2).foreach { case (rep, rows) =>
      assert(rows.map(_._3).distinct.length == 1, s"cluster $rep straddles splits")
    }
    // singleton docs degrade to exactly p3's content-hash assignment
    val p3 = graft.operators.Curation.p3TrainSplit(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val clustered = split.groupBy(_._2).filter(_._2.length > 1)
      .values.flatten.map(_._1).toSet
    split.filterNot(r => clustered(r._1)).foreach { case (id, _, s) =>
      assert(p3(id) == s, s"singleton $id diverged from p3")
    }
    // and the leak p3 permits is actually closed here: any multi-doc
    // cluster where p3 assigns members differently is unified by p19
    val straddlers = split.groupBy(_._2).filter(_._2.length > 1).values
      .count(rows => rows.map(r => p3(r._1)).distinct.length > 1)
    val unified = split.groupBy(_._2).filter(_._2.length > 1).values
      .forall(rows => rows.map(_._3).distinct.length == 1)
    assert(unified)
    info(s"p3 would have straddled $straddlers near-dup clusters")
    Caches.releaseAll(); Caches.releaseShared()
  }

  test("adaptive components: driver union-find == distributed star contraction") {
    import spark.implicits._
    // path, ring, two cliques, and isolated pair — transitive chains
    // that punish any shortcut labeling
    val edges = (
      (0L until 9L).map(i => (i, i + 1)) ++            // path 0..9
      Seq((20L, 21L), (21L, 22L), (22L, 20L)) ++       // ring
      (for (a <- 30L to 33L; b <- (a + 1) to 33L) yield (a, b)) ++
      Seq((40L, 41L))
    ).toDF("a_id", "b_id")
    def labelsOf(limit: Long) = graft.operators.Pipeline
      .connectedComponentsAdaptive(edges, driverLimit = limit)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val driver = labelsOf(Long.MaxValue)
    val distributed = labelsOf(-1L)
    assert(driver == distributed, "paths disagree")
    // labels are the component minima
    assert((0L to 9L).forall(driver(_) == 0L))
    assert(Seq(20L, 21L, 22L).forall(driver(_) == 20L))
    assert((30L to 33L).forall(driver(_) == 30L))
    assert(driver(41L) == 40L)
    Caches.releaseAll()
  }

  test("d15 savings report is an exact accounting of p5's clusters") {
    import spark.implicits._
    val report = graft.operators.Pipeline.d15DedupSavings(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // all docs are accounted for: Σ size·n_clusters == corpus size
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(report.map { case (sz, (n, _, _)) => sz * n }.sum == nDocs)
    // droppable docs == p5's non-representative members
    val p5 = graft.operators.Pipeline.p5DedupClusters(spark, sfDir).collect()
    val nonReps = p5.count(!_.getBoolean(3)).toLong
    assert(report.map(_._2._2).sum == nonReps)
    // p5's size histogram and the report agree cluster for cluster
    val p5Sizes = p5.groupBy(_.getLong(1)).map(_._2.length.toLong)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    p5Sizes.foreach { case (sz, n) => assert(report(sz)._1 == n, s"size $sz") }
    // dropping costs tokens whenever a multi-doc cluster exists
    if (nonReps > 0) assert(report.exists { case (sz, (_, _, t)) => sz > 1 && t > 0 })
    Caches.releaseAll(); Caches.releaseShared()
  }

  test("d14 tuned LSH finds strong near-dups at the tuned geometry") {
    // the tuner picks a real split of the 128 perms for j>=0.5
    val (b, r) = Dedup.optimalBands(0.5, 128)
    assert(b * r == 128 && b > 1 && r > 1)
    // wider bands than d2's recall-heavy 64x2: the tuned threshold
    // (1/b)^(1/r) sits near 0.5, not 0.125
    val t = math.pow(1.0 / b, 1.0 / r)
    assert(t > 0.25 && t < 0.75, s"tuned threshold $t (b=$b r=$r)")
    val pairs = Dedup.d14TunedLsh(spark, sfDir).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { p =>
      assert(p.getLong(0) < p.getLong(1))
      assert(p.getDouble(2) >= 0.5)
    }
    // strong pairs (j >= 0.9) that d2's verified set contains must
    // also surface at the tuned geometry (collision prob ~1 there)
    val strong = Dedup.d2MinhashLsh(spark, sfDir).collect()
      .filter(_.getDouble(2) >= 0.9)
      .map(p => (p.getLong(0), p.getLong(1))).toSet
    val found = pairs.map(p => (p.getLong(0), p.getLong(1))).toSet
    assert(strong.subsetOf(found),
      s"missing strong pairs: ${strong -- found}")
    Caches.releaseAll(); Caches.releaseShared()
  }

  test("d16 sweep: counts decrease monotonically in tau, tau=0.3 row matches d4") {
    val rows = Dedup.d16ThresholdSweep(spark, sfDir).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq == Dedup.SweepTaus)
    // raising the threshold can only shrink the surviving set
    rows.zip(rows.tail).foreach { case (lo, hi) =>
      assert(lo._2 >= hi._2 && lo._3 >= hi._3,
        s"not monotone: tau=${lo._1} vs ${hi._1}")
    }
    // the tau=0.3 cell is exactly d4's pair count (same candidates,
    // same cut)
    val d4Pairs = Dedup.d4NgramJaccard(spark, sfDir).count()
    assert(rows.find(_._1 == 0.3).get._2 == d4Pairs)
    // doc_share is a true share of the shingled corpus
    rows.foreach(r => assert(r._4 >= 0.0 && r._4 <= 1.0))
    Caches.releaseAll()
  }

  test("p22 funnel: stages chain exactly, final survivors equal p1") {
    val rows = graft.operators.Pipeline.p22PrepareFunnel(spark, sfDir)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.map(_._2).toSeq ==
      Seq("quality_filter", "exact_dedup", "near_dedup"))
    // each stage's output is the next stage's input; dropped = in-out
    rows.zip(rows.tail).foreach { case (a, b) => assert(a._4 == b._3) }
    rows.foreach { case (_, s, in, out, dropped) =>
      assert(dropped == in - out && out <= in, s"$s accounting broken")
    }
    // the funnel audits the REAL pipeline: final out == p1's survivors
    val p1 = graft.operators.Pipeline.p1PrepareCorpus(spark, sfDir).count()
    assert(rows.last._4 == p1)
    Caches.releaseAll()
  }

  test("d16b per-source sweep: curves monotone per source, within-source ⊆ global") {
    val rows = Dedup.d16bSourceSweep(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    val bySource = rows.groupBy(_._1)
    assert(bySource.size > 1, "sweep should cover several sources")
    bySource.foreach { case (src, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == Dedup.SweepTaus, s"$src grid")
      // raising tau can only shrink a source's surviving set
      sorted.zip(sorted.tail).foreach { case (lo, hi) =>
        assert(lo._3 >= hi._3 && lo._4 >= hi._4,
          s"$src not monotone at tau=${hi._2}")
      }
      sorted.foreach(r => assert(r._5 >= 0.0 && r._5 <= 1.0))
    }
    // within-source pairs are a subset of the global d16 curve
    val d16 = Dedup.d16ThresholdSweep(spark, sfDir).collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    Dedup.SweepTaus.foreach { t =>
      assert(rows.filter(_._2 == t).map(_._3).sum <= d16(t),
        s"per-source pairs exceed global at tau=$t")
    }
    Caches.releaseAll()
  }

  test("d17 band sweep: grid sane, pick rule replays, d14 serves the measured geometry") {
    import spark.implicits._
    val grid = Dedup.d17BandSweep(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getDouble(6), r.getBoolean(7)))
    assert(grid.length == Dedup.SweepGeometries.length)
    assert(grid.count(_._7) == 1, "exactly one geometry chosen")
    grid.foreach { case (b, r, nc, hits, poss, rec, _) =>
      assert(b * r == 128, s"($b,$r) is not a 128-perm split")
      assert(hits <= nc && hits <= poss)
      assert(rec >= 0.0 && rec <= 1.0)
    }
    // narrow bands are the recall-heavy end of the S-curve
    val byBands = grid.map(t => t._1 -> t._6).toMap
    assert(byBands(64) >= byBands(4))
    // replay the pick rule independently of the operator
    val expect = grid.minBy { case (b, _, nc, _, _, rec, _) =>
      (if (rec >= Dedup.BandRecallFloor) nc.toDouble
       else 1e18 * (1.0 - rec), -b)
    }
    val chosen = grid.find(_._7).get
    assert((chosen._1, chosen._2) === ((expect._1, expect._2)))
    // d14 == the shared LSH core run directly at the measured
    // geometry — the serve really uses the pick
    val d14 = Dedup.d14TunedLsh(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val direct = Dedup.minhashLshPairsOf(
        Dedup.minhashSigs(spark, sfDir), Dedup.MaxBandBucket, 0.5,
        chosen._1, chosen._2)
      .orderBy($"a_id", $"b_id").collect().map(_.toSeq).toSeq
    assert(d14 === direct)
    Caches.releaseAll()
  }
}
