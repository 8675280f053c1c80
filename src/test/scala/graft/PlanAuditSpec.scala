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

  test("a9: kNN-graph bucket join is an equi hash join, never cartesian") {
    val p = plan(Knn.a9KnnJoin(spark, sfDir))
    assert(!p.contains("CartesianProduct"), s"a9 went all-pairs:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"a9 has a BNLJ:\n$p")
    Caches.releaseAll()
  }

  test("p8: pack layout is one keyed exchange + in-partition sort + mapPartitions") {
    val p = plan(graft.operators.Curation.p8PackBins(spark, sfDir))
    assert(p.contains("MapPartitions"), "next-fit kernel missing")
    // exactly one REPARTITION_BY_COL exchange feeds the kernel (the
    // final presentation sort adds its own range exchange)
    assert("REPARTITION_BY_COL".r.findAllIn(p).size === 1, s"wrong exchanges:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q37: agg + min window share ONE hash exchange on l_partkey") {
    val p = plan(EngineQueries.q37MinCost(spark, sfDir))
    assert(p.contains("Window"), "expected min window")
    assert(p.contains("BroadcastHashJoin"), "part/supplier/nation dims broadcast")
    assert(!p.contains("CartesianProduct"))
    // hashpartitioning exchanges: the explicit repartition(l_partkey)
    // must serve BOTH the composite-key aggregate and the window —
    // no second hash exchange between them (top-k adds no hash
    // exchange; the presentation orderBy rides TakeOrdered)
    val hashEx = "hashpartitioning".r.findAllIn(p.toLowerCase).size
    assert(hashEx <= 1, s"agg/window must reuse one exchange, saw $hashEx:\n$p")
  }

  test("q35: orders aggregate BEFORE the customer join, count rows not orders") {
    val p = plan(EngineQueries.q35OrderCountDist(spark, sfDir))
    assert(!p.contains("CartesianProduct"))
    // the rewrite's signature: orders.parquet feeds a HashAggregate
    // below the join (aggregate-then-join), so the join input is one
    // row per customer. A plan that joined raw orders first would
    // put the first HashAggregate above the join.
    val scanIdx = p.indexOf("orders.parquet")
    val joinIdx = p.indexOf("SortMergeJoin")
    val aggIdx = p.indexOf("HashAggregate")
    assert(scanIdx >= 0 && aggIdx >= 0, s"plan shape unexpected:\n$p")
    if (joinIdx >= 0)
      assert(aggIdx < joinIdx || p.contains("BroadcastHashJoin"),
        s"orders must aggregate before the join:\n$p")
  }

  test("m6/m7: header walks use the byte_at kernel over LAYERED hop columns") {
    // (AQE hides WholeStageCodegen nodes until execution, so assert
    // the structural properties that keep the stage codegen-sized:
    // per-hop offsets survive as project aliases — CollapseProject
    // must NOT re-inline them into an exponential tree — and every
    // byte read is the kernel, not the substr->hex->conv string path)
    Seq(graft.operators.Multimodal.m6JpegMeta(spark, sfDir),
        graft.operators.Multimodal.m7Mp4Meta(spark, sfDir)).foreach { df =>
      val p = plan(df)
      assert(p.contains("byte_at("), s"byte kernel missing:\n${p.take(1500)}")
      assert(p.contains("AS _off2"), s"hop columns were inlined:\n${p.take(1500)}")
      assert(!p.contains("conv(hex(substring(payload"),
        "slow substr->hex->conv byte path resurfaced")
    }
  }

  test("q51/q47: the lag/lead windows share ONE keyed exchange") {
    Seq(EngineQueries.q51SessionPaths(spark, sfDir),
        EngineQueries.q47Scd2(spark, sfDir)).foreach { df =>
      val p = plan(df)
      // exactly one hashpartitioning on user_id feeds the window
      // chain; a second would mean the lag and lead stages stopped
      // sharing their exchange
      val userExchanges = "hashpartitioning\\(user_id".r
        .findAllIn(p).length
      assert(userExchanges == 1, s"expected 1 user_id exchange, got $userExchanges")
      assert(!p.contains("CartesianProduct"))
    }
  }

  test("q52: cohort table broadcasts back; no user-keyed sort-merge join") {
    val p = plan(EngineQueries.q52RetentionCohorts(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), s"cohort join must broadcast:\n${p.take(1200)}")
    assert(!p.contains("SortMergeJoin"))
  }

  test("t16/p13: bucket counting stays on the poly_bow codegen kernel") {
    Seq(graft.operators.QualityModel.t16QualityLr(spark, sfDir),
        graft.operators.Curation.p13Dsir(spark, sfDir)).foreach { df =>
      val p = plan(df)
      assert(p.contains("poly_bow("),
        s"poly_bow kernel missing (interpreted HOF filters resurfaced?):\n${p.take(1200)}")
      TrainedModels.clear()
      Caches.releaseAll()
    }
  }

  test("large-k centroids travel as a broadcast handle, not plan literals") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // k=1024 at 16 dims = 16384 doubles — over LiteralCentroidBudget
    val k = 1024; val dims = 16
    val cents: Seq[Seq[Double]] = (0 until k).map(j =>
      (0 until dims).map(i => math.sin(j * 31 + i).toDouble))
    // spark.range, not a local Seq — ConvertToLocalRelation would
    // eagerly fold a LocalRelation and leave no kernel in the plan
    val vecs = spark.range(0, 200)
      .select($"id".as("vec_id"),
        transform(sequence(lit(0), lit(dims - 1)),
          i => cos($"id" * 17 + i)).as("v"))
    val assigned = Knn.assign(vecs, cents)
    val pa = plan(assigned)
    assert(pa.contains("nearest_centroid_bc"),
      s"large-k assignment must use the broadcast kernel:\n${pa.take(1200)}")
    // the plan string must not embed the matrix — a literal path at
    // this k would print thousands of doubles
    assert(pa.length < 20000, s"plan size suggests literal centroids: ${pa.length}")
    val scored = vecs.withColumn("s",
      Knn.centroidScoresCol(spark, $"v", cents))
    val ps = plan(scored)
    assert(ps.contains("centroid_scores_bc"),
      s"large-k probe scores must use the broadcast kernel:\n${ps.take(1200)}")
    // bit-equality with the literal kernels (forced below the switch)
    graft.plans.GraftFunctions.ensureRegistered(spark)
    val litAssigned = vecs.withColumn("cid",
      call_function("nearest_centroid", $"v", typedLit(cents)))
    assert(assigned.orderBy("vec_id").collect().map(_.getInt(2)).toSeq ==
           litAssigned.orderBy("vec_id").collect().map(_.getInt(2)).toSeq)
    val litScores = vecs.withColumn("s",
      transform(array(cents.map(c => array(c.map(lit): _*)): _*),
        c => call_function("cosine_sim", $"v", c)))
    assert(scored.orderBy("vec_id").collect().map(_.getSeq[Double](2)).toSeq ==
           litScores.orderBy("vec_id").collect().map(_.getSeq[Double](2)).toSeq)
  }

  test("p16: interleave uses keyed windows only (no global window)") {
    val df = graft.operators.Curation.p16MixtureInterleave(spark, sfDir)
    val p = plan(df)
    // every Window in the plan is partitioned (shard or shard+source)
    assert(!p.contains("Window [") ||
           !"Window \\[[^\\]]*\\], \\[\\]".r.findFirstIn(p).isDefined,
      "found an unpartitioned window")
    assert(p.contains("hashpartitioning(shard"),
      s"expected shard-keyed exchange:\n${p.take(1200)}")
    Caches.releaseAll()
  }

  test("a14/a15: query side broadcasts, no cartesian, popcount stays in codegen") {
    Seq(Knn.a14KnnBinary(spark, sfDir), Knn.a15KnnCascade(spark, sfDir))
      .foreach { df =>
        val p = plan(df)
        assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
          "the tiny query side must broadcast")
        assert(!p.contains("CartesianProduct"), "no partitioned cartesian")
        assert(p.contains("bit_count"), "Hamming must be the popcount expression")
      }
    Caches.releaseAll()
  }

  test("q54: both state branches partial-aggregate before the merge exchange") {
    val p = plan(EngineQueries.q54IncrementalAgg(spark, sfDir))
    // two-phase agg on each input branch: partial_sum/count appear
    assert(p.contains("partial_"), "expected map-side partial aggregation")
    assert(!p.contains("CartesianProduct"))
  }

  test("p17/p18: sampling plans avoid any global sort") {
    val p17 = plan(graft.operators.Curation.p17WeightedSample(spark, sfDir))
    assert(p17.contains("TakeOrderedAndProject"),
      s"p17 global top-k must be a heap merge:\n${p17.take(800)}")
    val p18 = plan(graft.operators.Curation.p18TokenBudget(spark, sfDir))
    // the only window is source-keyed; quota arrives as a broadcast
    assert(p18.contains("hashpartitioning(source"),
      s"p18 cumsum must exchange on source:\n${p18.take(800)}")
    assert(p18.contains("BroadcastNestedLoopJoin") || p18.contains("BroadcastExchange"),
      "scalar quota must broadcast")
    Caches.releaseAll(); Caches.releaseShared()
  }

  test("a17: one measured grid — config side broadcasts, no per-config re-rank") {
    // fresh caches so the shared grid's BUILD plan (not an opaque
    // cached handle) is what gets audited
    Caches.releaseAll(); Caches.releaseShared()
    val p = plan(Knn.a17CascadeTuning(spark, sfDir))
    assert(!p.contains("CartesianProduct"))
    // the 9-row config grid rides ONE broadcast theta join; the
    // hamming shortlist is ranked ONCE and shared across configs —
    // nine per-config pipelines would show ~9 ranking windows
    assert(p.contains("BroadcastNestedLoopJoin"), "config grid must broadcast")
    val windows = p.split("\\bWindow\\b").length - 1
    assert(windows <= 6, s"expected one shared ranking chain, got $windows windows")
    Caches.releaseAll(); Caches.releaseShared()
  }

  test("s10: only the top-k docs are re-tokenized (broadcast semi-join before explode)") {
    Caches.releaseAll(); Caches.releaseShared()
    val p = plan(HybridSearch.s10Snippets(spark, sfDir))
    // the corpus scan is filtered through the broadcast top-k BEFORE
    // the posexplode blows token positions out
    assert(p.contains("BroadcastHashJoin"), "top-k join must broadcast")
    assert(p.contains("Generate"), "expected the posexplode stage")
    assert(!p.contains("CartesianProduct"))
    Caches.releaseAll(); Caches.releaseShared()
  }

  test("d16/d16b/d17: sweeps reuse cached candidates; tau/geometry sides broadcast") {
    Caches.releaseAll(); Caches.releaseShared()
    val p16 = plan(Dedup.d16ThresholdSweep(spark, sfDir))
    // the theta join against the 5-row tau grid must be a broadcast
    // nested loop (tiny side), never a partitioned cartesian
    assert(p16.contains("BroadcastNestedLoopJoin"), "tau grid must broadcast")
    assert(!p16.contains("CartesianProduct"))
    val p16b = plan(Dedup.d16bSourceSweep(spark, sfDir))
    assert(p16b.contains("BroadcastNestedLoopJoin") && !p16b.contains("CartesianProduct"))
    Caches.releaseAll(); Caches.releaseShared()
    val p17b = plan(Dedup.d17BandSweep(spark, sfDir))
    assert(!p17b.contains("CartesianProduct"))
    // five geometries fold ONE cached signature scan (every band
    // explode reads InMemoryTableScan, not a fresh corpus sketch;
    // the cached subtree's text repeats per reference site, so
    // expression-occurrence counts are not meaningful here)
    assert(p17b.contains("InMemoryTableScan"),
      "sweep must serve off the shared cached signatures")
    Caches.releaseAll(); Caches.releaseShared()
  }

  test("f5: archive expansion is a single-scan mapPartitions pipeline") {
    val p = plan(graft.operators.FileIngest.f5DeflateIngest(spark, sfDir))
    assert(p.contains("MapPartitions"), "expected the per-task Inflater stage")
    assert(p.split("documents.parquet").length - 1 == 1,
      "corpus must be scanned exactly once")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"))
    Caches.releaseAll()
  }

  test("c24: recrawl schedule is keyed windows + broadcast delays") {
    Caches.releaseAll()
    val p = plan(graft.operators.Robots.c24RecrawlSchedule(spark, sfDir))
    // pacing runs in per-host window partitions; delays broadcast
    // (c18's fresh-vs-stored full outer join is the one legitimate
    // wide join in this plan)
    assert(p.contains("hashpartitioning(host"),
      s"pacing must exchange on host:\n${p.take(800)}")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "crawl-delay side must broadcast")
    assert(!p.contains("CartesianProduct"))
    Caches.releaseAll()
  }

  test("t27/t28: per-row text cleanups are shuffle-free scans (output sort only)") {
    // both kernels run inside the row scan; the ONLY exchange either
    // plan may carry is the rangepartitioning for the ordered dump
    val p27 = plan(graft.operators.TextAnalysis.t27UnicodeClean(spark, sfDir))
    assert(p27.contains("mojibake_repair") && p27.contains("nfc_normalize"),
      "both kernels must appear in the scan projection")
    assert(!p27.contains("Exchange hashpartitioning"),
      s"t27 must not shuffle:\n${p27.take(800)}")
    assert(!p27.contains("Join"), "t27 is a single-table scan")
    val p28 = plan(graft.operators.CorpusFilters.t28RepetitionStrip(spark, sfDir))
    assert(!p28.contains("Exchange hashpartitioning"),
      s"t28 must not shuffle (first-occurrence test is per-row):\n${p28.take(800)}")
    assert(!p28.contains("Window") && !p28.contains("Join"),
      "t28 must not use a window or a join — the HOF does the dedup")
  }

  test("p24: manifest costs one stream exchange, agg rides the pack partitioning") {
    val p = plan(graft.operators.Curation.p24ShardManifest(spark, sfDir))
    // exchanges: hash(stream) for the pack, plus the post-aggregate
    // (stream, bin) exchange — the mapPartitions pack hides its
    // partitioning from Catalyst, but the PARTIAL aggregate runs
    // map-side first, so that second exchange moves one row per
    // group per partition, not corpus rows; then range for the
    // ordered dump
    assert(p.split("Exchange hashpartitioning").length - 1 <= 2,
      s"unexpected extra keyed exchanges:\n${p.take(1200)}")
    assert(p.split("HashAggregate").length - 1 >= 2,
      "partial + final aggregation expected (map-side combine)")
    assert(p.contains("MapPartitions"), "expected the next-fit pack pass")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"))
  }

  test("s14: collapse serves from the shared label cache, top-k bounded") {
    Caches.releaseAll(); Caches.releaseShared()
    // build the shared graph first (the serving accounting), then
    // audit the SERVING plan
    graft.operators.Knn.mutualKnnLabels(spark, sfDir).count()
    val p = plan(HybridSearch.s14SemanticCollapsedSearch(spark, sfDir))
    assert(p.contains("InMemoryTableScan"),
      "labels must serve from the shared mutual-graph cache")
    assert(p.contains("TakeOrderedAndProject"),
      "final top-k must be bounded, not a full sort")
    assert(p.contains("PartialTopK") && p.contains("FinalTopK"),
      "per-cluster best must compile to the TopKPerKey heaps, not sort+filter")
    // the one BroadcastNestedLoopJoin is the intended ONE-ROW corpus
    // stats broadcast in the bm25 leg (the p22 scalar-join shape)
    assert(!p.contains("CartesianProduct"))
    Caches.releaseAll(); Caches.releaseShared()
  }

  test("m16: sample-table walk is a map-only scan — one file read, no joins") {
    val p = plan(graft.operators.Multimodal.m16Mp4Samples(spark, sfDir))
    assert(!p.contains("Join"), "header walk must not join")
    assert(p.split("FileScan parquet").length == 2,
      "exactly one documents scan feeds synthesis + walk")
    // the only exchange is the deterministic output ordering
    assert(p.split("Exchange").length <= 2, s"unexpected shuffle:\n$p")
    Caches.releaseAll()
  }

  test("d19: strip is gram/doc-keyed joins over one persisted scan — no cartesian, no NLJ") {
    val p = plan(graft.operators.Curation.d19BoilerplateStrip(spark, sfDir))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "breadth and cover joins must stay keyed")
    // (no FileScan occurrence count: the persisted token view's
    // subtree TEXT repeats per reference site — plan-audit gotcha)
    assert(p.contains("InMemoryTableScan") || p.contains("InMemoryRelation"),
      "the tokenized view must be the persisted scan both branches read")
    Caches.releaseAll()
  }

  test("s16: mining collects a bounded term list; serving is s1's columnwise shape") {
    val p = plan(graft.operators.HybridSearch.s16MoreLikeThis(spark, sfDir))
    // the one nested-loop join is the intended ONE-ROW stats
    // broadcast (bm25Scores' corpus-stats cross)
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastNestedLoopJoin"),
      "corpus stats must broadcast as the one-row cross")
    assert(!p.contains("Generate explode"),
      "serving must stay columnwise — no token explode in the plan")
    Caches.releaseAll()
  }

  test("a22: serving walk joins ids, graph reads the truncated edge table, no cartesian") {
    Caches.releaseAll(); Caches.releaseShared()
    val p = plan(Knn.a22GraphSearch(spark, sfDir))
    assert(!p.contains("CartesianProduct"), "no cartesian anywhere in the walk")
    // medoid entries replaced the old queries × entry-ids crossJoin:
    // the per-query entry set is a HASH join of the probed cells
    // against the broadcast ≤24-row medoid table, so no nested-loop
    // join survives anywhere in the walk
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "the medoid entry join must be a hash join, not a cross")
    // the graph must serve from the lineage-truncated edge table —
    // NOT re-analyze the NN-Descent build per action
    assert(p.contains("Scan ExistingRDD"),
      "graph must read the checkpointed edge table")
    assert(p.contains("BroadcastHashJoin"),
      "query vectors and medoids must broadcast into the walk")
    Caches.releaseAll(); Caches.releaseShared()
  }

  test("f8: gzip-WARC ingestion is a single-scan mapPartitions chain — no joins") {
    val p = plan(graft.operators.FileIngest.f8WarcGz(spark, sfDir))
    assert(p.contains("MapPartitions"),
      "expected the per-task Deflater/Inflater stages")
    assert(p.split("documents.parquet").length - 1 == 1,
      "corpus must be scanned exactly once")
    assert(!p.contains("Join") && !p.contains("CartesianProduct"),
      "compress→walk→parse must stay a per-row chain")
    Caches.releaseAll()
  }

  test("m17: MP3 walk is a map-only scan over layered hop columns") {
    val p = plan(graft.operators.Multimodal.m17Mp3Meta(spark, sfDir))
    assert(!p.contains("Join"), "header walk must not join")
    assert(p.contains("byte_at"), "byte reads must stay on the codegen kernel")
    // the only exchange is the deterministic output ordering
    assert(p.split("Exchange").length <= 2, s"unexpected shuffle:\n$p")
    Caches.releaseAll()
  }

  test("s17: served BM25 keeps serving columnwise — no token explode, stats broadcast") {
    val p = plan(graft.operators.HybridSearch.s17ServedBm25(spark, sfDir))
    assert(!p.contains("Explode") && !p.contains("Generate"),
      "index serving must never re-tokenize the corpus")
    assert(p.contains("BroadcastExchange") || p.contains("Broadcast"),
      "the one-row stats frame must broadcast")
    assert(!p.contains("CartesianProduct"))
    Caches.releaseAll()
  }
}
