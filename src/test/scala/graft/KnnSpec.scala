package graft

import graft.operators.Knn

class KnnSpec extends SparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("a1 brute force returns exactly 5 ranked neighbors per query") {
    val rows = Knn.a1BruteForce(spark, sfDir).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 10)
    byQ.values.foreach { rs =>
      assert(rs.length == 5)
      val cosines = rs.sortBy(_.getInt(3)).map(_.getDouble(2)).toSeq
      assert(cosines == cosines.sorted.reverse, "cosine must descend with rank")
    }
    rows.foreach(r => assert(r.getLong(0) != r.getLong(1), "self-match"))
  }

  test("a2 LSH recalls most brute-force neighbors") {
    val bf = pairs(Knn.a1BruteForce(spark, sfDir))
    val lsh = pairs(Knn.a2Lsh(spark, sfDir))
    val recall = bf.intersect(lsh).size.toDouble / bf.size
    assert(recall >= 0.6, s"LSH recall $recall too low")
  }

  test("LSH recall is tunable: more tables strictly widens the candidate net") {
    val bf = pairs(Knn.a1BruteForce(spark, sfDir))
    def recall(tables: Int): Double = {
      val got = pairs(Knn.lshKnn(spark, sfDir, tables, bits = 4, k = 5))
      bf.intersect(got).size.toDouble / bf.size
    }
    val lo = recall(2)
    val hi = recall(24)
    assert(hi >= lo, s"recall must not drop with more tables ($lo -> $hi)")
    assert(hi >= 0.6, s"24-table recall $hi too low")
  }

  test("a3 IVF neighbors all come from probed cells and rank correctly") {
    val rows = Knn.a3Ivf(spark, sfDir).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 10)
    byQ.values.foreach(rs => assert(rs.length <= 5))
  }

  test("a4 k-means IVF: valid shape and decent recall vs brute force") {
    val rows = Knn.a4IvfKmeans(spark, sfDir).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 10)
    byQ.values.foreach { rs =>
      assert(rs.length <= 5)
      val cosines = rs.sortBy(_.getInt(3)).map(_.getDouble(2)).toSeq
      assert(cosines == cosines.sorted.reverse)
    }
    val bf = pairs(Knn.a1BruteForce(spark, sfDir))
    val recall = bf.intersect(pairs(Knn.a4IvfKmeans(spark, sfDir))).size.toDouble / bf.size
    assert(recall >= 0.4, s"IVF nprobe=2/8 recall $recall too low")
  }

  test("a5 SQ8 refine+rerank recovers nearly all brute-force neighbors") {
    val bf = pairs(Knn.a1BruteForce(spark, sfDir))
    val sq = pairs(Knn.a5KnnSq8(spark, sfDir))
    val recall = bf.intersect(sq).size.toDouble / bf.size
    assert(recall >= 0.9, s"SQ8 recall $recall too low for refine=20")
  }

  test("k-means centroids: deterministic count and dimensionality") {
    import spark.implicits._
    val vecs = Tables.embeddings(spark, sfDir)
      .select($"vec_id", graft.functions.VectorFunctions.asDouble($"embedding").as("v"))
    val cents = Knn.kmeansFit(vecs, k = 4, iters = 2)
    assert(cents.length <= 4 && cents.nonEmpty)
    assert(cents.forall(_.length == cents.head.length))
  }

  test("s2 single-query top-k is the brute-force head for q=0") {
    val s2 = Knn.s2VectorTopk(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(s2.length == 10)
    val bfTop = Knn.a1BruteForce(spark, sfDir).collect()
      .filter(_.getLong(0) == 0).sortBy(_.getInt(3))
      .map(r => (r.getLong(1), r.getDouble(2)))
    assert(s2.take(5).toSeq == bfTop.toSeq)
  }

  test("a6 PQ ADC returns 5 ranked neighbors per query with decent recall") {
    import spark.implicits._
    val pq = graft.operators.Knn.a6KnnPq(spark, sfDir).collect()
    val exact = graft.operators.Knn.a1BruteForce(spark, sfDir).collect()
    val qids = pq.map(_.getLong(0)).distinct
    assert(qids.length == 10)
    qids.foreach { q =>
      val mine = pq.filter(_.getLong(0) == q)
      assert(mine.map(_.getInt(3)).toSeq == (1 to 5))
      val cosines = mine.map(_.getDouble(2)).toSeq
      assert(cosines == cosines.sorted.reverse)
    }
    // refine-set recall vs brute force: at least half of the exact
    // top-5 survives the 4-byte-code approximation on average
    val hits = qids.map { q =>
      val mine = pq.filter(_.getLong(0) == q).map(_.getLong(1)).toSet
      val gold = exact.filter(_.getLong(0) == q).map(_.getLong(1)).toSet
      mine.intersect(gold).size
    }.sum
    assert(hits >= qids.length * 5 / 2, s"recall too low: $hits/50")
  }

  test("a7 pqFit books: full shape, slot stability, and trained recall") {
    import spark.implicits._
    val vecs = Tables.embeddings(spark, sfDir)
      .select($"vec_id", graft.functions.VectorFunctions.asDouble($"embedding").as("v"))
    val books = Knn.pqFit(vecs, m = 8, sub = 8, k = 16, iters = 2)
    assert(books.length == 8, "one codebook per subspace")
    books.foreach { cb =>
      assert(cb.length == 16, "k codewords survive (empty slots keep previous)")
      cb.foreach(c => assert(c.length == 8, "subspace dimensionality"))
    }
    val pq = Knn.a7KnnPqKmeans(spark, sfDir).collect()
    val exact = Knn.a1BruteForce(spark, sfDir).collect()
    val qids = pq.map(_.getLong(0)).distinct
    assert(qids.length == 10)
    qids.foreach { q =>
      val mine = pq.filter(_.getLong(0) == q)
      assert(mine.map(_.getInt(3)).toSeq == (1 to 5))
    }
    // Lloyd-fit codebooks must do at least as well as a6's bar: the
    // trained quantizer can only tighten the sampled one's cells
    val hits = qids.map { q =>
      val mine = pq.filter(_.getLong(0) == q).map(_.getLong(1)).toSet
      val gold = exact.filter(_.getLong(0) == q).map(_.getLong(1)).toSet
      mine.intersect(gold).size
    }.sum
    assert(hits >= qids.length * 5 / 2, s"recall too low: $hits/50")
  }

  test("a11 IVF+PQ residual index keeps ranked shape and real recall") {
    val pq = Knn.a11IvfPq(spark, sfDir).collect()
    val exact = Knn.a1BruteForce(spark, sfDir).collect()
    val qids = pq.map(_.getLong(0)).distinct
    assert(qids.length == 10)
    qids.foreach { q =>
      val mine = pq.filter(_.getLong(0) == q)
      assert(mine.map(_.getInt(3)).toSeq == (1 to mine.length))
    }
    // probed-cell + residual-ADC candidates must still recover a
    // solid share of the true neighbors
    val hits = pq.count { r =>
      exact.exists(e => e.getLong(0) == r.getLong(0) && e.getLong(1) == r.getLong(1))
    }
    assert(hits >= 20, s"IVF+PQ recall too low: $hits/50")
    Caches.releaseAll()
  }

  test("a10 multi-probe beats exact-bucket recall on one table") {
    // 4 bits at this tiny SF: 16 buckets over ~100 vectors keeps
    // buckets populated (the sf0.01 oracle runs the 8-bit default)
    val mp = Knn.a10MultiprobeLsh(spark, sfDir, bits = 4).collect()
    val exact = Knn.a1BruteForce(spark, sfDir).collect()
    // shape: ranks are contiguous from 1 per query
    mp.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getInt(3)).sorted.toSeq == (1 to rows.length))
    }
    // recall vs brute force: the 1-bit-flip probes must recover a
    // solid share of the true top-5 with only ONE resident table
    val recall = mp.count { r =>
      exact.exists(e => e.getLong(0) == r.getLong(0) && e.getLong(1) == r.getLong(1))
    }
    assert(recall >= 20, s"multiprobe recall too low: $recall/50")
    // every returned cosine equals the brute-force cosine for that pair
    mp.foreach { r =>
      val gold = exact.find(e =>
        e.getLong(0) == r.getLong(0) && e.getLong(1) == r.getLong(1))
      gold.foreach(g => assert(g.getDouble(2) == r.getDouble(2)))
    }
  }

  test("a13 OPQ rotation is orthonormal and its recall is not below plain PQ") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val all = Tables.embeddings(spark, sfDir)
      .select($"vec_id", expr("transform(embedding, x -> cast(x as double))").as("v"))
    val (layers, books) = Knn.opqModel(spark, sfDir, all)
    assert(layers.size == 2 && books.size == 8 && books.head.size == 16)
    // orthonormality: a product of Givens rotations preserves norms
    val norms = layers.foldLeft(all.withColumn("rv", $"v")) {
      case (df, (pt, a1, a2)) =>
        df.withColumn("rv", Knn.rotCol($"rv", pt, a1, a2))
    }.select(
      sqrt(aggregate($"v", lit(0.0), (acc, x) => acc + x * x)).as("n0"),
      sqrt(aggregate($"rv", lit(0.0), (acc, x) => acc + x * x)).as("n1"))
      .collect()
    norms.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9,
      s"rotation must preserve norms: ${r.getDouble(0)} vs ${r.getDouble(1)}"))
    // equal-bytes comparison: the trained rotation must not lose to
    // plain PQ (same m=8, k=16 codebooks)
    val rec = Knn.a12AnnRecall(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(rec("opq") >= rec("pq"),
      s"OPQ recall ${rec("opq")} fell below plain PQ ${rec("pq")}")
    TrainedModels.clear()
    Caches.releaseAll()
  }

  test("a14 binary quantization: exact Hamming ranks, useful recall") {
    import org.apache.spark.sql.functions._
    val rows = Knn.a14KnnBinary(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getLong(2)
      // 64 sign bits -> Hamming in [0, 64]
      assert(h >= 0 && h <= 64, s"hamming out of range: $h")
      assert(r.getInt(4) >= 1 && r.getInt(4) <= 5)
    }
    // a near-identical vector must land at near-zero Hamming: each
    // query's best shortlist candidate is far under the 32-bit
    // random-pair expectation
    val bestH = rows.groupBy(_.getLong(0)).map(_._2.map(_.getLong(2)).min)
    assert(bestH.forall(_ <= 24), s"best per-query hamming: $bestH")
    // sign bits must carry real signal: recall@5 vs exact well above
    // the ~5/n random-shortlist floor
    import spark.implicits._
    val exact = Knn.a1BruteForce(spark, sfDir).select($"q_id", $"vec_id")
    val hits = Knn.a14KnnBinary(spark, sfDir).select($"q_id", $"vec_id")
      .join(exact, Seq("q_id", "vec_id"), "left_semi").count()
    assert(hits.toDouble / 50 >= 0.3, s"binary recall collapsed: $hits/50")
    Caches.releaseAll()
  }

  test("a15 cascade: staged cuts keep recall, widening a stage only helps") {
    import spark.implicits._
    val rows = Knn.a15KnnCascade(spark, sfDir).collect()
    assert(rows.length == 50)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(3)).sorted.toSeq == (1 to 5)) }
    val exact = graft.Caches.persist(
      Knn.a1BruteForce(spark, sfDir).select($"q_id", $"vec_id"))
    def recall(df: org.apache.spark.sql.DataFrame): Long =
      df.select($"q_id", $"vec_id")
        .join(exact, Seq("q_id", "vec_id"), "left_semi").count()
    val narrow = recall(Knn.a15KnnCascade(spark, sfDir))
    assert(narrow >= 25, s"cascade recall collapsed: $narrow/50")
    // a monotone funnel: widening both cuts can only add candidates,
    // never lose them — recall is non-decreasing in (s1, s2)
    val wide = recall(Knn.a15KnnCascade(spark, sfDir, s1 = 256, s2 = 64))
    assert(wide >= narrow, s"widening lost recall: $wide < $narrow")
    Caches.releaseAll()
  }

  test("a16 filtered search: every hit passes the predicate, filter-first fills k") {
    import spark.implicits._
    val rows = Knn.a16KnnFiltered(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val labelOf = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      // predicate holds on every result
      assert(labelOf(r.getLong(2)) == r.getInt(1),
        s"hit ${r.getLong(2)} escaped the label filter")
    }
    // filter-BEFORE-search fills k whenever the filtered pool allows:
    // each query returns min(k, pool-1) results, never fewer (the
    // post-filter under-fill bug this shape avoids)
    val poolSize = labelOf.values.groupBy(identity).view.mapValues(_.size).toMap
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val pool = poolSize(labelOf(q).asInstanceOf[Int]) - 1
      assert(rs.length == math.min(5, pool),
        s"query $q returned ${rs.length} of expected ${math.min(5, pool)}")
    }
  }

  test("a12 recall report: bounded, consistent, and repeat-stable") {
    val rows = Knn.a12AnnRecall(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("binary", "cascade", "cascade_tuned", "graph", "ivf", "ivf64",
        "lsh", "opq", "pq", "vamana"))
    rows.foreach { r =>
      val (hits, possible, recall) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(hits >= 0 && hits <= possible)
      assert(recall >= 0.0 && recall <= 1.0)
      assert(math.abs(recall - hits.toDouble / possible) < 1e-4)
      // an approximate index that finds nothing is a broken index
      assert(hits > 0)
    }
    val again = Knn.a12AnnRecall(spark, sfDir).collect()
    assert(again.map(_.toSeq).toSeq == rows.map(_.toSeq).toSeq)
    Caches.releaseAll()
  }

  test("a18 balance audit: shares sum to 1, counts tile the corpus, balance centers on 1") {
    val rows = Knn.a18IndexBalance(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty && rows.length <= 8)
    val nVecs = Tables.embeddings(spark, sfDir).count()
    assert(rows.map(_._2).sum == nVecs, "cell counts must tile the corpus")
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-3)
    // balance = share * k: mean balance over populated cells is k/|cells| = 1
    val meanBal = rows.map(_._4).sum / rows.length
    assert(math.abs(meanBal - 1.0) < 1e-2, s"mean balance $meanBal")
    Caches.releaseAll()
  }

  test("a17 tuner picks the cheapest cascade geometry meeting the recall target") {
    val rep = Knn.a17CascadeTuning(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getBoolean(5)))
    assert(rep.length == Knn.CascadeGrid.size && rep.count(_._5) == 1)
    val chosen = rep.find(_._5).get
    val meets = rep.filter(r => r._3.toDouble / r._4 >= Knn.CascadeTarget)
    if (meets.nonEmpty) {
      // the chosen geometry clears the target with MINIMAL
      // exact-rerank rows (s2), then minimal shortlist (s1)
      assert(meets.contains(chosen))
      val best = meets.minBy(r => (r._2, r._1))
      assert((chosen._1, chosen._2) == ((best._1, best._2)),
        s"chosen (${chosen._1},${chosen._2}) vs cheapest (${best._1},${best._2})")
    } else {
      // fallback: nothing clears the target — highest recall wins
      assert(chosen._3 == rep.map(_._3).max)
    }
    // the a12 report serves its cascade_tuned row at exactly the
    // chosen geometry's recall
    val a12 = Knn.a12AnnRecall(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a12("cascade_tuned") == chosen._3)
    Caches.releaseAll()
  }

  test("a19 nprobe sweep: curve monotone, full probe is exact, pick is the cheapest clearing depth") {
    val rows = Knn.a19NprobeSweep(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getBoolean(5)))
    assert(rows.map(_._1).toSeq == Knn.NprobeGrid)
    // probing deeper can only scan more rows and recall more truth
    rows.zip(rows.tail).foreach { case (lo, hi) =>
      assert(lo._2 <= hi._2 && lo._3 <= hi._3,
        s"not monotone between nprobe=${lo._1} and ${hi._1}")
    }
    // nprobe = k probes every cell: exact search, recall 1.0
    assert(rows.last._5 == 1.0, s"full probe recall: ${rows.last._5}")
    // the pick is the smallest depth clearing the target
    val expect = rows.filter(_._5 >= Knn.NprobeRecallTarget).map(_._1).min
    val chosen = rows.filter(_._6)
    assert(chosen.length == 1 && chosen.head._1 == expect)
    Caches.releaseAll()
  }

  test("a21 NN-Descent: recall monotone across rounds, top-k graph shape, refined beats seed") {
    val rows = Knn.a21NnDescent(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq == Seq("r0_seed", "r1", "r2"))
    val possible = rows.head._3
    assert(rows.forall(_._3 == possible))
    // candidate-superset + identical tie-break => hits can only grow
    rows.zip(rows.tail).foreach { case (lo, hi) =>
      assert(lo._2 <= hi._2, s"recall regressed ${lo._1} -> ${hi._1}")
    }
    // the descent must actually find something the seed missed here
    assert(rows.last._2 > rows.head._2,
      "two descent rounds recovered nothing over the seed")
    rows.foreach { case (_, hits, poss, recall, _) =>
      assert(recall == math.round(hits.toDouble / poss * 10000) / 10000.0)
    }
    Caches.releaseAll()
  }

  test("a21 descentRound is exact-rerank top-k over the expanded candidate set") {
    // a planted 6-node path graph in 2-D: node i at angle ang(i) with
    // strictly growing gaps (no cosine ties), k=1 seed edges i -> i+1;
    // the round's candidate set for a node is its CURRENT edges plus
    // the distance-2 hops through the undirected view (the canonical
    // NN-Descent local join: current neighbors are kept, co-neighbor
    // pairs are proposed)
    import spark.implicits._
    val ang = Seq(0.0, 10.0, 22.0, 36.0, 52.0, 70.0)
    val vecs = (0 to 5).map { i =>
      val a = math.toRadians(ang(i))
      (i.toLong, Seq(math.cos(a), math.sin(a)))
    }.toDF("vec_id", "v")
    val seed = (0 to 4).map(i => (i.toLong, (i + 1).toLong))
      .toDF("q_id", "vec_id")
    val out = Knn.descentRound(seed, vecs, k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byQ = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // node 2 (22deg): current {3}, hops through und add {0,4};
    // top-2 of {0,3,4} by angular distance (14,22,30deg) = {3,0}
    assert(byQ(2L) == Set(3L, 0L))
    // node 0 (0deg): current {1}, hop through 1 adds {2}; top-2 = {1,2}
    assert(byQ(0L) == Set(1L, 2L))
    Caches.releaseAll()
  }

  test("a22 graph serving: k ranked rows per query, walk reaches beyond the entry sample") {
    val out = Knn.a22GraphSearch(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val byQ = out.groupBy(_._1)
    assert(byQ.size == 10)
    byQ.values.foreach { rs =>
      assert(rs.map(_._4).sorted.toSeq == (1 to 5))
      val cosines = rs.sortBy(_._4).map(_._3).toSeq
      assert(cosines == cosines.sorted.reverse, "cosine must descend with rank")
    }
    out.foreach(r => assert(r._1 != r._2, "self-match"))
    // the hop expansion must surface at least one neighbor OUTSIDE
    // the medoid entry set — otherwise the walk did nothing here
    import spark.implicits._
    val all = graft.Tables.embeddings(spark, sfDir)
      .select($"vec_id",
        graft.functions.VectorFunctions.asDouble($"embedding").as("v"))
    val cents = Knn.ivfCentroids(spark, sfDir, all)
    val entryIds = Knn.graphMedoids(all, cents)
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    assert(out.exists(r => !entryIds(r._2)),
      "no served neighbor beyond the entry set")
    Caches.releaseAll()
  }

  test("a22 medoid entry set is pinned to the quantizer: per-cell nearest vectors, probed cells' medoids per query") {
    import spark.implicits._
    val all = graft.Caches.persist(graft.Tables.embeddings(spark, sfDir)
      .select($"vec_id",
        graft.functions.VectorFunctions.asDouble($"embedding").as("v")))
    val cents = Knn.ivfCentroids(spark, sfDir, all)
    def cosine(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      if (na == 0.0 || nb == 0.0) 0.0 else dot / (na * nb)
    }
    // independent recompute: assignment + per-cell top-3 by cosine
    // to the OWN centroid, ties -> lowest vec_id
    val rows = all.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq))
    val assigned = rows.map { case (id, v) =>
      val scores = cents.map(c => cosine(v, c))
      (id, scores.indexOf(scores.max), scores)
    }
    val want = assigned.groupBy(_._2).toSeq.flatMap { case (cid, members) =>
      members.sortBy { case (id, c, scores) => (-scores(c), id) }
        .take(3).map { case (id, _, _) => (cid, id) }
    }.toSet
    val got = Knn.graphMedoids(all, cents).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(got == want, s"medoid set drifted: got $got want $want")
    // per-query entries = the probed (top-eCells) cells' medoids
    val queries = all.filter($"vec_id" < 3)
      .select($"vec_id".as("q_id"), $"v".as("qv"))
    val medoids = Knn.graphMedoids(all, cents)
    val e = Knn.medoidEntries(queries, medoids, cents, eCells = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    queries.collect().foreach { q =>
      val qv = q.getSeq[Double](1).toSeq
      val topCells = cents.indices
        .sortBy(c => (-cosine(qv, cents(c)), c)).take(2).toSet
      val wantE = want.filter(m => topCells(m._1)).map(_._2)
      assert(e(q.getLong(0)) == wantE,
        s"entry set for query ${q.getLong(0)} drifted")
    }
    Caches.releaseAll()
  }

  test("a26 filtered graph walk: label keep, k-fill through non-passing routers, pass-all degenerates") {
    import spark.implicits._
    // real corpus: every served row carries the query's own label,
    // ranks contiguous, cosine descending
    val out = Knn.a26GraphFiltered(spark, sfDir).collect()
    assert(out.nonEmpty)
    val labels = graft.Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    out.foreach { r =>
      assert(r.getInt(1) == labels(r.getLong(2)),
        "a served hit must pass the query's label filter")
      assert(r.getLong(0) != r.getLong(2), "self-match")
    }
    out.groupBy(_.getLong(0)).values.foreach { rs =>
      assert(rs.map(_.getInt(4)).sorted.toSeq == (1 to rs.length))
      val cos = rs.sortBy(_.getInt(4)).map(_.getDouble(3)).toSeq
      assert(cos == cos.sorted.reverse)
    }
    // k-FILL chain soundness on a planted corpus: nodes on a smooth
    // angular chain, labels ALTERNATING — every passing node is
    // reachable only THROUGH non-passing routers, so a walk that
    // drops non-passing nodes from the frontier (instead of from
    // the RESULT) cannot fill k
    val n = 20
    val vecs = (0 until n).map(i =>
      (i.toLong, Seq(math.cos(i * 0.05), math.sin(i * 0.05)), i % 2))
      .toDF("vec_id", "v", "label")
    val chain = (0 until n - 1).map(i => (i.toLong, i + 1L))
      .toDF("q_id", "vec_id")
    val queries = Seq((0L, Seq(1.0, 0.0), 1)).toDF("q_id", "qv", "q_label")
    val e0 = Seq((0L, 1L)).toDF("q_id", "vec_id")
    // hops bounded at 4: each hop's plan references the visited set
    // three ways, so deep chains grow the logical plan geometrically
    // — the production walk runs 2 hops
    val got = Knn.graphSearchFilteredOf(vecs, chain, queries, e0,
        k = 3, beam = 32, hops = 4)
      .collect().map(r => (r.getLong(2), r.getInt(4)))
    assert(got.map(_._1).toSeq == Seq(1L, 3L, 5L),
      s"k must fill with the three nearest PASSING nodes in order: " +
        s"${got.toSeq}")
    // pass-all filter degenerates to the plain walk (same beam)
    val passAll = Knn.graphSearchFilteredOf(
        vecs.withColumn("label", org.apache.spark.sql.functions.lit(7)), chain,
        queries.withColumn("q_label", org.apache.spark.sql.functions.lit(7)), e0,
        k = 3, beam = 32, hops = 4)
      .select($"q_id", $"vec_id", $"cosine", $"rnk")
      .collect().map(_.toSeq).toSeq
    val plain = Knn.graphSearchFrom(
        vecs.select($"vec_id", $"v"), chain,
        queries.select($"q_id", $"qv"), e0,
        k = 3, beam = 32, hops = 4)
      .collect().map(_.toSeq).toSeq
    assert(passAll == plain,
      "a pass-all filter must degenerate to the unfiltered walk")
    Caches.releaseAll()
  }

  test("a27 range search: probed-subset law, threshold boundary, nprobe monotone, nprobe=k exact") {
    import spark.implicits._
    val tau = 0.30
    val all = graft.Caches.persist(graft.Tables.embeddings(spark, sfDir)
      .select($"vec_id",
        graft.functions.VectorFunctions.asDouble($"embedding").as("v")))
    val cents = Knn.ivfCentroids(spark, sfDir, all)
    def cosine(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      if (na == 0.0 || nb == 0.0) 0.0 else dot / (na * nb)
    }
    // independent exact range set + each vector's cell + each
    // query's probe order, all recomputed from scratch
    val rows = all.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq))
    val cellOf = rows.map { case (id, v) =>
      val scores = cents.map(c => cosine(v, c))
      id -> scores.indexOf(scores.max)
    }.toMap
    val queries = rows.filter(_._1 < 10)
    def probed(qv: Seq[Double], nprobe: Int): Set[Int] =
      cents.indices.sortBy(c => (-cosine(qv, cents(c)), c))
        .take(nprobe).toSet
    def exactRange(nprobe: Int): Set[(Long, Long)] = queries.flatMap {
      case (q, qv) =>
        val cells = probed(qv, nprobe)
        rows.filter { case (id, v) =>
          id != q && cells(cellOf(id)) && cosine(qv, v) >= tau
        }.map(x => (q, x._1))
    }.toSet
    val got3 = Knn.a27RangeSearch(spark, sfDir, tau, nprobe = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(got3.nonEmpty, "the gate threshold must keep a non-empty set")
    got3.foreach { case (p, c) =>
      assert(c >= tau - 5e-7, s"served pair $p below the radius: $c")
    }
    assert(got3.map(_._1).toSet == exactRange(3),
      "probed-subset law: the serve must return EXACTLY the " +
        "threshold survivors of the probed cells")
    // widening the probe only adds pairs; nprobe=k is the exact
    // brute-force range over the whole corpus
    val gotAll = Knn.a27RangeSearch(spark, sfDir, tau, nprobe = cents.length)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got3.map(_._1).toSet.subsetOf(gotAll))
    assert(gotAll == exactRange(cents.length),
      "nprobe=k must equal the exact range search")
    Caches.releaseAll()
  }

  test("a22 hop monotonicity: more hops only improves the served top-1; empty graph = entry scoring") {
    import spark.implicits._
    def top1(hops: Int): Map[Long, Double] =
      Knn.a22GraphSearch(spark, sfDir, hops = hops).filter($"rnk" === 1)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val h0 = top1(0)
    Caches.releaseAll()
    val h2 = top1(2)
    Caches.releaseAll()
    h0.keySet.foreach { q =>
      assert(h2(q) >= h0(q), s"hop walk regressed query $q: ${h0(q)} -> ${h2(q)}")
    }
    // an empty edge list degenerates the walk to plain entry scoring
    // regardless of hops — the loop must be a no-op with no frontier
    val all = graft.Tables.embeddings(spark, sfDir)
      .select($"vec_id",
        graft.functions.VectorFunctions.asDouble($"embedding").as("v"))
    val queries = all.filter($"vec_id" < 10)
      .select($"vec_id".as("q_id"), $"v".as("qv"))
    val cents = Knn.ivfCentroids(spark, sfDir, all)
    val e0 = Knn.medoidEntries(queries, Knn.graphMedoids(all, cents),
      cents, eCells = 8)
    val noGraph = Seq.empty[(Long, Long)].toDF("q_id", "vec_id")
    val deg = Knn.graphSearchFrom(all.select($"vec_id", $"v"), noGraph,
      queries, e0, k = 5, beam = 6, hops = 2)
      .filter($"rnk" === 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(deg == h0, "empty-graph walk must equal entry-only scoring")
    Caches.releaseAll()
  }

  test("a20 mutual-kNN clusters = reciprocity filter + min-label components") {
    // independent reference: take a9's directed kNN join, keep only
    // reciprocated pairs, union-find them in the test, singletons
    // label themselves
    val nn = Knn.a9KnnJoin(spark, sfDir)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val mutual = nn.filter { case (a, b) => a < b && nn((b, a)) }
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      parent.getOrElseUpdate(x, x)
      if (parent(x) == x) x
      else { val r = find(parent(x)); parent(x) = r; r }
    }
    mutual.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val degree = mutual.toSeq.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (id, xs) => id -> xs.length.toLong }
    val out = Knn.a20MutualKnnClusters(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getLong(4)))
    assert(out.nonEmpty)
    val repOf = out.map(r => r._1 -> r._2).toMap
    // total membership: every vector labeled exactly once
    assert(out.map(_._1).distinct.length == out.length)
    out.foreach { case (id, rep, size, isRep, deg) =>
      val expRep = if (parent.contains(id)) find(id) else id
      assert(rep == expRep, s"vec $id rep $rep != union-find $expRep")
      assert(isRep == (id == rep))
      assert(deg == degree.getOrElse(id, 0L), s"vec $id degree")
      assert(size == out.count(_._2 == rep))
      // a rep is its cluster's MIN id
      assert(rep <= id && repOf(rep) == rep)
    }
    Caches.releaseAll()
  }

  test("a23 PQ walk: ranked shape; zero hops + full rerank degenerates to a22 exactly") {
    import spark.implicits._
    val rows = Knn.a23GraphSearchPq(spark, sfDir).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 10)
    byQ.values.foreach { rs =>
      assert(rs.length == 5)
      val cosines = rs.sortBy(_.getInt(3)).map(_.getDouble(2)).toSeq
      assert(cosines == cosines.sorted.reverse, "cosine must descend with rank")
    }
    rows.foreach(r => assert(r.getLong(0) != r.getLong(1), "self-match"))
    // at zero hops both walks score exactly the entry sample, and
    // with the rerank window covering it the exact final rerank makes
    // the two identical — the degeneration that pins the PQ walk's
    // plumbing to a22's
    val pq = Knn.a23GraphSearchPq(spark, sfDir, hops = 0, rerank = 16)
      .collect().map(_.toSeq).toSeq
    val exact = Knn.a22GraphSearch(spark, sfDir, hops = 0)
      .collect().map(_.toSeq).toSeq
    assert(pq == exact, "zero-hop PQ walk must equal the exact walk")
    Caches.releaseAll()
  }

  test("nnDescentBuild loops until the edge delta dries and converges to the exact graph") {
    import spark.implicits._
    // planted corpus: 4 well-separated clusters of 10, each cluster a
    // SMOOTH 1-D angular chain (hot axis + a secondary axis whose
    // value grows with the in-cluster index) — cosine decreases
    // monotonically with in-chain distance, so the exact top-3 graph
    // is the chain's and neighbor-of-neighbor expansion can always
    // reach it (an arbitrary jitter plant can trap descent in a
    // sub-clique local optimum — a real NN-Descent property, not a
    // bug)
    val vecs = (0L until 40L).map { i =>
      val c = (i / 10).toInt
      val v = Array.fill(8)(0.0)
      v(c) = 10.0
      v(4 + c) = (i % 10) * 0.3
      (i, v.toSeq)
    }.toDF("vec_id", "v")
    // deliberately bad seed: a directed ring, mostly wrong neighbors
    val seed = (0L until 40L).map(i => (i, (i + 1) % 40)).toDF("q_id", "vec_id")
    val (g, deltas) = Knn.nnDescentBuild(vecs, seed, k = 3, maxRounds = 10)
    assert(deltas.nonEmpty && deltas.last == 0L,
      s"loop must run until dry: $deltas")
    assert(deltas.size < 10, "planted corpus must converge before the cap")
    // delta decreases monotonically to zero on this corpus
    assert(deltas.zip(deltas.tail).forall { case (a, b) => b <= a },
      s"delta must be monotone on the planted corpus: $deltas")
    // the fixpoint IS the exact graph
    val exact = pairs(Knn.knnJoinOf(vecs, tables = 1, bits = 0, k = 3,
      bucketCap = 1000).select($"q_id", $"vec_id"))
    assert(pairs(g.select($"q_id", $"vec_id")) == exact,
      "the dried graph must equal the exact top-3 graph")
    Caches.releaseAll()
  }

  test("appendToNnGraph: batch joins the graph incrementally, untouched nodes unchanged, recall tracks rebuild") {
    import spark.implicits._
    val all = Tables.embeddings(spark, sfDir)
      .select($"vec_id", graft.functions.VectorFunctions
        .asDouble($"embedding").as("v"))
    val newIds = all.filter($"vec_id" < 50).select($"vec_id")
    val oldVecs = all.filter($"vec_id" >= 50)
    val k = 3
    def lshSeed(vs: org.apache.spark.sql.DataFrame) =
      Knn.knnJoinOf(vs, tables = 4, bits = 6, k = k, bucketCap = 256)
        .select($"q_id", $"vec_id")
    val (oldGraph, _) = Knn.nnDescentBuild(oldVecs, lshSeed(oldVecs), k,
      maxRounds = 2)
    val appended = Knn.appendToNnGraph(oldGraph, all, newIds, k)
      .localCheckpoint()
    // every new node has exactly k edges; no self-edges anywhere
    val perNew = appended.join(newIds.withColumnRenamed("vec_id", "q_id"),
        Seq("q_id"), "left_semi")
      .groupBy($"q_id").count().select($"count").distinct().collect()
    assert(perNew.map(_.getLong(0)).toSeq == Seq(k.toLong))
    assert(appended.filter($"q_id" === $"vec_id").count() == 0)
    // nodes the batch never reached keep their edge sets bit-identical
    val reached = appended.join(newIds, Seq("vec_id"), "left_semi")
      .select($"q_id").distinct()
      .join(newIds.withColumnRenamed("vec_id", "q_id"), Seq("q_id"),
        "left_anti")
    val untouchedOld = oldGraph
      .join(reached, Seq("q_id"), "left_anti")
      .join(newIds.withColumnRenamed("vec_id", "q_id"), Seq("q_id"),
        "left_anti")
    val inAppended = pairs(appended.select($"q_id", $"vec_id"))
    assert(pairs(untouchedOld.select($"q_id", $"vec_id"))
      .subsetOf(inAppended), "untouched nodes' edges must pass through")
    // recall on a probe sample tracks a from-scratch rebuild
    val (rebuilt, _) = Knn.nnDescentBuild(all, lshSeed(all), k, maxRounds = 2)
    val exactProbe = pairs(Knn.knnJoinOf(all, tables = 1, bits = 0, k = k,
        bucketCap = 1000000)
      .filter($"q_id" < 25).select($"q_id", $"vec_id"))
    def recallOf(g: org.apache.spark.sql.DataFrame): Double = {
      val got = pairs(g.filter($"q_id" < 25).select($"q_id", $"vec_id"))
      got.intersect(exactProbe).size.toDouble / exactProbe.size
    }
    val ra = recallOf(appended); val rr = recallOf(rebuilt)
    assert(ra >= 0.9 * rr,
      s"appended recall $ra must track rebuild recall $rr")
    Caches.releaseAll()
  }
}
