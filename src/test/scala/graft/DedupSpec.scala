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
}
