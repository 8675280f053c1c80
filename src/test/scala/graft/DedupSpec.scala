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

  test("d5 embedding pairs are symmetric-free and above threshold") {
    val rows = Dedup.d5EmbeddingCosine(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.4)
    }
  }
}
