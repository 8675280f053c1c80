package graft

import org.apache.spark.sql.functions._

import graft.operators.HybridSearch
import graft.sources.TextIndex

/** Persisted text-serving index: the build-once/serve-from-disk
  * layout for the BM25 family. Every serving path must return
  * EXACTLY what its scan-path twin computes (same scorer, same
  * stats, same tie-breaks), and the postings read must be a
  * partition-pruned scan of the query terms' hash buckets. */
class TextIndexSpec extends SparkSpec {

  import spark.implicits._

  // built once for the suite via the same session memo s17 uses
  private lazy val path = HybridSearch.textIndexPath(spark, sfDir)

  test("served BM25 equals the scan path bit-for-bit; postings scan is bucket-pruned") {
    val served = TextIndex.bm25Serve(spark, path, HybridSearch.QueryTerms)
      .orderBy($"score".desc, $"doc_id").limit(10)
    val scan = HybridSearch.s1KeywordBm25(spark, sfDir)
    assert(served.select($"doc_id", $"score").collect().toSeq ==
      scan.collect().toSeq)
    // the postings read prunes to the query terms' bucket directories
    val plan = served.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(l =>
      l.contains("PartitionFilters") && l.contains("pbucket"))
    assert(pf.isDefined,
      s"pbucket not in PartitionFilters:\n${plan.take(1500)}")
    // and the term equality is pushed into the row groups
    assert(plan.contains("PushedFilters") && plan.contains("term"),
      "term predicate must reach the parquet scan")
    // the memo builds once per session
    assert(TrainedModels.buildCount(spark, s"text_index:$sfDir") == 1)
  }

  test("served BM25F equals s13 exactly") {
    val served = TextIndex.fieldedServe(spark, path, HybridSearch.QueryTerms)
    val scan = HybridSearch.s13FieldedBm25(spark, sfDir)
    assert(served.collect().toSeq == scan.collect().toSeq)
    Caches.releaseAll()
  }

  test("fuzzy corrections from the persisted vocab equal s11") {
    val served = TextIndex.correctionsServe(spark, path,
      HybridSearch.FuzzyProbes)
    val scan = HybridSearch.s11FuzzyCorrect(spark, sfDir)
    assert(served.collect().toSeq == scan.collect().toSeq)
  }

  test("completions from the persisted ranked prefix table equal s15") {
    // the full table equals the scan-built index...
    val all = spark.read.parquet(s"$path/prefixes")
      .orderBy($"prefix", $"rank")
      .select($"prefix", $"rank", $"term", $"df").collect()
    val scan = HybridSearch.s15Autocomplete(spark, sfDir).collect()
    assert(all.toSeq == scan.toSeq)
    // ...and a point lookup serves just its prefixes
    val some = TextIndex.completeServe(spark, path, Seq("th", "tha"))
      .collect()
    assert(some.nonEmpty &&
      some.forall(r => Set("th", "tha")(r.getString(0))))
    assert(some.toSeq ==
      scan.filter(r => Set("th", "tha")(r.getString(0))).toSeq)
  }

  test("more-like-this from forward index + postings equals s16") {
    val served = TextIndex.moreLikeThisServe(spark, path, seedId = 0L)
    val scan = HybridSearch.s16MoreLikeThis(spark, sfDir)
    assert(served.collect().toSeq == scan.collect().toSeq)
    Caches.releaseAll()
  }

  test("append equals rebuild BIT-FOR-BIT across all five serving modes") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val appended = java.nio.file.Files
      .createTempDirectory("graft-ti-app").toString
    TextIndex.write(docs.filter(expr("(doc_id div 50) % 2 = 0")), appended)
    TextIndex.append(docs.filter(expr("(doc_id div 50) % 2 = 1")), appended)
    // `path` is the suite's full-corpus rebuild of the same docs
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    assert(rows(TextIndex.bm25Serve(spark, appended, HybridSearch.QueryTerms)
        .orderBy($"score".desc, $"doc_id")) ==
      rows(TextIndex.bm25Serve(spark, path, HybridSearch.QueryTerms)
        .orderBy($"score".desc, $"doc_id")))
    assert(rows(TextIndex.fieldedServe(spark, appended,
        HybridSearch.QueryTerms)) ==
      rows(TextIndex.fieldedServe(spark, path, HybridSearch.QueryTerms)))
    assert(rows(TextIndex.correctionsServe(spark, appended,
        HybridSearch.FuzzyProbes)) ==
      rows(TextIndex.correctionsServe(spark, path, HybridSearch.FuzzyProbes)))
    assert(rows(spark.read.parquet(s"$appended/prefixes")
        .orderBy($"prefix", $"rank")
        .select($"prefix", $"rank", $"term", $"df")) ==
      rows(spark.read.parquet(s"$path/prefixes")
        .orderBy($"prefix", $"rank")
        .select($"prefix", $"rank", $"term", $"df")))
    assert(rows(TextIndex.moreLikeThisServe(spark, appended, seedId = 0L)) ==
      rows(TextIndex.moreLikeThisServe(spark, path, seedId = 0L)))
    // the stats row merged exactly
    assert(rows(spark.read.parquet(s"$appended/stats")) ==
      rows(spark.read.parquet(s"$path/stats")))
  }

  test("positional phrase serve equals s7's regex scan bit-for-bit") {
    val served = TextIndex.phraseServe(spark, path, "hash", "join")
    val scan = HybridSearch.s7PhraseSearch(spark, sfDir)
    val got = served.collect().map(_.toSeq).toSeq
    assert(got.nonEmpty, "the sf corpus contains 'hash join' phrases")
    assert(got == scan.collect().map(_.toSeq).toSeq)
    // adjacency is positional, not co-occurrence: a doc with both
    // terms NON-adjacent must not survive
    import spark.implicits._
    val tiny = java.nio.file.Files
      .createTempDirectory("graft-ti-pos").toString
    TextIndex.write(Seq(
      (1L, "the hash join wins"),
      (2L, "hash of the join"),
      (3L, "join hash reversed")).toDF("doc_id", "text"), tiny)
    val ids = TextIndex.phraseServe(spark, tiny, "hash", "join")
      .collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(1L), s"only the adjacent doc survives: $ids")
    Caches.releaseAll()
  }

  test("proximity serve: ordered slop window, supersets adjacency, gap bound exact") {
    import spark.implicits._
    val tiny = java.nio.file.Files
      .createTempDirectory("graft-ti-slop").toString
    TextIndex.write(Seq(
      (1L, "the hash join wins"),            // gap 1 (adjacent)
      (2L, "hash of the join"),              // gap 3
      (3L, "hash one two three join here"),  // gap 4 — outside slop 3
      (4L, "join comes before hash"),        // wrong order
      (5L, "hash alone no partner")).toDF("doc_id", "text"), tiny)
    def ids(slop: Int) = TextIndex
      .proximityServe(spark, tiny, "hash", "join", slop)
      .collect().map(_.getLong(0)).toSet
    assert(ids(1) == Set(1L), "slop 1 = adjacency")
    assert(ids(3) == Set(1L, 2L), "slop 3 admits the gap-3 doc only")
    assert(ids(4) == Set(1L, 2L, 3L), "slop 4 admits the gap-4 doc")
    // the corpus query widens s19's survivor set
    val s19ids = HybridSearch.s19PhraseFromIndex(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    val s20ids = HybridSearch.s20ProximitySearch(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    assert(s19ids.subsetOf(s20ids) || s20ids.size == 20,
      "slop must only widen survivors (unless the top-20 cut bites)")
    Caches.releaseAll()
  }

  test("forward-index seed lookup prunes to the seed's doc bucket") {
    val seed = spark.read.parquet(s"$path/forward")
      .filter($"dbucket" === 0L && $"doc_id" === 0L)
    val plan = seed.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(l =>
      l.contains("PartitionFilters") && l.contains("dbucket"))
    assert(pf.isDefined,
      s"dbucket not in PartitionFilters:\n${plan.take(1500)}")
  }
}
