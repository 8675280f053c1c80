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
    val all = TextIndex.prefixesTable(spark, path)
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
    assert(rows(TextIndex.prefixesTable(spark, appended)
        .orderBy($"prefix", $"rank")
        .select($"prefix", $"rank", $"term", $"df")) ==
      rows(TextIndex.prefixesTable(spark, path)
        .orderBy($"prefix", $"rank")
        .select($"prefix", $"rank", $"term", $"df")))
    assert(rows(TextIndex.moreLikeThisServe(spark, appended, seedId = 0L)) ==
      rows(TextIndex.moreLikeThisServe(spark, path, seedId = 0L)))
    // the stats row merged exactly
    assert(rows(TextIndex.statsTable(spark, appended)) ==
      rows(TextIndex.statsTable(spark, path)))
  }

  test("positional n-term phrase serve equals s7's regex scan bit-for-bit") {
    val served = TextIndex.phraseServe(spark, path, HybridSearch.PhraseTerms)
    val scan = HybridSearch.s7PhraseSearch(spark, sfDir)
    val got = served.collect().map(_.toSeq).toSeq
    assert(got.nonEmpty, "the sf corpus contains 'hash join key' phrases")
    assert(got == scan.collect().map(_.toSeq).toSeq)
    // adjacency is positional AND chained: a planted partial match
    // (terms 1+2 adjacent, term 3 absent or apart) must not survive
    import spark.implicits._
    val tiny = java.nio.file.Files
      .createTempDirectory("graft-ti-pos").toString
    TextIndex.write(Seq(
      (1L, "the hash join key wins"),
      (2L, "hash join without the third"),   // partial: 'key' absent
      (3L, "hash join and then key apart"),  // all 3 present, chain broken
      (4L, "key hash join reversed"),        // wrong order
      (5L, "hash of the join key")).toDF("doc_id", "text"), tiny)
    val terms = Seq("hash", "join", "key")
    val ids = TextIndex.phraseServe(spark, tiny, terms)
      .collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(1L), s"only the full adjacent chain survives: $ids")
    // scan path agrees on the ladder corpus
    val docs = Seq(
      (1L, "the hash join key wins"), (2L, "hash join without the third"),
      (3L, "hash join and then key apart"), (4L, "key hash join reversed"),
      (5L, "hash of the join key")).toDF("doc_id", "text")
      .select($"doc_id", $"text",
        regexp_extract_all(lower($"text"),
          lit(HybridSearch.WordTokenPattern), lit(0)).as("tok"))
      .withColumn("dl", size($"tok").cast("double"))
    assert(HybridSearch.phraseSearchOf(docs, terms, 20)
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    // a repeated-term phrase chains against its own position list
    val rep = TextIndex.phraseServe(spark, tiny, Seq("the", "hash"))
      .collect().map(_.getLong(0)).toSet
    assert(rep == Set(1L), s"'the hash' is adjacent only in doc 1: $rep")
    Caches.releaseAll()
  }

  test("proximity serve: chained ordered slop windows, supersets adjacency") {
    import spark.implicits._
    val tiny = java.nio.file.Files
      .createTempDirectory("graft-ti-slop").toString
    TextIndex.write(Seq(
      (1L, "hash join key"),                      // gaps 1,1
      (2L, "hash a join b key"),                  // gaps 2,2
      (3L, "hash a b join c d key"),              // gaps 3,3
      (4L, "hash join a b c key"),                // gaps 1,4
      (5L, "key join hash reversed order"),       // wrong order
      // the chain-soundness doc: the second 'join' (within slop of
      // 'key') is NOT within slop of 'hash', and the surviving first
      // 'join' is too far from 'key' — pairwise-independent windows
      // would wrongly admit this doc
      (6L, "hash join x x x x join key")).toDF("doc_id", "text"), tiny)
    val terms = Seq("hash", "join", "key")
    def ids(slop: Int) = TextIndex
      .proximityServe(spark, tiny, terms, slop)
      .collect().map(_.getLong(0)).toSet
    assert(ids(1) == Set(1L), "slop 1 = adjacency")
    assert(ids(2) == Set(1L, 2L), "slop 2 admits gaps <= 2 per hop")
    assert(ids(3) == Set(1L, 2L, 3L), "slop 3 admits gaps <= 3 per hop")
    assert(ids(4) == Set(1L, 2L, 3L, 4L), "slop 4 admits the gap-4 hop")
    assert(!ids(2).contains(6L) && !ids(3).contains(6L),
      "a term must follow a SURVIVING previous occurrence — " +
        "pairwise windows over non-surviving prefixes don't count")
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
      .filter($"batch" === 0L && $"dbucket" === 0L && $"doc_id" === 0L)
    val plan = seed.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(l =>
      l.contains("PartitionFilters") && l.contains("dbucket"))
    assert(pf.isDefined,
      s"dbucket not in PartitionFilters:\n${plan.take(1500)}")
  }

  private def tinyDocs = Seq(
    (1L, "spark joins filter big tables\nspark filter pushdown wins"),
    (2L, "the quick brown fox joins the lazy dog"),
    (3L, "filter spark filter join join join"),
    (4L, "unrelated prose about nothing in particular"),
    (5L, "spark spark spark join filter everything"),
    (6L, "join the spark club and filter your feed"))

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSeq

  private def serveAll(p: String): Seq[Seq[Seq[Any]]] = Seq(
    rowsOf(TextIndex.bm25Serve(spark, p, Seq("spark", "join", "filter"))
      .orderBy($"score".desc, $"doc_id")),
    rowsOf(TextIndex.fieldedServe(spark, p, Seq("spark", "join"))),
    rowsOf(TextIndex.correctionsServe(spark, p, Seq("sprak", "joim"))),
    rowsOf(TextIndex.prefixesTable(spark, p)
      .orderBy($"prefix", $"rank")
      .select($"prefix", $"rank", $"term", $"df")),
    rowsOf(TextIndex.phraseServe(spark, p, Seq("spark", "filter"))),
    rowsOf(TextIndex.statsTable(spark, p)
      .select($"n_docs", $"sum_dl", $"slt", $"slb")),
    // stored fields: rendered snippets must track the live corpus
    rowsOf(TextIndex.snippetServe(spark, p, Seq("spark", "join", "filter"))),
    rowsOf(TextIndex.contentTable(spark, p)
      .select($"doc_id", $"text").orderBy($"doc_id")))

  test("staged-but-uncommitted change is INVISIBLE; the later commit applies it once") {
    val sparkSession = spark
    import sparkSession.implicits._
    val p = java.nio.file.Files
      .createTempDirectory("graft-ti-crash").toString
    val first = tinyDocs.take(3).toDF("doc_id", "text")
    val second = tinyDocs.drop(3).toDF("doc_id", "text")
    TextIndex.write(first, p)
    val before = serveAll(p)
    // the crash point: every artifact of the append staged (batch
    // dirs written, new artifact versions written) but the marker
    // never flips — readers must keep serving the OLD commit
    TextIndex.applyChange(p, None, Some(second), 2, 4, 3,
      epochId = -1L, flip = false)
    assert(serveAll(p) == before,
      "a staged append without its marker flip must be invisible")
    // the replayed append re-stages the same batch idempotently
    // (dynamic-partition overwrite of the same staging area) and
    // commits once — equal to a one-shot rebuild of everything
    TextIndex.append(second, p)
    val rebuilt = java.nio.file.Files
      .createTempDirectory("graft-ti-crash-rb").toString
    TextIndex.write(tinyDocs.toDF("doc_id", "text"), rebuilt)
    assert(serveAll(p) == serveAll(rebuilt),
      "replayed append after a crashed stage must apply exactly once")
    Caches.releaseAll()
  }

  test("delete: serve-after-delete ≡ rebuild without the docs; double-delete is a no-op; re-add lives") {
    val sparkSession = spark
    import sparkSession.implicits._
    val p = java.nio.file.Files
      .createTempDirectory("graft-ti-del").toString
    TextIndex.write(tinyDocs.toDF("doc_id", "text"), p)
    TextIndex.delete(Seq(3L, 5L).toDF("doc_id"), p)
    val survivors = java.nio.file.Files
      .createTempDirectory("graft-ti-del-rb").toString
    TextIndex.write(tinyDocs.filterNot(d => Set(3L, 5L)(d._1))
      .toDF("doc_id", "text"), survivors)
    assert(serveAll(p) == serveAll(survivors),
      "delete must subtract the docs' exact contributions everywhere")
    // deleting an id again (or one never present) changes nothing
    TextIndex.delete(Seq(3L, 99L).toDF("doc_id"), p)
    assert(serveAll(p) == serveAll(survivors), "double-delete is a no-op")
    // a re-added doc lands in a HIGHER batch than its tombstone and
    // is live again — full circle back to the original corpus
    TextIndex.append(tinyDocs.filter(d => Set(3L, 5L)(d._1))
      .toDF("doc_id", "text"), p)
    val full = java.nio.file.Files
      .createTempDirectory("graft-ti-del-full").toString
    TextIndex.write(tinyDocs.toDF("doc_id", "text"), full)
    assert(serveAll(p) == serveAll(full),
      "re-add after delete must serve as if never deleted")
    Caches.releaseAll()
  }

  test("upsert ≡ rebuild bit-for-bit across the serving modes; MLT of a replaced doc uses the new text") {
    val sparkSession = spark
    import sparkSession.implicits._
    val p = java.nio.file.Files
      .createTempDirectory("graft-ti-ups").toString
    // build with two docs' text corrupted, then upsert the truth
    val stale = tinyDocs.map { case (id, t) =>
      (id, if (Set(2L, 5L)(id)) s"stale placeholder $id" else t) }
    TextIndex.write(stale.toDF("doc_id", "text"), p)
    TextIndex.upsert(tinyDocs.filter(d => Set(2L, 5L)(d._1))
      .toDF("doc_id", "text"), p)
    val rebuilt = java.nio.file.Files
      .createTempDirectory("graft-ti-ups-rb").toString
    TextIndex.write(tinyDocs.toDF("doc_id", "text"), rebuilt)
    assert(serveAll(p) == serveAll(rebuilt),
      "upsert must equal a rebuild of the true corpus")
    assert(rowsOf(TextIndex.moreLikeThisServe(spark, p, seedId = 5L)) ==
      rowsOf(TextIndex.moreLikeThisServe(spark, rebuilt, seedId = 5L)),
      "the forward index must serve the REPLACED doc's new terms")
    Caches.releaseAll()
  }

  test("compact: serving is bit-equal across the swap; files consolidate; vacuum reclaims") {
    val sparkSession = spark
    import sparkSession.implicits._
    val p = java.nio.file.Files
      .createTempDirectory("graft-ti-cpt").toString
    TextIndex.write(tinyDocs.take(2).toDF("doc_id", "text"), p)
    TextIndex.append(tinyDocs.slice(2, 4).toDF("doc_id", "text"), p)
    TextIndex.append(tinyDocs.drop(4).toDF("doc_id", "text"), p)
    TextIndex.delete(Seq(4L).toDF("doc_id"), p)
    val before = serveAll(p)
    def filesUnder(art: String): Seq[java.nio.file.Path] = {
      import scala.jdk.CollectionConverters._
      val d = java.nio.file.Paths.get(p, art)
      val s = java.nio.file.Files.walk(d)
      try s.iterator().asScala
        .filter(f => f.toString.endsWith(".parquet")).toList
      finally s.close()
    }
    def postingsFiles = filesUnder("postings")
    val nBefore = postingsFiles.size
    // the stored-fields artifact is in the rewrite set too — s26/s30
    // serving reads it per query, so its small files matter as much
    // as the postings'
    val nContentBefore = filesUnder("content").size
    // the planning pass is metadata-only and sees every artifact
    val plan = TextIndex.compactionPlan(spark, p)
    assert(plan.count() > 0)
    TextIndex.compact(spark, p)
    assert(serveAll(p) == before,
      "compaction must not change a single served byte")
    // tombstoned rows are physically gone: doc 4 appears in no live row
    assert(TextIndex.forwardTable(spark, p)
      .filter($"doc_id" === 4L).count() == 0)
    val dropped = TextIndex.vacuum(spark, p)
    assert(dropped.nonEmpty, "vacuum reclaims the pre-compaction batches")
    assert(serveAll(p) == before, "vacuum never touches live state")
    assert(postingsFiles.size < nBefore,
      s"compaction+vacuum must shrink the file count " +
        s"($nBefore -> ${postingsFiles.size})")
    assert(filesUnder("content").size < nContentBefore,
      s"content/ must consolidate too " +
        s"($nContentBefore -> ${filesUnder("content").size})")
    Caches.releaseAll()
  }

  test("maybeCompact: count-gated — fires past the batch bound, not before; serve invariant") {
    val sparkSession = spark
    import sparkSession.implicits._
    val p = java.nio.file.Files
      .createTempDirectory("graft-ti-auto").toString
    TextIndex.write(tinyDocs.take(3).toDF("doc_id", "text"), p)
    TextIndex.append(tinyDocs.slice(3, 5).toDF("doc_id", "text"), p)
    val before = serveAll(p)
    // 2 batches, 0 tombstones: under both bounds — no rewrite
    assert(!TextIndex.maybeCompact(spark, p, maxTombstones = 10L,
      maxBatches = 4L), "under both bounds: must not compact")
    // tombstones past the bound: fires, resets, serve invariant
    TextIndex.delete(Seq(3L).toDF("doc_id"), p)
    val afterDel = serveAll(p)
    assert(TextIndex.maybeCompact(spark, p, maxTombstones = 0L,
      maxBatches = 4L), "tombstone bound exceeded: must compact")
    assert(serveAll(p) == afterDel)
    assert(!TextIndex.maybeCompact(spark, p, maxTombstones = 0L,
      maxBatches = 4L), "fresh compaction cleared both signals")
    // batch bound: appends past it fire the next check
    TextIndex.append(tinyDocs.drop(5).toDF("doc_id", "text"), p)
    assert(TextIndex.maybeCompact(spark, p, maxTombstones = 10L,
      maxBatches = 1L), "batch bound exceeded: must compact")
    assert(before.nonEmpty) // silence unused warning; lifecycle above
    Caches.releaseAll()
  }

  test("store-served hybrid ≡ scan hybrid for both fusions; pruned probe reads only its cells") {
    val sparkSession = spark
    import sparkSession.implicits._
    import org.apache.spark.sql.functions.expr
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"lang", $"source",
        expr(s"regexp_extract_all(lower(text), '[\\\\p{L}\\\\p{N}]+', 0)")
          .as("tok"))
      .withColumn("dl", size($"tok").cast("double"))
    val emb = docs.select($"doc_id", expr("poly_bow(tok, 64)").as("embedding"))
    val scanRel = HybridSearch.hybrid(spark, docs, emb,
      HybridSearch.QueryTerms, alpha = 0.5, limit = 10)
    val scanRrf = HybridSearch.rrf(spark, docs, emb,
      HybridSearch.QueryTerms, alpha = 0.5, limit = 10)
    assert(rowsOf(TextIndex.hybridServe(spark, path,
        HybridSearch.QueryTerms)) == rowsOf(scanRel),
      "relative fusion from the store must equal the scan path")
    assert(rowsOf(TextIndex.hybridServe(spark, path,
        HybridSearch.QueryTerms, fusion = "ranked")) == rowsOf(scanRrf),
      "ranked fusion from the store must equal the scan path")
    // nprobe < cells: the vector read must carry cid PartitionFilters
    val pruned = TextIndex.vectorServe(spark, path,
      HybridSearch.QueryTerms, nprobe = 2)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
        l.contains("PartitionFilters") && l.contains("cid")),
      s"cid not in PartitionFilters:\n${plan.take(1500)}")
    // and the pruned candidates are a subset drawn from the exact set
    val exact = TextIndex.vectorServe(spark, path, HybridSearch.QueryTerms)
      .collect().map(_.getLong(0)).toSet
    val prunedIds = pruned.collect().map(_.getLong(0)).toSet
    assert(prunedIds.subsetOf(exact) || prunedIds.size == 50)
    Caches.releaseAll()
  }

  test("filtered HYBRID store-serve ≡ the scan pipeline over the filtered corpus") {
    val sparkSession = spark
    import sparkSession.implicits._
    import org.apache.spark.sql.functions.expr
    // the scan twin: filter-first — corpus restricted BEFORE stats,
    // candidates, and fusion (GraftEngine.search's semantics)
    val filtered = Tables.documents(spark, sfDir)
      .filter($"lang" === "en")
      .select($"doc_id",
        expr(s"regexp_extract_all(lower(text), '[\\\\p{L}\\\\p{N}]+', 0)")
          .as("tok"))
      .withColumn("dl", size($"tok").cast("double"))
    val emb = filtered.select($"doc_id",
      expr("poly_bow(tok, 64)").as("embedding"))
    val scan = HybridSearch.hybrid(spark, filtered, emb,
      HybridSearch.QueryTerms, alpha = 0.5, limit = 10)
    val served = TextIndex.filteredHybridServe(spark, path,
      HybridSearch.QueryTerms, Map("lang" -> "en"))
    assert(rowsOf(served) == rowsOf(scan),
      "filtered hybrid from the store must equal filter-first scan")
    // both fusion algorithms share the store machinery
    val scanRrf = HybridSearch.rrf(spark, filtered, emb,
      HybridSearch.QueryTerms, alpha = 0.5, limit = 10)
    val servedRrf = TextIndex.filteredHybridServe(spark, path,
      HybridSearch.QueryTerms, Map("lang" -> "en"), fusion = "ranked")
    assert(rowsOf(servedRrf) == rowsOf(scanRrf))
    Caches.releaseAll()
  }

  test("batched serving: one job answers the batch; qid-1 ranking == the per-query path") {
    val batch = TextIndex.bm25ServeBatch(spark, path,
      HybridSearch.BatchQueries, k = 5)
    val got = batch.collect()
    assert(got.map(_.getLong(0)).distinct.sorted.toSeq == Seq(1L, 2L, 3L))
    // the batch path's qid-1 block must reproduce the per-query
    // path's ranking for the same terms (s1's top-5)
    val q1 = got.filter(_.getLong(0) == 1L)
      .map(r => (r.getLong(1), r.getDouble(2))).toSeq
    val perQuery = TextIndex.bm25Serve(spark, path, HybridSearch.QueryTerms)
      .orderBy($"score".desc, $"doc_id").limit(5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(q1 == perQuery,
      "batch and per-query serving must agree on the same query")
    // the postings read prunes to the UNION of the batch's buckets
    val plan = batch.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
        l.contains("PartitionFilters") && l.contains("pbucket")),
      s"pbucket not in PartitionFilters:\n${plan.take(1500)}")
    Caches.releaseAll()
  }

  test("batched hybrid: each qid block ≡ the per-query hybridServe, both fusions") {
    def block(df: org.apache.spark.sql.DataFrame, qid: Long) =
      df.collect().filter(_.getLong(0) == qid)
        .map(r => (r.getLong(1), r.getDouble(2))).toSeq
    val rel = TextIndex.hybridServeBatch(spark, path,
      HybridSearch.BatchQueries, alpha = 0.5, limit = 10)
    val rrf = TextIndex.hybridServeBatch(spark, path,
      HybridSearch.BatchQueries, alpha = 0.5, limit = 10,
      fusion = "ranked")
    HybridSearch.BatchQueries.foreach { case (qid, terms) =>
      val perQ = TextIndex.hybridServe(spark, path, terms)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(block(rel, qid) == perQ,
        s"batch qid=$qid must equal the per-query relative fusion")
      val perQr = TextIndex.hybridServe(spark, path, terms,
        fusion = "ranked")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(block(rrf, qid) == perQr,
        s"batch qid=$qid must equal the per-query ranked fusion")
    }
    Caches.releaseAll()
  }

  test("filtered store-serve pushes the metadata equality into the docs side table") {
    val served = TextIndex.filteredServe(spark, path, "spark",
      Map("lang" -> "en"), k = 20)
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("lang"),
      "the lang equality must reach the docs-table parquet scan")
    val scan = HybridSearch.s5FilteredSearch(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(served.select($"doc_id", $"source", $"tf".as("tf_spark"))
      .collect().map(_.toSeq).toSeq == scan)
    Caches.releaseAll()
  }

  test("store-served chunk retrieval ≡ the corpus path: by-url, keyset paging, counts") {
    val docs = Tables.documents(spark, sfDir)
    val served = TextIndex.chunksServe(spark, path, Map("source" -> "src3"))
      .select($"doc_id", $"source", md5($"text").as("m"), $"n_chars")
      .orderBy($"doc_id")
    val scan = docs.filter($"source" === "src3")
      .select($"doc_id", $"source", md5($"text").as("m"), $"n_chars")
      .orderBy($"doc_id")
    assert(rowsOf(served) == rowsOf(scan),
      "chunksServe must equal the corpus read with zero corpus access")
    // keyset paging: two pages stitch into the ordered prefix, and
    // page 2 starts strictly after page 1's cursor
    val p1 = TextIndex.pageChunksServe(spark, path,
      Map("source" -> "src3"), None, 5).collect()
    assert(p1.length == 5)
    val cursor = p1.last.getAs[Long]("doc_id")
    val p2 = TextIndex.pageChunksServe(spark, path,
      Map("source" -> "src3"), Some(cursor), 5).collect()
    assert(p2.forall(_.getAs[Long]("doc_id") > cursor))
    val expect = docs.filter($"source" === "src3").orderBy($"doc_id")
      .limit(10).collect().map(_.getAs[Long]("doc_id")).toSeq
    assert((p1 ++ p2).map(_.getAs[Long]("doc_id")).toSeq == expect)
    // counts come from the docs/ side table alone
    assert(rowsOf(TextIndex.countChunksServe(spark, path, "source")
        .orderBy($"source")) ==
      rowsOf(docs.groupBy($"source").agg(count(lit(1)).as("n_chunks"))
        .orderBy($"source")))
    Caches.releaseAll()
  }

  test("nprobe threads through filtered + batch hybrid: pruned ≡ exhaustive on a planted corpus") {
    val sparkSession = spark
    import sparkSession.implicits._
    val p = java.nio.file.Files
      .createTempDirectory("graft-ti-nprobe").toString
    // planted: the 4 query-matching docs share ONE exact token set
    // (identical vectors → one cell, and the query's nearest cell
    // holds the whole true top-4); the 8 decoys use disjoint vocab
    // so kmeans spreads the other cells over them
    val a = (1L to 4L).map(i => (i, "spark join filter", "en"))
    val b = Seq("quantum banana orbit", "velvet walrus tundra",
        "copper lantern mesa", "ivory comet dune", "maple sphinx delta",
        "onyx harbor prism", "cedar falcon ridge", "amber glacier reef")
      .zipWithIndex.map { case (t, i) => ((i + 5).toLong, t, "en") }
    TextIndex.write((a ++ b).toDF("doc_id", "text", "lang"), p)
    val terms = Seq("spark", "join", "filter")
    val exhF = rowsOf(TextIndex.filteredHybridServe(spark, p, terms,
      Map("lang" -> "en"), candidates = 4))
    val prF = TextIndex.filteredHybridServe(spark, p, terms,
      Map("lang" -> "en"), candidates = 4, nprobe = 1)
    assert(rowsOf(prF) == exhF,
      "filtered hybrid: nprobe=1 must equal the exhaustive scan here")
    val planF = prF.queryExecution.executedPlan.toString
    assert(planF.linesIterator.exists(l =>
        l.contains("PartitionFilters") && l.contains("cid")),
      s"cid not in PartitionFilters:\n${planF.take(1500)}")
    val qs = Seq(1L -> terms, 2L -> Seq("spark", "filter"))
    val exhB = rowsOf(TextIndex.hybridServeBatch(spark, p, qs,
      candidates = 4))
    val prB = TextIndex.hybridServeBatch(spark, p, qs,
      candidates = 4, nprobe = 1)
    assert(rowsOf(prB) == exhB,
      "batch hybrid: union-of-probes pruning must equal exhaustive here")
    val planB = prB.queryExecution.executedPlan.toString
    assert(planB.linesIterator.exists(l =>
        l.contains("PartitionFilters") && l.contains("cid")),
      s"cid not in PartitionFilters:\n${planB.take(1500)}")
    Caches.releaseAll()
  }

  test("store-served rerank ≡ the scan-path rerank bit-for-bit (s30 ≡ s4)") {
    // the service's last serving stage: rerank over the hits'
    // stored-fields content — same candidates (s21 ≡ s3), same
    // tokens, same shared overlap expression as the scan path
    val engine = new GraftEngine(spark, Tables.documents(spark, sfDir))
    val scan = engine.searchReranked("spark join filter",
        alpha = 0.5, limit = 10)
      .collect().map(_.toSeq).toSeq
    val served = TextIndex.rerankServe(spark, path,
        HybridSearch.QueryTerms, alpha = 0.5, limit = 10)
      .collect().map(_.toSeq).toSeq
    assert(served == scan,
      "rerankServe must reproduce searchReranked from the store alone")
    assert(HybridSearch.s30RerankedFromIndex(spark, sfDir)
      .collect().map(_.toSeq).toSeq ==
      HybridSearch.s4Rerank(spark, sfDir).collect().map(_.toSeq).toSeq,
      "s30 must equal s4 digit for digit")
    Caches.releaseAll()
  }

  test("rerank under RANKED fusion: both alpha branches rerank the rrf candidates") {
    // fuseRanked names its column rrf_score; the rerank stage must
    // still read one canonical hybrid_score in both alpha branches
    for (alpha <- Seq(0.5, 0.0)) {
      val got = TextIndex.rerankServe(spark, path,
        HybridSearch.QueryTerms, alpha = alpha, limit = 10,
        fusion = "ranked")
      assert(got.columns.toSeq ==
        Seq("doc_id", "hybrid_score", "rerank_score"))
      val rows = got.collect()
      assert(rows.nonEmpty, s"ranked rerank at alpha=$alpha serves")
      val expected = (if (alpha > 0.0)
          TextIndex.hybridServe(spark, path, HybridSearch.QueryTerms,
            alpha = alpha, limit = 10, fusion = "ranked")
            .select($"doc_id")
        else
          TextIndex.bm25Serve(spark, path, HybridSearch.QueryTerms)
            .orderBy($"score".desc, $"doc_id").limit(10)
            .select($"doc_id"))
        .collect().map(_.getLong(0)).toSet
      assert(rows.map(_.getLong(0)).toSet == expected,
        s"ranked rerank at alpha=$alpha reorders exactly its candidates")
    }
    Caches.releaseAll()
  }

  test("keyword-only index: filtered hybrid and batch hybrid degrade to the BM25 leg") {
    val sparkSession = spark
    import sparkSession.implicits._
    // indexStream builds keyword-only indexes (withVectors=false) —
    // every hybrid entry point must degrade to an empty vector leg
    // on them instead of throwing on the absent vectors artifact
    val p = java.nio.file.Files
      .createTempDirectory("graft-ti-kw").toString
    TextIndex.write(tinyDocs.toDF("doc_id", "text"), p,
      withVectors = false)
    val terms = Seq("spark", "join", "filter")
    val perQuery = rowsOf(
      TextIndex.hybridServe(spark, p, terms, alpha = 0.5, limit = 10))
    assert(perQuery.nonEmpty)
    val filtered = rowsOf(TextIndex.filteredHybridServe(spark, p, terms,
      Map.empty, alpha = 0.5, limit = 10))
    assert(filtered == perQuery,
      "unfiltered filteredHybridServe must equal hybridServe on a keyword-only index")
    val batch = TextIndex.hybridServeBatch(spark, p, Seq(7L -> terms),
      alpha = 0.5, limit = 10)
    assert(rowsOf(batch.select($"doc_id", $"hybrid_score")) ==
      perQuery.map(_.take(2)),
      "each batch qid block must equal the per-query serve on a keyword-only index")
    Caches.releaseAll()
  }

  test("negative doc_ids render through the store (pmod bucket, not Scala %)") {
    val sparkSession = spark
    import sparkSession.implicits._
    val p = java.nio.file.Files
      .createTempDirectory("graft-ti-neg").toString
    // -5 is the clear top hit; a Scala-% bucket filter would compute
    // dbucket -5 (no such partition) and silently drop it
    TextIndex.write(Seq(
      (-5L, "spark join filter spark join filter spark"),
      (-3L, "spark join something else entirely"),
      (2L, "the quick brown fox and nothing relevant")
    ).toDF("doc_id", "text"), p)
    val snips = TextIndex.snippetServe(spark, p,
      Seq("spark", "join", "filter"), k = 3)
    val ids = snips.select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.contains(-5L) && ids.contains(-3L),
      s"negative-id hits must render from stored fields, got $ids")
    val mlt = TextIndex.moreLikeThisServe(spark, p, -5L, nTerms = 3, k = 5)
    assert(mlt.collect().map(_.getLong(0)).toSet.contains(-3L),
      "MLT must read a negative seed's forward rows through the pmod bucket")
    Caches.releaseAll()
  }

  test("empty or torn commit marker fails loudly, not with a torn parse") {
    val p = java.nio.file.Files
      .createTempDirectory("graft-ti-torn").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(p, "_commit"), Array.empty[Byte])
    val e1 = intercept[IllegalArgumentException](
      TextIndex.readCommit(spark, p))
    assert(e1.getMessage.contains("commit marker"))
    java.nio.file.Files.write(java.nio.file.Paths.get(p, "_commit"),
      "3 0".getBytes("UTF-8"))
    val e2 = intercept[IllegalArgumentException](
      TextIndex.readCommit(spark, p))
    assert(e2.getMessage.contains("commit marker"))
  }

  test("corpus metadata colliding with bookkeeping names is rejected loudly") {
    import spark.implicits._
    val p = java.nio.file.Files
      .createTempDirectory("graft-ti-reserved").toString
    // 'batch' would be silently REPLACED by the internal batch
    // number (store-served filters would then match the wrong
    // values); 'tok' would duplicate the tokenizer's column
    for (bad <- Seq("batch", "tok")) {
      val df = Seq((1L, "some text", "x")).toDF("doc_id", "text", bad)
      val e = intercept[IllegalArgumentException](TextIndex.write(df, p))
      assert(e.getMessage.contains(bad), s"error must name '$bad'")
    }
    // the append/upsert path rejects the same collision
    TextIndex.write(Seq((1L, "some text", "ok"))
      .toDF("doc_id", "text", "lang"), p)
    val e3 = intercept[IllegalArgumentException](TextIndex.append(
      Seq((2L, "more text", 7L)).toDF("doc_id", "text", "dbucket"), p))
    assert(e3.getMessage.contains("dbucket"))
  }

  test("metadata schema EVOLVES on append: new columns widen, old rows read NULL") {
    import spark.implicits._
    val p = java.nio.file.Files
      .createTempDirectory("graft-ti-evolve").toString
    TextIndex.write(Seq((1L, "alpha beta", "en"))
      .toDF("doc_id", "text", "lang"), p)
    // AddProperty: the appended batch carries a NEW metadata column
    TextIndex.append(Seq((2L, "alpha gamma", "en", "web"))
      .toDF("doc_id", "text", "lang", "source"), p)
    // filters on the evolved column hit only rows that carry it
    val hit = TextIndex.filteredServe(spark, p, "alpha",
      Map("source" -> "web")).select($"doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(hit == Set(2L), s"evolved-column filter must match, got $hit")
    // rows written BEFORE the column existed read it as NULL
    val rows = TextIndex.chunksServe(spark, p, Map("lang" -> "en"))
      .orderBy($"doc_id").collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L))
    assert(rows.head.isNullAt(rows.head.fieldIndex("source")),
      "pre-evolution rows must read the new column as NULL")
    assert(rows(1).getAs[String]("source") == "web")
    // a batch OMITTING a known column pads it with NULL the same way
    TextIndex.append(Seq((3L, "alpha delta")).toDF("doc_id", "text"), p)
    val en = TextIndex.chunksServe(spark, p, Map("lang" -> "en"))
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(en == Set(1L, 2L), "the omitting batch's row has NULL lang")
    // a property TYPE change is the one illegal evolution
    val e = intercept[IllegalArgumentException](TextIndex.append(
      Seq((4L, "alpha epsilon", 7L)).toDF("doc_id", "text", "lang"), p))
    assert(e.getMessage.contains("lang"))
    // ranking artifacts are untouched by evolution: BM25 still serves
    // every live doc
    assert(TextIndex.bm25Serve(spark, p, Seq("alpha"))
      .select($"doc_id").collect().map(_.getLong(0)).toSet
      == Set(1L, 2L, 3L))
    // compaction consolidates the widened schema and keeps serving
    TextIndex.compact(spark, p)
    assert(TextIndex.chunksServe(spark, p, Map("source" -> "web"))
      .select($"doc_id").collect().map(_.getLong(0)).toSet == Set(2L))
  }

  test("delete-by-metadata ≡ rebuild without the source, across serving modes") {
    val sparkSession = spark
    import sparkSession.implicits._
    val p1 = java.nio.file.Files
      .createTempDirectory("graft-ti-metadel-a").toString
    val p2 = java.nio.file.Files
      .createTempDirectory("graft-ti-metadel-b").toString
    val docs = tinyDocs.toDF("doc_id", "text")
      .withColumn("source", concat(lit("s"), pmod($"doc_id", lit(2L))))
      .withColumn("url", concat(lit("http://x/"), $"doc_id"))
    TextIndex.write(docs, p1)
    TextIndex.write(docs.filter($"source" =!= "s1"), p2)
    // DeleteChunksBySourceID: ids resolve from the index's own docs/
    // metadata — the caller never supplies ids and never touches the
    // corpus
    val n = TextIndex.deleteByMeta(spark, p1, Map("source" -> "s1"))
    assert(n == 3L, s"sources s1 = docs 1,3,5; deleted $n")
    assert(serveAll(p1) == serveAll(p2),
      "serve after delete-by-source must equal the rebuild-without " +
        "across every serving mode")
    // double delete is a no-op, not an error
    assert(TextIndex.deleteByMeta(spark, p1, Map("source" -> "s1")) == 0L)
    // DeleteChunksByURL: source AND url equality hits exactly one page
    val p3 = java.nio.file.Files
      .createTempDirectory("graft-ti-metadel-c").toString
    TextIndex.write(docs.filter($"source" =!= "s1" && $"doc_id" =!= 2L), p3)
    assert(TextIndex.deleteByMeta(spark, p1,
      Map("source" -> "s0", "url" -> "http://x/2")) == 1L)
    assert(serveAll(p1) == serveAll(p3),
      "delete-by-url must equal the rebuild without that page")
    Caches.releaseAll()
  }

  test("evolution edge cases: pre-artifact fallback append; case-variant column") {
    import spark.implicits._
    val p = java.nio.file.Files
      .createTempDirectory("graft-ti-evo-edge").toString
    TextIndex.write(Seq((1L, "alpha beta", "en"))
      .toDF("doc_id", "text", "lang"), p)
    // simulate an index written BEFORE the dschema artifact existed:
    // the fallback footer schema types batch/dbucket as int and must
    // not trip the property-type check
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(s"$p/dschema"), true)
    TextIndex.append(Seq((2L, "alpha gamma", "en"))
      .toDF("doc_id", "text", "lang"), p)
    assert(TextIndex.bm25Serve(spark, p, Seq("alpha"))
      .select($"doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 2L),
      "append to a pre-artifact index must work through the fallback")
    // a CASE-VARIANT arrival of a known column resolves to it (Spark
    // resolution is case-insensitive) instead of committing a
    // duplicate field that would poison every later docs read
    TextIndex.append(Seq((3L, "alpha delta", "de"))
      .toDF("doc_id", "text", "Lang"), p)
    val langs = TextIndex.chunksServe(spark, p, Map("lang" -> "de"))
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(langs == Set(3L),
      s"case-variant batch must serve through the original column, got $langs")
    // …and the batch persisted under the COMMITTED name: the on-disk
    // layout must stay canonical (a 'Lang'-named file would only
    // resolve while spark.sql.caseSensitive=false)
    val batch2 = spark.read.parquet(s"$p/docs/batch=2")
    assert(batch2.schema.fieldNames.contains("lang") &&
      !batch2.schema.fieldNames.contains("Lang"),
      s"case-variant arrival must write the committed column name, " +
        s"got ${batch2.schema.fieldNames.mkString(", ")}")
    // a NEW column arriving as untyped NULL literals must be
    // rejected at the evolution check (parquet cannot write
    // NullType), and the failed append must not poison the index
    val nullBatch = Seq((4L, "alpha epsilon", "en"))
      .toDF("doc_id", "text", "lang")
      .withColumn("extra", lit(null))
    val err = intercept[IllegalArgumentException] {
      TextIndex.append(nullBatch, p)
    }
    assert(err.getMessage.contains("NullType") &&
      err.getMessage.contains("property types"),
      s"NullType rejection must name the evolution rule: ${err.getMessage}")
    assert(TextIndex.bm25Serve(spark, p, Seq("alpha"))
      .select($"doc_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 3L),
      "the rejected append must leave the committed state serving")
  }
}
