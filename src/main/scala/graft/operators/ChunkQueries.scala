package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Qurio data-plane operators (SURVEY.md §2.B): ingestion ->
  * chunking -> contextual embedding input -> chunk-store views.
  *
  * The chunk store schema mirrors DocumentChunk
  * (apps/backend/internal/vector/schema.go:26-70): content, sourceId,
  * chunkIndex, type, language, title, url — here derived from the
  * `documents` table (source plays sourceId/url, doc_id plays the
  * page ordering).
  */
object ChunkQueries {

  final case class DocChunk(doc_id: Long, chunk_index: Int, content: String,
                            chunk_type: String, language: String)

  /** c1: CleanMarkdownNoise as a column op (chunker.go:27-38). */
  def c1CleanMarkdown(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id",
        md5(regexp_replace(
          regexp_replace($"text", lit("(?mi)^\\[edit[^\\]]*\\]\\([^\\)]+\\)\\s*$"), lit("")),
          lit("(?mi)^#{1,3}\\s+(?:table of )?contents?\\s*\\n(?:\\s*[-*]\\s*\\[.*?\\]\\(#.*?\\)\\s*\\n)*"), lit("")))
          .as("cleaned_md5"))
      .orderBy($"doc_id")
  }

  /** Chunker-lite corpus: markdown synthesized deterministically from
    * `documents` columns so that every chunk boundary is exactly
    * predictable — three variants (by doc_id mod 3) mixing prose,
    * python/yaml/bash fences, a swagger-keyword prose (api type), and
    * a sub-noise-floor tail ("Thanks.") that the noise filter must
    * drop. All prose sections and fence bodies sit under
    * maxChars = maxTokens*4 = 128, so the paragraph/line/word packing
    * never triggers and the expected chunks are SQL-constructible
    * string concats. c2/c3 run the REAL imperative chunker over this
    * corpus and hash-match the DuckDB-built expectation; general
    * chunker behavior (packing, over-budget fences, every noise rule)
    * stays covered by ChunkerReferenceParitySpec's ported
    * chunker_test.go cases. */
  private[operators] def chunkLiteCorpus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val v = pmod($"doc_id", lit(3))
    val id = $"doc_id".cast("string")
    val proseA = when(v === 2,
        concat(lit("This swagger endpoint spec for document D"), id,
               lit(" describes the public api surface and methods.")))
      .otherwise(
        concat(lit("Overview of document D"), id, lit(" from "), $"source",
               lit(" explaining the ingestion design in plain words.")))
    val code = when(v === 0,
        concat(lit("def handler_"), id, lit("(x):\n    return x + "),
               pmod($"doc_id", lit(10)).cast("string")))
      .when(v === 1,
        concat(lit("name: doc-"), id, lit("\nreplicas: "),
               pmod($"doc_id", lit(5)).cast("string")))
      .otherwise(concat(lit("echo build-"), id))
    val lang = when(v === 0, lit("python")).when(v === 1, lit("yaml"))
      .otherwise(lit("bash"))
    val proseB = concat(lit("Closing remarks for document D"), id,
      lit(" with enough words to pass the noise floor easily."))
    val text = concat(proseA, lit("\n\n```"), lang, lit("\n"), code, lit("\n```"),
      when(v === 0, concat(lit("\n\n"), proseB))
        .when(v === 1, lit("\n"))
        .otherwise(lit("\n\nThanks.")))
    Tables.documents(spark, dir).select($"doc_id", text.as("text"))
  }

  /** c2: the structural chunker as a typed Dataset flatMap — one pass
    * per document, no shuffle; scales with input splits. Runs over
    * the chunker-lite corpus so the driver's DuckDB oracle can
    * hash-match every chunk (index, md5, type, language, length). */
  def c2ChunkMarkdown(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    chunkLiteCorpus(spark, dir)
      .as[(Long, String)]
      .flatMap { case (docId, text) =>
        Chunker.chunkMarkdown(text, maxTokens = 32, overlap = 0).zipWithIndex.map {
          case (c, i) => DocChunk(docId, i, c.content, c.chunkType, c.language)
        }
      }
      .toDF()
      .select($"doc_id", $"chunk_index", md5($"content").as("content_md5"),
              $"chunk_type", $"language", length($"content").cast("long").as("n_chars"))
      .orderBy($"doc_id", $"chunk_index")
  }

  /** c3: IsNoiseChunk (chunker.go:43-97) as a DataFrame filter over
    * the chunked corpus; keeps embed-worthy chunks. The variant-2
    * docs carry a sub-floor "Thanks." tail, so the per-doc kept
    * count proves the filter fired (3/2/2 chunks by variant). */
  def c3NoiseFilter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    chunkLiteCorpus(spark, dir)
      .as[(Long, String)]
      .flatMap { case (docId, text) =>
        Chunker.chunkMarkdown(text, maxTokens = 32, overlap = 0).zipWithIndex.collect {
          case (c, i) if !Chunker.isNoiseChunk(c.content) =>
            DocChunk(docId, i, c.content, c.chunkType, c.language)
        }
      }
      .toDF()
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("kept_chunks"))
      .orderBy($"doc_id")
  }

  import org.apache.spark.sql.Column

  /** Contextual embed-input column — the exact reconstruction from
    * embedder_consumer.go:44-60: "Documentation/Title/Section" header,
    * optional "Author:"/"Created:" lines (omitted when empty, like the
    * reference's != "" guards), then "---" and the chunk content. */
  def contextualString(sourceName: Column, title: Column, section: Column,
                       content: Column,
                       author: Column = lit(""), created: Column = lit("")): Column =
    concat(
      lit("Documentation: "), sourceName,
      lit("\nTitle: "), title,
      lit("\nSection: "), section,
      when(author.isNotNull && author =!= "", concat(lit("\nAuthor: "), author))
        .otherwise(lit("")),
      when(created.isNotNull && created =!= "", concat(lit("\nCreated: "), created))
        .otherwise(lit("")),
      lit("\n---\n"), content)

  /** c4: contextual embed-input construction
    * (apps/backend/internal/worker/embedder_consumer.go:44-60):
    * "Documentation: <sourceName>\nTitle: <title>\nSection: <path>
    * \n---\n<content>". */
  def c4ContextualString(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id",
        md5(contextualString($"source", concat(lit("doc-"), $"doc_id"),
                             $"lang", $"text")).as("ctx_md5"))
      .orderBy($"doc_id")
  }

  /** Deterministic stub embedder — polynomial-hash bag-of-tokens
    * projected to 64 dims, L2-normalized. Stands in for the external
    * embedding API (gemini adapter) with a pure codegen'd kernel
    * (poly_bow) whose hash DuckDB can reproduce with ANSI SQL, so
    * the embedding itself is oracle-checked value by value.
    * Returns (doc_id, embedding array<double>). */
  /** Embedding coordinates (doc_id, pos, val) — entirely
    * codegen+window, no higher-order functions. The naive
    * `transform(raw, x -> x / sqrt(aggregate(...)))` formulation is a
    * trap: CollapseProject inlines the norm (and the poly_bow feeding
    * it) INTO the per-element lambda, re-hashing every token 64 times
    * per document. Here poly_bow runs once per doc inside the
    * generate, and the L2 norm is an ordered-frame window sum — the
    * accumulation order is pos 0..63, bit-identical to the sequential
    * fold the DuckDB oracle computes. */
  private def embedVals(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"doc_id").orderBy($"pos")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.documents(spark, dir)
      .select($"doc_id", expr("regexp_extract_all(lower(text), '\\\\S+', 0)").as("tok"))
      .filter(size($"tok") > 0)
      .select($"doc_id", posexplode(expr("poly_bow(tok, 64)")))
      .withColumn("nrm", sqrt(sum($"col" * $"col").over(w)))
      .select($"doc_id", $"pos", round($"col" / $"nrm", 6).as("val"))
  }

  def c5EmbedChunks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    embedVals(spark, dir)
      .groupBy($"doc_id")
      .agg(array_sort(collect_list(struct($"pos", $"val"))).as("pv"))
      .select($"doc_id", transform($"pv", p => p("val")).as("embedding"))
      .orderBy($"doc_id")
  }

  /** c5 gate view: one row per (doc, dimension) — arrays don't
    * survive the driver's pandas-side sort, and the exploded form
    * lets the oracle hash-match every embedding coordinate. */
  def c5EmbedChunksGate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    embedVals(spark, dir).orderBy($"doc_id", $"pos")
  }

  /** c6: GetChunksByURL (store.go:311-335): all chunks of one page,
    * ordered by chunkIndex — filter + sort, pushdown-friendly. */
  def c6ChunksByUrl(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter($"source" === "src3")
      .select($"doc_id", $"source", md5($"text").as("content_md5"), $"n_chars")
      .orderBy($"doc_id")
  }

  /** c7: corpus stats (features/stats/handler.go:40-76): sources /
    * documents / vectors counts in one row. */
  def c7CorpusStats(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .agg(countDistinct(col("source")).as("sources"),
           count(lit(1)).as("documents"))
    val vecs = Tables.embeddings(spark, dir).agg(count(lit(1)).as("vectors"))
    docs.crossJoin(vecs)
  }

  /** c8: DeleteChunksBySourceID (store.go:93-103) as the surviving
    * view — anti-join against the deleted sources. */
  def c8DeleteBySource(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val deleted = Seq("src0", "src1").toDF("del_source")
    Tables.documents(spark, dir)
      .join(broadcast(deleted), $"source" === $"del_source", "left_anti")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy($"source")
  }

  /** c9: crawl-frontier link discovery (worker/link_discovery.go):
    * same-host + http(s) + fragment-strip + regex exclusions + dedup
    * + depth+1. Links are synthesized deterministically from events
    * so the op is oracle-checkable. */
  def c9LinkDiscovery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val depth = 1
    val links = Tables.events(spark, dir)
      .select(concat(
        lit("https://host"), pmod($"user_id", lit(3)),
        lit(".example.com/page/"), pmod($"event_id", lit(50)),
        when(pmod($"event_id", lit(7)) === 0, lit("#frag")).otherwise(lit(""))).as("link"))
    links
      .select(regexp_replace($"link", lit("#.*$"), lit("")).as("url"))
      .filter(regexp_extract($"url", "^(https?)://([^/]+)", 2) === "host0.example.com")
      .filter(!$"url".rlike("/page/1[0-9]$"))
      .distinct()
      .select($"url", lit(depth + 1).cast("long").as("depth"))
      .orderBy($"url")
  }

  /** c10: multi-depth crawl frontier (worker/link_discovery.go loops
    * pages into the queue with depth+1 up to maxDepth) as iterative
    * BFS over DataFrames: each level joins the frontier against the
    * (persisted) edge list and anti-joins the visited set, so a page
    * reached by several paths keeps its first-discovery depth and
    * cycles terminate. The edge graph is synthesized deterministically
    * from events (each page links to two others), so a DuckDB
    * recursive CTE can verify the reachability + min-depth result.
    * At scale: maxDepth bounded driver loop; per level one shuffle on
    * the join key and one anti-join — the standard distributed-BFS
    * shape. */
  def c10CrawlBfs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // two deterministic out-links per page id: (7p+3) mod 50, (3p+1) mod 50
    val edges = Tables.events(spark, dir)
      .select(pmod($"event_id", lit(50)).cast("long").as("src"))
      .distinct()
      .select($"src", explode(array(
        pmod($"src" * 7 + 3, lit(50)),
        pmod($"src" * 3 + 1, lit(50)))).as("dst"))
    crawlBfsOf(edges, seed = 0L, maxDepth = 4)
  }

  /** BFS core over any (src, dst) edge frame: min-depth reachability
    * from `seed`, depth-capped. Size-adaptive like [[pageRankOf]]:
    * each distributed level pays a join + anti-join + persist +
    * scheduling round-trip of FIXED overhead — below `driverLimit`
    * edges the identical level-synchronous BFS runs driver-local
    * over the collected edge list (first-discovery depth and cycle
    * termination are set semantics, so both paths emit bit-equal
    * rows — pinned by spec). */
  def crawlBfsOf(edges0: DataFrame, seed: Long, maxDepth: Int,
                 driverLimit: Long = 100000L): DataFrame = {
    import edges0.sparkSession.implicits._
    val edges = graft.Caches.persist(edges0)
    if (edges.count() <= driverLimit)
      return crawlBfsLocal(edges, seed, maxDepth)
    var visited = Seq((seed, 0L)).toDF("url", "depth")
    var frontier = visited.select($"url")
    var d = 1
    var drained = false
    while (d <= maxDepth && !drained) {
      // persist each level: frontier(d) feeds BOTH visited (union
      // branch) and frontier(d+1) (join + anti-join) — without the
      // cache the lazy union tree re-evaluates every earlier level
      // once per later level (exponential plan blowup, the classic
      // iterative-DataFrame trap)
      // no broadcast hints: `visited` grows every level, and a hint
      // is a hard override — at web scale a forced broadcast of the
      // visited set OOMs the driver. AQE broadcasts from runtime
      // stats while the sets are small and degrades to shuffle hash
      // joins once they aren't.
      frontier = graft.Caches.persist(frontier
        .join(edges, $"url" === $"src")
        .select($"dst".as("url")).distinct()
        .join(visited.select($"url"), Seq("url"), "left_anti"))
      visited = visited.union(
        frontier.select($"url", lit(d.toLong).as("depth")))
      // drain probe on the just-persisted frontier: one cheap action,
      // vs a dead level's join + anti-join + persist + scheduling
      // round-trip (a graph shallower than maxDepth pays for its real
      // diameter only — same early-exit as Sitemap.resolve)
      drained = frontier.isEmpty
      d += 1
    }
    visited.orderBy($"url")
  }

  /** Driver-local twin of the distributed BFS above — identical
    * level-synchronous expansion, so depths are bit-equal. */
  private def crawlBfsLocal(edges: DataFrame, seed: Long,
                            maxDepth: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val adj = edges.select($"src", $"dst").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val depth = scala.collection.mutable.Map(seed -> 0L)
    var frontier = Seq(seed)
    var d = 1
    while (d <= maxDepth && frontier.nonEmpty) {
      frontier = frontier
        .flatMap(u => adj.getOrElse(u, Array.empty[Long])).distinct
        .filterNot(depth.contains)
      frontier.foreach(u => depth(u) = d.toLong)
      d += 1
    }
    depth.toSeq.sortBy(_._1).toDF("url", "depth").orderBy($"url")
  }

  /** Fixed-point scale for [[pageRankOf]]: ranks live as int64 in
    * units of 1e-12. */
  private[graft] val PrScale = 1000000000000L

  /** PageRank core over any (src, dst) edge frame — the authority
    * score a crawl scheduler feeds back into frontier prioritization
    * (the companion pass to c10's reachability BFS).
    *
    * FIXED-POINT arithmetic: ranks are int64 in units of 1e-12 and
    * every update is integer multiply + integer `div`, so the result
    * is bit-exact in any engine and ANY aggregation order — plain
    * `sum` end to end. The float formulation needs per-key ordered
    * folds for cross-engine determinism (the t10/a4 trick), and a
    * hot page's in-degree turns a per-key collect into a skew bomb
    * at 100 TB; integer addition is associative, so this version
    * keeps the partial-aggregated shuffle. Damping 0.85 is ×85
    * div 100; dangling mass is redistributed uniformly each step;
    * floor division leaks <(|E|+|V|+1) units of 1e-12 mass per
    * iteration — deterministic, and bounded far below the 8dp the
    * output rounds to.
    *
    * Per iteration: one shuffle keying ranks to edge sources and one
    * partial-aggregated shuffle on dst — the standard distributed
    * PageRank shape — with the rank frame persisted per level (c10's
    * lineage rule). The node count is the only driver scalar (one
    * count on the persisted node set, the same class of action as
    * c10's drain probe). */
  def pageRankOf(edges0: DataFrame, iters: Int = 3,
                 driverLimit: Long = 100000L): DataFrame = {
    import edges0.sparkSession.implicits._
    val edges = graft.Caches.persist(edges0)
    // size-adaptive (the componentLabels discipline): each
    // distributed power iteration pays several jobs of fixed
    // overhead regardless of graph size — below `driverLimit` edges
    // the identical int64 fixed-point update runs driver-local over
    // the collected edge list (the count gates the collect; integer
    // arithmetic is exactly associative, so both paths emit
    // bit-equal ranks — pinned by spec).
    if (edges.count() <= driverLimit)
      return pageRankLocal(edges, iters)
    val nodes = graft.Caches.persist(
      edges.select($"src".as("url"))
        .union(edges.select($"dst".as("url"))).distinct())
    val n = nodes.count()
    val outdeg = edges.groupBy($"src").agg(count(lit(1)).as("odeg"))
    var ranks = nodes.select($"url", lit(PrScale / n).as("r"))
    for (_ <- 1 to iters) {
      val linked = ranks.join(outdeg, ranks("url") === outdeg("src"), "left")
      val dangling = linked.filter($"odeg".isNull)
        .agg(coalesce(sum($"r"), lit(0L)).as("dm"))
      val contribs = linked.filter($"odeg".isNotNull)
        .join(edges, "src")
        .select($"dst".as("url"), expr("(r * 85) div (odeg * 100)").as("c"))
        .groupBy($"url").agg(sum($"c").as("cin"))
      ranks = graft.Caches.persist(nodes
        .join(contribs, Seq("url"), "left")
        .crossJoin(broadcast(dangling))
        .select($"url",
          (lit(15L * PrScale / (100L * n)) + coalesce($"cin", lit(0L))
            + expr(s"(dm * 85) div (100 * ${n}L)")).as("r")))
    }
    ranks.select($"url", $"r".as("rank_e12"),
        round($"r".cast("double") / 1e12, 8).as("rank"))
      .orderBy($"rank_e12".desc, $"url")
  }

  /** Driver-local twin of the distributed loop above — the SAME
    * int64 fixed-point update (floor divisions on positive longs,
    * exactly associative integer sums), so ranks are bit-equal. */
  private def pageRankLocal(edges: DataFrame, iters: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val es = edges.select($"src", $"dst").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct.sorted
    val n = nodes.length.toLong
    val odeg = es.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    var r = nodes.map(u => u -> PrScale / n).toMap
    for (_ <- 1 to iters) {
      val dm = nodes.filter(!odeg.contains(_)).map(r).sum
      val cin = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      es.foreach { case (s, d) =>
        cin(d) += (r(s) * 85L) / (odeg(s) * 100L)
      }
      val base = 15L * PrScale / (100L * n)
      val dshare = (dm * 85L) / (100L * n)
      r = nodes.map(u => u -> (base + cin(u) + dshare)).toMap
    }
    spark.createDataFrame(nodes.map(u => (u, r(u))).toSeq)
      .toDF("url", "rank_e12")
      .select($"url", $"rank_e12",
        round($"rank_e12".cast("double") / 1e12, 8).as("rank"))
      .orderBy($"rank_e12".desc, $"url")
  }

  /** c15: PageRank over the crawl link graph — same deterministic
    * edge synthesis as c10, 3 power iterations, dangling mass
    * redistributed. The DuckDB oracle unrolls all three iterations
    * as CTE stages over identical integer arithmetic, so the int64
    * rank artifact hash-matches with zero rounding slack. */
  def c15PageRank(spark: SparkSession, dir: String): DataFrame =
    pageRankShared(spark, dir)

  /** SHARED rank table over the crawl link graph — the 3-iteration
    * fixed point c15 reports and c17's frontier prioritizer joins,
    * computed once per (session, corpus) like the other corpus-level
    * builds (Bench bills it as `_shared_pagerank`): a crawler ranks
    * its graph once per cycle and every scheduling read serves from
    * the rank table. */
  def pageRankShared(spark: SparkSession, dir: String): DataFrame =
    graft.Caches.shared(spark, s"pagerank:$dir") {
      import spark.implicits._
      val edges = Tables.events(spark, dir)
        .select(pmod($"event_id", lit(50)).cast("long").as("src"))
        .distinct()
        .select($"src", explode(array(
          pmod($"src" * 7 + 3, lit(50)),
          pmod($"src" * 3 + 1, lit(50)))).as("dst"))
      pageRankOf(edges, 3)
    }

  /** c11: sitemap parsing (ingestion-worker handlers/sitemap.py:
    * _parse_sitemap_xml + _extract_urls_from_urlset) — extract
    * <loc> URLs from sitemap XML documents, keeping only the crawl
    * domain, dedup'd. The sitemap corpus is synthesized
    * deterministically from events (10 pages per sitemap, build order
    * pinned by event_id) so DuckDB can verify: at scale the xml
    * column arrives from the fetch tier and the same extract/filter
    * plan applies unchanged. */
  def c11SitemapParse(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pieces = Tables.events(spark, dir)
      .select(expr("event_id div 10").as("sm_id"), $"event_id",
        concat(lit("<url><loc>https://host"), pmod($"user_id", lit(3)),
               lit(".example.com/page/"), pmod($"event_id", lit(50)),
               lit("</loc></url>")).as("piece"))
    val sitemaps = pieces
      .groupBy($"sm_id")
      .agg(concat(lit("<urlset>"),
        concat_ws("", transform(
          array_sort(collect_list(struct($"event_id", $"piece"))),
          p => p("piece"))),
        lit("</urlset>")).as("xml"))
    sitemaps
      .select($"sm_id",
        explode(expr("regexp_extract_all(xml, '<loc>\\\\s*(.*?)\\\\s*</loc>', 1)")).as("loc"))
      .filter(regexp_extract($"loc", "^https?://([^/]+)", 1) === "host0.example.com")
      .distinct()
      .orderBy($"sm_id", $"loc")
  }

  /** c12: sitemap-INDEX resolution (ingestion-worker
    * handlers/sitemap.py:226-306 _resolve_sitemap): a fetched sitemap
    * whose root is <sitemapindex> yields sub-sitemap <loc>s resolved
    * recursively at depth+1; depth > MAX_SITEMAP_INDEX_DEPTH (3,
    * sitemap.py:22) is cut; <urlset> roots yield page URLs filtered
    * to the crawl domain; the final set is dedup'd. Here the fetch
    * tier is a synthesized (url, xml) corpus: root index -> ~70
    * second-level indexes -> ~3.4k urlset sitemaps (10 pages each),
    * PLUS an over-depth chain whose depth-4 urlset holds a trap page
    * (must be cut) and an orphan urlset referenced by nothing (must
    * never be scanned). Traversal is the same bounded frontier loop
    * as c10: per depth one equi-join frontier->corpus and one
    * extract — at web scale the corpus is the fetched-sitemap table
    * and each level is one shuffle on url. */
  def c12SitemapIndex(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val maxDepth = 3
    val host = "https://host0.example.com"
    // persist (tracked): pieces feeds the urlset build AND the sm_id
    // rollups (index + root) — one events scan instead of three
    val pieces = graft.Caches.persist(Tables.events(spark, dir)
      .select(expr("event_id div 10").as("sm_id"), $"event_id",
        concat(lit("<url><loc>https://host"), pmod($"user_id", lit(3)),
               lit(".example.com/page/"), pmod($"event_id", lit(50)),
               lit("</loc></url>")).as("piece")))
    val subs = pieces
      .groupBy($"sm_id")
      .agg(concat(lit("<urlset>"),
        concat_ws("", transform(
          array_sort(collect_list(struct($"event_id", $"piece"))),
          p => p("piece"))),
        lit("</urlset>")).as("xml"))
      .select(concat(lit(s"$host/sitemap/"), $"sm_id", lit(".xml")).as("url"), $"xml")
    val smIds = pieces.select($"sm_id").distinct()
    val idxDocs = smIds
      .groupBy(expr("sm_id div 50").as("idx_id"))
      .agg(concat(lit("<sitemapindex>"),
        concat_ws("", transform(array_sort(collect_list($"sm_id")),
          s => concat(lit(s"<sitemap><loc>$host/sitemap/"), s,
                      lit(".xml</loc></sitemap>")))),
        lit("</sitemapindex>")).as("xml"))
      .select(concat(lit(s"$host/index/"), $"idx_id", lit(".xml")).as("url"), $"xml")
    val rootDoc = smIds
      .select(expr("sm_id div 50").as("idx_id")).distinct()
      .agg(concat(lit("<sitemapindex>"),
        concat_ws("", transform(array_sort(collect_list($"idx_id")),
          i => concat(lit(s"<sitemap><loc>$host/index/"), i,
                      lit(".xml</loc></sitemap>")))),
        lit(s"<sitemap><loc>$host/chain/1.xml</loc></sitemap>"),
        lit("</sitemapindex>")).as("xml"))
      .select(lit(s"$host/sitemap.xml").as("url"), $"xml")
    val extraDocs = Seq(
      (s"$host/chain/1.xml",
       s"<sitemapindex><sitemap><loc>$host/chain/2.xml</loc></sitemap></sitemapindex>"),
      (s"$host/chain/2.xml",
       s"<sitemapindex><sitemap><loc>$host/chain/3.xml</loc></sitemap></sitemapindex>"),
      (s"$host/chain/3.xml",
       s"<sitemapindex><sitemap><loc>$host/chain/4.xml</loc></sitemap></sitemapindex>"),
      (s"$host/chain/4.xml",
       s"<urlset><url><loc>$host/page/trap</loc></url></urlset>"),
      (s"$host/orphan.xml",
       s"<urlset><url><loc>$host/page/orphan</loc></url></urlset>"))
      .toDF("url", "xml")
    // resolve() persists the doc table itself (its size gate reads it)
    val docs = subs.union(idxDocs).union(rootDoc).union(extraDocs)
    Sitemap.resolve(docs, s"$host/sitemap.xml", "host0.example.com", maxDepth)
      .orderBy($"url")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c12_sitemap_index" -> c12SitemapIndex _,
    "c11_sitemap_parse" -> c11SitemapParse _,
    "c1_clean_markdown" -> c1CleanMarkdown _,
    "c2_chunk_markdown" -> c2ChunkMarkdown _,
    "c3_noise_filter" -> c3NoiseFilter _,
    "c4_contextual_string" -> c4ContextualString _,
    "c5_embed_chunks" -> c5EmbedChunksGate _,
    "c6_chunks_by_url" -> c6ChunksByUrl _,
    "c7_corpus_stats" -> c7CorpusStats _,
    "c8_delete_by_source" -> c8DeleteBySource _,
    "c9_link_discovery" -> c9LinkDiscovery _,
    "c10_crawl_bfs" -> c10CrawlBfs _,
    "c15_pagerank" -> c15PageRank _,
    "c20_redirect_resolve" -> c20RedirectResolve _,
    "c22_trap_detect" -> c22TrapDetect _)

  /** POINTER-JUMPING redirect resolution over any (src, dst)
    * redirect-edge frame (each URL redirects to at most one target —
    * a functional graph). Every crawl accumulates redirect chains
    * (moved pages, http→https hops, URL shorteners) and the store
    * wants each URL's TERMINAL address. The naive walk joins once
    * per hop — a length-L chain costs L rounds; pointer jumping
    * squares the pointer each round (p ← p(p), hops add), so round k
    * resolves chains of length 2^k: O(log L) keyed shuffles, the
    * difference between 3 rounds and 30 at crawl scale. Terminals
    * are fixed points (p = self, h = 0) so resolved chains stop
    * accumulating exactly at their true hop count; nodes whose
    * pointer never lands on a terminal within the round budget are
    * REDIRECT LOOPS, flagged unresolved rather than walked forever.
    * Per-round localCheckpoint truncates the doubling lineage (p5's
    * rule). */
  def resolveRedirects(edges0: DataFrame, rounds: Int = 3,
                       driverLimit: Long = 100000L): DataFrame = {
    import edges0.sparkSession.implicits._
    // size-adaptive (the pageRankOf/crawlBfsOf discipline): each
    // doubling round is a keyed self-join + checkpoint of fixed
    // overhead — below the edge gate the identical pointer jumping
    // runs driver-local (pure integer pointer/hop updates, so both
    // paths emit bit-equal rows — pinned by spec)
    val edges = graft.Caches.persist(edges0)
    if (edges.count() <= driverLimit)
      return resolveRedirectsLocal(edges, rounds)
    val nodes = edges.select($"src".as("url"))
      .union(edges.select($"dst".as("url"))).distinct()
    var cur = nodes
      .join(edges, $"url" === $"src", "left")
      .select($"url", coalesce($"dst", $"url").as("p"),
        when($"dst".isNotNull, 1L).otherwise(0L).as("h"))
      .transform(graft.Checkpoints.truncate)
    for (_ <- 1 to rounds) {
      val m = cur.select($"url".as("u2"), $"p".as("p2"), $"h".as("h2"))
      cur = cur.join(m, $"p" === $"u2")
        .select($"url", $"p2".as("p"), ($"h" + $"h2").as("h"))
        .transform(graft.Checkpoints.truncate)
    }
    val terminals = nodes
      .join(edges.select($"src").distinct(), $"url" === $"src", "left_anti")
      .select($"url".as("t"))
    cur.join(terminals, $"p" === $"t", "left")
      .select($"url",
        when($"t".isNotNull, $"p").as("terminal_url"),
        when($"t".isNotNull, $"h").as("hops"),
        $"t".isNotNull.as("resolved"))
      .orderBy($"url")
  }

  /** Driver-local twin of the distributed pointer jumping above —
    * the SAME doubling rounds over (pointer, hops), so chains beyond
    * the 2^rounds budget stay unresolved identically. Key-type
    * generic like the distributed path (redirect graphs key on URL
    * strings; the synthetic c20 corpus keys on longs). */
  private def resolveRedirectsLocal(edges: DataFrame,
                                    rounds: Int): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{BooleanType, LongType, StructField, StructType}
    val spark = edges.sparkSession
    val keyType = edges.schema("src").dataType
    val es = edges.select("src", "dst").collect()
      .map(r => (r.get(0), r.get(1)))
    // The distributed path fans duplicate-src rows out, while toMap
    // would pick a collect-order winner — fail loudly instead of
    // diverging between the two size-gated paths.
    require(es.map(_._1).distinct.length == es.length,
      "redirect edges must be a functional graph (one out-edge per src)")
    val next: Map[Any, Any] = es.toMap
    val nodes: Seq[Any] = (es.map(_._1) ++ es.map(_._2)).distinct.toSeq
    var p = nodes.map(u => u -> next.getOrElse(u, u)).toMap
    var h = nodes.map(u => u -> (if (next.contains(u)) 1L else 0L)).toMap
    for (_ <- 1 to rounds) {
      val p2 = nodes.map(u => u -> p(p(u))).toMap
      val h2 = nodes.map(u => u -> (h(u) + h(p(u)))).toMap
      p = p2; h = h2
    }
    val terminal = nodes.filterNot(next.contains).toSet
    val rows = nodes.map { u =>
      val ok = terminal.contains(p(u))
      Row(u, if (ok) p(u) else null,
        if (ok) java.lang.Long.valueOf(h(u)) else null, ok)
    }
    val schema = StructType(Seq(
      StructField("url", keyType, nullable = true),
      StructField("terminal_url", keyType, nullable = true),
      StructField("hops", LongType, nullable = true),
      StructField("resolved", BooleanType, nullable = false)))
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)
      .orderBy(org.apache.spark.sql.functions.col("url"))
  }

  /** Crawler-TRAP detection over any (url) frame: infinite URL
    * spaces (calendars, session ids, faceted search) are the classic
    * crawler failure — the frontier balloons inside one host while
    * real coverage stalls. The detector collapses every URL to its
    * digit-template (runs of digits → N) and flags hosts whose
    * distinct-URL count is a large multiple of their distinct-
    * template count: thousands of URLs over a handful of templates
    * is a generator, not content. One scan + one keyed aggregate;
    * both distinct counts are per-host (no global distinct). */
  def detectTraps(urls: DataFrame, ratioCap: Double = 100.0): DataFrame = {
    import urls.sparkSession.implicits._
    urls
      .select($"url",
        regexp_extract($"url", "^https?://([^/]+)", 1).as("host"),
        regexp_replace($"url", "[0-9]+", "N").as("template"))
      .groupBy($"host")
      .agg(countDistinct($"url").as("n_urls"),
           countDistinct($"template").as("n_templates"))
      .select($"host", $"n_urls", $"n_templates",
        round($"n_urls".cast("double") / $"n_templates", 4).as("urls_per_template"))
      .withColumn("is_trap", $"urls_per_template" > ratioCap)
      .orderBy($"host")
  }

  /** c22: trap detection over a deterministic synthesized crawl log:
    * one host is a calendar-style generator (every event mints a new
    * URL under one template), the others serve bounded catalogs; the
    * oracle replays the template collapse. */
  def c22TrapDetect(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val urls = Tables.events(spark, dir)
      .select(when(pmod($"event_id", lit(4)) === 0,
          concat(lit("https://h0.example/cal/"), $"event_id".cast("string")))
        .otherwise(concat(lit("https://h"), pmod($"event_id", lit(4)).cast("string"),
          lit(".example/page/"), pmod($"user_id", lit(20)).cast("string")))
        .as("url"))
    detectTraps(urls)
  }

  /** c20: redirect resolution over a deterministic synthesized
    * redirect graph — down-chains of up to 7 hops ending at
    * multiples of 8, plus a planted 3-cycle that must come back
    * flagged unresolved; the oracle walks the same chains with a
    * recursive CTE. */
  def c20RedirectResolve(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val chain = Tables.events(spark, dir)
      .select(pmod($"event_id", lit(200)).cast("long").as("u"))
      .distinct()
      .filter(pmod($"u", lit(8)) =!= 0)
      .select($"u".as("src"), ($"u" - 1L).as("dst"))
    val cycle = Seq((201L, 202L), (202L, 203L), (203L, 201L))
      .toDF("src", "dst")
    resolveRedirects(chain.union(cycle), rounds = 3)
  }

  /** One unrolled PageRank iteration as DuckDB CTEs — the same
    * integer update [[pageRankOf]] runs, stage for stage. */
  /** The full c15 fixed-point PageRank as WITH-body CTEs ending at
    * `r3` — shared with c17's frontier-priority oracle so the two
    * rank computations can't drift. */
  private[operators] lazy val pageRankCtesSql: String =
    s"""edges AS (
       |  SELECT src, CAST(unnest([(src*7+3) % 50, (src*3+1) % 50]) AS BIGINT) AS dst
       |  FROM (SELECT DISTINCT CAST(event_id % 50 AS BIGINT) AS src FROM events)),
       |nodes AS (
       |  SELECT DISTINCT url
       |  FROM (SELECT src AS url FROM edges UNION ALL SELECT dst FROM edges)),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |outdeg AS (SELECT src, count(*) AS odeg FROM edges GROUP BY src),
       |r0 AS (SELECT url, 1000000000000 // nn.n AS r FROM nodes, nn),
       |${(1 to 3).map(prIterSql).mkString(",\n")}""".stripMargin

  private def prIterSql(i: Int): String =
    s"""c$i AS (
       |  SELECT e.dst AS url, sum((p.r * 85) // (o.odeg * 100)) AS cin
       |  FROM r${i - 1} p
       |  JOIN outdeg o ON p.url = o.src
       |  JOIN edges e ON e.src = p.url
       |  GROUP BY e.dst),
       |d$i AS (
       |  SELECT coalesce(sum(p.r), 0) AS dm
       |  FROM r${i - 1} p LEFT JOIN outdeg o ON p.url = o.src
       |  WHERE o.odeg IS NULL),
       |r$i AS (
       |  SELECT nodes.url,
       |    (15 * 1000000000000) // (100 * nn.n)
       |      + coalesce(c.cin, 0)
       |      + (d.dm * 85) // (100 * nn.n) AS r
       |  FROM nodes
       |  CROSS JOIN nn
       |  CROSS JOIN d$i d
       |  LEFT JOIN c$i c ON c.url = nodes.url)""".stripMargin

  /** Shared chunker-lite expectation CTEs (parts + chunks), reused by
    * the c2 and f1 oracles so the corpora can't drift apart. */
  private[operators] val chunkLiteSql: String =
    """parts AS (
      |  SELECT doc_id, doc_id % 3 AS v,
      |    CASE WHEN doc_id % 3 = 2
      |      THEN 'This swagger endpoint spec for document D' || doc_id || ' describes the public api surface and methods.'
      |      ELSE 'Overview of document D' || doc_id || ' from ' || source || ' explaining the ingestion design in plain words.'
      |    END AS prose_a,
      |    CASE doc_id % 3
      |      WHEN 0 THEN 'def handler_' || doc_id || '(x):' || chr(10) || '    return x + ' || (doc_id % 10)
      |      WHEN 1 THEN 'name: doc-' || doc_id || chr(10) || 'replicas: ' || (doc_id % 5)
      |      ELSE 'echo build-' || doc_id END AS code,
      |    CASE doc_id % 3 WHEN 0 THEN 'python' WHEN 1 THEN 'yaml' ELSE 'bash' END AS lang,
      |    'Closing remarks for document D' || doc_id || ' with enough words to pass the noise floor easily.' AS prose_b
      |  FROM documents),
      |chunks AS (
      |  SELECT doc_id, 0 AS chunk_index, prose_a AS content,
      |    CASE WHEN v = 2 THEN 'api' ELSE 'prose' END AS chunk_type, '' AS language
      |  FROM parts
      |  UNION ALL
      |  SELECT doc_id, 1, '```' || lang || chr(10) || code || chr(10) || '```',
      |    CASE v WHEN 0 THEN 'code' WHEN 1 THEN 'config' ELSE 'cmd' END, lang
      |  FROM parts
      |  UNION ALL
      |  SELECT doc_id, 2, prose_b, 'prose', '' FROM parts WHERE v = 0)""".stripMargin

  val oracles: Map[String, String] = Map(
    // same synth, same digit-template collapse, same per-host ratio
    "c22_trap_detect" ->
      """WITH u AS (
        |  SELECT CASE WHEN event_id % 4 = 0
        |    THEN 'https://h0.example/cal/' || event_id
        |    ELSE 'https://h' || (event_id % 4) || '.example/page/' || (user_id % 20)
        |    END AS url
        |  FROM events),
        |t AS (
        |  SELECT url,
        |    regexp_extract(url, '^https?://([^/]+)', 1) AS host,
        |    regexp_replace(url, '[0-9]+', 'N', 'g') AS template
        |  FROM u),
        |agg AS (
        |  SELECT host,
        |    CAST(count(DISTINCT url) AS BIGINT) AS n_urls,
        |    CAST(count(DISTINCT template) AS BIGINT) AS n_templates
        |  FROM t GROUP BY host)
        |SELECT host, n_urls, n_templates,
        |  round(CAST(n_urls AS DOUBLE) / n_templates, 4) AS urls_per_template,
        |  round(CAST(n_urls AS DOUBLE) / n_templates, 4) > 100.0 AS is_trap
        |FROM agg
        |ORDER BY host""".stripMargin,
    // the same chains walked one hop per recursion step; terminal =
    // no outgoing edge; loop nodes never reach one inside the bound
    "c20_redirect_resolve" ->
      """WITH RECURSIVE
        |us AS (SELECT DISTINCT CAST(event_id % 200 AS BIGINT) AS u FROM events),
        |edges AS (
        |  SELECT u AS src, u - 1 AS dst FROM us WHERE u % 8 <> 0
        |  UNION ALL
        |  SELECT CAST(201 AS BIGINT), CAST(202 AS BIGINT)
        |  UNION ALL
        |  SELECT CAST(202 AS BIGINT), CAST(203 AS BIGINT)
        |  UNION ALL
        |  SELECT CAST(203 AS BIGINT), CAST(201 AS BIGINT)),
        |nodes AS (
        |  -- explicit DISTINCT: under WITH RECURSIVE DuckDB gives a
        |  -- bare UNION recursive-union semantics and skips the dedup
        |  SELECT DISTINCT url FROM (
        |    SELECT src AS url FROM edges
        |    UNION ALL SELECT dst FROM edges)),
        |w(url, cur, hops) AS (
        |  SELECT url, url, CAST(0 AS BIGINT) FROM nodes
        |  UNION ALL
        |  SELECT w.url, e.dst, w.hops + 1
        |  FROM w JOIN edges e ON e.src = w.cur
        |  WHERE w.hops < 8),
        |term AS (
        |  SELECT url FROM nodes
        |  WHERE url NOT IN (SELECT src FROM edges)),
        |res AS (
        |  SELECT url, cur AS terminal_url, hops FROM w
        |  WHERE cur IN (SELECT url FROM term))
        |SELECT n.url, r.terminal_url, r.hops,
        |  r.url IS NOT NULL AS resolved
        |FROM nodes n LEFT JOIN res r ON r.url = n.url
        |ORDER BY n.url""".stripMargin,
    "c2_chunk_markdown" ->
      s"""WITH $chunkLiteSql
        |SELECT doc_id, CAST(chunk_index AS INTEGER) AS chunk_index, md5(content) AS content_md5,
        |  chunk_type, language, CAST(length(content) AS BIGINT) AS n_chars
        |FROM chunks
        |ORDER BY doc_id, chunk_index""".stripMargin,
    "c3_noise_filter" ->
      """SELECT doc_id,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN 3 ELSE 2 END AS BIGINT) AS kept_chunks
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "c1_clean_markdown" ->
      """SELECT doc_id,
        | md5(regexp_replace(regexp_replace(text,
        |   '(?mi)^\[edit[^\]]*\]\([^\)]+\)\s*$', '', 'g'),
        |   '(?mi)^#{1,3}\s+(?:table of )?contents?\s*\n(?:\s*[-*]\s*\[.*?\]\(#.*?\)\s*\n)*', '', 'g')) AS cleaned_md5
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "c4_contextual_string" ->
      """SELECT doc_id,
        | md5('Documentation: ' || source || chr(10) || 'Title: doc-' || doc_id
        |   || chr(10) || 'Section: ' || lang || chr(10) || '---' || chr(10) || text) AS ctx_md5
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "c6_chunks_by_url" ->
      """SELECT doc_id, source, md5(text) AS content_md5, n_chars
        |FROM documents
        |WHERE source = 'src3'
        |ORDER BY doc_id""".stripMargin,
    "c7_corpus_stats" ->
      """SELECT (SELECT count(DISTINCT source) FROM documents) AS sources,
        |       (SELECT count(*) FROM documents) AS documents,
        |       (SELECT count(*) FROM embeddings) AS vectors""".stripMargin,
    "c8_delete_by_source" ->
      """SELECT source, count(*) AS n_docs
        |FROM documents
        |WHERE source NOT IN ('src0', 'src1')
        |GROUP BY source
        |ORDER BY source""".stripMargin,
    "c9_link_discovery" ->
      """WITH links AS (
        |  SELECT 'https://host' || (user_id % 3) || '.example.com/page/' || (event_id % 50)
        |     || CASE WHEN event_id % 7 = 0 THEN '#frag' ELSE '' END AS link
        |  FROM events)
        |SELECT DISTINCT regexp_replace(link, '#.*$', '') AS url, CAST(2 AS BIGINT) AS depth
        |FROM links
        |WHERE regexp_extract(regexp_replace(link, '#.*$', ''), '^(https?)://([^/]+)', 2) = 'host0.example.com'
        |  AND NOT regexp_matches(regexp_replace(link, '#.*$', ''), '/page/1[0-9]$')
        |ORDER BY url""".stripMargin,
    "c5_embed_chunks" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS tok FROM documents),
        |h AS (
        |  SELECT doc_id, list_transform(tok, t ->
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(generate_series(1, length(t)),
        |        i -> CAST(ascii(substring(t, i, 1)) AS BIGINT))),
        |      (a, c) -> (a*31 + c) % 1000000007)) AS hs
        |  FROM d WHERE len(tok) > 0),
        |r AS (
        |  SELECT doc_id, list_transform(generate_series(0, 63), b ->
        |    CAST(len(list_filter(hs, x -> x % 64 = b)) AS DOUBLE)) AS raw
        |  FROM h),
        |n AS (
        |  SELECT doc_id, raw,
        |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(raw, x -> x*x)), (s, x) -> s+x)) AS nrm
        |  FROM r)
        |SELECT doc_id, CAST(b - 1 AS INTEGER) AS pos, round(raw[b]/nrm, 6) AS val
        |FROM n, LATERAL unnest(generate_series(1, 64)) AS t(b)
        |ORDER BY doc_id, pos""".stripMargin,
    "c11_sitemap_parse" ->
      """WITH pieces AS (
        |  SELECT event_id // 10 AS sm_id, event_id,
        |    '<url><loc>https://host' || (user_id % 3) || '.example.com/page/'
        |      || (event_id % 50) || '</loc></url>' AS piece
        |  FROM events),
        |sitemaps AS (
        |  SELECT sm_id,
        |    '<urlset>' || string_agg(piece, '' ORDER BY event_id) || '</urlset>' AS xml
        |  FROM pieces GROUP BY sm_id),
        |locs AS (
        |  SELECT sm_id, unnest(regexp_extract_all(xml, '<loc>\s*(.*?)\s*</loc>', 1)) AS loc
        |  FROM sitemaps)
        |SELECT DISTINCT sm_id, loc
        |FROM locs
        |WHERE regexp_extract(loc, '^https?://([^/]+)', 1) = 'host0.example.com'
        |ORDER BY sm_id, loc""".stripMargin,
    "c12_sitemap_index" ->
      """WITH pieces AS (
        |  SELECT event_id // 10 AS sm_id, event_id,
        |    '<url><loc>https://host' || (user_id % 3) || '.example.com/page/'
        |      || (event_id % 50) || '</loc></url>' AS piece
        |  FROM events),
        |subs AS (
        |  SELECT 'https://host0.example.com/sitemap/' || sm_id || '.xml' AS url,
        |    '<urlset>' || string_agg(piece, '' ORDER BY event_id) || '</urlset>' AS xml
        |  FROM pieces GROUP BY sm_id),
        |idx AS (
        |  SELECT 'https://host0.example.com/index/' || (sm_id // 50) || '.xml' AS url,
        |    '<sitemapindex>' || string_agg(
        |      '<sitemap><loc>https://host0.example.com/sitemap/' || sm_id || '.xml</loc></sitemap>',
        |      '' ORDER BY sm_id) || '</sitemapindex>' AS xml
        |  FROM (SELECT DISTINCT sm_id FROM pieces) GROUP BY sm_id // 50),
        |root AS (
        |  SELECT '<sitemapindex>' || string_agg(
        |      '<sitemap><loc>https://host0.example.com/index/' || idx_id || '.xml</loc></sitemap>',
        |      '' ORDER BY idx_id)
        |    || '<sitemap><loc>https://host0.example.com/chain/1.xml</loc></sitemap>'
        |    || '</sitemapindex>' AS xml
        |  FROM (SELECT DISTINCT sm_id // 50 AS idx_id FROM pieces)),
        |d1 AS (
        |  SELECT unnest(regexp_extract_all(xml, '<loc>\s*(.*?)\s*</loc>', 1)) AS url
        |  FROM root),
        |d2 AS (
        |  SELECT unnest(regexp_extract_all(i.xml, '<loc>\s*(.*?)\s*</loc>', 1)) AS url
        |  FROM d1 JOIN idx i USING (url)),
        |d3 AS (
        |  SELECT unnest(regexp_extract_all(s.xml, '<loc>\s*(.*?)\s*</loc>', 1)) AS loc
        |  FROM d2 JOIN subs s USING (url))
        |SELECT DISTINCT loc AS url FROM d3
        |WHERE regexp_extract(loc, '^https?://([^/]+)', 1) = 'host0.example.com'
        |ORDER BY url""".stripMargin,
    // the same fixed-point update, stage for stage: int64 ranks,
    // ×85 // 100 damping, dangling redistribution, 3 unrolled rounds
    "c15_pagerank" ->
      s"""WITH $pageRankCtesSql
         |-- CAST: the iterated sum() widens r to HUGEINT, which pandas
         |-- turns into float64 and the driver hash then diverges
         |SELECT url, CAST(r AS BIGINT) AS rank_e12,
         |  round(CAST(r AS DOUBLE) / 1e12, 8) AS rank
         |FROM r3
         |ORDER BY rank_e12 DESC, url""".stripMargin,
    "c10_crawl_bfs" ->
      """WITH RECURSIVE edges AS (
        |  SELECT src, CAST(unnest([(src*7+3) % 50, (src*3+1) % 50]) AS BIGINT) AS dst
        |  FROM (SELECT DISTINCT CAST(event_id % 50 AS BIGINT) AS src FROM events)),
        |reach(url, depth) AS (
        |  SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)
        |  UNION ALL
        |  SELECT e.dst, r.depth + 1
        |  FROM reach r JOIN edges e ON e.src = r.url
        |  WHERE r.depth < 4)
        |SELECT url, CAST(min(depth) AS BIGINT) AS depth
        |FROM reach GROUP BY url
        |ORDER BY url""".stripMargin)
}
