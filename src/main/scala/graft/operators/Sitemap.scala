package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sitemap resolution over a fetched-sitemap table — the DataFrame
  * re-expression of the ingestion worker's sitemap handler
  * (apps/ingestion-worker/handlers/sitemap.py:226-306
  * _resolve_sitemap / fetch_sitemap_urls_with_index):
  *
  *  - `<sitemapindex>` roots enqueue their sub-sitemap `<loc>`s at
  *    depth+1, cut past maxDepth (MAX_SITEMAP_INDEX_DEPTH = 3,
  *    sitemap.py:22);
  *  - `<urlset>` roots yield page `<loc>`s filtered to the crawl
  *    domain;
  *  - any other root — including unparseable XML — yields nothing
  *    (the reference's ParseError / unknown-tag fallback);
  *  - URLs a fetch failed for (404 / timeout / connection error)
  *    simply have no row in `docs`, so the frontier join drops them:
  *    the same graceful-[] behavior;
  *  - the final URL set is dedup'd.
  *
  * SitemapReferenceParitySpec replicates the reference's
  * test_sitemap_handler.py table against this resolution.
  */
object Sitemap {

  /** Root-element kind, anchored to the FIRST element after an
    * optional XML prolog — the column twin of ElementTree's
    * root.tag check (sitemap.py:277). A mere substring test would
    * misroute a urlset whose loc text contains the literal
    * '<sitemapindex'. Supported prefix subset: whitespace + one
    * `<?...?>` prolog (the reference's parser also accepts comments;
    * fetched sitemaps in the wild lead with the prolog or the root). */
  private[operators] def rootKind(xml: Column): Column = {
    val tag = regexp_extract(xml,
      "^\\s*(?:<\\?[^>]*\\?>)?\\s*<(urlset|sitemapindex)[\\s>]", 1)
    when(tag === "sitemapindex", lit("idx"))
      .when(tag === "urlset", lit("urlset"))
      .otherwise(lit("other"))
  }

  /** Minimal XML entity decode for extracted `<loc>` text — the
    * predefined five ElementTree decodes (sitemap.py parses real XML,
    * so a loc written '&amp;' arrives as '&'). '&amp;' is decoded
    * LAST so '&amp;lt;' round-trips to '&lt;' like a real parser. */
  private[operators] def decodeEntities(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      c, lit("&lt;"), lit("<")), lit("&gt;"), lit(">")),
      lit("&quot;"), lit("\"")), lit("&apos;"), lit("'")),
      lit("&amp;"), lit("&"))

  /** Resolve `rootUrl` against `docs` (url, xml). One equi-join on
    * url per depth level — at web scale `docs` is the fetch tier's
    * output table and each level is one shuffle. The loop exits as
    * soon as the frontier drains (a shallow site pays for its real
    * depth, not maxDepth; the emptiness probe reads the already-
    * persisted level, so it costs one cheap action, while a dead
    * level would cost a join + persist + scheduling round-trip). */
  def resolve(docs0: DataFrame, rootUrl: String, baseDomain: String,
              maxDepth: Int = 3, driverLimit: Long = 100000L): DataFrame = {
    val spark = docs0.sparkSession
    import spark.implicits._
    // size-adaptive (the pageRankOf/crawlBfsOf discipline): each
    // recursion level pays a join + persist + drain probe of fixed
    // overhead — below the doc-count gate the identical frontier walk
    // runs driver-local over the collected (url, xml) table with the
    // same regexes and the same per-level set semantics (bit-equal —
    // pinned by spec). A fetched-sitemap table is metadata-sized even
    // for large crawls; the distributed path remains for the rest.
    val docs = graft.Caches.persist(docs0)
    if (docs.count() <= driverLimit)
      return resolveLocal(docs, rootUrl, baseDomain, maxDepth)
    var frontier = Seq(rootUrl).toDF("url")
    var pages = Seq.empty[String].toDF("url")
    var depth = 0
    var drained = false
    while (depth <= maxDepth && !drained) {
      // per-level persist: each level feeds the page union, the next
      // frontier, and the drain probe (see c10's iterative-plan note)
      val resolved = graft.Caches.persist(frontier
        .join(docs, Seq("url"))
        .select(rootKind($"xml").as("kind"),
          // generator must sit at the top level of its projection;
          // the entity decode happens in the next select
          explode(expr(
            "regexp_extract_all(xml, '<loc>\\\\s*(.*?)\\\\s*</loc>', 1)")).as("rawloc"))
        .select($"kind", decodeEntities($"rawloc").as("loc")))
      pages = pages.union(resolved.filter($"kind" === "urlset").select($"loc".as("url")))
      // anything enqueued past maxDepth dies with the loop bound —
      // exactly the reference's depth > MAX check
      frontier = resolved.filter($"kind" === "idx").select($"loc".as("url")).distinct()
      drained = resolved.filter($"kind" === "idx").isEmpty
      depth += 1
    }
    pages
      .filter(regexp_extract($"url", "^https?://([^/]+)", 1) === baseDomain)
      .distinct()
  }

  /** Driver-local twin of the distributed frontier walk above — the
    * same root-kind anchor, loc regex, entity decode order, per-level
    * idx dedup, and depth cut, so the resolved URL set is bit-equal. */
  private def resolveLocal(docs: DataFrame, rootUrl: String,
                           baseDomain: String, maxDepth: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val byUrl = docs.select($"url", $"xml").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val kindRe = java.util.regex.Pattern.compile(
      "^\\s*(?:<\\?[^>]*\\?>)?\\s*<(urlset|sitemapindex)[\\s>]")
    val locRe = java.util.regex.Pattern.compile("<loc>\\s*(.*?)\\s*</loc>")
    val hostRe = java.util.regex.Pattern.compile("^https?://([^/]+)")
    def decode(s: String): String = s
      .replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&apos;", "'")
      .replace("&amp;", "&")
    def locsOf(xml: String): Seq[String] = {
      val m = locRe.matcher(xml)
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      while (m.find()) out += decode(m.group(1))
      out.toSeq
    }
    val pages = scala.collection.mutable.ArrayBuffer.empty[String]
    var frontier = Seq(rootUrl)
    var depth = 0
    var drained = false
    while (depth <= maxDepth && !drained) {
      val resolved = frontier.flatMap(u => byUrl.get(u).toSeq).map { xml =>
        val km = kindRe.matcher(xml)
        val kind =
          if (km.find()) (if (km.group(1) == "sitemapindex") "idx" else "urlset")
          else "other"
        (kind, locsOf(xml))
      }
      pages ++= resolved.filter(_._1 == "urlset").flatMap(_._2)
      frontier = resolved.filter(_._1 == "idx").flatMap(_._2).distinct
      drained = frontier.isEmpty
      depth += 1
    }
    pages.toSeq
      .filter { u =>
        val m = hostRe.matcher(u)
        m.find() && m.group(1) == baseDomain && m.start() == 0
      }
      .distinct
      .toDF("url")
  }
}
