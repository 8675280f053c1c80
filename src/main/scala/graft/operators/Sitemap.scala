package graft.operators

import org.apache.spark.sql.DataFrame
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

  /** Resolve `rootUrl` against `docs` (url, xml). One equi-join on
    * url per depth level — at web scale `docs` is the fetch tier's
    * output table and each level is one shuffle. */
  def resolve(docs: DataFrame, rootUrl: String, baseDomain: String,
              maxDepth: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    var frontier = Seq(rootUrl).toDF("url")
    var pages = Seq.empty[String].toDF("url")
    for (_ <- 0 to maxDepth) {
      // per-level persist: each level feeds both the page union and
      // the next frontier (see c10's iterative-plan note)
      val resolved = graft.Caches.persist(frontier
        .join(docs, Seq("url"))
        .select(
          when(instr($"xml", "<sitemapindex") > 0, lit("idx"))
            .when(instr($"xml", "<urlset") > 0, lit("urlset"))
            .otherwise(lit("other")).as("kind"),
          explode(expr("regexp_extract_all(xml, '<loc>\\\\s*(.*?)\\\\s*</loc>', 1)")).as("loc")))
      pages = pages.union(resolved.filter($"kind" === "urlset").select($"loc".as("url")))
      // anything enqueued past maxDepth dies with the loop bound —
      // exactly the reference's depth > MAX check
      frontier = resolved.filter($"kind" === "idx").select($"loc".as("url")).distinct()
    }
    pages
      .filter(regexp_extract($"url", "^https?://([^/]+)", 1) === baseDomain)
      .distinct()
  }
}
