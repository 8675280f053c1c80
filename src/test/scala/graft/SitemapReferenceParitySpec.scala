package graft

import graft.operators.Sitemap

/** Replicates the reference's sitemap-handler test table
  * (apps/ingestion-worker/tests/test_sitemap_handler.py) against the
  * DataFrame resolution: the fetch tier is modeled as the (url, xml)
  * corpus, so a URL with no row IS a 404/timeout/connection error. */
class SitemapReferenceParitySpec extends SparkSpec {

  private val root = "https://example.com/sitemap.xml"
  private val domain = "example.com"

  private def resolve(docs: Seq[(String, String)]): Set[String] = {
    import spark.implicits._
    Sitemap.resolve(docs.toDF("url", "xml"), root, domain)
      .collect().map(_.getString(0)).toSet
  }

  private val validSitemap =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      |  <url><loc>https://example.com/page1</loc></url>
      |  <url><loc>https://example.com/page2</loc></url>
      |  <url><loc>https://example.com/docs/api</loc></url>
      |</urlset>""".stripMargin

  test("standard sitemap.xml is parsed correctly") {
    assert(resolve(Seq(root -> validSitemap)) ==
      Set("https://example.com/page1", "https://example.com/page2",
          "https://example.com/docs/api"))
  }

  test("404 (no fetched row) returns empty") {
    assert(resolve(Seq("https://example.com/other.xml" -> validSitemap)).isEmpty)
  }

  test("invalid XML returns empty") {
    assert(resolve(Seq(root -> "<not-valid-xml<>></broken>")).isEmpty)
  }

  test("sitemap index resolves sub-sitemaps") {
    val docs = Seq(
      root ->
        """<?xml version="1.0" encoding="UTF-8"?>
          |<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
          |  <sitemap><loc>https://example.com/sitemap-pages.xml</loc></sitemap>
          |  <sitemap><loc>https://example.com/sitemap-docs.xml</loc></sitemap>
          |</sitemapindex>""".stripMargin,
      "https://example.com/sitemap-pages.xml" ->
        """<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
          |  <url><loc>https://example.com/about</loc></url>
          |  <url><loc>https://example.com/contact</loc></url>
          |</urlset>""".stripMargin,
      "https://example.com/sitemap-docs.xml" ->
        """<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
          |  <url><loc>https://example.com/docs/guide</loc></url>
          |</urlset>""".stripMargin)
    assert(resolve(docs) ==
      Set("https://example.com/about", "https://example.com/contact",
          "https://example.com/docs/guide"))
  }

  test("a sub-sitemap that fails to fetch contributes nothing") {
    val docs = Seq(
      root ->
        """<sitemapindex><sitemap><loc>https://example.com/ok.xml</loc></sitemap>
          |<sitemap><loc>https://example.com/gone.xml</loc></sitemap></sitemapindex>""".stripMargin,
      "https://example.com/ok.xml" ->
        "<urlset><url><loc>https://example.com/alive</loc></url></urlset>")
    assert(resolve(docs) == Set("https://example.com/alive"))
  }

  test("only same-domain URLs are returned") {
    val xml =
      """<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url><loc>https://example.com/page1</loc></url>
        |  <url><loc>https://other-domain.com/page2</loc></url>
        |  <url><loc>https://example.com/page3</loc></url>
        |</urlset>""".stripMargin
    assert(resolve(Seq(root -> xml)) ==
      Set("https://example.com/page1", "https://example.com/page3"))
  }

  test("duplicate URLs are de-duplicated") {
    val xml =
      """<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url><loc>https://example.com/page1</loc></url>
        |  <url><loc>https://example.com/page1</loc></url>
        |  <url><loc>https://example.com/page2</loc></url>
        |</urlset>""".stripMargin
    assert(resolve(Seq(root -> xml)).size == 2)
  }

  test("empty response body returns empty") {
    assert(resolve(Seq(root -> "")).isEmpty)
  }

  test("sitemaps without XML namespace still work") {
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset>
        |  <url><loc>https://example.com/no-ns-page</loc></url>
        |</urlset>""".stripMargin
    assert(resolve(Seq(root -> xml)) == Set("https://example.com/no-ns-page"))
  }

  test("index chains past MAX_SITEMAP_INDEX_DEPTH are cut") {
    def idx(n: Int) =
      s"<sitemapindex><sitemap><loc>https://example.com/c$n.xml</loc></sitemap></sitemapindex>"
    val docs = Seq(
      root -> idx(1),
      "https://example.com/c1.xml" -> idx(2),
      "https://example.com/c2.xml" -> idx(3),
      "https://example.com/c3.xml" -> idx(4),
      "https://example.com/c4.xml" ->
        "<urlset><url><loc>https://example.com/too-deep</loc></url></urlset>")
    assert(resolve(docs).isEmpty, "depth-4 urlset must be cut")
  }
}
