package graft

import org.apache.spark.sql.functions._
import graft.operators.WebMeta

/** Replicates the web half of the reference's
  * test_metadata_extraction.py table (extract_web_metadata) against
  * the WebMeta column expressions. */
class WebMetaReferenceParitySpec extends SparkSpec {

  private def meta(md: String, url: String): (String, String, Seq[String]) = {
    import spark.implicits._
    val row = Seq((md, url)).toDF("md", "url")
      .select(
        WebMeta.firstHeading($"md").as("title"),
        WebMeta.breadcrumbs($"url").as("path"),
        filter(
          transform(WebMeta.markdownLinks($"md"),
                    l => WebMeta.resolveUrl($"url", l)),
          r => WebMeta.sameHost($"url", r)).as("links"))
      .head()
    (row.getString(0), row.getString(1), row.getSeq[String](2).distinct)
  }

  test("standard markdown title and breadcrumb path") {
    val (title, path, _) = meta("# Web Title\nSome content", "http://e.com/page")
    assert(title == "Web Title")
    assert(path == "page")
  }

  test("no markdown title yields empty; nested path breadcrumbs") {
    val (title, path, links) = meta("No header here", "http://e.com/nested/path")
    assert(title == "")
    assert(path == "nested > path")
    assert(links.isEmpty)
  }

  test("markdown links extraction (llms.txt style): relative resolved, external dropped") {
    val (title, path, links) =
      meta("# Index\n[Link 1](subpage) [External](http://google.com)", "http://e.com/")
    assert(title == "Index")
    assert(path == "")
    assert(links == Seq("http://e.com/subpage"))
  }

  test("root-relative links join the host") {
    val (_, _, links) = meta("[a](/top)", "http://e.com/deep/page")
    assert(links == Seq("http://e.com/top"))
  }

  // urljoin parity cases beyond the reference table (web.py:161
  // urljoin semantics — R3 ADVICE item)
  private def resolve(page: String, link: String): String = {
    import spark.implicits._
    Seq((page, link)).toDF("page", "link")
      .select(WebMeta.resolveUrl($"page", $"link")).head().getString(0)
  }

  test("protocol-relative links take the page scheme only") {
    assert(resolve("https://e.com/a/b", "//cdn.e.com/x") == "https://cdn.e.com/x")
    assert(resolve("http://e.com/a", "//e.com/y") == "http://e.com/y")
  }

  test("path-less page URL behaves as ending in '/'") {
    assert(resolve("https://e.com", "docs") == "https://e.com/docs")
  }

  // the upstream classifier test table, replicated verbatim
  // (test_web_handlers.py:170-214, 546-563 + the classifier's match
  // order in handlers/web.py:86-119)
  test("crawl errors classify exactly like _classify_crawl_error") {
    import spark.implicits._
    val cases = Seq(
      ("Failed on navigating ACS-GOTO: Page.goto: net::ERR_TIMED_OUT at https://example.com",
       "ERR_CRAWL_TIMEOUT"),
      ("Page.goto: net::ERR_NAME_NOT_RESOLVED at https://example.com", "ERR_CRAWL_DNS"),
      ("Page.goto: net::ERR_CONNECTION_REFUSED at https://example.com", "ERR_CRAWL_REFUSED"),
      ("Page.goto: net::ERR_CONNECTION_RESET at https://example.com", "ERR_CRAWL_REFUSED"),
      ("Page.goto: net::ERR_CONNECTION_CLOSED at https://example.com", "ERR_CRAWL_REFUSED"),
      ("blocked by robots.txt", "ERR_CRAWL_BLOCKED"),
      ("403 Forbidden", "ERR_CRAWL_BLOCKED"),
      // unknown errors default to transient (timeout) for safety
      ("some unknown error", "ERR_CRAWL_TIMEOUT"),
      // match order: a timed-out CONNECTION error is a timeout first
      ("net::ERR_TIMED_OUT after ERR_CONNECTION_RESET", "ERR_CRAWL_TIMEOUT"))
    val got = cases.toDF("msg", "want")
      .select($"want", WebMeta.classifyCrawlError($"msg").as("got"))
      .collect()
    got.foreach(r => assert(r.getString(1) == r.getString(0),
      s"got ${r.getString(1)}, want ${r.getString(0)}"))
    // retryability mirrors TRANSIENT_ERRORS (exceptions.py:20)
    assert(WebMeta.TransientErrors.toSet ==
      Set("ERR_CRAWL_TIMEOUT", "ERR_CRAWL_DNS", "ERR_CRAWL_REFUSED"))
  }

  test("dot segments collapse like urljoin") {
    assert(resolve("https://e.com/a/b/c", "./x") == "https://e.com/a/b/x")
    assert(resolve("https://e.com/a/b/c", "../x") == "https://e.com/a/x")
    assert(resolve("https://e.com/a/b/c/d", "../../x") == "https://e.com/a/x")
    assert(resolve("https://e.com/a/b", "../../../x") == "https://e.com/x")
    assert(resolve("https://e.com/a/b/", ".") == "https://e.com/a/b/")
    assert(resolve("https://e.com/a/b/c", "..") == "https://e.com/a/")
    assert(resolve("https://e.com/a/", "x/./y/../z") == "https://e.com/a/x/z")
  }
}
