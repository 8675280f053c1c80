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
