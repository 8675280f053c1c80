package graft

import graft.operators.LinkDiscovery

/** The reference's DiscoverLinks table test, re-asserted against the
  * Dataset operator (reference: apps/backend/internal/worker/
  * link_discovery_test.go TestDiscoverLinks_Comprehensive). Output
  * order is compared as a set — the reference preserves input order,
  * a distributed dedup doesn't. */
class LinkDiscoveryParitySpec extends SparkSpec {

  private def run(links: Seq[String], currentDepth: Int = 0, maxDepth: Int = 5,
                  exclusions: Seq[String] = Nil): Seq[(String, String, String, Int)] = {
    val sparkSession = spark
    import sparkSession.implicits._
    LinkDiscovery.discover(links.toDS(), "src1", "example.com",
        currentDepth, maxDepth, exclusions)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getInt(3)))
      .toSeq.sortBy(_._2)
  }

  private def urls(rows: Seq[(String, String, String, Int)]): Set[String] =
    rows.map(_._2).toSet

  test("basic positive: same-host links pass with depth+1 and pending status") {
    val got = run(Seq("https://example.com/foo", "https://example.com/bar"))
    assert(urls(got) == Set("https://example.com/foo", "https://example.com/bar"))
    got.foreach { case (sid, _, status, depth) =>
      assert(sid == "src1" && status == "pending" && depth == 1)
    }
  }

  test("max depth reached yields nothing") {
    assert(run(Seq("https://example.com/foo"), currentDepth = 5, maxDepth = 5).isEmpty)
  }

  test("external hosts ignored") {
    assert(run(Seq("https://google.com", "https://other.com/foo")).isEmpty)
  }

  test("subdomain mismatch (strict host equality)") {
    assert(run(Seq("https://api.example.com/foo")).isEmpty)
  }

  test("fragments stripped") {
    val got = run(Seq("https://example.com/foo#section1", "https://example.com/bar#top"))
    assert(urls(got) == Set("https://example.com/foo", "https://example.com/bar"))
  }

  test("exclusion patterns filter normalized urls") {
    val got = run(Seq("https://example.com/valid", "https://example.com/exclude/me"),
                  exclusions = Seq(".*exclude.*"))
    assert(urls(got) == Set("https://example.com/valid"))
  }

  test("exact duplicates dedup") {
    val got = run(Seq("https://example.com/foo", "https://example.com/foo"))
    assert(got.length == 1)
  }

  test("duplicates via fragment normalization dedup") {
    val got = run(Seq("https://example.com/foo", "https://example.com/foo#frag"))
    assert(got.length == 1 && urls(got) == Set("https://example.com/foo"))
  }

  test("non-http(s) schemes ignored") {
    assert(run(Seq("mailto:user@example.com", "tel:1234567890",
                   "javascript:alert(1)", "ftp://example.com/file")).isEmpty)
  }

  test("malformed urls ignored") {
    assert(run(Seq("://bad-url", "   ", "")).isEmpty)
  }

  test("unicode paths percent-encoded like Go url.String()") {
    val got = run(Seq("https://example.com/café", "https://example.com/über"))
    assert(urls(got) == Set("https://example.com/caf%C3%A9",
                            "https://example.com/%C3%BCber"))
  }

  test("query parameters preserved") {
    val got = run(Seq("https://example.com/search?q=foo"))
    assert(urls(got) == Set("https://example.com/search?q=foo"))
  }

  test("port mismatch excluded (host compared verbatim)") {
    assert(run(Seq("https://example.com:8080/foo")).isEmpty)
  }

  test("existing escapes preserved, not double-encoded") {
    val got = run(Seq("https://example.com/foo%20bar"))
    assert(urls(got) == Set("https://example.com/foo%20bar"))
  }

  test("llms.txt manifests get a +1 depth allowance (ExtendedDepth parity)") {
    val sparkSession = spark
    import sparkSession.implicits._
    val links = Seq("http://example.com/doc.md").toDS()
    // result_consumer_test.go LLMsTxt_ExtendedDepth: depth 2 == max
    // depth 2 -> a normal page discovers nothing...
    val normal = LinkDiscovery.discoverFrom("http://example.com/page",
      links, "src1", "example.com", currentDepth = 2, maxDepth = 2)
    assert(normal.count() === 0)
    // ...but an llms.txt manifest still enqueues children at depth 3
    val manifest = LinkDiscovery.discoverFrom("http://example.com/llms.txt",
      links, "src1", "example.com", currentDepth = 2, maxDepth = 2)
    val rows = manifest.collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[String]("url") === "http://example.com/doc.md")
    assert(rows.head.getAs[Int]("depth") === 3)
    // and the manifest's children (depth 3 > maxDepth) stop the crawl
    val grandchild = LinkDiscovery.discoverFrom("http://example.com/doc.md",
      links, "src1", "example.com", currentDepth = 3, maxDepth = 2)
    assert(grandchild.count() === 0)
  }
}
