package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Web-crawl metadata extraction — the DataFrame re-expression of
  * extract_web_metadata (apps/ingestion-worker/handlers/web.py:
  * 138-180), the path that makes llms.txt manifests work: markdown
  * links `[text](href)` are regex-extracted from the RAW markdown
  * (the manifest is a markdown link list), relative hrefs resolve
  * against the page URL, only same-domain links survive, and the
  * set is dedup'd. Title = first `# ` heading; path = breadcrumb
  * join of the URL segments. All column expressions — one narrow
  * map pass over the fetched-page table, no UDFs.
  *
  * WebMetaReferenceParitySpec replicates the reference's
  * test_metadata_extraction.py web table against these columns.
  */
object WebMeta {

  /** Markdown link hrefs, in document order (may repeat). */
  def markdownLinks(md: Column): Column =
    regexp_extract_all(md, lit("\\[.*?\\]\\((.*?)\\)"), lit(1))

  /** First `# ` heading, trimmed; '' when absent (web.py:170-174). */
  def firstHeading(md: Column): Column =
    trim(regexp_extract(md, "(?m)^#\\s+(.+)$", 1))

  /** Breadcrumb path: non-empty URL path segments joined " > ". */
  def breadcrumbs(url: Column): Column =
    concat_ws(" > ",
      filter(split(regexp_replace(url, "^https?://[^/]+", ""), "/"),
             s => s =!= ""))

  /** Resolve a markdown href against the page URL — the urljoin
    * cases real crawls hit (web.py:161 urljoin): absolute stays,
    * protocol-relative '//host/path' takes the page's scheme only,
    * root-relative joins scheme+host, relative joins the page
    * directory (a path-less page URL behaves as if it ended in '/'),
    * and '.'/'..' segments in the joined path are collapsed.
    * Supported subset: http(s) URLs without query/fragment — the
    * manifest link shapes; mailto:/data:/etc. fall through the
    * relative branch and then fail the sameHost filter. */
  def resolveUrl(pageUrl: Column, link: Column): Column = {
    val scheme = regexp_extract(pageUrl, "^(https?)://", 1)
    val base = regexp_extract(pageUrl, "^(https?://[^/]+)", 1)
    val dir = when(pageUrl.rlike("^https?://[^/]*$"), concat(pageUrl, lit("/")))
      .otherwise(regexp_replace(pageUrl, "[^/]*$", ""))
    val joined = when(link.rlike("^https?://"), link)
      .when(link.startsWith("//"), concat(scheme, lit(":"), link))
      .when(link.startsWith("/"), concat(base, link))
      .otherwise(concat(dir, link))
    normalizeDotSegments(joined)
  }

  /** RFC 3986 §5.2.4 dot-segment removal over the path of an
    * absolute http(s) URL, as codegen column expressions: '.'
    * segments collapse in one regex pass; '..' segments collapse via
    * a fixed 8-pass unroll (one parent level per pass — deeper
    * traversal chains than 8 stay partially normalized, documented
    * bound). Excess leading '..' clamps at the root like urljoin;
    * trailing '.'/'..' keep the directory slash like the RFC. */
  private[operators] def normalizeDotSegments(url: Column): Column = {
    val head = regexp_extract(url, "^(https?://[^/]+)", 1)
    var path = regexp_replace(url, "^https?://[^/]+", "")
    path = regexp_replace(path, "(/\\.\\.|/\\.)$", "$1/")
    path = regexp_replace(path, "/\\.(?=/)", "")
    for (_ <- 1 to 8)
      path = regexp_replace(path,
        "^/\\.\\.(?=/)|/(?!\\.\\.(?:/|$))[^/]+/\\.\\.(?=/)", "")
    concat(head, path)
  }

  /** Same-registrable-host check against the page's own host. */
  def sameHost(pageUrl: Column, url: Column): Column =
    regexp_extract(url, "^https?://([^/]+)", 1) ===
      regexp_extract(pageUrl, "^https?://([^/]+)", 1)

  /** c13: title/path/internal-link extraction over a synthesized
    * fetched-page corpus (markdown with a heading, one relative
    * manifest-style link, and one external link per page). */
  def c13WebMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val id = $"doc_id".cast("string")
    val pages = Tables.documents(spark, dir).select($"doc_id",
      concat(lit("https://host0.example.com/docs/sec"),
             pmod($"doc_id", lit(5)).cast("string"),
             lit("/page"), id).as("url"),
      concat(lit("# Guide D"), id, lit("\n"),
             lit("[next](page"), id, lit("-next) "),
             lit("[root](/top"), id, lit(") "),
             lit("[ext](https://other-domain.com/x"), id, lit(")\n"),
             lit("body text for document "), id).as("md"))
    pages
      .select($"doc_id", $"url", firstHeading($"md").as("title"),
        breadcrumbs($"url").as("path"),
        explode(markdownLinks($"md")).as("link"))
      .select($"doc_id", $"title", $"path",
        resolveUrl($"url", $"link").as("resolved"), $"url")
      .filter(sameHost($"url", $"resolved"))
      .groupBy($"doc_id", $"title", $"path")
      .agg(sort_array(collect_set($"resolved")).as("links"))
      .select($"doc_id", $"title", $"path",
        size($"links").cast("long").as("n_internal"),
        concat_ws("|", $"links").as("links_joined"))
      .orderBy($"doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c13_web_meta" -> c13WebMeta _)

  val oracles: Map[String, String] = Map(
    "c13_web_meta" ->
      """WITH pages AS (
        |  SELECT doc_id,
        |    'https://host0.example.com/docs/sec' || (doc_id % 5) || '/page' || doc_id AS url,
        |    '# Guide D' || doc_id || chr(10)
        |      || '[next](page' || doc_id || '-next) '
        |      || '[root](/top' || doc_id || ') '
        |      || '[ext](https://other-domain.com/x' || doc_id || ')' || chr(10)
        |      || 'body text for document ' || doc_id AS md
        |  FROM documents),
        |linked AS (
        |  SELECT doc_id, url,
        |    trim(regexp_extract(md, '(?m)^#\s+(.+)$', 1)) AS title,
        |    array_to_string(list_filter(
        |      string_split(regexp_replace(url, '^https?://[^/]+', ''), '/'),
        |      s -> s <> ''), ' > ') AS path,
        |    unnest(regexp_extract_all(md, '\[.*?\]\((.*?)\)', 1)) AS link
        |  FROM pages),
        |resolved AS (
        |  SELECT doc_id, title, path, url,
        |    CASE WHEN regexp_matches(link, '^https?://') THEN link
        |         WHEN link LIKE '/%'
        |           THEN regexp_extract(url, '^(https?://[^/]+)', 1) || link
        |         ELSE regexp_replace(url, '[^/]*$', '') || link
        |    END AS r
        |  FROM linked),
        |kept AS (
        |  SELECT DISTINCT doc_id, title, path, r FROM resolved
        |  WHERE regexp_extract(r, '^https?://([^/]+)', 1)
        |      = regexp_extract(url, '^https?://([^/]+)', 1))
        |SELECT doc_id, title, path,
        |  CAST(count(*) AS BIGINT) AS n_internal,
        |  string_agg(r, '|' ORDER BY r) AS links_joined
        |FROM kept
        |GROUP BY doc_id, title, path
        |ORDER BY doc_id""".stripMargin)
}
