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

  /** The reference's crawl-failure classifier as a codegen CASE
    * chain (handlers/web.py:86-119 _classify_crawl_error): match
    * order is semantic — timeouts first, DNS, the connection-error
    * family, robots/blocked/forbidden, and UNKNOWN DEFAULTS TO
    * TIMEOUT so unrecognized failures stay retryable rather than
    * being dropped (the reference's explicit safety default). */
  def classifyCrawlError(msg: Column): Column = {
    val u = upper(msg)
    val refused = Seq("ERR_CONNECTION_REFUSED", "ERR_CONNECTION_RESET",
      "ERR_CONNECTION_CLOSED", "ECONNREFUSED", "ECONNRESET")
    when(u.contains("TIMED_OUT") || u.contains("TIMEOUT"), "ERR_CRAWL_TIMEOUT")
      .when(u.contains("ERR_NAME_NOT_RESOLVED") || u.contains("DNS"), "ERR_CRAWL_DNS")
      .when(refused.map(k => u.contains(k)).reduce(_ || _), "ERR_CRAWL_REFUSED")
      .when(u.contains("ROBOTS") || u.contains("BLOCKED") || u.contains("FORBIDDEN"),
            "ERR_CRAWL_BLOCKED")
      .otherwise("ERR_CRAWL_TIMEOUT")
  }

  /** Transient codes eligible for automatic retry
    * (exceptions.py:20 TRANSIENT_ERRORS) — everything but BLOCKED,
    * which is permanent (robots.txt does not change on retry). */
  val TransientErrors: Seq[String] =
    Seq("ERR_CRAWL_TIMEOUT", "ERR_CRAWL_DNS", "ERR_CRAWL_REFUSED")

  /** The real Playwright/Chromium failure strings the upstream test
    * suite classifies (test_web_handlers.py:170-563), cycled per doc. */
  private[graft] val ErrorTemplates: Seq[String] = Seq(
    "Failed on navigating ACS-GOTO: Page.goto: net::ERR_TIMED_OUT at https://example.com",
    "Page.goto: net::ERR_NAME_NOT_RESOLVED at https://example.com",
    "Page.goto: net::ERR_CONNECTION_REFUSED at https://example.com",
    "Page.goto: net::ERR_CONNECTION_RESET at https://example.com",
    "Page.goto: net::ERR_CONNECTION_CLOSED at https://example.com",
    "blocked by robots.txt",
    "403 Forbidden",
    "some unknown error")

  /** c14: crawl-failure triage over a synthesized failed-fetch log —
    * classify every failure into the reference taxonomy and flag
    * retry eligibility; the retry/drop split is the decision a crawl
    * scheduler runs over millions of failed fetches per day. One
    * narrow map pass, no shuffle until the final presentation sort. */
  def c14CrawlErrors(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val msgArr = array(ErrorTemplates.map(lit): _*)
    Tables.documents(spark, dir)
      .select($"doc_id",
        element_at(msgArr, (pmod($"doc_id", lit(8)) + 1).cast("int")).as("err_msg"))
      .withColumn("err_code", classifyCrawlError($"err_msg"))
      .withColumn("retryable", $"err_code".isin(TransientErrors: _*))
      .select($"doc_id", $"err_code", $"retryable")
      .orderBy($"doc_id")
  }

  /** Generic body-hash CHANGE DETECTION over (key, body_hash) frames
    * — the CDC classify every incremental crawl runs before its
    * expensive stages: full outer join of the fresh fetch batch
    * against the stored per-page hashes (UpdateBodyHash's table,
    * result_consumer.go:196-198) → unchanged / changed / new /
    * deleted. Only changed ∪ new proceed to chunk+embed; at 100 TB
    * that skip IS the pipeline's economics. One equi-join on the
    * page key, no content moves — hashes only. */
  def changeDetect(fresh: DataFrame, stored: DataFrame): DataFrame = {
    import fresh.sparkSession.implicits._
    fresh.select($"page_key", $"body_hash".as("new_hash"))
      .join(stored.select($"page_key", $"body_hash".as("old_hash")),
        Seq("page_key"), "full_outer")
      .select($"page_key",
        when($"new_hash".isNull, "deleted")
          .when($"old_hash".isNull, "new")
          .when($"new_hash" === $"old_hash", "unchanged")
          .otherwise("changed").as("change"),
        ($"new_hash".isNotNull &&
          ($"old_hash".isNull || $"new_hash" =!= $"old_hash"))
          .as("needs_processing"))
  }

  /** c18: change detection over a synthesized crawl state — stored
    * hashes agree for doc_id%4==0, are stale for %4==1, absent for
    * %4==2 (new page), and %4==3 exists only in the store (page gone
    * from the fresh crawl). */
  def c18ChangeDetect(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", md5($"text").as("body_hash"))
    val fresh = docs.filter(pmod($"doc_id", lit(4)) =!= 3)
      .select(concat(lit("page-"), $"doc_id").as("page_key"), $"body_hash")
    val stored = docs.filter(pmod($"doc_id", lit(4)) =!= 2)
      .select(concat(lit("page-"), $"doc_id").as("page_key"),
        when(pmod($"doc_id", lit(4)) === 1, md5(concat($"body_hash", lit("old"))))
          .otherwise($"body_hash").as("body_hash"))
    changeDetect(fresh, stored).orderBy($"page_key")
  }

  /** c19: crawl PROGRESS rollup — the coordinator's source-completion
    * check (result_consumer.go step 6: CountPendingPages == 0 →
    * UpdateSourceStatus completed) over the whole page-status table
    * at once: per source, page counts by status and the completion
    * verdict. One keyed aggregate with map-side partial counts —
    * the dashboard/coordinator query, not a per-source point read.
    * Statuses are synthesized deterministically (pending only on a
    * sparse slice that spares source 0, so at least one source
    * completes). */
  def c19CrawlProgress(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pages = Tables.events(spark, dir)
      .select(concat(lit("src"), pmod($"user_id", lit(5))).as("source_id"),
        concat(lit("page-"), $"event_id").as("page_key"),
        when(pmod($"event_id", lit(7)) === 3 && pmod($"user_id", lit(5)) =!= 0,
          "pending")
          .when(pmod($"event_id", lit(11)) === 5, "failed")
          .otherwise("completed").as("status"))
    pages.groupBy($"source_id")
      .agg(count(lit(1)).as("n_pages"),
        count(when($"status" === "pending", lit(1))).as("n_pending"),
        count(when($"status" === "completed", lit(1))).as("n_completed"),
        count(when($"status" === "failed", lit(1))).as("n_failed"))
      .withColumn("is_complete", $"n_pending" === 0L)
      .orderBy($"source_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c13_web_meta" -> c13WebMeta _,
    "c14_crawl_errors" -> c14CrawlErrors _,
    "c18_change_detect" -> c18ChangeDetect _,
    "c19_crawl_progress" -> c19CrawlProgress _)

  val oracles: Map[String, String] = Map(
    "c19_crawl_progress" ->
      """WITH pages AS (
        |  SELECT 'src' || (user_id % 5) AS source_id,
        |    CASE WHEN event_id % 7 = 3 AND user_id % 5 <> 0 THEN 'pending'
        |         WHEN event_id % 11 = 5 THEN 'failed'
        |         ELSE 'completed' END AS status
        |  FROM events)
        |SELECT source_id,
        |  count(*) AS n_pages,
        |  count(CASE WHEN status = 'pending' THEN 1 END) AS n_pending,
        |  count(CASE WHEN status = 'completed' THEN 1 END) AS n_completed,
        |  count(CASE WHEN status = 'failed' THEN 1 END) AS n_failed,
        |  (count(CASE WHEN status = 'pending' THEN 1 END) = 0) AS is_complete
        |FROM pages
        |GROUP BY source_id
        |ORDER BY source_id""".stripMargin,
    "c18_change_detect" ->
      """WITH docs AS (
        |  SELECT doc_id, md5(text) AS body_hash FROM documents),
        |fresh AS (
        |  SELECT 'page-' || doc_id AS page_key, body_hash AS new_hash
        |  FROM docs WHERE doc_id % 4 <> 3),
        |stored AS (
        |  SELECT 'page-' || doc_id AS page_key,
        |    CASE WHEN doc_id % 4 = 1 THEN md5(body_hash || 'old')
        |         ELSE body_hash END AS old_hash
        |  FROM docs WHERE doc_id % 4 <> 2)
        |SELECT coalesce(f.page_key, s.page_key) AS page_key,
        |  CASE WHEN f.new_hash IS NULL THEN 'deleted'
        |       WHEN s.old_hash IS NULL THEN 'new'
        |       WHEN f.new_hash = s.old_hash THEN 'unchanged'
        |       ELSE 'changed' END AS change,
        |  (f.new_hash IS NOT NULL AND
        |   (s.old_hash IS NULL OR f.new_hash <> s.old_hash))
        |    AS needs_processing
        |FROM fresh f FULL OUTER JOIN stored s ON f.page_key = s.page_key
        |ORDER BY page_key""".stripMargin,
    "c14_crawl_errors" ->
      """WITH msgs AS (
        |  SELECT doc_id,
        |    (['Failed on navigating ACS-GOTO: Page.goto: net::ERR_TIMED_OUT at https://example.com',
        |      'Page.goto: net::ERR_NAME_NOT_RESOLVED at https://example.com',
        |      'Page.goto: net::ERR_CONNECTION_REFUSED at https://example.com',
        |      'Page.goto: net::ERR_CONNECTION_RESET at https://example.com',
        |      'Page.goto: net::ERR_CONNECTION_CLOSED at https://example.com',
        |      'blocked by robots.txt',
        |      '403 Forbidden',
        |      'some unknown error'])[(doc_id % 8) + 1] AS err_msg
        |  FROM documents),
        |cls AS (
        |  SELECT doc_id,
        |    CASE
        |      WHEN contains(upper(err_msg), 'TIMED_OUT')
        |        OR contains(upper(err_msg), 'TIMEOUT') THEN 'ERR_CRAWL_TIMEOUT'
        |      WHEN contains(upper(err_msg), 'ERR_NAME_NOT_RESOLVED')
        |        OR contains(upper(err_msg), 'DNS') THEN 'ERR_CRAWL_DNS'
        |      WHEN contains(upper(err_msg), 'ERR_CONNECTION_REFUSED')
        |        OR contains(upper(err_msg), 'ERR_CONNECTION_RESET')
        |        OR contains(upper(err_msg), 'ERR_CONNECTION_CLOSED')
        |        OR contains(upper(err_msg), 'ECONNREFUSED')
        |        OR contains(upper(err_msg), 'ECONNRESET') THEN 'ERR_CRAWL_REFUSED'
        |      WHEN contains(upper(err_msg), 'ROBOTS')
        |        OR contains(upper(err_msg), 'BLOCKED')
        |        OR contains(upper(err_msg), 'FORBIDDEN') THEN 'ERR_CRAWL_BLOCKED'
        |      ELSE 'ERR_CRAWL_TIMEOUT' END AS err_code
        |  FROM msgs)
        |SELECT doc_id, err_code,
        |  err_code IN ('ERR_CRAWL_TIMEOUT', 'ERR_CRAWL_DNS', 'ERR_CRAWL_REFUSED') AS retryable
        |FROM cls
        |ORDER BY doc_id""".stripMargin,
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
