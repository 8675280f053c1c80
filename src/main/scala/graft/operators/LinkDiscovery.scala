package graft.operators

import java.nio.charset.StandardCharsets
import java.util.regex.Pattern

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Crawl-frontier link discovery — the parameterized re-expression of
  * the reference's worker.DiscoverLinks (reference:
  * apps/backend/internal/worker/link_discovery.go:8-57): same-host +
  * http(s)-only checks, fragment stripping, Go-url-compatible
  * normalization, regex exclusions, dedup, depth+1 up to maxDepth.
  *
  * URL parsing/encoding is genuinely imperative string logic, so the
  * operator runs as a typed Dataset flatMap — one pass per partition,
  * compiled exclusion patterns per task, no shuffle until the final
  * dedup (which keys on the normalized URL, exactly the `seen` map's
  * role in the reference). c9/c10 are the oracle-checked fixed-shape
  * versions; this is the library surface.
  */
object LinkDiscovery {

  final case class Page(source_id: String, url: String, status: String, depth: Int)

  private val parseRe =
    Pattern.compile("^(https?|[a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)([^#]*)(#.*)?$")

  // RFC 3986 chars Go's url.String() leaves unescaped in path+query
  private val keep =
    ('a' to 'z').toSet ++ ('A' to 'Z') ++ ('0' to '9') ++
      "-._~!$&'()*+,;=:@/?".toSet

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  /** Go-url-compatible escaping: existing valid %XX escapes pass
    * through untouched; bytes outside the path/query charset are
    * UTF-8 percent-encoded (so "foo%20bar" stays, "café" becomes
    * "caf%C3%A9" — url.Parse + String() behavior). */
  private def escapePathQuery(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length && isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        out.append(s.substring(i, i + 3))
        i += 3
      } else if (keep.contains(c)) {
        out.append(c)
        i += 1
      } else {
        s.substring(i, i + 1).getBytes(StandardCharsets.UTF_8)
          .foreach(b => out.append(f"%%${b & 0xff}%02X")): Unit
        i += 1
      }
    }
    out.toString
  }

  /** Parse + normalize one link against the crawl host; None = drop
    * (malformed, wrong scheme, wrong host — url.Parse error paths). */
  private[graft] def normalize(link: String, host: String): Option[String] = {
    val m = parseRe.matcher(link)
    if (!m.matches()) return None
    val scheme = m.group(1).toLowerCase
    if (scheme != "http" && scheme != "https") return None
    if (m.group(2) != host) return None
    val rest = Option(m.group(3)).getOrElse("")
    if (rest.exists(c => c == ' ' || c.isControl)) return None // url.Parse rejects
    Some(s"$scheme://$host${escapePathQuery(rest)}")
  }

  /** The DiscoverLinks contract over a links column: returns the
    * frontier additions (source_id, url, status=pending, depth+1) or
    * an empty frame once maxDepth is reached. */
  def discover(links: Dataset[String], sourceId: String, host: String,
               currentDepth: Int, maxDepth: Int,
               exclusions: Seq[String] = Nil): DataFrame = {
    import links.sparkSession.implicits._
    val depth = currentDepth + 1
    val result = links
      .mapPartitions { it =>
        val excl = exclusions.map(Pattern.compile(_))
        it.flatMap { link =>
          normalize(link, host)
            .filterNot(url => excl.exists(_.matcher(url).find()))
            .map(url => Page(sourceId, url, "pending", depth))
        }
      }
      .dropDuplicates("url")
      .toDF()
    if (currentDepth >= maxDepth) result.limit(0) else result
  }

  /** Discovery from a specific PARENT page, applying the reference's
    * manifest rule (result_consumer.go:206-213): a parent whose URL
    * ends in "llms.txt" gets a +1 depth allowance — manifests listed
    * at maxDepth may still enqueue their children one level deeper,
    * and those children (depth > maxDepth) discover nothing further,
    * exactly the one-extra-level semantics the upstream
    * LLMsTxt_ExtendedDepth test pins. */
  def discoverFrom(parentUrl: String, links: Dataset[String],
                   sourceId: String, host: String, currentDepth: Int,
                   maxDepth: Int,
                   exclusions: Seq[String] = Nil): DataFrame = {
    val effectiveMaxDepth =
      if (parentUrl.length > 8 && parentUrl.endsWith("llms.txt")) maxDepth + 1
      else maxDepth
    discover(links, sourceId, host, currentDepth, effectiveMaxDepth, exclusions)
  }
}
