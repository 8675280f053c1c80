package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** robots.txt parsing + frontier evaluation — the crawl-permission
  * pre-filter the reference delegates to its crawler library
  * (handlers/web.py:277 `check_robots_txt=True`); a distributed
  * crawler can't fetch-and-check per URL, it evaluates the WHOLE
  * frontier against parsed per-host rule tables in one join.
  *
  * Semantics: the RFC 9309 core — rules grouped under User-agent
  * lines, longest-matching path prefix wins, Allow beats Disallow on
  * equal length, no match = allowed. (Wildcard `*`/`$` patterns are
  * an extension; prefix rules are the RFC's required baseline and
  * what this evaluator implements.)
  *
  * Scale shape: parse is a per-host line explode with a running
  * "current group" window (one keyed exchange); evaluation is an
  * equi-join on host — never URL×rule — with the longest-match pick
  * as a per-URL window over the few matching rules.
  */
object Robots {

  /** Parse robots.txt bodies: (host, robots_txt) -> one row per
    * (host, agent, rule, path). Group attribution is the RFC's:
    * a rule line belongs to the most recent User-agent line above
    * it; consecutive User-agent lines share the following rules
    * (each UA line starts/extends a group — re-expressed here as
    * rules attaching to EVERY agent of the current group via the
    * group-id join). */
  def parseRobots(robots: DataFrame): DataFrame = {
    import robots.sparkSession.implicits._
    val lines = robots
      .select($"host", posexplode(split($"robots_txt", "\n")))
      .select($"host", $"pos".as("line_no"),
        trim(lower($"col")).as("line"))
      .filter($"line" =!= "" && !$"line".startsWith("#"))
    val tagged = lines.select($"host", $"line_no",
      regexp_extract($"line", "^(user-agent|allow|disallow)\\s*:\\s*(.*)$", 1)
        .as("key"),
      trim(regexp_extract($"line", "^(user-agent|allow|disallow)\\s*:\\s*(.*)$", 2))
        .as("value"))
      .filter($"key" =!= "")
    // group id = number of user-agent lines at or above this line
    // that START a group (a UA line not directly preceded by another
    // UA line starts a new group)
    val w = Window.partitionBy($"host").orderBy($"line_no")
    val grouped = tagged
      .withColumn("is_ua", ($"key" === "user-agent").cast("int"))
      .withColumn("prev_ua", coalesce(lag($"is_ua", 1).over(w), lit(0)))
      .withColumn("starts_group",
        ($"is_ua" === 1 && $"prev_ua" === 0).cast("int"))
      .withColumn("grp", sum($"starts_group").over(w))
    val agents = grouped.filter($"is_ua" === 1)
      .select($"host", $"grp", $"value".as("agent"))
    val rules = grouped.filter($"is_ua" === 0 && $"value" =!= "")
      .select($"host", $"grp", $"key".as("rule"), $"value".as("path"))
    agents.join(rules, Seq("host", "grp"))
      .select($"host", $"agent", $"rule", $"path")
  }

  /** Evaluate a URL frontier against parsed rules for one agent:
    * adds (allowed, matched_rule, matched_path). Longest matching
    * prefix wins; allow beats disallow at equal length; no matching
    * rule (or no rules for the host) = allowed. */
  def evaluate(frontier: DataFrame, rules: DataFrame,
               agent: String = "*"): DataFrame = {
    import frontier.sparkSession.implicits._
    val urls = frontier.select($"url",
      regexp_extract($"url", "^https?://([^/]+)", 1).as("host"),
      coalesce(nullif(regexp_extract($"url", "^https?://[^/]+(/.*)$", 1),
        lit("")), lit("/")).as("url_path"))
    val agentRules = rules
      .filter($"agent" === agent)
      .select($"host".as("r_host"), $"rule", $"path")
    // prefix test INSIDE the join condition: a host whose rules all
    // miss must keep its null row (= allowed), not vanish
    val matches = urls.join(agentRules,
      $"host" === $"r_host" && $"url_path".startsWith($"path"), "left")
    // allow beats disallow on equal length: 'allow' < 'disallow' asc
    val w = Window.partitionBy($"url")
      .orderBy(length($"path").desc, $"rule".asc)
    matches
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"url",
        coalesce($"rule" =!= "disallow", lit(true)).as("allowed"),
        $"rule".as("matched_rule"), $"path".as("matched_path"))
  }

  /** The synthesized per-host robots.txt corpus c16 and c17 share. */
  private[operators] def robotsCorpus(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("host0.example.com",
        "# host0 policy\nUser-agent: *\nCrawl-delay: 2\nDisallow: /page/1\n" +
          "Allow: /page/12\n\nUser-agent: badbot\nDisallow: /"),
      ("host1.example.com", "User-agent: *\nDisallow: /"),
      ("host2.example.com",
        "User-agent: badbot\nDisallow: /private\n\nUser-agent: *\nCrawl-delay: 5"))
      .toDF("host", "robots_txt")
  }

  /** c16: the crawl-permission pass over c9's link frontier —
    * per-host robots.txt bodies are synthesized (host0 disallows a
    * /page/1 prefix but re-allows /page/12 — the longest-match +
    * allow-beats-disallow case; host1 disallows everything; host2
    * has no rules beyond an unrelated agent group), parsed, and the
    * frontier evaluated for agent "*". */
  def c16Robots(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val frontier = Tables.events(spark, dir)
      .select(concat(
        lit("https://host"), pmod($"user_id", lit(3)),
        lit(".example.com/page/"), pmod($"event_id", lit(50))).as("url"))
      .distinct()
    evaluate(frontier, parseRobots(robotsCorpus(spark)))
      .orderBy($"url")
  }

  /** c17: frontier SCHEDULING — the query a crawl scheduler actually
    * runs each cycle, composing three verified pieces: c15's
    * fixed-point PageRank (importance), c16's robots evaluation
    * (permission), and the link frontier. Disallowed URLs drop;
    * surviving URLs rank into PER-HOST politeness queues (crawlers
    * fetch per-host serially — a GLOBAL priority order would both
    * violate politeness and be the classic total-order bottleneck;
    * the per-host window keys the only exchange). */
  def c17FrontierPriority(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val frontier = Tables.events(spark, dir)
      .select(
        concat(lit("https://host"), pmod($"user_id", lit(3)),
          lit(".example.com/page/"), pmod($"event_id", lit(50))).as("url"),
        concat(lit("host"), pmod($"user_id", lit(3)),
          lit(".example.com")).as("host"),
        pmod($"event_id", lit(50)).cast("long").as("page_id"))
      .distinct()
    val perms = evaluate(frontier.select($"url"), parseRobots(robotsCorpus(spark)))
      .select($"url", $"allowed")
    val ranks = ChunkQueries.c15PageRank(spark, dir)
      .select($"url".as("page_id"), $"rank_e12")
    val w = Window.partitionBy($"host")
      .orderBy($"rank_e12".desc, $"url")
    frontier
      .join(perms, "url")
      .filter($"allowed")
      .join(ranks, "page_id")
      .select($"host", $"url", $"rank_e12",
        row_number().over(w).as("host_rank"))
      .orderBy($"host", $"host_rank")
  }

  /** URL canonicalization — the crawl-side dedup key: fragments
    * never reach the server (drop), scheme+host are case-insensitive
    * (lowercase), default ports are redundant (:443 on https, :80 on
    * http), a bare trailing slash is the same resource, and query
    * parameter ORDER is almost always non-semantic (sort params —
    * the one lossy choice, the standard crawler trade, documented).
    * Pure string expressions → codegen, no UDF. */
  def canonicalUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport = lower(regexp_extract(url, "^[^:]+://([^/?#]+)", 1))
    val host = regexp_replace(hostport, ":\\d+$", "")
    val port = regexp_extract(hostport, ":(\\d+)$", 1)
    val keepPort = port =!= "" &&
      !(scheme === "https" && port === "443") &&
      !(scheme === "http" && port === "80")
    val rawPath = regexp_extract(url, "^[^:]+://[^/?#]+([^?#]*)", 1)
    val path = when(rawPath === "" || rawPath === "/", "")
      .otherwise(regexp_replace(rawPath, "/$", ""))
    val query = regexp_extract(url, "\\?([^#]*)", 1)
    val sortedQuery = when(query === "", "")
      .otherwise(concat(lit("?"),
        array_join(array_sort(split(query, "&")), "&")))
    concat(scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path, sortedQuery)
  }

  /** d10: canonical-URL dedup over a synthesized crawl log whose
    * URLs vary in case, fragment, default port, trailing slash, and
    * parameter order by deterministic doc_id rules — one group per
    * canonical resource, first (minimum) raw URL kept, duplicate
    * count exposed. */
  def d10UrlDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.events(spark, dir)
    val raw = base.select(
      concat(
        when(pmod($"event_id", lit(5)) === 0, "HTTPS://").otherwise("https://"),
        when(pmod($"event_id", lit(3)) === 0, "Host").otherwise("host"),
        pmod($"user_id", lit(3)), lit(".example.com"),
        when(pmod($"event_id", lit(7)) === 0, ":443").otherwise(""),
        lit("/page/"), pmod($"event_id", lit(50)),
        when(pmod($"event_id", lit(4)) === 0, "/").otherwise(""),
        when(pmod($"event_id", lit(2)) === 0, "?b=2&a=1").otherwise("?a=1&b=2"),
        when(pmod($"event_id", lit(6)) === 0, "#frag").otherwise(""))
        .as("url"))
    raw
      .withColumn("canonical", canonicalUrl($"url"))
      .groupBy($"canonical")
      .agg(min($"url").as("kept_url"), count(lit(1)).as("n_variants"))
      .orderBy($"canonical")
  }

  /** Per-host Crawl-delay for agent `*`, using the same group walk
    * as [[parseRobots]] (a delay line binds to the agent group above
    * it); hosts that declare none get `default` seconds. The most
    * conservative declared value wins if a host repeats the
    * directive. */
  def crawlDelays(robots: DataFrame, default: Double = 1.0): DataFrame = {
    import robots.sparkSession.implicits._
    val lines = robots
      .select($"host", posexplode(split($"robots_txt", "\n")))
      .select($"host", $"pos".as("line_no"), trim(lower($"col")).as("line"))
      .filter($"line" =!= "" && !$"line".startsWith("#"))
    // Tag ALL directive lines for the grouping window (a UA group
    // ends at any rule line, not just at a crawl-delay line — same
    // walk as parseRobots); crawl-delay rows are selected AFTER the
    // group ids are assigned.
    val tagged = lines.select($"host", $"line_no",
      regexp_extract($"line",
        "^(user-agent|allow|disallow|crawl-delay)\\s*:\\s*(.*)$", 1)
        .as("key"),
      trim(regexp_extract($"line",
        "^(user-agent|allow|disallow|crawl-delay)\\s*:\\s*(.*)$", 2))
        .as("value"))
      .filter($"key" =!= "")
    val w = Window.partitionBy($"host").orderBy($"line_no")
    val grouped = tagged
      .withColumn("is_ua", ($"key" === "user-agent").cast("int"))
      .withColumn("prev_ua", coalesce(lag($"is_ua", 1).over(w), lit(0)))
      .withColumn("starts_group",
        ($"is_ua" === 1 && $"prev_ua" === 0).cast("int"))
      .withColumn("grp", sum($"starts_group").over(w))
    val starGroups = grouped.filter($"is_ua" === 1 && $"value" === "*")
      .select($"host", $"grp").distinct()
    val declared = grouped.filter($"key" === "crawl-delay")
      .join(starGroups, Seq("host", "grp"), "left_semi")
      .groupBy($"host")
      .agg(max($"value".cast("double")).as("crawl_delay_s"))
    robots.select($"host").distinct()
      .join(declared, Seq("host"), "left")
      .select($"host",
        coalesce($"crawl_delay_s", lit(default)).as("crawl_delay_s"))
  }

  /** c23: POLITENESS schedule — c17's priority order turned into an
    * executable per-host fetch timetable: each host's queue is paced
    * by its own declared Crawl-delay (robots.txt, agent `*`;
    * undeclared hosts get the crawler's 1 s default), so slot k
    * fetches at (k−1)·delay seconds into the cycle. This is the last
    * missing piece between "which URLs, in what order" (c17) and a
    * crawler actually hitting the wire without tripping rate limits.
    * Delay extraction shares parseRobots' group walk; the schedule
    * adds one broadcast-size join (hosts) and arithmetic on c17's
    * existing keyed window rank — no new shuffle shape. Delays are
    * 2dp-exact decimals of small integers, so the timetable replays
    * exactly in the oracle. */
  def c23PolitenessSchedule(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    c17FrontierPriority(spark, dir)
      .join(broadcast(crawlDelays(robotsCorpus(spark))), Seq("host"), "left")
      .select($"host", $"url", $"host_rank",
        coalesce($"crawl_delay_s", lit(1.0)).as("crawl_delay_s"),
        round(($"host_rank" - 1).cast("double") *
          coalesce($"crawl_delay_s", lit(1.0)), 2).as("fetch_at_s"))
      .orderBy($"host", $"host_rank")
  }

  /** Adaptive REVISIT intervals from change signals — the scheduling
    * policy UpdateBodyHash exists to enable (the reference stores a
    * per-page body hash, result_consumer.go:196-198, precisely so
    * the next cycle can tell changed from unchanged): a page that
    * changed is revisited SOONER (halve the interval, floored at
    * `minS`), a stable page backs off exponentially (double, capped
    * at `maxS`), a newly discovered page starts at `defaultS`, and a
    * deleted page leaves the schedule. Generic over any
    * (page_key, change, prev_interval_s) frame — [[graft.operators
    * .WebMeta.changeDetect]]'s classes feed it directly. Pure
    * per-row arithmetic: no shuffle at all until a consumer sorts. */
  def revisitIntervals(changes: DataFrame, minS: Double = 60.0,
                       maxS: Double = 3600.0,
                       defaultS: Double = 300.0): DataFrame = {
    import changes.sparkSession.implicits._
    changes.filter($"change" =!= "deleted")
      .withColumn("next_interval_s",
        when($"change" === "changed",
          greatest(lit(minS), $"prev_interval_s" / 2))
          .when($"change" === "unchanged",
            least(lit(maxS), $"prev_interval_s" * 2))
          .otherwise(lit(defaultS)))
  }

  /** Per-host politeness pacing of DUE fetches: hosts fetch
    * serially, so within a host (slots ordered by due time) slot k
    * fires at t_k = max(due_k, t_{k-1} + delay). That prefix
    * recurrence would be a driver loop written naively — instead it
    * linearizes: t_k = delay·(k−1) + running_max(due_j − delay·(j−1)),
    * ONE cumulative-max window per host partition, fully
    * distributed and identical in DuckDB for the oracle. Input needs
    * (host, due_in_s, crawl_delay_s) plus `orderCol` as the
    * deterministic tie-break; emits host_rank and fetch_at_s. */
  def paceByHost(due: DataFrame, orderCol: String): DataFrame = {
    import due.sparkSession.implicits._
    val w = Window.partitionBy($"host").orderBy($"due_in_s", col(orderCol))
    val wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    due.withColumn("host_rank", row_number().over(w))
      .withColumn("fetch_at_s",
        round(($"host_rank" - 1) * $"crawl_delay_s" +
          max($"due_in_s" - ($"host_rank" - 1) * $"crawl_delay_s").over(wc),
          2))
  }

  /** c24: RECRAWL schedule — the query a standing crawl runs every
    * cycle, composing c18's change classes (doc_id%4: unchanged /
    * changed / new / deleted over the synthesized crawl state) with
    * a deterministic prior-interval ladder (60·2^(doc_id%5) s),
    * [[revisitIntervals]]' adapt step, and c23's per-host
    * Crawl-delay pacing. Output: when each surviving page is due and
    * when its host's serial queue actually fetches it. */
  def c24RecrawlSchedule(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val changes = WebMeta.c18ChangeDetect(spark, dir)
      .withColumn("doc_id",
        regexp_extract($"page_key", "^page-(\\d+)$", 1).cast("long"))
      .withColumn("prev_interval_s",
        lit(60.0) * pow(lit(2.0), pmod($"doc_id", lit(5)).cast("double")))
    val due = revisitIntervals(changes)
      .withColumn("host",
        concat(lit("host"), pmod($"doc_id", lit(3)), lit(".example.com")))
      .withColumn("due_in_s", $"next_interval_s")
      .join(broadcast(crawlDelays(robotsCorpus(spark))), Seq("host"), "left")
      .withColumn("crawl_delay_s", coalesce($"crawl_delay_s", lit(1.0)))
    paceByHost(due, "doc_id")
      .select($"host", $"page_key", $"change", $"prev_interval_s",
        $"next_interval_s", $"crawl_delay_s", $"host_rank", $"fetch_at_s")
      .orderBy($"host", $"host_rank")
  }

  /** c25: per-host crawl-BUDGET apportionment — the allocation step
    * between "how important is each host's frontier" (c17) and "how
    * many fetches does each host get this cycle": the per-cycle
    * budget splits across hosts proportional to their pending rank
    * mass by integer Hamilton apportionment (base = ⌊B·mass/total⌋,
    * the shortfall goes to the largest integer remainders — base ≤
    * quota ≤ base+1 for every host, Σquota = B, and the arithmetic
    * is exact BIGINT div/mod so the oracle replays it digit for
    * digit). Grants cap at the host's pending count; the spilled
    * remainder is reported, not silently lost. The remainder ranking
    * is a window over ONE ROW PER HOST — host-aggregate cardinality,
    * not frontier cardinality; a deployment with tens of millions of
    * hosts apportions hierarchically (TLD → host) with the same
    * operator. */
  def c25CrawlBudget(spark: SparkSession, dir: String,
                     budget: Long = 100L): DataFrame =
    apportionBudgetAuto(c17FrontierPriority(spark, dir), budget)

  /** The apportionment core over any ranked (host, rank_e12)
    * frontier — the GraftEngine facade's entry point; c25 feeds it
    * the c17 frontier. */
  /** The per-host (n_pending, mass_w) reduction both apportionment
    * forms start from. ALL mass arithmetic runs in decimal(38,0)
    * (HUGEINT in the oracle): e12-scaled rank mass on a large
    * frontier approaches Long range, so the per-host sum, the
    * total-mass sum, AND the budget·mass multiply would each wrap
    * (or throw under ANSI) in 64-bit. Only the per-host output
    * column narrows back to BIGINT — the schema contract both
    * engines share. */
  private def hostMassOf(frontier: DataFrame): DataFrame = {
    import frontier.sparkSession.implicits._
    frontier.groupBy($"host")
      .agg(count(lit(1)).as("n_pending"),
        sum($"rank_e12".cast("decimal(38,0)")).as("mass_w"))
  }

  def apportionBudget(frontier: DataFrame, budget: Long): DataFrame =
    flatOverHosts(hostMassOf(frontier), budget)

  private def flatOverHosts(hosts: DataFrame, budget: Long): DataFrame = {
    import hosts.sparkSession.implicits._
    val tot = hosts.agg(sum($"mass_w").as("tmass"))
    val wAll = Window.partitionBy()
    val wRem = Window.orderBy($"rem".desc, $"host")
    hosts.crossJoin(broadcast(tot))
      .withColumn("base", expr(
        s"CAST((mass_w * $budget) div tmass AS BIGINT)"))
      .withColumn("rem", ($"mass_w" * budget) % $"tmass")
      .withColumn("short", lit(budget) - sum($"base").over(wAll))
      .withColumn("rrank", row_number().over(wRem).cast("long"))
      .withColumn("quota",
        $"base" + when($"rrank" <= $"short", 1L).otherwise(0L))
      .withColumn("granted", least($"n_pending", $"quota"))
      .select($"host", $"n_pending", $"mass_w".cast("long").as("mass"),
        $"quota", $"granted", ($"quota" - $"granted").as("spilled"))
      .orderBy($"host")
  }

  /** HIERARCHICAL (TLD → host) Hamilton apportionment — the
    * web-scale form of [[apportionBudget]]: level 1 splits the
    * budget across TLD mass aggregates (the only partition-LESS
    * window left runs over TLD-cardinality rows — bounded by the
    * registry, ~1.5k, at ANY frontier size), and level 2 splits each
    * TLD's quota across its own hosts with the remainder window
    * PARTITIONED BY TLD — so no global total-order ever touches a
    * row count the crawl frontier controls. Same exact decimal(38,0)
    * arithmetic per level; on a single-TLD frontier the two-level
    * split degenerates to flat Hamilton exactly (RobotsSpec pins
    * both that and that the per-TLD quotas tile the budget). */
  def apportionBudgetHierarchical(frontier: DataFrame,
                                  budget: Long): DataFrame =
    hierarchicalOverHosts(hostMassOf(frontier), budget)

  private def hierarchicalOverHosts(hostMass: DataFrame,
                                    budget: Long): DataFrame = {
    import hostMass.sparkSession.implicits._
    val hosts = hostMass
      .withColumn("tld", substring_index($"host", ".", -1))
    // level 1: Hamilton over TLD aggregates
    val tlds = hosts.groupBy($"tld").agg(sum($"mass_w").as("tmass_w"))
    val tot = tlds.agg(sum($"tmass_w").as("gmass"))
    val wAll = Window.partitionBy()
    val wRemT = Window.orderBy($"trem".desc, $"tld")
    val tldQuota = tlds.crossJoin(broadcast(tot))
      .withColumn("tbase", expr(
        s"CAST((tmass_w * $budget) div gmass AS BIGINT)"))
      .withColumn("trem", ($"tmass_w" * budget) % $"gmass")
      .withColumn("tshort", lit(budget) - sum($"tbase").over(wAll))
      .withColumn("trrank", row_number().over(wRemT).cast("long"))
      .withColumn("tquota",
        $"tbase" + when($"trrank" <= $"tshort", 1L).otherwise(0L))
      .select($"tld", $"tquota", $"tmass_w")
    // level 2: Hamilton within each TLD, every window keyed by the
    // parent — host cardinality never meets a single partition
    val wTld = Window.partitionBy($"tld")
    val wRemH = Window.partitionBy($"tld").orderBy($"rem".desc, $"host")
    hosts.join(broadcast(tldQuota), "tld")
      // a TLD whose hosts ALL have zero rank mass has tmass_w = 0 —
      // the div/mod would be null and every host in it would carry
      // null quotas. Short-circuit: base 0, rem 0, so the TLD's
      // (possibly remainder-granted) tquota splits by the existing
      // deterministic tie-break (rem desc = all-equal, then host) —
      // integer quotas always, matching flat apportionBudget's
      // zero-mass behavior.
      .withColumn("base", when($"tmass_w" === 0, lit(0L)).otherwise(expr(
        "CAST((mass_w * tquota) div tmass_w AS BIGINT)")))
      .withColumn("rem", when($"tmass_w" === 0,
          lit(0).cast("decimal(38,0)"))
        .otherwise(($"mass_w" * $"tquota") % $"tmass_w"))
      .withColumn("short", $"tquota" - sum($"base").over(wTld))
      .withColumn("rrank", row_number().over(wRemH).cast("long"))
      .withColumn("quota",
        $"base" + when($"rrank" <= $"short", 1L).otherwise(0L))
      .withColumn("granted", least($"n_pending", $"quota"))
      .select($"host", $"tld", $"n_pending",
        $"mass_w".cast("long").as("mass"), $"quota", $"granted",
        ($"quota" - $"granted").as("spilled"))
      .orderBy($"host")
  }

  /** Host-count threshold above which [[apportionBudgetAuto]] routes
    * to the hierarchical form: below it the flat remainder window
    * (one partition over host-cardinality rows) is cheap and exact;
    * above it that window is the scaling hazard the TLD→host split
    * exists to remove. */
  val AutoHierarchyHosts = 4096L

  /** Count-gated apportionment — the Pipeline.connectedComponents
    * Adaptive pattern applied to c25: ONE cheap aggregate decides the
    * shape (a distinct-host count — host-aggregate cardinality, the
    * same reduction both forms start with), then small frontiers take
    * flat Hamilton and large ones the hierarchical split whose every
    * window is TLD-partitioned. Output schema is the flat form's;
    * on a single-TLD frontier the two forms agree exactly, and above
    * the switch the quotas are the hierarchical ones (two-level
    * Hamilton — see apportionBudgetHierarchical's contract). */
  def apportionBudgetAuto(frontier: DataFrame, budget: Long,
                          hostSwitch: Long = AutoHierarchyHosts): DataFrame = {
    import frontier.sparkSession.implicits._
    // ONE host aggregation feeds both the gate count and whichever
    // apportionment runs — the frontier pipeline (c17's rank join)
    // is not recomputed for the count (tracked persist, released by
    // the caller's releaseAll like every diamond reuse here)
    val hosts = graft.Caches.persist(hostMassOf(frontier))
    val nHosts = hosts.count()
    if (nHosts > hostSwitch)
      hierarchicalOverHosts(hosts, budget)
        .select($"host", $"n_pending", $"mass", $"quota", $"granted",
          $"spilled")
        .orderBy($"host")
    else flatOverHosts(hosts, budget)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c25_crawl_budget" -> ((s, d) => c25CrawlBudget(s, d)),
    "c24_recrawl_schedule" -> c24RecrawlSchedule _,
    "c23_politeness_schedule" -> c23PolitenessSchedule _,
    "c16_robots" -> c16Robots _,
    "c17_frontier_priority" -> c17FrontierPriority _,
    "d10_url_dedup" -> d10UrlDedup _)

  /** Shared oracle CTE block: c15's rank fixed point, the rules
    * table, the synthesized frontier, the RFC longest-match
    * permission pick, and the ranked per-host frontier `fr` — the
    * common prefix of the c17, c23, and c25 replays. */
  private lazy val frontierCtesSql: String =
    s"""${ChunkQueries.pageRankCtesSql},
      |rules AS (
      |  SELECT * FROM (VALUES
      |    ('host0.example.com', 'disallow', '/page/1'),
      |    ('host0.example.com', 'allow', '/page/12'),
      |    ('host1.example.com', 'disallow', '/'))
      |    AS t(host, rule, path)),
      |frontier AS (
      |  SELECT DISTINCT
      |    -- the concat operator stays at end of line: this block is
      |    -- re-interpolated into stripMargin oracles, and a stripped
      |    -- line beginning with || would lose a pipe
      |    'https://host' || (user_id % 3) || '.example.com/page/' ||
      |      (event_id % 50) AS url,
      |    'host' || (user_id % 3) || '.example.com' AS host,
      |    CAST(event_id % 50 AS BIGINT) AS page_id
      |  FROM events),
      |urls AS (
      |  SELECT url,
      |    regexp_extract(url, '^https?://([^/]+)', 1) AS uhost,
      |    coalesce(nullif(regexp_extract(url, '^https?://[^/]+(/.*)$$', 1), ''),
      |             '/') AS url_path
      |  FROM frontier),
      |matches AS (
      |  SELECT u.url, r.rule, r.path
      |  FROM urls u LEFT JOIN rules r
      |    ON u.uhost = r.host AND starts_with(u.url_path, r.path)),
      |perm AS (
      |  SELECT url, coalesce(rule <> 'disallow', true) AS allowed
      |  FROM (
      |    SELECT url, rule,
      |      row_number() OVER (PARTITION BY url
      |        ORDER BY length(path) DESC, rule ASC) AS rn
      |    FROM matches)
      |  WHERE rn = 1),
      |fr AS (
      |  SELECT f.host, f.url, CAST(r3.r AS BIGINT) AS rank_e12,
      |    CAST(row_number() OVER (PARTITION BY f.host
      |      ORDER BY r3.r DESC, f.url) AS INTEGER) AS host_rank
      |  FROM frontier f
      |  JOIN perm p ON p.url = f.url
      |  JOIN r3 ON r3.url = f.page_id
      |  WHERE p.allowed)""".stripMargin

  val oracles: Map[String, String] = Map(
    // c18's mod-4 change classes (hash equality in Spark ≡ the mod
    // synthesis), the 60·2^(doc_id%5) interval ladder, the adapt
    // rules, then the per-host serial queue as the SAME linearized
    // cumulative-max recurrence
    "c24_recrawl_schedule" ->
      """WITH state AS (
        |  SELECT doc_id,
        |    CASE doc_id % 4 WHEN 0 THEN 'unchanged' WHEN 1 THEN 'changed'
        |                    WHEN 2 THEN 'new' ELSE 'deleted' END AS change,
        |    60.0 * pow(2, doc_id % 5) AS prev_interval_s
        |  FROM documents),
        |due AS (
        |  SELECT doc_id, change, prev_interval_s,
        |    CASE change WHEN 'changed' THEN greatest(60.0, prev_interval_s / 2)
        |                WHEN 'unchanged' THEN least(3600.0, prev_interval_s * 2)
        |                ELSE 300.0 END AS next_interval_s,
        |    'host' || (doc_id % 3) || '.example.com' AS host
        |  FROM state WHERE change <> 'deleted'),
        |delays AS (
        |  SELECT * FROM (VALUES ('host0.example.com', 2.0),
        |                        ('host2.example.com', 5.0))
        |    AS t(host, crawl_delay_s)),
        |ranked AS (
        |  SELECT d.doc_id, d.change, d.prev_interval_s, d.next_interval_s,
        |    d.host, coalesce(del.crawl_delay_s, 1.0) AS crawl_delay_s,
        |    row_number() OVER (PARTITION BY d.host
        |      ORDER BY d.next_interval_s, d.doc_id) AS host_rank
        |  FROM due d LEFT JOIN delays del ON d.host = del.host)
        |SELECT host, 'page-' || doc_id AS page_key, change, prev_interval_s,
        |  next_interval_s, crawl_delay_s, host_rank,
        |  round((host_rank - 1) * crawl_delay_s +
        |    max(next_interval_s - (host_rank - 1) * crawl_delay_s)
        |      OVER (PARTITION BY host ORDER BY host_rank
        |            ROWS UNBOUNDED PRECEDING), 2) AS fetch_at_s
        |FROM ranked
        |ORDER BY host, host_rank""".stripMargin,
    // c15's rank CTEs + c16's permission CTEs + the per-host queue
    // c17's ranked frontier paced by the declared per-host delays
    // (host0 2s, host2 5s, default 1s): slot k fires at (k-1)*delay
    "c23_politeness_schedule" ->
      s"""WITH ${ChunkQueries.pageRankCtesSql},
        |rules AS (
        |  SELECT * FROM (VALUES
        |    ('host0.example.com', 'disallow', '/page/1'),
        |    ('host0.example.com', 'allow', '/page/12'),
        |    ('host1.example.com', 'disallow', '/'))
        |    AS t(host, rule, path)),
        |delays AS (
        |  SELECT * FROM (VALUES
        |    ('host0.example.com', 2.0),
        |    ('host2.example.com', 5.0))
        |    AS t(host, crawl_delay_s)),
        |frontier AS (
        |  SELECT DISTINCT
        |    'https://host' || (user_id % 3) || '.example.com/page/'
        |      || (event_id % 50) AS url,
        |    'host' || (user_id % 3) || '.example.com' AS host,
        |    CAST(event_id % 50 AS BIGINT) AS page_id
        |  FROM events),
        |urls AS (
        |  SELECT url,
        |    regexp_extract(url, '^https?://([^/]+)', 1) AS uhost,
        |    coalesce(nullif(regexp_extract(url, '^https?://[^/]+(/.*)$$', 1), ''),
        |             '/') AS url_path
        |  FROM frontier),
        |matches AS (
        |  SELECT u.url, r.rule, r.path
        |  FROM urls u LEFT JOIN rules r
        |    ON u.uhost = r.host AND starts_with(u.url_path, r.path)),
        |perm AS (
        |  SELECT url, coalesce(rule <> 'disallow', true) AS allowed
        |  FROM (
        |    SELECT url, rule,
        |      row_number() OVER (PARTITION BY url
        |        ORDER BY length(path) DESC, rule ASC) AS rn
        |    FROM matches)
        |  WHERE rn = 1),
        |ranked AS (
        |  SELECT f.host, f.url,
        |    CAST(row_number() OVER (PARTITION BY f.host
        |      ORDER BY r3.r DESC, f.url) AS INTEGER) AS host_rank
        |  FROM frontier f
        |  JOIN perm p ON p.url = f.url
        |  JOIN r3 ON r3.url = f.page_id
        |  WHERE p.allowed)
        |SELECT ranked.host, url, host_rank,
        |  coalesce(delays.crawl_delay_s, 1.0) AS crawl_delay_s,
        |  round((host_rank - 1) * coalesce(delays.crawl_delay_s, 1.0), 2)
        |    AS fetch_at_s
        |FROM ranked LEFT JOIN delays ON delays.host = ranked.host
        |ORDER BY ranked.host, host_rank""".stripMargin,
    "c17_frontier_priority" ->
      s"""WITH $frontierCtesSql
        |SELECT host, url, rank_e12, host_rank FROM fr
        |ORDER BY host, host_rank""".stripMargin,
    // integer Hamilton apportionment over the ranked frontier: base =
    // (B·mass) div tmass, +1 for the largest integer remainders —
    // exact BIGINT arithmetic end to end, no FP quota drift
    "c25_crawl_budget" ->
      s"""WITH $frontierCtesSql,
        |hosts AS (
        |  SELECT host, CAST(count(*) AS BIGINT) AS n_pending,
        |    CAST(sum(rank_e12) AS BIGINT) AS mass
        |  FROM fr GROUP BY host),
        |-- tmass stays HUGEINT through the divide: a frontier whose
        |-- TOTAL mass exceeds Long range must not overflow-check here
        |tot AS (SELECT sum(mass) AS tmass FROM hosts),
        |q AS (
        |  -- HUGEINT multiply mirrors Spark's decimal(38,0): no 64-bit
        |  -- wrap when e12-scaled mass approaches Long range
        |  SELECT host, n_pending, mass,
        |    CAST((100 * CAST(mass AS HUGEINT)) // CAST(tmass AS HUGEINT)
        |      AS BIGINT) AS base,
        |    (100 * CAST(mass AS HUGEINT)) % CAST(tmass AS HUGEINT) AS rem
        |  FROM hosts, tot),
        |s AS (
        |  SELECT host, n_pending, mass, base,
        |    CAST(100 - sum(base) OVER () AS BIGINT) AS short,
        |    CAST(row_number() OVER (ORDER BY rem DESC, host) AS BIGINT)
        |      AS rrank
        |  FROM q),
        |g AS (
        |  SELECT host, n_pending, mass,
        |    base + CASE WHEN rrank <= short THEN 1 ELSE 0 END AS quota
        |  FROM s)
        |SELECT host, n_pending, mass, quota,
        |  least(n_pending, quota) AS granted,
        |  quota - least(n_pending, quota) AS spilled
        |FROM g ORDER BY host""".stripMargin,
    // same normalization arms: lowercase scheme/host, default-port
    // drop, fragment drop, trailing-slash strip, sorted params
    "d10_url_dedup" ->
      """WITH raw AS (
        |  SELECT (CASE WHEN event_id % 5 = 0 THEN 'HTTPS://' ELSE 'https://' END)
        |    || (CASE WHEN event_id % 3 = 0 THEN 'Host' ELSE 'host' END)
        |    || (user_id % 3) || '.example.com'
        |    || (CASE WHEN event_id % 7 = 0 THEN ':443' ELSE '' END)
        |    || '/page/' || (event_id % 50)
        |    || (CASE WHEN event_id % 4 = 0 THEN '/' ELSE '' END)
        |    || (CASE WHEN event_id % 2 = 0 THEN '?b=2&a=1' ELSE '?a=1&b=2' END)
        |    || (CASE WHEN event_id % 6 = 0 THEN '#frag' ELSE '' END) AS url
        |  FROM events),
        |c AS (
        |  SELECT url,
        |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |    lower(regexp_extract(url, '^[^:]+://([^/?#]+)', 1)) AS hostport,
        |    regexp_extract(url, '^[^:]+://[^/?#]+([^?#]*)', 1) AS rawpath,
        |    regexp_extract(url, '\?([^#]*)', 1) AS q
        |  FROM raw),
        |n AS (
        |  SELECT url, scheme,
        |    regexp_replace(hostport, ':\d+$', '') AS host,
        |    regexp_extract(hostport, ':(\d+)$', 1) AS port,
        |    CASE WHEN rawpath = '' OR rawpath = '/' THEN ''
        |         ELSE regexp_replace(rawpath, '/$', '') END AS path,
        |    CASE WHEN q = '' THEN ''
        |         ELSE '?' || array_to_string(list_sort(string_split(q, '&')), '&')
        |    END AS sq
        |  FROM c)
        |SELECT canonical, min(url) AS kept_url, count(*) AS n_variants
        |FROM (
        |  SELECT url, scheme || '://' || host
        |    || (CASE WHEN port <> '' AND NOT (scheme = 'https' AND port = '443')
        |              AND NOT (scheme = 'http' AND port = '80')
        |         THEN ':' || port ELSE '' END)
        |    || path || sq AS canonical
        |  FROM n)
        |GROUP BY canonical
        |ORDER BY canonical""".stripMargin,
    // same rule literals, same longest-match window, same defaults
    "c16_robots" ->
      """WITH rules AS (
        |  SELECT * FROM (VALUES
        |    ('host0.example.com', 'disallow', '/page/1'),
        |    ('host0.example.com', 'allow', '/page/12'),
        |    ('host1.example.com', 'disallow', '/'))
        |    AS t(host, rule, path)),
        |frontier AS (
        |  SELECT DISTINCT 'https://host' || (user_id % 3)
        |    || '.example.com/page/' || (event_id % 50) AS url
        |  FROM events),
        |urls AS (
        |  SELECT url,
        |    regexp_extract(url, '^https?://([^/]+)', 1) AS host,
        |    coalesce(nullif(regexp_extract(url, '^https?://[^/]+(/.*)$', 1), ''),
        |             '/') AS url_path
        |  FROM frontier),
        |matches AS (
        |  SELECT u.url, r.rule, r.path
        |  FROM urls u LEFT JOIN rules r
        |    ON u.host = r.host AND starts_with(u.url_path, r.path)),
        |ranked AS (
        |  SELECT url, rule, path,
        |    row_number() OVER (PARTITION BY url
        |      ORDER BY length(path) DESC, rule ASC) AS rn
        |  FROM matches)
        |SELECT url,
        |  coalesce(rule <> 'disallow', true) AS allowed,
        |  rule AS matched_rule, path AS matched_path
        |FROM ranked WHERE rn = 1
        |ORDER BY url""".stripMargin)
}
