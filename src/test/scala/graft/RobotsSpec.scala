package graft

import graft.operators.Robots

/** robots.txt parse + evaluate — the RFC 9309 core semantics:
  * group attribution (consecutive User-agent lines share rules),
  * longest-prefix-match precedence, Allow beats Disallow on equal
  * length, unmatched/ruleless hosts default to allowed. */
class RobotsSpec extends SparkSpec {

  import spark.implicits._

  private val robots = Seq(
    ("a.com",
      """# policy
        |User-agent: *
        |User-agent: goodbot
        |Disallow: /private
        |Allow: /private/ok
        |
        |User-agent: badbot
        |Disallow: /""".stripMargin),
    ("b.com", "User-agent: *\nDisallow:")) // empty Disallow = no rule
    .toDF("host", "robots_txt")

  private lazy val rules = Robots.parseRobots(robots)

  test("consecutive User-agent lines share the following rule group") {
    val got = rules.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSet
    assert(got === Set(
      ("a.com", "*", "disallow", "/private"),
      ("a.com", "*", "allow", "/private/ok"),
      ("a.com", "goodbot", "disallow", "/private"),
      ("a.com", "goodbot", "allow", "/private/ok"),
      ("a.com", "badbot", "disallow", "/")))
  }

  test("longest match wins; allow beats disallow; default is allowed") {
    val frontier = Seq(
      "https://a.com/private/ok/file",  // allow /private/ok (longest)
      "https://a.com/private/no",       // disallow /private
      "https://a.com/public",           // no match -> allowed
      "https://b.com/anything",         // host has zero rules -> allowed
      "https://c.com/x"                 // host absent entirely -> allowed
    ).toDF("url")
    val got = Robots.evaluate(frontier, rules)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got === Map(
      "https://a.com/private/ok/file" -> true,
      "https://a.com/private/no" -> false,
      "https://a.com/public" -> true,
      "https://b.com/anything" -> true,
      "https://c.com/x" -> true))
  }

  test("per-agent groups: badbot sees its own total ban") {
    val frontier = Seq("https://a.com/public").toDF("url")
    val got = Robots.evaluate(frontier, rules, agent = "badbot").collect().head
    assert(!got.getBoolean(1) && got.getString(3) === "/")
  }

  test("equal-length allow/disallow tie resolves to allow") {
    val r = Robots.parseRobots(Seq(
      ("t.com", "User-agent: *\nDisallow: /x\nAllow: /y")).toDF("host", "robots_txt"))
    // craft a tie: two same-length rules matching the same url require
    // same path; instead verify the ordering rule directly on /x vs /y
    val f = Seq("https://t.com/x", "https://t.com/y").toDF("url")
    val got = Robots.evaluate(f, r).collect()
      .map(row => row.getString(0) -> row.getBoolean(1)).toMap
    assert(got === Map("https://t.com/x" -> false, "https://t.com/y" -> true))
  }

  test("crawlDelays binds to the * group; schedule paces each host by its delay") {
    // delay under *, delay under another agent (ignored), no delay
    val robots = Seq(
      ("a.com", "User-agent: *\nCrawl-delay: 3\nDisallow: /x"),
      ("b.com", "User-agent: bot\nCrawl-delay: 9\nDisallow: /"),
      ("c.com", "User-agent: *\nDisallow: /z")).toDF("host", "robots_txt")
    val d = Robots.crawlDelays(robots).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(d === Map("a.com" -> 3.0, "b.com" -> 1.0, "c.com" -> 1.0))
    // the schedule over the real corpus: fetch_at is (rank-1)*delay,
    // monotone within every host, starting at 0
    val sched = Robots.c23PolitenessSchedule(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(2), r.getDouble(3), r.getDouble(4)))
    assert(sched.nonEmpty)
    sched.groupBy(_._1).foreach { case (host, rows) =>
      val ordered = rows.sortBy(_._2)
      assert(ordered.head._4 == 0.0, s"$host first slot must fire at 0")
      ordered.foreach { case (_, rank, delay, at) =>
        assert(at == (rank - 1) * delay, s"$host slot $rank pacing")
      }
    }
    // the declared host0 delay (2 s) actually reaches the schedule
    assert(sched.filter(_._1.startsWith("host0")).forall(_._3 == 2.0))
    Caches.releaseAll(); Caches.releaseShared()
  }

  test("crawlDelays: UA groups separated only by rule lines stay separate") {
    // The * group and badbot's group are separated by a Disallow line
    // only; badbot's Crawl-delay must NOT bind to agent `*`. Also:
    // consecutive UA lines (one group) DO share a following delay.
    val robots = Seq(
      ("sep.com", "User-agent: *\nDisallow: /x\nUser-agent: badbot\nCrawl-delay: 99"),
      ("dup.com", "User-agent: other\nUser-agent: *\nCrawl-delay: 4\nDisallow: /"),
      ("rep.com", "User-agent: *\nCrawl-delay: 2\nAllow: /a\nUser-agent: *\nCrawl-delay: 7"))
      .toDF("host", "robots_txt")
    val d = Robots.crawlDelays(robots).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(d === Map(
      "sep.com" -> 1.0, // badbot's 99 must not leak onto *
      "dup.com" -> 4.0, // shared group: delay binds to both agents
      "rep.com" -> 7.0)) // host repeats the directive: max wins
  }

  test("revisitIntervals adapts across two crawl waves; deleted pages retire") {
    import spark.implicits._
    // wave 1: every change class once, at a 240 s prior interval
    val wave1 = Seq(
      ("p-changed", "changed", 240.0),
      ("p-stable", "unchanged", 240.0),
      ("p-new", "new", 240.0),
      ("p-gone", "deleted", 240.0))
      .toDF("page_key", "change", "prev_interval_s")
    val out1 = Robots.revisitIntervals(wave1)
      .select($"page_key", $"next_interval_s").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out1 === Map(
      "p-changed" -> 120.0, // halved
      "p-stable" -> 480.0, // doubled
      "p-new" -> 300.0)) // default; p-gone left the schedule
    // wave 2 feeds wave 1's intervals back as priors: repeated change
    // keeps halving to the floor, repeated stability keeps doubling
    // to the cap
    val wave2 = Seq(
      ("p-changed", "changed", out1("p-changed")),
      ("p-stable", "unchanged", out1("p-stable")),
      ("p-floor", "changed", 60.0),
      ("p-cap", "unchanged", 3000.0))
      .toDF("page_key", "change", "prev_interval_s")
    val out2 = Robots.revisitIntervals(wave2)
      .select($"page_key", $"next_interval_s").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out2 === Map(
      "p-changed" -> 60.0, // 120/2
      "p-stable" -> 960.0, // 480*2
      "p-floor" -> 60.0, // floored at minS
      "p-cap" -> 3600.0)) // capped at maxS
  }

  test("c25 budget apportionment: exact Hamilton split, grants capped by pending") {
    // an odd budget forces nontrivial remainders across the 3 hosts
    val rows = Robots.c25CrawlBudget(spark, sfDir, budget = 7L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    assert(rows.map(_._4).sum == 7L, "quotas must tile the budget exactly")
    val tmass = rows.map(_._3).sum
    rows.foreach { case (h, np, m, q, g, sp) =>
      // the Hamilton guarantee: base <= quota <= base + 1
      val base = 7L * m / tmass
      assert(q == base || q == base + 1, s"$h quota $q vs base $base")
      assert(g == math.min(np, q) && sp == q - g, s"$h grant/spill wrong")
    }
    Caches.releaseAll()
  }

  test("apportionBudget survives rank mass near Long range (no 64-bit wrap)") {
    import spark.implicits._
    // two hosts whose combined e12-scaled mass ≈ 9.2e18: budget·mass
    // would wrap a 64-bit multiply (≈9.2e20), flipping quota signs
    val big = Long.MaxValue / 2 - 7
    val frontier = Seq(
      ("a.com", big), ("b.com", big), ("b.com", big))
      .toDF("host", "rank_e12")
    val rows = Robots.apportionBudget(frontier, budget = 100L)
      .orderBy($"host").collect()
      .map(r => (r.getString(0), r.getLong(3)))
    // exact Hamilton split of 100 over mass ratio 1:2
    assert(rows.toSeq == Seq(("a.com", 33L), ("b.com", 67L)))
    Caches.releaseAll()
  }

  test("hierarchical apportionment: two-level quotas tile the budget; single TLD ≡ flat Hamilton") {
    import spark.implicits._
    // multi-TLD frontier with uneven mass and nontrivial remainders
    val frontier = Seq(
      ("a.com", 5L), ("a.com", 2L), ("b.com", 9L), ("c.com", 1L),
      ("x.org", 4L), ("y.org", 4L), ("z.org", 3L),
      ("q.net", 6L))
      .toDF("host", "rank_e12")
    val budget = 17L
    val rows = Robots.apportionBudgetHierarchical(frontier, budget)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.map(_._5).sum == budget, "host quotas must tile the budget")
    // per-TLD quotas tile the TLD's level-1 grant: recompute level 1
    // by hand from the masses
    val byTld = rows.groupBy(_._2)
    val masses = byTld.view.mapValues(_.map(_._4).sum).toMap
    val gmass = masses.values.sum
    val bases = masses.view.mapValues(m => budget * m / gmass).toMap
    val rems = masses.map { case (t, m) => t -> (budget * m) % gmass }
    val short = budget - bases.values.sum
    val topUp = rems.toSeq.sortBy { case (t, r) => (-r, t) }
      .take(short.toInt).map(_._1).toSet
    byTld.foreach { case (tld, hs) =>
      val expected = bases(tld) + (if (topUp(tld)) 1L else 0L)
      assert(hs.map(_._5).sum == expected,
        s"$tld host quotas ${hs.map(_._5).sum} must tile its grant $expected")
      // the Hamilton guarantee holds within the TLD
      hs.foreach { case (h, _, np, m, q, g, sp) =>
        val base = expected * m / masses(tld)
        assert(q == base || q == base + 1, s"$h quota $q vs base $base")
        assert(g == math.min(np, q) && sp == q - g)
      }
    }
    // single-TLD corpus: the two-level split degenerates to flat
    val single = frontier.filter($"host".endsWith(".org"))
    val flat = Robots.apportionBudget(single, 11L).collect()
      .map(r => (r.getString(0), r.getLong(3))).toSeq
    val hier = Robots.apportionBudgetHierarchical(single, 11L).collect()
      .map(r => (r.getString(0), r.getLong(4))).toSeq
    assert(hier == flat, "single TLD must equal flat Hamilton exactly")
    Caches.releaseAll()
  }

  test("hierarchical apportionment: a zero-mass TLD still gets integer quotas") {
    import spark.implicits._
    // .net's hosts all carry zero rank mass — tmass_w = 0 would null
    // the in-TLD div/mod without the short-circuit
    val frontier = Seq(
      ("a.com", 5L), ("b.com", 9L),
      ("x.net", 0L), ("y.net", 0L), ("z.net", 0L))
      .toDF("host", "rank_e12")
    val rows = Robots.apportionBudgetHierarchical(frontier, 10L).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(4)))
    assert(rows.map(_._3).sum == 10L, "quotas still tile the budget")
    val net = rows.filter(_._2 == "net")
    assert(net.length == 3 && net.forall(_._3 >= 0L),
      s"zero-mass TLD hosts must carry integer (non-null) quotas: ${net.toSeq}")
    // flat and hierarchical agree on the zero-mass hosts' treatment:
    // no crash, no null, remainder split by the deterministic
    // host tie-break
    val netQuota = net.map(_._3).sum
    assert(net.sortBy(_._1).map(_._3).toSeq ==
      (0 until 3).map(i => if (i < netQuota) 1L else 0L),
      "a zero-mass TLD's grant splits 1-per-host in host order")
    Caches.releaseAll()
  }

  test("count-gated auto apportionment switches flat -> hierarchical at the host threshold") {
    import spark.implicits._
    val frontier = Seq(
      ("a.com", 5L), ("a.com", 2L), ("b.com", 9L), ("c.com", 1L),
      ("x.org", 4L), ("y.org", 4L), ("z.org", 3L), ("q.net", 6L))
      .toDF("host", "rank_e12")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    // below the switch: exactly the flat form
    assert(rows(Robots.apportionBudgetAuto(frontier, 17L, hostSwitch = 100L)) ==
      rows(Robots.apportionBudget(frontier, 17L)))
    // above the switch: exactly the hierarchical form (flat schema)
    assert(rows(Robots.apportionBudgetAuto(frontier, 17L, hostSwitch = 3L)) ==
      rows(Robots.apportionBudgetHierarchical(frontier, 17L)
        .select($"host", $"n_pending", $"mass", $"quota", $"granted",
          $"spilled").orderBy($"host")))
    // single-TLD frontier: the two paths agree, so the switch is
    // invisible in the quotas — the safe-degeneration contract
    val single = frontier.filter($"host".endsWith(".org"))
    assert(rows(Robots.apportionBudgetAuto(single, 11L, hostSwitch = 1L)) ==
      rows(Robots.apportionBudget(single, 11L)))
    Caches.releaseAll()
  }

  test("paceByHost window ≡ the serial-queue recurrence t_k = max(due_k, t_(k-1)+delay)") {
    import spark.implicits._
    // one host, delay 10: due times force both recurrence branches
    // (slot waiting on its due time, and slot pushed by the queue)
    val due = Seq(
      ("h.com", 1L, 5.0, 10.0), ("h.com", 2L, 8.0, 10.0),
      ("h.com", 3L, 40.0, 10.0), ("h.com", 4L, 41.0, 10.0),
      ("quiet.com", 9L, 7.0, 2.0))
      .toDF("host", "doc_id", "due_in_s", "crawl_delay_s")
    val out = Robots.paceByHost(due, "doc_id")
      .orderBy($"host", $"host_rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(5)))
    // replay the recurrence directly
    assert(out.toSeq === Seq(
      ("h.com", 1L, 5.0), // t1 = due
      ("h.com", 2L, 15.0), // max(8, 5+10)
      ("h.com", 3L, 40.0), // max(40, 25) — due wins again
      ("h.com", 4L, 50.0), // max(41, 50) — queue wins
      ("quiet.com", 9L, 7.0)))
    // the oracle-gated composition returns rows for every surviving
    // page and never schedules a deleted one
    val c24 = Robots.c24RecrawlSchedule(spark, sfDir)
    assert(c24.filter($"change" === "deleted").count() == 0)
    assert(c24.count() > 0)
    Caches.releaseAll()
  }
}
