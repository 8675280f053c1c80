package graft

import org.apache.spark.sql.functions._
import graft.operators.ChunkQueries

/** Fixed-point PageRank (c15): hand-computed integer updates on tiny
  * graphs, dangling-mass redistribution, and the mass-conservation
  * bound that the floor-division leak stays within its documented
  * budget. */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  test("two-node cycle is the stationary point, bit-exact") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val out = ChunkQueries.pageRankOf(edges, 3).collect()
    // r0 = 5e11 each; contrib = (5e11*85) div 100 = 4.25e11;
    // base = 15e12 div 200 = 7.5e10; r1 = 5e11 again — stable.
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((1L, 500000000000L), (2L, 500000000000L)))
    Caches.releaseAll()
  }

  test("dangling node redistributes its mass uniformly (2 iterations, exact)") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val out = ChunkQueries.pageRankOf(edges, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // iter1: r1(1) = 7.5e10 + (5e11*85 div 200) = 287500000000
    //        r1(2) = 7.5e10 + 4.25e11 + 2.125e11 = 712500000000
    // iter2: r2(1) = 7.5e10 + (712500000000*85 div 200) = 377812500000
    //        r2(2) = 7.5e10 + (287500000000*85 div 100)
    //                + 302812500000 = 622187500000
    assert(out === Map(1L -> 377812500000L, 2L -> 622187500000L))
    Caches.releaseAll()
  }

  test("adaptive pagerank: driver-local path == distributed loop, bit-exact") {
    // chain + cycle + dangling + hub: every update case in one graph
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L),       // cycle
      (4L, 5L),                            // chain into dangling 5
      (6L, 1L), (6L, 2L), (6L, 3L)         // hub fan-out
    ).toDF("src", "dst")
    def ranks(limit: Long) = ChunkQueries.pageRankOf(edges, 3, driverLimit = limit)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val local = ranks(Long.MaxValue)
    val distributed = ranks(-1L)
    assert(local == distributed, "adaptive paths diverged")
    Caches.releaseAll()
  }

  test("mass is conserved within the floor-division leak bound") {
    // star + chain + dangling tail: heterogeneous degrees
    val edges = Seq(
      (0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (2L, 3L), (3L, 0L),
      (3L, 4L)).toDF("src", "dst")
    val iters = 3
    val out = ChunkQueries.pageRankOf(edges, iters)
    val total = out.agg(sum($"rank_e12")).as[Long].head()
    val leakBound = (7 + 5 + 1).toLong * iters // (|E|+|V|+1) per iter
    assert(total <= ChunkQueries.PrScale)
    assert(total > ChunkQueries.PrScale - leakBound)
    // the hub (3 in-edges incl. the chain's tail) outranks the leaf
    val ranks = out.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(ranks(3L) > ranks(4L))
    Caches.releaseAll()
  }

  test("c20 pointer jumping resolves a length-8 chain in 3 rounds, flags loops") {
    import spark.implicits._
    // chain 0->1->...->8 (terminal 8, longest chain = 8 hops = 2^3)
    // plus a 2-cycle that must come back unresolved
    val edges = ((0L until 8L).map(i => (i, i + 1)) ++
      Seq((100L, 101L), (101L, 100L))).toDF("src", "dst")
    val out = ChunkQueries.resolveRedirects(edges, rounds = 3)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2))),
          r.getBoolean(3))).toMap
    // every chain node lands on terminal 8 with its EXACT distance
    (0L to 8L).foreach { u =>
      assert(out(u) == (Some((8L, 8L - u)), true), s"url $u: ${out(u)}")
    }
    // loop members: unresolved, no terminal, no hop count
    Seq(100L, 101L).foreach { u => assert(out(u) == (None, false)) }
  }

  test("adaptive redirects: driver-local path == distributed jumping, bit-exact") {
    // chains of several lengths (incl. one past the 2^3 budget),
    // a cycle, and a chain feeding INTO the cycle
    val edges = ((0L until 12L).map(i => (i, i + 1)) ++
      Seq((100L, 101L), (101L, 100L), (200L, 100L))).toDF("src", "dst")
    def run(limit: Long) = ChunkQueries.resolveRedirects(edges, 3, limit)
      .collect().map(_.toSeq).toSeq
    assert(run(Long.MaxValue) == run(-1L), "adaptive paths diverged")
    Caches.releaseAll()
  }

  test("redirects: duplicate-src edges fail loudly on the driver-local path") {
    // a non-functional graph would resolve nondeterministically under
    // toMap while the distributed path fans rows out — the local twin
    // must reject it instead of silently picking a winner
    val dup = Seq((1L, 2L), (1L, 3L), (2L, 4L)).toDF("src", "dst")
    val ex = intercept[IllegalArgumentException] {
      ChunkQueries.resolveRedirects(dup, 3, Long.MaxValue).collect()
    }
    assert(ex.getMessage.contains("functional graph"))
    Caches.releaseAll()
  }

  test("adaptive BFS: driver-local path == distributed loop, bit-exact") {
    // diamond (two paths, min depth wins), cycle back to seed,
    // deep chain past maxDepth, unreachable island
    val edges = Seq(
      (0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L),  // diamond
      (3L, 0L),                                 // cycle
      (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L),   // chain past cap
      (50L, 51L)                                // unreachable
    ).toDF("src", "dst")
    def run(limit: Long) = ChunkQueries.crawlBfsOf(edges, 0L, 4, limit)
      .collect().map(_.toSeq).toSeq
    val local = run(Long.MaxValue)
    assert(local == run(-1L), "adaptive paths diverged")
    // spot semantics: min depth through the diamond, cap respected
    val m = local.map(s => s.head.asInstanceOf[Long] -> s(1).asInstanceOf[Long]).toMap
    assert(m == Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
    Caches.releaseAll()
  }

  test("adaptive sitemap resolve: driver-local path == distributed walk, bit-exact") {
    val host = "https://s.example.com"
    val docs = Seq(
      (s"$host/sitemap.xml",
        s"<sitemapindex><sitemap><loc>$host/a.xml</loc></sitemap>" +
        s"<sitemap><loc>$host/b.xml</loc></sitemap></sitemapindex>"),
      (s"$host/a.xml",
        s"<urlset><url><loc> $host/p1 </loc></url>" +
        s"<url><loc>$host/p2&amp;x=1</loc></url></urlset>"),
      (s"$host/b.xml",
        s"<sitemapindex><sitemap><loc>$host/c.xml</loc></sitemap></sitemapindex>"),
      (s"$host/c.xml",
        s"<urlset><url><loc>$host/p3</loc></url>" +
        "<url><loc>https://other.com/px</loc></url></urlset>"),
      (s"$host/orphan.xml", s"<urlset><url><loc>$host/never</loc></url></urlset>"),
      (s"$host/broken.xml", "not xml at all"))
      .toDF("url", "xml")
    def run(limit: Long) = graft.operators.Sitemap
      .resolve(docs, s"$host/sitemap.xml", "s.example.com", 3, limit)
      .orderBy($"url").collect().map(_.getString(0)).toSeq
    val local = run(Long.MaxValue)
    assert(local == run(-1L), "adaptive paths diverged")
    assert(local == Seq(s"$host/p1", s"$host/p2&x=1", s"$host/p3"))
    Caches.releaseAll()
  }
}
