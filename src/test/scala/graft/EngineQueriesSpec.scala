package graft

import graft.operators.EngineQueries

class EngineQueriesSpec extends SparkSpec {

  test("every engine query runs and returns rows at sf0.001") {
    EngineQueries.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("q53 replicates the reference stuck-sweep transition table") {
    import spark.implicits._
    // reference semantics (source/repo.go ResetStuckPages +
    // job retries): processing & past cutoff & attempts<3 → reset to
    // pending/timeout_reset/attempts+1; processing & past cutoff &
    // attempts exhausted → failed/retries_exhausted; all else
    // untouched. event_id encodes status (%5∈{1,2}=processing) and
    // attempts (%4); the LAST event pins the clock (cutoff=max-1h).
    val now = java.sql.Timestamp.valueOf("2024-06-01 12:00:00")
    def at(minAgo: Int) =
      new java.sql.Timestamp(now.getTime - minAgo * 60000L)
    val rows = Seq(
      (1L, at(120)),  // processing, attempts 1, old      → reset
      (6L, at(120)),  // processing, attempts 2, old      → reset
      (11L, at(120)), // processing, attempts 3, old      → failed
      (2L, at(10)),   // processing, attempts 2, recent   → untouched
      (5L, at(120)),  // pending, old                     → untouched
      (3L, at(120)),  // completed, old                   → untouched
      (4L, now))      // failed; pins max(ts)             → untouched
    val dir = java.nio.file.Files.createTempDirectory("graft-jobs").toString
    rows.map { case (id, ts) => (id, ts, id, "x", 0.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EngineQueries.q53StuckJobs(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getString(4), r.getString(5), r.getInt(6), r.getString(7))).toMap
    assert(got(1L) == (("reset", "pending", 2, "timeout_reset")))
    assert(got(6L) == (("reset", "pending", 3, "timeout_reset")))
    assert(got(11L) == (("failed", "failed", 3, "retries_exhausted")))
    assert(got(2L) == (("untouched", "processing", 2, null)))
    assert(got(5L) == (("untouched", "pending", 1, null)))
    assert(got(3L) == (("untouched", "completed", 3, null)))
    assert(got(4L) == (("untouched", "failed", 0, null)))
  }

  test("q1 aggregates are grouped by (returnflag, linestatus)") {
    val rows = EngineQueries.q1Agg(spark, sfDir).collect()
    assert(rows.length <= 6) // 3 flags x 2 statuses max
    val flags = rows.map(r => (r.getString(0), r.getString(1))).toSeq
    assert(flags.distinct.length == flags.length)
  }

  test("q7 window emits at most 3 rows per customer, ranked") {
    val rows = EngineQueries.q7Window(spark, sfDir).collect()
    val perCust = rows.groupBy(_.getLong(0))
    assert(perCust.values.forall(_.length <= 3))
    perCust.values.foreach { rs =>
      val ranks = rs.map(_.getInt(3)).sorted.toSeq
      assert(ranks == (1 to rs.length))
    }
  }

  test("q9 semi/anti: no selected customer has an F-status order") {
    import spark.implicits._
    val selected = EngineQueries.q9SemiAnti(spark, sfDir)
      .select($"c_custkey").as[Long].collect().toSet
    val withF = Tables.orders(spark, sfDir)
      .filter($"o_orderstatus" === "F")
      .select($"o_custkey").distinct().as[Long].collect().toSet
    assert(selected.intersect(withF).isEmpty)
  }

  test("q12 sessions are between 1 and event count per user") {
    val rows = EngineQueries.q12EventsSessionize(spark, sfDir).collect()
    rows.foreach { r =>
      val sessions = r.getLong(1); val n = r.getLong(2)
      assert(sessions >= 1 && sessions <= n)
    }
  }

  test("q23 keeps only orders whose line quantities sum above 300") {
    import spark.implicits._
    import org.apache.spark.sql.functions.sum
    val rows = EngineQueries.q23LargeOrders(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(5) > 300.0))
    // every qualifying order appears exactly once
    val expected = Tables.lineitem(spark, sfDir)
      .groupBy($"l_orderkey").agg(sum($"l_quantity").as("s"))
      .filter($"s" > 300.0).count()
    assert(rows.length == math.min(expected, 100))
    assert(rows.map(_.getLong(2)).distinct.length == rows.length)
  }

  test("q24 rolling 7-day revenue includes the order's own price") {
    val rows = EngineQueries.q24RollingRevenue(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // the frame always contains the current row, so rev_7d >= own price
    rows.foreach(r => assert(r.getDouble(3) >= r.getDouble(2) - 0.01))
    // a customer's first-ever order has rev_7d equal to its own price
    val byCust = rows.groupBy(_.getLong(0))
    assert(byCust.values.exists(rs =>
      rs.exists(r => math.abs(r.getDouble(3) - r.getDouble(2)) < 0.01)))
  }

  test("q25 HLL estimate lands within 3 standard errors of exact") {
    val r = EngineQueries.q25HllDistinct(spark, sfDir).collect().head
    val est = r.getDouble(0); val exact = r.getLong(1)
    assert(exact > 0 && est > 0)
    // m=256 -> standard error 1.04/16 = 6.5%; 3σ bound ≈ 19.5%
    assert(math.abs(est / exact - 1.0) < 0.195,
      s"estimate $est too far from exact $exact")
  }

  test("q26 Pareto prefix is revenue-sorted and crosses 80% exactly once") {
    val rows = EngineQueries.q26ParetoCut(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getDouble(1)).toSeq
    assert(revs == revs.sorted.reverse, "prefix must be revenue-descending")
    val shares = rows.map(_.getDouble(2)).toSeq
    assert(shares == shares.sorted, "cumulative share must be monotone")
    // only the boundary row may cross 80%
    assert(shares.dropRight(1).forall(_ < 80.0))
    assert(shares.last >= 80.0 - 1e-9 || {
      // degenerate tiny corpus: every customer needed
      val total = Tables.orders(spark, sfDir).select("o_custkey").distinct().count()
      rows.length == total
    })
  }

  test("q25 sketches merge losslessly: sketch(A∪B) == max-merge of halves") {
    import spark.implicits._
    import org.apache.spark.sql.functions.max
    val keys = Tables.lineitem(spark, sfDir).select($"l_orderkey")
    def regMap(df: org.apache.spark.sql.DataFrame) =
      EngineQueries.hllRegistersOf(df).collect()
        .map(r => r.getInt(0) -> r.getInt(1)).toMap
    val whole = regMap(keys)
    val a = EngineQueries.hllRegistersOf(keys.filter($"l_orderkey" % 2 === 0))
    val b = EngineQueries.hllRegistersOf(keys.filter($"l_orderkey" % 2 =!= 0))
    val merged = a.unionByName(b)
      .groupBy($"register").agg(max($"mj").as("mj")).collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(merged == whole,
      "register-wise max of partial sketches must equal the whole-corpus sketch")
  }

  test("q27 CM sketches merge linearly: cells(A∪B) == per-cell sum of halves") {
    import spark.implicits._
    import org.apache.spark.sql.functions.sum
    val keys = Tables.lineitem(spark, sfDir).select($"l_partkey")
    def cellMap(df: org.apache.spark.sql.DataFrame) =
      EngineQueries.cmCellsOf(df).collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val whole = cellMap(keys)
    val a = EngineQueries.cmCellsOf(keys.filter($"l_partkey" % 2 === 0))
    val b = EngineQueries.cmCellsOf(keys.filter($"l_partkey" % 2 =!= 0))
    val merged = a.unionByName(b)
      .groupBy($"j", $"bucket").agg(sum($"c").as("c")).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(merged == whole,
      "cell-wise sum of partial sketches must equal the whole-corpus sketch")
  }

  test("q27 estimates never undercount (the one-sided CM error bound)") {
    val df = EngineQueries.q27HeavyHitters(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty, "threshold should admit some heavy parts")
    assert(rows.forall(r => r.getLong(2) >= r.getLong(1)),
      "CM estimate must be >= the exact count for every reported key")
  }

  test("q18 as-of join never plans a nested-loop join") {
    val df = EngineQueries.q18AsofJoin(spark, sfDir)
    assert(!df.queryExecution.executedPlan.toString.contains("NestedLoop"),
      "as-of must be union+window, not an inequality join")
    // sanity: matched probes carry an event at or before their ts
    assert(df.count() > 0)
  }

  test("q19 binned range join plans as an equi join, not BNLJ") {
    val df = EngineQueries.q19RangeJoin(spark, sfDir)
    assert(!df.queryExecution.executedPlan.toString.contains("NestedLoop"),
      "range join must ride the day-bin equi key")
    assert(df.count() > 0)
  }

  test("broadcast hints survive to the physical plan in q5") {
    val plan = EngineQueries.q5StarJoin(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "expected broadcast joins for dims")
  }

  test("q42 Morton key matches a bit-twiddling reference and orders quadrants") {
    import spark.implicits._
    def ref(x: Long, y: Long): Long = {
      var z = 0L
      for (i <- 0 until 16)
        z += (((x >> i) & 1L) << (2 * i)) + (((y >> i) & 1L) << (2 * i + 1))
      z
    }
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (255L, 255L), (256L, 0L),
      (512L, 512L), (65535L, 65535L), (12345L, 54321L))
    val got = pts.toDF("x", "y")
      .select($"x", $"y", EngineQueries.mortonKey($"x", $"y").as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == ref(x, y), s"morton($x,$y)")
    }
    // the z-order locality property: every point of the low quadrant
    // (both coords < 256) sorts before any point with both >= 512
    assert(got((255L, 255L)) < got((512L, 512L)))
    assert(got((65535L, 65535L)) == (1L << 32) - 1)
  }

  test("q28 Bloom prune is one-sided: no false negatives, bounded pass set") {
    val r = EngineQueries.q28BloomJoin(spark, sfDir).collect().head
    val (nProbe, nPass, nTrue) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nTrue <= nPass, "Bloom may overestimate, never underestimate")
    assert(nPass <= nProbe)
    assert(nTrue > 0, "EUROPE suppliers must match some lineitems")
    Caches.releaseAll()
  }

  test("q48 MAD outliers: every flag exceeds the cut, tails only") {
    val rows = EngineQueries.q48MadOutliers(spark, sfDir).collect()
    assert(rows.nonEmpty, "events.value has a heavy tail — flags expected")
    // flags are genuinely extreme and rare relative to the table
    rows.foreach(r => assert(math.abs(r.getDouble(3)) > 3.5))
    val total = Tables.events(spark, sfDir).count()
    assert(rows.length < total / 10,
      s"${rows.length} of $total flagged — MAD cut should hit tails only")
    Caches.releaseAll()
  }

  test("q51 transitions conserve the session-event count identity") {
    import spark.implicits._
    import org.apache.spark.sql.functions.sum
    // within-session adjacent pairs = events - sessions (each session
    // of length n contributes n-1 transitions)
    val transitions = EngineQueries.q51SessionPaths(spark, sfDir)
      .agg(sum($"n_transitions")).head.getLong(0)
    val sess = EngineQueries.q12EventsSessionize(spark, sfDir)
      .agg(sum($"sessions"), sum($"n_events")).head
    assert(transitions == sess.getLong(1) - sess.getLong(0))
  }

  test("q52 retention: offset-0 counts every cohort user, decays after") {
    val rows = EngineQueries.q52RetentionCohorts(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getLong(0))
    byCohort.foreach { case (_, rs) =>
      val at0 = rs.find(_.getLong(1) == 0L).get.getLong(2)
      // day 0 is the cohort's maximum (everyone is active on their
      // first day)
      assert(rs.forall(_.getLong(2) <= at0))
    }
    Caches.releaseAll()
  }

  test("q47 SCD2 intervals tile each entity's history exactly") {
    val rows = EngineQueries.q47Scd2(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, hist) =>
      val ordered = hist.sortBy(_.getLong(1))
      // versions are dense from 1
      assert(ordered.map(_.getLong(1)).toSeq == (1L to ordered.length))
      // exactly one open (current) interval, and it is the last
      assert(ordered.count(_.getBoolean(5)) == 1 && ordered.last.getBoolean(5))
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          // contiguous: each interval closes where the next opens
          assert(a.getTimestamp(4) == b.getTimestamp(3))
          // collapsed: consecutive versions differ in the attribute
          assert(a.getString(2) != b.getString(2))
        case _ =>
      }
    }
  }

  test("q54 state merge equals a single-pass aggregate for any cutoff") {
    // the merged base+delta state must be cutoff-invariant: every
    // cutoff (including empty-base and empty-delta extremes)
    // reproduces the same standing view
    val full = EngineQueries.q54IncrementalAgg(spark, sfDir, "2199-01-01")
      .collect().map(_.toSeq).toSeq
    assert(full.nonEmpty)
    Seq("1900-01-01", "1994-06-17", "1996-01-01").foreach { cut =>
      val merged = EngineQueries.q54IncrementalAgg(spark, sfDir, cut)
        .collect().map(_.toSeq).toSeq
      assert(merged == full, s"cutoff $cut diverged from single-pass view")
    }
  }
}
