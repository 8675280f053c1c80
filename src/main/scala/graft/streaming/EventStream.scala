package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.Tables

/** Structured Streaming over the events stream (SURVEY.md §2.H).
  *
  * The same transformation serves both modes: `withWatermark` is a
  * no-op on batch inputs, so the driver-checked batch query
  * (st1_window_agg) and the readStream pipeline (exercised with
  * MemoryStream in StreamingSpec) share one definition — the
  * Spark-idiomatic way to keep a lambda/kappa pair consistent.
  *
  * At scale: tumbling-window agg with a watermark bounds state; the
  * shuffle keys on (window, event_type) and partial aggregation
  * happens map-side before the exchange.
  */
object EventStream {

  /** Tumbling 1-hour window counts/sums per event_type, 10-minute
    * watermark for late data. */
  def windowedAgg(events: DataFrame): DataFrame =
    hourlyAgg(events.withWatermark("ts", "10 minutes"))

  /** The tumbling-hour aggregate WITHOUT its own watermark — so a
    * chain that already declared one (st9's dedup stage) can reuse
    * the aggregate body: a stream may define its watermark only
    * once. */
  private def hourlyAgg(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n_events"),
           round(sum($"value"), 4).as("sum_value"))
      .select($"window.start".as("window_start"), $"event_type",
              $"n_events", $"sum_value")
  }

  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp)
  final case class SessionState(count: Long, lastMillis: Long)
  final case class UserSessions(user_id: Long, sessions: Long)

  /** Stateful sessionization via mapGroupsWithState: 30-min-gap
    * session counting with per-user state that survives across
    * streaming triggers (KeyValueGroupedDataset custom state — the
    * streaming twin of the batch window/lag query q12). In batch mode
    * each group is processed once with empty initial state, so the
    * result equals q12's — asserted in StreamingSpec. */
  def sessionizeStateful(events: org.apache.spark.sql.Dataset[SessionEvent],
                         gapMinutes: Int = 30)
      : org.apache.spark.sql.Dataset[UserSessions] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    events.groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, UserSessions](GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          var (count, last) = state.getOption
            .map(s => (s.count, s.lastMillis)).getOrElse((0L, Long.MinValue))
          evs.toSeq.sortBy(_.ts.getTime).foreach { e =>
            val t = e.ts.getTime
            if (last == Long.MinValue || t - last > gapMinutes * 60000L) count += 1
            last = t
          }
          state.update(SessionState(count, last))
          UserSessions(uid, count)
      }
  }

  final case class FunnelEvent(user_id: Long, event_type: String,
                               ts: java.sql.Timestamp)
  final case class FunnelState(v: Long, c: Long, p: Long)
  final case class FunnelVerdict(user_id: Long, converted: Int)

  /** Stateful funnel detection via flatMapGroupsWithState — the
    * streaming twin of the batch funnel query q13: per user, keep the
    * earliest view/click/purchase timestamps as custom state and emit
    * the user's current verdict (converted iff first view < first
    * click < first purchase) every trigger. Unlike a windowed agg,
    * the verdict can FLIP when an earlier event arrives in a later
    * trigger (a click that predates the stored view un-converts the
    * ordering) — exactly the re-emission semantics Update-mode
    * flatMapGroupsWithState exists for. In batch mode each group is
    * processed once with empty initial state, so the result equals
    * q13's — that equivalence is the st4 driver check, and
    * StreamingSpec drives the cross-trigger state path. */
  def funnelStateful(events: org.apache.spark.sql.Dataset[FunnelEvent])
      : org.apache.spark.sql.Dataset[FunnelVerdict] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val None_ = Long.MaxValue
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelVerdict](
          OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          var s = state.getOption.getOrElse(FunnelState(None_, None_, None_))
          evs.foreach { e =>
            // microsecond precision: getTime truncates to millis, and
            // the events table carries µs — a same-millisecond pair
            // would order differently than the batch comparison
            val t = e.ts.getTime / 1000 * 1000000L + e.ts.getNanos / 1000
            e.event_type match {
              case "view"     => if (t < s.v) s = s.copy(v = t)
              case "click"    => if (t < s.c) s = s.copy(c = t)
              case "purchase" => if (t < s.p) s = s.copy(p = t)
              case _          => ()
            }
          }
          state.update(s)
          val converted =
            s.v != None_ && s.c != None_ && s.p != None_ && s.v < s.c && s.c < s.p
          Iterator.single(FunnelVerdict(uid, if (converted) 1 else 0))
      }
  }

  /** Streaming exact dedup — the streaming twin of d1_dedup_exact for
    * a continuously-ingested corpus: keep the first occurrence of each
    * content fingerprint, with the watermark bounding the seen-keys
    * state (duplicates arriving later than the watermark horizon pass
    * through — the deliberate state/recall trade every streaming dedup
    * makes; the batch d1 pass mops up on the lakehouse side). */
  def dedupStream(docs: DataFrame, idCol: String = "fingerprint",
                  watermark: String = "10 minutes"): DataFrame =
    docs
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCol)

  /** Watermarked stream-stream INTERVAL join — click attribution:
    * each click pairs with every view by the same user at most
    * `windowMinutes` before it. Both sides carry watermarks and the
    * join condition carries the time bound, which is exactly what
    * lets Structured Streaming expire buffered rows instead of
    * holding both streams forever — the canonical bounded-state
    * stream-stream join. On batch inputs the watermark is a no-op
    * and the same definition is the batch attribution query
    * (st2_interval_join), keeping the lambda/kappa pair consistent.
    * The join keys on user_id (one hash exchange per side); the time
    * predicate is a post-filter, never a nested-loop join. */
  def attributeClicks(views: DataFrame, clicks: DataFrame,
                      windowMinutes: Int = 10): DataFrame = {
    val v = views.select(col("user_id"), col("ts").as("view_ts"))
      .withWatermark("view_ts", s"$windowMinutes minutes")
    val c = clicks.select(col("user_id").as("c_user_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", s"$windowMinutes minutes")
    v.join(c,
        col("user_id") === col("c_user_id") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") < col("view_ts") + expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("user_id"), col("view_ts"), col("click_ts"))
  }

  /** Watermarked stream-stream LEFT OUTER interval join —
    * attribution with explicit NON-conversion: every view emits,
    * paired row-per-click when clicks arrive, null-padded once the
    * engine can PROVE no click can match anymore (both watermarks
    * past view_ts + window, i.e. state expiry). The null rows are
    * late by construction — outer results wait for expiry, the price
    * of correctness on unbounded streams. On batch inputs the same
    * definition emits them immediately (st7's driver-checked batch
    * mirror), keeping the lambda/kappa pair consistent. Same state
    * bound and join shape as [[attributeClicks]]. */
  def attributeClicksOuter(views: DataFrame, clicks: DataFrame,
                           windowMinutes: Int = 10): DataFrame = {
    val v = views.select(col("user_id"), col("ts").as("view_ts"))
      .withWatermark("view_ts", s"$windowMinutes minutes")
    val c = clicks.select(col("user_id").as("c_user_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", s"$windowMinutes minutes")
    v.join(c,
        col("user_id") === col("c_user_id") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") < col("view_ts") + expr(s"INTERVAL $windowMinutes MINUTES"),
        "left_outer")
      .select(col("user_id"), col("view_ts"), col("click_ts"))
  }

  /** Session-window aggregation via the NATIVE `session_window`
    * function — dynamic gap-merged windows whose state the streaming
    * engine maintains and merges itself (the built-in alternative to
    * [[sessionizeStateful]]'s hand-rolled mapGroupsWithState; prefer
    * this when per-session aggregates are all you need, the custom
    * state when session logic goes beyond gap-merge). Same shared
    * batch/stream definition as [[windowedAgg]]: the watermark is a
    * no-op on batch inputs and bounds session state on streams.
    * Merge rule: an event extends a session while its ts <= previous
    * ts + gap (windows that merely TOUCH at the boundary merge);
    * session_end = last ts + gap. Shuffle keys on
    * (user_id); partial session merge happens map-side. */
  def sessionWindowAgg(events: DataFrame, gap: String = "30 minutes"): DataFrame = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupBy($"user_id", session_window($"ts", gap))
      .agg(count(lit(1)).as("n_events"),
           round(sum($"value"), 4).as("sum_value"))
      .select($"user_id",
              $"session_window.start".as("session_start"),
              $"session_window.end".as("session_end"),
              $"n_events", $"sum_value")
  }

  /** STREAM-STATIC enrichment join — the remaining core Structured
    * Streaming join mode next to [[attributeClicks]]'s stream-stream
    * interval join: a streaming event feed joined to a static
    * dimension table (the classic clickstream × customer-dim
    * enrichment). The static side is hinted broadcast — no state, no
    * watermark bookkeeping on the dimension, each micro-batch hash-maps
    * against the same in-memory relation (on a cluster: one broadcast
    * per executor, re-broadcast only when the dim is reloaded). The
    * windowed agg downstream keys its shuffle on
    * (window, c_mktsegment) with map-side partial aggregation; the
    * watermark bounds the window state exactly as in [[windowedAgg]].
    * Batch/stream share the definition (watermark is a batch no-op). */
  def enrichedSegmentAgg(events: DataFrame, customers: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .join(broadcast(customers.select($"c_custkey", $"c_mktsegment")),
            $"user_id" === $"c_custkey")
      .groupBy(window($"ts", "1 hour"), $"c_mktsegment")
      .agg(count(lit(1)).as("n_events"),
           round(sum($"value"), 4).as("sum_value"))
      .select($"window.start".as("window_start"), $"c_mktsegment",
              $"n_events", $"sum_value")
  }

  /** Batch mirror of the stream-static enrichment (driver-checked). */
  def st5EnrichedAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    enrichedSegmentAgg(Tables.events(spark, dir),
                       graft.Tables.customer(spark, dir))
      .orderBy($"window_start", $"c_mktsegment")
  }

  /** SLIDING-window aggregation — the overlapping-window mode next to
    * [[windowedAgg]]'s tumbling and [[sessionWindowAgg]]'s gap-merged
    * windows: 1-hour windows sliding every 15 minutes, so each event
    * contributes to exactly 4 windows (the trailing-hour dashboard
    * read every monitoring stack serves). The engine expands each row
    * to its covering windows BEFORE the shuffle, so the exchange keys
    * on (window, event_type) with map-side partial aggregation — 4×
    * row fan-out, same single-exchange shape. Watermark bounds the
    * open-window state on streams; batch/stream share the
    * definition. */
  def slidingAgg(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour", "15 minutes"), $"event_type")
      .agg(count(lit(1)).as("n_events"),
           round(sum($"value"), 4).as("sum_value"))
      .select($"window.start".as("window_start"), $"event_type",
              $"n_events", $"sum_value")
  }

  /** Batch mirror of the sliding-window agg (driver-checked). */
  def st6SlidingWindow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    slidingAgg(Tables.events(spark, dir))
      .orderBy($"window_start", $"event_type")
  }

  /** Batch mirror of the native session-window agg (driver-checked;
    * the oracle is the classic gaps-and-islands rewrite). */
  def st3SessionWindow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    sessionWindowAgg(Tables.events(spark, dir))
      .orderBy($"user_id", $"session_start")
  }

  /** Batch mirror of the streaming aggregation (driver-checked). */
  def st1WindowAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    windowedAgg(Tables.events(spark, dir))
      .orderBy($"window_start", $"event_type")
  }

  /** Batch mirror of the interval join (driver-checked): attributed
    * (view, click) pair counts per user. */
  def st2IntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    attributeClicks(
        ev.filter($"event_type" === "view"),
        ev.filter($"event_type" === "click"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_attributed"))
      .orderBy($"user_id")
  }

  /** Batch mirror of the LEFT OUTER interval join (driver-checked):
    * per-user conversion accounting — attributed pairs AND
    * unconverted views, the funnel-denominator row the inner join
    * (st2) structurally cannot produce. */
  def st7OuterAttribution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    attributeClicksOuter(
        ev.filter($"event_type" === "view"),
        ev.filter($"event_type" === "click"))
      .groupBy($"user_id")
      .agg(count($"click_ts").as("n_attributed"),
        count(when($"click_ts".isNull, lit(1))).as("n_unconverted"))
      .orderBy($"user_id")
  }

  /** Batch mirror of the stateful funnel (driver-checked against the
    * q13 oracle — the equivalence IS the check). */
  def st4FunnelStateful(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    funnelStateful(
        Tables.events(spark, dir)
          .select($"user_id", $"event_type", $"ts").as[FunnelEvent])
      .toDF()
      .orderBy($"user_id")
  }

  /** Windowed event-type counts feeding a TRENDING top-k: the
    * engine maintains the incrementally-updatable part (watermarked
    * windowed counts — same state shape as [[windowedAgg]]); the
    * RANKING happens in the sink each trigger ([[rankTrending]] in
    * foreachBatch), because a rank is not incrementally maintainable
    * under updates — the standard split in production trending
    * pipelines (aggregate in the engine, rank at serve time). */
  def trendingCounts(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n_events"))
      .select($"window.start".as("window_start"), $"event_type", $"n_events")
  }

  /** Per-window top-k over a counts frame (sink-side each trigger on
    * streams; the same call IS the batch query). Rides the
    * TopKPerKey window rewrite. */
  def rankTrending(counts: DataFrame, k: Int = 3): DataFrame = {
    import counts.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"window_start")
      .orderBy($"n_events".desc, $"event_type")
    counts
      .withColumn("rnk", org.apache.spark.sql.functions.row_number().over(w))
      .filter($"rnk" <= k)
  }

  final case class OrderEvent(o_orderpriority: String,
                              o_orderdate: java.sql.Timestamp,
                              o_totalprice: Double)

  /** st14: STREAMING incremental-aggregate maintenance — q54's
    * standing per-(priority, year) rollup kept current BY THE ENGINE:
    * a streaming groupBy holds the (count, sum, min, max) algebraic
    * state and every micro-batch merges in exactly the monoid step
    * q54 performs across its base/delta batches — Structured
    * Streaming's stateful aggregation IS incremental view
    * maintenance, with the same decimal(18,2) money state so merge
    * order (micro-batch boundaries) can't perturb a cent. Complete
    * output mode serves the whole standing view per trigger; state is
    * group-cardinality-bounded (priorities × years), not
    * input-bounded. Batch-gated against q54 in StreamingSpec: any
    * batch split must reproduce the single-pass view row for row. */
  def incrementalAggStream(orders: DataFrame): DataFrame = {
    import orders.sparkSession.implicits._
    orders
      .select($"o_orderpriority",
        year($"o_orderdate").cast("long").as("o_year"),
        $"o_totalprice".cast("decimal(18,2)").as("price"))
      .groupBy($"o_orderpriority", $"o_year")
      .agg(count(lit(1)).cast("long").as("n_orders"),
           sum($"price").as("sm"),
           min($"price").as("mn"), max($"price").as("mx"))
      .select($"o_orderpriority", $"o_year", $"n_orders",
        round($"sm".cast("double"), 2).as("total_price"),
        round($"sm".cast("double") / $"n_orders", 4).as("avg_price"),
        $"mn".cast("double").as("min_price"),
        $"mx".cast("double").as("max_price"))
  }

  final case class ScdEvent(user_id: Long, ts: java.sql.Timestamp,
                            event_id: Long, attr: String)
  final case class ScdState(attr: String, from: java.sql.Timestamp,
                            version: Long)
  final case class ScdInterval(user_id: Long, version: Long, attr: String,
                               valid_from: java.sql.Timestamp,
                               valid_to: java.sql.Timestamp)

  /** st11: STREAMING SCD2 — q47's history build as a continuously
    * maintained dimension: a CDC change feed in, closed versioned
    * intervals out, the open (current) interval living in keyed
    * state. flatMapGroupsWithState keyed on the entity: per trigger
    * the group's fresh events apply in (ts, event_id) order; an
    * attribute change CLOSES the open interval (emitted, append
    * mode — emitted history is immutable) and opens the next
    * version. Relies on per-key ordered delivery ACROSS triggers —
    * exactly what a partitioned log (Kafka/Debezium per-key
    * ordering) guarantees, the standard CDC contract; cross-trigger
    * reordering would need retractions no append sink supports.
    * State per entity is O(1): one open interval. Batch-gated
    * against q47's closed intervals in StreamingSpec. */
  def scd2Stream(events: org.apache.spark.sql.Dataset[ScdEvent])
      : org.apache.spark.sql.Dataset[ScdInterval] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[ScdState, ScdInterval](
          OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[ScdEvent], state: GroupState[ScdState]) =>
          val ordered = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val out = scala.collection.mutable.ArrayBuffer[ScdInterval]()
          var st = state.getOption.orNull
          ordered.foreach { e =>
            if (st == null) st = ScdState(e.attr, e.ts, 1L)
            else if (st.attr != e.attr) {
              out += ScdInterval(uid, st.version, st.attr, st.from, e.ts)
              st = ScdState(e.attr, e.ts, st.version + 1L)
            }
          }
          if (st != null) state.update(st)
          out.iterator
      }
  }

  /** CMS hash family for the sketch-trending state (same
    * multiplicative family as q27's batch sketch; deterministic
    * constants, so streaming cells and the oracle replay agree). */
  private val (csA, csB) = graft.functions.HashFunctions.permConstants(4)
  private[graft] val SketchDepth = 4
  private[graft] val SketchWidth = 4096L

  /** st10: windowed COUNT-MIN SKETCH state — trending with state
    * bounded by the sketch, not the key cardinality. st8's exact
    * counts keep one state row per (window, key): correct, but a
    * high-cardinality key (url, user) makes streaming state grow
    * with the corpus. The CMS is the standard fix: each event
    * increments d=4 hashed cells, the engine maintains only
    * (window, j, bucket) counts — at most d·w rows per window no
    * matter how many distinct keys — and the sketch is LINEAR, so
    * partial (map-side) aggregation and cross-shard merges are plain
    * addition. Order-independent by construction (sums), hence
    * exactly reproducible under any arrival order — unlike
    * SpaceSaving-style eviction sketches whose state depends on
    * arrival history. Estimates read the cells at serve time
    * ([[probeSketch]] in foreachBatch, the st8 engine/sink split):
    * est(key) = min_j cells[j][h_j(key)], an overestimate by at most
    * the collision mass. */
  def sketchCells(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    graft.plans.GraftFunctions.ensureRegistered(events.sparkSession)
    events
      .select($"ts",
        element_at(call_function("poly_hash_all", array($"event_type")), 1)
          .as("k"))
      .select($"ts", $"k",
        explode(sequence(lit(0), lit(SketchDepth - 1))).as("j"))
      .withColumn("bucket",
        ((element_at(typedLit(csA.toSeq), $"j" + 1) * ($"k" % 2147483647L)
          + element_at(typedLit(csB.toSeq), $"j" + 1)) % 2147483647L)
          % SketchWidth)
      .groupBy(window($"ts", "1 hour"), $"j", $"bucket")
      .agg(count(lit(1)).as("c"))
      .select($"window.start".as("window_start"), $"j", $"bucket", $"c")
  }

  /** The watermarked streaming form of [[sketchCells]]. */
  def sketchCellsStream(events: DataFrame): DataFrame =
    sketchCells(events.withWatermark("ts", "10 minutes"))

  /** Probe the sketch for a set of (window_start, event_type) keys:
    * est = min over the key's d cells. Serve-time pass (foreachBatch
    * on streams; the same call IS the batch probe). */
  def probeSketch(cells: DataFrame, keys: DataFrame): DataFrame = {
    import cells.sparkSession.implicits._
    graft.plans.GraftFunctions.ensureRegistered(cells.sparkSession)
    keys
      .withColumn("k",
        element_at(call_function("poly_hash_all", array($"event_type")), 1))
      .withColumn("j", explode(sequence(lit(0), lit(SketchDepth - 1))))
      .withColumn("bucket",
        ((element_at(typedLit(csA.toSeq), $"j" + 1) * ($"k" % 2147483647L)
          + element_at(typedLit(csB.toSeq), $"j" + 1)) % 2147483647L)
          % SketchWidth)
      .join(cells, Seq("window_start", "j", "bucket"))
      .groupBy($"window_start", $"event_type")
      .agg(min($"c").as("est"))
  }

  /** Batch mirror (driver-checked): cells + probe + the exact count
    * alongside, so the CMS guarantee (est >= exact, gap = collision
    * mass) is part of the verified result. */
  def st10SketchTrending(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = graft.Caches.persist(
      Tables.events(spark, dir).select($"ts", $"event_type"))
    val cells = sketchCells(ev)
    val exact = ev
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n_exact"))
      .select($"window.start".as("window_start"), $"event_type", $"n_exact")
    probeSketch(cells, exact.select($"window_start", $"event_type"))
      .join(exact, Seq("window_start", "event_type"))
      .select($"window_start", $"event_type", $"n_exact", $"est",
        ($"est" - $"n_exact").as("overcount"))
      .orderBy($"window_start", $"event_type")
  }

  /** st12: windowed DISTINCT-USER sketch — HLL registers as
    * streaming state, the COUNT DISTINCT companion to st10's CMS
    * counts: exact per-window distinct users keeps one state row per
    * (window, user) — unbounded in the user base — while the HLL
    * keeps at most 256 (window, register) rows per window with ~6%
    * standard error. Like the CMS, the register max is
    * order-independent and MERGEABLE (max of maxes), so partial
    * aggregation, shard merges, and any arrival order produce the
    * identical sketch; estimation happens at serve time
    * ([[hllWindowEstimates]] in foreachBatch / the batch probe). */
  def hllCells(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    graft.operators.EngineQueries
      .withHllRegRho(events.select($"ts", $"user_id"), $"user_id")
      .groupBy(window($"ts", "1 hour"), $"register")
      .agg(max($"rho").as("mj"))
      .select($"window.start".as("window_start"), $"register", $"mj")
  }

  /** The watermarked streaming form of [[hllCells]]. */
  def hllCellsStream(events: DataFrame): DataFrame =
    hllCells(events.withWatermark("ts", "10 minutes"))

  /** Per-window αm bias-corrected estimates over a (window_start,
    * register, mj) cells frame — q25's estimator keyed by window,
    * same ordered fold so the oracle replays it. */
  def hllWindowEstimates(cells: DataFrame): DataFrame = {
    import cells.sparkSession.implicits._
    val alphaM2 = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0)) *
      lit(65536.0)
    cells
      .groupBy($"window_start")
      .agg(array_sort(collect_list(struct($"register", $"mj"))).as("rm"),
           count(lit(1)).cast("double").as("present"))
      .select($"window_start",
        aggregate(transform($"rm", p => pow(lit(2.0), -p("mj"))),
                  lit(0.0), _ + _).as("inv_present"),
        (lit(256.0) - $"present").as("zeros"))
      .select($"window_start",
        (alphaM2 / ($"inv_present" + $"zeros")).as("e_raw"), $"zeros")
      .select($"window_start",
        when($"e_raw" <= lit(2.5 * 256) && $"zeros" > 0,
             lit(256.0) * log(lit(256.0) / $"zeros"))
          .otherwise($"e_raw").as("e"))
  }

  /** Batch mirror (driver-checked): sketch estimate NEXT TO the
    * exact per-window distinct, with measured error — the same
    * calibration discipline as q25/q27/a12. */
  def st12DistinctUsers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = graft.Caches.persist(
      Tables.events(spark, dir).select($"ts", $"user_id"))
    val est = hllWindowEstimates(hllCells(ev))
    val exact = ev
      .groupBy(window($"ts", "1 hour"))
      .agg(countDistinct($"user_id").as("exact_users"))
      .select($"window.start".as("window_start"), $"exact_users")
    est.join(exact, Seq("window_start"))
      .select($"window_start", $"exact_users",
        round($"e", 4).as("approx_users"),
        round(abs($"e" / $"exact_users" - 1.0) * 100.0, 2).as("err_pct"))
      .orderBy($"window_start")
  }

  /** PERSISTED sketch-state serving — the restart seam for st10/st12:
    * the stream appends CLOSED windows' sketch cells (append output
    * mode: a window emits once, fully aggregated, when the watermark
    * passes its end) to a parquet store partitioned by window, and
    * probes serve FROM DISK — so a restarted process answers
    * estimates for historical windows without recomputing them, and
    * the checkpointed source offsets mean the restarted stream
    * processes only new input (SketchStoreSpec asserts both).
    *
    * Idempotence: each emitted batch DYNAMIC-OVERWRITES exactly the
    * window partitions it carries — a replayed epoch rewrites the
    * same finalized cells instead of appending duplicates. The
    * partition key is unix_micros(window_start) (a long survives the
    * dir-name round trip exactly; a timestamp's string form is
    * lossy), with window_start itself kept as a data column. */
  private def startCellStream(cells: DataFrame, storePath: String,
                              kind: String): StreamingQuery =
    cells.writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$storePath/_checkpoints_$kind")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.withColumn("wpart", unix_micros(col("window_start")))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("wpart")
          .parquet(s"$storePath/$kind")
      }
      .start()

  /** Start persisting st10's CMS cells for `events` under
    * `storePath/cms` (+ checkpoint). */
  def sketchStoreStart(events: DataFrame, storePath: String): StreamingQuery =
    startCellStream(sketchCellsStream(events), storePath, "cms")

  /** Start persisting st12's HLL registers under `storePath/hll`. */
  def hllStoreStart(events: DataFrame, storePath: String): StreamingQuery =
    startCellStream(hllCellsStream(events), storePath, "hll")

  /** Serve CMS estimates for (window_start, event_type) keys from a
    * persisted store — no stream, no recompute: the probe reads only
    * the stored cells. */
  def serveSketchFrom(spark: SparkSession, storePath: String,
                      keys: DataFrame): DataFrame =
    probeSketch(spark.read.parquet(s"$storePath/cms"), keys)

  /** Serve per-window HLL distinct estimates from a persisted store. */
  def serveHllFrom(spark: SparkSession, storePath: String): DataFrame =
    hllWindowEstimates(spark.read.parquet(s"$storePath/hll"))

  /** Batch mirror of the trending pipeline (driver-checked). */
  def st8Trending(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    rankTrending(trendingCounts(Tables.events(spark, dir)))
      .orderBy($"window_start", $"rnk")
  }

  /** CHAINED stateful operators — streaming dedup FEEDING a windowed
    * aggregate: the exactly-once-metrics-over-an-at-least-once-bus
    * pattern (every queue consumer sees redeliveries; the metrics
    * must not double count). Two stateful stages in one query:
    * dropDuplicatesWithinWatermark bounds the seen-ids state, the
    * downstream agg keeps its own windowed state — the multi-
    * stateful-operator chain Structured Streaming supports under
    * event-time + append mode. */
  def dedupThenAgg(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    hourlyAgg(
      events.withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark("event_id"))
  }

  /** st9 batch mirror (driver-checked): a deterministic at-least-once
    * replay — every 10th event delivered TWICE — collapsed by the
    * dedup stage. The gate is semantic: the chain must land exactly
    * where clean-input st1 lands (the oracle IS st1's SQL), proving
    * the dedup stage removed precisely the redeliveries. Batch mode
    * uses dropDuplicates on the same key (the watermark variant is
    * streaming-only state bounding, not a semantics change). */
  def st9DedupAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    val replayed = ev.union(ev.filter(pmod($"event_id", lit(10)) === 0))
    windowedAgg(replayed.dropDuplicates("event_id"))
      .orderBy($"window_start", $"event_type")
  }

  /** Streaming RATE-ANOMALY monitoring — the operational query a
    * pipeline runs over its own bus, split the st8 way: the ENGINE
    * maintains the incrementally-updatable watermarked hourly
    * counts; the trailing-baseline judgment runs at the SINK each
    * trigger (a RANGE-frame window over the counts is not
    * incrementally maintainable under updates — same reason st8
    * ranks in the sink). Batch mirror `q43_rate_anomaly` (the judge
    * is literally q43's core applied to the materialized counts). */
  def hourlyCounts(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("hour"), $"event_type", $"n")
  }

  /** The sink-side judge: q43's trailing-24h baseline over a counts
    * frame (hour, event_type, n). */
  def judgeAnomalies(counts: DataFrame, spikeFactor: Double = 3.0,
                     minBaseline: Int = 12): DataFrame = {
    import counts.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"event_type").orderBy($"m")
      .rangeBetween(-86400L, -3600L)
    counts
      .withColumn("m", unix_timestamp($"hour"))
      .withColumn("base_avg", avg($"n").over(w))
      .withColumn("base_n", count($"n").over(w))
      .select($"event_type", $"hour", $"n",
        round(coalesce($"base_avg", lit(0.0)), 4).as("trailing_avg"),
        $"base_n".as("baseline_hours"),
        ($"base_n" >= minBaseline.toLong &&
          $"n" > $"base_avg" * spikeFactor).as("is_spike"))
      .orderBy($"event_type", $"hour")
  }

  final case class FetchEvent(page_key: String, ts: java.sql.Timestamp,
                              event_id: Long, body_hash: String)
  final case class RevisitState(last_hash: String, interval_s: Double,
                                n_fetches: Long, n_changes: Long)

  /** st15: streaming RECRAWL-STATE maintenance — c24's adaptive
    * revisit policy as continuously maintained per-page state (the
    * standing form of UpdateBodyHash, result_consumer.go:196-198):
    * each fetch compares its body hash against the stored one and
    * adapts the revisit interval in place — changed halves (floored
    * 60 s), unchanged doubles (capped 3600 s), first fetch seeds the
    * 300 s default. O(1) state per page (hash + interval + two
    * counters); within a micro-batch events apply in (ts, event_id)
    * order so replays and shard merges can't reorder the fold. */
  def revisitStream(fetches: org.apache.spark.sql.Dataset[FetchEvent])
      : org.apache.spark.sql.Dataset[(String, Long, Long, Double)] = {
    import fetches.sparkSession.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    fetches.groupByKey(_.page_key)
      .mapGroupsWithState[RevisitState, (String, Long, Long, Double)](
          GroupStateTimeout.NoTimeout) {
        (key, evs, state) =>
          val ordered = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var st = state.getOption.orNull
          ordered.foreach { e =>
            if (st == null) st = RevisitState(e.body_hash, 300.0, 1L, 0L)
            else {
              val changed = st.last_hash != e.body_hash
              val ni =
                if (changed) math.max(60.0, st.interval_s / 2)
                else math.min(3600.0, st.interval_s * 2)
              st = RevisitState(e.body_hash, ni, st.n_fetches + 1,
                st.n_changes + (if (changed) 1L else 0L))
            }
          }
          state.update(st)
          (key, st.n_fetches, st.n_changes, st.interval_s)
      }
  }

  /** The synthesized fetch log st15 folds: 200 pages, hash versions
    * that flip with (user_id + event_id) mod 4 — a page changes
    * whenever two consecutive fetches carry different versions. */
  private[graft] def fetchLog(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.Tables.events(spark, dir).select(
      concat(lit("page-"), pmod($"event_id", lit(200))).as("page_key"),
      $"ts", $"event_id",
      md5(concat(pmod($"event_id", lit(200)), lit(":"),
        pmod($"user_id" + $"event_id", lit(4)))).as("body_hash"))
  }

  /** Batch mirror of [[revisitStream]] over any (page_key, ts,
    * event_id, body_hash) fetch log: the change flags come from one
    * lag window, and the clamped interval fold — a true sequential
    * recurrence, not a sum — runs as a codegen `aggregate` HOF over
    * each page's ordered flags (bounded by fetches-per-page). Rows
    * are identical to the stream's final state by construction;
    * StreamingSpec pins it across micro-batch splits. */
  def revisitStateOf(fetches: DataFrame): DataFrame = {
    import fetches.sparkSession.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"page_key").orderBy($"ts", $"event_id")
    fetches
      .withColumn("prev", lag($"body_hash", 1).over(w))
      .withColumn("changed", $"prev".isNotNull && $"body_hash" =!= $"prev")
      .groupBy($"page_key")
      .agg(count(lit(1)).as("n_fetches"),
        sum($"changed".cast("long")).as("n_changes"),
        array_sort(collect_list(struct($"ts", $"event_id", $"changed")))
          .as("evs"))
      .withColumn("interval_s", expr(
        """aggregate(
          |  slice(evs, 2, greatest(cast(size(evs) as int) - 1, 0)),
          |  cast(300.0 as double),
          |  (s, e) -> if(e.changed,
          |    greatest(cast(60.0 as double), s / 2.0D),
          |    least(cast(3600.0 as double), s * 2.0D)))""".stripMargin))
      .select($"page_key", $"n_fetches", $"n_changes",
        round($"interval_s", 2).as("interval_s"))
  }

  /** st15 driver query: the batch mirror over the synthesized log. */
  def st15RecrawlState(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    revisitStateOf(fetchLog(spark, dir)).orderBy($"page_key")
  }

  /** (stale-build seconds, stream-sync seconds) recorded by the
    * [[syncedIndexPath]] memo — Bench bills the streamed CDC epoch
    * on its own line; the stale precursor is the _base line. */
  private val syncTimings =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      (Double, Double)]()

  def syncedIndexTimings(spark: SparkSession,
                         dir: String): Option[(Double, Double)] =
    Option(syncTimings.get((spark, dir)))

  /** The session's STREAM-SYNCED text index for `dir` — st16's
    * store, the CDC loop closed END TO END through a real Structured
    * Streaming query: the index builds keyword-only on a STALE
    * corpus (one div-50 block in five carries placeholder text — the
    * s22 recipe) plus three planted garbage pages; then ONE crawl-
    * result micro-batch arrives through
    * [[IngestStream.syncIndexStream]] — the fresh text of the stale
    * blocks, an UNCHANGED control slice (the classify gate must
    * re-ingest nothing for it), and NULL-text delete notices for the
    * garbage. After the epoch the index's live corpus IS the
    * documents table — which is why st16 reuses s1's oracle — and
    * `maxBatches = 1` also trips the in-stream auto-compaction. */
  def syncedIndexPath(spark: SparkSession, dir: String): String =
    graft.TrainedModels.memo(spark, s"text_index_synced:$dir") {
      import spark.implicits._
      val root = java.nio.file.Files
        .createTempDirectory("graft_ti_sync").toString
      val p = root + "/index"
      val docs = Tables.documents(spark, dir).select($"doc_id", $"text")
      val garbage = spark.range(3).select(
        ($"id" + 900000000L).as("doc_id"),
        concat(lit("planted garbage page "), $"id").as("text"))
      val t0 = System.nanoTime()
      graft.sources.TextIndex.write(
        docs.select($"doc_id",
            when(expr("(doc_id div 50) % 5 = 1"),
              concat(lit("stale placeholder content "), $"doc_id"))
              .otherwise($"text").as("text"))
          .unionByName(garbage),
        p, withVectors = false)
      val t1 = System.nanoTime()
      val payload = docs.filter(expr("(doc_id div 50) % 5 = 1"))
        .unionByName(docs.filter(expr("(doc_id div 50) % 5 = 2")))
        .unionByName(garbage.select($"doc_id",
          lit(null).cast("string").as("text")))
      val stage = root + "/payload"
      payload.write.parquet(stage)
      val q = IngestStream.syncIndexStream(
        spark.readStream.schema(payload.schema).parquet(stage), p,
        maxBatches = 1L)
      try q.processAllAvailable() finally q.stop()
      syncTimings.put((spark, dir),
        ((t1 - t0) / 1e9, (System.nanoTime() - t1) / 1e9))
      p
    }

  /** st16: BM25 served from a STREAM-SYNCED index — the end-to-end
    * CDC gate: stale pages replaced, unchanged pages skipped,
    * deleted pages tombstoned, all through foreachBatch epochs with
    * the replay guard and in-stream compaction; serving must
    * reproduce the true-corpus scan scores EXACTLY (s1's oracle). */
  def st16CdcSyncedBm25(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.sources.TextIndex
      .bm25Serve(spark, syncedIndexPath(spark, dir),
        graft.operators.HybridSearch.QueryTerms)
      .orderBy($"score".desc, $"doc_id").limit(10)
      .select($"doc_id", $"score")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st16_cdc_synced_bm25" -> st16CdcSyncedBm25 _,
    "st15_recrawl_state" -> st15RecrawlState _,
    "st9_dedup_agg" -> st9DedupAgg _,
    "st12_distinct_users" -> st12DistinctUsers _,
    "st10_sketch_trending" -> st10SketchTrending _,
    "st8_trending" -> st8Trending _,
    "st1_window_agg" -> st1WindowAgg _,
    "st2_interval_join" -> st2IntervalJoin _,
    "st3_session_window" -> st3SessionWindow _,
    "st4_funnel_stateful" -> st4FunnelStateful _,
    "st5_enriched_agg" -> st5EnrichedAgg _,
    "st6_sliding_window" -> st6SlidingWindow _,
    "st7_outer_attribution" -> st7OuterAttribution _)

  private val st1Sql =
    """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
      | event_type, count(*) AS n_events, round(sum(value), 4) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY window_start, event_type""".stripMargin

  val oracles: Map[String, String] = Map(
    // st16: after the streamed CDC epoch the index's live corpus IS
    // the documents table — same ground truth as s1, so any classify
    // miss, lost delete, surviving stale row, or replay double-count
    // hash-fails here (the s22 recipe, end-to-end through a stream)
    "st16_cdc_synced_bm25" ->
      graft.operators.HybridSearch.oracles("s17_served_bm25"),
    // the same lag-window change flags, the same clamped fold — as a
    // per-page list_reduce over the ordered flags
    "st15_recrawl_state" ->
      """WITH f AS (
        |  SELECT 'page-' || (event_id % 200) AS page_key,
        |    CAST(ts AS TIMESTAMP) AS ts, event_id,
        |    md5((event_id % 200) || ':' || ((user_id + event_id) % 4))
        |      AS body_hash
        |  FROM events),
        |flagged AS (
        |  SELECT page_key, ts, event_id,
        |    (lag(body_hash) OVER (PARTITION BY page_key
        |       ORDER BY ts, event_id) IS NOT NULL
        |     AND body_hash <> lag(body_hash) OVER (PARTITION BY page_key
        |       ORDER BY ts, event_id)) AS changed
        |  FROM f),
        |folded AS (
        |  SELECT page_key, count(*) AS n_fetches,
        |    CAST(sum(CASE WHEN changed THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_changes,
        |    -- flags as doubles so the fold's accumulator and element
        |    -- types unify (list_reduce folds one homogeneous list)
        |    list(CASE WHEN changed THEN 1.0 ELSE 0.0 END
        |         ORDER BY ts, event_id) AS ch
        |  FROM flagged GROUP BY page_key)
        |SELECT page_key, n_fetches, n_changes,
        |  round(list_reduce(list_prepend(CAST(300.0 AS DOUBLE), ch[2:]),
        |    (s, c) -> CASE WHEN c = 1.0 THEN greatest(60.0, s / 2)
        |                   ELSE least(3600.0, s * 2) END), 2) AS interval_s
        |FROM folded ORDER BY page_key""".stripMargin,
    // LEFT OUTER attribution: count(click_ts) skips the null pads,
    // count of null click_ts rows = unconverted views
    "st7_outer_attribution" ->
      """WITH v AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS view_ts
        |  FROM events WHERE event_type = 'view'),
        |c AS (
        |  SELECT user_id AS c_user_id, CAST(ts AS TIMESTAMP) AS click_ts
        |  FROM events WHERE event_type = 'click')
        |SELECT v.user_id, count(click_ts) AS n_attributed,
        |  count(CASE WHEN click_ts IS NULL THEN 1 END) AS n_unconverted
        |FROM v LEFT JOIN c
        |  ON c.c_user_id = v.user_id
        | AND c.click_ts >= v.view_ts
        | AND c.click_ts < v.view_ts + INTERVAL 10 MINUTE
        |GROUP BY v.user_id
        |ORDER BY v.user_id""".stripMargin,
    // the stateful op must land exactly where the declarative batch
    // funnel lands — q13's oracle, verbatim
    "st4_funnel_stateful" ->
      graft.operators.EngineQueries.oracles("q13_events_funnel"),
    "st1_window_agg" -> st1Sql,
    // replay + dedup collapses to the clean input: st1's oracle,
    // verbatim — the chain is correct iff nothing double counts
    "st9_dedup_agg" -> st1Sql,
    // q25's nibble-exact register replay keyed per hour window, same
    // ordered register fold, exact distinct alongside
    "st12_distinct_users" ->
      """WITH hashed AS (
        |  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
        |    user_id, md5(CAST(user_id AS VARCHAR)) AS h
        |  FROM events),
        |rr AS (
        |  SELECT window_start,
        |    (instr('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
        |      + (instr('0123456789abcdef', substr(h, 2, 1)) - 1) AS register,
        |    coalesce(list_position(
        |      list_transform(generate_series(3, 15),
        |        i -> instr('0123456789abcdef', substr(h, i, 1)) - 1 > 0),
        |      true), 0) AS fnz,
        |    list_transform(generate_series(3, 15),
        |      i -> instr('0123456789abcdef', substr(h, i, 1)) - 1) AS nibs
        |  FROM hashed),
        |rho AS (
        |  SELECT window_start, register,
        |    CASE WHEN fnz = 0 THEN 53
        |      ELSE (fnz - 1) * 4
        |        + CASE WHEN nibs[fnz] = 1 THEN 3
        |               WHEN nibs[fnz] <= 3 THEN 2
        |               WHEN nibs[fnz] <= 7 THEN 1
        |               ELSE 0 END + 1 END AS rho
        |  FROM rr),
        |regs AS (
        |  SELECT window_start, register, max(rho) AS mj
        |  FROM rho GROUP BY window_start, register),
        |sk AS (
        |  SELECT window_start,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(power(2.0, -mj) ORDER BY register)), (a, x) -> a + x)
        |      AS inv_present,
        |    256.0 - CAST(count(*) AS DOUBLE) AS zeros
        |  FROM regs GROUP BY window_start),
        |fin AS (
        |  SELECT window_start,
        |    CASE WHEN e_raw <= 640.0 AND zeros > 0
        |         THEN 256.0 * ln(256.0 / zeros)
        |         ELSE e_raw END AS e
        |  FROM (
        |    SELECT window_start, zeros,
        |      0.7213 / (1.0 + 1.079 / 256.0) * 65536.0
        |        / (inv_present + zeros) AS e_raw
        |    FROM sk)),
        |exact AS (
        |  SELECT window_start, count(DISTINCT user_id) AS exact_users
        |  FROM hashed GROUP BY window_start)
        |SELECT f.window_start, exact_users,
        |  round(e, 4) AS approx_users,
        |  round(abs(e / exact_users - 1.0) * 100.0, 2) AS err_pct
        |FROM fin f JOIN exact USING (window_start)
        |ORDER BY window_start""".stripMargin,
    // same poly key hash, same multiplicative cell family, same
    // min-over-depth probe — integers end to end
    "st10_sketch_trending" -> {
      val aL = csA.mkString("[", ", ", "]")
      val bL = csB.mkString("[", ", ", "]")
      val polyFoldSql =
        """list_reduce(list_prepend(CAST(0 AS BIGINT),
          |      list_transform(generate_series(1, length(t)),
          |        i -> CAST(ascii(substring(t, i, 1)) AS BIGINT))),
          |      (a, c) -> (a*31 + c) % 1000000007)""".stripMargin
      s"""WITH e0 AS (
         |  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
         |    event_type, event_type AS t
         |  FROM events),
         |ev AS (
         |  SELECT window_start, event_type, ($polyFoldSql) AS k FROM e0),
         |cx AS (
         |  SELECT window_start, j.j AS j,
         |    (($aL[j.j+1]*(k % 2147483647) + $bL[j.j+1]) % 2147483647)
         |      % $SketchWidth AS bucket
         |  FROM ev, LATERAL unnest(generate_series(0, ${SketchDepth - 1})) AS j(j)),
         |cells AS (
         |  SELECT window_start, j, bucket, CAST(count(*) AS BIGINT) AS c
         |  FROM cx GROUP BY window_start, j, bucket),
         |exact AS (
         |  SELECT window_start, event_type,
         |    CAST(count(*) AS BIGINT) AS n_exact, any_value(k) AS k
         |  FROM ev GROUP BY window_start, event_type),
         |probes AS (
         |  SELECT e.window_start, e.event_type, e.n_exact, j.j AS j,
         |    (($aL[j.j+1]*(e.k % 2147483647) + $bL[j.j+1]) % 2147483647)
         |      % $SketchWidth AS bucket
         |  FROM exact e, LATERAL unnest(generate_series(0, ${SketchDepth - 1})) AS j(j)),
         |est AS (
         |  SELECT p.window_start, p.event_type, any_value(p.n_exact) AS n_exact,
         |    CAST(min(c.c) AS BIGINT) AS est
         |  FROM probes p JOIN cells c USING (window_start, j, bucket)
         |  GROUP BY p.window_start, p.event_type)
         |SELECT window_start, event_type, n_exact, est,
         |  (est - n_exact) AS overcount
         |FROM est
         |ORDER BY window_start, event_type""".stripMargin
    },
    // st1's counts + the sink-side rank
    "st8_trending" ->
      """WITH counts AS (
        |  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
        |    event_type, count(*) AS n_events
        |  FROM events GROUP BY 1, 2)
        |SELECT window_start, event_type, n_events, rnk FROM (
        |  SELECT window_start, event_type, n_events,
        |    CAST(row_number() OVER (PARTITION BY window_start
        |      ORDER BY n_events DESC, event_type) AS INTEGER) AS rnk
        |  FROM counts)
        |WHERE rnk <= 3
        |ORDER BY window_start, rnk""".stripMargin,
    // each event expands to its 4 covering windows (15-min grid is
    // hour-aligned in both engines, so the bucket origins agree)
    "st6_sliding_window" ->
      """SELECT start AS window_start, event_type,
        |  count(*) AS n_events, round(sum(value), 4) AS sum_value
        |FROM (
        |  SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
        |           - t.i * INTERVAL '15 minutes' AS start,
        |         event_type, value
        |  FROM events, LATERAL unnest(generate_series(0, 3)) AS t(i))
        |GROUP BY 1, 2
        |ORDER BY window_start, event_type""".stripMargin,
    "st5_enriched_agg" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
        | c_mktsegment, count(*) AS n_events, round(sum(value), 4) AS sum_value
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1, 2
        |ORDER BY window_start, c_mktsegment""".stripMargin,
    "st2_interval_join" ->
      """WITH v AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS view_ts
        |  FROM events WHERE event_type = 'view'),
        |c AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS click_ts
        |  FROM events WHERE event_type = 'click')
        |SELECT v.user_id, count(*) AS n_attributed
        |FROM v JOIN c
        |  ON c.user_id = v.user_id
        | AND c.click_ts >= v.view_ts
        | AND c.click_ts < v.view_ts + INTERVAL 10 MINUTE
        |GROUP BY v.user_id
        |ORDER BY v.user_id""".stripMargin,
    // gaps-and-islands: a session break is a gap STRICTLY > 30 min
    // (Spark merges windows that touch at the boundary);
    // session_end = last ts + gap
    "st3_session_window" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
        |marked AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |              > INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM ev),
        |sess AS (
        |  SELECT user_id, ts, value,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked)
        |SELECT user_id,
        |  min(ts) AS session_start,
        |  max(ts) + INTERVAL 30 MINUTE AS session_end,
        |  count(*) AS n_events,
        |  round(sum(value), 4) AS sum_value
        |FROM sess
        |GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin)
}
