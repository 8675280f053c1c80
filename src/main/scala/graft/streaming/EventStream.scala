package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
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
  def windowedAgg(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st1_window_agg" -> st1WindowAgg _,
    "st2_interval_join" -> st2IntervalJoin _)

  val oracles: Map[String, String] = Map(
    "st1_window_agg" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
        | event_type, count(*) AS n_events, round(sum(value), 4) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY window_start, event_type""".stripMargin,
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
        |ORDER BY v.user_id""".stripMargin)
}
