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

  /** Batch mirror of the streaming aggregation (driver-checked). */
  def st1WindowAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    windowedAgg(Tables.events(spark, dir))
      .orderBy($"window_start", $"event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st1_window_agg" -> st1WindowAgg _)

  val oracles: Map[String, String] = Map(
    "st1_window_agg" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
        | event_type, count(*) AS n_events, round(sum(value), 4) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY window_start, event_type""".stripMargin)
}
