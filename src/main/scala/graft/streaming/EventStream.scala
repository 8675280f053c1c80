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
